package graft

import graft.functions.GraftFunctions
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Specs for the native codegen'd vector expression. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(2.0f, 2.0f, 2.0f), Array(2.0f, 2.0f, 2.0f))
  ).toDF("id", "a", "b")

  test("graft_cosine matches the declarative formulation bit-for-bit") {
    GraftFunctions.register(spark)
    val out = vecs.select(
      col("id"),
      call_function("graft_cosine", col("a"), col("b")).as("fast"),
      Similarity.cosine(col("a"), col("b")).as("slow"))
      .as[(Long, Double, Double)].collect()
    out.foreach { case (_, fast, slow) => assert(fast == slow) }
    assert(out.find(_._1 == 2L).get._2 == 0.0)
    assert(math.abs(out.find(_._1 == 3L).get._2 - 1.0) < 1e-12)
  }

  test("graft_cosine is null-safe and usable from SQL") {
    GraftFunctions.register(spark)
    vecs.createOrReplaceTempView("fs_vecs")
    val viaSql = spark.sql(
      "SELECT id, graft_cosine(a, b) AS c FROM fs_vecs ORDER BY id")
      .as[(Long, Double)].collect()
    assert(viaSql.length == 3)
    val withNull = Seq((1L, Array(1.0f), Option.empty[Array[Float]]))
      .toDF("id", "a", "b")
      .select(call_function("graft_cosine", col("a"), col("b")))
      .collect()
    assert(withNull(0).isNullAt(0))
  }

  test("interpreted eval (no codegen) agrees with codegen") {
    GraftFunctions.register(spark)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val out = vecs.select(call_function("graft_cosine", col("a"), col("b")))
        .as[Double].collect()
      assert(out.exists(v => v > 0.97 && v < 0.98)) // (1,2,3)·(4,5,6)
    }
  }

  test("graft_lsh_buckets rejects vectors whose dims would overlap plane bits") {
    // the plane-component packing gives dims 20 bits; an oversized
    // vector must error rather than silently correlate hyperplanes
    GraftFunctions.register(spark)
    val big = Seq(Tuple1(Array.fill(1 << 20)(0.5f))).toDF("v")
    val e = intercept[Exception] {
      big.select(call_function("graft_lsh_buckets", col("v"), lit(2), lit(4))).collect()
    }
    assert(e.getMessage.contains("dimensions") ||
      Option(e.getCause).exists(_.getMessage.contains("dimensions")))
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
