package graft

import graft.functions.GraftFunctions
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** IVF-SQ8: rescored top-k must EQUAL exact brute force under full
  * cell coverage, and the codegen'd quantized cosine must match the
  * declarative double formulation over the dequantized levels.
  */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  test("rescored top-k equals brute force on the embeddings fixture") {
    val e = Tables.embeddings(spark, sfDir)
    val corpus = e.filter(col("vec_id") >= 10)
    val queries = e.filter(col("vec_id") < 10)
    val want = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
      .select(col("query_id"), col("rank").cast("long"), col("neighbor_id"))
      .orderBy("query_id", "rank").collect().toSeq
    val got = Similarity.ivfPqTopK(corpus, queries, "vec_id", "embedding",
        nCells = 16, nProbe = 16, k = 5, rerank = 64)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .orderBy("query_id", "rank").collect().toSeq
    assert(got === want)
  }

  test("recon_err is small and consistent with the reported cosines") {
    val e = Tables.embeddings(spark, sfDir)
    val out = Similarity.ivfPqTopK(
      e.filter(col("vec_id") >= 10), e.filter(col("vec_id") < 10),
      "vec_id", "embedding", nCells = 16, nProbe = 16, k = 5, rerank = 64)
    val bad = out.filter(
      abs(col("cos_sim") - col("q_cos_sim")) =!= col("recon_err") ||
        col("recon_err") > 0.05)
    assert(bad.count() === 0, bad.limit(5).collect().mkString(", "))
  }

  test("graft_cosine_q matches the declarative dequantized cosine") {
    GraftFunctions.register(spark)
    // deliberately includes a CONSTANT vector (hi = lo, scale 0)
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 2.0f, 0.25f), Array(1.0f, 2.0f, -0.5f, 0.75f)),
      (2L, Array(1.0f, 1.0f, 1.0f, 1.0f), Array(3.0f, 3.0f, 3.0f, 3.0f))
    ).toDF("id", "qv", "cv")
      .withColumn("lo", expr("array_min(transform(cv, x -> cast(x as double)))"))
      .withColumn("hi", expr("array_max(transform(cv, x -> cast(x as double)))"))
      .withColumn("scale", (col("hi") - col("lo")) / lit(255.0d))
      .withColumn("codes", expr("CASE WHEN hi = lo " +
        "THEN transform(cv, x -> CAST(-128 AS TINYINT)) " +
        "ELSE transform(cv, x -> CAST(cast(round((cast(x as double) - lo) " +
        "/ scale) as bigint) - 128 AS TINYINT)) END"))
      .withColumn("native", call_function("graft_cosine_q",
        col("qv"), col("codes"), col("lo"), col("scale")))
      .withColumn("dv", expr("CASE WHEN hi = lo " +
        "THEN transform(cv, x -> lo) " +
        "ELSE transform(codes, c -> (cast(c as int) + 128) * scale + lo) END"))
      .withColumn("declarative",
        Similarity.cosine(col("qv"), col("dv")))
    val rows = df.select("id", "native", "declarative").collect()
    rows.foreach { r =>
      assert(r.getDouble(1) === r.getDouble(2), s"id=${r.getLong(0)}")
    }
    // the constant vector dequantizes to (lo, lo, lo, lo): cosine with
    // the all-ones query is exactly 1
    assert(rows.find(_.getLong(0) == 2L).get.getDouble(1) === 1.0)
  }
}
