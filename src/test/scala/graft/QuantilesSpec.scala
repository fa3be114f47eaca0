package graft

import graft.ops.Buckets
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Buckets.quantilesByRange]] ≡ rank selection through the window it
  * replaces — grouped and global, ties straddling range partitions,
  * colliding target ranks on tiny groups — plus the shared null-key
  * contract and a partial-sampling-scale stability case (the regime
  * where the un-checkpointed range leg used to diverge).
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq(0.25, 0.5, 0.75, 0.95)

  /** Window reference: value at rank ⌈q·n⌉ of (v, id) per group. */
  private def ref(df: DataFrame, partCols: Seq[String]): Seq[Row] = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col("v"), col("id"))
    val cw = Window.partitionBy(partCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val r = df.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(cw))
    qs.map { q =>
      r.filter(col("rn") ===
          ceil(lit(q) * col("n").cast("double")).cast("long"))
        .select(partCols.map(col) :+ lit(q).as("q") :+ col("v").as("value"): _*)
    }.reduce(_ unionByName _).collect().toSeq
  }
  private type Row = org.apache.spark.sql.Row

  private def assertSame(df: DataFrame, partCols: Seq[String]): Unit = {
    val want = ref(df, partCols).map(_.toSeq).sortBy(_.mkString("|"))
    val got = Buckets.quantilesByRange(df, "v", "id", qs, partCols)
      .collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
    assert(got == want)
  }

  test("grouped quantiles ≡ window: dominant group spans every range partition") {
    val rows = (1 to 400).map(i => (i.toLong, "big", (i * 37 % 97).toLong)) ++
      (401 to 430).map(i => (i.toLong, "small", (i % 5).toLong)) ++
      Seq((431L, "tiny", 42L))
    assertSame(rows.toDF("id", "g", "v"), Seq("g"))
  }

  test("global quantiles (no partCols) and heavy ties") {
    // 3 distinct values over 500 rows: every tie group straddles the
    // 4 range partitions, so boundary carries are exercised throughout
    val df = (1 to 500).map(i => (i.toLong, (i % 3).toLong)).toDF("id", "v")
    assertSame(df, Nil)
  }

  test("tiny groups: colliding target ranks emit one row per q") {
    // n=1: every q targets rank 1 — four rows, same value
    val df = Seq((1L, "solo", 7L), (2L, "duo", 1L), (3L, "duo", 2L))
      .toDF("id", "g", "v")
    val got = Buckets.quantilesByRange(df, "v", "id", qs, Seq("g"))
    assert(got.filter(col("g") === "solo").count() == qs.size)
    assertSame(df, Seq("g"))
  }

  test("quantiles ≡ window on seeded random shapes") {
    val rnd = new scala.util.Random(20260815L)
    for (_ <- 1 to 5) {
      val size = 50 + rnd.nextInt(400)
      val card = 1 + rnd.nextInt(size)
      val groups = 1 + rnd.nextInt(4)
      val df = (1 to size).map { i =>
        (i.toLong, s"g${rnd.nextInt(groups)}", rnd.nextInt(card).toLong)
      }.toDF("id", "g", "v")
      assertSame(df, Seq("g"))
    }
  }

  test("null keys raise loudly instead of dropping rows") {
    val df = Seq((1L, Some(3L)), (2L, None)).toDF("id", "v")
    val e = intercept[Exception] {
      Buckets.quantilesByRange(df, "v", "id", qs, Nil).collect()
    }
    assert(e.getMessage.contains("NULL in key column"),
      s"unexpected error: ${e.getMessage}")
  }

  test("stable under partial reservoir sampling (150k continuous keys)") {
    // large enough that repartitionByRange samples partially under 4
    // shuffle partitions — the regime where un-materialized range legs
    // used to disagree on boundaries; exactness must hold regardless
    val df = spark.range(150000)
      .select(col("id"), (hash(col("id")).cast("double") / 1e9).as("v"),
        (pmod(col("id"), lit(3))).cast("string").as("g"))
    val got = Buckets.quantilesByRange(df, "v", "id", Seq(0.5, 0.95), Seq("g"))
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    val cw = Window.partitionBy("g")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val r = df.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(cw))
    val want = Seq(0.5, 0.95).map { q =>
      r.filter(col("rn") === ceil(lit(q) * col("n").cast("double")).cast("long"))
        .select(col("g"), lit(q).as("q"), col("v").as("value"))
    }.reduce(_ unionByName _)
    val diff = got.unionByName(want).groupBy("g", "q", "value")
      .agg(count(lit(1)).as("c")).filter(col("c") =!= 2)
    assert(diff.count() == 0, diff.limit(5).collect().mkString(", "))
  }
}
