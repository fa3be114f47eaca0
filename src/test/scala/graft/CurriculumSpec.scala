package graft

import graft.ops.Buckets
import graft.queries.LlmQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cutpoint-mode curriculum bucketing ≡ exact ntile — per ROW, not just
  * per aggregate, including ties split across bucket boundaries and the
  * N < n degenerate case. The scale mode must be a drop-in: same bucket
  * for every row ntile would assign.
  */
class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  private def ntileRef(df: DataFrame, n: Int): DataFrame =
    df.withColumn("bucket",
      ntile(n).over(Window.orderBy(col("k"), col("id"))).cast("long"))

  private def assertSameBuckets(df: DataFrame, n: Int): Unit = {
    val ref = ntileRef(df, n).select(col("id"), col("bucket").as("want"))
    val got = Buckets.ntileByHistogram(df, "k", "id", n)
      .select(col("id"), col("bucket").as("got"))
    val diff = ref.join(got, "id")
      .filter(col("want") =!= col("got"))
    assert(diff.count() === 0, diff.limit(5).collect().mkString(", "))
    assert(got.count() === df.count())
  }

  test("tie groups straddling bucket boundaries split exactly like ntile") {
    // 100 rows over 3 distinct keys: every bucket boundary falls inside
    // a tie group, so every row takes the boundary-ranking path
    val df = (1 to 100).map(i => (i.toLong, (i % 3).toLong)).toDF("id", "k")
    assertSameBuckets(df, 10)
  }

  test("distinct keys (no boundary groups) match ntile") {
    val df = (1 to 97).map(i => (i.toLong, (i * 7 % 101).toLong)).toDF("id", "k")
    assertSameBuckets(df, 10)
  }

  test("fewer rows than buckets degenerates like ntile") {
    val df = (1 to 7).map(i => (i.toLong, 42L)).toDF("id", "k")
    assertSameBuckets(df, 10)
  }

  test("uneven N: remainder buckets sized like ntile") {
    val df = (1 to 103).map(i => (i.toLong, (i % 13).toLong)).toDF("id", "k")
    assertSameBuckets(df, 10)
  }

  private def assertSameBucketsRanged(df: DataFrame, n: Int,
      partCols: Seq[String] = Nil): Unit = {
    val ref =
      if (partCols.isEmpty) ntileRef(df, n)
        .select(col("id"), col("bucket").as("want"))
      else df.withColumn("want", ntile(n).over(Window
          .partitionBy(partCols.map(col): _*).orderBy(col("k"), col("id")))
          .cast("long"))
        .select(col("id"), col("want"))
    val got = Buckets.ntileByRange(df, "k", "id", n, partCols)
      .select(col("id"), col("bucket").as("got"))
    val diff = ref.join(got, "id").filter(col("want") =!= col("got"))
    assert(diff.count() === 0, diff.limit(5).collect().mkString(", "))
    assert(got.count() === df.count())
  }

  test("ntileByRange ≡ ntile: ties straddling partitions AND boundaries") {
    // 500 rows over 3 distinct keys under 32 shuffle partitions: every
    // tie group spans several RANGE partitions and every bucket
    // boundary falls inside one — global rank must come out exact from
    // local rank + control-frame offsets
    val df = (1 to 500).map(i => (i.toLong, (i % 3).toLong)).toDF("id", "k")
    assertSameBucketsRanged(df, 10)
  }

  test("ntileByRange ≡ ntile: distinct keys, degenerate N, uneven N") {
    assertSameBucketsRanged(
      (1 to 97).map(i => (i.toLong, (i * 7 % 101).toLong)).toDF("id", "k"), 10)
    assertSameBucketsRanged(
      (1 to 7).map(i => (i.toLong, 42L)).toDF("id", "k"), 10)
    assertSameBucketsRanged(
      (1 to 103).map(i => (i.toLong, (i % 13).toLong)).toDF("id", "k"), 10)
  }

  test("ntileByRange partitioned: per-group buckets match the per-group window") {
    // a dominant group plus small ones, with heavy ties — the
    // text_lm_buckets giant-source shape at unit-test scale
    val rows = (1 to 400).map(i => (i.toLong, "big", (i % 5).toLong)) ++
      (401 to 430).map(i => (i.toLong, "small", (i % 3).toLong)) ++
      Seq((431L, "tiny", 0L))
    assertSameBucketsRanged(rows.toDF("id", "g", "k"), 3, Seq("g"))
  }

  test("ntileByRange ≡ ntile on seeded random shapes (cardinality × n sweep)") {
    // randomized-regime sweep: key cardinality from near-constant to
    // near-distinct, bucket counts prime and composite, sizes that
    // leave remainders — every case held to the literal ntile window
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 6) {
      val size = 50 + rnd.nextInt(400)
      val card = 1 + rnd.nextInt(size)
      val n = Seq(2, 3, 7, 10, 16)(rnd.nextInt(5))
      val df = (1 to size).map(i => (i.toLong, rnd.nextInt(card).toLong))
        .toDF("id", "k")
      withClue(s"trial $trial size=$size card=$card n=$n: ") {
        assertSameBucketsRanged(df, n)
      }
    }
  }

  test("ntileByRange is stable across repeated evaluation") {
    // the range boundaries come from sampling; buckets depend only on
    // GLOBAL rank, so three independent evaluations must agree exactly
    val df = (1 to 300).map(i => (i.toLong, (i * 13 % 37).toLong)).toDF("id", "k")
    val runs = (1 to 3).map(_ => Buckets.ntileByRange(df, "k", "id", 7)
      .select("id", "bucket").as[(Long, Long)].collect().sortBy(_._1).toSeq)
    assert(runs(0) == runs(1) && runs(1) == runs(2))
  }

  test("ntileByRange exact under PARTIAL range sampling (300k continuous keys)") {
    // the regime the fallback exists for: enough rows that
    // RangePartitioner's reservoir sample is partial, with
    // near-distinct continuous keys. Without the materialized ranged
    // frame the local-rank leg and the control leg re-sample
    // independently and disagree on partition boundaries — reproduced
    // pre-fix as ~1.7k wrong buckets out of 300k, including buckets
    // OUTSIDE [1, n]. Held here to the literal ntile window per row.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      import spark.implicits._
      val rnd = new scala.util.Random(42L)
      val df = (1 to 300000).map(i => (i.toLong, rnd.nextDouble()))
        .toDF("id", "k")
      val got = Buckets.ntileByRange(df, "k", "id", 3)
        .select(col("id"), col("bucket").as("got"))
      val ref = df.withColumn("want",
        ntile(3).over(Window.orderBy(col("k"), col("id"))).cast("long"))
        .select("id", "want")
      val bad = ref.join(got, "id")
        .filter(col("want") =!= col("got") ||
          col("got") < 1 || col("got") > 3)
        .count()
      assert(bad === 0)
      assert(got.count() === 300000L)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("cutpoint query equals exact query on the documents fixture") {
    val exact = LlmQueries.dataCurriculumBuckets(spark, sfDir).collect()
    val cut = LlmQueries.dataCurriculumCutpoints(spark, sfDir).collect()
    assert(cut.toSeq === exact.toSeq)
  }

  test("cutpoint plan has no global sort before the bucket agg") {
    val plan = LlmQueries.dataCurriculumCutpoints(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the only window sorts are the control-frame histogram pass and
    // the boundary-group (partitioned) ranking — never the `ntile(n)`
    // window function (the null-contract raise_error literal mentions
    // "ntileByHistogram", so match the function-call form)
    assert(!plan.contains("ntile("), plan)
  }
}
