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

  test("cutpoint query equals exact query on the documents fixture") {
    val exact = LlmQueries.dataCurriculumBuckets(spark, sfDir).collect()
    val cut = LlmQueries.dataCurriculumCutpoints(spark, sfDir).collect()
    assert(cut.toSeq === exact.toSeq)
  }

  test("cutpoint plan has no global sort before the bucket agg") {
    val plan = LlmQueries.dataCurriculumCutpoints(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the only window sorts are the control-frame histogram pass and
    // the boundary-group (partitioned) ranking — never `ntile`
    assert(!plan.contains("ntile"), plan)
  }
}
