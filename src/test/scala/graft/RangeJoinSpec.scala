package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

/** The bin-bucketed range join must (a) agree with the naive
  * cross-product-and-filter semantics on overlapping / multi-bin /
  * boundary cases, and (b) actually plan as an equi-join on the bin —
  * never a nested-loop join.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval == naive BETWEEN join, boundaries exact") {
    val points = Seq((1L, 0L), (2L, 10L), (3L, 99L), (4L, 100L), (5L, 250L),
      (6L, 999L)).toDF("pid", "t")
    val intervals = Seq(
      (10L, 0L, 100L),    // [0,100): catches 0,10,99 — not 100
      (11L, 50L, 260L),   // overlaps 10; spans multiple bins: 99, 100, 250
      (12L, 400L, 500L)   // empty
    ).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, "t",
        intervals.withColumnRenamed("s", "start_n").withColumnRenamed("e", "end_n"),
        "start_n", "end_n", binWidth = 64L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(intervals)
      .filter(col("t") >= col("s") && col("t") < col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 10L), (3L, 11L), (4L, 11L), (5L, 11L)))
  }

  test("the plan is an equi-join on the bin, not a nested loop") {
    val points = spark.range(100).select(col("id").as("t"))
    val intervals = spark.range(10).select(col("id").as("iid"),
      (col("id") * 50).as("start_n"), (col("id") * 50 + 40).as("end_n"))
    val plan = RangeJoin.pointInInterval(points, "t", intervals,
        "start_n", "end_n", binWidth = 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
  }
}
