package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Resolved-timestamp checkpoint frontier.
  *
  * Reference: `internal/staging/checkpoint/group.go:121` (`Advance`) —
  * each partition proposes monotonically increasing resolved
  * timestamps; a proposal that does not advance its partition's
  * frontier is rejected ("going backwards"), and the group's overall
  * resolved time is the MINIMUM frontier across partitions (a
  * multi-source feed is only resolved up to its slowest source).
  *
  * Spark-first: the proposal log is a DataFrame; regression detection
  * is a running-max window per partition in arrival order (bounded —
  * checkpoint streams are tiny relative to the data they govern), the
  * frontier one aggregation, the group minimum one more.
  */
object Checkpoint {

  /** Per-partition frontier with Advance accounting: for every
    * partition, the frontier (max proposed nanos), the proposal count,
    * and how many proposals were regressions (strictly below the
    * frontier at their arrival time — the reference rejects these with
    * a "going backwards" error; its Advance SQL inserts when the
    * proposal is `>=` the stored HLC, so an EQUAL re-proposal succeeds
    * idempotently and only strictly-less fires the error).
    */
  def advance(proposals: DataFrame, partition: Column, nanos: Column,
      arrival: Column): DataFrame = {
    val tagged = proposals.select(partition.as("partition"),
      nanos.as("__nanos"), arrival.as("__arrival"))
    val w = Window.partitionBy(col("partition")).orderBy(col("__arrival"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // first arrival: running max is NULL, < NULL is NULL, otherwise(0)
    // — never a rejection, matching the reference's empty-table case
    tagged
      .withColumn("__rejected",
        when(col("__nanos") < max(col("__nanos")).over(w), 1L).otherwise(0L))
      .groupBy("partition")
      .agg(
        max(col("__nanos")).as("frontier_nanos"),
        count(lit(1)).as("n_proposals"),
        sum(col("__rejected")).as("n_rejected"))
  }

  /** The group's resolved time: the minimum frontier across partitions
    * (multi-source minimum). One-row frame, meant to be broadcast.
    */
  def groupResolved(frontiers: DataFrame): DataFrame =
    frontiers.agg(min(col("frontier_nanos")).as("resolved_nanos"))
}
