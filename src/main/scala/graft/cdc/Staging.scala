package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Staging-table semantics: filter-applied anti-join, retirement GC, and
  * resolved-timestamp checkpoint windows.
  *
  * Reference: `internal/staging/stage` (durable mutation staging store),
  * `types.Stager` (`types.go:149` — FilterApplied / MarkApplied / Retire)
  * and `internal/staging/checkpoint` + `internal/source/cdc/resolved.go`
  * (resolved timestamps bound what may be applied).
  *
  * Spark-first design: the staging store is just a mutation DataFrame
  * (parquet/Delta-style files at scale). FilterApplied is a `left_anti`
  * hash join (shuffle on the mutation id, or broadcast when the applied
  * set is a small checkpoint delta). Retire is a partition-prunable
  * timestamp predicate. Checkpoints are tumbling windows — an
  * aggregation, not a stateful scan.
  */
object Staging {

  /** Unapplied = staged ∖ applied, by mutation identity.
    * (reference: Stager.FilterApplied "performs an anti-join against the
    * staging table to return only unapplied mutations").
    */
  def filterApplied(staged: DataFrame, applied: DataFrame, idCols: Seq[String]): DataFrame =
    staged.join(applied.select(idCols.map(col): _*), idCols, "left_anti")

  /** Retire staged mutations at or before `retireTs` — i.e. keep the
    * still-live tail (reference: Stager.Retire "delete staged mutations
    * whose timestamp is less than or equal to the given end time").
    * A pure predicate: at scale this prunes whole time-partitions.
    */
  def retire(staged: DataFrame, ts: String, retireTs: Column): DataFrame =
    staged.filter(col(ts) > retireTs)

  /** Checkpoint ledger: bucket mutations into tumbling resolved-timestamp
    * windows and summarize each window (reference: the checkpoint table
    * tracks per-resolved-interval progress).
    */
  def resolvedWindows(muts: DataFrame, ts: String, key: String, metric: Column): DataFrame =
    muts
      .groupBy(date_trunc("hour", col(ts)).as("window_start"))
      .agg(
        count(lit(1)).as("n_muts"),
        count_distinct(col(key)).as("n_keys"),
        metric.as("metric"))
}
