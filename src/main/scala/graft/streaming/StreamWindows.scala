package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming resolved-window checkpointing.
  *
  * Reference: `internal/staging/checkpoint` — progress is tracked per
  * resolved-timestamp interval; an interval is complete once the
  * resolved timestamp passes its end.
  *
  * Spark-first: a watermarked tumbling-window aggregation. The watermark
  * IS the resolved timestamp — a window is emitted (append mode) exactly
  * when the watermark passes its end, the same contract as a changefeed
  * resolved message. State for closed windows is evicted automatically.
  */
object StreamWindows {

  /** Per-window mutation ledger over a (possibly streaming) mutation
    * frame: count + a caller-supplied metric per tumbling window of
    * `windowLen` (the metric is a parameter so the ledger works on any
    * mutation shape, mirroring `Staging.resolvedWindows`).
    */
  def windowedLedger(muts: DataFrame, tsCol: String, metric: Column,
      watermarkDelay: String = "2 hours", windowLen: String = "1 hour"): DataFrame =
    muts
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen).as("w"))
      .agg(count(lit(1)).as("n_muts"), metric.as("metric"))
      .select(col("w.start").as("window_start"), col("n_muts"), col("metric"))
}
