package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mutation sorting / deduplication, re-expressed as distributed
  * aggregations.
  *
  * Reference semantics: `internal/util/msort/msort.go` —
  * `UniqueByKey` is "last one wins" per key (later HLC time wins);
  * `UniqueByTimeKey` dedups exact (time, key) tuples.
  *
  * Spark-first design: the reference does this with an in-memory map over
  * a batch slice. At 100 TB the equivalent is a hash aggregation:
  * `groupBy(key).agg(max_by(struct(cols), orderCol))` — ONE shuffle on the
  * key, with map-side partial aggregation (each task keeps only its local
  * winner per key before the exchange), and no window/sort over whole
  * partitions. A window (`row_number over partition by key order by ts`)
  * would materialize + sort every partition; `max_by` streams.
  */
object Msort {

  /** Last-one-wins dedup: keep, for every key, the row with the greatest
    * `order` column (use a struct col for (hlc, tiebreak) ordering).
    * Returns the surviving rows with the original column set.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], order: Column): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    val won = df
      .groupBy(keys.map(col): _*)
      .agg(max_by(payload, order).as("__row"))
      .select(col("__row.*"))
    won
  }

  /** Dedup exact (time, key) duplicates, keeping the row with the largest
    * `tiebreak` (the reference keeps the later element of the input
    * slice; arrival order has no distributed meaning, so a deterministic
    * tiebreak column takes its place).
    */
  def uniqueByTimeKey(df: DataFrame, keys: Seq[String], time: String, tiebreak: Column): DataFrame =
    latestByKey(df, keys :+ time, tiebreak)
}
