package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dead-letter queue routing.
  *
  * Reference: `internal/target/dlq` — mutations that cannot be applied
  * (merge conflicts, bad payloads) are written to a DLQ table in the
  * target schema for offline reconciliation.
  *
  * Spark-first design: a DLQ is a predicate split of one DataFrame into
  * two sinks. Both branches share the same scan (no double read when the
  * plan is cached or when AQE reuses the exchange); the reason column is
  * computed once, declaratively.
  */
object Dlq {

  /** Split `muts` into (applyable, dlq). `reasons` maps a reason label to
    * the predicate that condemns a row; the first matching reason wins.
    */
  def route(muts: DataFrame, reasons: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val reason = reasons.foldRight(lit(null).cast("string")) {
      case ((label, pred), acc) => when(pred, lit(label)).otherwise(acc)
    }
    val tagged = muts.withColumn("dlq_reason", reason)
    (tagged.filter(col("dlq_reason").isNull).drop("dlq_reason"),
      tagged.filter(col("dlq_reason").isNotNull))
  }
}
