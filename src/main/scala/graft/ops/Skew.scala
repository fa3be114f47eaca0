package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-phase aggregation.
  *
  * At 100 TB a handful of hot keys (one viral user, one default enum
  * value) can pin a single reducer. Salting splits each key into
  * `saltBuckets` sub-keys for the first aggregation, then combines the
  * partials — the hot key's work spreads over `saltBuckets` tasks.
  * AQE's skew-join handling covers joins; this covers aggregations,
  * whose partial-agg step can still bottleneck on extreme cardinality
  * imbalance when map-side combine isn't enough (e.g. high-cardinality
  * agg states like collect-style accumulators).
  *
  * Only algebraic aggregates (reducible partials) are expressible here;
  * the API takes the partial and final expressions explicitly.
  */
object Skew {

  /** Two-phase salted aggregation.
    *
    * @param partials aggregate columns for the salted first phase
    * @param finals   aggregate columns combining the partials (input
    *                 column names = partial aliases)
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    // salt from a per-row physical id, NOT a row-content hash: the
    // canonical hot-key workload is billions of byte-identical rows,
    // which a content hash would send to ONE salt bucket, defeating the
    // operator. The salt only shapes the partial aggregation — the
    // final result is salt-invariant, so the physical id's partition
    // dependence does not affect output determinism.
    val salt = pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)).as("__salt")
    df.withColumn("__salt", salt)
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }
}
