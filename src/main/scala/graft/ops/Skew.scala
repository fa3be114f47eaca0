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
    // deterministic salt: hash of the whole row spreads uniformly and
    // keeps the operator reproducible (no rand(), stable under retries)
    val salt = pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)),
      lit(saltBuckets.toLong)).as("__salt")
    df.withColumn("__salt", salt)
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }
}
