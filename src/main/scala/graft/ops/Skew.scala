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

  /** Fan a SCAN-ROOTED (exchange-free) frame out to the session's
    * default parallelism when the scan itself cannot supply it. A
    * single-row-group parquet file is ONE scan task no matter the
    * split config (byte-range splits beyond the row group are empty),
    * so every operator fused into that scan runs serially — the r15
    * stage audits measured 1.7–2.2 s single tasks on the
    * tokenize/BPE/CMS chains at sf0.1.
    *
    * Scale-adaptive by construction: with >= `defaultParallelism` scan
    * splits (any real corpus; the 100× fixtures are 32 files) this is
    * the IDENTITY — no exchange, the corpus is never shuffled for
    * parallelism it already has. When it fires, the round-robin
    * exchange is also the legs' shared evaluation point
    * (ReuseExchange), so multi-consumer queries stop re-reading the
    * leaf per leg.
    *
    * USE ONLY where (a) the downstream is a CPU-dense chain whose cost
    * dwarfs one small-file shuffle, and (b) every downstream aggregate
    * is partition-order-invariant (integer/decimal sums, min/max/count,
    * per-row expressions — the repo doctrine). Measured REJECTIONS
    * stand in OPTIMIZATION_r15.md: loader-level fan-out regressed every
    * join-shaped consumer (the exchange is pure overhead in front of
    * the join's own hash exchange), and fan-out before a barrier-heavy
    * pipeline (curation) was noise-neutral.
    *
    * `df.rdd` on an exchange-free plan compiles the split list without
    * materializing any query stage.
    *
    * Guarded on BOTH split count and estimated input size (r15 ADVICE):
    * split count alone would fire on a cluster whose parallelism
    * exceeds the corpus's split count (thousands of cores over a few
    * hundred large splits) and round-robin-shuffle heavy rows the
    * scan-fused chain never needed shuffled. `maxBytes` (default 2 GiB,
    * plan-stats estimate — for a scan root this is the file size, known
    * without running anything) limits the fan-out to genuinely small
    * inputs, where the shuffle is a few MB against a CPU-dense chain.
    */
  def fanOutNarrowScan(df: DataFrame, maxBytes: Long = 2L << 30): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val parts = df.rdd.getNumPartitions
    lazy val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (parts >= target || estBytes > maxBytes) df else df.repartition(target)
  }

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
