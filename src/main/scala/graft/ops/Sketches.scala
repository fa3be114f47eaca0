package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches for corpus accounting.
  *
  * The reference's accounting queries (and any 100 TB curation run)
  * need "how many DISTINCT documents/keys does each source hold"
  * without a per-source exact distinct — the KMV (k-minimum-values)
  * sketch answers it from the k smallest hash values of the set:
  * if the k-th smallest of n uniform hashes in [0, M) sits at h_k,
  * then n ≈ (k−1)·M/h_k (Bar-Yossef et al. 2002, "Counting distinct
  * elements in a data stream"). KMV is MERGEABLE — the union's sketch
  * is the k smallest of the concatenated sketches — which is what
  * makes it the distributed/streaming choice: partitions keep k values
  * each and combine associatively, a shuffle of k rows per group
  * instead of the distinct set.
  *
  * Everything here is DETERMINISTIC (md5-derived hashes, integer
  * ranks, one final double division), so a SQL oracle re-derives the
  * estimate bit-for-bit — the sketch's ERROR is visible and checked,
  * not hidden behind an RNG.
  */
object Sketches {

  /** Hash domain: 15 hex digits of md5 = [0, 16^15) = [0, 2^60). */
  val HashSpace: Long = 1L << 60

  /** Uniform 60-bit hash of a string column (md5 prefix → BIGINT). */
  def uniformHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Per-scope KMV distinct-count estimates, plus the exact count and
    * relative error for audit (at sketch scale the exact count is the
    * point of the exercise — at 100 TB you'd keep only the k-row
    * sketches). `df` must carry `scope` and `h` (a uniform hash);
    * rows with duplicate (scope, h) collapse first — KMV is a set
    * sketch. The rank window partitions BY SCOPE, so scopes sketch in
    * parallel; the scale path replaces the window with the associative
    * per-partition k-minimum combine the Scaladoc above describes.
    *
    * Estimate rule: with fewer than k distinct values the sketch IS
    * the set (estimate = exact); otherwise (k−1)·M/h_k as one double
    * multiply-divide chain.
    */
  def kmvEstimates(scoped: DataFrame, k: Int): DataFrame = {
    require(k > 1, "k must exceed 1")
    val distinctHashes = scoped.select("scope", "h").distinct()
    val w = Window.partitionBy("scope").orderBy("h")
    val sketch = distinctHashes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy("scope")
      .agg(max("h").as("kth_hash"), count(lit(1)).as("sketch_size"))
    val exact = distinctHashes.groupBy("scope")
      .agg(count(lit(1)).as("n_exact"))
    exact.join(sketch, Seq("scope"))
      .withColumn("est",
        when(col("sketch_size") < k, col("n_exact").cast("double"))
          .otherwise(lit((k - 1).toDouble) *
            (lit(HashSpace.toDouble) / col("kth_hash").cast("double"))))
      .withColumn("rel_err",
        abs(col("est") - col("n_exact").cast("double")) /
          col("n_exact").cast("double"))
      .select("scope", "n_exact", "sketch_size", "kth_hash", "est", "rel_err")
  }
}
