package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Membership pre-filters for asymmetric joins at scale.
  *
  * The decontamination / blocklist shape — "which of these 100 TB of
  * training rows carry a key from this reference set" — is a
  * semi-join whose BIG side dominates cost. When the reference set is
  * too large to broadcast as an exact set, its BLOOM FILTER usually
  * is not (10⁸ keys at 1 % fpp ≈ 120 MB), and the scalable plan is:
  * embed the filter as a LITERAL in the plan (built once, reusable
  * across runs — the nightly decontamination probes the SAME eval
  * set), pre-filter the big side with the codegen'd `might_contain`
  * (zero shuffle), and run the exact semi-join ONLY on the surviving
  * candidates — the shuffle shrinks from |big| to |hits| + |false
  * positives|. Bloom filters have NO false negatives, so prefilter +
  * exact verify ≡ the plain semi-join (BloomSpec proves it on random
  * key sets); the size knob only trades candidate volume, never
  * correctness. Uses Spark's own BloomFilterAggregate /
  * BloomFilterMightContain (the runtime row-level-filtering
  * expressions), surfaced through the graft function registry.
  */
object Membership {

  /** Build the Bloom-filter bytes of `small`'s `key` column (hashed
    * via xxhash64). One aggregation, one 1-row driver read — the same
    * control-plane pattern as the dedup indexes' meta frames; persist
    * the bytes to reuse the filter across runs.
    */
  def buildBloom(small: DataFrame, key: String, expectedItems: Long,
      numBits: Long): Array[Byte] = {
    GraftFunctions.register(small.sparkSession)
    small.select(xxhash64(col(key)).as("__k"))
      .agg(expr(s"graft_bloom_agg(__k, ${expectedItems}L, ${numBits}L)")
        .as("__bloom"))
      .collect()(0).getAs[Array[Byte]](0)
  }

  /** Rows of `big` passing the literal Bloom filter: a SUPERSET of
    * the true matches (false positives possible, false negatives
    * impossible), with zero shuffle of `big` — `might_contain` is a
    * per-row codegen'd probe of the broadcast-with-the-task literal.
    */
  def bloomCandidates(big: DataFrame, bloom: Array[Byte], key: String): DataFrame = {
    GraftFunctions.register(big.sparkSession)
    big.filter(call_function("graft_might_contain",
      lit(bloom), xxhash64(col(key))))
  }

  /** Exact semi-join of `big` against `small`'s keys with the Bloom
    * pre-filter in front: output ≡ the plain left_semi, but only the
    * candidates reach the exact join's shuffle.
    */
  def bloomSemiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedItems: Long, numBits: Long): DataFrame = {
    val bloom = buildBloom(small, smallKey, expectedItems, numBits)
    bloomCandidates(big, bloom, bigKey)
      .join(small.select(col(smallKey).as("__sk")).distinct(),
        col(bigKey) === col("__sk"), "left_semi")
  }
}
