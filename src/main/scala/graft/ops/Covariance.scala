package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact distributed second-moment (covariance precursor) matrix over
  * an embedding column — the PCA/whitening/decorrelation input every
  * representation-quality pass needs.
  *
  * Floats are the enemy of cross-engine exactness here: a float
  * Σ x_i·x_j depends on ADDITION ORDER, so a distributed sum can never
  * hash-match an oracle (or itself, across partitionings). The repo's
  * standard move applies: quantize each element to a fixed-point
  * integer grid (q = round(x·10⁴) — one IEEE multiply + one
  * half-away-from-zero round, bit-identical in Spark and DuckDB), then
  * accumulate EXACT integer sums Σ q_i·q_j, Σ q_i, n. Integer addition
  * is associative and commutative, so the result is a pure function of
  * the data — identical under any partitioning, replay, or engine —
  * and covariance/PCA derive from the moments in one driver-side O(d²)
  * step with the quantization error bounded by the grid (|x| ≤ 1 ⇒
  * |q| ≤ 10⁴ ⇒ Σ|q_i·q_j| ≤ 10⁸·n: no Long overflow below 9·10¹⁰
  * vectors).
  *
  * The plan is the mergeable-summary shape, NOT a row explosion: a
  * d(d+1)/2-slot array buffer per partition folded through Spark's
  * partial aggregation (each input row costs one local O(d²)
  * multiply-add sweep — the irreducible covariance work), the shuffle
  * moves ONE buffer per partition, and the only driver materialization
  * is the ≤ d(d+3)/2+1-slot merged summary. A naive pairs-explode plan
  * (unnest i × unnest j, groupBy (i, j)) shuffles n·d(d+1)/2 rows —
  * the 100 TB non-starter the oracle SQL is allowed to be.
  */
object Covariance {

  /** Upper-triangle index of (i, j), 0 ≤ i ≤ j < d, rows-first:
    * (0,0)(0,1)…(0,d−1)(1,1)… — shared by reduce and the unpack so
    * they can never disagree.
    */
  def triIndex(i: Int, j: Int, d: Int): Int =
    i * d - i * (i - 1) / 2 + (j - i)

  /** Fixed-point element quantization, the column side: one codegen'd
    * array expression. 1-based `i` would be the oracle's index; the
    * array stays positional here.
    */
  def quantized(embCol: String, scale: Long = 10000L) =
    expr(s"transform($embCol, x -> cast(round(cast(x as double) * $scale.0D) as bigint))")

  /** One distributed pass → the exact moment frame: (i, j, s_xy, s_x,
    * s_y, n) for every 1-based upper-triangle pair i ≤ j (d(d+1)/2
    * rows — a control frame by construction). Vectors whose length ≠ d
    * raise (a silent skip would unbalance the moments).
    */
  def moments(vectors: DataFrame, embCol: String, d: Int,
      scale: Long = 10000L): DataFrame =
    expand(summarize(vectors, embCol, d, scale), d, vectors.sparkSession)

  /** The one distributed pass → the raw mergeable summary array
    * ([d(d+1)/2 upper-tri product sums | d element sums | count]) —
    * the unit [[StreamingMoments]] folds per micro-batch.
    */
  private[ops] def summarize(vectors: DataFrame, embCol: String, d: Int,
      scale: Long): Array[Long] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    // loud contract, not a silent wrap/NPE: a NULL vector or element
    // would die opaquely inside the Array[Long] encoder, and an
    // element outside [-1, 1] breaks the Long-overflow bound the
    // Scaladoc promises (it assumes |q| ≤ scale) — the moments would
    // wrap silently while still hash-matching themselves
    val guarded = vectors.select(
      when(col(embCol).isNotNull && !exists(col(embCol), _.isNull),
        quantized(embCol, scale))
        .otherwise(raise_error(lit(s"graft.Covariance.moments: NULL " +
          s"$embCol vector or element — nulls are not supported (they " +
          "would unbalance the moments)"))).as("value"))
    val qs = guarded.as[Array[Long]]
    qs.select(new CovMoments(d, maxAbs = scale).toColumn).head()
  }

  /** Summary array → the (i, j, s_xy, s_x, s_y, n) moment frame —
    * [[graft.ops.Pca.topComponents]]' input shape.
    */
  private[ops] def expand(summary: Array[Long], d: Int,
      spark: SparkSession): DataFrame = {
    import spark.implicits._
    val nPairs = d * (d + 1) / 2
    val n = summary(nPairs + d)
    val rows = for (i <- 0 until d; j <- i until d) yield
      (i + 1L, j + 1L, summary(triIndex(i, j, d)),
        summary(nPairs + i), summary(nPairs + j), n)
    rows.toDF("i", "j", "s_xy", "s_x", "s_y", "n")
  }
}

/** O(d²) streaming second-moment monitor — the covariance/PCA-refresh
  * fold per micro-batch, completing row 103's streaming story the way
  * rows 96/100 complete the quantile/CMS sketches': one distributed
  * [[CovMoments]] pass per batch collapses to ONE ≤ d(d+3)/2+1-slot
  * summary, added elementwise into driver state. Integer addition is
  * associative AND order-independent, so stream ≡ batch under any
  * chunking EXACTLY: at any trigger the state IS the moment frame a
  * batch pass over everything seen would produce, and
  * [[Pca.topComponents]] re-derives fresh principal directions from
  * it with NO corpus re-scan — the drift-aware projection refresh a
  * streaming curation loop needs. Persistence follows the
  * generation + commit-sentinel discipline, with (d, scale) persisted
  * and shape-checked on resume (the r14 CMS precedent: flat slot
  * indices only mean what the shape said at save time, and a scale
  * change would mix incompatible fixed-point grids).
  */
final class StreamingMoments private (d: Int, scale: Long,
    private val slots: Array[Long]) {
  def this(d: Int, scale: Long = 10000L) =
    this(d, scale, new Array[Long](d * (d + 1) / 2 + d + 1))

  def n: Long = slots(slots.length - 1)

  /** The raw summary (row 103's mergeable array), exposed for specs. */
  def summaryArray: Array[Long] = slots.clone()

  /** Fold one micro-batch: one distributed pass, one control read,
    * elementwise add.
    */
  def ingest(batch: DataFrame, embCol: String): Unit = {
    val s = Covariance.summarize(batch, embCol, d, scale)
    var k = 0
    while (k < slots.length) { slots(k) += s(k); k += 1 }
  }

  /** The exact moment frame of everything ingested — feed it to
    * [[Pca.topComponents]] for a projection refresh at any trigger.
    */
  def moments(spark: SparkSession): DataFrame =
    Covariance.expand(slots, d, spark)

  /** Persist every slot plus the shape as the next COMMITTED
    * generation under `path` — sentinel last, torn writes can never
    * shadow the previous summary.
    */
  def save(path: String, spark: SparkSession): Unit = {
    import spark.implicits._
    val frame = (slots.zipWithIndex.map { case (v, i) => (i, v) }.toSeq ++
      Seq((-1, d.toLong), (-2, scale)))
      .toDF("idx", "v").coalesce(1)
    Dedup.writeGenAndGc(path, Seq("moments" -> frame))
  }
}

object StreamingMoments {
  def apply(d: Int, scale: Long = 10000L): StreamingMoments =
    new StreamingMoments(d, scale)

  /** Resume from the newest COMMITTED generation of
    * [[StreamingMoments.save]]; torn generations are skipped or
    * refused loudly, and a (d, scale) mismatch refuses as loudly as a
    * torn write — resuming flat slots into a different shape would
    * scramble the triangle, and a different scale mixes incompatible
    * fixed-point grids.
    */
  def resume(d: Int, path: String, spark: SparkSession,
      scale: Long = 10000L): StreamingMoments = {
    val base = Dedup.newestCommittedGen(spark, path, Seq("moments"),
      "moment summary")
    val rows = spark.read.parquet(s"$base/moments").collect()
    var savedD = -1L
    var savedScale = -1L
    rows.foreach { r =>
      val idx = r.getAs[Int]("idx")
      if (idx == -1) savedD = r.getAs[Long]("v")
      else if (idx == -2) savedScale = r.getAs[Long]("v")
    }
    require(savedD > 0 && savedScale > 0,
      s"moment summary at $base/moments carries no shape — refusing to " +
        "resume (pre-shape or torn generation)")
    require(savedD == d && savedScale == scale,
      s"moment summary at $base/moments was saved with d=$savedD " +
        s"scale=$savedScale but resume asked for d=$d scale=$scale — a " +
        "shape change would scramble the triangle slots")
    val slots = new Array[Long](d * (d + 1) / 2 + d + 1)
    rows.foreach { r =>
      val idx = r.getAs[Int]("idx")
      if (idx >= 0) slots(idx) = r.getAs[Long]("v")
    }
    new StreamingMoments(d, scale, slots)
  }
}

/** Typed moment aggregate: buffer = [d(d+1)/2 upper-tri product sums |
  * d element sums | count]. reduce is the per-row O(d²) multiply-add
  * sweep (primitive long array, no boxing); merge is elementwise add —
  * Spark's partial aggregation moves one buffer per partition.
  *
  * `maxAbs` is the runtime-checked magnitude contract: the overflow
  * bound in [[Covariance]]'s Scaladoc (no Long wrap below 9·10¹⁰
  * vectors) only holds when every |q| ≤ scale, i.e. |x| ≤ 1 on the
  * raw embedding — reduce raises on the first violating element
  * instead of letting Σq_i·q_j wrap into garbage that still
  * hash-matches itself. Default Long.MaxValue keeps direct
  * constructors unguarded; [[Covariance.moments]] always passes its
  * scale.
  */
class CovMoments(d: Int, maxAbs: Long = Long.MaxValue)
    extends Aggregator[Array[Long], Array[Long], Array[Long]]
    with Serializable {
  require(d > 0, "d must be positive")
  private val nPairs = d * (d + 1) / 2

  def zero: Array[Long] = new Array[Long](nPairs + d + 1)

  def reduce(b: Array[Long], q: Array[Long]): Array[Long] = {
    require(q.length == d,
      s"vector of dim ${q.length} in a dim-$d covariance pass")
    var i = 0
    var idx = 0
    while (i < d) {
      val qi = q(i)
      require(qi <= maxAbs && qi >= -maxAbs,
        s"quantized element $qi exceeds the fixed-point bound ±$maxAbs " +
          "(raw |x| > 1 voids the documented Long-overflow contract)")
      b(nPairs + i) += qi
      var j = i
      while (j < d) { b(idx) += qi * q(j); idx += 1; j += 1 }
      i += 1
    }
    b(nPairs + d) += 1L
    b
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < a.length) { a(k) += b(k); k += 1 }
    a
  }

  def finish(r: Array[Long]): Array[Long] = r
  def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  def outputEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
}
