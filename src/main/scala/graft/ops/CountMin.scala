package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable Count-Min sketch (Cormode & Muthukrishnan 2005, "An
  * improved data stream summary: the count-min sketch and its
  * applications"): d hash rows × w counters; an item maps to one
  * bucket per row via independent hashes, its estimate is the MIN of
  * its d bucket counters. The error is one-sided — OVERCOUNT only
  * (est ≥ true always; per row E[over] ≤ n/w, the min over d rows
  * tightens it) — the exact dual of [[MisraGries]]' undercount-only
  * summary, and the two answer different questions: MG names the ≤k
  * heavy-hitter CANDIDATES, CMS answers a point-frequency query for
  * ANY item, including ones MG's trim retired. Merging is PURE
  * COUNTER ADDITION — the simplest mergeable summary there is — so
  * the distributed build is one partially-aggregated groupBy whose
  * shuffle carries at most d·w rows per partition regardless of
  * vocabulary (a `groupBy(item)` shuffles every per-partition
  * distinct item — under Zipf, the whole long tail), and the
  * streaming fold is elementwise `+=` into O(d·w) driver state.
  *
  * Everything is DETERMINISTIC: bucket_r(item) = md5-derived
  * [[Sketches.uniformHash]] of "r:item" mod w, counters are exact
  * integer sums — the sketch and every estimate is a pure function of
  * the data, re-derivable bit-for-bit by a SQL oracle, so the sketch's
  * error is VISIBLE and audited (est − exact ≥ 0), never hidden
  * behind an RNG.
  */
object CountMin {

  /** Sketch shape: `d` independent hash rows, `w` buckets per row. */
  case class Params(d: Int, w: Int) {
    require(d > 0 && w > 1, "need d >= 1 rows and w >= 2 buckets")
  }

  /** Row-r bucket of an item — one codegen'd expression, shared by the
    * build and the probe so they can never disagree. Two hash modes:
    * md5-derived (the default — cross-ENGINE deterministic, so a SQL
    * oracle re-derives every counter bit-for-bit) and `fastHash`
    * (xxhash64 — cross-RUN deterministic within Spark, ~an order of
    * magnitude cheaper per row; the production choice once the
    * machinery is oracle-proven, since a sketch's estimates are
    * approximations either way and every CMS guarantee is
    * hash-agnostic). Build and probe must use the SAME mode.
    */
  def bucket(r: Column, item: Column, w: Int,
      fastHash: Boolean = false): Column =
    if (fastHash) pmod(xxhash64(r, item), lit(w.toLong))
    else Sketches.uniformHash(concat(r.cast("string"), lit(":"), item)) % lit(w)

  /** Driver-side twin of [[bucket]] (streaming estimates, spec
    * oracles) — must agree with the column expression bit-for-bit.
    */
  def bucketLong(r: Int, item: String, w: Int): Int =
    (Sketches.uniformHashLong(s"$r:$item") % w).toInt

  /** Build the d×w counter table from `itemCol` (nulls ignored):
    * explode the d row ids per item — a narrow d× expansion of
    * (tiny-int, bucket) pairs that partial aggregation collapses
    * before the shuffle — then ONE groupBy; the shuffle moves ≤ d·w
    * rows per partition whatever the vocabulary. Output (r, bucket,
    * c), only touched cells.
    */
  def counters(items: DataFrame, itemCol: String, p: Params,
      fastHash: Boolean = false): DataFrame = {
    val base = items.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
    base
      .select(explode(sequence(lit(0), lit(p.d - 1))).as("r"), col("item"))
      .groupBy(col("r"),
        bucket(col("r"), col("item"), p.w, fastHash).as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point-frequency estimates for every item of `probes` (a SMALL
    * frame carrying `item`), from a prebuilt counter table: each probe
    * expands to its d (r, bucket) cells, joins the ≤ d·w-row counter
    * frame (broadcast — it is control-frame-sized by construction,
    * never by data luck), and takes the min. A probed cell no item
    * ever touched reads counter 0 (est = 0 — CMS never undercounts,
    * and an absent item estimates as ≥ 0 correctly).
    */
  def estimates(probes: DataFrame, ctrs: DataFrame, p: Params,
      fastHash: Boolean = false): DataFrame = {
    // cast the probe item to string EXACTLY like counters() casts the
    // build side: md5 mode would coerce anyway inside the concat, but
    // xxhash64 hashes the raw TYPED value — an int-typed probe column
    // would silently probe wrong buckets and return 0, an undercount
    // that breaks the sketch's one guarantee. Build and probe must be
    // unable to disagree on type.
    val cells = probes
      .select(col("item").cast("string").as("item"),
        explode(sequence(lit(0), lit(p.d - 1))).as("r"))
      .withColumn("bucket", bucket(col("r"), col("item"), p.w, fastHash))
    cells.join(broadcast(ctrs), Seq("r", "bucket"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}

/** O(d·w) streaming frequency monitor — the CMS fold per micro-batch,
  * completing the monitor triptych ([[Frequency.StreamingHeavyHitters]]
  * = who is heavy, [[StreamingQuantiles]] = value distribution, this =
  * how often is ANY given item): one distributed [[CountMin.counters]]
  * pass per batch collapses to ≤ d·w cells, added elementwise into the
  * driver array. Addition is associative AND order-independent, so
  * stream ≡ batch under any chunking, exactly; estimates at any
  * trigger obey the same overcount-only bound as a batch sketch of
  * everything seen. Persistence follows the generation +
  * commit-sentinel discipline ([[Dedup.writeGenAndGc]]).
  */
final class StreamingCountMin private (p: CountMin.Params,
    private val cells: Array[Long], private var total: Long) {
  def this(p: CountMin.Params) = this(p, new Array[Long](p.d * p.w), 0L)

  def n: Long = total

  /** The raw counter array (row-major), exposed for specs. */
  def counterArray: Array[Long] = cells.clone()

  /** Fold one micro-batch: one distributed pass, ≤ d·w-row control
    * read, elementwise add.
    */
  def ingest(batch: DataFrame, itemCol: String): Unit = {
    val got = CountMin.counters(batch, itemCol, p).collect()
    got.foreach { r =>
      cells(r.getAs[Int]("r") * p.w + r.getAs[Long]("bucket").toInt) +=
        r.getAs[Long]("c")
    }
    // every item touches exactly one row-0 cell: row 0's mass IS the
    // batch's item count (summing all rows would count each item d×)
    total += got.filter(_.getAs[Int]("r") == 0).map(_.getAs[Long]("c")).sum
  }

  /** Point estimate: min over the item's d cells — ≥ the item's true
    * count in everything ingested, 0 for never-hashed cells.
    */
  def estimate(item: String): Long =
    (0 until p.d).map(r => cells(r * p.w + CountMin.bucketLong(r, item, p.w))).min

  /** Persist non-zero cells plus the total AND the sketch shape as the
    * next COMMITTED generation under `path` — sentinel last, torn
    * writes can never shadow the previous summary. The shape rides
    * along (idx −2 → d, idx −3 → w) because the cell indices are flat
    * row-major: a resume with a different (d, w) whose product still
    * covers the saved indices would silently MISPLACE counters across
    * rows (save w=64, resume w=128 maps saved cell (r=1, b=0) to
    * (r=0, b=64)), after which estimate() can UNDERCOUNT — breaking
    * the overcount-only guarantee the monitor-composition invariant
    * depends on. [[StreamingCountMin.resume]] refuses a shape
    * mismatch as loudly as a torn generation.
    *
    * FORMAT BREAK (r14): generations written before the shape rows
    * existed carry no (d, w) and are refused by default on resume —
    * the saved indices cannot be trusted into ANY shape the file does
    * not itself state. An operator who knows the sketch's original
    * Params can pass `allowLegacy = true` to resume such a generation
    * under the caller's shape (the caller vouches for it); otherwise
    * pre-r14 checkpoints must be rebuilt.
    */
  def save(path: String, spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    val frame = (cells.zipWithIndex.collect { case (c, i) if c != 0L =>
      (i, c, false) }.toSeq ++
      Seq((-2, p.d.toLong, false), (-3, p.w.toLong, false), (-1, total, true)))
      .toDF("idx", "c", "is_n").coalesce(1)
    Dedup.writeGenAndGc(path, Seq("cms" -> frame))
  }
}

object StreamingCountMin {
  def apply(p: CountMin.Params): StreamingCountMin = new StreamingCountMin(p)

  /** Resume from the newest COMMITTED generation of
    * [[StreamingCountMin.save]]; torn generations are skipped or
    * refused loudly, never half-read. `allowLegacy` accepts a
    * SHAPE-LESS generation (written before r14's shape rows) under the
    * caller's `p` — an explicit "I know the original Params" opt-in;
    * a generation that DOES carry a shape is still required to match
    * exactly, allowLegacy or not (a stated-but-different shape is a
    * real mismatch, never a trust question).
    */
  def resume(p: CountMin.Params, path: String,
      spark: org.apache.spark.sql.SparkSession,
      allowLegacy: Boolean = false): StreamingCountMin = {
    val base = Dedup.newestCommittedGen(spark, path, Seq("cms"), "CMS summary")
    val rows = spark.read.parquet(s"$base/cms").collect()
    val cells = new Array[Long](p.d * p.w)
    var n = 0L
    var savedD = -1L
    var savedW = -1L
    rows.foreach { r =>
      val idx = r.getAs[Int]("idx")
      if (r.getAs[Boolean]("is_n")) n = r.getAs[Long]("c")
      else if (idx == -2) savedD = r.getAs[Long]("c")
      else if (idx == -3) savedW = r.getAs[Long]("c")
    }
    // shape gate BEFORE touching cells: flat row-major indices only
    // mean what (d, w) said they meant at save time — resuming into a
    // different shape would silently misplace counters and let
    // estimate() undercount. Refuse as loudly as a torn generation.
    require(allowLegacy || (savedD > 0 && savedW > 0),
      s"CMS summary at $base/cms carries no sketch shape — refusing to " +
        "resume (pre-r14 or torn generation; pass allowLegacy = true to " +
        "resume under the caller's Params if the original shape is known)")
    // a PRESENT shape must match even under allowLegacy: the flag
    // vouches for a missing shape, it cannot override a stated one
    require(savedD <= 0 || (savedD == p.d && savedW == p.w),
      s"CMS summary at $base/cms was saved with shape d=$savedD w=$savedW " +
        s"but resume asked for d=${p.d} w=${p.w} — a shape change would " +
        "misplace counters and break the overcount-only guarantee")
    rows.foreach { r =>
      val idx = r.getAs[Int]("idx")
      if (!r.getAs[Boolean]("is_n") && idx >= 0)
        cells(idx) = r.getAs[Long]("c")
    }
    new StreamingCountMin(p, cells, n)
  }
}
