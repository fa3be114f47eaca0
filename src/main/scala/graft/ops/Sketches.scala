package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
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

  /** Driver-side twin of [[uniformHash]] — spec oracles and monitor
    * callers hashing outside a plan must agree with the column
    * expression bit-for-bit.
    */
  def uniformHashLong(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Per-scope KMV distinct-count estimates, plus the exact count and
    * relative error for audit (at sketch scale the exact count is the
    * point of the exercise — at 100 TB you'd keep only the k-row
    * sketches). `df` must carry `scope` and `h` (a uniform LONG hash);
    * rows with duplicate (scope, h) collapse first — KMV is a set
    * sketch. The k-minimum selection IS [[bottomKSample]] with v = h
    * (r14, replacing a per-scope window over the distinct-hash frame):
    * each task keeps its local k smallest hashes per scope in a
    * bounded heap, so one dominant scope costs its local bottom-ks,
    * never one task's sort of all its distinct hashes — the
    * associative per-partition k-minimum combine the Scaladoc above
    * describes, shared with the quantile sample machinery.
    *
    * Estimate rule: with fewer than k distinct values the sketch IS
    * the set (estimate = exact); otherwise (k−1)·M/h_k as one double
    * multiply-divide chain.
    */
  def kmvEstimates(scoped: DataFrame, k: Int): DataFrame = {
    require(k > 1, "k must exceed 1")
    val distinctHashes = scoped.select("scope", "h").distinct()
    val sketch = bottomKSample(distinctHashes.withColumn("v", col("h")), k)
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

  /** Per-scope BOTTOM-k rows by (h, v) — the mergeable uniform-sample
    * summary underlying [[sampledQuantiles]]. Bottom-k by a uniform
    * row hash IS a deterministic k-row uniform sample without
    * replacement, and it is MERGEABLE the same way KMV is: the union's
    * bottom-k is the bottom-k of the concatenated bottom-ks (Agarwal
    * et al. 2012 treat the random sample as the canonical mergeable
    * summary; hashing replaces the RNG so the sample is a pure
    * FUNCTION of the data — re-derivable by a SQL oracle, identical
    * across engines, partitionings and replays).
    *
    * The plan is the associative combine written as two bounded
    * stages, NEVER a per-scope sort — and (r14) stage 1 is a genuine
    * MAP-SIDE pass: a narrow mapPartitions keeps each task's local
    * bottom-k per scope in a bounded heap (O(log k) per row, O(scopes
    * · k) task memory), so the corpus itself is NEVER shuffled — only
    * the ≤ k·P survivors per scope move, into stage 2's
    * control-frame-sized rank window. (The previous formulation wrote
    * stage 1 as a Window over (spark_partition_id, scope), which
    * Catalyst cannot tie to the physical partitioning — it inserted a
    * full hash exchange of the corpus. The heap pass is the honest
    * map-side combine; mapPartitions is justified here because no
    * built-in bounded top-k aggregate exists over arbitrary payload
    * columns, and the alternative IS that corpus shuffle.) One
    * dominant scope costs its local bottom-ks, not one task's sort of
    * the whole scope. Output carries `rank` (1-based position in the
    * scope's sample by (h, v)) and every input column. `h` and `v`
    * must be LONG (every caller's hash/value type; enforced loudly);
    * a NULL h or v sorts first, like the window ordering it replaces.
    *
    * TASK-MEMORY CONTRACT (r15): the heap map holds O(distinct scopes
    * in the partition × k) deserialized rows — fine for the per-source
    * scopes every registered caller uses (≤ dozens), but a
    * high-cardinality scope (per-domain, per-url) would grow it
    * unboundedly; the sort-based window this pass replaced spilled to
    * disk, so the heap path must not trade that for an executor OOM.
    * `maxScopesPerTask` bounds it: once a task tracks that many scopes,
    * rows of scopes NOT already tracked pass through UNPRUNED straight
    * to stage 2's window (exactly the shuffle the window formulation
    * pays — graceful degradation, never an OOM, and never a wrong
    * answer: stage 2 re-ranks and re-bounds whatever reaches it, so
    * extra survivors are filtered, not kept). Established scopes keep
    * their heaps — the long-lived scopes are where pruning pays.
    */
  def bottomKSample(scoped: DataFrame, k: Int,
      maxScopesPerTask: Int = 4096): DataFrame = {
    require(k > 0, "k must be positive")
    require(maxScopesPerTask > 0, "maxScopesPerTask must be positive")
    val schema = scoped.schema
    for (c <- Seq("h", "v"))
      require(schema(c).dataType == org.apache.spark.sql.types.LongType,
        s"bottomKSample: column '$c' must be LONG, got ${schema(c).dataType}")
    val hIdx = schema.fieldIndex("h")
    val vIdx = schema.fieldIndex("v")
    val sIdx = schema.fieldIndex("scope")
    // nulls-first total order on (h, v) — identical to the Window's
    // default null ordering; payload columns never influence rank
    val ord: Ordering[org.apache.spark.sql.Row] = Ordering.by { r =>
      (!r.isNullAt(hIdx), if (r.isNullAt(hIdx)) 0L else r.getLong(hIdx),
        !r.isNullAt(vIdx), if (r.isNullAt(vIdx)) 0L else r.getLong(vIdx))
    }
    implicit val enc: Encoder[org.apache.spark.sql.Row] = Encoders.row(schema)
    val local = scoped.mapPartitions { it =>
      val heaps = scala.collection.mutable.HashMap
        .empty[Any, java.util.PriorityQueue[org.apache.spark.sql.Row]]
      // lazy flatMap, not an eager foreach: over-cap pass-through rows
      // stream straight to the output iterator instead of accumulating
      // anywhere — task memory stays ≤ maxScopesPerTask × k rows
      val pruned = it.flatMap { r =>
        val key = r.get(sIdx)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None if heaps.size < maxScopesPerTask =>
            val h = new java.util.PriorityQueue[org.apache.spark.sql.Row](
              math.max(k, 1), ord.reverse)
            heaps.put(key, h); h
          case None => null // scope cap reached: pass the row through
        }
        if (heap == null) Iterator.single(r)
        else {
          // head = LARGEST kept (h, v): a new row either beats it
          // (pop + push, O(log k)) or is discarded in O(1)
          if (heap.size < k) heap.add(r)
          else if (ord.lt(r, heap.peek())) { heap.poll(); heap.add(r) }
          Iterator.empty
        }
      }
      // ++'s by-name rhs evaluates only after `pruned` is exhausted,
      // i.e. after every heap is fully populated
      pruned ++ heaps.valuesIterator.flatMap { h =>
        import scala.jdk.CollectionConverters._
        h.iterator().asScala
      }
    }
    val globalW = Window.partitionBy(col("scope")).orderBy(col("h"), col("v"))
    local.withColumn("rank", row_number().over(globalW))
      .filter(col("rank") <= k)
  }

  /** Per-scope APPROXIMATE quantiles from a [[bottomKSample]], with
    * the exact answer joined alongside for audit — the quantile
    * complement of [[kmvEstimates]] (distinct counts) and the batch
    * complement of [[graft.ops.Frequency]]'s row-90/93 pairing.
    *
    * `scoped` must carry (scope, h, v): `h` a uniform row hash
    * ([[uniformHash]] of the row's IDENTITY — not the value — so the
    * sample is uniform over rows), `v` the measured value. The
    * estimate at q is the EXACT discrete quantile of the k-row sample
    * (value at rank ⌈q·m⌉ of the sample ordered by (v, h), m =
    * sample size) — integer-rank selection, no interpolation, so both
    * engines agree bit-for-bit and the sketch's error is AUDITED via
    * the joined exact value ([[Buckets.quantilesByRange]], the row-91
    * machinery — itself never a per-scope corpus sort). A scope with
    * ≤ k rows samples itself: est = exact by construction. Sampling
    * error is the classic order-statistic bound (±O(1/√k) in rank);
    * at 100 TB you keep only the k-row samples per scope and drop the
    * exact leg — the sample, unlike the corpus, folds per micro-batch
    * in O(k) driver state ([[StreamingQuantiles]]).
    *
    * Output: (scope, q, est, exact, err = est − exact) — err in value
    * units, integer-exact for integral `v`.
    */
  def sampledQuantiles(scoped: DataFrame, k: Int, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must sit in (0, 1]")
    val sample = bottomKSample(scoped, k)
    // re-rank the sample by VALUE (the h-rank picked the rows; the
    // quantile reads the value order) — a ≤k-row-per-scope frame
    val valW = Window.partitionBy(col("scope")).orderBy(col("v"), col("h"))
    val byValue = sample.withColumn("__vr", row_number().over(valW))
    val targets = sample.groupBy("scope").agg(count(lit(1)).as("__m"))
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .withColumn("__vr", ceil(col("q") * col("__m").cast("double")).cast("int"))
      .drop("__m")
    val est = byValue.join(broadcast(targets), Seq("scope", "__vr"))
      .select(col("scope"), col("q"), col("v").as("est"))
    val exact = Buckets.quantilesByRange(scoped, "v", "h", qs, Seq("scope"))
      .select(col("scope"), col("q"), col("value").as("exact"))
    est.join(exact, Seq("scope", "q"))
      .withColumn("err", col("est") - col("exact"))
  }

  /** Driver-side bottom-k merge (O(k log k) on ≤2k entries) — the
    * streaming monitor's per-trigger fold. Associative and
    * commutative: bottom-k of a union is the bottom-k of the
    * concatenated bottom-ks.
    */
  def mergeSamples(a: QSample, b: QSample, k: Int): QSample =
    QSample((a.entries ++ b.entries).sortBy(e => (e.h, e.v)).take(k),
      a.n + b.n)
}

/** One sampled (h, v) row of a [[QSample]]. */
case class QEntry(h: Long, v: Long)

/** A mergeable bottom-k quantile summary: the k rows with smallest
  * (h, v) — a deterministic uniform sample — plus the total row count.
  * Merging two summaries = bottom-k of their concatenation; estimates
  * are integer-rank selections over the sample (the
  * [[Sketches.sampledQuantiles]] rule).
  */
case class QSample(entries: Seq[QEntry], n: Long) {
  /** Discrete quantile estimate: value at rank ⌈q·m⌉ of the sample
    * ordered by (v, h); None on an empty sample. Exact whenever the
    * stream so far fit inside the sample (n ≤ k).
    */
  def estimate(q: Double): Option[Long] = {
    require(q > 0.0 && q <= 1.0, "q must sit in (0, 1]")
    if (entries.isEmpty) None
    else {
      val byValue = entries.sortBy(e => (e.v, e.h))
      Some(byValue(math.ceil(q * byValue.size).toInt - 1).v)
    }
  }
}

/** Mutable bottom-k buffer: a size-bounded max-heap of (h, v) — the
  * head is the LARGEST kept pair, so a new row either beats it (pop +
  * push, O(log k)) or is discarded in O(1). Kryo-serialized only at
  * the partial/final shuffle boundary, like [[MgBuf]].
  */
final class BkBuf(val heap: java.util.PriorityQueue[(Long, Long)], var n: Long)
    extends Serializable

/** Typed bottom-k aggregate — Spark's partial aggregation IS the
  * mergeable-sample model: each partition folds to one ≤k-pair heap,
  * the shuffle moves k·P pairs, the merge re-bounds to k. The same
  * two-stage shape as [[Sketches.bottomKSample]], expressed as a
  * single Aggregator for the STREAMING path (one pass per micro-batch
  * yields both the batch's sample and its row count).
  */
class BottomKAgg(k: Int)
    extends Aggregator[(Long, Long), BkBuf, QSample] with Serializable {
  require(k > 0, "k must be positive")
  private def cmp: java.util.Comparator[(Long, Long)] =
    implicitly[Ordering[(Long, Long)]].reverse

  def zero: BkBuf = new BkBuf(new java.util.PriorityQueue(cmp), 0L)

  def reduce(b: BkBuf, row: (Long, Long)): BkBuf = {
    if (b.heap.size < k) b.heap.add(row)
    else if (implicitly[Ordering[(Long, Long)]].lt(row, b.heap.peek())) {
      b.heap.poll(); b.heap.add(row)
    }
    b.n += 1L
    b
  }

  def merge(a: BkBuf, b: BkBuf): BkBuf = {
    val it = b.heap.iterator()
    while (it.hasNext) {
      val row = it.next()
      if (a.heap.size < k) a.heap.add(row)
      else if (implicitly[Ordering[(Long, Long)]].lt(row, a.heap.peek())) {
        a.heap.poll(); a.heap.add(row)
      }
    }
    a.n += b.n
    a
  }

  def finish(r: BkBuf): QSample = {
    val arr = new Array[(Long, Long)](r.heap.size)
    r.heap.toArray(arr)
    QSample(arr.sorted.map { case (h, v) => QEntry(h, v) }.toSeq, r.n)
  }

  def bufferEncoder: Encoder[BkBuf] = Encoders.kryo[BkBuf]
  def outputEncoder: Encoder[QSample] = Encoders.product[QSample]
}

/** Streaming quantile monitor — the quantile analogue of
  * [[Frequency.StreamingHeavyHitters]] (row 93 to row 90): fold one
  * [[BottomKAgg]] summary per micro-batch into O(k) driver state.
  * Mergeability is the design: bottom-k-by-hash of the stream so far
  * equals a batch pass over everything seen (associative, ORDER-
  * INDEPENDENT — unlike MG, the sample is a pure function of the data
  * set), so per-trigger length/score quantiles need no re-scan of the
  * accumulated corpus and no keyed state store. Persistence follows
  * the generation + commit-sentinel discipline.
  */
object StreamingQuantiles {
  def apply(k: Int): StreamingQuantiles = new StreamingQuantiles(k)

  /** Resume from the newest COMMITTED generation of [[StreamingQuantiles.save]];
    * torn generations are skipped or refused loudly, never half-read.
    */
  def resume(k: Int, path: String,
      spark: org.apache.spark.sql.SparkSession): StreamingQuantiles = {
    val base = Dedup.newestCommittedGen(spark, path, Seq("sample"),
      "quantile sample")
    val rows = spark.read.parquet(s"$base/sample").collect()
    val n = rows.find(_.getAs[Boolean]("is_n"))
      .map(_.getAs[Long]("v")).getOrElse(0L)
    val entries = rows.filterNot(_.getAs[Boolean]("is_n"))
      .map(r => QEntry(r.getAs[Long]("h"), r.getAs[Long]("v")))
      .sortBy(e => (e.h, e.v)).toSeq
    new StreamingQuantiles(k, QSample(entries, n))
  }
}

final class StreamingQuantiles private (k: Int, private var state: QSample) {
  def this(k: Int) = this(k, QSample(Seq.empty, 0L))

  def sample: QSample = state

  /** Fold one micro-batch: ONE distributed pass (partial-aggregated
    * bottom-k + count in the same job), then an O(k log k) driver
    * merge. Rows with a NULL hash or value are ignored.
    */
  def ingest(batch: DataFrame, hCol: String, vCol: String): Unit = {
    val s = batch
      .select(col(hCol).cast("long").as("_1"), col(vCol).cast("long").as("_2"))
      .filter(col("_1").isNotNull && col("_2").isNotNull)
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .select(new BottomKAgg(k).toColumn).head()
    state = Sketches.mergeSamples(state, s, k)
  }

  /** Persist the sample (one row per entry plus an n row) as the next
    * committed generation under `path`.
    */
  def save(path: String, spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    val frame = (state.entries.map(e => (e.h, e.v, false)) :+
      ((0L, state.n, true)))
      .toDF("h", "v", "is_n").coalesce(1)
    Dedup.writeGenAndGc(path, Seq("sample" -> frame))
  }
}
