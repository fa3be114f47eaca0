package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** A mergeable Misra-Gries summary: at most `k` counters plus the
  * number of items consumed. The INVARIANT both `reduce` and `merge`
  * preserve (Misra & Gries 1982; mergeability per Agarwal et al. 2012,
  * "Mergeable summaries", PODS): for every item t,
  *
  *   true_count(t) − n/(k+1)  ≤  stored(t)  ≤  true_count(t)
  *
  * (stored = 0 when absent). So any item whose true share exceeds
  * 1/(k+1) MUST survive with a positive counter — the summary is a
  * guaranteed SUPERSET of the heavy hitters, never a miss.
  */
case class MgSummary(counts: Map[String, Long], n: Long)

/** Typed Misra-Gries aggregate. Spark's partial-aggregation pipeline is
  * exactly the mergeable-summary model: each input partition folds its
  * rows through [[reduce]] (bounded state: ≤ k+1 counters, O(1)
  * amortized — every decrement event retires k+1 units of count, so
  * total decrement work is ≤ n/(k+1) events × O(k)), the shuffle moves
  * ONE ≤k-entry summary per partition, and [[merge]] combines them
  * pointwise then trims back to k by subtracting the (k+1)-th largest
  * count (the Agarwal et al. merge — same error bound as sequential
  * MG). Compare a plain `groupBy(item).count()`: its shuffle carries
  * every per-partition DISTINCT item, which under a long-tailed corpus
  * is the corpus' whole vocabulary per partition.
  */
class MisraGries(k: Int)
    extends Aggregator[String, MgSummary, MgSummary] with Serializable {
  require(k > 0, "k must be positive")

  def zero: MgSummary = MgSummary(Map.empty, 0L)

  def reduce(b: MgSummary, item: String): MgSummary = {
    val m = b.counts
    val m2 = m.get(item) match {
      case Some(c) => m.updated(item, c + 1L)
      case None if m.size < k => m.updated(item, 1L)
      // full and unseen: decrement every counter (the new item's
      // implicit counter of 1 decrements to 0 — it is not stored)
      case None =>
        m.iterator.collect { case (t, c) if c > 1L => (t, c - 1L) }.toMap
    }
    MgSummary(m2, b.n + 1L)
  }

  def merge(a: MgSummary, b: MgSummary): MgSummary = {
    val combined = b.counts.foldLeft(a.counts) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    val trimmed =
      if (combined.size <= k) combined
      else {
        // subtract the (k+1)-th largest count from every counter and
        // drop the non-positive — at most k survive, and any item's
        // loss is bounded by what the dropped counters themselves prove
        // was low-count mass
        val kth = combined.valuesIterator.toArray.sortBy(-_).apply(k)
        combined.iterator.collect { case (t, c) if c > kth => (t, c - kth) }
          .toMap
      }
    MgSummary(trimmed, a.n + b.n)
  }

  def finish(r: MgSummary): MgSummary = r
  def bufferEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
  def outputEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
}

/** Exact heavy hitters at corpus scale — the two-pass
  * candidates-then-recount plan.
  *
  * The naive exact plan (`groupBy(item).count().filter(cnt ≥ T)`)
  * shuffles one row per DISTINCT item per partition: at 100 TB the
  * long tail — n-grams seen once, which under Zipf is most of the
  * vocabulary — dominates the shuffle even though none of it can ever
  * clear the threshold. The classic fix (Misra-Gries prefilter + exact
  * recount of the survivors) keeps the tail out of every shuffle:
  *
  *   pass 1: one [[MisraGries]] summary per partition (bounded state),
  *           merged to ≤ k candidate items — shuffle volume k·P rows
  *           instead of the per-partition vocabulary;
  *   pass 2: re-scan filtered to the ≤ k candidates (a broadcast hash
  *           set probe, codegen'd) and count THOSE exactly — shuffle
  *           volume ≤ k rows per partition.
  *
  * With k ≥ ⌈2/minShare⌉ the MG error bound n/(k+1) < minShare·n/2
  * guarantees every true heavy hitter is a candidate, so the output is
  * EXACT and deterministic — identical to the naive plan, independent
  * of partitioning, row order, or merge shape. The sketch only ever
  * widens the candidate set; the recount makes the final answer.
  */
object Frequency {

  /** Streaming corpus monitor: fold one [[MisraGries]] summary per
    * micro-batch into O(k) driver state — the heavy-hitter analogue of
    * the streaming dedup loops. Mergeability is the whole design: the
    * folded state obeys the same n/(k+1) bound as a batch pass over
    * everything seen, so `candidates` is a guaranteed superset of the
    * stream-so-far heavy hitters at any trigger, with no token-keyed
    * shuffle and no keyed state store (the state is ONE ≤k-entry map,
    * not one entry per distinct token — a web stream's distinct-token
    * state would grow without bound). Exact counts, when needed, come
    * from a recount over the accumulated corpus filtered to the
    * candidates ([[heavyHitters]]'s second pass).
    *
    * `save`/`resume` persist the summary as a tiny parquet frame
    * (≤k+1 rows) for restart — the fold is associative, so resuming
    * from a saved summary and folding the remaining batches equals the
    * single-pass summary over everything (spec-pinned).
    */
  final class StreamingHeavyHitters private (k: Int,
      private var state: MgSummary) {
    def this(k: Int) = this(k, MgSummary(Map.empty, 0L))
    private val mg = new MisraGries(k)

    def summary: MgSummary = state

    /** Fold one micro-batch of items (nulls ignored). */
    def ingest(batch: DataFrame, itemCol: String): Unit = {
      val s = batch.select(col(itemCol).cast("string").as("item"))
        .filter(col("item").isNotNull)
        .as(Encoders.STRING)
        .select(new MisraGries(k).toColumn).head()
      state = mg.merge(state, s)
    }

    /** Candidate items at `minShare` of the stream so far — a
      * guaranteed superset of the true heavy hitters: any item with
      * true count ≥ minShare·n has stored count ≥ minShare·n −
      * n/(k+1) (the MG bound), so that is the cutoff. A cutoff ≤ 0
      * (k too small for minShare) degrades to every stored key —
      * still ≤ k, still a superset.
      */
    def candidates(minShare: Double): Seq[String] = {
      val cutoff = state.n.toDouble * minShare - state.n.toDouble / (k + 1)
      state.counts.collect { case (t, c) if c.toDouble >= cutoff => t }.toSeq
    }

    /** Persist the summary: one row per counter plus an n row. */
    def save(path: String, spark: org.apache.spark.sql.SparkSession): Unit = {
      import spark.implicits._
      (state.counts.toSeq.map { case (t, c) => (t, c, false) } :+
        (("", state.n, true)))
        .toDF("item", "cnt", "is_n")
        .coalesce(1).write.mode("overwrite").parquet(path)
    }
  }

  object StreamingHeavyHitters {
    def apply(k: Int): StreamingHeavyHitters = new StreamingHeavyHitters(k)

    /** Resume from [[StreamingHeavyHitters.save]] output. */
    def resume(k: Int, path: String,
        spark: org.apache.spark.sql.SparkSession): StreamingHeavyHitters = {
      val rows = spark.read.parquet(path).collect()
      val n = rows.find(_.getAs[Boolean]("is_n"))
        .map(_.getAs[Long]("cnt")).getOrElse(0L)
      val counts = rows.filterNot(_.getAs[Boolean]("is_n"))
        .map(r => r.getAs[String]("item") -> r.getAs[Long]("cnt")).toMap
      new StreamingHeavyHitters(k, MgSummary(counts, n))
    }
  }

  /** All values of `itemCol` with frequency ≥ ceil(minShare · n) where
    * n is the total (non-null) item count — exact counts, exact
    * threshold. Output: (itemCol, cnt, share). NULL items are ignored
    * (they are droppable noise in every in-repo item domain, and a
    * null key would also fall out of the recount's group-by contract).
    */
  def heavyHitters(items: DataFrame, itemCol: String, minShare: Double,
      k: Int): DataFrame = {
    require(minShare > 0.0 && minShare <= 1.0, "minShare must be in (0, 1]")
    require(k >= math.ceil(2.0 / minShare).toInt,
      s"k=$k too small for minShare=$minShare: need k >= ceil(2/minShare) " +
        "so the MG error bound n/(k+1) stays under half the threshold")
    // both passes read the SAME projection (string-cast, null-free):
    // a non-string item column must compare against the string
    // candidates under the cast it was summarized with
    val base = items.select(col(itemCol).cast("string").as(itemCol))
      .filter(col(itemCol).isNotNull)
    // one-row control read: the merged ≤k-entry summary + total n —
    // bounded by construction, never by data skew
    val summary = base.as(Encoders.STRING)
      .select(new MisraGries(k).toColumn).head()
    val threshold = math.ceil(minShare * summary.n.toDouble).toLong
    val candidates = summary.counts.keys.toSeq
    val filtered =
      if (candidates.isEmpty) base.filter(lit(false))
      else base.filter(col(itemCol).isInCollection(candidates))
    filtered
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .withColumn("share", col("cnt").cast("double") / lit(summary.n.toDouble))
  }
}
