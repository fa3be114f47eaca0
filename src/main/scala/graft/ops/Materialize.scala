package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The ONE seam for correctness-load-bearing materialization.
  *
  * Several operators must pin a frame to a SINGLE physical evaluation
  * before multiple consumers derive from it (the range-rank legs, the
  * chunked-verify slices, the BPE merge table): without a barrier each
  * consumer re-evaluates the lineage independently, and a
  * non-deterministic stage in that lineage — RangePartitioner's
  * reservoir sample under partial sampling is the in-repo case — lets
  * the consumers silently disagree (the r12 partial-sampling
  * double-count).
  *
  * `localCheckpoint(eager = true)` is the right barrier on a
  * single-JVM master: truncated lineage, blocks in the one executor,
  * no HDFS round-trip. But it is NOT executor-loss-tolerant — local
  * checkpoints live only on executors, so on a real cluster losing one
  * executor mid-query kills the job unrecoverably (invisible on
  * local[32], fatal at 1000 executors). The cluster path therefore
  * uses `persist(DISK_ONLY_2)` + a count barrier instead:
  *
  *  - DISK_ONLY_2 keeps TWO replicas, so a single executor loss serves
  *    the block from the replica with no recompute at all;
  *  - when both replicas are lost, the lost partitions recompute from
  *    lineage — and that recompute is DETERMINISTIC even through a
  *    range exchange, because a persisted frame is one physical plan
  *    with ONE RangePartitioner whose sampled boundaries were fixed
  *    when the DAG first ran; recompute reuses the partitioner object,
  *    never re-samples (spec-pinned in MaterializeSpec's total-block-
  *    loss recompute case; first-attempt TASK loss during the barrier
  *    job itself is FaultToleranceSpec's clusterBarrier case);
  *  - the count() barrier makes the persist EAGER, so every consumer
  *    forked after `barrier` returns reads stored blocks, matching
  *    localCheckpoint's eager contract.
  */
object Materialize {

  /** Materialize `df` once; every later consumer reads the stored
    * result, never re-evaluates the lineage.
    *
    * Cluster masters with a configured checkpoint dir get a RELIABLE
    * checkpoint — the strongest barrier: lineage truncated (the
    * iterative callers' plan-growth fix, same as the local leg) AND
    * blocks on fault-tolerant storage, so executor loss costs a
    * re-read, never a job. Without a checkpoint dir the persist+count
    * fallback below applies.
    */
  def barrier(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.isLocal) df.localCheckpoint(eager = true)
    else if (sc.getCheckpointDir.isDefined) df.checkpoint(eager = true)
    else clusterBarrier(df)
  }

  /** The cluster-mode leg — package-visible so the spec can exercise
    * it on a local master (where `barrier` would pick localCheckpoint).
    */
  private[graft] def clusterBarrier(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.DISK_ONLY_2)
    p.count()
    p
  }

  /** [[barrier]] fused with a one-row aggregate over the pinned frame.
    *
    * Iterative callers (the connected-components loop) need BOTH a
    * materialization barrier and a tiny convergence aggregate every
    * round. Done naively that is TWO driver-sync jobs per round — and
    * at the CC loop's frame sizes the per-round cost is job latency,
    * not compute (measured r15: the suite's heavy dedup family ran
    * FASTER on 8 cores than 32). Here the aggregate IS the
    * materializing action: the frame is marked for materialization
    * lazily and the aggregate's job computes every partition, storing
    * the blocks as it goes — one job, same post-conditions as
    * [[barrier]] (every later consumer reads stored blocks; lineage
    * truncated on the local leg).
    *
    * The reliable-checkpoint leg cannot fuse (an eager reliable
    * checkpoint re-runs the plan to write it; fusing would double
    * compute) and keeps the two-job shape — correctness first on that
    * path, the fusion is a latency optimization for the others.
    */
  def barrierAgg(df: DataFrame,
      agg: org.apache.spark.sql.Column): (DataFrame, org.apache.spark.sql.Row) = {
    val sc = df.sparkSession.sparkContext
    if (sc.isLocal) {
      val pinned = df.localCheckpoint(eager = false)
      (pinned, pinned.agg(agg).collect()(0))
    } else if (sc.getCheckpointDir.isDefined) {
      val pinned = df.checkpoint(eager = true)
      (pinned, pinned.agg(agg).collect()(0))
    } else {
      val p = df.persist(StorageLevel.DISK_ONLY_2)
      (p, p.agg(agg).collect()(0))
    }
  }

  /** Materialize several INDEPENDENT frames concurrently — each gets
    * exactly the [[barrier]] treatment, but the materializing jobs are
    * submitted from separate driver threads (guide §2.6: actions are
    * only sequential because the driver calls them sequentially).
    * Multi-pin operators (collapse membership + shingle + signature
    * frames) otherwise serialize 2–3 small jobs whose cost at converged
    * sizes is job latency, not compute; concurrent submission lets one
    * job's tail back-fill with the next job's tasks. Callers must pass
    * frames with no data dependency on each other's PINNED result
    * (sharing upstream lineage is fine — each job evaluates its own).
    */
  def barrierAll(dfs: Seq[DataFrame]): Seq[DataFrame] =
    if (dfs.lengthCompare(2) < 0) dfs.map(barrier)
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      val pinned = dfs.map(df => Future(barrier(df)))
      pinned.map(Await.result(_, Duration.Inf))
    }

  /** Best-effort release of a frame returned by [[barrier]] once every
    * consumer has run — bounds the blocks held across a long sweep
    * (the 100× suite's driver-heap floor). Non-blocking: safe to call
    * opportunistically; a frame never released is reclaimed by the
    * ContextCleaner when unreferenced.
    */
  def release(df: DataFrame): Unit = df.unpersist(blocking = false)

  /** Sweep hygiene: drop EVERY block the context still tracks —
    * localCheckpoint blocks included, which `release` can't reach (the
    * checkpointed DataFrame's unpersist doesn't touch the internal
    * RDD). Between independent operations (the 100× suite's inter-op
    * seam) this frees finished barriers deterministically instead of
    * waiting for a driver GC to let the ContextCleaner notice them —
    * in local mode those blocks live in the DRIVER's heap, which is
    * where the r12 sweep's 96 GB floor came from. Do NOT call while
    * frames from [[barrier]] are still in use: their blocks drop and,
    * with lineage truncated, a later read fails.
    */
  def releaseAll(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
}
