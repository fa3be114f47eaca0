package graft

import graft.ops.Materialize
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The cluster-safe [[Materialize]] seam's contract, in one place
  * (moved here from LastValueSpec in r14 so the Scaladoc's pointer
  * names a suite that exists): the persist leg's level + eagerness +
  * row fidelity, the local-master localCheckpoint pick, and the
  * doc's key cluster claim — a double-replica block loss recomputes
  * DETERMINISTICALLY through a range exchange, because the cached
  * RDD graph holds ONE RangePartitioner whose sampled boundaries
  * were fixed when the DAG first ran; recompute reuses the
  * partitioner object, never re-samples. (First-attempt TASK loss
  * during the barrier's own count() job is covered separately in
  * FaultToleranceSpec's "clusterBarrier materialization survives
  * first-attempt task loss".)
  */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  test("clusterBarrier: DISK_ONLY_2, eager, same rows") {
    val df = (1 to 300).map(i => (i.toLong, (i % 5).toLong)).toDF("id", "k")
      .repartitionByRange(4, col("k"), col("id"))
    val m = Materialize.clusterBarrier(df)
    // eager + replicated persistence (locally one replica can land,
    // but the REQUESTED level must be the 2-replica disk level)
    assert(m.storageLevel === StorageLevel.DISK_ONLY_2)
    assert(m.count() === 300)
    assert(m.exceptAll(df).count() === 0)
    Materialize.release(m)
  }

  test("barrier picks localCheckpoint on a local master") {
    // the local leg must keep the r12 semantics: truncated lineage
    // (ExistingRDD scan), not a persisted view of the original plan
    val df = (1 to 10).toDF("id")
    val m = Materialize.barrier(df)
    assert(m.queryExecution.optimizedPlan.collectLeaves()
      .exists(_.getClass.getSimpleName.contains("LogicalRDD")))
  }

  test("clusterBarrier recompute after total block loss is deterministic") {
    // Simulate the worst cluster case — BOTH DISK_ONLY_2 replicas of
    // every block gone — by unpersisting the cached RDD at the RDD
    // level, NOT through the DataFrame: the CacheManager entry (and
    // its memoized cached-buffers RDD) survives, so the next action
    // walks the SAME RDD graph, finds no blocks, and recomputes each
    // partition from lineage — exactly what a cluster does when a
    // block and its replica are lost. The recompute crosses the
    // range exchange, and the rows INCLUDING __pid must come back
    // bit-identical: the ShuffledRowRDD's RangePartitioner is one
    // fixed object in that graph, so a recompute can never re-sample
    // new boundaries (the r12 partial-sampling double-count is
    // structurally impossible after the barrier).
    val idsBefore = spark.sparkContext.getPersistentRDDs.keySet
    val df = (1 to 1000)
      .map(i => ((i * 2654435761L) % 997, i.toLong)).toDF("k", "id")
      .repartitionByRange(4, col("k"), col("id"))
      .withColumn("__pid", spark_partition_id())
    val m = Materialize.clusterBarrier(df)
    val before = m.collect().map(_.toSeq).sortBy(_.toString()).toSeq
    val cachedIds = spark.sparkContext.getPersistentRDDs.keySet -- idsBefore
    assert(cachedIds.nonEmpty, "barrier registered no persistent RDD")
    spark.sparkContext.getPersistentRDDs
      .filter { case (id, _) => cachedIds(id) }
      .values.foreach(_.unpersist(blocking = true)) // drop every block
    val after = m.collect().map(_.toSeq).sortBy(_.toString()).toSeq
    assert(after == before,
      "recompute after block loss changed rows/__pid — range boundaries re-sampled")
  }
}
