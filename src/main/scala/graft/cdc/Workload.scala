package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic CDC workload generator.
  *
  * Reference: `internal/util/workload` + `internal/cmd/workload` generate
  * a parent/child two-table workload to exercise FK-consistent apply
  * order.
  *
  * Spark-first design: generation is `spark.range` (distributed, no
  * driver loop, no RNG — hash functions of the index give deterministic
  * pseudo-randomness that is stable across partitioning), and the
  * FK-consistency check is a `left_anti` join that must come back empty.
  */
object Workload {

  /** `nParents` parent rows with a deterministic payload. */
  def parents(spark: SparkSession, nParents: Long): DataFrame =
    spark.range(nParents)
      .select(
        col("id").as("parent_id"),
        pmod(xxhash64(col("id")), lit(1000L)).as("val"))

  /** `nChildren` child rows, each referencing a parent via a hash of its
    * own id — uniform fan-out without any shuffle.
    */
  def children(spark: SparkSession, nChildren: Long, nParents: Long): DataFrame =
    spark.range(nChildren)
      .select(
        col("id").as("child_id"),
        pmod(xxhash64(col("id"), lit(7L)), lit(nParents)).as("parent_id"),
        pmod(xxhash64(col("id"), lit(13L)), lit(1000L)).as("val"))

  /** Orphan check: children whose parent does not exist. An apply order
    * is FK-consistent iff this is empty after every resolved window.
    */
  def orphans(children: DataFrame, parents: DataFrame): DataFrame =
    children.join(parents.select("parent_id"), Seq("parent_id"), "left_anti")

  /** One-row summary the driver can smoke-check — fully declarative
    * (three scalar aggregates cross-joined; no driver-side actions).
    */
  def consistencyReport(spark: SparkSession, nParents: Long, nChildren: Long): DataFrame = {
    val p = parents(spark, nParents)
    val c = children(spark, nChildren, nParents)
    p.agg(count(lit(1)).as("n_parents"))
      .crossJoin(c.agg(count(lit(1)).as("n_children")))
      .crossJoin(orphans(c, p).agg(count(lit(1)).as("n_orphans")))
  }
}
