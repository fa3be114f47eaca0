package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Three-way merge conflict detection / resolution.
  *
  * Reference: `internal/util/merge/standard.go` — for each property,
  * compare the mutation's before-image with the target's current value;
  * if the target diverged (target ≠ before and target ≠ proposed) the
  * property conflicts and goes to a fallback merger or the DLQ.
  *
  * Spark-first design: when replaying an ordered mutation log, "the
  * target's current value" for mutation N is the value applied by
  * mutation N-1 on that key — `lag(...) over (partition by key order by
  * time)`. The window is per-key (narrow partitions after one shuffle on
  * the key); conflicts, resolutions, and clean applies fall out as
  * column expressions.
  */
object MergeOps {

  /** Detect per-row merge conflicts in a keyed, timestamped mutation log.
    *
    * For each mutation we reconstruct `target` (the previous value on the
    * key), compare it with the mutation's `before` image, and classify:
    *  - clean      — target == before (safe to apply proposed)
    *  - idempotent — target == proposed (already applied)
    *  - conflict   — target diverged; resolved via `resolver`
    */
  def threeWayMerge(
      muts: DataFrame,
      key: String,
      orderCols: Seq[Column],
      before: Column,
      proposed: Column,
      resolver: (Column, Column, Column) => Column): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(orderCols: _*)
    val target = lag(proposed, 1).over(w)
    val status = when(target.isNull || target === before, lit("clean"))
      .when(target === proposed, lit("idempotent"))
      .otherwise(lit("conflict"))
    muts
      .withColumn("target_value", target)
      .withColumn("merge_status", status)
      .withColumn(
        "resolved_value",
        when(col("merge_status") === "conflict", resolver(target, before, proposed))
          .otherwise(proposed))
  }
}
