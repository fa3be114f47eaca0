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
  * Spark-first design: when replaying an ordered mutation log, the
  * target's prior value for mutation N is approximated as mutation
  * N-1's PROPOSED value — `lag(proposed) over (partition by key order
  * by time)`. This is the "last writer's proposal was applied" model:
  * it deliberately does not thread resolver outputs forward (a true
  * sequential fold of resolutions isn't window-expressible; the
  * property-level [[mergeBags]] covers single-conflict resolution
  * faithfully). Conflict classification is therefore relative to the
  * proposed-apply history, which is the common CDC replay situation.
  */
object MergeOps {

  /** Property-level three-way merge over column bags, the faithful
    * re-expression of `merge/standard.go:merge()`: each property of the
    * union of (before, proposed, target) maps is classified
    * independently — unchanged (before = proposed → keep target),
    * idempotent (target = proposed), safe (target absent or = before →
    * apply proposed), else conflicting (kept at target value, property
    * name reported in `unmerged`, as the reference hands conflicts to a
    * fallback merger / DLQ).
    *
    * Bags are `map<string,string>` of property → canonical JSON text;
    * a missing key is the reference's `undefined` sentinel (SQL NULL
    * here) while the JSON text `"null"` is set-to-null — preserving the
    * tri-state the reference builds with its `undefined{}` marker.
    * Pure map expressions (`map_zip_with`/`map_filter`): no UDFs, runs
    * per row wherever the mutation lands.
    */
  def mergeBags(before: Column, proposed: Column, target: Column): Column = {
    // map_zip_with is null-intolerant: a NULL bag (e.g. no before-image
    // on a changefeed without diff) would null the whole result. A NULL
    // bag means "no properties", which is exactly the empty map.
    val emptyBag = map().cast("map<string,string>")
    val b0 = coalesce(before, emptyBag)
    val p0 = coalesce(proposed, emptyBag)
    val t0 = coalesce(target, emptyBag)
    val bp = map_zip_with(b0, p0, (_, b, p) => struct(b.as("b"), p.as("p")))
    val all = map_zip_with(bp, t0, (_, x, t) =>
      struct(x.getField("b").as("b"), x.getField("p").as("p"), t.as("t")))
    def unchanged(v: Column) = v.getField("b") <=> v.getField("p")
    def idempotent(v: Column) = v.getField("t") <=> v.getField("p")
    def safe(v: Column) = v.getField("t").isNull || (v.getField("t") <=> v.getField("b"))
    val merged = transform_values(all, (_, v) =>
      when(unchanged(v), v.getField("t"))
        .when(idempotent(v), v.getField("p"))
        .when(safe(v), v.getField("p"))
        .otherwise(v.getField("t")))
    val unmerged = map_keys(map_filter(all, (_, v) =>
      !unchanged(v) && !idempotent(v) && !safe(v)))
    // trivial case (standard.go: empty target → apply proposed as-is)
    when(size(map_keys(t0)) === 0,
      struct(p0.as("merged"), array().cast("array<string>").as("unmerged")))
      .otherwise(struct(
        map_filter(merged, (_, v) => v.isNotNull).as("merged"),
        array_sort(unmerged).as("unmerged")))
  }

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
      keys: Seq[String],
      orderCols: Seq[Column],
      before: Column,
      proposed: Column,
      resolver: (Column, Column, Column) => Column): DataFrame = {
    require(keys.nonEmpty, "threeWayMerge needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
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
