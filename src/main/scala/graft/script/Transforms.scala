package graft.script

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Declarative equivalent of the reference's userscript layer.
  *
  * Reference: `internal/script` runs user-supplied JavaScript against
  * each mutation to filter it, rewrite its columns, or dispatch it to
  * one or more target tables. On Spark, an imperative per-row hook would
  * forfeit codegen and pushdown, so the same three verbs are exposed as
  * a composable pipeline of column expressions — the engine "compiles
  * the userscript" into the plan instead of interpreting it per row.
  */
object Transforms {

  sealed trait Step { def apply(df: DataFrame): DataFrame }

  /** `filter(doc)` — drop mutations the predicate rejects. */
  final case class Filter(pred: Column) extends Step {
    def apply(df: DataFrame): DataFrame = df.filter(pred)
  }

  /** `map(doc)` — rewrite/add columns (reference: mutation rewriting). */
  final case class MapCols(cols: (String, Column)*) extends Step {
    def apply(df: DataFrame): DataFrame =
      cols.foldLeft(df) { case (d, (name, c)) => d.withColumn(name, c) }
  }

  /** Drop columns (reference: deleting properties in the script). */
  final case class DropCols(names: String*) extends Step {
    def apply(df: DataFrame): DataFrame = df.drop(names: _*)
  }

  /** `emit` — one mutation fans out to N output mutations (reference:
    * a script `map` may return MULTIPLE mutations, `internal/script/
    * script.go:35`, each free to retarget its key or table). `rows` is
    * a user expression of type `array<struct<...>>`: posexplode makes
    * one output row per element, `emit_pos` carries the element index,
    * and each struct field OVERWRITES the like-named column (so
    * emitting a new value for the key column IS the key rewrite; new
    * fields become new columns). An empty array drops the row —
    * emit(array()) subsumes filter, exactly as the reference's map
    * returning [] does.
    */
  final case class Emit(rows: Column) extends Step {
    def apply(df: DataFrame): DataFrame = {
      // `__emit` is this stage's scratch column and `emit_pos` is its
      // output index: an input column named `__emit`, or a struct field
      // named `__emit`/`emit_pos`, would collide into duplicate or
      // silently-clobbered columns — reject up front, matching the
      // reserved-name checks in AsOf.asOfJoin / RangeJoin
      if (df.columns.contains("__emit"))
        throw new IllegalArgumentException(
          "emit: input column name '__emit' is reserved")
      // emit_pos always refers to the LAST emit stage: a prior stage's
      // index column is dropped before re-exploding (keeping both would
      // make any later emit_pos reference ambiguous)
      val out = df.drop("emit_pos")
        .select(col("*"), posexplode(rows).as(Seq("emit_pos", "__emit")))
      val fields = out.schema("__emit").dataType match {
        case st: StructType => st.fieldNames.toSeq
        case other => throw new IllegalArgumentException(
          s"emit expects an array<struct<...>> expression, " +
            s"got array element type ${other.simpleString}")
      }
      val reserved = fields.filter(f => f == "__emit" || f == "emit_pos")
      if (reserved.nonEmpty)
        throw new IllegalArgumentException(
          s"emit: struct field name(s) ${reserved.mkString(", ")} are reserved")
      fields.foldLeft(out)((d, f) =>
        d.withColumn(f, col("__emit").getField(f))).drop("__emit")
    }
  }

  /** `merge` — per-table CUSTOM merge function (reference:
    * `internal/script/script.go:641` bindMerge — a user-provided merge
    * fn is a first-class alternative to standard three-way merge, and
    * `api.standardMerge(fallback)` runs the standard rules first, then
    * hands REMAINING conflicts to the user fn). Declarative equivalent:
    * standard [[graft.cdc.MergeOps.mergeBags]] classifies every
    * property; for properties it leaves in `unmerged`, the user's
    * per-property SQL resolution expression runs with `target_v` /
    * `proposed_v` / `before_v` bound to that property's three values
    * (plus every input column in scope — resolution may consult the
    * row). A NULL resolution means "cannot resolve"; whatever is STILL
    * unmerged then hits the fallback: `dlq` (flag the row), `theirs`
    * (take proposed), or `ours` (keep target). Adds `merged` (bag),
    * `unmerged` (array), `is_dlq` columns.
    */
  final case class Merge(before: Column, proposed: Column, target: Column,
      resolve: Seq[(String, Column)], fallback: String) extends Step {
    def apply(df: DataFrame): DataFrame = {
      // scratch names AND output names: a pre-existing `merged`/`is_dlq`
      // column would be silently overwritten by withColumn otherwise
      val reserved = Seq("target_v", "proposed_v", "before_v", "__std", "__res",
        "merged", "unmerged", "is_dlq")
      val clash = reserved.filter(df.columns.contains)
      if (clash.nonEmpty) throw new IllegalArgumentException(
        s"merge: input column name(s) ${clash.mkString(", ")} are reserved")
      var d = df.withColumn("__std",
        graft.cdc.MergeOps.mergeBags(before, proposed, target))
      for ((prop, e) <- resolve) {
        d = d
          .withColumn("target_v", try_element_at(target, lit(prop)))
          .withColumn("proposed_v", try_element_at(proposed, lit(prop)))
          .withColumn("before_v", try_element_at(before, lit(prop)))
          // only a property the STANDARD rules could not settle reaches
          // the user's resolution — api.standardMerge(fallback) order
          .withColumn("__res",
            when(array_contains(col("__std.unmerged"), prop), e.cast("string")))
          .withColumn("__std",
            when(col("__res").isNotNull, struct(
              transform_values(col("__std.merged"),
                (k, v) => when(k === prop, col("__res")).otherwise(v)).as("merged"),
              array_remove(col("__std.unmerged"), prop).as("unmerged")))
              .otherwise(col("__std")))
      }
      d = d.drop("target_v", "proposed_v", "before_v", "__res")
      val out = fallback match {
        case "dlq" => d
          .withColumn("merged", col("__std.merged"))
          .withColumn("unmerged", col("__std.unmerged"))
          .withColumn("is_dlq", size(col("__std.unmerged")) > 0)
        case "theirs" => d
          // drop NULL values after the overlay: an unmerged property
          // ABSENT from proposed (undefined-vs-set conflict) must stay
          // undefined, not become a NULL map entry — mergeBags encodes
          // "undefined" as missing-key everywhere else
          .withColumn("merged", map_filter(transform_values(col("__std.merged"),
            (k, v) => when(array_contains(col("__std.unmerged"), k),
              try_element_at(proposed, k)).otherwise(v)), (_, v) => v.isNotNull))
          .withColumn("unmerged", array().cast("array<string>"))
          .withColumn("is_dlq", lit(false))
        case "ours" => d
          .withColumn("merged", col("__std.merged"))
          .withColumn("unmerged", array().cast("array<string>"))
          .withColumn("is_dlq", lit(false))
        case other => throw new IllegalArgumentException(
          s"merge: unknown fallback '$other' (expected dlq | theirs | ours)")
      }
      out.drop("__std")
    }
  }

  /** `lookup` — read the live TARGET state from inside a script
    * (reference `internal/script/applier.go:49`: `api.getTX()` hands a
    * map/merge function a handle that can query the target database
    * mid-flight). A per-row query would be a driver-side loop; the
    * declarative equivalent is a LEFT JOIN against the target state,
    * planned once — Catalyst broadcasts a small target and falls back
    * to a shuffled equi-join otherwise. `on` binds target key columns
    * to source expressions; `select` projects target columns into the
    * mutation under new names (NULL for an absent key, like getTX()
    * returning no row). The caller passes target state keyed uniquely
    * (the reference reads by primary key); a non-unique side would fan
    * rows out.
    */
  final case class Lookup(side: DataFrame, on: Seq[(String, Column)],
      select: Seq[(String, String)]) extends Step {
    def apply(df: DataFrame): DataFrame = {
      val clash = select.map(_._1).filter(df.columns.contains)
      if (clash.nonEmpty) throw new IllegalArgumentException(
        s"lookup: output column(s) ${clash.mkString(", ")} already exist on the mutation")
      val bad = select.map(_._1).filter(_.startsWith("__lk_"))
      if (bad.nonEmpty) throw new IllegalArgumentException(
        s"lookup: output prefix '__lk_' is reserved (${bad.mkString(", ")})")
      // project the side to scratch-named keys + renamed selections so
      // a name shared by both frames can't become ambiguous in the join
      val keyAlias = on.map { case (k, _) => k -> s"__lk_$k" }
      val prepared = side.select(
        keyAlias.map { case (k, a) => col(k).as(a) } ++
          select.map { case (out, src) => col(src).as(out) }: _*)
      val cond = keyAlias.zip(on).map { case ((_, a), (_, e)) => prepared(a) === e }
        .reduceOption(_ && _).getOrElse(throw new IllegalArgumentException(
          "lookup: needs at least one 'on' key"))
      df.join(prepared, cond, "left").drop(keyAlias.map(_._2): _*)
    }
  }

  /** A pipeline of steps applied in order. */
  final case class Pipeline(steps: Step*) {
    def apply(df: DataFrame): DataFrame = steps.foldLeft(df)((d, s) => s(d))
  }

  /** `dispatch(doc)` — route each mutation to the target tables whose
    * predicate matches (a mutation may land in several, as the
    * reference's dispatch may return multiple tables). Returns the
    * routed frames; unrouted rows land under `defaultRoute` when given.
    */
  def dispatch(df: DataFrame, routes: Seq[(String, Column)],
      defaultRoute: Option[String] = None): Map[String, DataFrame] = {
    val routed = routes.map { case (name, pred) => name -> df.filter(pred) }.toMap
    defaultRoute match {
      case None => routed
      case Some(name) =>
        // no routes at all: everything is unrouted (foldLeft, not
        // reduce — an empty route list must not throw)
        val noneMatched = routes.map(_._2)
          .foldLeft(lit(true))((acc, p) => acc && !coalesce(p, lit(false)))
        val dflt = df.filter(noneMatched)
        // a default named like an explicit route must UNION with it —
        // plain Map + would overwrite and silently drop the routed rows
        routed + (name -> routed.get(name)
          .map(_.unionByName(dflt)).getOrElse(dflt))
    }
  }
}
