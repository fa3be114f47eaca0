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
        routed + (name -> df.filter(noneMatched))
    }
  }
}
