package graft.script

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.functions.expr
import scala.jdk.CollectionConverters._

/** User-SUPPLIED script execution, config-driven.
  *
  * Reference: `internal/script/script.go:35` embeds a goja JavaScript
  * VM and `api.go` exposes configureTable / map / filter / dispatch
  * hooks that run against every mutation — the reference's core
  * extensibility story. A per-row VM on Spark would forfeit codegen,
  * pushdown and whole-stage compilation, so user logic arrives instead
  * as a JSON pipeline whose predicates and column rewrites are SQL
  * EXPRESSION STRINGS: arbitrary user input, parsed and validated once
  * at plan time by Catalyst (`expr()`), then compiled into the plan.
  * The verbs mirror `api.go`: filter / map / drop / emit (1→N fan-out
  * with key rewrite) / dispatch.
  *
  * {{{
  * {"stages": [
  *    {"op": "filter", "where": "value >= 1.0"},
  *    {"op": "map", "cols": {"cents": "cast(round(value*100) as bigint)"}},
  *    {"op": "drop", "cols": ["props"]}],
  *  "dispatch": {"routes": [{"name": "billing", "when": "event_type = 'purchase'"}],
  *               "default": "telemetry"}}
  * }}}
  *
  * A malformed script fails at compile (plan analysis) time with the
  * offending expression — the reference's script compile error — never
  * mid-job per row.
  */
object UserScript {

  private val mapper = new ObjectMapper()

  /** Functions a user script may not call. `expr()` admits the whole SQL
    * function surface, which includes reflection escapes — arbitrary
    * static-method invocation is a strictly WIDER capability than the
    * reference's sandboxed goja VM, so scripts from untrusted authors
    * must not reach them. The parsed (unresolved) tree is walked before
    * compilation; aliases are listed explicitly because denial happens
    * pre-resolution, by name.
    */
  private val deniedFunctions =
    Set("reflect", "java_method", "try_reflect", "try_java_method")

  /** Parse a user expression, reject denied function calls anywhere in
    * its tree (including nested in lambdas/subexpressions), then hand
    * it to `expr()` for plan-time validation like any other column.
    * Subqueries are rejected outright: a script runs per mutation (the
    * reference's map/filter contract has no query surface), and a
    * scalar subquery's inner plan would otherwise smuggle function
    * calls past the tree walk.
    */
  private def safeExpr(s: String, ctx: String): Column = {
    val parsed =
      try CatalystSqlParser.parseExpression(s)
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"user script: $ctx has a malformed expression: ${e.getMessage}")
      }
    if (parsed.exists(_.isInstanceOf[SubqueryExpression]))
      throw new IllegalArgumentException(
        s"user script: $ctx contains a subquery — scripts are per-mutation expressions")
    val bad = parsed.collect {
      case f: UnresolvedFunction
          if deniedFunctions.contains(f.nameParts.last.toLowerCase) =>
        f.nameParts.mkString(".")
    }
    if (bad.nonEmpty) throw new IllegalArgumentException(
      s"user script: $ctx calls disallowed function(s): ${bad.distinct.mkString(", ")}")
    expr(s)
  }

  /** Delete routing, independent of the upsert routes (reference
    * `internal/script/loader.go:103` sourceJS.DeletesTo): `when` marks
    * a mutation as a delete; matching rows route through `routes` /
    * `default` — the "just a table name" convenience form compiles to
    * an empty route list with the name as default.
    */
  final case class DeletesTo(when: Column, routes: Seq[(String, Column)],
      default: Option[String])

  final case class Script(
      pipeline: Transforms.Pipeline,
      routes: Seq[(String, Column)],
      defaultRoute: Option[String],
      recurseRoutes: Seq[(String, Column, Transforms.Pipeline)] = Seq.empty,
      deletesTo: Option[DeletesTo] = None) {
    def apply(df: DataFrame): DataFrame = pipeline(df)

    /** Route each mutation. Order of operations:
      *  1. the stage pipeline;
      *  2. RECURSE routes (reference `loader.go:105` sourceJS.Recurse —
      *     nested-source unwrapping): a row matching a recurse route is
      *     CONSUMED by the FIRST route that matches it, rewritten by
      *     that route's stages, and re-enters routing exactly once. Depth is capped at one structurally:
      *     a recurse route's stages are plain steps (no dispatch to
      *     re-enter), and re-entered rows only see the plain routes —
      *     the loop guard is the shape of the config, checked at
      *     compile, not a runtime counter;
      *  3. the DELETES split — tombstones route independently of
      *     upserts (deletesTo), including tombstones that surfaced
      *     from an unwrapped nested batch;
      *  4. the plain routes + default.
      * A table may receive both a delete leg and an upsert leg; the
      * legs union (missing columns null-fill).
      */
    def dispatch(df: DataFrame): Map[String, DataFrame] = {
      import org.apache.spark.sql.functions.{coalesce, lit}
      val d0 = pipeline(df)
      val expanded =
        if (recurseRoutes.isEmpty) d0
        else {
          val consumed = recurseRoutes.map(_._2).reduce(_ || _)
          val kept = d0.filter(!coalesce(consumed, lit(false)))
          // FIRST MATCH consumes: a row satisfying several recurse
          // predicates is rewritten by the earliest route only — unlike
          // plain dispatch (where multi-table fan-out is the point),
          // recurse legs union back into ONE stream, so overlap would
          // silently duplicate the mutation
          val firstMatch = recurseRoutes.zipWithIndex.map { case ((n, when, st), i) =>
            val earlier = recurseRoutes.take(i).map(_._2)
              .foldLeft(lit(false))((acc, p) => acc || coalesce(p, lit(false)))
            (n, when && !earlier, st)
          }
          firstMatch.map { case (_, when, stages) => stages(d0.filter(when)) }
            .foldLeft(kept)(_.unionByName(_, allowMissingColumns = true))
        }
      deletesTo match {
        case None => Transforms.dispatch(expanded, routes, defaultRoute)
        case Some(DeletesTo(when, dRoutes, dDefault)) =>
          val upserts = expanded.filter(!coalesce(when, lit(false)))
          val deletes = expanded.filter(when)
          val up = Transforms.dispatch(upserts, routes, defaultRoute)
          val del = Transforms.dispatch(deletes, dRoutes, dDefault)
          (up.keySet ++ del.keySet).iterator.map { t =>
            t -> ((up.get(t), del.get(t)) match {
              case (Some(a), Some(b)) => a.unionByName(b, allowMissingColumns = true)
              case (a, b) => a.orElse(b).get
            })
          }.toMap
      }
    }
  }

  /** Field access that names the offender — a malformed script must
    * fail with "stage 2 (map) is missing 'cols'", never a bare NPE.
    */
  private def req(node: JsonNode, field: String, ctx: String): JsonNode = {
    val v = node.get(field)
    if (v == null || v.isNull)
      throw new IllegalArgumentException(s"user script: $ctx is missing '$field'")
    v
  }

  /** Compile a script. `sides` binds the named DataFrames a `lookup`
    * stage may read (the reference's getTX() target handle): the
    * script AUTHOR names the table; the DRIVER decides what state that
    * name resolves to. An unknown name fails at compile.
    */
  def compile(json: String,
      sides: Map[String, org.apache.spark.sql.DataFrame] = Map.empty): Script = {
    val root = mapper.readTree(json)
    val steps = compileSteps(root, "stage", sides)
    val (routes, default) = compileDispatch(root)
    val recurse = Option(root.get("recurse")).map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty).zipWithIndex.map { case (r, i) =>
        val ctx = s"recurse route $i"
        // loop guard, enforced at compile by SHAPE: a recurse route
        // carries only plain stages — any nested `recurse` or
        // `dispatch` key inside it is rejected, so a re-entered row
        // can never match a recurse route again (depth is exactly 1)
        for (k <- Seq("recurse", "dispatch"))
          if (r.has(k)) throw new IllegalArgumentException(
            s"user script: $ctx must not contain '$k' — recursion depth is capped at one")
        (req(r, "name", ctx).asText(),
          safeExpr(req(r, "when", ctx).asText(), ctx),
          Transforms.Pipeline(compileSteps(r, s"$ctx stage", sides): _*))
      }
    val deletes = Option(root.get("deletesTo")).filterNot(_.isNull).map { d =>
      if (d.isTextual)
        // convenience form (reference loader.go:103 "just a table
        // name"): every delete goes to that table unconditionally
        DeletesTo(safeExpr("__op = 'd'", "deletesTo"), Seq.empty, Some(d.asText()))
      else {
        val when = safeExpr(
          Option(d.get("when")).filterNot(_.isNull).map(_.asText()).getOrElse("__op = 'd'"),
          "deletesTo 'when'")
        val rs = Option(d.get("routes")).map(_.elements().asScala.toSeq)
          .getOrElse(Seq.empty).zipWithIndex.map { case (r, i) =>
            req(r, "name", s"deletesTo route $i").asText() ->
              safeExpr(req(r, "when", s"deletesTo route $i").asText(), s"deletesTo route $i")
          }
        val dflt = Option(d.get("default")).filterNot(_.isNull).map(_.asText())
        if (rs.isEmpty && dflt.isEmpty) throw new IllegalArgumentException(
          "user script: deletesTo needs 'routes' or 'default' (or use the table-name string form)")
        DeletesTo(when, rs, dflt)
      }
    }
    Script(Transforms.Pipeline(steps: _*), routes, default, recurse, deletes)
  }

  private def compileDispatch(root: JsonNode): (Seq[(String, Column)], Option[String]) =
    Option(root.get("dispatch")) match {
      case None => (Seq.empty[(String, Column)], None)
      case Some(d) =>
        val rs = Option(d.get("routes")).map(_.elements().asScala.toSeq)
          .getOrElse(Seq.empty).zipWithIndex
          .map { case (r, i) =>
            req(r, "name", s"route $i").asText() ->
              safeExpr(req(r, "when", s"route $i").asText(), s"route $i")
          }
        (rs, Option(d.get("default")).filterNot(_.isNull).map(_.asText()))
    }

  private def compileSteps(root: JsonNode, ctxPrefix: String,
      sides: Map[String, org.apache.spark.sql.DataFrame]): Seq[Transforms.Step] = {
    val stages = Option(root.get("stages")).map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty)
    stages.zipWithIndex.map { case (st, i) =>
      val ctx = s"$ctxPrefix $i"
      req(st, "op", ctx).asText() match {
        case "filter" =>
          Transforms.Filter(safeExpr(req(st, "where", s"$ctx (filter)").asText(), s"$ctx (filter)"))
        case "map" =>
          // Jackson preserves document field order, so rewrites apply in
          // the order the user wrote them (later cols may read earlier)
          val cols = req(st, "cols", s"$ctx (map)").properties().asScala.toSeq
            .map(e => e.getKey -> safeExpr(e.getValue.asText(), s"$ctx (map) col '${e.getKey}'"))
          Transforms.MapCols(cols: _*)
        case "drop" =>
          Transforms.DropCols(
            req(st, "cols", s"$ctx (drop)").elements().asScala.map(_.asText()).toSeq: _*)
        case "emit" =>
          // 1→N fan-out with key rewrite: rows is an array<struct<...>>
          // user expression, one output mutation per element
          Transforms.Emit(safeExpr(req(st, "rows", s"$ctx (emit)").asText(), s"$ctx (emit)"))
        case "merge" =>
          // per-route custom merge (reference script.go:641 bindMerge):
          // standard three-way first, then per-property user resolution
          // expressions over target_v/proposed_v/before_v, then fallback
          val mctx = s"$ctx (merge)"
          val resolve = Option(st.get("resolve")).filterNot(_.isNull)
            .map(_.properties().asScala.toSeq.map(e =>
              e.getKey -> safeExpr(e.getValue.asText(), s"$mctx resolve '${e.getKey}'")))
            .getOrElse(Seq.empty)
          val fallback = Option(st.get("fallback")).filterNot(_.isNull)
            .map(_.asText()).getOrElse("dlq")
          if (!Set("dlq", "theirs", "ours").contains(fallback))
            throw new IllegalArgumentException(
              s"user script: $mctx has unknown fallback '$fallback' (dlq | theirs | ours)")
          Transforms.Merge(
            safeExpr(req(st, "before", mctx).asText(), s"$mctx 'before'"),
            safeExpr(req(st, "proposed", mctx).asText(), s"$mctx 'proposed'"),
            safeExpr(req(st, "target", mctx).asText(), s"$mctx 'target'"),
            resolve, fallback)
        case "lookup" =>
          // target-state read (reference applier.go:49 api.getTX()):
          // compiles to a left equi-join against a driver-bound frame
          val lctx = s"$ctx (lookup)"
          val table = req(st, "table", lctx).asText()
          val side = sides.getOrElse(table, throw new IllegalArgumentException(
            s"user script: $lctx references unknown table '$table' " +
              s"(bound: ${sides.keys.toSeq.sorted.mkString(", ")})"))
          val on = req(st, "on", lctx).properties().asScala.toSeq
            .map(e => e.getKey -> safeExpr(e.getValue.asText(), s"$lctx on '${e.getKey}'"))
          val sel = req(st, "select", lctx).properties().asScala.toSeq
            .map(e => e.getKey -> e.getValue.asText())
          Transforms.Lookup(side, on, sel)
        case other =>
          throw new IllegalArgumentException(s"user script: unknown op '$other' in $ctx")
      }
    }
  }
}
