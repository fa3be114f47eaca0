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

  final case class Script(
      pipeline: Transforms.Pipeline,
      routes: Seq[(String, Column)],
      defaultRoute: Option[String]) {
    def apply(df: DataFrame): DataFrame = pipeline(df)
    def dispatch(df: DataFrame): Map[String, DataFrame] =
      Transforms.dispatch(pipeline(df), routes, defaultRoute)
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

  def compile(json: String): Script = {
    val root = mapper.readTree(json)
    val stages = Option(root.get("stages")).map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty)
    val steps: Seq[Transforms.Step] = stages.zipWithIndex.map { case (st, i) =>
      val ctx = s"stage $i"
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
        case other =>
          throw new IllegalArgumentException(s"user script: unknown op '$other' in $ctx")
      }
    }
    val (routes, default) = Option(root.get("dispatch")) match {
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
    Script(Transforms.Pipeline(steps: _*), routes, default)
  }
}
