package graft

import graft.ops.Skew
import graft.script.Transforms._
import org.apache.spark.sql.functions._

class ScriptSpec extends SparkSpec {
  import spark.implicits._

  private def muts = Seq(
    (1L, "purchase", 10.0), (2L, "click", 0.5), (3L, "purchase", 3.0),
    (4L, "error", 7.0), (5L, "view", 2.0)
  ).toDF("id", "op", "value")

  test("userscript pipeline: filter, map, drop compose in order") {
    val out = Pipeline(
      Filter(col("value") >= 1.0),
      MapCols("cents" -> (col("value") * 100).cast("long")),
      DropCols("value"))(muts)
    assert(out.columns.toSeq == Seq("id", "op", "cents"))
    assert(out.count() == 4)
    assert(out.filter(col("id") === 1).select("cents").as[Long].head() == 1000L)
  }

  test("dispatch routes to all matching tables plus default") {
    val routes = dispatch(muts, Seq(
      "billing" -> (col("op") === "purchase"),
      "big" -> (col("value") >= 7.0)),
      defaultRoute = Some("telemetry"))
    assert(routes("billing").select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(routes("big").select("id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    // 1 matches two routes (multi-dispatch); default catches only unrouted
    assert(routes("telemetry").select("id").as[Long].collect().sorted.toSeq == Seq(2L, 5L))
  }

  test("emit fans one mutation out to N rows with key rewrite") {
    val df = Seq((1L, "purchase", 60.0), (2L, "signup", 1.0))
      .toDF("id", "event_type", "value")
    val script = graft.script.UserScript.compile(
      """{"stages": [
        |  {"op": "emit", "rows": "case when event_type = 'purchase' then array(named_struct('id', id, 'copy', 'main'), named_struct('id', id + 100, 'copy', 'audit')) else array(named_struct('id', id, 'copy', 'main')) end"}]}""".stripMargin)
    val out = script(df).orderBy("id", "emit_pos")
      .select("id", "copy", "emit_pos", "event_type").collect()
    // purchase row 1 → two rows under two keys; signup stays single
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1L, "main", 0), (2L, "main", 0), (101L, "audit", 1)))
    assert(out.forall(r => Set("purchase", "signup")(r.getString(3))))
    // empty array drops the row (map returning [] in the reference)
    val drop = graft.script.UserScript.compile(
      """{"stages": [{"op": "emit", "rows": "case when event_type = 'signup' then array(named_struct('id', id)) else array() end"}]}""")
    assert(drop(df.withColumn("__t", lit(1))).count() == 1)
  }

  test("emit rejects reserved column/field names up front") {
    val df = Seq((1L, "a")).toDF("id", "op")
    // input column named __emit would collide with the scratch column
    val e1 = intercept[IllegalArgumentException](
      Emit(expr("array(named_struct('id', id))"))(df.withColumn("__emit", lit(1))))
    assert(e1.getMessage.contains("__emit"))
    // a struct field named emit_pos would clobber the output index
    val e2 = intercept[IllegalArgumentException](
      Emit(expr("array(named_struct('emit_pos', 9))"))(df))
    assert(e2.getMessage.contains("emit_pos"))
    val e3 = intercept[IllegalArgumentException](
      Emit(expr("array(named_struct('__emit', 9))"))(df))
    assert(e3.getMessage.contains("__emit"))
  }

  test("merge verb: user resolution on standard-rule conflicts, fallbacks") {
    // key 1: clean (before = target)  key 2: conflict, user resolves
    // key 3: conflict, user declines (NULL) → fallback
    // key 4: no target → proposed applies as-is
    // key 5: undefined-vs-set conflict — proposed DELETES c while the
    // target changed it; "theirs" must leave c undefined (missing key),
    // never a NULL map entry
    val df = Seq(
      (1L, Map("c" -> "10"), Map("c" -> "20"), Map("c" -> "10")),
      (2L, Map("c" -> "10"), Map("c" -> "20"), Map("c" -> "99")),
      (3L, Map("c" -> "10"), Map("c" -> "20"), Map("c" -> "55")),
      (4L, Map("c" -> "10"), Map("c" -> "20"), null.asInstanceOf[Map[String, String]]),
      (5L, Map("c" -> "10"), Map.empty[String, String], Map("c" -> "55")))
      .toDF("id", "before_bag", "proposed_bag", "target_bag")
    def run(resolveAndFallback: String) = graft.script.UserScript.compile(
      s"""{"stages": [{"op": "merge",
         |  "before": "before_bag", "proposed": "proposed_bag", "target": "target_bag",
         |  $resolveAndFallback}]}""".stripMargin)(df)
      .select("id", "merged", "unmerged", "is_dlq").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getMap[String, String](1).get("c"),
        r.getSeq[String](2).toSeq, r.getBoolean(3))).toSeq

    // dlq fallback: 2 resolves to max(target, proposed)=99, 3 declines
    val dlq = run(
      """"resolve": {"c": "case when id % 2 = 0 then greatest(cast(target_v as bigint), cast(proposed_v as bigint)) end"},
        |"fallback": "dlq"""".stripMargin)
    assert(dlq == Seq(
      (1L, Some("20"), Seq(), false),
      (2L, Some("99"), Seq(), false),
      (3L, Some("55"), Seq("c"), true),
      (4L, Some("20"), Seq(), false),
      (5L, Some("55"), Seq("c"), true)))

    // theirs: the declined conflict takes proposed instead of
    // dead-lettering; proposed-absent (key 5) ⇒ the property is
    // REMOVED, not set to NULL
    val theirs = run(""""fallback": "theirs"""")
    assert(theirs.map(t => (t._1, t._2, t._4)) == Seq(
      (1L, Some("20"), false), (2L, Some("20"), false),
      (3L, Some("20"), false), (4L, Some("20"), false),
      (5L, None, false)))

    // ours: conflicts keep the target value
    val ours = run(""""fallback": "ours"""")
    assert(ours.map(t => (t._1, t._2, t._4)) == Seq(
      (1L, Some("20"), false), (2L, Some("99"), false),
      (3L, Some("55"), false), (4L, Some("20"), false),
      (5L, Some("55"), false)))

    // unknown fallback and reserved columns are compile/plan-time errors
    val bad = intercept[IllegalArgumentException](graft.script.UserScript.compile(
      """{"stages": [{"op": "merge", "before": "b", "proposed": "p", "target": "t", "fallback": "explode"}]}"""))
    assert(bad.getMessage.contains("fallback"))
    val clash = intercept[IllegalArgumentException](
      graft.script.Transforms.Merge(col("b"), col("p"), col("t"), Seq.empty, "dlq")(
        df.withColumn("target_v", lit(1))))
    assert(clash.getMessage.contains("reserved"))
  }

  test("userscript rejects reflection-escape functions at compile time") {
    // expr() admits reflect()/java_method() — arbitrary static-method
    // invocation, wider than the reference's sandboxed VM. The compile
    // step must refuse them wherever they appear in the tree.
    val bad = Seq(
      """{"stages": [{"op": "filter", "where": "reflect('java.lang.System', 'exit', 0) is null"}]}""",
      """{"stages": [{"op": "map", "cols": {"x": "java_method('java.lang.Runtime', 'getRuntime')"}}]}""",
      """{"stages": [{"op": "map", "cols": {"x": "concat('a', REFLECT('a','b'))"}}]}""",
      """{"stages": [{"op": "map", "cols": {"x": "try_reflect('java.lang.System','exit',0)"}}]}""",
      """{"dispatch": {"routes": [{"name": "r", "when": "reflect('x','y') = 'z'"}]}}""")
    bad.foreach { js =>
      val e = intercept[IllegalArgumentException](graft.script.UserScript.compile(js))
      assert(e.getMessage.contains("disallowed function"))
    }
    // a subquery would smuggle calls past the tree walk — rejected
    val sub = intercept[IllegalArgumentException](graft.script.UserScript.compile(
      """{"stages": [{"op": "filter", "where": "(select reflect('a','b')) is null"}]}"""))
    assert(sub.getMessage.contains("subquery"))
    // benign scripts still compile
    graft.script.UserScript.compile(
      """{"stages": [{"op": "map", "cols": {"x": "reverse(trim(op))"}}]}""")
  }

  test("deletesTo routes tombstones independently; shared table unions legs") {
    val script = graft.script.UserScript.compile(
      """{"stages": [{"op": "map", "cols": {"__op": "case when op = 'error' then 'd' else 'u' end"}}],
        | "deletesTo": {"when": "__op = 'd'",
        |   "routes": [{"name": "tomb_hot", "when": "value >= 5.0"}],
        |   "default": "shared"},
        | "dispatch": {"routes": [{"name": "billing", "when": "op = 'purchase'"}],
        |   "default": "shared"}}""".stripMargin)
    val routed = script.dispatch(muts)
    // error id=4 (value 7.0) is a hot delete; no cold deletes in the fixture
    assert(routed("tomb_hot").select("id").as[Long].collect().toSeq == Seq(4L))
    assert(routed("billing").select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // shared receives the upsert default leg only (delete default leg empty)
    assert(routed("shared").select("id").as[Long].collect().sorted.toSeq == Seq(2L, 5L))
    // the delete must NOT also appear in the upsert default
    assert(routed("shared").filter(col("__op") === "d").count() == 0)

    // cold delete → both legs land in "shared" and union (null-filling)
    val withCold = muts.union(Seq((6L, "error", 1.0)).toDF("id", "op", "value"))
    val routed2 = script.dispatch(withCold)
    assert(routed2("shared").select("id").as[Long].collect().sorted.toSeq == Seq(2L, 5L, 6L))
    assert(routed2("shared").filter(col("__op") === "d").select("id").as[Long].head() == 6L)

    // table-name string convenience form: every __op='d' goes there
    val conv = graft.script.UserScript.compile(
      """{"stages": [{"op": "map", "cols": {"__op": "case when op = 'error' then 'd' else 'u' end"}}],
        | "deletesTo": "tombstones",
        | "dispatch": {"default": "rest"}}""".stripMargin)
    val r3 = conv.dispatch(muts)
    assert(r3("tombstones").select("id").as[Long].collect().toSeq == Seq(4L))
    assert(r3("rest").count() == 4)
  }

  test("recurse rewrites matching rows exactly once through plain routes") {
    val script = graft.script.UserScript.compile(
      """{"recurse": [
        |   {"name": "wrapped", "when": "op = 'click'",
        |    "stages": [{"op": "map", "cols": {"op": "'purchase'", "unwrapped": "true"}}]}],
        | "dispatch": {"routes": [{"name": "billing", "when": "op = 'purchase'"}],
        |   "default": "rest"}}""".stripMargin)
    val routed = script.dispatch(muts)
    // click id=2 was rewritten to purchase and re-entered routing once
    assert(routed("billing").select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(routed("billing").filter(col("unwrapped")).select("id").as[Long].head() == 2L)
    // consumed: the original click row does not ALSO reach the default
    assert(routed("rest").select("id").as[Long].collect().sorted.toSeq == Seq(4L, 5L))

    // a row matching SEVERAL recurse routes is consumed by the FIRST
    // only — recurse legs union into one stream, so overlap would
    // silently duplicate the mutation
    val overlap = graft.script.UserScript.compile(
      """{"recurse": [
        |   {"name": "hi", "when": "value >= 5.0",
        |    "stages": [{"op": "map", "cols": {"via": "'hi'"}}]},
        |   {"name": "noisy", "when": "op in ('click', 'error', 'purchase')",
        |    "stages": [{"op": "map", "cols": {"via": "'noisy'"}}]}],
        | "dispatch": {"default": "out"}}""".stripMargin)
    val o = overlap.dispatch(muts)("out")
    // overlap rows: id=1 (purchase, 10.0) and id=4 (error, 7.0) match
    // BOTH routes → exactly one copy each, rewritten by the FIRST;
    // id=2 (click, 0.5) and id=3 (purchase, 3.0) match only the
    // second; id=5 (view, 2.0) matches neither and passes through
    assert(o.count() == muts.count())
    assert(o.filter(col("via") === "hi").select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 4L))
    assert(o.filter(col("via") === "noisy").select("id").as[Long]
      .collect().sorted.toSeq == Seq(2L, 3L))

    // loop guard is structural and checked at compile
    val e = intercept[IllegalArgumentException](graft.script.UserScript.compile(
      """{"recurse": [{"name": "r", "when": "true",
        |  "recurse": [{"name": "r2", "when": "true", "stages": []}]}]}""".stripMargin))
    assert(e.getMessage.contains("capped at one"))
    val e2 = intercept[IllegalArgumentException](graft.script.UserScript.compile(
      """{"recurse": [{"name": "r", "when": "true", "stages": [],
        |  "dispatch": {"default": "x"}}]}""".stripMargin))
    assert(e2.getMessage.contains("capped at one"))
  }

  test("lookup joins driver-bound target state into the mutation stream") {
    val target = Seq((1L, 100L), (3L, 300L)).toDF("id", "cents")
    val script = graft.script.UserScript.compile(
      """{"stages": [
        |  {"op": "lookup", "table": "target",
        |   "on": {"id": "id"}, "select": {"tgt_cents": "cents"}},
        |  {"op": "map", "cols": {"known": "tgt_cents is not null"}}]}""".stripMargin,
      sides = Map("target" -> target))
    val out = script(muts).orderBy("id")
      .select("id", "tgt_cents", "known").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq((1L, 100L, true), (2L, -1L, false), (3L, 300L, true),
      (4L, -1L, false), (5L, -1L, false)))

    // unknown table name fails at COMPILE, naming what IS bound
    val e = intercept[IllegalArgumentException](graft.script.UserScript.compile(
      """{"stages": [{"op": "lookup", "table": "nope", "on": {"id": "id"}, "select": {"x": "cents"}}]}""",
      sides = Map("target" -> target)))
    assert(e.getMessage.contains("unknown table 'nope'") && e.getMessage.contains("target"))

    // output-name collision with an existing mutation column is rejected
    val clash = graft.script.UserScript.compile(
      """{"stages": [{"op": "lookup", "table": "target", "on": {"id": "id"}, "select": {"value": "cents"}}]}""",
      sides = Map("target" -> target))
    val e2 = intercept[IllegalArgumentException](clash(muts))
    assert(e2.getMessage.contains("already exist"))
  }

  test("dispatch default named like an explicit route unions, not clobbers") {
    // regression: Map + used to OVERWRITE the routed frame with the
    // default's (often empty) remainder, silently dropping every row
    // the explicit route matched
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "kind")
    val routed = graft.script.Transforms.dispatch(df,
      routes = Seq("t" -> (col("kind") === "a")), defaultRoute = Some("t"))
    assert(routed.keySet === Set("t"))
    assert(routed("t").count() === 3)
    // and a disjoint default still receives only the remainder
    val split = graft.script.Transforms.dispatch(df,
      routes = Seq("t" -> (col("kind") === "a")), defaultRoute = Some("rest"))
    assert(split("t").count() === 2 && split("rest").count() === 1)
  }

  test("salted aggregation equals the direct aggregation") {
    val direct = muts.groupBy("op")
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Skew.saltedAgg(muts, Seq("op"), saltBuckets = 8,
        partials = Seq(count(lit(1)).as("pn"), sum(col("value")).as("pv")),
        finals = Seq(sum(col("pn")).as("n"), sum(col("pv")).as("v")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted == direct)
  }
}
