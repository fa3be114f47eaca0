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
