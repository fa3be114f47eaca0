package graft

import graft.script.Transforms
import org.apache.spark.sql.functions._

/** End-to-end pipeline assembly spec (the conveyor analogue). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("conveyor composition: userscript emit fan-out feeds per-route apply configs") {
    // the reference's full path: script map returns MULTIPLE mutations
    // retargeting keys/tables, dispatch hands each target its own
    // applycfg. One purchase mutation lands in two routes; each route
    // reduces under ITS OWN config (billing CASes on amount, audit
    // keeps latest-by-time) — r2 could not express this in one pipeline.
    val muts = Seq(
      // (key, ts, seq, amount)
      (1L, 100L, 1L, 50.0),
      (1L, 200L, 2L, 30.0), // newer but smaller: billing keeps seq 1, audit keeps seq 2
      (2L, 100L, 3L, 70.0)
    ).toDF("key", "ts", "seq", "amount")
    val script = graft.script.UserScript.compile(
      """{"stages": [
        |  {"op": "emit", "rows": "array(named_struct('key', key, 'route_kind', 'bill'), named_struct('key', key + 1000, 'route_kind', 'audit'))"}]}""".stripMargin)
    val p = Pipeline(script(muts), keys = Seq("key"),
      order = struct(col("ts"), col("seq")))
    val routed = p.dispatchApplyEach(
      routes = Seq(
        "billing" -> (col("route_kind") === "bill"),
        "audit" -> (col("route_kind") === "audit")),
      configs = Map(
        "billing" -> graft.cdc.Apply.Config(
          casOrder = Some(struct(col("amount"), col("ts"), col("seq")))),
        "audit" -> graft.cdc.Apply.Config()))
    val billing = routed("billing").select("key", "seq", "amount")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val audit = routed("audit").select("key", "seq", "amount")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // billing: CAS keeps the HIGHEST amount per original key
    assert(billing == Map(1L -> (1L, 50.0), 2L -> (3L, 70.0)))
    // audit: rewritten keys (1e3+), latest-by-time wins
    assert(audit == Map(1001L -> (2L, 30.0), 1002L -> (3L, 70.0)))
  }

  test("replayDlq: fixed config converges, overlaps and re-replays are no-ops") {
    // key 1: latest mutation (seq 3) dead-letters; replay must win over
    //        the older applied row
    // key 2: dead letter seq 4 ALSO applied through the normal path
    //        later (operator retried) — identity anti-join must drop it
    // key 3: applied only, untouched by the replay
    val ord = struct(col("ts"), col("seq"))
    val applied = Seq(
      (1L, 100L, 1L, "old"),
      (2L, 200L, 4L, "dup"),
      (3L, 100L, 5L, "keep")
    ).toDF("key", "ts", "seq", "payload")
    val dead = Seq(
      (1L, 300L, 3L, "fixed", "merge_conflict"),
      (2L, 200L, 4L, "dup", "merge_conflict")
    ).toDF("key", "ts", "seq", "payload", "dlq_reason")
    def replay(state: org.apache.spark.sql.DataFrame) =
      Pipeline.replayDlq(dead, state, Seq("key"), ord,
        idCols = Seq("key", "ts", "seq"))(_.latestByKey())
    val once = replay(applied)
    val state = once.select("key", "ts", "seq", "payload").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(state == Map(
      1L -> ((300L, 3L, "fixed")), // replayed dead letter won
      2L -> ((200L, 4L, "dup")),   // no duplicate from the overlap
      3L -> ((100L, 5L, "keep"))))
    assert(once.count() == 3) // idempotence: one row per key, no dup of key 2
    // replaying the already-replayed DLQ is a no-op
    val twice = replay(once).select("key", "ts", "seq", "payload").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(twice == state)
  }

  test("full pipeline: dedup -> dlq -> transform -> apply -> state + dead letters") {
    val muts = Seq(
      // (key, ts, seq, op, payload)
      (1L, 100L, 1L, "upsert", "a"),
      (1L, 100L, 1L, "upsert", "a"),  // duplicate delivery
      (1L, 200L, 2L, "upsert", "b"),
      (2L, 100L, 3L, "upsert", null.asInstanceOf[String]), // bad payload
      (3L, 100L, 4L, "upsert", "c"),
      (3L, 300L, 5L, "delete", "c")
    ).toDF("key", "ts", "seq", "op", "payload")

    val p = Pipeline(muts, keys = Seq("key"), order = struct(col("ts"), col("seq")))
      .uniqueByTimeKey("ts", col("seq"))
      .dlq("bad_payload" -> col("payload").isNull)
      .transform(Transforms.Pipeline(
        Transforms.MapCols("payload_uc" -> upper(col("payload")))))
      .latestByKey()
      .dropDeletesWhere(col("op") === "delete")

    val state = p.state.select("key", "payload_uc").as[(Long, String)]
      .collect().toMap
    assert(state == Map(1L -> "B")) // key 2 dlq'd, key 3 tombstoned
    val dead = p.deadLetters.get.select("key", "dlq_reason")
      .as[(Long, String)].collect().toSeq
    assert(dead == Seq((2L, "bad_payload")))

    // sink round trip
    val out = s"${sys.props("java.io.tmpdir")}/graft_pipeline_spec"
    p.sink(out, partitionCols = Seq("op"))
    assert(spark.read.parquet(out).count() == 1)
  }
}
