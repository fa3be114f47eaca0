package graft

import graft.script.Transforms
import org.apache.spark.sql.functions._

/** End-to-end pipeline assembly spec (the conveyor analogue). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

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
