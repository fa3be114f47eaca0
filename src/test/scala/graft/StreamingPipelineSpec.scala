package graft

import graft.cdc.Changefeed
import graft.streaming.StreamApply
import graft.streaming.StreamApply.KeyedMut
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The reference's main loop, streaming end-to-end: changefeed files →
  * envelope parse → retry dedup → stateful latest-by-key apply. The
  * final state must equal the batch apply of the same files.
  */
class StreamingPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("changefeed files -> parse -> dedupe -> stateful apply == batch apply") {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_e2e_cf"
    // 3 keys; key 2 ends deleted; key 1 has out-of-order + duplicate
    // deliveries; all as changefeed envelopes across several files
    val lines = Seq(
      """{"after": "v1", "key": "[1]", "updated": "100.0000000000"}""",
      """{"after": "v3", "key": "[1]", "updated": "300.0000000000"}""",
      """{"after": "v2", "key": "[1]", "updated": "200.0000000000"}""", // out of order
      """{"after": "v3", "key": "[1]", "updated": "300.0000000000"}""", // duplicate
      """{"after": "a1", "key": "[2]", "updated": "100.0000000000"}""",
      """{"after": null, "key": "[2]", "updated": "400.0000000000"}""", // delete
      """{"after": "b1", "key": "[3]", "updated": "150.0000000000"}"""
    )
    spark.sparkContext.parallelize(lines, 3).toDF("value")
      .write.mode("overwrite").text(dir)

    def toMuts(df: org.apache.spark.sql.DataFrame) = df.select(
      get_json_object(col("key"), "$[0]").cast("long").as("key"),
      col("hlc.nanos").as("versionNanos"),
      col("hlc.logical").cast("long").as("tiebreak"),
      when(col("is_delete"), "delete").otherwise("upsert").as("op"),
      lit(0.0).as("value"),
      coalesce(col("data"), lit("")).as("payload")).as[KeyedMut]

    // batch ground truth
    val batchState = StreamApply.applyBatch(toMuts(Changefeed.read(spark, dir)))
      .collect().map(m => m.key -> (m.versionNanos, m.op, m.payload)).toMap

    // streaming: one file per micro-batch, retry dedup before state
    val streamed = toMuts(Changefeed.readStream(spark, dir, maxFilesPerTrigger = 1))
      .dropDuplicates("key", "versionNanos", "tiebreak")
    val q = StreamApply.applyStream(streamed)
      .writeStream.format("memory").queryName("e2e_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamState = spark.table("e2e_out").as[KeyedMut].collect()
      .groupBy(_.key).map { case (k, ms) => k -> {
        val w = ms.maxBy(m => (m.versionNanos, m.tiebreak))
        (w.versionNanos, w.op, w.payload)
      }}

    assert(streamState == batchState)
    // and the semantics themselves: v3 wins for key 1 despite
    // out-of-order + duplicate delivery; key 2's winner is the delete
    assert(batchState(1L) == ((300L, "upsert", "v3")))
    assert(batchState(2L)._2 == "delete")
    assert(batchState(3L) == ((150L, "upsert", "b1")))
  }

  test("userscript deletesTo + lookup run per micro-batch against live target state") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // the reference's full script surface in a STREAM: each trigger
    // compiles the script with `target` bound to the CURRENT applied
    // state (getTX reads see earlier batches' writes), lookup tags
    // first-writes, deletesTo splits tombstones off to their own
    // table, and the upsert leg folds into the state
    @volatile var state = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL("k bigint, v bigint"))
    val tombstones = scala.collection.mutable.ArrayBuffer.empty[Long]
    val firstWrites = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    val script =
      """{"stages": [
        |   {"op": "lookup", "table": "target",
        |    "on": {"k": "k"}, "select": {"cur_v": "v"}},
        |   {"op": "map", "cols": {"is_new_key": "cur_v is null"}}],
        | "deletesTo": {"when": "op = 'd'", "default": "tombs"},
        | "dispatch": {"default": "main"}}""".stripMargin
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, String)]
    val q = in.toDF().toDF("k", "v", "op")
      .writeStream.foreachBatch { (b: DataFrame, _: Long) =>
        val s = graft.script.UserScript.compile(script,
          sides = Map("target" -> state))
        val routed = s.dispatch(b)
        routed.get("tombs").foreach { t =>
          val dead = t.select("k").as[Long].collect()
          tombstones ++= dead
          if (dead.nonEmpty) state = state.filter(!col("k").isin(dead: _*))
        }
        routed.get("main").foreach { m =>
          firstWrites ++= m.select("k", "is_new_key").as[(Long, Boolean)].collect()
          // batch-wins fold of the upsert leg into the state (anti-join,
          // not groupBy+last — last() is order-dependent)
          val up = m.select("k", "v")
          state = state.join(up, Seq("k"), "left_anti").unionByName(up)
            .localCheckpoint(true) // pin: next trigger's lookup side
        }
        ()
      }.start()
    try {
      in.addData((1L, 10L, "u"), (2L, 20L, "u")); q.processAllAvailable()
      in.addData((1L, 11L, "u"), (3L, 30L, "u"), (2L, 0L, "d")); q.processAllAvailable()
    } finally q.stop()
    // trigger 1: both keys unseen; trigger 2: key 1 is a re-write
    // (lookup found it in the LIVE state), key 3 is new
    assert(firstWrites.sortBy(_._1).toSeq ==
      Seq((1L, true), (2L, true), (1L, false), (3L, true)).sortBy(_._1))
    assert(firstWrites.toSeq.count(!_._2) == 1)
    assert(tombstones.toSeq == Seq(2L))
    val fin = state.orderBy("k").as[(Long, Long)].collect().toSeq
    assert(fin == Seq((1L, 11L), (3L, 30L)))
  }
}
