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
}
