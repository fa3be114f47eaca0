package graft

import graft.streaming.StreamApply
import graft.streaming.StreamApply.KeyedMut
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming specs: the stateful latest-by-key apply must
  * match the batch reduce, and emit incrementally across triggers.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("applyStream emits last-one-wins state updates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedMut]
    // AvailableNow processes what exists at start — enqueue first
    input.addData(
      KeyedMut(1L, 100L, 1L, "upsert", 10.0, "a"),
      KeyedMut(1L, 200L, 2L, "upsert", 20.0, "b"),
      KeyedMut(2L, 100L, 3L, "upsert", 30.0, "c"))
    val q = StreamApply.applyStream(input.toDS())
      .writeStream.format("memory").queryName("apply_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val batch1 = spark.table("apply_out").as[KeyedMut].collect()
    assert(batch1.map(m => m.key -> m.value).toMap == Map(1L -> 20.0, 2L -> 30.0))

    // second trigger: a stale mutation for key 1 (ignored) and a newer
    // one for key 2 (emitted)
    input.addData(
      KeyedMut(1L, 50L, 4L, "upsert", 5.0, "stale"),
      KeyedMut(2L, 300L, 5L, "upsert", 40.0, "fresh"))
    val q2 = StreamApply.applyStream(input.toDS())
      .writeStream.format("memory").queryName("apply_out2")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    val all = spark.table("apply_out2").as[KeyedMut].collect()
    // key 1's stale row must not downgrade the state
    assert(!all.exists(m => m.key == 1L && m.value == 5.0))
    assert(all.exists(m => m.key == 2L && m.value == 40.0))
  }

  test("tombstone retirement: deletes retire after the frontier TTL, live keys never do") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedMut]
    // a real (non-bounded) trigger: ProcessingTimeTimeout + AvailableNow
    // is the documented hang (see StreamTxn) — retirement is a
    // long-running-feed feature and is tested as one
    val q = StreamApply.applyStream(input.toDS(), tombstoneTtlMs = 1500L)
      .writeStream.format("memory").queryName("tomb_out")
      .outputMode("update").start()
    // a ProcessingTimeTimeout query re-runs batches FOREVER (the
    // StreamTxn-documented behavior), so processAllAvailable never
    // quiesces — synchronize on OBSERVED sink rows instead. Negative
    // assertions ride a sentinel key in the same addData batch: once
    // the sentinel lands, that batch (and the suppressed row in it)
    // has been processed.
    def emitted(p: KeyedMut => Boolean): Boolean =
      spark.table("tomb_out").as[KeyedMut].collect().exists(p)
    def waitFor(what: String)(p: KeyedMut => Boolean): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (!emitted(p)) {
        assert(System.nanoTime() < deadline, s"timed out waiting for: $what")
        Thread.sleep(100)
      }
    }
    try {
      input.addData(
        KeyedMut(1L, 100L, 1L, "upsert", 10.0, "a"),
        KeyedMut(7L, 100L, 2L, "upsert", 70.0, "live"))
      waitFor("initial upserts")(m => m.key == 7L && m.value == 70.0)
      input.addData(KeyedMut(1L, 200L, 3L, "delete", 0.0, ""))
      waitFor("the tombstone")(m => m.key == 1L && m.op == "delete")
      // BEFORE expiry the tombstone does its job: a stale resurrect
      // attempt (version 150 < 200) is suppressed
      input.addData(
        KeyedMut(1L, 150L, 4L, "upsert", 5.0, "stale"),
        KeyedMut(50L, 100L, 4L, "upsert", 1.0, "sentinel"))
      waitFor("the pre-expiry sentinel")(_.key == 50L)
      assert(!emitted(m => m.key == 1L && m.value == 5.0),
        "stale mutation resurrected through a live tombstone")
      // wait for the RETIREMENT ITSELF, not wall-clock: the stale touch
      // above RE-ARMED the sliding TTL, and sending the probe row while
      // the tombstone still lives would consume it (and re-arm again).
      // The unambiguous witness is numRowsRemoved > 0 in some batch's
      // state-operator metrics — ONLY the timeout path calls
      // state.remove() in this operator, so the first nonzero removal
      // IS the tombstone retiring. (Total row counts are ambiguous:
      // they also read 2 after the first two-upsert batch, and under
      // full-suite load a stale lastProgress at that value let the
      // probe row race the still-armed tombstone.)
      locally {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        def removed: Boolean = q.recentProgress.exists(p =>
          p.stateOperators.exists(_.numRowsRemoved > 0))
        while (!removed) {
          assert(System.nanoTime() < deadline,
            "timed out waiting for tombstone retirement (no state removal observed)")
          Thread.sleep(100)
        }
      }
      // AFTER retirement the state is GONE: the same version-150 row
      // now establishes fresh state. That is exactly the contract
      // boundary — the TTL models the resolved-frontier lag, so by
      // expiry the frontier is ≥ the tombstone's version and the
      // protocol promises no pre-frontier mutation can still arrive;
      // an arrival is therefore treated as post-frontier traffic, not
      // compared against a retired tombstone. (Choosing a TTL below
      // the real frontier lag is the misuse mode this line documents.)
      input.addData(KeyedMut(1L, 150L, 6L, "upsert", 5.0, "post-frontier"))
      waitFor("post-retirement state")(m => m.key == 1L && m.value == 5.0)
      // the LIVE key 7 never armed a timeout: long past the TTL, its
      // state still suppresses stale mutations
      input.addData(
        KeyedMut(7L, 50L, 7L, "upsert", 7.0, "stale-live"),
        KeyedMut(51L, 100L, 7L, "upsert", 1.0, "sentinel2"))
      waitFor("the live-key sentinel")(_.key == 51L)
      assert(!emitted(m => m.key == 7L && m.value == 7.0),
        "live key state must never evict")
    } finally q.stop()
  }

  test("watermarked windowed ledger: closed windows match the batch counts") {
    import graft.streaming.StreamWindows
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, sfDir)
      .select(col("ts").cast("timestamp").as("ts"), col("value"))
    val dir = s"${sys.props("java.io.tmpdir")}/graft_stream_win"
    events.write.mode("overwrite").parquet(dir)

    val streamed = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = StreamWindows.windowedLedger(streamed, "ts",
        sum(round(col("value") * 100).cast("long")))
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val batch = events
      .groupBy(date_trunc("hour", col("ts")).as("window_start"))
      .agg(count(lit(1)).as("n_muts"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val emitted = spark.table("win_out")
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1))
    // append mode emits a window exactly once, when the watermark
    // (the resolved timestamp) passes its end — each must equal batch
    assert(emitted.nonEmpty)
    assert(emitted.map(_._1).distinct.length == emitted.length)
    emitted.foreach { case (w, n) => assert(batch(w) == n, s"window $w") }
  }

  test("checkpointed restart: file sink stays exactly-once across runs") {
    import org.apache.spark.sql.functions._
    import java.nio.file.{Files, Paths}
    val base = Files.createTempDirectory("graft_eo").toString
    val srcDir = s"$base/src"; val ckDir = s"$base/ck"; val outDir = s"$base/out"
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    events.repartition(8).write.mode("overwrite").parquet(srcDir)
    val inputRows = events.count()

    def runOnce(): Unit = {
      val q = spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "2").parquet(srcDir)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000); q.stop()
    }
    // first run: interrupt after the first micro-batches land
    val q1 = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "2").parquet(srcDir)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    while (q1.recentProgress.isEmpty) Thread.sleep(100)
    q1.stop() // kill mid-stream
    // second run resumes from the checkpoint and finishes the backlog
    runOnce()
    val out = spark.read.parquet(outDir)
    assert(out.count() == inputRows) // no duplicates, no loss
    assert(out.select("event_id").distinct().count() == inputRows)
  }

  test("streaming retry dedup: replayed mutations apply once") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedMut]
    val m = KeyedMut(1L, 100L, 1L, "upsert", 10.0, "a")
    // the same mutation delivered three times (retry storm), plus one other
    input.addData(m, m, m, KeyedMut(2L, 50L, 2L, "upsert", 5.0, "b"))
    val q = input.toDS()
      .dropDuplicates("key", "versionNanos", "tiebreak") // FilterApplied
      .groupByKey(_.key).flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[KeyedMut],
         state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val n = rows.size.toLong
          val total = state.getOption.getOrElse(0L) + n
          state.update(total)
          Iterator.single((n, total))
      }
      .writeStream.format("memory").queryName("retry_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val applied = spark.table("retry_out").as[(Long, Long)].collect()
    // each key applied exactly once despite the triple delivery
    assert(applied.forall(_._1 == 1L), applied.mkString(","))
  }

  test("streaming result equals batch reduce on the events table") {
    val events = Tables.events(spark, sfDir)
    val muts = StreamApply.fromEvents(events).as[KeyedMut]
    val batch = StreamApply.applyBatch(muts).collect()
      .map(m => m.key -> (m.versionNanos, m.tiebreak)).toMap

    val dir = s"${sys.props("java.io.tmpdir")}/graft_stream_src"
    StreamApply.fromEvents(events).write.mode("overwrite").parquet(dir)
    implicit val sqlCtx = spark.sqlContext
    val streamed = spark.readStream.schema(muts.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir).as[KeyedMut]
    val q = StreamApply.applyStream(streamed)
      .writeStream.format("memory").queryName("stream_events")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // last emitted row per key == batch winner
    val emitted = spark.table("stream_events").as[KeyedMut].collect()
      .groupBy(_.key).map { case (k, ms) =>
        k -> ms.map(m => (m.versionNanos, m.tiebreak)).max }
    assert(emitted == batch)
  }
}
