package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Head-to-head micro-bench: the first-class DSv2 changefeed connector
  * vs Spark's generic json file stream over the SAME changefeed
  * directory, swept across `maxFilesPerTrigger`.
  *
  * What it isolates: per-trigger fixed costs. The DSv2 source does ONE
  * directory listing per trigger (cached across latestOffset /
  * reportLatestOffset / planInputPartitions) and keeps O(1) offset
  * state (one file name), while the generic file source re-lists and
  * carries a seen-file map that grows with the backlog — at a small
  * files-per-trigger (the latency-sensitive regime) the fixed cost
  * dominates and the connector's listing reuse shows up directly.
  *
  * Output: one JSON line per (path, maxFilesPerTrigger) with total
  * drain seconds, trigger count, mean trigger ms, and rows (both paths
  * must agree). Results recorded in SCALE.md.
  */
object StreamBench {

  /** The full streaming CURATION loop measured per trigger: scrub →
    * quality gate → LM perplexity gate → length-band trim (the
    * O(k)-state quantile monitor supplies per-trigger [p05, p95] with
    * no corpus re-scan; the exact distributed-rank pass audits it at
    * every compaction) → incremental near-dup probe+fold, 64
    * micro-batches with compaction every 8 — the nightly-ingest
    * shape, CCNet stage order included. The LM is a
    * TRAINED ARTIFACT (saveLm/loadLm): model A scores the first half,
    * then a RELOAD swaps in model B (retrained on a grown reference —
    * the nightly-refresh shape StreamingCurationSpec proves correct)
    * INSIDE the timed region, so the swap's real cost lands in its
    * trigger's wall. What the curve proves: per-trigger wall stays
    * FLAT as the standing index accumulates the whole corpus (the
    * O(batch) claim, measured), and the model swap is a blip, not a
    * regime change. Output: per-trigger walls + first-vs-last-quartile
    * mean ratio (ramp factor) + the swap trigger's wall.
    */
  private def curationLoop(spark: SparkSession, base: String,
      nBatches: Int, compactEvery: Int): String = {
    import spark.implicits._
    import graft.ops.{Buckets, Dedup, Sketches, StreamingQuantiles, TextOps}
    val docs = Tables.documents(spark, base)
      .select("doc_id", "source", "text").cache()
    docs.count() // materialize once; the loop measures curation, not the scan
    val tmp = java.nio.file.Files.createTempDirectory("graft_sc_bench").toString
    // model A: the standing reference holdout; model B: the "grown"
    // reference a nightly retrain ships (a second deterministic slice)
    TextOps.saveLm(TextOps.trainLm(
      docs.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select("doc_id", "text"), "text"), s"$tmp/lmA")
    TextOps.saveLm(TextOps.trainLm(
      docs.filter(pmod(col("doc_id"), lit(7)) === 0 ||
          pmod(col("doc_id"), lit(5)) === 0)
        .select("doc_id", "text"), "text"), s"$tmp/lmB")
    var model = TextOps.loadLm(spark, s"$tmp/lmA")
    val state = new Dedup.StreamingDedup(
      Dedup.buildDedupIndex(Seq.empty[(Long, String)].toDF("doc_id", "text"),
        "doc_id", "text"),
      tmp, compactEvery, "doc_id", "text", threshold = 0.8)
    var pairsTotal = 0L
    var trimmedTotal = 0L
    val swapAt = nBatches / 2
    // the LENGTH-BAND TRIM stage (rows 91/92 deployed in the loop):
    // per trigger the O(k)-state quantile monitor supplies the
    // [p05, p95] band with NO corpus re-scan; every compaction the
    // EXACT distributed-rank pass (quantilesByRange) over the
    // accumulated kept lengths audits the band — the lengths ledger
    // is (doc_id, len) only, appended per trigger like the index
    val monitor = StreamingQuantiles(256)
    var lengthsLedger = Seq.empty[(Long, Long)].toDF("doc_id", "len")
    val exactWalls = scala.collection.mutable.ArrayBuffer.empty[Double]
    var lastExact = Map.empty[Double, Long]
    // the DRIFT-AWARE PCA REFRESH stage (row 108 deployed, the rows
    // 93/96 precedent): per trigger the O(d²) moment monitor folds the
    // trigger's embedding slice; every compaction Pca.topComponents
    // re-derives the principal directions FROM DRIVER STATE (no corpus
    // re-scan) and the projection stage swaps to the fresh component —
    // each trigger then projects its slice through the CURRENT
    // direction (one codegen'd integer dot product per row)
    import graft.ops.{Covariance, Pca, StreamingMoments}
    val embs = Tables.embeddings(spark, base)
      .select("vec_id", "embedding").cache()
    embs.count()
    val momMonitor = StreamingMoments(64)
    var pcaComp: Option[Array[Long]] = None
    val pcaRefreshWalls = scala.collection.mutable.ArrayBuffer.empty[Double]
    var projSum = 0L
    val walls = (0 until nBatches).map { i =>
      val b = docs.filter(pmod(col("doc_id"), lit(nBatches)) === i)
      val curated = TextOps.gopherFilters(
          TextOps.piiScrub(b, "text")
            .select(col("doc_id"), col("source"), col("scrubbed").as("text")),
          "text")
        .filter(col("keep"))
        .select("doc_id", "text")
      val t0 = System.nanoTime()
      if (i == swapAt) model = TextOps.loadLm(spark, s"$tmp/lmB")
      val gated = TextOps.scoreLm(model, curated, "doc_id", "text")
        .filter(col("mean_bits") <= 11.0) // the pinned CCNet-gate cut
        .select("doc_id", "text")
        .withColumn("len", length(col("text")).cast("long"))
      monitor.ingest(gated
        .withColumn("h", Sketches.uniformHash(col("doc_id").cast("string"))),
        "h", "len")
      val band = (monitor.sample.estimate(0.05), monitor.sample.estimate(0.95))
      val kept = (band._1, band._2) match {
        case (Some(lo), Some(hi)) =>
          gated.filter(col("len") >= lo && col("len") <= hi)
        case _ => gated
      }
      val keptC = kept.cache()
      val gatedN = gated.count()
      trimmedTotal += gatedN - keptC.count()
      lengthsLedger = lengthsLedger.unionByName(keptC.select("doc_id", "len"))
      pairsTotal += state.ingest(keptC.select("doc_id", "text")).count()
      // moment fold + projection through the current direction: the
      // trigger's embedding slice rides the same %nBatches scheme
      val eSlice = embs.filter(pmod(col("vec_id"), lit(nBatches)) === i)
      momMonitor.ingest(eSlice, "embedding")
      pcaComp.foreach { c =>
        projSum += eSlice.select(sum(abs(Pca.project(
            Covariance.quantized("embedding"), c))).as("s"))
          .head().getLong(0)
      }
      if ((i + 1) % compactEvery == 0) {
        // exact recalibration over everything kept so far — wall
        // recorded separately so the flat per-trigger claim stays honest
        val te = System.nanoTime()
        lengthsLedger = graft.ops.Materialize.barrier(lengthsLedger) // bound ledger plan growth
        lastExact = Buckets.quantilesByRange(
            lengthsLedger, "len", "doc_id", Seq(0.05, 0.5, 0.95))
          .collect().map(r => r.getDouble(r.fieldIndex("q")) ->
            r.getAs[Long]("value")).toMap
        exactWalls += (System.nanoTime() - te) / 1e9
        // PCA refresh from the monitor — pure driver math on the
        // O(d²) summary, walled separately so its cost is visible
        val tp = System.nanoTime()
        pcaComp = Some(Pca.topComponents(
          momMonitor.moments(spark).collect(), d = 64, k = 1).head)
        pcaRefreshWalls += (System.nanoTime() - tp) / 1e9
      }
      keptC.unpersist()
      (System.nanoTime() - t0) / 1e9
    }
    val q = nBatches / 4
    val firstQ = walls.take(q).sum / q
    val lastQ = walls.takeRight(q).sum / q
    val ramp = lastQ / firstQ
    val estP95 = monitor.sample.estimate(0.95).getOrElse(-1L)
    val exactP95 = lastExact.getOrElse(0.95, -1L)
    println(f"curation loop: $nBatches triggers, compactEvery=$compactEvery, " +
      f"pairs=$pairsTotal, trimmed=$trimmedTotal, firstQ ${firstQ}%.2f s/trigger, " +
      f"lastQ ${lastQ}%.2f, ramp ${ramp}%.2fx, swap trigger ${walls(swapAt)}%.2f s, " +
      f"p95 est/exact $estP95/$exactP95, pca refresh mean " +
      f"${pcaRefreshWalls.sum / math.max(1, pcaRefreshWalls.size)}%.3f s, " +
      f"projSum $projSum")
    docs.unpersist()
    embs.unpersist()
    f"""{"mode": "curation_loop", "triggers": $nBatches, "compact_every": $compactEvery, "pairs": $pairsTotal, "trimmed": $trimmedTotal, "first_q_sec": $firstQ%.3f, "last_q_sec": $lastQ%.3f, "ramp": $ramp%.2f, "lm_swap_at": $swapAt, "lm_swap_sec": ${walls(swapAt)}%.3f, "p95_est": $estP95, "p95_exact": $exactP95, "proj_sum": $projSum, "pca_refresh_walls": [${pcaRefreshWalls.map(w => f"$w%.3f").mkString(",")}], "exact_walls": [${exactWalls.map(w => f"$w%.2f").mkString(",")}], "walls": [${walls.map(w => f"$w%.2f").mkString(",")}]}"""
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nFiles = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (args.length > 1 && args(1) == "curation") {
      val line = curationLoop(spark, base, nBatches = 64, compactEvery = 8)
      println("STREAMCURATION " + line)
      spark.stop()
      return
    }

    // changefeed envelope fixture: events as ndjson, 64 objects.
    // Content-keyed dir (source path + length + mtime, as
    // CdcQueries.fixture does) — a bare count key would silently reuse
    // a stale fixture from a DIFFERENT dataset
    val srcFile = new java.io.File(s"$base/events.parquet")
    val tag = base.replaceAll("[^A-Za-z0-9]", "_") +
      s"_${srcFile.length()}_${srcFile.lastModified()}"
    val dir = s"/tmp/graft_streambench/src_${nFiles}_$tag"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      Tables.events(spark, base).select(
        to_json(array(col("user_id"))).as("key"),
        to_json(struct(col("event_id"), col("value"))).as("after"),
        concat((unix_micros(col("ts").cast("timestamp")) * 1000).cast("string"),
          lit(".0000000000")).as("updated"))
        .repartition(nFiles)
        .write.mode("overwrite").json(dir)
    }

    def drain(mft: Int, reader: => DataFrame): (Double, Int, Long) = {
      val ck = java.nio.file.Files.createTempDirectory("graft_sb_ck").toString
      var rows = 0L
      val t0 = System.nanoTime()
      val q = reader
        .writeStream.foreachBatch { (b: DataFrame, _: Long) =>
          rows += b.count(); ()
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(600000)
      val sec = (System.nanoTime() - t0) / 1e9
      val triggers = q.recentProgress.count(_.numInputRows > 0)
      q.stop()
      (sec, triggers, rows)
    }

    // warmup both paths once (JIT + codegen), not reported
    drain(32, graft.cdc.Changefeed.readStream(spark, dir, 32))
    drain(32, graft.cdc.Changefeed.readStreamGenericJson(spark, dir, 32))

    val out = for {
      mft <- Seq(1, 4, 16)
      (name, reader) <- Seq(
        "dsv2" -> (() => graft.cdc.Changefeed.readStream(spark, dir, mft)),
        "generic_json" -> (() => graft.cdc.Changefeed.readStreamGenericJson(spark, dir, mft)))
    } yield {
      val (sec, triggers, rows) = drain(mft, reader())
      val perTrigger = if (triggers == 0) 0.0 else sec * 1000.0 / triggers
      println(f"$name%-14s mft=$mft%-3d total ${sec}%6.2f s  " +
        f"triggers $triggers%3d  mean ${perTrigger}%7.1f ms/trigger  rows $rows")
      f"""{"path": "$name", "mft": $mft, "total_sec": $sec%.2f, "triggers": $triggers, "ms_per_trigger": $perTrigger%.1f, "rows": $rows}"""
    }
    println("STREAMBENCH [\n" + out.mkString(",\n") + "\n]")
    spark.stop()
  }
}
