package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale smoke for the dedup family: synthesize an sf1-sized
  * documents/embeddings pair from sf0.1 (10 decorrelated replicas —
  * every word gets a replica suffix, every vector a replica-specific
  * circular shift, so dup STRUCTURE per replica matches the original
  * corpus and the workload scales linearly, not quadratically), then
  * time the four heavy dedup queries at both scales. Ratios far above
  * ~10–15× would expose a hidden quadratic no sf0.1 spec can see.
  * Results → SCALE.md. Fixture data lands under /tmp (never in the
  * read-only testdata tree).
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_scale/sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!new java.io.File(s"$out/documents.parquet").exists()) {
      val reps = explode(sequence(lit(0), lit(9))).as("__r")
      Tables.documents(spark, base).select(col("*"), reps)
        .select((col("doc_id") * 16 + col("__r")).as("doc_id"),
          // suffix EVERY word with the replica id: intra-replica dup
          // structure is preserved exactly, cross-replica jaccard is 0
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1_"), col("__r").cast("string"))).as("text"),
          col("lang"), col("source"))
        // n_chars re-derived from the REWRITTEN text — copying the
        // original value through would leave a stale length column
        .withColumn("n_chars", length(col("text")))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      Tables.embeddings(spark, base).select(col("*"), reps)
        .select((col("vec_id") * 16 + col("__r")).as("vec_id"),
          // replica-specific pseudo-random SIGN-FLIP mask: a diagonal
          // ±1 orthogonal transform, so every intra-replica cosine is
          // preserved EXACTLY while cross-replica cosines collapse to
          // ~0 even for clustered embeddings (a circular shift alone
          // lets shifted cluster centroids coincidentally align)
          expr("transform(embedding, (x, i) -> " +
            "CASE WHEN pmod(xxhash64(i, __r), 2) = 0 THEN x ELSE -x END)")
            .as("embedding"),
          col("label"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }

    if (!new java.io.File(s"$out/events.parquet").exists()) {
      val reps = explode(sequence(lit(0), lit(9))).as("__r")
      // 10 replicas = 10x the USERS with the same per-user event series:
      // per-key workload shape (txn buckets, sessions, GTID islands) is
      // preserved exactly; only the key cardinality scales
      Tables.events(spark, base).select(col("*"), reps)
        .select((col("event_id") * 16 + col("__r")).as("event_id"),
          col("ts"), (col("user_id") * 16 + col("__r")).as("user_id"),
          col("event_type"), col("value"), col("props"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/events.parquet")
    }

    import graft.queries.{CdcQueries, LlmQueries}
    val ops: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "cdc_gtid_frontier" -> (CdcQueries.gtidFrontier _),
      // the worst-case GTID shape: ONE source uuid (the common
      // single-primary deployment), dense GNO history with sparse
      // rollback holes. Pre-band-bucketing this sorted the whole
      // history in one task; the banded islands keep it parallel.
      // Synthesized directly (2e6 vs 2e7 gnos) — dir only picks size.
      "gtid_islands_single_source" -> ((s: SparkSession, dir: String) => {
        val n = if (dir == base) 2000000L else 20000000L
        val txns = s.range(n)
          .select(lit("uuid-1").as("source"), col("id").as("gno"))
          .filter(pmod(col("gno"), lit(997L)) =!= 0) // rollback holes
        graft.cdc.TxnLog.gtidFrontier(txns, "source", "gno")
      }),
      "cdc_txn_batches" -> (CdcQueries.txnBatches _),
      "q_sessionize" -> (graft.queries.Analytics.sessionize _),
      "dedup_minhash_lsh" -> (LlmQueries.dedupMinhashLsh _),
      "dedup_simhash" -> (LlmQueries.dedupSimhash _),
      "dedup_clusters" -> (LlmQueries.dedupClusters _),
      // measured at DUP-GRADE threshold 0.8, not the query's exploratory
      // 0.45: at dim 64, cross-corpus cosine has σ = 1/√64 = 0.125, so a
      // 0.45 cutoff (3.6σ) admits ~1e-4 of the ~2e8 random cross-replica
      // pairs — the TRUE answer is quadratic in corpus size at that
      // threshold and no operator can beat its own output size. At 0.8
      // (6.4σ) the expected random-pair count is ~0 and output is linear
      // — the regime a 100 TB dedup actually runs in.
      // auto bucket granularity + recall-budget tables (the scale knob
      // the 43x pinned-planes measurement motivated)
      "dedup_embedding_cosine@0.8" -> ((s: SparkSession, dir: String) =>
        graft.ops.Similarity.embeddingNearDups(
          Tables.embeddings(s, dir), "vec_id", "embedding",
          nPlanes = 0, nTables = 0, threshold = 0.8)))

    def time(fn: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = fn
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // JVM/codegen warmup on the small scale, not timed. The CDC queries
    // also pre-build their (one-time, cached) txnlog fixture at BOTH
    // scales so the timed run measures the operator, not fixture I/O.
    ops.foreach { case (_, fn) => fn(spark, base).count() }
    val fixtureBacked = Set("cdc_gtid_frontier", "cdc_txn_batches", "q_sessionize")
    ops.filter(o => fixtureBacked(o._1)).foreach { case (_, fn) =>
      fn(spark, out).count()
    }

    val lines = ops.map { case (name, fn) =>
      val (tBase, nBase) = time(fn(spark, base).count())
      val (tBig, nBig) = time(fn(spark, out).count())
      val ratio = tBig / tBase
      println(f"$name%-24s sf0.1: $tBase%6.2f s ($nBase rows)   " +
        f"sf1: $tBig%6.2f s ($nBig rows)   ratio ${ratio}%.1fx")
      f"""  "$name": {"sf01_sec": $tBase%.2f, "sf01_rows": $nBase, "sf1_sec": $tBig%.2f, "sf1_rows": $nBig, "ratio": $ratio%.2f}"""
    }
    println("SCALEJSON {\n" + lines.mkString(",\n") + "\n}")
    spark.stop()
  }
}
