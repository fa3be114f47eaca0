package graft

import graft.ops.{BottomKAgg, QEntry, QSample, Sketches, StreamingQuantiles}
import org.apache.spark.sql.functions._

/** The mergeable bottom-k quantile sample: sample membership is a pure
  * function of the data (hash-determined, partition/order independent),
  * the fold is associative (stream ≡ batch), estimates are exact when
  * the data fits the sample, and persistence follows the torn-write-
  * refusing generation protocol.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    // h: shuffled distinct hashes; v: long-tailed lengths
    val hs = rnd.shuffle((1 to n).map(_.toLong * 7919L))
    hs.map(h => (h, (math.abs(rnd.nextGaussian()) * 400).toLong + 10))
  }

  test("bottomKSample is partition-independent and = the true bottom-k") {
    val rows = fixture(800, 1L)
    val want = rows.sorted.take(64)
    for (parts <- Seq(1, 4, 13)) {
      val df = rows.toDF("h", "v").withColumn("scope", lit("s"))
        .repartition(parts)
      val got = Sketches.bottomKSample(df, 64)
        .select("h", "v").as[(Long, Long)].collect().toSeq.sorted
      assert(got == want, s"parts=$parts")
    }
  }

  test("bottomKSample scope cap: over-cap scopes pass through unpruned, answer unchanged") {
    // 50 scopes against a cap of 3: almost every scope overflows the
    // per-task heap map, so its rows stream through unpruned to stage
    // 2's window — the r15 task-memory contract (the map never exceeds
    // maxScopesPerTask × k rows BY CONSTRUCTION: a 51st scope never
    // allocates a heap). The cap is a memory bound, never a semantics
    // knob: the capped result must equal the uncapped path's exactly.
    val rnd = new scala.util.Random(7L)
    val rows = (0 until 50).flatMap { sc =>
      (0 until 40).map(i => (s"s$sc", rnd.nextLong(), sc * 40L + i))
    }
    val df = rows.toDF("scope", "h", "v").repartition(4)
    def run(cap: Int) = Sketches.bottomKSample(df, 8, maxScopesPerTask = cap)
      .select("scope", "h", "v", "rank").as[(String, Long, Long, Int)]
      .collect().toSet
    val uncapped = run(Int.MaxValue)
    val capped = run(3)
    assert(capped == uncapped)
    assert(capped.groupBy(_._1).values.forall(_.size == 8))
  }

  test("sampledQuantiles: est is the sample's discrete quantile; n <= k => est = exact") {
    // small scope fits the sample entirely: every estimate must equal
    // the exact quantile (err = 0); big scope's err is bounded sanely
    val small = fixture(40, 2L).map { case (h, v) => ("small", h, v) }
    val big = fixture(2000, 3L).map { case (h, v) => ("big", h, v) }
    val df = (small ++ big).toDF("scope", "h", "v")
    val out = Sketches.sampledQuantiles(df, 64, Seq(0.25, 0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.length == 6)
    for ((scope, q, est, exact, err) <- out) {
      assert(err == est - exact)
      if (scope == "small") assert(err == 0L, s"small scope q=$q: $est vs $exact")
      else {
        // order-statistic sanity: the q-estimate from a 64-row uniform
        // sample must land within the exact p(q±0.25) band
        val vs = big.map(_._3).sorted
        val lo = vs(math.ceil(math.max(0.01, q - 0.25) * vs.size).toInt - 1)
        val hi = vs(math.ceil(math.min(1.0, q + 0.25) * vs.size).toInt - 1)
        assert(est >= lo && est <= hi, s"big scope q=$q: est=$est outside [$lo, $hi]")
      }
    }
  }

  test("streaming fold ≡ batch pass (associativity), any chunking") {
    val k = 48
    val rows = fixture(1200, 4L)
    val batchSample = {
      val mono = StreamingQuantiles(k)
      mono.ingest(rows.toDF("h", "v"), "h", "v")
      mono.sample
    }
    for (chunkSize <- Seq(100, 333, 1200)) {
      val m = StreamingQuantiles(k)
      rows.grouped(chunkSize).foreach(c => m.ingest(c.toDF("h", "v"), "h", "v"))
      assert(m.sample == batchSample, s"chunkSize=$chunkSize")
      assert(m.sample.n == rows.size)
    }
    // the sample IS the true bottom-k of everything seen
    assert(batchSample.entries == rows.sorted.take(k).map {
      case (h, v) => QEntry(h, v) })
  }

  test("estimate: integer-rank rule, exact when n <= k, (0,1] contract") {
    val s = QSample(Seq(QEntry(3, 30), QEntry(1, 10), QEntry(2, 20))
      .sortBy(e => (e.h, e.v)), 3)
    assert(s.estimate(0.5).contains(20L)) // rank ceil(0.5*3)=2 by value
    assert(s.estimate(1.0).contains(30L))
    assert(s.estimate(0.01).contains(10L))
    assert(QSample(Seq.empty, 0).estimate(0.5).isEmpty)
    intercept[IllegalArgumentException](s.estimate(0.0))
  }

  test("save/resume: round-trip, torn generation refused, crash keeps previous") {
    val k = 32
    val rows = fixture(500, 5L)
    val m = StreamingQuantiles(k)
    m.ingest(rows.take(300).toDF("h", "v"), "h", "v")
    val path = java.nio.file.Files.createTempDirectory("graft_qs").toString + "/q"
    m.save(path, spark)
    val resumed = StreamingQuantiles.resume(k, path, spark)
    assert(resumed.sample == m.sample)
    // resumed + remaining ≡ continuous
    resumed.ingest(rows.drop(300).toDF("h", "v"), "h", "v")
    m.ingest(rows.drop(300).toDF("h", "v"), "h", "v")
    assert(resumed.sample == m.sample)
    // torn next-generation (crash before sentinel) falls back cleanly
    val torn = new java.io.File(path, "gen=50/sample")
    assert(torn.mkdirs())
    assert(StreamingQuantiles.resume(k, path, spark).sample != null)
    // torn-only path refuses loudly
    val only = java.nio.file.Files.createTempDirectory("graft_qs2").toString + "/q"
    assert(new java.io.File(only, "gen=0/sample").mkdirs())
    val e = intercept[IllegalArgumentException](
      StreamingQuantiles.resume(k, only, spark))
    assert(e.getMessage.contains("no committed"))
  }

  test("weighted sample: ticket-min key matches driver recompute; P(first) tracks weight") {
    // the duplication scheme's key — min of w ticket hashes — must be
    // exactly what the column expression computes (membership is a
    // pure function of the data), and the first draw must land on a
    // doc with probability proportional to its weight
    def key(id: Long, w: Int): Long =
      (1 to w).map(t => Sketches.uniformHashLong(s"$id:$t")).min
    val nScopes = 400
    // per scope: one weight-8 doc + eight weight-1 docs => P(heavy first) = 1/2
    val rows = (0 until nScopes).flatMap { sc =>
      val heavy = (s"s$sc", sc.toLong * 100, 8)
      val light = (1 to 8).map(i => (s"s$sc", sc.toLong * 100 + i, 1))
      heavy +: light
    }
    val df = rows.toDF("scope", "doc", "w").withColumn("h",
      array_min(transform(sequence(lit(1), col("w")),
        t => Sketches.uniformHash(concat(col("doc").cast("string"),
          lit(":"), t.cast("string"))))))
      .withColumn("v", col("doc"))
    // expression ≡ driver recompute, row by row
    df.select("doc", "w", "h").collect().foreach { r =>
      assert(r.getLong(2) == key(r.getLong(0), r.getInt(1)), s"doc ${r.getLong(0)}")
    }
    val first = Sketches.bottomKSample(df, 1)
    val heavyFirsts = first.filter(col("doc") % 100 === 0).count()
    // exact expectation nScopes/2; the fixture is deterministic — the
    // band just documents how tight proportional-to-weight runs
    assert(heavyFirsts > (0.42 * nScopes).toInt && heavyFirsts < (0.58 * nScopes).toInt,
      s"heavy-doc first-draw share ${heavyFirsts.toDouble / nScopes}")
  }

  test("BottomKAgg under adversarial merge shapes keeps the true bottom-k") {
    val k = 16
    val agg = new BottomKAgg(k)
    val rows = fixture(300, 6L)
    val chunks = rows.grouped(47).toSeq
    val bufs = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
    val merged = agg.finish(bufs.reduce(agg.merge))
    assert(merged.n == rows.size)
    assert(merged.entries == rows.sorted.take(k).map {
      case (h, v) => QEntry(h, v) })
  }
}
