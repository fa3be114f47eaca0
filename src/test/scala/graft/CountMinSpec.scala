package graft

import graft.ops.{CountMin, Sketches, StreamingCountMin}
import org.apache.spark.sql.functions._

/** Count-Min sketch: the distributed build matches a driver-side
  * simulation cell-for-cell, estimates never undercount, the streaming
  * fold is order-independent (pure addition), and persistence follows
  * the torn-write-refusing generation protocol.
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val p = CountMin.Params(d = 3, w = 32)

  /** Zipf-ish deterministic corpus: token i appears ~N/i times. */
  private def fixture(n: Int): Seq[String] =
    (1 to n).flatMap(i => Seq.fill(n / i)(s"tok$i"))

  private def simulate(items: Seq[String]): Array[Long] = {
    val cells = new Array[Long](p.d * p.w)
    for (it <- items; r <- 0 until p.d)
      cells(r * p.w + CountMin.bucketLong(r, it, p.w)) += 1L
    cells
  }

  test("distributed counters == driver simulation, under any partitioning") {
    val items = fixture(60)
    val want = simulate(items)
    for (parts <- Seq(1, 5, 17)) {
      val got = new Array[Long](p.d * p.w)
      CountMin.counters(items.toDF("item").repartition(parts), "item", p)
        .collect().foreach { r =>
          got(r.getAs[Int]("r") * p.w + r.getAs[Long]("bucket").toInt) =
            r.getAs[Long]("c")
        }
      assert(got.toSeq == want.toSeq, s"parts=$parts")
    }
  }

  test("estimates never undercount; exact when the item's cells are collision-free") {
    val items = fixture(60)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ctrs = CountMin.counters(items.toDF("item"), "item", p)
    val probes = exact.keys.toSeq.toDF("item")
    val est = CountMin.estimates(probes, ctrs, p).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cells = simulate(items)
    for ((tok, cnt) <- exact) {
      assert(est(tok) >= cnt, s"$tok undercounted: ${est(tok)} < $cnt")
      // min-of-cells is what the estimate must BE
      val want = (0 until p.d)
        .map(r => cells(r * p.w + CountMin.bucketLong(r, tok, p.w))).min
      assert(est(tok) == want, tok)
    }
    // an item never ingested estimates 0 (left join reads empty cells
    // as 0 only when no other token shares them — assert the bound)
    val ghost = CountMin.estimates(Seq("never-seen-tok-xyz").toDF("item"), ctrs, p)
      .collect().head.getLong(1)
    assert(ghost >= 0L)
  }

  test("fastHash mode: overcount-only invariant is hash-agnostic; build/probe agree") {
    val items = fixture(60)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ctrs = CountMin.counters(items.toDF("item"), "item", p, fastHash = true)
    // total mass per sketch row is conserved whatever the hash
    val mass = ctrs.groupBy("r").agg(sum("c").as("m")).collect()
      .map(r => r.getAs[Int]("r") -> r.getAs[Long]("m")).toMap
    assert((0 until p.d).forall(r => mass(r) == items.size.toLong))
    val est = CountMin.estimates(exact.keys.toSeq.toDF("item"), ctrs, p,
        fastHash = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((tok, cnt) <- exact)
      assert(est(tok) >= cnt, s"$tok undercounted under fastHash")
  }

  test("streaming fold == batch under any chunking; counters add") {
    val items = fixture(80)
    val batch = StreamingCountMin(p)
    batch.ingest(items.toDF("item"), "item")
    for (chunk <- Seq(30, 77, items.size)) {
      val m = StreamingCountMin(p)
      items.grouped(chunk).foreach(c => m.ingest(c.toDF("item"), "item"))
      assert(m.counterArray.toSeq == batch.counterArray.toSeq, s"chunk=$chunk")
      assert(m.n == items.size)
      assert(m.estimate("tok1") == batch.estimate("tok1"))
    }
    assert(batch.counterArray.toSeq == simulate(items).toSeq)
    assert(batch.estimate("tok1") >= items.count(_ == "tok1"))
  }

  test("monitor composition: MG lower bound + CMS upper bound sandwich the truth, restart-safe") {
    // the deployed shape: Misra-Gries names WHO is heavy (stored count
    // UNDERCOUNTS), the CMS answers HOW OFTEN for any probed item
    // (estimate OVERCOUNTS) — so for every MG candidate, at every
    // trigger: mg_stored <= true <= cms_est. Streamed with a mid-loop
    // save/resume of both monitors; final state == continuous run.
    import graft.ops.Frequency.StreamingHeavyHitters
    val mgK = 8
    val items = fixture(40) // zipf-ish: tok1 heavy, long tail
    val batches = items.grouped(37).toSeq
    def run(restartAt: Option[Int]): (Map[String, Long], Seq[Long]) = {
      var hh = StreamingHeavyHitters(mgK)
      var cms = StreamingCountMin(p)
      val dir = java.nio.file.Files.createTempDirectory("graft_mon").toString
      batches.zipWithIndex.foreach { case (b, bi) =>
        restartAt.filter(_ == bi).foreach { _ =>
          hh.save(s"$dir/hh", spark); cms.save(s"$dir/cms", spark)
          hh = StreamingHeavyHitters.resume(mgK, s"$dir/hh", spark)
          cms = StreamingCountMin.resume(p, s"$dir/cms", spark)
        }
        hh.ingest(b.toDF("item"), "item")
        cms.ingest(b.toDF("item"), "item")
        val seen = items.take(batches.take(bi + 1).map(_.size).sum)
        for ((cand, stored) <- hh.summary.counts) {
          val truth = seen.count(_ == cand).toLong
          assert(stored <= truth, s"MG overcounted $cand at trigger $bi")
          assert(cms.estimate(cand) >= truth, s"CMS undercounted $cand at trigger $bi")
        }
      }
      (hh.summary.counts, cms.counterArray.toSeq)
    }
    val continuous = run(None)
    assert(run(Some(1)) == continuous, "restart changed the monitors")
    // the heavy head is named by MG and bounded tightly by CMS
    assert(continuous._1.contains("tok1"))
  }

  test("save/resume: round-trip, torn generation refused, crash keeps previous") {
    val items = fixture(50)
    val m = StreamingCountMin(p)
    m.ingest(items.take(200).toDF("item"), "item")
    val path = java.nio.file.Files.createTempDirectory("graft_cms").toString + "/c"
    m.save(path, spark)
    val resumed = StreamingCountMin.resume(p, path, spark)
    assert(resumed.counterArray.toSeq == m.counterArray.toSeq)
    assert(resumed.n == m.n)
    // resumed + remaining == continuous
    resumed.ingest(items.drop(200).toDF("item"), "item")
    m.ingest(items.drop(200).toDF("item"), "item")
    assert(resumed.counterArray.toSeq == m.counterArray.toSeq)
    // commit the updated state, then a torn NEXT generation (crash
    // before sentinel) must fall back to it, not shadow it
    m.save(path, spark)
    assert(new java.io.File(path, "gen=50/cms").mkdirs())
    val after = StreamingCountMin.resume(p, path, spark)
    assert(after.counterArray.toSeq == m.counterArray.toSeq)
    assert(after.n == m.n)
    // torn-only path refuses loudly
    val only = java.nio.file.Files.createTempDirectory("graft_cms2").toString + "/c"
    assert(new java.io.File(only, "gen=0/cms").mkdirs())
    val e = intercept[IllegalArgumentException](
      StreamingCountMin.resume(p, only, spark))
    assert(e.getMessage.contains("no committed"))
  }

  test("resume refuses a sketch-shape mismatch (flat indices would misplace)") {
    // save with w=32, resume with w=64: d*w still covers every saved
    // flat index, so without the shape gate the counters would land in
    // the WRONG (row, bucket) cells and estimate() could undercount —
    // the one failure the sketch's contract forbids. The gate refuses
    // as loudly as a torn generation, for any differing d or w.
    val items = fixture(40)
    val m = StreamingCountMin(p)
    m.ingest(items.toDF("item"), "item")
    val path = java.nio.file.Files.createTempDirectory("graft_cms3").toString + "/c"
    m.save(path, spark)
    for (bad <- Seq(CountMin.Params(p.d, p.w * 2), CountMin.Params(p.d + 1, p.w))) {
      val e = intercept[IllegalArgumentException](
        StreamingCountMin.resume(bad, path, spark))
      assert(e.getMessage.contains("shape"), bad.toString)
    }
    // the matching shape still round-trips
    assert(StreamingCountMin.resume(p, path, spark)
      .counterArray.toSeq == m.counterArray.toSeq)
  }

  test("allowLegacy resumes a shape-less (pre-r14) generation; default refuses") {
    // simulate a pre-shape checkpoint: same cell/total rows, NO idx
    // -2/-3 shape rows. Default resume must refuse loudly (the file
    // cannot vouch for any shape); allowLegacy = true accepts it under
    // the CALLER's Params and reproduces the counters exactly. A
    // generation that DOES state a shape still refuses a mismatch even
    // under allowLegacy — the flag vouches for absence, not conflict.
    val items = fixture(40)
    val m = StreamingCountMin(p)
    m.ingest(items.toDF("item"), "item")
    val legacy = java.nio.file.Files.createTempDirectory("graft_cms4").toString + "/c"
    val frame = (m.counterArray.zipWithIndex.collect { case (c, i) if c != 0L =>
      (i, c, false) }.toSeq :+ ((-1, m.n, true)))
      .toDF("idx", "c", "is_n").coalesce(1)
    // hand-written generation (save() would add the shape rows): the
    // parquet plus the commit sentinel, exactly what a pre-r14 save left
    frame.write.parquet(s"$legacy/gen=0/cms")
    assert(new java.io.File(s"$legacy/gen=0/_GRAFT_COMMITTED").createNewFile())
    val e = intercept[IllegalArgumentException](
      StreamingCountMin.resume(p, legacy, spark))
    assert(e.getMessage.contains("allowLegacy"))
    val resumed = StreamingCountMin.resume(p, legacy, spark, allowLegacy = true)
    assert(resumed.counterArray.toSeq == m.counterArray.toSeq)
    assert(resumed.n == m.n)
    // stated-shape mismatch is still fatal under allowLegacy
    val shaped = java.nio.file.Files.createTempDirectory("graft_cms5").toString + "/c"
    m.save(shaped, spark)
    val e2 = intercept[IllegalArgumentException](StreamingCountMin.resume(
      CountMin.Params(p.d, p.w * 2), shaped, spark, allowLegacy = true))
    assert(e2.getMessage.contains("shape"))
  }

  test("non-string probe column agrees with the string build (both hash modes)") {
    // counters() casts the build side to string; estimates() must cast
    // the probe identically — under fastHash, xxhash64 of a raw INT
    // probe would silently hit different buckets and return 0 (an
    // undercount with no error). Build from string tokens "1".."40",
    // probe with the INT column 1..40: estimates must be >= truth and
    // equal to the string-probe estimates, in md5 AND xxhash64 modes.
    val nums = (1 to 40).flatMap(i => Seq.fill(41 - i)(i))
    for (fast <- Seq(false, true)) {
      val ctrs = CountMin.counters(nums.toDF("item"), "item", p, fast)
      val intEst = CountMin.estimates(nums.distinct.toDF("item"), ctrs, p, fast)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val strEst = CountMin.estimates(nums.distinct.map(_.toString).toDF("item"),
          ctrs, p, fast)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(intEst == strEst, s"fastHash=$fast: typed probe diverged")
      for (i <- 1 to 40)
        assert(intEst(i.toString) >= (41 - i).toLong, s"fastHash=$fast tok=$i")
    }
  }
}
