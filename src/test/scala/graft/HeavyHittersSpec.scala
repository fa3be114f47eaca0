package graft

import graft.ops.{Frequency, MgSummary, MisraGries}
import org.apache.spark.sql.functions._

/** [[Frequency.heavyHitters]] — the Misra-Gries candidate pass can only
  * WIDEN the heavy-hitter set (superset guarantee, error ≤ n/(k+1)),
  * and the recount pass restores the exact naive answer independent of
  * partitioning. The MG invariants are checked directly on the
  * aggregator (sequential reduce + adversarial merge shapes), the
  * end-to-end op against a naive groupBy reference.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish random stream: item i drawn with weight 1/(i+1). */
  private def zipfStream(n: Int, vocab: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val weights = (0 until vocab).map(i => 1.0 / (i + 1))
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    (1 to n).map { _ =>
      val u = rnd.nextDouble()
      s"t${cum.indexWhere(u <= _) max 0}"
    }
  }

  test("MG invariants: undercount only, bounded by n/(k+1), superset of heavy items") {
    for (seed <- 1 to 5; k <- Seq(8, 32)) {
      val items = zipfStream(4000, 300, seed * 7919L)
      val mg = new MisraGries(k)
      // fold through an adversarial merge tree: 7 uneven chunks
      // reduced independently, merged pairwise left-to-right
      val chunks = items.grouped(math.max(1, items.size / 7)).toSeq
      val summaries = chunks.map(_.foldLeft(mg.zero)(mg.reduce))
      val merged = mg.finish(summaries.reduce(mg.merge))
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(merged.n == items.size)
      assert(merged.counts.size <= k)
      val bound = items.size.toDouble / (k + 1)
      for ((t, c) <- merged.counts) {
        assert(c <= exact(t), s"seed=$seed k=$k $t overcounted: $c > ${exact(t)}")
        assert(exact(t) - c <= bound + 1e-9,
          s"seed=$seed k=$k $t error ${exact(t) - c} exceeds n/(k+1)=$bound")
      }
      // superset: anything above the error bound must be present
      for ((t, c) <- exact if c > bound)
        assert(merged.counts.contains(t),
          s"seed=$seed k=$k heavy item $t (cnt=$c > $bound) missing from summary")
    }
  }

  test("heavyHitters ≡ naive groupBy threshold, across partitionings") {
    for (seed <- 1 to 3) {
      val items = zipfStream(6000, 500, seed * 104729L)
      val naive = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val threshold = math.ceil(0.01 * items.size).toLong
      val want = naive.filter(_._2 >= threshold).toSeq.sorted
      for (parts <- Seq(1, 3, 13)) {
        val df = items.toDF("g").repartition(parts)
        // k=200 forces MG pruning (vocab 500 > k) — the candidate set
        // is a strict subset of the vocabulary, yet never misses a hitter
        val got = Frequency.heavyHitters(df, "g", minShare = 0.01, k = 200)
          .select("g", "cnt").as[(String, Long)].collect().toSeq.sorted
        assert(got == want, s"seed=$seed parts=$parts")
      }
    }
  }

  test("share column is the exact cnt/n double; empty and degenerate inputs") {
    val df = (Seq.fill(90)("a") ++ Seq.fill(10)("b")).toDF("g")
    val rows = Frequency.heavyHitters(df, "g", minShare = 0.5, k = 8)
      .collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq(("a", 90L, 0.9)))
    val empty = Frequency.heavyHitters(Seq.empty[String].toDF("g"), "g", 0.5, 8)
    assert(empty.count() == 0)
    // nulls are ignored in both the summary's n and the recount
    val withNulls = Seq(Some("a"), None, Some("a"), None).toDF("g")
    val r2 = Frequency.heavyHitters(withNulls, "g", 1.0, 4).collect()
    assert(r2.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq(("a", 2L, 1.0)))
  }

  test("streaming fold: MG merged across micro-batches keeps invariants; recount ≡ batch") {
    // the summary IS the streaming state: one MG per micro-batch,
    // folded by merge — mergeability means the stream's final summary
    // obeys the same bound as a batch pass, so a streaming corpus
    // monitor needs O(k) state and never a token-keyed shuffle. The
    // recount over the accumulated corpus with the stream's candidates
    // must then equal the batch heavy-hitter answer exactly.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.{DataFrame, Encoders}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = 64
    val items = zipfStream(3000, 300, 20260815L)
    val stream = MemoryStream[String]
    val state = new java.util.concurrent.atomic.AtomicReference(
      MgSummary(Map.empty[String, Long], 0L))
    val q = stream.toDF().writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val s = batch.select(col("value").cast("string").as("item"))
        .as(Encoders.STRING).select(new MisraGries(k).toColumn).head()
      state.set(MisraGries.mergeSummaries(state.get, s, k))
      ()
    }.start()
    items.grouped(1000).foreach { chunk =>
      stream.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    val merged = state.get
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(merged.n == items.size)
    val bound = items.size.toDouble / (k + 1)
    for ((t, c) <- merged.counts) assert(c <= exact(t))
    for ((t, c) <- exact if c > bound)
      assert(merged.counts.contains(t), s"stream summary missed heavy item $t ($c)")
    // recount with the stream's candidates ≡ the batch answer
    val threshold = math.ceil(0.02 * merged.n.toDouble).toLong
    val want = exact.filter(_._2 >= threshold).toSeq.sorted
    val got = items.toDF("g")
      .filter(col("g").isInCollection(merged.counts.keys.toSeq))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .as[(String, Long)].collect().toSeq.sorted
    assert(got == want)
  }

  test("StreamingHeavyHitters: fold, save, resume ≡ continuous monitor; candidates superset") {
    val k = 48
    val items = zipfStream(5000, 400, 77L)
    val chunks = items.grouped(1250).toSeq
    // continuous monitor over all four chunks
    val cont = Frequency.StreamingHeavyHitters(k)
    chunks.foreach(c => cont.ingest(c.toDF("g"), "g"))
    // save after two chunks, resume, fold the rest — associativity
    // means the resumed state must equal the continuous one
    val first = Frequency.StreamingHeavyHitters(k)
    chunks.take(2).foreach(c => first.ingest(c.toDF("g"), "g"))
    val path = java.nio.file.Files.createTempDirectory("graft_hh").toString + "/sum"
    first.save(path, spark)
    val resumed = Frequency.StreamingHeavyHitters.resume(k, path, spark)
    chunks.drop(2).foreach(c => resumed.ingest(c.toDF("g"), "g"))
    assert(resumed.summary == cont.summary)
    assert(cont.summary.n == items.size)
    // candidates at any trigger are a superset of the true heavy set
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val minShare = 0.05
    val cand = cont.candidates(minShare).toSet
    for ((t, c) <- exact if c >= math.ceil(minShare * items.size))
      assert(cand.contains(t), s"monitor missed heavy item $t ($c)")
  }

  test("save survives a crash mid-write; torn generations refuse loudly") {
    val k = 16
    val items = zipfStream(1500, 80, 5L)
    val mon = Frequency.StreamingHeavyHitters(k)
    mon.ingest(items.toDF("g"), "g")
    val path = java.nio.file.Files.createTempDirectory("graft_hh_torn").toString + "/sum"
    mon.save(path, spark)
    val before = Frequency.StreamingHeavyHitters.resume(k, path, spark).summary
    // simulate a crash DURING the next save: a new generation dir with
    // data but no sentinel and no _SUCCESS — the r12 overwrite protocol
    // would have deleted the good summary before this point
    val dir = new java.io.File(path)
    val gens = dir.listFiles().map(_.getName).filter(_.startsWith("gen=")).sorted
    assert(gens.length == 1, gens.mkString(","))
    val tornGen = new java.io.File(dir, "gen=99/summary")
    assert(tornGen.mkdirs())
    java.nio.file.Files.writeString(
      tornGen.toPath.resolve("part-00000.parquet"), "torn garbage")
    // resume skips the torn generation and loads the committed one
    val resumed = Frequency.StreamingHeavyHitters.resume(k, path, spark)
    assert(resumed.summary == before)
    // a path holding ONLY torn generations refuses loudly
    val only = java.nio.file.Files.createTempDirectory("graft_hh_only").toString + "/sum"
    val t2 = new java.io.File(only, "gen=0/summary")
    assert(t2.mkdirs())
    val e = intercept[IllegalArgumentException] {
      Frequency.StreamingHeavyHitters.resume(k, only, spark)
    }
    assert(e.getMessage.contains("no committed"))
    // the next save numbers PAST the torn dir (never writes into it)
    mon.save(path, spark)
    val gens2 = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("gen=")).map(_.stripPrefix("gen=").toInt).sorted
    assert(gens2.last > 99, gens2.mkString(","))
  }

  test("k below the guarantee floor is rejected loudly") {
    val df = Seq("a").toDF("g")
    intercept[IllegalArgumentException] {
      Frequency.heavyHitters(df, "g", minShare = 0.001, k = 100)
    }
  }
}
