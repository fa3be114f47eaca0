package graft

import graft.ops.TextOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Property check for the bigram-LM surprise scorer: for seeded random
  * corpora, [[TextOps.lmSurprise]] must equal a step-for-step naive
  * in-memory reimplementation (count maps + integer bit-length), the
  * same methodology SemanticPropertySpec applies to SemDeDup. This
  * pins the SEMANTICS (add-one smoothing, the integer log₂, the
  * <2-token-doc convention) independently of the DuckDB oracle, which
  * pins cross-engine agreement.
  */
class LmPropertySpec extends SparkSpec {
  import spark.implicits._

  private def naive(docs: Seq[(Long, String)],
      isRef: Long => Boolean): Map[Long, (Long, Long, Double)] = {
    def toks(t: String): Seq[String] = t.trim.toLowerCase.split("\\s+").toSeq
    val refToks = docs.filter(d => isRef(d._1)).map(d => toks(d._2))
    val vocab = refToks.flatten.distinct.size.toLong
    val refBigrams = refToks.flatMap(_.sliding(2).filter(_.size == 2)
      .map(p => (p(0), p(1))))
    val cPw = refBigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cP = refBigrams.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    def bitLength(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    docs.map { case (id, text) =>
      val bgs = toks(text).sliding(2).filter(_.size == 2).toSeq
      val bits = bgs.map { p =>
        val num = cPw.getOrElse((p(0), p(1)), 0L) + 1L
        val den = cP.getOrElse(p(0), 0L) + vocab
        bitLength(den / num)
      }.sum
      val n = bgs.size.toLong
      id -> (n, bits, if (n == 0) 0.0 else bits.toDouble / n)
    }.toMap
  }

  private def corpus(seed: Long, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("the", "cat", "sat", "on", "mat", "dog", "ran", "fast",
      "river", "stone", "wind", "blew", "cold", "night", "star", "fell",
      "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val random = (0 until nDocs).map { i =>
      val len = rnd.nextInt(30)
      (i.toLong, (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // edge docs: empty, whitespace, single-token, repeated bigram
    random ++ Seq((1000L, ""), (1001L, "   "), (1002L, "one"),
      (1003L, "the the the the"))
  }

  test("lmSurprise ≡ naive bigram LM on three seeded corpora") {
    for (seed <- Seq(7L, 41L, 1337L)) {
      val data = corpus(seed, 200)
      val df = data.toDF("doc_id", "text")
      val got = TextOps.lmSurprise(df, "doc_id", "text",
          isRef = pmod(col("doc_id"), lit(3)) === 0)
        .select("doc_id", "n_bigrams", "bits", "mean_bits")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      val want = naive(data, _ % 3 == 0)
      assert(got.keySet == want.keySet, s"seed $seed: doc set")
      for ((id, w) <- want)
        assert(got(id) == w, s"seed $seed doc $id: got ${got(id)} want $w")
    }
  }

  test("LM model persists: train once, save, load, score a NEW batch ≡ inline") {
    val trainDocs = corpus(99L, 120)
    val newBatch = corpus(7L, 80).map { case (id, t) => (id + 5000L, t) }
    val tmp = java.nio.file.Files.createTempDirectory("graft_lm").toString
    TextOps.saveLm(
      TextOps.trainLm(trainDocs.toDF("doc_id", "text"), "text"), tmp)
    val loaded = TextOps.loadLm(spark, tmp)
    val viaDisk = TextOps.scoreLm(loaded, newBatch.toDF("doc_id", "text"),
        "doc_id", "text")
      .select("doc_id", "n_bigrams", "bits", "mean_bits").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // the naive model trained on trainDocs, applied to the new batch
    val want = naive(trainDocs ++ newBatch, _ < 5000L)
      .filter { case (id, _) => id >= 5000L }
    assert(viaDisk == want)
  }

  private def naiveBounded(docs: Seq[(Long, String)], isRef: Long => Boolean,
      minCount: Long): Map[Long, (Long, Long, Double)] = {
    def toks(t: String): Seq[String] = t.trim.toLowerCase.split("\\s+").toSeq
    val refToks = docs.filter(d => isRef(d._1)).map(d => toks(d._2))
    val vocab = refToks.flatten.distinct.size.toLong
    val refBigrams = refToks.flatMap(_.sliding(2).filter(_.size == 2)
      .map(p => (p(0), p(1))))
    val full = refBigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val kept = full.filter(_._2 >= minCount)
    val unk = full.filter(_._2 < minCount).groupBy(_._1._1)
      .map { case (p, m) => p -> m.values.sum }
    val cP = full.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
      .filter(_._2 >= minCount)
    def bitLength(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    docs.map { case (id, text) =>
      val bgs = toks(text).sliding(2).filter(_.size == 2).toSeq
      val bits = bgs.map { p =>
        // kept type → its count; pruned or never seen → the context's
        // <unk> mass (0 when the context had nothing pruned)
        val num = kept.getOrElse((p(0), p(1)), unk.getOrElse(p(0), 0L)) + 1L
        val den = cP.getOrElse(p(0), 0L) + vocab
        bitLength(den / num)
      }.sum
      val n = bgs.size.toLong
      id -> (n, bits, if (n == 0) 0.0 else bits.toDouble / n)
    }.toMap
  }

  private def sparkBounded(docs: Seq[(Long, String)], isRef: Long => Boolean,
      minCount: Long): Map[Long, (Long, Long, Double)] = {
    val df = docs.toDF("doc_id", "text")
    val model = TextOps.trainLmBounded(
      df.filter(pmod(col("doc_id"), lit(3)) === 0), "text", minCount)
    TextOps.scoreLm(model, df, "doc_id", "text")
      .select("doc_id", "n_bigrams", "bits", "mean_bits").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
  }

  test("bounded LM with floor 1 ≡ unbounded, floors 2/3 ≡ naive bounded") {
    for (seed <- Seq(7L, 1337L)) {
      val data = corpus(seed, 200)
      val unbounded = TextOps.lmSurprise(data.toDF("doc_id", "text"),
          "doc_id", "text", isRef = pmod(col("doc_id"), lit(3)) === 0)
        .select("doc_id", "n_bigrams", "bits", "mean_bits").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      assert(sparkBounded(data, _ % 3 == 0, 1L) == unbounded,
        s"seed $seed: floor 1 must reproduce the unbounded model exactly")
      for (m <- Seq(2L, 3L)) {
        val got = sparkBounded(data, _ % 3 == 0, m)
        val want = naiveBounded(data, _ % 3 == 0, m)
        assert(got.keySet == want.keySet, s"seed $seed floor $m: doc set")
        for ((id, w) <- want)
          assert(got(id) == w, s"seed $seed floor $m doc $id: got ${got(id)} want $w")
      }
    }
  }

  test("bounded LM persists: save/load keeps the <unk> frame and scores") {
    val data = corpus(41L, 150)
    val df = data.toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_lm_bounded").toString
    TextOps.saveLm(TextOps.trainLmBounded(
      df.filter(pmod(col("doc_id"), lit(3)) === 0), "text", minCount = 2L), tmp)
    val viaDisk = TextOps.scoreLm(TextOps.loadLm(spark, tmp), df,
        "doc_id", "text")
      .select("doc_id", "n_bigrams", "bits", "mean_bits").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(viaDisk == sparkBounded(data, _ % 3 == 0, 2L))
  }

  test("giant-source cutpoint terciles ≡ per-source ntile, ties and tiny sources included") {
    // a scored-frame fixture exercising every regime the auto-switch
    // must keep exact: a dominant source with few distinct scores (the
    // tercile boundaries land INSIDE tie groups), an all-tied source
    // (one tie group spans all three buckets), a small source, and a
    // 2-doc source (fewer docs than buckets — ntile emits 1 and 2 only)
    val rnd = new scala.util.Random(17L)
    val giant = (0 until 211).map(i =>
      (i.toLong, "giant", 10L + i, 40L + i, Seq(1.0, 2.5, 2.5, 7.25)(rnd.nextInt(4))))
    val allTied = (0 until 50).map(i => (1000L + i, "tied", 5L, 20L, 4.0))
    val small = (0 until 7).map(i => (2000L + i, "small", 3L, 9L, i.toDouble))
    val tiny = Seq((3000L, "tiny", 1L, 2L, 0.5), (3001L, "tiny", 1L, 3L, 0.25))
    val scored = (giant ++ allTied ++ small ++ tiny)
      .toDF("doc_id", "source", "n_bigrams", "bits", "mean_bits")

    def rows(giants: Set[String], allGiant: Boolean = false): Seq[Row] =
      graft.queries.LlmQueries.lmTercileBuckets(scored, giants, allGiant)
        .orderBy("source", "bucket").collect().toSeq
    val viaWindow = rows(Set.empty)
    assert(viaWindow.nonEmpty)
    // every source through the range-rank path (both the unioned shape
    // and the pruned all-giant plan), and a mixed split — all match
    // the pure-window reference row-for-row (buckets, counts, ranges)
    assert(rows(Set("giant", "tied", "small", "tiny")) == viaWindow)
    assert(rows(Set("giant", "tied", "small", "tiny"), allGiant = true) == viaWindow)
    assert(rows(Set("giant", "tied")) == viaWindow)
  }

  test("reference docs score lower than out-of-domain docs on a themed corpus") {
    // train on theme-A docs; near-verbatim theme-A docs must carry less
    // surprise than never-seen-vocabulary docs (the filter's raison d'être)
    val a = (0 until 60).map(i =>
      (i * 2L, "the cat sat on the mat and the dog ran fast by the river"))
    val b = (0 until 20).map(i =>
      (i * 2L + 1L, "zorp blik quux fnord wibble jabber krunk splorch glip"))
    val df = (a ++ b).toDF("doc_id", "text")
    val out = TextOps.lmSurprise(df, "doc_id", "text",
        isRef = pmod(col("doc_id"), lit(2)) === 0)
      .select(col("doc_id"), col("mean_bits")).collect()
    val aMean = out.filter(_.getLong(0) % 2 == 0).map(_.getDouble(1)).max
    val bMean = out.filter(_.getLong(0) % 2 == 1).map(_.getDouble(1)).min
    assert(aMean < bMean,
      s"in-domain max $aMean must be below out-of-domain min $bMean")
  }
}
