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
      val merged = summaries.reduce(mg.merge)
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

  test("k below the guarantee floor is rejected loudly") {
    val df = Seq("a").toDF("g")
    intercept[IllegalArgumentException] {
      Frequency.heavyHitters(df, "g", minShare = 0.001, k = 100)
    }
  }
}
