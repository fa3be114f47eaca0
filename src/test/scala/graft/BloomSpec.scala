package graft

import graft.ops.Membership
import org.apache.spark.sql.functions._
import scala.util.Random

/** [[Membership]] — the Bloom-prefiltered semi-join is EXACTLY the
  * plain semi-join (no false negatives by construction, false
  * positives removed by the verify join), while the pre-filter
  * genuinely shrinks what reaches the exact join's shuffle.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom prefilter + exact verify == plain semi-join; candidates shrink") {
    for (seed <- Seq(13, 47)) {
      val rnd = new Random(seed)
      // big side: 5000 keys over a wide space; small side: 120 keys,
      // half of them planted in big (true matches), half absent
      val big = (1 to 5000).map(_ => s"doc_${rnd.nextInt(100000)}")
        .zipWithIndex.map { case (k, i) => (i.toLong, k) }
        .toDF("row_id", "key")
      val planted = big.select("key").distinct().orderBy("key").limit(60)
        .as[String].collect().toSeq
      val absent = (1 to 60).map(i => s"missing_${seed}_$i")
      val small = (planted ++ absent).toDF("ref_key")

      val want = big.join(small.select(col("ref_key")),
          col("key") === col("ref_key"), "left_semi")
        .select("row_id").as[Long].collect().sorted.toSeq
      val got = Membership.bloomSemiJoin(big, small, "key", "ref_key",
          expectedItems = 200L, numBits = 4096L)
        .select("row_id").as[Long].collect().sorted.toSeq
      assert(got == want, s"seed $seed: bloom semi-join diverged")
      assert(want.nonEmpty, s"seed $seed: degenerate fixture")

      // the prefilter is a SUPERSET of matches but far below |big| —
      // the point of the pattern: only candidates reach the shuffle
      val bloom = Membership.buildBloom(small, "ref_key", 200L, 4096L)
      val nCand = Membership.bloomCandidates(big, bloom, "key").count()
      val nBig = big.count()
      assert(nCand >= want.length.toLong)
      assert(nCand < nBig / 2,
        s"seed $seed: prefilter kept $nCand of $nBig — not selective")
    }
  }

  test("an undersized filter stays correct (only less selective)") {
    val big = (1L to 2000L).map(i => (i, s"k$i")).toDF("row_id", "key")
    val small = (1 to 500).map(i => s"k${i * 4}").toDF("ref_key")
    // expectedItems deliberately 10x too small: fpp degrades, output must not
    val got = Membership.bloomSemiJoin(big, small, "key", "ref_key",
        expectedItems = 50L, numBits = 256L)
      .select("row_id").as[Long].collect().sorted.toSeq
    val want = big.join(small, col("key") === col("ref_key"), "left_semi")
      .select("row_id").as[Long].collect().sorted.toSeq
    assert(got == want)
  }
}
