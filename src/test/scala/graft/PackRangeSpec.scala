package graft

import graft.queries.LlmQueries
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The giant-source prefix-sum modes of data_pack_sequences and
  * data_interleave_order must be DROP-INS: same chunk ids / positions
  * as the per-source window paths, per row, across forced, mixed and
  * plain regimes — tie and carry cases included.
  */
class PackRangeSpec extends SparkSpec {
  import spark.implicits._

  test("forced ranged packing ≡ window packing on the documents fixture") {
    val want = LlmQueries.dataPackSequences(spark, sfDir).collect().toSeq
    val got = LlmQueries.dataPackSequencesRanged(spark, sfDir).collect().toSeq
    assert(got === want)
  }

  test("mixed mode (some giant, some window sources) ≡ window packing") {
    // the fixture's sources are all equal-sized, so a GENUINE split
    // (range leg AND window leg in one plan) needs synthetic skew:
    // one 600-doc source over a 100-doc threshold, two small ones under
    val rows = (1 to 600).map(i => ("huge", i.toLong, (i % 90).toLong)) ++
      (1 to 40).map(i => ("mid", 1000L + i, 33L)) ++
      (1 to 5).map(i => ("tiny", 2000L + i, 400L))
    val d = rows.toDF("source", "doc_id", "__toks")
    val want = LlmQueries.packSequencesOn(d, giantSourceThreshold = 1L << 40)
      .collect().toSeq // threshold unreachable ⇒ pure window path
    val got = LlmQueries.packSequencesOn(d, giantSourceThreshold = 100L)
      .collect().toSeq // huge → range leg, mid/tiny → window leg
    assert(got === want)
  }

  test("mixed mode keeps NULL-source rows (routed to the window leg, never dropped)") {
    // isInCollection on a NULL key is NULL, and !NULL is also NULL —
    // un-coalesced split filters dropped null-source rows from BOTH
    // legs. The contract: nulls can never be giants (collect_list
    // skips them), so they take the window leg exactly like the
    // no-giant regime; row counts and chunk ids must match the pure
    // window path.
    val rows = (1 to 300).map(i => (Some("huge"), i.toLong, 64L)) ++
      (1 to 8).map(i => (None: Option[String], 1000L + i, 64L))
    val d = rows.toDF("source", "doc_id", "__toks")
    val want = LlmQueries.packSequencesOn(d, giantSourceThreshold = 1L << 40)
      .collect().toSeq
    val got = LlmQueries.packSequencesOn(d, giantSourceThreshold = 100L)
      .collect().toSeq
    assert(got.length === want.length)
    assert(got === want)
    val iw = LlmQueries.interleaveOn(d.select("doc_id", "source"),
      giantSourceThreshold = 1L << 40).collect().toSeq
    val ig = LlmQueries.interleaveOn(d.select("doc_id", "source"),
      giantSourceThreshold = 100L).collect().toSeq
    assert(ig === iw)
  }

  test("ranged packing ≡ window on tie/carry regimes (synthetic)") {
    // carry: one dominant source spans every range partition, so most
    // chunk boundaries need the cross-partition offset. Ties: runs of
    // zero-token docs sit EXACTLY on chunk boundaries (prefix equal for
    // many consecutive docs), and token counts that divide the budget
    // land prefixes exactly on multiples of 256.
    val rows =
      (1 to 900).map(i => ("big", i.toLong,
        if (i % 7 == 0) 0L else if (i % 3 == 0) 128L else 64L)) ++
      (1 to 30).map(i => ("small", 1000L + i, 256L)) ++
      Seq(("empty_docs", 2000L, 0L), ("empty_docs", 2001L, 0L))
    val d = rows.toDF("source", "doc_id", "__toks")
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = d
      .withColumn("chunk_id",
        floor(coalesce(sum(col("__toks")).over(w), lit(0L)) / 256L))
      .groupBy("source", "chunk_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("__toks")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy("source", "chunk_id").collect().toSeq
    val got = LlmQueries.packSequencesOn(d, giantSourceThreshold = 0L)
      .collect().toSeq
    assert(got === want)
  }

  test("forced ranged interleave ≡ window interleave on the fixture") {
    val want = LlmQueries.dataInterleaveOrder(spark, sfDir).collect().toSeq
    val got = LlmQueries.dataInterleaveOrderRanged(spark, sfDir).collect().toSeq
    assert(got === want)
  }

  test("mixed interleave (giant + window sources) ≡ pure window interleave") {
    val rows = (1 to 500).map(i => ("huge", i.toLong)) ++
      (1 to 30).map(i => ("mid", 1000L + i)) ++
      Seq(("tiny", 2000L))
    val d = rows.toDF("source", "doc_id").select("doc_id", "source")
    val want = LlmQueries.interleaveOn(d, giantSourceThreshold = 1L << 40)
      .collect().toSeq
    val mixed = LlmQueries.interleaveOn(d, giantSourceThreshold = 100L)
      .collect().toSeq
    val forced = LlmQueries.interleaveOn(d, giantSourceThreshold = 0L)
      .collect().toSeq
    assert(mixed === want)
    assert(forced === want)
  }

  test("giantSourceSplit: giants-only at the driver, all-giant flagged") {
    val d = ((1 to 500).map(i => s"doc$i" -> "huge") ++
      (1 to 3).map(i => s"s$i" -> "tiny_a") ++
      (1 to 4).map(i => s"t$i" -> "tiny_b")).toDF("doc_id", "source")
    val (giants, allGiant) =
      LlmQueries.giantSourceSplit(d.select("source"), "source", 100L)
    assert(giants === Set("huge"))
    assert(!allGiant)
    val (g2, all2) =
      LlmQueries.giantSourceSplit(d.select("source"), "source", 1L)
    assert(g2 === Set("huge", "tiny_a", "tiny_b"))
    assert(all2)
    val (g3, all3) =
      LlmQueries.giantSourceSplit(d.select("source"), "source", 10000L)
    assert(g3.isEmpty && !all3)
  }
}
