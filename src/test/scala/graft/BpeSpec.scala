package graft

import graft.ops.Bpe
import graft.queries.LlmQueries
import org.apache.spark.sql.functions._

/** The distributed BPE trainer against a straightforward single-node
  * reference implementation, plus the replace-chain apply semantics
  * (greedy left-to-right non-overlapping merging) on its edge cases.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Single-node greedy left-to-right merge of one pair in one word —
    * the semantics `replace` has on the delimiter representation.
    */
  private def mergeWord(syms: List[String], a: String, b: String): List[String] = {
    val buf = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        buf += (a + b); i += 2
      } else { buf += syms(i); i += 1 }
    }
    buf.toList
  }

  /** Single-node reference trainer: same deterministic objective
    * (pair count desc, then (a, b) lexicographic; stop below count 2).
    */
  private def refTrain(words: Seq[(String, Long)], n: Int): Seq[(String, String)] = {
    var vocab = words.map { case (w, f) => (w.map(_.toString).toList, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (out.length < n && !done) {
      val counts = vocab.flatMap { case (s, f) =>
        s.zip(s.drop(1)).map(p => (p, f))
      }.groupMapReduce(_._1)(_._2)(_ + _).filter(_._2 >= 2)
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        vocab = vocab.map { case (s, f) => (mergeWord(s, best._1, best._2), f) }
      }
    }
    out.toSeq
  }

  private def tok(c: org.apache.spark.sql.Column) = split(lower(trim(c)), "\\s+")

  test("train matches the single-node reference on a handcrafted corpus") {
    val docs = Seq(
      "the cat sat on the mat",
      "the hat that the cat wore",
      "a a a b b aa ab the that").toDF("text")
    val words = Bpe.wordCounts(docs, "text", tok)
    val refWords = words.as[(String, Long)].collect().toSeq
    assert(Bpe.train(words, 8) === refTrain(refWords, 8))
  }

  test("train matches the reference on the sf0.001 corpus (12 merges)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val words = Bpe.wordCounts(docs, "text", tok)
    val refWords = words.as[(String, Long)].collect().toSeq
    assert(Bpe.train(words, 12) === refTrain(refWords, 12))
  }

  test("replace-chain apply is greedy left-to-right: overlap + chained merges") {
    val cases = Seq(
      // (a,a) on "aaa" merges the FIRST two only
      ("aaa", Seq(("a", "a")), 2),
      // (a,a) on "aaaa" merges disjointly into two
      ("aaaa", Seq(("a", "a")), 2),
      // chained: a+s, as+h, h+ash — "hash" collapses to one token
      ("hash", Seq(("a", "s"), ("as", "h"), ("h", "ash")), 1),
      // merge product participates in LATER merges only
      ("ash", Seq(("a", "s"), ("as", "h")), 1),
      ("sash", Seq(("a", "s"), ("as", "h")), 2),
      ("x", Seq(("a", "s")), 1))
    cases.foreach { case (w, merges, want) =>
      val n = Seq(w).toDF("word")
        .select(Bpe.symbolCount(Bpe.applyMerges(Bpe.toSymbols(col("word")), merges)))
        .collect()(0).getInt(0)
      assert(n === want, s"word=$w merges=$merges")
    }
  }

  test("apply only ever joins: stripping delimiters recovers the original word") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bad = docs.select(explode(tok(col("text"))).as("word"))
      .where(col("word") =!= "")
      .withColumn("syms",
        Bpe.applyMerges(Bpe.toSymbols(col("word")), LlmQueries.bpeMerges))
      .where(regexp_replace(col("syms"), Bpe.Delim, "") =!= col("word"))
      .count()
    assert(bad === 0L)
  }

  test("the pinned query merge table is exactly what training on sf0.01 yields") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val words = Bpe.wordCounts(docs, "text", tok)
    assert(Bpe.train(words, 16) === LlmQueries.bpeMerges)
  }
}
