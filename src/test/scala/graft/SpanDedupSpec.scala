package graft

import graft.ops.Dedup

/** scrubRepeatedSpans on a fixture with INJECTED cross-doc spans:
  * shared spans at different offsets, islands longer than one shingle,
  * adjacent islands merging, separated islands staying distinct,
  * whole-document coverage, and untouched documents.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    // 5-token span s1..s5 buried at offset 3 …
    (1L, "a1 a2 a3 s1 s2 s3 s4 s5 c1 c2"),
    // … and the same span at offset 2 in another doc
    (2L, "x1 x2 s1 s2 s3 s4 s5 y1"),
    // fully unique — must pass through byte-identical
    (3L, "u1 u2 u3 u4 u5 u6"),
    // 8-token shared run: island of 4 consecutive shared shingles
    (4L, "p1 p2 q1 q2 q3 q4 q5 q6 q7 q8 p3"),
    (5L, "r1 q1 q2 q3 q4 q5 q6 q7 q8 r2 r3"),
    // exact copies: every shingle shared, whole text removed
    (6L, "w1 w2 w3 w4 w5 w6"),
    (7L, "w1 w2 w3 w4 w5 w6"),
    // two shared spans with a 1-token gap: stay SEPARATE spans
    (8L, "s1 s2 s3 s4 s5 g1 m1 m2 m3 m4 m5"),
    (9L, "h1 h2 m1 m2 m3 m4 m5 h3"),
    // two shared spans back-to-back: merge into ONE span
    (10L, "s1 s2 s3 s4 s5 m1 m2 m3 m4 m5"),
    // shorter than k tokens: no shingles, untouched
    (11L, "v1 v2 v3")
  ).toDF("doc_id", "text")

  test("injected cross-doc spans are found, merged, and scrubbed") {
    val got = Dedup.scrubRepeatedSpans(fixture, "doc_id", "text",
      k = 5, minDocs = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)]
      .collect().toSeq
    val want = Seq(
      (1L, 10L, 1L, 5L, "a1 a2 a3 c1 c2"),
      (2L, 8L, 1L, 5L, "x1 x2 y1"),
      (3L, 6L, 0L, 0L, "u1 u2 u3 u4 u5 u6"),
      (4L, 11L, 1L, 8L, "p1 p2 p3"),
      (5L, 11L, 1L, 8L, "r1 r2 r3"),
      (6L, 6L, 1L, 6L, ""),
      (7L, 6L, 1L, 6L, ""),
      (8L, 11L, 2L, 10L, "g1"),
      (9L, 8L, 1L, 5L, "h1 h2 h3"),
      (10L, 10L, 1L, 10L, ""),
      (11L, 3L, 0L, 0L, "v1 v2 v3"))
    assert(got === want)
  }

  test("minDocs gate: spans below the doc-frequency floor survive") {
    val got = Dedup.scrubRepeatedSpans(fixture, "doc_id", "text",
      k = 5, minDocs = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)]
      .collect().toSeq
    // s-span lives in docs 1/2/8/10 (df=4) and m-span in 8/9/10 (df=3)
    // — still scrubbed; the df=2 q/w spans now survive intact
    val want = Seq(
      (1L, 10L, 1L, 5L, "a1 a2 a3 c1 c2"),
      (2L, 8L, 1L, 5L, "x1 x2 y1"),
      (3L, 6L, 0L, 0L, "u1 u2 u3 u4 u5 u6"),
      (4L, 11L, 0L, 0L, "p1 p2 q1 q2 q3 q4 q5 q6 q7 q8 p3"),
      (5L, 11L, 0L, 0L, "r1 q1 q2 q3 q4 q5 q6 q7 q8 r2 r3"),
      (6L, 6L, 0L, 0L, "w1 w2 w3 w4 w5 w6"),
      (7L, 6L, 0L, 0L, "w1 w2 w3 w4 w5 w6"),
      (8L, 11L, 2L, 10L, "g1"),
      (9L, 8L, 1L, 5L, "h1 h2 h3"),
      (10L, 10L, 1L, 10L, ""),
      (11L, 3L, 0L, 0L, "v1 v2 v3"))
    assert(got === want)
  }
}
