package graft

import graft.ops.{CovMoments, Covariance, Pca, StreamingMoments}
import org.apache.spark.sql.functions._

/** The exact second-moment aggregate: distributed result equals a
  * driver-side simulation under any partitioning, the merge is
  * elementwise addition (associative), and dimension mismatches raise
  * rather than silently unbalance the moments.
  */
class CovarianceSpec extends SparkSpec {
  import spark.implicits._

  private val d = 5

  private def fixture(n: Int): Seq[Array[Long]] =
    (0 until n).map(r => Array.tabulate(d)(i => ((r * 31 + i * 7) % 19 - 9).toLong))

  private def simulate(rows: Seq[Array[Long]]): (Map[(Int, Int), Long], Array[Long], Long) = {
    val tri = scala.collection.mutable.Map.empty[(Int, Int), Long].withDefaultValue(0L)
    val sums = new Array[Long](d)
    for (q <- rows; i <- 0 until d) {
      sums(i) += q(i)
      for (j <- i until d) tri((i, j)) += q(i) * q(j)
    }
    (tri.toMap, sums, rows.size.toLong)
  }

  test("moments == driver simulation, under any partitioning") {
    val rows = fixture(200)
    val (tri, sums, n) = simulate(rows)
    for (parts <- Seq(1, 4, 13)) {
      val df = rows.map(q => Tuple1(q.map(_.toFloat / 10000.0f)))
        .toDF("embedding").repartition(parts)
      val got = Covariance.moments(df, "embedding", d).collect()
      assert(got.length == d * (d + 1) / 2, s"parts=$parts")
      got.foreach { r =>
        val (i, j) = (r.getLong(0).toInt - 1, r.getLong(1).toInt - 1)
        assert(r.getLong(2) == tri((i, j)), s"s_xy($i,$j) parts=$parts")
        assert(r.getLong(3) == sums(i) && r.getLong(4) == sums(j), s"sums($i,$j)")
        assert(r.getLong(5) == n)
      }
    }
  }

  test("merge is elementwise addition; triIndex is the row-major upper triangle") {
    val agg = new CovMoments(d)
    val rows = fixture(90)
    val chunks = rows.grouped(23).toSeq
    val merged = chunks.map(_.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge)
    val whole = rows.foldLeft(agg.zero)(agg.reduce)
    assert(merged.toSeq == whole.toSeq)
    // triIndex covers 0..nPairs-1 exactly once, in the documented order
    val idxs = for (i <- 0 until d; j <- i until d) yield Covariance.triIndex(i, j, d)
    assert(idxs == (0 until d * (d + 1) / 2))
  }

  test("dimension mismatch raises") {
    val agg = new CovMoments(d)
    val e = intercept[IllegalArgumentException](
      agg.reduce(agg.zero, Array(1L, 2L)))
    assert(e.getMessage.contains("dim"))
  }

  test("element magnitude outside the fixed-point bound raises, not wraps") {
    // the documented no-overflow bound assumes |x| <= 1 (|q| <= scale);
    // an element at 1.5 would silently wrap Sigma q_i*q_j into garbage
    // that still hash-matches itself — moments() must raise instead
    val bad = Seq(Tuple1(Array.fill(d)(1.5f))).toDF("embedding")
    val e = intercept[Exception](
      Covariance.moments(bad, "embedding", d).collect())
    assert(e.getMessage != null &&
      (e.getMessage.contains("fixed-point bound") ||
        Option(e.getCause).exists(_.getMessage.contains("fixed-point bound"))))
    // boundary |x| == 1 (q == scale exactly) still passes
    val edge = Seq(Tuple1(Array.fill(d)(1.0f))).toDF("embedding")
    assert(Covariance.moments(edge, "embedding", d).count() == d * (d + 1) / 2)
  }

  private def embDf(rs: Seq[Array[Long]]) =
    rs.map(q => Tuple1(q.map(_.toFloat / 10000.0f))).toDF("embedding")

  test("StreamingMoments: fold == batch under any chunking; PCA refresh needs no re-scan") {
    val rows = fixture(180)
    val batch = StreamingMoments(d)
    batch.ingest(embDf(rows), "embedding")
    for (chunk <- Seq(37, 80, rows.size)) {
      val m = StreamingMoments(d)
      rows.grouped(chunk).foreach(c => m.ingest(embDf(c), "embedding"))
      assert(m.summaryArray.toSeq == batch.summaryArray.toSeq, s"chunk=$chunk")
      assert(m.n == rows.size)
    }
    // the monitor's frame IS the batch operator's frame — so a PCA
    // refresh from the monitor equals a full-corpus re-derivation,
    // bit for bit, with no re-scan of anything
    val fromMonitor = batch.moments(spark).collect().map(_.toSeq)
      .sortBy(_.toString()).toSeq
    val fromBatch = Covariance.moments(embDf(rows), "embedding", d)
      .collect().map(_.toSeq).sortBy(_.toString()).toSeq
    assert(fromMonitor == fromBatch)
    val refreshed = Pca.topComponents(batch.moments(spark).collect(), d, k = 2)
    val full = Pca.topComponents(
      Covariance.moments(embDf(rows), "embedding", d).collect(), d, k = 2)
    assert(refreshed.map(_.toSeq) == full.map(_.toSeq))
  }

  test("StreamingMoments: save/resume round-trips; torn and shape mismatches refuse") {
    val rows = fixture(120)
    val m = StreamingMoments(d)
    m.ingest(embDf(rows.take(70)), "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft_mom").toString + "/m"
    m.save(path, spark)
    val resumed = StreamingMoments.resume(d, path, spark)
    assert(resumed.summaryArray.toSeq == m.summaryArray.toSeq)
    // resumed + remaining == continuous
    resumed.ingest(embDf(rows.drop(70)), "embedding")
    m.ingest(embDf(rows.drop(70)), "embedding")
    assert(resumed.summaryArray.toSeq == m.summaryArray.toSeq)
    // a torn NEXT generation (crash before sentinel) falls back to the
    // committed one
    m.save(path, spark)
    assert(new java.io.File(path, "gen=50/moments").mkdirs())
    val after = StreamingMoments.resume(d, path, spark)
    assert(after.summaryArray.toSeq == m.summaryArray.toSeq)
    // shape gates: different d, different scale — both refuse loudly
    for (bad <- Seq(() => StreamingMoments.resume(d + 1, path, spark),
        () => StreamingMoments.resume(d, path, spark, scale = 1000L))) {
      val e = intercept[IllegalArgumentException](bad())
      assert(e.getMessage.contains("shape") || e.getMessage.contains("scale"),
        e.getMessage)
    }
  }

  test("null vector or element raises the contract message, not an encoder NPE") {
    val nullVec = Seq((1L, null: Array[java.lang.Float]),
      (2L, Array[java.lang.Float](1.0f, 1.0f, 1.0f, 1.0f, 1.0f)))
      .toDF("id", "embedding")
    val e1 = intercept[Exception](
      Covariance.moments(nullVec, "embedding", d).collect())
    assert(e1.toString.contains("NULL") ||
      Option(e1.getCause).exists(_.toString.contains("NULL")))
    val nullElem = Seq(Tuple1(Array[java.lang.Float](1.0f, null, 1.0f, 1.0f, 1.0f)))
      .toDF("embedding")
    val e2 = intercept[Exception](
      Covariance.moments(nullElem, "embedding", d).collect())
    assert(e2.toString.contains("NULL") ||
      Option(e2.getCause).exists(_.toString.contains("NULL")))
  }
}
