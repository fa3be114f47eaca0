package graft

import graft.ops.{Covariance, Pca}
import org.apache.spark.sql.functions._

/** The integer-exact PCA derivation: components align with the known
  * principal axes of a structured corpus, orthogonality holds BY
  * CONSTRUCTION (the per-step integer Gram–Schmidt), the codegen'd
  * projection equals a driver recompute bit-for-bit, and degenerate
  * corpora raise the contract message.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val d = 8

  /** Structured corpus: dim 0 carries ~4× the variance of dim 1 and
    * ~400× the noise dims, so the true top-2 principal axes are
    * (near-)e0 and e1 — checkable without a float eigensolver.
    */
  private def fixture(n: Int): Seq[Array[Float]] =
    (0 until n).map { r =>
      val rnd = new scala.util.Random(r * 7919L + 17)
      val a = rnd.nextDouble() * 2 - 1
      val b = (rnd.nextDouble() * 2 - 1) * 0.5
      Array.tabulate(d)(i =>
        (if (i == 0) a
         else if (i == 1) b
         else (rnd.nextDouble() * 2 - 1) * 0.05).toFloat)
    }

  private def cos(a: Array[Long], b: Array[Long]): Double = {
    val dot = (0 until d).map(i => a(i).toDouble * b(i)).sum
    dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
      math.sqrt(b.map(x => x.toDouble * x).sum))
  }

  test("components align with the known axes; orthogonal by construction") {
    val df = fixture(400).map(Tuple1(_)).toDF("embedding")
    val mom = Covariance.moments(df, "embedding", d).collect()
    val comps = Pca.topComponents(mom, d, k = 2)
    val e0 = Array.tabulate(d)(i => if (i == 0) Pca.Scale else 0L)
    val e1 = Array.tabulate(d)(i => if (i == 1) Pca.Scale else 0L)
    assert(math.abs(cos(comps(0), e0)) > 0.95,
      s"v1 not aligned with the dominant axis: ${comps(0).toSeq}")
    assert(math.abs(cos(comps(1), e1)) > 0.95,
      s"v2 not aligned with the second axis: ${comps(1).toSeq}")
    assert(math.abs(cos(comps(0), comps(1))) < 0.05,
      "components not orthogonal")
    // captured variance ordering via the exact scatter: v1's Rayleigh
    // quotient must dominate v2's (both >> a noise axis)
    val s = Pca.scatter(mom, d)
    def ray(v: Array[Long]): Double = {
      val num = (for (i <- 0 until d; j <- 0 until d)
        yield BigDecimal(s(i)(j)) * v(i) * v(j)).sum
      val den = v.map(x => BigDecimal(x) * x).sum
      (num / den).toDouble
    }
    val noise = Array.tabulate(d)(i => if (i == d - 1) Pca.Scale else 0L)
    assert(ray(comps(0)) > ray(comps(1)))
    assert(ray(comps(1)) > 10 * ray(noise))
  }

  test("codegen'd projection == driver recompute, bit-for-bit") {
    val rows = fixture(120)
    val df = rows.map(Tuple1(_)).toDF("embedding")
    val mom = Covariance.moments(df, "embedding", d).collect()
    val comps = Pca.topComponents(mom, d, k = 2)
    val q = Covariance.quantized("embedding")
    val got = df
      .withColumn("p1", Pca.project(q, comps(0)))
      .withColumn("p2", Pca.project(q, comps(1)))
      .select("p1", "p2").as[(Long, Long)].collect()
    // driver twin of round(x·10⁴): HALF_UP away from zero, like
    // Spark's ROUND (and DuckDB's)
    def quant(x: Float): Long =
      BigDecimal(x.toDouble * 10000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    rows.zip(got).foreach { case (emb, (p1, p2)) =>
      val qv = emb.map(quant)
      assert(p1 == (0 until d).map(i => qv(i) * comps(0)(i)).sum)
      assert(p2 == (0 until d).map(i => qv(i) * comps(1)(i)).sum)
    }
  }

  test("constant corpus raises the no-direction contract, not garbage") {
    val df = Seq.fill(50)(Tuple1(Array.fill(d)(0.25f))).toDF("embedding")
    val mom = Covariance.moments(df, "embedding", d).collect()
    val e = intercept[IllegalArgumentException](
      Pca.topComponents(mom, d, k = 1))
    assert(e.getMessage.contains("no principal direction"))
  }
}
