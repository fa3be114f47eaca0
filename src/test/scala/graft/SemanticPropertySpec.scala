package graft

import graft.ops.Similarity
import scala.util.Random

/** Property check for [[Similarity.semanticDedup]]: on seeded random
  * vector corpora (identical groups, perturbed near-dups, unrelated
  * noise) the distributed pipeline must emit EXACTLY what a naive
  * in-memory reimplementation of the SemDeDup recipe produces —
  * quantization, seeded k-means with portable floor-division updates,
  * within-cell quantized cosine, min-label components, and the
  * farthest-from-centroid keep rule, step for step. Catches any drift
  * between the Spark expressions and the documented semantics that a
  * single fixture oracle might not exercise.
  */
class SemanticPropertySpec extends SparkSpec {
  import spark.implicits._

  private def naiveSemantic(rows: Seq[(Long, Array[Float])], k: Int,
      iterations: Int, qs: Long, thr: Double)
      : Map[Long, (Long, Long, Long, Long, Boolean)] = {
    def quant(v: Array[Float]): Array[Long] =
      v.map(x => BigDecimal(x.toDouble * qs)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    val q = rows.map { case (id, v) => (id, quant(v)) }.sortBy(_._1)
    val qm = q.toMap
    val ids = q.map(_._1)
    var cents: Seq[(Long, Array[Long])] =
      q.take(k).zipWithIndex.map { case ((_, qv), i) => (i.toLong, qv) }
    def assign(): Map[Long, (Long, Long)] = q.map { case (id, qv) =>
      val (d2, c) = cents.map { case (c, cv) =>
        (qv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }.min
      id -> (c, d2)
    }.toMap
    for (_ <- 1 until iterations) {
      val a = assign()
      cents = q.groupBy(p => a(p._1)._1).toSeq.sortBy(_._1).map {
        case (c, members) =>
          val n = members.size.toLong
          (c, members.head._2.indices
            .map(d => Math.floorDiv(members.map(_._2(d)).sum, n)).toArray)
      }
    }
    val fin = assign()
    val n2 = q.map { case (id, qv) => id -> qv.map(x => x * x).sum }.toMap
    val edges = for {
      a <- ids; b <- ids
      if a < b && fin(a)._1 == fin(b)._1
      dot = qm(a).zip(qm(b)).map { case (x, y) => x * y }.sum
      cos = dot.toDouble / (math.sqrt(n2(a).toDouble) * math.sqrt(n2(b).toDouble))
      if cos >= thr
    } yield (a, b)
    val label = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    var changed = true
    while (changed) {
      changed = false
      for ((a, b) <- edges) {
        val m = math.min(label(a), label(b))
        if (label(a) != m) { label(a) = m; changed = true }
        if (label(b) != m) { label(b) = m; changed = true }
      }
      for (i <- ids) {
        val l = label(label(i))
        if (l != label(i)) { label(i) = l; changed = true }
      }
    }
    val groups = ids.groupBy(label)
    ids.map { id =>
      val g = label(id)
      val mem = groups(g)
      val keeper = mem.map(i => (-fin(i)._2, i)).min._2 // max dist2, tie min id
      id -> (fin(id)._1, fin(id)._2, g, mem.size.toLong, id == keeper)
    }.toMap
  }

  test("semanticDedup == naive SemDeDup reimplementation on random corpora") {
    for (seed <- Seq(3, 11, 29)) {
      val rnd = new Random(seed)
      def vec() = Array.fill(8)(rnd.nextFloat() * 2 - 1)
      val bases = Seq.fill(4)(vec())
      val rows: Seq[(Long, Array[Float])] = (1L to 28L).map { i =>
        rnd.nextInt(4) match {
          case 0 => (i, bases(rnd.nextInt(bases.length))) // identical member
          case 1 => // tight perturbation: a near-dup inside the same cell
            val b = bases(rnd.nextInt(bases.length))
            (i, b.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f))
          case _ => (i, vec()) // unrelated noise
        }
      }
      val want = naiveSemantic(rows, k = 4, iterations = 2, qs = 1000L, thr = 0.7)
      val got = Similarity.semanticDedup(rows.toDF("vec_id", "embedding"),
          "vec_id", "embedding", k = 4, iterations = 2, threshold = 0.7)
        .collect().map { r =>
          r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getBoolean(5))
        }.toMap
      assert(got == want, s"seed $seed: pipeline diverged from naive SemDeDup")
      // non-degenerate: the corpus must actually contain dup groups
      assert(want.values.exists(v => v._4 > 1), s"seed $seed: no dup groups")
      assert(want.values.exists(v => !v._5), s"seed $seed: nothing pruned")
    }
  }

  test("two-level assignment ≡ flat on separated clusters (k = 32)") {
    // the k∝n scale path: route through √k coarse anchors, then score
    // only the anchor's fine centroids — on cluster-structured data
    // (the only regime SemDeDup's k∝n contract targets) a vector and
    // its nearest centroid make the same anchor choice, so the whole
    // pipeline output (cells, dist2, groups, keepers) is IDENTICAL to
    // flat n·k assignment while the assignment stage does ~2·n·√k work
    def direction(c: Int): Array[Float] = {
      val v = Array.fill(8)(0.02f * ((c * 37) % 5))
      v(c % 8) = 3.0f
      v((c / 8) % 8) += 1.5f
      v
    }
    // 32 clusters × 10 members; ids INTERLEAVE clusters so the 32
    // lowest-id k-means seeds land one per cluster
    val rows: Seq[(Long, Array[Float])] =
      for (i <- 0 until 10; c <- 0 until 32) yield
        (i.toLong * 100 + c, direction(c).zipWithIndex.map { case (x, j) =>
          x + 0.01f * (((c * 131 + i * 31 + j * 7) % 11) - 5) })
    val df = rows.toDF("vec_id", "embedding")
    def run(two: Boolean) =
      Similarity.semanticDedup(df, "vec_id", "embedding",
          k = 32, iterations = 2, threshold = 0.7, twoLevel = two)
        .collect().map { r =>
          r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getBoolean(5))
        }.toMap
    val flat = run(two = false)
    val twoLevel = run(two = true)
    assert(twoLevel == flat, "two-level must reproduce flat exactly here")
    assert(flat.values.exists(v => v._4 > 1), "no dup groups — fixture degenerate")
    assert(flat.values.exists(v => !v._5), "nothing pruned — fixture degenerate")
  }

  test("two-level assignment never drops rows (adversarial non-clustered data)") {
    // the silent row-loss regime: after the Lloyd refinement of the
    // coarse anchors, an anchor can win some vectors' routing while
    // owning ZERO fine centroids — pre-fix, those vectors vanished
    // through the inner join on the anchor id. Uniform noise (no
    // cluster structure) plus a dominant clump makes anchor cells
    // maximally uneven; on every seed the output must be a PERMUTATION
    // of the input ids, not a subset.
    val rnd = new scala.util.Random(12L)
    for (seed <- 1 to 3) {
      val n = 220 + seed * 40
      val rows: Seq[(Long, Array[Float])] = (0 until n).map { i =>
        val v =
          if (i % 3 == 0) Array.fill(6)(rnd.nextFloat() * 4f - 2f)
          else Array.tabulate(6)(j => 1.5f + 0.05f * rnd.nextFloat() + 0.01f * j)
        (i.toLong, v)
      }
      val df = rows.toDF("vec_id", "embedding")
      val out = Similarity.semanticDedup(df, "vec_id", "embedding",
          k = 36, iterations = 2, threshold = 0.9, twoLevel = true)
        .select("vec_id").as[Long].collect().sorted.toSeq
      assert(out == (0L until n.toLong),
        s"seed $seed: two-level assignment lost ${n - out.size} rows")
    }
  }
}
