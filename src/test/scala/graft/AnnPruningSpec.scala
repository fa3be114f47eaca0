package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** The driver's synthetic embeddings are isotropic, so the ANN query
  * configs there probe exhaustively (documented in LlmQueries). This
  * spec is the other half of the story: on a CLUSTERED corpus — the
  * shape real embedding spaces have — the same operators prune hard
  * and still recover the exact neighbors.
  *
  * The corpus is deterministic: 16 well-separated cluster directions
  * in R^8 (orthogonal-ish axes ± small rotations), 50 members each,
  * members = direction + bounded perturbation, so within-cluster
  * cosine ≫ cross-cluster cosine by construction.
  */
class AnnPruningSpec extends SparkSpec {
  import spark.implicits._

  // deterministic unit-ish direction per cluster: two hot axes
  private def direction(c: Int): Array[Float] = {
    val v = Array.fill(8)(0.05f)
    v(c % 8) = 1.0f
    v((c / 8) % 8) += 0.5f
    v
  }

  private def member(c: Int, i: Int): Array[Float] = {
    val base = direction(c)
    // bounded deterministic perturbation keeps members near the center
    Array.tabulate(8)(j => base(j) + 0.02f * (((c * 131 + i * 31 + j * 7) % 11) - 5))
  }

  private lazy val corpus = (0 until 16).flatMap { c =>
    (0 until 50).map(i => (c.toLong * 1000 + i, member(c, i)))
  }.toDF("vec_id", "embedding")

  private lazy val queries = (0 until 16).map { c =>
    (c.toLong * 1000 + 999, member(c, 77))
  }.toDF("vec_id", "embedding")

  test("IVF with nProbe << nCells recovers exact top-3 on clustered data") {
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 3)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    // probe 2 of 16 cells: 8x fewer candidates scored than exhaustive
    val ivf = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding",
        nCells = 16, nProbe = 2, k = 3)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2.toInt, t._3)).toSet
    assert(ivf == exact)
  }

  test("deep-table LSH (the dup-grade regime) recovers exact top-1") {
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // nPlanes=6 -> 64 buckets per table: each table prunes most of the
    // corpus; 8 tables multiply recall back to 1 on clustered data
    val lsh = Similarity.lshTopK(corpus, queries, "vec_id", "embedding",
        nPlanes = 6, nTables = 8, k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
  }

  test("clustered recall@6 curve: rises with nProbe, prunes at every point") {
    // ann_recall_audit's oracle corpus is isotropic, so its top curve
    // point (nProbe = nCells) is exhaustive by construction. This is
    // the non-degenerate half: BETWEEN-cluster queries (true neighbors
    // split across two clusters) on the clustered corpus, so low
    // nProbe finds one side only, recall RISES with nProbe, and every
    // sweep point scores strictly fewer candidates than brute force.
    graft.functions.GraftFunctions.register(spark)
    val between = (0 until 16).map { c =>
      val a = direction(c); val b = direction((c + 1) % 16)
      (c.toLong * 1000 + 999, Array.tabulate(8)(j => a(j) + b(j)))
    }.toDF("vec_id", "embedding")
    val k = 6
    val exact = Similarity.bruteForceTopK(corpus, between, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

    // the REAL centroid rule (hash-smallest 16 corpus ids), reproduced
    // to measure per-query candidate volume = occupancy of probed cells
    val cents = corpus.select(col("vec_id").as("cell"), col("embedding").as("centroid"))
      .orderBy(xxhash64(col("cell")), col("cell")).limit(16)
    val assigned = corpus.crossJoin(broadcast(cents))
      .withColumn("sim", call_function("graft_cosine", col("embedding"), col("centroid")))
      .withColumn("r", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("sim").desc, col("cell"))))
      .filter(col("r") === 1)
    val occupancy = assigned.groupBy("cell").count()
      .as[(Long, Long)].collect().toMap
    val nCorpus = corpus.count()

    val sweep = Seq(1, 2, 4, 8).map { p =>
      val got = Similarity.ivfTopK(corpus, between, "vec_id", "embedding",
          nCells = 16, nProbe = p, k = k)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val recall = (got intersect exact).size.toDouble / exact.size
      // candidates scored at this nProbe: per query, the occupancy sum
      // of its top-p cells by centroid similarity
      val probed = between.crossJoin(broadcast(cents))
        .withColumn("sim", call_function("graft_cosine", col("embedding"), col("centroid")))
        .withColumn("r", row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(col("sim").desc, col("cell"))))
        .filter(col("r") <= p)
        .select("vec_id", "cell").as[(Long, Long)].collect()
      val candPerQuery = probed.groupBy(_._1).map { case (_, cs) =>
        cs.map(c => occupancy.getOrElse(c._2, 0L)).sum }
      assert(candPerQuery.forall(_ < nCorpus),
        s"nProbe=$p: some query scored the whole corpus — no pruning")
      recall
    }
    // monotone nondecreasing, genuinely partial at the bottom, and the
    // curve actually moves (pruning-with-structure, not a flat line)
    assert(sweep.zip(sweep.tail).forall { case (a, b) => a <= b },
      s"recall curve not monotone: $sweep")
    assert(sweep.head < 1.0, s"nProbe=1 already exhaustive-recall: $sweep")
    assert(sweep.last > sweep.head, s"recall curve flat: $sweep")
    assert(sweep.last >= 0.9, s"nProbe=8 recall too low on clustered data: $sweep")
  }

  test("LSH buckets actually prune: cluster-mates collide, strangers spread") {
    graft.functions.GraftFunctions.register(spark)
    val b = corpus.select(col("vec_id"),
        Similarity.lshTableBuckets(col("embedding"), 1, 6)(0).as("bucket"))
      .as[(Long, Long)].collect().toMap
    // distinct buckets across the corpus: far more than 1 (no collapse)
    assert(b.values.toSet.size > 8)
    // members of one cluster overwhelmingly share their center's bucket
    val c0 = (0 until 50).map(i => b(0L * 1000 + i))
    assert(c0.groupBy(identity).values.map(_.size).max > 40)
  }
}
