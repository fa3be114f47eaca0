package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Scale-safety of the LSH-based dedup operators on dup-HEAVY data: a
  * web corpus routinely carries clusters of 10⁴⁺ identical boilerplate
  * docs, and identical docs collide in EVERY band — without the
  * exact-identity collapse one such cluster alone yields B²/2 ≈ 5×10⁷
  * candidate pairs from a single bucket. These specs prove (a) the
  * collapse makes candidate work linear in DISTINCT content while the
  * verified output stays exactly the all-pairs ground truth, and (b)
  * the residual bucket cap bounds near-identical (not byte-identical)
  * hot buckets while keeping clusters connected.
  */
class HotBucketSpec extends SparkSpec {
  import spark.implicits._

  private val clusterSize = 10000

  private def hotDocs = {
    val boiler = (1L to clusterSize.toLong)
      .map(i => (i, "standard cookie consent boilerplate text repeated verbatim across the whole crawl"))
    val distinct = Seq(
      (90001L, "entirely unrelated discussion of spark shuffle partitioning internals"),
      (90002L, "a second unique document about catalyst optimizer rules and codegen"),
      (90003L, "third unique row mentioning parquet column pruning and predicate pushdown"))
    spark.createDataFrame(boiler ++ distinct).toDF("doc_id", "text")
  }

  test("identical-doc cluster: candidate stage is linear, not quadratic") {
    val docs = hotDocs
    // the collapse feeds ONE representative per distinct text into LSH
    val members = Dedup.exactMembership(docs, "doc_id", "text")
    val repDocs = docs.join(
      members.filter(col("doc_id") === col("rep_id")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    assert(repDocs.count() == 4) // 1 boilerplate rep + 3 unique docs
    val sh = Dedup.shingleHashes(repDocs, "doc_id", "text")
    val cands = Dedup.lshCandidates(
      Dedup.minhashFromShingles(sh, "doc_id"), "doc_id", bands = 32, rowsPerBand = 2)
    // candidate pairs bounded by distinct-content collisions — nowhere
    // near the 5×10⁷ the uncollapsed bucket join would produce
    assert(cands.count() <= 6)
  }

  test("identical-doc cluster: verified output is still the exact all-pairs truth") {
    val out = Dedup.verifiedDupPairs(hotDocs, "doc_id", "text", threshold = 0.8)
    // every pair inside the identical cluster, nothing else
    val expected = clusterSize.toLong * (clusterSize - 1) / 2
    assert(out.count() == expected)
    val one = out.filter(col("id_a") === 1L && col("id_b") === 2L).collect()
    assert(one.length == 1)
    assert(one(0).getAs[Double]("jaccard") == 1.0)
    assert(one(0).getAs[Long]("n_inter") == one(0).getAs[Long]("n_a"))
  }

  test("verifiedDupEdges: clustering edge set is linear in cluster size") {
    // the exhaustive pair LIST is quadratic by definition; the edge set
    // clustering consumes must not be — star edges + rep pairs
    val edges = Dedup.verifiedDupEdges(hotDocs, "doc_id", "text", threshold = 0.8)
    assert(edges.count() == clusterSize - 1) // B−1 star edges, no cross reps
    val clustered = Dedup.dupClusters(hotDocs, "doc_id", edges)
    assert(clustered.filter(col("cluster_id") === 1L).count() == clusterSize)
    assert(clustered.filter(!col("is_dup")).count() == 4) // 1 rep + 3 uniques
  }

  test("bucket cap bounds near-identical (non-collapsible) hot buckets") {
    // 200 docs sharing a long template, each with a unique tail token:
    // md5-distinct (no collapse), pairwise J high → all land in shared
    // band buckets
    val template = "shared page template header navigation footer copyright " +
      "terms privacy contact about products services blog careers " * 3
    val near = (1L to 200L).map(i => (i, s"$template unique$i")).toDF("doc_id", "text")
    val sh = Dedup.shingleHashes(near, "doc_id", "text")
    val sigs = Dedup.minhashFromShingles(sh, "doc_id")
    val uncapped = Dedup.lshCandidates(sigs, "doc_id", bands = 32, rowsPerBand = 2)
    val capped = Dedup.lshCandidates(sigs, "doc_id", bands = 32, rowsPerBand = 2,
      maxBucketSize = 8)
    val uncappedN = uncapped.count()
    val cappedN = capped.count()
    assert(uncappedN == 200L * 199 / 2) // near-identical: all pairs collide
    // anchor join: per (band, bucket) each member pairs with ≤ cap
    // anchors, so candidates are ≤ n × cap × bands — LINEAR in n (the
    // uncapped join is n²/2 per hot bucket). Anchor sets overlap across
    // bands in practice, so the observed count sits far below the bound.
    assert(cappedN <= 200L * 8 * 32)
    assert(cappedN < uncappedN / 4)
    // the capped pair graph still connects the whole cluster: every doc
    // pairs with shared anchors, so dedup clustering loses no member
    val clustered = Dedup.dupClusters(near, "doc_id", capped)
    assert(clustered.filter(col("cluster_id") === 1L).count() == 200)
  }

  test("capped verifiedDupPairs keeps oracle behavior when the cap is slack") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox leaps over the lazy dog"),
      (4L, "completely different content about spark engines and shuffles")
    ).toDF("doc_id", "text")
    val strict = Dedup.verifiedDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b", "jaccard").collect().map(_.toSeq).toSet
    val capped = Dedup.verifiedDupPairs(docs, "doc_id", "text", threshold = 0.5,
        maxBucketSize = 64)
      .select("id_a", "id_b", "jaccard").collect().map(_.toSeq).toSet
    assert(strict == capped)
  }

  test("embeddingNearDups: identical-vector cluster is linear in candidates, exact in output") {
    val vec = Array.tabulate(8)(i => 0.1f * (i + 1))
    val other = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val rows = (1L to 1000L).map(i => (i, vec)) :+ (2000L, other)
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.embeddingNearDups(df, "vec_id", "embedding",
      nPlanes = 4, nTables = 4, threshold = 0.9)
    assert(out.count() == 1000L * 999 / 2)
    val p = out.filter(col("id_a") === 1L && col("id_b") === 2L).collect()
    assert(p.length == 1 && p(0).getAs[Double]("cos_sim") > 0.999)
  }

  test("knnJoinWithinGroups: hot group takes the bounded LSH path, small groups stay exact") {
    val rnd = new scala.util.Random(7)
    def randVec() = Array.fill(8)(rnd.nextFloat() * 2 - 1)
    val hot = (1L to 400L).map(i => (i, "hot", randVec()))
    val cold = (1001L to 1010L).map(i => (i, "cold", randVec()))
    val df = (hot ++ cold).toDF("vec_id", "label", "embedding")
    val bounded = Similarity.knnJoinWithinGroups(df, "vec_id", "embedding", "label",
      k = 3, maxGroupSize = 32)
    // small group: identical to the exact dense result
    val exactCold = Similarity.knnJoinWithinGroups(
        df.filter(col("label") === "cold"), "vec_id", "embedding", "label", k = 3)
      .collect().map(_.toSeq).toSet
    val boundedCold = bounded.filter(col("label") === "cold")
      .collect().map(_.toSeq).toSet
    assert(boundedCold == exactCold)
    // hot group: every member still gets k (approximate) neighbors with
    // valid ranks — the candidate stage was bounded, not the output
    val hotOut = bounded.filter(col("label") === "hot")
    assert(hotOut.select("id_a").distinct().count() == 400)
    assert(hotOut.groupBy("id_a").count().filter(col("count") =!= 3).count() == 0)
  }
}
