package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set
  * against the corpus, dot products via zip_with/aggregate (codegen'd
  * higher-order functions, no UDFs).
  *
  * Scale path: random-hyperplane LSH — bucket vectors by sign bits
  * against deterministic pseudo-random hyperplanes, then search only
  * within buckets. At 100 TB the broadcast-everything brute force dies;
  * the bucket join shuffles each vector once to its bucket.
  */
object Similarity {

  /** Elementwise double-precision dot product of two float-array cols. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))


  /** Brute-force top-k: every (query, corpus) cosine, then a per-query
    * window top-k. The query side must be small — it is broadcast, so
    * the corpus is scanned exactly once with no shuffle of the vectors.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .crossJoin(q)
      .withColumn("cos_sim", call_function("graft_cosine", col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos_sim")
  }

  /** Deterministic pseudo-random hyperplane component h(p, j) ∈ (-1, 1):
    * a hash of (plane, dim) scaled — no RNG, stable under repartition.
    */
  private def planeComponent(plane: Int, j: Column): Column =
    (pmod(xxhash64(lit(plane), j), lit(2000001L)).cast("double") - 1000000.0) / 1000000.0

  /** Sign-bit LSH bucket id from `nPlanes` hyperplanes. */
  def lshBucket(vec: Column, nPlanes: Int): Column = {
    val dims = sequence(lit(0), size(vec) - 1)
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, dims, (x, j) => x.cast("double") * planeComponent(p, j)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: queries join only their own bucket's corpus
    * vectors (plus stats so recall is observable). Returns per-query
    * top-k within the bucket.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, nPlanes: Int, k: Int): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val cb = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), nPlanes).as("bucket"))
    val qb = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), nPlanes).as("bucket")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    cb.join(qb, "bucket")
      .withColumn("cos_sim", call_function("graft_cosine", col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "bucket", "rank", "neighbor_id", "cos_sim")
  }

  /** IVF-style ANN with a BOUNDED coarse quantizer: the `nCells`
    * hash-smallest corpus vectors are the centroids — a deterministic
    * sample (no RNG, stable across partitioning) whose size is fixed
    * regardless of corpus size. An unbounded centroid set (e.g. every
    * stride-th vector) makes assignment O(n²/stride) work and an
    * ever-growing broadcast at 100×; here assignment is a linear
    * n × nCells scan against a constant-size broadcast. Each corpus
    * vector lands in its nearest cell (the inverted file, one shuffle
    * on cell id); a query probes only its `nProbe` nearest cells.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, nCells: Int, nProbe: Int, k: Int): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    // TakeOrdered: each partition contributes its local hash-smallest
    // nCells rows, the driver merges — never a global sort.
    val cents = broadcast(
      corpus.select(col(idCol).as("cell"), col(vecCol).as("centroid"))
        .orderBy(xxhash64(col("cell")), col("cell")).limit(nCells))
    def nearestCells(df: DataFrame, n: Int, outPrefix: String): DataFrame = {
      val w = Window.partitionBy(outPrefix + "_id")
        .orderBy(col("cent_sim").desc, col("cell"))
      df.select(col(idCol).as(outPrefix + "_id"), col(vecCol).as(outPrefix + "_v"))
        .crossJoin(cents)
        .withColumn("cent_sim", call_function("graft_cosine", col(outPrefix + "_v"), col("centroid")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= n)
        .drop("centroid", "cent_sim", "crank")
    }
    val assigned = nearestCells(corpus, 1, "c")   // inverted file: 1 cell per vector
    val probes = nearestCells(queries, nProbe, "q")
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("c_id"))
    probes.join(assigned, "cell")
      .withColumn("cos_sim", call_function("graft_cosine", col("q_v"), col("c_v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id").as("query_id"), col("rank"),
        col("c_id").as("neighbor_id"), col("cos_sim"))
  }

  /** Embedding-cosine near-duplicate detection: LSH-bucket the vectors,
    * compare only within buckets (never O(n²)), flag pairs above the
    * cosine threshold. Returns a per-vector summary (bucket, mates,
    * near-dup count, best similarity) — the per-document dedup verdict a
    * training pipeline consumes.
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      nPlanes: Int, threshold: Double): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val b = df.select(col(idCol).as("vid"), col(vecCol).as("v"),
      lshBucket(col(vecCol), nPlanes).as("bucket"))
    val pairs = b.select(col("bucket"), col("vid").as("id_a"), col("v").as("va"))
      .join(b.select(col("bucket"), col("vid").as("id_b"), col("v").as("vb")), "bucket")
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("cos_sim", call_function("graft_cosine", col("va"), col("vb")))
    val stats = pairs.groupBy(col("id_a").as("vid"))
      .agg(
        count(lit(1)).as("n_bucket_mates"),
        sum(when(col("cos_sim") >= threshold, 1L).otherwise(0L)).as("n_near_dups"),
        max(col("cos_sim")).as("max_sim"))
    b.select(col("vid"), col("bucket"))
      .join(stats, Seq("vid"), "left")
      .na.fill(0L, Seq("n_bucket_mates", "n_near_dups"))
  }

  /** k-NN join within groups (e.g. per label): for every vector, its k
    * nearest same-group neighbors. The group key bounds the join — at
    * scale each group co-locates via one shuffle on the key.
    */
  def knnJoinWithinGroups(df: DataFrame, idCol: String, vecCol: String,
      groupCol: String, k: Int): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val a = df.select(col(groupCol).as("g"), col(idCol).as("id_a"),
      col(vecCol).as("va"))
    val b = df.select(col(groupCol).as("g"), col(idCol).as("id_b"),
      col(vecCol).as("vb"))
    val w = Window.partitionBy("id_a").orderBy(col("cos_sim").desc, col("id_b"))
    a.join(b, "g")
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("cos_sim", call_function("graft_cosine", col("va"), col("vb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("g").as("label"), col("id_a"), col("rank"), col("id_b"), col("cos_sim"))
  }
}
