package graft

import graft.ops.{Layout, Sketches}
import org.apache.spark.sql.functions._

/** Units for the layout/sketch ops the oracle gate exercises e2e:
  * the MERGE property that justifies KMV at scale, and the z-order
  * key's bijectivity + locality (the reasons the ops exist, neither
  * visible in a single-scope value compare).
  */
class SketchLayoutSpec extends SparkSpec {

  test("KMV: sketch of a union == combined per-part sketches (mergeability)") {
    import spark.implicits._
    val k = 16
    // two overlapping parts with deterministic pseudo-random values
    val partA = (0 until 400).map(i => s"val_${i * 7 % 500}")
    val partB = (0 until 400).map(i => s"val_${i * 13 % 500 + 300}")
    def hashes(vs: Seq[String], scope: String) =
      vs.toDF("v").select(lit(scope).as("scope"),
        Sketches.uniformHash(col("v")).as("h"))
    // the union's sketch, computed directly
    val direct = Sketches.kmvEstimates(
      hashes(partA ++ partB, "u"), k).collect()(0)
    // per-part sketches (k smallest each), merged: k smallest of the
    // concatenation — the associative combine a distributed agg runs
    def sketchOf(vs: Seq[String]): Seq[Long] =
      hashes(vs, "s").select("h").distinct()
        .orderBy("h").limit(k).as[Long].collect().toSeq
    val merged = (sketchOf(partA) ++ sketchOf(partB))
      .distinct.sorted.take(k)
    val kth = merged.max
    assert(direct.getAs[Long]("kth_hash") === kth,
      "merged k-th minimum must equal the union sketch's k-th minimum")
    // and the estimate is the same single expression of that k-th min
    val est = (k - 1).toDouble * (Sketches.HashSpace.toDouble / kth.toDouble)
    assert(direct.getAs[Double]("est") === est)
  }

  test("KMV rides the map-side bottom-k: no window below the heap pass") {
    import spark.implicits._
    // r13 verdict item 5: the KMV rank used to be a per-scope window
    // over the whole distinct-hash frame — one giant scope = one
    // task's sort. Ported onto bottomKSample, the only Window left
    // must rank the heap SURVIVORS: its subtree contains the
    // mapPartitions serialization barrier (SerializeFromObject), so
    // no window (and no sort) ever sees the corpus-sized frame.
    val scoped = (0 until 500).map(i => s"v$i").toDF("v")
      .select(lit("s").as("scope"), Sketches.uniformHash(col("v")).as("h"))
    val plan = Sketches.kmvEstimates(scoped, 16).queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.size == 1, s"expected exactly one Window, got ${windows.size}")
    assert(windows.head.collect {
      case n if n.getClass.getSimpleName.contains("SerializeFromObject") => n
    }.nonEmpty, "the rank window no longer sits above the map-side heap pass")
  }

  test("KMV: below-k scopes fall back to the exact count") {
    import spark.implicits._
    val few = Seq("a", "b", "c").toDF("v")
      .select(lit("tiny").as("scope"), Sketches.uniformHash(col("v")).as("h"))
    val row = Sketches.kmvEstimates(few, k = 16).collect()(0)
    assert(row.getAs[Long]("n_exact") === 3L)
    assert(row.getAs[Double]("est") === 3.0)
    assert(row.getAs[Double]("rel_err") === 0.0)
  }

  test("z-order key is a bijection on the 8-bit grid") {
    import spark.implicits._
    val grid = spark.range(256 * 256)
      .select((col("id") / 256).cast("long").as("a"),
        (col("id") % 256).as("b"))
      .withColumn("z", Layout.zOrderKey(col("a"), col("b"), bits = 8))
    val stats = grid.agg(
      countDistinct("z").as("nz"),
      min("z").as("lo"), max("z").as("hi")).collect()(0)
    // 65536 distinct keys exactly covering [0, 2^16): interleave loses
    // nothing and packs densely — ranges of z are rectangles in (a,b)
    assert(stats.getAs[Long]("nz") === 65536L)
    assert(stats.getAs[Long]("lo") === 0L)
    assert(stats.getAs[Long]("hi") === 65535L)
  }

  test("z-order buckets bound BOTH dims; a 1-d sort leaves the other unbounded") {
    import spark.implicits._
    val grid = spark.range(256 * 256)
      .select((col("id") / 256).cast("long").as("a"),
        (col("id") % 256).as("b"))
      .withColumn("z", Layout.zOrderKey(col("a"), col("b"), bits = 8))
    // 64 equal z-ranges over the full grid: each is a 32×32 rectangle
    val spans = grid.withColumn("bucket", expr("z div 1024"))
      .groupBy("bucket")
      .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
      .agg(max("sa").as("msa"), max("sb").as("msb")).collect()(0)
    assert(spans.getAs[Long]("msa") <= 31L, "z-bucket must bound dim a")
    assert(spans.getAs[Long]("msb") <= 31L, "z-bucket must bound dim b")
    // the same-size buckets of an a-sorted layout bound a but leave b
    // at full span — the scan-pruning asymmetry z-order removes
    val sorted1d = grid.withColumn("bucket", expr("a div 4")) // 64 buckets
      .groupBy("bucket")
      .agg((max("b") - min("b")).as("sb"))
      .agg(max("sb").as("msb")).collect()(0)
    assert(sorted1d.getAs[Long]("msb") === 255L)
  }
}
