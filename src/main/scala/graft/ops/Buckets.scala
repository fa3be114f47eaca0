package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared hot-bucket bounding for LSH candidate joins. */
object Buckets {

  /** The cap's hash-smallest members of every bucket — the ANCHOR side
    * of a capped candidate join. Pairing bucket members against
    * anchors instead of the whole bucket bounds per-bucket candidates
    * at occupancy × cap (linear), while a bucket at or under the cap
    * keeps its full membership (the join degenerates to the uncapped
    * one). The order is a seeded hash of the id: deterministic across
    * runs and partitionings, uncorrelated with id assignment. The
    * window sorts only within one bucket — n log n in occupancy,
    * strictly cheaper than the n² join it caps.
    */
  def anchors(banded: DataFrame, bucketCols: Seq[String], idCol: String,
      cap: Int): DataFrame = {
    val w = Window.partitionBy(bucketCols.map(col): _*)
      .orderBy(xxhash64(col(idCol), lit(7)), col(idCol))
    banded.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= cap)
      .drop("__r")
  }

  /** Exact `ntile(n)` over the total order (orderCol, tieCol) WITHOUT a
    * global sort — the 100 TB drop-in for curriculum bucketing.
    *
    * The corpus is never globally ordered. One bounded shuffle builds
    * the orderCol histogram (distinct-value-sized — a control frame);
    * cumulative offsets + the total run in a single-partition window
    * over THAT frame only. Each histogram row then knows the global
    * rank range [off+1, off+cnt] of its tie group, hence the bucket of
    * its first and last member; the frame broadcast-joins back to the
    * corpus. Rows whose group lies inside one bucket (everything except
    * at most n-1 boundary groups) get their bucket from the broadcast
    * alone — a per-row CASE, zero extra shuffle. Only the boundary
    * groups rank within the group by tieCol (a window partitioned by
    * orderCol — sorts those groups alone, never the corpus) so ties
    * split across the boundary EXACTLY as ntile's (orderCol, tieCol)
    * order does. Worst case is a boundary landing inside one massive
    * tie group: still one group's sort, parallel across the n-1
    * boundaries, vs ntile's sort of everything.
    *
    * Rank arithmetic uses floor() on doubles — exact below 2^53 rows.
    */
  def ntileByHistogram(df: DataFrame, orderCol: String, tieCol: String,
      n: Int): DataFrame = {
    val histW = Window.orderBy(col(orderCol))
    val hist = df.groupBy(col(orderCol)).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(histW.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(
        histW.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))

    // ntile semantics: N rows over n buckets = (N mod n) buckets of
    // floor(N/n)+1 rows, then buckets of floor(N/n) rows
    def bucketOf(rank: Column): Column = {
      val size = floor(col("__n") / n).cast("long")
      val rem = col("__n") % n
      val cut = rem * (size + 1)
      when(rank <= cut, floor((rank - 1) / (size + 1)).cast("long") + 1)
        .otherwise((rem + floor((rank - cut - 1) / greatest(size, lit(1L)))
          .cast("long") + 1).cast("long"))
    }

    val marked = hist
      .withColumn("__blo", bucketOf(col("__off") + 1))
      .withColumn("__bhi", bucketOf(col("__off") + col("__cnt")))
      .drop("__cnt")
    val joined = df.join(broadcast(marked), Seq(orderCol))
    val easy = joined.filter(col("__blo") === col("__bhi"))
      .withColumn("bucket", col("__blo"))
    val tieW = Window.partitionBy(col(orderCol)).orderBy(col(tieCol))
    val hard = joined.filter(col("__blo") =!= col("__bhi"))
      .withColumn("bucket", bucketOf(col("__off") + row_number().over(tieW)))
    easy.unionByName(hard).drop("__off", "__n", "__blo", "__bhi")
  }
}
