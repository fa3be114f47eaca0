package graft.ops

import org.apache.spark.sql.DataFrame
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
}
