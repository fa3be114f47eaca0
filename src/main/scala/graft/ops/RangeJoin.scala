package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join without the |L|×|R| explosion.
  *
  * Spark has no native range-join optimization: `points JOIN intervals
  * ON p.t BETWEEN i.start AND i.end` plans as BroadcastNestedLoopJoin
  * (or worse, a cross product) — every point against every interval.
  * The scale shape is BIN BUCKETING: both sides key by fixed-width
  * time bins, the join becomes an equi-join on the bin (one hash
  * shuffle each side), and the exact containment predicate filters
  * after. A point lands in exactly ONE bin, so no pair can match
  * twice and no post-join dedup is needed; each interval explodes to
  * `⌈len/width⌉ + 1` bins, so width is chosen near the typical
  * interval length to keep the fan-out O(1) per interval.
  */
object RangeJoin {

  /** @param points    frame carrying `pointCol` (long, e.g. nanos)
    * @param intervals frame carrying `[startCol, endCol)` longs
    * @param binWidth  bin width in the same unit; pick ≈ the typical
    *                  interval length
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", expr(s"$pointCol div $binWidth"))
    val i = intervals.withColumn("__bin",
      explode(sequence(expr(s"$startCol div $binWidth"),
        expr(s"($endCol - 1) div $binWidth"))))
    p.join(i, "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }
}
