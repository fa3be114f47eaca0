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
    * @param maxBinsPerInterval fail-fast bound on per-interval fan-out:
    *                  an open-ended sentinel (end = Long.MaxValue)
    *                  would otherwise explode to millions of bin rows
    *                  (or overflow sequence()'s array limit) — a
    *                  mis-sized binWidth must error, not melt the job
    *
    * Empty and inverted intervals (`end <= start`) contain nothing by
    * the `[start, end)` semantics and are dropped up front — an
    * inverted pair would otherwise make `sequence()` run DESCENDING
    * (its default step is −1 when start > stop) and spray junk bins.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long, maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    (points.columns ++ intervals.columns).find(_ == "__bin").foreach { _ =>
      throw new IllegalArgumentException(
        "column name __bin is reserved by pointInInterval")
    }
    val startBin = expr(s"$startCol div $binWidth")
    val endBin = expr(s"($endCol - 1) div $binWidth")
    val p = points.withColumn("__bin", expr(s"$pointCol div $binWidth"))
    val i = intervals.filter(col(endCol) > col(startCol))
      .withColumn("__bin", explode(
        when(endBin - startBin < maxBinsPerInterval, sequence(startBin, endBin))
          .otherwise(raise_error(format_string(
            s"range join: interval [%s, %s) spans more than $maxBinsPerInterval " +
              s"bins at binWidth=$binWidth — raise binWidth or maxBinsPerInterval",
            col(startCol), col(endCol))))))
    p.join(i, "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }
}
