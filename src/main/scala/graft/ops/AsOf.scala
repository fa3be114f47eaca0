package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal as-of join — for every left row, the most recent right row
  * at or before the left row's time, per key. Spark has no native
  * ASOF JOIN; the naive formulations are a per-row subquery or a range
  * join that explodes to |L|·|R| per key before filtering.
  *
  * Scale shape: tag-and-union both sides, ONE shuffle on the key, one
  * ordered window pass carrying the latest right-side values forward
  * (`last(_, ignoreNulls = true)` over a growing frame), then keep the
  * left rows. Cost is a sort within each key partition — linear in
  * |L| + |R|, never quadratic, and partial ordering comes free from
  * the shuffle sort.
  */
object AsOf {

  /** @param valueCols right-side columns to carry (must not collide
    *                  with left column names)
    * Ties: a right row AT the left row's exact time matches
    * (at-or-before semantics); among right rows with equal time the
    * latest by `rightTiebreak` wins.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightTiebreak: Column,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(valueCols.intersect(leftCols).isEmpty,
      s"right value columns ${valueCols.intersect(leftCols)} collide with left")
    val taggedRight = right.select(
      Seq(col(key), col(rightTime).as("__t"), lit(0).as("__side"),
        rightTiebreak.as("__tb")) ++
        valueCols.map(col) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(key), col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast("long").as("__tb")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftCols.filterNot(_ == key).map(col): _*)
    // right rows sort before left rows at equal time (__side 0 < 1), so
    // "at or before" includes same-instant right rows
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(taggedRight.unionByName(taggedLeft)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(Seq(col(key)) ++ leftCols.filterNot(_ == key).map(col) ++
        valueCols.map(col): _*)
  }
}
