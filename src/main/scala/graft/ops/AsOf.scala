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
  * ordered window pass carrying the latest right ROW forward (a single
  * `last(struct(...), ignoreNulls = true)` — the whole right row moves
  * atomically, so a NULL inside one value column can never produce a
  * torn mix of two right rows), then keep the left rows. Cost is a
  * sort within each key partition — linear in |L| + |R|, never
  * quadratic.
  */
object AsOf {

  /** @param valueCols right-side columns to carry (must not collide
    *                  with left column names)
    * Semantics match SQL ASOF (`l.k = r.k AND l.t >= r.t`): a right
    * row AT the left row's exact time matches; among equal-time right
    * rows the latest by `rightTiebreak` wins; NULL keys or NULL right
    * times never match (those right rows are filtered out, and left
    * rows with no match carry NULLs — left-join behavior).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightTiebreak: Column,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(valueCols.intersect(leftCols).isEmpty,
      s"right value columns ${valueCols.intersect(leftCols)} collide with left")
    val reserved = Seq("__t", "__side", "__tb", "__rv")
    require(reserved.intersect(leftCols ++ valueCols).isEmpty,
      s"column names $reserved are reserved by asOfJoin")
    val tbType = right.select(rightTiebreak.as("__tb")).schema.head.dataType
    val rvType = right.select(struct(valueCols.map(col): _*).as("__rv"))
      .schema.head.dataType
    val taggedRight = right
      // SQL inequality semantics: NULL keys / times never match
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select(
        Seq(col(key), col(rightTime).as("__t"), lit(0).as("__side"),
          rightTiebreak.as("__tb"), struct(valueCols.map(col): _*).as("__rv")) ++
          leftCols.filterNot(_ == key)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(key), col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(tbType).as("__tb"), lit(null).cast(rvType).as("__rv")) ++
        leftCols.filterNot(_ == key).map(col): _*)
    // right rows sort before left rows at equal time (__side 0 < 1), so
    // "at or before" includes same-instant right rows; a left row with
    // NULL time sorts before every right row (nulls first) and matches
    // nothing, exactly like `l.t >= r.t` on NULL
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(key)) ++ leftCols.filterNot(_ == key).map(col) ++
        valueCols.map(c => col("__rv").getField(c).as(c)): _*)
  }
}
