package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal as-of join — for every left row, the most recent right row
  * at or before the left row's time, per key. Spark has no native
  * ASOF JOIN; the naive formulations are a per-row subquery or a range
  * join that explodes to |L|·|R| per key before filtering.
  *
  * Scale shape: tag-and-union both sides, then ONE carry-forward pass
  * of the latest right ROW (a single `last(struct(...), ignoreNulls =
  * true)` — the whole right row moves atomically, so a NULL inside one
  * value column can never produce a torn mix of two right rows), then
  * keep the left rows. Cost is linear in |L| + |R|, never quadratic.
  *
  * The carry itself auto-switches per key (the lmBuckets precedent):
  * ordinary keys take a key-partitioned window (one shuffle on the
  * key, per-key sort); keys whose |L|+|R| row count reaches
  * `giantKeyThreshold` take [[Buckets.lastValueByRange]] instead —
  * range-repartitioned on (key, t, tie), so ONE dominant entity key
  * (the hot-account regime) is split across tasks instead of being a
  * single task's sort+scan of its whole history. The plan choice is a
  * driver-side bounded control read of per-key counts; both paths are
  * bit-identical (the carry is pure selection — no arithmetic).
  */
object AsOf {

  /** Keys at or above this many tagged rows (|L|+|R| for the key) take
    * the range-partitioned carry. 2^20 rows ≈ a key one task can still
    * sort comfortably; above it the dedicated-straggler risk grows
    * linearly with skew.
    */
  val DefaultGiantKeyThreshold: Long = 1L << 20

  /** The control read behind [[asOfJoin]]'s per-key plan choice,
    * exposed so callers staging SEVERAL as-ofs over the same keyspace
    * (PgLogical resolving batch after batch against one descriptor
    * stream; any pipeline chaining as-of stages) pay the per-key
    * aggregation pass ONCE and hand the profile to every call via
    * `knownGiants`. Counts what asOfJoin's internal read counts: left
    * rows plus MATCHABLE right rows (non-null key AND time) per key.
    * Staleness is SAFE: the profile only picks the plan — both carry
    * paths are bit-identical — so a cached/approximate skew profile
    * can cost speed, never correctness.
    */
  def giantKeys(left: DataFrame, right: DataFrame, key: String,
      rightTime: String,
      giantKeyThreshold: Long = DefaultGiantKeyThreshold): (Seq[Any], Boolean) =
    Buckets.giantGroups(
      right.filter(col(key).isNotNull && col(rightTime).isNotNull)
        .select(col(key))
        .unionByName(left.select(col(key))),
      key, giantKeyThreshold)

  /** @param valueCols right-side columns to carry (must not collide
    *                  with left column names)
    * @param giantKeyThreshold per-key row count at which the carry
    *                  switches to the range-partitioned path; <= 0
    *                  forces the range path for EVERY key (the
    *                  oracle-equivalence test mode — it skips the
    *                  control read entirely)
    * @param knownGiants a precomputed [[giantKeys]] profile; when
    *                  supplied the per-call control read (a full
    *                  aggregation pass over the tagged union) is
    *                  skipped — the seam for callers that run many
    *                  as-ofs over one keyspace. Plan choice only:
    *                  a stale profile can never change the answer.
    * Semantics match SQL ASOF (`l.k = r.k AND l.t >= r.t`): a right
    * row AT the left row's exact time matches; among equal-time right
    * rows the latest by `rightTiebreak` wins; NULL keys or NULL right
    * times never match (those right rows are filtered out, and left
    * rows with no match carry NULLs — left-join behavior).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightTiebreak: Column,
      valueCols: Seq[String],
      giantKeyThreshold: Long = DefaultGiantKeyThreshold,
      knownGiants: Option[(Seq[Any], Boolean)] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(valueCols.intersect(leftCols).isEmpty,
      s"right value columns ${valueCols.intersect(leftCols)} collide with left")
    val reserved = Seq("__t", "__side", "__tb", "__rv", "__tie")
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
    val unioned = taggedRight.unionByName(taggedLeft)

    // right rows sort before left rows at equal time (__side 0 < 1), so
    // "at or before" includes same-instant right rows; a left row with
    // NULL time sorts before every right row (nulls first) and matches
    // nothing, exactly like `l.t >= r.t` on NULL
    def viaWindow(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(key)
        .orderBy(col("__t"), col("__side"), col("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
    }
    // the giant-key path: range-partitioned carry. NULL keys / NULL
    // left times match nothing under BOTH formulations — here they
    // split to a no-carry leg up front (the range machinery's key
    // contract is loudly non-null), keeping their built-in null __rv.
    def viaRange(df: DataFrame): DataFrame = {
      val matchable = df.filter(col(key).isNotNull && col("__t").isNotNull)
      val noMatch = df.filter(col(key).isNull || col("__t").isNull)
      // struct tie = (side, tiebreak): right-before-left at equal
      // time, latest tiebreak wins — the window's exact sort order
      val carried = Buckets.lastValueByRange(
          matchable.withColumn("__tie", struct(col("__side"), col("__tb"))),
          "__rv", "__t", "__tie", Seq(key), out = "__rvc")
        .withColumn("__rv", col("__rvc")).drop("__rvc", "__tie")
      carried.unionByName(noMatch)
    }

    val (giants, allGiant) =
      if (giantKeyThreshold <= 0L) (Seq.empty[Any], true)
      else knownGiants.getOrElse(
        Buckets.giantGroups(unioned.select(key), key, giantKeyThreshold))
    val resolved =
      if (allGiant) viaRange(unioned)
      else if (giants.isEmpty) viaWindow(unioned)
      else {
        // mixed regime: each key's carry is independent, so the legs
        // split cleanly; null keys fall to the window leg (coalesce —
        // isInCollection is NULL on null input)
        val isGiant = coalesce(col(key).isInCollection(giants), lit(false))
        viaRange(unioned.filter(isGiant))
          .unionByName(viaWindow(unioned.filter(!isGiant)))
      }
    resolved
      .filter(col("__side") === 1)
      .select(Seq(col(key)) ++ leftCols.filterNot(_ == key).map(col) ++
        valueCols.map(c => col("__rv").getField(c).as(c)): _*)
  }
}
