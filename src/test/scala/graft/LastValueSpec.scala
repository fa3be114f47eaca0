package graft

import graft.ops.{AsOf, Buckets}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Buckets.lastValueByRange]] ≡ the IGNORE NULLS carry-forward
  * window it replaces, and the [[AsOf.asOfJoin]] giant-key
  * auto-switch's path equivalence. (The [[Materialize]] seam's own
  * contract lives in MaterializeSpec.)
  */
class LastValueSpec extends SparkSpec {
  import spark.implicits._

  private def refCarry(df: DataFrame, partCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("want", last(col("v"), ignoreNulls = true).over(w))
  }

  private def assertSameCarry(df: DataFrame, partCols: Seq[String] = Nil): Unit = {
    val ref = refCarry(df, partCols).select(col("id"), col("want"))
    val got = Buckets.lastValueByRange(df, "v", "k", "id", partCols, "lv")
      .select(col("id"), col("lv").as("got"))
    val diff = ref.join(got, "id")
      .filter(!(col("want") <=> col("got"))) // null-safe: leading nulls carry null
    assert(diff.count() === 0, diff.limit(5).collect().mkString(", "))
    assert(got.count() === df.count())
  }

  test("carry ≡ window: nulls and ties straddling range partitions") {
    // 500 rows over 3 order keys under 4 shuffle partitions; two of
    // every five values null — the carry must skip them across both
    // local rows AND whole-partition boundaries
    val df = (1 to 500)
      .map(i => (i.toLong, (i % 3).toLong,
        if (i % 5 < 2) None else Some(s"v$i")))
      .toDF("id", "k", "v")
    assertSameCarry(df)
  }

  test("carry ≡ window: dominant group, all-null group, leading nulls") {
    val rows =
      (1 to 400).map(i => (i.toLong, "big", (i % 7).toLong,
        if (i % 3 == 0) None else Some(i.toLong))) ++
      (401 to 420).map(i => (i.toLong, "allnull", (i % 2).toLong,
        None: Option[Long])) ++
      (421 to 440).map(i => (i.toLong, "lead", (i - 420).toLong,
        if (i < 430) None else Some(i.toLong)))
    val df = rows.toDF("id", "g", "k", "v")
    val ref = refCarry(df, Seq("g")).select(col("id"), col("want"))
    val got = Buckets.lastValueByRange(df, "v", "k", "id", Seq("g"), "lv")
      .select(col("id"), col("lv").as("got"))
    val diff = ref.join(got, "id").filter(!(col("want") <=> col("got")))
    assert(diff.count() === 0, diff.limit(5).collect().mkString(", "))
  }

  test("carry ≡ window on seeded random shapes") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 5) {
      val size = 50 + rnd.nextInt(400)
      val card = 1 + rnd.nextInt(size)
      val df = (1 to size)
        .map(i => (i.toLong, rnd.nextInt(card).toLong,
          if (rnd.nextBoolean()) None else Some(rnd.nextInt(99).toLong)))
        .toDF("id", "k", "v")
      withClue(s"trial $trial size=$size card=$card: ")(assertSameCarry(df))
    }
  }

  private def asofFixture(seed: Long): (DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(seed)
    // one hot key (0) owning most rows + small keys + null keys/times:
    // the exact regime the auto-switch exists for
    val right = (1 to 120).map { i =>
      val k = if (rnd.nextInt(10) < 7) Some(0L) else Some(rnd.nextInt(5).toLong)
      (k, if (i % 17 == 0) None else Some(rnd.nextInt(50).toLong), i.toLong, i * 10L)
    }.toDF("k", "ts", "tb", "px")
    val left = (1 to 200).map { i =>
      val k = if (rnd.nextInt(20) == 0) None
        else if (rnd.nextInt(10) < 7) Some(0L) else Some(rnd.nextInt(6).toLong)
      (k, if (i % 13 == 0) None else Some(rnd.nextInt(55).toLong), 1000L + i)
    }.toDF("k", "ts", "trade_id")
    (left, right)
  }

  private def runAsof(left: DataFrame, right: DataFrame,
      threshold: Long): DataFrame =
    AsOf.asOfJoin(left, right, "k", leftTime = "ts", rightTime = "ts",
      rightTiebreak = col("tb"), valueCols = Seq("tb", "px"),
      giantKeyThreshold = threshold)

  test("asOfJoin: forced-range and mixed modes ≡ the window mode") {
    for (seed <- Seq(7L, 99L)) {
      val (left, right) = asofFixture(seed)
      val want = runAsof(left, right, Long.MaxValue) // pure window
      for (threshold <- Seq(0L /* all-range */, 100L /* hot key only */)) {
        val got = runAsof(left, right, threshold)
        withClue(s"seed=$seed threshold=$threshold: ") {
          assert(got.count() === want.count())
          assert(want.exceptAll(got).count() === 0)
          assert(got.exceptAll(want).count() === 0)
        }
      }
    }
  }

  test("asOfJoin knownGiants: a supplied profile picks the plan, never the answer") {
    val (left, right) = asofFixture(11L)
    val want = sorted(runAsof(left, right, Long.MaxValue)) // pure window
    // giantKeys computes exactly what the internal control read
    // computes (left rows + matchable right rows per key)
    val tagged = left.select("k").unionByName(
      right.filter(col("k").isNotNull && col("ts").isNotNull).select("k"))
    val wantCounts = tagged.groupBy("k").count().collect()
      .collect { case r if !r.isNullAt(0) && r.getLong(1) >= 100 => r.getLong(0) }
      .toSet
    val (giants, allGiant) = AsOf.giantKeys(left, right, "k", "ts", 100L)
    assert(giants.map(_.asInstanceOf[Long]).toSet === wantCounts)
    assert(!allGiant)
    // the CORRECT cached profile and two WRONG ones (stale "no
    // giants"; overeager "everything is giant") must all produce the
    // window mode's exact rows — the profile is plan choice only,
    // which is what makes carrying it across batches safe
    for (profile <- Seq((giants, allGiant), (Seq.empty[Any], false),
        (Seq.empty[Any], true))) {
      val got = sorted(AsOf.asOfJoin(left, right, "k", leftTime = "ts",
        rightTime = "ts", rightTiebreak = col("tb"), valueCols = Seq("tb", "px"),
        giantKeyThreshold = 100L, knownGiants = Some(profile)))
      assert(got == want, s"profile=$profile diverged from the window mode")
    }
  }

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("asOfJoin mixed mode: hot key resolved by range, cold by window") {
    val (left, right) = asofFixture(3L)
    // threshold 100 catches key 0 (~70% of 320 tagged rows) and no other
    val tagged = left.select("k").unionByName(right.select("k"))
      .groupBy("k").count().collect()
      .collect { case r if !r.isNullAt(0) && r.getLong(1) >= 100 => r.getLong(0) }
    assert(tagged.toSeq === Seq(0L))
  }

}
