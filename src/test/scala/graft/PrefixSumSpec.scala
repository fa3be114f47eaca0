package graft

import graft.ops.Buckets
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Buckets.runningSumByRange]] ≡ the unbounded-preceding window it
  * replaces — per ROW, inclusive and exclusive forms, ties broken by
  * tieCol, groups spanning many range partitions — plus the loud
  * null-key contract shared by every Buckets operator.
  */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def refInclusive(df: DataFrame, partCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("want", sum(col("v")).over(w))
  }

  private def assertSameSums(df: DataFrame, partCols: Seq[String] = Nil): Unit = {
    val ref = refInclusive(df, partCols).select(col("id"), col("want"))
    val got = Buckets.runningSumByRange(df, "v", "k", "id", partCols, "rs")
      .select(col("id"), col("rs").as("got"))
    val diff = ref.join(got, "id").filter(col("want") =!= col("got"))
    assert(diff.count() === 0, diff.limit(5).collect().mkString(", "))
    assert(got.count() === df.count())
  }

  test("running sum ≡ window: ties straddling partitions, ungrouped") {
    // 500 rows over 3 distinct order keys under 4 shuffle partitions:
    // every tie group spans several range partitions, so the carry
    // (control-frame offset) is exercised on every boundary
    val df = (1 to 500)
      .map(i => (i.toLong, (i % 3).toLong, (i % 7 + 1).toLong))
      .toDF("id", "k", "v")
    assertSameSums(df)
  }

  test("running sum ≡ window: dominant group plus small ones (grouped)") {
    // the data_pack_sequences giant-source shape at unit scale: one
    // group owns most rows and spans every range partition
    val rows = (1 to 400).map(i => (i.toLong, "big", (i % 5).toLong, (i % 11 + 1).toLong)) ++
      (401 to 430).map(i => (i.toLong, "small", (i % 3).toLong, 2L)) ++
      Seq((431L, "tiny", 0L, 9L))
    val df = rows.toDF("id", "g", "k", "v")
    val ref = refInclusive(df, Seq("g")).select(col("id"), col("want"))
    val got = Buckets.runningSumByRange(df, "v", "k", "id", Seq("g"), "rs")
      .select(col("id"), col("rs").as("got"))
    val diff = ref.join(got, "id").filter(col("want") =!= col("got"))
    assert(diff.count() === 0, diff.limit(5).collect().mkString(", "))
  }

  test("running sum ≡ window on seeded random shapes") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 5) {
      val size = 50 + rnd.nextInt(400)
      val card = 1 + rnd.nextInt(size)
      val df = (1 to size)
        .map(i => (i.toLong, rnd.nextInt(card).toLong, rnd.nextInt(9).toLong))
        .toDF("id", "k", "v")
      withClue(s"trial $trial size=$size card=$card: ") {
        assertSameSums(df)
      }
    }
  }

  test("exclusive prefix (rs - v) ≡ the 1-PRECEDING window") {
    // the form dataPackSequences consumes: chunk_id keys off the
    // EXCLUSIVE token prefix
    val df = (1 to 300).map(i => (i.toLong, (i % 4).toLong, (i % 13 + 1).toLong))
      .toDF("id", "k", "v")
    val w = Window.orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ref = df.withColumn("want", coalesce(sum(col("v")).over(w), lit(0L)))
      .select("id", "want")
    val got = Buckets.runningSumByRange(df, "v", "k", "id", Nil, "rs")
      .withColumn("got", col("rs") - col("v")).select("id", "got")
    val diff = ref.join(got, "id").filter(col("want") =!= col("got"))
    assert(diff.count() === 0, diff.limit(5).collect().mkString(", "))
  }

  test("stable across repeated evaluation") {
    val df = (1 to 300).map(i => (i.toLong, (i * 13 % 37).toLong, (i % 6).toLong))
      .toDF("id", "k", "v")
    val runs = (1 to 3).map(_ => Buckets.runningSumByRange(df, "v", "k", "id", Nil, "rs")
      .select("id", "rs").as[(Long, Long)].collect().sortBy(_._1).toSeq)
    assert(runs(0) == runs(1) && runs(1) == runs(2))
  }

  test("exact under PARTIAL range sampling (200k continuous keys, grouped)") {
    // the giant-source regime: enough rows that RangePartitioner's
    // reservoir sample is partial, near-distinct continuous order keys,
    // one dominant group. The materialized ranged frame is what makes
    // the local and control legs agree on partition boundaries here —
    // same failure mode the 300k ntileByRange test pins (CurriculumSpec).
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      val rnd = new scala.util.Random(99L)
      val df = (1 to 200000).map { i =>
        (i.toLong, if (i % 20 == 0) "small" else "big",
          rnd.nextDouble(), (i % 7 + 1).toLong)
      }.toDF("id", "g", "k", "v")
      val got = Buckets.runningSumByRange(df, "v", "k", "id", Seq("g"), "rs")
        .select(col("id"), col("rs").as("got"))
      val w = Window.partitionBy("g").orderBy(col("k"), col("id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val ref = df.withColumn("want", sum(col("v")).over(w)).select("id", "want")
      val bad = ref.join(got, "id").filter(col("want") =!= col("got")).count()
      assert(bad === 0)
      assert(got.count() === 200000L)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private def deepMessage(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  test("null order/partition keys raise loudly instead of dropping rows") {
    val nullK = Seq((1L, Some(3L), 1L), (2L, None, 1L), (3L, Some(5L), 1L))
      .toDF("id", "k", "v")
    val e1 = intercept[Exception] {
      Buckets.runningSumByRange(nullK, "v", "k", "id", Nil, "rs").collect()
    }
    assert(deepMessage(e1).contains("NULL in key column 'k'"), deepMessage(e1))

    val nullG = Seq((1L, "a", 3L, 1L), (2L, null.asInstanceOf[String], 4L, 1L))
      .toDF("id", "g", "k", "v")
    val e2 = intercept[Exception] {
      Buckets.ntileByRange(nullG, "k", "id", 3, Seq("g")).collect()
    }
    assert(deepMessage(e2).contains("NULL in key column 'g'"), deepMessage(e2))

    val e3 = intercept[Exception] {
      Buckets.ntileByHistogram(nullK.withColumnRenamed("v", "x"), "k", "id", 3)
        .collect()
    }
    assert(deepMessage(e3).contains("NULL in key column 'k'"), deepMessage(e3))
  }
}
