package graft

import graft.cdc._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Specs for the CDC core operators on small hand-built inputs. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def muts = Seq(
    // (key, ts, tiebreak, op, value)
    (1L, 100L, 1L, "upsert", 10.0),
    (1L, 200L, 2L, "upsert", 20.0),
    (1L, 200L, 3L, "upsert", 25.0), // same time, later tiebreak wins
    (2L, 100L, 4L, "upsert", 30.0),
    (2L, 300L, 5L, "delete", 0.0),
    (3L, 50L, 6L, "upsert", 5.0)
  ).toDF("key", "ts", "tiebreak", "op", "value")

  test("Msort.latestByKey keeps the last mutation per key (hlc order, tiebreak)") {
    val out = Msort.latestByKey(muts, Seq("key"), struct(col("ts"), col("tiebreak")))
      .orderBy("key").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 3L), (2L, 5L), (3L, 6L)))
  }

  test("Msort.uniqueByTimeKey dedups exact (time,key) pairs") {
    val out = Msort.uniqueByTimeKey(muts, Seq("key"), "ts", col("tiebreak"))
    assert(out.count() == 5) // the (1, 200) pair collapses
    assert(out.filter(col("key") === 1 && col("ts") === 200)
      .select("tiebreak").as[Long].head() == 3L)
  }

  test("Apply.upsertDelete drops keys whose final op is a delete") {
    val out = Apply.upsertDelete(muts, Seq("key"),
      struct(col("ts"), col("tiebreak")), col("op") === "delete")
    assert(out.select("key").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("Apply.casApply keeps the max CAS tuple per key") {
    val out = Apply.casApply(muts, Seq("key"), struct(col("value")))
    val vals = out.select("key", "value").as[(Long, Double)].collect().toMap
    assert(vals == Map(1L -> 25.0, 2L -> 30.0, 3L -> 5.0))
  }

  test("Staging.filterApplied anti-joins the applied set") {
    val applied = Seq(1L, 4L, 6L).toDF("tiebreak")
    val out = Staging.filterApplied(muts, applied, Seq("tiebreak"))
    assert(out.select("tiebreak").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 5L))
  }

  test("Staging.retire keeps only mutations after the retirement point") {
    val out = Staging.retire(muts, "ts", lit(100L))
    assert(out.count() == 3)
  }

  test("Dlq.route splits by first matching reason") {
    val (okRows, dlq) = Dlq.route(muts, Seq(
      "deleted" -> (col("op") === "delete"),
      "low_value" -> (col("value") < 10.0)))
    assert(okRows.count() == 4)
    val reasons = dlq.select("tiebreak", "dlq_reason").as[(Long, String)].collect().toMap
    assert(reasons == Map(5L -> "deleted", 6L -> "low_value"))
  }

  test("MergeOps.threeWayMerge classifies clean/idempotent/conflict") {
    // key 9: t=1 v=1, t=2 claims before=1 (clean), t=3 claims before=7
    // while target is 2 (conflict), t=4 proposes the current value
    // (idempotent).
    val log = Seq(
      (9L, 1L, Option.empty[Double], 1.0),
      (9L, 2L, Some(1.0), 2.0),
      (9L, 3L, Some(7.0), 3.0),
      (9L, 4L, Some(8.0), 3.0) // diverged before, but proposed == target
    ).toDF("key", "ts", "before", "proposed")
    val out = MergeOps.threeWayMerge(log, Seq("key"), Seq(col("ts")),
        col("before"), col("proposed"),
        (t, _, p) => greatest(t, p))
      .select("ts", "merge_status", "resolved_value")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq("clean", "clean", "conflict", "idempotent"))
    assert(out(2)._3 == 3.0) // greatest(target=2, proposed=3)
  }

  test("mergeBags mirrors the reference's standard-merge cases") {
    // cases modeled on merge/standard_test.go: trivial apply, clean
    // update, idempotent replay, unmergeable conflict
    import org.apache.spark.sql.functions.{col, map, lit, typedLit}
    def bag(kv: (String, String)*) = typedLit(kv.toMap)
    val empty = typedLit(Map.empty[String, String])

    val df = Seq(1).toDF("i").select(
      // trivial: no blocking row -> apply proposed
      MergeOps.mergeBags(bag(), bag("pk0" -> "0", "col1" -> "42"), empty).as("trivial"),
      // clean: target matches before, proposed changes col1
      MergeOps.mergeBags(
        bag("pk0" -> "0", "col1" -> "1"),
        bag("pk0" -> "0", "col1" -> "2"),
        bag("pk0" -> "0", "col1" -> "1")).as("clean"),
      // idempotent: proposed already applied
      MergeOps.mergeBags(
        bag("pk0" -> "0", "col1" -> "1"),
        bag("pk0" -> "0", "col1" -> "2"),
        bag("pk0" -> "0", "col1" -> "2")).as("idem"),
      // conflict: target diverged from both before and proposed
      MergeOps.mergeBags(
        bag("pk0" -> "0", "col1" -> "1"),
        bag("pk0" -> "0", "col1" -> "2"),
        bag("pk0" -> "0", "col1" -> "99")).as("conflict"))
    val r = df.head()

    def mergedOf(name: String) =
      r.getStruct(r.fieldIndex(name)).getMap[String, String](0)
    def unmergedOf(name: String) =
      r.getStruct(r.fieldIndex(name)).getSeq[String](1)

    assert(mergedOf("trivial") == Map("pk0" -> "0", "col1" -> "42"))
    assert(unmergedOf("trivial").isEmpty)
    assert(mergedOf("clean")("col1") == "2")
    assert(unmergedOf("clean").isEmpty)
    assert(mergedOf("idem")("col1") == "2")
    assert(unmergedOf("idem").isEmpty)
    assert(mergedOf("conflict")("col1") == "99") // target kept
    assert(unmergedOf("conflict") == Seq("col1")) // reported unmerged
  }

  test("uniqueByKey mirrors msort_test.go cases (dups, out-of-order hlc)") {
    // msort_test.go TestUniqueByKey: repeated keys keep the latest hlc;
    // an out-of-order earlier mutation must not displace a later one
    val data = Seq(
      // (key, nanos, logical, value)  — mut(k,v) uses hlc(k, k)
      (2L, 2L, 2, "expected"),
      (1L, 1L, 1, "deleted"),
      (1L, 1L, 1, "deleted"),
      (4L, 4L, 4, "expected"),
      (1L, 1L, 1, "deleted2"),
      (1L, 100L, 100, "expected"), // mut(1, expected, hlc(100,100))
      (3L, 3L, 3, "expected")
    ).toDF("key", "nanos", "logical", "value")
    val out = Msort.latestByKey(data, Seq("key"),
        struct(col("nanos"), col("logical"), col("value")))
      .select("key", "value").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "expected", 2L -> "expected", 3L -> "expected", 4L -> "expected"))
  }

  test("Hlc renders and orders like the reference format") {
    val df = Seq((1000L, 5), (1000L, 12), (2000L, 0)).toDF("nanos", "logical")
      .select(Hlc.hlc(col("nanos"), col("logical")).as("h"))
    val rendered = df.select(Hlc.render(col("h"))).as[String].collect().toSet
    assert(rendered.contains("1000.0000000005"))
    val maxH = df.agg(max(col("h"))).collect()(0).getStruct(0)
    assert(maxH.getLong(0) == 2000L)
  }

  test("Changefeed.read parses envelope files (hlc, deletes)") {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_test_cf"
    Seq(
      """{"after": {"id": 1, "v": "a"}, "key": [1], "updated": "1000.0000000001"}""",
      """{"after": null, "key": [2], "updated": "2000.0000000000"}"""
    ).toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val out = Changefeed.read(spark, dir).orderBy("hlc")
    val rows = out.collect()
    assert(rows.length == 2)
    assert(!rows(0).getBoolean(rows(0).fieldIndex("is_delete")))
    assert(rows(1).getBoolean(rows(1).fieldIndex("is_delete")))
    assert(rows(0).getStruct(rows(0).fieldIndex("hlc")).getInt(1) == 1)
  }

  test("Workload generates FK-consistent parent/child tables") {
    val rep = Workload.consistencyReport(spark, 100L, 1000L).collect()(0)
    assert(rep.getLong(0) == 100L)
    assert(rep.getLong(1) == 1000L)
    assert(rep.getLong(2) == 0L)
  }

  test("GTID frontier: interval set with holes, rendering, resume anti-join") {
    // source A applied 1,2,3,5,6,9 (holes at 4,7,8); source B applied 2
    val applied = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 5L),
      ("a", 6L), ("a", 9L), ("b", 2L)).toDF("src", "gno")
    val frontier = TxnLog.gtidFrontier(applied, "src", "gno")
    val ivs = frontier.orderBy("src", "start_gno").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(ivs.toSeq == Seq(("a", 1L, 3L, 3L), ("a", 5L, 6L, 2L),
      ("a", 9L, 9L, 1L), ("b", 2L, 2L, 1L)))

    val sets = TxnLog.gtidSet(frontier, "src").orderBy("src").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(sets.toSeq == Seq(("a", "1-3:5-6:9-9", 3L, 6L), ("b", "2-2", 1L, 1L)))

    // incoming log: covered gnos drop, holes and new ground survive
    val incoming = Seq(("a", 2L), ("a", 4L), ("a", 7L), ("a", 10L),
      ("b", 2L), ("b", 3L), ("c", 1L)).toDF("src", "gno")
    val pending = TxnLog.gtidResume(incoming, frontier, "src", "gno")
      .orderBy("src", "gno").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(pending.toSeq == Seq(("a", 4L), ("a", 7L), ("a", 10L),
      ("b", 3L), ("c", 1L)))
  }

  test("GTID islands merge across gno bands; band split ≡ global islands") {
    def ivs(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("src", "start_gno").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    // bandBits = 2 (width 4): an island spanning three full bands, one
    // breaking exactly at a band edge, and band-internal holes
    val gnos = (0L to 11L) ++ Seq(16L, 17L, 18L, 19L, 20L) ++ Seq(26L, 27L)
    val txns = gnos.toDF("gno").select(lit("a").as("src"), col("gno"))
    assert(ivs(TxnLog.gtidFrontier(txns, "src", "gno", bandBits = 2)) ==
      Seq(("a", 0L, 11L, 12L), ("a", 16L, 20L, 5L), ("a", 26L, 27L, 2L)))

    // right-touching island whose successor band is MISSING must not
    // merge with the next touching island (21-23 touches band edge;
    // 28 starts a band; 24-27 absent)
    val txns2 = (Seq(21L, 22L, 23L) ++ Seq(28L, 29L)).toDF("gno")
      .select(lit("a").as("src"), col("gno"))
    assert(ivs(TxnLog.gtidFrontier(txns2, "src", "gno", bandBits = 2)) ==
      Seq(("a", 21L, 23L, 3L), ("a", 28L, 29L, 2L)))

    // randomized equivalence: tiny bands ≡ one-giant-band (global sort)
    val rnd = new scala.util.Random(7)
    val randomTxns = Seq.fill(400)(
      (if (rnd.nextBoolean()) "a" else "b", rnd.nextInt(200).toLong))
      .toDF("src", "gno")
    assert(ivs(TxnLog.gtidFrontier(randomTxns, "src", "gno", bandBits = 2)) ==
      ivs(TxnLog.gtidFrontier(randomTxns, "src", "gno", bandBits = 40)))
  }

  test("GTID set string round-trips: render → parse → resume ≡ live frontier") {
    val applied = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 5L),
      ("a", 6L), ("a", 9L), ("b", 2L)).toDF("src", "gno")
    val frontier = TxnLog.gtidFrontier(applied, "src", "gno")
    val parsed = TxnLog.gtidSetParse(
      TxnLog.gtidSet(frontier, "src").select("src", "gtid_set"), "src", "gtid_set")
    def ivs(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("src", "start_gno").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(ivs(parsed) == ivs(frontier))

    // MySQL renders singleton intervals as a bare GNO (`1-5:7`, not
    // `7-7`) — the parse must read them as start == end, or resume's
    // NULL end_gno would re-admit already-applied transactions
    val mysqlStyle = Seq(("a", "1-5:7"), ("b", "3")).toDF("src", "gtid_set")
    assert(ivs(TxnLog.gtidSetParse(mysqlStyle, "src", "gtid_set")) ==
      Seq(("a", 1L, 5L, 5L), ("a", 7L, 7L, 1L), ("b", 3L, 3L, 1L)))

    // a checkpoint-seeded resume admits exactly what the live one does
    val incoming = Seq(("a", 2L), ("a", 4L), ("a", 7L), ("a", 10L),
      ("b", 2L), ("b", 3L), ("c", 1L)).toDF("src", "gno")
    def resumed(f: org.apache.spark.sql.DataFrame) =
      TxnLog.gtidResume(incoming, f, "src", "gno")
        .orderBy("src", "gno").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(resumed(parsed) == resumed(frontier))
  }
}
