package graft.queries

import graft.Tables
import graft.cdc._
import graft.ops.RangeJoin
import graft.streaming.StreamApply
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's CDC surface exercised over the `events` mutation
  * stream: `user_id` is the row key, `ts` the HLC wall time, `event_id`
  * the deterministic logical tiebreak, `event_type` the operation,
  * `props` the JSON payload, `value` the CAS/metric column.
  */
object CdcQueries {

  private def events(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  /** Per-process scratch tag — only for sinks that REWRITE on every run
    * (the write is the operator under test); build-once fixtures use
    * [[fixture]] instead.
    */
  private def fixtureTag(dir: String): String = {
    val f = new java.io.File(s"$dir/events.parquet")
    dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + f.length() + "_" +
      f.lastModified() + "_p" + ProcessHandle.current().pid()
  }

  /** Build-once fixture directory, safe under concurrent processes.
    *
    * The name is content-keyed (sf dir + source length + mtime, so a
    * regenerated events table invalidates the cache) and STABLE across
    * processes — reruns reuse it instead of leaking one copy per pid.
    * Writers stage into a pid-suffixed temp dir and ATOMICALLY rename
    * into place: concurrent Verify/Bench runs race to one winner,
    * losers discard their copy, and a reader can never observe a
    * half-written dir (_SUCCESS only ever arrives via the rename).
    */
  private def fixture(dir: String, kind: String)(write: String => Unit): String = {
    val src = new java.io.File(s"$dir/events.parquet")
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + src.length() +
      "_" + src.lastModified()
    val stable = new java.io.File(s"${sys.props("java.io.tmpdir")}/graft_${kind}_$tag")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    def complete = new java.io.File(stable, "_SUCCESS").exists()
    if (complete) return stable.getPath
    val tmp = new java.io.File(stable.getPath + ".w" + ProcessHandle.current().pid())
    write(tmp.getPath)
    if (tmp.renameTo(stable)) return stable.getPath
    // rename failed: the name is occupied. A COMPLETE dir can only ever
    // appear via an atomic rename, so re-checking _SUCCESS now is safe:
    // either a concurrent writer won (use theirs) or a crashed run left
    // garbage (no _SUCCESS, and no rename can succeed past it — remove
    // it and retry once). A complete fixture is never deleted.
    if (complete) { rm(tmp); return stable.getPath }
    rm(stable)
    if (tmp.renameTo(stable) || complete) { rm(tmp); return stable.getPath }
    tmp.getPath // last resort: private, correct, unshared copy
  }
  private def ord: Column = struct(col("ts"), col("event_id"))
  private def cents(c: Column): Column = round(c * 100).cast("long")

  // -- 1: msort.UniqueByKey ------------------------------------------------
  def latestByKey(s: SparkSession, dir: String): DataFrame =
    Msort.latestByKey(events(s, dir), Seq("user_id"), ord).orderBy("user_id")

  val latestByKeySql: String =
    """SELECT event_id, ts, user_id, event_type, value, props FROM (
      |  SELECT e.*, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events e) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  // -- 2: msort.UniqueByTimeKey -------------------------------------------
  def uniqueByTimeKey(s: SparkSession, dir: String): DataFrame =
    Msort.uniqueByTimeKey(events(s, dir), Seq("user_id"), "ts", col("event_id"))
      .orderBy("user_id", "ts", "event_id")

  val uniqueByTimeKeySql: String =
    """SELECT event_id, ts, user_id, event_type, value, props FROM (
      |  SELECT e.*, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      |  FROM events e) t
      |WHERE rn = 1 ORDER BY user_id, ts, event_id""".stripMargin

  // -- 3: target/apply upsert+delete --------------------------------------
  def applyUpsertDelete(s: SparkSession, dir: String): DataFrame =
    Apply.upsertDelete(events(s, dir), Seq("user_id"), ord,
      col("event_type") === "error").orderBy("user_id")

  val applyUpsertDeleteSql: String =
    """SELECT event_id, ts, user_id, event_type, value, props FROM (
      |  SELECT e.*, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events e) t
      |WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin

  // -- 4: applycfg.CASColumns ---------------------------------------------
  def casApply(s: SparkSession, dir: String): DataFrame =
    Apply.casApply(events(s, dir), Seq("user_id"),
      struct(col("value"), col("ts"), col("event_id"))).orderBy("user_id")

  val casApplySql: String =
    """SELECT event_id, ts, user_id, event_type, value, props FROM (
      |  SELECT e.*, row_number() OVER (PARTITION BY user_id ORDER BY value DESC, ts DESC, event_id DESC) AS rn
      |  FROM events e) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  // -- 5: applycfg.Deadlines ----------------------------------------------
  def deadlines(s: SparkSession, dir: String): DataFrame =
    Apply.deadlineFilter(events(s, dir), "ts", "1 DAY").orderBy("event_id")

  val deadlinesSql: String =
    """SELECT * FROM events
      |WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 1 DAY
      |ORDER BY event_id""".stripMargin

  // -- 6: staging/checkpoint resolved windows -----------------------------
  def resolvedWindows(s: SparkSession, dir: String): DataFrame =
    Staging.resolvedWindows(events(s, dir), "ts", "user_id",
      sum(cents(col("value")))).orderBy("window_start")

  val resolvedWindowsSql: String =
    """SELECT date_trunc('hour', ts) AS window_start, COUNT(*) AS n_muts,
      |  COUNT(DISTINCT user_id) AS n_keys,
      |  CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS metric
      |FROM events GROUP BY 1 ORDER BY window_start""".stripMargin

  // -- 7: Stager.FilterApplied --------------------------------------------
  def stageFilterApplied(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val ck = ev.agg((min(col("ts")) + expr("INTERVAL 15 DAY")).as("__ck"))
    val applied = ev.crossJoin(broadcast(ck)).filter(col("ts") <= col("__ck"))
      .select("event_id")
    Staging.filterApplied(ev, applied, Seq("event_id")).orderBy("event_id")
  }

  val stageFilterAppliedSql: String =
    """SELECT * FROM events
      |WHERE event_id NOT IN (
      |  SELECT event_id FROM events
      |  WHERE ts <= (SELECT MIN(ts) + INTERVAL 15 DAY FROM events))
      |ORDER BY event_id""".stripMargin

  // -- 8: Stager.Retire ----------------------------------------------------
  def stageRetire(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val rt = ev.agg((min(col("ts")) + expr("INTERVAL 15 DAY")).as("__retire"))
    Staging.retire(ev.crossJoin(broadcast(rt)), "ts", col("__retire"))
      .drop("__retire").orderBy("event_id")
  }

  val stageRetireSql: String =
    """SELECT * FROM events
      |WHERE ts > (SELECT MIN(ts) + INTERVAL 15 DAY FROM events)
      |ORDER BY event_id""".stripMargin

  // -- 9: target/dlq -------------------------------------------------------
  def dlq(s: SparkSession, dir: String): DataFrame = {
    // parse the payload once into a column; try_cast so a non-numeric
    // payload routes to the DLQ (NULL) instead of aborting the job
    // under ANSI mode — the exact row the DLQ exists to absorb
    val withK = events(s, dir)
      .withColumn("__k", expr("try_cast(get_json_object(props, '$.k') AS LONG)"))
    val (_, dead) = Dlq.route(withK, Seq(
      "missing_payload_key" -> col("__k").isNull,
      "out_of_range" -> (col("__k") >= 90)))
    dead.select("event_id", "user_id", "event_type", "dlq_reason").orderBy("event_id")
  }

  val dlqSql: String =
    """SELECT event_id, user_id, event_type,
      |  CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NULL THEN 'missing_payload_key'
      |       WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90 THEN 'out_of_range'
      |  END AS dlq_reason
      |FROM events
      |WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NULL
      |   OR TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90
      |ORDER BY event_id""".stripMargin

  // -- 10: merge/standard.go three-way merge -------------------------------
  def mergeConflicts(s: SparkSession, dir: String): DataFrame = {
    val wBefore = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val before = lag(col("value"), 1).over(wBefore)
    MergeOps.threeWayMerge(
        events(s, dir).withColumn("before_value", before),
        Seq("user_id"), Seq(col("ts"), col("event_id")),
        col("before_value"), col("value"),
        (target, _, proposed) => greatest(target, proposed))
      .select("event_id", "user_id", "event_type", "value", "before_value",
        "target_value", "merge_status", "resolved_value")
      .orderBy("event_id")
  }

  val mergeConflictsSql: String =
    """WITH t AS (
      |  SELECT event_id, user_id, event_type, value,
      |    lag(value) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS before_value,
      |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS target_value
      |  FROM events)
      |SELECT event_id, user_id, event_type, value, before_value, target_value,
      |  CASE WHEN target_value IS NULL OR target_value = before_value THEN 'clean'
      |       WHEN target_value = value THEN 'idempotent'
      |       ELSE 'conflict' END AS merge_status,
      |  -- resolved reuses the exact status CASE chain so three-valued
      |  -- NULL logic matches the engine's when().when().otherwise() chain
      |  CASE WHEN (CASE WHEN target_value IS NULL OR target_value = before_value THEN 'clean'
      |                  WHEN target_value = value THEN 'idempotent'
      |                  ELSE 'conflict' END) = 'conflict'
      |       THEN greatest(target_value, value) ELSE value END AS resolved_value
      |FROM t ORDER BY event_id""".stripMargin

  // -- 11: util/cdcjson payload extraction ---------------------------------
  def ndjsonExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  val ndjsonExtractSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // -- 12: schemawatch + applycfg schema mapping ---------------------------
  def schemaMap(s: SparkSession, dir: String): DataFrame =
    Apply.schemaMap(events(s, dir),
        renames = Seq("user_id" -> "uid"),
        exprs = Seq("total_cents" -> cents(col("value"))),
        ignore = Seq("value", "props", "ts"),
        extrasJson = Some(("extras", Seq("event_type"))))
      .orderBy("event_id")

  val schemaMapSql: String =
    """SELECT event_id, user_id AS uid,
      |  CAST(ROUND(value * 100, 0) AS BIGINT) AS total_cents,
      |  '{"event_type":"' || event_type || '"}' AS extras
      |FROM events ORDER BY event_id""".stripMargin

  // -- 13: script dispatch fan-out -----------------------------------------
  def fanOut(s: SparkSession, dir: String): DataFrame = {
    val route = when(col("event_type") === "purchase", "billing")
      .when(col("event_type") === "signup", "crm")
      .when(col("event_type") === "error", "dlq_route")
      .otherwise("telemetry")
    events(s, dir)
      .groupBy(route.as("route"))
      .agg(count(lit(1)).as("n"), count_distinct(col("user_id")).as("n_users"),
        sum(cents(col("value"))).as("cents"))
      .orderBy("route")
  }

  val fanOutSql: String =
    """SELECT CASE WHEN event_type = 'purchase' THEN 'billing'
      |            WHEN event_type = 'signup' THEN 'crm'
      |            WHEN event_type = 'error' THEN 'dlq_route'
      |            ELSE 'telemetry' END AS route,
      |  COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
      |  CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      |FROM events GROUP BY 1 ORDER BY route""".stripMargin

  // -- 14: sequencer/besteffort per-key progress ---------------------------
  def bestEffortOrder(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_muts"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        max_by(col("event_id"), ord).as("last_event_id"),
        sum(cents(col("value"))).as("cents"))
      .orderBy("user_id")

  val bestEffortOrderSql: String =
    """WITH last AS (
      |  SELECT user_id, event_id AS last_event_id FROM (
      |    SELECT user_id, event_id,
      |      row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events) WHERE rn = 1),
      |g AS (
      |  SELECT user_id, COUNT(*) AS n_muts, MIN(ts) AS first_ts, MAX(ts) AS last_ts,
      |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY user_id)
      |SELECT g.user_id, g.n_muts, g.first_ts, g.last_ts, last.last_event_id, g.cents
      |FROM g JOIN last USING (user_id) ORDER BY user_id""".stripMargin

  // -- 15: source/objstore changefeed files (rows-only) --------------------
  def changefeedFiles(s: SparkSession, dir: String): DataFrame = {
    val envelope = events(s, dir).select(
      when(col("event_type") === "error", lit(null).cast("string"))
        .otherwise(to_json(struct(col("event_id"), col("user_id"), col("value"))))
        .as("after"),
      to_json(array(col("user_id"))).as("key"),
      concat((unix_micros(col("ts").cast("timestamp")) * 1000).cast("string"), lit(".0000000000"))
        .as("updated"))
    val outDir = fixture(dir, "changefeed")(p =>
      envelope.write.mode("overwrite").json(p))
    Changefeed.read(s, outDir)
      .agg(count(lit(1)).as("n_muts"),
        sum(when(col("is_delete"), 1L).otherwise(0L)).as("n_deletes"),
        min(col("hlc.nanos")).as("min_nanos"),
        max(col("hlc.nanos")).as("max_nanos"))
  }

  /** Oracle for the ndjson round trip: the aggregate over parsed
    * changefeed files must equal the same aggregate computed directly
    * on events (deletes = the tombstone op; nanos = epoch µs × 1000).
    */
  val changefeedFilesSql: String =
    """SELECT COUNT(*) AS n_muts,
      |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
      |  MIN(epoch_us(ts) * 1000) AS min_nanos,
      |  MAX(epoch_us(ts) * 1000) AS max_nanos
      |FROM events""".stripMargin

  // -- 16: streaming latest-by-key (batch-equivalent path) -----------------
  def streamApply(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.product[StreamApply.KeyedMut]
    val muts = StreamApply.fromEvents(events(s, dir)).as[StreamApply.KeyedMut]
    StreamApply.applyBatch(muts).toDF()
      .select(col("key").as("user_id"), col("tiebreak").as("event_id"),
        col("op").as("event_type"), col("value"))
      .orderBy("user_id")
  }

  val streamApplySql: String =
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  // -- 18: cdcjson query-format payloads (webhook_query.go) ----------------
  def queryPayload(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    // emit flat rows with a __crdb__ metadata object, the query-format
    // wire shape, then parse them back through the schema'd reader
    val outDir = fixture(dir, "queryfmt")(p =>
      events(s, dir).select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        struct(concat((unix_micros(col("ts").cast("timestamp")) * 1000).cast("string"),
          lit(".0000000000")).as("updated")).as("__crdb__"))
        .write.mode("overwrite").json(p))
    val dataSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    Changefeed.readQueryFormat(s, outDir, dataSchema)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count_distinct(col("user_id")).as("n_users"),
        sum(cents(col("value"))).as("cents"),
        max(col("hlc.nanos")).as("max_nanos"))
      .orderBy("event_type")
  }

  val queryPayloadSql: String =
    """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
      |  CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents,
      |  MAX(epoch_us(ts) * 1000) AS max_nanos
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // -- 19: sequencer/core resolved rounds over a parent/child pair ---------
  /** Transactionally-consistent apply rounds (reference:
    * `internal/sequencer/core` advances per-table bounds in lockstep so
    * children never precede parents): bucket the orders→lineitem
    * workload into monthly resolved rounds and track cumulative applied
    * progress per table.
    */
  def coreRounds(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = graft.Tables.orders(s, dir).select("o_orderkey", "o_orderdate")
    val l = graft.Tables.lineitem(s, dir).select("l_orderkey")
    val rounds = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("round_start"))
      .agg(count_distinct(col("o_orderkey")).as("n_parents"),
        count(lit(1)).as("n_children"))
    // unpartitioned window is safe HERE: one row per DISTINCT MONTH
    // after the aggregate — the join + groupBy above carry the volume
    val w = Window.orderBy("round_start")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rounds
      .withColumn("applied_parents", sum(col("n_parents")).over(w))
      .withColumn("applied_children", sum(col("n_children")).over(w))
      .orderBy("round_start")
  }

  val coreRoundsSql: String =
    """WITH r AS (
      |  SELECT date_trunc('month', o.o_orderdate) AS round_start,
      |    COUNT(DISTINCT o.o_orderkey) AS n_parents,
      |    COUNT(*) AS n_children
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1)
      |SELECT round_start, n_parents, n_children,
      |  CAST(SUM(n_parents) OVER (ORDER BY round_start ROWS UNBOUNDED PRECEDING) AS BIGINT) AS applied_parents,
      |  CAST(SUM(n_children) OVER (ORDER BY round_start ROWS UNBOUNDED PRECEDING) AS BIGINT) AS applied_children
      |FROM r ORDER BY round_start""".stripMargin

  // -- 17w2: conveyor acceptance under runtime-selected modes ---------------
  /** One batch accepted through THREE conveyors whose configs force the
    * three modes (reference `internal/conveyor/conveyor.go:59` factory +
    * `:188` AcceptMultiBatch + `:256` modeSelector): the checkpoint
    * bootstraps from a proposal log covering the first 20 days
    * (partition = user_id % 4, group resolved = slowest partition's
    * frontier). Immediate ignores the checkpoint; best-effort applies
    * everything but marks state beyond the resolved frontier as
    * speculative; consistent gates the batch at the frontier before
    * reducing. One summary row per mode.
    */
  def conveyorModes(s: SparkSession, dir: String): DataFrame = {
    val m = events(s, dir).select(col("user_id"), col("event_id"),
      (unix_micros(col("ts").cast("timestamp")) * 1000).as("nanos"),
      pmod(col("user_id"), lit(4L)).as("part"))
    val cut = m.agg((min(col("nanos")) + lit(20L * 86400L * 1000000000L)).as("__cut"))
    val proposals = m.crossJoin(broadcast(cut))
      .filter(col("nanos") <= col("__cut"))
    val ord = struct(col("nanos"), col("event_id"))
    def run(cfg: Conveyor.Config, specCount: Boolean): DataFrame = {
      val conveyor = new Conveyor.Conveyors(cfg)
        .get("events", proposals, col("part"), col("nanos"), col("event_id"),
          nowUs = 0L)
      val spec =
        if (specCount) coalesce(sum(when(col("speculative"), 1L)), lit(0L))
        else lit(null).cast("long")
      conveyor.accept(m, Seq("user_id"), ord, col("nanos"))
        .agg(count(lit(1)).as("n_keys"), spec.as("n_speculative"),
          max(col("nanos")).as("max_nanos"))
        .select(lit(conveyor.mode.name).as("mode"),
          col("n_keys"), col("n_speculative"), col("max_nanos"))
    }
    run(Conveyor.Config(immediate = true), specCount = false)
      .unionByName(run(Conveyor.Config(bestEffortOnly = true), specCount = true))
      .unionByName(run(Conveyor.Config(), specCount = true)) // window 0 → consistent
      .orderBy("mode")
  }

  val conveyorModesSql: String =
    """WITH m AS (
      |  SELECT user_id, event_id, epoch_us(ts) * 1000 AS nanos,
      |    user_id % 4 AS part
      |  FROM events),
      |cut AS (SELECT MIN(nanos) + CAST(1728000000000000 AS BIGINT) AS c FROM m),
      |f AS (SELECT part, MAX(nanos) AS fr FROM m, cut WHERE nanos <= c GROUP BY part),
      |r AS (SELECT MIN(fr) AS resolved FROM f),
      |latest_all AS (
      |  SELECT user_id, nanos FROM (
      |    SELECT user_id, nanos, row_number() OVER (
      |      PARTITION BY user_id ORDER BY nanos DESC, event_id DESC) AS rn
      |    FROM m) WHERE rn = 1),
      |latest_cons AS (
      |  SELECT user_id, nanos FROM (
      |    SELECT m.user_id, m.nanos, row_number() OVER (
      |      PARTITION BY m.user_id ORDER BY m.nanos DESC, m.event_id DESC) AS rn
      |    FROM m, r WHERE m.nanos <= r.resolved) WHERE rn = 1)
      |SELECT 'best_effort' AS mode, COUNT(*) AS n_keys,
      |  CAST(SUM(CASE WHEN la.nanos > r.resolved THEN 1 ELSE 0 END) AS BIGINT) AS n_speculative,
      |  MAX(la.nanos) AS max_nanos
      |FROM latest_all la, r
      |UNION ALL
      |SELECT 'consistent', COUNT(*), CAST(0 AS BIGINT), MAX(nanos) FROM latest_cons
      |UNION ALL
      |SELECT 'immediate', COUNT(*), CAST(NULL AS BIGINT), MAX(nanos) FROM latest_all
      |ORDER BY mode""".stripMargin

  // -- 20: mylogical/pglogical transaction batches -------------------------
  /** Transaction-grouped apply (reference: `internal/source/mylogical` /
    * `pglogical` replay whole transactions in commit order). Events are
    * bucketed into per-user 10-minute transactions; each txn applies
    * atomically, ordered by its commit (last) timestamp.
    */
  def txnBatches(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("txn_id", expr("unix_micros(cast(ts as timestamp)) div 600000000"))
      .groupBy(col("user_id"), col("txn_id"))
      .agg(
        count(lit(1)).as("n_ops"),
        min(col("ts")).as("txn_start"),
        max(col("ts")).as("commit_ts"),
        sum(cents(col("value"))).as("net_cents"))
      .orderBy("user_id", "txn_id")

  val txnBatchesSql: String =
    """SELECT user_id, epoch_us(ts) // 600000000 AS txn_id,
      |  COUNT(*) AS n_ops, MIN(ts) AS txn_start, MAX(ts) AS commit_ts,
      |  CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS net_cents
      |FROM events GROUP BY 1, 2 ORDER BY user_id, txn_id""".stripMargin

  // -- 21: script userscript pipeline (filter/map/drop) --------------------
  def userscript(s: SparkSession, dir: String): DataFrame = {
    import graft.script.Transforms._
    val pipeline = Pipeline(
      Filter(col("value") >= 1.0),
      MapCols(
        "cents" -> cents(col("value")),
        "route" -> when(col("event_type") === "purchase", "billing")
          .otherwise("telemetry")),
      DropCols("props", "value", "ts"))
    pipeline(events(s, dir)).orderBy("event_id")
  }

  val userscriptSql: String =
    """SELECT event_id, user_id, event_type,
      |  CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
      |  CASE WHEN event_type = 'purchase' THEN 'billing'
      |       ELSE 'telemetry' END AS route
      |FROM events WHERE value >= 1.0 ORDER BY event_id""".stripMargin

  // -- 22: state as-of a resolved cursor -----------------------------------
  /** Time-travel materialization (reference: changefeeds resume from a
    * resolved cursor; the state as of cursor T is the apply of every
    * mutation with time ≤ T). A pure predicate + the same latest-by-key
    * reduce — at scale the predicate prunes time-partitioned files.
    */
  def stateAt(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val cursor = ev.agg((min(col("ts")) + expr("INTERVAL 10 DAY")).as("__cursor"))
    val upTo = ev.crossJoin(broadcast(cursor))
      .filter(col("ts") <= col("__cursor")).drop("__cursor")
    Msort.latestByKey(upTo, Seq("user_id"), ord).orderBy("user_id")
  }

  val stateAtSql: String =
    """SELECT event_id, ts, user_id, event_type, value, props FROM (
      |  SELECT e.*, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events e
      |  WHERE ts <= (SELECT MIN(ts) + INTERVAL 10 DAY FROM events)) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  // -- 23: target apply sink (partitioned table write + read-back) ---------
  /** The engine's sink: materialized state written as a partitioned
    * table (reference: `internal/target/apply` writes the target DB;
    * here the target is a partitioned parquet layout — the lakehouse
    * equivalent). Round-trips through disk and reports per-partition
    * counts, so the oracle checks the whole write→read path.
    */
  def applySink(s: SparkSession, dir: String): DataFrame = {
    val outDir = s"${sys.props("java.io.tmpdir")}/graft_sink_${fixtureTag(dir)}"
    val state = Msort.latestByKey(events(s, dir), Seq("user_id"), ord)
    state.write.mode("overwrite").partitionBy("event_type").parquet(outDir)
    s.read.parquet(outDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"), count_distinct(col("user_id")).as("n_keys"))
      .orderBy("event_type")
  }

  val applySinkSql: String =
    """SELECT event_type, COUNT(*) AS n_rows, COUNT(DISTINCT user_id) AS n_keys
      |FROM (
      |  SELECT e.*, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events e) t
      |WHERE rn = 1 GROUP BY event_type ORDER BY event_type""".stripMargin

  // -- 24: time-partitioned staging store (partition pruning) --------------
  /** The staging table at scale: mutations land in day-partitioned
    * files, so Retire / state-as-of / resolved-window reads touch only
    * the partitions inside the cursor range — the plan's
    * PartitionFilters prune everything else before any I/O. This query
    * builds the partitioned store once, then answers a 5-day window
    * from it.
    */
  def stagingPartitioned(s: SparkSession, dir: String): DataFrame = {
    val outDir = fixture(dir, "staging")(p =>
      events(s, dir).withColumn("day", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("day").parquet(p))
    val store = s.read.parquet(outDir)
    // the window is data-relative (min day + [4, 9)), never hardcoded —
    // regenerated testdata with a different time range must still hit.
    // min(day) is resolved driver-side from the PARTITION LISTING (no
    // file data is read — `day` exists only in directory names), so the
    // windowed read below keeps literal filters and static
    // PartitionFilters pruning, the point of this store layout.
    val minDay = store.agg(min(col("day"))).collect()(0).getDate(0)
      .toLocalDate
    def d(days: Long) = lit(java.sql.Date.valueOf(minDay.plusDays(days)))
    store
      .filter(col("day") >= d(4) && col("day") < d(9))
      .groupBy("day")
      .agg(count(lit(1)).as("n_muts"), count_distinct(col("user_id")).as("n_keys"))
      // timestamp, not date: parquet date32 reaches pandas as `object`
      // while the DuckDB oracle's DATE arrives as datetime64 — the
      // driver's dtype comparison needs both sides on timestamp
      .withColumn("day", col("day").cast("timestamp_ntz"))
      .orderBy("day")
  }

  val stagingPartitionedSql: String =
    """SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, COUNT(*) AS n_muts,
      |  COUNT(DISTINCT user_id) AS n_keys
      |FROM events
      |WHERE CAST(ts AS DATE) >= (SELECT MIN(CAST(ts AS DATE)) FROM events) + 4
      |  AND CAST(ts AS DATE) < (SELECT MIN(CAST(ts AS DATE)) FROM events) + 9
      |GROUP BY 1 ORDER BY day""".stripMargin

  // -- 17: util/workload generator + FK consistency check ------------------
  /** The oracle is the invariant: generation is deterministic with the
    * stated cardinalities, and every child's parent reference is
    * `hash mod nParents`, so the FK left-anti check must come back
    * empty. A nonzero orphan count (or a row-count drift) is exactly
    * the failure the reference's workload checker exists to catch.
    */
  def workloadCheck(s: SparkSession, dir: String): DataFrame =
    Workload.consistencyReport(s, 1000L, 10000L)

  val workloadCheckSql: String =
    """SELECT CAST(1000 AS BIGINT) AS n_parents,
      |  CAST(10000 AS BIGINT) AS n_children,
      |  CAST(0 AS BIGINT) AS n_orphans""".stripMargin

  // -- 25: source/kafka envelope + per-partition resolved frontier ----------
  /** Kafka-wire round trip (reference `internal/source/kafka/payload.go`
    * `asPayload` + `consumer.go`): events serialize into consumer-shaped
    * (topic, partition, offset, key, value) messages — mutations with
    * after/updated envelopes (deletes = null after), plus one resolved
    * message per (partition, day) at that day's start — then parse back
    * through [[Kafka]], advance each partition's frontier, and report
    * how much of the feed is applied below it.
    */
  def kafkaPayload(s: SparkSession, dir: String): DataFrame = {
    val outDir = fixture(dir, "kafka") { p =>
      val ev = events(s, dir)
      val nanosStr = (unix_micros(col("ts").cast("timestamp")) * 1000).cast("string")
      val muts = ev.select(
        lit("events").as("topic"),
        pmod(col("user_id"), lit(4L)).as("partition"),
        (unix_micros(col("ts").cast("timestamp")) * 1000).as("__ord"),
        col("event_id").as("__tie"),
        to_json(array(col("user_id"))).as("key"),
        to_json(struct(
          when(col("event_type") === "error", lit(null).cast("string"))
            .otherwise(to_json(struct(col("event_id"), col("user_id"), col("value"))))
            .as("after"),
          concat(nanosStr, lit(".0000000000")).as("updated"))).as("value"))
      val res = ev
        .select(pmod(col("user_id"), lit(4L)).as("partition"),
          (unix_micros(to_date(col("ts")).cast("timestamp")) * 1000).as("__day_nanos"))
        .distinct()
        .select(lit("events").as("topic"), col("partition"),
          col("__day_nanos").as("__ord"), lit(-1L).as("__tie"),
          lit(null).cast("string").as("key"),
          to_json(struct(concat(col("__day_nanos").cast("string"),
            lit(".0000000000")).as("resolved"))).as("value"))
      val w = Window.partitionBy("partition").orderBy("__ord", "__tie")
      muts.union(res)
        .withColumn("offset", row_number().over(w).cast("long"))
        .drop("__ord", "__tie")
        .write.mode("overwrite").json(p)
    }
    val raw = Kafka.read(s, outDir)
    // two passes over the wire log, no more: resolved messages are a
    // tiny fraction, so the frontier aggregate is cheap and broadcasts
    // into ONE conditional-aggregation pass over the mutations (counts,
    // deletes, and applied-below-frontier together) — separate
    // mstats/applied branches would scan a 100 TB topic archive thrice
    val frontier = Kafka.resolved(raw)
      .groupBy("partition")
      .agg(max(col("hlc.nanos")).as("frontier_nanos"),
        count(lit(1)).as("n_resolved"))
    Kafka.mutations(raw)
      .join(broadcast(frontier), Seq("partition"))
      .groupBy("partition")
      .agg(count(lit(1)).as("n_muts"),
        sum(when(col("is_delete"), 1L).otherwise(0L)).as("n_deletes"),
        first(col("frontier_nanos")).as("frontier_nanos"),
        first(col("n_resolved")).as("n_resolved"),
        sum(when(col("hlc.nanos") <= col("frontier_nanos"), 1L).otherwise(0L))
          .as("n_applied"))
      .orderBy("partition")
  }

  /** The oracle recomputes every envelope quantity straight from events:
    * partition = user_id mod 4, deletes = error ops, one resolved per
    * active day at day start, frontier = the partition's newest day.
    */
  val kafkaPayloadSql: String =
    """WITH m AS (
      |  SELECT user_id % 4 AS partition, event_type,
      |    epoch_us(ts) * 1000 AS nanos, CAST(ts AS DATE) AS day
      |  FROM events),
      |f AS (
      |  SELECT partition,
      |    epoch_us(CAST(MAX(day) AS TIMESTAMP)) * 1000 AS frontier_nanos,
      |    COUNT(DISTINCT day) AS n_resolved
      |  FROM m GROUP BY 1)
      |SELECT m.partition, COUNT(*) AS n_muts,
      |  CAST(SUM(CASE WHEN m.event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
      |  f.frontier_nanos, f.n_resolved,
      |  CAST(SUM(CASE WHEN m.nanos <= f.frontier_nanos THEN 1 ELSE 0 END) AS BIGINT) AS n_applied
      |FROM m JOIN f USING (partition)
      |GROUP BY m.partition, f.frontier_nanos, f.n_resolved
      |ORDER BY partition""".stripMargin

  // -- 26: mylogical/pglogical BEGIN/COMMIT wire-format parsing -------------
  /** Binlog-shaped transaction log (reference
    * `internal/source/mylogical/conn.go:135`): events frame into
    * BEGIN / ROW / COMMIT-or-ROLLBACK records with a global LSN order
    * (interleaved across transactions, as a real log is), then parse
    * back through [[TxnLog]]: only committed transactions produce
    * batches — xid % 17 == 0 transactions roll back and must vanish.
    */
  /** Shared binlog-shaped fixture (see [[txnLog]]) — also feeds the
    * GTID frontier query, so both parse the SAME log.
    */
  private def txnlogFixture(s: SparkSession, dir: String): String =
    fixture(dir, "txnlog") { p =>
      val ev = events(s, dir)
        .withColumn("__us", unix_micros(col("ts").cast("timestamp")))
        .withColumn("xid",
          col("user_id") * 100000000L + expr("unix_micros(cast(ts as timestamp)) div 600000000"))
      val rows = ev.select(lit("ROW").as("op"), col("xid"),
        col("user_id").as("key"),
        to_json(struct(col("event_id").as("e"), cents(col("value")).as("c"))).as("data"),
        col("__us").as("ts_us"), lit(1).as("__rk"), col("event_id").as("__tie"))
      val bounds = ev.groupBy("xid")
        .agg(min(col("__us")).as("__min_us"), max(col("__us")).as("__max_us"))
      val begins = bounds.select(lit("BEGIN").as("op"), col("xid"),
        lit(null).cast("long").as("key"), lit(null).cast("string").as("data"),
        col("__min_us").as("ts_us"), lit(0).as("__rk"), lit(-1L).as("__tie"))
      val ends = bounds.select(
        when(pmod(col("xid"), lit(17L)) === 0, "ROLLBACK").otherwise("COMMIT").as("op"),
        col("xid"), lit(null).cast("long").as("key"),
        lit(null).cast("string").as("data"),
        col("__max_us").as("ts_us"), lit(2).as("__rk"), lit(Long.MaxValue).as("__tie"))
      // the global LSN order is fixture construction, not the operator:
      // a real log arrives already ordered
      val w = Window.orderBy("ts_us", "__rk", "xid", "__tie")
      rows.union(begins).union(ends)
        .withColumn("lsn", row_number().over(w).cast("long"))
        .drop("__rk", "__tie")
        .write.mode("overwrite").json(p)
    }

  def txnLog(s: SparkSession, dir: String): DataFrame = {
    val outDir = txnlogFixture(s, dir)
    TxnLog.committedRows(TxnLog.read(s, outDir))
      .groupBy(
        expr("xid div 100000000").as("user_id"),
        pmod(col("xid"), lit(100000000L)).as("txn_id"))
      .agg(count(lit(1)).as("n_ops"),
        timestamp_micros(min(col("begin_us"))).as("txn_start"),
        timestamp_micros(max(col("commit_us"))).as("commit_ts"),
        sum(get_json_object(col("data"), "$.c").cast("long")).as("net_cents"))
      .orderBy("user_id", "txn_id")
  }

  val txnLogSql: String =
    """WITH t AS (
      |  SELECT user_id, epoch_us(ts) // 600000000 AS txn_id, ts,
      |    CAST(ROUND(value * 100, 0) AS BIGINT) AS c
      |  FROM events)
      |SELECT user_id, txn_id, COUNT(*) AS n_ops,
      |  MIN(ts) AS txn_start, MAX(ts) AS commit_ts,
      |  CAST(SUM(c) AS BIGINT) AS net_cents
      |FROM t
      |GROUP BY user_id, txn_id
      |HAVING (user_id * 100000000 + txn_id) % 17 <> 0
      |ORDER BY user_id, txn_id""".stripMargin

  // -- 26b: MySQL GTID-set frontier + resume --------------------------------
  /** GTID-set resume point (reference
    * `internal/source/mylogical/conn.go:149`): the first 15 days of the
    * txn log are applied; the frontier is each source's INTERVAL SET of
    * applied GNOs (rolled-back transactions leave holes, so intervals —
    * not one max — are what a restart must honor). The resumed phase
    * anti-joins the frontier: every committed transaction the intervals
    * don't cover is pending, nothing covered re-applies. Output per
    * source: the rendered `start-end:start-end` GTID set, interval and
    * txn counts, and the pending count — the oracle recomputes the
    * islands and the anti-join complement independently.
    */
  def gtidFrontier(s: SparkSession, dir: String): DataFrame = {
    val outDir = txnlogFixture(s, dir)
    val frames = TxnLog.read(s, outDir)
    // parse-once pin (r15 stage audit; the cdc_pipeline_e2e leaf-pin
    // rule's win side — narrow numerics, never text): without it the
    // committedTxns JSON parse re-ran once per consumer leg (gtidSet,
    // gtidResume, the pending rollup — 5 scans of the 26 MB log at
    // sf0.1). The pinned frame is 3 longs per committed transaction.
    val txns = graft.ops.Materialize.barrier(
      TxnLog.committedTxns(frames).select(
        expr("xid div 100000000").as("source"),
        pmod(col("xid"), lit(100000000L)).as("gno"),
        col("commit_us")))
    val cut = frames.agg(
      (min(col("ts_us")) + lit(15L * 86400L * 1000000L)).as("__cut"))
    val withCut = txns.crossJoin(broadcast(cut))
    val applied = withCut.filter(col("commit_us") <= col("__cut"))
    // the frontier feeds BOTH the rendered set and the resume anti-join
    // — pinned (a few interval rows), or the islands chain re-derives
    val frontier = graft.ops.Materialize.barrier(
      TxnLog.gtidFrontier(applied, "source", "gno"))
    val pending = TxnLog.gtidResume(withCut, frontier, "source", "gno")
      .groupBy("source").agg(count(lit(1)).as("n_pending"))
    TxnLog.gtidSet(frontier, "source")
      .join(pending, Seq("source"), "full_outer")
      .na.fill(0L, Seq("n_intervals", "n_applied", "n_pending"))
      .na.fill("", Seq("gtid_set"))
      .orderBy("source")
  }

  val gtidFrontierSql: String =
    """WITH t AS (
      |  SELECT user_id AS source, epoch_us(ts) // 600000000 AS gno,
      |    MAX(epoch_us(ts)) AS commit_us
      |  FROM events
      |  GROUP BY 1, 2
      |  HAVING (user_id * 100000000 + gno) % 17 <> 0),
      |cut AS (SELECT MIN(epoch_us(ts)) + CAST(1296000000000 AS BIGINT) AS c FROM events),
      |a AS (SELECT source, gno FROM t, cut WHERE commit_us <= c),
      |i AS (SELECT source, gno,
      |        gno - ROW_NUMBER() OVER (PARTITION BY source ORDER BY gno) AS grp
      |      FROM a),
      |iv AS (SELECT source, MIN(gno) AS s, MAX(gno) AS e, COUNT(*) AS n
      |       FROM i GROUP BY source, grp),
      |fs AS (SELECT source,
      |         string_agg(CAST(s AS VARCHAR) || '-' || CAST(e AS VARCHAR), ':' ORDER BY s) AS gtid_set,
      |         COUNT(*) AS n_intervals, CAST(SUM(n) AS BIGINT) AS n_applied
      |       FROM iv GROUP BY source),
      |p AS (SELECT source, COUNT(*) AS n_pending
      |      FROM t, cut WHERE commit_us > c GROUP BY source)
      |SELECT COALESCE(fs.source, p.source) AS source,
      |  COALESCE(gtid_set, '') AS gtid_set,
      |  COALESCE(n_intervals, CAST(0 AS BIGINT)) AS n_intervals,
      |  COALESCE(n_applied, CAST(0 AS BIGINT)) AS n_applied,
      |  COALESCE(n_pending, CAST(0 AS BIGINT)) AS n_pending
      |FROM fs FULL OUTER JOIN p ON fs.source = p.source
      |ORDER BY source""".stripMargin

  // -- 27: schemawatch drift between batches --------------------------------
  /** Schema drift (reference `internal/target/schemawatch/watcher.go:104`
    * `Refresh`): the first half of the feed arrives with the OLD schema
    * (event_id, user_id, value); the upstream then drops `value` and
    * adds (total_cents, route). [[SchemaWatch.evolve]] aligns both
    * batches onto the newest shape: old rows null-pad the new columns,
    * the dropped column vanishes.
    */
  def schemaDrift(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val cut = ev.agg((min(col("ts")) + expr("INTERVAL 15 DAY")).as("__cut"))
    val withCut = ev.crossJoin(broadcast(cut))
    val oldBatch = withCut.filter(col("ts") <= col("__cut"))
      .select("event_id", "user_id", "value")
    val newBatch = withCut.filter(col("ts") > col("__cut"))
      .select(col("event_id"), col("user_id"),
        cents(col("value")).as("total_cents"),
        when(col("event_type") === "purchase", "billing")
          .otherwise("telemetry").as("route"))
    SchemaWatch.evolve(Seq(oldBatch, newBatch)).orderBy("event_id")
  }

  val schemaDriftSql: String =
    """SELECT event_id, user_id,
      |  CASE WHEN ts > (SELECT MIN(ts) + INTERVAL 15 DAY FROM events)
      |       THEN CAST(ROUND(value * 100, 0) AS BIGINT) END AS total_cents,
      |  CASE WHEN ts > (SELECT MIN(ts) + INTERVAL 15 DAY FROM events)
      |       THEN (CASE WHEN event_type = 'purchase' THEN 'billing'
      |             ELSE 'telemetry' END) END AS route
      |FROM events ORDER BY event_id""".stripMargin

  // -- 28: merge conflicts routed to the DLQ --------------------------------
  /** The composition the reference wires in `merge/standard.go`: a
    * three-way merge with no fallback merger hands conflicted rows to
    * the DLQ. One Pipeline stage produces both branches; this query
    * returns the dead letters.
    */
  def mergeDlq(s: SparkSession, dir: String): DataFrame = {
    val wBefore = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val muts = events(s, dir).withColumn("before_value", lag(col("value"), 1).over(wBefore))
    graft.Pipeline(muts, keys = Seq("user_id"), order = ord)
      .mergeOrDlq(col("before_value"), col("value"))
      .deadLetters.get
      .select("event_id", "user_id", "event_type", "dlq_reason")
      .orderBy("event_id")
  }

  val mergeDlqSql: String =
    """WITH t AS (
      |  SELECT event_id, user_id, event_type, value,
      |    lag(value) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS before_value,
      |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS target_value
      |  FROM events)
      |SELECT event_id, user_id, event_type, 'merge_conflict' AS dlq_reason
      |FROM t
      |-- the CASE chain mirrors the engine's when().when().otherwise()
      |-- three-valued NULL fallthrough (a NULL condition falls to the
      |-- next branch, not out of the filter)
      |WHERE (CASE WHEN target_value IS NULL OR target_value = before_value THEN 'clean'
      |            WHEN target_value = value THEN 'idempotent'
      |            ELSE 'conflict' END) = 'conflict'
      |ORDER BY event_id""".stripMargin

  // -- 28c: DLQ replay after a config fix -----------------------------------
  /** Reference `internal/target/dlq`: dead letters are ordinary
    * mutations in a re-processable table — after the condemning config
    * is fixed an operator replays them into the target. Fixture: the
    * cdc_merge_dlq pipeline (three-way merge, conflicts dead-letter,
    * ok rows apply last-one-wins); the "fix" accepts each dead
    * letter's proposed value; [[graft.Pipeline.replayDlq]] folds them
    * back, idempotent via the event_id anti-join. The query returns
    * the SECOND replay's output — replaying an already-replayed DLQ
    * must be a no-op — so the oracle checks both convergence and
    * idempotence: the final state is exactly "latest event per user",
    * what a conflict-free apply would have produced directly.
    */
  def dlqReplay(s: SparkSession, dir: String): DataFrame = {
    val wBefore = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val muts = events(s, dir)
      .withColumn("before_value", lag(col("value"), 1).over(wBefore))
    val p = graft.Pipeline(muts, keys = Seq("user_id"), order = ord)
      .mergeOrDlq(col("before_value"), col("value"))
    val applied = p.latestByKey().state
      .drop("before_value", "target_value", "merge_status", "resolved_value")
    val dead = p.deadLetters.get.drop("before_value")
    def replay(state: DataFrame) = graft.Pipeline.replayDlq(
      dead, state, Seq("user_id"), ord, idCols = Seq("event_id"))(_.latestByKey())
    replay(replay(applied))
      .select("user_id", "event_id", "value")
      .orderBy("user_id")
  }

  val dlqReplaySql: String =
    """SELECT user_id, event_id, value FROM events
      |QUALIFY row_number() OVER (
      |  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
      |ORDER BY user_id""".stripMargin

  // -- 30: user-SUPPLIED script (JSON DSL of SQL expressions) ---------------
  /** The reference's extensibility story (`internal/script`: a goja VM
    * running user JS per mutation) re-expressed as runtime-compiled
    * user input: the script below is a plain STRING — filter, rewrite,
    * and dispatch logic all arrive as user-authored SQL expressions
    * parsed by Catalyst at plan time, so user logic still runs inside
    * whole-stage codegen.
    */
  def userscriptDsl(s: SparkSession, dir: String): DataFrame = {
    val script = graft.script.UserScript.compile(
      """{"stages": [
        |   {"op": "filter", "where": "event_type <> 'error'"},
        |   {"op": "map", "cols": {
        |      "cents": "cast(round(value * 100, 0) as bigint)",
        |      "big": "cents >= 5000"}},
        |   {"op": "drop", "cols": ["props", "value", "ts"]}],
        | "dispatch": {
        |   "routes": [{"name": "billing", "when": "event_type = 'purchase'"},
        |              {"name": "crm", "when": "event_type = 'signup'"}],
        |   "default": "telemetry"}}""".stripMargin)
    val routed = script.dispatch(events(s, dir))
    routed.toSeq.map { case (route, df) =>
      df.groupBy(lit(route).as("route"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
          sum(when(col("big"), 1L).otherwise(0L)).as("n_big"))
    }.reduce(_ unionByName _).orderBy("route")
  }

  val userscriptDslSql: String =
    """WITH t AS (
      |  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      |  FROM events WHERE event_type <> 'error'),
      |r AS (
      |  SELECT CASE WHEN event_type = 'purchase' THEN 'billing'
      |              WHEN event_type = 'signup' THEN 'crm'
      |              ELSE 'telemetry' END AS route, cents
      |  FROM t)
      |SELECT route, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents,
      |  CAST(SUM(CASE WHEN cents >= 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
      |FROM r GROUP BY route ORDER BY route""".stripMargin

  // -- 28b: userscript 1→N emission with key rewrite ------------------------
  /** Reference `internal/script/script.go:35` / `api.go`: a script map
    * may return MULTIPLE mutations, each free to retarget its key or
    * table. The user script below fans every purchase out to an order
    * row (original key) plus an audit copy (key rewritten into the
    * 1e6+ range), then dispatch routes the two emissions to different
    * tables — one input row lands in two routes under two keys.
    */
  def userscriptEmit(s: SparkSession, dir: String): DataFrame = {
    val script = graft.script.UserScript.compile(
      """{"stages": [
        |   {"op": "filter", "where": "event_type = 'purchase'"},
        |   {"op": "map", "cols": {"cents": "cast(round(value * 100, 0) as bigint)"}},
        |   {"op": "emit", "rows": "array(named_struct('user_id', user_id, 'kind', 'order'), named_struct('user_id', user_id + 1000000, 'kind', 'audit'))"}],
        | "dispatch": {
        |   "routes": [{"name": "orders", "when": "kind = 'order'"},
        |              {"name": "audit", "when": "kind = 'audit'"}]}}""".stripMargin)
    val routed = script.dispatch(events(s, dir))
    routed.toSeq.map { case (route, df) =>
      df.groupBy(lit(route).as("route"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_keys"),
          sum(col("cents")).as("cents"),
          min(col("user_id")).as("min_key"), max(col("user_id")).as("max_key"))
    }.reduce(_ unionByName _).orderBy("route")
  }

  val userscriptEmitSql: String =
    """WITH p AS (
      |  SELECT user_id, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |e AS (
      |  SELECT 'orders' AS route, user_id, cents FROM p
      |  UNION ALL
      |  SELECT 'audit' AS route, user_id + 1000000 AS user_id, cents FROM p)
      |SELECT route, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_keys,
      |  CAST(SUM(cents) AS BIGINT) AS cents,
      |  MIN(user_id) AS min_key, MAX(user_id) AS max_key
      |FROM e GROUP BY route ORDER BY route""".stripMargin

  // -- 28b2: userscript custom merge function -------------------------------
  /** Reference `internal/script/script.go:641` (bindMerge): a
    * user-provided merge function is a first-class alternative to
    * standard three-way merge — `api.standardMerge(fallback)` runs the
    * standard rules and hands remaining conflicts to user code. The
    * fixture: per user, the target table holds the latest EVEN event's
    * cents; the feed proposes the latest ODD event's cents with a
    * before-image that is STALE for every third user (their previous
    * odd value), so those rows conflict under standard rules. The user
    * script resolves conflicts for EVEN user ids with a
    * highest-value-wins expression over (target_v, proposed_v) and
    * declines (NULL) for odd user ids, whose rows fall to the `dlq`
    * fallback — custom resolution demonstrably beats standard
    * three-way (which would DLQ all conflicts), unresolvable still
    * dead-letters.
    */
  def userscriptMerge(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(col("user_id"), col("event_id"),
      (unix_micros(col("ts").cast("timestamp")) * 1000).as("nanos"),
      cents(col("value")).as("c"))
    val odd = ev.filter(pmod(col("event_id"), lit(2)) === 1)
    val even = ev.filter(pmod(col("event_id"), lit(2)) === 0)
    val tgt = even.groupBy("user_id")
      .agg(max_by(col("c"), struct(col("nanos"), col("event_id"))).as("target_c"))
    val wOdd = Window.partitionBy("user_id").orderBy("nanos", "event_id")
    val latest = odd
      .withColumn("prev_odd_c", lag(col("c"), 1).over(wOdd))
      .groupBy("user_id")
      .agg(max_by(struct(col("c"), col("prev_odd_c")),
        struct(col("nanos"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.c").as("proposed_c"),
        col("m.prev_odd_c").as("prev_odd_c"))
    val bags = latest.join(tgt, Seq("user_id"), "left")
      .withColumn("before_c",
        when(pmod(col("user_id"), lit(3)) === 0, col("prev_odd_c"))
          .otherwise(col("target_c")))
      .select(col("user_id"),
        when(col("before_c").isNotNull,
          map(lit("c"), col("before_c").cast("string"))).as("before_bag"),
        map(lit("c"), col("proposed_c").cast("string")).as("proposed_bag"),
        when(col("target_c").isNotNull,
          map(lit("c"), col("target_c").cast("string"))).as("target_bag"))
    val script = graft.script.UserScript.compile(
      """{"stages": [
        |  {"op": "merge",
        |   "before": "before_bag", "proposed": "proposed_bag", "target": "target_bag",
        |   "resolve": {"c": "case when user_id % 2 = 0 then cast(greatest(cast(target_v as bigint), cast(proposed_v as bigint)) as string) end"},
        |   "fallback": "dlq"}]}""".stripMargin)
    script(bags)
      .select(col("user_id"),
        try_element_at(col("target_bag"), lit("c")).as("target_c"),
        try_element_at(col("before_bag"), lit("c")).as("before_c"),
        try_element_at(col("proposed_bag"), lit("c")).as("proposed_c"),
        try_element_at(col("merged"), lit("c")).as("merged_c"),
        array_join(col("unmerged"), ",").as("unmerged"),
        col("is_dlq"))
      .orderBy("user_id")
  }

  /** Oracle: rebuild the bag decision table from events, then overlay
    * the user resolution (even users: GREATEST(target, proposed); odd
    * users: unresolved → DLQ) on exactly the standard-rule conflicts.
    */
  val userscriptMergeSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) * 1000 AS nanos,
      |    CAST(ROUND(value * 100) AS BIGINT) AS c
      |  FROM events),
      |tgt AS (
      |  SELECT user_id, c AS target_c FROM (
      |    SELECT user_id, c, ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY nanos DESC, event_id DESC) AS rn
      |    FROM e WHERE event_id % 2 = 0) WHERE rn = 1),
      |ob AS (
      |  SELECT user_id, event_id, nanos, c,
      |    LAG(c) OVER (PARTITION BY user_id ORDER BY nanos, event_id) AS prev_odd_c
      |  FROM e WHERE event_id % 2 = 1),
      |latest AS (
      |  SELECT user_id, c AS proposed, prev_odd_c FROM (
      |    SELECT ob.*, ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY nanos DESC, event_id DESC) AS rn
      |    FROM ob) WHERE rn = 1),
      |m AS (
      |  SELECT l.user_id, t.target_c,
      |    CASE WHEN l.user_id % 3 = 0 THEN l.prev_odd_c ELSE t.target_c END AS before_c,
      |    l.proposed,
      |    (t.user_id IS NULL) AS no_target
      |  FROM latest l LEFT JOIN tgt t USING (user_id)),
      |cls AS (
      |  SELECT user_id, target_c, before_c, proposed, no_target,
      |    CASE
      |      WHEN no_target THEN proposed
      |      WHEN before_c IS NOT NULL AND before_c = proposed THEN target_c
      |      WHEN target_c = proposed THEN proposed
      |      WHEN before_c IS NOT NULL AND target_c = before_c THEN proposed
      |      ELSE target_c END AS std_merged,
      |    (NOT no_target
      |      AND NOT (before_c IS NOT NULL AND before_c = proposed)
      |      AND NOT (target_c = proposed)
      |      AND NOT (before_c IS NOT NULL AND target_c = before_c)) AS conflict
      |  FROM m),
      |res AS (
      |  SELECT user_id, target_c, before_c, proposed,
      |    CASE WHEN conflict AND user_id % 2 = 0
      |         THEN GREATEST(target_c, proposed) ELSE std_merged END AS merged_c_num,
      |    (conflict AND user_id % 2 = 1) AS is_dlq
      |  FROM cls)
      |SELECT user_id,
      |  CAST(target_c AS VARCHAR) AS target_c,
      |  CAST(before_c AS VARCHAR) AS before_c,
      |  CAST(proposed AS VARCHAR) AS proposed_c,
      |  CAST(merged_c_num AS VARCHAR) AS merged_c,
      |  CASE WHEN is_dlq THEN 'c' ELSE '' END AS unmerged,
      |  is_dlq
      |FROM res ORDER BY user_id""".stripMargin

  // -- 28e: delete routing + single-level recursion -------------------------
  /** Reference `internal/script/loader.go:103-105`: `deletesTo` routes
    * tombstones independently of the upsert dispatch, and `recurse`
    * unwraps nested-source rows so they re-enter routing once. The
    * script below marks errors as deletes, recursively rewrites hot
    * clicks (value ≥ 100) into purchases — which then land in the
    * PLAIN `billing` route, proving re-entry — and splits tombstones
    * between a hot-delete table and the shared `telemetry` default, so
    * telemetry receives BOTH an upsert leg and a delete leg (the
    * union-of-legs path). All routing logic is user-authored SQL
    * strings compiled by Catalyst at plan time.
    */
  def userscriptDeletesTo(s: SparkSession, dir: String): DataFrame = {
    val script = graft.script.UserScript.compile(
      """{"stages": [
        |   {"op": "map", "cols": {
        |      "__op": "case when event_type = 'error' then 'd' else 'u' end",
        |      "cents": "cast(round(value * 100, 0) as bigint)"}}],
        | "recurse": [
        |   {"name": "wrapped_clicks", "when": "event_type = 'click' and value >= 100.0",
        |    "stages": [{"op": "map", "cols": {"event_type": "'purchase'", "recursed": "true"}}]}],
        | "deletesTo": {"when": "__op = 'd'",
        |   "routes": [{"name": "tombstones_hot", "when": "value >= 100.0"}],
        |   "default": "telemetry"},
        | "dispatch": {
        |   "routes": [{"name": "billing", "when": "event_type = 'purchase'"}],
        |   "default": "telemetry"}}""".stripMargin)
    val routed = script.dispatch(events(s, dir))
    routed.toSeq.map { case (route, df) =>
      df.groupBy(lit(route).as("route"))
        .agg(count(lit(1)).as("n"),
          sum(col("cents")).as("cents"),
          sum(when(col("__op") === "d", 1L).otherwise(0L)).as("n_del"),
          sum(when(col("recursed"), 1L).otherwise(0L)).as("n_rec"))
    }.reduce(_ unionByName _).orderBy("route")
  }

  val userscriptDeletesToSql: String =
    """WITH m AS (
      |  SELECT event_type, value,
      |    CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
      |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      |  FROM events),
      |x AS (
      |  -- recurse: hot clicks rewritten to purchases, re-enter routing
      |  SELECT CASE WHEN event_type = 'click' AND value >= 100.0
      |              THEN 'purchase' ELSE event_type END AS event_type,
      |    value, op, cents,
      |    (event_type = 'click' AND value >= 100.0) AS recursed
      |  FROM m),
      |r AS (
      |  -- deletes route through deletesTo; upserts through dispatch
      |  SELECT CASE WHEN op = 'd'
      |              THEN CASE WHEN value >= 100.0 THEN 'tombstones_hot' ELSE 'telemetry' END
      |              WHEN event_type = 'purchase' THEN 'billing'
      |              ELSE 'telemetry' END AS route,
      |    cents, op, recursed
      |  FROM x)
      |SELECT route, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents,
      |  CAST(SUM(CASE WHEN op = 'd' THEN 1 ELSE 0 END) AS BIGINT) AS n_del,
      |  CAST(SUM(CASE WHEN recursed THEN 1 ELSE 0 END) AS BIGINT) AS n_rec
      |FROM r GROUP BY route ORDER BY route""".stripMargin

  // -- 28f: userscript target-state lookup ----------------------------------
  /** Reference `internal/script/applier.go:49`: `api.getTX()` lets a
    * script's map function query the live target mid-flight. The DSL
    * analogue: the DRIVER binds named state frames at compile, and a
    * `lookup` stage left-joins them in — here the "target" is the
    * applied latest-by-key state built from even events, and the odd
    * events (the in-flight batch) enrich themselves with the target's
    * current cents to compute a delta and a first-write flag. Planned
    * as one equi-join — broadcast when the target is small — instead of
    * the reference's per-row SQL round trip.
    */
  def userscriptLookup(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).withColumn("cents", cents(col("value")))
    val target = Msort.latestByKey(
      ev.filter(pmod(col("event_id"), lit(2)) === 0), Seq("user_id"), ord)
    val script = graft.script.UserScript.compile(
      """{"stages": [
        |   {"op": "lookup", "table": "target",
        |    "on": {"user_id": "user_id"},
        |    "select": {"target_cents": "cents"}},
        |   {"op": "map", "cols": {
        |      "delta": "cents - coalesce(target_cents, 0)",
        |      "is_new_key": "target_cents is null"}}]}""".stripMargin,
      sides = Map("target" -> target))
    script(ev.filter(pmod(col("event_id"), lit(2)) === 1))
      .select("event_id", "user_id", "cents", "target_cents", "delta", "is_new_key")
      .orderBy("event_id")
  }

  val userscriptLookupSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, ts,
      |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      |  FROM events),
      |tgt AS (
      |  SELECT user_id, cents AS target_cents FROM (
      |    SELECT user_id, cents, ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM e WHERE event_id % 2 = 0) WHERE rn = 1)
      |SELECT o.event_id, o.user_id, o.cents, t.target_cents,
      |  o.cents - COALESCE(t.target_cents, 0) AS delta,
      |  t.target_cents IS NULL AS is_new_key
      |FROM e o LEFT JOIN tgt t USING (user_id)
      |WHERE o.event_id % 2 = 1
      |ORDER BY o.event_id""".stripMargin

  // -- 28c: per-route apply configurations ----------------------------------
  /** Reference `internal/util/applycfg/conf.go:52` + `internal/target/
    * apply`: dispatch hands each target table its OWN apply config. One
    * pipeline here fans out to two routes with different semantics —
    * `billing` (purchases) CASes on the value tuple (highest value
    * wins, not newest), `telemetry` (everything else) applies
    * latest-by-time under a 15-day deadline; both carry a cents
    * rewrite. Inexpressible in r2's single-config Pipeline.
    */
  def routeConfigs(s: SparkSession, dir: String): DataFrame = {
    val routes = Seq(
      "billing" -> (col("event_type") === "purchase"),
      "telemetry" -> (col("event_type") =!= "purchase"))
    val configs = Map(
      "billing" -> Apply.Config(
        casOrder = Some(struct(col("value"), col("ts"), col("event_id"))),
        exprs = Seq("cents" -> cents(col("value")))),
      "telemetry" -> Apply.Config(
        deadline = Some(("ts", "15 DAY")),
        exprs = Seq("cents" -> cents(col("value")))))
    graft.Pipeline(events(s, dir), Seq("user_id"), ord)
      .dispatchApplyEach(routes, configs)
      .toSeq.map { case (route, df) =>
        df.select(lit(route).as("route"), col("user_id"),
          col("event_id"), col("cents"))
      }
      .reduce(_ unionByName _)
      .orderBy("route", "user_id")
  }

  val routeConfigsSql: String =
    """WITH b AS (
      |  SELECT 'billing' AS route, user_id, event_id,
      |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM (
      |    SELECT e.*, ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY value DESC, ts DESC, event_id DESC) AS rn
      |    FROM events e WHERE event_type = 'purchase') WHERE rn = 1),
      |t AS (
      |  SELECT 'telemetry' AS route, user_id, event_id,
      |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM (
      |    SELECT e.*, ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM (SELECT * FROM events
      |          WHERE event_type <> 'purchase'
      |            AND ts >= (SELECT MAX(ts) FROM events WHERE event_type <> 'purchase')
      |                      - INTERVAL 15 DAY) e) WHERE rn = 1)
      |SELECT * FROM b UNION ALL SELECT * FROM t ORDER BY route, user_id""".stripMargin

  // -- 28d: objstore per-file resume ----------------------------------------
  /** Reference `internal/source/objstore`: a bucket feed tracks
    * PER-FILE applied progress so an interrupted backfill resumes from
    * the first un-applied object instead of re-reading the bucket. The
    * fixture writes the changefeed as 8 file partitions (file_no =
    * user_id % 8 — the bucket objects). Phase 1 ingests objects 0–3 and
    * records the per-file frontier (max applied HLC + count); the
    * resumed phase anti-joins that frontier, so only objects 4–7 are
    * parsed and applied. Output = the frontier after each phase.
    */
  def changefeedResume(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val outDir = fixture(dir, "cfresume") { p =>
      events(s, dir).select(
        to_json(array(col("user_id"))).as("key"),
        to_json(struct(col("event_id"), col("value"))).as("after"),
        concat((unix_micros(col("ts").cast("timestamp")) * 1000).cast("string"),
          lit(".0000000000")).as("updated"),
        pmod(col("user_id"), lit(8L)).as("file_no"))
        .write.partitionBy("file_no").mode("overwrite").json(p)
    }
    val full = StructType(
      Changefeed.envelopeSchema.fields.toSeq :+ StructField("file_no", LongType))
    val muts = s.read.schema(full).json(outDir)
      .select(col("file_no"), col("key"),
        Changefeed.parseHlc("updated").as("hlc"))
    val phase1 = muts.filter(col("file_no") <= 3)
    val frontier = Changefeed.fileFrontier(phase1, "file_no")
    val resumed = Changefeed.resumeFrom(muts, frontier, "file_no")
    frontier.withColumn("phase", lit("applied"))
      .unionByName(
        Changefeed.fileFrontier(resumed, "file_no").withColumn("phase", lit("resumed")))
      .select("phase", "file_no", "applied_nanos", "n_muts")
      .orderBy("phase", "file_no")
  }

  val changefeedResumeSql: String =
    """WITH m AS (
      |  SELECT user_id % 8 AS file_no, epoch_us(ts) * 1000 AS nanos
      |  FROM events)
      |SELECT 'applied' AS phase, file_no, MAX(nanos) AS applied_nanos,
      |  COUNT(*) AS n_muts
      |FROM m WHERE file_no <= 3 GROUP BY file_no
      |UNION ALL
      |SELECT 'resumed' AS phase, file_no, MAX(nanos) AS applied_nanos,
      |  COUNT(*) AS n_muts
      |FROM m WHERE file_no > 3 GROUP BY file_no
      |ORDER BY phase, file_no""".stripMargin

  // -- 28d2: objstore .RESOLVED frontier markers ----------------------------
  /** Cloud-storage changefeed buckets interleave `<ts>.RESOLVED` marker
    * files with data objects (reference `internal/source/objstore/
    * conn.go:41`, :96-99): in lexicographic name order, a marker means
    * everything before it is finalized; files past the LAST marker must
    * wait for the next one, and marker bodies (`{"resolved":...}`) are
    * never mutations. The fixture writes the changefeed as 8 bucket
    * dirs (`part=d0`..`part=d7`, bucket = user_id % 8) plus two markers:
    * one at the end of d2 and one at the end of d4 — so exactly buckets
    * 0–4 are finalized, the d4 marker (the later name) wins, and the
    * d2 marker proves "latest marker" selection rather than "any
    * marker". The check: aggregates over `Changefeed.read` must equal
    * the same aggregates DuckDB computes over buckets 0–4 only, marker
    * files contribute ZERO mutation rows (no phantom all-null deletes),
    * and the frontier column comes from the d4 marker's body.
    */
  def objstoreResolved(s: SparkSession, dir: String): DataFrame = {
    val outDir = fixture(dir, "objstore") { p =>
      val env = events(s, dir).select(
        to_json(array(col("user_id"))).as("key"),
        when(col("event_type") === "error", lit(null).cast("string"))
          .otherwise(to_json(struct(col("event_id"), cents(col("value")).as("c"))))
          .as("after"),
        concat((unix_micros(col("ts").cast("timestamp")) * 1000).cast("string"),
          lit(".0000000000")).as("updated"),
        concat(lit("d"), pmod(col("user_id"), lit(8L))).as("part"))
      env.write.partitionBy("part").mode("overwrite").json(p)
      // marker bodies carry the max HLC of their finalized prefix, as a
      // changefeed sink would; names sort after the bucket's part-files
      def frontierNanos(maxBucket: Int): Long = {
        val ds = events(s, dir)
          .filter(pmod(col("user_id"), lit(8L)) <= maxBucket)
          .agg(max(unix_micros(col("ts").cast("timestamp")) * 1000))
        ds.collect()(0).getLong(0) // fixture-build only, 1-row control read
      }
      def writeMarker(bucket: Int, nanos: Long): Unit = {
        val f = new java.io.File(s"$p/part=d$bucket", s"zzz$nanos.RESOLVED")
        val w = new java.io.PrintWriter(f, "UTF-8")
        try w.print(s"""{"resolved":"$nanos.0000000000"}""") finally w.close()
      }
      writeMarker(2, frontierNanos(2))
      writeMarker(4, frontierNanos(4))
    }
    val muts = Changefeed.read(s, outDir) // listing gate: buckets 0-4 only
    val markerAgg = Changefeed.resolvedMarkers(s, outDir)
      .agg(count(lit(1)).as("n_markers"),
        max(col("hlc.nanos")).as("frontier_nanos"))
    muts.agg(
      count(lit(1)).as("n_muts"),
      sum(when(col("is_delete"), 1L).otherwise(0L)).as("n_deletes"),
      sum(get_json_object(col("data"), "$.c").cast("long")).as("c_sum"),
      max(col("hlc.nanos")).as("max_nanos"))
      .crossJoin(broadcast(markerAgg)) // 1-row × 1-row
  }

  val objstoreResolvedSql: String =
    """WITH m AS (
      |  SELECT user_id % 8 AS b, event_type,
      |    CAST(ROUND(value * 100, 0) AS BIGINT) AS c,
      |    epoch_us(ts) * 1000 AS nanos
      |  FROM events),
      |fin AS (SELECT * FROM m WHERE b <= 4)
      |SELECT COUNT(*) AS n_muts,
      |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
      |  CAST(SUM(CASE WHEN event_type <> 'error' THEN c END) AS BIGINT) AS c_sum,
      |  MAX(nanos) AS max_nanos,
      |  CAST(2 AS BIGINT) AS n_markers,
      |  (SELECT MAX(nanos) FROM fin) AS frontier_nanos
      |FROM fin""".stripMargin

  // -- 28e: pglogical relation descriptors + positional tuples --------------
  /** Reference `internal/source/pglogical/conn.go`: RELATION messages
    * declare each relation id's column layout (re-sent on schema
    * change), data tuples are POSITIONAL and resolve against the most
    * recent descriptor. The fixture declares three relations up front,
    * re-declares `tbl_0` mid-stream with an extra column (rows after
    * the upgrade carry 3-value tuples), and routes error events to an
    * undeclared relation id — those must flag `unknown_relation`, not
    * abort. Resolution is the AsOf operator; no driver-side relations
    * map.
    */
  def pglogicalFrames(s: SparkSession, dir: String): DataFrame = {
    val outDir = fixture(dir, "pglogical") { p =>
      val ev = events(s, dir)
      val nDf = ev.agg(count(lit(1)).as("__n"))
      val w = Window.orderBy("ts", "event_id") // fixture-only global sort
      val base = ev.crossJoin(broadcast(nDf))
        .withColumn("rn", row_number().over(w).cast("long"))
      val upgraded = pmod(col("user_id"), lit(3L)) === 0 &&
        col("rn") > (col("__n") / 2).cast("long")
      val rows = base.select(
        (col("rn") * 10).as("lsn"),
        when(col("event_type") === "error", "DELETE").otherwise("INSERT").as("op"),
        when(col("event_type") === "error", lit(99L))
          .otherwise(pmod(col("user_id"), lit(3L))).as("rel_id"),
        lit(null).cast("string").as("rel_name"),
        lit(null).cast("string").as("cols"),
        when(upgraded,
          to_json(array(col("event_id").cast("string"),
            cents(col("value")).cast("string"), lit("1"))))
          .otherwise(to_json(array(col("event_id").cast("string"),
            cents(col("value")).cast("string")))).as("tuple"))
      val rels = s.range(3).select(
        (col("id") + 1).as("lsn"), lit("RELATION").as("op"),
        col("id").as("rel_id"),
        concat(lit("tbl_"), col("id")).as("rel_name"),
        lit("e,c").as("cols"), lit(null).cast("string").as("tuple"))
      val upgrade = nDf.select(
        ((col("__n") / 2).cast("long") * 10 + 1).as("lsn"),
        lit("RELATION").as("op"), lit(0L).as("rel_id"),
        lit("tbl_0").as("rel_name"), lit("e,c,f").as("cols"),
        lit(null).cast("string").as("tuple"))
      rows.unionByName(rels).unionByName(upgrade)
        .write.mode("overwrite").json(p)
    }
    PgLogical.resolve(PgLogical.read(s, outDir))
      .groupBy(
        coalesce(col("rel_name"), lit("(unknown)")).as("rel_name"),
        when(col("unknown_relation"), lit(0L))
          .otherwise(size(col("col_names")).cast("long")).as("n_cols"))
      .agg(count(lit(1)).as("n_rows"),
        sum(element_at(col("row_data"), "c").cast("long")).as("c_sum"))
      .orderBy("rel_name", "n_cols")
  }

  val pglogicalFramesSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS c,
      |    ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
      |    COUNT(*) OVER () AS n
      |  FROM events),
      |cls AS (
      |  SELECT
      |    CASE WHEN event_type = 'error' THEN '(unknown)'
      |         ELSE 'tbl_' || CAST(user_id % 3 AS VARCHAR) END AS rel_name,
      |    CAST(CASE WHEN event_type = 'error' THEN 0
      |         WHEN user_id % 3 = 0 AND rn > n // 2 THEN 3
      |         ELSE 2 END AS BIGINT) AS n_cols,
      |    CASE WHEN event_type <> 'error' THEN c END AS c
      |  FROM e)
      |SELECT rel_name, n_cols, COUNT(*) AS n_rows,
      |  CAST(SUM(c) AS BIGINT) AS c_sum
      |FROM cls GROUP BY rel_name, n_cols ORDER BY rel_name, n_cols""".stripMargin

  // -- 28f: bin-bucketed range join -----------------------------------------
  /** Point-in-interval range join (the custom-operator list's range
    * join): which campaign window does each event fall into? Twelve
    * deterministic 3-day windows spaced a week apart from the corpus
    * min timestamp; naive SQL plans this as a nested-loop join — the
    * [[graft.ops.RangeJoin]] operator bins both sides (one equi-join
    * shuffle) and filters exactly.
    */
  def rangeJoinCampaigns(s: SparkSession, dir: String): DataFrame = {
    val day = 86400L * 1000000000L
    val ev = events(s, dir).select(col("user_id"),
      (unix_micros(col("ts").cast("timestamp")) * 1000).as("nanos"),
      cents(col("value")).as("c"))
    val lo = ev.agg(min(col("nanos")).as("lo"))
    val campaigns = s.range(12).crossJoin(broadcast(lo)).select(
      col("id").as("campaign_id"),
      (col("lo") + col("id") * (7L * day)).as("start_n"),
      (col("lo") + col("id") * (7L * day) + 3L * day).as("end_n"))
    RangeJoin.pointInInterval(ev, "nanos", campaigns, "start_n", "end_n",
        binWidth = 3L * day)
      .groupBy("campaign_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("c")).as("cents"))
      .orderBy("campaign_id")
  }

  val rangeJoinCampaignsSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) * 1000 AS nanos,
      |    CAST(ROUND(value * 100, 0) AS BIGINT) AS c
      |  FROM events),
      |c AS (
      |  SELECT i AS campaign_id,
      |    (SELECT MIN(nanos) FROM e) + i * 604800000000000 AS start_n,
      |    (SELECT MIN(nanos) FROM e) + i * 604800000000000 + 259200000000000 AS end_n
      |  FROM (SELECT unnest(generate_series(0, 11)) AS i))
      |SELECT campaign_id, COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users, CAST(SUM(c) AS BIGINT) AS cents
      |FROM e JOIN c ON e.nanos >= c.start_n AND e.nanos < c.end_n
      |GROUP BY campaign_id ORDER BY campaign_id""".stripMargin

  // -- 29: checkpoint frontier with Advance semantics -----------------------
  /** Reference `internal/staging/checkpoint/group.go:121`: per-partition
    * monotone frontier (regressions rejected), group resolved = the
    * minimum frontier across partitions.
    */
  def checkpointFrontier(s: SparkSession, dir: String): DataFrame = {
    val proposals = events(s, dir).select(
      pmod(col("user_id"), lit(4L)).as("p"),
      (unix_micros(col("ts").cast("timestamp")) * 1000).as("nanos"),
      col("event_id").as("arrival"))
    // the group minimum rides an unpartitioned window over the already
    // tiny per-partition aggregate (a handful of rows) — one plan, one
    // events scan, no cache entry left behind in the session
    val frontiers = Checkpoint.advance(proposals, col("p"), col("nanos"), col("arrival"))
    frontiers
      .withColumn("resolved_nanos",
        min(col("frontier_nanos")).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .orderBy("partition")
  }

  val checkpointFrontierSql: String =
    """WITH p AS (
      |  SELECT user_id % 4 AS partition, epoch_us(ts) * 1000 AS nanos,
      |    event_id AS arrival
      |  FROM events),
      |t AS (
      |  SELECT partition, nanos,
      |    CASE WHEN nanos < MAX(nanos) OVER (PARTITION BY partition ORDER BY arrival
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |         THEN 1 ELSE 0 END AS rej
      |  FROM p),
      |f AS (
      |  SELECT partition, MAX(nanos) AS frontier_nanos, COUNT(*) AS n_proposals,
      |    CAST(SUM(rej) AS BIGINT) AS n_rejected
      |  FROM t GROUP BY 1)
      |SELECT partition, frontier_nanos, n_proposals, n_rejected,
      |  (SELECT MIN(frontier_nanos) FROM f) AS resolved_nanos
      |FROM f ORDER BY partition""".stripMargin

  // -- 31: temporal as-of join ----------------------------------------------
  /** For every purchase, the user's most recent signup at or before it
    * (attribution-style lookup). Spark lacks a native ASOF JOIN; the
    * [[graft.ops.AsOf]] operator does it in one shuffle + one window
    * pass (never the |L|·|R| range-join explosion). The right side is
    * deduped on (user, ts) first — msort.UniqueByTimeKey semantics —
    * so the as-of pick is unambiguous on both engines. The oracle uses
    * DuckDB's native ASOF LEFT JOIN.
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame =
    asofJoinMode(s, dir, graft.ops.AsOf.DefaultGiantKeyThreshold)

  /** Forced scale mode (threshold 0 ⇒ every key is "giant") — held to
    * the SAME DuckDB ASOF LEFT JOIN oracle as [[asofJoin]], the
    * row-87/88 precedent: the driver gate itself proves the
    * range-partitioned carry ([[graft.ops.Buckets.lastValueByRange]])
    * ≡ the key-windowed carry, ties, exact-time matches and no-match
    * NULLs included.
    */
  def asofJoinRanged(s: SparkSession, dir: String): DataFrame =
    asofJoinMode(s, dir, 0L)

  /** The optional-counts seam ([[graft.ops.AsOf.giantKeys]]): the
    * caller hands the join a per-key skew profile it ALREADY HOLDS —
    * in deployment, the [[graft.ops.AsOf.giantKeys]] read carried
    * over from the previous batch of the same feed (a resolver loops
    * over batches of ONE keyspace; the profile changes slowly, the
    * read amortizes to ~zero) — so the per-call control read (a full
    * aggregation pass over the tagged union, the r13-measured
    * 0.40 → 0.70 s tax on `cdc_asof_join`) vanishes from the plan
    * entirely. Here the cached profile is "no giant keys", which is
    * what giantKeys computes on this corpus (no user approaches the
    * 2^20-row threshold; asserted byte-for-byte in LastValueSpec).
    * SAFETY is the point being proven, not assumed: the profile only
    * picks the carry PLAN — both paths are bit-identical — so this
    * row shares `cdc_asof_join`'s DuckDB ASOF oracle and the driver
    * gate itself certifies that a supplied (even stale) profile can
    * never change the answer. The bench row's delta vs
    * `cdc_asof_join` IS the reclaimed control-read tax.
    */
  def asofJoinPrecounted(s: SparkSession, dir: String): DataFrame =
    asofJoinMode(s, dir, graft.ops.AsOf.DefaultGiantKeyThreshold,
      cachedProfile = Some((Seq.empty[Any], false)))

  private def asofJoinMode(s: SparkSession, dir: String,
      giantKeyThreshold: Long,
      cachedProfile: Option[(Seq[Any], Boolean)] = None): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), cents(col("value")).as("cents"))
    val signups = Msort.uniqueByTimeKey(
        ev.filter(col("event_type") === "signup"), Seq("user_id"), "ts", col("event_id"))
      .select(col("user_id"), col("ts"),
        col("event_id").as("signup_event_id"), col("ts").as("signup_ts"))
    graft.ops.AsOf.asOfJoin(purchases, signups, "user_id",
        leftTime = "ts", rightTime = "ts", rightTiebreak = col("signup_event_id"),
        valueCols = Seq("signup_event_id", "signup_ts"),
        giantKeyThreshold = giantKeyThreshold, knownGiants = cachedProfile)
      .orderBy("event_id")
  }

  val asofJoinSql: String =
    """WITH p AS (
      |  SELECT user_id, event_id, ts, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |sg AS (
      |  SELECT user_id, event_id AS signup_event_id, ts AS signup_ts FROM (
      |    SELECT user_id, event_id, ts,
      |      row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      |    FROM events WHERE event_type = 'signup') WHERE rn = 1)
      |SELECT p.user_id, p.event_id, p.ts, p.cents, sg.signup_event_id, sg.signup_ts
      |FROM p ASOF LEFT JOIN sg
      |  ON p.user_id = sg.user_id AND p.ts >= sg.signup_ts
      |ORDER BY p.event_id""".stripMargin

  // -- 32: incremental apply across resolved windows ------------------------
  /** The reference's actual apply loop: each resolved window's
    * mutations fold into the accumulated state (`state' =
    * latestByKey(state ∪ batch)`), and the invariant that makes
    * checkpoint-resumable replication sound is that the fold equals the
    * one-shot reduce over everything. This query RUNS the three-window
    * fold; its oracle is the one-shot answer — equality is the
    * invariant, machine-checked. Each fold step stays one shuffle
    * (state is already key-reduced, so the union re-reduces cheaply).
    */
  def incrementalApply(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val cut = ev.agg(
      (min(col("ts")) + expr("INTERVAL 10 DAY")).as("__c1"),
      (min(col("ts")) + expr("INTERVAL 20 DAY")).as("__c2"))
    val tagged = ev.crossJoin(broadcast(cut))
    val windows = Seq(
      tagged.filter(col("ts") <= col("__c1")),
      tagged.filter(col("ts") > col("__c1") && col("ts") <= col("__c2")),
      tagged.filter(col("ts") > col("__c2")))
      .map(_.drop("__c1", "__c2"))
    val finalState = windows.foldLeft(Option.empty[DataFrame]) {
      case (None, batch) => Some(Msort.latestByKey(batch, Seq("user_id"), ord))
      case (Some(state), batch) =>
        Some(Msort.latestByKey(state.unionByName(batch), Seq("user_id"), ord))
    }.get
    finalState.orderBy("user_id")
  }

  /** One-shot reduce — the fold must land exactly here. */
  val incrementalApplySql: String = latestByKeySql

  // -- 34: wire before-images drive the three-way merge ---------------------
  /** Reference `internal/types/types.go:132` (`Mutation.Before`) +
    * `internal/util/merge/standard.go`: a changefeed with diff enabled
    * carries each mutation's BEFORE image, and the merge uses it — not
    * a reconstruction — as the common ancestor against the live target
    * row. The fixture serializes diff envelopes (`before`/`after`/
    * `updated`) onto the Kafka wire; odd events are the incoming feed
    * (msort'ed to the latest per key), even events materialize the
    * target table. Every third user's feed carries a STALE before
    * (its previous odd value — the classic skipped-intermediate
    * situation), so `before ≠ target` and the bag-level merge must
    * flag the conflicting property and route the row to the DLQ;
    * everyone else's before matches the target and applies cleanly.
    * The merge base is `mergeBags(wire before, proposed, target)` —
    * no lag() anywhere in the apply path.
    */
  def mergeWireBefore(s: SparkSession, dir: String): DataFrame = {
    val outDir = fixture(dir, "wirebefore") { p =>
      val ev = events(s, dir).select(col("user_id"), col("event_id"),
        (unix_micros(col("ts").cast("timestamp")) * 1000).as("nanos"),
        cents(col("value")).as("c"))
      val odd = ev.filter(pmod(col("event_id"), lit(2)) === 1)
      val even = ev.filter(pmod(col("event_id"), lit(2)) === 0)
      val tgt = even.groupBy("user_id")
        .agg(max_by(col("c"), struct(col("nanos"), col("event_id"))).as("target_c"))
      val wOdd = Window.partitionBy("user_id").orderBy("nanos", "event_id")
      odd
        .withColumn("prev_odd_c", lag(col("c"), 1).over(wOdd))
        .join(tgt, Seq("user_id"), "left")
        .withColumn("before_c",
          when(pmod(col("user_id"), lit(3)) === 0, col("prev_odd_c"))
            .otherwise(col("target_c")))
        .select(
          lit("merge").as("topic"),
          pmod(col("user_id"), lit(4L)).as("partition"),
          col("event_id").as("offset"),
          to_json(array(col("user_id"))).as("key"),
          to_json(struct(
            when(col("before_c").isNotNull,
              to_json(struct(col("before_c").as("c"), col("user_id").as("u"))))
              .as("before"),
            to_json(struct(col("c").as("c"), col("user_id").as("u"))).as("after"),
            concat(col("nanos").cast("string"), lit(".0000000000")).as("updated")))
            .as("value"))
        .write.mode("overwrite").json(p)
    }
    val bag = "map<string,string>"
    val muts = Kafka.mutations(Kafka.read(s, outDir)).select(
      get_json_object(col("key"), "$[0]").cast("long").as("user_id"),
      from_json(col("before"), bag, Map.empty[String, String]).as("before_bag"),
      from_json(col("data"), bag, Map.empty[String, String]).as("proposed_bag"),
      col("hlc.nanos").as("nanos"), col("offset"))
    // msort: one surviving mutation per key (hlc order, offset tiebreak)
    val latest = muts.groupBy("user_id")
      .agg(max_by(struct(col("before_bag"), col("proposed_bag")),
        struct(col("nanos"), col("offset"))).as("m"))
      .select(col("user_id"),
        col("m.before_bag").as("before_bag"), col("m.proposed_bag").as("proposed_bag"))
    // the live target table as bags (the same shape Apply materializes)
    val target = events(s, dir)
      .filter(pmod(col("event_id"), lit(2)) === 0)
      .select(col("user_id"),
        (unix_micros(col("ts").cast("timestamp")) * 1000).as("nanos"),
        col("event_id"), cents(col("value")).as("c"))
      .groupBy("user_id")
      .agg(max_by(col("c"), struct(col("nanos"), col("event_id"))).as("target_c"))
      .select(col("user_id"), map(
        lit("c"), col("target_c").cast("string"),
        lit("u"), col("user_id").cast("string")).as("target_bag"))
    latest.join(target, Seq("user_id"), "left")
      .withColumn("mg", MergeOps.mergeBags(
        col("before_bag"), col("proposed_bag"), col("target_bag")))
      .select(col("user_id"),
        element_at(col("target_bag"), "c").as("target_c"),
        element_at(col("before_bag"), "c").as("before_c"),
        element_at(col("proposed_bag"), "c").as("proposed_c"),
        element_at(col("mg.merged"), "c").as("merged_c"),
        element_at(col("mg.merged"), "u").as("merged_u"),
        array_join(col("mg.unmerged"), ",").as("unmerged"),
        (size(col("mg.unmerged")) > 0).as("is_dlq"))
      .orderBy("user_id")
  }

  /** The oracle rebuilds the diff envelopes and the bag-merge decision
    * table per property straight from events: before = previous odd
    * value for user_id % 3 = 0 (stale) else the target value; property
    * `c` classifies unchanged/idempotent/safe/conflict exactly as
    * merge/standard.go, property `u` never changes.
    */
  val mergeWireBeforeSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) * 1000 AS nanos,
      |    CAST(ROUND(value * 100) AS BIGINT) AS c
      |  FROM events),
      |tgt AS (
      |  SELECT user_id, c AS target_c FROM (
      |    SELECT user_id, c, ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY nanos DESC, event_id DESC) AS rn
      |    FROM e WHERE event_id % 2 = 0) WHERE rn = 1),
      |ob AS (
      |  SELECT user_id, event_id, nanos, c,
      |    LAG(c) OVER (PARTITION BY user_id ORDER BY nanos, event_id) AS prev_odd_c
      |  FROM e WHERE event_id % 2 = 1),
      |latest AS (
      |  SELECT user_id, c AS proposed, prev_odd_c FROM (
      |    SELECT ob.*, ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY nanos DESC, event_id DESC) AS rn
      |    FROM ob) WHERE rn = 1),
      |m AS (
      |  SELECT l.user_id, t.target_c,
      |    CASE WHEN l.user_id % 3 = 0 THEN l.prev_odd_c ELSE t.target_c END AS before_c,
      |    l.proposed,
      |    (t.user_id IS NULL) AS no_target
      |  FROM latest l LEFT JOIN tgt t USING (user_id)),
      |cls AS (
      |  SELECT user_id, target_c, before_c, proposed, no_target,
      |    CASE
      |      WHEN no_target THEN proposed
      |      WHEN before_c IS NOT NULL AND before_c = proposed THEN target_c
      |      WHEN target_c = proposed THEN proposed
      |      WHEN before_c IS NOT NULL AND target_c = before_c THEN proposed
      |      ELSE target_c END AS merged_c_num,
      |    (NOT no_target
      |      AND NOT (before_c IS NOT NULL AND before_c = proposed)
      |      AND NOT (target_c = proposed)
      |      AND NOT (before_c IS NOT NULL AND target_c = before_c)) AS conflict
      |  FROM m)
      |SELECT user_id,
      |  CAST(target_c AS VARCHAR) AS target_c,
      |  CAST(before_c AS VARCHAR) AS before_c,
      |  CAST(proposed AS VARCHAR) AS proposed_c,
      |  CAST(merged_c_num AS VARCHAR) AS merged_c,
      |  CAST(user_id AS VARCHAR) AS merged_u,
      |  CASE WHEN conflict THEN 'c' ELSE '' END AS unmerged,
      |  conflict AS is_dlq
      |FROM cls ORDER BY user_id""".stripMargin

  // -- 33: the FLAGSHIP end-to-end pipeline in one planned query -----------
  /** The full reference deployment as ONE Catalyst plan: changefeed
    * ndjson round-trip (DSv2 source) → consistent-mode conveyor
    * acceptance (checkpoint bootstrapped from the first-20-day proposal
    * log, identity reduce on the unique mutation id) → userscript with
    * `lookup` against the already-applied first-10-day target state,
    * `deletesTo` tombstone routing, and dispatch → per-route three-way
    * mergeOrDlq (before = the looked-up target image) → last-one-wins
    * apply per route. Every stage is an existing oracle-proven
    * component (cdc_changefeed_files, cdc_conveyor_modes,
    * cdc_userscript_lookup, cdc_userscript_deletes_to, cdc_merge_dlq);
    * this entry proves they COMPOSE into one lazy plan with no
    * materialization barrier BETWEEN stages — the one pin is the
    * parsed SOURCE frame (r14: json + double from_json is the
    * expensive leaf every stage's lineage would otherwise re-parse;
    * see the inline note). One summary row per route: admitted rows,
    * dead letters, final keys, final cents, frontier reached.
    */
  def pipelineE2e(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val envelope = events(s, dir).select(
      when(col("event_type") === "error", lit(null).cast("string"))
        .otherwise(to_json(struct(col("event_id"), col("user_id"),
          col("event_type"), col("value")))).as("after"),
      to_json(array(col("user_id"), col("event_id"))).as("key"),
      concat((unix_micros(col("ts").cast("timestamp")) * 1000).cast("string"),
        lit(".0000000000")).as("updated"))
    val outDir = fixture(dir, "pipeline_e2e")(p =>
      envelope.write.mode("overwrite").json(p))
    val dataSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val keyArr = from_json(col("key"), ArrayType(LongType))
    // parse ONCE: the pipeline's stages (era cuts, target state,
    // conveyor bootstrap, acceptance, three route legs' summaries)
    // each re-evaluate their lineage down to the leaf, and this leaf
    // is a json scan + two from_json per row — ~a dozen full
    // re-parses without a pin (measured: 16.5 → ~6 s at sf0.1). The
    // STAGES still compose lazily; the barrier pins only the parsed
    // source frame, exactly like the prefix-sum ops pin their range
    // exchange ([[graft.ops.Materialize]]).
    val parsed = graft.ops.Materialize.barrier(Changefeed.read(s, outDir)
      .select(keyArr.getItem(0).as("user_id"), keyArr.getItem(1).as("event_id"),
        from_json(col("data"), dataSchema).as("d"),
        col("hlc.nanos").as("nanos"), col("is_delete"))
      .select(col("user_id"), col("event_id"), col("nanos"), col("is_delete"),
        col("d.event_type").as("event_type"), cents(col("d.value")).as("cents"),
        pmod(col("user_id"), lit(4L)).as("part")))
    val ordE = struct(col("nanos"), col("event_id"))
    // era cuts: days 0-10 are the ALREADY-APPLIED target; later
    // mutations are the in-flight feed whose first 20 days back the
    // conveyor checkpoint
    val cuts = parsed.agg(min(col("nanos")).as("__min"))
      .select((col("__min") + lit(10L * 86400L * 1000000000L)).as("__cut1"),
        (col("__min") + lit(20L * 86400L * 1000000000L)).as("__cut2"))
    val wc = parsed.crossJoin(broadcast(cuts))
    val target = Msort.latestByKey(
        wc.filter(col("nanos") <= col("__cut1")), Seq("user_id"), ordE)
      .filter(!col("is_delete"))
      .select(col("user_id"), col("cents"))
    val batch = wc.filter(col("nanos") > col("__cut1"))
    val proposals = batch.filter(col("nanos") <= col("__cut2"))
    val conveyor = new Conveyor.Conveyors(Conveyor.Config())
      .get("pipeline_e2e", proposals, col("part"), col("nanos"),
        col("event_id"), nowUs = 0L)
    val accepted = conveyor
      .accept(batch.drop("__cut1", "__cut2"), Seq("user_id", "event_id"),
        ordE, col("nanos"))
      .drop("speculative", "part")
    val script = graft.script.UserScript.compile(
      """{"stages": [
        |   {"op": "map", "cols": {
        |      "__op": "case when is_delete then 'd' else 'u' end"}},
        |   {"op": "lookup", "table": "target",
        |    "on": {"user_id": "user_id"},
        |    "select": {"target_cents": "cents"}}],
        | "deletesTo": "tombstones",
        | "dispatch": {
        |   "routes": [{"name": "billing", "when": "event_type = 'purchase'"}],
        |   "default": "telemetry"}}""".stripMargin,
      sides = Map("target" -> target))
    val routed = script.dispatch(accepted)
    def summarize(route: String, inDf: DataFrame, dlq: Option[DataFrame],
        state: DataFrame): DataFrame =
      inDf.agg(count(lit(1)).as("n_in"))
        .crossJoin(dlq.map(_.agg(count(lit(1)).as("n_dlq")))
          .getOrElse(inDf.sparkSession.sql("SELECT CAST(0 AS BIGINT) AS n_dlq")))
        .crossJoin(state.agg(count(lit(1)).as("n_keys"),
          coalesce(sum(col("cents")), lit(0L)).as("cents_final"),
          max(col("nanos")).as("max_nanos")))
        .select(lit(route).as("route"), col("n_in"), col("n_dlq"),
          col("n_keys"), col("cents_final"), col("max_nanos"))
    routed.toSeq.map { case (route, df) =>
      if (route == "tombstones")
        summarize(route, df, None,
          Msort.latestByKey(df, Seq("user_id"), ordE)
            .withColumn("cents", lit(null).cast("long")))
      else {
        val p = graft.Pipeline(df, keys = Seq("user_id"), order = ordE)
          .mergeOrDlq(col("target_cents"), col("cents"))
        summarize(route, df, p.deadLetters, p.latestByKey().state)
      }
    }.reduce(_ unionByName _).orderBy("route")
  }

  val pipelineE2eSql: String =
    """WITH m AS (
      |  SELECT event_id, user_id,
      |    CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS event_type,
      |    CASE WHEN event_type = 'error' THEN NULL
      |         ELSE CAST(ROUND(value * 100, 0) AS BIGINT) END AS cents,
      |    epoch_us(ts) * 1000 AS nanos,
      |    event_type = 'error' AS is_delete,
      |    user_id % 4 AS part
      |  FROM events),
      |c AS (SELECT MIN(nanos) + 864000000000000 AS cut1,
      |             MIN(nanos) + 1728000000000000 AS cut2 FROM m),
      |init AS (SELECT m.* FROM m, c WHERE nanos <= cut1),
      |tgt AS (SELECT user_id, cents FROM (
      |    SELECT user_id, cents, is_delete, ROW_NUMBER() OVER (
      |      PARTITION BY user_id ORDER BY nanos DESC, event_id DESC) AS rn
      |    FROM init) WHERE rn = 1 AND NOT is_delete),
      |batch AS (SELECT m.* FROM m, c WHERE nanos > cut1),
      |f AS (SELECT part, MAX(nanos) AS fr FROM batch, c
      |      WHERE nanos <= cut2 GROUP BY part),
      |r AS (SELECT MIN(fr) AS resolved FROM f),
      |acc AS (SELECT b.* FROM batch b, r WHERE b.nanos <= r.resolved),
      |s AS (SELECT a.*, CASE WHEN is_delete THEN 'd' ELSE 'u' END AS op,
      |    t.cents AS target_cents
      |  FROM acc a LEFT JOIN tgt t USING (user_id)),
      |rt AS (SELECT s.*, CASE WHEN op = 'd' THEN 'tombstones'
      |    WHEN event_type = 'purchase' THEN 'billing'
      |    ELSE 'telemetry' END AS route FROM s),
      |ups AS (SELECT rt.*, lag(cents) OVER (
      |    PARTITION BY route, user_id ORDER BY nanos, event_id) AS target_value
      |  FROM rt WHERE route <> 'tombstones'),
      |st AS (SELECT *, CASE
      |    WHEN target_value IS NULL OR target_value = target_cents THEN 'clean'
      |    WHEN target_value = cents THEN 'idempotent'
      |    ELSE 'conflict' END AS status FROM ups),
      |dl AS (SELECT route, COUNT(*) AS n_dlq FROM st
      |       WHERE status = 'conflict' GROUP BY route),
      |fin AS (SELECT route, user_id, cents, nanos FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY route, user_id
      |      ORDER BY nanos DESC, event_id DESC) AS rn
      |    FROM st WHERE status <> 'conflict') WHERE rn = 1),
      |tf AS (SELECT user_id, nanos FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY nanos DESC, event_id DESC) AS rn
      |    FROM rt WHERE route = 'tombstones') WHERE rn = 1),
      |ni AS (SELECT route, COUNT(*) AS n_in FROM rt GROUP BY route),
      |fs AS (SELECT route, COUNT(*) AS n_keys,
      |    CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS cents_final,
      |    MAX(nanos) AS max_nanos FROM fin GROUP BY route
      |  UNION ALL
      |  SELECT 'tombstones', COUNT(*), CAST(0 AS BIGINT), MAX(nanos) FROM tf)
      |SELECT ni.route, ni.n_in, COALESCE(dl.n_dlq, 0) AS n_dlq,
      |  fs.n_keys, fs.cents_final, fs.max_nanos
      |FROM ni
      |LEFT JOIN dl USING (route)
      |JOIN fs USING (route)
      |ORDER BY ni.route""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_pipeline_e2e" -> (pipelineE2e _),
    "cdc_incremental_apply" -> (incrementalApply _),
    "cdc_asof_join" -> (asofJoin _),
    "cdc_asof_join_ranged" -> (asofJoinRanged _),
    "cdc_asof_join_precounted" -> (asofJoinPrecounted _),
    "cdc_latest_by_key" -> (latestByKey _),
    "cdc_unique_by_time_key" -> (uniqueByTimeKey _),
    "cdc_apply_upsert_delete" -> (applyUpsertDelete _),
    "cdc_cas" -> (casApply _),
    "cdc_deadlines" -> (deadlines _),
    "cdc_resolved_windows" -> (resolvedWindows _),
    "cdc_stage_filter_applied" -> (stageFilterApplied _),
    "cdc_stage_retire" -> (stageRetire _),
    "cdc_dlq" -> (dlq _),
    "cdc_merge_conflicts" -> (mergeConflicts _),
    "cdc_ndjson_extract" -> (ndjsonExtract _),
    "cdc_schema_map" -> (schemaMap _),
    "cdc_fan_out" -> (fanOut _),
    "cdc_best_effort_order" -> (bestEffortOrder _),
    "cdc_changefeed_files" -> (changefeedFiles _),
    "cdc_stream_apply" -> (streamApply _),
    "cdc_workload_check" -> (workloadCheck _),
    "cdc_query_payload" -> (queryPayload _),
    "cdc_core_rounds" -> (coreRounds _),
    "cdc_txn_batches" -> (txnBatches _),
    "cdc_userscript" -> (userscript _),
    "cdc_state_at" -> (stateAt _),
    "cdc_apply_sink" -> (applySink _),
    "cdc_staging_partitioned" -> (stagingPartitioned _),
    "cdc_kafka_payload" -> (kafkaPayload _),
    "cdc_txn_log" -> (txnLog _),
    "cdc_gtid_frontier" -> (gtidFrontier _),
    "cdc_conveyor_modes" -> (conveyorModes _),
    "cdc_schema_drift" -> (schemaDrift _),
    "cdc_merge_dlq" -> (mergeDlq _),
    "cdc_dlq_replay" -> (dlqReplay _),
    "cdc_checkpoint_frontier" -> (checkpointFrontier _),
    "cdc_userscript_dsl" -> (userscriptDsl _),
    "cdc_merge_wire_before" -> (mergeWireBefore _),
    "cdc_userscript_emit" -> (userscriptEmit _),
    "cdc_userscript_merge" -> (userscriptMerge _),
    "cdc_userscript_deletes_to" -> (userscriptDeletesTo _),
    "cdc_userscript_lookup" -> (userscriptLookup _),
    "cdc_route_configs" -> (routeConfigs _),
    "cdc_changefeed_resume" -> (changefeedResume _),
    "cdc_objstore_resolved" -> (objstoreResolved _),
    "cdc_pglogical_frames" -> (pglogicalFrames _),
    "q_range_join" -> (rangeJoinCampaigns _))

  val oracles: Map[String, String] = Map(
    "cdc_incremental_apply" -> incrementalApplySql,
    "cdc_asof_join" -> asofJoinSql,
    "cdc_asof_join_ranged" -> asofJoinSql,
    // the supplied-profile mode must produce a BIT-IDENTICAL answer —
    // it shares the exact mode's ASOF oracle (plan choice only)
    "cdc_asof_join_precounted" -> asofJoinSql,
    "cdc_latest_by_key" -> latestByKeySql,
    "cdc_unique_by_time_key" -> uniqueByTimeKeySql,
    "cdc_apply_upsert_delete" -> applyUpsertDeleteSql,
    "cdc_cas" -> casApplySql,
    "cdc_deadlines" -> deadlinesSql,
    "cdc_resolved_windows" -> resolvedWindowsSql,
    "cdc_stage_filter_applied" -> stageFilterAppliedSql,
    "cdc_stage_retire" -> stageRetireSql,
    "cdc_dlq" -> dlqSql,
    "cdc_merge_conflicts" -> mergeConflictsSql,
    "cdc_ndjson_extract" -> ndjsonExtractSql,
    "cdc_schema_map" -> schemaMapSql,
    "cdc_fan_out" -> fanOutSql,
    "cdc_best_effort_order" -> bestEffortOrderSql,
    "cdc_stream_apply" -> streamApplySql,
    "cdc_changefeed_files" -> changefeedFilesSql,
    "cdc_query_payload" -> queryPayloadSql,
    "cdc_core_rounds" -> coreRoundsSql,
    "cdc_txn_batches" -> txnBatchesSql,
    "cdc_userscript" -> userscriptSql,
    "cdc_state_at" -> stateAtSql,
    "cdc_apply_sink" -> applySinkSql,
    "cdc_staging_partitioned" -> stagingPartitionedSql,
    "cdc_workload_check" -> workloadCheckSql,
    "cdc_kafka_payload" -> kafkaPayloadSql,
    "cdc_txn_log" -> txnLogSql,
    "cdc_gtid_frontier" -> gtidFrontierSql,
    "cdc_conveyor_modes" -> conveyorModesSql,
    "cdc_schema_drift" -> schemaDriftSql,
    "cdc_merge_dlq" -> mergeDlqSql,
    "cdc_dlq_replay" -> dlqReplaySql,
    "cdc_pipeline_e2e" -> pipelineE2eSql,
    "cdc_checkpoint_frontier" -> checkpointFrontierSql,
    "cdc_userscript_dsl" -> userscriptDslSql,
    "cdc_merge_wire_before" -> mergeWireBeforeSql,
    "cdc_userscript_emit" -> userscriptEmitSql,
    "cdc_userscript_merge" -> userscriptMergeSql,
    "cdc_userscript_deletes_to" -> userscriptDeletesToSql,
    "cdc_userscript_lookup" -> userscriptLookupSql,
    "cdc_route_configs" -> routeConfigsSql,
    "cdc_changefeed_resume" -> changefeedResumeSql,
    "cdc_objstore_resolved" -> objstoreResolvedSql,
    "cdc_pglogical_frames" -> pglogicalFramesSql,
    "q_range_join" -> rangeJoinCampaignsSql)
}
