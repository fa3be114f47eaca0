package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BEGIN/COMMIT-delimited transaction log parsing.
  *
  * Reference: `internal/source/mylogical/conn.go:135`
  * (`accumulateBatch`) — row events accumulate into a MultiBatch
  * between a GTID/BEGIN and the XID/COMMIT event; a ROLLBACK (or a log
  * that ends mid-transaction) discards the accumulated rows, and the
  * consistent point only moves at commit boundaries.
  * `internal/source/pglogical/conn.go` mirrors this with
  * Begin/Commit messages around DataTuple frames.
  *
  * Spark-first: the log is a DataFrame of frames (lsn, op, xid, ...).
  * Atomicity is a JOIN, not mutable accumulation: ROW frames attach to
  * their xid's COMMIT frame (the inner join makes uncommitted rows
  * vanish — exactly the open-transaction discard), ROLLBACK xids
  * anti-join away, and frames of many interleaved transactions parse in
  * parallel with one shuffle on xid.
  */
object TxnLog {

  /** One frame per line: `op` ∈ BEGIN | ROW | COMMIT | ROLLBACK.
    * BEGIN/COMMIT/ROLLBACK carry (xid, ts_us); ROW adds (key, data).
    * Explicit schema — never inference.
    */
  val frameSchema: StructType = StructType(Seq(
    StructField("lsn", LongType),
    StructField("op", StringType),
    StructField("xid", LongType),
    StructField("key", LongType),
    StructField("data", StringType),
    StructField("ts_us", LongType)))

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(frameSchema).json(dir)

  /** One row per COMMITTED transaction: (xid, commit_lsn, commit_us,
    * begin_us). Rolled-back and open (never-committed) transactions
    * contribute nothing.
    */
  def committedTxns(frames: DataFrame): DataFrame =
    // one conditional-aggregation pass builds all per-txn metadata —
    // separate filter branches would re-scan the log once per frame
    // type (4 scans of a 100 TB log instead of 2)
    frames.filter(col("op") =!= "ROW")
      .groupBy("xid")
      .agg(
        max(when(col("op") === "COMMIT", col("lsn"))).as("commit_lsn"),
        max(when(col("op") === "COMMIT", col("ts_us"))).as("commit_us"),
        max(when(col("op") === "BEGIN", col("ts_us"))).as("begin_us"),
        max(when(col("op") === "ROLLBACK", lit(1L))).as("__rolled"))
      // a batch needs BOTH frame ends: COMMIT without BEGIN is a torn
      // log head (reader attached mid-transaction) and is discarded,
      // exactly as the reference only accumulates from a BEGIN/GTID
      .filter(col("__rolled").isNull &&
        col("commit_lsn").isNotNull && col("begin_us").isNotNull)
      .drop("__rolled")

  /** One output row per ROW frame of a COMMITTED transaction, carrying
    * its transaction's begin/commit metadata.
    */
  def committedRows(frames: DataFrame): DataFrame =
    frames.filter(col("op") === "ROW")
      .select("lsn", "xid", "key", "data", "ts_us")
      .join(committedTxns(frames), Seq("xid"))

  /** The consistent point: the highest commit lsn — a restart replays
    * from here; uncommitted frames beyond it are re-read. One-row frame.
    */
  def consistentPoint(frames: DataFrame): DataFrame =
    frames.filter(col("op") === "COMMIT")
      .agg(max(col("lsn")).as("consistent_lsn"))

  /** GTID-SET frontier (reference `internal/source/mylogical/conn.go:149`
    * GTIDEvent → `withMysqlGTIDSet`): each committed transaction carries
    * (source uuid, GNO), and the consistent point is a per-source
    * INTERVAL SET of applied GNOs — not one max value, so a hole left by
    * an interleaved source never gets skipped on restart. Output is one
    * row per contiguous applied interval,
    * `(source, start_gno, end_gno, n_txns)`.
    *
    * Scale shape: the common deployment is ONE primary = one uuid, so a
    * window partitioned by source alone sorts the whole GNO history in
    * one task — a 10⁹-txn log would hit a single-partition global sort.
    * Instead, gaps-and-islands runs per (source, gno-BAND) — fixed
    * 2^bandBits-wide buckets, so the sort parallelizes across bands —
    * and islands that touch a band edge (at most two per band) are
    * chain-merged with one second-level pass over that tiny set. A
    * dense 10⁹-txn single-source log becomes ~1000 full-band islands
    * merged in one 1000-row task instead of one 10⁹-row sort.
    */
  def gtidFrontier(txns: DataFrame, source: String, gno: String,
      bandBits: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bandWidth = 1L << bandBits
    val w = Window.partitionBy(col(source), col("__band")).orderBy(col(gno))
    val bandIslands = txns.select(col(source), col(gno)).distinct()
      .withColumn("__band", shiftright(col(gno), bandBits)) // exact integral div
      // consecutive gnos share (gno - rank): the island label
      .withColumn("__grp", col(gno) - row_number().over(w))
      .groupBy(col(source), col("__band"), col("__grp"))
      .agg(min(col(gno)).as("start_gno"), max(col(gno)).as("end_gno"),
        count(lit(1)).as("n_txns"))
      .drop("__band", "__grp")
    // only islands touching a band edge can continue in a neighbor band
    val touching = pmod(col("start_gno"), lit(bandWidth)) === 0 ||
      pmod(col("end_gno") + 1, lit(bandWidth)) === 0
    val chainW = Window.partitionBy(col(source)).orderBy(col("start_gno"))
    val merged = bandIslands.filter(touching)
      // a chain breaks where the previous edge-island isn't exactly
      // adjacent; cumulative sum of breaks labels each chain
      .withColumn("__new",
        when(lag(col("end_gno"), 1).over(chainW) + 1 === col("start_gno"), 0L)
          .otherwise(1L))
      .withColumn("__chain", sum(col("__new"))
        .over(chainW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(source), col("__chain"))
      .agg(min(col("start_gno")).as("start_gno"),
        max(col("end_gno")).as("end_gno"),
        sum(col("n_txns")).as("n_txns"))
      .drop("__chain")
    bandIslands.filter(!touching).unionByName(merged)
  }

  /** Canonical per-source GTID-set rendering, one row per source:
    * `start-end` intervals joined with `:` in ascending order (the
    * MySQL `uuid:1-5:7-9` shape) — this is what a checkpoint record
    * stores and what a resumed reader parses back.
    */
  def gtidSet(frontier: DataFrame, source: String): DataFrame =
    frontier.groupBy(col(source))
      .agg(
        concat_ws(":", transform(
          array_sort(collect_list(struct(col("start_gno"), col("end_gno")))),
          iv => concat(iv("start_gno").cast("string"), lit("-"),
            iv("end_gno").cast("string")))).as("gtid_set"),
        count(lit(1)).as("n_intervals"),
        sum(col("n_txns")).as("n_applied"))

  /** Inverse of [[gtidSet]]: parse rendered `start-end:start-end`
    * strings back into frontier interval rows, so a resumed reader can
    * seed [[gtidResume]] from a checkpoint RECORD — a stored string,
    * not a live frontier DataFrame (reference
    * `internal/source/mylogical/conn.go:149` resumes from the persisted
    * GTID-set string). Islands are contiguous by construction, so
    * `n_txns = end - start + 1` reconstructs exactly; empty strings
    * (a source with nothing applied) yield no intervals. Round-trip
    * `gtidSetParse(gtidSet(f))` ≡ `f`. MySQL renders a singleton
    * interval as a bare GNO (`uuid:1-5:7`), so a missing `-end` half
    * parses as `end = start` — otherwise a resumed reader would get
    * NULL end_gno and its anti-join condition would re-admit already
    * applied transactions.
    */
  def gtidSetParse(sets: DataFrame, source: String, setCol: String): DataFrame =
    sets.select(col(source), explode(split(col(setCol), ":")).as("__iv"))
      .filter(length(col("__iv")) > 0)
      .select(col(source),
        split(col("__iv"), "-").getItem(0).cast("long").as("start_gno"),
        // try_element_at, not getItem: ANSI mode throws on a missing
        // index, and a singleton interval has no second half
        coalesce(try_element_at(split(col("__iv"), "-"), lit(2)),
          split(col("__iv"), "-").getItem(0)).cast("long").as("end_gno"))
      .withColumn("n_txns", col("end_gno") - col("start_gno") + 1)

  /** Resume anti-join: keep only transactions whose (source, gno) is
    * NOT covered by a frontier interval. The frontier is tiny (one row
    * per interval) → broadcast; the transaction side never shuffles.
    */
  def gtidResume(txns: DataFrame, frontier: DataFrame, source: String,
      gno: String): DataFrame = {
    val f = broadcast(frontier.select(col(source).as("__src"),
      col("start_gno").as("__s"), col("end_gno").as("__e")))
    txns.join(f, txns(source) === f("__src") &&
      txns(gno) >= f("__s") && txns(gno) <= f("__e"), "left_anti")
  }
}
