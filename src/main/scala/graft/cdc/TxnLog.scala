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

  /** One output row per ROW frame of a COMMITTED transaction, carrying
    * its transaction's begin/commit metadata. Rolled-back and open
    * (never-committed) transactions contribute nothing.
    */
  def committedRows(frames: DataFrame): DataFrame = {
    // one conditional-aggregation pass builds all per-txn metadata —
    // separate filter branches would re-scan the log once per frame
    // type (4 scans of a 100 TB log instead of 2)
    val meta = frames.filter(col("op") =!= "ROW")
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
    frames.filter(col("op") === "ROW")
      .select("lsn", "xid", "key", "data", "ts_us")
      .join(meta, Seq("xid"))
  }

  /** The consistent point: the highest commit lsn — a restart replays
    * from here; uncommitted frames beyond it are re-read. One-row frame.
    */
  def consistentPoint(frames: DataFrame): DataFrame =
    frames.filter(col("op") === "COMMIT")
      .agg(max(col("lsn")).as("consistent_lsn"))
}
