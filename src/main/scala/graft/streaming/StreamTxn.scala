package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming transaction assembly — the incremental counterpart of
  * [[graft.cdc.TxnLog.committedRows]].
  *
  * Reference: `internal/source/mylogical/conn.go:135` accumulates ROW
  * events into a MultiBatch between BEGIN and XID/COMMIT as the binlog
  * STREAMS in — frames of one transaction may arrive across many reads,
  * interleaved with other transactions. The batch parser re-expresses
  * this as joins; this operator re-expresses the live consumer loop:
  * `groupByKey(xid)` + `flatMapGroupsWithState`, state = the open
  * transaction's accumulated frames. A COMMIT emits the atomic batch
  * summary; a ROLLBACK discards the accumulation. Both leave a CLOSED
  * tombstone so a ROW frame delivered in a later trigger (cross-trigger
  * reordering) is dropped instead of resurrecting state — an xid names
  * exactly one transaction, so nothing after its COMMIT/ROLLBACK can
  * belong to a live txn. The DEFAULT is `tombstoneTtlMs = 0`: keep
  * tombstones forever, no timeout — safe for every trigger mode,
  * because Spark re-runs batches unconditionally while a
  * ProcessingTimeTimeout is configured, which keeps a bounded replay
  * (`Trigger.AvailableNow`, tests) alive FOREVER as a silent hang.
  * A long-running LIVE feed should opt INTO a TTL (e.g. 10 min) so
  * the state store stays bounded by open transactions plus a sliding
  * window of recently closed ones — the reference's memory profile —
  * accepting that its continuous trigger never terminates anyway.
  */
object StreamTxn {

  /** One wire frame (see [[graft.cdc.TxnLog.frameSchema]]). */
  case class Frame(lsn: Long, op: String, xid: Long,
      key: Option[Long], data: Option[String], ts_us: Long)

  /** An assembled, committed transaction. */
  case class TxnBatch(xid: Long, n_ops: Long, begin_us: Long,
      commit_us: Long, commit_lsn: Long)

  /** Per-xid accumulation state (public: Spark's encoder codegen needs
    * constructor access). `closed` marks a committed/rolled-back xid —
    * a tombstone that drops late frames until its timeout clears it.
    */
  case class Open(nOps: Long, beginUs: Option[Long], closed: Boolean)

  /** Assemble committed transactions from a stream of frames. Only
    * transactions whose BEGIN and COMMIT both appear emit (a torn log
    * head — COMMIT with no BEGIN — is discarded, matching the batch
    * parser); rolled-back and still-open transactions emit nothing.
    */
  def assemble(frames: Dataset[Frame],
      tombstoneTtlMs: Long = 0L): Dataset[TxnBatch] = {
    implicit val lenc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[TxnBatch]
    implicit val stEnc = Encoders.product[Open]
    val timeoutConf =
      if (tombstoneTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    frames.groupByKey(_.xid)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (xid: Long, rows: Iterator[Frame], state: GroupState[Open]) =>
          if (state.hasTimedOut) {
            // only closed tombstones carry a timeout — open txns never
            // expire (dropping one would tear its transaction)
            state.remove()
            Iterator.empty
          } else {
            // frames within one trigger arrive unordered across partitions;
            // lsn gives the in-transaction order
            val sorted = rows.toSeq.sortBy(_.lsn)
            var open = state.getOption.getOrElse(Open(0L, None, closed = false))
            var out = List.empty[TxnBatch]
            sorted.foreach { f =>
              f.op match {
                case _ if open.closed => () // late frame after COMMIT/ROLLBACK
                // BEGIN must not reset an already-accumulated count: a ROW
                // frame can land in an earlier trigger than its BEGIN when
                // trigger boundaries don't respect lsn order (an xid is one
                // transaction, so the count can only belong to this txn)
                case "BEGIN" => open = open.copy(beginUs = Some(f.ts_us))
                case "ROW" => open = open.copy(nOps = open.nOps + 1)
                case "ROLLBACK" => open = Open(0L, None, closed = true)
                case "COMMIT" =>
                  open.beginUs.foreach { b =>
                    out ::= TxnBatch(xid, open.nOps, b, f.ts_us, f.lsn)
                  }
                  open = Open(0L, None, closed = true)
                case _ => ()
              }
            }
            if (open.closed) {
              // tombstone: drop late frames for this xid (and expire it
              // eventually when a TTL is configured)
              state.update(open)
              if (tombstoneTtlMs > 0) state.setTimeoutDuration(tombstoneTtlMs)
            } else if (open.beginUs.isDefined || open.nOps > 0) {
              // keep state while ANYTHING is accumulated — rows seen before
              // their BEGIN must survive to the trigger that delivers it
              state.update(open)
            } else state.remove()
            out.reverseIterator
          }
      }
  }
}
