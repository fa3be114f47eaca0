package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming latest-by-key apply with explicit state.
  *
  * Reference: `internal/sequencer/core` applies staged mutations in
  * (key, hlc) order with per-key state; `internal/sequencer/besteffort`
  * relaxes cross-key ordering. Both reduce, per key, to "remember the
  * winning mutation so far and emit changes".
  *
  * Spark-first design: Structured Streaming `groupByKey` over the key +
  * `flatMapGroupsWithState` holding one row of state per key (the current
  * winner). State is one row per LIVE key — it IS the materialized
  * table, so it is bounded by table cardinality, not stream length; a
  * live key is never evicted (evicting would let a late stale mutation
  * resurrect an overwritten value). DELETE winners are tombstones:
  * held only to suppress staler arrivals, so once the resolved
  * frontier passes their version they may retire — opt in via
  * `tombstoneTtlMs` (mirrors [[StreamTxn]]'s closed-txn tombstones;
  * the reference retires staged mutations behind the resolved
  * frontier the same way). The state store shards by
  * the grouping key exactly like the reference shards its lockset by
  * key hash — but the key's IDENTITY is the key value itself, never a
  * hash of it (the reference only hashes to pick a lockset shard; a
  * 64-bit hash collision must not merge two keys' histories). The same
  * typed reduce also runs in batch mode via `reduceGroups`, so one code
  * path serves both.
  */
object StreamApply {

  /** A keyed mutation with a totally-ordered version (HLC nanos packed
    * with a logical tiebreak). Generic in the key type: integer
    * surrogate keys ([[KeyedMut]]) and wire-format key text
    * ([[KeyedMutText]]) share one reduce.
    */
  case class KeyedMutOf[K](key: K, versionNanos: Long, tiebreak: Long,
      op: String, value: Double, payload: String)

  type KeyedMut = KeyedMutOf[Long]
  val KeyedMut = KeyedMutOf
  type KeyedMutText = KeyedMutOf[String]

  private def wins[K](a: KeyedMutOf[K], b: KeyedMutOf[K]): KeyedMutOf[K] =
    if (a.versionNanos > b.versionNanos ||
      (a.versionNanos == b.versionNanos && a.tiebreak >= b.tiebreak)) a else b

  private def applyBatchOf[K](muts: Dataset[KeyedMutOf[K]])(
      implicit kenc: Encoder[K], enc: Encoder[KeyedMutOf[K]]): Dataset[KeyedMutOf[K]] = {
    implicit val tenc = Encoders.tuple(kenc, enc)
    muts.groupByKey(_.key).reduceGroups(wins[K] _).map(_._2)
  }

  private def applyStreamOf[K](muts: Dataset[KeyedMutOf[K]],
      tombstoneTtlMs: Long)(
      implicit kenc: Encoder[K], enc: Encoder[KeyedMutOf[K]]): Dataset[KeyedMutOf[K]] = {
    val timeoutConf =
      if (tombstoneTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    muts.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, timeoutConf) {
        (_: K, rows: Iterator[KeyedMutOf[K]], state: GroupState[KeyedMutOf[K]]) =>
          if (state.hasTimedOut) {
            // only DELETE tombstones ever arm a timeout (below): a live
            // key's winner is the materialized row and must never evict
            state.remove()
            Iterator.empty
          } else {
            val incoming = rows.reduceOption(wins[K] _)
            incoming match {
              case None => Iterator.empty
              case Some(best) =>
                val merged = state.getOption.map(wins(_, best)).getOrElse(best)
                val changed = !state.getOption.contains(merged)
                if (changed) state.update(merged)
                // Tombstone retirement (the reference's Retire contract on
                // the streaming path — batch cdc_stage_retire's dual): a
                // winner that is a DELETE is only held to suppress STALER
                // arrivals, and the resolved-frontier protocol promises
                // none arrive once the frontier passes its version. With a
                // TTL chosen ≥ the source's resolved-frontier lag, expiry
                // is therefore safe: anything arriving later is past the
                // frontier and legitimately establishes fresh state. The
                // timeout re-arms on every touch (timeouts clear whenever
                // a key is processed), so a tombstone still absorbing
                // stale traffic keeps its cover until the traffic stops.
                if (tombstoneTtlMs > 0 && merged.op == "delete")
                  state.setTimeoutDuration(tombstoneTtlMs)
                if (changed) Iterator.single(merged) else Iterator.empty
            }
          }
      }
  }

  /** Batch path: same last-one-wins reduce, via the typed Dataset API. */
  def applyBatch(muts: Dataset[KeyedMut]): Dataset[KeyedMut] =
    applyBatchOf(muts)(Encoders.scalaLong, Encoders.product[KeyedMut])

  /** Batch apply for wire-format mutations keyed by key TEXT. */
  def applyBatchText(muts: Dataset[KeyedMutText]): Dataset[KeyedMutText] =
    applyBatchOf(muts)(Encoders.STRING, Encoders.product[KeyedMutText])

  /** Streaming path: per-key state = current winner; each trigger emits
    * the keys whose winner changed (an incremental changelog of the
    * materialized table).
    *
    * `tombstoneTtlMs` opts into DELETE-tombstone retirement (the
    * reference retires staged mutations behind the resolved frontier;
    * batch `cdc_stage_retire` is the batch dual): choose a TTL ≥ the
    * source's resolved-frontier lag so a tombstone only expires once
    * the protocol guarantees nothing staler can arrive. Live keys are
    * NEVER evicted regardless — their state IS the materialized row.
    * Default 0 keeps tombstones forever (safe for every trigger mode;
    * see [[StreamTxn]] on why ProcessingTimeTimeout must stay opt-in:
    * bounded replays like Trigger.AvailableNow hang under it).
    */
  def applyStream(muts: Dataset[KeyedMut],
      tombstoneTtlMs: Long = 0L): Dataset[KeyedMut] =
    applyStreamOf(muts, tombstoneTtlMs)(
      Encoders.scalaLong, Encoders.product[KeyedMut])

  /** Streaming apply for wire-format mutations keyed by key TEXT. */
  def applyStreamText(muts: Dataset[KeyedMutText],
      tombstoneTtlMs: Long = 0L): Dataset[KeyedMutText] =
    applyStreamOf(muts, tombstoneTtlMs)(
      Encoders.STRING, Encoders.product[KeyedMutText])

  /** Adapt the events table to the KeyedMut shape. */
  def fromEvents(events: DataFrame): DataFrame =
    events.select(
      col("user_id").as("key"),
      (unix_micros(col("ts").cast("timestamp")) * 1000L).as("versionNanos"),
      col("event_id").as("tiebreak"),
      col("event_type").as("op"),
      col("value"),
      col("props").as("payload"))
}
