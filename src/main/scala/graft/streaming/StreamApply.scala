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
  * table, so it is bounded by table cardinality, not stream length; it
  * is deliberately never evicted (evicting would let a late stale
  * mutation resurrect an overwritten value). The state store shards by
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

  private def applyStreamOf[K](muts: Dataset[KeyedMutOf[K]])(
      implicit kenc: Encoder[K], enc: Encoder[KeyedMutOf[K]]): Dataset[KeyedMutOf[K]] =
    muts.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: K, rows: Iterator[KeyedMutOf[K]], state: GroupState[KeyedMutOf[K]]) =>
          val incoming = rows.reduceOption(wins[K] _)
          incoming match {
            case None => Iterator.empty
            case Some(best) =>
              val merged = state.getOption.map(wins(_, best)).getOrElse(best)
              if (state.getOption.contains(merged)) Iterator.empty
              else { state.update(merged); Iterator.single(merged) }
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
    */
  def applyStream(muts: Dataset[KeyedMut]): Dataset[KeyedMut] =
    applyStreamOf(muts)(Encoders.scalaLong, Encoders.product[KeyedMut])

  /** Streaming apply for wire-format mutations keyed by key TEXT. */
  def applyStreamText(muts: Dataset[KeyedMutText]): Dataset[KeyedMutText] =
    applyStreamOf(muts)(Encoders.STRING, Encoders.product[KeyedMutText])

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
