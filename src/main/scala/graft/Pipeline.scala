package graft

import graft.cdc.{Apply, Dlq, MergeOps, Msort, Staging}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fluent assembly of a CDC apply pipeline — the library-level
  * equivalent of the reference's conveyor (`internal/conveyor`), which
  * wires source → (dedup, script, sequencer) → target apply → DLQ.
  *
  * Each verb is lazy plan construction; nothing executes until the
  * caller writes or collects. A user of the reference writes:
  *
  * {{{
  * Pipeline(mutations, keys = Seq("id"), order = struct($"ts", $"seq"))
  *   .uniqueByTimeKey("ts", $"seq")         // msort dedup
  *   .deadline("ts", "1 DAY")               // applycfg.Deadlines
  *   .dlq("bad_payload" -> $"payload".isNull)
  *   .transform(graft.script.Transforms.Pipeline(...))  // userscript
  *   .latestByKey()                         // sequencer + apply
  *   .dropDeletesWhere($"op" === "delete")  // tombstones
  *   .state                                 // the materialized table
  * }}}
  */
final case class Pipeline(
    mutations: DataFrame,
    keys: Seq[String],
    order: Column,
    dlqFrames: Seq[DataFrame] = Nil) {

  /** Drop exact (time,key) duplicate deliveries. */
  def uniqueByTimeKey(time: String, tiebreak: Column): Pipeline =
    copy(mutations = Msort.uniqueByTimeKey(mutations, keys, time, tiebreak))

  /** Discard mutations staler than `deadline` behind the batch max. */
  def deadline(ts: String, deadline: String): Pipeline =
    copy(mutations = Apply.deadlineFilter(mutations, ts, deadline))

  /** Route condemned mutations to the dead-letter queue. */
  def dlq(reasons: (String, Column)*): Pipeline = {
    val (ok, dead) = Dlq.route(mutations, reasons)
    copy(mutations = ok, dlqFrames = dlqFrames :+ dead)
  }

  /** Three-way merge against the prior value per key; conflicted rows
    * route to the DLQ — the reference's fallback-less path
    * (`merge/standard.go`: unmerged properties with no fallback merger
    * become a ConflictError handed to the DLQ) composed as one stage.
    */
  def mergeOrDlq(before: Column, proposed: Column): Pipeline = {
    val merged = MergeOps.threeWayMerge(mutations, keys, Seq(order),
      before, proposed, (target, _, _) => target) // no fallback: keep target
    val (ok, dead) = Dlq.route(merged,
      Seq("merge_conflict" -> (col("merge_status") === "conflict")))
    copy(mutations = ok, dlqFrames = dlqFrames :+ dead)
  }

  /** Apply a userscript transform pipeline. */
  def transform(script: graft.script.Transforms.Pipeline): Pipeline =
    copy(mutations = script(mutations))

  /** Anti-join away mutations already applied (Stager.FilterApplied). */
  def filterApplied(applied: DataFrame, idCols: Seq[String]): Pipeline =
    copy(mutations = Staging.filterApplied(mutations, applied, idCols))

  /** Reduce to last-one-wins state per key. */
  def latestByKey(): Pipeline =
    copy(mutations = Msort.latestByKey(mutations, keys, order))

  /** Drop rows whose final operation is a tombstone. */
  def dropDeletesWhere(isDelete: Column): Pipeline =
    copy(mutations = mutations.filter(!isDelete))

  /** Dispatch to routes, then apply EACH route under its own
    * [[graft.cdc.Apply.Config]] — the reference's per-table applycfg
    * (`internal/util/applycfg/conf.go:52` consumed by
    * `internal/target/apply`): one pipeline fans out to multiple target
    * tables whose CAS columns, deadlines, and rewrites all differ.
    * Routes without a config reduce latest-by-`order`.
    */
  def dispatchApplyEach(routes: Seq[(String, Column)],
      configs: Map[String, Apply.Config],
      defaultRoute: Option[String] = None): Map[String, DataFrame] =
    graft.script.Transforms.dispatch(mutations, routes, defaultRoute)
      .map { case (route, df) =>
        route -> Apply.applyWith(df, keys, order,
          configs.getOrElse(route, Apply.Config()))
      }

  /** The materialized state (lazy — a plan, not a result). */
  def state: DataFrame = mutations

  /** All DLQ'd mutations with their reasons. DLQ stages may fire at
    * different points in the pipeline (before/after transforms), so the
    * frames can have different schemas — missing columns null-fill.
    */
  def deadLetters: Option[DataFrame] =
    dlqFrames.reduceOption(_.unionByName(_, allowMissingColumns = true))

  /** Write the state as a partitioned target table. */
  def sink(path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = mutations.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }
}

object Pipeline {

  /** Re-process dead letters after a config fix and fold the result
    * into the current target state. Reference `internal/target/dlq`:
    * DLQ rows are ordinary mutations written to a re-processable
    * table; once the condemning config/script is corrected an operator
    * replays them into the target.
    *
    * Flow: drop the DLQ bookkeeping columns (`scratchCols`), anti-join
    * away dead letters whose identity (`idCols`) is already present in
    * `applied` — that makes replay IDEMPOTENT: replaying the same DLQ
    * twice, or a DLQ overlapping mutations that later applied through
    * the normal path, converges to the same state — then run the
    * remainder through the `corrected` pipeline and merge with
    * `applied` under last-one-wins `order` (a replayed old mutation
    * never clobbers newer applied state; schemas may differ per stage,
    * so missing columns null-fill).
    *
    * Scale shape: the DLQ is small relative to the target (it holds
    * failures, not the corpus), so the anti-join broadcasts the DLQ's
    * id projection and the union's `latestByKey` shuffles only
    * replay-touched partitions under AQE.
    */
  def replayDlq(deadLetters: DataFrame, applied: DataFrame,
      keys: Seq[String], order: Column, idCols: Seq[String],
      scratchCols: Seq[String] = Seq("dlq_reason", "target_value",
        "merge_status", "resolved_value"))
      (corrected: Pipeline => Pipeline): DataFrame = {
    val muts = deadLetters.drop(scratchCols: _*)
    val fresh = Staging.filterApplied(muts, applied, idCols)
    val replayed = corrected(Pipeline(fresh, keys, order)).state
    Msort.latestByKey(
      applied.unionByName(replayed, allowMissingColumns = true), keys, order)
  }
}
