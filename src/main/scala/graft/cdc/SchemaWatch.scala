package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Dynamic target-schema discovery and drift handling.
  *
  * Reference: `internal/target/schemawatch/watcher.go:104` (`Refresh`)
  * — the target's column set is re-discovered at runtime and apply
  * re-maps source columns onto the CURRENT target shape, so a column
  * added or dropped between two batches is handled without restart.
  *
  * Spark-first: "the current target shape" is a `StructType`; aligning
  * a batch onto it is a projection — source columns missing from the
  * target are dropped, target columns missing from the batch null-pad
  * (the reference applies NULL for unknown columns the same way). No
  * per-row work: drift is resolved once per batch at plan time.
  */
object SchemaWatch {

  /** Project `batch` onto `target`: name-matched columns pass through
    * (cast to the target type), target-only columns become NULL,
    * batch-only columns drop.
    *
    * Matching is CASE-INSENSITIVE by default, the reference's behavior
    * throughout (`internal/util/ident` canonicalizes identifiers, so a
    * MySQL feed emitting `USER_ID` maps onto a target `user_id` rather
    * than silently null-padding). Both sides pass through
    * [[Ident.parseLenient]] (reference `internal/util/ident/parse.go`),
    * so a feed emitting quoted/qualified keys — `"User"."Order ID"` —
    * binds to target column `Order ID` exactly (quoted parts are
    * case-exact even in case-insensitive mode), and dotted
    * qualification resolves suffix-wise. Quoted-identifier pipelines
    * that distinguish case everywhere pass `caseSensitive = true`. When
    * two batch columns resolve to the same target field (`id` and
    * `ID`), the exact-case match wins, then first-in-batch order —
    * deterministic, like the reference's canonical-map insertion order.
    */
  def align(batch: DataFrame, target: StructType,
      caseSensitive: Boolean = false): DataFrame = {
    val names = batch.columns.toIndexedSeq
    // positional temp names: a batch carrying BOTH `id` and `ID` would
    // make a name-based col("id") ambiguous under Spark's (default
    // case-insensitive) resolver — selecting by position sidesteps the
    // resolver entirely, so the winner choice below is authoritative
    val tmp = batch.toDF(names.indices.map(i => s"__c$i"): _*)
    val batchParts = names.map(Ident.parseLenient)
    tmp.select(target.fields.toIndexedSeq.map { f =>
      val fp = Ident.parseLenient(f.name)
      val cands = names.indices.filter(i =>
        Ident.suffixMatches(batchParts(i), fp, caseSensitive))
      val src = cands.find(names(_) == f.name).orElse(cands.headOption)
      src match {
        case Some(i) => col(s"__c$i").cast(f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }: _*)
  }

  /** Union a sequence of schema-drifting batches under the NEWEST
    * batch's schema (the watcher's latest Refresh result) — the apply
    * path for a feed whose upstream evolved mid-stream.
    */
  def evolve(batches: Seq[DataFrame], target: Option[StructType] = None,
      caseSensitive: Boolean = false): DataFrame = {
    require(batches.nonEmpty, "evolve needs at least one batch")
    val tgt = target.getOrElse(batches.last.schema)
    batches.map(align(_, tgt, caseSensitive)).reduce(_.unionByName(_))
  }
}
