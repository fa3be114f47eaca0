package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Target-side apply semantics: upsert/delete materialization, CAS
  * columns, deadlines, and declarative schema mapping.
  *
  * Reference: `internal/target/apply` (ordered upsert/delete batches) and
  * `internal/util/applycfg/conf.go:52` (per-table Config: CASColumns,
  * Deadlines, Exprs, Extras, Ignore, SourceNames).
  *
  * Spark-first design: "apply a stream of mutations to a table" becomes
  * "reduce the mutation set to the final row per key" — a single hash
  * aggregation, after which tombstones are dropped. The reference replays
  * mutations row-by-row against a SQL target; on Spark the same result is
  * a shuffle-once `max_by`, which is what survives a 100 TB replay.
  */
object Apply {
  private[cdc] val log = org.slf4j.LoggerFactory.getLogger(Apply.getClass)

  /** Materialize current state from an upsert/delete mutation stream:
    * last-one-wins per key, then drop keys whose final op is a delete
    * (reference: `types.Mutation.IsDelete`, `types.go:143`).
    */
  def upsertDelete(muts: DataFrame, keys: Seq[String], order: Column, isDelete: Column): DataFrame = {
    val withTomb = muts.withColumn("__tomb", isDelete)
    Msort.latestByKey(withTomb, keys, order)
      .filter(!col("__tomb"))
      .drop("__tomb")
  }

  /** Compare-and-set apply: a mutation only replaces the current row if
    * its CAS column tuple is greater (reference: applycfg.CASColumns —
    * "the columns for compare-and-set operations"). Over a whole batch
    * this reduces to keeping the row with the maximal CAS tuple per key.
    */
  def casApply(muts: DataFrame, keys: Seq[String], casOrder: Column): DataFrame =
    Msort.latestByKey(muts, keys, casOrder)

  /** Deadline filter: discard mutations older than `resolved - deadline`
    * (reference: applycfg.Deadlines — drop changes that are already stale
    * when they arrive). `resolved` is the max mutation time in the batch,
    * computed distributively and joined back as a broadcast scalar — no
    * driver-side collect.
    */
  def deadlineFilter(muts: DataFrame, ts: String, deadline: String): DataFrame = {
    val resolved = muts.agg(max(col(ts)).as("__resolved"))
    muts.crossJoin(broadcast(resolved))
      .filter(col(ts) >= col("__resolved") - expr(s"INTERVAL $deadline"))
      .drop("__resolved")
  }

  /** Per-target apply configuration — the reference's `applycfg.Config`
    * (`internal/util/applycfg/conf.go:52`), one per dispatch route:
    * CASColumns (CAS tuple order), Deadlines, Exprs (synthetic column
    * rewrites), and the tombstone predicate. A multi-table pipeline
    * hands each route ITS OWN config (see `Pipeline.dispatchApplyEach`)
    * — two routes may CAS on entirely different columns.
    */
  final case class Config(
      casOrder: Option[Column] = None,
      deadline: Option[(String, String)] = None,
      exprs: Seq[(String, Column)] = Nil,
      isDelete: Option[Column] = None)

  /** Apply one route's mutation stream under its own [[Config]]:
    * rewrites → deadline filter → CAS-or-latest reduce → tombstone
    * drop. `order` is the fallback mutation order when the config has
    * no CAS columns.
    */
  def applyWith(muts: DataFrame, keys: Seq[String], order: Column,
      cfg: Config): DataFrame = {
    val rewritten = cfg.exprs.foldLeft(muts) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
    val fresh = cfg.deadline match {
      case Some((ts, d)) => deadlineFilter(rewritten, ts, d)
      case None => rewritten
    }
    val reduced = Msort.latestByKey(fresh, keys, cfg.casOrder.getOrElse(order))
    cfg.isDelete match {
      case Some(p) => reduced.filter(!coalesce(p, lit(false)))
      case None => reduced
    }
  }

  /** Declarative source→target schema mapping (reference: applycfg
    * SourceNames renames, Exprs synthetic expressions, Ignore drops,
    * Extras packs unmapped source columns into a JSON column; plus
    * `internal/target/schemawatch` which discovers the target shape).
    * All of it is a single `select` — Catalyst prunes the parquet scan to
    * exactly the referenced source columns.
    *
    * Configured names go through [[Ident.parse]]
    * (reference `internal/util/ident/parse.go:34`): unquoted names fold
    * case (`USER_ID` hits `user_id`), quoted names (`"Order ID"`,
    * `"ID"`) match exactly even in case-insensitive mode, and dotted
    * qualification resolves suffix-wise (`"t"."id"` hits column `id`).
    */
  def schemaMap(
      src: DataFrame,
      renames: Seq[(String, String)],
      exprs: Seq[(String, Column)],
      ignore: Seq[String],
      extrasJson: Option[(String, Seq[String])],
      caseSensitive: Boolean = false): DataFrame = {
    // source columns are DATA: parse leniently, never throw on a shape
    val srcParts: Map[String, Seq[Ident.Part]] =
      src.columns.map(c => c -> Ident.parseLenient(c)).toMap
    // configured names are CONFIG: parse strictly (unmatched quote etc.
    // is a user error worth failing loudly on)
    def spec(n: String, what: String): Seq[Ident.Part] = {
      val p = try Ident.parse(n) catch {
        case e: IllegalArgumentException => throw new IllegalArgumentException(
          s"schemaMap: cannot parse $what '$n': ${e.getMessage}")
      }
      if (p.isEmpty) throw new IllegalArgumentException(
        s"schemaMap: empty $what name")
      p
    }
    def hits(s: Seq[Ident.Part], c: String): Boolean =
      Ident.suffixMatches(srcParts(c), s, caseSensitive)
    // resolve configured names to ACTUAL source columns under the
    // requested sensitivity — col("ID") would otherwise still resolve
    // `id` through Spark's case-insensitive resolver even when this
    // mapping is case-sensitive, leaving the column both kept and
    // renamed (duplicated) instead of erroring. With case-VARIANT
    // duplicate source columns (`id` AND `ID`), an exact-case match
    // wins (as SchemaWatch.align does); no exact match among several
    // fold-equal candidates is ambiguous and errors rather than
    // silently binding to whichever column comes first. Quoting the
    // config name (`"ID"`) disambiguates: quoted parts match exactly.
    def actual(n: String, what: String): String = {
      val s = spec(n, what)
      src.columns.filter(hits(s, _)) match {
        case Array() => throw new IllegalArgumentException(
          s"schemaMap: $what '$n' does not match any source column" +
            (if (caseSensitive) " (case-sensitive)" else ""))
        case Array(one) => one
        case many => many.find(_ == Ident.lastName(s)).getOrElse(
          throw new IllegalArgumentException(
            s"schemaMap: $what '$n' is ambiguous among case-variant " +
              s"source columns [${many.mkString(", ")}] — name one exactly" +
              " (quote it to force an exact-case match)"))
      }
    }
    val ignoreSpecs = ignore.map(spec(_, "ignore"))
    // renames/extras resolve through actual() and fail loudly on a miss;
    // an ignore that matches nothing is SILENT — the column flows to the
    // target unignored. Common cause: an unquoted name with a literal
    // dot ('address.city') now parses as a qualified name. Warn with the
    // quoted form as the migration path instead of losing the intent.
    ignore.zip(ignoreSpecs).foreach { case (n, s) =>
      if (!src.columns.exists(hits(s, _)))
        Apply.log.warn(s"schemaMap: ignore '$n' matches NO source column — " +
          "the column (if any) will flow to the target. A literal dot in " +
          "the name must be quoted: ignore \"" + n + "\" (quoted form).")
    }
    val renameSpecs = renames.map(r => spec(r._1, "rename source"))
    val extrasSpecs = extrasJson.map(_._2.map(spec(_, "extras column"))).getOrElse(Nil)
    val kept = src.columns.filterNot(c =>
      ignoreSpecs.exists(hits(_, c)) ||
        renameSpecs.exists(hits(_, c)) ||
        extrasSpecs.exists(hits(_, c)))
    // two kept columns folding to one name (`id` AND `ID`) would hit
    // Spark's ambiguous-resolver error at col(c) regardless of this
    // mapping's own sensitivity (name resolution is a session conf) —
    // fail here with an actionable message instead
    val keptDups = kept.groupBy(_.toLowerCase).filter(_._2.length > 1)
    if (keptDups.nonEmpty)
      throw new IllegalArgumentException(
        "schemaMap: case-variant duplicate source columns are all kept: " +
          keptDups.values.map(_.mkString("/")).mkString(", ") +
          " — rename or ignore all but one of each")
    // even the exact-case name actual() picked cannot be SELECTED by
    // name when its case-variant twin survives to the same frame —
    // Spark's resolver folds case per session conf, so col("ID") is
    // ambiguous whenever both `id` and `ID` exist. Positionally rename
    // only the fold-duplicated columns to unique scratch names first
    // (everything else keeps its name, so user `exprs` still resolve),
    // then reference renames/extras through the scratch name.
    val foldDups = src.columns.groupBy(_.toLowerCase).filter(_._2.length > 1).keySet
    val safeNames = src.columns.zipWithIndex.map { case (c, i) =>
      if (foldDups.contains(c.toLowerCase)) s"__graft_c$i" else c }
    val base = if (foldDups.isEmpty) src else src.toDF(safeNames.toIndexedSeq: _*)
    def ref(actualName: String): Column = col(safeNames(src.columns.indexOf(actualName)))
    val cols =
      kept.map(c => ref(c).as(c)).toIndexedSeq ++
        renames.map { case (from, to) => ref(actual(from, "rename source")).as(to) } ++
        exprs.map { case (name, e) => e.as(name) } ++
        extrasJson.toSeq.map { case (name, srcCols) =>
          // JSON keys stay the ACTUAL source column names (as before the
          // scratch rename), not the configured spelling
          to_json(struct(srcCols.map { c =>
            val a = actual(c, "extras column"); ref(a).as(a)
          }: _*)).as(name)
        }
    base.select(cols: _*)
  }
}
