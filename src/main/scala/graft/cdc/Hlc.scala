package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hybrid-logical-clock timestamps as Spark columns.
  *
  * The reference models CDC effective time as an HLC pair
  * (`internal/util/hlc/hlc.go:37` — `(nanos int64, logical int)`,
  * compared lexicographically, rendered as `NNNN.LLLLLLLLLL`).
  *
  * Spark-first re-expression: an HLC is a two-field struct column
  * `struct(nanos: long, logical: int)`. Struct comparison in Catalyst is
  * lexicographic by field position, so `max_by(row, hlc)`, `max(hlc)`,
  * range filters and sort orders all get the reference's `hlc.Compare`
  * semantics with zero custom code — and stay inside whole-stage codegen.
  */
object Hlc {
  /** Build an HLC struct column from wall nanos + logical tick. */
  def hlc(nanos: Column, logical: Column): Column =
    struct(nanos.cast("long").as("nanos"), logical.cast("int").as("logical"))

  /** HLC from a timestamp column (wall time only, logical=0). */
  def fromTimestamp(ts: Column): Column =
    hlc(unix_micros(ts) * lit(1000L), lit(0))

  /** HLC from a timestamp plus a deterministic logical tiebreak column
    * (the reference uses the logical component to order mutations that
    * share a wall clock — see `hlc.go:Parse`).
    */
  def fromTimestamp(ts: Column, logical: Column): Column =
    hlc(unix_micros(ts) * lit(1000L), logical)

  /** Render as the reference's decimal string form `NNNN.LLLLLLLLLL`
    * (`hlc.go:String`): nanos, a dot, zero-padded 10-digit logical.
    */
  def render(h: Column): Column =
    concat(h.getField("nanos").cast("string"), lit("."),
      lpad(h.getField("logical").cast("string"), 10, "0"))

  /** `a` strictly before `b` (struct comparison is lexicographic). */
  def before(a: Column, b: Column): Column = a < b
}
