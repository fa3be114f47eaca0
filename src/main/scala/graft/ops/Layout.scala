package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional clustering.
  *
  * At 100 TB the dominant cost of every selective query is the SCAN,
  * and the lever on the scan is LAYOUT: rows co-sorted so that a
  * predicate on EITHER of two dimensions prunes most files via
  * parquet min/max stats. A single-column sort clusters one dimension
  * and scatters the other; the Z-ORDER (Morton) curve interleaves the
  * bits of both, so ranges of the z-value are small rectangles in
  * (a, b) space — every file holds a bounded span of BOTH dimensions
  * (the technique behind Delta OPTIMIZE ZORDER BY / Hudi clustering).
  *
  * The key itself is a pure per-row bit expression — zero shuffle to
  * compute; the one sort it feeds is the write-side `repartitionByRange`
  * any layout rewrite already pays.
  */
object Layout {

  /** Morton-interleave two quantized nonnegative dimensions of `bits`
    * bits each: bit i of `a` lands at position 2i+1, bit i of `b` at
    * 2i. Emitted as a flat sum of shift/mask terms — one codegen'd
    * integer expression, no loops, no UDF; a SQL oracle states the
    * identical formula with `>>`/`<<`/`&`.
    */
  def zOrderKey(a: Column, b: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }
    terms.reduce(_ + _)
  }
}
