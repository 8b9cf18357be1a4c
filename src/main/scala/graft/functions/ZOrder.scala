package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve over two dimensions — the data-layout half of
  * multi-column data skipping. Range-partitioning + sorting a table by ONE
  * column gives parquet footers tight min/max stats on that column only; a
  * predicate on any other column prunes nothing. Sorting by the
  * interleaved Morton value bounds BOTH dimensions within every file, so
  * a selective filter on either column (or both) skips most row groups on
  * footer stats alone — no index structure, just layout.
  *
  * Built from plain shift/mask Catalyst expressions (shiftleft /
  * bitwiseAND / bitwiseOR), so the z-value computation rides whole-stage
  * codegen during the one-time layout write and costs nothing at read
  * time (readers filter on the RAW columns; the curve only decided file
  * placement — same contract as Delta/Iceberg OPTIMIZE ZORDER BY).
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative int
    * columns: bit i of `a` lands at position 2i+1, bit i of `b` at 2i.
    * Callers bucketize arbitrary domains down to `bits` beforehand
    * (e.g. `pmod(hash(c), 1 << bits)` for strings, range buckets for
    * skewed ints). 2×bits ≤ 62 keeps the result in a long.
    */
  def zvalue2(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      val aBit = shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)),
        2 * i + 1)
      val bBit = shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)),
        2 * i)
      aBit.bitwiseOR(bBit)
    }.reduce(_ bitwiseOR _)
  }
}
