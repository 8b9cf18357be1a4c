package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hilbert curve over two dimensions — the stronger-locality alternative
  * to [[ZOrder]] for multi-column data layout. Morton interleave has
  * "seams": consecutive z-values can jump across the full grid (the curve
  * teleports at power-of-two boundaries), so some files span a huge
  * bounding box on one axis. The Hilbert curve visits every cell by
  * unit steps — consecutive indices are always grid-adjacent — so equal
  * chunks of the curve tile into compact blobs and per-file min/max
  * footer stats stay tight on BOTH axes (the reason Delta/Iceberg offer
  * OPTIMIZE … HILBERT alongside Z-order). q220 measures the difference
  * on real per-file bounding boxes.
  *
  * The index is the standard iterated quadrant rotate/flip transform
  * (public-domain xy2d formulation), expressed as a pure Catalyst
  * when/bitwiseAND expression tree — no UDF, so the one-time layout
  * write stays inside codegen, and the identical integer steps are
  * replayable in any SQL engine (the q220 oracle rebuilds it as a CTE
  * chain).
  */
object Hilbert {

  /** Hilbert index of (x, y) on the 2^order × 2^order grid. Inputs must
    * be in [0, 2^order); callers bucketize first (same contract as
    * [[ZOrder.zvalue2]]). Expression size grows ~3^order, so keep order
    * small (≤ 8) — layout grids are coarse by design.
    */
  def index(order: Int)(x0: Column, y0: Column): Column = {
    require(order > 0 && order <= 8, s"order must be in [1,8], got $order")
    val n = 1L << order
    var x = x0.cast("long")
    var y = y0.cast("long")
    var d: Column = lit(0L)
    var s = n / 2
    while (s > 0) {
      val rx = when(x.bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      val ry = when(y.bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      // quadrant rank: (3·rx) xor ry, spelled as the 4-case table so the
      // SQL twin needs no xor operator
      d = d + lit(s * s) * (when(rx === 0 && ry === 0, 0L)
        .when(rx === 0, 1L).when(ry === 1, 2L).otherwise(3L))
      val fx = when(rx === 1, lit(n - 1) - x).otherwise(x)
      val fy = when(rx === 1, lit(n - 1) - y).otherwise(y)
      // rotate: when ry = 0, (x, y) ← (flip(y), flip(x)); else unchanged
      val nx = when(ry === 0, fy).otherwise(x)
      val ny = when(ry === 0, fx).otherwise(y)
      x = nx
      y = ny
      s /= 2
    }
    d
  }

  /** The identical transform on plain longs — the spec's reference
    * implementation and the doc of record for the column version. */
  def indexJvm(order: Int, x0: Long, y0: Long): Long = {
    val n = 1L << order
    var x = x0; var y = y0; var d = 0L; var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }
}
