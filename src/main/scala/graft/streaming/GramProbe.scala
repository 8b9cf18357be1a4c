package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the grouped closed-form probe (MiningPack q281):
  * INCREMENTAL MODEL MAINTENANCE. The nine Gram/moment sums are a
  * commutative monoid, so the per-source OLS fit folds over an unbounded
  * document stream with O(1) state per key — each micro-batch adds its
  * rows' contributions and re-SOLVES in closed form (Cramer via BigInt —
  * exact at any accumulated count), emitting the refreshed coefficients.
  * This is the streaming shape of "many models in one pass": a model
  * per source that is always current, with no training epoch anywhere.
  *
  * Parity contract: after the final micro-batch, the emitted
  * (beta0..2, r2) equal the batch q281 on the union of all batches —
  * bit-for-bit, because the Gram sums are exact integers regardless of
  * arrival order (no ordering contract needed, unlike the EWMA
  * recurrence) and the final ratios round to 6 with the same HALF_UP
  * rule (the q259 doctrine). Degenerate state (singular Gram matrix —
  * e.g. a source that has seen one document) emits None coefficients
  * rather than failing the query.
  *
  * Scale notes: state is 10 longs per source; the solve is O(1) per key
  * per batch. Long accumulators hold to ~10⁹ docs per source at these
  * feature magnitudes — the same widening note as the batch q259 — and
  * an eviction timeout is unnecessary at a bounded source vocabulary.
  */
object GramProbe {

  final case class DocFeat(source: String, x1: Long, x2: Long, y: Long)

  final case class Gram(n: Long, s1: Long, s2: Long, sy: Long,
      s11: Long, s12: Long, s22: Long, s1y: Long, s2y: Long, syy: Long)

  final case class Fit(source: String, n: Long, beta0: Option[Double],
      beta1: Option[Double], beta2: Option[Double], r2: Option[Double])

  private val zero = Gram(0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  private def add(g: Gram, r: DocFeat): Gram = Gram(
    g.n + 1, g.s1 + r.x1, g.s2 + r.x2, g.sy + r.y,
    g.s11 + r.x1 * r.x1, g.s12 + r.x1 * r.x2, g.s22 + r.x2 * r.x2,
    g.s1y + r.x1 * r.y, g.s2y + r.x2 * r.y, g.syy + r.y * r.y)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The exact Cramer solve over a Gram state — shared by the stream
    * and its spec so the algebra has one definition site. */
  def solve(src: String, g: Gram): Fit = {
    def det3(a: BigInt, b: BigInt, c: BigInt, p: BigInt, q: BigInt,
        r: BigInt, u: BigInt, v: BigInt, w: BigInt): BigInt =
      a * (q * w - r * v) - b * (p * w - r * u) + c * (p * v - q * u)
    val (n, s1, s2, sy) =
      (BigInt(g.n), BigInt(g.s1), BigInt(g.s2), BigInt(g.sy))
    val (s11, s12, s22) = (BigInt(g.s11), BigInt(g.s12), BigInt(g.s22))
    val (s1y, s2y, syy) = (BigInt(g.s1y), BigInt(g.s2y), BigInt(g.syy))
    val det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    if (det == BigInt(0)) Fit(src, g.n, None, None, None, None)
    else {
      val det0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
      val det1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
      val det2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
      val sse = (det * syy - det0 * sy - det1 * s1y - det2 * s2y).toDouble /
        det.toDouble
      val sst = (n * syy - sy * sy).toDouble / n.toDouble
      Fit(src, g.n,
        Some(r6(det0.toDouble / det.toDouble)),
        Some(r6(det1.toDouble / det.toDouble)),
        Some(r6(det2.toDouble / det.toDouble)),
        Some(r6(1.0 - sse / sst)))
    }
  }

  /** Per-source always-current fit: every micro-batch folds its rows
    * into the Gram state and emits the refreshed closed-form solve. */
  def fitsWithState(docs: Dataset[DocFeat]): Dataset[Fit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.source)
      .mapGroupsWithState[Gram, Fit](GroupStateTimeout.NoTimeout()) {
        (src: String, rows: Iterator[DocFeat], state: GroupState[Gram]) =>
          val g = rows.foldLeft(state.getOption.getOrElse(zero))(add)
          state.update(g)
          solve(src, g)
      }
  }
}
