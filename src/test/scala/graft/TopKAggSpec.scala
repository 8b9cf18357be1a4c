package graft

import graft.functions.TopK
import graft.functions.TopK.Scored

/** Direct coverage of the TopK Aggregator's reduce/merge algebra (the q72
  * oracle covers it end-to-end; these pin the buffer semantics — bounded
  * size, tiebreaks, merge-order independence — without Spark in the loop).
  */
class TopKAggSpec extends SparkSpecBase {

  private val agg = new TopK.TopKAgg(3)

  private def reduceAll(xs: Seq[Scored]): Seq[Scored] =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("reduce keeps k best with (score desc, id asc) tiebreak") {
    val out = reduceAll(Seq(
      Scored(1, 0.5), Scored(2, 0.9), Scored(3, 0.9),
      Scored(4, 0.1), Scored(5, 0.7)))
    assert(out === Seq(Scored(2, 0.9), Scored(3, 0.9), Scored(5, 0.7)))
  }

  test("merge is order-independent and bounded") {
    val xs = (1L to 20L).map(i => Scored(i, (i % 7).toDouble / 7))
    val (l, r) = xs.splitAt(9)
    val m1 = agg.merge(reduceAll(l), reduceAll(r))
    val m2 = agg.merge(reduceAll(r), reduceAll(l))
    assert(m1 === m2)
    assert(m1 === reduceAll(xs))
    assert(m1.size === 3)
  }

  test("cutoff fast path: a worse row than the current k-th is a no-op") {
    val b = reduceAll(Seq(Scored(1, 0.9), Scored(2, 0.8), Scored(3, 0.7)))
    assert(agg.reduce(b, Scored(9, 0.1)) eq b) // returns the same buffer
    assert(agg.reduce(b, Scored(9, 0.75)) !==  b)
  }
}
