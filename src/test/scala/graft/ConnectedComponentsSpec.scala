package graft

import graft.functions.ConnectedComponents

/** Hand-built graph cases for the CC primitive (q66's oracle covers the
  * end-to-end pipeline; these pin the algorithm on known topologies).
  */
class ConnectedComponentsSpec extends SparkSpecBase {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    ConnectedComponents.run(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two disjoint chains resolve to their min ids") {
    val comp = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)))
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("a long path converges within maxIter (diameter > 2 rounds)") {
    val n = 12L
    val comp = cc((1L until n).map(i => (i, i + 1)))
    assert(comp.values.toSet === Set(1L))
    assert(comp.size === n.toInt)
  }

  test("cycle plus bridge merges into one component") {
    val comp = cc(Seq((5L, 6L), (6L, 7L), (7L, 5L), (7L, 9L), (9L, 2L)))
    assert(comp.values.toSet === Set(2L))
  }
}
