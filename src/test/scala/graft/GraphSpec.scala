package graft

import org.apache.spark.sql.DataFrame

import graft.queries.GraphPack

/** Hand-computed fixtures for the graph pack (q189 LPA, q190 BFS, q191
  * item-item CF) — tiny basket topologies whose communities, hop
  * distances, and cosine rankings are verified by hand, including the
  * tie-break paths the oracle's row_number ordering exercises.
  */
class GraphSpec extends SparkSpecBase {

  import spark.implicits._

  /** Baskets o1{1,2,3} o2{2,3,4} o3{5,6} o4{1,3} → edges 1-2, 1-3, 2-3,
    * 2-4, 3-4, 5-6: a 4-clique-ish block, a detached pair.
    */
  private def baskets: DataFrame =
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 2L), (2L, 3L), (2L, 4L),
      (3L, 5L), (3L, 6L), (4L, 1L), (4L, 3L))
      .toDF("l_orderkey", "l_partkey")

  test("LPA: two synchronous rounds, most-frequent vote, min-label ties") {
    // Round 1 (all labels = ids, every vote ties → min neighbor id):
    //   1→2, 2→1, 3→1, 4→2, 5→6, 6→5.
    // Round 2 (true frequency votes appear):
    //   1: nbrs {2,3} labeled {1,1} → 1;   2: nbrs {1,3,4} = {2,1,2} → 2
    //   3: nbrs {1,2,4} = {2,1,2} → 2;     4: nbrs {2,3} = {1,1} → 1
    //   5 ↔ 6 keep swapping their ids.
    val got = GraphPack.lpaLabels(baskets).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L,
      5L -> 5L, 6L -> 6L))
  }

  test("BFS: hop = first-discovery round from the hub seed set") {
    // 13-node path 1-2-…-13: degree 2 everywhere except the ends, so the
    // top-10 (degree desc, id asc) seeds are nodes 2..11. Hop 1 reaches
    // the leftovers adjacent to seeds {1, 12}; hop 2 reaches 13; round 3
    // discovers nothing and must contribute no rows.
    val chain = (1L to 12L).flatMap(k => Seq((k, k), (k, k + 1)))
      .toDF("l_orderkey", "l_partkey")
    val got = GraphPack.bfsVisited(chain).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = ((2L to 11L).map(_ -> 0) ++ Seq(1L -> 1, 12L -> 1, 13L -> 2))
      .toMap
    assert(got === want)
  }

  test("item-item CF: cosine ranking with deterministic tie-break") {
    val rows = GraphPack.itemCf(baskets).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // supports: n(1)=2 n(2)=2 n(3)=3 n(4)=1; co(1,3)=2 co(2,3)=2.
    // item 1: top = 3 (2/√6 ≈ .816497) over 2 (1/√4 = .5)
    assert(rows((1L, 1)) === ((3L, 2L, 0.816497)))
    assert(rows((1L, 2)) === ((2L, 1L, 0.5)))
    // item 3: neighbors 1 and 2 tie at 2/√6 → neighbor asc breaks it
    assert(rows((3L, 1)) === ((1L, 2L, 0.816497)))
    assert(rows((3L, 2)) === ((2L, 2L, 0.816497)))
    assert(rows((3L, 3)) === ((4L, 1L, 0.57735)))
    // detached pair: perfect similarity both ways
    assert(rows((5L, 1)) === ((6L, 1L, 1.0)))
    assert(rows((6L, 1)) === ((5L, 1L, 1.0)))
  }

  test("k-core peel on testdata agrees with an independent JVM peel") {
    val edges = graft.functions.CoPurchase.distinctPairs(
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = (edges ++ edges.map(e => (e._2, e._1))).toSeq
    val deg0 = sym.groupBy(_._1).map { case (u, v) => u -> v.size }
    var alive = deg0.filter(_._2 >= 3).keySet
    (2 to 3).foreach { _ =>
      val d = sym.filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).map { case (u, v) => u -> v.size }
      alive = d.filter(_._2 >= 3).keySet
    }
    val got = SparkEntry.queries("q271_kcore_peel")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.map(_._1).toSet === deg0.keySet)
    got.foreach { case (u, d0, flag) =>
      assert(d0 === deg0(u).toLong, s"deg of $u")
      assert(flag === (if (alive(u)) 1 else 0), s"core flag of $u")
    }
    // peeling is monotone: the core is a subset of the degree>=k filter,
    // and at least one node must have been peeled by later rounds OR the
    // round-1 filter already stabilized (both observed states are legal;
    // assert the subset direction only)
    assert(got.filter(_._3 == 1).forall(_._2 >= 3))
  }

  test("LPA on testdata agrees with an independent JVM vote recompute") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    // independent edge derivation: plain Scala over collected baskets
    val baskets = li.select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
      .groupBy(_._1).values.map(_.map(_._2).distinct.sorted)
    val edges = baskets.flatMap(ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.size)
        yield (ps(i), ps(j))).toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2) }
    var lbl = adj.keys.map(u => u -> u).toMap
    for (_ <- 1 to 2) {
      lbl = adj.map { case (u, nbrs) =>
        val votes = nbrs.groupBy(lbl).map { case (l, g) => (l, g.size) }
        u -> votes.toSeq.maxBy { case (l, c) => (c, -l) }._1
      }
    }
    val got = GraphPack.lpaLabels(li).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === lbl)
  }
}
