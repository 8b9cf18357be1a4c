package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.tools.RuleToggle

/** The ∅×∅ post-mortem, generalized (VERDICT r9 "what's wrong" #1): a
  * silent wrong answer shipped in r8 because an explode-based rewrite's
  * EMPTY-INPUT truth table was never audited — the demo corpora simply
  * had no empty arrays. This spec pins the full edge-input matrix for
  * every round-9/10/11 set-family arm (containment in both orientations
  * × inner/semi/anti/outer, overlap thresholds, arrays_overlap) against
  * TWO
  * independent truths: a Scala set-model oracle AND the naive
  * (rule-excluded) Spark plan, on a fixture that contains every edge
  * class at once — null arrays, empty arrays, single-element,
  * all-duplicates, identical rows, and duplicated input rows (bag
  * multiplicity). Null-array semantics throughout: the naive condition
  * evaluates null ⇒ no match (and anti therefore KEEPS the row).
  */
class EdgeMatrixSpec extends SparkSpecBase {

  // id → set model (None = null array); every edge class present
  private val fixture: Seq[(Long, Seq[Int])] = Seq(
    (1L, null), // null array
    (2L, Seq.empty[Int]), // empty
    (3L, Seq.empty[Int]), // empty twin (identical rows)
    (4L, Seq(5)), // single-element
    (5L, Seq(5)), // single-element twin
    (6L, Seq(7, 7, 7)), // all-duplicates (distinct = {7})
    (7L, Seq(5, 7)),
    (8L, Seq(5, 7, 9)),
    (9L, Seq(1, 2, 3)))

  private val model: Map[Long, Option[Set[Int]]] =
    fixture.map { case (i, s) => i -> Option(s).map(_.toSet) }.toMap

  private def frames: (DataFrame, DataFrame) = {
    val s = spark
    import s.implicits._
    val df = fixture.toDF("id", "arr")
    (df.select(col("id").as("a"), col("arr").as("ta")),
      df.select(col("id").as("b"), col("arr").as("tb")))
  }

  /** Model pairs (a, b), a ≠ b, under a set predicate; null arrays
    * match nothing. */
  private def pairsWhere(p: (Set[Int], Set[Int]) => Boolean) =
    (for {
      (x, Some(sx)) <- model.toSeq; (y, Some(sy)) <- model.toSeq
      if x != y && p(sx, sy)
    } yield (x, y)).sorted

  private val rule = "graft.plans.SetSimilarityJoinBlocking"

  /** Assert the rule-enabled plan fires, equals the model on
    * (inner pair bag, semi, anti), AND equals the naive plan. */
  private def audit(cond: org.apache.spark.sql.Column,
      expectPairs: Seq[(Long, Long)]): Unit = {
    val (a, b) = frames
    val inner = a.join(b, cond && col("a") =!= col("b"))
    assert(inner.queryExecution.executedPlan.toString.contains("graft_sst"),
      "arm must fire on the edge fixture")
    def collectPairs(df: DataFrame) = df.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(collectPairs(inner) === expectPairs, "inner vs model")
    val semi = a.join(b, cond && col("a") =!= col("b"), "left_semi")
    val expSemi = expectPairs.map(_._1).distinct.sorted
    assert(semi.select("a").collect().map(_.getLong(0)).toSeq.sorted
      === expSemi, "semi vs model")
    val anti = a.join(b, cond && col("a") =!= col("b"), "left_anti")
    assert(anti.select("a").collect().map(_.getLong(0)).toSeq.sorted
      === model.keys.toSeq.sorted.diff(expSemi), "anti vs model")
    // LEFT OUTER: every matched pair once, plus exactly one
    // null-extension row per match-free left row (−1 sentinel)
    def collectOuter(df: DataFrame) = df.select("a", "b").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSeq.sorted
    val expOuter = model.keys.toSeq.flatMap { x =>
      val m = expectPairs.filter(_._1 == x).map(_._2)
      if (m.isEmpty) Seq((x, -1L)) else m.map((x, _))
    }.sorted
    val outer = a.join(b, cond && col("a") =!= col("b"), "left_outer")
    assert(collectOuter(outer) === expOuter, "outer vs model")
    // duplicated input rows: bag multiplicity through every collapse
    val inner2 = a.union(a).join(b, cond && col("a") =!= col("b"))
    assert(inner2.count() === 2L * expectPairs.size, "inner bag ×2")
    val semi2 = a.union(a).join(b, cond && col("a") =!= col("b"),
      "left_semi")
    assert(semi2.count() === 2L * expSemi.size, "semi bag ×2")
    val anti2 = a.union(a).join(b, cond && col("a") =!= col("b"),
      "left_anti")
    assert(anti2.count() === 2L * (model.size - expSemi.size),
      "anti bag ×2")
    val outer2 = a.union(a).join(b, cond && col("a") =!= col("b"),
      "left_outer")
    assert(outer2.count() === 2L * expOuter.size, "outer bag ×2")
    // naive parity (rule excluded) — the second independent truth
    RuleToggle.withExcluded(spark, rule) {
      val nInner = a.join(b, cond && col("a") =!= col("b"))
      assert(!nInner.queryExecution.optimizedPlan.toString
        .contains("graft_sst"))
      assert(collectPairs(nInner) === expectPairs, "naive inner")
      val nSemi = a.join(b, cond && col("a") =!= col("b"), "left_semi")
      assert(nSemi.select("a").collect().map(_.getLong(0)).toSeq.sorted
        === expSemi, "naive semi")
      val nOuter = a.join(b, cond && col("a") =!= col("b"), "left_outer")
      assert(collectOuter(nOuter) === expOuter, "naive outer")
    }
  }

  test("containment, subset on the LEFT: full edge matrix") {
    audit(size(array_except(col("ta"), col("tb"))) === 0,
      pairsWhere((x, y) => x.subsetOf(y)))
  }

  test("containment, MIRRORED (subset on the right): full edge matrix") {
    audit(size(array_except(col("tb"), col("ta"))) === 0,
      pairsWhere((x, y) => y.subsetOf(x)))
  }

  test("overlap threshold ≥ 2: full edge matrix") {
    audit(size(array_intersect(col("ta"), col("tb"))) >= 2,
      pairsWhere((x, y) => x.intersect(y).size >= 2))
  }

  test("overlap threshold ≥ 1 and arrays_overlap: full edge matrix") {
    audit(size(array_intersect(col("ta"), col("tb"))) >= 1,
      pairsWhere((x, y) => x.intersect(y).nonEmpty))
    audit(arrays_overlap(col("ta"), col("tb")),
      pairsWhere((x, y) => x.intersect(y).nonEmpty))
  }

  test("÷-free Jaccard (emptyTrue spelling): full edge matrix") {
    // ∅×∅ is TRUE under 0 ≥ s·0 — the exact r8 silent-wrong-answer
    // class, now on a fixture that ALSO holds null/single/dup rows
    audit(size(array_intersect(col("ta"), col("tb"))) >=
        lit(0.6) * size(array_union(col("ta"), col("tb"))),
      pairsWhere((x, y) =>
        x.intersect(y).size * 10 >= 6 * x.union(y).size))
  }
}
