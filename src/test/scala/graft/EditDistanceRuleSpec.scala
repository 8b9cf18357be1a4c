package graft

import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** The EditDistanceJoinBlocking optimizer rule: a naive
  * `levenshtein(l, r) <= k` theta join must plan as a PassJoin segment
  * equi-join with EXACTLY the naive join's bag of rows — including
  * duplicate-input multiplicity (the canonical-first-match residual
  * replaces any dedup pass) — across edge lengths (empty strings,
  * strings shorter than k+1, nulls), and must stand down on the
  * threshold levenshtein form and on equi-keyed broadcastable joins.
  */
class EditDistanceRuleSpec extends SparkSpecBase {

  // -- reference edit distance (classic DP) ---------------------------------
  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  /** Deterministic fixture: hashed base strings over a 6-letter
    * alphabet (lengths 6–14), plus planted single-edit perturbations
    * (delete / substitute / insert) and short-string edges. */
  private def strings: Seq[(Long, String)] = {
    val alpha = "abcdef"
    def ch(i: Int, p: Int): Char =
      alpha(math.abs(MurmurHash3.productHash((i, p))) % alpha.length)
    val bases = (0 until 60).map { i =>
      val n = 6 + math.abs(MurmurHash3.stringHash("s" + i)) % 9
      (0 until n).map(p => ch(i, p)).mkString
    }
    val perturbed = bases.zipWithIndex.map { case (s, i) =>
      val pos = math.abs(MurmurHash3.stringHash("p" + i)) % s.length
      i % 3 match {
        case 0 => s.substring(0, pos) + s.substring(pos + 1) // delete
        case 1 => s.updated(pos, if (s(pos) == 'a') 'b' else 'a') // subst
        case _ => s.substring(0, pos) + "z" + s.substring(pos) // insert
      }
    }
    val edges = Seq("", "a", "ab", "ba", "abc", "b")
    (bases ++ perturbed ++ edges).zipWithIndex.map { case (s, i) =>
      (i.toLong, s)
    }
  }

  private def frames = {
    val s = spark
    import s.implicits._
    val df = strings.toDF("id", "str")
    (df.select(col("id").as("a"), col("str").as("sa")),
      df.select(col("id").as("b"), col("str").as("sb")))
  }

  private def expectedPairs(k: Int): Seq[(Long, Long)] = (for {
    x <- strings; y <- strings
    if x._1 < y._1 && lev(x._2, y._2) <= k
  } yield (x._1, y._1)).sorted

  test("naive levenshtein theta join plans as segment equi-join, identical bag") {
    val (a, b) = frames
    for (k <- Seq(1, 2, 3)) {
      val joined = a.join(b,
        levenshtein(col("sa"), col("sb")) <= k && col("a") < col("b"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"k=$k must remove the nested loop:\n${plan.take(3000)}")
      assert(plan.contains("graft_edp"), plan.take(3000))
      val got = joined.select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val expected = expectedPairs(k)
      assert(expected.nonEmpty, s"fixture must exercise the k=$k ball")
      assert(got === expected, s"k=$k")
    }
  }

  test("comparison spellings: < k and reversed k >= forms also rewrite") {
    val (a, b) = frames
    val expected = expectedPairs(2)
    val spellings = Seq(
      levenshtein(col("sa"), col("sb")) < 3, // ≡ ≤ 2
      lit(2) >= levenshtein(col("sa"), col("sb")),
      lit(3) > levenshtein(col("sa"), col("sb")),
      levenshtein(col("sb"), col("sa")) <= 2) // swapped orientation
    for (cond <- spellings) {
      val joined = a.join(b, cond && col("a") < col("b"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("graft_edp") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"spelling must rewrite:\n${plan.take(2000)}")
      val got = joined.select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got === expected)
    }
  }

  test("bag semantics: duplicated input rows multiply, pairs never dedup") {
    val (a, b) = frames
    val naiveCount = expectedPairs(2).size
    val j2 = a.union(a).join(b,
      levenshtein(col("sa"), col("sb")) <= 2 && col("a") < col("b"))
    assert(j2.count() === 2L * naiveCount)
  }

  test("k = 0 degenerates to a hash-joinable equality, no explode") {
    val (a, b) = frames
    val joined = a.join(b,
      levenshtein(col("sa"), col("sb")) <= 0 && col("a") < col("b"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("graft_edp") &&
      !plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(3000))
    val got = joined.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === expectedPairs(0))
  }

  test("null operands never match, either spelling") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, "abcdef"), (2L, null), (3L, "abcdeg"))
    val df = rows.toDF("id", "str")
    val a = df.select(col("id").as("a"), col("str").as("sa"))
    val b = df.select(col("id").as("b"), col("str").as("sb"))
    val got = a.join(b,
        levenshtein(col("sa"), col("sb")) <= 1 && col("a") < col("b"))
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sorted
    assert(got === Seq((1L, 3L)))
  }

  test("left semi / anti / outer collapse back to left grain exactly") {
    val (a, b) = frames
    val bEval = b.filter(col("b") % 7 === 0)
    val evalStrs = strings.filter(_._1 % 7 == 0)
    val matched = strings.filter(x =>
      evalStrs.exists(e => lev(x._2, e._2) <= 2)).map(_._1).sorted
    val semi = a.join(bEval,
      levenshtein(col("sa"), col("sb")) <= 2, "left_semi")
    assert(semi.queryExecution.executedPlan.toString.contains("graft_edp"))
    assert(semi.select("a").collect().map(_.getLong(0)).toSeq.sorted
      === matched)
    val anti = a.join(bEval,
      levenshtein(col("sa"), col("sb")) <= 2, "left_anti")
    assert(anti.queryExecution.executedPlan.toString.contains("graft_edp"))
    assert(anti.select("a").collect().map(_.getLong(0)).toSeq.sorted
      === strings.map(_._1).filterNot(matched.contains).sorted)
    val outer = a.join(bEval,
      levenshtein(col("sa"), col("sb")) <= 2, "left_outer")
    assert(outer.queryExecution.executedPlan.toString.contains("graft_edp"))
    val gotOuter = outer.select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSeq.sorted
    val expOuter = strings.flatMap { x =>
      val ms = evalStrs.filter(e => lev(x._2, e._2) <= 2).map(_._1)
      if (ms.isEmpty) Seq((x._1, -1L)) else ms.map(m => (x._1, m))
    }.sorted
    assert(gotOuter === expOuter)
  }

  test("exhaustive: all strings over {a,b} up to length 4, every k") {
    // 31 strings → 961 ordered pairs; covers every short-string edge
    // geometry (empty, length < k+1, zero-length segments) completely
    val s = spark
    import s.implicits._
    val all = (0 to 4).flatMap { n =>
      (0 until (1 << n)).map { bits =>
        (0 until n).map(i => if ((bits >> i & 1) == 1) 'b' else 'a')
          .mkString
      }
    }.zipWithIndex.map { case (st, i) => (i.toLong, st) }
    val df = all.toDF("id", "str")
    val aa = df.select(col("id").as("a"), col("str").as("sa"))
    val bb = df.select(col("id").as("b"), col("str").as("sb"))
    for (k <- 1 to 3) {
      val joined = aa.join(bb, levenshtein(col("sa"), col("sb")) <= k)
      assert(joined.queryExecution.executedPlan.toString
        .contains("graft_edp"), s"k=$k must rewrite")
      val got = joined.select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val expected = (for {
        x <- all; y <- all if lev(x._2, y._2) <= k
      } yield (x._1, y._1)).sorted
      assert(got === expected, s"k=$k")
    }
  }

  test("stand-down: threshold levenshtein form is never eligible") {
    val (a, b) = frames
    val joined = a.join(b,
      expr("levenshtein(sa, sb, 2)") <= 2 && col("a") < col("b"))
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(!plan.contains("graft_edp"), plan.take(3000))
  }

  test("stand-down: user equi key + broadcastable side leaves the join alone") {
    val (a, b) = frames
    val joined = a.join(b,
      col("a") === col("b") && levenshtein(col("sa"), col("sb")) <= 2)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("graft_edp"), plan.take(3000))
    assert(joined.count() === strings.length.toLong)
  }

  test("composition: blocked fuzzy join plans (block, segment) keys") {
    val s = spark
    import s.implicits._
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val blkOf = (i: Long) => if (i % 2 == 0) "x" else "y"
      val df = strings.map { case (id, st) => (id, st, blkOf(id)) }
        .toDF("id", "str", "blk")
      val a = df.select(col("id").as("a"), col("str").as("sa"),
        col("blk").as("ba"))
      val b = df.select(col("id").as("b"), col("str").as("sb"),
        col("blk").as("bb"))
      val joined = a.join(b,
        col("ba") === col("bb") &&
          levenshtein(col("sa"), col("sb")) <= 2 && col("a") < col("b"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("graft_edp"),
        s"rule must compose, not stand down:\n${plan.take(3000)}")
      val got = joined.select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val expected = (for {
        x <- strings; y <- strings
        if x._1 < y._1 && blkOf(x._1) == blkOf(y._1) &&
          lev(x._2, y._2) <= 2
      } yield (x._1, y._1)).sorted
      assert(expected.nonEmpty)
      assert(got === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("relative thresholds with a provable cap rewrite; unbounded stand down") {
    val (a, b) = frames
    // per-row k = least(2, length(sa) div 8): short strings demand
    // closer matches — the PassJoin machinery enumerates at the cap
    // K = 2 and the kept condition applies the row's own k exactly
    val kExpr = least(lit(2), expr("length(sa) div 8"))
    val joined = a.join(b,
      levenshtein(col("sa"), col("sb")) <= kExpr && col("a") < col("b"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("graft_edp"),
      s"capped relative threshold must rewrite:\n${plan.take(3000)}")
    val got = joined.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val expected = (for {
      x <- strings; y <- strings
      if x._1 < y._1 &&
        lev(x._2, y._2) <= math.min(2, x._2.length / 8)
    } yield (x._1, y._1)).sorted
    assert(expected.nonEmpty && got === expected)
    // CASE ladder cap (all arms literal) also rewrites
    val caseK = when(length(col("sa")) > 10, lit(2)).otherwise(lit(1))
    val j2 = a.join(b,
      levenshtein(col("sa"), col("sb")) <= caseK && col("a") < col("b"))
    assert(j2.queryExecution.executedPlan.toString.contains("graft_edp"))
    val got2 = j2.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val exp2 = (for {
      x <- strings; y <- strings
      if x._1 < y._1 &&
        lev(x._2, y._2) <= (if (x._2.length > 10) 2 else 1)
    } yield (x._1, y._1)).sorted
    assert(exp2.nonEmpty && got2 === exp2)
    // bare length-relative threshold has NO provable cap — stand down
    val j3 = a.join(b,
      levenshtein(col("sa"), col("sb")) <=
        expr("length(sa) div 8") && col("a") < col("b"))
    assert(!j3.queryExecution.optimizedPlan.toString.contains("graft_edp"))
  }

  test("least with only a NULLABLE bounded child stands down (null-skip hole)") {
    // least() SKIPS null children: `least(when(len>100, 1), len)` has a
    // no-ELSE CASE child bounded by 1, but on every row with len ≤ 100
    // that child is null and the RUNTIME threshold is the unbounded
    // sibling `len`. Taking the CASE's cap would enumerate PassJoin at
    // K = 1 and silently drop qualifying pairs like
    // ('abcdefgh','zbcdefgz') with lev = 2 ≤ len = 8 — so no nullable
    // child may contribute the cap, and with no non-nullable bounded
    // child the rule must stand down to the exact naive join.
    val s = spark
    import s.implicits._
    val a = Seq((1L, "abcdefgh"), (2L, "zbcdefgz"), (3L, "qq"))
      .toDF("a", "sa")
    val b = a.select(col("a").as("b"), col("sa").as("sb"))
    val kExpr = least(when(length(col("sa")) > 100, 1), length(col("sa")))
    val j = a.join(b,
      levenshtein(col("sa"), col("sb")) <= kExpr && col("a") < col("b"))
    assert(!j.queryExecution.optimizedPlan.toString.contains("graft_edp"),
      "nullable-only bounded least child must not produce a cap")
    // every pair qualifies under the RUNTIME threshold len(sa) = 8
    // (lev = 2 for the twin pair, lev = 8 = len for the 'qq' pairs);
    // the buggy cap K = 1 dropped all three
    val got = j.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    // LEFT ANTI direction of the same hole: a missed candidate would
    // wrongly KEEP row 1 ("docs with no fuzzy twin")
    val anti = a.join(b,
      levenshtein(col("sa"), col("sb")) <= kExpr && col("a") =!= col("b"),
      "left_anti")
    assert(anti.select("a").as[Long].collect().sorted === Seq(3L))
    // a NON-NULLABLE literal sibling still caps: least(2, when-ladder)
    // rewrites at K = 2 regardless of the nullable child
    val j2 = a.join(b,
      levenshtein(col("sa"), col("sb")) <=
        least(lit(2), when(length(col("sa")) > 100, 1)) &&
        col("a") < col("b"))
    assert(j2.queryExecution.optimizedPlan.toString.contains("graft_edp"))
    assert(j2.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted === Seq((1L, 2L)))
  }

  test("defense in depth: non-deterministic operand stands down at the rule gate") {
    // the analyzer rejects non-deterministic join conditions, so this
    // shape cannot arrive via the DataFrame API — apply the rule
    // directly to a hand-built plan to pin the rule's OWN guard
    import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, LessThanOrEqual, Levenshtein, Literal, Rand}
    import org.apache.spark.sql.catalyst.plans.Inner
    import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint}
    import org.apache.spark.sql.types.StringType
    val (a, b) = frames
    val ap = a.queryExecution.analyzed
    val bp = b.queryExecution.analyzed
    val sa = ap.output.find(_.name == "sa").get
    val sb = bp.output.find(_.name == "sb").get
    val noisy = Concat(Seq(sa, Cast(Rand(Literal(42L)), StringType)))
    for (cond <- Seq(
      LessThanOrEqual(Levenshtein(noisy, sb, None), Literal(1)),
      // the k = 0 equality arm must apply the same guard
      LessThanOrEqual(Levenshtein(noisy, sb, None), Literal(0)))) {
      val j = Join(ap, bp, Inner, Some(cond), JoinHint.NONE)
      val out = graft.plans.EditDistanceJoinBlocking(j)
      assert(!out.output.exists(_.name.startsWith("graft_")) &&
        out.fastEquals(j), out.toString.take(2000))
    }
  }
}
