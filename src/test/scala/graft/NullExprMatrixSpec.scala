package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.tools.RuleToggle

/** The r10 nullable-`least()` post-mortem, generalized (VERDICT r10
  * "what's wrong" #2): a bound-claiming rewrite shipped a silent wrong
  * answer because its THRESHOLD expression could evaluate null in a
  * shape whose null semantics differed from the claimed cap (least()
  * SKIPS nulls). This spec audits every null-PRODUCING threshold shape
  * `staticBound` accepts — pmod over a nullable column, no-ELSE CASE
  * ladders, least() with nullable siblings — on fixtures where the
  * null rows EXIST, for both the hamming and edit-distance rewrites,
  * against the naive (rule-excluded) plan; plus the adaptive interval
  * width's edge inputs (null endpoints, all-null side, empty side,
  * single rows, malformed conf). The soundness algebra under test:
  * null propagates THROUGH comparisons and arithmetic to the conjunct
  * (⇒ no match needed — sound for whole thresholds), but is SKIPPED
  * by least/greatest (⇒ only non-nullable children may claim the cap).
  */
class NullExprMatrixSpec extends SparkSpecBase {

  private val hamRule = "graft.plans.HammingJoinBlocking"
  private val edRule = "graft.plans.EditDistanceJoinBlocking"
  private val bandRule = "graft.plans.BandJoinBlocking"

  // --- hamming: threshold shapes over a NULLABLE column -------------------

  // (id, sig, x) — x null on ids 4 and 8
  private val hamRows: Seq[(Long, Long, Option[Long])] = Seq(
    (1L, 0L, Some(1L)), (2L, 1L, Some(3L)), (3L, 3L, None),
    (4L, 7L, Some(6L)), (5L, 15L, None), (6L, 31L, Some(2L)),
    (7L, 2L, Some(5L)), (8L, 63L, Some(0L)))

  private def hamFrames: (DataFrame, DataFrame) = {
    val s = spark
    import s.implicits._
    val df = hamRows.toDF("id", "sig", "x")
    (df, df.select(col("id").as("id2"), col("sig").as("sig2")))
  }

  /** Model pairs under threshold function t (None = null ⇒ no match). */
  private def hamPairs(t: Option[Long] => Option[Long]): Seq[(Long, Long)] =
    (for {
      (i, si, xi) <- hamRows; (j, sj, _) <- hamRows
      if i != j
      k <- t(xi).toSeq
      if java.lang.Long.bitCount(si ^ sj) <= k
    } yield (i, j)).sorted

  private def hamAudit(thr: org.apache.spark.sql.Column,
      expect: Seq[(Long, Long)], mustFire: Boolean): Unit = {
    val (a, b) = hamFrames
    val cond = bit_count(col("sig").bitwiseXOR(col("sig2"))) <= thr &&
      col("id") =!= col("id2")
    val j = a.join(b, cond)
    val fired = j.queryExecution.optimizedPlan.toString.contains("graft_seg")
    assert(fired === mustFire,
      s"fire=$fired expected=$mustFire:\n${j.queryExecution.optimizedPlan.toString.take(2000)}")
    def pairs(df: DataFrame) = df.select("id", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(pairs(j) === expect, "rule vs model")
    RuleToggle.withExcluded(spark, hamRule) {
      assert(pairs(a.join(b, cond)) === expect, "naive vs model")
    }
  }

  test("hamming: pmod(nullable, m) as the whole threshold — null rows match nothing") {
    // pmod(null, 4) is null ⇒ conjunct null ⇒ no candidate needed;
    // non-null rows capped at 3
    hamAudit(pmod(col("x"), lit(4)),
      hamPairs(_.map(x => ((x % 4) + 4) % 4)), mustFire = true)
  }

  test("hamming: no-ELSE CASE as the whole threshold — null branch matches nothing") {
    // CASE WHEN x > 2 THEN 2 WHEN x <= 2 THEN 1 END: null x falls
    // through both predicates ⇒ threshold null ⇒ no match (sound as a
    // WHOLE threshold; the same shape under least() may NOT claim the
    // cap — the r10 hole)
    hamAudit(when(col("x") > 2, 2).when(col("x") <= 2, 1),
      hamPairs(_.map(x => if (x > 2) 2L else 1L)), mustFire = true)
  }

  test("hamming: least(lit, nullable-branch) — least SKIPS the null, cap holds") {
    // least(2, CASE WHEN x > 2 THEN 1 END): null x or x ≤ 2 ⇒ the CASE
    // is null ⇒ least skips it ⇒ threshold 2 (NOT null!) — the cap
    // claim must come from the literal alone and the answer must keep
    // the skipped-null rows at threshold 2
    hamAudit(least(lit(2), when(col("x") > 2, 1)),
      hamPairs(x => Some(if (x.exists(_ > 2)) 1L else 2L)),
      mustFire = true)
  }

  test("hamming: least of ONLY nullable children stands down") {
    // no non-nullable child may claim the cap (the r10 fix, pinned
    // here for hamming as well as edit distance). Model:
    // least(CASE x>2→1 END, x+1) — null x ⇒ both children null ⇒
    // least null ⇒ no match; x>2 ⇒ min(1, x+1) = 1; x≤2 ⇒ CASE null
    // is SKIPPED ⇒ x+1 (unbounded — exactly why the rule stands down)
    val expect = (for {
      (i, si, xi) <- hamRows; (j, sj, _) <- hamRows
      if i != j
      x <- xi.toSeq
      k = if (x > 2) 1L else x + 1
      if java.lang.Long.bitCount(si ^ sj) <= k
    } yield (i, j)).sorted
    hamAudit(least(when(col("x") > 2, 1), col("x") + 1), expect,
      mustFire = false)
  }

  // --- edit distance: the same shapes over strings -------------------------

  test("edit distance: pmod(nullable, m) threshold — null rows match nothing, naive parity") {
    val s = spark
    import s.implicits._
    val rows: Seq[(Long, String, Option[Long])] = Seq(
      (1L, "kettle", Some(1L)), (2L, "kettlf", Some(4L)),
      (3L, "kittle", None), (4L, "battle", Some(2L)),
      (5L, "kettle", None), (6L, "rattle", Some(5L)))
    val df = rows.toDF("id", "w", "x")
    val b = df.select(col("id").as("id2"), col("w").as("w2"))
    // pmod caps at 2 (≤ the rule's k ≤ 3 gate) — null x ⇒ no match
    val cond = levenshtein(col("w"), col("w2")) <= pmod(col("x"), lit(3)) &&
      col("id") =!= col("id2")
    val j = df.join(b, cond)
    assert(j.queryExecution.optimizedPlan.toString.contains("graft_edp"),
      "edit-distance arm must fire on the pmod cap")
    def pairs(x: DataFrame) = x.select("id", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val got = pairs(j)
    // null-x rows (3, 5) must produce NO left-side matches even though
    // id 5 is a literal duplicate of id 1
    assert(!got.exists(p => p._1 == 3L || p._1 == 5L),
      s"null-threshold rows must match nothing: $got")
    assert(got.exists(_._1 == 1L), "non-null rows must still match")
    RuleToggle.withExcluded(spark, edRule) {
      assert(pairs(df.join(b, cond)) === got, "naive parity")
    }
  }

  // --- adaptive interval width: edge inputs --------------------------------

  private def noBroadcast[T](body: => T): T = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  private def ivFrames(rows: Seq[(Long, Option[Long], Option[Long])],
      rows2: Seq[(Long, Option[Long], Option[Long])])
      : (DataFrame, DataFrame) = {
    val s = spark
    import s.implicits._
    (rows.toDF("a_id", "a_s", "a_e"),
      rows2.toDF("b_id", "b_s", "b_e"))
  }

  private def ivAudit(rows: Seq[(Long, Option[Long], Option[Long])],
      rows2: Seq[(Long, Option[Long], Option[Long])],
      mustFire: Boolean = true): Unit = noBroadcast {
    val (a, b) = ivFrames(rows, rows2)
    val cond = col("a_s") <= col("b_e") && col("b_s") <= col("a_e")
    val j = a.join(b, cond)
    if (mustFire)
      assert(j.queryExecution.optimizedPlan.toString.contains("graft_band"),
        s"interval arm must fire:\n${j.queryExecution.optimizedPlan.toString.take(2000)}")
    def pairs(df: DataFrame) = df.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val got = pairs(j)
    val expect = (for {
      (i, s1, e1) <- rows; (k, s2, e2) <- rows2
      av <- s1.toSeq; ae <- e1.toSeq; bv <- s2.toSeq; be <- e2.toSeq
      if av <= be && bv <= ae
    } yield (i, k)).sorted
    assert(got === expect, "adaptive width vs model")
    RuleToggle.withExcluded(spark, bandRule) {
      assert(pairs(a.join(b, cond)) === expect, "naive parity")
    }
  }

  test("adaptive interval width: null endpoints contribute nothing and match nothing") {
    // nulls in s, in e, and in both — each contributes exponent 0 to
    // the derived width (Greatest/Least skip nulls; the +1 floor keeps
    // the span ≥ 1) and matches nothing through the kept condition
    val l = Seq((1L, Some(0L), Some(50L)), (2L, None, Some(30L)),
      (3L, Some(10L), None), (4L, (None: Option[Long]), (None: Option[Long])),
      (5L, Some(100L), Some(400L)))
    val r = Seq((11L, Some(40L), Some(60L)), (12L, None, None),
      (13L, Some(350L), Some(500L)), (14L, Some(20L), Some(25L)))
    ivAudit(l, r)
  }

  test("adaptive interval width: one side ALL-null endpoints — width falls to exponent 0, empty result") {
    val l = Seq((1L, (None: Option[Long]), (None: Option[Long])),
      (2L, (None: Option[Long]), (None: Option[Long])))
    val r = Seq((11L, Some(0L), Some(10L)), (12L, Some(5L), Some(20L)))
    ivAudit(l, r)
  }

  test("adaptive interval width: single-row sides") {
    ivAudit(Seq((1L, Some(5L), Some(15L))), Seq((11L, Some(10L), Some(30L))))
  }

  test("adaptive interval width: malformed conf is lenient — falls back to adaptive") {
    // NOTE: " 64" is NOT in this list — after the lenient trim it is a
    // VALID static-64 conf (the valid-after-trim case below), so it
    // would exercise the static path while this test documents the
    // adaptive FALLBACK. Only genuinely unparseable values belong here.
    val key = "spark.graft.band.intervalBin"
    for (v <- Seq("abc", "  ", "9x", "64 65")) {
      spark.conf.set(key, v)
      try ivAudit(
        Seq((1L, Some(0L), Some(100L)), (2L, Some(50L), Some(80L))),
        Seq((11L, Some(60L), Some(120L)), (12L, Some(300L), Some(400L))))
      finally spark.conf.unset(key)
    }
  }

  test("adaptive interval width: whitespace-padded numeric conf is VALID after trim") {
    val key = "spark.graft.band.intervalBin"
    spark.conf.set(key, " 64")
    try ivAudit(
      Seq((1L, Some(0L), Some(100L)), (2L, Some(50L), Some(80L))),
      Seq((11L, Some(60L), Some(120L)), (12L, Some(300L), Some(400L))))
    finally spark.conf.unset(key)
  }
}
