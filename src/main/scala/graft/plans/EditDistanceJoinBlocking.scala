package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftOuter, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a naive EDIT-DISTANCE theta join into a
  * partition-based segment EQUI-join (the PassJoin construction — Li,
  * Deng & Feng, "PASS-JOIN: A Partition-based Method for Similarity
  * Joins", VLDB 2011 — promoted to an engine capability), so a user can
  * WRITE the natural fuzzy-match plan
  *
  *   a.join(b, levenshtein(a("s"), b("s")) <= k && ...)
  *
  * and the engine plans the scale-safe form. Naive `levenshtein ≤ k` is
  * doubly hopeless at scale: |L|·|R| candidate pairs, each verified by
  * an O(|s|²) dynamic program. The rewrite makes candidate generation
  * linear: hamming-style pigeonhole blocking, adapted to edits that
  * SHIFT positions.
  *
  * Blocking lemma (pigeonhole over an optimal edit script): partition
  * the right string R into k+1 contiguous segments (even partition,
  * longer segments last; segment i starts at p_i). If ed(L, R) ≤ k, at
  * most k segments are touched by edit operations, so some segment i is
  * untouched and appears VERBATIM in L at start p_i + j, shifted by the
  * net insert/delete balance j of the edits before it.
  *
  * Multi-match-aware window (the PassJoin refinement, re-derived in
  * full here because generation-side pruning must be provably lossless):
  * with Δ = len(L) − len(R), SOME untouched segment i has its shift j in
  *
  *   max(−i, Δ−(k−i)) ≤ j ≤ min(i, Δ+(k−i)).
  *
  * Proof: let i_1 < … < i_u be the untouched segments (u ≥ 1) and b_t
  * the number of edits before segment i_t. The first t−1 untouched
  * segments aside, every one of the i_t − t + 1 touched segments before
  * i_t holds ≥ 1 edit, so b_t ≥ i_t − t + 1 ≥ i_t − k + m where m ≤ k is
  * the script cost — the window's lower legs. If EVERY untouched t had
  * b_t ≥ i_t + 1, then for the last one m ≥ b_u + (k − i_u) ≥ k + 1
  * (all k − i_u segments after i_u are touched), contradiction; so some
  * t has b_t ≤ i_t, giving |j| ≤ b_t ≤ i_t and
  * |j − Δ| ≤ m − b_t ≤ k − i_t — the window's upper legs.
  *
  * Because the window bounds depend only on (i, Δ, k) and Δ is fixed per
  * enumerated target length, the probe side enumerates a LITERAL combo
  * set {(d, i, j)}: target length n = len(L) + d for d ∈ [−k, k] (the
  * length filter, built into the join key), segment i ∈ [0, k], shift j
  * in the window for Δ = −d — (k+1)(2k+1) ≥ |combos| ≥ … ≈ 19 at k = 2,
  * 44 at k = 3. Each combo yields the substring of L of segment i's
  * length at position p_i + j (NULL when out of bounds — null keys never
  * match). The right side explodes into its k+1 segments. The join
  * becomes an equi-join on (segment index, target length, content) with
  * the ORIGINAL condition kept verbatim (the exact levenshtein verify,
  * plus any user conjuncts — user equi keys COMPOSE into the hash join
  * exactly as in [[HammingJoinBlocking]]), plus a canonical-first-match
  * residual — the candidate's combo must equal the FIRST combo (in
  * generation order) that matches for this pair — so every qualifying
  * pair joins EXACTLY once: bag semantics with no dedup pass.
  *
  * k = 0 degenerates to equality: the join gains `L = R` as an equi
  * conjunct and nothing explodes.
  *
  * Stand-downs: the 3-arg threshold form `levenshtein(l, r, t)` (its
  * −1 overflow sentinel inverts comparisons — never eligible), k > 3
  * (combo growth), streaming joins, and — the [[HammingJoinBlocking]]
  * doctrine — user equi conjuncts present AND a side under the
  * broadcast threshold, where the hash join on those keys with the
  * levenshtein as residual already wins.
  *
  * LEFT SEMI / LEFT ANTI / LEFT OUTER collapse back to left grain per
  * [[RewriteSupport]]: semi = one group per matched rid (no canonical
  * residual needed); anti = a rid qualifies iff ALL its combo rows
  * survived (the lemma guarantees a true match claims at least one);
  * outer keeps the canonical residual plus one null-extended
  * representative for match-free rids. Fuzzy semi/anti are the
  * fuzzy-decontamination shapes ("corpus titles within edit distance k
  * of some/no eval title").
  */
object EditDistanceJoinBlocking extends Rule[LogicalPlan]
    with BlockingJoinSupport {

  private val probeColName = "graft_edp"
  private val segColName = "graft_eds"
  private val maxK = 3

  /** One enumerated probe combo: target length len(L)+d, segment i,
    * shift j (start offset from the segment's own position), and its
    * ordinal in generation order (the canonical-residual code). */
  private case class Combo(d: Int, i: Int, j: Int, code: Int)

  private def combos(k: Int): Seq[Combo] = {
    val b = Seq.newBuilder[Combo]
    var code = 0
    for (d <- -k to k; i <- 0 to k) {
      val delta = -d // Δ = len(L) − n with n = len(L) + d
      val lo = math.max(-i, delta - (k - i))
      val hi = math.min(i, delta + (k - i))
      for (j <- lo to hi) { b += Combo(d, i, j, code); code += 1 }
    }
    b.result()
  }

  /** One matched edit-distance bound: probe string (left side), segment
    * string (right side), bound k. Both sides pass through
    * [[orient]]'s determinism guard — the rewrite evaluates them in
    * the explode projects, the canonical residual, and the kept
    * condition. */
  private case class Fuzzy(probe: Expression, seg: Expression, k: Int)

  private def fuzzyOf(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[Fuzzy] =
    boundedBy(e).filter { case (_, k) => k >= 0 && k <= maxK }
      .flatMap { case (lhs, k) =>
        stripCast(lhs) match {
          // threshold form excluded: its −1 "over threshold" sentinel
          // satisfies ≤-comparisons, so the bound is not a distance
          case Levenshtein(a, b, None)
              if a.dataType == StringType && b.dataType == StringType =>
            orient(a, b, left, right).map { case (l, r) =>
              Fuzzy(l, r, k)
            }
          case _ => None
        }
      }

  // ---- even-partition arithmetic (all Long; n guarded ≥ 0) -----------

  private def long(e: Expression): Expression = Cast(e, LongType)
  private def int(e: Expression): Expression = Cast(e, IntegerType)
  private def len(e: Expression): Expression = long(Length(e))
  private def lit(x: Long): Literal = Literal(x)

  /** Segment length for segment `i` of a string of length `n` split in
    * `nSeg` even parts, longer parts LAST: base = n div nSeg, and the
    * final (n mod nSeg) segments carry one extra char. */
  private def segLen(n: Expression, i: Int, nSeg: Int): Expression = {
    val rem = Pmod(n, lit(nSeg))
    Add(IntegralDivide(n, lit(nSeg)),
      If(GreaterThanOrEqual(lit(i), Subtract(lit(nSeg), rem)),
        lit(1L), lit(0L)))
  }

  /** 0-based start of segment `i`: i·base + max(0, i − (nSeg − rem)). */
  private def segStart(n: Expression, i: Int, nSeg: Int): Expression = {
    val rem = Pmod(n, lit(nSeg))
    Add(Multiply(lit(i.toLong), IntegralDivide(n, lit(nSeg))),
      Greatest(Seq(lit(0L),
        Subtract(lit(i.toLong), Subtract(lit(nSeg), rem)))))
  }

  private def substr(s: Expression, start0: Expression,
      slen: Expression): Expression =
    Substring(s, int(Add(start0, lit(1L))), int(slen))

  /** Probe-side bounds validity for combo `c` against probe string `l`
    * with target length `n`: the target length is a real length and the
    * shifted segment window lies inside `l`. */
  private def comboValid(c: Combo, l: Expression, n: Expression,
      nSeg: Int): Expression = {
    val start0 = Add(segStart(n, c.i, nSeg), lit(c.j.toLong))
    Seq(
      GreaterThanOrEqual(n, lit(0L)),
      GreaterThanOrEqual(start0, lit(0L)),
      LessThanOrEqual(Add(start0, segLen(n, c.i, nSeg)), len(l))
    ).reduceLeft[Expression](And)
  }

  /** The FIRST matching combo's code for pair (l, r), −1 if none —
    * nested Ifs in generation order. Each branch is a handful of tiny
    * ops over the PRECOMPUTED per-side arrays (probe substring array
    * `vs`, segment array `segs`) — substrings are never recomputed
    * here, keeping the join condition inside janino's method limits
    * (the first cut inlined the segment arithmetic 19× and knocked the
    * whole join stage out of codegen). `vs[c]` is NULL exactly when
    * combo c was out of bounds at generation, so the null check IS the
    * validity check. */
  private def firstCode(cs: Seq[Combo], l: Expression, r: Expression,
      vs: Expression, segs: Expression): Expression =
    cs.foldRight(Literal(-1): Expression) { (c, els) =>
      val item = GetArrayItem(vs, Literal(c.code))
      val cond = Seq(
        EqualTo(Add(len(l), lit(c.d.toLong)), len(r)),
        IsNotNull(item),
        EqualTo(item, GetArrayItem(segs, Literal(c.i)))
      ).reduceLeft[Expression](And)
      If(cond, Literal(c.code), els)
    }

  private val probeSchema = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("n", LongType),
    StructField("v", StringType),
    StructField("c", IntegerType, nullable = false)))

  private val segSchema = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("n", LongType),
    StructField("v", StringType)))

  private val probeArrName = "graft_edv"
  private val segArrName = "graft_eda"

  /** Explode the probe side into one row per combo. The per-combo
    * substrings are computed ONCE per input row in a Project below the
    * Generate (array `graft_edv`, NULL = combo out of bounds); exploded
    * rows and the canonical residual both read array items. */
  private def explodeProbe(child: LogicalPlan, l: Expression,
      cs: Seq[Combo], nSeg: Int): (LogicalPlan, Attribute, Attribute) = {
    val vals = cs.map { c =>
      val n = Add(len(l), lit(c.d.toLong))
      val start0 = Add(segStart(n, c.i, nSeg), lit(c.j.toLong))
      If(comboValid(c, l, n, nSeg),
        substr(l, start0, segLen(n, c.i, nSeg)),
        Literal(null, StringType))
    }
    val arr = Alias(CreateArray(vals), probeArrName)()
    val proj = Project(child.output :+ arr, child)
    val structs = cs.map { c =>
      CreateNamedStruct(Seq(
        Literal("idx"), Literal(c.i),
        Literal("n"), Add(len(l), lit(c.d.toLong)),
        Literal("v"), GetArrayItem(arr.toAttribute, Literal(c.code)),
        Literal("c"), Literal(c.code)))
    }
    val out = AttributeReference(probeColName, probeSchema)()
    (Generate(Explode(CreateArray(structs)), Nil, outer = false, None,
      Seq(out), proj), out, arr.toAttribute)
  }

  /** Explode the segment side into its k+1 even-partition segments,
    * precomputed once per input row (array `graft_eda`). */
  private def explodeSegs(child: LogicalPlan, r: Expression,
      nSeg: Int): (LogicalPlan, Attribute, Attribute) = {
    val n = len(r)
    val vals = (0 until nSeg).map { i =>
      substr(r, segStart(n, i, nSeg), segLen(n, i, nSeg))
    }
    val arr = Alias(CreateArray(vals), segArrName)()
    val proj = Project(child.output :+ arr, child)
    val structs = (0 until nSeg).map { i =>
      CreateNamedStruct(Seq(
        Literal("idx"), Literal(i),
        Literal("n"), n,
        Literal("v"), GetArrayItem(arr.toAttribute, Literal(i))))
    }
    val out = AttributeReference(segColName, segSchema)()
    (Generate(Explode(CreateArray(structs)), Nil, outer = false, None,
      Seq(out), proj), out, arr.toAttribute)
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, jt, Some(cond), hint)
        if rewriteable(jt) && !j.isStreaming &&
          !(left.output ++ right.output).exists(a =>
            a.name == probeColName || a.name == segColName ||
              a.name == probeArrName || a.name == segArrName) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val fuzzy = conjuncts.flatMap(c => fuzzyOf(c, left, right)).headOption
      val standDown = equiBroadcastStandDown(conjuncts, left, right)
      fuzzy match {
        case Some(f) if f.k == 0 &&
            !conjuncts.exists(_.semanticEquals(EqualTo(f.probe, f.seg))) =>
          // ed ≤ 0 ⟺ equality (null operands fail both spellings):
          // surface the equi key, keep everything else verbatim. Any
          // join type — strengthening the condition by an implied
          // conjunct leaves the matched set untouched. The exists-guard
          // is the idempotence marker (the rewritten join still matches
          // this rule's pattern).
          Join(left, right, jt,
            Some(And(EqualTo(f.probe, f.seg), cond)), hint)
        case Some(f) if f.k > 0 && !standDown =>
          val nSeg = f.k + 1
          val cs = combos(f.k)
          val (probeRid, rid) =
            if (jt == Inner) (left, None)
            else { val (p, a) = RewriteSupport.withRid(left); (p, Some(a)) }
          val (newLeft, pOut, vsArr) = explodeProbe(probeRid, f.probe, cs, nSeg)
          val (newRight, sOut, segArr) = explodeSegs(right, f.seg, nSeg)
          val idxL = GetStructField(pOut, 0, Some("idx"))
          val nL = GetStructField(pOut, 1, Some("n"))
          val vL = GetStructField(pOut, 2, Some("v"))
          val cL = GetStructField(pOut, 3, Some("c"))
          val idxR = GetStructField(sOut, 0, Some("idx"))
          val nR = GetStructField(sOut, 1, Some("n"))
          val vR = GetStructField(sOut, 2, Some("v"))
          val canonical =
            EqualTo(cL, firstCode(cs, f.probe, f.seg, vsArr, segArr))
          val needCanon = jt == Inner || jt == LeftOuter
          val newCond = (Seq(EqualTo(idxL, idxR), EqualTo(nL, nR),
            EqualTo(vL, vR), cond) ++
            (if (needCanon) Seq(canonical) else Nil))
            .reduceLeft[Expression](And)
          val joined = Join(newLeft, newRight, jt, Some(newCond), hint)
          jt match {
            case Inner => Project(j.output, joined)
            case LeftSemi =>
              RewriteSupport.regroupSemi(joined, rid.get, left.output,
                j.output)
            case LeftAnti =>
              RewriteSupport.regroupAnti(joined, rid.get, left.output,
                j.output, cs.size)
            case _ =>
              RewriteSupport.collapseOuter(joined, rid.get, sOut,
                EqualTo(cL, Literal(cs.head.code)), j.output)
          }
        case _ => j
      }
  }
}
