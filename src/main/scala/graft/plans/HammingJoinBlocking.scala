package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Optimizer rule: rewrite a naive HAMMING-DISTANCE theta join into a
  * pigeonhole-segment EQUI-join — the q63/q260 manual construction
  * promoted to an engine capability, so a user can WRITE the natural
  * plan
  *
  *   a.join(b, bit_count(a("sig") ^ b("sig")) <= k && ...)
  *
  * and the engine plans the scale-safe form. Eligibility: an INNER join
  * whose condition conjuncts bound `bit_count(xor(l, r))` by a literal
  * in any comparison spelling (`≤ k`, `< k`, `k ≥ …`, `k > …`; effective
  * k ≤ 7), both sides 32- or 64-bit integral signatures, one from each
  * child.
  *
  * When the join ALSO carries equi-conjuncts (`=` or `<=>`) — e.g. the
  * natural lang-blocked form `lang === lang2 && bit_count(...) <= k` —
  * the rule COMPOSES: the generated segment equality joins the existing
  * keys (the original condition is kept verbatim, so
  * ExtractEquiJoinKeys collects both), turning a per-language nested
  * loop into a (lang, segment)-keyed hash join. The ONLY stand-down:
  * equi-conjuncts exist AND a side already fits under the broadcast
  * threshold — there Spark's BroadcastHashJoin on the existing keys
  * (hamming as a cheap residual) beats paying the (k+1)× explode, so
  * the rule leaves the join alone.
  *
  * Rewrite: both children gain a generated `graft_seg` column exploding
  * the signature into k+1 disjoint bit segments (hamming ≤ k ⇒ at least
  * one of k+1 segments is EXACTLY equal — pigeonhole); the join becomes
  * an equi-join on (seg_idx, seg_val) with the ORIGINAL condition kept,
  * plus a canonical-first-match residual (segment i matches AND all
  * segments j < i differ) so every qualifying pair joins EXACTLY once —
  * bag semantics preserved with no dedup pass. A final Project restores
  * the original output.
  *
  * ExtractEquiJoinKeys then sees the struct-field equalities (plus any
  * composed user keys) and plans a hash/sort-merge join: candidate
  * generation drops from |L|·|R| to Σ_bucket |bucket|² — the measured
  * q63/SrpScaleProbe behavior — with zero changes to user code.
  */
object HammingJoinBlocking extends Rule[LogicalPlan] with PredicateHelper {

  private val segColName = "graft_seg"
  private val maxK = 7

  /** `(xorArg, k)` when `e` bounds `bit_count(x)` by a literal in any of
    * the four comparison spellings — `≤ k`, `< k` (≡ ≤ k−1), `k ≥`,
    * `k >` (≡ ≤ k−1). */
  private def boundedBitCount(e: Expression): Option[(Expression, Int)] =
    e match {
      case LessThanOrEqual(BitwiseCount(x), Literal(k: Int, IntegerType)) =>
        Some((x, k))
      case LessThan(BitwiseCount(x), Literal(k: Int, IntegerType)) =>
        Some((x, k - 1))
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), BitwiseCount(x)) =>
        Some((x, k))
      case GreaterThan(Literal(k: Int, IntegerType), BitwiseCount(x)) =>
        Some((x, k - 1))
      case _ => None
    }

  /** (leftSig, rightSig, k) when `e` bounds `bit_count(xor(a, b))` by a
    * literal k ≤ [[maxK]], with one 32- or 64-bit signature per side. */
  private def hammingConjunct(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Int)] =
    boundedBitCount(e) match {
      case Some((BitwiseXor(a, b), k))
          if k >= 0 && k <= maxK &&
            (a.dataType == IntegerType || a.dataType == LongType) &&
            b.dataType == a.dataType =>
        val aLbR = a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet)
        val bLaR = b.references.subsetOf(left.outputSet) &&
          a.references.subsetOf(right.outputSet)
        if (aLbR) Some((a, b, k))
        else if (bLaR) Some((b, a, k))
        else None
      case _ => None
    }

  private def isEqui(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Boolean = {
    def crossChild(a: Expression, b: Expression): Boolean =
      (a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) ||
        (b.references.subsetOf(left.outputSet) &&
          a.references.subsetOf(right.outputSet))
    e match {
      case EqualTo(a, b) => crossChild(a, b)
      case EqualNullSafe(a, b) => crossChild(a, b)
      case _ => false
    }
  }

  /** Bit segment i of `sig` under an (k+1)-way split of the signature
    * width (32 for int, 64 for long); the last segment absorbs the
    * remainder. */
  private def segment(sig: Expression, i: Int, nSeg: Int): Expression = {
    val isLong = sig.dataType == LongType
    val bits = if (isLong) 64 else 32
    val width = bits / nSeg
    val lo = i * width
    val w = if (i == nSeg - 1) bits - lo else width
    val shifted = ShiftRightUnsigned(sig, Literal(lo))
    if (lo + w >= bits) shifted
    else if (isLong) BitwiseAnd(shifted, Literal((1L << w) - 1))
    else BitwiseAnd(shifted, Literal((1 << w) - 1))
  }

  private def explodeSegs(child: LogicalPlan, sig: Expression,
      nSeg: Int): (LogicalPlan, Attribute) = {
    val structs = (0 until nSeg).map { i =>
      CreateNamedStruct(Seq(Literal("idx"), Literal(i),
        Literal("v"), segment(sig, i, nSeg)))
    }
    val out = AttributeReference(segColName,
      StructType(Seq(StructField("idx", IntegerType, nullable = false),
        StructField("v", sig.dataType))))()
    (Generate(Explode(CreateArray(structs)), Nil, outer = false, None,
      Seq(out), child), out)
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !left.output.exists(_.name == segColName) &&
          !right.output.exists(_.name == segColName) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hamming = conjuncts.flatMap(c =>
        hammingConjunct(c, left, right).map(c -> _)).headOption
      val hasEqui = conjuncts.exists(isEqui(_, left, right))
      // with user equi-keys AND a broadcastable side, Spark's hash join
      // on those keys (hamming as residual) already wins — stand down
      val broadcastable = {
        val t = conf.autoBroadcastJoinThreshold
        t >= 0 && (left.stats.sizeInBytes <= t ||
          right.stats.sizeInBytes <= t)
      }
      hamming match {
        case Some((_, (lSig, rSig, k))) if !(hasEqui && broadcastable) =>
          val nSeg = k + 1
          val (newLeft, segL) = explodeSegs(left, lSig, nSeg)
          val (newRight, segR) = explodeSegs(right, rSig, nSeg)
          val idxL = GetStructField(segL, 0, Some("idx"))
          val idxR = GetStructField(segR, 0, Some("idx"))
          val valL = GetStructField(segL, 1, Some("v"))
          val valR = GetStructField(segR, 1, Some("v"))
          // canonical first match: all segments below the matched index
          // differ, so each qualifying pair survives exactly once
          val canonical = (0 until nSeg).map { i =>
            val below = (0 until i).map(jx =>
              Not(EqualTo(segment(lSig, jx, nSeg),
                segment(rSig, jx, nSeg))))
            (EqualTo(idxL, Literal(i)) +: below)
              .reduceLeft[Expression](And)
          }.reduceLeft[Expression](Or)
          val newCond = Seq(EqualTo(idxL, idxR), EqualTo(valL, valR),
            cond, canonical).reduceLeft[Expression](And)
          Project(j.output,
            Join(newLeft, newRight, Inner, Some(newCond), hint))
        case _ => j
      }
  }
}
