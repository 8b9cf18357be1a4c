package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftOuter, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a naive SET-SIMILARITY theta join into a
  * prefix-filtered token EQUI-join — the SSJoin/PPJoin prefix filter
  * (Chaudhuri, Ganti & Kaushik, ICDE 2006; Xiao, Wang, Lin & Yu, WWW
  * 2008) promoted to an engine capability, and the q65/q107 manual
  * construction the engine now owns. A user WRITES the natural plan
  *
  *   a.join(b, try_divide(size(array_intersect(ta, tb)),
  *               size(array_union(ta, tb))) >= 0.6 && ...)    // Jaccard
  *   a.join(b, size(array_intersect(ta, tb)) >=
  *               0.6 * size(array_union(ta, tb)) && ...)      // ÷-free
  *   a.join(b, size(array_intersect(ta, tb)) >= 3 && ...)     // overlap
  *
  * and the engine plans candidate generation linearly instead of
  * |L|·|R| intersect/union evaluations.
  *
  * Prefix-filter lemma (value order, no frequency statistics needed):
  * sort each side's DISTINCT tokens by their natural order; if
  * |X∩Y| ≥ α ≥ 1, then e = min(X∩Y) sits inside BOTH prefixes of
  * length |X|−α+1 and |Y|−α+1. Proof: every element of X smaller than
  * e is outside X∩Y (e is the minimum), so if e fell beyond X's
  * prefix, X would hold ≥ |X|−α+1 non-shared elements — but it has at
  * most |X|−α. Contradiction; symmetric for Y. So candidates meet on
  * a prefix token, and the MINIMAL shared token is itself a guaranteed
  * meeting point — the canonical residual
  * `token = array_min(array_intersect(a, b))` keeps every qualifying
  * pair EXACTLY once (bag semantics, no dedup pass) while the ORIGINAL
  * condition (kept verbatim, so user equi keys compose) re-verifies
  * the exact similarity.
  *
  * Per-side α (must lower-bound |X∩Y| for EVERY qualifying partner):
  *   - overlap ≥ t: α = t (literal);
  *   - Jaccard ≥ s: |X∩Y| ≥ s·|X∪Y| ≥ s·|X|, so
  *     α = max(1, ⌈s·|X| − ε⌉) with ε = 1e−9 — the epsilon guards the
  *     FP product landing a hair above an exact integer (0.8·5 →
  *     4.0000000000000002, whose ceil would shorten the prefix below
  *     the lemma's requirement and silently drop pairs); erring low
  *     only lengthens the prefix (more candidates, never fewer).
  *
  * Eligibility: array columns with NON-NULLABLE elements of one atomic
  * type on both sides (`containsNull = false` — a null element would
  * break both the value-order prefix and the array_min canonical;
  * provable at plan time from the array type), threshold s ∈ (0, 1]
  * (s ≤ 0 is not a similarity join — disjoint pairs qualify) or t ≥ 1.
  * Duplicate-laden inputs are fine: prefixes come from
  * sort_array(array_distinct(x)) and intersect/union are set ops
  * either way. Stand-downs: the [[HammingJoinBlocking]] doctrine (user
  * equi conjuncts + a broadcastable side), streaming joins.
  *
  * LEFT SEMI / LEFT ANTI / LEFT OUTER collapse to left grain per
  * [[RewriteSupport]] with OUTER explode (a row whose prefix is empty
  * still yields one null-token row, which no equi key matches): semi =
  * one group per matched rid; anti = all its explode rows survived
  * (per-row variable fan-out via [[RewriteSupport.regroupAntiCol]]);
  * outer keeps the canonical residual plus one representative
  * (`token <=> sorted_distinct[1]`) for match-free rids. Fuzzy-set
  * semi/anti are the token-level decontamination shapes.
  *
  * Two degenerate spellings ride the same machinery (round 8, second
  * session): `arrays_overlap(a, b)` is the overlap join at α = 1
  * (full sorted-distinct explode — under non-nullable elements its
  * null-vs-false corner cannot arise), and the MEMBERSHIP join
  * `array_contains(arr, v)` with the scalar on the other child
  * explodes only the array side with `token = v` as the equi key — a
  * pair meets through at most one distinct element, so no canonical
  * is needed, and with the array on the RIGHT of a left
  * semi/anti/outer join the left grain is untouched and no regroup is
  * needed either.
  */
object SetSimilarityJoinBlocking extends Rule[LogicalPlan]
    with PredicateHelper {

  private val arrColName = "graft_ssa"
  private val tokColName = "graft_sst"
  private val cntColName = "graft_ssn"
  private val markColName = "graft_ssm"

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case _ => e
  }

  private def interPair(e: Expression): Option[(Expression, Expression)] =
    stripCast(e) match {
      case Size(ArrayIntersect(a, b), _) => Some((a, b))
      case _ => None
    }

  private def unionPair(e: Expression): Option[(Expression, Expression)] =
    stripCast(e) match {
      case Size(ArrayUnion(a, b), _) => Some((a, b))
      case _ => None
    }

  private def samePairs(p: (Expression, Expression),
      q: (Expression, Expression)): Boolean =
    (p._1.semanticEquals(q._1) && p._2.semanticEquals(q._2)) ||
      (p._1.semanticEquals(q._2) && p._2.semanticEquals(q._1))

  private def litInt(e: Expression): Option[Int] = e match {
    case Literal(k: Int, IntegerType) => Some(k)
    case Literal(k: Long, LongType) if k.isValidInt => Some(k.toInt)
    case _ => None
  }

  private def litFrac(e: Expression): Option[Double] = e match {
    case Literal(d: Double, DoubleType) => Some(d)
    case Literal(f: Float, FloatType) => Some(f.toDouble)
    case Literal(d: Decimal, _) => Some(d.toDouble)
    case _ => None
  }

  /** Orient `(a, b)` as `(left-side, right-side)`, or None if mixed. */
  private def orient(a: Expression, b: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression)] =
    if (a.references.subsetOf(left.outputSet) &&
      b.references.subsetOf(right.outputSet)) Some((a, b))
    else if (b.references.subsetOf(left.outputSet) &&
      a.references.subsetOf(right.outputSet)) Some((b, a))
    else None

  /** One matched similarity bound: the two array sides and the per-side
    * α builder (sorted-distinct size → required overlap, LongType). */
  private case class SetSim(aL: Expression, aR: Expression,
      alpha: Expression => Expression)

  private def eligibleArrays(a: Expression, b: Expression): Boolean =
    (a.dataType, b.dataType) match {
      case (ArrayType(ea, false), ArrayType(eb, false)) =>
        ea == eb && (ea match {
          case ByteType | ShortType | IntegerType | LongType |
            DateType | TimestampType => true
          case _: StringType => true
          case _ => false
        })
      case _ => false
    }

  private def setSimOf(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[SetSim] = {
    // overlap spelling: size(array_intersect) bounded below by t ≥ 1
    def overlap(x: Expression, l: Expression): Option[SetSim] =
      for {
        (a, b) <- interPair(x)
        t <- litInt(l)
        if t >= 1 && eligibleArrays(a, b)
        (al, ar) <- orient(a, b, left, right)
      } yield SetSim(al, ar, _ => Literal(t.toLong))
    def jacAlpha(s: Double, ip: (Expression, Expression)): Option[SetSim] =
      if (s > 0.0 && s <= 1.0 && eligibleArrays(ip._1, ip._2))
        orient(ip._1, ip._2, left, right).map { case (al, ar) =>
          SetSim(al, ar, sz => Greatest(Seq(Literal(1L),
            Ceil(Subtract(Multiply(Literal(s),
              Cast(sz, DoubleType)), Literal(1e-9))))))
        }
      else None
    // Jaccard ÷ spelling: size(intersect)/size(union) bounded below by
    // s ∈ (0, 1]. ANSI-mode division is NOT eligible: the naive plan
    // RAISES on an empty∕empty union (two empty sets meeting), and the
    // rewrite never evaluates such pairs — erasing a user-visible
    // error is a semantic change. try_divide and legacy division
    // yield null → false there, which the rewrite preserves exactly.
    def jaccard(x: Expression, l: Expression): Option[SetSim] =
      stripCast(x) match {
        // NB: Divide's third unapply field is a NumericEvalContext in
        // Spark 4.1 — comparing IT against EvalMode.ANSI is always
        // true and silently voids the guard; test d.evalMode
        case d @ Divide(num, den, _) if d.evalMode != EvalMode.ANSI =>
          for {
            ip <- interPair(num)
            up <- unionPair(den)
            if samePairs(ip, up)
            s <- litFrac(l)
            sim <- jacAlpha(s, ip)
          } yield sim
        case _ => None
      }
    // division-free Jaccard spelling (the ANSI-safe form):
    // size(intersect) ≥ s · size(union)
    def jaccardMul(x: Expression, r: Expression): Option[SetSim] = {
      def sTimesUnion(e: Expression): Option[(Double,
          (Expression, Expression))] = stripCast(e) match {
        case Multiply(a, b, _) =>
          (litFrac(a), unionPair(b)) match {
            case (Some(s), Some(up)) => Some((s, up))
            case _ => (litFrac(b), unionPair(a)) match {
              case (Some(s), Some(up)) => Some((s, up))
              case _ => None
            }
          }
        case _ => None
      }
      for {
        ip <- interPair(x)
        (s, up) <- sTimesUnion(r)
        if samePairs(ip, up)
        sim <- jacAlpha(s, ip)
      } yield sim
    }
    def bound(x: Expression, l: Expression): Option[SetSim] =
      overlap(x, l).orElse(jaccard(x, l)).orElse(jaccardMul(x, l))
    e match {
      // strict bounds imply the non-strict ones the α math uses — the
      // kept original condition enforces the exact strictness
      case GreaterThanOrEqual(x, l) => bound(x, l)
      case GreaterThan(x, l) => bound(x, l)
      case LessThanOrEqual(l, x) => bound(x, l)
      case LessThan(l, x) => bound(x, l)
      // arrays_overlap(a, b) ⟺ overlap ≥ 1 under non-nullable
      // elements (its null-vs-false subtlety only exists for null
      // elements, which eligibility excludes)
      case ArraysOverlap(a, b) if eligibleArrays(a, b) =>
        orient(a, b, left, right).map { case (al, ar) =>
          SetSim(al, ar, _ => Literal(1L))
        }
      case _ => None
    }
  }

  /** One matched MEMBERSHIP conjunct `array_contains(arr, v)` with the
    * array and the scalar on opposite children — the tag-membership
    * join. Only the ARRAY side explodes (full sorted-distinct — α = 1
    * needs the whole set) and the equi key is `token = v` directly: a
    * pair can meet through at most ONE exploded row (the distinct
    * element equal to v), so bag semantics hold with NO canonical
    * residual, and when the array sits on the RIGHT of a left
    * semi/anti/outer join no regroup is needed either (left grain is
    * untouched and per-right-row match multiplicity is at most one). */
  private case class Member(arr: Expression, v: Expression,
      arrOnLeft: Boolean)

  private def memberOf(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[Member] = e match {
    case ArrayContains(arr, v)
        if v.deterministic && arr.deterministic &&
          v.references.nonEmpty && arr.references.nonEmpty =>
      arr.dataType match {
        case ArrayType(et, false) if et == v.dataType && (et match {
          case ByteType | ShortType | IntegerType | LongType |
            DateType | TimestampType => true
          case _: StringType => true
          case _ => false
        }) =>
          if (arr.references.subsetOf(left.outputSet) &&
            v.references.subsetOf(right.outputSet))
            Some(Member(arr, v, arrOnLeft = true))
          else if (arr.references.subsetOf(right.outputSet) &&
            v.references.subsetOf(left.outputSet))
            Some(Member(arr, v, arrOnLeft = false))
          else None
        case _ => None
      }
    case _ => None
  }

  /** `child` + projected sorted-distinct array (and, when `withCnt`,
    * the explode fan-out count for anti regrouping) + the prefix
    * explode. `outer` keeps zero-prefix rows as one null-token row.
    * Prefix length = max(0, |sx| − α(|sx|) + 1). The count alias is a
    * pure function of `arr` (not of the sibling `sx` alias — aliases
    * in one Project cannot reference each other); the Generate's slice
    * recomputes the length from the projected attribute. */
  private def explodePrefix(child: LogicalPlan, arr: Expression,
      alpha: Expression => Expression, outer: Boolean, withCnt: Boolean):
      (LogicalPlan, Attribute, Option[Attribute]) = {
    def lenP(sz: Expression): Expression = Greatest(Seq(Literal(0L),
      Subtract(sz, Subtract(alpha(sz), Literal(1L)))))
    val sx = Alias(new SortArray(ArrayDistinct(arr)), arrColName)()
    val cnt =
      if (withCnt) {
        val szRaw = Cast(Size(ArrayDistinct(arr)), LongType)
        Some(Alias(Greatest(Seq(Literal(1L), lenP(szRaw))), cntColName)())
      } else None
    val proj = Project(child.output ++ Seq(sx) ++ cnt.toSeq, child)
    val szSx = Cast(Size(sx.toAttribute), LongType)
    val prefix = Slice(sx.toAttribute, Literal(1),
      Cast(lenP(szSx), IntegerType))
    val ArrayType(et, _) = arr.dataType: @unchecked
    val out = AttributeReference(tokColName, et)()
    (Generate(Explode(prefix), Nil, outer = outer, None, Seq(out), proj),
      out, cnt.map(_.toAttribute))
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

  private def rewriteable(jt: JoinType): Boolean = jt match {
    case Inner | LeftSemi | LeftAnti | LeftOuter => true
    case _ => false
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, jt, Some(cond), hint)
        if rewriteable(jt) && !j.isStreaming &&
          !(left.output ++ right.output).exists(a =>
            a.name == arrColName || a.name == tokColName ||
              a.name == cntColName || a.name == markColName) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val sim = conjuncts.flatMap(c => setSimOf(c, left, right)).headOption
      val member =
        if (sim.isEmpty)
          conjuncts.flatMap(c => memberOf(c, left, right)).headOption
        else None
      val hasEqui = conjuncts.exists(isEqui(_, left, right))
      val broadcastable = {
        val t = conf.autoBroadcastJoinThreshold
        t >= 0 && (left.stats.sizeInBytes <= t ||
          right.stats.sizeInBytes <= t)
      }
      (sim, member) match {
        case (None, Some(m)) if !(hasEqui && broadcastable) &&
            !m.arrOnLeft =>
          // membership with the array on the RIGHT: explode only the
          // right side — the left grain is untouched, so EVERY join
          // type goes through structurally (per right row at most one
          // exploded copy equals v)
          val (newRight, tokR, _) = explodePrefix(right, m.arr,
            _ => Literal(1L), outer = false, withCnt = false)
          val joined = Join(left, newRight, jt,
            Some(And(EqualTo(m.v, tokR), cond)), hint)
          Project(j.output, joined)
        case (None, Some(m)) if !(hasEqui && broadcastable) =>
          // membership with the array on the LEFT: the α = 1 explode
          // with the scalar itself as the equi key (no canonical — a
          // pair meets through at most one distinct element)
          val nonInner = jt != Inner
          val (leftBase, rid) =
            if (nonInner) {
              val (p, a) = RewriteSupport.withRid(left); (p, Some(a))
            } else (left, None)
          val (newLeft, tokL, cntL) = explodePrefix(leftBase, m.arr,
            _ => Literal(1L), outer = nonInner, withCnt = jt == LeftAnti)
          val newCond = And(EqualTo(tokL, m.v), cond)
          jt match {
            case Inner =>
              Project(j.output, Join(newLeft, right, jt, Some(newCond),
                hint))
            case LeftSemi =>
              RewriteSupport.regroupSemi(
                Join(newLeft, right, jt, Some(newCond), hint),
                rid.get, left.output, j.output)
            case LeftAnti =>
              RewriteSupport.regroupAntiCol(
                Join(newLeft, right, jt, Some(newCond), hint),
                rid.get, left.output, j.output, cntL.get)
            case _ =>
              // LeftOuter: a constant right-side marker distinguishes
              // null-extension (the right child has no generated col)
              val mark = Alias(Literal(true), markColName)()
              val marked = Project(right.output :+ mark, right)
              val sxAttr = newLeft.output.find(_.name == arrColName).get
              RewriteSupport.collapseOuter(
                Join(newLeft, marked, jt, Some(newCond), hint),
                rid.get, mark.toAttribute,
                EqualNullSafe(tokL, ArrayMin(sxAttr)), j.output)
          }
        case (Some(f), _) if !(hasEqui && broadcastable) =>
          val nonInner = jt != Inner
          val (leftBase, rid) =
            if (nonInner) {
              val (p, a) = RewriteSupport.withRid(left); (p, Some(a))
            } else (left, None)
          val (newLeft, tokL, cntL) = explodePrefix(leftBase, f.aL,
            f.alpha, outer = nonInner, withCnt = jt == LeftAnti)
          val (newRight, tokR, _) = explodePrefix(right, f.aR,
            f.alpha, outer = false, withCnt = false)
          val canonical = EqualTo(tokL,
            ArrayMin(ArrayIntersect(f.aL, f.aR)))
          val needCanon = jt == Inner || jt == LeftOuter
          val newCond = (Seq(EqualTo(tokL, tokR), cond) ++
            (if (needCanon) Seq(canonical) else Nil))
            .reduceLeft[Expression](And)
          val joined = Join(newLeft, newRight, jt, Some(newCond), hint)
          jt match {
            case Inner => Project(j.output, joined)
            case LeftSemi =>
              RewriteSupport.regroupSemi(joined, rid.get, left.output,
                j.output)
            case LeftAnti =>
              RewriteSupport.regroupAntiCol(joined, rid.get, left.output,
                j.output, cntL.get)
            case _ =>
              // one representative for match-free rids: the row whose
              // token null-safe-equals the MINIMAL sorted-distinct
              // token (= the first; array_min never throws on empties,
              // and null <=> null keeps the zero-prefix row)
              val sxAttr = newLeft.output
                .find(_.name == arrColName).get
              RewriteSupport.collapseOuter(joined, rid.get, tokR,
                EqualNullSafe(tokL, ArrayMin(sxAttr)),
                j.output)
          }
        case _ => j
      }
  }
}
