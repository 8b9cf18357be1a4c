package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftOuter, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Eligibility helpers shared by the similarity-join blocking rules
  * ([[HammingJoinBlocking]], [[EditDistanceJoinBlocking]],
  * [[SetSimilarityJoinBlocking]], [[BandJoinBlocking]]). These four
  * rules share a doctrine — match a theta conjunct, explode into
  * blocking keys, keep the original condition verbatim, stand down when
  * Spark's own hash join already wins — and the predicates that ENCODE
  * that doctrine must be single-sourced: a fix to one (e.g. the
  * broadcast-threshold stand-down) must not silently diverge from the
  * others.
  */
private[plans] trait BlockingJoinSupport extends PredicateHelper {
  self: Rule[LogicalPlan] =>

  /** Strip a tower of casts down to the underlying expression. */
  protected def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case _ => e
  }

  /** Orient `(a, b)` as `(left-side, right-side)` — None if the pair
    * straddles the children or either side is NON-DETERMINISTIC. The
    * determinism guard is defense in depth: every blocking rewrite
    * re-evaluates the oriented expressions several times (explode
    * projects, the canonical residual, the kept original condition),
    * which is only sound for deterministic expressions. Spark's
    * analyzer already rejects non-deterministic join conditions, but
    * the rules must not rest on that alone. */
  protected def orient(a: Expression, b: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression)] =
    if (!a.deterministic || !b.deterministic) None
    else if (a.references.subsetOf(left.outputSet) &&
      b.references.subsetOf(right.outputSet)) Some((a, b))
    else if (b.references.subsetOf(left.outputSet) &&
      a.references.subsetOf(right.outputSet)) Some((b, a))
    else None

  /** A provable compile-time UPPER BOUND of an integral threshold
    * expression. The pigeonhole plans (hamming segments, PassJoin
    * combos) only need the MAX — their lemmas are monotone (a bound
    * of k ≤ K untouched-segment-guarantees at K+1 segments, and the
    * K-enumeration's windows are supersets of every k ≤ K's) and the
    * kept original condition enforces the per-row value exactly — so
    * RELATIVE thresholds like `least(2, length(s) div 8)` ride the
    * same machinery enumerated at the cap. Provable shapes: literals,
    * `least` with a NON-NULLABLE bounded child (least never exceeds
    * it — but a nullable bounded child is SKIPPED by least when it
    * evaluates null, handing that row's threshold to an unbounded
    * sibling, so nullable children may not contribute the cap),
    * `pmod(_, m)` with positive literal m (range [0, m−1]), and
    * if/CASE ladders whose branch values are all bounded (a missing
    * ELSE yields null ⇒ the WHOLE threshold is null ⇒ the conjunct is
    * not true ⇒ no candidate needed — sound only because null
    * propagates to the top here, unlike inside `least`). Bare
    * unbounded expressions (`length(a) / 10`) yield None — the rules
    * stand down rather than guess. */
  protected def staticBound(e: Expression): Option[Int] =
    stripCast(e) match {
      case Literal(k: Int, IntegerType) => Some(k)
      case Literal(k: Long, LongType) if k.isValidInt => Some(k.toInt)
      case Least(cs) =>
        // least() SKIPS null children: a bounded-but-nullable child
        // (a no-ELSE CASE ladder, a fallible cast) that evaluates
        // null at runtime hands the row's threshold to an unbounded
        // sibling ABOVE the claimed static cap — and the rewrite
        // would silently drop qualifying pairs (or, LEFT ANTI,
        // wrongly keep rows). Only children that provably cannot be
        // null may contribute the cap; nullable shapes still bound
        // when they are the WHOLE threshold (null propagates to the
        // conjunct there).
        val bs = cs.filterNot(_.nullable).flatMap(staticBound)
        if (bs.isEmpty) None else Some(bs.min)
      case Pmod(_, m, _) => stripCast(m) match {
        case Literal(v: Int, IntegerType) if v > 0 => Some(v - 1)
        case Literal(v: Long, LongType) if v > 0 && v.isValidInt =>
          Some(v.toInt - 1)
        case _ => None
      }
      case If(_, a, b) =>
        for { x <- staticBound(a); y <- staticBound(b) }
          yield math.max(x, y)
      case CaseWhen(branches, elseValue) =>
        val vals = branches.map(_._2) ++ elseValue.toSeq
        val bs = vals.flatMap(staticBound)
        if (bs.size == vals.size && bs.nonEmpty) Some(bs.max) else None
      case _ => None
    }

  /** `(lhs, K)` when `e` bounds `lhs` above by a deterministic
    * expression with provable static max K, in any of the four
    * comparison spellings (`lhs ≤ k`, `lhs < k`, `k ≥ lhs`,
    * `k > lhs`; strict forms tighten the cap by 1). The threshold
    * expression itself is never evaluated by the rewrites — it stays
    * in the kept condition — so only its static cap and determinism
    * matter here. */
  protected def boundedBy(e: Expression): Option[(Expression, Int)] = {
    def cap(l: Expression): Option[Int] =
      if (l.deterministic) staticBound(l) else None
    e match {
      case LessThanOrEqual(x, l) => cap(l).map(k => (x, k))
      case LessThan(x, l) => cap(l).map(k => (x, k - 1))
      case GreaterThanOrEqual(l, x) => cap(l).map(k => (x, k))
      case GreaterThan(l, x) => cap(l).map(k => (x, k - 1))
      case _ => None
    }
  }

  /** An `=` / `<=>` conjunct relating the two children — a user equi
    * key the blocking keys would compose with. */
  protected def isEqui(e: Expression, left: LogicalPlan,
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

  /** Join types the left-grain regroup machinery
    * ([[RewriteSupport]]) supports. */
  protected def rewriteable(jt: JoinType): Boolean = jt match {
    case Inner | LeftSemi | LeftAnti | LeftOuter => true
    case _ => false
  }

  /** A side already fits under the auto-broadcast threshold. */
  protected def broadcastable(left: LogicalPlan,
      right: LogicalPlan): Boolean = {
    val t = conf.autoBroadcastJoinThreshold
    t >= 0 && (left.stats.sizeInBytes <= t ||
      right.stats.sizeInBytes <= t)
  }

  /** The shared stand-down doctrine: user equi conjuncts exist AND a
    * side is broadcastable — there Spark's BroadcastHashJoin on the
    * existing keys (the similarity predicate as a cheap residual)
    * beats paying the explode, so the blocking rules leave the join
    * alone. */
  protected def equiBroadcastStandDown(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists(isEqui(_, left, right)) && broadcastable(left, right)
}
