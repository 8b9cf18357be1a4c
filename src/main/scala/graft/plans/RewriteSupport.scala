package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, First}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types._

/** Shared machinery for the blocking join rules' NON-INNER variants
  * ([[HammingJoinBlocking]] left-semi/anti, [[BandJoinBlocking]]
  * left-outer/semi/anti).
  *
  * The inner rewrites preserve bag semantics pair-by-pair (canonical
  * first match / distinct probe buckets), but semi/anti/outer semantics
  * are per-LEFT-ROW: a left row exploded into N blocking rows must
  * collapse back to one verdict. That needs row identity — supplied by
  * a generated `monotonically_increasing_id` column. The id is
  * nondeterministic, which is SAFE here by construction: it is created
  * in exactly ONE Project in exactly ONE subtree and consumed by a
  * single Aggregate/Window directly above the join — never re-computed,
  * never self-joined (the classic nondeterministic-id hazard needs two
  * evaluations of the same subtree to disagree; there is only one).
  *
  * Collapse shapes (both shuffle on the 8-byte rid, not the row):
  *   - SEMI: exploded rows that found a match, one group per rid,
  *     `First` over every left column — all rows in a group are copies
  *     of the same input row, so First is value-deterministic. ExprIds
  *     are preserved via the ReplaceDeduplicateWithAggregate aliasing
  *     pattern, so the parent plan's resolution is untouched.
  *   - ANTI: left-anti join at exploded grain keeps a blocking row iff
  *     ITS bucket/segment found no partner; the original row qualifies
  *     iff ALL N of its blocking rows survived (pigeonhole: any true
  *     match would have claimed at least one), i.e. count(*) == N.
  *   - OUTER ([[BandJoinBlocking]] only): left-outer join at exploded
  *     grain, then a per-rid window count of matches — matched rows pass
  *     through (exactly-once by the inner rewrite's guarantee), and for
  *     match-free rids exactly one null-extended representative is kept.
  */
private[plans] object RewriteSupport {

  val ridName = "graft_rid"

  /** `left` plus a per-row id column (see object doc for why the
    * nondeterministic id is safe in these rewrites). */
  def withRid(left: LogicalPlan): (LogicalPlan, Attribute) = {
    val a = Alias(MonotonicallyIncreasingID(), ridName)()
    (Project(left.output :+ a, left), a.toAttribute)
  }

  private def firstAggs(leftOutput: Seq[Attribute]): Seq[NamedExpression] =
    leftOutput.map { a =>
      Alias(AggregateExpression(First(a, ignoreNulls = false), Complete,
        isDistinct = false), a.name)(exprId = a.exprId)
    }

  private def countStar: Alias =
    Alias(AggregateExpression(Count(Seq(Literal(1))), Complete,
      isDistinct = false), "graft_cnt")()

  /** Collapse an exploded LEFT-SEMI join back to left grain. */
  def regroupSemi(joined: LogicalPlan, rid: Attribute,
      leftOutput: Seq[Attribute], out: Seq[Attribute]): LogicalPlan =
    Project(out, Aggregate(Seq(rid), firstAggs(leftOutput), joined))

  /** Collapse an exploded LEFT-ANTI join back to left grain: a left row
    * qualifies iff all `nSeg` of its blocking rows survived the anti. */
  def regroupAnti(joined: LogicalPlan, rid: Attribute,
      leftOutput: Seq[Attribute], out: Seq[Attribute],
      nSeg: Int): LogicalPlan = {
    val cnt = countStar
    val agg = Aggregate(Seq(rid), firstAggs(leftOutput) :+ cnt, joined)
    Project(out,
      Filter(EqualTo(cnt.toAttribute, Literal(nSeg.toLong)), agg))
  }

  /** [[regroupAnti]] with a PER-ROW segment count (the interval arm's
    * variable tile fan-out): `nSeg` is a left-side column carrying how
    * many blocking rows this rid exploded into — all copies agree, so
    * First is value-deterministic like every other left column. */
  def regroupAntiCol(joined: LogicalPlan, rid: Attribute,
      leftOutput: Seq[Attribute], out: Seq[Attribute],
      nSeg: Attribute): LogicalPlan = {
    val cnt = countStar
    val nFirst = Alias(AggregateExpression(First(nSeg,
      ignoreNulls = false), Complete, isDistinct = false), "graft_nseg")()
    val agg = Aggregate(Seq(rid),
      firstAggs(leftOutput) ++ Seq(cnt, nFirst), joined)
    Project(out,
      Filter(EqualTo(cnt.toAttribute, nFirst.toAttribute), agg))
  }

  /** Collapse an exploded LEFT-OUTER join: `marker` is a right-side
    * attribute that is null exactly on unmatched rows (the generated
    * bucket key — non-null on every real match by the equi-key's own
    * null rejection). Matched rows pass; a rid with zero matches keeps
    * only its canonical representative (`keepIfUnmatched`). */
  def collapseOuter(joined: LogicalPlan, rid: Attribute,
      marker0: Attribute, keepIfUnmatched: Expression,
      out: Seq[Attribute]): LogicalPlan = {
    // nullable copy: above the outer join the marker CAN be null even
    // when its defining expression cannot — non-nullable metadata would
    // let NullPropagation fold IsNotNull(marker) to true (binding is by
    // exprId, so the relaxed copy is always safe)
    val marker = marker0.withNullability(true)
    val mcnt = Alias(WindowExpression(
      AggregateExpression(Count(Seq(marker)), Complete,
        isDistinct = false),
      WindowSpecDefinition(Seq(rid), Nil,
        SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
          UnboundedFollowing))), "graft_mcnt")()
    val win = Window(Seq(mcnt), Seq(rid), Nil, joined)
    val keep = Or(IsNotNull(marker),
      And(EqualTo(mcnt.toAttribute, Literal(0L)), keepIfUnmatched))
    Project(out, Filter(keep, win))
  }
}
