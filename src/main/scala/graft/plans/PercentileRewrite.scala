package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{Cross => CrossType, Inner => InnerType, LeftOuter => LeftOuterType}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Plans naive exact-percentile aggregates distributed.
  *
  * Spark's exact `percentile`/`median`/`percentile_cont` is a
  * `TypedAggregateWithHashMapAsBuffer`: every (value → count) pair of the
  * column funnels into ONE OpenHashMap per group, and the final merge per
  * group is a single task holding that group's distinct values. Two naive
  * shapes hit a wall at scale:
  *
  *   - GLOBAL grain (no GROUP BY): one reducer holds the whole column's
  *     distinct values — for a continuous column (scores, latencies)
  *     distinct ≈ rows, so `SELECT median(score) FROM corpus` at 100 TB
  *     is an OOM on one task, the aggregate-shaped cousin of the naive
  *     global `row_number()` cliff.
  *   - PROVABLY-BOUNDED groups: `GROUP BY CASE …` / `pmod(k)` ladders
  *     cap parallelism at the domain size by pigeonhole (the same
  *     theorem [[GlobalRankRewrite]] uses for bounded-partition
  *     windows) — ≤ 64 tasks each holding ~n/64 distinct values is the
  *     same cliff wearing a tier label. Attribute groups (`lang`,
  *     `l_returnflag`) stand down: nothing in the plan proves their
  *     cardinality, and high-NDV grouping parallelizes natively.
  *
  * The rewrite re-expresses the aggregate as ORDER-STATISTIC SELECTION:
  *
  *   1. drop null values (Percentile ignores them), project the column
  *      (+ group keys);
  *   2. count rows — globally (1 row, broadcast) or per group over the
  *      UNFILTERED input (≤ [[GlobalRankRewrite.maxGroups]] rows, so
  *      all-null groups keep their output row);
  *   3. stamp each row with its `row_number()` over the value order —
  *      emitted as the NAIVE window (global, or partitioned by the
  *      bounded group keys), which [[GlobalRankRewrite]] (same
  *      fixed-point batch) immediately re-plans as the distributed-rank
  *      shape. Rule composition, not duplication: this rule contributes
  *      the aggregate→rank reduction, the rank rule contributes the
  *      scale plan it already owns;
  *   4. keep only rows at positions `floor(pos)+1` / `ceil(pos)+1` per
  *      requested percentile, `pos = p·(n−1)` with n the (group's)
  *      non-null count — ≤ 2·|percentiles| rows per group survive at
  *      any corpus size;
  *   5. a final tiny aggregate interpolates exactly as
  *      `PercentileBase.getPercentile` does:
  *      `(higher−pos)·toDouble(lo) + (pos−lower)·toDouble(hi)`, with the
  *      same two short-circuits (integral position; equal boundary
  *      values) so results are BIT-EQUAL to the naive path, NaN and all.
  *      Grouped results left-outer-join back onto the full group table
  *      (both sides ≤ maxGroups rows) so value-free groups surface with
  *      the native null.
  *
  * Row-number selection is tie-safe: among equal values `row_number` is
  * arbitrary, but the VALUE at a given (group, position) is unique, and
  * the value is all the interpolation reads.
  *
  * Fires only when: every aggregate expression is a plain aliased
  * `Percentile` (no DISTINCT, no FILTER), a passthrough of a grouping
  * expression, or a RIDE-ALONG slot of merge-order-insensitive exact
  * aggregates (count/min/max/exact sums next to the median — the
  * canonical profile query; re-emitted verbatim in a side Aggregate
  * over the same child and joined back, 1 row globally or ≤ maxGroups
  * rows grouped, so the slot is bit-equal to its naive value); all
  * percentiles target the
  * SAME column expression (the common `p50/p90/p99` ladder — mixed
  * columns would need one rank pipeline each; mixed ASC+DESC
  * directions over the one column DO share the pipeline, see below);
  * every percentage is a foldable literal in [0, 1]
  * (out-of-range stands down so the native error surfaces); the value
  * type is numeric (ANSI intervals have their own result-type algebra)
  * and NOT foldable (a constant column is a zero-cost native
  * aggregate — and FoldablePropagation keeps reshaping a rewritten
  * constant pipeline every fixed-point iteration, so the plan never
  * converges); grouping, if any, is provably bounded as above; and the
  * PROJECTED column side is above the broadcast threshold (the same
  * gate [[GlobalRankRewrite]] applies to the emitted window, so the two
  * rules agree on when scale is worth a range shuffle; below it the
  * native hash-map aggregate is strictly cheaper). `percentile_disc`
  * rides the same pipeline with its own positional law — the smallest
  * 1-based position ≥ p·n (the non-legacy cume_dist selection), one row
  * per percentile and no interpolation; the legacy-calculation flag
  * changes that law, so legacy instances stand down.
  *
  * `reverse = true` (percentile_cont … ORDER BY x DESC) flips the sort
  * direction of the emitted window — PercentileBase sorts descending and
  * runs the identical position math, so nothing else changes. MIXED
  * directions in one aggregate list (p01 ASC next to a DESC spec — real
  * profiling queries ask for both) still run ONE pipeline: the sort
  * direction is the shared one when homogeneous (historical plans
  * unchanged) and ascending when mixed, and each opposite-direction
  * target selects MIRRORED positions `n+1−k` — the value at 1-based
  * ascending position `n+1−k` of a multiset IS the value at descending
  * position `k` regardless of tie permutation, and the per-target
  * position/interpolation doubles stay in the target's own direction,
  * so results remain bit-equal to the naive path.
  *
  * WEIGHTED percentiles (`percentile(x, p, freq)` with a non-unit
  * integral frequency — token-weighted length quantiles and friends)
  * have the SAME one-buffer cliff and re-plan at GLOBAL grain through a
  * cumulative-weight variant of the selection: aggregate the corpus to
  * (distinct value, total weight) — the very pairs the naive buffer
  * holds, but as a corpus-parallel hash aggregate — stamp each distinct
  * value with its running weight along the percentile direction (a naive
  * global cumulative-sum window; [[GlobalRankRewrite]] re-plans it, rule
  * composition again), and select the value bracketing expanded-multiset
  * position k as the one with `cum − w < k ≤ cum`. Positions are
  * `p·(N−1)` over N = total weight, interpolation is byte-identical to
  * the unweighted path. Semantics mirrored from `Percentile.update`:
  * null values and null/zero frequencies contribute nothing; a NEGATIVE
  * frequency next to a non-null value throws (a per-row raise in the
  * rewritten filter, exactly where the naive buffer update throws).
  * Floating-point value columns stand down on this path only — the
  * naive buffer keys by boxed equality where −0.0 ≠ 0.0, but a hash
  * aggregate normalizes them together; integral/decimal group exactly.
  * All targets must share ONE frequency expression (mixed unit/weighted
  * stands down via the shared-slot check). Weighted BOUNDED-GROUP
  * percentiles run the same pipeline per group: the (group, value)
  * weight aggregate aliases its expanded group keys in its own output
  * so the per-group cumulative window's pigeonhole proof pierces one
  * level ([[GlobalRankRewrite.expandOnce]] handles Aggregate children),
  * and the left-outer assembly restores all-null / all-zero-weight
  * groups' native null row.
  */
object PercentileRewrite extends Rule[LogicalPlan] {

  /** One aliased percentile of the shared column; `disc` selects the
    * percentile_disc positional rule (no interpolation); `rev` is this
    * target's OWN direction — targets of both directions share one
    * pipeline (see the mirrored-position law at [[Selection.rnsOf]]). */
  private case class Target(origin: Alias, scalar: Boolean,
      ps: Seq[Double], disc: Boolean, rev: Boolean)

  /** An output slot of the original aggregate list, in order. */
  private sealed trait OutUnit
  private case class GroupOut(origin: NamedExpression, idx: Int)
    extends OutUnit
  private case class PctOut(t: Target) extends OutUnit
  /** A NON-percentile aggregate slot riding along (count/min/max next
    * to the median — the canonical profile query): re-emitted VERBATIM
    * in a side Aggregate over the same child and joined back. Only
    * merge-order-insensitive exact aggregates qualify, so the side
    * aggregate is bit-equal to the slot's value in the naive one-pass
    * plan (a float sum would fold in a different order there). */
  private case class OtherOut(origin: NamedExpression) extends OutUnit

  private def unitFrequency(e: Expression): Boolean =
    e.foldable && (e.eval() match {
      case 1 => true
      case 1L => true
      case _ => false
    })

  /** Foldable percentage(s) in [0,1]: Some(list, isScalar). */
  private def percentages(e: Expression): Option[(Seq[Double], Boolean)] = {
    if (!e.foldable) return None
    e.dataType match {
      case DoubleType =>
        Option(e.eval()).collect {
          case d: Double if d >= 0.0 && d <= 1.0 => (Seq(d), true)
        }
      case ArrayType(DoubleType, _) =>
        Option(e.eval()).flatMap { raw =>
          val arr = raw.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          if (arr.numElements() == 0) None
          else {
            val ds = arr.toDoubleArray().toSeq
            if (ds.forall(d => d >= 0.0 && d <= 1.0)) Some((ds, false))
            else None
          }
        }
      case _ => None
    }
  }

  /** The shared (column, frequency) plus per-slot units — None when any
    * aggregate-list entry is neither a supported percentile nor a
    * grouping passthrough, or no percentile is present at all. The
    * frequency slot is None for unit frequency (the unweighted row-rank
    * pipeline) and Some(freq) for a shared non-unit WEIGHTED frequency
    * (the distinct-value cumulative-weight pipeline) — mixing the two in
    * one aggregate stands down via the shared-slot mismatch. Directions
    * need NOT match: each target carries its own `rev` and mixed
    * ASC+DESC ladders ride one pipeline via mirrored positions. */
  private def analyze(groups: Seq[Expression], aggs: Seq[NamedExpression])
      : Option[(Expression, Option[Expression], Seq[OutUnit])] = {
    if (aggs.isEmpty) return None
    def groupIdx(ne: NamedExpression): Option[Int] = {
      val c = ne match { case Alias(ch, _) => ch; case x => x }
      val i = groups.indexWhere(_.semanticEquals(c))
      if (i >= 0) Some(i) else None
    }
    var col0: Option[(Expression, Option[Expression])] = None
    def pctTarget(col: Expression, rev: Boolean, fr: Option[Expression],
        a: Alias, ps: Seq[Double], scalar: Boolean,
        disc: Boolean): Option[OutUnit] =
      col0 match {
        case None => col0 = Some((col, fr))
          Some(PctOut(Target(a, scalar, ps, disc, rev)))
        case Some((c0, f0)) if c0.canonicalized == col.canonicalized &&
            f0.map(_.canonicalized) == fr.map(_.canonicalized) =>
          Some(PctOut(Target(a, scalar, ps, disc, rev)))
        case _ => None
      }
    def okCol(col: Expression): Boolean =
      col.dataType.isInstanceOf[NumericType] && col.deterministic &&
        !col.foldable
    // weighted values must group EXACTLY: the naive buffer is a map
    // keyed by boxed equality, where −0.0 and 0.0 are distinct keys —
    // a hash aggregate normalizes them together, so floating columns
    // stand down on the weighted path (integral/decimal group exactly)
    def okWeightedCol(col: Expression): Boolean = okCol(col) &&
      (integralType(col.dataType) || col.dataType.isInstanceOf[DecimalType])
    def okFreq(freq: Expression): Boolean =
      integralType(freq.dataType) && freq.deterministic
    val units = aggs.map {
      case a @ Alias(AggregateExpression(
          Percentile(col, pct, freq, _, _, rev), Complete, false, None, _), _)
          if okCol(col) && unitFrequency(freq) =>
        percentages(pct).flatMap { case (ps, scalar) =>
          pctTarget(col, rev, None, a, ps, scalar, disc = false)
        }
      case a @ Alias(AggregateExpression(
          Percentile(col, pct, freq, _, _, rev), Complete, false, None, _), _)
          if okWeightedCol(col) && okFreq(freq) =>
        percentages(pct).flatMap { case (ps, scalar) =>
          pctTarget(col, rev, Some(freq), a, ps, scalar, disc = false)
        }
      // non-legacy percentile_disc: pure positional selection — the
      // smallest 1-based position ≥ p·n (ceil; ≥ 1), no interpolation.
      // The legacy flag changes the position law, so it stands down.
      case a @ Alias(AggregateExpression(
          PercentileDisc(col, pct, rev, _, _, false), Complete, false,
          None, _), _) if okCol(col) =>
        percentages(pct).flatMap { case (ps, scalar) =>
          pctTarget(col, rev, None, a, ps, scalar, disc = true)
        }
      // a DETERMINISTIC mode next to the percentiles defers to the
      // side Aggregate, which ModeRewrite re-plans in the same
      // fixed-point batch (rule composition both ways — ModeRewrite
      // defers eligible percentile slots symmetrically)
      case a @ Alias(ae: AggregateExpression, _)
          if ModeRewrite.eligible(ae) =>
        Some(OtherOut(a))
      case ne =>
        groupIdx(ne).map(GroupOut(ne, _))
          .orElse(if (exactOther(ne)) Some(OtherOut(ne)) else None)
    }
    if (units.exists(_.isEmpty) || col0.isEmpty) None
    else col0.map { case (c, f) => (c, f, units.flatten) }
  }

  /** A ride-along slot the side Aggregate reproduces BIT-EQUAL to the
    * naive one-pass plan: deterministic expression over whitelisted
    * merge-order-insensitive aggregate functions. Exact sums/averages
    * only (a double sum folds in a partition-order-dependent order —
    * the naive ObjectHashAggregate and the side HashAggregate would
    * disagree by ulps); Min/Max/Count/BoolAnd/BoolOr/HLL++ are
    * insensitive at any type. First/Last/collect_* are value-
    * nondeterministic and never qualify. */
  private[plans] def exactOther(ne: NamedExpression): Boolean = {
    val aes = ne.collect { case ae: AggregateExpression => ae }
    // every column reference must live INSIDE an aggregate: a slot
    // mixing grouping references with aggregates (g + sum(x)) would
    // have to match the side Aggregate's EXPANDED group spellings at
    // physical planning — not guaranteed, so it stands down
    lazy val outsideRefsOk = ne.transform {
      case ae: AggregateExpression => Literal(null, ae.dataType)
    }.references.isEmpty
    aes.nonEmpty && ne.deterministic && outsideRefsOk &&
      aes.forall(exactOtherAe)
  }

  /** The per-aggregate whitelist behind [[exactOther]] — also the
    * gate [[GlobalRankRewrite]]'s full-frame arm applies to the
    * NON-percentile/mode members of a mixed window node before
    * converting it to the Aggregate this rule then re-plans. */
  private[plans] def exactOtherAe(ae: AggregateExpression): Boolean =
    ae.aggregateFunction match {
      case Sum(e, _) =>
        integralType(e.dataType) || e.dataType.isInstanceOf[DecimalType]
      case Average(e, _) => integralType(e.dataType)
      case _: Count => true
      case Min(_) | Max(_) => true
      case _: BoolAnd | _: BoolOr => true
      case _: HyperLogLogPlusPlus => true
      case _ => false
    }

  /** The pipeline's sort direction: the shared direction when every
    * target agrees (so homogeneous ladders keep their historical plan
    * byte-for-byte), ascending when mixed — opposite-direction targets
    * then select MIRRORED positions (`n+1−k`), which read the SAME
    * values the native descending sort reads: the value at 1-based
    * ascending position `n+1−k` of a multiset IS the value at
    * descending position `k`, independent of tie permutation. */
  private def pipelineRev(targets: Seq[Target]): Boolean = {
    val revs = targets.map(_.rev).distinct
    revs.size == 1 && revs.head
  }

  private def integralType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** The percentile shapes [[apply]] rewrites — exposed so
    * [[GlobalRankRewrite]]'s full-frame arm can pre-screen
    * window-spelled percentiles before converting them to the Aggregate
    * this rule then re-plans (rule composition). Returns the (column,
    * reverse, frequency-or-None) slot for same-pipeline homogeneity
    * checks; None = not a rewritable shape. */
  private[plans] def eligible(ae: AggregateExpression)
      : Option[(Expression, Boolean, Option[Expression])] = {
    def okCol(col: Expression): Boolean =
      col.dataType.isInstanceOf[NumericType] && col.deterministic &&
        !col.foldable
    ae match {
      case AggregateExpression(Percentile(col, pct, freq, _, _, rev),
          Complete, false, None, _)
          if okCol(col) && unitFrequency(freq) &&
            percentages(pct).isDefined =>
        Some((col, rev, None))
      case AggregateExpression(Percentile(col, pct, freq, _, _, rev),
          Complete, false, None, _)
          if okCol(col) &&
            (integralType(col.dataType) ||
              col.dataType.isInstanceOf[DecimalType]) &&
            integralType(freq.dataType) && freq.deterministic &&
            percentages(pct).isDefined =>
        Some((col, rev, Some(freq)))
      case AggregateExpression(PercentileDisc(col, pct, rev, _, _, false),
          Complete, false, None, _)
          if okCol(col) && percentages(pct).isDefined =>
        Some((col, rev, None))
      case _ => None
    }
  }

  private def bigEnough(p: LogicalPlan): Boolean = {
    val t = conf.autoBroadcastJoinThreshold
    t < 0 || p.stats.sizeInBytes > t
  }

  /** Pigeonhole gate for grouped percentiles: every grouping expression
    * (expanded one level through the child's Project — the
    * PullOutGroupingExpressions alias) has a provable domain bound and
    * the product is ≤ [[GlobalRankRewrite.maxGroups]]. Returns the
    * expanded expressions so the emitted window's partition keys are
    * the PROVABLE forms (the bound must survive into the plan
    * [[GlobalRankRewrite]] gates on). Attribute keys the structural
    * prover cannot bound fall back to catalog ndv stats
    * ([[GlobalRankRewrite.statsBound]], CBO-gated) — stats key on the
    * exprId, which survives into the emitted window's child, so the
    * downstream gate re-admits the same attribute the same way. */
  private def boundedGroups(groups: Seq[Expression],
      child: LogicalPlan): Option[Seq[Expression]] = {
    val ex = groups.map(GlobalRankRewrite.expandOnce(_, child))
    val doms = ex.zip(groups).map { case (e, g) =>
      GlobalRankRewrite.boundedDomain(e)
        .orElse(GlobalRankRewrite.statsBound(e, child))
        .orElse(GlobalRankRewrite.statsBound(g, child))
    }
    if (doms.forall(_.isDefined) &&
      doms.flatten.foldLeft(1L)((a, b) =>
        if (a > GlobalRankRewrite.maxGroups) a else a * b) <=
        GlobalRankRewrite.maxGroups) Some(ex)
    else None
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groups, aggExprs, child, _)
        if !child.isStreaming && child.deterministic &&
          groups.forall(_.deterministic) &&
          !child.output.exists(_.name == "graft_pct_x") =>
      analyze(groups, aggExprs) match {
        case Some((col, None, units)) if groups.isEmpty =>
          val ts = units.collect { case PctOut(t) => t }
          assembleGlobal(units, child,
            rewriteGlobal(col, pipelineRev(ts), ts, child, agg), agg)
        case Some((col, Some(freq), units)) if groups.isEmpty =>
          val ts = units.collect { case PctOut(t) => t }
          assembleGlobal(units, child,
            rewriteWeightedGlobal(col, freq, pipelineRev(ts), ts, child,
              agg), agg)
        case Some((col, None, units)) =>
          boundedGroups(groups, child) match {
            case Some(ex) =>
              val ts = units.collect { case PctOut(t) => t }
              rewriteGrouped(col, pipelineRev(ts), units, ex, child, agg)
            case None => agg
          }
        case Some((col, Some(freq), units)) =>
          boundedGroups(groups, child) match {
            case Some(ex) =>
              val ts = units.collect { case PctOut(t) => t }
              rewriteWeightedGrouped(col, freq, pipelineRev(ts), units, ex,
                child, agg)
            case None => agg
          }
        case _ => agg
      }
  }

  /** Positional selection + interpolation shared by both grains: given
    * the value/count/rank expressions, yields the keep condition and a
    * per-percentage interpolation body with the aggregate functions
    * embedded (Aggregate result expressions cannot reference sibling
    * aliases; PhysicalAggregation maps each shared instance to one
    * buffer slot). */
  private final class Selection(px: Attribute, pn: Attribute,
      hit: Expression => Expression, specs: Seq[(Double, Boolean, Boolean)],
      pipeRev: Boolean) {
    // cont: pos = p·(n−1) exactly as PercentileBase
    // (maxPosition.toDouble · p); rows at floor+1 / ceil+1
    private def pos(n: Expression, p: Double): Expression =
      Multiply(Cast(Subtract(n, Literal(1L)), DoubleType), Literal(p))
    private def lowerRn(n: Expression, p: Double): Expression =
      Add(Floor(pos(n, p)), Literal(1L))
    private def higherRn(n: Expression, p: Double): Expression =
      Add(Ceil(pos(n, p)), Literal(1L))
    // disc: the smallest 1-based position ≥ p·n (ceil, floored at 1) —
    // the non-legacy cume_dist selection law
    private def discRn(n: Expression, p: Double): Expression =
      Greatest(Seq(Literal(1L),
        Ceil(Multiply(Literal(p), Cast(n, DoubleType)))))

    // FLIPPED specs read positions of the OPPOSITE sort direction
    // through the pipeline's single order: 1-based position k of the
    // opposite order is position n+1−k of this one — a multiset
    // order-statistic identity, so the VALUES read are exactly those
    // the native opposite-direction sort reads, ties notwithstanding.
    // Position math (floor/ceil/lerp weights) stays in the target's own
    // direction, so the doubles are bit-identical to the native path.
    private def rnsOf(p: Double, disc: Boolean,
        flip: Boolean): Seq[Expression] =
      (disc, flip) match {
        case (true, false) => Seq(discRn(pn, p))
        case (true, true) =>
          Seq(Subtract(Add(pn, Literal(1L)), discRn(pn, p)))
        case (false, false) => Seq(lowerRn(pn, p), higherRn(pn, p))
        case (false, true) =>
          // mirror of floor+1 is n−floor; of ceil+1 is n−ceil — order
          // kept (lower first) so interp's (lo, hi) destructure holds
          Seq(Subtract(pn, Floor(pos(pn, p))),
            Subtract(pn, Ceil(pos(pn, p))))
      }

    val keepCond: Expression = specs.flatMap { case (p, d, f) =>
      rnsOf(p, d, f).map(hit)
    }.reduce(Or)

    private def maxIf(cond: Expression): AggregateExpression =
      AggregateExpression(Max(If(cond, px, Literal(null, px.dataType))),
        Complete, isDistinct = false)
    val nAt: Expression =
      AggregateExpression(Max(pn), Complete, isDistinct = false)
    private val perP: Map[(Double, Boolean, Boolean), Seq[Expression]] =
      specs.map { case (p, d, f) =>
        (p, d, f) -> rnsOf(p, d, f).map(k => maxIf(hit(k)): Expression)
      }.toMap

    /** Post-aggregate interpolation, PercentileBase.getPercentile
      * verbatim. */
    def interp(p: Double, flip: Boolean): Expression = {
      val Seq(lo, hi) = perP((p, false, flip))
      val posA = pos(nAt, p)
      val lowerA = Floor(posA)
      val higherA = Ceil(posA)
      val lerp = Add(
        Multiply(Subtract(Cast(higherA, DoubleType), posA),
          Cast(lo, DoubleType)),
        Multiply(Subtract(posA, Cast(lowerA, DoubleType)),
          Cast(hi, DoubleType)))
      // both native short-circuits: integral position collapses to
      // lo === hi (same row selected), and equal boundary VALUES return
      // toDouble(lo) un-interpolated — EqualTo's NaN==NaN semantics
      // match the ordering PercentileBase sorts with
      If(EqualTo(lo, hi), Cast(lo, DoubleType), lerp)
    }

    /** percentile_disc: the selected value itself, as a double. */
    def discVal(p: Double, flip: Boolean): Expression =
      Cast(perP((p, true, flip)).head, DoubleType)

    private def one(p: Double, disc: Boolean, flip: Boolean): Expression =
      if (disc) discVal(p, flip) else interp(p, flip)

    /** The result body for one target (array form wraps per-p bodies;
      * null when the group had no values). */
    def body(t: Target): Expression = {
      val flip = t.rev != pipeRev
      if (t.scalar) one(t.ps.head, t.disc, flip)
      else {
        val at = ArrayType(DoubleType, containsNull = false)
        If(IsNull(nAt), Literal(null, at),
          CreateArray(t.ps.map(one(_, t.disc, flip))))
      }
    }
  }

  /** The distinct (percentage, disc, flipped) selection specs for one
    * pipeline direction. */
  private def specsOf(targets: Seq[Target],
      pipeRev: Boolean): Seq[(Double, Boolean, Boolean)] =
    targets.flatMap(t =>
      t.ps.map(pp => (pp, t.disc, t.rev != pipeRev))).distinct

  /** GLOBAL-grain assembly of ride-along slots: the percentile
    * pipeline's 1-row result cross-joins the 1-row side Aggregate that
    * re-emits the non-percentile slots verbatim, and a Project restores
    * the original column order (exprIds live on both join sides). When
    * the percentile rewrite itself stood down (below threshold), the
    * original Aggregate came back unchanged — pass it through. */
  private def assembleGlobal(units: Seq[OutUnit], child: LogicalPlan,
      pctPlan: LogicalPlan, orig: Aggregate): LogicalPlan = {
    val others = units.collect { case OtherOut(ne) => ne }
    if (others.isEmpty || (pctPlan eq orig)) return pctPlan
    val oAgg = Aggregate(Nil, others, child)
    val j = Join(oAgg, pctPlan, CrossType, None, bcast)
    val byId = j.output.map(a => a.exprId -> a).toMap
    val out: Seq[NamedExpression] = units.collect {
      case PctOut(t) => byId(t.origin.exprId)
      case OtherOut(ne) => byId(ne.exprId)
    }
    Project(out, j)
  }

  private def rowFrame =
    SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)

  private def bcast: JoinHint =
    JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST))))

  private def rewriteGlobal(col: Expression, rev: Boolean,
      targets: Seq[Target], child: LogicalPlan,
      orig: Aggregate): LogicalPlan = {
    val pxA = Alias(col, "graft_pct_x")()
    val proj = Project(Seq(pxA), child)
    if (!bigEnough(proj)) return orig
    val px = pxA.toAttribute
    val flt = Filter(IsNotNull(px), proj)

    // 1-row count side (order-independent aggregate, broadcast)
    val cntA = Alias(AggregateExpression(Count(Seq(Literal(1))), Complete,
      isDistinct = false), "graft_pct_n")()
    val cnt = Aggregate(Nil, Seq(cntA), flt)

    // naive global row_number — GlobalRankRewrite re-plans it (same
    // fixed-point batch; both rules share the broadcast-threshold gate)
    val dir = if (rev) Descending else Ascending
    val ord = Seq(SortOrder(px, dir))
    val rnA = Alias(WindowExpression(RowNumber(),
      WindowSpecDefinition(Nil, ord, rowFrame)), "graft_pct_rn")()
    val win = Window(Seq(rnA), Nil, ord, flt)

    val j = Join(win, cnt, CrossType, None, bcast)
    // row_number is IntegerType; positions are Long — cast once (no
    // analyzer below the optimizer to insert it implicitly)
    val rn = Cast(rnA.toAttribute, LongType)
    val sel = new Selection(px, cntA.toAttribute,
      k => EqualTo(rn, k),
      specsOf(targets, rev), rev)
    val keep = Filter(sel.keepCond, j)

    val results: Seq[NamedExpression] = targets.map { t =>
      Alias(sel.body(t), t.origin.name)(exprId = t.origin.exprId)
    }
    Aggregate(Nil, results, keep)
  }

  /** WEIGHTED global grain: (distinct value, total weight) hash
    * aggregate → cumulative weight along the percentile direction (a
    * naive global window that [[GlobalRankRewrite]] re-plans) →
    * bracketing-value selection `cum − w < k ≤ cum` → the shared
    * interpolation. See the object doc for the mirrored
    * `Percentile.update` semantics (null/zero skip, negative throw). */
  private def rewriteWeightedGlobal(col: Expression, freq: Expression,
      rev: Boolean, targets: Seq[Target], child: LogicalPlan,
      orig: Aggregate): LogicalPlan = {
    val pxA = Alias(col, "graft_pct_x")()
    val pfA = Alias(Cast(freq, LongType), "graft_pct_f")()
    val proj = Project(Seq(pxA, pfA), child)
    if (!bigEnough(proj)) return orig
    val px = pxA.toAttribute
    val pf = pfA.toAttribute
    val zero = Literal(0L)
    // per-row gate mirroring Percentile.update: a null value or null
    // frequency skips BEFORE the sign check (so a negative frequency
    // next to a null value does NOT throw, matching the naive buffer),
    // zero contributes nothing, negative raises where the scan reads it.
    // The null skip lives INSIDE the gate (not only in the IsNotNull
    // conjuncts) so correctness never depends on conjunct ordering —
    // predicate pushdown may split/reorder conjunctive filters.
    val gate = If(Or(IsNull(px), IsNull(pf)), Literal(false),
      If(LessThan(pf, zero),
        Cast(RaiseError(Literal(
          "Negative values found in the frequency expression")),
          BooleanType),
        GreaterThan(pf, zero)))
    val flt = Filter(And(And(IsNotNull(px), IsNotNull(pf)), gate), proj)

    // the naive buffer's (value → weight) pairs, corpus-parallel
    val wA = Alias(AggregateExpression(Sum(pf), Complete,
      isDistinct = false), "graft_pct_w")()
    val vals = Aggregate(Seq(px), Seq(px: NamedExpression, wA), flt)

    // 1-row expanded-multiset size N = total weight (broadcast)
    val nA = Alias(AggregateExpression(Sum(pf), Complete,
      isDistinct = false), "graft_pct_n")()
    val tot = Aggregate(Nil, Seq(nA), flt)

    // running weight in the percentile direction, at distinct-value
    // grain — emitted naive; GlobalRankRewrite's cumulative arm
    // re-plans it in the same fixed-point batch (rule composition)
    val dir = if (rev) Descending else Ascending
    val ord = Seq(SortOrder(px, dir))
    val cwA = Alias(WindowExpression(AggregateExpression(
      Sum(wA.toAttribute), Complete, isDistinct = false),
      WindowSpecDefinition(Nil, ord, rowFrame)), "graft_pct_cw")()
    val win = Window(Seq(cwA), Nil, ord, vals)

    val j = Join(win, tot, CrossType, None, bcast)
    val cw = cwA.toAttribute
    val prev = Subtract(cw, wA.toAttribute)
    val sel = new Selection(px, nA.toAttribute,
      k => And(GreaterThan(k, prev), LessThanOrEqual(k, cw)),
      specsOf(targets, rev), rev)
    val keep = Filter(sel.keepCond, j)

    val results: Seq[NamedExpression] = targets.map { t =>
      Alias(sel.body(t), t.origin.name)(exprId = t.origin.exprId)
    }
    Aggregate(Nil, results, keep)
  }

  /** Each group key in its expanded (provable) form when that form's
    * references survive into the child's output, else the original
    * expression — a user Project between the key's definition and the
    * Aggregate may have dropped the defining columns, making the
    * expanded form unevaluable there even though the domain PROOF it
    * provided still holds (the original attribute carries the same
    * per-row values by construction). */
  private def evaluableGroups(expanded: Seq[Expression],
      original: Seq[Expression], child: LogicalPlan): Seq[Expression] =
    expanded.zip(original).map { case (e, g) =>
      if (e.references.subsetOf(child.outputSet)) e else g
    }

  /** WEIGHTED bounded-group grain: the weighted-global pipeline per
    * provably-bounded group. The (group, value) weight aggregate GROUPS
    * BY the expanded bounded expressions and ALIASES them in its own
    * output, so the per-group cumulative-weight window sits directly on
    * an Aggregate whose aliases [[GlobalRankRewrite.expandOnce]] pierces
    * — the pigeonhole proof survives and the window re-plans
    * per-group-distributed. Per-group totals come from the UNFILTERED
    * input (all-null and all-zero-weight groups keep their native null
    * row via the left-outer assembly; zero weights add 0 to N). */
  private def rewriteWeightedGrouped(col: Expression, freq: Expression,
      rev: Boolean, units: Seq[OutUnit], groupEx: Seq[Expression],
      child: LogicalPlan, orig: Aggregate): LogicalPlan = {
    val targets = units.collect { case PctOut(t) => t }
    val fL = Cast(freq, LongType)
    val zero = Literal(0L)
    // per-row gate mirroring Percentile.update (see rewriteWeightedGlobal;
    // null skip inside the gate so conjunct reordering cannot raise)
    val gate = If(Or(IsNull(col), IsNull(fL)), Literal(false),
      If(LessThan(fL, zero),
        Cast(RaiseError(Literal(
          "Negative values found in the frequency expression")),
          BooleanType),
        GreaterThan(fL, zero)))
    val fltC = Filter(And(And(IsNotNull(col), IsNotNull(fL)), gate), child)
    if (!bigEnough(Project(Seq(Alias(col, "graft_pct_x")()), child)))
      return orig

    // evaluate each group key in its expanded (provable) form when its
    // references survive into the child's output, else as the original
    // expression (a user Project may have dropped the defining columns
    // — the domain proof still held, but re-evaluation must resolve;
    // the inner window then simply keeps its naive bounded plan)
    val evalEx = evaluableGroups(groupEx, orig.groupingExpressions, child)

    // (group, value) weights — group keys aliased IN the aggregate so
    // the window's bounded-domain proof pierces one level to them
    val gAs = evalEx.zipWithIndex.map { case (g, i) =>
      Alias(g, s"graft_pct_g$i")()
    }
    val pxA = Alias(col, "graft_pct_x")()
    val wA = Alias(AggregateExpression(Sum(fL), Complete,
      isDistinct = false), "graft_pct_w")()
    val vals = Aggregate(evalEx :+ col,
      (gAs: Seq[NamedExpression]) ++ Seq(pxA, wA), fltC)
    val gAttrs = gAs.map(_.toAttribute)
    val px = pxA.toAttribute

    // running weight per group along the percentile direction
    val dir = if (rev) Descending else Ascending
    val ord = Seq(SortOrder(px, dir))
    val cwA = Alias(WindowExpression(AggregateExpression(
      Sum(wA.toAttribute), Complete, isDistinct = false),
      WindowSpecDefinition(gAttrs, ord, rowFrame)), "graft_pct_cw")()
    val win = Window(Seq(cwA), gAttrs, ord, vals)

    // full group table over the UNFILTERED input: per-group total
    // weight N over rows the naive buffer would store (null value or
    // null frequency contribute nothing; zeros add 0)
    val cgAs = evalEx.zipWithIndex.map { case (g, i) =>
      Alias(g, s"graft_pct_cg$i")()
    }
    val f2A = Alias(If(And(IsNotNull(col), IsNotNull(fL)), fL,
      Literal(null, LongType)), "graft_pct_f2")()
    val projAll = Project(cgAs :+ f2A, child)
    val cgAttrs = cgAs.map(_.toAttribute)
    val nA = Alias(AggregateExpression(Sum(f2A.toAttribute), Complete,
      isDistinct = false), "graft_pct_n")()
    val cnt = Aggregate(cgAttrs, (cgAttrs: Seq[NamedExpression]) :+ nA,
      projAll)

    def grpCond(ls: Seq[Attribute], rs: Seq[Attribute]): Expression =
      ls.zip(rs).map[Expression] { case (l, r) => EqualNullSafe(l, r) }
        .reduce(And)

    val j = Join(win, cnt, InnerType, Some(grpCond(gAttrs, cgAttrs)), bcast)
    val cw = cwA.toAttribute
    val prev = Subtract(cw, wA.toAttribute)
    val sel = new Selection(px, nA.toAttribute,
      k => And(GreaterThan(k, prev), LessThanOrEqual(k, cw)),
      specsOf(targets, rev), rev)
    val keep = Filter(sel.keepCond, j)

    val resAs = targets.zipWithIndex.map { case (t, i) =>
      Alias(sel.body(t), s"graft_pct_r$i")()
    }
    val resAgg = Aggregate(gAttrs,
      (gAttrs: Seq[NamedExpression]) ++ resAs, keep)
    val outer = Join(cnt, resAgg, LeftOuterType,
      Some(grpCond(cgAttrs, gAttrs)), bcast)
    val (assembled, oMap) =
      assembleGrouped(units, evalEx, child, outer, cgAttrs, grpCond)

    val out: Seq[NamedExpression] = units.map {
      case GroupOut(origin, i) =>
        Alias(cgAttrs(i), origin.name)(exprId = origin.exprId)
      case PctOut(t) =>
        val idx = targets.indexWhere(_.origin.exprId == t.origin.exprId)
        Alias(resAs(idx).toAttribute.withNullability(true),
          t.origin.name)(exprId = t.origin.exprId)
      case OtherOut(ne) => oMap(ne.exprId)
    }
    Project(out, assembled)
  }

  /** GROUPED-grain assembly of ride-along slots: a per-group side
    * Aggregate over the UNFILTERED child (same provable group keys →
    * identical group set as the count table, ≤ maxGroups rows) re-emits
    * the non-percentile slots verbatim and inner-joins the assembly on
    * null-safe group keys. */
  private def assembleGrouped(units: Seq[OutUnit],
      evalEx: Seq[Expression], child: LogicalPlan, outer: LogicalPlan,
      cgAttrs: Seq[Attribute],
      grpCond: (Seq[Attribute], Seq[Attribute]) => Expression)
      : (LogicalPlan, Map[ExprId, Attribute]) = {
    val others = units.collect { case OtherOut(ne) => ne }
    if (others.isEmpty) (outer, Map.empty)
    else {
      val ogAs = evalEx.zipWithIndex.map { case (g, i) =>
        Alias(g, s"graft_pct_og$i")()
      }
      val oAgg = Aggregate(evalEx,
        (ogAs: Seq[NamedExpression]) ++ others, child)
      val j = Join(outer, oAgg, InnerType,
        Some(grpCond(cgAttrs, ogAs.map(_.toAttribute))), bcast)
      (j, others.map(ne => ne.exprId -> ne.toAttribute).toMap)
    }
  }

  /** Bounded-group grain: per-group rank pipeline (the emitted window is
    * partitioned by the PROVABLY-bounded keys, so [[GlobalRankRewrite]]'s
    * pigeonhole path re-plans it), per-group counts over the UNFILTERED
    * input, and a left-outer assembly so value-free groups keep their
    * native null row. Every non-rank collection here is ≤ maxGroups
    * rows. */
  private def rewriteGrouped(col: Expression, rev: Boolean,
      units: Seq[OutUnit], groupEx: Seq[Expression], child: LogicalPlan,
      orig: Aggregate): LogicalPlan = {
    val targets = units.collect { case PctOut(t) => t }

    // value pipeline: null-drop FIRST (on the raw expression, directly
    // over the child) so the Project above stays the window's immediate
    // child — the bounded-domain gate expands partition keys exactly one
    // Project level
    val fltC = Filter(IsNotNull(col), child)
    val evalEx = evaluableGroups(groupEx, orig.groupingExpressions, child)
    val gAs = evalEx.zipWithIndex.map { case (g, i) =>
      Alias(g, s"graft_pct_g$i")()
    }
    val gAttrs = gAs.map(_.toAttribute)
    val pxA = Alias(col, "graft_pct_x")()
    val proj = Project(gAs :+ pxA, fltC)
    if (!bigEnough(proj)) return orig
    val px = pxA.toAttribute

    val dir = if (rev) Descending else Ascending
    val ord = Seq(SortOrder(px, dir))
    val rnA = Alias(WindowExpression(RowNumber(),
      WindowSpecDefinition(gAttrs, ord, rowFrame)), "graft_pct_rn")()
    val win = Window(Seq(rnA), gAttrs, ord, proj)

    // full group table over the UNFILTERED input: non-null value counts
    // per group, one row per group INCLUDING all-null groups
    val cgAs = evalEx.zipWithIndex.map { case (g, i) =>
      Alias(g, s"graft_pct_cg$i")()
    }
    val px2A = Alias(col, "graft_pct_x2")()
    val projAll = Project(cgAs :+ px2A, child)
    val cgAttrs = cgAs.map(_.toAttribute)
    val cntA = Alias(AggregateExpression(Count(Seq(px2A.toAttribute)),
      Complete, isDistinct = false), "graft_pct_n")()
    val cnt = Aggregate(cgAttrs, (cgAttrs: Seq[NamedExpression]) :+ cntA,
      projAll)

    def grpCond(ls: Seq[Attribute], rs: Seq[Attribute]): Expression =
      ls.zip(rs).map[Expression] { case (l, r) => EqualNullSafe(l, r) }
        .reduce(And)

    val j = Join(win, cnt, InnerType, Some(grpCond(gAttrs, cgAttrs)), bcast)
    val rn = Cast(rnA.toAttribute, LongType)
    val sel = new Selection(px, cntA.toAttribute,
      k => EqualTo(rn, k),
      specsOf(targets, rev), rev)
    val keep = Filter(sel.keepCond, j)

    // per-group results (≤ 2·|ps| rows per group reach this aggregate)
    val resAs = targets.zipWithIndex.map { case (t, i) =>
      Alias(sel.body(t), s"graft_pct_r$i")()
    }
    val resAgg = Aggregate(gAttrs,
      (gAttrs: Seq[NamedExpression]) ++ resAs, keep)

    // assemble: every group row from cnt, results where a group had
    // values, native null otherwise — both sides ≤ maxGroups rows
    val outer = Join(cnt, resAgg, LeftOuterType,
      Some(grpCond(cgAttrs, gAttrs)), bcast)
    val (assembled, oMap) =
      assembleGrouped(units, evalEx, child, outer, cgAttrs, grpCond)

    val out: Seq[NamedExpression] = units.map {
      case GroupOut(origin, i) =>
        Alias(cgAttrs(i), origin.name)(exprId = origin.exprId)
      case PctOut(t) =>
        val idx = targets.indexWhere(_.origin.exprId == t.origin.exprId)
        Alias(resAs(idx).toAttribute.withNullability(true),
          t.origin.name)(exprId = t.origin.exprId)
      case OtherOut(ne) => oMap(ne.exprId)
    }
    Project(out, assembled)
  }
}
