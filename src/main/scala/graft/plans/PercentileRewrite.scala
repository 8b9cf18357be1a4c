package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{Cross => CrossType}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Plans naive GLOBAL exact-percentile aggregates distributed.
  *
  * Spark's exact `percentile`/`median`/`percentile_cont` is a
  * `TypedAggregateWithHashMapAsBuffer`: every (value → count) pair of the
  * column funnels into ONE OpenHashMap, and at GLOBAL grain (no GROUP BY)
  * the final merge is a single task holding the whole column's distinct
  * values. For a continuous column (scores, embeddings norms, latencies)
  * distinct ≈ rows, so `SELECT median(score) FROM corpus` at 100 TB is a
  * driver-sized OOM on one reducer — the same single-point cliff the
  * naive global `row_number()` window has, wearing an aggregate's clothes.
  *
  * The rewrite re-expresses the aggregate as ORDER-STATISTIC SELECTION:
  *
  *   1. project the column, drop nulls (Percentile ignores them);
  *   2. count the rows (1-row side, broadcast);
  *   3. stamp each row with its global `row_number()` over the value
  *      order — emitted as the NAIVE window, which [[GlobalRankRewrite]]
  *      (same fixed-point batch) immediately re-plans as the
  *      distributed-rank shape: sampled split points, per-slice ranks,
  *      broadcast offsets. Rule composition, not duplication: this rule
  *      contributes the aggregate→rank reduction, the rank rule
  *      contributes the scale plan it already owns;
  *   4. keep only the rows at positions `floor(pos)+1` / `ceil(pos)+1`
  *      per requested percentile, `pos = p·(n−1)` — ≤ 2·|percentiles|
  *      rows survive at any corpus size;
  *   5. a final 1-row aggregate interpolates exactly as
  *      `PercentileBase.getPercentile` does:
  *      `(higher−pos)·toDouble(lo) + (pos−lower)·toDouble(hi)`, with the
  *      same two short-circuits (integral position; equal boundary
  *      values) so results are BIT-EQUAL to the naive path, NaN and all.
  *
  * Row-number selection is tie-safe: among equal values `row_number` is
  * arbitrary, but the VALUE at a given global position is unique, and
  * the value is all the interpolation reads.
  *
  * Fires only when: grouping is empty (per-group percentiles parallelize
  * per group — no global cliff); every aggregate expression is a plain
  * aliased `Percentile` (no DISTINCT, no FILTER, frequency = 1 — a
  * non-unit frequency weights rows and selection would need weighted
  * ranks); all percentiles target the SAME column expression with the
  * same `reverse` flag (the common `p50/p90/p99` ladder — mixed columns
  * would need one rank pipeline each); every percentage is a foldable
  * literal in [0, 1] (out-of-range stands down so the native error
  * surfaces); the value type is numeric (ANSI intervals have their own
  * result-type algebra) and NOT foldable (a constant column is a
  * zero-cost native aggregate — and FoldablePropagation keeps reshaping
  * a rewritten constant pipeline every fixed-point iteration, so the
  * plan never converges); and the PROJECTED column side is above the
  * broadcast threshold (the same gate [[GlobalRankRewrite]] applies to
  * the emitted window, so the two rules agree on when scale is worth a
  * range shuffle; below it the native hash-map aggregate is strictly
  * cheaper). `percentile_disc` is a different class with its own
  * selection rule and a legacy flag — it stands down here.
  *
  * `reverse = true` (percentile_cont … ORDER BY x DESC) flips the sort
  * direction of the emitted window — PercentileBase sorts descending and
  * runs the identical position math, so nothing else changes.
  */
object PercentileRewrite extends Rule[LogicalPlan] {

  /** One requested percentile of the shared column. */
  private case class Target(p: Double, origin: Alias, scalar: Boolean,
      ps: Seq[Double])

  private def unitFrequency(e: Expression): Boolean =
    e.foldable && (e.eval() match {
      case 1 => true
      case 1L => true
      case _ => false
    })

  /** Foldable percentage(s) in [0,1]: Some(list) — scalar yields one. */
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

  /** The shared (column, reverse) of a supported all-Percentile aggregate
    * list, with per-alias targets — None when any entry is unsupported. */
  private def analyze(aggs: Seq[NamedExpression])
      : Option[(Expression, Boolean, Seq[Target])] = {
    if (aggs.isEmpty) return None
    val units = aggs.map {
      case a @ Alias(AggregateExpression(
          Percentile(col, pct, freq, _, _, rev), Complete, false, None, _), _)
          if col.dataType.isInstanceOf[NumericType] && col.deterministic &&
            !col.foldable && unitFrequency(freq) =>
        percentages(pct).map { case (ps, scalar) => (col, rev, a, ps, scalar) }
      case _ => None
    }
    if (units.exists(_.isEmpty)) return None
    val us = units.flatten
    val (col0, rev0) = (us.head._1, us.head._2)
    if (!us.forall(u => u._1.canonicalized == col0.canonicalized &&
        u._2 == rev0)) return None
    Some((col0, rev0, us.map { case (_, _, a, ps, scalar) =>
      Target(ps.head, a, scalar, ps) }))
  }

  private def bigEnough(p: LogicalPlan): Boolean = {
    val t = conf.autoBroadcastJoinThreshold
    t < 0 || p.stats.sizeInBytes > t
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if !child.isStreaming && child.deterministic &&
          !child.output.exists(_.name == "graft_pct_x") =>
      analyze(aggExprs) match {
        case Some((col, rev, targets)) =>
          val pxA = Alias(col, "graft_pct_x")()
          val proj = Project(Seq(pxA), child)
          if (!bigEnough(proj)) agg
          else rewrite(proj, pxA, rev, targets, agg)
        case None => agg
      }
  }

  private def rewrite(proj: Project, pxA: Alias, rev: Boolean,
      targets: Seq[Target], orig: Aggregate): LogicalPlan = {
    val px = pxA.toAttribute
    val flt = Filter(IsNotNull(px), proj)

    // 1-row count side (order-independent aggregate, broadcast)
    val cntA = Alias(AggregateExpression(Count(Seq(Literal(1))), Complete,
      isDistinct = false), "graft_pct_n")()
    val cnt = Aggregate(Nil, Seq(cntA), flt)
    val pn = cntA.toAttribute

    // naive global row_number — GlobalRankRewrite re-plans it (same
    // fixed-point batch; both rules share the broadcast-threshold gate)
    val dir = if (rev) Descending else Ascending
    val ord = Seq(SortOrder(px, dir))
    val rnA = Alias(WindowExpression(RowNumber(),
      WindowSpecDefinition(Nil, ord,
        SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
      "graft_pct_rn")()
    val win = Window(Seq(rnA), Nil, ord, flt)
    // row_number is IntegerType; positions are Long — cast once (no
    // analyzer below the optimizer to insert it implicitly)
    val rn = Cast(rnA.toAttribute, LongType)

    val j = Join(win, cnt, CrossType, None,
      JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))

    // pos = p·(n−1) exactly as PercentileBase: maxPosition.toDouble · p
    def pos(p: Double): Expression =
      Multiply(Cast(Subtract(pn, Literal(1L)), DoubleType), Literal(p))
    def lowerRn(p: Double): Expression =
      Add(Floor(pos(p)), Literal(1L))
    def higherRn(p: Double): Expression =
      Add(Ceil(pos(p)), Literal(1L))

    val allPs = targets.flatMap(_.ps).distinct
    val keepCond = allPs.flatMap[Expression] { p =>
      Seq(EqualTo(rn, lowerRn(p)), EqualTo(rn, higherRn(p)))
    }.reduce(Or)
    val keep = Filter(keepCond, j)

    // ≤ 2·|ps| surviving rows → 1-row final aggregate. Boundary values
    // via Max over a positional mask (exactly one row matches each rn).
    // Aggregate result expressions cannot reference sibling aliases, so
    // the AggregateExpression trees are embedded directly — ONE instance
    // each, shared across result expressions, which PhysicalAggregation
    // maps to a single buffer slot (shared resultId).
    def maxIf(cond: Expression): AggregateExpression =
      AggregateExpression(Max(If(cond, px, Literal(null, px.dataType))),
        Complete, isDistinct = false)
    val nAt = AggregateExpression(Max(pn), Complete, isDistinct = false)

    val perP: Map[Double, (Expression, Expression)] = allPs.map { p =>
      p -> (maxIf(EqualTo(rn, lowerRn(p))): Expression,
        maxIf(EqualTo(rn, higherRn(p))): Expression)
    }.toMap

    // post-aggregate interpolation, PercentileBase.getPercentile verbatim
    def interp(p: Double): Expression = {
      val (lo, hi) = perP(p)
      val posA = Multiply(Cast(Subtract(nAt, Literal(1L)), DoubleType),
        Literal(p))
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

    val results: Seq[NamedExpression] = targets.map { t =>
      val body = if (t.scalar) interp(t.p)
      else {
        val at = ArrayType(DoubleType, containsNull = false)
        If(IsNull(nAt), Literal(null, at),
          CreateArray(t.ps.map(interp)))
      }
      Alias(body, t.origin.name)(exprId = t.origin.exprId)
    }
    Aggregate(Nil, results, keep)
  }
}
