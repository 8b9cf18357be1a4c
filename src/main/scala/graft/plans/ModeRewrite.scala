package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.{Inner => InnerType}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Plans naive deterministic `mode()` aggregates distributed.
  *
  * Spark's `mode` is a `TypedAggregateWithHashMapAsBuffer`: every
  * (value → count) pair of a group funnels into ONE OpenHashMap whose
  * final merge runs on a single task per group. At global grain over a
  * high-NDV column (user ids, shingle hashes, URLs) the map holds every
  * distinct value — the same one-reducer OOM cliff
  * [[PercentileRewrite]] closes for percentiles, and it exists at ANY
  * grouping: a 100 TB `GROUP BY lang` mode still builds each language's
  * full value map on one task.
  *
  * Unlike percentile, mode needs no rank: it is a pure two-level
  * aggregation —
  *
  *   1. count rows per (group keys, value): hash-shuffles on the
  *      compound key with map-side partial combine, any NDV, any group
  *      count;
  *   2. per group, take the value with the maximal (count, value) pair:
  *      `max_by(v, struct(cnt, v))` — again a plain hash aggregate with
  *      partial combine (MaxMinBy is declarative), shuffled on the
  *      group keys alone.
  *
  * Null values never win (the argmax ordering is nulled for them, and
  * Max/MinBy skip null orderings) but their level-1 row keeps an
  * all-null group alive, so value-free groups surface with the native
  * null row — no outer-join assembly needed. The struct ordering is
  * collision-free by construction: the value itself is the tiebreak
  * field, and level 1 emits each (group, value) once.
  *
  * Fires ONLY on the DETERMINISTIC form — `mode() WITHIN GROUP
  * (ORDER BY v [ASC|DESC])`, where `reverseOpt` is defined and native
  * eval breaks count ties by the extreme value: ASC ties pick the
  * SMALLEST tied value (the first in the given order), mirrored with
  * `min_by(v, struct(−c, v))`; DESC picks the largest, mirrored with
  * `max_by(v, struct(c, v))` (pinned empirically by ModeRewriteSpec's
  * tie test). Plain `mode(x)` resolves ties by hash-map iteration
  * order — ANY tied value is within its contract, so a rewrite would be
  * semantically legal but not reproducible, and it stands down
  * (exactness doctrine: only bit-stable rewrites ship).
  *
  * Also stands down on: float/double values (the native OpenHashMap
  * distinguishes −0.0 from 0.0 while GROUP BY normalizes them — the
  * rewrite would merge the two counts), non-atomic values (map/struct
  * grouping semantics), DISTINCT/FILTER clauses, streaming children
  * (two chained aggregates violate streaming output-mode rules), mixed
  * aggregate lists, and below-threshold inputs (the native map is
  * cheaper when it fits).
  */
object ModeRewrite extends Rule[LogicalPlan] {

  private case class ModeTgt(origin: Alias, rev: Boolean)

  private sealed trait OutUnit
  private case class GroupOut(origin: NamedExpression, idx: Int)
    extends OutUnit
  private case class ModeOut(t: ModeTgt) extends OutUnit
  /** A non-mode aggregate slot riding along (count next to the mode) —
    * re-emitted verbatim in a side Aggregate and joined back at group
    * grain; [[PercentileRewrite.exactOther]]'s merge-order-insensitive
    * whitelist keeps each slot bit-equal to its naive one-pass value. */
  private case class OtherOut(origin: NamedExpression) extends OutUnit

  /** Value types the rewrite's GROUP BY agrees with OpenHashMap equality
    * on (floats excluded — the ±0.0 divergence above; BinaryType
    * excluded — native mode()'s OpenHashMap keys Array[Byte] by
    * REFERENCE, so duplicate binary values never merge their counts
    * natively while GROUP BY merges by content: the two plans pick
    * different winners). */
  private def supportedValue(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _: DecimalType => true
    // UTF8-binary strings only: GROUP BY, the argmax ordering, and the
    // native map's equality must agree (GlobalRankRewrite doctrine)
    case s: StringType => s == StringType
    case BooleanType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** The deterministic-mode shape [[apply]] rewrites — exposed so
    * [[GlobalRankRewrite]]'s full-frame arm can pre-screen
    * window-spelled modes before converting them to the Aggregate this
    * rule then re-plans (rule composition). */
  private[plans] def eligible(ae: AggregateExpression): Boolean = ae match {
    case AggregateExpression(Mode(col, _, _, Some(_)), Complete, false,
        None, _) =>
      supportedValue(col.dataType) && col.deterministic && !col.foldable
    case _ => false
  }

  /** The mode's value column (for same-column homogeneity checks). */
  private[plans] def valueOf(ae: AggregateExpression): Option[Expression] =
    ae.aggregateFunction match {
      case Mode(col, _, _, _) => Some(col)
      case _ => None
    }

  private def analyze(groups: Seq[Expression], aggs: Seq[NamedExpression])
      : Option[(Expression, Seq[OutUnit])] = {
    if (aggs.isEmpty) return None
    def groupIdx(ne: NamedExpression): Option[Int] = {
      val c = ne match { case Alias(ch, _) => ch; case x => x }
      val i = groups.indexWhere(_.semanticEquals(c))
      if (i >= 0) Some(i) else None
    }
    var col0: Option[Expression] = None
    val units = aggs.map {
      case a @ Alias(AggregateExpression(
          Mode(col, _, _, Some(rev)), Complete, false, None, _), _)
          if supportedValue(col.dataType) && col.deterministic &&
            !col.foldable =>
        col0 match {
          case None => col0 = Some(col); Some(ModeOut(ModeTgt(a, rev)))
          case Some(c0) if c0.canonicalized == col.canonicalized =>
            Some(ModeOut(ModeTgt(a, rev)))
          case _ => None
        }
      // an ELIGIBLE percentile next to the mode defers to the side
      // Aggregate, which PercentileRewrite re-plans in the same
      // fixed-point batch (when its own grouping/threshold gates
      // admit it; otherwise the slot stays native there — exactly the
      // naive cost, never worse)
      case a @ Alias(ae: AggregateExpression, _)
          if PercentileRewrite.eligible(ae).isDefined =>
        Some(OtherOut(a))
      case ne =>
        groupIdx(ne).map(GroupOut(ne, _))
          .orElse(if (PercentileRewrite.exactOther(ne)) Some(OtherOut(ne))
            else None)
    }
    if (units.exists(_.isEmpty) || col0.isEmpty) None
    else col0.map(c => (c, units.flatten))
  }

  private def bigEnough(p: LogicalPlan): Boolean = {
    val t = conf.autoBroadcastJoinThreshold
    t < 0 || p.stats.sizeInBytes > t
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groups, aggExprs, child, _)
        if !child.isStreaming && child.deterministic &&
          groups.forall(_.deterministic) &&
          !child.output.exists(_.name == "graft_mode_v") =>
      analyze(groups, aggExprs) match {
        case Some((col, units)) => rewrite(col, units, groups, child, agg)
        case None => agg
      }
  }

  private def rewrite(col: Expression, units: Seq[OutUnit],
      groups: Seq[Expression], child: LogicalPlan,
      orig: Aggregate): LogicalPlan = {
    val gAs = groups.zipWithIndex.map { case (g, i) =>
      Alias(g, s"graft_mode_g$i")()
    }
    val gAttrs = gAs.map(_.toAttribute)
    val vA = Alias(col, "graft_mode_v")()
    val proj = Project(gAs :+ vA, child)
    if (!bigEnough(proj)) return orig
    val v = vA.toAttribute

    // level 1: rows per (group, value) — the only corpus-grain shuffle
    val cntA = Alias(AggregateExpression(Count(Seq(Literal(1))), Complete,
      isDistinct = false), "graft_mode_n")()
    val lvl1 = Aggregate((gAttrs: Seq[Expression]) :+ v,
      ((gAttrs: Seq[NamedExpression]) :+ v) :+ cntA, proj)
    val c = cntA.toAttribute

    // level 2: per-group argmax over (count, value); null values carry a
    // null ordering so they can never win but keep their group alive
    def modeAgg(rev: Boolean): AggregateExpression = {
      // ASC parses to reverseOpt=Some(true) and ties pick the SMALLEST
      // tied value → min_by over (−count, v); DESC (Some(false)) picks
      // the largest → max_by over (count, v). Pinned against the native
      // eval by ModeRewriteSpec's tie test.
      val pair =
        if (rev) CreateStruct(Seq(UnaryMinus(c), v))
        else CreateStruct(Seq(c, v))
      val ord = If(IsNotNull(v), pair, Literal(null, pair.dataType))
      val fn = if (rev) MinBy(v, ord) else MaxBy(v, ord)
      AggregateExpression(fn, Complete, isDistinct = false)
    }
    // one shared instance per reverse flag (PhysicalAggregation maps
    // shared instances to one buffer slot)
    val byRev: Map[Boolean, AggregateExpression] =
      units.collect { case ModeOut(t) => t.rev }.distinct
        .map(r => r -> modeAgg(r)).toMap

    val out: Seq[NamedExpression] = units.collect {
      case GroupOut(origin, i) =>
        Alias(gAttrs(i), origin.name)(exprId = origin.exprId)
      case ModeOut(t) =>
        Alias(byRev(t.rev), t.origin.name)(exprId = t.origin.exprId)
    }
    val others = units.collect { case OtherOut(ne) => ne }
    if (others.isEmpty) Aggregate(gAttrs, out, lvl1)
    else {
      // ride-along slots (count/min/max/… next to the mode — profile
      // queries): re-emitted verbatim in a side Aggregate over the
      // same child and joined back on null-safe group keys. Unlike
      // PercentileRewrite's ≤maxGroups broadcast, the grouping here is
      // arbitrary — both sides shuffle BY GROUP, the partitioning the
      // two-level mode plan already uses, so the join co-partitions.
      val jgAs = gAttrs.zipWithIndex.map { case (g, i) =>
        Alias(g, s"graft_mode_jg$i")()
      }
      val lvl2 = Aggregate(gAttrs,
        (out: Seq[NamedExpression]) ++ jgAs, lvl1)
      val ogAs = groups.zipWithIndex.map { case (g, i) =>
        Alias(g, s"graft_mode_og$i")()
      }
      val oAgg = Aggregate(groups,
        (ogAs: Seq[NamedExpression]) ++ others, child)
      val cond = jgAs.zip(ogAs).map[Expression] { case (l, r) =>
        EqualNullSafe(l.toAttribute, r.toAttribute)
      }.reduceOption(And)
      val joined = Join(lvl2, oAgg, InnerType, cond, JoinHint.NONE)
      val byId = joined.output.map(a => a.exprId -> a).toMap
      val res: Seq[NamedExpression] = units.map {
        case GroupOut(origin, _) => byId(origin.exprId)
        case ModeOut(t) => byId(t.origin.exprId)
        case OtherOut(ne) => byId(ne.exprId)
      }
      Project(res, joined)
    }
  }
}
