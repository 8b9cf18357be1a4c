package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Average, BoolAnd, BoolOr, CollectSet, Complete, Count, First, HyperLogLogPlusPlus, Last, Max, MaxBy, Min, MinBy, Mode, Percentile, PercentileDisc, Sum}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: plan a user-written GLOBAL rank window —
  * `row_number()/ntile(k) OVER (ORDER BY … )` with NO PARTITION BY —
  * as a distributed-rank shape instead of the single-partition
  * `WindowExec` Spark would otherwise execute. Round 8 extends the same
  * machinery to PARTITIONED windows whose partition keys have a
  * PROVABLY bounded domain (booleans, `pmod/%` by a small literal,
  * bounded CASE/IF ladders — see [[boundedDomain]]): by pigeonhole such
  * a window's parallelism is capped at ≤ [[maxGroups]] tasks at any
  * data size on any cluster, so the rewrite needs no skew estimate —
  * the ceiling is a theorem. The boundary table becomes one row per
  * group (still broadcastable), every window/aggregate/join gains the
  * group key (null-safe — a null partition value is a group like any
  * other) next to the slice id, and offsets prefix-combine per group.
  * Attribute-valued partitions (`lang`, `country`) stay stood down:
  * nothing in the plan proves their cardinality (catalog column stats
  * could admit them later). This is
  * [[graft.functions.DistRank]] promoted from a library call to an
  * engine capability (the same promotion [[HammingJoinBlocking]] makes
  * for hamming joins): the user writes the natural window, the engine
  * owns the scale plan.
  *
  * Rewrite — every data-dependent quantity is an ORDER-INDEPENDENT
  * aggregate, never a sampled partitioner, so the rank branch and the
  * offsets branch are guaranteed the identical slice assignment even
  * though each executes its own copy of the subtree. (The first design
  * used `repartitionByRange` + `spark_partition_id`; RangePartitioner
  * seeds its boundary SAMPLING on the runtime rdd id, so two physical
  * executions of canonically-equal exchanges can pick different
  * boundaries whenever ReuseExchange doesn't collapse them —
  * correctness must not hang off an optimization, hence the
  * deterministic slicing here. The library `DistRank` keeps the
  * frequency-balanced range shuffle because its persist() pins one
  * execution.)
  *
  *   1. a 1-row [[boundaryRow]] aggregate derives P−1 frequency-adaptive
  *      split points of the FIRST order key from a deterministic
  *      hash-mod sample (bounded buffer — see boundaryRow's doc); the
  *      SAME boundary subtree broadcasts into both branches, so even if
  *      exchange reuse fails to collapse the two physical broadcasts,
  *      both executions compute an identical function of the data set;
  *   2. slice = number of split points strictly before the key in sort
  *      order: equal keys share a slice and the count is non-decreasing
  *      along the sort direction, so slices are contiguous runs of the
  *      total order — ties never straddle; nulls slot at ±1 slice per
  *      the null ordering, NaN floats pin to the sort-greatest edge;
  *   3. rank branch: the original rank runs PARTITIONED by slice
  *      (Spark's ordinary hash exchange — every window group is one
  *      slice's rows);
  *   4. offsets branch: a second projection over the shared child + the
  *      shared boundary row aggregates to (slice, count); prefix-sum/
  *      total windows over the ≤P-row count table are the bounded-grain
  *      exception; broadcast join back on slice; global rn = local +
  *      prefix, ntile(k) reconstructed exactly from (rn, total). Output
  *      aliases keep the original exprIds and types, so parents are
  *      untouched.
  *
  * Eligibility: every window expression is `row_number()`, `ntile(k)`,
  * `rank()`, `dense_rank()`, `percent_rank()`, or `cume_dist()` — the
  * complete SQL rank-function family — or a CUMULATIVE aggregate
  * (sum/count/min/max/avg over an UnboundedPreceding..CurrentRow ROWS
  * or RANGE frame, non-distinct, unfiltered; sum/avg restricted to
  * exact types — integral/decimal — because a double running sum
  * differs from the naive row-by-row fold by ulps). Cumulative aggs
  * decompose as per-slice running value ⊕ exclusive prefix-combine of
  * per-slice totals (Sum/Count prefix-sums, Min/Max prefix-min/max —
  * Least/Greatest null-skipping IS the running-min/max semantics);
  * Average splits into Sum and Count and divides once, bit-equal to
  * Spark's own sum/count division. Round 8 adds global LEAD/LAG with
  * literal offsets whose input is a function of the ORDER BY keys (the
  * tie-safety condition — see [[orderFunc]]): each offset family plans
  * as a left-outer equi self-join of the ranked output on the global
  * row number, with the out-of-range default restored from the
  * unmatched side. Round 8 also adds MOVING-frame sum/count
  * (`ROWS n PRECEDING..CurrentRow`, n a positive int literal) over the
  * same tie-safe inputs, via the prefix identity
  * `moving(i) = cum(i) − cum(i−n−1)`: the cumulative machinery computes
  * cum, the lead/lag self-join fetches cum at global position i−n−1,
  * and SQL null semantics are restored exactly by a paired cumulative
  * COUNT (the frame's non-null count is the same difference — zero
  * means the naive fold returns null). Sum inputs are integral-only:
  * the identity is exact for Long arithmetic (associative mod 2⁶⁴, so
  * even wrap-around matches the naive fold) but a decimal cum can
  * overflow to null where the bounded frame would not, and a double cum
  * differs by ulps. Moving MIN/MAX (no subtraction inverse), moving
  * AVERAGE, and non-integral moving SUMs take the GHOST-BLOCK path
  * instead ([[GhostUnit]]): exactly-B-row blocks of the global row
  * number with the block tails unioned forward as ghost context, the
  * original frame re-run per block — frame contents AND fold order
  * match the naive window row-for-row, so even double folds are
  * bit-equal. (Since round 7: ties
  * are slice-safe because equal ORDER BY tuples share the first key and
  * therefore a slice, so global rank = per-slice rank + whole-slice row
  * offsets, dense rank adds per-slice DISTINCT-tuple offsets — distinct
  * tuples cannot straddle slices either — and percent_rank is
  * (rank−1)/(total−1)); the first ORDER BY key is numeric, a
  * date, a timestamp (sliced as epoch days/micros), or a UTF8-binary
  * string (split points stay native strings — LessThan, sort_array and
  * the window ORDER BY agree on byte order; non-default collations
  * stand down); child and order are deterministic; and the child's
  * estimated size exceeds `spark.sql.autoBroadcastJoinThreshold` (a
  * window input that would fit in a broadcast executes fine in one
  * task; −1 forces the rewrite, which is how the spec drives it at
  * fixture scale).
  *
  * Balance caveat: split points are value-quantiles of a DISTINCT
  * sample whose inclusion probability grows with a key's row count
  * (see [[boundaryRow]]) — approximately frequency-adaptive, exactly so
  * when per-key multiplicities are comparable. A single mega-hot key
  * still concentrates its rows in one slice (ties cannot split by
  * construction); that slice holds a subset of what the single-partition
  * plan it replaces held, and AQE's skew handling applies to the hash
  * exchange.
  */
object GlobalRankRewrite extends Rule[LogicalPlan] {

  private val pidName = "graft_rank_pid"

  /** Exact-arithmetic input types for cumulative Sum/Average: integral
    * sums are order-independent (wrap identically), decimal sums are
    * exact — double/float sums would differ from the naive plan's
    * row-by-row accumulation by ulps, so they stand down. */
  private def integralType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def exactSumType(dt: DataType): Boolean =
    integralType(dt) || dt.isInstanceOf[DecimalType]

  /** A cumulative-aggregate window: UnboundedPreceding..CurrentRow
    * frame (ROWS or RANGE — the default agg-with-ORDER-BY frame is
    * RANGE), non-distinct, unfiltered, and decomposable as per-slice
    * running value ⊕ whole-prior-slice totals. */
  private def cumulativeAgg(ne: NamedExpression): Boolean = ne match {
    case Alias(WindowExpression(ae: AggregateExpression,
        WindowSpecDefinition(_, _,
          SpecifiedWindowFrame(_, UnboundedPreceding, CurrentRow))), _)
        if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case Sum(e, _) => exactSumType(e.dataType)
        case Average(e, _) => integralType(e.dataType)
        case _: Count => true
        case Min(_) | Max(_) => true
        case _ => false
      }
    case _ => false
  }

  /** `e` is a deterministic function of the ORDER BY key expressions
    * (and literals) alone. This is the tie-safety condition for global
    * lead/lag (round 8): the rewrite joins two executions of the rank
    * machinery on the global row number, and tied rows may receive
    * different row numbers in each execution — but the value at sorted
    * position k is the k-th ORDER BY tuple regardless of which tied row
    * holds it, so an input that depends only on that tuple is exact. An
    * input carrying non-key columns (e.g. `lag(payload) OVER (ORDER BY
    * ts)` with duplicate ts) could stitch inconsistent tie resolutions,
    * so it stands down. */
  private def orderFunc(e: Expression, keys: Seq[Expression]): Boolean =
    e.deterministic && (e.foldable ||
      keys.exists(_.semanticEquals(e)) ||
      (e.children.nonEmpty && e.children.forall(orderFunc(_, keys))))

  /** One-level alias expansion through the window's immediate child
    * Project — the analyzer extracts non-trivial window inputs as `_w0`
    * aliases there, which would otherwise hide a key-derived input from
    * [[orderFunc]]. Both the input and the order keys expand through
    * the SAME level, so the comparison stays apples-to-apples even
    * when project collapsing has rewritten the keys too. An Aggregate
    * child expands the same way through its output aliases (an output
    * attribute IS its aliased expression evaluated on the group tuple)
    * — [[PercentileRewrite]]'s weighted-grouped pipeline parks the
    * bounded group keys there. */
  private[plans] def expandOnce(e: Expression, child: LogicalPlan): Expression =
    child match {
      case Project(pl, _) =>
        val m = AttributeMap(
          pl.collect { case a: Alias => a.toAttribute -> a.child })
        e.transformUp { case a: Attribute if m.contains(a) => m(a) }
      case ag: Aggregate =>
        val m = AttributeMap(ag.aggregateExpressions.collect {
          case a @ Alias(ch, _) if !ch.exists(
            _.isInstanceOf[AggregateExpression]) => a.toAttribute -> ch
        })
        val e2 = e.transformUp {
          case a: Attribute if m.contains(a) => m(a)
        }
        // continue through the aggregate's input side: Filters are
        // value-transparent and the defining Project may sit below one
        // (grouping keys routinely surface as `_groupingexpression`
        // attributes the optimizer substitutes back into the aggregate)
        def belowFilters(p: LogicalPlan): LogicalPlan = p match {
          case f: Filter => belowFilters(f.child)
          case other => other
        }
        expandOnce(e2, belowFilters(ag.child))
      // a Window passes its child's columns through untouched — an
      // attribute surviving it carries the child's per-row value, so
      // expansion may look below (window-produced attributes have
      // fresh exprIds and never match a map built from lower aliases).
      // This is what lets the half-open arm's STACKED piece windows
      // re-prove bounded partition domains defined in the `_w#` Project
      // the analyzer parked below the ORIGINAL window.
      case wd: Window => expandOnce(e, wd.child)
      case _ => e
    }

  /** One global lead/lag: read the ORDER-key-derived `input` at global
    * row number `grn + delta` (lag n → −n, lead n → +n), `default` when
    * that position is out of range. */
  private case class OffsetUnit(exprId: ExprId, name: String,
      qualifier: Seq[String], input: Expression, delta: Int,
      default: Expression, dt: DataType)

  private def offsetUnit(ne: NamedExpression, parts: Seq[Expression],
      order: Seq[SortOrder], child: LogicalPlan): Option[OffsetUnit] = {
    // partition keys join the tie-safety key set: within a window
    // partition every part expression is constant, so a part-derived
    // input is constant across any tie resolution there
    lazy val keys = order.map(o => expandOnce(o.child, child)) ++
      parts.map(expandOnce(_, child))
    def ok(input: Expression, default: Expression): Boolean =
      default.foldable && orderFunc(expandOnce(input, child), keys)
    ne match {
      case a @ Alias(WindowExpression(fn, _), _) => fn match {
        case Lead(input, Literal(n: Int, IntegerType), default, false)
            if ok(input, default) =>
          Some(OffsetUnit(a.exprId, a.name, a.qualifier, input, n,
            default, a.dataType))
        case Lag(input, Literal(n: Int, IntegerType), default, false)
            if ok(input, default) =>
          Some(OffsetUnit(a.exprId, a.name, a.qualifier, input, -n,
            default, a.dataType))
        case _ => None
      }
      case _ => None
    }
  }

  /** "n PRECEDING" as a row count — the DataFrame API writes it as a
    * negative literal (`rowsBetween(-n, 0)`), the SQL parser as
    * `UnaryMinus(n)` (which constant folding may or may not have
    * collapsed by the time this rule sees the plan). */
  private def precedingRows(lo: Expression): Option[Int] = lo match {
    case Literal(v: Int, IntegerType) if v < 0 => Some(-v)
    case UnaryMinus(Literal(v: Int, IntegerType), _) if v > 0 => Some(v)
    case _ => None
  }

  /** One moving-frame aggregate: `sum(input)`/`count(…)` OVER (ORDER BY …
    * ROWS n PRECEDING..CurrentRow). `sumInput` is empty for a bare
    * count; `cntFn` is the paired cumulative count that restores null
    * semantics (for Sum it counts the SAME input, so frame-non-null =
    * cnt(i) − cnt(i−n−1) decides the null branch exactly). Inputs must
    * be functions of the ORDER BY tuple ([[orderFunc]] — with a ROWS
    * frame over ties, anything else is tie-order-dependent even in the
    * naive plan) and Sum inputs integral (see the object doc). */
  private case class MovUnit(exprId: ExprId, name: String,
      qualifier: Seq[String], dt: DataType, sumInput: Option[Expression],
      cntFn: Count, n: Int)

  private def movUnit(ne: NamedExpression, parts: Seq[Expression],
      order: Seq[SortOrder], child: LogicalPlan): Option[MovUnit] = {
    lazy val keys = order.map(o => expandOnce(o.child, child)) ++
      parts.map(expandOnce(_, child))
    def okIn(e: Expression): Boolean = orderFunc(expandOnce(e, child), keys)
    ne match {
      case a @ Alias(WindowExpression(ae: AggregateExpression,
          WindowSpecDefinition(_, _,
            SpecifiedWindowFrame(RowFrame, lo, CurrentRow))), _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        precedingRows(lo).flatMap { n =>
          ae.aggregateFunction match {
            case Sum(e, _) if integralType(e.dataType) && okIn(e) =>
              Some(MovUnit(a.exprId, a.name, a.qualifier, a.dataType,
                Some(e), Count(Seq(e)), n))
            case c: Count if c.children.forall(okIn) =>
              Some(MovUnit(a.exprId, a.name, a.qualifier, a.dataType,
                None, c, n))
            case _ => None
          }
        }
      case _ => None
    }
  }

  /** One ABSOLUTE-position window value: first_value / nth_value /
    * last_value over an UnboundedPreceding frame read the input at a
    * FIXED sorted position (1, k, or the partition end) — a ≤ maxGroups-
    * row broadcast fetch, not a window at all:
    *
    *   - `first_value(e)` (UP..CR or UP..UF): the frame always contains
    *     position 1, so every row reads the value at sorted position 1.
    *   - `nth_value(e, k)` ROWS UP..CR: position k once the frame holds
    *     k rows → `If(grn ≥ k, value@k, null)`; RANGE UP..CR: the frame
    *     extends through the CURRENT TIE RUN, so the gate is the
    *     range-frame row count (the cume_dist numerator) ≥ k; UP..UF:
    *     `If(tot ≥ k, value@k, null)`.
    *   - `last_value(e)` UP..CR: the frame ends at the current row
    *     (ROWS) or its tie run (RANGE) — with the key-function input
    *     guard both equal the CURRENT row's input, a plain projection;
    *     UP..UF: the value at position `tot`.
    *
    * IGNORE NULLS variants read DATA-DEPENDENT positions — but the
    * input guard makes them broadcast-fetchable anyway: inputs are
    * functions of the ORDER BY tuple, so every tie run is value-
    * constant and hence WHOLLY null or wholly non-null, which pins the
    * k-th non-null row's sorted position independent of tie
    * permutation. The fetch side locates it (min_by/max_by over the
    * non-null rows for the ends; `non-null cumulative count == k` for
    * interior k) and the per-row frame gate is `non-null count in
    * frame ≥ k` — a cumulative Count the rank machinery already
    * distributes (ROWS or RANGE grain matching the frame). Only
    * `last_value(e) IGNORE NULLS` over UP..CR (last-observation-
    * carried-forward: a genuinely per-row position) stands down.
    *
    * `gate` (ign = false): 0 = none (first_value), 1 = grn ≥ k,
    * 2 = range-count ≥ k, 3 = tot ≥ k. `gate` (ign = true): 0 = none
    * (UP..UF — the fetch matches iff the value exists), 1 = ROWS
    * non-null prefix count ≥ k, 2 = RANGE non-null prefix count ≥ k.
    * `pos`: Some(k) for a literal position, None = the partition end
    * (tot, or the last non-null for ign). `current` short-circuits
    * last_value UP..CR (RESPECT NULLS only). */
  private case class AbsUnit(exprId: ExprId, name: String,
      qualifier: Seq[String], dt: DataType, input: Expression,
      pos: Option[Int], gate: Int, current: Boolean, ign: Boolean)

  private def absUnit(ne: NamedExpression, parts: Seq[Expression],
      order: Seq[SortOrder], child: LogicalPlan): Option[AbsUnit] = {
    lazy val keys = order.map(o => expandOnce(o.child, child)) ++
      parts.map(expandOnce(_, child))
    def okIn(e: Expression): Boolean = orderFunc(expandOnce(e, child), keys)
    def mk(a: Alias, e: Expression, pos: Option[Int], gate: Int,
        current: Boolean = false, ign: Boolean = false): Option[AbsUnit] =
      if (okIn(e)) Some(AbsUnit(a.exprId, a.name, a.qualifier, a.dataType,
        e, pos, gate, current, ign))
      else None
    ne match {
      case a @ Alias(WindowExpression(we, WindowSpecDefinition(_, _,
          SpecifiedWindowFrame(ft, UnboundedPreceding, hi))), _)
          if hi == CurrentRow || hi == UnboundedFollowing =>
        val toEnd = hi == UnboundedFollowing
        def ignGate: Int = if (toEnd) 0 else ft match {
          case RowFrame => 1
          case RangeFrame => 2
        }
        we match {
          case AggregateExpression(First(e, false), _, false, None, _) =>
            mk(a, e, Some(1), 0)
          case AggregateExpression(Last(e, false), _, false, None, _) =>
            if (toEnd) mk(a, e, None, 0) else mk(a, e, None, 0,
              current = true)
          case NthValue(e, Literal(k: Int, IntegerType), false) if k >= 1 =>
            val gate = if (toEnd) 3 else ft match {
              case RowFrame => 1
              case RangeFrame => 2
            }
            mk(a, e, Some(k), gate)
          // IGNORE NULLS: positions are over the NON-NULL subsequence
          case AggregateExpression(First(e, true), _, false, None, _) =>
            mk(a, e, Some(1), ignGate, ign = true)
          case NthValue(e, Literal(k: Int, IntegerType), true) if k >= 1 =>
            mk(a, e, Some(k), ignGate, ign = true)
          // last non-null of the whole partition; UP..CR is LOCF — a
          // per-row data-dependent position, no broadcast shape exists
          case AggregateExpression(Last(e, true), _, false, None, _)
              if toEnd =>
            mk(a, e, None, 0, ign = true)
          case _ => None
        }
      case _ => None
    }
  }

  /** One order-fold-exact ROWS-bounded-frame aggregate that the prefix
    * path cannot express: moving Min/Max (no subtraction inverse),
    * non-integral Sum (prefix difference drifts by ulps / can overflow
    * where the frame would not), Average (its naive fold is the frame's
    * own sequential sum), and ANY frame with a FOLLOWING bound (no
    * prefix identity reaches forward). Computed by GLOBAL RE-BLOCKING
    * (the ghost stage in [[rewrite]]): rows land in exactly-B-row
    * blocks of the global row number with B ≥ max(backward, forward)
    * reach, each block's last `back` rows UNION forward into the next
    * block and its first `fwd` rows backward into the previous one as
    * ghost context, and the ORIGINAL frame runs per block ordered by
    * the global row number — every real row's frame holds exactly the
    * global frame's rows in global order, so even a double sum folds
    * bit-identically to the naive single-partition window. Inputs must
    * be functions of the ORDER BY tuple ([[orderFunc]]) — the standing
    * tie doctrine: frame membership among tied rows is
    * permutation-dependent, but equal tuples then carry equal inputs,
    * so every permutation folds the same. */
  private case class GhostUnit(origin: Alias, ae: AggregateExpression,
      frame: SpecifiedWindowFrame, back: Int, fwd: Int)

  /** A ROWS-frame boundary as a signed row offset: negative = preceding,
    * positive = following, 0 = current row. */
  private def rowBound(e: Expression): Option[Int] = e match {
    case CurrentRow => Some(0)
    case Literal(v: Int, IntegerType) => Some(v)
    case UnaryMinus(Literal(v: Int, IntegerType), _) => Some(-v)
    case _ => None
  }

  private def ghostUnit(ne: NamedExpression, parts: Seq[Expression],
      order: Seq[SortOrder], child: LogicalPlan): Option[GhostUnit] = {
    // the prefix-difference path (movUnit) claims integral-sum/count
    // frames ending at CURRENT ROW — cheaper (no union, no second
    // corpus shuffle); everything else row-bounded lands here,
    // including FOLLOWING bounds no prefix identity can reach
    if (movUnit(ne, parts, order, child).isDefined) return None
    lazy val keys = order.map(o => expandOnce(o.child, child)) ++
      parts.map(expandOnce(_, child))
    def okIn(e: Expression): Boolean = orderFunc(expandOnce(e, child), keys)
    ne match {
      case a @ Alias(WindowExpression(ae: AggregateExpression,
          WindowSpecDefinition(_, _,
            f @ SpecifiedWindowFrame(RowFrame, lo, hi))), _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        for {
          l <- rowBound(lo)
          h <- rowBound(hi)
          if l <= h && (l != 0 || h != 0)
          back = math.max(0, -l)
          fwd = math.max(0, h)
          ok = ae.aggregateFunction match {
            case Min(e) => okIn(e)
            case Max(e) => okIn(e)
            case Sum(e, _) => okIn(e)
            case Average(e, _) => okIn(e)
            case c: Count => c.children.forall(okIn)
            case _ => false
          }
          if ok
        } yield GhostUnit(a, ae, f, back, fwd)
      case _ => None
    }
  }

  /** One VALUE-BAND frame aggregate: `agg(x) OVER (ORDER BY k RANGE
    * BETWEEN … PRECEDING AND … FOLLOWING)` with FINITE literal value
    * offsets. Unlike ROWS frames, a RANGE frame's membership is decided
    * by the KEY VALUE alone — the frame is a permutation-independent
    * bag — so bag-determined aggregates (min/max/count/exact-type
    * sum/integral avg) need no [[orderFunc]] input guard: any tie
    * resolution folds the same. Double sums stand down (arbitrary fold
    * order — exactness doctrine, same as the full-frame arm). */
  private case class RangeUnit(origin: Alias, lo: Long, hi: Long)

  /** A RANGE-frame boundary as a signed value offset (the DataFrame API
    * writes `rangeBetween(-n, 0)` as a negative literal, the SQL parser
    * as `UnaryMinus(n)`; CurrentRow is offset 0). For TIMESTAMP keys
    * the boundary is an ANSI day-time INTERVAL literal whose underlying
    * value is already MICROS — the same unit [[UnixMicros]] maps the
    * key into — so one Long offset space serves both; `wantInterval`
    * pins the boundary kind to the key kind (a month-bearing interval
    * is not a fixed micros offset and never matches). */
  private def rangeBound(e: Expression,
      wantInterval: Boolean): Option[Long] = e match {
    case CurrentRow => Some(0L)
    case Literal(v: Long, _: DayTimeIntervalType) if wantInterval =>
      Some(v)
    case Literal(v: Byte, _) if !wantInterval => Some(v.toLong)
    case Literal(v: Short, _) if !wantInterval => Some(v.toLong)
    case Literal(v: Int, _) if !wantInterval => Some(v.toLong)
    case Literal(v: Long, _) if !wantInterval => Some(v)
    case UnaryMinus(inner, _) => rangeBound(inner, wantInterval).map(-_)
    case _ => None
  }

  private def rangeUnit(ne: NamedExpression,
      keyDt: DataType): Option[RangeUnit] = ne match {
    case a @ Alias(WindowExpression(ae: AggregateExpression,
        WindowSpecDefinition(_, _,
          SpecifiedWindowFrame(RangeFrame, loE, hiE))), _)
        if !ae.isDistinct && ae.filter.isEmpty =>
      val iv = keyDt == TimestampType
      for {
        lo <- rangeBound(loE, iv)
        hi <- rangeBound(hiE, iv)
        if lo <= hi
        ok = ae.aggregateFunction match {
          case Sum(e, _) => exactSumType(e.dataType)
          case Average(e, _) => integralType(e.dataType)
          case _: Count => true
          case Min(_) | Max(_) => true
          case _ => false
        }
        if ok
      } yield RangeUnit(a, lo, hi)
    case _ => None
  }

  /** One HALF-OPEN value frame: `agg(x) OVER (ORDER BY k RANGE BETWEEN
    * UNBOUNDED PRECEDING AND hi FOLLOWING)` (hi ≥ 1) or `… BETWEEN lo
    * PRECEDING AND UNBOUNDED FOLLOWING` (lo ≤ −1). Decomposes as two
    * value-determined pieces the rule's other arms already plan:
    * prefix `[UP, k+hi] = [UP, k] ∪ [k+1, k+hi]` (cumulative ⊕ finite
    * band), suffix `[k+lo, ∞) = [k+lo, k−1] ∪ [k, ∞)` (finite band ⊕
    * DESC cumulative). `sumIdx`/`cntIdx` index the per-piece units a
    * target combines (Average recombines from Sum+Count — integral
    * sums stay exact in doubles below 2⁵³, so the final division is
    * the naive one bit-for-bit). */
  private case class HovUnit(origin: Alias, fn: AggregateFunction,
      off: Long, prefix: Boolean)

  private def hovUnit(ne: NamedExpression,
      keyDt: DataType): Option[HovUnit] = ne match {
    case a @ Alias(WindowExpression(ae: AggregateExpression,
        WindowSpecDefinition(_, _,
          SpecifiedWindowFrame(RangeFrame, loE, hiE))), _)
        if !ae.isDistinct && ae.filter.isEmpty =>
      val iv = keyDt == TimestampType
      val shape = (loE, hiE) match {
        case (UnboundedPreceding, h) =>
          rangeBound(h, iv).collect { case hi if hi >= 1 => (hi, true) }
        case (l, UnboundedFollowing) =>
          rangeBound(l, iv).collect { case lo if lo <= -1 => (lo, false) }
        case _ => None
      }
      shape.flatMap { case (off, prefix) =>
        ae.aggregateFunction match {
          case Sum(e, _) if integralType(e.dataType) =>
            Some(HovUnit(a, ae.aggregateFunction, off, prefix))
          case Average(e, _) if integralType(e.dataType) =>
            Some(HovUnit(a, ae.aggregateFunction, off, prefix))
          case _: Count =>
            Some(HovUnit(a, ae.aggregateFunction, off, prefix))
          case Min(_) | Max(_) =>
            Some(HovUnit(a, ae.aggregateFunction, off, prefix))
          case _ => None
        }
      }
    case _ => None
  }

  /** One LOCF/NOCB unit: `last_value(e) IGNORE NULLS OVER (ORDER BY k
    * [ROWS|RANGE] UP..CR)` — last-observation-carried-forward (ASC) or
    * next-observation-carried-backward (DESC, the time-series backfill
    * spelling), the one IGNORE NULLS shape the broadcast-fetch arm
    * cannot serve (its position is per-row). It decomposes on the
    * CUMULATIVE machinery instead, with a coalesce combine (combineOp
    * 4): the per-slice piece is the windowed running
    * `Last(e, ignoreNulls)` (same frame), the slice total is the
    * slice's last non-null BY ORDER — `max_by(e, key)` for ASC keys /
    * `min_by` for DESC over the non-null-input rows, with a
    * `First(e, ignoreNulls)` fallback for the null-key slice where
    * max_by's ordering is null everywhere (inputs there are f(null),
    * all equal, so First is value-deterministic) — and the global
    * value is `coalesce(local, Last(prior slice totals, ignoreNulls))`.
    * Any direction / null-ordering combo works (round 8, second
    * session): [[sliceOf]] places the null-key run per the declared
    * null ordering, the min/max_by slice total follows the direction,
    * and the null-run fallback is position-independent. Demands: input
    * a function of the FULL key tuple ([[orderFunc]] — ties and the
    * null slice need value constancy per tuple), and the input not
    * foldable (constant-input LOCF folds natively). ROWS and RANGE
    * spellings coincide under the input guard: a mid-tie-run ROWS cut
    * still sees the run's (constant) value.
    *
    * MULTI-KEY orders (round 11 — the `last_value(x, true) OVER
    * (ORDER BY ts, id)` forward-fill-with-tiebreak spelling): the
    * slice total's "last non-null BY ORDER" becomes max_by/min_by over
    * the STRUCT of all keys, sound iff a single ascending struct
    * comparison reproduces the window's order — [[locfMultiKeyOk]]. */
  private def locfUnit(ne: NamedExpression, order: Seq[SortOrder],
      child: LogicalPlan): Option[(Alias, Expression,
        SpecifiedWindowFrame)] = ne match {
    case a @ Alias(WindowExpression(
        AggregateExpression(Last(e, true), _, false, None, _),
        WindowSpecDefinition(_, _,
          f @ SpecifiedWindowFrame(_, UnboundedPreceding, CurrentRow))),
        _)
        if (order.size == 1 || locfMultiKeyOk(order)) && !e.foldable =>
      val keys = order.map(o => expandOnce(o.child, child))
      if (orderFunc(expandOnce(e, child), keys)) Some((a, e, f)) else None
    case _ => None
  }

  /** Multi-key admission for the LOCF arm: the slice total must be
    * reconstructible as one max_by (head ASC) / min_by (head DESC)
    * over a struct whose ASCENDING field comparison reproduces the
    * window's order. Per key that means:
    *   - keys sharing the head's direction ride as themselves;
    *   - keys FLIPPED against the head normalize by NEGATION
    *     ([[negKey]] — round 11, second session), admitted only for
    *     types where a total strictly-monotone negation exists:
    *     integrals/decimals (widened first, so ANSI minus cannot
    *     overflow on the type minimum) and dates/timestamps (via
    *     their epoch numerics). Flipped FLOATS stand down — NaN sorts
    *     greatest in every window direction but negates to itself, so
    *     no negation can reproduce a descending float order — as do
    *     flipped strings (nothing to negate);
    *   - every TRAILING key is non-nullable or declares nulls at the
    *     position a struct's nulls-smallest field comparison implies:
    *     head ASC → NULLS FIRST, head DESC → NULLS LAST, REGARDLESS
    *     of the trailing key's own direction (for same-direction keys
    *     this is exactly their default ordering; for flipped keys it
    *     is the non-default spelling).
    * The HEAD key's null ordering stays free: [[sliceOf]] gives its
    * null run a dedicated slice, so null heads never meet non-null
    * heads inside one max_by — within the null-head slice the head
    * field ties and the comparison falls through to the trailing
    * keys. */
  private def locfMultiKeyOk(order: Seq[SortOrder]): Boolean = {
    val head = order.head
    val wantNulls = if (head.direction == Ascending) NullsFirst else NullsLast
    def flippable(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _: DecimalType | DateType | TimestampType => true
      case _ => false
    }
    order.tail.forall { o =>
      (o.direction == head.direction || flippable(o.child.dataType)) &&
        (!o.child.nullable || o.nullOrdering == wantNulls)
    } && RowOrdering.isOrderable(StructType(order.map(o =>
      StructField("k",
        if (o.direction == head.direction) o.child.dataType
        else negKey(o.child).dataType))))
  }

  /** Strictly monotone decreasing total map for a FLIPPED key —
    * negation over a WIDENED type so the original type's minimum
    * cannot overflow the ANSI minus (Long.MinValue negates into
    * decimal(20,0); ints into long; dates/timestamps through their
    * epoch numerics). Only called for [[locfMultiKeyOk]]-admitted
    * types. */
  private def negKey(e: Expression): Expression = e.dataType match {
    case ByteType | ShortType | IntegerType =>
      UnaryMinus(Cast(e, LongType))
    case LongType => UnaryMinus(Cast(e, DecimalType(20, 0)))
    // decimal ranges are symmetric (±(10^p −1)∕10^s): negation never
    // overflows its own type — no widening cast (which would truncate
    // the scale and break strict monotonicity)
    case _: DecimalType => UnaryMinus(e)
    case DateType => UnaryMinus(Cast(UnixDate(e), LongType))
    case TimestampType =>
      UnaryMinus(Cast(UnixMicros(e), DecimalType(20, 0)))
    case _ => UnaryMinus(e) // unreachable under locfMultiKeyOk
  }

  private def supported(ne: NamedExpression, parts: Seq[Expression],
      order: Seq[SortOrder], child: LogicalPlan): Boolean = ne match {
    case _ if cumulativeAgg(ne) => true
    case _ if locfUnit(ne, order, child).isDefined => true
    case _ if offsetUnit(ne, parts, order, child).isDefined => true
    case _ if movUnit(ne, parts, order, child).isDefined => true
    case _ if ghostUnit(ne, parts, order, child).isDefined => true
    case _ if absUnit(ne, parts, order, child).isDefined => true
    case Alias(WindowExpression(fn, _), _) => fn match {
      case RowNumber() => true
      case NTile(Literal(k: Int, IntegerType)) => k > 0
      // ties are safe: equal ORDER BY tuples have equal first keys, so
      // they share a slice by construction — rank/dense_rank offsets
      // are exact sums over whole preceding slices
      case _: Rank => true
      case _: DenseRank => true
      case _: PercentRank => true
      // cume_dist = (rows in the range frame ≤ current) / total: the
      // numerator decomposes as per-slice range-frame count + whole-
      // slice row offset (ties share a slice), one exact division
      case _: CumeDist => true
      case _ => false
    }
    case _ => false
  }

  private def supportedKey(order: Seq[SortOrder]): Boolean =
    order.head.child.dataType match {
      case _: NumericType | DateType | TimestampType => true
      // UTF8-binary strings only: LessThan, sort_array, and the window's
      // ORDER BY all agree on plain byte ordering there; a non-default
      // collation would need all three proven consistent, so it stands
      // down.
      // (collation accessors are private[sql]; the default singleton IS
      // the UTF8_BINARY collation, so identity is the public check)
      case s: StringType => s == StringType
      case _ => false
    }

  /** The first key as a numeric for bucket arithmetic — dates as epoch
    * days, timestamps as epoch micros (both strictly monotone). */
  private def asNumeric(e: Expression): Expression = e.dataType match {
    case DateType => UnixDate(e)
    case TimestampType => UnixMicros(e)
    case _ => e
  }

  /** The comparison form of the first key: strings stay NATIVE (split
    * points, LessThan, and sort_array share UTF8-binary ordering);
    * everything else goes through [[asNumeric]] and a double cast. */
  private def keyExpr(first: SortOrder): Expression =
    first.child.dataType match {
      case _: StringType => first.child
      case _ => Cast(asNumeric(first.child), DoubleType)
    }

  /** The split-point type matching [[keyExpr]]. */
  private def keyType(first: SortOrder): DataType =
    first.child.dataType match {
      case s: StringType => s
      case _ => DoubleType
    }

  private def bigEnough(child: LogicalPlan): Boolean = {
    val t = conf.autoBroadcastJoinThreshold
    t < 0 || child.stats.sizeInBytes > t
  }

  private[plans] val maxGroups = 64L

  /** A PROVABLE upper bound on an expression's value domain, for the
    * pigeonhole gate on partitioned windows: only shapes whose bound is
    * a static theorem qualify — literals, booleans, `pmod/%` by a small
    * literal, all-literal CASE/IF ladders — never a guess about data
    * (an attribute like `lang` may well be low-cardinality, but nothing
    * in the plan proves it; with catalog column stats that case could
    * be admitted later). Casts and aliases can merge values, not split
    * them, so they preserve any child bound. */
  private[plans] def boundedDomain(e: Expression): Option[Long] = e match {
    case _ if !e.deterministic => None
    case _ if e.foldable => Some(1L)
    case _ if e.dataType == BooleanType => Some(3L) // true/false/null
    case a: Alias => boundedDomain(a.child)
    case c: Cast => boundedDomain(c.child)
    case p: Pmod => p.right match {
      case Literal(k: Int, IntegerType) if k > 0 && k <= 1000000 =>
        Some(k + 1L) // [0, k) plus null
      case Literal(k: Long, LongType) if k > 0 && k <= 1000000 =>
        Some(k + 1L)
      case _ => None
    }
    case r: Remainder => r.right match {
      case Literal(k: Int, IntegerType) if k > 0 && k <= 1000000 =>
        Some(2L * k) // (−k, k) plus null
      case Literal(k: Long, LongType) if k > 0 && k <= 1000000 =>
        Some(2L * k)
      case _ => None
    }
    case CaseWhen(branches, elseValue) =>
      // the output domain is the union of the branch-value domains
      // (plus null when a branch can miss) — branch values recurse, so
      // ladders over bounded arms qualify, not only literal ladders
      val doms = (branches.map(_._2) ++ elseValue.toSeq).map(boundedDomain)
      if (doms.forall(_.isDefined)) Some(doms.flatten.sum + 1L) else None
    case If(_, t, f) =>
      for (a <- boundedDomain(t); b <- boundedDomain(f)) yield a + b + 1L
    case _ => None
  }

  /** Column-stats admission (round 11): an ATTRIBUTE partition key the
    * structural prover cannot bound is admitted when catalog column
    * statistics (`ANALYZE TABLE … FOR COLUMNS`, surfaced through the
    * CBO stats visitor — `spark.sql.cbo.enabled`) bound its distinct
    * count. Unlike [[boundedDomain]]'s theorems this is an ESTIMATE,
    * but the rewrite's CORRECTNESS never depends on the bound — groups
    * form by VALUE, the bound only backs the ≤-[[maxGroups]]
    * broadcast-size claim — and an HLL-grade ndv error at this
    * magnitude (≤ 64) is harmless: even a 10× miss broadcasts hundreds
    * of offset rows, not millions. STALENESS is the real exposure —
    * stats ANALYZE'd before a large append can under-report without
    * bound, and there is no runtime re-check before the broadcast;
    * that is standard CBO hygiene (re-ANALYZE after bulk loads), the
    * same contract every stats-costed join reorder already assumes.
    * This is the "catalog column stats
    * could admit them later" completion the round-8 scaladoc promised:
    * `PARTITION BY country` over an analyzed catalog table rewrites;
    * the same column without stats (or with CBO off) stands down
    * exactly as before. */
  private[plans] def statsBound(e: Expression,
      child: LogicalPlan): Option[Long] =
    e match {
      case a: Attribute if conf.cboEnabled =>
        child.stats.attributeStats.get(a).flatMap { cs =>
          cs.distinctCount.map(_.toLong +
            (if (cs.nullCount.exists(_ > 0)) 1L else 0L))
        }
      case _ => None
    }

  /** Pigeonhole gate: every partition expression's domain is provably
    * bounded and the product of bounds is ≤ [[maxGroups]] — so the
    * naive plan's parallelism is CAPPED at that many tasks at any data
    * size and on any cluster (each group is one WindowExec partition),
    * which is the one case where rewriting a partitioned window needs
    * no skew estimate: the ceiling is a theorem. Expressions expand one
    * level through the child Project first (the analyzer extracts
    * non-trivial partition keys as `_w0` aliases). Attribute keys the
    * structural prover cannot bound fall back to [[statsBound]]
    * (checked on BOTH the raw and the expanded spelling — stats key on
    * the exprId that survives the projection). */
  private def boundedParts(parts: Seq[Expression],
      child: LogicalPlan): Boolean = {
    val doms = parts.map { p =>
      val ex = expandOnce(p, child)
      boundedDomain(ex)
        .orElse(statsBound(ex, child))
        .orElse(statsBound(p, child))
    }
    doms.forall(_.isDefined) &&
      doms.flatten.foldLeft(1L)((a, b) =>
        if (a > maxGroups) a else a * b) <= maxGroups
  }

  // The child subtree is SHARED verbatim by the rank branch, the offsets
  // branch, and both min/max aggregates (trees are immutable — reusing
  // the node is safe). No leaf re-instancing: every join boundary this
  // rule creates exposes ONLY freshly-aliased columns on the right side,
  // so child output attributes never collide across a join, and each
  // branch binds its expressions against its own subtree. (Re-instancing
  // via MultiInstanceRelation.newInstance breaks on chained copies of
  // InMemoryRelation — its stats remap expects the original output ids.)

  /** One FULL-FRAME aggregate over an order-less partitioned window
    * (`agg(x) OVER (PARTITION BY …)` — every row reads its partition's
    * whole-frame aggregate). The naive plan is one WindowExec task per
    * partition value; over a PROVABLY bounded domain that is the
    * pigeonhole cliff again, and the aggregate needs no window at all:
    * a partial-combining hash Aggregate (corpus-parallel at any size)
    * broadcast-joined back onto the rows. Sum/Average restricted to
    * exact types — an order-less double window fold is arbitrary-order
    * in the NAIVE plan too, but re-planning may not change which
    * arbitrary answer a user sees (exactness doctrine).
    *
    * Window-spelled `mode()` and `percentile`/`median`/
    * `percentile_disc` ride the same conversion WHEN the respective
    * rule would rewrite the resulting Aggregate
    * ([[ModeRewrite.eligible]] / [[PercentileRewrite.eligible]]) —
    * both are deterministic functions of the partition bag, so the
    * join-back stamps the exact naive value while the inner rule
    * removes the per-group OpenHashMap in the same fixed-point batch
    * (rule composition). [[fullFrameComposable]] additionally requires
    * the NODE be homogeneous in the inner rule's shape (one value
    * column, one direction, one frequency) since those rules rewrite
    * whole aggregates, not slots. */
  private def fullFrameAgg(ne: NamedExpression): Option[AggregateExpression] =
    ne match {
      case Alias(WindowExpression(ae: AggregateExpression,
          WindowSpecDefinition(_, _, SpecifiedWindowFrame(_,
            UnboundedPreceding, UnboundedFollowing))), _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Sum(e, _) if exactSumType(e.dataType) => Some(ae)
          case Average(e, _) if integralType(e.dataType) => Some(ae)
          case _: Count => Some(ae)
          case Min(_) | Max(_) => Some(ae)
          // order-independent bag functions: boolean folds and the
          // deterministic HLL++ sketch (register max — same bag, same
          // estimate, any order)
          case _: BoolAnd | _: BoolOr => Some(ae)
          case _: HyperLogLogPlusPlus => Some(ae)
          case _: Mode if ModeRewrite.eligible(ae) => Some(ae)
          case _: Percentile | _: PercentileDisc
              if PercentileRewrite.eligible(ae).isDefined => Some(ae)
          case _ => None
        }
      case _ => None
    }

  /** Homogeneity for mode/percentile full-frame nodes: the inner rules
    * rewrite an Aggregate only when EVERY non-group slot is their own
    * kind over ONE shared (column, direction, frequency) — a mixed node
    * would convert into an Aggregate both rules stand down on, trading
    * one hash-map cliff for an identical one. Plain sum/count/min/max/
    * avg nodes are unconstrained. */
  private def fullFrameComposable(exprs: Seq[NamedExpression]): Boolean = {
    val aes = exprs.flatMap(fullFrameAgg)
    val modes = aes.filter(_.aggregateFunction.isInstanceOf[Mode])
    val pcts = aes.filter(a => a.aggregateFunction.isInstanceOf[Percentile]
      || a.aggregateFunction.isInstanceOf[PercentileDisc])
    val rest = aes.filterNot(a => modes.contains(a) || pcts.contains(a))
    // mixed nodes convert when the non-percentile/mode members pass the
    // ride-along whitelist — the converted Aggregate is exactly the
    // mixed list PercentileRewrite/ModeRewrite re-plan with a side
    // aggregate (round 8); mode NEXT TO percentile composes too (each
    // rule defers the other's eligible slots into its side Aggregate,
    // which the other re-plans in the same fixed-point batch).
    val restOk = rest.forall(PercentileRewrite.exactOtherAe)
    val modesOk = modes.isEmpty || (restOk && {
      val cols = modes.flatMap(ModeRewrite.valueOf).map(_.canonicalized)
      cols.distinct.size == 1
    })
    val pctsOk = pcts.isEmpty || (restOk && {
      // direction is NOT part of the slot: PercentileRewrite runs mixed
      // ASC+DESC ladders through one pipeline via mirrored positions
      val slots = pcts.flatMap(PercentileRewrite.eligible).map {
        case (c, _, f) => (c.canonicalized, f.map(_.canonicalized))
      }
      slots.size == pcts.size && slots.distinct.size == 1
    })
    modesOk && pctsOk
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case w @ Window(exprs, parts, order, child, _)
        if order.nonEmpty && exprs.nonEmpty &&
          (parts.isEmpty || boundedParts(parts, child)) &&
          exprs.forall(supported(_, parts, order, child)) &&
          supportedKey(order) && child.deterministic &&
          parts.forall(_.deterministic) && order.forall(_.deterministic) &&
          !child.output.exists(_.name == pidName) && bigEnough(child) =>
      rewrite(exprs, parts, order, child)
    case w @ Window(exprs, parts, Nil, child, _)
        if exprs.nonEmpty &&
          (parts.isEmpty || boundedParts(parts, child)) &&
          exprs.forall(fullFrameAgg(_).isDefined) &&
          fullFrameComposable(exprs) &&
          child.deterministic && parts.forall(_.deterministic) &&
          !child.output.exists(_.name == pidName) && bigEnough(child) =>
      rewriteFullFrame(exprs, parts, child)
    case w @ Window(exprs, parts, Seq(so), child, _)
        if exprs.nonEmpty && bandKey(so.child.dataType) &&
          (parts.isEmpty || boundedParts(parts, child)) &&
          exprs.forall(rangeUnit(_, so.child.dataType).isDefined) &&
          child.deterministic && parts.forall(_.deterministic) &&
          so.child.deterministic &&
          !child.output.exists(_.name.startsWith(vbName)) &&
          bigEnough(child) =>
      rewriteValueBand(exprs, parts, so, child)
    // Half-open demands ASC NULLS FIRST: rewriteHalfOpen rebuilds its
    // cumulative pieces with default-null-ordering SortOrders and a
    // null-key combine calibrated for the NULLS FIRST layout, and null
    // ordering does NOT mirror under frame decomposition (the same
    // reason the DESC spelling stands down). NULLS LAST stays naive.
    case w @ Window(exprs, parts,
        Seq(so @ SortOrder(_, Ascending, NullsFirst, _)), child, _)
        if exprs.nonEmpty && bandKey(so.child.dataType) &&
          (parts.isEmpty || boundedParts(parts, child)) &&
          exprs.forall(hovUnit(_, so.child.dataType).isDefined) &&
          child.deterministic && parts.forall(_.deterministic) &&
          so.child.deterministic &&
          !child.output.exists(_.name.startsWith(hovName)) &&
          bigEnough(child) =>
      rewriteHalfOpen(exprs, parts, so, child)
    // MIXED nodes — the analyzer groups window expressions by
    // (partition, order) only, so one node can carry finite-band,
    // half-open, AND case-1 (cumulative/rank/…) frames together, and
    // each dedicated arm requires a homogeneous node. Split into
    // stacked per-kind windows (window expressions are independent
    // per-row values; stacking is always legal) and let the arms
    // re-match each node in the same fixed-point batch.
    case w @ Window(exprs, parts, Seq(so @ SortOrder(_, Ascending, _, _)),
        child, _)
        if exprs.size >= 2 && bandKey(so.child.dataType) &&
          (parts.isEmpty || boundedParts(parts, child)) &&
          child.deterministic && parts.forall(_.deterministic) &&
          so.child.deterministic && supportedKey(Seq(so)) &&
          !child.output.exists(a => a.name == pidName ||
            a.name.startsWith(vbName) || a.name.startsWith(hovName)) &&
          bigEnough(child) && {
            val dt = so.child.dataType
            // hov classification mirrors the dedicated arm's
            // NULLS FIRST guard: a split-out NULLS LAST half-open
            // group would never re-match, so don't split for it.
            def kind(ne: NamedExpression): Int =
              if (rangeUnit(ne, dt).isDefined) 1
              else if (so.nullOrdering == NullsFirst &&
                hovUnit(ne, dt).isDefined) 2
              else if (supported(ne, parts, Seq(so), child)) 0
              else -1
            val ks = exprs.map(kind)
            ks.forall(_ >= 0) && ks.distinct.size >= 2
          } =>
      val dt = so.child.dataType
      def kind(ne: NamedExpression): Int =
        if (rangeUnit(ne, dt).isDefined) 1
        else if (so.nullOrdering == NullsFirst &&
          hovUnit(ne, dt).isDefined) 2
        else 0
      val groups = Seq(0, 1, 2).map(i => exprs.filter(kind(_) == i))
        .filter(_.nonEmpty)
      groups.foldLeft(child)((pl, g) => Window(g, parts, Seq(so), pl))
  }

  private val vbName = "graft_rank_vb"
  private val hovName = "graft_rank_ho"

  /** Key types the value-band/half-open arms bucket: integrals as
    * themselves, dates as epoch days, timestamps as epoch micros (the
    * unit ANSI day-time INTERVAL bounds already carry). */
  private def bandKey(dt: DataType): Boolean =
    integralType(dt) || dt == DateType || dt == TimestampType

  /** The band arms' numeric key form. */
  private def bandBase(key: Expression): Expression = key.dataType match {
    case DateType => Cast(UnixDate(key), LongType)
    case TimestampType => UnixMicros(key)
    case _ => Cast(key, LongType)
  }

  /** Half-open value frames by DECOMPOSITION into the rule's own other
    * arms: prefix `[UP, k+hi]` = cumulative `[UP, k]` ⊕ finite band
    * `[k+1, k+hi]`; suffix `[k+lo, ∞)` = finite band `[k+lo, k−1]` ⊕
    * DESC cumulative `[k, ∞)` — every piece is value-determined, the
    * pieces partition the frame (integral key space, so `k+1` is the
    * next representable key; dates count in days), and the pieces are
    * emitted as NAIVE stacked windows that this rule's cumulative and
    * value-band arms re-plan in the same fixed-point batch. All
    * emitted windows order by the numeric key form (epoch days for
    * dates) so frame bounds are uniformly Long.
    *
    * Null keys take the cumulative piece ALONE: empirically a null-key
    * row's `[UP, k+hi]` frame is the null GROUP — exactly its ASC
    * cumulative frame — and its `[k+lo, ∞)` frame is ALL rows — exactly
    * its DESC (nulls-last) cumulative frame; adding the band piece
    * would double-count the null group (spec-pinned).
    *
    * Average recombines from Sum + Count pieces: the naive buffer sums
    * integral inputs in doubles, which is EXACT below 2⁵³ regardless of
    * order, so `cast(Σ) / cast(n)` is the naive division bit-for-bit
    * (the integral-input gate is what makes this a theorem). */
  private def rewriteHalfOpen(exprs: Seq[NamedExpression],
      parts: Seq[Expression], so: SortOrder,
      child: LogicalPlan): LogicalPlan = {
    val units = exprs.map(hovUnit(_, so.child.dataType).get)
    val base = bandBase(so.child)
    var n = 0
    def fresh(): String = { n += 1; s"$hovName$n" }
    val cumFr =
      SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, CurrentRow)
    val soA = SortOrder(base, Ascending)
    val soD = SortOrder(base, Descending)
    val specCumA = WindowSpecDefinition(parts, Seq(soA), cumFr)
    val specCumD = WindowSpecDefinition(parts, Seq(soD), cumFr)
    def specBand(lo: Long, hi: Long) = WindowSpecDefinition(parts,
      Seq(soA), SpecifiedWindowFrame(RangeFrame, Literal(lo), Literal(hi)))
    def we(fn: AggregateFunction, spec: WindowSpecDefinition): Alias =
      Alias(WindowExpression(AggregateExpression(fn, Complete,
        isDistinct = false), spec), fresh())()

    case class Pieces(cum: Seq[Alias], band: Seq[Alias], unit: HovUnit)
    val pieces = units.map { u =>
      val cumSpec = if (u.prefix) specCumA else specCumD
      val bSpec =
        if (u.prefix) specBand(1L, u.off) else specBand(u.off, -1L)
      u.fn match {
        case Average(e, _) =>
          Pieces(Seq(we(Sum(e), cumSpec), we(Count(Seq(e)), cumSpec)),
            Seq(we(Sum(e), bSpec), we(Count(Seq(e)), bSpec)), u)
        case f =>
          Pieces(Seq(we(f, cumSpec)), Seq(we(f, bSpec)), u)
      }
    }

    val bandExprs = pieces.flatMap(_.band)
    val cumAExprs = pieces.filter(_.unit.prefix).flatMap(_.cum)
    val cumDExprs = pieces.filterNot(_.unit.prefix).flatMap(_.cum)
    var plan: LogicalPlan = child
    if (bandExprs.nonEmpty)
      plan = Window(bandExprs, parts, Seq(soA), plan)
    if (cumAExprs.nonEmpty)
      plan = Window(cumAExprs, parts, Seq(soA), plan)
    if (cumDExprs.nonEmpty)
      plan = Window(cumDExprs, parts, Seq(soD), plan)

    val keyNull = IsNull(base)
    def comb(p: Pieces): Expression = {
      val cum = p.cum.map(_.toAttribute)
      val band = p.band.map(_.toAttribute)
      def mergedSum(cs: Expression, bs: Expression): Expression = {
        val zero = Literal(0L)
        If(And(IsNull(cs), IsNull(bs)), Literal(null, cs.dataType),
          Add(Coalesce(Seq(cs, zero)), Coalesce(Seq(bs, zero))))
      }
      p.unit.fn match {
        case _: Count => If(keyNull, cum.head, Add(cum.head, band.head))
        case Sum(_, _) =>
          If(keyNull, cum.head, mergedSum(cum.head, band.head))
        case Min(_) =>
          If(keyNull, cum.head, Least(Seq(cum.head, band.head)))
        case Max(_) =>
          If(keyNull, cum.head, Greatest(Seq(cum.head, band.head)))
        case Average(_, _) =>
          val s = If(keyNull, cum(0), mergedSum(cum(0), band(0)))
          val c = If(keyNull, cum(1), Add(cum(1), band(1)))
          If(EqualTo(c, Literal(0L)), Literal(null, DoubleType),
            Divide(Cast(s, DoubleType), Cast(c, DoubleType)))
        case other => throw new IllegalStateException(
          s"unreachable half-open combine: $other")
      }
    }
    val out = exprs.zip(pieces).map { case (ne, p) =>
      Alias(comb(p), ne.name)(exprId = ne.exprId, qualifier = ne.qualifier)
    }
    Project(child.output ++ out, plan)
  }

  /** Value-band (finite-offset RANGE) frames by VALUE BUCKETING: with
    * bucket width B = max over frames of (hi − lo), every key value a
    * real row's frame can reach lies within one bucket of the row's own
    * — so each row lands in its own bucket plus ghost copies in the ≤ 2
    * buckets whose real rows can need it (`floor((k−hi)/B)` and the
    * next: the needed-by key range `[k−hi, k−lo]` spans ≤ 2 buckets
    * because its width is ≤ B), and the ORIGINAL range frame re-runs
    * per (partition, bucket) ordered by the key. The frame's VALUE
    * predicate makes over-copying harmless — a ghost outside every real
    * row's band simply joins no frame — and `array_distinct` makes
    * double-copying impossible, so each per-bucket frame holds exactly
    * the global frame's bag. Null keys: arithmetic maps them to the
    * null bucket, all together, exactly the one group the naive plan
    * gives them (and no finite band admits a null key, so they ghost
    * nowhere). Skew honesty: bucket population is data-dependent, but
    * the naive plan is ONE task (or one per bounded partition) at any
    * skew — an all-equal-keys corpus degenerates back to it, never
    * below it. Replication is ≤ 3× (usually 2×) regardless of B, data,
    * or frame width.
    *
    * DESC keys ride the same math on the NEGATED key: Spark computes a
    * descending RANGE bound as `key − offset`, so the frame of row k is
    * `[k − hi, k − lo]` — exactly the ascending formula on m = −k — and
    * the per-bucket window re-runs the ORIGINAL descending spec, so
    * only the bucket assignment needs the mirror. (−Long.MinValue wraps;
    * a key at that single value would mis-bucket, the same wrap the
    * naive bound arithmetic hits first.) */
  private def rewriteValueBand(exprs: Seq[NamedExpression],
      parts: Seq[Expression], so: SortOrder,
      child: LogicalPlan): LogicalPlan = {
    val units = exprs.map(rangeUnit(_, so.child.dataType).get)
    val bWidth = Literal(math.max(1L, units.map(u => u.hi - u.lo).max))
    // dates bucket in epoch-day space (Spark adds RANGE bounds to
    // dates via date_add), timestamps in epoch-micros (ANSI day-time
    // interval bounds are micros already)
    val base = bandBase(so.child)
    val k = so.direction match {
      case Ascending => base
      case Descending => UnaryMinus(base)
    }
    def bucket(v: Expression): Expression =
      IntegralDivide(Subtract(v, Pmod(v, bWidth)), bWidth)
    val own = bucket(k)
    val ghostBkts = units.flatMap { u =>
      val bh = bucket(Subtract(k, Literal(u.hi)))
      Seq(bh, Add(bh, Literal(1L)))
    }
    val arr = Alias(ArrayDistinct(CreateArray(own +: ghostBkts)),
      vbName + "s")()
    val withArr = Project(child.output :+ arr, child)
    val bkt = AttributeReference(vbName, LongType)()
    val gen = Generate(Explode(arr.toAttribute), Nil, outer = false,
      None, Seq(bkt), withArr)
    val newParts = parts :+ (bkt: Expression)
    val newExprs = exprs.map {
      case a @ Alias(WindowExpression(f, WindowSpecDefinition(_, o, fr)),
          name) =>
        Alias(WindowExpression(f, WindowSpecDefinition(newParts, o, fr)),
          name)(exprId = a.exprId, qualifier = a.qualifier)
    }
    val win = Window(newExprs, newParts, Seq(so), gen)
    val real = Filter(EqualNullSafe(bkt, own), win)
    Project(child.output ++ newExprs.map(_.toAttribute), real)
  }

  /** Full-frame partitioned aggregates as hash-agg + broadcast join-back
    * (≤ [[maxGroups]] aggregate rows by the pigeonhole gate). With no
    * partition at all (`agg(x) OVER ()`) the aggregate side is a single
    * global row and the join-back is a broadcast cross join — the 1-row
    * degenerate of the same shape (an empty corpus yields an empty join
    * either way, matching the naive window's zero rows). */
  private def rewriteFullFrame(exprs: Seq[NamedExpression],
      parts: Seq[Expression], child: LogicalPlan): LogicalPlan = {
    val cgAs = parts.zipWithIndex.map { case (p, i) =>
      Alias(p, s"graft_rank_fg$i")()
    }
    val cgAttrs = cgAs.map(_.toAttribute)
    val aggAs = exprs.map { ne =>
      ne -> Alias(fullFrameAgg(ne).get, s"graft_rank_fa${ne.exprId.id}")()
    }
    val aggSide = Aggregate(parts,
      (cgAs: Seq[NamedExpression]) ++ aggAs.map(_._2), child)
    val cond = parts.zip(cgAttrs).map[Expression] { case (p, g) =>
      EqualNullSafe(p, g)
    }.reduceOption(And)
    val joinType = if (parts.isEmpty) Cross else Inner
    val joined = Join(child, aggSide, joinType, cond,
      JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))
    val out = exprs.zip(aggAs).map { case (ne, (_, fa)) =>
      Alias(fa.toAttribute, ne.name)(exprId = ne.exprId,
        qualifier = ne.qualifier)
    }
    Project(child.output ++ out, joined)
  }

  private val targetSamples = 65536L

  /** Types `Murmur3Hash` accepts without the legacy map-hash flag. */
  private def hashable(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case ArrayType(et, _) => hashable(et)
    case StructType(fields) => fields.forall(f => hashable(f.dataType))
    case _ => true
  }

  /** A 1-row plan carrying `nSlices − 1` frequency-adaptive split
    * points of the first order key, plus their attributes. Every step
    * is a DETERMINISTIC function of the data SET — no sampled
    * partitioner, no order dependence — so even were it executed twice,
    * both executions would be identical (the rewrite additionally
    * shares ONE boundary subtree across both branches):
    *
    *   1. count the rows (order-independent aggregate);
    *   2. keep rows whose murmur3(ALL hashable output columns) ≡ 0
    *      (mod rate), with rate = max(1, count/[[targetSamples]]), and
    *      `collect_set` the kept FIRST-KEY values. Hashing the whole
    *      row (not just the key) plus the set dedup bounds the buffer
    *      at ANY corpus size AND any key distribution: the set holds at
    *      most the distinct kept key values, expected ≤ distinct-rows/
    *      rate ≤ [[targetSamples]] — a constant key contributes ONE
    *      element where a key-only hash + list collected all n rows or
    *      none (the low-NDV OOM the first cut had);
    *   3. `sort_array` normalizes away collection order; resample
    *      nSlices−1 evenly-indexed elements as split points. Inclusion
    *      probability rises with a key's (distinct-row) multiplicity —
    *      ≈ min(1, rows(k)/rate) — so boundaries stay frequency-aware
    *      (the upgrade over the first equal-WIDTH cut whose hot slices
    *      the skew probe measured 1.9× slower), while a key hotter than
    *      `rate` saturates at one sample element — exactly right, since
    *      ties can never split across slices anyway.
    *
    * Empty sample → all-null split points → every row lands in slice 0
    * (one partition — degenerate but correct; below-threshold inputs
    * stand down before this anyway).
    */
  /** Broadcast join of `l` against the small boundary/count side: a
    * plain broadcast CROSS when there are no keys (the unpartitioned
    * case — one row) and a null-safe broadcast equi-join on the
    * partition keys otherwise (null partition values form a group like
    * any other, so `<=>`, never `=`). */
  private def bndJoin(l: LogicalPlan, r: LogicalPlan,
      cond: Option[Expression]): LogicalPlan =
    Join(l, r, if (cond.isEmpty) Cross else Inner, cond,
      JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))

  private def grpCond(parts: Seq[Expression],
      grps: Seq[Attribute]): Option[Expression] =
    parts.zip(grps).map[Expression] { case (p, g) => EqualNullSafe(p, g) }
      .reduceOption(And)

  /** [[boundaryRow]] generalized over the window's partition keys: the
    * counts and samples aggregate PER GROUP (≤ [[maxGroups]] rows by the
    * pigeonhole gate, so the result still broadcasts), and each child
    * row is stamped with ITS group's split points by the null-safe
    * broadcast join — the per-row slice semantics are unchanged. With no
    * partition keys the groupings are global and the plan degenerates to
    * the original 1-row boundary cross. Returns (plan, group attributes,
    * split-point attributes) — the group attributes are fresh aliases,
    * so they never collide with child output above a join. */
  private def boundaryRow(parts: Seq[Expression], first: SortOrder,
      child: LogicalPlan,
      nSlices: Int): (LogicalPlan, Seq[Attribute], Seq[Attribute]) = {
    val g1 = parts.zipWithIndex.map { case (p, i) =>
      Alias(p, s"graft_rank_cg$i")()
    }
    val gAttrs = g1.map(_.toAttribute)
    val cntA = Alias(AggregateExpression(Count(Seq(Literal(1))), Complete,
      isDistinct = false), "graft_rank_n")()
    val cntAgg = Aggregate(parts, g1 :+ cntA, child)
    val withCnt = bndJoin(child, cntAgg, grpCond(parts, gAttrs))
    val x = keyExpr(first)
    val kt = keyType(first)
    val rate = Greatest(Seq(Literal(1L),
      IntegralDivide(cntA.toAttribute, Literal(targetSamples))))
    val hashCols: Seq[Expression] = {
      val cols = child.output.filter(a => hashable(a.dataType))
      if (cols.isEmpty) Seq(first.child) else cols
    }
    val keep = EqualTo(Pmod(Cast(new Murmur3Hash(hashCols),
      LongType), rate), Literal(0L))
    val sampA = Alias(AggregateExpression(
      CollectSet(If(keep, x, Literal(null, kt))), Complete,
      isDistinct = false), "graft_rank_smp")()
    val sampAgg = Aggregate(gAttrs, gAttrs :+ sampA, withCnt)
    val arrA = Alias(new SortArray(sampA.toAttribute), "graft_rank_arr")()
    val arrProj = Project(gAttrs :+ arrA, sampAgg)
    val arr = arrA.toAttribute
    val m = Cast(Size(arr), LongType)
    val bndAliases = (1 until nSlices).map { j =>
      val idx = Cast(Greatest(Seq(Literal(1L),
        IntegralDivide(Multiply(Literal(j.toLong), m),
          Literal(nSlices.toLong)))), IntegerType)
      Alias(If(LessThanOrEqual(m, Literal(0L)),
        Literal(null, kt), ElementAt(arr, idx)),
        s"graft_rank_bnd$j")()
    }
    (Project(gAttrs ++ bndAliases, arrProj), gAttrs,
      bndAliases.map(_.toAttribute))
  }

  /** Monotone [0, nSlices) bucket of the first order key from the
    * [[boundaryRow]] split points: slice = number of split points
    * strictly before the key in sort order. Equal keys share a slice
    * and the count is non-decreasing along the sort direction, so
    * slices are contiguous runs of the total order — ties never
    * straddle; duplicate split values just leave slices empty. Nulls
    * slot at −1/nSlices per the null ordering; NaN floats (which sort
    * greatest) are pinned to the edge slice explicitly because every
    * NaN comparison is false.
    */
  private def sliceOf(first: SortOrder, bnds: Seq[Attribute],
      nSlices: Int): Expression = {
    val x = keyExpr(first)
    def before(b: Expression): Expression = first.direction match {
      case Ascending => LessThan(b, x)
      case Descending => GreaterThan(b, x)
    }
    val count = bnds.map[Expression](b =>
      If(And(IsNotNull(b), before(b)), Literal(1), Literal(0)))
      .reduce((a, b) => Add(a, b))
    val oriented = first.child.dataType match {
      case FloatType | DoubleType =>
        val nanSlice = first.direction match {
          case Ascending => Literal(nSlices - 1) // NaN sorts greatest
          case Descending => Literal(0)
        }
        If(IsNaN(x), nanSlice, count)
      case _ => count
    }
    val nullSlice = first.nullOrdering match {
      case NullsFirst => Literal(-1)
      case NullsLast => Literal(nSlices)
    }
    If(IsNull(first.child), nullSlice, oriented)
  }

  private def rewrite(exprs: Seq[NamedExpression], parts: Seq[Expression],
      order: Seq[SortOrder], child: LogicalPlan): LogicalPlan = {
    val nSlices = conf.numShufflePartitions
    val rowFrame =
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    val rangeFrame =
      SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, CurrentRow)

    val offUnits = exprs.flatMap(offsetUnit(_, parts, order, child))
    val offUnitIds = offUnits.map(_.exprId).toSet
    val movUnits = exprs.flatMap(movUnit(_, parts, order, child))
    val movIds = movUnits.map(_.exprId).toSet
    val ghostUnits = exprs.flatMap(ghostUnit(_, parts, order, child))
    val ghostIds = ghostUnits.map(_.origin.exprId).toSet
    val absUnits = exprs.flatMap(absUnit(_, parts, order, child))
    val absIds = absUnits.map(_.exprId).toSet
    val fns = exprs.collect { case Alias(WindowExpression(f, _), _) => f }
    val needRn = offUnits.nonEmpty || movUnits.nonEmpty ||
      ghostUnits.nonEmpty || absUnits.nonEmpty || fns.exists {
      case RowNumber() | NTile(_) => true
      case _ => false
    }
    val needRk = fns.exists {
      case _: Rank | _: PercentRank => true
      case _ => false
    }
    val needDr = fns.exists { case _: DenseRank => true; case _ => false }
    val needLe = absUnits.exists(u => !u.ign && u.gate == 2) ||
      fns.exists {
        case _: CumeDist => true
        case _ => false
      }

    // ONE boundary subtree, shared by both branches (trees are
    // immutable; its attributes never escape either branch's Project,
    // so the duplicate exprIds can't meet above a join). Sharing keeps
    // the child subtree at one instance per sampling aggregate instead
    // of two, and lets ReuseExchange collapse the two broadcasts. With
    // partition keys (the bounded-domain case) the boundary table is
    // one row PER GROUP and each row is stamped with its own group's
    // split points; every downstream step gains the group key next to
    // the slice id — same per-row semantics, per-group offsets.
    val (bnd, bndGrps, bndAttrs) =
      boundaryRow(parts, order.head, child, nSlices)

    // rank branch: slice stamp (split-point broadcast) → per-slice window
    val grpLAs = parts.zipWithIndex.map { case (p, i) =>
      Alias(p, s"graft_rank_gl$i")()
    }
    val grpL = grpLAs.map(_.toAttribute)
    val pidAliasL = Alias(sliceOf(order.head, bndAttrs, nSlices), pidName)()
    val rangedL = Project((child.output ++ grpLAs) :+ pidAliasL,
      bndJoin(child, bnd, grpCond(parts, bndGrps)))
    val pidL = pidAliasL.toAttribute
    val winPartL: Seq[Expression] = grpL :+ pidL
    val orderKeys = order.map(_.child)
    val localRn = Alias(WindowExpression(RowNumber(),
      WindowSpecDefinition(winPartL, order, rowFrame)),
      "graft_rank_local")()
    val localRk = Alias(WindowExpression(Rank(orderKeys),
      WindowSpecDefinition(winPartL, order, rangeFrame)),
      "graft_rank_lrk")()
    val localDr = Alias(WindowExpression(DenseRank(orderKeys),
      WindowSpecDefinition(winPartL, order, rangeFrame)),
      "graft_rank_ldr")()
    // rows in the slice's range frame ≤ current (cume_dist numerator)
    val localLe = Alias(WindowExpression(
      AggregateExpression(Count(Seq(Literal(1))), Complete,
        isDistinct = false),
      WindowSpecDefinition(winPartL, order, rangeFrame)),
      "graft_rank_lle")()
    // offsets branch pid (defined early — cumulative-agg prefixes below
    // need its sort order): same child + same boundary row → identical
    // slice. Row counts always; per-slice DISTINCT order-tuple counts
    // only when a dense_rank needs them (distinct tuples cannot
    // straddle slices — equal tuples share the first key — so prefix
    // sums of per-slice distinct counts ARE the global dense offsets).
    val grpRAs = parts.zipWithIndex.map { case (p, i) =>
      Alias(p, s"graft_rank_gr$i")()
    }
    val grpR = grpRAs.map(_.toAttribute)
    val pidAliasR = Alias(sliceOf(order.head, bndAttrs, nSlices),
      pidName + "_r")()
    val pidR = pidAliasR.toAttribute
    val pidOrder = Seq(SortOrder(pidR, Ascending))

    // --- cumulative-aggregate machinery (round 7): each supported agg
    // window decomposes as a PER-SLICE running aggregate (local, same
    // frame, partitioned by slice) ⊕ an EXCLUSIVE prefix-combine of
    // per-slice totals (Sum/Count prefix-sum, Min/Max prefix-min/max);
    // Average decomposes into its Sum and Count parts and divides once.
    // combineOp: 0 = null-aware add (Sum), 1 = plain add (Count),
    // 2 = Least (Min), 3 = Greatest (Max).
    final case class CumUnit(local: Alias, slice: Alias, prefix: Alias,
        combineOp: Int)
    def cumUnit(fn: AggregateFunction, op: Int,
        frame: SpecifiedWindowFrame, tag: String): CumUnit = {
      val local = Alias(WindowExpression(
        AggregateExpression(fn, Complete, isDistinct = false),
        WindowSpecDefinition(winPartL, order, frame)),
        s"graft_rank_lcm$tag")()
      val slice = Alias(AggregateExpression(fn, Complete,
        isDistinct = false), s"graft_rank_tcm$tag")()
      val pfn: AggregateFunction = op match {
        case 2 => Min(slice.toAttribute)
        case 3 => Max(slice.toAttribute)
        case _ => Sum(slice.toAttribute)
      }
      val prefix = Alias(WindowExpression(
        AggregateExpression(pfn, Complete, isDistinct = false),
        WindowSpecDefinition(grpR, pidOrder,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
            Literal(-1)))), s"graft_rank_pcm$tag")()
      CumUnit(local, slice, prefix, op)
    }
    // LOCF/NOCB (combineOp 4): running Last(e, ignoreNulls) per slice;
    // the slice total is the slice's last non-null BY ORDER (max_by
    // over non-null-input rows for ASC keys, min_by for DESC;
    // First(ignoreNulls) fallback for the null-key slice); prior-slice
    // carry = windowed Last(ignoreNulls) over the slice totals. See
    // [[locfUnit]] for the tie doctrine. Multi-key orders use the
    // struct of all keys as the max_by/min_by ordering (admission in
    // [[locfMultiKeyOk]]); the First fallback is then unreachable-but-
    // harmless — the struct is non-null whenever the input is, so
    // max_by returns null only when every input was null, where First
    // is null too.
    def locfCum(e: Expression, frame: SpecifiedWindowFrame,
        tag: String): CumUnit = {
      val local = Alias(WindowExpression(
        AggregateExpression(Last(e, ignoreNulls = true), Complete,
          isDistinct = false),
        WindowSpecDefinition(winPartL, order, frame)),
        s"graft_rank_lcm$tag")()
      val key: Expression =
        if (order.size == 1) order.head.child
        else CreateStruct(order.map(o =>
          if (o.direction == order.head.direction) o.child
          else negKey(o.child)))
      val keyOrNull = If(IsNotNull(e), key, Literal(null, key.dataType))
      val byOrder: AggregateFunction = order.head.direction match {
        case Ascending => MaxBy(e, keyOrNull)
        case Descending => MinBy(e, keyOrNull)
      }
      val slice = Alias(Coalesce(Seq(
        AggregateExpression(byOrder, Complete, isDistinct = false),
        AggregateExpression(First(e, ignoreNulls = true), Complete,
          isDistinct = false))), s"graft_rank_tcm$tag")()
      val prefix = Alias(WindowExpression(
        AggregateExpression(Last(slice.toAttribute, ignoreNulls = true),
          Complete, isDistinct = false),
        WindowSpecDefinition(grpR, pidOrder,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
            Literal(-1)))), s"graft_rank_pcm$tag")()
      CumUnit(local, slice, prefix, 4)
    }
    val cumSeq: Seq[(ExprId, Seq[CumUnit], Boolean)] =
      exprs.zipWithIndex.flatMap {
        case (a @ Alias(WindowExpression(ae: AggregateExpression,
            WindowSpecDefinition(_, _,
              f @ SpecifiedWindowFrame(_, UnboundedPreceding,
                CurrentRow))), _), i) if cumulativeAgg(a) =>
          ae.aggregateFunction match {
            case s: Sum => Some((a.exprId, Seq(cumUnit(s, 0, f, s"s$i")),
              false))
            case c: Count => Some((a.exprId,
              Seq(cumUnit(c, 1, f, s"c$i")), false))
            case m: Min => Some((a.exprId,
              Seq(cumUnit(m, 2, f, s"n$i")), false))
            case m: Max => Some((a.exprId,
              Seq(cumUnit(m, 3, f, s"x$i")), false))
            case Average(e, _) => Some((a.exprId,
              Seq(cumUnit(Sum(e), 0, f, s"as$i"),
                cumUnit(Count(Seq(e)), 1, f, s"ac$i")), true))
            case _ => None // unreachable under `supported`
          }
        case (a: Alias, i) if locfUnit(a, order, child).isDefined =>
          val (_, e, f) = locfUnit(a, order, child).get
          Some((a.exprId, Seq(locfCum(e, f, s"lf$i")), false))
        case _ => None
      }
    val cumMap = cumSeq.map(c => c._1 -> c).toMap
    val cumUnits = cumSeq.flatMap(_._2)

    // moving-frame machinery (round 8): moving agg = cum(i) − cum(i−n−1);
    // the cum pair (value + null-restoring count) rides the SAME
    // cumulative machinery as UnboundedPreceding windows (ROWS frame —
    // ties are safe because eligibility restricts inputs to functions of
    // the ORDER BY tuple), and cum(i−n−1) is fetched by the lead/lag
    // self-join at delta −(n+1).
    final case class MovCum(u: MovUnit, sum: Option[CumUnit], cnt: CumUnit)
    val movCums = movUnits.zipWithIndex.map { case (u, i) =>
      MovCum(u,
        u.sumInput.map(e => cumUnit(Sum(e), 0, rowFrame, s"ms$i")),
        cumUnit(u.cntFn, 1, rowFrame, s"mc$i"))
    }
    // IGNORE-NULLS fetch machinery: per distinct input, a cumulative
    // non-null Count rides the same per-slice ⊕ prefix decomposition —
    // ROWS grain for ROWS-frame gates and the interior-k position
    // filter, RANGE grain (counts through the current tie run, the gle
    // construction) for RANGE-frame gates.
    def dedupCanon(es: Seq[Expression]): Seq[Expression] = {
      val seen = scala.collection.mutable.Set.empty[Expression]
      es.filter(e => seen.add(e.canonicalized))
    }
    val ignRowsIn = dedupCanon(absUnits.filter(u => u.ign &&
      (u.gate == 1 || u.pos.exists(_ >= 2))).map(_.input))
    val ignRangeIn = dedupCanon(absUnits.filter(u => u.ign && u.gate == 2)
      .map(_.input))
    val ignCumSeq: Seq[((Expression, Boolean), CumUnit)] =
      ignRowsIn.zipWithIndex.map { case (in, i) =>
        ((in.canonicalized, false),
          cumUnit(Count(Seq(in)), 1, rowFrame, s"nnr$i"))
      } ++ ignRangeIn.zipWithIndex.map { case (in, i) =>
        ((in.canonicalized, true),
          cumUnit(Count(Seq(in)), 1, rangeFrame, s"nng$i"))
      }
    val ignCums: Map[(Expression, Boolean), CumUnit] = ignCumSeq.toMap
    val allCumUnits = cumUnits ++
      movCums.flatMap(m => m.sum.toSeq :+ m.cnt) ++ ignCumSeq.map(_._2)

    val locals = (if (needRn) Seq(localRn) else Nil) ++
      (if (needRk) Seq(localRk) else Nil) ++
      (if (needDr) Seq(localDr) else Nil) ++
      (if (needLe) Seq(localLe) else Nil) ++
      allCumUnits.map(_.local)
    val rankWin = Window(locals, winPartL, order, rangedL)

    val keyAliases = order.zipWithIndex.map { case (o, i) =>
      Alias(o.child, s"graft_rank_key$i")()
    }
    // slice-aggregate inputs reference child columns, so pass them
    // through when cumulative aggs exist (column pruning trims unused)
    val rangedR = Project(
      ((pidAliasR +: grpRAs) ++ (if (needDr) keyAliases else Nil)) ++
        (if (allCumUnits.nonEmpty) child.output else Nil),
      bndJoin(child, bnd, grpCond(parts, bndGrps)))
    val cntAlias = Alias(AggregateExpression(Count(Seq(Literal(1))),
      Complete, isDistinct = false), "graft_rank_cnt")()
    val dcntAlias = Alias(AggregateExpression(
      Count(Seq(CreateStruct(keyAliases.map(_.toAttribute)))),
      Complete, isDistinct = true), "graft_rank_dcnt")()
    val counts = Aggregate(grpR :+ pidR,
      ((grpR :+ pidR) ++ Seq(cntAlias) ++
        (if (needDr) Seq(dcntAlias) else Nil)) ++
        allCumUnits.map(_.slice),
      rangedR)
    val cnt = cntAlias.toAttribute
    def prefixSum(x: Attribute, name: String): Alias =
      Alias(WindowExpression(
        AggregateExpression(Sum(x), Complete, isDistinct = false),
        WindowSpecDefinition(grpR, pidOrder,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
            Literal(-1)))), name)()
    val offAlias = prefixSum(cnt, "graft_rank_off")
    val doffAlias = prefixSum(dcntAlias.toAttribute, "graft_rank_doff")
    val totAlias = Alias(WindowExpression(
      AggregateExpression(Sum(cnt), Complete, isDistinct = false),
      WindowSpecDefinition(grpR, pidOrder,
        SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
          UnboundedFollowing))), "graft_rank_tot")()
    val offWins = Seq(offAlias, totAlias) ++
      (if (needDr) Seq(doffAlias) else Nil) ++
      allCumUnits.map(_.prefix)
    val offWin = Window(offWins, grpR, pidOrder, counts)
    val offs = Project((grpR :+ pidR) ++ offWins.map(_.toAttribute), offWin)

    val joined = Join(rankWin, offs, Inner,
      Some((EqualTo(pidL, pidR) +:
        grpL.zip(grpR).map[Expression] { case (l, r) =>
          EqualNullSafe(l, r)
        }).reduce(And)),
      JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))

    // global ranks (long) and the original outputs, exprIds preserved
    def plusOff(local: Alias, off: Alias): Expression =
      Add(Cast(local.toAttribute, LongType),
        Coalesce(Seq(off.toAttribute, Literal(0L))))
    val grn = plusOff(localRn, offAlias)
    val grk = plusOff(localRk, offAlias)
    val gdr = plusOff(localDr, doffAlias)
    val gle = plusOff(localLe, offAlias)
    val tot = totAlias.toAttribute
    // global value of one cumulative-agg unit: running local ⊕ the
    // exclusive prefix of prior-slice totals
    def combineUnit(u: CumUnit): Expression = {
      val l = u.local.toAttribute
      val p = u.prefix.toAttribute
      u.combineOp match {
        case 0 => // Sum: null only when BOTH parts saw no non-null input
          If(And(IsNull(l), IsNull(p)), Literal(null, l.dataType),
            Add(Coalesce(Seq(l, Literal.default(l.dataType))),
              Cast(Coalesce(Seq(p, Literal.default(p.dataType))),
                l.dataType)))
        case 1 => Add(l, Coalesce(Seq(p, Literal(0L)))) // Count: no nulls
        case 2 => Least(Seq(l, p)) // Least/Greatest skip nulls — exactly
        case 3 => Greatest(Seq(l, p)) // the running-min/max semantics
        case 4 => Coalesce(Seq(l, p)) // LOCF: slice-local last non-null,
        // else the latest prior slice's carry
      }
    }
    val outExprs = exprs.filterNot {
      case a: Alias => offUnitIds.contains(a.exprId) ||
        movIds.contains(a.exprId) || ghostIds.contains(a.exprId) ||
        absIds.contains(a.exprId)
      case _ => false
    }.map {
      case a: Alias if cumMap.contains(a.exprId) =>
        val (_, units, isAvg) = cumMap(a.exprId)
        val value =
          if (isAvg)
            Divide(Cast(combineUnit(units(0)), DoubleType),
              Cast(combineUnit(units(1)), DoubleType))
          else combineUnit(units.head)
        Alias(Cast(value, a.dataType), a.name)(exprId = a.exprId,
          qualifier = a.qualifier)
      case a @ Alias(WindowExpression(RowNumber(), _), name) =>
        Alias(Cast(grn, IntegerType), name)(exprId = a.exprId,
          qualifier = a.qualifier)
      case a @ Alias(WindowExpression(NTile(Literal(k: Int, IntegerType)),
          _), name) =>
        Alias(Cast(ntileFromRn(grn, tot, k), IntegerType), name)(
          exprId = a.exprId, qualifier = a.qualifier)
      case a @ Alias(WindowExpression(_: Rank, _), name) =>
        Alias(Cast(grk, IntegerType), name)(exprId = a.exprId,
          qualifier = a.qualifier)
      case a @ Alias(WindowExpression(_: DenseRank, _), name) =>
        Alias(Cast(gdr, IntegerType), name)(exprId = a.exprId,
          qualifier = a.qualifier)
      case a @ Alias(WindowExpression(_: PercentRank, _), name) =>
        // Spark: (rank − 1) / (n − 1), 0.0 for the single-row relation
        val pr = CaseWhen(
          Seq((GreaterThan(tot, Literal(1L)),
            Divide(Cast(Subtract(grk, Literal(1L)), DoubleType),
              Cast(Subtract(tot, Literal(1L)), DoubleType)))),
          Some(Literal(0.0)))
        Alias(pr, name)(exprId = a.exprId, qualifier = a.qualifier)
      case a @ Alias(WindowExpression(_: CumeDist, _), name) =>
        // Spark: (rows in frame ≤ current) / n — both exact integers
        val cd = Divide(Cast(gle, DoubleType), Cast(tot, DoubleType))
        Alias(cd, name)(exprId = a.exprId, qualifier = a.qualifier)
      case other => other // unreachable under `supported`
    }
    if (offUnits.isEmpty && movUnits.isEmpty && ghostUnits.isEmpty &&
        absUnits.isEmpty)
      Project(child.output ++ outExprs, joined)
    else {
      // --- global lead/lag + moving frames (round 8): value at
      // grn + delta via an equi self-join on the global row number. The
      // right side is a SECOND instance of the rank machinery (shared
      // immutable nodes; exposed columns freshly aliased, so the join
      // resolves) — legal because every quantity in it is an
      // order-independent function of the data set, and tie-safe because
      // eligibility restricts inputs to functions of the ORDER BY tuple
      // (the value at sorted position k is unique even where tied ROWS
      // swap positions between the two executions). Lead/lag fetch the
      // raw input at delta; a moving unit fetches its CUMULATIVE pair at
      // delta −(n+1) and subtracts. ReuseExchange collapses the
      // duplicated shuffles when physical plans match.
      val grnAlias = Alias(grn, "graft_rank_grn")()
      // left-side combined cum values for moving units, aliased INSIDE
      // the base projection (the attributes they read — per-slice locals
      // and prefix windows — live at `joined` and are pruned above it)
      val movLeftAs: Seq[((ExprId, Int), Alias)] = movCums.flatMap { m =>
        m.sum.map(s => ((m.u.exprId, 0),
          Alias(combineUnit(s), s"graft_rank_cls${m.u.exprId.id}")()))
          .toSeq :+ ((m.u.exprId, 1),
            Alias(combineUnit(m.cnt), s"graft_rank_clc${m.u.exprId.id}")())
      }
      val movLeft = movLeftAs.toMap
      // --- ghost-stage pre-aliases (bounded-frame Min/Max/Avg/non-
      // integral Sum): rows re-block into EXACTLY-B-row blocks of the
      // global row number, B ≥ max frame reach — block membership is
      // pure position arithmetic, never value-dependent, so no empty or
      // undersized slice can sever a frame (grn-sliced, not key-sliced).
      val maxBack =
        if (ghostUnits.isEmpty) 0L else ghostUnits.map(_.back).max.toLong
      val maxFwd =
        if (ghostUnits.isEmpty) 0L else ghostUnits.map(_.fwd).max.toLong
      val bSize = Greatest(Seq(
        Literal(math.max(math.max(maxBack, maxFwd), 1L)),
        IntegralDivide(Subtract(Add(totAlias.toAttribute,
          Literal(nSlices.toLong)), Literal(1L)),
          Literal(nSlices.toLong))))
      val blkA = Alias(IntegralDivide(Subtract(grn, Literal(1L)), bSize),
        "graft_rank_blk")()
      // tail spill (forward ghosts): a block's last maxBack rows feed
      // the NEXT block's backward reach
      val spillA = Alias(GreaterThanOrEqual(
        Pmod(Subtract(grn, Literal(1L)), bSize),
        Subtract(bSize, Literal(maxBack))), "graft_rank_spill")()
      // head spill (backward ghosts): a block's first maxFwd rows feed
      // the PREVIOUS block's forward reach
      val spillFA = Alias(LessThan(
        Pmod(Subtract(grn, Literal(1L)), bSize),
        Literal(maxFwd)), "graft_rank_spillf")()
      val ghostPre: Seq[Alias] =
        if (ghostUnits.isEmpty) Nil else Seq(blkA, spillA, spillFA)
      // RANGE-framed nth_value gates on the cume_dist numerator
      val gleAlias = Alias(gle, "graft_rank_glel")()
      val absPre: Seq[Alias] =
        if (absUnits.exists(u => !u.ign && u.gate == 2)) Seq(gleAlias)
        else Nil
      // IGNORE-NULLS frame gates: the combined cumulative non-null
      // count at the frame's grain, materialized once per (input,
      // grain) next to the row
      val ignGatePre: Seq[((Expression, Boolean), Alias)] =
        dedupCanon(absUnits.filter(u => u.ign && u.gate == 1)
          .map(_.input)).zipWithIndex.map { case (in, i) =>
          ((in.canonicalized, false), Alias(
            combineUnit(ignCums((in.canonicalized, false))),
            s"graft_rank_nnlr$i")())
        } ++
        dedupCanon(absUnits.filter(u => u.ign && u.gate == 2)
          .map(_.input)).zipWithIndex.map { case (in, i) =>
          ((in.canonicalized, true), Alias(
            combineUnit(ignCums((in.canonicalized, true))),
            s"graft_rank_nnlg$i")())
        }
      val ignGateMap: Map[(Expression, Boolean), Attribute] =
        ignGatePre.map { case (k, al) => k -> al.toAttribute }.toMap
      val base = Project(
        ((child.output ++ grpL ++ outExprs) ++ movLeftAs.map(_._2) ++
          ghostPre ++ absPre ++ ignGatePre.map(_._2)) :+ grnAlias,
        joined)
      // (slot, delta, value-over-`joined`): slot 0 = lead/lag input or
      // moving cum-sum, slot 1 = moving cum-count
      final case class Fetch(slot: (ExprId, Int), delta: Int,
          value: Expression)
      val fetches =
        offUnits.map(u => Fetch((u.exprId, 0), u.delta, u.input)) ++
          movCums.flatMap { m =>
            val d = -(m.u.n + 1)
            m.sum.map(s => Fetch((m.u.exprId, 0), d, combineUnit(s)))
              .toSeq :+ Fetch((m.u.exprId, 1), d, combineUnit(m.cnt))
          }
      // --- ghost stage: union each block's last-maxReach rows into the
      // NEXT block (marker + bumped block id), run every ghost unit's
      // ORIGINAL frame per (group, block) ordered by the global row
      // number (unique — no ties), then drop the ghosts. A real row's
      // frame in the blocked window holds exactly the global frame's
      // rows in global order (ghosts fill the cross-block reach; block 0
      // truncates at the sequence start exactly like the naive plan), so
      // the per-frame fold — even a double sum — is bit-identical.
      var cur: LogicalPlan = base
      val ghostOuts: Map[ExprId, Attribute] =
        if (ghostUnits.isEmpty) Map.empty
        else {
          val ghA = Alias(Literal(false), "graft_rank_gh")()
          val blkRA = Alias(blkA.toAttribute, "graft_rank_gblk")()
          val realP = Project(base.output ++ Seq(ghA, blkRA), base)
          def ghostSide(cond: Expression, delta: Long): LogicalPlan =
            Project(base.output ++ Seq(
              Alias(Literal(true), "graft_rank_gh")(),
              Alias(Add(blkA.toAttribute, Literal(delta)),
                "graft_rank_gblk")()),
              Filter(cond, base))
          val sides = Seq(realP) ++
            (if (maxBack > 0) Seq(ghostSide(spillA.toAttribute, 1L))
             else Nil) ++
            // head ghosts of block 0 would land in block −1 (no real
            // rows) — skip them at the source
            (if (maxFwd > 0) Seq(ghostSide(
              And(spillFA.toAttribute,
                GreaterThan(blkA.toAttribute, Literal(0L))), -1L))
             else Nil)
          val un = Union(sides)
          // union output keeps the REAL side's exprIds, so every
          // downstream reference (grpL, grn, child columns, the fetch
          // joins below) resolves untouched
          val gblk = blkRA.toAttribute
          val gOrd = Seq(SortOrder(grnAlias.toAttribute, Ascending))
          val gws = ghostUnits.map { u =>
            Alias(WindowExpression(u.ae,
              WindowSpecDefinition(grpL :+ gblk, gOrd, u.frame)),
              s"graft_rank_gw${u.origin.exprId.id}")()
          }
          val gwin = Window(gws, grpL :+ gblk, gOrd, un)
          cur = Filter(Not(ghA.toAttribute), gwin)
          ghostUnits.zip(gws).map { case (u, w) =>
            u.origin.exprId -> w.toAttribute
          }.toMap
        }
      val lookups = scala.collection.mutable
        .Map.empty[(ExprId, Int), (Attribute, Attribute)]
      fetches.groupBy(_.delta).toSeq.sortBy(_._1).foreach {
        case (d, fs) =>
          val tag = if (d < 0) s"m${-d}" else d.toString
          val jrnA = Alias(grn, s"graft_rank_jrn$tag")()
          // right-side copies of the group keys: fresh aliases, so the
          // self-join resolves (grpL ids exist on both sides otherwise)
          val grpJAs = grpL.zipWithIndex.map { case (g, i) =>
            Alias(g, s"graft_rank_gj${tag}_$i")()
          }
          val valAs = fs.zipWithIndex.map { case (f, i) =>
            f -> Alias(f.value, s"graft_rank_lv${tag}_$i")()
          }
          val rightP = Project((jrnA +: grpJAs) ++ valAs.map(_._2), joined)
          // source row: same group AND jrn == grn + delta (left refs
          // left, right right — ExtractEquiJoinKeys plans the hash join
          // on computed keys; group equality is null-safe)
          cur = Join(cur, rightP, LeftOuter,
            Some((EqualTo(Add(grnAlias.toAttribute, Literal(d.toLong)),
              jrnA.toAttribute) +:
              grpL.zip(grpJAs).map[Expression] { case (l, j) =>
                EqualNullSafe(l, j.toAttribute)
              }).reduce(And)), JoinHint.NONE)
          valAs.foreach { case (f, va) =>
            // nullable copies: above the outer join these attributes CAN
            // be null even when the underlying expressions cannot —
            // non-nullable metadata would let NullPropagation fold the
            // IsNull default branch away (binding is by exprId, so the
            // relaxed copy is always safe)
            lookups(f.slot) = (jrnA.toAttribute.withNullability(true),
              va.toAttribute.withNullability(true))
          }
      }
      // --- absolute-position fetches: one broadcast join per distinct
      // position (literal k, or the partition end `tot`); the right side
      // filters `joined` to the ≤ maxGroups rows AT that position.
      // `current`-flagged units (last_value UP..CR) are plain
      // projections and fetch nothing.
      val absLookups = scala.collection.mutable
        .Map.empty[ExprId, (Attribute, Attribute)]
      absUnits.filterNot(u => u.current || u.ign).groupBy(_.pos).foreach {
        case (pos, us) =>
          val tag = pos.map(_.toString).getOrElse("end")
          val jrnA = Alias(grn, s"graft_rank_arn$tag")()
          val grpJAs = grpL.zipWithIndex.map { case (g, i) =>
            Alias(g, s"graft_rank_ag${tag}_$i")()
          }
          val valAs = us.map { u =>
            u -> Alias(u.input, s"graft_rank_av${tag}_${u.exprId.id}")()
          }
          // position filter INSIDE the right side: jrn == k, or == the
          // group's total for the partition-end fetch (tot lives at
          // `joined`, so the comparison is all right-side)
          val posCond = pos match {
            case Some(k) => EqualTo(grn, Literal(k.toLong))
            case None => EqualTo(grn, totAlias.toAttribute)
          }
          val rightP = Project((jrnA +: grpJAs) ++ valAs.map(_._2),
            Filter(posCond, joined))
          cur = Join(cur, rightP, LeftOuter,
            grpL.zip(grpJAs).map[Expression] { case (l, j) =>
              EqualNullSafe(l, j.toAttribute)
            }.reduceOption(And), JoinHint(None,
              Some(HintInfo(strategy = Some(BROADCAST)))))
          valAs.foreach { case (u, va) =>
            absLookups(u.exprId) = (jrnA.toAttribute.withNullability(true),
              va.toAttribute.withNullability(true))
          }
      }
      // --- IGNORE-NULLS fetches: one broadcast join per distinct
      // (input, non-null position). The partition ends come straight
      // from a min_by/max_by aggregate over the non-null rows (≤
      // maxGroups rows); an interior position k filters the non-null
      // row whose cumulative non-null count equals k — exactly one row
      // per group, because the count increments only on non-null rows.
      // A group with < k non-nulls yields no row → the outer join's
      // native null.
      val ignGroups = {
        // stable grouping by (canonical input, position)
        val keys = scala.collection.mutable.LinkedHashMap
          .empty[(Expression, Option[Int]), Vector[AbsUnit]]
        absUnits.filter(_.ign).foreach { u =>
          val k = (u.input.canonicalized, u.pos)
          keys(k) = keys.getOrElse(k, Vector.empty) :+ u
        }
        keys.toSeq
      }
      ignGroups.zipWithIndex.foreach { case (((_, pos), us), gi) =>
        val u0 = us.head
        val tag = s"n$gi"
        val grpJAs = grpL.zipWithIndex.map { case (g, i) =>
          Alias(g, s"graft_rank_ng${tag}_$i")()
        }
        val (marker, value, right) = pos match {
          case Some(k) if k >= 2 =>
            // interior k: cumulative non-null count == k AND non-null
            val nn = combineUnit(ignCums((u0.input.canonicalized, false)))
            val mA = Alias(grn, s"graft_rank_nm$tag")()
            val vA = Alias(u0.input, s"graft_rank_nv$tag")()
            val flt = Filter(And(IsNotNull(u0.input),
              EqualTo(nn, Literal(k.toLong))), joined)
            (mA, vA, Project((mA +: grpJAs) :+ vA, flt))
          case _ =>
            // first (k = 1) / last (None) non-null: min_by/max_by on
            // the global row number over the non-null rows
            val inA = Alias(u0.input, s"graft_rank_ni$tag")()
            val rnA = Alias(grn, s"graft_rank_nr$tag")()
            val prj = Project((inA +: rnA +: grpJAs), joined)
            val flt = Filter(IsNotNull(inA.toAttribute), prj)
            val by: AggregateFunction =
              if (pos.isEmpty) MaxBy(inA.toAttribute, rnA.toAttribute)
              else MinBy(inA.toAttribute, rnA.toAttribute)
            val mA = Alias(AggregateExpression(Min(rnA.toAttribute),
              Complete, isDistinct = false), s"graft_rank_nm$tag")()
            val vA = Alias(AggregateExpression(by, Complete,
              isDistinct = false), s"graft_rank_nv$tag")()
            val agg = Aggregate(grpJAs.map(_.toAttribute),
              (grpJAs.map(_.toAttribute): Seq[NamedExpression]) ++
                Seq(mA, vA), flt)
            (mA, vA, agg)
        }
        cur = Join(cur, right, LeftOuter,
          grpL.zip(grpJAs).map[Expression] { case (l, j) =>
            EqualNullSafe(l, j.toAttribute)
          }.reduceOption(And), JoinHint(None,
            Some(HintInfo(strategy = Some(BROADCAST)))))
        us.foreach { u =>
          absLookups(u.exprId) = (marker.toAttribute.withNullability(true),
            value.toAttribute.withNullability(true))
        }
      }
      val finalOut = exprs.map {
        case a: Alias if absIds.contains(a.exprId) =>
          val u = absUnits.find(_.exprId == a.exprId).get
          val value =
            if (u.current) Cast(u.input, u.dt)
            else {
              val (jrn, v) = absLookups(u.exprId)
              val fetched = If(IsNull(jrn), Literal(null, u.dt),
                Cast(v, u.dt))
              if (u.ign) u.gate match {
                case 0 => fetched // UP..UF: match exists iff value does
                case g => // non-null count in the frame must reach k
                  val nn = ignGateMap((u.input.canonicalized, g == 2))
                  If(GreaterThanOrEqual(nn,
                    Literal(u.pos.get.toLong)), fetched,
                    Literal(null, u.dt))
              } else u.gate match {
                case 0 => fetched
                case 1 => If(GreaterThanOrEqual(grnAlias.toAttribute,
                  Literal(u.pos.get.toLong)), fetched,
                  Literal(null, u.dt))
                case 2 => If(GreaterThanOrEqual(gleAlias.toAttribute,
                  Literal(u.pos.get.toLong)), fetched,
                  Literal(null, u.dt))
                case 3 => fetched // match exists iff tot ≥ k
              }
            }
          Alias(value, u.name)(exprId = u.exprId, qualifier = u.qualifier)
        case a: Alias if ghostIds.contains(a.exprId) =>
          Alias(ghostOuts(a.exprId), a.name)(exprId = a.exprId,
            qualifier = a.qualifier)
        case a: Alias if offUnitIds.contains(a.exprId) =>
          val u = offUnits.find(_.exprId == a.exprId).get
          val (jrn, v) = lookups((u.exprId, 0))
          // no source row at grn + delta (out of range) → default;
          // jrn is the matched marker (never null on a real match)
          Alias(If(IsNull(jrn), Cast(u.default, u.dt), Cast(v, u.dt)),
            u.name)(exprId = u.exprId, qualifier = u.qualifier)
        case a: Alias if movIds.contains(a.exprId) =>
          val m = movCums.find(_.u.exprId == a.exprId).get
          // frame non-null count = cnt(i) − cnt(i−n−1); an unmatched
          // fetch means the frame starts at row 1 (prefix = 0)
          val cntL = movLeft((a.exprId, 1)).toAttribute
          val (_, cntV) = lookups((a.exprId, 1))
          val frameCnt =
            Subtract(cntL, Coalesce(Seq(cntV, Literal(0L))))
          val value = m.sum match {
            case None => Cast(frameCnt, m.u.dt)
            case Some(_) =>
              val sumL = movLeft((a.exprId, 0)).toAttribute
              val (_, sumV) = lookups((a.exprId, 0))
              val zero = Literal.default(sumL.dataType)
              // zero non-null inputs in the frame → SQL null, exactly
              // the naive fold's empty-buffer result; otherwise the
              // prefix difference (exact for integral sums — Long
              // addition is associative mod 2⁶⁴ even under wrap)
              If(EqualTo(frameCnt, Literal(0L)), Literal(null, m.u.dt),
                Cast(Subtract(Coalesce(Seq(sumL, zero)),
                  Coalesce(Seq(sumV, zero))), m.u.dt))
          }
          Alias(value, m.u.name)(exprId = m.u.exprId,
            qualifier = m.u.qualifier)
        case a: Alias =>
          outExprs.collectFirst {
            case o: Alias if o.exprId == a.exprId => o.toAttribute
          }.get
        case other => other // unreachable under `supported`
      }
      Project(child.output ++ finalOut, cur)
    }
  }

  /** SQL NTILE(k) from a global 1-based row number and the total count:
    * the first `tot % k` tiles take `tot/k + 1` rows, the rest `tot/k`
    * (DistRank.ntileFromRn as a catalyst expression; CaseWhen evaluates
    * only the matching branch, so the q=0 division is unreachable). */
  private def ntileFromRn(rn: Expression, tot: Expression, k: Int): Expression = {
    val kL = Literal(k.toLong)
    val q = IntegralDivide(tot, kL)
    val r = Remainder(tot, kL)
    val bigRows = Multiply(r, Add(q, Literal(1L)))
    CaseWhen(
      Seq((LessThanOrEqual(rn, bigRows),
        Add(IntegralDivide(Subtract(rn, Literal(1L)), Add(q, Literal(1L))),
          Literal(1L)))),
      Some(Add(Add(r, IntegralDivide(
        Subtract(Subtract(rn, bigRows), Literal(1L)), q)), Literal(1L))))
  }
}
