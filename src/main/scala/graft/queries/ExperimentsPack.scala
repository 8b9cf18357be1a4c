package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables

/** Experimentation & time-series depth: privacy audit (k-anonymity),
  * A/B-test readout with a two-proportion z-score, Holt linear-trend
  * smoothing, day-of-week seasonality, time-to-repeat-purchase with
  * censoring, and a time-windowed funnel (ClickHouse `windowFunnel`
  * shape). All are capabilities an analytics lakehouse layered on the
  * reference's star schema (reference `README.md:259-344`) grows into
  * once the basic funnel/conversion queries (`README.md:357-402`) exist.
  *
  * Scale doctrine shared by the pack: every query reduces to key grain
  * (customer / day / user) in ONE partial-agg shuffle, then finishes with
  * either a tiny broadcast of scalar totals or an in-row fold over a
  * bounded array (calendar days, per-user funnel events) — no self-joins,
  * no windows over raw fact rows, nothing that grows super-linearly at
  * 100 TB. Sequential recurrences (Holt, windowed funnel) follow the q166
  * fold doctrine: exact-integer inputs, identical IEEE op sequence both
  * engines, DuckDB `list_reduce` seed-with-head mirrored by folding the
  * tail onto element 1.
  */
object ExperimentsPack extends QueryPack {

  // --- q194: k-anonymity audit ---------------------------------------------

  /** q194 — k-anonymity audit over the quasi-identifier tuple
    * (nation, market segment, account-balance $1000 band): class size k
    * per QI equivalence class, reported as a k-histogram with the rows
    * sitting in classes below the k=5 re-identification floor flagged.
    * Complements q144's PII redaction: redaction removes direct
    * identifiers, this measures whether the remaining quasi-identifiers
    * still single people out. Two partial-agg shuffles on shrinking
    * grains (QI classes, then distinct k values ≤ distinct class sizes) —
    * linear at any scale.
    */
  private def q194(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
      .groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg(count(lit(1)).as("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_classes"))
      .select(col("k"), col("n_classes"),
        (col("k") * col("n_classes")).as("n_rows"),
        when(col("k") < 5, 1).otherwise(0).as("at_risk"))
      .orderBy("k")

  // --- q270: l-diversity audit ---------------------------------------------

  /** q270 — l-DIVERSITY audit, the homogeneity complement to q194's
    * k-anonymity: with the QI coarsened to (nation, $1000 balance band),
    * the market segment plays the SENSITIVE attribute; a class whose
    * members all share one segment leaks it even when k is large (the
    * homogeneity attack k-anonymity misses). Per QI class the distinct
    * sensitive count l (exact multi-distinct in the same aggregate as
    * k), reported as an l-histogram with classes below l = 3 flagged.
    * Same two shrinking-grain shuffles as q194 — linear at any scale.
    */
  private def q270(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer")
      .select(col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"),
        col("c_mktsegment"))
      .groupBy("c_nationkey", "bal_band")
      .agg(count(lit(1)).as("k"), countDistinct("c_mktsegment").as("l"))
      .groupBy("l")
      .agg(count(lit(1)).as("n_classes"), sum("k").as("n_rows"))
      .select(col("l"), col("n_classes"), col("n_rows"),
        when(col("l") < 3, 1).otherwise(0).as("at_risk"))
      .orderBy("l")

  // --- q195: A/B experiment readout ----------------------------------------

  /** q195 — A/B experiment readout: customers deterministically split
    * 50/50 by salted md5 (the q111 assignment doctrine — stable under
    * corpus growth, no RNG), arm A's conversion and revenue-per-user
    * compared against arm B with lift and a pooled two-proportion
    * z-score. "Converted" = placed ≥1 order in the dataset's final
    * partial year (2001) — every customer has SOME order in this data,
    * so lifetime conversion would be degenerately 1.0 in both arms and
    * the pooled variance zero; recent-activity conversion is strictly
    * inside (0, 1) at every SF. One customer⟕orders outer aggregation
    * (the per-customer grain), then a single global conditional agg —
    * the readout row never leaves the reducer. sqrt is
    * IEEE-correctly-rounded in both engines (unlike pow/ln), so the
    * z-score is emitted raw; all revenue math runs in exact integer
    * cents until the final division.
    */
  private def q195(s: SparkSession, dir: String): DataFrame = {
    val arm = when(
      TrainingPipelinePack.bucket(col("c_custkey"), "ab", 2) === 0, "A")
      .otherwise("B")
    val perCust = Tables.load(s, dir, "customer")
      .join(Tables.load(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(sum(when(col("o_orderdate") >= to_timestamp(lit("2001-01-01")),
          1L).otherwise(0L)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents")),
        col("c_custkey") === col("o_custkey"), "left")
      .select(arm.as("arm"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("cents"), lit(0L)).as("cents"))
    def armAgg(a: String, c: Column) = sum(when(col("arm") === a, c))
    val agg = perCust.agg(
      armAgg("A", lit(1L)).as("n_a"),
      armAgg("B", lit(1L)).as("n_b"),
      armAgg("A", when(col("n_orders") > 0, 1L).otherwise(0L)).as("conv_a"),
      armAgg("B", when(col("n_orders") > 0, 1L).otherwise(0L)).as("conv_b"),
      armAgg("A", col("cents")).as("cents_a"),
      armAgg("B", col("cents")).as("cents_b"))
    val pA = col("conv_a").cast("double") / col("n_a")
    val pB = col("conv_b").cast("double") / col("n_b")
    val pooled = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    agg.select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      pA.as("rate_a"), pB.as("rate_b"),
      (lit(100.0) * (pA - pB) / pB).as("lift_pct"),
      ((pA - pB) / sqrt(pooled * (lit(1.0) - pooled) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))).as("z_score"),
      (col("cents_a").cast("double") / col("n_a") / 100.0).as("arpu_a"),
      (col("cents_b").cast("double") / col("n_b") / 100.0).as("arpu_b"))
  }

  // --- q273: quantile treatment effects ------------------------------------

  /** q273 — QUANTILE TREATMENT EFFECTS for the q195 experiment: instead
    * of comparing arm MEANS (which whale customers dominate), compare
    * the arms' full spend DISTRIBUTIONS decile by decile — QTE(q) =
    * spendA(q) − spendB(q). Reuses q195's md5 arm assignment verbatim
    * (same experiment, same units) and q226's exact rank-grid decile
    * machinery per arm: customer-grain exact cents, a per-arm rank
    * window with custkey tiebreak, decile edges picked by
    * ceil(d·n/10) rank join (percentile_disc semantics), then the two
    * arms pivot side by side via one 10-row self-join. No-order
    * customers enter at 0 — dropping them would bias both curves. All
    * arithmetic exact BIGINT cents end to end.
    */
  private def q273(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val arm = when(
      TrainingPipelinePack.bucket(col("c_custkey"), "ab", 2) === 0, "A")
      .otherwise("B")
    val perCust = Tables.load(s, dir, "customer")
      .join(Tables.load(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents")),
        col("c_custkey") === col("o_custkey"), "left")
      .select(arm.as("arm"), col("c_custkey").as("ck"),
        coalesce(col("cents"), lit(0L)).as("x"))
    val w = Window.partitionBy("arm").orderBy(col("x"), col("ck"))
    val ranked = perCust.withColumn("rn", row_number().over(w))
    val targets = perCust.groupBy("arm").agg(count(lit(1)).as("n"))
      .select(col("arm"), explode(sequence(lit(1), lit(10))).as("decile"),
        col("n"))
      .withColumn("rn", ceil(col("decile") * col("n") / lit(10.0))
        .cast("int"))
    val edges = ranked.join(broadcast(targets), Seq("arm", "rn"))
      .select(col("arm"), col("decile"), col("x"))
    edges.filter(col("arm") === "A")
      .select(col("decile"), col("x").as("spend_a"))
      .join(edges.filter(col("arm") === "B")
        .select(col("decile"), col("x").as("spend_b")), "decile")
      .select(col("decile"), col("spend_a"), col("spend_b"),
        (col("spend_a") - col("spend_b")).as("qte_cents"))
      .orderBy("decile")
  }

  // --- q196: Holt linear-trend smoothing -----------------------------------

  /** q196 — Holt double-exponential smoothing (α = 0.3, β = 0.2) of the
    * daily revenue series per order priority: extends q166's EWMA with a
    * trend component, final state (level, trend) plus the one-step-ahead
    * forecast level+trend. The two-field recurrence rides the same
    * in-row-fold doctrine: the per-group day array is calendar-bounded
    * (~2.5k entries at any SF), elements carry a pre-initialized
    * [y, l=y, t=0] state so DuckDB's seed-with-head equals the correct
    * Holt initialization, and both engines run the identical IEEE
    * sequence over exact-cents daily inputs.
    *
    * The fold state is a 3-element ARRAY, not a struct — deliberately:
    * DuckDB 1.0.0's `list_reduce` writes accumulator STRUCT fields in
    * place, so a field expression reading `acc.x` after an earlier field
    * overwrote x sees this iteration's value (minimal repro:
    * `list_reduce([{a:1,b:0},{a:2,b:0}], (acc,x) -> {a: acc.a+x.a,
    * b: acc.a})` yields b=3, the NEW a). Holt's level/trend are mutually
    * recursive, so no field order avoids the aliasing; list-encoded
    * state builds a fresh vector each step and folds correctly.
    */
  private def q196(s: SparkSession, dir: String): DataFrame = {
    def step(acc: Column, x: Column): Column = {
      def lvl = lit(0.3) * element_at(x, 1) +
        lit(0.7) * (element_at(acc, 2) + element_at(acc, 3))
      array(element_at(x, 1), lvl,
        lit(0.2) * (lvl - element_at(acc, 2)) +
          lit(0.8) * element_at(acc, 3))
    }
    Tables.load(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority"),
        col("o_orderdate").as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .groupBy("priority")
      .agg(sort_array(collect_list(struct(col("d"),
        (col("cents") / 100.0).as("r")))).as("srt"))
      .select(col("priority"),
        transform(col("srt"), e =>
          array(e.getField("r"), e.getField("r"), lit(0.0))).as("xs"))
      .select(col("priority"), size(col("xs")).as("n_days"),
        aggregate(slice(col("xs"), lit(2), size(col("xs")) - 1),
          element_at(col("xs"), 1), step).as("h"))
      .select(col("priority"), col("n_days"),
        round(element_at(col("h"), 2), 6).as("level"),
        round(element_at(col("h"), 3), 6).as("trend"),
        round(element_at(col("h"), 2) + element_at(col("h"), 3), 6)
          .as("forecast_next"))
      .orderBy("priority")
  }

  // --- q197: day-of-week seasonality ---------------------------------------

  /** q197 — day-of-week seasonality index: per ISO weekday, the average
    * daily revenue relative to the all-days average (index 1.0 = no
    * seasonal effect). Daily revenue reduces once as exact cents; the
    * 7-row weekday aggregate cross-joins a broadcast scalar total. Ratios
    * are raw doubles built from exact integers with an identical op
    * sequence both engines (q27 doctrine) — no rounding anywhere.
    */
  private def q197(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      // day-grain cache feeding BOTH the per-dow and the scalar-total
      // branch — one orders scan + one reduce instead of two
      .persist()
    val byDow = daily
      .groupBy((weekday(col("d")) + 1).as("isodow"))
      .agg(sum("cents").as("cents"), count(lit(1)).as("n_days"))
    val tot = daily.agg(sum("cents").as("tot_cents"),
      count(lit(1)).as("tot_days"))
    val avgDow = col("cents").cast("double") / col("n_days")
    byDow.crossJoin(broadcast(tot))
      .select(col("isodow").cast("int").as("isodow"), col("n_days"),
        (avgDow / 100.0).as("avg_daily_revenue"),
        (avgDow / (col("tot_cents").cast("double") / col("tot_days")))
          .as("seasonal_index"))
      .orderBy("isodow")
  }

  // --- q198: time-to-repeat-purchase with censoring ------------------------

  /** q198 — time-to-repeat-purchase distribution: days from a customer's
    * first to second order, bucketed into 30-day bands, with
    * never-repeated customers reported as a censored band (-1) rather
    * than silently dropped — the survival-analysis framing of retention
    * (complements q132's cohort grid). One shuffle to customer grain
    * collects each customer's sorted order-date array (bounded by order
    * count per customer, ≤ ~40 in TPC-H shape); the share denominator is
    * a broadcast scalar.
    */
  private def q198(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.load(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(sort_array(collect_list(to_date(col("o_orderdate")))).as("ds"))
      .select(
        when(size(col("ds")) >= 2,
          floor(datediff(element_at(col("ds"), 2),
            element_at(col("ds"), 1)) / lit(30.0)).cast("int"))
          .otherwise(lit(-1)).as("band"))
    val banded = perCust.groupBy("band")
      .agg(count(lit(1)).as("n_customers"))
      .persist()
    val tot = banded.agg(sum("n_customers").as("tot"))
    banded.crossJoin(broadcast(tot))
      .select(col("band"),
        when(col("band") >= 0, "repeated").otherwise("censored")
          .as("status"),
        when(col("band") >= 0, col("band") * 30).as("t_lo_days"),
        col("n_customers"),
        (col("n_customers").cast("double") / col("tot")).as("share"))
      .orderBy("band")
  }

  // --- q199: time-windowed funnel ------------------------------------------

  /** Funnel-step completion times after an in-row DP fold over a user's
    * time-sorted events: earliest view (t1), earliest click within the
    * window of t1 (t2), earliest purchase after that click still within
    * t1's window (t3) — sentinel Long.MaxValue = never reached. Elements
    * are pre-initialized to the single-event state so DuckDB's
    * seed-with-head list_reduce equals the correct initialization; the
    * `t_k < us` guards double as sentinel checks (a sentinel is never
    * < a real timestamp, and the guard also keeps the `us - t1` window
    * arithmetic away from sentinel operands). State rides a 5-element
    * LONG array [us, c, t1, t2, t3], not a struct — the q196 DuckDB
    * `list_reduce` struct-aliasing trap: t2's expression reads acc's t1,
    * which a struct encoding would have already overwritten this step.
    */
  /** The raw DP fold: per user the final `[us, c, t1, t2, t3]` state (see
    * [[funnelState]] for the semantics). Exposed separately so step-timing
    * queries (q233) can read the earliest-completion timestamps the
    * level readout discards. */
  private[graft] def funnelFold(events: DataFrame,
                                windowUs: Long): DataFrame = {
    val inf = Long.MaxValue
    def stepCode = when(col("event_type") === "view", 1L)
      .when(col("event_type") === "click", 2L).otherwise(3L)
    def step(acc: Column, x: Column): Column = {
      val us = element_at(x, 1)
      val c = element_at(x, 2)
      val t1 = element_at(acc, 3)
      val t2 = element_at(acc, 4)
      val t3 = element_at(acc, 5)
      val inWin = us - t1 <= windowUs
      array(us, c,
        when(c === 1, least(t1, us)).otherwise(t1),
        when(c === 2 && t1 < us && inWin, least(t2, us)).otherwise(t2),
        when(c === 3 && t2 < us && inWin, least(t3, us)).otherwise(t3))
    }
    events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), expr("ts div 1000").as("us"),
        stepCode.as("c"))
      .select(col("user_id"), array(col("us"), col("c"),
        when(col("c") === 1, col("us")).otherwise(lit(inf)),
        lit(inf), lit(inf)).as("e"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(col("user_id"),
        aggregate(slice(col("es"), lit(2), size(col("es")) - 1),
          element_at(col("es"), 1), step).as("f"))
  }

  private[graft] def funnelState(events: DataFrame,
                                 windowUs: Long): DataFrame = {
    val inf = Long.MaxValue
    funnelFold(events, windowUs)
      .select(col("user_id"),
        when(element_at(col("f"), 5) < inf, 3)
          .when(element_at(col("f"), 4) < inf, 2)
          .when(element_at(col("f"), 3) < inf, 1).otherwise(0).as("level"))
  }

  /** q199 — time-windowed funnel (ClickHouse `windowFunnel` shape): per
    * user the deepest view→click→purchase prefix completed within a
    * 7-day window anchored at the user's earliest view, reported as a
    * level histogram. Distinct from q103 (ordering only, no deadline):
    * the window is what turns "eventually converted" into "converted
    * while the intent was live". Earliest-anchor semantics (a later view
    * never re-opens the window) — deliberate: it makes the recurrence a
    * single left-to-right DP expressible as the shared in-row fold, with
    * multi-field state (t1, t2, t3) instead of q166's scalar. Per-user
    * arrays are session-bounded; the fold is O(events-per-user) after
    * ONE shuffle to user grain.
    */
  private def q199(s: SparkSession, dir: String): DataFrame =
    funnelState(Tables.load(s, dir, "events"), 604800000000L)
      .groupBy("level")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("level")

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] =
    Seq(
      "q194_k_anonymity" -> q194 _,
      "q270_l_diversity" -> q270 _,
      "q273_qte_deciles" -> q273 _,
      "q195_ab_readout" -> q195 _,
      "q196_holt_trend" -> q196 _,
      "q197_dow_seasonality" -> q197 _,
      "q198_time_to_repeat" -> q198 _,
      "q199_window_funnel" -> q199 _)

  override val oracle: Seq[(String, String)] = Seq(
    "q273_qte_deciles" -> {
      val arm =
        s"CASE WHEN ${TrainingPipelinePack.duckBucket("c_custkey", "ab", 2)}" +
          " = 0 THEN 'A' ELSE 'B' END"
      s"""WITH spend AS (
         | SELECT o_custkey,
         |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         |   AS cents
         | FROM orders GROUP BY 1),
         |pc AS (
         | SELECT $arm AS arm, c_custkey AS ck, COALESCE(cents, 0) AS x
         | FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
         |ranked AS (SELECT *,
         |  row_number() OVER (PARTITION BY arm ORDER BY x, ck) AS rn
         | FROM pc),
         |targets AS (
         | SELECT arm, decile, CAST(ceil(decile * n / 10.0) AS BIGINT) AS rn
         | FROM (SELECT arm, count(*) AS n FROM pc GROUP BY 1),
         |  generate_series(1, 10) AS g(decile)),
         |edges AS (
         | SELECT r.arm, CAST(t.decile AS INT) AS decile, r.x
         | FROM ranked r JOIN targets t ON r.arm = t.arm AND r.rn = t.rn)
         |SELECT a.decile, a.x AS spend_a, b.x AS spend_b,
         | a.x - b.x AS qte_cents
         |FROM (SELECT decile, x FROM edges WHERE arm = 'A') a
         |JOIN (SELECT decile, x FROM edges WHERE arm = 'B') b
         | ON a.decile = b.decile
         |ORDER BY a.decile""".stripMargin
    },
    "q270_l_diversity" ->
      """WITH classes AS (
        | SELECT c_nationkey,
        |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |  CAST(count(*) AS BIGINT) AS k,
        |  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l
        | FROM customer GROUP BY 1, 2)
        |SELECT l, CAST(count(*) AS BIGINT) AS n_classes,
        | CAST(sum(k) AS BIGINT) AS n_rows,
        | CASE WHEN l < 3 THEN 1 ELSE 0 END AS at_risk
        |FROM classes GROUP BY l ORDER BY l""".stripMargin,
    "q194_k_anonymity" ->
      """WITH classes AS (
        | SELECT c_nationkey, c_mktsegment,
        |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |  count(*) AS k
        | FROM customer GROUP BY 1, 2, 3)
        |SELECT k, CAST(count(*) AS BIGINT) AS n_classes,
        | CAST(k * count(*) AS BIGINT) AS n_rows,
        | CASE WHEN k < 5 THEN 1 ELSE 0 END AS at_risk
        |FROM classes GROUP BY k ORDER BY k""".stripMargin,
    "q195_ab_readout" -> {
      val arm =
        s"CASE WHEN ${TrainingPipelinePack.duckBucket("c_custkey", "ab", 2)}" +
          " = 0 THEN 'A' ELSE 'B' END"
      s"""WITH per_cust AS (
        | SELECT $arm AS arm,
        |  COALESCE(o.n_orders, 0) AS n_orders,
        |  COALESCE(o.cents, 0) AS cents
        | FROM customer c LEFT JOIN (
        |  SELECT o_custkey,
        |   CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '2001-01-01'
        |     THEN 1 ELSE 0 END) AS BIGINT) AS n_orders,
        |   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1) o ON c.c_custkey = o.o_custkey),
        |agg AS (
        | SELECT
        |  CAST(sum(CASE WHEN arm = 'A' THEN 1 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN arm = 'B' THEN 1 END) AS BIGINT) AS n_b,
        |  CAST(sum(CASE WHEN arm = 'A' THEN
        |    CASE WHEN n_orders > 0 THEN 1 ELSE 0 END END) AS BIGINT)
        |    AS conv_a,
        |  CAST(sum(CASE WHEN arm = 'B' THEN
        |    CASE WHEN n_orders > 0 THEN 1 ELSE 0 END END) AS BIGINT)
        |    AS conv_b,
        |  CAST(sum(CASE WHEN arm = 'A' THEN cents END) AS BIGINT)
        |    AS cents_a,
        |  CAST(sum(CASE WHEN arm = 'B' THEN cents END) AS BIGINT)
        |    AS cents_b
        | FROM per_cust)
        |SELECT n_a, n_b, conv_a, conv_b,
        | CAST(conv_a AS DOUBLE) / n_a AS rate_a,
        | CAST(conv_b AS DOUBLE) / n_b AS rate_b,
        | 100.0 * (CAST(conv_a AS DOUBLE) / n_a
        |        - CAST(conv_b AS DOUBLE) / n_b)
        |   / (CAST(conv_b AS DOUBLE) / n_b) AS lift_pct,
        | (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
        |  / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |    * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |    * (1.0 / n_a + 1.0 / n_b)) AS z_score,
        | CAST(cents_a AS DOUBLE) / n_a / 100.0 AS arpu_a,
        | CAST(cents_b AS DOUBLE) / n_b / 100.0 AS arpu_b
        |FROM agg""".stripMargin
    },
    "q196_holt_trend" ->
      """WITH daily AS (
        | SELECT o_orderpriority AS priority, o_orderdate AS d,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        | FROM orders GROUP BY 1, 2),
        |arr AS (
        | SELECT priority,
        |  list_transform(
        |    list_sort(list({'d': d, 'r': CAST(cents AS DOUBLE) / 100})),
        |    e -> [e.r, e.r, CAST(0 AS DOUBLE)]) AS xs
        | FROM daily GROUP BY priority),
        |folded AS (
        | SELECT priority, CAST(len(xs) AS INT) AS n_days,
        |  list_reduce(xs, (acc, x) -> [
        |    x[1],
        |    CAST(0.3 AS DOUBLE) * x[1]
        |      + CAST(0.7 AS DOUBLE) * (acc[2] + acc[3]),
        |    CAST(0.2 AS DOUBLE) * ((CAST(0.3 AS DOUBLE) * x[1]
        |        + CAST(0.7 AS DOUBLE) * (acc[2] + acc[3])) - acc[2])
        |      + CAST(0.8 AS DOUBLE) * acc[3]]) AS h
        | FROM arr)
        |SELECT priority, n_days, round(h[2], 6) AS level,
        | round(h[3], 6) AS trend, round(h[2] + h[3], 6) AS forecast_next
        |FROM folded ORDER BY priority""".stripMargin,
    "q197_dow_seasonality" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS d,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        | FROM orders GROUP BY 1),
        |by_dow AS (
        | SELECT CAST(date_part('isodow', d) AS INT) AS isodow,
        |  sum(cents) AS cents, count(*) AS n_days
        | FROM daily GROUP BY 1),
        |tot AS (
        | SELECT sum(cents) AS tot_cents, count(*) AS tot_days FROM daily)
        |SELECT isodow, CAST(n_days AS BIGINT) AS n_days,
        | CAST(cents AS DOUBLE) / n_days / 100.0 AS avg_daily_revenue,
        | (CAST(cents AS DOUBLE) / n_days)
        |  / (CAST(tot_cents AS DOUBLE) / tot_days) AS seasonal_index
        |FROM by_dow, tot ORDER BY isodow""".stripMargin,
    "q198_time_to_repeat" ->
      """WITH per_cust AS (
        | SELECT o_custkey,
        |  list_sort(list(CAST(o_orderdate AS DATE))) AS ds
        | FROM orders GROUP BY 1),
        |banded AS (
        | SELECT CASE WHEN len(ds) >= 2 THEN
        |   CAST(floor(date_diff('day', ds[1], ds[2]) / 30.0) AS INT)
        |  ELSE -1 END AS band
        | FROM per_cust),
        |counts AS (
        | SELECT band, count(*) AS n_customers FROM banded GROUP BY 1),
        |tot AS (SELECT sum(n_customers) AS tot FROM counts)
        |SELECT band,
        | CASE WHEN band >= 0 THEN 'repeated' ELSE 'censored' END AS status,
        | CASE WHEN band >= 0 THEN band * 30 END AS t_lo_days,
        | CAST(n_customers AS BIGINT) AS n_customers,
        | CAST(n_customers AS DOUBLE) / tot AS share
        |FROM counts, tot ORDER BY band""".stripMargin,
    "q199_window_funnel" ->
      """WITH ev AS (
        | SELECT user_id, epoch_us(ts) AS us,
        |  CASE event_type WHEN 'view' THEN CAST(1 AS BIGINT)
        |   WHEN 'click' THEN 2 ELSE 3 END AS c
        | FROM events
        | WHERE event_type IN ('view', 'click', 'purchase')),
        |init AS (
        | SELECT user_id, [us, c,
        |  CASE WHEN c = 1 THEN us ELSE 9223372036854775807 END,
        |  9223372036854775807, 9223372036854775807] AS e
        | FROM ev),
        |folded AS (
        | SELECT user_id,
        |  list_reduce(list_sort(list(e)), (acc, x) -> [
        |   x[1], x[2],
        |   CASE WHEN x[2] = 1 THEN least(acc[3], x[1]) ELSE acc[3] END,
        |   CASE WHEN x[2] = 2 AND acc[3] < x[1]
        |         AND x[1] - acc[3] <= 604800000000
        |        THEN least(acc[4], x[1]) ELSE acc[4] END,
        |   CASE WHEN x[2] = 3 AND acc[4] < x[1]
        |         AND x[1] - acc[3] <= 604800000000
        |        THEN least(acc[5], x[1]) ELSE acc[5] END]) AS f
        | FROM init GROUP BY user_id),
        |lvl AS (
        | SELECT CASE WHEN f[5] < 9223372036854775807 THEN 3
        |   WHEN f[4] < 9223372036854775807 THEN 2
        |   WHEN f[3] < 9223372036854775807 THEN 1 ELSE 0 END AS level
        | FROM folded)
        |SELECT level, CAST(count(*) AS BIGINT) AS n_users
        |FROM lvl GROUP BY level ORDER BY level""".stripMargin)
}
