package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.Tables

/** Range/ordering operators that complete the join and quantile families:
  * a tile-blocked interval-OVERLAP self-join (q78 joins a point into a
  * trailing window; q256 joins intervals against intervals — the shape
  * ranges, sessions, and validity windows need), and exact WEIGHTED
  * quartiles in one partitioned pass (q226/q38 rank unweighted rows;
  * corpus work weights by tokens/quantity).
  *
  * Exactness doctrine unchanged (see [[QueryPack]]).
  */
object RangeOpsPack extends QueryPack {

  private val IvDays = 90

  /** q256 — interval-overlap self-join via tile blocking. Each order
    * carries a [orderdate, +90d) fulfillment window; the query counts,
    * per customer, how many of their order-window PAIRS overlap, and
    * reports the distribution (customers per overlap count, zero bucket
    * included). The scale shape: a naive interval join is a theta join
    * (nested loop at any size); tiling replaces it with an EQUI-join —
    * every interval explodes into the 90-day tiles it touches (≤ 2 here:
    * tile width = interval width, the textbook choice), candidates meet
    * on (customer, tile), duplicates collapse by pair key, and the exact
    * overlap predicate `s₁ < e₂ ∧ s₂ < e₁` verifies survivors. Work is
    * O(intervals·tiles-per-interval + true pairs), never |A|·|B|; the
    * equi-key (customer) co-partitions both sides exactly like any
    * shuffle join. The DuckDB oracle runs the naive theta form (its
    * IEJoin handles it) — same answer, opposite asymptotics.
    */
  private def q256(s: SparkSession, dir: String): DataFrame = {
    val iv = Tables.load(s, dir, "orders")
      .select(col("o_custkey").as("ck"), col("o_orderkey").as("id"),
        datediff(col("o_orderdate"), lit("1970-01-01")).as("sd"))
    // integer `div`, not `/` (Spark `/` is double division)
    val tiled = iv.withColumn("tile",
      explode(sequence(
        call_function("div", col("sd").cast("long"), lit(IvDays.toLong)),
        call_function("div", (col("sd") + lit(IvDays - 1)).cast("long"),
          lit(IvDays.toLong)))))
    val pairs = tiled
      .join(tiled.select(col("ck"), col("id").as("id2"),
        col("sd").as("sd2"), col("tile")), Seq("ck", "tile"))
      .filter(col("id") < col("id2"))
      .select("ck", "id", "id2", "sd", "sd2").distinct()
      .filter(col("sd") < col("sd2") + IvDays &&
        col("sd2") < col("sd") + IvDays)
    val perCust = iv.select(col("ck")).distinct()
      .join(pairs.groupBy("ck").agg(count(lit(1)).as("n_overlaps")),
        Seq("ck"), "left")
      .select(col("ck"), coalesce(col("n_overlaps"), lit(0L)).as("n_overlaps"))
    perCust.groupBy("n_overlaps")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("n_overlaps")
  }

  /** q331 — VARIABLE-WIDTH interval-overlap join written NAIVELY. Each
    * order carries a fulfillment window of 30–89 days (width keyed off
    * the order id — real windows vary), and the query counts, per
    * customer, how many of their order-window PAIRS overlap — the q256
    * rollup, but with per-row widths no fixed-width band can express
    * and the join spelled as the raw theta condition
    * `s₁ ≤ e₂ ∧ s₂ ≤ e₁`. [[graft.plans.BandJoinBlocking]]'s
    * interval-overlap arm (round 8) plans it: both sides EXPLODE into
    * the tiles their [min, max] span touches, candidates meet on
    * (customer, tile), and the canonical-tile residual
    * `tile == floorDiv(max(s₁, s₂), B)` keeps each qualifying pair
    * exactly once — q256's manual construction, promoted to an engine
    * capability for endpoints the manual form can't fix at plan time.
    * At gate SFs the sides are broadcastable so the join executes as a
    * broadcast nested loop (the arm's own stand-down); BandRuleSpec
    * pins the forced rewrite's exact bag.
    */
  private def q331(s: SparkSession, dir: String): DataFrame = {
    val iv = Tables.load(s, dir, "orders")
      .select(col("o_custkey").as("ck"), col("o_orderkey").as("id"),
        col("o_orderdate").cast("date").as("sd"))
      .withColumn("ed", expr(
        "date_add(sd, cast(pmod(id, 60) + 30 as int))"))
    val b = iv.select(col("ck").as("ck2"), col("id").as("id2"),
      col("sd").as("sd2"), col("ed").as("ed2"))
    val pairs = iv.join(b,
      col("ck") === col("ck2") && col("id") < col("id2") &&
        col("sd") <= col("ed2") && col("sd2") <= col("ed"))
    val perCust = iv.select(col("ck")).distinct()
      .join(pairs.groupBy("ck").agg(count(lit(1)).as("n_overlaps")),
        Seq("ck"), "left")
      .select(col("ck"),
        coalesce(col("n_overlaps"), lit(0L)).as("n_overlaps"))
    perCust.groupBy("n_overlaps")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("n_overlaps")
  }

  /** q337 — NEAR-DATED ORDER PAIRS via the `abs(datediff(…)) ≤ k`
    * spelling: per customer, pairs of orders placed within ±2 days of
    * each other — duplicate-submission screening, written as the raw
    * absolute-difference theta condition users actually type. Round 8
    * (second session) taught [[graft.plans.BandJoinBlocking]] the
    * DIFFERENCE spellings: `x − y cmp lit`, `datediff(a, b) cmp lit`,
    * `ts₁ − ts₂ cmp INTERVAL`, and `abs(diff) ≤ lit` — each expands to
    * the endpoint comparisons the band matcher already normalizes, so
    * the day-bucket equi-join plan and the user equi key compose
    * exactly as in the canonical as-of shape. At gate SFs the sides
    * broadcast (the rule's own stand-down: hash join on ck + cheap
    * residual wins); BandRuleSpec pins the forced rewrite's exact bag.
    */
  private def q337(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .select(col("o_custkey").as("ck"), col("o_orderkey").as("id"),
        col("o_orderdate").cast("date").as("d"))
    val b = o.select(col("ck").as("ck2"), col("id").as("id2"),
      col("d").as("d2"))
    o.join(b, col("ck") === col("ck2") && col("id") < col("id2") &&
        abs(datediff(col("d"), col("d2"))) <= 2)
      .select(col("ck"), col("id"), col("id2"),
        datediff(col("d2"), col("d")).as("day_gap"))
      .orderBy("ck", "id", "id2")
  }

  /** q257 — exact weighted quartiles (weight = quantity) of the lineitem
    * price per return flag, in ONE partitioned window pass: cumulative
    * weight in deterministic (price, orderkey, linenumber) order, then
    * each quartile is the min price whose cumulative weight crosses the
    * k·W⁄4 threshold (lower weighted quantile — rank selection, never
    * interpolation, so the value is an untouched input double). The
    * window partitions by group (parallel across groups); the group total
    * is a full-frame window over the SAME partitioning, so the whole
    * query is one scan and one exchange (pinned in PlanShapeSpec).
    * Weighted quantiles are what token-weighted
    * corpus stats need — q226's unweighted deciles cannot see that one
    * 10⁶-token document outweighs a thousand stubs.
    */
  private def q257(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_returnflag").as("g"),
        col("l_extendedprice").as("price"),
        col("l_quantity").cast("long").as("w"),
        col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
    val cum = li.withColumn("cumw", sum("w").over(
      Window.partitionBy("g").orderBy(col("price"), col("ok"), col("ln"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total_w", sum("w").over(Window.partitionBy("g")))
    cum.groupBy("g").agg(
      max("total_w").as("total_w"),
      min(when(col("cumw") * 4 >= col("total_w"), col("price"))).as("p25"),
      min(when(col("cumw") * 2 >= col("total_w"), col("price"))).as("p50"),
      min(when(col("cumw") * 4 >= col("total_w") * 3, col("price")))
        .as("p75"))
      .orderBy("g")
  }

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] =
    Seq(
      "q256_interval_overlap" -> q256 _,
      "q331_variable_intervals" -> q331 _,
      "q337_near_dated_orders" -> q337 _,
      "q257_weighted_quartiles" -> q257 _)

  override val oracle: Seq[(String, String)] = Seq(
    "q256_interval_overlap" ->
      s"""WITH iv AS (
         | SELECT o_custkey AS ck, o_orderkey AS id,
         |  date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         |    AS sd
         | FROM orders),
         |p AS (
         | SELECT a.ck, count(*) AS n_overlaps
         | FROM iv a JOIN iv b ON a.ck = b.ck AND a.id < b.id
         |  AND a.sd < b.sd + $IvDays AND b.sd < a.sd + $IvDays
         | GROUP BY a.ck),
         |per_cust AS (
         | SELECT c.ck, coalesce(p.n_overlaps, 0) AS n_overlaps
         | FROM (SELECT DISTINCT ck FROM iv) c
         | LEFT JOIN p ON c.ck = p.ck)
         |SELECT CAST(n_overlaps AS BIGINT) AS n_overlaps,
         | CAST(count(*) AS BIGINT) AS n_customers
         |FROM per_cust GROUP BY n_overlaps ORDER BY n_overlaps""".stripMargin,
    "q331_variable_intervals" ->
      """WITH iv AS (
        | SELECT o_custkey AS ck, o_orderkey AS id,
        |  CAST(o_orderdate AS DATE) AS sd,
        |  CAST(o_orderdate AS DATE)
        |    + CAST(id % 60 + 30 AS INTEGER) AS ed
        | FROM orders),
        |p AS (
        | SELECT a.ck, count(*) AS n_overlaps
        | FROM iv a JOIN iv b ON a.ck = b.ck AND a.id < b.id
        |  AND a.sd <= b.ed AND b.sd <= a.ed
        | GROUP BY a.ck),
        |per_cust AS (
        | SELECT c.ck, coalesce(p.n_overlaps, 0) AS n_overlaps
        | FROM (SELECT DISTINCT ck FROM iv) c
        | LEFT JOIN p ON c.ck = p.ck)
        |SELECT CAST(n_overlaps AS BIGINT) AS n_overlaps,
        | CAST(count(*) AS BIGINT) AS n_customers
        |FROM per_cust GROUP BY n_overlaps ORDER BY n_overlaps""".stripMargin,
    "q337_near_dated_orders" ->
      """WITH o AS (
        | SELECT o_custkey AS ck, o_orderkey AS id,
        |  CAST(o_orderdate AS DATE) AS d
        | FROM orders)
        |SELECT a.ck, a.id, b.id AS id2,
        | CAST(date_diff('day', a.d, b.d) AS INT) AS day_gap
        |FROM o a JOIN o b ON a.ck = b.ck AND a.id < b.id
        | AND abs(date_diff('day', a.d, b.d)) <= 2
        |ORDER BY a.ck, a.id, id2""".stripMargin,
    "q257_weighted_quartiles" ->
      """WITH li AS (
        | SELECT l_returnflag AS g, l_extendedprice AS price,
        |  CAST(l_quantity AS BIGINT) AS w,
        |  l_orderkey AS ok, l_linenumber AS ln
        | FROM lineitem),
        |cum AS (
        | SELECT g, price,
        |  CAST(sum(w) OVER (PARTITION BY g) AS BIGINT) AS total_w,
        |  sum(w) OVER (PARTITION BY g ORDER BY price, ok, ln
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
        | FROM li)
        |SELECT g, max(total_w) AS total_w,
        | min(CASE WHEN cumw * 4 >= total_w THEN price END) AS p25,
        | min(CASE WHEN cumw * 2 >= total_w THEN price END) AS p50,
        | min(CASE WHEN cumw * 4 >= total_w * 3 THEN price END) AS p75
        |FROM cum GROUP BY g ORDER BY g""".stripMargin)
}
