package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.catalog.Tables

/** TPC-DS-flavor reporting shapes over the star schema: multi-measure
  * rollup reports, year-over-year comparison, single-scan band censuses,
  * and rank-within-hierarchy-level top-k. These compose the verified
  * primitives (rollup/grouping-sets q35/q39, conditional agg q86, windows
  * q40-q48) into the wide "reporting workload" query family the reference's
  * Gold zone serves to BI (SURVEY.md §3 E3).
  *
  * Scale doctrine shared by all four: ONE pass over the fact table,
  * dimensions broadcast, aggregation first at the finest grain and every
  * derived view (subtotal row, prior-year value, in-level rank) computed
  *  AFTER the reduction — the post-agg frames are orders of magnitude
  * smaller than the fact, so windows/self-comparisons there are free.
  * Money follows the exact integer 10⁻⁴-unit doctrine (q86/q118): sums
  * are bit-reproducible across engines, partition counts, and retries.
  */
object ReportingPack extends QueryPack {

  private def rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private def revE4 = round(rev * 10000).cast("long")

  /** Fact lines with supplier-side geography attached: lineitem joined to
    * broadcast supplier→nation→region chain (the shared star spine of
    * q147/q150). Cheap to re-derive per query — each gets its own pruned
    * column set, so sharing a cached copy would widen both scans.
    */
  private def geoLines(s: SparkSession, dir: String): DataFrame = {
    val geo = Tables.load(s, dir, "supplier")
      .join(Tables.load(s, dir, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.load(s, dir, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("n_name"), col("r_name"))
    Tables.load(s, dir, "lineitem")
      .select("l_suppkey", "l_extendedprice", "l_discount", "l_returnflag",
        "l_shipdate")
      .join(broadcast(geo), col("l_suppkey") === col("s_suppkey"))
  }

  /** q147 — TPC-DS Q5/Q77-flavor channel report: gross revenue, returned
    * revenue, and line count per (region, ship-year) with ROLLUP subtotals
    * ((region, year) → (region) → grand total), levels labeled by
    * grouping_id. The returns "channel" is carved out of the same scan by
    * conditional aggregation (l_returnflag = 'R'), not a second join
    * branch — one fact pass feeds all measures at every level.
    *
    * Two-phase rollup: Spark plans ROLLUP as an Expand (×3 row copies)
    * UNDER the aggregate — naively that expands every fact line. All
    * measures here are algebraic (sums of exact integer units, counts),
    * so the fact reduces to the (region, year) grain FIRST and the
    * Expand runs over that few-dozen-row frame instead. PlanShapeSpec
    * pins Expand-above-fact-agg.
    */
  private def q147(s: SparkSession, dir: String): DataFrame = {
    val detail = geoLines(s, dir)
      .withColumn("yr", year(col("l_shipdate")))
      .groupBy("r_name", "yr")
      .agg(
        sum(revE4).as("g_e4"),
        sum(when(col("l_returnflag") === "R", revE4).otherwise(0L))
          .as("ret_e4"),
        count(lit(1)).as("n"))
    detail
      .rollup(col("r_name"), col("yr"))
      .agg(
        (sum("g_e4") / 10000.0).as("gross_revenue"),
        (sum("ret_e4") / 10000.0).as("returned_revenue"),
        sum("n").as("n_lines"),
        // grouping_id() is only resolvable inside the rollup's own agg
        grouping_id().cast("int").as("lvl"))
      .select("lvl", "r_name", "yr", "gross_revenue", "returned_revenue",
        "n_lines")
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("yr"))
  }

  /** q148 — TPC-DS Q75-flavor year-over-year movement: revenue per
    * (brand, ship-year) compared to the brand's prior year via `lag` over
    * the AGGREGATED grain — no fact self-join (TPC-DS's formulation joins
    * this-year to last-year; the lag form is one window over ~|brands|×
    * |years| rows). Delta in exact 10⁻⁴ units; first year per brand is
    * excluded (no prior to compare).
    */
  private def q148(s: SparkSession, dir: String): DataFrame = {
    val byYear = Tables.load(s, dir, "part").select("p_partkey", "p_brand")
      .join(Tables.load(s, dir, "lineitem")
          .select("l_partkey", "l_extendedprice", "l_discount", "l_shipdate"),
        col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"), year(col("l_shipdate")).as("yr"))
      .agg(sum(revE4).as("rev_e4"))
    val w = Window.partitionBy("p_brand").orderBy("yr")
    byYear
      .withColumn("prev_e4", lag(col("rev_e4"), 1).over(w))
      .filter(col("prev_e4").isNotNull)
      .select(col("p_brand"), col("yr"),
        (col("rev_e4") / 10000.0).as("revenue"),
        (col("prev_e4") / 10000.0).as("prev_revenue"),
        ((col("rev_e4") - col("prev_e4")) / 10000.0).as("yoy_delta"))
      .orderBy("p_brand", "yr")
  }

  /** q149 — TPC-DS Q88-flavor single-scan band census: event traffic per
    * 3-hour time-of-day band × purchase/other split, as ONE row of 16
    * conditional counts from ONE scan. TPC-DS expresses this as 8
    * self-joined subqueries; the conditional-aggregation form reads the
    * fact once and keeps every counter in the same partial-agg buffer —
    * at 100 TB that is 8× less IO and zero joins.
    */
  private def q149(s: SparkSession, dir: String): DataFrame = {
    val h = hour(Tables.tsMicros(col("ts")))
    val isPurchase = col("event_type") === "purchase"
    val bands = (0 until 8).map { b =>
      val in = h >= b * 3 && h < (b + 1) * 3
      Seq(
        sum(when(in && isPurchase, 1L).otherwise(0L))
          .as(f"purch_h${b * 3}%02d"),
        sum(when(in && !isPurchase, 1L).otherwise(0L))
          .as(f"other_h${b * 3}%02d"))
    }
    Tables.load(s, dir, "events")
      .agg(bands.flatten.head, bands.flatten.tail: _*)
  }

  /** q150 — TPC-DS Q67-flavor hierarchy top-k: revenue rolled up over
    * (region, nation), then rank WITHIN each grouping level (detail /
    * region subtotal / grand total) and keep each level's top 5. The
    * window runs over the post-rollup frame (≤ |regions|×|nations| + a
    * handful of subtotal rows) — never over fact rows.
    */
  private def q150(s: SparkSession, dir: String): DataFrame = {
    // same two-phase rollup as q147: reduce to (region, nation) grain
    // before the Expand triples the rows
    val rolled = geoLines(s, dir)
      .groupBy("r_name", "n_name")
      .agg(sum(revE4).as("d_e4"))
      .rollup(col("r_name"), col("n_name"))
      .agg(sum("d_e4").as("rev_e4"), grouping_id().cast("int").as("lvl"))
    val w = Window.partitionBy("lvl")
      .orderBy(col("rev_e4").desc, asc_nulls_first("r_name"),
        asc_nulls_first("n_name"))
    rolled
      .withColumn("rnk", rank().over(w).cast("int"))
      .filter(col("rnk") <= 5)
      .select(col("lvl"), col("r_name"), col("n_name"),
        (col("rev_e4") / 10000.0).as("revenue"), col("rnk"))
      .orderBy(col("lvl"), col("rnk"),
        asc_nulls_first("r_name"), asc_nulls_first("n_name"))
  }

  /** q151 — CUBE over (return flag × order priority): every margin of the
    * 2-D contingency table from one pass, completing the grouping-family
    * API surface (q35 ROLLUP, q39 GROUPING SETS). CUBE expands ×4 — run
    * over the pre-aggregated (flag, priority) grain like q147/q150.
    */
  private def q151(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem").select("l_orderkey", "l_returnflag",
        "l_quantity")
      .join(Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag", "o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .cube(col("l_returnflag"), col("o_orderpriority"))
      .agg(sum("n").as("cnt"), sum("q").as("sum_qty"),
        grouping_id().cast("int").as("gid"))
      .select("gid", "l_returnflag", "o_orderpriority", "cnt", "sum_qty")
      .orderBy(col("gid"), asc_nulls_first("l_returnflag"),
        asc_nulls_first("o_orderpriority"))

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] =
    Seq(
      "q147_geo_rollup_report" -> q147 _,
      "q148_yoy_brand_movement" -> q148 _,
      "q149_time_band_census" -> q149 _,
      "q150_hierarchy_topk" -> q150 _,
      "q151_cube_margins" -> q151 _)

  override val oracle: Seq[(String, String)] = Seq(
    "q147_geo_rollup_report" ->
      """WITH geo AS (
        | SELECT s.s_suppkey, r.r_name
        | FROM supplier s
        | JOIN nation n ON s.s_nationkey = n.n_nationkey
        | JOIN region r ON n.n_regionkey = r.r_regionkey)
        |SELECT CAST(GROUPING(g.r_name, year(l.l_shipdate)) AS INT) AS lvl,
        | g.r_name, CAST(year(l.l_shipdate) AS INT) AS yr,
        | sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 10000)
        |   AS BIGINT)) / 10000.0 AS gross_revenue,
        | sum(CASE WHEN l.l_returnflag = 'R'
        |   THEN CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 10000)
        |     AS BIGINT) ELSE 0 END) / 10000.0 AS returned_revenue,
        | count(*) AS n_lines
        |FROM lineitem l JOIN geo g ON l.l_suppkey = g.s_suppkey
        |GROUP BY ROLLUP (g.r_name, year(l.l_shipdate))
        |ORDER BY g.r_name ASC NULLS FIRST, yr ASC NULLS FIRST""".stripMargin,
    "q148_yoy_brand_movement" ->
      """WITH by_year AS (
        | SELECT p.p_brand, CAST(year(l.l_shipdate) AS INT) AS yr,
        |  sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 10000)
        |    AS BIGINT)) AS rev_e4
        | FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        | GROUP BY 1, 2),
        |lagged AS (
        | SELECT p_brand, yr, rev_e4,
        |  lag(rev_e4) OVER (PARTITION BY p_brand ORDER BY yr) AS prev_e4
        | FROM by_year)
        |SELECT p_brand, yr,
        | rev_e4 / 10000.0 AS revenue,
        | prev_e4 / 10000.0 AS prev_revenue,
        | (rev_e4 - prev_e4) / 10000.0 AS yoy_delta
        |FROM lagged WHERE prev_e4 IS NOT NULL
        |ORDER BY p_brand, yr""".stripMargin,
    "q149_time_band_census" -> {
      val cols = (0 until 8).flatMap { b =>
        Seq(
          f"""CAST(sum(CASE WHEN hour(ts) >= ${b * 3} AND hour(ts) < ${(b + 1) * 3}
             | AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
             | AS purch_h${b * 3}%02d""".stripMargin.replace("\n", ""),
          f"""CAST(sum(CASE WHEN hour(ts) >= ${b * 3} AND hour(ts) < ${(b + 1) * 3}
             | AND event_type <> 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
             | AS other_h${b * 3}%02d""".stripMargin.replace("\n", ""))
      }
      s"SELECT ${cols.mkString(", ")} FROM events"
    },
    "q150_hierarchy_topk" ->
      """WITH geo AS (
        | SELECT s.s_suppkey, n.n_name, r.r_name
        | FROM supplier s
        | JOIN nation n ON s.s_nationkey = n.n_nationkey
        | JOIN region r ON n.n_regionkey = r.r_regionkey),
        |rolled AS (
        | SELECT CAST(GROUPING(g.r_name, g.n_name) AS INT) AS lvl,
        |  g.r_name, g.n_name,
        |  sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 10000)
        |    AS BIGINT)) AS rev_e4
        | FROM lineitem l JOIN geo g ON l.l_suppkey = g.s_suppkey
        | GROUP BY ROLLUP (g.r_name, g.n_name)),
        |ranked AS (
        | SELECT lvl, r_name, n_name, rev_e4,
        |  CAST(rank() OVER (PARTITION BY lvl ORDER BY rev_e4 DESC,
        |    r_name ASC NULLS FIRST, n_name ASC NULLS FIRST) AS INT) AS rnk
        | FROM rolled)
        |SELECT lvl, r_name, n_name, rev_e4 / 10000.0 AS revenue, rnk
        |FROM ranked WHERE rnk <= 5
        |ORDER BY lvl, rnk, r_name ASC NULLS FIRST,
        |  n_name ASC NULLS FIRST""".stripMargin,
    "q151_cube_margins" ->
      """SELECT CAST(GROUPING(l.l_returnflag, o.o_orderpriority) AS INT)
        |   AS gid,
        | l.l_returnflag, o.o_orderpriority,
        | count(*) AS cnt, sum(l.l_quantity) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY CUBE (l.l_returnflag, o.o_orderpriority)
        |ORDER BY gid, l.l_returnflag ASC NULLS FIRST,
        |  o.o_orderpriority ASC NULLS FIRST""".stripMargin)
}
