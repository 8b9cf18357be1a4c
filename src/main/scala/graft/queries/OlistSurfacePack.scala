package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Tables
import graft.queries.TrainingPipelinePack.md5Hash32

/** Testdata-oracle analogs for the last named-but-unqueried reference
  * tables (reference README.md:54-62: sellers, geolocation, payments,
  * reviews, category translation — declared as inputs, never queried).
  * [[graft.etl.Olist]] ingests the tables themselves on the reference
  * schema (golden-tested in OlistPipelineSpec); this pack re-expresses
  * each table's natural analytics shape on the driver testdata so every
  * shape also runs under the DuckDB correctness gate:
  *
  *   - sellers → supplier/nation: revenue rollup by seller state (q246).
  *   - geolocation → deterministic per-nation coordinates: distance
  *     bucketing between customer and supplier geographies (q247).
  *   - payments → events: payment-type mix with share-of-total (q248).
  *   - reviews → md5-derived 1–5 scores at order grain: score profile +
  *     NPS per priority class (q249).
  *   - translation → a partial brand→english mapping dim: broadcast
  *     left join + coalesce fallback, revenue by final name (q250).
  *
  * Scale notes: q246/q250 broadcast their dims onto one fact scan;
  * q247 reduces the fact to the ≤ 25×25 nation-pair grid BEFORE any
  * coordinate math (the aggregate-then-enrich discipline — geometry
  * runs on the grid, never per fact row); q248/q249 are one
  * partial-agg shuffle each. Geometry is planar squared distance in
  * exact integer micro-degrees: haversine's libm trig is not bit-stable
  * across engines (QueryPack float doctrine), and for BUCKETING the
  * monotone planar surrogate picks identical buckets either way.
  */
object OlistSurfacePack extends QueryPack {

  private def rev: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** q246 — revenue rollup by seller geography (Olist.revenueBySellerState
    * on testdata: supplier ⋈ nation stands in for seller ⋈ state).
    */
  private def q246(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .select(col("l_suppkey"), rev.as("r"))
      .join(broadcast(Tables.load(s, dir, "supplier")
        .select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.load(s, dir, "nation")
        .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("seller_state"))
      .agg(moneySum2(col("r")).as("revenue"),
        countDistinct("s_suppkey").as("n_sellers"))
      .orderBy(col("revenue").desc, col("seller_state"))

  // Deterministic per-nation coordinates in exact integer micro-degrees
  // (the geolocation-centroid stand-in: nation keys play zip prefixes).
  private def latE6(k: Column): Column =
    md5Hash32(k, "lat") % 180000000L - 90000000L
  private def lngE6(k: Column): Column =
    md5Hash32(k, "lng") % 360000000L - 180000000L

  /** q247 — customer↔supplier geography distance buckets: how far do
    * goods travel? The fact reduces to the (c_nation, s_nation) pair grid
    * first; squared planar distance (exact int64, < 2.6e17) buckets by
    * integer division on the ≤ 625-row grid.
    */
  private def q247(s: SparkSession, dir: String): DataFrame = {
    val ordNation = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
    val grid = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(broadcast(Tables.load(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(ordNation, col("l_orderkey") === col("o_orderkey"))
      .groupBy("c_nationkey", "s_nationkey")
      .agg(count(lit(1)).as("n_items"))
    grid
      .withColumn("dx",
        latE6(col("c_nationkey")) - latE6(col("s_nationkey")))
      .withColumn("dy",
        lngE6(col("c_nationkey")) - lngE6(col("s_nationkey")))
      .withColumn("bucket", call_function("div",
        col("dx") * col("dx") + col("dy") * col("dy"),
        lit(10000000000000000L)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_pairs"), sum("n_items").as("n_items"))
      .orderBy("bucket")
  }

  /** q248 — payment-type mix (Olist.paymentMix on testdata: event_type
    * plays payment_type, value the payment amount): count, exact-cents
    * total, distinct payers, share-of-total via the q27 `100.0·x/y`
    * exact-long double sequence.
    */
  private def q248(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("event_type").as("payment_type"), col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
    val tot = ev.agg(sum("cents").as("total_cents"))
    ev.groupBy("payment_type")
      .agg(count(lit(1)).as("n_payments"),
        sum("cents").as("c"),
        countDistinct("user_id").as("n_payers"))
      .crossJoin(broadcast(tot))
      .select(col("payment_type"), col("n_payments"),
        (col("c") / lit(100.0)).as("total_value"),
        col("n_payers"),
        (lit(100.0) * col("c") / col("total_cents")).as("pct_of_total"))
      .orderBy(col("total_value").desc, col("payment_type"))
  }

  /** q249 — review-score profile per order-priority class
    * (Olist.reviewScoreByCategory's aggregation on testdata): scores are
    * the md5 ladder 1–5 at order grain (the F6 random-choice discipline —
    * deterministic, replicated term-for-term in the oracle); average and
    * NPS (promoters ≥ 4 minus detractors ≤ 2) are exact-long ratios
    * through one double division each.
    */
  private def q249(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(col("o_orderpriority").as("priority"),
        (md5Hash32(col("o_orderkey"), "rev") % 5 + 1).as("score"))
      .groupBy("priority")
      .agg(count(lit(1)).as("n_reviews"),
        sum("score").as("ss"),
        sum(when(col("score") >= 4, 1L).otherwise(0L)).as("np"),
        sum(when(col("score") <= 2, 1L).otherwise(0L)).as("nd"))
      .select(col("priority"), col("n_reviews"),
        (col("ss").cast("double") / col("n_reviews")).as("avg_score"),
        (lit(100.0) * (col("np") - col("nd")) / col("n_reviews"))
          .as("nps_pct"))
      .orderBy("priority")

  /** q250 — category-translation join (Olist.dimProductTranslated on
    * testdata): a PARTIAL brand→english mapping dim (brands with even
    * md5 parity — partiality is the point: the untranslated tail must
    * fall back) broadcast-left-joins onto the product dim; revenue rolls
    * up by the coalesced final name.
    */
  private def q250(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"))
    val mapping = part.select("p_brand").distinct()
      .filter(md5Hash32(col("p_brand"), "tr") % 2 === 0)
      .withColumn("brand_en", concat(lit("EN "), upper(col("p_brand"))))
    Tables.load(s, dir, "lineitem")
      .select(col("l_partkey"), rev.as("r"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(mapping), Seq("p_brand"), "left")
      .groupBy(coalesce(col("brand_en"), col("p_brand")).as("category"))
      .agg(moneySum2(col("r")).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("category")
  }

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] =
    Seq(
      "q246_seller_state_revenue" -> q246 _,
      "q247_geo_distance_buckets" -> q247 _,
      "q248_payment_mix" -> q248 _,
      "q249_review_scores" -> q249 _,
      "q250_category_translation" -> q250 _)

  private def duckU32(id: String, salt: String): String =
    s"CAST('0x' || substring(md5('$salt|' || CAST($id AS VARCHAR)), 1, 8) AS BIGINT)"

  private def duckLat(k: String): String =
    s"${duckU32(k, "lat")} % 180000000 - 90000000"
  private def duckLng(k: String): String =
    s"${duckU32(k, "lng")} % 360000000 - 180000000"

  override val oracle: Seq[(String, String)] = Seq(
    "q246_seller_state_revenue" ->
      """SELECT n_name AS seller_state,
        | ((CASE WHEN sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 10000) AS BIGINT)) >= 0 THEN (sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 10000) AS BIGINT)) + 50) - (sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 10000) AS BIGINT)) + 50) % 100 ELSE -((-sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 10000) AS BIGINT)) + 50) - (-sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 10000) AS BIGINT)) + 50) % 100) END) / 10000.0) AS revenue,
        | CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_sellers
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY revenue DESC, seller_state""".stripMargin,
    "q247_geo_distance_buckets" ->
      s"""WITH grid AS (
         | SELECT c_nationkey AS cn, s_nationkey AS sn,
         |  CAST(count(*) AS BIGINT) AS n_items
         | FROM lineitem
         | JOIN supplier ON l_suppkey = s_suppkey
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         | GROUP BY 1, 2),
         |d AS (
         | SELECT n_items,
         |  (${duckLat("cn")}) - (${duckLat("sn")}) AS dx,
         |  (${duckLng("cn")}) - (${duckLng("sn")}) AS dy
         | FROM grid)
         |SELECT (dx * dx + dy * dy) // 10000000000000000 AS bucket,
         | CAST(count(*) AS BIGINT) AS n_pairs,
         | CAST(sum(n_items) AS BIGINT) AS n_items
         |FROM d GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q248_payment_mix" ->
      """WITH ev AS (
        | SELECT event_type AS payment_type, user_id,
        |  CAST(round(value * 100) AS BIGINT) AS cents
        | FROM events),
        |tot AS (SELECT sum(cents) AS total_cents FROM ev)
        |SELECT payment_type, CAST(count(*) AS BIGINT) AS n_payments,
        | sum(cents) / 100.0 AS total_value,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS n_payers,
        | 100.0 * sum(cents) / (SELECT total_cents FROM tot) AS pct_of_total
        |FROM ev GROUP BY payment_type
        |ORDER BY total_value DESC, payment_type""".stripMargin,
    "q249_review_scores" ->
      s"""WITH r AS (
         | SELECT o_orderpriority AS priority,
         |  ${duckU32("o_orderkey", "rev")} % 5 + 1 AS score
         | FROM orders)
         |SELECT priority, CAST(count(*) AS BIGINT) AS n_reviews,
         | CAST(sum(score) AS DOUBLE) / count(*) AS avg_score,
         | 100.0 * (sum(CASE WHEN score >= 4 THEN 1 ELSE 0 END)
         |   - sum(CASE WHEN score <= 2 THEN 1 ELSE 0 END)) / count(*)
         |   AS nps_pct
         |FROM r GROUP BY priority ORDER BY priority""".stripMargin,
    "q250_category_translation" ->
      s"""WITH mapping AS (
         | SELECT p_brand, 'EN ' || upper(p_brand) AS brand_en
         | FROM (SELECT DISTINCT p_brand FROM part)
         | WHERE ${duckU32("p_brand", "tr")} % 2 = 0)
         |SELECT coalesce(m.brand_en, p.p_brand) AS category,
         | ((CASE WHEN sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 10000) AS BIGINT)) >= 0 THEN (sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 10000) AS BIGINT)) + 50) - (sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 10000) AS BIGINT)) + 50) % 100 ELSE -((-sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 10000) AS BIGINT)) + 50) - (-sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 10000) AS BIGINT)) + 50) % 100) END) / 10000.0) AS revenue,
         | CAST(count(*) AS BIGINT) AS n_items
         |FROM lineitem
         |JOIN part p ON l_partkey = p_partkey
         |LEFT JOIN mapping m ON p.p_brand = m.p_brand
         |GROUP BY 1 ORDER BY category""".stripMargin)
}
