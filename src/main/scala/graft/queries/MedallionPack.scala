package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.Medallion

/** End-to-end medallion-pipeline queries: the generated clickstream runs
  * bronze(CSV) → silver(clean) → gold(star schema) via [[graft.etl.Medallion]]
  * and the reference's three analytics queries (README.md:357-402) run over
  * the gold zone — funnel, conversion-by-source, revenue-by-category.
  *
  * The oracle twins replicate the *generator arithmetic itself* in SQL
  * (pure BIGINT multiplicative hashing, see [[graft.gen.Clickstream.h]]) and
  * then apply the silver cleaning rules declaratively (dirt rows are never
  * generated instead of generated-then-dropped — same resulting relation).
  * So a single hash-drift anywhere in generate→write→read→clean→aggregate
  * fails the compare: this is the pipeline's golden test, driver-enforced.
  */
object MedallionPack extends QueryPack {

  /** q90 — the full silver (cleaned) event table. */
  private def q90(s: SparkSession, dir: String): DataFrame =
    Medallion.factEvents(s, dir).orderBy("event_id")

  /** q91 — reference funnel query (README.md:364-369). */
  private def q91(s: SparkSession, dir: String): DataFrame =
    Medallion.factEvents(s, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct("session_id").as("sessions"))
      .orderBy(col("sessions").desc, col("event_type"))

  /** q92 — reference conversion-by-traffic-source (README.md:373-389):
    * left join to the distinct purchasing-session set, `100.0 * x / y`
    * exactly as the reference (an exact-int ratio → bit-equal).
    */
  private def q92(s: SparkSession, dir: String): DataFrame = {
    val e = Medallion.factEvents(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("session_id").as("p_session_id")).distinct()
    e.join(purchases, e("session_id") === purchases("p_session_id"), "left")
      .groupBy("traffic_source")
      .agg(
        countDistinct("session_id").as("sessions"),
        countDistinct("p_session_id").as("purchase_sessions"))
      .withColumn("conversion_rate_pct",
        lit(100.0) * col("purchase_sessions") / col("sessions"))
      .orderBy("traffic_source")
  }

  /** q93 — reference revenue-by-category top-10 (README.md:393-402) over
    * the gold zone: purchase events → order lines → product dimension.
    * The dim side broadcasts; the purchase-event side is already a tiny
    * filtered slice of the fact table.
    */
  private def q93(s: SparkSession, dir: String): DataFrame = {
    val purchases = Medallion.factEvents(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("order_id"))
    val li = graft.catalog.Tables.load(s, dir, "lineitem")
    val p = graft.catalog.Tables.load(s, dir, "part")
      .select("p_partkey", "p_brand")
    purchases
      .join(li, col("order_id") === col("l_orderkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(moneySum2(col("l_extendedprice")).as("revenue"))
      .orderBy(col("revenue").desc, col("p_brand"))
      .limit(10)
  }

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q90_silver_events" -> q90 _,
    "q91_gold_funnel" -> q91 _,
    "q92_gold_conversion" -> q92 _,
    "q93_gold_revenue" -> q93 _)

  // ---- oracle: the generator + silver cleaning, in DuckDB SQL ----------

  /** h(salt, k) as SQL — same constants as [[graft.gen.Clickstream.h]]. */
  private def H(salt: Int, k: String): String =
    s"(($k % 1000003 + 1) * 2654435761 + $salt * 40503) % 1000000007"

  private val devices = "['mobile','desktop','tablet']"
  private val sources = "['direct','search','social','email']"

  /** CTE chain producing the cleaned (silver-equivalent) event relation. */
  private val silverCtes: String =
    s"""forders AS (
       |  SELECT o_orderkey AS k, o_custkey AS custkey,
       |    epoch_us(o_orderdate) // 1000000 AS odate_sec
       |  FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 20 = 0),
       |fitems AS (
       |  SELECT l_orderkey AS k,
       |    list(l_partkey ORDER BY l_linenumber, l_partkey) AS items
       |  FROM lineitem WHERE l_orderkey IN (SELECT k FROM forders)
       |  GROUP BY 1),
       |fo AS (
       |  SELECT f.k, f.custkey, i.items,
       |    CAST(1 + ${H(1, "f.k")} % 3 AS INT) AS n_views,
       |    f.odate_sec + ${H(2, "f.k")} % 86400 AS purchase_sec,
       |    ${H(3, "f.k")} AS hv,
       |    ${H(4, "f.k")} % 3 AS dev_i,
       |    ${H(5, "f.k")} % 4 AS src_i,
       |    CASE WHEN ${H(6, "f.k")} % 10 < 4 THEN 1 ELSE 0 END AS is_auth
       |  FROM forders f JOIN fitems i ON f.k = i.k),
       |fex AS (
       |  SELECT *, 4 + n_views AS n_events,
       |    unnest(generate_series(0, 3 + n_views)) AS i
       |  FROM fo),
       |fev AS (
       |  SELECT
       |    'e' || k || '-' || i AS event_id,
       |    's' || k AS session_id,
       |    CASE WHEN is_auth = 1 THEN CAST(custkey AS VARCHAR)
       |         ELSE '' END AS customer_id,
       |    CASE WHEN i = 0 THEN 'page_view'
       |         WHEN i <= n_views THEN 'view_product'
       |         WHEN i = n_views + 1 THEN 'add_to_cart'
       |         WHEN i = n_views + 2 THEN 'checkout'
       |         ELSE 'purchase' END AS event_type,
       |    make_timestamp((purchase_sec - 60 * (n_events - 1 - i)) * 1000000)
       |      AS event_ts,
       |    CASE WHEN i >= 1 AND i <= n_views
       |           THEN items[CAST((hv + i) % len(items) AS INT) + 1]
       |         WHEN i = n_views + 1
       |           THEN items[CAST(hv % len(items) AS INT) + 1]
       |         END AS product_id,
       |    CASE WHEN i >= n_views + 2 THEN k END AS order_id,
       |    $devices[CAST(dev_i AS INT) + 1] AS device_type,
       |    $sources[CAST(src_i AS INT) + 1] AS traffic_source,
       |    is_auth AS is_authenticated
       |  FROM fex),
       |bc AS (
       |  SELECT c_custkey AS c,
       |    CAST(2 + ${H(7, "c_custkey")} % 5 AS INT) AS steps,
       |    epoch_us(TIMESTAMP '1995-06-01 00:00:00') // 1000000
       |      + (${H(8, "c_custkey")} % 365) * 86400
       |      + ${H(9, "c_custkey")} % 86400 AS base_sec,
       |    ${H(12, "c_custkey")} % 3 AS dev_i,
       |    ${H(13, "c_custkey")} % 4 AS src_i,
       |    CASE WHEN ${H(14, "c_custkey")} % 10 < 4 THEN 1 ELSE 0 END
       |      AS is_auth
       |  FROM customer WHERE c_custkey % 5 = 0),
       |bex AS (
       |  SELECT *, unnest(generate_series(0, steps - 1)) AS j FROM bc),
       |bev AS (
       |  SELECT
       |    'b' || c || '-' || j AS event_id,
       |    'b' || c AS session_id,
       |    CASE WHEN is_auth = 1 THEN CAST(c AS VARCHAR) ELSE '' END
       |      AS customer_id,
       |    CASE WHEN ${H(10, "(c * 131 + j)")} % 2 = 1 THEN 'view_product'
       |         ELSE 'page_view' END AS event_type,
       |    make_timestamp((base_sec + 30 * j) * 1000000) AS event_ts,
       |    CASE WHEN ${H(10, "(c * 131 + j)")} % 2 = 1
       |         THEN ${H(11, "(c * 131 + j)")} % 200 + 1 END AS product_id,
       |    CAST(NULL AS BIGINT) AS order_id,
       |    $devices[CAST(dev_i AS INT) + 1] AS device_type,
       |    $sources[CAST(src_i AS INT) + 1] AS traffic_source,
       |    is_auth AS is_authenticated
       |  FROM bex
       |  WHERE NOT (j = 0 AND c % 53 = 0)
       |    AND NOT (j = 1 AND c % 97 = 0)),
       |silver AS (
       |  SELECT *, CAST(event_ts AS DATE) AS event_date FROM fev
       |  UNION ALL
       |  SELECT *, CAST(event_ts AS DATE) AS event_date FROM bev)""".stripMargin

  override val oracle: Seq[(String, String)] = Seq(
    "q90_silver_events" ->
      s"""WITH $silverCtes
         |SELECT * FROM silver ORDER BY event_id""".stripMargin,
    "q91_gold_funnel" ->
      s"""WITH $silverCtes
         |SELECT event_type, count(*) AS n_events,
         | count(DISTINCT session_id) AS sessions
         |FROM silver GROUP BY event_type
         |ORDER BY sessions DESC, event_type""".stripMargin,
    "q92_gold_conversion" ->
      s"""WITH $silverCtes,
         |purchases AS (
         |  SELECT DISTINCT session_id AS p_session_id FROM silver
         |  WHERE event_type = 'purchase')
         |SELECT traffic_source,
         | count(DISTINCT e.session_id) AS sessions,
         | count(DISTINCT p.p_session_id) AS purchase_sessions,
         | CAST(100.0 AS DOUBLE) * count(DISTINCT p.p_session_id)
         |   / count(DISTINCT e.session_id) AS conversion_rate_pct
         |FROM silver e LEFT JOIN purchases p
         |  ON e.session_id = p.p_session_id
         |GROUP BY traffic_source ORDER BY traffic_source""".stripMargin,
    "q93_gold_revenue" ->
      s"""WITH $silverCtes
         |SELECT p_brand, ((CASE WHEN sum(CAST(round((l_extendedprice) * 10000) AS BIGINT)) >= 0 THEN (sum(CAST(round((l_extendedprice) * 10000) AS BIGINT)) + 50) - (sum(CAST(round((l_extendedprice) * 10000) AS BIGINT)) + 50) % 100 ELSE -((-sum(CAST(round((l_extendedprice) * 10000) AS BIGINT)) + 50) - (-sum(CAST(round((l_extendedprice) * 10000) AS BIGINT)) + 50) % 100) END) / 10000.0) AS revenue
         |FROM (SELECT order_id FROM silver WHERE event_type = 'purchase') s
         | JOIN lineitem ON s.order_id = l_orderkey
         | JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand
         |ORDER BY revenue DESC, p_brand LIMIT 10""".stripMargin)
}
