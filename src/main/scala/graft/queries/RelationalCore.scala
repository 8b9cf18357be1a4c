package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Tables

/** Projections, filters, predicates, and scalar functions — SURVEY.md §2.2
  * (P1–P7) and §2.7 (F1–F9), re-targeted from the reference's Olist/clickstream
  * columns to the driver testdata schema (FIXTURES.md §A maps the analogs).
  *
  * Scale notes: every query here is a single parquet scan with narrow
  * projection + pushed predicates (verified via `.explain` — `PushedFilters`
  * and pruned `ReadSchema` reach `FileSourceScanExec`), so they parallelize
  * embarrassingly: no shuffle except the final presentation sort, which at
  * cluster scale is a range-partitioned `SortExec`, not a single-node sort.
  */
object RelationalCore extends QueryPack {

  /** P1+P6+P7+F2 — projection, alias, derived date column. Mirrors the
    * reference silver-layer select+withColumn (reference README.md:182-189).
    */
  private def q01(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(
        col("o_orderkey"),
        col("o_orderstatus").as("status"),
        to_date(col("o_orderdate")).as("order_date"))
      .orderBy("o_orderkey")

  /** P2 — equality filter (reference README.md:378 `WHERE event_type='purchase'`;
    * generate_clickstream.py:60 `order_status=="delivered"`).
    */
  private def q02(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber")

  /** P3 — null-drop predicates (reference generate_clickstream.py:60-62
    * dropna; README.md:464 "Removing duplicates and nulls").
    */
  private def q03(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .na.drop(Seq("l_shipdate", "l_orderkey"))
      .filter(col("l_returnflag").isNotNull)
      .select("l_orderkey", "l_linenumber", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")

  /** P5 — domain validation against an enum (reference README.md:75,223:
    * validate event_type against the 5-value set).
    */
  private def q04(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .filter(col("event_type").isin("view", "click", "purchase", "signup"))
      .select("event_id", "user_id", "event_type")
      .orderBy("event_id")

  /** P7+F2 — event_date derivation from the nanosecond event timestamp
    * (reference README.md:222,240). `ts` surfaces as BIGINT nanos; the edge
    * conversion is lossless (TESTDATA nanos are µs-aligned).
    */
  private def q05(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(
        col("event_id"),
        col("user_id"),
        to_date(Tables.tsMicros(col("ts"))).as("event_date"))
      .orderBy("event_id")

  /** A5 — key-based dedup with a *deterministic* survivor. The reference's
    * `dropDuplicates(["order_id"])` (README.md:190) keeps an arbitrary row;
    * for an oracle-checkable result we keep the first by (date, key) —
    * the idiomatic scalable form: one hash-shuffle on the key, rank, filter.
    */
  private def q06(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.load(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_orderdate")
      .orderBy("o_custkey")
  }

  /** A4 — DISTINCT to a set (reference README.md:376-379 purchases CTE;
    * generate_clickstream.py:76-77 `.unique()`).
    */
  private def q07(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** F1 — lenient timestamp parse, null on error (reference
    * generate_clickstream.py:56-59 `errors="coerce"`). Half the rows carry a
    * parseable literal, half carry garbage (`source` strings) → NULL.
    */
  private def q08(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(
        col("doc_id"),
        try_to_timestamp(
          when(col("doc_id") % 2 === 0, lit("2024-03-15 12:00:00"))
            .otherwise(col("source"))).as("parsed_ts"))
      .orderBy("doc_id")

  /** String functions over `part` (covers the reference's string-typed id /
    * category columns; upper/lower/substr/concat/trim/length).
    */
  private def q09(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        lower(col("p_type")).as("type_l"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 10).as("name10"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        trim(col("p_name")).as("name_trim"))
      .orderBy("p_partkey")

  /** Math functions. Row-level doubles are emitted raw (bit-equal across
    * engines, see QueryPack scaladoc); ceil/floor cast to BIGINT to match
    * Spark's long-returning ceil(double).
    */
  private def q10(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        ceil(col("l_quantity")).as("qty_ceil"),
        floor(col("l_quantity")).as("qty_floor"),
        (col("l_extendedprice") * col("l_discount")).as("disc_amount"),
        sqrt(col("l_quantity")).as("qty_sqrt"))
      .orderBy("l_orderkey", "l_linenumber")

  /** F9 + date-part extraction — timestamp→ISO string (reference
    * generate_clickstream.py:101 `isoformat(sep=" ")`), year/month/day parts.
    */
  private def q11(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("iso_ts"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"))
      .orderBy("o_orderkey")

  /** F4 — timestamp ± interval (reference generate_clickstream.py:136-214
    * timedelta arithmetic).
    */
  private def q12(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(
        col("o_orderkey"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_ts"),
        (col("o_orderdate") - expr("INTERVAL 90 MINUTES")).as("cutoff_ts"))
      .orderBy("o_orderkey")

  /** F7+F8 — coalesce-to-empty-string and boolean→int flag (reference
    * generate_clickstream.py:99-108).
    */
  private def q13(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer")
      .select(
        col("c_custkey"),
        coalesce(col("c_mktsegment"), lit("")).as("segment"),
        when(col("c_acctbal") > 0, 1).otherwise(0).as("is_positive"))
      .orderBy("c_custkey")

  /** O4 analog — deterministic systematic sample (key mod N). The reference's
    * seeded `sample(n=..., random_state=42)` (generate_clickstream.py:70-74)
    * has no cross-engine-reproducible equivalent; the random variant
    * (`df.sample(fraction, seed)` / `orderBy(rand(seed)).limit(n)`) lives in
    * the ScalaTest suite where only distributional properties are asserted.
    */
  private def q14(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(col("l_orderkey") % 20 === 0)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  /** O3 — global sort (reference generate_clickstream.py:272-273 sorts all
    * events by event_ts). Range-partitioned SortExec at cluster scale.
    */
  private def q15(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_shipdate")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")

  /** O2 — top-k (reference README.md:400-402 top-10 by revenue). Catalyst
    * plans TakeOrderedAndProject: per-partition heaps, no full sort/shuffle.
    */
  private def q16(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** UNION ALL — bag union (q28 covers the distinct form); the zone-merge
    * shape (bronze increments appended before dedup).
    */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    val hi = Tables.load(s, dir, "orders")
      .filter(col("o_totalprice") > 200000)
      .select(col("o_orderkey"), lit("high").as("bucket"))
    val lo = Tables.load(s, dir, "orders")
      .filter(col("o_totalprice") < 10000)
      .select(col("o_orderkey"), lit("low").as("bucket"))
    hi.unionAll(lo).orderBy("o_orderkey", "bucket")
  }

  /** String-function breadth beyond q09: pad/replace/reverse/position/
    * conditional-null scalars (the cleaning-layer vocabulary).
    */
  private def q18(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "part")
      .select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "_").as("brand_pad"),
        rpad(col("p_brand"), 12, ".").as("brand_rpad"),
        regexp_replace(col("p_name"), " ", "_").as("name_snake"),
        reverse(col("p_brand")).as("brand_rev"),
        instr(col("p_name"), "a").cast("int").as("first_a"),
        nullif(col("p_size"), lit(1)).as("size_nz"),
        nvl(nullif(col("p_brand"), lit("Brand#11")), lit("OTHER"))
          .as("brand_or_other"))
      .orderBy("p_partkey")

  /** Correlated EXISTS subquery via the SQL surface — exercises Catalyst's
    * decorrelation (rewritten to a semi join; q24 is the IN form).
    */
  private def q19(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |ORDER BY o_orderkey""".stripMargin)
  }

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q17_union_all" -> q17 _,
    "q18_string_breadth" -> q18 _,
    "q19_exists_subquery" -> q19 _,
    "q01_project_cast" -> q01 _,
    "q02_filter_eq" -> q02 _,
    "q03_null_drop" -> q03 _,
    "q04_domain_validate" -> q04 _,
    "q05_derived_event_date" -> q05 _,
    "q06_dedup_keep_first" -> q06 _,
    "q07_distinct" -> q07 _,
    "q08_try_timestamp" -> q08 _,
    "q09_string_funcs" -> q09 _,
    "q10_math_funcs" -> q10 _,
    "q11_date_parts" -> q11 _,
    "q12_interval_arith" -> q12 _,
    "q13_coalesce_flag" -> q13 _,
    "q14_systematic_sample" -> q14 _,
    "q15_global_sort" -> q15 _,
    "q16_topk" -> q16 _)

  override val oracle: Seq[(String, String)] = Seq(
    "q17_union_all" ->
      """SELECT o_orderkey, 'high' AS bucket FROM orders
        | WHERE o_totalprice > 200000
        |UNION ALL
        |SELECT o_orderkey, 'low' AS bucket FROM orders
        | WHERE o_totalprice < 10000
        |ORDER BY o_orderkey, bucket""".stripMargin,
    "q18_string_breadth" ->
      """SELECT p_partkey,
        | lpad(p_brand, 12, '_') AS brand_pad,
        | rpad(p_brand, 12, '.') AS brand_rpad,
        | replace(p_name, ' ', '_') AS name_snake,
        | reverse(p_brand) AS brand_rev,
        | CAST(strpos(p_name, 'a') AS INT) AS first_a,
        | nullif(p_size, 1) AS size_nz,
        | coalesce(nullif(p_brand, 'Brand#11'), 'OTHER') AS brand_or_other
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q19_exists_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |ORDER BY o_orderkey""".stripMargin,
    "q01_project_cast" ->
      """SELECT o_orderkey, o_orderstatus AS status,
        | CAST(o_orderdate AS DATE) AS order_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q02_filter_eq" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_null_drop" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate IS NOT NULL AND l_orderkey IS NOT NULL
        |  AND l_returnflag IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q04_domain_validate" ->
      """SELECT event_id, user_id, event_type
        |FROM events
        |WHERE event_type IN ('view','click','purchase','signup')
        |ORDER BY event_id""".stripMargin,
    "q05_derived_event_date" ->
      """SELECT event_id, user_id,
        | CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date
        |FROM events ORDER BY event_id""".stripMargin,
    "q06_dedup_keep_first" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    "q07_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q08_try_timestamp" ->
      """SELECT doc_id,
        | TRY_CAST(CASE WHEN doc_id % 2 = 0 THEN '2024-03-15 12:00:00'
        |               ELSE source END AS TIMESTAMP) AS parsed_ts
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q09_string_funcs" ->
      """SELECT p_partkey,
        | upper(p_brand) AS brand_u,
        | lower(p_type) AS type_l,
        | CAST(length(p_name) AS INT) AS name_len,
        | substr(p_name, 1, 10) AS name10,
        | concat(p_brand, '#', p_type) AS brand_type,
        | trim(p_name) AS name_trim
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q10_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        | abs(l_discount - 0.05) AS disc_dev,
        | CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
        | CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        | l_extendedprice * l_discount AS disc_amount,
        | sqrt(l_quantity) AS qty_sqrt
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q11_date_parts" ->
      """SELECT o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS iso_ts,
        | CAST(year(o_orderdate) AS INT) AS yr,
        | CAST(month(o_orderdate) AS INT) AS mo,
        | CAST(day(o_orderdate) AS INT) AS dom
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q12_interval_arith" ->
      """SELECT o_orderkey,
        | o_orderdate + INTERVAL 30 DAY AS due_ts,
        | o_orderdate - INTERVAL 90 MINUTE AS cutoff_ts
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q13_coalesce_flag" ->
      """SELECT c_custkey,
        | coalesce(c_mktsegment, '') AS segment,
        | CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS is_positive
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q14_systematic_sample" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem WHERE l_orderkey % 20 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q15_global_sort" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        |ORDER BY l_shipdate, l_orderkey, l_linenumber""".stripMargin,
    "q16_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)
}
