package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's medallion pipeline on its *own* data model — the Olist
  * schema, verbatim (SURVEY.md §1.4; FIXTURES.md §B) — raw CSV → cleaned
  * Parquet → curated star schema → the three analytics queries.
  * `graft.etl.Medallion` runs the same lifecycle against the driver
  * testdata; this variant preserves reference column names and semantics
  * exactly, so a user of the reference could run their queries unchanged.
  *
  * Zone semantics (reference README.md):
  *   - cleaned orders: select + `to_timestamp` cast + derived `order_date`
  *     + `dropDuplicates("order_id")` (README.md:177-197).
  *   - cleaned clickstream: timestamp cast (null-on-error), `event_type`
  *     validated against the 5-value enum (README.md:221-244, :75),
  *     derived `event_date`; empty-string `customer_id` preserved
  *     (generate_clickstream.py:99 — NOT null).
  *   - curated CTAS (README.md:259-344): `dim_customer`, `dim_product`,
  *     `fact_orders`, `fact_order_items`, `fact_events`.
  *   - analytics (README.md:357-402): funnel, conversion-by-source,
  *     revenue-by-category top-10.
  *
  * Scale notes: every clean step is scan→project→(one dedup shuffle)→write;
  * curated joins broadcast the dims; the analytics aggregate with map-side
  * partials. At 100 TB, `fact_events` would be written
  * `partitionBy(event_date)` (monthly partitioning optional in the
  * reference, README.md:288).
  */
object Olist {

  val EventTypes: Seq[String] =
    Seq("page_view", "view_product", "add_to_cart", "checkout", "purchase")

  val rawOrdersSchema: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("customer_id", StringType),
    StructField("order_status", StringType),
    StructField("order_purchase_timestamp", StringType)))

  val rawCustomersSchema: StructType = StructType(Seq(
    StructField("customer_id", StringType),
    StructField("customer_unique_id", StringType),
    StructField("customer_city", StringType),
    StructField("customer_state", StringType)))

  val rawProductsSchema: StructType = StructType(Seq(
    StructField("product_id", StringType),
    StructField("product_category_name", StringType),
    StructField("product_name_lenght", StringType),
    StructField("product_photos_qty", StringType),
    StructField("product_weight_g", StringType)))

  val rawOrderItemsSchema: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("product_id", StringType),
    StructField("price", StringType),
    StructField("freight_value", StringType)))

  val rawClickstreamSchema: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("session_id", StringType),
    StructField("customer_id", StringType),
    StructField("event_type", StringType),
    StructField("event_ts", StringType),
    StructField("product_id", StringType),
    StructField("order_id", StringType),
    StructField("device_type", StringType),
    StructField("traffic_source", StringType),
    StructField("is_authenticated", StringType),
    StructField("customer_city", StringType),
    StructField("customer_state", StringType)))

  private def readRaw(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.option("header", "true").option("nullValue", "\\N")
      .schema(schema).csv(path)

  /** Silver: cleaned_orders (README.md:177-211). */
  def cleanOrders(raw: DataFrame): DataFrame =
    raw.select(
        col("order_id"), col("customer_id"), col("order_status"),
        try_to_timestamp(col("order_purchase_timestamp"))
          .as("order_purchase_timestamp"))
      .withColumn("order_date", to_date(col("order_purchase_timestamp")))
      .dropDuplicates("order_id")

  /** Silver: cleaned_customers. */
  def cleanCustomers(raw: DataFrame): DataFrame =
    raw.dropDuplicates("customer_id")

  /** Silver: cleaned_products — int casts (README.md:462). */
  def cleanProducts(raw: DataFrame): DataFrame =
    raw.select(
        col("product_id"), col("product_category_name"),
        col("product_name_lenght").cast("int").as("product_name_lenght"),
        col("product_photos_qty").cast("int").as("product_photos_qty"),
        col("product_weight_g").cast("int").as("product_weight_g"))
      .dropDuplicates("product_id")

  /** Silver: cleaned_order_items — double casts (README.md:216,462). */
  def cleanOrderItems(raw: DataFrame): DataFrame =
    raw.select(
      col("order_id"), col("product_id"),
      col("price").cast("double").as("price"),
      col("freight_value").cast("double").as("freight_value"))

  /** Silver: cleaned_clickstream (README.md:213-244): ts cast with
    * null-on-error, enum validation, null-ts drop, key dedup, event_date;
    * empty-string customer_id preserved.
    */
  def cleanClickstream(raw: DataFrame): DataFrame =
    raw.select(
        col("event_id"), col("session_id"),
        coalesce(col("customer_id"), lit("")).as("customer_id"),
        col("event_type"),
        try_to_timestamp(col("event_ts")).as("event_ts"),
        col("product_id"), col("order_id"), col("device_type"),
        col("traffic_source"),
        col("is_authenticated").cast("int").as("is_authenticated"),
        col("customer_city"), col("customer_state"))
      .filter(col("event_type").isin(EventTypes: _*))
      .na.drop(Seq("event_ts"))
      .dropDuplicates("event_id")
      .withColumn("event_date", to_date(col("event_ts")))

  /** Gold CTAS column lists (README.md:259-344). */
  def dimCustomer(cleanedCustomers: DataFrame): DataFrame =
    cleanedCustomers.select("customer_id", "customer_unique_id",
      "customer_city", "customer_state")

  def dimProduct(cleanedProducts: DataFrame): DataFrame =
    cleanedProducts.select("product_id", "product_category_name")

  def factOrders(cleanedOrders: DataFrame): DataFrame =
    cleanedOrders.select("order_id", "customer_id", "order_status",
      "order_purchase_timestamp", "order_date")

  def factOrderItems(cleanedItems: DataFrame): DataFrame =
    cleanedItems.select("order_id", "product_id", "price", "freight_value")

  def factEvents(cleanedClickstream: DataFrame): DataFrame =
    cleanedClickstream

  /** Analytics 1 — funnel: sessions per event type (README.md:364-369). */
  def funnel(factEvents: DataFrame): DataFrame =
    factEvents.groupBy("event_type")
      .agg(countDistinct("session_id").as("sessions"))
      .orderBy(col("sessions").desc, col("event_type"))

  /** Analytics 2 — conversion rate by traffic source (README.md:373-389). */
  def conversionBySource(factEvents: DataFrame): DataFrame = {
    val purchases = factEvents.filter(col("event_type") === "purchase")
      .select(col("session_id").as("p_session_id")).distinct()
    factEvents
      .join(purchases, col("session_id") === col("p_session_id"), "left")
      .groupBy("traffic_source")
      .agg(
        countDistinct("session_id").as("sessions"),
        countDistinct("p_session_id").as("purchase_sessions"))
      .withColumn("conversion_rate_pct",
        lit(100.0) * col("purchase_sessions") / col("sessions"))
      .orderBy("traffic_source")
  }

  /** Analytics 3 — revenue by category top-10 (README.md:393-402):
    * `SUM(oi.price)` over `fact_order_items ⋈ dim_product`, broadcast dim.
    */
  def revenueByCategory(factOrderItems: DataFrame,
      dimProduct: DataFrame): DataFrame =
    factOrderItems
      .join(broadcast(dimProduct), Seq("product_id"))
      .groupBy("product_category_name")
      .agg(round(sum("price"), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("product_category_name"))
      .limit(10)

  /** Full lifecycle from a raw-zone directory of CSVs to a curated-zone
    * directory of Parquet; returns the curated fact_events for chaining.
    */
  def run(spark: SparkSession, rawDir: String, outDir: String): Unit = {
    val orders = cleanOrders(
      readRaw(spark, s"$rawDir/olist_orders_dataset.csv", rawOrdersSchema))
    val customers = cleanCustomers(readRaw(spark,
      s"$rawDir/olist_customers_dataset.csv", rawCustomersSchema))
    val products = cleanProducts(readRaw(spark,
      s"$rawDir/olist_products_dataset.csv", rawProductsSchema))
    val items = cleanOrderItems(readRaw(spark,
      s"$rawDir/olist_order_items_dataset.csv", rawOrderItemsSchema))
    val events = cleanClickstream(readRaw(spark,
      s"$rawDir/olist_clickstream_events.csv", rawClickstreamSchema))
    Seq(
      "dim_customer" -> dimCustomer(customers),
      "dim_product" -> dimProduct(products),
      "fact_orders" -> factOrders(orders),
      "fact_order_items" -> factOrderItems(items),
      "fact_events" -> factEvents(events)
    ).foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
    }
  }
}
