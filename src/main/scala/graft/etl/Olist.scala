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

  // seller_id rides along (real olist_order_items_dataset.csv column;
  // the reference README projects it away, README.md:216 — ingested here
  // to close the seller-side surface the reference names but never joins)
  val rawOrderItemsSchema: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("product_id", StringType),
    StructField("seller_id", StringType),
    StructField("price", StringType),
    StructField("freight_value", StringType)))

  /** Remaining Kaggle tables the reference names (README.md:54-62) but
    * never queries — ingested with the same clean→curate discipline.
    * Schemas from the public dataset headers
    * (olist_sellers_dataset.csv:1; Kaggle Olist data dictionary).
    */
  val rawSellersSchema: StructType = StructType(Seq(
    StructField("seller_id", StringType),
    StructField("seller_zip_code_prefix", StringType),
    StructField("seller_city", StringType),
    StructField("seller_state", StringType)))

  val rawGeolocationSchema: StructType = StructType(Seq(
    StructField("geolocation_zip_code_prefix", StringType),
    StructField("geolocation_lat", StringType),
    StructField("geolocation_lng", StringType),
    StructField("geolocation_city", StringType),
    StructField("geolocation_state", StringType)))

  val rawPaymentsSchema: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("payment_sequential", StringType),
    StructField("payment_type", StringType),
    StructField("payment_installments", StringType),
    StructField("payment_value", StringType)))

  val rawReviewsSchema: StructType = StructType(Seq(
    StructField("review_id", StringType),
    StructField("order_id", StringType),
    StructField("review_score", StringType),
    StructField("review_creation_date", StringType)))

  val rawCategoryTranslationSchema: StructType = StructType(Seq(
    StructField("product_category_name", StringType),
    StructField("product_category_name_english", StringType)))

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
      col("order_id"), col("product_id"), col("seller_id"),
      col("price").cast("double").as("price"),
      col("freight_value").cast("double").as("freight_value"))

  /** Silver: cleaned_sellers — key dedup, same survivor discipline as
    * customers.
    */
  def cleanSellers(raw: DataFrame): DataFrame =
    raw.dropDuplicates("seller_id")

  /** Silver: cleaned_geolocation — the raw table carries MANY coordinate
    * readings per zip prefix (one per address observation); cleaning
    * reduces it to one representative row per prefix: coordinate centroid
    * (avg lat/lng) + deterministic min() city/state survivor. This is the
    * aggregation that makes the table joinable as a dimension — and at
    * 100 TB it is one partial-agg shuffle at zip grain (~20k groups).
    */
  def cleanGeolocation(raw: DataFrame): DataFrame =
    raw.select(
        col("geolocation_zip_code_prefix"),
        // try_cast: malformed coordinate readings null out and drop
        // (the try_to_timestamp discipline — ANSI cast would fail the job)
        expr("try_cast(geolocation_lat AS DOUBLE)").as("lat"),
        expr("try_cast(geolocation_lng AS DOUBLE)").as("lng"),
        col("geolocation_city"), col("geolocation_state"))
      .na.drop(Seq("lat", "lng"))
      .groupBy("geolocation_zip_code_prefix")
      .agg(
        avg("lat").as("geolocation_lat"),
        avg("lng").as("geolocation_lng"),
        min("geolocation_city").as("geolocation_city"),
        min("geolocation_state").as("geolocation_state"))

  /** Silver: cleaned_payments — int/double casts, null-value drop,
    * composite-key dedup (an order pays in `payment_sequential` parts —
    * card + voucher — so the grain is (order_id, sequential)).
    */
  def cleanPayments(raw: DataFrame): DataFrame =
    raw.select(
        col("order_id"),
        col("payment_sequential").cast("int").as("payment_sequential"),
        col("payment_type"),
        col("payment_installments").cast("int").as("payment_installments"),
        col("payment_value").cast("double").as("payment_value"))
      .na.drop(Seq("payment_value"))
      .dropDuplicates("order_id", "payment_sequential")

  /** Silver: cleaned_reviews — score domain-validated to the 1–5 star
    * range (the event-enum discipline), timestamp null-on-cast, key dedup.
    */
  def cleanReviews(raw: DataFrame): DataFrame =
    raw.select(
        col("review_id"), col("order_id"),
        col("review_score").cast("int").as("review_score"),
        try_to_timestamp(col("review_creation_date"))
          .as("review_creation_date"))
      .filter(col("review_score").between(1, 5))
      .dropDuplicates("review_id")

  /** Silver: cleaned category translation — key dedup on the Portuguese
    * name (the join key into dim_product).
    */
  def cleanCategoryTranslation(raw: DataFrame): DataFrame =
    raw.dropDuplicates("product_category_name")

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
    cleanedItems.select("order_id", "product_id", "seller_id", "price",
      "freight_value")

  def factEvents(cleanedClickstream: DataFrame): DataFrame =
    cleanedClickstream

  /** Gold: dim_seller — seller attributes enriched with the zip-prefix
    * coordinate centroid (geolocation broadcast: ~20k rows at full scale).
    */
  def dimSeller(cleanedSellers: DataFrame,
      cleanedGeo: DataFrame): DataFrame =
    cleanedSellers.join(
        broadcast(cleanedGeo.select(
          col("geolocation_zip_code_prefix").as("seller_zip_code_prefix"),
          col("geolocation_lat").as("seller_lat"),
          col("geolocation_lng").as("seller_lng"))),
        Seq("seller_zip_code_prefix"), "left")
      .select("seller_id", "seller_zip_code_prefix", "seller_city",
        "seller_state", "seller_lat", "seller_lng")

  def factPayments(cleanedPayments: DataFrame): DataFrame =
    cleanedPayments.select("order_id", "payment_sequential", "payment_type",
      "payment_installments", "payment_value")

  def factReviews(cleanedReviews: DataFrame): DataFrame =
    cleanedReviews.select("review_id", "order_id", "review_score",
      "review_creation_date")

  /** Gold: dim_product with the English category grafted on (translation
    * is a ~70-row broadcast dim; untranslated categories keep the
    * Portuguese name — the left-join + coalesce discipline).
    */
  def dimProductTranslated(dimProduct: DataFrame,
      cleanedTranslation: DataFrame): DataFrame =
    dimProduct.join(broadcast(cleanedTranslation),
        Seq("product_category_name"), "left")
      .select(col("product_id"), col("product_category_name"),
        coalesce(col("product_category_name_english"),
          col("product_category_name"))
          .as("product_category_english"))

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

  /** Analytics 4 — revenue rollup by seller state (the seller-side twin
    * of revenue-by-category): fact_order_items ⋈ broadcast dim_seller.
    */
  def revenueBySellerState(factOrderItems: DataFrame,
      dimSeller: DataFrame): DataFrame =
    factOrderItems
      .join(broadcast(dimSeller.select("seller_id", "seller_state")),
        Seq("seller_id"))
      .groupBy("seller_state")
      .agg(round(sum("price"), 2).as("revenue"),
        countDistinct("seller_id").as("n_sellers"))
      .orderBy(col("revenue").desc, col("seller_state"))

  /** Analytics 5 — payment-type mix: count / value / installment profile
    * per payment type, one partial-agg shuffle at type grain.
    */
  def paymentMix(factPayments: DataFrame): DataFrame =
    factPayments.groupBy("payment_type")
      .agg(count(lit(1)).as("n_payments"),
        round(sum("payment_value"), 2).as("total_value"),
        round(avg("payment_installments"), 2).as("avg_installments"))
      .orderBy(col("total_value").desc, col("payment_type"))

  /** Analytics 6 — average review score per (translated) product
    * category: reviews ⋈ order_items on order_id, category dim broadcast.
    */
  def reviewScoreByCategory(factReviews: DataFrame,
      factOrderItems: DataFrame,
      dimProductTranslated: DataFrame): DataFrame =
    factReviews
      .join(factOrderItems.select("order_id", "product_id"), Seq("order_id"))
      .join(broadcast(dimProductTranslated
        .select("product_id", "product_category_english")), Seq("product_id"))
      .groupBy("product_category_english")
      .agg(count(lit(1)).as("n_reviews"),
        round(avg("review_score"), 2).as("avg_score"))
      .orderBy("product_category_english")

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
    val sellers = cleanSellers(readRaw(spark,
      s"$rawDir/olist_sellers_dataset.csv", rawSellersSchema))
    val geo = cleanGeolocation(readRaw(spark,
      s"$rawDir/olist_geolocation_dataset.csv", rawGeolocationSchema))
    val payments = cleanPayments(readRaw(spark,
      s"$rawDir/olist_order_payments_dataset.csv", rawPaymentsSchema))
    val reviews = cleanReviews(readRaw(spark,
      s"$rawDir/olist_order_reviews_dataset.csv", rawReviewsSchema))
    val translation = cleanCategoryTranslation(readRaw(spark,
      s"$rawDir/product_category_name_translation.csv",
      rawCategoryTranslationSchema))
    Seq(
      "dim_customer" -> dimCustomer(customers),
      "dim_product" -> dimProduct(products),
      "dim_product_translated" ->
        dimProductTranslated(dimProduct(products), translation),
      "dim_seller" -> dimSeller(sellers, geo),
      "dim_geolocation" -> geo,
      "fact_orders" -> factOrders(orders),
      "fact_order_items" -> factOrderItems(items),
      "fact_payments" -> factPayments(payments),
      "fact_reviews" -> factReviews(reviews),
      "fact_events" -> factEvents(events)
    ).foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
    }
  }
}
