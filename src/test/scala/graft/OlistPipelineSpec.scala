package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.etl.Olist

/** Golden end-to-end test of the reference-schema medallion pipeline
  * (SURVEY.md §5; FIXTURES.md §B): a tiny hand-computable Olist-shaped
  * fixture with every edge case baked in — duplicate order_id rows,
  * unparseable timestamps, empty-string customer_id, sessions without
  * purchases, a revenue tie at the limit boundary — flows raw CSV →
  * cleaned → curated → the three reference analytics, compared to
  * hand-computed golden values.
  */
class OlistPipelineSpec extends SparkSpecBase {

  private lazy val dir = Files.createTempDirectory("olist").toString
  private lazy val rawDir = s"$dir/raw"
  private lazy val curated = s"$dir/curated"

  private def writeCsv(name: String, cols: Seq[String],
      rows: Seq[Seq[String]]): Unit = {
    val s = spark
    import scala.jdk.CollectionConverters._
    val df = s.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r.map {
        case null => null; case v => v
      }: _*)).asJava,
      org.apache.spark.sql.types.StructType(cols.map(c =>
        org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.StringType))))
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").option("nullValue", "\\N")
      .csv(s"$rawDir/$name")
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    writeCsv("olist_orders_dataset.csv",
      Seq("order_id", "customer_id", "order_status",
        "order_purchase_timestamp"),
      Seq(
        Seq("o1", "c1", "delivered", "2017-01-01 10:00:00"),
        Seq("o1", "c1", "delivered", "2017-01-01 10:00:00"), // dup
        Seq("o2", "c2", "delivered", "2017-02-03 12:30:00"),
        Seq("o3", "c3", "shipped", "not-a-date"))) // unparseable ts
    writeCsv("olist_customers_dataset.csv",
      Seq("customer_id", "customer_unique_id", "customer_city",
        "customer_state"),
      Seq(
        Seq("c1", "u1", "sao paulo", "SP"),
        Seq("c2", "u2", "rio de janeiro", "RJ"),
        Seq("c3", "u3", "campinas", "SP")))
    writeCsv("olist_products_dataset.csv",
      Seq("product_id", "product_category_name", "product_name_lenght",
        "product_photos_qty", "product_weight_g"),
      Seq(
        Seq("p1", "electronics", "40", "2", "300"),
        Seq("p2", "books", "35", "1", "500"),
        Seq("p3", "toys", "20", "3", "150"),
        Seq("p4", "electronics", "44", "2", "250")))
    writeCsv("olist_order_items_dataset.csv",
      Seq("order_id", "product_id", "seller_id", "price", "freight_value"),
      Seq(
        Seq("o1", "p1", "s_a", "100.0", "10.0"),
        Seq("o1", "p2", "s_b", "50.0", "5.0"),
        Seq("o2", "p2", "s_b", "50.0", "5.0"),
        Seq("o2", "p3", "s_a", "100.0", "8.0"), // books ties toys at 100
        Seq("o3", "p4", "s_c", "30.0", "3.0")))
    writeCsv("olist_sellers_dataset.csv",
      Seq("seller_id", "seller_zip_code_prefix", "seller_city",
        "seller_state"),
      Seq(
        Seq("s_a", "13023", "campinas", "SP"),
        Seq("s_a", "13023", "campinas", "SP"), // dup seller row
        Seq("s_b", "20000", "rio de janeiro", "RJ"),
        Seq("s_c", "99999", "nowhere", "XX"))) // zip with no geolocation
    writeCsv("olist_geolocation_dataset.csv",
      Seq("geolocation_zip_code_prefix", "geolocation_lat",
        "geolocation_lng", "geolocation_city", "geolocation_state"),
      Seq(
        // two readings for 13023 → centroid (-22.9, -47.1)
        Seq("13023", "-22.8", "-47.0", "campinas", "SP"),
        Seq("13023", "-23.0", "-47.2", "campinas", "SP"),
        Seq("20000", "-22.9", "-43.2", "rio de janeiro", "RJ"),
        Seq("30000", "bad-lat", "-43.9", "belo horizonte", "MG"))) // dirt
    writeCsv("olist_order_payments_dataset.csv",
      Seq("order_id", "payment_sequential", "payment_type",
        "payment_installments", "payment_value"),
      Seq(
        Seq("o1", "1", "credit_card", "3", "140.0"),
        Seq("o1", "2", "voucher", "1", "25.0"), // split payment
        Seq("o1", "2", "voucher", "1", "25.0"), // dup (order, seq) row
        Seq("o2", "1", "credit_card", "1", "163.0"),
        Seq("o3", "1", "boleto", "1", "\\N"))) // null value → dropped
    writeCsv("olist_order_reviews_dataset.csv",
      Seq("review_id", "order_id", "review_score",
        "review_creation_date"),
      Seq(
        Seq("r1", "o1", "5", "2017-01-03 00:00:00"),
        Seq("r1", "o1", "5", "2017-01-03 00:00:00"), // dup review
        Seq("r2", "o2", "3", "2017-02-05 00:00:00"),
        Seq("r3", "o3", "9", "2017-02-06 00:00:00"))) // out-of-domain score
    writeCsv("product_category_name_translation.csv",
      Seq("product_category_name", "product_category_name_english"),
      Seq(
        Seq("electronics", "electronics_en"),
        Seq("books", "books_en")))
        // toys intentionally untranslated → coalesce keeps 'toys'
    writeCsv("olist_clickstream_events.csv",
      Seq("event_id", "session_id", "customer_id", "event_type", "event_ts",
        "product_id", "order_id", "device_type", "traffic_source",
        "is_authenticated", "customer_city", "customer_state"),
      Seq(
        Seq("e1", "s1", "c1", "page_view", "2017-01-01 09:50:00", null,
          null, "mobile", "direct", "1", "sao paulo", "SP"),
        Seq("e1", "s1", "c1", "page_view", "2017-01-01 09:50:00", null,
          null, "mobile", "direct", "1", "sao paulo", "SP"), // dup
        Seq("e2", "s1", "c1", "view_product", "2017-01-01 09:53:00", "p1",
          null, "mobile", "direct", "1", "sao paulo", "SP"),
        Seq("e3", "s1", "c1", "add_to_cart", "2017-01-01 09:56:00", "p1",
          null, "mobile", "direct", "1", "sao paulo", "SP"),
        Seq("e4", "s1", "c1", "checkout", "2017-01-01 09:58:00", null,
          "o1", "mobile", "direct", "1", "sao paulo", "SP"),
        Seq("e5", "s1", "c1", "purchase", "2017-01-01 10:00:00", null,
          "o1", "mobile", "direct", "1", "sao paulo", "SP"),
        // anonymous browse session, empty-string customer_id, no purchase
        Seq("e6", "s2", "", "page_view", "2017-01-05 11:00:00", null,
          null, "desktop", "seo", "0", "", ""),
        Seq("e7", "s2", "", "view_product", "2017-01-05 11:02:00", "p3",
          null, "desktop", "seo", "0", "", ""),
        // second converting session (source=direct)
        Seq("e8", "s3", "c2", "page_view", "2017-02-03 12:20:00", null,
          null, "tablet", "direct", "1", "rio de janeiro", "RJ"),
        Seq("e9", "s3", "c2", "purchase", "2017-02-03 12:30:00", null,
          "o2", "tablet", "direct", "1", "rio de janeiro", "RJ"),
        // dirt: invalid enum + unparseable ts
        Seq("e10", "s2", "", "bot_probe", "2017-01-05 11:03:00", null,
          null, "desktop", "seo", "0", "", ""),
        Seq("e11", "s3", "c2", "page_view", "broken-ts", null,
          null, "tablet", "direct", "1", "rio de janeiro", "RJ")))
    Olist.run(spark, rawDir, curated)
  }

  private def read(name: String) = spark.read.parquet(s"$curated/$name")

  test("cleaning: dedup, null-on-cast, enum validation, empty-string keys") {
    val fo = read("fact_orders")
    assert(fo.count() === 3)
    assert(fo.filter(col("order_id") === "o3")
      .head().isNullAt(3)) // order_purchase_timestamp null on 'not-a-date'
    val fe = read("fact_events")
    assert(fe.count() === 9) // 11 raw + 1 dup − dup − bot_probe − broken-ts
    assert(fe.filter(col("event_id") === "e1").count() === 1)
    assert(fe.filter(col("event_type") === "bot_probe").count() === 0)
    assert(fe.filter(col("customer_id") === "").count() === 2)
    assert(fe.filter(col("customer_id").isNull).count() === 0)
  }

  test("golden funnel (README.md:364-369)") {
    val rows = Olist.funnel(read("fact_events"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq === Seq(
      ("page_view", 3L), ("purchase", 2L), ("view_product", 2L),
      ("add_to_cart", 1L), ("checkout", 1L)))
  }

  test("golden conversion by source (README.md:373-389)") {
    val rows = Olist.conversionBySource(read("fact_events"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq === Seq(
      ("direct", 2L, 2L, 100.0), ("seo", 1L, 0L, 0.0)))
  }

  test("golden revenue by category with a tie at the boundary") {
    val rows = Olist.revenueByCategory(
      read("fact_order_items"), read("dim_product"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.toSeq === Seq(
      ("electronics", 130.0), ("books", 100.0), ("toys", 100.0)))
  }

  test("seller/geo cleaning: dedup, centroid per zip, null-coord drop") {
    val ds = read("dim_seller")
    assert(ds.count() === 3) // dup s_a row collapsed
    val sa = ds.filter(col("seller_id") === "s_a").head()
    assert(sa.getDouble(4) === -22.9 && sa.getDouble(5) === -47.1,
      "13023 centroid = avg of its two readings")
    // s_c's zip has no geolocation row → left join keeps it, coords null
    val sc = ds.filter(col("seller_id") === "s_c").head()
    assert(sc.isNullAt(4) && sc.isNullAt(5))
    // the bad-lat geolocation row was dropped, not nulled into a centroid
    assert(read("dim_geolocation")
      .filter(col("geolocation_zip_code_prefix") === "30000").count() === 0)
  }

  test("payments cleaning: composite-key dedup + null-value drop") {
    val fp = read("fact_payments")
    assert(fp.count() === 3) // 5 raw − dup (o1,2) − null-value o3
    assert(fp.filter(col("order_id") === "o1").count() === 2)
  }

  test("reviews cleaning: key dedup + 1-5 score domain") {
    val fr = read("fact_reviews")
    assert(fr.count() === 2) // r1 dup collapsed, r3 score 9 out of domain
    assert(fr.agg(max("review_score")).head().getInt(0) <= 5)
  }

  test("golden revenue by seller state") {
    val rows = Olist.revenueBySellerState(
      read("fact_order_items"), read("dim_seller"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    // s_a: 100+100=200 (SP); s_b: 50+50=100 (RJ); s_c: 30 (XX)
    assert(rows.toSeq === Seq(
      ("SP", 200.0, 1L), ("RJ", 100.0, 1L), ("XX", 30.0, 1L)))
  }

  test("golden payment mix") {
    val rows = Olist.paymentMix(read("fact_payments"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.toSeq === Seq(
      ("credit_card", 2L, 303.0, 2.0), ("voucher", 1L, 25.0, 1.0)))
  }

  test("golden review score by translated category (untranslated falls back)") {
    val rows = Olist.reviewScoreByCategory(
      read("fact_reviews"), read("fact_order_items"),
      read("dim_product_translated"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // o1 (score 5) touches p1(electronics), p2(books);
    // o2 (score 3) touches p2(books), p3(toys — untranslated)
    assert(rows.toSeq === Seq(
      ("books_en", 2L, 4.0), ("electronics_en", 1L, 5.0), ("toys", 1L, 3.0)))
  }
}
