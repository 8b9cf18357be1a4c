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
      Seq("order_id", "product_id", "price", "freight_value"),
      Seq(
        Seq("o1", "p1", "100.0", "10.0"),
        Seq("o1", "p2", "50.0", "5.0"),
        Seq("o2", "p2", "50.0", "5.0"),
        Seq("o2", "p3", "100.0", "8.0"), // books ties toys at 100
        Seq("o3", "p4", "30.0", "3.0")))
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
}
