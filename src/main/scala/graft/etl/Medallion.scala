package graft.etl

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.catalog.Tables
import graft.gen.Clickstream

/** The reference's three-zone medallion pipeline (README.md:19-43),
  * Spark-native:
  *
  *   - '''bronze''': the generated clickstream lands as headered CSV —
  *     "Raw = as received" (README.md:119), schema declared explicitly on
  *     read (deterministic crawler, SURVEY.md §2 S3).
  *   - '''silver''': typed casts (`to_timestamp`, null on unparseable —
  *     F1), enum validation (P5), null-drop (P3), key dedup (A5), derived
  *     `event_date` (P7), Parquet overwrite sink (S4) — the PySpark job at
  *     README.md:177-197 re-expressed.
  *   - '''gold''': CTAS-equivalent star schema (S6): `fact_events` +
  *     `dim_customer` + `dim_product` written as Parquet and re-registered
  *     as views (S5), over which the three reference analytics queries run
  *     (README.md:357-402).
  *
  * Scale notes: every zone boundary is a full-scan write — the same
  * materialization strategy the reference uses (CTAS layering, SURVEY.md
  * §4). At 100 TB the silver write would add `.partitionBy("event_date")`
  * (monthly partitioning is optional in the reference, README.md:288) and
  * the dedup is a hash-shuffle on the key with map-side partial
  * aggregation. Nothing here collects to the driver.
  *
  * Outputs are cached per (sfDir) within the JVM so the four exposed
  * queries don't re-run the pipeline.
  */
object Medallion {

  val bronzeSchema: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("session_id", StringType),
    StructField("customer_id", StringType),
    StructField("event_type", StringType),
    StructField("event_ts", StringType),
    StructField("product_id", LongType),
    StructField("order_id", LongType),
    StructField("device_type", StringType),
    StructField("traffic_source", StringType),
    StructField("is_authenticated", IntegerType)))

  private val cache = TrieMap.empty[String, String]

  /** Run bronze→silver→gold for a scale-factor dir; returns the zone root.
    * Idempotent per JVM.
    */
  def run(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(sfDir, {
      val sf = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      val root = s"target/medallion/$sf"

      // bronze: raw CSV, exactly as a drop zone would receive it.
      // nullValue \N keeps NULL long columns distinguishable from the
      // empty-string customer_id the generator deliberately emits.
      Clickstream.generate(spark, sfDir)
        .write.mode("overwrite")
        .option("header", "true").option("nullValue", "\\N")
        .csv(s"$root/bronze/events")

      // silver: the cleaning job.
      val bronze = spark.read
        .option("header", "true").option("nullValue", "\\N")
        .schema(bronzeSchema)
        .csv(s"$root/bronze/events")
      bronze
        // try_to_timestamp, not to_timestamp: Spark 4 runs ANSI mode by
        // default, where a malformed timestamp throws instead of coercing
        // to null — the reference's errors="coerce" semantic needs `try_`.
        .withColumn("event_ts", try_to_timestamp(col("event_ts")))
        .filter(col("event_type").isin(Clickstream.EventTypes: _*))
        .na.drop(Seq("event_ts"))
        .dropDuplicates("event_id")
        .withColumn("event_date", to_date(col("event_ts")))
        .withColumn("customer_id", coalesce(col("customer_id"), lit("")))
        .write.mode("overwrite").parquet(s"$root/silver/events")

      // zone namespaces (S8) — the reference's ecom_raw_db / ecom_cleaned_db
      // / ecom_curated_db CREATE DATABASE IF NOT EXISTS ×3 (README.md:132,
      // 161,253), on the session catalog.
      Seq("ecom_bronze_db", "ecom_silver_db", "ecom_gold_db").foreach { db =>
        spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
      }

      // gold: star-schema CTAS equivalents.
      val silver = spark.read.parquet(s"$root/silver/events")
      silver.createOrReplaceTempView("silver_events")
      silver.write.mode("overwrite").parquet(s"$root/gold/fact_events")
      Tables.load(spark, sfDir, "customer")
        .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
        .write.mode("overwrite").parquet(s"$root/gold/dim_customer")
      Tables.load(spark, sfDir, "part")
        .select("p_partkey", "p_brand", "p_type")
        .write.mode("overwrite").parquet(s"$root/gold/dim_product")
      root
    })

  /** Gold-zone fact table, registered fresh from Parquet (S5). */
  def factEvents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${run(spark, sfDir)}/gold/fact_events")
}
