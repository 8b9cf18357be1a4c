package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Logical-name → path catalog over the driver testdata layout
  * (`TESTDATA.md`: one parquet file per table under a scale-factor dir).
  *
  * Mirrors the reference's Glue-catalog role (reference `README.md:24,135-146`:
  * crawler-inferred tables become queryable by name) collapsed into the Spark
  * session catalog: `load` reads by path, `registerAll` exposes every table as
  * a temp view so `spark.sql` works over the same names the DuckDB oracle sees.
  *
  * Scale note: these are plain parquet scans — Catalyst pushes predicates and
  * prunes columns at the source, so the same catalog works unchanged whether
  * the path holds one file (local test) or a 100 TB partitioned directory.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** `events.ts` is parquet INT64 TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). The supported path is the
    * session conf below, which surfaces the column as BIGINT nanoseconds —
    * exact (no precision loss) and cheap (no per-row conversion on scan).
    * Queries convert at the edge (`tsMicros`, epoch-day bucketing).
    */
  private def enableNanos(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") enableNanos(spark)
    spark.read.parquet(path(dir, name))
  }

  /** Register every testdata table as a temp view named `name`. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n => load(spark, dir, n).createOrReplaceTempView(n) }
}
