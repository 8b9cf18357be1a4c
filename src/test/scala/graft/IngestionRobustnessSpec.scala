package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw-zone ingestion robustness — the bronze layer receives files
  * "as-is" (reference README.md:423-428), which includes malformed rows:
  * PERMISSIVE parsing must quarantine them in `_corrupt_record` instead of
  * failing the job, and the SQL-surface CTAS (`CREATE TABLE … AS SELECT`)
  * must materialize the cleaned relation (the S6 path through spark.sql
  * rather than the DataFrame writer).
  */
class IngestionRobustnessSpec extends SparkSpecBase {

  test("PERMISSIVE csv read quarantines malformed rows in _corrupt_record") {
    val s = spark
    val dir = Files.createTempDirectory("robust").toString
    Files.writeString(Paths.get(s"$dir/raw.csv"),
      """id,qty,price
        |1,5,10.5
        |2,not-a-number,20.0
        |3,7,30.25
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("qty", IntegerType),
      StructField("price", DoubleType),
      StructField("_corrupt_record", StringType)))
    val df = s.read.option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema).csv(s"$dir/raw.csv")
      .cache() // corrupt-record column requires materialized parse
    assert(df.count() === 3)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(bad.count() === 1)
    assert(bad.head().getString(3).contains("not-a-number"))
    assert(df.filter(col("_corrupt_record").isNull &&
      col("qty").isNotNull).count() === 2)
    df.unpersist()
  }

  test("CREATE TABLE ... USING PARQUET AS SELECT materializes the relation") {
    val s = spark
    graft.catalog.Tables.load(s, "/root/testdata/sf0.001", "part")
      .createOrReplaceTempView("part_src")
    s.sql("DROP TABLE IF EXISTS ctas_brands")
    s.sql(
      """CREATE TABLE ctas_brands USING PARQUET AS
        |SELECT p_brand, count(*) AS n FROM part_src GROUP BY p_brand""".stripMargin)
    try {
      val n = s.table("ctas_brands").count()
      assert(n > 0)
      val total = s.table("ctas_brands").agg(sum("n")).head().getLong(0)
      assert(total === s.table("part_src").count())
    } finally s.sql("DROP TABLE IF EXISTS ctas_brands")
  }
}
