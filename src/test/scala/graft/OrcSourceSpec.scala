package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** ORC as an alternative columnar source/sink (built into Spark alongside
  * parquet): write→read round-trip preserves values, and predicates push
  * into the ORC scan exactly as with parquet — the format choice doesn't
  * change the pruning/pushdown story.
  */
class OrcSourceSpec extends SparkSpecBase {

  test("ORC round-trip preserves rows; filters push into the scan") {
    val s = spark
    val dir = Files.createTempDirectory("orc").toString
    val src = graft.catalog.Tables
      .load(s, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    src.write.mode("overwrite").orc(s"$dir/orders_orc")

    val back = s.read.orc(s"$dir/orders_orc")
    assert(back.count() === src.count())
    val sumBack = back.agg(round(sum("o_totalprice"), 2)).head.getDouble(0)
    val sumSrc = src.agg(round(sum("o_totalprice"), 2)).head.getDouble(0)
    assert(sumBack === sumSrc)

    val q = back.filter(col("o_orderkey") === 42L)
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("o_orderkey"),
      scan)
  }
}
