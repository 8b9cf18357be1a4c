package graft

import org.apache.spark.sql.functions._
import graft.etl.Medallion
import graft.gen.Clickstream

class ClickstreamSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  test("generator is deterministic: two runs produce identical rows") {
    val a = Clickstream.generate(spark, sf).collect().toSet
    val b = Clickstream.generate(spark, sf).collect().toSet
    assert(a === b && a.nonEmpty)
  }

  test("generator emits funnel shape: 5-7 events per purchase session") {
    val g = Clickstream.generate(spark, sf)
      .filter(col("session_id").startsWith("s"))
      .groupBy("session_id")
      .agg(countDistinct("event_id").as("n"))
      .agg(min("n"), max("n")).head()
    assert(g.getLong(0) >= 5L && g.getLong(1) <= 7L)
  }

  test("generator injects dirt; silver removes all of it") {
    val bronze = Clickstream.generate(spark, sf)
    val dupIds = bronze.groupBy("event_id").count().filter(col("count") > 1)
    assert(dupIds.count() > 0, "expected duplicate event_ids in bronze")
    assert(bronze.filter(col("event_type") === "bot_probe").count() > 0)
    assert(bronze.filter(col("event_ts") === "not-a-timestamp").count() > 0)

    val silver = Medallion.factEvents(spark, sf)
    assert(silver.groupBy("event_id").count().filter(col("count") > 1)
      .count() === 0)
    assert(silver.filter(!col("event_type")
      .isin(Clickstream.EventTypes: _*)).count() === 0)
    assert(silver.filter(col("event_ts").isNull).count() === 0)
  }

  test("empty-string customer_id survives the CSV round trip") {
    val silver = Medallion.factEvents(spark, sf)
    assert(silver.filter(col("customer_id") === "").count() > 0)
    assert(silver.filter(col("customer_id").isNull).count() === 0)
  }
}
