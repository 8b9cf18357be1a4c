package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Raw-zone JSON ingestion — the reference's bronze zone accepts "CSV or
  * JSON (as-is)" (README.md:423-424); the CSV path is exercised by the
  * medallion pipelines, this covers the JSON-lines half with an explicit
  * schema (no inference pass — the 100 TB shape).
  */
class JsonSourceSpec extends SparkSpecBase {

  test("JSON-lines roundtrip preserves the cleaned-event relation") {
    val s = spark
    val dir = Files.createTempDirectory("json").toString
    val events = graft.etl.Medallion.factEvents(s, "/root/testdata/sf0.001")
      .select("event_id", "session_id", "customer_id", "event_type",
        "event_ts", "is_authenticated")
    events.write.mode("overwrite").json(s"$dir/events_json")
    val back = s.read.schema(events.schema).json(s"$dir/events_json")
    assert(back.count() === events.count())
    assert(back.exceptAll(events).isEmpty)
    assert(back.filter(col("customer_id") === "").count() ===
      events.filter(col("customer_id") === "").count())
  }
}
