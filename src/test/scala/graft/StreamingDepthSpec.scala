package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{Ingest, Sessionize}
import graft.streaming.Sessionize.Ev

/** Streaming-ingestion depth: watermarked dedup, stream–static
  * enrichment, and the idempotent foreachBatch upsert sink.
  */
class StreamingDepthSpec extends SparkSpecBase {

  private val base = 1700000000000L
  private def ts(min: Long): Timestamp = new Timestamp(base + min * 60000L)

  final case class IdEv(event_id: Long, user_id: Long, ts_ts: Timestamp)

  test("dropDuplicatesWithinWatermark drops redelivered ids across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[IdEv]
    val q = Ingest.dedup(mem.toDF(), "event_id", "ts_ts", "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(IdEv(1, 10, ts(0)), IdEv(2, 11, ts(1)), IdEv(1, 10, ts(0)))
      q.processAllAvailable()
      // second batch redelivers id 1 and 2 (inside the watermark horizon)
      mem.addData(IdEv(2, 11, ts(1)), IdEv(3, 12, ts(2)))
      q.processAllAvailable()
      val ids = s.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-static enrich joins the dimension without shuffling the stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dim = Seq((10L, "pro"), (11L, "free")).toDF("user_id", "tier")
    val mem = MemoryStream[Ev]
    val q = Ingest.enrich(mem.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(Ev(10L, "click", ts(0), 1.0), Ev(12L, "view", ts(1), 2.0))
      q.processAllAvailable()
      val rows = s.table("enriched").select("user_id", "tier")
        .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(rows === Set((10L, Some("pro")), (12L, None)))
    } finally q.stop()
  }

  test("foreachBatch upsert sink is idempotent under batch replay") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("upsert_sink")
    val path = dir.resolve("target").toString
    val b1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val b2 = Seq((2L, "B"), (3L, "c")).toDF("k", "v")
    Ingest.upsertBatch(path, b1, "k")
    Ingest.upsertBatch(path, b2, "k")
    // replayed micro-batch (at-least-once delivery) must not change state
    Ingest.upsertBatch(path, b2, "k")
    val out = s.read.parquet(path).as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "a", 2L -> "B", 3L -> "c"))
  }
}
