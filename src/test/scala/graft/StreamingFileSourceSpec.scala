package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Sessionize

/** File-source streaming integration: parquet files landing in a directory
  * are the production ingestion path (`readStream.parquet`); MemoryStream
  * covers the operator logic, this covers the source plumbing — schema
  * declaration, directory watching, watermark-driven session close across
  * multiple file arrivals.
  */
class StreamingFileSourceSpec extends SparkSpecBase {

  test("readStream over landing parquet files sessionizes across batches") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("stream").toString
    val in = s"$dir/in"
    val base = 1700000000000L
    def batch(rows: Seq[(Long, String, Long, Double)]): Unit =
      rows.toDF("user_id", "event_type", "ms", "value")
        .select(col("user_id"), col("event_type"),
          // timestamp_millis, NOT cast: casting a long to timestamp
          // interprets it as epoch SECONDS
          timestamp_millis(col("ms") + base).as("ts_ts"), col("value"))
        .write.mode("append").parquet(in)

    // first file: one session for user 1 (events 0 and 10 min)
    batch(Seq((1L, "page_view", 0L, 1.0),
      (1L, "add_to_cart", 10L * 60000, 2.0)))
    val schema = s.read.parquet(in).schema
    val stream = s.readStream.schema(schema).parquet(in)
    val q = Sessionize.sessionAgg(stream)
      .writeStream.format("memory").queryName("file_sess")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // second file: 45-min gap → new session; flush event closes all
      batch(Seq((1L, "purchase", 55L * 60000, 3.0)))
      q.processAllAvailable()
      batch(Seq((9L, "page_view", 10000L * 60000, 0.0)))
      q.processAllAvailable()
      val rows = s.table("file_sess")
        .select("user_id", "n_events", "total_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(rows.contains((1L, 2L, 3.0))) // first session closed
      assert(rows.contains((1L, 1L, 3.0))) // second session closed
    } finally q.stop()
  }

  test("checkpoint recovery: a restarted query resumes without loss or dups") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("stream_ckpt").toString
    val in = s"$dir/in"
    val out = s"$dir/out"
    val ckpt = s"$dir/ckpt"
    def land(ids: Range): Unit =
      ids.map(i => (i.toLong, s"e$i")).toDF("event_id", "payload")
        .write.mode("append").parquet(in)

    land(0 until 50)
    val schema = s.read.parquet(in).schema
    def start() = s.readStream.schema(schema).parquet(in)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()

    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // hard stop — offsets live only in the checkpoint

    land(50 until 80) // arrives while no query is running
    val q2 = start() // fresh query object, same checkpoint
    try q2.processAllAvailable() finally q2.stop()

    val got = s.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted
    // exactly-once across the restart: no loss, no reprocessing
    assert(got === (0L until 80L).toArray)
  }
}
