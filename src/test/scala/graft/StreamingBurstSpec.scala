package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.catalog.Tables
import graft.streaming.BurstMonitor
import graft.streaming.BurstMonitor.Ev

/** Batch parity for the streaming trailing-band burst monitor: every
  * event's emitted band aggregates must be BIT-EQUAL to batch q320's
  * window row for that event, under any micro-batch split of the
  * ts-ordered event log, and an in-horizon REDELIVERY of a whole batch
  * must emit nothing new (event-id dedup).
  */
class StreamingBurstSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def eventLog: Seq[Ev] =
    Tables.load(spark, sf, "events")
      .select(col("event_id"), expr("ts div 1000").as("ts_us"),
        col("user_id"))
      .collect()
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(e => (e.tsUs, e.eventId)).toSeq

  test("streaming bands equal batch q320 bit-for-bit; redelivery is idempotent") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val evs = eventLog
    assert(evs.nonEmpty)
    val mem = MemoryStream[Ev]
    val q = BurstMonitor.bands(mem.toDS())
      .writeStream.format("memory").queryName("burst_bands")
      .outputMode(OutputMode.Append()).start()
    // split only at tie-run boundaries: equal-ts peers must share a
    // batch (the monitor's documented contract — RANGE CURRENT ROW
    // reaches through the whole tie run)
    def tieSplit(xs: Seq[Ev], at: Int): (Seq[Ev], Seq[Ev]) = {
      var i = at
      while (i > 0 && i < xs.size && xs(i).tsUs == xs(i - 1).tsUs) i += 1
      xs.splitAt(i)
    }
    try {
      val (b1, rest) = tieSplit(evs, evs.size / 3)
      val (b2, b3) = tieSplit(rest, rest.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val afterB2 = s.table("burst_bands").count()
      // in-horizon redelivery: replay b2's horizon tail (events within
      // the band of b2's max ts — exactly what the state can still see;
      // older redeliveries are the checkpoint contract's job, per the
      // monitor's scaladoc) — nothing new emits
      val tail2 = b2.filter(_.tsUs >= b2.map(_.tsUs).max -
        BurstMonitor.bandUs)
      assert(tail2.nonEmpty)
      mem.addData(tail2: _*); q.processAllAvailable()
      assert(s.table("burst_bands").count() === afterB2,
        "redelivered in-horizon events must be deduped by event id")
      mem.addData(b3: _*); q.processAllAvailable()
      val streamed = s.table("burst_bands").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
        .toMap
      val batch = SparkEntry.queries("q320_burst_monitor")(spark, sf)
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
        .toMap
      assert(batch.nonEmpty && streamed.size === batch.size)
      for ((id, row) <- batch)
        assert(streamed(id) === row, s"band mismatch for event $id")
    } finally q.stop()
  }
}
