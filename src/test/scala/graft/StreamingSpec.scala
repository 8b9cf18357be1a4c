package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Sessionize
import graft.streaming.Sessionize.Ev

class StreamingSpec extends SparkSpecBase {

  // Base well past epoch 0: the initial watermark is 0, and events at
  // exactly the watermark are dropped as late by stateful operators.
  private val base = 1700000000000L
  private def ts(min: Long): Timestamp = new Timestamp(base + min * 60000L)

  // Two sessions for user 1 (gap 45 min > 30-min gap), one for user 2;
  // a final far-future event pushes the watermark so all sessions close.
  private val events = Seq(
    Ev(1L, "page_view", ts(0), 1.0),
    Ev(1L, "add_to_cart", ts(10), 2.0),
    Ev(1L, "purchase", ts(55), 3.0), // 45-min gap → new session
    Ev(2L, "page_view", ts(5), 4.0))

  private val flush = Ev(99L, "page_view", ts(10000), 0.0)

  test("session_window streaming aggregation closes sessions by watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    val q = Sessionize.sessionAgg(mem.toDF())
      .writeStream.format("memory").queryName("sess_agg")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      mem.addData(flush)
      q.processAllAvailable()
      val rows = s.table("sess_agg")
        .select("user_id", "n_events", "total_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(rows === Set((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 4.0)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions with types") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    val q = Sessionize.sessionizeWithState(mem.toDS())
      .writeStream.format("memory").queryName("sess_state")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      mem.addData(flush)
      q.processAllAvailable()
      val rows = s.table("sess_state")
        .select("user_id", "n_events", "first_type", "last_type")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3)))
        .toSet
      assert(rows.contains((1L, 2, "page_view", "add_to_cart")))
      assert(rows.contains((1L, 1, "purchase", "purchase")))
      assert(rows.contains((2L, 1, "page_view", "page_view")))
    } finally q.stop()
  }

  test("streaming transition tracker matches the batch lag-window semantics") {
    import graft.streaming.Transitions
    import graft.streaming.Transitions.TEv
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val batch1 = Seq(
      TEv(1L, "view", ts(0)), TEv(1L, "click", ts(1)),
      TEv(2L, "view", ts(0)))
    val batch2 = Seq( // later event times arrive in the later batch
      TEv(1L, "purchase", ts(5)), TEv(2L, "view", ts(3)),
      TEv(3L, "click", ts(4)))
    val mem = MemoryStream[TEv]
    val q = Transitions.transitionsWithState(mem.toDS())
      .writeStream.format("memory").queryName("transitions")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = s.table("transitions")
        .groupBy("prev", "event_type").count()
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      // batch q145 semantics over the union of both batches
      val w = Window.partitionBy("user_id").orderBy("ts_ts", "event_type")
      val expected = (batch1 ++ batch2).toDS()
        .withColumn("prev",
          coalesce(lag("event_type", 1).over(w), lit("START")))
        .groupBy("prev", "event_type").count()
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(streamed === expected)
      assert(streamed.contains(("START", "view", 2L)))
      assert(streamed.contains(("view", "click", 1L)))
    } finally q.stop()
  }
}
