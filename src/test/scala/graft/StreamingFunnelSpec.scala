package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.queries.ExperimentsPack
import graft.streaming.Funnel
import graft.streaming.Funnel.FunnelEvent

/** Exact batch parity for the stateful streaming funnel: replaying the
  * real event stream (the q199 input) through flatMapGroupsWithState
  * across micro-batch boundaries must land every user on the same final
  * level as the batch in-row DP fold — the state hand-off between
  * batches IS the fold's accumulator. Also pins the ordering contract:
  * an event behind the per-user cursor fails loudly.
  */
class StreamingFunnelSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"
  private val windowUs = 604800000000L

  private lazy val stream: Seq[FunnelEvent] =
    graft.catalog.Tables.load(spark, dir, "events")
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), expr("ts div 1000").as("us"),
        when(col("event_type") === "view", 1)
          .when(col("event_type") === "click", 2).otherwise(3).as("c"))
      .orderBy("us", "c") // global delivery order: per-key order follows
      .collect()
      .map(r => FunnelEvent(r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSeq

  test("streaming funnel equals the batch DP after batch-split replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val q = Funnel.levelsWithState(mem.toDS(), windowUs)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, rest) = stream.splitAt(stream.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
      // one emitted level per input event
      assert(s.table("funnel_out").count() === stream.size)
      // final level per user == the batch fold's level
      val streamed = s.table("funnel_out")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("userId").orderBy(col("us").desc)))
        .filter(col("rn") === 1)
        .select("userId", "level").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val batch = ExperimentsPack.funnelState(
        graft.catalog.Tables.load(s, dir, "events"), windowUs)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(streamed === batch)
      // levels only ever go up along a user's emitted sequence
      val monotone = s.table("funnel_out")
        .withColumn("prev", lag("level", 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("userId").orderBy("us")))
        .filter(col("prev").isNotNull && col("level") < col("prev"))
        .count()
      assert(monotone === 0L)
    } finally q.stop()
  }

  test("an event behind the per-user cursor fails loudly") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val q = Funnel.levelsWithState(mem.toDS(), windowUs)
      .writeStream.format("memory").queryName("funnel_ooo")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(FunnelEvent(1L, 100L, 1))
      q.processAllAvailable()
      mem.addData(FunnelEvent(1L, 50L, 2)) // behind the cursor
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("out-of-order") ||
        String.valueOf(e.getCause).contains("out-of-order"))
    } finally q.stop()
  }
}
