package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{Activity, StreamJoin}

/** Streaming DAU (Activity) and stream–stream interval join (StreamJoin)
  * against their batch twins: the incremental operators must converge to
  * exactly what one batch pass over the same events computes.
  */
object StreamingActivitySpec {
  final case class AEv(user_id: Long, ts_ts: Timestamp)
  final case class P(p_id: Long, p_user: Long, p_ts: Timestamp)
  final case class C(c_user: Long, c_ts: Timestamp)
}

class StreamingActivitySpec extends SparkSpecBase {
  import StreamingActivitySpec._

  // day-aligned base so to_date/window bucketing is unambiguous
  private val day0 = 1700006400000L // 2023-11-15 00:00:00 UTC
  private def ts(dayOff: Int, min: Long): Timestamp =
    new Timestamp(day0 + dayOff * 86400000L + min * 60000L)

  test("streaming DAU equals batch distinct-user count per day") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // duplicates within a day, users spanning days, multi-batch arrival
    val batch1 = Seq(
      AEv(1, ts(0, 10)), AEv(1, ts(0, 50)), AEv(2, ts(0, 30)),
      AEv(1, ts(1, 5)), AEv(3, ts(1, 20)))
    val batch2 = Seq(
      AEv(3, ts(1, 40)), // dup (user 3, day 1) across batches
      AEv(2, ts(1, 55)), AEv(1, ts(2, 10)), AEv(4, ts(2, 15)))

    val mem = MemoryStream[AEv]
    val q = Activity.dailyActive(mem.toDF())
      .writeStream.format("memory").queryName("dau_out")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()

      // Update-mode sink holds every emitted revision; counts are
      // monotone per day so the day's final value is the max revision.
      val streamed = s.table("dau_out")
        .groupBy("d").agg(max("dau").as("dau"))
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap

      val expected = (batch1 ++ batch2).toDF()
        .select(col("user_id"), to_date(col("ts_ts")).as("d"))
        .distinct()
        .groupBy("d").agg(count(lit(1)).as("dau"))
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap

      assert(streamed === expected)
      assert(expected.values.sum === 7L) // 2 + 3 + 2 user-days
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch range join") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val purchases = Seq(
      P(100, 1, ts(0, 120)), // clicks at 61..119 match; 59 does not
      P(101, 2, ts(0, 200)), // no clicks by user 2 in window
      P(102, 1, ts(0, 180))) // picks up user-1 clicks in (120, 180]
    val clicks = Seq(
      C(1, ts(0, 59)), C(1, ts(0, 61)), C(1, ts(0, 119)),
      C(1, ts(0, 125)), C(2, ts(0, 90)))

    val pMem = MemoryStream[P]
    val cMem = MemoryStream[C]
    val q = StreamJoin.attributionPairs(pMem.toDF(), cMem.toDF())
      .writeStream.format("memory").queryName("attrib_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // interleave arrival across triggers: state must hold unmatched
      // rows until the partner side arrives
      pMem.addData(purchases(0))
      cMem.addData(clicks(0), clicks(1))
      q.processAllAvailable()
      cMem.addData(clicks(2), clicks(3), clicks(4))
      pMem.addData(purchases(1), purchases(2))
      q.processAllAvailable()

      val streamed = s.table("attrib_out")
        .select("p_id", "c_ts")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime)).toSet

      val expected = purchases.toDF().join(clicks.toDF(),
          expr("p_user = c_user AND c_ts >= p_ts - INTERVAL 1 HOUR " +
            "AND c_ts < p_ts"))
        .select("p_id", "c_ts")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime)).toSet

      assert(streamed === expected)
      // sanity: the window edges behaved (59-min click excluded for p100,
      // 61/119 included; p101 matched nothing)
      assert(streamed.map(_._1) === Set(100L, 102L))
    } finally q.stop()
  }

  test("left-outer interval join emits null rows once the watermark " +
      "proves no match") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val purchases = Seq(
      P(100, 1, ts(0, 120)), // matched by clicks at 61/119
      P(101, 2, ts(0, 200)), // user 2's only click is outside the hour
      P(102, 3, ts(0, 180))) // user 3 never clicks at all
    val clicks = Seq(
      C(1, ts(0, 61)), C(1, ts(0, 119)), C(2, ts(0, 90)))
    // far-future rows on BOTH sides: the outer join emits a purchase's
    // null row only when the GLOBAL watermark (min across inputs) passes
    // its eviction horizon, so both streams must advance
    val flushP = P(999, 98, ts(30, 0))
    val flushC = C(99, ts(30, 0))

    val pMem = MemoryStream[P]
    val cMem = MemoryStream[C]
    val q = StreamJoin.attributionWithUnmatched(pMem.toDF(), cMem.toDF())
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode(OutputMode.Append()).start()
    try {
      pMem.addData(purchases: _*)
      cMem.addData(clicks: _*)
      q.processAllAvailable()
      // before the watermark moves, the unmatched purchases must NOT
      // have emitted null rows (a match could still arrive)
      val early = s.table("attrib_outer").collect()
        .filter(_.isNullAt(3)).map(_.getLong(0)).toSet
      assert(early === Set.empty[Long], "premature null emission")
      pMem.addData(flushP)
      cMem.addData(flushC)
      q.processAllAvailable()

      val streamed = s.table("attrib_outer")
        .filter(col("p_id") =!= 999)
        .select("p_id", "c_ts")
        .collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(1)).map(_.getTime)))
        .toSet
      val expected = purchases.toDF().join(clicks.toDF(),
          expr("p_user = c_user AND c_ts >= p_ts - INTERVAL 1 HOUR " +
            "AND c_ts < p_ts"), "left_outer")
        .select("p_id", "c_ts")
        .collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(1)).map(_.getTime)))
        .toSet

      assert(streamed === expected)
      // the two no-match purchases surfaced exactly once, as null rows
      assert(streamed.filter(_._2.isEmpty).map(_._1) === Set(101L, 102L))
    } finally q.stop()
  }
}
