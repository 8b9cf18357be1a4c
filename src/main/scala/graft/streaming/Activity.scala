package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the batch DAU query (JoinsAggs q133's DAU branch):
  * daily distinct active users maintained incrementally. Batch computes
  * `distinct(user_id, day) → groupBy(day).count` over the full log; the
  * streaming form runs the same two stages as bounded-state operators:
  *
  *   1. `dropDuplicatesWithinWatermark(user_id, day)` — one state entry
  *      per (user, day) inside the watermark horizon, evicted as the
  *      watermark advances past the day. The first event a user fires on
  *      a given day survives; every later event that day is dropped
  *      before it ever reaches the aggregation (so the expensive stage
  *      sees per-user-day, not per-event, traffic — the same reduction
  *      the batch query gets from `distinct()`).
  *   2. a 1-day tumbling `window` count with the same watermark — the
  *      surviving first-events per (user, day) all land in their day's
  *      window, so `count(*)` IS `count(distinct user)` by construction.
  *      Distinct-count never has to run inside the streaming agg (Spark
  *      does not support streaming `countDistinct`; this dedup-then-count
  *      factoring is the standard way around it, and it is exactly how
  *      q133 factors the batch plan).
  *
  * Late-data contract: an event later than `horizon` behind the max seen
  * event time is dropped by both stages — the day's published count is
  * final once the watermark passes day_end + horizon. Scale: state is
  * O(active user-days within horizon) for stage 1 and O(open windows) for
  * stage 2, both hash-partitioned; nothing grows with total history.
  *
  * Run in Update mode: each trigger re-emits days whose count grew.
  * Counts are monotone per day (append-only dedup output), so a consumer
  * takes max-per-day — ActivitySpec asserts that against the batch twin.
  */
object Activity {

  /** events must carry (user_id, ts_ts: timestamp); any extra columns are
    * ignored. Returns (d: date, dau: long).
    */
  def dailyActive(events: DataFrame, horizon: String = "1 day"): DataFrame =
    events
      .select(col("user_id"), col("ts_ts"))
      .withColumn("day", to_date(col("ts_ts")))
      .withWatermark("ts_ts", horizon)
      .dropDuplicatesWithinWatermark("user_id", "day")
      .groupBy(window(col("ts_ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("dau"))
      .select(to_date(col("w.start")).as("d"), col("dau"))
}
