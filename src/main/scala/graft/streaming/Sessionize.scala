package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming ingestion for the clickstream domain. The reference
  * processes its event stream as batch (SURVEY.md §2.9) — this is the
  * idiomatic-Spark streaming path for the same semantics, additive to
  * parity:
  *
  *   - [[sessionAgg]]: watermark + `session_window` gap-merge aggregation —
  *     the declarative path; state is bounded per key by the watermark, so
  *     it runs indefinitely at cluster scale.
  *   - [[sessionizeWithState]]: `flatMapGroupsWithState` custom sessionizer
  *     — the imperative-state path for semantics `session_window` can't
  *     express (emits one row per *closed* session with first/last event
  *     types, closing on event-time timeout).
  *
  * Both consume any streaming DataFrame with (user_id, event_type, ts_ts);
  * production source would be `spark.readStream.format("parquet"/"kafka")`,
  * tests use MemoryStream. Batch twin: WindowsPack q43/q44 and the
  * session_window batch query (MultimodalStreamPack q49).
  */
object Sessionize {

  /** Watermarked gap-session aggregation (30-min gap, 1-h late tolerance). */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_ts", "1 hour")
      .groupBy(session_window(col("ts_ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  final case class Ev(user_id: Long, event_type: String,
      ts_ts: java.sql.Timestamp, value: Double)

  final case class SessionState(
      start: Long, last: Long, n: Int, first_type: String, last_type: String)

  final case class ClosedSession(
      user_id: Long, start_ms: Long, end_ms: Long, n_events: Int,
      first_type: String, last_type: String)

  private val gapMs = 30L * 60 * 1000

  /** Custom stateful sessionizer: closes a session when no event arrives
    * within the gap (event-time timeout keyed by watermark). One state
    * object per active user — bounded memory, horizontally partitioned by
    * the groupByKey hash shuffle.
    */
  def sessionizeWithState(events: Dataset[Ev]): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts_ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(uid, s.start, s.last, s.n,
              s.first_type, s.last_type))
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts_ts.getTime, e.event_type))
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts_ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1,
                    last_type = e.event_type))
                case Some(s) =>
                  closed ::= ClosedSession(uid, s.start, s.last, s.n,
                    s.first_type, s.last_type)
                  cur = Some(SessionState(t, t, 1, e.event_type, e.event_type))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.event_type, e.event_type))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
