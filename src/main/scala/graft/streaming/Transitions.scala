package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch transition-matrix query (WindowsPack q145):
  * per-user first-order Markov transitions emitted incrementally. Batch
  * computes `lag(event_type) over (partition by user order by ts)` in one
  * window pass; the streaming form keeps ONE string of state per user (the
  * last seen event_type) and emits a (prev → curr) row per arriving event,
  * with the synthetic START state for a user's first-ever event — exactly
  * the batch semantics, so the downstream count/probability aggregation is
  * shared.
  *
  * Scale notes: state is O(active users) × one small string — the smallest
  * possible stateful-streaming footprint; the groupByKey hash shuffle
  * partitions it horizontally. Production would add an event-time timeout
  * to expire dormant users (the sessionizer's pattern); kept timeout-free
  * here because the transition semantics themselves never expire.
  *
  * Ordering contract: within a micro-batch events sort by event time
  * (ties by type); ACROSS batches the source must deliver in event-time
  * order per user (true for replayed logs and for watermarked upstream
  * dedup) — the same contract every incremental lag/CDC consumer carries.
  */
object Transitions {

  final case class TEv(user_id: Long, event_type: String,
      ts_ts: java.sql.Timestamp)

  final case class Transition(user_id: Long, prev: String, event_type: String)

  def transitionsWithState(events: Dataset[TEv]): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[String, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[TEv], state: GroupState[String]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts_ts.getTime, e.event_type))
          var prev = state.getOption.getOrElse("START")
          val out = sorted.map { e =>
            val t = Transition(uid, prev, e.event_type)
            prev = e.event_type
            t
          }
          if (sorted.nonEmpty) state.update(prev)
          out.iterator
      }
  }
}
