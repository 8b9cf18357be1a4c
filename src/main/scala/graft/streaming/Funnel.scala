package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch windowed funnel (ExperimentsPack q199):
  * the earliest-anchor DP — earliest view t1, earliest click within the
  * window of t1, earliest purchase after that click still within t1's
  * window — carried as three longs of state per user instead of an
  * in-row fold over a collected array. Each arriving event emits the
  * user's funnel level as of that event, so a dashboard watches step
  * completion live instead of recomputing the batch histogram.
  *
  * Parity contract: the batch fold seeds with the user's first event in
  * (us, step-code) order and folds the rest; here the first event for a
  * key initializes the same state and later events apply the identical
  * recurrence — provided events arrive in non-decreasing (us, c) order
  * across micro-batches, the same ordering contract [[Ewma]] and
  * [[Transitions]] enforce. A violation fails loudly rather than
  * silently computing a different DP.
  *
  * Scale notes: state is O(active users) × three longs + the ordering
  * cursor — minimal; keys shard horizontally on the groupByKey shuffle.
  * Production adds an event-time timeout to expire users whose window
  * (t1 + W) has passed — their level can never change again, which is
  * exactly the GroupStateTimeout eviction condition.
  */
object Funnel {

  /** Step codes match the batch query: view=1, click=2, purchase=3. */
  final case class FunnelEvent(userId: Long, us: Long, c: Int)

  final case class FunnelLevel(userId: Long, us: Long, level: Int)

  private val Inf = Long.MaxValue

  /** (lastUs, lastC, t1, t2, t3) — the cursor enforces ordering, the
    * three timestamps are the DP state.
    */
  type State = (Long, Int, Long, Long, Long)

  def levelsWithState(events: Dataset[FunnelEvent],
      windowUs: Long = 604800000000L): Dataset[FunnelLevel] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[State, FunnelLevel](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (u: Long, rows: Iterator[FunnelEvent], state: GroupState[State]) =>
          val sorted = rows.toSeq.sortBy(e => (e.us, e.c))
          var acc = state.getOption
          val out = sorted.map { e =>
            acc = Some(acc match {
              case None =>
                (e.us, e.c, if (e.c == 1) e.us else Inf, Inf, Inf)
              case Some((lastUs, lastC, t1, t2, t3)) =>
                if (e.us < lastUs || (e.us == lastUs && e.c < lastC))
                  throw new IllegalStateException(
                    s"funnel user $u: event (${e.us}, ${e.c}) arrived " +
                      s"before the cursor ($lastUs, $lastC) — " +
                      "out-of-order delivery breaks the DP")
                val inWin = e.us - t1 <= windowUs
                (e.us, e.c,
                  if (e.c == 1) math.min(t1, e.us) else t1,
                  if (e.c == 2 && t1 < e.us && inWin) math.min(t2, e.us)
                  else t2,
                  if (e.c == 3 && t2 < e.us && inWin) math.min(t3, e.us)
                  else t3)
            })
            val (_, _, t1, t2, t3) = acc.get
            FunnelLevel(u, e.us,
              if (t3 < Inf) 3 else if (t2 < Inf) 2
              else if (t1 < Inf) 1 else 0)
          }
          acc.foreach(state.update)
          out.iterator
      }
  }
}
