package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch EWMA query (JoinsAggs q166): the
  * y_t = αx_t + (1−α)y_{t−1} recurrence carried as ONE double of state per
  * key. Batch computes it as an in-row fold over the collected day array
  * (bounded series); the streaming form is the unbounded-series shape the
  * q166 scaladoc names — state is y_{t−1}, each arriving day emits its
  * smoothed value, and the update order inside a micro-batch is pinned by
  * sorting on event date.
  *
  * Parity contract: the recurrence seeds with the FIRST observation
  * (matching DuckDB `list_reduce` head-seeding and the batch fold), and
  * both sides execute the identical IEEE sequence per key as long as days
  * arrive in date order across batches — the same ordering contract the
  * transition tracker ([[Transitions]]) documents for replayed logs.
  *
  * Scale notes: state is O(active keys) × one double — minimal stateful
  * footprint; the groupByKey shuffle partitions keys horizontally, and a
  * production deployment adds an event-time timeout to expire dormant
  * keys (here the key space is 5 order priorities — nothing to expire).
  */
object Ewma {

  final case class DayRev(priority: String, d: java.sql.Date, rev: Double)

  final case class EwmaPoint(priority: String, d: java.sql.Date,
      ewma: Double)

  def ewmaWithState(days: Dataset[DayRev],
      alpha: Double = 0.3): Dataset[EwmaPoint] = {
    val spark = days.sparkSession
    import spark.implicits._
    days
      .groupByKey(_.priority)
      // state = (last-processed epoch-day millis, y_{t-1}): carrying the
      // date makes the cross-batch ordering contract ENFORCED, not prose —
      // a replayed/late older day fails loudly instead of silently folding
      // in as the newest observation
      .flatMapGroupsWithState[(Long, Double), EwmaPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (p: String, rows: Iterator[DayRev],
            state: GroupState[(Long, Double)]) =>
          val sorted = rows.toSeq.sortBy(_.d.getTime)
          var acc = state.getOption
          val out = sorted.map { r =>
            val y = acc match {
              case None => r.rev
              case Some((lastMs, prev)) =>
                if (r.d.getTime <= lastMs)
                  throw new IllegalStateException(
                    s"EWMA key $p: day ${r.d} arrived at or before the " +
                      "last processed day — out-of-order delivery breaks " +
                      "the recurrence")
                alpha * r.rev + (1 - alpha) * prev
            }
            acc = Some((r.d.getTime, y))
            EwmaPoint(p, r.d, y)
          }
          acc.foreach(state.update)
          out.iterator
      }
  }
}
