package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q320's trailing value-band burst monitor: events
  * arrive in micro-batches and every event emits its trailing-30s band
  * aggregates — count, min/max/sum of user — exactly the batch
  * `RANGE BETWEEN 30s PRECEDING AND CURRENT ROW` window over the event
  * time, in exact integers (bit-parity with batch q320 by
  * construction).
  *
  * The structural fact the twin exploits: a TRAILING band is
  * APPEND-ONLY — an arriving event can never change an already-emitted
  * row's band (its band ends at its own timestamp), so each event
  * emits exactly once and the stream needs no retraction channel. The
  * state is the band-horizon buffer: events with `ts ≥ maxTs − 30s`,
  * keyed by event id so at-least-once REDELIVERY is idempotent while
  * the redelivered events are inside the horizon (the dedup the
  * sum-based [[CmsStream]] cannot have; older redeliveries are the
  * checkpoint contract's job, as there). Events older than
  * the horizon are evicted after each batch — state is the 30-second
  * event density at ANY stream length, the same band-width bound the
  * batch rewrite's value buckets carry. Batches must arrive in
  * non-decreasing max-timestamp order for eviction to be safe (the
  * watermark contract), and EQUAL-TIMESTAMP events must share a batch:
  * the batch RANGE frame's CURRENT ROW reaches through the whole tie
  * run, so peers see each other — append-only holds at tie-run grain,
  * not row grain. WITHIN a batch order is free, and any tie-boundary
  * split of the event log yields identical emissions.
  *
  * One global group mirrors q320's global ORDER BY ts monitor — the
  * sequential grain is inherent to a total-order band; per-key
  * monitors shard by adding the key to groupByKey.
  */
object BurstMonitor {

  final case class Ev(eventId: Long, tsUs: Long, userId: Long)

  final case class Band(eventId: Long, tsUs: Long, userId: Long,
      bandEvents: Long, bandMinUser: Long, bandMaxUser: Long,
      bandUserSum: Long)

  final case class Buf(rows: Seq[Ev])

  val bandUs = 30000000L // 30 seconds, matching q320

  def bands(events: Dataset[Ev]): Dataset[Band] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[Buf, Band](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Int, it: Iterator[Ev], state: GroupState[Buf]) =>
          val old = state.getOption.map(_.rows).getOrElse(Seq.empty)
          val seen = old.map(_.eventId).toSet
          // redelivery dedup: an event id already in the horizon
          // buffer was emitted by the batch that first carried it
          val fresh = it.toSeq.filterNot(e => seen(e.eventId))
            .groupBy(_.eventId).map(_._2.head).toSeq
          val all = (old ++ fresh).sortBy(e => (e.tsUs, e.eventId))
          val out = fresh.sortBy(e => (e.tsUs, e.eventId)).map { e =>
            // inclusive lower bound: RANGE 30s PRECEDING..CURRENT ROW
            val band = all.filter(x =>
              x.tsUs >= e.tsUs - bandUs && x.tsUs <= e.tsUs)
            Band(e.eventId, e.tsUs, e.userId,
              band.size.toLong,
              band.map(_.userId).min,
              band.map(_.userId).max,
              band.map(_.userId).sum)
          }
          val horizon =
            if (all.isEmpty) Long.MinValue
            else all.map(_.tsUs).max - bandUs
          state.update(Buf(all.filter(_.tsUs >= horizon)))
          out.iterator
      }
  }
}
