package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q332's LOCF forward-fill: readings arrive in
  * key order (a sparse measurement along an axis — time, length, …)
  * and every row emits the latest NON-NULL reading at-or-below its
  * key, exactly the batch `last_value(v) IGNORE NULLS OVER (ORDER BY k
  * RANGE UP..CR)` row, in exact values (bit-parity with batch q332 by
  * construction).
  *
  * The state contrast with [[BurstMonitor]] is the point: a trailing
  * BAND needs the band-width buffer, but LOCF's carry is ONE value —
  * state is O(1) at any stream length (`lastKey`, `carry`). The same
  * structural facts hold: LOCF is append-only at tie-run grain (a new
  * row can never change an emitted row's fill — its frame ends at its
  * own key), batches must arrive in non-decreasing max-key order, and
  * EQUAL-KEY rows must share a batch (the batch RANGE frame reaches
  * through the whole tie run; inputs are functions of the key, so runs
  * are value-constant and the run's own non-null value wins for every
  * peer). Within a batch, order is free. Exactly-once delivery is the
  * engine's checkpoint contract ([[CmsStream]]'s note) — O(1) state
  * cannot dedup redeliveries the way [[BurstMonitor]]'s horizon
  * buffer can.
  */
object ForwardFill {

  final case class Reading(id: Long, k: Long, v: Option[Long])

  final case class Filled(id: Long, k: Long, v: Option[Long],
      locf: Option[Long])

  final case class Carry(lastKey: Long, carry: Option[Long])

  def fill(rows: Dataset[Reading]): Dataset[Filled] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[Carry, Filled](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Int, it: Iterator[Reading], state: GroupState[Carry]) =>
          var st = state.getOption.getOrElse(Carry(Long.MinValue, None))
          val batch = it.toSeq.sortBy(r => (r.k, r.id))
          val out = Seq.newBuilder[Filled]
          // walk key runs ascending: the run's (constant) non-null
          // value wins for every peer, else the carry from below
          batch.groupBy(_.k).toSeq.sortBy(_._1).foreach {
            case (k, run) =>
              val runVal = run.flatMap(_.v).headOption
              val fillV = runVal.orElse(st.carry)
              run.foreach(r => out += Filled(r.id, r.k, r.v, fillV))
              st = Carry(k, fillV)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
