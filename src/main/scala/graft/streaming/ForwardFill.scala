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

  final case class Carry2(lastKey: Long, lastId: Long,
      carry: Option[Long])

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

  /** TIEBREAK variant — streaming twin of the batch MULTI-KEY LOCF
    * `last_value(v, true) OVER (ORDER BY k, id ROWS UP..CR)` (the
    * round-11 GlobalRankRewrite arm). The id tiebreak makes the order
    * TOTAL, which loosens [[fill]]'s batch contract in one direction
    * and tightens it in another: batches may split ANYWHERE — even
    * mid-tie-run, because a ROWS frame over a total order never
    * reaches forward through peers — but rows must now arrive in
    * non-decreasing (k, id) TUPLE order, not just key order. State
    * stays O(1): the last tuple seen and one carry (a row's fill is
    * its own value if non-null, else the nearest preceding non-null
    * in tuple order — append-only at row grain).
    */
  def fillTiebreak(rows: Dataset[Reading]): Dataset[Filled] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[Carry2, Filled](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Int, it: Iterator[Reading], state: GroupState[Carry2]) =>
          var st = state.getOption
            .getOrElse(Carry2(Long.MinValue, Long.MinValue, None))
          val out = Seq.newBuilder[Filled]
          it.toSeq.sortBy(r => (r.k, r.id)).foreach { r =>
            val fillV = r.v.orElse(st.carry)
            out += Filled(r.id, r.k, r.v, fillV)
            st = Carry2(r.k, r.id, fillV)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
