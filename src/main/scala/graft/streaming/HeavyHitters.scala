package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SpaceSaving heavy hitters — the bounded-state streaming twin
  * of the batch top-k queries (q102 exact heavy hitters, q210 count-min):
  * per stream key (event type) the state is a capacity-m SpaceSaving
  * summary `item → (count, err)`; when a new item arrives at a full
  * summary it REPLACES the current minimum, inheriting its count (the
  * Metwally et al. scheme). Guarantees: every item with true count
  * > N/m is present, and each reported count overestimates its true
  * count by at most its recorded `err` (≤ N/m). After each micro-batch
  * the key emits its current top-k snapshot stamped with a batch
  * sequence number, so a consumer reads the latest batch per key.
  *
  * Determinism contract: SpaceSaving is arrival-order dependent, so rows
  * are folded in (item)-sorted order WITHIN each batch and the
  * cross-batch order is whatever the source delivers — the parity spec
  * replays the identical per-batch fold on the JVM. Eviction picks the
  * minimum by (count, item) — a total order, no tie ambiguity.
  *
  * Scale notes: state is O(m) entries per key — independent of stream
  * length (the entire point vs the exact q102 aggregation); keys shard
  * horizontally. With m ≥ the key's true item cardinality the summary
  * IS exact (err 0 everywhere) — the spec pins both regimes.
  */
object HeavyHitters {

  final case class Obs(key: String, item: Long)

  final case class Hitter(key: String, batch: Long, rank: Int, item: Long,
      cnt: Long, err: Long)

  /** state: (batchNo, summary item → (count, err)) */
  def topKWithState(obs: Dataset[Obs], m: Int, k: Int): Dataset[Hitter] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Map[Long, (Long, Long)]), Hitter](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Obs],
            state: GroupState[(Long, Map[Long, (Long, Long)])]) =>
          val (batch0, sum0) = state.getOption.getOrElse(
            (0L, Map.empty[Long, (Long, Long)]))
          var sum = sum0
          rows.toSeq.map(_.item).sorted.foreach { it =>
            sum.get(it) match {
              case Some((c, e)) => sum = sum.updated(it, (c + 1, e))
              case None if sum.size < m => sum = sum.updated(it, (1L, 0L))
              case None =>
                val (minItem, (minCnt, _)) =
                  sum.minBy { case (i, (c, _)) => (c, i) }
                sum = (sum - minItem).updated(it, (minCnt + 1, minCnt))
            }
          }
          val batch = batch0 + 1
          state.update((batch, sum))
          sum.toSeq
            .sortBy { case (i, (c, _)) => (-c, i) }
            .take(k).zipWithIndex
            .map { case ((i, (c, e)), r) =>
              Hitter(key, batch, r + 1, i, c, e)
            }.iterator
      }
  }
}
