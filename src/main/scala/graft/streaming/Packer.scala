package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch greedy sequence packer
  * ([[graft.queries.RobustOpsPack]] q222): documents arrive per
  * (source, shard) in doc_id order and are placed into fixed-capacity
  * context windows by the SAME fold — state is the [bin, fill] pair the
  * batch query carries through its in-row `aggregate`, so a replay of the
  * corpus through micro-batches lands every doc in the identical bin.
  *
  * Parity contract: the first doc of a key seeds (bin 1, fill n) exactly
  * like the batch fold's head-seed; subsequent docs run
  * `fill + n ≤ cap ? same bin : next bin`. Cross-batch ordering is
  * ENFORCED: the state carries the last-packed doc_id, and an older or
  * duplicate doc is routed to the DEAD-LETTER output (`bin = -1`,
  * `fill = last packed doc_id` for triage) instead of packing out of
  * order ([[Ewma]] replay-determinism doctrine). The contract stays loud —
  * violations are visible rows the caller can alert on — without being
  * query-fatal: a thrown exception here would crash-loop the whole
  * streaming query on the first late replay from a source without
  * per-key ordered cross-batch delivery, turning one bad record into an
  * outage. Dead-lettered docs do NOT advance the packer state, so a
  * violation never corrupts subsequent bin assignment.
  *
  * Scale notes: state is O(active keys) × three longs; keys (source ×
  * shard) spread the sequential constraint horizontally — exactly the
  * per-shard grain the batch query uses, so a production packer adds
  * shards, not state.
  */
object Packer {

  final case class Doc(source: String, shard: Long, docId: Long, n: Long)

  final case class Placed(source: String, shard: Long, docId: Long,
      bin: Long, fill: Long)

  def packWithState(docs: Dataset[Doc], cap: Long = 256L):
      Dataset[Placed] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .groupByKey(d => (d.source, d.shard))
      // state = (lastDocId, bin, fill)
      .flatMapGroupsWithState[(Long, Long, Long), Placed](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (String, Long), rows: Iterator[Doc],
            state: GroupState[(Long, Long, Long)]) =>
          val sorted = rows.toSeq.sortBy(_.docId)
          var acc = state.getOption
          val out = sorted.map { d =>
            val n = math.min(d.n, cap)
            acc match {
              case Some((lastId, _, _)) if d.docId <= lastId =>
                // ordering violation → dead-letter row, state untouched:
                // bin = -1 flags it; fill echoes the doc_id it collided
                // with so the alert carries its own diagnosis
                Placed(key._1, key._2, d.docId, -1L, lastId)
              case prev =>
                val (bin, fill) = prev match {
                  case None => (1L, n)
                  case Some((_, b, f)) =>
                    if (f + n <= cap) (b, f + n) else (b + 1, n)
                }
                acc = Some((d.docId, bin, fill))
                Placed(key._1, key._2, d.docId, bin, fill)
            }
          }
          acc.foreach(state.update)
          out.iterator
      }
  }
}
