package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch Duffield-Lund-Thorup priority sampler
  * (SelectionPack q229): a fixed-size weighted sample per stream key
  * whose subset-sum estimator stays unbiased as the stream grows —
  * bounded O(k) state where the exact q238-style aggregate would need
  * the full stream.
  *
  * The top-(k+1)-by-priority set is a MERGEABLE sketch: the state after
  * any micro-batch split equals the batch computation over the rows seen
  * so far (top-(k+1) of a union = top-(k+1) of tops), so the final
  * snapshot is bit-identical to q229's global-window form — the spec
  * pins that, including the estimator (`Σ max(cents, τ)` over the k
  * sample rows, τ = the (k+1)-th priority key, 0 while the key has ≤ k
  * items). Priorities are q229's exact integer keys
  * `(cents·2³²) div (md5u32("prio|"+id)+1)` — deterministic md5, no RNG
  * state to replay. Items redelivered at-least-once are recognized by id
  * and ignored.
  *
  * Emission: one [[Est]] snapshot per (key, batch) — consumers read the
  * latest batch per key (the [[HeavyHitters]] contract).
  */
object PrioritySampler {

  final case class Obs(key: String, id: Long, cents: Long)

  final case class Est(key: String, batch: Long, n_seen: Long,
      n_sample: Int, tau: Long, est_cents: Long)

  private[graft] def md5u32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  /** q229's exact integer priority key. */
  private[graft] def priKey(cents: Long, id: Long): Long =
    cents * 4294967296L / (md5u32(s"prio|$id") + 1)

  /** state: (batchNo, nSeen, top-(k+1) items as (priKey, id, cents)
    * sorted by (priKey desc, id asc) — q229's total order).
    */
  def sampleWithState(obs: Dataset[Obs], k: Int): Dataset[Est] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Long, List[(Long, Long, Long)]), Est](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Obs],
            state: GroupState[(Long, Long, List[(Long, Long, Long)])]) =>
          val (batch0, seen0, top0) = state.getOption.getOrElse(
            (0L, 0L, List.empty[(Long, Long, Long)]))
          val known = top0.map(_._2).toSet
          // replay-idempotent only for items still inside the sketch: an
          // evicted item's redelivery is indistinguishable from a new one
          // (it would re-lose against the same τ anyway, so the sketch —
          // but not n_seen — is unaffected; at-least-once sources should
          // dedup upstream of the counter if n_seen must be exact)
          val fresh = rows.toSeq.filterNot(r => known.contains(r.id))
            .distinct
          val merged = (top0 ++ fresh.map(r =>
              (priKey(r.cents, r.id), r.id, r.cents)))
            .sortBy { case (pk, id, _) => (-pk, id) }
            .take(k + 1)
          val seen = seen0 + fresh.size
          val batch = batch0 + 1
          state.update((batch, seen, merged))
          val (sample, rest) = merged.splitAt(k)
          val tau = rest.headOption.map(_._1).getOrElse(0L)
          val est = sample.map { case (_, _, c) => math.max(c, tau) }.sum
          Iterator.single(
            Est(key, batch, seen, sample.size, tau, est))
      }
  }
}
