package graft.streaming

import graft.functions.SrpSignature
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the [[graft.plans.CosineJoinBlocking]] contract —
  * embedding near-dup pairs `cosine ≥ τ ∧ srp-hamming ≤ m−1` mined
  * incrementally as vectors arrive, the angular sibling of
  * [[DedupStream]]'s MinHash band store:
  *
  *   - input rows are the exploded segment-store schema ([[segRows]]:
  *     one row per (segment key, vec_id, sig, vector) — segment
  *     boundaries mirror HammingJoinBlocking's scalarSeg split, width
  *     bits∕m with the last segment absorbing the remainder),
  *   - state per segment key is that bucket of the store — the
  *     (vec_id, sig, v) list whose segment hashed here so far,
  *   - each arriving vector verifies against ONLY its bucket
  *     (candidates are segment collisions, never the corpus): hamming
  *     gate, then the exact sequential-fold cosine at τ.
  *
  * EXACTLY-ONCE across buckets without a dedup pass: a qualifying pair
  * shares ≥ 1 segment (pigeonhole at hamming ≤ m−1), possibly several —
  * a pair is emitted only in the bucket whose segment index equals the
  * FIRST index where the two signatures agree (both rows provably sit
  * in that bucket), the batch rule's canonical-first-match residual
  * re-expressed as a state-side check. Duplicate deliveries of a
  * (segment, vec) row are ignored, so replay cannot double-pair.
  *
  * Parity contract: over ANY micro-batch split of a corpus, the emitted
  * pair set equals the batch contract set (q342's semantics) on the
  * same corpus at the same (τ, m, bits, seed) — a pair is found exactly
  * when its later element arrives and the earlier sits in the shared
  * canonical bucket, regardless of batch boundaries. Signature and
  * cosine use the same md5 weights and sequential double folds as the
  * batch plan → bit-equal gates.
  *
  * Scale notes: state shards at segment-key grain (the finest the
  * problem has); bucket size is the corpus density at 2^(bits∕m)
  * buckets per segment — the BASELINE.md width law governs sizing.
  * Production adds TTL/watermark eviction; semantics here are the
  * append-only store.
  */
object SrpStream {

  final case class SegRow(seg: String, vecId: Long, sig: Long,
      v: Seq[Double])

  final case class NearPair(vecId: Long, vecId2: Long, cos: Double)

  /** Segment value of `sig` under the scalarSeg split (width bits∕m,
    * last segment absorbs the remainder) — the batch rule's geometry. */
  private def segVal(sig: Long, i: Int, m: Int, bits: Int): Long = {
    val width = bits / m
    val lo = i * width
    val shifted = sig >>> lo
    if (lo + width >= bits || i == m - 1) shifted & ((1L << (bits - lo)) - 1)
    else shifted & ((1L << width) - 1)
  }

  /** The exploded segment rows of one vector — sig computed once via
    * the engine's [[SrpSignature]] kernel. */
  def segRows(vecId: Long, v: Seq[Double], m: Int, bits: Int,
      seed: String): Seq[SegRow] = {
    val sig = SrpSignature.compute(v.toArray, bits, seed)
    (0 until m).map(i => SegRow(s"$i:${segVal(sig, i, m, bits)}",
      vecId, sig, v))
  }

  private def dot(a: Seq[Double], b: Seq[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def firstSharedSeg(a: Long, b: Long, m: Int, bits: Int): Int =
    (0 until m).find(i => segVal(a, i, m, bits) == segVal(b, i, m, bits))
      .getOrElse(-1)

  def pairsWithState(rows: Dataset[SegRow], tau: Double, m: Int,
      bits: Int): Dataset[NearPair] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .groupByKey(_.seg)
      .flatMapGroupsWithState[List[(Long, Long, Seq[Double])], NearPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[SegRow],
            state: GroupState[List[(Long, Long, Seq[Double])]]) =>
          val myIdx = key.takeWhile(_ != ':').toInt
          var bucket = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[NearPair]
          it.toSeq.sortBy(_.vecId).foreach { r =>
            if (!bucket.exists(_._1 == r.vecId)) { // replay-idempotent
              bucket.foreach { case (id2, sig2, v2) =>
                if (java.lang.Long.bitCount(r.sig ^ sig2) <= m - 1 &&
                  firstSharedSeg(r.sig, sig2, m, bits) == myIdx) {
                  val cos = dot(r.v, v2) /
                    (math.sqrt(dot(r.v, r.v)) * math.sqrt(dot(v2, v2)))
                  if (cos >= tau)
                    out += NearPair(math.min(r.vecId, id2),
                      math.max(r.vecId, id2), cos)
                }
              }
              bucket = (r.vecId, r.sig, r.v) :: bucket
            }
          }
          state.update(bucket)
          out.result().iterator
      }
  }
}
