package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.plans.SetSimilarityJoinBlocking]]'s
  * Jaccard arm — exact `jaccard(X, Y) ≥ s` pairs mined incrementally
  * through PREFIX-TOKEN buckets, completing the streaming trio
  * ([[DedupStream]] MinHash-LSH, [[SrpStream]] SRP cosine — both
  * probabilistic candidate models; this one is the EXACT prefix-filter
  * contract):
  *
  *   - input rows are the exploded prefix-store schema ([[prefixRows]]:
  *     one row per (prefix token, doc_id, sorted-distinct token set),
  *     prefix length |dk| − max(1, ⌈s·|dk| − ε⌉) + 1 — the batch rule's
  *     α math verbatim),
  *   - state per token is that bucket of the store,
  *   - each arriving doc exact-Jaccard-verifies against ONLY its bucket
  *     and emits a pair exactly when the bucket's token IS the pair's
  *     minimal common token — the batch rule's
  *     `token = array_min(array_intersect)` canonical as a state-side
  *     check: the minimal common token of a qualifying pair is inside
  *     BOTH prefixes (the prefix lemma), so both rows reach that bucket
  *     and no other bucket emits the pair. Exactly-once, no dedup pass.
  *
  * Parity contract: over ANY micro-batch split, the emitted pair set
  * equals the batch rule's ÷-spelling result (∅ never matches — an
  * empty set explodes no prefix rows; the ÷-free empty-true spelling
  * would need a dedicated null-token bucket and is deliberately out of
  * scope here) with the same exact int-ratio Jaccard doubles.
  * Duplicate deliveries of a (token, doc) row are ignored, so replay
  * cannot double-pair.
  *
  * Scale notes: state shards at token grain — the finest the problem
  * has; bucket population is the token's prefix-document frequency
  * (the BASELINE.md dense-corpus analysis applies: hot template tokens
  * make hot buckets, and the out-of-band stop-token ordering trades
  * into rarer buckets when the corpus warrants it). Production adds
  * TTL/watermark eviction; semantics here are the append-only store.
  */
object SetSimStream {

  final case class PrefixRow(tok: String, docId: Long, dk: Seq[String])

  final case class SimPair(docId: Long, docId2: Long, jaccard: Double)

  /** The exploded prefix rows of one document — sorted-distinct tokens
    * and the batch rule's α math (ε guard included) verbatim. */
  def prefixRows(docId: Long, toks: Seq[String],
      s: Double): Seq[PrefixRow] = {
    val dk = Option(toks).getOrElse(Nil).distinct.sorted
    val alpha = math.max(1L,
      math.ceil(s * dk.size - 1e-9).toLong)
    val plen = math.max(0L, dk.size - (alpha - 1)).toInt
    dk.take(plen).map(t => PrefixRow(t, docId, dk))
  }

  final case class OverlapPair(docId: Long, docId2: Long, common: Int)

  /** Prefix rows for the OVERLAP-THRESHOLD arm (`|X∩Y| ≥ t`): α = t is
    * a literal, so the prefix length is |dk| − t + 1 — the batch
    * rule's overlap α verbatim. */
  def overlapRows(docId: Long, toks: Seq[String],
      t: Int): Seq[PrefixRow] = {
    val dk = Option(toks).getOrElse(Nil).distinct.sorted
    val plen = math.max(0, dk.size - (t - 1))
    dk.take(plen).map(tk => PrefixRow(tk, docId, dk))
  }

  /** [[pairsWithState]]'s overlap-threshold sibling: same bucket
    * store, same minimal-common-token canonical, integer `|X∩Y| ≥ t`
    * verify — the streaming twin of the batch overlap spelling. */
  def overlapPairsWithState(rows: Dataset[PrefixRow],
      t: Int): Dataset[OverlapPair] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .groupByKey(_.tok)
      .flatMapGroupsWithState[List[(Long, Seq[String])], OverlapPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (tok: String, it: Iterator[PrefixRow],
            state: GroupState[List[(Long, Seq[String])]]) =>
          var bucket = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[OverlapPair]
          it.toSeq.sortBy(_.docId).foreach { r =>
            if (!bucket.exists(_._1 == r.docId)) { // replay-idempotent
              val x = r.dk.toSet
              bucket.foreach { case (id2, dk2) =>
                val common = x & dk2.toSet
                if (common.nonEmpty && common.min == tok && // canonical
                  common.size >= t)
                  out += OverlapPair(math.min(r.docId, id2),
                    math.max(r.docId, id2), common.size)
              }
              bucket = (r.docId, r.dk) :: bucket
            }
          }
          state.update(bucket)
          out.result().iterator
      }
  }

  def pairsWithState(rows: Dataset[PrefixRow],
      s: Double): Dataset[SimPair] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .groupByKey(_.tok)
      .flatMapGroupsWithState[List[(Long, Seq[String])], SimPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (tok: String, it: Iterator[PrefixRow],
            state: GroupState[List[(Long, Seq[String])]]) =>
          var bucket = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[SimPair]
          it.toSeq.sortBy(_.docId).foreach { r =>
            if (!bucket.exists(_._1 == r.docId)) { // replay-idempotent
              val x = r.dk.toSet
              bucket.foreach { case (id2, dk2) =>
                val y = dk2.toSet
                val common = x & y
                if (common.nonEmpty && common.min == tok) { // canonical
                  val j = common.size.toDouble / (x | y).size
                  if (j >= s)
                    out += SimPair(math.min(r.docId, id2),
                      math.max(r.docId, id2), j)
                }
              }
              bucket = (r.docId, r.dk) :: bucket
            }
          }
          state.update(bucket)
          out.result().iterator
      }
  }
}
