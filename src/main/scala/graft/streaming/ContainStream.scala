package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.plans.SetSimilarityJoinBlocking]]'s
  * CONTAINMENT arm — exact `distinct(sub) ⊆ distinct(sup)` pairs mined
  * incrementally, the dedup-ingest shape ("new doc vs corpus: is it
  * covered / does it cover?"), completing the blocking quartet's set
  * family alongside [[SetSimStream]].
  *
  *   - input rows are the exploded token-store schema ([[tokenRows]]:
  *     one row per (distinct token, doc_id, sorted-distinct set), with
  *     `isMin` marking the MINIMAL token's row — the batch rule's
  *     probe key),
  *   - state per token is that bucket of the store: every doc that
  *     holds the token (the batch SUPERSET explode, at state grain),
  *   - an arriving row plays both roles against only its bucket:
  *     at its `isMin` row the doc probes stored entries as SUPERSETS
  *     (emit (doc ⊆ entry) — the batch `min(sub) = tok` equi key);
  *     at every row it answers stored `isMin` entries as their
  *     superset (emit (entry ⊆ doc)). Each ORDERED pair (sub, sup)
  *     meets exactly once — in the bucket of min(sub), via exactly one
  *     role decided by arrival order (equal sets emit both ordered
  *     pairs, matching the batch inner join with id ≠ id2).
  *
  * Parity contract: over ANY micro-batch split, the emitted pair set
  * equals the batch containment rule's inner-join result on the same
  * corpus for NON-EMPTY sets. ∅ sets explode no rows and are out of
  * scope (the batch rule routes ∅ ⊆ * through a dedicated union
  * branch whose output is |L∅|·|R| by definition — a streaming twin
  * of that is a broadcast-state full scan, not a bucket model; callers
  * filter ∅ upstream, as every dedup-ingest pipeline does). Duplicate
  * deliveries of a (token, doc) row are ignored, so replay cannot
  * double-pair.
  *
  * Scale notes: state shards at token grain; a doc is stored once per
  * distinct token — exactly the batch superset explode's footprint.
  * Production adds TTL/watermark eviction; semantics here are the
  * append-only store.
  */
object ContainStream {

  final case class ContainRow(tok: String, docId: Long,
      dk: Seq[String], isMin: Boolean)

  final case class CoverPair(subId: Long, supId: Long, subSize: Int)

  /** The exploded token rows of one document: sorted-distinct tokens,
    * head marked as the minimal (probe) token. Empty/null token sets
    * explode nothing (see the ∅ scope note in the object doc). */
  def tokenRows(docId: Long, toks: Seq[String]): Seq[ContainRow] = {
    val dk = Option(toks).getOrElse(Nil).distinct.sorted
    dk.zipWithIndex.map { case (t, i) =>
      ContainRow(t, docId, dk, isMin = i == 0)
    }
  }

  def pairsWithState(rows: Dataset[ContainRow]): Dataset[CoverPair] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .groupByKey(_.tok)
      .flatMapGroupsWithState[List[(Long, Seq[String], Boolean)],
        CoverPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (tok: String, it: Iterator[ContainRow],
            state: GroupState[List[(Long, Seq[String], Boolean)]]) =>
          var bucket = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[CoverPair]
          it.toSeq.sortBy(_.docId).foreach { r =>
            if (!bucket.exists(_._1 == r.docId)) { // replay-idempotent
              val x = r.dk.toSet
              bucket.foreach { case (id2, dk2, isMin2) =>
                if (id2 != r.docId) {
                  val y = dk2.toSet
                  // role A: the arriving doc is the SUB probing at its
                  // min token; stored entries are candidate sups
                  if (r.isMin && x.subsetOf(y))
                    out += CoverPair(r.docId, id2, x.size)
                  // role B: stored isMin entries are SUBS whose probe
                  // bucket this is; the arriving doc answers as sup
                  if (isMin2 && y.subsetOf(x))
                    out += CoverPair(id2, r.docId, y.size)
                }
              }
              bucket = (r.docId, r.dk, r.isMin) :: bucket
            }
          }
          state.update(bucket)
          out.result().iterator
      }
  }
}
