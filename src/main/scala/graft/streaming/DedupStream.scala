package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the MinHash-LSH near-dup pair miner — the
  * band-bucket variant of [[graft.etl.IncrementalDedup]]'s signature
  * store, keyed by BAND KEY with `flatMapGroupsWithState`:
  *
  *   - input rows are the exploded signature-store schema
  *     ([[graft.functions.MinHashLsh.signatures]]: one row per
  *     (band key, doc_id, shingle set)),
  *   - state per band key is that bucket of the signature store — the
  *     (doc_id, shingles) list that has hashed into the band so far,
  *   - each arriving doc exact-Jaccard-verifies against ONLY its bucket
  *     (the LSH contract: candidates are band collisions, never the
  *     corpus) and emits every verified pair, then joins the bucket.
  *
  * Parity contract: over any micro-batch split of a corpus, the DISTINCT
  * emitted pair set equals the batch miner's verified pairs (DedupPack
  * q62 `minhashPairs`) on the same corpus — a pair is found exactly when
  * its later element arrives and its earlier element sits in a shared
  * bucket, regardless of where the batch boundary fell. A pair sharing
  * several bands is emitted once per shared band (exactly like the batch
  * candidate join before its `.distinct()`); duplicate deliveries of a
  * (band, doc) row are ignored, so replay cannot double-pair. Jaccard is
  * the same exact int-ratio division as the batch/oracle form → doubles
  * are bit-equal.
  *
  * Scale notes: state is sharded at band-key grain — the finest grain
  * the problem has; each bucket holds only docs whose band collided
  * (O(true near-dups) with shingled signatures — the q62 degeneracy
  * lesson). Production adds bucket TTL/watermark eviction for unbounded
  * streams; the semantics here are the append-only signature store.
  */
object DedupStream {

  final case class BandRow(band: String, docId: Long, sh: Seq[String])

  final case class DupPair(docId: Long, docId2: Long, jaccard: Double)

  def pairsWithState(rows: Dataset[BandRow],
      minJaccard: Double = 0.9): Dataset[DupPair] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .groupByKey(_.band)
      .flatMapGroupsWithState[List[(Long, Seq[String])], DupPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[BandRow],
            state: GroupState[List[(Long, Seq[String])]]) =>
          var bucket = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[DupPair]
          // doc_id-sorted fold within the batch: deterministic, and the
          // emitted pair set is order-independent anyway (the later
          // element of a pair always finds the earlier one in-bucket)
          it.toSeq.sortBy(_.docId).foreach { r =>
            if (!bucket.exists(_._1 == r.docId)) { // replay-idempotent
              val sh = r.sh.toSet
              bucket.foreach { case (id2, sh2raw) =>
                val sh2 = sh2raw.toSet
                val inter = (sh & sh2).size
                val union = (sh | sh2).size
                val j = inter.toDouble / union
                if (j >= minJaccard)
                  out += DupPair(math.min(r.docId, id2),
                    math.max(r.docId, id2), j)
              }
              bucket = (r.docId, r.sh) :: bucket
            }
          }
          state.update(bucket)
          out.result().iterator
      }
  }
}
