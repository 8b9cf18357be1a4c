package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q282's vocabulary-growth (Heaps) checkpoints — the
  * always-current vocabulary-drift monitor a corpus curator watches while
  * data is still arriving: 3-gram shingle rows stream in micro-batches,
  * the seen-shingle set lives in `flatMapGroupsWithState` state sharded
  * by a deterministic shingle hash, and every batch each touched shard
  * emits its refreshed cumulative vocabulary size, novel-this-batch
  * count, and shingle throughput. Summing the latest checkpoint across
  * shards reproduces batch q282's final (vocab_cum, shingles_cum) row
  * exactly (StreamingDriftSpec pins bit parity and the prefix law).
  *
  * First-occurrence accounting is what makes this incremental (the same
  * property q282 exploits batch-side): a shingle contributes to the
  * vocabulary exactly once, at the first batch that carries it, so
  * set-insert state needs no ordering contract and is IDEMPOTENT under
  * at-least-once redelivery — a replayed batch adds zero novel shingles
  * and leaves vocabCum bit-identical. The throughput counter
  * (shinglesCum) is a sum, NOT idempotent — the same contrast CmsStream
  * scaladocs against NdvStream's register max: redelivery inflates
  * throughput but can never corrupt the vocabulary curve, and the spec
  * pins both directions.
  *
  * State is the vocabulary itself — Heaps-bounded (sublinear in corpus
  * size; q282/q287 measure the curve), and sharded so no single group's
  * state or per-batch iterator concentrates the key space: shards scale
  * with the cluster, each holding |V|/shards strings. That is the honest
  * cost of EXACT drift accounting, the same stance as CcStream's
  * union-find; when the vocabulary itself outgrows memory, the sketch
  * answer is NdvStream (constant registers, ~13% band).
  */
object VocabDrift {

  final case class ShingleRow(shard: Int, sh: String)

  final case class DriftCheckpoint(shard: Int, seq: Long, nShingles: Long,
      novel: Long, vocabCum: Long, shinglesCum: Long)

  final case class VocabState(seen: Seq[String], shinglesCum: Long, seq: Long)

  val shards = 16

  /** Deterministic shard of a shingle: positive JVM string hash mod
    * `shards`. Any stable function works — correctness never depends on
    * the sharding (each shingle's first occurrence lands wherever all
    * its occurrences land); it only spreads state. */
  def shardOf(sh: String): Int = math.floorMod(sh.hashCode, shards)

  def checkpointsWithState(rows: Dataset[ShingleRow]): Dataset[DriftCheckpoint] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .groupByKey(_.shard)
      .flatMapGroupsWithState[VocabState, DriftCheckpoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard: Int, it: Iterator[ShingleRow], state: GroupState[VocabState]) =>
          val st = state.getOption.getOrElse(VocabState(Seq.empty, 0L, 0L))
          val seen = scala.collection.mutable.HashSet.empty[String]
          seen ++= st.seen
          var n = 0L
          var novel = 0L
          it.foreach { r =>
            n += 1
            if (seen.add(r.sh)) novel += 1
          }
          val next =
            VocabState(seen.toSeq, st.shinglesCum + n, st.seq + 1)
          state.update(next)
          Iterator.single(DriftCheckpoint(shard, next.seq, n, novel,
            seen.size.toLong, next.shinglesCum))
      }
  }
}
