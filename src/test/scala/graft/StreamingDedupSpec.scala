package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.functions.MinHashLsh
import graft.streaming.DedupStream
import graft.streaming.DedupStream.BandRow

/** Batch parity for the streaming band-bucket near-dup miner: the
  * distinct pair set the stream emits over micro-batch splits must equal
  * the batch q62 `minhashPairs` verified pairs on the same (union-doubled)
  * corpus, with bit-equal jaccard doubles; redelivered (band, doc) rows
  * must not double-pair.
  */
class StreamingDedupSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val bandRows: Seq[BandRow] = {
    val d = graft.catalog.Tables.load(spark, sf, "documents")
      .select("doc_id", "text")
    val doubled = d.union(
      d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    MinHashLsh.signatures(doubled)
      .select(col("doc_id"), col("sh"), explode(col("bands")).as("band"))
      .collect()
      .map(r => BandRow(r.getString(2), r.getLong(0), r.getSeq[String](1)))
      .sortBy(_.docId)
  }

  private lazy val batchPairs: Seq[(Long, Long, Double)] =
    SparkEntry.queries("q62_minhash_lsh")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted

  test("streaming band-bucket pairs equal batch q62 across micro-batch splits") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[BandRow]
    val q = DedupStream.pairsWithState(mem.toDS())
      .writeStream.format("memory").queryName("dedup_pairs")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, rest) = bandRows.splitAt(bandRows.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      // redeliver a slice of batch 2 alongside batch 3 (at-least-once):
      // already-seen (band, doc) rows must be ignored, not re-paired
      mem.addData((b2.take(b2.size / 4) ++ b3): _*); q.processAllAvailable()
      val streamed = s.table("dedup_pairs")
        .select("docId", "docId2", "jaccard").distinct()
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
      assert(streamed.nonEmpty, "doubled corpus must yield near-dup pairs")
      assert(streamed === batchPairs)
      // multiplicity check: no pair may exceed the band count (and the
      // redelivery must not have inflated any pair's emission count)
      val counts = s.table("dedup_pairs")
        .groupBy("docId", "docId2").count().collect().map(_.getLong(2))
      assert(counts.forall(_ <= MinHashLsh.nBands.toLong),
        "a pair can be emitted at most once per shared band")
    } finally q.stop()
  }
}
