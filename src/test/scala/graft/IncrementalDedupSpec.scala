package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.etl.{IncrementalDedup, Snapshots}

/** Incremental signature-store dedup ([[graft.etl.IncrementalDedup]]):
  * a new batch checks against the stored corpus in O(batch), exact and
  * near duplicates are caught, novel docs pass and their signatures
  * join the store for the NEXT round.
  */
class IncrementalDedupSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def corpus: DataFrame =
    spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")

  private def textOf(id: Long): String =
    corpus.filter(col("doc_id") === id).collect()(0).getString(1)

  test("batch dedups against stored signatures; store grows incrementally") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("sigstore").toString

    // round 0: sign the whole corpus once, publish as snapshot v1
    Snapshots.commit(IncrementalDedup.sign(corpus), root, Snapshots.Overwrite)

    // batch 1: an exact copy of doc 0, a near-copy of doc 149 (99 words;
    // one appended word keeps shingle-Jaccard at 96/98 ≈ 0.98), and a
    // genuinely novel doc
    val batch1 = Seq(
      (10001L, textOf(0)),
      (10002L, textOf(149) + " appended"),
      (10003L, "an entirely novel document about nothing in the corpus " +
        "with plenty of distinct words to shingle deterministically"))
      .toDF("doc_id", "text")

    val (kept1, dups1) = IncrementalDedup.ingest(batch1, root)
    val dupMap = dups1.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(dupMap.contains(10001L) && dupMap(10001L)._1 === 0L)
    assert(dupMap(10001L)._2 === 1.0) // exact copy verifies at J = 1
    assert(dupMap.contains(10002L) && dupMap(10002L)._1 === 149L)
    assert(dupMap(10002L)._2 >= 0.9 && dupMap(10002L)._2 < 1.0)
    assert(!dupMap.contains(10003L)) // novel doc passes
    assert(kept1.collect().map(_.getLong(0)).toSeq === Seq(10003L))

    // store grew by exactly the kept doc (append snapshot v2)
    assert(Snapshots.versions(spark, root) === Seq(1, 2))
    assert(Snapshots.read(spark, root).count() === corpus.count() + 1)

    // round 2: a copy of the PREVIOUS round's novel doc is now a dup —
    // the store is incremental, not frozen at the initial corpus
    val batch2 = Seq((20001L,
      "an entirely novel document about nothing in the corpus " +
        "with plenty of distinct words to shingle deterministically"))
      .toDF("doc_id", "text")
    val (kept2, dups2) = IncrementalDedup.ingest(batch2, root)
    val d2 = dups2.collect()
    assert(d2.length === 1 && d2(0).getLong(0) === 20001L &&
      d2(0).getLong(1) === 10003L && d2(0).getDouble(2) === 1.0)
    assert(kept2.isEmpty)
    // nothing kept → still only the one appended signature beyond v1
    assert(Snapshots.read(spark, root).count() === corpus.count() + 1)
  }

  test("only (band, doc_id) crosses the candidate join — no shingle arrays") {
    val sig = IncrementalDedup.sign(corpus.limit(10))
    val dups = IncrementalDedup.dupsAgainst(sig, sig, minJaccard = 0.9)
    val plan = dups.queryExecution.optimizedPlan.toString
    // the candidate join's inputs must not carry `sh`: the shingle arrays
    // may only re-enter via the post-distinct verification joins
    val joins = plan.linesIterator.filter(_.contains("Join")).toList
    assert(joins.nonEmpty)
    val bandJoin = joins.last // innermost printed last: the band join
    assert(bandJoin.contains("band"), bandJoin)
    assert(!bandJoin.contains("sh#"), s"shingles crossed the band join: $bandJoin")
  }
}
