package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.MinHashLsh

/** Incremental near-dup deduplication: check a NEW ingest batch against an
  * already-signed corpus without ever re-pairing the corpus with itself.
  * The batch-vs-batch pipeline (q62/q66) is O(corpus²) in candidate space
  * per run; a production pipeline instead keeps a persisted *signature
  * store* — (doc_id, shingle set, band keys), the [[MinHashLsh.signatures]]
  * schema — and each ingest does O(batch) work:
  *
  *   1. sign the batch (embarrassingly parallel map),
  *   2. candidate-join batch band keys against store band keys — only
  *      `(band, doc_id)` crosses the shuffle, never shingle arrays,
  *   3. exact-Jaccard verify the O(candidates) survivors,
  *   4. append the *kept* batch rows' signatures to the store
  *      ([[Snapshots]] `Append` commit makes that step atomic and
  *      time-travelable).
  *
  * At 100 TB the store is a parquet table bucketed by band key; the
  * per-batch join touches only the buckets the batch hashes into. The
  * corpus never rescans: cost per ingest is proportional to the ingest.
  */
object IncrementalDedup {

  /** Signature-store rows for a (doc_id, text) batch. */
  def sign(docs: DataFrame): DataFrame = MinHashLsh.signatures(docs)

  /** Batch documents that near-duplicate a stored document:
    * (doc_id, dup_of, jaccard) with jaccard ≥ `minJaccard`. `store` and
    * `batchSig` both carry the [[MinHashLsh.signatures]] schema. A batch
    * doc colliding with several stored docs reports every verified match
    * (callers keep-or-drop on existence, or pick max jaccard).
    */
  def dupsAgainst(store: DataFrame, batchSig: DataFrame,
      minJaccard: Double = 0.9): DataFrame = {
    val bb = batchSig.select(col("doc_id"), explode(col("bands")).as("band"))
    val sb = store.select(col("doc_id").as("dup_of"),
      explode(col("bands")).as("band"))
    val cand = bb.join(sb, "band").select("doc_id", "dup_of").distinct()
    cand
      .join(batchSig.select(col("doc_id"), col("sh")), "doc_id")
      .join(store.select(col("doc_id").as("dup_of"), col("sh").as("sh2")),
        "dup_of")
      .withColumn("jaccard", MinHashLsh.jaccard(col("sh"), col("sh2")))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_id", "dup_of", "jaccard")
  }

  /** One full ingest round against a [[Snapshots]]-versioned signature
    * store at `storeRoot`: dedups `batch` (doc_id, text) against the
    * store's latest snapshot, appends the signatures of the SURVIVING
    * docs as a new snapshot, and returns (kept batch rows, dup report).
    */
  def ingest(batch: DataFrame, storeRoot: String)
      : (DataFrame, DataFrame) = {
    val spark = batch.sparkSession
    val sig = sign(batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val store = Snapshots.read(spark, storeRoot)
    val dups = dupsAgainst(store, sig)
    val dupIds = dups.select("doc_id").distinct()
    val keptSig = sig.join(dupIds, Seq("doc_id"), "left_anti")
    Snapshots.commit(keptSig, storeRoot, Snapshots.Append)
    val kept = batch.join(dupIds, Seq("doc_id"), "left_anti")
    (kept, dups)
  }
}
