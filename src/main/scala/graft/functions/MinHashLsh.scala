package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.TextOps

/** The shared MinHash + banded-LSH signature construction — the single
  * source of truth for [[graft.queries.DedupPack]]'s q62/q66/q110 pipeline
  * (whose DuckDB oracles replicate it term-for-term) and for
  * [[graft.etl.IncrementalDedup]]'s persisted signature store. One
  * definition, two consumers: batch-vs-batch pair mining and
  * batch-vs-stored-corpus incremental dedup cannot drift apart.
  *
  * Construction (DedupPack scaladoc has the scale rationale):
  *   - shingles: distinct word 3-grams (whole text as one shingle when
  *     < 3 words, so no document hashes to an empty set)
  *   - k = 8 minima from ONE md5 per shingle — the i-th 8-hex-char window
  *     of md5(shingle) is hash function i, all computed in one pass by the
  *     native [[MinHashSig]] expression
  *   - 4 bands of r = 2: band key = md5(band_idx || h_{2b} || h_{2b+1});
  *     docs sharing ≥1 band key are near-dup candidates
  */
object MinHashLsh {

  val nHashes = 8
  val bandR = 2
  val nBands: Int = nHashes / bandR

  /** Distinct word-3-gram shingles of a text column. */
  def shingles(text: Column): Column = {
    val t = TextOps.toks(text)
    when(size(t) < 3, array(concat_ws(" ", t)))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(t) - 2),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1),
          element_at(t, i + 2)))))
  }

  /** All band keys from a signature array `hs` (1-based element order —
    * hash i is `hs[i+1]`).
    */
  def bandKeys(hs: Column): Column =
    array((0 until nBands).map { b =>
      md5(concat(lit(s"$b|") +:
        (b * bandR until (b + 1) * bandR)
          .map(i => element_at(hs, i + 1)): _*))
    }: _*)

  /** [[signatures]] plus the raw signature array `hs` — for estimate-
    * quality audits that compare per-component signature agreement
    * against exact Jaccard (DedupPack q188).
    */
  def signaturesFull(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .withColumn("hs",
        call_function("graft_minhash", col("sh"), lit(nHashes)))
      .select(col("doc_id"), col("sh"), col("hs"),
        bandKeys(col("hs")).as("bands"))

  /** Signature rows for a (doc_id, text) frame: (doc_id, sh, bands).
    * This is the schema of an [[graft.etl.IncrementalDedup]] signature
    * store — shingle sets ride along for exact-Jaccard verification, band
    * keys for candidate generation.
    */
  def signatures(docs: DataFrame): DataFrame =
    signaturesFull(docs).drop("hs")

  /** Exact shingle-set Jaccard between two shingle-array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)) / size(array_union(a, b))
}
