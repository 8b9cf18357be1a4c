package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Tables
import graft.functions.Vectors

/** Deduplication for LLM-training-data pipelines (BASELINE.json north-star):
  * exact, MinHash+LSH near-dup, SimHash, token-set Jaccard, and
  * embedding-cosine near-dup — each over the `documents` / `embeddings`
  * tables.
  *
  * Scale design (the point of each shape at 100 TB):
  *   - exact dedup: one hash-shuffle on the content hash; map-side partial
  *     aggregation means duplicate-heavy corpora shrink before the exchange.
  *   - MinHash LSH: the O(n²) pair space is never materialized — docs
  *     explode to (band_key, doc) rows, the self-join runs per band bucket,
  *     and only bucket-colliding candidates are exact-verified. Shuffle is
  *     hash(band_key); skewed buckets split by AQE.
  *   - Jaccard pair-join: blocked on `lang` (a real pipeline blocks on
  *     shard/domain keys) so the quadratic term is bounded per block.
  *   - SimHash: per-doc signature is embarrassingly parallel; candidate
  *     pairing is a band-bucket join on signature halves, same as LSH.
  *   - Cosine near-dup: blocked on `label` (≈ an IVF coarse cell).
  *
  * The LSH demos run on a union-doubled corpus (the testdata has no exact
  * duplicates) so recall on true dups is actually exercised; the doubling is
  * replicated verbatim in the oracle SQL.
  *
  * Oracle parity: all hashing is md5 hex (identical in both engines); token
  * sets via split-and-drop-empties (= DuckDB `list_filter(string_split…)`);
  * similarity ratios are exact-int divisions (bit-equal doubles).
  */
object DedupPack extends QueryPack {

  private def toks(c: Column): Column =
    filter(split(c, " "), t => t =!= lit(""))

  private def docToks(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        array_distinct(toks(col("text"))).as("ts"))

  /** Exact dedup — hash-groupBy on the content hash over a union-doubled
    * corpus: every text appears twice, dedup keeps one survivor per hash
    * (deterministically the min doc_id — the reproducible variant of the
    * reference's arbitrary-survivor `dropDuplicates`, README.md:190).
    */
  private def q60(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents").select("doc_id", "text")
    d.union(d)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(
        count(lit(1)).as("n_copies"),
        min("doc_id").as("keeper_doc_id"))
      .orderBy("text_hash")
  }

  /** Token-set (1-gram) Jaccard near-dup pairs, blocked by `lang`:
    * |A∩B| / |A∪B| ≥ 0.98 (calibrated to the corpus — 115 identical-set
    * pairs at sf0.01). Jaccard is an exact-int ratio → bit-equal.
    */
  private def q61(s: SparkSession, dir: String): DataFrame = {
    val a = docToks(s, dir)
    val b = a.select(col("doc_id").as("doc_id2"), col("lang").as("lang2"),
      col("ts").as("ts2"))
    a.join(b, col("lang") === col("lang2") && col("doc_id") < col("doc_id2"))
      .withColumn("jaccard",
        size(array_intersect(col("ts"), col("ts2"))) /
          size(array_union(col("ts"), col("ts2"))))
      .filter(col("jaccard") >= 0.98)
      .select("doc_id", "doc_id2", "lang", "jaccard")
      .orderBy("doc_id", "doc_id2")
  }

  // --- MinHash + banded LSH ---------------------------------------------
  // 8 hash functions = min over tokens of md5(i || '|' || token); 4 bands
  // of r=2; band key = md5(band_idx || h_{2i} || h_{2i+1}). Candidates =
  // pairs sharing ≥1 band key; verified = exact Jaccard ≥ 0.98.
  private val nHashes = 8
  private val bandR = 2
  private def minhash(i: Int): Column =
    array_min(transform(col("ts"), t => md5(concat(lit(s"$i|"), t))))
      .as(s"h$i")

  private def bandKey(b: Int): Column =
    md5(concat(lit(s"$b|") +:
      (b * bandR until (b + 1) * bandR).map(i => col(s"h$i")): _*))

  /** MinHash signatures + banded LSH candidate generation + exact-Jaccard
    * verification over the union-doubled corpus (copy ids offset by 10^6).
    * Output: verified near-dup pairs. The full scalable pipeline — explode
    * to band keys, per-bucket self-join, verify — with no O(n²) stage.
    */
  private def q62(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents").select("doc_id", "text")
    val doubled = d.union(
      d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val sig = doubled
      .select(col("doc_id"), array_distinct(toks(col("text"))).as("ts"))
      .select(Seq(col("doc_id"), col("ts")) ++
        (0 until nHashes).map(minhash): _*)
    val banded = sig.select(col("doc_id"), col("ts"),
      explode(array((0 until nHashes / bandR).map(bandKey): _*)).as("band"))
    val cand = banded.alias("x")
      .join(banded.alias("y"),
        col("x.band") === col("y.band") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("doc_id2"),
        col("x.ts").as("ts"), col("y.ts").as("ts2"))
      .distinct()
    cand
      .withColumn("jaccard",
        size(array_intersect(col("ts"), col("ts2"))) /
          size(array_union(col("ts"), col("ts2"))))
      .filter(col("jaccard") >= 0.98)
      .select("doc_id", "doc_id2", "jaccard")
      .orderBy("doc_id", "doc_id2")
  }

  // --- SimHash -----------------------------------------------------------
  // 16-bit SimHash: bit j votes +1/-1 per distinct token according to the
  // parity of hex digit j of md5(token); bit set iff the vote sum is
  // positive. (Production would widen to 64 bits over xxhash64; hex-digit
  // parity keeps the construction expressible identically in the oracle.)
  private val simBits = 16
  private val oddHex = Seq("1", "3", "5", "7", "9", "b", "d", "f")

  private def simhash(tsCol: Column): Column =
    (0 until simBits).map { j =>
      val vote = aggregate(tsCol, lit(0), (acc, t) =>
        acc + when(substring(md5(t), j + 1, 1)
          .isin(oddHex: _*), 1).otherwise(-1))
      when(vote > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Per-document 16-bit SimHash signatures + hamming-ball near-dup pairs
    * (hamming ≤ 2, blocked by lang). bit_count(xor) is the hamming distance.
    */
  private def q63(s: SparkSession, dir: String): DataFrame = {
    val sigs = docToks(s, dir)
      .select(col("doc_id"), col("lang"), simhash(col("ts")).as("simhash"))
    val b = sigs.select(col("doc_id").as("doc_id2"),
      col("lang").as("lang2"), col("simhash").as("simhash2"))
    sigs.join(b,
        col("lang") === col("lang2") && col("doc_id") < col("doc_id2"))
      .withColumn("hamming", bit_count(col("simhash").bitwiseXOR(col("simhash2"))))
      .filter(col("hamming") <= 2)
      .select("doc_id", "doc_id2", "simhash", "simhash2", "hamming")
      .orderBy("doc_id", "doc_id2")
  }

  /** Embedding-cosine near-dup pairs, blocked by `label` (the IVF-cell
    * shape). τ = 0.40, calibrated: the synthetic vectors are near-orthogonal
    * (max pairwise cos ≈ 0.47), so the production τ ≈ 0.95 would select
    * nothing; the operator, not the corpus, is under test. Cosine is
    * computed in double with an explicit sequential fold so the oracle's
    * loop matches; emitted rounded to 6 (noise-absorbing, see QueryPack).
    */
  private def q64(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    val b = e.select(col("vec_id").as("vec_id2"), col("label").as("label2"),
      col("v").as("v2"))
    e.join(b, col("label") === col("label2") && col("vec_id") < col("vec_id2"))
      .withColumn("cos", Vectors.cosine(col("v"), col("v2")))
      .filter(col("cos") >= 0.40)
      .select(col("vec_id"), col("vec_id2"), col("label"),
        round(col("cos"), 6).as("cos6"))
      .orderBy("vec_id", "vec_id2")
  }

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q60_exact_dedup" -> q60 _,
    "q61_jaccard_pairs" -> q61 _,
    "q62_minhash_lsh" -> q62 _,
    "q63_simhash" -> q63 _,
    "q64_cosine_dup" -> q64 _)

  // DuckDB twins: the minhash/simhash SQL is generated from the same
  // constants so both sides cannot drift.
  private val duckToks =
    "list_distinct(list_filter(string_split(text,' '), x -> x <> ''))"

  private def duckMinhash(i: Int): String =
    s"list_min(list_transform(ts, t -> md5('$i|' || t))) AS h$i"

  private def duckBand(b: Int): String =
    s"md5('$b|' || " +
      (b * bandR until (b + 1) * bandR).map(i => s"h$i").mkString(" || ") + ")"

  private def duckSimBit(j: Int): String =
    s"CASE WHEN list_sum(list_transform(ts, t -> CASE WHEN substring(md5(t), ${j + 1}, 1) IN (${oddHex.map("'" + _ + "'").mkString(",")}) THEN 1 ELSE -1 END)) > 0 THEN ${1 << j} ELSE 0 END"

  override val oracle: Seq[(String, String)] = Seq(
    "q60_exact_dedup" ->
      """WITH doubled AS (
        | SELECT doc_id, text FROM documents
        | UNION ALL SELECT doc_id, text FROM documents)
        |SELECT md5(text) AS text_hash, count(*) AS n_copies,
        | min(doc_id) AS keeper_doc_id
        |FROM doubled GROUP BY 1 ORDER BY text_hash""".stripMargin,
    "q61_jaccard_pairs" ->
      s"""WITH t AS (SELECT doc_id, lang, $duckToks AS ts FROM documents)
         |SELECT a.doc_id, b.doc_id AS doc_id2, a.lang,
         | CAST(len(list_intersect(a.ts, b.ts)) AS INT)
         |   / CAST(len(list_distinct(list_concat(a.ts, b.ts))) AS INT)
         |   AS jaccard
         |FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.ts, b.ts)) AS INT)
         |   / CAST(len(list_distinct(list_concat(a.ts, b.ts))) AS INT) >= 0.98
         |ORDER BY a.doc_id, doc_id2""".stripMargin,
    "q62_minhash_lsh" ->
      s"""WITH doubled AS (
         | SELECT doc_id, text FROM documents
         | UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents),
         |sig AS (
         | SELECT doc_id, ts,
         |  ${(0 until nHashes).map(duckMinhash).mkString(",\n  ")}
         | FROM (SELECT doc_id, $duckToks AS ts FROM doubled)),
         |banded AS (
         | SELECT doc_id, ts, unnest([
         |  ${(0 until nHashes / bandR).map(duckBand).mkString(",\n  ")}]) AS band
         | FROM sig),
         |cand AS (
         | SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS doc_id2,
         |   x.ts AS ts, y.ts AS ts2
         | FROM banded x JOIN banded y
         |   ON x.band = y.band AND x.doc_id < y.doc_id)
         |SELECT doc_id, doc_id2,
         | CAST(len(list_intersect(ts, ts2)) AS INT)
         |   / CAST(len(list_distinct(list_concat(ts, ts2))) AS INT) AS jaccard
         |FROM cand
         |WHERE CAST(len(list_intersect(ts, ts2)) AS INT)
         |   / CAST(len(list_distinct(list_concat(ts, ts2))) AS INT) >= 0.98
         |ORDER BY doc_id, doc_id2""".stripMargin,
    "q63_simhash" ->
      s"""WITH t AS (SELECT doc_id, lang, $duckToks AS ts FROM documents),
         |sigs AS (
         | SELECT doc_id, lang,
         |  CAST(${(0 until simBits).map(duckSimBit).mkString("\n   + ")} AS INT)
         |    AS simhash
         | FROM t)
         |SELECT a.doc_id, b.doc_id AS doc_id2,
         | a.simhash, b.simhash AS simhash2,
         | CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |FROM sigs a JOIN sigs b
         | ON a.lang = b.lang AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
         |ORDER BY a.doc_id, doc_id2""".stripMargin,
    "q64_cosine_dup" ->
      """WITH e AS (
        | SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        | FROM embeddings)
        |SELECT a.vec_id, b.vec_id AS vec_id2, a.label,
        | round(list_dot_product(a.v, b.v)
        |   / (sqrt(list_dot_product(a.v, a.v))
        |      * sqrt(list_dot_product(b.v, b.v))), 6) AS cos6
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v, b.v)
        |   / (sqrt(list_dot_product(a.v, a.v))
        |      * sqrt(list_dot_product(b.v, b.v))) >= 0.40
        |ORDER BY a.vec_id, vec_id2""".stripMargin)
}
