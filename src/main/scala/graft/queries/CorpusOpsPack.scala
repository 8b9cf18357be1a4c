package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.catalog.Tables
import graft.functions.CoPurchase
import graft.queries.TextOps.toks

/** Corpus-hygiene and graph-analytics depth for the pretraining-data
  * pipeline (BASELINE.json north-star, beyond the reference's own surface —
  * reference `README.md:364-402` stops at SQL analytics):
  *
  *   - q156 segment-level dedup — the CCNet/RefinedWeb "duplicated line
  *     removal" stage. The corpus here is single-line word soup (no
  *     newlines), so "lines" are deterministic 10-token windows; a segment
  *     is duplicated iff its hash occurs in MORE THAN ONE document (repeats
  *     within one document are kept, matching line-dedup semantics).
  *   - q157 exact-substring duplication — the char-n-gram form of Lee et
  *     al. 2022 ("Deduplicating Training Data Makes Language Models
  *     Better") exact substring matching, sampled at stride 10 so the gram
  *     count stays ~n_chars/10 per doc instead of n_chars.
  *   - q158 composite quality-rule filter — the Gopher-style rule cascade
  *     (word-count bounds, mean-word-length band, lexical diversity,
  *     repetition cap) with a first-failing-rule verdict per document.
  *   - q159 regex pre-tokenizer — the BPE-style pre-tokenization pass
  *     (alpha runs | digit runs | symbol runs) over the punctuated
  *     event payload, vs the whitespace tokenizer the documents use.
  *   - q160 stratified sampling — per-language keep-rates via the
  *     deterministic md5 bucket (`sampleBy` semantics, but reproducible
  *     across engines, partitionings, and corpus growth).
  *   - q161 triangle counting — per-node triangle participation in the
  *     part co-purchase graph (shared CoPurchase kernel), the local
  *     clustering signal on top of q155's PageRank.
  *
  * Scale notes: q156/q157 are the canonical "explode → two-level agg"
  * shape: per-(hash, doc) partial counts reduce FIRST (combiner-friendly),
  * then a window over the hash marks cross-document duplicates — no
  * self-join, no broadcast of a dup-set, one scan of the corpus. q158 is a
  * pure per-row expression (O(tokens · distinct) in-row, zero shuffle — a
  * codegen'd map at 100 TB). q160 is a metadata-cheap filter (no shuffle).
  * q161 bounds wedge expansion by orienting edges src < dst; the
  * production variant for skewed graphs orients low-degree → high-degree
  * (cuts the wedge count to O(m^1.5) regardless of skew) at the price of a
  * degree join — the id orientation suffices at TPC-H co-purchase degree
  * (≈90 avg, no power-law hubs).
  *
  * Parity doctrine (see [[QueryPack]]): all ratios are single double
  * divisions of exact integers (bit-identical both engines, no rounding);
  * thresholds are non-representable decimals compared against identically
  * computed doubles, so both engines take the same branch; DuckDB list
  * slices `tk[a : b]` are inclusive (the q105 convention); `range(lo, hi,
  * step)` never descends (the Spark `sequence(1, 0)` DESCENDING trap is
  * avoided by `greatest(..., 1)` + a full-length filter on both sides).
  */
object CorpusOpsPack extends QueryPack {

  private val segLen = 10 // tokens per dedup segment (q156)
  private val gramLen = 40 // chars per substring gram (q157)
  private val gramStride = 10 // sampling stride between gram starts (q157)

  // --- q156: cross-document segment dedup ---------------------------------

  /** q156 — CCNet-style duplicated-segment accounting: split each document
    * into consecutive full 10-token segments, hash them, and mark a
    * segment duplicated iff its hash appears in >1 distinct document.
    * Output is the per-document removal ledger (segments, duplicated
    * segments, surviving token count; trailing <10-token tails are always
    * kept). The (hash, doc) pre-aggregation reduces the exploded segments
    * before the hash-window runs, so the heavy grain never shuffles twice.
    */
  /** Shared cross-document dup-ledger scaffold for q156/q157 (the
    * CoPurchase single-definition doctrine applied to dedup ledgers):
    * from exploded (doc_id, unit-key) rows, reduce to (key, doc) partial
    * counts, mark cross-document duplicates with a count window over the
    * key (nd > 1 ⇔ the key occurs in more than one document; repeats
    * WITHIN a document are not duplicates), and roll the per-document
    * ledger up as (doc_id, n_units, n_dup).
    */
  private def dupLedger(units: DataFrame, key: String): DataFrame =
    units
      .groupBy(key, "doc_id").agg(count(lit(1)).as("cnt"))
      .withColumn("nd", count(lit(1)).over(Window.partitionBy(key)))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_units"),
        sum(when(col("nd") > 1, col("cnt")).otherwise(lit(0L))).as("n_dup"))

  /** Consecutive full [[segLen]]-token segment hashes per document —
    * q156's unit grain, carrying the source tag so provenance analyses
    * (q182) share the ONE segment definition (column pruning drops the
    * tag when unused).
    */
  private def segmentHashes(s: SparkSession, dir: String): DataFrame =
    Tables.loadParallel(s, dir, "documents")
      .select(col("doc_id"), col("source"), toks(col("text")).as("tk"))
      .select(col("doc_id"), col("source"), col("tk"),
        explode(sequence(lit(1),
          greatest(size(col("tk")) - (segLen - 1), lit(1)),
          lit(segLen))).as("st"))
      .select(col("doc_id"), col("source"),
        md5(concat_ws(" ", slice(col("tk"), col("st"), lit(segLen))))
          .as("h"),
        size(slice(col("tk"), col("st"), lit(segLen))).as("sl"))
      .filter(col("sl") === segLen)
      .select("doc_id", "source", "h")

  private def q156(s: SparkSession, dir: String): DataFrame = {
    val segs = segmentHashes(s, dir).select("doc_id", "h")
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), TextOps.nToks(col("text")).as("n_tokens"))
      .join(dupLedger(segs, "h"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n_tokens").cast("int").as("n_tokens"),
        coalesce(col("n_units"), lit(0L)).cast("int").as("n_segments"),
        coalesce(col("n_dup"), lit(0L)).cast("int").as("n_dup_segments"),
        (col("n_tokens") - lit(segLen) * coalesce(col("n_dup"), lit(0L)))
          .cast("int").as("kept_tokens"))
      .orderBy("doc_id")
  }

  // --- q157: sampled exact-substring duplication --------------------------

  /** q157 — exact-substring duplication audit: 40-char grams sampled every
    * 10 chars; a gram is duplicated iff it occurs in >1 distinct document.
    * Per-doc output: gram counts and the duplicated fraction — the signal
    * substring-dedup pipelines threshold on before cutting byte ranges.
    * Same two-level agg shape as q156 (no self-join, one corpus scan).
    */
  private def q157(s: SparkSession, dir: String): DataFrame = {
    val grams = Tables.loadParallel(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1),
          greatest(length(col("text")) - (gramLen - 1), lit(1)),
          lit(gramStride))).as("st"))
      .select(col("doc_id"),
        col("text").substr(col("st"), lit(gramLen)).as("g"))
      .filter(length(col("g")) === gramLen)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"))
      .join(dupLedger(grams, "g"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_units"), lit(0L)).cast("int").as("n_grams"),
        coalesce(col("n_dup"), lit(0L)).cast("int").as("n_dup_grams"),
        when(coalesce(col("n_units"), lit(0L)) > 0,
          col("n_dup").cast("double") / col("n_units"))
          .otherwise(lit(0.0)).as("dup_ratio"))
      .orderBy("doc_id")
  }

  // --- q158: composite quality-rule filter --------------------------------

  /** q158's Gopher-style rule cascade, entirely in-row (zero shuffle):
    * token count, mean word length, distinct-token ratio and
    * max-term-frequency ratio feed four keep rules; the verdict reports
    * the FIRST failing rule (cascade order: too_short → word_len →
    * low_diversity → repetitive → pass) and `keep` derives from it.
    * Thresholds sit at the observed sf0.01 deciles so every scale factor
    * rejects a real fraction. The in-row max-tf (O(tokens × distinct) ≤
    * ~100×50 here) trades a token-explode shuffle for per-row work that
    * stays inside whole-stage codegen — the right trade until documents
    * are megatokens long.
    *
    * Shared by the batch query (q158) and the streaming filter twin
    * ([[graft.streaming.CorpusFilter]]): every expression is per-row, so
    * the SAME definition runs on a static frame and on an unbounded
    * stream (stateless streaming needs no watermark, no state store).
    */
  // Rule thresholds — the single source for BOTH the Column cascade and
  // the generated oracle SQL (sf0.01-decile placement, see q158 scaladoc).
  private val minWords = 20
  private val wordLenLo = 3.8
  private val wordLenHi = 5.2
  private val minDistinct = 0.35
  private val maxTf = 0.14

  /** The verdict cascade over the four signal columns — THE definition
    * of the quality rules. Taking Columns (not a token array) lets
    * callers evaluate the signals ONCE and cascade over the named
    * results: higher-order signal expressions are not merged by
    * subexpression elimination when repeated inside CaseWhen branches.
    */
  private[graft] def cascade(nWords: Column, mwl: Column, dr: Column,
      mtr: Column): Column =
    when(nWords < minWords, "too_short")
      .when(!mwl.between(wordLenLo, wordLenHi), "word_len")
      .when(dr < minDistinct, "low_diversity")
      .when(mtr > maxTf, "repetitive")
      .otherwise("pass")

  /** [[cascade]] composed directly over a token-array column — for
    * single-expression call sites (the q170 pipeline). Evaluates each
    * signal inside the cascade; prefer the two-step signal-columns form
    * when the signals are also output (ruleVerdicts). */
  private[graft] def reasonOf(tk: Column): Column = {
    val n = size(tk)
    cascade(n,
      aggregate(tk, lit(0), (acc, x) => acc + length(x)).cast("double") / n,
      size(array_distinct(tk)).cast("double") / n,
      array_max(transform(array_distinct(tk),
        w => size(filter(tk, t => t === w)))).cast("double") / n)
  }

  /** SQL twin of [[reasonOf]]'s cascade over the named signal columns
    * (n_words, mean_word_len, distinct_ratio, max_tf_ratio) — generated
    * from the same threshold constants so the engines cannot drift. */
  private[graft] def duckReasonCase: String =
    s"""CASE WHEN n_words < $minWords THEN 'too_short'
       |     WHEN mean_word_len NOT BETWEEN CAST($wordLenLo AS DOUBLE)
       |                                AND CAST($wordLenHi AS DOUBLE)
       |       THEN 'word_len'
       |     WHEN distinct_ratio < CAST($minDistinct AS DOUBLE)
       |       THEN 'low_diversity'
       |     WHEN max_tf_ratio > CAST($maxTf AS DOUBLE)
       |       THEN 'repetitive'
       |     ELSE 'pass' END""".stripMargin

  /** The four signal column expressions over a `tk` list column — the SQL
    * twin of the signal block in [[ruleVerdicts]]. */
  private[graft] def duckSignalCols: String =
    """CAST(len(tk) AS INT) AS n_words,
      |  CAST(list_sum(list_transform(tk, x -> len(x))) AS DOUBLE)
      |    / len(tk) AS mean_word_len,
      |  CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk)
      |    AS distinct_ratio,
      |  CAST(list_max(list_transform(list_distinct(tk),
      |         w -> len(list_filter(tk, t -> t = w)))) AS DOUBLE)
      |    / len(tk) AS max_tf_ratio""".stripMargin

  private[graft] def ruleVerdicts(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .select(col("doc_id"),
        size(col("tk")).as("n_words"),
        (aggregate(col("tk"), lit(0), (acc, x) => acc + length(x))
          .cast("double") / size(col("tk"))).as("mean_word_len"),
        (size(array_distinct(col("tk"))).cast("double") / size(col("tk")))
          .as("distinct_ratio"),
        (array_max(transform(array_distinct(col("tk")),
          w => size(filter(col("tk"), t => t === w))))
          .cast("double") / size(col("tk"))).as("max_tf_ratio"))
      // cascade over the NAMED signal columns — each signal evaluated once
      .withColumn("reason", cascade(col("n_words"), col("mean_word_len"),
        col("distinct_ratio"), col("max_tf_ratio")))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("distinct_ratio"), col("max_tf_ratio"),
        // keep DERIVES from the cascade — one place to change a rule
        when(col("reason") === "pass", 1).otherwise(0).as("keep"),
        col("reason"))

  private def q158(s: SparkSession, dir: String): DataFrame =
    ruleVerdicts(Tables.loadParallel(s, dir, "documents"))
      .orderBy("doc_id")

  // --- q159: BPE-style regex pre-tokenizer --------------------------------

  private val preTok = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9]+"

  /** q159 — regex pre-tokenization (the GPT-2-style pre-tokenizer's
    * class-run split: alpha runs | digit runs | symbol runs) over the
    * punctuated event payload (`event_type` + JSON props). Maximal runs of
    * the three classes partition the string, so n_pre = n_alpha + n_num +
    * n_sym exactly; the md5 over the joined token list pins the actual
    * token SEQUENCE cross-engine, not just the counts. Pure per-row regex
    * work — ASCII character classes behave identically in Java regex
    * (Spark) and RE2 (DuckDB). Zero shuffle.
    */
  private def q159(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("event_id"),
        concat_ws(" ", col("event_type"), col("props")).as("raw"))
      .select(col("event_id"),
        regexp_extract_all(col("raw"), lit(preTok), lit(0)).as("pt"),
        regexp_extract_all(col("raw"), lit("[a-zA-Z]+"), lit(0)).as("al"),
        regexp_extract_all(col("raw"), lit("[0-9]+"), lit(0)).as("nu"))
      .select(col("event_id"),
        size(col("pt")).as("n_pre"),
        size(col("al")).as("n_alpha"),
        size(col("nu")).as("n_num"),
        (size(col("pt")) - size(col("al")) - size(col("nu"))).as("n_sym"),
        md5(concat_ws("|", col("pt"))).as("tok_md5"))
      .orderBy("event_id")

  // --- q160: stratified sampling ------------------------------------------

  /** q160 — deterministic stratified sampling: per-language keep-rates
    * (en 50%, de 100%, minority languages 25%) decided by the shared
    * md5 bucket (TrainingPipelinePack.bucket — q111 doctrine: stable
    * under corpus growth, engine- and partitioning-independent, unlike
    * `df.stat.sampleBy`'s rand()). A pure filter: no shuffle, and at
    * 100 TB membership is decided during the scan, composing with
    * predicate pushdown on the stratum column.
    */
  /** The stratified keep-predicate (row-local, engine-deterministic) —
    * shared by q160 and the streaming twin. */
  private[graft] def stratKeep: Column =
    TrainingPipelinePack.bucket(col("doc_id"), "strat", 1000) <
      when(col("lang") === "en", 500)
        .when(col("lang") === "de", 1000)
        .otherwise(250)

  private def q160(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .filter(stratKeep)
      .select("doc_id", "lang")
      .orderBy("doc_id")

  // --- q161: triangle counting --------------------------------------------

  /** q161 — per-node triangle counts on the part co-purchase graph:
    * oriented edges (src < dst, shared [[CoPurchase]] kernel) make each
    * triangle a < b < c appear exactly once as (a,b)+(b,c)+(a,c); two
    * triangle (a,b,c) is found exactly once, on its lowest edge (a,b), as
    * the members of N⁺(a) ∩ N⁺(b) — out-neighbor adjacency arrays
    * intersect per edge (the classic adjacency-intersection listing), and
    * each found triangle credits all three corners via one map-side
    * explode. Only the ADJACENCY table broadcasts (n_parts rows of
    * neighbor arrays — two orders of magnitude smaller than the edge
    * list, and bounded by the saturating n_parts² pair graph while orders
    * keep growing), so the edge-grain work is a single codegen pass with
    * no wedge materialization and no shuffle: measured 7.9 s → ~1 s at
    * sf0.1 vs both the sort-merge wedge join (40 M-row shuffle) and the
    * edge-list-broadcast variant (two 1.2 M-entry driver-built hash
    * relations per run). When even adjacency outgrows broadcast, the
    * fallbacks are degree-ordered orientation (wedges O(m^1.5)) and the
    * DOULION sampled estimate (keep edges w.p. p, scale counts by p⁻³).
    */
  private def q161(s: SparkSession, dir: String): DataFrame = {
    val pairs = CoPurchase.distinctPairs(Tables.load(s, dir, "lineitem"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // no sort: array_intersect hashes, and the explode/count downstream
    // is order-insensitive — sorting the broadcast build would be waste
    val adj = pairs.groupBy(col("src").as("v"))
      .agg(collect_list(col("dst")).as("nb"))
    val credits = pairs
      .join(broadcast(adj.select(col("v").as("av"), col("nb").as("na"))),
        col("src") === col("av"))
      // the max-id node has no out-neighbors → left join + empty default
      .join(broadcast(adj.select(col("v").as("bv"), col("nb").as("nbb"))),
        col("dst") === col("bv"), "left")
      .withColumn("cs", array_intersect(col("na"),
        coalesce(col("nbb"), array().cast("array<bigint>"))))
      .filter(size(col("cs")) > 0)
      .select(explode(concat(col("cs"),
        array_repeat(col("src"), size(col("cs"))),
        array_repeat(col("dst"), size(col("cs"))))).as("node"))
    credits
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
      .orderBy("node")
  }

  // --- q162: BPE merge learning (first iteration) -------------------------

  /** q162 — the first BPE-training iteration: collapse the corpus to its
    * word-frequency vocabulary (the standard BPE-trainer move — work is
    * O(vocab), not O(corpus)), enumerate adjacent symbol pairs inside
    * each word as 2-char substrings, weight by word frequency, and rank;
    * the top pair is the merge a BPE trainer would apply next. Integer
    * weights — exact cross-engine. The vocab collapse is the scale story:
    * at 100 TB the explode-and-count token pass dominates and is the same
    * linear scan as q67; everything after runs on the vocabulary.
    */
  private def q162(s: SparkSession, dir: String): DataFrame =
    Tables.loadParallel(s, dir, "documents")
      .select(explode(toks(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .filter(length(col("w")) >= 2)
      .select(col("w"), col("freq"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(col("w").substr(col("i"), lit(2)).as("pair"), col("freq"))
      .groupBy("pair").agg(sum("freq").as("weight"))
      .orderBy(col("weight").desc, col("pair"))
      .limit(20)

  // --- q163: TF-IDF sparse retrieval --------------------------------------

  private val nQueryDocs = 5
  private val retrievalK = 5

  /** q163 — sparse lexical retrieval: TF-IDF weights per (doc, word), the
    * first `nQueryDocs` docs as queries, dot-product scoring via a join
    * on the shared word, top-5 candidates per query. The query-side
    * vectors BROADCAST (a query batch is always small); the corpus side
    * never shuffles on anything but the (doc, word) reduce that built it.
    * Scores are sums of ln-products → round(6) absorbs accumulation-order
    * and libm ulps (QueryPack doctrine), and ranking happens on the
    * ROUNDED score with a doc_id tiebreak so both engines rank
    * identically. The per-(doc,word) weight table persists — it feeds
    * both the corpus side and the query slice.
    */
  private def q163(s: SparkSession, dir: String): DataFrame = {
    // N as a broadcast scalar, NOT a driver-side count(): plan
    // construction stays lazy (no action side effect) and the corpus is
    // never scanned just to size the idf numerator
    val nDocs = Tables.load(s, dir, "documents")
      .agg(count(lit(1)).as("n_docs"))
    val tf = Tables.loadParallel(s, dir, "documents")
      .select(col("doc_id"), explode(toks(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
    val idf = tf.groupBy("w")
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("w"),
        log(col("n_docs").cast("double") / col("df")).as("idf"))
    val weighted = tf.join(idf, "w")
      .select(col("doc_id"), col("w"), (col("cnt") * col("idf")).as("wt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val queries = weighted.filter(col("doc_id") < nQueryDocs)
      .select(col("doc_id").as("q_id"), col("w"), col("wt").as("qwt"))
    val scored = weighted.join(broadcast(queries), Seq("w"))
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy("q_id", "doc_id")
      .agg(round(sum(col("wt") * col("qwt")), 6).as("score"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= retrievalK)
      .orderBy("q_id", "rank")
  }

  // --- q164: inverted index -----------------------------------------------

  /** q164 — inverted-index construction: per word, document frequency,
    * total term frequency, and an md5 fingerprint of the sorted posting
    * list (the driver compare needs scalars, and the fingerprint pins the
    * exact posting SEQUENCE, not just its length). One explode + two
    * stacked aggregates on the same key prefix — the (w, doc) reduce
    * feeds the (w) reduce without a second corpus pass. Posting lists as
    * in-row arrays cap at group size; at 100 TB hot words get huge
    * postings → the production layout shards postings by (word, doc_id
    * range) buckets, which this grain supports unchanged.
    */
  private def q164(s: SparkSession, dir: String): DataFrame =
    Tables.loadParallel(s, dir, "documents")
      .select(col("doc_id"), explode(toks(col("text"))).as("w"))
      .groupBy("w", "doc_id").agg(count(lit(1)).as("cnt"))
      .groupBy("w")
      .agg(count(lit(1)).as("df"),
        sum("cnt").as("total_tf"),
        md5(concat_ws(",",
          sort_array(collect_list(col("doc_id"))).cast("array<string>")))
          .as("postings_md5"))
      .orderBy("w")

  // --- q173: BM25 ranked retrieval -----------------------------------------

  /** q173 — Okapi BM25 retrieval (Robertson/Spärck Jones), the
    * length-normalized upgrade of q163's TF-IDF: the first `nQueryDocs`
    * docs play queries (binary query-term weights — the standard short-
    * query form), candidates score
    * Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) with
    * idf(t) = ln((N − df + ½)/(df + ½) + 1) (the Lucene non-negative
    * variant), k1 = 1.2, b = 0.75.
    *
    * Shape: ONE tokenize+explode of the corpus feeds tf (persisted —
    * reused for df, candidate weights, and query-term extraction); doc
    * lengths ride the same pre-explode projection, so no second corpus
    * scan; N and avgdl are one broadcast scalar row; query terms broadcast
    * onto the weighted postings exactly like q163. Scale: identical to
    * q163 — the only join against corpus-grain data is term-keyed with a
    * broadcast build side; everything else is scalar or vocabulary-grain.
    *
    * Parity: dl/avgdl/idf/weight are one fixed IEEE op sequence written
    * identically in the oracle (`ln` = Spark `log`); the multi-row score
    * sum rounds to 6 per the [[QueryPack]] doctrine.
    */
  private def q173(s: SparkSession, dir: String): DataFrame = {
    val stats = Tables.load(s, dir, "documents")
      .select(TextOps.nToks(col("text")).as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val tf = Tables.loadParallel(s, dir, "documents")
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .select(col("doc_id"), size(col("tk")).as("dl"),
        explode(col("tk")).as("w"))
      .groupBy("doc_id", "dl", "w").agg(count(lit(1)).as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val idf = tf.groupBy("w")
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .select(col("w"), col("avgdl"),
        log((col("n_docs") - col("df") + lit(0.5))
          / (col("df") + lit(0.5)) + lit(1.0)).as("idf"))
    val weighted = tf.join(idf, "w")
      .select(col("doc_id"), col("w"),
        (col("idf") * (col("cnt") * lit(2.2))
          / (col("cnt") + lit(1.2)
            * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
          .as("wt"))
    val queries = tf.filter(col("doc_id") < nQueryDocs)
      .select(col("doc_id").as("q_id"), col("w"))
    val scored = weighted.join(broadcast(queries), Seq("w"))
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy("q_id", "doc_id")
      .agg(round(sum("wt"), 6).as("score"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= retrievalK)
      .orderBy("q_id", "rank")
  }

  // --- q180: vocabulary coverage / OOV audit -------------------------------

  private val vocabN = 25 // tokens in the "trained" vocabulary

  /** q180 — vocabulary-coverage audit: build the top-[[vocabN]] corpus
    * vocabulary by frequency (token-asc tiebreak) and report each
    * source's out-of-vocabulary token fraction — the tokenizer-fit
    * signal a trainer checks before committing to a vocab (a source
    * with high OOV inflates sequence lengths and UNK rates). vocabN sits
    * just under the synthetic corpus's ~31-word vocabulary so a real
    * OOV tail (~16%) exists at every scale factor.
    *
    * Scale: the (source, w) pre-aggregation is the only token-grain
    * shuffle and is persisted — vocabulary ranking AND per-source OOV
    * both read it; the vocabulary itself is vocabN rows (TakeOrdered,
    * then broadcast). No second corpus pass, no token-grain join.
    */
  private def q180(s: SparkSession, dir: String): DataFrame = {
    val tf = Tables.loadParallel(s, dir, "documents")
      .select(col("source"), explode(toks(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val vocab = tf.groupBy("w").agg(sum("cnt").as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(vocabN)
      .select(col("w"), lit(1).as("iv"))
    tf.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("source")
      .agg(sum("cnt").as("n_tokens"),
        sum(when(col("iv").isNull, col("cnt")).otherwise(lit(0L)))
          .as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))
      .orderBy("source")
  }

  // --- q182: cross-source segment-leak matrix ------------------------------

  /** q182 — cross-source contamination matrix: for every pair of sources,
    * how many distinct [[segLen]]-token segments they share and how many
    * (occurrence × occurrence) pairings that implies — the provenance-
    * leakage report that tells a data team which source pairs are
    * re-crawls/mirrors of each other (the doc-level view of the same
    * signal is q143's eval-decontamination).
    *
    * Scale: segments reduce to (hash, source) partial counts FIRST, so
    * the self-join runs at vocabulary-of-segments grain, not token
    * grain. A viral segment appearing everywhere makes its hash a hot
    * join key AND inflates n_pairs quadratically — production caps
    * per-hash occurrence counts (count-capped joins) before pairing;
    * at this corpus the max segment fan-out is small enough to pair
    * exactly.
    */
  private def q182(s: SparkSession, dir: String): DataFrame = {
    // persisted: BOTH aliases of the self-join read it — without the
    // cache the whole explode+agg segment pipeline (and corpus scan)
    // runs twice (exchange reuse does not fire across aliased branches)
    val perSrc = segmentHashes(s, dir)
      .groupBy("h", "source").agg(count(lit(1)).as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val right = perSrc.select(col("h"), col("source").as("src_b"),
      col("cnt").as("cnt_b"))
    perSrc.join(right, Seq("h"))
      .filter(col("source") < col("src_b"))
      .select(col("source").as("src_a"), col("src_b"), col("h"),
        (col("cnt") * col("cnt_b")).as("np"))
      .groupBy("src_a", "src_b")
      .agg(countDistinct("h").as("n_segments"), sum("np").as("n_pairs"))
      .orderBy("src_a", "src_b")
  }

  // --- q186: retrieval serving pipeline (BM25 × quality gate) --------------

  /** q186 — the RAG-serving composition: BM25 retrieval (q173's scorer,
    * reused verbatim) over ONLY the documents the quality cascade keeps
    * (q158's verdict — a production index excludes rejected docs at
    * build time), returning top-k with the doc's language and length as
    * serving metadata. Composition is pure reuse: the corpus filter runs
    * BEFORE tf construction, so index stats (df, avgdl, N) are computed
    * over the kept corpus exactly as a filtered index build would.
    *
    * Scale: identical to q173 with a cheaper corpus (the cascade is a
    * per-row expression fused into the scan); the metadata join at the
    * end touches only k×queries rows.
    */
  private def q186(s: SparkSession, dir: String): DataFrame = {
    val kept = Tables.loadParallel(s, dir, "documents")
      .filter(reasonOf(toks(col("text"))) === "pass")
    val stats = kept
      .select(TextOps.nToks(col("text")).as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val tf = kept
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .select(col("doc_id"), size(col("tk")).as("dl"),
        explode(col("tk")).as("w"))
      .groupBy("doc_id", "dl", "w").agg(count(lit(1)).as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val idf = tf.groupBy("w")
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .select(col("w"), col("avgdl"),
        log((col("n_docs") - col("df") + lit(0.5))
          / (col("df") + lit(0.5)) + lit(1.0)).as("idf"))
    val weighted = tf.join(idf, "w")
      .select(col("doc_id"), col("w"),
        (col("idf") * (col("cnt") * lit(2.2))
          / (col("cnt") + lit(1.2)
            * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
          .as("wt"))
    val queries = tf.filter(col("doc_id") < nQueryDocs)
      .select(col("doc_id").as("q_id"), col("w"))
    val scored = weighted.join(broadcast(queries), Seq("w"))
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy("q_id", "doc_id")
      .agg(round(sum("wt"), 6).as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= retrievalK)
    // k×queries result rows broadcast onto the corpus for metadata —
    // the big table never shuffles for a point-lookup-sized probe
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .join(broadcast(scored), Seq("doc_id"))
      .select(col("q_id"), col("rank"), col("doc_id"), col("score"),
        col("lang"), col("n_chars"))
      .orderBy("q_id", "rank")
  }

  // --- q185: Zipf rank-frequency audit -------------------------------------

  /** q185 — Zipf's-law fit over the corpus vocabulary: least-squares
    * slope/intercept/R² of ln(freq) against ln(rank) — the corpus-health
    * statistic (Gopher reports it) that flags templated or machine-
    * generated text (natural language slopes ≈ −1; flat slopes mean
    * suspiciously uniform vocabulary use). The regression is the
    * explicit closed form over six running sums — NOT the engines'
    * regr_* aggregates, whose internal accumulation schemes (Welford
    * etc.) differ numerically across engines; writing the sums out
    * makes both sides the same op DAG, with round-6 absorbing
    * accumulation-order ulps.
    *
    * Scale: token explode → vocabulary aggregate is the only heavy
    * stage; the rank runs as the exact distributed row_number
    * ([[graft.functions.DistRank]], r6 — vocabulary grows ~Heaps with
    * the corpus, 10⁸+ terms at 100 TB, so no single-partition window
    * over it) and the 6-sum reduce runs at vocabulary grain. Output is
    * one audit row.
    */
  private def q185(s: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.loadParallel(s, dir, "documents")
      .select(explode(toks(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val xy = graft.functions.DistRank
      .withRowNumber(vocab, "rank", col("freq").desc, col("w"))
      .select(log(col("rank").cast("double")).as("x"),
        log(col("freq").cast("double")).as("y"))
    val a = xy.agg(count(lit(1)).cast("double").as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    val varX = col("n") * col("sxx") - col("sx") * col("sx")
    val varY = col("n") * col("syy") - col("sy") * col("sy")
    a.select(col("n").cast("long").as("n_vocab"),
      round(cov / varX, 6).as("slope6"),
      round((col("sy") - cov / varX * col("sx")) / col("n"), 6)
        .as("intercept6"),
      round(cov * cov / (varX * varY), 6).as("r2_6"))
  }

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] =
    Seq(
      "q156_segment_dedup" -> q156 _,
      "q157_substring_dup" -> q157 _,
      "q158_filter_rules" -> q158 _,
      "q159_regex_pretoken" -> q159 _,
      "q160_stratified_sample" -> q160 _,
      "q161_triangles" -> q161 _,
      "q162_bpe_merge" -> q162 _,
      "q163_tfidf_retrieval" -> q163 _,
      "q164_inverted_index" -> q164 _,
      "q173_bm25_retrieval" -> q173 _,
      "q180_vocab_oov" -> q180 _,
      "q182_source_leak_matrix" -> q182 _,
      "q185_zipf_audit" -> q185 _,
      "q186_retrieval_pipeline" -> q186 _)

  private[graft] val duckToks =
    "list_filter(string_split(text, ' '), x -> x <> '')"

  override val oracle: Seq[(String, String)] = Seq(
    "q156_segment_dedup" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS tk FROM documents),
         |seg AS (
         | SELECT doc_id, tk,
         |  unnest(range(1, greatest(len(tk) - ${segLen - 1}, 1) + 1,
         |               $segLen)) AS st
         | FROM t),
         |f AS (
         | SELECT doc_id,
         |  md5(array_to_string(tk[st : st + ${segLen - 1}], ' ')) AS h
         | FROM seg WHERE len(tk[st : st + ${segLen - 1}]) = $segLen),
         |g AS (SELECT h, doc_id, count(*) AS cnt FROM f GROUP BY 1, 2),
         |m AS (SELECT h, doc_id, cnt,
         |       count(*) OVER (PARTITION BY h) AS nd FROM g),
         |pd AS (
         | SELECT doc_id, sum(cnt) AS n_segments,
         |  sum(CASE WHEN nd > 1 THEN cnt ELSE 0 END) AS n_dup
         | FROM m GROUP BY 1),
         |base AS (SELECT doc_id, len($duckToks) AS n_tokens FROM documents)
         |SELECT b.doc_id, CAST(b.n_tokens AS INT) AS n_tokens,
         | CAST(COALESCE(pd.n_segments, 0) AS INT) AS n_segments,
         | CAST(COALESCE(pd.n_dup, 0) AS INT) AS n_dup_segments,
         | CAST(b.n_tokens - $segLen * COALESCE(pd.n_dup, 0) AS INT)
         |   AS kept_tokens
         |FROM base b LEFT JOIN pd ON b.doc_id = pd.doc_id
         |ORDER BY b.doc_id""".stripMargin,
    "q157_substring_dup" ->
      s"""WITH g AS (
         | SELECT doc_id, substring(text, st, $gramLen) AS gr
         | FROM (SELECT doc_id, text,
         |        unnest(range(1, greatest(len(text) - ${gramLen - 1}, 1) + 1,
         |                     $gramStride)) AS st
         |       FROM documents) q
         | WHERE len(substring(text, st, $gramLen)) = $gramLen),
         |c AS (SELECT gr, doc_id, count(*) AS cnt FROM g GROUP BY 1, 2),
         |m AS (SELECT gr, doc_id, cnt,
         |       count(*) OVER (PARTITION BY gr) AS nd FROM c),
         |pd AS (
         | SELECT doc_id, sum(cnt) AS n_grams,
         |  sum(CASE WHEN nd > 1 THEN cnt ELSE 0 END) AS n_dup
         | FROM m GROUP BY 1)
         |SELECT d.doc_id,
         | CAST(COALESCE(pd.n_grams, 0) AS INT) AS n_grams,
         | CAST(COALESCE(pd.n_dup, 0) AS INT) AS n_dup_grams,
         | CASE WHEN COALESCE(pd.n_grams, 0) > 0
         |      THEN CAST(pd.n_dup AS DOUBLE) / pd.n_grams
         |      ELSE CAST(0 AS DOUBLE) END AS dup_ratio
         |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "q158_filter_rules" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS tk FROM documents),
         |s AS (SELECT doc_id,
         |  $duckSignalCols
         | FROM t),
         |v AS (SELECT *, $duckReasonCase AS reason FROM s)
         |SELECT doc_id, n_words, mean_word_len, distinct_ratio,
         | max_tf_ratio,
         | CASE WHEN reason = 'pass' THEN 1 ELSE 0 END AS keep, reason
         |FROM v ORDER BY doc_id""".stripMargin,
    "q159_regex_pretoken" ->
      s"""WITH r AS (
         | SELECT event_id, concat_ws(' ', event_type, props) AS raw
         | FROM events),
         |x AS (
         | SELECT event_id,
         |  regexp_extract_all(raw, '$preTok') AS pt,
         |  regexp_extract_all(raw, '[a-zA-Z]+') AS al,
         |  regexp_extract_all(raw, '[0-9]+') AS nu
         | FROM r)
         |SELECT event_id,
         | CAST(len(pt) AS INT) AS n_pre,
         | CAST(len(al) AS INT) AS n_alpha,
         | CAST(len(nu) AS INT) AS n_num,
         | CAST(len(pt) - len(al) - len(nu) AS INT) AS n_sym,
         | md5(array_to_string(pt, '|')) AS tok_md5
         |FROM x ORDER BY event_id""".stripMargin,
    "q160_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST('0x' || substring(md5('strat|' ||
        |        CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000
        |      < CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 1000
        |                  ELSE 250 END
        |ORDER BY doc_id""".stripMargin,
    "q161_triangles" ->
      """WITH items AS (
        | SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (
        | SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        | FROM items a JOIN items b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |tri AS (
        | SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        | FROM pairs e1
        | JOIN pairs e2 ON e1.dst = e2.src
        | JOIN pairs e3 ON e3.src = e1.src AND e3.dst = e2.dst),
        |n AS (SELECT unnest([a, b, c]) AS node FROM tri)
        |SELECT node, CAST(count(*) AS BIGINT) AS n_tri
        |FROM n GROUP BY node ORDER BY node""".stripMargin,
    "q162_bpe_merge" ->
      s"""WITH w AS (
         | SELECT unnest($duckToks) AS w FROM documents),
         |f AS (SELECT w, count(*) AS freq FROM w GROUP BY 1),
         |p AS (
         | SELECT substring(w, i, 2) AS pair, freq
         | FROM (SELECT w, freq, unnest(range(1, len(w))) AS i
         |       FROM f WHERE len(w) >= 2) q)
         |SELECT pair, CAST(sum(freq) AS BIGINT) AS weight
         |FROM p GROUP BY 1
         |ORDER BY weight DESC, pair LIMIT 20""".stripMargin,
    "q163_tfidf_retrieval" ->
      s"""WITH x AS (
         | SELECT doc_id, unnest($duckToks) AS w FROM documents),
         |tf AS (SELECT doc_id, w, count(*) AS cnt FROM x GROUP BY 1, 2),
         |idf AS (
         | SELECT w, ln(CAST((SELECT count(*) FROM documents) AS DOUBLE)
         |              / count(*)) AS idf
         | FROM tf GROUP BY w),
         |c AS (
         | SELECT doc_id, t.w, cnt * idf AS wt
         | FROM tf t JOIN idf ON t.w = idf.w),
         |q AS (SELECT doc_id AS q_id, w, wt AS qwt FROM c
         |      WHERE doc_id < $nQueryDocs),
         |sc AS (
         | SELECT q.q_id, c.doc_id,
         |  round(sum(c.wt * q.qwt), 6) AS score
         | FROM c JOIN q ON c.w = q.w
         | WHERE c.doc_id <> q.q_id GROUP BY 1, 2),
         |r AS (
         | SELECT q_id, doc_id, score,
         |  row_number() OVER (PARTITION BY q_id
         |                     ORDER BY score DESC, doc_id) AS rank
         | FROM sc)
         |SELECT q_id, doc_id, score, CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= $retrievalK
         |ORDER BY q_id, rank""".stripMargin,
    "q164_inverted_index" ->
      s"""WITH x AS (
         | SELECT doc_id, unnest($duckToks) AS w FROM documents),
         |g AS (SELECT w, doc_id, count(*) AS cnt FROM x GROUP BY 1, 2)
         |SELECT w, CAST(count(*) AS BIGINT) AS df,
         | CAST(sum(cnt) AS BIGINT) AS total_tf,
         | md5(array_to_string(list_sort(list(doc_id)), ',')) AS postings_md5
         |FROM g GROUP BY w ORDER BY w""".stripMargin,
    "q173_bm25_retrieval" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS tk FROM documents),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(len(tk)) AS DOUBLE) / count(*) AS avgdl FROM t),
         |x AS (SELECT doc_id, len(tk) AS dl, unnest(tk) AS w FROM t),
         |tf AS (SELECT doc_id, dl, w, count(*) AS cnt FROM x GROUP BY 1, 2, 3),
         |df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
         |idf AS (
         | SELECT w, avgdl,
         |  ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf
         | FROM df CROSS JOIN s),
         |wts AS (
         | SELECT tf.doc_id, tf.w,
         |  idf.idf * (tf.cnt * 2.2)
         |   / (tf.cnt + 1.2 * (0.25 + 0.75 * tf.dl / idf.avgdl)) AS wt
         | FROM tf JOIN idf ON tf.w = idf.w),
         |q AS (SELECT doc_id AS q_id, w FROM tf WHERE doc_id < $nQueryDocs),
         |sc AS (
         | SELECT q.q_id, wts.doc_id, round(sum(wts.wt), 6) AS score
         | FROM wts JOIN q ON wts.w = q.w
         | WHERE wts.doc_id <> q.q_id GROUP BY 1, 2),
         |r AS (
         | SELECT q_id, doc_id, score,
         |  row_number() OVER (PARTITION BY q_id
         |                     ORDER BY score DESC, doc_id) AS rank
         | FROM sc)
         |SELECT q_id, doc_id, score, CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= $retrievalK
         |ORDER BY q_id, rank""".stripMargin,
    "q180_vocab_oov" ->
      s"""WITH x AS (
         | SELECT source, unnest($duckToks) AS w FROM documents),
         |tf AS (SELECT source, w, count(*) AS cnt FROM x GROUP BY 1, 2),
         |v AS (SELECT w FROM (
         |  SELECT w, sum(cnt) AS freq FROM tf GROUP BY 1
         |  ORDER BY freq DESC, w LIMIT $vocabN) q),
         |agg AS (
         | SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN v.w IS NULL THEN cnt ELSE 0 END) AS BIGINT)
         |    AS n_oov
         | FROM tf LEFT JOIN v ON tf.w = v.w GROUP BY 1)
         |SELECT source, n_tokens, n_oov,
         | CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate
         |FROM agg ORDER BY source""".stripMargin,
    "q182_source_leak_matrix" ->
      s"""WITH t AS (SELECT doc_id, source, $duckToks AS tk FROM documents),
         |seg AS (
         | SELECT doc_id, source, tk,
         |  unnest(range(1, greatest(len(tk) - ${segLen - 1}, 1) + 1,
         |               $segLen)) AS st
         | FROM t),
         |f AS (
         | SELECT source,
         |  md5(array_to_string(tk[st : st + ${segLen - 1}], ' ')) AS h
         | FROM seg WHERE len(tk[st : st + ${segLen - 1}]) = $segLen),
         |ps AS (SELECT h, source, count(*) AS cnt FROM f GROUP BY 1, 2)
         |SELECT a.source AS src_a, b.source AS src_b,
         | CAST(count(DISTINCT a.h) AS BIGINT) AS n_segments,
         | CAST(sum(a.cnt * b.cnt) AS BIGINT) AS n_pairs
         |FROM ps a JOIN ps b ON a.h = b.h AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q186_retrieval_pipeline" ->
      s"""WITH t0 AS (
         | SELECT doc_id, lang, n_chars, $duckToks AS tk FROM documents),
         |sg AS (SELECT doc_id, lang, n_chars, tk, $duckSignalCols
         |       FROM t0),
         |t AS (SELECT doc_id, lang, n_chars, tk FROM sg
         |      WHERE ($duckReasonCase) = 'pass'),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(len(tk)) AS DOUBLE) / count(*) AS avgdl FROM t),
         |x AS (SELECT doc_id, len(tk) AS dl, unnest(tk) AS w FROM t),
         |tf AS (SELECT doc_id, dl, w, count(*) AS cnt FROM x GROUP BY 1, 2, 3),
         |df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
         |idf AS (
         | SELECT w, avgdl,
         |  ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf
         | FROM df CROSS JOIN s),
         |wts AS (
         | SELECT tf.doc_id, tf.w,
         |  idf.idf * (tf.cnt * 2.2)
         |   / (tf.cnt + 1.2 * (0.25 + 0.75 * tf.dl / idf.avgdl)) AS wt
         | FROM tf JOIN idf ON tf.w = idf.w),
         |q AS (SELECT doc_id AS q_id, w FROM tf WHERE doc_id < $nQueryDocs),
         |sc AS (
         | SELECT q.q_id, wts.doc_id, round(sum(wts.wt), 6) AS score
         | FROM wts JOIN q ON wts.w = q.w
         | WHERE wts.doc_id <> q.q_id GROUP BY 1, 2),
         |r AS (
         | SELECT q_id, doc_id, score,
         |  row_number() OVER (PARTITION BY q_id
         |                     ORDER BY score DESC, doc_id) AS rank
         | FROM sc)
         |SELECT r.q_id, CAST(r.rank AS INT) AS rank, r.doc_id, r.score,
         | d.lang, d.n_chars
         |FROM r JOIN documents d ON r.doc_id = d.doc_id
         |WHERE r.rank <= $retrievalK
         |ORDER BY r.q_id, r.rank""".stripMargin,
    "q185_zipf_audit" ->
      s"""WITH x0 AS (SELECT unnest($duckToks) AS w FROM documents),
         |f AS (SELECT w, count(*) AS freq FROM x0 GROUP BY 1),
         |r AS (SELECT
         |  ln(CAST(row_number() OVER (ORDER BY freq DESC, w) AS DOUBLE))
         |    AS x,
         |  ln(CAST(freq AS DOUBLE)) AS y FROM f),
         |a AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |       sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
         |       sum(x*x) AS sxx, sum(y*y) AS syy FROM r)
         |SELECT CAST(n AS BIGINT) AS n_vocab,
         | round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope6,
         | round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 6)
         |   AS intercept6,
         | round((n*sxy - sx*sy) * (n*sxy - sx*sy)
         |   / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2_6
         |FROM a""".stripMargin)
}
