package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Tables

/** Text analysis for LLM-training-data pipelines over the `documents` table:
  * token counting, quality scoring, language identification, and document
  * fingerprinting. Beyond the reference's surface (its only text handling is
  * enum validation, reference README.md:75,223) — these are the BASELINE.json
  * north-star operators.
  *
  * Scale notes: every query is a narrow-projection parquet scan with
  * per-row expression work (no shuffle except the presentation sort) — the
  * shape that scales linearly to 100 TB because Catalyst keeps the whole
  * pipeline in one WholeStageCodegen span over higher-order array
  * expressions; no UDFs, no driver-side state.
  *
  * Oracle parity: tokenization is `split(text, ' ')` + drop empties, which
  * DuckDB reproduces as `list_filter(string_split(text,' '), x -> x <> '')`.
  * Ratios are int/int divisions (both engines promote to exact double
  * division → bit-equal). Hashes are md5 hex strings (identical algorithm
  * both sides).
  */
object TextPack extends QueryPack {

  /** Non-empty whitespace tokens (delegates to the shared [[TextOps]]). */
  private def toks(c: Column): Column = TextOps.toks(c)

  private val bpeIshRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Token counting — whitespace tokens + a BPE-ish regex lexer (letters /
    * digit runs / single punctuation, the classic pre-tokenizer split).
    */
  private def q50(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(
        col("doc_id"),
        size(toks(col("text"))).as("n_tokens_ws"),
        // functions API, not expr(): Spark SQL string literals treat
        // backslash as an escape, which would silently corrupt the \s class.
        size(regexp_extract_all(col("text"), lit(bpeIshRegex), lit(0)))
          .as("n_tokens_re"))
      .orderBy("doc_id")

  /** Quality scoring — length, word-length, uppercase + whitespace ratios,
    * and a keep/drop flag; the C4/Gopher-style heuristic filter family.
    * All ratios are exact-int divisions (bit-equal across engines).
    */
  private def q51(s: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    val nWords = size(t)
    val sumLen = aggregate(t, lit(0), (acc, x) => acc + length(x))
    Tables.load(s, dir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars_m"),
        nWords.as("n_words"),
        (sumLen / nWords).as("avg_word_len"),
        (length(regexp_replace(col("text"), "[^ ]", "")) / length(col("text")))
          .as("space_ratio"),
        (length(regexp_replace(col("text"), "[^A-Z]", "")) / length(col("text")))
          .as("upper_ratio"),
        when(nWords.between(20, 1000) &&
          (sumLen / nWords).between(2.0, 12.0), 1).otherwise(0)
          .as("keep"))
      .orderBy("doc_id")
  }

  // Tiny per-language stopword lexicons for the n-gram/stopword-hit
  // language-ID heuristic. (The synthetic corpus is English word-soup for
  // every `lang` label, so the predictor output is dominated by 'en' — the
  // operator semantics, not the corpus, are what's under test.)
  private val lex: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "ein"))

  /** Language identification — stopword-lexicon hit counts with a
    * deterministic argmax (ties break by the fixed lexicon order), plus a
    * no-latin-script → 'zh' short-circuit. The scalable shape of fastText-
    * style lang-ID: pure per-row expressions, no model state.
    */
  /** Per-language stopword hit counts over a text column — THE lang-ID
    * signal set, shared by q52 and the EvalPack confusion matrix (q203)
    * so the predictor cannot drift between the audit and its evaluation.
    */
  private[graft] def langHits(text: Column): Seq[(String, Column)] = {
    val dt = array_distinct(toks(text))
    lex.map { case (l, ws) =>
      l -> size(array_intersect(dt, array(ws.map(lit): _*)))
    }
  }

  /** The lang-ID argmax over [[langHits]] (fixed-lexicon-order ties,
    * no-latin-script → 'und' short-circuit). */
  private[graft] def langPred(text: Column): Column = {
    val hits = langHits(text)
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    when(length(regexp_replace(text, "[^A-Za-z]", "")) === 0, lit("und"))
      .otherwise(
        hits.foldRight(lit("und"): Column) { case ((l, h), acc) =>
          when(h === best && best > 0, lit(l)).otherwise(acc)
        })
  }

  private def q52(s: SparkSession, dir: String): DataFrame = {
    val hits = langHits(col("text"))
    Tables.load(s, dir, "documents")
      .select(
        Seq(col("doc_id"), col("lang"),
          langPred(col("text")).as("pred_lang")) ++
          hits.map { case (l, h) => h.as(s"hits_$l") }: _*)
      .orderBy("doc_id")
  }

  /** Document fingerprinting — md5 of the punctuation-stripped, case- and
    * whitespace-normalized text (exact-dup key), plus a 1-permutation
    * MinHash (min token md5: the rolling-hash fingerprint family at its
    * cheapest) for containment-style matching.
    */
  private def q53(s: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    Tables.load(s, dir, "documents")
      .select(
        col("doc_id"),
        md5(norm).as("fp_norm_md5"),
        array_min(transform(toks(col("text")), t => md5(t)))
          .as("fp_minhash1"))
      .orderBy("doc_id")
  }

  /** Edit-distance fuzzy matching over a bounded sample (Levenshtein is
    * O(len²) per pair — production blocks first, exactly like the dedup
    * pack's LSH/size filters; the sample keeps the demo honest).
    */
  private def q54(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.load(s, dir, "documents").filter(col("doc_id") < 20)
      .select(col("doc_id"), substring(col("text"), 1, 40).as("head"))
    val b = a.select(col("doc_id").as("doc_id2"), col("head").as("head2"))
    a.join(b, col("doc_id") < col("doc_id2"))
      .select(col("doc_id"), col("doc_id2"),
        levenshtein(col("head"), col("head2")).as("edit_dist"))
      .orderBy("doc_id", "doc_id2")
  }

  /** Corpus word frequency — the canonical explode→count→top-k shape
    * (tokenize, one row per token, hash-agg, TakeOrderedAndProject). The
    * 100 TB wordcount: partial aggregation combines map-side so the
    * shuffle carries one row per distinct word per partition, and top-k
    * never materializes a global sort. Tie-break by word keeps the LIMIT
    * boundary deterministic.
    */
  private def q67(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(explode(toks(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(20)

  /** Bigram frequency — n-gram generation as a zip of the token array with
    * its own tail (pure array expressions, no self-join), then the same
    * explode→count→top-k pipeline as q67.
    */
  private def q68(s: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    val bigrams = zip_with(
      slice(t, lit(1), greatest(size(t) - 1, lit(0))),
      slice(t, lit(2), greatest(size(t) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    Tables.load(s, dir, "documents")
      .select(explode(bigrams).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram")).limit(20)
  }

  // Occurrence-counting stopword lexicon for q69 (distinct from q52's
  // per-language hit sets: q69 measures density, q52 membership).
  private val stopEn = Seq(
    "the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  /** Stopword-density + character-class quality ratios — the Gopher-rule
    * family beyond q51: stopword ratio (occurrence-weighted, not
    * distinct), digit/punctuation density, sentence count. All ratios are
    * int/int → exact double division (bit-equal across engines).
    */
  private def q69(s: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    val stopArr = array(stopEn.map(lit): _*)
    val nStop = size(filter(t, w => array_contains(stopArr, lower(w))))
    Tables.load(s, dir, "documents")
      .select(
        col("doc_id"),
        size(t).as("n_words"),
        nStop.as("n_stopwords"),
        (nStop / size(t)).as("stopword_ratio"),
        (length(regexp_replace(col("text"), "[^0-9]", "")) /
          length(col("text"))).as("digit_ratio"),
        (length(regexp_replace(col("text"), "[A-Za-z0-9 ]", "")) /
          length(col("text"))).as("punct_ratio"),
        size(filter(split(col("text"), "\\."), x => trim(x) =!= lit("")))
          .as("n_sentences"))
      .orderBy("doc_id")
  }

  /** q104 — repetition signals (the Gopher duplication filters): max
    * term-frequency ratio and distinct-token ratio per document. One
    * explode → (doc, token)-count → per-doc rollup chain: the second agg
    * reads all three measures off the token counts (Σc = words, max c =
    * top TF, row count = distinct) — no join, no second scan, and both
    * aggs share the doc_id-prefixed shuffle. The per-row-nested-loop
    * alternative is O(len²) inside one task; this shape scales.
    */
  private def q104(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("nw"), max("c").as("max_tf"),
        count(lit(1)).as("nd"))
      .select(col("doc_id"), col("nw").cast("int").as("n_words"),
        col("max_tf"),
        (col("max_tf").cast("double") / col("nw")).as("max_tf_ratio"),
        (col("nd").cast("double") / col("nw")).as("distinct_ratio"))
      .orderBy("doc_id")

  private val chunkSize = 32
  private val chunkStride = 24 // 8-token overlap between windows

  /** q105 — fixed-size token chunking with overlap — the
    * context-window-preparation stage of a training-data pipeline. Chunk
    * starts come from `sequence` (per-row array, O(chunks) not O(tokens))
    * and explode into one row per chunk; each chunk is a `slice` of the
    * token array, fingerprinted so the oracle compares scalars.
    */
  private def q105(s: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), t.as("tk"))
      .select(col("doc_id"), col("tk"),
        explode(sequence(lit(1), greatest(size(col("tk")) - (chunkSize - chunkStride),
          lit(1)), lit(chunkStride))).as("start"))
      .select(col("doc_id"),
        (((col("start") - 1) / chunkStride) + 1).cast("int").as("chunk_idx"),
        size(slice(col("tk"), col("start"), lit(chunkSize))).as("n_tokens"),
        md5(concat_ws(" ", slice(col("tk"), col("start"), lit(chunkSize))))
          .as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  private[graft] val packCap = 4096

  /** q106 — sequence packing: assign documents to ~`packCap`-token bins
    * via a running token total per source shard (`floor(cumsum/cap)`), the
    * shuffle-scalable approximation of greedy bin packing — globally
    * sequential packing cannot parallelize, per-shard cumulative sums do
    * (one window shuffle on the shard key).
    */
  private def q106(s: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"), size(t).as("n_tokens"))
      .withColumn("bin",
        floor((sum("n_tokens").over(w) - 1) / packCap).cast("int"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
      .orderBy("source", "bin")
  }

  /** Statistical aggregates (stddev/variance/correlation/covariance) —
    * second-moment accumulation differs across engines (Welford vs naive),
    * so results round to 4 (noisy-aggregate rule, QueryPack scaladoc).
    */
  private def q55(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("qty_sd"),
        round(var_samp(col("l_quantity")), 4).as("qty_var"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4)
          .as("qty_price_corr"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 4)
          .as("qty_disc_covar"))
      .orderBy("l_returnflag")

  /** Datetime breadth beyond q11/q12: truncation, month boundaries,
    * day-of-week (Spark is 1=Sunday, DuckDB 0=Sunday — mapped in the
    * oracle), ISO week, quarter, day arithmetic.
    */
  private def q56(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        last_day(col("o_orderdate")).as("month_end"),
        dayofweek(col("o_orderdate")).as("dow1sun"),
        weekofyear(col("o_orderdate")).as("iso_week"),
        quarter(col("o_orderdate")).as("qtr"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01"))
          .as("days_since_95"))
      .orderBy("o_orderkey")

  /** Array-function and regex-group surface over tokenized text (scalar
    * outputs only — list columns don't sort in the oracle compare).
    */
  private def q57(s: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    Tables.load(s, dir, "documents")
      .select(
        col("doc_id"),
        array_contains(t, "spark").as("has_spark"),
        element_at(t, 1).as("first_tok"),
        element_at(t, -1).as("last_tok"),
        size(slice(t, 1, 5)).as("head5_n"),
        size(array_distinct(t)).as("n_distinct_tok"),
        regexp_extract(col("source"), "src([0-9]+)", 1).cast("int")
          .as("src_num"))
      .orderBy("doc_id")
  }

  // --- q269: windowed code-switch detection --------------------------------

  private val csWin = 20

  /** q269 — CODE-SWITCHING detection: q52's lang-ID lexicon argmax run
    * per 20-token WINDOW instead of per document, then per-doc window
    * sequence statistics — window count, distinct languages seen, and
    * the number of adjacent-window language SWITCHES (the signal that a
    * document interleaves languages even when its majority vote looks
    * monolingual — the mixed-language hygiene check document-level
    * lang-ID misses). Window prediction is the hit-argmax only ('und'
    * when no lexicon hits — windows are too short for the script
    * heuristic to add signal). Per-row shape: the window explode is
    * bounded by doc length/20, prediction stays in codegen, and the
    * per-doc fold runs over the sorted in-row window array (sort_array ∘
    * collect_list, the q221 idiom; DuckDB mirrors with
    * `list(pred ORDER BY widx)`) — one shuffle at doc grain, nothing
    * pairwise.
    */
  private def q269(s: SparkSession, dir: String): DataFrame = {
    val wins = Tables.load(s, dir, "documents")
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .withColumn("widx", explode(sequence(lit(0),
        greatest(call_function("div", size(col("tk")) - 1, lit(csWin)),
          lit(0)))))
      .select(col("doc_id"), col("widx"),
        array_distinct(
          slice(col("tk"), col("widx") * csWin + 1, lit(csWin))).as("wdt"))
    val hits = lex.map { case (l, ws) =>
      l -> size(array_intersect(col("wdt"), array(ws.map(lit): _*)))
    }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    val pred = hits.foldRight(lit("und"): Column) { case ((l, h), acc) =>
      when(h === best && best > 0, lit(l)).otherwise(acc)
    }
    val n1 = greatest(size(col("sp")) - 1, lit(0))
    wins.select(col("doc_id"), col("widx"), pred.as("pred"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("widx"), col("pred"))))
        .as("spw"))
      .select(col("doc_id"),
        transform(col("spw"), e => e.getField("pred")).as("sp"))
      .select(col("doc_id"),
        size(col("sp")).as("n_windows"),
        size(array_distinct(col("sp"))).as("langs_seen"),
        aggregate(
          zip_with(slice(col("sp"), lit(1), n1), slice(col("sp"), lit(2), n1),
            (a, b) => when(a =!= b, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).as("n_switch"))
      .withColumn("is_mixed",
        when(col("n_switch") > 0, 1).otherwise(0))
      .orderBy("doc_id")
  }

  // --- q282: vocabulary-growth (Heaps) checkpoints -------------------------

  private val heapsBuckets = 20

  /** q282 — VOCABULARY GROWTH (the Heaps/Herdan curve) over 3-gram
    * shingles: cumulative distinct-shingle count as the corpus is
    * ingested in doc_id order, at 20 corpus checkpoints — the statistic
    * that tells a corpus curator whether new data still contributes new
    * content (the q185 Zipf audit's companion). Shingles, not unigrams:
    * the synthetic vocabulary is ~40 words and saturates instantly,
    * while the 3-gram space grows through the whole corpus — the
    * operator, not the corpus, is under test (q64's stance).
    *
    * Scale trick: cumulative DISTINCT needs no stateful scan — a
    * shingle contributes to the vocabulary exactly at its FIRST
    * occurrence, so `groupBy(shingle).agg(min(doc_id))` turns the
    * cumulative-distinct problem into novel-count-per-checkpoint plus a
    * prefix sum over the 20-row checkpoint grain. Two shuffles
    * (shingle grain, then checkpoint grain), no window ever touches
    * doc or token grain. Checkpoint = doc_id·B div n (dense ids — the
    * generator's contract, FIXTURES.md); type/token ratio reported in
    * exact micro units.
    */
  private def q282(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), toks(col("text")).as("tk"))
    val nDocs = docs.agg(count(lit(1)).as("n"))
    def bkt(idCol: Column) =
      least(call_function("div", idCol * heapsBuckets, col("n")),
        lit(heapsBuckets - 1))
    val shingles = docs.select(col("doc_id"),
      explode(zip_with(
        slice(col("tk"), lit(1), greatest(size(col("tk")) - 2, lit(0))),
        zip_with(
          slice(col("tk"), lit(2), greatest(size(col("tk")) - 2, lit(0))),
          slice(col("tk"), lit(3), greatest(size(col("tk")) - 2, lit(0))),
          (b, c) => concat(b, lit(" "), c)),
        (a, bc) => concat(a, lit(" "), bc))).as("sh"))
    val novel = shingles.groupBy("sh").agg(min("doc_id").as("fd"))
      .crossJoin(broadcast(nDocs))
      .groupBy(bkt(col("fd")).as("bkt"))
      .agg(count(lit(1)).as("novel"))
    val perBucket = shingles.crossJoin(broadcast(nDocs))
      .groupBy(bkt(col("doc_id")).as("bkt"))
      .agg(count(lit(1)).as("n_shingles"),
        countDistinct("doc_id").as("n_docs"))
    val w = Window.orderBy("bkt") // ≤ 20 checkpoint rows
    perBucket.join(novel, Seq("bkt"), "left")
      .select(col("bkt"), col("n_docs"), col("n_shingles"),
        coalesce(col("novel"), lit(0L)).as("novel"))
      .withColumn("docs_cum", sum("n_docs").over(w))
      .withColumn("shingles_cum", sum("n_shingles").over(w))
      .withColumn("vocab_cum", sum("novel").over(w))
      .withColumn("ttr_micro", call_function("div",
        col("vocab_cum") * lit(1000000L), col("shingles_cum")))
      .select("bkt", "docs_cum", "shingles_cum", "vocab_cum", "novel",
        "ttr_micro")
      .orderBy("bkt")
  }

  // --- q286: BPE merge induction (tokenizer TRAINING) ----------------------

  private val bpeRounds = 4

  /** Greedy left-to-right application of merge (a, b) to a symbol array:
    * position i is dropped when it is the second half of a match starting
    * at i−1, and becomes `a||b` when a match starts at it. Because q286's
    * argmax EXCLUDES self-pairs (a ≠ b), matches can never chain or
    * overlap, so this position-local rule IS the greedy semantics — the
    * restriction that makes the apply order-free and therefore
    * expressible identically in both engines (with a = b, "aaaa" needs a
    * sequential fold: greedy gives [aa][aa], position-local rules
    * don't). Guards keep every element_at in [1, n] (ANSI-safe; `&&`
    * short-circuits).
    */
  private def applyMerge(syms: Column, a: Column, b: Column): Column = {
    val n = size(syms)
    filter(
      transform(sequence(lit(1), n), i =>
        when(i > 1 && element_at(syms, i - 1) === a &&
          element_at(syms, i) === b, lit(null).cast("string"))
          .when(element_at(syms, i) === a && i < n &&
            element_at(syms, i + 1) === b, concat(a, b))
          .otherwise(element_at(syms, i))),
      x => x.isNotNull)
  }

  /** Greedy left-to-right merge apply WITHOUT the self-pair
    * restriction — real Sennrich semantics, closing round 6's "What's
    * missing #2". The greedy scan is still POSITION-LOCAL via a
    * run-parity closed form: overlapping matches only arise when a = b
    * (a run of equal symbols), and greedy takes the 1st, 3rd, 5th, …
    * match of each run — so a match starting at i is taken iff
    * `syms[i..i+1] = (a, b)` and, when a = b, the count of consecutive
    * a's immediately before i is EVEN ("aaaa" → [aa][aa], "aaa" →
    * [aa][a]). A merged token `a||b` can never re-match (it would need
    * a = a||b, impossible for nonempty b), so the single-pass greedy,
    * the repeated-leftmost-merge fixpoint, and this closed form all
    * coincide — which is what makes the op DuckDB-expressible and
    * oracle-checkable after all. O(n²) per word in the run scan; words
    * are short and the whole apply stays inside one codegen'd
    * transform.
    */
  private[graft] def applyMergeGreedy(syms: Column, a: Column,
      b: Column): Column = {
    val n = size(syms)
    // largest j < i with syms[j] ≠ a (0 if none): i − that − 1 is the
    // length of the run of a's immediately before i
    def maxNonA(i: Column): Column =
      coalesce(array_max(filter(sequence(lit(1), n),
        j => j < i && element_at(syms, j) =!= a)), lit(0))
    def taken(i: Column): Column =
      element_at(syms, i) === a && i < n &&
        element_at(syms, i + 1) === b &&
        (a =!= b || pmod(i - maxNonA(i) - 1, lit(2)) === 0)
    filter(
      transform(sequence(lit(1), n), i =>
        when(i > 1 && taken(i - 1), lit(null).cast("string"))
          .when(taken(i), concat(a, b))
          .otherwise(element_at(syms, i))),
      x => x.isNotNull)
  }

  /** q286 — byte-pair-encoding MERGE INDUCTION over the corpus: the
    * tokenizer-TRAINING step (q105's chunker consumes a trained
    * tokenizer; this builds one). Classic Sennrich BPE on the
    * word-frequency table: words split to character symbols, then
    * [[bpeRounds]] rounds of (count adjacent symbol pairs weighted by
    * word frequency → take the most frequent pair, ties by pair →
    * merge it everywhere). Output is the learned merge table
    * (round, pair, count) — the artifact a tokenizer ships.
    *
    * Self-pairs (a = b) are excluded from the argmax so the merge apply
    * is position-local and order-free ([[applyMerge]]) — a deliberate,
    * documented variant; q293 runs the SAME loop with full Sennrich
    * semantics (self-pairs compete, [[applyMergeGreedy]]'s run-parity
    * greedy apply) and is equally oracle-checked (the unrolled
    * per-round CTE chains are generated from the same constants, so the
    * engines cannot drift).
    *
    * Scale shape: training runs at VOCAB grain (the word-freq table —
    * Heaps-bounded, orders below corpus grain), which is exactly how
    * production BPE trainers work; per round, pair counting is one
    * partial-agg shuffle of vocab-grain bigrams, the argmax is
    * TakeOrdered(1), and the apply is a map-side transform under a
    * 1-row broadcast. The per-round persist keeps round r's lineage
    * from re-deriving rounds 1..r−1 (plan blowup, not data cost).
    */
  /** The shared BPE training loop: per round, (the argmax merge row,
    * the post-merge vocab state). q286 reads the merges, q287 the
    * states, q293 runs it with `selfPairs = true` (full Sennrich
    * semantics: self-pairs compete in the argmax and the apply is the
    * greedy run-parity form). */
  private def bpeTrain(s: SparkSession, dir: String,
      selfPairs: Boolean = false): Seq[(DataFrame, DataFrame)] = {
    var cur = Tables.load(s, dir, "documents")
      .select(explode(toks(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"), split(col("w"), "").as("syms"))
    (1 to bpeRounds).map { r =>
      cur = cur.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bigrams = cur.select(col("freq"),
        explode(zip_with(
          slice(col("syms"), lit(1),
            greatest(size(col("syms")) - 1, lit(0))),
          slice(col("syms"), lit(2),
            greatest(size(col("syms")) - 1, lit(0))),
          (x, y) => struct(x.as("w1"), y.as("w2")))).as("p"))
      val pairs =
        (if (selfPairs) bigrams
         else bigrams.filter(col("p.w1") =!= col("p.w2")))
          .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
          .agg(sum("freq").as("cnt"))
      val best = pairs.orderBy(col("cnt").desc, col("w1"), col("w2")).limit(1)
        .select(lit(r).as("round"), col("w1"), col("w2"), col("cnt"))
      cur = cur
        .crossJoin(broadcast(best.select(col("w1").as("ma"),
          col("w2").as("mb"))))
        .select(col("w"), col("freq"),
          (if (selfPairs) applyMergeGreedy(col("syms"), col("ma"), col("mb"))
           else applyMerge(col("syms"), col("ma"), col("mb"))).as("syms"))
      (best, cur)
    }
  }

  private def q286(s: SparkSession, dir: String): DataFrame =
    bpeTrain(s, dir).map(_._1).reduce(_ unionByName _).orderBy("round")

  /** q293 — q286 with FULL Sennrich semantics: self-pairs (a = a)
    * compete in the per-round argmax (overlapping occurrences counted,
    * as in the reference implementation) and the merge apply is the
    * greedy left-to-right scan via [[applyMergeGreedy]]'s run-parity
    * closed form. This closes the round-6 "tokenizer diverges from
    * production BPE on repetitive text" caveat — and does it on the
    * oracle route, not the spec-only one, because the closed form is
    * position-local and therefore DuckDB-expressible. Same scale shape
    * as q286: vocab-grain state, one bigram shuffle + TakeOrdered(1)
    * argmax + broadcast apply per round.
    */
  private def q293(s: SparkSession, dir: String): DataFrame =
    bpeTrain(s, dir, selfPairs = true)
      .map(_._1).reduce(_ unionByName _).orderBy("round")

  /** q287 — the tokenizer-design readout over q286's training run: the
    * COMPRESSION CURVE. After each merge round, the subword-type count
    * (the vocabulary the tokenizer would ship at that budget) and the
    * corpus subword total (Σ freq·|segmentation|), i.e. how many tokens
    * the model would actually see — the fertility/compression trade a
    * tokenizer budget decision is made on. Micro-units for the ratio
    * (exact integer div, the QueryPack doctrine). Each round's stats are
    * two small aggregates over the persisted vocab-grain state.
    */
  private def q287(s: SparkSession, dir: String): DataFrame =
    bpeTrain(s, dir).zipWithIndex.map { case ((_, state), i) =>
      val types = state.select(explode(col("syms")).as("sy"))
        .agg(countDistinct("sy").as("n_subword_types"))
      val tot = state.agg(
        sum("freq").as("corpus_tokens"),
        sum(col("freq") * size(col("syms"))).as("corpus_subwords"))
      tot.crossJoin(broadcast(types))
        .select(lit(i + 1).as("round"), col("n_subword_types"),
          col("corpus_tokens"), col("corpus_subwords"),
          call_function("div", col("corpus_subwords") * 1000000L,
            col("corpus_tokens")).as("subwords_per_token_micro"))
    }.reduce(_ unionByName _).orderBy("round")

  /** q306 — BPE ENCODE (tokenizer INFERENCE), the apply half of
    * q286/q287's training: segment the whole corpus with the trained
    * 4-merge table and read per-SOURCE fertility — the readout that
    * tells a pipeline which data slices tokenize expensively (code-ish
    * vs prose-ish sources). Scale shape: encoding runs at VOCAB grain —
    * one corpus-grain partial-agg shuffle to (source, word) counts,
    * then the subword lengths of the trained vocabulary join back at
    * word grain (Heaps-bounded keys; never a corpus-grain join) and the
    * readout aggregates to source grain. This is the merges-as-dim-table
    * apply: inference consumes the trained segmentation as a lookup
    * table instead of replaying K chained merges over the corpus.
    */
  private def q306(s: SparkSession, dir: String): DataFrame = {
    val lens = bpeTrain(s, dir).last._2
      .select(col("w"), size(col("syms")).cast("long").as("n_sub"))
    val docs = Tables.load(s, dir, "documents")
    val bySrcWord = docs
      .select(col("source"), explode(toks(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("cnt"))
    val enc = bySrcWord.join(lens, Seq("w"))
      .groupBy("source")
      .agg(sum("cnt").as("tokens"),
        sum(col("cnt") * col("n_sub")).as("subwords"))
    docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .join(enc, Seq("source"))
      .select(col("source"), col("n_docs"), col("tokens"), col("subwords"),
        call_function("div", col("subwords") * 1000000L, col("tokens"))
          .as("fertility_micro"))
      .orderBy("source")
  }

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q286_bpe_merges" -> q286 _,
    "q287_bpe_compression" -> q287 _,
    "q293_bpe_greedy" -> q293 _,
    "q306_bpe_encode" -> q306 _,
    "q269_code_switch" -> q269 _,
    "q282_vocab_growth" -> q282 _,
    "q57_array_funcs" -> q57 _,
    "q55_stats_agg" -> q55 _,
    "q56_datetime_breadth" -> q56 _,
    "q50_token_count" -> q50 _,
    "q51_quality_score" -> q51 _,
    "q52_lang_id" -> q52 _,
    "q53_fingerprint" -> q53 _,
    "q54_edit_distance" -> q54 _,
    "q67_word_topk" -> q67 _,
    "q68_bigram_topk" -> q68 _,
    "q69_stopword_quality" -> q69 _,
    "q104_repetition_signals" -> q104 _,
    "q105_token_chunking" -> q105 _,
    "q106_sequence_packing" -> q106 _)

  // DuckDB twins. The lexicon CASE ladder is generated from the same `lex`
  // so the two sides cannot drift.
  private def duckHits(l: String, ws: Seq[String]): String =
    s"CAST(len(list_intersect(dt, [${ws.map("'" + _ + "'").mkString(",")}])) AS INT) AS hits_$l"

  private val duckBest =
    "greatest(" + lex.map { case (l, _) => s"hits_$l" }.mkString(", ") + ")"

  private val duckPred = lex.reverse.foldLeft("'und'") { case (acc, (l, _)) =>
    s"CASE WHEN hits_$l = $duckBest AND $duckBest > 0 THEN '$l' ELSE $acc END"
  }

  /** (doc_id, lang, pred_lang) as a parenthesized subquery — the SQL twin
    * of [[langPred]] over the documents table, generated from the same
    * `lex`, for embedding in downstream oracles (EvalPack q203).
    */
  private[graft] def duckLangPredSub: String =
    s"""(SELECT doc_id, lang,
       |  CASE WHEN length(regexp_replace(text, '[^A-Za-z]', '', 'g')) = 0
       |       THEN 'und' ELSE $duckPred END AS pred_lang
       | FROM (
       |  SELECT doc_id, lang, text,
       |   ${lex.map { case (l, ws) => duckHits(l, ws) }.mkString(",\n   ")}
       |  FROM (
       |   SELECT doc_id, lang, text,
       |    list_distinct(list_filter(string_split(text,' '), x -> x <> ''))
       |      AS dt
       |   FROM documents) t) h)""".stripMargin

  /** The unrolled per-round BPE CTE chain (`w0, p1, b1, w1, …, w4`),
    * generated from the same constants as the Spark loop so the two
    * sides cannot drift. Shared by the q286 and q287 oracles. */
  private lazy val duckBpeChain: String = {
    val rounds = (1 to bpeRounds).map { r =>
      s"""p$r AS (
         | SELECT s.w1 AS w1, s.w2 AS w2, CAST(sum(freq) AS BIGINT) AS cnt
         | FROM (SELECT freq, unnest(list_transform(
         |    generate_series(1, len(syms) - 1),
         |    i -> {'w1': syms[i], 'w2': syms[i + 1]})) AS s
         |   FROM w${r - 1}) x
         | WHERE s.w1 <> s.w2 GROUP BY 1, 2),
         |b$r AS (
         | SELECT $r AS round, w1, w2, cnt FROM p$r
         | ORDER BY cnt DESC, w1, w2 LIMIT 1),
         |w$r AS (
         | SELECT w, freq,
         |  list_filter(list_transform(generate_series(1, len(syms)),
         |   i -> CASE
         |    WHEN i > 1 AND syms[i - 1] = b.w1 AND syms[i] = b.w2
         |     THEN NULL
         |    WHEN syms[i] = b.w1 AND i < len(syms)
         |     AND syms[i + 1] = b.w2 THEN b.w1 || b.w2
         |    ELSE syms[i] END), x -> x IS NOT NULL) AS syms
         | FROM w${r - 1}, b$r b)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS (
       | SELECT w, CAST(count(*) AS BIGINT) AS freq,
       |  string_split(w, '') AS syms
       | FROM (SELECT unnest(
       |    list_filter(string_split(text, ' '), x -> x <> '')) AS w
       |   FROM documents) t
       | GROUP BY w),
       |$rounds""".stripMargin
  }

  /** q293's greedy chain (`gw0, gp1, gb1, gw1, …`): no self-pair filter
    * in the counts, run-parity greedy apply — generated from the same
    * constants as the Spark loop. */
  private lazy val duckBpeGreedyChain: String = {
    // taken(i): match starts at i; for a = b additionally the run of
    // a's immediately before i must have EVEN length
    def taken(i: String): String =
      s"""(syms[$i] = b.w1 AND ($i) < len(syms)
         |      AND syms[($i) + 1] = b.w2
         |      AND (b.w1 <> b.w2 OR (($i) - coalesce(list_max(
         |       list_filter(generate_series(1, len(syms)),
         |        j -> j < ($i) AND syms[j] <> b.w1)), 0) - 1) % 2 = 0))"""
        .stripMargin
    val rounds = (1 to bpeRounds).map { r =>
      s"""gp$r AS (
         | SELECT s.w1 AS w1, s.w2 AS w2, CAST(sum(freq) AS BIGINT) AS cnt
         | FROM (SELECT freq, unnest(list_transform(
         |    generate_series(1, len(syms) - 1),
         |    i -> {'w1': syms[i], 'w2': syms[i + 1]})) AS s
         |   FROM gw${r - 1}) x
         | GROUP BY 1, 2),
         |gb$r AS (
         | SELECT $r AS round, w1, w2, cnt FROM gp$r
         | ORDER BY cnt DESC, w1, w2 LIMIT 1),
         |gw$r AS (
         | SELECT w, freq,
         |  list_filter(list_transform(generate_series(1, len(syms)),
         |   i -> CASE
         |    WHEN i > 1 AND ${taken("i - 1")}
         |     THEN NULL
         |    WHEN ${taken("i")} THEN b.w1 || b.w2
         |    ELSE syms[i] END), x -> x IS NOT NULL) AS syms
         | FROM gw${r - 1}, gb$r b)""".stripMargin
    }.mkString(",\n")
    s"""gw0 AS (
       | SELECT w, CAST(count(*) AS BIGINT) AS freq,
       |  string_split(w, '') AS syms
       | FROM (SELECT unnest(
       |    list_filter(string_split(text, ' '), x -> x <> '')) AS w
       |   FROM documents) t
       | GROUP BY w),
       |$rounds""".stripMargin
  }

  override val oracle: Seq[(String, String)] = Seq(
    "q293_bpe_greedy" -> {
      val union = (1 to bpeRounds).map(r => s"SELECT * FROM gb$r")
        .mkString("\nUNION ALL\n")
      s"""WITH $duckBpeGreedyChain
         |$union
         |ORDER BY round""".stripMargin
    },
    "q286_bpe_merges" -> {
      val union = (1 to bpeRounds).map(r => s"SELECT * FROM b$r")
        .mkString("\nUNION ALL\n")
      s"""WITH $duckBpeChain
         |$union
         |ORDER BY round""".stripMargin
    },
    "q306_bpe_encode" ->
      s"""WITH $duckBpeChain,
         |lens AS (
         | SELECT w, CAST(len(syms) AS BIGINT) AS n_sub FROM w$bpeRounds),
         |tok AS (
         | SELECT source, unnest(
         |   list_filter(string_split(text, ' '), x -> x <> '')) AS w
         | FROM documents),
         |sw AS (
         | SELECT source, w, CAST(count(*) AS BIGINT) AS cnt
         | FROM tok GROUP BY 1, 2),
         |enc AS (
         | SELECT source, CAST(sum(cnt) AS BIGINT) AS tokens,
         |  CAST(sum(cnt * n_sub) AS BIGINT) AS subwords
         | FROM sw JOIN lens USING (w) GROUP BY source),
         |nd AS (
         | SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         | FROM documents GROUP BY source)
         |SELECT nd.source, n_docs, tokens, subwords,
         | subwords * 1000000 // tokens AS fertility_micro
         |FROM nd JOIN enc USING (source)
         |ORDER BY nd.source""".stripMargin,
    "q287_bpe_compression" -> {
      val union = (1 to bpeRounds).map { r =>
        s"""SELECT $r AS round,
           | (SELECT CAST(count(DISTINCT sy) AS BIGINT)
           |  FROM (SELECT unnest(syms) AS sy FROM w$r) z)
           |  AS n_subword_types,
           | CAST(sum(freq) AS BIGINT) AS corpus_tokens,
           | CAST(sum(freq * len(syms)) AS BIGINT) AS corpus_subwords,
           | CAST(sum(freq * len(syms)) AS BIGINT) * 1000000
           |  // CAST(sum(freq) AS BIGINT) AS subwords_per_token_micro
           |FROM w$r""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $duckBpeChain
         |$union
         |ORDER BY round""".stripMargin
    },
    "q282_vocab_growth" ->
      s"""WITH docs AS (
         | SELECT doc_id,
         |  list_filter(string_split(text,' '), x -> x <> '') AS tk
         | FROM documents),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM docs),
         |sh AS (
         | SELECT doc_id,
         |  tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2] AS sh
         | FROM docs, unnest(generate_series(1,
         |   greatest(len(tk) - 2, 0))) AS u(i)),
         |novel AS (
         | SELECT least(fd * $heapsBuckets // n, ${heapsBuckets - 1})
         |   AS bkt, CAST(count(*) AS BIGINT) AS novel
         | FROM (SELECT sh, min(doc_id) AS fd FROM sh GROUP BY 1), nn
         | GROUP BY 1),
         |pb AS (
         | SELECT least(doc_id * $heapsBuckets // n, ${heapsBuckets - 1})
         |   AS bkt,
         |  CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         | FROM sh, nn GROUP BY 1),
         |j AS (SELECT pb.bkt, n_docs, n_shingles,
         |  COALESCE(novel, 0) AS novel
         | FROM pb LEFT JOIN novel ON pb.bkt = novel.bkt),
         |c AS (SELECT *,
         |  CAST(sum(n_docs) OVER (ORDER BY bkt) AS BIGINT) AS docs_cum,
         |  CAST(sum(n_shingles) OVER (ORDER BY bkt) AS BIGINT)
         |   AS shingles_cum,
         |  CAST(sum(novel) OVER (ORDER BY bkt) AS BIGINT) AS vocab_cum
         | FROM j)
         |SELECT CAST(bkt AS BIGINT) AS bkt, docs_cum, shingles_cum,
         | vocab_cum, novel,
         | CAST(vocab_cum * 1000000 // shingles_cum AS BIGINT) AS ttr_micro
         |FROM c ORDER BY bkt""".stripMargin,
    "q269_code_switch" -> {
      val hitCols = lex.map { case (l, ws) =>
        s"CAST(len(list_intersect(wdt, " +
          s"[${ws.map("'" + _ + "'").mkString(",")}])) AS INT) AS hits_$l"
      }.mkString(",\n  ")
      val best =
        "greatest(" + lex.map { case (l, _) => s"hits_$l" }.mkString(", ") +
          ")"
      val predSql = lex.reverse.foldLeft("'und'") { case (acc, (l, _)) =>
        s"CASE WHEN hits_$l = $best AND $best > 0 THEN '$l' ELSE $acc END"
      }
      s"""WITH t AS (
         | SELECT doc_id,
         |  list_filter(string_split(text,' '), x -> x <> '') AS tk
         | FROM documents),
         |wins AS (SELECT doc_id, u.widx,
         |  list_distinct(tk[u.widx * $csWin + 1 : u.widx * $csWin + $csWin])
         |   AS wdt
         | FROM t, unnest(generate_series(0,
         |   greatest((len(tk) - 1) // $csWin, 0))) AS u(widx)),
         |h AS (SELECT doc_id, widx,
         |  $hitCols
         | FROM wins),
         |wp AS (SELECT doc_id, widx, $predSql AS pred FROM h),
         |sp AS (SELECT doc_id, list(pred ORDER BY widx) AS ps
         | FROM wp GROUP BY 1),
         |st AS (SELECT doc_id, ps,
         |  CAST(coalesce(list_sum(list_transform(
         |    generate_series(1, greatest(len(ps) - 1, 0)),
         |    i -> CASE WHEN ps[i] <> ps[i + 1] THEN 1 ELSE 0 END)), 0)
         |   AS INT) AS n_switch
         | FROM sp)
         |SELECT doc_id, CAST(len(ps) AS INT) AS n_windows,
         | CAST(len(list_distinct(ps)) AS INT) AS langs_seen, n_switch,
         | CASE WHEN n_switch > 0 THEN 1 ELSE 0 END AS is_mixed
         |FROM st ORDER BY doc_id""".stripMargin
    },
    "q104_repetition_signals" ->
      """WITH t AS (
        | SELECT doc_id,
        |  list_filter(string_split(text,' '), x -> x <> '') AS tk
        | FROM documents),
        |x AS (SELECT doc_id, unnest(tk) AS tok FROM t),
        |tf AS (SELECT doc_id, tok, count(*) AS c FROM x GROUP BY 1, 2),
        |m AS (SELECT doc_id, max(c) AS max_tf FROM tf GROUP BY 1)
        |SELECT t.doc_id, CAST(len(tk) AS INT) AS n_words,
        | CAST(m.max_tf AS BIGINT) AS max_tf,
        | CAST(m.max_tf AS DOUBLE) / CAST(len(tk) AS INT) AS max_tf_ratio,
        | CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS INT)
        |   AS distinct_ratio
        |FROM t JOIN m ON t.doc_id = m.doc_id ORDER BY t.doc_id""".stripMargin,
    "q105_token_chunking" ->
      s"""WITH t AS (
         | SELECT doc_id,
         |  list_filter(string_split(text,' '), x -> x <> '') AS tk
         | FROM documents),
         |c AS (
         | SELECT doc_id, tk,
         |  unnest(range(1,
         |    greatest(len(tk) - ${chunkSize - chunkStride}, 1) + 1,
         |    $chunkStride)) AS start
         | FROM t)
         |SELECT doc_id,
         | CAST((start - 1) / $chunkStride + 1 AS INT) AS chunk_idx,
         | CAST(len(tk[start : start + ${chunkSize - 1}]) AS INT)
         |   AS n_tokens,
         | md5(array_to_string(tk[start : start + ${chunkSize - 1}], ' '))
         |   AS chunk_md5
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q106_sequence_packing" ->
      s"""WITH d AS (
         | SELECT doc_id, source,
         |  CAST(len(list_filter(string_split(text,' '), x -> x <> ''))
         |    AS INT) AS n_tokens
         | FROM documents),
         |c AS (
         | SELECT source, doc_id, n_tokens,
         |  sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         | FROM d)
         |SELECT source, CAST(floor((cum - 1) / $packCap) AS INT) AS bin,
         | count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         |FROM c GROUP BY 1, 2 ORDER BY source, bin""".stripMargin,
    "q67_word_topk" ->
      """SELECT word, count(*) AS cnt FROM (
        | SELECT unnest(list_filter(string_split(text,' '), x -> x <> ''))
        |   AS word
        | FROM documents)
        |GROUP BY word ORDER BY cnt DESC, word LIMIT 20""".stripMargin,
    "q68_bigram_topk" ->
      """WITH t AS (
        | SELECT list_filter(string_split(text,' '), x -> x <> '') AS tk
        | FROM documents),
        |b AS (
        | SELECT unnest(list_transform(range(1, len(tk)),
        |   i -> tk[i] || ' ' || tk[i+1])) AS bigram
        | FROM t)
        |SELECT bigram, count(*) AS cnt FROM b
        |GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin,
    "q69_stopword_quality" ->
      s"""WITH t AS (
         | SELECT doc_id, text,
         |   list_filter(string_split(text,' '), x -> x <> '') AS tk
         | FROM documents)
         |SELECT doc_id,
         | CAST(len(tk) AS INT) AS n_words,
         | CAST(len(list_filter(tk, w -> list_contains(
         |   [${stopEn.map("'" + _ + "'").mkString(",")}], lower(w)))) AS INT)
         |   AS n_stopwords,
         | CAST(len(list_filter(tk, w -> list_contains(
         |   [${stopEn.map("'" + _ + "'").mkString(",")}], lower(w)))) AS INT)
         |   / CAST(len(tk) AS INT) AS stopword_ratio,
         | CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS INT)
         |   / CAST(length(text) AS INT) AS digit_ratio,
         | CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS INT)
         |   / CAST(length(text) AS INT) AS punct_ratio,
         | CAST(len(list_filter(string_split_regex(text, '\\.'),
         |   x -> trim(x) <> '')) AS INT) AS n_sentences
         |FROM t ORDER BY doc_id""".stripMargin,
    "q57_array_funcs" ->
      """WITH t AS (
        | SELECT doc_id, source,
        |  list_filter(string_split(text,' '), x -> x <> '') AS tk
        | FROM documents)
        |SELECT doc_id,
        | list_contains(tk, 'spark') AS has_spark,
        | tk[1] AS first_tok,
        | tk[-1] AS last_tok,
        | CAST(len(tk[1:5]) AS INT) AS head5_n,
        | CAST(len(list_distinct(tk)) AS INT) AS n_distinct_tok,
        | CAST(regexp_extract(source, 'src([0-9]+)', 1) AS INT) AS src_num
        |FROM t ORDER BY doc_id""".stripMargin,
    "q55_stats_agg" ->
      """SELECT l_returnflag,
        | round(stddev_samp(l_quantity), 4) AS qty_sd,
        | round(var_samp(l_quantity), 4) AS qty_var,
        | round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
        | round(covar_samp(l_quantity, l_discount), 4) AS qty_disc_covar
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q56_datetime_breadth" ->
      """SELECT o_orderkey,
        | CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
        |   AS month_start,
        | last_day(CAST(o_orderdate AS DATE)) AS month_end,
        | CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow1sun,
        | CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
        | CAST(quarter(o_orderdate) AS INT) AS qtr,
        | CAST(date_diff('day', DATE '1995-01-01',
        |                CAST(o_orderdate AS DATE)) AS INT)
        |   AS days_since_95
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q50_token_count" ->
      s"""SELECT doc_id,
         | CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS INT)
         |   AS n_tokens_ws,
         | CAST(len(regexp_extract_all(text, '$bpeIshRegex')) AS INT)
         |   AS n_tokens_re
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q51_quality_score" ->
      """WITH t AS (
        | SELECT doc_id, text,
        |   list_filter(string_split(text,' '), x -> x <> '') AS tk
        | FROM documents)
        |SELECT doc_id,
        | CAST(length(text) AS INT) AS n_chars_m,
        | CAST(len(tk) AS INT) AS n_words,
        | CAST(list_sum(list_transform(tk, x -> length(x))) AS INT)
        |   / CAST(len(tk) AS INT) AS avg_word_len,
        | CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS INT)
        |   / CAST(length(text) AS INT) AS space_ratio,
        | CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS INT)
        |   / CAST(length(text) AS INT) AS upper_ratio,
        | CASE WHEN len(tk) BETWEEN 20 AND 1000
        |        AND CAST(list_sum(list_transform(tk, x -> length(x))) AS INT)
        |            / CAST(len(tk) AS INT) BETWEEN 2.0 AND 12.0
        |      THEN 1 ELSE 0 END AS keep
        |FROM t ORDER BY doc_id""".stripMargin,
    "q52_lang_id" ->
      s"""WITH t AS (
         | SELECT doc_id, lang, text,
         |   list_distinct(list_filter(string_split(text,' '), x -> x <> ''))
         |     AS dt
         | FROM documents),
         |h AS (
         | SELECT doc_id, lang, text,
         |  ${lex.map { case (l, ws) => duckHits(l, ws) }.mkString(",\n  ")}
         | FROM t)
         |SELECT doc_id, lang,
         | CASE WHEN length(regexp_replace(text, '[^A-Za-z]', '', 'g')) = 0
         |      THEN 'und' ELSE $duckPred END AS pred_lang,
         | ${lex.map { case (l, _) => s"hits_$l" }.mkString(", ")}
         |FROM h ORDER BY doc_id""".stripMargin,
    "q54_edit_distance" ->
      """WITH t AS (
        | SELECT doc_id, substring(text, 1, 40) AS head FROM documents
        | WHERE doc_id < 20)
        |SELECT a.doc_id, b.doc_id AS doc_id2,
        | CAST(levenshtein(a.head, b.head) AS INT) AS edit_dist
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |ORDER BY a.doc_id, doc_id2""".stripMargin,
    "q53_fingerprint" ->
      """SELECT doc_id,
        | md5(trim(regexp_replace(regexp_replace(lower(text),
        |   '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp_norm_md5,
        | list_min(list_transform(
        |   list_filter(string_split(text,' '), x -> x <> ''),
        |   t -> md5(t))) AS fp_minhash1
        |FROM documents ORDER BY doc_id""".stripMargin)
}
