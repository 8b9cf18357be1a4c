package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.catalog.Tables
import graft.functions.{DistRank, TopK}

/** Training-data pipeline assembly shapes over `documents` — the ops that
  * sit between corpus curation (dedup/quality, q50-q69, q104-q110) and the
  * trainer: deterministic split assignment, weighted source mixing,
  * per-source token budgets, curriculum staging, and shard packing. Beyond
  * the reference's surface (its pipeline ends at curated analytics tables,
  * reference `README.md:259-344`) — these are BASELINE.json north-star
  * operators for the 100 TB training-corpus case.
  *
  * Determinism/parity: all randomness is derived, not sampled — a salted
  * md5 bucket of the stable `doc_id` (`conv(hex,16,10)` ↔ DuckDB
  * `CAST('0x…' AS BIGINT)`), so assignment is reproducible across runs,
  * engines, AND scale factors: a document keeps its split/mixture fate when
  * the corpus around it grows, which is what makes incremental corpus
  * rebuilds cheap (only new docs move). `rand(seed)` would give none of
  * that (partition-order dependent, engine-specific).
  *
  * Scale notes: q111/q112 are pure narrow scans + one small agg (linear,
  * no data shuffle beyond the partial-agg combine). q113/q114 window by
  * source — one shuffle on a low-cardinality key whose per-partition state
  * is a running sum (no buffering). q115's round-robin pack is the only
  * intentionally global op (exact equal shards need a total order); its
  * scaladoc spells out the hash-mod alternative used when ±1% shard-size
  * imbalance is acceptable at 100 TB.
  */
object TrainingPipelinePack extends QueryPack {

  /** Salted deterministic hash in [0, 2³²): first 8 hex chars of
    * md5(salt|id) as an int. Identical in DuckDB
    * (`CAST('0x'||substring(md5(..),1,8) AS BIGINT)`) and in plain JVM
    * MessageDigest (TrainingPipelineSpec recomputes it independently).
    */
  private[graft] def md5Hash32(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(s"$salt|"), id.cast("string"))), 1, 8),
      16, 10).cast("long")

  /** [[md5Hash32]] reduced to a bucket in [0, n). */
  private[graft] def bucket(id: Column, salt: String, n: Int): Column =
    md5Hash32(id, salt) % n

  private[graft] def duckBucket(id: String, salt: String, n: Int): String =
    s"CAST('0x' || substring(md5('$salt|' || CAST($id AS VARCHAR)), 1, 8) AS BIGINT) % $n"

  /** Non-empty whitespace tokens (the shared [[TextOps]] tokenizer). */
  private def nToks(c: Column): Column = TextOps.nToks(c)

  private val duckNToks =
    "length(list_filter(string_split(text, ' '), x -> x <> ''))"

  /** q111 — deterministic train/val/test split: md5-bucket of doc_id into
    * 80/10/10, then per-split corpus stats. The assignment is a pure
    * per-row expression — at 100 TB this is a metadata-only column add
    * (no shuffle), and membership is stable under corpus growth, unlike
    * `randomSplit` (partition-order dependent) or mod-by-rank schemes
    * (every insert reshuffles everyone's split).
    */
  private def q111(s: SparkSession, dir: String): DataFrame = {
    val b = bucket(col("doc_id"), "split", 100)
    Tables.load(s, dir, "documents")
      .withColumn("split",
        when(b < 80, "train").when(b < 90, "val").otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(nToks(col("text"))).as("n_tokens"),
        sum("n_chars").as("n_chars"))
      .orderBy("split")
  }

  /** q112 — weighted dataset mixture: each source gets a keep-rate (here
    * derived from the source id so no side table is needed; production
    * would broadcast-join a weights dim), and a document survives iff its
    * mixture bucket clears the rate. Up-/down-sampling sources into a
    * training mixture without a shuffle: the keep decision is per-row,
    * the only exchange is the final partial agg on `source`.
    */
  private def q112(s: SparkSession, dir: String): DataFrame = {
    val srcNum = regexp_extract(col("source"), "([0-9]+)$", 1).cast("int")
    val rate = (srcNum % 4) * 25 + 25 // 25/50/75/100 % by source class
    val kept = (bucket(col("doc_id"), "mix", 100) < rate).cast("int")
    Tables.load(s, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n_total"),
        sum(kept).as("n_kept"),
        sum(col("n_chars") * kept).as("chars_kept"),
        max(rate).as("keep_pct"))
      .orderBy("source")
  }

  /** q113 — per-source token budget: rank each source's documents by
    * quality (length as the proxy, doc_id tiebreak), keep documents while
    * the running token total stays within budget. The "cap every source's
    * contribution" op: one shuffle on `source`, per-partition state is a
    * single running sum. Reports per-source kept counts + budget use.
    */
  private def q113(s: SparkSession, dir: String): DataFrame = {
    val budget = 3000L
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "documents")
      .withColumn("n_tokens", nToks(col("text")).cast("long"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= budget)
      .groupBy("source")
      .agg(count(lit(1)).as("docs_kept"),
        max("cum_tokens").as("tokens_used"))
      .orderBy("source")
  }

  /** q114 — curriculum staging: order the corpus by a difficulty proxy
    * (avg word length, doc_id tiebreak) and cut into 4 equal stages; per-
    * stage profile. The cut is the EXACT distributed ntile
    * ([[graft.functions.DistRank]]): range shuffle + per-slice rank +
    * P-row broadcast offsets — no single-partition window at any corpus
    * size. (When ±1-row-exact stages aren't required, approx_percentile
    * boundaries — 3 broadcast numbers — drop the range shuffle too.)
    */
  private def q114(s: SparkSession, dir: String): DataFrame = {
    val t = TextOps.toks(col("text"))
    val difficulty = aggregate(t, lit(0), (acc, x) => acc + length(x)) / size(t)
    DistRank.withNtile(
      Tables.load(s, dir, "documents").withColumn("difficulty", difficulty),
      "stage", 4, col("difficulty"), col("doc_id"))
      .groupBy("stage")
      .agg(count(lit(1)).as("n_docs"),
        // no round: min/max of exact int/int IEEE quotients are
        // bit-identical across engines (nothing accumulates), while
        // round-at-6 can land on a representable midpoint (e.g. a/128 =
        // …xxx5) where Spark HALF_UP and DuckDB diverge
        min("difficulty").as("min_difficulty"),
        max("difficulty").as("max_difficulty"),
        sum("n_chars").as("n_chars"))
      .orderBy("stage")
  }

  /** q115 — deterministic shuffle + round-robin shard packing: order by
    * md5(doc_id) (the reproducible "random" order every epoch-0 data
    * loader wants), deal into 8 shards round-robin, profile each shard.
    * The total order runs as [[graft.functions.DistRank]]'s exact
    * distributed row_number (range shuffle on the hash, never a single-
    * partition window); when ±1% imbalance is fine, shard = md5-bucket
    * directly (q111's shape) and even the range shuffle disappears. Shard
    * stats land within ~2% of each other — the balance evidence is the
    * min/max spread.
    */
  private def q115(s: SparkSession, dir: String): DataFrame = {
    DistRank.withRowNumber(
      Tables.load(s, dir, "documents"),
      "rn", md5(col("doc_id").cast("string")))
      .withColumn("shard", (col("rn") - 1) % 8)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("n_chars"),
        min("doc_id").as("min_doc_id"))
      .orderBy("shard")
  }

  /** q123 — exact-n deterministic sample per group: each source's 5
    * documents with the smallest salted hash (bottom-k-by-hash IS a
    * uniform sample, and a reproducible one). Runs on the [[TopK]]
    * aggregator — O(k) state per group through partial/merge, so the
    * shuffle carries 5 rows per source instead of the group's candidates.
    * The scalable exact-n per-group sampler: `orderBy(rand()).limit(n)`
    * is global-sort + nondeterministic, `TABLESAMPLE` can't do per-group
    * or exact-n; bottom-k-by-hash is one partial-agg pass and re-picks
    * the same rows every run and at every corpus size.
    */
  private def q123(s: SparkSession, dir: String): DataFrame = {
    // negate: TopK keeps highest-score (ties → lower id), so -hash
    // selects smallest hash with the oracle's (h, doc_id) tiebreak
    val score = -md5Hash32(col("doc_id"), "sample").cast("double")
    Tables.load(s, dir, "documents")
      .groupBy("source")
      .agg(TopK.topK(5)(col("doc_id"), score).as("picks"))
      .select(col("source"), posexplode(col("picks")).as(Seq("pos", "pick")))
      .select(col("source"), (col("pos") + 1).cast("int").as("rank"),
        col("pick.id").as("doc_id"),
        (-col("pick.score")).cast("long").as("h"))
      .orderBy("source", "rank")
  }

  // --- q174: hashed linear quality classifier ------------------------------

  private val featDim = 512 // hashed feature buckets

  /** Deterministic per-bucket weight in integer milli-units: an LCG step
    * of the bucket id folded into [-1000, 1000]. Stands in for trained
    * fastText/logistic weights — the Spark-side plumbing (hash → lookup →
    * sum → threshold) is exactly the production scorer's; only the values
    * are synthetic. All-BIGINT so both engines are bit-exact.
    */
  private def weightMilli(bk: Column): Column =
    (bk * lit(1103515245L) + lit(12345L)) % lit(2001L) - lit(1000L)

  /** THE classifier scorer as one per-row fold over a token array —
    * integer milli-units, zero shuffle, usable verbatim on a stream
    * (shared by q179's report card and
    * [[graft.streaming.CorpusFilter.scored]]). q174 computes the same
    * integers through explode + partial aggregation — the two physical
    * strategies are pinned equal by the oracle gate and
    * TrainingPipelineSpec's JVM recompute.
    */
  private[graft] def classifierScoreToks(tk: Column): Column =
    aggregate(tk, lit(0L),
      (acc, w) => acc + weightMilli(bucket(w, "feat", featDim).cast("long")))

  /** [[classifierScoreToks]] over a raw text column. */
  private[graft] def classifierScore(text: Column): Column =
    classifierScoreToks(TextOps.toks(text))

  /** SQL twin of [[classifierScoreToks]] over a `tk` list column —
    * generated from the same LCG constants (shared by q179 and the
    * EvalPack oracles, so scorer and evaluation cannot drift).
    */
  private[graft] val duckClfScore: String =
    s"""COALESCE(CAST(list_sum(list_transform(tk, tok ->
       |    ((${duckBucket("tok", "feat", featDim)}) * 1103515245
       |      + 12345) % 2001 - 1000)) AS BIGINT), 0)""".stripMargin

  /** q174 — hashed-linear-model document scoring, the quality-classifier
    * stage of a CCNet/LLaMA-style corpus pipeline (a fastText-ish linear
    * scorer over hashed bag-of-words features): token → md5 feature
    * bucket (mod [[featDim]]) → weight lookup → per-document sum →
    * keep/reject prediction at score > 0.
    *
    * Scale: hash and weight are per-token map-side expressions (no model
    * table to join — the "lookup" is closed-form here; a real weight
    * vector is a [[featDim]]-row broadcast); partial aggregation reduces
    * tokens to one row per doc before the only shuffle. Docs with zero
    * tokens survive via the left join (q96's empty-doc doctrine). Score
    * stays in exact integer milli-units end to end — no float parity
    * surface at all.
    */
  private def q174(s: SparkSession, dir: String): DataFrame = {
    val scores = Tables.loadParallel(s, dir, "documents")
      .select(col("doc_id"), explode(TextOps.toks(col("text"))).as("w"))
      .select(col("doc_id"),
        weightMilli(bucket(col("w"), "feat", featDim).cast("long")).as("wt"))
      .groupBy("doc_id").agg(sum("wt").as("sm"))
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), nToks(col("text")).as("n_tokens"))
      .join(scores, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("sm"), lit(0L)).as("score_milli"),
        (coalesce(col("sm"), lit(0L)) > 0).cast("int").as("pred"))
      .orderBy("doc_id")
  }

  // --- q175: k-fold cross-validation assignment ----------------------------

  private val nFolds = 5

  /** q175 — deterministic k-fold CV assignment: fold = md5-bucket of
    * doc_id (q111's split doctrine with k equal buckets), audited per
    * (fold, lang) so fold balance AND stratum drift are visible in one
    * relation. Membership is a pure row expression — folds are stable
    * under corpus growth, repartitioning, and re-runs, which is the whole
    * point vs `randomSplit` (nondeterministic under retries/reordering).
    */
  private def q175(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .withColumn("fold", bucket(col("doc_id"), "fold", nFolds).cast("int"))
      .groupBy("fold", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(nToks(col("text"))).as("n_tokens"))
      .orderBy("fold", "lang")

  // --- q177: shard manifest -------------------------------------------------

  /** q177 — training-shard manifest: q115's deterministic shuffle+deal
    * assignment rolled up into the dataset-card artifact a trainer
    * consumes — per shard, document/token/language counts plus an md5
    * fingerprint of the ordered member list. The fingerprint turns "the
    * shard layout is reproducible" into one comparable scalar (any
    * membership or order change flips it), the same trick as q164's
    * postings_md5. Total order via [[graft.functions.DistRank]] (q115's
    * distributed-rank doctrine — range shuffle, never a single-partition
    * window); md5-bucket sharding (q111) drops even that when ±1%
    * imbalance is acceptable.
    */
  private def q177(s: SparkSession, dir: String): DataFrame = {
    DistRank.withRowNumber(
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), nToks(col("text")).as("ntk")),
      "rn", md5(col("doc_id").cast("string")))
      .withColumn("shard", (col("rn") - 1) % 8)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("ntk").as("n_tokens"),
        countDistinct("lang").as("n_langs"),
        md5(concat_ws(",",
          sort_array(collect_list(col("doc_id"))).cast("array<string>")))
          .as("docs_md5"))
      .orderBy("shard")
  }

  // --- q184: temperature-weighted source mixture ---------------------------

  private val mixBudget = 50000L // tokens the trainer will draw

  /** q184 — temperature-based source sampling (the multilingual mixture
    * scheme of XLM-R/mT5: sample sources ∝ sizeᵅ, α < 1, so small
    * sources are up-weighted without drowning large ones): per source,
    * raw token share, α = 0.5 tempered share, and the epochs each source
    * repeats for under a [[mixBudget]]-token draw (epochs > 1 ⇒ the
    * source will be over-sampled/repeated — the signal mixture designers
    * balance against memorization).
    *
    * α is 0.5 BY DESIGN: sqrt is IEEE-correctly-rounded and therefore
    * bit-identical across engines, while `pow(x, 0.7)` is not guaranteed
    * correctly rounded and may differ by an ulp between libm
    * implementations — the one tempering exponent with exact cross-engine
    * semantics. Only the Σ sizeᵅ normalizer accumulates across rows
    * (round-6 doctrine); everything else is exact or a single division.
    *
    * Scale: one corpus scan into a source-grain aggregate (persisted —
    * the normalizer row and the final projection both read it), then a
    * broadcast of one scalar row.
    */
  private def q184(s: SparkSession, dir: String): DataFrame = {
    val perSrc = Tables.load(s, dir, "documents")
      .groupBy("source").agg(sum(nToks(col("text"))).as("n_tokens"))
      .withColumn("pw", sqrt(col("n_tokens").cast("double")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tot = perSrc.agg(sum("n_tokens").as("tot_tokens"),
      sum("pw").as("tot_pw"))
    perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("tot_tokens")).as("raw_share"),
        round(col("pw") / col("tot_pw"), 6).as("temp_share6"),
        round(lit(mixBudget) * col("pw") / col("tot_pw") / col("n_tokens"), 6)
          .as("epochs6"))
      .orderBy("source")
  }

  // --- q183: padding-efficiency audit (length-bucketed batching) -----------

  private val batchB = 16 // documents per training batch

  /** q183 — padding-waste audit for batched training: deal documents into
    * [[batchB]]-doc batches two ways — arrival order (doc_id) vs
    * length-sorted — and account the padding each strategy pays when
    * every batch pads to its longest member. The length-sorted deal is
    * the dynamic-batching trick every seq trainer uses; this query
    * quantifies exactly how many pad tokens it buys back (the spec pins
    * sorted < arrival).
    *
    * Scale: both deals run the [[graft.functions.DistRank]] exact
    * distributed row_number over an (id, length) projection, not the
    * payload — range shuffle + per-slice rank, no single-partition
    * window; production can further swap the exact deal for range-
    * partitioned length buckets when ±1 batch-size skew is acceptable.
    * Ratios are single divisions of exact integers.
    */
  private def q183(s: SparkSession, dir: String): DataFrame = {
    // persisted: both strategy audits deal from the same (id, length)
    // projection — without the cache each rank pass re-scans and
    // re-tokenizes the corpus
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), nToks(col("text")).as("ntk"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def audit(strategy: String, order: Seq[Column]): DataFrame = {
      DistRank.withRowNumber(docs, "rn", order: _*)
        .withColumn("b", floor((col("rn") - 1) / lit(batchB)).cast("int"))
        .groupBy("b")
        .agg(count(lit(1)).as("nb"), sum("ntk").as("real"),
          max("ntk").as("mx"))
        .agg(count(lit(1)).as("n_batches"),
          sum("real").as("real_tokens"),
          sum(col("nb") * col("mx")).as("padded_tokens"))
        .select(lit(strategy).as("strategy"), col("n_batches"),
          col("real_tokens"), col("padded_tokens"),
          ((col("padded_tokens") - col("real_tokens")).cast("double")
            / col("padded_tokens")).as("waste_ratio"))
    }
    audit("arrival", Seq(col("doc_id")))
      .unionByName(audit("length_sorted", Seq(col("ntk"), col("doc_id"))))
      .orderBy("strategy")
  }

  // --- q179: per-source corpus report card ---------------------------------

  /** q179 — the corpus report card: every per-document health signal the
    * pipeline computes (exact-dup membership = q60's md5-window flag,
    * quality-rule verdict = [[CorpusOpsPack.reasonOf]], classifier
    * polarity = q174's scorer as an in-row fold) rolled up to source
    * grain in ONE pass — the table a data-acquisition team reads to
    * decide which source to renegotiate, refilter, or drop.
    *
    * Scale: one corpus scan; the dup flag needs one hash window over the
    * text fingerprint and the rollup one exchange on source — every
    * other signal is a per-row expression (the classifier sum runs as an
    * `aggregate` fold over the token array, so it never explodes token
    * grain into the shuffle). mean_tokens is the single-division
    * exact-integer ratio of the [[QueryPack]] doctrine.
    */
  private def q179(s: SparkSession, dir: String): DataFrame = {
    val score = classifierScoreToks(col("tk"))
    Tables.loadParallel(s, dir, "documents")
      .select(col("doc_id"), col("source"), md5(col("text")).as("th"),
        TextOps.toks(col("text")).as("tk"))
      .select(col("doc_id"), col("source"), col("th"),
        size(col("tk")).as("ntk"),
        (CorpusOpsPack.reasonOf(col("tk")) =!= "pass").cast("long")
          .as("rule_fail"),
        score.as("clf"))
      .withColumn("is_dup",
        (row_number().over(Window.partitionBy("th").orderBy("doc_id")) > 1)
          .cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("ntk").as("n_tokens"),
        sum("is_dup").as("n_exact_dup"),
        sum("rule_fail").as("n_rule_fail"),
        sum((col("clf") <= 0).cast("long")).as("n_clf_neg"),
        (sum("ntk").cast("double") / count(lit(1))).as("mean_tokens"))
      .orderBy("source")
  }

  /** Word 8-grams of a text column as space-joined strings (empty array
    * when the document is shorter than 8 tokens).
    */
  private def grams8(text: Column): Column = {
    val tk = TextOps.toks(text)
    when(size(tk) >= 8,
      transform(sequence(lit(1), size(tk) - 7),
        i => concat_ws(" ", slice(tk, i, lit(8)))))
      .otherwise(array())
  }

  /** q143 — eval-set decontamination: training documents sharing any word
    * 8-gram with the benchmark source (`src0` plays the held-out eval
    * suite) are flagged, reported per source. The eval side is tiny by
    * construction (benchmarks are), so its distinct gram set broadcasts;
    * the training side explodes grams map-side and semi-joins — no
    * shuffle of the corpus itself. At 100 TB the gram strings would be
    * 64-bit hashes (q62's md5-window trick) to keep the broadcast and
    * the exploded width constant; raw strings here keep the oracle
    * byte-exact.
    */
  private def q143(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val evalGrams = docs.filter(col("source") === "src0")
      .select(explode(grams8(col("text"))).as("gram")).distinct()
    val train = docs.filter(col("source") =!= "src0")
    val contaminated = train
      .select(col("doc_id"), col("source"), explode(grams8(col("text"))).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"), "left_semi")
      .select("doc_id", "source").distinct()
    val flagged = contaminated.groupBy("source")
      .agg(count(lit(1)).as("n_contaminated"))
    train.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .join(flagged, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contamination_pct",
        lit(100.0) * col("n_contaminated") / col("n_docs"))
      .orderBy("source")
  }

  /** q144 — PII redaction: scrub emails and NNN-NNN-NNNN phone numbers to
    * typed placeholders, count matches per document. The corpus carries
    * no PII, so deterministic synthetic contacts are injected first
    * (email for doc_id ≡ 0 mod 3, phone for ≡ 1, none for ≡ 2) — the
    * regexes are exercised against known positives AND negatives. Pure
    * per-row narrow ops: no shuffle at any scale. Patterns stay in the
    * RE2 ∩ Java dialect intersection so both engines match identically.
    */
  private def q144(s: SparkSession, dir: String): DataFrame = {
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    // \b so a longer digit run (e.g. an id "12345-678-9012x") can't match
    // partially — ASCII word boundaries exist in both Java regex and
    // DuckDB's RE2
    val phoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
    val m3 = col("doc_id") % 3
    val injected = when(m3 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@mail.example.com now")))
      .when(m3 === 1,
        concat(col("text"), lit(" call 555-"), col("doc_id") % 900 + 100,
          lit("-"), col("doc_id") % 9000 + 1000))
      .otherwise(col("text"))
    Tables.load(s, dir, "documents")
      .withColumn("injected", injected)
      .select(col("doc_id"),
        size(regexp_extract_all(col("injected"), lit(emailRe), lit(0)))
          .as("n_emails"),
        size(regexp_extract_all(col("injected"), lit(phoneRe), lit(0)))
          .as("n_phones"),
        regexp_replace(regexp_replace(col("injected"), emailRe, "[EMAIL]"),
          phoneRe, "[PHONE]").as("redacted"))
      .orderBy("doc_id")
  }

  /** q170 — the composed corpus pipeline (dedup → quality filter →
    * mixture → pack) as ONE single-scan query with a stage-by-stage
    * survival ledger. Each stage is a FLAG derived from the previous
    * stage's flag (kd → kf → km), never a materialized filter, so the
    * whole cascade runs in one pass with two windows (the md5-group
    * dedup rank and the per-source packing cumsum over survivor tokens)
    * and one final aggregate — at 100 TB this is the difference between
    * one corpus read and four. Every stage reuses THE canonical
    * definition of its op: dedup keeper = q60's min-doc_id-per-hash,
    * quality = [[CorpusOpsPack.reasonOf]], mixture = q112's
    * rate-by-source-class bucket, packing = q106's cumsum bins (shared
    * `packCap`). The ledger (docs + tokens surviving each stage, final
    * bin count) is what a production corpus build logs per run.
    */
  private def q170(s: SparkSession, dir: String): DataFrame = {
    val srcNum = regexp_extract(col("source"), "([0-9]+)$", 1).cast("int")
    val rate = (srcNum % 4) * 25 + 25
    val base = Tables.loadParallel(s, dir, "documents")
      .select(col("doc_id"), col("source"), md5(col("text")).as("th"),
        TextOps.toks(col("text")).as("tk"))
      .select(col("doc_id"), col("source"), col("th"),
        size(col("tk")).as("n_words"),
        CorpusOpsPack.reasonOf(col("tk")).as("reason"))
    val flagged = base
      .withColumn("kd", (row_number().over(
        Window.partitionBy("th").orderBy("doc_id")) === 1).cast("int"))
      .withColumn("kf",
        (col("kd") === 1 && col("reason") === "pass").cast("int"))
      .withColumn("km", (col("kf") === 1 &&
        bucket(col("doc_id"), "mix", 100) < rate).cast("int"))
    val binW = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    flagged
      .withColumn("cum", sum(col("km") * col("n_words")).over(binW))
      .withColumn("bin",
        floor((col("cum") - 1) / TextPack.packCap).cast("int"))
      .agg(
        count(lit(1)).as("n_raw"),
        sum("n_words").cast("long").as("tok_raw"),
        sum("kd").cast("long").as("n_dedup"),
        sum(col("kd") * col("n_words")).cast("long").as("tok_dedup"),
        sum("kf").cast("long").as("n_filter"),
        sum(col("kf") * col("n_words")).cast("long").as("tok_filter"),
        sum("km").cast("long").as("n_mixture"),
        sum(col("km") * col("n_words")).cast("long").as("tok_mixture"),
        countDistinct(when(col("km") === 1,
          concat_ws("|", col("source"), col("bin")))).as("n_bins"))
  }

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q170_corpus_pipeline" -> q170 _,
    "q143_decontamination" -> q143 _,
    "q144_pii_redaction" -> q144 _,
    "q111_train_val_split" -> q111 _,
    "q112_dataset_mixture" -> q112 _,
    "q113_token_budget" -> q113 _,
    "q114_curriculum_stages" -> q114 _,
    "q115_shuffle_shards" -> q115 _,
    "q123_group_sample" -> q123 _,
    "q174_hash_classifier" -> q174 _,
    "q175_kfold_assignment" -> q175 _,
    "q177_shard_manifest" -> q177 _,
    "q179_source_report_card" -> q179 _,
    "q183_padding_audit" -> q183 _,
    "q184_temperature_mixture" -> q184 _)

  override val oracle: Seq[(String, String)] = Seq(
    "q170_corpus_pipeline" ->
      s"""WITH t AS (
         | SELECT doc_id, source, md5(text) AS th,
         |  ${CorpusOpsPack.duckToks} AS tk
         | FROM documents),
         |sg AS (SELECT doc_id, source, th,
         |  ${CorpusOpsPack.duckSignalCols}
         | FROM t),
         |f1 AS (SELECT *,
         |  CASE WHEN row_number() OVER (PARTITION BY th ORDER BY doc_id)
         |        = 1 THEN 1 ELSE 0 END AS kd,
         |  ${CorpusOpsPack.duckReasonCase} AS reason
         | FROM sg),
         |f2 AS (SELECT *,
         |  CASE WHEN kd = 1 AND reason = 'pass' THEN 1 ELSE 0 END AS kf
         | FROM f1),
         |f3 AS (SELECT *,
         |  CASE WHEN kf = 1 AND ${duckBucket("doc_id", "mix", 100)}
         |        < (CAST(regexp_extract(source, '([0-9]+)$$', 1) AS INT)
         |           % 4 * 25 + 25) THEN 1 ELSE 0 END AS km
         | FROM f2),
         |f4 AS (SELECT *,
         |  CAST(floor((sum(km * n_words) OVER (PARTITION BY source
         |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
         |    CURRENT ROW) - 1) / ${TextPack.packCap}) AS INT) AS bin
         | FROM f3)
         |SELECT CAST(count(*) AS BIGINT) AS n_raw,
         | CAST(sum(n_words) AS BIGINT) AS tok_raw,
         | CAST(sum(kd) AS BIGINT) AS n_dedup,
         | CAST(sum(kd * n_words) AS BIGINT) AS tok_dedup,
         | CAST(sum(kf) AS BIGINT) AS n_filter,
         | CAST(sum(kf * n_words) AS BIGINT) AS tok_filter,
         | CAST(sum(km) AS BIGINT) AS n_mixture,
         | CAST(sum(km * n_words) AS BIGINT) AS tok_mixture,
         | count(DISTINCT CASE WHEN km = 1
         |   THEN source || '|' || CAST(bin AS VARCHAR) END) AS n_bins
         |FROM f4""".stripMargin,
    "q143_decontamination" ->
      """WITH tk AS (
        | SELECT doc_id, source,
        |  list_filter(string_split(text, ' '), x -> x <> '') AS tk
        | FROM documents),
        |g AS (
        | SELECT doc_id, source,
        |  unnest(list_transform(range(1, len(tk) - 6),
        |    i -> array_to_string(list_slice(tk, i, i + 7), ' '))) AS gram
        | FROM tk WHERE len(tk) >= 8),
        |eval_g AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
        |contam AS (
        | SELECT DISTINCT t.doc_id, t.source
        | FROM g t JOIN eval_g e ON t.gram = e.gram
        | WHERE t.source <> 'src0'),
        |flagged AS (
        | SELECT source, count(*) AS n_contaminated FROM contam GROUP BY 1),
        |tot AS (
        | SELECT source, count(*) AS n_docs FROM documents
        | WHERE source <> 'src0' GROUP BY 1)
        |SELECT tot.source, tot.n_docs,
        | COALESCE(flagged.n_contaminated, 0) AS n_contaminated,
        | CAST(100.0 AS DOUBLE) * COALESCE(flagged.n_contaminated, 0)
        |   / tot.n_docs AS contamination_pct
        |FROM tot LEFT JOIN flagged ON tot.source = flagged.source
        |ORDER BY tot.source""".stripMargin,
    "q144_pii_redaction" ->
      """WITH inj AS (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@mail.example.com now'
        |  WHEN doc_id % 3 = 1 THEN
        |    text || ' call 555-' || CAST(doc_id % 900 + 100 AS VARCHAR)
        |      || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR)
        |  ELSE text END AS injected
        | FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(injected,
        |   '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_emails,
        | CAST(len(regexp_extract_all(injected,
        |   '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS INT) AS n_phones,
        | regexp_replace(regexp_replace(injected,
        |   '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
        |   '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '[PHONE]', 'g') AS redacted
        |FROM inj ORDER BY doc_id""".stripMargin,
    "q111_train_val_split" ->
      s"""WITH d AS (
         | SELECT *, ${duckBucket("doc_id", "split", 100)} AS b
         | FROM documents)
         |SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
         |  ELSE 'test' END AS split,
         | count(*) AS n_docs,
         | CAST(sum($duckNToks) AS BIGINT) AS n_tokens,
         | CAST(sum(n_chars) AS BIGINT) AS n_chars
         |FROM d GROUP BY 1 ORDER BY split""".stripMargin,
    "q112_dataset_mixture" ->
      s"""WITH d AS (
         | SELECT source, n_chars,
         |  CAST(regexp_extract(source, '([0-9]+)$$', 1) AS INT) % 4 * 25 + 25
         |    AS rate,
         |  ${duckBucket("doc_id", "mix", 100)} AS b
         | FROM documents)
         |SELECT source, count(*) AS n_total,
         | CAST(sum(CASE WHEN b < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         | CAST(sum(n_chars * CASE WHEN b < rate THEN 1 ELSE 0 END) AS BIGINT)
         |   AS chars_kept,
         | max(rate) AS keep_pct
         |FROM d GROUP BY source ORDER BY source""".stripMargin,
    "q113_token_budget" ->
      s"""WITH d AS (
         | SELECT source, doc_id,
         |  CAST($duckNToks AS BIGINT) AS n_tokens, n_chars
         | FROM documents),
         |c AS (
         | SELECT source,
         |  sum(n_tokens) OVER (PARTITION BY source
         |    ORDER BY n_chars DESC, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
         | FROM d)
         |SELECT source, count(*) AS docs_kept,
         | CAST(max(cum_tokens) AS BIGINT) AS tokens_used
         |FROM c WHERE cum_tokens <= 3000
         |GROUP BY source ORDER BY source""".stripMargin,
    "q114_curriculum_stages" ->
      s"""WITH d AS (
         | SELECT doc_id, n_chars,
         |  list_sum(list_transform(list_filter(string_split(text, ' '),
         |      x -> x <> ''), x -> length(x)))
         |    / $duckNToks AS difficulty
         | FROM documents),
         |t AS (
         | -- NULLS FIRST explicitly: a zero-token doc has NULL difficulty
         | -- (0/0) and Spark defaults NULLS FIRST where DuckDB defaults
         | -- NULLS LAST — without the pin, stage assignment diverges the
         | -- moment the corpus gains an empty document
         | SELECT *, ntile(4) OVER (ORDER BY difficulty NULLS FIRST, doc_id)
         |   AS stage
         | FROM d)
         |SELECT stage, count(*) AS n_docs,
         | min(difficulty) AS min_difficulty,
         | max(difficulty) AS max_difficulty,
         | CAST(sum(n_chars) AS BIGINT) AS n_chars
         |FROM t GROUP BY stage ORDER BY stage""".stripMargin,
    "q115_shuffle_shards" ->
      """WITH t AS (
        | SELECT doc_id, n_chars,
        |  (row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))) - 1) % 8
        |    AS shard
        | FROM documents)
        |SELECT shard, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS n_chars,
        | min(doc_id) AS min_doc_id
        |FROM t GROUP BY shard ORDER BY shard""".stripMargin,
    "q123_group_sample" ->
      """WITH d AS (
        | SELECT source, doc_id,
        |  CAST('0x' || substring(md5('sample|' || CAST(doc_id AS VARCHAR)),
        |    1, 8) AS BIGINT) AS h
        | FROM documents),
        |r AS (
        | SELECT *, row_number() OVER (
        |   PARTITION BY source ORDER BY h, doc_id) AS rank
        | FROM d)
        |SELECT source, CAST(rank AS INT) AS rank, doc_id, h
        |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin,
    "q174_hash_classifier" ->
      s"""WITH x AS (
         | SELECT doc_id, unnest(${CorpusOpsPack.duckToks}) AS w
         | FROM documents),
         |wt AS (
         | SELECT doc_id,
         |  (${duckBucket("w", "feat", featDim)} * 1103515245 + 12345)
         |    % 2001 - 1000 AS wt
         | FROM x),
         |a AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS sm
         |      FROM wt GROUP BY 1)
         |SELECT d.doc_id,
         | CAST($duckNToks AS INT) AS n_tokens,
         | COALESCE(a.sm, 0) AS score_milli,
         | CASE WHEN COALESCE(a.sm, 0) > 0 THEN 1 ELSE 0 END AS pred
         |FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "q175_kfold_assignment" ->
      s"""SELECT CAST(${duckBucket("doc_id", "fold", nFolds)} AS INT) AS fold,
         | lang, count(*) AS n_docs,
         | CAST(sum($duckNToks) AS BIGINT) AS n_tokens
         |FROM documents GROUP BY 1, 2 ORDER BY fold, lang""".stripMargin,
    "q177_shard_manifest" ->
      s"""WITH t AS (
         | SELECT doc_id, lang, $duckNToks AS ntk,
         |  (row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))) - 1) % 8
         |    AS shard
         | FROM documents)
         |SELECT shard, count(*) AS n_docs,
         | CAST(sum(ntk) AS BIGINT) AS n_tokens,
         | CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         | md5(array_to_string(list_sort(list(doc_id)), ',')) AS docs_md5
         |FROM t GROUP BY shard ORDER BY shard""".stripMargin,
    "q179_source_report_card" ->
      s"""WITH t AS (
         | SELECT doc_id, source, md5(text) AS th,
         |  ${CorpusOpsPack.duckToks} AS tk
         | FROM documents),
         |sg AS (
         | SELECT doc_id, source, th, len(tk) AS ntk,
         |  ${CorpusOpsPack.duckSignalCols},
         |  $duckClfScore AS clf
         | FROM t),
         |f AS (
         | SELECT *,
         |  CASE WHEN row_number() OVER (PARTITION BY th ORDER BY doc_id)
         |        > 1 THEN 1 ELSE 0 END AS is_dup,
         |  CASE WHEN ${CorpusOpsPack.duckReasonCase}
         |        <> 'pass' THEN 1 ELSE 0 END AS rule_fail
         | FROM sg)
         |SELECT source, count(*) AS n_docs,
         | CAST(sum(ntk) AS BIGINT) AS n_tokens,
         | CAST(sum(is_dup) AS BIGINT) AS n_exact_dup,
         | CAST(sum(rule_fail) AS BIGINT) AS n_rule_fail,
         | CAST(sum(CASE WHEN clf <= 0 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_clf_neg,
         | CAST(sum(ntk) AS DOUBLE) / count(*) AS mean_tokens
         |FROM f GROUP BY source ORDER BY source""".stripMargin,
    "q183_padding_audit" ->
      s"""WITH d AS (SELECT doc_id, $duckNToks AS ntk FROM documents),
         |aa AS (SELECT ntk,
         |        (row_number() OVER (ORDER BY doc_id) - 1) // $batchB AS b
         |       FROM d),
         |ab AS (SELECT b, count(*) AS nb, sum(ntk) AS real, max(ntk) AS mx
         |       FROM aa GROUP BY b),
         |ar AS (SELECT 'arrival' AS strategy,
         |        CAST(count(*) AS BIGINT) AS n_batches,
         |        CAST(sum(real) AS BIGINT) AS real_tokens,
         |        CAST(sum(nb * mx) AS BIGINT) AS padded_tokens FROM ab),
         |sa AS (SELECT ntk,
         |        (row_number() OVER (ORDER BY ntk, doc_id) - 1) // $batchB
         |          AS b
         |       FROM d),
         |sb AS (SELECT b, count(*) AS nb, sum(ntk) AS real, max(ntk) AS mx
         |       FROM sa GROUP BY b),
         |sr AS (SELECT 'length_sorted' AS strategy,
         |        CAST(count(*) AS BIGINT) AS n_batches,
         |        CAST(sum(real) AS BIGINT) AS real_tokens,
         |        CAST(sum(nb * mx) AS BIGINT) AS padded_tokens FROM sb)
         |SELECT strategy, n_batches, real_tokens, padded_tokens,
         | CAST(padded_tokens - real_tokens AS DOUBLE) / padded_tokens
         |   AS waste_ratio
         |FROM (SELECT * FROM ar UNION ALL SELECT * FROM sr) u
         |ORDER BY strategy""".stripMargin,
    "q184_temperature_mixture" ->
      s"""WITH p AS (
         | SELECT source, CAST(sum($duckNToks) AS BIGINT) AS n_tokens
         | FROM documents GROUP BY 1),
         |w AS (SELECT source, n_tokens,
         |       sqrt(CAST(n_tokens AS DOUBLE)) AS pw FROM p),
         |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
         |       sum(pw) AS tot_pw FROM w)
         |SELECT source, n_tokens,
         | CAST(n_tokens AS DOUBLE) / tot_tokens AS raw_share,
         | round(pw / tot_pw, 6) AS temp_share6,
         | round($mixBudget * pw / tot_pw / n_tokens, 6) AS epochs6
         |FROM w CROSS JOIN t ORDER BY source""".stripMargin)
}
