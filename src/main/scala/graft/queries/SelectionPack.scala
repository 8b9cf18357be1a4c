package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.Tables

/** Data-selection & estimation depth: within-doc repetition audit (the
  * Gopher repetition rules beyond q158's unigram mass), held-out evaluation
  * of the corpus bigram LM on the canonical train/val/test split, Duffield
  * priority sampling with its subset-sum estimator, and a per-source
  * adaptive quality gate (median-thresholded rather than fixed-constant) —
  * the selection loop a pretraining corpus pipeline runs after the fixed
  * rule cascade (q158) and before mixture/packing (q112/q222).
  *
  * Scale doctrine: repetition signals are pure per-row array work (zero
  * shuffle); LM eval reuses q154's exact integer micro-unit scoring with
  * counts learned ONLY from the train split (two shrinking count
  * aggregations, broadcast vocab scalar); priority sampling is one scan for
  * keys + a top-(k+1) selection (TakeOrdered at scale; rank-window here for
  * oracle parity) + exact integer estimator arithmetic; the adaptive gate is
  * the q225/q226 sort-based midrank selection at source grain with a 20-row
  * broadcast of thresholds.
  */
object SelectionPack extends QueryPack {

  import TrainingPipelinePack.{bucket, duckBucket, md5Hash32}

  private def toks(c: Column): Column = TextOps.toks(c)
  private val duckToks = "list_filter(string_split(text, ' '), x -> x <> '')"

  /** Adjacent-token bigrams as "u w" strings (q154's zip_with shape — never
    * `sequence(1, n-1)`, which DESCENDS for n = 0 in Spark). */
  private def bigrams(t: Column): Column =
    zip_with(
      slice(t, lit(1), greatest(size(t) - 1, lit(0))),
      slice(t, lit(2), greatest(size(t) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))

  // --- q227: within-doc repetition audit -----------------------------------

  /** q227 — within-document BIGRAM repetition (the Gopher duplicate-n-gram
    * family; q158's cascade stops at unigram max-tf): per doc the bigram
    * count, distinct-bigram count, and top-bigram count; a doc is flagged
    * repetitive when the top bigram carries >20% of bigram mass or >50% of
    * bigrams are duplicates — both evaluated as EXACT integer
    * cross-products (`top·5 > n`, `(n−distinct)·2 > n`), no ratio floats
    * in the decision. Per-source rollup keeps raw integer sums and derives
    * the shares once at the end. Pure per-row array work feeding one
    * partial-agg shuffle at source grain.
    */
  private def q227(s: SparkSession, dir: String): DataFrame = {
    val bi = bigrams(toks(col("text")))
    val perDoc = Tables.loadParallel(s, dir, "documents")
      .select(col("source"), col("doc_id"), bi.as("bi"))
      .select(col("source"), size(col("bi")).cast("long").as("n_bi"),
        size(array_distinct(col("bi"))).cast("long").as("n_dist"),
        coalesce(array_max(transform(array_distinct(col("bi")),
          w => size(filter(col("bi"), t => t === w)))).cast("long"),
          lit(0L)).as("top_cnt"))
    perDoc
      .withColumn("flag",
        when(col("n_bi") > 0 &&
          (col("top_cnt") * 5 > col("n_bi") ||
            (col("n_bi") - col("n_dist")) * 2 > col("n_bi")), 1L)
          .otherwise(0L))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_bi").as("sum_bigrams"),
        sum("n_dist").as("sum_distinct"), sum("top_cnt").as("sum_top"),
        sum("flag").as("n_repetitive"))
      .withColumn("dup_mass",
        (col("sum_bigrams") - col("sum_distinct")).cast("double") /
          col("sum_bigrams"))
      .withColumn("mean_top_mass",
        col("sum_top").cast("double") / col("sum_bigrams"))
      .orderBy("source")
  }

  // --- q228: held-out LM evaluation ----------------------------------------

  /** q228 — held-out evaluation of the corpus bigram LM: counts and vocab
    * learned ONLY from the q111 train split (md5 bucket < 80), then each
    * val/test bigram scored with the same Laplace form q154 uses —
    * `p = (c_uw+1)/(c_u+V)`, entering the sums as exact micro-units
    * `⌊p·1e6 + 0.5⌋` — plus the out-of-vocabulary bigram rate (bigram
    * never seen in train). The generalization-gap readout a real LM data
    * ablation needs; scoring val with train-only counts is what makes it
    * held-out rather than q154's in-corpus fit. Count tables shrink to
    * bigram-type grain before the join; vocab size broadcasts as a scalar.
    */
  private def q228(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .withColumn("b", bucket(col("doc_id"), "split", 100))
      .withColumn("split",
        when(col("b") < 80, "train").when(col("b") < 90, "val")
          .otherwise("test"))
    val exploded = docs
      .select(col("split"), col("doc_id"), explode(bigrams(toks(col("text"))))
        .as("bg"))
    val train = exploded.filter(col("split") === "train")
    val cBig = train.groupBy("bg").agg(count(lit(1)).as("c_uw"))
    val cUni = train
      .withColumn("u", split(col("bg"), " ").getItem(0))
      .groupBy("u").agg(count(lit(1)).as("c_u"))
    val vocab = docs.filter(col("split") === "train")
      .select(explode(toks(col("text"))).as("tok"))
      .agg(countDistinct("tok").as("vsz"))
    val nDocs = docs.filter(col("split") =!= "train")
      .groupBy("split").agg(count(lit(1)).as("n_docs"))
    val scored = exploded.filter(col("split") =!= "train")
      .join(cBig, Seq("bg"), "left")
      .withColumn("u", split(col("bg"), " ").getItem(0))
      .join(cUni, Seq("u"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("p",
        (coalesce(col("c_uw"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c_u"), lit(0L)) + col("vsz")).cast("double"))
      .withColumn("units", floor(col("p") * 1000000.0 + 0.5).cast("long"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c_uw").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum("units").as("units_sum"))
    nDocs.join(scored, Seq("split"))
      .select(col("split"), col("n_docs"), col("n_bigrams"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_bigrams")).as("oov_rate"),
        (col("units_sum").cast("double") / col("n_bigrams"))
          .as("mean_units"))
      .orderBy("split")
  }

  // --- q229: Duffield priority sampling ------------------------------------

  /** q229 — priority sampling (Duffield-Lund-Thorup): a fixed-size weighted
    * sample of orders whose subset-sum estimator is unbiased for total
    * revenue. Priority `q = w/u` with deterministic u = (md5-u32+1)/2³²
    * becomes the EXACT integer key `(cents·2³²) div (h+1)`; the sample is
    * the top k=100 keys, the threshold τ is the (k+1)-th, and the
    * estimate is Σ max(wᵢ, τ) over the sample — every comparison and the
    * estimator itself in integer cents. The top-(k+1) plans as Spark's
    * TakeOrderedAndProject (per-partition heads + driver merge — never a
    * global sort or a single-partition window over the corpus); the rank
    * window then runs over the k+1 surviving rows only, a bounded grain.
    * One scan, one k-row reduction.
    */
  private def q229(s: SparkSession, dir: String): DataFrame = {
    val k = 100
    val cents = round(col("o_totalprice") * 100).cast("long")
    val h = md5Hash32(col("o_orderkey"), "prio")
    val keyed = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), cents.as("cents"),
        call_function("div", cents * lit(4294967296L), h + 1).as("key"))
    val top = keyed
      .orderBy(col("key").desc, col("o_orderkey")).limit(k + 1)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("key").desc, col("o_orderkey"))))
    val tau = top.filter(col("rn") === k + 1)
      .select(col("key").as("tau"))
    val trueTot = Tables.load(s, dir, "orders")
      .agg(sum(cents).as("true_cents"))
    top.filter(col("rn") <= k)
      .crossJoin(broadcast(tau))
      .agg(count(lit(1)).as("k"), first("tau").as("tau"),
        sum(greatest(col("cents"), col("tau"))).as("est_cents"))
      .crossJoin(broadcast(trueTot))
      .select(col("k"), col("tau"),
        (col("est_cents") / lit(100.0)).as("est_total"),
        (col("true_cents") / lit(100.0)).as("true_total"),
        (col("est_cents").cast("double") / col("true_cents")).as("ratio"))
  }

  // --- q230: per-source adaptive quality gate ------------------------------

  /** q230 — adaptive quality gate: keep a document when its distinct-token
    * ratio clears its SOURCE'S median (vs q158's global constants — the
    * per-source calibration step a heterogeneous corpus needs, since a
    * boilerplate-heavy source would otherwise lose everything). The median
    * is the q225 midrank selection (values only, no interpolation); the
    * keep test runs as `2·dr ≥ dr_lo + dr_hi`, doubles built by the
    * identical op sequence in both engines. Tokenless docs rank nowhere
    * and never pass (they stay in n_docs — q96 doctrine). One sort-based
    * window at source grain + a 20-row broadcast threshold join.
    */
  private def q230(s: SparkSession, dir: String): DataFrame = {
    val perDoc = Tables.load(s, dir, "documents")
      .select(col("source"), col("doc_id"), toks(col("text")).as("tk"))
      .select(col("source"), col("doc_id"),
        size(col("tk")).cast("long").as("n"),
        (size(array_distinct(col("tk"))).cast("double") / size(col("tk")))
          .as("dr"))
    val ranked = perDoc.filter(col("n") > 0)
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("dr"), col("doc_id"))))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("source")))
    val med = ranked
      .filter(col("rn") === floor((col("cnt") + 1) / lit(2.0)) ||
        col("rn") === ceil((col("cnt") + 1) / lit(2.0)))
      .groupBy("source")
      .agg((sum("dr") * lit(2) / count(lit(1))).as("med2"))
    perDoc.join(broadcast(med), Seq("source"))
      .withColumn("keep",
        when(col("n") > 0 && col("dr") * 2 >= col("med2"), 1L)
          .otherwise(0L))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("keep").as("n_kept"),
        first("med2").as("med2"),
        sum(col("n") * col("keep")).as("kept_toks"), sum("n").as("toks"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        (col("med2") / 2).as("median_dr"),
        (col("kept_toks").cast("double") / col("toks"))
          .as("kept_token_share"))
      .orderBy("source")
  }

  // --- q231: composed selection pipeline -----------------------------------

  /** q231 — the round-4 selection pipeline composed end-to-end: repetition
    * screen (q227's bigram rules) → per-source adaptive median gate
    * (q230) → DSIR importance selection (q224's learned weights) → greedy
    * packing of survivors (q222's fold), reported as a single-row
    * stage-survival ledger (the q170 flag-cascade doctrine: each stage is
    * a flag derived from the previous flag, never a materialized filter,
    * and every stage reuses THE canonical definition of its op). The
    * tokenized base persists once and feeds all four stages: two
    * token-grain aggregations (weight learning, doc scoring), one
    * source-grain midrank window, one survivor packing fold — a real
    * corpus build's selection pass as one job instead of four.
    */
  private def q231(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.loadParallel(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        toks(col("text")).as("tk"))
      .persist()
    val sig = base
      .select(col("doc_id"), col("source"), col("tk"),
        bigrams(col("tk")).as("bi"))
      .select(col("doc_id"), col("source"),
        size(col("tk")).cast("long").as("n"),
        (size(array_distinct(col("tk"))).cast("double") /
          size(col("tk"))).as("dr"),
        size(col("bi")).cast("long").as("n_bi"),
        size(array_distinct(col("bi"))).cast("long").as("n_dist"),
        coalesce(array_max(transform(array_distinct(col("bi")),
          w => size(filter(col("bi"), t => t === w)))).cast("long"),
          lit(0L)).as("top_cnt"))
    val med = sig.filter(col("n") > 0)
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("dr"), col("doc_id"))))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("source")))
      .filter(col("rn") === floor((col("cnt") + 1) / lit(2.0)) ||
        col("rn") === ceil((col("cnt") + 1) / lit(2.0)))
      .groupBy("source")
      .agg((sum("dr") * lit(2) / count(lit(1))).as("med2"))
    val tokens = base
      .select(col("doc_id"), col("lang"), explode(col("tk")).as("tok"))
      .withColumn("b", bucket(col("tok"), "dsir", 1024))
    val wts = tokens.groupBy("b")
      .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr"))
      .select(col("b"), call_function("div",
        (col("ct") + 1) * 1000, col("cr") + 1).as("w"))
    val scores = tokens.join(broadcast(wts), "b")
      .groupBy("doc_id").agg(sum("w").as("score"))
    // corpus totals for the q224 relative selection cut (one broadcast row)
    val tot = scores.agg(sum("score").as("tot_score"))
      .crossJoin(sig.agg(sum("n").as("tot_toks")))
    val flagged = sig
      .join(broadcast(med), Seq("source"), "left")
      .join(scores, Seq("doc_id"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("score", coalesce(col("score"), lit(0L)))
      .withColumn("k1",
        when(!(col("n_bi") > 0 && (col("top_cnt") * 5 > col("n_bi") ||
          (col("n_bi") - col("n_dist")) * 2 > col("n_bi"))), 1L)
          .otherwise(0L))
      .withColumn("k2",
        when(col("k1") === 1 && col("n") > 0 &&
          col("dr") * 2 >= col("med2"), 1L).otherwise(0L))
      .withColumn("k3",
        when(col("k2") === 1 &&
          col("score").cast("double") / col("n") >=
            col("tot_score").cast("double") / col("tot_toks"), 1L)
          .otherwise(0L))
    def packStep(acc: Column, x: Column): Column = {
      val n = x.getField("pn")
      when(element_at(acc, 2) + n <= 256,
        array(element_at(acc, 1), element_at(acc, 2) + n))
        .otherwise(array(element_at(acc, 1) + 1, n))
    }
    val packed = flagged.filter(col("k3") === 1)
      .select(col("source"), bucket(col("doc_id"), "pack", 8).as("shard"),
        col("doc_id"), least(col("n"), lit(256L)).as("pn"))
      .groupBy("source", "shard")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("pn"))))
        .as("docs"))
      .select(aggregate(
        slice(col("docs"), lit(2), size(col("docs")) - 1),
        array(lit(1L), element_at(col("docs"), 1).getField("pn")),
        packStep).as("st"))
      .agg(coalesce(sum(element_at(col("st"), 1)), lit(0L)).as("n_bins"))
    flagged.agg(
      count(lit(1)).as("n_raw"), sum("n").as("tok_raw"),
      sum("k1").as("n_clean"), sum(col("k1") * col("n")).as("tok_clean"),
      sum("k2").as("n_gate"), sum(col("k2") * col("n")).as("tok_gate"),
      sum("k3").as("n_selected"),
      sum(col("k3") * col("n")).as("tok_selected"),
      sum(col("k3") * least(col("n"), lit(256L))).as("packed_tokens"))
      .crossJoin(broadcast(packed))
  }

  // --- q232: cross-channel day-of-week mix ---------------------------------

  /** q232 — cross-channel revenue mix by ISO weekday (the TPC-DS
    * store-vs-web reporting shape mapped onto this schema: `orders` is the
    * store channel, purchase events the web channel): per weekday the
    * exact-cents revenue of each channel and the web/store ratio. Two
    * independent partial-agg reductions to 7-row grain joined at the end —
    * nothing ever shuffles at fact grain, so the shape is
    * scan-bandwidth-bound at any scale.
    */
  private def q232(s: SparkSession, dir: String): DataFrame = {
    val store = Tables.load(s, dir, "orders")
      .groupBy((weekday(to_date(col("o_orderdate"))) + 1).as("isodow"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))
        .as("store_cents"))
    val web = Tables.load(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy((weekday(to_date(Tables.tsMicros(col("ts")))) + 1)
        .as("isodow"))
      .agg(sum(round(col("value") * 100).cast("long")).as("web_cents"))
    store.join(web, "isodow")
      .select(col("isodow").cast("int").as("isodow"),
        col("store_cents"), col("web_cents"),
        (col("web_cents").cast("double") / col("store_cents"))
          .as("web_store_ratio"))
      .orderBy("isodow")
  }

  // --- q233: funnel step timing --------------------------------------------

  /** q233 — funnel step-completion timing: among users who reached each
    * q199 funnel step, the MEDIAN time from the previous step (view→click,
    * click→purchase), read straight from the DP fold's earliest-completion
    * timestamps ([[ExperimentsPack.funnelFold]] — the same state q199
    * collapses to a level, kept instead). Gaps are exact µs longs; the
    * median is the q225 midrank selection carried as `lo+hi` (half-µs
    * grain) with the ÷2 deferred to the final output. One user-grain fold
    * + one window over the (tiny) per-step gap sets.
    */
  private def q233(s: SparkSession, dir: String): DataFrame = {
    val inf = Long.MaxValue
    val gaps = ExperimentsPack
      .funnelFold(Tables.load(s, dir, "events"), 604800000000L)
      .select(col("user_id"),
        element_at(col("f"), 3).as("t1"), element_at(col("f"), 4).as("t2"),
        element_at(col("f"), 5).as("t3"))
      .select(col("user_id"), explode(array(
        struct(lit("view_to_click").as("step"),
          when(col("t2") < inf, col("t2") - col("t1")).as("gap")),
        struct(lit("click_to_purchase").as("step"),
          when(col("t3") < inf, col("t3") - col("t2")).as("gap"))))
        .as("g"))
      .select(col("user_id"), col("g.step").as("step"),
        col("g.gap").as("gap"))
      .filter(col("gap").isNotNull)
    val counts = gaps.groupBy("step").agg(count(lit(1)).as("n_users"))
    val med = gaps
      .withColumn("rn", row_number().over(
        Window.partitionBy("step").orderBy(col("gap"), col("user_id"))))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("step")))
      .filter(col("rn") === floor((col("cnt") + 1) / lit(2.0)) ||
        col("rn") === ceil((col("cnt") + 1) / lit(2.0)))
      .groupBy("step")
      .agg((sum("gap") * lit(2) / count(lit(1))).cast("long").as("med2_us"))
    counts.join(med, "step")
      .select(col("step"), col("n_users"), col("med2_us"),
        (col("med2_us") / lit(2.0) / lit(1000000.0)).as("median_gap_sec"))
      .orderBy("step")
  }

  // --- q268: source-mixture water-fill under a token budget ----------------

  private val mixEpochs = 4

  /** q268 — GREEDY WATER-FILL source mixing under a token budget (the
    * DoReMi/data-mixing question "how many epochs of each source?" as an
    * exact operator): each source offers up to 4 epochs whose marginal
    * value decays 2× per repeat (quality_micro div 2^{epoch−1} — the
    * diminishing-returns law repeated data obeys), the budget is 2× the
    * corpus token count (derived broadcast scalar, no constant to drift),
    * and the greedy optimum for separable diminishing returns is exactly:
    * rank ALL (source, epoch) candidates by marginal value and take while
    * cumulative tokens fit. Quality is the q207-family rule-pass rate in
    * exact integer micro-units. Scale shape: ONE corpus scan to source
    * grain; candidates are |sources|×4 rows, so the ranking window and
    * the prefix sum run on a model-sized relation at any corpus size.
    * Decay divisors via a literal power array (element_at) — integer
    * exact, no pow(). The decay law guarantees epoch e+1 never outranks
    * epoch e of the same source, so the greedy prefix is a valid
    * schedule by construction (spec-pinned).
    */
  private def q268(s: SparkSession, dir: String): DataFrame = {
    val src = Tables.loadParallel(s, dir, "documents")
      .select(col("source"), TextOps.nToks(col("text")).cast("long").as("nt"),
        when(CorpusOpsPack.reasonOf(toks(col("text"))) === "pass", 1L)
          .otherwise(0L).as("pass"))
      .groupBy("source")
      .agg(sum("nt").as("tokens"), count(lit(1)).as("n_docs"),
        sum("pass").as("n_pass"))
      .withColumn("quality_micro",
        expr("n_pass * 1000000 div n_docs"))
    val budget = src.agg((sum("tokens") * lit(2L)).as("budget"))
    val p2 = element_at(array(lit(1L), lit(2L), lit(4L), lit(8L)),
      col("epoch"))
    val cand = src.select(col("source"), col("tokens"),
        col("quality_micro"),
        explode(sequence(lit(1), lit(mixEpochs))).as("epoch"))
      .withColumn("mv_micro",
        call_function("div", col("quality_micro"), p2))
    val w = Window.orderBy(col("mv_micro").desc, col("source"), col("epoch"))
    cand.crossJoin(broadcast(budget))
      .withColumn("cum_tokens", sum("tokens").over(w))
      .filter(col("cum_tokens") <= col("budget"))
      .select(col("source"), col("epoch"), col("tokens"),
        col("quality_micro"), col("mv_micro"), col("cum_tokens"),
        col("budget"))
      .orderBy(col("mv_micro").desc, col("source"), col("epoch"))
  }

  // --- q280: Neyman-optimal stratified sampling allocation -----------------

  private val neymanBudget = 100L

  /** q280 — NEYMAN ALLOCATION: split a 100-doc sample budget across the
    * source strata ∝ n_h·σ_h (the variance-minimizing design for a
    * stratified mean estimate — the statistically principled version of
    * the proportional samplers q113/q229 implement). σ_h comes from the
    * exact population-variance rational (n·Σy² − (Σy)²)/n² over
    * n_chars; sqrt is correctly-rounded IEEE in both engines (the q195
    * doctrine), and the weight n_h·σ_h MICRO-QUANTIZES immediately so
    * the cross-strata total is an exact integer sum — never a
    * float-accumulation across rows. Integer seats assign by LARGEST
    * REMAINDER: base = B·w div W, then the B − Σbase leftover seats go
    * to the largest (remainder, source) ranks — exact, deterministic,
    * Σalloc = B by construction. Allocations cap at the stratum size
    * (no re-allocation — the single-pass contract, flagged in the
    * `capped` column). Selection inside each stratum is the salted-md5
    * rank (q111 doctrine), fingerprinted (q164's md5-of-sorted-ids) so
    * the driver compare pins the exact chosen SET. Everything after the
    * one corpus scan runs at stratum grain.
    */
  private def q280(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
    val g = base.groupBy("source").agg(
        count(lit(1)).as("n"),
        sum(col("n_chars")).as("sy"),
        sum(col("n_chars") * col("n_chars")).as("syy"))
      .withColumn("sigma",
        sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double")
          / (col("n") * col("n")).cast("double")))
      .withColumn("w_micro",
        floor(col("n").cast("double") * col("sigma") * 1e6).cast("long"))
    val tot = g.agg(sum("w_micro").as("wsum"))
    val seats = g.crossJoin(broadcast(tot))
      .withColumn("base", call_function("div",
        lit(neymanBudget) * col("w_micro"), col("wsum")))
      .withColumn("rem", (lit(neymanBudget) * col("w_micro")) % col("wsum"))
    val leftovers = seats.agg(
      (lit(neymanBudget) - sum("base")).as("r"))
    val alloc = seats.crossJoin(broadcast(leftovers))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("source"))))
      .withColumn("alloc_raw",
        col("base") + when(col("rk") <= col("r"), 1L).otherwise(0L))
      .withColumn("alloc", least(col("alloc_raw"), col("n")))
      .withColumn("capped",
        when(col("alloc_raw") > col("n"), 1).otherwise(0))
    val ranked = base.withColumn("mrk",
      md5Hash32(col("doc_id"), "neyman"))
    val chosen = ranked.join(broadcast(alloc.select("source", "alloc")),
        "source")
      .withColumn("rn", row_number().over(Window.partitionBy("source")
        .orderBy(col("mrk"), col("doc_id"))))
      .filter(col("rn") <= col("alloc"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_selected"),
        md5(concat_ws(",", sort_array(collect_list(col("doc_id")))))
          .as("sel_fp"))
    alloc.select("source", "n", "sigma", "w_micro", "alloc", "capped")
      .join(chosen, Seq("source"), "left")
      .select(col("source"), col("n"), col("sigma"), col("w_micro"),
        col("alloc"), col("capped"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"),
        col("sel_fp"))
      .orderBy("source")
  }

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] =
    Seq(
      "q268_mix_waterfill" -> q268 _,
      "q280_neyman_allocation" -> q280 _,
      "q227_repetition_audit" -> q227 _,
      "q228_heldout_lm_eval" -> q228 _,
      "q229_priority_sample" -> q229 _,
      "q230_adaptive_gate" -> q230 _,
      "q231_selection_pipeline" -> q231 _,
      "q232_cross_channel" -> q232 _,
      "q233_funnel_timing" -> q233 _)

  /** Bigrams "u w" over a captured `tk` list (index-lambda over a scalar
    * generate_series list; empty for <2 tokens). */
  private val duckBigrams =
    "list_transform(generate_series(1, greatest(len(tk) - 1, 0)), " +
      "i -> tk[i] || ' ' || tk[i + 1])"

  override val oracle: Seq[(String, String)] = Seq(
    "q280_neyman_allocation" ->
      s"""WITH base AS (SELECT source, doc_id, n_chars FROM documents),
         |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(n_chars) AS BIGINT) AS sy,
         |  CAST(sum(n_chars * n_chars) AS BIGINT) AS syy
         | FROM base GROUP BY 1),
         |g2 AS (SELECT *, sqrt(CAST(n * syy - sy * sy AS DOUBLE)
         |  / CAST(n * n AS DOUBLE)) AS sigma FROM g),
         |g3 AS (SELECT *, CAST(floor(CAST(n AS DOUBLE) * sigma * 1000000)
         |  AS BIGINT) AS w_micro FROM g2),
         |tot AS (SELECT CAST(sum(w_micro) AS BIGINT) AS wsum FROM g3),
         |seats AS (SELECT g3.*,
         |  CAST($neymanBudget * w_micro // wsum AS BIGINT) AS seat_base,
         |  CAST(($neymanBudget * w_micro) % wsum AS BIGINT) AS rem
         | FROM g3, tot),
         |lf AS (SELECT CAST($neymanBudget - sum(seat_base) AS BIGINT) AS r
         | FROM seats),
         |al AS (SELECT s.*, lf.r,
         |  row_number() OVER (ORDER BY rem DESC, source) AS rk
         | FROM seats s, lf),
         |al3 AS (SELECT *,
         |  least(seat_base + CASE WHEN rk <= r THEN 1 ELSE 0 END, n)
         |   AS alloc,
         |  CASE WHEN seat_base + CASE WHEN rk <= r THEN 1 ELSE 0 END > n
         |   THEN 1 ELSE 0 END AS capped
         | FROM al),
         |rkd AS (SELECT source, doc_id,
         |  CAST('0x' || substring(md5('neyman|' ||
         |    CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS mrk
         | FROM base),
         |ch AS (SELECT source, doc_id FROM (
         |  SELECT r2.source, r2.doc_id, a.alloc,
         |   row_number() OVER (PARTITION BY r2.source
         |     ORDER BY r2.mrk, r2.doc_id) AS rn
         |  FROM rkd r2 JOIN al3 a ON r2.source = a.source)
         | WHERE rn <= alloc),
         |sel AS (SELECT source, CAST(count(*) AS BIGINT) AS n_selected,
         |  md5(array_to_string(list_sort(list(doc_id)), ',')) AS sel_fp
         | FROM ch GROUP BY 1)
         |SELECT a.source, n, sigma, w_micro, alloc, capped,
         | COALESCE(n_selected, 0) AS n_selected, sel_fp
         |FROM al3 a LEFT JOIN sel ON a.source = sel.source
         |ORDER BY a.source""".stripMargin,
    "q268_mix_waterfill" ->
      s"""WITH t AS (SELECT doc_id, source, $duckToks AS tk
         |      FROM documents),
         |sg AS (SELECT doc_id, source, CAST(len(tk) AS BIGINT) AS nt,
         |  ${CorpusOpsPack.duckSignalCols}
         | FROM t),
         |src AS (
         | SELECT source, CAST(sum(nt) AS BIGINT) AS tokens,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN ${CorpusOpsPack.duckReasonCase} = 'pass'
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
         | FROM sg GROUP BY 1),
         |q AS (SELECT *,
         |  CAST(n_pass * 1000000 // n_docs AS BIGINT) AS quality_micro
         | FROM src),
         |b AS (SELECT CAST(sum(tokens) * 2 AS BIGINT) AS budget FROM q),
         |cand AS (SELECT source, tokens, quality_micro, e.epoch,
         |  CAST(quality_micro // CAST([1, 2, 4, 8][e.epoch] AS BIGINT)
         |    AS BIGINT) AS mv_micro
         | FROM q, (SELECT unnest([1, 2, 3, 4]) AS epoch) e),
         |rk AS (SELECT *,
         |  CAST(sum(tokens) OVER (ORDER BY mv_micro DESC, source, epoch)
         |    AS BIGINT) AS cum_tokens
         | FROM cand)
         |SELECT source, epoch, tokens, quality_micro, mv_micro,
         | cum_tokens, budget
         |FROM rk, b WHERE cum_tokens <= budget
         |ORDER BY mv_micro DESC, source, epoch""".stripMargin,
    "q227_repetition_audit" ->
      s"""WITH per_doc AS (
        | SELECT source,
        |  CAST(len(bi) AS BIGINT) AS n_bi,
        |  CAST(len(list_distinct(bi)) AS BIGINT) AS n_dist,
        |  CAST(coalesce(list_max(list_transform(list_distinct(bi),
        |    w -> len(list_filter(bi, t -> t = w)))), 0) AS BIGINT)
        |    AS top_cnt
        | FROM (SELECT source, $duckBigrams AS bi
        |       FROM (SELECT source, $duckToks AS tk FROM documents))),
        |flagged AS (
        | SELECT *, CASE WHEN n_bi > 0 AND (top_cnt * 5 > n_bi
        |   OR (n_bi - n_dist) * 2 > n_bi) THEN 1 ELSE 0 END AS flag
        | FROM per_doc)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_bi) AS BIGINT) AS sum_bigrams,
        | CAST(sum(n_dist) AS BIGINT) AS sum_distinct,
        | CAST(sum(top_cnt) AS BIGINT) AS sum_top,
        | CAST(sum(flag) AS BIGINT) AS n_repetitive,
        | CAST(sum(n_bi) - sum(n_dist) AS DOUBLE) / sum(n_bi) AS dup_mass,
        | CAST(sum(top_cnt) AS DOUBLE) / sum(n_bi) AS mean_top_mass
        |FROM flagged GROUP BY source ORDER BY source""".stripMargin,
    "q228_heldout_lm_eval" -> {
      val b = duckBucket("doc_id", "split", 100)
      s"""WITH docs AS (
        | SELECT doc_id, text,
        |  CASE WHEN $b < 80 THEN 'train' WHEN $b < 90 THEN 'val'
        |   ELSE 'test' END AS split
        | FROM documents),
        |exploded AS (
        | SELECT split, doc_id, unnest(bi) AS bg FROM
        |  (SELECT split, doc_id, $duckBigrams AS bi FROM
        |   (SELECT split, doc_id, $duckToks AS tk FROM docs))),
        |c_big AS (
        | SELECT bg, count(*) AS c_uw FROM exploded
        | WHERE split = 'train' GROUP BY bg),
        |c_uni AS (
        | SELECT string_split(bg, ' ')[1] AS u, count(*) AS c_u
        | FROM exploded WHERE split = 'train' GROUP BY 1),
        |vocab AS (
        | SELECT count(DISTINCT tok) AS vsz FROM
        |  (SELECT unnest($duckToks) AS tok FROM docs WHERE split = 'train')),
        |n_docs AS (
        | SELECT split, count(*) AS n_docs FROM docs
        | WHERE split <> 'train' GROUP BY split),
        |scored AS (
        | SELECT e.split, count(*) AS n_bigrams,
        |  CAST(sum(CASE WHEN b.c_uw IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  CAST(sum(CAST(floor(
        |    (CAST(coalesce(b.c_uw, 0) + 1 AS DOUBLE) /
        |     CAST(coalesce(u.c_u, 0) + v.vsz AS DOUBLE)) * 1000000.0 + 0.5)
        |    AS BIGINT)) AS BIGINT) AS units_sum
        | FROM exploded e
        | LEFT JOIN c_big b ON e.bg = b.bg
        | LEFT JOIN c_uni u ON string_split(e.bg, ' ')[1] = u.u
        | CROSS JOIN vocab v
        | WHERE e.split <> 'train'
        | GROUP BY e.split)
        |SELECT d.split, CAST(d.n_docs AS BIGINT) AS n_docs,
        | CAST(s.n_bigrams AS BIGINT) AS n_bigrams, s.n_oov,
        | CAST(s.n_oov AS DOUBLE) / s.n_bigrams AS oov_rate,
        | CAST(s.units_sum AS DOUBLE) / s.n_bigrams AS mean_units
        |FROM n_docs d JOIN scored s ON d.split = s.split
        |ORDER BY d.split""".stripMargin
    },
    "q229_priority_sample" -> {
      val h = "CAST('0x' || substring(md5('prio|' || " +
        "CAST(o_orderkey AS VARCHAR)), 1, 8) AS BIGINT)"
      s"""WITH keyed AS (
        | SELECT o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |  (CAST(round(o_totalprice * 100) AS BIGINT) * 4294967296)
        |    // ($h + 1) AS key
        | FROM orders),
        |ranked AS (
        | SELECT *, row_number() OVER (ORDER BY key DESC, o_orderkey) AS rn
        | FROM keyed),
        |tau AS (SELECT key AS tau FROM ranked WHERE rn = 101),
        |est AS (
        | SELECT CAST(count(*) AS BIGINT) AS k, any_value(tau) AS tau,
        |  CAST(sum(greatest(cents, tau)) AS BIGINT) AS est_cents
        | FROM ranked, tau WHERE rn <= 100),
        |tot AS (
        | SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |   AS BIGINT) AS true_cents FROM orders)
        |SELECT k, tau, est_cents / 100.0 AS est_total,
        | true_cents / 100.0 AS true_total,
        | CAST(est_cents AS DOUBLE) / true_cents AS ratio
        |FROM est, tot""".stripMargin
    },
    "q230_adaptive_gate" ->
      s"""WITH per_doc AS (
        | SELECT source, doc_id, CAST(len(tk) AS BIGINT) AS n,
        |  CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS dr
        | FROM (SELECT source, doc_id, $duckToks AS tk FROM documents)),
        |ranked AS (
        | SELECT source, dr,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY dr, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY source) AS cnt
        | FROM per_doc WHERE n > 0),
        |med AS (
        | SELECT source, sum(dr) * 2 / count(*) AS med2
        | FROM ranked
        | WHERE rn = CAST(floor((cnt + 1) / 2.0) AS BIGINT)
        |    OR rn = CAST(ceil((cnt + 1) / 2.0) AS BIGINT)
        | GROUP BY source),
        |gated AS (
        | SELECT p.source, p.n, m.med2,
        |  CASE WHEN p.n > 0 AND p.dr * 2 >= m.med2 THEN 1 ELSE 0 END
        |    AS keep
        | FROM per_doc p JOIN med m ON p.source = m.source)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(keep) AS BIGINT) AS n_kept,
        | any_value(med2) / 2 AS median_dr,
        | CAST(sum(n * keep) AS DOUBLE) / sum(n) AS kept_token_share
        |FROM gated GROUP BY source ORDER BY source""".stripMargin,
    "q231_selection_pipeline" -> {
      val tokB = duckBucket("tok", "dsir", 1024)
      val shardB = duckBucket("doc_id", "pack", 8)
      s"""WITH base AS (
        | SELECT doc_id, source, lang, $duckToks AS tk FROM documents),
        |sig0 AS (
        | SELECT doc_id, source, tk, $duckBigrams AS bi FROM base),
        |sig AS (
        | SELECT doc_id, source, CAST(len(tk) AS BIGINT) AS n,
        |  CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS dr,
        |  CAST(len(bi) AS BIGINT) AS n_bi,
        |  CAST(len(list_distinct(bi)) AS BIGINT) AS n_dist,
        |  CAST(coalesce(list_max(list_transform(list_distinct(bi),
        |    w -> len(list_filter(bi, t -> t = w)))), 0) AS BIGINT)
        |    AS top_cnt
        | FROM sig0),
        |med AS (
        | SELECT source, sum(dr) * 2 / count(*) AS med2
        | FROM (
        |  SELECT source, dr,
        |   row_number() OVER (PARTITION BY source
        |     ORDER BY dr, doc_id) AS rn,
        |   count(*) OVER (PARTITION BY source) AS cnt
        |  FROM sig WHERE n > 0)
        | WHERE rn = CAST(floor((cnt + 1) / 2.0) AS BIGINT)
        |    OR rn = CAST(ceil((cnt + 1) / 2.0) AS BIGINT)
        | GROUP BY source),
        |toks AS (
        | SELECT doc_id, lang, $tokB AS b FROM
        |  (SELECT doc_id, lang, unnest(tk) AS tok FROM base)),
        |wts AS (
        | SELECT b, ((sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1)
        |   * 1000) // (count(*) + 1) AS w
        | FROM toks GROUP BY b),
        |scores AS (
        | SELECT doc_id, CAST(sum(w) AS BIGINT) AS score
        | FROM toks JOIN wts USING (b) GROUP BY doc_id),
        |tot AS (
        | SELECT (SELECT CAST(sum(score) AS BIGINT) FROM scores)
        |   AS tot_score,
        |  (SELECT CAST(sum(n) AS BIGINT) FROM sig) AS tot_toks),
        |flagged AS (
        | SELECT s.*,
        |  CASE WHEN NOT (s.n_bi > 0 AND (s.top_cnt * 5 > s.n_bi
        |    OR (s.n_bi - s.n_dist) * 2 > s.n_bi)) THEN 1 ELSE 0 END AS k1,
        |  CASE WHEN NOT (s.n_bi > 0 AND (s.top_cnt * 5 > s.n_bi
        |     OR (s.n_bi - s.n_dist) * 2 > s.n_bi))
        |    AND s.n > 0 AND s.dr * 2 >= m.med2 THEN 1 ELSE 0 END AS k2,
        |  CASE WHEN NOT (s.n_bi > 0 AND (s.top_cnt * 5 > s.n_bi
        |     OR (s.n_bi - s.n_dist) * 2 > s.n_bi))
        |    AND s.n > 0 AND s.dr * 2 >= m.med2
        |    AND CAST(coalesce(sc.score, 0) AS DOUBLE) / s.n >=
        |        CAST(t.tot_score AS DOUBLE) / t.tot_toks
        |   THEN 1 ELSE 0 END AS k3
        | FROM sig s
        | LEFT JOIN med m USING (source)
        | LEFT JOIN scores sc USING (doc_id)
        | CROSS JOIN tot t),
        |packed AS (
        | SELECT list_reduce(
        |   list_transform(list_sort(list({'doc_id': doc_id, 'n': pn})),
        |    e -> [CAST(1 AS BIGINT), e.n]),
        |   (acc, x) -> CASE WHEN acc[2] + x[2] <= 256
        |    THEN [acc[1], acc[2] + x[2]]
        |    ELSE [acc[1] + 1, x[2]] END)[1] AS bins
        | FROM (SELECT source, $shardB AS shard, doc_id,
        |        least(n, 256) AS pn FROM flagged WHERE k3 = 1)
        | GROUP BY source, shard),
        |binsum AS (
        | SELECT coalesce(CAST(sum(bins) AS BIGINT), 0) AS n_bins
        | FROM packed)
        |SELECT CAST(count(*) AS BIGINT) AS n_raw,
        | CAST(sum(n) AS BIGINT) AS tok_raw,
        | CAST(sum(k1) AS BIGINT) AS n_clean,
        | CAST(sum(k1 * n) AS BIGINT) AS tok_clean,
        | CAST(sum(k2) AS BIGINT) AS n_gate,
        | CAST(sum(k2 * n) AS BIGINT) AS tok_gate,
        | CAST(sum(k3) AS BIGINT) AS n_selected,
        | CAST(sum(k3 * n) AS BIGINT) AS tok_selected,
        | CAST(sum(k3 * least(n, 256)) AS BIGINT) AS packed_tokens,
        | n_bins
        |FROM flagged, binsum GROUP BY n_bins""".stripMargin
    },
    "q232_cross_channel" ->
      """WITH store AS (
        | SELECT CAST(date_part('isodow', CAST(o_orderdate AS DATE)) AS INT)
        |   AS isodow,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS store_cents
        | FROM orders GROUP BY 1),
        |web AS (
        | SELECT CAST(date_part('isodow', CAST(ts AS DATE)) AS INT)
        |   AS isodow,
        |  sum(CAST(round(value * 100) AS BIGINT)) AS web_cents
        | FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT s.isodow, CAST(s.store_cents AS BIGINT) AS store_cents,
        | CAST(w.web_cents AS BIGINT) AS web_cents,
        | CAST(w.web_cents AS DOUBLE) / s.store_cents AS web_store_ratio
        |FROM store s JOIN web w ON s.isodow = w.isodow
        |ORDER BY s.isodow""".stripMargin,
    "q233_funnel_timing" ->
      """WITH ev AS (
        | SELECT user_id, epoch_us(ts) AS us,
        |  CASE event_type WHEN 'view' THEN CAST(1 AS BIGINT)
        |   WHEN 'click' THEN 2 ELSE 3 END AS c
        | FROM events
        | WHERE event_type IN ('view', 'click', 'purchase')),
        |init AS (
        | SELECT user_id, [us, c,
        |  CASE WHEN c = 1 THEN us ELSE 9223372036854775807 END,
        |  9223372036854775807, 9223372036854775807] AS e
        | FROM ev),
        |folded AS (
        | SELECT user_id,
        |  list_reduce(list_sort(list(e)), (acc, x) -> [
        |   x[1], x[2],
        |   CASE WHEN x[2] = 1 THEN least(acc[3], x[1]) ELSE acc[3] END,
        |   CASE WHEN x[2] = 2 AND acc[3] < x[1]
        |         AND x[1] - acc[3] <= 604800000000
        |        THEN least(acc[4], x[1]) ELSE acc[4] END,
        |   CASE WHEN x[2] = 3 AND acc[4] < x[1]
        |         AND x[1] - acc[3] <= 604800000000
        |        THEN least(acc[5], x[1]) ELSE acc[5] END]) AS f
        | FROM init GROUP BY user_id),
        |gaps AS (
        | SELECT user_id, 'view_to_click' AS step, f[4] - f[3] AS gap
        | FROM folded WHERE f[4] < 9223372036854775807
        | UNION ALL
        | SELECT user_id, 'click_to_purchase' AS step, f[5] - f[4] AS gap
        | FROM folded WHERE f[5] < 9223372036854775807),
        |counts AS (
        | SELECT step, CAST(count(*) AS BIGINT) AS n_users
        | FROM gaps GROUP BY step),
        |med AS (
        | SELECT step, CAST(sum(gap) * 2 / count(*) AS BIGINT) AS med2_us
        | FROM (
        |  SELECT step, gap,
        |   row_number() OVER (PARTITION BY step
        |     ORDER BY gap, user_id) AS rn,
        |   count(*) OVER (PARTITION BY step) AS cnt
        |  FROM gaps)
        | WHERE rn = CAST(floor((cnt + 1) / 2.0) AS BIGINT)
        |    OR rn = CAST(ceil((cnt + 1) / 2.0) AS BIGINT)
        | GROUP BY step)
        |SELECT c.step, c.n_users, m.med2_us,
        | m.med2_us / 2.0 / 1000000.0 AS median_gap_sec
        |FROM counts c JOIN med m ON c.step = m.step
        |ORDER BY c.step""".stripMargin)
}
