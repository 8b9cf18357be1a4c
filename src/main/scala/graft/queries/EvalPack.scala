package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.Tables

/** Model-evaluation pack: the audits a training pipeline runs on its own
  * gating models — ROC-AUC via exact rank-sums, a precision/recall
  * threshold sweep, calibration bins, and the lang-ID confusion matrix.
  * "Model" here is the pipeline's own machinery, reused not re-declared:
  * the q174 hashed linear scorer ([[TrainingPipelinePack]]) evaluated
  * against the q158 Gopher rule verdict ([[CorpusOpsPack]]) as reference
  * label, and the q52 lang-ID ([[TextPack]]) against the corpus `lang`
  * column — both sides of every metric share the canonical definitions,
  * so scorer and evaluation cannot drift.
  *
  * Scale doctrine: every metric reduces the corpus to SCORE grain (or
  * bin/label grain) in one partial-agg shuffle before any window runs —
  * distinct classifier scores are bounded by the score range (integer
  * milli-units), not the corpus, so the rank-sum window and threshold
  * sweep operate on a relation that stays small at 100 TB. AUC rank
  * statistics accumulate as exact BIGINTs (2×midrank trick — midranks
  * are half-integers) with ONE final double division, so there is no
  * float-accumulation parity surface at all.
  */
object EvalPack extends QueryPack {

  /** Per-document (score, label): q174's classifier score in exact
    * integer milli-units against the q158 rule-cascade verdict as the
    * reference label. Map-side only — per-row hashing and in-row folds,
    * no shuffle (the grain reduction that follows is each query's first
    * exchange).
    */
  private[graft] def scoredLabeled(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      TrainingPipelinePack.classifierScore(col("text")).as("score"),
      when(CorpusOpsPack.reasonOf(TextOps.toks(col("text"))) === "pass", 1L)
        .otherwise(0L).as("label"))

  /** (score, cnt, pos) — the score-grain contingency every metric here
    * derives from. */
  private def scoreGrain(s: SparkSession, dir: String): DataFrame =
    scoredLabeled(Tables.loadParallel(s, dir, "documents"))
      .groupBy("score")
      .agg(count(lit(1)).as("cnt"), sum("label").as("pos"))

  // Shared oracle CTE chain: documents → tokens → (score, label) →
  // score grain. Generated from the same canonical SQL fragments as the
  // q174/q158 oracles.
  private def duckGrainCtes: String =
    s"""t AS (SELECT doc_id, ${CorpusOpsPack.duckToks} AS tk
       |      FROM documents),
       |sg AS (
       | SELECT doc_id, ${TrainingPipelinePack.duckClfScore} AS score,
       |  ${CorpusOpsPack.duckSignalCols}
       | FROM t),
       |lb AS (
       | SELECT score,
       |  CASE WHEN ${CorpusOpsPack.duckReasonCase} = 'pass'
       |       THEN 1 ELSE 0 END AS label
       | FROM sg),
       |g AS (SELECT score, count(*) AS cnt, sum(label) AS pos
       |      FROM lb GROUP BY 1)""".stripMargin

  // --- q200: ROC-AUC via exact rank-sum ------------------------------------

  /** q200 — classifier ROC-AUC by the Mann-Whitney rank-sum identity,
    * ties handled with midranks, computed EXACTLY: per distinct score the
    * (cnt, pos) contingency plus the running count of lower-scored docs
    * gives 2·Σ(positive midranks) = Σ pos·(2·cum_below + cnt + 1) as a
    * pure BIGINT sum; AUC = (2Σmid − npos(npos+1)) / (2·npos·nneg) is
    * the single double division at the very end. The ordering window
    * runs over score grain (bounded by the milli-score range, not corpus
    * size) — the whole-corpus sort a naive ranked-AUC would do never
    * happens. Rank sums grow as n²: past ~3×10⁹ docs the BIGINT
    * accumulator must widen to decimal(38) — until then ANSI mode makes
    * an overflow fail loudly rather than wrap.
    */
  /** The rank-sum AUC over a (score, cnt, pos) grain — factored so the
    * spec can drive it with a hand-computed tie fixture. */
  private[graft] def aucFromGrain(grain: DataFrame): DataFrame = {
    val cum = coalesce(sum(col("cnt")).over(
      Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val agg = grain
      .select(col("cnt"), col("pos"), cum.as("cum"))
      .agg(sum(col("pos") * (lit(2L) * col("cum") + col("cnt") + 1))
        .as("s2"),
        sum("pos").as("n_pos"), sum("cnt").as("n"),
        count(lit(1)).as("n_scores"))
    def auc = (col("s2") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
      (lit(2L) * col("n_pos") * (col("n") - col("n_pos")))
    agg.select(col("n_pos"), (col("n") - col("n_pos")).as("n_neg"),
      col("n_scores"), auc.as("auc"),
      (lit(2.0) * auc - lit(1.0)).as("gini"))
  }

  private def q200(s: SparkSession, dir: String): DataFrame =
    aucFromGrain(scoreGrain(s, dir))

  // --- q201: precision/recall threshold sweep ------------------------------

  private val thresholds = Seq(-2000L, -1000L, -500L, 0L, 500L, 1000L, 2000L)

  /** q201 — confusion counts and precision/recall/F1 at a fixed milli-
    * score threshold ladder (predict positive at score > t). The sweep
    * replays the SCORE-GRAIN aggregate against each threshold — a
    * |scores| × |thresholds| expansion of an already-reduced relation,
    * never a re-scan of the corpus per threshold. Counts stay exact
    * BIGINTs; each ratio is one double division (precision/F1 guarded
    * NULL where the denominator is empty).
    */
  private def q201(s: SparkSession, dir: String): DataFrame = {
    val tp = coalesce(sum(when(col("score") > col("t"), col("pos"))),
      lit(0L))
    val fp = coalesce(
      sum(when(col("score") > col("t"), col("cnt") - col("pos"))), lit(0L))
    val grain = scoreGrain(s, dir)
      .select(col("score"), col("cnt"), col("pos"),
        explode(array(thresholds.map(lit): _*)).as("t"))
      .groupBy("t")
      .agg(tp.as("tp"), fp.as("fp"),
        sum("pos").as("npos"), sum("cnt").as("n"))
    grain.select(col("t"), col("tp"), col("fp"),
      (col("npos") - col("tp")).as("fn"),
      (col("n") - col("npos") - col("fp")).as("tn"),
      when(col("tp") + col("fp") > 0,
        col("tp").cast("double") / (col("tp") + col("fp")))
        .as("precision"),
      (col("tp").cast("double") / col("npos")).as("recall"),
      when(lit(2L) * col("tp") + col("fp") + col("npos") - col("tp") > 0,
        (lit(2L) * col("tp")).cast("double") /
          (lit(2L) * col("tp") + col("fp") + col("npos") - col("tp")))
        .as("f1"))
      .orderBy("t")
  }

  // --- q202: calibration bins ----------------------------------------------

  /** q202 — reliability diagram input: docs bucketed by 500-milli score
    * bins, per bin the observed positive rate vs the bin's mean score.
    * A well-calibrated gate shows pos_rate rising monotonically through
    * the bins. Bin means stay exact (Σ score·cnt as BIGINT) until one
    * double division; floor(score/500.0) is engine-identical (double
    * quotients of small integers never round across a floor boundary).
    */
  private def q202(s: SparkSession, dir: String): DataFrame =
    scoreGrain(s, dir)
      .groupBy(floor(col("score") / lit(500.0)).cast("int").as("bin"))
      .agg(sum("cnt").as("n_docs"), sum("pos").as("n_pos"),
        sum(col("score") * col("cnt")).as("score_sum"))
      .select(col("bin"), col("n_docs"), col("n_pos"),
        (col("score_sum").cast("double") / col("n_docs") / 1000.0)
          .as("mean_score"),
        (col("n_pos").cast("double") / col("n_docs")).as("pos_rate"))
      .orderBy("bin")

  // --- q203: lang-ID confusion matrix --------------------------------------

  /** q203 — confusion matrix of the q52 lang-ID heuristic against the
    * corpus `lang` labels: per (actual, predicted) cell the doc count
    * and its share of the actual-language row total. One shuffle to the
    * (lang, pred) grain (≤ |langs|² rows at any scale), the row-share
    * window over that tiny grain. The synthetic corpus is English word
    * soup under every label, so the matrix concentrates in the 'en'
    * column — the AUDIT structure (cells, row shares) is what's under
    * test, mirroring q52's own caveat.
    */
  private def q203(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("lang"), TextPack.langPred(col("text")).as("pred_lang"))
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("row_share", col("n_docs").cast("double") /
        sum("n_docs").over(Window.partitionBy("lang")))
      .orderBy("lang", "pred_lang")

  // --- q204: cumulative-gains deciles --------------------------------------

  /** q204 — cumulative-gains table: targeting the top-scored k/10 of the
    * corpus, what share of all rule-positives is captured, and the lift
    * over random targeting. Decile boundaries resolve on the score-DESC
    * cumulative counts: a grain row is decile k's checkpoint iff k·n
    * lands inside its cumulative span (10·cum_before < k·n ≤ 10·cum) —
    * a grain×10 cross join + filter, never a per-doc ntile over the
    * corpus. All counts exact; capture and lift are the final double
    * divisions.
    */
  private def q204(s: SparkSession, dir: String): DataFrame = {
    val cumB = coalesce(sum(col("cnt")).over(
      Window.orderBy(col("score").desc)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val cumP = sum(col("pos")).over(
      Window.orderBy(col("score").desc)
        .rowsBetween(Window.unboundedPreceding, 0))
    val grain = scoreGrain(s, dir)
      .select(col("score"), col("cnt"), col("pos"),
        cumB.as("cum_before"), (cumB + col("cnt")).as("cum_docs"),
        cumP.as("cum_pos"))
      // grain cache feeding the checkpoint rows AND the scalar totals
      .persist()
    val tot = grain.agg(sum("cnt").as("n"), sum("pos").as("npos"))
    grain.crossJoin(broadcast(tot))
      .select(col("*"), explode(sequence(lit(1), lit(10))).as("k"))
      .filter(lit(10L) * col("cum_before") < col("k") * col("n") &&
        col("k") * col("n") <= lit(10L) * col("cum_docs"))
      .select(col("k"), col("cum_docs"), col("cum_pos"),
        (col("cum_pos").cast("double") / col("npos")).as("capture"),
        ((col("cum_pos").cast("double") / col("cum_docs")) /
          (col("npos").cast("double") / col("n"))).as("lift"))
      .orderBy("k")
  }

  // --- q205: Spearman rank correlation -------------------------------------

  /** q205 — Spearman rank correlation between the classifier score and
    * document length (n_chars): does the quality gate just measure
    * length? Midranks arrive exactly as 2·midrank = 2·cum_below + cnt +
    * 1 per value-grain (the q200 trick; Pearson is invariant under the
    * ×2 scaling), per-doc rank pairs come from joining the two tiny
    * grain tables back, and the five rank-sum moments accumulate as
    * exact BIGINTs. Only the final combination n·Σxy − Σx·Σy exceeds
    * int64 (~4·10²⁰ at sf0.1), so it runs in decimal(38,0)/HUGEINT —
    * still exact — with the division-and-sqrt on doubles as the very
    * last step, identical in both engines.
    */
  private def q205(s: SparkSession, dir: String): DataFrame = {
    def rank2(df: DataFrame, v: String): DataFrame = {
      val cumB = coalesce(sum(col("cnt")).over(
        Window.orderBy(v).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L))
      df.groupBy(v).agg(count(lit(1)).as("cnt"))
        .select(col(v), (lit(2L) * cumB + col("cnt") + 1).as(s"r_$v"))
    }
    // one corpus scan: score and n_chars come off the same projection;
    // the (score, n_chars) pair grain feeds the doc side AND both rank
    // tables, so the heavy tokenize+hash work runs once
    val docs = Tables.loadParallel(s, dir, "documents")
      .select(col("n_chars"),
        TrainingPipelinePack.classifierScore(col("text")).as("score"))
      .persist()
    val ranked = docs
      .join(broadcast(rank2(docs, "score")), Seq("score"))
      .join(broadcast(rank2(docs, "n_chars")), Seq("n_chars"))
    val agg = ranked.agg(count(lit(1)).as("n"),
      sum(col("r_score")).as("sx"), sum(col("r_n_chars")).as("sy"),
      sum(col("r_score") * col("r_score")).as("sxx"),
      sum(col("r_n_chars") * col("r_n_chars")).as("syy"),
      sum(col("r_score") * col("r_n_chars")).as("sxy"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val num = dec(col("n")) * dec(col("sxy")) - dec(col("sx")) * dec(col("sy"))
    val dx = dec(col("n")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sx"))
    val dy = dec(col("n")) * dec(col("syy")) - dec(col("sy")) * dec(col("sy"))
    agg.select(col("n"),
      (num.cast("double") / sqrt(dx.cast("double") * dy.cast("double")))
        .as("spearman_rho"))
  }

  // --- q206: chi-square independence audit ---------------------------------

  /** q206 — chi-square independence of source × rule-verdict: are some
    * sources systematically dirtier? Output is the |sources|×2 cell
    * grid with observed/expected counts and each cell's χ² contribution
    * (row-level doubles from exact integers — identical sequence both
    * engines), plus the rounded total (a multi-cell double sum whose
    * accumulation order differs across engines; round-6 absorbs the
    * ulp, the q166 doctrine).
    */
  /** (source, label) off one corpus scan — q206/q207 don't need the
    * classifier score, only the rule verdict. */
  private def sourceLabeled(s: SparkSession, dir: String): DataFrame =
    Tables.loadParallel(s, dir, "documents")
      .select(col("source"),
        when(CorpusOpsPack.reasonOf(TextOps.toks(col("text"))) === "pass",
          1L).otherwise(0L).as("label"))

  private def q206(s: SparkSession, dir: String): DataFrame = {
    val cells = sourceLabeled(s, dir)
      .groupBy("source", "label")
      .agg(count(lit(1)).as("o"))
      // cell-grain cache: the contingency feeds the window pass AND the
      // scalar total — one corpus scan instead of two
      .persist()
    val exp = col("row_tot").cast("double") * col("col_tot") / col("n")
    cells
      .withColumn("row_tot", sum("o").over(Window.partitionBy("source")))
      .withColumn("col_tot", sum("o").over(Window.partitionBy("label")))
      .crossJoin(broadcast(cells.agg(sum("o").as("n"))))
      .select(col("source"), col("label"), col("o"), exp.as("e"),
        ((col("o") - exp) * (col("o") - exp) / exp).as("chi2_cell"))
      .withColumn("chi2_total",
        round(sum("chi2_cell").over(Window.partitionBy()), 6))
      .orderBy("source", "label")
  }

  // --- q207: smoothed target encoding --------------------------------------

  private val smoothing = 20L

  /** q207 — target encoding of `source` against the rule-pass label with
    * additive smoothing: enc = (pos + m·p) / (n + m) shrinks small
    * sources toward the global prior p (m = 20 virtual docs). The
    * feature-engineering twin of q206's audit — one shuffle to source
    * grain, the prior a broadcast scalar, every ratio a final double
    * division over exact counts.
    */
  private def q207(s: SparkSession, dir: String): DataFrame = {
    val perSource = sourceLabeled(s, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("label").as("n_pos"))
      // source-grain cache feeding the per-source rows AND the prior
      .persist()
    val prior = perSource.agg(sum("n_docs").as("n"), sum("n_pos").as("pos"))
    perSource.crossJoin(broadcast(prior))
      .select(col("source"), col("n_docs"), col("n_pos"),
        (col("n_pos").cast("double") / col("n_docs")).as("raw_rate"),
        ((col("n_pos") + lit(smoothing) *
          (col("pos").cast("double") / col("n"))) /
          (col("n_docs") + lit(smoothing)).cast("double"))
          .as("smoothed_enc"))
      .orderBy("source")
  }

  // --- q262: isotonic (PAVA) calibration -----------------------------------

  /** q262 — isotonic calibration of the classifier score (the monotone
    * regression PAVA computes), over q202's 500-milli score bins, via the
    * EXACT MINIMAX IDENTITY: the isotonic fit at bin i equals
    * max_{j≤i} min_{k≥i} weightedMean(pos_rate over bins j..k). No
    * sequential pool-adjacent-violators stack — the identity turns PAVA
    * into a dense grid over an already-tiny relation, the shape that
    * distributes. Weighted means are micro-quantized by integer division;
    * floor is monotone, so max/min commute with it and the output is
    * EXACTLY floor(10⁶ · exact PAVA fit) (MiningSpec-style stack
    * recompute asserts this against the classic algorithm). Scale shape:
    * ONE corpus-grain shuffle to score grain (shared with q200–q202);
    * everything after — prefix sums, the j≤k pair grid, the
    * bins×pairs bracket join — lives at BIN grain (≈ a dozen rows, B³
    * pairs at worst), so the unpartitioned prefix window and the
    * broadcast cross joins are model-sized at any corpus size.
    * Calibration-curve monotonicity is guaranteed by construction.
    */
  private def q262(s: SparkSession, dir: String): DataFrame = {
    val bins = scoreGrain(s, dir)
      .groupBy(floor(col("score") / lit(500.0)).cast("int").as("bin"))
      .agg(sum("cnt").as("n_docs"), sum("pos").as("n_pos"))
    val w = Window.orderBy("bin")
    val pre = bins.select(col("bin"), col("n_docs"), col("n_pos"),
      sum("n_docs").over(w).as("pw"), sum("n_pos").over(w).as("pp"))
    val pj = pre.select(col("bin").as("jb"),
      (col("pw") - col("n_docs")).as("pw0"),
      (col("pp") - col("n_pos")).as("pp0"))
    val pk = pre.select(col("bin").as("kb"), col("pw").as("pwk"),
      col("pp").as("ppk"))
    val pairs = pj.crossJoin(broadcast(pk)).filter(col("jb") <= col("kb"))
      .select(col("jb"), col("kb"),
        call_function("div", (col("ppk") - col("pp0")) * lit(1000000L),
          col("pwk") - col("pw0")).as("avg_micro"))
    val fit = bins.select(col("bin")).crossJoin(broadcast(pairs))
      .filter(col("jb") <= col("bin") && col("kb") >= col("bin"))
      .groupBy(col("bin"), col("jb")).agg(min("avg_micro").as("mn"))
      .groupBy("bin").agg(max("mn").as("iso_micro"))
    bins.join(fit, "bin")
      .select(col("bin"), col("n_docs"), col("n_pos"),
        (col("n_pos").cast("double") / col("n_docs")).as("raw_rate"),
        col("iso_micro"))
      .orderBy("bin")
  }

  // --- q263: out-of-fold target encoding -----------------------------------

  private val oofFolds = 5

  /** q263 — LEAKAGE-FREE (out-of-fold) target encoding: q207's smoothed
    * encoder, but each doc's encoding is computed from the OTHER k−1
    * folds only (fold = salted-md5 bucket of doc_id, the q111 split
    * machinery), so the feature never sees its own row's label — the CV
    * discipline that separates a usable encoder from a leaky one. The
    * algebra needs no per-fold re-aggregation: one shuffle to the
    * (source, fold) grain, then out-of-fold counts are COMPLEMENTS
    * (source totals minus the fold's cell; the smoothing prior likewise
    * excludes the fold via the per-fold global complement). Every join
    * after the grain reduce is broadcast at |sources|×k grain; counts
    * stay exact BIGINTs with one final double division per cell.
    */
  private def q263(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.loadParallel(s, dir, "documents")
      .select(col("source"),
        TrainingPipelinePack.bucket(col("doc_id"), "oof", oofFolds)
          .as("fold"),
        when(CorpusOpsPack.reasonOf(TextOps.toks(col("text"))) === "pass",
          1L).otherwise(0L).as("label"))
      .groupBy("source", "fold")
      .agg(count(lit(1)).as("n_sf"), sum("label").as("pos_sf"))
      .persist()
    val bySource = g.groupBy("source")
      .agg(sum("n_sf").as("n_s"), sum("pos_sf").as("pos_s"))
    val byFold = g.groupBy("fold")
      .agg(sum("n_sf").as("n_f"), sum("pos_sf").as("pos_f"))
    val tot = g.agg(sum("n_sf").as("n"), sum("pos_sf").as("pos"))
    g.join(broadcast(bySource), "source")
      .join(broadcast(byFold), "fold")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("fold"), col("n_sf"), col("pos_sf"),
        ((col("pos_s") - col("pos_sf") + lit(smoothing) *
          ((col("pos") - col("pos_f")).cast("double") /
            (col("n") - col("n_f")))) /
          (col("n_s") - col("n_sf") + lit(smoothing)).cast("double"))
          .as("oof_enc"))
      .orderBy("source", "fold")
  }

  // --- q278: decision stump (best Gini split) ------------------------------

  /** q278 — a DECISION STUMP trained distributed: the single best
    * threshold on the classifier score for predicting the rule-pass
    * label, by exact Gini-impurity minimization. Every distinct score is
    * a split candidate; left/right class counts come from prefix sums
    * over the score grain (the q200 ordering window — bounded by the
    * integer milli-score range, not the corpus), impurities are
    * micro-quantized exact rationals — 10⁶ − (pos² + neg²)·10⁶ div n² —
    * and the weighted impurity (n_l·imp_l + n_r·imp_r) div N picks the
    * argmin with a threshold tiebreak (TakeOrdered, k = 1). Emits the
    * split, both side impurities, the parent impurity and the gain.
    * This is the one-node core of distributed tree building: at 100 TB
    * the candidate relation is still |distinct scores| rows, so deeper
    * trees are this same reduction per node. Count squares stay inside
    * BIGINT to ~3·10⁹ rows per side; the decimal(38) swap is mechanical
    * (q205 doctrine) beyond that.
    */
  private def q278(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val g = scoreGrain(s, dir)
      .withColumn("n_l", sum("cnt").over(w))
      .withColumn("pos_l", sum("pos").over(w))
    val tot = scoreGrain(s, dir)
      .agg(sum("cnt").as("n"), sum("pos").as("p"))
    def gini(pos: Column, n: Column): Column =
      lit(1000000L) - call_function("div",
        (pos * pos + (n - pos) * (n - pos)) * lit(1000000L), n * n)
    g.crossJoin(broadcast(tot))
      .filter(col("n_l") < col("n"))
      .select(col("score").as("threshold"),
        col("n_l"), col("pos_l"), (col("n") - col("n_l")).as("n_r"),
        gini(col("pos_l"), col("n_l")).as("imp_l_micro"),
        gini(col("p") - col("pos_l"), col("n") - col("n_l"))
          .as("imp_r_micro"),
        gini(col("p"), col("n")).as("imp_parent_micro"),
        col("n"))
      .withColumn("wimp_micro", call_function("div",
        col("n_l") * col("imp_l_micro") + col("n_r") * col("imp_r_micro"),
        col("n")))
      .withColumn("gain_micro",
        col("imp_parent_micro") - col("wimp_micro"))
      .select("threshold", "n_l", "pos_l", "n_r", "imp_l_micro",
        "imp_r_micro", "wimp_micro", "imp_parent_micro", "gain_micro")
      .orderBy(col("wimp_micro"), col("threshold"))
      .limit(1)
  }

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] =
    Seq(
      "q262_isotonic_calibration" -> q262 _,
      "q263_oof_target_encoding" -> q263 _,
      "q278_decision_stump" -> q278 _,
      "q200_classifier_auc" -> q200 _,
      "q201_pr_sweep" -> q201 _,
      "q202_calibration_bins" -> q202 _,
      "q203_langid_confusion" -> q203 _,
      "q204_cumulative_gains" -> q204 _,
      "q205_spearman_len" -> q205 _,
      "q206_chi2_source" -> q206 _,
      "q207_target_encoding" -> q207 _)

  override val oracle: Seq[(String, String)] = Seq(
    "q278_decision_stump" ->
      s"""WITH $duckGrainCtes,
         |pre AS (SELECT score,
         |  CAST(sum(cnt) OVER (ORDER BY score) AS BIGINT) AS n_l,
         |  CAST(sum(pos) OVER (ORDER BY score) AS BIGINT) AS pos_l
         | FROM g),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
         |  CAST(sum(pos) AS BIGINT) AS p FROM g),
         |cand AS (
         | SELECT score AS threshold, n_l, pos_l, n - n_l AS n_r,
         |  1000000 - (pos_l * pos_l + (n_l - pos_l) * (n_l - pos_l))
         |    * 1000000 // (n_l * n_l) AS imp_l_micro,
         |  1000000 - ((p - pos_l) * (p - pos_l)
         |    + ((n - n_l) - (p - pos_l)) * ((n - n_l) - (p - pos_l)))
         |    * 1000000 // ((n - n_l) * (n - n_l)) AS imp_r_micro,
         |  1000000 - (p * p + (n - p) * (n - p)) * 1000000 // (n * n)
         |    AS imp_parent_micro,
         |  n
         | FROM pre, tot WHERE n_l < n),
         |sc AS (SELECT threshold, n_l, pos_l, n_r,
         |  CAST(imp_l_micro AS BIGINT) AS imp_l_micro,
         |  CAST(imp_r_micro AS BIGINT) AS imp_r_micro,
         |  CAST((n_l * imp_l_micro + n_r * imp_r_micro) // n AS BIGINT)
         |   AS wimp_micro,
         |  CAST(imp_parent_micro AS BIGINT) AS imp_parent_micro
         | FROM cand)
         |SELECT threshold, n_l, pos_l, n_r, imp_l_micro, imp_r_micro, wimp_micro,
         | imp_parent_micro,
         | imp_parent_micro - wimp_micro AS gain_micro
         |FROM sc ORDER BY wimp_micro, threshold LIMIT 1""".stripMargin,
    "q263_oof_target_encoding" ->
      s"""WITH t AS (SELECT doc_id, source, ${CorpusOpsPack.duckToks} AS tk
         |      FROM documents),
         |sg AS (SELECT doc_id, source, ${CorpusOpsPack.duckSignalCols}
         |      FROM t),
         |lb AS (SELECT source,
         |  ${TrainingPipelinePack.duckBucket("doc_id", "oof", oofFolds)}
         |   AS fold,
         |  CASE WHEN ${CorpusOpsPack.duckReasonCase} = 'pass'
         |       THEN 1 ELSE 0 END AS label
         | FROM sg),
         |g AS (SELECT source, fold, CAST(count(*) AS BIGINT) AS n_sf,
         |  CAST(sum(label) AS BIGINT) AS pos_sf FROM lb GROUP BY 1, 2),
         |bs AS (SELECT source, CAST(sum(n_sf) AS BIGINT) AS n_s,
         |  CAST(sum(pos_sf) AS BIGINT) AS pos_s FROM g GROUP BY 1),
         |bf AS (SELECT fold, CAST(sum(n_sf) AS BIGINT) AS n_f,
         |  CAST(sum(pos_sf) AS BIGINT) AS pos_f FROM g GROUP BY 1),
         |tt AS (SELECT CAST(sum(n_sf) AS BIGINT) AS n,
         |  CAST(sum(pos_sf) AS BIGINT) AS pos FROM g)
         |SELECT g.source, g.fold, g.n_sf, g.pos_sf,
         | (pos_s - pos_sf + $smoothing *
         |   (CAST(pos - pos_f AS DOUBLE) / (n - n_f)))
         |  / CAST(n_s - n_sf + $smoothing AS DOUBLE) AS oof_enc
         |FROM g JOIN bs USING (source) JOIN bf USING (fold) CROSS JOIN tt
         |ORDER BY g.source, g.fold""".stripMargin,
    "q262_isotonic_calibration" ->
      s"""WITH $duckGrainCtes,
         |b AS (SELECT CAST(floor(score / 500.0) AS INT) AS bin,
         |  CAST(sum(cnt) AS BIGINT) AS n_docs,
         |  CAST(sum(pos) AS BIGINT) AS n_pos
         | FROM g GROUP BY 1),
         |pre AS (SELECT bin, n_docs, n_pos,
         |  CAST(sum(n_docs) OVER (ORDER BY bin) AS BIGINT) AS pw,
         |  CAST(sum(n_pos) OVER (ORDER BY bin) AS BIGINT) AS pp FROM b),
         |pj AS (SELECT bin AS jb, pw - n_docs AS pw0, pp - n_pos AS pp0
         | FROM pre),
         |pk AS (SELECT bin AS kb, pw AS pwk, pp AS ppk FROM pre),
         |pairs AS (SELECT jb, kb,
         |  CAST((ppk - pp0) * 1000000 // (pwk - pw0) AS BIGINT) AS avg_micro
         | FROM pj, pk WHERE jb <= kb),
         |fitj AS (SELECT b.bin, p.jb, min(p.avg_micro) AS mn
         | FROM b, pairs p WHERE p.jb <= b.bin AND p.kb >= b.bin
         | GROUP BY 1, 2),
         |fit AS (SELECT bin, CAST(max(mn) AS BIGINT) AS iso_micro
         | FROM fitj GROUP BY 1)
         |SELECT b.bin, b.n_docs, b.n_pos,
         | CAST(b.n_pos AS DOUBLE) / b.n_docs AS raw_rate, f.iso_micro
         |FROM b JOIN fit f USING (bin) ORDER BY b.bin""".stripMargin,
    "q200_classifier_auc" ->
      s"""WITH $duckGrainCtes,
         |w AS (
         | SELECT score, cnt, pos,
         |  COALESCE(sum(cnt) OVER (ORDER BY score
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         | FROM g),
         |a AS (
         | SELECT CAST(sum(pos * (2 * cum + cnt + 1)) AS BIGINT) AS s2,
         |  CAST(sum(pos) AS BIGINT) AS n_pos,
         |  CAST(sum(cnt) AS BIGINT) AS n,
         |  CAST(count(*) AS BIGINT) AS n_scores
         | FROM w)
         |SELECT n_pos, n - n_pos AS n_neg, n_scores,
         | CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
         |  / (2 * n_pos * (n - n_pos)) AS auc,
         | 2.0 * (CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
         |  / (2 * n_pos * (n - n_pos))) - 1.0 AS gini
         |FROM a""".stripMargin,
    "q201_pr_sweep" ->
      s"""WITH $duckGrainCtes,
         |th AS (SELECT unnest([${thresholds.mkString(", ")}]) AS t),
         |m AS (
         | SELECT t,
         |  COALESCE(CAST(sum(CASE WHEN score > t THEN pos END) AS BIGINT),
         |    0) AS tp,
         |  COALESCE(CAST(sum(CASE WHEN score > t THEN cnt - pos END)
         |    AS BIGINT), 0) AS fp,
         |  CAST(sum(pos) AS BIGINT) AS npos,
         |  CAST(sum(cnt) AS BIGINT) AS n
         | FROM g, th GROUP BY t)
         |SELECT t, tp, fp, npos - tp AS fn, n - npos - fp AS tn,
         | CASE WHEN tp + fp > 0
         |      THEN CAST(tp AS DOUBLE) / (tp + fp) END AS precision,
         | CAST(tp AS DOUBLE) / npos AS recall,
         | CASE WHEN 2 * tp + fp + npos - tp > 0
         |      THEN CAST(2 * tp AS DOUBLE) / (2 * tp + fp + npos - tp)
         |      END AS f1
         |FROM m ORDER BY t""".stripMargin,
    "q202_calibration_bins" ->
      s"""WITH $duckGrainCtes,
         |b AS (
         | SELECT CAST(floor(score / 500.0) AS INT) AS bin,
         |  CAST(sum(cnt) AS BIGINT) AS n_docs,
         |  CAST(sum(pos) AS BIGINT) AS n_pos,
         |  CAST(sum(score * cnt) AS BIGINT) AS score_sum
         | FROM g GROUP BY 1)
         |SELECT bin, n_docs, n_pos,
         | CAST(score_sum AS DOUBLE) / n_docs / 1000.0 AS mean_score,
         | CAST(n_pos AS DOUBLE) / n_docs AS pos_rate
         |FROM b ORDER BY bin""".stripMargin,
    "q203_langid_confusion" ->
      s"""WITH c AS (
         | SELECT lang, pred_lang, count(*) AS n_docs
         | FROM ${TextPack.duckLangPredSub} p
         | GROUP BY 1, 2)
         |SELECT lang, pred_lang, CAST(n_docs AS BIGINT) AS n_docs,
         | CAST(n_docs AS DOUBLE)
         |  / sum(n_docs) OVER (PARTITION BY lang) AS row_share
         |FROM c ORDER BY lang, pred_lang""".stripMargin,
    "q204_cumulative_gains" ->
      s"""WITH $duckGrainCtes,
         |w AS (
         | SELECT score, cnt, pos,
         |  COALESCE(sum(cnt) OVER (ORDER BY score DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS cum_before,
         |  COALESCE(sum(cnt) OVER (ORDER BY score DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cnt
         |    AS cum_docs,
         |  sum(pos) OVER (ORDER BY score DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos
         | FROM g),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
         |        CAST(sum(pos) AS BIGINT) AS npos FROM g),
         |ks AS (SELECT unnest(generate_series(1, 10)) AS k)
         |SELECT k, CAST(cum_docs AS BIGINT) AS cum_docs,
         | CAST(cum_pos AS BIGINT) AS cum_pos,
         | CAST(cum_pos AS DOUBLE) / npos AS capture,
         | (CAST(cum_pos AS DOUBLE) / cum_docs)
         |  / (CAST(npos AS DOUBLE) / n) AS lift
         |FROM w, tot, ks
         |WHERE 10 * cum_before < k * n AND k * n <= 10 * cum_docs
         |ORDER BY k""".stripMargin,
    "q205_spearman_len" ->
      s"""WITH t AS (SELECT doc_id, n_chars, ${CorpusOpsPack.duckToks} AS tk
         |           FROM documents),
         |sc AS (SELECT n_chars,
         |        ${TrainingPipelinePack.duckClfScore} AS score
         |       FROM t),
         |gx AS (SELECT score, count(*) AS cnt FROM sc GROUP BY 1),
         |rx AS (SELECT score,
         |  2 * COALESCE(sum(cnt) OVER (ORDER BY score
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |  + cnt + 1 AS r_score FROM gx),
         |gy AS (SELECT n_chars, count(*) AS cnt FROM sc GROUP BY 1),
         |ry AS (SELECT n_chars,
         |  2 * COALESCE(sum(cnt) OVER (ORDER BY n_chars
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |  + cnt + 1 AS r_n_chars FROM gy),
         |j AS (SELECT r_score, r_n_chars
         |      FROM sc JOIN rx USING (score) JOIN ry USING (n_chars)),
         |a AS (SELECT count(*) AS n,
         |  sum(r_score) AS sx, sum(r_n_chars) AS sy,
         |  sum(r_score * r_score) AS sxx,
         |  sum(r_n_chars * r_n_chars) AS syy,
         |  sum(r_score * r_n_chars) AS sxy FROM j)
         |SELECT CAST(n AS BIGINT) AS n,
         | CAST(n * sxy - sx * sy AS DOUBLE)
         |  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
         |       * CAST(n * syy - sy * sy AS DOUBLE)) AS spearman_rho
         |FROM a""".stripMargin,
    "q206_chi2_source" -> {
      val e = "CAST(row_tot AS DOUBLE) * col_tot / n"
      s"""WITH t AS (SELECT doc_id, source, ${CorpusOpsPack.duckToks} AS tk
         |           FROM documents),
         |sg AS (SELECT source, ${CorpusOpsPack.duckSignalCols} FROM t),
         |lb AS (SELECT source,
         |  CASE WHEN ${CorpusOpsPack.duckReasonCase} = 'pass'
         |       THEN 1 ELSE 0 END AS label FROM sg),
         |cells AS (SELECT source, label, count(*) AS o
         |          FROM lb GROUP BY 1, 2),
         |w AS (SELECT source, label, o,
         |  sum(o) OVER (PARTITION BY source) AS row_tot,
         |  sum(o) OVER (PARTITION BY label) AS col_tot FROM cells),
         |tot AS (SELECT sum(o) AS n FROM cells),
         |c AS (SELECT source, label, CAST(o AS BIGINT) AS o, $e AS e,
         |  (o - $e) * (o - $e) / ($e) AS chi2_cell
         | FROM w, tot)
         |SELECT source, label, o, e, chi2_cell,
         | round(sum(chi2_cell) OVER (), 6) AS chi2_total
         |FROM c ORDER BY source, label""".stripMargin
    },
    "q207_target_encoding" ->
      s"""WITH t AS (SELECT doc_id, source, ${CorpusOpsPack.duckToks} AS tk
         |           FROM documents),
         |sg AS (SELECT source, ${CorpusOpsPack.duckSignalCols} FROM t),
         |lb AS (SELECT source,
         |  CASE WHEN ${CorpusOpsPack.duckReasonCase} = 'pass'
         |       THEN 1 ELSE 0 END AS label FROM sg),
         |ps AS (SELECT source, count(*) AS n_docs, sum(label) AS n_pos
         |       FROM lb GROUP BY 1),
         |tot AS (SELECT sum(n_docs) AS n, sum(n_pos) AS pos FROM ps)
         |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
         | CAST(n_pos AS BIGINT) AS n_pos,
         | CAST(n_pos AS DOUBLE) / n_docs AS raw_rate,
         | (n_pos + $smoothing * (CAST(pos AS DOUBLE) / n))
         |  / CAST(n_docs + $smoothing AS DOUBLE) AS smoothed_enc
         |FROM ps, tot ORDER BY source""".stripMargin)
}
