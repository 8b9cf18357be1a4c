package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Tables

/** Statistical text/embedding mining depth (round 5): collocation
  * extraction, exact closed-form model fitting, and the SRP-LSH scale path
  * for embedding near-dup — operators a pretraining-corpus curator runs
  * between the hygiene passes (TextPack/DedupPack) and the selection
  * passes (SelectionPack). Beyond the reference surface (its text handling
  * stops at enum validation, reference README.md:75,223); these extend the
  * BASELINE.json LLM-pipeline north star.
  *
  * Scale doctrine (shared with the other packs): corpus-grain work is one
  * scan + one shuffle to a grain that is VOCABULARY- or MODEL-sized
  * (bigram types, Gram matrices, signature buckets), never pair-of-rows
  * sized; everything downstream of that reduction is broadcast-joined back.
  * Exact integer arithmetic (BIGINT / decimal(38,0) vs DuckDB HUGEINT, the
  * q205 doctrine) everywhere an oracle compares; doubles only in final
  * ratios where both engines execute the identical IEEE sequence.
  */
object MiningPack extends QueryPack {

  private def toks(c: Column): Column = TextOps.toks(c)
  private val duckToks = "list_filter(string_split(text, ' '), x -> x <> '')"

  /** Adjacent-token bigrams as (w1, w2) structs (q154's zip_with shape —
    * never `sequence(1, n-1)`, which DESCENDS for n = 0 in Spark).
    */
  private def bigramPairs(t: Column): Column =
    zip_with(
      slice(t, lit(1), greatest(size(t) - 1, lit(0))),
      slice(t, lit(2), greatest(size(t) - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))

  // --- q258: PMI collocation mining ----------------------------------------

  private val pmiMinSupport = 5

  /** q258 — collocation mining by pointwise mutual information over
    * adjacent-token bigrams: top-50 pairs by the exact integer PMI ratio
    * `c12·N·10⁶ div (c1·c2)` (the monotone argument of PMI — log is
    * omitted so the score stays integer-exact and oracle-comparable),
    * with support ≥ 5. Positional marginals (c1 = bigrams whose FIRST
    * token is w, c2 = second) are the standard bigram-PMI sample space —
    * and they are derived FROM the pair-count relation (Σ over the other
    * slot), so the corpus is scanned once: one explode + one groupBy to
    * vocabulary² grain, then every join (marginals, the grand total) is a
    * broadcast at vocab grain. At 100 TB the only corpus-grain stage is
    * the bigram count's map-side partial agg; nothing pair-of-documents
    * sized ever shuffles. Ratio headroom: the numerator c12·N·10⁶ is
    * ≤ N²·10⁶ worst-case — past BIGINT at N ≈ 3·10⁶ bigram instances —
    * so it runs in decimal(38,0) (HUGEINT in the oracle) with the same
    * truncating `div`; the emitted ratio itself is ≤ 10⁶·N/c1·c2 and
    * stays BIGINT at any corpus size (ADVICE r5).
    */
  private def q258(s: SparkSession, dir: String): DataFrame = {
    val pair = Tables.load(s, dir, "documents")
      .select(explode(bigramPairs(toks(col("text")))).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
    val c1 = pair.groupBy("w1").agg(sum("c12").as("c1"))
    val c2 = pair.groupBy("w2").agg(sum("c12").as("c2"))
    val n = pair.agg(sum("c12").as("n_bg"))
    pair.join(broadcast(c1), "w1").join(broadcast(c2), "w2")
      .crossJoin(broadcast(n))
      .filter(col("c12") >= pmiMinSupport)
      .withColumn("pmi_micro",
        expr("cast(c12 as decimal(38,0)) * n_bg * 1000000" +
          " div (cast(c1 as decimal(38,0)) * c2)"))
      .select("w1", "w2", "c12", "c1", "c2", "n_bg", "pmi_micro")
      .orderBy(desc("pmi_micro"), col("w1"), col("w2"))
      .limit(50)
  }

  // --- q259: exact closed-form linear probe --------------------------------

  /** The q259/q265 feature row: y = token count from x1 = n_chars,
    * x2 = distinct-token count. */
  private def probeFeatures(s: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    Tables.load(s, dir, "documents").select(
      col("doc_id"),
      col("n_chars").as("x1"),
      size(array_distinct(t)).cast("long").as("x2"),
      size(t).cast("long").as("y"))
  }

  private def d(c: Column) = c.cast("decimal(38,0)")

  // det3 of [[a b c][p q r][u v w]] as the cofactor expansion; operands
  // are the Gram sums (≤ 10⁹ at sf0.1), every triple product ≤ 10²⁷.
  private def det3(a: Column, b: Column, c: Column,
           p: Column, q: Column, r: Column,
           u: Column, v: Column, w: Column): Column =
    a * (q * w - r * v) - b * (p * w - r * u) + c * (p * v - q * u)

  /** The nine Gram/moment aggregate expressions over (x1, x2, y). */
  private def gramAggs: Seq[Column] = Seq(
    count(lit(1)).cast("decimal(38,0)").as("n"),
    sum(d(col("x1"))).as("s1"), sum(d(col("x2"))).as("s2"),
    sum(d(col("y"))).as("sy"),
    sum(d(col("x1")) * d(col("x1"))).as("s11"),
    sum(d(col("x1")) * d(col("x2"))).as("s12"),
    sum(d(col("x2")) * d(col("x2"))).as("s22"),
    sum(d(col("x1")) * d(col("y"))).as("s1y"),
    sum(d(col("x2")) * d(col("y"))).as("s2y"),
    sum(d(col("y")) * d(col("y"))).as("syy"))

  /** The four Cramer determinant columns over the [[gramAggs]] names. */
  private def detCols: Seq[Column] = Seq(
    det3(col("n"), col("s1"), col("s2"),
      col("s1"), col("s11"), col("s12"),
      col("s2"), col("s12"), col("s22")).as("det"),
    det3(col("sy"), col("s1"), col("s2"),
      col("s1y"), col("s11"), col("s12"),
      col("s2y"), col("s12"), col("s22")).as("det0"),
    det3(col("n"), col("sy"), col("s2"),
      col("s1"), col("s1y"), col("s12"),
      col("s2"), col("s2y"), col("s22")).as("det1"),
    det3(col("n"), col("s1"), col("sy"),
      col("s1"), col("s11"), col("s1y"),
      col("s2"), col("s12"), col("s2y")).as("det2"))

  /** One-scan Gram/moment sums + the four Cramer determinants (q259's
    * algebra) as a single broadcastable row. */
  private def gramDets(base: DataFrame): DataFrame = {
    val g = base.agg(gramAggs.head, gramAggs.tail: _*)
    g.select(col("*") +: detCols: _*)
  }

  /** q259 — a 2-feature linear probe fit by ordinary least squares via
    * the NORMAL EQUATIONS, solved in closed form with Cramer's rule
    * computed ENTIRELY in exact arithmetic ([[gramDets]]): one scan
    * accumulates the nine Gram / moment sums (per-row products cast
    * decimal(38,0) BEFORE multiplying — the q244/q205 doctrine — so
    * accumulation never wraps at any corpus size), the 3×3 determinants
    * expand as sums of triple products of those sums (value-bounded
    * « 10³⁸ here: each sum ≤ 10⁹ at sf0.1, so every triple product
    * ≤ 10²⁷; HUGEINT on the DuckDB side), and doubles appear ONLY in the
    * final coefficient/R² ratios. Those ratios round to 6: determinants
    * exceed 2⁵³, and DuckDB's HUGEINT→DOUBLE vs the JVM's
    * BigDecimal→double conversion can disagree by 1 ulp on such
    * integers (hit at sf0.1), which rounding absorbs. R² comes from the
    * same sums without any per-row residual pass: SSE·det = det·Σy² −
    * Σᵢ detᵢ·(Xᵀy)ᵢ and SST·n = n·Σy² − (Σy)² are exact integer
    * identities. Scale shape: ONE corpus scan reduced map-side to a
    * single 10-value row; the solve is O(1) — the shape that makes
    * closed-form probes free at 100 TB where an iterative fitter would
    * cost a scan per epoch.
    */
  private def q259(s: SparkSession, dir: String): DataFrame = {
    // q281's fit-health contract: a singular Gram system (collinear
    // features, n < 3) yields NULL coefficients, never Inf/NaN
    def guarded(c: Column): Column = when(col("det") =!= 0, c)
    gramDets(probeFeatures(s, dir))
      .select(
        col("n").cast("bigint").as("n"),
        // round(6): determinants exceed 2^53 at sf0.1+, and HUGEINT→
        // DOUBLE (DuckDB) vs BigDecimal→double (JVM) can differ by 1 ulp
        // on the conversion — rounding absorbs it (QueryPack doctrine)
        guarded(round(
          (col("det0").cast("double") / col("det").cast("double")), 6))
          .as("beta0"),
        guarded(round(
          (col("det1").cast("double") / col("det").cast("double")), 6))
          .as("beta1"),
        guarded(round(
          (col("det2").cast("double") / col("det").cast("double")), 6))
          .as("beta2"),
        guarded(round(lit(1.0) -
          ((col("det") * col("syy") - col("det0") * col("sy")
            - col("det1") * col("s1y") - col("det2") * col("s2y"))
            .cast("double") / col("det").cast("double")) /
          ((col("n") * col("syy") - col("sy") * col("sy"))
            .cast("double") / col("n").cast("double")), 6)).as("r2"))
  }

  // --- q260: SRP-LSH embedding near-dup ------------------------------------

  // Signature machinery lives in the shared [[graft.functions.Srp]]
  // object since round 7 (q289 composes it with decontamination); the
  // constants keep their local names for the oracle interpolations.
  private val srpPlanes = graft.functions.Srp.planes
  private val srpDims = graft.functions.Srp.dims
  private val srpTau = 0.95

  /** q260 — the SRP-LSH (signed-random-projection / hyperplane-hash) SCALE
    * PATH for embedding-cosine near-dup: the angular analog of q63's text
    * SimHash, closing the q64 note that exact cosine pairing needs an LSH
    * route at full-corpus scale. Per vector, a 16-bit signature of sign
    * bits `sign(Σ_d qv_d·w_{p,d})` over int8-quantized codes (the q152
    * quantizer — integer dots, engine-exact) against md5-derived ±1
    * hyperplanes; Goemans–Williamson gives P[bit differs] = θ/π, so
    * high-cosine pairs land within a small hamming ball. Candidates come
    * from the same 3-segment pigeonhole join as q63 (hamming ≤ 2 ⇒ one
    * segment equal — a guarantee, not recall), then ONLY candidates join
    * back for the exact-cosine verify at the production τ = 0.95.
    *
    * The synthetic corpus is near-orthogonal (max cos ≈ 0.47 — q64's
    * calibration note), so true near-dups are PLANTED deterministically:
    * every 25th vector gets a twin (`vec_id + 1000000`, first component
    * +0.1) — cos ≈ 0.999, the operator must recover them; random pairs
    * that survive the hamming gate die at τ. Scale shape: signatures are
    * pure per-row codegen (the ±1 model is literal — zero joins), the
    * segment join shuffles only (vec_id, sig, segment), and the heavy
    * double arrays re-join only for O(candidates) — q62's doctrine.
    */
  /** The q260/q276 signature relation: corpus ∪ planted twins, int8
    * quantization, 16-bit SRP signature — plus the double vectors for
    * the verify stage. */
  private def srpBase(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val twins = raw.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(array(col("v")(0) + lit(0.1)),
          slice(col("v"), 2, srpDims - 1)).as("v"))
    raw.unionAll(twins)
      .withColumn("scale", graft.functions.Srp.scaleOf(col("v")))
      .withColumn("qv",
        graft.functions.Srp.quantize(col("v"), col("scale")))
  }

  private def srpSig: Column = graft.functions.Srp.sig(col("qv"))

  private def q260(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Vectors
    val base = srpBase(s, dir)
    val sigs = base.select(col("vec_id"), srpSig.as("sig"))
    val segs = sigs.select(col("vec_id"), col("sig"),
        explode(graft.functions.Srp.segments(col("sig"))).as("seg"))
      .select(col("vec_id"), col("sig"),
        col("seg.seg_idx").as("seg_idx"), col("seg.seg_val").as("seg_val"))
    val cands = segs.alias("x").join(segs.alias("y"),
        col("x.seg_idx") === col("y.seg_idx") &&
          col("x.seg_val") === col("y.seg_val") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("vec_id2"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .filter(col("hamming") <= 2)
      .distinct()
    val vecs = base.select(col("vec_id"), col("v"),
      sqrt(Vectors.dot(col("v"), col("v"))).as("nrm"))
    vecs.join(broadcast(cands), "vec_id")
      .join(vecs.select(col("vec_id").as("vec_id2"), col("v").as("v2"),
        col("nrm").as("nrm2")), "vec_id2")
      .withColumn("cos",
        Vectors.dot(col("v"), col("v2")) / (col("nrm") * col("nrm2")))
      .filter(col("cos") >= srpTau)
      .select(col("vec_id"), col("vec_id2"), col("hamming"),
        round(col("cos"), 6).as("cos6"))
      .orderBy("vec_id", "vec_id2")
  }

  // --- q261: as-of event join ----------------------------------------------

  private val asofTolUs = 604800000000L // 7 days in µs

  /** q261 — AS-OF JOIN between two event streams: each purchase matches
    * the MOST RECENT view by the same user within a 7-day tolerance
    * (unmatched purchases kept with nulls — the left-outer as-of shape).
    * This is the event-to-event sibling of q238's SCD2 point-in-time
    * dimension join, and the batch twin of streaming.StreamJoin's
    * interval attribution.
    *
    * Scale shape: a raw `v.ts <= p.ts` theta join would be a per-user
    * nested loop; instead BOTH sides bucket by `ts div tolerance` and each
    * purchase probes exactly 2 buckets (its own and the previous — any
    * view inside [t−T, t] lives in one of them, a guarantee of W = T),
    * making candidate generation an EQUI-join on (user_id, bucket) whose
    * fan-in is the per-user 2-window event density, not the history
    * length. The per-purchase argmax folds as max(struct(ts, id)) —
    * lexicographic struct ordering gives the deterministic
    * latest-then-highest-id tie-break, map-side combinable. The oracle
    * runs the naive theta join + two-step max: same result is the claim.
    */
  private def q261(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("us"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event"), col("user_id"),
        col("us").as("ts_p"))
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("v_event"), col("user_id"),
        col("us").as("ts_v"), expr(s"us div ${asofTolUs}L").as("bkt"))
    val probes = p.select(col("p_event"), col("user_id"), col("ts_p"),
      explode(array(expr(s"ts_p div ${asofTolUs}L"),
        expr(s"ts_p div ${asofTolUs}L - 1"))).as("bkt"))
    val best = probes.join(v, Seq("user_id", "bkt"))
      .filter(col("ts_v") <= col("ts_p") &&
        col("ts_v") >= col("ts_p") - asofTolUs)
      .groupBy("p_event")
      .agg(max(struct(col("ts_v"), col("v_event"))).as("m"))
    p.join(best, Seq("p_event"), "left")
      .select(col("p_event"), col("user_id"), col("ts_p"),
        col("m.v_event").as("v_event"), col("m.ts_v").as("ts_v"),
        (col("ts_p") - col("m.ts_v")).as("gap_us"))
      .orderBy("p_event")
  }

  /** q296 — q261's candidate stage written the NAIVE way on purpose
    * (the q276/q285 doctrine, extended to band joins in round 7): a
    * plain `v.user = p.user ∧ p.ts − T ≤ v.ts ≤ p.ts` theta join with
    * NO bucketing anywhere in the query text —
    * [[graft.plans.BandJoinBlocking]] normalizes the two range
    * conjuncts into the band `0 ≤ ts_p − ts_v ≤ T`, explodes the probe
    * side into its 2 buckets, and plans the (user, bucket) equi-join
    * q261 builds by hand. Same argmax + left-join readout and the same
    * oracle as q261. At gate SFs the view side broadcasts and the
    * equi-key stand-down correctly keeps Spark's BroadcastHashJoin;
    * BandRuleSpec pins the forced rewrite and its exact-bag parity.
    */
  private def q296(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("us"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event"), col("user_id"),
        col("us").as("ts_p"))
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("v_event"), col("user_id").as("v_user"),
        col("us").as("ts_v"))
    val cand = p.join(v,
      col("user_id") === col("v_user") &&
        col("ts_v") <= col("ts_p") &&
        col("ts_v") >= col("ts_p") - asofTolUs)
    val best = cand.groupBy("p_event")
      .agg(max(struct(col("ts_v"), col("v_event"))).as("m"))
    p.join(best, Seq("p_event"), "left")
      .select(col("p_event"), col("user_id"), col("ts_p"),
        col("m.v_event").as("v_event"), col("m.ts_v").as("ts_v"),
        (col("ts_p") - col("m.ts_v")).as("gap_us"))
      .orderBy("p_event")
  }

  // --- q264: multi-touch attribution ---------------------------------------

  /** q264 — multi-touch revenue attribution, LONG-WINDOW plan: the same
    * three models as q131 (`LakehousePack` — first/last/linear credit,
    * observed-attribution semantics) but over a 7-DAY lookback instead of
    * q131's single hour. The window length changes the right plan: q131's
    * per-user equi-join with a range residual is fine when history ×
    * 1-hour density bounds the fan-in, but at a 7-day tolerance (and at
    * 100 TB event history) the per-user join degenerates toward each
    * user's full history; here candidate generation reuses q261's
    * tolerance-bucketed 2-probe equi-join, bounding fan-in by the 2-window
    * event density regardless of history length. Mechanics also differ
    * where q131 leans on windows: the first/last argmin/argmax fold as
    * min/max(struct(ts, id, type)) — map-side combinable aggregates, no
    * per-purchase row_number window — and linear credit accumulates as
    * exact micro-cents with a per-purchase TRUNCATING division (the
    * deterministic contract both engines replay). Purchases with no
    * in-window touch assign no credit.
    */
  private def q264(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("us"), col("value"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event"), col("user_id"),
        col("us").as("ts_p"),
        round(col("value") * 100).cast("long").as("cents"))
    val t = e.filter(col("event_type").isin("view", "click"))
      .select(col("event_id").as("t_event"), col("user_id"),
        col("event_type").as("touch"), col("us").as("ts_t"),
        expr(s"us div ${asofTolUs}L").as("bkt"))
    val probes = p.select(col("p_event"), col("user_id"), col("ts_p"),
      col("cents"),
      explode(array(expr(s"ts_p div ${asofTolUs}L"),
        expr(s"ts_p div ${asofTolUs}L - 1"))).as("bkt"))
    val cand = probes.join(t, Seq("user_id", "bkt"))
      .filter(col("ts_t") <= col("ts_p") &&
        col("ts_t") >= col("ts_p") - asofTolUs)
      .select(col("p_event"), col("cents"), col("touch"),
        col("ts_t"), col("t_event"))
    val tot = cand.groupBy("p_event", "cents").agg(
      count(lit(1)).as("n"),
      min(struct(col("ts_t"), col("t_event"), col("touch"))).as("f"),
      max(struct(col("ts_t"), col("t_event"), col("touch"))).as("l"))
    val firstAgg = tot.groupBy(col("f.touch").as("touch"))
      .agg(sum("cents").as("first_cents"), count(lit(1)).as("n_first"))
    val lastAgg = tot.groupBy(col("l.touch").as("touch"))
      .agg(sum("cents").as("last_cents"), count(lit(1)).as("n_last"))
    val linAgg = cand.groupBy("p_event", "cents", "touch")
      .agg(count(lit(1)).as("cnt"))
      .join(tot.select("p_event", "n"), "p_event")
      .select(col("touch"),
        call_function("div",
          col("cents") * lit(1000000L) * col("cnt"), col("n"))
          .as("credit_micro"))
      .groupBy("touch").agg(sum("credit_micro").as("linear_micro_cents"))
    firstAgg.join(lastAgg, Seq("touch"), "full_outer")
      .join(linAgg, Seq("touch"), "full_outer")
      .select(col("touch"),
        coalesce(col("first_cents"), lit(0L)).as("first_cents"),
        coalesce(col("n_first"), lit(0L)).as("n_first"),
        coalesce(col("last_cents"), lit(0L)).as("last_cents"),
        coalesce(col("n_last"), lit(0L)).as("n_last"),
        coalesce(col("linear_micro_cents"), lit(0L))
          .as("linear_micro_cents"))
      .orderBy("touch")
  }

  // --- q265: split-conformal prediction interval ---------------------------

  /** q265 — SPLIT-CONFORMAL prediction intervals for the q259 probe, with
    * finite-sample coverage audited on a held-out fold: doc_id md5-buckets
    * into train (70%) / calibration (20%) / test (10%); the probe is
    * refit on TRAIN ONLY (one [[gramDets]] scan → broadcast determinant
    * row); each non-train row's absolute residual is EXACT-RATIONAL with
    * the common denominator |det| — |det·y − (det₀ + det₁x₁ + det₂x₂)| —
    * and is milli-quantized by one truncating division (identical both
    * engines), so q̂ = the ⌈0.9·(n_cal+1)⌉-th smallest calibration
    * residual is an integer ORDER STATISTIC with no float anywhere.
    * Selection is scale-safe: residuals bucket by BIT LENGTH (length of
    * the binary string — ≤ 64 buckets at any corpus size, monotone in
    * value, the q208/q255 trick), a ≤64-row prefix locates the bucket
    * containing rank k, and the row_number window runs ONLY inside that
    * one bucket — never a global sort. Coverage on test is then one
    * integer comparison per row. The oracle replays the naive global
    * row_number form — same order statistic is the claim under test.
    */
  private def q265(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = probeFeatures(s, dir)
      .withColumn("b10",
        TrainingPipelinePack.bucket(col("doc_id"), "conformal", 10))
      .withColumn("split",
        when(col("b10") < 7, "train")
          .when(col("b10") < 9, "cal").otherwise("test"))
      .persist()
    val g = gramDets(base.filter(col("split") === "train"))
    val scored = base.filter(col("split") =!= "train")
      .crossJoin(broadcast(g.select(col("n").cast("bigint").as("n_train"),
        col("det"), col("det0"), col("det1"), col("det2"))))
      .withColumn("r_milli", call_function("div",
        abs(col("det") * d(col("y")) - (col("det0") +
          col("det1") * d(col("x1")) + col("det2") * d(col("x2"))))
          * lit(1000),
        abs(col("det"))))
    val cal = scored.filter(col("split") === "cal")
      .select(col("doc_id"), col("r_milli"),
        length(bin(col("r_milli"))).as("blen"))
    val pre = cal.groupBy("blen").agg(count(lit(1)).as("c"))
      .withColumn("below",
        sum("c").over(Window.orderBy("blen")) - col("c"))
    val nCal = cal.agg(count(lit(1)).as("n_cal"))
    val containing = pre.crossJoin(broadcast(nCal))
      .withColumn("k", least(
        call_function("div", (col("n_cal") + 1) * 9 + 9, lit(10L)),
        col("n_cal")))
      .filter(col("below") < col("k") && col("below") + col("c") >= col("k"))
      .select(col("blen"), (col("k") - col("below")).as("k_in"),
        col("n_cal"), col("k"))
    val qhat = cal.join(broadcast(containing), "blen")
      .withColumn("rn", row_number().over(
        Window.partitionBy("blen").orderBy(col("r_milli"), col("doc_id"))))
      .filter(col("rn") === col("k_in"))
      .select(col("r_milli").as("qhat_milli"), col("n_cal"), col("k"))
    scored.filter(col("split") === "test")
      .crossJoin(broadcast(qhat))
      .groupBy("n_train", "n_cal", "k", "qhat_milli")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("r_milli") <= col("qhat_milli"), 1L).otherwise(0L))
          .as("n_cov"))
      .select(col("n_train"), col("n_cal"), col("n_test"), col("k"),
        col("qhat_milli"),
        (col("n_cov").cast("double") / col("n_test")).as("coverage"))
  }

  // --- q266: rank-biased overlap (RBO) ranking comparison ------------------

  private val rboQueryDocs = 5
  private val rboK = 5

  /** q266 — RANK-BIASED OVERLAP (Webber et al., TOIS'10) between two
    * retrieval rankings — the idf ABLATION: the q163-style TF-IDF top-5
    * versus a raw term-frequency-overlap top-5, both built from ONE
    * shared (doc, word) tf relation (the idf join is the only
    * difference, so the metric isolates idf's contribution to ranking).
    * Truncated RBO@5 with persistence p = 0.9, computed EXACTLY: the
    * geometric weights are the rationals 9^(d−1)/10^(d−1), so each
    * depth term (10⁶·9^(d−1)·overlap@d) div (10^(d−1)·d) is an integer
    * both engines truncate identically — no pow(), no float weights;
    * `agreement` (RBO / its perfect-ranking value) is the single double
    * division at the end. Prefix overlaps come from a 5-depth explode of
    * the matched-pair join at (query, doc) grain — query batches are
    * broadcast everywhere (q163's doctrine), and the corpus shuffles
    * only for the shared tf reduce.
    */
  private def q266(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = Tables.load(s, dir, "documents")
      .agg(count(lit(1)).as("n_docs"))
    val tf = Tables.loadParallel(s, dir, "documents")
      .select(col("doc_id"), explode(toks(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      .persist()
    val idf = tf.groupBy("w").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("w"), log(col("n_docs").cast("double") / col("df"))
        .as("idf"))
    val weighted = tf.join(idf, "w")
      .select(col("doc_id"), col("w"), (col("cnt") * col("idf")).as("wt"))
    val q1 = weighted.filter(col("doc_id") < rboQueryDocs)
      .select(col("doc_id").as("q_id"), col("w"), col("wt").as("qwt"))
    val r1 = weighted.join(broadcast(q1), Seq("w"))
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy("q_id", "doc_id")
      .agg(round(sum(col("wt") * col("qwt")), 6).as("sc"))
      .withColumn("pos1", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("sc").desc, col("doc_id"))))
      .filter(col("pos1") <= rboK)
      .select("q_id", "doc_id", "pos1")
    val q2 = tf.filter(col("doc_id") < rboQueryDocs)
      .select(col("doc_id").as("q_id"), col("w"), col("cnt").as("qcnt"))
    val r2 = tf.join(broadcast(q2), Seq("w"))
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy("q_id", "doc_id")
      .agg(sum(col("cnt") * col("qcnt")).as("sc"))
      .withColumn("pos2", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("sc").desc, col("doc_id"))))
      .filter(col("pos2") <= rboK)
      .select("q_id", "doc_id", "pos2")
    val ov = r1.join(r2, Seq("q_id", "doc_id"))
      .select(col("q_id"), col("pos1"), col("pos2"),
        explode(sequence(lit(1), lit(rboK))).as("d"))
      .filter(col("pos1") <= col("d") && col("pos2") <= col("d"))
      .groupBy("q_id", "d").agg(count(lit(1)).as("ov"))
    val grid = r1.select("q_id").distinct()
      .select(col("q_id"), explode(sequence(lit(1), lit(rboK))).as("d"))
    val p9 = element_at(
      array(lit(1L), lit(9L), lit(81L), lit(729L), lit(6561L)), col("d"))
    val p10 = element_at(
      array(lit(1L), lit(10L), lit(100L), lit(1000L), lit(10000L)),
      col("d"))
    grid.join(ov, Seq("q_id", "d"), "left")
      .select(col("q_id"), col("d"), coalesce(col("ov"), lit(0L)).as("ov"),
        p9.as("p9"), p10.as("p10"))
      .select(col("q_id"), col("d"), col("ov"),
        call_function("div", lit(1000000L) * col("p9") * col("ov"),
          col("p10") * col("d")).as("term"),
        call_function("div", lit(1000000L) * col("p9") * col("d"),
          col("p10") * col("d")).as("perfect"))
      .groupBy("q_id")
      .agg(sum("term").as("rbo_micro"), sum("perfect").as("perfect_micro"),
        max(when(col("d") === rboK, col("ov"))).as("ov_k"))
      .select(col("q_id"), col("rbo_micro"), col("perfect_micro"),
        col("ov_k"),
        (col("rbo_micro").cast("double") / col("perfect_micro"))
          .as("agreement"))
      .orderBy("q_id")
  }

  // --- q281: grouped per-source probes -------------------------------------

  /** q281 — MANY MODELS IN ONE PASS: the q259 closed-form OLS probe fit
    * independently PER SOURCE — the per-segment modeling pattern (one
    * model per tenant/domain/experiment cell) that closed-form solves
    * make free at scale: the same single corpus scan now reduces
    * map-side to |sources| Gram rows instead of one, and the Cramer
    * solve broadcasts nothing at all — it's a per-row expression over
    * the group-grain relation. Same exact-decimal algebra, same
    * round(6) contract on the ratio outputs, plus each group's
    * determinant nonzero-ness as a fit-health flag (a degenerate
    * stratum yields NULL betas, not a crash).
    */
  private def q281(s: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    val base = Tables.load(s, dir, "documents").select(
      col("source"),
      col("n_chars").as("x1"),
      size(array_distinct(t)).cast("long").as("x2"),
      size(t).cast("long").as("y"))
    val g = base.groupBy("source").agg(gramAggs.head, gramAggs.tail: _*)
    val withDets = g.select(col("*") +: detCols: _*)
    withDets.select(
        col("source"),
        col("n").cast("bigint").as("n"),
        when(col("det") =!= 0,
          round(col("det0").cast("double") / col("det").cast("double"), 6))
          .as("beta0"),
        when(col("det") =!= 0,
          round(col("det1").cast("double") / col("det").cast("double"), 6))
          .as("beta1"),
        when(col("det") =!= 0,
          round(col("det2").cast("double") / col("det").cast("double"), 6))
          .as("beta2"),
        when(col("det") =!= 0, round(lit(1.0) -
          ((col("det") * col("syy") - col("det0") * col("sy")
            - col("det1") * col("s1y") - col("det2") * col("s2y"))
            .cast("double") / col("det").cast("double")) /
          ((col("n") * col("syy") - col("sy") * col("sy"))
            .cast("double") / col("n").cast("double")), 6)).as("r2"))
      .orderBy("source")
  }

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] =
    Seq(
      "q258_pmi_collocations" -> q258 _,
      "q259_linear_probe" -> q259 _,
      "q260_srp_lsh_dup" -> q260 _,
      "q261_asof_join" -> q261 _,
      "q296_band_join_rule" -> q296 _,
      "q264_multitouch_attribution" -> q264 _,
      "q265_conformal_interval" -> q265 _,
      "q266_rbo_rank_overlap" -> q266 _,
      "q276_hamming_join_rule" -> q276 _,
      "q281_grouped_probes" -> q281 _,
      "q283_blocked_hamming_rule" -> q283 _,
      "q299_hamming_anti_rule" -> q299 _,
      "q300_band_outer_rule" -> q300 _,
      "q301_band_anti_rule" -> q301 _,
      "q302_hamming_semi_rule" -> q302 _,
      "q304_hamming_outer_rule" -> q304 _,
      "q334_fuzzy_join_rule" -> q334 _,
      "q335_fuzzy_anti_rule" -> q335 _,
      "q338_jaccard_join_rule" -> q338 _,
      "q339_jaccard_anti_rule" -> q339 _,
      "q340_membership_join_rule" -> q340 _,
      "q341_composed_blocking" -> q341 _,
      "q342_srp_join_rule" -> q342 _,
      "q343_srp_anti_rule" -> q343 _,
      "q344_adaptive_fuzzy_rule" -> q344 _,
      "q345_cosine_band_composed" -> q345 _,
      "q346_srp_semi_rule" -> q346 _,
      "q347_overlap_join_rule" -> q347 _,
      "q348_arrays_overlap_rule" -> q348 _,
      "q349_pipeline_e2e" -> q349 _,
      "q350_containment_join_rule" -> q350 _,
      "q351_containment_semi_rule" -> q351 _,
      "q352_containment_anti_rule" -> q352 _,
      "q353_containment_outer_rule" -> q353 _,
      "q354_containment_outer_mirror" -> q354 _)

  /** q350 — a CONTAINMENT JOIN written naively on RELATIONAL data:
    * REDUNDANT ORDERS — orders whose entire distinct part list is
    * covered by some OTHER single order's part list,
    * `size(array_except(a.parts, b.parts)) = 0`, the
    * "is this row's set a subset of that row's" shape every
    * tag-policy / coverage system runs.
    * [[graft.plans.SetSimilarityJoinBlocking]]'s containment arm: the
    * probe side carries only its MINIMAL part key as a scalar (no
    * explode), the superset side explodes its distinct parts —
    * candidates are the orders sharing that one part, never the
    * order corpus — with the ∅-⊆-everything branch UNIONed in (empty
    * part sets cannot arise from groupBy, so that branch planes to
    * nothing at runtime). Output: per covered order, how many other
    * orders cover it and the smallest covering order. */
  private def q350(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
    val a = o.filter(col("l_orderkey") % 20 === 0 &&
        size(col("parts")) <= 3)
      .select(col("l_orderkey").as("okey"), col("parts").as("aparts"))
    a.join(o,
        size(array_except(col("aparts"), col("parts"))) === 0 &&
          col("okey") =!= col("l_orderkey"))
      .groupBy(col("okey"))
      .agg(count(lit(1)).as("n_cover"),
        min(col("l_orderkey")).as("min_cover"))
      .orderBy("okey")
  }

  /** q351 — the MIRRORED containment SEMI: "which orders COVER some
    * other order" — the coverage-audit direction, superset on the
    * LEFT, written as the naive `size(array_except(sub, sup)) = 0`
    * LEFT SEMI with the subset probes on the right.
    * [[graft.plans.SetSimilarityJoinBlocking]]'s mirrored arm: the
    * left (superset) side explodes its distinct parts under a rid,
    * branch-1 evidence is marked by a hash-joinable ExistenceJoin on
    * `token = min(sub)`, the ∅-sub branch marks below the explode,
    * and the rid collapse restores left grain exactly. */
  private def q351(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
    val a = o.filter(col("l_orderkey") % 20 === 0 &&
        size(col("parts")) <= 3)
      .select(col("l_orderkey").as("okey"), col("parts").as("aparts"))
    o.join(a,
        size(array_except(col("aparts"), col("parts"))) === 0 &&
          col("l_orderkey") =!= col("okey"), "left_semi")
      .select(col("l_orderkey"))
      .orderBy("l_orderkey")
  }

  /** q352 — the MIRRORED containment ANTI: orders (on a slice) that
    * cover NO small probe order — the complement audit of q351,
    * planned by the same mirrored arm as two successive anti joins on
    * one tree (∅-sub coverage at left grain, then the token-grain
    * pigeonhole: a row survives iff ALL its exploded tokens found no
    * covering probe). Output is the per-set-size distribution of the
    * non-covering orders. */
  private def q352(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
    val a = o.filter(col("l_orderkey") % 20 === 0 &&
        size(col("parts")) <= 3)
      .select(col("l_orderkey").as("okey"), col("parts").as("aparts"))
    o.filter(col("l_orderkey") % 5 === 0)
      .join(a,
        size(array_except(col("aparts"), col("parts"))) === 0 &&
          col("l_orderkey") =!= col("okey"), "left_anti")
      .groupBy(size(col("parts")).as("n_parts"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("l_orderkey")).as("min_okey"),
        max(col("l_orderkey")).as("max_okey"))
      .orderBy("n_parts")
  }

  /** q353 — containment LEFT OUTER, subset on the left: ANNOTATE each
    * small order with its covering orders, if any — the enrichment
    * spelling a coverage dashboard writes first ("0 covers / null"
    * rows are the interesting ones). Planned by
    * [[graft.plans.SetSimilarityJoinBlocking]]'s containment arm as a
    * two-branch Union of LEFT OUTER joins at left grain (the ∅-sub
    * split is a deterministic function of the left row, so the
    * branches are disjoint — no rid machinery needed): min-token
    * scalar probe vs the exploded superset side, plus the key-less ∅
    * branch. */
  private def q353(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
    val a = o.filter(col("l_orderkey") % 20 === 0 &&
        size(col("parts")) <= 3)
      .select(col("l_orderkey").as("okey"), col("parts").as("aparts"))
    a.join(o,
        size(array_except(col("aparts"), col("parts"))) === 0 &&
          col("okey") =!= col("l_orderkey"), "left_outer")
      .groupBy(col("okey"))
      .agg(count(col("l_orderkey")).as("n_cover"),
        min(col("l_orderkey")).as("min_cover"))
      .orderBy("okey")
  }

  /** q354 — the MIRRORED containment LEFT OUTER, superset on the left:
    * annotate each order on a slice with the small orders it COVERS,
    * if any — the coverage-audit enrichment. Planned by the mirrored
    * arm as Inner ∪ (anti × nulls): the matched branches are the
    * mirrored inner machinery (exactly-once per pair through the
    * min-token key; broadcast-pinned ∅-sub branch), the null-extension
    * branch is the double-anti pigeonhole at left grain. */
  private def q354(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
    val a = o.filter(col("l_orderkey") % 20 === 0 &&
        size(col("parts")) <= 3)
      .select(col("l_orderkey").as("okey"), col("parts").as("aparts"))
    o.filter(col("l_orderkey") % 5 === 0)
      .join(a,
        size(array_except(col("aparts"), col("parts"))) === 0 &&
          col("l_orderkey") =!= col("okey"), "left_outer")
      .groupBy(col("l_orderkey"))
      .agg(count(col("okey")).as("n_covered"),
        min(col("okey")).as("min_covered"))
      .orderBy("l_orderkey")
  }

  /** q349 — the TRAINING-DATA PIPELINE end-to-end, written naively in
    * ONE DataFrame DAG: quality gate (≥ 8 tokens, non-eval) → exact
    * dedup (md5 keeper) → near-dup pruning (`size(intersect) ≥
    * 0.8·size(union)` LEFT ANTI against smaller ids — the
    * set-similarity rule's anti arm plans it) → fuzzy decontamination
    * (`levenshtein ≤ 1` LEFT ANTI vs eval prefixes — the edit-distance
    * rule's anti arm) → budgeted selection (cumulative token budget
    * over a total order — the cumulative-window shape
    * GlobalRankRewrite owns above broadcast scale). A user writes the
    * predicates; the engine owns every blocking plan. The DuckDB
    * oracle replays the identical pipeline in SQL. */
  private def q349(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toksD = Tables.load(s, dir, "documents")
      .filter(col("source").isin("src1", "src2", "src3"))
      .select(col("doc_id"), col("text"), toks(col("text")).as("tk"))
    val quality = toksD
      .filter(size(col("tk")) >= 8 && col("doc_id") % 17 =!= 0)
      .select(col("doc_id"), col("text"),
        array_distinct(col("tk")).as("dk"),
        size(col("tk")).as("n_toks"))
    val exact = quality
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rn") === 1).drop("rn")
    val dupSide = exact.select(col("doc_id").as("doc_id2"),
      col("dk").as("dk2"))
    val nearDeduped = exact.join(dupSide,
      size(array_intersect(col("dk"), col("dk2"))) >=
        lit(0.8) * size(array_union(col("dk"), col("dk2"))) &&
        col("doc_id2") < col("doc_id"), "left_anti")
    val evalPre = toksD.filter(col("doc_id") % 17 === 0)
      .select(substring(col("text"), 1, 16).as("pre2"))
    val decon = nearDeduped
      .withColumn("pre", substring(col("text"), 1, 16))
      .join(evalPre, levenshtein(col("pre"), col("pre2")) <= 1,
        "left_anti")
    decon
      .withColumn("cum", sum(col("n_toks")).over(
        Window.orderBy(col("n_toks").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") <= 600L)
      .select(col("doc_id"), col("n_toks"), col("cum"))
      .orderBy("doc_id")
  }

  /** q346 — the CONTAMINATED list, naively: corpus vectors within
    * cosine 0.95 of SOME eval vector (left SEMI — q343's complement).
    * Under the opt-in the hamming rule's semi machinery runs at
    * segment grain and regroups per rid; the oracle's EXISTS applies
    * the identical contract gate. */
  private def q346(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Vectors
    val rel = srpBase(s, dir).select(col("vec_id"), col("v"))
    val corpus = rel.filter(col("vec_id") < 1000000L)
    val eval = rel.filter(col("vec_id") >= 1000000L)
      .select(col("vec_id").as("evec"), col("v").as("v2"))
    val cos = Vectors.dot(col("v"), col("v2")) /
      (sqrt(Vectors.dot(col("v"), col("v"))) *
        sqrt(Vectors.dot(col("v2"), col("v2"))))
    withSrpJoin(s) {
      corpus.join(eval, cos >= lit(0.95), "left_semi")
        .select(col("vec_id"))
        .orderBy("vec_id")
        .localCheckpoint()
    }
  }

  /** q347 — an OVERLAP-THRESHOLD set join written naively: document
    * token sets sharing ≥ 24 distinct tokens (`size(array_intersect)
    * ≥ 24 ∧ doc_id < doc_id2` — the "co-mention" join).
    * [[graft.plans.SetSimilarityJoinBlocking]]'s overlap arm: α = t
    * literal prefixes (length |x| − 3), minimal-common-token
    * canonical, PPJoin length/positional kills at the constant bound. */
  private def q347(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .filter(col("source") === "src2" && col("doc_id") % 2 === 0)
      .select(col("doc_id"),
        array_distinct(TextOps.toks(col("text"))).as("tk"))
    val y = d.select(col("doc_id").as("doc_id2"), col("tk").as("tk2"))
    d.join(y,
        size(array_intersect(col("tk"), col("tk2"))) >= 24 &&
          col("doc_id") < col("doc_id2"))
      .select(col("doc_id"), col("doc_id2"),
        size(array_intersect(col("tk"), col("tk2"))).as("shared"))
      .orderBy("doc_id", "doc_id2")
  }

  /** q348 — an ANY-SHARED-ELEMENT join written naively:
    * `arrays_overlap(rare, rare2)` over each document's RARE-token
    * set (tokens ≥ 10 chars — the distinctive vocabulary), the "do
    * these docs share any distinctive term" linkage shape. The rule's
    * arrays_overlap arm rides the overlap machinery at α = 1 (full
    * sorted-distinct explode, exactly-once canonical). */
  private def q348(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .filter(col("source").isin("src1", "src2"))
      .select(col("doc_id"),
        array_distinct(filter(TextOps.toks(col("text")),
          t => length(t) >= 10)).as("rare"))
    val y = d.select(col("doc_id").as("doc_id2"), col("rare").as("rare2"))
    d.join(y,
        arrays_overlap(col("rare"), col("rare2")) &&
          col("doc_id") < col("doc_id2"))
      .select(col("doc_id"), col("doc_id2"),
        size(array_intersect(col("rare"), col("rare2"))).as("shared"))
      .orderBy("doc_id", "doc_id2")
  }

  /** q345 — THREE rules on ONE join, written naively: embedding
    * near-dups (`cosine ≥ 0.95`) restricted to an id band
    * (`vec_id2 − vec_id ∈ [999000, 1001000]` — the twin offset
    * window). Under the q342 opt-in, [[graft.plans.BandJoinBlocking]]
    * buckets the band, [[graft.plans.CosineJoinBlocking]] injects the
    * SRP hamming bound on the banded join, and
    * [[graft.plans.HammingJoinBlocking]] plans the segments — each
    * rule guards recursion only on its OWN generated columns, so the
    * manufactured conjunct composes exactly like a user-written one
    * (the q341 doctrine, extended to a rule-MANUFACTURED bound).
    * Candidates block on (band bucket, sig segment); the oracle
    * replicates the contract subset in SQL. */
  private def q345(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Vectors
    val rel = srpBase(s, dir).select(col("vec_id"), col("v"))
    val y = rel.select(col("vec_id").as("vec_id2"), col("v").as("v2"))
    val cos = Vectors.dot(col("v"), col("v2")) /
      (sqrt(Vectors.dot(col("v"), col("v"))) *
        sqrt(Vectors.dot(col("v2"), col("v2"))))
    withSrpJoin(s) {
      rel.join(y, cos >= lit(0.95) &&
          col("vec_id2") >= col("vec_id") + 999000L &&
          col("vec_id2") <= col("vec_id") + 1001000L)
        .select(col("vec_id"), col("vec_id2"), round(cos, 6).as("cos6"))
        .orderBy("vec_id", "vec_id2")
        .localCheckpoint()
    }
  }

  /** q344 — ADAPTIVE fuzzy matching written naively: variable-length
    * title prefixes (8–23 chars, length keyed off doc_id) self-joined
    * on the RELATIVE bound `levenshtein ≤ least(2, length(pre) div 8)`
    * — short titles demand near-exact matches, long ones tolerate two
    * edits, the thresholding every real fuzzy matcher uses.
    * [[graft.plans.EditDistanceJoinBlocking]] enumerates the PassJoin
    * combos at the PROVABLE CAP K = 2 (`staticBound`: a `least` with a
    * literal child can never exceed it) and the kept original
    * condition applies each row's own k exactly — per-row thresholds
    * ride the compile-time plan shape. */
  private def q344(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        expr("substring(text, 1, cast(8 + pmod(doc_id, 16) as int))")
          .as("pre"))
    val y = d.select(col("doc_id").as("doc_id2"), col("pre").as("pre2"))
    d.join(y,
        levenshtein(col("pre"), col("pre2")) <=
          least(lit(2), expr("length(pre) div 8")) &&
          col("doc_id") < col("doc_id2"))
      .select(col("doc_id"), col("doc_id2"),
        levenshtein(col("pre"), col("pre2")).as("dist"))
      .orderBy("doc_id", "doc_id2")
  }

  /** Run `body` with the OPT-IN [[graft.plans.CosineJoinBlocking]]
    * contract enabled (m = 3 segments, 24-bit signatures — the
    * documented demo calibration) and the prior conf restored after.
    * Callers materialize INSIDE `body` (eager `localCheckpoint`) so
    * the opt-in never leaks into sibling queries' optimization. */
  private def withSrpJoin[T](s: SparkSession)(body: => T): T = {
    val keys = Seq("spark.graft.srpjoin.segments" -> "3",
      "spark.graft.srpjoin.bits" -> "24")
    val prior = keys.map { case (k, _) => k -> s.conf.getOption(k) }
    keys.foreach { case (k, v) => s.conf.set(k, v) }
    try body finally prior.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** q342 — a COSINE NEAR-DUP JOIN written the naive way: the q260
    * corpus (embeddings ∪ planted cos≈0.999 twins) self-joined on the
    * bare cosine quotient `dot∕(‖a‖·‖b‖) ≥ 0.95 ∧ id < id2` — no
    * signatures, no segments, no LSH anywhere in the query text. The
    * engine's OPT-IN eighth rule ([[graft.plans.CosineJoinBlocking]],
    * enabled here at its demo calibration m = 3 / 24 bits) injects the
    * SRP signature hamming bound and [[graft.plans.HammingJoinBlocking]]
    * plans the pigeonhole segment equi-join from it. The result is the
    * rule's DETERMINISTIC contract set — original predicate ∧ sig
    * hamming ≤ 2 — which the DuckDB oracle reproduces exactly
    * (md5-derived ±1 hyperplanes, `list_dot_product` sequential-fold
    * parity, the [[graft.functions.SrpSignature]] contract): recall < 1
    * is the documented, reproducible opt-in, not noise. */
  private def q342(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Vectors
    val rel = srpBase(s, dir).select(col("vec_id"), col("v"))
    val y = rel.select(col("vec_id").as("vec_id2"), col("v").as("v2"))
    val cos = Vectors.dot(col("v"), col("v2")) /
      (sqrt(Vectors.dot(col("v"), col("v"))) *
        sqrt(Vectors.dot(col("v2"), col("v2"))))
    withSrpJoin(s) {
      rel.join(y, cos >= lit(0.95) && col("vec_id") < col("vec_id2"))
        .select(col("vec_id"), col("vec_id2"), round(cos, 6).as("cos6"))
        .orderBy("vec_id", "vec_id2")
        .localCheckpoint()
    }
  }

  /** q343 — SEMANTIC DECONTAMINATION written naively as a LEFT ANTI
    * cosine join: corpus vectors (the base embeddings) whose embedding
    * is within cosine 0.95 of NO eval vector (the planted twins) — the
    * q288/q289 shape with zero blocking in the query text. Under the
    * q342 opt-in the anti runs at segment grain through the hamming
    * rule's pigeonhole anti machinery; the contract caveat is pinned
    * here deliberately: a recall miss KEEPS a contaminated row, which
    * is why the rule is opt-in and the calibration is part of the
    * result's definition (the oracle applies the identical sig gate
    * inside NOT EXISTS). */
  private def q343(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Vectors
    val rel = srpBase(s, dir).select(col("vec_id"), col("v"))
    val corpus = rel.filter(col("vec_id") < 1000000L)
    val eval = rel.filter(col("vec_id") >= 1000000L)
      .select(col("vec_id").as("evec"), col("v").as("v2"))
    val cos = Vectors.dot(col("v"), col("v2")) /
      (sqrt(Vectors.dot(col("v"), col("v"))) *
        sqrt(Vectors.dot(col("v2"), col("v2"))))
    withSrpJoin(s) {
      corpus.join(eval, cos >= lit(0.95), "left_anti")
        .select(col("vec_id"))
        .orderBy("vec_id")
        .localCheckpoint()
    }
  }

  /** q341 — COMPOSED blocking written naively: near-duplicate event
    * signatures (16-bit md5-derived, SQL-replicable) WITHIN an
    * event-id band — `bit_count(sig ⊕ sig2) ≤ 2 ∧ |id − id2| ≤ 2000 ∧
    * id < id2`, the "similar fingerprint AND close in sequence" shape.
    * TWO rules own the plan together: [[graft.plans.HammingJoinBlocking]]
    * rewrites the hamming bound into segment equi-keys and keeps the
    * condition verbatim, so [[graft.plans.BandJoinBlocking]] sees the
    * band conjuncts on the REWRITTEN join and appends its bucket key
    * in the same fixed-point batch (`id < id2` folds in as a tighter
    * lower bound) — candidates blocked on (segment, bucket).
    * RuleCompositionSpec pins the forced two-rule plan and exact bag;
    * at gate SFs the segment keys + broadcastable sides let the band
    * arm stand down into a residual, which is the intended doctrine.
    */
  private def q341(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
      .filter(pmod(col("event_id"), lit(29L)) === 0)
      .select(col("event_id"),
        conv(substring(md5(col("event_id").cast("string")), 1, 4),
          16, 10).cast("long").as("sig"))
    val y = e.select(col("event_id").as("event_id2"),
      col("sig").as("sig2"))
    e.join(y,
        bit_count(col("sig").bitwiseXOR(col("sig2"))) <= 2 &&
          col("event_id2") >= col("event_id") - 2000L &&
          col("event_id2") <= col("event_id") + 2000L &&
          col("event_id") < col("event_id2"))
      .select(col("event_id"), col("event_id2"),
        bit_count(col("sig").bitwiseXOR(col("sig2"))).as("hamming"))
      .orderBy("event_id", "event_id2")
  }

  /** q340 — a TAG-MEMBERSHIP JOIN written the naive way: documents
    * joined to a vocabulary dim (each document's first token, distinct)
    * on `array_contains(tokens, word)` — "how many documents mention
    * each title word", the array-contains join every tag/label system
    * runs. [[graft.plans.SetSimilarityJoinBlocking]]'s membership arm
    * explodes ONLY the array side (full sorted-distinct) and equi-joins
    * the element against the scalar — per pair at most one distinct
    * element equals the word, so the rewrite is exactly-once with no
    * canonical residual, and the nested-loop contains-scan becomes a
    * hash join.
    */
  private def q340(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        array_distinct(TextOps.toks(col("text"))).as("tk"))
    val dim = Tables.load(s, dir, "documents")
      .select(TextOps.toks(col("text")).as("t0"))
      .filter(size(col("t0")) > 0)
      .select(element_at(col("t0"), 1).as("word")).distinct()
    d.join(dim, array_contains(col("tk"), col("word")))
      .groupBy("word").agg(count(lit(1)).as("n_docs"))
      .orderBy("word")
  }

  // --- q338/q339: naive set-similarity joins, planned by the engine --------

  /** q338 — a SET-SIMILARITY JOIN written the naive way on purpose:
    * document token sets self-joined on the division-free Jaccard
    * spelling `size(intersect) ≥ 0.8 · size(union) ∧ doc_id <
    * doc_id2`, no prefix filter anywhere in the query (q65 builds the
    * PPJoin manually; here the engine owns it).
    * [[graft.plans.SetSimilarityJoinBlocking]] rewrites it: each side
    * explodes its sorted-distinct prefix (length |x| − ⌈s·|x|⌉ + 1),
    * candidates hash-join on the token, the kept condition re-verifies
    * the exact Jaccard, and the minimal-common-token canonical keeps
    * each pair once. Output Jaccard via try_divide (matched pairs have
    * non-empty unions; the spelling stays ANSI-total).
    */
  private def q338(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .filter(col("source") === "src1")
      .select(col("doc_id"),
        array_distinct(TextOps.toks(col("text"))).as("tk"))
    val y = d.select(col("doc_id").as("doc_id2"), col("tk").as("tk2"))
    d.join(y,
        size(array_intersect(col("tk"), col("tk2"))) >=
          lit(0.8) * size(array_union(col("tk"), col("tk2"))) &&
          col("doc_id") < col("doc_id2"))
      .select(col("doc_id"), col("doc_id2"),
        try_divide(size(array_intersect(col("tk"), col("tk2"))),
          size(array_union(col("tk"), col("tk2")))).as("jac"))
      .orderBy("doc_id", "doc_id2")
  }

  /** q339 — SET-SIMILARITY DECONTAMINATION written the naive way:
    * corpus docs (three sources) LEFT-ANTI joined to an eval slice
    * (every 17th doc, all sources) on token-set Jaccard ≥ 0.8 via the
    * try_divide spelling — "keep docs token-similar to NO eval doc",
    * the set-level sibling of q335's edit-distance and q299's
    * signature decontamination. The rule's anti arm explodes prefixes
    * with OUTER explode (empty token sets still carry one row) and
    * collapses per-rid with the variable fan-out count.
    */
  private def q339(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        array_distinct(TextOps.toks(col("text"))).as("tk"))
    val ev = d.filter(col("doc_id") % 17 === 0)
      .select(col("tk").as("etk"))
    d.filter(col("doc_id") % 17 =!= 0 &&
        col("source").isin("src1", "src2", "src3"))
      .join(ev,
        try_divide(size(array_intersect(col("tk"), col("etk"))),
          size(array_union(col("tk"), col("etk")))) >= 0.8,
        "left_anti")
      .select(col("doc_id"), size(col("tk")).as("n_toks"))
      .orderBy("doc_id")
  }

  // --- q334/q335: naive edit-distance joins, planned by the engine ---------

  /** q334 — a FUZZY STRING JOIN written the naive way on purpose: doc
    * title-prefixes self-joined on `levenshtein(pre, pre2) ≤ 2 ∧
    * doc_id < doc_id2`, no blocking anywhere in the query. The
    * [[graft.plans.EditDistanceJoinBlocking]] optimizer rule (round 8)
    * rewrites it into the PassJoin segment equi-join: the right side
    * explodes into k+1 even segments, the left into the multi-match-
    * aware substring combos, and candidates hash-join on (segment,
    * target length, content) with the exact levenshtein as residual —
    * candidate generation linear instead of |corpus|², verification
    * O(k·|s|) per candidate instead of O(|s|²) per PAIR. The oracle is
    * DuckDB's naive all-pairs formulation; EditDistanceRuleSpec proves
    * bag semantics, edge lengths, and the stand-downs on fixtures.
    */
  private def q334(s: SparkSession, dir: String): DataFrame = {
    val srcs = (1 to 8).map("src" + _)
    val d = Tables.load(s, dir, "documents")
      .filter(col("source").isin(srcs: _*))
      .select(col("doc_id"), substring(col("text"), 1, 16).as("pre"))
    val y = d.select(col("doc_id").as("doc_id2"), col("pre").as("pre2"))
    d.join(y,
        levenshtein(col("pre"), col("pre2")) <= 2 &&
          col("doc_id") < col("doc_id2"))
      .select(col("doc_id"), col("doc_id2"),
        levenshtein(col("pre"), col("pre2")).as("dist"))
      .orderBy("doc_id", "doc_id2")
  }

  /** q335 — FUZZY DECONTAMINATION written the naive way: corpus docs
    * LEFT-ANTI joined to an eval slice (every 17th doc's prefix) on
    * `levenshtein ≤ 1` — "keep docs whose title-prefix is near NO eval
    * prefix", the edit-distance twin of q299's signature-space and
    * q143's n-gram decontamination. The rule's anti arm runs at combo
    * grain and collapses per-row: a doc survives iff ALL its substring
    * combos found no segment partner (the PassJoin lemma guarantees a
    * true fuzzy match claims at least one combo).
    */
  private def q335(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 16).as("pre"))
    val ev = d.filter(col("doc_id") % 17 === 0).select(col("pre").as("epre"))
    d.filter(col("doc_id") % 17 =!= 0)
      .join(ev, levenshtein(col("pre"), col("epre")) <= 1, "left_anti")
      .orderBy("doc_id")
  }

  // --- q276: the naive hamming join, planned by the engine -----------------

  /** q276 — q260's candidate stage written the NAIVE way on purpose: a
    * plain theta self-join `bit_count(sig ⊕ sig2) ≤ 2 ∧ id < id2` with
    * no manual blocking anywhere in the query. The
    * [[graft.plans.HammingJoinBlocking]] optimizer rule (injected in
    * every graft session) rewrites it into the pigeonhole-segment
    * equi-join — the engine, not the query author, owns the scale plan.
    * PlanShapeSpec pins that the executed plan carries the generated
    * `graft_seg` equi-key and no nested loop; the oracle runs the naive
    * all-pairs formulation — identical output is the rule's correctness
    * claim at corpus scale (HammingRuleSpec proves bag semantics and
    * the equi-join stand-down on fixtures).
    */
  private def q276(s: SparkSession, dir: String): DataFrame = {
    val sigs = srpBase(s, dir).select(col("vec_id"), srpSig.as("sig"))
    val y = sigs.select(col("vec_id").as("vec_id2"), col("sig").as("sig2"))
    sigs.join(y,
        bit_count(col("sig").bitwiseXOR(col("sig2"))) <= 2 &&
          col("vec_id") < col("vec_id2"))
      .select(col("vec_id"), col("vec_id2"),
        bit_count(col("sig").bitwiseXOR(col("sig2"))).as("hamming"))
      .orderBy("vec_id", "vec_id2")
  }

  /** q283 — q276's naive join with a BLOCK KEY written the natural way:
    * `blk === blk2 && bit_count(sig ⊕ sig2) ≤ 2` (the lang-blocked shape
    * every real near-dup pipeline has). Before r6, the rule stood down
    * on ANY equi-conjunct and this query silently ran the per-block
    * nested loop it exists to kill; now the rule COMPOSES — the segment
    * equality joins the user's block key — unless a side is already
    * broadcastable, where Spark's hash join on the block key wins
    * outright (the stand-down HammingRuleSpec pins). Either way the
    * engine owns the plan; the oracle is the naive blocked all-pairs.
    * Twins stay in-block by construction (10⁶ ≡ 0 mod 4).
    */
  private def q283(s: SparkSession, dir: String): DataFrame = {
    val sigs = srpBase(s, dir).select(col("vec_id"),
      (col("vec_id") % 4).as("blk"), srpSig.as("sig"))
    val y = sigs.select(col("vec_id").as("vec_id2"),
      col("blk").as("blk2"), col("sig").as("sig2"))
    sigs.join(y,
        col("blk") === col("blk2") &&
          bit_count(col("sig").bitwiseXOR(col("sig2"))) <= 2 &&
          col("vec_id") < col("vec_id2"))
      .select(col("vec_id"), col("vec_id2"), col("blk"),
        bit_count(col("sig").bitwiseXOR(col("sig2"))).as("hamming"))
      .orderBy("vec_id", "vec_id2")
  }

  // --- q299/q302: hamming anti/semi — the decontamination pair (round 8) ---

  /** q299 — signature-space DECONTAMINATION written the naive way: the
    * corpus LEFT-ANTI joined to an eval slice (every 17th signature) on
    * `bit_count(sig ⊕ esig) ≤ 2` — "keep corpus docs near NO eval doc",
    * the signature twin of q143's n-gram and q289's embedding
    * decontamination. [[graft.plans.HammingJoinBlocking]] (round 8)
    * rewrites LEFT ANTI per-left-row: row id + segment explode + anti at
    * segment grain + the all-segments-survived collapse (pigeonhole — a
    * true match claims at least one segment). The eval slice is drawn
    * from the corpus itself, so eval rows self-match at hamming 0 and
    * are always excluded; the oracle is the naive NOT EXISTS.
    */
  private def q299(s: SparkSession, dir: String): DataFrame = {
    val sigs = srpBase(s, dir).select(col("vec_id"), srpSig.as("sig"))
    val ev = sigs.filter(col("vec_id") % 17 === 0)
      .select(col("vec_id").as("eval_id"), col("sig").as("esig"))
    sigs.join(ev,
        bit_count(col("sig").bitwiseXOR(col("esig"))) <= 2, "left_anti")
      .orderBy("vec_id")
  }

  /** q302 — q299's complement: the CONTAMINATED slice via the naive
    * LEFT-SEMI spelling ("corpus docs near SOME eval doc"), rewritten by
    * the same rule through the semi collapse (one group per matched row
    * id — left-grain bag preserved). q299 ∪ q302 = corpus is the pair's
    * internal consistency; the oracle is the naive EXISTS. */
  private def q302(s: SparkSession, dir: String): DataFrame = {
    val sigs = srpBase(s, dir).select(col("vec_id"), srpSig.as("sig"))
    val ev = sigs.filter(col("vec_id") % 17 === 0)
      .select(col("vec_id").as("eval_id"), col("sig").as("esig"))
    sigs.join(ev,
        bit_count(col("sig").bitwiseXOR(col("esig"))) <= 2, "left_semi")
      .orderBy("vec_id")
  }

  /** q304 — near-dup ADJACENCY with isolated rows kept: the corpus
    * LEFT-OUTER joined to the q299 eval slice on the naive hamming
    * bound — every corpus row with ALL its eval near-dups, or one
    * null-extended row when it has none. The round-8 outer variant of
    * [[graft.plans.HammingJoinBlocking]] keeps the inner form's
    * canonical-first-match residual (matched pairs exactly once) and
    * collapses the explode through a per-row-id window match count.
    * Oracle: the naive LEFT JOIN. */
  private def q304(s: SparkSession, dir: String): DataFrame = {
    val sigs = srpBase(s, dir).select(col("vec_id"), srpSig.as("sig"))
    val ev = sigs.filter(col("vec_id") % 17 === 0)
      .select(col("vec_id").as("eval_id"), col("sig").as("esig"))
    sigs.join(ev,
        bit_count(col("sig").bitwiseXOR(col("esig"))) <= 2, "left")
      .select(col("vec_id"), col("eval_id"),
        bit_count(col("sig").bitwiseXOR(col("esig"))).as("hamming"))
      .orderBy("vec_id", "eval_id")
  }

  // --- q300/q301: band outer/anti ------------------------------------------

  private val ctxWinUs = 600000000L // 10 minutes in µs

  /** q300 — trailing view context as a naive LEFT-OUTER band join: every
    * purchase paired with ALL views (any user — deliberately no equi
    * key) in the trailing 10 minutes, unmatched purchases kept
    * null-extended. Without [[graft.plans.BandJoinBlocking]] this plans
    * as a BroadcastNestedLoopJoin at ANY scale (outer joins have no
    * hash path without equi keys); the rule's round-8 outer variant
    * fires even at gate SF (the broadcast stand-down requires an equi
    * conjunct), so the gate itself executes the rid + 2-bucket explode +
    * per-rid window collapse. Oracle: the naive LEFT JOIN.
    */
  private def q300(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        expr("ts div 1000").as("us"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event"), col("us").as("ts_p"))
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("v_event"), col("us").as("ts_v"))
    p.join(v,
        col("ts_v") <= col("ts_p") &&
          col("ts_v") >= col("ts_p") - ctxWinUs, "left")
      .select(col("p_event"), col("v_event"),
        (col("ts_p") - col("ts_v")).as("gap_us"))
      .orderBy("p_event", "v_event")
  }

  /** q301 — UNATTRIBUTED purchases: the q261 as-of COMPLEMENT written as
    * a naive LEFT-ANTI band join — purchases with NO same-user view in
    * the trailing 7 days. At gate SFs the view side broadcasts and the
    * equi+broadcastable stand-down keeps Spark's BroadcastHashJoin
    * LeftAnti (band as residual) — the q296 doctrine: the rule owns the
    * plan precisely when the input is too big for that to work, and
    * BandRuleSpec pins the forced rewrite's exact left-grain partition.
    * Oracle: the naive NOT EXISTS. */
  private def q301(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("us"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event"), col("user_id"),
        col("us").as("ts_p"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("us").as("ts_v"))
    p.join(v,
        col("user_id") === col("v_user") &&
          col("ts_v") <= col("ts_p") &&
          col("ts_v") >= col("ts_p") - asofTolUs, "left_anti")
      .orderBy("p_event")
  }

  /** The SRP signature pipeline as a DuckDB CTE chain ending in
    * `sigs(vec_id, sig)` — q276/q283's inline blocks, factored for the
    * round-8 semi/anti oracles. */
  private val srpSigsCte: String =
    s"""raw AS (
       | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |tw AS (
       | SELECT vec_id + 1000000 AS vec_id,
       |  list_concat([v[1] + 0.1], v[2:]) AS v
       | FROM raw WHERE vec_id % 25 = 0),
       |base AS (SELECT * FROM raw UNION ALL SELECT * FROM tw),
       |s AS (SELECT vec_id, v,
       |  list_max(list_transform(v, x -> abs(x)))
       |   / CAST(127.0 AS DOUBLE) AS scale FROM base),
       |qz AS (SELECT vec_id, v,
       |  list_transform(v,
       |   x -> CAST(floor(x / scale + CAST(0.5 AS DOUBLE)) AS INT)) AS qv
       | FROM s),
       |grid AS (SELECT p, d,
       |  CASE WHEN CAST('0x' || substring(md5('srp|' || p || '|' || d),
       |    1, 8) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS w
       | FROM range($srpPlanes) t1(p), range($srpDims) t2(d)),
       |pl AS (SELECT vec_id, p, sum(qv[d + 1] * w) AS dt
       | FROM qz, grid GROUP BY vec_id, p),
       |sigs AS (SELECT vec_id,
       |  CAST(sum(CASE WHEN dt >= 0 THEN 1 << p ELSE 0 END) AS INT) AS sig
       | FROM pl GROUP BY vec_id)""".stripMargin

  override val oracle: Seq[(String, String)] = Seq(
    "q299_hamming_anti_rule" ->
      s"""WITH $srpSigsCte
         |SELECT s.vec_id, s.sig FROM sigs s
         |WHERE NOT EXISTS (SELECT 1 FROM sigs e
         | WHERE e.vec_id % 17 = 0 AND bit_count(xor(s.sig, e.sig)) <= 2)
         |ORDER BY s.vec_id""".stripMargin,
    "q302_hamming_semi_rule" ->
      s"""WITH $srpSigsCte
         |SELECT s.vec_id, s.sig FROM sigs s
         |WHERE EXISTS (SELECT 1 FROM sigs e
         | WHERE e.vec_id % 17 = 0 AND bit_count(xor(s.sig, e.sig)) <= 2)
         |ORDER BY s.vec_id""".stripMargin,
    "q304_hamming_outer_rule" ->
      s"""WITH $srpSigsCte
         |SELECT s.vec_id, e.eval_id,
         | CAST(bit_count(xor(s.sig, e.sig)) AS INT) AS hamming
         |FROM sigs s LEFT JOIN
         | (SELECT vec_id AS eval_id, sig FROM sigs WHERE vec_id % 17 = 0) e
         | ON bit_count(xor(s.sig, e.sig)) <= 2
         |ORDER BY s.vec_id, e.eval_id""".stripMargin,
    "q304_hamming_outer_rule" ->
      s"""WITH $srpSigsCte
         |SELECT s.vec_id, e.eval_id,
         | CAST(bit_count(xor(s.sig, e.sig)) AS INT) AS hamming
         |FROM sigs s LEFT JOIN
         | (SELECT vec_id AS eval_id, sig FROM sigs WHERE vec_id % 17 = 0) e
         | ON bit_count(xor(s.sig, e.sig)) <= 2
         |ORDER BY s.vec_id, e.eval_id""".stripMargin,
    "q300_band_outer_rule" ->
      s"""WITH e AS (
         | SELECT event_id, event_type, epoch_us(ts) AS us FROM events),
         |p AS (SELECT event_id AS p_event, us AS ts_p
         | FROM e WHERE event_type = 'purchase'),
         |v AS (SELECT event_id AS v_event, us AS ts_v
         | FROM e WHERE event_type = 'view')
         |SELECT p.p_event, v.v_event, p.ts_p - v.ts_v AS gap_us
         |FROM p LEFT JOIN v
         | ON v.ts_v <= p.ts_p AND v.ts_v >= p.ts_p - $ctxWinUs
         |ORDER BY p.p_event, v.v_event""".stripMargin,
    "q301_band_anti_rule" ->
      s"""WITH e AS (
         | SELECT event_id, user_id, event_type, epoch_us(ts) AS us
         | FROM events),
         |p AS (SELECT event_id AS p_event, user_id, us AS ts_p
         | FROM e WHERE event_type = 'purchase'),
         |v AS (SELECT user_id AS v_user, us AS ts_v
         | FROM e WHERE event_type = 'view')
         |SELECT p.p_event, p.user_id, p.ts_p FROM p
         |WHERE NOT EXISTS (SELECT 1 FROM v
         | WHERE v.v_user = p.user_id AND v.ts_v <= p.ts_p
         |  AND v.ts_v >= p.ts_p - $asofTolUs)
         |ORDER BY p.p_event""".stripMargin,
    "q258_pmi_collocations" ->
      s"""WITH t AS (SELECT $duckToks AS tk FROM documents),
         |b AS (
         | SELECT unnest(list_transform(
         |   generate_series(1, greatest(len(tk) - 1, 0)),
         |   i -> {'w1': tk[i], 'w2': tk[i + 1]})) AS s
         | FROM t),
         |p AS (SELECT s.w1 AS w1, s.w2 AS w2,
         |  CAST(count(*) AS BIGINT) AS c12 FROM b GROUP BY 1, 2),
         |l AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM p GROUP BY 1),
         |r AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM p GROUP BY 1),
         |n AS (SELECT CAST(sum(c12) AS BIGINT) AS n_bg FROM p)
         |SELECT p.w1, p.w2, c12, c1, c2, n_bg,
         | CAST(CAST(c12 AS HUGEINT) * n_bg * 1000000
         |   // (CAST(c1 AS HUGEINT) * c2) AS BIGINT) AS pmi_micro
         |FROM p JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN n
         |WHERE c12 >= $pmiMinSupport
         |ORDER BY pmi_micro DESC, p.w1, p.w2 LIMIT 50""".stripMargin,
    "q281_grouped_probes" ->
      s"""WITH base AS (
         | SELECT source, CAST(n_chars AS HUGEINT) AS x1,
         |  CAST(len(list_distinct($duckToks)) AS HUGEINT) AS x2,
         |  CAST(len($duckToks) AS HUGEINT) AS y
         | FROM documents),
         |g AS (
         | SELECT source, CAST(count(*) AS HUGEINT) AS n,
         |  CAST(sum(x1) AS HUGEINT) AS s1, CAST(sum(x2) AS HUGEINT) AS s2,
         |  CAST(sum(y) AS HUGEINT) AS sy,
         |  CAST(sum(x1 * x1) AS HUGEINT) AS s11,
         |  CAST(sum(x1 * x2) AS HUGEINT) AS s12,
         |  CAST(sum(x2 * x2) AS HUGEINT) AS s22,
         |  CAST(sum(x1 * y) AS HUGEINT) AS s1y,
         |  CAST(sum(x2 * y) AS HUGEINT) AS s2y,
         |  CAST(sum(y * y) AS HUGEINT) AS syy
         | FROM base GROUP BY 1),
         |dd AS (
         | SELECT *,
         |  n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
         |   + s2 * (s1 * s12 - s11 * s2) AS det,
         |  sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
         |   + s2 * (s1y * s12 - s11 * s2y) AS det0,
         |  n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
         |   + s2 * (s1 * s2y - s1y * s2) AS det1,
         |  n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
         |   + sy * (s1 * s12 - s11 * s2) AS det2
         | FROM g)
         |SELECT source, CAST(n AS BIGINT) AS n,
         | CASE WHEN det <> 0 THEN
         |  round(CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE), 6) END
         |  AS beta0,
         | CASE WHEN det <> 0 THEN
         |  round(CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE), 6) END
         |  AS beta1,
         | CASE WHEN det <> 0 THEN
         |  round(CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE), 6) END
         |  AS beta2,
         | CASE WHEN det <> 0 THEN
         |  round(1.0 - (CAST(det * syy - det0 * sy - det1 * s1y
         |      - det2 * s2y AS DOUBLE) / CAST(det AS DOUBLE))
         |    / (CAST(n * syy - sy * sy AS DOUBLE) / CAST(n AS DOUBLE)), 6)
         |  END AS r2
         |FROM dd ORDER BY source""".stripMargin,
    "q266_rbo_rank_overlap" ->
      s"""WITH x AS (
         | SELECT doc_id, unnest($duckToks) AS w FROM documents),
         |tf AS (SELECT doc_id, w, count(*) AS cnt FROM x GROUP BY 1, 2),
         |idf AS (
         | SELECT w, ln(CAST((SELECT count(*) FROM documents) AS DOUBLE)
         |              / count(*)) AS idf
         | FROM tf GROUP BY w),
         |c AS (SELECT doc_id, t.w, cnt * idf AS wt
         | FROM tf t JOIN idf ON t.w = idf.w),
         |q1 AS (SELECT doc_id AS q_id, w, wt AS qwt FROM c
         |       WHERE doc_id < $rboQueryDocs),
         |s1 AS (SELECT q1.q_id, c.doc_id, round(sum(c.wt * q1.qwt), 6) AS sc
         | FROM c JOIN q1 ON c.w = q1.w
         | WHERE c.doc_id <> q1.q_id GROUP BY 1, 2),
         |r1k AS (SELECT * FROM (
         |  SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sc DESC, doc_id) AS pos1 FROM s1)
         | WHERE pos1 <= $rboK),
         |q2 AS (SELECT doc_id AS q_id, w, cnt AS qcnt FROM tf
         |       WHERE doc_id < $rboQueryDocs),
         |s2 AS (SELECT q2.q_id, t.doc_id,
         |  CAST(sum(t.cnt * q2.qcnt) AS BIGINT) AS sc
         | FROM tf t JOIN q2 ON t.w = q2.w
         | WHERE t.doc_id <> q2.q_id GROUP BY 1, 2),
         |r2k AS (SELECT * FROM (
         |  SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sc DESC, doc_id) AS pos2 FROM s2)
         | WHERE pos2 <= $rboK),
         |dd AS (SELECT unnest([1, 2, 3, 4, 5]) AS d),
         |ov AS (SELECT a.q_id, dd.d, CAST(count(*) AS BIGINT) AS ov
         | FROM r1k a JOIN r2k b
         |   ON a.q_id = b.q_id AND a.doc_id = b.doc_id, dd
         | WHERE a.pos1 <= dd.d AND b.pos2 <= dd.d GROUP BY 1, 2),
         |gd AS (SELECT q_id, d FROM (SELECT DISTINCT q_id FROM r1k), dd),
         |terms AS (SELECT gd.q_id, gd.d, COALESCE(ov.ov, 0) AS ov,
         |  CAST([1, 9, 81, 729, 6561][gd.d] AS BIGINT) AS p9,
         |  CAST([1, 10, 100, 1000, 10000][gd.d] AS BIGINT) AS p10
         | FROM gd LEFT JOIN ov ON gd.q_id = ov.q_id AND gd.d = ov.d),
         |agg AS (SELECT q_id,
         |  CAST(sum(1000000 * p9 * ov // (p10 * d)) AS BIGINT)
         |   AS rbo_micro,
         |  CAST(sum(1000000 * p9 * d // (p10 * d)) AS BIGINT)
         |   AS perfect_micro,
         |  CAST(max(CASE WHEN d = $rboK THEN ov END) AS BIGINT) AS ov_k
         | FROM terms GROUP BY 1)
         |SELECT q_id, rbo_micro, perfect_micro, ov_k,
         | CAST(rbo_micro AS DOUBLE) / perfect_micro AS agreement
         |FROM agg ORDER BY q_id""".stripMargin,
    "q265_conformal_interval" ->
      s"""WITH base AS (
         | SELECT doc_id,
         |  ${TrainingPipelinePack.duckBucket("doc_id", "conformal", 10)}
         |   AS b10,
         |  CAST(n_chars AS HUGEINT) AS x1,
         |  CAST(len(list_distinct($duckToks)) AS HUGEINT) AS x2,
         |  CAST(len($duckToks) AS HUGEINT) AS y
         | FROM documents),
         |sp AS (SELECT *, CASE WHEN b10 < 7 THEN 'train'
         |  WHEN b10 < 9 THEN 'cal' ELSE 'test' END AS split FROM base),
         |gr AS (
         | SELECT CAST(count(*) AS HUGEINT) AS n,
         |  CAST(sum(x1) AS HUGEINT) AS s1, CAST(sum(x2) AS HUGEINT) AS s2,
         |  CAST(sum(y) AS HUGEINT) AS sy,
         |  CAST(sum(x1 * x1) AS HUGEINT) AS s11,
         |  CAST(sum(x1 * x2) AS HUGEINT) AS s12,
         |  CAST(sum(x2 * x2) AS HUGEINT) AS s22,
         |  CAST(sum(x1 * y) AS HUGEINT) AS s1y,
         |  CAST(sum(x2 * y) AS HUGEINT) AS s2y
         | FROM sp WHERE split = 'train'),
         |dd AS (
         | SELECT *,
         |  n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
         |   + s2 * (s1 * s12 - s11 * s2) AS det,
         |  sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
         |   + s2 * (s1y * s12 - s11 * s2y) AS det0,
         |  n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
         |   + s2 * (s1 * s2y - s1y * s2) AS det1,
         |  n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
         |   + sy * (s1 * s12 - s11 * s2) AS det2
         | FROM gr),
         |sc AS (
         | SELECT doc_id, split,
         |  CAST((abs(det * y - (det0 + det1 * x1 + det2 * x2)) * 1000
         |    // abs(det)) AS BIGINT) AS r_milli
         | FROM sp, dd WHERE split <> 'train'),
         |cal AS (SELECT doc_id, r_milli FROM sc WHERE split = 'cal'),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
         |kk AS (SELECT n_cal,
         |  least((9 * (n_cal + 1) + 9) // 10, n_cal) AS k FROM nc),
         |rk AS (SELECT r_milli,
         |  row_number() OVER (ORDER BY r_milli, doc_id) AS rn FROM cal),
         |qq AS (SELECT rk.r_milli AS qhat_milli, kk.n_cal, kk.k
         | FROM rk, kk WHERE rk.rn = kk.k),
         |tr AS (SELECT CAST(count(*) AS BIGINT) AS n_train FROM sp
         | WHERE split = 'train')
         |SELECT tr.n_train, qq.n_cal,
         | CAST(count(*) AS BIGINT) AS n_test, qq.k, qq.qhat_milli,
         | CAST(sum(CASE WHEN t.r_milli <= qq.qhat_milli
         |   THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS coverage
         |FROM sc t, qq, tr WHERE t.split = 'test'
         |GROUP BY 1, 2, 4, 5""".stripMargin,
    "q264_multitouch_attribution" ->
      s"""WITH e AS (
         | SELECT event_id, user_id, event_type, epoch_us(ts) AS us, value
         | FROM events),
         |p AS (SELECT event_id AS p_event, user_id, us AS ts_p,
         |  CAST(round(value * 100) AS BIGINT) AS cents
         | FROM e WHERE event_type = 'purchase'),
         |t AS (SELECT event_id AS t_event, user_id, event_type AS touch,
         |  us AS ts_t
         | FROM e WHERE event_type IN ('view', 'click')),
         |cand AS (
         | SELECT p.p_event, p.cents, t.touch, t.ts_t, t.t_event
         | FROM p JOIN t ON t.user_id = p.user_id
         |  AND t.ts_t <= p.ts_p AND t.ts_t >= p.ts_p - $asofTolUs),
         |rk AS (SELECT *,
         |  row_number() OVER (PARTITION BY p_event
         |    ORDER BY ts_t, t_event) AS rf,
         |  row_number() OVER (PARTITION BY p_event
         |    ORDER BY ts_t DESC, t_event DESC) AS rl
         | FROM cand),
         |fa AS (SELECT touch, CAST(sum(cents) AS BIGINT) AS first_cents,
         |  CAST(count(*) AS BIGINT) AS n_first FROM rk WHERE rf = 1
         | GROUP BY 1),
         |la AS (SELECT touch, CAST(sum(cents) AS BIGINT) AS last_cents,
         |  CAST(count(*) AS BIGINT) AS n_last FROM rk WHERE rl = 1
         | GROUP BY 1),
         |tot AS (SELECT p_event, CAST(count(*) AS BIGINT) AS n
         | FROM cand GROUP BY 1),
         |by2 AS (SELECT p_event, cents, touch,
         |  CAST(count(*) AS BIGINT) AS cnt FROM cand GROUP BY 1, 2, 3),
         |lin AS (SELECT touch,
         |  CAST(sum(cents * 1000000 * cnt // n) AS BIGINT)
         |   AS linear_micro_cents
         | FROM by2 JOIN tot USING (p_event) GROUP BY 1)
         |SELECT touch,
         | COALESCE(first_cents, 0) AS first_cents,
         | COALESCE(n_first, 0) AS n_first,
         | COALESCE(last_cents, 0) AS last_cents,
         | COALESCE(n_last, 0) AS n_last,
         | COALESCE(linear_micro_cents, 0) AS linear_micro_cents
         |FROM fa FULL JOIN la USING (touch) FULL JOIN lin USING (touch)
         |ORDER BY touch""".stripMargin,
    "q261_asof_join" ->
      s"""WITH e AS (
         | SELECT event_id, user_id, event_type, epoch_us(ts) AS us
         | FROM events),
         |p AS (SELECT event_id AS p_event, user_id, us AS ts_p
         | FROM e WHERE event_type = 'purchase'),
         |v AS (SELECT event_id AS v_event, user_id, us AS ts_v
         | FROM e WHERE event_type = 'view'),
         |cand AS (
         | SELECT p.p_event, p.ts_p, v.v_event, v.ts_v
         | FROM p JOIN v ON v.user_id = p.user_id
         |  AND v.ts_v <= p.ts_p AND v.ts_v >= p.ts_p - $asofTolUs),
         |m AS (SELECT p_event, max(ts_v) AS ts_v FROM cand GROUP BY 1),
         |m2 AS (SELECT c.p_event, m.ts_v, max(c.v_event) AS v_event
         | FROM cand c JOIN m ON c.p_event = m.p_event AND c.ts_v = m.ts_v
         | GROUP BY 1, 2)
         |SELECT p.p_event, p.user_id, p.ts_p, m2.v_event, m2.ts_v,
         | p.ts_p - m2.ts_v AS gap_us
         |FROM p LEFT JOIN m2 ON p.p_event = m2.p_event
         |ORDER BY p.p_event""".stripMargin,
    // q296 computes q261's relation through the naive band spelling —
    // one oracle, two physical strategies (the q70/q72 pattern).
    "q296_band_join_rule" ->
      s"""WITH e AS (
         | SELECT event_id, user_id, event_type, epoch_us(ts) AS us
         | FROM events),
         |p AS (SELECT event_id AS p_event, user_id, us AS ts_p
         | FROM e WHERE event_type = 'purchase'),
         |v AS (SELECT event_id AS v_event, user_id, us AS ts_v
         | FROM e WHERE event_type = 'view'),
         |cand AS (
         | SELECT p.p_event, p.ts_p, v.v_event, v.ts_v
         | FROM p JOIN v ON v.user_id = p.user_id
         |  AND v.ts_v <= p.ts_p AND v.ts_v >= p.ts_p - $asofTolUs),
         |m AS (SELECT p_event, max(ts_v) AS ts_v FROM cand GROUP BY 1),
         |m2 AS (SELECT c.p_event, m.ts_v, max(c.v_event) AS v_event
         | FROM cand c JOIN m ON c.p_event = m.p_event AND c.ts_v = m.ts_v
         | GROUP BY 1, 2)
         |SELECT p.p_event, p.user_id, p.ts_p, m2.v_event, m2.ts_v,
         | p.ts_p - m2.ts_v AS gap_us
         |FROM p LEFT JOIN m2 ON p.p_event = m2.p_event
         |ORDER BY p.p_event""".stripMargin,
    "q276_hamming_join_rule" ->
      s"""WITH raw AS (
         | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |tw AS (
         | SELECT vec_id + 1000000 AS vec_id,
         |  list_concat([v[1] + 0.1], v[2:]) AS v
         | FROM raw WHERE vec_id % 25 = 0),
         |base AS (SELECT * FROM raw UNION ALL SELECT * FROM tw),
         |s AS (SELECT vec_id, v,
         |  list_max(list_transform(v, x -> abs(x)))
         |   / CAST(127.0 AS DOUBLE) AS scale FROM base),
         |qz AS (SELECT vec_id, v,
         |  list_transform(v,
         |   x -> CAST(floor(x / scale + CAST(0.5 AS DOUBLE)) AS INT)) AS qv
         | FROM s),
         |grid AS (SELECT p, d,
         |  CASE WHEN CAST('0x' || substring(md5('srp|' || p || '|' || d),
         |    1, 8) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS w
         | FROM range($srpPlanes) t1(p), range($srpDims) t2(d)),
         |pl AS (SELECT vec_id, p, sum(qv[d + 1] * w) AS dt
         | FROM qz, grid GROUP BY vec_id, p),
         |sigs AS (SELECT vec_id,
         |  CAST(sum(CASE WHEN dt >= 0 THEN 1 << p ELSE 0 END) AS INT) AS sig
         | FROM pl GROUP BY vec_id)
         |SELECT a.vec_id, b.vec_id AS vec_id2,
         | CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
         |FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 2
         |ORDER BY a.vec_id, vec_id2""".stripMargin,
    "q283_blocked_hamming_rule" ->
      s"""WITH raw AS (
         | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |tw AS (
         | SELECT vec_id + 1000000 AS vec_id,
         |  list_concat([v[1] + 0.1], v[2:]) AS v
         | FROM raw WHERE vec_id % 25 = 0),
         |base AS (SELECT * FROM raw UNION ALL SELECT * FROM tw),
         |s AS (SELECT vec_id, v,
         |  list_max(list_transform(v, x -> abs(x)))
         |   / CAST(127.0 AS DOUBLE) AS scale FROM base),
         |qz AS (SELECT vec_id, v,
         |  list_transform(v,
         |   x -> CAST(floor(x / scale + CAST(0.5 AS DOUBLE)) AS INT)) AS qv
         | FROM s),
         |grid AS (SELECT p, d,
         |  CASE WHEN CAST('0x' || substring(md5('srp|' || p || '|' || d),
         |    1, 8) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS w
         | FROM range($srpPlanes) t1(p), range($srpDims) t2(d)),
         |pl AS (SELECT vec_id, p, sum(qv[d + 1] * w) AS dt
         | FROM qz, grid GROUP BY vec_id, p),
         |sigs AS (SELECT vec_id, vec_id % 4 AS blk,
         |  CAST(sum(CASE WHEN dt >= 0 THEN 1 << p ELSE 0 END) AS INT) AS sig
         | FROM pl GROUP BY vec_id)
         |SELECT a.vec_id, b.vec_id AS vec_id2, a.blk AS blk,
         | CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
         |FROM sigs a JOIN sigs b
         | ON a.blk = b.blk AND a.vec_id < b.vec_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 2
         |ORDER BY a.vec_id, vec_id2""".stripMargin,
    "q260_srp_lsh_dup" ->
      s"""WITH raw AS (
         | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |tw AS (
         | SELECT vec_id + 1000000 AS vec_id,
         |  list_concat([v[1] + 0.1], v[2:]) AS v
         | FROM raw WHERE vec_id % 25 = 0),
         |base AS (SELECT * FROM raw UNION ALL SELECT * FROM tw),
         |s AS (SELECT vec_id, v,
         |  list_max(list_transform(v, x -> abs(x)))
         |   / CAST(127.0 AS DOUBLE) AS scale FROM base),
         |qz AS (SELECT vec_id, v,
         |  list_transform(v,
         |   x -> CAST(floor(x / scale + CAST(0.5 AS DOUBLE)) AS INT)) AS qv
         | FROM s),
         |grid AS (SELECT p, d,
         |  CASE WHEN CAST('0x' || substring(md5('srp|' || p || '|' || d),
         |    1, 8) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS w
         | FROM range($srpPlanes) t1(p), range($srpDims) t2(d)),
         |pl AS (SELECT vec_id, p, sum(qv[d + 1] * w) AS dt
         | FROM qz, grid GROUP BY vec_id, p),
         |sigs AS (SELECT vec_id,
         |  CAST(sum(CASE WHEN dt >= 0 THEN 1 << p ELSE 0 END) AS INT) AS sig
         | FROM pl GROUP BY vec_id),
         |cand AS (SELECT a.vec_id, b.vec_id AS vec_id2,
         |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
         | FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
         | WHERE bit_count(xor(a.sig, b.sig)) <= 2),
         |vv AS (SELECT vec_id, v,
         |  sqrt(list_dot_product(v, v)) AS nrm FROM base)
         |SELECT c.vec_id, c.vec_id2, c.hamming,
         | round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos6
         |FROM cand c JOIN vv a ON c.vec_id = a.vec_id
         | JOIN vv b ON c.vec_id2 = b.vec_id
         |WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $srpTau
         |ORDER BY c.vec_id, c.vec_id2""".stripMargin,
    "q259_linear_probe" ->
      s"""WITH base AS (
         | SELECT CAST(n_chars AS HUGEINT) AS x1,
         |  CAST(len(list_distinct($duckToks)) AS HUGEINT) AS x2,
         |  CAST(len($duckToks) AS HUGEINT) AS y
         | FROM documents),
         |g AS (
         | SELECT CAST(count(*) AS HUGEINT) AS n,
         |  CAST(sum(x1) AS HUGEINT) AS s1, CAST(sum(x2) AS HUGEINT) AS s2,
         |  CAST(sum(y) AS HUGEINT) AS sy,
         |  CAST(sum(x1 * x1) AS HUGEINT) AS s11,
         |  CAST(sum(x1 * x2) AS HUGEINT) AS s12,
         |  CAST(sum(x2 * x2) AS HUGEINT) AS s22,
         |  CAST(sum(x1 * y) AS HUGEINT) AS s1y,
         |  CAST(sum(x2 * y) AS HUGEINT) AS s2y,
         |  CAST(sum(y * y) AS HUGEINT) AS syy
         | FROM base),
         |d AS (
         | SELECT *,
         |  n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
         |   + s2 * (s1 * s12 - s11 * s2) AS det,
         |  sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
         |   + s2 * (s1y * s12 - s11 * s2y) AS det0,
         |  n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
         |   + s2 * (s1 * s2y - s1y * s2) AS det1,
         |  n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
         |   + sy * (s1 * s12 - s11 * s2) AS det2
         | FROM g)
         |SELECT CAST(n AS BIGINT) AS n,
         | CASE WHEN det <> 0 THEN
         |  round(CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE), 6) END AS beta0,
         | CASE WHEN det <> 0 THEN
         |  round(CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE), 6) END AS beta1,
         | CASE WHEN det <> 0 THEN
         |  round(CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE), 6) END AS beta2,
         | CASE WHEN det <> 0 THEN
         |  round(1.0 - (CAST(det * syy - det0 * sy - det1 * s1y
         |     - det2 * s2y AS DOUBLE) / CAST(det AS DOUBLE))
         |   / (CAST(n * syy - sy * sy AS DOUBLE) / CAST(n AS DOUBLE)), 6)
         |  END AS r2
         |FROM d""".stripMargin,
    "q334_fuzzy_join_rule" ->
      """WITH d AS (
        | SELECT doc_id, substr(text, 1, 16) AS pre FROM documents
        | WHERE source IN ('src1','src2','src3','src4','src5','src6',
        |  'src7','src8'))
        |SELECT a.doc_id, b.doc_id AS doc_id2,
        | CAST(levenshtein(a.pre, b.pre) AS INT) AS dist
        |FROM d a JOIN d b
        | ON levenshtein(a.pre, b.pre) <= 2 AND a.doc_id < b.doc_id
        |ORDER BY a.doc_id, doc_id2""".stripMargin,
    "q335_fuzzy_anti_rule" ->
      """WITH d AS (
        | SELECT doc_id, substr(text, 1, 16) AS pre FROM documents)
        |SELECT doc_id, pre FROM d c
        |WHERE doc_id % 17 <> 0 AND NOT EXISTS (
        | SELECT 1 FROM d e
        | WHERE e.doc_id % 17 = 0 AND levenshtein(c.pre, e.pre) <= 1)
        |ORDER BY doc_id""".stripMargin,
    "q338_jaccard_join_rule" ->
      s"""WITH d AS (
         | SELECT doc_id, list_distinct($duckToks) AS tk FROM documents
         | WHERE source = 'src1')
         |SELECT a.doc_id, b.doc_id AS doc_id2,
         | CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
         |  / len(list_distinct(list_concat(a.tk, b.tk))) AS jac
         |FROM d a JOIN d b ON a.doc_id < b.doc_id
         | AND len(list_intersect(a.tk, b.tk)) >=
         |  0.8 * len(list_distinct(list_concat(a.tk, b.tk)))
         |ORDER BY a.doc_id, doc_id2""".stripMargin,
    "q339_jaccard_anti_rule" ->
      s"""WITH d AS (
         | SELECT doc_id, source, list_distinct($duckToks) AS tk
         | FROM documents)
         |SELECT doc_id, CAST(len(tk) AS INT) AS n_toks FROM d c
         |WHERE doc_id % 17 <> 0 AND source IN ('src1', 'src2', 'src3')
         | AND NOT EXISTS (
         |  SELECT 1 FROM d e WHERE e.doc_id % 17 = 0 AND
         |   CAST(len(list_intersect(c.tk, e.tk)) AS DOUBLE)
         |    / nullif(len(list_distinct(list_concat(c.tk, e.tk))), 0)
         |    >= 0.8)
         |ORDER BY doc_id""".stripMargin,
    "q340_membership_join_rule" ->
      s"""WITH d AS (
         | SELECT doc_id, list_distinct($duckToks) AS tk FROM documents),
         |w AS (
         | SELECT DISTINCT ($duckToks)[1] AS word FROM documents
         | WHERE len($duckToks) > 0)
         |SELECT word, CAST(count(*) AS BIGINT) AS n_docs
         |FROM d JOIN w ON list_contains(d.tk, w.word)
         |GROUP BY word ORDER BY word""".stripMargin,
    "q341_composed_blocking" ->
      """WITH e AS (
        | SELECT event_id,
        |  CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 4)
        |    AS BIGINT) AS sig
        | FROM events WHERE event_id % 29 = 0)
        |SELECT a.event_id, b.event_id AS event_id2,
        | CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
        |FROM e a JOIN e b ON bit_count(xor(a.sig, b.sig)) <= 2
        | AND b.event_id BETWEEN a.event_id - 2000 AND a.event_id + 2000
        | AND a.event_id < b.event_id
        |ORDER BY a.event_id, event_id2""".stripMargin,
    // q342/q343 oracles replicate the CosineJoinBlocking CONTRACT
    // (original predicate ∧ 24-bit SRP sig hamming ≤ 2): md5-derived
    // ±1 hyperplanes with the srpj|graft label, per-plane sign of the
    // sequential list_dot_product — the SrpSignature parity contract.
    "q342_srp_join_rule" ->
      s"""$duckSrpjNv
         |SELECT a.vec_id, b.vec_id AS vec_id2,
         | round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos6
         |FROM nv a JOIN nv b ON a.vec_id < b.vec_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 2
         | AND list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.95
         |ORDER BY a.vec_id, vec_id2""".stripMargin,
    "q343_srp_anti_rule" ->
      s"""$duckSrpjNv
         |SELECT c.vec_id FROM nv c
         |WHERE c.vec_id < 1000000 AND NOT EXISTS (
         | SELECT 1 FROM nv e WHERE e.vec_id >= 1000000
         |  AND bit_count(xor(c.sig, e.sig)) <= 2
         |  AND list_dot_product(c.v, e.v) / (c.nrm * e.nrm) >= 0.95)
         |ORDER BY c.vec_id""".stripMargin,
    "q344_adaptive_fuzzy_rule" ->
      """WITH d AS (
        | SELECT doc_id,
        |  substr(text, 1, 8 + (doc_id % 16)) AS pre FROM documents)
        |SELECT a.doc_id, b.doc_id AS doc_id2,
        | CAST(levenshtein(a.pre, b.pre) AS INT) AS dist
        |FROM d a JOIN d b
        | ON levenshtein(a.pre, b.pre) <= least(2, length(a.pre) // 8)
        | AND a.doc_id < b.doc_id
        |ORDER BY a.doc_id, doc_id2""".stripMargin,
    "q345_cosine_band_composed" ->
      s"""$duckSrpjNv
         |SELECT a.vec_id, b.vec_id AS vec_id2,
         | round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos6
         |FROM nv a JOIN nv b
         | ON b.vec_id BETWEEN a.vec_id + 999000 AND a.vec_id + 1001000
         |WHERE bit_count(xor(a.sig, b.sig)) <= 2
         | AND list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.95
         |ORDER BY a.vec_id, vec_id2""".stripMargin,
    "q346_srp_semi_rule" ->
      s"""$duckSrpjNv
         |SELECT c.vec_id FROM nv c
         |WHERE c.vec_id < 1000000 AND EXISTS (
         | SELECT 1 FROM nv e WHERE e.vec_id >= 1000000
         |  AND bit_count(xor(c.sig, e.sig)) <= 2
         |  AND list_dot_product(c.v, e.v) / (c.nrm * e.nrm) >= 0.95)
         |ORDER BY c.vec_id""".stripMargin,
    "q347_overlap_join_rule" ->
      s"""WITH d AS (
         | SELECT doc_id, list_distinct($duckToks) AS tk FROM documents
         | WHERE source = 'src2' AND doc_id % 2 = 0)
         |SELECT a.doc_id, b.doc_id AS doc_id2,
         | CAST(len(list_intersect(a.tk, b.tk)) AS INT) AS shared
         |FROM d a JOIN d b
         | ON len(list_intersect(a.tk, b.tk)) >= 24 AND a.doc_id < b.doc_id
         |ORDER BY a.doc_id, doc_id2""".stripMargin,
    "q348_arrays_overlap_rule" ->
      s"""WITH d AS (
         | SELECT doc_id,
         |  list_distinct(list_filter($duckToks,
         |    x -> length(x) >= 10)) AS rare
         | FROM documents WHERE source IN ('src1', 'src2'))
         |SELECT a.doc_id, b.doc_id AS doc_id2,
         | CAST(len(list_intersect(a.rare, b.rare)) AS INT) AS shared
         |FROM d a JOIN d b
         | ON list_has_any(a.rare, b.rare) AND a.doc_id < b.doc_id
         |ORDER BY a.doc_id, doc_id2""".stripMargin,
    "q349_pipeline_e2e" ->
      s"""WITH toksd AS (
         | SELECT doc_id, text, $duckToks AS tk FROM documents
         | WHERE source IN ('src1', 'src2', 'src3')),
         |q AS (
         | SELECT doc_id, text, list_distinct(tk) AS dk,
         |  len(tk) AS n_toks
         | FROM toksd WHERE len(tk) >= 8 AND doc_id % 17 <> 0),
         |ex AS (
         | SELECT * FROM q
         | QUALIFY row_number()
         |  OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
         |nd AS (
         | SELECT * FROM ex c WHERE NOT EXISTS (
         |  SELECT 1 FROM ex e WHERE e.doc_id < c.doc_id
         |   AND len(list_intersect(c.dk, e.dk)) >=
         |    0.8 * len(list_distinct(list_concat(c.dk, e.dk))))),
         |dc AS (
         | SELECT * FROM nd c WHERE NOT EXISTS (
         |  SELECT 1 FROM toksd e WHERE e.doc_id % 17 = 0
         |   AND levenshtein(substr(c.text, 1, 16),
         |    substr(e.text, 1, 16)) <= 1)),
         |r AS (
         | SELECT doc_id, CAST(n_toks AS INT) AS n_toks,
         |  CAST(sum(n_toks) OVER (ORDER BY n_toks DESC, doc_id
         |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         | FROM dc)
         |SELECT doc_id, n_toks, cum FROM r WHERE cum <= 600
         |ORDER BY doc_id""".stripMargin,
    "q350_containment_join_rule" ->
      """WITH o AS (
        | SELECT l_orderkey, list_distinct(list(l_partkey)) AS parts
        | FROM lineitem GROUP BY l_orderkey),
        |a AS (
        | SELECT l_orderkey AS okey, parts AS aparts FROM o
        | WHERE l_orderkey % 20 = 0 AND len(parts) <= 3)
        |SELECT a.okey, CAST(count(*) AS BIGINT) AS n_cover,
        | min(o.l_orderkey) AS min_cover
        |FROM a JOIN o ON len(list_filter(a.aparts,
        |  x -> NOT list_contains(o.parts, x))) = 0
        | AND a.okey <> o.l_orderkey
        |GROUP BY a.okey
        |ORDER BY a.okey""".stripMargin,
    "q351_containment_semi_rule" ->
      """WITH o AS (
        | SELECT l_orderkey, list_distinct(list(l_partkey)) AS parts
        | FROM lineitem GROUP BY l_orderkey),
        |a AS (
        | SELECT l_orderkey AS okey, parts AS aparts FROM o
        | WHERE l_orderkey % 20 = 0 AND len(parts) <= 3)
        |SELECT o.l_orderkey FROM o
        |SEMI JOIN a ON len(list_filter(a.aparts,
        |  x -> NOT list_contains(o.parts, x))) = 0
        | AND a.okey <> o.l_orderkey
        |ORDER BY l_orderkey""".stripMargin,
    "q352_containment_anti_rule" ->
      """WITH o AS (
        | SELECT l_orderkey, list_distinct(list(l_partkey)) AS parts
        | FROM lineitem GROUP BY l_orderkey),
        |a AS (
        | SELECT l_orderkey AS okey, parts AS aparts FROM o
        | WHERE l_orderkey % 20 = 0 AND len(parts) <= 3),
        |lhs AS (SELECT * FROM o WHERE l_orderkey % 5 = 0),
        |r AS (
        | SELECT lhs.l_orderkey, CAST(len(lhs.parts) AS INT) AS n_parts
        | FROM lhs ANTI JOIN a ON len(list_filter(a.aparts,
        |   x -> NOT list_contains(lhs.parts, x))) = 0
        |  AND a.okey <> lhs.l_orderkey)
        |SELECT n_parts, CAST(count(*) AS BIGINT) AS n_orders,
        | min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey
        |FROM r GROUP BY n_parts
        |ORDER BY n_parts""".stripMargin,
    "q353_containment_outer_rule" ->
      """WITH o AS (
        | SELECT l_orderkey, list_distinct(list(l_partkey)) AS parts
        | FROM lineitem GROUP BY l_orderkey),
        |a AS (
        | SELECT l_orderkey AS okey, parts AS aparts FROM o
        | WHERE l_orderkey % 20 = 0 AND len(parts) <= 3)
        |SELECT a.okey, CAST(count(o.l_orderkey) AS BIGINT) AS n_cover,
        | min(o.l_orderkey) AS min_cover
        |FROM a LEFT JOIN o ON len(list_filter(a.aparts,
        |  x -> NOT list_contains(o.parts, x))) = 0
        | AND a.okey <> o.l_orderkey
        |GROUP BY a.okey
        |ORDER BY a.okey""".stripMargin,
    "q354_containment_outer_mirror" ->
      """WITH o AS (
        | SELECT l_orderkey, list_distinct(list(l_partkey)) AS parts
        | FROM lineitem GROUP BY l_orderkey),
        |a AS (
        | SELECT l_orderkey AS okey, parts AS aparts FROM o
        | WHERE l_orderkey % 20 = 0 AND len(parts) <= 3),
        |lhs AS (SELECT * FROM o WHERE l_orderkey % 5 = 0)
        |SELECT lhs.l_orderkey, CAST(count(a.okey) AS BIGINT) AS n_covered,
        | min(a.okey) AS min_covered
        |FROM lhs LEFT JOIN a ON len(list_filter(a.aparts,
        |  x -> NOT list_contains(lhs.parts, x))) = 0
        | AND a.okey <> lhs.l_orderkey
        |GROUP BY lhs.l_orderkey
        |ORDER BY lhs.l_orderkey""".stripMargin)

  /** The shared q342/q343/q345/q346 oracle PRELUDE: the q260 corpus
    * (embeddings ∪ planted twins) with 24-bit SRP signatures and norms
    * as `nv(vec_id, v, sig, nrm)` — every SRP-rule oracle opens with
    * `WITH $duckSrpjNv, …` so the contract's sig math lives in exactly
    * one SQL string. */
  private def duckSrpjNv: String =
    s"""WITH raw AS (
       | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |tw AS (
       | SELECT vec_id + 1000000 AS vec_id,
       |  list_concat([v[1] + 0.1], v[2:]) AS v
       | FROM raw WHERE vec_id % 25 = 0),
       |base AS (SELECT * FROM raw UNION ALL SELECT * FROM tw),
       |$duckSrpjSigs,
       |nv AS (SELECT b.vec_id, b.v, g.sig,
       |  sqrt(list_dot_product(b.v, b.v)) AS nrm
       | FROM base b JOIN sigs g ON b.vec_id = g.vec_id)""".stripMargin

  /** The 24-bit SRP signature CTE over a relation
    * `base(vec_id, v DOUBLE[])` — the DuckDB twin of
    * [[graft.functions.SrpSignature]] at seed `graft`. */
  private def duckSrpjSigs: String =
    """sigs AS (SELECT vec_id,
      |  bit_or(CASE WHEN list_dot_product(v,
      |    list_transform(range(len(v)), d ->
      |      CASE WHEN CAST('0x' ||
      |          substring(md5('srpj|graft|' || p || '|' || d),
      |            1, 8) AS BIGINT) % 2 = 0
      |        THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)) >= 0
      |    THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END) AS sig
      | FROM base, range(24) t(p) GROUP BY vec_id)""".stripMargin
}
