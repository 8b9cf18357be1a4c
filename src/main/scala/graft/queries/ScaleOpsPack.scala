package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.Tables

/** Scale-technique operators made first-class queries: Bloom-filtered join
  * reduction (the runtime-filter pattern), incremental maintenance of a
  * JOIN view (delta processing beyond q129's aggregate maintenance), and a
  * histogram-vs-exact quantile accuracy audit (what an equi-width sketch
  * costs against the q226 sort-based truth). Each query both PERFORMS the
  * technique and reports its contract sheet — reduction ratios, mismatch
  * counts, error profiles — because at 100 TB the technique's bookkeeping
  * is what tells an operator it is safe to rely on.
  *
  * Exactness doctrine unchanged: md5 hashing for anything pseudo-random,
  * integer e4/cents units for money, rank selection (never interpolation)
  * for quantiles, and every derived double built by the identical op
  * sequence in both engines.
  */
object ScaleOpsPack extends QueryPack {

  import TrainingPipelinePack.md5Hash32

  private val BloomM = 8192
  private val BloomK = 3
  private val HotCut = 400000.0

  /** TPC-H revenue in exact 10⁻⁴-dollar units (the TpchShapesPack grain). */
  private def revE4: Column =
    round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)
      .cast("long")

  // --- q234: Bloom-filtered join -------------------------------------------

  /** q234 — Bloom-filtered join (the runtime-filter / semi-join-reduction
    * technique Spark's own `spark.sql.optimizer.runtimeFilter` family
    * automates): the hot-order key set (totalprice > 400k) compresses into
    * an m=8192, k=3 Bloom filter whose SET-BIT POSITIONS are a ≤8192-row
    * broadcast table; lineitem probes it with three successive broadcast
    * joins (one per hash — map-side, no fact shuffle, no fact-grain
    * re-aggregation) and only surviving rows reach the exact join against
    * the hot dimension. The ledger reports what the filter bought: fact
    * rows in, rows past the filter, rows the exact join kept, the
    * false-positive rows the filter let through, and the revenue of the
    * joined slice — at 100 TB this is the difference between shuffling
    * the full fact table and shuffling ~membership·(1+fp) of it (here the
    * exact join side broadcasts too; the filter still models the fact-
    * stream reduction that matters when neither side broadcasts).
    */
  private def q234(s: SparkSession, dir: String): DataFrame = {
    val hot = Tables.load(s, dir, "orders")
      .filter(col("o_totalprice") > HotCut)
      .select(col("o_orderkey"))
    def pos(key: Column, j: Int): Column =
      md5Hash32(key, s"bj$j") % BloomM
    val bits = hot
      .select(explode(array((0 until BloomK).map(j =>
        pos(col("o_orderkey"), j)): _*)).as("p"))
      .distinct()
    val fact = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), revE4.as("rev_e4"))
    val probed = (0 until BloomK).foldLeft(fact) { (df, j) =>
      df.join(
        broadcast(bits.select(col("p").as(s"p$j"),
          lit(1).as(s"hit$j"))),
        pos(col("l_orderkey"), j) === col(s"p$j"), "left")
        .drop(s"p$j")
    }
    val passed = probed
      .withColumn("pass",
        (0 until BloomK).map(j => coalesce(col(s"hit$j"), lit(0)))
          .reduce(_ + _) === BloomK)
    // The whole ledger (fact count, filter survivors, exact-join keeps,
    // false passes, revenue) is ONE conditional aggregation over the
    // probed stream: `pass` rides inside the exact join's condition so
    // non-survivors skip the probe but stay countable, and no count
    // re-derives the md5 probe chain on a fresh lineitem scan (the
    // pack's scan-bandwidth doctrine — q231 persists its base for the
    // same reason).
    passed
      .join(broadcast(hot.withColumn("is_hot", lit(1))),
        col("pass") && col("l_orderkey") === col("o_orderkey"), "left")
      .agg(count(lit(1)).as("n_fact"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
        sum(when(col("pass") && col("is_hot") === 1, 1L).otherwise(0L))
          .as("n_joined"),
        sum(when(col("pass") && col("is_hot").isNull, 1L).otherwise(0L))
          .as("n_false_pass"),
        sum(when(col("pass") && col("is_hot") === 1, col("rev_e4")))
          .as("joined_e4"))
      .select(col("n_fact"), col("n_pass"), col("n_joined"),
        col("n_false_pass"),
        (lit(1.0) - col("n_pass").cast("double") / col("n_fact"))
          .as("reduction"),
        (col("joined_e4") / lit(10000.0)).as("joined_revenue"))
  }

  // --- q235: incremental join-view maintenance -----------------------------

  /** q235 — incremental maintenance of a JOIN view (q129 maintains a
    * single-table aggregate; real gold tables join first): the
    * revenue-per-customer view over orders⋈lineitem, maintained by
    * processing only the 2001 order delta (`ΔV = Δorders ⋈ lineitem`,
    * aggregated and merged into the base view by full-outer coalesce-sum)
    * and audited cell-exactly against the direct recompute over all
    * orders. Money rides exact e4 units so "maintained ≡ recomputed" is
    * an integer equality, not a tolerance. The delta join touches only
    * delta-order lineitems; the merge shuffles view-grain rows — the two
    * properties that make maintenance cheaper than recompute at scale.
    */
  private def q235(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), revE4.as("rev_e4"))
    val cut = to_timestamp(lit("2001-01-01"))
    def view(orders: DataFrame): DataFrame = orders
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_custkey")
      .agg(sum("rev_e4").as("rev_e4"), count(lit(1)).as("n_items"))
    val orders = Tables.load(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val vBase = view(orders.filter(col("o_orderdate") < cut))
      .withColumnRenamed("rev_e4", "b_rev").withColumnRenamed("n_items", "b_n")
    val vDelta = view(orders.filter(col("o_orderdate") >= cut))
      .withColumnRenamed("rev_e4", "d_rev").withColumnRenamed("n_items", "d_n")
    val merged = vBase.join(vDelta, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        (coalesce(col("b_rev"), lit(0L)) + coalesce(col("d_rev"), lit(0L)))
          .as("m_rev"),
        (coalesce(col("b_n"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
          .as("m_n"))
    val direct = view(orders)
    merged.join(direct, Seq("o_custkey"), "full_outer")
      .agg(count(lit(1)).as("n_view_rows"),
        sum(when(col("m_rev") <=> col("rev_e4") &&
          col("m_n") <=> col("n_items"), 0L).otherwise(1L))
          .as("n_mismatch"),
        sum("m_rev").as("m_rev_e4"), sum("rev_e4").as("d_rev_e4"))
      .select(col("n_view_rows"), col("n_mismatch"),
        (col("m_rev_e4") / lit(10000.0)).as("maintained_revenue"),
        (col("d_rev_e4") / lit(10000.0)).as("direct_revenue"))
  }

  // --- q236: histogram quantile accuracy audit -----------------------------

  /** q236 — what an equi-width histogram sketch costs against exact
    * quantiles: document lengths bucket into 64 equal-width bins
    * (integer `((x−lo)·64) div span`); each decile's histogram answer is
    * the LOWER EDGE of the first bin whose cumulative count reaches the
    * target rank, compared against the exact rank-selected value (the
    * q226 machinery, global axis). Everything is integer arithmetic —
    * bin ids, cumulative counts, edge values, errors — so the audit is
    * bit-deterministic. The histogram is one partial-agg shuffle of ≤64
    * groups however large the corpus; the exact side pays a full rank —
    * the exact distributed row_number ([[graft.functions.DistRank]],
    * r6: range shuffle + per-slice rank, no single-task window), so
    * even the audit arm survives corpus growth. The audit quantifies
    * exactly that sketch-vs-rank trade.
    */
  private def q236(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val stats = docs.agg(min("n_chars").as("lo"), max("n_chars").as("hi"),
      count(lit(1)).as("n"))
    val binned = docs.crossJoin(broadcast(stats))
      .select(col("n_chars"), col("lo"), col("hi"), col("n"),
        call_function("div", (col("n_chars") - col("lo")) * 64,
          col("hi") - col("lo") + 1).as("bin"))
    val cum = binned.groupBy("bin", "lo", "hi", "n")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(
        Window.orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val targets = stats
      .select(explode(sequence(lit(1), lit(10))).as("decile"), col("n"))
      .select(col("decile"),
        ceil(col("decile") * col("n") / lit(10.0)).cast("long").as("rank"))
    val approx = targets.join(broadcast(cum), col("cum") >= col("rank"))
      .groupBy("decile", "rank")
      .agg(min(col("lo") + call_function("div",
        col("bin") * (col("hi") - col("lo") + 1), lit(64L))).as("approx_edge"))
    val exact = graft.functions.DistRank
      .withRowNumber(docs, "rn", col("n_chars"), col("doc_id"))
      .join(broadcast(targets.withColumnRenamed("rank", "rn2")),
        col("rn") === col("rn2"))
      .select(col("decile").as("d2"), col("n_chars").as("exact_edge"))
    approx.join(broadcast(exact), col("decile") === col("d2"))
      .select(col("decile").cast("int").as("decile"), col("rank"),
        col("exact_edge"), col("approx_edge"),
        (col("approx_edge") - col("exact_edge")).as("err"))
      .orderBy("decile")
  }

  // --- q237: offline policy evaluation (IPS) -------------------------------

  /** q237 — inverse-propensity-scored offline policy evaluation (the
    * logged-bandit replay a recommender team runs before an online test):
    * the event log is the behavior policy (action = event type, context =
    * user, reward = event value in exact cents); the target policy is
    * uniform over the K global action types. Behavior propensities are the
    * per-(user, action) empirical frequencies — so the IPS weight is the
    * exact rational `cnt(u) / (K·cnt(u,a))` built from integers, applied
    * per row in one double op sequence. The estimate and the effective
    * sample size (Kish `(Σw)²/Σw²`) are multi-row double sums → rounded
    * to 2dp per the float-parity doctrine. Two shrinking aggregations
    * (user grain, user×action grain) rejoin the log once.
    */
  private def q237(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_type").as("a"),
        round(col("value") * 100).cast("long").as("r_cents"))
    val k = ev.select(countDistinct("a").as("k"))
    val perUser = ev.groupBy("user_id").agg(count(lit(1)).as("n_u"))
    val perUA = ev.groupBy("user_id", "a").agg(count(lit(1)).as("n_ua"))
    val w = col("n_u").cast("double") / (col("k") * col("n_ua"))
    ev.join(perUA, Seq("user_id", "a"))
      .join(perUser, Seq("user_id"))
      .crossJoin(broadcast(k))
      .select(col("r_cents"), w.as("w"))
      .agg(count(lit(1)).as("n"),
        sum("r_cents").as("sum_r"),
        sum(col("w") * col("r_cents")).as("swr"),
        sum("w").as("sw"), sum(col("w") * col("w")).as("sww"))
      .crossJoin(broadcast(k))
      .select(col("n"), col("k").cast("long").as("k_actions"),
        (col("sum_r").cast("double") / col("n") / 100.0)
          .as("behavior_value"),
        round(col("swr") / col("n") / 100.0, 2).as("ips_value"),
        round(col("sw") * col("sw") / col("sww"), 2).as("ess"))
  }

  // --- q238: SCD2 point-in-time join ---------------------------------------

  /** q238 — point-in-time correct dimension join: every lineitem resolves
    * the customer's order-priority VERSION that was valid on its ship
    * date, against the q77 SCD2 history ([[graft.etl.Lakehouse
    * .scd2History]] — the same canonical builder). This is the lookup an
    * ML feature store must get right (training-serving skew is exactly
    * "joined the current row instead of the as-of row"). The join is
    * equi on custkey + range on [valid_from, valid_to) — Spark plans the
    * equi key as the shuffle key and the range as a residual filter, so
    * it scales like any fact-dim join. A fact dated before the
    * customer's first version (the testdata ships some lineitems before
    * their order date) resolves to NO version — the LEFT join surfaces
    * those in an explicit '(none)' bucket instead of silently dropping
    * them, which is the feature-store contract (a missing as-of row is
    * information, not a join artifact). Output: per resolved priority
    * version, items / revenue / distinct customers.
    */
  private def q238(s: SparkSession, dir: String): DataFrame = {
    val hist = graft.etl.Lakehouse.scd2History(
      Tables.load(s, dir, "orders"), "o_custkey", "o_orderpriority",
      to_date(col("o_orderdate")), col("o_orderkey"))
      .select(col("o_custkey").as("h_cust"),
        col("o_orderpriority").as("pit_priority"),
        col("valid_from"), col("valid_to"))
    val facts = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), revE4.as("rev_e4"),
        to_date(col("l_shipdate")).as("ship_d"))
      .join(Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
    facts.join(hist,
      col("o_custkey") === col("h_cust") &&
        col("ship_d") >= col("valid_from") &&
        (col("valid_to").isNull || col("ship_d") < col("valid_to")),
      "left")
      .groupBy(coalesce(col("pit_priority"), lit("(none)"))
        .as("pit_priority"))
      .agg(count(lit(1)).as("n_items"),
        countDistinct("o_custkey").as("n_customers"),
        sum("rev_e4").as("rev_e4"))
      .select(col("pit_priority"), col("n_items"), col("n_customers"),
        (col("rev_e4") / lit(10000.0)).as("revenue"))
      .orderBy("pit_priority")
  }

  // --- q239: Holt walk-forward backtest ------------------------------------

  /** q239 — walk-forward backtest of the q196 Holt smoother: replay each
    * priority's daily-revenue series, score every one-step-ahead forecast
    * against the next actual BEFORE folding it in, and report the mean
    * absolute error — the honest "would this forecast have worked"
    * readout, distinct from q196's in-sample fit. Same in-row fold, one
    * extra state slot accumulating |actual − (l+t)|; the fold is a
    * single ordered sequence, so even the double error sum is
    * bit-deterministic across engines (no multi-partition accumulation
    * anywhere). Errors start at the second day (the seed state has
    * nothing to forecast with).
    */
  private def q239(s: SparkSession, dir: String): DataFrame = {
    def step(acc: Column, x: Column): Column = {
      def fc = element_at(acc, 2) + element_at(acc, 3)
      def lvl = lit(0.3) * element_at(x, 1) + lit(0.7) * fc
      array(element_at(x, 1), lvl,
        lit(0.2) * (lvl - element_at(acc, 2)) +
          lit(0.8) * element_at(acc, 3),
        element_at(acc, 4) + abs(element_at(x, 1) - fc))
    }
    Tables.load(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority"),
        col("o_orderdate").as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .groupBy("priority")
      .agg(sort_array(collect_list(struct(col("d"),
        (col("cents") / 100.0).as("r")))).as("srt"))
      .select(col("priority"),
        transform(col("srt"), e =>
          array(e.getField("r"), e.getField("r"), lit(0.0), lit(0.0)))
          .as("xs"))
      .select(col("priority"), size(col("xs")).as("n_days"),
        aggregate(slice(col("xs"), lit(2), size(col("xs")) - 1),
          element_at(col("xs"), 1), step).as("h"))
      .select(col("priority"), col("n_days"),
        round(element_at(col("h"), 4) / (col("n_days") - 1), 6)
          .as("mae"),
        round(element_at(col("h"), 2) + element_at(col("h"), 3), 6)
          .as("forecast_next"))
      .orderBy("priority")
  }

  // --- q240: join cardinality estimation audit -----------------------------

  /** q240 — join-size estimation audit (why AQE exists, as a query): the
    * self-join cardinality of events on user_id is EXACTLY Σc(u)² — one
    * count-per-key aggregation, never the join itself — compared against
    * the two estimates an optimizer would use: the uniformity assumption
    * `n²/ndv` (classic System-R) and the heavy-hitter-aware form (top-10
    * keys exact + uniform remainder). Every quantity is exact integer
    * arithmetic (`div` for the uniform splits); the error ratios are the
    * only doubles. On a skewed key the uniform estimate collapses and the
    * top-k histogram recovers most of it — the audit quantifies by how
    * much, which is the number a planner needs before choosing broadcast
    * vs shuffle vs skew-split.
    */
  private def q240(s: SparkSession, dir: String): DataFrame = {
    val cnts = Tables.load(s, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("c"))
    val tot = cnts.agg(sum("c").as("n"), count(lit(1)).as("ndv"),
      sum(col("c") * col("c")).as("actual_pairs"))
    // top-10 via sort+limit = TakeOrderedAndProject (per-partition heads
    // + driver merge), never a global window over the ndv-grain counts
    val top = cnts
      .orderBy(col("c").desc, col("user_id")).limit(10)
      .agg(sum(col("c") * col("c")).as("top_sq"), sum("c").as("top_n"),
        count(lit(1)).as("top_k"))
    tot.crossJoin(broadcast(top))
      .select(col("n"), col("ndv"), col("actual_pairs"),
        call_function("div", col("n") * col("n"), col("ndv"))
          .as("est_uniform"),
        (col("top_sq") + when(col("ndv") > col("top_k"),
          call_function("div",
            (col("n") - col("top_n")) * (col("n") - col("top_n")),
            col("ndv") - col("top_k"))).otherwise(lit(0L)))
          .as("est_topk"))
      .select(col("n"), col("ndv"), col("actual_pairs"),
        col("est_uniform"), col("est_topk"),
        (col("est_uniform").cast("double") / col("actual_pairs"))
          .as("uniform_ratio"),
        (col("est_topk").cast("double") / col("actual_pairs"))
          .as("topk_ratio"))
  }

  // --- q241: per-dimension embedding quantile profile -----------------------

  /** q241 — per-dimension decile profile of the embedding matrix (the
    * table a feature pipeline materializes to drive quantile
    * normalization / clipping at serving time): for each of the 64
    * dimensions, the ten rank-selected decile edges. Pure SELECTION — the
    * float values are never arithmetic operands, so cross-engine parity
    * is byte-exact (FLOAT→DOUBLE widening is lossless in both engines).
    * One explode + one sort-based window per dim partition + the q226
    * rank-grid join; dims are a fixed small domain, so the output is
    * 640 rows at any corpus size.
    */
  private def q241(s: SparkSession, dir: String): DataFrame = {
    val vals = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding"))
        .as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim"), col("v").cast("double").as("v"))
    val ranked = vals.withColumn("rn", row_number().over(
      Window.partitionBy("dim").orderBy(col("v"), col("vec_id"))))
    val targets = vals.groupBy("dim").agg(count(lit(1)).as("n"))
      .select(col("dim"), explode(sequence(lit(1), lit(10))).as("decile"),
        col("n"))
      .withColumn("rn", ceil(col("decile") * col("n") / lit(10.0))
        .cast("int"))
    ranked.join(broadcast(targets), Seq("dim", "rn"))
      .select(col("dim"), col("decile"), col("v").as("edge"))
      .orderBy("dim", "decile")
  }

  // --- q242: rendezvous-hash resharding audit --------------------------------

  /** q242 — shard-count change audit: when a corpus grows from 8 to 10
    * shards, what fraction of documents MOVE under (a) mod-N assignment
    * (almost everything: only keys with md5 ≡ same value mod lcm stay)
    * vs (b) rendezvous/HRW hashing (argmax over per-shard salted hashes —
    * only docs whose new-shard hash wins move, ≈ 2/10). Minimal movement
    * is why consistent schemes exist; the audit MEASURES it on the real
    * id space with the same md5 machinery as every other assignment in
    * this library. Explode-by-shard is ≤10 rows per doc; both owners
    * reduce in one aggregation each.
    */
  private def q242(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents").select("doc_id")
    def rdvOwner(n: Int, out: String): DataFrame = docs
      .select(col("doc_id"), explode(sequence(lit(0), lit(n - 1))).as("sh"))
      .select(col("doc_id"), col("sh"),
        md5Hash32(concat(col("doc_id").cast("string"), lit("#"),
          col("sh").cast("string")), "rdv").as("h"))
      .groupBy("doc_id")
      .agg(max(struct(col("h"), col("sh"))).getField("sh").as(out))
    val h = md5Hash32(col("doc_id"), "shard")
    val mod = docs.select(col("doc_id"), (h % 8).as("m8"), (h % 10).as("m10"))
    mod.join(rdvOwner(8, "r8"), "doc_id")
      .join(rdvOwner(10, "r10"), "doc_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("m8") =!= col("m10"), 1L).otherwise(0L))
          .as("moved_mod"),
        sum(when(col("r8") =!= col("r10"), 1L).otherwise(0L))
          .as("moved_rdv"))
      .select(col("n_docs"), col("moved_mod"), col("moved_rdv"),
        (col("moved_mod").cast("double") / col("n_docs"))
          .as("mod_move_frac"),
        (col("moved_rdv").cast("double") / col("n_docs"))
          .as("rdv_move_frac"))
  }

  // --- q243: bloom-accelerated decontamination ------------------------------

  /** q243 — the q234 runtime-filter pattern applied to the LLM-pipeline
    * op where it matters most: eval-set decontamination. q143 broadcasts
    * the eval suite's distinct 8-grams and semi-joins — fine while the
    * suite is small; when the union of benchmarks outgrows the broadcast
    * budget, the practical fix is a BLOOM of the eval grams (m=65536,
    * k=3 — the bit-position table stays broadcastable no matter how
    * many grams hashed into it) pre-filtering the exploded corpus gram
    * stream so only bloom-passing grams reach the exact check. The
    * ledger proves the contract: zero bloom-missed true hits (no false
    * negatives, reported as a column the spec pins to 0), the
    * false-pass overhead the k/m choice costs, and a contaminated-doc
    * count that must equal q143's exact answer.
    */
  private def q243(s: SparkSession, dir: String): DataFrame = {
    val m = 65536
    def grams8(text: Column): Column = {
      val tk = TextOps.toks(text)
      when(size(tk) >= 8,
        transform(sequence(lit(1), size(tk) - 7),
          i => concat_ws(" ", slice(tk, i, lit(8)))))
        .otherwise(array())
    }
    def pos(g: Column, j: Int): Column = md5Hash32(g, s"dc$j") % m
    val docs = Tables.loadParallel(s, dir, "documents")
    val evalGrams = docs.filter(col("source") === "src0")
      .select(explode(grams8(col("text"))).as("gram")).distinct()
    val bits = evalGrams
      .select(explode(array((0 until BloomK).map(j =>
        pos(col("gram"), j)): _*)).as("p"))
      .distinct()
    val exploded = docs.filter(col("source") =!= "src0")
      .select(col("doc_id"), explode(grams8(col("text"))).as("gram"))
    val probed = (0 until BloomK).foldLeft(exploded) { (df, j) =>
      df.join(broadcast(bits.select(col("p").as(s"p$j"),
        lit(1).as(s"hit$j"))),
        pos(col("gram"), j) === col(s"p$j"), "left")
        .drop(s"p$j")
    }.withColumn("pass",
      (0 until BloomK).map(j => coalesce(col(s"hit$j"), lit(0)))
        .reduce(_ + _) === BloomK)
    probed
      .join(broadcast(evalGrams.withColumn("ex", lit(1))),
        Seq("gram"), "left")
      .agg(count(lit(1)).as("n_train_grams"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_bloom_pass"),
        sum(when(col("ex") === 1, 1L).otherwise(0L)).as("n_exact_hits"),
        sum(when(col("pass") && col("ex").isNull, 1L).otherwise(0L))
          .as("n_false_pass"),
        sum(when(col("ex") === 1 && !col("pass"), 1L).otherwise(0L))
          .as("n_bloom_missed"),
        countDistinct(when(col("ex") === 1, col("doc_id")))
          .as("n_contaminated_docs"))
      .withColumn("bloom_selectivity",
        col("n_bloom_pass").cast("double") / col("n_train_grams"))
  }

  // --- q244: per-group OLS trend -------------------------------------------

  /** q244 — per-priority linear trend of daily revenue by EXPLICIT
    * least-squares sums (the q185 Zipf doctrine: never `regr_*`
    * aggregates, whose accumulation schemes differ across engines): x =
    * days since the global first order, y = exact daily cents; n, Σx,
    * Σy, Σxy, Σx² are exact longs (x is calendar-scaled, so the raw
    * sums stay inside 2⁶³), but the normal-equation PRODUCTS n·Σxy,
    * Σx·Σy grow with the cents and cross 2⁶³ near sf1, so the
    * num/den algebra and Σy² ride exact DECIMAL(38,0); slope /
    * intercept / r² are built from them in one identical double
    * sequence. Complements q196/q239 (model-based smoothing) with the
    * closed-form trend a reporting layer wants. One reduce to the
    * day grain, one to the 5-row group grain.
    */
  private def q244(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(s, dir, "orders")
    val d0 = orders.agg(min(to_date(col("o_orderdate"))).as("d0"))
    val daily = orders
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .crossJoin(broadcast(d0))
      .select(col("priority"), datediff(col("d"), col("d0"))
        .cast("long").as("x"), col("y"))
    // x-scaled sums stay exact longs (x is calendar-bounded, so n·Σxy ≪
    // 2⁶³ even when cents grow); Σy² is cents² — the SUM overflows long
    // at sf0.1 already and each per-term y² wraps silently (non-ANSI
    // int64) once daily cents pass ~3.0e9, so BOTH the multiply and the
    // sum ride exact DECIMAL(38,0) (HUGEINT·HUGEINT on the DuckDB side,
    // the q205 pattern) and enter the r² denominator through one
    // identical double sequence.
    val dy = col("y").cast("decimal(38,0)")
    val sums = daily.groupBy("priority").agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(dy * dy).as("syy"))
    // num/den algebra rides DECIMAL(38,0) too: n·Σxy and Σx·Σy are
    // ~2e19 at sf1 (Σxy grows with the cents even though x is
    // calendar-bounded) — past 2⁶³, where ANSI long multiply throws.
    // DuckDB never overflowed only because its sum(BIGINT) is already
    // HUGEINT; the exact integers cast to the same double either way,
    // so the sf0.01 hash is unchanged. (Caught by the r11 sf1 oracle
    // gate — the scaladoc previously CLAIMED nΣxy ≪ 2⁶³ at any size.)
    def dec(c: Column) = c.cast("decimal(38,0)")
    val num = (dec(col("n")) * dec(col("sxy"))
      - dec(col("sx")) * dec(col("sy"))).cast("double")
    val den = (dec(col("n")) * dec(col("sxx"))
      - dec(col("sx")) * dec(col("sx"))).cast("double")
    val deny = col("n").cast("double") * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    sums.select(col("priority"), col("n").as("n_days"),
      (num / den).as("slope_cents_per_day"),
      ((col("sy").cast("double") - num / den * col("sx")) / col("n"))
        .as("intercept_cents"),
      (num * num / (den * deny)).as("r2"))
      .orderBy("priority")
  }

  // --- q245: funnel conversion with Wilson intervals -----------------------

  /** q245 — funnel step conversion rates with Wilson 95% score intervals:
    * per step (view→click, click→purchase) the k/n conversion plus the
    * interval bounds — the uncertainty a product team needs before
    * reading a step change as real. k and n come exact from the q199
    * funnel levels; the Wilson center/half-width runs in ONE fixed
    * double sequence (z = 1.96; sqrt is IEEE-correctly-rounded in both
    * engines — the q195 doctrine — so no rounding is needed anywhere).
    */
  private def q245(s: SparkSession, dir: String): DataFrame = {
    val levels = ExperimentsPack
      .funnelState(Tables.load(s, dir, "events"), 604800000000L)
      .agg(
        sum(when(col("level") >= 1, 1L).otherwise(0L)).as("l1"),
        sum(when(col("level") >= 2, 1L).otherwise(0L)).as("l2"),
        sum(when(col("level") >= 3, 1L).otherwise(0L)).as("l3"))
    val steps = levels.select(explode(array(
      struct(lit("view_to_click").as("step"), col("l1").as("n"),
        col("l2").as("k")),
      struct(lit("click_to_purchase").as("step"), col("l2").as("n"),
        col("l3").as("k")))).as("s"))
      .select(col("s.step").as("step"), col("s.n").as("n"),
        col("s.k").as("k"))
    val z = lit(1.96)
    val p = col("k").cast("double") / col("n")
    val zz = z * z
    val denom = lit(1.0) + zz / col("n")
    val center = (p + zz / (lit(2.0) * col("n"))) / denom
    val half = z * sqrt(p * (lit(1.0) - p) / col("n") +
      zz / (lit(4.0) * col("n") * col("n"))) / denom
    steps.select(col("step"), col("n"), col("k"), p.as("rate"),
      (center - half).as("wilson_lo"), (center + half).as("wilson_hi"))
      .orderBy("step")
  }

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] =
    Seq(
      "q244_ols_trend" -> q244 _,
      "q245_wilson_funnel" -> q245 _,
      "q243_bloom_decontam" -> q243 _,
      "q241_embedding_quantiles" -> q241 _,
      "q242_rendezvous_reshard" -> q242 _,
      "q234_bloom_join" -> q234 _,
      "q235_ivm_join" -> q235 _,
      "q236_histogram_quantiles" -> q236 _,
      "q237_ips_policy_eval" -> q237 _,
      "q238_scd2_pit_join" -> q238 _,
      "q239_holt_backtest" -> q239 _,
      "q240_join_card_estimate" -> q240 _)

  override val oracle: Seq[(String, String)] = Seq(
    "q244_ols_trend" ->
      """WITH d0 AS (
        | SELECT min(CAST(o_orderdate AS DATE)) AS d0 FROM orders),
        |daily AS (
        | SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE)
        |   AS d,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
        | FROM orders GROUP BY 1, 2),
        |xy AS (
        | SELECT priority,
        |  CAST(date_diff('day', d0.d0, d) AS BIGINT) AS x, y
        | FROM daily, d0),
        |sums AS (
        | SELECT priority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |  CAST(sum(x * y) AS BIGINT) AS sxy,
        |  CAST(sum(x * x) AS BIGINT) AS sxx,
        |  sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
        | FROM xy GROUP BY priority)
        |SELECT priority, n AS n_days,
        | CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |     AS DOUBLE)
        |   / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
        |     AS DOUBLE) AS slope_cents_per_day,
        | (CAST(sy AS DOUBLE)
        |   - CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |       AS DOUBLE)
        |     / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
        |       AS DOUBLE) * sx) / n
        |   AS intercept_cents,
        | CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |     AS DOUBLE)
        |   * CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |     AS DOUBLE)
        |   / (CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
        |       AS DOUBLE)
        |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2
        |FROM sums ORDER BY priority""".stripMargin,
    "q245_wilson_funnel" ->
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
        |lv AS (
        | SELECT
        |  CAST(sum(CASE WHEN f[3] < 9223372036854775807
        |    THEN 1 ELSE 0 END) AS BIGINT) AS l1,
        |  CAST(sum(CASE WHEN f[4] < 9223372036854775807
        |    THEN 1 ELSE 0 END) AS BIGINT) AS l2,
        |  CAST(sum(CASE WHEN f[5] < 9223372036854775807
        |    THEN 1 ELSE 0 END) AS BIGINT) AS l3
        | FROM folded),
        |steps AS (
        | SELECT 'view_to_click' AS step, l1 AS n, l2 AS k FROM lv
        | UNION ALL
        | SELECT 'click_to_purchase', l2, l3 FROM lv)
        |SELECT step, n, k,
        | CAST(k AS DOUBLE) / n AS rate,
        | (CAST(k AS DOUBLE) / n + (1.96 * 1.96) / (2.0 * n))
        |    / (1.0 + (1.96 * 1.96) / n)
        |  - 1.96 * sqrt(CAST(k AS DOUBLE) / n
        |      * (1.0 - CAST(k AS DOUBLE) / n) / n
        |      + (1.96 * 1.96) / (4.0 * n * n))
        |    / (1.0 + (1.96 * 1.96) / n) AS wilson_lo,
        | (CAST(k AS DOUBLE) / n + (1.96 * 1.96) / (2.0 * n))
        |    / (1.0 + (1.96 * 1.96) / n)
        |  + 1.96 * sqrt(CAST(k AS DOUBLE) / n
        |      * (1.0 - CAST(k AS DOUBLE) / n) / n
        |      + (1.96 * 1.96) / (4.0 * n * n))
        |    / (1.0 + (1.96 * 1.96) / n) AS wilson_hi
        |FROM steps ORDER BY step""".stripMargin,
    "q243_bloom_decontam" -> {
      def h(j: Int): String =
        s"CAST('0x' || substring(md5('dc$j|' || gram), 1, 8) AS BIGINT) % 65536"
      def hq(j: Int): String =
        s"CAST('0x' || substring(md5('dc$j|' || t.gram), 1, 8) AS BIGINT) % 65536"
      s"""WITH tk AS (
        | SELECT doc_id, source,
        |  list_filter(string_split(text, ' '), x -> x <> '') AS tk
        | FROM documents),
        |g AS (
        | SELECT doc_id, source,
        |  unnest(list_transform(range(1, len(tk) - 6),
        |    i -> array_to_string(list_slice(tk, i, i + 7), ' '))) AS gram
        | FROM tk WHERE len(tk) >= 8),
        |eval_g AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
        |bits AS (
        | SELECT DISTINCT p FROM (
        |  SELECT ${h(0)} AS p FROM eval_g
        |  UNION ALL SELECT ${h(1)} FROM eval_g
        |  UNION ALL SELECT ${h(2)} FROM eval_g)),
        |probed AS (
        | SELECT t.doc_id, t.gram,
        |  (CASE WHEN b0.p IS NULL THEN 0 ELSE 1 END
        |   + CASE WHEN b1.p IS NULL THEN 0 ELSE 1 END
        |   + CASE WHEN b2.p IS NULL THEN 0 ELSE 1 END) = 3 AS pass,
        |  e.gram IS NOT NULL AS hit
        | FROM (SELECT doc_id, gram FROM g WHERE source <> 'src0') t
        | LEFT JOIN bits b0 ON ${hq(0)} = b0.p
        | LEFT JOIN bits b1 ON ${hq(1)} = b1.p
        | LEFT JOIN bits b2 ON ${hq(2)} = b2.p
        | LEFT JOIN eval_g e ON t.gram = e.gram)
        |SELECT CAST(count(*) AS BIGINT) AS n_train_grams,
        | CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_bloom_pass,
        | CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_exact_hits,
        | CAST(sum(CASE WHEN pass AND NOT hit THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_false_pass,
        | CAST(sum(CASE WHEN hit AND NOT pass THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_bloom_missed,
        | CAST(count(DISTINCT CASE WHEN hit THEN doc_id END) AS BIGINT)
        |   AS n_contaminated_docs,
        | CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
        |   AS bloom_selectivity
        |FROM probed""".stripMargin
    },
    "q241_embedding_quantiles" ->
      """WITH vals AS (
        | SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
        | FROM (SELECT vec_id, embedding,
        |        unnest(generate_series(1, len(embedding))) AS i
        |       FROM embeddings)),
        |ranked AS (
        | SELECT dim, v,
        |  row_number() OVER (PARTITION BY dim ORDER BY v, vec_id) AS rn
        | FROM vals),
        |targets AS (
        | SELECT dim, decile,
        |  CAST(ceil(decile * n / 10.0) AS BIGINT) AS rn
        | FROM (SELECT dim, count(*) AS n FROM vals GROUP BY dim),
        |  generate_series(1, 10) AS g(decile))
        |SELECT r.dim, CAST(t.decile AS INT) AS decile, r.v AS edge
        |FROM ranked r JOIN targets t ON r.dim = t.dim AND r.rn = t.rn
        |ORDER BY r.dim, t.decile""".stripMargin,
    "q242_rendezvous_reshard" -> {
      // single-line hash expr: a continuation line starting with `||`
      // would lose its first `|` to the OUTER stripMargin pass
      def rdv(n: Int): String =
        s"""SELECT doc_id, sh AS owner FROM (
           | SELECT doc_id, sh, row_number() OVER (
           |   PARTITION BY doc_id ORDER BY h DESC, sh DESC) AS rn
           | FROM (
           |  SELECT doc_id, sh,
           |   CAST('0x' || substring(md5(concat('rdv|', CAST(doc_id AS VARCHAR), '#', CAST(sh AS VARCHAR))), 1, 8) AS BIGINT) AS h
           |  FROM (SELECT doc_id, unnest(generate_series(0, ${n - 1}))
           |         AS sh FROM documents)))
           |WHERE rn = 1""".stripMargin
      s"""WITH r8 AS (${rdv(8)}),
        |r10 AS (${rdv(10)}),
        |m AS (
        | SELECT doc_id,
        |  ${TrainingPipelinePack.duckBucket("doc_id", "shard", 8)} AS m8,
        |  ${TrainingPipelinePack.duckBucket("doc_id", "shard", 10)} AS m10
        | FROM documents)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN m.m8 <> m.m10 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS moved_mod,
        | CAST(sum(CASE WHEN r8.owner <> r10.owner THEN 1 ELSE 0 END)
        |   AS BIGINT) AS moved_rdv,
        | CAST(sum(CASE WHEN m.m8 <> m.m10 THEN 1 ELSE 0 END) AS DOUBLE)
        |   / count(*) AS mod_move_frac,
        | CAST(sum(CASE WHEN r8.owner <> r10.owner THEN 1 ELSE 0 END)
        |   AS DOUBLE) / count(*) AS rdv_move_frac
        |FROM m JOIN r8 USING (doc_id) JOIN r10 USING (doc_id)""".stripMargin
    },
    "q234_bloom_join" -> {
      def h(id: String, j: Int): String =
        s"CAST('0x' || substring(md5('bj$j|' || CAST($id AS VARCHAR)), " +
          s"1, 8) AS BIGINT) % $BloomM"
      s"""WITH hot AS (
        | SELECT o_orderkey FROM orders WHERE o_totalprice > $HotCut),
        |bits AS (
        | SELECT DISTINCT p FROM (
        |  SELECT ${h("o_orderkey", 0)} AS p FROM hot
        |  UNION ALL SELECT ${h("o_orderkey", 1)} FROM hot
        |  UNION ALL SELECT ${h("o_orderkey", 2)} FROM hot)),
        |fact AS (
        | SELECT l_orderkey,
        |  CAST(round(l_extendedprice * (1.0 - l_discount) * 10000)
        |    AS BIGINT) AS rev_e4
        | FROM lineitem),
        |passed AS (
        | SELECT f.l_orderkey, f.rev_e4,
        |  (CASE WHEN b0.p IS NULL THEN 0 ELSE 1 END
        |   + CASE WHEN b1.p IS NULL THEN 0 ELSE 1 END
        |   + CASE WHEN b2.p IS NULL THEN 0 ELSE 1 END) = $BloomK AS pass
        | FROM fact f
        | LEFT JOIN bits b0 ON ${h("f.l_orderkey", 0)} = b0.p
        | LEFT JOIN bits b1 ON ${h("f.l_orderkey", 1)} = b1.p
        | LEFT JOIN bits b2 ON ${h("f.l_orderkey", 2)} = b2.p),
        |joined AS (
        | SELECT p.rev_e4, h.o_orderkey AS hot_key
        | FROM passed p LEFT JOIN hot h ON p.l_orderkey = h.o_orderkey
        | WHERE p.pass),
        |agg AS (
        | SELECT
        |  CAST(sum(CASE WHEN hot_key IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_joined,
        |  CAST(sum(CASE WHEN hot_key IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_false_pass,
        |  CAST(sum(CASE WHEN hot_key IS NOT NULL THEN rev_e4 END)
        |    AS BIGINT) AS joined_e4
        | FROM joined),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_fact FROM fact),
        |np AS (
        | SELECT CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_pass FROM passed)
        |SELECT n_fact, n_pass, n_joined, n_false_pass,
        | 1.0 - CAST(n_pass AS DOUBLE) / n_fact AS reduction,
        | joined_e4 / 10000.0 AS joined_revenue
        |FROM agg, tot, np""".stripMargin
    },
    "q235_ivm_join" ->
      """WITH li AS (
        | SELECT l_orderkey,
        |  CAST(round(l_extendedprice * (1.0 - l_discount) * 10000)
        |    AS BIGINT) AS rev_e4
        | FROM lineitem),
        |v_base AS (
        | SELECT o_custkey, CAST(sum(rev_e4) AS BIGINT) AS b_rev,
        |  count(*) AS b_n
        | FROM orders JOIN li ON o_orderkey = l_orderkey
        | WHERE o_orderdate < TIMESTAMP '2001-01-01' GROUP BY o_custkey),
        |v_delta AS (
        | SELECT o_custkey, CAST(sum(rev_e4) AS BIGINT) AS d_rev,
        |  count(*) AS d_n
        | FROM orders JOIN li ON o_orderkey = l_orderkey
        | WHERE o_orderdate >= TIMESTAMP '2001-01-01' GROUP BY o_custkey),
        |merged AS (
        | SELECT coalesce(b.o_custkey, d.o_custkey) AS o_custkey,
        |  coalesce(b.b_rev, 0) + coalesce(d.d_rev, 0) AS m_rev,
        |  coalesce(b.b_n, 0) + coalesce(d.d_n, 0) AS m_n
        | FROM v_base b FULL JOIN v_delta d ON b.o_custkey = d.o_custkey),
        |direct AS (
        | SELECT o_custkey, CAST(sum(rev_e4) AS BIGINT) AS rev_e4,
        |  count(*) AS n_items
        | FROM orders JOIN li ON o_orderkey = l_orderkey
        | GROUP BY o_custkey)
        |SELECT CAST(count(*) AS BIGINT) AS n_view_rows,
        | CAST(sum(CASE WHEN m.m_rev IS NOT DISTINCT FROM d.rev_e4
        |   AND m.m_n IS NOT DISTINCT FROM d.n_items
        |   THEN 0 ELSE 1 END) AS BIGINT) AS n_mismatch,
        | CAST(sum(m.m_rev) AS BIGINT) / 10000.0 AS maintained_revenue,
        | CAST(sum(d.rev_e4) AS BIGINT) / 10000.0 AS direct_revenue
        |FROM merged m FULL JOIN direct d ON m.o_custkey = d.o_custkey"""
        .stripMargin,
    "q236_histogram_quantiles" ->
      """WITH stats AS (
        | SELECT min(n_chars) AS lo, max(n_chars) AS hi, count(*) AS n
        | FROM documents),
        |binned AS (
        | SELECT ((n_chars - lo) * 64) // (hi - lo + 1) AS bin, lo, hi, n
        | FROM documents, stats),
        |cum AS (
        | SELECT bin, lo, hi, n, count(*) AS cnt,
        |  sum(count(*)) OVER (ORDER BY bin
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM binned GROUP BY bin, lo, hi, n),
        |targets AS (
        | SELECT decile, CAST(ceil(decile * n / 10.0) AS BIGINT) AS rank
        | FROM stats, generate_series(1, 10) AS g(decile)),
        |approx AS (
        | SELECT t.decile, t.rank,
        |  min(c.lo + (c.bin * (c.hi - c.lo + 1)) // 64) AS approx_edge
        | FROM targets t JOIN cum c ON c.cum >= t.rank
        | GROUP BY t.decile, t.rank),
        |exact AS (
        | SELECT t.decile AS d2, r.n_chars AS exact_edge
        | FROM (SELECT n_chars,
        |        row_number() OVER (ORDER BY n_chars, doc_id) AS rn
        |       FROM documents) r
        | JOIN targets t ON r.rn = t.rank)
        |SELECT CAST(a.decile AS INT) AS decile, a.rank, e.exact_edge,
        | a.approx_edge, a.approx_edge - e.exact_edge AS err
        |FROM approx a JOIN exact e ON a.decile = e.d2
        |ORDER BY decile""".stripMargin,
    "q237_ips_policy_eval" ->
      """WITH ev AS (
        | SELECT user_id, event_type AS a,
        |  CAST(round(value * 100) AS BIGINT) AS r_cents
        | FROM events),
        |k AS (SELECT count(DISTINCT a) AS k FROM ev),
        |per_user AS (
        | SELECT user_id, count(*) AS n_u FROM ev GROUP BY user_id),
        |per_ua AS (
        | SELECT user_id, a, count(*) AS n_ua FROM ev GROUP BY user_id, a),
        |wtd AS (
        | SELECT e.r_cents,
        |  CAST(u.n_u AS DOUBLE) / (k.k * x.n_ua) AS w
        | FROM ev e
        | JOIN per_ua x ON e.user_id = x.user_id AND e.a = x.a
        | JOIN per_user u ON e.user_id = u.user_id
        | CROSS JOIN k)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        | (SELECT CAST(k AS BIGINT) FROM k) AS k_actions,
        | CAST(sum(r_cents) AS DOUBLE) / count(*) / 100.0
        |   AS behavior_value,
        | round(sum(w * r_cents) / count(*) / 100.0, 2) AS ips_value,
        | round(sum(w) * sum(w) / sum(w * w), 2) AS ess
        |FROM wtd""".stripMargin,
    "q238_scd2_pit_join" ->
      """WITH h0 AS (
        | SELECT o_custkey, o_orderpriority,
        |  CAST(o_orderdate AS DATE) AS d, o_orderkey,
        |  lag(o_orderpriority) OVER (PARTITION BY o_custkey
        |    ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS prev,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS rn
        | FROM orders),
        |changes AS (
        | SELECT o_custkey AS h_cust, o_orderpriority AS pit_priority,
        |  d AS valid_from, o_orderkey
        | FROM h0 WHERE rn = 1 OR prev IS DISTINCT FROM o_orderpriority),
        |hist AS (
        | SELECT h_cust, pit_priority, valid_from,
        |  lead(valid_from) OVER (PARTITION BY h_cust
        |    ORDER BY valid_from, o_orderkey) AS valid_to
        | FROM changes),
        |facts AS (
        | SELECT o.o_custkey, CAST(l.l_shipdate AS DATE) AS ship_d,
        |  CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 10000)
        |    AS BIGINT) AS rev_e4
        | FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT coalesce(h.pit_priority, '(none)') AS pit_priority,
        | CAST(count(*) AS BIGINT) AS n_items,
        | CAST(count(DISTINCT f.o_custkey) AS BIGINT) AS n_customers,
        | CAST(sum(f.rev_e4) AS BIGINT) / 10000.0 AS revenue
        |FROM facts f LEFT JOIN hist h ON f.o_custkey = h.h_cust
        | AND f.ship_d >= h.valid_from
        | AND (h.valid_to IS NULL OR f.ship_d < h.valid_to)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q239_holt_backtest" ->
      """WITH daily AS (
        | SELECT o_orderpriority AS priority, o_orderdate AS d,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        | FROM orders GROUP BY 1, 2),
        |arr AS (
        | SELECT priority,
        |  list_transform(
        |    list_sort(list({'d': d, 'r': CAST(cents AS DOUBLE) / 100})),
        |    e -> [e.r, e.r, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)]) AS xs
        | FROM daily GROUP BY priority),
        |folded AS (
        | SELECT priority, CAST(len(xs) AS INT) AS n_days,
        |  list_reduce(xs, (acc, x) -> [
        |    x[1],
        |    CAST(0.3 AS DOUBLE) * x[1]
        |      + CAST(0.7 AS DOUBLE) * (acc[2] + acc[3]),
        |    CAST(0.2 AS DOUBLE) * ((CAST(0.3 AS DOUBLE) * x[1]
        |        + CAST(0.7 AS DOUBLE) * (acc[2] + acc[3])) - acc[2])
        |      + CAST(0.8 AS DOUBLE) * acc[3],
        |    acc[4] + abs(x[1] - (acc[2] + acc[3]))]) AS h
        | FROM arr)
        |SELECT priority, n_days,
        | round(h[4] / (n_days - 1), 6) AS mae,
        | round(h[2] + h[3], 6) AS forecast_next
        |FROM folded ORDER BY priority""".stripMargin,
    "q240_join_card_estimate" ->
      """WITH cnts AS (
        | SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
        |tot AS (
        | SELECT CAST(sum(c) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS ndv,
        |  CAST(sum(c * c) AS BIGINT) AS actual_pairs
        | FROM cnts),
        |top AS (
        | SELECT CAST(sum(c * c) AS BIGINT) AS top_sq,
        |  CAST(sum(c) AS BIGINT) AS top_n,
        |  CAST(count(*) AS BIGINT) AS top_k
        | FROM (
        |  SELECT c, row_number() OVER (ORDER BY c DESC, user_id) AS rn
        |  FROM cnts)
        | WHERE rn <= 10)
        |SELECT n, ndv, actual_pairs,
        | (n * n) // ndv AS est_uniform,
        | top_sq + CASE WHEN ndv > top_k
        |   THEN ((n - top_n) * (n - top_n)) // (ndv - top_k)
        |   ELSE 0 END AS est_topk,
        | CAST((n * n) // ndv AS DOUBLE) / actual_pairs AS uniform_ratio,
        | CAST(top_sq + CASE WHEN ndv > top_k
        |   THEN ((n - top_n) * (n - top_n)) // (ndv - top_k)
        |   ELSE 0 END AS DOUBLE) / actual_pairs AS topk_ratio
        |FROM tot, top""".stripMargin)
}
