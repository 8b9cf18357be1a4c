package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.Tables

/** Robust / resampling statistics and distributed-layout depth: Kaplan-Meier
  * survival over repeat purchases, deterministic Poisson-bootstrap confidence
  * intervals, MAD robust outlier detection, exact distributed deciles, DSIR
  * hashed importance weighting, and greedy sequence packing — capabilities an
  * analytics platform layered on the reference's star schema
  * (reference `README.md:259-344`) needs once point estimates stop being
  * enough (uncertainty, robustness, survival framing) and once the corpus
  * side feeds training (importance-resampled selection, packed context
  * windows).
  *
  * Scale doctrine: every query reduces to a bounded grain before anything
  * sequential happens. The KM fold runs over the EVENT-TIME grid
  * (calendar-bounded, a few thousand rows at any corpus size, single-row
  * collect documented per query); the bootstrap is the Poisson bootstrap —
  * the ONLY bootstrap that works on a cluster (no global resample: each
  * row carries deterministic per-replicate multiplicities, one partial-agg
  * shuffle of B groups); packing folds per (source, shard) exactly like a
  * distributed packer would (each worker packs its shard); median/MAD and
  * deciles use sort-based window selection (no driver collect, no
  * interpolation-convention hazards). All comparisons and accumulations are
  * exact integers until a final fixed division — the q166/q196 cross-engine
  * doctrine.
  */
object RobustOpsPack extends QueryPack {

  import TrainingPipelinePack.{bucket, duckBucket, md5Hash32}

  // --- q221: Kaplan-Meier survival -----------------------------------------

  /** q221 — Kaplan-Meier estimator of time-to-repeat-purchase: per customer,
    * event = second order at t = days(first→second), censored at
    * t = days(first→dataset end) otherwise (the q198 censoring framing made
    * into a proper survival curve). Risk sets are suffix sums over the
    * t-grid; the survival product runs in exact integer micro-units with
    * stepwise truncating division (`S' = S·(n−d) div n`) — no floats until
    * the final ÷1e6, so both engines agree bit-for-bit with zero rounding.
    *
    * Scale: one shuffle to customer grain (per-customer order arrays are
    * TPC-H-bounded), one reduce to the t-grid. The grid is CALENDAR-bounded
    * (≤ a few thousand distinct day counts at ANY corpus size), so the
    * single-partition window + single-row fold over it is O(grid²) ≈ 10⁶
    * steps worst case — constant, not data-scaled. The O(rows) work all
    * happens in the two distributed aggregations before it.
    */
  private def q221(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(s, dir, "orders")
    val dmax = orders.agg(max(to_date(col("o_orderdate"))).as("dmax"))
    val perCust = orders
      .groupBy("o_custkey")
      .agg(sort_array(collect_list(to_date(col("o_orderdate")))).as("ds"))
      .crossJoin(broadcast(dmax))
      .select(
        when(size(col("ds")) >= 2,
          datediff(element_at(col("ds"), 2), element_at(col("ds"), 1)))
          .otherwise(datediff(col("dmax"), element_at(col("ds"), 1)))
          .as("t"),
        when(size(col("ds")) >= 2, 1L).otherwise(0L).as("event"))
    val grid = perCust.groupBy("t")
      .agg(sum("event").as("d"), count(lit(1)).as("tot"))
    // risk set = customers still under observation at t = suffix sum
    val wRisk = Window.orderBy("t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val ev = grid
      .withColumn("n", sum("tot").over(wRisk))
      .filter(col("d") > 0)
      .select(struct(col("t"), col("d"), col("n")).as("e"))
      .agg(sort_array(collect_list(col("e"))).as("es"))
    // S_i in micro-units: fold i prefix steps of S' = S·(n−d) div n from
    // seed 1e6. Exact integer; n ≤ 10^9 keeps S·(n−d) ≪ 2^63.
    def surv(i: Column): Column =
      aggregate(slice(col("es"), lit(1), i), lit(1000000L),
        (acc, x) => call_function("div",
          acc * (x.getField("n") - x.getField("d")), x.getField("n")))
    ev.select(col("es"), posexplode(col("es")).as(Seq("i0", "e")))
      .select(col("e.t").as("t_days"), col("e.n").as("n_risk"),
        col("e.d").as("d_events"),
        surv(col("i0") + 1).as("survival_micro"))
      .withColumn("survival", col("survival_micro") / lit(1000000.0))
      .orderBy("t_days")
  }

  // --- q222: greedy sequence packing ---------------------------------------

  /** q222 — greedy sequence packing of documents into fixed 256-token
    * context windows, the step after q183's padding AUDIT: actually assign
    * docs to bins. Packing is inherently sequential, so it runs per
    * (source, shard-of-8) — exactly how a distributed packer works (each
    * worker packs its own shard; bins never span workers) — with the
    * arrival order pinned to doc_id. State is the [bin, fill] pair riding
    * the q166 in-row fold; elements are pre-initialized to their
    * single-doc state so DuckDB's seed-with-head equals the correct first
    * step. Oversize docs truncate to one full window.
    */
  private def q222(s: SparkSession, dir: String): DataFrame = {
    val cap = 256
    val perDoc = Tables.load(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        least(TextOps.nToks(col("text")), lit(cap)).cast("long").as("n"),
        bucket(col("doc_id"), "pack", 8).as("shard"))
    def step(acc: Column, x: Column): Column = {
      val n = x.getField("n")
      when(element_at(acc, 2) + n <= cap,
        array(element_at(acc, 1), element_at(acc, 2) + n))
        .otherwise(array(element_at(acc, 1) + 1, n))
    }
    val perShard = perDoc
      .groupBy("source", "shard")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n"))))
        .as("docs"), count(lit(1)).as("n_docs"), sum("n").as("toks"))
      .select(col("source"), col("n_docs"), col("toks"),
        aggregate(
          slice(col("docs"), lit(2), size(col("docs")) - 1),
          array(lit(1L), element_at(col("docs"), 1).getField("n")),
          step).as("st"))
      .select(col("source"), col("n_docs"), col("toks"),
        element_at(col("st"), 1).as("bins"))
    perShard.groupBy("source")
      .agg(sum("n_docs").as("n_docs"), count(lit(1)).as("n_shards"),
        sum("toks").as("total_tokens"), sum("bins").as("n_bins"))
      .withColumn("capacity_tokens", col("n_bins") * cap)
      .withColumn("fill_efficiency",
        col("total_tokens").cast("double") / col("capacity_tokens"))
      .orderBy("source")
  }

  // --- q223: deterministic Poisson bootstrap -------------------------------

  /** q223 — 95% bootstrap CI for mean order value via the POISSON bootstrap:
    * the resampling scheme that actually distributes (classical bootstrap
    * needs a global n-out-of-n resample — impossible without materializing
    * the dataset B times; Poisson(1) multiplicities are independent per
    * row, so one scan with a 64-way explode and a B-group partial agg does
    * everything). Multiplicities are DETERMINISTIC: the md5-u32 of
    * (orderkey, replicate) cut at the quantized Poisson(1) CDF — integer
    * thresholds ⌊CDF·2³²⌋, capped at 5 (P ≈ 4e-4) — so both engines draw
    * identical "randomness" with no RNG in sight (the q111 doctrine).
    * Replicate means are exact cents ratios; the interval is the
    * (2nd, 63rd) order statistics of the 64 means — explicit selection,
    * no percentile-interpolation convention in play.
    */
  private def q223(s: SparkSession, dir: String): DataFrame = {
    val b = 64
    // ⌊CDF_Poisson(1)(k)·2³²⌋ for k = 0..4; ≥ t4 ⇒ multiplicity 5
    val t = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L,
      4279248373L)
    val h = md5Hash32(
      concat(col("o_orderkey").cast("string"), lit(":"), col("rep")), "boot")
    val m = when(h < t(0), 0L).when(h < t(1), 1L).when(h < t(2), 2L)
      .when(h < t(3), 3L).when(h < t(4), 4L).otherwise(5L)
    val cents = round(col("o_totalprice") * 100).cast("long")
    val reps = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), cents.as("cents"),
        explode(sequence(lit(1), lit(b))).as("rep"))
      .select(col("rep"), m.as("m"), col("cents"))
      .groupBy("rep")
      .agg(sum(col("m") * col("cents")).as("sc"), sum("m").as("sm"))
      .select((col("sc").cast("double") / col("sm") / 100.0).as("mean"))
      .agg(sort_array(collect_list("mean")).as("ms"))
    val point = Tables.load(s, dir, "orders")
      .agg((sum(cents).cast("double") / count(lit(1)) / 100.0)
        .as("point_mean"))
    point.crossJoin(broadcast(reps))
      .select(col("point_mean"),
        (aggregate(col("ms"), lit(0.0), _ + _) / b).as("boot_mean"),
        element_at(col("ms"), 2).as("ci_lo"),
        element_at(col("ms"), 63).as("ci_hi"),
        lit(b).as("n_replicates"))
  }

  // --- q224: DSIR hashed importance weighting ------------------------------

  /** q224 — DSIR-style importance weighting (Xie et al. 2023's
    * data-selection-for-LMs shape): score each document by how target-like
    * its hashed token features are, target = the English slice. Feature
    * space is 1024 md5 buckets; a bucket's weight is the add-one-smoothed
    * target/raw count ratio in INTEGER MILLI-UNITS (`(ct+1)·1000 div
    * (cr+1)` — the q174 exact-integer classifier doctrine, with weights
    * LEARNED from the corpus in the same pass rather than fixed). A doc's
    * score sums its tokens' bucket weights; "selected" means the doc's
    * mean token weight clears the CORPUS mean — a relative cut, because
    * hashed-bucket smoothing compresses the weight range (no absolute
    * constant survives a vocabulary change), evaluated as doubles built
    * by the identical op sequence in both engines (an integer
    * cross-product `score·totToks ≥ totScore·n` would overflow 2⁶³ at
    * corpus scale). Both count tables come from ONE exploded-token
    * aggregation (conditional agg); the 1024-row weight table broadcasts
    * to the doc-grain re-aggregation; the corpus totals broadcast as one
    * row — three shuffles total, all shrinking.
    */
  private def q224(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        explode(TextOps.toks(col("text"))).as("tok"))
      .withColumn("b", bucket(col("tok"), "dsir", 1024))
    val weights = toks.groupBy("b")
      .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr"))
      .select(col("b"), call_function("div",
        (col("ct") + 1) * 1000, col("cr") + 1).as("w"))
    val perDoc = toks.join(broadcast(weights), "b")
      .groupBy(col("doc_id"), col("source"))
      .agg(sum("w").as("score"), count(lit(1)).as("n_toks"))
    val tot = perDoc.agg(sum("score").as("tot_score"),
      sum("n_toks").as("tot_toks"))
    perDoc.crossJoin(broadcast(tot))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("score").as("sum_score"), sum("n_toks").as("sum_toks"),
        sum(when(col("score").cast("double") / col("n_toks") >=
          col("tot_score").cast("double") / col("tot_toks"), 1L)
          .otherwise(0L)).as("n_selected"))
      .withColumn("mean_w_milli",
        col("sum_score").cast("double") / col("sum_toks"))
      .orderBy("source")
  }

  // --- q225: MAD robust outliers -------------------------------------------

  /** q225 — median/MAD robust outlier audit of customer balances per market
    * segment (the robust twin of q146's IQR rule): median via explicit
    * MIDRANK selection (row_number against the segment count — no
    * percentile-interpolation convention to disagree on), MAD the same way
    * over absolute deviations, outlier = 0.6745·|x−med| > 3.5·MAD
    * evaluated as the EXACT INTEGER cross-product `13490·dev2 > 35000·mad4`
    * (med carried in half-cents, MAD in quarter-cents — midranks of even
    * counts average two values, so doubling twice keeps everything
    * integral). Two sort-based window passes at segment grain + two 5-row
    * broadcast joins; nothing collects.
    */
  private def q225(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
      .select(col("c_mktsegment").as("seg"), col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
    def midrank(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val w = Window.partitionBy("seg")
        .orderBy(col(valueCol), col("c_custkey"))
      val n = Window.partitionBy("seg")
      df.withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(n))
        // med·2 = value at ⌊(n+1)/2⌋ + value at ⌈(n+1)/2⌉ (same row when odd)
        .filter(col("rn") === floor((col("cnt") + 1) / lit(2.0)) ||
          col("rn") === ceil((col("cnt") + 1) / lit(2.0)))
        .groupBy("seg")
        .agg((sum(valueCol) * lit(2) / count(lit(1)))
          .cast("long").as(out))
    }
    val med = midrank(cust, "cents", "med2") // half-cents
    val dev = cust.join(broadcast(med), "seg")
      .withColumn("dev2", abs(col("cents") * 2 - col("med2")))
    val mad = midrank(
      dev.select(col("seg"), col("c_custkey"), col("dev2")),
      "dev2", "mad4") // quarter-cents
    dev.join(broadcast(mad), "seg")
      .groupBy("seg")
      .agg(count(lit(1)).as("n"),
        first(col("med2")).as("med2"), first(col("mad4")).as("mad4"),
        sum(when(col("dev2") * 13490 > col("mad4") * 35000, 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("seg"), col("n"),
        (col("med2") / lit(200.0)).as("median_bal"),
        (col("mad4") / lit(400.0)).as("mad_bal"),
        col("n_outliers"))
      .orderBy("seg")
  }

  // --- q226: exact distributed deciles -------------------------------------

  /** q226 — exact decile edges of document length per source, computed the
    * way exact quantiles actually scale: a sort-based window rank inside
    * each group plus a broadcast join against the ⌈k·n/10⌉ target-rank
    * grid (10 rows per source). No driver collect, no approx-percentile
    * sketch, no interpolation — `percentile_disc` semantics by explicit
    * rank selection, so the values are corpus elements and both engines
    * pick the identical rows. The same shape handles any rank set
    * (p99 latencies, trimmed-range bounds) by swapping the grid.
    */
  private def q226(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars"), col("doc_id"))
    val ranked = docs.withColumn("rn", row_number().over(w))
    val targets = docs.groupBy("source")
      .agg(count(lit(1)).as("n"))
      .select(col("source"), explode(sequence(lit(1), lit(10))).as("decile"),
        col("n"))
      .withColumn("rn", ceil(col("decile") * col("n") / lit(10.0))
        .cast("int"))
    ranked.join(broadcast(targets), Seq("source", "rn"))
      .select(col("source"), col("decile"), col("n_chars").as("edge"))
      .orderBy("source", "decile")
  }

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] =
    Seq(
      "q221_kaplan_meier" -> q221 _,
      "q222_sequence_packing" -> q222 _,
      "q223_poisson_bootstrap" -> q223 _,
      "q224_dsir_importance" -> q224 _,
      "q225_mad_outliers" -> q225 _,
      "q226_exact_deciles" -> q226 _)

  private val duckToks = "list_filter(string_split(text, ' '), x -> x <> '')"

  override val oracle: Seq[(String, String)] = Seq(
    "q221_kaplan_meier" ->
      """WITH per_cust AS (
        | SELECT o_custkey,
        |  list_sort(list(CAST(o_orderdate AS DATE))) AS ds
        | FROM orders GROUP BY 1),
        |dmax AS (SELECT max(CAST(o_orderdate AS DATE)) AS dmax FROM orders),
        |obs AS (
        | SELECT CASE WHEN len(ds) >= 2
        |   THEN date_diff('day', ds[1], ds[2])
        |   ELSE date_diff('day', ds[1], dmax) END AS t,
        |  CASE WHEN len(ds) >= 2 THEN 1 ELSE 0 END AS event
        | FROM per_cust, dmax),
        |grid AS (
        | SELECT t, CAST(sum(event) AS BIGINT) AS d, count(*) AS tot
        | FROM obs GROUP BY t),
        |risk AS (
        | SELECT t, d, CAST(sum(tot) OVER (ORDER BY t
        |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
        |   AS n
        | FROM grid),
        |ev AS (
        | SELECT list_sort(list({'t': t, 'd': d, 'n': n})) AS es
        | FROM risk WHERE d > 0),
        |idx AS (
        | SELECT unnest(generate_series(1, len(es))) AS i, es FROM ev),
        |expanded AS (
        | SELECT es[i].t AS t_days, es[i].n AS n_risk, es[i].d AS d_events,
        |  list_reduce(
        |   list_prepend([CAST(1 AS BIGINT), 0, 1000000],
        |    list_transform(es[1:i], e -> [e.n, e.d, CAST(0 AS BIGINT)])),
        |   (acc, x) -> [x[1], x[2], (acc[3] * (x[1] - x[2])) // x[1]])[3]
        |   AS survival_micro
        | FROM idx)
        |SELECT t_days, n_risk, d_events, survival_micro,
        | survival_micro / 1000000.0 AS survival
        |FROM expanded ORDER BY t_days""".stripMargin,
    "q222_sequence_packing" -> {
      s"""WITH per_doc AS (
        | SELECT source, doc_id,
        |  CAST(least(length($duckToks), 256) AS BIGINT) AS n,
        |  ${duckBucket("doc_id", "pack", 8)} AS shard
        | FROM documents),
        |per_shard AS (
        | SELECT source, count(*) AS n_docs, sum(n) AS toks,
        |  list_reduce(
        |   list_transform(
        |    list_sort(list({'doc_id': doc_id, 'n': n})),
        |    e -> [CAST(1 AS BIGINT), e.n]),
        |   (acc, x) -> CASE WHEN acc[2] + x[2] <= 256
        |    THEN [acc[1], acc[2] + x[2]]
        |    ELSE [acc[1] + 1, x[2]] END)[1] AS bins
        | FROM per_doc GROUP BY source, shard)
        |SELECT source, CAST(sum(n_docs) AS BIGINT) AS n_docs,
        | CAST(count(*) AS BIGINT) AS n_shards,
        | CAST(sum(toks) AS BIGINT) AS total_tokens,
        | CAST(sum(bins) AS BIGINT) AS n_bins,
        | CAST(sum(bins) * 256 AS BIGINT) AS capacity_tokens,
        | CAST(sum(toks) AS DOUBLE) / (sum(bins) * 256) AS fill_efficiency
        |FROM per_shard GROUP BY source ORDER BY source""".stripMargin
    },
    "q223_poisson_bootstrap" -> {
      val h = "CAST('0x' || substring(md5('boot|' || " +
        "CAST(o_orderkey AS VARCHAR) || ':' || CAST(rep AS VARCHAR)), " +
        "1, 8) AS BIGINT)"
      s"""WITH reps AS (
        | SELECT rep,
        |  CASE WHEN $h < 1580030168 THEN 0
        |   WHEN $h < 3160060337 THEN 1
        |   WHEN $h < 3950075421 THEN 2
        |   WHEN $h < 4213413783 THEN 3
        |   WHEN $h < 4279248373 THEN 4 ELSE 5 END AS m,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        | FROM orders, generate_series(1, 64) AS g(rep)),
        |means AS (
        | SELECT list_sort(list(mean)) AS ms FROM (
        |  SELECT CAST(sum(m * cents) AS DOUBLE) / sum(m) / 100.0 AS mean
        |  FROM reps GROUP BY rep)),
        |pt AS (
        | SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |    AS DOUBLE) / count(*) / 100.0 AS point_mean
        | FROM orders)
        |SELECT point_mean,
        | list_reduce(list_prepend(CAST(0 AS DOUBLE), ms),
        |   (acc, x) -> acc + x) / 64 AS boot_mean,
        | ms[2] AS ci_lo, ms[63] AS ci_hi, 64 AS n_replicates
        |FROM pt, means""".stripMargin
    },
    "q224_dsir_importance" -> {
      s"""WITH toks AS (
        | SELECT doc_id, source, lang,
        |  ${duckBucket("tok", "dsir", 1024)} AS b
        | FROM (SELECT doc_id, source, lang, unnest($duckToks) AS tok
        |       FROM documents)),
        |weights AS (
        | SELECT b, ((sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1)
        |   * 1000) // (count(*) + 1) AS w
        | FROM toks GROUP BY b),
        |per_doc AS (
        | SELECT doc_id, source, CAST(sum(w) AS BIGINT) AS score,
        |  count(*) AS n_toks
        | FROM toks JOIN weights USING (b)
        | GROUP BY doc_id, source),
        |tot AS (
        | SELECT CAST(sum(score) AS BIGINT) AS tot_score,
        |  CAST(sum(n_toks) AS BIGINT) AS tot_toks FROM per_doc)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(score) AS BIGINT) AS sum_score,
        | CAST(sum(n_toks) AS BIGINT) AS sum_toks,
        | CAST(sum(CASE WHEN CAST(score AS DOUBLE) / n_toks >=
        |     CAST(tot_score AS DOUBLE) / tot_toks THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_selected,
        | CAST(sum(score) AS DOUBLE) / sum(n_toks) AS mean_w_milli
        |FROM per_doc, tot GROUP BY source ORDER BY source""".stripMargin
    },
    "q225_mad_outliers" ->
      """WITH cust AS (
        | SELECT c_mktsegment AS seg, c_custkey,
        |  CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        | FROM customer),
        |med AS (
        | SELECT seg, CAST(sum(cents) * 2 / count(*) AS BIGINT) AS med2
        | FROM (
        |  SELECT seg, cents,
        |   row_number() OVER (PARTITION BY seg
        |     ORDER BY cents, c_custkey) AS rn,
        |   count(*) OVER (PARTITION BY seg) AS cnt
        |  FROM cust)
        | WHERE rn = CAST(floor((cnt + 1) / 2.0) AS BIGINT)
        |    OR rn = CAST(ceil((cnt + 1) / 2.0) AS BIGINT)
        | GROUP BY seg),
        |dev AS (
        | SELECT c.seg, c.c_custkey, c.cents, m.med2,
        |  abs(c.cents * 2 - m.med2) AS dev2
        | FROM cust c JOIN med m ON c.seg = m.seg),
        |mad AS (
        | SELECT seg, CAST(sum(dev2) * 2 / count(*) AS BIGINT) AS mad4
        | FROM (
        |  SELECT seg, dev2,
        |   row_number() OVER (PARTITION BY seg
        |     ORDER BY dev2, c_custkey) AS rn,
        |   count(*) OVER (PARTITION BY seg) AS cnt
        |  FROM dev)
        | WHERE rn = CAST(floor((cnt + 1) / 2.0) AS BIGINT)
        |    OR rn = CAST(ceil((cnt + 1) / 2.0) AS BIGINT)
        | GROUP BY seg)
        |SELECT d.seg, CAST(count(*) AS BIGINT) AS n,
        | any_value(d.med2) / 200.0 AS median_bal,
        | any_value(a.mad4) / 400.0 AS mad_bal,
        | CAST(sum(CASE WHEN d.dev2 * 13490 > a.mad4 * 35000
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev d JOIN mad a ON d.seg = a.seg
        |GROUP BY d.seg ORDER BY d.seg""".stripMargin,
    "q226_exact_deciles" ->
      """WITH ranked AS (
        | SELECT source, n_chars,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY n_chars, doc_id) AS rn
        | FROM documents),
        |targets AS (
        | SELECT source, decile,
        |  CAST(ceil(decile * count_n / 10.0) AS BIGINT) AS rn
        | FROM (SELECT source, count(*) AS count_n
        |       FROM documents GROUP BY source),
        |  generate_series(1, 10) AS g(decile))
        |SELECT r.source, CAST(t.decile AS INT) AS decile,
        | r.n_chars AS edge
        |FROM ranked r JOIN targets t
        |  ON r.source = t.source AND r.rn = t.rn
        |ORDER BY r.source, t.decile""".stripMargin)
}
