package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Tables

/** Sketch/approximate aggregates — the 100 TB scale path the reference
  * never needed at its size (SURVEY.md §2.4 "no HLL/approx distinct"), but
  * which any exact `COUNT(DISTINCT)` funnel turns into at three orders of
  * magnitude more data:
  *
  *   - q37: HyperLogLog++ distinct counts (`approx_count_distinct`) next
  *     to the exact counts — the approx side partial-aggregates into a
  *     fixed-size sketch per partition (no expand+reshuffle like the exact
  *     multi-distinct rewrite), so memory is O(sketch), not O(keys).
  *   - q38: `percentile_approx` (Greenwald-Khanna) next to the exact
  *     median — bounded-memory quantiles vs a full sort.
  *
  * Both engines' sketches differ by construction, so the oracle compares
  * only the *exact* columns (identical SQL); the approx columns are
  * asserted within error bounds in ApproxSpec — the split the driver
  * contract anticipates for non-SQL-expressible results, applied per
  * column instead of per query.
  */
object ApproxPack extends QueryPack {

  /** q37 — funnel with HLL++ sessions-per-event-type. Exposed columns are
    * the exact ones; the approx estimate drives the ApproxSpec bound.
    */
  private def q37(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy("event_type")
      .agg(
        countDistinct("user_id").as("users_exact"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** The approx twin of q37 (not oracle-comparable — HLL sketches are
    * engine-specific); used by ApproxSpec.
    */
  def approxFunnel(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy("event_type")
      .agg(
        approx_count_distinct("user_id", 0.02).as("users_approx"),
        countDistinct("user_id").as("users_exact"))
      .orderBy("event_type")

  /** q38 — exact percentiles via `percentile` (sort-based; fine at test SF,
    * the approx twin below is the at-scale form).
    */
  private def q38(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("qty_median"),
        expr("percentile(l_quantity, 0.95)").as("qty_p95"),
        min("l_quantity").as("qty_min"),
        max("l_quantity").as("qty_max"))
      .orderBy("l_returnflag")

  /** q311 — GLOBAL exact-percentile ladder, written naively: one
    * `median` + two `percentile`s over the whole table with no GROUP BY.
    * Spark's native plan funnels every (value, count) pair into ONE
    * OpenHashMap on one reducer — the aggregate-shaped cousin of the
    * naive global `row_number()` cliff. The injected
    * [[graft.plans.PercentileRewrite]] re-plans it above the broadcast
    * threshold as distributed order-statistic selection (count +
    * distributed rank via GlobalRankRewrite + positional filter + 1-row
    * interpolation), bit-equal (PercentileRewriteSpec). Rounded to 6 per
    * the cross-engine float doctrine — DuckDB's `quantile_cont` lerps as
    * `lo + frac·(hi−lo)` vs Spark's `(1−frac)·lo + frac·hi`, 1-ulp
    * divergence when a position interpolates across distinct values.
    */
  private def q311(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .agg( // plain aliased percentiles — rounding lives in the Project
        // above so the Aggregate stays the naive shape the rule matches
        expr("median(l_quantity)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        expr("percentile(l_quantity, 0.99)").as("p99"))
      .select(
        round(col("p50"), 6).as("qty_p50"),
        round(col("p90"), 6).as("qty_p90"),
        round(col("p99"), 6).as("qty_p99"))

  /** q333 — the CANONICAL PROFILE QUERY, written naively: count/min/
    * max/exact-sum RIDE-ALONG aggregates next to a median and a p95 in
    * ONE aggregate list, global grain. Pre-round-8 the mixed list
    * stood the whole rewrite down — one OpenHashMap reducer held every
    * distinct value. [[graft.plans.PercentileRewrite]] now re-emits
    * the non-percentile slots verbatim in a 1-row side aggregate and
    * cross-joins it back onto the distributed order-statistic
    * selection, every slot bit-equal to the one-pass naive plan
    * (double sums still stand down — fold order). Plus a grouped form
    * per CASE tier. PercentileRewriteSpec pins the forced rewrite.
    */
  private def q333(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.load(s, dir, "documents")
    t.createOrReplaceTempView("graft_q333_docs")
    t.sparkSession.sql(
      """SELECT n_docs, chars_min, chars_max, chars_sum,
        |  round(chars_p50, 6) AS chars_p50,
        |  round(chars_p95, 6) AS chars_p95
        |FROM (SELECT count(*) AS n_docs,
        |  min(n_chars) AS chars_min, max(n_chars) AS chars_max,
        |  sum(cast(n_chars AS BIGINT)) AS chars_sum,
        |  median(n_chars) AS chars_p50,
        |  percentile(n_chars, 0.95d) AS chars_p95
        | FROM graft_q333_docs)""".stripMargin)
  }

  /** q312 — BOUNDED-GROUP exact-percentile ladder, written naively:
    * `median`/`percentile` per CASE-ladder length tier. The tier
    * expression's domain is provably ≤ 4 (three literal arms + null),
    * so the native plan's parallelism is pigeonhole-capped at 4 tasks
    * each holding its tier's whole value multiset —
    * [[graft.plans.PercentileRewrite]]'s grouped path re-plans it
    * per-group-distributed (the emitted bounded-partition window is
    * itself re-planned by GlobalRankRewrite's round-8 pigeonhole path).
    * Attribute-valued groups (q38's `l_returnflag`) stand down — nothing
    * proves their cardinality.
    */
  private def q312(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .groupBy(
        when(col("n_chars") < 200, "short")
          .when(col("n_chars") < 400, "medium")
          .otherwise("long").as("tier"))
      .agg(
        expr("median(n_chars)").as("p50"),
        expr("percentile(n_chars, 0.9)").as("p90"))
      .select(col("tier"), round(col("p50"), 6).as("chars_p50"),
        round(col("p90"), 6).as("chars_p90"))
      .orderBy("tier")

  /** q313 — deterministic `mode()` per language, written naively. The
    * native plan builds a value→count OpenHashMap per language and
    * merges each on ONE task — at corpus scale each language's map holds
    * every distinct source. [[graft.plans.ModeRewrite]] re-plans the
    * WITHIN-GROUP (deterministic-tie) form as two-level hash
    * aggregation: count per (lang, source), then
    * `max_by(source, struct(cnt, source))` per lang — map-side partials
    * at both levels, any NDV, any group count. ASC ties pick the
    * SMALLEST tied value (first in the given order), mirrored in the
    * oracle's `ORDER BY n DESC, source ASC` rank.
    */
  private def q313(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(expr("mode() WITHIN GROUP (ORDER BY source)").as("top_source"))
      .orderBy("lang")

  /** q316 — GLOBAL `percentile_disc` ladder, written naively. Same
    * OpenHashMap cliff as q311; [[graft.plans.PercentileRewrite]]'s
    * disc arm selects the value at the smallest 1-based position
    * ≥ p·n (the non-legacy cume_dist law, spec-pinned against native),
    * no interpolation. The oracle replays the identical positional law
    * in window SQL — `min(v) where rn ≥ p·n` over the ascending
    * numbering — rather than DuckDB's own `quantile_disc`, whose
    * position convention differs.
    */
  private def q316(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.load(s, dir, "lineitem")
    t.createOrReplaceTempView("graft_q316_lineitem")
    t.sparkSession.sql( // rounding in the OUTER select keeps the
      // Aggregate the naive all-percentile shape the rule matches
      """SELECT round(p25, 6) AS disc_p25, round(p90, 6) AS disc_p90
        |FROM (SELECT
        |  percentile_disc(0.25d) WITHIN GROUP (ORDER BY l_quantity)
        |    AS p25,
        |  percentile_disc(0.9d) WITHIN GROUP (ORDER BY l_quantity)
        |    AS p90
        | FROM graft_q316_lineitem)""".stripMargin)
  }

  /** q321 — WEIGHTED global percentile ladder, written naively:
    * `percentile(n_chars, p, n_tokens)` — each document's length counts
    * once per TOKEN, the "what document length does the median training
    * token live in" readout (token-weighted quantiles diverge hard from
    * document-weighted ones when long docs dominate the token budget).
    * The native plan funnels every (value, weight) pair into ONE
    * OpenHashMap reducer; [[graft.plans.PercentileRewrite]]'s weighted
    * path re-plans it as a distinct-value weight aggregate + cumulative
    * weight along the value order (itself re-planned by
    * GlobalRankRewrite) + bracketing-value selection, bit-equal
    * (PercentileRewriteSpec). The oracle expands the multiset literally
    * — `generate_series(1, f)` replicates each row f times — and runs
    * plain `quantile_cont` over the expansion, an independent spelling
    * of the same expanded-multiset law. Rounded to 6 per the q311 lerp
    * doctrine. */
  private def q321(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("n_chars"),
        expr("length(text) - length(replace(text, ' ', '')) + 1")
          .as("n_tokens"))
      .agg( // rounding lives in the Project above (naive-shape doctrine)
        expr("percentile(n_chars, 0.5d, n_tokens)").as("p50"),
        expr("percentile(n_chars, 0.9d, n_tokens)").as("p90"),
        expr("percentile(n_chars, 0.99d, n_tokens)").as("p99"))
      .select(
        round(col("p50"), 6).as("wchars_p50"),
        round(col("p90"), 6).as("wchars_p90"),
        round(col("p99"), 6).as("wchars_p99"))

  /** q322 — WEIGHTED BOUNDED-GROUP percentile ladder, written naively:
    * token-weighted length quantiles per CASE-ladder length tier (q312's
    * pigeonhole groups × q321's weights). The native plan is one
    * OpenHashMap per tier merged on ≤ 4 tasks;
    * [[graft.plans.PercentileRewrite]]'s weighted-grouped path re-plans
    * it per-group-distributed — the (tier, value) weight aggregate
    * aliases its group keys so the per-tier cumulative window's
    * pigeonhole proof survives and GlobalRankRewrite re-plans it in the
    * same batch. Oracle: per-tier expanded multiset + quantile_cont. */
  private def q322(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("n_chars"),
        expr("length(text) - length(replace(text, ' ', '')) + 1")
          .as("n_tokens"))
      .groupBy(when(col("n_chars") < 220, "short")
        .when(col("n_chars") < 380, "medium")
        .otherwise("long").as("tier"))
      .agg(
        expr("percentile(n_chars, 0.5d, n_tokens)").as("p50"),
        expr("percentile(n_chars, 0.9d, n_tokens)").as("p90"))
      .select(col("tier"),
        round(col("p50"), 6).as("wchars_p50"),
        round(col("p90"), 6).as("wchars_p90"))
      .orderBy("tier")

  /** q327 — MEDIAN-CENTERED LENGTH as a naive WINDOW-SPELLED
    * percentile: every document reads its length tier's exact median
    * (`percentile(n_chars, 0.5) OVER (PARTITION BY tier)`) and its
    * offset from it — the classic per-group normalization stamp. The
    * naive plan is one WindowExec task per tier each holding the
    * tier's value hash-map; [[graft.plans.GlobalRankRewrite]]'s
    * full-frame arm converts the window into the Aggregate
    * [[graft.plans.PercentileRewrite]] then re-plans in the same batch
    * (rule composition), broadcast-stamping the exact value back.
    * Rounded to 6 per the q311 lerp doctrine. */
  private def q327(s: SparkSession, dir: String): DataFrame = {
    val tier = when(col("n_chars") < 220, "short")
      .when(col("n_chars") < 380, "medium").otherwise("long")
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"), tier.as("tier"))
      .withColumn("tier_med", expr("percentile(n_chars, 0.5d)")
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("tier"))))
      .select(col("doc_id"), col("n_chars"), col("tier"),
        round(col("tier_med"), 6).as("tier_med"),
        round(col("n_chars") - col("tier_med"), 6).as("delta"))
      .orderBy("doc_id")
  }

  /** q328 — MAJORITY SOURCE STAMP as a naive WINDOW-SPELLED
    * deterministic mode: every document reads its tier's most common
    * source (`mode() WITHIN GROUP (ORDER BY source) OVER (PARTITION BY
    * tier)`, ASC ties → smallest). Full-frame conversion +
    * [[graft.plans.ModeRewrite]] composition: two-level hash
    * aggregation replaces the per-tier value maps, broadcast join-back
    * stamps the winner. */
  private def q328(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        when(col("n_chars") < 220, "short")
          .when(col("n_chars") < 380, "medium")
          .otherwise("long").as("tier"))
      .createOrReplaceTempView("graft_q328_docs")
    s.sql(
      """SELECT doc_id, tier,
        | mode() WITHIN GROUP (ORDER BY source)
        |   OVER (PARTITION BY tier) AS top_source
        |FROM graft_q328_docs ORDER BY doc_id""".stripMargin)
  }

  /** q329 — TIER SATURATION FLAGS as naive order-less boolean window
    * aggregates: every document reads whether its length tier contains
    * any >400-char document and whether the tier is all-ASCII-short —
    * `bool_or/every(...) OVER (PARTITION BY tier)`. Boolean folds are
    * order-independent bag functions, so the full-frame arm of
    * [[graft.plans.GlobalRankRewrite]] converts the window into a
    * partial-combining hash aggregate broadcast-joined back (no window
    * operator, corpus-parallel). */
  private def q329(s: SparkSession, dir: String): DataFrame = {
    val tier = when(col("n_chars") < 220, "short")
      .when(col("n_chars") < 380, "medium").otherwise("long")
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tier"))
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"), tier.as("tier"))
      .withColumn("tier_has_long",
        expr("bool_or(n_chars > 400)").over(wp))
      .withColumn("tier_all_upto500",
        expr("every(n_chars < 500)").over(wp))
      .withColumn("tier_docs", count(lit(1)).over(wp))
      .orderBy("doc_id")
  }

  /** Approx-percentile twin (Greenwald-Khanna; ApproxSpec bounds it). */
  def approxQuantiles(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        percentile_approx(col("l_quantity"), lit(0.5), lit(1000))
          .as("qty_median_approx"),
        expr("percentile(l_quantity, 0.5)").as("qty_median_exact"))
      .orderBy("l_returnflag")

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q37_distinct_scale" -> q37 _,
    "q38_percentiles" -> q38 _,
    "q311_global_percentile_ladder" -> q311 _,
    "q333_profile_query" -> q333 _,
    "q312_tier_percentile_ladder" -> q312 _,
    "q313_mode_top_source" -> q313 _,
    "q316_disc_ladder" -> q316 _,
    "q321_weighted_percentile" -> q321 _,
    "q322_tier_weighted_percentile" -> q322 _,
    "q327_median_centering" -> q327 _,
    "q328_majority_stamp" -> q328 _,
    "q329_tier_flags" -> q329 _)

  override val oracle: Seq[(String, String)] = Seq(
    "q37_distinct_scale" ->
      """SELECT event_type,
        | count(DISTINCT user_id) AS users_exact,
        | count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q38_percentiles" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.5) AS qty_median,
        | quantile_cont(l_quantity, 0.95) AS qty_p95,
        | min(l_quantity) AS qty_min,
        | max(l_quantity) AS qty_max
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q311_global_percentile_ladder" ->
      """SELECT round(quantile_cont(l_quantity, 0.5), 6) AS qty_p50,
        | round(quantile_cont(l_quantity, 0.9), 6) AS qty_p90,
        | round(quantile_cont(l_quantity, 0.99), 6) AS qty_p99
        |FROM lineitem""".stripMargin,
    "q333_profile_query" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        | min(n_chars) AS chars_min, max(n_chars) AS chars_max,
        | CAST(sum(n_chars) AS BIGINT) AS chars_sum,
        | round(quantile_cont(n_chars, 0.5), 6) AS chars_p50,
        | round(quantile_cont(n_chars, 0.95), 6) AS chars_p95
        |FROM documents""".stripMargin,
    "q312_tier_percentile_ladder" ->
      """SELECT CASE WHEN n_chars < 200 THEN 'short'
        |   WHEN n_chars < 400 THEN 'medium' ELSE 'long' END AS tier,
        | round(quantile_cont(n_chars, 0.5), 6) AS chars_p50,
        | round(quantile_cont(n_chars, 0.9), 6) AS chars_p90
        |FROM documents GROUP BY 1 ORDER BY tier""".stripMargin,
    "q313_mode_top_source" ->
      """SELECT lang, source AS top_source FROM (
        | SELECT lang, source,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY count(*) DESC, source ASC) AS rn
        | FROM documents GROUP BY lang, source) t
        |WHERE rn = 1 ORDER BY lang""".stripMargin,
    "q316_disc_ladder" ->
      """WITH s AS (SELECT l_quantity AS v,
        |  row_number() OVER (ORDER BY l_quantity) AS rn,
        |  count(*) OVER () AS n
        | FROM lineitem WHERE l_quantity IS NOT NULL)
        |SELECT
        | round(cast(min(CASE WHEN rn >= 0.25 * n THEN v END)
        |   AS double), 6) AS disc_p25,
        | round(cast(min(CASE WHEN rn >= 0.9 * n THEN v END)
        |   AS double), 6) AS disc_p90
        |FROM s""".stripMargin,
    "q321_weighted_percentile" ->
      """WITH d AS (SELECT n_chars,
        |  length(text) - length(replace(text, ' ', '')) + 1 AS f
        | FROM documents),
        |x AS (SELECT n_chars FROM (
        |  SELECT n_chars, unnest(range(f)) FROM d
        |  WHERE n_chars IS NOT NULL))
        |SELECT round(quantile_cont(n_chars, 0.5), 6) AS wchars_p50,
        | round(quantile_cont(n_chars, 0.9), 6) AS wchars_p90,
        | round(quantile_cont(n_chars, 0.99), 6) AS wchars_p99
        |FROM x""".stripMargin,
    "q322_tier_weighted_percentile" ->
      """WITH d AS (SELECT n_chars,
        |  CASE WHEN n_chars < 220 THEN 'short'
        |   WHEN n_chars < 380 THEN 'medium' ELSE 'long' END AS tier,
        |  length(text) - length(replace(text, ' ', '')) + 1 AS f
        | FROM documents),
        |x AS (SELECT tier, n_chars FROM (
        |  SELECT tier, n_chars, unnest(range(f)) FROM d
        |  WHERE n_chars IS NOT NULL))
        |SELECT tier, round(quantile_cont(n_chars, 0.5), 6) AS wchars_p50,
        | round(quantile_cont(n_chars, 0.9), 6) AS wchars_p90
        |FROM x GROUP BY tier ORDER BY tier""".stripMargin,
    "q327_median_centering" ->
      """WITH t AS (SELECT doc_id, n_chars,
        |  CASE WHEN n_chars < 220 THEN 'short'
        |   WHEN n_chars < 380 THEN 'medium' ELSE 'long' END AS tier
        | FROM documents),
        |m AS (SELECT tier, quantile_cont(n_chars, 0.5) AS med
        |      FROM t GROUP BY tier)
        |SELECT t.doc_id, t.n_chars, t.tier,
        | round(m.med, 6) AS tier_med,
        | round(t.n_chars - m.med, 6) AS delta
        |FROM t JOIN m USING (tier) ORDER BY t.doc_id""".stripMargin,
    "q328_majority_stamp" ->
      """WITH t AS (SELECT doc_id, source,
        |  CASE WHEN n_chars < 220 THEN 'short'
        |   WHEN n_chars < 380 THEN 'medium' ELSE 'long' END AS tier
        | FROM documents),
        |w AS (SELECT tier, source FROM (
        |  SELECT tier, source, row_number() OVER (PARTITION BY tier
        |    ORDER BY count(*) DESC, source ASC) AS rn
        |  FROM t GROUP BY tier, source) x WHERE rn = 1)
        |SELECT t.doc_id, t.tier, w.source AS top_source
        |FROM t JOIN w USING (tier) ORDER BY t.doc_id""".stripMargin,
    "q329_tier_flags" ->
      """WITH t AS (SELECT doc_id, n_chars,
        |  CASE WHEN n_chars < 220 THEN 'short'
        |   WHEN n_chars < 380 THEN 'medium' ELSE 'long' END AS tier
        | FROM documents)
        |SELECT doc_id, n_chars, tier,
        | bool_or(n_chars > 400) OVER w AS tier_has_long,
        | bool_and(n_chars < 500) OVER w AS tier_all_upto500,
        | count(*) OVER w AS tier_docs
        |FROM t WINDOW w AS (PARTITION BY tier)
        |ORDER BY doc_id""".stripMargin)
}
