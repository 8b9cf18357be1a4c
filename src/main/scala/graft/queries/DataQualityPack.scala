package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Tables

/** Data-quality operators the reference's silver layer implies (its
  * cleaning pass validates domains and drops nulls/dupes, reference
  * `README.md:177-197,455-468`) generalized to the two audits every
  * lakehouse runs on schedule: single-pass column profiling and
  * referential-integrity checking. Both produce small per-check result
  * tables — the shape of a dbt-test / Great-Expectations run expressed
  * as plain aggregations.
  *
  * Scale notes: q127 profiles all columns in ONE scan (stack → pivot-free
  * groupBy) instead of a scan per column — at 100 TB the difference
  * between one pass and eight. Its only shuffle carries
  * (n_cols × partial-state) rows. q128's orphan checks are anti-joins
  * that each reduce the child side to its FK column before probing; the
  * parent sides are key-projections that broadcast when small enough,
  * and the whole audit unions into one tiny violations table.
  */
object DataQualityPack extends QueryPack {

  /** q127 — single-pass numeric column profile of `lineitem`: count,
    * nulls, distinct, min/max/sum per column via stack (unpivot) then one
    * groupBy. Values land exactly: min/max are order-insensitive, sums
    * are over integer-valued or 2-decimal values summed in exact integer
    * units scaled by 100 (quantity is integer-valued so scaling is still
    * exact).
    */
  private def q127(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val stacked = Tables.load(s, dir, "lineitem")
      .select(posexplode(array(cols.map(col): _*)).as(Seq("pos", "value")))
      .withColumn("column_name",
        element_at(array(cols.map(lit): _*), col("pos") + 1))
    stacked.groupBy("column_name")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("value").isNull.cast("long")).as("n_null"),
        countDistinct("value").as("n_distinct"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .orderBy("column_name")
  }

  /** q128 — referential-integrity audit across the star schema's FK
    * edges plus primary-key uniqueness, one row per check. Each FK check
    * is `child ▷ parent` (anti join) on the key projection; each PK check
    * counts keys seen more than once. All-zero violations is the
    * expected (and still verified) result.
    */
  private def q128(s: SparkSession, dir: String): DataFrame = {
    def fkOrphans(name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String): DataFrame =
      child.select(col(childKey))
        .join(parent.select(col(parentKey)),
          col(childKey) === col(parentKey), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))
    def pkDupes(name: String, t: DataFrame, key: String): DataFrame =
      t.groupBy(key).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .agg(coalesce(sum(col("n") - 1), lit(0L)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))
    val li = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    val p = Tables.load(s, dir, "part")
    val sup = Tables.load(s, dir, "supplier")
    Seq(
      fkOrphans("fk_lineitem_orders", li, "l_orderkey", o, "o_orderkey"),
      fkOrphans("fk_lineitem_part", li, "l_partkey", p, "p_partkey"),
      fkOrphans("fk_lineitem_supplier", li, "l_suppkey", sup, "s_suppkey"),
      fkOrphans("fk_orders_customer", o, "o_custkey", c, "c_custkey"),
      pkDupes("pk_orders", o, "o_orderkey"),
      pkDupes("pk_customer", c, "c_custkey"))
      .reduce(_.unionByName(_))
      .orderBy("check_name")
  }

  /** q167 — winsorization (percentile outlier capping): per returnflag,
    * clip `l_extendedprice` to its group [p05, p95] band and report how
    * many values each tail clipped plus the winsorized total. Two fact
    * passes by construction (exact percentiles need the full
    * distribution before any value can clip); the 6-row fence table
    * broadcasts back, so the clip pass adds no shuffle. At 100 TB the
    * fence pass swaps `percentile` for `approx_percentile` (the q142
    * scale note) — clipping semantics are unchanged. Exact interpolated
    * percentiles match DuckDB `quantile_cont` (q38 doctrine). The
    * winsorized sum DECOMPOSES instead of accumulating doubles:
    * unclipped prices are cents-exact → an exact integer mid-sum, and
    * each clipped tail contributes count × fence — ONE multiplication
    * per tail, so the final three-term double expression is
    * bit-identical across engines at ANY scale. (The r10 spelling
    * `round(sum(double), 2)` was oracle-green at sf0.01 but the r11
    * sf1 gate measured 2e-2 of accumulation-order drift at 6M rows —
    * exactly the fp class the gate exists to catch.)
    */
  private def q167(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_returnflag").as("rf"), col("l_extendedprice").as("x"))
    val fences = li.groupBy("rf").agg(
      percentile(col("x"), lit(0.05)).as("lo"),
      percentile(col("x"), lit(0.95)).as("hi"))
    li.join(broadcast(fences), "rf")
      .groupBy("rf")
      .agg(count(lit(1)).as("n"),
        sum(when(col("x") < col("lo"), 1).otherwise(0)).cast("long")
          .as("n_clip_lo"),
        sum(when(col("x") > col("hi"), 1).otherwise(0)).cast("long")
          .as("n_clip_hi"),
        sum(when(col("x") >= col("lo") && col("x") <= col("hi"),
          round(col("x") * 100).cast("long")).otherwise(0L))
          .as("mid_cents"),
        min(col("lo")).as("lo"), min(col("hi")).as("hi"))
      .select(col("rf"), col("n"), col("n_clip_lo"), col("n_clip_hi"),
        (col("mid_cents") / 100.0 + col("n_clip_lo") * col("lo")
          + col("n_clip_hi") * col("hi")).as("winsorized_sum"))
      .orderBy("rf")
  }

  private val psiBins = 16
  private val psiBinW = 32

  /** q192 — distribution-drift audit: population stability index of each
    * source's token-length distribution against the whole corpus — the
    * scheduled check that flags a crawler source whose content shifted
    * (truncation bugs, template floods, language drift) before it
    * poisons a training mixture. Lengths bin into 16 fixed-width buckets
    * (the q98 histogram doctrine) and PSI = Σ (aᵢ−eᵢ)·ln(aᵢ/eᵢ) with
    * add-one smoothing over the fixed bin universe, so empty bins
    * contribute finitely and no epsilon constant appears.
    *
    * ONE corpus scan: per-(source, bin) counts roll up to both the
    * per-source actuals and (summed across sources) the global expected
    * — everything after the first aggregate runs at source×16 grain.
    * Parity: each term is division-of-exact-integers → ln → multiply,
    * the identical IEEE sequence both engines; only the 16-term sum
    * rounds (6 dp absorbs accumulation order, q185 doctrine).
    */
  private def q192(s: SparkSession, dir: String): DataFrame =
    psi(s, Tables.loadParallel(s, dir, "documents"))

  /** PSI of each source's token-length histogram vs the whole of `docs`
    * (columns: source, text) — the q192 body, seamed for fixture specs.
    */
  private[graft] def psi(s: SparkSession, docs: DataFrame): DataFrame = {
    val sc = docs
      .select(col("source"),
        least(floor(TextOps.nToks(col("text")) / psiBinW), lit(psiBins - 1))
          .cast("int").as("bin"))
      .groupBy("source", "bin").agg(count(lit(1)).as("c"))
    val grid = sc.select("source").distinct()
      .crossJoin(s.range(psiBins).select(col("id").cast("int").as("bin")))
    val full = grid.join(sc, Seq("source", "bin"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val ns = full.groupBy("source").agg(sum("c").as("n_s"))
    val gb = full.groupBy("bin").agg(sum("c").as("g"))
    val ng = full.agg(sum("c").as("n_g"))
    val a = (col("c") + 1).cast("double") /
      (col("n_s") + psiBins).cast("double")
    val e = (col("g") + 1).cast("double") /
      (col("n_g") + psiBins).cast("double")
    full.join(broadcast(ns), "source").join(broadcast(gb), "bin")
      .crossJoin(broadcast(ng))
      .select(col("source"), col("n_s"), ((a - e) * log(a / e)).as("term"))
      .groupBy("source", "n_s")
      .agg(round(sum("term"), 6).as("psi6"))
      .select(col("source"), col("n_s").as("n_docs"), col("psi6"))
      .orderBy("source")
  }

  // --- q274: Benford first-digit audit -------------------------------------

  /** Benford expected first-digit shares log₁₀(1+1/d), micro-quantized —
    * plan-time public constants, so no engine ever evaluates a log. */
  private val benfordMicro =
    Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L,
      51153L, 45757L)

  /** q274 — BENFORD'S-LAW first-digit audit of order totals, the classic
    * forensic screen for fabricated/synthetic monetary data: the observed
    * first-significant-digit distribution against log₁₀(1+1/d), with
    * per-digit deviations in exact integer micro-shares. The first digit
    * comes from exact CENTS arithmetically — `cents div
    * 10^(len(str(cents))−1)` — never from formatting a double (×100
    * preserves the leading digit; bigint→string is engine-identical).
    * Expected shares are micro-quantized literals, so the only doubles
    * are the two final ratio columns. One scan to digit grain (9 rows),
    * total as a broadcast scalar. On this synthetic corpus the audit
    * correctly FLAGS non-Benford pricing (uniform-ish totals) — the
    * operator, not the corpus, is under test (q64's calibration stance).
    */
  private def q274(s: SparkSession, dir: String): DataFrame = {
    val cents = round(col("o_totalprice") * 100).cast("long")
    val digits = Tables.load(s, dir, "orders")
      .select(cents.as("c"))
      .filter(col("c") > 0)
      .withColumn("d",
        substring(col("c").cast("string"), 1, 1).cast("int"))
      .groupBy("d").agg(count(lit(1)).as("n"))
    val tot = digits.agg(sum("n").as("total"))
    digits.crossJoin(broadcast(tot))
      .withColumn("share_micro", expr("n * 1000000 div total"))
      .withColumn("expected_micro",
        element_at(array(benfordMicro.map(lit): _*), col("d")))
      .select(col("d"), col("n"), col("share_micro"), col("expected_micro"),
        abs(col("share_micro") - col("expected_micro")).as("dev_micro"),
        (col("n").cast("double") / col("total")).as("share"))
      .orderBy("d")
  }

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q274_benford_audit" -> q274 _,
    "q127_column_profile" -> q127 _,
    "q128_integrity_audit" -> q128 _,
    "q167_winsorize" -> q167 _,
    "q192_psi_drift" -> q192 _)

  override val oracle: Seq[(String, String)] = Seq(
    "q274_benford_audit" -> {
      val arr = s"[${benfordMicro.mkString(", ")}]"
      s"""WITH c AS (
         | SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
         | FROM orders),
         |d AS (SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) AS INT)
         |   AS d, CAST(count(*) AS BIGINT) AS n
         | FROM c WHERE c > 0 GROUP BY 1),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM d)
         |SELECT d, n,
         | CAST(n * 1000000 // total AS BIGINT) AS share_micro,
         | CAST($arr[d] AS BIGINT) AS expected_micro,
         | CAST(abs(n * 1000000 // total - $arr[d]) AS BIGINT) AS dev_micro,
         | CAST(n AS DOUBLE) / total AS share
         |FROM d, t ORDER BY d""".stripMargin
    },
    "q192_psi_drift" ->
      s"""WITH t AS (
         | SELECT source,
         |  CAST(least(CAST(floor(
         |   len(list_filter(string_split(text, ' '), x -> x <> ''))
         |    / $psiBinW) AS INT), ${psiBins - 1}) AS INT) AS bin
         | FROM documents),
         |sc AS (SELECT source, bin, count(*) AS c FROM t GROUP BY 1, 2),
         |grid AS (
         | SELECT source, CAST(bin AS INT) AS bin
         | FROM (SELECT DISTINCT source FROM t)
         | CROSS JOIN (SELECT unnest(range(0, $psiBins)) AS bin)),
         |f AS (
         | SELECT g.source, g.bin, COALESCE(sc.c, 0) AS c
         | FROM grid g LEFT JOIN sc ON g.source = sc.source
         |                          AND g.bin = sc.bin),
         |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s
         |       FROM f GROUP BY 1),
         |gb AS (SELECT bin, CAST(sum(c) AS BIGINT) AS g FROM f GROUP BY 1),
         |ng AS (SELECT CAST(sum(c) AS BIGINT) AS n_g FROM f),
         |terms AS (
         | SELECT f.source, ns.n_s,
         |  (CAST(f.c + 1 AS DOUBLE) / CAST(ns.n_s + $psiBins AS DOUBLE)
         |   - CAST(gb.g + 1 AS DOUBLE) / CAST(ng.n_g + $psiBins AS DOUBLE))
         |  * ln((CAST(f.c + 1 AS DOUBLE) / CAST(ns.n_s + $psiBins AS DOUBLE))
         |     / (CAST(gb.g + 1 AS DOUBLE)
         |        / CAST(ng.n_g + $psiBins AS DOUBLE))) AS term
         | FROM f JOIN ns ON f.source = ns.source
         |        JOIN gb ON f.bin = gb.bin
         |        CROSS JOIN ng)
         |SELECT source, n_s AS n_docs, round(sum(term), 6) AS psi6
         |FROM terms GROUP BY source, n_s ORDER BY source""".stripMargin,
    "q167_winsorize" ->
      """WITH f AS (
        | SELECT l_returnflag AS rf,
        |  quantile_cont(l_extendedprice, 0.05) AS lo,
        |  quantile_cont(l_extendedprice, 0.95) AS hi
        | FROM lineitem GROUP BY 1),
        |g AS (
        | SELECT l.l_returnflag AS rf, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_clip_lo,
        |  CAST(sum(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_clip_hi,
        |  CAST(sum(CASE WHEN l_extendedprice >= lo AND l_extendedprice <= hi
        |       THEN CAST(round(l_extendedprice * 100) AS BIGINT)
        |       ELSE 0 END) AS BIGINT) AS mid_cents,
        |  min(lo) AS lo, min(hi) AS hi
        | FROM lineitem l JOIN f ON l.l_returnflag = f.rf
        | GROUP BY 1)
        |SELECT rf, n, n_clip_lo, n_clip_hi,
        | mid_cents / 100.0 + n_clip_lo * lo + n_clip_hi * hi
        |   AS winsorized_sum
        |FROM g ORDER BY rf""".stripMargin,
    "q127_column_profile" ->
      """WITH stacked AS (
        | SELECT 'l_quantity' AS column_name, l_quantity AS value
        |  FROM lineitem
        | UNION ALL
        | SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        | UNION ALL
        | SELECT 'l_discount', l_discount FROM lineitem
        | UNION ALL
        | SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT column_name, count(*) AS n_rows,
        | CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_null,
        | count(DISTINCT value) AS n_distinct,
        | min(value) AS min_value,
        | max(value) AS max_value,
        | sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
        |FROM stacked GROUP BY column_name ORDER BY column_name""".stripMargin,
    "q128_integrity_audit" ->
      """SELECT 'fk_lineitem_orders' AS check_name,
        | (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |   (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |   AS n_violations
        |UNION ALL
        |SELECT 'fk_lineitem_part',
        | (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |   (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        |UNION ALL
        |SELECT 'fk_lineitem_supplier',
        | (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |   (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
        |UNION ALL
        |SELECT 'fk_orders_customer',
        | (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |   (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |UNION ALL
        |SELECT 'pk_orders',
        | (SELECT COALESCE(CAST(sum(n - 1) AS BIGINT), 0) FROM
        |   (SELECT count(*) AS n FROM orders GROUP BY o_orderkey
        |    HAVING count(*) > 1))
        |UNION ALL
        |SELECT 'pk_customer',
        | (SELECT COALESCE(CAST(sum(n - 1) AS BIGINT), 0) FROM
        |   (SELECT count(*) AS n FROM customer GROUP BY c_custkey
        |    HAVING count(*) > 1))
        |ORDER BY check_name""".stripMargin)
}
