package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named set of verified capabilities: every entry pairs a DataFrame
  * implementation with (usually) a DuckDB-SQL oracle twin.
  *
  * Determinism contract (the driver hash-compares values after sorting
  * columns by name): every query's output must be a deterministic bag of
  * rows AND carry a total ORDER BY replicated in the oracle, so the compare
  * holds whether or not the driver sorts rows.
  *
  * Float parity rules used throughout (see `tools/verify_local.py`):
  *   - row-level arithmetic: emit the raw double (both engines execute the
  *     identical IEEE-754 op sequence → bit-equal); never `round` values
  *     that are exact low-decimal products (e.g. price×discount, 4 decimal
  *     digits) — decimal-string HALF_UP (Spark) vs binary rounding (DuckDB)
  *     diverge exactly on .5 boundaries.
  *   - multi-row double aggregates: wrap in `round(x, 2)` — accumulation
  *     order differs across engines/partitions by ~1 ulp, which rounding
  *     absorbs; the .5-boundary hazard is negligible for noisy sums.
  *   - integer-valued doubles (quantities) and int/long aggregates: exact,
  *     no rounding; cast DuckDB's HUGEINT `sum(int)` to BIGINT in the SQL.
  *   - conditional/grouped AVERAGES of 2-decimal values: never
  *     `round(avg(x), 2)` — the true mean frequently sits exactly on a
  *     .005 midpoint (hit at sf0.1 in q86: 29.045 → 29.04 Spark vs 29.05
  *     DuckDB). Compute Σ(round(x·100)) as exact integer cents, divide by
  *     the count, then by 100: identical IEEE sequence both engines, no
  *     rounding at all.
  */
trait QueryPack {
  def queries: Seq[(String, (SparkSession, String) => DataFrame)]
  def oracle: Seq[(String, String)]

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{lit, pmod, round, sum, when}

  /** Exact 2-dp money sum — the q86/q118 10⁻⁴-unit doctrine promoted
    * to the shared surface by the r11 sf1 oracle gate: each 4-dp-exact
    * money term (price, price×discount products) rounds to an integral
    * ten-thousandth BEFORE the sum, so the aggregate is ONE exact long
    * — bit-reproducible across engines, partition counts, and retries
    * at any scale — and returns to 2-dp money after. The
    * `round(sum(double), 2)` spelling only absorbs accumulation order
    * while the error stays under 5e-3: the sf1 gate measured the TPC-H
    * revenue sums crossing that at 6M rows (and DuckDB's parallel
    * aggregation made the verdict flip run-to-run). Use for any money
    * sum whose TERM COUNT grows with the corpus (global / per-category
    * grains); bounded per-entity sums (per order, per customer) may
    * keep the plain spelling.
    *
    * The FINAL 2-dp rounding is integer half-up (away from zero), NOT
    * `round(double, 2)`: an exact 10⁻⁴-unit total ending in …50 is a
    * half-cent TIE, where Spark rounds the exact decimal HALF_UP but
    * DuckDB rounds the ×100-scaled binary double — one cent apart
    * whenever the fp error lands below the half (the q298 sf1 lesson,
    * same class as `meanRound6`). `(|s|+50) − (|s|+50) mod 100` is
    * half-up by construction, sign restored after; both engines then
    * run the IDENTICAL IEEE steps (long→double, ∕10⁴ — one rounding
    * each), so the result is bit-equal at ANY magnitude. (Totals
    * beyond ±(2⁶³−50) ten-thousandths ≈ 9·10¹⁴ dollars would overflow
    * the +50 under ANSI — far past any plausible corpus.) Oracle twin:
    * [[duckMoneySum2]] — call sites inline its exact output;
    * `MoneyDoctrineSpec` keeps the spellings in lockstep. */
  protected def moneySum2(term: Column): Column =
    money2(sum(round(term * 10000).cast("long")))

  /** Finish an EXACT 10⁻⁴-unit long total to 2-dp money — the tie-safe
    * half-up described on [[moneySum2]], factored out for spellings
    * whose aggregate cannot route through it whole (e.g. a salted
    * two-level sum that carries the exact units across the levels). */
  protected def money2(total: Column): Column = {
    def up(x: Column): Column = {
      val h = x + lit(50L)
      h - pmod(h, lit(100L))
    }
    when(total >= 0, up(total)).otherwise(-up(-total))
      .cast("double") / lit(10000.0)
  }

  /** The DuckDB spelling of [[moneySum2]] — the canonical generator
    * the inline oracle strings must match (asserted by
    * `MoneyDoctrineSpec`). The output is FULLY parenthesized so it
    * composes under division/arithmetic (the first cut's trailing
    * `∕ 10000.0` bound wrongly inside `a ∕ b` ratio spellings —
    * q117/q120 came out 10⁻⁸ off). */
  def duckMoneySum2(expr: String): String = {
    val s = s"sum(CAST(round(($expr) * 10000) AS BIGINT))"
    s"((CASE WHEN $s >= 0 THEN ($s + 50) - ($s + 50) % 100" +
      s" ELSE -((-$s + 50) - (-$s + 50) % 100) END) / 10000.0)"
  }
}

/** The ONE whitespace tokenizer every text-processing pack shares.
  * Oracle parity depends on all Scala call sites and every DuckDB twin
  * (`list_filter(string_split(text, ' '), x -> x <> '')`) computing the
  * same token list — packs must delegate here rather than re-implement,
  * so a tokenizer change can't drift one pack out of lockstep.
  */
object TextOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Non-empty space-separated tokens. */
  def toks(c: Column): Column =
    filter(split(c, " "), t => t =!= lit(""))

  /** Token count (the q50 definition). */
  def nToks(c: Column): Column = size(toks(c))
}
