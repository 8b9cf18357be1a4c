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
  import org.apache.spark.sql.functions.{round, sum}

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
    * keep the plain spelling. The DuckDB twin is
    * `round(sum(CAST(round((expr) * 10000) AS BIGINT)) / 10000.0, 2)`. */
  protected def moneySum2(term: Column): Column =
    round(sum(round(term * 10000).cast("long")) / 10000.0, 2)
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
