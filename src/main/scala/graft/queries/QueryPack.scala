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
