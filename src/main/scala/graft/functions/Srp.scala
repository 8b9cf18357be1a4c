package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Signed-random-projection (hyperplane-hash) signatures over
  * `array<double>` embedding columns — the shared machinery behind
  * MiningPack's q260/q276 near-dup path and SimilarityPack's q289
  * SRP-blocked semantic decontamination.
  *
  * Design (public SimHash-for-cosine construction, Charikar 2002): per
  * vector, a [[planes]]-bit signature of sign bits
  * `sign(Σ_d qv_d · w_{p,d})` over int8-quantized codes against
  * md5-derived ±1 hyperplanes. Goemans–Williamson gives
  * P[bit p differs] = θ/π, so high-cosine pairs land within a small
  * hamming ball and the 3-segment pigeonhole (hamming ≤ 2 ⇒ at least one
  * segment exactly equal — a guarantee, not a recall estimate) turns the
  * all-pairs search into an equi-join.
  *
  * Engine-parity contract: the ±1 weights are plan-time CONSTANTS derived
  * from md5 of the public `srp|plane|dim` label — Scala computes them with
  * java MessageDigest while the DuckDB oracle recomputes identical values
  * via SQL `md5(...)` (both take the first 8 hex chars as an integer
  * mod 2, the md5Hash32 convention). Quantization keeps the per-plane dot
  * an INTEGER sum — no float accumulation order to disagree on.
  *
  * Scale shape: signatures are pure per-row codegen (the ±1 model is a
  * literal — zero joins, zero shuffles), segments shuffle only
  * `(id, sig, seg_idx, seg_val)`, and heavy double arrays re-join only at
  * O(candidates).
  */
object Srp {

  /** Signature width in bits; 16 keeps the sig an INT and splits into the
    * 6/5/5 pigeonhole segments below. */
  val planes = 16

  /** Embedding dimensionality of the testdata corpus. */
  val dims = 64

  /** ±1 hyperplane weights, `weights(p)(d)` — deterministic plan-time
    * constants (see object doc). */
  lazy val weights: Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dims) { (p, d) =>
      val hex = md.digest(s"srp|$p|$d".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1 else -1
    }
  }

  /** Per-vector int8 quantization scale: `max |v_d| / 127`. */
  def scaleOf(v: Column): Column =
    array_max(transform(v, x => abs(x))) / 127.0

  /** Int8 codes from a double vector and its [[scaleOf]] scale —
    * `floor(x / scale + 0.5)`, round-half-up matching the oracle. */
  def quantize(v: Column, scale: Column): Column =
    transform(v, x => floor(x / scale + 0.5).cast("int"))

  /** The [[planes]]-bit signature of an int-quantized vector column. */
  def sig(qv: Column): Column =
    (0 until planes).map { p =>
      val w = array(weights(p).map(lit(_)): _*)
      val dot = aggregate(zip_with(qv, w, (x, y) => x * y),
        lit(0L), (acc, x) => acc + x)
      when(dot >= 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** The 3 pigeonhole segments of a 16-bit signature as
    * `array<struct<seg_idx int, seg_val int>>` (6/5/5 bit split):
    * hamming(a, b) ≤ 2 flips at most 2 of the 3 segments, so at least one
    * is exactly equal — exploding both sides and equi-joining on
    * (seg_idx, seg_val) finds every such pair. */
  def segments(sig: Column): Column = array(
    struct(lit(0).as("seg_idx"),
      sig.bitwiseAND(lit(0x3f)).as("seg_val")),
    struct(lit(1).as("seg_idx"),
      shiftright(sig, 6).bitwiseAND(lit(0x1f)).as("seg_val")),
    struct(lit(2).as("seg_idx"),
      shiftright(sig, 11).as("seg_val")))

  /** DuckDB CTE body computing `(vec_id, sig)` from a relation `$src`
    * holding `(vec_id, v DOUBLE[])` — the oracle twin of
    * [[scaleOf]]+[[quantize]]+[[sig]]. Emits CTEs named with prefix `$p`:
    * `${p}s`, `${p}qz`, `${p}grid`, `${p}pl`, and the final `${p}sigs`. */
  def duckSigCtes(p: String, src: String): String =
    s"""${p}s AS (SELECT vec_id, v,
       |  list_max(list_transform(v, x -> abs(x)))
       |   / CAST(127.0 AS DOUBLE) AS scale FROM $src),
       |${p}qz AS (SELECT vec_id, v,
       |  list_transform(v,
       |   x -> CAST(floor(x / scale + CAST(0.5 AS DOUBLE)) AS INT)) AS qv
       | FROM ${p}s),
       |${p}grid AS (SELECT p, d,
       |  CASE WHEN CAST('0x' || substring(md5('srp|' || p || '|' || d),
       |    1, 8) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS w
       | FROM range($planes) t1(p), range($dims) t2(d)),
       |${p}pl AS (SELECT vec_id, p, sum(qv[d + 1] * w) AS dt
       | FROM ${p}qz, ${p}grid GROUP BY vec_id, p),
       |${p}sigs AS (SELECT vec_id,
       |  CAST(sum(CASE WHEN dt >= 0 THEN 1 << p ELSE 0 END) AS INT) AS sig
       | FROM ${p}pl GROUP BY vec_id)""".stripMargin
}
