package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns as pure Catalyst higher-order
  * expressions — codegen-friendly, no UDFs, no driver-side state, so they
  * ride inside WholeStageCodegen and scale linearly.
  *
  * The dot product is an explicit *sequential left fold* (`aggregate` over
  * `zip_with`), matching the element order of DuckDB's `list_dot_product`
  * loop — accumulation order is part of the oracle-parity contract for
  * doubles.
  */
object Vectors {
  /** Σ aᵢ·bᵢ — the native codegen'd [[DotProduct]] expression (requires a
    * session built by [[graft.Sessions]] or one that ran
    * `DotProduct.inject`). Same sequential-fold semantics as [[dotHof]].
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Σ aᵢ·bᵢ as pure built-in higher-order functions — works on any
    * session, ~6× slower per element than [[dot]] (interpreted lambdas).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity: dot(a,b) / (‖a‖·‖b‖). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Squared L2 distance as dot(a−b, a−b) — the difference vector is
    * materialized first so the oracle (`list_dot_product(dd, dd)` over the
    * same diff list) runs the identical IEEE op sequence.
    */
  def sqDist(a: Column, b: Column): Column = {
    val d = zip_with(a, b, (x, y) => x - y)
    dot(d, d)
  }
}
