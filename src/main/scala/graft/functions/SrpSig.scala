package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst signed-random-projection signature over an
  * `array<double>` embedding column: bit p of the result is
  * `sign(Σ_d v_d · w_{p,d}) ≥ 0`, with ±1 hyperplane weights derived
  * from md5 of the public label `srpj|<seed>|<p>|<d>` (the
  * [[Srp.weights]] md5Hash32 convention with a seed slot, so a DuckDB
  * oracle recomputes IDENTICAL weights via SQL `md5(...)`). Unlike
  * [[Srp.sig]] — a 16-bit fixed-width HOF construction over quantized
  * codes, kept for its existing oracle queries — this expression is
  * width-parametric (1..63 bits), dimension-agnostic (weights are
  * cached per observed dims), and compiles to one tight Java loop
  * (the [[DotProduct]] doctrine: native Expression > HOF > UDF).
  *
  * Parity contract: the per-plane dot is a *sequential left-to-right*
  * double accumulation in element order — exactly [[DotProduct]]'s
  * loop, which the repo's oracle queries already prove bit-equal to
  * DuckDB's `list_dot_product`. ±1 weights multiply exactly (sign
  * flip, no rounding), so Scala and DuckDB sum the same IEEE sequence
  * and the `≥ 0` sign test agrees bit-for-bit. Null array elements
  * read as 0.0 (the [[DotProduct]] convention — embeddings are
  * dense); a null ARRAY yields a null signature.
  *
  * Consumed by [[graft.plans.CosineJoinBlocking]], which projects it
  * below a similarity join and bounds the signature hamming distance.
  */
case class SrpSignature(child: Expression, bits: Int, seed: String)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")
  require(seed.matches("[A-Za-z0-9_.-]+"),
    s"seed must be [A-Za-z0-9_.-]+ (it is embedded in codegen and SQL " +
      s"oracle labels), got '$seed'")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_srp_sig expects array<double>, got $t")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_srp_sig"

  override def nullSafeEval(a: Any): Any =
    SrpSignature.compute(a.asInstanceOf[ArrayData], bits, seed)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.functions.SrpSignature.compute(
         |  $a, $bits, "$seed");""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object SrpSignature {

  /** Flattened ±1 weight plane `w(p·dims + d)`, cached per
    * (seed, bits, dims) — md5 is paid once per shape per JVM, not per
    * row. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int),
      Array[Double]]

  private def weights(seed: String, bits: Int,
      dims: Int): Array[Double] =
    cache.computeIfAbsent((seed, bits, dims), _ => {
      val md = java.security.MessageDigest.getInstance("MD5")
      val w = new Array[Double](bits * dims)
      var p = 0
      while (p < bits) {
        var d = 0
        while (d < dims) {
          val hex = md.digest(s"srpj|$seed|$p|$d".getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString.take(8)
          w(p * dims + d) =
            if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
          d += 1
        }
        p += 1
      }
      w
    })

  /** The signature loop — called from both eval and generated code. */
  def compute(v: ArrayData, bits: Int, seed: String): Long = {
    val n = v.numElements()
    val w = weights(seed, bits, n)
    var sig = 0L
    var p = 0
    while (p < bits) {
      val off = p * n
      var acc = 0.0
      var d = 0
      while (d < n) {
        acc += v.getDouble(d) * w(off + d)
        d += 1
      }
      if (acc >= 0.0) sig |= 1L << p
      p += 1
    }
    sig
  }

  /** JVM-array form of the same kernel (identical fold order) — used
    * by [[graft.streaming.SrpStream]]'s state-side twin. */
  def compute(v: Array[Double], bits: Int, seed: String): Long = {
    val n = v.length
    val w = weights(seed, bits, n)
    var sig = 0L
    var p = 0
    while (p < bits) {
      val off = p * n
      var acc = 0.0
      var d = 0
      while (d < n) {
        acc += v(d) * w(off + d)
        d += 1
      }
      if (acc >= 0.0) sig |= 1L << p
      p += 1
    }
    sig
  }
}
