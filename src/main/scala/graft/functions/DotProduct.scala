package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The higher-order-function form (`aggregate(zip_with(a,b,*),0,+)`) walks
  * interpreted lambda closures per element; this expression compiles to a
  * tight Java loop inside WholeStageCodegen (`doGenCode`), the preference
  * order the engine follows for extensions: native Expression > HOF > UDF.
  * Semantics are identical to the HOF form — a *sequential* left-to-right
  * accumulation in double — so the DuckDB-oracle bit-parity contract of
  * [[Vectors.dot]] is unchanged.
  *
  * Mismatched lengths follow zip semantics (shorter length wins); null
  * array elements are not expected (embedding vectors are dense) and read
  * as 0.0 rather than null, which keeps the loop branch-free.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // (ExpectsInputTypes is not implementable outside the sql package in
  // Spark 4 — AbstractDataType went private[sql] — so validate directly.)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects (array<double>, array<double>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object DotProduct {
  /** Register `graft_dot` on a session's extensions (used by
    * [[graft.Sessions]]; any externally-built session can do the same).
    */
  def inject(e: SparkSessionExtensions): Unit =
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
}
