package graft.functions

import org.apache.spark.sql.{Column, GraftFunctionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `⟨a, b⟩` of two double arrays — the hot loop of every similarity-search
  * operator. The `functions._` formulation
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) allocates an intermediate
  * array per evaluated pair and walks it with interpreted lambdas; this
  * expression is one fused codegen'd loop, no allocation.
  *
  * Element count mismatches are resolved over the common prefix (same as
  * `zip_with` would with nulls dropped); null array in → null out. NaN
  * inputs propagate through the sum as NaN.
  */
case class DoubleArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_array_dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var s = 0.0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** `⟨a, b⟩` for `array<double>` columns — see [[DoubleArrayDotProduct]]. */
  def dotProduct(a: Column, b: Column): Column =
    GraftFunctionBridge.column(DoubleArrayDotProduct(
      GraftFunctionBridge.expression(a), GraftFunctionBridge.expression(b)))
}
