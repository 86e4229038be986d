package graft.functions

import org.apache.spark.sql.{Column, GraftFunctionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Intersection cardinality of two SORTED DISTINCT long arrays by two-pointer
  * merge — O(|a|+|b|), zero allocation, whole-stage-codegen'd.
  *
  * Spark's `array_intersect` builds a hash set per evaluated row; on a
  * candidate-pair verification join that evaluates millions of times per
  * task, the per-row allocation dominates. This expression is the hot-loop
  * replacement for the near-dup verifiers, where shingle sets are produced
  * sorted+distinct by construction: `|∩|` comes from the merge and
  * `|∪| = |a|+|b|-|∩|` needs no second pass.
  *
  * Inputs MUST be sorted ascending. Duplicates are handled with MULTISET
  * semantics (each equal pair consumes one element from both sides, so a
  * value contributes min(count_a, count_b)) — the char-bag edit-distance
  * prefilter relies on this. Null in → null out.
  */
case class SortedLongArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_long_array_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |${ev.value} = 0;
         |int $i = 0, $j = 0;
         |final int $na = $a.numElements(), $nb = $b.numElements();
         |while ($i < $na && $j < $nb) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { ${ev.value}++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongArrayIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SetFunctions {

  /** `|a ∩ b|` for sorted distinct long arrays — see
    * [[SortedLongArrayIntersectCount]] for the contract.
    */
  def intersectCountSorted(a: Column, b: Column): Column =
    GraftFunctionBridge.column(SortedLongArrayIntersectCount(
      GraftFunctionBridge.expression(a), GraftFunctionBridge.expression(b)))
}
