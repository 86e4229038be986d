package graft.functions

import org.apache.spark.sql.{Column, GraftFunctionBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructType}

/** Softmax class probabilities of one sparse feature row against a literal
  * weight matrix — the scoring hot loop of [[graft.operators.TextClassifier]].
  *
  * Input is the classifier's sparse feature encoding
  * `array<struct<i:int, v:double>>`; `weights` is the trained
  * `[class][feature]` matrix, shipped inside the expression (a few KB — the
  * same literal-model pattern as the PQ codebooks). Output is
  * `array<double>` of `classes.length` probabilities.
  *
  * Semantics are bit-for-bit the HOF formulation it replaces (per-class
  * `aggregate(pairs, 0.0, acc + w[i]*v)` margins in array order, then
  * `exp(m - max)` normalized in array order): same fold order, same
  * `java.lang.StrictMath.exp`, so a trained model scores identically. The HOF
  * tree cost O(pairs × classes) interpreted lambda calls per row — and
  * Catalyst re-inlines the whole tree into every downstream reference
  * (argmax, confidence, error vector), multiplying that by ~10× per row;
  * this is one fused codegen'd loop evaluated once.
  */
case class SoftmaxProbsFromPairs(child: Expression, weights: Array[Array[Double]])
    extends UnaryExpression {
  require(weights.nonEmpty && weights.forall(_.length == weights(0).length),
    "weights must be a non-empty rectangular [class][feature] matrix")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 2 && s(0).dataType == IntegerType && s(1).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<i:int,v:double>>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "softmax_probs"

  override def nullSafeEval(input: Any): Any =
    SoftmaxProbsFromPairs.compute(input.asInstanceOf[ArrayData], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, p => {
      val w = ctx.addReferenceObj("softmaxWeights", weights, "double[][]")
      val k = weights.length
      val n = ctx.freshName("n")
      val m = ctx.freshName("margins")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val mx = ctx.freshName("mx")
      val z = ctx.freshName("z")
      val wc = ctx.freshName("wc")
      val row = classOf[InternalRow].getName
      s"""
         |final int $n = $p.numElements();
         |final double[] $m = new double[$k];
         |for (int $c = 0; $c < $k; $c++) {
         |  final double[] $wc = $w[$c];
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    final $row $s = $p.getStruct($j, 2);
         |    $acc += $wc[$s.getInt(0)] * $s.getDouble(1);
         |  }
         |  $m[$c] = $acc;
         |}
         |double $mx = $m[0];
         |for (int $c = 1; $c < $k; $c++) if ($m[$c] > $mx) $mx = $m[$c];
         |double $z = 0.0;
         |for (int $c = 0; $c < $k; $c++) { $m[$c] = java.lang.StrictMath.exp($m[$c] - $mx); $z += $m[$c]; }
         |for (int $c = 0; $c < $k; $c++) $m[$c] /= $z;
         |${ev.value} = new ${classOf[GenericArrayData].getName}($m);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SoftmaxProbsFromPairs =
    copy(child = newChild)
}

object SoftmaxProbsFromPairs {
  /** Interpreted twin of the generated loop (same fold order → same bits). */
  def compute(pairs: ArrayData, weights: Array[Array[Double]]): ArrayData = {
    val k = weights.length
    val n = pairs.numElements()
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      val w = weights(c)
      var acc = 0.0
      var j = 0
      while (j < n) {
        val s = pairs.getStruct(j, 2)
        acc += w(s.getInt(0)) * s.getDouble(1)
        j += 1
      }
      out(c) = acc
      c += 1
    }
    var mx = out(0)
    c = 1
    while (c < k) { if (out(c) > mx) mx = out(c); c += 1 }
    var z = 0.0
    c = 0
    while (c < k) { out(c) = java.lang.StrictMath.exp(out(c) - mx); z += out(c); c += 1 }
    c = 0
    while (c < k) { out(c) /= z; c += 1 }
    new GenericArrayData(out)
  }

  /** Softmax probabilities column for a sparse feature-pairs column. */
  def softmaxProbs(pairs: Column, weights: Array[Array[Double]]): Column =
    GraftFunctionBridge.column(
      SoftmaxProbsFromPairs(GraftFunctionBridge.expression(pairs), weights))
}
