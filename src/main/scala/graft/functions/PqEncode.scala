package graft.functions

import org.apache.spark.sql.{Column, GraftFunctionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructField, StructType}

/** Product-quantization encode of one vector against literal codebooks —
  * the per-row hot loop of `PipelineOps.pqEncode`: for each of `m`
  * subspaces, the argmin code by `|cb|² − 2⟨sub, cb⟩` (strict `<`, ties to
  * the LOWER code), plus the reconstructed norm
  * `sqrt(Σ_i |cb_i(code_i)|²)`. Output `struct<codes: array<int>,
  * norm: double>`.
  *
  * Bit-for-bit the HOF formulation it replaces: same dot fold order as
  * `DoubleArrayDotProduct` (ascending index over the common prefix when
  * the vector is short), same per-subspace candidate arithmetic, same
  * left-to-right norm sum. The HOF version evaluated `m` interpreted
  * argmin folds of `codes` candidates per row — and Catalyst re-inlined
  * the whole tree into the dependent `pq_norm` column, multiplying it by
  * ~m× again; this is one fused codegen'd pass.
  */
case class PqEncodeVector(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(cb.nonEmpty && cb.forall(_.length == cb(0).length) &&
    cb.forall(_.forall(_.length == cb(0)(0).length)),
    "codebooks must be a rectangular [m][codes][ds] array")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("norm", DoubleType, nullable = false)))

  override def prettyName: String = "pq_encode"

  // |cb_ic|² in array fold order, identical to the driver-side selfDot
  private val self: Array[Array[Double]] =
    cb.map(_.map(_.foldLeft(0.0)((a, x) => a + x * x)))

  override def nullSafeEval(input: Any): Any =
    PqEncodeVector.compute(input.asInstanceOf[ArrayData], cb, self)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val cbRef = ctx.addReferenceObj("pqCb", cb, "double[][][]")
      val selfRef = ctx.addReferenceObj("pqSelf", self, "double[][]")
      val helper = PqEncodeVector.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
        s"$helper.compute($vec, $cbRef, $selfRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeVector =
    copy(child = newChild)
}

object PqEncodeVector {
  /** Shared by interpreted eval and the generated call (same bits). */
  def compute(
      vec: ArrayData,
      cb: Array[Array[Array[Double]]],
      self: Array[Array[Double]]): org.apache.spark.sql.catalyst.InternalRow = {
    val m = cb.length
    val codes = cb(0).length
    val ds = cb(0)(0).length
    val vLen = vec.numElements()
    val out = new Array[Int](m)
    var normSq = 0.0
    var i = 0
    while (i < m) {
      val base = i * ds
      // dot over the common prefix, exactly like slice + DoubleArrayDotProduct
      val lim = math.max(0, math.min(ds, vLen - base))
      var bestD = Double.MaxValue
      var bestC = 0
      var c = 0
      while (c < codes) {
        val w = cb(i)(c)
        var d = 0.0
        var j = 0
        while (j < lim) { d += vec.getDouble(base + j) * w(j); j += 1 }
        val cand = self(i)(c) - 2.0 * d
        if (cand < bestD) { bestD = cand; bestC = c }
        c += 1
      }
      out(i) = bestC
      i += 1
    }
    // norm sum in subspace order (the HOF reduce(_ + _) left fold)
    i = 0
    while (i < m) { normSq += self(i)(out(i)); i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(out), math.sqrt(normSq)))
  }

  /** `struct<codes, norm>` column for a double-array embedding column. */
  def pqEncodeStruct(vec: Column, cb: Array[Array[Array[Double]]]): Column =
    GraftFunctionBridge.column(
      PqEncodeVector(GraftFunctionBridge.expression(vec), cb))
}
