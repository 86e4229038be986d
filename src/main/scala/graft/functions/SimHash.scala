package graft.functions

import org.apache.spark.sql.{Column, GraftFunctionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array in one fused loop.
  *
  * Semantics are bit-for-bit identical to the HOF formulation it replaces
  * (`aggregate` over per-token `xxhash64` with ±1 votes per bit, sign →
  * bit): each token is hashed with Spark's `xxhash64` (XXH64, seed 42);
  * for every bit position the vote is +1 when set, −1 when clear; output
  * bit i is 1 iff the vote sum is strictly positive. Empty array → 0L,
  * null array → null. A null token leaves the hash at the seed, exactly as
  * `XxHash64` treats a null input.
  *
  * The HOF version costs O(tokens × 64) interpreted lambda calls per row
  * (the heaviest per-row CPU in the suite); this is a codegen'd primitive
  * loop with a single reused vote buffer and zero allocation per row.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  private val seed = 42L

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var t = 0
    while (t < n) {
      val h =
        if (arr.isNullAt(t)) seed
        else XXH64.hashUTF8String(arr.getUTF8String(t), seed)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var sim = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sim |= (1L << i)
      i += 1
    }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.addMutableState("int[]", "simhashVotes",
        v => s"$v = new int[64];")
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val sim = ctx.freshName("sim")
      s"""
         |java.util.Arrays.fill($votes, 0);
         |final int $n = $a.numElements();
         |for (int $t = 0; $t < $n; $t++) {
         |  final long $h = $a.isNullAt($t)
         |    ? ${seed}L
         |    : $xxh.hashUTF8String($a.getUTF8String($t), ${seed}L);
         |  for (int $i = 0; $i < 64; $i++) {
         |    $votes[$i] += (($h >>> $i) & 1L) == 1L ? 1 : -1;
         |  }
         |}
         |long $sim = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($votes[$i] > 0) $sim |= (1L << $i);
         |}
         |${ev.value} = $sim;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash {
  /** SimHash64 of an `array<string>` column — see [[SimHash64]]. */
  def simhash64(tokens: Column): Column =
    GraftFunctionBridge.column(SimHash64(GraftFunctionBridge.expression(tokens)))
}
