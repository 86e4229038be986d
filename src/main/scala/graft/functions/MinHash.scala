package graft.functions

import org.apache.spark.sql.{Column, GraftFunctionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `numBands` MinHash-LSH band signatures of a hashed-shingle array in
  * ONE fused loop.
  *
  * Semantics are bit-for-bit identical to the HOF composition it replaces
  * in [[graft.operators.PipelineOps.minhashNearDupPairsFromShingles]]:
  *
  *   min_k  = array_min(transform(h, x -> xxhash64(x, k)))       (K mins)
  *   sig_j  = xxhash64(min_{j*r}, ..., min_{j*r+r-1}, j)         (per band)
  *
  * with Spark's exact `xxhash64` fold (seed 42; per element
  * `hashInt(k, hashLong(x, 42))`, a NULL element hashing as
  * `hashInt(k, 42)`; a NULL min — only possible for an EMPTY shingle
  * array — is skipped by the band fold, Spark's null-child rule).
  * Output: `array<long>` of length `numBands`; null input → null (the HOF
  * coerces a null array to the EMPTY-array signature because the band fold
  * skips null children — a fake signature for absent data; the divergence
  * is deliberate and pinned in `MinHashSpec`).
  *
  * The HOF version materializes K = numBands×rowsPerBand intermediate
  * arrays per row and pays O(K × len) interpreted lambda calls; this is a
  * primitive two-level loop with one reused `long[K]` buffer — the hashes
  * per row are the same work, the allocation and dispatch are gone.
  */
case class MinHashBandSigs(child: Expression, numBands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  require(numBands > 0, s"numBands must be positive, got $numBands")
  require(rowsPerBand > 0, s"rowsPerBand must be positive, got $rowsPerBand")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_sigs"

  private val seed = 42L
  private def k: Int = numBands * rowsPerBand

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var t = 0
    while (t < n) {
      val isNull = arr.isNullAt(t)
      val base = if (isNull) seed else XXH64.hashLong(arr.getLong(t), seed)
      var i = 0
      while (i < k) {
        val h = XXH64.hashInt(i, base)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      t += 1
    }
    val out = new Array[Long](numBands)
    var j = 0
    while (j < numBands) {
      var hash = seed
      if (n > 0) {
        var r = 0
        while (r < rowsPerBand) {
          hash = XXH64.hashLong(mins(j * rowsPerBand + r), hash)
          r += 1
        }
      }
      out(j) = XXH64.hashInt(j, hash)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.addMutableState("long[]", "minhashMins",
        v => s"$v = new long[$k];")
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val base = ctx.freshName("base")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val r = ctx.freshName("r")
      val hash = ctx.freshName("hash")
      s"""
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |final int $n = $a.numElements();
         |for (int $t = 0; $t < $n; $t++) {
         |  final long $base = $a.isNullAt($t)
         |    ? ${seed}L
         |    : $xxh.hashLong($a.getLong($t), ${seed}L);
         |  for (int $i = 0; $i < $k; $i++) {
         |    final long $h = $xxh.hashInt($i, $base);
         |    if ($h < $mins[$i]) $mins[$i] = $h;
         |  }
         |}
         |final long[] $out = new long[$numBands];
         |for (int $j = 0; $j < $numBands; $j++) {
         |  long $hash = ${seed}L;
         |  if ($n > 0) {
         |    for (int $r = 0; $r < $rowsPerBand; $r++) {
         |      $hash = $xxh.hashLong($mins[$j * $rowsPerBand + $r], $hash);
         |    }
         |  }
         |  $out[$j] = $xxh.hashInt($j, $hash);
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBandSigs =
    copy(child = newChild)
}

object MinHash {
  /** Band signatures of an `array<bigint>` shingle column —
    * see [[MinHashBandSigs]].
    */
  def minhashBandSigs(shingles: Column, numBands: Int, rowsPerBand: Int): Column =
    GraftFunctionBridge.column(MinHashBandSigs(
      GraftFunctionBridge.expression(shingles), numBands, rowsPerBand))
}
