package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The fused [[PqEncodeVector]] expression must agree bit-for-bit with the
  * bounded-HOF PQ-encode formulation it replaced (reproduced verbatim as
  * the behavioural reference), in both codegen and interpreted paths.
  */
class PqEncodeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The replaced formulation: per-subspace interpreted argmin fold +
    * self-dot LUT norm.
    */
  private def hofEncode(v: Column, cb: Array[Array[Array[Double]]]): (Column, Column) = {
    val m = cb.length
    val codes = cb(0).length
    val ds = cb(0)(0).length
    def selfDot(i: Int, c: Int): Double = cb(i)(c).map(x => x * x).sum
    def dot(a: Column, b: Column): Column =
      graft.functions.VectorFunctions.dotProduct(a, b)
    val codeCols = (0 until m).map { i =>
      val cbL = typedlit(cb(i).map(_.toIndexedSeq).toIndexedSeq)
      val selfL = typedlit(cb(i).map(c => c.map(x => x * x).sum).toIndexedSeq)
      val s = slice(v, i * ds + 1, ds)
      aggregate(
        sequence(lit(0), lit(codes - 1)),
        struct(lit(Double.MaxValue).as("d"), lit(0).as("c")),
        (acc, c) => {
          val cand = element_at(selfL, c + 1) - lit(2.0) * dot(s, element_at(cbL, c + 1))
          when(cand < acc.getField("d"),
            struct(cand.as("d"), c.cast("int").as("c"))).otherwise(acc)
        },
        acc => acc.getField("c"))
    }
    val selfLut = typedlit(
      (0 until m).flatMap(i => (0 until codes).map(c => selfDot(i, c))).toIndexedSeq)
    val codesCol = array(codeCols: _*)
    val normCol = sqrt((0 until m).map(i =>
      element_at(selfLut, lit(i * codes + 1) + element_at(codesCol, i + 1)))
      .reduce(_ + _))
    (codesCol, normCol)
  }

  test("matches the HOF formulation bit-for-bit, codegen and interpreted") {
    val rnd = new java.util.Random(13)
    val m = 4
    val codes = 16
    val ds = 3
    val cb = Array.fill(m, codes, ds)(rnd.nextDouble() * 2 - 1)
    val dim = m * ds
    // include a short vector (common-prefix dot) and near-tie values
    val rows = Seq.fill(300)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1)) ++
      Seq(Seq.fill(dim - 2)(0.5), Seq.fill(dim)(0.0))
    val df = rows.toDF("v")
    val (refCodes, refNorm) = hofEncode(col("v"), cb)
    val enc = PqEncodeVector.pqEncodeStruct(col("v"), cb)
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val cmp = df.select(
          enc.getField("codes").as("fc"), enc.getField("norm").as("fn"),
          refCodes.as("rc"), refNorm.as("rn"))
        val bad = cmp.filter(col("fc") =!= col("rc") || col("fn") =!= col("rn"))
        assert(bad.count() == 0, s"mode=$mode")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null vector -> null struct; ties break to the lower code") {
    // two identical codes: argmin must pick the lower index
    val cb = Array(Array(Array(1.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0)))
    val df = Seq(Some(Seq(1.0, 0.0)), None).toDF("v")
    val out = df.select(
      PqEncodeVector.pqEncodeStruct(col("v"), cb).as("e")).collect()
    assert(out(0).getStruct(0).getSeq[Int](0) == Seq(0))
    assert(out(1).isNullAt(0))
  }
}
