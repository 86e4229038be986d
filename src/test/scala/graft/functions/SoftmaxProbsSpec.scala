package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The fused [[SoftmaxProbsFromPairs]] expression must agree bit-for-bit
  * with the HOF margins + stable-softmax formulation it replaced (the
  * original TextClassifier scoring path, reproduced here verbatim as the
  * behavioural reference), in both codegen and interpreted paths.
  */
class SoftmaxProbsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The replaced formulation: per-class `aggregate` margin folds in array
    * order, then `exp(m - max)` normalized in array order.
    */
  private def softmaxHof(pairs: Column, weights: Array[Array[Double]]): Column = {
    val margins = array(weights.indices.map { c =>
      val wL = typedlit(weights(c).toIndexedSeq)
      aggregate(pairs, lit(0.0), (acc, s) =>
        acc + element_at(wL, s.getField("i") + 1) * s.getField("v"))
    }: _*)
    val mx = array_max(margins)
    val exps = transform(margins, m => exp(m - mx))
    val z = aggregate(exps, lit(0.0), (a, e) => a + e)
    transform(exps, e => e / z)
  }

  private val dims = 7
  private def weightsGen(k: Int): Gen[Array[Array[Double]]] =
    Gen.listOfN(k * dims, Gen.chooseNum(-40.0, 40.0))
      .map(_.toArray.grouped(dims).toArray)

  private val rowGen: Gen[Seq[(Int, Double)]] =
    Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0, dims - 1), Gen.chooseNum(-3.0, 3.0))))

  test("matches the HOF formulation bit-for-bit (codegen and interpreted)") {
    for (k <- Seq(2, 3, 5)) {
      val weights = weightsGen(k).apply(Gen.Parameters.default, Seed(k.toLong)).get
      val rows = Gen.listOfN(200, rowGen).apply(Gen.Parameters.default, Seed(99L)).get
      val df = rows.toDF("raw").select(
        transform(col("raw"), s =>
          struct(s.getField("_1").as("i"), s.getField("_2").as("v"))).as("pairs"))
      for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
        spark.conf.set("spark.sql.codegen.factoryMode", codegen)
        try {
          val cmp = df.select(
            SoftmaxProbsFromPairs.softmaxProbs(col("pairs"), weights).as("fast"),
            softmaxHof(col("pairs"), weights).as("ref"))
          // bit-exact equality, element by element — no tolerance
          val bad = cmp.filter(
            size(col("fast")) =!= size(col("ref")) ||
              exists(zip_with(col("fast"), col("ref"), (a, b) => a =!= b), x => x))
          assert(bad.count() == 0, s"k=$k mode=$codegen")
        } finally spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("probabilities are a distribution; null pairs → null") {
    val weights = Array(Array(1.0, -2.0, 0.5), Array(-1.0, 2.0, 0.0))
    val df = Seq(Seq((0, 1.0), (2, 0.5)), null).toDF("raw").select(
      transform(col("raw"), s =>
        struct(s.getField("_1").as("i"), s.getField("_2").as("v"))).as("pairs"))
    val out = df.select(
      SoftmaxProbsFromPairs.softmaxProbs(col("pairs"), weights).as("p")).collect()
    val p = out(0).getSeq[Double](0)
    assert(p.length == 2 && math.abs(p.sum - 1.0) < 1e-12 && p.forall(x => x >= 0 && x <= 1))
    assert(out(1).isNullAt(0))
  }

  test("empty pairs row yields the uniform prior (zero margins)") {
    val weights = Array(Array(3.0, 1.0), Array(-2.0, 4.0), Array(0.0, 0.0))
    val df = Seq(Seq.empty[(Int, Double)]).toDF("raw").select(
      transform(col("raw"), s =>
        struct(s.getField("_1").as("i"), s.getField("_2").as("v"))).as("pairs"))
    val p = df.select(SoftmaxProbsFromPairs.softmaxProbs(col("pairs"), weights))
      .head().getSeq[Double](0)
    assert(p.forall(x => math.abs(x - 1.0 / 3) < 1e-12))
  }
}
