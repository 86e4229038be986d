package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The fused dot product must agree with the `aggregate(zip_with(...))`
  * formulation on random vectors, in codegen and interpreted paths.
  */
class VectorFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val vec: Gen[Seq[Double]] =
    Gen.chooseNum(0, 16).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-10.0, 10.0)))

  test("matches aggregate(zip_with) on random vectors") {
    val cases = Gen.listOfN(200, Gen.zip(vec, vec))
      .apply(Gen.Parameters.default, Seed(7L)).get
    val df = cases.toDF("a", "b")
      .select(
        VectorFunctions.dotProduct(col("a"), col("b")).as("fast"),
        aggregate(zip_with(col("a"), col("b"), (x, y) =>
          coalesce(x * y, lit(0.0))), lit(0.0), (s, x) => s + x).as("ref"))
    assert(df.filter(abs(col("fast") - col("ref")) > 1e-9).count() == 0)
  }

  test("interpreted path agrees and nulls propagate") {
    val old = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val df = Seq(
        (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
        (Some(Seq.empty[Double]), Some(Seq(1.0))),
        (None: Option[Seq[Double]], Some(Seq(1.0))))
        .toDF("a", "b")
        .select(VectorFunctions.dotProduct(col("a"), col("b")).as("d"))
      val rows = df.collect()
      assert(rows(0).getDouble(0) == 32.0)
      assert(rows(1).getDouble(0) == 0.0)
      assert(rows(2).isNullAt(0))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", old)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
