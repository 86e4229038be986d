package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The custom two-pointer intersect-count must agree with Spark's own
  * `array_intersect` on every sorted-distinct input, in both the codegen and
  * interpreted evaluation paths. ScalaCheck generators with a fixed seed
  * (deterministic, no scalatestplus bridge — same pattern as
  * PJCodecPropertySpec).
  */
class SetFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sortedDistinct: Gen[Seq[Long]] =
    Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.distinct.sorted)

  test("matches size(array_intersect) on random sorted-distinct arrays") {
    val cases = Gen.listOfN(200, Gen.zip(sortedDistinct, sortedDistinct))
      .apply(Gen.Parameters.default, Seed(42L)).get
    val df = cases.toDF("a", "b")
      .select(
        SetFunctions.intersectCountSorted(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
    assert(df.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("interpreted path (no codegen) agrees") {
    val old = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val df = Seq(
        (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
        (Seq.empty[Long], Seq(1L)),
        (Seq(-5L, 0L, 7L), Seq(-5L, 0L, 7L))).toDF("a", "b")
        .select(SetFunctions.intersectCountSorted(col("a"), col("b")).as("c"))
      assert(df.collect().map(_.getInt(0)).toSeq == Seq(2, 0, 3))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", old)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("MULTISET semantics on sorted arrays with duplicates (bag intersection)") {
    // each value contributes min(count_a, count_b) — the contract the
    // edit-distance char-bag prefilter relies on
    val sortedWithDups: Gen[Seq[Long]] =
      Gen.listOf(Gen.chooseNum(0L, 12L)).map(_.sorted)
    val cases = Gen.listOfN(300, Gen.zip(sortedWithDups, sortedWithDups))
      .apply(Gen.Parameters.default, Seed(7L)).get
    def bagInter(a: Seq[Long], b: Seq[Long]): Int = {
      val ca = a.groupBy(identity).view.mapValues(_.size)
      val cb = b.groupBy(identity).view.mapValues(_.size).toMap
      ca.map { case (v, n) => math.min(n, cb.getOrElse(v, 0)) }.sum
    }
    val df = cases.toDF("a", "b")
      .select(SetFunctions.intersectCountSorted(col("a"), col("b")).as("c"))
    val got = df.as[Int].collect().toSeq
    val want = cases.map { case (a, b) => bagInter(a, b) }
    assert(got == want, s"multiset mismatch: ${got.zip(want).filter(t => t._1 != t._2).take(5)}")
  }

  test("null propagation") {
    val df = Seq((Some(Seq(1L, 2L)), None: Option[Seq[Long]])).toDF("a", "b")
      .select(SetFunctions.intersectCountSorted(col("a"), col("b")).as("c"))
    assert(df.collect().head.isNullAt(0))
  }
}
