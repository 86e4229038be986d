package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The fused MinHashBandSigs expression must agree bit-for-bit with the
  * `array_min(transform(...xxhash64...))` + band `xxhash64` HOF
  * composition it replaced in `minhashNearDupPairsFromShingles` —
  * including NULL elements, empty arrays, and negative hash values.
  */
class MinHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The original HOF composition, kept verbatim as the reference. */
  private def hofSigs(h: org.apache.spark.sql.Column, numBands: Int,
      rowsPerBand: Int): org.apache.spark.sql.Column = {
    val minhashes = (0 until numBands * rowsPerBand).map(i =>
      array_min(transform(h, x => xxhash64(x, lit(i)))))
    array((0 until numBands).map { j =>
      val rows = minhashes.slice(j * rowsPerBand, (j + 1) * rowsPerBand)
      xxhash64(rows :+ (lit(j): org.apache.spark.sql.Column): _*)
    }: _*)
  }

  private val element: Gen[java.lang.Long] =
    Gen.oneOf(
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(java.lang.Long.valueOf),
      Gen.const(null: java.lang.Long))
  private val shingles: Gen[Seq[java.lang.Long]] =
    Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, element))

  private def check(bands: Int, rows: Int, wholeStage: Boolean): Unit = {
    val docs = Gen.listOfN(200, shingles)
      .apply(Gen.Parameters.default, Seed(bands * 1000L + rows)).get
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", wholeStage.toString)
    try {
      val df = docs.map(s => Tuple1(s)).toDF("h")
      val out = df.select(
        MinHash.minhashBandSigs(col("h"), bands, rows).as("fused"),
        hofSigs(col("h"), bands, rows).as("hof")).collect()
      out.zipWithIndex.foreach { case (r, i) =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"row $i (${docs(i)}): fused=${r.getSeq[Long](0)} hof=${r.getSeq[Long](1)}")
      }
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("matches the HOF composition (codegen path, 4x2 bands)") {
    check(bands = 4, rows = 2, wholeStage = true)
  }

  test("matches the HOF composition (interpreted path, 4x2 bands)") {
    check(bands = 4, rows = 2, wholeStage = false)
  }

  test("matches on other band shapes (8x3, 1x1)") {
    check(bands = 8, rows = 3, wholeStage = true)
    check(bands = 1, rows = 1, wholeStage = true)
  }

  test("empty array and null input edge cases") {
    val df = Seq(
      (1L, Some(Seq.empty[Long])),
      (2L, None: Option[Seq[Long]]),
      (3L, Some(Seq(7L)))).toDF("id", "h")
    val out = df.select(col("id"),
      MinHash.minhashBandSigs(col("h"), 4, 2).as("fused"),
      hofSigs(col("h"), 4, 2).as("hof")).orderBy(col("id")).collect()
    assert(out(0).getSeq[Long](1) == out(0).getSeq[Long](2))
    // INTENTIONAL divergence: a NULL shingle array propagates null (the
    // HOF coerces it to the empty-array signature because the band fold
    // skips null children — a fake signature for absent data). The
    // pipeline never produces null shingle arrays; pin both behaviors.
    assert(out(1).isNullAt(1), "fused: null in, null out")
    assert(!out(1).isNullAt(2) && out(1).getSeq[Long](2) == out(0).getSeq[Long](2),
      "HOF reference: null coerces to the empty signature")
    assert(out(2).getSeq[Long](1) == out(2).getSeq[Long](2))
  }
}
