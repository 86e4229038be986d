package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The fused SimHash64 expression must agree bit-for-bit with the
  * `aggregate`/`zip_with` HOF formulation it replaced (the round-4
  * implementation, reproduced here as the reference), in codegen and
  * interpreted paths.
  */
class SimHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Round-4 HOF formulation: per-token xxhash64, ±1 votes per bit,
    * sign → bit. Kept verbatim as the behavioural reference.
    */
  private def simhashHof(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, i) => a + when(call_function("shiftright", h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(0L)),
      lit(0L),
      (acc, b) => acc.bitwiseOR(b))
  }

  private val token: Gen[String] =
    Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.oneOf("the", "quick", "Fuchs", "渡り鳥", "naïve", "", "x"))
  private val doc: Gen[Seq[String]] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, token))

  test("matches the HOF formulation on random docs (codegen path)") {
    val docs = Gen.listOfN(300, doc).apply(Gen.Parameters.default, Seed(11L)).get
    val df = docs.toDF("toks").select(
      SimHash.simhash64(col("toks")).as("fast"),
      simhashHof(col("toks")).as("ref"))
    assert(df.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("interpreted path agrees; empty array and null semantics") {
    val old = spark.conf.get("spark.sql.codegen.wholeStage")
    val oldMode = spark.conf.get("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val df = Seq(
        Some(Seq("a", "b", "c")),
        Some(Seq.empty[String]),
        None: Option[Seq[String]])
        .toDF("toks")
        .select(
          SimHash.simhash64(col("toks")).as("fast"),
          simhashHof(col("toks")).as("ref"))
      val rows = df.collect()
      // row 0: interpreted agrees with the HOF reference
      assert(rows(0).getLong(0) == rows(0).getLong(1))
      // empty array → 0 (all votes at 0 are not strictly positive)
      assert(rows(1).getLong(0) == 0L && rows(1).getLong(1) == 0L)
      // null array → null
      assert(rows(2).isNullAt(0))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", old)
      spark.conf.set("spark.sql.codegen.factoryMode", oldMode)
    }
  }

  test("fused expression outpaces the interpreted HOF formulation") {
    // 20k docs x 50 tokens: the HOF pays O(tokens x 64) interpreted lambda
    // calls per row, the fused loop doesn't — expect ~10x; assert only the
    // direction so scheduler noise can't flake the suite
    val docs = spark.range(20000).select(
      transform(sequence(lit(0), lit(49)),
        i => concat(lit("tok"), (col("id") * 53 + i) % 997)).as("toks")).persist()
    docs.count()
    def time(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      docs.select(max(c)).head()
      (System.nanoTime() - t0) / 1e6
    }
    time(SimHash.simhash64(col("toks"))); time(simhashHof(col("toks"))) // JIT warm-up
    val fused = time(SimHash.simhash64(col("toks")))
    val hof = time(simhashHof(col("toks")))
    docs.unpersist()
    info(f"fused: $fused%.0f ms, HOF: $hof%.0f ms, speedup ${hof / fused}%.1fx")
    assert(fused < hof, f"fused SimHash64 ($fused%.0f ms) not faster than HOF ($hof%.0f ms)")
  }

  test("null token leaves the hash at the seed, like xxhash64(null)") {
    // A null element must vote with h = 42 (the seed), matching how the HOF
    // version's xxhash64 treats a null input.
    val withNull = Seq(Seq[String]("a", null, "b")).toDF("toks")
      .select(
        SimHash.simhash64(col("toks")).as("fast"),
        simhashHof(col("toks")).as("ref"))
      .head()
    assert(withNull.getLong(0) == withNull.getLong(1))
  }
}
