package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Product quantization ([[PipelineOps.pqCodebooks]]/[[PipelineOps.pqEncode]]/
  * [[PipelineOps.pqAnnTopK]]): determinism of the local Lloyd fit, code
  * range/shape, and exactness of the reconstruction norm — the invariants
  * q104's oracle builds on.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val emb = {
    // deterministic synthetic corpus: dim 8, values derived from the id
    val dim = 8
    spark.range(200).select(
      $"id".as("vec_id"),
      array((0 until dim).map(j =>
        sin(($"id" + 1) * (j + 1) * 0.37).cast("float")): _*).as("embedding"))
  }

  test("codebooks are deterministic across fits") {
    val a = PipelineOps.pqCodebooks(emb, dim = 8, m = 4, codes = 8, sampleN = 128)
    val b = PipelineOps.pqCodebooks(emb, dim = 8, m = 4, codes = 8, sampleN = 128)
    assert(a.length == 4 && a(0).length == 8 && a(0)(0).length == 2)
    for (i <- a.indices; c <- a(i).indices)
      assert(java.util.Arrays.equals(a(i)(c), b(i)(c)), s"codebook ($i,$c) differs")
  }

  test("fit sample is the hash-ordered prefix (unbiased, pinned recipe)") {
    // the sample recipe is orderBy(xxhash64(vec_id), vec_id).limit(n):
    // bit-reproducible but NOT the oldest-id prefix. Pin it by (a) proving
    // the sampled set differs from the id-ordered prefix and (b) proving
    // codebooks trained on the full corpus equal codebooks trained on
    // exactly the expected hash-prefix subset — i.e. only those rows fed
    // the fit.
    val expected = emb.orderBy(xxhash64($"vec_id"), $"vec_id").limit(128)
    val expectedIds = expected.select($"vec_id").collect().map(_.getLong(0)).toSet
    val oldestIds = (0L until 128L).toSet
    assert(expectedIds != oldestIds, "hash-ordered sample degenerated to the id prefix")
    val cbFull = PipelineOps.pqCodebooks(emb, dim = 8, m = 4, codes = 8, sampleN = 128)
    val cbSub = PipelineOps.pqCodebooks(expected, dim = 8, m = 4, codes = 8, sampleN = 128)
    for (i <- cbFull.indices; c <- cbFull(i).indices)
      assert(java.util.Arrays.equals(cbFull(i)(c), cbSub(i)(c)),
        s"codebook ($i,$c) differs: fit did not use the pinned hash-prefix sample")
  }

  test("codes are in range and pq_norm is the exact reconstruction norm") {
    val cb = PipelineOps.pqCodebooks(emb, dim = 8, m = 4, codes = 8, sampleN = 128)
    val enc = PipelineOps.pqEncode(emb, cb, "embedding")
      .select($"vec_id", $"pq_codes", $"pq_norm").collect()
    assert(enc.length == 200)
    enc.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length == 4 && codes.forall(c => c >= 0 && c < 8))
      // |x̂|² = Σ_i |cb_i(code_i)|² (disjoint subspaces ⇒ exact)
      val expect = math.sqrt(
        codes.zipWithIndex.map { case (c, i) => cb(i)(c).map(x => x * x).sum }.sum)
      assert(math.abs(r.getDouble(2) - expect) < 1e-9, s"pq_norm mismatch for row $r")
    }
  }

  test("pqAnnTopK returns k exact-re-ranked distinct neighbors per probe") {
    val probes = emb.filter($"vec_id" < 3)
    val out = PipelineOps.pqAnnTopK(emb, probes, k = 4, dim = 8, m = 4, codes = 8,
      sampleN = 128, refineFactor = 8)
    val per = out.groupBy($"probe_id")
      .agg(count(lit(1)).as("n"), countDistinct($"neighbor_id").as("nd")).collect()
    assert(per.length == 3)
    per.foreach(r => assert(r.getLong(1) == 4 && r.getLong(2) == 4))
    // re-ranked scores are exact cosines: spot-check one pair end to end
    val top = out.orderBy($"probe_id", $"rank").first()
    assert(top.getAs[Double]("cos_sim") <= 1.0 + 1e-9)
  }
}
