package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Round-7 pipeline additions: dedup cluster resolution (connected
  * components), within-doc repetition stats, PII redaction, and benchmark
  * decontamination. The CC tests pit the large-star/small-star
  * implementation against a local union-find ground truth on adversarial
  * graph shapes (long chains stress O(log n) convergence; random graphs
  * stress correctness).
  */
class PipelineExtrasSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def clustersOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    PipelineOps.dedupClusters(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Local union-find ground truth: component → its minimum id. */
  private def truthOf(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("dedupClusters: long chain collapses to the minimum id") {
    val chain = (0L until 30L).map(i => (i, i + 1))
    val got = clustersOf(chain)
    assert(got.size == 31)
    assert(got.values.forall(_ == 0L), s"all chain members must label 0: $got")
  }

  test("dedupClusters: disjoint components, cycles, and self-loop pairs") {
    val pairs = Seq(
      (5L, 3L), (3L, 9L), (9L, 5L),   // cycle -> 3
      (20L, 21L),                     // pair -> 20
      (40L, 40L),                     // self-loop: dropped, 40 disappears
      (7L, 7L))
    val got = clustersOf(pairs)
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L),
      s"got $got")
  }

  test("dedupClusters: random graphs match union-find ground truth") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 60
      val pairs = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      val got = clustersOf(pairs)
      val want = truthOf(pairs)
      assert(got == want, s"trial $trial: got $got want $want")
    }
  }

  test("dedupClusters: empty input yields empty output") {
    assert(clustersOf(Seq.empty).isEmpty)
  }

  test("withRepetitionStats: hand-computed trigram counts") {
    val df = Seq(
      (1L, "a b a b a b a"),     // trigrams: aba bab aba bab aba -> 5 total, 2 distinct
      (2L, "x y z w"),           // xyz yzw -> 2 total, 2 distinct
      (3L, "t u")                // too short -> 0 / 0
    ).toDF("doc_id", "text")
    val got = PipelineOps.withRepetitionStats(df, n = 3)
      .select($"doc_id", $"total_ngrams", $"distinct_ngrams")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((5L, 2L)), 2L -> ((2L, 2L)), 3L -> ((0L, 0L))))
  }

  test("redactPii: emails, IPs and phones become typed placeholders") {
    val df = Seq(
      "write to jane.doe+x@sub.example.co.uk today",
      "server at 192.168.0.1 rebooted",
      "call +44 123-4567 or +1 555-0100",
      "version 1.2 is not an IP and a@b is not an email",
      "mixed a.b@c.de then 10.0.0.7 then +1 555-0001"
    ).toDF("text").withColumn("red", PipelineOps.redactPii($"text"))
    val got = df.select($"red").as[String].collect()
    assert(got(0) == "write to <EMAIL> today")
    assert(got(1) == "server at <IP> rebooted")
    assert(got(2) == "call <PHONE> or <PHONE>")
    assert(got(3) == "version 1.2 is not an IP and a@b is not an email")
    assert(got(4) == "mixed <EMAIL> then <IP> then <PHONE>")
  }

  test("decontaminate: drops exactly the docs sharing an n-gram; short docs survive") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "intro text then the quick brown fox jumps again"),  // shares 5-gram
      (2L, "completely unrelated words in this document here"),
      (3L, "tiny doc")                                          // < 5 tokens
    ).toDF("doc_id", "text")
    val kept = PipelineOps.decontaminate(corpus, bench, n = 5)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L), s"got $kept")
  }
}
