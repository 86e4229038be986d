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

  test("dedupClusters: local-finish and distributed paths agree exactly") {
    // localFinishEdges=0 forces the pure large-star/small-star loop;
    // the default localizes small graphs via driver union-find — both
    // must produce identical (id, cluster_id) maps
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val pairs = Seq.fill(80)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
        .filter(p => p._1 != p._2)
      val local = clustersOf(pairs)
      val dist = PipelineOps.dedupClusters(
        pairs.toDF("id_a", "id_b"), localFinishEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == dist, s"trial $trial: local $local vs distributed $dist")
      assert(local == truthOf(pairs))
    }
  }

  test("dedupClusters: small long-id graphs resolve locally — no join in the result plan") {
    // q69 regression pin (r17): each star round pays a fixed multi-stage
    // scheduling floor regardless of edge count, which dominated q69's
    // bench time (r16 `weak`); under-threshold graphs must finish via the
    // driver union-find, whose result plan is a plain parallelized
    // relation — any Join/Exchange here means the loop came back
    val pairs = Seq((1L, 2L), (2L, 3L), (9L, 8L)).toDF("id_a", "id_b")
    val plan = PipelineOps.dedupClusters(pairs).queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"local finish must not iterate:\n$plan")
  }

  test("dedupClusters: non-long ids keep the distributed path (types preserved)") {
    val pairs = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("id_a", "id_b")
    val got = PipelineOps.dedupClusters(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"),
      s"got $got")
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

  test("redactPii: widened phone formats, IPv6, and non-PII look-alikes survive") {
    val df = Seq(
      "call (555) 123-4567 now",                     // parenthesized area code
      "or 555.123.4567 or 555-123-4567",             // dotted / dashed 3-3-4
      "intl +1-555-123-4567 and +1 555-0100",        // +CC long and compact
      "v6 2001:db8::1f34 and fe80::aaaa:1 up",       // ::-compressed IPv6
      "full 2001:0db8:0000:0000:0000:ff00:0042:8329 ok", // full 8-group IPv6
      "at 12:34:56 on 2026-08-13 build 1234567890"   // time/date/id: untouched
    ).toDF("text").withColumn("red", PipelineOps.redactPii($"text"))
    val got = df.select($"red").as[String].collect()
    assert(got(0) == "call <PHONE> now")
    assert(got(1) == "or <PHONE> or <PHONE>")
    assert(got(2) == "intl <PHONE> and <PHONE>")
    assert(got(3) == "v6 <IP6> and <IP6> up")
    assert(got(4) == "full <IP6> ok")
    assert(got(5) == "at 12:34:56 on 2026-08-13 build 1234567890")
  }

  test("hashSplit: deterministic under re-layout, fractions respected, stable membership") {
    val df = spark.range(20000).select($"id")
    val a = PipelineOps.hashSplit(df, "id").groupBy($"split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // partition layout must not matter: same assignment after a reshuffle
    val b = PipelineOps.hashSplit(df.repartition(17), "id").groupBy($"split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    // ~10% each for val/test (md5 uniformity; generous 6-sigma-ish bounds)
    assert(a("val") > 1600 && a("val") < 2400, s"val=${a("val")}")
    assert(a("test") > 1600 && a("test") < 2400, s"test=${a("test")}")
    assert(a.values.sum == 20000L)
    // growing the corpus never migrates an existing row between splits
    val before = PipelineOps.hashSplit(df.filter($"id" < 1000), "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = PipelineOps.hashSplit(df, "id").filter($"id" < 1000)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before == after)
    // degenerate fractions
    val none = PipelineOps.hashSplit(df, "id", valFrac = 0.0, testFrac = 0.0)
      .select($"split").distinct().as[String].collect().toSeq
    assert(none == Seq("train"))
  }

  test("profile: exact nulls/distinct/min/max on a hand-built frame") {
    val df = Seq(
      (1L, Some("b"), 10),
      (2L, None, 30),
      (3L, Some("a"), 10),
      (4L, Some("a"), 20)
    ).toDF("id", "s", "n")
    val got = PipelineOps.profile(df, Seq("id", "s", "n"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("s") == ((3L, 1L, 2L, "a", "b")))
    assert(got("n") == ((4L, 0L, 3L, "10", "30")))
  }

  test("chunkDocuments: hand-computed windows, overlap, and short-doc clamp") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),  // n=10, chunk=4, ov=1 -> stride 3: [0,4) [3,7) [6,10)
      (2L, "a b"),                                     // short: single 2-token chunk
      (3L, "x y z w")                                  // exactly one full chunk
    ).toDF("doc_id", "text")
    val got = PipelineOps.chunkDocuments(df, chunkTokens = 4, overlapTokens = 1)
      .select($"doc_id", $"chunk_id", $"start_tok", $"chunk_tokens", $"chunk_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSet
    assert(got == Set(
      (1L, 0L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 1L, 3L, 4L, "t4 t5 t6 t7"),
      (1L, 2L, 6L, 4L, "t7 t8 t9 t10"),
      (2L, 0L, 0L, 2L, "a b"),
      (3L, 0L, 0L, 4L, "x y z w")), s"got $got")
  }

  test("resampleByWeight: floor copies plus deterministic fractional id-slice") {
    val df = (0L until 10L).map(i => (i, if (i < 6) "en" else "de")).toDF("doc_id", "lang")
    // en w=2.5: ids 0..5 -> 2 copies each + 1 extra where id%1000 < 500 (ids 0..5 all <500 -> 3 each)
    // de w=0.3: ids 6..9 -> 1 copy where id%1000 < 300 (all of 6..9 < 300 -> 1 each)
    val got = PipelineOps.resampleByWeight(df, Map("en" -> 2.5, "de" -> 0.3))
      .groupBy($"lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("en" -> 18L, "de" -> 4L), s"got $got")
    // a stratum with no weight disappears
    val none = PipelineOps.resampleByWeight(df, Map("en" -> 1.0))
      .filter($"lang" === "de").count()
    assert(none == 0L)
  }

  test("bm25TopK: tf monotonicity, absent terms, rank order, id tie-break") {
    val df = Seq(
      (1L, "apple apple banana"),   // tf(apple)=2
      (2L, "apple banana banana"),  // tf(apple)=1, same length -> ranks below 1
      (3L, "cherry cherry cherry"), // no query terms: absent from results
      (4L, "apple banana banana"),  // identical to doc 2: same score, ties by id
      (5L, "pear apple")            // shorter doc: length norm boosts tf=1
    ).toDF("doc_id", "text")
    val got = PipelineOps.bm25TopK(df, Seq(0L -> "apple"), k = 10)
      .orderBy($"rank")
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(got.map(_._2).toSet == Set(1L, 2L, 4L, 5L), s"got ${got.toSeq}")
    assert(got.map(_._1).toSeq == Seq(1, 2, 3, 4))
    // doc 1 (tf=2) beats docs 2/4 (tf=1, same dl); 2 beats 4 only by id
    val pos = got.map(_._2).zipWithIndex.toMap
    assert(pos(1L) == 0)
    assert(pos(2L) < pos(4L))
    // multi-term query: doc matching both terms outranks single-term docs
    val multi = PipelineOps.bm25TopK(df, Seq(7L -> "apple pear"), k = 3)
      .filter($"rank" === 1).select($"query_id", $"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(multi.toSeq == Seq((7L, 5L)))
  }

  test("withLmScore: frequent collocations outscore token soup; short docs get null") {
    val df = Seq(
      (1L, "a b a b a b"),   // bigrams ab/ba occur 3x/2x corpus-wide
      (2L, "c d e f g h"),   // every bigram unique
      (3L, "x")              // no bigrams
    ).toDF("doc_id", "text")
    val got = PipelineOps.withLmScore(df)
      .select($"doc_id", $"n_bigrams", $"lm_logprob")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2))))).toMap
    assert(got(3L).isEmpty)
    val (n1, s1) = got(1L).get
    val (n2, s2) = got(2L).get
    assert(n1 == 5L && n2 == 5L)
    assert(s1 > s2, s"repetitive doc must outscore unique-bigram doc: $s1 vs $s2")
    // hand-check doc 1: V=9 distinct tokens; C(a,b)=3, C(a·)=3; C(b,a)=2, C(b·)=2
    val expect1 = (3 * math.log(4.0 / (3 + 9)) + 2 * math.log(3.0 / (2 + 9))) / 5
    assert(math.abs(s1 - expect1) < 1e-12, s"$s1 vs $expect1")
  }

  test("semanticDedupPairs: planted duplicates always found, output subset of exact") {
    val rnd = new scala.util.Random(7)
    val base = (0L until 120L).map { i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))
    }
    // plant exact duplicates (identical vectors assign to identical
    // clusters, so clustering can never split them) + one zero vector
    val planted = base ++ Seq(
      (200L, base(5)._2), (201L, base(17)._2), (202L, Array.fill(16)(0f)))
    val df = planted.toDF("vec_id", "embedding")
    val got = PipelineOps.semanticDedupPairsWithHandle(df, minCosine = 0.999, nClusters = 4)
    val pairs = got._1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got._2.close()
    assert(pairs.contains((5L, 200L)), s"missed planted dup, got $pairs")
    assert(pairs.contains((17L, 201L)), s"missed planted dup, got $pairs")
    // subset-of-exact: every emitted pair really has cosine >= threshold
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val byId = planted.toMap
    pairs.foreach { case (x, y) =>
      assert(cos(byId(x), byId(y)) >= 0.999 - 1e-9, s"pair ($x,$y) below threshold")
    }
    // the zero vector never pairs
    assert(!pairs.exists(p => p._1 == 202L || p._2 == 202L))
  }

  test("incrementalDedup: history hashes block, in-batch dups collapse to earliest id") {
    val seen = Seq((100L, "already ingested")).toDF("doc_id", "text")
      .select(sha2($"text", 256).as("content_hash"))
    val fresh = Seq(
      (1L, "already ingested"),  // blocked by history
      (2L, "brand new"),
      (5L, "repeated in batch"),
      (3L, "repeated in batch"), // collapses with 5 -> keeper id 3
      (4L, "another new")
    ).toDF("doc_id", "text")
    val got = PipelineOps.incrementalDedup(fresh, seen)
      .select($"doc_id", $"dup_count")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 1L, 3L -> 2L, 4L -> 1L), s"got $got")
  }

  test("bloomPreFilter: zero false negatives, real reduction, join-transparent") {
    val big = (0L until 20000L).toDF("k")
    val smallKeys = (0L until 20000L by 100).toDF("k") // 200 true matches
    val filtered = PipelineOps.bloomPreFilter(big, smallKeys, "k",
      expectedItems = 1000L, fpp = 0.01)
    val keptKeys = filtered.collect().map(_.getLong(0)).toSet
    // every true match survives (bloom filters cannot false-negative)
    (0L until 20000L by 100).foreach(k => assert(keptKeys.contains(k), s"lost true key $k"))
    // the filter actually filters: ~200 true + ~1% fp of 19800 << big
    assert(keptKeys.size < 2000, s"no meaningful reduction: ${keptKeys.size} of 20000 kept")
    // transparency: join after pre-filter == plain join
    val joined = filtered.join(smallKeys.withColumnRenamed("k", "sk"), $"k" === $"sk").count()
    assert(joined == 200L)
    // string keys take the string path
    val bigS = Seq("a", "b", "c", "d").toDF("s")
    val gotS = PipelineOps.bloomPreFilter(bigS, Seq("b", "d").toDF("s"), "s",
      expectedItems = 10L).collect().map(_.getString(0)).toSet
    assert(Set("b", "d").subsetOf(gotS))
  }

  test("withScriptStats: hand-computed codepoint counters") {
    val df = Seq(
      (1L, "abc 12 的是"),  // 4 letters+digits... ascii: 'abc 12 ' = 7, digits 2, spaces 2, cjk 2, total 9
      (2L, ""),
      (3L, "只有中文没有空格")
    ).toDF("doc_id", "text")
    val got = PipelineOps.withScriptStats(df)
      .select($"doc_id", $"n_chars_total", $"ascii_chars", $"digit_chars", $"space_chars", $"cjk_chars")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    assert(got(1L) == ((9, 7, 2, 2, 2)), s"got ${got(1L)}")
    assert(got(2L) == ((0, 0, 0, 0, 0)))
    assert(got(3L) == ((8, 0, 0, 0, 8)))
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

  test("rrfFuse: integer 1e6/(k0+rank) fusion with deterministic tie-break") {
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "item_id", "rank")
    val sem = Seq((1L, 11L, 1), (1L, 13L, 2), (1L, 10L, 3))
      .toDF("query_id", "item_id", "rank")
    val fused = PipelineOps.rrfFuse(Seq(lex, sem), k = 3)
      .orderBy($"fused_rank")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    // item 11: 1e6/62 + 1e6/61 = 16129 + 16393 = 32522
    // item 10: 1e6/61 + 1e6/63 = 16393 + 15873 = 32266
    // item 12: 1e6/63 = 15873; item 13: 1e6/62 = 16129 -> 13 beats 12
    assert(fused.toSeq == Seq((11L, 32522L, 1), (10L, 32266L, 2), (13L, 16129L, 3)),
      s"got ${fused.toSeq}")
  }

  test("removeRepeatedSpans excises exactly the cross-doc repeated windows") {
    val docs = Seq(
      (1L, "alpha beta gamma delta unique1 words here"),
      (2L, "intro alpha beta gamma delta more text"),
      (3L, "tiny"), // shorter than n: untouched
      (4L, "same same2 same3"), // fully duplicated with 5: fully excised
      (5L, "same same2 same3"))
      .toDF("doc_id", "text")
    val out = PipelineOps.removeRepeatedSpans(docs, n = 3, minDf = 2)
      .select($"doc_id", $"clean_text", $"n_repeated_starts", $"tokens_removed")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // d1: starts 1,2 cover tokens 1..4 ("alpha beta gamma delta")
    assert(out(1L) == (("unique1 words here", 2L, 4L)), s"got ${out(1L)}")
    // d2: starts 2,3 cover tokens 2..5
    assert(out(2L) == (("intro more text", 2L, 4L)), s"got ${out(2L)}")
    assert(out(3L) == (("tiny", 0L, 0L)))
    assert(out(4L) == (("", 1L, 3L)))
    assert(out(5L) == (("", 1L, 3L)))
  }

  test("removeRepeatedSpans respects minDf: a 2-doc repeat survives minDf=3") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c x y"),
      (3L, "p q r s t"))
      .toDF("doc_id", "text")
    val out = PipelineOps.removeRepeatedSpans(docs, n = 3, minDf = 3)
    assert(out.filter($"tokens_removed" > 0).count() == 0L)
    // and at minDf=2 the shared "a b c" window goes from both carriers
    val out2 = PipelineOps.removeRepeatedSpans(docs, n = 3, minDf = 2)
      .select($"doc_id", $"clean_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out2(1L) == "d e" && out2(2L) == "x y" && out2(3L) == "p q r s t")
  }

  test("removeRepeatedSpans keepFirst: the canonical occurrence survives") {
    val docs = Seq(
      (1L, "alpha beta gamma delta unique1 words here"),
      (2L, "intro alpha beta gamma delta more text"),
      (4L, "same same2 same3"),
      (5L, "same same2 same3"))
      .toDF("doc_id", "text")
    val out = PipelineOps.removeRepeatedSpans(docs, n = 3, minDf = 2, keepFirst = true)
      .select($"doc_id", $"clean_text", $"n_repeated_starts", $"tokens_removed")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc 1 holds the canonical (smallest doc_id) occurrences: untouched
    assert(out(1L) == (("alpha beta gamma delta unique1 words here", 0L, 0L)),
      s"got ${out(1L)}")
    // doc 2's copies are non-canonical: excised as before
    assert(out(2L) == (("intro more text", 2L, 4L)), s"got ${out(2L)}")
    // of the full duplicates, exactly the smaller doc_id keeps its text
    assert(out(4L) == (("same same2 same3", 0L, 0L)), s"got ${out(4L)}")
    assert(out(5L) == (("", 1L, 3L)), s"got ${out(5L)}")
    // within one doc the EARLIER position is canonical
    val within = Seq(
      (7L, "x y z pad1 x y z pad2"),
      (8L, "x y z tail"))
      .toDF("doc_id", "text")
    val got = PipelineOps.removeRepeatedSpans(within, n = 3, minDf = 2, keepFirst = true)
      .select($"doc_id", $"clean_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(7L) == "x y z pad1 pad2", s"got ${got(7L)}")
    assert(got(8L) == "tail", s"got ${got(8L)}")
  }
}
