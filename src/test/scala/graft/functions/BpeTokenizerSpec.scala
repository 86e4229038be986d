package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** [[BpeTokenizer]]: exact round-trip for arbitrary text, deterministic
  * training, and the merge semantics q106's invariants build on.
  */
class BpeTokenizerSpec extends AnyFunSuite {

  private val corpus = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quicker the better, the lazier the worse",
    "pack my box with five dozen liquor jugs")

  test("round-trips ANY text exactly, including edge shapes") {
    val model = BpeTokenizer.train(corpus, numMerges = 50)
    val tricky = Seq(
      "", " ", "   ", "a", "the the the",
      "  leading and trailing  ", "tabs\tand\nnewlines\r\n",
      "unicode: 中文 café 😀", // CJK, accents, emoji (surrogate pair)
      "no-spaces-at-all-just-one-long-run")
    tricky.foreach { t =>
      assert(BpeTokenizer.decode(BpeTokenizer.encode(t, model)) == t,
        s"round trip failed for ${t.take(30)}")
    }
    corpus.foreach(t => assert(BpeTokenizer.encode(t, model).mkString == t))
  }

  test("training is deterministic and merges reduce token counts") {
    val a = BpeTokenizer.train(corpus, numMerges = 30)
    val b = BpeTokenizer.train(corpus, numMerges = 30)
    assert(a.merges == b.merges)
    val none = BpeTokenizer.Model(Vector.empty)
    corpus.foreach { t =>
      val untrained = BpeTokenizer.encode(t, none).length
      val trained = BpeTokenizer.encode(t, a).length
      assert(trained < untrained, "50-merge model must compress the training corpus")
      assert(trained <= t.length)
    }
    // "the" appears most — the model should learn to emit it as one token
    assert(BpeTokenizer.encode("the", a) == Vector("the"))
  }

  test("whitespace runs are single tokens; merges never cross whitespace") {
    val model = BpeTokenizer.train(corpus, numMerges = 50)
    val toks = BpeTokenizer.encode("the   the", model)
    assert(toks.contains("   "), "a whitespace run must stay one token")
    assert(toks.forall(t =>
      t.forall(Character.isWhitespace) || !t.exists(Character.isWhitespace)),
      "no token mixes whitespace and non-whitespace")
  }

  test("distributed training equals local training on the same corpus; deep models round-trip") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    // a vocabulary deep enough for >=1k merges: varied identifier words
    val texts = (0 until 3000).map(i =>
      s"row_$i value_${i * 37 % 9973} tag_${(i * i) % 4099} plus some shared words")
    val local = BpeTokenizer.train(texts, numMerges = 1000)
    val distributed = BpeTokenizer.trainDistributed(
      spark, texts.toDF("text").repartition(7), "text", numMerges = 1000)
    // identical counts -> identical tie-breaks -> identical merge list
    assert(distributed.merges == local.merges,
      "distributed counts must reproduce the local model exactly")
    assert(distributed.merges.size == 1000)
    // round-trip exactness survives a deep model
    texts.take(50).foreach { t =>
      assert(BpeTokenizer.encode(t, distributed).mkString == t)
    }
    // the maxVocab cap is deterministic: capping to the most frequent
    // words still trains, still round-trips (unseen words just split finer)
    val capped = BpeTokenizer.trainDistributed(
      spark, texts.toDF("text"), "text", numMerges = 150, maxVocab = 200)
    assert(capped.merges.size == 150)
    texts.take(20).foreach { t =>
      assert(BpeTokenizer.encode(t, capped).mkString == t)
    }
  }

  test("32k-merge production vocab: one corpus pass, bounded wall time, exact round-trip") {
    val spark = graft.SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$sfDir/documents.parquet").exists ||
      new java.io.File(sfDir).isDirectory)
    // the q133 corpus recipe: documents + customer names + order-derived
    // identifier text (the digit/identifier vocabulary that makes a
    // 32k-merge request satisfiable)
    val docs = graft.Tables.documents(spark, sfDir).select(col("text"))
    val names = graft.Tables.customer(spark, sfDir).select(col("c_name").as("text"))
    val orderText = graft.Tables.orders(spark, sfDir).select(
      concat(lit("order_"), col("o_orderkey"), lit(" price_"),
        col("o_totalprice"), lit(" date_"), col("o_orderdate")).as("text"))
    val corpus = docs.unionByName(names).unionByName(orderText)
    val t0 = System.nanoTime()
    val model = BpeTokenizer.trainDistributed(
      spark, corpus, "text", numMerges = 32768, maxVocab = 60000)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(model.merges.size == 32768,
      s"sf0.01 corpus must support a 32k-merge vocabulary, got ${model.merges.size}")
    // production recipe bound: the corpus is aggregated ONCE and the
    // incremental merge loop is O(affected words) per merge — 32k merges
    // must be minutes, not hours (typical local run is well under 2 min)
    assert(secs < 600.0,
      f"32k merges took $secs%.1f s — incremental pair maintenance regressed?")
    // exact round-trip at production depth, over real documents and names
    val sample = docs.limit(40).collect().map(_.getString(0)) ++
      names.limit(40).collect().map(_.getString(0))
    sample.foreach { t =>
      assert(BpeTokenizer.encode(t, model).mkString == t,
        s"round-trip failed at 32k merges for: ${t.take(60)}")
    }
    // greedy-merge prefix property: truncating the SAME model to its
    // first 200 merges can only tokenize worse-or-equal (each extra merge
    // only ever joins adjacent tokens)
    val shallow = BpeTokenizer.Model(model.merges.take(200))
    sample.foreach { t =>
      assert(BpeTokenizer.encode(t, model).size <=
        BpeTokenizer.encode(t, shallow).size,
        "the full model must never tokenize worse than its own 200-merge prefix")
    }
  }

  test("bpeTokenize fit sample is hash-ordered (unbiased across shards), still deterministic") {
    // The operator's local fit sample must use fitSampleOrder (xxhash64 of
    // the id, id tiebreak) — the same unbiased-sampling recipe the ANN fits
    // use — NOT a raw id order that over-weights the oldest shard.
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = spark.range(0, 500)
      .select($"id".as("doc_id"),
        concat(lit("doc text body "), ($"id" % 37).cast("string")).as("text"))
    val out1 = graft.operators.PipelineOps
      .bpeTokenize(docs, numMerges = 40, sampleN = 64)
    // round-trip invariant holds regardless of which docs trained the model
    assert(out1.filter(array_join($"bpe_tokens", "") =!= $"text").count() == 0L)
    // deterministic: re-running yields identical tokenizations
    val sig = out1.agg(sum($"n_bpe_tokens")).head().getLong(0)
    val sig2 = graft.operators.PipelineOps
      .bpeTokenize(docs, numMerges = 40, sampleN = 64)
      .agg(sum($"n_bpe_tokens")).head().getLong(0)
    assert(sig == sig2)
    // the sample genuinely follows fitSampleOrder: the first 64 doc_ids by
    // (xxhash64(id), id) are NOT simply ids 0..63
    val hashFirst = docs.orderBy(graft.operators.PipelineOps.fitSampleOrder($"doc_id"): _*)
      .limit(64).select($"doc_id").as[Long].collect().toSet
    assert(hashFirst != (0L until 64L).toSet, "hash order degenerated to id order")
  }

  test("fast encodeRun is bit-identical to the quadratic reference on adversarial inputs") {
    // A rich model whose merges actually APPLY (the shape that detonated
    // the old loop): train on text with long unbroken identifier runs.
    val trainTexts = (0 until 500).map { i =>
      val b64 = java.util.Base64.getEncoder.encodeToString(
        s"payload-$i-${i * 7919}".getBytes("UTF-8"))
      s"https://example.com/path/$i?tok=$b64 word$i 数据样本第${i}号 aaaa${"ab" * (i % 9)}"
    }
    val model = BpeTokenizer.train(trainTexts, numMerges = 800)
    val rk = model.ranks
    val adversarial = Seq(
      // one long unbroken run — the O(n²) killer
      "x" * 2000,
      "ab" * 1500,
      ("https://example.com/path/42?tok=" +
        java.util.Base64.getEncoder.encodeToString(("blob" * 400).getBytes("UTF-8"))),
      // CJK with no spaces
      "数据样本第一号数据样本第二号" * 50,
      // overlapping same-pair occurrences ("aaa..." with (a,a) learned)
      "a" * 777,
      // mixed: every training shape concatenated, no whitespace
      trainTexts.take(20).map(_.replace(" ", "")).mkString,
      // short edges
      "", "a", "ab", "aba")
    adversarial.foreach { run =>
      val fast = BpeTokenizer.encodeRun(run, rk)
      val ref = BpeTokenizer.encodeRunReference(run, rk)
      assert(fast == ref, s"fast/reference diverged on run of length ${run.length}: " +
        s"fast=${fast.take(8)}... ref=${ref.take(8)}...")
      assert(fast.mkString == run)
    }
    // property sweep: random strings over a tiny alphabet maximize merge
    // applicability and overlap shapes — deterministic seed
    val rnd = new scala.util.Random(20260815L)
    (0 until 200).foreach { _ =>
      val len = 1 + rnd.nextInt(120)
      val s = (0 until len).map(_ => "abc".charAt(rnd.nextInt(3))).mkString
      assert(BpeTokenizer.encodeRun(s, rk) == BpeTokenizer.encodeRunReference(s, rk),
        s"fast/reference diverged on random input: $s")
    }
    // the whole point: linearithmic wall time on a long run
    val long = "ab" * 50000 // 100k chars, merges apply densely
    val t0 = System.nanoTime()
    val toks = BpeTokenizer.encodeRun(long, rk)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(toks.mkString == long)
    assert(ms < 2000.0, f"100k-char encode took $ms%.0f ms — quadratic regression?")
  }

  test("save/load round-trips the model and its encodings exactly") {
    val spark = graft.SparkTestSession.spark
    val model = BpeTokenizer.train(corpus, numMerges = 40)
    val path = java.nio.file.Files.createTempDirectory("bpe_model").toString + "/m.parquet"
    BpeTokenizer.save(spark, model, path)
    val loaded = BpeTokenizer.load(spark, path)
    assert(loaded.merges == model.merges)
    corpus.foreach(t =>
      assert(BpeTokenizer.encode(t, loaded) == BpeTokenizer.encode(t, model)))
  }
}
