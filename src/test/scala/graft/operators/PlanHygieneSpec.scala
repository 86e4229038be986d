package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Plan-shape regression guards for the 100 TB design point. These assert
  * the properties that make the query set survive scale-up, independent of
  * row counts:
  *
  *  - no accidental cartesian products anywhere;
  *  - no higher-order-function expression ever lands inside a scan's
  *    DataFilters (the predicate-pushdown inlining trap: a filter on a
  *    derived array column gets substituted into the scan and re-evaluated
  *    per input row — see PipelineOps.tokenHashes docs);
  *  - bounded shuffle counts per query;
  *  - dimension joins actually broadcast.
  */
class PlanHygieneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, dir).queryExecution.executedPlan.toString
    }

  test("no cartesian products") {
    val offenders = plans.collect { case (n, p) if p.contains("CartesianProduct") => n }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("no higher-order functions inside scan DataFilters") {
    val offenders = plans.collect {
      case (n, p) if p.linesIterator.exists(l =>
        l.contains("FileScan") &&
          (l.contains("DataFilters: [") && (l.contains("lambdafunction") || l.contains("transform(")))) => n
    }
    assert(offenders.isEmpty, s"HOF pushed into scan filters in: $offenders")
  }

  // invariant-oracle queries run the operator AND a second exact baseline
  // plus comparison joins — their correctness-checking plans are join-heavy
  // by design, so they get a wider (still bounded) shuffle budget
  private val verificationQueries = Set(
    "q32_minhash_neardup", "q34_simhash", "q36_lsh_ann", "q43_ivf_ann", "q49_winnowing",
    "q63_streaming_heavy_hitters", "q65_embedding_quantization", "q104_pq_ann",
    "q114_pq_persisted_index", "q116_ivfpq_ann")

  // queries that FIT a model over the corpus before scoring it (BM25's
  // tf/df tables, the bigram LM's count model): each model aggregate is
  // its own legitimate exchange, so they get a middle budget — still
  // bounded, and far below the verification tier
  // q120 fuses TWO retrieval models (BM25's tf/df fit + the cosine
  // ranking) before the fusion shuffle, so it sits in this tier too.
  // q131's change feed is a bidirectional multiset diff — two count
  // aggregations plus a null-safe full-outer join is its minimal shape.
  private val modelFitQueries =
    Set("q75_bm25_retrieval", "q77_lm_quality", "q88_tfidf_keywords",
      "q120_hybrid_retrieval", "q131_change_feed")

  test("bounded shuffle count per query") {
    val offenders = plans.collect {
      case (n, p) if p.linesIterator.count(_.contains("Exchange hashpartitioning")) >
        (if (verificationQueries(n)) 14 else if (modelFitQueries(n)) 8 else 4) => n
    }
    assert(offenders.isEmpty, s"shuffle budget exceeded in: $offenders")
  }

  test("no array columns ride an aggregate/distinct exchange in candidate dedup") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => unwrap(w.child)
      case i: org.apache.spark.sql.execution.InputAdapter => unwrap(i.child)
      case other => other
    }
    for (q <- Seq("q32_minhash_neardup", "q36_lsh_ann")) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan
      val offenders = plan.collect {
        case e: ShuffleExchangeExec if unwrap(e.child).isInstanceOf[BaseAggregateExec] &&
            e.output.exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]) => e
      }
      assert(offenders.isEmpty,
        s"$q ships arrays through an aggregate exchange:\n${offenders.mkString("\n")}")
    }
  }

  test("line-dedup family: no exchange carries the raw line column (slim digests only)") {
    // lineDedup / dropBoilerplateLines shuffle 32-byte sha2 digests and
    // (id, pos) integers; the exploded line text must stay in the source
    // partitions (exchange bytes ~ corpus bytes otherwise). Document
    // bytes ride only the final id equi-join payload fetch.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    for (q <- Seq("q160_line_dedup", "q163_boilerplate_lines")) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan
      val offenders = plan.collect {
        case e: ShuffleExchangeExec if e.output.exists(_.name.equalsIgnoreCase("line")) => e
      }
      assert(offenders.isEmpty,
        s"$q ships the raw line column through an exchange:\n${offenders.mkString("\n")}")
    }
  }

  test("ngram-overlap family: gram prep is integer-only (no per-window string concat)") {
    // q67 regression pin (r16): explodedGramHashes must use the token-hash
    // recipe — hash each token once, combine n adjacent hashes — never
    // concat_ws over a slice per window. The concat form allocates
    // O(windows) UTF8 strings inside an interpreted lambda; its cost was
    // both ~10× the integer path and GC-bound enough to read as a phantom
    // bench regression under suite load (r15's q67 `weak`: isolated
    // min-of-7 reproduced 0.86–0.90 s, at r13's level, while the loaded
    // suite run showed 1.89 s).
    for (q <- Seq("q67_ngram_overlap", "q69_dedup_clusters", "q72_decontaminate")) {
      val plan = plans(q)
      assert(!plan.contains("concat_ws"),
        s"$q's gram prep re-grew a per-window string concat:\n" +
          plan.linesIterator.filter(_.contains("concat_ws")).mkString("\n"))
    }
  }

  test("lshAnnPairs normalizes each input exactly once (persisted slim projection)") {
    import org.apache.spark.sql.catalyst.expressions.Sqrt
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import graft.functions.DoubleArrayDotProduct

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val probes = emb.limit(10)
    try {
      for ((df, wantCaches) <- Seq(
          // self-join (embedding near-dup): both sides share ONE cache
          PipelineOps.embeddingNearDupPairs(emb, 0.5, dim = graft.Tables.embeddingDim) -> 1,
          // distinct probe set: one cache per input
          PipelineOps.lshAnnPairs(emb, probes, 0.5, dim = graft.Tables.embeddingDim) -> 2)) {
        val optimized = df.queryExecution.optimizedPlan
        // InMemoryRelation is a logical leaf, so this traversal sees only the
        // plan OUTSIDE the caches: the sqrt(⟨v,v⟩) normalization must never
        // appear there — each input is normalized once, inside its cache.
        val normOutsideCache = optimized.collect { case n => n }
          .filterNot(_.isInstanceOf[InMemoryRelation])
          .flatMap(_.expressions)
          .flatMap(_.collect {
            case s @ Sqrt(DoubleArrayDotProduct(a, b)) if a.semanticEquals(b) => s
          })
        assert(normOutsideCache.isEmpty,
          s"normalization recomputed outside the cache: $normOutsideCache")
        val caches = optimized.collect { case r: InMemoryRelation => r.cacheBuilder }.distinct
        assert(caches.size == wantCaches,
          s"expected $wantCaches distinct normalized caches, got ${caches.size}")
      }
    } finally spark.sqlContext.clearCache()
  }

  test("dimension joins broadcast") {
    for (q <- Seq("q03_shipping_priority", "q05_local_revenue",
        "q20_customers_per_region", "q25_pjparquet_join", "q47_range_join")) {
      assert(plans(q).contains("BroadcastHashJoin"), s"$q lost its broadcast join")
    }
  }

  test("interval-dimension band join stays broadcast-nested-loop") {
    assert(plans("q48_band_join").contains("BroadcastNestedLoopJoin"))
  }

  test("decontamination benchmark gram set broadcasts; corpus side never shuffles grams") {
    // the benchmark set is tiny relative to a 100 TB corpus — the gram
    // semi-join must be a broadcast hash join, not a shuffled one
    assert(plans("q72_decontaminate").contains("BroadcastHashJoin"),
      "benchmark gram join lost its broadcast")
  }

  test("filters and projections reach the scans") {
    // stock parquet: q02 filters lineitem and projects a narrow column set —
    // the scan must show pushed filters and a pruned ReadSchema
    val q02 = plans("q02_filter_project")
    val scanLine = q02.linesIterator.find(l => l.contains("FileScan parquet"))
      .getOrElse(fail(s"no FileScan in q02 plan:\n$q02"))
    assert(scanLine.contains("PushedFilters: [") && !scanLine.contains("PushedFilters: []"),
      s"q02 lost filter pushdown: $scanLine")
    // the scan's output attribute list (ReadSchema gets truncated with "...")
    val scanCols = """FileScan parquet \[([^\]]*)\]""".r.findFirstMatchIn(scanLine)
      .map(_.group(1).split(",").length).getOrElse(Int.MaxValue)
    assert(scanCols <= 6, s"q02 reads $scanCols columns — projection not pruned: $scanLine")

    // pjparquet: q24 projects 3 of 16 order columns through the metadata
    // splice, with pushed filters in the scan description
    val q24 = plans("q24_pjparquet_projection")
    assert(q24.contains("cols=o_orderkey,o_custkey,o_totalprice"),
      s"q24 column splice lost pruning:\n$q24")
    assert(q24.contains("PushedFilters: ["), s"q24 lost filter pushdown:\n$q24")
  }
}
