package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted product-quantization ANN index for a parquet/pjparquet corpus
  * directory — similarity search that stops re-encoding the corpus per
  * query. Layout, self-describing under the corpus root:
  *
  * {{{
  * <root>/_pq_index/_meta.parquet      one row: id/emb column names, dim,
  *                                     m, codes, the fitted codebooks,
  *                                     nlist + coarse centroids (IVF)
  * <root>/_pq_index/codes/src=<key>/list=<n>/
  *                                     pjparquet table (vec_id, pq_codes,
  *                                     pq_norm), partitioned by a content
  *                                     key of the SOURCE data file and the
  *                                     row's coarse (IVF) list assignment
  * }}}
  *
  * `src` is an MD5 of the source file's (relative path, length, mtime), so
  * incremental maintenance is pure set reconciliation over directory names:
  * new/rewritten files are encoded (one Spark job over exactly those
  * files), vanished/rewritten keys are dropped as whole partitions — no
  * per-row bookkeeping, commit-scoped work. [[maintainIfPresent]] runs from
  * the pjparquet write commits (batch, streaming epoch) and compaction, the
  * same lifecycle as the bloom sidecars, and [[topK]] re-reconciles before
  * querying, so the index is never silently stale.
  *
  * `list` is the row's nearest coarse centroid (classic IVF routing, built
  * with `nlist > 0`): a probe ranks the nlist centroids (driver-side — the
  * centroid table is tiny and already in the meta) and scans ONLY its
  * `nprobe` nearest lists. Because `list` is a Hive partition column of
  * the codes table, that restriction is planning-time partition pruning:
  * at 100 TB the ADC stage reads `nprobe / nlist` of the codes — on top of
  * the codes already being ~32× smaller than the float corpus (m bytes per
  * vector vs 4·dim) — and the exact re-rank fetches float vectors for just
  * `probes × k·refineFactor` ids by slim id-join. This is the IVF-PQ
  * composition every large-scale vector store runs (FAISS `IVFx,PQy`).
  *
  * The stock reader never sees any of it: `_pq_index` starts with `_`, so
  * both Spark's file index and the pjparquet resolver skip it.
  */
object PqIndex {

  private def indexDir(root: String) = new Path(root, "_pq_index")
  private def metaDir(root: String) = new Path(indexDir(root), "_meta.parquet")
  private def codesDir(root: String) = new Path(indexDir(root), "codes")

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** One-time build: fit deterministic codebooks (and, with `nlist > 0`,
    * the IVF coarse quantizer) on a bounded id-ordered sample, persist the
    * metadata, then [[maintain]] encodes every file. Rebuilding replaces
    * the whole index (codebooks define the codes).
    */
  def build(
      spark: SparkSession,
      root: String,
      idCol: String,
      embCol: String,
      dim: Int,
      m: Int = 8,
      codes: Int = 16,
      sampleN: Int = 4096,
      nlist: Int = 0): Unit = {
    require(nlist >= 0, s"pq: nlist must be >= 0, got $nlist")
    val corpus = spark.read.format("pjparquet").load(root)
      .select(col(idCol).as("vec_id"), col(embCol).as("embedding"))
    val cb = PipelineOps.pqCodebooks(corpus, dim, m, codes, sampleN)
    // the coarse quantizer trains on the SAME deterministic sample recipe
    // as the codebooks: hash-ordered limit (unbiased, bit-reproducible —
    // PipelineOps.fitSampleOrder), local Lloyd, full-dim vectors
    val coarse: Array[Array[Double]] =
      if (nlist == 0) Array.empty
      else {
        val sample = corpus.orderBy(PipelineOps.fitSampleOrder(col("vec_id")): _*).limit(sampleN)
          .select(PipelineOps.asDouble(col("embedding")))
          .collect().map(_.getSeq[Double](0).toArray)
        PipelineOps.lloydFit(sample, nlist, iters = 10)
      }
    val f = fs(spark, indexDir(root))
    f.delete(indexDir(root), true)
    import spark.implicits._
    // codebooks ride a one-row parquet file: no hand-rolled JSON parsing,
    // exact double round-trip
    Seq((idCol, embCol, dim, m, codes,
        cb.map(_.map(_.toSeq).toSeq).toSeq,
        nlist, coarse.map(_.toSeq).toSeq))
      .toDF("id_col", "emb_col", "dim", "m", "codes", "codebooks",
        "nlist", "coarse")
      .coalesce(1).write.mode("overwrite").parquet(metaDir(root).toString)
    maintain(spark, root)
  }

  private final case class Meta(
      idCol: String, embCol: String, dim: Int, m: Int, codes: Int,
      cb: Array[Array[Array[Double]]],
      nlist: Int, coarse: Array[Array[Double]])

  private def readMeta(spark: SparkSession, root: String): Meta = {
    val df = spark.read.parquet(metaDir(root).toString)
    val r = df.head()
    def idx(n: String) = df.schema.fieldIndex(n)
    // nested Row seqs materialize as mutable.ArraySeq — use collection.Seq
    val cb = r.getSeq[scala.collection.Seq[scala.collection.Seq[Double]]](idx("codebooks"))
      .map(_.map(_.toArray).toArray).toArray
    // pre-IVF indexes have no nlist/coarse columns: flat (one list)
    val hasIvf = df.schema.fieldNames.contains("nlist")
    val nlist = if (hasIvf) r.getInt(idx("nlist")) else 0
    val coarse =
      if (hasIvf) r.getSeq[scala.collection.Seq[Double]](idx("coarse")).map(_.toArray).toArray
      else Array.empty[Array[Double]]
    Meta(r.getString(idx("id_col")), r.getString(idx("emb_col")),
      r.getInt(idx("dim")), r.getInt(idx("m")), r.getInt(idx("codes")),
      cb, nlist, coarse)
  }

  /** Nearest-coarse-centroid assignment as a codegen'd HOF over literal
    * centroids — same bounded-argmin shape as `pqEncode`'s per-subspace
    * code pick; strict < keeps the lowest list id on ties.
    */
  private def coarseAssign(vec: Column, coarse: Array[Array[Double]]): Column = {
    val nlist = coarse.length
    val cbL = typedlit(coarse.map(_.toIndexedSeq).toIndexedSeq)
    val selfL = typedlit(coarse.map(c => c.map(x => x * x).sum).toIndexedSeq)
    aggregate(
      sequence(lit(0), lit(nlist - 1)),
      struct(lit(Double.MaxValue).as("d"), lit(0).as("c")),
      (acc, c) => {
        val cand = element_at(selfL, c + 1) -
          lit(2.0) * PipelineOps.dot(vec, element_at(cbL, c + 1))
        when(cand < acc.getField("d"),
          struct(cand.as("d"), c.cast("int").as("c"))).otherwise(acc)
      },
      acc => acc.getField("c"))
  }

  /** A probe row's `nprobe` nearest coarse lists as a COLUMN over the
    * broadcast (literal) centroid table — executor-side routing, so a
    * bulk probe batch (corpus-vs-corpus join) never collects a single
    * vector to the driver. The arithmetic is the exact sequential
    * Σ(vⱼ−cⱼ)² a driver loop would produce (zip_with + aggregate fold
    * left), and `array_sort` over (distance, list) structs breaks ties
    * to the lower list id — so routing is bit-identical wherever it runs.
    */
  private def nearestListsCol(vec: Column, coarse: Array[Array[Double]], nprobe: Int): Column = {
    val nlist = coarse.length
    val cbL = typedlit(coarse.map(_.toIndexedSeq).toIndexedSeq)
    val dists = transform(sequence(lit(0), lit(nlist - 1)), c =>
      struct(
        aggregate(
          zip_with(vec, element_at(cbL, c + 1), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("d"),
        c.cast("int").as("c")))
    transform(slice(array_sort(dists), 1, nprobe), s => s.getField("c"))
  }

  /** (relPath -> content key) of every LIVE data file under the corpus
    * root. On a commit-log table ([[graft.sources.pjparquet.PjCommitLog]])
    * "live" means the HEAD snapshot: files retired for time travel are
    * still on disk but must not be encoded into the ANN index — the reads
    * the index serves are HEAD reads.
    */
  private def corpusKeys(f: FileSystem, root: Path): Map[String, String] = {
    // log enabled but zero commits = "not yet logged" -> the directory
    // listing is live (same semantics as batch/streaming/compaction)
    val live: Option[Set[String]] =
      if (graft.sources.pjparquet.PjCommitLog.isEnabled(f, root))
        graft.sources.pjparquet.PjCommitLog.latest(f, root).map(_.files.toSet)
      else None
    val rootQ = f.makeQualified(root).toString
    val out = Map.newBuilder[String, String]
    def walk(dir: Path): Unit = f.listStatus(dir).foreach {
      case s if s.isDirectory =>
        val n = s.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) walk(s.getPath)
      case s if s.isFile =>
        val n = s.getPath.getName
        if (n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")) {
          val rel = f.makeQualified(s.getPath).toString.stripPrefix(rootQ).stripPrefix("/")
          if (live.forall(_.contains(rel))) {
            val digest = java.security.MessageDigest.getInstance("MD5")
              .digest(s"$rel|${s.getLen}|${s.getModificationTime}".getBytes("UTF-8"))
            out += (rel -> digest.map(b => f"$b%02x").mkString)
          }
        }
      case _ =>
    }
    walk(root)
    out.result()
  }

  /** Reconcile the codes table with the corpus: encode files whose content
    * key is unindexed (ONE job over exactly those files), drop partitions
    * whose key no longer exists (rewritten or deleted source files). A
    * fresh index is two directory listings and zero jobs.
    */
  def maintain(spark: SparkSession, root: String): Unit = {
    maintainReturningMeta(spark, root); ()
  }

  /** [[maintain]] that hands back the metadata it already read, so a
    * caller that needs the codebooks next (topK) pays ONE meta read — a
    * driver-side parquet `head()` job — instead of two.
    */
  private def maintainReturningMeta(spark: SparkSession, root: String): Meta = synchronized {
    val meta = readMeta(spark, root)
    val f = fs(spark, new Path(root))
    val current = corpusKeys(f, new Path(root)) // relPath -> key
    val cd = codesDir(root)
    val indexed: Set[String] =
      if (!f.exists(cd)) Set.empty
      else f.listStatus(cd).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("src=")).map(_.stripPrefix("src=")).toSet
    val currentKeys = current.values.toSet
    for (stale <- indexed -- currentKeys)
      f.delete(new Path(cd, s"src=$stale"), true)
    val missing = current.filter { case (_, k) => !indexed.contains(k) }
    if (missing.nonEmpty) {
      // one read over exactly the new files; the (normalized path -> key)
      // literal map routes each row to its source partition
      val paths = missing.keys.toSeq.sorted.map(rel => s"$root/$rel")
      val keyByPath: Map[String, String] = missing.map { case (rel, k) =>
        normalize(f.makeQualified(new Path(s"$root/$rel")).toString) -> k
      }
      val df = spark.read.parquet(paths: _*)
        .select(
          col(meta.idCol).as("vec_id"),
          col(meta.embCol).as("embedding"),
          element_at(typedlit(keyByPath),
            regexp_replace(input_file_name(), "^[a-zA-Z0-9+.-]+:/+", "/")).as("src"))
      val listCol =
        if (meta.nlist > 0) coarseAssign(PipelineOps.asDouble(col("embedding")), meta.coarse)
        else lit(0)
      val encoded = PipelineOps.pqEncode(df, meta.cb, "embedding")
        .withColumn("list", listCol)
        .select(col("vec_id"), col("pq_codes"), col("pq_norm"), col("src"), col("list"))
      graft.sources.pjparquet.PjWriter.writeWithIndex(
        encoded, cd.toString, mode = "append", partitionBy = Seq("src", "list"))
    }
    meta
  }

  private def normalize(uri: String): String =
    uri.replaceFirst("^[a-zA-Z0-9+.-]+:/+", "/")

  /** Commit hook: reconcile iff an index exists under this root (one
    * existence probe otherwise). Wired into the pjparquet batch commit,
    * streaming epoch commit, and compaction publish.
    */
  def maintainIfPresent(spark: SparkSession, root: String): Unit = {
    val exists =
      try fs(spark, metaDir(root)).exists(metaDir(root))
      catch { case _: Exception => false }
    if (exists) maintain(spark, root)
  }

  /** ANN top-k over the PERSISTED codes — [[PipelineOps.pqAnnTopK]]
    * semantics with the encode stage replaced by a pjparquet scan of the
    * codes table (the plan contains a relation with `pq_codes` in its
    * schema and no encode expressions). Reconciles first, so results
    * always reflect the current corpus.
    *
    * With `nprobe > 0` on an IVF index (`build(nlist > 0)`), each probe
    * scans only its `nprobe` nearest lists: the probes (a bounded query
    * set by definition — they are broadcast whole either way) are ranked
    * against the centroid table driver-side, the union of probed lists
    * becomes a LITERAL partition filter on the codes scan (planning-time
    * pruning: unprobed `list=` directories are never listed into the
    * plan), and a broadcast (probe_id, list) pair join restricts each
    * code row to the probes that actually probed its list.
    */
  def topK(
      spark: SparkSession,
      root: String,
      probes: DataFrame,
      k: Int,
      refineFactor: Int = 4,
      nprobe: Int = 0,
      /** `false` skips the reconcile pass (r19): for a PLAN-ONLY probe of
        * a topK the caller is about to run for real anyway (q116's
        * partition-pruning plan fact), the extra corpus walk + codes
        * listing + meta-read job per call buys nothing — the reconcile
        * does not change the produced plan, only the codes table content,
        * which the immediately following reconciled call re-derives.
        * Defaults to `true`: results always reflect the current corpus.
        */
      reconcile: Boolean = true): DataFrame = {
    val meta =
      if (reconcile) maintainReturningMeta(spark, root)
      else readMeta(spark, root)
    val corpus = spark.read.format("pjparquet").load(root)
      .select(col(meta.idCol).as("vec_id"), col(meta.embCol).as("embedding"))
    val codes = spark.read.format("pjparquet").load(codesDir(root).toString)
      .select(col("vec_id").as("neighbor_id"), col("pq_codes"), col("pq_norm"),
        col("list"))
    if (nprobe <= 0 || meta.nlist == 0) {
      // spreadIfNarrow (r19): a flat (nlist=0) codes table is a handful of
      // `src=` files — the ADC scoring pass over it would run on as many
      // tasks as files (profiled: a 450 ms single-task job inside q114).
      // IVF-routed reads below stay untouched: their list-pruning filter
      // must remain adjacent to the scan, and the probed lists already
      // fan out over one file per (src, list) partition.
      PipelineOps.pqAdcRerank(PipelineOps.spreadIfNarrow(codes.drop("list")),
        corpus, probes, meta.cb, k, refineFactor)
    } else {
      // EXECUTOR-SIDE routing: each probe ranks the broadcast centroid
      // literal in its own task — probe vectors never reach the driver,
      // so a 100k-probe bulk batch routes exactly like a 1-probe lookup.
      // The directory-inferred partition column is LONG — keep every side
      // of the filter and join long so no cast lands between the literal
      // IN and the partition pruner.
      val np = math.min(nprobe, meta.nlist)
      val pairDf = probes
        .select(col("vec_id").as("probe_id"),
          explode(nearestListsCol(PipelineOps.asDouble(col("embedding")),
            meta.coarse, np)).as("_list"))
        .select(col("probe_id"), col("_list").cast("long").as("list"))
      // ONE bounded job probes the pair relation: a query-serving probe
      // set (the common case) collects whole — slim (id, list) keys, no
      // vectors — and pays no second job; hitting the bound means a BULK
      // batch, which stays fully distributed
      val maxSmallProbes = 256
      val head = pairDf.limit(maxSmallProbes * np + 1).collect()
      val routed = if (head.length <= maxSmallProbes * np) {
        val probed = head.map(_.getLong(1)).distinct.sorted.toSeq
        val probeIdType = probes.select(col("vec_id")).schema.head.dataType
        val pairLocal = spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(
              head.toSeq.map(r => org.apache.spark.sql.Row(r.get(0), r.getLong(1)))).asJava),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("probe_id", probeIdType),
            org.apache.spark.sql.types.StructField("list",
              org.apache.spark.sql.types.LongType))))
        codes.filter(col("list").isin(probed.map(_.asInstanceOf[Any]): _*))
          .join(broadcast(pairLocal), Seq("list"))
          .select(col("probe_id"), col("neighbor_id"), col("pq_codes"), col("pq_norm"))
      } else {
        // the probed-list literal comes from a distinct-aggregate whose
        // result is bounded by nlist (slim ints, never vectors): planning-
        // time partition pruning on the codes scan survives bulk probes
        val probed = pairDf.select(col("list")).distinct()
          .collect().map(_.getLong(0)).sorted.toSeq
        val pruned =
          if (probed.size >= meta.nlist) codes // probing everything: no filter
          else codes.filter(col("list").isin(probed.map(_.asInstanceOf[Any]): _*))
        // the pair join scopes candidates per probe; pairs are slim
        // (id, list) keys — broadcast-sized even at 100k probes × nprobe
        pruned
          .join(broadcast(pairDf), Seq("list"))
          .select(col("probe_id"), col("neighbor_id"), col("pq_codes"), col("pq_norm"))
      }
      PipelineOps.pqAdcRerank(routed, corpus, probes, meta.cb, k, refineFactor)
    }
  }
}
