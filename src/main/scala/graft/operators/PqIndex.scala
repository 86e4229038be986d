package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted product-quantization ANN index for a parquet/pjparquet corpus
  * directory — similarity search that stops re-encoding the corpus per
  * query. Layout, self-describing under the corpus root:
  *
  * {{{
  * <root>/_pq_index/_meta.parquet      one row: id/emb column names, dim,
  *                                     m, codes, the fitted codebooks
  * <root>/_pq_index/codes/src=<key>/   pjparquet table (vec_id, pq_codes,
  *                                     pq_norm), partitioned by a content
  *                                     key of the SOURCE data file
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
  * At 100 TB the codes table is ~32× smaller than the float corpus
  * (m bytes per vector vs 4·dim), scoring reads ONLY codes (m table
  * lookups per row), and the exact re-rank fetches float vectors for just
  * `probes × k·refineFactor` ids by slim id-join.
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

  /** One-time build: fit deterministic codebooks on a bounded id-ordered
    * sample, persist the metadata, then [[maintain]] encodes every file.
    * Rebuilding replaces the whole index (codebooks define the codes).
    */
  def build(
      spark: SparkSession,
      root: String,
      idCol: String,
      embCol: String,
      dim: Int,
      m: Int = 8,
      codes: Int = 16,
      sampleN: Int = 4096): Unit = {
    val corpus = spark.read.format("pjparquet").load(root)
      .select(col(idCol).as("vec_id"), col(embCol).as("embedding"))
    val cb = PipelineOps.pqCodebooks(corpus, dim, m, codes, sampleN)
    val f = fs(spark, indexDir(root))
    f.delete(indexDir(root), true)
    import spark.implicits._
    // codebooks ride a one-row parquet file: no hand-rolled JSON parsing,
    // exact double round-trip
    Seq((idCol, embCol, dim, m, codes, cb.map(_.map(_.toSeq).toSeq).toSeq))
      .toDF("id_col", "emb_col", "dim", "m", "codes", "codebooks")
      .coalesce(1).write.mode("overwrite").parquet(metaDir(root).toString)
    maintain(spark, root)
  }

  private final case class Meta(
      idCol: String, embCol: String, dim: Int, m: Int, codes: Int,
      cb: Array[Array[Array[Double]]])

  private def readMeta(spark: SparkSession, root: String): Meta = {
    val r = spark.read.parquet(metaDir(root).toString).head()
    // nested Row seqs materialize as mutable.ArraySeq — use collection.Seq
    val cb = r.getSeq[scala.collection.Seq[scala.collection.Seq[Double]]](5)
      .map(_.map(_.toArray).toArray).toArray
    Meta(r.getString(0), r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), cb)
  }

  /** (relPath -> content key) of every data file under the corpus root. */
  private def corpusKeys(f: FileSystem, root: Path): Map[String, String] = {
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
          val digest = java.security.MessageDigest.getInstance("MD5")
            .digest(s"$rel|${s.getLen}|${s.getModificationTime}".getBytes("UTF-8"))
          out += (rel -> digest.map(b => f"$b%02x").mkString)
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
  def maintain(spark: SparkSession, root: String): Unit = synchronized {
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
      val encoded = PipelineOps.pqEncode(df, meta.cb, "embedding")
        .select(col("vec_id"), col("pq_codes"), col("pq_norm"), col("src"))
      graft.sources.pjparquet.PjWriter.writeWithIndex(
        encoded, cd.toString, mode = "append", partitionBy = Seq("src"))
    }
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
    */
  def topK(
      spark: SparkSession,
      root: String,
      probes: DataFrame,
      k: Int,
      refineFactor: Int = 4): DataFrame = {
    maintain(spark, root)
    val meta = readMeta(spark, root)
    val corpus = spark.read.format("pjparquet").load(root)
      .select(col(meta.idCol).as("vec_id"), col(meta.embCol).as("embedding"))
    val codes = spark.read.format("pjparquet").load(codesDir(root).toString)
      .select(col("vec_id").as("neighbor_id"), col("pq_codes"), col("pq_norm"))
    PipelineOps.pqAdcRerank(codes, corpus, probes, meta.cb, k, refineFactor)
  }
}
