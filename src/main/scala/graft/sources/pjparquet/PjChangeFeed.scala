package graft.sources.pjparquet

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Change data feed for commit-log tables — the row-level diff a version
  * introduced, labeled Delta-CDF style with `_change_type` ∈ {insert,
  * delete, update_preimage, update_postimage} and `_commit_version`.
  *
  * Zero write amplification: nothing extra is stored at commit time.
  * Because the log already retains each version's file set AND every
  * commit's add/remove delta, the feed is computed at read time from
  * exactly the files the version touched:
  *
  *  - a pure-ADD commit (append, streaming epoch): every row of the added
  *    files is an `insert` — one scan of the new files, no diff;
  *  - a pure-REMOVE commit (metadata DELETE, truncate): every row of the
  *    removed files is a `delete`;
  *  - a REWRITE commit (copy-on-write DML, overwrite): a multiset diff of
  *    the removed vs added files' rows — rows the rewrite carried over
  *    byte-identically cancel, so only genuine changes surface. The
  *    commit's recorded SQL command (`operation`: update/merge) picks
  *    `update_preimage`/`update_postimage` labels; anything else labels
  *    `delete`/`insert`. Layout-only rewrites (compact, OPTIMIZE ZORDER)
  *    diff to an EMPTY feed — the data did not change, and the feed
  *    proves it.
  *
  * 100 TB shape: work is proportional to the files the version touched,
  * never the table; the diff shuffles once on full-row hash, map-side
  * combined by the count aggregation. Versions whose predecessor was
  * expired by vacuum cannot be diffed and fail loudly.
  */
object PjChangeFeed {

  /** Per-version persisted change files: `<root>/_pj_cdc/v=<version>/`.
    * Written at commit time by DML commits of tables with
    * `cdc.enabled=true` (Delta's `delta.enableChangeDataFeed` contract):
    * the copy-on-write rewrite is the only commit class whose change
    * rows need a diff, so persisting exactly those makes the WHOLE feed
    * streamable from plain file scans — appends stream from the table
    * itself, persisted DML changes stream from this directory
    * (`readStream.parquet(root + "/_pj_cdc")`, the `v` partition column
    * carrying the commit version). Pure-add/pure-remove commits never
    * write change files (their rows ARE the committed data files — zero
    * amplification), and a missing cdc dir (crash between commit and
    * cdc write, cdc disabled) degrades to the read-time diff — the feed
    * is self-healing, never wrong.
    */
  private[pjparquet] def cdcDir(root: Path, version: Long): Path =
    new Path(new Path(root, "_pj_cdc"), s"v=$version")

  /** Compute and persist the change rows of a copy-on-write commit
    * (called post-commit from [[PjBatchWrite]] when `cdc.enabled`).
    * Failure is non-fatal by contract — readers recompute.
    */
  private[pjparquet] def persistCommitDiff(
      spark: SparkSession,
      root: String,
      version: Long): Unit = {
    val out = cdcDir(new Path(root), version)
    changesAt(spark, root, version)
      .drop("_commit_version") // the v= partition dir carries it
      .write.mode("overwrite").parquet(out.toString)
  }

  /** The changes commit `version` introduced (relative to `version - 1`).
    * Served from the persisted `_pj_cdc/v=<version>/` files when the
    * commit wrote them, else computed by read-time diff.
    */
  def changesAt(spark: SparkSession, root: String, version: Long): DataFrame = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val cdc = cdcDir(rootPath, version)
    if (fs.exists(cdc)) {
      return spark.read.parquet(cdc.toString)
        .withColumn("_commit_version", lit(version))
    }
    val vs = PjCommitLog.versions(fs, rootPath)
    require(vs.contains(version),
      s"pjparquet: version $version not in the commit log (available: " +
        s"${if (vs.isEmpty) "none" else s"${vs.head}..${vs.last}"})")
    // empty-predecessor treatment applies ONLY to the table's true first
    // commit: when `version - 1` was expired by vacuum the diff base is
    // unknowable, and silently treating it as empty would re-emit every
    // carried-over row as an insert — fail loudly instead (the scaladoc
    // contract)
    val prevFiles: Set[String] =
      if (version == 1L) Set.empty
      else if (!vs.contains(version - 1))
        throw new graft.core.PJException(
          s"pjparquet: cannot compute changes at version $version: its " +
            s"predecessor version ${version - 1} was expired by vacuum " +
            s"(oldest retained: ${vs.min}); no persisted change files exist " +
            "for this version either")
      else PjCommitLog.read(fs, rootPath, version - 1).files.toSet
    val d = PjCommitLog.delta(fs, rootPath, version)
    // idempotent replays may re-add an already-live path: not a change.
    // A legacy full-snapshot commit records the full state as `add`.
    val added: Seq[String] =
      d.add.map(_.path).filterNot(prevFiles.contains)
    val removed: Seq[String] =
      if (d.legacyFull) (prevFiles -- d.add.map(_.path).toSet).toSeq.sorted
      else d.remove.filter(prevFiles.contains)

    val (preLabel, postLabel) = d.operation match {
      case Some("update") | Some("merge") => ("update_preimage", "update_postimage")
      case _ => ("delete", "insert")
    }

    val rootQ = fs.makeQualified(rootPath).toString
    def readRels(rels: Seq[String]): Option[DataFrame] =
      if (rels.isEmpty) None
      else {
        val df = spark.read.option("basePath", rootQ)
          .parquet(rels.map(rel => s"$rootQ/$rel"): _*)
        // partition columns come from directory inference; align their
        // types with the pjparquet convention (LONG when every value
        // parses, else STRING) so the feed's schema matches table reads
        val partVals: Map[String, Seq[String]] = rels
          .flatMap(rel => PjBatchWrite.partsOfRel(rel).toSeq)
          .groupBy(_._1).map { case (k, vs) => k -> vs.flatMap(_._2) }
        Some(partVals.foldLeft(df) { case (acc, (k, vals)) =>
          if (!acc.columns.exists(_.equalsIgnoreCase(k))) acc
          else {
            val allLong = vals.nonEmpty &&
              vals.forall(v => scala.util.Try(v.toLong).isSuccess)
            acc.withColumn(k, col(k).cast(if (allLong) "long" else "string"))
          }
        })
      }

    val pre = readRels(removed)
    val post = readRels(added)
    val out = (pre, post) match {
      case (None, None) =>
        // metadata-only commit: schema from the version itself, zero rows
        spark.read.format("pjparquet").option("versionAsOf", version.toString)
          .load(root).where(lit(false)).withColumn("_change_type", lit(""))
      case (None, Some(p)) => p.withColumn("_change_type", lit(postLabel))
      case (Some(p), None) => p.withColumn("_change_type", lit(preLabel))
      case (Some(a), Some(b)) => multisetDiff(a, b, preLabel, postLabel)
    }
    out.withColumn("_commit_version", lit(version))
  }

  /** Union of [[changesAt]] over `[fromVersion, toVersion]` — the batch
    * CDF read (`startingVersion`/`endingVersion` semantics).
    */
  def changes(spark: SparkSession, root: String, fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"pjparquet: fromVersion $fromVersion > toVersion $toVersion")
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val vs = PjCommitLog.versions(fs, rootPath)
      .filter(v => v >= fromVersion && v <= toVersion)
    require(vs.nonEmpty, s"pjparquet: no versions in [$fromVersion, $toVersion]")
    vs.map(v => changesAt(spark, root, v)).reduce(_ unionByName _)
  }

  /** EXCEPT ALL in both directions, labeled: rows with more occurrences in
    * `pre` than `post` emit (count difference) times as `preLabel`, and
    * vice versa. Null-safe on every column; one shuffle on the full row.
    */
  private def multisetDiff(
      pre: DataFrame, post: DataFrame, preLabel: String, postLabel: String): DataFrame = {
    val cols = pre.columns.toSeq
    val preC = pre.groupBy(cols.map(col): _*).agg(count(lit(1)).as("_n_pre"))
    val postC = post.groupBy(cols.map(col): _*).agg(count(lit(1)).as("_n_post"))
    val cond = cols.map(c => preC(c) <=> postC(c)).reduce(_ && _)
    val joined = preC.join(postC, cond, "full_outer")
    val vals = cols.map(c => coalesce(preC(c), postC(c)).as(c))
    val flat = joined.select(
      (vals :+ coalesce(preC("_n_pre"), lit(0L)).as("_n_pre")
        :+ coalesce(postC("_n_post"), lit(0L)).as("_n_post")): _*)
    val del = flat.filter(col("_n_pre") > col("_n_post"))
      .withColumn("_change_type", lit(preLabel))
      .withColumn("_mult", col("_n_pre") - col("_n_post"))
    val ins = flat.filter(col("_n_post") > col("_n_pre"))
      .withColumn("_change_type", lit(postLabel))
      .withColumn("_mult", col("_n_post") - col("_n_pre"))
    // a single row repeated > Int.MaxValue times in ONE commit is absurd,
    // but the Int cast must fail loudly rather than silently truncate
    val mult = when(col("_mult") <= lit(Int.MaxValue.toLong), col("_mult").cast("int"))
      .otherwise(raise_error(concat(
        lit("pjparquet: change-feed row multiplicity overflows Int: "), col("_mult"))))
    del.unionByName(ins)
      .withColumn("_rep", explode(array_repeat(lit(1), mult)))
      .drop("_n_pre", "_n_post", "_mult", "_rep")
  }
}
