package graft.sources.pjparquet

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Directory hygiene for pjparquet tables — the janitor half of the
  * sidecar lifecycle ([[PjIndexJob]] creates, [[PjCompaction]] consumes,
  * this reclaims):
  *
  *  - orphan sidecars: a `.x.parquet.index` whose `x.parquet` is gone
  *    (manual deletes, aborted rewrites) wastes listing time and bytes
  *    forever — nothing else ever looks at it again;
  *  - abandoned work dirs: `.compact_tmp_*` from a crashed
  *    [[PjCompaction]] pass and `_temporary` from a dead Spark write
  *    commit are invisible to readers but accumulate full-size data.
  *
  * Everything is driver-side listing + deletes (metadata-rate work, no
  * data is read); the one recursive listing is the same bounded shape as
  * [[PjIndexJob.generateAll]]. Never touches live data files, live
  * sidecars, or directories it does not recognize.
  */
object PjVacuum {

  final case class Report(orphanSidecars: Long, workDirs: Long)

  def clean(spark: SparkSession, root: String): Report = {
    val hconf = spark.sessionState.newHadoopConf()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(hconf)

    var orphans = 0L
    var workDirs = 0L

    // one pass for abandoned work dirs (they hide their contents from the
    // recursive file listing below, so walk directories explicitly)
    def walkDirs(p: Path): Unit = {
      val statuses = fs.listStatus(p)
      statuses.foreach { s =>
        if (s.isDirectory) {
          val n = s.getPath.getName
          if (n.startsWith(".compact_tmp_") || n == "_temporary") {
            fs.delete(s.getPath, true)
            workDirs += 1
          } else walkDirs(s.getPath)
        }
      }
    }
    walkDirs(rootPath)

    // one pass for orphan sidecars: hidden `.x.parquet.index` (and
    // `.x.parquet.bloom`, PjBloom) files whose data file no longer exists
    // in the same directory
    val it = fs.listFiles(rootPath, true)
    val sidecars = scala.collection.mutable.ArrayBuffer.empty[(Path, String)]
    val dataFiles = scala.collection.mutable.HashSet.empty[String]
    while (it.hasNext) {
      val s = it.next()
      val n = s.getPath.getName
      if (s.isFile) {
        if (n.startsWith(".") && n.endsWith(".parquet.index"))
          sidecars += ((s.getPath, ".index"))
        else if (n.startsWith(".") && n.endsWith(".parquet.bloom"))
          sidecars += ((s.getPath, ".bloom"))
        else if (n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_"))
          dataFiles += s.getPath.toString
      }
    }
    sidecars.foreach { case (sc, suffix) =>
      // `.NAME.parquet<suffix>` -> sibling `NAME.parquet`
      val dataName = sc.getName.stripPrefix(".").stripSuffix(suffix)
      val data = new Path(sc.getParent, dataName)
      if (!dataFiles.contains(data.toString)) {
        fs.delete(sc, false)
        orphans += 1
      }
    }
    Report(orphans, workDirs)
  }

  final case class ExpireReport(
      versionsDropped: Long, versionsKept: Long, filesReclaimed: Long)

  /** Close the time-travel window of a [[PjCommitLog]] table: keep the
    * newest `keepVersions` snapshots, drop the older log entries (after
    * materializing a checkpoint at the oldest kept version, so the
    * delta-encoded log stays replayable), and delete every data file
    * (plus its `.index`/`.bloom` sidecars) that no SURVIVING snapshot
    * references — the Delta `VACUUM` contract, where retention is the
    * only thing that ever physically deletes a logged table's retired
    * bytes. Metadata-rate driver work: one checkpoint + bounded replay
    * per kept version + one recursive listing; no data I/O.
    *
    * `minFileAgeMillis` guards racing writers: an unreferenced file
    * younger than it (an in-flight commit's staged task files, a
    * concurrent appender between its data write and its log commit) is
    * NOT deleted. The default 0 keeps the historical behavior — set it
    * (Delta defaults to 7 days) whenever expiry can run concurrently
    * with writes or streams.
    */
  def expireVersions(
      spark: SparkSession, root: String, keepVersions: Int,
      minFileAgeMillis: Long = 0L, dryRun: Boolean = false): ExpireReport = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    requireLogged(fs, rootPath, root)
    val versions = PjCommitLog.versions(fs, rootPath)
    val (drop, keep) = versions.splitAt(math.max(0, versions.size - keepVersions))
    expire(fs, rootPath, drop, keep, minFileAgeMillis, dryRun)
  }

  /** Time-based retention — the operational contract users actually
    * configure (Delta's `VACUUM ... RETAIN n HOURS`): keep every version
    * committed within the last `retentionMillis` (by snapshot timestamp),
    * and always HEAD; expire the rest. Kept versions form a contiguous
    * suffix (replay requires it): one old-enough version inside the
    * window keeps everything after it.
    */
  def expireOlderThan(
      spark: SparkSession, root: String, retentionMillis: Long,
      minFileAgeMillis: Long = 0L, dryRun: Boolean = false): ExpireReport = {
    require(retentionMillis >= 0, s"retentionMillis must be >= 0, got $retentionMillis")
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    requireLogged(fs, rootPath, root)
    val versions = PjCommitLog.versions(fs, rootPath)
    if (versions.isEmpty) return ExpireReport(0, 0, 0)
    val cut = System.currentTimeMillis() - retentionMillis
    val oldestKept = PjCommitLog.history(fs, rootPath)
      .find(_.ts >= cut).map(_.version).getOrElse(versions.last)
    val (drop, keep) = versions.partition(_ < oldestKept)
    expire(fs, rootPath, drop, keep, minFileAgeMillis, dryRun)
  }

  private def requireLogged(fs: org.apache.hadoop.fs.FileSystem, rootPath: Path, root: String): Unit =
    if (!PjCommitLog.isEnabled(fs, rootPath))
      throw new graft.core.PJException(
        s"pjparquet: '$root' has no commit log; expireVersions applies to logged tables")

  private def expire(
      fs: org.apache.hadoop.fs.FileSystem, rootPath: Path,
      drop: Seq[Long], keep: Seq[Long], minFileAgeMillis: Long,
      dryRun: Boolean = false): ExpireReport = {
    if (keep.isEmpty) return ExpireReport(0, 0, 0)
    // the oldest kept version must stay replayable after its delta prefix
    // drops: materialize its full checkpoint first (no-op if one exists).
    // Reclamation itself runs even with nothing to drop — files orphaned
    // by an earlier expiry (or an aborted writer) still get swept.
    // A DRY RUN (Delta's VACUUM ... DRY RUN) computes the same report and
    // touches NOTHING — no checkpoint, no deletes, no cache flush.
    if (drop.nonEmpty && !dryRun) PjCommitLog.writeCheckpoint(fs, rootPath, keep.head)
    val keptEntries = keep.map(v => PjCommitLog.read(fs, rootPath, v).entries)
    val referenced: Set[String] = keptEntries.flatten.map(_.path).toSet
    // deletion vectors referenced by ANY kept snapshot must survive;
    // orphans (superseded by a later delete, retired by rewrite/expiry)
    // sweep with the same age guard as data files
    val referencedDvs: Set[String] =
      keptEntries.flatten.flatMap(_.dv.map(_.path)).toSet

    val cutoff = System.currentTimeMillis() - minFileAgeMillis
    var reclaimed = 0L
    val it = fs.listFiles(rootPath, true)
    val victims = scala.collection.mutable.ArrayBuffer.empty[Path]
    while (it.hasNext) {
      val s = it.next()
      val n = s.getPath.getName
      if (s.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".") &&
          (minFileAgeMillis <= 0 || s.getModificationTime <= cutoff)) {
        val rel = PjCommitLog.relativize(fs, rootPath, s.getPath)
        // internal dirs (_pq_index codes, _pj_cdc change files) are not
        // table data and are never snapshot-referenced — skip, not delete
        if (!PjBatchWrite.isInternalRel(rel) && !referenced.contains(rel))
          victims += s.getPath
      }
    }
    victims.foreach { p =>
      if (!dryRun) PjBatchWrite.deleteWithSidecars(fs, p)
      reclaimed += 1
    }
    // unreferenced deletion vectors under _pj_dv/
    val dvDir = PjDeletionVector.dvDir(rootPath)
    if (fs.exists(dvDir)) {
      val dit = fs.listFiles(dvDir, false)
      while (dit.hasNext) {
        val s = dit.next()
        val n = s.getPath.getName
        if (s.isFile && n.endsWith(".dv") && !n.startsWith(".") &&
            (minFileAgeMillis <= 0 || s.getModificationTime <= cutoff)) {
          val rel = PjCommitLog.relativize(fs, rootPath, s.getPath)
          if (!referencedDvs.contains(rel)) {
            if (!dryRun) fs.delete(s.getPath, false)
            reclaimed += 1
          }
        }
      }
    }
    if (!dryRun) {
      drop.foreach { v =>
        PjCommitLog.versionFiles(rootPath, v).foreach(p => fs.delete(p, true))
        // expired versions take their persisted change files with them
        fs.delete(PjChangeFeed.cdcDir(rootPath, v), true)
      }
      PjBatchWrite.pruneEmptyPartitionDirs(fs, rootPath)
      // stale cached layouts of expired versions would serve missing files
      PjParquetTable.clearLayoutCache()
    }
    ExpireReport(drop.size.toLong, keep.size.toLong, reclaimed)
  }
}
