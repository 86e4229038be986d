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
    * newest `keepVersions` snapshots, drop the older log entries, and
    * delete every data file (plus its `.index`/`.bloom` sidecars) that no
    * SURVIVING snapshot references — the Delta `VACUUM` contract, where
    * retention is the only thing that ever physically deletes a logged
    * table's retired bytes. Metadata-rate driver work: one log read per
    * kept version + one recursive listing; no data I/O.
    */
  def expireVersions(spark: SparkSession, root: String, keepVersions: Int): ExpireReport = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val hconf = spark.sessionState.newHadoopConf()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(hconf)
    if (!PjCommitLog.isEnabled(fs, rootPath))
      throw new graft.core.PJException(
        s"pjparquet: '$root' has no commit log; expireVersions applies to logged tables")
    val versions = PjCommitLog.versions(fs, rootPath)
    val (drop, keep) = versions.splitAt(math.max(0, versions.size - keepVersions))
    val referenced: Set[String] =
      keep.flatMap(v => PjCommitLog.read(fs, rootPath, v).files).toSet

    var reclaimed = 0L
    val it = fs.listFiles(rootPath, true)
    val victims = scala.collection.mutable.ArrayBuffer.empty[Path]
    while (it.hasNext) {
      val s = it.next()
      val n = s.getPath.getName
      if (s.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".") &&
          !referenced.contains(PjCommitLog.relativize(fs, rootPath, s.getPath)))
        victims += s.getPath
    }
    victims.foreach { p =>
      PjBatchWrite.deleteWithSidecars(fs, p)
      reclaimed += 1
    }
    drop.foreach(v => fs.delete(new Path(PjCommitLog.logDir(rootPath), f"$v%020d.json"), false))
    PjBatchWrite.pruneEmptyPartitionDirs(fs, rootPath)
    // stale cached layouts of expired versions would serve missing files
    PjParquetTable.clearLayoutCache()
    ExpireReport(drop.size.toLong, keep.size.toLong, reclaimed)
  }
}
