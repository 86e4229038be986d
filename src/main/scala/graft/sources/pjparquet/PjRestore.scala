package graft.sources.pjparquet

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.core.PJException

/** `RESTORE TABLE t TO VERSION AS OF n` — Delta-parity rollback as ONE
  * metadata commit (reference scope: the commit-log surface built on
  * `palletjack_cython.pyx`'s index/splice core; restore itself has no
  * reference counterpart — it is table-format parity, like CDF/DVs).
  *
  * The restore commit turns HEAD into the target snapshot by delta:
  * every head path absent from the target retires, every target entry
  * that differs from head (including its DELETION VECTOR reference —
  * restoring across a DV DELETE resurrects the rows by re-pointing the
  * entry, zero data I/O) re-adds, and the target's recorded schema is
  * re-recorded (so a restore across DROP/ADD COLUMN rolls the schema
  * back too). History is PRESERVED: the restore is a new version on top,
  * time travel to every intermediate version keeps working, and a
  * second restore can undo the first. Files never move or rewrite —
  * retired files were already retained for time travel, so at 100 TB a
  * restore is O(changed entries) metadata, not O(data).
  *
  * Restoring to an expired version fails loudly in [[PjCommitLog.read]]
  * (the entries — and possibly the files — are gone); restoring to the
  * head version is a no-op (no commit, `committed = None`).
  */
object PjRestore {

  final case class RestoreReport(
      restoredTo: Long,
      committed: Option[Long],
      filesAdded: Long,
      filesRemoved: Long)

  /** Entry equivalence for delta-minimization: same path + footer
    * fingerprint + deletion vector means the same bytes serve the same
    * rows (stats are a pure function of those, so they don't need a
    * byte-compare).
    */
  private def sameEntry(a: PjCommitLog.FileEntry, b: PjCommitLog.FileEntry): Boolean =
    a.path == b.path && a.size == b.size && a.rows == b.rows &&
      a.rowGroups == b.rowGroups && a.fingerprint == b.fingerprint &&
      a.nested == b.nested && a.cols == b.cols && a.dv == b.dv &&
      a.clusteredBy == b.clusteredBy

  def restore(spark: SparkSession, root: String, version: Long): RestoreReport = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val head = PjCommitLog.latest(fs, rootPath).getOrElse(
      throw new PJException(
        s"pjparquet: '$root' has no commit log (RESTORE applies to logged tables)"))
    if (version > head.version)
      throw new PJException(
        s"pjparquet: cannot RESTORE '$root' to version $version — head is ${head.version}")
    val target = PjCommitLog.read(fs, rootPath, version) // throws if expired/absent
    if (version == head.version)
      return RestoreReport(version, None, 0L, 0L)
    val headByPath = head.entries.iterator.map(e => e.path -> e).toMap
    val targetPaths = target.entries.iterator.map(_.path).toSet
    val removed = head.entries.iterator.map(_.path).filterNot(targetPaths).toSet
    val added = target.entries.filter(e => !headByPath.get(e.path).exists(sameEntry(e, _)))
    val schemaChanged = target.dataSchemaJson != head.dataSchemaJson
    val constraintsChanged = target.constraintsJson != head.constraintsJson
    val propertiesChanged = target.propertiesJson != head.propertiesJson
    val statsChanged = target.tableStatsJson != head.tableStatsJson
    if (removed.isEmpty && added.isEmpty && !schemaChanged && !constraintsChanged &&
        !propertiesChanged && !statsChanged)
      return RestoreReport(version, None, 0L, 0L)
    // a concurrent expiry may have RECLAIMED the target version's files
    // between the version read above and here (the log file outlives the
    // data files it references during an expiry sweep) — committing would
    // publish a head referencing vanished bytes. Validate the re-added
    // files exist before claiming (bounded: RESTORE is rare, `added` is
    // the delta). Like Delta, a vacuum racing INSIDE the remaining
    // check-to-publish window is documented-unsafe; this closes the lane
    // the maintenance fuzzer actually hit.
    added.find(e => !fs.exists(new Path(rootPath, e.path))).foreach { gone =>
      throw new PJException(
        s"pjparquet: cannot RESTORE '$root' to version $version — its file " +
          s"'${gone.path}' is expired (reclaimed by a concurrent vacuum)")
    }
    // EXCLUSIVE against the read head: the restore's delta was computed
    // against `head` — a writer landing in between would have its files
    // silently dropped from the restored state (absent from both
    // `removed` and `added`). Any winner since the head conflicts loudly;
    // the caller re-reads and retries.
    PjCompaction.testHookBeforeCommit()
    val v = PjCommitLog.commit(
      fs, rootPath, "restore", added, removed,
      readVersion = Some(head.version), exclusive = true,
      dataSchemaJson = target.dataSchemaJson,
      operation = Some(s"RESTORE VERSION AS OF $version"),
      // constraints, properties and ANALYZE stats roll back too;
      // "[]"/"{}" record an explicit clear when the target predates them
      constraintsJson =
        if (constraintsChanged) Some(target.constraintsJson.getOrElse("[]")) else None,
      propertiesJson =
        if (propertiesChanged) Some(target.propertiesJson.getOrElse("{}")) else None,
      tableStatsJson =
        if (statsChanged) Some(target.tableStatsJson.getOrElse("{}")) else None)
    // restored state changes what readers see — drop stale layout plans
    PjParquetTable.clearLayoutCache()
    RestoreReport(version, Some(v), added.size.toLong, removed.size.toLong)
  }

  /** Timestamp flavor: restore to the newest version committed at or
    * before `tsMillis` (Delta `RESTORE ... TIMESTAMP AS OF`).
    */
  def restoreToTimestamp(spark: SparkSession, root: String, tsMillis: Long): RestoreReport = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    restore(spark, root, PjCommitLog.versionAtTimestamp(fs, rootPath, tsMillis))
  }
}
