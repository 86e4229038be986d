package graft.sources.pjparquet

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.core.PJException

/** SHALLOW CLONE — a zero-copy fork of a commit-log table (Delta's
  * `CREATE TABLE ... SHALLOW CLONE src [VERSION AS OF n]`): the clone is
  * a NEW table directory whose first commit references the source
  * snapshot's data files (and deletion vectors) by ABSOLUTE path, plus
  * the source's recorded schema, constraints and table properties.
  * Nothing is copied — cloning a 100 TB table is one metadata-rate
  * commit — and the two tables then evolve independently:
  *
  *  - reads of the clone plan from its own log; absolute entries resolve
  *    verbatim (`new Path(qualifiedRoot, child)` keeps an absolute
  *    child), stats/page-index/bloom pruning all ride the entry facts
  *    copied from the source snapshot;
  *  - DML on the clone never mutates source bytes: deletion vectors
  *    write under the CLONE's `_pj_dv/`, copy-on-write rewrites write
  *    new files under the clone and retire the absolute entry from the
  *    clone's log only ([[PjCommitLog.relOrAbs]] keys both);
  *  - physical reclamation ([[PjVacuum]] clean/expire, compaction
  *    consumption) is listing-driven UNDER THE TABLE ROOT by
  *    construction, so a clone's maintenance can never delete a file it
  *    does not own. The flip side of the shared-bytes contract is the
  *    same as Delta's: expiring/vacuuming the SOURCE can orphan a
  *    clone's references (the clone's read then fails loudly with the
  *    expired-by-vacuum diagnosis).
  *
  * The reference engine has no table format; this models the lifecycle
  * surface its sidecar-index tables need at lakehouse scale.
  */
object PjClone {

  final case class Report(
      targetVersion: Long, files: Long, bytes: Long, sourceVersion: Long)

  /** Clone `source` (at `version`, or its latest snapshot) into the new
    * table directory `target`. Fails if the source has no commit log or
    * the target already holds a table (non-empty directory).
    */
  def shallowClone(
      spark: SparkSession, source: String, target: String,
      version: Long = -1L): Report = {
    val hconf = spark.sessionState.newHadoopConf()
    val srcPath = new Path(source)
    val fs = srcPath.getFileSystem(hconf)
    if (!PjCommitLog.isEnabled(fs, srcPath))
      throw new PJException(
        s"pjparquet: '$source' has no commit log; SHALLOW CLONE applies to " +
          "logged tables (write once with log.enabled=true to adopt it)")
    val snap =
      if (version < 0)
        PjCommitLog.latest(fs, srcPath).getOrElse(
          throw new PJException(s"pjparquet: '$source' has an empty commit log"))
      else PjCommitLog.read(fs, srcPath, version)

    val tgtPath = new Path(target)
    val tfs = tgtPath.getFileSystem(hconf)
    if (tfs.exists(tgtPath) && tfs.listStatus(tgtPath).nonEmpty)
      throw new PJException(
        s"pjparquet: SHALLOW CLONE target '$target' already exists and is " +
          "not empty")
    tfs.mkdirs(tgtPath)

    val srcQ = fs.makeQualified(srcPath)
    // membership keys stay absolute scheme-less paths — exactly the form
    // relOrAbs produces for them, so later DML on the clone addresses the
    // same entry it planned. A clone OF a clone keeps already-absolute
    // entries verbatim (they point at the original owner's bytes).
    def absOf(rel: String): String =
      if (rel.startsWith("/")) rel
      else fs.makeQualified(new Path(srcQ, rel)).toUri.getPath
    val entries = snap.entries.map(e => e.copy(
      path = absOf(e.path),
      dv = e.dv.map(d => d.copy(path = absOf(d.path)))))

    val v = PjCommitLog.commit(
      tfs, tgtPath, "clone", entries, Set.empty,
      dataSchemaJson = snap.dataSchemaJson,
      operation = Some(s"SHALLOW CLONE source=${srcQ.toUri.getPath} " +
        s"sourceVersion=${snap.version}"),
      constraintsJson = snap.constraintsJson,
      propertiesJson = snap.propertiesJson)
    Report(v, entries.size.toLong, entries.map(_.size.max(0L)).sum, snap.version)
  }
}
