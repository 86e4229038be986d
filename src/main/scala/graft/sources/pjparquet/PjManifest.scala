package graft.sources.pjparquet

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.core.PJException

/** Symlink-format manifest generation — Delta's
  * `GENERATE symlink_format_manifest FOR TABLE`: materializes the CURRENT
  * snapshot's data-file list as Hive-layout text manifests under
  * `_symlink_format_manifest/`, so external engines that understand the
  * symlink input format (Presto/Trino/Athena/Hive) can query the logged
  * table's exact snapshot — retired files, racing writers' uncommitted
  * files, and failed attempts are all invisible because only the manifest
  * is read, never the directory listing.
  *
  * Layout mirrors the table's partitioning (one
  * `_symlink_format_manifest/<k=v>/.../manifest` per live partition
  * directory; a single `manifest` at the root for unpartitioned tables),
  * each holding one absolute data-file URI per line. Manifests publish via
  * temp+rename, and the whole tree is regenerated per call (stale
  * partition manifests from prior generations are removed, Delta's
  * contract). A `_version` marker records the manifested snapshot so
  * staleness is detectable.
  *
  * Tables carrying DELETION VECTORS refuse: an external reader sees raw
  * files, so DV-masked rows would resurrect — run
  * `CALL pj.system.purge_deletion_vectors` first (same refusal Delta
  * documents for its manifest generation).
  */
object PjManifest {

  final case class Report(version: Long, dataFiles: Long, manifests: Long)

  val DirName = "_symlink_format_manifest"

  /** Partition-dir count at/above which manifest writes run as one Spark
    * job (one tiny text file per partition dir — at 100k partitions the
    * sequential driver loop is 100k object-store round-trips).
    */
  private[pjparquet] val ParallelWriteMinDirs = 64

  /** Observability/spec counter: manifest generations that distributed. */
  private[sources] val distributedWrites = new java.util.concurrent.atomic.AtomicLong

  def generate(spark: SparkSession, root: String): Report = {
    val rootPath = new Path(root)
    generate(rootPath.getFileSystem(spark.sessionState.newHadoopConf()), rootPath, root)
  }

  /** Post-commit maintenance hook (`pj.symlinkManifest.enabled`, Delta's
    * `symlinkFormatManifest.enabled`): regenerate after every commit so the
    * external view tracks HEAD. Best-effort by contract — a DV-carrying
    * snapshot is skipped (the manifest stays at its last DV-free version,
    * detectable via the `_version` marker) rather than failing the commit
    * that already published.
    */
  private[pjparquet] def autoMaintain(
      fs: org.apache.hadoop.fs.FileSystem, rootPath: Path): Unit =
    try generate(fs, rootPath, rootPath.toString)
    catch { case scala.util.control.NonFatal(_) => }

  private def generate(
      fs: org.apache.hadoop.fs.FileSystem, rootPath: Path, root: String): Report = {
    val snap = PjCommitLog.latest(fs, rootPath).getOrElse(
      throw new PJException(
        s"pjparquet: '$root' is not a commit-log table — symlink manifests " +
          "materialize a logged snapshot (CALL pj.system.convert to adopt a " +
          "plain directory first)"))
    if (snap.entries.exists(_.dv.isDefined))
      throw new PJException(
        s"pjparquet: '$root' carries deletion vectors — external readers " +
          "consume raw files, so DV-deleted rows would resurrect in the " +
          "manifested view. Run CALL pj.system.purge_deletion_vectors first")
    val rootQ = fs.makeQualified(rootPath)
    // group live files by their partition directory (rel dir = the
    // manifest's partition path); shallow-clone entries (absolute paths
    // outside the root) manifest under the root — external readers follow
    // the URIs, not the layout
    val byDir: Map[String, Seq[String]] = snap.entries
      .filterNot(_.isEmptyFile)
      .map { e =>
        val abs = new Path(rootQ, e.path)
        val rel = if (e.path.startsWith("/")) "" else {
          val i = e.path.lastIndexOf('/')
          if (i < 0) "" else e.path.substring(0, i)
        }
        (rel, fs.makeQualified(abs).toUri.toString)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val manifestRoot = new Path(rootPath, DirName)
    // full regeneration: drop prior-generation manifests (stale partitions)
    fs.delete(manifestRoot, true)
    val session = org.apache.spark.sql.SparkSession.getActiveSession
    if (byDir.size >= ParallelWriteMinDirs && session.isDefined) {
      // one Spark job writes every partition's manifest — wall-clock is
      // one round-trip wave, not one per partition
      distributedWrites.incrementAndGet()
      val conf = new org.apache.spark.util.SerializableConfiguration(
        session.get.sessionState.newHadoopConf())
      val mrStr = manifestRoot.toString
      val items = byDir.toSeq.map { case (rel, uris) =>
        (rel, uris.mkString("", "\n", "\n"))
      }
      session.get.sparkContext
        .parallelize(items, math.min(items.size, 512))
        .foreach { case (rel, body) =>
          val mr = new Path(mrStr)
          val dir = if (rel.isEmpty) mr else new Path(mr, rel)
          val dfs = dir.getFileSystem(conf.value)
          dfs.mkdirs(dir)
          publish(dfs, new Path(dir, "manifest"), body)
        }
    } else byDir.foreach { case (rel, uris) =>
      val dir = if (rel.isEmpty) manifestRoot else new Path(manifestRoot, rel)
      fs.mkdirs(dir)
      publish(fs, new Path(dir, "manifest"), uris.mkString("", "\n", "\n"))
    }
    publish(fs, new Path(manifestRoot, "_version"), s"${snap.version}\n")
    Report(snap.version, byDir.valuesIterator.map(_.size.toLong).sum, byDir.size.toLong)
  }

  private def publish(fs: org.apache.hadoop.fs.FileSystem, dst: Path, body: String): Unit = {
    val tmp = new Path(dst.getParent, s".${dst.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, dst)) {
      fs.delete(dst, false)
      if (!fs.rename(tmp, dst))
        throw new java.io.IOException(s"pjparquet: cannot publish manifest $dst")
    }
  }
}
