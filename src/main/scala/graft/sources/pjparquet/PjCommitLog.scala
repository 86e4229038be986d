package graft.sources.pjparquet

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.core.PJException

/** Versioned snapshot log for pjparquet tables — opt-in time travel.
  *
  * Layout: `<root>/_pj_log/<version %020d>.json`, one file per commit,
  * each holding the COMPLETE live-file snapshot (table-root-relative
  * paths) after that commit plus the action that produced it. The log is
  * the Delta-style source of truth once it exists:
  *
  *  - every write commit (batch append/overwrite, row-level DML,
  *    metadata-rate DELETE, streaming epoch) appends `version+1` with the
  *    post-commit snapshot and RETIRES replaced files from the snapshot
  *    instead of deleting them;
  *  - resolution reads the latest snapshot and plans exactly its files —
  *    retired files and racing writers' uncommitted files are invisible,
  *    which also closes the read-uncommitted window the direct-write
  *    commit otherwise has;
  *  - `option("versionAsOf", N)` plans snapshot N instead — time travel,
  *    for as long as the files it references survive;
  *  - physical reclamation moves to [[PjVacuum.expireVersions]]: drop log
  *    entries beyond a retention count, then delete data files no
  *    surviving snapshot references (the Delta `VACUUM` contract).
  *
  * Enabling: pass `log.enabled=true` on the first write (or create the
  * `_pj_log` directory); afterwards the log's existence makes every
  * commit maintain it. Unlogged tables are untouched — zero behavior
  * change.
  *
  * Scale: one snapshot file per commit, O(live files) each — bounded by
  * directory-listing scale, which resolution already pays. Single-writer
  * commit protocol (same contract as the direct-write path): the
  * version-file rename is the commit point, and a version collision
  * fails the later writer loudly.
  */
object PjCommitLog {
  val DirName = "_pj_log"

  final case class Snapshot(version: Long, action: String, files: Seq[String],
      ts: Long = 0L)

  def logDir(root: Path): Path = new Path(root, DirName)

  def isEnabled(fs: FileSystem, root: Path): Boolean =
    try fs.getFileStatus(logDir(root)).isDirectory
    catch { case _: java.io.FileNotFoundException => false }

  private def versionFile(root: Path, v: Long): Path =
    new Path(logDir(root), f"$v%020d.json")

  /** All committed versions, ascending. */
  def versions(fs: FileSystem, root: Path): Seq[Long] =
    try fs.listStatus(logDir(root)).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && n.dropRight(5).forall(_.isDigit))
      .map(_.dropRight(5).toLong)
      .sorted
    catch { case _: java.io.FileNotFoundException => Nil }

  def latest(fs: FileSystem, root: Path): Option[Snapshot] =
    versions(fs, root).lastOption.map(v => read(fs, root, v))

  def read(fs: FileSystem, root: Path, version: Long): Snapshot = {
    val p = versionFile(root, version)
    val txt =
      try {
        val in = fs.open(p)
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = in.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
        } finally in.close()
      } catch {
        case _: java.io.FileNotFoundException =>
          val vs = versions(fs, root)
          throw new PJException(
            s"pjparquet: version $version does not exist under ${logDir(root)}" +
              (if (vs.isEmpty) " (table has no commit log)"
              else s" (available: ${vs.head}..${vs.last})"))
      }
    parse(txt, version)
  }

  /** Append the post-commit snapshot as `latest+1`. The rename to the
    * final version file is the commit point; a pre-existing target means
    * a concurrent writer won the version and this commit must fail (the
    * data files it wrote are swept by its own abort path or vacuum).
    */
  def append(fs: FileSystem, root: Path, action: String, files: Seq[String]): Long = {
    val dir = logDir(root)
    fs.mkdirs(dir)
    val v = versions(fs, root).lastOption.getOrElse(0L) + 1
    val target = versionFile(root, v)
    val tmp = new Path(dir, s".${target.getName}.${java.util.UUID.randomUUID()}.tmp")
    val body = render(Snapshot(v, action, files.sorted, System.currentTimeMillis()))
    val out = fs.create(tmp, false)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
    if (fs.exists(target) || !fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new PJException(
        s"pjparquet: commit-log version conflict at $target (concurrent writer); " +
          "pjparquet tables are single-writer")
    }
    v
  }

  /** Latest version committed at or before `tsMillis` — the
    * `timestampAsOf` resolution rule (Delta semantics: the state a reader
    * at that wall-clock instant would have seen).
    */
  def versionAtTimestamp(fs: FileSystem, root: Path, tsMillis: Long): Long = {
    val vs = versions(fs, root)
    val at = vs.reverseIterator.find(v => read(fs, root, v).ts <= tsMillis)
    at.getOrElse(throw new PJException(
      s"pjparquet: no commit at or before timestamp $tsMillis" +
        (if (vs.isEmpty) " (table has no commit log)"
        else s" (earliest commit ts=${read(fs, root, vs.head).ts})")))
  }

  /** DESCRIBE HISTORY: one row per retained version — (version, ts,
    * action, n_files). Metadata-rate driver work.
    */
  def history(fs: FileSystem, root: Path): Seq[Snapshot] =
    versions(fs, root).map(v => read(fs, root, v))

  /** Table-root-relative path of a data file (for snapshot membership). */
  def relativize(fs: FileSystem, root: Path, p: Path): String = {
    val rootUri = fs.makeQualified(root).toUri.getPath.stripSuffix("/")
    val pathUri = fs.makeQualified(p).toUri.getPath
    if (!pathUri.startsWith(rootUri + "/"))
      throw new PJException(s"pjparquet: $p is not under table root $root")
    pathUri.drop(rootUri.length + 1)
  }

  // ---------------------------------------------------------------- json
  // Snapshot files are written and read only by this object; the format is
  // a fixed three-field JSON document with full string escaping.

  private def esc(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'u' if i + 5 < s.length =>
              sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
            case c => sb.append(c); i += 2
          }
        case c => sb.append(c); i += 1
      }
    }
    sb.result()
  }

  private def render(s: Snapshot): String =
    s"""{"version":${s.version},"ts":${s.ts},"action":${esc(s.action)},"files":[""" +
      s.files.map(esc).mkString(",") + "]}\n"

  private val VersionRe = """"version"\s*:\s*(\d+)""".r
  private val TsRe = """"ts"\s*:\s*(\d+)""".r
  private val ActionRe = """"action"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
  private val FilesRe = """(?s)"files"\s*:\s*\[(.*)\]""".r
  private val StringRe = """"((?:[^"\\]|\\.)*)"""".r

  private def parse(txt: String, expectVersion: Long): Snapshot = {
    val v = VersionRe.findFirstMatchIn(txt).map(_.group(1).toLong).getOrElse(
      throw new PJException(s"pjparquet: corrupt commit-log entry (no version): ${txt.take(80)}"))
    if (v != expectVersion)
      throw new PJException(
        s"pjparquet: commit-log entry claims version $v but is filed as $expectVersion")
    val action = ActionRe.findFirstMatchIn(txt).map(m => unesc(m.group(1))).getOrElse("unknown")
    val filesBody = FilesRe.findFirstMatchIn(txt).map(_.group(1)).getOrElse(
      throw new PJException(s"pjparquet: corrupt commit-log entry (no files): ${txt.take(80)}"))
    val files = StringRe.findAllMatchIn(filesBody).map(m => unesc(m.group(1))).toSeq
    val ts = TsRe.findFirstMatchIn(txt).map(_.group(1).toLong).getOrElse(0L)
    Snapshot(v, action, files, ts)
  }
}
