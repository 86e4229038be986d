package graft.sources.pjparquet

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import graft.core.PJException

/** Idempotent file ingest — the `COPY INTO` surface (Delta parity): load a
  * directory of source files into a logged pjparquet table such that each
  * source file's rows land EXACTLY ONCE across any number of re-runs, with
  * concurrent ingesters partitioning the work instead of duplicating it.
  *
  * Mechanics: one marker per ingested source file under
  * `<table>/.pjlog/ingest/<sha256(path)>`. A run (1) lists markers, (2)
  * claims each unmarked source file by ATOMIC create (`overwrite=false` —
  * the filesystem arbitrates racing ingesters per file), (3) appends all
  * its claimed files' rows in ONE logged commit, (4) finalizes its markers
  * with the commit version. Already-marked files are skipped at metadata
  * rate — no data I/O, no reads of the table.
  *
  * Crash contract: a run that dies between claim and commit leaves
  * `claimed` markers with no landed rows. Those files are reported as
  * `files_pending`, never silently re-ingested (a live concurrent run is
  * indistinguishable from a crashed one); pass `reclaimClaims = true` from
  * an operator context that KNOWS no ingester is live to delete the stale
  * claims and re-load them. A run that dies between commit and finalize
  * re-finalizes its markers on the next run's sweep (the commit's
  * operation tag names the claim ids it covered), so the rows are never
  * doubled.
  *
  * Scale shape: listing + claims are O(#source files) metadata ops on the
  * driver (same as Delta's COPY INTO file-state tracking); the data load
  * is one distributed read of exactly the claimed files. Nothing about
  * already-loaded history is re-read.
  *
  * MARKER LIFECYCLE: finalized (`done`) markers do not accumulate as one
  * file each forever — once [[FoldThreshold]] of them exist, a run folds
  * them into ONE delta manifest (`manifest-<seq>`, atomically claimed,
  * IMMUTABLE, never deleted) and drops the marker files, so the ingest
  * directory holds the active window plus one manifest per
  * [[FoldThreshold]] historical ingests instead of one file per ingest
  * ever. Readers take the union of marker files and manifest entries;
  * the two listings are ORDERED (markers first, manifests second), which
  * closes the fold race: a marker a concurrent fold deletes was either
  * present throughout the first listing, or its manifest — created
  * strictly before the delete — is present throughout the second.
  */
object PjCopyInto {

  final case class Report(
      filesIngested: Long, filesSkipped: Long, filesPending: Long,
      rowsIngested: Long, version: Long)

  private val IngestDirName = "ingest"

  /** Done-marker FILE count at/above which a run folds them into a delta
    * manifest.
    */
  private[sources] var FoldThreshold = 512

  private def ingestDir(root: Path): Path =
    new Path(new Path(root, PjCommitLog.DirName), IngestDirName)

  /** Marker file names are sha256 hex; everything else in the dir is a
    * manifest or a racing claim's temp file.
    */
  private def isMarkerName(n: String): Boolean =
    n.length == 64 && n.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f'))

  private def sha256(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** Marker body: tiny JSON, state is `claimed` until the covering commit
    * lands, then `done` with the version. `runId` ties a claim to the
    * commit that covered it (operation tag `copy-into:<runId>`), so a
    * crash between commit and finalize is repaired — never re-ingested.
    */
  private final case class Marker(
      path: String, size: Long, state: String, runId: String, version: Long)

  private def renderMarker(m: Marker): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    s"""{"path":${q(m.path)},"size":${m.size},"state":${q(m.state)},""" +
      s""""runId":${q(m.runId)},"version":${m.version}}"""
  }

  private def parseMarker(s: String): Marker = {
    def str(k: String): String = {
      val p = ("\"" + k + "\":\"").r.findFirstMatchIn(s).map(_.end).getOrElse(
        throw new PJException(s"pjparquet: malformed ingest marker: $s"))
      val sb = new StringBuilder; var i = p
      while (i < s.length && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); i += 2 }
        else { sb.append(s.charAt(i)); i += 1 }
      }
      sb.toString
    }
    def num(k: String): Long =
      ("\"" + k + "\":(-?\\d+)").r.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(
        throw new PJException(s"pjparquet: malformed ingest marker: $s"))
    Marker(str("path"), num("size"), str("state"), str("runId"), num("version"))
  }

  private def readMarker(fs: FileSystem, p: Path): Marker = {
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      parseMarker(new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
    } finally in.close()
  }

  private def writeMarker(fs: FileSystem, p: Path, m: Marker, overwrite: Boolean): Boolean =
    if (!overwrite)
      // the CLAIM: must be genuinely atomic — local fs `create(false)` is a
      // TOCTOU check-then-create, so ride the commit log's own claim
      // mechanism (hard-link / exclusive rename)
      PjCommitLog.claimFile(fs, p, renderMarker(m))
    else {
      // FINALIZE is a truncate-write; a racing run's sweep TOLERATES a
      // torn read (unparsable marker = still-claimed, untouched) and the
      // next sweep re-finalizes from the commit tag — self-healing, and
      // never a window where the marker is missing (a delete-then-rename
      // would let a racer re-claim the file and double its rows)
      val out = fs.create(p, true)
      try out.write(renderMarker(m).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      true
    }

  /** A delta manifest: one folded marker per line, written once via the
    * atomic claim (fully written before visible — never torn), read as a
    * whole. Immutable; never deleted.
    */
  private def readManifest(fs: FileSystem, p: Path): Seq[Marker] = {
    val in = fs.open(p)
    val body =
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    body.split('\n').toSeq.filter(_.nonEmpty).map(parseMarker)
  }

  /** Source files under `sourceDir` (recursive), hidden files and dirs
    * skipped — the same visibility rule the table's own listings use.
    */
  private def listSource(fs: FileSystem, sourceDir: Path): Seq[(String, Long)] = {
    def walk(p: Path): Seq[(String, Long)] = {
      val st = fs.listStatus(p).toSeq.filterNot(s =>
        s.getPath.getName.startsWith(".") || s.getPath.getName.startsWith("_"))
      st.flatMap { s =>
        if (s.isDirectory) walk(s.getPath)
        else Seq(s.getPath.toString -> s.getLen)
      }
    }
    if (!fs.exists(sourceDir))
      throw new PJException(s"pjparquet: copy_into source '$sourceDir' does not exist")
    walk(sourceDir).sortBy(_._1)
  }

  def copyInto(
      spark: SparkSession,
      tablePath: String,
      sourceDir: String,
      format: String = "parquet",
      reclaimClaims: Boolean = false,
      /** Optional glob over the source-relative path (Delta's
        * `COPY INTO ... PATTERN`): `*` matches within a path segment,
        * `**` across segments, `?` one character. Non-matching files are
        * ignored entirely — not claimed, not counted, free to be claimed
        * by an ingest with a different pattern.
        */
      pattern: Option[String] = None): Report = {
    val allowed = Set("parquet", "json", "csv")
    if (!allowed.contains(format.toLowerCase(java.util.Locale.ROOT)))
      throw new PJException(
        s"pjparquet: copy_into format '$format' is not supported " +
          s"(one of: ${allowed.toSeq.sorted.mkString(", ")})")
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!PjCommitLog.isEnabled(fs, root))
      throw new PJException(
        s"pjparquet: copy_into requires a commit-log table " +
          s"('$tablePath' has no ${PjCommitLog.DirName})")
    val srcFs = new Path(sourceDir).getFileSystem(spark.sessionState.newHadoopConf())
    val dir = ingestDir(root)
    fs.mkdirs(dir)

    // LISTING A (markers), then LISTING B (manifests) — the order closes
    // the concurrent-fold race (see the object doc). Torn markers
    // (non-atomic finalize on object stores) parse to None and are
    // treated as still-claimed: skipped, counted pending, never deleted.
    val markerFiles: Seq[(Path, Option[Marker])] =
      fs.listStatus(dir).toSeq.map(_.getPath)
        .filter(p => isMarkerName(p.getName))
        .map(p => p -> (try Some(readMarker(fs, p))
          catch { case scala.util.control.NonFatal(_) => None }))
    val manifestPaths: Seq[Path] = fs.listStatus(dir).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("manifest-")).sortBy(_.getName)
    val manifestEntries: Seq[Marker] = manifestPaths.flatMap(readManifest(fs, _))

    // sweep: finalize markers whose covering commit LANDED (crash between
    // commit and finalize), reclaim/collect the truly orphaned claims.
    // The full retained-log scan only runs when there ARE claims to
    // resolve — the steady state (every marker done) costs one directory
    // listing and zero log reads
    lazy val coveredRuns: Map[String, Long] = PjCommitLog.operationsByRun(fs, root)
    val orphanClaims = scala.collection.mutable.ArrayBuffer.empty[String]
    val reclaimedNames = scala.collection.mutable.Set.empty[String]
    val doneNow = scala.collection.mutable.ArrayBuffer.empty[(Path, Marker)]
    markerFiles.foreach {
      case (p, Some(m)) if m.state == "claimed" =>
        coveredRuns.get(m.runId) match {
          case Some(v) =>
            val d = m.copy(state = "done", version = v)
            writeMarker(fs, p, d, overwrite = true)
            doneNow += ((p, d))
          case None =>
            if (reclaimClaims) { fs.delete(p, false); reclaimedNames += p.getName }
            else orphanClaims += m.path
        }
      case (p, Some(m)) => doneNow += ((p, m)) // already done
      case (_, None) => () // torn: stays in `taken` (blocks re-claim), untouched
    }

    // FOLD: enough done marker FILES accumulated — move them into one
    // immutable delta manifest (atomic claim; a concurrent folder losing
    // the claim simply skips) and drop the files. The ingest listing then
    // tracks the active window, not ingest history.
    if (doneNow.size >= FoldThreshold) {
      val seq = manifestPaths.lastOption
        .map(_.getName.stripPrefix("manifest-").toLong + 1).getOrElse(0L)
      val body = doneNow.map { case (_, m) => renderMarker(m) }.mkString("\n")
      if (PjCommitLog.claimFile(fs, new Path(dir, f"manifest-$seq%010d"), body))
        doneNow.foreach { case (p, _) => fs.delete(p, false) }
    }

    val taken: Set[String] =
      markerFiles.map(_._1.getName).toSet -- reclaimedNames ++
        manifestEntries.map(m => sha256(m.path))

    val srcRoot = srcFs.makeQualified(new Path(sourceDir)).toString
    val globRe = pattern.map { g =>
      val sb = new StringBuilder
      var i = 0
      while (i < g.length) {
        g.charAt(i) match {
          case '*' if i + 1 < g.length && g.charAt(i + 1) == '*' =>
            sb.append(".*"); i += 2
          case '*' => sb.append("[^/]*"); i += 1
          case '?' => sb.append("[^/]"); i += 1
          case c =>
            if ("\\.[]{}()+-^$|".indexOf(c) >= 0) sb.append('\\')
            sb.append(c); i += 1
        }
      }
      sb.toString.r
    }
    def matches(abs: String): Boolean = globRe.forall { re =>
      val rel = abs.stripPrefix(srcRoot).stripPrefix("/")
      re.pattern.matcher(rel).matches()
    }
    val source = listSource(srcFs, new Path(sourceDir))
      .filter { case (p, _) => matches(p) }
    // pending counts only claims for files THIS run's (pattern-filtered)
    // source set contains — orphaned claims from prior runs with other
    // patterns, or for since-deleted source files, are not this run's
    // business and must not skew (or turn negative) the skip count
    val sourcePaths = source.map(_._1).toSet
    val pending = orphanClaims.count(sourcePaths.contains).toLong
    val runId = java.util.UUID.randomUUID().toString
    val claimed = source.filter { case (path, size) =>
      val name = sha256(path)
      !taken.contains(name) &&
        writeMarker(fs, new Path(dir, name),
          Marker(path, size, "claimed", runId, -1L), overwrite = false)
    }
    val skipped = source.size - claimed.size - pending

    if (claimed.isEmpty)
      return Report(0L, skipped.toLong, pending, 0L,
        PjCommitLog.latest(fs, root).map(_.version).getOrElse(0L))

    val reader = format.toLowerCase(java.util.Locale.ROOT) match {
      case "csv" => spark.read.option("header", "true").format("csv")
      case f => spark.read.format(f)
    }
    // enforce the TABLE's schema, not the writer's widening lane: values
    // cast to the declared types (CSV ingest reads strings), no extra
    // source columns. A NULLABLE table column ABSENT from the source
    // fills with null (Delta parity) — files staged before an ADD COLUMN
    // landed must stay loadable after the evolution (the concurrency
    // fuzzer's DDL-racing-COPY-INTO schedules hit exactly this).
    val target = spark.read.format("pjparquet").load(tablePath).schema
    val loaded = reader.load(claimed.map(_._1): _*)
    val missing = target.fields
      .filterNot(f => loaded.columns.exists(_.equalsIgnoreCase(f.name)))
    val missingRequired = missing.filterNot(_.nullable).map(_.name)
    val extra = loaded.columns
      .filterNot(n => target.fields.exists(_.name.equalsIgnoreCase(n)))
    if (missingRequired.nonEmpty || extra.nonEmpty) {
      // release this run's claims before refusing: nothing landed, so the
      // files must stay loadable once the source is fixed
      claimed.foreach { case (path, _) => fs.delete(new Path(dir, sha256(path)), false) }
      throw new PJException(
        s"pjparquet: copy_into source schema does not match table " +
          s"'$tablePath' (missing non-nullable: ${missingRequired.mkString(", ")}; " +
          s"unexpected: ${extra.mkString(", ")})")
    }
    import org.apache.spark.sql.functions.{col, lit}
    loaded.select(target.fields.toSeq.map { f =>
      loaded.columns.find(_.equalsIgnoreCase(f.name)) match {
        case Some(src) =>
          col("`" + src.replace("`", "``") + "`").cast(f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }: _*)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true")
      .option("log.operation", s"copy-into:$runId")
      .save(tablePath)
    val after = PjCommitLog.latest(fs, root).getOrElse(
      throw new PJException(s"pjparquet: copy_into commit vanished from '$tablePath'"))
    // count THIS run's rows from its own tagged commit's delta — a racing
    // ingester's concurrent commit must not inflate the report. Backward
    // scan from head: O(racing writers) header reads, not O(versions)
    val ownVersion = PjCommitLog.versionOfRun(fs, root, runId).getOrElse(
      throw new PJException(s"pjparquet: copy_into commit for run $runId not found"))
    val rows = PjCommitLog.delta(fs, root, ownVersion)
      .add.map(e => math.max(e.rows, 0L)).sum
    claimed.foreach { case (path, size) =>
      writeMarker(fs, new Path(dir, sha256(path)),
        Marker(path, size, "done", runId, after.version), overwrite = true)
    }
    Report(claimed.size.toLong, skipped.toLong, pending, rows, after.version)
  }
}
