package graft.sources.pjparquet

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.core.{PJException, PJSplice}

/** Versioned commit log for pjparquet tables — opt-in snapshot isolation,
  * time travel, and ONE-read planning.
  *
  * Layout under `<root>/_pj_log/`:
  *
  *  - `<version %020d>.json` — one DELTA per commit: the files this commit
  *    ADDED (full [[FileEntry]] records: size, row count, footer
  *    fingerprint, per-column min/max/null-count stats, top-level column
  *    names) and the table-relative paths it REMOVED (retired for time
  *    travel, not deleted), plus action, timestamp, the post-commit live
  *    file count, the data schema when it changed, and the originating SQL
  *    command for row-level DML (powering [[PjChangeFeed]]).
  *  - `<version %020d>.checkpoint.json` — every [[CheckpointInterval]]
  *    commits (and at the oldest kept version after
  *    [[PjVacuum.expireVersions]]) a full snapshot, so a reader replays
  *    ONE checkpoint plus a bounded delta tail instead of the whole
  *    history — the same compaction shape as the streaming file log
  *    ([[PjMicroBatchStream]]) and Delta's `_last_checkpoint` protocol.
  *
  * Why entries carry stats: resolution of a logged table plans from the
  * log ALONE — schema, file sizes, row counts, and file-level min/max
  * pruning all come from one snapshot read with ZERO per-file sidecar
  * opens (Delta `add.stats` / Iceberg-manifest parity). Sidecar indexes
  * are loaded lazily, only for files that survive pruning, and validated
  * against the entry's footer fingerprint instead of an mtime probe.
  *
  * Log growth is O(changes + periodic snapshots), not
  * O(commits × files): a streaming source committing every epoch into a
  * million-file table writes epoch-sized deltas, and expiry drops the
  * replayed prefix behind a fresh checkpoint.
  *
  * Commit protocol: the version file is claimed ATOMICALLY — a hard link
  * on local filesystems (link(2) fails with EEXIST), exclusive create
  * elsewhere (atomic on HDFS's namenode) — so two racing writers can
  * never both own a version. A loser whose commit is a PURE APPEND
  * (removes nothing) rebases on the winner's snapshot and retries — the
  * common concurrent case (two streaming sources, backfill + live) just
  * works; anything that retires files (overwrite, DML, compaction)
  * conflicts loudly, Delta-style.
  *
  * Legacy compatibility: round-9 logs stored one full snapshot per commit
  * as `{"files":[...]}`; those parse as checkpoints (every version
  * self-contained), so existing tables replay unchanged.
  */
object PjCommitLog {
  val DirName = "_pj_log"

  /** A full snapshot is written every this-many commits. */
  val CheckpointInterval = 10

  /** Pure-add rebase attempts before giving up. Every claim round has a
    * winner (the claim is atomic), so system-wide progress is guaranteed
    * and a generous budget is safe — Delta's equivalent knob defaults to
    * ten million; this is bounded mostly to keep a misconfigured fleet's
    * failure loud rather than eternal.
    */
  private val ConflictRetries = 100

  /** Aggregated (whole-file) column statistics: envelope of the parquet
    * chunk stats over every row group — min of mins, max of maxes (raw
    * plain-encoded bytes, the same representation [[PjStatsFilter]]
    * compares), summed null count (-1 = unknown). Only physical types
    * with a type-defined total order that the pruner understands are
    * recorded (INT32=1, INT64=2, BYTE_ARRAY=6); everything else is
    * simply absent = never pruned on.
    */
  final case class ColStat(
      physType: Int, nullCount: Long,
      min: Option[Array[Byte]], max: Option[Array[Byte]])

  /** One live data file of a snapshot. `path` is table-root-relative.
    * Unknown facts are -1/None — entries adopted from a pre-log directory
    * or written by the legacy full-snapshot format plan exactly like
    * before (eager per-file load); entries with full facts plan with zero
    * file I/O ([[planned]]).
    */
  final case class FileEntry(
      path: String,
      size: Long = -1L,
      rows: Long = -1L,
      rowGroups: Int = -1,
      fingerprint: Option[Long] = None,
      nested: Boolean = false,
      cols: Option[Seq[String]] = None,
      stats: Map[String, ColStat] = Map.empty) {
    /** Plannable from the log alone (no sidecar/footer open needed). */
    def planned: Boolean = size >= 0 && rows >= 0 && rowGroups >= 0 && fingerprint.isDefined
    /** Zero-row-group parquet (legal, un-indexable, contributes no rows). */
    def isEmptyFile: Boolean = rows == 0 && rowGroups == 0
  }

  /** Materialized state at a version (replayed checkpoint + delta tail). */
  final case class Snapshot(
      version: Long,
      action: String,
      entries: Seq[FileEntry],
      ts: Long = 0L,
      dataSchemaJson: Option[String] = None,
      operation: Option[String] = None) {
    def files: Seq[String] = entries.map(_.path)
  }

  /** One DESCRIBE-HISTORY row — read from each version's own (small) log
    * file, no snapshot replay.
    */
  final case class HistoryEntry(version: Long, ts: Long, action: String, nFiles: Long)

  /** The delta a commit recorded (for [[PjChangeFeed]]): files added with
    * their entries, table-relative paths removed.
    */
  final case class Delta(
      version: Long, ts: Long, action: String, operation: Option[String],
      add: Seq[FileEntry], remove: Seq[String], legacyFull: Boolean)

  def logDir(root: Path): Path = new Path(root, DirName)

  def isEnabled(fs: FileSystem, root: Path): Boolean =
    try fs.getFileStatus(logDir(root)).isDirectory
    catch { case _: java.io.FileNotFoundException => false }

  private def commitFile(root: Path, v: Long): Path =
    new Path(logDir(root), f"$v%020d.json")
  private def checkpointFile(root: Path, v: Long): Path =
    new Path(logDir(root), f"$v%020d.checkpoint.json")

  /** Both on-disk files a version may own (for expiry deletion). */
  private[pjparquet] def versionFiles(root: Path, v: Long): Seq[Path] =
    Seq(commitFile(root, v), checkpointFile(root, v))

  private final case class Listing(commits: Seq[Long], checkpoints: Seq[Long],
      sizes: Map[String, Long]) {
    def versions: Seq[Long] = (commits ++ checkpoints).distinct.sorted
    /** Content token of a version's on-disk file (commit, else checkpoint). */
    def token(v: Long): Long =
      sizes.getOrElse(f"$v%020d.json", sizes.getOrElse(f"$v%020d.checkpoint.json", -1L))
  }

  private def listing(fs: FileSystem, root: Path): Listing =
    try {
      val statuses = fs.listStatus(logDir(root)).toSeq
      val names = statuses.map(_.getPath.getName)
      def vOf(n: String, suffix: String): Option[Long] = {
        val body = n.stripSuffix(suffix)
        if (n.endsWith(suffix) && body.nonEmpty && body.forall(_.isDigit)) Some(body.toLong)
        else None
      }
      Listing(
        names.flatMap(n => if (n.endsWith(".checkpoint.json")) None else vOf(n, ".json")).sorted,
        names.flatMap(vOf(_, ".checkpoint.json")).sorted,
        statuses.map(s => s.getPath.getName -> s.getLen).toMap)
    } catch { case _: java.io.FileNotFoundException => Listing(Nil, Nil, Map.empty) }

  /** All committed versions, ascending. */
  def versions(fs: FileSystem, root: Path): Seq[Long] = listing(fs, root).versions

  def latest(fs: FileSystem, root: Path): Option[Snapshot] = {
    val l = listing(fs, root)
    l.versions.lastOption.map(v => readAt(fs, root, v, l))
  }

  def read(fs: FileSystem, root: Path, version: Long): Snapshot =
    readAt(fs, root, version, listing(fs, root))

  /** Materialized snapshots are IMMUTABLE once committed (version files
    * never change content; checkpoints only add redundant replay bases),
    * so replay results cache safely by (root, version). Every analyzer
    * pass re-resolves the table; with the cache that costs one log-dir
    * listing instead of re-parsing a large checkpoint. Bounded LRU.
    */
  private val snapshotCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, Long, Long), Snapshot](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, Long, Long), Snapshot]): Boolean = size() > 64
      })

  private def readAt(fs: FileSystem, root: Path, version: Long, l: Listing): Snapshot = {
    // the version file's size is the validity token: it catches a table
    // deleted and recreated at the same path (new v1, different bytes)
    val key = (fs.makeQualified(root).toString, version, l.token(version))
    val cached = snapshotCache.get(key)
    if (cached != null && l.versions.contains(version)) return cached
    val snap = readAtUncached(fs, root, version, l)
    snapshotCache.put(key, snap)
    snap
  }

  private def readAtUncached(fs: FileSystem, root: Path, version: Long, l: Listing): Snapshot = {
    if (!l.versions.contains(version)) {
      val vs = l.versions
      throw new PJException(
        s"pjparquet: version $version does not exist under ${logDir(root)}" +
          (if (vs.isEmpty) " (table has no commit log)"
          else s" (available: ${vs.head}..${vs.last})"))
    }
    // base: the newest checkpoint at or before the target, else empty
    val cpv = l.checkpoints.filter(_ <= version).lastOption
    val entries = new java.util.LinkedHashMap[String, FileEntry]()
    var schema: Option[String] = None
    var ts = 0L
    var action = "unknown"
    var operation: Option[String] = None
    cpv.foreach { c =>
      val node = parseFile(fs, checkpointFile(root, c), c)
      nodeEntries(node, "entries").foreach(e => entries.put(e.path, e))
      schema = optText(node, "dataSchema")
      ts = node.path("ts").asLong(0L)
      action = Option(node.get("action")).map(_.asText).getOrElse("unknown")
    }
    // delta tail above the checkpoint base (ascending); versions below the
    // base need no files at all — that is exactly what expiry exploits
    val tail = l.commits.filter(v => v > cpv.getOrElse(0L) && v <= version)
    for (v <- tail) {
      val node = parseFile(fs, commitFile(root, v), v)
      if (node.has("files")) {
        // legacy full snapshot: replaces the whole state — including any
        // recorded schema, which described files this commit may have
        // replaced (the path-only entries re-resolve eagerly anyway)
        entries.clear()
        schema = None
        node.get("files").elements().asScala.foreach { f =>
          val e = FileEntry(f.asText); entries.put(e.path, e)
        }
      } else {
        node.path("remove").elements().asScala.foreach(r => entries.remove(r.asText))
        nodeEntries(node, "add").foreach(e => entries.put(e.path, e))
      }
      optText(node, "dataSchema").foreach(s => schema = Some(s))
      ts = node.path("ts").asLong(0L)
      action = Option(node.get("action")).map(_.asText).getOrElse("unknown")
      operation = optText(node, "operation")
    }
    if (tail.isEmpty && cpv.contains(version)) {
      // version materialized purely from its checkpoint (post-expiry base):
      // its operation rode the original commit file, which may be gone
      operation = None
    }
    Snapshot(version, action,
      entries.values().asScala.toSeq.sortBy(_.path), ts, schema, operation)
  }

  /** The raw delta one commit recorded — [[PjChangeFeed]]'s unit of work.
    * For a legacy full-snapshot commit the add list is the full state
    * (`legacyFull=true`) and the caller diffs against the prior version.
    */
  def delta(fs: FileSystem, root: Path, version: Long): Delta = {
    val p = commitFile(root, version)
    if (!fs.exists(p)) {
      // checkpoint-only version (post-expiry base): the delta is unknowable
      val snap = read(fs, root, version)
      return Delta(version, snap.ts, snap.action, None, snap.entries, Nil, legacyFull = true)
    }
    val node = parseFile(fs, p, version)
    val ts = node.path("ts").asLong(0L)
    val action = Option(node.get("action")).map(_.asText).getOrElse("unknown")
    if (node.has("files"))
      Delta(version, ts, action, None,
        node.get("files").elements().asScala.map(f => FileEntry(f.asText)).toSeq,
        Nil, legacyFull = true)
    else
      Delta(version, ts, action, optText(node, "operation"),
        nodeEntries(node, "add"),
        node.path("remove").elements().asScala.map(_.asText).toSeq,
        legacyFull = false)
  }

  /** Commit a delta as `latest+1`: `add` entries become live, `remove`
    * paths retire. The version-file claim is atomic; on losing a race, a
    * PURE APPEND (empty `remove`) rebases on the winner's state and
    * retries — disjoint concurrent appends both land — while any commit
    * that retires files fails loudly (the files it read may be gone).
    * Returns the committed version.
    */
  def commit(
      fs: FileSystem,
      root: Path,
      action: String,
      add: Seq[FileEntry],
      remove: Set[String],
      dataSchemaJson: Option[String] = None,
      operation: Option[String] = None): Long = {
    val dir = logDir(root)
    fs.mkdirs(dir)
    var attempt = 0
    while (true) {
      val l = listing(fs, root)
      val prev = l.versions.lastOption.map(v => readAt(fs, root, v, l))
      val v = prev.map(_.version).getOrElse(0L) + 1
      val prevPaths = prev.map(_.files.toSet).getOrElse(Set.empty)
      val effectiveRemove = remove.intersect(prevPaths)
      val nLive = ((prevPaths -- effectiveRemove) ++ add.map(_.path)).size
      val body = renderCommit(v, System.currentTimeMillis(), action, add,
        effectiveRemove.toSeq.sorted, nLive, dataSchemaJson, operation)
      if (publish(fs, commitFile(root, v), body)) {
        if (v % CheckpointInterval == 0)
          try writeCheckpoint(fs, root, v)
          catch { case scala.util.control.NonFatal(_) => /* replay covers it */ }
        return v
      }
      attempt += 1
      if (remove.nonEmpty)
        throw new PJException(
          s"pjparquet: commit-log version conflict at ${commitFile(root, v)} " +
            "(concurrent writer); commits that replace or retire files cannot " +
            "be rebased — retry the operation against the new table state")
      if (attempt >= ConflictRetries)
        throw new PJException(
          s"pjparquet: commit-log version conflict at ${commitFile(root, v)} " +
            s"persisted after $ConflictRetries rebase attempts (concurrent writers)")
      // jittered backoff (capped) breaks the thundering herd when several
      // pure appenders race the same version counter
      Thread.sleep(java.util.concurrent.ThreadLocalRandom.current()
        .nextLong(1L, math.min(200L, 10L * attempt)))
    }
    -1L // unreachable
  }

  /** Legacy API: commit the FULL post-state file list (paths only). The
    * delta is computed against the previous snapshot; existing entries
    * keep their stats. No conflict rebase — a full-state commit was
    * computed against a specific base and cannot be safely replayed.
    */
  def append(fs: FileSystem, root: Path, action: String, files: Seq[String]): Long = {
    val prev = latest(fs, root)
    val prevMap: Map[String, FileEntry] =
      prev.map(_.entries.map(e => e.path -> e).toMap).getOrElse(Map.empty)
    val post = files.toSet
    val add = files.filterNot(prevMap.contains).sorted.map(FileEntry(_))
    val remove = prevMap.keySet -- post
    val dir = logDir(root)
    fs.mkdirs(dir)
    val v = prev.map(_.version).getOrElse(0L) + 1
    val body = renderCommit(v, System.currentTimeMillis(), action, add,
      remove.toSeq.sorted, post.size, None, None)
    if (!publish(fs, commitFile(root, v), body))
      throw new PJException(
        s"pjparquet: commit-log version conflict at ${commitFile(root, v)} " +
          "(concurrent writer)")
    if (v % CheckpointInterval == 0)
      try writeCheckpoint(fs, root, v)
      catch { case scala.util.control.NonFatal(_) => }
    v
  }

  /** Write (or keep) the full-snapshot checkpoint for `v` — called on the
    * cadence commits and by [[PjVacuum.expireVersions]] before it drops
    * the delta prefix the version would otherwise need for replay.
    * The JSON is STREAMED to the file: a million-entry checkpoint never
    * materializes as one giant in-memory string.
    */
  def writeCheckpoint(fs: FileSystem, root: Path, v: Long): Unit = {
    val target = checkpointFile(root, v)
    if (fs.exists(target)) return
    val snap = read(fs, root, v)
    val mapper = new ObjectMapper()
    publishStream(fs, target) { out =>
      val g = new com.fasterxml.jackson.core.JsonFactory().createGenerator(out)
      g.writeStartObject()
      g.writeNumberField("version", snap.version)
      g.writeNumberField("ts", snap.ts)
      g.writeStringField("action", snap.action)
      g.writeNumberField("nFiles", snap.entries.size.toLong)
      g.writeBooleanField("checkpoint", true)
      snap.dataSchemaJson.foreach(s => g.writeStringField("dataSchema", s))
      g.writeArrayFieldStart("entries")
      snap.entries.foreach(e => mapper.writeTree(g, entryNode(mapper, e)))
      g.writeEndArray()
      g.writeEndObject()
      g.flush()
    }
    ()
  }

  /** Latest version committed at or before `tsMillis` (Delta semantics).
    * Reads per-version headers newest-first — no snapshot replay.
    */
  def versionAtTimestamp(fs: FileSystem, root: Path, tsMillis: Long): Long = {
    val vs = versions(fs, root)
    val at = vs.reverseIterator.find(v => headerOf(fs, root, v).ts <= tsMillis)
    at.getOrElse(throw new PJException(
      s"pjparquet: no commit at or before timestamp $tsMillis" +
        (if (vs.isEmpty) " (table has no commit log)"
        else s" (earliest commit ts=${headerOf(fs, root, vs.head).ts})")))
  }

  /** DESCRIBE HISTORY: one row per retained version, each read from its
    * own small log file — O(versions) metadata reads, no replay.
    */
  def history(fs: FileSystem, root: Path): Seq[HistoryEntry] =
    versions(fs, root).map(v => headerOf(fs, root, v))

  private def headerOf(fs: FileSystem, root: Path, v: Long): HistoryEntry = {
    val p = commitFile(root, v)
    val node =
      if (fs.exists(p)) parseFile(fs, p, v)
      else parseFile(fs, checkpointFile(root, v), v)
    val nFiles =
      if (node.has("nFiles")) node.get("nFiles").asLong
      else if (node.has("files")) node.get("files").size.toLong
      else if (node.has("entries")) node.get("entries").size.toLong
      else -1L
    HistoryEntry(v, node.path("ts").asLong(0L),
      Option(node.get("action")).map(_.asText).getOrElse("unknown"), nFiles)
  }

  /** Table-root-relative path of a data file (for snapshot membership). */
  def relativize(fs: FileSystem, root: Path, p: Path): String = {
    val rootUri = fs.makeQualified(root).toUri.getPath.stripSuffix("/")
    val pathUri = fs.makeQualified(p).toUri.getPath
    if (!pathUri.startsWith(rootUri + "/"))
      throw new PJException(s"pjparquet: $p is not under table root $root")
    pathUri.drop(rootUri.length + 1)
  }

  /** Build a [[FileEntry]] from a freshly generated index (the write/
    * compaction commit path): rows, row groups, footer fingerprint,
    * column names, and the per-column stats envelope, straight from the
    * in-memory index — no extra I/O.
    */
  def entryFromIndex(relPath: String, size: Long, indexBytes: Array[Byte]): FileEntry = {
    val idx = PJSplice.Index.fromBytes(indexBytes)
    val names = idx.columnNames.toSeq
    val rgs = idx.header.rowGroups
    var rows = 0L
    var rg = 0
    while (rg < rgs) { rows += idx.rowNumber(rg); rg += 1 }
    FileEntry(relPath, size, rows, rgs, Some(idx.footerFnv64), nested = false,
      Some(names), aggregateStats(idx))
  }

  /** Whole-file stats envelope from an index's per-chunk statistics:
    * min of mins / max of maxes under the physical type's own order
    * (signed LE for INT32/INT64, unsigned lexicographic for BYTE_ARRAY —
    * the same comparisons [[PjStatsFilter]] prunes with), null counts
    * summed (-1 anywhere = unknown). A row group with a missing bound
    * makes that bound unknown for the file; truncated parquet bounds are
    * still valid bounds, so the envelope stays sound.
    */
  private def aggregateStats(idx: PJSplice.Index): Map[String, ColStat] = {
    val names = idx.columnNames
    val rgs = idx.header.rowGroups
    val out = Map.newBuilder[String, ColStat]
    var c = 0
    while (c < names.length) {
      var physType = -1
      var nullCount = 0L
      var min: Array[Byte] = null
      var max: Array[Byte] = null
      var minOk = true
      var maxOk = true
      var supported = true
      var rg = 0
      while (rg < rgs && supported) {
        val st =
          try idx.chunkStats(rg, c)
          catch { case scala.util.control.NonFatal(_) => null }
        if (st == null) supported = false
        else {
          if (physType == -1) physType = st.physType
          if (st.physType != 1 && st.physType != 2 && st.physType != 6) supported = false
          else {
            if (nullCount >= 0)
              nullCount = if (st.nullCount < 0) -1L else nullCount + st.nullCount
            if (st.min == null) minOk = false
            else if (minOk && (min == null || cmpStat(physType, st.min, min) < 0)) min = st.min
            if (st.max == null) maxOk = false
            else if (maxOk && (max == null || cmpStat(physType, st.max, max) > 0)) max = st.max
          }
        }
        rg += 1
      }
      if (supported && physType > 0 && (minOk || maxOk || nullCount >= 0))
        // last-wins for duplicate names, matching the splice's O5 rule
        out += names(c) -> ColStat(physType, nullCount,
          if (minOk) Option(min) else None, if (maxOk) Option(max) else None)
      c += 1
    }
    out.result()
  }

  /** Physical-type-ordered compare of two plain-encoded stat values. */
  private def cmpStat(physType: Int, a: Array[Byte], b: Array[Byte]): Int = physType match {
    case 1 | 2 =>
      val av = leLong(a); val bv = leLong(b)
      java.lang.Long.compare(av, bv)
    case _ => // BYTE_ARRAY: unsigned lexicographic
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
  }

  private def leLong(b: Array[Byte]): Long = {
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (b.length == 4) bb.getInt.toLong else bb.getLong
  }

  // ------------------------------------------------------------ publish

  /** Atomically claim `target` with `body`. Local filesystems hard-link a
    * fully written temp file over (link(2) is atomic and fails with
    * EEXIST); other stores use exclusive create — atomic on HDFS; object
    * stores without conditional create keep the documented single-writer-
    * per-version contract. Returns false when the version was already
    * claimed (conflict).
    */
  private def publish(fs: FileSystem, target: Path, body: String): Boolean = {
    val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    publishStream(fs, target)(out => out.write(bytes))
  }

  /** Streaming form of the atomic claim: `write` receives the output
    * stream directly, so large bodies (checkpoints) never materialize as
    * one in-memory string.
    */
  private def publishStream(
      fs: FileSystem, target: Path)(write: java.io.OutputStream => Unit): Boolean = {
    if (fs.getScheme == "file") {
      val dir = target.getParent
      val tmp = new Path(dir, s".${target.getName}.${java.util.UUID.randomUUID()}.tmp")
      val out = fs.create(tmp, false)
      try write(out) finally out.close()
      val tmpNio = java.nio.file.Paths.get(fs.makeQualified(tmp).toUri)
      val tgtNio = java.nio.file.Paths.get(fs.makeQualified(target).toUri)
      try {
        java.nio.file.Files.createLink(tgtNio, tmpNio)
        fs.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          fs.delete(tmp, false); false
      }
    } else {
      if (fs.exists(target)) return false
      try {
        val out = fs.create(target, false)
        try write(out) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      }
    }
  }

  // --------------------------------------------------------------- json

  private def renderCommit(
      v: Long, ts: Long, action: String, add: Seq[FileEntry], remove: Seq[String],
      nFiles: Long, dataSchemaJson: Option[String], operation: Option[String]): String = {
    val mapper = new ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("version", v)
    node.put("ts", ts)
    node.put("action", action)
    node.put("nFiles", nFiles)
    operation.foreach(o => node.put("operation", o))
    dataSchemaJson.foreach(s => node.put("dataSchema", s))
    val addArr = node.putArray("add")
    add.foreach(e => addArr.add(entryNode(mapper, e)))
    val rmArr = node.putArray("remove")
    remove.foreach(rmArr.add)
    mapper.writeValueAsString(node) + "\n"
  }

  private def entryNode(mapper: ObjectMapper, e: FileEntry): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("p", e.path)
    if (e.size >= 0) n.put("s", e.size)
    if (e.rows >= 0) n.put("r", e.rows)
    if (e.rowGroups >= 0) n.put("g", e.rowGroups)
    e.fingerprint.foreach(f => n.put("f", java.lang.Long.toHexString(f)))
    if (e.nested) n.put("n", true)
    e.cols.foreach { cs =>
      val arr = n.putArray("c")
      cs.foreach(arr.add)
    }
    if (e.stats.nonEmpty) {
      val st = n.putObject("st")
      val b64 = java.util.Base64.getEncoder
      e.stats.toSeq.sortBy(_._1).foreach { case (name, cs) =>
        val s = st.putObject(name)
        s.put("t", cs.physType)
        s.put("nc", cs.nullCount)
        cs.min.foreach(m => s.put("mn", b64.encodeToString(m)))
        cs.max.foreach(m => s.put("mx", b64.encodeToString(m)))
      }
    }
    n
  }

  private def entryOf(n: JsonNode): FileEntry = {
    val b64 = java.util.Base64.getDecoder
    val stats: Map[String, ColStat] =
      if (!n.has("st")) Map.empty
      else n.get("st").fieldNames().asScala.map { name =>
        val s = n.get("st").get(name)
        name -> ColStat(
          s.path("t").asInt(-1), s.path("nc").asLong(-1L),
          Option(s.get("mn")).map(m => b64.decode(m.asText)),
          Option(s.get("mx")).map(m => b64.decode(m.asText)))
      }.toMap
    FileEntry(
      n.get("p").asText,
      n.path("s").asLong(-1L),
      n.path("r").asLong(-1L),
      n.path("g").asInt(-1),
      Option(n.get("f")).map(f => java.lang.Long.parseUnsignedLong(f.asText, 16)),
      n.path("n").asBoolean(false),
      Option(n.get("c")).map(_.elements().asScala.map(_.asText).toSeq),
      stats)
  }

  private def nodeEntries(node: JsonNode, field: String): Seq[FileEntry] =
    if (!node.has(field)) Nil
    else node.get(field).elements().asScala.map(entryOf).toSeq

  private def optText(node: JsonNode, field: String): Option[String] =
    Option(node.get(field)).map(_.asText)

  private def parseFile(fs: FileSystem, p: Path, version: Long): JsonNode = {
    // stream-parse straight off the file: a large checkpoint is one node
    // tree in memory, never also an intermediate string
    val node =
      try {
        val in = fs.open(p)
        try new ObjectMapper().readTree(in: java.io.InputStream)
        finally in.close()
      } catch {
        case _: java.io.FileNotFoundException =>
          val vs = versions(fs, p.getParent.getParent)
          throw new PJException(
            s"pjparquet: version $version does not exist under ${p.getParent}" +
              (if (vs.isEmpty) " (table has no commit log)"
              else s" (available: ${vs.head}..${vs.last})"))
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new PJException(
            s"pjparquet: corrupt commit-log entry $p (${e.getMessage.take(80)})")
      }
    val v = node.path("version").asLong(-1L)
    if (v != version)
      throw new PJException(
        s"pjparquet: commit-log entry claims version $v but is filed as $version")
    node
  }
}
