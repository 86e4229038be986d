package graft.sources.pjparquet

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

/** Streaming-read configuration threaded from the scan builder's options:
  * `maxFilesPerTrigger` caps each micro-batch (admission control /
  * backpressure — a backlog of 100k files drains as bounded batches
  * instead of one giant first batch).
  */
final case class PjStreamInfo(
    path: String,
    autogen: Boolean,
    mergeSchema: Boolean,
    maxFilesPerTrigger: Option[Int])

/** Micro-batch directory ingestion over pjparquet — `spark.readStream
  * .format("pjparquet").load(dir)` for the standard "parquet drops land in
  * a directory" pipeline, with all of the batch source's properties intact:
  * schema from the index (no inference storm), per-batch planning from
  * sidecars (executors never parse footers), partition columns, column
  * pruning and filter pushdown.
  *
  * Offsets are an (mtime, paths-at-that-mtime) watermark over the listing
  * sorted by (mtime, path): a file belongs to batch `(start, end]` when its
  * mtime is beyond `start`'s watermark (or equal with an unseen path) and
  * within `end`'s snapshot. The contract is the usual file-stream one:
  * files are appended (never rewritten in place or backdated); each lands
  * in exactly one batch, replayable from the offset pair alone.
  *
  * With `maxFilesPerTrigger` ([[SupportsAdmissionControl]]) each batch
  * advances the watermark by at most n files in (mtime, path) order;
  * `Trigger.AvailableNow` then drains the backlog as a SEQUENCE of bounded
  * batches via Spark's wrapper.
  */
class PjMicroBatchStream(
    info: PjStreamInfo,
    fileSchema: StructType,
    dataRequired: StructType,
    partitionSchema: StructType,
    partRequired: StructType,
    pushedFilters: Seq[org.apache.spark.sql.sources.Filter],
    /** Partition-exact filters the batch builder claimed as fully pushed:
      * Spark no longer re-applies them above the scan, so every per-batch
      * file discovery must re-apply them here (definite-match keeps).
      */
    claimedFilters: Seq[org.apache.spark.sql.sources.Filter] = Nil)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  final case class PjStreamOffset(maxMtime: Long, paths: Seq[String]) extends Offset {
    override def json(): String = {
      def q(s: String) = "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      s"""{"maxMtime":$maxMtime,"paths":[${paths.sorted.map(q).mkString(",")}]}"""
    }
  }

  private val Earliest = PjStreamOffset(-1L, Nil)

  /** (path -> mtime) of every data file under the directory right now. */
  private def listMtimes(): Map[String, Long] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val root = new Path(info.path)
    val fs = root.getFileSystem(conf)
    val it = fs.listFiles(root, true)
    val m = Map.newBuilder[String, Long]
    while (it.hasNext) {
      val s = it.next()
      val n = s.getPath.getName
      if (s.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
        m += (s.getPath.toString -> s.getModificationTime)
    }
    m.result()
  }

  private def afterStart(start: PjStreamOffset)(p: String, m: Long): Boolean =
    m > start.maxMtime || (m == start.maxMtime && !start.paths.contains(p))

  override def initialOffset(): Offset = Earliest

  override def getDefaultReadLimit: ReadLimit =
    info.maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  /** `Trigger.AvailableNow` snapshot: files that appear AFTER this point
    * belong to the next run, and the bounded-batch loop below terminates
    * exactly at this watermark. Implementing the interface natively (rather
    * than taking Spark's wrapper) is what lets AvailableNow compose with
    * `maxFilesPerTrigger` as a sequence of bounded batches.
    */
  @volatile private var availableNowTarget: Option[PjStreamOffset] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    val mtimes = listMtimes()
    availableNowTarget = Some(
      if (mtimes.isEmpty) Earliest
      else {
        val maxM = mtimes.valuesIterator.max
        PjStreamOffset(maxM, mtimes.collect { case (p, m) if m == maxM => p }.toSeq)
      })
  }

  /** Advance the watermark past at most `limit` pending files in
    * (mtime, path) order. The boundary offset's path set contains every
    * prefix path at the boundary mtime (already-consumed ones included —
    * the start side excludes them on read), so the NEXT batch resumes
    * exactly after the cut even when many files share one mtime tick.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startO = start.asInstanceOf[PjStreamOffset]
    val mtimes = listMtimes()
    val inSnapshot: (String, Long) => Boolean = availableNowTarget match {
      case Some(t) => (p, m) => m < t.maxMtime || (m == t.maxMtime && t.paths.contains(p))
      case None => (_, _) => true
    }
    val pending = mtimes.toSeq
      .filter { case (p, m) => afterStart(startO)(p, m) && inSnapshot(p, m) }
      .sortBy { case (p, m) => (m, p) }
    if (pending.isEmpty) return startO
    val cap = limit match {
      case f: ReadMaxFiles => f.maxFiles()
      case _: ReadAllAvailable => Int.MaxValue
      case _ => Int.MaxValue
    }
    val taken = pending.take(cap)
    val boundaryM = taken.last._2
    val carried =
      if (startO.maxMtime == boundaryM) startO.paths else Nil
    PjStreamOffset(boundaryM,
      (carried ++ taken.collect { case (p, m) if m == boundaryM => p }).distinct)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def deserializeOffset(json: String): Offset = {
    val maxM = """"maxMtime":(-?\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong).getOrElse(-1L)
    val paths = """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(
      json.dropWhile(_ != '[')).map(_.group(1)
        .replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
    PjStreamOffset(maxM, paths.filterNot(_ == "maxMtime"))
  }

  /** Files in `(start, end]` under the watermark scheme, as validated
    * PjFiles (index bytes + partition values) from the batch resolver.
    */
  private def filesInWindow(start: PjStreamOffset, end: PjStreamOffset): Seq[PjFile] = {
    if (end.maxMtime < 0) return Nil
    val mtimes = listMtimes()
    val endPaths = end.paths.toSet
    def atOrBeforeEnd(p: String, m: Long): Boolean =
      m < end.maxMtime || (m == end.maxMtime && endPaths.contains(p))
    val layout = PjParquetTable.resolveFiles(
      info.path, SparkSession.active.sessionState.newHadoopConf(),
      info.autogen, info.mergeSchema)
    layout.files.filter { f =>
      mtimes.get(f.path) match {
        case Some(m) => afterStart(start)(f.path, m) && atOrBeforeEnd(f.path, m)
        case None => false // deleted between listing and resolution
      }
    }.filter(f => claimedFilters.forall(cf =>
      PjPartitionFilter.exactMatch(partitionSchema, f, cf).contains(true)))
  }

  private def batchScan(files: Seq[PjFile]): PjScan =
    new PjScan(files, fileSchema, dataRequired, partitionSchema, partRequired,
      None, pushedFilters)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    batchScan(filesInWindow(
      start.asInstanceOf[PjStreamOffset], end.asInstanceOf[PjStreamOffset]))
      .planInputPartitions()

  override def createReaderFactory(): PartitionReaderFactory =
    batchScan(Nil).createReaderFactory()

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
