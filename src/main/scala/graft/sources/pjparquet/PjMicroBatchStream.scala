package graft.sources.pjparquet

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Micro-batch directory ingestion over pjparquet — `spark.readStream
  * .format("pjparquet").load(dir)` for the standard "parquet drops land in
  * a directory" pipeline, with all of the batch source's properties intact:
  * schema from the index (no inference storm), per-batch planning from
  * sidecars (executors never parse footers), partition columns, column
  * pruning and filter pushdown.
  *
  * Offsets are an (mtime, paths-at-that-mtime) watermark over the sorted
  * listing: a file belongs to batch `(start, end]` when its mtime is
  * beyond `start`'s watermark (or equal with an unseen path) and within
  * `end`'s snapshot. The contract is the usual file-stream one: files are
  * appended (never rewritten in place or backdated); each lands in exactly
  * one batch, replayable from the offset pair alone.
  */
class PjMicroBatchStream(
    path: String,
    autogen: Boolean,
    mergeSchema: Boolean,
    fileSchema: StructType,
    dataRequired: StructType,
    partitionSchema: StructType,
    partRequired: StructType,
    pushedFilters: Seq[org.apache.spark.sql.sources.Filter])
    extends MicroBatchStream {

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
    val root = new Path(path)
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

  override def initialOffset(): Offset = Earliest

  override def latestOffset(): Offset = {
    val mtimes = listMtimes()
    if (mtimes.isEmpty) Earliest
    else {
      val maxM = mtimes.valuesIterator.max
      PjStreamOffset(maxM, mtimes.collect { case (p, m) if m == maxM => p }.toSeq)
    }
  }

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
    val startPaths = start.paths.toSet
    def afterStart(p: String, m: Long): Boolean =
      m > start.maxMtime || (m == start.maxMtime && !startPaths.contains(p))
    def atOrBeforeEnd(p: String, m: Long): Boolean =
      m < end.maxMtime || (m == end.maxMtime && endPaths.contains(p))
    val layout = PjParquetTable.resolveFiles(
      path, SparkSession.active.sessionState.newHadoopConf(), autogen, mergeSchema)
    layout.files.filter { f =>
      mtimes.get(f.path) match {
        case Some(m) => afterStart(f.path, m) && atOrBeforeEnd(f.path, m)
        case None => false // deleted between listing and resolution
      }
    }
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
