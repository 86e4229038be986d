package graft.sources.pjparquet

import java.util.OptionalLong

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.parquet.PjSparkShims
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.core.PJSplice

class PjScanBuilder(files: Seq[PjFile], fullSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {

  private var requiredSchema: StructType = fullSchema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty

  /** Catalyst `ColumnPruning` lands here; the selected names drive the O4/O5
    * metadata splice at partition-planning time.
    */
  override def pruneColumns(required: StructType): Unit = {
    // Keep only top-level fields that exist in the file schema, in the
    // requested order (reference restriction: flat leaf columns,
    // `palletjack.cc:483-487`).
    requiredSchema = required
  }

  /** Filters ride to the executor as a parquet `FilterPredicate`, where the
    * shipped pruned footer's min/max stats skip whole row groups (and column
    * indexes skip pages) — zero extra driver cost, no footer parse. All
    * filters are also returned as residual so Spark re-evaluates them.
    */
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter]): Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters
    filters // conservative: everything is re-checked above the scan
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

  override def build(): Scan = {
    val explicitRgs: Option[Seq[Int]] = Option(options.get("rowGroups"))
      .map(_.split(",").iterator.map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq)
    if (explicitRgs.isDefined && files.size > 1)
      throw new IllegalArgumentException(
        s"pjparquet: option 'rowGroups' requires a single input file, got ${files.size}")
    new PjScan(files, fullSchema, requiredSchema, explicitRgs, pushed.toSeq)
  }
}

/** Row-group-aligned batch scan planned purely from PJ_2 indexes.
  *
  * Scale design: the pruned footer for each partition is built once on the
  * driver (O(selected rgs × selected cols) bytes) and shipped inside the
  * [[InputPartition]] — executors open the data file directly at absolute
  * chunk offsets and never touch footers. Consecutive row groups are
  * bin-packed into partitions targeting `spark.sql.files.maxPartitionBytes`
  * so 100k-row-group files do not explode into 100k tasks.
  */
class PjScan(
    files: Seq[PjFile],
    fullSchema: StructType,
    requiredSchema: StructType,
    explicitRowGroups: Option[Seq[Int]],
    pushedFilters: Seq[org.apache.spark.sql.sources.Filter] = Nil)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = requiredSchema

  override def toBatch: Batch = this

  override def description(): String =
    s"pjparquet ${files.size} file(s), cols=${requiredSchema.fieldNames.mkString(",")}" +
      explicitRowGroups.map(r => s", rowGroups=${r.mkString(",")}").getOrElse("") +
      (if (pushedFilters.nonEmpty) s", PushedFilters: [${pushedFilters.mkString(", ")}]" else "")

  // Column splice only when a strict subset of top-level fields is needed;
  // name-based selection follows reference O5 semantics (exact match).
  private def prunedColumnNames: Seq[String] = {
    val full = fullSchema.fieldNames.toSeq
    val req = requiredSchema.fieldNames.toSeq
    if (req == full || req.isEmpty) Nil else req
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val sqlConf = SQLConf.get
    val maxPartitionBytes = sqlConf.filesMaxPartitionBytes
    val colNames = prunedColumnNames
    files.iterator.flatMap { f =>
      val idx = PJSplice.Index.fromBytes(f.indexBytes)
      val rgCount = idx.header.rowGroups
      val selected = explicitRowGroups.getOrElse(0 until rgCount)
      if (selected.isEmpty) Iterator.empty
      else {
        // Estimate per-row-group data size from the file length; metadata
        // holds exact sizes but only inside chunk structs we never parse.
        val meanRgBytes = math.max(1L, f.fileLen / math.max(1, rgCount))
        val rgsPerPart = math.max(1, (maxPartitionBytes / meanRgBytes).toInt)
        selected.grouped(rgsPerPart).map { rgs =>
          val footer = PJSplice.splice(idx, rgs, Nil, colNames, schemaOnly = false)
          PjInputPartition(f.path, f.fileLen, rgs.toArray, footer)
        }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    val sqlConf = spark.sessionState.conf
    val hadoopConf = spark.sessionState.newHadoopConf()
    PjSparkShims.configureReadConf(hadoopConf, requiredSchema, sqlConf)
    if (pushedFilters.nonEmpty && PjSparkShims.parquetFilterPushDownEnabled(sqlConf)) {
      // Schema + rebase spec come from the index (schema-only splice), so
      // building the predicate costs no footer parse.
      val schemaFooter = graft.core.PalletJack.materialize(
        graft.core.PJSplice.splice(
          graft.core.PJSplice.Index.fromBytes(files.head.indexBytes), Nil, Nil, Nil, schemaOnly = true))
      val fileSchema = schemaFooter.getFileMetaData.getSchema
      val rebaseSpec = PjSparkShims.datetimeRebaseSpec(
        schemaFooter, PjSparkShims.rebaseModeInReadConf(sqlConf))
      PjSparkShims.buildFilterPredicate(fileSchema, pushedFilters, sqlConf, rebaseSpec)
        .foreach(p => PjSparkShims.setFilterPredicate(hadoopConf, p))
    }
    val broadcast: Broadcast[SerializableConfiguration] =
      spark.sparkContext.broadcast(new SerializableConfiguration(hadoopConf))
    PjPartitionReaderFactory(
      broadcast,
      requiredSchema.json,
      sqlConf.parquetVectorizedReaderBatchSize,
      sqlConf.offHeapColumnVectorEnabled,
      PjSparkShims.rebaseModeInReadConf(sqlConf),
      PjSparkShims.int96RebaseModeInReadConf(sqlConf))
  }

  /** Planning-time stats straight from the index — no footer parse. */
  override def estimateStatistics(): Statistics = {
    var rows = 0L
    var bytes = 0L
    val colFraction =
      if (fullSchema.isEmpty) 1.0
      else math.max(1, requiredSchema.size).toDouble / fullSchema.size
    for (f <- files) {
      val idx = PJSplice.Index.fromBytes(f.indexBytes)
      val rgCount = idx.header.rowGroups
      val selected = explicitRowGroups.getOrElse(0 until rgCount)
      selected.foreach(rg => rows += idx.rowNumber(rg))
      bytes += (f.fileLen * colFraction * selected.size / math.max(1, rgCount)).toLong
    }
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
      override def numRows(): OptionalLong = OptionalLong.of(rows)
    }
  }
}

/** Self-contained split: executors need nothing but these fields. */
final case class PjInputPartition(
    filePath: String,
    fileLen: Long,
    rowGroups: Array[Int],
    prunedFooter: Array[Byte])
    extends InputPartition
