package graft.sources.pjparquet

import java.util.OptionalLong

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.expressions.aggregate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.parquet.PjSparkShims
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.core.PJSplice

class PjScanBuilder(layout: PjLayout, fileSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with SupportsPushDownAggregates {

  import org.apache.spark.sql.sources._

  // --------------------------------------- COUNT(*) at metadata rate (O3+)

  /** An unfiltered global `count(*)` never needs data pages OR footers: the
    * PJ_2 index already stores every row group's row count (the same
    * `row_numbers` section the reference uses to rewrite `num_rows` after
    * pruning, `palletjack.cc:42,495-506`). Complete aggregate pushdown
    * turns the whole query into a driver-side [[LocalScan]] over the
    * cached index bytes — zero tasks, zero I/O beyond the (cached) index.
    * Any pushed filter disables this (row survival would depend on data);
    * the explicit `rowGroups` option stays supported since it selects
    * whole row groups whose counts the index knows exactly.
    */
  private var countStarPushed = false

  override def supportCompletePushDown(agg: aggregate.Aggregation): Boolean =
    canPushCountStar(agg)

  override def pushAggregation(agg: aggregate.Aggregation): Boolean = {
    countStarPushed = canPushCountStar(agg)
    countStarPushed
  }

  private def canPushCountStar(agg: aggregate.Aggregation): Boolean =
    Option(options.get("countStarPushdown")).forall(_.toBoolean) &&
      agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions.head.isInstanceOf[aggregate.CountStar] &&
      pushed.isEmpty

  private val fullSchema = StructType(fileSchema.fields ++ layout.partitionSchema.fields)
  private var requiredSchema: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

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
    * indexes skip pages) — zero extra driver cost, no footer parse. Filters
    * on Hive partition columns additionally prune whole FILES at planning
    * time. All filters are also returned as residual so Spark re-evaluates
    * them.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // conservative: everything is re-checked above the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  // ------------------------------------------ partition pruning (planning)

  private lazy val partIndex: Map[String, Int] =
    layout.partitionSchema.fieldNames.zipWithIndex
      .map { case (n, i) => n.toLowerCase(java.util.Locale.ROOT) -> i }.toMap

  /** Typed partition value for `col` in `f`, or None when `col` is not a
    * partition column. A `Some(null)` is a genuine Hive null partition.
    */
  private def partValue(f: PjFile, col: String): Option[Any] =
    partIndex.get(col.toLowerCase(java.util.Locale.ROOT)).map { i =>
      val raw = f.partitionValues(i)
      if (raw == PjParquetTable.HiveNullPartition) null
      else layout.partitionSchema.fields(i).dataType match {
        case org.apache.spark.sql.types.LongType => raw.toLong
        case _ => raw
      }
    }

  private def cmp(x: Any, v: Any): Option[Int] = (x, v) match {
    case (a: Long, b: Number) => Some(java.lang.Long.compare(a, b.longValue()))
    case (a: String, b: String) => Some(a.compareTo(b))
    case _ => None
  }

  /** Conservative evaluation: true = the file MIGHT match (keep it). Only
    * provably-excluded files are dropped, so residual re-evaluation keeps
    * results exact regardless of coverage here.
    */
  private def mightMatch(f: PjFile, filter: Filter): Boolean = filter match {
    case EqualTo(c, v) => partValue(f, c).forall(x => x != null && cmp(x, v).forall(_ == 0))
    case EqualNullSafe(c, v) =>
      partValue(f, c).forall(x =>
        if (v == null) x == null else x != null && cmp(x, v).forall(_ == 0))
    case In(c, vs) => partValue(f, c).forall(x => x != null && vs.exists(v => cmp(x, v).forall(_ == 0)))
    case GreaterThan(c, v) => partValue(f, c).forall(x => x != null && cmp(x, v).forall(_ > 0))
    case GreaterThanOrEqual(c, v) => partValue(f, c).forall(x => x != null && cmp(x, v).forall(_ >= 0))
    case LessThan(c, v) => partValue(f, c).forall(x => x != null && cmp(x, v).forall(_ < 0))
    case LessThanOrEqual(c, v) => partValue(f, c).forall(x => x != null && cmp(x, v).forall(_ <= 0))
    case IsNull(c) => partValue(f, c).forall(_ == null)
    case IsNotNull(c) => partValue(f, c).forall(_ != null)
    case And(l, r) => mightMatch(f, l) && mightMatch(f, r)
    case Or(l, r) => mightMatch(f, l) || mightMatch(f, r)
    case Not(EqualTo(c, v)) => partValue(f, c).forall(x => x == null || cmp(x, v).forall(_ != 0))
    case _ => true
  }

  override def build(): Scan = {
    val explicitRgs: Option[Seq[Int]] = Option(options.get("rowGroups"))
      .map(_.split(",").iterator.map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq)
    if (explicitRgs.isDefined && layout.files.size > 1)
      throw new IllegalArgumentException(
        s"pjparquet: option 'rowGroups' requires a single input file, got ${layout.files.size}")
    if (countStarPushed) {
      // pushed.isEmpty is part of canPushCountStar, so no file was pruned
      // away and no residual filter exists: the index row counts ARE the
      // answer. Validation mirrors the splice's row-group bounds error.
      val total = layout.files.iterator.map { f =>
        val idx = PJSplice.Index.fromBytes(f.indexBytes)
        val rgCount = idx.header.rowGroups
        val selected = explicitRgs.getOrElse(0 until rgCount)
        selected.iterator.map { rg =>
          if (rg < 0 || rg >= rgCount)
            throw new graft.core.PJException(
              s"Requested row_group=$rg, but only 0-${rgCount - 1} are available!")
          idx.rowNumber(rg)
        }.sum
      }.sum
      return new PjCountStarScan(total, layout.files.size)
    }
    val survivingFiles =
      if (layout.partitionSchema.isEmpty) layout.files
      else layout.files.filter(f => pushed.forall(mightMatch(f, _)))
    // split the pruned schema into file-physical vs partition columns; the
    // scan emits data columns first, partition columns last (Spark reorders
    // above the scan as needed). Partition membership honors
    // `spark.sql.caseSensitive`; requested-case names are PRESERVED here
    // (Spark matches the scan's readSchema back to the relation's output by
    // exact name) — the scan folds to file case internally for the splice
    // and the parquet reader.
    val caseSensitive = SQLConf.get.caseSensitiveAnalysis
    val partNames =
      if (caseSensitive) layout.partitionSchema.fieldNames.toSet
      else layout.partitionSchema.fieldNames.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    def isPart(f: org.apache.spark.sql.types.StructField): Boolean =
      partNames.contains(
        if (caseSensitive) f.name else f.name.toLowerCase(java.util.Locale.ROOT))
    val dataRequired = StructType(requiredSchema.fields.filterNot(isPart))
    val partRequired = StructType(requiredSchema.fields.filter(isPart))
    new PjScan(
      survivingFiles, fileSchema, dataRequired,
      layout.partitionSchema, partRequired, explicitRgs, pushed.toSeq)
  }
}

/** Complete count(*) pushdown result: a driver-local one-row scan (Spark
  * plans it as `LocalTableScanExec` — no tasks, no file I/O). The row count
  * came from the PJ_2 index's `row_numbers` section alone.
  */
class PjCountStarScan(total: Long, fileCount: Int) extends LocalScan {
  override def readSchema(): StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField(
      "count(*)", org.apache.spark.sql.types.LongType, nullable = false)))
  override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] =
    Array(org.apache.spark.sql.catalyst.InternalRow(total))
  override def description(): String =
    s"pjparquet count(*)=$total from $fileCount index(es), no data read"
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
    fileSchema: StructType,
    dataRequired: StructType,
    partitionSchema: StructType,
    partRequired: StructType,
    explicitRowGroups: Option[Seq[Int]],
    pushedFilters: Seq[org.apache.spark.sql.sources.Filter] = Nil)
    extends Scan with Batch with SupportsReportStatistics {

  /** Data columns first, requested partition columns last — the order the
    * vectorized reader produces when partition values are appended via
    * `initBatch`; Spark projects above the scan to the query's order.
    * Names keep the REQUESTED case (Spark maps them back to the relation's
    * output attributes by exact name).
    */
  override def readSchema(): StructType = StructType(dataRequired.fields ++ partRequired.fields)

  override def toBatch: Batch = this

  override def description(): String =
    s"pjparquet ${files.size} file(s), cols=${readSchema().fieldNames.mkString(",")}" +
      explicitRowGroups.map(r => s", rowGroups=${r.mkString(",")}").getOrElse("") +
      (if (pushedFilters.nonEmpty) s", PushedFilters: [${pushedFilters.mkString(", ")}]" else "")

  /** `dataRequired` folded to the FILE schema's case (when the session is
    * case-insensitive): the names handed to the O5 splice and the parquet
    * reader, which both keep the reference's exact-match semantics. Batch
    * columns are consumed positionally, so the requested-case `readSchema`
    * and this physical schema only need to agree on ORDER.
    */
  private lazy val dataPhysical: StructType =
    if (SQLConf.get.caseSensitiveAnalysis) dataRequired
    else {
      val byLower = fileSchema.fields
        .map(f => f.name.toLowerCase(java.util.Locale.ROOT) -> f.name).toMap
      StructType(dataRequired.fields.map(f =>
        byLower.get(f.name.toLowerCase(java.util.Locale.ROOT))
          .map(n => f.copy(name = n)).getOrElse(f)))
    }

  // Column splice only when a strict subset of top-level fields is needed;
  // name-based selection follows reference O5 semantics (exact match).
  private def prunedColumnNames: Seq[String] = {
    val full = fileSchema.fieldNames.toSeq
    val req = dataPhysical.fieldNames.toSeq
    if (req == full || req.isEmpty) Nil else req
  }

  /** The requested partition values of `f`, aligned with `partRequired`
    * (case-insensitive name match when the session is). */
  private def requiredPartValues(f: PjFile): Array[String] = {
    val cs = SQLConf.get.caseSensitiveAnalysis
    def key(n: String) = if (cs) n else n.toLowerCase(java.util.Locale.ROOT)
    val byName = partitionSchema.fieldNames.map(key).zip(f.partitionValues).toMap
    partRequired.fieldNames.map(n => byName(key(n)))
  }

  private lazy val fileIndexes: Seq[PJSplice.Index] =
    files.map(f => PJSplice.Index.fromBytes(f.indexBytes))

  /** Exact compressed bytes each row group contributes for the REQUIRED
    * columns, per file — read once via bounded chunk-struct walks from the
    * index (no footer parse) and shared by split packing AND statistics.
    * -1 marks a file whose footer lacks the size field (callers fall back
    * to a proportional estimate). An empty data projection (count(*),
    * partition-only scans) reads no column data: 8 bytes/row stands in for
    * the row-existence stream so estimates stay small but nonzero.
    */
  private lazy val rgByteSums: Seq[Array[Long]] = fileIndexes.map { idx =>
    val rgCount = idx.header.rowGroups
    if (dataPhysical.isEmpty)
      Array.tabulate(rgCount)(rg => math.max(1L, idx.rowNumber(rg) * 8L))
    else {
      val req = prunedColumnNames
      val cols: Seq[Int] =
        if (req.isEmpty) 0 until idx.header.columns
        else {
          val pos = idx.columnNames.zipWithIndex.toMap // last-wins, like splice
          req.flatMap(pos.get)
        }
      Array.tabulate(rgCount) { rg =>
        var sum = 0L
        var exact = true
        for (c <- cols if exact) {
          val sz = idx.chunkCompressedSize(rg, c)
          if (sz < 0) exact = false else sum += sz
        }
        if (exact) math.max(1L, sum) else -1L
      }
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val sqlConf = SQLConf.get
    val maxPartitionBytes = sqlConf.filesMaxPartitionBytes
    val colNames = prunedColumnNames
    files.iterator.zipWithIndex.flatMap { case (f, fi) =>
      val idx = fileIndexes(fi)
      val rgCount = idx.header.rowGroups
      val selected = explicitRowGroups.getOrElse(0 until rgCount)
      if (selected.isEmpty) Iterator.empty
      else {
        // Bin-pack toward maxPartitionBytes using the EXACT compressed
        // bytes each row group contributes for the REQUIRED columns. A
        // whole-file mean misprices splits twice over: skewed row-group
        // sizes, and narrow projections that read a sliver of each group.
        val meanRgBytes = math.max(1L, f.fileLen / math.max(1, rgCount))
        val sums = rgByteSums(fi)
        def rgBytes(rg: Int): Long = if (sums(rg) < 0) meanRgBytes else sums(rg)
        val groups = scala.collection.mutable.ArrayBuffer[Vector[Int]]()
        var current = Vector.empty[Int]
        var currentBytes = 0L
        for (rg <- selected) {
          val b = rgBytes(rg)
          if (current.nonEmpty && currentBytes + b > maxPartitionBytes) {
            groups += current; current = Vector.empty; currentBytes = 0L
          }
          current = current :+ rg
          currentBytes += b
        }
        if (current.nonEmpty) groups += current
        val partValues = requiredPartValues(f)
        groups.iterator.map { rgs =>
          val footer = PJSplice.splice(idx, rgs, Nil, colNames, schemaOnly = false)
          PjInputPartition(f.path, f.fileLen, rgs.toArray, footer, partValues)
        }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    val sqlConf = spark.sessionState.conf
    val hadoopConf = spark.sessionState.newHadoopConf()
    PjSparkShims.configureReadConf(hadoopConf, dataPhysical, sqlConf)
    // files can be empty when partition pruning excluded every file — an
    // empty scan needs no parquet predicate (and has no index to splice).
    if (files.nonEmpty && pushedFilters.nonEmpty &&
        PjSparkShims.parquetFilterPushDownEnabled(sqlConf)) {
      // Schema + rebase spec come from the index (schema-only splice), so
      // building the predicate costs no footer parse. Partition-column
      // filters have no physical column and simply produce no predicate.
      val schemaFooter = graft.core.PalletJack.materialize(
        graft.core.PJSplice.splice(
          graft.core.PJSplice.Index.fromBytes(files.head.indexBytes), Nil, Nil, Nil, schemaOnly = true))
      val physSchema = schemaFooter.getFileMetaData.getSchema
      val rebaseSpec = PjSparkShims.datetimeRebaseSpec(
        schemaFooter, PjSparkShims.rebaseModeInReadConf(sqlConf))
      PjSparkShims.buildFilterPredicate(physSchema, pushedFilters, sqlConf, rebaseSpec)
        .foreach(p => PjSparkShims.setFilterPredicate(hadoopConf, p))
    }
    val broadcast: Broadcast[SerializableConfiguration] =
      spark.sparkContext.broadcast(new SerializableConfiguration(hadoopConf))
    PjPartitionReaderFactory(
      broadcast,
      dataPhysical.json,
      partRequired.json,
      sqlConf.parquetVectorizedReaderBatchSize,
      sqlConf.offHeapColumnVectorEnabled,
      PjSparkShims.rebaseModeInReadConf(sqlConf),
      PjSparkShims.int96RebaseModeInReadConf(sqlConf))
  }

  /** Planning-time stats straight from the index — no footer parse.
    * `sizeInBytes` is the EXACT sum of `total_compressed_size` over the
    * selected row groups × required columns (each read via a bounded walk
    * of the one chunk struct the index points at), so AQE's broadcast and
    * join-strategy decisions see what the scan will actually read — a
    * `fileLen × colFraction` guess misprices wide tables with skewed
    * column widths. Falls back to the proportional estimate per file if a
    * footer lacks the field.
    */
  override def estimateStatistics(): Statistics = {
    var rows = 0L
    var bytes = 0L
    for ((f, fi) <- files.zipWithIndex) {
      val idx = fileIndexes(fi)
      val rgCount = idx.header.rowGroups
      val selected = explicitRowGroups.getOrElse(0 until rgCount)
      selected.foreach(rg => rows += idx.rowNumber(rg))
      val sums = rgByteSums(fi)
      val exact = selected.forall(rg => sums(rg) >= 0)
      bytes += {
        if (exact) selected.map(sums(_)).sum
        else {
          val colFraction =
            if (fileSchema.isEmpty) 1.0
            else math.max(1, dataRequired.size).toDouble / fileSchema.size
          (f.fileLen * colFraction * selected.size / math.max(1, rgCount)).toLong
        }
      }
    }
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
      override def numRows(): OptionalLong = OptionalLong.of(rows)
    }
  }
}

/** Self-contained split: executors need nothing but these fields.
  * `partitionValues` align with the scan's required partition schema (raw
  * path strings; typed at batch init).
  */
final case class PjInputPartition(
    filePath: String,
    fileLen: Long,
    rowGroups: Array[Int],
    prunedFooter: Array[Byte],
    partitionValues: Array[String] = Array.empty)
    extends InputPartition
