package graft.sources.pjparquet

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.PJException

/** SQL stored procedures for table maintenance — the `CALL` surface
  * (Spark 4's `ProcedureCatalog` protocol, the same shape Iceberg ships):
  *
  * {{{
  *   CALL pj.system.vacuum(table => '/data/events')
  *   CALL pj.system.expire_versions('/data/events', 10)
  *   CALL pj.system.expire_older_than('/data/events', 604800000)
  *   CALL pj.system.compact('/data/events')
  *   CALL pj.system.optimize_zorder('/data/events', 'x,y')
  *   CALL pj.system.build_index('/data/events')
  *   CALL pj.system.build_blooms('/data/events', 'user_id')
  *   CALL pj.system.checkpoint('/data/events')
  *   CALL pj.system.history('/data/events')
  *   CALL pj.system.restore('/data/events', 7)
  *   CALL pj.system.clone(source => '/data/events', target => '/tmp/fork')
  *   CALL pj.system.materialize(table => '/tmp/fork')
  *   CALL pj.system.analyze(table => '/data/events')
  *   CALL pj.system.expire_versions('/data/events', 10, dry_run => true)
  * }}}
  *
  * Each procedure wraps the corresponding driver API ([[PjVacuum]],
  * [[PjCompaction]], [[PjIndexJob]], [[PjBloomJob]], [[PjCommitLog]]) and
  * returns its report as rows, so maintenance is scriptable from pure SQL
  * — no Scala entry point needed on a production cluster. The identifier
  * is the table ROOT PATH, exactly like the catalog's tables.
  */
object PjProcedures {

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  private def result(schema: StructType, out: Seq[InternalRow]): JIterator[Scan] = {
    val outArr = out.toArray
    val scan: Scan = new LocalScan {
      override def rows(): Array[InternalRow] = outArr
      override def readSchema(): StructType = schema
      override def description(): String = "pjparquet procedure result"
    }
    Collections.singletonList(scan).iterator()
  }

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def inD(name: String, dt: DataType, dflt: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(dflt).build()

  /** A procedure both unbound and bound (no overloading to resolve). */
  private final class Proc(
      procName: String,
      ps: Array[ProcedureParameter],
      outSchema: StructType,
      body: InternalRow => Seq[InternalRow])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = s"pjparquet maintenance procedure $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = ps
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): JIterator[Scan] =
      result(outSchema, body(input))
  }

  private def spark: SparkSession = SparkSession.active

  private def tableArg(input: InternalRow): String = {
    val s = input.getUTF8String(0)
    if (s == null) throw new PJException("pjparquet: procedure 'table' argument is null")
    s.toString
  }

  val Names: Seq[String] = Seq(
    "vacuum", "expire_versions", "expire_older_than", "compact",
    "optimize_zorder", "build_index", "build_blooms", "checkpoint", "history",
    "purge_deletion_vectors", "detail", "dedup", "restore", "clone", "analyze",
    "materialize", "verify_log", "set_not_null", "copy_into", "convert",
    "generate_symlink_manifest", "restore_to_timestamp", "drop_feature",
    "generate_iceberg_metadata", "tag", "drop_ref", "fast_forward", "refs")

  def load(catalogName: String, ident: Identifier): UnboundProcedure = {
    val ok = ident.namespace().isEmpty || ident.namespace().sameElements(Array("system"))
    if (!ok)
      throw new PJException(
        s"$catalogName: unknown procedure namespace " +
          s"${ident.namespace().mkString(".")} (use $catalogName.system.<proc>)")
    ident.name() match {
      case "vacuum" =>
        new Proc("vacuum", Array(in("table", StringType)),
          StructType(Seq(
            StructField("orphan_sidecars", LongType, nullable = false),
            StructField("work_dirs", LongType, nullable = false))),
          { input =>
            val r = PjVacuum.clean(spark, tableArg(input))
            Seq(new GenericInternalRow(Array[Any](r.orphanSidecars, r.workDirs)))
          })
      case "expire_versions" =>
        // keep_versions omitted (-1) falls back to the table's recorded
        // pj.expire.keepVersions property — retention as a TABLE contract
        new Proc("expire_versions",
          Array(in("table", StringType), inD("keep_versions", IntegerType, "-1"),
            inD("min_file_age_ms", LongType, "0"),
            inD("dry_run", BooleanType, "false")),
          expireSchema,
          { input =>
            val table = tableArg(input)
            val keep =
              if (input.getInt(1) > 0) input.getInt(1)
              else recordedProp(table, PjTableProperties.ExpireKeepVersions)
                .map(_.toInt).getOrElse(throw new PJException(
                  "pjparquet: expire_versions needs keep_versions (no recorded " +
                    s"${PjTableProperties.ExpireKeepVersions} property on '$table')"))
            val r = PjVacuum.expireVersions(spark, table, keep, input.getLong(2),
              dryRun = input.getBoolean(3))
            Seq(expireRow(r))
          })
      case "expire_older_than" =>
        // retention_ms omitted (-1) falls back to the table's recorded
        // pj.vacuum.retentionHours property
        new Proc("expire_older_than",
          Array(in("table", StringType), inD("retention_ms", LongType, "-1"),
            inD("min_file_age_ms", LongType, "0"),
            inD("dry_run", BooleanType, "false")),
          expireSchema,
          { input =>
            val table = tableArg(input)
            val retention =
              if (input.getLong(1) >= 0) input.getLong(1)
              else recordedProp(table, PjTableProperties.VacuumRetentionHours)
                .map(_.toLong * 3600L * 1000L).getOrElse(throw new PJException(
                  "pjparquet: expire_older_than needs retention_ms (no recorded " +
                    s"${PjTableProperties.VacuumRetentionHours} property on '$table')"))
            val r = PjVacuum.expireOlderThan(spark, table, retention, input.getLong(2),
              dryRun = input.getBoolean(3))
            Seq(expireRow(r))
          })
      case "compact" =>
        new Proc("compact",
          Array(in("table", StringType),
            inD("target_bytes", LongType, (128L * 1024 * 1024).toString),
            inD("where", StringType, "''")),
          compactSchema,
          { input =>
            val where = Option(input.getUTF8String(2)).map(_.toString).filter(_.nonEmpty)
            val r = PjCompaction.compact(spark, tableArg(input), input.getLong(1),
              where = where)
            Seq(compactRow(r))
          })
      case "optimize_zorder" =>
        // `columns`/`curve` omitted fall back to the table's DECLARED
        // clustering key (pj.cluster.columns / pj.cluster.curve — Delta's
        // CLUSTER BY): the layout contract lives in the table, scheduled
        // maintenance is just CALL optimize_zorder('/t')
        new Proc("optimize_zorder",
          Array(in("table", StringType), inD("columns", StringType, "''"),
            inD("target_bytes", LongType, (128L * 1024 * 1024).toString),
            inD("where", StringType, "''"),
            inD("curve", StringType, "''"),
            inD("full", BooleanType, "false")),
          compactSchema,
          { input =>
            val table = tableArg(input)
            val explicit = Option(input.getUTF8String(1)).map(_.toString)
              .getOrElse("").split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq
            val cols =
              if (explicit.nonEmpty) explicit
              else recordedProp(table, PjTableProperties.ClusterColumns)
                .toSeq.flatMap(_.split(",").iterator.map(_.trim).filter(_.nonEmpty))
            if (cols.isEmpty) throw new PJException(
              "pjparquet: optimize_zorder needs clustering columns — pass " +
                s"'columns', or declare them once via the " +
                s"${PjTableProperties.ClusterColumns} table property")
            val where = Option(input.getUTF8String(3)).map(_.toString).filter(_.nonEmpty)
            val curve = Option(input.getUTF8String(4)).map(_.toString)
              .filter(_.nonEmpty)
              .orElse(recordedProp(table, PjTableProperties.ClusterCurve)
                .map(_.toLowerCase(java.util.Locale.ROOT)))
              .getOrElse("zorder")
            val r = PjCompaction.optimize(spark, table, cols, input.getLong(2),
              where = where, curve = curve, force = input.getBoolean(5))
            Seq(compactRow(r))
          })
      case "restore_to_timestamp" =>
        // RESTORE TABLE TO TIMESTAMP AS OF: resolve the version by the
        // in-commit timestamps (the same newest-first header scan SQL
        // time travel uses), then the ordinary restore commit
        new Proc("restore_to_timestamp",
          Array(in("table", StringType), in("timestamp", StringType)),
          StructType(Seq(
            StructField("restored_to", LongType, nullable = false),
            StructField("committed_version", LongType, nullable = true),
            StructField("files_added", LongType, nullable = false),
            StructField("files_removed", LongType, nullable = false))),
          { input =>
            val table = tableArg(input)
            val tsMillis = PjParquetTable.parseTimestampMillis(
              input.getUTF8String(1).toString, "timestamp")
            val root = new org.apache.hadoop.fs.Path(table)
            val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
            val v = PjCommitLog.versionAtTimestamp(fs, root, tsMillis)
            val r = PjRestore.restore(spark, table, v)
            Seq(new GenericInternalRow(Array[Any](
              r.restoredTo, r.committed.map(java.lang.Long.valueOf).orNull,
              r.filesAdded, r.filesRemoved)))
          })
      case "drop_feature" =>
        // ALTER TABLE ... DROP FEATURE (protocol downgrade,
        // [[PjProtocol.dropFeature]]): preconditioned on the feature being
        // unused at HEAD; older builds regain access after the drop
        new Proc("drop_feature",
          Array(in("table", StringType), in("feature", StringType)),
          StructType(Seq(
            StructField("dropped", StringType, nullable = false),
            StructField("committed_version", LongType, nullable = false),
            StructField("protocol", StringType, nullable = false))),
          { input =>
            val table = tableArg(input)
            val feature = input.getUTF8String(1).toString
            val v = PjProtocol.dropFeature(spark, table, feature)
            val root = new org.apache.hadoop.fs.Path(table)
            val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
            val p = PjProtocol.parse(
              PjCommitLog.latest(fs, root).flatMap(_.protocolJson)).json
            Seq(new GenericInternalRow(Array[Any](
              org.apache.spark.unsafe.types.UTF8String.fromString(feature), v,
              org.apache.spark.unsafe.types.UTF8String.fromString(p))))
          })
      case "purge_deletion_vectors" =>
        // Delta's REORG APPLY (PURGE): rewrite ONLY the files carrying
        // deletion vectors (dropping the deleted rows), leaving every
        // vector-free file byte-identical. smallThreshold=1 makes no file
        // "small", so compact's consumption set is exactly the
        // vector-carriers it force-includes.
        new Proc("purge_deletion_vectors",
          Array(in("table", StringType),
            inD("target_bytes", LongType, (128L * 1024 * 1024).toString)),
          compactSchema,
          { input =>
            val r = PjCompaction.compact(spark, tableArg(input), input.getLong(1),
              smallThreshold = 1L)
            Seq(compactRow(r))
          })
      case "build_index" =>
        new Proc("build_index",
          Array(in("table", StringType), inD("overwrite", BooleanType, "false")),
          StructType(Seq(StructField("indexes_written", LongType, nullable = false))),
          { input =>
            val n = PjIndexJob.generateAll(spark, tableArg(input), input.getBoolean(1))
            Seq(new GenericInternalRow(Array[Any](n)))
          })
      case "build_blooms" =>
        new Proc("build_blooms",
          Array(in("table", StringType), in("columns", StringType),
            inD("fpp", DoubleType, "0.01")),
          StructType(Seq(StructField("blooms_written", LongType, nullable = false))),
          { input =>
            val cols = input.getUTF8String(1).toString
              .split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq
            val n = PjBloomJob.generate(spark, tableArg(input), cols, input.getDouble(2))
            Seq(new GenericInternalRow(Array[Any](n)))
          })
      case "checkpoint" =>
        new Proc("checkpoint", Array(in("table", StringType)),
          StructType(Seq(StructField("version", LongType, nullable = false))),
          { input =>
            val root = new org.apache.hadoop.fs.Path(tableArg(input))
            val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
            val head = PjCommitLog.latest(fs, root).getOrElse(
              throw new PJException(
                s"pjparquet: '$root' has no commit log to checkpoint"))
            PjCommitLog.writeCheckpoint(fs, root, head.version)
            Seq(new GenericInternalRow(Array[Any](head.version)))
          })
      case "dedup" =>
        // in-place key-level dedup via deletion vectors (one rep per key,
        // smallest (_file,_pos) wins, zero rewrites) — the SQL face of
        // PipelineOps.dedupInPlace
        new Proc("dedup",
          Array(in("table", StringType), in("keys", StringType)),
          StructType(Seq(
            StructField("version", LongType, nullable = true),
            StructField("duplicates_removed", LongType, nullable = false))),
          { input =>
            val keys = input.getUTF8String(1).toString
              .split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq
            val (v, removed) =
              graft.operators.PipelineOps.dedupInPlace(spark, tableArg(input), keys)
            Seq(new GenericInternalRow(Array[Any](
              v.map(java.lang.Long.valueOf).orNull, removed)))
          })
      case "restore" =>
        // RESTORE TABLE TO VERSION AS OF: one metadata commit turns HEAD
        // into the target snapshot (DVs and schema included); history and
        // time travel to intermediate versions stay intact — PjRestore
        new Proc("restore",
          Array(in("table", StringType), in("version", LongType)),
          StructType(Seq(
            StructField("restored_to", LongType, nullable = false),
            StructField("committed_version", LongType, nullable = true),
            StructField("files_added", LongType, nullable = false),
            StructField("files_removed", LongType, nullable = false))),
          { input =>
            val r = PjRestore.restore(spark, tableArg(input), input.getLong(1))
            Seq(new GenericInternalRow(Array[Any](
              r.restoredTo, r.committed.map(java.lang.Long.valueOf).orNull,
              r.filesAdded, r.filesRemoved)))
          })
      case "clone" =>
        // SHALLOW CLONE: zero-copy fork — one metadata commit in the new
        // table referencing the source snapshot's files absolutely
        new Proc("clone",
          Array(in("source", StringType), in("target", StringType),
            inD("version", LongType, "-1")),
          StructType(Seq(
            StructField("target_version", LongType, nullable = false),
            StructField("files", LongType, nullable = false),
            StructField("bytes", LongType, nullable = false),
            StructField("source_version", LongType, nullable = false))),
          { input =>
            val tgt = input.getUTF8String(1)
            if (tgt == null)
              throw new PJException("pjparquet: procedure 'target' argument is null")
            val r = PjClone.shallowClone(
              spark, tableArg(input), tgt.toString, input.getLong(2))
            Seq(new GenericInternalRow(Array[Any](
              r.targetVersion, r.files, r.bytes, r.sourceVersion)))
          })
      case "materialize" =>
        // deep-copy half of SHALLOW CLONE: rewrite clone-external entries
        // into table-local files so the source can be dropped safely
        new Proc("materialize",
          Array(in("table", StringType),
            inD("target_bytes", LongType, (128L * 1024 * 1024).toString)),
          StructType(Seq(
            StructField("files_materialized", LongType, nullable = false),
            StructField("bytes_copied", LongType, nullable = false),
            StructField("new_files", LongType, nullable = false),
            StructField("version", LongType, nullable = false))),
          { input =>
            val r = PjClone.materialize(spark, tableArg(input), input.getLong(1))
            Seq(new GenericInternalRow(Array[Any](
              r.filesMaterialized, r.bytesCopied, r.newFiles, r.version)))
          })
      case "analyze" =>
        // ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS: one scan,
        // stats recorded in the log, served to Spark's CBO by every scan
        new Proc("analyze",
          Array(in("table", StringType), inD("columns", StringType, "''")),
          StructType(Seq(
            StructField("column", StringType, nullable = false),
            StructField("ndv", LongType, nullable = false),
            StructField("null_count", LongType, nullable = false),
            StructField("avg_len", LongType, nullable = false),
            StructField("max_len", LongType, nullable = false),
            StructField("min", StringType, nullable = true),
            StructField("max", StringType, nullable = true),
            StructField("table_rows", LongType, nullable = false))),
          { input =>
            val colsArg = Option(input.getUTF8String(1)).map(_.toString).getOrElse("")
            val cols = colsArg.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            val ts = PjAnalyze.analyze(spark, tableArg(input), cols)
            ts.cols.toSeq.sortBy(_._1).map { case (name, c) =>
              new GenericInternalRow(Array[Any](
                utf8(name), c.ndv, c.nulls, c.avgLen, c.maxLen,
                c.min.map(utf8).orNull, c.max.map(utf8).orNull, ts.rows))
            }
          })
      case "detail" =>
        // Delta's DESCRIBE DETAIL shape: one row of head-snapshot facts,
        // entirely from the commit log (zero file opens)
        new Proc("detail", Array(in("table", StringType)),
          StructType(Seq(
            StructField("version", LongType, nullable = false),
            StructField("ts", TimestampType, nullable = false),
            StructField("n_files", LongType, nullable = false),
            StructField("total_bytes", LongType, nullable = false),
            StructField("total_rows", LongType, nullable = false),
            StructField("live_rows", LongType, nullable = false),
            StructField("files_with_deletion_vectors", LongType, nullable = false),
            StructField("deleted_rows", LongType, nullable = false),
            StructField("schema_json", StringType, nullable = true),
            // row tracking: files whose every row has a stable id, and
            // the id watermark (null before the first tracked commit)
            StructField("row_tracked_files", LongType, nullable = false),
            StructField("row_id_watermark", LongType, nullable = true),
            // required table features ([[PjProtocol]] JSON); null on a
            // pre-protocol table — the upgrade story is visible from SQL.
            // KEPT LAST: callers read it positionally from the tail.
            StructField("protocol", StringType, nullable = true))),
          { input =>
            val root = new org.apache.hadoop.fs.Path(tableArg(input))
            val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
            val s = PjCommitLog.latest(fs, root).getOrElse(
              throw new PJException(
                s"pjparquet: '$root' has no commit log (detail applies to logged tables)"))
            val rows = s.entries.iterator.map(e => math.max(0L, e.rows)).sum
            val live = s.entries.iterator.map(e => math.max(0L, e.liveRows)).sum
            Seq(new GenericInternalRow(Array[Any](
              s.version, s.ts * 1000L, s.entries.size.toLong,
              s.entries.iterator.map(e => math.max(0L, e.size)).sum,
              rows, live,
              s.entries.count(_.dv.isDefined).toLong,
              rows - live,
              s.dataSchemaJson.map(utf8).orNull,
              s.entries.count(_.rowTracked).toLong,
              s.rowWatermark.map(w => java.lang.Long.valueOf(w.toLong)).orNull,
              s.protocolJson.map(utf8).orNull)))
          })
      case "verify_log" =>
        new Proc("verify_log", Array(in("table", StringType)),
          StructType(Seq(
            StructField("version", LongType, nullable = false),
            StructField("file", StringType, nullable = false),
            StructField("sealed", BooleanType, nullable = false),
            StructField("status", StringType, nullable = false))),
          { input =>
            val root = new org.apache.hadoop.fs.Path(tableArg(input))
            val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
            PjCommitLog.auditLog(fs, root).map(a =>
              new GenericInternalRow(Array[Any](
                a.version, utf8(a.file), a.isSealed, utf8(a.status))))
          })
      case "copy_into" =>
        // idempotent file ingest ([[PjCopyInto]]): each source file's rows
        // land exactly once across re-runs; racing ingesters partition the
        // work via atomic per-file claims
        new Proc("copy_into",
          Array(in("table", StringType), in("source", StringType),
            inD("format", StringType, "'parquet'"),
            inD("reclaim_claims", BooleanType, "false"),
            inD("pattern", StringType, "''")),
          StructType(Seq(
            StructField("files_ingested", LongType, nullable = false),
            StructField("files_skipped", LongType, nullable = false),
            StructField("files_pending", LongType, nullable = false),
            StructField("rows_ingested", LongType, nullable = false),
            StructField("version", LongType, nullable = false))),
          { input =>
            val r = PjCopyInto.copyInto(spark, tableArg(input),
              input.getUTF8String(1).toString,
              input.getUTF8String(2).toString, input.getBoolean(3),
              pattern = Option(input.getUTF8String(4)).map(_.toString)
                .filter(_.nonEmpty))
            Seq(new GenericInternalRow(Array[Any](
              r.filesIngested, r.filesSkipped, r.filesPending,
              r.rowsIngested, r.version)))
          })
      case "convert" =>
        // in-place adoption of a plain parquet directory (Delta's CONVERT
        // TO DELTA): no data rewrite — distributed listing + index fleet,
        // then ONE exclusive commit carrying every file entry
        new Proc("convert",
          Array(in("table", StringType),
            inD("partition_columns", StringType, "''")),
          StructType(Seq(
            StructField("version", LongType, nullable = false),
            StructField("files_converted", LongType, nullable = false),
            StructField("rows", LongType, nullable = false),
            StructField("bytes", LongType, nullable = false),
            StructField("partition_columns", StringType, nullable = false))),
          { input =>
            val r = PjConvert.convert(spark, tableArg(input),
              Option(input.getUTF8String(1)).map(_.toString).filter(_.nonEmpty))
            Seq(new GenericInternalRow(Array[Any](
              r.version, r.files, r.rows, r.bytes, utf8(r.partitionColumns))))
          })
      case "tag" =>
        // pin a snapshot version under a name ([[PjRefs]]): tag reads are
        // bit-exact time travel and expiry keeps tagged versions
        new Proc("tag",
          Array(in("table", StringType), in("name", StringType),
            inD("version", LongType, "-1")),
          StructType(Seq(StructField("version", LongType, nullable = false))),
          { input =>
            val root = new org.apache.hadoop.fs.Path(tableArg(input))
            val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
            val v = PjRefs.tag(fs, root, input.getUTF8String(1).toString,
              Some(input.getLong(2)).filter(_ >= 0))
            Seq(new GenericInternalRow(Array[Any](v)))
          })
      case "drop_ref" =>
        new Proc("drop_ref",
          Array(in("table", StringType), in("name", StringType)),
          StructType(Seq(StructField("dropped", BooleanType, nullable = false))),
          { input =>
            val root = new org.apache.hadoop.fs.Path(tableArg(input))
            val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
            val d = PjRefs.dropRef(fs, root, input.getUTF8String(1).toString)
            PjParquetTable.clearLayoutCache()
            Seq(new GenericInternalRow(Array[Any](d)))
          })
      case "fast_forward" =>
        // publish a staged branch as a live head commit (write-audit-
        // publish's publish step) and drop the ref
        new Proc("fast_forward",
          Array(in("table", StringType), in("branch", StringType)),
          StructType(Seq(StructField("version", LongType, nullable = false))),
          { input =>
            val root = new org.apache.hadoop.fs.Path(tableArg(input))
            val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
            val v = PjRefs.fastForward(fs, root, input.getUTF8String(1).toString)
            Seq(new GenericInternalRow(Array[Any](v)))
          })
      case "refs" =>
        new Proc("refs", Array(in("table", StringType)),
          StructType(Seq(
            StructField("name", StringType, nullable = false),
            StructField("type", StringType, nullable = false),
            StructField("version", LongType, nullable = false))),
          { input =>
            val root = new org.apache.hadoop.fs.Path(tableArg(input))
            val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
            PjRefs.listRefs(fs, root).map { case (n, t, v) =>
              new GenericInternalRow(Array[Any](utf8(n), utf8(t), v))
            }
          })
      case "generate_iceberg_metadata" =>
        // UniForm-style export: Iceberg v2 metadata.json + avro manifests
        // for the head snapshot, so Iceberg-native readers plan the exact
        // snapshot (HadoopCatalog convention, metadata/version-hint.text)
        new Proc("generate_iceberg_metadata", Array(in("table", StringType)),
          StructType(Seq(
            StructField("version", LongType, nullable = false),
            StructField("snapshot_id", LongType, nullable = false),
            StructField("data_files", LongType, nullable = false),
            StructField("metadata_file", StringType, nullable = false))),
          { input =>
            val r = PjIcebergMetadata.generate(spark, tableArg(input))
            Seq(new GenericInternalRow(Array[Any](
              r.version, r.snapshotId, r.dataFiles, utf8(r.metadataFile))))
          })
      case "generate_symlink_manifest" =>
        // Delta's GENERATE symlink_format_manifest: external engines read
        // the snapshot's exact file list instead of the directory
        new Proc("generate_symlink_manifest", Array(in("table", StringType)),
          StructType(Seq(
            StructField("version", LongType, nullable = false),
            StructField("data_files", LongType, nullable = false),
            StructField("manifests", LongType, nullable = false))),
          { input =>
            val r = PjManifest.generate(spark, tableArg(input))
            Seq(new GenericInternalRow(Array[Any](r.version, r.dataFiles, r.manifests)))
          })
      case "set_not_null" =>
        // ALTER COLUMN ... SET NOT NULL, the procedure face: Spark's own
        // analyzer refuses nullable->non-nullable AlterColumns outright
        // (only forked analyzers allow the SQL form), so the validating
        // tighten ships as a CALL. The proof probe is `WHERE col IS NULL
        // LIMIT 1` through the table's OWN reader — deletion vectors
        // masked, pre-add files existence-default- or null-filled — and
        // it self-prunes at metadata rate via [[PjStatsFilter]] (files
        // whose stats envelope proves null_count == 0 are never opened).
        new Proc("set_not_null",
          Array(in("table", StringType), in("column", StringType)),
          StructType(Seq(
            StructField("column", StringType, nullable = false),
            StructField("changed", BooleanType, nullable = false))),
          { input =>
            val path = tableArg(input)
            val colName = input.getUTF8String(1).toString
            val root = new org.apache.hadoop.fs.Path(path)
            val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
            // probe-and-commit retries as ONE serialized unit: the commit
            // is EXCLUSIVE against the probed snapshot, so a concurrent
            // append inserting NULLs between the probe and the tighten
            // conflicts — and this loop simply re-probes the new state
            // instead of surfacing the race to the caller
            var changed = false
            var committed = false
            var attempt = 0
            while (!committed) {
            attempt += 1
            val snap = PjCommitLog.latest(fs, root).getOrElse(throw new PJException(
              s"pjparquet: '$path' has no commit log"))
            val cur = snap.dataSchemaJson.map(j =>
              org.apache.spark.sql.types.DataType.fromJson(j)
                .asInstanceOf[org.apache.spark.sql.types.StructType])
              .getOrElse(throw new PJException(
                s"pjparquet: '$path' has no recorded data schema (legacy log)"))
            val i = cur.fieldNames.indexWhere(_.equalsIgnoreCase(colName))
            if (i < 0) throw new PJException(
              s"pjparquet: no data column '$colName' in '$path'")
            changed = cur.fields(i).nullable
            committed = true
            if (changed) {
              // a live file that physically LACKS the column (pre-ADD
              // generations) serves the existence default / null at read
              // time — but the vectorized reader's required-column check
              // refuses a missing NON-nullable column, so committing the
              // tighten would break every read of those files. Refuse
              // until they are rewritten (compaction materializes the
              // current schema).
              val phys = PjColumnMapping.physicalName(cur.fields(i))
              val lacking = snap.entries.filter(_.cols match {
                case Some(cs) => !cs.exists(_.equalsIgnoreCase(phys))
                case None => true // legacy entry: cannot prove presence
              })
              if (lacking.nonEmpty) throw new PJException(
                s"pjparquet: set_not_null($colName): ${lacking.size} live " +
                  s"file(s) physically lack the column (e.g. " +
                  s"'${lacking.head.path}'); rewrite them first " +
                  "(CALL pj.system.compact) and retry")
              val quoted = "`" + cur.fields(i).name.replace("`", "``") + "`"
              val witness = spark.read.format("pjparquet").load(path)
                .where(s"$quoted IS NULL").take(1)
              if (witness.nonEmpty) throw new PJException(
                s"pjparquet: set_not_null($colName): existing rows in '$path' " +
                  s"hold NULLs; remove them first (DELETE FROM ... WHERE " +
                  s"$colName IS NULL) and retry")
              val next = org.apache.spark.sql.types.StructType(
                cur.fields.updated(i, cur.fields(i).copy(nullable = false)))
              try PjCommitLog.commit(fs, root, "alter-schema", Nil, Set.empty,
                Some(next.json), Some("alter"),
                readVersion = Some(snap.version), exclusive = true)
              catch {
                case e: PJException
                    if e.getMessage.contains("version conflict") && attempt < 10 =>
                  committed = false // a writer raced the probe: re-probe
              }
            }
            } // retry loop
            Seq(new GenericInternalRow(Array[Any](utf8(colName), changed)))
          })
      case "history" =>
        new Proc("history", Array(in("table", StringType)),
          StructType(Seq(
            StructField("version", LongType, nullable = false),
            StructField("ts", TimestampType, nullable = false),
            StructField("action", StringType, nullable = false),
            StructField("n_files", LongType, nullable = false))),
          { input =>
            val root = new org.apache.hadoop.fs.Path(tableArg(input))
            val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
            PjCommitLog.history(fs, root).map(h =>
              new GenericInternalRow(Array[Any](
                h.version, h.ts * 1000L, utf8(h.action), h.nFiles)))
          })
      case other =>
        throw new PJException(
          s"$catalogName: unknown procedure '$other' " +
            s"(available: ${Names.mkString(", ")})")
    }
  }

  /** Recorded table property of a logged table (procedure-arg fallback). */
  private def recordedProp(table: String, key: String): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(table)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    PjCommitLog.latest(fs, root).flatMap(s =>
      PjTableProperties.recorded(s.propertiesJson, key))
  }

  private val expireSchema = StructType(Seq(
    StructField("versions_dropped", LongType, nullable = false),
    StructField("versions_kept", LongType, nullable = false),
    StructField("files_reclaimed", LongType, nullable = false)))
  private def expireRow(r: PjVacuum.ExpireReport): InternalRow =
    new GenericInternalRow(Array[Any](r.versionsDropped, r.versionsKept, r.filesReclaimed))

  private val compactSchema = StructType(Seq(
    StructField("files_before", LongType, nullable = false),
    StructField("small_files", LongType, nullable = false),
    StructField("compacted_into", LongType, nullable = false),
    StructField("files_after", LongType, nullable = false),
    StructField("bytes_small", LongType, nullable = false),
    StructField("dirs_touched", LongType, nullable = false)))
  private def compactRow(r: PjCompaction.Report): InternalRow =
    new GenericInternalRow(Array[Any](
      r.filesBefore, r.smallFiles, r.compactedInto, r.filesAfter,
      r.bytesSmall, r.dirsTouched))
}
