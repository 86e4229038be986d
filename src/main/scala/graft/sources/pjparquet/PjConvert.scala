package graft.sources.pjparquet

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, IntegerType, LongType, StructField, StructType}

import graft.core.PJException

/** In-place adoption of an existing plain-parquet directory into a
  * pjparquet commit-log table — Delta's `CONVERT TO DELTA`, the operation
  * that matters most at 100 TB: petabytes of historical parquet gain ACID
  * commits, snapshot isolation, DML, time travel, and zero-footer-I/O
  * planning WITHOUT rewriting a byte of data.
  *
  * What it does, all metadata-rate:
  *   1. lists the tree (executor-parallel BFS waves above the
  *      [[PjVacuum.ParallelListMinDirs]] frontier — millions of objects
  *      list in O(depth) driver round-trips, [[PjVacuum.bfsList]]);
  *   2. runs the [[PjIndexJob]] fleet over every data file — one executor
  *      task per file parses the footer ONCE, writes the `.index` sidecar,
  *      and returns the commit-log facts (rows, row groups, fingerprint,
  *      per-column stats envelope, file schema);
  *   3. merges the per-file schemas additively (same widening lanes as the
  *      reader's `mergeSchema`, [[PjParquetTable.fileSchema]] — INT→LONG,
  *      FLOAT→DOUBLE; a real type conflict fails the convert loudly before
  *      anything is committed);
  *   4. commits version 1 (`action=convert`) carrying every file entry +
  *      the merged schema. The commit is EXCLUSIVE against version 0: two
  *      racing converts (or a convert racing a first write) — exactly one
  *      wins, the loser fails loudly and re-reads table state.
  *
  * Hive `key=value` partition directories come along for free: entries
  * record relative paths, and snapshot resolution derives partition values
  * from them exactly as the directory walk would
  * ([[PjParquetDataSource.resolveFromLog]]). A declared partition spec
  * (`name:bigint,...`) may be passed to pin TYPES over inference — recorded
  * as [[PjTableProperties.PartitionColumns]] like CREATE TABLE does.
  *
  * Reference: the reference engine has no table format — this is north-star
  * surface; semantics mirror Delta's CONVERT TO DELTA (public docs).
  */
object PjConvert {

  final case class Report(
      version: Long, files: Long, rows: Long, bytes: Long, partitionColumns: String)

  def convert(
      spark: SparkSession,
      root: String,
      partitionSpec: Option[String] = None): Report = {
    val hconf = spark.sessionState.newHadoopConf()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(hconf)
    if (!fs.exists(rootPath))
      throw new PJException(s"pjparquet convert: '$root' does not exist")
    if (PjCommitLog.isEnabled(fs, rootPath))
      throw new PJException(
        s"pjparquet convert: '$root' is already a pjparquet commit-log table " +
          "— nothing to convert")
    // declared partition types validate BEFORE any work
    partitionSpec.foreach { v =>
      PjTableProperties.validate(PjTableProperties.PartitionColumns, v)
    }

    // 1. distributed listing; internal/hidden paths never become entries
    val (listed, _) = PjVacuum.bfsList(spark, hconf, rootPath)
    val data = listed
      .map(f => (f.path, PjCommitLog.relativize(fs, rootPath, new Path(f.path))))
      .filter { case (p, rel) =>
        p.endsWith(".parquet") && !PjBatchWrite.isInternalRel(rel)
      }
    if (data.isEmpty)
      throw new PJException(
        s"pjparquet convert: no parquet data files under '$root'")

    // partition shape sanity: every file must carry the SAME key sequence
    // (ragged layouts would make some rows unreachable by partition
    // filters — fail now, not at query time)
    val keySeqs = data.map { case (_, rel) =>
      rel.split('/').dropRight(1).toSeq.flatMap(_.split("=", 2) match {
        case Array(k, _) if k.nonEmpty => Some(k)
        case _ => None
      })
    }.distinct
    if (keySeqs.size > 1)
      throw new PJException(
        s"pjparquet convert: inconsistent partition layouts under '$root': " +
          keySeqs.map(_.mkString("/")).sorted.mkString("[", ", ", "]"))
    val inferredKeys = keySeqs.head
    partitionSpec.foreach { v =>
      val declared = PjTableProperties.parsePartitionSpec(v).map(_._1)
      if (declared != inferredKeys)
        throw new PJException(
          s"pjparquet convert: declared partition columns " +
            s"(${declared.mkString(",")}) do not match the directory layout " +
            s"(${inferredKeys.mkString(",")})")
    }

    // 2. the index fleet: one footer parse per file, executor-side
    val facts = PjIndexJob.generateForPaths(spark, data.map(_._1))
    val relByPath = data.toMap

    // 3. additive schema merge (deterministic: sorted path order), same
    // widening rules as the reader's mergeSchema lane
    val dataMerged = mergeSchemas(
      facts.sortBy(_.path).map(f => (f.path, DataType.fromJson(f.dataSchemaJson).asInstanceOf[StructType])))

    // partition columns join the RECORDED schema and the declared-spec
    // property, exactly like CREATE TABLE ([[PjCatalog.createTable]]) — the
    // DML write paths resolve partition keys from the recorded schema.
    // Types: declared spec wins; else inferred from the observed directory
    // values (all-integral -> bigint, ISO dates -> date, else string — the
    // same domain the directory walk infers)
    val partFields: Seq[StructField] = partitionSpec match {
      case Some(v) => PjTableProperties.parsePartitionSpec(v)
        .map { case (n, dt) => StructField(n, dt, nullable = true) }
      case None if inferredKeys.isEmpty => Nil
      case None =>
        val valuesByKey: Map[String, Seq[String]] = data
          .flatMap { case (_, rel) => PjBatchWrite.partsOfRel(rel).toSeq }
          .groupBy(_._1).view.mapValues(_.flatMap(_._2)).toMap
        inferredKeys.map { k =>
          val vs = valuesByKey.getOrElse(k, Nil)
          // bigint only when every value ROUND-TRIPS (leading-zero forms
          // like k=00 would silently become 0, breaking the raw-path
          // round-trip); date candidates must actually PARSE (the shape
          // regex alone admits 2024-13-99, which then nulls at cast time)
          val dt: DataType =
            if (vs.nonEmpty && vs.forall(v =>
                scala.util.Try(v.toLong.toString == v).getOrElse(false)))
              LongType
            else if (vs.nonEmpty && vs.forall(v =>
                v.matches("\\d{4}-\\d{2}-\\d{2}") &&
                  scala.util.Try { java.time.LocalDate.parse(v); true }.getOrElse(false)))
              org.apache.spark.sql.types.DateType
            else org.apache.spark.sql.types.StringType
          StructField(k, dt, nullable = true)
        }
    }
    val merged = StructType(
      dataMerged.fields.filterNot(f =>
        partFields.exists(_.name.equalsIgnoreCase(f.name))) ++ partFields)

    // 4. one commit with every entry; exclusive against any racing first
    // commit on the same directory
    val entries = facts.map(f => f.toEntry(relByPath(f.path)))
    val props =
      if (partFields.isEmpty) None
      else Some(PjTableProperties.render(Map(PjTableProperties.PartitionColumns ->
        partFields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(","))))
    val version = PjCommitLog.commit(
      fs, rootPath, action = "convert", add = entries, remove = Set.empty,
      dataSchemaJson = Some(merged.json),
      operation = Some("convert"),
      readVersion = Some(0L),
      propertiesJson = props,
      exclusive = true)
    Report(version, entries.size.toLong,
      entries.map(e => math.max(e.rows, 0L)).sum,
      entries.map(e => math.max(e.size, 0L)).sum,
      inferredKeys.mkString(","))
  }

  /** Additive union in first-seen field order with the reader's lossless
    * widening (INT↔LONG, FLOAT↔DOUBLE); same-name incompatible types fail
    * loudly naming the file.
    */
  private def mergeSchemas(schemas: Seq[(String, StructType)]): StructType = {
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    for ((path, s) <- schemas; field <- s.fields) {
      acc.get(field.name) match {
        case None => acc(field.name) = field
        case Some(prev) if prev.dataType == field.dataType =>
          if (field.nullable && !prev.nullable)
            acc(field.name) = prev.copy(nullable = true)
        case Some(prev) =>
          val widened = (prev.dataType, field.dataType) match {
            case (IntegerType, LongType) | (LongType, IntegerType) => Some(LongType)
            case (FloatType, DoubleType) | (DoubleType, FloatType) => Some(DoubleType)
            case _ => None
          }
          widened match {
            case Some(dt) =>
              acc(field.name) = prev.copy(dataType = dt,
                nullable = prev.nullable || field.nullable)
            case None =>
              throw new PJException(
                s"pjparquet convert: schema type conflict on column " +
                  s"'${field.name}': ${prev.dataType.simpleString} vs " +
                  s"${field.dataType.simpleString} (file '$path')")
          }
      }
    }
    // files missing a merged column read it as null post-convert
    val sawMissing = schemas.exists(_._2.size != acc.size)
    StructType(
      if (sawMissing) acc.values.map(_.copy(nullable = true)).toArray
      else acc.values.toArray)
  }
}
