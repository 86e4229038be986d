package graft.sources.pjparquet

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.core.PJException

/** Iceberg-metadata export (UniForm-style): materializes the HEAD
  * snapshot as Iceberg v2 table metadata —
  * `metadata/v<version>.metadata.json` + one avro manifest list + one
  * avro manifest — so Iceberg-NATIVE readers (HadoopCatalog convention,
  * `metadata/version-hint.text`) can plan the logged table's exact
  * snapshot. This is the complement of [[PjManifest]]'s symlink view
  * (Presto/Trino-style readers): same snapshot truth, different
  * metadata dialect.
  *
  * Field ids: an id-mode table (q172) exports its RECORDED ids verbatim;
  * a name-mode table gets deterministic positional ids (1..n top-level,
  * then pre-order for nested members) — the same assignment every
  * export, so successive metadata versions stay id-stable.
  *
  * Partition spec: identity transforms for declared Hive partition
  * columns; a declared `bucket(n, col)` spec exports as Iceberg's
  * `bucket[n]` transform on the source column (our dir value IS
  * Iceberg's bucket transform: pmod(hash, n) differs in hash function,
  * but the VALUES ride in the manifest verbatim, so readers plan by the
  * recorded value, never by re-hashing).
  *
  * Tables carrying live DELETION VECTORS refuse (an Iceberg reader would
  * resurrect DV-masked rows) — purge first, the same contract as the
  * symlink generator. AUTO-MAINTENANCE (`pj.icebergMetadata.enabled`)
  * re-exports after every commit, best-effort.
  */
object PjIcebergMetadata {

  final case class Report(
      version: Long, snapshotId: Long, dataFiles: Long, metadataFile: String)

  val DirName = "metadata"

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val mapper = new ObjectMapper()

  def generate(spark: SparkSession, root: String): Report = {
    val rootPath = new Path(root)
    generate(rootPath.getFileSystem(spark.sessionState.newHadoopConf()), rootPath)
  }

  /** Post-commit hook (`pj.icebergMetadata.enabled`): best-effort full
    * re-export; a DV-carrying snapshot is skipped (the export stays at
    * its last DV-free version) rather than failing the commit.
    */
  private[pjparquet] def autoMaintain(
      fs: org.apache.hadoop.fs.FileSystem, rootPath: Path): Unit =
    try { generate(fs, rootPath); () }
    catch {
      case scala.util.control.NonFatal(e) =>
        log.warn("pjparquet: iceberg-metadata maintenance failed for {}: {}",
          rootPath.toString, e.toString)
    }

  def generate(fs: org.apache.hadoop.fs.FileSystem, rootPath: Path): Report = {
    val snap = PjCommitLog.latest(fs, rootPath).getOrElse(throw new PJException(
      "pjparquet: iceberg metadata export requires a commit-log table"))
    if (snap.entries.exists(_.dv.isDefined))
      throw new PJException(
        "pjparquet: iceberg metadata export refuses tables with live deletion " +
          "vectors (an external reader would resurrect deleted rows); run " +
          "CALL <catalog>.system.purge_deletion_vectors first")
    val schema = snap.dataSchemaJson.map(j =>
      DataType.fromJson(j).asInstanceOf[StructType]).getOrElse(throw new PJException(
      "pjparquet: iceberg metadata export requires a recorded table schema " +
        "(CREATE the table through the catalog, or write with log.enabled)"))

    val rootUri = fs.makeQualified(rootPath).toString
    val version = snap.version
    val snapshotId = version // deterministic; spec pins equality with the log
    val ts = System.currentTimeMillis()

    // ---- field ids: recorded (id mode) or deterministic positional;
    // nested members get ids after the top-level block, pre-order
    val physical = PjColumnMapping.physicalSchema(schema)
    val topIds: Seq[Long] = schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      PjColumnMapping.fieldId(f).getOrElse((i + 1).toLong)
    }
    var nextId: Long = math.max(topIds.max, schema.fields.length.toLong)
    def allocId(): Long = { nextId += 1; nextId }

    def icebergType(dt: DataType): Any = dt match {
      case ByteType | ShortType | IntegerType => "int"
      case LongType => "long"
      case FloatType => "float"
      case DoubleType => "double"
      case BooleanType => "boolean"
      case StringType => "string"
      case BinaryType => "binary"
      case DateType => "date"
      case TimestampType => "timestamptz"
      case TimestampNTZType => "timestamp"
      case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
      case st: StructType =>
        val o = mapper.createObjectNode()
        o.put("type", "struct")
        val arr = o.putArray("fields")
        for (f <- st.fields) {
          val id = allocId()
          arr.add(fieldNode(id, f.name, f.nullable, icebergType(f.dataType)))
        }
        o
      case at: ArrayType =>
        val o = mapper.createObjectNode()
        o.put("type", "list")
        o.put("element-id", allocId())
        putType(o, "element", icebergType(at.elementType))
        o.put("element-required", !at.containsNull)
        o
      case mt: MapType =>
        val o = mapper.createObjectNode()
        o.put("type", "map")
        o.put("key-id", allocId())
        putType(o, "key", icebergType(mt.keyType))
        o.put("value-id", allocId())
        putType(o, "value", icebergType(mt.valueType))
        o.put("value-required", !mt.valueContainsNull)
        o
      case other =>
        throw new PJException(
          s"pjparquet: iceberg metadata export does not support type $other")
    }
    def putType(o: ObjectNode, key: String, t: Any): Unit = t match {
      case s: String => o.put(key, s)
      case n: ObjectNode => o.set(key, n); ()
    }
    def fieldNode(id: Long, name: String, nullable: Boolean, t: Any): ObjectNode = {
      val f = mapper.createObjectNode()
      f.put("id", id)
      f.put("name", name)
      f.put("required", !nullable)
      putType(f, "type", t)
      f
    }

    val schemaNode = mapper.createObjectNode()
    schemaNode.put("type", "struct")
    schemaNode.put("schema-id", 0)
    val fieldsArr = schemaNode.putArray("fields")
    // physical names: the FILES store them, and Iceberg readers match
    // parquet columns by the ids the files carry anyway — but the
    // metadata names must be the ones whose ids pair with the files'
    for ((f, i) <- physical.fields.toSeq.zipWithIndex)
      fieldsArr.add(fieldNode(topIds(i), f.name, f.nullable, icebergType(f.dataType)))
    val lastColumnId = nextId

    // ---- partition spec
    val partCols: Seq[(String, DataType)] =
      PjTableProperties.partitionColumns(snap.propertiesJson)
    val bucketSpec: Option[(String, Int)] =
      PjTableProperties.recorded(snap.propertiesJson, PjTableProperties.PartitionBucket)
        .flatMap(PjTableProperties.parseBucketSpec)
    def topIdOf(name: String): Long = {
      val i = physical.fields.indexWhere(_.name.equalsIgnoreCase(name))
      if (i < 0) {
        val j = schema.fields.indexWhere(_.name.equalsIgnoreCase(name))
        if (j < 0) throw new PJException(
          s"pjparquet: partition column $name is not in the recorded schema")
        topIds(j)
      } else topIds(i)
    }
    val specFields: Seq[(String, String, Long, Long)] = // (name, transform, srcId, fieldId)
      partCols.zipWithIndex.map { case ((name, _), i) =>
        val fieldId = 1000L + i
        bucketSpec match {
          case Some((src, n)) if name.equalsIgnoreCase(
              PjTableProperties.bucketFieldName(src)) =>
            (name, s"bucket[$n]", topIdOf(src), fieldId)
          case _ => (name, "identity", topIdOf(name), fieldId)
        }
      }
    val specNode = mapper.createObjectNode()
    specNode.put("spec-id", 0)
    val specArr = specNode.putArray("fields")
    for ((name, transform, srcId, fid) <- specFields) {
      val f = mapper.createObjectNode()
      f.put("name", name)
      f.put("transform", transform)
      f.put("source-id", srcId)
      f.put("field-id", fid)
      specArr.add(f)
    }

    // ---- avro manifest (one manifest for the whole snapshot)
    val metaDir = new Path(rootPath, DirName)
    fs.mkdirs(metaDir)
    val manifestUuid = java.util.UUID.randomUUID().toString
    val manifestPath = new Path(metaDir, s"$manifestUuid-m0.avro")
    val entries = snap.entries
    val totalRows = entries.map(e => math.max(e.rows, 0L)).sum
    writeManifest(fs, manifestPath, rootUri, entries, partCols, specFields,
      snapshotId, version, specNode.toString, schemaNode.toString)
    val manifestLen = fs.getFileStatus(manifestPath).getLen

    // ---- avro manifest list
    val listPath = new Path(metaDir, s"snap-$snapshotId-1-$manifestUuid.avro")
    writeManifestList(fs, listPath, fs.makeQualified(manifestPath).toString,
      manifestLen, snapshotId, version, entries.size, totalRows)

    // ---- vN.metadata.json (+ version-hint.text, HadoopCatalog convention)
    val md = mapper.createObjectNode()
    md.put("format-version", 2)
    md.put("table-uuid",
      java.util.UUID.nameUUIDFromBytes(rootUri.getBytes("UTF-8")).toString)
    md.put("location", rootUri)
    md.put("last-sequence-number", version)
    md.put("last-updated-ms", ts)
    md.put("last-column-id", lastColumnId)
    md.put("current-schema-id", 0)
    md.putArray("schemas").add(schemaNode)
    md.put("default-spec-id", 0)
    md.putArray("partition-specs").add(specNode)
    md.put("last-partition-id", if (specFields.isEmpty) 999L else specFields.map(_._4).max)
    md.put("default-sort-order-id", 0)
    locally {
      val so = mapper.createObjectNode()
      so.put("order-id", 0)
      so.putArray("fields")
      md.putArray("sort-orders").add(so)
    }
    md.putObject("properties")
    md.put("current-snapshot-id", snapshotId)
    locally {
      val sn = mapper.createObjectNode()
      sn.put("snapshot-id", snapshotId)
      sn.put("sequence-number", version)
      sn.put("timestamp-ms", ts)
      val sum = sn.putObject("summary")
      sum.put("operation", "append")
      sum.put("total-records", totalRows.toString)
      sum.put("total-data-files", entries.size.toString)
      sn.put("manifest-list", fs.makeQualified(listPath).toString)
      sn.put("schema-id", 0)
      md.putArray("snapshots").add(sn)
      val slog = mapper.createObjectNode()
      slog.put("timestamp-ms", ts)
      slog.put("snapshot-id", snapshotId)
      md.putArray("snapshot-log").add(slog)
    }
    md.putArray("metadata-log")

    val mdPath = new Path(metaDir, s"v$version.metadata.json")
    writeAtomic(fs, mdPath, md.toPrettyString.getBytes("UTF-8"))
    writeAtomic(fs, new Path(metaDir, "version-hint.text"),
      version.toString.getBytes("UTF-8"))
    Report(version, snapshotId, entries.size.toLong,
      fs.makeQualified(mdPath).toString)
  }

  private def writeAtomic(
      fs: org.apache.hadoop.fs.FileSystem, path: Path, bytes: Array[Byte]): Unit = {
    val tmp = new Path(path.getParent,
      s".${path.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    fs.delete(path, false)
    if (!fs.rename(tmp, path))
      throw new PJException(s"pjparquet: could not publish $path")
  }

  /** Avro type name for a partition VALUE of the given source type (the
    * manifest's partition struct is typed).
    */
  private def partAvroType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | DateType => "int"
    case LongType => "long"
    case StringType => "string"
    case BooleanType => "boolean"
    case DoubleType => "double"
    case FloatType => "float"
    case other => throw new PJException(
      s"pjparquet: iceberg export does not support partition type $other")
  }

  private def partAvroValue(dt: DataType, raw: String): Any =
    if (raw == null || raw == "__HIVE_DEFAULT_PARTITION__") null
    else dt match {
      case ByteType | ShortType | IntegerType => Integer.valueOf(raw.toInt)
      case DateType => Integer.valueOf(java.time.LocalDate.parse(raw).toEpochDay.toInt)
      case LongType => java.lang.Long.valueOf(raw.toLong)
      case StringType => raw
      case BooleanType => java.lang.Boolean.valueOf(raw.toBoolean)
      case DoubleType => java.lang.Double.valueOf(raw.toDouble)
      case FloatType => java.lang.Float.valueOf(raw.toFloat)
      case other => throw new PJException(s"unsupported partition type $other")
    }

  /** Hive-layout partition values of a relative entry path, folded-key
    * map (missing dirs = absent = null value).
    */
  private def partValuesOf(rel: String): Map[String, String] = {
    val segs = rel.split("/").dropRight(1)
    segs.flatMap { seg =>
      seg.split("=", 2) match {
        case Array(k, v) if k.nonEmpty =>
          val decoded =
            if (v.indexOf('%') < 0 && v.indexOf('+') < 0) v
            else java.net.URLDecoder.decode(v, "UTF-8")
          Some(k.toLowerCase(java.util.Locale.ROOT) -> decoded)
        case _ => None
      }
    }.toMap
  }

  /** Bucket transforms ride the DIRECTORY value (our pmod hash) — Iceberg
    * readers plan by the recorded value.
    */
  private def writeManifest(
      fs: org.apache.hadoop.fs.FileSystem,
      path: Path,
      rootUri: String,
      entries: Seq[PjCommitLog.FileEntry],
      partCols: Seq[(String, DataType)],
      specFields: Seq[(String, String, Long, Long)],
      snapshotId: Long,
      sequenceNumber: Long,
      specJson: String,
      schemaJson: String): Unit = {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumWriter}
    import org.apache.avro.file.DataFileWriter
    // the partition struct value types come from the DIRECTORY value the
    // table actually stores: identity = the source type, bucket[n] = int
    val partFieldsJson = specFields.map { case (name, transform, _, fid) =>
      val dt =
        if (transform.startsWith("bucket[")) IntegerType
        else partCols.find(_._1.equalsIgnoreCase(name)).map(_._2).getOrElse(StringType)
      s"""{"name":${q(avroSafe(name))},"type":["null","${partAvroType(dt)}"],""" +
        s""""default":null,"field-id":$fid}"""
    }.mkString(",")
    val schemaStr =
      s"""{"type":"record","name":"manifest_entry","fields":[
         |{"name":"status","type":"int","field-id":0},
         |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
         |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
         |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
         |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
         |{"name":"content","type":"int","field-id":134},
         |{"name":"file_path","type":"string","field-id":100},
         |{"name":"file_format","type":"string","field-id":101},
         |{"name":"partition","type":{"type":"record","name":"r102","fields":[$partFieldsJson]},"field-id":102},
         |{"name":"record_count","type":"long","field-id":103},
         |{"name":"file_size_in_bytes","type":"long","field-id":104}
         |]},"field-id":2}]}""".stripMargin
    val avroSchema = new Schema.Parser().parse(schemaStr)
    val dataFileSchema = avroSchema.getField("data_file").schema()
    val partSchema = dataFileSchema.getField("partition").schema()
    val writer = new DataFileWriter(new GenericDatumWriter[GenericData.Record](avroSchema))
    writer.setMeta("schema", schemaJson)
    writer.setMeta("partition-spec", specJson)
    writer.setMeta("partition-spec-id", "0")
    writer.setMeta("format-version", "2")
    writer.setMeta("content", "data")
    val out = fs.create(path, true)
    try {
      writer.create(avroSchema, out)
      for (e <- entries) {
        val rec = new GenericData.Record(avroSchema)
        rec.put("status", 1) // ADDED
        rec.put("snapshot_id", snapshotId)
        rec.put("sequence_number", sequenceNumber)
        rec.put("file_sequence_number", sequenceNumber)
        val df = new GenericData.Record(dataFileSchema)
        df.put("content", 0) // DATA
        df.put("file_path", s"$rootUri/${e.path}")
        df.put("file_format", "PARQUET")
        val pv = new GenericData.Record(partSchema)
        val values = partValuesOf(e.path)
        for (((name, transform, _, _), i) <- specFields.zipWithIndex) {
          val raw = values.get(name.toLowerCase(java.util.Locale.ROOT)).orNull
          val dt =
            if (transform.startsWith("bucket[")) IntegerType
            else partCols.find(_._1.equalsIgnoreCase(name)).map(_._2).getOrElse(StringType)
          pv.put(i, partAvroValue(dt, raw))
        }
        df.put("partition", pv)
        df.put("record_count", math.max(e.rows, 0L))
        df.put("file_size_in_bytes", math.max(e.size, 0L))
        rec.put("data_file", df)
        writer.append(rec)
      }
    } finally writer.close() // closes the stream too
  }

  private def writeManifestList(
      fs: org.apache.hadoop.fs.FileSystem,
      path: Path,
      manifestUri: String,
      manifestLen: Long,
      snapshotId: Long,
      sequenceNumber: Long,
      fileCount: Int,
      rowCount: Long): Unit = {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumWriter}
    import org.apache.avro.file.DataFileWriter
    val schemaStr =
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string","field-id":500},
        |{"name":"manifest_length","type":"long","field-id":501},
        |{"name":"partition_spec_id","type":"int","field-id":502},
        |{"name":"content","type":"int","field-id":517},
        |{"name":"sequence_number","type":"long","field-id":515},
        |{"name":"min_sequence_number","type":"long","field-id":516},
        |{"name":"added_snapshot_id","type":"long","field-id":503},
        |{"name":"added_files_count","type":"int","field-id":504},
        |{"name":"existing_files_count","type":"int","field-id":505},
        |{"name":"deleted_files_count","type":"int","field-id":506},
        |{"name":"added_rows_count","type":"long","field-id":512},
        |{"name":"existing_rows_count","type":"long","field-id":513},
        |{"name":"deleted_rows_count","type":"long","field-id":514}
        |]}""".stripMargin
    val avroSchema = new Schema.Parser().parse(schemaStr)
    val writer = new DataFileWriter(new GenericDatumWriter[GenericData.Record](avroSchema))
    writer.setMeta("format-version", "2")
    val out = fs.create(path, true)
    try {
      writer.create(avroSchema, out)
      val rec = new GenericData.Record(avroSchema)
      rec.put("manifest_path", manifestUri)
      rec.put("manifest_length", manifestLen)
      rec.put("partition_spec_id", 0)
      rec.put("content", 0)
      rec.put("sequence_number", sequenceNumber)
      rec.put("min_sequence_number", sequenceNumber)
      rec.put("added_snapshot_id", snapshotId)
      rec.put("added_files_count", fileCount)
      rec.put("existing_files_count", 0)
      rec.put("deleted_files_count", 0)
      rec.put("added_rows_count", rowCount)
      rec.put("existing_rows_count", 0L)
      rec.put("deleted_rows_count", 0L)
      writer.append(rec)
    } finally writer.close()
  }

  private def q(s: String): String = "\"" + s + "\""

  /** Avro record field names must match [A-Za-z_][A-Za-z0-9_]* — mangle
    * anything else deterministically (the iceberg spec's own convention
    * stores the true name in the PARTITION SPEC, which we embed in the
    * manifest's key-value metadata).
    */
  private def avroSafe(n: String): String = {
    val s = n.map(c => if (c.isLetterOrDigit || c == '_') c else '_')
    if (s.isEmpty || !(s.head.isLetter || s.head == '_')) "_" + s else s
  }
}
