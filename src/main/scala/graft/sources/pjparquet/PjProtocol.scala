package graft.sources.pjparquet

import org.apache.spark.sql.types.StructType

import graft.core.PJException

/** Table-features protocol for the commit log (round 13 — the format's
  * feature-flag guard, modeled on Delta's `protocol` action with table
  * features rather than monolithic version numbers).
  *
  * Problem it closes: a build predating deletion vectors, column
  * mapping, or identity columns would silently MISREAD a table using
  * them — ignore `dv` refs and resurrect deleted rows, read physical
  * column names as logical, or mint duplicate identity values — instead
  * of refusing. With the protocol lane, every commit that first USES a
  * feature records it, and any engine that does not understand a
  * required feature fails reads (reader features) or writes (writer
  * features) with a clear upgrade message.
  *
  * Lane semantics (same as `dataSchema`/`constraints`/`properties`):
  * the latest commit that RECORDS `protocol` wins; absence keeps the
  * predecessor's. Feature sets are MONOTONE — [[PjCommitLog.commit]]
  * only ever unions new requirements in, and RESTORE never records the
  * lane, so rolling a table back cannot downgrade its protection.
  *
  * Backward compatibility: a log with no protocol lane (every pre-r13
  * table) enforces nothing and reads/writes exactly as before; its
  * first post-r13 commit records the protocol inferred from the full
  * live state, upgrading it in place.
  *
  * Reader features (absence corrupts READS):
  *  - `dv` — file entries carry deletion vectors; a reader that ignores
  *    them returns deleted rows.
  *  - `columnMapping` — logical field names differ from physical file
  *    names ([[PjColumnMapping]]); a reader without the mapping serves
  *    stale names or misses columns.
  *
  * Writer features (absence corrupts future WRITES; reads are safe):
  *  - `constraints` — CHECK constraints must be enforced on ingest.
  *  - `identity` — identity columns must mint from the watermark under
  *    an exclusive commit.
  *  - `generated` — generated columns must be recomputed on write.
  *  - `cdf` — the change feed must be maintained by every DML commit.
  */
object PjProtocol {

  /** Features this build can READ through correctly. */
  val SupportedReaderFeatures: Set[String] = Set("dv", "columnMapping")

  /** Features this build can WRITE through correctly (superset: any
    * reader feature is also write-relevant).
    */
  val SupportedWriterFeatures: Set[String] =
    SupportedReaderFeatures ++
      Set("constraints", "identity", "generated", "cdf", "rowTracking")

  final case class Protocol(reader: Set[String], writer: Set[String]) {
    def isEmpty: Boolean = reader.isEmpty && writer.isEmpty
    def union(o: Protocol): Protocol = Protocol(reader ++ o.reader, writer ++ o.writer)
    def contains(o: Protocol): Boolean = o.reader.subsetOf(reader) && o.writer.subsetOf(writer)
    def json: String = {
      def arr(s: Set[String]) = s.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
      s"""{"readerFeatures":${arr(reader)},"writerFeatures":${arr(writer)}}"""
    }
  }
  val Empty: Protocol = Protocol(Set.empty, Set.empty)

  def parse(protocolJson: Option[String]): Protocol = protocolJson match {
    case None => Empty
    case Some(js) =>
      val node =
        try new com.fasterxml.jackson.databind.ObjectMapper().readTree(js)
        catch {
          case e: com.fasterxml.jackson.core.JacksonException =>
            throw new PJException(
              s"pjparquet: corrupt protocol record (${e.getMessage.take(80)})")
        }
      import scala.jdk.CollectionConverters._
      def set(field: String): Set[String] =
        Option(node.get(field)).map(_.elements().asScala.map(_.asText).toSet)
          .getOrElse(Set.empty)
      Protocol(set("readerFeatures"), set("writerFeatures"))
  }

  /** Refuse to materialize a snapshot whose protocol names reader
    * features this build lacks. Called on every snapshot replay, so a
    * future-format table fails EVERY read path (scans, time travel,
    * CDF, DML's own read) — `history`/`versionAtTimestamp` stay
    * header-only and keep working, matching Delta.
    */
  def checkRead(protocolJson: Option[String], where: => String): Unit = {
    val p = parse(protocolJson)
    val missing = p.reader -- SupportedReaderFeatures
    if (missing.nonEmpty)
      throw new PJException(
        s"pjparquet: table at $where requires reader table feature(s) " +
          s"${missing.toSeq.sorted.mkString("[", ", ", "]")} this build does not " +
          s"support (supported: ${SupportedReaderFeatures.toSeq.sorted.mkString(", ")}) " +
          "— reading it would return wrong results; upgrade the engine")
  }

  /** Refuse to commit against a table whose protocol names writer (or
    * reader) features this build lacks — writing blind would corrupt the
    * invariants those features maintain.
    */
  def checkWrite(protocolJson: Option[String], where: => String): Unit = {
    val p = parse(protocolJson)
    val missing = (p.reader -- SupportedReaderFeatures) ++ (p.writer -- SupportedWriterFeatures)
    if (missing.nonEmpty)
      throw new PJException(
        s"pjparquet: table at $where requires table feature(s) " +
          s"${missing.toSeq.sorted.mkString("[", ", ", "]")} this build does not " +
          s"support writing (supported: ${SupportedWriterFeatures.toSeq.sorted.mkString(", ")}) " +
          "— writing would corrupt the table; upgrade the engine")
  }

  /** The protocol a table state REQUIRES, inferred from the post-commit
    * snapshot's facts (entries + recorded lanes). Used by
    * [[PjCommitLog.commit]] to auto-upgrade the lane exactly when a
    * commit first introduces a feature.
    */
  def required(
      anyDv: Boolean,
      dataSchemaJson: Option[String],
      constraintsJson: Option[String],
      propertiesJson: Option[String]): Protocol = {
    var reader = Set.empty[String]
    var writer = Set.empty[String]
    if (anyDv) { reader += "dv"; writer += "dv" }
    dataSchemaJson.flatMap(parseSchema).foreach { st =>
      if (PjColumnMapping.hasMapping(st)) { reader += "columnMapping"; writer += "columnMapping" }
      if (st.fields.exists(PjGenerated.isIdentity)) writer += "identity"
      if (st.fields.exists(PjGenerated.isGenerated)) writer += "generated"
    }
    if (constraintsJson.exists(c => c.trim.nonEmpty && c.trim != "[]"))
      writer += "constraints"
    if (PjTableProperties.recorded(propertiesJson, PjTableProperties.ChangeFeedEnabled)
        .exists(_.equalsIgnoreCase("true")))
      writer += "cdf"
    // opt-in: a table that DECLARES id stability load-bearing locks out
    // writers whose rewrites would silently reassign row ids
    if (PjTableProperties.recorded(propertiesJson, PjTableProperties.RowTrackingRequired)
        .exists(_.equalsIgnoreCase("true")))
      writer += "rowTracking"
    Protocol(reader, writer)
  }

  /** `ALTER TABLE ... DROP FEATURE` (Delta parity — the escape hatch for
    * the reader lockout the protocol creates): remove a feature from the
    * required set so older builds regain access, PRECONDITIONED on the
    * current state no longer using it (e.g. `dv` requires zero live
    * vectors — purge first). Recorded as an exclusive protocol-lane
    * commit; racing writers that might re-introduce the feature conflict
    * and one side retries. Historical snapshots keep their own recorded
    * protocol, so time travel into the feature-using past still refuses
    * on builds that lack it.
    */
  def dropFeature(
      spark: org.apache.spark.sql.SparkSession, table: String,
      feature: String): Long = {
    val root = new org.apache.hadoop.fs.Path(table)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val head = PjCommitLog.latest(fs, root).getOrElse(
      throw new PJException(
        s"pjparquet: '$table' has no commit log; DROP FEATURE applies to logged tables"))
    val cur = parse(head.protocolJson)
    if (!cur.reader.contains(feature) && !cur.writer.contains(feature))
      throw new PJException(
        s"pjparquet: table at '$table' does not require feature '$feature' " +
          s"(recorded protocol: ${cur.json})")
    val req = required(
      anyDv = head.entries.exists(_.dv.isDefined),
      dataSchemaJson = head.dataSchemaJson,
      constraintsJson = head.constraintsJson,
      propertiesJson = head.propertiesJson)
    if (req.reader.contains(feature) || req.writer.contains(feature))
      throw new PJException(
        s"pjparquet: cannot drop feature '$feature' from table at '$table' — " +
          s"it is still in use: ${remedy(feature)}")
    val next = Protocol(cur.reader - feature, cur.writer - feature)
    val v = PjCommitLog.commit(fs, root, "drop-feature", Nil, Set.empty,
      operation = Some(s"DROP FEATURE $feature"),
      readVersion = Some(head.version),
      exclusive = true,
      protocolOverride = Some(next.json))
    PjCommitLog.clearSnapshotCache()
    PjParquetTable.clearLayoutCache()
    v
  }

  private def remedy(f: String): String = f match {
    case "dv" =>
      "live deletion vectors exist; run CALL pj.system.purge_deletion_vectors first"
    case "columnMapping" => "the schema still maps logical names to physical names"
    case "constraints" => "drop the table's CHECK constraints first"
    case "identity" => "the schema still declares identity columns"
    case "generated" => "the schema still declares generated columns"
    case "cdf" => "unset pj.changeFeed.enabled first"
    case "rowTracking" => "unset pj.rowTracking.required first"
    case _ => "remove its uses first"
  }

  /** Schema-JSON parse memo: [[required]] runs on EVERY commit and the
    * recorded schema string rarely changes — a tiny LRU turns the
    * per-commit DataType.fromJson into a map hit.
    */
  private val schemaMemo =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Option[StructType]](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Option[StructType]]): Boolean = size() > 32
      })

  private def parseSchema(json: String): Option[StructType] = {
    val cached = schemaMemo.get(json)
    if (cached != null) return cached
    val parsed =
      try org.apache.spark.sql.types.DataType.fromJson(json) match {
        case st: StructType => Some(st)
        case _ => None
      } catch { case scala.util.control.NonFatal(_) => None }
    schemaMemo.put(json, parsed)
    parsed
  }
}
