package graft.sources.pjparquet

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.PJException

/** Persisted table properties — the Delta `TBLPROPERTIES` contract
  * (`delta.enableChangeDataFeed`-style): table-level configuration lives
  * IN THE COMMIT LOG, not in each job's read/write options, so a table's
  * behavioral contract ("this table persists a change feed", "this table
  * uses copy-on-write DML") binds every writer — including ones that
  * never heard of the option — instead of silently depending on each
  * caller passing the right flag.
  *
  * Storage: a flat string→string JSON object in the commit's
  * `properties` field, latest-recording-commit wins (the same lane as
  * `dataSchema` and `constraints`); `SET TBLPROPERTIES` / `UNSET
  * TBLPROPERTIES` are metadata-only commits ([[PjCatalog.alterTable]]).
  * Properties survive checkpoint replay and version expiry exactly like
  * the recorded schema.
  *
  * Precedence at use sites: an EXPLICIT per-operation option still wins
  * (`df.write.option("cdc.enabled", false)` can opt one backfill out of
  * a table-level change feed), then the recorded property, then the
  * engine default — Delta's own option-over-property order.
  *
  * Namespace rules: keys under `pj.` are RESERVED for the engine and
  * validated against [[Known]] at DDL time (a typo like
  * `pj.changeFeed.enabld` fails the ALTER, not silently at the next
  * write); any other key is a free-form user annotation and round-trips
  * untouched (team ownership tags, pipeline metadata — Delta allows the
  * same).
  */
object PjTableProperties {

  /** `pj.changeFeed.enabled` — when true, every DML/write commit persists
    * its change rows (`_pj_cdc`, [[PjChangeFeed.persistCommitDiff]])
    * without callers passing `cdc.enabled`.
    */
  val ChangeFeedEnabled = "pj.changeFeed.enabled"

  /** `pj.rowTracking.required` — when true, the table DECLARES that its
    * stable row ids are load-bearing: the commit protocol records the
    * `rowTracking` WRITER feature, so a build whose rewrites would not
    * materialize ids (pre-row-tracking) refuses to write instead of
    * silently reassigning them. Reads stay open to every build.
    */
  val RowTrackingRequired = "pj.rowTracking.required"

  /** `pj.deletionVectors.enabled` — default for merge-on-read DML
    * (deletion vectors) vs copy-on-write rewrites. Engine default: true.
    */
  val DeletionVectorsEnabled = "pj.deletionVectors.enabled"

  /** `pj.checkpoint.interval` — commits between full log checkpoints
    * (engine default [[PjCommitLog.CheckpointInterval]]). A busy
    * streaming table can checkpoint less often; a wide-fanout table more.
    */
  val CheckpointInterval = "pj.checkpoint.interval"

  /** `pj.autoCompact.enabled` — when true, a successful APPEND commit
    * checks its own wake: directories whose small-file count reached
    * `pj.autoCompact.minFiles` are compacted post-commit (Delta's
    * autoCompact). The compaction is best-effort — a failure logs and the
    * append stands — and scoped by [[PjCompaction]]'s own small-file
    * selection, so a steady small-append stream self-heals instead of
    * waiting for a maintenance window.
    */
  val AutoCompactEnabled = "pj.autoCompact.enabled"

  /** `pj.autoCompact.minFiles` — small files per directory that arm the
    * post-append compaction (default 8).
    */
  val AutoCompactMinFiles = "pj.autoCompact.minFiles"

  /** `pj.sort.columns` — comma-separated DATA columns every written file
    * is internally sorted by, as a TABLE contract (the per-write
    * `sort.columns` option overrides; an explicit empty option opts out).
    * Commits maintain the sort marker so scans report the ordering.
    */
  val SortColumns = "pj.sort.columns"

  /** `pj.bloom.columns` — comma-separated columns whose bloom sidecars
    * every write commit keeps fresh (table-level form of the
    * `bloom.columns` write option).
    */
  val BloomColumns = "pj.bloom.columns"

  /** `pj.vacuum.retentionHours` — default retention for
    * `CALL pj.system.vacuum` / `expire` when the call omits one.
    */
  val VacuumRetentionHours = "pj.vacuum.retentionHours"

  /** `pj.expire.keepVersions` — default version-count retention for
    * `CALL pj.system.expire` when the call omits one.
    */
  val ExpireKeepVersions = "pj.expire.keepVersions"

  /** `pj.partition.columns` — declared Hive partitioning recorded by
    * `CREATE TABLE ... PARTITIONED BY` as `name:bigint,name:string`
    * pairs: the empty table resolves its partition schema from this
    * (nothing on disk to infer from yet), writes partition by it, and
    * populated reads take the declared TYPES over directory inference
    * (a declared STRING key of numeric-looking values must not flip to
    * LONG).
    */
  val PartitionColumns = "pj.partition.columns"

  /** `pj.dataSkipping.numIndexedCols` — cap the per-file stats envelope
    * the commit log records to the first N physical columns (Delta's
    * `dataSkippingNumIndexedCols`, default 32 there; unset = all columns
    * here). On a 1000-column table every entry otherwise carries 1000
    * min/max pairs — at millions of files that is the difference between
    * a log that resolves in seconds and one that is itself big data.
    * Absent stats can only disable pruning for those columns, never
    * change results.
    */
  val DataSkippingNumIndexedCols = "pj.dataSkipping.numIndexedCols"

  /** `pj.columnMapping.mode` — `name` (default; RENAME freezes physical
    * names) or `id` (additionally: parquet FIELD IDS are assigned at
    * CREATE, stamped into every written file, and reads resolve columns
    * by id — so files written by id-based engines round-trip through
    * renames on either side). CREATE-time only: toggling after files
    * exist would strand id-less files.
    */
  val ColumnMappingMode = "pj.columnMapping.mode"

  /** `pj.columnMapping.maxColumnId` — high-water mark of assigned field
    * ids (Delta parity): ADD COLUMN takes maxColumnId+1, and a DROPped
    * column's id is never reused (reuse would resurrect its bytes in
    * old files under the new column).
    */
  val ColumnMappingMaxId = "pj.columnMapping.maxColumnId"

  /** `pj.partition.bucket` — a declared `bucket(n, col)` partition
    * transform (Iceberg parity), recorded as `col:n`. The table routes
    * rows into `<col>_bucket=<id>/` Hive directories where
    * `id = pmod(hash(col), n)` (Murmur3, Spark's `hash`), computed by the
    * write via the generated-column lane; the scan reports
    * `KeyGroupedPartitioning(bucket(n, col))` so two tables bucketed the
    * same way join with ZERO exchange (storage-partitioned join) on a
    * high-cardinality key no identity partitioning could hold.
    */
  val PartitionBucket = "pj.partition.bucket"

  /** `pj.cluster.columns` — the table's DECLARED clustering key (Delta's
    * `CLUSTER BY`): comma-separated data columns `OPTIMIZE` clusters on
    * when the call names none. Recorded once, so scheduled maintenance is
    * `CALL pj.system.optimize_zorder('/t')` with the layout contract
    * living in the table, not the cron job.
    */
  val ClusterColumns = "pj.cluster.columns"

  /** `pj.cluster.curve` — the declared clustering curve (`zorder` |
    * `hilbert`) used when `OPTIMIZE` does not name one.
    */
  val ClusterCurve = "pj.cluster.curve"

  /** `pj.symlinkManifest.enabled` — when true, every successful commit
    * regenerates the `_symlink_format_manifest/` tree ([[PjManifest]],
    * Delta's `symlinkFormatManifest.enabled`), keeping external
    * symlink-format readers on HEAD. Best-effort: a DV-carrying snapshot
    * is skipped (the manifest stays at its last DV-free version).
    */
  val SymlinkManifestEnabled = "pj.symlinkManifest.enabled"

  /** `pj.icebergMetadata.enabled` — when true, every successful commit
    * re-exports Iceberg v2 table metadata under `metadata/`
    * ([[PjIcebergMetadata]], UniForm-style), keeping Iceberg-native
    * readers on HEAD. Best-effort: a DV-carrying snapshot is skipped
    * (the export stays at its last DV-free version).
    */
  val IcebergMetadataEnabled = "pj.icebergMetadata.enabled"

  /** `pj.optimizeWrite.enabled` — when true, every batch write REBALANCES
    * its input before writing (Delta's optimized writes): the required
    * distribution is declared non-strict, so Spark plans
    * `RebalancePartitions` and AQE sizes the shuffle output to
    * [[OptimizeWriteBinSize]] — small trailing partitions coalesce (no
    * small-file storm from a 1000-task upstream stage) and a skewed hot
    * partition SPLITS across writers instead of OOMing one task. Costs one
    * shuffle per write; worth it whenever the table is read more than
    * written.
    */
  val OptimizeWriteEnabled = "pj.optimizeWrite.enabled"

  /** `pj.optimizeWrite.binSize` — AQE advisory bytes per shuffle output
    * partition (≈ bytes per written file before encoding) for optimized
    * writes. Default 128 MiB — one parquet row group.
    */
  val OptimizeWriteBinSize = "pj.optimizeWrite.binSize"

  /** Parse `pj.partition.columns` into (name, bigint|string|date type). */
  def partitionColumns(
      propertiesJson: Option[String]): Seq[(String, org.apache.spark.sql.types.DataType)] =
    recorded(propertiesJson, PartitionColumns).toSeq.flatMap(parsePartitionSpec)

  /** Parse a raw `name:type,...` partition-spec value. */
  def parsePartitionSpec(value: String): Seq[(String, org.apache.spark.sql.types.DataType)] =
    value.split(",").toSeq.flatMap { seg =>
      seg.split(":", 2) match {
        case Array(n, t) if n.trim.nonEmpty =>
          Some(n.trim -> (t.trim.toLowerCase(java.util.Locale.ROOT) match {
            case "string" => org.apache.spark.sql.types.StringType
            case "date" => org.apache.spark.sql.types.DateType
            case _ => org.apache.spark.sql.types.LongType
          }))
        case _ => None
      }
    }

  /** Reserved-namespace keys the engine understands, with value
    * validators (run at DDL time so a bad value fails the ALTER).
    */
  private val Known: Map[String, String => Option[String]] = Map(
    ChangeFeedEnabled -> boolValidator,
    AutoCompactEnabled -> boolValidator,
    AutoCompactMinFiles -> posIntValidator,
    RowTrackingRequired -> boolValidator,
    DeletionVectorsEnabled -> boolValidator,
    CheckpointInterval -> posIntValidator,
    BloomColumns -> (_ => None), // any csv of names; resolved per-write
    SortColumns -> (_ => None), // any csv of names; resolved per-write
    VacuumRetentionHours -> nonNegLongValidator,
    ExpireKeepVersions -> posIntValidator,
    PartitionColumns -> partitionColumnsValidator,
    OptimizeWriteEnabled -> boolValidator,
    OptimizeWriteBinSize -> posLongValidator,
    SymlinkManifestEnabled -> boolValidator,
    IcebergMetadataEnabled -> boolValidator,
    ClusterColumns -> (_ => None), // any csv of names; resolved per-OPTIMIZE
    ClusterCurve -> curveValidator,
    DataSkippingNumIndexedCols -> numIndexedColsValidator,
    PartitionBucket -> bucketSpecValidator,
    ColumnMappingMode -> (v =>
      if (v.equalsIgnoreCase("name") || v.equalsIgnoreCase("id")) None
      else Some(s"expected name|id, got '$v'")),
    ColumnMappingMaxId -> nonNegLongValidator)

  private def partitionColumnsValidator(v: String): Option[String] = {
    val bad =
      v.split(",").filterNot(_.matches("\\s*[^:,\\s]+\\s*:\\s*(?i:bigint|string|date)\\s*"))
    if (bad.isEmpty) None
    else Some(s"expected name:bigint|string|date pairs, got '${bad.mkString(",")}'")
  }

  private def boolValidator(v: String): Option[String] =
    if (v.equalsIgnoreCase("true") || v.equalsIgnoreCase("false")) None
    else Some(s"expected true/false, got '$v'")

  private def posIntValidator(v: String): Option[String] =
    try { if (v.toInt > 0) None else Some(s"expected a positive integer, got '$v'") }
    catch { case _: NumberFormatException => Some(s"expected a positive integer, got '$v'") }

  private def bucketSpecValidator(v: String): Option[String] =
    if (v.matches("\\s*[^:,\\s]+\\s*:\\s*[1-9][0-9]*\\s*")) None
    else Some(s"expected col:numBuckets, got '$v'")

  /** Parse `pj.partition.bucket` (`col:n`). */
  def parseBucketSpec(value: String): Option[(String, Int)] =
    value.split(":", 2) match {
      case Array(c, n) if c.trim.nonEmpty &&
          scala.util.Try(n.trim.toInt).toOption.exists(_ > 0) =>
        Some((c.trim, n.trim.toInt))
      case _ => None
    }

  /** Directory partition column a bucket spec synthesizes. */
  def bucketFieldName(srcCol: String): String = s"${srcCol}_bucket"

  /** Delta's sentinels are legal: -1 = index all columns, 0 = none. */
  private def numIndexedColsValidator(v: String): Option[String] =
    try { if (v.toInt >= -1) None else Some(s"expected an integer >= -1, got '$v'") }
    catch { case _: NumberFormatException => Some(s"expected an integer >= -1, got '$v'") }

  private def curveValidator(v: String): Option[String] =
    if (v.equalsIgnoreCase("zorder") || v.equalsIgnoreCase("hilbert")) None
    else Some(s"expected zorder or hilbert, got '$v'")

  private def posLongValidator(v: String): Option[String] =
    try { if (v.toLong > 0) None else Some(s"expected a positive number, got '$v'") }
    catch { case _: NumberFormatException => Some(s"expected a positive number, got '$v'") }

  private def nonNegLongValidator(v: String): Option[String] =
    try { if (v.toLong >= 0) None else Some(s"expected a non-negative number, got '$v'") }
    catch { case _: NumberFormatException => Some(s"expected a non-negative number, got '$v'") }

  /** Validate one SET entry: reserved-namespace keys must be known and
    * their values well-formed; anything else passes (user annotation).
    */
  def validate(key: String, value: String): Unit = {
    val lower = key.toLowerCase(java.util.Locale.ROOT)
    if (lower.startsWith("pj.")) {
      val canonical = Known.keys.find(_.equalsIgnoreCase(key)).getOrElse(
        throw new PJException(
          s"pjparquet: unknown table property '$key' — the pj.* namespace is " +
            s"reserved; known properties: ${Known.keys.toSeq.sorted.mkString(", ")}"))
      Known(canonical)(value).foreach(err =>
        throw new PJException(s"pjparquet: invalid value for table property '$canonical': $err"))
    }
  }

  /** Canonical casing for a key (recorded form), so SET/UNSET are
    * case-insensitive on the reserved namespace like every other option.
    */
  def canonicalKey(key: String): String =
    Known.keys.find(_.equalsIgnoreCase(key)).getOrElse(key)

  /** Parse a recorded properties JSON object (None/empty → empty map). */
  def parse(json: Option[String]): Map[String, String] = json match {
    case None => Map.empty
    case Some(s) if s.trim.isEmpty => Map.empty
    case Some(s) =>
      val node = new ObjectMapper().readTree(s)
      node.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
  }

  /** Render a properties map as the recorded JSON (sorted keys — the log
    * body is deterministic for a given state).
    */
  def render(props: Map[String, String]): String = {
    val mapper = new ObjectMapper()
    val node = mapper.createObjectNode()
    props.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    mapper.writeValueAsString(node)
  }

  /** Effective boolean at a use site: explicit option > recorded property
    * > engine default.
    */
  def effectiveBool(
      options: CaseInsensitiveStringMap,
      propertiesJson: Option[String],
      optionKey: String,
      propertyKey: String,
      default: Boolean): Boolean =
    if (options.containsKey(optionKey)) options.getBoolean(optionKey, default)
    else parse(propertiesJson).collectFirst {
      case (k, v) if k.equalsIgnoreCase(propertyKey) => v.equalsIgnoreCase("true")
    }.getOrElse(default)

  /** Recorded value of `propertyKey` (case-insensitive), if any. */
  def recorded(propertiesJson: Option[String], propertyKey: String): Option[String] =
    parse(propertiesJson).collectFirst {
      case (k, v) if k.equalsIgnoreCase(propertyKey) => v
    }

  /** Table-level checkpoint interval recorded in `propertiesJson`, else
    * the engine default. Guarded: a malformed recorded value (only
    * possible by hand-editing the log) falls back to the default rather
    * than wedging every commit.
    */
  def checkpointInterval(propertiesJson: Option[String]): Int =
    recorded(propertiesJson, CheckpointInterval)
      .flatMap(v => scala.util.Try(v.toInt).toOption).filter(_ > 0)
      .getOrElse(PjCommitLog.CheckpointInterval)
}
