package graft.sources.pjparquet

import java.util.Locale

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** RENAME COLUMN via column mapping — Delta's `name` mode, Spark-first
  * (reference scope note: the reference's splice core selects columns by
  * exact physical name, `palletjack.cc:483-487`; mapping is the
  * table-format indirection layered ABOVE it so logical renames never
  * touch a file).
  *
  * Every field of the RECORDED schema may carry a physical name in its
  * `StructField.metadata` under [[MetaKey]]; absent means logical ==
  * physical (every pre-mapping log reads unchanged). Physical names are
  * FROZEN at first record: a rename is a metadata-only commit that
  * changes the logical name and pins `pjPhysical` to the old physical
  * name, so
  *
  *  - every existing file keeps serving (its bytes are keyed by the
  *    physical name, which never changes),
  *  - every future write renames logical→physical at the parquet-file
  *    boundary (one schema rename in the write conf — values are
  *    positional), keeping ALL generations physically uniform,
  *  - the scan translates requested columns and pushed filters
  *    logical→physical ONCE, and every per-file structure (index column
  *    names, entry stats keys, blooms, page indexes) stays consistent
  *    with zero per-file translation,
  *  - stale writers naming the OLD logical column refuse loudly (the
  *    resolver's schema guard no longer finds it in the recorded
  *    schema), and re-using a renamed-away name for a new column refuses
  *    while live files still carry its bytes (same resurrection guard as
  *    DROP/re-ADD).
  */
object PjColumnMapping {

  /** Field-metadata key holding the frozen physical column name. */
  val MetaKey = "pjPhysical"

  /** Field-metadata key holding the table's assigned FIELD ID (`id`
    * column-mapping mode, `pj.columnMapping.mode=id`): ids are assigned
    * once at CREATE (1..n) and by ADD COLUMN (maxColumnId+1), stamped
    * into every written parquet file's schema, and reads resolve columns
    * BY ID through Spark's own field-id matching — so a file written by
    * an id-keyed engine (Iceberg) whose column NAMES differ from this
    * table's physical names still serves the right bytes, and renames on
    * either side never break the pairing.
    */
  val IdMetaKey = "pjFieldId"

  /** Spark's parquet field-id metadata key (`ParquetUtils
    * .FIELD_ID_METADATA_KEY`): the writer stamps ids carried here into
    * the file schema, and the vectorized reader matches requested columns
    * by id when `spark.sql.parquet.fieldId.read.enabled` is set.
    */
  val ParquetFieldIdKey = "parquet.field.id"

  def fieldId(f: StructField): Option[Long] =
    if (f.metadata.contains(IdMetaKey)) Some(f.metadata.getLong(IdMetaKey)) else None

  def hasFieldIds(s: StructType): Boolean = s.fields.exists(_.metadata.contains(IdMetaKey))

  def withFieldId(meta: Metadata, id: Long): Metadata =
    new MetadataBuilder().withMetadata(meta).putLong(IdMetaKey, id).build()

  /** PHYSICAL column name → assigned field id, for stamping write/read
    * schemas whose field metadata did not survive the query plan.
    */
  def fieldIdsByPhysical(s: Option[StructType]): Map[String, Long] =
    s.toSeq.flatMap(_.fields).flatMap(f =>
      fieldId(f).map(id => fold(physicalName(f)) -> id)).toMap

  /** The FILE's parquet field ids → its top-level column names: one
    * footer parse. id-mode foreign-file lanes only — our own files always
    * name-match the recorded physical schema, so this never runs for them.
    */
  def fileFieldIdNames(
      conf: org.apache.hadoop.conf.Configuration, path: String): Map[Long, String] = {
    import scala.jdk.CollectionConverters._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter.getFileMetaData.getSchema.getFields.asScala
      .flatMap(t => Option(t.getId).map(id => id.intValue().toLong -> t.getName))
      .toMap
    finally r.close()
  }

  /** Stamp `parquet.field.id` onto a rewrite DataFrame's top-level columns
    * (id mode) so a stock `df.write.parquet` rewrite — compaction,
    * OPTIMIZE — outputs files that physically carry the table's field ids
    * like every other writer ([[stampParquetIds]] handles the DSv2 write
    * conf; this handles plans whose field metadata did not survive).
    */
  def stampRewriteIds(
      df: org.apache.spark.sql.DataFrame,
      ids: Map[String, Long]): org.apache.spark.sql.DataFrame =
    if (ids.isEmpty) df
    else {
      import org.apache.spark.sql.functions.col
      df.select(df.columns.map { c =>
        ids.get(fold(c)) match {
          case Some(id) => col(c).as(c, new MetadataBuilder()
            .putLong(ParquetFieldIdKey, id).build())
          case None => col(c)
        }
      }.toIndexedSeq: _*)
    }

  /** Stamp `parquet.field.id` onto fields whose physical name has an
    * assigned id — the writer then records ids in the file schema, and
    * the reader (with fieldId.read enabled) aligns columns by them.
    */
  def stampParquetIds(s: StructType, ids: Map[String, Long]): StructType =
    if (ids.isEmpty) s
    else StructType(s.fields.map { f =>
      ids.get(fold(f.name)) match {
        case Some(id) => f.copy(metadata = new MetadataBuilder()
          .withMetadata(f.metadata).putLong(ParquetFieldIdKey, id).build())
        case None => f
      }
    })

  def physicalName(f: StructField): String =
    if (f.metadata.contains(MetaKey)) f.metadata.getString(MetaKey) else f.name

  def hasMapping(s: StructType): Boolean = s.fields.exists(_.metadata.contains(MetaKey))

  /** The schema as files physically store it (logical names replaced). */
  def physicalSchema(s: StructType): StructType =
    StructType(s.fields.map(f => f.copy(name = physicalName(f))))

  private def fold(n: String): String = n.toLowerCase(Locale.ROOT)

  /** case-insensitively-folded logical name → physical name; empty when
    * the schema carries no mapping (the identity fast path).
    */
  def nameMap(s: Option[StructType]): Map[String, String] = s match {
    case Some(st) if hasMapping(st) =>
      st.fields.iterator.map(f => fold(f.name) -> physicalName(f)).toMap
    case _ => Map.empty
  }

  /** physical name → logical name (for translating file-derived schemas
    * back before widening the recorded schema).
    */
  def reverseMap(s: StructType): Map[String, String] =
    s.fields.iterator.map(f => fold(physicalName(f)) -> f.name).toMap

  def toPhysical(m: Map[String, String], name: String): String =
    if (m.isEmpty) name else m.getOrElse(fold(name), name)

  /** Field metadata pinning `physical` as the frozen physical name. */
  def withPhysical(meta: Metadata, physical: String): Metadata =
    new MetadataBuilder().withMetadata(meta).putString(MetaKey, physical).build()

  /** Rewrite a pushed filter's column references logical→physical. A
    * dotted nested reference translates its TOP-level segment (mapping is
    * top-level only — nested renames are not supported), after trying the
    * whole name (a column literally named "a.b").
    */
  def toPhysicalFilter(m: Map[String, String], filter: Filter): Filter = {
    if (m.isEmpty) return filter
    def t(n: String): String = m.get(fold(n)) match {
      case Some(p) => p
      case None =>
        val i = n.indexOf('.')
        if (i <= 0) n
        else m.get(fold(n.substring(0, i))).map(_ + n.substring(i)).getOrElse(n)
    }
    def go(f: Filter): Filter = f match {
      case EqualTo(a, v) => EqualTo(t(a), v)
      case EqualNullSafe(a, v) => EqualNullSafe(t(a), v)
      case GreaterThan(a, v) => GreaterThan(t(a), v)
      case GreaterThanOrEqual(a, v) => GreaterThanOrEqual(t(a), v)
      case LessThan(a, v) => LessThan(t(a), v)
      case LessThanOrEqual(a, v) => LessThanOrEqual(t(a), v)
      case In(a, vs) => In(t(a), vs)
      case IsNull(a) => IsNull(t(a))
      case IsNotNull(a) => IsNotNull(t(a))
      case StringStartsWith(a, v) => StringStartsWith(t(a), v)
      case StringEndsWith(a, v) => StringEndsWith(t(a), v)
      case StringContains(a, v) => StringContains(t(a), v)
      case And(l, r) => And(go(l), go(r))
      case Or(l, r) => Or(go(l), go(r))
      case Not(c) => Not(go(c))
      case other => other // AlwaysTrue/AlwaysFalse/unknown: no references
    }
    go(filter)
  }

  /** Translate a FILE-derived schema's names physical→logical against the
    * recorded schema, so commit-time widening compares like with like.
    * Names outside the mapping pass through (brand-new columns).
    */
  def fileSchemaToLogical(recorded: StructType, fileSchemaJson: String): String = {
    if (!hasMapping(recorded)) return fileSchemaJson
    val byLogical = recorded.fields.iterator.map(f => fold(f.name) -> f).toMap
    val rev = reverseMap(recorded)
    val fs = org.apache.spark.sql.types.DataType.fromJson(fileSchemaJson)
      .asInstanceOf[StructType]
    StructType(fs.fields.map { f =>
      rev.get(fold(f.name)) match {
        case Some(l) =>
          // carry the RECORDED field's metadata so the frozen physical
          // name survives widening/recording on every subsequent commit
          f.copy(name = l, metadata = byLogical(fold(l)).metadata)
        case None => f
      }
    }).json
  }
}
