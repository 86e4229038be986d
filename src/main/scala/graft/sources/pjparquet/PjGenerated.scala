package graft.sources.pjparquet

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
import org.apache.spark.sql.catalyst.util.{GeneratedColumn, IdentityColumn}
import org.apache.spark.sql.types._

import graft.core.PJException

/** Generated and identity columns — Delta parity through Spark's own DDL
  * surface: `CREATE TABLE t (id BIGINT GENERATED ALWAYS AS IDENTITY,
  * doubled BIGINT GENERATED ALWAYS AS (x * 2), x BIGINT)` validates at
  * CREATE (the catalog advertises the capabilities; Spark verifies the
  * expressions) and records the clauses in the schema's field METADATA,
  * which rides the log's `dataSchema` lane untouched. This object builds
  * the WRITE-side row augmentation: one driver-analyzed, codegen-bound
  * projection per write that
  *
  *  - computes a generated column absent from the incoming rows;
  *  - for a PROVIDED generated column: computes when the value is NULL,
  *    validates equality against the generation expression otherwise
  *    (a mismatch fails the task — and therefore the commit — loudly);
  *  - on DML REWRITES (copy-on-write UPDATE/MERGE) always recomputes
  *    generated columns, so a SET on a base column keeps its dependents
  *    consistent (Delta semantics);
  *  - assigns identity values from the table's high watermark: the base
  *    comes from the snapshot's per-entry stats envelopes (zero data
  *    I/O), and each row takes `base + monotonicId * step` — unique
  *    across tasks, always inside the declared arithmetic progression
  *    `start + k*step`, sparse like Delta's (gaps are documented
  *    behavior). `GENERATED ALWAYS` refuses explicit non-NULL values;
  *    `BY DEFAULT` keeps them.
  *
  * Identity allocation races: a concurrent append could read the same
  * watermark, so identity-assigning commits are EXCLUSIVE — the commit
  * fails loudly if any winner landed since the watermark was read
  * (retrying re-reads it), instead of silently minting duplicates.
  */
object PjGenerated {

  def isGenerated(f: StructField): Boolean =
    f.metadata.contains(GeneratedColumn.GENERATION_EXPRESSION_METADATA_KEY)

  def isIdentity(f: StructField): Boolean =
    f.metadata.contains(IdentityColumn.IDENTITY_INFO_START)

  private def isManaged(f: StructField): Boolean = isGenerated(f) || isIdentity(f)

  /** A column ADDed with a DEFAULT (existence default recorded): an
    * append that OMITS it must MATERIALIZE a value — the current default
    * if one is set, explicit NULL after DROP DEFAULT — because the
    * read-time existence-default lane cannot distinguish a pre-add file
    * from a post-add omitting file (both physically lack the column).
    * Plain nullable columns without an existence default keep the
    * null-fill-at-read behavior (null either way).
    */
  private def hasExistsDefault(f: StructField): Boolean =
    f.metadata.contains(
      org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
        .EXISTS_DEFAULT_COLUMN_METADATA_KEY)

  private def currentDefaultSql(f: StructField): Option[String] = {
    val k = org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
      .CURRENT_DEFAULT_COLUMN_METADATA_KEY
    if (f.metadata.contains(k)) Some(f.metadata.getString(k)) else None
  }

  def hasGenerated(schema: Option[StructType]): Boolean =
    schema.exists(_.fields.exists(isGenerated))

  def hasAny(schema: Option[StructType]): Boolean =
    schema.exists(_.fields.exists(isManaged))

  /** Distribution/ordering keys for a partitioned write: a GENERATED
    * partition column absent from the incoming rows is replaced by the
    * base column(s) its generation expression references — Spark resolves
    * the required distribution against the incoming QUERY, which does not
    * carry the generated column (the write computes it after
    * augmentation). Clustering+sorting by the base columns still gives
    * each task contiguous partition-directory runs (any function of the
    * base is constant within a base-value run), preserving the
    * one-open-writer property.
    */
  def clusterKeys(
      spark: SparkSession,
      recorded: Option[StructType],
      incoming: StructType,
      partitionKeys: Seq[String]): Seq[String] = {
    val rec = recorded.getOrElse(return partitionKeys)
    val inNames = incoming.fields.map(f => fold(f.name)).toSet
    partitionKeys.flatMap { k =>
      if (inNames.contains(fold(k))) Seq(k)
      else rec.fields.find(f => fold(f.name) == fold(k)).filter(isGenerated) match {
        case Some(gf) =>
          try {
            val sql = gf.metadata.getString(
              org.apache.spark.sql.catalyst.util.GeneratedColumn
                .GENERATION_EXPRESSION_METADATA_KEY)
            val refs = spark.sessionState.sqlParser.parseExpression(sql).collect {
              case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => a.name
            }.distinct
            // substitute only when EVERY referenced base column is present
            if (refs.nonEmpty && refs.forall(r => inNames.contains(fold(r)))) refs
            else Seq(k)
          } catch { case scala.util.control.NonFatal(_) => Seq(k) }
        case None => Seq(k)
      }
    }.distinct
  }

  /** The bound projection a write applies to every row, shipped to tasks.
    * `identityAssigned` marks the commit exclusive (see scaladoc).
    */
  final case class Augment(
      outputSchemaJson: String,
      exprs: Seq[Expression],
      identityAssigned: Boolean) {
    def outputSchema: StructType =
      DataType.fromJson(outputSchemaJson).asInstanceOf[StructType]
  }

  private def fold(n: String): String = n.toLowerCase(java.util.Locale.ROOT)

  /** Identity high watermark for `col` from the snapshot's stats
    * envelopes — metadata-rate, zero file opens. Entries lacking a
    * recorded envelope for the column refuse loudly (adopt the table
    * once to record facts).
    */
  private def identityBase(
      layout: PjLayout, f: StructField, physName: String, start: Long,
      step: Long): Long = {
    val entries = layout.files.flatMap(_.entry)
    if (layout.files.nonEmpty && entries.size != layout.files.size)
      throw new PJException(
        s"pjparquet: identity column '${f.name}' needs log-recorded file " +
          "facts on every live file — rewrite or compact the table once")
    val observed = entries.flatMap { e =>
      e.stats.get(physName).orElse(e.stats.get(fold(physName))) match {
        case Some(st) =>
          val bytes = if (step > 0) st.max else st.min
          bytes.map(b => leNum(st.physType, b, f.name))
        case None =>
          if (e.liveRows == 0) None
          else throw new PJException(
            s"pjparquet: file '${e.path}' has no stats envelope for identity " +
              s"column '${f.name}' — rewrite or compact the table once")
      }
    }
    if (observed.isEmpty) start
    else if (step > 0) math.max(start, observed.max + step)
    else math.min(start, observed.min + step)
  }

  private def leNum(physType: Int, b: Array[Byte], col: String): Long = physType match {
    case 1 => // INT32 little-endian
      (b(0) & 0xffL) | (b(1) & 0xffL) << 8 | (b(2) & 0xffL) << 16 | (b(3).toLong << 24)
    case 2 => // INT64 little-endian
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (b(i) & 0xffL); i -= 1 }
      v
    case t => throw new PJException(
      s"pjparquet: identity column '$col' has non-integral physical type $t")
  }

  /** Build the augmentation for a write, or None when the recorded schema
    * declares no generated/identity columns. `rewrite` = DML rewrite
    * (ReplaceFiles): generated columns recompute, identity values keep.
    * `mergeInsert` = the rewrite is a MERGE, whose WHEN NOT MATCHED
    * inserts arrive mixed with surviving rows: any NULL identity value
    * marks an inserted row (every table-sourced row was minted non-NULL)
    * and gets assigned from the watermark under an EXCLUSIVE commit.
    * Caveat (documented Delta-divergence): a merge insert's EXPLICIT
    * identity value cannot be told apart from a surviving row's, so
    * GENERATED ALWAYS cannot refuse it here — it behaves like BY DEFAULT
    * for merge inserts only.
    */
  def plan(
      spark: SparkSession,
      layout: PjLayout,
      incoming: StructType,
      nameMap: Map[String, String],
      rewrite: Boolean,
      mergeInsert: Boolean = false): Option[Augment] = {
    val recorded = layout.dataSchema.getOrElse(return None)
    val managed = recorded.fields.filter(isManaged)
    val inNames0 = incoming.fields.map(f => fold(f.name)).toSet
    // existence-defaulted columns the incoming rows OMIT — materialized
    // below (current default or explicit NULL); see [[hasExistsDefault]]
    val missingDefaulted = recorded.fields
      .filter(f => !isManaged(f) && hasExistsDefault(f) && !inNames0.contains(fold(f.name)))
      .toSeq
    if (managed.isEmpty && missingDefaulted.isEmpty) return None
    val managedByName = managed.map(f => fold(f.name) -> f).toMap
    val inAttrs: Seq[AttributeReference] =
      incoming.fields.toSeq.map(f => AttributeReference(f.name, f.dataType, f.nullable)())
    val inNames = inNames0

    def exprFromSql(sql: String, f: StructField): Expression = {
      val parsed = spark.sessionState.sqlParser.parseExpression(sql)
      val analyzed = spark.sessionState.analyzer.execute(
        Project(Seq(Alias(parsed, f.name)()), LocalRelation(inAttrs)))
      val resolved = analyzed.asInstanceOf[Project].projectList.head
        .asInstanceOf[Alias].child
      val typed =
        if (resolved.dataType == f.dataType) resolved else Cast(resolved, f.dataType)
      BindReferences.bindReference(typed, AttributeSeq(inAttrs))
    }

    def genExpr(f: StructField): Expression =
      exprFromSql(
        f.metadata.getString(GeneratedColumn.GENERATION_EXPRESSION_METADATA_KEY), f)

    /** Fill for an OMITTED existence-defaulted column: the current
      * default's constant, or explicit NULL after DROP DEFAULT.
      */
    def defaultFillExpr(f: StructField): Expression =
      currentDefaultSql(f) match {
        case Some(sql) => exprFromSql(sql, f)
        case None => Literal(null, f.dataType)
      }

    def idExpr(f: StructField): Expression = {
      val start = f.metadata.getLong(IdentityColumn.IDENTITY_INFO_START)
      val step = f.metadata.getLong(IdentityColumn.IDENTITY_INFO_STEP)
      if (step == 0L)
        throw new PJException(s"pjparquet: identity column '${f.name}' has step 0")
      val phys = PjColumnMapping.toPhysical(nameMap, f.name)
      val base = identityBase(layout, f, phys, start, step)
      val raw: Expression =
        Add(Literal(base), Multiply(MonotonicallyIncreasingID(), Literal(step)))
      if (f.dataType == LongType) raw else Cast(raw, f.dataType)
    }

    def raise(msg: String, dt: DataType): Expression =
      Cast(new RaiseError(Literal(msg)), dt)

    var identityAssigned = false
    val presentExprs: Seq[Expression] = incoming.fields.toSeq.zipWithIndex.map {
      case (f, i) =>
        val ref: Expression = BoundReference(i, f.dataType, f.nullable)
        managedByName.get(fold(f.name)) match {
          case Some(m) if isGenerated(m) =>
            if (rewrite) genExpr(m) // SET on a base column keeps dependents fresh
            else {
              val g = genExpr(m)
              If(IsNull(ref), g,
                If(EqualNullSafe(ref, g), ref,
                  raise(s"pjparquet: provided value for generated column " +
                    s"'${m.name}' does not match its generation expression", m.dataType)))
            }
          case Some(m) if isIdentity(m) =>
            if (rewrite && !mergeInsert) ref // rows keep their identity values across rewrites
            else if (rewrite) {
              // MERGE rewrite: survivors keep their (non-NULL) values;
              // NULL marks a WHEN NOT MATCHED insert — mint it
              identityAssigned = true
              If(IsNull(ref), idExpr(m), ref)
            } else {
              identityAssigned = true
              val assign = idExpr(m)
              val allowExplicit =
                m.metadata.getBoolean(IdentityColumn.IDENTITY_INFO_ALLOW_EXPLICIT_INSERT)
              if (allowExplicit) If(IsNull(ref), assign, ref)
              else If(IsNull(ref), assign,
                raise(s"pjparquet: identity column '${m.name}' is GENERATED " +
                  "ALWAYS — explicit values are not allowed (insert NULL or " +
                  "omit the column)", m.dataType))
            }
          case _ => ref
        }
    }
    val missing = managed.filterNot(m => inNames.contains(fold(m.name))).toSeq ++
      missingDefaulted
    val missingExprs: Seq[Expression] = missing.map { m =>
      if (isGenerated(m)) genExpr(m)
      else if (isIdentity(m)) { identityAssigned = true; idExpr(m) }
      else defaultFillExpr(m)
    }
    if (missing.isEmpty && !rewrite &&
        presentExprs.forall(_.isInstanceOf[BoundReference]) && !identityAssigned)
      return None // nothing to compute (e.g. pure pass-through)
    val outSchema = StructType(incoming.fields ++
      missing.map(m => StructField(m.name, m.dataType, nullable = m.nullable, m.metadata)))
    Some(Augment(outSchema.json, presentExprs ++ missingExprs, identityAssigned))
  }
}
