package org.apache.spark.sql.execution.datasources.parquet

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Analyzer rule: rewrite stock parquet `LogicalRelation`s into `pjparquet`
  * DSv2 relations when every input file already has a `.index` sidecar
  * (SURVEY.md §7 "possible later nicety"). Running at analysis time means
  * the normal V2 pushdown batch (column pruning + filter pushdown) still
  * applies to the substituted scan.
  *
  * Conservative by design: fires only for non-streaming, catalog-less, flat
  * single-root parquet relations whose index-derived schema matches the
  * resolved one exactly; anything else is left untouched. Original output
  * attribute ids are preserved via an aliasing projection.
  */
class PjAutoSubstituteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def eligibleTable(rel: HadoopFsRelation): Option[graft.sources.pjparquet.PjParquetTable] = {
    if (!rel.fileFormat.isInstanceOf[ParquetFileFormat]) return None
    val roots = rel.location.rootPaths
    if (roots.size != 1) return None
    try {
      val conf = spark.sessionState.newHadoopConf()
      // autogen=false: substitute only when sidecars actually exist
      val layout = graft.sources.pjparquet.PjParquetTable.resolveFiles(
        roots.head.toString, conf, autogen = false)
      val table = new graft.sources.pjparquet.PjParquetTable(
        layout, new CaseInsensitiveStringMap(java.util.Map.of("path", roots.head.toString)))
      val tSchema = table.schema
      val rSchema = rel.schema
      val same = tSchema.length == rSchema.length &&
        tSchema.fields.zip(rSchema.fields).forall { case (a, b) =>
          a.name == b.name && a.dataType == b.dataType
        }
      if (same) Some(table) else None
    } catch {
      // absence of sidecars is the normal negative case — stay silent; a
      // corrupt or stale sidecar means the user EXPECTS index planning and
      // is silently not getting it, so say so
      case _: graft.sources.pjparquet.PjMissingSidecarException => None
      case e: graft.core.PJException =>
        logWarning(s"pjparquet auto-substitute disabled for '${roots.head}': ${e.getMessage}")
        None
      case _: Exception => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case lr: LogicalRelation
        if !lr.isStreaming && lr.catalogTable.isEmpty &&
          lr.relation.isInstanceOf[HadoopFsRelation] =>
      eligibleTable(lr.relation.asInstanceOf[HadoopFsRelation]) match {
        case Some(table) =>
          val v2 = DataSourceV2Relation.create(table, None, None)
          val byName = v2.output.map(a => a.name -> a).toMap
          if (lr.output.forall(o => byName.contains(o.name))) {
            val projection: Seq[NamedExpression] = lr.output.map { o =>
              Alias(byName(o.name), o.name)(exprId = o.exprId, qualifier = o.qualifier)
            }
            Project(projection, v2)
          } else lr
        case None => lr
      }
  }
}

/** `spark.sql.extensions=org.apache.spark.sql.execution.datasources.parquet.PjSparkExtensions`
  * (or `builder.withExtensions(new PjSparkExtensions)`).
  */
class PjSparkExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectResolutionRule(spark => new PjAutoSubstituteRule(spark))
}
