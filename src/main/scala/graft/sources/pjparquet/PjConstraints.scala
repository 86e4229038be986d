package graft.sources.pjparquet

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.connector.catalog.constraints.Constraint

import graft.core.PJException

/** Write-side table constraints — Delta-invariant parity through Spark's
  * own ANSI-constraint surface (reference scope note: constraints have no
  * counterpart in the reference's index core; they are table-format
  * parity, like the commit log they live in).
  *
  * Only ENFORCED CHECK constraints are supported (NOT NULL is spelled
  * `CHECK (col IS NOT NULL)`): the log records `[{"name","sql"}]`, the
  * table reports them via `Table.constraints()`, and Spark's
  * `ResolveTableConstraints` compiles each predicate into a
  * `CheckInvariant` INSIDE every v2 write plan — so validation runs in
  * the task, codegen'd with the write projection, and a violating row
  * fails the job (and therefore the commit: nothing lands in the log)
  * with the offending expression and row values in the error. Zero
  * custom enforcement code, and the check scales with the write itself.
  * PRIMARY KEY / UNIQUE / FOREIGN KEY refuse loudly: a 100 TB engine
  * cannot enforce cross-row facts on write without a global index, and
  * recording them unenforced would be a silent lie.
  */
object PjConstraints {

  final case class Spec(name: String, sql: String)

  def parse(json: Option[String]): Seq[Spec] = json match {
    case None => Nil
    case Some(s) =>
      val node = new ObjectMapper().readTree(s)
      if (!node.isArray)
        throw new PJException(s"pjparquet: malformed constraints record: $s")
      node.elements().asScala.map { n =>
        Spec(n.path("name").asText(), n.path("sql").asText())
      }.toSeq
  }

  def render(specs: Seq[Spec]): String = {
    val mapper = new ObjectMapper()
    val arr = mapper.createArrayNode()
    specs.foreach { sp =>
      val n = mapper.createObjectNode()
      n.put("name", sp.name)
      n.put("sql", sp.sql)
      arr.add(n)
    }
    mapper.writeValueAsString(arr)
  }

  /** The v2 faces Spark's analyzer consumes ([[ResolveTableConstraints]]
    * builds one `CheckInvariant` per enforced Check).
    */
  def toV2(specs: Seq[Spec]): Array[Constraint] =
    specs.map { sp =>
      Constraint.check(sp.name).predicateSql(sp.sql).enforced(true).build()
        .asInstanceOf[Constraint]
    }.toArray

  /** A check predicate bound to write-row ordinals, shippable to tasks —
    * the STREAMING sink's enforcement path. Spark's
    * `ResolveTableConstraints` only injects `CheckInvariant` into batch
    * `V2WriteCommand` plans; the micro-batch sink plan never gets one, so
    * the epoch writer evaluates these itself with the SAME semantics
    * (violation iff the predicate is definitively FALSE; NULL passes).
    */
  final case class BoundCheck(name: String, sql: String,
      predicate: org.apache.spark.sql.catalyst.expressions.Expression)

  /** Resolve + bind every spec against the write schema (post-
    * augmentation, so predicates may reference generated columns).
    * Unresolvable predicates fail loudly at stream START, not per row.
    */
  def boundChecks(
      spark: org.apache.spark.sql.SparkSession,
      specs: Seq[Spec],
      schema: org.apache.spark.sql.types.StructType): Seq[BoundCheck] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
    if (specs.isEmpty) return Nil
    val attrs: Seq[AttributeReference] =
      schema.fields.toSeq.map(f => AttributeReference(f.name, f.dataType, f.nullable)())
    specs.map { sp =>
      val parsed =
        try spark.sessionState.sqlParser.parseExpression(sp.sql)
        catch {
          case e: org.apache.spark.sql.catalyst.parser.ParseException =>
            throw new PJException(
              s"pjparquet: CHECK constraint '${sp.name}' does not parse: ${e.getMessage}")
        }
      val analyzed =
        try spark.sessionState.analyzer.execute(
          Project(Seq(Alias(parsed, sp.name)()), LocalRelation(attrs)))
        catch {
          case e: org.apache.spark.sql.AnalysisException =>
            throw new PJException(
              s"pjparquet: CHECK constraint '${sp.name}' does not resolve against " +
                s"the write schema ${schema.simpleString}: ${e.getMessage}")
        }
      val resolved = analyzed
        .asInstanceOf[Project].projectList.head.asInstanceOf[Alias].child
      BoundCheck(sp.name, sp.sql,
        BindReferences.bindReference(resolved, AttributeSeq(attrs)))
    }
  }

  /** Wrap a task writer with per-row enforcement of `checks` — a FALSE
    * predicate fails the row's task, so the epoch aborts and commits
    * nothing (the same all-or-nothing outcome batch writes get from
    * `CheckInvariant`).
    */
  private[pjparquet] def checkingWriter(
      inner: org.apache.spark.sql.connector.write.DataWriter[
        org.apache.spark.sql.catalyst.InternalRow],
      checks: Seq[BoundCheck]): org.apache.spark.sql.connector.write.DataWriter[
        org.apache.spark.sql.catalyst.InternalRow] =
    new org.apache.spark.sql.connector.write.DataWriter[
        org.apache.spark.sql.catalyst.InternalRow] {
      private val arr = checks.toArray
      override def write(record: org.apache.spark.sql.catalyst.InternalRow): Unit = {
        var i = 0
        while (i < arr.length) {
          val v = arr(i).predicate.eval(record)
          if (v != null && v == false)
            throw new PJException(
              s"pjparquet: CHECK constraint '${arr(i).name}' (${arr(i).sql}) " +
                "violated by a streamed row — the epoch commits nothing")
          i += 1
        }
        inner.write(record)
      }
      override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage =
        inner.commit()
      override def abort(): Unit = inner.abort()
      override def close(): Unit = inner.close()
    }
}
