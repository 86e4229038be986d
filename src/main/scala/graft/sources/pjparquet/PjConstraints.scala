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
}
