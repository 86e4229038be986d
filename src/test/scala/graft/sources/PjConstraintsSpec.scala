package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.PJException
import graft.sources.pjparquet.{PjCommitLog, PjParquetTable}

/** Write-side CHECK constraints ([[graft.sources.pjparquet.PjConstraints]]):
  * recorded in the log, enforced task-side by Spark's own CheckInvariant
  * inside every v2 write, validated against existing rows at ADD time,
  * surviving checkpoint replay, dropped on demand.
  */
class PjConstraintsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"pj_constraints_$tag").toString

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  spark.conf.set("spark.sql.catalog.pjc", "graft.sources.pjparquet.PjCatalog")

  test("violating append fails in the task with the expression; clean append lands") {
    val dir = tempDir("enforce")
    Seq((1L, 10L), (2L, 20L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append").option("log.enabled", "true").save(dir)
    spark.sql(s"ALTER TABLE pjc.`$dir` ADD CONSTRAINT x_positive CHECK (x > 0)")
    val head = PjCommitLog.latest(fsOf(dir), new Path(dir)).get
    assert(head.action == "alter-constraint" && head.constraintsJson.isDefined)
    // violating append: the job fails, and NOTHING lands in the log
    val e = intercept[Exception] {
      Seq((3L, -5L)).toDF("id", "x").coalesce(1)
        .write.format("pjparquet").mode("append").save(dir)
    }
    val msg = Option(e.getMessage).getOrElse("") + Option(e.getCause).map(_.toString).getOrElse("")
    assert(msg.toLowerCase.contains("x_positive") || msg.contains("x > 0"),
      s"error must name the constraint/expression, got: $msg")
    assert(PjCommitLog.latest(fsOf(dir), new Path(dir)).get.version == head.version,
      "failed write must not commit")
    assert(spark.read.format("pjparquet").load(dir).count() == 2L)
    // clean append lands
    Seq((3L, 30L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append").save(dir)
    assert(spark.read.format("pjparquet").load(dir).count() == 3L)
  }

  test("NOT NULL is spelled CHECK (col IS NOT NULL) and rejects null writes") {
    val dir = tempDir("notnull")
    Seq((1L, "a")).toDF("id", "s").coalesce(1)
      .write.format("pjparquet").mode("append").option("log.enabled", "true").save(dir)
    spark.sql(s"ALTER TABLE pjc.`$dir` ADD CONSTRAINT s_not_null CHECK (s IS NOT NULL)")
    intercept[Exception] {
      Seq((2L, null: String)).toDF("id", "s").coalesce(1)
        .write.format("pjparquet").mode("append").save(dir)
    }
    assert(spark.read.format("pjparquet").load(dir).count() == 1L)
    Seq((2L, "b")).toDF("id", "s").coalesce(1)
      .write.format("pjparquet").mode("append").save(dir)
    assert(spark.read.format("pjparquet").load(dir).count() == 2L)
  }

  test("NULL predicate results PASS at both ADD time and write time (ANSI CHECK)") {
    // Spark's write-time CheckInvariant throws only on FALSE — a NULL
    // result admits the row. ADD-time validation must use the SAME
    // semantics or a write-admitted row would refuse a later identical
    // ADD CONSTRAINT.
    val dir = tempDir("nullpass")
    Seq((1L, Some(10L)), (2L, Option.empty[Long])).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append").option("log.enabled", "true").save(dir)
    // row 2 evaluates (x > 0) to NULL — ADD must accept both rows
    spark.sql(s"ALTER TABLE pjc.`$dir` ADD CONSTRAINT xp CHECK (x > 0)")
    // write-time: a NULL x passes, a non-positive x refuses
    Seq((3L, Option.empty[Long])).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append").save(dir)
    assert(spark.read.format("pjparquet").load(dir).count() == 3L)
    intercept[Exception] {
      Seq((4L, Some(-1L))).toDF("id", "x").coalesce(1)
        .write.format("pjparquet").mode("append").save(dir)
    }
    assert(spark.read.format("pjparquet").load(dir).count() == 3L)
  }

  test("ADD validates existing rows; unresolvable predicates and dup names refuse") {
    val dir = tempDir("validate")
    Seq((1L, 10L), (2L, -20L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append").option("log.enabled", "true").save(dir)
    val e1 = intercept[Exception](
      spark.sql(s"ALTER TABLE pjc.`$dir` ADD CONSTRAINT xp CHECK (x > 0)"))
    assert(e1.getMessage.contains("violate") || e1.getMessage.contains("DATA"),
      s"existing-violation must refuse, got: ${e1.getMessage}")
    val e2 = intercept[Exception](
      spark.sql(s"ALTER TABLE pjc.`$dir` ADD CONSTRAINT bad CHECK (no_such_col > 0)"))
    assert(e2.getMessage.toLowerCase.contains("no_such_col"))
    spark.sql(s"ALTER TABLE pjc.`$dir` ADD CONSTRAINT xr CHECK (x > -100)")
    val e3 = intercept[Exception](
      spark.sql(s"ALTER TABLE pjc.`$dir` ADD CONSTRAINT xr CHECK (x > -50)"))
    assert(e3.getMessage.contains("xr"))
  }

  test("DROP CONSTRAINT lifts enforcement; missing name refuses unless IF EXISTS") {
    val dir = tempDir("drop")
    Seq((1L, 10L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append").option("log.enabled", "true").save(dir)
    spark.sql(s"ALTER TABLE pjc.`$dir` ADD CONSTRAINT xp CHECK (x > 0)")
    spark.sql(s"ALTER TABLE pjc.`$dir` DROP CONSTRAINT xp")
    Seq((2L, -7L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append").save(dir) // now legal
    assert(spark.read.format("pjparquet").load(dir).count() == 2L)
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE pjc.`$dir` DROP CONSTRAINT nope"))
    assert(e.getMessage.contains("nope"))
    spark.sql(s"ALTER TABLE pjc.`$dir` DROP CONSTRAINT IF EXISTS nope") // no-op
  }

  test("constraints survive checkpoint replay and roll back with RESTORE") {
    val dir = tempDir("ckpt")
    Seq((1L, 10L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append").option("log.enabled", "true").save(dir) // v1
    spark.sql(s"ALTER TABLE pjc.`$dir` ADD CONSTRAINT xp CHECK (x > 0)") // v2
    // force a checkpoint and drop the delta files: replay must come from it
    PjCommitLog.writeCheckpoint(fsOf(dir), new Path(dir), 2L, entryFormat = Some(true))
    for (v <- 1L to 2L)
      fsOf(dir).delete(new Path(PjCommitLog.logDir(new Path(dir)), f"$v%020d.json"), false)
    PjCommitLog.clearSnapshotCache()
    PjParquetTable.clearLayoutCache()
    assert(PjCommitLog.latest(fsOf(dir), new Path(dir)).get.constraintsJson.isDefined)
    intercept[Exception] {
      Seq((9L, -1L)).toDF("id", "x").coalesce(1)
        .write.format("pjparquet").mode("append").save(dir)
    }
    // RESTORE to v... constraint added at v2; restore to the checkpoint
    // version itself is a no-op, so append v3 then restore to 2 keeps it,
    // while a table restored to a pre-constraint version loses it
    val dir2 = tempDir("restore")
    Seq((1L, 10L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append").option("log.enabled", "true").save(dir2) // v1
    spark.sql(s"ALTER TABLE pjc.`$dir2` ADD CONSTRAINT xp CHECK (x > 0)") // v2
    graft.sources.pjparquet.PjRestore.restore(spark, dir2, 1L) // v3: constraint gone
    assert(PjConstraintsSpecHelper.noConstraints(
      PjCommitLog.latest(fsOf(dir2), new Path(dir2)).get.constraintsJson))
    Seq((2L, -5L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append").save(dir2) // legal again
    assert(spark.read.format("pjparquet").load(dir2).count() == 2L)
  }

  test("PRIMARY KEY / UNIQUE refuse loudly; non-logged tables refuse") {
    val dir = tempDir("refuse")
    Seq((1L, 10L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append").option("log.enabled", "true").save(dir)
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE pjc.`$dir` ADD CONSTRAINT pk PRIMARY KEY (id)"))
    assert(e.getMessage.contains("CHECK") || e.getMessage.toLowerCase.contains("primary"),
      s"got: ${e.getMessage}")
  }
}

private object PjConstraintsSpecHelper {
  def noConstraints(json: Option[String]): Boolean =
    graft.sources.pjparquet.PjConstraints.parse(json).isEmpty
}
