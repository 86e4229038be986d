package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.PJException
import graft.sources.pjparquet.{PjCommitLog, PjRestore, PjVacuum}

/** [[PjRestore]]: RESTORE TO VERSION AS OF as one metadata commit —
  * DV rollback, schema rollback, no-op and expired-version edges, and
  * restore-of-restore (undo).
  */
class PjRestoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"pj_restore_$tag").toString

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def append(dir: String, from: Long, n: Long): Unit =
    spark.range(from, from + n).select($"id", ($"id" * 2).as("v")).coalesce(1)
      .write.format("pjparquet").mode("append").option("log.enabled", "true").save(dir)

  private def ids(dir: String, version: Option[Long] = None): Seq[Long] = {
    val r = spark.read.format("pjparquet")
    version.foreach(v => r.option("versionAsOf", v.toString))
    r.load(dir).select($"id").as[Long].collect().sorted.toSeq
  }

  test("restore turns HEAD into the target snapshot; history and time travel preserved") {
    val dir = tempDir("basic")
    append(dir, 0, 10) // v1
    append(dir, 10, 10) // v2
    append(dir, 20, 10) // v3
    val rep = PjRestore.restore(spark, dir, 2L)
    assert(rep == PjRestore.RestoreReport(2L, Some(4L), 0L, 1L))
    assert(ids(dir) == (0L until 20L))
    assert(ids(dir, Some(2L)) == (0L until 20L))
    assert(ids(dir, Some(3L)) == (0L until 30L), "time travel past the restore intact")
    val hist = PjCommitLog.history(fsOf(dir), new Path(dir))
    assert(hist.exists(h => h.version == 4L && h.action == "restore"))
    // undo: restore to v3 brings the retired file back — nothing was deleted
    val undo = PjRestore.restore(spark, dir, 3L)
    assert(undo.committed.contains(5L) && undo.filesAdded == 1L)
    assert(ids(dir) == (0L until 30L))
  }

  test("restore across a DV DELETE resurrects rows by re-pointing the entry") {
    val dir = tempDir("dv")
    append(dir, 0, 20) // v1
    spark.sql("DROP TABLE IF EXISTS pj_restore_dv")
    spark.sql(s"CREATE TABLE pj_restore_dv USING pjparquet OPTIONS (path '$dir')")
    spark.sql("DELETE FROM pj_restore_dv WHERE id < 5") // v2: deletion vector
    assert(ids(dir) == (5L until 20L))
    val headBefore = PjCommitLog.latest(fsOf(dir), new Path(dir)).get
    assert(headBefore.entries.exists(_.dv.isDefined))
    val rep = PjRestore.restore(spark, dir, 1L)
    assert(rep.committed.contains(3L) && rep.filesAdded == 1L && rep.filesRemoved == 0L)
    assert(ids(dir) == (0L until 20L), "deleted rows resurrect")
    val head = PjCommitLog.latest(fsOf(dir), new Path(dir)).get
    assert(head.entries.forall(_.dv.isEmpty), "restored entry carries no vector")
    spark.sql("DROP TABLE IF EXISTS pj_restore_dv")
  }

  test("restore rolls the recorded schema back across DROP COLUMN") {
    val dir = tempDir("schema")
    spark.range(0, 5).select($"id", lit("x").as("s")).coalesce(1)
      .write.format("pjparquet").mode("append").option("log.enabled", "true").save(dir) // v1
    spark.conf.set("spark.sql.catalog.pj_restore_sc", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"ALTER TABLE pj_restore_sc.`$dir` DROP COLUMN s") // v2: metadata-only
    assert(spark.read.format("pjparquet").load(dir).columns.toSeq == Seq("id"))
    val rep = PjRestore.restore(spark, dir, 1L)
    assert(rep.committed.contains(3L))
    assert(spark.read.format("pjparquet").load(dir).columns.toSeq == Seq("id", "s"),
      "dropped column returns with the restored schema")
  }

  test("no-op edges: restore to head returns None; future/expired versions fail loudly") {
    val dir = tempDir("edges")
    append(dir, 0, 5) // v1
    append(dir, 5, 5) // v2
    assert(PjRestore.restore(spark, dir, 2L) == PjRestore.RestoreReport(2L, None, 0L, 0L))
    val eFuture = intercept[PJException](PjRestore.restore(spark, dir, 9L))
    assert(eFuture.getMessage.contains("head is 2"))
    // expire v1, then restoring to it must fail with the available range
    append(dir, 10, 5) // v3
    PjVacuum.expireVersions(spark, dir, keepVersions = 1)
    val eExpired = intercept[PJException](PjRestore.restore(spark, dir, 1L))
    assert(eExpired.getMessage.contains("version 1 does not exist"))
    val eNoLog = intercept[PJException](
      PjRestore.restore(spark, tempDir("nolog"), 1L))
    assert(eNoLog.getMessage.contains("no commit log"))
  }
}
