package graft.sources

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** SQL `CALL` maintenance procedures (Spark 4 ProcedureCatalog): the
  * whole janitor/maintenance surface scriptable from pure SQL.
  */
class PjProceduresSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.pjproc", "graft.sources.pjparquet.PjCatalog")
    s
  }

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"pj_proc_$tag").toString

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  test("history, checkpoint, compact, expire, vacuum round-trip through CALL") {
    import spark.implicits._
    val dir = tempDir("life")
    for (i <- 0 until 3)
      Seq((i.toLong, s"v$i")).toDF("id", "s").coalesce(1)
        .write.format("pjparquet").mode("append")
        .option("log.enabled", "true").save(dir) // v1..v3, three small files
    // history: one row per version, versioned ascending, real timestamps
    val hist = spark.sql(s"CALL pjproc.system.history('$dir')").collect()
    assert(hist.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(hist.forall(_.getTimestamp(1).getTime > 0L))
    assert(hist.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L)) // live file counts
    // checkpoint at HEAD (named-argument syntax)
    val ck = spark.sql(s"CALL pjproc.system.checkpoint(table => '$dir')").collect()
    assert(ck.head.getLong(0) == 3L)
    assert(fsOf(dir).exists(
      new Path(dir, f"_pj_log/${3L}%020d.checkpoint.json")))
    // compact the three small files into one (logged commit v4)
    val comp = spark.sql(s"CALL pjproc.system.compact('$dir')").collect().head
    assert(comp.getLong(1) == 3L && comp.getLong(2) == 1L,
      s"expected 3 small files -> 1, got $comp")
    assert(spark.read.format("pjparquet").load(dir).count() == 3L)
    // expire to the newest version only; retired bytes reclaimed
    val exp = spark.sql(
      s"CALL pjproc.system.expire_versions('$dir', 1)").collect().head
    assert(exp.getLong(0) == 3L && exp.getLong(1) == 1L && exp.getLong(2) >= 3L,
      s"expected 3 dropped / 1 kept / >=3 files reclaimed, got $exp")
    assert(spark.read.format("pjparquet").load(dir).count() == 3L)
    // vacuum: nothing left to sweep
    val vac = spark.sql(s"CALL pjproc.system.vacuum('$dir')").collect().head
    assert(vac.getLong(0) == 0L && vac.getLong(1) == 0L)
  }

  test("detail: one head-snapshot row incl. deletion-vector facts, zero file opens") {
    import spark.implicits._
    val dir = tempDir("detail")
    spark.range(0, 100)
      .select($"id", org.apache.spark.sql.functions.lit("d").as("s")).coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir) // v1
    spark.sql(s"DROP TABLE IF EXISTS pj_proc_detail")
    spark.sql(s"CREATE TABLE pj_proc_detail USING pjparquet OPTIONS (path '$dir')")
    spark.sql("DELETE FROM pj_proc_detail WHERE id < 10") // v2: vector
    val d = spark.sql(s"CALL pjproc.system.detail('$dir')").collect().head
    assert(d.getLong(0) == 2L) // version
    assert(d.getLong(2) == 1L) // n_files
    assert(d.getLong(4) == 100L && d.getLong(5) == 90L) // total vs live rows
    assert(d.getLong(6) == 1L && d.getLong(7) == 10L) // dv files, deleted rows
    assert(d.getString(8).contains("\"id\"")) // recorded schema rides along
  }

  test("dedup procedure: in-place key dedup via vectors, SQL-scriptable") {
    import spark.implicits._
    val dir = tempDir("dedup")
    spark.range(0, 60).select(($"id" % 20).as("k"), $"id".as("p")).coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir)
    val r = spark.sql(
      s"CALL pjproc.system.dedup(table => '$dir', keys => 'k')").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 40L, s"got $r")
    assert(spark.read.format("pjparquet").load(dir).count() == 20L)
    // rerun: nothing removed, null version (no commit)
    val r2 = spark.sql(s"CALL pjproc.system.dedup('$dir', 'k')").collect().head
    assert(r2.isNullAt(0) && r2.getLong(1) == 0L)
  }

  test("build_index and build_blooms fleet builds over a plain directory") {
    import spark.implicits._
    val dir = tempDir("fleet")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1)
      .write.mode("append").parquet(dir) // stock parquet, no sidecars
    val idx = spark.sql(s"CALL pjproc.system.build_index('$dir')").collect().head
    assert(idx.getLong(0) == 1L)
    val blooms = spark.sql(
      s"CALL pjproc.system.build_blooms('$dir', 'id')").collect().head
    assert(blooms.getLong(0) == 1L)
    assert(spark.read.format("pjparquet").load(dir).count() == 2L)
  }

  test("restore_to_timestamp: in-commit timestamps resolve the version, then the ordinary restore") {
    val dir = java.nio.file.Files.createTempDirectory("pj_proc_rts").toString
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "v").write.format("pjparquet")
      .mode("append").option("log.enabled", "true").save(dir) // v1
    Seq((2L, "b")).toDF("id", "v").write.format("pjparquet")
      .mode("append").save(dir) // v2
    Seq((3L, "c")).toDF("id", "v").write.format("pjparquet")
      .mode("append").save(dir) // v3
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val tsOfV2 = graft.sources.pjparquet.PjCommitLog.history(fs, root)
      .find(_.version == 2L).get.ts
    val r = spark.sql(
      s"CALL pjproc.system.restore_to_timestamp('$dir', '$tsOfV2')").head()
    assert(r.getLong(0) == 2L, s"ts of v2 must resolve to v2: $r")
    assert(spark.read.format("pjparquet").load(dir)
      .select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L),
      "HEAD must be the v2 content")
    // a pre-table timestamp refuses like SQL time travel does
    val e = intercept[Exception](spark.sql(
      s"CALL pjproc.system.restore_to_timestamp('$dir', '5')").head())
    assert(e.getMessage.toLowerCase.contains("before") ||
      e.getMessage.toLowerCase.contains("no version"), s"got: ${e.getMessage}")
  }

  test("unknown procedures and namespaces fail loudly; SHOW PROCEDURES lists them") {
    val e = intercept[Exception] {
      spark.sql("CALL pjproc.system.nope('x')").collect()
    }
    assert(e.getMessage.contains("unknown procedure") ||
      e.getMessage.toLowerCase.contains("nope"), s"got: ${e.getMessage}")
    val listed = spark.sql("SHOW PROCEDURES IN pjproc.system").collect()
      .map(_.toString).mkString(",")
    assert(listed.contains("vacuum") && listed.contains("optimize_zorder"),
      s"got: $listed")
  }
}
