package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.PjCommitLog

/** Post-append auto-compaction (`pj.autoCompact.enabled`, Delta parity):
  * a steady stream of small appends self-heals once a directory reaches
  * `pj.autoCompact.minFiles`, without a maintenance window; disabled or
  * unset tables never compact on their own.
  */
class PjAutoCompactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def liveFiles(t: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(t)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    PjCommitLog.latest(fs, root).get.files
  }

  private def append(t: String, id: Long): Unit =
    Seq((id, id * 10)).toDF("id", "v").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(t)

  test("appends self-heal at minFiles; data exact; below the bar nothing moves") {
    val dir = java.nio.file.Files.createTempDirectory("pj_autoc")
    java.nio.file.Files.delete(dir)
    val t = dir.toString
    spark.conf.set("spark.sql.catalog.pjac", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"CREATE TABLE pjac.`$t` (id BIGINT, v BIGINT) USING pjparquet " +
      "TBLPROPERTIES ('pj.autoCompact.enabled'='true', 'pj.autoCompact.minFiles'='3')")
    append(t, 1); append(t, 2)
    assert(liveFiles(t).size == 2, "below minFiles nothing compacts")
    append(t, 3)
    assert(liveFiles(t).size == 1, s"third append must arm compaction: ${liveFiles(t)}")
    val rows = spark.table(s"pjac.`$t`").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 10L, 2L -> 20L, 3L -> 30L))
    // the stream keeps healing: the compacted survivor is itself small,
    // so one more append stays below the bar and the next re-arms
    append(t, 4)
    assert(liveFiles(t).size == 2)
    append(t, 5)
    assert(liveFiles(t).size == 1, "compacted survivor + 2 appends re-arm")
    append(t, 6)
    assert(liveFiles(t).size == 2)
    assert(spark.table(s"pjac.`$t`").count() == 6)
    assert(spark.table(s"pjac.`$t`").agg(sum($"v")).head().getLong(0) == 210L)
  }

  test("racing appenders + concurrent DV DELETE: every append lands, the delete is never undone") {
    val dir = java.nio.file.Files.createTempDirectory("pj_autoc_race")
    java.nio.file.Files.delete(dir)
    val t = dir.toString
    spark.conf.set("spark.sql.catalog.pjac", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"CREATE TABLE pjac.`$t` (id BIGINT, v BIGINT) USING pjparquet " +
      "TBLPROPERTIES ('pj.autoCompact.enabled'='true', 'pj.autoCompact.minFiles'='3')")
    // seed rows the DELETE will target, before the race starts
    append(t, 1); append(t, 2); append(t, 3)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def appender(ids: Seq[Long]): Thread = {
      val th = new Thread(() =>
        try ids.foreach(append(t, _))
        catch { case e: Throwable => failures.add(e) })
      th.start(); th
    }
    // two racing appenders, each arming auto-compaction on its own commits
    val a = appender(10L to 15L)
    val b = appender(20L to 25L)
    // a concurrent DV DELETE: retries on optimistic-concurrency conflicts
    // (busy unpartitioned table), but once landed it must STAY landed —
    // no auto-compaction racing it may resurrect the row
    var deleted = false
    var tries = 0
    while (!deleted && tries < 200) {
      tries += 1
      try { spark.sql(s"DELETE FROM pjac.`$t` WHERE id = 2"); deleted = true }
      catch {
        case e: Exception if Option(e.getMessage).exists(_.contains("version conflict")) =>
          Thread.sleep(5)
      }
    }
    a.join(120000); b.join(120000)
    assert(failures.isEmpty, s"an append failed: ${failures.peek()}")
    assert(deleted, "the DELETE never landed")
    val rows = spark.table(s"pjac.`$t`").select("id").collect().map(_.getLong(0)).sorted
    val expected = (Seq(1L, 3L) ++ (10L to 15L) ++ (20L to 25L)).sorted
    assert(rows.toSeq == expected,
      s"every append lands exactly once and the deleted row stays deleted: ${rows.toSeq}")
  }

  test("without the property (or after UNSET) appends never self-compact") {
    val dir = java.nio.file.Files.createTempDirectory("pj_autoc_off")
    java.nio.file.Files.delete(dir)
    val t = dir.toString
    spark.conf.set("spark.sql.catalog.pjac", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"CREATE TABLE pjac.`$t` (id BIGINT, v BIGINT) USING pjparquet")
    (1L to 5L).foreach(append(t, _))
    assert(liveFiles(t).size == 5)
    // arm, heal, then UNSET: the stream stops healing
    spark.sql(s"ALTER TABLE pjac.`$t` SET TBLPROPERTIES " +
      "('pj.autoCompact.enabled'='true', 'pj.autoCompact.minFiles'='3')")
    append(t, 6)
    assert(liveFiles(t).size == 1)
    spark.sql(s"ALTER TABLE pjac.`$t` UNSET TBLPROPERTIES ('pj.autoCompact.enabled')")
    (7L to 9L).foreach(append(t, _))
    assert(liveFiles(t).size == 4, "UNSET must stop auto-compaction")
    assert(spark.table(s"pjac.`$t`").agg(sum($"id")).head().getLong(0) == (1L to 9L).sum)
  }
}
