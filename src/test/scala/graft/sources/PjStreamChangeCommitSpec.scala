package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Change-commit admission for the streaming source: a file-listing source
  * over a table that compacts / UPDATEs mid-stream must never silently
  * re-deliver rows. Pure moves (compaction) suppress their outputs when
  * the consumed sources were delivered; row-changing commits FAIL the
  * stream (Delta's contract) unless `skipChangeCommits`; a fresh stream
  * over an already-rewritten table delivers the current state.
  */
class PjStreamChangeCommitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkdir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    java.nio.file.Files.delete(d)
    d.toString
  }

  private def freshTable(name: String): String = {
    val t = mkdir(s"pj_scc_$name")
    spark.conf.set("spark.sql.catalog.pjscc", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"CREATE TABLE pjscc.`$t` (id BIGINT, v BIGINT) USING pjparquet")
    t
  }

  private def append(t: String, ids: Range): Unit =
    ids.map(i => (i.toLong, i.toLong * 10)).toDF("id", "v").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(t)

  test("mid-stream compaction: outputs suppressed, no duplicates, appends continue") {
    val t = freshTable("compact")
    append(t, 0 until 10); append(t, 10 until 20); append(t, 20 until 30)
    val q = spark.readStream.format("pjparquet").load(t)
      .writeStream.format("memory").queryName("pj_scc_compact")
      .option("checkpointLocation", mkdir("pj_scc_ck1")).start()
    try {
      q.processAllAvailable()
      assert(spark.table("pj_scc_compact").count() == 30)
      spark.sql(s"CALL pjscc.system.compact('$t')")
      q.processAllAvailable()
      assert(spark.table("pj_scc_compact").count() == 30,
        "compacted file must not re-deliver delivered rows")
      append(t, 30 until 40)
      q.processAllAvailable()
      assert(spark.table("pj_scc_compact").count() == 40)
      assert(spark.table("pj_scc_compact").groupBy($"id").count()
        .filter($"count" > 1).count() == 0)
    } finally q.stop()
  }

  test("TRANSITIVE suppression: a rewrite consuming a suppressed file never re-delivers") {
    val t = freshTable("trans")
    append(t, 0 until 10); append(t, 10 until 20)
    val q = spark.readStream.format("pjparquet").load(t)
      .writeStream.format("memory").queryName("pj_scc_trans")
      .option("checkpointLocation", mkdir("pj_scc_ck5")).start()
    try {
      q.processAllAvailable()
      assert(spark.table("pj_scc_trans").count() == 20)
      // rewrite 1: compact f1,f2 -> f3 (pure move; f3 suppressed)
      spark.sql(s"CALL pjscc.system.compact('$t')")
      q.processAllAvailable()
      assert(spark.table("pj_scc_trans").count() == 20)
      // rewrite 2 consumes the SUPPRESSED file: zorder f3 -> f4. f3 was
      // never part of a delivered batch — only the suppressed-paths log
      // knows its rows already reached the sink; without it f4 would
      // classify as a fresh start and double every row
      graft.sources.pjparquet.PjCompaction.optimize(spark, t, Seq("id", "v"))
      q.processAllAvailable()
      assert(spark.table("pj_scc_trans").count() == 20,
        "a rewrite of a suppressed file must stay suppressed, not re-deliver")
      append(t, 20 until 25)
      q.processAllAvailable()
      assert(spark.table("pj_scc_trans").count() == 25)
      assert(spark.table("pj_scc_trans").groupBy($"id").count()
        .filter($"count" > 1).count() == 0)
    } finally q.stop()
  }

  test("suppression survives a RESTART: replay rebuilds delivered-by-proxy knowledge") {
    val t = freshTable("restart")
    append(t, 0 until 10); append(t, 10 until 20)
    val ck = mkdir("pj_scc_ck6")
    val out = java.nio.file.Files.createTempDirectory("pj_scc_out6").toString
    // memory sinks can't recover a checkpoint; the restart is the point
    def runOnce(): Unit = {
      val q = spark.readStream.format("pjparquet").load(t)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck).outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      assert(!q.isActive)
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 20)
    // rewrite 1 between runs: this run's poll suppresses AND persists
    spark.sql(s"CALL pjscc.system.compact('$t')")
    runOnce()
    assert(spark.read.parquet(out).count() == 20)
    // rewrite 2 between runs consumes the SUPPRESSED file — the restart
    // must replay it as delivered, or the rows double here
    graft.sources.pjparquet.PjCompaction.optimize(spark, t, Seq("id", "v"))
    runOnce()
    assert(spark.read.parquet(out).count() == 20,
      "restart must replay suppressed paths as delivered — zero re-delivery")
    append(t, 20 until 30)
    runOnce()
    assert(spark.read.parquet(out).count() == 30)
    assert(spark.read.parquet(out).groupBy($"id").count()
      .filter($"count" > 1).count() == 0)
  }

  test("fresh stream over an already-compacted/updated table delivers current state") {
    val t = freshTable("fresh")
    append(t, 0 until 10); append(t, 10 until 20)
    spark.sql(s"CALL pjscc.system.compact('$t')")
    spark.sql(s"UPDATE pjscc.`$t` SET v = -1 WHERE id = 5")
    val q = spark.readStream.format("pjparquet").load(t)
      .writeStream.format("memory").queryName("pj_scc_fresh")
      .option("checkpointLocation", mkdir("pj_scc_ck2")).start()
    try {
      q.processAllAvailable()
      val got = spark.table("pj_scc_fresh")
      assert(got.count() == 20)
      assert(got.filter($"id" === 5).select($"v").head().getLong(0) == -1L)
    } finally q.stop()
  }

  test("mid-stream UPDATE fails the stream with the change-commit contract") {
    val t = freshTable("update")
    // deletion vectors off -> the UPDATE is a copy-on-write rewrite
    spark.sql(s"ALTER TABLE pjscc.`$t` SET TBLPROPERTIES " +
      "('pj.deletionVectors.enabled'='false')")
    append(t, 0 until 10)
    val q = spark.readStream.format("pjparquet").load(t)
      .writeStream.format("memory").queryName("pj_scc_upd")
      .option("checkpointLocation", mkdir("pj_scc_ck3")).start()
    try {
      q.processAllAvailable()
      assert(spark.table("pj_scc_upd").count() == 10)
      spark.sql(s"UPDATE pjscc.`$t` SET v = -1 WHERE id < 3")
      val e = intercept[Exception] { q.processAllAvailable() }
      def msgs(x: Throwable): Seq[String] =
        if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
      assert(msgs(e).exists(_.contains("skipChangeCommits")),
        s"got: ${msgs(e).mkString(" | ")}")
    } finally q.stop()
  }

  test("skipChangeCommits streams past the rewrite without re-delivery") {
    val t = freshTable("skip")
    spark.sql(s"ALTER TABLE pjscc.`$t` SET TBLPROPERTIES " +
      "('pj.deletionVectors.enabled'='false')")
    append(t, 0 until 10)
    val q = spark.readStream.format("pjparquet")
      .option("skipChangeCommits", "true").load(t)
      .writeStream.format("memory").queryName("pj_scc_skip")
      .option("checkpointLocation", mkdir("pj_scc_ck4")).start()
    try {
      q.processAllAvailable()
      assert(spark.table("pj_scc_skip").count() == 10)
      spark.sql(s"UPDATE pjscc.`$t` SET v = -1 WHERE id < 3")
      q.processAllAvailable()
      assert(spark.table("pj_scc_skip").count() == 10,
        "rewritten rows must be skipped, not re-delivered")
      append(t, 10 until 15)
      q.processAllAvailable()
      assert(spark.table("pj_scc_skip").count() == 15)
    } finally q.stop()
  }
}
