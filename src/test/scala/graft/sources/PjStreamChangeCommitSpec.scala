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
