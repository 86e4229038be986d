package graft.sources

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.PJException
import graft.sources.pjparquet.{PjAnalyze, PjCommitLog}

/** ANALYZE table statistics ([[graft.sources.pjparquet.PjAnalyze]]):
  * one-pass computation, the `tableStats` log lane (metadata-only
  * commit, checkpoint replay, RESTORE rollback), and CBO visibility —
  * the scan's `columnStats()` landing in the optimized plan's
  * `attributeStats`.
  */
class PjAnalyzeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.pja", "graft.sources.pjparquet.PjCatalog")

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"pj_analyze_$tag").toString
  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def mkTable(tag: String): String = {
    val dir = tempDir(tag)
    (1 to 200).map { i =>
      (i.toLong, s"cat_${i % 7}", if (i % 10 == 0) null else s"name_$i",
        i * 1.5, java.sql.Date.valueOf(f"2024-01-${i % 28 + 1}%02d"))
    }.toDF("id", "cat", "name", "score", "d").coalesce(2)
      .write.format("pjparquet").mode("append").option("log.enabled", "true").save(dir)
    dir
  }

  test("analyze computes exact facts for low-cardinality columns in one commit") {
    val dir = mkTable("facts")
    val v0 = PjCommitLog.latest(fsOf(dir), new Path(dir)).get.version
    val ts = PjAnalyze.analyze(spark, dir)
    assert(ts.rows == 200L)
    val cat = ts.cols("cat")
    assert(cat.ndv == 7L, s"HLL on 7 distinct should be exact, got ${cat.ndv}")
    assert(cat.nulls == 0L)
    assert(cat.maxLen == 5L && cat.avgLen == 5L) // "cat_0".."cat_6"
    val name = ts.cols("name")
    assert(name.nulls == 20L)
    val id = ts.cols("id")
    assert(id.min.contains("1") && id.max.contains("200"))
    val d = ts.cols("d")
    assert(d.min.contains("2024-01-01") && d.max.contains("2024-01-28"))
    val head = PjCommitLog.latest(fsOf(dir), new Path(dir)).get
    assert(head.version == v0 + 1 && head.action == "analyze")
    assert(head.entries.map(_.path) ==
      PjCommitLog.read(fsOf(dir), new Path(dir), v0).entries.map(_.path),
      "analyze must be metadata-only")
  }

  test("recorded stats survive checkpoint replay and roll back under RESTORE") {
    val dir = mkTable("ckpt")
    PjAnalyze.analyze(spark, dir, Seq("id", "cat"))
    // force a checkpoint beyond the analyze commit, then more commits
    val fs = fsOf(dir)
    (1 to 10).foreach { i =>
      Seq((1000L + i, "cat_x", "n", 0.0, java.sql.Date.valueOf("2024-02-01")))
        .toDF("id", "cat", "name", "score", "d")
        .write.format("pjparquet").mode("append").save(dir)
    }
    PjCommitLog.clearSnapshotCache()
    val head = PjCommitLog.latest(fs, new Path(dir)).get
    val ts = PjAnalyze.parse(head.tableStatsJson).get
    assert(ts.cols.keySet == Set("id", "cat"), "stats lost through checkpoint replay")
    // RESTORE to the pre-analyze version drops the stats
    spark.sql(s"CALL pja.system.restore('$dir', 1)")
    PjCommitLog.clearSnapshotCache()
    val restored = PjCommitLog.latest(fs, new Path(dir)).get
    assert(PjAnalyze.parse(restored.tableStatsJson).isEmpty,
      "RESTORE to v1 must roll the stats lane back")
  }

  test("scan serves columnStats: optimized plan carries attributeStats") {
    val dir = mkTable("cbo")
    spark.sql(s"CALL pja.system.analyze(table => '$dir')")
    val df = spark.read.format("pjparquet").load(dir).select($"id", $"cat")
    val leaf = df.queryExecution.optimizedPlan.collectLeaves().head
    val attrStats = leaf.stats.attributeStats
    assert(attrStats.nonEmpty, "no attributeStats on the V2 scan relation")
    val byName = attrStats.map { case (a, st) => a.name -> st }
    assert(byName("cat").distinctCount.exists(_.toLong == 7L))
    assert(byName("id").distinctCount.exists(_.toLong >= 190L))
    assert(byName("id").min.contains(1L) && byName("id").max.contains(200L))
    assert(leaf.stats.rowCount.exists(_.toLong == 200L))
  }

  test("equi-height histograms: recorded when enabled, served to the estimator, " +
      "and a skewed filter's row estimate collapses from uniform to real mass") {
    val dir = tempDir("hist")
    // skew: 99% zeros, 1% spread over (500, 1000]
    (1 to 2000).map(i =>
      (i.toLong, if (i % 100 == 0) 500L + (i % 500) + 1L else 0L))
      .toDF("id", "sk").coalesce(2)
      .write.format("pjparquet").mode("append").option("log.enabled", "true").save(dir)
    // ANALYZE without histograms first: uniform min/max selectivity
    spark.sql(s"CALL pja.system.analyze(table => '$dir')")
    def estRows(s: org.apache.spark.sql.SparkSession): BigInt = {
      s.conf.set("spark.sql.cbo.enabled", "true")
      // plan stats read SQLConf from the ACTIVE session thread-local
      val prev = org.apache.spark.sql.SparkSession.getActiveSession
      org.apache.spark.sql.SparkSession.setActiveSession(s)
      try {
        val df = s.read.format("pjparquet").load(dir)
          .filter(org.apache.spark.sql.functions.col("sk") > 500L)
        df.queryExecution.optimizedPlan.stats.rowCount.getOrElse(BigInt(-1))
      } finally prev.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
    }
    val uniformEst = estRows(spark.newSession())
    // uniform assumption over [0, 1000]: sk > 500 estimates ~half the rows
    assert(uniformEst > 500, s"uniform estimate should be large, got $uniformEst")
    // re-ANALYZE with histograms on
    spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
    try {
      val ts = PjAnalyze.analyze(spark, dir)
      val h = ts.cols("sk").hist.getOrElse(fail("no histogram recorded for sk"))
      assert(h.bins.nonEmpty && h.height > 0)
      // recorded facts survive the log round trip
      val replayed = PjAnalyze.parse(
        PjCommitLog.latest(fsOf(dir), new Path(dir)).get.tableStatsJson)
        .flatMap(_.cols("sk").hist)
      assert(replayed.exists(_.bins == h.bins), "histogram must round-trip the log")
      val histEst = estRows(spark.newSession())
      // with the histogram the estimator sees the real mass: ~20 rows
      assert(histEst < uniformEst / 5,
        s"histogram estimate $histEst must collapse vs uniform $uniformEst")
    } finally spark.conf.unset("spark.sql.statistics.histogram.enabled")
  }

  test("NDV and null counts cap at the pruned scan's row estimate") {
    val dir = tempDir("cap")
    // two files with disjoint id ranges → stats pruning can drop one
    (1L to 100L).toDF("id").coalesce(1)
      .write.format("pjparquet").mode("append").option("log.enabled", "true").save(dir)
    (101L to 200L).toDF("id").coalesce(1)
      .write.format("pjparquet").mode("append").save(dir)
    PjAnalyze.analyze(spark, dir)
    val df = spark.read.format("pjparquet").load(dir).where($"id" <= 100L)
    val leaf = df.queryExecution.optimizedPlan.collectLeaves().head
    val st = leaf.stats.attributeStats.map { case (a, s) => a.name -> s }
    assert(st("id").distinctCount.exists(_.toLong <= 100L),
      s"NDV must cap at the pruned row estimate, got ${st("id").distinctCount}")
  }

  test("analyze validates columns and requires a log") {
    val dir = mkTable("err")
    val e1 = intercept[PJException] { PjAnalyze.analyze(spark, dir, Seq("nope")) }
    assert(e1.getMessage.contains("does not exist"))
    val unlogged = tempDir("unlogged")
    Seq((1, "x")).toDF("a", "b").write.mode("overwrite").parquet(unlogged)
    val e2 = intercept[PJException] { PjAnalyze.analyze(spark, unlogged) }
    assert(e2.getMessage.contains("no commit log"))
  }
}
