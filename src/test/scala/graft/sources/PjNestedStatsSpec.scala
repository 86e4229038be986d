package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.{PjCommitLog, PjWriter}

/** Nested-leaf data skipping (round 18): chunk statistics and commit-log
  * stats envelopes cover DOTTED leaf paths under top-level structs. A
  * pushed filter on `payload.score` prunes files through the leaf's own
  * per-chunk min/max/null_count (keyed by `path_in_schema`), in both the
  * index lane (unlogged directory, per-rg stats via the PJ_3 leaf walk)
  * and the envelope lane (logged table, whole-file bounds with zero
  * sidecar reads) — while whole-FIELD stats remain refused (a group's
  * first-leaf stats must never stand in for the struct).
  */
class PjNestedStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 4 files with disjoint payload.score ranges; ids 0..999; score = id.
    * Rows with id % 10 == 3 carry a NULL struct (ancestor-null lane);
    * rows with id % 10 == 7 carry a null leaf under a non-null struct.
    */
  private def nestedDf = spark.range(1000).select(
    $"id",
    when($"id" % 10 === 3, lit(null))
      .otherwise(struct(
        when($"id" % 10 === 7, lit(null).cast("long")).otherwise($"id").as("score"),
        format_string("L%d", $"id" % 3).as("lang")))
      .cast("struct<score:bigint,lang:string>").as("payload"))
    .repartitionByRange(4, $"id")

  private lazy val idxDir: String = {
    val d = java.nio.file.Files.createTempDirectory("pj_neststats_idx").toString
    PjWriter.writeWithIndex(nestedDf, d)
    d
  }

  private lazy val logDir: String = {
    val d = java.nio.file.Files.createTempDirectory("pj_neststats_log")
    java.nio.file.Files.delete(d)
    nestedDf.write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(d.toString)
    d.toString
  }

  private def plannedTasks(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.inputRDD.getNumPartitions
    }.sum

  test("index lane: a dotted-leaf range filter plans only stats-matching files") {
    val df = spark.read.format("pjparquet").load(idxDir)
    val full = plannedTasks(df.filter($"payload.score" >= 0L))
    assert(full >= 4, s"fixture should plan >=4 tasks unpruned, got $full")
    val top = df.filter($"payload.score" >= 900L)
    assert(plannedTasks(top) == 1, "only the top range file may plan")
    assert(top.count() === 80) // 100 minus the %10==3 and %10==7 null lanes
    val none = df.filter($"payload.score" > 5000L)
    assert(plannedTasks(none) == 0, "a provably-empty nested scan plans zero tasks")
    assert(none.count() === 0)
  }

  test("envelope lane: the commit log carries dotted keys and prunes without sidecars") {
    val fs = new org.apache.hadoop.fs.Path(logDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val snap = PjCommitLog.latest(fs, new org.apache.hadoop.fs.Path(logDir)).get
    // every entry's envelope carries the leaf keys by dotted path
    for (e <- snap.entries) {
      assert(e.stats.contains("payload.score"), s"${e.path}: ${e.stats.keySet}")
      assert(e.stats.contains("payload.lang"), s"${e.path}: ${e.stats.keySet}")
    }
    val df = spark.read.format("pjparquet").load(logDir)
    val full = plannedTasks(df.filter($"payload.score" >= 0L))
    assert(full >= 4)
    assert(plannedTasks(df.filter($"payload.score" >= 900L)) == 1)
    assert(df.filter($"payload.score" >= 900L).count() === 80)
    // string leaf prunes too (BYTE_ARRAY unsigned-lex envelope)
    assert(plannedTasks(df.filter($"payload.lang" > "L9")) == 0)
  }

  test("null-count pruning on leaves stays sound under ancestor nulls") {
    val df = spark.read.format("pjparquet").load(idxDir)
    // every file has null leaf values (both null-struct and null-leaf
    // lanes land in each range file) — IsNull must keep all, IsNotNull
    // must keep all, and answers stay exact
    assert(df.filter($"payload.score".isNull).count() === 200)
    assert(df.filter($"payload.score".isNotNull).count() === 800)
    assert(df.filter($"payload".isNull).count() === 100)
    // leaf null-count must NOT claim the struct itself is null
    assert(df.filter($"payload".isNotNull && $"payload.score".isNull).count() === 100)
  }

  test("aggregate pushdown refuses nested leaves but answers exactly") {
    val df = spark.read.format("pjparquet").load(logDir)
    val agg = df.agg(min($"payload.score").as("mn"), max($"payload.score").as("mx"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan") && !plan.contains("LocalTableScan"),
      s"nested-leaf min/max must NOT become a metadata-only answer:\n$plan")
    val r = agg.collect().head
    assert(r.getLong(0) == 0L && r.getLong(1) == 999L)
  }

  test("results are identical with pruning in play (filter re-evaluated above the scan)") {
    val df = spark.read.format("pjparquet").load(idxDir)
    val got = df.filter($"payload.score".between(450L, 549L))
      .agg(count(lit(1)), sum($"payload.score")).collect().head
    val want = nestedDf.filter($"payload.score".between(450L, 549L))
      .agg(count(lit(1)), sum($"payload.score")).collect().head
    assert(got === want)
  }
}
