package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.PjWriter

/** Planning-time file pruning from chunk statistics
  * ([[graft.sources.pjparquet.PjStatsFilter]]): a pushed data filter whose
  * [min,max]/null-count envelopes provably exclude a file must remove that
  * file from the plan entirely — zero tasks, not a task that discovers
  * emptiness — while never changing results.
  */
class PjStatsPruningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 4 files with disjoint id ranges (and a name column for string stats). */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("pj_statsprune").toString
    PjWriter.writeWithIndex(
      spark.range(1000).select(
        $"id",
        format_string("doc-%04d", $"id").as("name"),
        when($"id" < 500, lit(null).cast("long")).otherwise($"id").as("maybe"))
        .repartitionByRange(4, $"id"),
      d)
    d
  }

  private def plannedTasks(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.inputRDD.getNumPartitions
    }.sum

  test("long-range filter plans only stats-matching files") {
    val df = spark.read.format("pjparquet").load(dir)
    val full = plannedTasks(df.filter($"id" >= 0))
    assert(full >= 4, s"fixture should plan >=4 tasks unpruned, got $full")
    val top = df.filter($"id" >= 900)
    assert(plannedTasks(top) == 1, "only the top range file may be planned")
    assert(top.count() == 100)
    val none = df.filter($"id" > 5000)
    assert(plannedTasks(none) == 0, "a provably-empty scan plans zero tasks")
    assert(none.count() == 0)
  }

  test("string-prefix and equality filters prune on BYTE_ARRAY stats") {
    val df = spark.read.format("pjparquet").load(dir)
    val eq = df.filter($"name" === "doc-0042")
    assert(plannedTasks(eq) == 1)
    assert(eq.count() == 1)
    val pre = df.filter($"name".startsWith("doc-09"))
    assert(plannedTasks(pre) == 1)
    assert(pre.count() == 100)
  }

  test("IsNull/IsNotNull prune via null counts without dropping rows") {
    val df = spark.read.format("pjparquet").load(dir)
    // nulls live in ids < 500 => two of four range files
    val nulls = df.filter($"maybe".isNull)
    assert(plannedTasks(nulls) == 2, "only files with a nonzero null count may plan")
    assert(nulls.count() == 500)
    assert(df.filter($"maybe".isNotNull).count() == 500)
  }

  test("driver metrics report pruning and planned work") {
    val df = spark.read.format("pjparquet").load(dir).filter($"id" >= 900)
    assert(df.count() == 100)
    val scan = df.queryExecution.sparkPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.getOrElse(fail("no BatchScanExec in plan"))
    val m = scan.asInstanceOf[graft.sources.pjparquet.PjScan]
      .reportDriverMetrics().map(t => t.name() -> t.value()).toMap
    assert(m("pjFilesPlanned") == 1, s"metrics: $m")
    assert(m("pjFilesPruned") == 3, s"metrics: $m")
    assert(m("pjRowGroupsPlanned") >= 1)
    assert(m("pjPlannedBytes") > 0)
    val names = scan.supportedCustomMetrics().map(_.name()).toSet
    assert(m.keySet.subsetOf(names), "every reported metric must be declared")
  }

  test("results always match an unpruned stock parquet read") {
    val pj = spark.read.format("pjparquet").load(dir)
    val stock = spark.read.parquet(dir)
    for (pred <- Seq(
        $"id" >= 900, $"id" < 37, $"name" === "doc-0999",
        $"maybe".isNull || $"id" > 950, $"id".between(499, 501))) {
      val a = pj.filter(pred).agg(count(lit(1)), coalesce(sum($"id"), lit(0L))).head()
      val b = stock.filter(pred).agg(count(lit(1)), coalesce(sum($"id"), lit(0L))).head()
      assert(a == b, s"mismatch for $pred")
    }
  }
}
