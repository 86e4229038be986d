package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.{PjInputPartition, PjWriter}

/** LIMIT pushdown at row-group granularity: the scan must plan only the
  * leading row groups whose index row counts cover the limit (one task for
  * `LIMIT 10` over a 100k-row-group table), stay PARTIAL (Spark's own limit
  * still applies, so over-delivery by up to one row group is invisible),
  * and refuse whenever a data filter is pushed — filters re-evaluate above
  * the scan, so pre-filter truncation could under-deliver.
  */
class PjLimitPushdownSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val totalRows = 100000L
  // ~25 row groups of ~4k rows: id ascending so "which rows" is stable
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("pj_limit").toString
    val df = spark.range(totalRows).toDF("id")
      .withColumn("payload", concat(lit("row-"), col("id")))
      .coalesce(1).sortWithinPartitions("id")
    PjWriter.writeWithIndex(df, d,
      options = Map("parquet.block.size" -> (64 * 1024).toString))
    d
  }

  private def pj: DataFrame = spark.read.format("pjparquet").load(dir)

  /** Total row groups across the scan's planned input partitions (AQE off
    * so the executed plan exposes the `BatchScanExec` directly). A plan
    * with no scan at all (e.g. LIMIT 0 folds to an empty relation) planned
    * zero row groups by definition.
    */
  private def plannedRowGroups(df: => DataFrame): Int = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val frame = df
      frame.collect()
      frame.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
        .flatMap(_.partitions.flatten)
        .map {
          case p: PjInputPartition => p.rowGroups.length
          case _ => 0
        }.sum
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  private lazy val totalRgs: Int = plannedRowGroups(pj.select(col("id")))

  test("fixture has enough row groups to make truncation observable") {
    assert(totalRgs >= 8, s"expected a multi-row-group file, got $totalRgs")
  }

  test("LIMIT plans only the leading row groups and returns exact rows") {
    val limited = pj.limit(10)
    assert(limited.collect().length == 10)
    val planned = plannedRowGroups(limited)
    assert(planned >= 1 && planned < totalRgs,
      s"LIMIT 10 planned $planned of $totalRgs row groups")
    // big limits cover proportionally more groups but still not all
    val mid = pj.limit((totalRows / 4).toInt)
    assert(mid.collect().length == totalRows / 4)
    val midPlanned = plannedRowGroups(mid)
    assert(midPlanned > planned && midPlanned < totalRgs,
      s"LIMIT n/4 planned $midPlanned (small=$planned, total=$totalRgs)")
  }

  test("LIMIT larger than the table plans everything and returns all rows") {
    val all = pj.limit((totalRows + 5).toInt)
    assert(all.collect().length == totalRows)
    assert(plannedRowGroups(all) == totalRgs)
  }

  test("a pushed data filter refuses the truncation and stays correct") {
    // every id >= 96000 lives in the LAST row groups: a naive pre-filter
    // truncation would plan the first group(s) and return zero rows
    val filtered = pj.filter(col("id") >= totalRows - 4000).limit(10)
    assert(filtered.collect().length == 10)
    assert(plannedRowGroups(filtered) == totalRgs,
      "filter + limit must not truncate the row-group selection")
  }

  test("LIMIT 0 plans zero row groups") {
    val none = pj.limit(0)
    assert(none.collect().isEmpty)
    assert(plannedRowGroups(none) == 0)
  }
}
