package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.PjWriter

/** Additive schema evolution through `mergeSchema=true`: union schema,
  * per-file splice of only the columns a file has, reader null-fill for
  * the rest — stock `spark.read.option("mergeSchema", true)` semantics on
  * the index-planned path. The default stays strict (hard error), and
  * same-name type conflicts always fail loudly.
  */
class PjSchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val evoDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("pj_evo").toString
    // generation 1: (id, s); generation 2 adds `extra`
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "s", "extra")
      .coalesce(1).write.mode("append").parquet(dir)
    graft.sources.pjparquet.PjIndexJob.generateAll(spark, dir)
    dir
  }

  private def merged = spark.read.format("pjparquet")
    .option("mergeSchema", "true").load(evoDir)

  test("default is strict and names the escape hatch") {
    val e = intercept[graft.core.PJException] {
      spark.read.format("pjparquet").load(evoDir).count()
    }
    assert(e.getMessage.contains("schema mismatch across files"))
    assert(e.getMessage.contains("mergeSchema=true"))
  }

  test("union schema, null-filled rows, matches stock mergeSchema read") {
    assert(merged.columns.toSeq == Seq("id", "s", "extra"))
    val got = merged.orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(got.toSeq == Seq(
      (1L, "a", None), (2L, "b", None), (3L, "c", Some(30L)), (4L, "d", Some(40L))))
    val stock = spark.read.option("mergeSchema", "true").parquet(evoDir)
      .orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(got.toSeq == stock.toSeq)
  }

  test("projection of only the evolved column; filters on both generations") {
    // old files contribute pure null-fill rows (their splice keeps the
    // full footer, but the reader requests no physical column)
    assert(merged.select($"extra").collect().map(r =>
      if (r.isNullAt(0)) -1L else r.getLong(0)).sorted.toSeq == Seq(-1L, -1L, 30L, 40L))
    // filter on a column some files lack: no global row-group predicate,
    // but results stay exact via residual evaluation
    assert(merged.filter($"extra" > 30L).select($"id").as[Long].collect().toSeq == Seq(4L))
    assert(merged.filter($"extra".isNull).count() == 2L)
    // filter on a universally-present column still row-group-filters
    assert(merged.filter($"id" <= 2L).count() == 2L)
  }

  test("aggregate pushdown composes: count(*) metadata-only, evolved-column aggs fall back") {
    val cnt = merged.agg(count(lit(1)).as("n"))
    assert(cnt.head().getLong(0) == 4L)
    assert(cnt.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    // count(extra) would need null counts for files that lack the column
    // entirely — must fall back and still be exact
    val cntExtra = merged.agg(count($"extra").as("n"))
    assert(!cntExtra.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(cntExtra.head().getLong(0) == 2L)
  }

  test("same-name type conflict fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("pj_evo_conflict").toString
    Seq((1L, "a")).toDF("id", "s").coalesce(1).write.mode("append").parquet(dir)
    Seq(("x", "b")).toDF("id", "s").coalesce(1).write.mode("append").parquet(dir)
    graft.sources.pjparquet.PjIndexJob.generateAll(spark, dir)
    val e = intercept[graft.core.PJException] {
      spark.read.format("pjparquet").option("mergeSchema", "true").load(dir).count()
    }
    assert(e.getMessage.contains("type conflict on column 'id'"))
  }

  test("zero-row-group files are skipped by resolution and the index fleet") {
    val dir = java.nio.file.Files.createTempDirectory("pj_emptyfile").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1).write.mode("append").parquet(dir)
    // a genuinely empty file, as Spark writes for an empty partition
    spark.emptyDataset[(Long, String)].toDF("id", "s")
      .coalesce(1).write.mode("append").parquet(dir)
    val written = graft.sources.pjparquet.PjIndexJob.generateAll(spark, dir)
    assert(written == 1L) // only the non-empty file got a sidecar
    assert(spark.read.format("pjparquet").load(dir).count() == 2L)
    assert(spark.read.format("pjparquet").load(dir)
      .agg(count(lit(1))).head().getLong(0) == 2L) // pushdown path too
  }

  test("evolved directory still writes and compacts") {
    // compaction reads with basePath semantics; run it over a COPY of the
    // evolved dir to prove maintenance ops keep working under evolution
    val dir = java.nio.file.Files.createTempDirectory("pj_evo_compact").toString
    PjWriter.writeWithIndex(
      spark.read.option("mergeSchema", "true").parquet(evoDir).repartition(4), dir)
    // repartition(4) of 4 rows typically yields 2-3 data files plus one
    // zero-row-group file for an empty partition — which the index fleet
    // must skip and compaction must happily consume
    val r = graft.sources.pjparquet.PjCompaction.compact(spark, dir, targetBytes = 1024 * 1024)
    assert(r.smallFiles >= 2)
    assert(spark.read.format("pjparquet").load(dir).count() == 4L)
  }
}
