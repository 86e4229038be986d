package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.PjWriter

/** count(*) aggregate pushdown: an unfiltered global count over pjparquet
  * must plan as a driver-local scan (LocalTableScanExec — zero tasks, zero
  * data/footer I/O) with the value taken from the index's row_numbers
  * section, and every condition that makes metadata insufficient (data
  * filter, group-by, disabled option) must fall back to the batch scan
  * with identical results.
  */
class PjAggPushdownSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val flatDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("pj_aggpush").toString
    PjWriter.writeWithIndex(
      spark.range(60000).select($"id", ($"id" % 7).as("v")),
      dir, options = Map("parquet.block.size" -> (64 * 1024).toString))
    dir
  }

  private lazy val partDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("pj_aggpush_part").toString
    PjWriter.writeWithIndex(
      spark.range(3000).select($"id", ($"id" % 3).cast("string").as("k")),
      dir, partitionBy = Seq("k"))
    dir
  }

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("unfiltered count(*) plans as LocalTableScan with the exact count") {
    val df = spark.read.format("pjparquet").load(flatDir).agg(count(lit(1)).as("n"))
    assert(df.head().getLong(0) == 60000L)
    val p = plan(df)
    assert(p.contains("LocalTableScan"), s"expected LocalTableScan, got:\n$p")
    assert(!p.contains("BatchScan"), s"count(*) still scans data:\n$p")
  }

  test("partitioned layout: unfiltered count(*) is metadata-only too") {
    val df = spark.read.format("pjparquet").load(partDir).agg(count(lit(1)).as("n"))
    assert(df.head().getLong(0) == 3000L)
    assert(plan(df).contains("LocalTableScan"))
  }

  test("rowGroups option composes: count of selected groups only") {
    val md = graft.sources.pjparquet.PjMetadata.rowGroups(spark, {
      // single data file inside flatDir
      new java.io.File(flatDir).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .head.getPath
    })
    val rows01 = md.filter($"row_group".isin(0, 1)).agg(sum($"num_rows")).head().getLong(0)
    val file = new java.io.File(flatDir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .head.getPath
    val df = spark.read.format("pjparquet").option("rowGroups", "0,1").load(file)
      .agg(count(lit(1)).as("n"))
    assert(df.head().getLong(0) == rows01)
    assert(plan(df).contains("LocalTableScan"))
  }

  private lazy val statsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("pj_aggpush_stats").toString
    // long key, int value, a column WITH nulls, a string, a double —
    // several row groups so min/max/null_count genuinely fold across chunks
    PjWriter.writeWithIndex(
      spark.range(40000).select(
        $"id",
        ($"id" % 1000).cast("int").as("iv"),
        when($"id" % 5 === 0, lit(null).cast("long")).otherwise($"id" * 2).as("nv"),
        concat(lit("s"), $"id").as("sv"),
        ($"id" * 1.5).as("dv")),
      dir, options = Map("parquet.block.size" -> (64 * 1024).toString))
    dir
  }

  test("min/max/count(col) answered from chunk statistics, metadata-only") {
    val base = spark.read.format("pjparquet").load(statsDir)
    val df = base.agg(
      count(lit(1)).as("n"), min($"id").as("min_id"), max($"id").as("max_id"),
      min($"iv").as("min_iv"), max($"iv").as("max_iv"), count($"nv").as("n_nv"))
    val p = plan(df)
    assert(p.contains("LocalTableScan"), s"expected LocalTableScan, got:\n$p")
    assert(!p.contains("BatchScan"))
    val r = df.head()
    assert(r.getLong(0) == 40000L)
    assert(r.getLong(1) == 0L && r.getLong(2) == 39999L)
    assert(r.getInt(3) == 0 && r.getInt(4) == 999)
    assert(r.getLong(5) == 32000L) // every 5th of 40000 is null
  }

  test("unsupported types and distinct counts fall back with equal answers") {
    val base = spark.read.format("pjparquet").load(statsDir)
    val stock = spark.read.parquet(statsDir)

    for (aggCol <- Seq(min($"sv"), max($"dv"), countDistinct($"iv"), avg($"iv"))) {
      val df = base.agg(aggCol.as("x"))
      assert(!plan(df).contains("LocalTableScan"), s"should not push: $aggCol")
      assert(df.head().get(0) == stock.agg(aggCol.as("x")).head().get(0))
    }
    // a mixed list with one unsupported member refuses the WHOLE pushdown
    val mixed = base.agg(min($"id").as("a"), min($"dv").as("b"))
    assert(!plan(mixed).contains("LocalTableScan"))
    assert(mixed.head() == stock.agg(min($"id").as("a"), min($"dv").as("b")).head())
  }

  test("GROUP BY partition column: per-partition aggregates, metadata-only") {
    val df = spark.read.format("pjparquet").load(partDir)
      .groupBy($"k").agg(count(lit(1)).as("n"), min($"id").as("mn"), max($"id").as("mx"))
    val p = plan(df)
    assert(p.contains("LocalTableScan"), s"expected LocalTableScan, got:\n$p")
    // partition values "0"/"1"/"2" type as Long via pjparquet's inference
    // and Integer via stock's — compare through Number
    def tup(r: org.apache.spark.sql.Row) =
      (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2), r.getLong(3))
    val got = df.orderBy($"k").collect().map(tup)
    val want = spark.read.parquet(partDir)
      .groupBy($"k").agg(count(lit(1)).as("n"), min($"id").as("mn"), max($"id").as("mx"))
      .orderBy($"k").collect().map(tup)
    assert(got.toSeq == want.toSeq)
  }

  test("GROUP BY a data column still falls back") {
    val df = spark.read.format("pjparquet").load(statsDir)
      .groupBy($"iv").agg(count(lit(1)).as("n"))
    assert(!plan(df).contains("LocalTableScan"))
    assert(df.count() == 1000L)
  }

  test("data filter, group-by, and disabled option all fall back, same answers") {
    val base = spark.read.format("pjparquet").load(flatDir)
    val filtered = base.filter($"v" === 3).agg(count(lit(1)).as("n"))
    assert(!plan(filtered).contains("LocalTableScan"))
    assert(filtered.head().getLong(0) ==
      spark.read.parquet(flatDir).filter($"v" === 3).count())

    val grouped = base.groupBy($"v").agg(count(lit(1)).as("n"))
    assert(!plan(grouped).contains("LocalTableScan"))
    assert(grouped.agg(sum($"n")).head().getLong(0) == 60000L)

    val off = spark.read.format("pjparquet").option("countStarPushdown", "false")
      .load(flatDir).agg(count(lit(1)).as("n"))
    assert(!plan(off).contains("LocalTableScan"))
    assert(off.head().getLong(0) == 60000L)

    // a MIXED filter (partition AND data column) keeps a residual and so
    // still falls back to the batch scan
    val mixed = spark.read.format("pjparquet").load(partDir)
      .filter($"k" === "1" && $"id" > 100L).agg(count(lit(1)).as("n"))
    assert(!plan(mixed).contains("LocalTableScan"))
    assert(mixed.head().getLong(0) ==
      spark.read.parquet(partDir).filter($"k" === "1" && $"id" > 100L).count())
  }

  test("partition-EXACT filters stay metadata-only: count under WHERE k = …") {
    val base = spark.read.format("pjparquet").load(partDir)
    // equality on the partition column: files either fully match or drop,
    // so the claimed filter leaves no residual and the count stays a
    // zero-task LocalTableScan
    val eq = base.filter($"k" === "1").agg(count(lit(1)).as("n"))
    assert(plan(eq).contains("LocalTableScan"), s"expected metadata answer:\n${plan(eq)}")
    assert(eq.head().getLong(0) == 1000L)
    // IN-list and conjunctions of partition predicates too
    val in = base.filter($"k".isin("0", "2")).agg(count(lit(1)).as("n"))
    assert(plan(in).contains("LocalTableScan"))
    assert(in.head().getLong(0) == 2000L)
    // grouped + filtered: one metadata row per surviving partition
    val grouped = base.filter($"k" =!= "1").groupBy($"k").agg(count(lit(1)).as("n"))
    assert(plan(grouped).contains("LocalTableScan"))
    assert(grouped.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(0L -> 1000L, 2L -> 1000L))
    // min/max from chunk stats compose with the partition filter
    val mm = base.filter($"k" === "2").agg(min($"id").as("mn"), max($"id").as("mx"))
    assert(plan(mm).contains("LocalTableScan"))
    assert(mm.head().getLong(0) == 2L && mm.head().getLong(1) == 2999L)
    // and a normal (non-aggregate) scan under a claimed filter still
    // returns exactly the right rows even though Spark applies no residual
    val rows = base.filter($"k" === "1")
    assert(rows.count() == 1000L)
    assert(rows.agg(sum($"id")).head().getLong(0) ==
      spark.read.parquet(partDir).filter($"k" === "1").agg(sum($"id")).head().getLong(0))
  }
}
