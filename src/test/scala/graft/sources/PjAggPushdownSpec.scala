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

  test("unsupported aggregates fall back with equal answers") {
    val base = spark.read.format("pjparquet").load(statsDir)
    val stock = spark.read.parquet(statsDir)

    for (aggCol <- Seq(countDistinct($"iv"), avg($"iv"), sum($"iv"))) {
      val df = base.agg(aggCol.as("x"))
      assert(!plan(df).contains("LocalTableScan"), s"should not push: $aggCol")
      assert(df.head().get(0) == stock.agg(aggCol.as("x")).head().get(0))
    }
    // a mixed list with one unanswerable member refuses the WHOLE pushdown
    // (min(dv) has a ±0.0 bound — see the zero-refusal test below)
    val mixed = base.agg(min($"id").as("a"), min($"dv").as("b"))
    assert(!plan(mixed).contains("LocalTableScan"))
    assert(mixed.head() == stock.agg(min($"id").as("a"), min($"dv").as("b")).head())
  }

  private lazy val typedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("pj_aggpush_typed").toString
    val prevTs = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      PjWriter.writeWithIndex(
        spark.range(1, 20000).select( // start at 1: keeps dv2/fv zero-free
          $"id",
          concat(lit("s"), format_string("%05d", $"id")).as("sv"),
          ($"id" * 1.5).as("dv2"),
          ($"id" % 50 + 1).cast("float").as("fv"),
          date_add(lit("2020-01-01").cast("date"), ($"id" % 300).cast("int")).as("dt"),
          timestamp_micros($"id" * 1000000L).as("tv"),
          ($"id" % 1000).cast("decimal(10,2)").as("dec")),
        dir, options = Map("parquet.block.size" -> (64 * 1024).toString))
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prevTs)
    dir
  }

  test("typed min/max push down: double/float/date/timestamp/decimal") {
    val base = spark.read.format("pjparquet").load(typedDir)
    val stock = spark.read.parquet(typedDir)
    val aggs = Seq(
      min($"dv2").as("min_dv"), max($"dv2").as("max_dv"),
      min($"fv").as("min_fv"), max($"fv").as("max_fv"),
      min($"dt").as("min_dt"), max($"dt").as("max_dt"),
      min($"tv").as("min_tv"), max($"tv").as("max_tv"),
      min($"dec").as("min_dec"), max($"dec").as("max_dec"))
    val df = base.agg(aggs.head, aggs.tail: _*)
    val p = plan(df)
    assert(p.contains("LocalTableScan"), s"expected metadata-only answer, got:\n$p")
    assert(!p.contains("BatchScan"))
    assert(df.head() == stock.agg(aggs.head, aggs.tail: _*).head(),
      "metadata answer must equal the scan answer, field for field")
  }

  test("string bounds: arrow-written files push, parquet-mr needs the trust option") {
    // arrow (pyarrow) DROPS oversized binary stats instead of truncating,
    // so its present bounds are witnessed values -> pushes by default
    val arrow = spark.read.format("pjparquet")
      .load("/root/testdata/sf0.001/documents.parquet")
      .agg(min($"lang").as("mn"), max($"lang").as("mx"))
    assert(plan(arrow).contains("LocalTableScan"),
      s"arrow-written string bounds must push:\n${plan(arrow)}")
    assert(arrow.head() == spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .agg(min($"lang").as("mn"), max($"lang").as("mx")).head())
    // parquet-mr can be CONFIGURED to truncate silently (no exactness
    // flags as of 1.16), so exactness is unprovable -> refuse by default…
    val mr = spark.read.format("pjparquet").load(typedDir).agg(max($"sv").as("x"))
    assert(!plan(mr).contains("LocalTableScan"),
      "parquet-mr string bounds must refuse by default")
    assert(mr.head().getString(0) == "s19999")
    // …and push when the user vouches for their writer settings
    val trusted = spark.read.format("pjparquet")
      .option("stats.trustStringBounds", "true").load(typedDir)
      .agg(min($"sv").as("mn"), max($"sv").as("mx"))
    assert(plan(trusted).contains("LocalTableScan"),
      s"trusted string bounds must push:\n${plan(trusted)}")
    assert(trusted.head().getString(0) == "s00001" && trusted.head().getString(1) == "s19999")
  }

  test("float/double ±0.0 bounds refuse (writer zero convention), max still pushes") {
    // dv contains 0.0 (id starts at 0): the chunk minimum bound is a
    // conventional -0.0/0.0, not a witnessed value — MIN must refuse
    val base = spark.read.format("pjparquet").load(statsDir)
    val mn = base.agg(min($"dv").as("x"))
    assert(!plan(mn).contains("LocalTableScan"), "zero bound must refuse min pushdown")
    assert(mn.head().getDouble(0) == 0.0)
    // the maximum of the same column is nonzero and pushes fine
    val mx = base.agg(max($"dv").as("x"))
    assert(plan(mx).contains("LocalTableScan"), s"nonzero max must push:\n${plan(mx)}")
    assert(mx.head().getDouble(0) == spark.read.parquet(statsDir).agg(max($"dv")).head().getDouble(0))
  }

  test("truncated string statistics refuse pushdown (exactness flags)") {
    val dir = java.nio.file.Files.createTempDirectory("pj_aggpush_trunc").toString
    PjWriter.writeWithIndex(
      spark.range(1000).select(
        $"id", concat(lit("prefix-"), format_string("%07d", $"id"), lit("-suffix")).as("sv")),
      dir, options = Map("parquet.statistics.truncate.length" -> "4"))
    val df = spark.read.format("pjparquet").load(dir).agg(max($"sv").as("x"))
    assert(!plan(df).contains("LocalTableScan"),
      "a truncated bound is not a real value — pushdown must refuse")
    assert(df.head().getString(0) == "prefix-0000999-suffix")
  }

  test("legacy-rebase date files refuse date/timestamp pushdown") {
    val dir = java.nio.file.Files.createTempDirectory("pj_aggpush_legacy").toString
    val prev = spark.conf.get("spark.sql.parquet.datetimeRebaseModeInWrite")
    try {
      spark.conf.set("spark.sql.parquet.datetimeRebaseModeInWrite", "LEGACY")
      PjWriter.writeWithIndex(
        spark.range(100).select(
          $"id",
          date_add(lit("1500-01-01").cast("date"), $"id".cast("int")).as("dt")),
        dir)
    } finally spark.conf.set("spark.sql.parquet.datetimeRebaseModeInWrite", prev)
    val df = spark.read.format("pjparquet").load(dir).agg(min($"dt").as("x"))
    assert(!plan(df).contains("LocalTableScan"),
      "legacy-rebase files must refuse date pushdown (raw days != rebased days)")
    // and the fallback scan agrees with stock
    assert(df.head().getDate(0) ==
      spark.read.parquet(dir).agg(min($"dt")).head().getDate(0))
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
