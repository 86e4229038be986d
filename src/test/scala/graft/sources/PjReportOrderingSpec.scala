package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** `sort.columns` + `SupportsReportOrdering`: writes declare an in-task
  * sort, commits maintain the `_pj_sort` marker only while every file
  * provably satisfies it, and scans report the ordering so Spark elides
  * redundant Sort nodes above them.
  */
class PjReportOrderingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sortExecs(df: DataFrame): Seq[SortExec] =
    df.queryExecution.executedPlan.collect { case s: SortExec => s }

  test("sorted write: marker written, files internally sorted, redundant sort elided") {
    val dir = Files.createTempDirectory("pj_ord_flat").toString
    spark.range(0, 10000).select(
        (($"id" * 7919) % 10000).as("k"), $"id".as("v"))
      .repartition(4)
      .write.format("pjparquet").option("sort.columns", "k").mode("overwrite").save(dir)
    assert(Files.exists(Paths.get(dir, "_pj_sort")), "commit must publish the sort marker")

    val t = spark.read.format("pjparquet").load(dir)
    // each FILE is internally sorted by k (the write's required ordering)
    val files = Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    assert(files.nonEmpty)
    files.foreach { f =>
      val ks = spark.read.parquet(f.toString).select("k").as[Long].collect()
      assert(ks.sameElements(ks.sorted), s"${f.getName} must be internally sorted by k")
    }

    // the scan reports the ordering -> a per-partition sort on k is redundant
    val q = t.sortWithinPartitions($"k")
    assert(sortExecs(q).isEmpty,
      s"reported ordering must elide the local sort:\n${q.queryExecution.executedPlan}")
    // and values are intact vs the stock reader
    assert(t.agg(sum($"v"), sum($"k" * $"v")).head() ==
      spark.read.parquet(dir).agg(sum($"v"), sum($"k" * $"v")).head())

    // a scan NOT selecting k reports nothing that breaks resolution
    assert(t.select($"v").filter($"v" > 100).count() == 9899L)
  }

  test("append without sort.columns withdraws the ordering claim") {
    val dir = Files.createTempDirectory("pj_ord_drop").toString
    spark.range(0, 100).select($"id".as("k"), $"id".as("v"))
      .write.format("pjparquet").option("sort.columns", "k").mode("overwrite").save(dir)
    assert(Files.exists(Paths.get(dir, "_pj_sort")))
    // unsorted append: the marker can no longer be trusted -> deleted
    spark.range(100, 200).select($"id".as("k"), $"id".as("v"))
      .write.format("pjparquet").mode("append").save(dir)
    assert(!Files.exists(Paths.get(dir, "_pj_sort")),
      "an append without the sort declaration must delete the marker")
    val q = spark.read.format("pjparquet").load(dir).sortWithinPartitions($"k")
    assert(sortExecs(q).nonEmpty, "no claim -> the local sort must stay")
  }

  test("matching sorted appends keep the claim; mismatched columns drop it") {
    val dir = Files.createTempDirectory("pj_ord_keep").toString
    def write(lo: Int, hi: Int, cols: String, mode: String): Unit =
      spark.range(lo, hi).select($"id".as("k"), $"id".as("v"))
        .write.format("pjparquet").option("sort.columns", cols).mode(mode).save(dir)
    write(0, 100, "k", "overwrite")
    write(100, 200, "k", "append")
    assert(Files.exists(Paths.get(dir, "_pj_sort")), "same-sort append keeps the marker")
    write(200, 300, "v", "append")
    assert(!Files.exists(Paths.get(dir, "_pj_sort")), "changed sort columns drop the marker")
  }

  test("partition columns report constant-per-split ordering: SPJ join plans no sorts") {
    val dir1 = Files.createTempDirectory("pj_ord_spj1").toString
    val dir2 = Files.createTempDirectory("pj_ord_spj2").toString
    val df = spark.range(0, 1000).select(($"id" % 5).as("p"), $"id".as("v"))
    graft.sources.pjparquet.PjWriter.writeWithIndex(df, dir1, partitionBy = Seq("p"))
    graft.sources.pjparquet.PjWriter.writeWithIndex(
      df.groupBy($"p").agg(sum($"v").as("s")), dir2, partitionBy = Seq("p"))

    val iso = spark.newSession()
    iso.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    iso.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    iso.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    val j = iso.read.format("pjparquet").load(dir1)
      .join(iso.read.format("pjparquet").load(dir2), Seq("p"))
    val plan = j.queryExecution.executedPlan
    assert(!plan.toString.contains("Exchange hashpartitioning"),
      s"SPJ must need no exchange:\n$plan")
    assert(plan.collect { case s: SortExec => s }.isEmpty,
      s"constant partition-col ordering must elide SMJ sorts:\n$plan")
    // result exactness
    val got = j.groupBy($"p").agg(sum($"v").as("sv"), max($"s").as("s")).orderBy($"p")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val exp = (0L until 5L).map(p =>
      (p, (0L until 1000L).filter(_ % 5 == p).sum, (0L until 1000L).filter(_ % 5 == p).sum))
    assert(got == exp)
  }

  test("pj.sort.columns TABLE property drives writes; explicit option overrides") {
    val dir = Files.createTempDirectory("pj_ord_prop")
    Files.delete(dir)
    val t = dir.toString
    spark.conf.set("spark.sql.catalog.pjord", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"CREATE TABLE pjord.`$t` (k BIGINT, v BIGINT) USING pjparquet " +
      "TBLPROPERTIES ('pj.sort.columns'='k')")
    // a plain INSERT with NO option picks up the table contract
    spark.range(0, 5000).select((($"id" * 7919) % 5000).as("k"), $"id".as("v"))
      .repartition(2).createOrReplaceTempView("pj_ord_src")
    spark.sql(s"INSERT INTO pjord.`$t` SELECT * FROM pj_ord_src")
    assert(Files.exists(Paths.get(t, "_pj_sort")),
      "property-driven write must publish the sort marker")
    val files = Option(new java.io.File(t).listFiles()).toSeq.flatten
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    assert(files.nonEmpty)
    files.foreach { f =>
      val ks = spark.read.parquet(f.toString).select("k").as[Long].collect()
      assert(ks.sameElements(ks.sorted), s"${f.getName} must be internally sorted by k")
    }
    // reported ordering elides the local sort, same as the option form
    val q = spark.read.format("pjparquet").load(t).sortWithinPartitions($"k")
    assert(sortExecs(q).isEmpty)
    // an explicit EMPTY option opts one write out (marker retracts)
    spark.range(5000, 6000).select($"id".as("k"), lit(0L).as("v"))
      .repartition(2)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").option("sort.columns", "").save(t)
    assert(spark.read.format("pjparquet").load(t).count() == 6000)
  }
}
