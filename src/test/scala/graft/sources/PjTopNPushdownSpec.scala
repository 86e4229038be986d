package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.{PjInputPartition, PjSortMarker, PjWriter}

/** ORDER BY + LIMIT pushdown over a sorted layout: each file's top-n lives
  * in its leading (asc) / trailing (desc) rows, so the scan plans only the
  * row groups covering n rows per file. Refused without a sort claim, on a
  * non-prefix order, or under pushed data filters.
  */
class PjTopNPushdownSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val totalRows = 100000L
  // one sorted file with ~25 row groups + the sort marker (the DSv2 write
  // path publishes the marker; here the fixture arranges the same state
  // directly so the block size is controllable)
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("pj_topn").toString
    val df = spark.range(totalRows).toDF("id")
      .withColumn("payload", concat(lit("row-"), col("id")))
      .coalesce(1).sortWithinPartitions("id")
    PjWriter.writeWithIndex(df, d,
      options = Map("parquet.block.size" -> (64 * 1024).toString))
    val p = new Path(d)
    PjSortMarker.write(p.getFileSystem(spark.sessionState.newHadoopConf()), p, Seq("id"))
    d
  }

  private def pj: DataFrame = spark.read.format("pjparquet").load(dir)

  private def scanInfo(df: => DataFrame): (Int, String) = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val frame = df
      frame.collect()
      val scans = frame.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      val rgs = scans.flatMap(_.partitions.flatten).map {
        case p: PjInputPartition => p.rowGroups.length
        case _ => 0
      }.sum
      (rgs, scans.map(_.scan.description()).mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  private lazy val totalRgs: Int = scanInfo(pj.select(col("id")))._1

  test("ascending ORDER BY LIMIT plans only the leading row groups") {
    assert(totalRgs >= 8, s"fixture must be multi-row-group, got $totalRgs")
    val q = pj.orderBy(col("id")).limit(7)
    val (rgs, desc) = scanInfo(q)
    assert(desc.contains("PushedTopN: 7 ASC"), s"scan must claim the top-n:\n$desc")
    assert(rgs == 1, s"top-7 over a sorted single-file layout needs ONE row group, planned $rgs")
    assert(q.select("id").as[Long].collect().toSeq ==
      (0L until 7L))
  }

  test("descending ORDER BY LIMIT plans only the trailing row groups") {
    val q = pj.orderBy(col("id").desc).limit(5)
    val (rgs, desc) = scanInfo(q)
    assert(desc.contains("PushedTopN: 5 DESC"), s"scan must claim the top-n:\n$desc")
    assert(rgs == 1, s"bottom-5 needs ONE trailing row group, planned $rgs")
    assert(q.select("id").as[Long].collect().toSeq ==
      (totalRows - 1 to totalRows - 5 by -1))
  }

  test("refusals: pushed filter, non-prefix order, no sort claim") {
    val f = pj.filter(col("id") >= 90000L).orderBy(col("id")).limit(5)
    val (rgsF, descF) = scanInfo(f)
    assert(!descF.contains("PushedTopN"), "a pushed data filter must refuse top-n truncation")
    assert(f.select("id").as[Long].collect().toSeq ==
      (90000L until 90005L))

    val np = pj.orderBy(col("payload")).limit(5)
    assert(!scanInfo(np)._2.contains("PushedTopN"), "non-prefix order must refuse")

    // same data, no marker -> no claim
    val d2 = java.nio.file.Files.createTempDirectory("pj_topn_plain").toString
    PjWriter.writeWithIndex(
      spark.range(1000).toDF("id").coalesce(1).sortWithinPartitions("id"), d2)
    val q2 = spark.read.format("pjparquet").load(d2).orderBy(col("id")).limit(5)
    assert(!scanInfo(q2)._2.contains("PushedTopN"), "no sort marker -> refuse")
  }

  test("mixed-direction or wrong-nulls orders refuse") {
    val q = pj.orderBy(col("id").asc_nulls_last).limit(5)
    assert(!scanInfo(q)._2.contains("PushedTopN"),
      "asc_nulls_last does not match the writer's asc_nulls_first layout")
  }
}
