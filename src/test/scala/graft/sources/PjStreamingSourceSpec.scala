package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.PjWriter

/** Micro-batch read source: appended files arrive exactly once across
  * restarts (offset watermark), schema/partitions come from the indexes,
  * and already-processed files are never re-read.
  */
class PjStreamingSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("exactly-once ingestion across AvailableNow restarts") {
    val dir = java.nio.file.Files.createTempDirectory("pj_stream_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("pj_stream_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("pj_stream_out").toString
    PjWriter.writeWithIndex(
      spark.range(0, 100).select($"id", ($"id" % 3).cast("string").as("k")),
      dir, mode = "append", partitionBy = Seq("k"))

    // memory sink can't recover from a checkpoint; a file sink can, and the
    // restart path is the point of this test.
    def runOnce(): Unit = {
      val q = spark.readStream.format("pjparquet").load(dir)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(!q.isActive, "AvailableNow query should have finished")
    }

    runOnce()
    val afterFirst = spark.read.parquet(out)
    assert(afterFirst.count() == 100L)
    assert(afterFirst.agg(sum($"id")).head().getLong(0) == 4950L)
    // partition column came through
    assert(afterFirst.select($"k").distinct().count() == 3L)

    // append a second generation (ensure a later mtime tick)
    Thread.sleep(1100)
    PjWriter.writeWithIndex(
      spark.range(100, 150).select($"id", ($"id" % 3).cast("string").as("k")),
      dir, mode = "append", partitionBy = Seq("k"))

    runOnce()
    val afterSecond = spark.read.parquet(out)
    // exactly the 50 new rows arrived — nothing re-read, nothing missed
    assert(afterSecond.count() == 150L)
    assert(afterSecond.agg(sum($"id")).head().getLong(0) == (0 until 150).sum.toLong)
    assert(afterSecond.select($"id").distinct().count() == 150L)

    // a third run with no new files processes nothing
    runOnce()
    assert(spark.read.parquet(out).count() == 150L)
  }

  test("maxFilesPerTrigger drains a backlog as bounded batches") {
    val dir = java.nio.file.Files.createTempDirectory("pj_stream_rate").toString
    val ckpt = java.nio.file.Files.createTempDirectory("pj_stream_rckpt").toString
    // 6 data files (round-robin repartition: all non-empty); a cap of 2
    // files per trigger must drain in ceil(6/2) = 3 batches
    PjWriter.writeWithIndex(
      spark.range(0, 600).select($"id", ($"id" % 6).as("b")).repartition(6), dir)
    val nFiles = Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    assert(nFiles == 6, s"fixture should have 6 data files, got $nFiles")

    val q = spark.readStream.format("pjparquet")
      .option("maxFilesPerTrigger", "2")
      .load(dir)
      .writeStream.format("memory").queryName("pj_stream_rate_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(!q.isActive)

    val out = spark.table("pj_stream_rate_out")
    assert(out.count() == 600L)
    assert(out.select($"id").distinct().count() == 600L)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length == 3,
      s"expected 3 bounded batches, got ${batches.map(_.numInputRows).mkString(",")}")
  }

  test("pruned streaming read: filters and projection still apply") {
    val dir = java.nio.file.Files.createTempDirectory("pj_stream_filter").toString
    val ckpt = java.nio.file.Files.createTempDirectory("pj_stream_fckpt").toString
    PjWriter.writeWithIndex(
      spark.range(0, 1000).select($"id", ($"id" * 2).as("v")), dir)

    val q = spark.readStream.format("pjparquet").load(dir)
      .filter($"id" >= 990).select($"v")
      .writeStream.format("memory").queryName("pj_stream_f")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(spark.table("pj_stream_f").as[Long].collect().sorted.toSeq ==
      (990 until 1000).map(_ * 2L))
  }
}
