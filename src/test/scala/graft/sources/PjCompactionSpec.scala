package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.{PjCompaction, PjWriter}

/** Small-file compaction: losslessness (content checksum), file-count
  * reduction to the computed bin counts, big files untouched byte-for-byte,
  * sidecar fleet kept in sync, and pjparquet readability after the pass.
  */
class PjCompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet") && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_")) Seq(f)
      else Nil
    walk(new java.io.File(dir))
  }

  private def sidecars(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet.index")) Seq(f)
      else Nil
    walk(new java.io.File(dir))
  }

  private def checksum(dir: String): Long =
    spark.read.parquet(dir).agg(sum($"id" * ($"v" + 7L))).head().getLong(0)

  test("flat directory: compacts small files, preserves content, reindexes") {
    val dir = java.nio.file.Files.createTempDirectory("pj_compact_flat").toString
    val df = spark.range(10000).select($"id", ($"id" % 97).as("v"))
    // 16 tiny files + one comfortably-large file that must not move
    PjWriter.writeWithIndex(df.filter($"id" < 8000).repartition(16), dir)
    df.filter($"id" >= 8000).coalesce(1).write.mode("append").parquet(dir)
    graft.sources.pjparquet.PjIndexJob.generateAll(spark, dir)

    val before = parquetFiles(dir)
    assert(before.size == 17)
    val bigFile = before.maxBy(_.length)
    val bigBytes = bigFile.length
    val sumBefore = checksum(dir)

    // threshold chosen between tiny-file size and the big file's size
    val report = PjCompaction.compact(
      spark, dir, targetBytes = 512L * 1024, smallThreshold = bigBytes - 1)

    assert(report.smallFiles == 16)
    assert(report.dirsTouched == 1)
    assert(report.compactedInto >= 1 && report.compactedInto < 16)
    val after = parquetFiles(dir)
    assert(after.size.toLong == report.filesAfter)
    assert(after.size < before.size)
    // the big file survived in place, byte-identical
    assert(after.exists(f => f.getName == bigFile.getName && f.length == bigBytes))
    // lossless
    assert(checksum(dir) == sumBefore)
    // every file has a sidecar again, and no orphan sidecars remain
    assert(sidecars(dir).size == after.size)
    // and the pjparquet source still reads the directory
    assert(spark.read.format("pjparquet").load(dir).count() == 10000L)
  }

  test("hive-partitioned: per-partition binning, layout and content survive") {
    val dir = java.nio.file.Files.createTempDirectory("pj_compact_part").toString
    val df = spark.range(6000).select(
      $"id", ($"id" % 89).as("v"), ($"id" % 3).cast("string").as("k"))
    // 8 tiny files inside each of the 3 k= partitions
    PjWriter.writeWithIndex(
      df.repartition(8), dir, partitionBy = Seq("k"))

    val before = parquetFiles(dir)
    assert(before.size == 24)
    val sumBefore = spark.read.parquet(dir)
      .agg(sum($"id" * ($"v" + 7L) * ($"k".cast("long") + 3L))).head().getLong(0)

    val report = PjCompaction.compact(spark, dir, targetBytes = 1024L * 1024)

    assert(report.smallFiles == 24)
    assert(report.dirsTouched == 3)
    val after = parquetFiles(dir)
    assert(after.size < before.size)
    // partition directories survive with at least one file each
    (0 until 3).foreach { k =>
      assert(parquetFiles(s"$dir/k=$k").nonEmpty, s"partition k=$k lost its files")
    }
    val got = spark.read.parquet(dir)
      .agg(sum($"id" * ($"v" + 7L) * ($"k".cast("long") + 3L))).head().getLong(0)
    assert(got == sumBefore)
    assert(sidecars(dir).size == after.size)
    // partition pruning still works through pjparquet
    assert(spark.read.format("pjparquet").load(dir)
      .filter($"k" === "1").count() == 2000L)
  }

  test("no-op when nothing qualifies") {
    val dir = java.nio.file.Files.createTempDirectory("pj_compact_noop").toString
    spark.range(100).coalesce(1).write.mode("overwrite").parquet(dir)
    val r = PjCompaction.compact(spark, dir, targetBytes = 1024)
    assert(r.smallFiles == 0 && r.filesAfter == r.filesBefore && r.dirsTouched == 0)
  }
}
