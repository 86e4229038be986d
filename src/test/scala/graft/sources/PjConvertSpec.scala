package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.PJException
import graft.sources.pjparquet.{PjCommitLog, PjConvert, PjVacuum}

/** In-place CONVERT (Delta's `CONVERT TO DELTA`): an existing plain-parquet
  * directory becomes a commit-log table without rewriting a byte — entries,
  * stats, sidecars and the merged schema all come from one distributed pass.
  */
class PjConvertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.pjconv", "graft.sources.pjparquet.PjCatalog")

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(tag)
    java.nio.file.Files.delete(d)
    d.toString
  }

  private def snap(t: String) = {
    val root = new Path(t)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    PjCommitLog.latest(fs, root).get
  }

  test("plain directory converts in place: data bytes untouched, reads identical, stats live") {
    val t = freshDir("pj_conv")
    spark.range(0, 1000).select($"id", ($"id" % 7).as("v"))
      .repartition(4).write.parquet(t)
    val before = new java.io.File(t).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    val expected = spark.read.parquet(t).collect().map(_.toSeq).toSet

    val r = PjConvert.convert(spark, t)
    assert(r.version == 1L && r.files == 4L && r.rows == 1000L)
    // adoption, not rewrite: the same files, byte-for-byte
    val after = new java.io.File(t).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    assert(after == before, "convert must not touch data files")
    // every entry is plannable from the log alone (stats envelope present)
    assert(snap(t).entries.forall(_.planned), "entries must carry full planning facts")
    assert(spark.read.format("pjparquet").load(t).collect().map(_.toSeq).toSet == expected)
    // a second convert refuses loudly
    val e = intercept[PJException](PjConvert.convert(spark, t))
    assert(e.getMessage.contains("already"))
  }

  test("hive-partitioned layout: partition values survive, listing distributes, DML works after") {
    val t = freshDir("pj_conv_part")
    spark.range(0, 900).select($"id", ($"id" % 9).as("p"))
      .write.partitionBy("p").parquet(t)
    val wavesBefore = PjVacuum.distributedWaves.get()
    val r = PjConvert.convert(spark, t)
    assert(r.partitionColumns == "p")
    assert(PjVacuum.distributedWaves.get() > wavesBefore,
      "a 9-directory frontier must list as a Spark job")
    val df = spark.read.format("pjparquet").load(t)
    assert(df.count() == 900L)
    assert(df.filter($"p" === 3).count() == 100L)
    // the converted table is a full citizen: DML + time travel
    spark.sql(s"DELETE FROM pjconv.`$t` WHERE p = 3")
    assert(spark.table(s"pjconv.`$t`").count() == 800L)
    assert(spark.read.format("pjparquet").option("versionAsOf", "1")
      .load(t).count() == 900L, "version 1 is the converted snapshot")
  }

  test("inference round-trips: leading-zero values stay string, invalid dates stay string") {
    // k=00 would become bigint 0 under naive inference, breaking the
    // round-trip with the raw directory value
    val t = freshDir("pj_conv_lz")
    spark.range(0, 4).select($"id", lit("00").as("k")).write.partitionBy("k").parquet(t)
    spark.range(4, 8).select($"id", lit("01").as("k"))
      .write.mode("append").partitionBy("k").parquet(t)
    PjConvert.convert(spark, t)
    val df = spark.read.format("pjparquet").load(t)
    assert(df.schema("k").dataType == org.apache.spark.sql.types.StringType,
      s"leading-zero partition values must stay string: ${df.schema("k").dataType}")
    assert(df.filter($"k" === "00").count() == 4L)
    // 2024-13-99 matches the date SHAPE but does not parse — string, and
    // every raw value stays queryable verbatim
    val t2 = freshDir("pj_conv_baddate")
    spark.range(0, 3).select($"id", lit("2024-13-99").as("d"))
      .write.partitionBy("d").parquet(t2)
    spark.range(3, 6).select($"id", lit("2024-01-15").as("d"))
      .write.mode("append").partitionBy("d").parquet(t2)
    PjConvert.convert(spark, t2)
    val df2 = spark.read.format("pjparquet").load(t2)
    assert(df2.schema("d").dataType == org.apache.spark.sql.types.StringType)
    assert(df2.filter($"d" === "2024-13-99").count() == 3L)
    // genuinely canonical values still infer their types
    val t3 = freshDir("pj_conv_canon")
    spark.range(0, 4).select($"id", lit("2024-01-15").as("d")).write.partitionBy("d").parquet(t3)
    PjConvert.convert(spark, t3)
    assert(spark.read.format("pjparquet").load(t3).schema("d").dataType ==
      org.apache.spark.sql.types.DateType)
  }

  test("declared partition types pin over inference; mismatched declaration refuses") {
    val t = freshDir("pj_conv_spec")
    spark.range(0, 20).select($"id", format_string("%02d", $"id" % 2).as("k"))
      .write.partitionBy("k").parquet(t)
    val bad = intercept[PJException](
      PjConvert.convert(spark, t, partitionSpec = Some("wrong:string")))
    assert(bad.getMessage.contains("do not match"))
    PjConvert.convert(spark, t, partitionSpec = Some("k:string"))
    val df = spark.read.format("pjparquet").load(t)
    // numeric-looking values stay STRING under the declared type
    assert(df.schema("k").dataType == org.apache.spark.sql.types.StringType)
    assert(df.filter($"k" === "00").count() == 10L)
  }

  test("schema-evolved directory: additive merge, missing columns read as null; conflicts refuse") {
    val t = freshDir("pj_conv_evo")
    Seq((1L, "a")).toDF("id", "s").write.parquet(t + "/part1")
    // relocate the inner files into one flat dir
    val flat = freshDir("pj_conv_evo_flat")
    new java.io.File(flat).mkdirs()
    def adopt(src: String, prefix: String): Unit =
      new java.io.File(src).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(flat, prefix + f.getName)))
    adopt(t + "/part1", "g1_")
    Seq((2L, "b", 99L)).toDF("id", "s", "extra").write.parquet(t + "/part2")
    adopt(t + "/part2", "g2_")
    PjConvert.convert(spark, flat)
    val rows = spark.read.format("pjparquet").option("mergeSchema", "true").load(flat)
      .select($"id", $"s", $"extra").collect().map(r =>
        (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(rows == Set((1L, "a", -1L), (2L, "b", 99L)))

    // a real type conflict refuses before committing anything
    val bad = freshDir("pj_conv_conflict")
    new java.io.File(bad).mkdirs()
    Seq(("x", 1L)).toDF("a", "b").write.parquet(bad + "/g1")
    Seq((1L, "y")).toDF("a", "b").write.parquet(bad + "/g2")
    def adoptTo(src: String, dst: String, prefix: String): Unit =
      new java.io.File(src).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(dst, prefix + f.getName)))
    adoptTo(bad + "/g1", bad, "g1_")
    adoptTo(bad + "/g2", bad, "g2_")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(bad + "/g1"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(bad + "/g2"))
    val e = intercept[PJException](PjConvert.convert(spark, bad))
    assert(e.getMessage.contains("type conflict"))
    assert(!PjCommitLog.isEnabled(
      new Path(bad).getFileSystem(spark.sessionState.newHadoopConf()), new Path(bad)),
      "a failed convert must leave no log behind")
  }

  test("empty and ragged layouts refuse loudly") {
    val empty = freshDir("pj_conv_empty")
    new java.io.File(empty).mkdirs()
    assert(intercept[PJException](PjConvert.convert(spark, empty))
      .getMessage.contains("no parquet data files"))

    val ragged = freshDir("pj_conv_ragged")
    spark.range(0, 10).select($"id", lit(1L).as("p"))
      .write.partitionBy("p").parquet(ragged + "/a")
    spark.range(0, 10).toDF("id").write.parquet(ragged + "/b")
    // merge both shapes under one root: a/p=1/... vs b/...
    assert(intercept[PJException](PjConvert.convert(spark, ragged))
      .getMessage.contains("inconsistent partition layouts"))
  }
}
