package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.PjCommitLog

/** Optimized writes (`pj.optimizeWrite.enabled`, Delta parity): the write
  * declares its distribution NON-strict with an advisory partition size, so
  * Spark plans `RebalancePartitions` and AQE sizes each written file — a
  * many-task upstream stage coalesces into few right-sized files instead of
  * one small file per task (the 1000-executor small-file storm), and a
  * skewed hot partition splits across writers instead of serializing on one.
  */
class PjOptimizeWriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.pjow", "graft.sources.pjparquet.PjCatalog")

  private def liveFiles(t: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(t)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    PjCommitLog.latest(fs, root).get.files
  }

  private def freshDir(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(tag)
    java.nio.file.Files.delete(dir)
    dir.toString
  }

  test("unpartitioned: a many-task upstream coalesces to one right-sized file; off = one file per task") {
    val t = freshDir("pj_ow_on")
    spark.sql(s"CREATE TABLE pjow.`$t` (id BIGINT, v BIGINT) USING pjparquet " +
      "TBLPROPERTIES ('pj.optimizeWrite.enabled'='true')")
    spark.range(0, 1000).select($"id", ($"id" * 2).as("v")).repartition(8)
      .writeTo(s"pjow.`$t`").append()
    assert(liveFiles(t).size == 1,
      s"8 tiny shuffle partitions must coalesce under the 128 MiB advisory: ${liveFiles(t)}")
    assert(spark.table(s"pjow.`$t`").agg(sum($"v")).head().getLong(0) == 999L * 1000L)

    val off = freshDir("pj_ow_off")
    spark.sql(s"CREATE TABLE pjow.`$off` (id BIGINT, v BIGINT) USING pjparquet")
    spark.range(0, 1000).select($"id", ($"id" * 2).as("v")).repartition(8)
      .writeTo(s"pjow.`$off`").append()
    assert(liveFiles(off).size == 8, "without the property every task writes its own file")
  }

  test("partitioned: small per-key shards coalesce while files stay partition-pure") {
    val t = freshDir("pj_ow_part")
    spark.sql(s"CREATE TABLE pjow.`$t` (id BIGINT, p BIGINT) USING pjparquet " +
      "PARTITIONED BY (p) TBLPROPERTIES ('pj.optimizeWrite.enabled'='true')")
    // 8 upstream tasks × 2 partition values: strict clustering would give 2
    // files; optimized writes must also give 2 (coalesced), never 16, and
    // every file holds exactly one partition value (layout invariant)
    spark.range(0, 2000).select($"id", ($"id" % 2).as("p")).repartition(8)
      .writeTo(s"pjow.`$t`").append()
    val files = liveFiles(t)
    assert(files.size == 2, s"one right-sized file per partition value: $files")
    assert(files.forall(f => f.contains("p=0") || f.contains("p=1")))
    assert(spark.table(s"pjow.`$t`").count() == 2000)
  }

  test("skewed hot partition splits across writers when it exceeds the advisory bin") {
    val t = freshDir("pj_ow_skew")
    spark.sql(s"CREATE TABLE pjow.`$t` (s STRING, p BIGINT) USING pjparquet " +
      "PARTITIONED BY (p) TBLPROPERTIES ('pj.optimizeWrite.enabled'='true', " +
      "'pj.optimizeWrite.binSize'='65536')")
    // ~6 MB of rows, all in partition p=0: a strict clustered write
    // serializes them on ONE task; the 64 KiB advisory must split them
    val big = spark.range(0, 20000)
      .select(concat(lit("x" * 300), $"id".cast("string")).as("s"), lit(0L).as("p"))
      .repartition(8)
    big.writeTo(s"pjow.`$t`").append()
    val files = liveFiles(t)
    assert(files.size > 1, s"the hot partition must split across writers: ${files.size} file(s)")
    assert(files.forall(_.contains("p=0")))
    assert(spark.table(s"pjow.`$t`").count() == 20000)
  }

  test("explicit optimizeWrite=false write option overrides the table property") {
    val t = freshDir("pj_ow_opt")
    spark.sql(s"CREATE TABLE pjow.`$t` (id BIGINT) USING pjparquet " +
      "TBLPROPERTIES ('pj.optimizeWrite.enabled'='true')")
    spark.range(0, 100).repartition(4)
      .write.format("pjparquet").mode("append")
      .option("optimizeWrite", "false").save(t)
    assert(liveFiles(t).size == 4, "the per-write opt-out must win over the property")
    assert(spark.table(s"pjow.`$t`").count() == 100)
  }

  test("property validation: bad binSize fails the DDL loudly") {
    val t = freshDir("pj_ow_bad")
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE pjow.`$t` (id BIGINT) USING pjparquet " +
        "TBLPROPERTIES ('pj.optimizeWrite.binSize'='-5')")
    }
    assert(e.getMessage.contains("pj.optimizeWrite.binSize"))
  }
}
