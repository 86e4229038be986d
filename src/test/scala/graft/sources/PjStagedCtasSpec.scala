package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.PJException
import graft.sources.pjparquet.PjCommitLog

/** Atomic CTAS / RTAS through the StagingTableCatalog lane: CREATE AS
  * SELECT publishes a fully-materialized table by one directory rename (a
  * failed query leaves nothing), REPLACE AS SELECT flips a commit-log
  * table with one exclusive commit while the previous generation stays
  * time-travelable.
  */
class PjStagedCtasSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.pjctas", "graft.sources.pjparquet.PjCatalog")

  private def freshPath(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(tag)
    java.nio.file.Files.delete(d)
    d.toString
  }

  private def head(t: String) = {
    val root = new Path(t)
    PjCommitLog.latest(root.getFileSystem(spark.sessionState.newHadoopConf()), root).get
  }

  test("CTAS: one atomic publish, data + schema + partitioning all land") {
    val t = freshPath("pj_ctas")
    spark.sql(s"CREATE TABLE pjctas.`$t` USING pjparquet PARTITIONED BY (p) AS " +
      "SELECT id, CAST(id % 3 AS BIGINT) AS p FROM range(300)")
    val df = spark.table(s"pjctas.`$t`")
    assert(df.count() == 300L)
    assert(df.filter($"p" === 1).count() == 100L)
    assert(df.schema.fieldNames.toSeq.sorted == Seq("id", "p"))
    // the published log carries the create + the data commit
    assert(head(t).version == 2L, "create commit + CTAS data commit")
    assert(head(t).entries.nonEmpty && head(t).entries.forall(_.planned))
    // partition layout is real Hive dirs
    assert(new java.io.File(t, "p=2").isDirectory)
    // a second CTAS at the same path refuses
    val e = intercept[Exception](
      spark.sql(s"CREATE TABLE pjctas.`$t` USING pjparquet AS SELECT 1L AS id"))
    assert(e.getMessage.toLowerCase.contains("already exists"))
  }

  test("failed CTAS leaves NOTHING: no final dir, no staging junk") {
    val t = freshPath("pj_ctas_fail")
    spark.udf.register("pj_ctas_boom",
      (x: Long) => { if (x > 5) throw new RuntimeException("boom"); x })
    intercept[Exception](
      spark.sql(s"CREATE TABLE pjctas.`$t` USING pjparquet AS " +
        "SELECT pj_ctas_boom(id) AS id FROM range(10)"))
    assert(!new java.io.File(t).exists(), "failed CTAS must not create the table")
    val leftovers = Option(new java.io.File(t).getParentFile.listFiles()).toSeq.flatten
      .map(_.getName).filter(_.contains(new Path(t).getName))
    assert(leftovers.isEmpty, s"staging dirs must be cleaned up: $leftovers")
  }

  test("wide RTAS moves the staged generation as ONE Spark job") {
    val t = freshPath("pj_rtas_wide")
    spark.sql(s"CREATE TABLE pjctas.`$t` (id BIGINT) USING pjparquet")
    spark.range(0, 10).writeTo(s"pjctas.`$t`").append()
    val before = graft.sources.pjparquet.PjStagedTable.distributedMoves.get()
    spark.sql(s"REPLACE TABLE pjctas.`$t` USING pjparquet AS " +
      "SELECT /*+ REPARTITION(70) */ id FROM range(7000)")
    assert(graft.sources.pjparquet.PjStagedTable.distributedMoves.get() > before,
      "a 70-file staged move must run as a Spark job")
    val df = spark.table(s"pjctas.`$t`")
    assert(df.count() == 7000L)
    assert(df.agg(sum($"id")).head().getLong(0) == (0L until 7000L).sum)
    assert(head(t).entries.size == 70, "every staged file landed as a live entry")
  }

  test("RTAS: atomic flip with new schema, previous generation time-travels; plain dirs refuse") {
    val t = freshPath("pj_rtas")
    spark.sql(s"CREATE TABLE pjctas.`$t` (id BIGINT, v STRING) USING pjparquet")
    spark.range(0, 50).select($"id", concat(lit("v"), $"id").as("v"))
      .writeTo(s"pjctas.`$t`").append()
    val vBefore = head(t).version
    spark.sql(s"REPLACE TABLE pjctas.`$t` USING pjparquet AS " +
      "SELECT id * 10 AS k, CAST(id AS DOUBLE) AS score FROM range(7)")
    val df = spark.table(s"pjctas.`$t`")
    assert(df.schema.fieldNames.toSeq == Seq("k", "score"))
    assert(df.count() == 7L)
    assert(df.agg(sum($"k")).head().getLong(0) == 210L)
    // one commit did the flip; the old generation is still addressable
    assert(head(t).version == vBefore + 1)
    val old = spark.read.format("pjparquet")
      .option("versionAsOf", vBefore.toString).load(t)
    assert(old.count() == 50L && old.schema.fieldNames.toSeq == Seq("id", "v"))
    // CREATE OR REPLACE on a MISSING table creates
    val t2 = freshPath("pj_rtas_new")
    spark.sql(s"CREATE OR REPLACE TABLE pjctas.`$t2` USING pjparquet AS " +
      "SELECT id FROM range(5)")
    assert(spark.table(s"pjctas.`$t2`").count() == 5L)
    // REPLACE on a missing table refuses
    val t3 = freshPath("pj_rtas_missing")
    val missing = intercept[Exception](
      spark.sql(s"REPLACE TABLE pjctas.`$t3` USING pjparquet AS SELECT 1L AS a"))
    assert(missing.getMessage.toLowerCase.contains("cannot be found") ||
      missing.getMessage.toLowerCase.contains("not found"),
      s"unexpected: ${missing.getMessage}")
    // REPLACE over a plain (unlogged) parquet dir points at convert
    val plain = freshPath("pj_rtas_plain")
    spark.range(0, 10).write.parquet(plain)
    val e = intercept[Exception](
      spark.sql(s"REPLACE TABLE pjctas.`$plain` USING pjparquet AS SELECT 1L AS a"))
    assert(e.getMessage.contains("convert"), s"unexpected: ${e.getMessage}")
  }
}
