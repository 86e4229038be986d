package graft.sources

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** `writeStream` into a pjparquet table ([[graft.sources.pjparquet.PjStreamingWrite]]):
  * epoch-committed appends into a Hive-partitioned layout created from an
  * EMPTY path, every epoch's files index-planned at commit, appends across
  * separate runs sharing one checkpoint (the restart path), no duplication.
  */
class PjStreamingSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming appends into a partitioned table from an empty path, index-planned") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("pj_stream_src").toString
    val cp = java.nio.file.Files.createTempDirectory("pj_stream_cp").toString
    val tableDir = java.nio.file.Files.createTempDirectory("pj_stream_tbl").toString + "/t"

    spark.sql("DROP TABLE IF EXISTS pj_stream_t")
    spark.sql(
      s"""CREATE TABLE pj_stream_t (id BIGINT, k BIGINT)
         |USING pjparquet OPTIONS (path '$tableDir', partitionedBy 'k')""".stripMargin)

    def stage(ids: Range): Unit =
      ids.map(i => (i.toLong, (i % 2).toLong)).toDF("id", "k")
        .coalesce(1).write.mode("append").parquet(src)

    def drainOnce(): Unit = {
      val q = spark.readStream
        .schema("id BIGINT, k BIGINT")
        .parquet(src)
        .writeStream
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .toTable("pj_stream_t")
      q.awaitTermination(120000)
      assert(!q.isActive, "stream must have drained")
    }

    stage(0 until 5)
    drainOnce()
    // readback refuses autogen: every streamed file must carry a sidecar
    val read1 = spark.read.format("pjparquet").option("index.autogen", "false")
      .load(tableDir).as[(Long, Long)].collect().toSet
    assert(read1 == (0 until 5).map(i => (i.toLong, (i % 2).toLong)).toSet)

    // second run, same checkpoint: only the NEW file is processed — appends,
    // never duplicates (the restart path)
    stage(5 until 9)
    drainOnce()
    val read2 = spark.read.format("pjparquet").option("index.autogen", "false")
      .load(tableDir).as[(Long, Long)].collect().toSet
    assert(read2 == (0 until 9).map(i => (i.toLong, (i % 2).toLong)).toSet)

    // Hive layout materialized per partition value
    val dirs = new java.io.File(tableDir).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("k=0", "k=1"))
    spark.sql("DROP TABLE IF EXISTS pj_stream_t")
  }

  test("CHECK constraints enforce per epoch: a violating epoch commits NOTHING") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("pj_stream_ck_src").toString
    val cp = java.nio.file.Files.createTempDirectory("pj_stream_ck_cp").toString
    val tableDirP = java.nio.file.Files.createTempDirectory("pj_stream_ck_tbl")
    java.nio.file.Files.delete(tableDirP)
    val tableDir = tableDirP.toString
    spark.conf.set("spark.sql.catalog.pjsck", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"CREATE TABLE pjsck.`$tableDir` (id BIGINT, x BIGINT) USING pjparquet")
    spark.sql(s"ALTER TABLE pjsck.`$tableDir` ADD CONSTRAINT x_pos CHECK (x > 0)")
    def drain(): Unit = {
      val q = spark.readStream.schema("id BIGINT, x BIGINT").parquet(src)
        .writeStream.format("pjparquet")
        .option("path", tableDir).option("checkpointLocation", cp)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      q.exception.foreach(throw _)
    }
    // clean epoch lands
    Seq((1L, 10L), (2L, 20L)).toDF("id", "x").coalesce(1).write.mode("append").parquet(src)
    drain()
    assert(spark.read.format("pjparquet").load(tableDir).count() == 2L)
    // NULL passes (ANSI CHECK), a definitive FALSE fails the whole epoch
    Seq((3L, Option.empty[Long])).toDF("id", "x").coalesce(1)
      .write.mode("append").parquet(src)
    drain()
    assert(spark.read.format("pjparquet").load(tableDir).count() == 3L)
    Seq((4L, Some(-5L)), (5L, Some(50L))).toDF("id", "x").coalesce(1)
      .write.mode("append").parquet(src)
    val e = intercept[Exception](drain())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m => m.contains("x_pos") && m.contains("violated")),
      s"expected the constraint name in the failure, got: ${messages(e).take(3)}")
    // NOTHING from the violating epoch landed — not even row 5
    assert(spark.read.format("pjparquet").load(tableDir).count() == 3L,
      "a violating epoch must commit nothing")
  }

  test("generated columns compute in-stream; constraints see the computed values") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("pj_stream_gen_src").toString
    val cp = java.nio.file.Files.createTempDirectory("pj_stream_gen_cp").toString
    val tableDirP = java.nio.file.Files.createTempDirectory("pj_stream_gen_tbl")
    java.nio.file.Files.delete(tableDirP)
    val tableDir = tableDirP.toString
    spark.conf.set("spark.sql.catalog.pjsg", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"CREATE TABLE pjsg.`$tableDir` (x BIGINT, " +
      "doubled BIGINT GENERATED ALWAYS AS (x * 2)) USING pjparquet")
    // constraint over the GENERATED column: enforcement must run on the
    // post-augment row
    spark.sql(s"ALTER TABLE pjsg.`$tableDir` ADD CONSTRAINT d_cap CHECK (doubled < 100)")
    Seq(1L, 2L, 3L).toDF("x").coalesce(1).write.mode("append").parquet(src)
    val q = spark.readStream.schema("x BIGINT").parquet(src)
      .writeStream.format("pjparquet")
      .option("path", tableDir).option("checkpointLocation", cp)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    q.exception.foreach(throw _)
    val got = spark.read.format("pjparquet").load(tableDir)
      .orderBy("x").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (2L, 4L), (3L, 6L)),
      s"generated column must compute in-stream, got $got")
    // an epoch whose COMPUTED value violates fails and commits nothing
    Seq(60L).toDF("x").coalesce(1).write.mode("append").parquet(src)
    val e = intercept[Exception] {
      val q2 = spark.readStream.schema("x BIGINT").parquet(src)
        .writeStream.format("pjparquet")
        .option("path", tableDir).option("checkpointLocation", cp)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q2.awaitTermination(120000)
      q2.exception.foreach(throw _)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("d_cap")),
      s"expected d_cap violation, got: ${messages(e).take(3)}")
    assert(spark.read.format("pjparquet").load(tableDir).count() == 3L)
  }

  test("complete output mode is rejected loudly") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("pj_stream_cm_src").toString
    val cp = java.nio.file.Files.createTempDirectory("pj_stream_cm_cp").toString
    val tableDir = java.nio.file.Files.createTempDirectory("pj_stream_cm_tbl").toString + "/t"
    Seq((1L, 1L)).toDF("id", "k").coalesce(1).write.mode("append").parquet(src)
    spark.sql("DROP TABLE IF EXISTS pj_stream_cm")
    spark.sql(
      s"""CREATE TABLE pj_stream_cm (k BIGINT, n BIGINT)
         |USING pjparquet OPTIONS (path '$tableDir')""".stripMargin)
    val e = intercept[Exception] {
      val q = spark.readStream.schema("id BIGINT, k BIGINT").parquet(src)
        .groupBy($"k").count().withColumnRenamed("count", "n")
        .select($"k", $"n")
        .writeStream.option("checkpointLocation", cp)
        .outputMode("complete").trigger(Trigger.AvailableNow())
        .toTable("pj_stream_cm")
      q.awaitTermination(120000)
      q.exception.foreach(throw _)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("append output mode only")),
      s"expected the loud append-only error, got: ${messages(e).mkString(" | ")}")
    spark.sql("DROP TABLE IF EXISTS pj_stream_cm")
  }
}
