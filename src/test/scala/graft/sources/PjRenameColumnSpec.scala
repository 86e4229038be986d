package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.PJException
import graft.sources.pjparquet.{PjColumnMapping, PjCommitLog}

/** RENAME COLUMN via column mapping ([[PjColumnMapping]]): metadata-only
  * renames, frozen physical names across generations, stale-writer
  * refusal, guard rails, and interplay with DML / compaction / time
  * travel / restore.
  */
class PjRenameColumnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.pjr", "graft.sources.pjparquet.PjCatalog")

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"pj_rename_$tag").toString

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def physicalCols(dir: String, rel: String): Seq[String] =
    spark.read.parquet(s"$dir/$rel").columns.toSeq

  test("a stale writer's commit (planned pre-rename) never erases the rename") {
    // r17 fuzzer regression (seed 10055): a commit whose lane schema was
    // captured BEFORE a concurrent RENAME carries the old logical name —
    // exactly the renamed field's frozen physical name, so its data is
    // correct — but the commit-time widen recorded the stale schema
    // as-is, erasing the rename. The widen now maps stale physical names
    // back to the current logical field.
    val dir = tempDir("stale_widen")
    spark.range(0, 5).select($"id", ($"id" * 7).as("val")).coalesce(1)
      .write.format("pjparquet").mode("append").option("log.enabled", "true").save(dir)
    spark.sql(s"ALTER TABLE pjr.`$dir` RENAME COLUMN val TO amount")
    // simulate the stale writer's commit: widenSchema with the OLD name
    val stale = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("val",
        org.apache.spark.sql.types.LongType, nullable = true)))
    PjCommitLog.commit(fsOf(dir), new Path(dir), "append", Nil, Set.empty,
      dataSchemaJson = Some(stale.json), widenSchema = true)
    PjCommitLog.clearSnapshotCache()
    val recorded = org.apache.spark.sql.types.DataType.fromJson(
      PjCommitLog.latest(fsOf(dir), new Path(dir)).get.dataSchemaJson.get)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(recorded.fieldNames.toSeq == Seq("id", "amount"),
      s"the rename must survive a stale writer's widen: ${recorded.fieldNames.toSeq}")
    // and the mapping metadata is intact (amount still stores as 'val')
    assert(recorded.fields.find(_.name == "amount")
      .exists(f => graft.sources.pjparquet.PjColumnMapping.physicalName(f) == "val"))
  }

  test("rename is metadata-only; both generations read; new writes store the OLD physical name") {
    val dir = tempDir("basic")
    spark.range(0, 10).select($"id", ($"id" * 7).as("val")).coalesce(1)
      .write.format("pjparquet").mode("append").option("log.enabled", "true").save(dir) // v1
    val v1Files = PjCommitLog.latest(fsOf(dir), new Path(dir)).get.entries.map(_.path)
    spark.sql(s"ALTER TABLE pjr.`$dir` RENAME COLUMN val TO amount") // v2: metadata-only
    val head = PjCommitLog.latest(fsOf(dir), new Path(dir)).get
    assert(head.version == 2L && head.entries.map(_.path) == v1Files, "no file rewritten")
    // logical schema shows the new name; pre-rename files keep serving
    val t = spark.read.format("pjparquet").load(dir)
    assert(t.columns.toSeq == Seq("id", "amount"))
    assert(t.agg(sum($"amount")).head().getLong(0) == (0L until 10L).map(_ * 7).sum)
    // post-rename append under the NEW logical name...
    spark.range(10, 15).select($"id", ($"id" * 7).as("amount")).coalesce(1)
      .write.format("pjparquet").mode("append").save(dir) // v3
    val t2 = spark.read.format("pjparquet").load(dir)
    assert(t2.count() == 15L)
    assert(t2.agg(sum($"amount")).head().getLong(0) == (0L until 15L).map(_ * 7).sum)
    // ...physically stores the FROZEN OLD name (generations stay uniform)
    val newRel = PjCommitLog.latest(fsOf(dir), new Path(dir)).get
      .entries.map(_.path).filterNot(v1Files.contains).head
    assert(physicalCols(dir, newRel) == Seq("id", "val"),
      s"new file must store the physical name, got ${physicalCols(dir, newRel)}")
    // the mapping survives the append's schema widening/recording
    val recorded = org.apache.spark.sql.types.DataType.fromJson(
      PjCommitLog.latest(fsOf(dir), new Path(dir)).get.dataSchemaJson.get)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(PjColumnMapping.physicalName(recorded("amount")) == "val")
    // filters + pruning on the renamed column still answer exactly
    assert(t2.filter($"amount" > 70).count() == 4L)
    // double rename: amount -> total keeps the ORIGINAL physical name
    spark.sql(s"ALTER TABLE pjr.`$dir` RENAME COLUMN amount TO total")
    val t3 = spark.read.format("pjparquet").load(dir)
    assert(t3.columns.toSeq == Seq("id", "total"))
    assert(t3.agg(sum($"total")).head().getLong(0) == (0L until 15L).map(_ * 7).sum)
  }

  test("stale writer naming the old column refuses loudly") {
    val dir = tempDir("stale")
    spark.range(0, 5).select($"id", $"id".as("old_name")).coalesce(1)
      .write.format("pjparquet").mode("append").option("log.enabled", "true").save(dir)
    spark.sql(s"ALTER TABLE pjr.`$dir` RENAME COLUMN old_name TO new_name")
    val e = intercept[Exception] {
      spark.range(5, 8).select($"id", $"id".as("old_name")).coalesce(1)
        .write.format("pjparquet").mode("append").save(dir)
    }
    assert(e.getMessage.contains("old_name"), s"got: ${e.getMessage}")
  }

  test("time travel before the rename serves the old name; restore rolls the rename back") {
    val dir = tempDir("tt")
    spark.range(0, 5).select($"id", $"id".as("a")).coalesce(1)
      .write.format("pjparquet").mode("append").option("log.enabled", "true").save(dir) // v1
    spark.sql(s"ALTER TABLE pjr.`$dir` RENAME COLUMN a TO b") // v2
    assert(spark.read.format("pjparquet").option("versionAsOf", "1").load(dir)
      .columns.toSeq == Seq("id", "a"))
    assert(spark.read.format("pjparquet").load(dir).columns.toSeq == Seq("id", "b"))
    graft.sources.pjparquet.PjRestore.restore(spark, dir, 1L) // v3: schema rolls back
    assert(spark.read.format("pjparquet").load(dir).columns.toSeq == Seq("id", "a"))
  }

  test("guards: partition/rename-collision/physical-name-reuse all refuse") {
    val dir = tempDir("guards")
    spark.range(0, 6).select($"id", ($"id" % 2).as("p"), $"id".as("x")).coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").partitionBy("p").save(dir)
    val e1 = intercept[Exception](
      spark.sql(s"ALTER TABLE pjr.`$dir` RENAME COLUMN p TO q"))
    assert(e1.getMessage.toLowerCase.contains("partition"))
    val e2 = intercept[Exception](
      spark.sql(s"ALTER TABLE pjr.`$dir` RENAME COLUMN x TO id"))
    assert(e2.getMessage.contains("already exists"))
    spark.sql(s"ALTER TABLE pjr.`$dir` RENAME COLUMN x TO y")
    // re-using the renamed-away name for a NEW column would read x's bytes
    val e3 = intercept[Exception](
      spark.sql(s"ALTER TABLE pjr.`$dir` ADD COLUMN x LONG"))
    assert(e3.getMessage.contains("x"), s"got: ${e3.getMessage}")
    val e4 = intercept[Exception](
      spark.sql(s"ALTER TABLE pjr.`$dir` RENAME COLUMN y TO _pos"))
    assert(e4.getMessage.contains("reserved"))
  }

  test("DV DELETE with a predicate on the renamed column; compaction stays physically uniform") {
    val dir = tempDir("dml")
    spark.range(0, 20).select($"id", ($"id" * 3).as("v")).repartition(2)
      .write.format("pjparquet").mode("append").option("log.enabled", "true").save(dir) // v1
    spark.sql(s"ALTER TABLE pjr.`$dir` RENAME COLUMN v TO score") // v2
    spark.sql("DROP TABLE IF EXISTS pj_rename_dml")
    spark.sql(s"CREATE TABLE pj_rename_dml USING pjparquet OPTIONS (path '$dir')")
    spark.sql("DELETE FROM pj_rename_dml WHERE score >= 45") // v3: DV path
    val t = spark.read.format("pjparquet").load(dir)
    assert(t.count() == 15L)
    assert(t.agg(max($"score")).head().getLong(0) == 42L)
    // UPDATE through the renamed name (merge-on-read)
    spark.sql("UPDATE pj_rename_dml SET score = 0 WHERE id < 3") // v4
    assert(spark.table("pj_rename_dml").filter($"score" === 0).count() == 3L) // ids 0,1,2
    // compaction materializes vectors and keeps PHYSICAL names
    val rep = graft.sources.pjparquet.PjCompaction.compact(spark, dir, smallThreshold = 1L)
    assert(rep.compactedInto > 0)
    val head = PjCommitLog.latest(fsOf(dir), new Path(dir)).get
    head.entries.foreach { e =>
      assert(physicalCols(dir, e.path).contains("v"),
        s"compacted file ${e.path} must keep the physical name 'v'")
    }
    val after = spark.read.format("pjparquet").load(dir)
    assert(after.columns.toSeq == Seq("id", "score"))
    assert(after.count() == 15L)
    assert(after.filter($"score" === 0).count() == 3L)
    spark.sql("DROP TABLE IF EXISTS pj_rename_dml")
  }

  test("stats pruning by entry envelope still fires on the renamed column (zero index loads)") {
    val dir = tempDir("prune")
    // two files with disjoint id ranges; filter on the renamed column must
    // prune the non-matching file from the PLAN (file count in partitions)
    spark.range(0, 100).select($"id", $"id".as("k")).coalesce(1)
      .write.format("pjparquet").mode("append").option("log.enabled", "true").save(dir)
    spark.range(1000, 1100).select($"id", $"id".as("k")).coalesce(1)
      .write.format("pjparquet").mode("append").save(dir)
    spark.sql(s"ALTER TABLE pjr.`$dir` RENAME COLUMN k TO key")
    val df = spark.read.format("pjparquet").load(dir).filter($"key" >= 1000)
    assert(df.count() == 100L)
    val scans = df.queryExecution.executedPlan.collectLeaves()
    val parts = scans.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.partitions.flatten.size
    }.sum
    assert(parts == 1, s"stats pruning must drop the non-matching file, planned $parts")
  }

  test("renaming a column referenced by a generation expression refuses at DDL time") {
    val p = {
      val d = java.nio.file.Files.createTempDirectory("pj_rename_gen")
      java.nio.file.Files.delete(d)
      d.toString
    }
    spark.sql(s"CREATE TABLE pjr.`$p` (x BIGINT, " +
      "doubled BIGINT GENERATED ALWAYS AS (x * 2)) USING pjparquet")
    import spark.implicits._
    Seq(1L, 2L).toDF("x").write.format("pjparquet").mode("append").save(p)
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE pjr.`$p` RENAME COLUMN x TO y"))
    assert(e.getMessage.contains("doubled") && e.getMessage.contains("references it"),
      s"got: ${e.getMessage}")
    // the generated column ITSELF renames fine (nothing references it)
    spark.sql(s"ALTER TABLE pjr.`$p` RENAME COLUMN doubled TO twice")
    val got = spark.table(s"pjr.`$p`").orderBy("x")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (2L, 4L)))
    // and generation still computes for new writes under the new name
    Seq(5L).toDF("x").write.format("pjparquet").mode("append").save(p)
    assert(spark.table(s"pjr.`$p`").where($"x" === 5L)
      .select("twice").as[Long].head() == 10L)
  }
}
