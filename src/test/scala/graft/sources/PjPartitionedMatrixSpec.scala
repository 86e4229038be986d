package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.{PjCommitLog, PjCompaction, PjCopyInto}

/** Hive-PARTITIONED tables through the full table-format matrix. The
  * round-15 DV-DELETE planning bug existed precisely because every
  * merge-on-read spec ran unpartitioned — this suite pins the partitioned
  * lane for the features that mint identities, move rows, and ingest.
  */
class PjPartitionedMatrixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.pjpm", "graft.sources.pjparquet.PjCatalog")

  private def freshPath(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(tag)
    java.nio.file.Files.delete(d)
    d.toString
  }

  private def head(t: String) = {
    val root = new Path(t)
    PjCommitLog.latest(root.getFileSystem(spark.sessionState.newHadoopConf()), root).get
  }

  test("row tracking on a partitioned table: ids stable through DV UPDATE and compaction") {
    val t = freshPath("pj_pm_rowid")
    spark.sql(s"CREATE TABLE pjpm.`$t` (id BIGINT, p BIGINT) USING pjparquet " +
      "PARTITIONED BY (p) TBLPROPERTIES ('pj.rowTracking.required'='true')")
    spark.range(0, 300).select($"id", ($"id" % 3).as("p")).writeTo(s"pjpm.`$t`").append()
    val before = spark.table(s"pjpm.`$t`")
      .selectExpr("id", "_row_id").as[(Long, Long)].collect().toMap
    assert(before.size == 300 && before.values.toSet.size == 300,
      "every row minted a distinct stable id")
    // merge-on-read UPDATE keeps the updated rows' ids (per partition dirs)
    spark.sql(s"UPDATE pjpm.`$t` SET id = id + 1000 WHERE id % 10 = 7")
    val afterUpdate = spark.table(s"pjpm.`$t`")
      .selectExpr("id", "_row_id").as[(Long, Long)].collect().toMap
    (0L until 300L).filter(_ % 10 == 7).foreach { orig =>
      assert(afterUpdate(orig + 1000) == before(orig),
        s"updated row $orig must keep its stable id across the partitioned rewrite")
    }
    // compaction materializes ids per partition directory
    PjCompaction.compact(spark, t, smallThreshold = Long.MaxValue)
    val afterCompact = spark.table(s"pjpm.`$t`")
      .selectExpr("id", "_row_id").as[(Long, Long)].collect().toMap
    assert(afterCompact == afterUpdate, "compaction must not move any id")
  }

  test("copy_into a PARTITIONED table: staged rows land under their partition dirs, idempotent") {
    val t = freshPath("pj_pm_copy")
    spark.sql(s"CREATE TABLE pjpm.`$t` (id BIGINT, p BIGINT) USING pjparquet " +
      "PARTITIONED BY (p)")
    val staging = java.nio.file.Files.createTempDirectory("pj_pm_copy_src").toString
    spark.range(0, 120).select($"id", ($"id" % 4).as("p")).coalesce(2)
      .write.mode("overwrite").parquet(s"$staging/batch1")
    val r1 = PjCopyInto.copyInto(spark, t, staging)
    assert(r1.filesIngested > 0 && r1.rowsIngested == 120L)
    val df = spark.table(s"pjpm.`$t`")
    assert(df.count() == 120L)
    assert(df.filter($"p" === 2).count() == 30L)
    // real Hive layout landed (partition-pure files)
    assert(head(t).files.forall(f => (0 to 3).exists(v => f.startsWith(s"p=$v/"))),
      s"ingested files must land under partition dirs: ${head(t).files}")
    // rerun = metadata-rate no-op
    val r2 = PjCopyInto.copyInto(spark, t, staging)
    assert(r2.filesIngested == 0 && r2.rowsIngested == 0)
    assert(spark.table(s"pjpm.`$t`").count() == 120L)
  }

  test("partitioned MERGE (merge-on-read) incl. an UPDATE that moves a row ACROSS partitions") {
    val t = freshPath("pj_pm_merge")
    spark.sql(s"CREATE TABLE pjpm.`$t` (id BIGINT, p BIGINT, v STRING) USING pjparquet " +
      "PARTITIONED BY (p)")
    spark.range(0, 100)
      .select($"id", ($"id" % 2).as("p"), concat(lit("v"), $"id").as("v"))
      .writeTo(s"pjpm.`$t`").append()
    spark.range(0, 120)
      .select($"id", lit(9L).as("p"), concat(lit("n"), $"id").as("v"))
      .createOrReplaceTempView("pj_pm_merge_src")
    // matched & id<10: MOVE to partition 9 (cross-partition update);
    // matched & id%10=5: delete; unmatched source rows: insert into p=9
    spark.sql(
      s"""MERGE INTO pjpm.`$t` tgt USING pj_pm_merge_src src ON tgt.id = src.id
         |WHEN MATCHED AND tgt.id < 10 THEN UPDATE SET p = src.p, v = src.v
         |WHEN MATCHED AND tgt.id % 10 = 5 THEN DELETE
         |WHEN NOT MATCHED THEN INSERT (id, p, v) VALUES (src.id, src.p, src.v)
         |""".stripMargin)
    val out = spark.table(s"pjpm.`$t`")
    // 100 original - 9 deleted (15..95, minus 5 which moved first-clause? no:
    // id=5 matches the FIRST clause (id<10) and moves instead) + 20 inserts
    val moved = (0L until 10L)
    val deleted = (0L until 100L).filter(i => i % 10 == 5 && i >= 10)
    assert(out.count() == (100 - deleted.size + 20).toLong, s"count: ${out.count()}")
    moved.foreach { i =>
      val r = out.filter($"id" === i).select($"p", $"v").head()
      assert(r.getLong(0) == 9L && r.getString(1) == s"n$i",
        s"row $i must have MOVED to partition 9 with the source value")
    }
    assert(out.filter($"id".isin(deleted: _*)).count() == 0L, "deleted rows gone")
    assert(out.filter($"id" >= 100).count() == 20L, "inserts landed")
    // the moved rows physically live under p=9 (partition-pure layout)
    assert(out.filter($"p" === 9).count() == 30L) // 10 moved + 20 inserted
    val files = head(t).files
    assert(files.exists(_.startsWith("p=9/")), s"p=9 dir must exist: $files")
  }
}
