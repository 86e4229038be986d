package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Interplay pin: compaction of a table with EXISTENCE defaults must keep
  * the promise — pre-add rows read the ADD-time default after the rewrite,
  * explicit NULLs stay NULL, SET-DEFAULT rows keep their value. Works
  * because post-add files embed the default metadata in their parquet
  * footer schema, so the mergeSchema union the rewrite reads through
  * carries it and the vectorized reader fills missing columns with it.
  */
class PjDefaultCompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("compaction must not rewrite existence defaults into stored nulls") {
    val dir = java.nio.file.Files.createTempDirectory("pj_def_compact").toString
    Seq((1L, 10L), (2L, 20L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir) // pre-add file
    Seq((3L, 30L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir) // second small file
    spark.conf.set("spark.sql.catalog.pjdefc", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"ALTER TABLE pjdefc.`$dir` ADD COLUMN bonus BIGINT DEFAULT 7")
    // explicit NULL stays null; omitted fills 9 after a SET DEFAULT
    spark.sql(s"ALTER TABLE pjdefc.`$dir` ALTER COLUMN bonus SET DEFAULT 9")
    spark.sql(s"INSERT INTO pjdefc.`$dir` VALUES (4, 40, NULL)")
    spark.sql(s"INSERT INTO pjdefc.`$dir` (id, x) VALUES (5, 50)")
    def bonuses: Map[Long, Option[Long]] =
      spark.read.format("pjparquet").load(dir).select($"id", $"bonus").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val before = bonuses
    assert(before == Map(1L -> Some(7L), 2L -> Some(7L), 3L -> Some(7L),
      4L -> None, 5L -> Some(9L)), s"pre-compaction: $before")
    graft.sources.pjparquet.PjCompaction.compact(
      spark, dir, targetBytes = 512L * 1024 * 1024)
    val after = bonuses
    assert(after == before,
      s"compaction must preserve existence-default semantics: $before -> $after")
  }

  test("MIXED group with a metadata-less carrier: presence sub-grouping keeps the default") {
    // the footer-metadata lane is not a contract: files written by
    // DataFrame appends or earlier rewrites carry the column physically
    // but WITHOUT Spark's EXISTS_DEFAULT field metadata in the footer.
    // A merged read over {pre-add file, metadata-less carrier} then
    // null-fills the pre-add rows — the rewrite must sub-group by
    // recorded physical presence and fill the frozen default itself.
    val dir = java.nio.file.Files.createTempDirectory("pj_def_compact3").toString
    Seq((1L, 10L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir) // pre-add file
    spark.conf.set("spark.sql.catalog.pjdefc", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"ALTER TABLE pjdefc.`$dir` ADD COLUMN bonus BIGINT DEFAULT 7")
    // DataFrame appends: bonus rides the dataframe schema, which carries
    // no default metadata into the footer
    Seq((2L, 20L, 22L), (3L, 30L, 33L)).toDF("id", "x", "bonus").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir)
    def bonuses: Map[Long, Option[Long]] =
      spark.read.format("pjparquet").load(dir).select($"id", $"bonus").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val expect = Map(1L -> Some(7L), 2L -> Some(22L), 3L -> Some(33L))
    assert(bonuses == expect, s"pre-compaction: $bonuses")
    graft.sources.pjparquet.PjCompaction.compact(
      spark, dir, targetBytes = 512L * 1024 * 1024)
    assert(bonuses == expect,
      s"mixed-group compaction flipped the existence default: $bonuses")
    // OPTIMIZE ZORDER takes the same read path over every file
    Seq((4L, 40L, 44L)).toDF("id", "x", "bonus").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir)
    graft.sources.pjparquet.PjCompaction.optimize(spark, dir, Seq("id", "x"))
    assert(bonuses == expect + (4L -> Some(44L)),
      s"mixed-group optimize flipped the existence default: $bonuses")
  }

  test("compaction of ONLY pre-add files materializes the default, not NULL") {
    // the hole the mergeSchema mechanism can't cover: when EVERY consumed
    // file predates the ADD, no footer carries the default metadata — the
    // rewrite must fill the frozen existence default from the RECORDED
    // schema (readGenerations existenceFill), or reads silently flip 7→NULL
    val dir = java.nio.file.Files.createTempDirectory("pj_def_compact2").toString
    Seq((1L, 10L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir)
    Seq((2L, 20L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir)
    spark.conf.set("spark.sql.catalog.pjdefc", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"ALTER TABLE pjdefc.`$dir` ADD COLUMN bonus BIGINT DEFAULT 7")
    graft.sources.pjparquet.PjCompaction.compact(
      spark, dir, targetBytes = 512L * 1024 * 1024)
    val got = spark.read.format("pjparquet").load(dir)
      .select($"id", $"bonus").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> Some(7L), 2L -> Some(7L)),
      s"all-pre-add compaction lost the existence default: $got")
    // and the stored bytes (not just the read lane) carry 7: the live
    // compacted file physically carries the column (retired pre-add files
    // stay on disk for time travel, so scope the raw read to it)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val live = graft.sources.pjparquet.PjCommitLog.latest(fs, root).get.entries
    assert(live.size == 1 && live.head.cols.exists(_.exists(_.equalsIgnoreCase("bonus"))),
      s"compacted file must physically carry bonus: $live")
    val raw = spark.read.parquet(s"$dir/${live.head.path}")
      .select($"id", $"bonus").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(raw == Map(1L -> Some(7L), 2L -> Some(7L)), s"raw bytes: $raw")
  }
}
