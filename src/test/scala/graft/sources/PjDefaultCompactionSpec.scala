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
}
