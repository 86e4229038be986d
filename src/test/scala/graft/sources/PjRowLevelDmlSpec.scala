package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.PjWriter

/** Copy-on-write row-level DML ([[graft.sources.pjparquet.PjRowLevelOperation]]):
  * SQL DELETE with data-column predicates, UPDATE, and MERGE INTO against
  * pjparquet tables. The replacement granularity is the file, and the
  * rewrite set must be bounded by METADATA — files whose index chunk stats
  * provably exclude the predicate survive byte-identical (same name, same
  * mtime, never rewritten).
  */
class PjRowLevelDmlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Flat 4-file table with DISJOINT id ranges per file (range repartition
    * + per-file index): the fixture that makes stats scoping observable.
    */
  private def rangedTable(name: String, rows: Int = 1000): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory(s"pj_rl_$name").toString
    PjWriter.writeWithIndex(
      spark.range(rows).select(
        $"id",
        concat(lit("doc-"), $"id").as("name"),
        when($"id" % 10 === 0, lit(null).cast("long")).otherwise($"id" % 97).as("v"))
        .repartitionByRange(4, $"id"),
      dir)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING pjparquet OPTIONS (path '$dir')")
    (name, dir)
  }

  private def dataFiles(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir))
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(f => f.getPath -> f.lastModified()).toMap
  }

  test("DELETE with a data-column predicate rewrites only stats-matching files") {
    val (t, dir) = rangedTable("pj_rl_delete")
    val before = dataFiles(dir)
    assert(before.size == 4, s"fixture should have 4 data files, got ${before.size}")

    spark.sql(s"DELETE FROM $t WHERE id >= 750")

    val left = spark.table(t)
    assert(left.count() == 750)
    assert(left.agg(max($"id")).head().getLong(0) == 749L)
    assert(left.agg(sum($"id")).head().getLong(0) == (0L until 750L).sum)

    // stats scoping: the three files whose id ranges lie below 750 survive
    // byte-identical; only the top-range file was replaced
    val after = dataFiles(dir)
    val preserved = before.filter { case (p, m) => after.get(p).contains(m) }
    assert(preserved.size == 3,
      s"expected 3 untouched files, got ${preserved.size} of ${before.size}")
    // every surviving data file has a fresh sidecar (readable with autogen off)
    assert(spark.read.format("pjparquet").option("index.autogen", "false")
      .load(dir).count() == 750)
  }

  test("DELETE keeps rows where the predicate is NULL (SQL semantics)") {
    val (t, _) = rangedTable("pj_rl_null")
    // v is NULL on every 10th id: NULL < 40 is NULL, those rows must stay
    spark.sql(s"DELETE FROM $t WHERE v < 40")
    val left = spark.table(t)
    val expected = (0 until 1000).count(id => id % 10 == 0 || id % 97 >= 40)
    assert(left.count() == expected.toLong)
    assert(left.filter($"v".isNull).count() == 100)
  }

  test("DELETE matching nothing leaves every file untouched") {
    val (t, dir) = rangedTable("pj_rl_nomatch")
    val before = dataFiles(dir)
    spark.sql(s"DELETE FROM $t WHERE id >= 5000")
    assert(dataFiles(dir) == before, "no file may be rewritten for a no-match DELETE")
    assert(spark.table(t).count() == 1000)
  }

  test("UPDATE rewrites matching files only and applies SET exactly") {
    val (t, dir) = rangedTable("pj_rl_update")
    val before = dataFiles(dir)

    spark.sql(s"UPDATE $t SET name = 'flagged', v = -1 WHERE id >= 900")

    val flagged = spark.table(t).filter($"name" === "flagged")
    assert(flagged.count() == 100)
    assert(flagged.agg(min($"id")).head().getLong(0) == 900L)
    assert(flagged.select($"v").distinct().as[Long].collect().toSeq == Seq(-1L))
    // untouched rows keep their values
    assert(spark.table(t).filter($"id" === 1).select($"name").as[String].head() == "doc-1")
    assert(spark.table(t).count() == 1000)

    val after = dataFiles(dir)
    val preserved = before.filter { case (p, m) => after.get(p).contains(m) }
    assert(preserved.size == 3,
      s"expected 3 untouched files, got ${preserved.size} of ${before.size}")
  }

  test("MERGE INTO: matched update, matched delete, and not-matched insert") {
    val (t, _) = rangedTable("pj_rl_merge", rows = 100)
    // source: ids 50..149 — 50..99 match (even: update, odd: delete),
    // 100..149 are new (insert)
    spark.range(50, 150).select($"id", lit(1000L).as("bonus"))
      .createOrReplaceTempView("pj_rl_merge_src")

    spark.sql(
      s"""MERGE INTO $t AS tgt USING pj_rl_merge_src AS src ON tgt.id = src.id
         |WHEN MATCHED AND src.id % 2 = 0 THEN UPDATE SET v = src.bonus
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT (id, name, v) VALUES (src.id, 'merged', src.bonus)
         |""".stripMargin)

    val out = spark.table(t)
    // 0..49 untouched, 50..98 even updated, 51..99 odd deleted, 100..149 inserted
    assert(out.count() == 50 + 25 + 50)
    assert(out.filter($"id" < 50 && $"name".startsWith("doc-")).count() == 50)
    val updated = out.filter($"id" >= 50 && $"id" < 100)
    assert(updated.count() == 25)
    assert(updated.filter($"id" % 2 =!= 0).count() == 0)
    assert(updated.select($"v").distinct().as[Long].collect().toSeq == Seq(1000L))
    val inserted = out.filter($"id" >= 100)
    assert(inserted.count() == 50)
    assert(inserted.select($"name").distinct().as[String].collect().toSeq == Seq("merged"))
  }

  test("partition-only DELETE still runs at metadata rate (no rewrite)") {
    val dir = java.nio.file.Files.createTempDirectory("pj_rl_meta").toString
    PjWriter.writeWithIndex(
      spark.range(300).select($"id", ($"id" % 3).cast("string").as("k")),
      dir, partitionBy = Seq("k"))
    spark.sql("DROP TABLE IF EXISTS pj_rl_meta")
    spark.sql(s"CREATE TABLE pj_rl_meta USING pjparquet OPTIONS (path '$dir')")
    val before = dataFiles(dir)

    spark.sql("DELETE FROM pj_rl_meta WHERE k = '1'")

    val after = dataFiles(dir)
    // metadata path: k=1 files unlinked, everything else byte-identical —
    // and crucially NO new files were written (a copy-on-write rewrite
    // would mint fresh names)
    assert(after.keySet.subsetOf(before.keySet), "metadata DELETE must not write files")
    assert(after == before.filter { case (p, _) => !p.contains("k=1") })
    assert(spark.table("pj_rl_meta").count() == 200)
  }

  test("DML on a partitioned table: DELETE spanning partition and data columns") {
    val dir = java.nio.file.Files.createTempDirectory("pj_rl_mixed").toString
    PjWriter.writeWithIndex(
      spark.range(300).select($"id", ($"id" % 3).cast("string").as("k")),
      dir, partitionBy = Seq("k"))
    spark.sql("DROP TABLE IF EXISTS pj_rl_mixed")
    spark.sql(s"CREATE TABLE pj_rl_mixed USING pjparquet OPTIONS (path '$dir')")

    // mixed predicate: partition column scopes the partition, data column
    // selects rows inside it — copy-on-write path, k=0 and k=2 untouched
    val before = dataFiles(dir)
    spark.sql("DELETE FROM pj_rl_mixed WHERE k = '1' AND id < 150")
    val out = spark.table("pj_rl_mixed")
    assert(out.count() == 300 - (0 until 150).count(_ % 3 == 1))
    assert(out.filter($"k" === "1" && $"id" < 150).count() == 0)
    assert(out.filter($"k" === "1").count() == (150 until 300).count(_ % 3 == 1))
    val after = dataFiles(dir)
    val untouched = before.filter { case (p, m) => after.get(p).contains(m) }
    assert(before.keySet.filterNot(_.contains("k=1")).subsetOf(untouched.keySet),
      "k=0 and k=2 partitions must survive byte-identical")
    // stats scoping also applies INSIDE the affected partition: k=1 files
    // whose id ranges lie entirely >= 150 survive too
    assert(untouched.keySet.exists(_.contains("k=1")),
      "k=1 files with no id < 150 must not be rewritten")
  }
}
