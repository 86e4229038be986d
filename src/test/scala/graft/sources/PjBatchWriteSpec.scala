package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.PjWriter

/** The DSv2 commit protocol ([[graft.sources.pjparquet.PjBatchWrite]]):
  * SQL INSERT INTO / INSERT OVERWRITE (static + dynamic partition modes)
  * against pjparquet tables — untouched partitions must survive
  * byte-identical, new files must be index-planned immediately, and failed
  * jobs must leave the directory exactly as it was.
  */
class PjBatchWriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"pj_bw_$tag").toString

  /** (id, name, k) rows partitioned by k, seeded through the stock writer +
    * index job — the same shape the driver queries use.
    */
  private def seedPartitioned(dir: String, rows: Seq[(Long, String, Long)]): Unit = {
    import spark.implicits._
    PjWriter.writeWithIndex(
      rows.toDF("id", "name", "k"), dir, partitionBy = Seq("k"))
  }

  /** Readback that FAILS if any data file lacks a sidecar — proves new
    * files were index-planned by the commit, not autogen-rescued.
    */
  private def readIndexed(dir: String): org.apache.spark.sql.DataFrame =
    spark.read.format("pjparquet").option("index.autogen", "false").load(dir)

  private def listing(dir: String): Set[String] = {
    val root = java.nio.file.Paths.get(dir)
    val out = scala.collection.mutable.Set.empty[String]
    java.nio.file.Files.walk(root).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p)) out += root.relativize(p).toString
    }
    out.toSet
  }

  test("SQL INSERT INTO appends through the DSv2 write and new files are index-planned") {
    import spark.implicits._
    val dir = tempDir("append")
    PjWriter.writeWithIndex(
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"), dir)
    spark.sql("DROP TABLE IF EXISTS pj_bw_append")
    spark.sql(s"CREATE TABLE pj_bw_append USING pjparquet OPTIONS (path '$dir')")
    Seq((3L, "c"), (4L, "d"), (5L, "e")).toDF("id", "name")
      .createOrReplaceTempView("pj_bw_append_src")
    spark.sql("INSERT INTO pj_bw_append SELECT id, name FROM pj_bw_append_src")
    val got = readIndexed(dir).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
    spark.sql("DROP TABLE IF EXISTS pj_bw_append")
  }

  test("dynamic INSERT OVERWRITE replaces exactly the partitions receiving rows") {
    import spark.implicits._
    val dir = tempDir("dyn")
    seedPartitioned(dir, Seq(
      (1L, "k0-a", 0L), (2L, "k0-b", 0L),
      (3L, "k1-a", 1L), (4L, "k1-b", 1L),
      (5L, "k2-a", 2L), (6L, "k2-b", 2L)))
    spark.sql("DROP TABLE IF EXISTS pj_bw_dyn")
    spark.sql(s"CREATE TABLE pj_bw_dyn USING pjparquet OPTIONS (path '$dir')")

    val untouchedBefore = listing(dir).filter(p => p.startsWith("k=0") || p.startsWith("k=2"))
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      Seq((30L, "k1-new", 1L), (40L, "k3-new", 3L)).toDF("id", "name", "k")
        .createOrReplaceTempView("pj_bw_dyn_src")
      spark.sql("INSERT OVERWRITE pj_bw_dyn SELECT id, name, k FROM pj_bw_dyn_src")
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    val got = readIndexed(dir).as[(Long, String, Long)].collect().toSet
    assert(got == Set(
      (1L, "k0-a", 0L), (2L, "k0-b", 0L), // untouched partition survives
      (30L, "k1-new", 1L),                // touched partition fully replaced
      (5L, "k2-a", 2L), (6L, "k2-b", 2L), // untouched partition survives
      (40L, "k3-new", 3L)))               // brand-new partition appears
    // byte-identical survival: same file names, sidecars included
    val untouchedAfter = listing(dir).filter(p => p.startsWith("k=0") || p.startsWith("k=2"))
    assert(untouchedAfter == untouchedBefore)
    spark.sql("DROP TABLE IF EXISTS pj_bw_dyn")
  }

  test("static INSERT OVERWRITE PARTITION clears only the named partition") {
    import spark.implicits._
    val dir = tempDir("static")
    seedPartitioned(dir, Seq(
      (1L, "k0-a", 0L), (2L, "k1-a", 1L), (3L, "k2-a", 2L)))
    spark.sql("DROP TABLE IF EXISTS pj_bw_static")
    spark.sql(s"CREATE TABLE pj_bw_static USING pjparquet OPTIONS (path '$dir')")
    Seq((20L, "k1-new")).toDF("id", "name").createOrReplaceTempView("pj_bw_static_src")
    spark.sql(
      "INSERT OVERWRITE pj_bw_static PARTITION (k = 1) SELECT id, name FROM pj_bw_static_src")
    val got = readIndexed(dir).as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "k0-a", 0L), (20L, "k1-new", 1L), (3L, "k2-a", 2L)))
    spark.sql("DROP TABLE IF EXISTS pj_bw_static")
  }

  test("whole-table INSERT OVERWRITE truncates every partition first") {
    import spark.implicits._
    val dir = tempDir("trunc")
    seedPartitioned(dir, Seq((1L, "k0-a", 0L), (2L, "k1-a", 1L)))
    spark.sql("DROP TABLE IF EXISTS pj_bw_trunc")
    spark.sql(s"CREATE TABLE pj_bw_trunc USING pjparquet OPTIONS (path '$dir')")
    Seq((9L, "only", 5L)).toDF("id", "name", "k").createOrReplaceTempView("pj_bw_trunc_src")
    spark.sql("INSERT OVERWRITE pj_bw_trunc SELECT id, name, k FROM pj_bw_trunc_src")
    val got = readIndexed(dir).as[(Long, String, Long)].collect().toSet
    assert(got == Set((9L, "only", 5L)))
    // the cleared key=value dirs are pruned, not left as empty husks
    assert(!listing(dir).exists(p => p.startsWith("k=0") || p.startsWith("k=1")))
    spark.sql("DROP TABLE IF EXISTS pj_bw_trunc")
  }

  test("string partition values with URL-hostile characters round-trip") {
    import spark.implicits._
    val dir = tempDir("escape")
    // seed with URL-safe values; the hostile ones go through OUR writer
    PjWriter.writeWithIndex(
      Seq((1L, "seed", "aa")).toDF("id", "name", "k"), dir, partitionBy = Seq("k"))
    spark.sql("DROP TABLE IF EXISTS pj_bw_esc")
    spark.sql(s"CREATE TABLE pj_bw_esc USING pjparquet OPTIONS (path '$dir')")
    val hostile = Seq("a b", "a+b", "100%", "p/q", "k=v", "café")
    hostile.zipWithIndex.map { case (v, i) => (10L + i, s"row$i", v) }
      .toDF("id", "name", "k").createOrReplaceTempView("pj_bw_esc_src")
    spark.sql("INSERT INTO pj_bw_esc SELECT id, name, k FROM pj_bw_esc_src")
    val got = readIndexed(dir).select("k").as[String].collect().toSet
    assert(got == (hostile.toSet + "aa"))
    spark.sql("DROP TABLE IF EXISTS pj_bw_esc")
  }

  test("null partition values use the Hive sentinel and read back as null") {
    import spark.implicits._
    val dir = tempDir("nullpart")
    PjWriter.writeWithIndex(
      Seq((1L, "seed", "aa")).toDF("id", "name", "k"), dir, partitionBy = Seq("k"))
    spark.sql("DROP TABLE IF EXISTS pj_bw_null")
    spark.sql(s"CREATE TABLE pj_bw_null USING pjparquet OPTIONS (path '$dir')")
    spark.sql("INSERT INTO pj_bw_null SELECT 2L AS id, 'n' AS name, CAST(NULL AS STRING) AS k")
    val got = readIndexed(dir).where(col("k").isNull).select("id").as[Long].collect().toSeq
    assert(got == Seq(2L))
    assert(listing(dir).exists(_.startsWith("k=__HIVE_DEFAULT_PARTITION__")))
    spark.sql("DROP TABLE IF EXISTS pj_bw_null")
  }

  test("pure-SQL lifecycle from an empty path: CREATE, INSERT, dynamic overwrite") {
    import spark.implicits._
    val dir = tempDir("fresh") + "/t" // does not exist yet
    spark.sql("DROP TABLE IF EXISTS pj_bw_fresh")
    spark.sql(
      s"""CREATE TABLE pj_bw_fresh (id BIGINT, name STRING, k BIGINT)
         |USING pjparquet OPTIONS (path '$dir', partitionedBy 'k')""".stripMargin)
    // empty table: declared schema, zero rows, zero planned partitions
    assert(spark.table("pj_bw_fresh").schema.fieldNames.toSeq == Seq("id", "name", "k"))
    assert(spark.table("pj_bw_fresh").count() == 0L)

    spark.sql("INSERT INTO pj_bw_fresh VALUES (1, 'a', 0), (2, 'b', 0), (3, 'c', 1)")
    assert(listing(dir).exists(_.startsWith("k=0")), "partitioned dirs must materialize")
    assert(readIndexed(dir).as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 1L)))

    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      spark.sql("INSERT OVERWRITE pj_bw_fresh VALUES (30, 'z', 1)")
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    assert(spark.table("pj_bw_fresh").as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a", 0L), (2L, "b", 0L), (30L, "z", 1L)),
      "k=0 must survive the dynamic overwrite of k=1")
    spark.sql("DROP TABLE IF EXISTS pj_bw_fresh")
  }

  test("declared STRING partition type wins over numeric-looking directory values") {
    import spark.implicits._
    val dir = tempDir("strpart") + "/t"
    spark.sql("DROP TABLE IF EXISTS pj_bw_str")
    spark.sql(
      s"""CREATE TABLE pj_bw_str (id BIGINT, k STRING)
         |USING pjparquet OPTIONS (path '$dir', partitionedBy 'k')""".stripMargin)
    spark.sql("INSERT INTO pj_bw_str VALUES (1, '007'), (2, 'x')")
    // '007' must read back as the string it was written as, not as 7L —
    // directory inference alone would type the all-numeric value as LONG
    val got = spark.table("pj_bw_str").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "007"), (2L, "x")))
    spark.sql("DROP TABLE IF EXISTS pj_bw_str")
  }

  test("partitionedBy option mismatching an existing layout fails loudly") {
    import spark.implicits._
    val dir = tempDir("mismatch")
    seedPartitioned(dir, Seq((1L, "a", 0L)))
    val e = intercept[Exception] {
      spark.read.format("pjparquet").option("partitionedBy", "name")
        .schema("id BIGINT, name STRING, k BIGINT")
        .load(dir).collect()
    }
    assert(e.getMessage.contains("does not match"), s"got: ${e.getMessage}")
  }

  test("a failed INSERT leaves the table exactly as it was") {
    import spark.implicits._
    val dir = tempDir("abort")
    seedPartitioned(dir, Seq((1L, "k0-a", 0L), (2L, "k1-a", 1L)))
    spark.sql("DROP TABLE IF EXISTS pj_bw_abort")
    spark.sql(s"CREATE TABLE pj_bw_abort USING pjparquet OPTIONS (path '$dir')")
    val before = listing(dir)
    val boom = udf { id: Long =>
      if (id == 2L) throw new RuntimeException("pj_bw_abort: synthetic task failure")
      id
    }
    spark.udf.register("pj_bw_boom", boom)
    Seq((1L, "x", 7L), (2L, "y", 7L)).toDF("id", "name", "k")
      .createOrReplaceTempView("pj_bw_abort_src")
    intercept[Exception] {
      spark.sql(
        "INSERT INTO pj_bw_abort SELECT pj_bw_boom(id) AS id, name, k FROM pj_bw_abort_src")
    }
    assert(listing(dir) == before, "abort must sweep every file the failed job created")
    val got = readIndexed(dir).as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "k0-a", 0L), (2L, "k1-a", 1L)))
    spark.sql("DROP TABLE IF EXISTS pj_bw_abort")
  }
}
