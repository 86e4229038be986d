package graft.sources

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.PJException
import graft.sources.pjparquet.PjCommitLog

/** CREATE TABLE DDL ([[graft.sources.pjparquet.PjCatalog.createTable]]):
  * empty logged tables that resolve from the schema-recording `create`
  * commit, INSERT INTO them, CTAS, column DEFAULTs filled by Spark's
  * resolver, TBLPROPERTIES at create, and the guarded DROP TABLE.
  */
class PjCreateTableSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.pjt", "graft.sources.pjparquet.PjCatalog")

  private def freshPath(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"pj_create_$tag")
    java.nio.file.Files.delete(d)
    d.toString
  }
  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  test("CREATE TABLE -> empty reads -> INSERT INTO -> SELECT round trip") {
    val p = freshPath("basic")
    spark.sql(s"CREATE TABLE pjt.`$p` (id BIGINT, name STRING) USING pjparquet")
    val snap = PjCommitLog.latest(fsOf(p), new Path(p)).get
    assert(snap.version == 1L && snap.action == "create" && snap.entries.isEmpty)
    // empty table resolves with the recorded schema and zero rows
    assert(spark.table(s"pjt.`$p`").columns.toSeq == Seq("id", "name"))
    assert(spark.table(s"pjt.`$p`").count() == 0L)
    spark.sql(s"INSERT INTO pjt.`$p` VALUES (1, 'a'), (2, 'b')")
    assert(spark.table(s"pjt.`$p`").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("CTAS creates and populates in one statement") {
    val p = freshPath("ctas")
    spark.sql(s"CREATE TABLE pjt.`$p` USING pjparquet AS " +
      "SELECT id, id * 2 AS doubled FROM range(5)")
    assert(spark.table(s"pjt.`$p`").count() == 5L)
    assert(spark.table(s"pjt.`$p`").where($"doubled" === $"id" * 2).count() == 5L)
  }

  test("TBLPROPERTIES at create: user keys recorded, reserved keys validated") {
    val p = freshPath("props")
    spark.sql(s"CREATE TABLE pjt.`$p` (id BIGINT) USING pjparquet " +
      "TBLPROPERTIES ('team'='ml', 'pj.checkpoint.interval'='4')")
    val shown = spark.sql(s"SHOW TBLPROPERTIES pjt.`$p`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("team").contains("ml"))
    assert(shown.get("pj.checkpoint.interval").contains("4"))
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE pjt.`${freshPath("badprop")}` (id BIGINT) " +
        "USING pjparquet TBLPROPERTIES ('pj.checkpont.interval'='4')")
    }
    assert(e.getMessage.contains("pj."), s"typo'd reserved key must refuse: $e")
  }

  test("column DEFAULT fills on INSERT") {
    val p = freshPath("dflt")
    spark.sql(s"CREATE TABLE pjt.`$p` (id BIGINT, tag STRING DEFAULT 'none') " +
      "USING pjparquet")
    spark.sql(s"INSERT INTO pjt.`$p` (id) VALUES (7)")
    spark.sql(s"INSERT INTO pjt.`$p` VALUES (8, 'real')")
    val got = spark.table(s"pjt.`$p`").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((7L, "none"), (8L, "real")))
  }

  test("CREATE refuses existing tables and declared partitioning; DROP is guarded") {
    val p = freshPath("exists")
    spark.sql(s"CREATE TABLE pjt.`$p` (id BIGINT) USING pjparquet")
    val e1 = intercept[Exception] {
      spark.sql(s"CREATE TABLE pjt.`$p` (id BIGINT) USING pjparquet")
    }
    assert(e1.getMessage.toLowerCase.contains("exists"))
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE TABLE pjt.`${freshPath("part")}` (id BIGINT, ts TIMESTAMP) " +
        "USING pjparquet PARTITIONED BY (days(ts))")
    }
    assert(e2.getMessage.contains("only PARTITIONED BY (col) and bucket(n, col)"))
    // DROP deletes a real table, refuses an arbitrary directory
    spark.sql(s"DROP TABLE pjt.`$p`")
    assert(!fsOf(p).exists(new Path(p)), "DROP must delete the table directory")
    // a directory that is not a table refuses (either at resolution or at
    // the dropTable guard) and is left untouched
    val notATable = java.nio.file.Files.createTempDirectory("pj_create_nt")
    java.nio.file.Files.createFile(notATable.resolve("keep.txt"))
    val e3 = intercept[PJException] {
      spark.sql(s"DROP TABLE pjt.`${notATable.toString}`")
    }
    assert(e3.getMessage.contains("refusing") ||
      e3.getMessage.contains("no parquet files"))
    assert(fsOf(notATable.toString).exists(new Path(notATable.toString)) &&
      java.nio.file.Files.exists(notATable.resolve("keep.txt")),
      "refused DROP must leave the directory intact")
  }

  test("CREATE TABLE PARTITIONED BY: declared partitioning drives writes, types, pruning") {
    val p = freshPath("partby")
    spark.sql(s"CREATE TABLE pjt.`$p` (id BIGINT, seg STRING, g STRING) " +
      "USING pjparquet PARTITIONED BY (g)")
    spark.sql(s"INSERT INTO pjt.`$p` VALUES (1,'a','1'), (2,'b','2'), (3,'c','1')")
    assert(fsOf(p).exists(new Path(p, "g=1")), "rows must land in Hive partition dirs")
    // the declared STRING type survives numeric-looking values
    assert(spark.table(s"pjt.`$p`").schema("g").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(spark.table(s"pjt.`$p`").where($"g" === "1").count() == 2L)
    // metadata-rate partition DELETE still applies
    spark.sql(s"DELETE FROM pjt.`$p` WHERE g = '2'")
    assert(spark.table(s"pjt.`$p`").count() == 2L)
    // bad partition declarations refuse at CREATE
    val e = intercept[PJException] {
      spark.sql(s"CREATE TABLE pjt.`${freshPath("badpart")}` (id BIGINT, d DOUBLE) " +
        "USING pjparquet PARTITIONED BY (d)")
    }
    assert(e.getMessage.contains("BIGINT, STRING or DATE"))
  }

  test("TRUNCATE TABLE and CREATE OR REPLACE round the DDL surface out") {
    val p = freshPath("trunc")
    spark.sql(s"CREATE TABLE pjt.`$p` (id BIGINT, v STRING) USING pjparquet")
    spark.sql(s"INSERT INTO pjt.`$p` VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"TRUNCATE TABLE pjt.`$p`")
    assert(spark.table(s"pjt.`$p`").count() == 0L, "TRUNCATE must empty the table")
    spark.sql(s"INSERT INTO pjt.`$p` VALUES (3, 'c')")
    assert(spark.table(s"pjt.`$p`").count() == 1L)
    // CREATE OR REPLACE swaps schema and contents in one statement
    spark.sql(s"CREATE OR REPLACE TABLE pjt.`$p` USING pjparquet AS " +
      "SELECT id AS k, id * 3 AS tripled FROM range(4)")
    val t = spark.table(s"pjt.`$p`")
    assert(t.columns.toSeq == Seq("k", "tripled") && t.count() == 4L)
  }

  test("SHOW CREATE TABLE and DESCRIBE EXTENDED surface the created contract") {
    val p = freshPath("show")
    spark.sql(s"CREATE TABLE pjt.`$p` (id BIGINT, v STRING DEFAULT 'x') " +
      "USING pjparquet TBLPROPERTIES('team'='ml')")
    val ddl = spark.sql(s"SHOW CREATE TABLE pjt.`$p`").collect().head.getString(0)
    assert(ddl.startsWith("CREATE TABLE") && ddl.contains("id BIGINT"), ddl)
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED pjt.`$p`")
      .collect().map(_.mkString("|")).mkString("\n")
    assert(desc.contains("team=ml"), "properties must surface in DESCRIBE")
    assert(desc.contains("_file") && desc.contains("_pos"),
      "metadata columns must surface in DESCRIBE")
    assert(desc.contains("Column Default Values") && desc.contains("'x'"),
      "column defaults must surface in DESCRIBE")
  }

  test("INSERT INTO an empty created table honors CHECK constraints") {
    val p = freshPath("chk")
    spark.sql(s"CREATE TABLE pjt.`$p` (id BIGINT, qty BIGINT) USING pjparquet")
    spark.sql(s"ALTER TABLE pjt.`$p` ADD CONSTRAINT pos CHECK (qty > 0)")
    spark.sql(s"INSERT INTO pjt.`$p` VALUES (1, 5)")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO pjt.`$p` VALUES (2, -1)")
    }
    assert(e.getMessage.toLowerCase.contains("pos") ||
      e.getMessage.toLowerCase.contains("check"), s"got: ${e.getMessage}")
    assert(spark.table(s"pjt.`$p`").count() == 1L)
  }
}
