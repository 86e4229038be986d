package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Metastore-named tables (round 17): with
  * `spark.sql.catalog.<cat>.warehouse=<dir>` set, `cat.db.tbl` maps to
  * `<dir>/db/tbl` by convention — CREATE/INSERT/SELECT/DML/time-travel,
  * SHOW TABLES / SHOW NAMESPACES / USE, dropTable and renameTable all
  * work by name, while path addressing (`` cat.`/abs/path` ``) stays
  * byte-identical. The directory tree IS the catalog: no metastore
  * service, which is exactly the deployment shape a 100 TB data-lake
  * engine needs (the store of record is the object store).
  */
class PjNamedCatalogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("pj_warehouse")
    spark.conf.set("spark.sql.catalog.pjwh", "graft.sources.pjparquet.PjCatalog")
    spark.conf.set("spark.sql.catalog.pjwh.warehouse", d.toString)
    d.toString
  }

  test("named table round-trip: CREATE, INSERT, SELECT, DML, time travel, DROP") {
    spark.sql(s"CREATE NAMESPACE pjwh.db1")
    spark.sql("CREATE TABLE pjwh.db1.events (id BIGINT, v BIGINT) USING pjparquet")
    assert(new java.io.File(s"$wh/db1/events").isDirectory,
      "the table must land at <warehouse>/db1/events")
    spark.range(0, 50).select($"id", ($"id" * 2).as("v"))
      .writeTo("pjwh.db1.events").append()
    assert(spark.table("pjwh.db1.events").count() == 50L)
    // name and path address the SAME table
    assert(spark.sql(s"SELECT count(*) FROM pjwh.`$wh/db1/events`").head().getLong(0) == 50L)
    spark.sql("UPDATE pjwh.db1.events SET v = 0 WHERE id < 10")
    spark.sql("DELETE FROM pjwh.db1.events WHERE id >= 40")
    val t = spark.table("pjwh.db1.events")
    assert(t.count() == 40L)
    assert(t.filter($"v" === 0).count() == 10L)
    // SQL time travel by NAME
    // v1 = CREATE (empty), v2 = the append, v3/v4 = the DML
    val v2 = spark.sql("SELECT count(*) AS n FROM pjwh.db1.events VERSION AS OF 2")
      .head().getLong(0)
    assert(v2 == 50L, s"version 2 must predate the DML, got $v2")
    assert(spark.sql("SHOW TABLES IN pjwh.db1").collect()
      .exists(_.getString(1) == "events"))
    spark.sql("DROP TABLE pjwh.db1.events")
    assert(!new java.io.File(s"$wh/db1/events").exists())
    assert(!spark.catalog.tableExists("pjwh.db1.events"))
  }

  test("namespaces: SHOW, USE + unqualified names, non-empty drop refuses") {
    spark.sql("CREATE NAMESPACE pjwh.db2")
    val nss = spark.sql("SHOW NAMESPACES IN pjwh").collect().map(_.getString(0))
    assert(nss.contains("db2"), nss.mkString(","))
    spark.sql("CREATE TABLE pjwh.db2.t1 (k BIGINT) USING pjparquet")
    spark.sql("USE pjwh.db2")
    try {
      spark.range(0, 7).select($"id".as("k")).writeTo("t1").append()
      assert(spark.table("t1").count() == 7L)
      assert(spark.sql("SELECT sum(k) FROM t1").head().getLong(0) == 21L)
    } finally spark.sql("USE spark_catalog.default")
    val e = intercept[Exception](spark.sql("DROP NAMESPACE pjwh.db2"))
    assert(e.getMessage.toLowerCase.contains("empty") ||
      e.getMessage.contains("db2"), e.getMessage)
    spark.sql("DROP NAMESPACE pjwh.db2 CASCADE")
    assert(!new java.io.File(s"$wh/db2").exists())
  }

  test("renameTable moves the whole table (log, sidecars, history) in one move") {
    spark.sql("CREATE NAMESPACE pjwh.db3")
    spark.sql("CREATE TABLE pjwh.db3.old (k BIGINT) USING pjparquet")
    spark.range(0, 9).select($"id".as("k")).writeTo("pjwh.db3.old").append()
    // RENAME TO is catalog-relative (Spark resolves the target inside
    // the source's catalog)
    spark.sql("ALTER TABLE pjwh.db3.old RENAME TO db3.renamed")
    assert(spark.table("pjwh.db3.renamed").count() == 9L)
    assert(!spark.catalog.tableExists("pjwh.db3.old"))
    // history survived the move (same commit log): v1 = CREATE (empty)
    assert(spark.sql("SELECT count(*) FROM pjwh.db3.renamed VERSION AS OF 1")
      .head().getLong(0) == 0L)
  }

  test("without a warehouse, namespaces refuse with guidance; paths never need one") {
    spark.conf.set("spark.sql.catalog.pjnowh", "graft.sources.pjparquet.PjCatalog")
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE pjnowh.db.t (k BIGINT) USING pjparquet")
    }
    assert(e.getMessage.contains("warehouse"), e.getMessage)
    val d = java.nio.file.Files.createTempDirectory("pj_pathtbl")
    java.nio.file.Files.delete(d)
    spark.sql(s"CREATE TABLE pjnowh.`$d` (k BIGINT) USING pjparquet")
    spark.range(3).select($"id".as("k")).writeTo(s"pjnowh.`$d`").append()
    assert(spark.table(s"pjnowh.`$d`").count() == 3L)
  }

  test("name components cannot escape the warehouse") {
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE pjwh.`..`.t (k BIGINT) USING pjparquet")
    }
    assert(e.getMessage.contains("invalid name component") ||
      e.getMessage.toLowerCase.contains("parse"), e.getMessage)
  }
}
