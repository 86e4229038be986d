package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.PjWriter

/** MERGE INTO `WHEN NOT MATCHED BY SOURCE` clauses (Spark 4 extended merge):
  * target rows with no source match can be updated or deleted. These clauses
  * invert the usual scoping — EVERY target row is a candidate, not just the
  * ON-condition matches — so the rewrite set must be the whole table, on both
  * the copy-on-write and the merge-on-read (deletion-vector) paths.
  */
class PjMergeBySourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshTable(name: String, rows: Int = 100,
      props: String = ""): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"pj_mbs_$name").toString
    PjWriter.writeWithIndex(
      spark.range(rows).select(
        $"id",
        concat(lit("doc-"), $"id").as("name"),
        ($"id" % 7).as("v")).repartitionByRange(4, $"id"),
      dir)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING pjparquet OPTIONS (path '$dir') $props")
    name
  }

  test("MERGE with NOT MATCHED BY SOURCE DELETE removes unmatched target rows") {
    val t = freshTable("pj_mbs_del")
    spark.range(0, 60).select($"id", lit(5000L).as("bonus"))
      .createOrReplaceTempView("pj_mbs_del_src")
    spark.sql(
      s"""MERGE INTO $t AS tgt USING pj_mbs_del_src AS src ON tgt.id = src.id
         |WHEN MATCHED THEN UPDATE SET v = src.bonus
         |WHEN NOT MATCHED BY SOURCE THEN DELETE
         |""".stripMargin)
    val out = spark.table(t)
    assert(out.count() == 60)
    assert(out.agg(max($"id")).head().getLong(0) == 59L)
    assert(out.select($"v").distinct().as[Long].collect().toSeq == Seq(5000L))
  }

  test("NOT MATCHED BY SOURCE UPDATE with condition; all three clause kinds") {
    val t = freshTable("pj_mbs_all")
    // src: 50..149. matched = 50..99, not-matched(insert) = 100..149,
    // not-matched-by-source = 0..49 (update evens, leave odds)
    spark.range(50, 150).select($"id", lit(1000L).as("bonus"))
      .createOrReplaceTempView("pj_mbs_all_src")
    spark.sql(
      s"""MERGE INTO $t AS tgt USING pj_mbs_all_src AS src ON tgt.id = src.id
         |WHEN MATCHED THEN UPDATE SET v = src.bonus
         |WHEN NOT MATCHED THEN INSERT (id, name, v) VALUES (src.id, 'merged', src.bonus)
         |WHEN NOT MATCHED BY SOURCE AND tgt.id % 2 = 0 THEN UPDATE SET name = 'stale'
         |""".stripMargin)
    val out = spark.table(t)
    assert(out.count() == 150)
    assert(out.filter($"name" === "stale").count() == 25)
    assert(out.filter($"name" === "stale").agg(max($"id")).head().getLong(0) == 48L)
    assert(out.filter($"id" >= 50 && $"id" < 100 && $"v" === 1000L).count() == 50)
    assert(out.filter($"name" === "merged").count() == 50)
    // by-source odd ids below 50 are untouched
    assert(out.filter($"id" === 1).select($"name").as[String].head() == "doc-1")
  }

  test("NOT MATCHED BY SOURCE on the deletion-vector (merge-on-read) path") {
    val t = freshTable("pj_mbs_dv",
      props = "TBLPROPERTIES ('pj.deletionVectors.enabled'='true')")
    spark.range(0, 40).select($"id").createOrReplaceTempView("pj_mbs_dv_src")
    spark.sql(
      s"""MERGE INTO $t AS tgt USING pj_mbs_dv_src AS src ON tgt.id = src.id
         |WHEN NOT MATCHED BY SOURCE THEN DELETE
         |""".stripMargin)
    val out = spark.table(t)
    assert(out.count() == 40)
    assert(out.agg(max($"id")).head().getLong(0) == 39L)
  }
}
