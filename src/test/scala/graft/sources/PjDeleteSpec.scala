package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.PjWriter

/** `DELETE FROM t WHERE <partition predicate>`: whole files + sidecars drop
  * at metadata rate; predicates touching data columns fall through to the
  * copy-on-write row-level path (see [[PjRowLevelDmlSpec]]).
  */
class PjDeleteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshTable(name: String): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory(s"pj_del_$name").toString
    PjWriter.writeWithIndex(
      spark.range(300).select($"id", ($"id" % 3).cast("string").as("k")),
      dir, partitionBy = Seq("k"))
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING pjparquet OPTIONS (path '$dir')")
    (name, dir)
  }

  private def filesUnder(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir))
  }

  test("partition-predicate DELETE drops files, sidecars, and empty dirs") {
    val (t, dir) = freshTable("pj_del_part")
    assert(spark.table(t).count() == 300)
    spark.sql(s"DELETE FROM $t WHERE k = '1'")
    val left = spark.table(t)
    assert(left.count() == 200)
    assert(left.filter($"k" === "1").count() == 0)
    assert(left.agg(sum($"id")).head().getLong(0) ==
      (0 until 300).filter(_ % 3 != 1).sum.toLong)
    // the k=1 directory is fully reclaimed, sidecars included
    assert(!filesUnder(dir).exists(_.getPath.contains("k=1")))
    assert(filesUnder(dir).exists(_.getPath.contains("k=0")))
    // remaining sidecar fleet intact: one per surviving data file
    val data = filesUnder(dir).filter(_.getName.endsWith(".parquet"))
    val sidecars = filesUnder(dir).filter(_.getName.endsWith(".parquet.index"))
    assert(data.nonEmpty && sidecars.size == data.size)
  }

  test("IN / compound partition predicates delete exactly their partitions") {
    val (t, _) = freshTable("pj_del_in")
    spark.sql(s"DELETE FROM $t WHERE k IN ('0', '2')")
    val left = spark.table(t)
    assert(left.select($"k").distinct().as[String].collect().toSeq == Seq("1"))
    assert(left.count() == 100)
  }

  test("a data-column predicate falls through to row-level copy-on-write") {
    // pre-r8 this refused; with SupportsRowLevelOperations it succeeds via
    // the group-based ReplaceData path (PjRowLevelDmlSpec covers it in depth)
    val (t, _) = freshTable("pj_del_refuse")
    spark.sql(s"DELETE FROM $t WHERE id < 100")
    val left = spark.table(t)
    assert(left.count() == 200)
    assert(left.agg(min($"id")).head().getLong(0) == 100L)
  }

  test("a no-match partition predicate deletes nothing") {
    val (t, _) = freshTable("pj_del_none")
    spark.sql(s"DELETE FROM $t WHERE k = '99'")
    assert(spark.table(t).count() == 300)
  }

  test("NOT over a partition predicate keeps SQL null semantics") {
    val (t, _) = freshTable("pj_del_not")
    spark.sql(s"DELETE FROM $t WHERE NOT (k = '0')")
    val left = spark.table(t)
    assert(left.select($"k").distinct().as[String].collect().toSeq == Seq("0"))
    assert(left.count() == 100)
  }
}
