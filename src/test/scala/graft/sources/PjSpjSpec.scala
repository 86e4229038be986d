package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.PjWriter

/** Storage-partitioned joins: two pjparquet tables Hive-partitioned on the
  * same key must join with ZERO shuffle exchanges when
  * `spark.sql.sources.v2.bucketing.enabled` is on (the scan reports
  * `KeyGroupedPartitioning`, splits expose typed partition keys), and the
  * result must equal the shuffled join bit-for-bit. With the conf off the
  * report is ignored — plans revert to the stock exchange shape.
  */
class PjSpjSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val (dirA, dirB): (String, String) = {
    val a = java.nio.file.Files.createTempDirectory("pj_spj_a").toString
    val b = java.nio.file.Files.createTempDirectory("pj_spj_b").toString
    val df = spark.range(300).select(
      $"id",
      concat(lit("k"), ($"id" % 5).cast("string")).as("part"),
      ($"id" * 7 % 100).as("v"))
    PjWriter.writeWithIndex(df, a, partitionBy = Seq("part"))
    PjWriter.writeWithIndex(
      df.select($"id".as("id2"), $"part", ($"id" % 13).as("w")), b, partitionBy = Seq("part"))
    (a, b)
  }

  /** Count shuffle exchanges in the FINAL (post-AQE) plan: the adaptive
    * wrapper hides its inner plan from collect(), so count on the rendered
    * final plan after an action.
    */
  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
  }

  private def withSpj[T](on: Boolean)(body: => T): T = {
    val conf = spark.conf
    val oldB = conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val oldT = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.sources.v2.bucketing.enabled", on.toString)
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      oldB.fold(conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
        conf.set("spark.sql.sources.v2.bucketing.enabled", _))
      oldT.fold(conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        conf.set("spark.sql.autoBroadcastJoinThreshold", _))
    }
  }

  private def joined = {
    val ta = spark.read.format("pjparquet").load(dirA)
    val tb = spark.read.format("pjparquet").load(dirB)
    ta.join(tb, Seq("part"))
      .groupBy($"part")
      .agg(count(lit(1)).as("n"), sum($"v" * $"w").as("vw"))
      .orderBy($"part")
  }

  test("co-partitioned join plans zero shuffle exchanges under SPJ") {
    val (spjRows, spjShuffles) = withSpj(on = true) {
      val df = joined
      (df.collect().toSeq, shuffles(df))
    }
    val (stockRows, stockShuffles) = withSpj(on = false) {
      val df = joined
      (df.collect().toSeq, shuffles(df))
    }
    assert(spjShuffles == 0,
      s"storage-partitioned join must plan no exchange, saw $spjShuffles")
    assert(stockShuffles > 0, "with SPJ off the join must fall back to shuffling")
    assert(spjRows == stockRows, "SPJ must not change results")
    assert(spjRows.size == 5)
  }

  test("flat (unpartitioned) layouts still report unknown partitioning") {
    withSpj(on = true) {
      val d = java.nio.file.Files.createTempDirectory("pj_spj_flat").toString
      PjWriter.writeWithIndex(spark.range(10).select($"id"), d)
      // just exercising the path: planning succeeds, results correct
      assert(spark.read.format("pjparquet").load(d).count() == 10)
    }
  }
}
