package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Bucketing is the co-located-join technique for repeated fact-fact joins
  * at scale: both sides pre-hashed into the same bucket count on the join
  * key at write time, so the join plans with NO exchange on either side —
  * the shuffle is paid once at write, not per query. This spec proves the
  * property on the real fixture tables: bucketed orders ⋈ lineitem has
  * zero `Exchange hashpartitioning` operators and returns exactly what the
  * stock shuffled join returns.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans without exchanges and matches stock results") {
    // explicit table paths — spark.sql.warehouse.dir is static config
    val warehouse = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffled-join path so the assertion is about bucketing,
      // not about broadcasting small test data
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      Tables.orders(spark, dir).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite")
        .option("path", s"$warehouse/b_orders")
        .saveAsTable("b_orders")
      Tables.lineitem(spark, dir).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite")
        .option("path", s"$warehouse/b_lineitem")
        .saveAsTable("b_lineitem")

      val bucketed = spark.table("b_orders")
        .join(spark.table("b_lineitem"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum($"l_extendedprice"), 2).as("v"))

      val joinPlan = spark.table("b_orders")
        .join(spark.table("b_lineitem"), $"o_orderkey" === $"l_orderkey")
        .queryExecution.executedPlan.toString
      assert(!joinPlan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$joinPlan")
      assert(joinPlan.contains("SortMergeJoin"), joinPlan)

      val stock = Tables.orders(spark, dir)
        .join(Tables.lineitem(spark, dir), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum($"l_extendedprice"), 2).as("v"))

      val a = bucketed.orderBy("o_orderpriority").collect().map(_.toSeq).toSeq
      val b = stock.orderBy("o_orderpriority").collect().map(_.toSeq).toSeq
      assert(a.nonEmpty && a == b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
