package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** TopKByScore must return exactly what the window row_number formulation
  * returns (ties broken by smaller id), while aggregating partially
  * map-side.
  */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("equals window row_number top-k, including score ties") {
    val rnd = new scala.util.Random(5)
    // few distinct scores → plenty of ties to exercise the id tie-break
    val rows = (0 until 5000).map(i =>
      (i % 7L, rnd.nextInt(40) / 10.0, i.toLong))
    val df = rows.toDF("probe_id", "cos_sim", "neighbor_id").repartition(8)

    val viaAgg = df.groupBy($"probe_id")
      .agg(TopK.topKByScore(5, $"cos_sim", $"neighbor_id").as("top"))
      .select($"probe_id", posexplode($"top"))
      .select($"probe_id", ($"pos" + 1).as("rank"), $"col.id".as("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    val w = Window.partitionBy($"probe_id").orderBy($"cos_sim".desc, $"neighbor_id")
    val viaWindow = df.withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .select($"probe_id", $"rank", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    assert(viaAgg == viaWindow)
  }

  test("aggregates partially before the exchange (map-side top-k)") {
    val df = spark.range(1000).select(
      ($"id" % 3).as("probe_id"), rand(9).as("cos_sim"), $"id".as("neighbor_id"))
    val plan = df.groupBy($"probe_id")
      .agg(TopK.topKByScore(3, $"cos_sim", $"neighbor_id").as("top"))
      .queryExecution.executedPlan.toString
    val partialIdx = plan.indexOf("partial_topkbyscore")
    assert(partialIdx >= 0, s"expected a partial aggregation stage:\n$plan")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    assert(exchangeIdx >= 0 && exchangeIdx < partialIdx,
      "partial aggregate must sit below the exchange in the printed tree")
  }

  test("fewer rows than k, and k=1") {
    val df = Seq((1L, 0.9, 10L), (1L, 0.8, 11L), (2L, 0.5, 12L)).toDF("p", "s", "i")
    val top = df.groupBy($"p").agg(TopK.topKByScore(5, $"s", $"i").as("t"))
      .select($"p", size($"t").as("n")).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(top == Map(1L -> 2, 2L -> 1))
  }
}
