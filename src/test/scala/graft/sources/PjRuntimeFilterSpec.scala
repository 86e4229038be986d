package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.{PjInputPartition, PjWriter}

/** Runtime (join-driven) file pruning — dynamic partition pruning for the
  * pjparquet source. The scan offers its Hive partition columns as runtime
  * filter attributes; when a fact⋈dim join filters the dim side, Spark
  * hands the scan the dim's ACTUAL join-key values and the scan re-plans,
  * keeping only matching partition directories. On a 100 TB fact table
  * partitioned by day/tenant this is the difference between scanning one
  * directory and scanning all of them.
  */
class PjRuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // fact partitioned by k0..k4, ~1000 rows each; one data file per partition
  private lazy val factDir: String = {
    val d = java.nio.file.Files.createTempDirectory("pj_dpp_fact").toString
    val df = spark.range(5000)
      .select($"id", concat(lit("k"), ($"id" % 5)).as("part"))
      .repartition(1)
    PjWriter.writeWithIndex(df, d, partitionBy = Seq("part"))
    d
  }

  /** Row groups the fact scan planned after execution (AQE off so the
    * executed plan exposes the `BatchScanExec`; DPP filters live on the
    * scan node either way).
    */
  private def runAndCountFactRgs(df: => DataFrame): (Seq[org.apache.spark.sql.Row], Int) = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val frame = df
      val rows = frame.collect().toSeq
      val rgs = frame.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
        .flatMap(_.inputRDD.partitions)
        .collect {
          case p: org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition =>
            p.inputPartitions
        }
        .flatten
        .map {
          case p: PjInputPartition => p.rowGroups.length
          case _ => 0
        }.sum
      (rows, rgs)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  // file-backed dim: a literal LocalRelation would constant-fold its filter
  // away and the DPP rule requires a selective predicate on the dim side
  private lazy val dimDir: String = {
    val d = java.nio.file.Files.createTempDirectory("pj_dpp_dim").toString
    Seq(("k0", 1), ("k1", 2), ("k2", 3), ("k3", 4), ("k4", 5), ("zz", 6))
      .toDF("dk", "grp").write.mode("overwrite").parquet(d)
    d
  }

  private def fact: DataFrame = spark.read.format("pjparquet").load(factDir)
  private def dimAll: DataFrame = spark.read.parquet(dimDir)

  test("dim-filtered broadcast join prunes fact files at runtime") {
    // the selective dim-side filter is what makes the DPP planner rule fire
    val dim = dimAll.filter($"grp" === 3).select($"dk", lit("keep").as("tag"))
    val (allRows, allRgs) = runAndCountFactRgs(
      fact.join(broadcast(spark.range(1).selectExpr("'ignore' AS x")), lit(true), "left")
        .select($"id", $"part"))
    assert(allRows.length == 5000)
    assert(allRgs >= 5, s"expected >=5 row groups across partitions, got $allRgs")

    val joined = fact.join(broadcast(dim), $"part" === $"dk")
      .select($"id", $"part", $"tag")
    val (rows, rgs) = runAndCountFactRgs(joined)
    assert(rows.length == 1000)
    assert(rows.forall(_.getString(1) == "k2"))
    assert(rgs < allRgs,
      s"runtime filter should prune fact row groups: planned $rgs of $allRgs")
    assert(rgs <= allRgs / 5 + 1, s"expected ~1/5 of row groups, got $rgs/$allRgs")
  }

  test("runtime pruning never changes results vs a plain join") {
    val dim = dimAll.filter($"grp" === 1 || $"grp" === 4).select($"dk", $"grp".as("w"))
    val viaPj = fact.join(broadcast(dim), $"part" === $"dk")
      .groupBy($"dk").agg(count(lit(1)).as("n"), sum($"id").as("s"))
      .orderBy($"dk").collect().toSeq
    val stock = spark.read.parquet(factDir).join(broadcast(dim), $"part" === $"dk")
      .groupBy($"dk").agg(count(lit(1)).as("n"), sum($"id").as("s"))
      .orderBy($"dk").collect().toSeq
    assert(viaPj == stock)
  }
}
