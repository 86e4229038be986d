package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Guard for the r19 `spreadIfNarrow` contract (VERDICT r18 item 6): the
  * round-robin repartition that rescues few-file inputs from single-task
  * scans must NOT fire on inputs that already have at least one file per
  * core — at 100 TB the corpus has thousands of files and an unconditional
  * repartition would round-robin the whole corpus through an exchange for
  * nothing.
  */
class SpreadIfNarrowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def physPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("few-file input gains a round-robin exchange") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("spread_few").toString
    (1 to 100).toDF("x").coalesce(1).write.mode("overwrite").parquet(dir)
    val in = spark.read.parquet(dir)
    assert(in.inputFiles.length < spark.sparkContext.defaultParallelism)
    val out = PipelineOps.spreadIfNarrow(in)
    assert(physPlan(out).contains("RoundRobinPartitioning"),
      "single-file input must be repartitioned for scan parallelism")
    assert(out.count() === 100)
  }

  test("many-file input is returned untouched (no exchange at scale)") {
    import spark.implicits._
    val p = spark.sparkContext.defaultParallelism
    val dir = java.nio.file.Files.createTempDirectory("spread_many").toString
    (1 to 1000).toDF("x").repartition(p).write.mode("overwrite").parquet(dir)
    val in = spark.read.parquet(dir)
    assert(in.inputFiles.length >= p)
    val out = PipelineOps.spreadIfNarrow(in)
    assert(out eq in, "an already-parallel input must be the identity")
    assert(!physPlan(out).contains("RoundRobinPartitioning"),
      "no round-robin exchange may be added to a many-file input")
  }
}
