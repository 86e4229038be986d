package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.{PjInputPartition, PjWriter}

/** Nested-schema graceful handling: the PJ_2 format indexes FLAT schemas
  * only (reference restriction, `palletjack.cc:266-279,483-487`), so an
  * explicit `format("pjparquet")` read of a nested file must DELEGATE that
  * file to raw-footer planning (with a WARN) instead of throwing the
  * index-validation error — while flat files in the same session keep full
  * index planning (spliced footers, never raw).
  */
class PjNestedSchemaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Nested fixture: struct + array columns, multiple row groups. */
  private lazy val nestedDir: String = {
    val d = java.nio.file.Files.createTempDirectory("pj_nested").toString
    spark.range(2000).select(
      $"id",
      struct(($"id" % 7).as("a"), concat(lit("v-"), $"id").as("b")).as("meta"),
      array($"id", $"id" * 2).as("pair"))
      .coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", "4096") // force several row groups
      .parquet(d)
    d
  }

  private lazy val flatDir: String = {
    val d = java.nio.file.Files.createTempDirectory("pj_nested_flat").toString
    PjWriter.writeWithIndex(spark.range(100).select($"id", ($"id" % 5).as("k")), d)
    d
  }

  private def scanPartitions(df: DataFrame): Seq[PjInputPartition] = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
        .flatMap(_.partitions.flatten)
        .collect { case p: PjInputPartition => p }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("nested file reads via pjparquet and matches stock parquet") {
    val pj = spark.read.format("pjparquet").load(nestedDir)
    val stock = spark.read.parquet(nestedDir)
    assert(pj.schema == stock.schema, "schema must come from the raw footer")
    val a = pj.select($"id", $"meta.a", $"meta.b", element_at($"pair", 2).as("p2"))
      .filter($"meta.a" === 3)
    val b = stock.select($"id", $"meta.a", $"meta.b", element_at($"pair", 2).as("p2"))
      .filter($"meta.a" === 3)
    assert(a.collect().sortBy(_.getLong(0)).toSeq == b.collect().sortBy(_.getLong(0)).toSeq)
    assert(pj.count() == 2000)
  }

  test("nested splits ship the raw footer; flat files in the same session stay spliced") {
    val nested = scanPartitions(spark.read.format("pjparquet").load(nestedDir).select($"id"))
    assert(nested.nonEmpty && nested.forall(_.rawFooter),
      "nested files must plan as raw-footer splits")
    val flat = scanPartitions(spark.read.format("pjparquet").load(flatDir).select($"id"))
    assert(flat.nonEmpty && flat.forall(!_.rawFooter),
      "flat files must keep spliced index planning")
  }

  test("nested files keep row-group parallelism under maxPartitionBytes") {
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
      val parts = scanPartitions(spark.read.format("pjparquet").load(nestedDir))
      assert(parts.size > 1, s"multi-row-group nested file must split, got ${parts.size}")
      val rgs = parts.flatMap(_.rowGroups.toSeq).sorted
      assert(rgs == rgs.distinct.sorted, "row groups must not be double-planned")
      // every split decodes only its own blocks: totals must add up exactly
      val total = spark.read.format("pjparquet").load(nestedDir).count()
      assert(total == 2000)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("writing nested data through the pjparquet sink commits and reads back") {
    val d = java.nio.file.Files.createTempDirectory("pj_nested_write").toString
    spark.range(50).select(
      $"id", struct(($"id" * 3).as("x")).as("s"))
      .write.format("pjparquet").mode("overwrite").save(d)
    val back = spark.read.format("pjparquet").load(d)
    assert(back.select(sum($"s.x")).head().getLong(0) == (0L until 50L).map(_ * 3).sum)
    // no index sidecar can exist for nested files (un-indexable by design)
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(d), true)
    var indexes = 0
    while (it.hasNext) if (it.next().getPath.getName.endsWith(".index")) indexes += 1
    assert(indexes == 0, "nested files must not get (unusable) index sidecars")
  }

  test("partition-value pruning still applies to nested files") {
    val d = java.nio.file.Files.createTempDirectory("pj_nested_part").toString
    spark.range(100).select(
      ($"id" % 4).as("k"), struct($"id".as("v")).as("s"))
      .write.mode("overwrite").partitionBy("k").parquet(d)
    val pj = spark.read.format("pjparquet").load(d)
    val pruned = pj.filter($"k" === 2)
    assert(scanPartitions(pruned.select($"s.v")).size <
      scanPartitions(pj.select($"s.v")).size,
      "partition filter must prune nested files at planning time")
    assert(pruned.count() == 25)
    assert(pruned.select(sum($"s.v")).head().getLong(0) ==
      (0L until 100L).filter(_ % 4 == 2).sum)
  }

  test("nested-FIELD pruning reaches the fallback reader's requested schema") {
    // selecting one subfield must clip the struct below the top level in
    // the scan's read schema (Catalyst nested-schema pruning flows through
    // pruneColumns; the reader conf clips parquet leaves against it), so a
    // wide struct at 100 TB reads one leaf column, not the whole struct
    val df = spark.read.format("pjparquet").load(nestedDir).select($"meta.a")
    val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    val read = scans.head.scan.readSchema()
    val meta = read("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("a"),
      s"struct must be clipped to the requested subfield, got $meta")
    assert(!read.fieldNames.contains("pair"), s"untouched columns must drop, got $read")
    assert(df.as[Long].collect().sorted.toSeq == (0L until 2000L).map(_ % 7).sorted)
  }
}
