package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executable-README guard (reference pattern: `test_readme.py`): the
  * README's code snippet must stay in sync with an actually-executed
  * equivalent, and its "measured locally" claims are bounds-checked against
  * the live microbenchmark — drift fails a test, not a reader.
  */
class ReadmeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val readme =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
      java.nio.charset.StandardCharsets.UTF_8)

  test("README snippet text is present and its code path executes") {
    // the snippet as printed — if the README changes, update BOTH places
    val snippet =
      """spark.read.format("pjparquet")
        |  .option("rowGroups", "2,5")        // explicit row-group ids (optional)
        |  .load("/data/wide.parquet")
        |  .select("c3", "c7").filter($"c3" > 0)""".stripMargin
    assert(readme.contains(snippet),
      "README snippet changed — keep ReadmeSpec's executed copy in sync")

    // execute the same API shape on a real multi-row-group file
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("readme").toString
    spark.range(4000)
      .select((col("id") % 100 - 50).as("c3"), col("id").as("c7"), lit("x").as("c9"))
      .coalesce(1)
      .write.mode("overwrite").option("parquet.block.size", "4096").parquet(dir)
    val file = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".parquet")).get.getPath
    val rgs = graft.core.PJSplice.Index.fromBytes(graft.core.PJIndex.generate(file))
      .header.rowGroups
    assume(rgs >= 6, s"fixture produced only $rgs row groups")
    val df = spark.read.format("pjparquet")
      .option("rowGroups", "2,5")
      .load(file)
      .select("c3", "c7").filter($"c3" > 0)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(0) > 0))
    assert(df.columns.toSeq == Seq("c3", "c7"))
  }

  test("README performance claims hold against the live microbenchmark") {
    // wall-clock assertion — machine/load dependent, so opt-in (the bench
    // itself still measures this every round); functional CI runs are not
    // failed by scheduler noise
    assume(sys.env.get("GRAFT_PERF_ASSERTS").contains("1"),
      "perf assertion skipped; set GRAFT_PERF_ASSERTS=1 to enable")
    // parse the claims: "(~30–105×)" and "index ≈ 2.3 % of the parquet size"
    val speedupClaim = """~(\d+)–(\d+)×""".r.findFirstMatchIn(readme)
      .getOrElse(fail("README speedup claim not found"))
    val claimedLow = speedupClaim.group(1).toInt
    val ratioClaim = """index ≈ ([\d.]+) %""".r.findFirstMatchIn(readme)
      .getOrElse(fail("README index-size claim not found"))
    val claimedRatio = ratioClaim.group(1).toDouble / 100.0

    // quick variant of the bench (20 reps, no thread-pool protocol)
    val json = Bench.metadataBench(spark, reps = 20, protocol = false)
    val speedup = """"speedup_1rg":([\d.]+)""".r.findFirstMatchIn(json).get.group(1).toDouble
    val ratio = """"index_size_ratio":([\d.]+)""".r.findFirstMatchIn(json).get.group(1).toDouble

    // generous machine-variance margin — catches order-of-magnitude drift,
    // not scheduler noise
    assert(speedup >= claimedLow / 2.0,
      s"live speedup $speedup× fell below half the README's claimed ${claimedLow}× lower bound")
    assert(ratio <= claimedRatio * 1.5 && ratio >= claimedRatio / 1.5,
      s"live index ratio $ratio drifted from the README's claimed $claimedRatio")
  }
}
