package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Z-order layout: value correctness against a bit-by-bit local model, and
  * the pruning claim proved against REAL parquet row-group statistics —
  * a filter on the second dimension must skip most row groups of the
  * z-ordered file while skipping none of the single-column-sorted one.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Local reference: interleave bit j of a to 2j, of b to 2j+1. */
  private def mortonRef(a: Long, b: Long): Long =
    (0 until 32).foldLeft(0L) { (acc, j) =>
      acc | ((a >> j) & 1L) << (2 * j) | ((b >> j) & 1L) << (2 * j + 1)
    }

  test("interleave2 matches the bit-by-bit model; interleaveN agrees in 2-D") {
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (12345L, 54321L), (65535L, 65535L), (40000L, 1L))
    val df = pairs.toDF("a", "b")
      .withColumn("z2", ZOrder.interleave2($"a", $"b"))
      .withColumn("zn", ZOrder.interleaveN(Seq($"a", $"b"), 16))
    df.collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == mortonRef(a, b), s"interleave2($a,$b)")
      assert(r.getLong(3) == mortonRef(a, b), s"interleaveN($a,$b)")
    }
    // 3-D: position arithmetic per dimension
    val d3 = Seq((1L, 1L, 1L), (7L, 0L, 2L)).toDF("a", "b", "c")
      .withColumn("z", ZOrder.interleaveN(Seq($"a", $"b", $"c"), 4))
      .collect().map(_.getLong(3))
    def ref3(a: Long, b: Long, c: Long): Long =
      (0 until 4).foldLeft(0L) { (acc, j) =>
        acc | ((a >> j) & 1L) << (3 * j) | ((b >> j) & 1L) << (3 * j + 1) |
          ((c >> j) & 1L) << (3 * j + 2)
      }
    assert(d3.toSeq == Seq(ref3(1, 1, 1), ref3(7, 0, 2)))
  }

  test("scaleToBits: exact integer scaling, inclusive bounds, degenerate range") {
    val df = Seq(0L, 1L, 500L, 999L, 1000L).toDF("v")
      .withColumn("s", ZOrder.scaleToBits($"v", lit(0L), lit(1000L), 16))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(df(0L) == 0L)
    assert(df(1000L) == 65535L)
    assert(df(500L) == 500L * 65535L / 1000L)
    assert(df(999L) == 999L * 65535L / 1000L)
    val degen = Seq(7L).toDF("v")
      .select(ZOrder.scaleToBits($"v", lit(7L), lit(7L), 16)).head().getLong(0)
    assert(degen == 0L)
  }

  /** Per-row-group (min, max) of an int64 column from the real footers of
    * every parquet part-file in `dir`.
    */
  private def rowGroupStats(dir: String, column: String): Seq[(Long, Long)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.fs.Path
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).toSeq
      .flatMap { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f.getPath), conf))
        try reader.getFooter.getBlocks.asScala.toSeq.map { block =>
          val cc = block.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .getOrElse(fail(s"no column $column in ${f.getName}"))
          val st = cc.getStatistics
          (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
        } finally reader.close()
      }
  }

  test("z-ordered layout prunes row groups on the second dimension; linear sort cannot") {
    // two independent uniform dimensions; a linear sort on `a` leaves `b`
    // spanning its full range in every row group
    // a full 256×256 grid, twice over: a and b are genuinely independent
    // (a congruential formula like (id*7919)%256 would make b a function
    // of a — mod-256 arithmetic preserves the correlation)
    val n = 1 << 17
    val raw = spark.range(n).select(
      (col("id") % 256).as("a"),
      (shiftright(col("id"), 8) % 256).as("b"),
      col("id").as("payload"))
    val smallRg = Map(
      "parquet.block.size" -> (16 * 1024).toString, // many small row groups
      "parquet.page.size" -> (4 * 1024).toString)

    val linDir = java.nio.file.Files.createTempDirectory("zorder_lin").toString
    raw.repartitionByRange(8, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").options(smallRg).parquet(linDir)

    val zDir = java.nio.file.Files.createTempDirectory("zorder_z").toString
    ZOrder.zorderBy(raw, Seq("a", "b"), numPartitions = 8)
      .write.mode("overwrite").options(smallRg).parquet(zDir)

    // content survives the re-layout byte-for-byte
    val checksum = (d: String) => spark.read.parquet(d)
      .agg(sum(col("payload") * (col("a") + 1) * (col("b") + 3))).head().getLong(0)
    assert(checksum(zDir) == checksum(linDir))

    // pruning for filter b IN [96, 128): fraction of row groups whose
    // [min,max] overlaps the slab
    def overlapFraction(dir: String): (Int, Double) = {
      val stats = rowGroupStats(dir, "b")
      val hits = stats.count { case (lo, hi) => hi >= 96L && lo < 128L }
      (stats.size, hits.toDouble / stats.size)
    }
    val (linRgs, linFrac) = overlapFraction(linDir)
    val (zRgs, zFrac) = overlapFraction(zDir)
    assert(linRgs >= 8 && zRgs >= 8, s"need several row groups, got lin=$linRgs z=$zRgs")
    // the linear layout essentially cannot prune the b-slab (a couple of
    // row groups may align with a b-cycle boundary at file tails)...
    assert(linFrac >= 0.9, s"linear layout unexpectedly pruned b: $linFrac")
    // ...while the z-order layout must skip at least half the row groups
    // (a 1/8-wide slab leaves ~3/4 of z-space untouched; 0.5 is a safe floor)
    assert(zFrac <= 0.5, s"z-order pruned too little: $zFrac of $zRgs row groups match")
    assert(zFrac < linFrac / 2.0, s"z-order ($zFrac) must at least halve the scan vs linear ($linFrac)")
  }

  test("zorderBy edge cases: empty input, all-null column, user _zorder column") {
    import spark.implicits._
    // empty frame: min/max aggregates are all null — return it unchanged
    // instead of the old NullPointerException
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ZOrder.zorderBy(empty, Seq("a", "b"), numPartitions = 2).count() == 0L)

    // all-null column on non-empty data: a descriptive error naming the
    // column, not an NPE from row.getLong
    val withNull = Seq((1L, 2L), (3L, 4L)).toDF("a", "x")
      .withColumn("b", lit(null).cast("long"))
    val err = intercept[IllegalArgumentException] {
      ZOrder.zorderBy(withNull, Seq("a", "b"), numPartitions = 2)
    }
    assert(err.getMessage.contains("all-null column"))
    assert(err.getMessage.contains("b"))

    // a user column literally named "_zorder" survives the re-layout
    // (the old fixed scratch name silently overwrote then dropped it)
    val clash = Seq((1L, 10L, "keep1"), (2L, 20L, "keep2")).toDF("a", "b", "_zorder")
    val out = ZOrder.zorderBy(clash, Seq("a", "b"), numPartitions = 2)
    assert(out.columns.toSeq == Seq("a", "b", "_zorder"))
    assert(out.select("_zorder").as[String].collect().toSet == Set("keep1", "keep2"))
  }
}
