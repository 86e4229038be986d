package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.ZOrder

/** Hilbert-curve clustering: the Skilling transform is a genuine Hilbert
  * curve (bijective + unit-step), codegen matches the interpreted path
  * bit-for-bit, and a Hilbert layout prunes row groups on every
  * participating dimension like (or better than) the Morton layout.
  */
class HilbertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def indexOf(bits: Int, coords: Long*): Long =
    HilbertCurve.index(coords.toArray, bits)

  test("2-D and 3-D: bijective over the full grid, consecutive indices are unit steps") {
    for ((dims, bits) <- Seq((2, 4), (3, 3))) {
      val side = 1 << bits
      val pts = (0 until math.pow(side, dims).toInt).map { i =>
        (0 until dims).map(d => ((i >> (d * bits)) & (side - 1)).toLong)
      }
      val byIndex = pts.map(p => indexOf(bits, p: _*) -> p)
      assert(byIndex.map(_._1).distinct.size == pts.size, s"dims=$dims must be a bijection")
      assert(byIndex.map(_._1).min == 0L &&
        byIndex.map(_._1).max == pts.size.toLong - 1, s"dims=$dims must cover [0, n^d)")
      val walk = byIndex.sortBy(_._1).map(_._2)
      walk.sliding(2).foreach { case Seq(a, b) =>
        val manhattan = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
        assert(manhattan == 1L,
          s"dims=$dims: consecutive Hilbert points must be unit steps, got $a -> $b")
      }
    }
  }

  test("codegen agrees with the interpreted transform; null coordinate yields null") {
    val df = spark.range(0, 4096).select(
      (col("id") % 61).as("a"), ((col("id") * 37) % 53).as("b"),
      ((col("id") * 101) % 47).as("c"))
    val got = df.select(col("a"), col("b"), col("c"),
      HilbertCurve.hilbertIndex(6, col("a"), col("b"), col("c")).as("h"))
      .collect()
    got.foreach { r =>
      val expect = HilbertCurve.index(
        Array(r.getLong(0), r.getLong(1), r.getLong(2)), 6)
      assert(r.getLong(3) == expect, s"row $r")
    }
    val withNull = spark.range(0, 4).select(
      when(col("id") === 2, lit(null)).otherwise(col("id")).cast("long").as("a"),
      col("id").as("b"))
      .select(HilbertCurve.hilbertIndex(4, col("a"), col("b")).as("h"))
      .collect().map(r => r.isNullAt(0))
    assert(withNull.count(identity) == 1, "exactly the null-coordinate row is null")
  }

  test("hilbert layout prunes the second dimension at least as well as z-order") {
    val n = 1 << 17
    val raw = spark.range(n).select(
      (col("id") % 256).as("a"),
      (shiftright(col("id"), 8) % 256).as("b"),
      col("id").as("payload"))
    val smallRg = Map(
      "parquet.block.size" -> (16 * 1024).toString,
      "parquet.page.size" -> (4 * 1024).toString)
    def layout(curve: String): String = {
      val d = java.nio.file.Files.createTempDirectory(s"hilb_$curve").toString
      ZOrder.zorderByWithPrefix(raw, Nil, Seq("a", "b"), 8, bits = 16, curve = curve)
        .write.mode("overwrite").options(smallRg).parquet(d)
      d
    }
    val zDir = layout("zorder")
    val hDir = layout("hilbert")
    val checksum = (d: String) => spark.read.parquet(d)
      .agg(sum(col("payload") * (col("a") + 1) * (col("b") + 3))).head().getLong(0)
    assert(checksum(hDir) == checksum(zDir), "re-layout must preserve content")
    def overlapFraction(dir: String, column: String): Double = {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import org.apache.hadoop.fs.Path
      import scala.jdk.CollectionConverters._
      val conf = spark.sessionState.newHadoopConf()
      val stats = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).toSeq
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
      stats.count { case (lo, hi) => hi >= 96L && lo < 128L }.toDouble / stats.size
    }
    val zFrac = overlapFraction(zDir, "b")
    val hFrac = overlapFraction(hDir, "b")
    assert(hFrac <= 0.5, s"hilbert pruned too little on b: $hFrac")
    assert(hFrac <= zFrac * 1.25,
      s"hilbert ($hFrac) must prune comparably to z-order ($zFrac)")
    // and on the FIRST dimension too (a linear sort would only prune one)
    val hFracA = overlapFraction(hDir, "a")
    assert(hFracA <= 0.5, s"hilbert pruned too little on a: $hFracA")
  }

  test("declared clustering (pj.cluster.columns/curve): OPTIMIZE with no args uses the table contract") {
    val t = java.nio.file.Files.createTempDirectory("hilb_decl")
    java.nio.file.Files.delete(t)
    val dir = t.toString
    spark.conf.set("spark.sql.catalog.pjdcl", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"CREATE TABLE pjdcl.`$dir` (x BIGINT, y BIGINT) USING pjparquet " +
      "TBLPROPERTIES ('pj.cluster.columns'='x,y', 'pj.cluster.curve'='hilbert')")
    spark.range(0, 5000).select((col("id") % 70).as("x"), ((col("id") * 31) % 70).as("y"))
      .writeTo(s"pjdcl.`$dir`").append()
    val r = spark.sql(s"CALL pjdcl.system.optimize_zorder('$dir')").head()
    assert(r.getLong(2) > 0, s"declared-key optimize must rewrite: $r")
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val entries = graft.sources.pjparquet.PjCommitLog.latest(fs, root).get.entries
    assert(entries.forall(_.clusteredBy.exists(_.startsWith("hilbert:x,y"))),
      s"declared curve + columns must drive the spec: ${entries.map(_.clusteredBy)}")
    // explicit arguments still win over the declaration
    val r2 = spark.sql(
      s"CALL pjdcl.system.optimize_zorder('$dir', 'y,x', curve => 'zorder')").head()
    assert(r2.getLong(2) > 0)
    // no declaration + no argument refuses with the property hint
    val bare = java.nio.file.Files.createTempDirectory("hilb_bare")
    java.nio.file.Files.delete(bare)
    spark.sql(s"CREATE TABLE pjdcl.`${bare}` (x BIGINT, y BIGINT) USING pjparquet")
    spark.range(0, 10).select(col("id").as("x"), col("id").as("y"))
      .writeTo(s"pjdcl.`${bare}`").append()
    val e = intercept[Exception](
      spark.sql(s"CALL pjdcl.system.optimize_zorder('${bare}')").head())
    assert(e.getMessage.contains("pj.cluster.columns"), s"unhelpful: ${e.getMessage}")
  }

  test("OPTIMIZE curve=hilbert: provenance recorded, same-spec rerun skips, curve switch re-clusters") {
    val t = java.nio.file.Files.createTempDirectory("hilb_opt")
    java.nio.file.Files.delete(t)
    val dir = t.toString
    spark.conf.set("spark.sql.catalog.pjhil", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"CREATE TABLE pjhil.`$dir` (x BIGINT, y BIGINT) USING pjparquet")
    spark.range(0, 10000).select((col("id") % 100).as("x"), ((col("id") * 13) % 100).as("y"))
      .writeTo(s"pjhil.`$dir`").append()
    val r1 = spark.sql(
      s"CALL pjhil.system.optimize_zorder('$dir', 'x,y', curve => 'hilbert')").head()
    assert(r1.getLong(2) > 0, s"first optimize must rewrite: $r1")
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val entries = graft.sources.pjparquet.PjCommitLog.latest(fs, root).get.entries
    assert(entries.nonEmpty && entries.forall(_.clusteredBy.exists(_.startsWith("hilbert:"))),
      s"provenance must record the curve: ${entries.map(_.clusteredBy)}")
    // same spec: nothing to do
    val r2 = spark.sql(
      s"CALL pjhil.system.optimize_zorder('$dir', 'x,y', curve => 'hilbert')").head()
    assert(r2.getLong(1) == 0 && r2.getLong(2) == 0, s"same-spec rerun must skip: $r2")
    // switching curve re-clusters everything once
    val r3 = spark.sql(
      s"CALL pjhil.system.optimize_zorder('$dir', 'x,y')").head()
    assert(r3.getLong(2) > 0, s"curve switch must re-cluster: $r3")
    // same-spec rerun skips again; OPTIMIZE ... FULL overrides provenance
    val r4 = spark.sql(
      s"CALL pjhil.system.optimize_zorder('$dir', 'x,y')").head()
    assert(r4.getLong(2) == 0, s"same-spec rerun must skip: $r4")
    val r5 = spark.sql(
      s"CALL pjhil.system.optimize_zorder('$dir', 'x,y', full => true)").head()
    assert(r5.getLong(2) > 0, s"FULL must re-rewrite despite provenance: $r5")
    assert(spark.table(s"pjhil.`$dir`").count() == 10000L)
  }
}
