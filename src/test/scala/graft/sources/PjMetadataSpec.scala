package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.PjMetadata

/** The metadata table must agree, row group by row group, with an
  * INDEPENDENT parser: parquet-java's footer read. Our numbers come from
  * the PJ index byte walker (`rowNumber` + `chunkCompressedSize`), so a
  * match here cross-validates the index codec against the reference
  * parquet implementation on real multi-row-group files.
  */
class PjMetadataSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def parquetJavaBlocks(file: String): Seq[(Long, Long)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.fs.Path
    import scala.jdk.CollectionConverters._
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), spark.sessionState.newHadoopConf()))
    try reader.getFooter.getBlocks.asScala.toSeq.map { b =>
      (b.getRowCount, b.getColumns.asScala.map(_.getTotalSize).sum)
    } finally reader.close()
  }

  test("rowGroups matches parquet-java block-for-block on a multi-rg file") {
    val dir = java.nio.file.Files.createTempDirectory("pj_md").toString
    spark.range(200000L).toDF("k")
      .withColumn("payload", concat(lit("row-"), col("k")))
      .coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", (256 * 1024).toString)
      .parquet(dir)
    val file = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".parquet")).get.getPath

    val got = PjMetadata.rowGroups(spark, file)
      .orderBy("row_group")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    val expect = parquetJavaBlocks(file)
    assert(got.length == expect.length && got.length > 3,
      s"want several row groups, got ${got.length} vs ${expect.length}")
    got.zip(expect).zipWithIndex.foreach { case (((rg, rows, bytes), (eRows, eBytes)), i) =>
      assert(rg == i)
      assert(rows == eRows, s"rg $i rows: $rows vs parquet-java $eRows")
      assert(bytes == eBytes, s"rg $i bytes: $bytes vs parquet-java $eBytes")
    }
  }

  test("rowGroups spans every file of a partitioned layout") {
    val dir = java.nio.file.Files.createTempDirectory("pj_md_part").toString
    spark.range(1000L).toDF("k")
      .withColumn("p", col("k") % 3)
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    val md = PjMetadata.rowGroups(spark, dir)
    assert(md.select(countDistinct(col("file"))).head().getLong(0) >= 3)
    assert(md.agg(sum(col("num_rows"))).head().getLong(0) == 1000L)
  }
}
