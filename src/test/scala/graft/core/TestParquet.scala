package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.ParquetMetadata
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{MessageType, MessageTypeParser}

/** Shared fixture writer: the JVM analogue of the reference's
  * `get_table()` + `pq.write_table(..., row_group_size=1)` 5×7 float64 table
  * (`/root/reference/python/test/test_palletjack.py:14-16,42-54`).
  */
object TestParquet {
  def doubleSchema(nCols: Int): MessageType = {
    val fields = (0 until nCols).map(i => s"  required double column_$i;").mkString("\n")
    MessageTypeParser.parseMessageType(s"message schema {\n$fields\n}")
  }

  /** One row per row group: tiny rowGroupSize + per-row size checks force a
    * flush after every record.
    */
  def writeDoubleTable(path: String, nRowGroups: Int, nCols: Int, seed: Long = 42L): MessageType = {
    val schema = doubleSchema(nCols)
    val conf = new Configuration()
    val writer = ExampleParquetWriter.builder(new Path(path))
      .withConf(conf)
      .withType(schema)
      .withRowGroupSize(8L)
      .withDictionaryEncoding(false)
      .withMinRowCountForPageSizeCheck(1)
      .withMaxRowCountForPageSizeCheck(1)
      .build()
    val rnd = new scala.util.Random(seed)
    try {
      for (_ <- 0 until nRowGroups) {
        val g = new SimpleGroup(schema)
        for (c <- 0 until nCols) g.add(s"column_$c", rnd.nextDouble())
        writer.write(g)
      }
    } finally writer.close()
    schema
  }

  def readFooter(path: String): ParquetMetadata =
    ParquetFileReader.readFooter(
      HadoopInputFile.fromPath(new Path(path), new Configuration()),
      org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
}
