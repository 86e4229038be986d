package graft.core

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** O1/O2 index generation, incl. the binary golden-master test
  * (mirror of `/root/reference/python/test/test_palletjack.py:210-249`) and
  * the foreign-writer fixture (`:135-153`).
  */
class PJIndexSpec extends AnyFunSuite {
  private val refData = "/root/reference/python/test/data"

  test("golden master: generated index byte-equals the committed fixture") {
    val actual = PJIndex.generate(s"$refData/golden_master.parquet")
    val expected = Files.readAllBytes(Paths.get(s"$refData/golden_master.parquet.index"))
    assert(actual.length == expected.length, "index size mismatch")
    assert(java.util.Arrays.equals(actual, expected), "index bytes mismatch")
  }

  test("O2 writes the same bytes as O1 returns") {
    val dir = Files.createTempDirectory("pj").toString
    val idxPath = s"$dir/golden.index"
    PJIndex.generate(s"$refData/golden_master.parquet", idxPath)
    val fromFile = Files.readAllBytes(Paths.get(idxPath))
    val inMemory = PJIndex.generate(s"$refData/golden_master.parquet")
    assert(java.util.Arrays.equals(fromFile, inMemory))
  }

  test("foreign-writer file without column_orders indexes and splices") {
    val path = s"$refData/no_column_orders.parquet"
    val idx = PJIndex.generate(path)
    val parsed = PJSplice.Index.fromBytes(idx)
    // absent column_orders section is the all-zero sentinel (palletjack.cc:288-299)
    assert(parsed.columnOrdersOffset(0) == 0)

    // no-op splice == verbatim original footer bytes
    val footer = PJIndex.readLocalFooterBytes(path)
    val noop = PJSplice.splice(parsed, Nil, Nil, Nil, schemaOnly = false)
    assert(java.util.Arrays.equals(noop, footer))

    // all-rows+all-columns splice parses and matches the stock footer
    val orig = TestParquet.readFooter(path)
    val nCols = orig.getFileMetaData.getSchema.getFieldCount
    val nRgs = orig.getBlocks.size()
    val spliced = PalletJack.readMetadataFromIndexData(idx, 0 until nRgs, 0 until nCols)
    assert(spliced.getFileMetaData.getSchema == orig.getFileMetaData.getSchema)
    assert(spliced.getBlocks.size() == nRgs)
    for (i <- 0 until nRgs) {
      assert(spliced.getBlocks.get(i).getRowCount == orig.getBlocks.get(i).getRowCount)
      assert(spliced.getBlocks.get(i).getStartingPos == orig.getBlocks.get(i).getStartingPos)
    }
  }

  test("index layout matches the DataHeader formulas") {
    val dir = Files.createTempDirectory("pj").toString
    val path = s"$dir/t.parquet"
    TestParquet.writeDoubleTable(path, nRowGroups = 5, nCols = 7)
    assert(TestParquet.readFooter(path).getBlocks.size() == 5, "writer must emit 1-row row groups")
    val idx = PJIndex.generate(path)
    val h = PJIndex.Header.parse(idx, 0)
    assert(h.rowGroups == 5)
    assert(h.columns == 7)
    assert(idx.length == PJIndex.HeaderLength + h.bodySize)
    val names = PJSplice.Index.fromBytes(idx).columnNames
    assert(names.toSeq == (0 until 7).map(i => s"column_$i"))
  }

  test("nested schemas are rejected at index build (reference flat-schema restriction)") {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.example.data.simple.SimpleGroup
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.MessageTypeParser
    val dir = Files.createTempDirectory("pjnested").toString
    val path = s"$dir/nested.parquet"
    val schema = MessageTypeParser.parseMessageType(
      "message m { required group g { required int32 a; required int32 b; } required int64 id; }")
    val w = ExampleParquetWriter.builder(new Path(path))
      .withConf(new Configuration()).withType(schema).build()
    try {
      val g = new SimpleGroup(schema)
      g.addGroup("g").append("a", 1).append("b", 2)
      g.add("id", 7L)
      w.write(g)
    } finally w.close()
    val e = intercept[PJException](PJIndex.generate(path))
    assert(e.getMessage.startsWith("Schema offsets information is invalid"),
      s"unexpected message: ${e.getMessage}")
  }

  test("in-memory index data equals the sidecar file (test_inmemory_index_data)") {
    val dir = Files.createTempDirectory("pj").toString
    val path = s"$dir/t.parquet"
    TestParquet.writeDoubleTable(path, 5, 7)
    PJIndex.generate(path, s"$path.index")
    val fileBytes = Files.readAllBytes(Paths.get(s"$path.index"))
    assert(java.util.Arrays.equals(PJIndex.generate(path), fileBytes))
  }
}
