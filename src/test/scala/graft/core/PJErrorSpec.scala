package graft.core

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.crypto.{ColumnEncryptionProperties, FileEncryptionProperties}
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.ColumnPath
import org.scalatest.funsuite.AnyFunSuite

/** O9 error surface — message texts verbatim from the reference
  * (`palletjack.cc:377-411`; tests `test_palletjack.py:155-208,334-364`).
  */
class PJErrorSpec extends AnyFunSuite {
  private lazy val (path, idxPath) = {
    val dir = Files.createTempDirectory("pj").toString
    val p = s"$dir/my.parquet"
    TestParquet.writeDoubleTable(p, 5, 7)
    PJIndex.generate(p, s"$p.index")
    (p, s"$p.index")
  }

  private def msg(f: => Any): String =
    intercept[Exception](f).getMessage

  test("invalid row group id") {
    assert(msg(PalletJack.readMetadata(idxPath, rowGroups = Seq(5))) ==
      "Requested row_group=5, but only 0-4 are available!")
  }

  test("invalid column id") {
    assert(msg(PalletJack.readMetadata(idxPath, columnIndices = Seq(7))) ==
      "Requested column=7, but only 0-6 are available!")
  }

  test("unknown column name") {
    assert(msg(PalletJack.readMetadata(idxPath, columnNames = Seq("no_such_column"))) ==
      "Couldn't find a column with a name 'no_such_column'!")
  }

  test("indices and names are mutually exclusive") {
    assert(msg(PalletJack.readMetadata(idxPath, columnIndices = Seq(7), columnNames = Seq("n_columns0"))) ==
      "Cannot specify both column indices and column names at the same time!")
  }

  test("non-index file") {
    assert(msg(PalletJack.readMetadata(path, rowGroups = Seq(0))) ==
      s"File '$path' has unexpected format!")
  }

  test("missing index file") {
    assert(msg(PalletJack.readMetadata("not_existing_file.parquet.index", rowGroups = Seq(0)))
      .contains("Failed to open local file 'not_existing_file.parquet.index'"))
  }

  test("in-memory index: too small / wrong length / bad magic") {
    assert(msg(PalletJack.readMetadataFromIndexData(Array[Byte](1, 2, 3)))
      .startsWith("Index data is too small, length=3"))
    val idx = Files.readAllBytes(java.nio.file.Paths.get(idxPath))
    assert(msg(PalletJack.readMetadataFromIndexData(idx ++ Array[Byte](0)))
      .startsWith("Index data has unexpected length,"))
    val bad = idx.clone(); bad(0) = 'X'
    assert(msg(PalletJack.readMetadataFromIndexData(bad)) == "Index file has unexpected format!")
  }

  test("read_schema error paths") {
    assertThrows[PJException](PalletJack.readSchema(idxPath, columnIndices = Seq(7)))
    assertThrows[PJException](PalletJack.readSchema(idxPath, columnNames = Seq("no_such_column")))
    assertThrows[PJException](
      PalletJack.readSchema(idxPath, columnIndices = Seq(0), columnNames = Seq("column_0")))
  }

  private def writeEncrypted(p: String, plaintextFooter: Boolean): Unit = {
    val schema = TestParquet.doubleSchema(3)
    val footerKey = "0123456789012345".getBytes
    val colKey = "1234567890123450".getBytes
    val colProps = (0 until 3).map { i =>
      val cp = ColumnPath.get(s"column_$i")
      cp -> ColumnEncryptionProperties.builder(cp).withKey(colKey).build()
    }.toMap
    val b = FileEncryptionProperties.builder(footerKey)
      .withEncryptedColumns(colProps.asJava)
    val props = (if (plaintextFooter) b.withPlaintextFooter() else b).build()
    val writer = ExampleParquetWriter.builder(new Path(p))
      .withConf(new Configuration())
      .withType(schema)
      .withEncryption(props)
      .build()
    try {
      val g = new SimpleGroup(schema)
      for (c <- 0 until 3) g.add(s"column_$c", 1.0 * c)
      writer.write(g)
    } finally writer.close()
  }

  test("encrypted column metadata (plaintext footer) is rejected at index build") {
    val dir = Files.createTempDirectory("pj").toString
    val p = s"$dir/encrypted_plaintext_footer.parquet"
    writeEncrypted(p, plaintextFooter = true)
    assert(msg(PJIndex.generate(p)) == s"Encrypted column metadata is not supported: '$p'.")
  }

  test("encrypted footer is rejected at index build") {
    val dir = Files.createTempDirectory("pj").toString
    val p = s"$dir/encrypted_footer.parquet"
    writeEncrypted(p, plaintextFooter = false)
    assert(msg(PJIndex.generate(p))
      .contains("Could not read encrypted metadata, no decryption found in reader's properties"))
  }
}
