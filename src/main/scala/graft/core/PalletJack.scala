package graft.core

import java.io.ByteArrayInputStream

import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.metadata.ParquetMetadata
import org.apache.parquet.schema.MessageType

/** Public API surface — the Scala counterpart of the reference's
  * `palletjack_cython.pyx:13-67` (O1-O8 in SURVEY.md §2.1).
  *
  * `readMetadata*` return parquet-java [[ParquetMetadata]] (the JVM analogue
  * of the pyarrow `FileMetaData` the reference hands to
  * `ParquetReader.open(path, metadata=...)`); the `*Bytes` variants expose
  * the raw spliced Thrift message for callers that ship footers across the
  * driver/executor boundary.
  */
object PalletJack {

  /** O1: index bytes for a parquet file. */
  def generateMetadataIndex(parquetPath: String): Array[Byte] =
    PJIndex.generate(parquetPath)

  /** O2: write the sidecar next to `indexFilePath`. */
  def generateMetadataIndex(parquetPath: String, indexFilePath: String): Unit =
    PJIndex.generate(parquetPath, indexFilePath)

  /** O3-O6: pruned footer bytes from an index file. */
  def readMetadataBytes(
      indexFilePath: String,
      rowGroups: Seq[Int] = Nil,
      columnIndices: Seq[Int] = Nil,
      columnNames: Seq[String] = Nil,
      schemaOnly: Boolean = false): Array[Byte] =
    PJSplice.splice(PJSplice.Index.fromFile(indexFilePath), rowGroups, columnIndices, columnNames, schemaOnly)

  /** O7: pruned footer bytes from in-memory index data. */
  def readMetadataBytesFromIndexData(
      indexData: Array[Byte],
      rowGroups: Seq[Int] = Nil,
      columnIndices: Seq[Int] = Nil,
      columnNames: Seq[String] = Nil,
      schemaOnly: Boolean = false): Array[Byte] =
    PJSplice.splice(PJSplice.Index.fromBytes(indexData), rowGroups, columnIndices, columnNames, schemaOnly)

  /** Materialize spliced footer bytes into parquet-java metadata — the JVM
    * analogue of `parquet::FileMetaData::Make` (`palletjack.cc:614-615`).
    */
  def materialize(footerBytes: Array[Byte]): ParquetMetadata =
    new ParquetMetadataConverter().readParquetMetadata(new ByteArrayInputStream(footerBytes))

  def readMetadata(
      indexFilePath: String,
      rowGroups: Seq[Int] = Nil,
      columnIndices: Seq[Int] = Nil,
      columnNames: Seq[String] = Nil): ParquetMetadata =
    materialize(readMetadataBytes(indexFilePath, rowGroups, columnIndices, columnNames))

  def readMetadataFromIndexData(
      indexData: Array[Byte],
      rowGroups: Seq[Int] = Nil,
      columnIndices: Seq[Int] = Nil,
      columnNames: Seq[String] = Nil): ParquetMetadata =
    materialize(readMetadataBytesFromIndexData(indexData, rowGroups, columnIndices, columnNames))

  /** O8: schema without any row-group metadata (`palletjack_cython.pyx:48-67`,
    * `schema_only=true` ⇒ `num_rows=0` + empty row-group list,
    * `palletjack.cc:492`).
    */
  def readSchema(
      indexFilePath: String,
      columnIndices: Seq[Int] = Nil,
      columnNames: Seq[String] = Nil): MessageType =
    materialize(readMetadataBytes(indexFilePath, Nil, columnIndices, columnNames, schemaOnly = true))
      .getFileMetaData.getSchema

  def readSchemaFromIndexData(
      indexData: Array[Byte],
      columnIndices: Seq[Int] = Nil,
      columnNames: Seq[String] = Nil): MessageType =
    materialize(readMetadataBytesFromIndexData(indexData, Nil, columnIndices, columnNames, schemaOnly = true))
      .getFileMetaData.getSchema
}
