package graft.core

import scala.collection.mutable.ArrayBuffer

/** Errors raised by the PalletJack-compatible index codec. Message texts
  * mirror the reference implementation verbatim
  * (`/root/reference/python/palletjack/palletjack.cc:239-310,377-411`) so the
  * ported error-path tests stay meaningful.
  */
class PJException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/** Single-pass offset-recording walk over a Thrift-compact `FileMetaData`
  * footer buffer.
  *
  * This replaces the reference's instrumented Thrift codegen
  * (`/root/reference/python/palletjack/parquet_types_palletjack.cpp:6907-7060`
  * `FileMetaData::read`, `:5560-5601` `RowGroup::read`, `:2599-2604`
  * `SchemaElement::read`) with a streaming skipper built on
  * [[ThriftCompact.Reader]]: instead of materializing structs, it records the
  * running byte offset (`xfer` in the reference) around the handful of
  * interesting fields:
  *
  *  - `FileMetaData` field 2 (`schema` list): list-header offset, each
  *    element's start, end of last element — absolute.
  *  - `FileMetaData` field 3 (`num_rows` i64): value start/end — absolute.
  *  - `FileMetaData` field 4 (`row_groups` list): same shape as schema —
  *    absolute; plus each RowGroup's `num_rows` value.
  *  - `FileMetaData` field 7 (`column_orders` list): same shape — absolute;
  *    empty when the field is absent.
  *  - `RowGroup` field 1 (`columns` list): same shape, offsets *relative to
  *    the RowGroup struct start* (the reference's per-struct `xfer`).
  *  - `SchemaElement` field 5 (`num_children` i32): value start/end relative
  *    to the element start; plus field 4 (`name`).
  */
object FooterWalker {
  import ThriftCompact._

  final case class SchemaElementInfo(
      name: String,
      numChildren: Int, // -1 when the field is absent
      ncOffsets: Array[Int]) // empty or [start, end] relative to element start

  final case class RowGroupInfo(
      numRows: Long,
      ccOffsets: Array[Int]) // [listHeader, chunk0, ..., end] relative to struct start

  final case class Result(
      schemaOffsets: Array[Int],
      elements: Array[SchemaElementInfo],
      numRowsOffsets: Array[Int],
      rowGroupsOffsets: Array[Int],
      rowGroups: Array[RowGroupInfo],
      columnOrdersOffsets: Array[Int], // empty when field 7 absent
      encryptionAlgorithmSet: Boolean,
      metadataLength: Int) // consumed bytes of the FileMetaData message

  def walk(buf: Array[Byte], start: Int, end: Int): Result = {
    val r = new Reader(buf, start, end)
    val schemaOffsets = new ArrayBuffer[Int]
    val elements = new ArrayBuffer[SchemaElementInfo]
    var numRowsOffsets = Array.empty[Int]
    val rowGroupsOffsets = new ArrayBuffer[Int]
    val rowGroups = new ArrayBuffer[RowGroupInfo]
    val columnOrdersOffsets = new ArrayBuffer[Int]
    var encryption = false

    def abs: Int = r.pos - start

    var lastFid = 0
    var done = false
    while (!done) {
      val (tpe, fid) = r.readFieldHeader(lastFid)
      if (tpe == 0) done = true
      else {
        lastFid = fid
        (fid, tpe) match {
          case (2, TypeList) => // required list<SchemaElement> schema
            schemaOffsets += abs
            val (_, n) = r.readListHeader()
            var i = 0
            while (i < n) { schemaOffsets += abs; elements += walkSchemaElement(r); i += 1 }
            schemaOffsets += abs
          case (3, TypeI64) => // required i64 num_rows
            val o0 = abs; r.readZigZag64(); numRowsOffsets = Array(o0, abs)
          case (4, TypeList) => // required list<RowGroup> row_groups
            rowGroupsOffsets += abs
            val (_, n) = r.readListHeader()
            var i = 0
            while (i < n) { rowGroupsOffsets += abs; rowGroups += walkRowGroup(r); i += 1 }
            rowGroupsOffsets += abs
          case (7, TypeList) => // optional list<ColumnOrder> column_orders
            columnOrdersOffsets += abs
            val (_, n) = r.readListHeader()
            var i = 0
            while (i < n) { columnOrdersOffsets += abs; r.skipStruct(); i += 1 }
            columnOrdersOffsets += abs
          case (8, _) => // optional EncryptionAlgorithm encryption_algorithm
            encryption = true; r.skipValue(tpe)
          case _ => r.skipValue(tpe)
        }
      }
    }

    Result(
      schemaOffsets.toArray, elements.toArray, numRowsOffsets,
      rowGroupsOffsets.toArray, rowGroups.toArray, columnOrdersOffsets.toArray,
      encryption, abs)
  }

  private def walkSchemaElement(r: Reader): SchemaElementInfo = {
    val structStart = r.pos
    var name: String = null
    var numChildren = -1
    var nc = Array.empty[Int]
    var lastFid = 0
    var done = false
    while (!done) {
      val (tpe, fid) = r.readFieldHeader(lastFid)
      if (tpe == 0) done = true
      else {
        lastFid = fid
        (fid, tpe) match {
          case (4, TypeBinary) => name = r.readString()
          case (5, TypeI32) => // optional i32 num_children
            val o0 = r.pos - structStart
            numChildren = r.readZigZag32()
            nc = Array(o0, r.pos - structStart)
          case _ => r.skipValue(tpe)
        }
      }
    }
    SchemaElementInfo(name, numChildren, nc)
  }

  private def walkRowGroup(r: Reader): RowGroupInfo = {
    val structStart = r.pos
    var numRows = 0L
    val cc = new ArrayBuffer[Int]
    var lastFid = 0
    var done = false
    while (!done) {
      val (tpe, fid) = r.readFieldHeader(lastFid)
      if (tpe == 0) done = true
      else {
        lastFid = fid
        (fid, tpe) match {
          case (1, TypeList) => // required list<ColumnChunk> columns
            cc += (r.pos - structStart)
            val (_, n) = r.readListHeader()
            var i = 0
            while (i < n) { cc += (r.pos - structStart); r.skipStruct(); i += 1 }
            cc += (r.pos - structStart)
          case (3, TypeI64) => numRows = r.readZigZag64()
          case _ => r.skipValue(tpe)
        }
      }
    }
    RowGroupInfo(numRows, cc.toArray)
  }
}
