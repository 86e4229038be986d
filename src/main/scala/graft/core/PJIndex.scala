package graft.core

import java.io.{FileNotFoundException, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** PJ_2 sidecar-index generation — Scala port of the reference semantics.
  *
  * Layout (`/root/reference/python/palletjack/palletjack.cc:33-80`), all
  * little-endian u32 unless noted:
  *
  * {{{
  * 'PJ_2' | row_groups | columns | column_names_length | metadata_length   (20-byte header)
  * num_rows_offsets       : 2
  * row_numbers            : rg
  * schema_offsets         : 1 + 1 + c + 1
  * schema_num_children    : (c + 1) * 2         (relative to element start)
  * row_groups_offsets     : 1 + rg + 1
  * column_orders_offsets  : 1 + c + 1           (all-zero when absent)
  * column_chunks_offsets  : rg * (1 + c + 1)    (relative to RowGroup start)
  * column names           : NUL-terminated, schema order
  * metadata               : verbatim Thrift-compact footer bytes
  * }}}
  *
  * Unlike the reference (which re-serializes the footer through Arrow before
  * instrumented re-parse, `palletjack.cc:223-237`), we record offsets over the
  * file's original footer bytes directly; for Arrow-written files the two are
  * byte-identical (verified against the reference's committed golden master).
  */
object PJIndex {
  val Magic: Array[Byte] = Array('P', 'J', '_', '2').map(_.toByte)

  /** NESTED-schema extension magic. A `PJ_3` index carries the exact PJ_2
    * section layout with "column" meaning TOP-LEVEL FIELD: schema offsets
    * point at SUBTREE boundaries (a Thrift schema list is depth-first, so
    * every top-level field's subtree is contiguous), chunk/column-order
    * offsets point at the field's LEAF-RANGE boundaries, and two extra
    * u32 sections record each field's subtree element count and leaf
    * count (needed to rewrite the spliced list headers). A flat schema
    * under PJ_3 would degenerate to PJ_2 with both counts all-1 — the
    * compat format stays byte-identical to the reference (golden-master
    * pinned); PJ_3 lifts its flat-only restriction
    * (`palletjack.cc:266-279`) at top-level-subtree pruning granularity.
    */
  val Magic3: Array[Byte] = Array('P', 'J', '_', '3').map(_.toByte)
  val HeaderLength = 20

  /** Section sizing formulas from `palletjack.cc:41-59`; `nested` adds the
    * PJ_3 subtree-metadata section (element counts + leaf counts).
    */
  final case class Header(rowGroups: Int, columns: Int, columnNamesLength: Int,
      metadataLength: Int, nested: Boolean = false) {
    def numRowsOffsetsSize: Int = 2
    def rowNumbersSize: Int = rowGroups
    def schemaOffsetsSize: Int = 1 + 1 + columns + 1
    def schemaNumChildrenOffsetsSize: Int = (columns + 1) * 2
    def rowGroupsOffsetsSize: Int = 1 + rowGroups + 1
    def columnOrdersOffsetsSize: Int = 1 + columns + 1
    def columnChunksOffsetsSize: Int = rowGroups * (1 + columns + 1)
    def subtreeMetaSize: Int = if (nested) 2 * columns else 0
    def bodySize: Long =
      4L * (numRowsOffsetsSize + rowNumbersSize + schemaOffsetsSize +
        schemaNumChildrenOffsetsSize + rowGroupsOffsetsSize +
        columnOrdersOffsetsSize + columnChunksOffsetsSize + subtreeMetaSize) +
        (columnNamesLength & 0xffffffffL) + (metadataLength & 0xffffffffL)
  }

  object Header {
    def parse(bytes: Array[Byte], off: Int): Header = {
      val bb = ByteBuffer.wrap(bytes, off, HeaderLength).order(ByteOrder.LITTLE_ENDIAN)
      val m = new Array[Byte](4); bb.get(m)
      val nested = java.util.Arrays.equals(m, Magic3)
      if (!nested && !java.util.Arrays.equals(m, Magic))
        throw new PJException("Index file has unexpected format!")
      Header(bb.getInt, bb.getInt, bb.getInt, bb.getInt, nested)
    }
    /** Magic check without throwing (callers that need path-specific errors). */
    def magicOk(bytes: Array[Byte], off: Int): Boolean =
      bytes.length - off >= 4 &&
        bytes(off) == 'P' && bytes(off + 1) == 'J' && bytes(off + 2) == '_' &&
        (bytes(off + 3) == '2' || bytes(off + 3) == '3')
  }

  private val Par1 = Array[Byte]('P', 'A', 'R', '1')
  private val ParE = Array[Byte]('P', 'A', 'R', 'E')

  /** Extract the Thrift footer bytes of a parquet file: the `metadata_length`
    * bytes preceding the 8-byte `[len]['PAR1']` tail. Rejects encrypted-footer
    * files ('PARE' magic) with the Arrow error text the reference surfaces
    * (`test_palletjack.py:334-347`).
    */
  def readFooterBytes(readRange: (Long, Int) => Array[Byte], fileLen: Long, pathForErrors: String): Array[Byte] = {
    if (fileLen < 12)
      throw new PJException(s"Parquet file size is ${fileLen} bytes, smaller than the minimum file footer ('$pathForErrors')")
    val tail = readRange(fileLen - 8, 8)
    val magic = java.util.Arrays.copyOfRange(tail, 4, 8)
    if (java.util.Arrays.equals(magic, ParE))
      throw new PJException("Could not read encrypted metadata, no decryption found in reader's properties")
    if (!java.util.Arrays.equals(magic, Par1))
      throw new PJException(
        "Parquet magic bytes not found in footer. Either the file is corrupted or this is not a parquet file.")
    val flen = ByteBuffer.wrap(tail, 0, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    if (flen <= 0 || flen > fileLen - 8)
      throw new PJException(s"Parquet file has corrupt footer length $flen ('$pathForErrors')")
    readRange(fileLen - 8 - flen, flen)
  }

  def readLocalFooterBytes(parquetPath: String): Array[Byte] = {
    val f = new java.io.File(parquetPath)
    if (!f.isFile)
      throw new FileNotFoundException(s"Failed to open local file '$parquetPath'")
    val raf = new RandomAccessFile(f, "r")
    try {
      readFooterBytes((off, len) => {
        val b = new Array[Byte](len); raf.seek(off); raf.readFully(b); b
      }, raf.length(), parquetPath)
    } finally raf.close()
  }

  /** O1: build the PJ_2 index for a parquet footer (`palletjack.cc:207-358`). */
  def generateFromFooter(footer: Array[Byte], parquetPathForErrors: String): Array[Byte] = {
    val w = FooterWalker.walk(footer, 0, footer.length)
    if (w.encryptionAlgorithmSet)
      throw new PJException(s"Encrypted column metadata is not supported: '$parquetPathForErrors'.")

    // Counts as the reference derives them: row groups from the footer list,
    // columns = leaf count (flat schemas only survive validation below).
    val rowGroups = w.rowGroups.length
    // A leaf has no num_children (or 0); the root is element 0.
    val columns = w.elements.iterator.drop(1).count(e => e.numChildren <= 0)
    val metadataLength = w.metadataLength

    if (rowGroups == 0) throw new PJException("Number of row groups is not set!")
    if (columns == 0) throw new PJException("Number of columns is not set!")
    if (metadataLength == 0) throw new PJException("Metadata length is not set!")

    // Column names: schema elements 1..columns (`palletjack.cc:332-340`).
    val nameBytes = new Array[Array[Byte]](math.min(columns, w.elements.length - 1))
    var namesLength = 0
    var i = 0
    while (i < nameBytes.length) {
      val n = w.elements(i + 1).name
      nameBytes(i) = (if (n == null) "" else n).getBytes(StandardCharsets.UTF_8)
      namesLength += nameBytes(i).length + 1
      i += 1
    }

    val h = Header(rowGroups, columns, namesLength, metadataLength)

    // Validation mirroring `palletjack.cc:239-310` (messages verbatim).
    if (h.numRowsOffsetsSize != w.numRowsOffsets.length)
      throw new PJException(s"Number of rows offset information is invalid, ${h.numRowsOffsetsSize} != ${w.numRowsOffsets.length} !")
    if (rowGroups != w.rowGroups.length)
      throw new PJException(s"Row numbers information is invalid, $rowGroups != ${w.rowGroups.length} !")
    if (h.schemaOffsetsSize != w.schemaOffsets.length)
      throw new PJException(s"Schema offsets information is invalid, columns=$columns, schema_offsets=${w.schemaOffsets.length} !")
    val ncOffsets: Array[Array[Int]] = w.elements.map { e =>
      if (e.ncOffsets.length == 0) Array(0, 0)
      else if (e.ncOffsets.length == 2) e.ncOffsets
      else throw new PJException(s"Num children offsets information is invalid, num_children_offsets=${e.ncOffsets.length} !")
    }
    if (h.rowGroupsOffsetsSize != w.rowGroupsOffsets.length)
      throw new PJException(s"Row group offsets information is invalid, columns=$rowGroups, row_groups_offsets=${w.rowGroupsOffsets.length} !")
    val coOffsets =
      if (w.columnOrdersOffsets.length == 0) new Array[Int](h.columnOrdersOffsetsSize)
      else w.columnOrdersOffsets
    if (h.columnOrdersOffsetsSize != coOffsets.length)
      throw new PJException(s"Column orders offsets information is invalid, columns=$columns, column_orders_offsets=${coOffsets.length} !")
    for (rg <- w.rowGroups) {
      if (h.columnChunksOffsetsSize / rowGroups != rg.ccOffsets.length)
        throw new PJException(s"Column chunk offsets information is invalid, columns=$columns, column_chunks_offsets=${rg.ccOffsets.length} !")
    }

    val total = HeaderLength + h.bodySize
    if (total > Int.MaxValue)
      throw new PJException(s"Index too large: $total bytes")
    val out = ByteBuffer.allocate(total.toInt).order(ByteOrder.LITTLE_ENDIAN)
    out.put(Magic)
    out.putInt(rowGroups); out.putInt(columns); out.putInt(namesLength); out.putInt(metadataLength)
    w.numRowsOffsets.foreach(out.putInt)
    w.rowGroups.foreach(rg => out.putInt(rg.numRows.toInt)) // u32 row counts
    w.schemaOffsets.foreach(out.putInt)
    ncOffsets.foreach(a => { out.putInt(a(0)); out.putInt(a(1)) })
    w.rowGroupsOffsets.foreach(out.putInt)
    coOffsets.foreach(out.putInt)
    w.rowGroups.foreach(rg => rg.ccOffsets.foreach(out.putInt))
    nameBytes.foreach { nb => out.put(nb); out.put(0.toByte) }
    out.put(footer, 0, metadataLength)
    if (out.position() != total.toInt)
      throw new PJException(s"Error when writing the index file, expected size=$total, actual size=${out.position()} !")
    out.array()
  }

  /** Build the `PJ_3` NESTED-schema index: the PJ_2 section layout with
    * "column" meaning top-level field. See [[Magic3]]. The footer walker
    * already records every schema element and every leaf chunk; this
    * groups them by top-level subtree (depth-first contiguity) so the
    * splice can prune whole subtrees and their leaf chunk ranges while
    * rewriting only three list headers and the root's `num_children`.
    */
  def generateNestedFromFooter(footer: Array[Byte], parquetPathForErrors: String): Array[Byte] = {
    val w = FooterWalker.walk(footer, 0, footer.length)
    if (w.encryptionAlgorithmSet)
      throw new PJException(s"Encrypted column metadata is not supported: '$parquetPathForErrors'.")
    val rowGroups = w.rowGroups.length
    if (rowGroups == 0) throw new PJException("Number of row groups is not set!")
    val metadataLength = w.metadataLength
    if (metadataLength == 0) throw new PJException("Metadata length is not set!")
    val elements = w.elements
    if (elements.isEmpty || elements(0).numChildren <= 0)
      throw new PJException("Number of columns is not set!")

    // depth-first subtree measurement: for element i, the index after its
    // subtree and the leaf count inside it
    def measure(i: Int): (Int, Int) = {
      val k = elements(i).numChildren
      if (k <= 0) (i + 1, 1)
      else {
        var j = i + 1
        var leaves = 0
        var c = 0
        while (c < k) {
          val (nj, l) = measure(j)
          j = nj; leaves += l; c += 1
        }
        (j, leaves)
      }
    }
    val fields = elements(0).numChildren
    val fieldStart = new Array[Int](fields) // element index of each top-level field
    val fieldElems = new Array[Int](fields)
    val fieldLeaves = new Array[Int](fields)
    var cursor = 1
    var f = 0
    while (f < fields) {
      fieldStart(f) = cursor
      val (next, leaves) = measure(cursor)
      fieldElems(f) = next - cursor
      fieldLeaves(f) = leaves
      cursor = next
      f += 1
    }
    if (cursor != elements.length)
      throw new PJException(
        s"Schema offsets information is invalid, columns=$fields, schema_offsets=${w.schemaOffsets.length} !")
    val totalLeaves = fieldLeaves.sum

    // names = top-level field names
    val nameBytes = fieldStart.map { i =>
      val n = elements(i).name
      (if (n == null) "" else n).getBytes(StandardCharsets.UTF_8)
    }
    val namesLength = nameBytes.map(_.length + 1).sum

    val h = Header(rowGroups, fields, namesLength, metadataLength, nested = true)

    // schema offsets at SUBTREE boundaries: [listHeader, root, field starts..., end]
    // (w.schemaOffsets = [listHeader, el0, el1, ..., end])
    val schemaOffsets = new Array[Int](h.schemaOffsetsSize)
    schemaOffsets(0) = w.schemaOffsets(0)
    schemaOffsets(1) = w.schemaOffsets(1)
    f = 0
    while (f < fields) { schemaOffsets(2 + f) = w.schemaOffsets(1 + fieldStart(f)); f += 1 }
    schemaOffsets(2 + fields) = w.schemaOffsets(1 + elements.length)

    // num_children offsets: root first (the only one the splice rewrites),
    // then each field's top element (relative to that element's start)
    val ncOffsets = new Array[Int](h.schemaNumChildrenOffsetsSize)
    val rootNc = elements(0).ncOffsets
    if (rootNc.length == 2) { ncOffsets(0) = rootNc(0); ncOffsets(1) = rootNc(1) }
    f = 0
    while (f < fields) {
      val nc = elements(fieldStart(f)).ncOffsets
      if (nc.length == 2) { ncOffsets(2 * (f + 1)) = nc(0); ncOffsets(2 * (f + 1) + 1) = nc(1) }
      f += 1
    }

    // leaf-ordinal prefix starts per field
    val leafStart = new Array[Int](fields + 1)
    f = 0
    while (f < fields) { leafStart(f + 1) = leafStart(f) + fieldLeaves(f); f += 1 }

    // column-order offsets at leaf-range boundaries (zeros when absent)
    val coOffsets = new Array[Int](h.columnOrdersOffsetsSize)
    if (w.columnOrdersOffsets.nonEmpty) {
      if (w.columnOrdersOffsets.length != 1 + totalLeaves + 1)
        throw new PJException(
          s"Column orders offsets information is invalid, columns=$fields, column_orders_offsets=${w.columnOrdersOffsets.length} !")
      coOffsets(0) = w.columnOrdersOffsets(0)
      f = 0
      while (f <= fields) { coOffsets(1 + f) = w.columnOrdersOffsets(1 + leafStart(f)); f += 1 }
    }

    // per-row-group chunk offsets at leaf-range boundaries
    for (rg <- w.rowGroups)
      if (rg.ccOffsets.length != 1 + totalLeaves + 1)
        throw new PJException(
          s"Column chunk offsets information is invalid, columns=$fields, column_chunks_offsets=${rg.ccOffsets.length} !")

    val total = HeaderLength + h.bodySize
    if (total > Int.MaxValue)
      throw new PJException(s"Index too large: $total bytes")
    val out = ByteBuffer.allocate(total.toInt).order(ByteOrder.LITTLE_ENDIAN)
    out.put(Magic3)
    out.putInt(rowGroups); out.putInt(fields); out.putInt(namesLength); out.putInt(metadataLength)
    w.numRowsOffsets.foreach(out.putInt)
    w.rowGroups.foreach(rg => out.putInt(rg.numRows.toInt))
    schemaOffsets.foreach(out.putInt)
    ncOffsets.foreach(out.putInt)
    w.rowGroupsOffsets.foreach(out.putInt)
    coOffsets.foreach(out.putInt)
    w.rowGroups.foreach { rg =>
      out.putInt(rg.ccOffsets(0))
      var g = 0
      while (g <= fields) { out.putInt(rg.ccOffsets(1 + leafStart(g))); g += 1 }
    }
    fieldElems.foreach(out.putInt)
    fieldLeaves.foreach(out.putInt)
    nameBytes.foreach { nb => out.put(nb); out.put(0.toByte) }
    out.put(footer, 0, metadataLength)
    if (out.position() != total.toInt)
      throw new PJException(s"Error when writing the index file, expected size=$total, actual size=${out.position()} !")
    out.array()
  }

  /** Does this footer describe a NESTED schema — any group element below
    * the root? The PJ_2 format indexes FLAT schemas only (the reference
    * restricts pruning to top-level leaves, `palletjack.cc:266-279,483-487`
    * — its schema-offset validation rejects nested footers), so callers use
    * this to route nested files to the [[generateNestedFromFooter]] PJ_3
    * extension instead of surfacing the index-validation error.
    */
  def footerHasNestedSchema(footer: Array[Byte]): Boolean =
    try FooterWalker.walk(footer, 0, footer.length)
      .elements.iterator.drop(1).exists(_.numChildren > 0)
    catch { case _: PJException => false } // unwalkable != nested

  /** O1 from a local parquet path. */
  def generate(parquetPath: String): Array[Byte] =
    generateFromFooter(readLocalFooterBytes(parquetPath), parquetPath)

  /** O2: build and write the sidecar (`palletjack.cc:360-367`). */
  def generate(parquetPath: String, indexFilePath: String): Unit = {
    val bytes = generate(parquetPath)
    java.nio.file.Files.write(java.nio.file.Paths.get(indexFilePath), bytes)
    ()
  }
}
