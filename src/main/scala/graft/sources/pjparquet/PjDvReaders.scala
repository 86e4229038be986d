package graft.sources.pjparquet

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.vectorized.{ColumnarArray, ColumnarBatch, ColumnarMap, ColumnVector}

/** Position-aware read path: generates the `_pos` metadata column and
  * applies [[PjDeletionVector]]s WITHOUT leaving the columnar lane.
  *
  * Deleted rows are filtered by wrapping each batch column in a
  * selection-indirection vector ([[PjSelectedVector]]): survivors' batch
  * ordinals map through `sel` to the underlying vector, so no data is
  * copied, whole-stage codegen still consumes a [[ColumnarBatch]], and
  * batches that contain no deleted positions (the overwhelmingly common
  * case — vectors are sparse by construction) pass through untouched.
  */
final class PjSelectedVector(base: ColumnVector, sel: Array[Int])
    extends ColumnVector(base.dataType) {
  // the inner reader owns (and recycles) the underlying vectors
  override def close(): Unit = ()
  override def hasNull: Boolean = base.hasNull
  override def numNulls: Int = {
    if (!base.hasNull) 0
    else {
      var n = 0; var i = 0
      while (i < sel.length) { if (base.isNullAt(sel(i))) n += 1; i += 1 }
      n
    }
  }
  override def isNullAt(i: Int): Boolean = base.isNullAt(sel(i))
  override def getBoolean(i: Int): Boolean = base.getBoolean(sel(i))
  override def getByte(i: Int): Byte = base.getByte(sel(i))
  override def getShort(i: Int): Short = base.getShort(sel(i))
  override def getInt(i: Int): Int = base.getInt(sel(i))
  override def getLong(i: Int): Long = base.getLong(sel(i))
  override def getFloat(i: Int): Float = base.getFloat(sel(i))
  override def getDouble(i: Int): Double = base.getDouble(sel(i))
  // array/map contents live in the base child data and need no remap —
  // only the per-row offsets do, which the base lookup already applies
  override def getArray(i: Int): ColumnarArray = base.getArray(sel(i))
  override def getMap(i: Int): ColumnarMap = base.getMap(sel(i))
  override def getDecimal(i: Int, p: Int, s: Int) = base.getDecimal(sel(i), p, s)
  override def getUTF8String(i: Int) = base.getUTF8String(sel(i))
  override def getBinary(i: Int): Array[Byte] = base.getBinary(sel(i))
  override def getInterval(i: Int) = base.getInterval(sel(i))
  // struct children ARE per-row aligned with the parent — remap them too
  // (getStruct is final in ColumnVector and reads through getChild)
  private lazy val children =
    new java.util.concurrent.ConcurrentHashMap[Integer, PjSelectedVector]()
  override def getChild(j: Int): ColumnVector =
    children.computeIfAbsent(j, _ => new PjSelectedVector(base.getChild(j), sel))
}

/** The generated `_pos` column: one long per surviving batch row. */
final class PjPositionVector(positions: Array[Long]) extends ColumnVector(LongType) {
  override def close(): Unit = ()
  override def hasNull: Boolean = false
  override def numNulls: Int = 0
  override def isNullAt(i: Int): Boolean = false
  override def getLong(i: Int): Long = positions(i)
  private def nope: Nothing =
    throw new UnsupportedOperationException("_pos is a LONG column")
  override def getBoolean(i: Int): Boolean = nope
  override def getByte(i: Int): Byte = nope
  override def getShort(i: Int): Short = nope
  override def getInt(i: Int): Int = nope
  override def getFloat(i: Int): Float = nope
  override def getDouble(i: Int): Double = nope
  override def getArray(i: Int): ColumnarArray = nope
  override def getMap(i: Int): ColumnarMap = nope
  override def getDecimal(i: Int, p: Int, s: Int) = nope
  override def getUTF8String(i: Int) = nope
  override def getBinary(i: Int): Array[Byte] = nope
  override def getChild(j: Int): ColumnVector = nope
}

/** Tracks the file-absolute position of each batch row as the inner reader
  * streams a split's row groups, filters deletion-vector positions, and
  * overwrites the `_pos` placeholder column (when requested) with real
  * positions. Shared by the columnar and row paths.
  *
  * `rgStartRows(i)` / `rgRows(i)` describe the split's i-th row group
  * (absolute start position; physical row count). The vectorized reader
  * never yields a batch spanning two row groups (it reads up to the end
  * of the current group), which `advance` asserts.
  */
private final class PositionCursor(rgStartRows: Array[Long], rgRows: Array[Long]) {
  private var rg = 0
  private var rowInRg = 0L
  /** Absolute position of the first row of an `n`-row batch; advances. */
  def advance(n: Int): Long = {
    while (rg < rgRows.length && rowInRg >= rgRows(rg)) { rg += 1; rowInRg = 0L }
    require(rg < rgRows.length && rowInRg + n <= rgRows(rg),
      s"pjparquet: batch of $n rows does not fit the split's row-group layout")
    val start = rgStartRows(rg) + rowInRg
    rowInRg += n
    start
  }
}

/** `_row_id` column with COALESCE semantics: the materialized id when
  * the hidden source column has one, else `baseRowId + position` (fresh
  * rows of an id-carrying rewrite, legacy backfill), else null.
  */
final class PjRowIdVector(src: ColumnVector, positions: Array[Long], base: Long)
    extends ColumnVector(LongType) {
  override def close(): Unit = ()
  private def fromSrc(i: Int): Boolean = src != null && !src.isNullAt(i)
  override def hasNull: Boolean = base < 0
  override def numNulls: Int = if (base >= 0) 0 else -1
  override def isNullAt(i: Int): Boolean = !fromSrc(i) && base < 0
  override def getLong(i: Int): Long =
    if (fromSrc(i)) src.getLong(i) else base + positions(i)
  private def nope: Nothing =
    throw new UnsupportedOperationException("_row_id is a LONG column")
  override def getBoolean(i: Int): Boolean = nope
  override def getByte(i: Int): Byte = nope
  override def getShort(i: Int): Short = nope
  override def getInt(i: Int): Int = nope
  override def getFloat(i: Int): Float = nope
  override def getDouble(i: Int): Double = nope
  override def getArray(i: Int): ColumnarArray = nope
  override def getMap(i: Int): ColumnarMap = nope
  override def getDecimal(i: Int, p: Int, s: Int) = nope
  override def getUTF8String(i: Int) = nope
  override def getBinary(i: Int): Array[Byte] = nope
  override def getChild(j: Int): ColumnVector = nope
}

/** All-null LONG column (the `_row_id` of untracked rows). */
final class PjNullLongVector extends ColumnVector(LongType) {
  override def close(): Unit = ()
  override def hasNull: Boolean = true
  override def numNulls: Int = -1
  override def isNullAt(i: Int): Boolean = true
  override def getLong(i: Int): Long = 0L
  private def nope: Nothing =
    throw new UnsupportedOperationException("null LONG column")
  override def getBoolean(i: Int): Boolean = nope
  override def getByte(i: Int): Byte = nope
  override def getShort(i: Int): Short = nope
  override def getInt(i: Int): Int = nope
  override def getFloat(i: Int): Float = nope
  override def getDouble(i: Int): Double = nope
  override def getArray(i: Int): ColumnarArray = nope
  override def getMap(i: Int): ColumnarMap = nope
  override def getDecimal(i: Int, p: Int, s: Int) = nope
  override def getUTF8String(i: Int) = nope
  override def getBinary(i: Int): Array[Byte] = nope
  override def getChild(j: Int): ColumnVector = nope
}

object PjPositionAwareReader {
  /** Physical row counts of the split's row groups, aligned with the
    * materialized (already split-filtered) footer's block order.
    */
  def rgRowsOf(footer: org.apache.parquet.hadoop.metadata.ParquetMetadata): Array[Long] = {
    val blocks = footer.getBlocks
    Array.tabulate(blocks.size())(i => blocks.get(i).getRowCount)
  }
}

/** Columnar wrapper. `dv` empty = position generation only. */
final class PjPositionAwareColumnarReader(
    inner: VectorizedParquetRecordReader,
    rgStartRows: Array[Long],
    rgRows: Array[Long],
    dv: Array[Long],
    posOrdinal: Int,
    /** `_row_id` slot ordinal in the INNER batch (−1 = not requested). */
    rowIdOrdinal: Int = -1,
    /** Inner ordinal of the hidden materialized `_pj_row_id` data column
      * (valid whenever rowIdOrdinal >= 0) — always DROPPED from the
      * emitted batch; aliased into the slot when `rowIdFromColumn`.
      */
    hiddenOrdinal: Int = -1,
    baseRowId: Long = -1L,
    rowIdFromColumn: Boolean = false)
    extends PartitionReader[ColumnarBatch] {

  private val cursor = new PositionCursor(rgStartRows, rgRows)
  private var out: ColumnarBatch = _

  /** Output batch: inner columns with `_pos`/`_row_id` slots substituted
    * and the hidden id column removed. `sel == null` = whole batch kept.
    */
  private def emit(b: ColumnarBatch, start: Long, sel: Array[Int]): ColumnarBatch = {
    val n = if (sel == null) b.numRows() else sel.length
    if (posOrdinal < 0 && rowIdOrdinal < 0 && sel == null) return b
    def positions(): Array[Long] =
      if (sel == null) Array.tabulate(n)(i => start + i)
      else Array.tabulate(n)(j => start + sel(j))
    def slotVector(c: Int): ColumnVector =
      if (c == posOrdinal) new PjPositionVector(positions())
      else if (c == rowIdOrdinal) {
        // COALESCE semantics: materialized id wins, else base + position
        // (fresh rows of an id-carrying rewrite, legacy backfill), else
        // null (fully untracked file)
        val src0 = b.column(hiddenOrdinal)
        val src = if (sel == null) src0 else new PjSelectedVector(src0, sel)
        if (!rowIdFromColumn && baseRowId < 0) new PjNullLongVector
        else new PjRowIdVector(if (rowIdFromColumn) src else null, positions(), baseRowId)
      } else if (sel == null) b.column(c)
      else new PjSelectedVector(b.column(c), sel)
    val keep = (0 until b.numCols()).filter(c => rowIdOrdinal < 0 || c != hiddenOrdinal)
    new ColumnarBatch(keep.map(slotVector).toArray, n)
  }

  override def next(): Boolean = {
    while (inner.nextKeyValue()) {
      val b = inner.getCurrentValue.asInstanceOf[ColumnarBatch]
      val n = b.numRows()
      if (n == 0) { out = emit(b, 0L, null); return true }
      val start = cursor.advance(n)
      val deletedHere =
        if (dv.isEmpty) 0 else PjDeletionVector.countInRange(dv, start, start + n)
      if (deletedHere == 0) {
        out = emit(b, start, null)
        return true
      }
      if (deletedHere < n) {
        // selection indirection over the survivors — no data copied
        val sel = new Array[Int](n - deletedHere)
        var i = 0; var k = 0
        var d = PjDeletionVector.lowerBound(dv, start)
        while (i < n) {
          if (d < dv.length && dv(d) == start + i) d += 1
          else { sel(k) = i; k += 1 }
          i += 1
        }
        out = emit(b, start, sel)
        return true
      }
      // whole batch deleted: keep scanning
    }
    false
  }

  override def get(): ColumnarBatch = out
  override def close(): Unit = inner.close()
}

/** Row wrapper (non-columnar consumers): same position tracking, per-row
  * deletion skip, `_pos` override via row copy (only when requested).
  */
final class PjPositionAwareRowReader(
    inner: VectorizedParquetRecordReader,
    rgStartRows: Array[Long],
    rgRows: Array[Long],
    dv: Array[Long],
    posOrdinal: Int,
    rowIdOrdinal: Int = -1,
    hiddenOrdinal: Int = -1,
    baseRowId: Long = -1L,
    rowIdFromColumn: Boolean = false,
    /** Inner-row field types (needed to rebuild rows dropping the hidden
      * id column); only consulted when rowIdOrdinal >= 0.
      */
    fieldTypes: Array[DataType] = Array.empty)
    extends PartitionReader[InternalRow] {

  private val cursor = new PositionCursor(rgStartRows, rgRows)
  private var pos = -1L
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (inner.nextKeyValue()) {
      pos = cursor.advance(1)
      if (dv.isEmpty || !PjDeletionVector.contains(dv, pos)) {
        val r = inner.getCurrentValue.asInstanceOf[InternalRow]
        current =
          if (rowIdOrdinal >= 0) {
            // rebuild without the hidden id column, filling both slots
            val rowId: Any =
              if (rowIdFromColumn && !r.isNullAt(hiddenOrdinal)) r.getLong(hiddenOrdinal)
              else if (baseRowId >= 0) baseRowId + pos
              else null
            val out = new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(r.numFields - 1)
            var i = 0; var j = 0
            while (i < r.numFields) {
              if (i != hiddenOrdinal) {
                val v: Any =
                  if (i == posOrdinal) pos
                  else if (i == rowIdOrdinal) rowId
                  else if (r.isNullAt(i)) null
                  else r.get(i, fieldTypes(i))
                out.update(j, v)
                j += 1
              }
              i += 1
            }
            out
          } else if (posOrdinal < 0) r
          else { val c = r.copy(); c.setLong(posOrdinal, pos); c }
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = inner.close()
}
