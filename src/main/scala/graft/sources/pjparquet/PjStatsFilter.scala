package graft.sources.pjparquet

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}

import graft.core.PJSplice

/** Conservative data-column file pruning from the PJ_2 index's per-chunk
  * statistics (`min_value`/`max_value`/`null_count`, the same stats the
  * reference preserves verbatim in the spliced footer bytes): a file is
  * prunable when NO row group's stats interval can satisfy the pushed
  * predicate. `true` always means "keep" — unknown stats, unsupported
  * types/operators, or a missing column all keep the file, and every pushed
  * filter is re-evaluated above the scan, so pruning can only skip tasks,
  * never rows.
  *
  * This is the planning-time complement of the reader's row-group-level
  * `FilterPredicate` skipping: at 100 TB a `WHERE day_key = 20260813` over
  * a date-clustered table should plan zero tasks for non-matching files,
  * not launch a task per file to discover emptiness — and for copy-on-write
  * row-level DML (DELETE/UPDATE/MERGE) it bounds the rewrite set to the
  * files whose stats admit a match.
  *
  * Supported: Spark Integer/Long over parquet INT32/INT64 (signed order is
  * type-defined — logical re-mappings like date/decimal surface as other
  * Spark types and fall through to "keep"), and String over BYTE_ARRAY
  * (UTF-8 unsigned-lexicographic, the parquet v2 binary sort order; a
  * truncated bound is still a valid bound, so range checks stay sound).
  */
private[pjparquet] object PjStatsFilter {

  /** File-level verdict: keep `f` iff `filter` might match some row of some
    * selected row group. `fileSchema` resolves attribute case; partition
    * columns are not data columns and always keep (they are handled by
    * [[PjPartitionFilter]]).
    */
  def mightMatch(
      idx: PJSplice.Index,
      fileSchema: StructType,
      partitionNames: Set[String],
      caseSensitive: Boolean,
      filter: Filter): Boolean = {
    def fold(n: String): String = if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
    val partFolded = partitionNames.map(fold)

    // resolve a filter attribute to (index column ordinal, Spark type);
    // None = not a prunable data column (partition col, missing, nested)
    def resolve(attr: String): Option[(Int, org.apache.spark.sql.types.DataType)] = {
      if (partFolded.contains(fold(attr)) || attr.contains(".")) return None
      val field = fileSchema.fields.find(f => fold(f.name) == fold(attr)).getOrElse(return None)
      val ord = idx.columnNames.lastIndexOf(field.name) // last-wins, like splice O5
      if (ord < 0) None else Some((ord, field.dataType))
    }

    def leLong(b: Array[Byte], width: Int): Option[Long] =
      if (b != null && b.length == width) {
        val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        Some(if (width == 4) bb.getInt.toLong else bb.getLong)
      } else None

    def utf8(v: Any): Option[Array[Byte]] = v match {
      case s: String => Some(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case u: org.apache.spark.unsafe.types.UTF8String => Some(u.getBytes)
      case _ => None
    }

    /** Unsigned-lexicographic compare (parquet BYTE_ARRAY v2 sort order). */
    def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }

    def numValue(v: Any): Option[Long] = v match {
      case n: Number => Some(n.longValue())
      case _ => None
    }

    /** Per-row-group verdict for one (attr, op) leaf; None = unknown → the
      * row group might match. `rel` receives (cmp(min, v), cmp(max, v)).
      */
    def rgLeaf(rg: Int, attr: String)(
        rel: (PJSplice.ChunkStats, Long) => Option[Boolean],
        relBytes: (Array[Byte], Array[Byte], Array[Byte]) => Option[Boolean],
        v: Any): Option[Boolean] = {
      val (ord, dt) = resolve(attr).getOrElse(return None)
      if (v == null) return Some(false) // comparison to NULL matches no row
      val st =
        try idx.chunkStats(rg, ord)
        catch { case scala.util.control.NonFatal(_) => return None }
      dt match {
        case IntegerType if st.physType == 1 =>
          numValue(v).flatMap(rel(st, _)) // rel widens via leLong(width=4)
        case LongType if st.physType == 2 =>
          numValue(v).flatMap(rel(st, _))
        case StringType if st.physType == 6 =>
          utf8(v).flatMap(relBytes(st.min, st.max, _))
        case _ => None
      }
    }

    /** Might any row of row group `rg` satisfy `filter`? None = unknown. */
    def rgMight(rg: Int, fl: Filter): Option[Boolean] = fl match {
      case AlwaysTrue() => Some(true)
      case AlwaysFalse() => Some(false)
      case EqualTo(a, v) =>
        rgLeaf(rg, a)(
          (st, x) => {
            val w = if (st.physType == 1) 4 else 8
            for (mn <- leLong(st.min, w); mx <- leLong(st.max, w)) yield mn <= x && x <= mx
          },
          (mn, mx, x) =>
            if (mn == null || mx == null) None
            else Some(cmpBytes(mn, x) <= 0 && cmpBytes(mx, x) >= 0),
          v)
      case GreaterThan(a, v) =>
        rgLeaf(rg, a)(
          (st, x) => leLong(st.max, if (st.physType == 1) 4 else 8).map(_ > x),
          (_, mx, x) => if (mx == null) None else Some(cmpBytes(mx, x) > 0),
          v)
      case GreaterThanOrEqual(a, v) =>
        rgLeaf(rg, a)(
          (st, x) => leLong(st.max, if (st.physType == 1) 4 else 8).map(_ >= x),
          (_, mx, x) => if (mx == null) None else Some(cmpBytes(mx, x) >= 0),
          v)
      case LessThan(a, v) =>
        rgLeaf(rg, a)(
          (st, x) => leLong(st.min, if (st.physType == 1) 4 else 8).map(_ < x),
          (mn, _, x) => if (mn == null) None else Some(cmpBytes(mn, x) < 0),
          v)
      case LessThanOrEqual(a, v) =>
        rgLeaf(rg, a)(
          (st, x) => leLong(st.min, if (st.physType == 1) 4 else 8).map(_ <= x),
          (mn, _, x) => if (mn == null) None else Some(cmpBytes(mn, x) <= 0),
          v)
      case In(a, vs) =>
        if (vs == null || vs.isEmpty) Some(false)
        else {
          val each = vs.toSeq.map(v => rgMight(rg, EqualTo(a, v)))
          if (each.exists(_.contains(true))) Some(true)
          else if (each.forall(_.contains(false))) Some(false)
          else None
        }
      case IsNull(a) =>
        resolve(a).flatMap { case (ord, _) =>
          try {
            val st = idx.chunkStats(rg, ord)
            Some(st.nullCount != 0) // unknown (-1) keeps; 0 = provably no nulls
          } catch { case scala.util.control.NonFatal(_) => None }
        }
      case IsNotNull(a) =>
        resolve(a).flatMap { case (ord, _) =>
          try {
            val st = idx.chunkStats(rg, ord)
            Some(st.nullCount < 0 || st.nullCount < idx.rowNumber(rg))
          } catch { case scala.util.control.NonFatal(_) => None }
        }
      case StringStartsWith(a, prefix) if prefix != null =>
        // rows with prefix p live in [p, p+∞): max >= p and min < p·(0xff…)
        rgLeaf(rg, a)(
          (_, _) => None,
          (mn, mx, p) =>
            if (mn == null || mx == null) None
            else {
              val mnCut = if (mn.length <= p.length) mn else java.util.Arrays.copyOf(mn, p.length)
              Some(cmpBytes(mx, p) >= 0 && cmpBytes(mnCut, p) <= 0)
            },
          prefix)
      case And(l, r) =>
        (rgMight(rg, l), rgMight(rg, r)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true)) => Some(true)
          case _ => None
        }
      case Or(l, r) =>
        (rgMight(rg, l), rgMight(rg, r)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false)) => Some(false)
          case _ => None
        }
      case _ => None // Not, EqualNullSafe, unsupported shapes: unknown
    }

    val rgCount = idx.header.rowGroups
    var rg = 0
    while (rg < rgCount) {
      if (rgMight(rg, filter).getOrElse(true)) return true
      rg += 1
    }
    rgCount == 0 // zero-row-group files keep (nothing to prune anyway)
  }
}
