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
  * Two stat sources share one evaluator:
  *  - the INDEX view — one interval per row group (the exact historical
  *    behavior), and
  *  - a commit-log [[PjCommitLog.FileEntry]]'s whole-file envelope
  *    ([[mightMatchEntry]]) — evaluated BEFORE the index is ever loaded,
  *    so a logged scan prunes most files with zero sidecar reads. The
  *    envelope (min of mins / max of maxes) can only be wider than any
  *    row group's interval, so an envelope "no match" implies the per-rg
  *    verdict — log pruning is sound and never keeps less than the index
  *    would.
  *
  * Supported: Spark Integer/Long over parquet INT32/INT64 (signed order is
  * type-defined — logical re-mappings like date/decimal surface as other
  * Spark types and fall through to "keep"), and String over BYTE_ARRAY
  * (UTF-8 unsigned-lexicographic, the parquet v2 binary sort order; a
  * truncated bound is still a valid bound, so range checks stay sound).
  */
private[pjparquet] object PjStatsFilter {

  /** Abstracts "intervals to test": row groups of an index, or the single
    * whole-file envelope of a log entry.
    */
  private trait StatsSource {
    def rangeCount: Int
    /** Stats for `column` in range `r`; None = unknown (keep). */
    def statsFor(r: Int, column: String): Option[PJSplice.ChunkStats]
    /** Row count of range `r`; -1 = unknown. */
    def rowsIn(r: Int): Long
  }

  private final class IndexSource(idx: PJSplice.Index) extends StatsSource {
    private val names = idx.columnNames
    def rangeCount: Int = idx.header.rowGroups
    def statsFor(r: Int, column: String): Option[PJSplice.ChunkStats] = {
      val ord = names.lastIndexOf(column) // last-wins, like splice O5
      if (ord >= 0)
        try Some(idx.chunkStats(r, ord))
        catch { case scala.util.control.NonFatal(_) => None }
      else if (column.indexOf('.') > 0 && idx.header.nested) {
        // nested leaf "payload.score": resolve the TOP-level field as the
        // longest column name that prefixes the dotted path (top-level
        // names may themselves contain dots), then find the leaf's own
        // chunk stats by its full path_in_schema
        var best = -1
        var bestLen = -1
        var i = 0
        while (i < names.length) {
          val n = names(i)
          if (n.length > bestLen && column.length > n.length &&
            column.startsWith(n) && column.charAt(n.length) == '.') {
            best = i; bestLen = n.length
          }
          i += 1
        }
        if (best < 0) None
        else
          try idx.leafChunkStats(r, best).collectFirst {
            case (p, st) if p == column => st
          }
          catch { case scala.util.control.NonFatal(_) => None }
      } else None
    }
    def rowsIn(r: Int): Long = idx.rowNumber(r)
  }

  private final class EntrySource(e: PjCommitLog.FileEntry) extends StatsSource {
    def rangeCount: Int = 1
    def statsFor(r: Int, column: String): Option[PJSplice.ChunkStats] =
      e.stats.get(column).map(cs =>
        PJSplice.ChunkStats(cs.physType, cs.nullCount,
          cs.min.orNull, cs.max.orNull))
    def rowsIn(r: Int): Long = e.rows
  }

  /** File-level verdict from the index: keep `f` iff `filter` might match
    * some row of some row group.
    */
  def mightMatch(
      idx: PJSplice.Index,
      fileSchema: StructType,
      partitionNames: Set[String],
      caseSensitive: Boolean,
      filter: Filter): Boolean =
    evaluate(new IndexSource(idx), fileSchema, partitionNames, caseSensitive, filter)

  /** File-level verdict from a commit-log entry's stats envelope — zero
    * file I/O. A `false` here is final (the envelope bounds every row
    * group); a `true` still gets the index-level pass once the index is
    * loaded for other reasons.
    */
  def mightMatchEntry(
      entry: PjCommitLog.FileEntry,
      fileSchema: StructType,
      partitionNames: Set[String],
      caseSensitive: Boolean,
      filter: Filter): Boolean =
    entry.stats.isEmpty ||
      evaluate(new EntrySource(entry), fileSchema, partitionNames, caseSensitive, filter)

  private def evaluate(
      src: StatsSource,
      fileSchema: StructType,
      partitionNames: Set[String],
      caseSensitive: Boolean,
      filter: Filter): Boolean = {
    def fold(n: String): String = if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
    val partFolded = partitionNames.map(fold)

    // resolve a filter attribute to the file column name + Spark type;
    // None = not a prunable data column (partition col, missing). Dotted
    // attributes first try an exact top-level match (a column literally
    // named "a.b"), then descend struct fields segment by segment — the
    // returned key is the FILE-cased dotted path, matching both the
    // envelope's path_in_schema keys and the index's leaf walk.
    def resolve(attr: String): Option[(String, org.apache.spark.sql.types.DataType)] = {
      if (partFolded.contains(fold(attr))) return None
      fileSchema.fields.find(f => fold(f.name) == fold(attr)) match {
        case Some(f) => Some((f.name, f.dataType))
        case None if attr.indexOf('.') > 0 =>
          val segs = attr.split("\\.")
          var fields = fileSchema.fields
          val sb = new java.lang.StringBuilder()
          var dt: org.apache.spark.sql.types.DataType = null
          var i = 0
          while (i < segs.length) {
            fields.find(f => fold(f.name) == fold(segs(i))) match {
              case Some(f) =>
                if (sb.length > 0) sb.append('.')
                sb.append(f.name)
                dt = f.dataType
                fields = f.dataType match {
                  case st: StructType => st.fields
                  case _ => Array.empty // a mid-path leaf fails the next find
                }
              case None => return None
            }
            i += 1
          }
          Some((sb.toString, dt))
        case None => None
      }
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

    /** Per-range verdict for one (attr, op) leaf; None = unknown → the
      * range might match.
      */
    def rgLeaf(rg: Int, attr: String)(
        rel: (PJSplice.ChunkStats, Long) => Option[Boolean],
        relBytes: (Array[Byte], Array[Byte], Array[Byte]) => Option[Boolean],
        v: Any): Option[Boolean] = {
      val (name, dt) = resolve(attr).getOrElse(return None)
      if (v == null) return Some(false) // comparison to NULL matches no row
      val st = src.statsFor(rg, name).getOrElse(return None)
      dt match {
        case IntegerType if st.physType == 1 =>
          numValue(v).flatMap(rel(st, _)) // rel widens via leLong(width=4)
        case LongType if st.physType == 2 =>
          numValue(v).flatMap(rel(st, _))
        // NOTE: LongType over physType==1 stays "unknown" (keep) — it can
        // be a type-WIDENED signed int32 (where a signed width-4 compare
        // would be sound) but also a UINT32 logical column (where it would
        // wrongly prune: raw bits 0xFFFFFFFF is unsigned 2^32-1, not -1),
        // and the stats carry no logical-type bit to tell them apart
        case StringType if st.physType == 6 =>
          utf8(v).flatMap(relBytes(st.min, st.max, _))
        case _ => None
      }
    }

    /** Might any row of range `rg` satisfy `filter`? None = unknown. */
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
        resolve(a).flatMap { case (name, _) =>
          src.statsFor(rg, name).map(st =>
            st.nullCount != 0) // unknown (-1) keeps; 0 = provably no nulls
        }
      case IsNotNull(a) =>
        resolve(a).flatMap { case (name, _) =>
          src.statsFor(rg, name).flatMap { st =>
            if (st.nullCount < 0) Some(true)
            else {
              val rows = src.rowsIn(rg)
              if (rows < 0) None else Some(st.nullCount < rows)
            }
          }
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

    val n = src.rangeCount
    var rg = 0
    while (rg < n) {
      if (rgMight(rg, filter).getOrElse(true)) return true
      rg += 1
    }
    n == 0 // zero-row-group files keep (nothing to prune anyway)
  }
}
