package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-dimensional clustering for write layouts.
  *
  * A single-column sort gives parquet row-group stats perfect pruning on
  * that column and none on any other: every row group spans the full range
  * of the unsorted dimensions, so a filter on them prunes zero row groups.
  * Sorting by the interleaved-bit Morton value instead makes each row
  * group cover a small hyper-rectangle of the key space, so min/max stats
  * prune scans filtered on ANY of the participating columns — the standard
  * multi-dimensional layout lever at 100 TB, where a scan's cost is the
  * row groups it cannot skip (pjparquet's index-planned scans consult
  * exactly these stats driver-side, see `PjScan`).
  *
  * Everything here is pure integer `Column` arithmetic (shifts, masks,
  * exact scaling) — fully codegen'd, no UDFs, engine-reproducible to the
  * bit, so a DuckDB oracle can recompute values exactly.
  */
object ZOrder {

  /** Bit spread for 2-D interleaving: the low 32 bits of `c` move to the
    * even bit positions of a long (bit i → bit 2i) via the classic
    * magic-mask doubling steps.
    */
  def spreadBits(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val x4 = x3.bitwiseOR(shiftleft(x3, 2)).bitwiseAND(lit(0x3333333333333333L))
    x4.bitwiseOR(shiftleft(x4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Affine map of an integral column into `[0, 2^bits)` given inclusive
    * bounds: `((v − min) · (2^bits − 1)) div (max − min)`, exact for
    * `(max − min) · (2^bits − 1) < 2^53` (any real key range at the
    * default 16 bits). Bounds may be plan columns (an agg's min/max) or
    * literals; a degenerate range maps everything to 0.
    */
  def scaleToBits(c: Column, minC: Column, maxC: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 32, s"bits must be in [1,32], got $bits")
    val span = maxC.cast("long") - minC.cast("long")
    val mul = (1L << bits) - 1
    when(span === 0L, lit(0L)).otherwise(
      floor(((c.cast("long") - minC.cast("long")) * mul).cast("double") /
        span.cast("double")).cast("long"))
  }

  /** 2-D Morton value: `a`'s scaled bits on even positions, `b`'s on odd.
    * `a` and `b` must already be scaled to `[0, 2^32)` (use
    * [[scaleToBits]]).
    */
  def interleave2(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** N-D Morton value, statically unrolled (`bits` per dimension,
    * `dims · bits ≤ 63`): dimension `i` contributes its bit `j` at output
    * position `j·dims + i`. The shifts are plan-time constants, so the
    * whole value is one codegen'd bitwise expression tree. The 2-D case
    * should use [[interleave2]] — same value, magic-mask form.
    */
  def interleaveN(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "interleaveN needs at least one column")
    require(cols.size * bits <= 63, s"dims*bits must fit a long, got ${cols.size}*$bits")
    val dims = cols.size
    cols.zipWithIndex.map { case (c, i) =>
      (0 until bits).map { j =>
        shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)), j * dims + i)
      }.reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
  }

  /** Z-order layout: range-repartition and sort the frame by the Morton
    * value of `cols`, ready to write. Column bounds come from `ranges`
    * when supplied (table stats / catalog metadata — keeps the plan fully
    * lazy, the production path); otherwise a single bounded min/max agg
    * probes them (2 scalars per column, the only driver-side action).
    *
    * The range partitioner puts contiguous Morton intervals in the same
    * output file and the sort clusters each file's row groups, so
    * downstream scans filtered on any participating column skip most row
    * groups (`ZOrderSpec` proves the pruning against real row-group stats).
    */
  def zorderBy(
      df: DataFrame,
      cols: Seq[String],
      numPartitions: Int,
      bits: Int = 16,
      ranges: Map[String, (Long, Long)] = Map.empty): DataFrame =
    zorderByWithPrefix(df, Nil, cols, numPartitions, bits, ranges)

  /** [[zorderBy]] with leading grouping columns in the range key (e.g.
    * Hive partition columns during an OPTIMIZE rewrite): rows cluster by
    * `prefixCols` first, then by Morton value WITHIN each prefix group,
    * so each group's output is a run of contiguous Morton intervals and
    * at most one boundary task spans two groups.
    */
  def zorderByWithPrefix(
      df: DataFrame,
      prefixCols: Seq[String],
      cols: Seq[String],
      numPartitions: Int,
      bits: Int = 16,
      ranges: Map[String, (Long, Long)] = Map.empty,
      /** `zorder` (Morton, pure bit-interleave Column arithmetic) or
        * `hilbert` ([[graft.functions.HilbertCurve]], codegen'd): same
        * scaling and layout machinery, different space-filling curve.
        * Hilbert's unit-step property gives tighter row-group
        * hyper-rectangles (no Morton diagonal jumps) — Delta's default
        * clustering curve.
        */
      curve: String = "zorder"): DataFrame = {
    require(cols.size >= 2, s"z-ordering needs >= 2 columns, got $cols")
    require(curve == "zorder" || curve == "hilbert",
      s"unknown clustering curve '$curve' (zorder | hilbert)")
    val bounds: Seq[(Long, Long)] =
      if (cols.forall(ranges.contains)) cols.map(ranges)
      else {
        val row = df.agg(
          min(col(cols.head)).cast("long"),
          (max(col(cols.head)).cast("long") +:
            cols.tail.flatMap(c =>
              Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))): _*).head()
        // min/max are null on an empty frame (all of them) or an all-null
        // column (that pair): getLong would NPE with no hint of why.
        val nullSlots = (0 until 2 * cols.size).filter(row.isNullAt)
        if (nullSlots.size == 2 * cols.size) return df // empty: nothing to cluster
        require(nullSlots.isEmpty,
          s"zorderBy: no min/max bounds for all-null column(s) " +
            s"${nullSlots.map(i => cols(i / 2)).distinct.mkString(", ")}; " +
            "pass explicit `ranges` or filter the nulls first")
        cols.indices.map(i => (row.getLong(2 * i), row.getLong(2 * i + 1)))
      }
    val scaled = cols.zip(bounds).map { case (c, (lo, hi)) =>
      scaleToBits(col(c), lit(lo), lit(hi), bits)
    }
    val z =
      if (curve == "hilbert") graft.functions.HilbertCurve.hilbertIndex(bits, scaled: _*)
      else if (cols.size == 2) interleave2(scaled(0), scaled(1))
      else interleaveN(scaled, bits)
    // collision-safe scratch name: a user column literally named "_zorder"
    // must survive (the old fixed name silently overwrote then dropped it)
    val zc = Iterator.from(0).map(i => s"__graft_zorder_$i")
      .find(n => !df.columns.contains(n)).get
    val keyCols = prefixCols.map(col) :+ col(zc)
    df.withColumn(zc, z)
      .repartitionByRange(numPartitions, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
      .drop(zc)
  }
}
