package graft.sources.pjparquet

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.PJException

/** ANALYZE TABLE for commit-log tables — one scan computes per-column
  * NDV (HLL++, 2 % rsd), null count, min/max (numeric/date/timestamp)
  * and avg/max byte length (string/binary), then records them in the
  * log as a metadata-only `analyze` commit (the `tableStats` lane —
  * latest-recording-commit-wins, survives both checkpoint formats,
  * rolls back under RESTORE like every other lane).
  *
  * Why this matters at 100 TB: Spark's cost-based optimizer re-orders
  * joins and picks broadcast sides from per-column `ColumnStat`s
  * (`spark.sql.cbo.enabled`), but a DSv2 source reports NONE unless its
  * scan implements `columnStats()` — so a 12-way star join over an
  * un-analyzed lakehouse table plans on row counts alone. [[PjScan]]
  * serves these recorded stats through `estimateStatistics()`, making
  * the table CBO-visible exactly like a Hive table after
  * `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`.
  *
  * The stats are computed over the LIVE rows (deletion vectors applied)
  * of the snapshot being analyzed, keyed by LOGICAL column names (column
  * mapping safe).
  */
object PjAnalyze {

  /** Recorded per-column facts. -1 = not computed for the type. */
  final case class ColStats(
      ndv: Long, nulls: Long, avgLen: Long, maxLen: Long,
      min: Option[String] = None, max: Option[String] = None,
      hist: Option[Hist] = None)

  /** Equi-height histogram (Spark's `statistics.histogram.enabled`
    * shape): `height` non-null rows per bin, bins as (lo, hi, ndv).
    * What it buys at 100 TB: min/max-only selectivity assumes a UNIFORM
    * value distribution, so a predicate over the quiet range of a skewed
    * column estimates orders of magnitude too many rows — and the CBO
    * then refuses a broadcast that would actually fit (or joins in the
    * wrong order). The histogram gives the estimator the real mass
    * per range.
    */
  final case class Hist(height: Double, bins: Seq[(Double, Double, Long)])

  final case class TableStats(rows: Long, version: Long, cols: Map[String, ColStats])

  /** Types the single-pass aggregate knows how to summarize. */
  private def analyzable(dt: DataType): Boolean = dt match {
    case _: NumericType | _: StringType | BinaryType | DateType |
        _: TimestampType | TimestampNTZType | BooleanType => true
    case _ => false
  }

  private def numericLike(dt: DataType): Boolean = dt match {
    case _: NumericType | DateType | _: TimestampType | TimestampNTZType => true
    case _ => false
  }

  private def fixedLen(dt: DataType): Long = dt match {
    case BooleanType | ByteType => 1L
    case ShortType => 2L
    case IntegerType | FloatType | DateType => 4L
    case _ => 8L
  }

  /** Compute + commit. `columns` empty = every analyzable column. */
  def analyze(
      spark: SparkSession, root: String,
      columns: Seq[String] = Nil): TableStats = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!PjCommitLog.isEnabled(fs, rootPath))
      throw new PJException(
        s"pjparquet: '$root' has no commit log; ANALYZE applies to logged tables")
    val df = spark.read.format("pjparquet").load(root)
    val byName = df.schema.fields.map(f => f.name -> f).toMap
    columns.foreach(c => if (!byName.contains(c))
      throw new PJException(
        s"pjparquet: ANALYZE column '$c' does not exist " +
          s"(table columns: ${df.columns.mkString(", ")})"))
    val target = (if (columns.isEmpty) df.schema.fields.toSeq
    else columns.map(byName)).filter(f => analyzable(f.dataType))
    if (target.isEmpty)
      throw new PJException(
        s"pjparquet: ANALYZE found no analyzable columns on '$root'")

    // ONE aggregation pass over the table — every column's facts are
    // parallel aggregate expressions in the same map-side-combined job,
    // so analyzing a 400-column table still reads the data exactly once
    val aggs = count(lit(1)).as("_rows") +: target.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        approx_count_distinct(c, 0.02).as(s"ndv::${f.name}"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"nulls::${f.name}"))
      val lens = f.dataType match {
        case _: StringType => Seq(
          avg(octet_length(c)).as(s"avgLen::${f.name}"),
          max(octet_length(c)).cast("long").as(s"maxLen::${f.name}"))
        case BinaryType => Seq(
          avg(octet_length(c)).as(s"avgLen::${f.name}"),
          max(octet_length(c)).cast("long").as(s"maxLen::${f.name}"))
        case _ => Nil
      }
      val minMax =
        if (numericLike(f.dataType)) Seq(
          min(c).cast("string").as(s"min::${f.name}"),
          max(c).cast("string").as(s"max::${f.name}"))
        else Nil
      base ++ lens ++ minMax
    }
    // equi-height histograms (gated like Spark's ANALYZE by
    // spark.sql.statistics.histogram.enabled): bin ENDPOINTS ride the
    // same single pass as everything else (percentile_approx); the
    // per-bin NDVs need one more pass (ApproxCountDistinctForIntervals —
    // the exact pair of sketches Spark's own AnalyzeColumnCommand uses)
    val histEnabled = spark.conf
      .getOption("spark.sql.statistics.histogram.enabled").exists(_.toBoolean)
    val numBins = spark.conf
      .getOption("spark.sql.statistics.histogram.numBins").map(_.toInt).getOrElse(254)
    val histCols = if (histEnabled) target.filter(f => numericLike(f.dataType)) else Nil
    val histAggs = histCols.map { f =>
      val ps = (0 to numBins).map(_.toDouble / numBins)
      percentile_approx(col(f.name).cast("double"),
        lit(ps.toArray), lit(10000)).as(s"pct::${f.name}")
    }
    val row = df.agg(aggs.head, (aggs.tail ++ histAggs): _*).collect().head
    def get(name: String): Option[Any] = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) None else Some(row.get(i))
    }
    val rows = row.getLong(row.fieldIndex("_rows"))
    // pass 2 (histogram columns only): distinct counts per bin
    val histByCol: Map[String, Hist] =
      if (histCols.isEmpty) Map.empty
      else {
        val endpointsByCol: Map[String, Seq[Double]] = histCols.flatMap { f =>
          get(s"pct::${f.name}").map(v =>
            f.name -> v.asInstanceOf[scala.collection.Seq[Any]].map {
              case d: java.lang.Number => d.doubleValue()
            }.toSeq)
        }.toMap
        val usable = histCols.filter(f => endpointsByCol.get(f.name).exists(_.size >= 2))
        if (usable.isEmpty) Map.empty
        else {
          import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal}
          import org.apache.spark.sql.catalyst.expressions.aggregate.ApproxCountDistinctForIntervals
          val ndvAggs = usable.map { f =>
            val child = org.apache.spark.sql.GraftFunctionBridge.expression(
              col(f.name).cast("double"))
            val ep = CreateArray(endpointsByCol(f.name).map(Literal(_)))
            org.apache.spark.sql.GraftFunctionBridge.column(
              new ApproxCountDistinctForIntervals(child, ep, 0.05, 0, 0)
                .toAggregateExpression()).as(s"histndv::${f.name}")
          }
          val r2 = df.agg(ndvAggs.head, ndvAggs.tail: _*).collect().head
          usable.flatMap { f =>
            val i = r2.fieldIndex(s"histndv::${f.name}")
            if (r2.isNullAt(i)) None
            else {
              val ndvs = r2.get(i).asInstanceOf[scala.collection.Seq[Any]]
                .map { case n: java.lang.Number => n.longValue() }.toSeq
              val eps = endpointsByCol(f.name)
              val nn = rows - get(s"nulls::${f.name}")
                .map(_.asInstanceOf[Long]).getOrElse(0L)
              val bins = eps.zip(eps.tail).zip(ndvs).map {
                case ((lo, hi), n) => (lo, hi, math.max(1L, n))
              }
              Some(f.name -> Hist(nn.toDouble / bins.size, bins))
            }
          }.toMap
        }
      }
    val cols = target.map { f =>
      val ndv = get(s"ndv::${f.name}").map(_.asInstanceOf[Long]).getOrElse(0L)
      val nulls = get(s"nulls::${f.name}").map(_.asInstanceOf[Long]).getOrElse(0L)
      val (avgLen, maxLen) = f.dataType match {
        case _: StringType | BinaryType =>
          (get(s"avgLen::${f.name}").map(v => math.ceil(
            v.asInstanceOf[java.lang.Number].doubleValue()).toLong).getOrElse(0L),
            get(s"maxLen::${f.name}").map(_.asInstanceOf[Long]).getOrElse(0L))
        case dt => (fixedLen(dt), fixedLen(dt))
      }
      val (mn, mx) =
        if (numericLike(f.dataType))
          (get(s"min::${f.name}").map(_.toString), get(s"max::${f.name}").map(_.toString))
        else (None, None)
      f.name -> ColStats(ndv, nulls, avgLen, maxLen, mn, mx, histByCol.get(f.name))
    }.toMap

    val head = PjCommitLog.latest(fs, rootPath).get
    val stats = TableStats(rows, head.version, cols)
    PjCommitLog.commit(fs, rootPath, "analyze", Nil, Set.empty,
      operation = Some(s"ANALYZE columns=${target.map(_.name).mkString(",")}"),
      tableStatsJson = Some(render(stats)))
    PjParquetTable.clearLayoutCache() // serve the new stats immediately
    stats
  }

  def render(ts: TableStats): String = {
    val m = new ObjectMapper()
    val node = m.createObjectNode()
    node.put("rows", ts.rows)
    node.put("version", ts.version)
    val colsNode = node.putObject("cols")
    ts.cols.toSeq.sortBy(_._1).foreach { case (name, c) =>
      val cn = colsNode.putObject(name)
      cn.put("ndv", c.ndv); cn.put("nulls", c.nulls)
      cn.put("avgLen", c.avgLen); cn.put("maxLen", c.maxLen)
      c.min.foreach(cn.put("min", _)); c.max.foreach(cn.put("max", _))
      c.hist.foreach { h =>
        val hn = cn.putObject("hist")
        hn.put("h", h.height)
        val arr = hn.putArray("b")
        h.bins.foreach { case (lo, hi, n) =>
          val bn = arr.arrayNode(); bn.add(lo); bn.add(hi); bn.add(n)
          arr.add(bn)
        }
      }
    }
    m.writeValueAsString(node)
  }

  def parse(json: Option[String]): Option[TableStats] = json.flatMap { j =>
    try {
      val node = new ObjectMapper().readTree(j)
      // "{}" is the explicit-clear sentinel a RESTORE records when the
      // target version predates any ANALYZE
      if (!node.has("cols")) None
      else {
        val cols = scala.collection.mutable.Map.empty[String, ColStats]
        val it = node.path("cols").properties().iterator()
        while (it.hasNext) {
          val e = it.next()
          val c = e.getValue
          val hist = Option(c.get("hist")).map { hn =>
            val bins = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Long)]
            val bit = hn.path("b").elements()
            while (bit.hasNext) {
              val b = bit.next()
              bins += ((b.get(0).asDouble(), b.get(1).asDouble(), b.get(2).asLong()))
            }
            Hist(hn.path("h").asDouble(), bins.toSeq)
          }
          cols(e.getKey) = ColStats(
            c.path("ndv").asLong(0L), c.path("nulls").asLong(0L),
            c.path("avgLen").asLong(0L), c.path("maxLen").asLong(0L),
            Option(c.get("min")).map(_.asText), Option(c.get("max")).map(_.asText),
            hist)
        }
        Some(TableStats(node.path("rows").asLong(0L),
          node.path("version").asLong(0L), cols.toMap))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Catalyst value of a recorded min/max string for `dt` (what the CBO
    * expects inside `ColumnStatistics.min()/max()`); None when the type
    * cannot round-trip.
    */
  def catalystValue(dt: DataType, s: String): Option[Any] = try {
    dt match {
      case ByteType => Some(s.toByte)
      case ShortType => Some(s.toShort)
      case IntegerType => Some(s.toInt)
      case LongType => Some(s.toLong)
      case FloatType => Some(s.toFloat)
      case DoubleType => Some(s.toDouble)
      case d: DecimalType =>
        Some(org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(s),
          d.precision, d.scale))
      case DateType =>
        Some(java.time.LocalDate.parse(s).toEpochDay.toInt)
      case TimestampNTZType =>
        val ldt = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        Some(ldt.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
          ldt.getNano / 1000L)
      case _: TimestampType =>
        val i = java.sql.Timestamp.valueOf(s).toInstant
        Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
      case _ => None
    }
  } catch { case scala.util.control.NonFatal(_) => None }
}
