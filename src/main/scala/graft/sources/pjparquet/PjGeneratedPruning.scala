package graft.sources.pjparquet

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
import org.apache.spark.sql.catalyst.util.GeneratedColumn
import org.apache.spark.sql.{sources => v1}
import org.apache.spark.sql.types._

/** Partition pruning THROUGH generation expressions (round 13 — Delta's
  * generated-column partition-filter derivation): a table
  * `PARTITIONED BY (g)` where `g GENERATED ALWAYS AS (date(event_ts))`
  * must prune directories from a predicate on `event_ts` alone — on a
  * day-partitioned 100 TB fact table that is the first query every
  * analyst runs, and without derivation it scans every partition.
  *
  * For each pushed data filter on a generation expression's BASE column,
  * a conservative filter on the generated PARTITION column is derived:
  *
  *  - `base = v`  → `g = F(v)` (any deterministic F),
  *  - `base IN (vs)` → `g IN (F(vs))`,
  *  - `base > v` → `g >= F(v)`, `base >= v` → `g >= F(v)` (order-
  *    preserving F only: F(x) >= F(v) for every x >= v),
  *  - `base < v` → `g <= F(v)`, `<=` likewise,
  *  - AND/OR recurse (OR only when both sides derive).
  *
  * F is evaluated at planning time by analyzing + binding the recorded
  * generation expression against a one-attribute relation and calling
  * `eval` on the literal — the exact Catalyst evaluation the WRITE side
  * used to materialize the partition values, so derived constants agree
  * with directory values by construction. Supported monotone shapes:
  * `date(b)` / `to_date(b)` / `CAST(b AS DATE)`, `year(b)`,
  * `date_trunc(unit, b)`, `substring(b, 1, n)` (string prefix);
  * equality-only shapes: `month(b)`, `day(b)` / `dayofmonth(b)`,
  * `hour(b)`. Anything else simply derives nothing (no pruning, never
  * wrong). Rows where `base IS NULL` land in the null partition and can
  * never satisfy the source comparison, so dropping them is sound.
  *
  * Timezone caveat (same as Delta's): `date`/`year`-style expressions
  * evaluate under the session timezone; the derived constants match the
  * directory values when read and write sessions agree on it.
  */
private[pjparquet] object PjGeneratedPruning {

  /** Order-preserving generation shapes (safe for range derivation). */
  private val MonotoneFns = Set("date", "to_date", "year", "date_trunc")
  /** Deterministic but non-monotone (equality/IN derivation only). */
  private val EqOnlyFns = Set("month", "day", "dayofmonth", "hour")

  /** `eval` returns the derived partition value plus whether RANGE
    * comparisons against directory values are order-correct for it
    * (false for a numeric generation result under a string-typed
    * partition field, where lexicographic order diverges from numeric).
    */
  private final case class Derivation(
      genName: String,
      baseName: String,
      monotone: Boolean,
      eval: Any => Option[(Any, Boolean)])

  private def fold(n: String): String = n.toLowerCase(java.util.Locale.ROOT)

  /** Classify a parsed (unresolved) generation expression: Some(monotone)
    * with the single base attribute it references, or None (unsupported).
    */
  private def classify(e: Expression): Option[(String, Boolean)] = e match {
    case f: UnresolvedFunction if f.arguments.sizeIs >= 1 =>
      val name = fold(f.nameParts.last)
      f.arguments match {
        case Seq(a: UnresolvedAttribute)
            if MonotoneFns.contains(name) && name != "date_trunc" =>
          Some((a.name, true))
        case Seq(a: UnresolvedAttribute) if EqOnlyFns.contains(name) =>
          Some((a.name, false))
        case Seq(Literal(_, StringType), a: UnresolvedAttribute) if name == "date_trunc" =>
          Some((a.name, true))
        case Seq(a: UnresolvedAttribute, Literal(from, _), Literal(_, _))
            if (name == "substring" || name == "substr") &&
              String.valueOf(from) == "1" =>
          Some((a.name, true)) // prefix: monotone under binary string order
        // bucket transforms (`pmod(hash(b), n)`, [[PjBucketFunction]]):
        // equality/IN on the base column derives the exact bucket
        // directory — a point lookup on a bucket(n, col) table reads 1/n
        // of the files with zero stats involved
        case Seq(h: UnresolvedFunction, Literal(_, _))
            if name == "pmod" && fold(h.nameParts.last) == "hash" =>
          h.arguments match {
            case Seq(a: UnresolvedAttribute) => Some((a.name, false))
            case _ => None
          }
        case _ => None
      }
    case Cast(a: UnresolvedAttribute, DateType, _, _) => Some((a.name, true))
    // integral-cast wrapper (the synthesized bucket field is BIGINT over
    // pmod's INT): classify through it — evaluation uses the FULL parsed
    // expression either way, so the wrapper changes nothing but the type
    case Cast(inner, LongType, _, _) => classify(inner)
    case _ => None
  }

  /** Build the planning-time evaluators for every generated partition
    * column of the layout (usually zero or one). Failures anywhere
    * degrade to "derive nothing".
    */
  private def derivations(spark: SparkSession, layout: PjLayout): Seq[Derivation] = {
    val recorded = layout.dataSchema.getOrElse(return Nil)
    layout.partitionSchema.fields.toSeq.flatMap { pf =>
      recorded.fields.find(f => fold(f.name) == fold(pf.name))
        .filter(PjGenerated.isGenerated).flatMap { gf =>
          try {
            val sql = gf.metadata.getString(
              GeneratedColumn.GENERATION_EXPRESSION_METADATA_KEY)
            val parsed = spark.sessionState.sqlParser.parseExpression(sql)
            classify(parsed).flatMap { case (baseName, monotone) =>
              recorded.fields.find(f => fold(f.name) == fold(baseName)).map { bf =>
                val attr = AttributeReference(bf.name, bf.dataType, nullable = true)()
                val analyzed = spark.sessionState.analyzer.execute(
                  Project(Seq(Alias(parsed, gf.name)()), LocalRelation(Seq(attr))))
                val resolved = analyzed.asInstanceOf[Project].projectList.head
                  .asInstanceOf[Alias].child
                val typed =
                  if (resolved.dataType == gf.dataType) resolved
                  else Cast(resolved, gf.dataType)
                val bound = BindReferences.bindReference(typed, AttributeSeq(Seq(attr)))
                val toCat = CatalystTypeConverters.createToCatalystConverter(bf.dataType)
                val genType = gf.dataType
                val partType = pf.dataType
                Derivation(pf.name, bf.name, monotone, (v: Any) => {
                  try {
                    val internal =
                      v match {
                        case u: org.apache.spark.unsafe.types.UTF8String => u
                        case other => toCat(other)
                      }
                    toPartitionValue(
                      bound.eval(InternalRow.fromSeq(Seq(internal))), genType, partType)
                  } catch { case scala.util.control.NonFatal(_) => None }
                })
              }
            }
          } catch { case scala.util.control.NonFatal(_) => None }
        }
    }
  }

  /** Convert an evaluated generation result (Catalyst internal) into the
    * representation [[PjPartitionFilter]] compares against directory
    * values: Long for long-typed partition fields (DATE internally is
    * day-int and its directory value is that integer), String for
    * string-typed ones. A cross-type combination would compare
    * lexicographically-wrong for ranges — refuse (None = no derivation).
    */
  private def toPartitionValue(
      result: Any, genType: DataType, partType: DataType): Option[(Any, Boolean)] =
    (result, partType) match {
      case (null, _) => None
      // DATE results: the partition matcher holds epoch days (Long) for
      // DateType fields, ISO strings (chronologically ordered under
      // lexicographic compare — range-safe) for inferred StringType dirs
      case (i: Int, DateType) if genType == DateType => Some((i.toLong, true))
      case (i: Int, StringType) if genType == DateType =>
        Some((java.time.LocalDate.ofEpochDay(i.toLong).toString, true))
      case (i: Int, LongType) => Some((i.toLong, true))
      case (l: Long, LongType) => Some((l, true))
      // numeric rendered as string: equality only (lexicographic != numeric)
      case (i: Int, StringType) => Some((i.toString, false))
      case (l: Long, StringType) => Some((l.toString, false))
      case (s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        Some((s.toString, true))
      case _ => None
    }

  /** Derive partition filters implied by `pushed` data filters. Each
    * returned filter references ONLY generated partition columns and is
    * a logical consequence of its source filter — applying it with
    * [[PjPartitionFilter.mightMatch]] can only drop files that hold no
    * matching rows.
    */
  def derive(layout: PjLayout, pushed: Seq[v1.Filter]): Seq[v1.Filter] = {
    if (layout.partitionSchema.isEmpty || pushed.isEmpty) return Nil
    if (!PjGenerated.hasGenerated(layout.dataSchema)) return Nil
    val spark = SparkSession.active
    val ds = derivations(spark, layout)
    if (ds.isEmpty) return Nil
    pushed.flatMap(f => ds.flatMap(d => deriveOne(d, f)))
  }

  private def deriveOne(d: Derivation, f: v1.Filter): Option[v1.Filter] = {
    def base(c: String): Boolean = fold(c) == fold(d.baseName)
    def range(v: Any, mk: Any => v1.Filter): Option[v1.Filter] =
      if (!d.monotone || v == null) None
      else d.eval(v).collect { case (pv, true) => mk(pv) }
    f match {
      case v1.EqualTo(c, v) if base(c) && v != null =>
        d.eval(v).map { case (pv, _) => v1.EqualTo(d.genName, pv) }
      case v1.In(c, vs) if base(c) && vs.nonEmpty && vs.forall(_ != null) =>
        val mapped = vs.toSeq.map(d.eval)
        if (mapped.forall(_.isDefined))
          Some(v1.In(d.genName, mapped.flatten.map(_._1).distinct.toArray))
        else None
      case v1.GreaterThan(c, v) if base(c) =>
        range(v, v1.GreaterThanOrEqual(d.genName, _))
      case v1.GreaterThanOrEqual(c, v) if base(c) =>
        range(v, v1.GreaterThanOrEqual(d.genName, _))
      case v1.LessThan(c, v) if base(c) =>
        range(v, v1.LessThanOrEqual(d.genName, _))
      case v1.LessThanOrEqual(c, v) if base(c) =>
        range(v, v1.LessThanOrEqual(d.genName, _))
      case v1.And(l, r) =>
        (deriveOne(d, l), deriveOne(d, r)) match {
          case (Some(a), Some(b)) => Some(v1.And(a, b))
          case (a, b) => a.orElse(b) // one conjunct's implication still holds
        }
      case v1.Or(l, r) =>
        // sound only when BOTH branches imply a partition bound
        for (a <- deriveOne(d, l); b <- deriveOne(d, r)) yield v1.Or(a, b)
      case _ => None
    }
  }
}
