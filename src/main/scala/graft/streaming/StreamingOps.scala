package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Running per-user aggregate emitted by [[StreamingOps.runningUserStats]]. */
case class UserStat(userId: Long, nEvents: Long, valueSum: Double)

/** A heavy key within one tumbling window, emitted by
  * [[StreamingOps.streamingHeavyHitters]] (`wStart` = window start epoch
  * seconds; `estimate` = CMS count, never below the true count).
  */
case class WindowHeavyHitter(wStart: Long, key: String, estimate: Long)

/** Structured Streaming operators over the `events` stream (SURVEY.md §2.2
  * streaming row). The same transforms run on batch or streaming inputs —
  * callers pass `spark.read` or `spark.readStream` output.
  *
  * `events.ts` arrives either as LongType epoch-nanoseconds (timestamp[ns]
  * parquet under `spark.sql.legacy.parquet.nanosAsLong=true`) or as a
  * native timestamp column (timestamp[us] parquet → TIMESTAMP_NTZ);
  * [[eventTime]] folds both to one TIMESTAMP event-time column with
  * integer math (no double rounding at 1e18 magnitudes).
  */
object StreamingOps {

  /** `ts` (Long ns or timestamp) → TIMESTAMP `event_time` column. */
  def eventTime(df: DataFrame): DataFrame = {
    val ev = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ =>
        // sessions pin UTC, so an NTZ→timestamp cast is value-exact
        col("ts").cast(org.apache.spark.sql.types.TimestampType)
    }
    df.withColumn("event_time", ev)
  }

  /** Tumbling-window event counts with a watermark: the canonical streaming
    * aggregation (late data beyond 1 hour is dropped at scale).
    */
  def windowedCounts(events: DataFrame, windowLength: String = "1 hour"): DataFrame =
    eventTime(events)
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("value_sum"))
      .select(
        col("window.start").as("w_start"),
        col("event_type"), col("n"), col("value_sum"))

  /** Session windows (30-min inactivity gap) per user — the streaming twin
    * of the batch `q42_sessionize` query.
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    eventTime(events)
      .withWatermark("event_time", "1 hour")
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))

  /** Streaming exact dedup: first occurrence per KEY wins across
    * micro-batches (`dropDuplicatesWithinWatermark` — the same key at a
    * different event time is still a duplicate, unlike
    * `dropDuplicates(keys :+ eventTime)`); state for keys older than the
    * watermark horizon is dropped, so memory is bounded by the dedup
    * horizon, not the stream length — the continuous-ingestion form of the
    * batch `exactDedup`.
    */
  def dedupedStream(events: DataFrame, keys: Seq[String], horizon: String = "1 hour"): DataFrame =
    eventTime(events)
      .withWatermark("event_time", horizon)
      .dropDuplicatesWithinWatermark(keys)

  /** Streaming heavy hitters: per tumbling window, keyed state holds ONE
    * fixed-size Count–Min sketch plus the candidate map of keys whose
    * estimate has reached `minCount` — state is bounded by the sketch size
    * and `window volume / minCount`, NOT by distinct-key cardinality,
    * which is what lets frequency tracking survive an unbounded key space
    * on a continuous stream (the streaming twin of
    * `PipelineOps.heavyHitters`). CMS never underestimates, so the emitted
    * set is a superset of the true heavy set; overestimates are bounded by
    * `eps ×` window volume at the configured confidence. Each micro-batch
    * re-emits the window's current candidates with updated estimates
    * (OutputMode.Update, like [[runningUserStats]]).
    */
  def streamingHeavyHitters(
      events: DataFrame,
      keyCol: String = "event_type",
      windowLength: String = "1 hour",
      minCount: Long = 5L,
      eps: Double = 1e-3,
      confidence: Double = 0.99): Dataset[WindowHeavyHitter] = {
    import events.sparkSession.implicits._
    import org.apache.spark.util.sketch.CountMinSketch
    eventTime(events)
      .select(
        window(col("event_time"), windowLength).getField("start").cast("long").as("w_start"),
        col(keyCol).cast("string").as("k"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Array[Byte], Map[String, Long]), WindowHeavyHitter](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (wStart, rows, state) =>
        val (skBytes, cand0) =
          state.getOption.getOrElse((null: Array[Byte], Map.empty[String, Long]))
        val sk =
          if (skBytes == null) CountMinSketch.create(eps, confidence, 42)
          else CountMinSketch.readFrom(new java.io.ByteArrayInputStream(skBytes))
        var cand = cand0
        val touched = scala.collection.mutable.HashSet[String]()
        rows.foreach { case (_, k) => if (k != null) { sk.add(k); touched += k } }
        // only keys seen this batch can have changed estimates; the map
        // stays bounded because an estimate must reach minCount to enter
        for (k <- touched) {
          val e = sk.estimateCount(k)
          if (e >= minCount) cand += (k -> e)
        }
        val out = new java.io.ByteArrayOutputStream()
        sk.writeTo(out)
        state.update((out.toByteArray, cand))
        cand.iterator.map { case (k, e) => WindowHeavyHitter(wStart, k, e) }
      }
  }

  /** Stream-static enrichment join — the dimension lookup every event
    * pipeline runs before anything else: each micro-batch joins against
    * the CURRENT static dimension frame (the static side is re-planned
    * per batch, so a slowly-changing dimension is picked up batch to
    * batch), the dimension is broadcast, and NO join state accumulates —
    * unlike stream-stream joins nothing buffers and nothing needs a
    * watermark. LEFT join: events with no dimension row survive with
    * nulls instead of silently dropping. The identical plan runs on a
    * batch frame (the batch twin the oracle checks).
    */
  def enrichWithDimension(
      events: DataFrame,
      dim: DataFrame,
      eventKey: String = "user_id",
      dimKey: String = "c_custkey"): DataFrame =
    eventTime(events).join(
      org.apache.spark.sql.functions.broadcast(dim),
      col(eventKey) === col(dimKey), "left")

  /** Stream-stream interval join (attribution): pair each `rightType`
    * event with the same user's `leftType` events in the preceding
    * `withinSeconds`. On streaming inputs both sides carry watermarks and
    * the event-time range predicate lets Spark EXPIRE buffered rows once
    * the opposite watermark passes `l_time + within` — join state is
    * bounded by interval × arrival rate, never by stream length (the
    * canonical two-stream join the micro-batch engine supports in append
    * mode). The same plan runs on batch frames (watermarks skipped);
    * `lag_us` is exact integer microsecond arithmetic on both engines.
    */
  def attributionJoin(
      left: DataFrame,
      right: DataFrame,
      leftType: String = "view",
      rightType: String = "click",
      withinSeconds: Long = 1800L,
      watermark: String = "1 hour"): DataFrame = {
    def side(df: DataFrame, t: String, p: String): DataFrame = {
      val e = eventTime(df).filter(col("event_type") === t)
        .select(col("user_id").as(p + "user"), col("event_time").as(p + "time"),
          col("event_id").as(p + "event"), col("value").as(p + "value"))
      if (df.isStreaming) e.withWatermark(p + "time", watermark) else e
    }
    val l = side(left, leftType, "l_")
    val r = side(right, rightType, "r_")
    l.join(r,
        col("l_user") === col("r_user") &&
          col("l_time") <= col("r_time") &&
          col("r_time") <= col("l_time") + expr(s"INTERVAL $withinSeconds SECONDS"))
      .select(col("l_user").as("user_id"),
        col("l_event").as("view_event"), col("r_event").as("click_event"),
        (unix_micros(col("r_time")) - unix_micros(col("l_time"))).as("lag_us"),
        col("r_value").as("click_value"))
  }

  /** LEFT OUTER stream-stream interval join: every `leftType` event
    * emitted, paired with the same user's `rightType` events in the
    * FOLLOWING `withinSeconds` — or with nulls once the right watermark
    * proves no match can still arrive (the null rows are what an
    * attribution pipeline bills as "view with no converting click"). On
    * streaming inputs the outer side's emission is watermark-gated, so
    * state stays bounded exactly like the inner form; on batch frames the
    * same plan is a plain left-outer range join.
    */
  def attributionJoinOuter(
      left: DataFrame,
      right: DataFrame,
      leftType: String = "view",
      rightType: String = "click",
      withinSeconds: Long = 1800L,
      watermark: String = "1 hour"): DataFrame = {
    def side(df: DataFrame, t: String, p: String): DataFrame = {
      val e = eventTime(df).filter(col("event_type") === t)
        .select(col("user_id").as(p + "user"), col("event_time").as(p + "time"),
          col("event_id").as(p + "event"), col("value").as(p + "value"))
      if (df.isStreaming) e.withWatermark(p + "time", watermark) else e
    }
    val l = side(left, leftType, "l_")
    val r = side(right, rightType, "r_")
    l.join(r,
        col("l_user") === col("r_user") &&
          col("l_time") <= col("r_time") &&
          col("r_time") <= col("l_time") + expr(s"INTERVAL $withinSeconds SECONDS"),
        "left_outer")
      .select(col("l_user").as("user_id"),
        col("l_event").as("view_event"), col("r_event").as("click_event"),
        (unix_micros(col("r_time")) - unix_micros(col("l_time"))).as("lag_us"),
        col("r_value").as("click_value"))
  }

  /** Custom keyed state via `flatMapGroupsWithState`: a running per-user
    * (event count, value sum) that survives across micro-batches. The
    * pattern for state Spark's built-in windows can't express; state is
    * per-key and partitioned by the stream's groupBy hash — scales with
    * distinct users, not events. Emits the updated running total for every
    * key touched in a micro-batch (OutputMode.Update).
    */
  def runningUserStats(events: DataFrame): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        coalesce(col("value"), lit(0.0)).as("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), UserStat](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (key, rows, state) =>
        var (n, v) = state.getOption.getOrElse((0L, 0.0))
        rows.foreach { case (_, value) => n += 1; v += value }
        state.update((n, v))
        Iterator(UserStat(key, n, v))
      }
  }
}
