package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Running per-user aggregate emitted by [[StreamingOps.runningUserStats]]. */
case class UserStat(userId: Long, nEvents: Long, valueSum: Double)

/** Structured Streaming operators over the `events` stream (SURVEY.md §2.2
  * streaming row). The same transforms run on batch or streaming inputs —
  * callers pass `spark.read` or `spark.readStream` output.
  *
  * `events.ts` is parquet timestamp[ns]; with
  * `spark.sql.legacy.parquet.nanosAsLong=true` it surfaces as LongType
  * nanoseconds, converted here with integer math (`div`) to avoid double
  * rounding at 1e18 magnitudes.
  */
object StreamingOps {

  /** ns epoch → TIMESTAMP column. */
  def eventTime(df: DataFrame): DataFrame =
    df.withColumn("event_time", timestamp_micros(expr("ts div 1000")))

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
