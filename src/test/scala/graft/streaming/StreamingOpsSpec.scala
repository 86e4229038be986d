package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Structured Streaming over the events fixture: the streaming plan
  * (file source → watermark → windowed/session aggregation → memory sink)
  * must agree with the identical batch computation.
  */
class StreamingOpsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s
  }

  /** The file streaming source needs a directory; stage the fixture. */
  private lazy val eventsPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  private def batchEvents = spark.read.parquet(eventsPath)

  private def runToCompletion(streamDf: org.apache.spark.sql.DataFrame, table: String): Unit = {
    val q = streamDf.writeStream
      .format("memory").queryName(table).outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(!q.isActive, "stream must have drained")
  }

  test("stream-static enrichment join: streaming == batch, no state") {
    import spark.implicits._
    val dim = Seq((0L, "SEG_A"), (1L, "SEG_B"), (2L, "SEG_C"))
      .toDF("c_custkey", "c_mktsegment")
    val schema = batchEvents.schema
    val stream = spark.readStream.schema(schema).parquet(eventsPath)
    // append mode: a stream-static join needs no aggregation or watermark
    val q = StreamingOps.enrichWithDimension(stream, dim)
      .select($"event_id", $"user_id", $"c_mktsegment")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(!q.isActive)
    val streaming = spark.table("enriched")
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    val batch = StreamingOps.enrichWithDimension(batchEvents, dim)
      .select($"event_id", $"user_id", $"c_mktsegment")
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(streaming.nonEmpty && streaming == batch)
    // left semantics: users outside the dim survive with null segment
    assert(spark.table("enriched")
      .filter($"user_id" > 2 && $"c_mktsegment".isNull).count() > 0)
  }

  test("windowed counts: streaming == batch") {
    val schema = batchEvents.schema
    val stream = spark.readStream.schema(schema).parquet(eventsPath)
    runToCompletion(StreamingOps.windowedCounts(stream), "win_counts")

    val streaming = spark.table("win_counts")
      .orderBy("w_start", "event_type").collect().map(_.toSeq).toSeq
    val batch = StreamingOps.windowedCounts(batchEvents)
      .orderBy("w_start", "event_type").collect().map(_.toSeq).toSeq
    assert(streaming.nonEmpty)
    assert(streaming == batch)
  }

  test("session windows: streaming == batch (30-min gap)") {
    val schema = batchEvents.schema
    val stream = spark.readStream.schema(schema).parquet(eventsPath)
    runToCompletion(StreamingOps.sessionCounts(stream), "sess_counts")

    val streaming = spark.table("sess_counts")
      .groupBy("user_id").agg(sum("n_events").as("total"), count(lit(1)).as("sessions"))
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    val batch = StreamingOps.sessionCounts(batchEvents)
      .groupBy("user_id").agg(sum("n_events").as("total"), count(lit(1)).as("sessions"))
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(streaming.nonEmpty)
    assert(streaming == batch)
  }

  test("streaming dedup: key-level first-wins == batch distinct keys") {
    val schema = batchEvents.schema
    val stream = spark.readStream.schema(schema).parquet(eventsPath)
    // horizon wider than the event-time span of the table, so every repeat
    // of a key is within state lifetime → exactly one row per distinct key
    val q = StreamingOps.dedupedStream(stream, Seq("user_id", "event_type"),
        horizon = "3650 days")
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(!q.isActive)
    val streaming = spark.table("dedup_stream").count()
    val batch = batchEvents.dropDuplicates(Seq("user_id", "event_type")).count()
    assert(streaming > 0 && streaming == batch,
      s"streaming=$streaming batch=$batch — same key at different times must dedup")
  }

  test("flatMapGroupsWithState running stats: final state == batch aggregate") {
    val schema = batchEvents.schema
    val stream = spark.readStream.schema(schema).parquet(eventsPath)
    val q = StreamingOps.runningUserStats(stream).writeStream
      .format("memory").queryName("user_stats").outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(!q.isActive, "stream must have drained")

    // keep the LAST emitted running total per user = the final state
    val streaming = spark.table("user_stats")
      .groupBy("userId")
      .agg(max("nEvents").as("n"), max(round(col("valueSum"), 2)).as("v"))
      .orderBy("userId").collect().map(_.toSeq).toSeq
    val batch = batchEvents
      .groupBy(col("user_id").cast("long").as("userId"))
      .agg(count(lit(1)).as("n"),
        round(sum(coalesce(col("value"), lit(0.0))), 2).as("v"))
      .orderBy("userId").collect().map(_.toSeq).toSeq
    assert(streaming.nonEmpty)
    assert(streaming == batch)
  }

  test("left-outer attribution join: matches == batch, nulls for expired views only") {
    val schema = batchEvents.schema
    val viewStream = spark.readStream.schema(schema).parquet(eventsPath)
    val clickStream = spark.readStream.schema(schema).parquet(eventsPath)
    // 0s watermark delay: the final watermark reaches max(event_time), so
    // every view whose window closed strictly before it MUST have emitted
    // (matched or null-padded) by drain time
    val q = StreamingOps.attributionJoinOuter(
        viewStream, clickStream, withinSeconds = 600L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("attr_outer").outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(!q.isActive, "stream must have drained")

    val batch = StreamingOps.attributionJoinOuter(
      batchEvents, batchEvents, withinSeconds = 600L)
    // the GLOBAL watermark is the min across both sides' watermark ops,
    // each computed over its FILTERED stream (views resp. clicks)
    def maxUsOf(t: String): Long = StreamingOps.eventTime(batchEvents)
      .filter(col("event_type") === t)
      .agg(max(unix_micros(col("event_time")))).head().getLong(0)
    val maxUs = math.min(maxUsOf("view"), maxUsOf("click"))
    // views whose join window provably closed before the final watermark,
    // with a 1s guard: watermark arithmetic truncates to millis, so a view
    // exactly at the boundary may legally still sit in state
    val expiredViews = StreamingOps.eventTime(batchEvents)
      .filter(col("event_type") === "view")
      .filter(unix_micros(col("event_time")) + 601L * 1000000L < maxUs)
      .select(col("event_id").as("view_event"))

    val streaming = spark.table("attr_outer")
    // inner matches emit immediately: exact equality with batch's matches
    val sMatched = streaming.filter(col("click_event").isNotNull)
      .orderBy("user_id", "view_event", "click_event").collect().map(_.toSeq).toSeq
    val bMatched = batch.filter(col("click_event").isNotNull)
      .orderBy("user_id", "view_event", "click_event").collect().map(_.toSeq).toSeq
    assert(sMatched.nonEmpty && sMatched == bMatched)
    // null-padded rows: exactly batch's unmatched views restricted to the
    // expired set (unexpired ones may legally still sit in state at drain)
    val sUnmatched = streaming.filter(col("click_event").isNull)
      .join(expiredViews, Seq("view_event"), "left_semi")
      .select("view_event").orderBy("view_event").collect().map(_.getLong(0)).toSeq
    val bUnmatched = batch.filter(col("click_event").isNull)
      .join(expiredViews, Seq("view_event"), "left_semi")
      .select("view_event").orderBy("view_event").collect().map(_.getLong(0)).toSeq
    assert(bUnmatched.nonEmpty, "fixture must contain expired unconverted views")
    assert(sUnmatched == bUnmatched)
  }

  test("stream-stream attribution join: streaming == batch") {
    val schema = batchEvents.schema
    // two INDEPENDENT stream sources — a genuine two-stream join, not a
    // self-joined single source
    val viewStream = spark.readStream.schema(schema).parquet(eventsPath)
    val clickStream = spark.readStream.schema(schema).parquet(eventsPath)
    val q = StreamingOps.attributionJoin(viewStream, clickStream)
      .writeStream.format("memory").queryName("attr_join").outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(!q.isActive, "stream must have drained")

    val streaming = spark.table("attr_join")
      .orderBy("user_id", "view_event", "click_event")
      .collect().map(_.toSeq).toSeq
    val batch = StreamingOps.attributionJoin(batchEvents, batchEvents)
      .orderBy("user_id", "view_event", "click_event")
      .collect().map(_.toSeq).toSeq
    assert(streaming.nonEmpty, "fixture must produce view->click pairs")
    assert(streaming == batch)
    // sanity on the interval semantics: every lag within [0, 30 min]
    val lags = spark.table("attr_join").select("lag_us")
      .collect().map(_.getLong(0))
    assert(lags.forall(l => l >= 0 && l <= 1800L * 1000000))
  }

  test("streaming heavy hitters: CMS guarantees vs exact windowed counts") {
    val schema = batchEvents.schema
    val stream = spark.readStream.schema(schema).parquet(eventsPath)
    // exact per-window key counts (the truth the sketch may only OVER-count)
    val exact = StreamingOps.eventTime(batchEvents)
      .groupBy(window(col("event_time"), "1 hour").getField("start").cast("long").as("w_start"),
        col("event_type").as("key"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val perWindowTotal = exact.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val minCount = exact.values.toSeq.sorted.apply(exact.size / 2) // median: both sides exercised
    val eps = 1e-3

    val q = StreamingOps.streamingHeavyHitters(stream, minCount = minCount, eps = eps)
      .writeStream.format("memory").queryName("hh_stream").outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(!q.isActive, "stream must have drained")
    // last emission per (window, key) = final estimate
    val got = spark.table("hh_stream")
      .groupBy("wStart", "key").agg(max("estimate").as("estimate"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty)

    // no false negatives: every truly-heavy (window, key) is reported
    val trulyHeavy = exact.filter(_._2 >= minCount).keySet
    assert(trulyHeavy.subsetOf(got.keySet), s"missed ${trulyHeavy -- got.keySet}")
    // never underestimates; over by at most eps * window volume
    for ((wk, e) <- got) {
      val truth = exact(wk)
      assert(e >= truth, s"$wk: estimate $e under true $truth")
      assert(e <= truth + math.ceil(eps * perWindowTotal(wk._1)).toLong,
        s"$wk: estimate $e above eps bound (true $truth)")
    }

    // batch twin: the same operator on the batch frame agrees on the
    // candidate set (single pass == single micro-batch)
    val batchGot = StreamingOps.streamingHeavyHitters(batchEvents, minCount = minCount, eps = eps)
      .collect().map(h => (h.wStart, h.key) -> h.estimate).toMap
    assert(batchGot == got)
  }
}
