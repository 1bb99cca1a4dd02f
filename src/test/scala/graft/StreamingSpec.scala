package graft

import graft.streaming.EventsStream
import graft.streaming.EventsStream.{Event, UserSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Structured Streaming: watermarked windows, AvailableNow ingest,
  * stateful sessionization. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("hourlyAggregates over MemoryStream: window sums per type") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts("2024-01-01 10:05:00"), 1, "click", 2.0),
      Event(2, ts("2024-01-01 10:55:00"), 2, "click", 3.0),
      Event(3, ts("2024-01-01 11:05:00"), 1, "view", 5.0))
    val q = EventsStream.hourlyAggregates(mem.toDF())
      .writeStream.outputMode("complete").format("memory")
      .queryName("hourly_test").start()
    try {
      q.processAllAvailable()
      val got = spark.table("hourly_test").collect()
        .map(r => (r.getAs[Timestamp]("hour").toString, r.getAs[String]("event_type"),
          r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toSet
      assert(got === Set(
        ("2024-01-01 10:00:00.0", "click", 2L, 5.0),
        ("2024-01-01 11:00:00.0", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("readEventsStream defined BEFORE any file lands: schema falls back, stream still processes") {
    val landing = Files.createTempDirectory("stream_empty_in")
    // no parquet landed yet — inference would throw; the canonical Event
    // schema fallback must let the consumer be defined ahead of its
    // producer (the declare-stream-then-deploy-producer order)
    val stream = EventsStream.readEventsStream(spark, landing.toString)
    assert(stream.schema.fieldNames.toSet ===
      Set("event_id", "ts", "user_id", "event_type", "value"))
    // producer comes online afterwards, writing the canonical schema
    Seq(Event(1, ts("2024-01-01 10:05:00"), 1, "click", 2.0),
        Event(2, ts("2024-01-01 10:20:00"), 1, "click", 3.0))
      .toDF().write.mode("append").parquet(landing.toString)
    val q = EventsStream.hourlyAggregates(stream)
      .writeStream.outputMode("complete").format("memory")
      .queryName("late_landing_test").start()
    try {
      q.processAllAvailable()
      val got = spark.table("late_landing_test").collect()
      assert(got.length === 1 && got.head.getAs[Long]("n_events") === 2L)
    } finally q.stop()
  }

  test("runAvailableNow processes the events dir exactly once per checkpoint") {
    val out = Files.createTempDirectory("stream_out").toString
    val ckpt = Files.createTempDirectory("stream_ckpt").toString
    // file-stream source wants a directory (landing zone), not a bare file
    val landing = Files.createTempDirectory("stream_in")
    Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      landing.resolve("events.parquet"))
    EventsStream.runAvailableNow(spark, landing.toString, ckpt, out)
    val n1 = spark.read.parquet(out).count()
    assert(n1 > 0)
    // second run with same checkpoint: no new files -> no new rows
    EventsStream.runAvailableNow(spark, landing.toString, ckpt, out)
    assert(spark.read.parquet(out).count() === n1)
    // append mode only emits windows fully past the watermark
    // (max event time - 30 min); assert the exact closed-window subset
    val ev = Tables.events(spark, sfDir)
    val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val wmMs = maxTs.getTime - 30 * 60 * 1000
    val expected = ev
      .filter((date_trunc("hour", col("ts")).cast("long") + 3600) * 1000 <= wmMs)
      .count()
    val streamTotal = spark.read.parquet(out).agg(sum("n_events")).as[Long].head()
    assert(streamTotal === expected)
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(1, ts("2024-01-01 10:00:05"), 1, "click", 1.0), // duplicate id
      Event(2, ts("2024-01-01 10:01:00"), 2, "view", 2.0))
    val q = EventsStream.dedupEvents(mem.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_test").start()
    try {
      q.processAllAvailable()
      val ids = spark.table("dedup_test").collect().map(_.getAs[Long]("event_id")).sorted
      assert(ids.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("keyed dedup dedups ACROSS micro-batches via the state store") {
    // land the fixture as 3 ts-range files; maxFilesPerTrigger=1 forces
    // AvailableNow through 3 micro-batches, so a key's duplicate in a
    // later batch is dropped by a state lookup, not intra-batch hashing
    val landing = Files.createTempDirectory("dedup_in").toString
    spark.read.parquet(s"$sfDir/events.parquet")
      .repartitionByRange(3, col("ts"))
      .write.mode("overwrite").parquet(landing)
    val ckpt = Files.createTempDirectory("dedup_ckpt").toString
    val out = Files.createTempDirectory("dedup_out").toString
    val keyed = EventsStream
      .readEventsStream(spark, landing, maxFilesPerTrigger = Some(1))
      .withColumn("hour",
        substring(date_trunc("hour", col("ts")).cast("string"), 1, 13))
    EventsStream.runAvailableNowTo(
      EventsStream.dedupEventsByKey(
        keyed, Seq("hour", "user_id", "event_type"), "90 days")
        .select(col("hour"), col("user_id"), col("event_type")),
      ckpt, out)
    // >1 offset log entry proves the run really was multi-batch
    val batches = Option(new java.io.File(s"$ckpt/offsets").list())
      .map(_.count(!_.contains("."))).getOrElse(0)
    assert(batches > 1, s"expected multiple micro-batches, got $batches")
    val got = spark.read.parquet(out)
    val expected = Tables.events(spark, sfDir)
      .select(
        substring(date_trunc("hour", col("ts")).cast("string"), 1, 13)
          .as("hour"),
        col("user_id"), col("event_type"))
      .distinct()
    assert(got.count() === expected.count())
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("streaming sessionize (flatMapGroupsWithState) matches batch sessionize") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
      Event(2, ts("2024-01-01 10:10:00"), 7, "click", 2.0),
      Event(3, ts("2024-01-01 12:00:00"), 7, "view", 4.0), // >30min gap
      Event(4, ts("2024-01-01 10:00:00"), 8, "view", 8.0))
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val q = EventsStream.sessionize(spark, mem.toDS(), gapMinutes = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_stream_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sess_stream_test").as[UserSession]
        .collect().sortBy(s => (s.user_id, s.session_start.getTime)).toSeq
      val batch = EventsStream.sessionize(spark, events.toDS(), gapMinutes = 30)
        .collect().sortBy(s => (s.user_id, s.session_start.getTime)).toSeq
      assert(streamed === batch)
      assert(streamed.length === 3)
    } finally q.stop()
  }

  test("event-time sessionize extends sessions ACROSS batches, closes by watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventsStream.sessionizeEventTime(spark, mem.toDS(),
        gapMinutes = 30, delayMinutes = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_et_test").start()
    try {
      // batch 1: two u7 events + one u9 event; watermark -> 09:40
      mem.addData(
        Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 7, "click", 2.0),
        Event(3, ts("2024-01-01 10:00:00"), 9, "view", 8.0))
      q.processAllAvailable()
      assert(spark.table("sess_et_test").count() === 0) // nothing provably closed
      // batch 2: u7 event within the gap — must EXTEND the batch-1
      // session held in state; u8 drives the watermark to 12:30
      mem.addData(
        Event(4, ts("2024-01-01 10:20:00"), 7, "click", 4.0),
        Event(5, ts("2024-01-01 13:00:00"), 8, "view", 0.5))
      q.processAllAvailable()
      // batch 3: dummy late-day event; u7/u9 have NO data, so their
      // sessions can only close via the state-store timeout
      mem.addData(Event(6, ts("2024-01-01 13:01:00"), 8, "view", 0.5))
      q.processAllAvailable()
      val got = spark.table("sess_et_test").as[UserSession].collect()
        .map(s => s.user_id -> ((s.n_events, s.total_value,
          s.session_start.toString, s.session_end.toString))).toMap
      assert(got(7L) === ((3L, 7.0,
        "2024-01-01 10:00:00.0", "2024-01-01 10:20:00.0")))
      assert(got(9L) === ((1L, 8.0,
        "2024-01-01 10:00:00.0", "2024-01-01 10:00:00.0")))
    } finally q.stop()
  }

  test("event-time sessionize: watermark boundary — ts == wm dropped, ts > wm kept") {
    // the <-vs-<= fine print, pinned EMPIRICALLY: Spark's late-row
    // filter for flatMapGroupsWithState drops rows with ts <= watermark
    // (boundary EQUALITY is late), and keeps ts > watermark. The close
    // predicate in sessionizeEventTime (end + gap < wm) assumes only
    // the weaker "ts < wm dropped" guarantee, so it holds sessions one
    // notch longer than strictly needed — conservative, never wrong.
    // If Spark ever relaxed the filter to keep ts == wm, this test
    // fails and the close predicate must be re-audited before trusting
    // a green q58.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventsStream.sessionizeEventTime(spark, mem.toDS(),
        gapMinutes = 30, delayMinutes = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_boundary_test").start()
    try {
      // batch 1: u7 and u11 open sessions; u9@11:00 drives the
      // watermark to 11:00 - 30min = 10:30 after this batch
      mem.addData(
        Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 10:15:00"), 11, "click", 1.0),
        Event(3, ts("2024-01-01 11:00:00"), 9, "view", 8.0))
      q.processAllAvailable()
      // batch 2: u7@10:30:00 is EXACTLY the watermark -> dropped as
      // late (equality is late); u11@10:31:00 is strictly above the
      // watermark and within u11's gap -> kept, extends the session
      mem.addData(
        Event(4, ts("2024-01-01 10:30:00"), 7, "click", 2.0),
        Event(5, ts("2024-01-01 10:31:00"), 11, "view", 2.0))
      q.processAllAvailable()
      // batch 3 advances the watermark far past both close horizons;
      // batch 4 lets the state-store timeout round observe it
      mem.addData(Event(6, ts("2024-01-01 15:00:00"), 8, "view", 0.5))
      q.processAllAvailable()
      mem.addData(Event(7, ts("2024-01-01 15:01:00"), 8, "view", 0.5))
      q.processAllAvailable()
      val rows = spark.table("sess_boundary_test").as[UserSession].collect()
      val u7 = rows.filter(_.user_id == 7L)
      val u11 = rows.filter(_.user_id == 11L)
      assert(u7.length === 1 && u7.head.n_events === 1L &&
        u7.head.session_end.toString === "2024-01-01 10:00:00.0",
        s"ts == watermark must be dropped as late; got ${u7.toSeq}")
      assert(u11.length === 1 && u11.head.n_events === 2L &&
        u11.head.session_end.toString === "2024-01-01 10:31:00.0",
        s"ts > watermark must extend the open session; got ${u11.toSeq}")
    } finally q.stop()
  }

  test("runAvailableNowTo engages RocksDB state and accounts for every dropped duplicate") {
    // same multi-batch keyed-dedup shape as the cross-batch test, but
    // the assertions are about the OBSERVABILITY surface: the returned
    // StreamingQueryProgress must show (a) the RocksDB provider actually
    // holding the state (custom rocksdb* metrics present — a silent
    // fallback to the heap provider would pass every output check while
    // keeping the 100x-state scale problem), (b) zero watermark drops
    // under the 90-day horizon, and (c) input minus output exactly equal
    // to the batch-side duplicate count — the "drops exactly what it
    // dedups" ledger a production pipeline alerts on.
    val landing = Files.createTempDirectory("metrics_in").toString
    spark.read.parquet(s"$sfDir/events.parquet")
      .repartitionByRange(3, col("ts"))
      .write.mode("overwrite").parquet(landing)
    val ckpt = Files.createTempDirectory("metrics_ckpt").toString
    val out = Files.createTempDirectory("metrics_out").toString
    val keyed = EventsStream
      .readEventsStream(spark, landing, maxFilesPerTrigger = Some(1))
      .withColumn("hour",
        substring(date_trunc("hour", col("ts")).cast("string"), 1, 13))
    val progress = EventsStream.runAvailableNowTo(
      EventsStream.dedupEventsByKey(
        keyed, Seq("hour", "user_id", "event_type"), "90 days")
        .select(col("hour"), col("user_id"), col("event_type")),
      ckpt, out)
    assert(progress.nonEmpty)
    val stateful = progress.filter(_.stateOperators.nonEmpty)
    assert(stateful.nonEmpty, "dedup run must report stateful operators")
    assert(stateful.exists(_.stateOperators.exists(op =>
      op.customMetrics.keySet.toArray.exists(_.toString.startsWith("rocksdb")))),
      "state operator metrics must come from the RocksDB provider")
    val summary = EventsStream.progressSummary(spark, progress.toSeq)
    val dropped = summary.agg(sum("rows_dropped_by_watermark")).as[Long].head()
    assert(dropped === 0L, "90-day horizon must drop nothing as late")
    val totalIn = summary.agg(sum("num_input_rows")).as[Long].head()
    val totalOut = spark.read.parquet(out).count()
    val batchDistinct = Tables.events(spark, sfDir)
      .select(
        substring(date_trunc("hour", col("ts")).cast("string"), 1, 13)
          .as("hour"),
        col("user_id"), col("event_type"))
      .distinct().count()
    val batchTotal = Tables.events(spark, sfDir).count()
    assert(totalIn === batchTotal, "every fixture row must enter exactly once")
    assert(totalOut === batchDistinct)
    assert(totalIn - totalOut === batchTotal - batchDistinct,
      "input minus output must equal exactly the duplicate count")
    // state rows grow to the distinct-key count by the final batch
    val lastState = summary.orderBy(col("batch_id").desc)
      .select("state_rows_total").as[Long].head()
    assert(lastState === batchDistinct,
      "watermark-free horizon: state must hold every distinct key")
  }

  test("state-store contract: changelog checkpointing engages, native memory bounded") {
    // (a) the conf surface runAvailableNowTo pins: RocksDB provider,
    // per-batch changelog deltas, and a HARD native-memory budget shared
    // by every store in the JVM — the knob that keeps 32-core local runs
    // (and 100x-state executors) from open-ended off-heap growth
    val confs = EventsStream.streamingRunConfs(Some(4)).toMap
    assert(confs("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDBStateStoreProvider"))
    assert(confs(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
      === "true")
    assert(confs("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage")
      === "true")
    assert(confs("spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB")
      .toInt >= 64)
    // the budget override fails LOUDLY on garbage: a silent fall-through
    // to the default would mask misconfiguration of the exact knob the
    // round-11 drift was traced to (a deliberate capacity decision)
    assert(EventsStream.parseRocksDbMemMb(None) === 512)
    assert(EventsStream.parseRocksDbMemMb(Some("256")) === 256)
    intercept[IllegalArgumentException] {
      EventsStream.parseRocksDbMemMb(Some("lots"))
    }
    intercept[IllegalArgumentException] {
      EventsStream.parseRocksDbMemMb(Some("32"))
    }
    // (b) the changelog contract ENGAGES through the production runner —
    // not just a conf string: a multi-batch run must leave per-version
    // .changelog delta files in the checkpoint's state directory (a
    // silent fallback to full per-batch snapshots would pass every
    // output check while re-introducing the per-commit snapshot cost)
    val landing = Files.createTempDirectory("chlog_in").toString
    spark.read.parquet(s"$sfDir/events.parquet")
      .repartitionByRange(3, col("ts"))
      .write.mode("overwrite").parquet(landing)
    val ckpt = Files.createTempDirectory("chlog_ckpt").toString
    val out = Files.createTempDirectory("chlog_out").toString
    val keyed = EventsStream
      .readEventsStream(spark, landing, maxFilesPerTrigger = Some(1))
      .withColumn("hour",
        substring(date_trunc("hour", col("ts")).cast("string"), 1, 13))
    EventsStream.runAvailableNowTo(
      EventsStream.dedupEventsByKey(
        keyed, Seq("hour", "user_id", "event_type"), "90 days")
        .select(col("hour"), col("user_id"), col("event_type")),
      ckpt, out)
    val changelogs = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      .filter(p => p.toString.endsWith(".changelog")).count()
    assert(changelogs > 0,
      s"multi-batch RocksDB run must checkpoint .changelog deltas under $ckpt")
  }

  test("stream-stream interval join pairs clicks with following views") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:05:00"), 1, "view", 2.0),  // within 10 min -> joins
      Event(3, ts("2024-01-01 10:20:00"), 1, "view", 3.0),  // outside window
      Event(4, ts("2024-01-01 10:02:00"), 2, "view", 4.0))  // other user
    val q = EventsStream.clickToViewJoin(mem.toDF(), windowMinutes = 10)
      .writeStream.outputMode("append").format("memory")
      .queryName("ssjoin_test").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssjoin_test").collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("view_id"))).toSet
      assert(got === Set((1L, 2L)))
    } finally q.stop()
  }

  test("sessionize splits on gap and aggregates per session") {
    val events = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
      Event(2, ts("2024-01-01 10:10:00"), 7, "click", 2.0),
      Event(3, ts("2024-01-01 12:00:00"), 7, "view", 4.0), // >30min gap -> new session
      Event(4, ts("2024-01-01 10:00:00"), 8, "view", 8.0)).toDS()
    val sessions = EventsStream.sessionize(spark, events, gapMinutes = 30)
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    assert(sessions.length === 3)
    val s7 = sessions.filter(_.user_id == 7)
    assert(s7(0).n_events === 2 && s7(0).total_value === 3.0)
    assert(s7(1).n_events === 1 && s7(1).total_value === 4.0)
    assert(sessions.count(_.user_id == 8) === 1)
  }

  test("upsert merge: keyed last-wins, partition pruning, replay is a no-op") {
    import graft.streaming.UpsertSink
    val target = Files.createTempDirectory("graft_upsert_tbl").toString
    val events = Tables.events(spark, sfDir)
    val half1 = events.filter(col("event_id") % 2 === 0)
    val half2 = events.filter(col("event_id") % 2 === 1)
    UpsertSink.mergeLatestBatch(half1, target, nBuckets = 8)
    UpsertSink.mergeLatestBatch(half2, target, nBuckets = 8)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("event_id").desc)
    val expected = events
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
    def table() = spark.read.parquet(target)
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
    assert(table().exceptAll(expected).isEmpty &&
           expected.exceptAll(table()).isEmpty,
      "two-batch upsert must equal the one-shot argmax")
    // crash-replay simulation: re-merging an already-committed batch
    // must leave the table bit-identical (the idempotence exactly-once
    // rests on)
    val before = table().collect().toSet
    UpsertSink.mergeLatestBatch(half1, target, nBuckets = 8)
    assert(table().collect().toSet === before,
      "replaying a committed batch must be a no-op")
    // a batch touching ONE user must not rewrite unaffected partitions:
    // bucket files of untouched partitions stay byte-identical
    val oneUser = events.filter(col("user_id") === 1).limit(1)
    val bucketOf1 = 1 % 8
    def partFiles(b: Int): Set[String] = {
      val d = new java.io.File(s"$target/u_bucket=$b")
      Option(d.listFiles()).map(_.filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName + ":" + f.length()).toSet).getOrElse(Set.empty)
    }
    val untouchedBefore = (0 until 8).filter(_ != bucketOf1).map(partFiles)
    UpsertSink.mergeLatestBatch(oneUser, target, nBuckets = 8)
    val untouchedAfter = (0 until 8).filter(_ != bucketOf1).map(partFiles)
    assert(untouchedAfter === untouchedBefore,
      "dynamic overwrite must leave unaffected bucket partitions alone")
  }

  test("upsert merge rejects reserved columns and null keys loudly") {
    import graft.streaming.UpsertSink
    val target = Files.createTempDirectory("graft_upsert_guard").toString
    val events = Tables.events(spark, sfDir).limit(10)
    // reserved partition column
    intercept[IllegalArgumentException] {
      UpsertSink.mergeLatestBatch(
        events.withColumn("u_bucket", lit(1)), target)
    }
    // a null key must fail the batch, not vanish into the
    // default-partition bucket
    val withNull = events.select(
      when(col("event_id") === events.select(col("event_id")).first().getLong(0),
        lit(null).cast("long")).otherwise(col("user_id")).as("user_id"),
      col("event_id"), col("ts"), col("event_type"), col("value"))
    val e = intercept[Exception] {
      UpsertSink.mergeLatestBatch(withNull, target)
    }
    assert(e.getMessage != null)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(target))
  }
}
