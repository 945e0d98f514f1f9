package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.kql.{Catalog, Kql}
import graft.streaming.Progressive

/** Progressive-results layer + KQL sink steps: the analog of the reference's
  * partial streams (`partial_stream.rs`) and tee/write sinks.
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("streaming aggregation refines as new files arrive (partial results)") {
    val dir = Files.createTempDirectory("graft_stream").toString
    val batch1 = Seq(
      ("2024-01-01 00:10:00", "error"), ("2024-01-01 00:20:00", "error"),
      ("2024-01-01 01:10:00", "click"))
      .toDF("ts", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))
    batch1.coalesce(1).write.mode("append").parquet(dir)

    val q = Progressive.aggregateStream(
      spark, dir, batch1.schema,
      df => df.groupBy("event_type").agg(count(lit(1)).as("n")),
      queryName = "prog_counts", debounceMs = 100L)
    try {
      q.processAllAvailable()
      val snap1 = spark.table("prog_counts").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(snap1 == Map("error" -> 2L, "click" -> 1L))

      // second source "completes" → the aggregate refines (miso's
      // PartialStreamLog → updated snapshot)
      Seq(("2024-01-01 02:00:00", "error"))
        .toDF("ts", "event_type")
        .withColumn("ts", col("ts").cast("timestamp"))
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val snap2 = spark.table("prog_counts").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(snap2 == Map("error" -> 3L, "click" -> 1L))
    } finally q.stop()
  }

  test("sliding engagement refines per-bin distinct counts under watermark") {
    // round-8 streaming parity for session_count/activity_engagement:
    // 1-minute bins, 2-bin lookback. Batch semantics (kql_session_count):
    // an id contributes to its own bin and the next one.
    val dir = Files.createTempDirectory("graft_stream_eng").toString
    val batch1 = Seq(
      (1L, "2024-01-01 00:00:30"), (2L, "2024-01-01 00:01:10"))
      .toDF("user_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    batch1.coalesce(1).write.mode("append").parquet(dir)

    val q = Progressive.aggregateStream(
      spark, dir, batch1.schema,
      df => Progressive.slidingEngagement(
        df, "user_id", "ts", binSeconds = 60L, lookbackBins = 2,
        watermark = "10 minutes"),
      queryName = "prog_eng", debounceMs = 100L, outputMode = "update")
    try {
      q.processAllAvailable()
      // update-mode memory sink appends refinements; counts only grow,
      // so the max per bin IS the latest snapshot
      def snapshot(): Map[String, Long] = spark.table("prog_eng").collect()
        .groupBy(_.getTimestamp(0).toString)
        .map { case (k, rs) => k -> rs.map(_.getLong(1)).max }
      // u1 → bins 00:00,00:01; u2 → 00:01,00:02
      assert(snapshot() == Map(
        "2024-01-01 00:00:00.0" -> 1L,
        "2024-01-01 00:01:00.0" -> 2L,
        "2024-01-01 00:02:00.0" -> 1L))

      // a later micro-batch REFINES bins 00:01/00:02 (u3 lands in 00:01)
      Seq((3L, "2024-01-01 00:01:20")).toDF("user_id", "ts")
        .withColumn("ts", col("ts").cast("timestamp"))
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      assert(snapshot() == Map(
        "2024-01-01 00:00:00.0" -> 1L,
        "2024-01-01 00:01:00.0" -> 3L,
        "2024-01-01 00:02:00.0" -> 2L))

      // the duplicate-id path: u1 again in 00:00 must NOT refine anything
      Seq((1L, "2024-01-01 00:00:45")).toDF("user_id", "ts")
        .withColumn("ts", col("ts").cast("timestamp"))
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      assert(snapshot() == Map(
        "2024-01-01 00:00:00.0" -> 1L,
        "2024-01-01 00:01:00.0" -> 3L,
        "2024-01-01 00:02:00.0" -> 2L))
    } finally q.stop()
  }

  test("new-users-per-bin counts first appearances only (activity_counts)") {
    // round-9 streaming parity for activity_counts' new_dcount: 1-minute
    // bins; an id counts in the bin of its FIRST arrival and never again
    // (within the watermark horizon)
    val dir = Files.createTempDirectory("graft_stream_new").toString
    val batch1 = Seq(
      (1L, "2024-01-01 00:00:30"), (2L, "2024-01-01 00:00:40"),
      (1L, "2024-01-01 00:01:10"))
      .toDF("user_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    batch1.coalesce(1).write.mode("append").parquet(dir)

    val q = Progressive.aggregateStream(
      spark, dir, batch1.schema,
      df => Progressive.newUsersPerBin(
        df, "user_id", "ts", binSeconds = 60L, watermark = "10 minutes"),
      queryName = "prog_new", debounceMs = 100L, outputMode = "update")
    try {
      q.processAllAvailable()
      def snapshot(): Map[String, Long] = spark.table("prog_new").collect()
        .groupBy(_.getTimestamp(0).toString)
        .map { case (k, rs) => k -> rs.map(_.getLong(1)).max }
      // u1 and u2 are new in 00:00; u1's 00:01 event is NOT new
      assert(snapshot() == Map("2024-01-01 00:00:00.0" -> 2L))

      // refinement: u3 first appears in 00:00 (late but inside the
      // watermark) and u4 in 00:01; u2 reappears — not new
      Seq((3L, "2024-01-01 00:00:50"), (4L, "2024-01-01 00:01:30"),
        (2L, "2024-01-01 00:01:40"))
        .toDF("user_id", "ts")
        .withColumn("ts", col("ts").cast("timestamp"))
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      assert(snapshot() == Map(
        "2024-01-01 00:00:00.0" -> 3L,
        "2024-01-01 00:01:00.0" -> 1L))

      // state eviction (the r9→r10 fix: dropDuplicatesWithinWatermark):
      // u5 at 00:30 advances the watermark to 00:20 — past every earlier
      // id's 10-minute horizon, so their dedup state is dropped
      Seq((5L, "2024-01-01 00:30:00")).toDF("user_id", "ts")
        .withColumn("ts", col("ts").cast("timestamp"))
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      assert(snapshot() == Map(
        "2024-01-01 00:00:00.0" -> 3L,
        "2024-01-01 00:01:00.0" -> 1L,
        "2024-01-01 00:30:00.0" -> 1L))
      // u1's comeback past the horizon counts as NEW again (bounded-state
      // trade, as documented); u5's in-horizon repeat does NOT
      Seq((1L, "2024-01-01 00:31:00"), (5L, "2024-01-01 00:31:10"))
        .toDF("user_id", "ts")
        .withColumn("ts", col("ts").cast("timestamp"))
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      assert(snapshot() == Map(
        "2024-01-01 00:00:00.0" -> 3L,
        "2024-01-01 00:01:00.0" -> 1L,
        "2024-01-01 00:30:00.0" -> 1L,
        "2024-01-01 00:31:00.0" -> 1L))
    } finally q.stop()
  }

  test("extended aggregates run on the streaming (partial) path") {
    val dir = Files.createTempDirectory("graft_stream_ext").toString
    val data = Seq(("a", 1.0), ("a", 4.0), ("b", 9.0)).toDF("k", "v")
    data.coalesce(1).write.mode("append").parquet(dir)
    val cat = new Catalog(spark)
    cat.register("sx", spark.read.parquet(dir))
    cat.registerStream("sx",
      spark.readStream.schema(data.schema).parquet(dir))
    val parsed = Kql.parse(
      "sx | summarize st = make_set(k), sd = stdev(v), am = arg_max(v, k), s = sumif(v, v > 1.0)")
    val df = new graft.kql.Compiler(spark, cat, parsed.lets,
      streamFirstScan = true).compile(parsed.query)
    val q = df.writeStream.outputMode("complete")
      .format("memory").queryName("prog_ext").start()
    try {
      q.processAllAvailable()
      val r = spark.table("prog_ext").collect().head
      assert(r.getSeq[String](0) == Seq("a", "b"))
      assert(math.abs(r.getDouble(1) - math.sqrt(
        ((1.0 - 14.0 / 3) * (1.0 - 14.0 / 3) + (4.0 - 14.0 / 3) * (4.0 - 14.0 / 3) +
          (9.0 - 14.0 / 3) * (9.0 - 14.0 / 3)) / 2)) < 1e-9)
      assert(r.getString(2) == "b") // arg_max(v=9)
      assert(r.getDouble(3) == 13.0)
    } finally q.stop()
  }

  test("heavy-hitters sketch aggregates run on the streaming path") {
    // topk_approx is a mergeable ObjectHashAggregate (DataSketches
    // frequent-items) — unlike exact dcount it stays partial-eligible
    // and refines across micro-batches
    val dir = Files.createTempDirectory("graft_stream_topk").toString
    val b1 = Seq("a", "a", "b").toDF("k")
    b1.coalesce(1).write.mode("append").parquet(dir)
    val cat = new Catalog(spark)
    cat.register("tk", spark.readStream.schema(b1.schema).parquet(dir))
    val df = Kql.run(spark, cat,
      "tk | summarize t = topk_approx(k, 5)")
    assert(df.isStreaming)
    val q = df.writeStream.outputMode("complete")
      .format("memory").queryName("stream_topk").start()
    try {
      q.processAllAvailable()
      def counts(): Map[String, Long] =
        spark.table("stream_topk").collect().head.getSeq[
          org.apache.spark.sql.Row](0)
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts() == Map("a" -> 2L, "b" -> 1L))
      // the sketch REFINES: a second micro-batch merges into the counts
      Seq("b", "c").toDF("k").coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      assert(counts() == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    } finally q.stop()
    import graft.server.QueryServer
    assert(QueryServer.partialEligible(Kql.parse(
      "events | summarize t = topk_approx(event_type, 5)")))
  }

  test("exact-distinct queries are NOT partial-eligible (streaming can't run them)") {
    import graft.server.QueryServer
    // dcount → fall back to batch final-only instead of crashing mid-stream
    assert(!QueryServer.partialEligible(Kql.parse(
      "events | summarize d = dcount(user_id) by event_type")))
    assert(!QueryServer.partialEligible(Kql.parse(
      "events | summarize d = dcountif(user_id, value > 1.0) by event_type")))
    // the approximate form streams fine and stays eligible
    assert(QueryServer.partialEligible(Kql.parse(
      "events | summarize d = dcount_approx(user_id) by event_type")))
    assert(QueryServer.partialEligible(Kql.parse(
      "events | summarize st = make_set(event_type), n = count() by user_id")))
  }

  test("windowed streaming bin with watermark bounds state") {
    val dir = Files.createTempDirectory("graft_stream2").toString
    val data = Seq(
      ("2024-01-01 00:05:00", "a"), ("2024-01-01 00:55:00", "a"),
      ("2024-01-01 01:05:00", "b"))
      .toDF("ts", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))
    data.coalesce(1).write.mode("append").parquet(dir)
    val src = spark.readStream.schema(data.schema).parquet(dir)
    val agg = Progressive.binnedCounts(src, "ts", "1 hour", "10 minutes",
      extraKeys = Seq("event_type"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("prog_bins").start()
    try {
      q.processAllAvailable()
      val got = spark.table("prog_bins").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
        .toSet
      assert(got == Set(
        ("2024-01-01 00:00:00.0", "a", 2L),
        ("2024-01-01 01:00:00.0", "b", 1L)))
    } finally q.stop()
  }

  test("kql write step is terminal and lands rows in the sink") {
    val sink = Files.createTempDirectory("graft_sink").toString + "/out"
    val cat = new Catalog(spark)
    cat.register("src", Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "tag"))
    cat.registerSink("dest", sink)
    val out = Kql.run(spark, cat, "src | where tag == 'a' | write dest")
    assert(out.count() == 0) // write emits nothing downstream
    assert(spark.read.parquet(sink).count() == 2)
  }

  test("kql tee step writes and passes rows through") {
    val sink = Files.createTempDirectory("graft_sink2").toString + "/out"
    val cat = new Catalog(spark)
    cat.register("src", Seq((1L, "a"), (2L, "b")).toDF("id", "tag"))
    cat.registerSink("dest", sink)
    val out = Kql.run(spark, cat, "src | tee dest | summarize n=count()")
    assert(out.collect()(0).getLong(0) == 2L)
    assert(spark.read.parquet(sink).count() == 2)
  }

  test("explain of a write/tee query does not mutate the sink") {
    val sink = Files.createTempDirectory("graft_sink3").toString + "/out"
    val cat = new Catalog(spark)
    cat.register("src", Seq((1L, "a")).toDF("id", "tag"))
    cat.registerSink("dest", sink)
    Kql.explain(spark, cat, "src | write dest")
    assert(!new java.io.File(sink).exists(), "explain must not write the sink")
    Kql.run(spark, cat, "src | write dest").count()
    assert(spark.read.parquet(sink).count() == 1)
  }

  test("batch sessionization: gap splits, boundary semantics, cents sum") {
    import graft.functions.Sessionize
    val ts = udf((s: String) => java.sql.Timestamp.valueOf(s))
    val events = Seq(
      (1L, "2024-01-01 00:00:00", 1.25),
      (1L, "2024-01-01 00:10:00", 2.50),  // same session (10 min < 30 min)
      (1L, "2024-01-01 00:40:00", 4.00),  // exactly at the boundary: MERGES
      (1L, "2024-01-01 02:00:00", 8.00),  // past the gap => second session
      (2L, "2024-01-01 00:05:00", 0.10))
      .toDF("user_id", "raw_ts", "value")
      .withColumn("ts", ts(col("raw_ts"))).drop("raw_ts")
    val got = Sessionize.sessions(events, "user_id", "ts", 1800L, "value")
      .orderBy("user_id", "session_start")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == Seq(
      (1L, "2024-01-01 00:00:00.0", "2024-01-01 01:10:00.0", 3L, 775L),
      (1L, "2024-01-01 02:00:00.0", "2024-01-01 02:30:00.0", 1L, 800L),
      (2L, "2024-01-01 00:05:00.0", "2024-01-01 00:35:00.0", 1L, 10L)))
  }

  test("streaming sessionization closes sessions across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{ClosedSession, SessionEvent, StreamingSessionize}
    implicit val sqlCtx = spark.sqlContext
    def ev(uid: Long, s: String, v: Double) =
      SessionEvent(uid, java.sql.Timestamp.valueOf(s), v)
    val input = MemoryStream[SessionEvent]
    val sessions = StreamingSessionize.sessions(input.toDS(), gapSeconds = 1800L)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("stream_sessions").start()
    try {
      // batch 1: two events inside one session — nothing closes yet
      input.addData(
        ev(1L, "2024-01-01 00:00:00", 1.25), ev(1L, "2024-01-01 00:10:00", 2.50))
      q.processAllAvailable()
      assert(spark.table("stream_sessions").count() == 0)
      // batch 2: an event past the gap closes the open session and emits it
      input.addData(ev(1L, "2024-01-01 02:00:00", 4.00))
      q.processAllAvailable()
      val got = spark.table("stream_sessions").as[ClosedSession].collect().toSeq
      assert(got == Seq(ClosedSession(1L,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 00:40:00"), 2L, 375L)))
      // matches the batch operator on the same closed window
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks within the window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingJoin
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val imps = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamingJoin.intervalJoin(
      imps.toDS().toDF("ad_id", "ts"), clicks.toDS().toDF("ad_id", "ts"),
      "ad_id", "ts", "ts", windowSeconds = 600L,
      leftWatermark = "30 seconds", rightWatermark = "30 seconds")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("stream_attrib").start()
    try {
      // impressions arrive, then clicks: ad 1 clicked inside the window,
      // ad 2 clicked too late (11 min), ad 3 never clicked
      imps.addData((1L, t("2024-01-01 00:00:00")),
        (2L, t("2024-01-01 00:00:00")), (3L, t("2024-01-01 00:00:00")))
      clicks.addData((1L, t("2024-01-01 00:03:00")),
        (2L, t("2024-01-01 00:11:00")))
      q.processAllAvailable()
      val got = spark.table("stream_attrib").collect()
        .map(r => (r.getLong(0), r.getDouble(3))).toSet
      assert(got == Set((1L, 180.0)))
      // a second click on ad 1 still inside the window ALSO matches
      // (intervalJoin is the raw pair stream; firstTouch dedups)
      clicks.addData((1L, t("2024-01-01 00:08:00")))
      q.processAllAvailable()
      assert(spark.table("stream_attrib").count() == 2)
    } finally q.stop()
  }

  test("stream-stream first-touch keeps one click per impression") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingJoin
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val imps = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val ft = StreamingJoin.firstTouch(
      imps.toDS().toDF("ad_id", "ts"), clicks.toDS().toDF("ad_id", "ts"),
      "ad_id", "ts", "ts", windowSeconds = 600L,
      leftWatermark = "30 seconds", rightWatermark = "30 seconds")
    val q = ft.writeStream.outputMode("append")
      .format("memory").queryName("stream_ft").start()
    try {
      imps.addData((7L, t("2024-01-01 00:00:00")))
      clicks.addData((7L, t("2024-01-01 00:02:00")),
        (7L, t("2024-01-01 00:09:00")))
      q.processAllAvailable()
      val got = spark.table("stream_ft").collect()
        .map(r => (r.getLong(0), r.getDouble(3)))
      assert(got.length == 1 && got.head._1 == 7L && got.head._2 == 120.0)
    } finally q.stop()
  }

  test("streaming funnel emits conversions across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{Conversion, FunnelEvent, StreamingFunnel}
    implicit val sqlCtx = spark.sqlContext
    def ev(uid: Long, s: String, t: String) =
      FunnelEvent(uid, java.sql.Timestamp.valueOf(s), t)
    val input = MemoryStream[FunnelEvent]
    val conv = StreamingFunnel.conversions(
      input.toDS(), "view", "purchase", windowSeconds = 3600L)
    val q = conv.writeStream.outputMode("append")
      .format("memory").queryName("stream_funnel").start()
    try {
      // batch 1: u1 views (pending), u2 purchases with no view (nothing)
      input.addData(
        ev(1L, "2024-01-01 00:00:00", "view"),
        ev(1L, "2024-01-01 00:05:00", "view"), // earliest start kept
        ev(2L, "2024-01-01 00:00:00", "purchase"))
      q.processAllAvailable()
      assert(spark.table("stream_funnel").count() == 0)
      // batch 2: u1 converts (state crossed the batch boundary); a later
      // purchase finds no pending start
      input.addData(
        ev(1L, "2024-01-01 00:30:00", "purchase"),
        ev(1L, "2024-01-01 00:40:00", "purchase"))
      q.processAllAvailable()
      val got = spark.table("stream_funnel").as[Conversion].collect().toSeq
      assert(got == Seq(Conversion(1L,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 00:30:00"), 1800L)))
      // batch 3: an out-of-window second only CLEARS the expired start
      input.addData(
        ev(3L, "2024-01-01 00:00:00", "view"),
        ev(3L, "2024-01-01 02:00:00", "purchase"))
      q.processAllAvailable()
      assert(spark.table("stream_funnel").count() == 1)
      // the cleared state lets a fresh pair convert
      input.addData(
        ev(3L, "2024-01-01 03:00:00", "view"),
        ev(3L, "2024-01-01 03:10:00", "purchase"))
      q.processAllAvailable()
      assert(spark.table("stream_funnel").count() == 2)
    } finally q.stop()
  }

  test("kql summarize compiles against a streaming source (update mode)") {
    val dir = Files.createTempDirectory("graft_stream3").toString
    val data = Seq(("x", 1.0), ("y", 2.0), ("x", 3.0)).toDF("k", "v")
    data.coalesce(1).write.mode("append").parquet(dir)
    val cat = new Catalog(spark)
    cat.register("stream_src", spark.readStream.schema(data.schema).parquet(dir))
    val agg = Kql.run(spark, cat, "stream_src | summarize n=count(), s=sum(v) by k")
    assert(agg.isStreaming)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("kql_stream").start()
    try {
      q.processAllAvailable()
      val got = spark.table("kql_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == Set(("x", 2L, 4.0), ("y", 1L, 2.0)))
    } finally q.stop()
  }
}
