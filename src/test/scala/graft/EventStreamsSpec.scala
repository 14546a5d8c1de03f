package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Drives the streaming twin of q22 through a real StreamExecution:
  * MemoryStream micro-batches + watermark + tumbling window, checked
  * against the batch transform on the same rows, plus the
  * late-data-drop semantics the watermark promises.
  */
class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s)

  test("streaming sliding counts equal the batch transform (complete mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (ts("2024-01-01 00:10:00"), "click", 1.0),
      (ts("2024-01-01 00:40:00"), "click", 2.0), // second slide of hour 0
      (ts("2024-01-01 01:05:00"), "view", 3.0),
      (ts("2024-01-01 01:29:59"), "click", 4.0)) // slide boundary edge
    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = stream.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.slidingCounts(df)
      .writeStream.format("memory").queryName("sliding_complete")
      .outputMode("complete").start()
    try {
      stream.addData(rows.take(2))
      q.processAllAvailable()
      stream.addData(rows.drop(2))
      q.processAllAvailable()
      val streaming = spark.table("sliding_complete")
        .orderBy("window_start", "event_type")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSeq
      val batch = EventStreams.slidingCounts(
        rows.toDF("ts", "event_type", "value"))
        .orderBy("window_start", "event_type")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSeq
      assert(streaming == batch)
      // sliding 1h/30min: every event lands in exactly two windows
      assert(batch.map(_._3).sum == rows.size * 2)
    } finally q.stop()
  }

  test("streaming tumbling counts equal the batch transform (complete mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (ts("2024-01-01 00:10:00"), "click", 1.0),
      (ts("2024-01-01 00:50:00"), "click", 2.0),
      (ts("2024-01-01 01:05:00"), "view", 3.0),
      (ts("2024-01-01 01:59:00"), "click", 4.0),
      (ts("2024-01-01 02:01:00"), "view", 5.0))

    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = stream.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.tumblingCounts(df)
      .writeStream.format("memory").queryName("agg_complete")
      .outputMode("complete").start()
    try {
      stream.addData(rows.take(2))
      q.processAllAvailable()
      stream.addData(rows.drop(2))
      q.processAllAvailable()

      val streaming = spark.table("agg_complete")
        .orderBy("window_start", "event_type")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSeq
      val batch = EventStreams.tumblingCounts(
        rows.toDF("ts", "event_type", "value"))
        .orderBy("window_start", "event_type")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSeq
      assert(streaming == batch)
      assert(batch.map(_._3).sum == rows.size) // every event counted once
    } finally q.stop()
  }

  test("watermark drops events later than the 2h bound (append mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = stream.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.tumblingCountsStreaming(df)
      .writeStream.format("memory").queryName("agg_append")
      .outputMode("append").start()
    try {
      stream.addData(Seq((ts("2024-01-01 00:30:00"), "click", 1.0)))
      q.processAllAvailable()
      // advance event time far enough that watermark (max ts - 2h)
      // passes the 00:00 window end → that window finalizes + emits
      stream.addData(Seq((ts("2024-01-01 05:00:00"), "click", 1.0)))
      q.processAllAvailable()
      // this event is 4.5h late — behind the watermark → dropped
      stream.addData(Seq((ts("2024-01-01 00:31:00"), "click", 99.0)))
      q.processAllAvailable()
      // close out the 05:00 window too
      stream.addData(Seq((ts("2024-01-01 09:00:00"), "tick", 0.0)))
      q.processAllAvailable()

      val out = spark.table("agg_append")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSeq
      val w0 = out.filter(_._1 == ts("2024-01-01 00:00:00"))
      assert(w0 == Seq((ts("2024-01-01 00:00:00"), "click", 1L, 1.0)),
        s"late event must not reopen the finalized window; got $out")
    } finally q.stop()
  }

  test("stateful sessionization closes sessions and matches batch session_window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.SessionEvent
    // user 1: two sessions (65 min apart); user 2: one session whose
    // events SPAN micro-batches (state must carry across batches)
    val batch1 = Seq(
      SessionEvent(1L, ts("2024-01-01 00:00:00"), 1.0),
      SessionEvent(1L, ts("2024-01-01 00:10:00"), 2.0),
      SessionEvent(2L, ts("2024-01-01 00:05:00"), 5.0))
    val batch2 = Seq(
      SessionEvent(2L, ts("2024-01-01 00:20:00"), 7.0), // merges across batches
      SessionEvent(1L, ts("2024-01-01 01:15:00"), 3.0)) // 65min gap → new session
    val sentinel1 = Seq(SessionEvent(999L, ts("2024-01-01 12:00:00"), 0.0))
    val sentinel2 = Seq(SessionEvent(999L, ts("2024-01-01 12:01:00"), 0.0))

    val stream = MemoryStream[SessionEvent]
    val q = EventStreams.sessionizeStateful(stream.toDS())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      Seq(batch1, batch2, sentinel1, sentinel2).foreach { b =>
        stream.addData(b); q.processAllAvailable()
      }
      // sentinel1 advances the watermark past every real session's
      // end + gap; sentinel2 triggers the batch where timeouts fire
      val got = spark.table("sessions_out")
        .filter(col("user_id") < 999)
        .orderBy("user_id", "session_start")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
        .collect().toSeq

      // batch twin: the q27 session_window transform on the same rows
      val expected = (batch1 ++ batch2).toDS().toDF()
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), col("total_value"))
        .orderBy("user_id", "session_start")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
        .collect().toSeq

      assert(got == expected,
        s"stateful sessions $got must equal batch session_window $expected")
      assert(got.map(_._1).count(_ == 1L) == 2, "user 1 has two sessions")
      assert(got.filter(_._1 == 2L).map(_._4) == Seq(2L),
        "user 2's cross-batch events merged into one session")
    } finally q.stop()
  }

  test("session gap semantics: exactly-30min gap merges, 30:01 splits") {
    // pins Spark's end-INCLUSIVE session_window boundary (an event at
    // exactly prev + gap merges; the q27 oracle uses `> gap` to split)
    // for BOTH the batch built-in and the stateful sessionizer
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.SessionEvent
    val rows = Seq(
      SessionEvent(7L, ts("2024-01-01 00:00:00"), 1.0),
      SessionEvent(7L, ts("2024-01-01 00:30:00"), 1.0), // exactly gap → merge
      SessionEvent(8L, ts("2024-01-01 00:00:00"), 1.0),
      SessionEvent(8L, ts("2024-01-01 00:30:01"), 1.0)) // past gap → split
    val batch = rows.toDS().toDF()
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"))
      .orderBy("user_id", "n")
      .as[(Long, Long)].collect().toSeq
    assert(batch == Seq((7L, 2L), (8L, 1L), (8L, 1L)),
      s"batch session_window boundary moved: $batch")

    val stream = MemoryStream[SessionEvent]
    val q = EventStreams.sessionizeStateful(stream.toDS())
      .writeStream.format("memory").queryName("gap_edge")
      .outputMode("append").start()
    try {
      stream.addData(rows); q.processAllAvailable()
      stream.addData(Seq(SessionEvent(999L, ts("2024-01-01 12:00:00"), 0.0)))
      q.processAllAvailable()
      stream.addData(Seq(SessionEvent(999L, ts("2024-01-01 12:01:00"), 0.0)))
      q.processAllAvailable()
      val got = spark.table("gap_edge").filter(col("user_id") < 999)
        .select(col("user_id"), col("n_events"))
        .orderBy("user_id", "n_events")
        .as[(Long, Long)].collect().toSeq
      assert(got == batch, s"stateful boundary differs from batch: $got")
    } finally q.stop()
  }

  test("stateful sessionization handles out-of-order cross-batch events") {
    // regression: an event EARLIER than the open session (but inside
    // the watermark) must extend the session start downward when within
    // gap, or form its own past session when not — matching batch
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.SessionEvent
    val batch1 = Seq(
      SessionEvent(1L, ts("2024-01-01 10:00:00"), 1.0),
      SessionEvent(2L, ts("2024-01-01 10:00:00"), 1.0),
      SessionEvent(3L, ts("2024-01-01 10:00:00"), 1.0),
      SessionEvent(3L, ts("2024-01-01 10:50:00"), 1.0)) // two open sessions
    val batch2 = Seq(
      SessionEvent(1L, ts("2024-01-01 09:50:00"), 2.0), // 10min before start → merge
      SessionEvent(2L, ts("2024-01-01 09:00:00"), 2.0), // 60min before → own session
      SessionEvent(3L, ts("2024-01-01 10:25:00"), 2.0)) // bridges 10:00 and 10:50
    val stream = MemoryStream[SessionEvent]
    val q = EventStreams.sessionizeStateful(stream.toDS())
      .writeStream.format("memory").queryName("ooo_sessions")
      .outputMode("append").start()
    try {
      Seq(batch1, batch2,
        Seq(SessionEvent(999L, ts("2024-01-01 22:00:00"), 0.0)),
        Seq(SessionEvent(999L, ts("2024-01-01 22:01:00"), 0.0))).foreach { b =>
        stream.addData(b); q.processAllAvailable()
      }
      val got = spark.table("ooo_sessions").filter(col("user_id") < 999)
        .orderBy("user_id", "session_start")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
        .collect().toSeq
      val expected = (batch1 ++ batch2).toDS().toDF()
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), col("total_value"))
        .orderBy("user_id", "session_start")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
        .collect().toSeq
      assert(got == expected, s"stateful $got != batch $expected")
      assert(got.filter(_._1 == 3L).map(_._4) == Seq(3L),
        "the bridging event must fuse user 3's two open sessions")
    } finally q.stop()
  }

  test("streaming dedup keeps first event per id with watermark-bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = stream.toDF().toDF("event_id", "ts", "value")
    val q = EventStreams.dedupStreaming(df)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        (1L, ts("2024-01-01 00:00:00"), 1.0),
        (1L, ts("2024-01-01 00:01:00"), 99.0), // same batch dup → dropped
        (2L, ts("2024-01-01 00:02:00"), 2.0)))
      q.processAllAvailable()
      stream.addData(Seq(
        (1L, ts("2024-01-01 00:30:00"), 98.0), // cross-batch dup within
        (3L, ts("2024-01-01 00:31:00"), 3.0))) // watermark → dropped
      q.processAllAvailable()

      val out = spark.table("dedup_out")
        .as[(Long, java.sql.Timestamp, Double)].collect().toSeq.sortBy(_._1)
      assert(out.map(_._1) == Seq(1L, 2L, 3L), s"one row per id, got $out")
      assert(out.head._3 == 1.0, "kept the FIRST event for id 1")
    } finally q.stop()
  }

  test("stream-stream interval join pairs within the bound and matches batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (2L, ts("2024-01-01 00:00:00"), 2.0))
    val views = Seq(
      (1L, ts("2024-01-01 00:10:00"), 10.0), // within 30min → pairs
      (1L, ts("2024-01-01 00:45:00"), 11.0), // past the bound → no pair
      (3L, ts("2024-01-01 00:05:00"), 12.0)) // other user → no pair

    val ls = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val rs = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = EventStreams.intervalJoinStreaming(
      ls.toDF().toDF("user_id", "ts", "value"),
      rs.toDF().toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("sj_out")
      .outputMode("append").start()
    try {
      ls.addData(clicks); rs.addData(views)
      q.processAllAvailable()
      val got = spark.table("sj_out")
        .orderBy("user_id", "left_ts", "right_ts")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Double, Double)]
        .collect().toSeq
      val batch = EventStreams.intervalJoinStreaming(
        clicks.toDF("user_id", "ts", "value"),
        views.toDF("user_id", "ts", "value"))
        .orderBy("user_id", "left_ts", "right_ts")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Double, Double)]
        .collect().toSeq
      assert(got == batch, s"stream $got != batch $batch")
      assert(got.map(t => (t._1, t._5)) == Seq((1L, 10.0)),
        s"exactly the in-window same-user pair must survive: $got")
    } finally q.stop()
  }

  test("left-outer interval join emits NULL rows only after the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val rs = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = EventStreams.intervalJoinStreamingOuter(
      ls.toDF().toDF("user_id", "ts", "value"),
      rs.toDF().toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("soj_out")
      .outputMode("append").start()
    try {
      // user 1 matches; user 2 has no right row — its NULL emission
      // must wait for the watermark, not the end of the batch
      ls.addData(Seq(
        (1L, ts("2024-01-01 00:00:00"), 1.0),
        (2L, ts("2024-01-01 00:00:00"), 2.0)))
      rs.addData(Seq((1L, ts("2024-01-01 00:10:00"), 10.0)))
      q.processAllAvailable()
      val early = spark.table("soj_out")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Double, Option[Double])]
        .collect().toSeq
      assert(!early.exists(_._1 == 2L),
        s"user 2 must NOT emit before the watermark closes its window: $early")

      // advance BOTH watermarks (global watermark = min of the two)
      // far past user 2's [00:00, 00:30] window, then run the extra
      // micro-batches that evict expired left state
      ls.addData(Seq((9L, ts("2024-01-01 06:00:00"), 9.0)))
      rs.addData(Seq((9L, ts("2024-01-01 06:00:00"), 90.0)))
      q.processAllAvailable()
      ls.addData(Seq((10L, ts("2024-01-01 07:00:00"), 0.0)))
      rs.addData(Seq((10L, ts("2024-01-01 07:00:00"), 0.0)))
      q.processAllAvailable()

      val got = spark.table("soj_out")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Double, Option[Double])]
        .collect().toSeq.sortBy(t => (t._1, Option(t._3).map(_.getTime)))
      assert(got.exists(t => t._1 == 1L && t._5.contains(10.0)),
        s"user 1's in-window pair missing: $got")
      val u2 = got.filter(_._1 == 2L)
      assert(u2.size == 1 && u2.head._3 == null && u2.head._5.isEmpty,
        s"user 2 must emit exactly one NULL-right row after eviction: $got")
    } finally q.stop()
  }

  test("sessionization state survives a checkpointed query restart") {
    // the production property: flatMapGroupsWithState state lives in
    // the checkpoint, so a stopped query resumes its open sessions —
    // an out-of-order event arriving AFTER the restart must still
    // extend the pre-restart session
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("sess_restart")
    val evDir = base.resolve("in"); val outDir = base.resolve("out")
    val chkDir = base.resolve("chk")
    java.nio.file.Files.createDirectories(evDir)

    def writeWave(name: String, rows: Seq[graft.streaming.SessionEvent]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("wave")
      rows.toDS().coalesce(1).write.mode("overwrite").json(tmp.toString)
      val part = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".json"))
        .findFirst().get()
      java.nio.file.Files.copy(part, evDir.resolve(name))
    }
    def runOnce(): Unit = {
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "user_id BIGINT, ts TIMESTAMP, value DOUBLE")
      val in = spark.readStream.schema(schema).json(evDir.toString)
        .as[graft.streaming.SessionEvent]
      val q = EventStreams.sessionizeStateful(in)
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", chkDir.toString)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    writeWave("w1.json", Seq(
      graft.streaming.SessionEvent(1L, ts("2024-01-01 10:00:00"), 1.0),
      graft.streaming.SessionEvent(1L, ts("2024-01-01 10:10:00"), 1.0)))
    runOnce() // session [10:00, 10:10] left OPEN in checkpointed state
    writeWave("w2.json", Seq(
      graft.streaming.SessionEvent(1L, ts("2024-01-01 09:50:00"), 1.0), // pre-restart merge
      graft.streaming.SessionEvent(999L, ts("2024-01-01 22:00:00"), 0.0)))
    runOnce() // restart: restored session absorbs 09:50, watermark closes it
    writeWave("w3.json", Seq(
      graft.streaming.SessionEvent(999L, ts("2024-01-01 23:00:00"), 0.0)))
    runOnce() // extra batch so the timeout fires after the watermark move

    val sessions = spark.read.parquet(outDir.toString)
      .filter(col("user_id") === 1L)
      .select(col("session_start").cast("string"),
        col("session_end").cast("string"), col("n_events"))
      .as[(String, String, Long)].collect().toSeq
    assert(sessions == Seq(("2024-01-01 09:50:00", "2024-01-01 10:10:00", 3L)),
      s"restored state must absorb the out-of-order event: $sessions")
  }

  test("file-source streaming demo lands the q22 aggregation") {
    // stage the single events.parquet file into a directory — the
    // file stream source consumes directories of arriving files
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("part-0.parquet"))
    val q = EventStreams.runFileStreamDemo(spark, dir.toString, "demo_events")
    q.awaitTermination(60000)
    val n = spark.table("demo_events").count()
    // append-mode with AvailableNow: windows whose end precedes the
    // final watermark are emitted; the tail window may be withheld
    assert(n > 0, "streaming demo produced no finalized windows")
  }
}
