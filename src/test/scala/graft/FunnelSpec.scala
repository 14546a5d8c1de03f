package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{EventStreams, FunnelEvent}

/** The stateful streaming funnel must equal batch q52's per-user staged
  * minima — earliest view, earliest click strictly after it, earliest
  * purchase strictly after that — including when stages arrive in
  * different micro-batches and OUT OF ORDER (the case that forces the
  * watermark-gated fold: a late-arriving earlier view rewrites which
  * click qualifies).
  */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s)

  test("streamed funnels equal the batch staged-minima, cross-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1 completes across three batches; user 2 never purchases;
    // user 3's purchase PRECEDES its click (must not complete); user 4
    // tests the out-of-order rewrite: its first-arriving click at 00:30
    // looks too early until the 00:10 view arrives late in batch 2 —
    // correct t2 is 00:30, which an eager fold would have discarded.
    val batch1 = Seq(
      FunnelEvent(1L, ts("2024-01-01 00:00:00"), "view"),
      FunnelEvent(2L, ts("2024-01-01 00:00:00"), "view"),
      FunnelEvent(3L, ts("2024-01-01 00:05:00"), "purchase"),
      FunnelEvent(4L, ts("2024-01-01 00:30:00"), "click"))
    val batch2 = Seq(
      FunnelEvent(1L, ts("2024-01-01 00:20:00"), "click"),
      FunnelEvent(2L, ts("2024-01-01 00:25:00"), "click"),
      FunnelEvent(3L, ts("2024-01-01 00:40:00"), "view"),
      FunnelEvent(4L, ts("2024-01-01 00:10:00"), "view"), // late arrival
      FunnelEvent(4L, ts("2024-01-01 00:50:00"), "purchase"))
    val batch3 = Seq(
      FunnelEvent(1L, ts("2024-01-01 01:00:00"), "purchase"),
      FunnelEvent(3L, ts("2024-01-01 00:55:00"), "click"))
    // sentinels push the watermark past every real event, then fire
    // the timeout batch that finalizes quiet users
    val sentinel1 = Seq(FunnelEvent(999L, ts("2024-01-02 12:00:00"), "view"))
    val sentinel2 = Seq(FunnelEvent(999L, ts("2024-01-02 12:01:00"), "view"))

    val stream = MemoryStream[FunnelEvent]
    val q = EventStreams.funnelStateful(stream.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      Seq(batch1, batch2, batch3, sentinel1, sentinel2).foreach { b =>
        stream.addData(b); q.processAllAvailable()
      }
      val got = spark.table("funnel_out")
        .filter(col("user_id") < 999)
        .orderBy("user_id")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, java.sql.Timestamp)]
        .collect().toSeq

      // batch twin: q52's staged conditional minima on the same rows
      val ev = (batch1 ++ batch2 ++ batch3).toDS().toDF()
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      val expected = v.join(c, "user_id").join(p, "user_id")
        .select(col("user_id"), col("t1"), col("t2"), col("t3"))
        .orderBy("user_id")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, java.sql.Timestamp)]
        .collect().toSeq

      assert(got == expected,
        s"streamed funnels $got must equal batch staged minima $expected")
      assert(got.map(_._1) == Seq(1L, 4L),
        "exactly users 1 and 4 complete the funnel")
      // user 4's out-of-order proof: click at 00:30 was only
      // qualifiable after the late 00:10 view arrived
      val u4 = got.find(_._1 == 4L).get
      assert(u4._3 == ts("2024-01-01 00:30:00"),
        "late-arriving view must re-qualify the earlier-arriving click")
    } finally q.stop()
  }

  test("sub-millisecond stage gaps complete the funnel (micros state)") {
    // the events corpus is micros-grained: stages 400 µs apart share a
    // millisecond, so ms-truncated state would never satisfy the
    // strict '>' comparisons and the funnel would silently stall
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[FunnelEvent]
    val q = EventStreams.funnelStateful(stream.toDS())
      .writeStream.format("memory").queryName("funnel_us")
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        FunnelEvent(1L, ts("2024-01-01 00:00:00.000100"), "view"),
        FunnelEvent(1L, ts("2024-01-01 00:00:00.000500"), "click"),
        FunnelEvent(1L, ts("2024-01-01 00:00:00.000900"), "purchase")))
      q.processAllAvailable()
      stream.addData(Seq(FunnelEvent(999L, ts("2024-01-02 00:00:00"), "view")))
      q.processAllAvailable()
      stream.addData(Seq(FunnelEvent(999L, ts("2024-01-03 00:00:00"), "view")))
      q.processAllAvailable()
      val got = spark.table("funnel_us").filter(col("user_id") === 1L)
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, java.sql.Timestamp)]
        .collect().toSeq
      assert(got == Seq((1L, ts("2024-01-01 00:00:00.000100"),
        ts("2024-01-01 00:00:00.000500"), ts("2024-01-01 00:00:00.000900"))),
        s"micros must survive state round-trip and comparisons: $got")
    } finally q.stop()
  }

  test("stage gap longer than the watermark delay still completes") {
    // regression: the view is finalized by a pending-finalization
    // timeout (watermark advance, no new events) long before the
    // click/purchase arrive. Partial t1 progress must survive that
    // timeout — only a genuine idleTtl of silence may reclaim state.
    // Before the fix, the timeout branch removed the state the moment
    // pending drained, so any funnel with a quiet gap between stages
    // longer than the watermark delay could never complete.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[FunnelEvent]
    val q = EventStreams.funnelStateful(stream.toDS())
      .writeStream.format("memory").queryName("funnel_gap")
      .outputMode("append").start()
    try {
      Seq(
        Seq(FunnelEvent(1L, ts("2024-01-01 00:00:00"), "view")),
        // sentinels push the watermark a day past the view, then fire
        // the timeout batch that folds it into t1 with empty pending
        Seq(FunnelEvent(999L, ts("2024-01-02 12:00:00"), "view")),
        Seq(FunnelEvent(999L, ts("2024-01-02 12:01:00"), "view")),
        // later stages arrive AFTER the view was finalized (their ts
        // is ahead of the current watermark, so they are not late)
        Seq(FunnelEvent(1L, ts("2024-01-02 11:00:00"), "click"),
            FunnelEvent(1L, ts("2024-01-02 11:30:00"), "purchase")),
        Seq(FunnelEvent(999L, ts("2024-01-03 00:00:00"), "view")),
        Seq(FunnelEvent(999L, ts("2024-01-03 00:01:00"), "view"))
      ).foreach { b => stream.addData(b); q.processAllAvailable() }
      val got = spark.table("funnel_gap").filter(col("user_id") === 1L)
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, java.sql.Timestamp)]
        .collect().toSeq
      assert(got == Seq((1L, ts("2024-01-01 00:00:00"),
        ts("2024-01-02 11:00:00"), ts("2024-01-02 11:30:00"))),
        s"partial progress must survive its finalization timeout: $got")
    } finally q.stop()
  }

  test("funnel emits exactly once (completed user keeps a tombstone)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[FunnelEvent]
    val q = EventStreams.funnelStateful(stream.toDS())
      .writeStream.format("memory").queryName("funnel_once")
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        FunnelEvent(1L, ts("2024-01-01 00:00:00"), "view"),
        FunnelEvent(1L, ts("2024-01-01 00:01:00"), "click"),
        FunnelEvent(1L, ts("2024-01-01 00:02:00"), "purchase")))
      q.processAllAvailable()
      stream.addData(Seq(FunnelEvent(9L, ts("2024-01-03 00:00:00"), "view")))
      q.processAllAvailable()
      // neither a stray purchase NOR a full second view→click→purchase
      // sequence may re-emit: the tombstone survives completion
      stream.addData(Seq(
        FunnelEvent(1L, ts("2024-01-03 00:10:00"), "purchase"),
        FunnelEvent(1L, ts("2024-01-03 01:00:00"), "view"),
        FunnelEvent(1L, ts("2024-01-03 01:01:00"), "click"),
        FunnelEvent(1L, ts("2024-01-03 01:02:00"), "purchase"),
        FunnelEvent(9L, ts("2024-01-04 00:00:00"), "view")))
      q.processAllAvailable()
      stream.addData(Seq(FunnelEvent(9L, ts("2024-01-05 00:00:00"), "view")))
      q.processAllAvailable()
      val rows = spark.table("funnel_once").filter(col("user_id") === 1L)
      assert(rows.count() == 1, "completed funnel must emit exactly once")
    } finally q.stop()
  }
}
