package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The stateful streaming operators must run unchanged on the RocksDB
  * state store — the backend a large deployment swaps in when keyed
  * state (sessions, dedup sets, join buffers) outgrows the default
  * in-memory HashMap provider's executor heap. The provider is a
  * config swap, not a code change; this spec proves our
  * flatMapGroupsWithState sessionization produces the SAME sessions
  * under RocksDB as the batch `session_window` twin, and that RocksDB
  * actually backed the query (physical state files in the
  * checkpoint).
  */
class RocksDbStateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("stateful sessionization is backend-equal on RocksDB state store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.SessionEvent
    val saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batch1 = Seq(
        SessionEvent(1L, ts("2024-01-01 00:00:00"), 1.0),
        SessionEvent(1L, ts("2024-01-01 00:10:00"), 2.0),
        SessionEvent(2L, ts("2024-01-01 00:05:00"), 5.0))
      val batch2 = Seq(
        SessionEvent(2L, ts("2024-01-01 00:20:00"), 7.0), // spans batches
        SessionEvent(1L, ts("2024-01-01 01:15:00"), 3.0)) // new session
      val sentinel1 = Seq(SessionEvent(999L, ts("2024-01-01 12:00:00"), 0.0))
      val sentinel2 = Seq(SessionEvent(999L, ts("2024-01-01 12:01:00"), 0.0))

      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-rocks-ckpt").toString
      val stream = MemoryStream[SessionEvent]
      val q = graft.streaming.EventStreams.sessionizeStateful(stream.toDS())
        .writeStream.format("memory").queryName("rocks_sessions_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try {
        Seq(batch1, batch2, sentinel1, sentinel2).foreach { b =>
          stream.addData(b); q.processAllAvailable()
        }
      } finally q.stop()

      val got = spark.table("rocks_sessions_out")
        .filter(col("user_id") < 999)
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
      assert(got == expected,
        s"RocksDB-backed sessions $got must equal batch twin $expected")

      // physical evidence the swap took effect: RocksDB leaves its
      // SST/changelog artifacts under the checkpoint's state dir
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val stateFiles = walk(new java.io.File(ckpt, "state")).map(_.getName)
      assert(stateFiles.exists(n =>
          n.endsWith(".zip") || n.endsWith(".changelog") || n.contains("rocksdb")),
        s"no RocksDB state artifacts under $ckpt/state: $stateFiles")
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", saved)
  }

  test("stateful funnel is backend-equal on RocksDB state store") {
    // The funnel's state schema is the likeliest to break under store
    // serialization: a case class holding three longs PLUS a
    // List[(Long, String)] pending buffer, round-tripped through the
    // provider on every micro-batch, with event-time timeouts re-armed
    // from deserialized state. Re-run FunnelSpec's two hardest
    // scenarios — the out-of-order cross-batch rewrite and the
    // stage-gap-longer-than-watermark case (partial t1 progress must
    // survive its own finalization timeout) — under RocksDB and pin
    // the same answers the HashMap provider gives.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{EventStreams, FunnelEvent}
    val saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-rocks-funnel-ckpt").toString
      val stream = MemoryStream[FunnelEvent]
      val q = EventStreams.funnelStateful(stream.toDS())
        .writeStream.format("memory").queryName("rocks_funnel_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try {
        Seq(
          // user 1: out-of-order rewrite — first-arriving click at
          // 00:30 is only qualified by the LATE 00:10 view (FunnelSpec
          // "cross-batch"); state with a non-empty pending buffer must
          // survive a RocksDB round trip in between
          Seq(FunnelEvent(1L, ts("2024-01-01 00:30:00"), "click")),
          Seq(FunnelEvent(1L, ts("2024-01-01 00:10:00"), "view"),
              FunnelEvent(1L, ts("2024-01-01 00:50:00"), "purchase")),
          // user 2: stage gap longer than the watermark delay
          // (FunnelSpec:119) — the view is finalized by a timeout fired
          // from DESERIALIZED state, then must persist as partial
          // progress until the click/purchase arrive a day later
          Seq(FunnelEvent(2L, ts("2024-01-01 00:00:00"), "view")),
          Seq(FunnelEvent(999L, ts("2024-01-02 12:00:00"), "view")),
          Seq(FunnelEvent(999L, ts("2024-01-02 12:01:00"), "view")),
          Seq(FunnelEvent(2L, ts("2024-01-02 11:00:00"), "click"),
              FunnelEvent(2L, ts("2024-01-02 11:30:00"), "purchase")),
          Seq(FunnelEvent(999L, ts("2024-01-03 00:00:00"), "view")),
          Seq(FunnelEvent(999L, ts("2024-01-03 00:01:00"), "view"))
        ).foreach { b => stream.addData(b); q.processAllAvailable() }
      } finally q.stop()

      val got = spark.table("rocks_funnel_out")
        .filter(col("user_id") < 999)
        .orderBy("user_id")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, java.sql.Timestamp)]
        .collect().toSeq
      assert(got == Seq(
        (1L, ts("2024-01-01 00:10:00"), ts("2024-01-01 00:30:00"),
          ts("2024-01-01 00:50:00")),
        (2L, ts("2024-01-01 00:00:00"), ts("2024-01-02 11:00:00"),
          ts("2024-01-02 11:30:00"))),
        s"RocksDB-backed funnel diverged from the HashMap-provider answers: $got")

      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val stateFiles = walk(new java.io.File(ckpt, "state")).map(_.getName)
      assert(stateFiles.exists(n =>
          n.endsWith(".zip") || n.endsWith(".changelog") || n.contains("rocksdb")),
        s"no RocksDB state artifacts under $ckpt/state: $stateFiles")
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", saved)
  }

  test("stateful as-of join is backend-equal on RocksDB state store") {
    // The as-of state round-trips a compacted (Long, Double) pair plus
    // two pending lists through the provider, and its hardest scenario
    // — a left served from the COMPACTED row long after the
    // contributing rights were dropped — only works if that compaction
    // survives deserialization across batches. Re-run AsofStreamSpec's
    // first scenario under RocksDB and pin the HashMap-provider
    // answers.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{AsofLeft, AsofRight, EventStreams}
    val saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-rocks-asof-ckpt").toString
      val ls = MemoryStream[AsofLeft]
      val rs = MemoryStream[AsofRight]
      val q = EventStreams.asofJoinStateful(ls.toDS(), rs.toDS(),
          watermarkDelay = "10 minutes")
        .writeStream.format("memory").queryName("rocks_asof_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try {
        ls.addData(AsofLeft(1L, ts("2024-01-01 10:15:00"), 102L),
          AsofLeft(1L, ts("2024-01-01 09:50:00"), 101L))
        rs.addData(AsofRight(1L, ts("2024-01-01 10:00:00"), 1.0))
        q.processAllAvailable()
        ls.addData(AsofLeft(1L, ts("2024-01-01 10:45:00"), 103L))
        rs.addData(AsofRight(1L, ts("2024-01-01 10:10:00"), 5.0),
          AsofRight(1L, ts("2024-01-01 10:30:00"), 2.0))
        q.processAllAvailable()
        rs.addData(AsofRight(999L, ts("2024-01-02 12:00:00"), 0.0))
        q.processAllAvailable()
        rs.addData(AsofRight(999L, ts("2024-01-02 12:01:00"), 0.0))
        q.processAllAvailable()
      } finally q.stop()

      val got = spark.table("rocks_asof_out")
        .filter(col("user_id") < 999)
        .orderBy("event_id")
        .as[(Long, Long, java.sql.Timestamp,
             Option[java.sql.Timestamp], Option[Double])](
          org.apache.spark.sql.Encoders.product)
        .collect().toSeq
      assert(got == Seq(
        (1L, 101L, ts("2024-01-01 09:50:00"), None, None),
        (1L, 102L, ts("2024-01-01 10:15:00"),
          Some(ts("2024-01-01 10:10:00")), Some(5.0)),
        (1L, 103L, ts("2024-01-01 10:45:00"),
          Some(ts("2024-01-01 10:30:00")), Some(2.0))),
        s"RocksDB-backed as-of diverged from the HashMap-provider answers: $got")

      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val stateFiles = walk(new java.io.File(ckpt, "state")).map(_.getName)
      assert(stateFiles.exists(n =>
          n.endsWith(".zip") || n.endsWith(".changelog") || n.contains("rocksdb")),
        s"no RocksDB state artifacts under $ckpt/state: $stateFiles")
    } finally spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", saved)
  }
}
