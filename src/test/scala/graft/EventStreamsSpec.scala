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
