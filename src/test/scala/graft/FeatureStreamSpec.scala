package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.streaming.{FeatureEvent, FeatureStream}

/** Online feature extraction (transformWithState) must be bit-equal to
  * the batch window twin with a 1-PRECEDING frame under in-order
  * delivery — the zero-leakage contract: every event's features come
  * from strictly prior events, the current event folds in only after
  * emission.
  */
class FeatureStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def withRocks[A](body: => A): A = {
    // transformWithState requires the RocksDB provider. Test-economy
    // knobs: 4 state partitions instead of 32 (each partition is a
    // full RocksDB instance snapshotted per batch — at 32 the spec
    // spends minutes zipping empty stores) and changelog checkpointing
    // (append deltas, not a full snapshot per batch) — both are the
    // settings a real deployment runs with anyway.
    val saves = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.shuffle.partitions" -> "4",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        "true"
    ).map { case (k, v) =>
      val old = spark.conf.getOption(k); spark.conf.set(k, v); k -> old
    }
    try body finally saves.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("streamed features equal the batch 1-preceding window twin; no leakage") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocks {
      val events = tables.load(spark, "/root/testdata/sf0.001", "events")
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
        .as[FeatureEvent].collect().toSeq
      assert(events.nonEmpty)

      val stream = MemoryStream[FeatureEvent]
      val q = FeatureStream.onlineFeatures(stream.toDS())
        .writeStream.format("memory").queryName("feat_out")
        .outputMode("append").start()
      try {
        // in-order delivery: 3 batches split at global time terciles
        val sorted = events.sortBy(e => (e.ts.getTime, e.value))
        sorted.grouped((sorted.size + 2) / 3).foreach { b =>
          stream.addData(b: _*); q.processAllAvailable()
        }
      } finally q.stop()

      val got = spark.table("feat_out")
        .as[(Long, java.sql.Timestamp, Long, Double,
             Option[Double], Option[Long])](
          org.apache.spark.sql.Encoders.product)
        .collect().toSeq

      // batch twin: strictly-prior window frame over the same ordering
      val w = Window.partitionBy("user_id").orderBy("ts", "value")
      val prior = w.rowsBetween(Window.unboundedPreceding, -1)
      val expected = events.toDS().toDF()
        .withColumn("n_prior", count(lit(1)).over(prior))
        .withColumn("sum_prior",
          coalesce(sum(col("value")).over(prior), lit(0.0)))
        .withColumn("last_value", lag(col("value"), 1).over(w))
        .withColumn("us_since_last",
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)))
        .select(col("user_id"), col("ts"), col("n_prior"), col("sum_prior"),
          col("last_value"), col("us_since_last"))
        .as[(Long, java.sql.Timestamp, Long, Double,
             Option[Double], Option[Long])](
          org.apache.spark.sql.Encoders.product)
        .collect().toSeq

      assert(got.size == events.size,
        s"one feature row per event: ${got.size} vs ${events.size}")
      assert(got.toSet == expected.toSet)
      // leakage guard, directly: every user's first event has zero
      // prior mass and undefined last-value features
      val firsts = got.groupBy(_._1).values.map(_.minBy(r => r._2.getTime))
      assert(firsts.forall(r => r._3 == 0L && r._4 == 0.0 &&
        r._5.isEmpty && r._6.isEmpty))
    }
  }

  test("offline backfill warm-start continues bit-exactly where history replay would") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{FeatureOut, FeatureSnapshot}
    withRocks {
      val events = tables.load(spark, "/root/testdata/sf0.001", "events")
        .filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
        .as[FeatureEvent].collect().toSeq
        .sortBy(e => (e.ts.getTime, e.value))
      val cut = events(events.size / 2).ts.getTime
      val (history, live) = events.partition(_.ts.getTime < cut)
      assert(history.nonEmpty && live.nonEmpty)

      // offline snapshot = the serving fold over history, computed in
      // plain Scala in (ts, value) order — the snapshot contract
      def us(t: java.sql.Timestamp) = t.getTime * 1000 + t.getNanos / 1000 % 1000
      val snap = history.groupBy(_.user_id).map { case (u, es) =>
        val s = es.sortBy(e => (us(e.ts), e.value))
        FeatureSnapshot(u, s.size.toLong, s.map(_.value).foldLeft(0.0)(_ + _),
          us(s.last.ts), s.last.value)
      }.toSeq

      def run(name: String, feed: Seq[Seq[FeatureEvent]],
              backfill: Option[Seq[FeatureSnapshot]]): Seq[FeatureOut] = {
        val stream = MemoryStream[FeatureEvent]
        val ds = backfill match {
          case Some(b) => graft.streaming.FeatureStream
            .onlineFeaturesFrom(stream.toDS(), b.toDS())
          case None => graft.streaming.FeatureStream
            .onlineFeatures(stream.toDS())
        }
        val q = ds.writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try feed.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
        finally q.stop()
        spark.table(name).as[FeatureOut].collect().toSeq
      }

      // cold path: replay history then live; warm path: backfill + live
      val cold = run("feat_cold", Seq(history, live), None)
        .filter(o => o.ts.getTime >= cut)
      val warm = run("feat_warm", Seq(live), Some(snap))
      assert(warm.size == live.size)
      assert(warm.toSet == cold.toSet,
        "backfilled serving must continue exactly where replay would")
    }
  }

  test("cross-batch state: later batches see earlier batches' folds exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocks {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      val stream = MemoryStream[FeatureEvent]
      val q = FeatureStream.onlineFeatures(stream.toDS())
        .writeStream.format("memory").queryName("feat_xb_out")
        .outputMode("append").start()
      try {
        stream.addData(FeatureEvent(7L, ts("2024-01-01 10:00:00"), 2.0))
        q.processAllAvailable()
        stream.addData(FeatureEvent(7L, ts("2024-01-01 11:00:00"), 3.0))
        q.processAllAvailable()
        stream.addData(FeatureEvent(7L, ts("2024-01-01 12:00:00"), 5.0))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("feat_xb_out").orderBy("ts")
        .as[(Long, java.sql.Timestamp, Long, Double,
             Option[Double], Option[Long])](
          org.apache.spark.sql.Encoders.product)
        .collect().toSeq
      assert(got == Seq(
        (7L, ts("2024-01-01 10:00:00"), 0L, 0.0, None, None),
        (7L, ts("2024-01-01 11:00:00"), 1L, 2.0, Some(2.0),
          Some(3600000000L)),
        (7L, ts("2024-01-01 12:00:00"), 2L, 5.0, Some(3.0),
          Some(3600000000L))), s"got $got")
    }
  }
}
