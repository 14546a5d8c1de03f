package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.SnapshotMaintenance

/** The streaming CDC apply (20th maintainer): the served latest-row
  * view equals the batch pl11 snapshot REGARDLESS of arrival order
  * (latest-wins is commutative — batches here interleave times, they
  * are NOT time-ordered); a late-arriving OLD event cannot displace a
  * newer one already served; replay is a no-op; a crashed partial
  * ledger partition is invisible until its marker and overwritten
  * whole on replay.
  */
class SnapshotMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private type Ev = (Long, Long, java.sql.Timestamp, String, Double)

  private def eventRows(): Seq[Ev] =
    tables.load(spark, dir, "events")
      .select("event_id", "user_id", "ts", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2), r.getString(3), r.getDouble(4))).toSeq

  private def served(): Seq[(Long, String, Double, java.sql.Timestamp, Long)] =
    SnapshotMaintenance.snapshot(spark, "sn_ledger", "sn_marker")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getTimestamp(3), r.getLong(4))).toSeq

  test("served snapshot == batch pl11 under time-interleaved arrival") {
    import spark.implicits._
    TestWarehouse.reset(spark, "sn_ledger", "sn_ledgerc",
      "sn_ledgerc_staging", "sn_marker")
    val rows = eventRows()
    // event_id % 3 split: every batch spans the full time range, so
    // this exercises order-independence, not just incremental append
    val batches = (0 until 3).map(i => rows.filter(_._1 % 3 == i))

    val stream = MemoryStream[Ev](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-sn-ckpt").toString
    val q = SnapshotMaintenance.maintain(
      stream.toDF().toDF("event_id", "user_id", "ts", "event_type", "value"),
      "sn_ledger", "sn_marker", ckpt)
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val expected = SparkEntry.queries("pl11_latest_snapshot")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getTimestamp(3), r.getLong(4))).toSeq
    assert(served() == expected,
      "streamed snapshot diverged from the batch pl11 view")
    // ledger stays batch-bounded: ≤ users-per-batch rows per batch,
    // never one row per EVENT
    assert(spark.table("sn_ledger").count() <
      spark.table("sn_ledger").select("user_id").distinct().count() * 3 + 1)

    // compaction folds to ONE row per user; serving is unchanged
    val users = spark.table("sn_ledger")
      .select("user_id").distinct().count()
    SnapshotMaintenance.compact(spark, "sn_ledger", "sn_marker")
    assert(spark.table("sn_ledgerc").count() == users,
      "compact table must hold exactly one row per user")
    assert(spark.table("sn_ledger").count() == 0L,
      "folded ledger partitions should be dropped")
    assert(served() == expected,
      "serving changed across the ledger compaction")

    // a post-compact batch with a FRESHER event still wins, against
    // the folded state and across a crashed compact swap
    val u = expected.head._1
    val newer = (900001L, u,
      new java.sql.Timestamp(expected.head._4.getTime + 3600L * 1000),
      "post_compact", 42.0)
    spark.sql("ALTER TABLE sn_ledgerc RENAME TO sn_ledgerc_staging")
    SnapshotMaintenance.applyBatch(
      Seq(newer).toDF("event_id", "user_id", "ts", "event_type", "value"),
      100L, "sn_ledger", "sn_marker")
    val row = SnapshotMaintenance.snapshot(spark, "sn_ledger", "sn_marker")
      .filter(col("user_id") === u).collect().head
    assert(spark.catalog.tableExists("sn_ledgerc") &&
      !spark.catalog.tableExists("sn_ledgerc_staging"),
      "staged compact table not adopted")
    assert(row.getAs[String]("last_type") == "post_compact" &&
      row.getAs[Long]("n_events") ==
        expected.find(_._1 == u).get._5 + 1L,
      s"post-compact update lost: $row")
    spark.catalog.clearCache()
  }

  test("late old event cannot win; replay no-op; crash partition healed") {
    import spark.implicits._
    TestWarehouse.reset(spark, "sl_ledger", "sl_marker")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val fresh: Ev = (10L, 1L, ts("2026-02-01 00:00:00"), "purchase", 9.0)
    val stale: Ev = (5L, 1L, ts("2026-01-01 00:00:00"), "view", 1.0)

    SnapshotMaintenance.applyBatch(
      Seq(fresh).toDF("event_id", "user_id", "ts", "event_type", "value"),
      0L, "sl_ledger", "sl_marker")
    // the LATE batch carries only the OLDER event
    SnapshotMaintenance.applyBatch(
      Seq(stale).toDF("event_id", "user_id", "ts", "event_type", "value"),
      1L, "sl_ledger", "sl_marker")
    val row = SnapshotMaintenance.snapshot(spark, "sl_ledger", "sl_marker")
      .collect().head
    assert(row.getAs[String]("last_type") == "purchase" &&
      row.getAs[Long]("n_events") == 2L,
      s"late old event displaced the newer snapshot row: $row")

    // replay: committed batch id is a no-op
    val before = spark.table("sl_ledger").collect().toSet
    SnapshotMaintenance.applyBatch(
      Seq(stale).toDF("event_id", "user_id", "ts", "event_type", "value"),
      1L, "sl_ledger", "sl_marker")
    assert(spark.table("sl_ledger").collect().toSet == before)

    // crash window: a partial (wrong) summary partition landed, no
    // marker — invisible to serving, overwritten whole on replay
    Seq((99L, "bogus", 0.0, ts("2030-01-01 00:00:00"), 999L, 1L, 2L))
      .toDF("user_id", "last_type", "last_value", "last_ts",
        "last_event_id", "n_events", "batch_id")
      .write.mode("append").insertInto("sl_ledger")
    assert(!SnapshotMaintenance.snapshot(spark, "sl_ledger", "sl_marker")
      .collect().map(_.getLong(0)).contains(99L),
      "uncommitted ledger partition must not serve")
    SnapshotMaintenance.applyBatch(
      Seq((20L, 2L, ts("2026-03-01 00:00:00"), "click", 3.0): Ev)
        .toDF("event_id", "user_id", "ts", "event_type", "value"),
      2L, "sl_ledger", "sl_marker")
    val p2 = spark.table("sl_ledger").filter(col("batch_id") === 2L)
      .collect().map(_.getAs[Long]("user_id")).toSeq
    assert(p2 == Seq(2L),
      s"crashed partial partition must be overwritten whole: $p2")
    spark.catalog.clearCache()
  }
}
