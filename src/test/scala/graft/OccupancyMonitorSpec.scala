package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.index.VectorStore
import graft.streaming.OccupancyMonitor

/** The occupancy arc: a healthy uniform feed never alarms, one clumped
  * micro-batch alarms within that batch, the alarm row fires
  * `rebalanceIfSkewed` (a healthy row does not), the split drops the
  * profile back under the threshold, replay is a no-op (no vector
  * re-appended, no second row), and the orphan row adopts.
  */
class OccupancyMonitorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private val vs = "occm_store"

  private def allTables =
    (Seq("centroids", "stats", "codes", "raw", "bits", "version",
      "tombstones").map(s => s"${vs}_$s")) ++
      (1 to 6).flatMap(v => Seq("centroids", "stats", "codes", "raw",
        "bits", "tombstones").map(s => s"${vs}_v${v}_$s")) ++
      Seq("occm_ledger", "occm_marker")

  private def emb = tables.load(spark, dir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  test("clumped feed alarms; gate rebalances; replay/orphan safe") {
    import spark.implicits._
    TestWarehouse.reset(spark, allTables: _*)
    VectorStore.build(emb, vs, cells = 8)

    val base = emb.filter(col("vec_id") === 0L)
      .as[(Long, Seq[Float])].head()._2
    // healthy batch: a uniform spread; clumped batch: 600 near-copies
    // of one vector (the template-page crawl / collapsed-model shape)
    val healthy = (2000L until 2100L).map { i =>
      (i, base.indices.map(d =>
        (((i + d) % 29).toDouble / 29.0 - 0.5).toFloat).toSeq)
    }
    val clump = (3000L until 3600L).map { i =>
      (i, base.map(x => x + (i % 17) * 1e-4f))
    }

    val stream = MemoryStream[(Long, Seq[Float])](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-occm-ckpt").toString
    val q = OccupancyMonitor.maintain(
      stream.toDF().toDF("vec_id", "embedding")
        .select(col("vec_id"),
          col("embedding").cast("array<float>").as("embedding")),
      vs, "occm_ledger", "occm_marker", ckpt)
    try {
      stream.addData(healthy); q.processAllAvailable()
      stream.addData(clump); q.processAllAvailable()
    } finally q.stop()

    val rows = OccupancyMonitor.profiles(spark, "occm_ledger", "occm_marker")
      .orderBy("batch_id")
      .select("batch_id", "n_hot", "alarm")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(rows.size == 2, s"expected 2 committed rows: $rows")
    assert(!rows(0)._3, s"healthy batch alarmed: $rows")
    assert(rows(1)._3 && rows(1)._2 > 0, s"clumped batch silent: $rows")

    // the committed alarm fires the gate; the split clears the alarm
    val v0 = VectorStore.currentVersion(spark, vs)
    val split = VectorStore.rebalanceIfSkewed(spark, vs,
      "occm_ledger", "occm_marker")
    assert(split.nonEmpty, "alarm row did not fire the rebalance gate")
    assert(VectorStore.currentVersion(spark, vs) > v0)
    // one gate call = one split round; converge the remaining rounds
    // (each child of a 600-copy clump is still hot until split down)
    var r = 0
    while (VectorStore.rebalance(spark, vs).nonEmpty && r < 12) r += 1
    assert(r < 12, "rebalance did not converge")
    val after = OccupancyMonitor.occupancyRow(spark, vs)
      .select("alarm").head.getBoolean(0)
    assert(!after, "converged rebalance left the store alarming")
    // ... and a now-healthy LATEST row keeps the gate closed
    OccupancyMonitor.occupancyBatch(
      spark.range(0).select(col("id").as("vec_id"),
        lit(null).cast("array<float>").as("embedding")).filter(lit(false)),
      99L, vs, "occm_ledger", "occm_marker")
    assert(VectorStore.rebalanceIfSkewed(spark, vs,
      "occm_ledger", "occm_marker").isEmpty,
      "healthy latest row fired the gate")

    // replay no-op: re-running a committed batch appends nothing
    val codesN = spark.table(
      s"${VectorStore.servingPrefix(spark, vs)}_codes").count()
    OccupancyMonitor.occupancyBatch(
      clump.toDF("vec_id", "embedding")
        .select(col("vec_id"),
          col("embedding").cast("array<float>").as("embedding")),
      1L, vs, "occm_ledger", "occm_marker")
    assert(spark.table(
      s"${VectorStore.servingPrefix(spark, vs)}_codes").count() == codesN,
      "replayed batch re-appended vectors")
    assert(spark.table("occm_ledger")
      .filter(col("batch_id") === 1L).count() == 1)

    // orphan adoption: a ledger row without its marker is invisible,
    // then adopted by the replay without a duplicate
    Seq((7L, 1L, 1L, 1L, 1.0, 0L, false))
      .toDF("batch_id", "n_cells", "occ_max", "target", "factor",
        "n_hot", "alarm")
      .write.mode("append").saveAsTable("occm_ledger")
    assert(OccupancyMonitor.profiles(spark, "occm_ledger", "occm_marker")
      .filter(col("batch_id") === 7L).isEmpty,
      "orphan row visible before its marker")
    OccupancyMonitor.occupancyBatch(
      spark.range(0).select(col("id").as("vec_id"),
        lit(null).cast("array<float>").as("embedding")).filter(lit(false)),
      7L, vs, "occm_ledger", "occm_marker")
    assert(spark.table("occm_ledger")
      .filter(col("batch_id") === 7L).count() == 1,
      "adoption duplicated the orphan row")
    assert(!OccupancyMonitor.profiles(spark, "occm_ledger", "occm_marker")
      .filter(col("batch_id") === 7L).isEmpty)
    TestWarehouse.reset(spark, allTables: _*)
  }
}
