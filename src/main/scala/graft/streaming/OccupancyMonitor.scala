package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.index.VectorStore

/** Streaming cell-occupancy monitor (the 23rd maintainer — the INPUT-
  * SHAPE half of the index-health arc whose OUTPUT-quality half is
  * `RecallMonitor`): every ingest batch appends vectors under the
  * frozen coarse quantizer, and a clumped feed (one template page
  * crawled a million times, one embedding-model regression collapsing
  * outputs) silently concentrates them in a few cells — per-probe
  * candidate volume in those cells grows with every batch while the
  * recall monitor still reads healthy. One row per micro-batch —
  * (n_cells, occ_max, target, factor = occ_max/target, n_hot, alarm)
  * over the LIVE codes (tombstones subtracted, the rebalance
  * definition) — and the alarm is the direct trigger for the cheap
  * middle rung: [[VectorStore.rebalanceIfSkewed]] splits the hot cells
  * instead of retraining the store. Per-batch work is one cells-sized
  * aggregate of the code table; the ledger gets ONE row per batch.
  *
  * Delivery: the PsiMonitor protocol — orphan adoption, marker last,
  * committed-only serve, durable checkpoint required.
  */
object OccupancyMonitor {

  /** Start the monitor on an ingest stream of (`vec_id`, `embedding`):
    * each micro-batch appends into the store (through the erasure
    * gate when configured), then writes its occupancy row. */
  def maintain(newVecs: DataFrame, storeName: String,
               ledgerTable: String, markerTable: String,
               checkpointDir: String, hotFactor: Double = 2.0,
               erasureLedger: Option[String] = None): StreamingQuery = {
    require(checkpointDir.nonEmpty,
      "OccupancyMonitor.maintain requires a durable checkpointDir: " +
        "replay-skip markers are only valid against stable batch ids")
    newVecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        occupancyBatch(
          graft.index.Erasure.gateBatch(batch, erasureLedger,
            Seq("vec_id")),
          batchId, storeName, ledgerTable, markerTable, hotFactor)
      }
      .start()
  }

  /** One micro-batch: append (idempotent via the marker — a replayed
    * batch must not re-append its vectors), then the occupancy row,
    * marker last. */
  def occupancyBatch(batch: DataFrame, batchId: Long, storeName: String,
                     ledgerTable: String, markerTable: String,
                     hotFactor: Double = 2.0): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (committed) return
    if (!batch.isEmpty) VectorStore.append(batch, storeName)
    val orphaned = spark.catalog.tableExists(ledgerTable) &&
      !spark.table(ledgerTable).filter(col("batch_id") === batchId).isEmpty
    if (!orphaned) {
      graft.index.VectorStore.clearOrphanLocation(spark, ledgerTable)
      occupancyRow(spark, storeName, hotFactor)
        .withColumn("batch_id", lit(batchId))
        .select("batch_id", "n_cells", "occ_max", "target", "factor",
          "n_hot", "alarm")
        .write.mode("append").saveAsTable(ledgerTable)
    }
    Seq(batchId).toDF("batch_id")
      .write.mode("append").saveAsTable(markerTable)
  }

  /** The 1-row occupancy profile of the serving store — shared by the
    * streaming path and batch spot-checks. `target` is the adaptive
    * rule's design occupancy (the rebalance hotness definition — NOT
    * the current mean, which falls as cells split). */
  def occupancyRow(spark: SparkSession, storeName: String,
                   hotFactor: Double = 2.0): DataFrame = {
    val occ = VectorStore.liveOccupancy(spark, storeName)
    import spark.implicits._
    val total = occ.values.sum
    val target = math.max(1L,
      total / math.max(VectorStore.Cells.toLong,
        total / VectorStore.CellTarget))
    val occMax = if (occ.isEmpty) 0L else occ.values.max
    val nHot = occ.values.count(_.toDouble > hotFactor * target).toLong
    Seq((occ.size.toLong, occMax, target,
        occMax.toDouble / target.toDouble, nHot, nHot > 0L))
      .toDF("n_cells", "occ_max", "target", "factor", "n_hot", "alarm")
  }

  /** Committed occupancy rows only (empty-typed before the first
    * commit). */
  def profiles(spark: SparkSession, ledgerTable: String,
               markerTable: String): DataFrame = {
    Freshness.refresh(spark, ledgerTable, markerTable)
    if (!spark.catalog.tableExists(ledgerTable) ||
        !spark.catalog.tableExists(markerTable))
      return spark.range(0).select(col("id").as("batch_id"),
        lit(0L).as("n_cells"), lit(0L).as("occ_max"),
        lit(0L).as("target"), lit(0.0).as("factor"),
        lit(0L).as("n_hot"), lit(false).as("alarm"))
    spark.table(ledgerTable)
      .join(broadcast(spark.table(markerTable).select("batch_id")),
        Seq("batch_id"), "left_semi")
  }
}
