package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.index.ImportanceStore

/** Streaming DSIR weighing under a FROZEN ratio table
  * (`graft.index.ImportanceStore`) — the eleventh streaming
  * maintainer, fourth model-serving one (QualityMaintenance's shape):
  * the batch side computes the target-vs-corpus log-ratio table once;
  * a crawl stream then weighs every incoming micro-batch with one
  * broadcast join and appends to a weights ledger, so the
  * importance-sampling selection (keep docs that read like the
  * trusted domain) runs on scored rows without ever re-reading the
  * reference corpus. Per-doc OOV counts ride along: a batch whose
  * novel-vocabulary mass spikes is the re-estimation trigger (the
  * DriftMonitor arc — ratios retrain like any model artifact).
  *
  * Delivery: the QualityMaintenance commit-marker pattern — marker
  * lands AFTER the weights append, replayed committed batches skip,
  * serving filters to committed ids, and the append-vs-marker crash
  * window is closed by orphan ADOPTION, sound because weights are
  * deterministic under the frozen table and the file-commit protocol
  * makes the append all-or-nothing. The marker contract requires a
  * DURABLE `checkpointDir`.
  */
object ImportanceMaintenance {

  /** Starts the weighing query: each micro-batch of `newDocs`
    * (`doc_id`, `text`) is weighed under `storeName`'s frozen ratios
    * into `weightsTable`. */
  def maintain(newDocs: DataFrame, storeName: String, weightsTable: String,
               markerTable: String, checkpointDir: String,
               erasureLedger: Option[String] = None): StreamingQuery = {
    require(checkpointDir.nonEmpty,
      "ImportanceMaintenance.maintain requires a durable checkpointDir: " +
        "replay-skip markers are only valid against stable batch ids")
    newDocs.writeStream
      .outputMode("append")
      .queryName(Maintenance.queryNameFor(weightsTable))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        scoreBatch(graft.index.Erasure.gateBatch(batch, erasureLedger),
          batchId, storeName, weightsTable, markerTable)
      }
      .start()
  }

  /** One micro-batch: weigh under the frozen ratios, append, then the
    * commit marker. Replay-safe via the marker; a replay landing in
    * the crash window (weights appended, marker missing) ADOPTS the
    * existing rows instead of duplicating them. */
  def scoreBatch(batch: DataFrame, batchId: Long, storeName: String,
                 weightsTable: String, markerTable: String): Unit = {
    val spark = batch.sparkSession
    recoverStaging(spark, weightsTable)
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (!committed) {
      val orphaned = spark.catalog.tableExists(weightsTable) &&
        !spark.table(weightsTable).filter(col("batch_id") === batchId).isEmpty
      if (!orphaned)
        ImportanceStore.score(batch.select(col("doc_id"), col("text")),
            storeName)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").saveAsTable(weightsTable)
      batch.groupBy()
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("batch_id", lit(batchId))
        .select("batch_id", "n_docs")
        .write.mode("append").saveAsTable(markerTable)
    }
  }

  /** Rewrite the weights ledger into few files (the streaming
    * small-files problem). Rows/schema unchanged; serving identical
    * before and after. CONTRACT: maintenance window, maintainer
    * stopped (SURVEY §6b). Crash-safe via stage-then-swap with
    * [[recoverStaging]] at every entry point. */
  def compact(spark: org.apache.spark.sql.SparkSession,
              weightsTable: String, numFiles: Int = 1): Unit = {
    recoverStaging(spark, weightsTable)
    if (!spark.catalog.tableExists(weightsTable)) return
    val staging = weightsTable + "_staging"
    spark.table(weightsTable).coalesce(numFiles)
      .write.mode("overwrite").saveAsTable(staging)
    spark.sql(s"DROP TABLE IF EXISTS $weightsTable")
    spark.sql(s"ALTER TABLE $staging RENAME TO $weightsTable")
  }

  /** Crash recovery for [[compact]]'s stage-then-swap: a crash
    * between the DROP and the RENAME leaves no weights table but a
    * complete staged copy — adopt it. */
  private def recoverStaging(spark: org.apache.spark.sql.SparkSession,
                             weightsTable: String): Unit = {
    val staging = weightsTable + "_staging"
    if (!spark.catalog.tableExists(weightsTable) &&
        spark.catalog.tableExists(staging))
      spark.sql(s"ALTER TABLE $staging RENAME TO $weightsTable")
  }

  /** Committed weights only (empty frame with the right schema when
    * nothing has committed): a crash between the weights append and
    * its marker never surfaces the orphan batch. */
  def weights(spark: org.apache.spark.sql.SparkSession, weightsTable: String,
              markerTable: String): DataFrame = {
    Freshness.refresh(spark, weightsTable, markerTable)
    recoverStaging(spark, weightsTable)
    if (!spark.catalog.tableExists(weightsTable) ||
        !spark.catalog.tableExists(markerTable))
      return spark.emptyDataFrame
        .select(lit(0L).as("doc_id"), lit(0L).as("n_toks"),
          lit(0L).as("n_oov"), lit(0.0).as("logw"))
        .limit(0)
    spark.table(weightsTable)
      .join(broadcast(spark.table(markerTable).select("batch_id")),
        Seq("batch_id"), "left_semi")
      .drop("batch_id")
  }
}
