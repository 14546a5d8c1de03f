package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.index.QualityStore

/** Streaming quality scoring under a FROZEN classifier model
  * (`graft.index.QualityStore`) — the seventh streaming maintainer,
  * and the first model-SERVING one: the batch side trains the
  * bounded hashed-feature model once; a crawl stream then scores
  * every incoming micro-batch with one broadcast join and appends to
  * a scores ledger, so downstream filtering (keep/drop) reads scored
  * rows without ever touching the training corpus. Retrain cadence is
  * a deployment decision (the marker ledger counts scored batches);
  * scores are reproducible because the model is frozen — a replayed
  * doc scores identically months later.
  *
  * Delivery: same commit-marker pattern as the other maintainers —
  * the per-batch `(batch_id, n_docs)` marker lands AFTER the scores
  * append; a replayed batch whose marker exists is skipped; serving
  * filters to committed batch ids. The crash window between the
  * scores append and the marker is CLOSED by orphan ADOPTION (the
  * TrendMaintenance device): a replay that finds the batch's score
  * rows already present skips the re-append and only commits the
  * marker — sound because scores are DETERMINISTIC under the frozen
  * model, so the orphan rows are bit-identical to what the re-append
  * would write, and Spark's file-commit protocol makes the append
  * all-or-nothing (a crash mid-job leaves no visible rows). The
  * marker contract requires a DURABLE `checkpointDir` (stable batch
  * ids across restarts).
  */
object QualityMaintenance {

  /** Starts the scoring query: each micro-batch of `newDocs`
    * (`doc_id`, `text`) is scored under `storeName`'s frozen weights
    * into `scoresTable`. */
  def maintain(newDocs: DataFrame, storeName: String, scoresTable: String,
               markerTable: String, checkpointDir: String,
               erasureLedger: Option[String] = None): StreamingQuery = {
    require(checkpointDir.nonEmpty,
      "QualityMaintenance.maintain requires a durable checkpointDir: " +
        "replay-skip markers are only valid against stable batch ids")
    newDocs.writeStream
      .outputMode("append")
      .queryName(Maintenance.queryNameFor(scoresTable))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        scoreBatch(graft.index.Erasure.gateBatch(batch, erasureLedger),
          batchId, storeName, scoresTable, markerTable)
      }
      .start()
  }

  /** One micro-batch: score under the frozen model, append, then the
    * commit marker. Replay-safe via the marker; a replay that lands
    * in the crash window (scores appended, marker missing) ADOPTS the
    * existing rows instead of duplicating them. */
  def scoreBatch(batch: DataFrame, batchId: Long, storeName: String,
                 scoresTable: String, markerTable: String): Unit = {
    val spark = batch.sparkSession
    recoverStaging(spark, scoresTable)
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (!committed) {
      val orphaned = spark.catalog.tableExists(scoresTable) &&
        !spark.table(scoresTable).filter(col("batch_id") === batchId).isEmpty
      if (!orphaned)
        QualityStore.score(batch.select(col("doc_id"), col("text")), storeName)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").saveAsTable(scoresTable)
      batch.groupBy()
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("batch_id", lit(batchId))
        .select("batch_id", "n_docs")
        .write.mode("append").saveAsTable(markerTable)
    }
  }

  /** Rewrite the scores ledger into few files (per-batch appends
    * accumulate one small file set per micro-batch — the classic
    * streaming small-files problem). Rows and schema are unchanged;
    * serving is identical before and after. CONTRACT: run in a
    * maintenance window with the maintainer stopped (the SURVEY §6b
    * convention). Crash-safe via stage-then-swap (the
    * TrendMaintenance device, NOT a drop-then-rewrite from volatile
    * checkpoint blocks): the compacted ledger is fully written under
    * `<table>_staging` before the one vulnerable step (drop+rename);
    * a crash before the drop leaves the old ledger untouched, a crash
    * between drop and rename is healed by [[recoverStaging]] at every
    * entry point. */
  def compact(spark: org.apache.spark.sql.SparkSession,
              scoresTable: String, numFiles: Int = 1): Unit = {
    recoverStaging(spark, scoresTable)
    if (!spark.catalog.tableExists(scoresTable)) return
    val staging = scoresTable + "_staging"
    spark.table(scoresTable).coalesce(numFiles)
      .write.mode("overwrite").saveAsTable(staging)
    spark.sql(s"DROP TABLE IF EXISTS $scoresTable")
    spark.sql(s"ALTER TABLE $staging RENAME TO $scoresTable")
  }

  /** Crash recovery for [[compact]]'s stage-then-swap: a crash
    * between the DROP and the RENAME leaves no scores table but a
    * complete staged copy — adopt it. Called by every entry point
    * that reads or writes the scores table. */
  private def recoverStaging(spark: org.apache.spark.sql.SparkSession,
                             scoresTable: String): Unit = {
    val staging = scoresTable + "_staging"
    if (!spark.catalog.tableExists(scoresTable) &&
        spark.catalog.tableExists(staging))
      spark.sql(s"ALTER TABLE $staging RENAME TO $scoresTable")
  }

  /** Committed scores only (empty frame with the right schema when
    * nothing has committed): a crash between the scores append and
    * its marker never surfaces the orphan batch. */
  def scores(spark: org.apache.spark.sql.SparkSession, scoresTable: String,
             markerTable: String): DataFrame = {
    Freshness.refresh(spark, scoresTable, markerTable)
    recoverStaging(spark, scoresTable)
    if (!spark.catalog.tableExists(scoresTable) ||
        !spark.catalog.tableExists(markerTable))
      return spark.emptyDataFrame
        .select(lit(0L).as("doc_id"), lit(0).as("n_feats"),
          lit(0.0).as("score"), lit(0).as("keep"))
        .limit(0)
    spark.table(scoresTable)
      .join(broadcast(spark.table(markerTable).select("batch_id")),
        Seq("batch_id"), "left_semi")
      .drop("batch_id")
  }
}
