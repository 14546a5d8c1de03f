package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming distribution-drift monitor (tx36's serving twin — the
  * 8th maintainer, second model-serving one): the batch side freezes
  * the corpus token marginals as a reference artifact; an ingest
  * stream then gets one drift row per micro-batch — KL(P_batch ∥
  * P_ref) over the tokens the reference knows, plus the UNSEEN token
  * mass (novel-vocabulary fraction, itself the sharpest drift signal
  * and the reason no smoothing is needed: unseen tokens are reported,
  * not log-zeroed). This is the alert feed a pipeline watches to
  * catch a broken scraper, a spam flood or a wrong-language feed
  * within one micro-batch of it starting.
  *
  * Scale: the reference is |vocab| rows; each batch collapses to its
  * own token counts in one partial-agg pass, every join after is
  * vocabulary-sized, and the ledger gets ONE row per batch.
  *
  * Delivery: commit-marker pattern with orphan ADOPTION (the
  * QualityMaintenance/TrendMaintenance device): a replay that finds
  * the batch's drift row already present skips recomputation and only
  * commits the marker; serving filters to committed batch ids.
  * Requires a DURABLE `checkpointDir` (stable batch ids).
  */
object DriftMonitor {

  /** Freeze the reference distribution: per-token counts
    * `<name>_ref` (token, c_t). Overwrites. ONE artifact by design:
    * the total `n` is derived from this table at serve time
    * (vocabulary-sized sum, already scanned for the join), so there is
    * no second table to crash-pair with — a rebuild that dies can
    * leave an old or missing reference, never a NEW ref silently
    * normalized by an OLD total (the KL-skewing failure the earlier
    * two-table layout allowed between its writes). */
  def buildReference(docs: DataFrame, name: String): Unit = {
    docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("c_t"))
      .write.mode("overwrite").saveAsTable(s"${name}_ref")
  }

  /** Starts the monitor: one drift row per micro-batch of `newDocs`
    * (`doc_id`, `text`) into `ledgerTable`. */
  def maintain(newDocs: DataFrame, name: String, ledgerTable: String,
               markerTable: String, checkpointDir: String,
               erasureLedger: Option[String] = None): StreamingQuery = {
    require(checkpointDir.nonEmpty,
      "DriftMonitor.maintain requires a durable checkpointDir: " +
        "replay-skip markers are only valid against stable batch ids")
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        driftBatch(graft.index.Erasure.gateBatch(batch, erasureLedger),
          batchId, name, ledgerTable, markerTable)
      }
      .start()
  }

  /** One micro-batch: drift row vs the FROZEN reference, then the
    * commit marker. Replay-safe; crash window closed by adoption. */
  def driftBatch(batch: DataFrame, batchId: Long, name: String,
                 ledgerTable: String, markerTable: String): Unit = {
    val spark = batch.sparkSession
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (!committed) {
      val orphaned = spark.catalog.tableExists(ledgerTable) &&
        !spark.table(ledgerTable).filter(col("batch_id") === batchId).isEmpty
      if (!orphaned)
        driftRow(batch, name)
          .withColumn("batch_id", lit(batchId))
          .select("batch_id", "n_tokens", "n_unseen", "kl")
          .write.mode("append").saveAsTable(ledgerTable)
      batch.groupBy().agg(count(lit(1)).as("n_docs"))
        .withColumn("batch_id", lit(batchId))
        .select("batch_id", "n_docs")
        .write.mode("append").saveAsTable(markerTable)
    }
  }

  /** The 1-row drift frame for a static slice vs the frozen reference
    * — shared by the streaming path and batch spot-checks. KL is over
    * the seen-token distribution (renormalized to n_seen); unseen
    * mass is reported in `n_unseen`. Empty/fully-unseen slices get
    * kl=0 rather than NULL. KL rounds to 6 decimals (the tx36
    * determinism argument: vocabulary-sized sums, ~1e-15 noise). */
  def driftRow(slice: DataFrame, name: String): DataFrame = {
    val spark = slice.sparkSession
    val bt = slice
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("c_b"))
    val joined = bt
      .join(broadcast(spark.table(s"${name}_ref")), Seq("token"), "left")
    val seenTot = joined.filter(col("c_t").isNotNull)
      .agg(coalesce(sum("c_b"), lit(0L)).as("n_seen"))
    // n derived from the SAME table the per-token counts came from —
    // ref and total cannot disagree (see buildReference)
    val refTot = spark.table(s"${name}_ref").agg(sum("c_t").as("n"))
    joined
      .crossJoin(broadcast(seenTot))
      .crossJoin(broadcast(refTot))
      .agg(
        coalesce(sum(col("c_b")), lit(0L)).as("n_tokens"),
        coalesce(sum(when(col("c_t").isNull, col("c_b")).otherwise(0L)),
          lit(0L)).as("n_unseen"),
        graft.functions.ParityFunctions.duckRound(
          coalesce(sum(when(col("c_t").isNotNull,
            (col("c_b").cast("double") / col("n_seen").cast("double")) *
              log((col("c_b").cast("double") * col("n").cast("double")) /
                  (col("n_seen").cast("double") * col("c_t").cast("double"))))
            .otherwise(0.0)), lit(0.0)), 6).as("kl"))
  }

  /** Committed drift rows only (empty when nothing has committed). */
  def drifts(spark: SparkSession, ledgerTable: String,
             markerTable: String): DataFrame = {
    Freshness.refresh(spark, ledgerTable, markerTable)
    if (!spark.catalog.tableExists(ledgerTable) ||
        !spark.catalog.tableExists(markerTable))
      return spark.range(0)
        .select(col("id").as("batch_id"), lit(0L).as("n_tokens"),
          lit(0L).as("n_unseen"), lit(0.0).as("kl"))
    spark.table(ledgerTable)
      .join(broadcast(spark.table(markerTable).select("batch_id")),
        Seq("batch_id"), "left_semi")
  }
}
