package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming PSI monitor (pl36's serving twin — the 16th maintainer):
  * the batch side freezes the corpus doc-length histogram over FIXED
  * 50-char buckets as a reference artifact; an ingest stream then gets
  * one row per micro-batch — the Population Stability Index of the
  * batch's length distribution against the baseline, the
  * feature-store-standard alarm for "this feed's SHAPE moved" (a
  * truncating scraper, a boilerplate flood, a wrong-field mapping all
  * shift the length histogram within one batch, before any content
  * signal fires). Numeric twin of [[DriftMonitor]]'s token KL: both
  * watch the same ingest, one for vocabulary drift, one for
  * length-shape drift.
  *
  * Convention (the DriftMonitor unseen-mass device, twice): buckets
  * the reference has no mass for hold the batch's `n_unseen` docs —
  * reported, never epsilon-smoothed into a log; reference buckets the
  * batch misses are `n_missing_buckets` — PSI's other infinity,
  * likewise reported instead of smoothed. Every summed term is then
  * exactly defined, and the seen-bucket distribution renormalizes to
  * `n_seen` like driftRow's.
  *
  * Scale: the reference is ≤ |buckets| rows (a dozen); each batch
  * collapses to its own bucket counts in one partial-agg pass; the
  * ledger gets ONE row per batch.
  *
  * Delivery: commit-marker pattern with orphan ADOPTION, committed-only
  * serve. Requires a DURABLE `checkpointDir` (stable batch ids).
  */
object PsiMonitor {

  /** Fixed bucket width in chars — frozen WITH the baseline window:
    * a data-derived edge would move under the drift it measures. */
  val BucketChars = 50

  private def bucketOf(c: org.apache.spark.sql.Column) =
    floor(c / lit(BucketChars)).as("bucket")

  /** Freeze the reference histogram: `<name>_ref` (bucket, c_r).
    * Overwrites. ONE artifact by design — the total and bucket count
    * derive from this table at serve time, so no second table exists
    * to crash-pair with (the DriftMonitor stale-total lesson). */
  def buildReference(docs: DataFrame, name: String): Unit =
    docs.select(bucketOf(col("n_chars")))
      .groupBy("bucket").agg(count(lit(1)).as("c_r"))
      .write.mode("overwrite").saveAsTable(s"${name}_ref")

  /** Starts the monitor: one PSI row per micro-batch of `newDocs`
    * (`doc_id`, `n_chars`) into `ledgerTable`. */
  def maintain(newDocs: DataFrame, name: String, ledgerTable: String,
               markerTable: String, checkpointDir: String,
               erasureLedger: Option[String] = None): StreamingQuery = {
    require(checkpointDir.nonEmpty,
      "PsiMonitor.maintain requires a durable checkpointDir: " +
        "replay-skip markers are only valid against stable batch ids")
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        psiBatch(graft.index.Erasure.gateBatch(batch, erasureLedger),
          batchId, name, ledgerTable, markerTable)
      }
      .start()
  }

  /** One micro-batch: PSI row vs the FROZEN reference, then the
    * commit marker. Replay-safe; crash window closed by adoption. */
  def psiBatch(batch: DataFrame, batchId: Long, name: String,
               ledgerTable: String, markerTable: String): Unit = {
    val spark = batch.sparkSession
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (!committed) {
      val orphaned = spark.catalog.tableExists(ledgerTable) &&
        !spark.table(ledgerTable).filter(col("batch_id") === batchId).isEmpty
      if (!orphaned)
        psiRow(batch, name)
          .withColumn("batch_id", lit(batchId))
          .select("batch_id", "n_docs", "n_unseen", "n_missing_buckets",
            "psi")
          .write.mode("append").saveAsTable(ledgerTable)
      batch.groupBy().agg(count(lit(1)).as("n_docs"))
        .withColumn("batch_id", lit(batchId))
        .select("batch_id", "n_docs")
        .write.mode("append").saveAsTable(markerTable)
    }
  }

  /** The 1-row PSI frame for a static slice vs the frozen reference —
    * shared by the streaming path and batch spot-checks. PSI over the
    * buckets both sides occupy, batch side renormalized to `n_seen`;
    * rounds to 6 decimals (bucket-count sums, far above ULP noise). */
  def psiRow(slice: DataFrame, name: String): DataFrame = {
    val spark = slice.sparkSession
    val ref = spark.table(s"${name}_ref")
    val bt = slice.select(bucketOf(col("n_chars")))
      .groupBy("bucket").agg(count(lit(1)).as("c_b"))
    val joined = bt.join(broadcast(ref), Seq("bucket"), "left")
    val seenTot = joined.filter(col("c_r").isNotNull)
      .agg(coalesce(sum("c_b"), lit(0L)).as("n_seen"))
    // total and bucket count derive from the SAME table as the
    // per-bucket counts — they cannot disagree with it
    val refTot = ref.agg(sum("c_r").as("n_r"))
    val refBuckets = ref.agg(count(lit(1)).as("n_ref_buckets"))
    joined
      .crossJoin(broadcast(seenTot))
      .crossJoin(broadcast(refTot))
      .agg(
        coalesce(sum(col("c_b")), lit(0L)).as("n_docs"),
        coalesce(sum(when(col("c_r").isNull, col("c_b")).otherwise(0L)),
          lit(0L)).as("n_unseen"),
        coalesce(sum(when(col("c_r").isNotNull, 1L).otherwise(0L)), lit(0L))
          .as("n_known_buckets"),
        graft.functions.ParityFunctions.duckRound(
          coalesce(sum(when(col("c_r").isNotNull,
            (col("c_b").cast("double") / col("n_seen").cast("double") -
             col("c_r").cast("double") / col("n_r").cast("double")) *
              log((col("c_b").cast("double") * col("n_r").cast("double")) /
                  (col("n_seen").cast("double") * col("c_r").cast("double"))))
            .otherwise(0.0)), lit(0.0)), 6).as("psi"))
      .crossJoin(broadcast(refBuckets))
      .select(col("n_docs"), col("n_unseen"),
        (col("n_ref_buckets") - col("n_known_buckets"))
          .as("n_missing_buckets"),
        col("psi"))
  }

  /** Committed PSI rows only (empty when nothing has committed). */
  def psis(spark: SparkSession, ledgerTable: String,
           markerTable: String): DataFrame = {
    Freshness.refresh(spark, ledgerTable, markerTable)
    if (!spark.catalog.tableExists(ledgerTable) ||
        !spark.catalog.tableExists(markerTable))
      return spark.range(0)
        .select(col("id").as("batch_id"), lit(0L).as("n_docs"),
          lit(0L).as("n_unseen"), lit(0L).as("n_missing_buckets"),
          lit(0.0).as("psi"))
    spark.table(ledgerTable)
      .join(broadcast(spark.table(markerTable).select("batch_id")),
        Seq("batch_id"), "left_semi")
  }
}
