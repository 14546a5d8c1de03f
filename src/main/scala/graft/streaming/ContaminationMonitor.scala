package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming benchmark-contamination monitor (pl01's serving twin —
  * the 12th maintainer, fourth model-serving one): the batch side
  * freezes the held-out benchmark's 5-gram set as a reference artifact;
  * an ingest stream then gets one contamination row per micro-batch —
  * how many docs carry at least one benchmark 5-gram, and how many
  * total hits — so eval data leaking into the TRAINING STREAM is caught
  * at the ingest seam, not months later by an eval-score jump. pl01
  * remains the batch audit of the corpus at rest; this is the same
  * check run continuously at the door.
  *
  * Scale: the reference is |eval 5-grams| rows (eval-set-bounded —
  * benchmarks are thousands of docs, not billions — so it BROADCASTS
  * at any corpus size); each batch's n-gram stream is map-side
  * generated and semi-joined against the broadcast before anything
  * shuffles; the ledger gets ONE row per batch.
  *
  * Delivery: commit-marker pattern with orphan adoption (the
  * DriftMonitor device — single-row ledger writes make partial
  * visibility a non-issue). Requires a DURABLE `checkpointDir`
  * (replay-skip markers are only valid against stable batch ids).
  *
  * Reference: src/InvertedIndexer.java:48-64's side-file distribution
  * is the same shape — a small filter set shipped to every worker.
  */
object ContaminationMonitor {

  private def ngramsOf(text: Column): Column = {
    val tk = graft.functions.TextFunctions.tokens(text)
    // 5-grams, exactly pl01's generation: the frozen reference and the
    // batch scorer must tokenize and shingle identically
    graft.functions.TextFunctions.wordNgramsOf(tk, 5)
  }

  /** Freeze the benchmark reference: `<name>_ref` (ngram) — the
    * DISTINCT 5-grams of the eval docs (`text` column). Overwrites.
    * One artifact; nothing else to crash-pair with. */
  def buildRef(evalDocs: DataFrame, name: String): Unit = {
    graft.expressions.VectorExpressions.ensureRegistered(evalDocs.sparkSession)
    evalDocs.select(explode(ngramsOf(col("text"))).as("ngram"))
      .distinct()
      .write.mode("overwrite").saveAsTable(s"${name}_ref")
  }

  /** Starts the monitor: one contamination row per micro-batch of
    * `newDocs` (`doc_id`, `text`) into `ledgerTable`. */
  def maintain(newDocs: DataFrame, name: String, ledgerTable: String,
               markerTable: String, checkpointDir: String,
               erasureLedger: Option[String] = None): StreamingQuery = {
    require(checkpointDir.nonEmpty,
      "ContaminationMonitor.maintain requires a durable checkpointDir: " +
        "replay-skip markers are only valid against stable batch ids")
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        contaminationBatch(
          graft.index.Erasure.gateBatch(batch, erasureLedger),
          batchId, name, ledgerTable, markerTable)
      }
      .start()
  }

  /** One micro-batch: contamination row vs the FROZEN reference, then
    * the commit marker. Replay-safe; crash window closed by adoption
    * (single-row ledger writes). */
  def contaminationBatch(batch: DataFrame, batchId: Long, name: String,
                         ledgerTable: String, markerTable: String): Unit = {
    val spark = batch.sparkSession
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (!committed) {
      val orphaned = spark.catalog.tableExists(ledgerTable) &&
        !spark.table(ledgerTable).filter(col("batch_id") === batchId).isEmpty
      if (!orphaned)
        contaminationRow(batch, name)
          .withColumn("batch_id", lit(batchId))
          .select("batch_id", "n_docs", "n_dirty", "n_hits")
          .write.mode("append").saveAsTable(ledgerTable)
      batch.groupBy().agg(count(lit(1)).as("n_docs"))
        .withColumn("batch_id", lit(batchId))
        .select("batch_id", "n_docs")
        .write.mode("append").saveAsTable(markerTable)
    }
  }

  /** The 1-row contamination frame for a static slice vs the frozen
    * reference — shared by the streaming path and batch spot-checks.
    * `n_dirty` = docs with ≥1 benchmark 5-gram, `n_hits` = total
    * benchmark-5-gram occurrences. All exact integer counts. */
  def contaminationRow(slice: DataFrame, name: String): DataFrame = {
    val spark = slice.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    val ref = spark.table(s"${name}_ref")
    // per-doc hit counts first (map-side ngram stream semi-reduced by
    // the broadcast inner join), then the batch-level fold
    val hits = slice
      .select(col("doc_id"), explode(ngramsOf(col("text"))).as("ngram"))
      .join(broadcast(ref), Seq("ngram"))
      .groupBy("doc_id").agg(count(lit(1)).as("h"))
    val total = slice.groupBy().agg(count(lit(1)).as("n_docs"))
    total.crossJoin(broadcast(
      hits.groupBy().agg(
        coalesce(count(lit(1)), lit(0L)).as("n_dirty"),
        coalesce(sum("h"), lit(0L)).as("n_hits"))))
  }

  /** Committed contamination rows only (empty when nothing committed). */
  def contamination(spark: SparkSession, ledgerTable: String,
                    markerTable: String): DataFrame = {
    Freshness.refresh(spark, ledgerTable, markerTable)
    if (!spark.catalog.tableExists(ledgerTable) ||
        !spark.catalog.tableExists(markerTable))
      return spark.range(0)
        .select(col("id").as("batch_id"), lit(0L).as("n_docs"),
          lit(0L).as("n_dirty"), lit(0L).as("n_hits"))
    spark.table(ledgerTable)
      .join(broadcast(spark.table(markerTable).select("batch_id")),
        Seq("batch_id"), "left_semi")
  }
}
