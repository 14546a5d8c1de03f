package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of the substring-level duplication report (dd14,
  * `graft.queries.Dedup.substringDupReport`): a crawl ingests
  * documents continuously, and re-digesting 100 TB of stride-1
  * windows per refresh is exactly what an incremental ledger avoids.
  * Each micro-batch digests ONLY its own documents
  * (`Dedup.substringWindowDigestsOf` — the same windowing the batch
  * report uses, so the two stay spec-equal by construction) and
  * appends per-window `(ch, nd)` distinct-doc-count increments to an
  * append-only ledger; global window frequency is the sum per digest.
  * Correct because doc ids are unique across batches (the
  * IndexMaintenance append contract), so per-batch distinct counts
  * add up to the corpus-wide distinct count.
  *
  * Scale shape: the ledger's shuffle key is the window md5 (32 fixed
  * chars, high uniform cardinality — no salting), increments are one
  * row per distinct window per batch — ~batch token count, the
  * inherent stride-1 price dd14 documents — and serving re-digests
  * only the corpus being REPORTED ON, never past batches' raw text.
  * The span merge at serve time is dd14's own doc-partitioned window.
  *
  * Delivery: the `ChunkDedup` commit-marker pattern — the per-batch
  * `(batch_id, n_docs)` marker row is written AFTER the increments,
  * and a replayed batch whose marker exists is skipped. The
  * crash-between-append-and-marker window duplicates increments on
  * replay; a transactional table format closes it at this same seam.
  * (Duplicated increments can only overcount `nd`, which flips
  * windows to "duplicated" early — never drops a real duplicate.)
  */
object SubstringDedup {

  /** Starts the ledger-maintenance query: each micro-batch of
    * `newDocs` (`doc_id`, `text`) is handed to [[appendBatch]].
    *
    * `checkpointDir` is REQUIRED and must be durable: the
    * commit-marker replay-skip keys on `batchId`, and batch ids are
    * only stable across restarts when the query resumes from the same
    * checkpoint. With a temp checkpoint a restarted query re-counts
    * from 0 and appendBatch would silently SKIP new data whose id
    * collides with an old marker. */
  def maintain(newDocs: DataFrame, windowTable: String,
               markerTable: String, checkpointDir: String): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, batchId, windowTable, markerTable)
      }
      .start()

  /** One micro-batch: digest the batch's windows, append `(ch, nd)`
    * increments, then the commit marker. Replay-safe via the marker. */
  def appendBatch(batch: DataFrame, batchId: Long,
                  windowTable: String, markerTable: String): Unit = {
    val spark = batch.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (!committed) {
      graft.queries.Dedup.substringWindowDigestsOf(
          batch.select(col("doc_id"),
            graft.functions.TextFunctions.tokens(col("text")).as("tk")))
        .groupBy("ch")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .write.mode("append").saveAsTable(windowTable)
      batch.groupBy()
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("batch_id", lit(batchId))
        .select("batch_id", "n_docs")
        .write.mode("append").saveAsTable(markerTable)
    }
  }

  /** Corpus-wide window frequency from the ledger: sum of the
    * per-batch distinct-doc increments per digest. Empty-but-typed
    * when no batch has committed yet. */
  def windowFrequency(spark: SparkSession, windowTable: String): DataFrame =
    if (!spark.catalog.tableExists(windowTable))
      spark.range(0).select(lit("").as("ch"), lit(0L).as("nd")).limit(0)
    else spark.table(windowTable).groupBy("ch").agg(sum("nd").as("nd"))

  /** Serve-time dd14 report for `documents` (`doc_id`, `text`)
    * against the MAINTAINED ledger — same schema as the batch report
    * (`doc_id`, `n_tokens`, `n_spans`, `dup_tokens`, `dup_frac`).
    * When the ledger was fed exactly this corpus, the output equals
    * `Dedup.substringDupReport(documents)` (spec-pinned). */
  def substringDupReportServed(documents: DataFrame,
                               windowTable: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = documents.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    import graft.queries.Dedup
    // persisted: tk feeds the window stream AND the final report join
    // (the substringSpanFrames rationale — tokenize the corpus once)
    val tk = documents.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("tk"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dupStarts = Dedup.substringWindowDigestsOf(tk)
      .join(windowFrequency(spark, windowTable).filter(col("nd") >= 2), "ch")
      .select("doc_id", "start")
    Dedup.substringReportFrom(tk, Dedup.spansFromStarts(dupStarts))
  }
}
