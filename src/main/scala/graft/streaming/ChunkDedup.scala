package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of the chunk-level boilerplate detector (dd09,
  * `graft.queries.Dedup.chunkReportOf`): a crawl ingests documents
  * continuously, and re-chunking 100 TB per refresh is exactly what an
  * incremental ledger avoids. Each micro-batch chunks ONLY its own
  * documents (`Dedup.chunkDigestsOf` — the same chunking the batch
  * report uses, so the two stay spec-equal by construction) and
  * appends per-chunk `(ch, nd)` document-count increments to an
  * append-only ledger table; global chunk frequency is the sum per
  * digest. Correct because doc ids are unique across batches (the
  * IndexMaintenance append contract), so per-batch distinct counts add
  * up to the corpus-wide distinct count.
  *
  * Scale shape: the shuffle key is the chunk md5 (32 fixed chars, high
  * uniform cardinality — no salting needed), the ledger grows by one
  * row per distinct chunk per batch, and compaction is a by-digest
  * re-aggregation (same operational counterpart as the postings
  * table's). Serving (`sharedChunkReport`) joins a corpus's chunks
  * against the aggregated ledger — at serve time nothing re-reads
  * past batches' raw text.
  *
  * Delivery: same commit-marker pattern as `IndexMaintenance` — the
  * per-batch `(batch_id, n_docs)` marker row is written AFTER the
  * increments, and a replayed batch whose marker exists is skipped.
  * The crash-between-append-and-marker window duplicates increments on
  * replay; a transactional table format closes it at this same seam.
  */
object ChunkDedup {

  /** Starts the ledger-maintenance query: each micro-batch of
    * `newDocs` (`doc_id`, `text`) is handed to [[appendBatch]].
    *
    * `checkpointDir` is REQUIRED and must be durable: the commit-marker
    * replay-skip keys on `batchId`, and batch ids are only stable
    * across restarts when the query resumes from the same checkpoint.
    * With a temp checkpoint a restarted query re-counts from 0 and
    * appendBatch would silently SKIP new data whose id collides with
    * an old marker. */
  def maintain(newDocs: DataFrame, chunkTable: String,
               markerTable: String, checkpointDir: String): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, batchId, chunkTable, markerTable)
      }
      .start()

  /** One micro-batch: chunk the batch's docs, append `(ch, nd)`
    * increments, then the commit marker. Replay-safe via the marker. */
  def appendBatch(batch: DataFrame, batchId: Long,
                  chunkTable: String, markerTable: String): Unit = {
    val spark = batch.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (!committed) {
      graft.queries.Dedup.chunkDigestsOf(
          batch.select(col("doc_id"),
            graft.functions.TextFunctions.tokens(col("text")).as("tk")))
        .groupBy("ch")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .write.mode("append").saveAsTable(chunkTable)
      batch.groupBy()
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("batch_id", lit(batchId))
        .select("batch_id", "n_docs")
        .write.mode("append").saveAsTable(markerTable)
    }
  }

  /** Corpus-wide chunk frequency from the ledger: sum of the per-batch
    * distinct-doc increments per digest. Empty-but-typed when no batch
    * has committed yet. */
  def chunkFrequency(spark: SparkSession, chunkTable: String): DataFrame =
    { Freshness.refresh(spark, chunkTable)
    if (!spark.catalog.tableExists(chunkTable))
      spark.range(0).select(lit("").as("ch"), lit(0L).as("nd")).limit(0)
    else spark.table(chunkTable).groupBy("ch").agg(sum("nd").as("nd"))
    }

  /** Serve-time report for `documents` (`doc_id`, `text`) against the
    * MAINTAINED ledger — same schema as the batch report
    * (`doc_id`, `n_chunks`, `n_shared`, `shared_frac`). When the
    * ledger was fed exactly this corpus, the output equals
    * `Dedup.chunkReportOf(documents)` (spec-pinned). */
  def sharedChunkReport(documents: DataFrame, chunkTable: String): DataFrame = {
    val spark = documents.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    import graft.queries.Dedup.{chunkDigestsOf, ChunkTokens}
    val tk = documents.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("tk"))
    val perDoc = chunkDigestsOf(tk)
      .join(chunkFrequency(spark, chunkTable), "ch")
      .groupBy("doc_id")
      .agg(sum(when(col("nd") >= 2, 1).otherwise(0)).cast("int").as("n_shared"))
    tk.select(col("doc_id"),
        (size(col("tk")) / lit(ChunkTokens)).cast("int").as("n_chunks"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_shared"), lit(0)).as("n_shared"),
        graft.functions.ParityFunctions.duckRound(
          coalesce(col("n_shared"), lit(0)).cast("double") /
            greatest(col("n_chunks"), lit(1)).cast("double"), 6)
          .as("shared_frac"))
      .orderBy("doc_id")
  }
}
