package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.index.DedupStore

/** Streaming maintenance for the near-dup artifact
  * (`graft.index.DedupStore`) — the fourth maintainer next to the
  * postings index (`IndexMaintenance`), the chunk ledger
  * (`ChunkDedup`) and the ANN codes (`VectorMaintenance`): a crawl
  * ingests document batches continuously; each micro-batch is
  * near-dup-checked against everything ingested BEFORE it, its pairs
  * land in an append-only pairs ledger, and the batch is then folded
  * into the store so the next batch checks against it too.
  *
  * Per micro-batch (all via the artifact's own serve/append code, so
  * streamed results are spec-equal to the batch-incremental loop):
  *
  *   1. `DedupStore.incrementalPairs(batch)` — new-vs-store plus
  *      new-vs-new candidates (band equi-joins, never re-shingling
  *      the store), exact-Jaccard verified, MATERIALIZED (the call
  *      localCheckpoints) before anything is appended — computing
  *      pairs after the append would double every batch shingle.
  *   2. Pairs append to `pairsTable` tagged with the batch id.
  *   3. `DedupStore.append(batch)` — the store ingests the batch.
  *   4. The `(batch_id, n_docs, n_pairs)` commit marker.
  *
  * Delivery: same commit-marker pattern as the other maintainers — a
  * replayed batch whose marker exists is skipped, so `checkpointDir`
  * must be durable (batch ids are only stable across restarts when
  * the query resumes from the same checkpoint). The
  * crash-between-appends-and-marker window re-runs the batch on
  * replay (duplicate pair rows, and a re-append with the batch
  * already in the store inflates its shingle counts); a transactional
  * table format closes it at this same seam.
  *
  * Caller contract: `DedupStore.build(...)` initialized the store
  * (an empty corpus frame is fine — the tables just start empty) and
  * doc ids are unique across the initial corpus and every batch.
  */
object DedupMaintenance {

  /** Starts the maintenance query over a stream of (`doc_id`, `text`)
    * rows; each micro-batch is handed to [[appendBatch]]. */
  def maintain(newDocs: DataFrame, storeName: String, pairsTable: String,
               markerTable: String, checkpointDir: String,
               tau: Double = 0.4,
               erasureLedger: Option[String] = None): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(graft.index.Erasure.gateBatch(batch, erasureLedger),
          batchId, storeName, pairsTable, markerTable, tau)
      }
      .start()

  /** One micro-batch: pairs vs the pre-batch store, pairs ledger
    * append, store append, then the commit marker. Replay-safe via
    * the marker. */
  def appendBatch(batch: DataFrame, batchId: Long, storeName: String,
                  pairsTable: String, markerTable: String,
                  tau: Double = 0.4): Unit = {
    val spark = batch.sparkSession
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (!committed) {
      // already materialized (localCheckpoint inside) — safe to append
      // the store afterwards without double-counting batch shingles
      val pairs = DedupStore.incrementalPairs(batch, storeName, tau)
      val nPairs = pairs.count()
      pairs.withColumn("batch_id", lit(batchId))
        .write.mode("append").saveAsTable(pairsTable)
      DedupStore.append(batch, storeName)
      batch.groupBy()
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("batch_id", lit(batchId))
        .withColumn("n_pairs", lit(nPairs))
        .select("batch_id", "n_docs", "n_pairs")
        .write.mode("append").saveAsTable(markerTable)
    }
  }

  /** All near-dup pairs the stream has found so far (doc_a, doc_b,
    * jaccard) — the union of every committed batch's increments.
    * Empty-but-typed before the first commit. */
  def allPairs(spark: SparkSession, pairsTable: String): DataFrame =
    { Freshness.refresh(spark, pairsTable)
    if (!spark.catalog.tableExists(pairsTable))
      spark.range(0).select(lit(0L).as("doc_a"), lit(0L).as("doc_b"),
        lit(0.0).as("jaccard")).limit(0)
    else spark.table(pairsTable).select("doc_a", "doc_b", "jaccard")
  }
}
