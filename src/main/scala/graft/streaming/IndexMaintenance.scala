package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental maintenance of the positional index artifact — the
  * missing half of build-once/serve-many: the corpus keeps growing,
  * and re-tokenizing 100 TB to refresh the index is exactly what the
  * artifact exists to avoid. New documents only ever ADD postings
  * (doc ids are unique), so maintenance is an APPEND into the saved
  * bucketed table: each micro-batch tokenizes just its own documents
  * and writes them with the SAME bucketing spec, so every serving
  * plan keeps its zero-exchange bucketed-scan property while the
  * index grows.
  *
  * Corpus stats are maintained as an append-only ledger of per-batch
  * (batch_id, n_docs) increments — `docCount` sums it. Appending a
  * one-row delta is cheaper and safer than overwriting a shared
  * one-row table from inside a micro-batch.
  *
  * Delivery caveat (documented, inherent to foreachBatch over plain
  * parquet tables): a batch retried after a partial write could
  * append twice. The `batch_id` column in the stats ledger makes
  * replays detectable; a production deployment puts a transactional
  * table format or a MERGE-capable sink under the same foreachBatch
  * seam. Per-file compaction of the many small bucket appends is the
  * standard operational counterpart (rewrite N appended file sets
  * into one, same bucket spec).
  */
object IndexMaintenance {

  /** Starts the maintenance query: each micro-batch of `newDocs`
    * (`doc_id`, `text`) is tokenized into positional postings and
    * appended to `termDocTable` (existing bucketed-by-`token` table);
    * a (batch_id, n_docs) row is appended to `statsTable`.
    */
  def maintain(newDocs: DataFrame, termDocTable: String,
               statsTable: String): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.queries.Text.termDocPositionalOf(batch)
          .write.mode("append")
          .bucketBy(8, "token").sortBy("token")
          .saveAsTable(termDocTable)
        batch.groupBy()
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("batch_id", lit(batchId))
          .select("batch_id", "n_docs")
          .write.mode("append").saveAsTable(statsTable)
        ()
      }
      .start()

  /** Total corpus size from the stats ledger. */
  def docCount(spark: org.apache.spark.sql.SparkSession,
               statsTable: String): Long =
    spark.table(statsTable)
      .agg(coalesce(sum("n_docs"), lit(0L))).head.getLong(0)
}
