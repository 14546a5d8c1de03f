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
  * Delivery: the stats-ledger row doubles as the batch's COMMIT
  * MARKER, written after the postings — `appendBatch` skips any batch
  * whose marker already exists, so a replayed micro-batch (restart
  * after the marker landed) is a no-op. The remaining window — crash
  * AFTER a partial postings append but BEFORE the marker — duplicates
  * postings on replay; closing it needs a transactional table format
  * under the same seam (this is exactly the boundary such formats
  * exist for). Per-file compaction of the many small bucket appends
  * is the standard operational counterpart (rewrite N appended file
  * sets into one, same bucket spec).
  */
object IndexMaintenance {

  /** Default bucket count for the postings table — the IndexStore
    * test-SF sizing. Appends MUST match the bucket count the table was
    * built with; `saveAsTable(append)` enforces it loudly on mismatch,
    * so a deployment that built at hundreds of buckets (SURVEY §6b)
    * passes its count here. */
  val DefaultBuckets = 8

  /** Starts the maintenance query: each micro-batch of `newDocs`
    * (`doc_id`, `text`) is handed to `appendBatch`.
    *
    * `checkpointDir` is REQUIRED and must be durable: the commit-marker
    * replay-skip keys on `batchId`, and batch ids are only stable
    * across restarts when the query resumes from the same checkpoint —
    * a temp checkpoint restarts ids at 0 and old markers would silently
    * swallow new batches. */
  def maintain(newDocs: DataFrame, termDocTable: String,
               statsTable: String, checkpointDir: String,
               buckets: Int = DefaultBuckets): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, batchId, termDocTable, statsTable, buckets)
      }
      .start()

  /** One micro-batch: tokenize into positional postings, append to
    * the bucketed table, then write the (batch_id, n_docs) commit
    * marker. Replay-safe: a batch whose marker exists is skipped.
    */
  def appendBatch(batch: DataFrame, batchId: Long,
                  termDocTable: String, statsTable: String,
                  buckets: Int = DefaultBuckets): Unit = {
    val spark = batch.sparkSession
    // the batch may be the session's first graft work (no tables.load
    // ran): the tokenizer below resolves from the session registry
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    // a crashed compact swap may have left the postings under the
    // staging name; adopt BEFORE the append or this batch would start
    // a fresh table and strand the staged artifact forever
    recoverStaging(spark, termDocTable)
    val committed = spark.catalog.tableExists(statsTable) &&
      !spark.table(statsTable).filter(col("batch_id") === batchId).isEmpty
    if (!committed) {
      graft.queries.Text.termDocPositionalOf(batch)
        .write.mode("append")
        .bucketBy(buckets, "token").sortBy("token")
        .saveAsTable(termDocTable)
      batch.groupBy()
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("batch_id", lit(batchId))
        .select("batch_id", "n_docs")
        .write.mode("append").saveAsTable(statsTable)
    }
  }

  /** Total corpus size from the stats ledger. */
  def docCount(spark: org.apache.spark.sql.SparkSession,
               statsTable: String): Long =
    spark.table(statsTable)
      .agg(coalesce(sum("n_docs"), lit(0L))).head.getLong(0)

  /** Document DELETION — the other half of maintenance. A delete never
    * rewrites the bucketed postings (that would be an O(index) job for
    * an O(1) request): the ids are appended to a tombstone side table
    * and serving plans subtract them via `withoutDeleted`. The stats
    * ledger gets a negative increment so `docCount` (BM25's N) tracks
    * the LIVE corpus. Idempotent: ids already tombstoned are ignored,
    * so a replayed delete neither double-appends nor double-decrements.
    * Caller contract: ids should belong to the indexed corpus (the
    * ledger trusts them; tombstoning a never-indexed id would skew N).
    */
  def deleteDocs(spark: org.apache.spark.sql.SparkSession,
                 docIds: Seq[Long], tombstoneTable: String,
                 statsTable: String): Unit = {
    import spark.implicits._
    if (docIds.nonEmpty) {
      val requested = docIds.distinct.toDF("doc_id")
      val fresh =
        if (spark.catalog.tableExists(tombstoneTable))
          requested.join(spark.table(tombstoneTable), Seq("doc_id"), "left_anti")
        else requested
      val n = fresh.count()
      if (n > 0) {
        fresh.write.mode("append").saveAsTable(tombstoneTable)
        Seq((TombstoneBatchId, -n)).toDF("batch_id", "n_docs")
          .write.mode("append").saveAsTable(statsTable)
      }
    }
  }

  /** Ledger batch id for delete decrements — streaming batch ids are
    * ≥ 0, so the commit-marker check never collides with these rows. */
  private val TombstoneBatchId = -2L

  /** Serve-time tombstone application: a BROADCAST anti-join (the
    * tombstone set is small by construction — it is cleared at every
    * compaction), so serving plans keep their zero-exchange bucketed
    * scan and pay one map-side hash probe. Pass-through when no
    * tombstone table exists. */
  def withoutDeleted(postings: DataFrame, tombstoneTable: String): DataFrame = {
    val spark = postings.sparkSession
    if (!spark.catalog.tableExists(tombstoneTable)) postings
    else postings.join(broadcast(spark.table(tombstoneTable).select("doc_id")),
      Seq("doc_id"), "left_anti")
  }

  /** The maintained postings as a DataFrame — the serve-side entry
    * point, healing a crashed compact swap first (the serving read
    * must never find "no table" while a complete staged artifact
    * sits one rename away). */
  def postings(spark: org.apache.spark.sql.SparkSession,
               termDocTable: String): DataFrame = {
    recoverStaging(spark, termDocTable)
    spark.table(termDocTable)
  }

  /** Compaction — the operational counterpart of append-only
    * maintenance: every micro-batch adds one file set per bucket, and
    * a thousand appends mean a thousand small files per bucket scan.
    * Rewrites the table as ONE file set with the SAME bucket spec
    * (serving plans keep their zero-exchange property).
    */
  def compact(spark: org.apache.spark.sql.SparkSession,
              termDocTable: String): Unit =
    compact(spark, termDocTable, tombstoneTable = None)

  /** Compaction that also PURGES tombstoned documents: the rewrite
    * anti-joins the tombstones (physically dropping their postings)
    * and then clears the tombstone table, returning `withoutDeleted`
    * to a pass-through. The ledger is untouched — it was already
    * decremented at delete time, and purging changes only where the
    * deletion is represented, not the live count.
    *
    * CONTRACT: run in a maintenance window with the maintainer stopped
    * (SURVEY §6b). Crash-safe via stage-then-swap (the TrendMaintenance
    * protocol — this replaced a localCheckpoint→DROP→rewrite sequence
    * whose crash window PERMANENTLY lost the whole postings artifact,
    * since localCheckpoint blocks die with the JVM): the compacted
    * postings are fully written under `<table>_staging` — read straight
    * from the live files, no artifact-sized memory pin — before the one
    * vulnerable step (drop + rename). A crash before the drop leaves
    * the live table untouched; a crash between drop and rename is
    * healed by [[recoverStaging]] at every entry point. The bucket spec
    * travels with the staged table's metadata, so the swap preserves
    * the zero-exchange serving property (spec-pinned). Tombstones are
    * cleared only AFTER the swap: a crash before that leaves them
    * anti-joining already-purged ids — a no-op, cleared next compact. */
  def compact(spark: org.apache.spark.sql.SparkSession,
              termDocTable: String, tombstoneTable: Option[String],
              buckets: Int = DefaultBuckets): Unit = {
    recoverStaging(spark, termDocTable)
    if (!spark.catalog.tableExists(termDocTable)) return
    val live = tombstoneTable
      .map(t => withoutDeleted(spark.table(termDocTable), t))
      .getOrElse(spark.table(termDocTable))
    val staging = termDocTable + "_staging"
    live.repartition(col("token"))
      .write.mode("overwrite")
      .bucketBy(buckets, "token").sortBy("token")
      .saveAsTable(staging)
    spark.sql(s"DROP TABLE IF EXISTS $termDocTable")
    spark.sql(s"ALTER TABLE $staging RENAME TO $termDocTable")
    tombstoneTable.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  /** Crash recovery for [[compact]]'s stage-then-swap: a crash between
    * the DROP and the RENAME leaves no postings table but a complete
    * staged one — adopt it. (RENAME is sound here because the postings
    * table is bucketed but NOT partitioned: the in-memory catalog's
    * rename pitfall is stale per-PARTITION locations, and the bucket
    * spec lives in table metadata, which the rename carries.) Called by
    * every entry point that reads or writes the postings table. */
  private def recoverStaging(spark: org.apache.spark.sql.SparkSession,
                             termDocTable: String): Unit = {
    val staging = termDocTable + "_staging"
    if (!spark.catalog.tableExists(termDocTable) &&
        spark.catalog.tableExists(staging))
      spark.sql(s"ALTER TABLE $staging RENAME TO $termDocTable")
  }
}
