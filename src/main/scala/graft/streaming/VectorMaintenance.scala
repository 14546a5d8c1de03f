package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.index.VectorStore

/** Streaming ingest into the ANN artifact (`graft.index.VectorStore`)
  * — the third streaming-maintenance twin beside `IndexMaintenance`
  * (postings) and `ChunkDedup` (chunk ledger): an embedding pipeline
  * produces vectors continuously, and each micro-batch is assigned +
  * quantized under the store's FROZEN centroids and codebook
  * (`VectorStore.append`), so serving never waits on a rebuild and
  * every code in the artifact is self-consistent. Codebook drift
  * saturates at the range edges (see `sqQuantize`); rebuild when the
  * marker ledger says enough drifted batches have accumulated.
  *
  * Delivery: same commit-marker pattern as the other two — the
  * per-batch `(batch_id, n_vecs)` marker row is written AFTER the code
  * append, and a replayed batch whose marker exists is skipped. The
  * marker contract requires a DURABLE `checkpointDir` (stable batch
  * ids across restarts). The crash-between-append-and-marker window
  * duplicates codes on replay; a transactional table format closes it
  * at this same seam.
  */
object VectorMaintenance {

  /** Starts the maintenance query: each micro-batch of `newVecs`
    * (`vec_id`, `embedding`) is handed to [[appendBatch]]. */
  def maintain(newVecs: DataFrame, storeName: String,
               markerTable: String, checkpointDir: String,
               erasureLedger: Option[String] = None): StreamingQuery =
    newVecs.writeStream
      .outputMode("append")
      .queryName(Maintenance.queryNameFor(storeName))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(
          graft.index.Erasure.gateBatch(batch, erasureLedger,
            Seq("vec_id")),
          batchId, storeName, markerTable)
      }
      .start()

  /** One micro-batch: append the batch's codes under the stored
    * codebook, then the commit marker. Replay-safe via the marker. */
  def appendBatch(batch: DataFrame, batchId: Long,
                  storeName: String, markerTable: String): Unit = {
    val spark = batch.sparkSession
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (!committed) {
      VectorStore.append(batch.select(col("vec_id"), col("embedding")),
        storeName)
      VectorStore.clearOrphanLocation(spark, markerTable)
      batch.groupBy()
        .agg(count(lit(1)).as("n_vecs"))
        .withColumn("batch_id", lit(batchId))
        .select("batch_id", "n_vecs")
        .write.mode("append").saveAsTable(markerTable)
    }
  }

  /** Compaction — the operational counterpart of append-only ingest
    * (the `IndexMaintenance.compact` template): every micro-batch adds
    * one file set to each cid partition it touches, so a thousand
    * appends mean a thousand small files under the hot cells and the
    * serve-time partition-pruned scan degrades into an open/close
    * storm. Rewrites the CURRENT version's `_codes` clustered by `cid`
    * — ONE file set per cell — with the SAME partition spec, so
    * `serveTopK`'s candidate read keeps its partition-pruned shape and
    * identical results.
    *
    * CONTRACT: run in a maintenance window with the maintainer stopped
    * (SURVEY §6b). Crash-safe via stage-then-swap (this replaced a
    * localCheckpoint→DROP→rewrite sequence whose crash window
    * PERMANENTLY lost the code table, since localCheckpoint blocks die
    * with the JVM — and whose checkpoint pinned the artifact in
    * cluster memory for the whole rewrite): the compacted codes are
    * fully written under `<codes>_staging`, read straight from the
    * live files, before the swap. The codes table is PARTITIONED, so
    * the swap is `VectorStore.swapCodesFromStaging`'s copy (rename
    * would strand partition locations under the in-memory catalog); a
    * crash mid-swap is healed by `recoverCodesStaging` at every codes
    * entry point.
    *
    * The rewrite also PURGES tombstoned vectors (`VectorStore.deleteVecs`
    * — the anti-join is free inside a job that rewrites every cell's
    * files anyway) and clears the tombstone table AFTER the swap, so
    * serving returns to a pass-through. A crash between swap and clear
    * leaves tombstones anti-joining already-purged ids — a no-op,
    * cleared by the next compact. */
  def compact(spark: org.apache.spark.sql.SparkSession,
              storeName: String): Unit = {
    val p = VectorStore.servingPrefix(spark, storeName)
    VectorStore.recoverCodesStaging(spark, p)
    // CENTROID-VICTIM erasure (round-18 gap): `_centroids` stores the
    // seed vectors' FULL-PRECISION embeddings keyed by their vec_id,
    // and the in-place rewrite below never touches it — a tombstoned
    // id that IS a centroid would keep its payload on disk after the
    // "erasure" compaction, violating the store's own contract (an
    // erased vector's id/payload must survive in NO artifact table).
    // The in-place path CANNOT drop a centroid row (codes are
    // quantized under the frozen geometry), so this is the
    // version-flip case: REBUILD from the purged raw vectors — the
    // rebuild's training frame already subtracts tombstones, installs
    // fresh victim-free centroids, pointer-flips, and drops the old
    // version's tables (tombstones included). A codes-only legacy
    // store has no raw source to retrain from: refuse loudly rather
    // than report the erasure complete with the payload still live.
    val tomb = s"${p}_tombstones"
    if (spark.catalog.tableExists(tomb)) {
      val centroidVictims = spark.table(s"${p}_centroids")
        .join(spark.table(tomb).select(col("vec_id").as("cid")),
          Seq("cid"), "left_semi")
      if (!centroidVictims.isEmpty) {
        require(spark.catalog.tableExists(s"${p}_raw"),
          s"compact on $storeName: a tombstoned vector is a CENTROID " +
            "(its full-precision embedding lives in the centroids " +
            "table, which the in-place rewrite cannot purge) and the " +
            "store has no raw table to retrain from — rebuild it from " +
            "the upstream embeddings source (VectorStore.rebuild)")
        VectorStore.rebuild(
          VectorStore.purgedRaw(spark, p)
            .select(col("vec_id"), col("vec").as("embedding")),
          storeName)
        return
      }
    }
    val codes = s"${p}_codes"
    VectorStore.clearOrphanLocation(spark, codes + "_staging")
    VectorStore.purgedCodes(spark, p)
      .repartition(col("cid")) // all rows of a cell in one task → one file
      .write.mode("overwrite").partitionBy("cid")
      .saveAsTable(codes + "_staging")
    // no explicit DROP: the swap's overwrite replaces the live table
    // itself, so the only no-live-table window is inside the copy —
    // exactly the window recoverCodesStaging heals
    VectorStore.swapCodesFromStaging(spark, p)
    // the raw-vector side gets the same rewrite — small-file fold AND
    // the erasure path's physical purge (the raw table is where the
    // deleted payload actually lives; codes are lossy projections).
    // Tombstones are cleared only after BOTH swaps: a crash between
    // them leaves tombstones anti-joining the already-purged codes (a
    // no-op) while still hiding the not-yet-purged raw rows.
    val raw = s"${p}_raw"
    if (spark.catalog.tableExists(raw)) {
      VectorStore.recoverPartitionedStaging(spark, raw)
      VectorStore.clearOrphanLocation(spark, raw + "_staging")
      VectorStore.purgedRaw(spark, p)
        .repartition(col("cid"))
        .write.mode("overwrite").partitionBy("cid")
        .saveAsTable(raw + "_staging")
      VectorStore.swapPartitionedFromStaging(spark, raw)
    }
    // the bit side gets the same rewrite — sign words are lossy, but
    // an erased vector's id must not survive in ANY artifact table
    val bits = s"${p}_bits"
    if (spark.catalog.tableExists(bits)) {
      VectorStore.recoverPartitionedStaging(spark, bits)
      VectorStore.clearOrphanLocation(spark, bits + "_staging")
      VectorStore.purgedBits(spark, p)
        .repartition(col("cid"))
        .write.mode("overwrite").partitionBy("cid")
        .saveAsTable(bits + "_staging")
      VectorStore.swapPartitionedFromStaging(spark, bits)
    }
    VectorStore.clearTombstones(spark, p)
  }

  /** Total ingested vectors according to the marker ledger (0 when no
    * batch has committed yet). */
  def vecCount(spark: org.apache.spark.sql.SparkSession,
               markerTable: String): Long =
    { Freshness.refresh(spark, markerTable)
    if (!spark.catalog.tableExists(markerTable)) 0L
    else spark.table(markerTable).agg(sum("n_vecs")).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
  }
}
