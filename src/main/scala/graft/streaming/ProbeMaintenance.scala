package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming cross-modal probe maintenance (the 25th maintainer —
  * `ProbeStore`'s ingest twin): documents arrive as a stream, and the
  * mm08/mm09 probe set (exact-survivor doc per content digest, thinned
  * to the % 25 subset) must stay servable without re-scanning history.
  * Each micro-batch reduces to per-digest candidate rows — the batch's
  * OWN min doc per digest, `(batch_id, blob_digest, cand_id)` —
  * appended to a ledger; serving folds the committed rows with a
  * global min per digest (min over per-batch mins == min over all
  * rows: associative, commutative, IDEMPOTENT), THEN applies the % 25
  * probe filter — the filter must see the global survivor, never a
  * batch-local one, or a late batch carrying a smaller doc_id would
  * flip probe membership inconsistently between engines.
  *
  * Scale shape: per batch the cluster shuffles (digests-in-batch)
  * 32-char md5 keys + two longs — never text (the dd09 discipline);
  * the ledger grows by that many rows per batch and [[compact]] folds
  * it back to O(digests); the serve path is a ledger scan + O(digests)
  * min + one id equi-join to embeddings.
  *
  * Delivery: commit-marker replay-skip with orphan adoption, the
  * ChunkDedup/SketchMaintenance contract (`checkpointDir` durable so
  * batch ids stay stable). A duplicate row-set under one batch_id
  * would serve the SAME probes (idempotent min) — the orphan-adopt
  * protocol still keeps ledger growth honest. Erasure: [[purgeDocs]]
  * rebuilds the victims' digests from the gated source and refuses
  * loudly while an uncommitted orphan row-set is pending (the
  * SketchMaintenance.purgeUsers contract — a later replay adopting
  * the orphan would re-introduce the victim).
  */
object ProbeMaintenance {

  /** Start the maintainer over streaming `newDocs` (`doc_id`, `text`).
    * `erasureLedger` gates every batch (the round-15 maintainer
    * convention): an erased id can never re-enter the probe ledger. */
  def maintain(newDocs: DataFrame, ledgerTable: String,
               markerTable: String, checkpointDir: String,
               erasureLedger: Option[String] = None): StreamingQuery = {
    require(checkpointDir.nonEmpty,
      "ProbeMaintenance.maintain requires a durable checkpointDir: " +
        "replay-skip markers are only valid against stable batch ids")
    newDocs.writeStream
      .outputMode("append")
      .queryName(Maintenance.queryNameFor(ledgerTable))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(graft.index.Erasure.gateBatch(batch, erasureLedger),
          batchId, ledgerTable, markerTable)
      }
      .start()
  }

  /** Per-ledger suppression table (`ProbeStore`'s `_erased`
    * convention): victims recorded by every [[purgeDocs]] call, read
    * back by every later purge AND every append — the list outlives
    * the content, so a doc purged once can never be re-elected as a
    * digest-min by a LATER purge whose gate only knew its own victims
    * (round-16 ADVICE: purge(0) then purge(25) on a shared digest
    * re-elected doc 0 from the still-victim-bearing live source). */
  private def erasedTable(ledgerTable: String) = ledgerTable + "_erased"

  /** Anti-join `df`'s doc_id against the suppression table, if any. */
  private def withoutErased(spark: SparkSession, ledgerTable: String,
                            df: DataFrame): DataFrame =
    if (spark.catalog.tableExists(erasedTable(ledgerTable)))
      df.join(broadcast(spark.table(erasedTable(ledgerTable))),
        Seq("doc_id"), "left_anti")
    else df

  /** The per-batch reduction: this batch's min doc per content digest
    * — UNFILTERED (the % 25 thinning happens at serve, on the global
    * min). */
  private def batchCandidates(batch: DataFrame): DataFrame =
    batch.groupBy(md5(col("text").cast("binary")).as("blob_digest"))
      .agg(min(col("doc_id")).as("cand_id"))

  /** One micro-batch: append `(batch_id, blob_digest, cand_id)`,
    * marker LAST; replay adopts an orphan row-set. */
  def appendBatch(batch: DataFrame, batchId: Long, ledgerTable: String,
                  markerTable: String): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    recoverStaging(spark, ledgerTable)
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (committed) return
    val orphaned = spark.catalog.tableExists(ledgerTable) &&
      !spark.table(ledgerTable).filter(col("batch_id") === batchId).isEmpty
    val n = batch.count()
    if (!orphaned) {
      graft.index.VectorStore.clearOrphanLocation(spark, ledgerTable)
      // defense in depth beyond the optional erasureLedger gate in
      // [[maintain]]: a victim arriving in a batch AFTER its purge
      // must not re-enter as a candidate — the suppression list gates
      // the append path too (broadcast; request-sized table)
      batchCandidates(withoutErased(spark, ledgerTable, batch))
        .select(lit(batchId).as("batch_id"), col("blob_digest"),
          col("cand_id"))
        .write.mode("append").saveAsTable(ledgerTable)
    }
    graft.index.VectorStore.clearOrphanLocation(spark, markerTable)
    Seq((batchId, n)).toDF("batch_id", "n_docs")
      .write.mode("append").saveAsTable(markerTable)
  }

  /** The served probe frame (blob_digest, probe_id, pe) from COMMITTED
    * ledger rows only: global min per digest, % 25 thinning, embedding
    * join. Equals `ProbeStore.probesOf` over the same rows by
    * construction. Empty-but-typed before the first commit. */
  def servedProbes(spark: SparkSession, ledgerTable: String,
                   markerTable: String, emb: DataFrame): DataFrame = {
    Freshness.refresh(spark, ledgerTable, markerTable)
    recoverStaging(spark, ledgerTable)
    if (!spark.catalog.tableExists(ledgerTable) ||
        !spark.catalog.tableExists(markerTable))
      return spark.range(0).select(
        col("id").cast("string").as("blob_digest"),
        col("id").as("probe_id"),
        lit(null).cast("array<float>").as("pe"))
    spark.table(ledgerTable)
      .join(broadcast(spark.table(markerTable).select("batch_id")),
        Seq("batch_id"), "left_semi")
      .groupBy("blob_digest")
      .agg(min(col("cand_id")).as("probe_id"))
      .filter(col("probe_id") % 25 === 0)
      .join(emb.select(col("vec_id").as("probe_id"),
        col("embedding").as("pe")), Seq("probe_id"))
  }

  /** Erasure for the ledger (`ProbeStore.eraseDocs`' streaming twin):
    * every digest whose candidate is a victim is re-reduced from the
    * gated source and REPLACES its ledger rows whatever batch wrote
    * them; a digest with no surviving doc drops out. Stage-then-swap;
    * orphans REFUSED loudly (maintenance-window contract). `docs` is
    * the live source — victim rows still present name the affected
    * digests; the rebuild reads only the remainder gated against the
    * PERSISTENT `_erased` suppression ledger (all victims ever purged,
    * not just this call's), so sequential purges over a shared digest
    * can never re-elect an earlier victim. */
  def purgeDocs(spark: SparkSession, docsDf: DataFrame,
                ledgerTable: String, markerTable: String,
                docIds: Seq[Long]): Unit = {
    import spark.implicits._
    if (docIds.isEmpty) return
    recoverStaging(spark, ledgerTable)
    if (!spark.catalog.tableExists(ledgerTable) ||
        !spark.catalog.tableExists(markerTable)) return
    val markers = spark.table(markerTable).select("batch_id")
    val t = spark.table(ledgerTable)
    // orphan check BEFORE any early return: an all-orphan ledger must
    // refuse an erasure request loudly, not silently no-op
    require(t.join(broadcast(markers), Seq("batch_id"), "left_anti")
      .isEmpty,
      s"purgeDocs on $ledgerTable: uncommitted orphan row-set present " +
        "— a later replay would adopt it and re-introduce the victim; " +
        "run in a maintenance window after the maintainer committed")
    if (markers.isEmpty) return // ledger provably empty (require above)
    // record THIS call's victims in the persistent suppression ledger
    // FIRST (append-dedup, the ProbeStore.eraseDocs shape): the gate
    // below must see every victim ever purged, not just this call's —
    // the live source is allowed to still carry prior victims, and
    // re-reducing a shared digest against a this-call-only gate would
    // re-elect an earlier victim as digest-min (round-16 ADVICE)
    val victims = docIds.distinct.toDF("doc_id")
    val led = erasedTable(ledgerTable)
    val freshVictims =
      if (spark.catalog.tableExists(led))
        victims.join(spark.table(led), Seq("doc_id"), "left_anti")
      else victims
    if (!freshVictims.isEmpty) {
      graft.index.VectorStore.clearOrphanLocation(spark, led)
      freshVictims.write.mode("append").saveAsTable(led)
    }
    // affected digests: any ledger row whose candidate is a victim,
    // PLUS any digest a victim doc belongs to (a victim that never won
    // a batch-min still pins nothing, but its digest's rebuild is a
    // no-op — cheap and safe)
    val affected = t
      .join(broadcast(victims), col("cand_id") === col("doc_id"),
        "left_semi")
      .select("blob_digest").distinct()
    val tag = markers.agg(max("batch_id")).head().getLong(0)
    val gated = withoutErased(spark, ledgerTable, docsDf)
    val fresh = batchCandidates(gated)
      .join(affected, Seq("blob_digest"), "left_semi")
      .select(lit(tag).as("batch_id"), col("blob_digest"), col("cand_id"))
    val kept = t.join(affected, Seq("blob_digest"), "left_anti")
      .select("batch_id", "blob_digest", "cand_id")
    val staging = ledgerTable + "_staging"
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    graft.index.VectorStore.clearOrphanLocation(spark, staging)
    kept.unionAll(fresh)
      .write.mode("overwrite").saveAsTable(staging)
    spark.sql(s"DROP TABLE IF EXISTS $ledgerTable")
    spark.sql(s"ALTER TABLE $staging RENAME TO $ledgerTable")
  }

  /** Fold the committed ledger to ONE row per digest under the max
    * committed batch tag — serving before/after identical (min is
    * associative); orphan row-sets carried VERBATIM for later
    * adoption. Maintenance-window contract. */
  def compact(spark: SparkSession, ledgerTable: String,
              markerTable: String): Unit = {
    recoverStaging(spark, ledgerTable)
    if (!spark.catalog.tableExists(ledgerTable) ||
        !spark.catalog.tableExists(markerTable)) return
    val markers = spark.table(markerTable).select("batch_id")
    if (markers.isEmpty) return
    val tag = markers.agg(max("batch_id")).head().getLong(0)
    val t = spark.table(ledgerTable)
    val folded = t
      .join(broadcast(markers), Seq("batch_id"), "left_semi")
      .groupBy("blob_digest")
      .agg(min(col("cand_id")).as("cand_id"))
      .select(lit(tag).as("batch_id"), col("blob_digest"), col("cand_id"))
    val orphans = t
      .join(broadcast(markers), Seq("batch_id"), "left_anti")
      .select("batch_id", "blob_digest", "cand_id")
    val staging = ledgerTable + "_staging"
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    graft.index.VectorStore.clearOrphanLocation(spark, staging)
    folded.unionAll(orphans)
      .write.mode("overwrite").saveAsTable(staging)
    spark.sql(s"DROP TABLE IF EXISTS $ledgerTable")
    spark.sql(s"ALTER TABLE $staging RENAME TO $ledgerTable")
  }

  /** Crash recovery for the stage-then-swap (staging is complete by
    * the time the live table is dropped). */
  private def recoverStaging(spark: SparkSession,
                             ledgerTable: String): Unit = {
    val staging = ledgerTable + "_staging"
    if (!spark.catalog.tableExists(ledgerTable) &&
        spark.catalog.tableExists(staging))
      spark.sql(s"ALTER TABLE $staging RENAME TO $ledgerTable")
  }

  /** Total docs across committed batches — the audit surface. */
  def streamLength(spark: SparkSession, markerTable: String): Long = {
    Freshness.refresh(spark, markerTable)
    if (!spark.catalog.tableExists(markerTable)) 0L
    else spark.table(markerTable)
      .agg(coalesce(sum("n_docs"), lit(0L))).head().getLong(0)
  }
}
