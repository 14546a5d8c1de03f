package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming dedup-REWRITE (dd20's serving twin — the 19th maintainer,
  * and the first that emits a CLEANED CORPUS instead of a report or a
  * ledger alone): every arriving document is rewritten at the door —
  * chunks already owned by ANY earlier committed batch drop, chunks
  * first seen in this batch keep exactly their first instance (min
  * (doc_id, idx), dd20's rule) — and the surviving text is reassembled
  * in position order plus the never-deduped sub-chunk tail. The global
  * first-occurrence set lives in a digest ledger (md5 of the chunk
  * text — the repo-wide collision-free-digest convention; raw chunk
  * text never crosses a batch boundary), so per-batch work is the
  * batch's own chunking plus one anti-join against a fixed-width
  * digest column — nothing re-reads past batches' text.
  *
  * Equality contract (spec-pinned): when batches arrive in ascending
  * doc_id order, the streamed clean corpus equals the one-shot batch
  * `Dedup.dedupRewriteOf` bit-for-bit — both sides chunk via
  * `Dedup.chunkInstancesOf` and reassemble via
  * `Dedup.reassembleClean`, so they can only diverge on WHO owns a
  * chunk, and ascending arrival makes stream ownership = global
  * min (doc_id, idx).
  *
  * Delivery: the SubstringDedup protocol. Cleaned rows AND ledger rows
  * are batch_id-partitioned and written with dynamic partition
  * overwrite, so the crash window (either table's partition visible —
  * possibly partially — marker missing) overwrites with the full
  * deterministic row-set on replay; the rewrite reads ledger
  * partitions with `batch_id < current` only, so a batch can never see
  * its own crashed leftovers as "prior". Marker last; committed-only
  * serve. Requires a DURABLE checkpointDir (stable batch ids).
  */
object RewriteDedup {

  /** Starts the rewriter: each micro-batch of `newDocs`
    * (`doc_id`, `text`) lands as cleaned rows in `outTable` and new
    * first-occurrence digests in `ledgerTable`. */
  def maintain(newDocs: DataFrame, outTable: String, ledgerTable: String,
               markerTable: String, checkpointDir: String,
               erasureLedger: Option[String] = None): StreamingQuery = {
    require(checkpointDir.nonEmpty,
      "RewriteDedup.maintain requires a durable checkpointDir: " +
        "replay-skip markers are only valid against stable batch ids")
    newDocs.writeStream
      .outputMode("append")
      .queryName(Maintenance.queryNameFor(ledgerTable))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        rewriteBatch(graft.index.Erasure.gateBatch(batch, erasureLedger),
          batchId, outTable, ledgerTable, markerTable)
      }
      .start()
  }

  /** One micro-batch: rewrite against the prior ledger, land cleaned
    * rows + new digests (both partition-overwritten), marker last. */
  def rewriteBatch(batch: DataFrame, batchId: Long, outTable: String,
                   ledgerTable: String, markerTable: String): Unit = {
    val spark = batch.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (committed) return
    val tk = batch
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("tk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cc = graft.queries.Dedup.chunkInstancesOf(tk)
        .withColumn("ch", md5(col("chunk").cast("binary")))
      // prior owners: the bucketed compact table (all folded batches
      // committed by construction) plus live committed partitions
      // above its high-water — batch_id < current excludes this
      // batch's own crashed leftovers by construction
      val prior = priorOwners(spark, ledgerTable, batchId)
      val fresh = cc.join(prior, Seq("ch"), "left_anti")
      // batch-internal keep-first: the dd20 aggregation (min(struct)
      // partial-aggregates map-side — no boilerplate-chunk window skew)
      val first = fresh.groupBy("ch")
        .agg(min(struct(col("doc_id"), col("idx"), col("chunk"))).as("f"))
      val kept = first.select(col("f.doc_id").as("doc_id"),
        col("f.idx").as("idx"), col("f.chunk").as("chunk"))
      val cleaned = graft.queries.Dedup.reassembleClean(tk, kept)
        .select(col("doc_id"), col("n_chunks"), col("n_kept"),
          col("clean_text"), lit(batchId).as("batch_id"))
      overwritePartition(cleaned, outTable)
      // the OWNER doc_id rides along in the ledger: ownership probes
      // ignore it (priorOwners projects ch), but it is what lets
      // [[eraseDocs]] attribute a digest to the erased document
      // without re-reading any text. A pre-owner-column ledger would
      // be silently mis-mapped by the positional insertInto — refuse
      // with a migration message (the ChunkDedup layout-guard move).
      if (spark.catalog.tableExists(ledgerTable))
        require(spark.table(ledgerTable).columns.contains("doc_id"),
          s"ledger $ledgerTable predates the owner column: migrate it " +
            "(rewrite as SELECT ch, CAST(NULL AS BIGINT) AS doc_id, " +
            "batch_id ... partitionBy(batch_id)) or start a fresh " +
            "ledger and replay from the checkpoint.")
      overwritePartition(
        first.select(col("ch"), col("f.doc_id").as("doc_id"),
          lit(batchId).as("batch_id")), ledgerTable)
      batch.groupBy().agg(count(lit(1)).as("n_docs"))
        .withColumn("batch_id", lit(batchId))
        .select("batch_id", "n_docs")
        .write.mode("append").saveAsTable(markerTable)
    } finally tk.unpersist()
  }

  // ---- Ledger compaction (the SplitAssignment.compact move) --------
  // The ownership probe anti-joins each batch against ALL prior ledger
  // rows; with batch_id partitioning alone that scan grows with batch
  // count. [[compact]] folds committed partitions into a ch-BUCKETED
  // side table `<ledger>c`; probes read `compacted ∪ partitions
  // (batch_id > hw)` where hw = max batch_id inside the compact table,
  // so a crash at any point leaves the union complete and duplicate-
  // free. Stage-then-swap with [[recoverStaging]] adoption at every
  // entry point; folded partitions dropped best-effort (hw-excluded
  // either way).

  private def compactTable(ledgerTable: String) = ledgerTable + "c"

  private def recoverStaging(spark: SparkSession, table: String): Unit = {
    val staging = table + "_staging"
    if (!spark.catalog.tableExists(table) &&
        spark.catalog.tableExists(staging))
      spark.sql(s"ALTER TABLE $staging RENAME TO $table")
  }

  private def hwOf(spark: SparkSession, cT: String): Long =
    if (!spark.catalog.tableExists(cT)) -1L
    else spark.table(cT).agg(max("batch_id")).head match {
      case r if r.isNullAt(0) => -1L
      case r => r.getLong(0)
    }

  /** All chunk digests owned BEFORE `batchId`: compact ∪ live above
    * the high-water, minus this batch's own (possibly crashed) rows. */
  private def priorOwners(spark: SparkSession, ledgerTable: String,
                          batchId: Long): DataFrame = {
    val cT = compactTable(ledgerTable)
    recoverStaging(spark, cT)
    val c = if (spark.catalog.tableExists(cT))
      Some(spark.table(cT).select("ch")) else None
    val hw = if (c.isDefined) hwOf(spark, cT) else -1L
    val live = if (spark.catalog.tableExists(ledgerTable))
      Some(spark.table(ledgerTable)
        .filter(col("batch_id") > hw && col("batch_id") < batchId)
        .select("ch"))
    else None
    (c, live) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (a, b) => a.orElse(b)
        .getOrElse(spark.range(0).select(lit("").as("ch")).limit(0))
    }
  }

  /** Fold committed ledger partitions into the ch-bucketed compact
    * table. Call from a maintenance window; the rewriter stays correct
    * (and crash-safe) at any point before, during or after. The fold
    * takes only partitions ABOVE the compact table's high-water —
    * mirroring the probe-side filter — so a crash between the
    * staging→live rename and the partition drops cannot re-fold
    * already-folded digests into duplicate compact rows; leftover ≤hw
    * partitions are re-dropped here instead. */
  def compact(spark: SparkSession, ledgerTable: String,
              markerTable: String): Unit = {
    val cT = compactTable(ledgerTable)
    recoverStaging(spark, cT)
    if (!spark.catalog.tableExists(ledgerTable) ||
        !spark.catalog.tableExists(markerTable)) return
    val hw = hwOf(spark, cT)
    val committed = spark.table(markerTable).select("batch_id")
    val fold = spark.table(ledgerTable)
      .filter(col("batch_id") > hw)
      .join(broadcast(committed), Seq("batch_id"), "left_semi")
    // allowMissingColumns: a compact table folded before the owner
    // column carries null doc_id on its legacy rows (unattributable to
    // an eraser — migrate or rebuild the ledger to attribute them)
    val merged = if (spark.catalog.tableExists(cT))
      spark.table(cT).unionByName(fold, allowMissingColumns = true)
    else fold
    val batches = fold.select("batch_id").distinct()
      .collect().map(_.getLong(0)) // bounded: committed batch count
    val stale = spark.table(ledgerTable).select("batch_id").distinct()
      .filter(col("batch_id") <= hw)
      .join(broadcast(committed), Seq("batch_id"), "left_semi")
      .collect().map(_.getLong(0)) // crashed-prior-compact leftovers
    if (batches.isEmpty && stale.isEmpty) return
    if (batches.nonEmpty) {
      val staging = cT + "_staging"
      spark.sql(s"DROP TABLE IF EXISTS $staging")
      merged.write.mode("overwrite").bucketBy(8, "ch").saveAsTable(staging)
      spark.sql(s"DROP TABLE IF EXISTS $cT")
      spark.sql(s"ALTER TABLE $staging RENAME TO $cT")
    }
    (batches ++ stale).foreach { b =>
      try spark.sql(
        s"ALTER TABLE $ledgerTable DROP IF EXISTS PARTITION (batch_id=$b)")
      catch { case _: Exception => () }
    }
  }

  /** batch_id-partitioned dynamic overwrite (the SubstringDedup write
    * path): first batch creates the layout, later batches replace
    * exactly their own partition — a crashed partial partition is
    * overwritten whole on replay. */
  private def overwritePartition(rows: DataFrame, table: String): Unit = {
    val spark = rows.sparkSession
    if (!spark.catalog.tableExists(table))
      rows.write.partitionBy("batch_id").saveAsTable(table)
    else {
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prior = spark.conf.getOption(key)
      spark.conf.set(key, "dynamic")
      try rows.write.mode("overwrite").insertInto(table)
      finally prior match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  /** Right-to-erasure seam: physically remove `victims`' (a
    * single-column doc_id frame, request-sized) cleaned rows from
    * `outTable` — the table that HOLDS the document's `clean_text` —
    * and their OWNED first-occurrence digests from the ledger, live
    * partitions and compacted side table both. FORGET semantics for
    * the digests: a chunk whose first instance belonged to the erased
    * doc is treated as never-seen, so a future document carrying it
    * keeps its own copy (correct — the content it deduplicated
    * against no longer exists). Rows another doc owns are untouched.
    * Idempotent; single-writer maintenance window (the compact
    * contract). */
  def eraseDocs(spark: SparkSession, victims: DataFrame,
                outTable: String, ledgerTable: String): Unit = {
    graft.index.Erasure.purgeRows(spark, victims, outTable, Seq("doc_id"))
    graft.index.Erasure.purgeRows(spark, victims, ledgerTable, Seq("doc_id"))
    val cT = compactTable(ledgerTable)
    recoverStaging(spark, cT)
    if (spark.catalog.tableExists(cT) &&
        spark.table(cT).columns.contains("doc_id")) {
      val v = broadcast(victims.toDF("erased_key"))
      val t = spark.table(cT)
      if (!t.join(v, t("doc_id") === v("erased_key"), "left_semi").isEmpty) {
        val staging = cT + "_staging"
        spark.sql(s"DROP TABLE IF EXISTS $staging")
        t.join(v, t("doc_id") === v("erased_key"), "left_anti")
          .write.mode("overwrite").bucketBy(8, "ch").saveAsTable(staging)
        spark.sql(s"DROP TABLE IF EXISTS $cT")
        spark.sql(s"ALTER TABLE $staging RENAME TO $cT")
      }
    }
  }

  /** Committed cleaned rows only (empty-but-typed before any commit). */
  def cleaned(spark: SparkSession, outTable: String,
              markerTable: String): DataFrame = {
    Freshness.refresh(spark, outTable, markerTable)
    if (!spark.catalog.tableExists(outTable) ||
        !spark.catalog.tableExists(markerTable))
      return spark.range(0).select(col("id").as("doc_id"),
        lit(0).as("n_chunks"), lit(0).as("n_kept"),
        lit("").as("clean_text"), lit(0L).as("batch_id"))
    spark.table(outTable)
      .join(broadcast(spark.table(markerTable).select("batch_id")),
        Seq("batch_id"), "left_semi")
  }
}
