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
  * appends per-window `(batch_id, ch, nd)` distinct-doc-count
  * increments to an append-only ledger; global window frequency is
  * the sum per digest (batch_id is dropped at serve time). Correct
  * because doc ids are unique across batches (the IndexMaintenance
  * append contract), so per-batch distinct counts add up to the
  * corpus-wide distinct count.
  *
  * Scale shape: the ledger's shuffle key is the window md5 (32 fixed
  * chars, high uniform cardinality — no salting), increments are one
  * row per distinct window per batch — ~batch token count, the
  * inherent stride-1 price dd14 documents — and serving re-digests
  * only the corpus being REPORTED ON, never past batches' raw text.
  * The span merge at serve time is dd14's own doc-partitioned window.
  * The ledger is the only maintainer ledger that is CORPUS-sized
  * (stride-1 ⇒ ~tokens-many rows), so [[compact]] matters here more
  * than anywhere: it collapses the per-batch rows to one row per
  * distinct digest, restoring serve-time merge cost to
  * O(distinct windows) however many batches have landed.
  *
  * Delivery: the `QualityMaintenance` commit-marker pattern — the
  * per-batch `(batch_id, n_docs)` marker row is written AFTER the
  * increments, and a replayed batch whose marker exists is skipped.
  * The crash window between the increments and the marker is closed
  * by PARTITION OVERWRITE, not adoption: the ledger is partitioned by
  * batch_id and each batch writes its own partition with dynamic
  * partition overwrite, so a replay that lands in the crash window
  * REWRITES the partition completely — idempotent because the
  * increments are deterministic per batch. Adoption (trusting rows
  * already present under the batch_id) was abandoned: a crash mid
  * file-commit can leave a PARTIALLY-visible row-set, and adopting it
  * would permanently undercount those windows with no signal
  * (VERDICT r11 ADVICE). Overwrite needs no completeness judgment —
  * whatever was visible, partial or whole, is replaced by the full
  * deterministic set.
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
    * collides with an old marker.
    *
    * `digest` keys the ledger (dd14's md5 for oracle parity, or
    * `Dedup.XxDigest` — 8 bytes per window instead of 32 hex chars,
    * the dd16 production swap; at ledger scale the digest IS the row,
    * so the narrow key quarters both the shuffle and the stored
    * table). One digest per ledger for its WHOLE life: appendBatch,
    * compact and the serve path must all agree, and the ledger schema
    * itself pins it (ch is STRING under md5, BIGINT under xxhash64 —
    * a mismatched writer fails loudly on insert rather than silently
    * matching nothing). */
  def maintain(newDocs: DataFrame, windowTable: String,
               markerTable: String, checkpointDir: String,
               digest: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                 graft.queries.Dedup.Md5Digest,
               erasureLedger: Option[String] = None): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .queryName(Maintenance.queryNameFor(windowTable))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(graft.index.Erasure.gateBatch(batch, erasureLedger),
          batchId, windowTable, markerTable, digest)
      }
      .start()

  /** One micro-batch: digest the batch's windows, write the `(ch, nd)`
    * increments into the ledger's `batch_id=N` partition, then the
    * commit marker. Replay-safe via the marker; a replay that lands in
    * the crash window (increments visible — possibly PARTIALLY, after
    * a mid-commit crash — marker missing) overwrites its partition
    * with the full deterministic row-set via dynamic partition
    * overwrite, so neither double-counting nor adopt-a-partial-batch
    * undercounting is reachable. */
  def appendBatch(batch: DataFrame, batchId: Long,
                  windowTable: String, markerTable: String,
                  digest: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                    graft.queries.Dedup.Md5Digest): Unit = {
    val spark = batch.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    recoverStaging(spark, windowTable)
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (!committed) {
      // partition column last: matches the saveAsTable layout so the
      // insertInto below resolves positionally
      val increments =
        graft.queries.Dedup.substringWindowDigestsOf(
            batch.select(col("doc_id"),
              graft.functions.TextFunctions.tokens(col("text")).as("tk")),
            digest)
          .groupBy("ch")
          .agg(countDistinct(col("doc_id")).as("nd"))
          .select(col("ch"), col("nd"), lit(batchId).as("batch_id"))
      if (!spark.catalog.tableExists(windowTable))
        increments.write.partitionBy("batch_id").saveAsTable(windowTable)
      else {
        // insertInto resolves POSITIONALLY against the table layout:
        // a ledger from before the batch_id-partitioned layout
        // (unpartitioned, batch_id first) would be silently mis-mapped
        // — and mode("overwrite") on an UNPARTITIONED table truncates
        // every committed batch while the markers still claim them.
        // Fail loudly instead of corrupting; same for a digest-type
        // mismatch (md5 STRING ledger fed xxhash64 BIGINT increments).
        assertLedgerLayout(spark, windowTable,
          increments.schema("ch").dataType)
        // session conf, not a write option: insertInto on a catalog
        // table ignores per-write options, and STATIC overwrite would
        // truncate every other batch's partition
        val key = "spark.sql.sources.partitionOverwriteMode"
        val prior = spark.conf.getOption(key)
        spark.conf.set(key, "dynamic")
        try increments.write.mode("overwrite").insertInto(windowTable)
        finally prior match {
          case Some(v) => spark.conf.set(key, v)
          case None    => spark.conf.unset(key)
        }
      }
      batch.groupBy()
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("batch_id", lit(batchId))
        .select("batch_id", "n_docs")
        .write.mode("append").saveAsTable(markerTable)
    }
  }

  /** Write-path layout guard: the existing ledger must be partitioned
    * by exactly `batch_id` and key its `ch` column with the SAME type
    * the incoming increments carry. Anything else is a legacy or
    * foreign table that positional insertInto would corrupt — refuse
    * with a migration message rather than truncate or mis-map. */
  private def assertLedgerLayout(spark: SparkSession, windowTable: String,
      chType: org.apache.spark.sql.types.DataType): Unit = {
    val cols = spark.catalog.listColumns(windowTable).collect()
    val partCols = cols.filter(_.isPartition).map(_.name).toSeq
    require(partCols == Seq("batch_id"),
      s"ledger $windowTable has partition columns ${partCols.mkString("[", ",", "]")}, " +
        "expected [batch_id]: this is a pre-partitioned-layout (or foreign) table " +
        "that positional insertInto would corrupt. Migrate it first: " +
        "rewrite as SELECT ch, nd, batch_id ... partitionBy(batch_id), " +
        "or start a fresh ledger and replay from the checkpoint.")
    val ledgerCh = cols.find(_.name == "ch").map(_.dataType)
    val expected = chType.simpleString
    require(ledgerCh.contains(expected),
      s"ledger $windowTable keys ch as ${ledgerCh.getOrElse("<missing>")} but this " +
        s"maintainer's digest produces $expected: one digest per ledger for its " +
        "whole life (md5=string, xxhash64=bigint) — point the maintainer at the " +
        "digest the ledger was built with, or start a fresh ledger.")
  }

  /** Corpus-wide window frequency from the ledger: sum of the
    * per-batch distinct-doc increments per digest (batch_id dropped —
    * serving is identical before and after [[compact]]). Empty-but-
    * typed when no batch has committed yet. */
  def windowFrequency(spark: SparkSession, windowTable: String): DataFrame = {
    Freshness.refresh(spark, windowTable)
    recoverStaging(spark, windowTable)
    if (!spark.catalog.tableExists(windowTable))
      spark.range(0).select(lit("").as("ch"), lit(0L).as("nd")).limit(0)
    else spark.table(windowTable).groupBy("ch").agg(sum("nd").as("nd"))
  }

  /** Collapse the corpus-sized ledger to ONE row per distinct window
    * digest — the compaction the other maintainers already have
    * (`TrendMaintenance.compact` protocol), and the one that matters
    * most: this ledger grows by ~batch-token-count rows per batch, so
    * serve-time merge cost grows with batch count until compacted.
    *
    * COMMITTED rows fold to `(tag, ch, sum(nd))` under tag = the max
    * committed batch_id; serving is identical by construction because
    * the serve path IS groupBy(ch).sum(nd). Orphan rows (a
    * crash-window row-set whose marker never landed, possibly partial)
    * are carried through VERBATIM under their own batch_id partition,
    * which the batch's eventual replay overwrites completely — folding
    * them into the tag partition would instead double-count once the
    * replay rewrites its own partition. A replayed OLD batch stays
    * marker-skipped (the marker ledger is untouched).
    *
    * Concurrency contract: run in a maintenance window with the
    * maintainer stopped (SURVEY §6b). Crash-safe via stage-then-swap:
    * the compacted ledger is fully written under `<table>_staging`
    * before the one vulnerable step (drop + rename); a crash before
    * the drop leaves the old ledger untouched, a crash between drop
    * and rename is healed by [[recoverStaging]] at every entry point. */
  def compact(spark: SparkSession, windowTable: String,
              markerTable: String): Unit = {
    recoverStaging(spark, windowTable)
    if (!spark.catalog.tableExists(windowTable) ||
        !spark.catalog.tableExists(markerTable)) return
    val markers = spark.table(markerTable).select("batch_id")
    val tagRow = markers.agg(max("batch_id")).head()
    if (tagRow.isNullAt(0)) return
    val tag = tagRow.getLong(0)
    val ledger = spark.table(windowTable)
    // marker sets are small (one row per batch) — broadcast both ways
    val folded = ledger
      .join(broadcast(markers), Seq("batch_id"), "left_semi")
      .groupBy("ch").agg(sum("nd").as("nd"))
      .select(lit(tag).as("batch_id"), col("ch"), col("nd"))
    val orphans = ledger
      .join(broadcast(markers), Seq("batch_id"), "left_anti")
      .select("batch_id", "ch", "nd")
    val staging = windowTable + "_staging"
    // same partition layout as the live ledger: appendBatch's
    // insertInto resolves positionally against (ch, nd | batch_id),
    // and an orphan's replay must still target its own partition
    folded.unionAll(orphans)
      .select("ch", "nd", "batch_id")
      .write.mode("overwrite").partitionBy("batch_id").saveAsTable(staging)
    swapFromStaging(spark, windowTable)
  }

  /** Install the fully-written staged ledger as the live window table
    * and drop the staging copy. By COPY, not `ALTER TABLE RENAME`: the
    * in-memory catalog's rename moves the table directory but keeps
    * each PARTITION's location pointing at the old path, silently
    * emptying a partitioned table (only the Hive catalog rewrites
    * partition locations on rename). The copy is the compacted ledger
    * — one row per distinct digest — so the double write is small.
    *
    * Crash-safe: the overwrite of the live table internally drops then
    * recreates it, so a crash mid-copy leaves no live table and an
    * intact staged one — [[recoverStaging]] re-runs this swap. A crash
    * after the copy but before the staging drop leaves both tables;
    * the live one wins and the leftover staging is overwritten by the
    * next compact. */
  private def swapFromStaging(spark: SparkSession, windowTable: String): Unit = {
    val staging = windowTable + "_staging"
    spark.table(staging)
      .write.mode("overwrite").partitionBy("batch_id").saveAsTable(windowTable)
    spark.sql(s"DROP TABLE IF EXISTS $staging")
  }

  /** Crash recovery for [[compact]]'s stage-then-swap: a crash during
    * the swap leaves no window table but a complete staged ledger —
    * re-run the swap. Called by every entry point that reads or writes
    * the window table. (The staging write itself crashing is harmless:
    * the live table still exists, so this no-ops and the next compact
    * overwrites the partial staging.) */
  private def recoverStaging(spark: SparkSession, windowTable: String): Unit = {
    val staging = windowTable + "_staging"
    if (!spark.catalog.tableExists(windowTable) &&
        spark.catalog.tableExists(staging))
      swapFromStaging(spark, windowTable)
  }

  /** Right-to-erasure seam: FORGET the substring-window digests of
    * `victimDocs` (`doc_id`, `text` — run BEFORE deleting the source
    * rows) from the ledger, the ChunkDedup.purgeDigests semantics: the
    * `(ch, nd)` rows carry no per-doc attribution, so digest rows are
    * dropped outright and a window shared with surviving docs
    * re-learns on its next occurrence. Pass the SAME `digest` the
    * ledger was built with (md5 default / xxhash64 twin — the schema
    * pins it, so a mismatch joins nothing rather than corrupting).
    * Affected partitions rewrite via `Erasure.purgeRows`. */
  def purgeDigests(spark: SparkSession, victimDocs: DataFrame,
                   windowTable: String,
                   digest: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                     graft.queries.Dedup.Md5Digest): Unit = {
    recoverStaging(spark, windowTable)
    if (!spark.catalog.tableExists(windowTable)) return
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    val digests = graft.queries.Dedup.substringWindowDigestsOf(
        victimDocs.select(col("doc_id"),
          graft.functions.TextFunctions.tokens(col("text")).as("tk")),
        digest)
      .select("ch").distinct()
    graft.index.Erasure.purgeRows(spark, digests, windowTable, Seq("ch"))
  }

  /** Serve-time dd14 report for `documents` (`doc_id`, `text`)
    * against the MAINTAINED ledger — same schema as the batch report
    * (`doc_id`, `n_tokens`, `n_spans`, `dup_tokens`, `dup_frac`).
    * When the ledger was fed exactly this corpus, the output equals
    * `Dedup.substringDupReport(documents)` (spec-pinned). */
  def substringDupReportServed(documents: DataFrame,
                               windowTable: String,
                               digest: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                                 graft.queries.Dedup.Md5Digest): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = documents.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    import graft.queries.Dedup
    // persisted: tk feeds the window stream AND the final report join
    // (the substringSpanFrames rationale — tokenize the corpus once)
    val tk = documents.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("tk"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dupStarts = Dedup.substringWindowDigestsOf(tk, digest)
      .join(windowFrequency(spark, windowTable).filter(col("nd") >= 2), "ch")
      .select("doc_id", "start")
    Dedup.substringReportFrom(tk, Dedup.spansFromStarts(dupStarts))
  }
}
