package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.index.TokenizerStore

/** Streaming segmentation under a FROZEN tokenizer vocabulary
  * (`graft.index.TokenizerStore`) — the tenth streaming maintainer,
  * and the second model-SERVING one (QualityMaintenance's shape): the
  * batch side trains the BPE merge table once; a document stream is
  * then segmented micro-batch by micro-batch under that frozen
  * vocabulary into a word-level ledger, so the corpus token budget
  * (tx39's report — the "how many tokens is this corpus under OUR
  * tokenizer" pass) is served from vocab-sized state without ever
  * re-reading past batches' raw text. Segmentations are reproducible
  * because the vocabulary is frozen — a replayed doc segments
  * identically months later.
  *
  * Ledger rows are `(word, wn, units, vocab_v, batch_id)`: per-batch
  * word counts PLUS the stored segmentation, one row per distinct word
  * per batch (vocab-sized — the tx38 collapse discipline, not
  * corpus-sized). Word counts SUM across batches and the units array
  * is deterministic per word under the frozen vocab, so serve time
  * groups the ledger by word, sums `wn`, keeps any row's `units`, and
  * aggregates per unit — exactly `bpeUnitReport` over corpus word
  * counts, i.e. tx39's output, spec-pinned (`TokenizerMaintenanceSpec`).
  * `vocab_v` records which `TokenizerStore` version segmented the
  * batch: after a drift-triggered `TokenizerStore.rebuild`, serving
  * REFUSES a mixed-version ledger (units from two vocabularies are not
  * comparable) until the maintenance-window [[resegment]] rewrites the
  * ledger under the new vocabulary.
  *
  * Delivery: the SubstringDedup PARTITION-OVERWRITE protocol, not
  * adoption — the ledger is batch_id-partitioned and a replay that
  * lands in the crash window (rows visible, possibly PARTIALLY after a
  * mid-commit crash, marker missing) rewrites its partition with the
  * full deterministic row-set, so neither double-counting nor
  * adopt-a-partial-batch undercounting is reachable. Counts make
  * partial adoption dangerous in exactly the way scores (idempotent
  * per row) are not. The marker contract requires a DURABLE
  * `checkpointDir` (stable batch ids across restarts).
  */
object TokenizerMaintenance {

  /** Starts the segmentation query: each micro-batch of `newDocs`
    * (`doc_id`, `text`) is segmented under `storeName`'s frozen
    * merges into `wcTable`. */
  def maintain(newDocs: DataFrame, storeName: String, wcTable: String,
               markerTable: String, checkpointDir: String,
               erasureLedger: Option[String] = None): StreamingQuery = {
    require(checkpointDir.nonEmpty,
      "TokenizerMaintenance.maintain requires a durable checkpointDir: " +
        "replay-skip markers are only valid against stable batch ids")
    newDocs.writeStream
      .outputMode("append")
      .queryName(Maintenance.queryNameFor(wcTable))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(graft.index.Erasure.gateBatch(batch, erasureLedger),
          batchId, storeName, wcTable, markerTable)
      }
      .start()
  }

  /** One micro-batch: collapse the batch to word counts, segment each
    * distinct word under the frozen vocabulary (a pure map-side
    * projection — the batch's only corpus-width work is its own
    * tokenize), write the batch's partition, then the commit marker. */
  def appendBatch(batch: DataFrame, batchId: Long, storeName: String,
                  wcTable: String, markerTable: String): Unit = {
    val spark = batch.sparkSession
    recoverStaging(spark, wcTable)
    requireVersionedLayout(spark, wcTable)
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (!committed) {
      // partition column last: matches the saveAsTable layout so the
      // insertInto below resolves positionally. vocab_v records WHICH
      // tokenizer version segmented this batch — after a
      // TokenizerStore.rebuild the serving reads refuse a
      // mixed-version ledger instead of silently blending
      // incomparable segmentations (see [[resegment]]).
      val increments = batch
        .select(explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("word"))
        .groupBy("word").agg(count(lit(1)).as("wn"))
        .select(col("word"), col("wn"),
          TokenizerStore.segmented(spark, storeName, col("word")).as("units"),
          lit(TokenizerStore.currentVersion(spark, storeName)).as("vocab_v"),
          lit(batchId).as("batch_id"))
      if (!spark.catalog.tableExists(wcTable))
        increments.write.partitionBy("batch_id").saveAsTable(wcTable)
      else {
        // session conf, not a write option: insertInto on a catalog
        // table ignores per-write options, and STATIC overwrite would
        // truncate every other batch's partition
        val key = "spark.sql.sources.partitionOverwriteMode"
        val prior = spark.conf.getOption(key)
        spark.conf.set(key, "dynamic")
        try increments.write.mode("overwrite").insertInto(wcTable)
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

  /** tx39's corpus token budget `(unit, n, n_words)` served from the
    * COMMITTED ledger alone — vocab-sized work, zero corpus scans:
    * word counts sum across batches, any committed row's `units` is
    * THE segmentation (frozen vocab ⇒ deterministic), and the per-unit
    * rollup is tx39's own aggregation. Empty-but-typed before the
    * first commit; a crash-window orphan batch never surfaces. */
  def unitReport(spark: SparkSession, wcTable: String,
                 markerTable: String): DataFrame = {
    Freshness.refresh(spark, wcTable, markerTable)
    recoverStaging(spark, wcTable)
    if (!spark.catalog.tableExists(wcTable) ||
        !spark.catalog.tableExists(markerTable))
      return spark.range(0)
        .select(lit("").as("unit"), lit(0L).as("n"), lit(0L).as("n_words"))
        .limit(0)
    requireVersionedLayout(spark, wcTable)
    val committed = spark.table(wcTable)
      .join(broadcast(spark.table(markerTable).select("batch_id")),
        Seq("batch_id"), "left_semi")
    requireSingleVocab(committed, wcTable)
    committed
      .groupBy("word")
      .agg(sum("wn").as("wn"), first("units").as("units"))
      .select(col("word"), col("wn"), explode(col("units")).as("unit"))
      .groupBy("unit")
      .agg(sum("wn").as("n"), countDistinct(col("word")).as("n_words"))
      .orderBy("unit")
  }

  /** Refuse a ledger written before vocab-version stamping: its rows
    * don't say WHICH tokenizer produced their units, so after any
    * rebuild they can't be told apart from current rows (the
    * SubstringDedup legacy-ledger rationale — corrupting silently is
    * the one unacceptable outcome). [[resegment]] migrates. */
  private def requireVersionedLayout(spark: SparkSession,
                                     wcTable: String): Unit =
    if (spark.catalog.tableExists(wcTable) &&
        !spark.table(wcTable).columns.contains("vocab_v"))
      throw new IllegalStateException(
        s"$wcTable is a legacy tokenizer ledger without the vocab_v " +
          "column — run TokenizerMaintenance.resegment(spark, wcTable, " +
          "markerTable, storeName) once (maintenance window, maintainer " +
          "stopped) to migrate it under the current vocabulary")

  /** Refuse to SERVE or FOLD a committed ledger whose rows were
    * segmented under more than one tokenizer version: unit counts from
    * different vocabularies are not comparable, and first(units) would
    * pick one arbitrarily. Reachable only by appending after a
    * `TokenizerStore.rebuild` without the post-rebuild [[resegment]] —
    * the refusal names the fix instead of blending. */
  private def requireSingleVocab(committed: DataFrame,
                                 wcTable: String): Unit = {
    val vs = committed.select("vocab_v").distinct().limit(3)
      .collect().map(_.getLong(0)).sorted
    if (vs.length > 1)
      throw new IllegalStateException(
        s"$wcTable holds committed segmentations from tokenizer " +
          s"versions ${vs.mkString(", ")} — a TokenizerStore.rebuild " +
          "happened without the post-rebuild re-segmentation; run " +
          "TokenizerMaintenance.resegment (maintenance window) first")
  }

  /** Post-rebuild / migration pass: rewrite EVERY ledger row's units
    * under the CURRENT tokenizer version (word counts untouched —
    * counts are vocab-independent; segmentation is deterministic per
    * word, so orphan partitions re-segment too and their eventual
    * replay overwrites them identically). Vocab-sized work: one pass
    * over distinct ledger words. Accepts the pre-vocab_v legacy layout
    * (this IS the migration). Crash-safe via the same stage-then-swap
    * as [[compact]]. Concurrency contract: maintenance window,
    * maintainer stopped (SURVEY §6b). */
  def resegment(spark: SparkSession, wcTable: String,
                storeName: String): Unit = {
    recoverStaging(spark, wcTable)
    if (!spark.catalog.tableExists(wcTable)) return
    val v = TokenizerStore.currentVersion(spark, storeName)
    val staged = spark.table(wcTable)
      .select(col("word"), col("wn"),
        TokenizerStore.segmented(spark, storeName, col("word")).as("units"),
        lit(v).as("vocab_v"), col("batch_id"))
    val staging = wcTable + "_staging"
    staged.write.mode("overwrite").partitionBy("batch_id")
      .saveAsTable(staging)
    swapFromStaging(spark, wcTable)
  }

  /** Collapse the ledger to one row per distinct word — COMMITTED rows
    * fold to `(word, sum(wn), units)` under tag = the max committed
    * batch_id (serving is identical by construction: the serve path IS
    * groupBy(word).sum(wn)). Orphan rows are carried through VERBATIM
    * under their own partition, which the batch's eventual replay
    * overwrites completely. Concurrency contract: maintenance window,
    * maintainer stopped (SURVEY §6b). Crash-safe via stage-then-swap
    * with [[recoverStaging]] at every entry point. */
  def compact(spark: SparkSession, wcTable: String,
              markerTable: String): Unit = {
    recoverStaging(spark, wcTable)
    if (!spark.catalog.tableExists(wcTable) ||
        !spark.catalog.tableExists(markerTable)) return
    requireVersionedLayout(spark, wcTable)
    val markers = spark.table(markerTable).select("batch_id")
    val tagRow = markers.agg(max("batch_id")).head()
    if (tagRow.isNullAt(0)) return
    val tag = tagRow.getLong(0)
    val ledger = spark.table(wcTable)
    val committed = ledger
      .join(broadcast(markers), Seq("batch_id"), "left_semi")
    requireSingleVocab(committed, wcTable)
    val folded = committed
      .groupBy("word")
      .agg(sum("wn").as("wn"), first("units").as("units"),
        first("vocab_v").as("vocab_v"))
      .select(col("word"), col("wn"), col("units"), col("vocab_v"),
        lit(tag).as("batch_id"))
    val orphans = ledger
      .join(broadcast(markers), Seq("batch_id"), "left_anti")
      .select("word", "wn", "units", "vocab_v", "batch_id")
    val staging = wcTable + "_staging"
    folded.unionAll(orphans)
      .write.mode("overwrite").partitionBy("batch_id").saveAsTable(staging)
    swapFromStaging(spark, wcTable)
  }

  /** Install the staged ledger as live (by COPY, not RENAME — the
    * in-memory catalog's rename keeps partition locations pointing at
    * the old path, silently emptying a partitioned table; the
    * SubstringDedup rationale). */
  private def swapFromStaging(spark: SparkSession, wcTable: String): Unit = {
    val staging = wcTable + "_staging"
    spark.table(staging)
      .write.mode("overwrite").partitionBy("batch_id").saveAsTable(wcTable)
    spark.sql(s"DROP TABLE IF EXISTS $staging")
  }

  /** Crash recovery for [[compact]]'s stage-then-swap — called by
    * every entry point that reads or writes the ledger. */
  private def recoverStaging(spark: SparkSession, wcTable: String): Unit = {
    val staging = wcTable + "_staging"
    if (!spark.catalog.tableExists(wcTable) &&
        spark.catalog.tableExists(staging))
      swapFromStaging(spark, wcTable)
  }
}
