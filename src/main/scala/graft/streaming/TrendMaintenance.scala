package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{HeavyHitters, HHEntry, SketchMerge}

/** Streaming heavy hitters (tx20's maintenance twin): track the
  * frequent tokens of a corpus that arrives as a continuous crawl,
  * without ever re-scanning history. Each micro-batch reduces to ONE
  * O(k) Misra–Gries sketch (the same `graft.operators.HeavyHitters`
  * aggregator tx20 uses, so map-side partials and the merge step are
  * shared code); the ledger stores per-batch sketch ROWS, and serving
  * merges the `batches × k` entries — never the token stream.
  *
  * Correctness rests on the MERGEABILITY of Misra–Gries (Agarwal et
  * al., "Mergeable Summaries", PODS'12): merging per-batch sketches of
  * size k over sub-streams n_1..n_m keeps the summary guarantees for
  * the concatenated stream n = Σn_i —
  *   - every token with true count > n/(k+1) is present;
  *   - every estimate satisfies true − n/(k+1) ≤ est ≤ true.
  * `TrendMaintenanceSpec` pins both bounds against exact counts of the
  * streamed corpus, plus replay safety.
  *
  * Scale shape: per batch the cluster shuffles |partitions| × k sketch
  * entries (the aggregator's partial maps), the ledger grows by ≤ k
  * rows per batch, and the serve-time merge is itself a Spark
  * aggregation ([[mergedSketchFrame]]): per-batch maps are rebuilt
  * executor-side and folded with the aggregator's own O(k) merge, so
  * the driver receives ONE O(k) map — it is never on the serve path.
  * Compaction (fold the ledger back to one sketch row-set under a
  * fresh batch tag) keeps the ledger O(k) if batch count ever
  * matters; at one row per (batch, entry) it rarely does.
  *
  * Delivery: commit-marker replay-skip, same contract as
  * `ChunkDedup`/`IndexMaintenance` — `checkpointDir` must be durable
  * so batch ids stay stable across restarts.
  */
object TrendMaintenance {

  /** Starts the sketch-maintenance query over streaming `newDocs`
    * (`doc_id`, `text`). One MG sketch of size `k` per micro-batch. */
  def maintain(newDocs: DataFrame, sketchTable: String, markerTable: String,
               checkpointDir: String, k: Int,
               erasureLedger: Option[String] = None): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .queryName(Maintenance.queryNameFor(sketchTable))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(graft.index.Erasure.gateBatch(batch, erasureLedger),
          batchId, sketchTable, markerTable, k)
      }
      .start()

  /** One micro-batch: tokenize, reduce to one O(k) sketch, append its
    * entries `(batch_id, item, est)` then the `(batch_id, n_tokens)`
    * commit marker. Replay-safe via the marker — and unlike the
    * ADDITIVE ledgers (ChunkDedup increments, where a crash-window
    * replay merely double-counts), duplicate sketch ROW-SETS under one
    * batch_id would be silently map-merged into a non-MG summary, so
    * the crash window between the two writes is closed here: if the
    * sketch rows are already visible (the file commit protocol makes
    * partial visibility impossible — rows appear only when the append
    * job commits), the replay ADOPTS them and writes only the marker,
    * never a second row-set. */
  def appendBatch(batch: DataFrame, batchId: Long, sketchTable: String,
                  markerTable: String, k: Int): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    // a crashed compact swap may have left the ledger under its staging
    // name; adopt it BEFORE the orphan check, or this batch would start
    // a fresh sketch table and strand the staged ledger forever
    recoverStaging(spark, sketchTable)
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (!committed) {
      val orphaned = spark.catalog.tableExists(sketchTable) &&
        !spark.table(sketchTable).filter(col("batch_id") === batchId).isEmpty
      val toks = batch
        .select(explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("token"))
        .persist() // feeds the sketch AND the length count — one tokenize
      val n = toks.count()
      if (!orphaned) {
        // one aggregation: partial O(k) maps per partition, O(k) merge
        // — the token stream itself never shuffles
        val agg = new HeavyHitters(k)
        val entries = toks.select(col("token").as[String])
          .select(agg.toColumn.name("sketch"))
          .head()
        entries.toDF()
          .select(lit(batchId).as("batch_id"), col("item"), col("est"))
          .write.mode("append").saveAsTable(sketchTable)
      }
      toks.unpersist()
      Seq((batchId, n)).toDF("batch_id", "n_tokens")
        .write.mode("append").saveAsTable(markerTable)
    }
  }

  /** The serve-path merge as a Spark AGGREGATION (exposed for plan
    * audits): per-batch sketch maps are rebuilt executor-side
    * (`groupByKey` on batch_id) and folded with [[SketchMerge]] — the
    * aggregator's own pairwise merge running as a standard partial/
    * final aggregation, mergeable-summaries-safe under any merge
    * order. COMMITTED batches only: an orphan row-set whose marker
    * never landed must not serve (its tokens are also absent from
    * streamLength, so quoting n/(k+1) against it would lie). The
    * driver receives the single O(k) result map, never the ledger. */
  def mergedSketchFrame(spark: SparkSession, sketchTable: String,
                        markerTable: String, k: Int): Dataset[Map[String, Long]] = {
    import spark.implicits._
    spark.table(sketchTable)
      .join(spark.table(markerTable).select("batch_id"), "batch_id")
      .select(col("batch_id"), col("item"), col("est"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroups((_, rows) => rows.map(r => r._2 -> r._3).toMap)
      .select(new SketchMerge(k).toColumn)
  }

  /** Serve-time merged sketch, `(item, est)` sorted est desc, item
    * asc. The fold itself runs executor-side ([[mergedSketchFrame]]);
    * batch order doesn't affect the guarantees (mergeable summaries). */
  def heavyHitters(spark: SparkSession, sketchTable: String,
                   markerTable: String, k: Int): Seq[HHEntry] = {
    Freshness.refresh(spark, sketchTable, markerTable)
    recoverStaging(spark, sketchTable)
    if (!spark.catalog.tableExists(sketchTable) ||
        !spark.catalog.tableExists(markerTable)) return Nil
    new HeavyHitters(k)
      .finish(mergedSketchFrame(spark, sketchTable, markerTable, k).head())
  }

  /** Compaction (the operational counterpart IndexMaintenance.compact
    * is to the postings table): fold all committed per-batch sketches
    * into ONE merged row-set under a fresh synthetic batch tag, so the
    * ledger returns to O(k) rows however many batches have landed.
    * The merged sketch REPLACES its inputs — serving before/after is
    * identical because the merged map IS the serve path's result. The
    * marker ledger keeps one row per original batch (stream length and
    * replay history must survive compaction); the compacted tag is the
    * max COMMITTED batch_id so a replayed old batch is still
    * marker-skipped.
    *
    * Concurrency contract: run compact() in a maintenance window — the
    * maintainer query must be stopped (or idle past its last commit).
    * Within that contract the two crash hazards are closed:
    *   - the committed set is SNAPSHOT once, and sketch rows outside
    *     it (a crash-window orphan row-set whose marker never landed)
    *     are carried through the rewrite VERBATIM, so a later replay
    *     can still adopt them — they are never silently dropped;
    *   - the rewrite is stage-then-swap, never overwrite-in-place: the
    *     new ledger is fully written under `<sketchTable>_staging`
    *     before the one vulnerable step (drop + rename). A crash
    *     before the drop leaves the old ledger untouched; a crash
    *     between drop and rename is healed by [[recoverStaging]] at
    *     every entry point (the staged ledger is complete by then). */
  def compact(spark: SparkSession, sketchTable: String, markerTable: String,
              k: Int): Unit = {
    import spark.implicits._
    recoverStaging(spark, sketchTable)
    if (!spark.catalog.tableExists(sketchTable) ||
        !spark.catalog.tableExists(markerTable)) return
    val committed = spark.table(markerTable)
      .select("batch_id").as[Long].collect().toSet
    if (committed.isEmpty) return
    // the same executor-side fold the serve path runs, so serving
    // before and after compaction is identical by construction
    val merged =
      mergedSketchFrame(spark, sketchTable, markerTable, k).head()
    if (merged.isEmpty) return
    val orphans = spark.table(sketchTable)
      .select(col("batch_id"), col("item"), col("est"))
      .as[(Long, String, Long)]
      .collect() // bounded: batches × k rows, and compact is offline
      .filterNot { case (b, _, _) => committed(b) }
    val tag = committed.max
    val out = merged.toSeq.map { case (i, c) => (tag, i, c) } ++ orphans
    val staging = sketchTable + "_staging"
    out.toDF("batch_id", "item", "est")
      .write.mode("overwrite").saveAsTable(staging)
    spark.sql(s"DROP TABLE IF EXISTS $sketchTable")
    spark.sql(s"ALTER TABLE $staging RENAME TO $sketchTable")
  }

  /** Crash recovery for [[compact]]'s stage-then-swap: a crash between
    * the DROP and the RENAME leaves no sketch table but a complete
    * staged ledger — adopt it. Called by every entry point that reads
    * or writes the sketch table. */
  private def recoverStaging(spark: SparkSession, sketchTable: String): Unit = {
    val staging = sketchTable + "_staging"
    if (!spark.catalog.tableExists(sketchTable) &&
        spark.catalog.tableExists(staging))
      spark.sql(s"ALTER TABLE $staging RENAME TO $sketchTable")
  }

  /** Total stream length Σ n_tokens across committed batches — the n
    * in the n/(k+1) error bound a consumer should quote. */
  def streamLength(spark: SparkSession, markerTable: String): Long =
    { Freshness.refresh(spark, markerTable)
    if (!spark.catalog.tableExists(markerTable)) 0L
    // coalesce: a crash during the first marker append can leave the
    // table existing but EMPTY, where sum() is NULL (getLong would NPE)
    else spark.table(markerTable)
      .agg(coalesce(sum("n_tokens"), lit(0L))).head().getLong(0)
  }
}
