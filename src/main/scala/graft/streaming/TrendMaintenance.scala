package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{HeavyHitters, HHEntry}

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
  * rows per batch, and the serve-time merge folds a bounded frame on
  * the driver — the same bounded-artifact convention as
  * `Similarity.collectCentroids`. Compaction (fold the ledger back to
  * one sketch row-set under a fresh batch tag) keeps the ledger O(k)
  * if batch count ever matters; at one row per (batch, entry) it
  * rarely does.
  *
  * Delivery: commit-marker replay-skip, same contract as
  * `ChunkDedup`/`IndexMaintenance` — `checkpointDir` must be durable
  * so batch ids stay stable across restarts.
  */
object TrendMaintenance {

  /** Starts the sketch-maintenance query over streaming `newDocs`
    * (`doc_id`, `text`). One MG sketch of size `k` per micro-batch. */
  def maintain(newDocs: DataFrame, sketchTable: String, markerTable: String,
               checkpointDir: String, k: Int): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, batchId, sketchTable, markerTable, k)
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

  /** Serve-time merged sketch: fold the per-batch sketches with the
    * SAME pairwise merge the aggregator uses. The ledger is bounded
    * (`batches × k` rows), so the driver-side fold is bounded — and
    * batch order doesn't affect the guarantees (mergeable summaries).
    * Returns `(item, est)` sorted est desc, item asc. */
  def heavyHitters(spark: SparkSession, sketchTable: String,
                   markerTable: String, k: Int): Seq[HHEntry] = {
    if (!spark.catalog.tableExists(sketchTable) ||
        !spark.catalog.tableExists(markerTable)) return Nil
    val agg = new HeavyHitters(k)
    // COMMITTED batches only: an orphan row-set whose marker never
    // landed must not serve (its tokens are also absent from
    // streamLength, so quoting n/(k+1) against it would lie)
    val perBatch = spark.table(sketchTable)
      .join(spark.table(markerTable).select("batch_id"), "batch_id")
      .collect()
      .groupBy(_.getLong(0))
      .toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.map(r => r.getString(1) -> r.getLong(2)).toMap
      }
    val merged = perBatch.foldLeft(agg.zero)(agg.merge)
    agg.finish(merged)
  }

  /** Compaction (the operational counterpart IndexMaintenance.compact
    * is to the postings table): fold all committed per-batch sketches
    * into ONE merged row-set under a fresh synthetic batch tag, so the
    * ledger returns to O(k) rows however many batches have landed.
    * The merged sketch REPLACES its inputs — serving before/after is
    * identical because the serve path performs the same fold. The
    * marker ledger keeps one row per original batch (stream length and
    * replay history must survive compaction); the compacted tag is
    * max(batch_id) so a replayed old batch is still marker-skipped. */
  def compact(spark: SparkSession, sketchTable: String, markerTable: String,
              k: Int): Unit = {
    import spark.implicits._
    val merged = heavyHitters(spark, sketchTable, markerTable, k)
    if (merged.nonEmpty) {
      val tag = spark.table(markerTable).agg(max("batch_id"))
        .head().getLong(0)
      merged.toDF()
        .select(lit(tag).as("batch_id"), col("item"), col("est"))
        .write.mode("overwrite").saveAsTable(sketchTable)
    }
  }

  /** Total stream length Σ n_tokens across committed batches — the n
    * in the n/(k+1) error bound a consumer should quote. */
  def streamLength(spark: SparkSession, markerTable: String): Long =
    if (!spark.catalog.tableExists(markerTable)) 0L
    // coalesce: a crash during the first marker append can leave the
    // table existing but EMPTY, where sum() is NULL (getLong would NPE)
    else spark.table(markerTable)
      .agg(coalesce(sum("n_tokens"), lit(0L))).head().getLong(0)
}
