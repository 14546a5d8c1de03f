package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CORPUS DATASHEET (pl34's serving twin — the 15th
  * maintainer): the per-(source, lang) data card a release publishes —
  * volume, token mass, mean length, exact-duplicate incidence — kept
  * CURRENT as the crawl ingests, instead of recomputed corpus-wide per
  * release. Two ledgers per store:
  *
  *   - `<name>_stats`: one row per (batch, source, lang) with additive
  *     counts (n_docs / n_tok / sum_chars) — serving sums committed
  *     partitions, a GROUP-cardinality aggregation.
  *   - `<name>_digests`: per (batch, full-text md5, source, lang) doc
  *     counts. Exact-dup incidence is NOT batch-additive — a doc's
  *     duplicate may arrive five batches later — so the serve path
  *     re-aggregates the digest ledger globally (digest-cardinality,
  *     fixed-width rows, no text) and counts docs whose digest totals
  *     >1 anywhere in the corpus: exactly pl34's `copies > 1`.
  *
  * Batch-equality contract (spec-pinned): the served datasheet equals
  * batch pl34 over the union corpus — including duplicates that
  * STRADDLE batches, the case a per-batch-only dup count silently
  * undercounts.
  *
  * Scale shape: per-batch work is one scan of the batch (its own
  * digest + token count); serving reads two committed ledgers — stats
  * is (batches × groups)-sized, digests is corpus-cardinality but
  * 32-char-digest-wide (the dd01 shuffle's serve-side analog, ~1/300th
  * of corpus text bytes) — and nothing ever re-reads prior batches'
  * text.
  *
  * Delivery: the NoveltyMonitor partition-overwrite protocol — both
  * per-batch writes are MULTI-row and deterministic, each lands in its
  * own `batch_id` partition, and a crash-window replay REWRITES its
  * partitions. Marker last; committed-only serve. Requires a DURABLE
  * `checkpointDir` (stable batch ids — the IndexMaintenance contract).
  */
object DatasheetMaintenance {

  /** Starts the maintainer: each micro-batch of `newDocs` (`doc_id`,
    * `source`, `lang`, `n_chars`, `text`) is handed to
    * [[datasheetBatch]]. */
  def maintain(newDocs: DataFrame, name: String,
               checkpointDir: String): StreamingQuery = {
    require(checkpointDir.nonEmpty,
      "DatasheetMaintenance.maintain requires a durable checkpointDir: " +
        "replay-skip markers are only valid against stable batch ids")
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        datasheetBatch(batch, batchId, name)
      }
      .start()
  }

  private def statsTable(name: String) = s"${name}_stats"
  private def digestsTable(name: String) = s"${name}_digests"
  private def markerTable(name: String) = s"${name}_marker"

  private def writePartition(part: DataFrame, table: String): Unit = {
    val spark = part.sparkSession
    if (!spark.catalog.tableExists(table))
      part.write.partitionBy("batch_id").saveAsTable(table)
    else {
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prior = spark.conf.getOption(key)
      spark.conf.set(key, "dynamic")
      try part.write.mode("overwrite").insertInto(table)
      finally prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** One micro-batch: the additive stats partition, the digest-count
    * partition, then the commit marker. */
  def datasheetBatch(batch: DataFrame, batchId: Long, name: String): Unit = {
    val spark = batch.sparkSession
    val committed = spark.catalog.tableExists(markerTable(name)) &&
      !spark.table(markerTable(name))
        .filter(col("batch_id") === batchId).isEmpty
    if (committed) return

    val d = batch.select(col("source"), col("lang"), col("n_chars"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
        .as("n_tok"),
      md5(col("text")).as("dig"))
      .persist()
    try {
      writePartition(
        d.groupBy("source", "lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tok"),
            sum("n_chars").as("sum_chars"))
          .withColumn("batch_id", lit(batchId)),
        statsTable(name))
      writePartition(
        d.groupBy("dig", "source", "lang").agg(count(lit(1)).as("n"))
          .withColumn("batch_id", lit(batchId)),
        digestsTable(name))
      batch.groupBy().agg(count(lit(1)).as("n_docs"))
        .withColumn("batch_id", lit(batchId))
        .select("batch_id", "n_docs")
        .write.mode("append").saveAsTable(markerTable(name))
    } finally d.unpersist()
  }

  /** The live datasheet over committed batches — pl34's exact columns
    * (source, lang, n_docs, total_tokens, mean_chars, n_exact_dup),
    * unsorted — callers order. Empty-but-typed before first commit. */
  def datasheet(spark: SparkSession, name: String): DataFrame = {
    if (!spark.catalog.tableExists(statsTable(name)) ||
        !spark.catalog.tableExists(markerTable(name)))
      return spark.range(0).select(lit("").as("source"), lit("").as("lang"),
        lit(0L).as("n_docs"), lit(0L).as("total_tokens"),
        lit(0.0).as("mean_chars"), lit(0L).as("n_exact_dup"))
    val committed = broadcast(
      spark.table(markerTable(name)).select("batch_id"))
    val base = spark.table(statsTable(name))
      .join(committed, Seq("batch_id"), "left_semi")
      .groupBy("source", "lang")
      .agg(sum("n_docs").as("n_docs"), sum("n_tok").as("total_tokens"),
        sum("sum_chars").as("sum_chars"))
    val dg = spark.table(digestsTable(name))
      .join(committed, Seq("batch_id"), "left_semi")
    val dupDigs = dg.groupBy("dig").agg(sum("n").as("tot"))
      .filter(col("tot") > 1).select("dig")
    val dup = dg.join(dupDigs, Seq("dig"))
      .groupBy("source", "lang").agg(sum("n").as("n_exact_dup"))
    base.join(dup, Seq("source", "lang"), "left")
      .select(col("source"), col("lang"), col("n_docs"),
        col("total_tokens"),
        graft.functions.ParityFunctions.duckRound(
          col("sum_chars").cast("double") / col("n_docs").cast("double"), 4)
          .as("mean_chars"),
        coalesce(col("n_exact_dup"), lit(0L)).as("n_exact_dup"))
  }
}
