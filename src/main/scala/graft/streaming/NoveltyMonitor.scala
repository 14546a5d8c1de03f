package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming content-novelty monitor (pl29's serving twin — the 13th
  * maintainer): a crawl keeps ingesting, and the question its operator
  * actually asks per batch is "is this bringing anything NEW, or are we
  * paying to re-download the same content?". Each micro-batch's
  * distinct 5-gram digests are anti-joined against the seen-digest
  * ledger of every PRIOR batch; the batch gets one report row —
  * (n_docs, n_ngrams, n_novel, novelty) — and contributes its novel
  * digests to the ledger. A feed going stale (mirror loops, re-crawl
  * storms, a boilerplate-only source) shows up as novelty collapsing
  * toward 0 within one micro-batch — the ingest-side complement of the
  * batch curriculum signal.
  *
  * Batch-equality contract: digests come from the SAME construction as
  * pl29 (`Pipeline.ngramDigestsOf`), and a digest enters the ledger in
  * the batch where it is FIRST seen — so when batches arrive in doc_id
  * order, each batch's `n_novel` equals pl29's per-doc `n_novel`
  * summed over the batch's docs (first-seen-by-doc aggregates to
  * first-seen-by-batch; spec-pinned).
  *
  * Scale shape: the ledger stores each distinct corpus digest exactly
  * ONCE (32 fixed chars; partitions are disjoint by construction, so
  * no compaction re-aggregation is ever needed), the anti-join is a
  * digest equi-join, and per-batch work is the batch's own shingle
  * pass — nothing re-reads past batches' text.
  *
  * Delivery: the SubstringDedup partition-overwrite protocol. The
  * per-batch novel-digest write is MULTI-row, so partial visibility
  * after a mid-commit crash is a real failure mode and adoption is
  * unsound; the ledger is therefore partitioned by batch_id and a
  * replay landing in the crash window REWRITES its partition with the
  * full deterministic set (novelty is computed against partitions
  * `batch_id != this`, so the recompute never sees its own partial
  * rows). The single-row report write uses orphan ADOPTION (the
  * DriftMonitor device — a 1-row write is visible whole or not at
  * all). Marker last; committed-only serve. Requires a DURABLE
  * `checkpointDir` (stable batch ids — the IndexMaintenance contract).
  */
object NoveltyMonitor {

  /** Starts the monitor: each micro-batch of `newDocs` (`doc_id`,
    * `text`) is handed to [[noveltyBatch]]. */
  def maintain(newDocs: DataFrame, seenTable: String, reportTable: String,
               markerTable: String, checkpointDir: String,
               erasureLedger: Option[String] = None): StreamingQuery = {
    require(checkpointDir.nonEmpty,
      "NoveltyMonitor.maintain requires a durable checkpointDir: " +
        "replay-skip markers are only valid against stable batch ids")
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        noveltyBatch(graft.index.Erasure.gateBatch(batch, erasureLedger),
          batchId, seenTable, reportTable, markerTable)
      }
      .start()
  }

  /** One micro-batch: novel digests into the ledger's `batch_id=N`
    * partition (dynamic overwrite), the 1-row report (adopted if
    * orphaned), then the commit marker. */
  def noveltyBatch(batch: DataFrame, batchId: Long, seenTable: String,
                   reportTable: String, markerTable: String): Unit = {
    val spark = batch.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (committed) return

    val ng = ngrams(batch).persist()
    try {
      // prior = everything OUTSIDE this batch's partition: replays in
      // the crash window must not count their own (possibly partial)
      // earlier write as "seen"
      val novel =
        if (!spark.catalog.tableExists(seenTable)) ng.select(col("d")).distinct()
        else ng.select(col("d")).distinct()
          .join(spark.table(seenTable).filter(col("batch_id") =!= batchId)
            .select(col("d")), Seq("d"), "left_anti")
      // partition column last: saveAsTable layout, insertInto positional
      val part = novel.select(col("d"), lit(batchId).as("batch_id"))
      if (!spark.catalog.tableExists(seenTable))
        part.write.partitionBy("batch_id").saveAsTable(seenTable)
      else {
        val key = "spark.sql.sources.partitionOverwriteMode"
        val prior = spark.conf.getOption(key)
        spark.conf.set(key, "dynamic")
        try part.write.mode("overwrite").insertInto(seenTable)
        finally prior match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      }

      val orphaned = spark.catalog.tableExists(reportTable) &&
        !spark.table(reportTable).filter(col("batch_id") === batchId).isEmpty
      if (!orphaned) {
        val nNovel = spark.table(seenTable)
          .filter(col("batch_id") === batchId).count()
        ng.agg(countDistinct(col("d")).as("n_ngrams"))
          .crossJoin(batch.agg(count(lit(1)).as("n_docs")))
          .select(lit(batchId).as("batch_id"), col("n_docs"),
            col("n_ngrams"), lit(nNovel).as("n_novel"),
            graft.functions.ParityFunctions.duckRound(
              lit(nNovel).cast("double") /
                greatest(col("n_ngrams"), lit(1L)).cast("double"), 6)
              .as("novelty"))
          .write.mode("append").saveAsTable(reportTable)
      }

      batch.groupBy().agg(count(lit(1)).as("n_docs"))
        .withColumn("batch_id", lit(batchId))
        .select("batch_id", "n_docs")
        .write.mode("append").saveAsTable(markerTable)
    } finally ng.unpersist()
  }

  /** The batch's (doc_id, distinct 5-gram digest) frame — pl29's exact
    * construction (`Pipeline.ngramDigestsOf`). */
  private def ngrams(batch: DataFrame): DataFrame =
    graft.queries.Pipeline.ngramDigestsOf(batch.select("doc_id", "text"))

  /** Committed novelty rows only (empty-but-typed when nothing has
    * committed yet). */
  def noveltyRows(spark: SparkSession, reportTable: String,
                  markerTable: String): DataFrame = {
    Freshness.refresh(spark, reportTable, markerTable)
    if (!spark.catalog.tableExists(reportTable) ||
        !spark.catalog.tableExists(markerTable))
      return spark.range(0)
        .select(col("id").as("batch_id"), lit(0L).as("n_docs"),
          lit(0L).as("n_ngrams"), lit(0L).as("n_novel"),
          lit(0.0).as("novelty"))
    spark.table(reportTable)
      .join(broadcast(spark.table(markerTable).select("batch_id")),
        Seq("batch_id"), "left_semi")
  }
}
