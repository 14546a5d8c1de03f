package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.index.Erasure

/** Streaming right-to-erasure processor (the 22nd maintainer —
  * `index.Erasure`'s serving twin): in production, erasure requests
  * ARRIVE AS A STREAM (a privacy-portal queue, a legal-hold feed), and
  * the SLA clock starts at arrival — so the request path itself should
  * be a maintained streaming artifact, not a human running a batch
  * job. Each micro-batch of requested doc_ids is recorded into the
  * durable erasure ledger and immediately enforced against the
  * serve-time-tombstone artifacts (maintained postings + vector store
  * — the two surfaces a reader can still QUERY between erasure and the
  * next compaction; the physically-purged ledger artifacts follow at
  * the `fullScope` cadence below, or the operator's own
  * `Erasure.enforceAll` runs — both replay the same ledger this
  * maintainer feeds). One report row per batch — (n_requested,
  * n_new, n_ledger_total) — is the auditor's evidence that every
  * request batch was processed, and its commit marker is the SLA
  * timestamp.
  *
  * Full-propagation cadence: pass `fullScope` (the warehouse's
  * [[Erasure.Scope]] coverage statement) and every `fullEvery`-th
  * batch also runs [[Erasure.enforceAll]] over the WHOLE ledger —
  * the physically-purged artifacts (cleaned-corpus tables, digest
  * ledgers, build-once stores) then follow the stream at a bounded
  * lag instead of relying on an out-of-band operator job. The tick is
  * keyed to the stable batch id, so replay re-runs the same
  * (idempotent) sweep; ids recorded between ticks are narrowly
  * enforced immediately and fully propagated at the next tick, and a
  * tick replays the ENTIRE ledger, so no request can fall between
  * cadence boundaries. `victimDocs` follows enforceAll's contract
  * (required when the scope lists content-digest ledgers; already-
  * purged digests re-derive to a no-op, so passing the live corpus
  * frame every tick is safe).
  *
  * Protocol: report row FIRST (orphan-adopted on replay, so `n_new` —
  * computed against the pre-record ledger — stays the first attempt's
  * truth), then the idempotent record + enforce, marker LAST. A crash
  * anywhere replays the whole batch: the orphan report row is adopted,
  * record/enforce re-run as no-ops over the already-recorded ids, and
  * the marker lands. Committed-only serve.
  *
  * Scale shape: a request batch is operational-sized (the erasure
  * ledger contract — bounded driver collects); enforce's artifact-side
  * work is the postings membership probe and tombstone appends, both
  * pending-bounded. Inherits Erasure's single-writer contract: one
  * maintainer instance owns the ledger.
  */
object ErasureMaintenance {

  /** Start the processor: `requests` is a stream of (`doc_id`) erasure
    * requests; every micro-batch records + enforces + reports. */
  def maintain(requests: DataFrame, ledger: String,
               termDocTable: Option[String], statsTable: Option[String],
               vectorStore: Option[String],
               reportTable: String, markerTable: String,
               checkpointDir: String,
               fullScope: Option[Erasure.Scope] = None,
               fullEvery: Int = 8,
               victimDocs: Option[DataFrame] = None): StreamingQuery = {
    require(checkpointDir.nonEmpty,
      "ErasureMaintenance.maintain requires a durable checkpointDir: " +
        "replay-skip markers are only valid against stable batch ids")
    require(fullEvery > 0, s"fullEvery must be positive, got $fullEvery")
    requests.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        eraseBatch(batch, batchId, ledger, termDocTable, statsTable,
          vectorStore, reportTable, markerTable, fullScope, fullEvery,
          victimDocs)
      }
      .start()
  }

  /** One micro-batch of requests: adopt-or-write the report row,
    * record + enforce (both idempotent), marker last. */
  def eraseBatch(batch: DataFrame, batchId: Long, ledger: String,
                 termDocTable: Option[String], statsTable: Option[String],
                 vectorStore: Option[String],
                 reportTable: String, markerTable: String,
                 fullScope: Option[Erasure.Scope] = None,
                 fullEvery: Int = 8,
                 victimDocs: Option[DataFrame] = None): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (committed) return
    // a request batch is operational-sized by the ledger contract —
    // this collect is the same bounded class as Erasure.enforce's own
    val ids = batch.select("doc_id").distinct().as[Long].collect().toSeq
    val orphaned = spark.catalog.tableExists(reportTable) &&
      !spark.table(reportTable).filter(col("batch_id") === batchId).isEmpty
    if (!orphaned) {
      // n_new probed against the PRE-record ledger: the report row is
      // written before the side effects, so a crash-replay adopts the
      // first attempt's truth instead of recomputing 0 after its
      // record already landed
      val before = Erasure.requested(spark, ledger)
      val nNew = ids.toDF("doc_id")
        .join(broadcast(before), Seq("doc_id"), "left_anti").count()
      val total = before.count() + nNew
      graft.index.VectorStore.clearOrphanLocation(spark, reportTable)
      Seq((batchId, ids.size.toLong, nNew, total))
        .toDF("batch_id", "n_requested", "n_new", "n_ledger_total")
        .write.mode("append").saveAsTable(reportTable)
    }
    Erasure.record(spark, ids, ledger)
    Erasure.enforce(spark, ledger, termDocTable, statsTable, vectorStore)
    // cadence tick BEFORE the marker: a crash mid-sweep replays the
    // batch and re-runs the (idempotent, whole-ledger) sweep
    fullScope.foreach { scope =>
      if ((batchId + 1) % fullEvery == 0)
        Erasure.enforceAll(spark, ledger, scope, victimDocs)
    }
    Seq(batchId).toDF("batch_id")
      .write.mode("append").saveAsTable(markerTable)
  }

  /** Committed report rows only — the SLA audit surface (empty-typed
    * before the first commit). */
  def report(spark: SparkSession, reportTable: String,
             markerTable: String): DataFrame = {
    Freshness.refresh(spark, reportTable, markerTable)
    if (!spark.catalog.tableExists(reportTable) ||
        !spark.catalog.tableExists(markerTable))
      return spark.range(0).select(col("id").as("batch_id"),
        lit(0L).as("n_requested"), lit(0L).as("n_new"),
        lit(0L).as("n_ledger_total"))
    spark.table(reportTable)
      .join(broadcast(spark.table(markerTable).select("batch_id")),
        Seq("batch_id"), "left_semi")
  }
}
