package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Right-to-erasure orchestration (the GDPR/CCPA delete-propagation
  * surface a training-data platform must have): one durable LEDGER of
  * erasure requests drives tombstones across every serving artifact,
  * so "delete user X's documents" is one call — not a per-artifact
  * checklist someone forgets half of.
  *
  * Protocol: [[record]] the ids FIRST (append-only, dedup'd — the
  * source of truth), then [[enforce]] derives every artifact's
  * tombstone state from the ledger. Both steps are idempotent, so a
  * crash anywhere in [[erase]] is healed by re-running it with any
  * superset of the ids (or just [[enforce]] — it replays the whole
  * ledger). Physical purge stays where it belongs: the artifacts'
  * own compaction rewrites (`IndexMaintenance.compact` with its
  * tombstone table, `VectorMaintenance.compact` for codes) — erasure
  * makes rows UNSERVABLE immediately and FREE at the next compact,
  * never a standalone full-artifact rewrite per request.
  *
  * Re-ingestion hazard: the ledger is all-time, but a doc re-appended
  * AFTER an enforce serves again until the next one — crawls re-fetch.
  * Gate ingestion with [[filterIngest]] (one broadcast anti-join per
  * batch) so an erased id can never re-enter an artifact at all.
  *
  * Scale shape: the ledger is operational-request-sized (bounded, so
  * the vector path's driver-side id collect is too); the only
  * artifact-sized work is the postings membership probe in [[enforce]]
  * — a semi-join at maintenance cadence, not serve time.
  */
object Erasure {

  /** Tombstone-table convention for a maintained postings table —
    * what [[enforce]] writes and serving anti-joins via
    * `IndexMaintenance.withoutDeleted`, and what
    * `IndexMaintenance.compact` purges and clears. */
  def postingsTombstones(termDocTable: String): String =
    termDocTable + "_tombstones"

  /** Append `ids` to the erasure ledger, deduplicated — already-
    * recorded ids append nothing (the deleteVecs pattern), so replays
    * and overlapping requests are no-ops. Returns the newly recorded
    * count.
    *
    * Single-writer contract (the maintainers' maintenance-window
    * contract): the dedup is check-then-append, so two CONCURRENT
    * record/erase calls with overlapping ids can both pass the probe
    * and append duplicate ledger rows. Everything downstream stays
    * correct (enforce distincts, deleteVecs/deleteDocs dedup their own
    * appends), but the returned count and the ledger's row count drift
    * — serialize erasure requests through one caller. */
  def record(spark: SparkSession, ids: Seq[Long], ledger: String): Long = {
    import spark.implicits._
    if (ids.isEmpty) return 0L
    val requested = ids.distinct.toDF("doc_id")
    val fresh =
      if (spark.catalog.tableExists(ledger))
        requested.join(spark.table(ledger), Seq("doc_id"), "left_anti")
      else requested
    val n = fresh.count()
    if (n > 0) {
      VectorStore.clearOrphanLocation(spark, ledger)
      fresh.write.mode("append").saveAsTable(ledger)
    }
    n
  }

  /** All-time requested ids (empty-but-typed before the first
    * [[record]]). */
  def requested(spark: SparkSession, ledger: String): DataFrame =
    if (!spark.catalog.tableExists(ledger))
      spark.range(0).select(col("id").as("doc_id"))
    else spark.table(ledger).select("doc_id")

  /** Ingestion gate: drop arriving rows whose `doc_id` was erased —
    * one broadcast anti-join per batch (the ledger is request-sized).
    * Without this a re-crawled page re-enters every artifact and the
    * erasure silently un-happens at the next enforce gap. */
  def filterIngest(batch: DataFrame, ledger: String): DataFrame = {
    val spark = batch.sparkSession
    if (!spark.catalog.tableExists(ledger)) batch
    else batch.join(
      broadcast(spark.table(ledger).select("doc_id")),
      Seq("doc_id"), "left_anti")
  }

  /** Derive every artifact's tombstone state from the LEDGER
    * (idempotent — call after a crash, after a compact, or on a
    * schedule):
    *
    *  - maintained postings (`termDocTable` + its stats ledger): the
    *    ledger ids still present in served postings are tombstoned via
    *    `IndexMaintenance.deleteDocs` — which APPENDS (so tombstones
    *    the operator's own deleteDocs wrote to the same shared table
    *    survive an enforce) and decrements the stats ledger's n_docs
    *    for first-time ids (so BM25's N / avgdl track the LIVE corpus
    *    whichever deletion surface removed the doc). Afterwards the
    *    table is PRUNED to ids still in postings — already-purged ids
    *    drop out, so the serve-time broadcast anti-join stays bounded
    *    by pending work, not all-time erasure volume (the reason
    *    compact may clear it without consulting the ledger);
    *  - vector store `vectorStore`: `VectorStore.deleteVecs` with the
    *    ledger ids (doc_id == vec_id, the mm08 id-space convention) —
    *    itself idempotent and absent-id-safe.
    */
  def enforce(spark: SparkSession, ledger: String,
              termDocTable: Option[String] = None,
              statsTable: Option[String] = None,
              vectorStore: Option[String] = None): Unit = {
    import spark.implicits._
    val req = requested(spark, ledger)
    termDocTable.foreach { td =>
      val st = statsTable.getOrElse(sys.error(
        s"enforce on $td needs its stats table (the serve path reads both)"))
      val t = postingsTombstones(td)
      val postedIds = graft.streaming.IndexMaintenance
        .postings(spark, td, st).select("doc_id")
      // ledger ids still in postings — request-sized by the ledger
      // contract, so this collect is the same bounded class as the
      // vector path's below
      val pendingLedger = postedIds
        .join(broadcast(req), Seq("doc_id"), "left_semi")
        .distinct().as[Long].collect().toSeq
      // append-with-decrement for first-time ids: deleteDocs dedups
      // against the SHARED tombstone table, so ids the operator already
      // deleted (or a prior enforce tombstoned) neither re-append nor
      // double-decrement
      VectorStore.clearOrphanLocation(spark, t)
      graft.streaming.IndexMaintenance.deleteDocs(spark, pendingLedger, t, st)
      // prune purged ids (keeps the serve-time broadcast pending-sized);
      // rows the operator's deleteDocs wrote stay as long as their doc
      // is still served
      if (spark.catalog.tableExists(t)) {
        val keep = spark.table(t)
          .join(postedIds, Seq("doc_id"), "left_semi")
          .distinct().as[Long].collect().toSeq // bounded: tombstones
        if (keep.isEmpty) {
          // nothing pending: serving must pass through, and an empty
          // broadcast table earns nothing — drop it
          spark.sql(s"DROP TABLE IF EXISTS $t")
        } else if (keep.size < spark.table(t).count()) {
          keep.toDF("doc_id").write.mode("overwrite").saveAsTable(t)
        }
      }
    }
    vectorStore.foreach { vs =>
      // the ledger is request-sized by contract — this collect is the
      // same bounded class as the store's probe/centroid collects
      val ids = req.collect().map(_.getLong(0)).toSeq
      VectorStore.deleteVecs(spark, ids, vs)
    }
  }

  /** [[record]] then [[enforce]] — the one-call surface. Crash
    * between the two: the ledger already has the ids, so the next
    * erase/enforce (any ids) completes the propagation. */
  def erase(spark: SparkSession, ids: Seq[Long], ledger: String,
            termDocTable: Option[String] = None,
            statsTable: Option[String] = None,
            vectorStore: Option[String] = None): Unit = {
    record(spark, ids, ledger)
    enforce(spark, ledger, termDocTable, statsTable, vectorStore)
  }
}
