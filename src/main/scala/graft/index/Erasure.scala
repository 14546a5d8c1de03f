package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Right-to-erasure orchestration (the GDPR/CCPA delete-propagation
  * surface a training-data platform must have): one durable LEDGER of
  * erasure requests drives removal across every serving artifact, so
  * "delete user X's documents" is one call — not a per-artifact
  * checklist someone forgets half of. The [[Scope]] value is the
  * checklist, made declarative and spec-swept: postings + vector
  * store (serve-time tombstones, purged at their compactions), the
  * RewriteDedup cleaned corpus and ownership digests, DedupStore
  * shingles, build-once IndexStore postings, frozen OrderStore
  * training orders, SplitAssignment/ComponentMaintenance membership,
  * quality/importance/pair/quarantine doc-row tables, and the
  * chunk/substring/datasheet content-digest ledgers.
  *
  * Protocol: [[record]] the ids FIRST (append-only, dedup'd — the
  * source of truth), then [[enforce]] / [[enforceAll]] derives every
  * artifact's erasure state from the ledger. Both steps are
  * idempotent, so a crash anywhere in [[erase]]/[[eraseAll]] is
  * healed by re-running with any superset of the ids (or just the
  * enforce — it replays the whole ledger). The two artifacts with
  * serve-time tombstone protocols stay cheap at request time and go
  * physical at their own compactions; ledger-shaped artifacts purge
  * physically at enforce time, bounded by victim batches (erasure
  * cadence is operational — days, not milliseconds).
  *
  * Re-ingestion hazard: the ledger is all-time, but a doc re-appended
  * AFTER an enforce serves again until the next one — crawls
  * re-fetch. Gate ingestion with [[filterIngest]] (one broadcast
  * anti-join per batch); every maintainer's `maintain()` accepts an
  * `erasureLedger` and applies [[gateBatch]] inside its own
  * foreachBatch, so an erased id can never re-enter an artifact at
  * all.
  *
  * Scale shape: the ledger is operational-request-sized (bounded, so
  * the driver-side id collects are too); artifact-sized work is the
  * postings membership probe plus the victim-partition rewrites —
  * maintenance cadence, never serve time.
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
      // same bounded class as the store's probe/centroid collects.
      // Only ids still PRESENT in the codes are tombstoned, so a
      // replay after the compaction purge stays a no-op instead of
      // resurrecting the tombstone table with already-purged ids.
      val ids = req.collect().map(_.getLong(0)).toSeq
      VectorStore.deleteVecs(spark, VectorStore.presentIn(spark, ids, vs),
        vs)
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

  // ---- Warehouse-wide propagation ------------------------------------
  // The narrow enforce above covers the two artifacts with serve-time
  // tombstone protocols (maintained postings, vector store). Everything
  // else that HOLDS an erased document — its cleaned text, tokens,
  // shingles, scores, split membership, chunk/window digests — is
  // purged PHYSICALLY at erasure time instead: those ledgers are
  // maintenance artifacts whose rows live in batch_id partitions (a
  // victim-bounded dynamic partition rewrite) or in small appended
  // tables (a staged full rewrite). Erasure cadence is operational
  // (GDPR allows days), so an O(victim-batches) rewrite per request is
  // the honest trade against threading a tombstone anti-join through
  // every one of their serve paths.

  /** [[filterIngest]] lifted to the maintainers' foreachBatch seam:
    * gate `batch` on `ledger` when one is configured — the `None`
    * default keeps every existing call site byte-identical. Pair- or
    * event-shaped batches pass their own id columns (both endpoints of
    * a pair batch; `user_id` for event streams). Applied INSIDE the
    * batch closure, so each micro-batch sees the ledger as of its own
    * run — an id erased mid-stream gates from the next batch on. */
  def gateBatch(batch: DataFrame, ledger: Option[String],
                idCols: Seq[String] = Seq("doc_id")): DataFrame =
    ledger match {
      case None => batch
      case Some(l) =>
        val spark = batch.sparkSession
        if (!spark.catalog.tableExists(l)) batch
        else {
          val v = broadcast(spark.table(l).select("doc_id"))
          idCols.foldLeft(batch)((d, c) =>
            d.join(v.withColumnRenamed("doc_id", c), Seq(c), "left_anti"))
        }
    }

  /** Declarative inventory of every erasure-wired artifact in a
    * warehouse — [[enforceAll]] walks it. One value of this class IS
    * the deployment's erasure coverage statement: a new artifact type
    * is not erasure-complete until it appears here (and in the
    * warehouse-sweep spec that greps every table for the victims).
    *
    *  - `termDocTable`/`statsTable` + `vectorStore`: the serve-time
    *    tombstone protocols of the narrow [[enforce]].
    *  - `rewriteDedup` (outTable, ledgerTable): the cleaned-corpus
    *    table holding `clean_text` + the ownership digest ledger.
    *  - `dedupStores`: LSH stores whose shingle tables hold raw text
    *    n-grams.
    *  - `indexStoreDirs` / `orderStoreDirs` / `probeStoreDirs`:
    *    build-once postings, frozen training orders and cross-modal
    *    probe sets, re-derived from their per-store erasure ledgers.
    *  - `splitAssignments` / `componentStores`: membership ledgers
    *    (and the shingles the assigner keeps).
    *  - `docTables`: any other (table, id-columns) holding per-doc
    *    rows — quality scores, importance weights, near-dup pair
    *    ledgers, quarantines.
    *  - `chunkLedgers` / `substringLedgers(Xx)` / `datasheets`:
    *    content-digest ledgers, forgotten via the victims' own text
    *    (pass `victimDocs` to [[enforceAll]] while the source rows
    *    still exist).
    */
  final case class Scope(
    termDocTable: Option[String] = None,
    statsTable: Option[String] = None,
    vectorStore: Option[String] = None,
    rewriteDedup: Option[(String, String)] = None,
    dedupStores: Seq[String] = Nil,
    indexStoreDirs: Seq[String] = Nil,
    orderStoreDirs: Seq[String] = Nil,
    probeStoreDirs: Seq[String] = Nil,
    splitAssignments: Seq[String] = Nil,
    componentStores: Seq[(String, String, String)] = Nil,
    fateLedgers: Seq[(String, String)] = Nil,         // (ledger, marker)
    fateSemStores: Seq[(String, String)] = Nil,       // (name, embeddingsDir)
    docTables: Seq[(String, Seq[String])] = Nil,
    chunkLedgers: Seq[(String, String)] = Nil,
    substringLedgers: Seq[String] = Nil,
    substringLedgersXx: Seq[String] = Nil,
    datasheets: Seq[String] = Nil) {
    def needsVictimText: Boolean =
      chunkLedgers.nonEmpty || substringLedgers.nonEmpty ||
        substringLedgersXx.nonEmpty || datasheets.nonEmpty
  }

  /** [[enforce]] across a whole [[Scope]] — every artifact's erasure
    * state re-derived from the ledger, idempotently.
    *
    * `victimDocs` is the victims' `(doc_id, text)` rows, REQUIRED
    * whenever the scope lists digest ledgers (their rows are
    * content-keyed with no doc attribution — only the text names what
    * to forget): run the first enforce while the source rows still
    * exist, and pass an EMPTY frame on replays after the source
    * deleted them (the completed first pass already purged the
    * digests). Rows for ids not in the ledger are ignored. */
  def enforceAll(spark: SparkSession, ledger: String, scope: Scope,
                 victimDocs: Option[DataFrame] = None): Unit = {
    enforce(spark, ledger, scope.termDocTable, scope.statsTable,
      scope.vectorStore)
    val victims = requested(spark, ledger)
    // bounded: the ledger is operational-request-sized by contract
    val ids = victims.collect().map(_.getLong(0)).toSeq
    scope.rewriteDedup.foreach { case (o, l) =>
      graft.streaming.RewriteDedup.eraseDocs(spark, victims, o, l) }
    scope.dedupStores.foreach(DedupStore.eraseDocs(spark, victims, _))
    scope.indexStoreDirs.foreach(IndexStore.eraseDocs(spark, _, ids))
    scope.probeStoreDirs.foreach(ProbeStore.eraseDocs(spark, _, ids))
    scope.orderStoreDirs.foreach { dir =>
      OrderStore.eraseDocs(graft.tables.load(spark, dir, "documents"),
        OrderStore.corpusStoreName(dir), ids) }
    scope.splitAssignments.foreach(
      graft.streaming.SplitAssignment.purgeDocs(spark, victims, _))
    scope.componentStores.foreach { case (n, r, m) =>
      graft.streaming.ComponentMaintenance.purgeDocs(spark, victims,
        n, r, m) }
    scope.fateLedgers.foreach { case (l, m) =>
      graft.streaming.FateMaintenance.purgeDocs(spark, victims, l, m) }
    scope.fateSemStores.foreach { case (n, d) =>
      graft.streaming.FateMaintenance.eraseSemStore(
        graft.tables.load(spark, d, "embeddings"), n, ids) }
    scope.docTables.foreach { case (t, cols) =>
      purgeRows(spark, victims, t, cols) }
    if (scope.needsVictimText) {
      val vd = victimDocs.getOrElse(sys.error(
        "this scope lists content-digest ledgers: pass victimDocs " +
          "(the victims' (doc_id, text) rows — empty on replays after " +
          "the source deleted them)"))
        .join(broadcast(victims), Seq("doc_id"), "left_semi")
        .select("doc_id", "text")
      scope.chunkLedgers.foreach { case (c, m) =>
        graft.streaming.ChunkDedup.purgeDigests(spark, vd, c, m) }
      scope.substringLedgers.foreach(
        graft.streaming.SubstringDedup.purgeDigests(spark, vd, _))
      scope.substringLedgersXx.foreach(
        graft.streaming.SubstringDedup.purgeDigests(spark, vd, _,
          graft.queries.Dedup.XxDigest))
      scope.datasheets.foreach(
        graft.streaming.DatasheetMaintenance.purgeDocs(spark, vd, _))
    }
  }

  /** [[record]] then [[enforceAll]] — the warehouse-wide one-call
    * surface. Crash anywhere: the ledger already carries the ids, so
    * replaying with any superset (and the same scope) completes the
    * propagation. */
  def eraseAll(spark: SparkSession, ids: Seq[Long], ledger: String,
               scope: Scope,
               victimDocs: Option[DataFrame] = None): Unit = {
    record(spark, ids, ledger)
    enforceAll(spark, ledger, scope, victimDocs)
  }

  /** Physically rewrite `table` WITHOUT rows whose `keyCols` match
    * `victimKeys` (a single-column frame, request-sized — it
    * broadcasts). A `batch_id`-partitioned table rewrites ONLY the
    * partitions that contain matches (dynamic partition overwrite —
    * O(victim batches), never O(table)); an unpartitioned table
    * rewrites whole through a staging hop. BUCKETED tables are each
    * artifact's own seam (the purge must preserve the bucket spec this
    * helper cannot see) — refused loudly.
    *
    * Idempotent: no matches → no write. Crash-safe: the staging copy
    * is complete before the live overwrite, a crashed live overwrite
    * is adopted back from staging on the next call, and a crashed
    * partition overwrite is replaced whole on replay (victims still
    * match). CONTRACT: single writer, maintainers stopped (the
    * compaction maintenance-window convention). */
  private[graft] def purgeRows(spark: SparkSession, victimKeys: DataFrame,
                               table: String, keyCols: Seq[String]): Unit = {
    val staging = table + "_erasure_staging"
    // adopt a crashed prior purge before anything reads the table
    if (!spark.catalog.tableExists(table) &&
        spark.catalog.tableExists(staging)) {
      spark.table(staging).write.mode("overwrite").saveAsTable(table)
      spark.sql(s"DROP TABLE IF EXISTS $staging")
    }
    if (!spark.catalog.tableExists(table)) return
    val v = broadcast(victimKeys.toDF("erased_key"))
    def minus(df: DataFrame): DataFrame =
      keyCols.foldLeft(df)((d, c) =>
        d.join(v, d(c) === v("erased_key"), "left_anti"))
    val t = spark.table(table)
    val catCols = spark.catalog.listColumns(table).collect()
    require(!catCols.exists(_.isBucket),
      s"purgeRows on $table: the table is bucketed — a generic rewrite " +
        "would silently drop the bucket spec; purge through the " +
        "artifact's own seam")
    val partCols = catCols.filter(_.isPartition).map(_.name).toSeq
    if (partCols == Seq("batch_id")) {
      val affected = keyCols.map(c =>
          t.join(v, t(c) === v("erased_key"), "left_semi")
            .select("batch_id"))
        .reduce(_.unionAll(_)).distinct()
        .collect().map(_.getLong(0)).toSeq // bounded: victim batches
      if (affected.isEmpty) return
      val cols = t.columns
      spark.sql(s"DROP TABLE IF EXISTS $staging")
      VectorStore.clearOrphanLocation(spark, staging)
      minus(t.filter(col("batch_id").isin(affected: _*)))
        .write.mode("overwrite").saveAsTable(staging)
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prior = spark.conf.getOption(key)
      spark.conf.set(key, "dynamic")
      try spark.table(staging).select(cols.map(col): _*)
        .write.mode("overwrite").insertInto(table)
      finally prior match {
        case Some(x) => spark.conf.set(key, x)
        case None    => spark.conf.unset(key)
      }
      // dynamic overwrite only touches partitions PRESENT in the kept
      // rows: a partition whose every row was a victim must be dropped.
      // IF EXISTS covers the benign already-gone case; any other
      // failure propagates — a swallowed drop would keep serving the
      // all-victim partition's rows, silently breaking erasure — and
      // the post-drop check proves they actually stopped serving
      val still = spark.table(staging).select("batch_id").distinct()
        .collect().map(_.getLong(0)).toSet
      val erasedWhole = affected.toSet -- still
      erasedWhole.foreach { b =>
        spark.sql(
          s"ALTER TABLE $table DROP IF EXISTS PARTITION (batch_id=$b)")
      }
      if (erasedWhole.nonEmpty)
        require(spark.table(table)
          .filter(col("batch_id").isin(erasedWhole.toSeq: _*)).isEmpty,
          s"purgeRows on $table: all-victim partition(s) " +
            s"${erasedWhole.mkString(", ")} still serve rows after DROP " +
            "PARTITION — refusing to report the erasure complete")
      spark.sql(s"DROP TABLE IF EXISTS $staging")
    } else {
      require(partCols.isEmpty,
        s"purgeRows on $table: unsupported partition layout " +
          partCols.mkString("[", ",", "]") +
          " — only batch_id-partitioned or unpartitioned tables; " +
          "bucketed/partitioned artifacts purge through their own seam")
      val hasVictims = keyCols.exists(c =>
        !t.join(v, t(c) === v("erased_key"), "left_semi").isEmpty)
      if (!hasVictims) return
      spark.sql(s"DROP TABLE IF EXISTS $staging")
      VectorStore.clearOrphanLocation(spark, staging)
      minus(t).write.mode("overwrite").saveAsTable(staging)
      spark.table(staging).write.mode("overwrite").saveAsTable(table)
      spark.sql(s"DROP TABLE IF EXISTS $staging")
    }
  }
}
