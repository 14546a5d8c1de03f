package graft.streaming

import org.apache.spark.sql.SparkSession

/** Warehouse-wide maintenance-window orchestration (round-16 verdict
  * missing #3): every ledger family documents the same compaction
  * protocol — "run `compact()` in a maintenance window with the
  * maintainer stopped" — but at 25 maintainers the per-artifact
  * convention is an ops burden and a forgotten-compaction risk.
  * [[compactAll]] makes the protocol EXECUTABLE: it walks a
  * declaratively-described warehouse (the `Erasure.Scope` shape), and
  * REFUSES up front, naming the ledger, while any of the listed
  * families' maintainer streams is still active — the convention's
  * "maintainer stopped" precondition becomes a checked invariant
  * instead of trust.
  *
  * Stream↔ledger association: each maintainer names its streaming
  * query [[queryNameFor]] of its primary table when it starts (the
  * same first argument its family's `compact` takes), so the
  * orchestrator can tell WHICH ledger an active foreachBatch stream
  * writes — Spark's `StreamingQueryManager` alone cannot. Spark also
  * enforces active-name uniqueness, which doubles as a free
  * one-maintainer-per-ledger guard.
  *
  * Each family's `compact` keeps its own heal-at-entry semantics
  * (staging recovery, orphan carry, serving invariance) — the
  * orchestrator adds only the walk and the refusal, never new
  * compaction logic.
  */
object Maintenance {

  /** Canonical streaming-query name for the maintainer writing
    * `primaryTable` — set by every `maintain()` at start. */
  def queryNameFor(primaryTable: String): String =
    s"graft-maintainer:$primaryTable"

  /** The maintainer stream currently writing `primaryTable`, if any. */
  def activeFor(spark: SparkSession, primaryTable: String)
      : Option[org.apache.spark.sql.streaming.StreamingQuery] =
    spark.streams.active.find(q =>
      Option(q.name).contains(queryNameFor(primaryTable)))

  /** Declarative description of the compactable ledgers in a
    * warehouse, one field per maintainer family; each entry carries
    * exactly the arguments its family's `compact` takes. The FIRST
    * element of every entry is the family's primary table — the
    * active-stream refusal checks it against [[queryNameFor]]. */
  final case class Warehouse(
    components: Seq[(String, String, String)] = Nil,  // (nodes, remap, marker)
    datasheets: Seq[String] = Nil,                    // name
    fateLedgers: Seq[(String, String, String)] = Nil, // (ledger, marker, rates)
    importance: Seq[String] = Nil,                    // weightsTable
    indexes: Seq[(String, Option[String], Option[String])] = Nil,
                                        // (termDoc, stats, tombstones)
    probes: Seq[(String, String)] = Nil,              // (ledger, marker)
    quality: Seq[String] = Nil,                       // scoresTable
    rewrites: Seq[(String, String)] = Nil,            // (ledger, marker)
    sketches: Seq[(String, String)] = Nil,            // (sketch, marker)
    snapshots: Seq[(String, String)] = Nil,           // (ledger, marker)
    splits: Seq[String] = Nil,                        // name
    substrings: Seq[(String, String)] = Nil,          // (window, marker)
    tokenizers: Seq[(String, String)] = Nil,          // (wc, marker)
    trends: Seq[(String, String, Int)] = Nil,         // (sketch, marker, k)
    vectorStores: Seq[String] = Nil) {                // storeName

    /** Every family's primary table, in walk order. */
    def primaries: Seq[String] =
      components.map(_._1) ++ datasheets ++ fateLedgers.map(_._1) ++
        importance ++
        indexes.map(_._1) ++ probes.map(_._1) ++ quality ++
        rewrites.map(_._1) ++ sketches.map(_._1) ++
        snapshots.map(_._1) ++ splits ++ substrings.map(_._1) ++
        tokenizers.map(_._1) ++ trends.map(_._1) ++ vectorStores
  }

  /** Compact every ledger in `wh` under the maintenance-window
    * protocol. Refuses BEFORE touching anything if any listed
    * family's maintainer stream is active — naming every offender, so
    * one `compactAll` failure message is the complete stop-list. A
    * ledger family whose tables don't exist yet is each `compact`'s
    * own no-op (heal-at-entry). Returns the primary tables walked, in
    * order — the audit surface. */
  def compactAll(spark: SparkSession, wh: Warehouse): Seq[String] = {
    val live = wh.primaries.filter(activeFor(spark, _).isDefined)
    require(live.isEmpty,
      "compactAll refused: maintainer stream(s) still active for " +
        s"${live.mkString(", ")} — stop them first (the documented " +
        "maintenance-window contract); compacting under a live " +
        "maintainer races the stage-then-swap against in-flight appends")
    wh.components.foreach { case (n, r, m) =>
      ComponentMaintenance.compact(spark, n, r, m) }
    wh.datasheets.foreach(DatasheetMaintenance.compact(spark, _))
    wh.fateLedgers.foreach { case (l, m, r) =>
      FateMaintenance.compact(spark, l, m, r) }
    wh.importance.foreach(ImportanceMaintenance.compact(spark, _))
    wh.indexes.foreach { case (t, s, tb) =>
      IndexMaintenance.compact(spark, t, s, tb) }
    wh.probes.foreach { case (l, m) =>
      ProbeMaintenance.compact(spark, l, m) }
    wh.quality.foreach(QualityMaintenance.compact(spark, _))
    wh.rewrites.foreach { case (l, m) =>
      RewriteDedup.compact(spark, l, m) }
    wh.sketches.foreach { case (s, m) =>
      SketchMaintenance.compact(spark, s, m) }
    wh.snapshots.foreach { case (l, m) =>
      SnapshotMaintenance.compact(spark, l, m) }
    wh.splits.foreach(SplitAssignment.compact(spark, _))
    wh.substrings.foreach { case (w, m) =>
      SubstringDedup.compact(spark, w, m) }
    wh.tokenizers.foreach { case (w, m) =>
      TokenizerMaintenance.compact(spark, w, m) }
    wh.trends.foreach { case (s, m, k) =>
      TrendMaintenance.compact(spark, s, m, k) }
    // VectorMaintenance.compact resolves the serving prefix and reads
    // the codes table — unlike the ledger families it has no
    // heal-at-entry no-op for a store that was never built, so the
    // not-yet-built case is skipped here (the other compacts' own
    // table-exists early returns cover theirs)
    wh.vectorStores.foreach { n =>
      val p = graft.index.VectorStore.servingPrefix(spark, n)
      if (spark.catalog.tableExists(s"${p}_codes"))
        VectorMaintenance.compact(spark, n)
    }
    wh.primaries
  }

  /** One ledger's health row — the ops surface [[status]] fills. */
  final case class LedgerStatus(
    family: String,
    primary: String,
    exists: Boolean,
    rows: Long,             // ledger rows on disk (−1 for artifact kinds)
    committedBatches: Long, // marker rows (−1 when no marker surface)
    orphanBatches: Long,    // ledger batch_ids with NO marker (crash debt)
    compactionDebt: Long,   // rows beyond one-per-group the fold would keep
                            // (−1 when the family's fold target is unknown)
    stagingPending: Boolean,// a crashed stage-then-swap awaits heal
    streamActive: Boolean)  // the maintainer is running RIGHT NOW

  /** Warehouse-wide maintenance HEALTH report ([[compactAll]]'s
    * read-only twin — what an operator checks before deciding to take
    * the maintenance window at all): per listed ledger, row/batch
    * counts, orphan row-sets awaiting adoption, crashed-swap staging
    * debris, and whether its maintainer stream is live. Marker-backed
    * ledger families get full rows; artifact families (datasheet /
    * split / vector store and the single-table score ledgers) report
    * existence + staging + stream only — their compaction debt is not
    * a batch-ledger shape. Read-only: never mutates, never refuses. */
  def status(spark: SparkSession, wh: Warehouse): Seq[LedgerStatus] = {
    def ex(t: String) = spark.catalog.tableExists(t)
    def rows(t: String) = if (ex(t)) spark.table(t).count() else 0L
    def ledgerRow(family: String, ledger: String, marker: String,
                  groupCols: Seq[String],
                  staging: String): LedgerStatus = {
      val exists = ex(ledger)
      val ledgerRows = if (exists) rows(ledger) else 0L
      // a ledger WITHOUT its marker table is the deepest crash state
      // (appendBatch writes rows BEFORE the first-ever marker): every
      // batch in it is orphan adoption debt — reporting 0 there would
      // mask exactly what this surface exists to expose
      val orphans =
        if (!exists) 0L
        else if (!ex(marker))
          spark.table(ledger).select("batch_id").distinct().count()
        else spark.table(ledger).select("batch_id").distinct()
          .join(org.apache.spark.sql.functions.broadcast(
            spark.table(marker).select("batch_id")),
            Seq("batch_id"), "left_anti").count()
      val debt =
        if (!exists || groupCols.isEmpty) -1L
        else ledgerRows -
          spark.table(ledger).select(groupCols.map(
            org.apache.spark.sql.functions.col): _*).distinct().count()
      LedgerStatus(family, ledger, exists, ledgerRows,
        if (ex(marker)) rows(marker) else 0L, orphans, debt,
        ex(staging), activeFor(spark, ledger).isDefined)
    }
    def artifactRow(family: String, primary: String,
                    probe: String, staging: String): LedgerStatus =
      LedgerStatus(family, primary, ex(probe), -1L, -1L, 0L, -1L,
        ex(staging), activeFor(spark, primary).isDefined)
    wh.components.map { case (n, _, m) =>
      // components fold into a SEPARATE compact table, so the
      // one-per-group debt shape doesn't apply — debt unknown
      ledgerRow("components", n, m, Nil, n + "c_staging") } ++
    wh.datasheets.map(n => artifactRow("datasheet", n,
      s"${n}_digests", s"${n}_digestsc_staging")) ++
    wh.fateLedgers.map { case (l, m, _) =>
      ledgerRow("fates", l, m, Seq("doc_id"), l + "_staging") } ++
    wh.importance.map(n => artifactRow("importance", n, n,
      n + "_staging")) ++
    wh.indexes.map { case (t, _, _) =>
      artifactRow("index", t, t, t + "_staging") } ++
    wh.probes.map { case (l, m) =>
      ledgerRow("probes", l, m, Seq("blob_digest"), l + "_staging") } ++
    wh.quality.map(n => artifactRow("quality", n, n, n + "_staging")) ++
    wh.rewrites.map { case (l, m) =>
      ledgerRow("rewrites", l, m, Seq("ch"), l + "c_staging") } ++
    wh.sketches.map { case (s, m) =>
      ledgerRow("sketches", s, m, Seq("event_type", "day"),
        s + "_staging") } ++
    wh.snapshots.map { case (l, m) =>
      ledgerRow("snapshots", l, m, Seq("user_id"), l + "c_staging") } ++
    wh.splits.map(n => artifactRow("splits", n, s"${n}_bands",
      s"${n}_bandsc_staging")) ++
    wh.substrings.map { case (w, m) =>
      ledgerRow("substrings", w, m, Seq("ch"), w + "_staging") } ++
    wh.tokenizers.map { case (w, m) =>
      ledgerRow("tokenizers", w, m, Seq("word"), w + "_staging") } ++
    wh.trends.map { case (s, m, _) =>
      ledgerRow("trends", s, m, Seq("item"), s + "_staging") } ++
    wh.vectorStores.map { n =>
      val p = graft.index.VectorStore.servingPrefix(spark, n)
      artifactRow("vectorStore", n, s"${p}_codes",
        s"${p}_codes_staging") }
  }
}
