package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.storage.StorageLevel
import graft.queries.{Dedup, Pipeline, Similarity}

/** Streaming twin of the funnel-wide fate report (pl47,
  * `Pipeline`): the warehouse's most expensive batch surface (274.6 s
  * per 100× run, SURVEY §6) recomputes the whole curation funnel —
  * URL dedup, eval slice, fuzzy + semantic decontamination,
  * temperature sampling — every time an auditor asks "why is doc X
  * not in the training set". This maintainer assigns each ARRIVING
  * document its fate once, at ingestion, against frozen release
  * artifacts, and appends one row per doc to a batch_id-partitioned
  * ledger — the audit query becomes a committed-ledger read.
  *
  * Fate semantics are pl47's, rung for rung, via the SAME shared
  * constructions (`Dedup.canonicalUrl`/`messyUrl`, the
  * `DedupStore.bipartitePairsFromStore` band serve,
  * `Similarity.semanticPairsAgainst`, `Pipeline.coinOf`), so streamed
  * fates cannot drift from the batch report. `FateMaintenanceSpec`
  * pins streamed == batch pl47 bit for bit.
  *
  * What is FROZEN per release epoch (the three artifacts a batch is
  * judged against):
  *   - the EVAL BAND store (`graft.index.DedupStore.build` over the
  *     eval docs) — the fuzzy rung's candidate/verify side;
  *   - the SEMANTIC store ([[buildSemanticStore]]): centroid set +
  *     eval cell assignments — the semantic rung's sides;
  *   - the TEMPERATURE RATES table `(epoch_id, lang, keep_prob)` —
  *     the sampling rung's probabilities. Rates legitimately DRIFT as
  *     the corpus mix shifts, which is why the epoch is explicit in
  *     the ledger schema: each fate row records the epoch it was
  *     stamped under, and [[compact]] re-stamps the sampling rung
  *     under rates recomputed from the ledger's own survivors —
  *     after which the ledger equals what batch pl47 would report
  *     over the corpus so far, from ANY initial epoch (the survivor
  *     SET is rate-independent; rates only split it into
  *     kept/rebalanced_out, and the coin is deterministic).
  *
  * Arrival-order contract: doc_ids must arrive ASCENDING across
  * batches (the crawl-ingest order; a superset of the
  * IndexMaintenance unique-ids contract). URL-keeper status is
  * min(doc_id) per canonical URL, so under ascending arrival the
  * first-seen doc of a URL IS the global min and a later arrival can
  * never retroactively steal keeper status — which is what makes
  * one-pass fate assignment correct. A doc with no embedding cannot
  * be semantically flagged (pl25's own universe); a lang missing from
  * the frozen epoch keeps the doc (keep_prob 1) until compaction
  * re-stamps it under measured rates.
  *
  * Scale shape per micro-batch: the batch is window-deduped on its
  * own canonical URLs (batch-sized); the committed ledger is scanned
  * ONCE, map-side, against the broadcast batch URL set (never
  * shuffled); the fuzzy rung is the broadcast band-artifact serve;
  * the semantic rung is a map-side nearest-cell projection plus a
  * broadcast eval join; the rates join is broadcast. Nothing ever
  * re-reads past batches' text.
  *
  * Delivery: the SubstringDedup crash protocol — the ledger is
  * batch_id-partitioned, each batch writes its own partition with
  * dynamic partition overwrite (fates are deterministic given the
  * committed prior state, so a crash-window replay REWRITES the
  * partition completely — no adoption judgment), marker row last,
  * committed-only serve. `checkpointDir` must be durable so batch ids
  * stay stable across restarts.
  */
object FateMaintenance {

  /** Build the frozen SEMANTIC sides (centroids + eval cell
    * assignments) as tables `<name>_cent` / `<name>_eval`, from the
    * release's embeddings frame — `Similarity.semanticEvalSides`, the
    * same construction batch pl47 derives per run. */
  def buildSemanticStore(embeddings: DataFrame, name: String): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (cent, ea) = Similarity.semanticEvalSides(embeddings)
    cent.toDF("cid", "ce").write.mode("overwrite")
      .saveAsTable(s"${name}_cent")
    ea.write.mode("overwrite").saveAsTable(s"${name}_eval")
  }

  /** The semantic store's per-store erasure suppression ledger. */
  def semErasedTable(name: String): String = s"${name}_erased"

  /** Right-to-erasure for the SEMANTIC store: `_cent`/`_eval` persist
    * eval vectors' FULL embeddings (and a victim may seed a centroid),
    * so row-dropping cannot erase without tearing the geometry — the
    * seam is REBUILD from the source minus the suppression set (the
    * OrderStore/centroid-victim convention: the geometry legitimately
    * re-freezes). Victim ids land in a persistent `_erased` ledger
    * first (append-dedup), so a replay after the source deleted the
    * victims — or a later rebuild from a still-victim-bearing source —
    * can never resurrect them. Fate ledgers STAMPED under the old
    * store stay valid (fates are materialized, the store is build
    * provenance); new batches judge against the re-frozen geometry. */
  def eraseSemStore(embeddings: DataFrame, name: String,
                    ids: Seq[Long]): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    if (ids.isEmpty) return
    val led = semErasedTable(name)
    graft.index.VectorStore.clearOrphanLocation(spark, led)
    val victims = ids.distinct.toDF("vec_id")
    val fresh =
      if (spark.catalog.tableExists(led))
        victims.join(spark.table(led), Seq("vec_id"), "left_anti")
      else victims
    if (!fresh.isEmpty)
      fresh.write.mode("append").saveAsTable(led)
    buildSemanticStore(
      embeddings.join(broadcast(spark.table(led)), Seq("vec_id"),
        "left_anti"), name)
  }

  /** Stamp a rates epoch from any frame with a `lang` column (one row
    * per surviving doc): appends `(epoch_id, lang, keep_prob)` rows
    * computed by `Pipeline.temperatureRates` — the T=2 flattening
    * rule pl15/pl16/pl47 share. */
  def stampRates(survivors: DataFrame, ratesTable: String,
                 epochId: Long): Unit =
    Pipeline.temperatureRates(survivors)
      .select(lit(epochId).as("epoch_id"), col("lang"), col("keep_prob"))
      .write.mode("append").saveAsTable(ratesTable)

  /** Starts the fate-maintenance query over streaming `newDocs`
    * (`doc_id`, `lang`, `text`, `embedding` — embedding nullable;
    * join the embeddings table upstream or pass null). */
  def maintain(newDocs: DataFrame, ledger: String, markerTable: String,
               checkpointDir: String, evalBandStore: String,
               semStore: String, ratesTable: String,
               erasureLedger: Option[String] = None): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .queryName(Maintenance.queryNameFor(ledger))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(graft.index.Erasure.gateBatch(batch, erasureLedger),
          batchId, ledger, markerTable, evalBandStore, semStore,
          ratesTable)
      }
      .start()

  /** One micro-batch: run the arriving docs down pl47's rungs against
    * the frozen artifacts and the committed prior ledger, write the
    * fate rows into the ledger's `batch_id=N` partition (dynamic
    * partition overwrite — see the delivery contract above), then the
    * `(batch_id, n_docs)` commit marker. */
  def appendBatch(batch: DataFrame, batchId: Long, ledger: String,
                  markerTable: String, evalBandStore: String,
                  semStore: String, ratesTable: String): Unit = {
    val spark = batch.sparkSession
    recoverStaging(spark, ledger)
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (committed) return
    val b = batch
      .select(col("doc_id"), col("lang"), col("text"), col("embedding"))
      .withColumn("cu", Dedup.canonicalUrl(Dedup.messyUrl(col("doc_id"))))
      .withColumn("bkeeper", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("cu")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // URL rung: a batch doc is url_dup iff its canonical URL already
      // has a COMMITTED keeper (scan the narrow ledger once against
      // the broadcast batch-URL set — keeper cu re-derives from the
      // keeper's own doc_id, so no separate URL side-table) or a
      // smaller doc_id in this batch. Ascending arrival makes the
      // chosen twin the global min — exactly batch pl47's window.
      val priorKeepers: DataFrame =
        if (spark.catalog.tableExists(ledger) &&
            spark.catalog.tableExists(markerTable))
          spark.table(ledger)
            .join(spark.table(markerTable).select("batch_id"), "batch_id")
            .filter(col("fate") =!= "url_dup")
            .select(col("doc_id").as("pkeeper"))
            .withColumn("cu",
              Dedup.canonicalUrl(Dedup.messyUrl(col("pkeeper"))))
            .join(broadcast(b.select("cu").distinct()), Seq("cu"))
            .select(col("cu"), col("pkeeper"))
        else spark.range(0)
          .select(lit("").as("cu"), lit(0L).as("pkeeper")).limit(0)
      val bb = b.join(broadcast(priorKeepers), Seq("cu"), "left")
      val urlDup = bb
        .filter(col("pkeeper").isNotNull || col("doc_id") =!= col("bkeeper"))
        .select(col("doc_id"), col("lang"), lit("url_dup").as("fate"),
          coalesce(col("pkeeper"), col("bkeeper")).as("twin_id"))
      val keepers = bb
        .filter(col("pkeeper").isNull && col("doc_id") === col("bkeeper"))
      val evalSlice = keepers.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("lang"), lit("eval_slice").as("fate"),
          lit(null).cast("long").as("twin_id"))
      val s1t = keepers.filter(col("doc_id") % 5 =!= 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
      // fuzzy rung: the broadcast band-artifact serve (eager mode —
      // one call per micro-batch must not accumulate cached blocks)
      val fz = graft.index.DedupStore.bipartitePairsFromStore(
          s1t.select(col("doc_id"), col("text")), evalBandStore, 0.4,
          eager = true)
        .groupBy("doc_id").agg(min(col("probe_doc_id")).as("ftwin"))
      val fuzzyDropped = s1t.join(fz, "doc_id")
        .select(col("doc_id"), col("lang"),
          lit("fuzzy_eval_neardup").as("fate"), col("ftwin").as("twin_id"))
      val s2 = s1t.join(fz, Seq("doc_id"), "left_anti")
      // semantic rung: nearest-cell projection against the frozen
      // centroids, broadcast eval-assignment join — pl25's universe
      // (docs with no embedding cannot be semantically flagged)
      val cent = Similarity.collectCentroids(
        spark.table(s"${semStore}_cent"))
      val cvecs = s2.filter(col("embedding").isNotNull)
        .select(col("doc_id").as("vec_id"), col("embedding"),
          graft.functions.VectorFunctions.l2Norm(col("embedding"))
            .as("nrm"))
      val sem = Similarity.semanticPairsAgainst(cvecs, cent,
          spark.table(s"${semStore}_eval"))
        .groupBy(col("vec_id").as("doc_id"))
        .agg(min(col("eval_vec_id")).as("stwin"))
      val semDropped = s2.join(sem, "doc_id")
        .select(col("doc_id"), col("lang"),
          lit("semantic_eval_neardup").as("fate"),
          col("stwin").as("twin_id"))
      val s3 = s2.join(sem, Seq("doc_id"), "left_anti")
      // sampling rung under the FROZEN epoch: latest stamped rates,
      // broadcast; an unknown lang keeps (compact re-stamps it)
      val ep = latestEpoch(spark, ratesTable)
      val r = spark.table(ratesTable)
        .filter(col("epoch_id") === ep).select("lang", "keep_prob")
      val sampled = s3.join(broadcast(r), Seq("lang"), "left")
        .select(col("doc_id"), col("lang"),
          when(Pipeline.coinOf(col("doc_id")) <
                 coalesce(col("keep_prob"), lit(1.0)) * 4294967296.0,
               "kept").otherwise("rebalanced_out").as("fate"),
          lit(null).cast("long").as("twin_id"))
      val rows = urlDup.unionByName(evalSlice).unionByName(fuzzyDropped)
        .unionByName(semDropped).unionByName(sampled)
        .select(col("doc_id"), col("lang"), col("fate"), col("twin_id"),
          lit(ep).as("epoch_id"), lit(batchId).as("batch_id"))
      if (!spark.catalog.tableExists(ledger))
        rows.write.partitionBy("batch_id").saveAsTable(ledger)
      else {
        assertLedgerLayout(spark, ledger)
        val key = "spark.sql.sources.partitionOverwriteMode"
        val prior = spark.conf.getOption(key)
        spark.conf.set(key, "dynamic")
        try rows.write.mode("overwrite").insertInto(ledger)
        finally prior match {
          case Some(v) => spark.conf.set(key, v)
          case None    => spark.conf.unset(key)
        }
      }
      batch.groupBy().agg(count(lit(1)).as("n_docs"))
        .withColumn("batch_id", lit(batchId))
        .select("batch_id", "n_docs")
        .write.mode("append").saveAsTable(markerTable)
      s1t.unpersist()
    } finally b.unpersist()
  }

  /** Latest stamped rates epoch — the one appendBatch freezes against.
    * A missing/empty rates table is a contract violation (the epoch
    * must exist before the maintainer starts): fail loudly rather
    * than stamp fates under an invented epoch id. */
  private def latestEpoch(spark: SparkSession, ratesTable: String): Long = {
    require(spark.catalog.tableExists(ratesTable),
      s"fate maintainer needs a stamped rates epoch in $ratesTable " +
        "before the first batch — call stampRates (or compact) first")
    val m = spark.table(ratesTable).agg(max("epoch_id")).head()
    require(!m.isNullAt(0),
      s"rates table $ratesTable exists but is empty — stamp an epoch first")
    m.getLong(0)
  }

  /** Committed fates — the audit serve path: `(doc_id, lang, fate,
    * twin_id, epoch_id)`, one row per committed doc. Orphan
    * partitions (crash debt awaiting replay) never serve. */
  def fates(spark: SparkSession, ledger: String,
            markerTable: String): DataFrame = {
    Freshness.refresh(spark, ledger, markerTable)
    recoverStaging(spark, ledger)
    if (!spark.catalog.tableExists(ledger) ||
        !spark.catalog.tableExists(markerTable))
      spark.range(0).select(lit(0L).as("doc_id"), lit("").as("lang"),
        lit("").as("fate"), lit(0L).as("twin_id"),
        lit(0L).as("epoch_id")).limit(0)
    else spark.table(ledger)
      .join(spark.table(markerTable).select("batch_id"), "batch_id")
      .select("doc_id", "lang", "fate", "twin_id", "epoch_id")
  }

  /** Compaction + rates RE-STAMP (the maintenance-window op): fold
    * every committed partition under one tag (the max committed
    * batch_id, so a replayed old batch stays marker-skipped), and
    * re-evaluate the sampling rung under rates recomputed from the
    * ledger's own survivors — `Pipeline.temperatureRates` over the
    * kept/rebalanced_out rows, exactly the rates batch pl47 would
    * compute over the corpus so far (the survivor SET is
    * rate-independent). After compact the ledger equals batch pl47
    * over the streamed corpus, whatever epoch the batches were
    * stamped under; non-sampling fates are untouched by construction.
    * The new epoch is appended to the rates table FIRST (a crash
    * before the swap leaves the old ledger intact and the fresher
    * epoch visible to the next appendBatch — benign debris), then the
    * rewrite is stage-then-swap with orphan partitions carried
    * VERBATIM (their eventual replay overwrites them wholesale).
    *
    * Concurrency contract: maintenance window, maintainer stopped
    * (`Maintenance.compactAll` checks it). */
  def compact(spark: SparkSession, ledger: String, markerTable: String,
              ratesTable: String): Unit = {
    import spark.implicits._
    recoverStaging(spark, ledger)
    if (!spark.catalog.tableExists(ledger) ||
        !spark.catalog.tableExists(markerTable)) return
    val committed = spark.table(markerTable)
      .select("batch_id").as[Long].collect().toSet
    if (committed.isEmpty) return
    val led = spark.table(ledger)
    val isCommitted = col("batch_id").isin(committed.toSeq: _*)
    val com = led.filter(isCommitted)
    val newRates = Pipeline.temperatureRates(
      com.filter(col("fate").isin("kept", "rebalanced_out")))
    val newEpoch = latestEpoch(spark, ratesTable) + 1
    newRates
      .select(lit(newEpoch).as("epoch_id"), col("lang"), col("keep_prob"))
      .write.mode("append").saveAsTable(ratesTable)
    val r = spark.table(ratesTable)
      .filter(col("epoch_id") === newEpoch).select("lang", "keep_prob")
    val tag = committed.max
    val restamped = com.join(broadcast(r), Seq("lang"), "left")
      .select(col("doc_id"), col("lang"),
        when(col("fate").isin("kept", "rebalanced_out"),
          when(Pipeline.coinOf(col("doc_id")) <
                 coalesce(col("keep_prob"), lit(1.0)) * 4294967296.0,
               "kept").otherwise("rebalanced_out"))
          .otherwise(col("fate")).as("fate"),
        col("twin_id"), lit(newEpoch).as("epoch_id"),
        lit(tag).as("batch_id"))
    val out = restamped.unionByName(
      led.filter(!isCommitted)
        .select("doc_id", "lang", "fate", "twin_id", "epoch_id",
          "batch_id"))
    val staging = ledger + "_staging"
    out.write.mode("overwrite").partitionBy("batch_id").saveAsTable(staging)
    swapFromStaging(spark, ledger)
  }

  /** Install the staged ledger as live and drop the staging copy — by
    * COPY, not `ALTER TABLE RENAME` (the SubstringDedup lesson: the
    * in-memory catalog's rename keeps each PARTITION's location at
    * the old path, silently emptying a partitioned table). Crash-safe:
    * mid-copy leaves no live table and an intact staged one, which
    * [[recoverStaging]] re-swaps at every entry point. */
  private def swapFromStaging(spark: SparkSession, ledger: String): Unit = {
    val staging = ledger + "_staging"
    spark.table(staging)
      .write.mode("overwrite").partitionBy("batch_id").saveAsTable(ledger)
    spark.sql(s"DROP TABLE IF EXISTS $staging")
  }

  /** Right-to-erasure seam (the family contract every ledger has):
    * remove `victims`' rows AND scrub victim ids out of `twin_id`
    * references — the warehouse convention is ID erasure, an erased
    * doc's id must survive in NO column of any artifact (the
    * ErasureSweepSpec contract), so a surviving doc's `url_dup of
    * <victim>` row keeps its fate label but forgets the twin id
    * (twin_id → NULL). Mechanics mirror `Erasure.purgeRows`'
    * batch_id-partitioned path: affected partitions rewritten through
    * a staged copy + dynamic partition overwrite, all-victim
    * partitions DROPPED with a post-drop serve check, crashed prior
    * purges adopted at entry. Refuses loudly on an uncommitted orphan
    * partition — its replay recomputes from the batch source and
    * would re-introduce the victim (run in a maintenance window after
    * the maintainer committed, the ProbeMaintenance rule). Idempotent:
    * no matches → no write. */
  def purgeDocs(spark: SparkSession, victims: DataFrame,
                ledger: String, markerTable: String): Unit = {
    // the purge never drops the ledger (partitions overwrite in
    // place), so a leftover erasure staging is always debris — the
    // pre-write DROP below clears it; compact's own staging heals via
    // recoverStaging as everywhere else
    val staging = ledger + "_erasure_staging"
    recoverStaging(spark, ledger)
    if (!spark.catalog.tableExists(ledger) ||
        !spark.catalog.tableExists(markerTable)) return
    val markers = spark.table(markerTable).select("batch_id")
    val t = spark.table(ledger)
    require(t.join(broadcast(markers), Seq("batch_id"), "left_anti")
      .isEmpty,
      s"purgeDocs on $ledger: uncommitted orphan partition present — " +
        "its replay recomputes fates from the batch source and would " +
        "re-introduce the victim; run in a maintenance window after " +
        "the maintainer committed")
    val v = broadcast(victims.toDF("erased_key"))
    val affected = t.join(v,
        t("doc_id") === v("erased_key") || t("twin_id") === v("erased_key"),
        "left_semi")
      .select("batch_id").distinct()
      .collect().map(_.getLong(0)).toSeq // bounded: victim batches
    if (affected.isEmpty) return
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    graft.index.VectorStore.clearOrphanLocation(spark, staging)
    t.filter(col("batch_id").isin(affected: _*))
      .join(v, t("doc_id") === v("erased_key"), "left_anti")
      .join(v, col("twin_id") === col("erased_key"), "left")
      .select(col("doc_id"), col("lang"), col("fate"),
        when(col("erased_key").isNotNull, lit(null).cast("long"))
          .otherwise(col("twin_id")).as("twin_id"),
        col("epoch_id"), col("batch_id"))
      .write.mode("overwrite").saveAsTable(staging)
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try spark.table(staging)
      .select("doc_id", "lang", "fate", "twin_id", "epoch_id", "batch_id")
      .write.mode("overwrite").insertInto(ledger)
    finally prior match {
      case Some(x) => spark.conf.set(key, x)
      case None    => spark.conf.unset(key)
    }
    // dynamic overwrite only touches partitions PRESENT in the kept
    // rows: an all-victim partition must be dropped, and proven gone
    val still = spark.table(staging).select("batch_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val erasedWhole = affected.toSet -- still
    erasedWhole.foreach { b =>
      spark.sql(s"ALTER TABLE $ledger DROP IF EXISTS PARTITION (batch_id=$b)")
    }
    if (erasedWhole.nonEmpty)
      require(spark.table(ledger)
        .filter(col("batch_id").isin(erasedWhole.toSeq: _*)).isEmpty,
        s"purgeDocs on $ledger: all-victim partition(s) " +
          s"${erasedWhole.mkString(", ")} still serve rows after DROP " +
          "PARTITION — refusing to report the erasure complete")
    spark.sql(s"DROP TABLE IF EXISTS $staging")
  }

  /** Crash recovery for [[compact]]'s stage-then-swap: a crash during
    * the swap leaves no ledger but a complete staged one — re-run the
    * swap. A crashed STAGING write is harmless: the live ledger still
    * exists, this no-ops, and the next compact overwrites staging. */
  private def recoverStaging(spark: SparkSession, ledger: String): Unit = {
    val staging = ledger + "_staging"
    if (!spark.catalog.tableExists(ledger) &&
        spark.catalog.tableExists(staging))
      swapFromStaging(spark, ledger)
  }

  /** Write-path layout guard (the SubstringDedup lesson): positional
    * insertInto against anything but the expected batch_id-partitioned
    * layout silently corrupts — refuse with a migration message. */
  private def assertLedgerLayout(spark: SparkSession, ledger: String): Unit = {
    val partCols = spark.catalog.listColumns(ledger).collect()
      .filter(_.isPartition).map(_.name).toSeq
    require(partCols == Seq("batch_id"),
      s"fate ledger $ledger has partition columns " +
        s"${partCols.mkString("[", ",", "]")}, expected [batch_id] — " +
        "a foreign or legacy table positional insertInto would corrupt; " +
        "migrate it or start a fresh ledger.")
  }
}
