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
  *     counts — the state per-batch dup DELTAS are computed against.
  *   - `<name>_dups`: per (batch, source, lang) dup-count DELTA.
  *     Exact-dup incidence is NOT batch-additive the naive way — a
  *     doc's duplicate may arrive five batches later — but its
  *     DERIVATIVE is computable at arrival: a batch bringing m copies
  *     of a digest with k prior occurrences newly classifies its m
  *     docs as dups when k + m > 1 and k ≥ 1 ∨ m > 1, and FLIPS the
  *     one prior holder to dup exactly when k == 1 (attributed to that
  *     holder's own (source, lang), read from the digest ledger).
  *     Summing committed deltas reproduces pl34's `copies > 1` count
  *     without any corpus-cardinality work at serve time.
  *
  * Batch-equality contract (spec-pinned): the served datasheet equals
  * batch pl34 over the union corpus — including duplicates that
  * STRADDLE batches (the k==1 flip), the case a per-batch-only dup
  * count silently undercounts.
  *
  * Scale shape: per-batch work is one scan of the batch plus a
  * digest-keyed probe of the ledger for the batch's own digests;
  * serving reads two (batches × groups)-sized ledgers only — nothing
  * corpus-sized, and nothing ever re-reads prior batches' text.
  * [[compact]] folds committed digest partitions into a dig-bucketed
  * pre-aggregated side table (per-table high-water inside the table,
  * the SplitAssignment device), so the per-batch probe joins a
  * bucketed build side instead of scanning all partitions.
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
               checkpointDir: String,
               erasureLedger: Option[String] = None): StreamingQuery = {
    require(checkpointDir.nonEmpty,
      "DatasheetMaintenance.maintain requires a durable checkpointDir: " +
        "replay-skip markers are only valid against stable batch ids")
    newDocs.writeStream
      .outputMode("append")
      .queryName(Maintenance.queryNameFor(name))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        datasheetBatch(graft.index.Erasure.gateBatch(batch, erasureLedger),
          batchId, name)
      }
      .start()
  }

  private def statsTable(name: String) = s"${name}_stats"
  private def digestsTable(name: String) = s"${name}_digests"
  private def dupsTable(name: String) = s"${name}_dups"
  private def markerTable(name: String) = s"${name}_marker"
  private def digestsCompact(name: String) = s"${name}_digestsc"

  private def recoverStaging(spark: SparkSession, table: String): Unit = {
    val staging = table + "_staging"
    if (!spark.catalog.tableExists(table) &&
        spark.catalog.tableExists(staging))
      spark.sql(s"ALTER TABLE $staging RENAME TO $table")
  }

  /** The digest ledger's full prior state for batch `batchId`: the
    * pre-aggregated compact table plus live partitions above its
    * high-water mark, minus the batch's own partition (a crash-window
    * replay must not count its own earlier partial write). */
  private def priorDigests(spark: SparkSession, name: String,
                           batchId: Long): Option[DataFrame] = {
    val cT = digestsCompact(name)
    recoverStaging(spark, cT)
    val c = if (spark.catalog.tableExists(cT)) Some(spark.table(cT)) else None
    val hw = c.map(_.agg(max("batch_id")).head)
      .collect { case r if !r.isNullAt(0) => r.getLong(0) }.getOrElse(-1L)
    val live =
      if (!spark.catalog.tableExists(digestsTable(name))) None
      else Some(spark.table(digestsTable(name))
        .filter(col("batch_id") =!= batchId && col("batch_id") > hw))
    (c, live) match {
      case (Some(a), Some(b)) => Some(a.unionByName(b))
      case (a, b) => a.orElse(b)
    }
  }

  /** Fold committed digest partitions into the dig-bucketed compact
    * table: one pre-aggregated row per (dig, source, lang), carrying
    * the max folded batch_id (the high-water). Stage-then-swap with
    * [[recoverStaging]] adoption; folded partitions are dropped
    * best-effort (hw-excluded either way). */
  def compact(spark: SparkSession, name: String): Unit = {
    val cT = digestsCompact(name)
    recoverStaging(spark, cT)
    if (!spark.catalog.tableExists(digestsTable(name)) ||
        !spark.catalog.tableExists(markerTable(name))) return
    val committed = spark.table(markerTable(name)).select("batch_id")
    val fold = spark.table(digestsTable(name))
      .join(broadcast(committed), Seq("batch_id"), "left_semi")
    val merged = (if (spark.catalog.tableExists(cT))
      spark.table(cT).unionByName(fold) else fold)
      .groupBy("dig", "source", "lang")
      .agg(sum("n").as("n"), max("batch_id").as("batch_id"))
    val batches = fold.select("batch_id").distinct()
      .collect().map(_.getLong(0)) // bounded: committed batch count
    if (batches.isEmpty) return
    val staging = cT + "_staging"
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    merged.write.mode("overwrite").bucketBy(8, "dig").saveAsTable(staging)
    spark.sql(s"DROP TABLE IF EXISTS $cT")
    spark.sql(s"ALTER TABLE $staging RENAME TO $cT")
    batches.foreach { b =>
      try spark.sql(s"ALTER TABLE ${digestsTable(name)} " +
        s"DROP IF EXISTS PARTITION (batch_id=$b)")
      catch { case _: Exception => () }
    }
  }

  /** Right-to-erasure seam: FORGET the full-text digests of
    * `victimDocs` (`doc_id`, `text` — run BEFORE deleting the source
    * rows) from the digest ledger, live partitions and dig-bucketed
    * compact table both. The stats/dups tables hold only aggregated
    * (source, lang) COUNTS — k-anonymous rollups with no content or
    * doc identity — and are deliberately left intact: a datasheet that
    * forgot its historical row counts on every erasure would misstate
    * provenance for the surviving corpus. Idempotent; maintenance
    * window. */
  def purgeDocs(spark: SparkSession, victimDocs: DataFrame,
                name: String): Unit = {
    val digs = victimDocs.select(md5(col("text")).as("dig")).distinct()
    graft.index.Erasure.purgeRows(spark, digs, digestsTable(name),
      Seq("dig"))
    val cT = digestsCompact(name)
    recoverStaging(spark, cT)
    if (spark.catalog.tableExists(cT)) {
      val v = broadcast(digs.toDF("erased_key"))
      val t = spark.table(cT)
      if (!t.join(v, t("dig") === v("erased_key"), "left_semi").isEmpty) {
        val staging = cT + "_staging"
        spark.sql(s"DROP TABLE IF EXISTS $staging")
        t.join(v, t("dig") === v("erased_key"), "left_anti")
          .write.mode("overwrite").bucketBy(8, "dig").saveAsTable(staging)
        spark.sql(s"DROP TABLE IF EXISTS $cT")
        spark.sql(s"ALTER TABLE $staging RENAME TO $cT")
      }
    }
  }

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
      val bd = d.groupBy("dig", "source", "lang").agg(count(lit(1)).as("n"))
        .persist()
      writePartition(bd.withColumn("batch_id", lit(batchId)),
        digestsTable(name))

      // dup-count DELTA for this batch, against prior committed state:
      //   per digest with k prior occurrences and m batch copies,
      //   - the m new docs are dups when k ≥ 1 (they join an existing
      //     holder) or m > 1 (they duplicate each other),
      //   - the single prior holder FLIPS to dup exactly when k == 1,
      //     attributed to ITS OWN (source, lang) from the ledger.
      val priorAgg = priorDigests(spark, name, batchId).map { p =>
        p.groupBy("dig").agg(sum("n").as("k"),
          // when k == 1 there is exactly one prior row (n = 1), so the
          // min-struct IS that row's group
          min(struct(col("source"), col("lang"))).as("one"))
      }
      val mTot = bd.groupBy("dig").agg(sum("n").as("m_tot"))
      val joined = bd.join(mTot, Seq("dig"))
        .join(priorAgg.getOrElse(
          spark.range(0).select(lit("").as("dig"), lit(0L).as("k"),
            struct(lit("").as("source"), lit("").as("lang")).as("one"))),
          Seq("dig"), "left")
        .withColumn("k", coalesce(col("k"), lit(0L)))
      val newDup = joined
        .filter(col("k") >= 1 || col("m_tot") > 1)
        .groupBy("source", "lang").agg(sum("n").as("d_dup"))
      val flips = joined
        .filter(col("k") === 1)
        .select(col("dig"), col("one.source").as("source"),
          col("one.lang").as("lang"))
        .distinct() // one flip per digest, whatever m rows the batch has
        .groupBy("source", "lang").agg(count(lit(1)).as("d_dup"))
      writePartition(
        newDup.unionByName(flips)
          .groupBy("source", "lang").agg(sum("d_dup").as("d_dup"))
          .withColumn("batch_id", lit(batchId)),
        dupsTable(name))
      bd.unpersist()

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
    Freshness.refresh(spark, statsTable(name), dupsTable(name), markerTable(name))
    if (!spark.catalog.tableExists(statsTable(name)) ||
        !spark.catalog.tableExists(dupsTable(name)) ||
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
    val dup = spark.table(dupsTable(name))
      .join(committed, Seq("batch_id"), "left_semi")
      .groupBy("source", "lang").agg(sum("d_dup").as("n_exact_dup"))
    base.join(dup, Seq("source", "lang"), "left")
      .select(col("source"), col("lang"), col("n_docs"),
        col("total_tokens"),
        graft.functions.ParityFunctions.duckRound(
          col("sum_chars").cast("double") / col("n_docs").cast("double"), 4)
          .as("mean_chars"),
        coalesce(col("n_exact_dup"), lit(0L)).as("n_exact_dup"))
  }
}
