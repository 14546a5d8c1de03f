package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental maintenance of the positional index artifact — the
  * missing half of build-once/serve-many: the corpus keeps growing,
  * and re-tokenizing 100 TB to refresh the index is exactly what the
  * artifact exists to avoid. New documents only ever ADD postings
  * (doc ids are unique), so maintenance is an append — but appending
  * STRAIGHT into the bucketed table had the one crash window no other
  * maintainer kept: a crash after a partial bucketed append and before
  * the commit marker left half a batch's postings looking exactly like
  * data, and the replay appended the whole batch again (undetectable
  * duplication — a bucketed table cannot be partition-overwritten).
  *
  * The fix is the protocol every other maintainer already uses, with
  * the bucketed table demoted to a COMPACTION product:
  *
  *   - `appendBatch` writes each micro-batch's postings to a
  *     batch_id-PARTITIONED staging ledger (`<table>_ledger`) with
  *     dynamic partition overwrite — a crashed partial partition is
  *     replaced whole on replay — then writes the marker. No crash
  *     point duplicates or loses postings.
  *   - Serving ([[postings]]) reads the bucketed compact table UNION
  *     the committed ledger tail above the compact table's high-water
  *     mark. The tail is small by construction (compaction cadence);
  *     the compact part keeps its zero-exchange bucketed property.
  *   - [[compact]] folds committed tail partitions into the bucketed
  *     table inside the existing crash-safe stage-then-swap, records
  *     the new high-water as a TABLE PROPERTY of the staged table
  *     (the rename carries it, so the hw commits atomically WITH the
  *     fold), and drops folded partitions after the swap — a crash
  *     between swap and drops leaves ≤hw partitions that serving and
  *     the next fold both exclude, and the next compact re-drops.
  *
  * Corpus stats are maintained as an append-only ledger of per-batch
  * (batch_id, n_docs) increments — `docCount` sums it. The stats row
  * doubles as the batch's COMMIT MARKER, written after the postings —
  * `appendBatch` skips any batch whose marker already exists.
  */
object IndexMaintenance {

  /** Default bucket count for the compact postings table — the
    * IndexStore test-SF sizing; a deployment that built at hundreds of
    * buckets (SURVEY §6b) passes its count to [[compact]]. */
  val DefaultBuckets = 8

  /** Table property on the compact table recording the max folded
    * ledger batch id — the serve/fold boundary. Set on the STAGED
    * table before the swap, so it can never disagree with the rows. */
  private val HwProp = "graft.folded.hw"

  private def ledgerTable(termDocTable: String) = termDocTable + "_ledger"

  /** Starts the maintenance query: each micro-batch of `newDocs`
    * (`doc_id`, `text`) is handed to `appendBatch`.
    *
    * `checkpointDir` is REQUIRED and must be durable: the commit-marker
    * replay-skip keys on `batchId`, and batch ids are only stable
    * across restarts when the query resumes from the same checkpoint —
    * a temp checkpoint restarts ids at 0 and old markers would silently
    * swallow new batches. */
  def maintain(newDocs: DataFrame, termDocTable: String,
               statsTable: String, checkpointDir: String,
               erasureLedger: Option[String] = None): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .queryName(Maintenance.queryNameFor(termDocTable))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(graft.index.Erasure.gateBatch(batch, erasureLedger),
          batchId, termDocTable, statsTable)
      }
      .start()

  /** One micro-batch: tokenize into positional postings, overwrite
    * this batch's LEDGER partition (replay-safe: a crashed partial
    * partition is replaced whole), then write the (batch_id, n_docs)
    * commit marker. A batch whose marker exists is skipped — so every
    * crash point either replays into an overwrite or skips. */
  def appendBatch(batch: DataFrame, batchId: Long,
                  termDocTable: String, statsTable: String): Unit = {
    val spark = batch.sparkSession
    // the batch may be the session's first graft work (no tables.load
    // ran): the tokenizer below resolves from the session registry
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    // a crashed compact swap may have left the postings under the
    // staging name; adopt BEFORE the append so serving never finds a
    // ledger tail with no base to union
    recoverStaging(spark, termDocTable)
    val committed = spark.catalog.tableExists(statsTable) &&
      !spark.table(statsTable).filter(col("batch_id") === batchId).isEmpty
    if (!committed) {
      overwritePartition(
        graft.queries.Text.termDocPositionalOf(batch)
          .withColumn("batch_id", lit(batchId)),
        ledgerTable(termDocTable))
      batch.groupBy()
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("batch_id", lit(batchId))
        .select("batch_id", "n_docs")
        .write.mode("append").saveAsTable(statsTable)
    }
  }

  /** Total corpus size from the stats ledger. */
  def docCount(spark: SparkSession, statsTable: String): Long = {
    refresh(spark, statsTable)
    spark.table(statsTable)
      .agg(coalesce(sum("n_docs"), lit(0L))).head.getLong(0)
  }

  private def refresh(spark: SparkSession, t: String): Unit =
    if (spark.catalog.tableExists(t))
      try spark.catalog.refreshTable(t)
      catch { case _: Exception => () }

  /** Document DELETION — the other half of maintenance. A delete never
    * rewrites the bucketed postings (that would be an O(index) job for
    * an O(1) request): the ids are appended to a tombstone side table
    * and serving plans subtract them via `withoutDeleted`. The stats
    * ledger gets a negative increment so `docCount` (BM25's N) tracks
    * the LIVE corpus. Idempotent: ids already tombstoned are ignored,
    * so a replayed delete neither double-appends nor double-decrements.
    * Caller contract: ids should belong to the indexed corpus (the
    * ledger trusts them; tombstoning a never-indexed id would skew N).
    */
  def deleteDocs(spark: SparkSession,
                 docIds: Seq[Long], tombstoneTable: String,
                 statsTable: String): Unit = {
    import spark.implicits._
    if (docIds.nonEmpty) {
      val requested = docIds.distinct.toDF("doc_id")
      val fresh =
        if (spark.catalog.tableExists(tombstoneTable))
          requested.join(spark.table(tombstoneTable), Seq("doc_id"), "left_anti")
        else requested
      val n = fresh.count()
      if (n > 0) {
        fresh.write.mode("append").saveAsTable(tombstoneTable)
        Seq((TombstoneBatchId, -n)).toDF("batch_id", "n_docs")
          .write.mode("append").saveAsTable(statsTable)
      }
    }
  }

  /** Ledger batch id for delete decrements — streaming batch ids are
    * ≥ 0, so the commit-marker check never collides with these rows. */
  private val TombstoneBatchId = -2L

  /** Serve-time tombstone application: a BROADCAST anti-join (the
    * tombstone set is small by construction — it is cleared at every
    * compaction), so serving plans keep their zero-exchange bucketed
    * scan and pay one map-side hash probe. Pass-through when no
    * tombstone table exists. */
  def withoutDeleted(postings: DataFrame, tombstoneTable: String): DataFrame = {
    val spark = postings.sparkSession
    // the tombstone table is appended by deleteDocs AND by the erasure
    // maintainer's foreachBatch (a CLONED session whose refresh does
    // not invalidate this session's cached listing) — without a relist
    // here a reader that served before the latest erasure keeps
    // serving the erased doc, the exact failure right-to-erasure
    // exists to prevent (round-15, found by ErasureMaintenanceSpec)
    refresh(spark, tombstoneTable)
    if (!spark.catalog.tableExists(tombstoneTable)) postings
    else postings.join(broadcast(spark.table(tombstoneTable).select("doc_id")),
      Seq("doc_id"), "left_anti")
  }

  /** The maintained postings as a DataFrame — the serve-side entry
    * point, healing a crashed compact swap first. Bucketed compact
    * table UNION the committed ledger tail above the compact table's
    * high-water: the tail is the postings appended since the last
    * compaction (small by cadence), the compact part keeps its
    * zero-exchange property, and the high-water filter makes a
    * crashed compact's leftover ≤hw partitions invisible. */
  def postings(spark: SparkSession, termDocTable: String,
               statsTable: String): DataFrame = {
    // the maintainer writes through a CLONED session (foreachBatch);
    // its refresh does not invalidate THIS session's cached file
    // listings, so a serve call that planned against these tables
    // before the latest batch would read stale listings and miss
    // committed rows — refresh before reading
    Seq(termDocTable, ledgerTable(termDocTable), statsTable)
      .foreach(refresh(spark, _))
    recoverStaging(spark, termDocTable)
    val base = if (spark.catalog.tableExists(termDocTable))
      Some(spark.table(termDocTable)) else None
    val tail = committedTail(spark, termDocTable, statsTable)
      .map(_.drop("batch_id"))
    (base, tail) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (a, b) => a.orElse(b).getOrElse(
        spark.range(0).select(col("id").as("doc_id"),
          lit("").as("token"), lit(0L).as("cnt"),
          lit(null).cast("array<int>").as("positions")))
    }
  }

  /** Committed ledger partitions above the compact table's high-water
    * (None when no ledger exists). Keeps `batch_id` — [[postings]]
    * drops it, [[compact]] folds by it. */
  private def committedTail(spark: SparkSession, termDocTable: String,
                            statsTable: String): Option[DataFrame] = {
    val lt = ledgerTable(termDocTable)
    if (!spark.catalog.tableExists(lt) ||
        !spark.catalog.tableExists(statsTable)) None
    else Some(spark.table(lt)
      .filter(col("batch_id") > hwOf(spark, termDocTable))
      .join(broadcast(spark.table(statsTable).select("batch_id")),
        Seq("batch_id"), "left_semi"))
  }

  /** Max folded ledger batch id recorded on the compact table (-1
    * when absent — nothing folded yet). */
  private def hwOf(spark: SparkSession, termDocTable: String): Long =
    if (!spark.catalog.tableExists(termDocTable)) -1L
    else spark.sql(s"SHOW TBLPROPERTIES $termDocTable")
      .collect().find(_.getString(0) == HwProp)
      .map(_.getString(1).toLong).getOrElse(-1L)

  /** Compaction — the operational counterpart of append-only
    * maintenance, and (with `statsTable`) the fold that moves the
    * committed ledger tail into the bucketed table. Rewrites the
    * table as ONE file set with the SAME bucket spec, so serving
    * plans keep their zero-exchange property on the compact part and
    * the tail resets to empty. With `tombstoneTable` it also PURGES
    * tombstoned documents (anti-join folded into the rewrite) and
    * clears the tombstone table afterwards.
    *
    * CONTRACT: run in a maintenance window with the maintainer stopped
    * (SURVEY §6b). Crash-safe via stage-then-swap (the TrendMaintenance
    * protocol): the compacted postings are fully written under
    * `<table>_staging` — with the new high-water recorded as a table
    * property BEFORE the swap, so fold-state and rows commit together —
    * then drop + rename. A crash before the drop leaves the live table
    * untouched; between drop and rename, [[recoverStaging]] adopts the
    * staged table (property included) at every entry point; after the
    * rename but before the partition drops, the leftover ≤hw ledger
    * partitions are already excluded by every reader and re-dropped by
    * the next compact. Tombstones are cleared only AFTER the swap: a
    * crash before that leaves them anti-joining already-purged ids —
    * a no-op, cleared next compact. */
  def compact(spark: SparkSession, termDocTable: String,
              statsTable: Option[String] = None,
              tombstoneTable: Option[String] = None,
              buckets: Int = DefaultBuckets): Unit = {
    recoverStaging(spark, termDocTable)
    val lt = ledgerTable(termDocTable)
    val hw = hwOf(spark, termDocTable)
    val base = if (spark.catalog.tableExists(termDocTable))
      Some(spark.table(termDocTable)) else None
    val tail = statsTable.flatMap(committedTail(spark, termDocTable, _))
    val foldIds = tail.map(_.select("batch_id").distinct()
      .collect().map(_.getLong(0)).toSeq).getOrElse(Nil) // bounded
    val staleIds = statsTable match { // crashed-prior-compact leftovers
      case Some(st) if spark.catalog.tableExists(lt) &&
          spark.catalog.tableExists(st) =>
        spark.table(lt).select("batch_id").distinct()
          .filter(col("batch_id") <= hw)
          .join(broadcast(spark.table(st).select("batch_id")),
            Seq("batch_id"), "left_semi")
          .collect().map(_.getLong(0)).toSeq
      case _ => Nil
    }
    val merged = (base, tail.map(_.drop("batch_id"))) match {
      case (Some(a), Some(b)) if foldIds.nonEmpty => Some(a.unionByName(b))
      case (None, Some(b)) if foldIds.nonEmpty => Some(b)
      case (a, _) => a
    }
    merged.foreach { m =>
      val live = tombstoneTable
        .map(t => withoutDeleted(m, t)).getOrElse(m)
      val staging = termDocTable + "_staging"
      live.repartition(col("token"))
        .write.mode("overwrite")
        .bucketBy(buckets, "token").sortBy("token")
        .saveAsTable(staging)
      val newHw = (hw +: foldIds).max
      spark.sql(
        s"ALTER TABLE $staging SET TBLPROPERTIES ('$HwProp'='$newHw')")
      spark.sql(s"DROP TABLE IF EXISTS $termDocTable")
      spark.sql(s"ALTER TABLE $staging RENAME TO $termDocTable")
      tombstoneTable.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
    (foldIds ++ staleIds).foreach { b =>
      try spark.sql(
        s"ALTER TABLE $lt DROP IF EXISTS PARTITION (batch_id=$b)")
      catch { case _: Exception => () }
    }
  }

  /** Crash recovery for [[compact]]'s stage-then-swap: a crash between
    * the DROP and the RENAME leaves no postings table but a complete
    * staged one — adopt it. (RENAME is sound here because the postings
    * table is bucketed but NOT partitioned: the in-memory catalog's
    * rename pitfall is stale per-PARTITION locations, and the bucket
    * spec — like the high-water property — lives in table metadata,
    * which the rename carries.) Called by every entry point that reads
    * or writes the postings table. */
  private def recoverStaging(spark: SparkSession,
                             termDocTable: String): Unit = {
    val staging = termDocTable + "_staging"
    if (!spark.catalog.tableExists(termDocTable) &&
        spark.catalog.tableExists(staging))
      spark.sql(s"ALTER TABLE $staging RENAME TO $termDocTable")
  }

  /** batch_id-partitioned dynamic overwrite (the SubstringDedup write
    * path): first batch creates the layout, later batches replace
    * exactly their own partition — a crashed partial partition is
    * overwritten whole on replay. */
  private def overwritePartition(rows: DataFrame, table: String): Unit = {
    val spark = rows.sparkSession
    if (!spark.catalog.tableExists(table))
      rows.write.partitionBy("batch_id").saveAsTable(table)
    else {
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prior = spark.conf.getOption(key)
      spark.conf.set(key, "dynamic")
      try rows.write.mode("overwrite").insertInto(table)
      finally prior match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }
}
