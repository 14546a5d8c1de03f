package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC apply — pl11's serving twin (the 20th maintainer):
  * maintain the latest-row-per-key view (SCD-1, latest-wins) of an
  * event stream WITHOUT rewriting a serving table per batch. The
  * production shape is merge-on-read: each micro-batch folds to ONE
  * summary row per (user, batch) — argmax payload under
  * (ts, event_id), max ts, event count — appended to a batch_id-
  * partitioned ledger; serving re-aggregates the committed ledger
  * (argmax of per-batch argmaxes = global argmax, sums of counts =
  * global count — latest-wins is commutative/associative, so ARRIVAL
  * ORDER CANNOT MATTER and a late-arriving old event can never win
  * over a newer one already served).
  *
  * Scale: the ledger carries (batches × active-users-per-batch) rows —
  * per-batch work is one partial-aggregable groupBy of the batch
  * itself; serving never re-reads raw events. When batch count grows,
  * [[compact]] folds committed partitions into a user-bucketed side
  * table holding ONE row per user behind a high-water mark (the
  * `SplitAssignment.compact` move) — latest-wins is associative, so
  * the folded rows re-enter the serve fold losslessly.
  *
  * Delivery: the SubstringDedup protocol — the summary partition is
  * batch_id-partitioned and dynamic-overwritten so a crashed partial
  * partition is replaced whole on replay; marker last; committed-only
  * serve. Requires a DURABLE checkpointDir (stable batch ids).
  */
object SnapshotMaintenance {

  /** Starts the maintainer over `events`
    * (`event_id, user_id, ts, event_type, value`). */
  def maintain(events: DataFrame, ledgerTable: String, markerTable: String,
               checkpointDir: String,
               erasureLedger: Option[String] = None): StreamingQuery = {
    require(checkpointDir.nonEmpty,
      "SnapshotMaintenance.maintain requires a durable checkpointDir: " +
        "replay-skip markers are only valid against stable batch ids")
    events.writeStream
      .outputMode("append")
      .queryName(Maintenance.queryNameFor(ledgerTable))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // event streams are user-keyed: the erasure ledger here is a
        // USER-id suppression list (right-to-erasure reaches profiles
        // through the same gate the doc maintainers use)
        applyBatch(
          graft.index.Erasure.gateBatch(batch, erasureLedger,
            Seq("user_id")),
          batchId, ledgerTable, markerTable)
      }
      .start()
  }

  /** One micro-batch: per-user summary row into the ledger partition,
    * marker last. Replay-safe; crashed partials overwritten whole. */
  def applyBatch(batch: DataFrame, batchId: Long,
                 ledgerTable: String, markerTable: String): Unit = {
    val spark = batch.sparkSession
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (committed) return
    val ord = struct(col("ts"), col("event_id"))
    val summary = batch.groupBy("user_id").agg(
        max_by(col("event_type"), ord).as("last_type"),
        max_by(col("value"), ord).as("last_value"),
        max(col("ts")).as("last_ts"),
        max_by(col("event_id"), ord).as("last_event_id"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("last_type"), col("last_value"),
        col("last_ts"), col("last_event_id"), col("n_events"),
        lit(batchId).as("batch_id"))
    overwritePartition(summary, ledgerTable)
    batch.groupBy().agg(count(lit(1)).as("n_events"))
      .withColumn("batch_id", lit(batchId))
      .select("batch_id", "n_events")
      .write.mode("append").saveAsTable(markerTable)
  }

  /** The served latest-row view — pl11's exact schema `(user_id,
    * last_type, last_value, last_ts, n_events)` — over the compact
    * table (one folded row per user; all folded batches committed by
    * construction) plus committed live partitions above its
    * high-water. Argmax of per-batch argmaxes under the SAME
    * (ts, event_id) order = the global argmax. */
  def snapshot(spark: SparkSession, ledgerTable: String,
               markerTable: String): DataFrame = {
    Freshness.refresh(spark, ledgerTable, markerTable, compactTable(ledgerTable))
    val cT = compactTable(ledgerTable)
    recoverStaging(spark, cT)
    val c = if (spark.catalog.tableExists(cT))
      Some(spark.table(cT)) else None
    val hw = if (c.isDefined) hwOf(spark, cT) else -1L
    val live = if (spark.catalog.tableExists(ledgerTable) &&
        spark.catalog.tableExists(markerTable))
      Some(spark.table(ledgerTable)
        .filter(col("batch_id") > hw)
        .join(broadcast(spark.table(markerTable).select("batch_id")),
          Seq("batch_id"), "left_semi"))
    else None
    val rows = (c, live) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (a, b) => a.orElse(b).getOrElse(
        return spark.range(0).select(col("id").as("user_id"),
          lit("").as("last_type"), lit(0.0).as("last_value"),
          lit(null).cast("timestamp").as("last_ts"),
          lit(0L).as("n_events")))
    }
    foldLatest(rows)
      .select("user_id", "last_type", "last_value", "last_ts", "n_events")
  }

  /** The latest-wins fold shared by serving and compaction — one use
    * of the argmax so the two can never disagree. Keeps
    * `last_event_id` (the tie-break key) and `batch_id` (max — the
    * compact table's high-water) so folded rows re-enter the fold. */
  private def foldLatest(rows: DataFrame): DataFrame = {
    val ord = struct(col("last_ts"), col("last_event_id"))
    rows.groupBy("user_id").agg(
      max_by(col("last_type"), ord).as("last_type"),
      max_by(col("last_value"), ord).as("last_value"),
      max(col("last_ts")).as("last_ts"),
      max_by(col("last_event_id"), ord).as("last_event_id"),
      sum(col("n_events")).as("n_events"),
      max(col("batch_id")).as("batch_id"))
  }

  // ---- Ledger compaction (the SplitAssignment.compact move) --------
  // The ledger grows one row per (user, batch); serving re-aggregates
  // it whole. [[compact]] folds committed partitions into a user-
  // bucketed table `<ledger>c` holding ONE row per user (latest-wins
  // is associative, so folded rows re-enter the serve fold losslessly)
  // with batch_id = the max folded batch (the high-water). Stage-then-
  // swap + adoption at every entry point; folded partitions dropped
  // best-effort (hw-excluded either way).

  private def compactTable(ledgerTable: String) = ledgerTable + "c"

  private def recoverStaging(spark: SparkSession, table: String): Unit = {
    val staging = table + "_staging"
    if (!spark.catalog.tableExists(table) &&
        spark.catalog.tableExists(staging))
      spark.sql(s"ALTER TABLE $staging RENAME TO $table")
  }

  private def hwOf(spark: SparkSession, cT: String): Long =
    spark.table(cT).agg(max("batch_id")).head match {
      case r if r.isNullAt(0) => -1L
      case r => r.getLong(0)
    }

  /** Fold committed ledger partitions into the user-bucketed compact
    * table. Call from a maintenance window; serving stays correct (and
    * crash-safe) at any point before, during or after. The fold takes
    * only partitions ABOVE the compact table's high-water — mirroring
    * the serve-side filter — so a crash between the staging→live
    * rename and the partition drops (or a swallowed DROP failure)
    * cannot re-fold already-folded batches and double-count
    * `n_events`; the leftover ≤hw partitions are re-dropped here. */
  def compact(spark: SparkSession, ledgerTable: String,
              markerTable: String): Unit = {
    val cT = compactTable(ledgerTable)
    recoverStaging(spark, cT)
    if (!spark.catalog.tableExists(ledgerTable) ||
        !spark.catalog.tableExists(markerTable)) return
    val hw = if (spark.catalog.tableExists(cT)) hwOf(spark, cT) else -1L
    val committed = spark.table(markerTable).select("batch_id")
    val fold = spark.table(ledgerTable)
      .filter(col("batch_id") > hw)
      .join(broadcast(committed), Seq("batch_id"), "left_semi")
    val merged = if (spark.catalog.tableExists(cT))
      spark.table(cT).unionByName(fold) else fold
    val batches = fold.select("batch_id").distinct()
      .collect().map(_.getLong(0)) // bounded: committed batch count
    // Stale committed partitions ≤ hw = drops a crashed prior compact
    // never completed; already excluded from serve AND this fold.
    val stale = spark.table(ledgerTable).select("batch_id").distinct()
      .filter(col("batch_id") <= hw)
      .join(broadcast(committed), Seq("batch_id"), "left_semi")
      .collect().map(_.getLong(0))
    if (batches.isEmpty && stale.isEmpty) return
    if (batches.nonEmpty) {
      val staging = cT + "_staging"
      spark.sql(s"DROP TABLE IF EXISTS $staging")
      foldLatest(merged)
        .select("user_id", "last_type", "last_value", "last_ts",
          "last_event_id", "n_events", "batch_id")
        .write.mode("overwrite").bucketBy(8, "user_id").saveAsTable(staging)
      spark.sql(s"DROP TABLE IF EXISTS $cT")
      spark.sql(s"ALTER TABLE $staging RENAME TO $cT")
    }
    (batches ++ stale).foreach { b =>
      try spark.sql(
        s"ALTER TABLE $ledgerTable DROP IF EXISTS PARTITION (batch_id=$b)")
      catch { case _: Exception => () }
    }
  }

  /** batch_id-partitioned dynamic overwrite (the SubstringDedup write
    * path — see RewriteDedup.overwritePartition's rationale). */
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
