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
  * itself; serving never re-reads raw events. The
  * `SplitAssignment.compact` move (fold committed partitions into a
  * user-bucketed side table behind a high-water mark) applies here
  * verbatim when batch count grows; the ledger IS that shape.
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
               checkpointDir: String): StreamingQuery = {
    require(checkpointDir.nonEmpty,
      "SnapshotMaintenance.maintain requires a durable checkpointDir: " +
        "replay-skip markers are only valid against stable batch ids")
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, ledgerTable, markerTable)
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

  /** The served latest-row view over committed ledger rows — pl11's
    * exact schema `(user_id, last_type, last_value, last_ts,
    * n_events)`. Argmax of per-batch argmaxes under the SAME
    * (ts, event_id) order = the global argmax. */
  def snapshot(spark: SparkSession, ledgerTable: String,
               markerTable: String): DataFrame = {
    if (!spark.catalog.tableExists(ledgerTable) ||
        !spark.catalog.tableExists(markerTable))
      return spark.range(0).select(col("id").as("user_id"),
        lit("").as("last_type"), lit(0.0).as("last_value"),
        lit(null).cast("timestamp").as("last_ts"), lit(0L).as("n_events"))
    val committed = spark.table(ledgerTable)
      .join(broadcast(spark.table(markerTable).select("batch_id")),
        Seq("batch_id"), "left_semi")
    val ord = struct(col("last_ts"), col("last_event_id"))
    committed.groupBy("user_id").agg(
        max_by(col("last_type"), ord).as("last_type"),
        max_by(col("last_value"), ord).as("last_value"),
        max(col("last_ts")).as("last_ts"),
        sum(col("n_events")).as("n_events"))
      .select("user_id", "last_type", "last_value", "last_ts", "n_events")
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
