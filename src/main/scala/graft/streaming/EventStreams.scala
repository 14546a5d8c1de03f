package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured-Streaming surface over the `events` table — the streaming
  * twin of batch query q22 (Relational.scala). The reference is pure
  * batch (one synchronous job, InvertedIndexer.java:261); this is the
  * north-star generalization: the SAME tumbling-window aggregation
  * applied to a bounded DataFrame (batch, oracle-checked) or an
  * unbounded one (readStream + watermark).
  *
  * Scale notes: event-time windows + watermark bound the state store —
  * state for a window is dropped once the watermark passes its end, so
  * long-running jobs don't accumulate unbounded keys. The aggregation
  * itself is the usual partial+final HashAggregate per micro-batch.
  */
object EventStreams {

  /** Tumbling 1-hour counts/sums by event type. Identical logic for
    * batch and streaming inputs; q22's oracle checks the batch path.
    * (No ORDER BY here: sorting is illegal on streaming aggregations
    * in append/update modes; q22 adds it batch-side.)
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming variant: 2-hour watermark tolerates late events while
    * keeping state bounded. */
  def tumblingCountsStreaming(events: DataFrame): DataFrame =
    tumblingCounts(events.withWatermark("ts", "2 hours"))

  /** File-source streaming demo: treats `eventsDir` — a DIRECTORY of
    * events parquet files, the realistic arriving-data layout — as a
    * stream (one-shot availableNow trigger), aggregates with watermark,
    * lands results in an in-memory table named `tableName`. Returns the
    * started query; caller awaits it.
    */
  def runFileStreamDemo(spark: SparkSession, eventsDir: String,
                        tableName: String): StreamingQuery = {
    // Streaming reads need an explicit schema; events.ts is
    // TIMESTAMP(NANOS) parquet, read as raw INT64 then converted
    // (same lossless path as graft.tables.load).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, " +
        "value DOUBLE, props STRING")
    val events = spark.readStream.schema(schema)
      .parquet(eventsDir)
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    tumblingCountsStreaming(events)
      .writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }
}
