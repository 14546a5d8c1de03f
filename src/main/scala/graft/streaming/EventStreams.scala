package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery}

/** One input event for the stateful sessionizer. */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

/** Per-user open-session state (epoch millis bounds; O(1) per user —
  * the state store never holds events, only the running aggregate). */
case class SessionState(startMs: Long, endMs: Long, n: Long, total: Double)

/** One closed session — same shape as batch q27's output rows. */
case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                      session_end: java.sql.Timestamp, n_events: Long,
                      total_value: Double)

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
      .agg(count(lit(1)).as("n"),
        graft.functions.ParityFunctions.duckRound(sum(col("value")), 2)
          .as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming variant: 2-hour watermark tolerates late events while
    * keeping state bounded. */
  def tumblingCountsStreaming(events: DataFrame): DataFrame =
    tumblingCounts(events.withWatermark("ts", "2 hours"))

  /** Streaming exact dedup — the unbounded twin of batch dd01. Keeps
    * the FIRST event per `event_id`; `dropDuplicatesWithinWatermark`
    * bounds the dedup state store by the watermark delay (a plain
    * streaming `dropDuplicates` would retain every key forever), which
    * is the only formulation that survives an unbounded 100 TB/day
    * ingest: state is O(keys per watermark window), not O(all keys).
    */
  def dedupStreaming(events: DataFrame,
                     watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stateful sessionization — the streaming twin of batch q27
    * (`session_window`), built on `flatMapGroupsWithState` because
    * gap-session semantics need CUSTOM state: a session closes only
    * when the event-time watermark passes its end + gap, which no
    * built-in windowed aggregation expresses in append mode with
    * per-key O(1) state.
    *
    * Scale design: state per user is one `SessionState` (4 fields) —
    * never a buffer of events — so the state store is O(active users),
    * and `EventTimeTimeout` + watermark guarantee every session
    * eventually closes and its state is dropped (no unbounded growth).
    * Matches batch `session_window` semantics (end-INCLUSIVE, pinned
    * by the gap-edge spec): an event extends the open session iff
    * ts <= session_end + gap; only a strictly larger gap starts a new
    * session.
    */
  def sessionizeStateful(events: Dataset[SessionEvent],
                         gapMinutes: Int = 30,
                         watermarkDelay: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    def close(user: Long, s: SessionState): SessionOut =
      SessionOut(user, new java.sql.Timestamp(s.startMs),
        new java.sql.Timestamp(s.endMs), s.n,
        graft.expressions.DuckRound.scalar(s.total, 2))

    def fold(user: Long, batch: Iterator[SessionEvent],
             state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        // watermark passed open-session end + gap: close and drop state
        val out = close(user, state.get)
        state.remove()
        Iterator(out)
      } else {
        // micro-batch arrival order is arbitrary — order by event time
        // before folding (batch is one user's slice of one micro-batch)
        val sorted = batch.toIndexedSeq.sortBy(_.ts.getTime)
        val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.endMs <= gapMs =>
              cur = Some(SessionState(s.startMs, math.max(s.endMs, t),
                s.n + 1, s.total + e.value))
            case Some(s) =>
              closed += close(user, s)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // +1: an event AT end+gap still merges (inclusive bound), so
          // the session may only time out once the watermark is past it
          state.setTimeoutTimestamp(s.endMs + gapMs + 1)
        }
        closed.iterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fold)
  }

  /** Stream-stream interval join (attribution shape): each left event
    * pairs with right events of the same user within `[ts, ts + within]`.
    * Both sides carry watermarks and the join condition bounds event
    * time in BOTH directions, so Spark can expire buffered state for
    * rows older than watermark + interval — without the time bound a
    * stream-stream join would buffer both streams forever. Works
    * unchanged on bounded frames (the batch twin in the spec).
    */
  def intervalJoinStreaming(left: DataFrame, right: DataFrame,
                            within: String = "30 minutes",
                            watermarkDelay: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay).alias("l")
    val r = right.withWatermark("ts", watermarkDelay).alias("r")
    l.join(r,
      expr(s"""l.user_id = r.user_id AND
              |r.ts >= l.ts AND r.ts <= l.ts + INTERVAL $within""".stripMargin))
      .select(col("l.user_id").as("user_id"),
        col("l.ts").as("left_ts"), col("r.ts").as("right_ts"),
        col("l.value").as("left_value"), col("r.value").as("right_value"))
  }

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
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, " +
        "value DOUBLE, props STRING")
    val events = spark.readStream.schema(schema)
      .parquet(eventsDir)
      // DIV (integer), not `/` (double) — see graft.tables nanos note
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    tumblingCountsStreaming(events)
      .writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }
}
