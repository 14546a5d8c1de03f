package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery}

/** One input event for the stateful sessionizer. */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

/** One open session (epoch millis bounds) — the state store holds a
  * short list of these per user, never events. */
case class SessionState(startMs: Long, endMs: Long, n: Long, total: Double)

/** One closed session — same shape as batch q27's output rows. */
case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                      session_end: java.sql.Timestamp, n_events: Long,
                      total_value: Double)

/** One input event for the stateful funnel. */
case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp,
                       event_type: String)

/** Funnel progress per user: stage timestamps (epoch ms, -1 = not yet
  * reached) plus the not-yet-finalizable events inside the watermark
  * horizon. Finalized progress is 3 longs; `pending` is bounded by
  * rate × watermark delay. */
case class FunnelProgress(t1: Long, t2: Long, t3: Long,
                          pending: List[(Long, String)])

/** One completed funnel — emitted exactly once per user. */
case class FunnelOut(user_id: Long, view_ts: java.sql.Timestamp,
                     click_ts: java.sql.Timestamp,
                     purchase_ts: java.sql.Timestamp)

/** Left (probe) event for the streaming as-of join. */
case class AsofLeft(user_id: Long, ts: java.sql.Timestamp, event_id: Long)

/** Right (reference) event for the streaming as-of join. */
case class AsofRight(user_id: Long, ts: java.sql.Timestamp, value: Double)

/** Internal tagged union of the two as-of sides (rights tag 0 sort
  * before lefts at equal time, the q28 device). */
case class AsofIn(user_id: Long, ts: java.sql.Timestamp, tag: Int,
                  event_id: Long, value: Double)

/** As-of join state per user: the single DOMINANT finalized right row
  * (latestTs < 0 = none yet) plus the in-flux pending events — µs
  * timestamps; bounded by rate × watermark delay + 1. */
case class AsofState(latestTs: Long, latestVal: Double,
                     pendL: List[(Long, Long)], pendR: List[(Long, Double)])

/** One as-of match — emitted exactly once per left event. */
case class AsofOut(user_id: Long, event_id: Long, event_ts: java.sql.Timestamp,
                   right_ts: Option[java.sql.Timestamp],
                   right_value: Option[Double])

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
    windowedCounts(events, "1 hour")

  /** Sliding 1-hour/30-minute counts — each event contributes to two
    * windows; same batch/streaming duality as tumblingCounts (q33's
    * oracle checks the batch path). */
  def slidingCounts(events: DataFrame): DataFrame =
    windowedCounts(events, "30 minutes")

  private def windowedCounts(events: DataFrame, slide: String): DataFrame = {
    // duckRound is a session temp function; register here rather than
    // relying on a prior tables.load — streaming frames never pass
    // through the table loader
    graft.expressions.VectorExpressions.ensureRegistered(events.sparkSession)
    events
      .groupBy(window(col("ts"), "1 hour", slide), col("event_type"))
      // exact-cents sum: order-independent under partial-agg merge AND
      // streaming incremental state updates (ParityFunctions.moneySum)
      .agg(count(lit(1)).as("n"),
        graft.functions.ParityFunctions.duckRound(
          graft.functions.ParityFunctions.moneySum(col("value")), 2)
          .as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
  }

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
    * bounded per-key state.
    *
    * State per user is the list of OPEN sessions (4 fields each) still
    * inside the watermark horizon — never a buffer of events — so
    * out-of-order events (allowed up to `watermarkDelay` late) land in,
    * extend, or BRIDGE the right sessions exactly like batch
    * `session_window`: an event merges every session within gap of it
    * (end-inclusive both directions, pinned by the gap-edge spec), and
    * a bridging event fuses its neighbors into one. A session is
    * emitted only once the watermark is strictly past its end + gap, so
    * no later event can still reach it; the list length is bounded by
    * watermarkDelay / gap + 1, and state drops to nothing when all
    * sessions close.
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

    /** Merge one event into the session list: all sessions within gap
      * of t (inclusive) fuse with it and each other. */
    def absorb(sessions: List[SessionState], t: Long, v: Double): List[SessionState] = {
      val (overlap, rest) = sessions.partition(s =>
        t >= s.startMs - gapMs && t <= s.endMs + gapMs)
      val fused = overlap.foldLeft(SessionState(t, t, 1, v)) { (acc, s) =>
        SessionState(math.min(acc.startMs, s.startMs),
          math.max(acc.endMs, s.endMs), acc.n + s.n, acc.total + s.total)
      }
      (fused :: rest).sortBy(_.startMs)
    }

    /** Emit sessions the watermark has passed; re-arm the timeout for
      * the earliest still-open session. */
    def flush(user: Long, sessions: List[SessionState],
              state: GroupState[List[SessionState]]): Iterator[SessionOut] = {
      val wm = state.getCurrentWatermarkMs()
      // strictly past end + gap: an event AT end + gap still merges
      val (done, open) = sessions.partition(s => s.endMs + gapMs < wm)
      if (open.isEmpty) state.remove()
      else {
        state.update(open)
        state.setTimeoutTimestamp(open.map(_.endMs).min + gapMs + 1)
      }
      done.sortBy(_.startMs).map(close(user, _)).iterator
    }

    def fold(user: Long, batch: Iterator[SessionEvent],
             state: GroupState[List[SessionState]]): Iterator[SessionOut] = {
      val prior = state.getOption.getOrElse(Nil)
      val merged =
        if (state.hasTimedOut) prior
        else batch.foldLeft(prior)((ss, e) => absorb(ss, e.ts.getTime, e.value))
      flush(user, merged, state)
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fold)
  }

  /** Stateful ordered-event funnel — the streaming twin of batch q52:
    * per user, the earliest view, the earliest click strictly after it,
    * the earliest purchase strictly after that; emit ONE row when the
    * funnel completes. Needs custom state because the match depends on
    * EVENT ORDER, and out-of-order arrival can rewrite it: a
    * late-arriving earlier view lowers t1, which can re-qualify a click
    * that was previously too early. So an event only FOLDS into the
    * monotone stage state once the watermark passes it (nothing earlier
    * can still arrive); until then it waits in `pending`. Events are
    * folded in (ts, type) order, which reproduces the batch
    * min-aggregation exactly — spec-pinned equal to q52's per-user
    * staged minima, including cross-batch and out-of-order deliveries.
    *
    * Stage timestamps are held in MICROSECONDS (the events corpus is
    * micros-grained; millisecond truncation would both corrupt the
    * strict '>' stage comparisons within a millisecond and emit
    * timestamps up to 999 µs off the batch answer).
    *
    * State is 3 longs of stage progress per active user plus `pending`
    * bounded by the watermark horizon. A COMPLETED user keeps a 3-long
    * tombstone (t3 set, empty pending) — the processed-set state any
    * exactly-once emitter needs: dropping it immediately would let
    * later events recreate blank state and emit a second FunnelOut for
    * a user the batch twin reports once. Tombstones and stalled
    * partial-progress state expire `idleTtl` after the user's last
    * event (watermark clock), so all-time distinct users don't
    * accumulate state forever — the dropDuplicatesWithinWatermark
    * trade: exactly-once is guaranteed within the TTL of the user's
    * last activity, and a funnel re-completed after a full TTL of
    * silence re-emits. The event-time timeout otherwise re-arms at the
    * earliest pending event so progress needs no further traffic.
    */
  def funnelStateful(events: Dataset[FunnelEvent],
                     watermarkDelay: String = "2 hours",
                     idleTtl: String = "30 days"): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    val ttlIv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(idleTtl))
    require(ttlIv.months == 0, "idleTtl must be a fixed-length interval")
    val ttlMs = ttlIv.days * 86400000L + ttlIv.microseconds / 1000

    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000 + t.getNanos / 1000 % 1000
    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }

    def fold(user: Long, batch: Iterator[FunnelEvent],
             state: GroupState[FunnelProgress]): Iterator[FunnelOut] = {
      val prior = state.getOption.getOrElse(FunnelProgress(-1, -1, -1, Nil))
      val wm = state.getCurrentWatermarkMs()
      if (prior.t3 >= 0) {
        // completed tombstone: drain arrivals without re-emitting; an
        // idle-TTL timeout (no arrivals for idleTtl) reclaims it
        if (state.hasTimedOut) state.remove()
        else state.setTimeoutTimestamp(wm + ttlMs)
        return Iterator.empty
      }
      val staged =
        if (state.hasTimedOut) prior
        else prior.copy(pending = prior.pending ++
          batch.map(e => (micros(e.ts), e.event_type)))
      // strictly below the watermark = final (a future arrival has
      // ts ≥ wm and so cannot precede anything we fold now); wm is a
      // millisecond clock, so finalize strictly below its µs boundary
      val (fin, pend) = staged.pending.partition(_._1 < wm * 1000)
      var (t1, t2, t3) = (staged.t1, staged.t2, staged.t3)
      for ((t, ty) <- fin.sorted) ty match {
        case "view" if t1 < 0 => t1 = t
        case "click" if t1 >= 0 && t > t1 && t2 < 0 => t2 = t
        case "purchase" if t2 >= 0 && t > t2 && t3 < 0 => t3 = t
        case _ => // not a stage advance
      }
      if (t3 >= 0) {
        // keep the done tombstone (pending dropped): exactly-once,
        // reclaimed by the idle TTL
        state.update(FunnelProgress(t1, t2, t3, Nil))
        state.setTimeoutTimestamp(wm + ttlMs)
        Iterator(FunnelOut(user, toTs(t1), toTs(t2), toTs(t3)))
      } else if (state.hasTimedOut && fin.isEmpty && pend.isEmpty) {
        // genuine idle-TTL timeout: a TTL timeout is only armed when
        // pending was already empty, so nothing folded this invocation
        // (fin empty) means the user really has been silent for idleTtl
        // — reclaim. A pending-finalization timeout (armed at
        // min-pending+1ms) always finalizes at least that event, so
        // fin.nonEmpty routes it to the update branch below: partial
        // t1/t2 progress survives and the idle TTL re-arms, instead of
        // being dropped the moment the watermark folds the first stage
        // (which would strand any funnel whose stages are separated by
        // more than the watermark delay of quiet time).
        state.remove()
        Iterator.empty
      } else {
        state.update(FunnelProgress(t1, t2, t3, pend))
        // pend survivors have ts ≥ wm·1000, so their ms + 1 is legally
        // in the future; with nothing pending, arm the idle TTL
        if (pend.nonEmpty) state.setTimeoutTimestamp(pend.map(_._1).min / 1000 + 1)
        else state.setTimeoutTimestamp(wm + ttlMs)
        Iterator.empty
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fold)
  }

  /** Stateful stream-stream AS-OF join (the temporal join of every
    * tick-data / feature-store stack; q28 is its batch twin): each
    * left event pairs with the LATEST right row of the same user at or
    * before its event time — or NULL if none exists — emitted exactly
    * once. No built-in stream-stream join expresses this: "latest
    * preceding" is an argmax over an unbounded look-BACK, and an
    * interval join both fans out (every preceding right matches) and
    * cannot bound that look-back.
    *
    * The state contract is what makes it 100 TB-viable: a left event
    * at t finalizes once the watermark passes t (nothing with ts ≤ t
    * can still arrive), and of the FINALIZED right rows only the
    * latest one can ever win a future left's argmax — every earlier
    * right is dominated and dropped. Per-user state is therefore ONE
    * compacted right row + the in-flux horizon (events within the
    * watermark delay), never a history: O(rate × delay + 1) per key,
    * the same bound as the built-in interval join, despite the
    * unbounded look-back semantics. The compacted row expires
    * `idleTtl` after the user's last activity (the funnel tombstone
    * trade: an event arriving after a full TTL of silence sees no
    * predecessor).
    *
    * Ties: a right AT the left's timestamp matches ("at or before");
    * among equal-ts rights the largest value wins — both pinned to the
    * batch formulation in the spec. Timestamps are held in
    * MICROSECONDS (the funnel rationale).
    */
  def asofJoinStateful(lefts: Dataset[AsofLeft], rights: Dataset[AsofRight],
                       watermarkDelay: String = "2 hours",
                       idleTtl: String = "30 days"): Dataset[AsofOut] = {
    import lefts.sparkSession.implicits._
    val ttlIv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(idleTtl))
    require(ttlIv.months == 0, "idleTtl must be a fixed-length interval")
    val ttlMs = ttlIv.days * 86400000L + ttlIv.microseconds / 1000

    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000 + t.getNanos / 1000 % 1000
    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }

    // one tagged stream: rights tag 0, lefts tag 1 (the q28 union)
    val tagged = rights
      .map(r => AsofIn(r.user_id, r.ts, 0, -1L, r.value))
      .unionByName(lefts.map(l => AsofIn(l.user_id, l.ts, 1, l.event_id, 0.0)))

    def fold(user: Long, batch: Iterator[AsofIn],
             state: GroupState[AsofState]): Iterator[AsofOut] = {
      val prior = state.getOption.getOrElse(AsofState(-1L, 0.0, Nil, Nil))
      val merged =
        if (state.hasTimedOut) prior
        else batch.foldLeft(prior) { (st, e) =>
          if (e.tag == 0) st.copy(pendR = (micros(e.ts), e.value) :: st.pendR)
          else st.copy(pendL = (micros(e.ts), e.event_id) :: st.pendL)
        }
      val wmUs = state.getCurrentWatermarkMs() * 1000
      val (finR, pendR) = merged.pendR.partition(_._1 < wmUs)
      val (finL, pendL) = merged.pendL.partition(_._1 < wmUs)
      // all rights at or before a finalized left are themselves below
      // the watermark, so the argmax only ever consults finalized rows
      val finalized = (if (merged.latestTs >= 0)
        List((merged.latestTs, merged.latestVal)) else Nil) ::: finR
      val out = finL.sorted.iterator.map { case (t, id) =>
        val cand = finalized.filter(_._1 <= t)
        if (cand.isEmpty) AsofOut(user, id, toTs(t), None, None)
        else {
          val (bt, bv) = cand.max // (ts, value) ordering = the tie rule
          AsofOut(user, id, toTs(t), Some(toTs(bt)), Some(bv))
        }
      }.toList
      // dominance compaction: keep only the latest finalized right
      val (lt, lv) = if (finalized.isEmpty) (-1L, 0.0) else finalized.max
      if (pendL.isEmpty && pendR.isEmpty) {
        if (state.hasTimedOut && finL.isEmpty && finR.isEmpty) {
          // idle-TTL timeout (TTL timeouts are only armed with nothing
          // pending, so a genuine one folds nothing): reclaim
          state.remove()
          return Iterator.empty
        }
        if (lt >= 0) {
          state.update(AsofState(lt, lv, Nil, Nil))
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ttlMs)
        } else state.remove()
      } else {
        state.update(AsofState(lt, lv, pendL, pendR))
        // pending survivors have ts ≥ wmUs, so ms + 1 is legally ahead
        state.setTimeoutTimestamp(
          (pendL.map(_._1) ++ pendR.map(_._1)).min / 1000 + 1)
      }
      out.iterator
    }

    tagged
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

  /** LEFT OUTER stream-stream interval join: like
    * `intervalJoinStreaming`, plus every unmatched left event is
    * emitted with NULL right columns — but only once the watermark has
    * passed its join window, because until then a matching right row
    * could still arrive. That watermark-gated NULL emission is the
    * semantic difference from a batch left join (which can decide
    * "unmatched" by looking at the whole bounded input); state stays
    * bounded exactly as in the inner variant.
    */
  def intervalJoinStreamingOuter(left: DataFrame, right: DataFrame,
                                 within: String = "30 minutes",
                                 watermarkDelay: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay).alias("l")
    val r = right.withWatermark("ts", watermarkDelay).alias("r")
    l.join(r,
      expr(s"""l.user_id = r.user_id AND
              |r.ts >= l.ts AND r.ts <= l.ts + INTERVAL $within""".stripMargin),
      "leftOuter")
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
    // Streaming reads need an explicit schema. Derive it from a batch
    // read of the same directory — single source of truth with
    // graft.tables — instead of a hand-written DDL: a stale DDL against
    // a re-encoded parquet doesn't throw, it silently yields zero rows
    // (VERDICT r11: `ts BIGINT` vs a TIMESTAMP file → 0 windows).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(eventsDir).schema
    val events = graft.tables.normalizeEventTs(
      spark.readStream.schema(schema).parquet(eventsDir))
    tumblingCountsStreaming(events)
      .writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }
}
