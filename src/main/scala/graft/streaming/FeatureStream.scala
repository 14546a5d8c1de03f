package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** One input event for the online feature extractor. */
case class FeatureEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

/** Running per-user aggregate — the whole state: 2 longs + 2 doubles,
  * O(1) per key regardless of history length. */
case class FeatureAgg(n: Long, total: Double, lastTsUs: Long, lastVal: Double)

/** Point-in-time features emitted for ONE event, computed from
  * strictly PRIOR events only (None until a prior event exists). */
case class FeatureOut(user_id: Long, ts: java.sql.Timestamp, n_prior: Long,
                      sum_prior: Double, last_value: Option[Double],
                      us_since_last: Option[Long])

/** One user's offline-computed state at the backfill cutover — the
  * keyed row shape `onlineFeaturesFrom` seeds serving state with. */
case class FeatureSnapshot(user_id: Long, n: Long, total: Double,
                           lastTsUs: Long, lastVal: Double)

/** Online per-event feature extraction on `transformWithState` (the
  * arbitrary-stateful-processing v2 API, new in Spark 4) — the SERVING
  * half of a feature store: the offline half joins historical features
  * point-in-time-correctly (q28 / `EventStreams.asofJoinStateful`);
  * this computes the same features online, per arriving event, from an
  * O(1) running aggregate per user.
  *
  * The ML-correctness contract is ZERO LEAKAGE: the features attached
  * to an event are computed from strictly PRIOR events — the current
  * event folds into state only AFTER its features are emitted (a
  * feature that includes its own label row poisons training silently).
  * Spec-pinned against a batch window twin with a 1-PRECEDING frame.
  *
  * Ordering: events fold in event-time order within a micro-batch; a
  * cross-batch straggler folds at arrival — the true online-serving
  * semantic (a server can only know what has arrived). Under in-order
  * delivery the stream is bit-equal to the batch window twin,
  * including the double sum (both fold ascending).
  *
  * v2 API notes vs `flatMapGroupsWithState`: typed per-state handles
  * with NATIVE TTL (the funnel/as-of operators hand-roll their idle
  * TTL through timeout timestamps; here `TTLConfig` declares it and
  * the store enforces it), composable multiple states per key, and a
  * RocksDB-only contract — transformWithState requires
  * `RocksDBStateStoreProvider` (the spec sets it; at cluster scale
  * that is the provider SURVEY §6b prescribes anyway).
  *
  * TTL is OPT-IN: store-enforced TTL needs `TimeMode.ProcessingTime`,
  * and in micro-batch execution a processing-time clock makes the
  * engine run no-data batches CONTINUOUSLY (a timer could fire at any
  * instant — the documented fMGWS ProcessingTimeTimeout behavior,
  * observed here as thousands of empty commits per minute). Right for
  * a low-latency serving job that is always on; wrong as a default,
  * so `ttl = None` runs `TimeMode.None` with non-expiring state.
  */
object FeatureStream {

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + t.getNanos / 1000 % 1000

  /** State handle wiring shared by both processors. */
  private def openState(h: StatefulProcessorHandle,
                        ttl: Option[java.time.Duration]): ValueState[FeatureAgg] =
    h.getValueState[FeatureAgg]("agg", Encoders.product[FeatureAgg],
      ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

  /** The serving fold shared by both processors: emit each event's
    * features BEFORE folding it in — strictly-prior, zero leakage. */
  private def foldRows(agg: ValueState[FeatureAgg], user: Long,
                       rows: Iterator[FeatureEvent]): Iterator[FeatureOut] = {
    val sorted = rows.toList.sortBy(e => (micros(e.ts), e.value))
    val out = List.newBuilder[FeatureOut]
    var st = if (agg.exists()) agg.get() else FeatureAgg(0L, 0.0, -1L, 0.0)
    for (e <- sorted) {
      val t = micros(e.ts)
      out += FeatureOut(user, e.ts, st.n, st.total,
        if (st.n == 0L) None else Some(st.lastVal),
        if (st.n == 0L) None else Some(t - st.lastTsUs))
      st = FeatureAgg(st.n + 1L, st.total + e.value, t, e.value)
    }
    agg.update(st)
    out.result().iterator
  }

  /** The processor: one ValueState[FeatureAgg] per user, TTL-expired
    * by the store itself after `ttl` of no writes (when set). */
  private class OnlineFeatureProcessor(ttl: Option[java.time.Duration])
      extends StatefulProcessor[Long, FeatureEvent, FeatureOut] {
    @transient private var agg: ValueState[FeatureAgg] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = openState(getHandle, ttl)
    override def handleInputRows(user: Long, rows: Iterator[FeatureEvent],
                                 tv: TimerValues): Iterator[FeatureOut] =
      foldRows(agg, user, rows)
  }

  /** Backfill variant: identical serving fold, but the per-user state
    * is SEEDED from an offline snapshot before the first micro-batch
    * (`handleInitialState` runs once per backfilled key). */
  private class BackfilledFeatureProcessor(ttl: Option[java.time.Duration])
      extends StatefulProcessorWithInitialState[
        Long, FeatureEvent, FeatureOut, FeatureAgg] {
    @transient private var agg: ValueState[FeatureAgg] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = openState(getHandle, ttl)
    override def handleInitialState(user: Long, snapshot: FeatureAgg,
                                    tv: TimerValues): Unit =
      agg.update(snapshot)
    override def handleInputRows(user: Long, rows: Iterator[FeatureEvent],
                                 tv: TimerValues): Iterator[FeatureOut] =
      foldRows(agg, user, rows)
  }

  /** Per-event point-in-time features for a stream of `FeatureEvent`s.
    * Requires the RocksDB state store provider (transformWithState
    * contract). `ttl` opts into processing-time state expiry — see the
    * continuous-trigger caveat above. */
  def onlineFeatures(events: Dataset[FeatureEvent],
                     ttl: Option[java.time.Duration] = None)
      : Dataset[FeatureOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new OnlineFeatureProcessor(ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** [[onlineFeatures]] warm-started from an OFFLINE backfill — the
    * standard feature-store bootstrap: the batch side computes each
    * user's running aggregate over history once (no need to replay
    * months of events through the stream), the online side continues
    * from exactly that state. Snapshot contract: `backfill` must hold
    * the state the serving fold would have reached at the cutover —
    * i.e. fold history in (ts, value) order (the caller owns that; a
    * partial-agg batch sum can differ in the last ULP from the
    * sequential fold, which matters only if bit-continuity with a
    * history replay is asserted, as the spec does). */
  def onlineFeaturesFrom(events: Dataset[FeatureEvent],
                         backfill: Dataset[FeatureSnapshot],
                         ttl: Option[java.time.Duration] = None)
      : Dataset[FeatureOut] = {
    import events.sparkSession.implicits._
    val initial = backfill.groupByKey(_.user_id)
      .mapValues(s => FeatureAgg(s.n, s.total, s.lastTsUs, s.lastVal))
    events
      .groupByKey(_.user_id)
      .transformWithState(new BackfilledFeatureProcessor(ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append(), initial)
  }
}
