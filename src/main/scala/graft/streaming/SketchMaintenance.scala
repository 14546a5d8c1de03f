package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.index.SketchStore

/** Streaming distinct-count sketches (the 24th maintainer —
  * `SketchStore`'s ingest twin, TrendMaintenance's shape with native
  * Datasketches HLL instead of Misra–Gries): the event log arrives as
  * a stream, and "distinct users by type, any day window" must be
  * servable at all times without re-scanning history. Each micro-batch
  * reduces to per-(event_type, day) HLL sketch rows — the SAME
  * `SketchStore.dailySketches` code the batch artifact builds with —
  * appended to a ledger; serving UNIONS the committed rows
  * (`hll_union_agg`, associative + commutative + IDEMPOTENT), so a day
  * split across any number of micro-batches serves exactly what a
  * one-shot build of the union would.
  *
  * Scale shape: per batch the cluster shuffles (keys × days-in-batch)
  * sketch partials (the raw user_id stream never moves); the ledger
  * grows by that many ~4 KB rows per batch and [[compact]] folds it
  * back to O(keys × days); the serve path is a ledger scan + O(keys)
  * aggregation — never the event stream.
  *
  * Delivery: commit-marker replay-skip, the ChunkDedup/TrendMaintenance
  * contract (`checkpointDir` must be durable so batch ids stay
  * stable). Unlike Misra–Gries, a duplicate HLL row-set under one
  * batch_id would serve the SAME estimate (idempotent union) — the
  * orphan-adopt protocol is still kept so the n_rows audit column and
  * ledger growth stay honest. lgK is fixed per ledger and RECORDED in
  * a `<sketchTable>_stats` side table on first append (the SketchStore
  * convention): a mismatched append is refused loudly BEFORE any row
  * lands — not left for `hll_union_agg(_, false)` to reject at serve
  * time, when the poisoned rows are already in the ledger.
  */
object SketchMaintenance {

  private def statsTable(sketchTable: String) = sketchTable + "_stats"

  /** Validate-or-record the ledger's lgK. First writer records it;
    * every later append must match — refused before any sketch row is
    * written, so a misconfigured maintainer can never poison serving. */
  private def checkLgK(spark: SparkSession, sketchTable: String,
                       lgK: Int): Unit = {
    import spark.implicits._
    val st = statsTable(sketchTable)
    // headOption, not head(): a stats table that EXISTS but is EMPTY
    // (crash between saveAsTable's metadata commit and the row write,
    // or a partial warehouse reset) must re-record, not throw a bare
    // NoSuchElementException at the next honest append (round-16
    // ADVICE)
    val recorded =
      if (spark.catalog.tableExists(st))
        spark.table(st).select("lg_k").collect().headOption
          .map(_.getInt(0))
      else None
    recorded match {
      case Some(r) =>
        require(r == lgK,
          s"mixed-lgK append refused: ledger $sketchTable records " +
            s"lg_k=$r, this append offered lgK=$lgK — " +
            "hll_union_agg cannot merge mixed precisions; rebuild the " +
            "ledger to change lgK")
      case None =>
        graft.index.VectorStore.clearOrphanLocation(spark, st)
        Seq(lgK).toDF("lg_k").write.mode("overwrite").saveAsTable(st)
    }
  }

  /** Start the maintainer over streaming `newEvents` (`ts`,
    * `event_type`, `user_id`). */
  def maintain(newEvents: DataFrame, sketchTable: String,
               markerTable: String, checkpointDir: String,
               lgK: Int = SketchStore.DefaultLgK): StreamingQuery = {
    require(checkpointDir.nonEmpty,
      "SketchMaintenance.maintain requires a durable checkpointDir: " +
        "replay-skip markers are only valid against stable batch ids")
    newEvents.writeStream
      .outputMode("append")
      .queryName(Maintenance.queryNameFor(sketchTable))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, batchId, sketchTable, markerTable, lgK)
      }
      .start()
  }

  /** One micro-batch: reduce to (event_type, day) sketch rows, append
    * `(batch_id, event_type, day, sk, n_rows)`, marker LAST. Replay
    * adopts an orphan row-set (rows are only visible once the append
    * job committed, so partial visibility is impossible). */
  def appendBatch(batch: DataFrame, batchId: Long, sketchTable: String,
                  markerTable: String,
                  lgK: Int = SketchStore.DefaultLgK): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    recoverStaging(spark, sketchTable)
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (committed) return
    // after the replay-skip: a replayed already-committed batch must
    // be a pure no-op — it must not get to RECORD lgK as a side
    // effect on a fresh-stats ledger (round-16 ADVICE); the refusal
    // still fires before any sketch row lands below
    checkLgK(spark, sketchTable, lgK)
    val orphaned = spark.catalog.tableExists(sketchTable) &&
      !spark.table(sketchTable).filter(col("batch_id") === batchId).isEmpty
    val n = batch.count()
    if (!orphaned) {
      graft.index.VectorStore.clearOrphanLocation(spark, sketchTable)
      SketchStore.dailySketches(batch, lgK)
        .select(lit(batchId).as("batch_id"), col("event_type"),
          col("day"), col("sk"), col("n_rows"))
        .write.mode("append").saveAsTable(sketchTable)
    }
    graft.index.VectorStore.clearOrphanLocation(spark, markerTable)
    Seq((batchId, n)).toDF("batch_id", "n_events")
      .write.mode("append").saveAsTable(markerTable)
  }

  /** Distinct-user estimates per event_type from COMMITTED ledger rows
    * only, optionally over a day window: (event_type, n_distinct_est).
    * Empty-typed before the first commit. */
  def servedDistinct(spark: SparkSession, sketchTable: String,
                     markerTable: String,
                     fromDay: Option[Column] = None,
                     toDay: Option[Column] = None): DataFrame = {
    Freshness.refresh(spark, sketchTable, markerTable)
    recoverStaging(spark, sketchTable)
    if (!spark.catalog.tableExists(sketchTable) ||
        !spark.catalog.tableExists(markerTable))
      return spark.range(0).select(
        col("id").cast("string").as("event_type"),
        col("id").as("n_distinct_est"))
    val committed = spark.table(sketchTable)
      .join(broadcast(spark.table(markerTable).select("batch_id")),
        Seq("batch_id"), "left_semi")
    val ranged = (fromDay.map(col("day") >= _) ++
        toDay.map(col("day") <= _))
      .foldLeft(committed)((d, p) => d.filter(p))
    ranged.groupBy("event_type")
      .agg(hll_sketch_estimate(
        hll_union_agg(col("sk"), lit(false))).as("n_distinct_est"))
  }

  /** User-level erasure for the LEDGER (SketchStore.eraseUsers'
    * streaming twin): HLL cannot delete a member, so the victims'
    * days are re-sketched from the gated source and REPLACE every
    * ledger row of those days, whatever batch wrote them; unaffected
    * days are carried verbatim. Stage-then-swap under the compact
    * protocol. Contract: maintenance window with the maintainer
    * stopped AND fully committed — an uncommitted orphan row-set
    * could re-introduce a victim when a later replay adopts it, so
    * orphans here are REFUSED loudly, not silently carried. `events`
    * is the live source (victim rows still present name the affected
    * days; the rebuild reads only the gated remainder). */
  def purgeUsers(spark: SparkSession, events: DataFrame,
                 sketchTable: String, markerTable: String,
                 userIds: Seq[Long],
                 lgK: Int = SketchStore.DefaultLgK): Unit = {
    if (userIds.isEmpty) return
    recoverStaging(spark, sketchTable)
    if (!spark.catalog.tableExists(sketchTable) ||
        !spark.catalog.tableExists(markerTable)) return
    checkLgK(spark, sketchTable, lgK)
    val markers = spark.table(markerTable).select("batch_id")
    val t = spark.table(sketchTable)
    // orphan check BEFORE any early return: an all-orphan ledger (rows
    // appended, marker never committed — markers empty, table not) must
    // refuse loudly here, not silently no-op an erasure request while
    // victim data remains in the sketch table
    require(t.join(broadcast(markers), Seq("batch_id"), "left_anti")
      .isEmpty,
      s"purgeUsers on $sketchTable: uncommitted orphan row-set present " +
        "— a later replay would adopt it and re-introduce the victim; " +
        "run in a maintenance window after the maintainer committed")
    if (markers.isEmpty) return // ledger provably empty (require above)
    val affected = events
      .filter(col("user_id").isin(userIds: _*))
      .select(to_date(date_trunc("DAY", col("ts"))).as("day"))
      .distinct()
      .collect().map(_.getDate(0)).toSeq // bounded: request-sized days
    if (affected.isEmpty) return
    val tag = markers.agg(max("batch_id")).head().getLong(0)
    val fresh = SketchStore.dailySketches(
        events.filter(!col("user_id").isin(userIds: _*))
          .filter(to_date(date_trunc("DAY", col("ts")))
            .isin(affected.map(_.toString): _*)),
        lgK)
      .select(lit(tag).as("batch_id"), col("event_type"), col("day"),
        col("sk"), col("n_rows"))
    val kept = t.filter(!col("day").isin(affected.map(_.toString): _*))
      .select("batch_id", "event_type", "day", "sk", "n_rows")
    val staging = sketchTable + "_staging"
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    graft.index.VectorStore.clearOrphanLocation(spark, staging)
    kept.unionAll(fresh)
      .write.mode("overwrite").saveAsTable(staging)
    spark.sql(s"DROP TABLE IF EXISTS $sketchTable")
    spark.sql(s"ALTER TABLE $staging RENAME TO $sketchTable")
  }

  /** Fold the committed ledger back to ONE row per (event_type, day)
    * under the max committed batch tag — serving before/after is
    * identical because union is associative and the serve path IS a
    * union. Orphan row-sets (marker never landed) are carried through
    * VERBATIM so a later replay can still adopt them. Stage-then-swap
    * with [[recoverStaging]] healing at every entry point; run in a
    * maintenance window (maintainer stopped), the TrendMaintenance
    * contract. */
  def compact(spark: SparkSession, sketchTable: String,
              markerTable: String): Unit = {
    recoverStaging(spark, sketchTable)
    if (!spark.catalog.tableExists(sketchTable) ||
        !spark.catalog.tableExists(markerTable)) return
    val markers = spark.table(markerTable).select("batch_id")
    if (markers.isEmpty) return
    val tag = markers.agg(max("batch_id")).head().getLong(0)
    val t = spark.table(sketchTable)
    val folded = t
      .join(broadcast(markers), Seq("batch_id"), "left_semi")
      .groupBy("event_type", "day")
      .agg(hll_union_agg(col("sk"), lit(false)).as("sk"),
        sum("n_rows").as("n_rows"))
      .select(lit(tag).as("batch_id"), col("event_type"), col("day"),
        col("sk"), col("n_rows"))
    val orphans = t
      .join(broadcast(markers), Seq("batch_id"), "left_anti")
      .select("batch_id", "event_type", "day", "sk", "n_rows")
    val staging = sketchTable + "_staging"
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    graft.index.VectorStore.clearOrphanLocation(spark, staging)
    folded.unionAll(orphans)
      .write.mode("overwrite").saveAsTable(staging)
    spark.sql(s"DROP TABLE IF EXISTS $sketchTable")
    spark.sql(s"ALTER TABLE $staging RENAME TO $sketchTable")
  }

  /** Crash recovery for [[compact]]'s stage-then-swap (the staged
    * ledger is complete by the time the live table is dropped). */
  private def recoverStaging(spark: SparkSession,
                             sketchTable: String): Unit = {
    val staging = sketchTable + "_staging"
    if (!spark.catalog.tableExists(sketchTable) &&
        spark.catalog.tableExists(staging))
      spark.sql(s"ALTER TABLE $staging RENAME TO $sketchTable")
  }

  /** Total events across committed batches — the audit surface. */
  def streamLength(spark: SparkSession, markerTable: String): Long = {
    Freshness.refresh(spark, markerTable)
    if (!spark.catalog.tableExists(markerTable)) 0L
    else spark.table(markerTable)
      .agg(coalesce(sum("n_events"), lit(0L))).head().getLong(0)
  }
}
