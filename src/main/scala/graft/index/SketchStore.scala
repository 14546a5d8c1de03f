package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-once/serve-many distinct-count sketches — the mergeable-
  * summary artifact behind q61/q62: one tiny Datasketches HLL sketch
  * per (event_type, day) materialized ONCE over the event log, then
  * any later distinct-user rollup (per key, across keys, a trailing
  * day window, month-to-date) is answered by UNIONING the stored
  * sketches — never by re-scanning rows. Union is associative,
  * commutative and IDEMPOTENT (HLL registers fold by max), so late
  * partitions fold in, re-unions are safe, and any grouping of the
  * per-day sketches serves the same estimate.
  *
  * At 100 TB this is the whole point: the event log is the biggest
  * table in the house, and "distinct users last week by type" must
  * not cost a log scan. The artifact is (keys × days) rows of ~2^lgK
  * bytes each — operational-sized forever — and serving is a scan of
  * the PRUNED day partitions plus an O(keys) aggregation.
  *
  * Error contract: lgK=12 → relative standard error 1.04/√4096 ≈
  * 1.63%; q61/q62 pin estimates inside a 4σ envelope against exact
  * counts at every test SF (`SketchStoreSpec` additionally pins
  * grouping-invariance: day-sketch unions == one-shot sketch).
  *
  * Erasure/correction seam: HLL cannot delete a member, so per-user
  * forget-me requests rebuild the affected DAYS from the (already
  * gated) source — [[rebuildDays]] is a dynamic partition overwrite,
  * O(victim days), never O(table). The streaming twin is
  * `graft.streaming.SketchMaintenance` (per-batch sketch ledger, same
  * union-at-serve shape).
  */
object SketchStore {

  /** Default sketch precision: 2^12 registers ≈ 1.63% RSE, ~4 KB per
    * sketch — the standard accuracy/size point. The lgK used at BUILD
    * time is recorded in the stats side table; appends and rebuilds
    * read it back (hll_union_agg refuses mixed-lgK unions, so a
    * mismatched append would poison serving). */
  val DefaultLgK = 12

  // one build per (JVM, sfDir): repeated queries in one session reuse
  // the artifact (the IndexStore convention)
  private val built = scala.collection.concurrent.TrieMap.empty[String, Unit]

  private def tag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def sketchName(name: String) = s"${name}_sketches"
  private def statsName(name: String) = s"${name}_stats"

  /** Per-(event_type, day) sketch rows of `events` (`ts`, `event_type`,
    * `user_id`): (event_type, day DATE, sk BINARY, n_rows). Map-side
    * partial sketches merge in the one (keys×days)-cardinality
    * shuffle; the user_id stream itself never moves. Shared with the
    * streaming twin (`SketchMaintenance`) — single source of truth, so
    * a ledger-served estimate equals a store-served one by
    * construction. */
  private[graft] def dailySketches(events: DataFrame, lgK: Int): DataFrame =
    events.groupBy(col("event_type"),
        to_date(date_trunc("DAY", col("ts"))).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sk"),
        count(lit(1)).as("n_rows"))

  /** Build (overwrite) the artifact for `events` under `name`:
    * `<name>_sketches` day-partitioned (serving windows prune to their
    * days), plus the one-row `<name>_stats` recording lgK. */
  def build(events: DataFrame, name: String,
            lgK: Int = DefaultLgK): Unit = {
    val spark = events.sparkSession
    import spark.implicits._
    // a crashed previous JVM may have left managed locations the fresh
    // derby catalog doesn't know — overwrite mode can't reuse those
    VectorStore.clearOrphanLocation(spark, statsName(name))
    VectorStore.clearOrphanLocation(spark, sketchName(name))
    Seq(lgK).toDF("lg_k")
      .write.mode("overwrite").saveAsTable(statsName(name))
    dailySketches(events, lgK)
      .write.mode("overwrite").partitionBy("day")
      .saveAsTable(sketchName(name))
  }

  /** The lgK the artifact was built with. */
  def recordedLgK(spark: SparkSession, name: String): Int =
    spark.table(statsName(name)).select("lg_k").head().getInt(0)

  /** Append sketch rows for NEW days (a nightly load). Caller contract:
    * `events` holds only days not yet in the artifact — same-day
    * re-appends would serve a double-counted day row pair (harmlessly
    * for the UNION estimate — idempotent — but the day's n_rows audit
    * column would lie); use [[rebuildDays]] to replace a day. */
  def appendDays(events: DataFrame, name: String): Unit =
    dailySketches(events, recordedLgK(events.sparkSession, name))
      .write.mode("append").partitionBy("day")
      .saveAsTable(sketchName(name))

  /** Replace the sketch rows of `days` from `events` (the erasure /
    * late-data correction seam): dynamic partition overwrite —
    * O(affected days), the rest of the artifact untouched. Pass the
    * already-gated source (erased users removed); a day with no
    * surviving rows writes nothing, so drop it explicitly. */
  def rebuildDays(events: DataFrame, name: String,
                  days: Seq[java.sql.Date]): Unit = {
    val spark = events.sparkSession
    val table = sketchName(name)
    val fresh = dailySketches(
      events.filter(to_date(date_trunc("DAY", col("ts")))
        .isin(days.map(_.toString): _*)),
      recordedLgK(spark, name))
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try fresh.select(spark.table(table).columns.map(col): _*)
      .write.mode("overwrite").insertInto(table)
    finally prior match {
      case Some(x) => spark.conf.set(key, x)
      case None    => spark.conf.unset(key)
    }
    // dynamic overwrite only touches partitions present in `fresh`: a
    // day whose every row was erased must be dropped, not kept stale.
    // IF EXISTS covers the benign already-gone case; any other failure
    // propagates — a swallowed drop would keep serving the erased
    // day's sketch, silently breaking the right-to-erasure contract —
    // and the post-drop check proves the partition actually stopped
    // serving before this returns
    val still = fresh.select("day").distinct()
      .collect().map(_.getDate(0).toString).toSet
    val erasedWhole = days.filterNot(d => still(d.toString))
    erasedWhole.foreach { d =>
      spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION (day='$d')")
    }
    if (erasedWhole.nonEmpty)
      require(spark.table(table)
        .filter(col("day").isin(erasedWhole.map(_.toString): _*)).isEmpty,
        s"rebuildDays on $table: fully-erased day partition(s) " +
          s"${erasedWhole.mkString(", ")} still serve rows after DROP " +
          "PARTITION — refusing to report the erasure complete")
  }

  /** User-level right-to-erasure, one call (the doc-side
    * `Erasure.enforceAll` convention applied to the event artifact):
    * find the days the victims appear in, rebuild exactly those
    * partitions from the gated source. `events` is the LIVE source
    * (victim rows still present — they name the affected days); the
    * rebuild itself reads only the gated remainder. Idempotent: a
    * replay finds no victim rows and rebuilds nothing. */
  def eraseUsers(events: DataFrame, name: String,
                 userIds: Seq[Long]): Unit = {
    if (userIds.isEmpty) return
    val affected = events
      .filter(col("user_id").isin(userIds: _*))
      .select(to_date(date_trunc("DAY", col("ts"))).as("day"))
      .distinct()
      .collect().map(_.getDate(0)).toSeq // bounded: request-sized days
    if (affected.isEmpty) return
    rebuildDays(events.filter(!col("user_id").isin(userIds: _*)),
      name, affected)
  }

  /** Distinct-user estimates per event_type from stored sketches,
    * optionally over a day window (partition-pruned): (event_type,
    * n_distinct_est). Zero event-log scans. */
  def serveDistinct(spark: SparkSession, name: String,
                    fromDay: Option[Column] = None,
                    toDay: Option[Column] = None): DataFrame = {
    val base = spark.table(sketchName(name))
    val ranged = (fromDay.map(col("day") >= _) ++
        toDay.map(col("day") <= _))
      .foldLeft(base)((d, p) => d.filter(p))
    ranged.groupBy("event_type")
      .agg(hll_sketch_estimate(
        hll_union_agg(col("sk"), lit(false))).as("n_distinct_est"))
  }

  /** The artifact table name for corpus `dir`, building on first use
    * in this JVM (the IndexStore serve-on-demand convention). */
  def tableFor(s: SparkSession, dir: String): String = {
    val name = s"graft_usersketch_${tag(dir)}"
    built.getOrElseUpdate(s.sparkContext.applicationId + "/" + name, {
      build(graft.tables.load(s, dir, "events")
        .select(col("ts"), col("event_type"), col("user_id")), name)
    })
    name
  }
}
