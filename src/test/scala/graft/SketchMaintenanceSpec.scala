package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.index.SketchStore
import graft.streaming.SketchMaintenance

/** The streamed sketch ledger must serve exactly what a one-shot
  * SketchStore build of the same rows serves (union invariance across
  * any micro-batching — including a day split across batches), skip
  * replayed batches, adopt an orphan row-set without duplicating it,
  * and compact without changing what serves (orphans carried).
  */
class SketchMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def eventRows: Seq[(java.sql.Timestamp, String, Long)] = {
    import spark.implicits._
    tables.load(spark, dir, "events")
      .select(col("ts"), col("event_type"), col("user_id"))
      .as[(java.sql.Timestamp, String, Long)]
      .collect().sortBy(_._1.getTime).toSeq // bounded: sf0.001 = 1k rows
  }

  private def servedMap(st: String, mt: String): Map[String, Long] = {
    import spark.implicits._
    SketchMaintenance.servedDistinct(spark, st, mt)
      .as[(String, Long)].collect().toMap
  }

  private def storeMap(name: String): Map[String, Long] = {
    import spark.implicits._
    SketchStore.serveDistinct(spark, name)
      .as[(String, Long)].collect().toMap
  }

  test("streamed ledger serves == one-shot store build; " +
      "replay no-op; compact preserves serving") {
    import spark.implicits._
    val (st, mt) = ("skm_sketch", "skm_marker")
    TestWarehouse.reset(spark, st, mt, s"${st}_staging", s"${st}_stats",
      "skm_ref_sketches", "skm_ref_stats")
    val rows = eventRows
    // three batches cut MID-DAY (time-ordered rows split unevenly), so
    // day rows span batches and only the union property makes serving
    // correct
    val cuts = Seq(rows.size / 3 + 7, 2 * rows.size / 3 + 3)
    val batches = Seq(rows.take(cuts(0)),
      rows.slice(cuts(0), cuts(1)), rows.drop(cuts(1)))

    val stream = MemoryStream[(java.sql.Timestamp, String, Long)](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-skm-ckpt").toString
    val q = SketchMaintenance.maintain(
      stream.toDF().toDF("ts", "event_type", "user_id"), st, mt, ckpt)
    try batches.foreach { b =>
      stream.addData(b: _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(SketchMaintenance.streamLength(spark, mt) == rows.size.toLong)

    // one-shot batch-artifact twin over the same rows
    SketchStore.build(
      rows.toDF("ts", "event_type", "user_id"), "skm_ref")
    val ref = storeMap("skm_ref")
    assert(servedMap(st, mt) == ref,
      "streamed ledger serves differently from a one-shot store build")

    // replay of a committed batch: ledger + marker unchanged
    val ledger0 = spark.table(st).count()
    SketchMaintenance.appendBatch(
      batches(1).toDF("ts", "event_type", "user_id"), 1L, st, mt)
    assert(spark.table(st).count() == ledger0, "replay appended rows")
    assert(spark.table(mt).count() == 3, "replay wrote a second marker")

    // compact folds to one row per (event_type, day), serving unchanged
    val before = servedMap(st, mt)
    SketchMaintenance.compact(spark, st, mt)
    assert(servedMap(st, mt) == before, "compaction changed serving")
    val dup = spark.table(st).groupBy("event_type", "day")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    assert(dup == 0, "compaction left multi-row (event_type, day) pairs")
    assert(servedMap(st, mt) == ref,
      "compacted ledger drifted from the one-shot build")
  }

  test("orphan row-set is adopted, not duplicated; crashed compact " +
      "swap heals at serve") {
    import spark.implicits._
    val (st, mt) = ("skmo_sketch", "skmo_marker")
    TestWarehouse.reset(spark, st, mt, s"${st}_staging", s"${st}_stats")
    val rows = eventRows
    val (b0, b1) = rows.splitAt(rows.size / 2)
    SketchMaintenance.appendBatch(
      b0.toDF("ts", "event_type", "user_id"), 0L, st, mt)

    // crash window: batch 1's sketch rows land, the marker doesn't —
    // they must not serve (uncommitted), and the replay must ADOPT
    // them instead of appending a second row-set. (The per-type user
    // sets saturate in b0 at this SF, so the committed-serve check
    // pins DAY coverage, which only batch 1 extends.)
    def committedDays: Long = spark.table(st)
      .join(spark.table(mt).select("batch_id"), Seq("batch_id"),
        "left_semi")
      .select("day").distinct().count()
    SketchStore.dailySketches(
        b1.toDF("ts", "event_type", "user_id"), SketchStore.DefaultLgK)
      .select(lit(1L).as("batch_id"), col("event_type"), col("day"),
        col("sk"), col("n_rows"))
      .write.mode("append").saveAsTable(st)
    val orphanRows = spark.table(st)
      .filter(col("batch_id") === 1L).count()
    val daysB0 = committedDays
    SketchMaintenance.appendBatch(
      b1.toDF("ts", "event_type", "user_id"), 1L, st, mt)
    assert(spark.table(st).filter(col("batch_id") === 1L).count()
      == orphanRows, "replay duplicated the orphan row-set")
    assert(committedDays > daysB0,
      "adopted batch still not serving after its marker landed")

    // crashed compact swap: live table dropped, staging complete —
    // the next serve heals it
    spark.sql(s"ALTER TABLE $st RENAME TO ${st}_staging")
    val healed = servedMap(st, mt)
    assert(spark.catalog.tableExists(st), "serve did not heal staging")
    assert(healed == servedMap(st, mt))
  }

  test("purgeUsers rewrites the victims' days from the gated source; " +
      "refuses with an orphan pending") {
    import spark.implicits._
    val (st, mt) = ("skmp_sketch", "skmp_marker")
    TestWarehouse.reset(spark, st, mt, s"${st}_staging", s"${st}_stats",
      "skmp_ref_sketches", "skmp_ref_stats")
    val rows = eventRows
    val (b0, b1) = rows.splitAt(rows.size / 2)
    val all = rows.toDF("ts", "event_type", "user_id")
    SketchMaintenance.appendBatch(
      b0.toDF("ts", "event_type", "user_id"), 0L, st, mt)
    SketchMaintenance.appendBatch(
      b1.toDF("ts", "event_type", "user_id"), 1L, st, mt)

    val victims = all.select("user_id").distinct()
      .orderBy("user_id").limit(2).as[Long].collect().toSeq
    SketchMaintenance.purgeUsers(spark, all, st, mt, victims)
    SketchStore.build(
      all.filter(!col("user_id").isin(victims: _*)), "skmp_ref")
    assert(servedMap(st, mt) == storeMap("skmp_ref"),
      "purged ledger serves differently from a fresh gated build")

    // an uncommitted orphan row-set must make the purge refuse loudly
    SketchStore.dailySketches(
        b1.toDF("ts", "event_type", "user_id"), SketchStore.DefaultLgK)
      .select(lit(9L).as("batch_id"), col("event_type"), col("day"),
        col("sk"), col("n_rows"))
      .write.mode("append").saveAsTable(st)
    val e = intercept[IllegalArgumentException] {
      SketchMaintenance.purgeUsers(spark, all, st, mt, victims)
    }
    assert(e.getMessage.contains("orphan"),
      s"wrong refusal message: ${e.getMessage}")
  }

  test("mixed-lgK append is refused before any row lands; " +
      "an all-orphan ledger refuses an erasure request loudly") {
    import spark.implicits._
    val (st, mt) = ("skml_sketch", "skml_marker")
    TestWarehouse.reset(spark, st, mt, s"${st}_staging", s"${st}_stats")
    val rows = eventRows
    val all = rows.toDF("ts", "event_type", "user_id")
    SketchMaintenance.appendBatch(all, 0L, st, mt, lgK = 12)
    assert(spark.table(s"${st}_stats").select("lg_k").head().getInt(0)
      == 12, "first append did not record its lgK in the stats table")

    // a maintainer restarted with a different precision must be refused
    // at APPEND time — before its rows poison hll_union_agg at serve —
    // leaving ledger and markers exactly as they were
    val (ledger0, markers0) =
      (spark.table(st).count(), spark.table(mt).count())
    val e = intercept[IllegalArgumentException] {
      SketchMaintenance.appendBatch(all, 1L, st, mt, lgK = 11)
    }
    assert(e.getMessage.contains("mixed-lgK"),
      s"wrong refusal message: ${e.getMessage}")
    assert(spark.table(st).count() == ledger0,
      "refused append still wrote sketch rows")
    assert(spark.table(mt).count() == markers0,
      "refused append still wrote a marker")

    // all-orphan ledger: rows present, marker table exists but EMPTY
    // (crash before the first commit) — purgeUsers must refuse, not
    // silently no-op while victim data remains servable-on-adopt
    val (so, mo) = ("skml_o_sketch", "skml_o_marker")
    TestWarehouse.reset(spark, so, mo, s"${so}_staging", s"${so}_stats")
    Seq.empty[(Long, Long)].toDF("batch_id", "n_events")
      .write.mode("overwrite").saveAsTable(mo)
    SketchStore.dailySketches(all, SketchStore.DefaultLgK)
      .select(lit(0L).as("batch_id"), col("event_type"), col("day"),
        col("sk"), col("n_rows"))
      .write.mode("append").saveAsTable(so)
    val victims = all.select("user_id").limit(1).as[Long].collect().toSeq
    val e2 = intercept[IllegalArgumentException] {
      SketchMaintenance.purgeUsers(spark, all, so, mo, victims)
    }
    assert(e2.getMessage.contains("orphan"),
      s"wrong refusal message: ${e2.getMessage}")
  }
}
