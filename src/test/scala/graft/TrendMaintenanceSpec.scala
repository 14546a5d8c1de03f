package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.TrendMaintenance

/** The streamed Misra–Gries ledger must keep the MG guarantees for the
  * WHOLE stream (mergeable summaries): after streaming a corpus in
  * micro-batches, the merged sketch (a) contains every token whose true
  * count exceeds n/(k+1), and (b) estimates within [true − n/(k+1),
  * true]. Plus the maintainer contracts: replayed batches are no-ops,
  * an absent ledger serves empty.
  */
class TrendMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val K = 8

  // skewed corpus: "alpha" dominates, "beta"/"gamma" frequent, a long
  // tail of singletons spread across batches so cross-batch merging is
  // what establishes the heavy set
  private val batches: Seq[Seq[(Long, String)]] = Seq(
    Seq((1L, "alpha alpha alpha beta gamma tail1 tail2"),
        (2L, "alpha beta gamma tail3")),
    Seq((3L, "alpha alpha beta gamma tail4 tail5 tail6"),
        (4L, "alpha beta tail7")),
    Seq((5L, "alpha alpha alpha beta gamma gamma tail8 tail9")))

  private def exactCounts: Map[String, Long] =
    batches.flatten.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (t, g) => t -> g.size.toLong }

  test("streamed sketch keeps the whole-stream MG bounds") {
    import spark.implicits._
    val st = "trend_sketch"
    val mt = "trend_marker"
    TestWarehouse.reset(spark, st, mt)

    val stream = MemoryStream[(Long, String)](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-tm-ckpt").toString
    val q = TrendMaintenance.maintain(
      stream.toDF().toDF("doc_id", "text"), st, mt, ckpt, K)
    try batches.foreach { b =>
      stream.addData(b: _*)
      q.processAllAvailable()
    } finally q.stop()

    val exact = exactCounts
    val n = TrendMaintenance.streamLength(spark, mt)
    assert(n == exact.values.sum, "marker ledger must track stream length")
    val bound = n / (K + 1)

    val sketch = TrendMaintenance.heavyHitters(spark, st, mt, K)
    val est = sketch.map(e => e.item -> e.est).toMap
    assert(sketch.size <= K)
    // (a) completeness: every true-heavy token survives the merges
    for ((t, c) <- exact if c > bound)
      assert(est.contains(t), s"heavy token $t (count $c > $bound) missing")
    // (b) per-entry error band
    for ((t, e) <- est) {
      val c = exact(t)
      assert(e <= c, s"$t overestimated: $e > $c")
      assert(e >= c - bound, s"$t underestimated: $e < $c - $bound")
    }
    // the dominant token is actually ranked first
    assert(sketch.head.item == "alpha")
  }

  test("a replayed micro-batch is a no-op (commit marker)") {
    import spark.implicits._
    val st = "trend_sketch_replay"
    val mt = "trend_marker_replay"
    TestWarehouse.reset(spark, st, mt)

    val b = batches.head.toDF("doc_id", "text")
    TrendMaintenance.appendBatch(b, 0L, st, mt, K)
    val once = TrendMaintenance.heavyHitters(spark, st, mt, K)
    val nOnce = TrendMaintenance.streamLength(spark, mt)
    TrendMaintenance.appendBatch(b, 0L, st, mt, K) // replay
    assert(TrendMaintenance.heavyHitters(spark, st, mt, K) == once)
    assert(TrendMaintenance.streamLength(spark, mt) == nOnce)
    assert(once.nonEmpty)
  }

  test("compaction folds the ledger to O(k) rows, serving unchanged") {
    import spark.implicits._
    val st = "trend_sketch_compact"
    val mt = "trend_marker_compact"
    TestWarehouse.reset(spark, st, mt)
    batches.zipWithIndex.foreach { case (b, i) =>
      TrendMaintenance.appendBatch(b.toDF("doc_id", "text"), i.toLong,
        st, mt, K)
    }
    val before = TrendMaintenance.heavyHitters(spark, st, mt, K)
    val rowsBefore = spark.table(st).count()
    TrendMaintenance.compact(spark, st, mt, K)
    assert(spark.table(st).count() <= K.toLong,
      "compacted ledger must be O(k) rows")
    assert(spark.table(st).count() < rowsBefore, "compaction must shrink")
    assert(TrendMaintenance.heavyHitters(spark, st, mt, K) == before,
      "serving must be identical before and after compaction")
    assert(TrendMaintenance.streamLength(spark, mt) == exactCounts.values.sum,
      "stream length must survive compaction")
    // a replayed pre-compaction batch is still marker-skipped
    TrendMaintenance.appendBatch(batches.head.toDF("doc_id", "text"), 0L,
      st, mt, K)
    assert(TrendMaintenance.heavyHitters(spark, st, mt, K) == before,
      "replay after compaction must be a no-op")
  }

  test("serve path runs as an executor-side aggregation, not a driver fold") {
    import spark.implicits._
    val st = "trend_sketch_agg"
    val mt = "trend_marker_agg"
    TestWarehouse.reset(spark, st, mt)
    batches.zipWithIndex.foreach { case (b, i) =>
      TrendMaintenance.appendBatch(b.toDF("doc_id", "text"), i.toLong,
        st, mt, K)
    }
    // the serve plan is a real aggregation over the ledger join — the
    // driver only ever receives the single O(k) merged map
    val frame = TrendMaintenance.mergedSketchFrame(spark, st, mt, K)
    val plan = frame.queryExecution.executedPlan.toString
    assert(plan.contains("Aggregate"),
      s"serve path must plan an aggregate, got:\n$plan")

    // exact equality with the ordered driver fold on a corpus whose
    // distinct tokens fit in k: no merge ever truncates, so the MG
    // merge degenerates to a commutative map-sum and ANY merge order
    // (executor partial/final included) must reproduce the reference
    // fold bit-for-bit
    val st2 = "trend_sketch_agg_eq"
    val mt2 = "trend_marker_agg_eq"
    TestWarehouse.reset(spark, st2, mt2)
    val small: Seq[Seq[(Long, String)]] = Seq(
      Seq((1L, "a a b c"), (2L, "a d e")),
      Seq((3L, "b b c d"), (4L, "a a e")),
      Seq((5L, "c d e a b")))
    small.zipWithIndex.foreach { case (b, i) =>
      TrendMaintenance.appendBatch(b.toDF("doc_id", "text"), i.toLong,
        st2, mt2, K)
    }
    val agg = new graft.operators.HeavyHitters(K)
    val reference = agg.finish(
      spark.table(st2).collect()
        .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
        .map { case (_, rows) =>
          rows.map(r => r.getString(1) -> r.getLong(2)).toMap
        }
        .foldLeft(agg.zero)(agg.merge))
    assert(TrendMaintenance.heavyHitters(spark, st2, mt2, K) == reference,
      "executor-side serve must equal the driver-order fold")
  }

  test("compact carries crash-window orphan rows through the rewrite") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val st = "trend_sketch_orphan"
    val mt = "trend_marker_orphan"
    TestWarehouse.reset(spark, st, mt)
    batches.zipWithIndex.foreach { case (b, i) =>
      TrendMaintenance.appendBatch(b.toDF("doc_id", "text"), i.toLong,
        st, mt, K)
    }
    // simulate an appendBatch caught between its two writes: sketch
    // rows for batch 99 landed, marker did not
    Seq((99L, "alpha", 3L), (99L, "beta", 1L))
      .toDF("batch_id", "item", "est")
      .write.mode("append").saveAsTable(st)
    val before = TrendMaintenance.heavyHitters(spark, st, mt, K)

    TrendMaintenance.compact(spark, st, mt, K)
    assert(spark.table(st).filter(col("batch_id") === 99L).count() == 2,
      "compaction must carry uncommitted rows through verbatim")
    assert(TrendMaintenance.heavyHitters(spark, st, mt, K) == before,
      "uncommitted rows must still not serve after compaction")

    // the in-flight batch finishes (its replay writes only the
    // marker): the carried rows are adopted, not recomputed
    TrendMaintenance.appendBatch(batches.head.toDF("doc_id", "text"), 99L,
      st, mt, K)
    assert(spark.table(st).filter(col("batch_id") === 99L).count() == 2,
      "adoption after compaction must not append a second row-set")
    val est = TrendMaintenance.heavyHitters(spark, st, mt, K)
      .map(e => e.item -> e.est).toMap
    assert(est("alpha") >= before.map(e => e.item -> e.est).toMap.apply("alpha"),
      "the adopted batch must now contribute to serving")
    assert(TrendMaintenance.streamLength(spark, mt) >
      exactCounts.values.sum, "the adopted batch's marker must count")
  }

  test("crash between compact's drop and rename is healed on next use") {
    import spark.implicits._
    val st = "trend_sketch_swap"
    val mt = "trend_marker_swap"
    TestWarehouse.reset(spark, st, mt)
    spark.sql(s"DROP TABLE IF EXISTS ${st}_staging")
    batches.zipWithIndex.foreach { case (b, i) =>
      TrendMaintenance.appendBatch(b.toDF("doc_id", "text"), i.toLong,
        st, mt, K)
    }
    val before = TrendMaintenance.heavyHitters(spark, st, mt, K)
    // simulate the crash window: ledger fully staged, original dropped,
    // rename never ran
    spark.table(st).write.mode("overwrite").saveAsTable(s"${st}_staging")
    spark.sql(s"DROP TABLE $st")
    assert(TrendMaintenance.heavyHitters(spark, st, mt, K) == before,
      "serve must adopt the staged ledger after a mid-swap crash")
    assert(spark.catalog.tableExists(st) &&
      !spark.catalog.tableExists(s"${st}_staging"),
      "recovery must complete the rename")
  }

  test("absent ledger serves empty, not an error") {
    assert(TrendMaintenance.heavyHitters(spark, "trend_never_made", "trend_marker_never", K).isEmpty)
    assert(TrendMaintenance.streamLength(spark, "trend_marker_never") == 0L)
  }

  test("restart from the checkpoint continues batch ids, no replay dups") {
    // the docstring's contract: batch ids are only stable across
    // restarts when the query resumes from the same durable checkpoint
    // — a MemoryStream is not replayable across query instances, so
    // this uses the file source like the sessionize restart proof
    import spark.implicits._
    val st = "trend_sketch_restart"
    val mt = "trend_marker_restart"
    TestWarehouse.reset(spark, st, mt)
    val base = java.nio.file.Files.createTempDirectory("graft-tm-restart")
    val inDir = base.resolve("in"); val ckpt = base.resolve("chk").toString
    java.nio.file.Files.createDirectories(inDir)

    def writeWave(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("tm-wave")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").json(tmp.toString)
      val part = java.nio.file.Files.list(tmp)
        .filter(_.toString.endsWith(".json")).findFirst().get()
      java.nio.file.Files.copy(part, inDir.resolve(name))
    }
    def runOnce(): Unit = {
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING")
      val in = spark.readStream.schema(schema).json(inDir.toString)
      val q = in.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          TrendMaintenance.appendBatch(b, id, st, mt, K)
        }
        .start()
      q.awaitTermination(120000)
    }

    // one wave per query instance: each restart must CONTINUE the
    // batch-id sequence (a reset-to-0 instance would be marker-skipped
    // and silently drop its wave)
    batches.zipWithIndex.foreach { case (b, i) =>
      writeWave(s"w$i.json", b); runOnce()
    }

    val n = TrendMaintenance.streamLength(spark, mt)
    assert(n == exactCounts.values.sum,
      s"restart lost or re-skipped a batch: streamed $n tokens of " +
        exactCounts.values.sum)
    val batchIds = spark.table(mt).select("batch_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(batchIds == batchIds.distinct, "duplicate batch ids after restart")
    assert(batchIds.size == 3, s"expected 3 committed batches: $batchIds")
  }

  test("crash window: orphan sketch rows don't serve; replay adopts them") {
    import spark.implicits._
    val st = "trend_sketch_crash"
    val mt = "trend_marker_crash"
    TestWarehouse.reset(spark, st, mt)

    // simulate a crash between the two writes: sketch rows landed,
    // marker did not (write rows directly, as appendBatch would have)
    Seq((0L, "alpha", 3L), (0L, "beta", 1L)).toDF("batch_id", "item", "est")
      .write.mode("append").saveAsTable(st)
    assert(TrendMaintenance.heavyHitters(spark, st, mt, K).isEmpty,
      "uncommitted sketch rows must not serve")

    // replay of the same batch: adopt the orphan rows, marker only —
    // no second row-set under the same batch_id
    val b = batches.head.toDF("doc_id", "text")
    TrendMaintenance.appendBatch(b, 0L, st, mt, K)
    assert(spark.table(st).filter(org.apache.spark.sql.functions
      .col("batch_id") === 0L).count() == 2,
      "replay must not append a duplicate sketch row-set")
    val served = TrendMaintenance.heavyHitters(spark, st, mt, K)
    assert(served.map(e => e.item -> e.est).toMap ==
      Map("alpha" -> 3L, "beta" -> 1L),
      "adopted orphan sketch must serve after the marker lands")
  }
}
