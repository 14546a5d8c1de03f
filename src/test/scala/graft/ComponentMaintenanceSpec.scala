package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.ComponentMaintenance
import graft.operators.ConnectedComponents

/** The incremental connected-components maintainer (21st): streamed
  * labels must equal the one-shot batch closure over the same pair
  * stream — including CROSS-BATCH merges, where an edge arriving later
  * joins two components that were built in different batches — replay
  * must be a no-op, a crashed partial partition must be invisible then
  * overwritten whole, and compaction must be serve-invariant including
  * a merge that lands AFTER the fold (a tail remap must rewrite
  * compact-table rows at serve time).
  */
class ComponentMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val nt = "cm_nodes"
  private val rt = "cm_remap"
  private val mk = "cm_marker"

  private def resetAll(): Unit =
    TestWarehouse.reset(spark, nt, rt, mk, nt + "c", nt + "c_staging")

  private def served(): Map[Long, Long] =
    ComponentMaintenance.labels(spark, nt, rt, mk)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def oracle(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val l = ConnectedComponents.minLabel(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    l
  }

  test("streamed labels == batch closure; cross-batch merge; replay no-op") {
    import spark.implicits._
    resetAll()
    val b0 = Seq((1L, 2L), (3L, 4L))          // {1,2} {3,4}
    val b1 = Seq((5L, 6L), (10L, 10L))        // {5,6} {10} (self-pair)
    val b2 = Seq((2L, 3L), (6L, 7L))          // merges {1,2,3,4}; grows {5,6,7}
    val b3 = Seq((4L, 5L))                    // merges the two big components

    val stream = MemoryStream[(Long, Long)](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-cm-ckpt").toString
    val q = ComponentMaintenance.maintain(
      stream.toDF().toDF("doc_a", "doc_b"), nt, rt, mk, ckpt)
    try {
      stream.addData(b0: _*); q.processAllAvailable()
      stream.addData(b1: _*); q.processAllAvailable()
      assert(served() == oracle(b0 ++ b1))
      stream.addData(b2: _*); q.processAllAvailable()
      // cross-batch merge: component roots from different batches unify
      assert(served() == oracle(b0 ++ b1 ++ b2),
        "cross-batch merge produced wrong labels")
      stream.addData(b3: _*); q.processAllAvailable()
      assert(served() == oracle(b0 ++ b1 ++ b2 ++ b3),
        "chained merge across three batches produced wrong labels")
    } finally q.stop()

    // replay an already-committed batch id: marker makes it a no-op
    val before = served()
    ComponentMaintenance.appendBatch(
      Seq((99L, 98L)).toDF("doc_a", "doc_b"), 1L, nt, rt, mk)
    assert(served() == before, "replayed batch changed the labels")

    resetAll()
  }

  test("auto-fold cadence: labels identical at cadence 2 vs disabled") {
    import spark.implicits._
    // the serving contract of the cadence knob (round-14 verdict item
    // 4): appendBatch folding every-N-batches must serve EXACTLY the
    // labels the fold-free run serves, at every step — the cadence is
    // a cost knob, never a semantics knob. Ten batches with chained
    // cross-batch merges; cadence 2 folds repeatedly mid-stream.
    val batches: Seq[Seq[(Long, Long)]] = (0 until 10).map { i =>
      val base = i * 10L
      Seq((base + 1, base + 2), (base + 2, base + 11)) // chains into next
    }
    def runAt(cadence: Int, nt2: String, rt2: String,
              mk2: String): Seq[Map[Long, Long]] = {
      TestWarehouse.reset(spark, nt2, rt2, mk2, nt2 + "c",
        nt2 + "c_staging")
      batches.zipWithIndex.map { case (b, i) =>
        ComponentMaintenance.appendBatch(b.toDF("doc_a", "doc_b"),
          i.toLong, nt2, rt2, mk2, autoCompactParts = cadence)
        ComponentMaintenance.labels(spark, nt2, rt2, mk2)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
    }
    val folded = runAt(2, "cmf_nodes", "cmf_remap", "cmf_marker")
    val plain = runAt(Int.MaxValue, "cmp_nodes", "cmp_remap", "cmp_marker")
    assert(folded == plain,
      "auto-fold cadence changed served labels")
    // the cadence actually fired: the folded run's compact table exists
    // and its live tail is bounded by the cadence
    assert(spark.catalog.tableExists("cmf_nodesc"),
      "cadence 2 over 10 batches must have folded at least once")
    assert(!spark.catalog.tableExists("cmp_nodesc"),
      "disabled cadence must never fold")
    assert(folded.last == oracle(batches.flatten),
      "cadenced labels diverge from the one-shot closure")
    TestWarehouse.reset(spark, "cmf_nodes", "cmf_remap", "cmf_marker",
      "cmf_nodesc", "cmf_nodesc_staging", "cmp_nodes", "cmp_remap",
      "cmp_marker", "cmp_nodesc", "cmp_nodesc_staging")
  }

  test("kill between partition write and marker: replay heals exactly") {
    import spark.implicits._
    resetAll()
    ComponentMaintenance.appendBatch(
      Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b"), 0L, nt, rt, mk)

    // the crash window: batch 1's nodes partition lands PARTIALLY (one
    // of its two new nodes), no marker
    Seq((5L, 5L, 1L)).toDF("node", "root", "batch_id")
      .write.mode("append").partitionBy("batch_id").saveAsTable(nt)
    assert(!served().contains(5L),
      "serving leaked an uncommitted partial batch")

    // replay writes the partition whole and commits
    ComponentMaintenance.appendBatch(
      Seq((5L, 6L)).toDF("doc_a", "doc_b"), 1L, nt, rt, mk)
    assert(served() == oracle(Seq((1L, 2L), (3L, 4L), (5L, 6L))),
      "replay after a partial partition produced wrong labels")

    resetAll()
  }

  test("compact is serve-invariant; post-compact merge rewrites folded rows") {
    import spark.implicits._
    resetAll()
    ComponentMaintenance.appendBatch(
      Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b"), 0L, nt, rt, mk)
    ComponentMaintenance.appendBatch(
      Seq((2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b"), 1L, nt, rt, mk)
    val pre = served()
    assert(pre == oracle(Seq((1L, 2L), (3L, 4L), (2L, 3L), (7L, 8L))))

    ComponentMaintenance.compact(spark, nt, rt, mk)
    assert(served() == pre, "compaction changed served labels")
    assert(spark.table(nt).isEmpty && spark.table(rt).isEmpty,
      "compaction left committed partitions in the ledgers")

    // a merge AFTER the fold: its remap targets a root that now lives
    // only in the compact table — serving must still rewrite those rows
    ComponentMaintenance.appendBatch(
      Seq((4L, 7L)).toDF("doc_a", "doc_b"), 2L, nt, rt, mk)
    val all = Seq((1L, 2L), (3L, 4L), (2L, 3L), (7L, 8L), (4L, 7L))
    assert(served() == oracle(all),
      "post-compact merge failed to rewrite folded labels")

    // second compact folds the tail; still invariant, ledgers empty
    ComponentMaintenance.compact(spark, nt, rt, mk)
    assert(served() == oracle(all),
      "second compaction changed served labels")
    assert(spark.table(nt).isEmpty && spark.table(rt).isEmpty)

    // and maintenance continues cleanly on top of the compacted state
    ComponentMaintenance.appendBatch(
      Seq((8L, 9L)).toDF("doc_a", "doc_b"), 3L, nt, rt, mk)
    assert(served() == oracle(all :+ (8L, 9L)))

    resetAll()
  }
}
