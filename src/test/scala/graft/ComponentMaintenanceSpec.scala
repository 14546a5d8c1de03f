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
