package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.DedupStore
import graft.streaming.{ComponentMaintenance, DedupMaintenance}

/** End-to-end streaming dedup ARC: crawl batches → `DedupMaintenance`
  * (near-dup pair detection at arrival) → `ComponentMaintenance`
  * (incremental label fold of exactly those pairs). The composition
  * must equal the one-shot batch pipeline (dd03 pairs → dd06 closure)
  * over the same corpus — the claim that at 100 TB nothing ever
  * recomputes components from the full pair ledger is only honest if
  * the incremental fold of the REAL detector's increments lands on the
  * batch answer.
  */
class StreamingDedupArcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("streamed pairs folded incrementally == batch dd06 closure") {
    import spark.implicits._
    TestWarehouse.reset(spark,
      "arc_store_shingles", "arc_store_sigs", "arc_store_bands",
      "arc_pairs", "arc_marker",
      "arc_nodes", "arc_remap", "arc_cmk", "arc_nodesc", "arc_nodesc_staging")

    val docs = tables.load(spark, dir, "documents").select("doc_id", "text")
    DedupStore.build(docs.limit(0), "arc_store") // empty store: all streams
    val all = docs.as[(Long, String)].collect().sortBy(_._1).toSeq
    val batches = all.grouped((all.length + 2) / 3).toSeq

    batches.zipWithIndex.foreach { case (b, i) =>
      // the crawl's arrival: detector first, label fold second — the
      // label fold consumes exactly this batch's pair increment
      DedupMaintenance.appendBatch(b.toDF("doc_id", "text"), i.toLong,
        "arc_store", "arc_pairs", "arc_marker")
      val increment = spark.table("arc_pairs")
        .filter(col("batch_id") === i.toLong)
        .select("doc_a", "doc_b")
      ComponentMaintenance.appendBatch(increment, i.toLong,
        "arc_nodes", "arc_remap", "arc_cmk")
    }

    val streamed = ComponentMaintenance
      .labels(spark, "arc_nodes", "arc_remap", "arc_cmk")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch ground truth: minLabel over the FULL ledger, the dd06 path
    val batch = graft.operators.ConnectedComponents
      .minLabel(DedupMaintenance.allPairs(spark, "arc_pairs")
        .select("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    assert(batch.nonEmpty, "test premise: the corpus must have near-dups")
    assert(streamed == batch,
      "incremental fold of the detector's increments != batch closure")

    // and compaction of the label artifact keeps the equality
    ComponentMaintenance.compact(spark, "arc_nodes", "arc_remap", "arc_cmk")
    val afterCompact = ComponentMaintenance
      .labels(spark, "arc_nodes", "arc_remap", "arc_cmk")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(afterCompact == batch, "label compaction changed the closure")

    TestWarehouse.reset(spark,
      "arc_store_shingles", "arc_store_sigs", "arc_store_bands",
      "arc_pairs", "arc_marker",
      "arc_nodes", "arc_remap", "arc_cmk", "arc_nodesc")
  }
}
