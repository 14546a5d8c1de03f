package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.index.DedupStore
import graft.streaming.DedupMaintenance

/** The streamed near-dup ledger must agree with the batch operator:
  * after streaming a corpus in micro-batches over an initial store,
  * the pairs ledger holds exactly the dd03 pairs of the union corpus
  * that touch a streamed doc — each found the moment its later doc
  * arrived, without ever re-shingling the store. Same
  * batch-vs-streaming equality contract as the other maintainers.
  */
class DedupMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def reset(tables: String*): Unit =
    TestWarehouse.reset(spark, tables: _*)

  private def resetStore(name: String): Unit =
    reset(s"${name}_shingles", s"${name}_sigs", s"${name}_bands")

  test("streamed pairs ledger == batch dd03 pairs touching streamed docs") {
    import spark.implicits._
    resetStore("dm_store"); reset("dm_pairs", "dm_marker")
    val docs = tables.load(spark, dir, "documents").select("doc_id", "text")
    // store starts with the doc_id % 5 != 0 corpus; the rest streams
    // in two micro-batches split by parity
    DedupStore.build(docs.filter(col("doc_id") % 5 =!= 0), "dm_store")
    val streamed = docs.filter(col("doc_id") % 5 === 0)
      .as[(Long, String)].collect().toSeq
    val (b1, b2) = streamed.partition(_._1 % 2 == 0)

    val stream = MemoryStream[(Long, String)](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-dm-ckpt").toString
    val q = DedupMaintenance.maintain(stream.toDF().toDF("doc_id", "text"),
      "dm_store", "dm_pairs", "dm_marker", ckpt)
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val got = DedupMaintenance.allPairs(spark, "dm_pairs")
      .select(col("doc_a"), col("doc_b"),
        graft.functions.ParityFunctions.duckRound(col("jaccard"), 6)
          .as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // ground truth: the batch operator over the full corpus, keeping
    // pairs that touch a streamed (doc_id % 5 == 0) doc
    val expected = SparkEntry.queries("dd03_minhash_lsh")(spark, dir)
      .filter(col("doc_a") % 5 === 0 || col("doc_b") % 5 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(expected.nonEmpty, "test premise: the split must produce pairs")
    assert(got == expected)
    // and the stream left the store equal to a from-scratch build
    resetStore("dm_full")
    DedupStore.build(docs, "dm_full")
    for (t <- Seq("shingles", "sigs", "bands")) {
      val a = spark.table(s"dm_store_$t")
      val b = spark.table(s"dm_full_$t")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$t diverges between streamed-into and rebuilt store")
    }
  }

  test("a replayed micro-batch is a no-op (commit marker)") {
    import spark.implicits._
    resetStore("dmr_store"); reset("dmr_pairs", "dmr_marker")
    val docs = tables.load(spark, dir, "documents").select("doc_id", "text")
    DedupStore.build(docs.filter(col("doc_id") % 5 =!= 0), "dmr_store")
    val batch = docs.filter(col("doc_id") % 5 === 0)

    DedupMaintenance.appendBatch(batch, 0L, "dmr_store", "dmr_pairs",
      "dmr_marker")
    val once = DedupMaintenance.allPairs(spark, "dmr_pairs").count()
    val storeOnce = spark.table("dmr_store_shingles").count()
    assert(once > 0, "test premise: the batch must produce pairs")

    DedupMaintenance.appendBatch(batch, 0L, "dmr_store", "dmr_pairs",
      "dmr_marker")
    assert(DedupMaintenance.allPairs(spark, "dmr_pairs").count() == once,
      "replayed batch duplicated pair rows")
    assert(spark.table("dmr_store_shingles").count() == storeOnce,
      "replayed batch re-appended the store")
    assert(spark.table("dmr_marker").count() == 1)
  }

  test("empty ledger serves empty-but-typed") {
    reset("dm_absent")
    val df = DedupMaintenance.allPairs(spark, "dm_absent")
    assert(df.columns.toSeq == Seq("doc_a", "doc_b", "jaccard"))
    assert(df.isEmpty)
  }
}
