package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.queries.Dedup
import graft.streaming.RewriteDedup

/** The streaming dedup-rewriter (19th maintainer): streamed cleaned
  * corpus == one-shot batch dd20 under ascending arrival; a chunk
  * owned by an earlier batch drops from later ones; replay is a no-op;
  * a crashed partial output partition is overwritten whole on replay
  * and invisible to serving until the marker lands.
  */
class RewriteDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def reset(tables: String*): Unit =
    TestWarehouse.reset(spark, tables: _*)

  test("streamed clean corpus equals one-shot batch dd20") {
    import spark.implicits._
    reset("rw_out", "rw_ledger", "rw_marker")
    val docs = tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1).toSeq
    val (b1, rest) = rows.splitAt(rows.size / 3)
    val (b2, b3) = rest.splitAt(rest.size / 2)

    val stream = MemoryStream[(Long, String)](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-rw-ckpt").toString
    val q = RewriteDedup.maintain(stream.toDF().toDF("doc_id", "text"),
      "rw_out", "rw_ledger", "rw_marker", ckpt)
    try {
      Seq(b1, b2, b3).foreach { b =>
        stream.addData(b); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = RewriteDedup.cleaned(spark, "rw_out", "rw_marker")
      .select("doc_id", "n_chunks", "n_kept", "clean_text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3))).sortBy(_._1).toSeq
    val batch = Dedup.dedupRewriteOf(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3))).sortBy(_._1).toSeq
    assert(streamed.size == rows.size)
    assert(streamed == batch,
      "streamed rewrite diverged from the one-shot batch rewrite")
    // premise: the corpus actually shares chunks, so the rewrite DID
    // something (otherwise this test proves nothing)
    assert(batch.exists(r => r._3 < r._2),
      "test premise: some doc must lose a chunk to dedup")
    spark.catalog.clearCache()
  }

  test("ledger compaction: ownership survives the fold and a crashed swap") {
    import spark.implicits._
    reset("rz_out", "rz_ledger", "rz_ledgerc", "rz_ledgerc_staging",
      "rz_marker")
    val s1 = "the quick brown fox jumps over the lazy dog today"
    val s2 = "pack my box with five dozen fresh liquor jugs now"
    val s3 = "how vexingly quick daft zebras jump at dusk tonight friends"
    RewriteDedup.rewriteBatch(Seq((1L, s1)).toDF("doc_id", "text"),
      0L, "rz_out", "rz_ledger", "rz_marker")
    RewriteDedup.rewriteBatch(Seq((11L, s2)).toDF("doc_id", "text"),
      1L, "rz_out", "rz_ledger", "rz_marker")

    RewriteDedup.compact(spark, "rz_ledger", "rz_marker")
    assert(spark.catalog.tableExists("rz_ledgerc"))
    assert(spark.table("rz_ledgerc").count() == 2L)
    // folded partitions dropped best-effort — the probe must not need them
    assert(spark.table("rz_ledger").count() == 0L,
      "folded ledger partitions should be dropped")

    // ownership survives the fold: a batch-0 chunk still drops
    RewriteDedup.rewriteBatch(Seq((21L, s"$s1 $s3")).toDF("doc_id", "text"),
      2L, "rz_out", "rz_ledger", "rz_marker")
    val doc21 = RewriteDedup.cleaned(spark, "rz_out", "rz_marker")
      .filter(col("doc_id") === 21L).collect().head
    assert(doc21.getAs[String]("clean_text") == s3,
      s"compacted ownership lost: $doc21")

    // crashed swap: staging present, live compact gone — the next
    // probe adopts it and batch-1 ownership still holds
    spark.sql("ALTER TABLE rz_ledgerc RENAME TO rz_ledgerc_staging")
    RewriteDedup.rewriteBatch(Seq((31L, s2)).toDF("doc_id", "text"),
      3L, "rz_out", "rz_ledger", "rz_marker")
    assert(spark.catalog.tableExists("rz_ledgerc") &&
      !spark.catalog.tableExists("rz_ledgerc_staging"),
      "staged compact table not adopted")
    val doc31 = RewriteDedup.cleaned(spark, "rz_out", "rz_marker")
      .filter(col("doc_id") === 31L).collect().head
    assert(doc31.getAs[String]("clean_text") == "",
      s"ownership lost across the crashed swap: $doc31")
    spark.catalog.clearCache()
  }

  test("cross-batch ownership, replay no-op, crash-window overwrite") {
    import spark.implicits._
    reset("rx_out", "rx_ledger", "rx_marker")
    val s1 = "the quick brown fox jumps over the lazy dog today"
    val s3 = "how vexingly quick daft zebras jump at dusk tonight friends"

    RewriteDedup.rewriteBatch(
      Seq((1L, s1)).toDF("doc_id", "text"),
      0L, "rx_out", "rx_ledger", "rx_marker")
    RewriteDedup.rewriteBatch(
      Seq((11L, s"$s1 $s3")).toDF("doc_id", "text"),
      1L, "rx_out", "rx_ledger", "rx_marker")
    val doc11 = RewriteDedup.cleaned(spark, "rx_out", "rx_marker")
      .filter(col("doc_id") === 11L).collect().head
    assert(doc11.getAs[String]("clean_text") == s3,
      s"batch-0 chunk must drop from batch 1: ${doc11}")
    assert(doc11.getAs[Int]("n_kept") == 1)

    // replay of a committed batch: nothing changes
    val before = spark.table("rx_out").collect().toSet
    RewriteDedup.rewriteBatch(
      Seq((11L, s"$s1 $s3")).toDF("doc_id", "text"),
      1L, "rx_out", "rx_ledger", "rx_marker")
    assert(spark.table("rx_out").collect().toSet == before)

    // crash window: a PARTIAL cleaned partition landed (one bogus row),
    // ledger + marker missing — serving must not see it, and the
    // replay must overwrite the partition with the full deterministic
    // row-set, not append to it
    Seq((999L, 0, 0, "bogus", 2L))
      .toDF("doc_id", "n_chunks", "n_kept", "clean_text", "batch_id")
      .write.mode("append").insertInto("rx_out")
    assert(RewriteDedup.cleaned(spark, "rx_out", "rx_marker")
      .filter(col("batch_id") === 2L).isEmpty,
      "uncommitted partition must not serve")
    RewriteDedup.rewriteBatch(
      Seq((21L, s3)).toDF("doc_id", "text"),
      2L, "rx_out", "rx_ledger", "rx_marker")
    val p2 = RewriteDedup.cleaned(spark, "rx_out", "rx_marker")
      .filter(col("batch_id") === 2L).collect()
    assert(p2.map(_.getAs[Long]("doc_id")).toSeq == Seq(21L),
      s"crashed partial partition must be overwritten whole: ${p2.toSeq}")
    // doc 21 is s3 verbatim — already owned by batch 1, so it cleans
    // to empty: ownership survives the crash replay
    assert(p2.head.getAs[String]("clean_text") == "")
    spark.catalog.clearCache()
  }
}
