package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.NoveltyMonitor

/** The streaming novelty monitor must agree with batch pl29: a digest
  * enters the seen ledger in the batch where it is first seen, so with
  * doc_id-ordered batches each batch's n_novel equals pl29's per-doc
  * n_novel summed over the batch's docs. Plus the delivery protocol:
  * replay no-op, partial-partition crash-window overwrite (never
  * adoption), committed-only serve, and the staleness signal itself.
  */
class NoveltyMonitorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def reset(tables: String*): Unit =
    TestWarehouse.reset(spark, tables: _*)

  // ≥5 tokens per doc; controlled overlap. doc 2 copies doc 1 exactly
  // (0 novel), doc 4 shares a 5-token window with doc 3.
  private val d1 = (1L, "alpha beta gamma delta epsilon zeta")
  private val d2 = (2L, "alpha beta gamma delta epsilon zeta")
  private val d3 = (3L, "one two three four five six")
  private val d4 = (4L, "zero one two three four five")
  private val corpus = Seq(d1, d2, d3, d4)

  test("streamed per-batch n_novel equals batch pl29 summed over the batch") {
    import spark.implicits._
    val (st, rt, mt) = ("nov_seen", "nov_report", "nov_marker")
    reset(st, rt, mt)

    val stream = MemoryStream[(Long, String)](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-nov-ckpt").toString
    val q = NoveltyMonitor.maintain(stream.toDF().toDF("doc_id", "text"),
      st, rt, mt, ckpt)
    val batches = Seq(Seq(d1, d2), Seq(d3), Seq(d4)) // doc_id-ordered
    try {
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    // batch pl29 over the union corpus, on disk where the query reads
    val dir = java.nio.file.Files.createTempDirectory("graft-nov-sf").toString
    corpus.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pl29 = SparkEntry.queries("pl29_ngram_novelty")(spark, dir)
      .select("doc_id", "n_novel").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = batches.zipWithIndex.map { case (b, i) =>
      i.toLong -> b.map(d => pl29(d._1)).sum
    }.toMap

    val got = NoveltyMonitor.noveltyRows(spark, rt, mt)
      .select("batch_id", "n_novel").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"streamed $got vs batch-derived $expected")
    // and the exact-copy batch carried novel content only once: doc 2
    // added nothing beyond doc 1's digests
    assert(pl29(2L) == 0L)
  }

  test("a replayed micro-batch is a no-op (marker)") {
    import spark.implicits._
    val (st, rt, mt) = ("nov_seen_r", "nov_report_r", "nov_marker_r")
    reset(st, rt, mt)
    val b0 = Seq(d1, d2).toDF("doc_id", "text")
    NoveltyMonitor.noveltyBatch(b0, 0L, st, rt, mt)
    val once = NoveltyMonitor.noveltyRows(spark, rt, mt).collect().toSeq
    val seenOnce = spark.table(st).count()
    NoveltyMonitor.noveltyBatch(b0, 0L, st, rt, mt)
    assert(NoveltyMonitor.noveltyRows(spark, rt, mt).collect().toSeq == once)
    assert(spark.table(st).count() == seenOnce)
    assert(once.size == 1)
  }

  test("crash-window replay overwrites a PARTIAL partition, never adopts it") {
    import spark.implicits._
    val (st, rt, mt) = ("nov_seen_c", "nov_report_c", "nov_marker_c")
    reset(st, rt, mt)
    NoveltyMonitor.noveltyBatch(Seq(d1).toDF("doc_id", "text"), 0L, st, rt, mt)

    // simulate the crash: batch 1's partition half-written (one of d3's
    // two digests), no report, no marker
    val partial = graft.queries.Pipeline
      .ngramDigestsOf(Seq(d3).toDF("doc_id", "text"))
      .select(col("d")).limit(1)
      .select(col("d"), lit(1L).as("batch_id"))
    val key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "dynamic")
    try partial.write.mode("overwrite").insertInto(st)
    finally spark.conf.unset(key)
    assert(spark.table(st).filter(col("batch_id") === 1L).count() == 1L)

    // replay: the full deterministic set replaces the partial one
    NoveltyMonitor.noveltyBatch(Seq(d3).toDF("doc_id", "text"), 1L, st, rt, mt)
    assert(spark.table(st).filter(col("batch_id") === 1L).count() == 2L)
    val row = NoveltyMonitor.noveltyRows(spark, rt, mt)
      .filter(col("batch_id") === 1L).head
    assert(row.getAs[Long]("n_novel") == 2L,
      "adopting the partial partition would have undercounted")
  }

  test("serving is committed-only: an orphan report row stays invisible") {
    import spark.implicits._
    val (st, rt, mt) = ("nov_seen_o", "nov_report_o", "nov_marker_o")
    reset(st, rt, mt)
    NoveltyMonitor.noveltyBatch(Seq(d1).toDF("doc_id", "text"), 0L, st, rt, mt)
    // orphan: report written, marker missing (crash between the two)
    Seq((1L, 1L, 2L, 2L, 1.0))
      .toDF("batch_id", "n_docs", "n_ngrams", "n_novel", "novelty")
      .write.mode("append").saveAsTable(rt)
    val served = NoveltyMonitor.noveltyRows(spark, rt, mt)
      .select("batch_id").collect().map(_.getLong(0)).toSet
    assert(served == Set(0L))
  }

  test("a stale feed shows novelty 0 within one batch") {
    import spark.implicits._
    val (st, rt, mt) = ("nov_seen_s", "nov_report_s", "nov_marker_s")
    reset(st, rt, mt)
    NoveltyMonitor.noveltyBatch(Seq(d1).toDF("doc_id", "text"), 0L, st, rt, mt)
    // the re-crawl: same content, new doc id
    NoveltyMonitor.noveltyBatch(Seq((9L, d1._2)).toDF("doc_id", "text"),
      1L, st, rt, mt)
    val r = NoveltyMonitor.noveltyRows(spark, rt, mt)
      .filter(col("batch_id") === 1L).head
    assert(r.getAs[Long]("n_novel") == 0L)
    assert(r.getAs[Double]("novelty") == 0.0)
  }
}
