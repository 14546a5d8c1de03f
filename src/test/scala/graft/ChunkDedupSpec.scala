package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.Row
import graft.streaming.ChunkDedup

/** The streaming chunk ledger must agree with the batch report: after
  * streaming a corpus in micro-batches, `sharedChunkReport` over that
  * corpus equals `Dedup.chunkReportOf` run on it in one shot — the
  * same batch-vs-streaming equality contract as the sessionize twin.
  */
class ChunkDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def reset(tables: String*): Unit =
    TestWarehouse.reset(spark, tables: _*)

  // 10-token chunks: docs built from 10-word sentences so sharing is
  // controlled exactly. S1 is the boilerplate chunk.
  private val s1 = "the quick brown fox jumps over the lazy dog today"
  private val s2 = "pack my box with five dozen fresh liquor jugs now"
  private val s3 = "how vexingly quick daft zebras jump at dusk tonight friends"
  private val corpus = Seq(
    (1L, s"$s1 $s2"),      // chunk s1 shared, s2 shared with doc 3
    (2L, s"$s1 $s3"),      // chunk s1 shared, s3 unique
    (3L, s2),              // single shared chunk
    (4L, "short doc"),     // under one chunk: zero chunks, zero shared
    (5L, s3.replace("friends", "strangers"))) // near-miss: NOT shared

  test("streamed ledger report equals the one-shot batch report") {
    import spark.implicits._
    val ct = "chunk_ledger"
    val mt = "chunk_marker"
    reset(ct, mt)

    val stream = MemoryStream[(Long, String)](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-cd-ckpt").toString
    val q = ChunkDedup.maintain(stream.toDF().toDF("doc_id", "text"),
      ct, mt, ckpt)
    try {
      stream.addData(corpus(0), corpus(1))
      q.processAllAvailable()
      stream.addData(corpus(2), corpus(3))
      q.processAllAvailable()
      stream.addData(corpus(4))
      q.processAllAvailable()
    } finally q.stop()

    val docsDf = corpus.toDF("doc_id", "text")
    val streamed = ChunkDedup.sharedChunkReport(docsDf, ct).collect().toSeq
    val batch = graft.queries.Dedup.chunkReportOf(docsDf).collect().toSeq
    assert(streamed == batch)
    // and the report is non-trivial: docs 1-3 share, 4-5 don't
    val byDoc = streamed.map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(byDoc == Map(1L -> 2, 2L -> 1, 3L -> 1, 4L -> 0, 5L -> 0))
  }

  test("a replayed micro-batch is a no-op (commit marker)") {
    import spark.implicits._
    val ct = "chunk_ledger_replay"
    val mt = "chunk_marker_replay"
    reset(ct, mt)

    val batch = corpus.take(2).toDF("doc_id", "text")
    ChunkDedup.appendBatch(batch, 0L, ct, mt)
    val once = ChunkDedup.chunkFrequency(spark, ct)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ChunkDedup.appendBatch(batch, 0L, ct, mt) // replay: marker exists
    val twice = ChunkDedup.chunkFrequency(spark, ct)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(once == twice && once.nonEmpty)
  }

  test("empty ledger serves a zero-shared report, not an error") {
    import spark.implicits._
    val docsDf = corpus.toDF("doc_id", "text")
    val r = ChunkDedup.sharedChunkReport(docsDf, "chunk_ledger_never_made")
      .collect().toSeq
    assert(r.map(x => x.getLong(0) -> x.getInt(2)).toMap ==
      Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 0, 5L -> 0))
  }
}
