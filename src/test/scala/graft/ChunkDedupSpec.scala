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

  // longer docs for the CDC scheme (cuts fire ~1-in-8 positions, so
  // CDC sharing needs multi-chunk docs); doc 13 embeds doc 11's tail
  private val cdcBase = (0 until 120).map(i => s"w$i")
  private val cdcCorpus = Seq(
    (11L, cdcBase.mkString(" ")),
    (12L, ((0 until 40).map(i => s"x$i") ++ cdcBase.drop(60)).mkString(" ")),
    (13L, "tiny"))

  test("streamed CDC ledger report equals the one-shot dd22 report") {
    import spark.implicits._
    val ct = "cdc_ledger"
    val mt = "cdc_marker"
    reset(ct, mt)
    val docsDf = cdcCorpus.toDF("doc_id", "text")
    cdcCorpus.zipWithIndex.foreach { case (d, i) =>
      ChunkDedup.appendBatchCdc(Seq(d).toDF("doc_id", "text"), i.toLong, ct, mt)
    }
    val streamed = ChunkDedup.sharedCdcReport(docsDf, ct).collect().toSeq
    val batch = graft.queries.Dedup.cdcReportOf(docsDf).collect().toSeq
    assert(streamed == batch)
    // non-trivial premise: the embedded tail must actually share
    assert(streamed.count(_.getInt(2) > 0) >= 2,
      s"CDC corpus produced no sharing: $streamed")
  }

  test("crash window: a partial partition is overwritten whole on replay") {
    import spark.implicits._
    val ct = "cdc_ledger_crash"
    val mt = "cdc_marker_crash"
    reset(ct, mt)
    ChunkDedup.appendBatchCdc(
      cdcCorpus.take(1).toDF("doc_id", "text"), 0L, ct, mt)
    // simulate a crash AFTER a partial batch-1 append, BEFORE its
    // marker: half of batch 1's rows land in its partition
    val partial = graft.queries.Dedup.cdcChunkDigestsOf(
        cdcCorpus.slice(1, 2).toDF("doc_id", "text")
          .select($"doc_id",
            graft.functions.TextFunctions.tokens($"text").as("tk")))
      .groupBy("ch")
      .agg(org.apache.spark.sql.functions.countDistinct($"doc_id").as("nd"))
      .limit(2)
      .select($"ch", $"nd", org.apache.spark.sql.functions.lit(1L).as("batch_id"))
    val key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "dynamic")
    partial.write.mode("overwrite").insertInto(ct)
    // replay of batch 1 (no marker) must overwrite the partial
    // partition with the full row-set — counts equal the clean path
    ChunkDedup.appendBatchCdc(
      cdcCorpus.slice(1, 2).toDF("doc_id", "text"), 1L, ct, mt)
    ChunkDedup.appendBatchCdc(
      cdcCorpus.slice(2, 3).toDF("doc_id", "text"), 2L, ct, mt)
    val streamed = ChunkDedup
      .sharedCdcReport(cdcCorpus.toDF("doc_id", "text"), ct).collect().toSeq
    val batch = graft.queries.Dedup
      .cdcReportOf(cdcCorpus.toDF("doc_id", "text")).collect().toSeq
    assert(streamed == batch,
      "partial crash-window partition survived the replay")
  }

  test("a ledger refuses appends from the other chunking scheme") {
    import spark.implicits._
    val ct = "scheme_ledger"
    val mt = "scheme_marker"
    reset(ct, mt)
    ChunkDedup.appendBatch(corpus.take(1).toDF("doc_id", "text"), 0L, ct, mt)
    val e = intercept[IllegalArgumentException] {
      ChunkDedup.appendBatchCdc(
        corpus.slice(1, 2).toDF("doc_id", "text"), 1L, ct, mt)
    }
    assert(e.getMessage.contains("one ledger serves one scheme"))
  }
}
