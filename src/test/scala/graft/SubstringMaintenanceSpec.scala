package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.SubstringDedup

/** The streaming window ledger must agree with the batch report: after
  * streaming a corpus in micro-batches, `substringDupReportServed`
  * over that corpus equals `Dedup.substringDupReport` run on it in one
  * shot — the ChunkDedup equality contract, at stride-1 granularity.
  * The decisive case: the shared passage lands in DIFFERENT
  * micro-batches for its two docs, so no single batch ever sees both
  * copies — only the summed ledger makes the window "duplicated".
  */
class SubstringMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def reset(tables: String*): Unit =
    TestWarehouse.reset(spark, tables: _*)

  private val passage = // 12 tokens > the 8-token window
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
  private def uniq(tag: String, n: Int): Seq[String] =
    (0 until n).map(i => s"${tag}_$i")

  // doc 1 and doc 3 share the passage at different offsets; they are
  // streamed in different micro-batches. docs 2/4 are noise/short.
  private val corpus = Seq(
    (1L, (passage.split(" ").toSeq ++ uniq("a", 8)).mkString(" ")),
    (2L, uniq("b", 15).mkString(" ")),
    (3L, (uniq("c", 3) ++ passage.split(" ").toSeq ++ uniq("d", 5))
      .mkString(" ")),
    (4L, "short doc"))

  test("streamed ledger serve equals the one-shot dd14 batch report") {
    import spark.implicits._
    val wt = "substr_ledger"
    val mt = "substr_marker"
    reset(wt, mt)

    val stream = MemoryStream[(Long, String)](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-sd-ckpt").toString
    val q = SubstringDedup.maintain(stream.toDF().toDF("doc_id", "text"),
      wt, mt, ckpt)
    try {
      stream.addData(corpus(0), corpus(1)) // doc 1's copy of the passage
      q.processAllAvailable()
      stream.addData(corpus(2), corpus(3)) // doc 3's copy, a batch later
      q.processAllAvailable()
    } finally q.stop()

    val docsDf = corpus.toDF("doc_id", "text")
    val streamed = SubstringDedup.substringDupReportServed(docsDf, wt)
      .collect().toSeq
    val batch = graft.queries.Dedup.substringDupReport(docsDf)
      .collect().toSeq
    assert(streamed == batch)
    // non-trivial: docs 1/3 carry one 12-token span each, 2/4 nothing —
    // and no single micro-batch ever saw both copies of the passage
    val spans = streamed.map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(spans == Map(1L -> 12, 2L -> 0, 3L -> 12, 4L -> 0))
  }

  test("a replayed micro-batch is a no-op (commit marker)") {
    import spark.implicits._
    val wt = "substr_ledger_replay"
    val mt = "substr_marker_replay"
    reset(wt, mt)

    val batch = corpus.take(2).toDF("doc_id", "text")
    SubstringDedup.appendBatch(batch, 0L, wt, mt)
    val once = SubstringDedup.windowFrequency(spark, wt)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    SubstringDedup.appendBatch(batch, 0L, wt, mt) // replay: marker exists
    val twice = SubstringDedup.windowFrequency(spark, wt)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(once == twice && once.nonEmpty)
  }

  test("empty ledger serves a zero-duplication report, not an error") {
    import spark.implicits._
    val docsDf = corpus.toDF("doc_id", "text")
    val r = SubstringDedup
      .substringDupReportServed(docsDf, "substr_ledger_never_made")
      .collect().toSeq
    assert(r.map(x => x.getLong(0) -> x.getInt(3)).toMap ==
      Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 0))
  }
}
