package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Dedup

/** Pins dd14's substring-duplication semantics — in particular the one
  * property that justifies its existence next to dd09: a passage copied
  * at a SHIFTED offset is invisible to fixed non-overlapping chunks but
  * fully recovered by stride-1 windows with span merging.
  */
class SubstringDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** (doc_id, n_tokens, n_spans, dup_tokens, dup_frac) rows. */
  private def report(docs: Seq[(Long, String)]) =
    Dedup.substringDupReport(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getDouble(4)))
      .toList

  // unique filler tokens that never collide across docs
  private def uniq(tag: String, n: Int): Seq[String] =
    (0 until n).map(i => s"${tag}_$i")

  private val passage = // 12 tokens, longer than the 8-token window
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"

  test("misaligned copied passage: one merged span covering exactly it") {
    // doc 1 carries the passage at offset 0, doc 2 at offset 3 — the
    // alignments disagree mod ChunkTokens, so dd09's fixed chunks see
    // nothing, while every 8-token window inside the passage matches
    val d1 = (passage.split(" ") ++ uniq("a", 8)).mkString(" ")
    val d2 = (uniq("b", 3) ++ passage.split(" ") ++ uniq("c", 5)).mkString(" ")
    val rows = report(Seq((1L, d1), (2L, d2)))
    // 12-token passage, windows at relative starts 0..4 merge into one
    // island covering (4 + 8) − 0 = 12 tokens in each doc
    assert(rows === List(
      (1L, 20, 1, 12, 0.6),
      (2L, 20, 1, 12, 0.6)))

    val chunked = Dedup.chunkReportOf(
        Seq((1L, d1), (2L, d2)).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    assert(chunked === Map(1L -> 0, 2L -> 0),
      "fixed chunks must miss the shifted copy dd14 exists to catch")
  }

  test("two separated passages merge into two spans, not one") {
    // gap of 9 unique tokens > window width 8 ⇒ islands stay apart
    val p2 = "mike november oscar papa quebec romeo sierra tango uniform victor"
    val d1 = (passage.split(" ") ++ uniq("g", 9) ++ p2.split(" ")).mkString(" ")
    val d2 = (uniq("h", 2) ++ passage.split(" ") ++ uniq("i", 11) ++
      p2.split(" ")).mkString(" ")
    val rows = report(Seq((1L, d1), (2L, d2)))
    assert(rows.map(r => (r._1, r._3, r._4)) === List((1L, 2, 22), (2L, 2, 22)))
  }

  test("short docs and unique docs report zeros; within-doc repeats do not count") {
    val rows = report(Seq(
      (1L, "tiny doc"), // < 8 tokens: no windows at all
      (2L, uniq("u", 12).mkString(" ")), // unique content
      // the same 8-token run twice in ONE doc — cross-doc only by design
      (3L, (passage.split(" ").take(8) ++ uniq("m", 9) ++
        passage.split(" ").take(8)).mkString(" "))))
    assert(rows === List(
      (1L, 2, 0, 0, 0.0),
      (2L, 12, 0, 0, 0.0),
      (3L, 25, 0, 0, 0.0)))
  }

  test("dd15 reconstructs the copied passage text verbatim") {
    val d1 = (passage.split(" ") ++ uniq("a", 8)).mkString(" ")
    val d2 = (uniq("b", 3) ++ passage.split(" ") ++ uniq("c", 5)).mkString(" ")
    val d3 = uniq("z", 15).mkString(" ")
    val rows = Dedup.dupPassagesReport(
        Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toList
    assert(rows === List((passage, 2, 2)),
      "one passage, reaching 2 docs, one span per doc")
  }

  test("adjacent duplicated windows chain into one span") {
    // doc 2 and doc 3 each share a DIFFERENT half of doc 1's 24-token
    // run, overlapping at the 12-token boundary: doc 1's duplicated
    // window starts form one contiguous island spanning all 24 tokens
    val run = (passage + " mike november oscar papa quebec romeo sierra " +
      "tango uniform victor whiskey xray").split(" ") // 24 tokens
    assert(run.length === 24)
    val d1 = run.mkString(" ")
    val d2 = (run.take(14) ++ uniq("x", 6)).mkString(" ")
    val d3 = (uniq("y", 6) ++ run.drop(10)).mkString(" ")
    val rows = report(Seq((1L, d1), (2L, d2), (3L, d3)))
    val byId = rows.map(r => r._1 -> (r._3, r._4)).toMap
    assert(byId(1L) === ((1, 24)), "overlapping halves must merge in doc 1")
    assert(byId(2L) === ((1, 14)))
    assert(byId(3L) === ((1, 14)))
  }
}
