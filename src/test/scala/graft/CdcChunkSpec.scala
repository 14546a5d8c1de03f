package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Dedup

/** Content-defined chunking (dd22): the property the operator exists
  * for is INSERTION ROBUSTNESS — a cut decision depends only on its
  * own trailing 3-gram, so inserting one token at the head perturbs
  * only the windows overlapping the insertion and every chunk past
  * the next surviving boundary re-aligns exactly. Fixed-offset
  * chunking (dd09) loses ALL alignment on the same edit.
  */
class CdcChunkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // distinct synthetic tokens: any digest collision between base and
  // shifted chunks is then a REAL re-alignment, never an accident
  private val base = (0 until 240).map(i => s"t$i")

  private def digestsOf(docs: Seq[(Long, String)]): Map[Long, Seq[String]] = {
    import spark.implicits._
    val tk = docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("tk"))
    Dedup.cdcChunkDigestsOf(tk).collect()
      .map(r => r.getLong(0) -> r.getString(1)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSeq }
  }

  test("one head insertion re-aligns every chunk past the first cut") {
    val shifted = "zzz" +: base
    val ds = digestsOf(Seq(1L -> base.mkString(" "), 2L -> shifted.mkString(" ")))
    val (b, s) = (ds(1L), ds(2L))
    assert(b.size >= 10, s"test premise: base must chunk (got ${b.size})")
    // only the windows overlapping the inserted token differ, so at
    // most the FIRST base chunk can fail to reappear in the shifted doc
    val lost = b.toSet -- s.toSet
    assert(lost.subsetOf(Set(b.head)),
      s"CDC lost non-head chunks: ${lost.size} of ${b.size}")
    assert(s.toSet.intersect(b.toSet).size >= b.size - 1)
  }

  test("fixed-offset chunking loses all alignment on the same edit") {
    import spark.implicits._
    val shifted = "zzz" +: base
    val tk = Seq(1L -> base.mkString(" "), 2L -> shifted.mkString(" "))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("tk"))
    val fixed = Dedup.chunkDigestsOf(tk).collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("ch")))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    assert(fixed(1L).intersect(fixed(2L)).isEmpty,
      "fixed-offset chunks should misalign completely after a 1-token shift")
  }

  test("report counts chunks and flags cross-doc sharing") {
    // doc 3 embeds doc 1's tail verbatim: the shared chunks must be
    // flagged in BOTH docs' reports
    val tail = base.drop(120)
    val other = (0 until 60).map(i => s"u$i") ++ tail
    val rows = Dedup.cdcReportOf(
      { import spark.implicits._
        Seq(1L -> base.mkString(" "), 3L -> other.mkString(" "),
          4L -> "short").toDF("doc_id", "text") })
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2))).toMap
    assert(rows(1L)._2 > 0 && rows(3L)._2 > 0,
      s"verbatim-embedded tail produced no shared chunks: $rows")
    assert(rows(4L) == (1, 0), "a 1-token doc is a single unshared chunk")
  }
}
