package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Dedup

/** The dd20 chunk-dedup REWRITE: global keep-first over 10-token
  * chunks with in-order document reassembly. Pinned on a crafted
  * corpus (the ChunkDedupSpec 10-word-sentence device so chunk
  * boundaries are exact): cross-doc duplicates drop at every
  * occurrence but the first, within-doc repeats collapse to their
  * first instance, the sub-chunk tail always survives, reassembly
  * preserves position order (not sort order), and the keep-first
  * stage is an aggregation — the physical plan carries NO window
  * (the boilerplate-chunk skew argument in the operator doc).
  */
class DedupRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val s1 = "the quick brown fox jumps over the lazy dog today"
  private val s2 = "pack my box with five dozen fresh liquor jugs now"
  private val s3 = "how vexingly quick daft zebras jump at dusk tonight friends"
  private val s4 = "nine ducks walked across a frozen pond before dawn broke"
  private val s5 = "zeta yield xray whiskey victor uniform tango sierra romeo quebec"
  private val s6 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"

  test("keep-first rewrite: drops, within-doc collapse, tail, order") {
    import spark.implicits._
    val corpus = Seq(
      (1L, s"$s1 $s2"),          // both chunks globally first
      (2L, s"$s1 $s3"),          // s1 dropped (doc 1 owns it), s3 kept
      (3L, s2),                  // fully deduplicated away
      (4L, "short doc"),         // under one chunk: tail only
      (6L, s"$s4 $s4 trailing bit"), // within-doc repeat + tail
      (7L, s"$s5 $s6")           // order check: s5 before s6, not sorted
    ).toDF("doc_id", "text")

    val got = Dedup.dedupRewriteOf(corpus).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap
    val expected = Map(
      1L -> ((2, 2, s"$s1 $s2")),
      2L -> ((2, 1, s3)),
      3L -> ((1, 0, "")),
      4L -> ((0, 0, "short doc")),
      6L -> ((2, 1, s"$s4 trailing bit")),
      7L -> ((2, 2, s"$s5 $s6")))
    assert(got == expected)
    spark.catalog.clearCache()
  }

  test("keep-first is an aggregation: no window in the physical plan") {
    import spark.implicits._
    val df = Dedup.dedupRewriteOf(
      Seq((1L, s"$s1 $s2")).toDF("doc_id", "text"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"dd20's keep-first must not be a window (boilerplate skew):\n$plan")
    spark.catalog.clearCache()
  }
}
