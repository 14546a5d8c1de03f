package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.index.TokenizerStore

/** The frozen-tokenizer artifact contract: tx41 (serve from the stored
  * merge table) must reproduce tx39 (fresh train-and-apply) bit for
  * bit, serving must READ the artifact rather than retrain (pinned by
  * segmenting under a hand-written merge table no training run would
  * produce), and the artifact stays driver-collect-bounded.
  */
class TokenizerStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("tx41 stored-vocab segmentation == fresh tx39 bit-for-bit") {
    val fresh = SparkEntry.queries("tx39_bpe_segment")(spark, dir)
      .collect().toSeq
    val stored = SparkEntry.queries("tx41_bpe_segment_stored")(spark, dir)
      .collect().toSeq
    assert(stored == fresh,
      s"artifact serve diverged from fresh train-and-apply:\n" +
        s"  stored: ${stored.take(5)}\n  fresh:  ${fresh.take(5)}")
    assert(stored.nonEmpty)
    spark.catalog.clearCache()
  }

  test("serving reads the FROZEN artifact, not a retrain") {
    import spark.implicits._
    val name = "graft_tokenizer_frozen_probe"
    TestWarehouse.reset(spark, s"${name}_merges")
    // a hand-written vocabulary no training run on any corpus would
    // learn — if serving retrained instead of reading the table, the
    // segmentation below would not follow these merges
    Seq((1, "z", "q", 99L), (2, "zq", "x", 7L))
      .toDF("rk", "lhs", "rhs", "n")
      .write.saveAsTable(s"${name}_merges")
    val got = Seq("zqx", "zqzq", "azqb")
      .toDF("word")
      .select(col("word"),
        TokenizerStore.segmented(spark, name, col("word")).as("units"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("zqx") == Seq("zqx"), s"rank-2 merge not applied: $got")
    assert(got("zqzq") == Seq("zq", "zq"))
    assert(got("azqb") == Seq("a", "zq", "b"))
    TestWarehouse.reset(spark, s"${name}_merges")
  }

  test("build freezes exactly the tx38-trained merges, rank-ordered") {
    val name = "graft_tokenizer_build_probe"
    TestWarehouse.reset(spark, s"${name}_merges")
    val wc = graft.queries.Text.wordCounts(spark, dir)
    TokenizerStore.build(wc, name)
    val stored = TokenizerStore.merges(spark, name)
    val fresh = SparkEntry.queries("tx38_bpe_train")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(stored == fresh, "stored merge table != tx38's trained merges")
    assert(stored.map(_._1) == (1 to stored.size), "rk must be 1..n in order")
    assert(TokenizerStore.modelRows(spark, name) <= TokenizerStore.DefaultMerges,
      "artifact must stay driver-collect-bounded at the training depth")
    TestWarehouse.reset(spark, s"${name}_merges")
    spark.catalog.clearCache()
  }
}
