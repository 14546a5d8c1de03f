package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.TokenizerStore
import graft.streaming.{DriftMonitor, TokenizerMaintenance}

/** The drift→rebuild arc, tokenizer side (`VectorRebuildSpec` is the
  * ANN-codebook side): `TokenizerStore.rebuild` retrains the BPE merge
  * table on current word counts and installs it as a NEW VERSION behind
  * a 1-row pointer flip. Pinned here: (1) the old vocabulary serves
  * until the flip (a crashed rebuild that wrote a next-version table
  * but never flipped changes nothing), (2) post-rebuild serving equals
  * a fresh build on the same counts bit-for-bit, (3) the KL-drift
  * signal gates the rebuild, and (4) the streaming segmentation ledger
  * REFUSES mixed-vocabulary serving after a rebuild until the
  * maintenance-window resegment, which also migrates pre-vocab_v
  * legacy ledgers.
  */
class TokenizerRebuildSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def reset(name: String): Unit =
    TestWarehouse.reset(spark,
      (Seq("merges", "version").map(t => s"${name}_$t") ++
        (2 to 5).map(v => s"${name}_v${v}_merges")): _*)

  private def wcOf(pairs: Seq[(String, Long)]) = {
    import spark.implicits._
    pairs.toDF("word", "wn")
  }

  // two disjoint "languages": retraining on the drifted one MUST
  // produce a different merge table
  private val baseWc = Seq(
    ("alpha", 4L), ("beta", 4L), ("gamma", 3L), ("delta", 2L),
    ("epsilon", 1L))
  private val driftWc = Seq(("zzqq", 9L), ("qqzz", 7L), ("zzzz", 5L))

  test("rebuild installs a new version atomically; old vocab serves until the flip") {
    import spark.implicits._
    reset("tr"); reset("tr_ref")
    TokenizerStore.build(wcOf(baseWc), "tr")
    assert(TokenizerStore.currentVersion(spark, "tr") == 1L)
    val m1 = TokenizerStore.merges(spark, "tr")
    assert(m1.nonEmpty)

    // a crashed rebuild: next-version merge table fully written,
    // pointer never flipped — serving must be COMPLETELY unaffected
    Seq((1, "z", "z", 5L)).toDF("rk", "lhs", "rhs", "n")
      .write.mode("overwrite").saveAsTable("tr_v2_merges")
    assert(TokenizerStore.currentVersion(spark, "tr") == 1L)
    assert(TokenizerStore.merges(spark, "tr") == m1,
      "pre-flip next-version table leaked into serving")

    // the real rebuild on drifted counts: new version, new vocabulary
    val v = TokenizerStore.rebuild(wcOf(driftWc), "tr")
    assert(v == 2L && TokenizerStore.currentVersion(spark, "tr") == 2L)
    assert(!spark.catalog.tableExists("tr_merges"),
      "rebuild must sweep the replaced version's table after the flip")
    val m2 = TokenizerStore.merges(spark, "tr")
    TokenizerStore.build(wcOf(driftWc), "tr_ref")
    assert(m2 == TokenizerStore.merges(spark, "tr_ref"),
      "rebuilt store serves differently from a fresh build")
    assert(m2 != m1, "test premise: drifted retrain must change merges")
  }

  test("KL-drift signal gates the tokenizer rebuild") {
    import spark.implicits._
    reset("tg")
    TestWarehouse.reset(spark, "tg_drift_ref", "tg_drift_ledger",
      "tg_drift_marker")
    TokenizerStore.build(wcOf(baseWc), "tg")

    val base = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"))
      .toDF("doc_id", "text")
    DriftMonitor.buildReference(base, "tg_drift")
    DriftMonitor.driftBatch(
      Seq((3L, "alpha beta gamma")).toDF("doc_id", "text"),
      0L, "tg_drift", "tg_drift_ledger", "tg_drift_marker")
    assert(TokenizerStore.rebuildIfDrifted(wcOf(baseWc), "tg",
      "tg_drift_ledger", "tg_drift_marker").isEmpty,
      "undrifted batch must not trigger a retrain")
    assert(TokenizerStore.currentVersion(spark, "tg") == 1L)

    DriftMonitor.driftBatch(
      Seq((4L, "qqq www zzz")).toDF("doc_id", "text"),
      1L, "tg_drift", "tg_drift_ledger", "tg_drift_marker")
    val fired = TokenizerStore.rebuildIfDrifted(wcOf(driftWc), "tg",
      "tg_drift_ledger", "tg_drift_marker")
    assert(fired.contains(2L), s"drifted batch must trigger retrain: $fired")
    assert(TokenizerStore.currentVersion(spark, "tg") == 2L)
  }

  test("ledger refuses mixed-vocab serving until resegment; resegment restores the tx39 shape") {
    import spark.implicits._
    reset("tm")
    TestWarehouse.reset(spark, "tm_ledger", "tm_ledger_staging", "tm_marker")
    TokenizerStore.build(wcOf(baseWc), "tm")
    val b0 = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    TokenizerMaintenance.appendBatch(b0, 0L, "tm", "tm_ledger", "tm_marker")
    assert(TokenizerMaintenance.unitReport(spark, "tm_ledger", "tm_marker")
      .count() > 0)

    TokenizerStore.rebuild(wcOf(driftWc), "tm")
    val b1 = Seq((3L, "gamma delta alpha")).toDF("doc_id", "text")
    TokenizerMaintenance.appendBatch(b1, 1L, "tm", "tm_ledger", "tm_marker")
    val e = intercept[IllegalStateException] {
      TokenizerMaintenance.unitReport(spark, "tm_ledger", "tm_marker").collect()
    }
    assert(e.getMessage.contains("resegment"),
      s"mixed-vocab serve must name the fix: ${e.getMessage}")
    val e2 = intercept[IllegalStateException] {
      TokenizerMaintenance.compact(spark, "tm_ledger", "tm_marker")
    }
    assert(e2.getMessage.contains("resegment"))

    TokenizerMaintenance.resegment(spark, "tm_ledger", "tm")
    val served = TokenizerMaintenance
      .unitReport(spark, "tm_ledger", "tm_marker")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    // independent expectation: segment the union's word counts under
    // the CURRENT vocabulary and roll up per unit
    val expected = b0.unionByName(b1)
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("wn"))
      .select(col("word"), col("wn"),
        TokenizerStore.segmented(spark, "tm", col("word")).as("units"))
      .select(col("word"), col("wn"), explode(col("units")).as("unit"))
      .groupBy("unit")
      .agg(sum("wn").as("n"), countDistinct(col("word")).as("n_words"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    assert(served == expected,
      "post-resegment serve must equal segmentation under the new vocab")

    // replay of a committed batch stays a no-op after the resegment
    TokenizerMaintenance.appendBatch(b1, 1L, "tm", "tm_ledger", "tm_marker")
    val again = TokenizerMaintenance
      .unitReport(spark, "tm_ledger", "tm_marker")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    assert(again == served, "replayed committed batch changed the report")
  }

  test("legacy ledger without vocab_v is refused loudly; resegment migrates it") {
    import spark.implicits._
    reset("tl")
    TestWarehouse.reset(spark, "tl_ledger", "tl_ledger_staging", "tl_marker")
    TokenizerStore.build(wcOf(baseWc), "tl")
    // hand-write the pre-vocab_v layout (word, wn, units, batch_id)
    Seq(("alpha", 2L, Seq("alpha"), 0L), ("beta", 1L, Seq("beta"), 0L))
      .toDF("word", "wn", "units", "batch_id")
      .write.partitionBy("batch_id").saveAsTable("tl_ledger")
    Seq((0L, 2L)).toDF("batch_id", "n_docs").write.saveAsTable("tl_marker")
    val e = intercept[IllegalStateException] {
      TokenizerMaintenance.unitReport(spark, "tl_ledger", "tl_marker").collect()
    }
    assert(e.getMessage.contains("legacy"),
      s"legacy layout must refuse with a migration message: ${e.getMessage}")
    val e2 = intercept[IllegalStateException] {
      TokenizerMaintenance.appendBatch(
        Seq((9L, "alpha")).toDF("doc_id", "text"),
        1L, "tl", "tl_ledger", "tl_marker")
    }
    assert(e2.getMessage.contains("legacy"))

    TokenizerMaintenance.resegment(spark, "tl_ledger", "tl")
    val rep = TokenizerMaintenance.unitReport(spark, "tl_ledger", "tl_marker")
    assert(rep.count() > 0, "migrated ledger must serve")
    assert(spark.table("tl_ledger").columns.contains("vocab_v"))
  }
}
