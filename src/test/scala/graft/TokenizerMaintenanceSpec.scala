package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.index.TokenizerStore
import graft.streaming.TokenizerMaintenance

/** The streaming segmentation ledger must agree with the batch pass:
  * after streaming a corpus in micro-batches under the FROZEN
  * corpus-trained vocabulary, `unitReport` equals tx39's fresh
  * train-and-apply output on the same corpus. The decisive case: the
  * corpus is split so shared words land in BOTH batches — only the
  * summed ledger reproduces corpus word counts (and n_words stays a
  * serve-time distinct, not a per-batch sum).
  */
class TokenizerMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def reset(tables: String*): Unit =
    TestWarehouse.reset(spark, tables: _*)

  // tiny corpus for the protocol tests: words straddle the two batches
  private val corpus = Seq(
    (1L, "alpha beta gamma alpha"),
    (2L, "beta delta"),
    (3L, "alpha beta beta epsilon"),
    (4L, "gamma gamma delta"))

  private def buildTinyStore(name: String): Unit = {
    import spark.implicits._
    reset(s"${name}_merges")
    TokenizerStore.build(
      corpus.toDF("doc_id", "text")
        .select(explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("word"))
        .groupBy("word").agg(count(lit(1)).as("wn")),
      name)
  }

  test("streamed ledger serve equals the one-shot tx39 batch report") {
    import spark.implicits._
    val wt = "tok_ledger"
    val mt = "tok_marker"
    reset(wt, mt)
    val store = TokenizerStore.forCorpus(spark, dir)

    val docs = graft.tables.load(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    assert(docs.size >= 100)
    val (b0, b1) = docs.partition(_._1 % 2 == 0) // shared words straddle

    val stream = MemoryStream[(Long, String)](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-tok-ckpt").toString
    val q = TokenizerMaintenance.maintain(
      stream.toDF().toDF("doc_id", "text"), store, wt, mt, ckpt)
    try {
      stream.addData(b0: _*)
      q.processAllAvailable()
      stream.addData(b1: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = TokenizerMaintenance.unitReport(spark, wt, mt)
      .collect().toSeq
    val batch = SparkEntry.queries("tx39_bpe_segment")(spark, dir)
      .collect().toSeq
    assert(streamed == batch,
      s"streamed unit report diverged from tx39:\n" +
        s"  streamed: ${streamed.take(5)}\n  batch:    ${batch.take(5)}")
    assert(streamed.nonEmpty)
    spark.catalog.clearCache()
  }

  test("a replayed micro-batch is a no-op (commit marker)") {
    import spark.implicits._
    val st = "graft_tok_tiny_replay"
    val wt = "tok_ledger_replay"
    val mt = "tok_marker_replay"
    reset(wt, mt)
    buildTinyStore(st)

    val batch = corpus.take(2).toDF("doc_id", "text")
    TokenizerMaintenance.appendBatch(batch, 0L, st, wt, mt)
    val once = TokenizerMaintenance.unitReport(spark, wt, mt).collect().toSeq
    TokenizerMaintenance.appendBatch(batch, 0L, st, wt, mt) // marker exists
    val twice = TokenizerMaintenance.unitReport(spark, wt, mt).collect().toSeq
    assert(once == twice && once.nonEmpty)
    reset(st + "_merges", wt, mt)
  }

  test("crash window: orphan batch never serves; replay overwrites it") {
    import spark.implicits._
    val st = "graft_tok_tiny_crash"
    val wt = "tok_ledger_crash"
    val mt = "tok_marker_crash"
    reset(wt, mt)
    buildTinyStore(st)

    TokenizerMaintenance.appendBatch(corpus.take(2).toDF("doc_id", "text"),
      0L, st, wt, mt)
    val committed = TokenizerMaintenance.unitReport(spark, wt, mt)
      .collect().toSeq

    // simulate the crash window for batch 1: ledger rows visible —
    // PARTIALLY (one word dropped, mimicking a mid-commit crash) —
    // marker never landed
    val partial = corpus.drop(2).toDF("doc_id", "text")
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("wn"))
      .limit(1)
      .select(col("word"), col("wn"),
        TokenizerStore.segmented(spark, st, col("word")).as("units"),
        lit(TokenizerStore.currentVersion(spark, st)).as("vocab_v"),
        lit(1L).as("batch_id"))
    val key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "dynamic")
    try partial.write.mode("overwrite").insertInto(wt)
    finally spark.conf.unset(key)

    // committed-only serve: the orphan partition must not surface
    assert(TokenizerMaintenance.unitReport(spark, wt, mt)
      .collect().toSeq == committed,
      "orphan (uncommitted) batch rows leaked into serving")

    // the replay rewrites the partial partition completely
    TokenizerMaintenance.appendBatch(corpus.drop(2).toDF("doc_id", "text"),
      1L, st, wt, mt)
    // docs 3-4 carry 5 distinct words: the partial (1-word) seed row
    // must be replaced by the full deterministic set, not adopted
    val words = spark.table(wt).filter(col("batch_id") === 1L)
      .select("word").as[String].collect().toSet
    assert(words == Set("alpha", "beta", "epsilon", "gamma", "delta"),
      s"replay must replace the partial row-set, got $words")
    val full = TokenizerMaintenance.unitReport(spark, wt, mt).collect().toSeq
    assert(full != committed && full.nonEmpty)
    reset(st + "_merges", wt, mt)
  }

  test("compaction folds to one row per word, serving unchanged") {
    import spark.implicits._
    val st = "graft_tok_tiny_compact"
    val wt = "tok_ledger_compact"
    val mt = "tok_marker_compact"
    reset(wt, mt, wt + "_staging")
    buildTinyStore(st)

    TokenizerMaintenance.appendBatch(corpus.take(2).toDF("doc_id", "text"),
      0L, st, wt, mt)
    TokenizerMaintenance.appendBatch(corpus.drop(2).toDF("doc_id", "text"),
      1L, st, wt, mt)
    val before = TokenizerMaintenance.unitReport(spark, wt, mt)
      .collect().toSeq
    // pre-compact: "beta" has a row in each batch partition
    assert(spark.table(wt).filter(col("word") === "beta").count() == 2)

    TokenizerMaintenance.compact(spark, wt, mt)
    assert(TokenizerMaintenance.unitReport(spark, wt, mt)
      .collect().toSeq == before, "compaction changed serving")
    assert(spark.table(wt).groupBy("word").count()
      .filter(col("count") > 1).isEmpty,
      "compaction must leave one row per distinct word")
    assert(!spark.catalog.tableExists(wt + "_staging"))
    reset(st + "_merges", wt, mt)
  }

  test("recoverStaging heals a crash between compact's swap steps") {
    import spark.implicits._
    val st = "graft_tok_tiny_heal"
    val wt = "tok_ledger_heal"
    val mt = "tok_marker_heal"
    val staging = wt + "_staging"
    reset(wt, mt, staging)
    buildTinyStore(st)

    TokenizerMaintenance.appendBatch(corpus.toDF("doc_id", "text"),
      0L, st, wt, mt)
    val before = TokenizerMaintenance.unitReport(spark, wt, mt)
      .collect().toSeq

    // vulnerable instant: staged ledger fully written, live dropped
    spark.table(wt).select("word", "wn", "units", "vocab_v", "batch_id")
      .write.mode("overwrite").partitionBy("batch_id").saveAsTable(staging)
    spark.sql(s"DROP TABLE $wt")

    assert(TokenizerMaintenance.unitReport(spark, wt, mt)
      .collect().toSeq == before, "serve must adopt the staged ledger")
    assert(spark.catalog.tableExists(wt) &&
      !spark.catalog.tableExists(staging))
    reset(st + "_merges", wt, mt)
  }
}
