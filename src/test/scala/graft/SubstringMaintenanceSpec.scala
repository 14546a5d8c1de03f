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

  test("xxhash64-keyed ledger serves the identical report (dd16 digest)") {
    // the production digest swap must hold for the STREAMING ledger
    // too: an xxhash64 ledger (ch BIGINT, 8 bytes per window instead
    // of md5's 32 hex chars) fed batch-by-batch serves the same
    // digest-agnostic report as the one-shot batch path — including
    // the decisive split-passage case where no single micro-batch ever
    // sees both copies
    import spark.implicits._
    val wt = "substr_ledger_xx"
    val mt = "substr_marker_xx"
    reset(wt, mt)

    val xx = graft.queries.Dedup.XxDigest
    SubstringDedup.appendBatch(corpus.take(2).toDF("doc_id", "text"),
      0L, wt, mt, xx)
    SubstringDedup.appendBatch(corpus.drop(2).toDF("doc_id", "text"),
      1L, wt, mt, xx)

    val docsDf = corpus.toDF("doc_id", "text")
    val streamed = SubstringDedup.substringDupReportServed(docsDf, wt, xx)
      .collect().toSeq
    val batch = graft.queries.Dedup.substringDupReport(docsDf)
      .collect().toSeq
    assert(streamed == batch,
      "xxhash64 ledger must serve the digest-agnostic dd14 report")
    assert(spark.table(wt).schema("ch").dataType ==
      org.apache.spark.sql.types.LongType,
      "xx ledger must store 8-byte digests, not hex strings")
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

  test("compaction folds to one row per digest, serving unchanged") {
    import spark.implicits._
    val wt = "substr_ledger_compact"
    val mt = "substr_marker_compact"
    reset(wt, mt, wt + "_staging")

    val docsDf = corpus.toDF("doc_id", "text")
    SubstringDedup.appendBatch(corpus.take(2).toDF("doc_id", "text"),
      0L, wt, mt)
    SubstringDedup.appendBatch(corpus.drop(2).toDF("doc_id", "text"),
      1L, wt, mt)

    val freqBefore = SubstringDedup.windowFrequency(spark, wt)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val servedBefore = SubstringDedup.substringDupReportServed(docsDf, wt)
      .collect().toSeq
    val rowsBefore = spark.table(wt).count()

    SubstringDedup.compact(spark, wt, mt)

    // one row per distinct digest (no orphans here), strictly smaller:
    // the shared passage's windows appeared in both batches
    val rowsAfter = spark.table(wt).count()
    assert(rowsAfter == spark.table(wt).select("ch").distinct().count(),
      "compacted ledger must hold one row per distinct digest")
    assert(rowsAfter < rowsBefore, "compaction must shrink the ledger")
    val freqAfter = SubstringDedup.windowFrequency(spark, wt)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(freqAfter == freqBefore,
      "window frequency must be identical before and after compaction")
    assert(SubstringDedup.substringDupReportServed(docsDf, wt)
      .collect().toSeq == servedBefore,
      "served dd14 report must be identical before and after compaction")

    // a replayed pre-compaction batch is still marker-skipped
    SubstringDedup.appendBatch(corpus.take(2).toDF("doc_id", "text"),
      0L, wt, mt)
    assert(SubstringDedup.windowFrequency(spark, wt)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      == freqBefore, "replay after compaction must be a no-op")
  }

  test("crash window: replay overwrites its partition, single-counted") {
    import spark.implicits._
    val wt = "substr_ledger_orphan"
    val mt = "substr_marker_orphan"
    reset(wt, mt)

    // batch 0 commits normally; its frequencies are the reference
    SubstringDedup.appendBatch(corpus.take(2).toDF("doc_id", "text"),
      0L, wt, mt)
    SubstringDedup.appendBatch(corpus.drop(2).toDF("doc_id", "text"),
      1L, wt, mt)
    val committed = SubstringDedup.windowFrequency(spark, wt)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // simulate the crash window for batch 1: increments landed but the
    // marker write never happened — rebuild the marker table with only
    // batch 0's row (equivalent to crashing between the two appends)
    TestWarehouse.reset(spark, mt)
    Seq((0L, 2L)).toDF("batch_id", "n_docs")
      .write.mode("append").saveAsTable(mt)

    // replay of batch 1 lands in the crash window: it rewrites its own
    // batch_id partition (deterministic rows), never appends a second
    // set on top of the visible one
    SubstringDedup.appendBatch(corpus.drop(2).toDF("doc_id", "text"),
      1L, wt, mt)
    val afterReplay = SubstringDedup.windowFrequency(spark, wt)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(afterReplay == committed,
      "crash-window replay must not double-count the batch")
    assert(!spark.table(mt).filter($"batch_id" === 1L).isEmpty,
      "crash-window replay must write the missing marker")
    // the passage windows are nd = 2 exactly (docs 1 and 3), not 3+
    assert(afterReplay.values.max == 2L)
  }

  test("crash window: a partially-visible batch is replaced, not adopted") {
    import spark.implicits._
    val wt = "substr_ledger_partial"
    val mt = "substr_marker_partial"
    reset(wt, mt)

    SubstringDedup.appendBatch(corpus.take(2).toDF("doc_id", "text"),
      0L, wt, mt)
    SubstringDedup.appendBatch(corpus.drop(2).toDF("doc_id", "text"),
      1L, wt, mt)
    val committed = SubstringDedup.windowFrequency(spark, wt)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // simulate a crash MID file-commit for batch 1: only SOME of its
    // increment rows are visible, and the marker never landed. The old
    // orphan-ADOPTION logic would have trusted these rows and
    // permanently undercounted (ADVICE r11, medium).
    TestWarehouse.reset(spark, mt)
    Seq((0L, 2L)).toDF("batch_id", "n_docs")
      .write.mode("append").saveAsTable(mt)
    val fullRows = spark.table(wt).filter($"batch_id" === 1L).count()
    assert(fullRows > 3, s"need a multi-row batch to truncate (got $fullRows)")
    val partial = spark.table(wt).filter($"batch_id" === 1L)
      .select("ch", "nd", "batch_id").limit(3).collect().toSeq
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.createDataFrame(
        spark.sparkContext.parallelize(partial),
        spark.table(wt).select("ch", "nd", "batch_id").schema)
      .write.mode("overwrite").insertInto(wt)
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    assert(spark.table(wt).filter($"batch_id" === 1L).count() == 3L,
      "setup: partition 1 must hold only the partial row-set")

    // replay of batch 1 must restore the FULL deterministic row-set
    SubstringDedup.appendBatch(corpus.drop(2).toDF("doc_id", "text"),
      1L, wt, mt)
    val afterReplay = SubstringDedup.windowFrequency(spark, wt)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(afterReplay == committed,
      "replay must replace the partial partition with the full row-set")
    assert(spark.table(wt).filter($"batch_id" === 1L).count() == fullRows)
    assert(!spark.table(mt).filter($"batch_id" === 1L).isEmpty)
  }

  test("recoverStaging heals a crash between compact's DROP and RENAME") {
    import spark.implicits._
    val wt = "substr_ledger_recover"
    val mt = "substr_marker_recover"
    val staging = wt + "_staging"
    reset(wt, mt, staging)

    SubstringDedup.appendBatch(corpus.take(2).toDF("doc_id", "text"),
      0L, wt, mt)
    val before = SubstringDedup.windowFrequency(spark, wt)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // simulate the vulnerable instant: staged ledger fully written
    // (same partition layout compact stages), window table dropped,
    // rename never ran
    spark.table(wt).select("ch", "nd", "batch_id")
      .write.mode("overwrite").partitionBy("batch_id").saveAsTable(staging)
    spark.sql(s"DROP TABLE $wt")

    // any entry point heals it — serve first, then append
    val healed = SubstringDedup.windowFrequency(spark, wt)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(healed == before, "serve must adopt the staged ledger")
    assert(spark.catalog.tableExists(wt) &&
      !spark.catalog.tableExists(staging))

    // and the maintainer keeps working against the healed table
    SubstringDedup.appendBatch(corpus.drop(2).toDF("doc_id", "text"),
      1L, wt, mt)
    assert(SubstringDedup.windowFrequency(spark, wt)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      .values.max == 2L)
  }

  test("a legacy unpartitioned ledger is refused, not truncated") {
    import spark.implicits._
    val wt = "substr_ledger_legacy"
    val mt = "substr_marker_legacy"
    reset(wt, mt)

    // the pre-partitioned-layout shape: batch_id FIRST, no partitioning
    // — positional insertInto would mis-map columns and a static
    // overwrite would truncate every committed batch
    Seq((0L, "deadbeef", 2L)).toDF("batch_id", "ch", "nd")
      .write.saveAsTable(wt)
    Seq((0L, 2L)).toDF("batch_id", "n_docs").write.saveAsTable(mt)

    val ex = intercept[IllegalArgumentException] {
      SubstringDedup.appendBatch(corpus.take(2).toDF("doc_id", "text"),
        1L, wt, mt)
    }
    assert(ex.getMessage.contains("Migrate"),
      s"refusal must carry a migration message, got: ${ex.getMessage}")
    // the legacy ledger survives untouched
    assert(spark.table(wt).collect().toSeq ==
      Seq(org.apache.spark.sql.Row(0L, "deadbeef", 2L)))
  }

  test("a digest-type mismatch against the ledger is refused") {
    import spark.implicits._
    val wt = "substr_ledger_md5"
    val mt = "substr_marker_md5"
    reset(wt, mt)

    // md5 ledger (ch STRING) ...
    SubstringDedup.appendBatch(corpus.take(2).toDF("doc_id", "text"),
      0L, wt, mt)
    val before = SubstringDedup.windowFrequency(spark, wt).count()
    // ... fed xxhash64 BIGINT increments a batch later
    val ex = intercept[IllegalArgumentException] {
      SubstringDedup.appendBatch(corpus.drop(2).toDF("doc_id", "text"),
        1L, wt, mt, graft.queries.Dedup.XxDigest)
    }
    assert(ex.getMessage.contains("digest"))
    assert(SubstringDedup.windowFrequency(spark, wt).count() == before)
  }
}
