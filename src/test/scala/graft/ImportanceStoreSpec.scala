package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.index.ImportanceStore
import graft.streaming.ImportanceMaintenance

/** The frozen DSIR ratio artifact must honor the batch contract:
  * weighing under the stored ratios equals pl27's fresh-computed logw
  * bit for bit on the reference corpus (zero OOV there by
  * construction), novel vocabulary is REPORTED per doc rather than
  * silently skipped, streamed micro-batch weights equal batch weights,
  * a replayed batch id is a no-op, the append-vs-marker crash window
  * adopts orphans, and compaction's stage-then-swap heals.
  */
class ImportanceStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def refDocs() = tables.load(spark, dir, "documents")
    .select("doc_id", "source", "text")

  test("stored-ratio weights == fresh pl27 logw; OOV zero on the reference corpus") {
    TestWarehouse.reset(spark, "is_ratios")
    ImportanceStore.build(refDocs(), "is")
    // vocabulary-sized, not corpus-sized: the synthetic language is
    // ~50 base words (+ injected families); far under the doc count
    val vocabRows = ImportanceStore.modelRows(spark, "is")
    assert(vocabRows > 0 && vocabRows < tables.load(spark, dir, "documents").count())

    val stored = ImportanceStore.score(
      tables.load(spark, dir, "documents").select("doc_id", "text"), "is")
      .orderBy("doc_id").collect()
    val fresh = SparkEntry.queries("pl27_importance_resample")(spark, dir)
      .collect()
    assert(stored.length == fresh.length)
    stored.zip(fresh).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getLong(a.fieldIndex("n_toks")) ==
        b.getLong(b.fieldIndex("n_toks")))
      assert(a.getLong(a.fieldIndex("n_oov")) == 0L,
        s"doc ${a.getLong(0)}: reference-corpus token counted OOV")
      assert(a.getDouble(a.fieldIndex("logw")) ==
        b.getDouble(b.fieldIndex("logw")),
        s"doc ${a.getLong(0)}: stored ${a.getDouble(a.fieldIndex("logw"))} " +
          s"!= fresh ${b.getDouble(b.fieldIndex("logw"))}")
    }
    spark.catalog.clearCache()
  }

  test("novel vocabulary reports as n_oov, never a silent skip") {
    import spark.implicits._
    TestWarehouse.reset(spark, "io_ratios")
    ImportanceStore.build(refDocs(), "io")
    val out = ImportanceStore.score(
      Seq((900001L, "qqqxyz spark qqqzzz")).toDF("doc_id", "text"), "io")
      .collect().head
    assert(out.getLong(out.fieldIndex("n_toks")) == 3L)
    assert(out.getLong(out.fieldIndex("n_oov")) == 2L,
      s"two novel tokens must report OOV: $out")
  }

  test("streamed weights equal batch weights; replay no-op; orphan adopted") {
    import spark.implicits._
    TestWarehouse.reset(spark, "im_ratios", "im_weights", "im_marker")
    ImportanceStore.build(refDocs(), "im")

    val docs = tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val rows = docs.as[(Long, String)].collect()
    val (half1, half2) = rows.splitAt(rows.length / 2)

    val stream = MemoryStream[(Long, String)](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-im-ckpt").toString
    val q = ImportanceMaintenance.maintain(
      stream.toDF().toDF("doc_id", "text"), "im", "im_weights", "im_marker",
      ckpt)
    try {
      stream.addData(half1.toSeq)
      q.processAllAvailable()
      stream.addData(half2.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = ImportanceMaintenance
      .weights(spark, "im_weights", "im_marker")
      .orderBy("doc_id").collect()
    val batch = ImportanceStore.score(docs, "im").orderBy("doc_id").collect()
    assert(streamed.length == batch.length && streamed.nonEmpty)
    streamed.zip(batch).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getDouble(a.fieldIndex("logw")) ==
        b.getDouble(b.fieldIndex("logw")))
    }

    // replayed batch id: no duplicate rows
    val before = spark.table("im_weights").count()
    ImportanceMaintenance.scoreBatch(
      half1.toSeq.toDF("doc_id", "text"), 0L, "im", "im_weights", "im_marker")
    assert(spark.table("im_weights").count() == before,
      "replayed committed batch duplicated weights")

    // crash window: weights appended, marker missing → replay adopts
    ImportanceStore.score(
      Seq((910001L, "spark table")).toDF("doc_id", "text"), "im")
      .withColumn("batch_id", lit(7L))
      .write.mode("append").saveAsTable("im_weights")
    assert(ImportanceMaintenance.weights(spark, "im_weights", "im_marker")
      .filter(col("doc_id") === 910001L).isEmpty,
      "orphan (uncommitted) weights leaked into serving")
    ImportanceMaintenance.scoreBatch(
      Seq((910001L, "spark table")).toDF("doc_id", "text"),
      7L, "im", "im_weights", "im_marker")
    val adopted = spark.table("im_weights")
      .filter(col("doc_id") === 910001L).count()
    assert(adopted == 1L, s"crash-window replay must adopt, got $adopted rows")
    assert(!ImportanceMaintenance.weights(spark, "im_weights", "im_marker")
      .filter(col("doc_id") === 910001L).isEmpty)
  }

  test("compaction preserves serving; recoverStaging heals the swap window") {
    import spark.implicits._
    TestWarehouse.reset(spark, "ic_ratios", "ic_weights", "ic_marker",
      "ic_weights_staging")
    ImportanceStore.build(refDocs(), "ic")
    (0 to 2).foreach { b =>
      ImportanceMaintenance.scoreBatch(
        Seq((100L + b, s"spark table batch$b")).toDF("doc_id", "text"),
        b.toLong, "ic", "ic_weights", "ic_marker")
    }
    val before = ImportanceMaintenance
      .weights(spark, "ic_weights", "ic_marker")
      .orderBy("doc_id").collect().toSeq
    ImportanceMaintenance.compact(spark, "ic_weights")
    assert(ImportanceMaintenance.weights(spark, "ic_weights", "ic_marker")
      .orderBy("doc_id").collect().toSeq == before,
      "compaction changed serving")

    // vulnerable instant: staged copy complete, live table dropped
    spark.table("ic_weights").write.mode("overwrite")
      .saveAsTable("ic_weights_staging")
    spark.sql("DROP TABLE ic_weights")
    assert(ImportanceMaintenance.weights(spark, "ic_weights", "ic_marker")
      .orderBy("doc_id").collect().toSeq == before,
      "serve must adopt the staged ledger")
    assert(spark.catalog.tableExists("ic_weights") &&
      !spark.catalog.tableExists("ic_weights_staging"))
  }
}
