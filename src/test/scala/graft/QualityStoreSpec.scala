package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.index.QualityStore
import graft.streaming.QualityMaintenance

/** The stored classifier model must honor the batch contract: scoring
  * under the frozen weights equals pl23's fresh-trained scores bit for
  * bit (same hashing/smoothing/rounding via the shared primitives),
  * the model stays within its 4096-row broadcast bound, streamed
  * micro-batch scores equal batch scores, and a replayed batch id is a
  * no-op (commit marker).
  */
class QualityStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def labeledCorpus() = {
    val docs = tables.load(spark, dir, "documents")
    docs.select(col("doc_id"),
      (expr("substring(source, 4)").cast("int") % 2).as("good"),
      col("text"))
  }

  test("stored-model scores == fresh pl23 scores; model bounded") {
    TestWarehouse.reset(spark, "qs_weights")
    QualityStore.build(labeledCorpus(), "qs")
    assert(QualityStore.modelRows(spark, "qs") <= 4096L)

    val docs = tables.load(spark, dir, "documents")
    val stored = QualityStore.score(
      docs.select(col("doc_id"), col("text")), "qs")
      .orderBy("doc_id").collect()
    val fresh = SparkEntry.queries("pl23_quality_classifier")(spark, dir)
      .collect()
    assert(stored.length == fresh.length)
    stored.zip(fresh).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getInt(1) == b.getInt(1))
      assert(a.getDouble(2) == b.getDouble(2),
        s"doc ${a.getLong(0)}: stored ${a.getDouble(2)} != fresh ${b.getDouble(2)}")
      assert(a.getInt(3) == b.getInt(3))
    }
    spark.catalog.clearCache()
  }

  test("streamed scores equal batch scores; replay is a no-op") {
    import spark.implicits._
    TestWarehouse.reset(spark, "qm_weights", "qm_scores", "qm_marker")
    QualityStore.build(labeledCorpus(), "qm")

    val docs = tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val rows = docs.as[(Long, String)].collect()
    val (half1, half2) = rows.splitAt(rows.length / 2)

    val stream = MemoryStream[(Long, String)](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-qm-ckpt").toString
    val q = QualityMaintenance.maintain(
      stream.toDF().toDF("doc_id", "text"), "qm", "qm_scores", "qm_marker",
      ckpt)
    try {
      stream.addData(half1.toSeq)
      q.processAllAvailable()
      stream.addData(half2.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = QualityMaintenance.scores(spark, "qm_scores", "qm_marker")
      .orderBy("doc_id").collect()
    val batch = QualityStore.score(docs, "qm").orderBy("doc_id").collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getDouble(a.fieldIndex("score")) ==
        b.getDouble(b.fieldIndex("score")))
    }

    // replaying a committed batch id must not duplicate scores
    val before = spark.table("qm_scores").count()
    QualityMaintenance.scoreBatch(
      half1.take(3).toSeq.toDF("doc_id", "text"), 0L, "qm", "qm_scores",
      "qm_marker")
    assert(spark.table("qm_scores").count() == before,
      "replayed batch appended duplicate scores")

    // crash window: scores appended but the marker write died — the
    // replay must ADOPT the orphan rows (no duplicate append) and
    // only commit the marker
    val crashDocs = half2.take(3).zipWithIndex
      .map { case ((_, text), i) => (999001L + i, text) }
      .toSeq.toDF("doc_id", "text")
    graft.index.QualityStore.score(crashDocs, "qm")
      .withColumn("batch_id", lit(99L))
      .write.mode("append").saveAsTable("qm_scores")
    val orphaned = spark.table("qm_scores").count()
    QualityMaintenance.scoreBatch(crashDocs, 99L, "qm", "qm_scores",
      "qm_marker")
    assert(spark.table("qm_scores").count() == orphaned,
      "crash-window replay duplicated the orphan batch")
    assert(!spark.table("qm_marker").filter(col("batch_id") === 99L).isEmpty,
      "crash-window replay did not commit the marker")
    val batch99 = QualityMaintenance.scores(spark, "qm_scores", "qm_marker")
      .join(crashDocs.select("doc_id"), "doc_id").count()
    assert(batch99 == 3L, "adopted batch not served exactly once")
    spark.catalog.clearCache()
  }

  test("scores-ledger compaction: fewer files, identical serving") {
    import spark.implicits._
    TestWarehouse.reset(spark, "qc_weights", "qc_scores", "qc_marker")
    QualityStore.build(labeledCorpus(), "qc")
    val docs = tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    docs.grouped(docs.length / 3 + 1).zipWithIndex.foreach { case (g, i) =>
      QualityMaintenance.scoreBatch(g.toSeq.toDF("doc_id", "text"),
        i.toLong, "qc", "qc_scores", "qc_marker")
    }
    def files(): Int = {
      val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
      val d = new java.io.File(
        if (wh.getScheme == null) wh.toString else wh.getPath, "qc_scores")
      d.listFiles().count(_.getName.endsWith(".parquet"))
    }
    val before = QualityMaintenance.scores(spark, "qc_scores", "qc_marker")
      .orderBy("doc_id").collect().toSeq
    val filesBefore = files()
    QualityMaintenance.compact(spark, "qc_scores")
    val after = QualityMaintenance.scores(spark, "qc_scores", "qc_marker")
      .orderBy("doc_id").collect().toSeq
    assert(after == before, "compaction changed served scores")
    assert(files() < filesBefore,
      s"compaction did not shrink files: ${files()} vs $filesBefore")

    // simulate the one vulnerable compact step — crash between DROP
    // and RENAME: stage a complete copy, drop the live table, and the
    // next read must adopt the staged ledger (recoverStaging)
    spark.table("qc_scores").write.mode("overwrite")
      .saveAsTable("qc_scores_staging")
    spark.sql("DROP TABLE qc_scores")
    val recovered = QualityMaintenance.scores(spark, "qc_scores", "qc_marker")
      .orderBy("doc_id").collect().toSeq
    assert(recovered == before, "drop-to-rename crash lost the ledger")
    assert(!spark.catalog.tableExists("qc_scores_staging"))
    spark.catalog.clearCache()
  }

  test("serving with no committed batches is empty, not an error") {
    TestWarehouse.reset(spark, "qe_scores", "qe_marker")
    assert(QualityMaintenance.scores(spark, "qe_scores", "qe_marker")
      .isEmpty)
  }
}
