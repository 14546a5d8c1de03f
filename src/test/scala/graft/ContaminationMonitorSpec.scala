package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.ContaminationMonitor

/** Streaming contamination monitor vs the frozen eval 5-gram set:
  * per-batch counts match an independent Scala computation, a clean
  * batch reports zeros, a batch containing an eval doc verbatim is
  * flagged, replay is a no-op, and the crash window adopts the orphan
  * row.
  */
class ContaminationMonitorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def tokensOf(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  private def ngramsOf(text: String): Seq[String] = {
    val t = tokensOf(text)
    if (t.length < 5) Seq.empty
    else t.sliding(5).map(_.mkString(" ")).toSeq
  }

  /** Independent reference: (n_docs, n_dirty, n_hits) of a slice
    * against an eval corpus's distinct 5-grams, plain Scala. */
  private def expected(slice: Seq[String], eval: Seq[String])
      : (Long, Long, Long) = {
    val ref = eval.flatMap(ngramsOf).toSet
    val perDoc = slice.map(t => ngramsOf(t).count(ref.contains))
    (slice.size.toLong, perDoc.count(_ > 0).toLong, perDoc.map(_.toLong).sum)
  }

  test("streamed per-batch contamination matches independent math; replay/crash safe") {
    import spark.implicits._
    TestWarehouse.reset(spark, "cm_ref", "cm_ledger", "cm_marker")
    val docs = tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id").as[(Long, String)].collect()
    // "benchmark" = the last 5 corpus docs; the stream ships (a) clean
    // SYNTHETIC docs (unique tokens — corpus docs could share a 5-gram
    // with an eval doc through the testdata's own duplicate families),
    // (b) one eval doc verbatim (the leak), (c) a doc ending with an
    // eval doc's first 6 tokens (a partial leak — ≥2 shared 5-grams)
    val eval = docs.takeRight(5).map(_._2).toSeq
    ContaminationMonitor.buildRef(eval.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"), "cm")

    val clean = (0 until 4).map(i =>
      (0 until 12).map(j => s"cleantok${i}x$j").mkString(" "))
    val partial = clean.head + " " + tokensOf(eval.head).take(6).mkString(" ")
    val batch1 = clean
    val batch2 = Seq(eval(1), partial, clean(2))

    val stream = MemoryStream[(Long, String)](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-cm-ckpt").toString
    val q = ContaminationMonitor.maintain(
      stream.toDF().toDF("doc_id", "text"), "cm", "cm_ledger", "cm_marker",
      ckpt)
    try {
      stream.addData(batch1.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      q.processAllAvailable()
      stream.addData(batch2.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      q.processAllAvailable()
    } finally q.stop()

    val served = ContaminationMonitor
      .contamination(spark, "cm_ledger", "cm_marker")
      .orderBy("batch_id").collect()
    assert(served.length == 2)
    Seq(batch1, batch2).zip(served).foreach { case (slice, row) =>
      val (nd, dirty, hits) = expected(slice, eval)
      assert(row.getLong(row.fieldIndex("n_docs")) == nd)
      assert(row.getLong(row.fieldIndex("n_dirty")) == dirty)
      assert(row.getLong(row.fieldIndex("n_hits")) == hits)
    }
    // the clean batch really is clean, and the leak batch really flags:
    // a monitor that always reports 0 (or always flags) cannot pass
    assert(served(0).getLong(served(0).fieldIndex("n_dirty")) == 0L)
    assert(served(1).getLong(served(1).fieldIndex("n_dirty")) == 2L,
      "verbatim eval doc + partial leak must both flag")
    val (_, _, vHits) = expected(Seq(eval(1)), eval)
    assert(vHits == ngramsOf(eval(1)).size.toLong,
      "every 5-gram of a verbatim eval doc is a hit")

    // replay of a committed batch id is a no-op
    val before = spark.table("cm_ledger").count()
    ContaminationMonitor.contaminationBatch(
      Seq((0L, batch1.head)).toDF("doc_id", "text"), 0L, "cm",
      "cm_ledger", "cm_marker")
    assert(spark.table("cm_ledger").count() == before)

    // crash window: ledger row landed, marker write died — replay
    // adopts the orphan row and only commits the marker
    val crash = Seq((7L, partial)).toDF("doc_id", "text")
    ContaminationMonitor.contaminationRow(crash, "cm")
      .withColumn("batch_id", lit(55L))
      .select("batch_id", "n_docs", "n_dirty", "n_hits")
      .write.mode("append").saveAsTable("cm_ledger")
    val orphaned = spark.table("cm_ledger").count()
    ContaminationMonitor.contaminationBatch(
      crash, 55L, "cm", "cm_ledger", "cm_marker")
    assert(spark.table("cm_ledger").count() == orphaned,
      "crash-window replay duplicated the contamination row")
    assert(ContaminationMonitor.contamination(spark, "cm_ledger", "cm_marker")
      .filter(col("batch_id") === 55L).count() == 1L)
    spark.catalog.clearCache()
  }

  test("empty serve before any commit; ref is eval-sized") {
    import spark.implicits._
    TestWarehouse.reset(spark, "cz_ref", "cz_ledger", "cz_marker")
    assert(ContaminationMonitor
      .contamination(spark, "cz_ledger", "cz_marker").count() == 0L)
    val eval = Seq((0L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    ContaminationMonitor.buildRef(eval, "cz")
    // 6 tokens -> exactly 2 distinct 5-grams: the artifact carries the
    // eval set's n-grams and nothing else (broadcast-safety bound)
    assert(spark.table("cz_ref").count() == 2L)
    spark.catalog.clearCache()
  }
}
