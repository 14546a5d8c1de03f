package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.PsiMonitor

/** Streaming PSI monitor vs the frozen length-histogram reference:
  * per-batch PSI matches an independent Scala computation, a batch
  * distributed exactly like the reference scores zero, novel-length
  * docs land in unseen mass instead of poisoning the sum, replay is a
  * no-op, and the crash window adopts the orphan row.
  */
class PsiMonitorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Independent PSI: plain Scala math over the same convention —
    * seen buckets renormalized, unseen/missing reported not summed. */
  private def expectedPsi(slice: Seq[Long], corpus: Seq[Long])
      : (Long, Long, Long, Double) = {
    def hist(xs: Seq[Long]): Map[Long, Long] =
      xs.groupBy(_ / PsiMonitor.BucketChars)
        .map { case (b, g) => b -> g.size.toLong }
    val ref = hist(corpus)
    val nR = ref.values.sum.toDouble
    val bat = hist(slice)
    val unseen = bat.collect { case (b, c) if !ref.contains(b) => c }.sum
    val nSeen = (bat.values.sum - unseen).toDouble
    val missing = ref.keys.count(b => !bat.contains(b)).toLong
    val psi = bat.collect { case (b, c) if ref.contains(b) =>
      (c / nSeen - ref(b) / nR) * math.log((c * nR) / (nSeen * ref(b)))
    }.sum
    (bat.values.sum, unseen, missing, psi)
  }

  test("streamed per-batch PSI matches independent math; replay/crash safe") {
    import spark.implicits._
    TestWarehouse.reset(spark, "pm_ref", "pm_ledger", "pm_marker")
    val docs = tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    PsiMonitor.buildReference(docs, "pm")

    val lens = docs.orderBy("doc_id").as[(Long, Long)].collect().map(_._2)
    val (half1, half2) = lens.splitAt(lens.length / 2)

    val stream = MemoryStream[(Long, Long)](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-pm-ckpt").toString
    val q = PsiMonitor.maintain(
      stream.toDF().toDF("doc_id", "n_chars"), "pm", "pm_ledger",
      "pm_marker", ckpt)
    try {
      stream.addData(half1.zipWithIndex.map { case (c, i) => (i.toLong, c) }.toSeq)
      q.processAllAvailable()
      stream.addData(half2.zipWithIndex.map { case (c, i) => (i.toLong, c) }.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val served = PsiMonitor.psis(spark, "pm_ledger", "pm_marker")
      .orderBy("batch_id").collect()
    assert(served.length == 2)
    Seq(half1.toSeq, half2.toSeq).zip(served).foreach { case (slice, row) =>
      val (nDocs, unseen, missing, psi) = expectedPsi(slice, lens.toSeq)
      assert(row.getLong(row.fieldIndex("n_docs")) == nDocs)
      assert(row.getLong(row.fieldIndex("n_unseen")) == unseen)
      assert(row.getLong(row.fieldIndex("n_missing_buckets")) == missing)
      assert(math.abs(row.getDouble(row.fieldIndex("psi")) - psi) < 1e-6,
        s"psi ${row.getDouble(row.fieldIndex("psi"))} != $psi")
      // PSI is a sum of (p-q)ln(p/q) terms, each >= 0
      assert(row.getDouble(row.fieldIndex("psi")) >= 0.0)
    }

    // replay of a committed batch id is a no-op
    val before = spark.table("pm_ledger").count()
    PsiMonitor.psiBatch(
      Seq((0L, half1.head)).toDF("doc_id", "n_chars"), 0L, "pm",
      "pm_ledger", "pm_marker")
    assert(spark.table("pm_ledger").count() == before)

    // crash window: ledger row landed, marker write died — replay
    // adopts the orphan row and only commits the marker
    val crash = Seq((7L, half2.head)).toDF("doc_id", "n_chars")
    PsiMonitor.psiRow(crash, "pm")
      .withColumn("batch_id", lit(55L))
      .select("batch_id", "n_docs", "n_unseen", "n_missing_buckets", "psi")
      .write.mode("append").saveAsTable("pm_ledger")
    val orphaned = spark.table("pm_ledger").count()
    // the orphan is invisible to serving until its marker commits
    assert(PsiMonitor.psis(spark, "pm_ledger", "pm_marker")
      .filter(col("batch_id") === 55L).count() == 0L,
      "uncommitted orphan row must not serve")
    PsiMonitor.psiBatch(crash, 55L, "pm", "pm_ledger", "pm_marker")
    assert(spark.table("pm_ledger").count() == orphaned,
      "crash-window replay duplicated the PSI row")
    assert(PsiMonitor.psis(spark, "pm_ledger", "pm_marker")
      .filter(col("batch_id") === 55L).count() == 1L)
    spark.catalog.clearCache()
  }

  test("a batch distributed like the reference scores zero; novel lengths -> unseen") {
    import spark.implicits._
    TestWarehouse.reset(spark, "pz_ref")
    val docs = tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    PsiMonitor.buildReference(docs, "pz")

    // the WHOLE corpus as one slice: P_batch == P_ref exactly
    val whole = PsiMonitor.psiRow(docs, "pz").collect().head
    assert(whole.getLong(whole.fieldIndex("n_unseen")) == 0L)
    assert(whole.getLong(whole.fieldIndex("n_missing_buckets")) == 0L)
    assert(whole.getDouble(whole.fieldIndex("psi")) == 0.0)

    // docs far outside the corpus length range: all mass unseen, every
    // reference bucket missed, psi defined (0)
    val novel = Seq((1L, 90001L), (2L, 90002L), (3L, 90001L))
      .toDF("doc_id", "n_chars")
    val r = PsiMonitor.psiRow(novel, "pz").collect().head
    assert(r.getLong(r.fieldIndex("n_docs")) == 3L)
    assert(r.getLong(r.fieldIndex("n_unseen")) == 3L)
    assert(r.getLong(r.fieldIndex("n_missing_buckets")) ==
      spark.table("pz_ref").count())
    assert(r.getDouble(r.fieldIndex("psi")) == 0.0)
    spark.catalog.clearCache()
  }

  test("truncation incident: a clipped feed alarms within one batch") {
    import spark.implicits._
    TestWarehouse.reset(spark, "pt_ref")
    val docs = tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    PsiMonitor.buildReference(docs, "pt")

    // the classic incident PSI exists to catch: a scraper starts
    // clipping every doc to 100 chars — same docs, collapsed shape
    val clipped = docs.select(col("doc_id"),
      least(col("n_chars"), lit(100L)).as("n_chars"))
    val r = PsiMonitor.psiRow(clipped, "pt").collect().head
    // industry convention: PSI > 0.25 = major shift
    assert(r.getDouble(r.fieldIndex("psi")) > 0.25,
      s"clipped feed must alarm: psi=${r.getDouble(r.fieldIndex("psi"))}")
    assert(r.getLong(r.fieldIndex("n_unseen")) == 0L)
    spark.catalog.clearCache()
  }
}
