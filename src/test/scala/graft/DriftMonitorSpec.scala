package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.DriftMonitor

/** Streaming drift monitor vs the frozen reference distribution:
  * per-batch KL matches an independent Scala computation, a batch
  * distributed exactly like the reference drifts zero, novel tokens
  * land in unseen mass instead of poisoning the KL, replay is a
  * no-op, and the crash window adopts the orphan row.
  */
class DriftMonitorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def tokensOf(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  /** Independent reference computation: KL of a doc-slice vs the
    * corpus marginals, seen tokens renormalized, plain Scala math. */
  private def expectedDrift(slice: Seq[String], corpus: Seq[String])
      : (Long, Long, Double) = {
    val ref = corpus.flatMap(tokensOf).groupBy(identity)
      .map { case (t, g) => t -> g.size.toLong }
    val n = ref.values.sum.toDouble
    val bat = slice.flatMap(tokensOf).groupBy(identity)
      .map { case (t, g) => t -> g.size.toLong }
    val nTok = bat.values.sum
    val unseen = bat.collect { case (t, c) if !ref.contains(t) => c }.sum
    val nSeen = (nTok - unseen).toDouble
    val kl = bat.collect { case (t, c) if ref.contains(t) =>
      (c / nSeen) * math.log((c * n) / (nSeen * ref(t)))
    }.sum
    (nTok, unseen, kl)
  }

  test("streamed per-batch drift matches independent math; replay/crash safe") {
    import spark.implicits._
    TestWarehouse.reset(spark, "dm_ref", "dm_ref_total", "dm_ledger",
      "dm_marker")
    val docs = tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    DriftMonitor.buildReference(docs, "dm")

    val texts = docs.orderBy("doc_id").as[(Long, String)].collect()
      .map(_._2)
    val (half1, half2) = texts.splitAt(texts.length / 2)

    val stream = MemoryStream[(Long, String)](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-dm-ckpt").toString
    val q = DriftMonitor.maintain(
      stream.toDF().toDF("doc_id", "text"), "dm", "dm_ledger", "dm_marker",
      ckpt)
    try {
      stream.addData(half1.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toSeq)
      q.processAllAvailable()
      stream.addData(half2.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val served = DriftMonitor.drifts(spark, "dm_ledger", "dm_marker")
      .orderBy("batch_id").collect()
    assert(served.length == 2)
    Seq(half1.toSeq, half2.toSeq).zip(served).foreach { case (slice, row) =>
      val (nTok, unseen, kl) = expectedDrift(slice, texts.toSeq)
      assert(row.getLong(row.fieldIndex("n_tokens")) == nTok)
      assert(row.getLong(row.fieldIndex("n_unseen")) == unseen)
      assert(math.abs(row.getDouble(row.fieldIndex("kl")) - kl) < 1e-6,
        s"kl ${row.getDouble(row.fieldIndex("kl"))} != $kl")
      assert(row.getDouble(row.fieldIndex("kl")) >= 0.0)
    }

    // replay of a committed batch id is a no-op
    val before = spark.table("dm_ledger").count()
    DriftMonitor.driftBatch(
      Seq((0L, half1.head)).toDF("doc_id", "text"), 0L, "dm", "dm_ledger",
      "dm_marker")
    assert(spark.table("dm_ledger").count() == before)

    // crash window: ledger row landed, marker write died — replay
    // adopts the orphan row and only commits the marker
    val crash = Seq((7L, half2.head)).toDF("doc_id", "text")
    DriftMonitor.driftRow(crash, "dm")
      .withColumn("batch_id", lit(55L))
      .select("batch_id", "n_tokens", "n_unseen", "kl")
      .write.mode("append").saveAsTable("dm_ledger")
    val orphaned = spark.table("dm_ledger").count()
    DriftMonitor.driftBatch(crash, 55L, "dm", "dm_ledger", "dm_marker")
    assert(spark.table("dm_ledger").count() == orphaned,
      "crash-window replay duplicated the drift row")
    assert(DriftMonitor.drifts(spark, "dm_ledger", "dm_marker")
      .filter(col("batch_id") === 55L).count() == 1L)
    spark.catalog.clearCache()
  }

  test("reference is ONE artifact: stale paired totals cannot skew KL") {
    // crash-pairing regression (ADVICE r10): the old layout wrote
    // <name>_ref then <name>_ref_total as two separate tables, so a
    // rebuild that crashed between the writes left a NEW ref silently
    // normalized by an OLD total. Now n derives from the ref table
    // itself — prove it by planting an adversarial stale total under
    // the old name and checking (a) buildReference never writes it,
    // (b) driftRow's KL is identical with and without it present.
    import spark.implicits._
    TestWarehouse.reset(spark, "dp_ref", "dp_ref_total")
    val docs = tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    DriftMonitor.buildReference(docs, "dp")
    assert(!spark.catalog.tableExists("dp_ref_total"),
      "buildReference must not write a second, crash-pairable artifact")

    val slice = docs.limit(5).localCheckpoint(true)
    val clean = DriftMonitor.driftRow(slice, "dp").collect().head
    // the stale total an interrupted rebuild could have left behind:
    // wildly wrong n — would shift every log term if it were read
    Seq(Tuple1(1L)).toDF("n").write.saveAsTable("dp_ref_total")
    val stale = DriftMonitor.driftRow(slice, "dp").collect().head
    assert(clean == stale,
      s"driftRow must ignore legacy paired totals: $clean vs $stale")
    assert(clean.getDouble(clean.fieldIndex("kl")) > 0.0 ||
      clean.getLong(clean.fieldIndex("n_tokens")) == 0L)
    TestWarehouse.reset(spark, "dp_ref", "dp_ref_total")
    spark.catalog.clearCache()
  }

  test("a batch distributed like the reference drifts zero; novel tokens -> unseen") {
    import spark.implicits._
    TestWarehouse.reset(spark, "dz_ref", "dz_ref_total")
    val docs = tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    DriftMonitor.buildReference(docs, "dz")

    // the WHOLE corpus as one slice: P_batch == P_ref exactly
    val whole = DriftMonitor.driftRow(docs, "dz").collect().head
    assert(whole.getLong(whole.fieldIndex("n_unseen")) == 0L)
    assert(whole.getDouble(whole.fieldIndex("kl")) == 0.0)

    // a slice of only novel tokens: all mass unseen, kl defined (0)
    val novel = Seq((1L, "zzqx wwvk zzqx")).toDF("doc_id", "text")
    val r = DriftMonitor.driftRow(novel, "dz").collect().head
    assert(r.getLong(r.fieldIndex("n_tokens")) == 3L)
    assert(r.getLong(r.fieldIndex("n_unseen")) == 3L)
    assert(r.getDouble(r.fieldIndex("kl")) == 0.0)
    spark.catalog.clearCache()
  }
}
