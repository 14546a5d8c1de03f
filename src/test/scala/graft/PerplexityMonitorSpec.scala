package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.PerplexityMonitor

/** Streaming perplexity monitor vs the frozen bigram LM: per-batch
  * cross-entropy matches an independent Scala computation, the whole
  * training corpus as one slice reproduces the corpus-level
  * cross-entropy with zero unseen mass, all-novel bigrams land in
  * unseen mass instead of poisoning the score, replay is a no-op, and
  * the crash window adopts the orphan row.
  */
class PerplexityMonitorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def tokensOf(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  private def bigramsOf(text: String): Seq[String] = {
    val t = tokensOf(text)
    t.zip(t.drop(1)).map { case (a, b) => s"$a $b" }
  }

  /** Independent reference: batch cross-entropy vs corpus-trained LM,
    * plain Scala math — −Σ c_b·log₂ P(b|a) / Σ c_b over LM-known
    * bigrams, unseen counted separately. */
  private def expectedXent(slice: Seq[String], corpus: Seq[String])
      : (Long, Long, Double) = {
    val lm = corpus.flatMap(bigramsOf).groupBy(identity)
      .map { case (g, xs) => g -> xs.size.toLong }
    val ca = lm.groupBy(_._1.split(" ")(0)).map { case (a, m) =>
      a -> m.values.sum.toDouble
    }
    val bat = slice.flatMap(bigramsOf).groupBy(identity)
      .map { case (g, xs) => g -> xs.size.toLong }
    val nb = bat.values.sum
    val unseen = bat.collect { case (g, c) if !lm.contains(g) => c }.sum
    val seen = (nb - unseen).toDouble
    val x =
      if (seen == 0) 0.0
      else -bat.collect { case (g, c) if lm.contains(g) =>
        c * (math.log(lm(g) / ca(g.split(" ")(0))) / math.log(2.0))
      }.sum / seen
    (nb, unseen, x)
  }

  test("streamed per-batch xent matches independent math; replay/crash safe") {
    import spark.implicits._
    TestWarehouse.reset(spark, "pm_lm", "pm_ledger", "pm_marker")
    val docs = tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    PerplexityMonitor.buildLm(docs, "pm")

    val texts = docs.orderBy("doc_id").as[(Long, String)].collect().map(_._2)
    val (half1, half2) = texts.splitAt(texts.length / 2)

    val stream = MemoryStream[(Long, String)](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-pm-ckpt").toString
    val q = PerplexityMonitor.maintain(
      stream.toDF().toDF("doc_id", "text"), "pm", "pm_ledger", "pm_marker",
      ckpt)
    try {
      stream.addData(half1.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toSeq)
      q.processAllAvailable()
      stream.addData(half2.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val served = PerplexityMonitor.xents(spark, "pm_ledger", "pm_marker")
      .orderBy("batch_id").collect()
    assert(served.length == 2)
    Seq(half1.toSeq, half2.toSeq).zip(served).foreach { case (slice, row) =>
      val (nb, unseen, x) = expectedXent(slice, texts.toSeq)
      assert(row.getLong(row.fieldIndex("n_bigrams")) == nb)
      assert(row.getLong(row.fieldIndex("n_unseen")) == unseen)
      assert(math.abs(row.getDouble(row.fieldIndex("xent")) - x) < 1e-6,
        s"xent ${row.getDouble(row.fieldIndex("xent"))} != $x")
      assert(row.getDouble(row.fieldIndex("xent")) > 0.0,
        "real text under a real LM must have positive cross-entropy")
    }

    // replay of a committed batch id is a no-op
    val before = spark.table("pm_ledger").count()
    PerplexityMonitor.xentBatch(
      Seq((0L, half1.head)).toDF("doc_id", "text"), 0L, "pm", "pm_ledger",
      "pm_marker")
    assert(spark.table("pm_ledger").count() == before)

    // crash window: ledger row landed, marker write died — replay
    // adopts the orphan row and only commits the marker
    val crash = Seq((7L, half2.head)).toDF("doc_id", "text")
    PerplexityMonitor.xentRow(crash, "pm")
      .withColumn("batch_id", lit(55L))
      .select("batch_id", "n_bigrams", "n_unseen", "xent")
      .write.mode("append").saveAsTable("pm_ledger")
    val orphaned = spark.table("pm_ledger").count()
    PerplexityMonitor.xentBatch(crash, 55L, "pm", "pm_ledger", "pm_marker")
    assert(spark.table("pm_ledger").count() == orphaned,
      "crash-window replay duplicated the quality row")
    assert(PerplexityMonitor.xents(spark, "pm_ledger", "pm_marker")
      .filter(col("batch_id") === 55L).count() == 1L)
    spark.catalog.clearCache()
  }

  test("whole corpus reproduces corpus xent, zero unseen; novel -> unseen") {
    import spark.implicits._
    TestWarehouse.reset(spark, "pz_lm")
    val docs = tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    PerplexityMonitor.buildLm(docs, "pz")

    val texts = docs.as[(Long, String)].collect().map(_._2).toSeq
    val (nb, unseen, x) = expectedXent(texts, texts)
    val whole = PerplexityMonitor.xentRow(docs, "pz").collect().head
    assert(whole.getLong(whole.fieldIndex("n_bigrams")) == nb)
    assert(whole.getLong(whole.fieldIndex("n_unseen")) == 0L && unseen == 0L,
      "self-trained LM knows every corpus bigram")
    assert(math.abs(whole.getDouble(whole.fieldIndex("xent")) - x) < 1e-6)

    // a slice of only novel bigrams: all mass unseen, xent defined (0)
    val novel = Seq((1L, "zzqx wwvk zzqx")).toDF("doc_id", "text")
    val r = PerplexityMonitor.xentRow(novel, "pz").collect().head
    assert(r.getLong(r.fieldIndex("n_bigrams")) == 2L)
    assert(r.getLong(r.fieldIndex("n_unseen")) == 2L)
    assert(r.getDouble(r.fieldIndex("xent")) == 0.0)
    spark.catalog.clearCache()
  }
}
