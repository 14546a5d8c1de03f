package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming LM-perplexity monitor (tx40's serving twin — the 9th
  * maintainer, third model-serving one): the batch side freezes the
  * corpus-trained bigram LM as a reference artifact; an ingest stream
  * then gets one quality row per micro-batch — mean cross-entropy
  * −avg(log₂ P(b|a)) over the batch's KNOWN bigrams, plus the unseen-
  * bigram mass (novel constructions the LM has no estimate for —
  * reported, not log-zeroed, the DriftMonitor device). This is the
  * CCNet-style quality gate run at the ingest seam: a scraper that
  * starts shipping gibberish shows up as a cross-entropy spike within
  * one micro-batch.
  *
  * Scale: the LM is |distinct bigrams| rows (language-bounded — the
  * tx34 saturation argument); each batch collapses to its own bigram
  * counts in one partial-agg pass, the LM join is a broadcast, and
  * the ledger gets ONE row per batch.
  *
  * Delivery: commit-marker pattern with orphan adoption (the
  * DriftMonitor device — the per-batch ledger write is a SINGLE row,
  * so partial visibility is not a failure mode the way SubstringDedup's
  * multi-row batches were). Requires a DURABLE `checkpointDir`
  * (stable batch ids). Reference atomicity: ONE artifact, totals
  * derived at serve time (the DriftMonitor crash-pairing fix applied
  * from birth).
  */
object PerplexityMonitor {

  private def bigramsOf(text: Column): Column = {
    val tk = graft.functions.TextFunctions.tokens(text)
    // same construction as TextFunctions.wordNgramsOf(tk, 2): the LM
    // and the scorer must tokenize and pair identically
    graft.functions.TextFunctions.wordNgramsOf(tk, 2)
  }

  /** Freeze the bigram LM: `<name>_lm` (bigram, cab) — raw adjacent-
    * pair counts; conditionals P(b|a) = cab / Σ_b' c(a,b') derive at
    * serve time from this ONE table (no second crash-pairable
    * artifact). Overwrites. */
  def buildLm(docs: DataFrame, name: String): Unit = {
    graft.expressions.VectorExpressions.ensureRegistered(docs.sparkSession)
    docs.select(explode(bigramsOf(col("text"))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cab"))
      .write.mode("overwrite").saveAsTable(s"${name}_lm")
  }

  /** Starts the monitor: one quality row per micro-batch of `newDocs`
    * (`doc_id`, `text`) into `ledgerTable`. */
  def maintain(newDocs: DataFrame, name: String, ledgerTable: String,
               markerTable: String, checkpointDir: String,
               erasureLedger: Option[String] = None): StreamingQuery = {
    require(checkpointDir.nonEmpty,
      "PerplexityMonitor.maintain requires a durable checkpointDir: " +
        "replay-skip markers are only valid against stable batch ids")
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        xentBatch(graft.index.Erasure.gateBatch(batch, erasureLedger),
          batchId, name, ledgerTable, markerTable)
      }
      .start()
  }

  /** One micro-batch: quality row vs the FROZEN LM, then the commit
    * marker. Replay-safe; crash window closed by adoption (single-row
    * ledger writes). */
  def xentBatch(batch: DataFrame, batchId: Long, name: String,
                ledgerTable: String, markerTable: String): Unit = {
    val spark = batch.sparkSession
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (!committed) {
      val orphaned = spark.catalog.tableExists(ledgerTable) &&
        !spark.table(ledgerTable).filter(col("batch_id") === batchId).isEmpty
      if (!orphaned)
        xentRow(batch, name)
          .withColumn("batch_id", lit(batchId))
          .select("batch_id", "n_bigrams", "n_unseen", "xent")
          .write.mode("append").saveAsTable(ledgerTable)
      batch.groupBy().agg(count(lit(1)).as("n_docs"))
        .withColumn("batch_id", lit(batchId))
        .select("batch_id", "n_docs")
        .write.mode("append").saveAsTable(markerTable)
    }
  }

  /** The 1-row quality frame for a static slice vs the frozen LM —
    * shared by the streaming path and batch spot-checks. Cross-entropy
    * is over the slice's LM-known bigrams (−avg log₂ P(b|a), the tx40
    * semantics); unseen bigrams are counted in `n_unseen`. Empty /
    * fully-unseen slices get xent = 0 rather than NULL. Rounds to 6
    * decimals (batch-bounded sums, ~1e-15 noise — the tx36 argument).
    */
  def xentRow(slice: DataFrame, name: String): DataFrame = {
    val spark = slice.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    val lm = spark.table(s"${name}_lm")
    // conditionals from the ONE frozen table: LM-to-LM join on the
    // first token, both sides |distinct bigrams| rows
    val ca = lm
      .groupBy(split(col("bigram"), " ").getItem(0).as("a"))
      .agg(sum("cab").as("cn"))
    val probs = lm
      .join(ca, split(col("bigram"), " ").getItem(0) === col("a"))
      .select(col("bigram"),
        (col("cab").cast("double") / col("cn").cast("double")).as("p"))
    val bt = slice.select(explode(bigramsOf(col("text"))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cb"))
    bt.join(broadcast(probs), Seq("bigram"), "left")
      .agg(
        coalesce(sum(col("cb")), lit(0L)).as("n_bigrams"),
        coalesce(sum(when(col("p").isNull, col("cb")).otherwise(0L)), lit(0L))
          .as("n_unseen"),
        graft.functions.ParityFunctions.duckRound(
          coalesce(
            -sum(when(col("p").isNotNull, col("cb") * log2(col("p")))
              .otherwise(0.0)) /
              greatest(sum(when(col("p").isNotNull, col("cb"))
                .otherwise(0L)).cast("double"), lit(1.0)),
            lit(0.0)), 6).as("xent"))
  }

  /** Committed quality rows only (empty when nothing has committed). */
  def xents(spark: SparkSession, ledgerTable: String,
            markerTable: String): DataFrame = {
    Freshness.refresh(spark, ledgerTable, markerTable)
    if (!spark.catalog.tableExists(ledgerTable) ||
        !spark.catalog.tableExists(markerTable))
      return spark.range(0)
        .select(col("id").as("batch_id"), lit(0L).as("n_bigrams"),
          lit(0L).as("n_unseen"), lit(0.0).as("xent"))
    spark.table(ledgerTable)
      .join(broadcast(spark.table(markerTable).select("batch_id")),
        Seq("batch_id"), "left_semi")
  }
}
