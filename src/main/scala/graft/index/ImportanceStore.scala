package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-once/serve-many DSIR artifact — the importance-sampling twin
  * of `QualityStore` (classifier weights) and `TokenizerStore` (merge
  * table): pl27's add-1-smoothed target-vs-corpus unigram log2
  * likelihood ratios computed once over the reference corpus and
  * frozen as a `<name>_ratios` table, so weighing any later frame (a
  * re-crawl batch, a candidate shard, a document stream) costs ONE
  * broadcast join + per-doc mean and never re-reads the reference
  * corpus. The table is corpus-VOCABULARY-sized (language saturation,
  * the tx34/tx40 argument — 441→465 distinct bigrams sf0.01→sf0.1
  * while the corpus scales away); a web-scale deployment bounds it
  * hard with the pl23 feature-hashing trick.
  *
  * Single source of truth: tokenization, smoothing and the ratio
  * formula all come from `Pipeline.dsirTokens/dsirLogRatios/
  * dsirScored` — the exact code pl27's oracle-checked query runs, so
  * a stored-ratio weight equals the fresh-computed weight bit for bit
  * (pinned by `ImportanceStoreSpec`).
  */
object ImportanceStore {

  /** Compute the log-ratio table over `refDocs` (`doc_id`, `source`,
    * `text` — the reference corpus with its trusted-domain sources)
    * and save it as `<name>_ratios` (w, lr). Overwrites. */
  def build(refDocs: DataFrame, name: String): Unit = {
    import org.apache.spark.storage.StorageLevel
    val t = graft.queries.Pipeline.dsirTokens(refDocs)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try graft.queries.Pipeline.dsirLogRatios(t)
      .write.mode("overwrite").saveAsTable(s"${name}_ratios")
    finally t.unpersist()
  }

  /** Weigh a (doc_id, text) frame under the FROZEN stored ratios:
    * (doc_id, n_toks, n_oov, logw), unsorted — callers order. n_toks
    * counts ALL the doc's tokens, n_oov the ones absent from the
    * stored vocabulary (novel vocabulary is REPORTED, not silently
    * skipped — the DriftMonitor convention); logw is the mean lr over
    * known tokens, rounded as pl27 reports it. The plan touches only
    * the input frame and the vocab-sized ratio table. */
  def score(docs: DataFrame, name: String): DataFrame = {
    val spark = docs.sparkSession
    val t = docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
    val sc = t.join(broadcast(spark.table(s"${name}_ratios")), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        sum(when(col("lr").isNull, lit(1L)).otherwise(lit(0L))).as("n_oov"),
        avg(col("lr")).as("s")) // avg skips NULLs: mean over known only
    docs.select(col("doc_id"))
      .join(sc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        graft.functions.ParityFunctions
          .duckRound(coalesce(col("s"), lit(0.0)), 6).as("logw"))
  }

  /** Stored artifact size — the broadcast-safety bound a deployment
    * monitors (vocabulary-sized; must saturate, not track corpus). */
  def modelRows(spark: SparkSession, name: String): Long =
    spark.table(s"${name}_ratios").count()
}
