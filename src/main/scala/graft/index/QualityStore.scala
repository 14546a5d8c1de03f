package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-once/serve-many QUALITY-CLASSIFIER artifact — the model twin
  * of `IndexStore` (postings), `VectorStore` (ANN codes) and
  * `DedupStore` (near-dup bands): pl23's Bernoulli-NB log-odds model
  * trained once over a labeled corpus and saved as a weights table, so
  * scoring any later frame (a re-crawl batch, a candidate shard, a
  * document stream) costs ONE broadcast join + per-doc sum and never
  * re-reads the training corpus. The model is bounded at
  * `Pipeline.ClassifierBuckets` (4096) rows by the feature-hashing
  * trick, so the serve-time broadcast is safe at any corpus size.
  *
  * Single source of truth: feature hashing, smoothing and rounding all
  * come from `Pipeline.classifierFeatures/classifierWeights/
  * classifierScore` — the exact code pl23's oracle-checked query runs,
  * so a stored-model score equals the fresh-trained score bit for bit
  * (pinned by `QualityStoreSpec`).
  */
object QualityStore {

  /** Train on `labeled` (`good` ∈ {0,1}, `text`) and save the weights
    * as `<name>_weights` (b, w — ≤4096 rows). Overwrites. */
  def build(labeled: DataFrame, name: String): Unit = {
    val feats = labeled.select(col("good"),
      graft.queries.Pipeline.classifierFeatures(col("text")).as("fs"))
    graft.queries.Pipeline.classifierWeights(feats)
      .write.mode("overwrite").saveAsTable(s"${name}_weights")
  }

  /** Score a (doc_id, text) frame under the FROZEN stored weights:
    * (doc_id, n_feats, score, keep), unsorted — callers order. The
    * plan touches only the input frame and the ≤4096-row weights
    * table; the training corpus is never re-read. */
  def score(docs: DataFrame, name: String): DataFrame = {
    val spark = docs.sparkSession
    val feats = docs.select(col("doc_id"),
      graft.queries.Pipeline.classifierFeatures(col("text")).as("fs"))
    graft.queries.Pipeline.classifierScore(feats,
      spark.table(s"${name}_weights"))
  }

  /** Stored model size — the broadcast-safety bound a deployment
    * monitors (must stay ≤ `Pipeline.ClassifierBuckets`). */
  def modelRows(spark: SparkSession, name: String): Long =
    spark.table(s"${name}_weights").count()
}
