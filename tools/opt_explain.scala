// Dump .explain("formatted") for a set of queries to plans/r18/.
// Tag comes from SPARK_GRAFT_EXPLAIN_TAG (before/after); query list from
// SPARK_GRAFT_EXPLAIN_QS (comma-separated), default = the round-18
// optimization candidate set. Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/opt_explain.scala </dev/null
val dir = "/root/testdata/sf0.1"
val tag = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_TAG", "before")
val defaults = Seq(
  "pl47_funnel_fate", "dd07_embedding_neardup", "q58_mad_outliers",
  "dd19_leakage_free_split", "dd17_cluster_keep_best",
  "dd06_near_dup_components", "sm05_pq_topk", "dd22_cdc_chunks",
  "tx31_textrank", "pl29_ngram_novelty", "sm02_ann_hyperplane",
  "q51_recursive_cte", "dd14_substring_dup", "dd04_simhash",
  "pl16_curation_funnel", "tx32_source_overlap", "q56_winsorize",
  "tx38_bpe_train", "q48_quartiles", "tx42_bpe_fertility",
  "dd08_containment", "dd18_minhash_estimate", "sm22_nprobe_profile",
  "dd03_minhash_lsh", "dd15_dup_passages", "dd16_substring_dup_xx",
  "mm04_blob_neardup", "pl14_fuzzy_decontaminate", "tx24_keywords",
  "tx25_lm_score", "sm20_ivfpq_residual", "sm28_filtered_autowiden",
  "tx04_tfidf", "pl41_epoch_waterfill", "pl25_semantic_decontaminate")
val qs = (sys.env.get("SPARK_GRAFT_EXPLAIN_QS")
  .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(defaults))
val byName = graft.SparkEntry.all.map(q => q.name -> q.fn).toMap
java.nio.file.Files.createDirectories(java.nio.file.Paths.get("plans/r18"))
// artifact-served queries construct against their stores: pre-build
// (Bench's pre-pass convention) so the plan is the served shape
graft.index.IndexStore.termDocTable(spark, dir)
for (n <- qs) {
  try {
    spark.catalog.clearCache()
    val df = byName(n)(spark, dir)
    val txt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"plans/r18/${n}_$tag.txt"),
      txt.getBytes("UTF-8"))
    println(s"EXPLAINED $n")
  } catch { case e: Throwable =>
    println(s"EXPLAIN_FAILED $n: ${e.getMessage}")
  }
}
println("EXPLAIN_DONE")
sys.exit(0)
