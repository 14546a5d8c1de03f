// Round-18 A/B timing harness: time a query list (2 passes, min) under
// whatever --conf the session was launched with; prints one line per
// query plus the set total. Query list via SPARK_GRAFT_AB_QS, default =
// the optimization candidate set. Run with spark-shell -I (see
// tools/opt_profile.scala header for flags).
val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val defaults = Seq(
  "pl47_funnel_fate", "dd07_embedding_neardup", "q58_mad_outliers",
  "dd19_leakage_free_split", "dd17_cluster_keep_best",
  "dd06_near_dup_components", "sm05_pq_topk", "dd22_cdc_chunks",
  "tx31_textrank", "pl29_ngram_novelty", "sm02_ann_hyperplane",
  "q51_recursive_cte", "dd14_substring_dup", "dd04_simhash",
  "pl16_curation_funnel", "tx32_source_overlap", "q56_winsorize",
  "tx38_bpe_train", "q48_quartiles", "tx42_bpe_fertility",
  "dd08_containment", "dd18_minhash_estimate", "sm22_nprobe_profile")
val qs = (sys.env.get("SPARK_GRAFT_AB_QS")
  .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(defaults))
val byName = graft.SparkEntry.all.map(q => q.name -> q.fn).toMap
def materialize(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.mode("overwrite").format("noop").save()
graft.tables.names.foreach { n =>
  try materialize(graft.tables.load(spark, dir, n)) catch { case _: Throwable => () }
}
graft.index.IndexStore.termDocTable(spark, dir)
var total = 0.0
for (n <- qs) {
  def one(): Double = {
    spark.catalog.clearCache()
    val t0 = System.nanoTime()
    materialize(byName(n)(spark, dir))
    (System.nanoTime() - t0) / 1e9
  }
  val a = one(); val b = one()
  val m = math.min(a, b)
  total += m
  println(f"AB $n%s min=$m%.2f p1=$a%.2f p2=$b%.2f")
}
println(f"AB_TOTAL ${total}%.2f over ${qs.size} queries")
sys.exit(0)
