// Round-14 additions on the varied-100× corpus (SURVEY §6 convention:
// every addition gets a scale row). Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=128 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/sweep_r14.scala </dev/null
import org.apache.spark.sql.functions._

val dir = "/tmp/scale100x"
def timed[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"SWEEP $label%s ${(System.nanoTime() - t0) / 1e9}%.1fs")
  r
}

// --- VectorStore build at the ADAPTIVE default on 200k vectors:
//     cells = max(8, 200000/500) = 400 — the round-14 default geometry
//     at a scale where it actually engages (verdict item 3's sweep row)
for (t <- Seq("s100_centroids", "s100_stats", "s100_codes", "s100_raw",
    "s100_version", "s100_tombstones"))
  spark.sql(s"DROP TABLE IF EXISTS $t")
// NOTE spark-shell -I does NOT merge a leading-dot line into a
// previously COMPLETE statement — multi-line chains must sit inside
// parens or a val silently keeps the unprojected frame
val e100 = (graft.tables.load(spark, dir, "embeddings")
  .select(col("vec_id"), col("embedding")))
timed("vecstore_build_adaptive")(
  graft.index.VectorStore.build(e100, "s100"))
println("SWEEP cells = " + spark.table("s100_centroids").count())
val probes = (e100.filter(col("vec_id") % 25000 === 0)
  .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
  .persist())
println("SWEEP probes = " + probes.count())
timed("vecstore_serve_pass1")(
  graft.index.VectorStore.serveTopK(probes, "s100")
    .write.mode("overwrite").format("noop").save())
timed("vecstore_serve_pass2")(
  graft.index.VectorStore.serveTopK(probes, "s100")
    .write.mode("overwrite").format("noop").save())
probes.unpersist()

// --- mm08 at 100×: first run includes the per-dir storeFor build,
//     second is the serve-only steady shape
spark.catalog.clearCache()
timed("mm08_with_build")(
  graft.SparkEntry.queries("mm08_crossmodal_topk")(spark, dir)
    .write.mode("overwrite").format("noop").save())
spark.catalog.clearCache()
timed("mm08_serve_only")(
  graft.SparkEntry.queries("mm08_crossmodal_topk")(spark, dir)
    .write.mode("overwrite").format("noop").save())

// --- q57 at 100× (60M lineitem rows: sketch pass + rank-verify pass)
spark.catalog.clearCache()
timed("q57_percentile_approx")(
  graft.SparkEntry.queries("q57_percentile_approx")(spark, dir)
    .write.mode("overwrite").format("noop").save())

// --- ComponentMaintenance at ledger scale: 1.6M synthetic pairs
//     (400k clusters of ~5, plus cross-batch chain links so later
//     batches genuinely MERGE earlier components) folded over 40
//     batches; streamed labels must equal the one-shot closure.
for (t <- Seq("c100_nodes", "c100_remap", "c100_mk", "c100_nodesc"))
  spark.sql(s"DROP TABLE IF EXISTS $t")
val allPairs = (spark.range(2000000L)
  .select(col("id").as("doc_a"), (col("id") - col("id") % 5).as("doc_b"))
  .filter(col("doc_a") =!= col("doc_b"))
  .unionByName(
    // chain links: every 1000th cluster joins its neighbor cluster —
    // arrives in the LAST batches, so it merges existing components
    spark.range(2000L)
      .select((col("id") * 1000 * 5).as("doc_a"),
        ((col("id") * 1000 + 1) * 5).as("doc_b")))
  .withColumn("b", pmod(col("doc_a"), lit(40)))
  .persist())
println("SWEEP pairs = " + allPairs.count())
val foldT0 = System.nanoTime()
(0L until 40L).foreach { i =>
  graft.streaming.ComponentMaintenance.appendBatch(
    allPairs.filter(col("b") === i).select("doc_a", "doc_b"),
    i, "c100_nodes", "c100_remap", "c100_mk")
}
println(f"SWEEP cm_fold_40_batches ${(System.nanoTime() - foldT0) / 1e9}%.1fs")
timed("cm_compact")(
  graft.streaming.ComponentMaintenance.compact(
    spark, "c100_nodes", "c100_remap", "c100_mk"))
val served = timed("cm_serve_count")(
  graft.streaming.ComponentMaintenance
    .labels(spark, "c100_nodes", "c100_remap", "c100_mk").count())
println("SWEEP cm_labels = " + served)
// equality vs the one-shot closure (the dd06 path)
val batchLabels = timed("cm_oneshot_closure")(
  graft.operators.ConnectedComponents
    .minLabel(allPairs.select("doc_a", "doc_b")))
val streamedL = (graft.streaming.ComponentMaintenance
  .labels(spark, "c100_nodes", "c100_remap", "c100_mk"))
val mismatch = (streamedL.exceptAll(
  batchLabels.select(col("node"), col("root"))).count() +
  batchLabels.select(col("node"), col("root"))
    .exceptAll(streamedL).count())
println("SWEEP cm_mismatch_rows = " + mismatch)
allPairs.unpersist()
sys.exit(0)
