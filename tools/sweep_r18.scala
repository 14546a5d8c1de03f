// Round-18 measurements on the varied-100× corpus. Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=128 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/sweep_r18.scala </dev/null
//  (1) dd04 QUIET re-measure (round-17 verdict #4): r17's 134.4 s row
//      was taken under the recorded contention epoch (r16 quiet:
//      60.4 s, identical geometry) — the ledger needs a quiet number.
//  (2) pl47/pl14 served from the stored eval band artifact
//      (verdict #3): build-once cost, then fresh vs from-store serve.
//  (3) FateMaintenance at 100× (verdict #1): artifact builds, two
//      ingest batches (~5k docs each) against the frozen 100×
//      artifacts, compact+re-stamp — the per-batch cost that replaces
//      pl47's full recompute for incremental audits.
//  (4) Maintenance.status / compactAll walls on a 100×-fed warehouse
//      (verdict #7): substrings (the corpus-sized ledger), probes,
//      trends, fates — the serial-walk decision data.
import org.apache.spark.sql.functions._
import graft.streaming._

val dir = "/tmp/scale100x"
def loadavg(): String =
  new String(java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").split(" ").head
def timed[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = try f catch { case e: Throwable =>
    println(s"SWEEP $label FAILED: ${e.getMessage}"); throw e }
  println(f"SWEEP $label%s ${(System.nanoTime() - t0) / 1e9}%.1fs")
  r
}
def mat(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.mode("overwrite").format("noop").save()
def dropT(ts: String*): Unit = ts.foreach(t =>
  spark.sql(s"DROP TABLE IF EXISTS $t"))

println(s"SWEEP loadavg_start ${loadavg()}")

// ---- (1) dd04 quiet re-measure ----
spark.catalog.clearCache()
timed("dd04_100x") { mat(graft.SparkEntry.queries("dd04_simhash")(spark, dir)) }
println(s"SWEEP loadavg_after_dd04 ${loadavg()}")

// ---- (2) eval band artifact: build once, serve pl14/pl47 ----
dropT("s100_evalbands_shingles", "s100_evalbands_sigs", "s100_evalbands_bands")
val d = (graft.tables.load(spark, dir, "documents")
  .select(col("doc_id"), col("text")))
timed("evalband_build") {
  graft.index.DedupStore.build(d.filter(col("doc_id") % 5 === 0),
    "s100_evalbands")
}
spark.catalog.clearCache()
timed("pl14_fresh") {
  mat(graft.SparkEntry.queries("pl14_fuzzy_decontaminate")(spark, dir)) }
spark.catalog.clearCache()
timed("pl47_fresh") {
  mat(graft.SparkEntry.queries("pl47_funnel_fate")(spark, dir)) }
spark.conf.set("spark.graft.evalBandStore", "s100_evalbands")
spark.catalog.clearCache()
timed("pl14_from_store") {
  mat(graft.SparkEntry.queries("pl14_fuzzy_decontaminate")(spark, dir)) }
spark.catalog.clearCache()
timed("pl47_from_store") {
  mat(graft.SparkEntry.queries("pl47_funnel_fate")(spark, dir)) }
spark.conf.unset("spark.graft.evalBandStore")
spark.catalog.clearCache()
println(s"SWEEP loadavg_after_pl47 ${loadavg()}")

// ---- (3) FateMaintenance at 100× ----
dropT("s100_sem_cent", "s100_sem_eval", "s100_fates", "s100_fates_m",
  "s100_rates", "s100_fates_staging")
timed("sem_store_build") {
  FateMaintenance.buildSemanticStore(
    graft.tables.load(spark, dir, "embeddings"), "s100_sem")
}
{
  import spark.implicits._
  graft.tables.load(spark, dir, "documents").select("lang").distinct()
    .collect().map(_.getString(0)).toSeq.map(l => (0L, l, 1.0))
    .toDF("epoch_id", "lang", "keep_prob")
    .write.saveAsTable("s100_rates")
}
// parens around the chain: in a spark-shell -I script a leading-dot
// line after a complete statement is NOT merged (the skill gotcha)
val fateInput = (graft.tables.load(spark, dir, "documents")
  .select(col("doc_id"), col("lang"), col("text"))
  .join(graft.tables.load(spark, dir, "embeddings")
    .select(col("vec_id").as("doc_id"), col("embedding")),
    Seq("doc_id"), "left"))
val b1 = fateInput.filter(col("doc_id") < 5000L)
val b2 = (fateInput.filter(col("doc_id") >= 5000L &&
  col("doc_id") < 10005000L))
println(s"SWEEP fate_batch_sizes ${b1.count()} ${b2.count()}")
timed("fate_batch1") {
  FateMaintenance.appendBatch(b1, 0L, "s100_fates", "s100_fates_m",
    "s100_evalbands", "s100_sem", "s100_rates") }
timed("fate_batch2") {
  FateMaintenance.appendBatch(b2, 1L, "s100_fates", "s100_fates_m",
    "s100_evalbands", "s100_sem", "s100_rates") }
timed("fate_compact") {
  FateMaintenance.compact(spark, "s100_fates", "s100_fates_m",
    "s100_rates") }
println(s"SWEEP fate_rows ${spark.table("s100_fates").count()}")
println(s"SWEEP loadavg_after_fates ${loadavg()}")

// ---- (4) ops surfaces on a 100×-fed warehouse ----
dropT("s100_win", "s100_win_m", "s100_win_staging",
  "s100_trend", "s100_trend_m", "s100_trend_staging",
  "s100_probe", "s100_probe_m", "s100_probe_staging")
val blockA = d.filter(col("doc_id") >= 10000000L && col("doc_id") < 10005000L)
val blockB = d.filter(col("doc_id") >= 20000000L && col("doc_id") < 20005000L)
timed("substr_batch1") {
  SubstringDedup.appendBatch(blockA, 0L, "s100_win", "s100_win_m") }
timed("substr_batch2") {
  SubstringDedup.appendBatch(blockB, 1L, "s100_win", "s100_win_m") }
timed("trend_batches") {
  TrendMaintenance.appendBatch(blockA, 0L, "s100_trend", "s100_trend_m", 50)
  TrendMaintenance.appendBatch(blockB, 1L, "s100_trend", "s100_trend_m", 50)
}
timed("probe_batches") {
  ProbeMaintenance.appendBatch(blockA, 0L, "s100_probe", "s100_probe_m")
  ProbeMaintenance.appendBatch(blockB, 1L, "s100_probe", "s100_probe_m")
}
val wh = Maintenance.Warehouse(
  fateLedgers = Seq(("s100_fates", "s100_fates_m", "s100_rates")),
  probes = Seq(("s100_probe", "s100_probe_m")),
  substrings = Seq(("s100_win", "s100_win_m")),
  trends = Seq(("s100_trend", "s100_trend_m", 50)))
timed("status_100x") {
  Maintenance.status(spark, wh).foreach(r =>
    println(s"SWEEP status ${r.family} ${r.primary} rows=${r.rows} " +
      s"batches=${r.committedBatches} orphans=${r.orphanBatches} " +
      s"debt=${r.compactionDebt}"))
}
timed("compactAll_100x") { Maintenance.compactAll(spark, wh) }
timed("status_after_compact") {
  Maintenance.status(spark, wh).foreach(r =>
    println(s"SWEEP status2 ${r.family} ${r.primary} rows=${r.rows} " +
      s"debt=${r.compactionDebt}"))
}
println(s"SWEEP loadavg_end ${loadavg()}")
