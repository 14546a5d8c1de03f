// Round-18 fate-phase re-run (the -I leading-dot gotcha orphaned the
// fateInput chain in the first sweep_r18 run, so fate_batch1/2 failed
// on a missing embedding column; artifacts s100_evalbands / s100_sem
// are already built by that run). Also re-measures status/compactAll
// WITH the populated fate ledger in the warehouse.
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
println(s"SWEEP loadavg_start ${loadavg()}")
Seq("s100_fates", "s100_fates_m", "s100_rates", "s100_fates_staging")
  .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
{
  import spark.implicits._
  graft.tables.load(spark, dir, "documents").select("lang").distinct()
    .collect().map(_.getString(0)).toSeq.map(l => (0L, l, 1.0))
    .toDF("epoch_id", "lang", "keep_prob")
    .write.saveAsTable("s100_rates")
}
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
val wh = Maintenance.Warehouse(
  fateLedgers = Seq(("s100_fates", "s100_fates_m", "s100_rates")),
  probes = Seq(("s100_probe", "s100_probe_m")),
  substrings = Seq(("s100_win", "s100_win_m")),
  trends = Seq(("s100_trend", "s100_trend_m", 50)))
timed("status_with_fates") {
  Maintenance.status(spark, wh).foreach(r =>
    println(s"SWEEP status ${r.family} ${r.primary} rows=${r.rows} " +
      s"batches=${r.committedBatches} orphans=${r.orphanBatches} " +
      s"debt=${r.compactionDebt}"))
}
timed("compactAll_with_fates") { Maintenance.compactAll(spark, wh) }
println(s"SWEEP loadavg_end ${loadavg()}")
