// Round-18 sm28 auto-widen arc at 100×: close the round-17 selectivity
// arc's dangling note ("159 rows at 1% — some probes have < k eligible
// IN the probed cells") with widening data. For 1% / 0.2% predicates,
// serve WITHOUT and WITH widenTo=64 — rows must reach full k wherever
// ≥ k eligible exist store-wide, and the widened serve's extra cost
// must stay bounded (only the short probes re-probe). Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=128 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/sweep_r18c.scala </dev/null
import org.apache.spark.sql.functions._
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
val store = timed("vecstore_build_or_reuse") {
  graft.index.VectorStore.storeFor(spark, dir) }
val probes = (graft.tables.load(spark, dir, "embeddings")
  .filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
  .select(col("vec_id").as("probe_id"), col("embedding").as("pe")))
for ((label, pred) <- Seq(
    ("sel1pct", col("vec_id") % 100 === 0),
    ("sel02pct", col("vec_id") % 500 === 0))) {
  spark.catalog.clearCache()
  val n0 = timed(s"sm28_${label}_base") {
    graft.index.VectorStore
      .serveTopKFiltered(probes, store, pred).count() }
  println(s"SWEEP sm28_${label}_base_rows $n0")
  spark.catalog.clearCache()
  val n1 = timed(s"sm28_${label}_widen") {
    graft.index.VectorStore
      .serveTopKFiltered(probes, store, pred, widenTo = 64).count() }
  println(s"SWEEP sm28_${label}_widen_rows $n1")
}
println(s"SWEEP loadavg_end ${loadavg()}")
