// Heavy-15 sweep for the varied 100x corpus (SURVEY §6, round-13 task):
// times the 15 heaviest steady queries min-of-2 against
// SWEEP_DIR (default /tmp/scale100x — build with tools/scale100x.scala
// first). Run with:
//   SWEEP_DIR=/tmp/scale100x /opt/spark/bin/spark-shell \
//     --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=128 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/sweep100x.scala </dev/null
// Compare each time against tools/bench_steady.json's sf0.1 steady value
// (tools/compare.py or by eye) and record ratios in SURVEY §6.
val dir = sys.env.getOrElse("SWEEP_DIR", "/tmp/scale100x")
val heavy = Seq(
  "dd06", "dd14", "dd16", "q51", "sm05", "pl16", "tx31", "tx32",
  "dd03", "dd04", "dd07", "pl25", "q48", "q49", "sm02")
val qs = graft.SparkEntry.all.filter(q => heavy.exists(q.name.startsWith))
assert(qs.size == heavy.size, s"resolved ${qs.map(_.name)}")
def materialize(df: org.apache.spark.sql.DataFrame): Long =
  df.queryExecution.toRdd.count() // same noop shape Bench uses
def timeOne(q: graft.queries.Q): Double = {
  spark.catalog.clearCache()
  val t0 = System.nanoTime()
  materialize(q.fn(spark, dir))
  (System.nanoTime() - t0) / 1e9
}
// warm the codegen/scan path once on the tiny sf, so cold-janino cost
// (the tx31/tx32 fixed-cost class) doesn't land in pass 1's timings
qs.foreach { q =>
  try { spark.catalog.clearCache(); q.fn(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count() }
  catch { case e: Throwable => println(s"[warm] ${q.name}: ${e.getMessage}") }
}
def load(): String =
  new String(java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").split(" ").head
println(s"[sweep] loadavg before: ${load()}")
val p1 = qs.map(q => q.name -> timeOne(q))
val p2 = qs.map(q => q.name -> timeOne(q))
val best = p1.zip(p2).map { case ((n, a), (_, b)) => n -> math.min(a, b) }
println(s"[sweep] loadavg after: ${load()}")
best.foreach { case (n, t) => println(f"[sweep100x] $n%-28s ${t}%8.2f s") }
println("[sweep100x-json] {" + best.map { case (n, t) =>
  "\"" + n + "\":" + f"$t%.2f" }.mkString(",") + "}")
sys.exit(0)
