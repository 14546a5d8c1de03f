// Round-15 batch-3 additions on the varied-100× corpus. Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=128 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/sweep_r15c.scala </dev/null
val dir = "/tmp/scale100x"
def timed[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"SWEEP $label%s ${(System.nanoTime() - t0) / 1e9}%.1fs")
  r
}
def load(): String =
  new String(java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").split(" ").head
println(s"SWEEP loadavg_before ${load()}")
val qs = graft.SparkEntry.all
def rowsOf(name: String): Long = {
  val q = qs.find(_.name == name).get
  spark.catalog.clearCache()
  q.fn(spark, dir).count()
}
// q60: rolling median — per-customer bounded frames, one exchange
println(s"SWEEP q60_rows ${timed("q60_rolling_median")(rowsOf("q60_rolling_median"))}")
// mm10: dHash near-dup — map-side 2-word hash, 16-bit band join
println(s"SWEEP mm10_pairs ${timed("mm10_dhash_neardup")(rowsOf("mm10_dhash_neardup"))}")
println(s"SWEEP loadavg_after ${load()}")
sys.exit(0)
