// Round-15 batch-2 additions on the varied-100× corpus (SURVEY §6
// convention: every addition gets a scale row). Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=128 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/sweep_r15b.scala </dev/null
import org.apache.spark.sql.functions._

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

// pl40: line rewrite — one doc_id exchange end to end, linear
val pl40 = timed("pl40_line_rewrite")(rowsOf("pl40_line_quality_rewrite"))
println(s"SWEEP pl40_docs $pl40")
// sm24: binary-quantization rerank — flat XOR+popcount scan + bounded rerank
val sm24 = timed("sm24_binary_rerank")(rowsOf("sm24_binary_rerank"))
println(s"SWEEP sm24_rows $sm24")
// pl41: waterfill — one corpus scan, source-sized lattice math
val pl41 = timed("pl41_epoch_waterfill")(rowsOf("pl41_epoch_waterfill"))
println(s"SWEEP pl41_sources $pl41")

println(s"SWEEP loadavg_after ${load()}")
sys.exit(0)
