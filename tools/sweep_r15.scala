// Round-15 additions on the varied-100× corpus (SURVEY §6 convention:
// every addition gets a scale row). Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=128 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/sweep_r15.scala </dev/null
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

// --- sm02/dd07 SURVIVORS-FIRST (verdict item 2's done-criterion: a
//     sweep row showing pair output collapsed vs the raw ×757 /
//     28.3M-pairs measurement of round 13). The registered queries now
//     run dd12's semantic dedup BEFORE the hyperplane band join; the
//     raw twins (sm23/dd23) stay test-SF-only, so the raw side here is
//     the round-13 recorded number, not a re-run.
val qs = graft.SparkEntry.all
def rowsOf(name: String): Long = {
  val q = qs.find(_.name == name).get
  spark.catalog.clearCache()
  q.fn(spark, dir).count()
}
val sm02Rows = timed("sm02_survivors_first")(rowsOf("sm02_ann_hyperplane"))
println(s"SWEEP sm02_pairs_out $sm02Rows (raw round-13: 28.3M pairs, x757)")
val dd07Rows = timed("dd07_survivors_first")(rowsOf("dd07_embedding_neardup"))
println(s"SWEEP dd07_survivors_out $dd07Rows of 200000 vectors")

println(s"SWEEP loadavg_after ${load()}")
sys.exit(0)
