// Round-15 batch-4 additions on the varied-100× corpus (events now
// scaled: 10M rows, 100× distinct users per (type, day)). Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=128 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/sweep_r15d.scala </dev/null
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
// q61: day sketches + union — two map-side partial aggs, sketch shuffle
println(s"SWEEP q61_rows ${timed("q61_distinct_sketch")(rowsOf("q61_distinct_sketch"))}")
// SketchStore build separated from q62's serve (tableFor caches per JVM)
timed("sketchstore_build")(graft.index.SketchStore.tableFor(spark, dir))
// q62: pruned-artifact serve + the exact in-band gate (gate dominates)
println(s"SWEEP q62_rows ${timed("q62_distinct_from_store")(rowsOf("q62_distinct_from_store"))}")
// store-only serve (what a deployment actually pays once built)
val servedN = timed("sketchstore_serve_only") {
  graft.index.SketchStore.serveDistinct(spark,
    graft.index.SketchStore.tableFor(spark, dir)).count()
}
println(s"SWEEP serve_only_rows $servedN")
// pl42: two distinct rollups + group-frame join
println(s"SWEEP pl42_rows ${timed("pl42_k_anonymity")(rowsOf("pl42_k_anonymity"))}")
// pl43: map-side rewrite + 1-row attestation broadcast (10M output rows)
println(s"SWEEP pl43_rows ${timed("pl43_pseudonymize")(rowsOf("pl43_pseudonymize"))}")
// q63: two per-user window passes + types^2 final agg
println(s"SWEEP q63_rows ${timed("q63_session_transitions")(rowsOf("q63_session_transitions"))}")
println(s"SWEEP loadavg_after ${load()}")
sys.exit(0)
