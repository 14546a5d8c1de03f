// Varied-100x scale sweep for the round-13 batch-6 additions
// (SURVEY §6): min-of-2 at sf0.1 AND the tools/scale100x.scala corpus
// in one session. Same harness as tools/sweep_batch5.scala.
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=128 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/sweep_batch6.scala </dev/null
val big = sys.env.getOrElse("SWEEP_DIR", "/tmp/scale100x")
val small = "/root/testdata/sf0.1"
val names = Seq("dd21", "pl37", "sm20", "sm21", "mm07")
val qs = graft.SparkEntry.all.filter(q => names.exists(q.name.startsWith))
assert(qs.size == names.size, s"resolved ${qs.map(_.name)}")
def materialize(df: org.apache.spark.sql.DataFrame): Long =
  df.queryExecution.toRdd.count()
def timeOne(q: graft.queries.Q, dir: String): Double = {
  spark.catalog.clearCache()
  val t0 = System.nanoTime()
  materialize(q.fn(spark, dir))
  (System.nanoTime() - t0) / 1e9
}
def load(): String =
  new String(java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").split(" ").head
qs.foreach { q =>
  try { spark.catalog.clearCache(); q.fn(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count() }
  catch { case e: Throwable => println(s"[warm] ${q.name}: ${e.getMessage}") }
}
println(s"[sweep] loadavg before: ${load()}")
val rows = qs.map { q =>
  val s = math.min(timeOne(q, small), timeOne(q, small))
  val b = math.min(timeOne(q, big), timeOne(q, big))
  (q.name, s, b, b / s)
}
println(s"[sweep] loadavg after: ${load()}")
rows.foreach { case (n, s, b, r) =>
  println(f"[sweep-b6] $n%-24s sf0.1 $s%7.2f s   100x $b%8.2f s   x$r%.1f")
}
sys.exit(0)
