// Memory-pressure / spill sweep (SURVEY §6, round-14 task): the scale
// arguments so far were about shuffle SHAPE; this one is about memory
// HEADROOM. Runs the heaviest aggregation queries at the varied-100×
// corpus under a deliberately starved memory config and records
// per-query spill volumes — the point is completion WITH spill (the
// operators degrade to disk gracefully) rather than OOM. Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 8g \
//     --conf spark.memory.fraction=0.1 \
//     --conf spark.sql.shuffle.partitions=64 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/spill_sweep.scala </dev/null
// (4 GB heap × fraction 0.1 ≈ 330 MB unified memory across 32 cores —
// ~0.3% of the 125 GB the normal local[32] profile enjoys.)
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.AtomicLong

val memSpill = new AtomicLong(0L)
val diskSpill = new AtomicLong(0L)
val peakExec = new AtomicLong(0L)
spark.sparkContext.addSparkListener(new SparkListener {
  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      memSpill.addAndGet(m.memoryBytesSpilled)
      diskSpill.addAndGet(m.diskBytesSpilled)
      peakExec.updateAndGet(p => math.max(p, m.peakExecutionMemory))
    }
  }
})

val dir = "/tmp/scale100x"
val queries = Seq(
  "q48_quartiles",         // exact-percentile value→count buffers
  "q55_percentile_disc",   // ordered-set aggregate buffers
  "q56_winsorize",         // two-pass percentile + map-side clamp
  "dd20_dedup_rewrite",    // chunk dedup + position-order reassembly
  "tx04_tfidf",            // corpus-wide two-level agg + join
  "tx02_term_frequency",   // ~250M-token groupBy, corpus-cardinality keys
  "q50_zorder_key")        // 60M-row global sort (external-sort spill path)

for (q <- queries) {
  spark.catalog.clearCache()
  memSpill.set(0L); diskSpill.set(0L); peakExec.set(0L)
  val t0 = System.nanoTime()
  val status =
    try {
      graft.SparkEntry.queries(q)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      "ok"
    } catch { case e: Throwable =>
      "FAIL " + Option(e.getMessage).getOrElse(e.getClass.getName).take(120)
    }
  val secs = (System.nanoTime() - t0) / 1e9
  Thread.sleep(3000) // let the listener bus drain task-end events
  println(f"SPILL $q%s status=$status%s time=$secs%.1fs " +
    f"memSpill=${memSpill.get / 1e9}%.2fGB diskSpill=${diskSpill.get / 1e9}%.2fGB " +
    f"peakTaskExecMem=${peakExec.get / 1e6}%.0fMB")
}
sys.exit(0)
