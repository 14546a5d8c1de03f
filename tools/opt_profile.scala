// Round-18 optimization profiling: per-stage breakdown of the heavy
// bench queries at sf0.1 — which stages hold the wall time, their task
// counts and shuffle volumes (guide §1.1 empirical loop). Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/opt_profile.scala </dev/null
import org.apache.spark.scheduler._
import scala.collection.mutable
val dir = "/root/testdata/sf0.1"

val stages = mutable.ArrayBuffer.empty[(String, Int, String, Long, Int, Long, Long, Long)]
@volatile var currentQuery = "warmup"
val listener = new SparkListener {
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
    val m = si.taskMetrics
    stages += ((currentQuery, si.stageId, si.name.takeWhile(_ != '\n').take(60), wall,
      si.numTasks, m.shuffleReadMetrics.totalBytesRead,
      m.shuffleWriteMetrics.bytesWritten, m.executorRunTime))
  }
}
spark.sparkContext.addSparkListener(listener)

def materialize(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.mode("overwrite").format("noop").save()

// warmup: all tables end-to-end (Bench parity)
graft.tables.names.foreach { n =>
  try materialize(graft.tables.load(spark, dir, n)) catch { case _: Throwable => () }
}
graft.index.IndexStore.termDocTable(spark, dir)

val targets = Seq(
  "pl47_funnel_fate", "dd07_embedding_neardup", "q58_mad_outliers",
  "dd19_leakage_free_split", "dd17_cluster_keep_best",
  "dd06_near_dup_components", "sm05_pq_topk", "dd22_cdc_chunks",
  "tx31_textrank", "pl29_ngram_novelty", "sm02_ann_hyperplane",
  "q51_recursive_cte", "dd14_substring_dup", "dd04_simhash",
  "pl16_curation_funnel", "tx32_source_overlap", "q56_winsorize",
  "tx38_bpe_train", "q48_quartiles", "tx42_bpe_fertility",
  "dd08_containment", "dd18_minhash_estimate", "sm22_nprobe_profile")
val byName = graft.SparkEntry.all.map(q => q.name -> q.fn).toMap

for (n <- targets) {
  spark.catalog.clearCache()
  currentQuery = n + "#p1"
  val t0 = System.nanoTime()
  materialize(byName(n)(spark, dir))
  val el1 = (System.nanoTime() - t0) / 1e9
  spark.catalog.clearCache()
  currentQuery = n + "#p2"
  val t1 = System.nanoTime()
  materialize(byName(n)(spark, dir))
  val el2 = (System.nanoTime() - t1) / 1e9
  println(f"PROF $n%s wall1=$el1%.2f wall2=$el2%.2f")
}
currentQuery = "done"
Thread.sleep(500)
// dump: per query (pass 2 only — steady-ish), stages sorted by wall
val byQ = stages.filter(_._1.endsWith("#p2")).groupBy(_._1)
for ((q, ss) <- byQ.toSeq.sortBy(_._1)) {
  val tot = ss.map(_._4).sum
  println(f"STAGES $q%s nstages=${ss.size} sumstage=${tot}ms")
  for ((_, sid, name, wall, ntasks, sr, sw, run) <- ss.sortBy(-_._4).take(8))
    println(f"  stage=$sid%4d wall=${wall}%5dms tasks=$ntasks%3d run=${run}%5dms sRd=${sr/1024}%6dKB sWr=${sw/1024}%6dKB $name%s")
}
println("PROFILE_DONE")
sys.exit(0)
