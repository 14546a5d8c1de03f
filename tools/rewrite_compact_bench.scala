// Operational evidence for RewriteDedup's ledger compaction (SURVEY §6):
// stream the sf0.1 documents through the rewriter in 20 batches, time
// the LAST batch's probe cost against the grown ledger, compact, then
// time one more batch — the delta is what the ch-bucketed fold buys.
// Also times pl38 at 100x (corpus-width tokenize, sources-sized rest).
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=64 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/rewrite_compact_bench.scala </dev/null
import org.apache.spark.sql.functions._
val dir = "/root/testdata/sf0.1"
Seq("rwb_out", "rwb_ledger", "rwb_ledgerc", "rwb_marker").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
val docs = graft.tables.load(spark, dir, "documents").select(col("doc_id"), col("text")).cache()
val n = docs.count()
val Batches = 20
def batchDf(i: Int) = docs.filter(pmod(col("doc_id"), lit(Batches)) === i)
def t[A](f: => A): (A, Double) = { val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9) }
// batches 0..17 build up the ledger
(0 until Batches - 2).foreach { i => graft.streaming.RewriteDedup.rewriteBatch(batchDf(i), i.toLong, "rwb_out", "rwb_ledger", "rwb_marker") }
val (_, preCompact) = t { graft.streaming.RewriteDedup.rewriteBatch(batchDf(Batches - 2), (Batches - 2).toLong, "rwb_out", "rwb_ledger", "rwb_marker") }
val (_, compactTime) = t { graft.streaming.RewriteDedup.compact(spark, "rwb_ledger", "rwb_marker") }
val (_, postCompact) = t { graft.streaming.RewriteDedup.rewriteBatch(batchDf(Batches - 1), (Batches - 1).toLong, "rwb_out", "rwb_ledger", "rwb_marker") }
println(f"[rwb] ledger rows compacted: ${spark.table("rwb_ledgerc").count()}")
println(f"[rwb] batch-vs-18-partition-ledger $preCompact%.2f s; compact $compactTime%.2f s; batch-vs-bucketed $postCompact%.2f s")
// pl38 at 100x
val q = graft.SparkEntry.all.find(_.name == "pl38_token_budget").get
def timeQ(d: String): Double = { spark.catalog.clearCache(); val t0 = System.nanoTime(); q.fn(spark, d).queryExecution.toRdd.count(); (System.nanoTime() - t0) / 1e9 }
val s01 = math.min(timeQ(dir), timeQ(dir))
val s100 = math.min(timeQ("/tmp/scale100x"), timeQ("/tmp/scale100x"))
println(f"[rwb] pl38 sf0.1 $s01%.2f s   100x $s100%.2f s   x${s100 / s01}%.1f")
sys.exit(0)
