// Round-16 measurements on the varied-100× corpus. Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=128 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/sweep_r16.scala </dev/null
//  (1) mm08/mm09 AFTER the ProbeStore materialization (round-15
//      missing #2): probe-store build separated from serve — serve must
//      land in sm18's store-read-bound class (was 32.8 s / 26.9 s
//      dominated by per-serve probe derivation).
//  (2) mm10/dd04 adaptive band geometry: bw at this n and mm10's
//      candidate volume — must sit in the multi-index-hashing envelope
//      (the measured 297,815-candidate configuration) with NO constant
//      edits.
//  (3) rebalance-vs-rebuild crossover at 256-d (verdict #7): the
//      O(copy)+O(hot) rung vs the O(n·assignment) retrain as the
//      assignment term grows with dimension.
import org.apache.spark.sql.functions._
val dir = "/tmp/scale100x"
def timed[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"SWEEP $label%s ${(System.nanoTime() - t0) / 1e9}%.1fs")
  r
}
def loadavg(): String =
  new String(java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").split(" ").head
println(s"SWEEP loadavg_before ${loadavg()}")
val qs = graft.SparkEntry.all
def rowsOf(name: String): Long = {
  val q = qs.find(_.name == name).get
  spark.catalog.clearCache()
  q.fn(spark, dir).count()
}

// ---- (1) cross-modal serve off the probe artifact --------------------
timed("vecstore_build_or_reuse") {
  graft.index.VectorStore.storeFor(spark, dir) }
timed("probestore_build") {
  graft.index.ProbeStore.probesFor(spark, dir).count() }
println(s"SWEEP mm08_rows ${timed("mm08_serve")(rowsOf("mm08_crossmodal_topk"))}")
println(s"SWEEP mm09_rows ${timed("mm09_serve")(rowsOf("mm09_hard_negatives"))}")

// ---- (2) adaptive band geometry ---------------------------------------
println(s"SWEEP mm10_rows ${timed("mm10_adaptive")(rowsOf("mm10_dhash_neardup"))}")
// candidate volume under the adaptive rule (the pre-verify pair count)
val mm10Cands = timed("mm10_candidates") {
  val m = graft.tables.load(spark, dir, "documents")
    .filter(length(col("text")) > 0)
    .select(col("doc_id"), md5(col("text")).as("dig"),
      expr("CAST(length(text) div 64 AS BIGINT)").as("lb"),
      call_function("graft_dhash", col("text")).as("dh"),
      expr("CAST(length(upper(text)) div 64 AS BIGINT)").as("tlb"),
      call_function("graft_dhash", upper(col("text"))).as("tdh"))
    .select(col("doc_id"), col("dig"), col("lb"),
      col("dh.w0").as("w0"), col("dh.w1").as("w1"), col("tlb"),
      col("tdh.w0").as("tw0"), col("tdh.w1").as("tw1"))
  val surv = m.groupBy("dig").agg(min("doc_id").as("doc_id"),
    min("lb").as("lb"), min("w0").as("w0"), min("w1").as("w1"),
    min("tlb").as("tlb"), min("tw0").as("tw0"), min("tw1").as("tw1"))
  val hh = surv.select("doc_id", "lb", "w0", "w1").unionByName(
    surv.filter(col("doc_id") % 41 === 7)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        col("tlb").as("lb"), col("tw0").as("w0"), col("tw1").as("w1")))
  val geom = hh.agg(count(lit(1)).as("n"))
    .select(least(lit(21),
      length(bin(greatest(col("n") - 1, lit(1L)))) + lit(4))
      .cast("int").as("bw"))
  println(s"SWEEP mm10_bw ${geom.head.getInt(0)}")
  val mask = expr("CAST(shiftleft(CAST(1 AS BIGINT), bw) - 1 AS BIGINT)")
  val bands = hh.crossJoin(broadcast(geom))
    .select(col("doc_id"), col("lb"), col("w0"), col("w1"), col("bw"),
      explode(typedlit(Seq(0, 1, 2))).as("band"))
    .withColumn("v",
      when(col("band") === 0, col("w0").bitwiseAND(lit(2097151L)))
        .when(col("band") === 1,
          shiftright(col("w0"), 21).bitwiseOR(
            shiftleft(col("w1").bitwiseAND(lit(1023L)), 11)))
        .otherwise(shiftright(col("w1"), 10))
        .bitwiseAND(mask))
  val aa = bands.select(col("doc_id").as("doc_a"), col("band"),
    col("lb"), col("v"))
  val bb = bands.select(col("doc_id").as("doc_b"), col("band"),
    col("lb"), col("v"))
  aa.join(bb, Seq("band", "lb", "v"))
    .filter(col("doc_a") < col("doc_b"))
    .select("doc_a", "doc_b").distinct().count()
}
println(s"SWEEP mm10_candidate_pairs $mm10Cands")
println(s"SWEEP dd04_rows ${timed("dd04_adaptive")(rowsOf("dd04_simhash"))}")

// ---- (3) rebalance vs rebuild at 256-d --------------------------------
// 140k uniform build + 60k clumped append -> hot cells; then the two
// maintenance rungs timed on the same skewed store.
def synth(n: Int, d: Int, clump: Boolean, idBase: Long) = {
  val base = if (clump) "0.5 + pmod(hash(id, j, 7), 100) / 10000.0"
             else "pmod(hash(id, j), 10000) / 10000.0"
  spark.range(n).select((col("id") + idBase).as("vec_id"),
    expr(s"transform(sequence(0, ${d - 1}), j -> CAST($base AS FLOAT))")
      .as("embedding"))
}
for (d <- Seq(64, 256)) {
  val name = s"xb_r16_$d"
  Seq("centroids", "stats", "codes", "raw", "bits", "tombstones", "version")
    .foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$t")
      (2 to 9).foreach(v => spark.sql(s"DROP TABLE IF EXISTS ${name}_v${v}_$t"))
    }
  val uni = synth(140000, d, clump = false, 0L)
  val clumped = synth(60000, d, clump = true, 1000000L)
  timed(s"build_${d}d") { graft.index.VectorStore.build(uni, name) }
  spark.sql(s"DROP TABLE IF EXISTS ${name}_mk")
  timed(s"append_clump_${d}d") {
    graft.streaming.VectorMaintenance.appendBatch(clumped, 0L, name,
      s"${name}_mk") }
  val split = timed(s"rebalance_${d}d") {
    graft.index.VectorStore.rebalance(spark, name) }
  println(s"SWEEP rebalance_${d}d_split_cells ${split.size}")
  timed(s"rebuild_${d}d") {
    graft.index.VectorStore.rebuild(uni.unionAll(clumped), name) }
}
println(s"SWEEP loadavg_after ${loadavg()}")
sys.exit(0)
