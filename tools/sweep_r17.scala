// Round-17 measurements on the varied-100× corpus. Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=128 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/sweep_r17.scala </dev/null
//  (1) sm27 filtered serve SELECTIVITY ARC (round-16 verdict #6): the
//      contract is that per-probe work SHRINKS with selectivity — the
//      predicate fuses into the partition-pruned codes scan, so a
//      1%-eligible serve must not cost what an unfiltered serve costs.
//  (2) pl45/pl46/pl47 at 100× (pl45/pl46 were round-16 late adds with
//      no sweep row; pl47 is new this round).
//  (3) mm10 band-margin OCCUPANCY ARC (round-16 verdict #7): measure
//      candidate volume + max bucket for margin ∈ 2..6 at both sf0.1
//      and 100× — the data that justifies (or retires) the +4-bit
//      constant in bw = min(segment, bits(n−1)+margin).
//  (4) dd04/mm10 after the round-17 geometry edits (dd04 full-width
//      keys; mm10 per-segment caps — candidates should return to the
//      measured 297,815-class configuration, not the blanket-cap
//      333,062).
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

// ---- (1) sm27 selectivity arc ----------------------------------------
val store = timed("vecstore_build_or_reuse") {
  graft.index.VectorStore.storeFor(spark, dir) }
val probes = graft.tables.load(spark, dir, "embeddings")
  .filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
  .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
for ((label, pred) <- Seq(
    ("sel100", col("vec_id") >= 0),
    ("sel50", col("vec_id") % 2 === 0),
    ("sel10", col("vec_id") % 10 === 0),
    ("sel1", col("vec_id") % 100 === 0))) {
  spark.catalog.clearCache()
  val n = timed(s"sm27_serve_$label") {
    graft.index.VectorStore.serveTopKFiltered(probes, store, pred).count() }
  println(s"SWEEP sm27_${label}_rows $n")
}

// ---- (2) round-16/17 curation adds -----------------------------------
println(s"SWEEP pl45_rows ${timed("pl45")(rowsOf("pl45_erasure_attest"))}")
println(s"SWEEP pl46_rows ${timed("pl46")(rowsOf("pl46_doc_fate"))}")
println(s"SWEEP pl47_rows ${timed("pl47")(rowsOf("pl47_funnel_fate"))}")

// ---- (3) mm10 margin occupancy arc -----------------------------------
// hash frame once per corpus (the mm10 survivor construction), then
// for each margin: per-segment-capped band keys -> candidate pairs +
// max bucket. Expected random collisions/bucket scale 2^-bw, so the
// arc shows where extra margin stops buying anything.
def mm10Arc(src: String, tag: String): Unit = {
  val m = graft.tables.load(spark, src, "documents")
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
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  val n = hh.count()
  println(s"SWEEP mm10_${tag}_n $n")
  for (margin <- 2 to 6) {
    val bwr = java.lang.Long.toBinaryString(math.max(n - 1, 1L)).length + margin
    val bands = hh
      .select(col("doc_id"), col("lb"), col("w0"), col("w1"),
        explode(typedlit(Seq(0, 1, 2))).as("band"))
      .withColumn("v",
        when(col("band") === 0, col("w0").bitwiseAND(lit(2097151L)))
          .when(col("band") === 1,
            shiftright(col("w0"), 21).bitwiseOR(
              shiftleft(col("w1").bitwiseAND(lit(1023L)), 11)))
          .otherwise(shiftright(col("w1"), 10))
          .bitwiseAND(
            shiftleft(lit(1L),
              least(when(col("band") === 2, 22).otherwise(21), lit(bwr)))
              - 1))
    val maxBucket = bands.groupBy("band", "lb", "v")
      .agg(count(lit(1)).as("c")).agg(max("c")).head.getLong(0)
    val aa = bands.select(col("doc_id").as("doc_a"), col("band"),
      col("lb"), col("v"))
    val bb = bands.select(col("doc_id").as("doc_b"), col("band"),
      col("lb"), col("v"))
    val cands = aa.join(bb, Seq("band", "lb", "v"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct().count()
    println(s"SWEEP mm10_${tag}_margin${margin} bwr=$bwr " +
      s"cands=$cands max_bucket=$maxBucket")
  }
  hh.unpersist()
}
timed("mm10_arc_sf01") { mm10Arc("/root/testdata/sf0.1", "sf01") }
timed("mm10_arc_100x") { mm10Arc(dir, "x100") }

// ---- (4) round-17 geometry edits at 100× ------------------------------
println(s"SWEEP mm10_rows ${timed("mm10_perseg")(rowsOf("mm10_dhash_neardup"))}")
println(s"SWEEP dd04_rows ${timed("dd04_fullwidth")(rowsOf("dd04_simhash"))}")
println(s"SWEEP loadavg_after ${loadavg()}")
sys.exit(0)
