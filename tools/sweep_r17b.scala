// Round-17 sweep, part 2: the two sections that failed in
// tools/sweep_r17.scala's first run (REPL multi-line-chain gotcha on
// the probes val; shiftleft needs an Int). Same launch line.
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

// ---- (1) sm27 selectivity arc ----------------------------------------
val store = timed("vecstore_build_or_reuse") {
  graft.index.VectorStore.storeFor(spark, dir) }
val probes = (graft.tables.load(spark, dir, "embeddings")
  .filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
  .select(col("vec_id").as("probe_id"), col("embedding").as("pe")))
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

// ---- (2) mm10 margin occupancy arc -----------------------------------
def mm10Arc(src: String, tag: String): Unit = {
  val m = (graft.tables.load(spark, src, "documents")
    .filter(length(col("text")) > 0)
    .select(col("doc_id"), md5(col("text")).as("dig"),
      expr("CAST(length(text) div 64 AS BIGINT)").as("lb"),
      call_function("graft_dhash", col("text")).as("dh"),
      expr("CAST(length(upper(text)) div 64 AS BIGINT)").as("tlb"),
      call_function("graft_dhash", upper(col("text"))).as("tdh"))
    .select(col("doc_id"), col("dig"), col("lb"),
      col("dh.w0").as("w0"), col("dh.w1").as("w1"), col("tlb"),
      col("tdh.w0").as("tw0"), col("tdh.w1").as("tw1")))
  val surv = (m.groupBy("dig").agg(min("doc_id").as("doc_id"),
    min("lb").as("lb"), min("w0").as("w0"), min("w1").as("w1"),
    min("tlb").as("tlb"), min("tw0").as("tw0"), min("tw1").as("tw1")))
  val hh = (surv.select("doc_id", "lb", "w0", "w1").unionByName(
    surv.filter(col("doc_id") % 41 === 7)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        col("tlb").as("lb"), col("tw0").as("w0"),
        col("tw1").as("w1")))
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  val n = hh.count()
  println(s"SWEEP mm10_${tag}_n $n")
  for (margin <- 2 to 6) {
    val bwr = java.lang.Long.toBinaryString(math.max(n - 1, 1L)).length + margin
    val mask = expr(s"CAST(shiftleft(CAST(1 AS BIGINT), " +
      s"least(CASE WHEN band = 2 THEN 22 ELSE 21 END, $bwr)) - 1 AS BIGINT)")
    val bands = (hh
      .select(col("doc_id"), col("lb"), col("w0"), col("w1"),
        explode(typedlit(Seq(0, 1, 2))).as("band"))
      .withColumn("v",
        when(col("band") === 0, col("w0").bitwiseAND(lit(2097151L)))
          .when(col("band") === 1,
            shiftright(col("w0"), 21).bitwiseOR(
              shiftleft(col("w1").bitwiseAND(lit(1023L)), 11)))
          .otherwise(shiftright(col("w1"), 10))
          .bitwiseAND(mask)))
    val maxBucket = (bands.groupBy("band", "lb", "v")
      .agg(count(lit(1)).as("c")).agg(max("c")).head.getLong(0))
    val aa = bands.select(col("doc_id").as("doc_a"), col("band"),
      col("lb"), col("v"))
    val bb = bands.select(col("doc_id").as("doc_b"), col("band"),
      col("lb"), col("v"))
    val cands = (aa.join(bb, Seq("band", "lb", "v"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct().count())
    println(s"SWEEP mm10_${tag}_margin${margin} bwr=$bwr " +
      s"cands=$cands max_bucket=$maxBucket")
  }
  hh.unpersist()
}
timed("mm10_arc_sf01") { mm10Arc("/root/testdata/sf0.1", "sf01") }
timed("mm10_arc_100x") { mm10Arc(dir, "x100") }
println(s"SWEEP loadavg_after ${loadavg()}")
sys.exit(0)
