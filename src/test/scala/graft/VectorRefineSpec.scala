package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.VectorStore
import graft.streaming.VectorMaintenance

/** The artifact-served "SQ + refine" surface: `serveTopKRefined` must
  * (1) reproduce an INDEPENDENT pure-Scala quantized-shortlist +
  * exact-rerank computation bit-for-bit without touching the corpus,
  * (2) honor deletes end-to-end — hidden at serve time, PHYSICALLY
  * purged from the raw table at compaction (the raw table is where
  * the erasure obligation lives: codes are lossy projections, raw is
  * the payload), (3) pick up streamed appends on both sides of the
  * artifact, and (4) refuse a codes-only legacy store loudly.
  */
class VectorRefineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private val Shortlist = 20 // small enough that refine visibly reorders

  private def reset(name: String, extra: String*): Unit =
    TestWarehouse.reset(spark,
      Seq("centroids", "stats", "codes", "raw", "bits", "tombstones")
        .map(t => s"${name}_$t") ++ extra: _*)

  private def corpus() = tables.load(spark, dir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  // ---- independent reference implementation (pure Scala) ----
  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }
  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val n = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
    if (n == 0.0) 0.0 else dot(a, b) / n
  }

  private def loadVecs(): Map[Long, Array[Double]] = corpus()
    .select(col("vec_id"), col("embedding").cast("array<double>"))
    .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  /** (probe, neighbor, rank, qrank, cosine) of the full refined path,
    * computed with no Spark plans at all. */
  private def refRefined(vecs: Map[Long, Array[Double]],
                         probeIds: Seq[Long],
                         cells: Int = VectorStore.Cells): Set[(Long, Long, Int, Int, Double)] = {
    val cents = vecs.filter(_._1 < cells).toSeq.sortBy(_._1)
    val dim = vecs.head._2.length
    val mns = (0 until dim).map(d => vecs.values.map(_(d)).min).toArray
    val mxs = (0 until dim).map(d => vecs.values.map(_(d)).max).toArray
    def deq(v: Array[Double]): Array[Double] =
      Array.tabulate(dim) { d =>
        if (mxs(d) == mns(d)) mns(d)
        else {
          val code = math.floor((v(d) - mns(d)) / (mxs(d) - mns(d)) * 255.0 + 0.5)
          mns(d) + (code / 255.0) * (mxs(d) - mns(d))
        }
      }
    def cellsOf(v: Array[Double], keep: Int): Seq[Long] =
      cents.map { case (cid, ce) => (l2sq(v, ce), cid) }
        .sorted.take(keep).map(_._2)
    probeIds.flatMap { p =>
      val pe = vecs(p)
      val pc = cellsOf(pe, VectorStore.NProbe).toSet
      val short = vecs.toSeq
        .filter { case (id, v) => id != p && pc.contains(cellsOf(v, 1).head) }
        .map { case (id, v) => (id, cosine(pe, deq(v))) }
        .sortBy { case (id, c) => (-c, id) }
        .take(Shortlist).zipWithIndex
        .map { case ((id, _), i) => (id, i + 1) }
      short
        .map { case (id, qrank) => (id, qrank, cosine(pe, vecs(id))) }
        .sortBy { case (id, _, c) => (-c, id) }
        .take(VectorStore.TopK).zipWithIndex
        .map { case ((id, qrank, c), i) => (p, id, i + 1, qrank, c) }
    }.toSet
  }

  test("refined serve == independent SQ-shortlist + exact rerank; no corpus scan") {
    import spark.implicits._
    reset("vr")
    VectorStore.build(corpus(), "vr")
    val vecs = loadVecs()
    val probeIds = vecs.keys.filter(id => id % 25 == 0 && id < 500).toSeq.sorted
    val probes = probeIds.map(p => (p, vecs(p))).toDF("probe_id", "pe")

    val served = VectorStore.serveTopKRefined(probes, "vr",
      shortlist = Shortlist)
    val got = served.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getDouble(4))).toSet
    val expected = refRefined(vecs, probeIds)
    assert(expected.nonEmpty, "test premise: probes must retrieve rows")
    assert(got == expected)
    // the refine must actually DO something on this corpus: at least
    // one served row reordered vs its quantized rank
    assert(got.exists { case (_, _, rank, qrank, _) => rank != qrank },
      "premise: refine should visibly reorder some shortlist entries")

    val p = served.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("Location:[^\\n]*embeddings".r.findAllIn(p).isEmpty,
      s"refined serve plan scans the corpus:\n$p")
  }

  test("non-default cell count is self-describing: serve derives it from the artifact") {
    import spark.implicits._
    reset("vc16")
    // clusters run hundreds of cells (SURVEY §6b); the store records
    // the count in its own centroids table, so no consumer carries a
    // matching parameter — build at 16, serve with ZERO extra args
    VectorStore.build(corpus(), "vc16", cells = 16)
    assert(spark.table("vc16_centroids").count() == 16L)
    val vecs = loadVecs()
    val probeIds = vecs.keys.filter(id => id % 50 == 0 && id < 400).toSeq.sorted
    val probes = probeIds.map(p => (p, vecs(p))).toDF("probe_id", "pe")
    val got = VectorStore.serveTopKRefined(probes, "vc16",
        shortlist = Shortlist).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getDouble(4))).toSet
    val expected = refRefined(vecs, probeIds, cells = 16)
    assert(expected.nonEmpty && got == expected,
      "16-cell store must serve exactly the 16-cell reference math")
    spark.catalog.clearCache()
  }

  test("deletes: hidden from refined serve; compact purges the raw payload") {
    import spark.implicits._
    reset("vrd")
    VectorStore.build(corpus(), "vrd")
    val vecs = loadVecs()
    val pe = vecs(50L)
    val probes = Seq((50L, pe)).toDF("probe_id", "pe")
    val before = VectorStore.serveTopKRefined(probes, "vrd").collect()
    val victim = before.head.getLong(1) // rank-1 neighbor

    VectorStore.deleteVecs(spark, Seq(victim), "vrd")
    val after = VectorStore.serveTopKRefined(probes, "vrd").collect()
    assert(!after.map(_.getLong(1)).contains(victim),
      "tombstoned vector still served from the refined path")
    // pre-compact: payload still physically present (tombstone only)
    assert(spark.table("vrd_raw").filter(col("vec_id") === victim)
      .count() == 1L)

    VectorMaintenance.compact(spark, "vrd")
    // post-compact: the raw PAYLOAD is gone — the erasure obligation —
    // and serving is unchanged from the tombstone-hidden state
    assert(spark.table("vrd_raw").filter(col("vec_id") === victim)
      .isEmpty, "compaction left the deleted payload in the raw table")
    assert(!spark.catalog.tableExists("vrd_tombstones"))
    val afterCompact = VectorStore.serveTopKRefined(probes, "vrd").collect()
    assert(afterCompact.toSeq == after.toSeq,
      "refined serving changed across the purge compaction")
  }

  test("streamed append lands on both artifact sides; refined retrieves it") {
    import spark.implicits._
    reset("vra", "vra_marker")
    VectorStore.build(corpus(), "vra")
    val pe = loadVecs()(50L)
    VectorMaintenance.appendBatch(
      Seq((777001L, pe)).toDF("vec_id", "embedding"), 0L, "vra", "vra_marker")

    // raw row landed, cid-aligned with its code row
    val rawRow = spark.table("vra_raw").filter(col("vec_id") === 777001L)
      .select("cid").collect()
    val codeRow = spark.table("vra_codes").filter(col("vec_id") === 777001L)
      .select("cid").collect()
    assert(rawRow.length == 1 && codeRow.length == 1 &&
      rawRow.head.getLong(0) == codeRow.head.getLong(0),
      "appended raw row missing or cid-misaligned with its code row")

    // the exact copy refines to rank 1 with cosine exactly 1.0
    val top = VectorStore.serveTopKRefined(
      Seq((50L, pe)).toDF("probe_id", "pe"), "vra", k = 1).collect().head
    assert(top.getLong(1) == 777001L && top.getDouble(4) == 1.0,
      s"appended duplicate not refined to rank 1: $top")
  }

  test("legacy codes-only store refuses the refine surface loudly") {
    import spark.implicits._
    reset("vrl")
    VectorStore.build(corpus(), "vrl")
    spark.sql("DROP TABLE vrl_raw") // simulate a pre-raw-era store
    val pe = loadVecs()(50L)
    val ex = intercept[IllegalArgumentException] {
      VectorStore.serveTopKRefined(
        Seq((50L, pe)).toDF("probe_id", "pe"), "vrl")
    }
    assert(ex.getMessage.contains("no raw-vector table"))
  }

  test("raw staging crash window: staged raw adopted, serving identical") {
    import spark.implicits._
    reset("vrx", "vrx_raw_staging")
    VectorStore.build(corpus(), "vrx")
    val pe = loadVecs()(50L)
    val probes = Seq((50L, pe)).toDF("probe_id", "pe")
    val before = VectorStore.serveTopKRefined(probes, "vrx").collect().toSeq

    // simulate the raw swap dying mid-copy: staging complete, live gone
    spark.table("vrx_raw").repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid")
      .saveAsTable("vrx_raw_staging")
    spark.sql("DROP TABLE vrx_raw")

    val after = VectorStore.serveTopKRefined(probes, "vrx").collect().toSeq
    assert(spark.catalog.tableExists("vrx_raw"), "staged raw not adopted")
    assert(!spark.catalog.tableExists("vrx_raw_staging"))
    assert(after == before,
      "recovered raw table serves differently from the pre-crash one")
  }
}
