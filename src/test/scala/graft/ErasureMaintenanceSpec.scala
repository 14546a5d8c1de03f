package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.index.{Erasure, VectorStore}
import graft.streaming.{ErasureMaintenance, IndexMaintenance}

/** The streaming erasure processor: requests arriving across
  * micro-batches must leave the served artifacts exactly as one batch
  * `Erasure.erase` of the union would, the per-batch report must carry
  * the auditor's request/new counts (overlapping re-requests count
  * requested but not new), replay is a no-op, and the
  * report-then-crash window adopts the orphan row with the first
  * attempt's counts.
  */
class ErasureMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def artifactTables(led: String, td: String, st: String,
                             vs: String) =
    Seq(led, td, s"${td}_ledger", s"${td}_staging", s"${td}_tombstones",
      st) ++
      Seq("centroids", "stats", "codes", "raw", "bits", "version", "tombstones")
        .map(s => s"${vs}_$s")

  /** Build a maintained postings table + vector store over the first
    * 40 docs / all embeddings — the ErasureSpec fixture. */
  private def buildArtifacts(td: String, st: String, vs: String)
      : Seq[Long] = {
    import spark.implicits._
    val docs = tables.load(spark, dir, "documents")
      .select("doc_id", "text").limit(40)
    val rows = docs.as[(Long, String)].collect().sortBy(_._1).toSeq
    rows.grouped(20).zipWithIndex.foreach { case (b, i) =>
      IndexMaintenance.appendBatch(b.toDF("doc_id", "text"), i.toLong,
        td, st)
    }
    VectorStore.build(tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")), vs)
    rows.map(_._1)
  }

  private def servedPostings(td: String, st: String): Set[Long] = {
    import spark.implicits._
    // deliberately NO manual refresh: postings() relists its own
    // tables and withoutDeleted relists the tombstone table (the
    // round-15 fix this spec found — without it, a session that served
    // before the latest erasure keeps serving the erased doc)
    IndexMaintenance.withoutDeleted(
        IndexMaintenance.postings(spark, td, st),
        Erasure.postingsTombstones(td))
      .select("doc_id").distinct().as[Long].collect().toSet
  }

  private def servedNeighbors(vs: String): Set[Long] = {
    import spark.implicits._
    graft.streaming.Freshness.refresh(spark,
      Seq("centroids", "stats", "codes", "raw", "bits", "version", "tombstones")
        .map(s => s"${vs}_$s"): _*)
    val probes = tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") % 25 === 0).limit(8)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    VectorStore.serveTopK(probes, vs)
      .select("neighbor_id").as[Long].collect().toSet
  }

  test("streamed requests == one-shot batch erase; report counts exact") {
    import spark.implicits._
    val (led, td, st, vs) = ("erm_led", "erm_td", "erm_st", "erm_vs")
    val (ledB, tdB, stB, vsB) = ("ermb_led", "ermb_td", "ermb_st", "ermb_vs")
    TestWarehouse.reset(spark,
      (artifactTables(led, td, st, vs) ++
        artifactTables(ledB, tdB, stB, vsB) ++
        Seq("erm_report", "erm_marker")): _*)
    val ids = buildArtifacts(td, st, vs)
    buildArtifacts(tdB, stB, vsB)

    // three request batches; batch 2 re-requests one of batch 1's ids
    // (privacy portals re-submit — requested counts, new does not)
    val b1 = Seq(ids(3), ids(7))
    val b2 = Seq(ids(7), ids(11))
    val b3 = Seq(ids(19))

    val stream = MemoryStream[Long](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-erm-ckpt").toString
    val q = ErasureMaintenance.maintain(stream.toDF().toDF("doc_id"),
      led, Some(td), Some(st), Some(vs), "erm_report", "erm_marker", ckpt)
    try {
      stream.addData(b1); q.processAllAvailable()
      // mid-stream: already-enforced victims are gone from serving
      assert(b1.forall(!servedPostings(td, st).contains(_)),
        "batch-1 victims still served between batches")
      stream.addData(b2); q.processAllAvailable()
      stream.addData(b3); q.processAllAvailable()
    } finally q.stop()

    // one-shot twin over the union on the B artifacts
    Erasure.erase(spark, b1 ++ b2 ++ b3, ledB, Some(tdB), Some(stB),
      Some(vsB))

    assert(servedPostings(td, st) == servedPostings(tdB, stB),
      "streamed served postings != one-shot batch erase")
    assert(servedNeighbors(vs) == servedNeighbors(vsB),
      "streamed served neighbors != one-shot batch erase")
    graft.streaming.Freshness.refresh(spark, led)
    assert(spark.table(led).orderBy("doc_id").as[Long].collect().toSeq ==
      spark.table(ledB).orderBy("doc_id").as[Long].collect().toSeq,
      "streamed ledger != one-shot ledger")

    // report: requested counts every id in the batch, new only unseen
    val rep = ErasureMaintenance.report(spark, "erm_report", "erm_marker")
      .orderBy("batch_id")
      .select("n_requested", "n_new", "n_ledger_total")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rep == Seq((2L, 2L, 2L), (2L, 1L, 3L), (1L, 1L, 4L)),
      s"report counts wrong: $rep")
  }

  test("replay is a no-op; report-then-crash window adopts the orphan") {
    import spark.implicits._
    val (led, td, st, vs) = ("ermr_led", "ermr_td", "ermr_st", "ermr_vs")
    TestWarehouse.reset(spark,
      (artifactTables(led, td, st, vs) ++
        Seq("ermr_report", "ermr_marker")): _*)
    val ids = buildArtifacts(td, st, vs)

    ErasureMaintenance.eraseBatch(Seq(ids(3), ids(7)).toDF("doc_id"), 0L,
      led, Some(td), Some(st), Some(vs), "ermr_report", "ermr_marker")
    val ledger0 = spark.table(led).orderBy("doc_id").collect().toSeq
    val report0 = spark.table("ermr_report").orderBy("batch_id")
      .collect().toSeq

    // replay of a committed batch: nothing changes
    ErasureMaintenance.eraseBatch(Seq(ids(3), ids(7)).toDF("doc_id"), 0L,
      led, Some(td), Some(st), Some(vs), "ermr_report", "ermr_marker")
    assert(spark.table(led).orderBy("doc_id").collect().toSeq == ledger0)
    assert(spark.table("ermr_report").orderBy("batch_id")
      .collect().toSeq == report0)
    assert(spark.table("ermr_marker").count() == 1)

    // crash window: batch 1's report row lands, then the process dies
    // before record/enforce/marker — the row must be invisible to the
    // committed-only serve, and the replay must adopt it (n_new = the
    // first attempt's pre-record truth) while completing enforcement
    Seq((1L, 1L, 1L, 3L))
      .toDF("batch_id", "n_requested", "n_new", "n_ledger_total")
      .write.mode("append").saveAsTable("ermr_report")
    assert(ErasureMaintenance.report(spark, "ermr_report", "ermr_marker")
      .count() == 1, "orphan report row visible before its marker")
    ErasureMaintenance.eraseBatch(Seq(ids(11)).toDF("doc_id"), 1L,
      led, Some(td), Some(st), Some(vs), "ermr_report", "ermr_marker")
    val rep = ErasureMaintenance.report(spark, "ermr_report", "ermr_marker")
      .orderBy("batch_id")
      .select("batch_id", "n_requested", "n_new", "n_ledger_total")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rep == Seq((0L, 2L, 2L, 2L), (1L, 1L, 1L, 3L)),
      s"adopted report drifted: $rep")
    assert(!servedPostings(td, st).contains(ids(11)),
      "crash-replayed victim still served")
    assert(spark.table(led).as[Long].collect().toSet ==
      Set(ids(3), ids(7), ids(11)))
  }

  test("fullScope cadence sweeps the whole ledger into scope artifacts") {
    import spark.implicits._
    val (led, td, st, vs) = ("ermc_led", "ermc_td", "ermc_st", "ermc_vs")
    TestWarehouse.reset(spark,
      (artifactTables(led, td, st, vs) ++
        Seq("ermc_report", "ermc_marker", "ermc_quality",
          "ermc_quality_erasure_staging")): _*)
    val ids = buildArtifacts(td, st, vs)
    // a doc-keyed side artifact (quality scores) the narrow per-batch
    // enforce cannot reach — only the cadence sweep purges it
    tables.load(spark, dir, "documents")
      .select(col("doc_id"), length(col("text")).as("q"))
      .limit(40).write.saveAsTable("ermc_quality")
    val scope = Erasure.Scope(termDocTable = Some(td),
      statsTable = Some(st), vectorStore = Some(vs),
      docTables = Seq(("ermc_quality", Seq("doc_id"))))
    def qualityIds: Set[Long] = {
      graft.streaming.Freshness.refresh(spark, "ermc_quality")
      spark.table("ermc_quality").select("doc_id").as[Long].collect().toSet
    }

    val stream = MemoryStream[Long](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ermc-ckpt").toString
    val q = ErasureMaintenance.maintain(stream.toDF().toDF("doc_id"),
      led, Some(td), Some(st), Some(vs), "ermc_report", "ermc_marker",
      ckpt, fullScope = Some(scope), fullEvery = 2)
    try {
      stream.addData(ids(1)); q.processAllAvailable()
      // batch 0, no tick: narrow artifacts enforced at once, the side
      // artifact lags (the documented bounded-lag contract)
      assert(!servedPostings(td, st).contains(ids(1)),
        "narrow enforce missed the batch-0 victim")
      assert(qualityIds.contains(ids(1)), "cadence ticked early")
      stream.addData(ids(5)); q.processAllAvailable()
      // batch 1 ticks: the sweep replays the WHOLE ledger, so the
      // batch-0 victim is purged too, not just this batch's
      assert(!qualityIds.contains(ids(1)) && !qualityIds.contains(ids(5)),
        "cadence sweep missed a ledger id")
      stream.addData(ids(9)); q.processAllAvailable()
      assert(!servedPostings(td, st).contains(ids(9)),
        "narrow enforce missed the batch-2 victim")
      assert(qualityIds.contains(ids(9)), "tick fired off-cadence")
      stream.addData(ids(13)); q.processAllAvailable()
      assert(qualityIds.intersect(
        Set(ids(1), ids(5), ids(9), ids(13))).isEmpty,
        "post-tick side artifact still holds a victim")
      assert(qualityIds.nonEmpty, "sweep purged non-victim rows")
    } finally q.stop()
  }
}
