package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.VectorStore
import graft.streaming.{DriftMonitor, VectorMaintenance}

/** The drift→rebuild arc: `VectorStore.rebuild` retrains the coarse
  * quantizer + SQ codebook on current vectors and installs the result
  * as a NEW VERSION behind a 1-row pointer flip — the only multi-table
  * swap that is atomic under a plain file catalog. Pinned here:
  * (1) the old version serves until the flip (a crashed rebuild that
  * wrote next-version tables but never flipped changes nothing),
  * (2) post-rebuild serving equals a fresh build on the same vectors
  * bit-for-bit, (3) the DriftMonitor signal gates the rebuild, and
  * (4) streaming ingest lands in — and replays cleanly against — the
  * new version.
  */
class VectorRebuildSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def reset(name: String): Unit = {
    TestWarehouse.reset(spark,
      (Seq("centroids", "stats", "codes", "version").map(t => s"${name}_$t") ++
        (2 to 5).flatMap(v => Seq("centroids", "stats", "codes")
          .map(t => s"${name}_v${v}_$t"))): _*)
  }

  private def served(name: String,
                     probes: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Int, Double)] =
    VectorStore.serveTopK(probes, name, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSeq.sorted

  test("rebuild installs a new version atomically; old serves until the flip") {
    import spark.implicits._
    reset("vr"); reset("vr_ref")
    val e = tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    VectorStore.build(e, "vr")
    assert(VectorStore.currentVersion(spark, "vr") == 1L)

    val v50 = tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") === 50)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    val probes = Seq((50L, v50)).toDF("probe_id", "pe")
    val r1 = served("vr", probes)
    assert(r1.nonEmpty)

    // a crashed rebuild: next-version tables fully written, pointer
    // never flipped — serving must be COMPLETELY unaffected (the old
    // version is resolved pointer-first)
    val drifted = e.select(col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        x => x * lit(1.5) + lit(0.2)).as("embedding"))
    drifted.limit(8).select(col("vec_id").as("cid"),
        col("embedding").as("ce"))
      .write.mode("overwrite").saveAsTable("vr_v2_centroids")
    assert(VectorStore.currentVersion(spark, "vr") == 1L)
    assert(served("vr", probes) == r1,
      "pre-flip next-version tables leaked into serving")

    // the real rebuild on drifted vectors: new version, new codebook
    val v = VectorStore.rebuild(drifted, "vr")
    assert(v == 2L && VectorStore.currentVersion(spark, "vr") == 2L)
    // the replaced version's tables are swept after the flip
    assert(!spark.catalog.tableExists("vr_codes") &&
      !spark.catalog.tableExists("vr_stats") &&
      !spark.catalog.tableExists("vr_centroids"),
      "rebuild must drop the replaced version's tables")

    // post-rebuild serving == a FRESH build on the same vectors,
    // bit for bit (same probes, drifted corpus)
    VectorStore.build(drifted, "vr_ref")
    val got = served("vr", probes)
    assert(got == served("vr_ref", probes),
      "rebuilt store serves differently from a fresh build")
    assert(got != r1, "test premise: drifted rebuild must change results")
  }

  test("drift signal gates the rebuild; ingest replays against the new version") {
    import spark.implicits._
    reset("vg")
    TestWarehouse.reset(spark, "vg_drift_ref", "vg_drift_ledger",
      "vg_drift_marker", "vg_ingest_marker")
    val e = tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    VectorStore.build(e, "vg")

    // reference distribution + a same-distribution batch: no rebuild
    val base = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"))
      .toDF("doc_id", "text")
    DriftMonitor.buildReference(base, "vg_drift")
    DriftMonitor.driftBatch(
      Seq((3L, "alpha beta gamma")).toDF("doc_id", "text"),
      0L, "vg_drift", "vg_drift_ledger", "vg_drift_marker")
    assert(VectorStore.rebuildIfDrifted(e, "vg",
      "vg_drift_ledger", "vg_drift_marker").isEmpty,
      "undrifted batch must not trigger a rebuild")
    assert(VectorStore.currentVersion(spark, "vg") == 1L)

    // a novel-vocabulary batch (high unseen mass): rebuild fires
    DriftMonitor.driftBatch(
      Seq((4L, "qqq www zzz")).toDF("doc_id", "text"),
      1L, "vg_drift", "vg_drift_ledger", "vg_drift_marker")
    val fired = VectorStore.rebuildIfDrifted(e, "vg",
      "vg_drift_ledger", "vg_drift_marker")
    assert(fired.contains(2L), s"drifted batch must trigger rebuild: $fired")
    assert(VectorStore.currentVersion(spark, "vg") == 2L)

    // streaming ingest lands in the NEW version's codes and replays
    // cleanly (marker no-op) against it
    val v50 = tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") === 50)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    VectorMaintenance.appendBatch(
      Seq((910001L, v50)).toDF("vec_id", "embedding"),
      0L, "vg", "vg_ingest_marker")
    assert(spark.table("vg_v2_codes")
      .filter(col("vec_id") === 910001L).count() == 1L,
      "ingest after rebuild must land in the current version")
    VectorMaintenance.appendBatch(
      Seq((910001L, v50)).toDF("vec_id", "embedding"),
      0L, "vg", "vg_ingest_marker")
    assert(spark.table("vg_v2_codes")
      .filter(col("vec_id") === 910001L).count() == 1L,
      "replayed ingest batch duplicated codes in the new version")
    // and the ingested vector is retrievable from the rebuilt store
    val top = VectorStore.serveTopK(
      Seq((50L, v50)).toDF("probe_id", "pe"), "vg", k = 2)
      .collect().map(_.getLong(1)).toSet
    assert(top.contains(910001L),
      s"ingested vector not served from the rebuilt version: $top")
  }
}
