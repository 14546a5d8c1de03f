package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.VectorStore
import graft.streaming.DriftMonitor

/** The store's geometry contract after the adaptive default:
  * (1) a build without an explicit `cells` sizes the coarse quantizer
  * by the corpus (max(8, n/500) — occupancy-bounded, the
  * Similarity.adaptiveCells rule), identical to an explicit build at
  * that count; (2) small corpora floor at the 8-cell demo geometry so
  * every existing serve oracle is unchanged; (3) the stats row records
  * the build geometry and serving refuses a store whose stats and
  * centroids disagree (a torn build); (4) an alarm-gated rebuild keeps
  * the serving artifact's custom cell count instead of silently
  * shrinking to the default.
  */
class VectorGeometrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def reset(name: String): Unit =
    TestWarehouse.reset(spark,
      (Seq("centroids", "stats", "codes", "raw", "bits", "version", "tombstones")
        .map(t => s"${name}_$t") ++
        (2 to 4).flatMap(v => Seq("centroids", "stats", "codes", "raw", "bits",
          "tombstones").map(t => s"${name}_v${v}_$t"))): _*)

  /** Deterministic synthetic corpus large enough to engage the
    * adaptive rule (the knob only moves past ~4000 vectors). */
  private def bigCorpus(n: Int) =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        d => sin(col("id") * lit(0.7) + d.cast("double") * lit(1.3)))
        .as("embedding"))

  test("adaptive default sizes cells by corpus; serve equals explicit twin") {
    reset("ga"); reset("gx")
    val e = bigCorpus(6000)
    VectorStore.build(e, "ga") // adaptive: max(8, 6000/500) = 12
    assert(spark.table("ga_centroids").count() == 12L,
      "adaptive build must hold cell occupancy at ~500")
    assert(spark.table("ga_stats").select("cells").head.getLong(0) == 12L,
      "stats row must record the resolved build geometry")

    VectorStore.build(e, "gx", cells = 12)
    val probes = bigCorpus(6000).filter(col("vec_id") % 1000 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    def got(name: String) = VectorStore.serveTopK(probes, name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSeq.sorted
    val a = got("ga")
    assert(a.nonEmpty && a == got("gx"),
      "adaptive build must serve exactly the explicit same-count build")
  }

  test("small corpora floor at the 8-cell demo geometry (oracle-compat)") {
    reset("gs")
    VectorStore.build(tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")), "gs")
    assert(spark.table("gs_centroids").count() == 8L,
      "test-SF corpora must keep the fixed 8-cell geometry")
    assert(spark.table("gs_stats").select("cells").head.getLong(0) == 8L)
  }

  test("stats/centroids geometry mismatch refuses loudly at serve time") {
    import scala.jdk.CollectionConverters._
    reset("gm")
    VectorStore.build(tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")), "gm")
    // corrupt the recorded geometry (simulate a torn build): rewrite
    // the stats row claiming 99 cells against the 8-row centroid table
    val upd = spark.table("gm_stats").withColumn("cells", lit(99L))
    val schema = upd.schema
    val rows = upd.collect().toIndexedSeq
    spark.createDataFrame(rows.asJava, schema)
      .write.mode("overwrite").saveAsTable("gm_stats")

    val probes = tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val ex = intercept[IllegalArgumentException] {
      VectorStore.serveTopK(probes, "gm").collect()
    }
    assert(ex.getMessage.contains("geometry mismatch"),
      s"wrong refusal message: ${ex.getMessage}")
  }

  test("alarm-gated rebuild preserves the store's custom cell count") {
    import spark.implicits._
    reset("gp")
    TestWarehouse.reset(spark, "gp_drift_ref", "gp_drift_ledger",
      "gp_drift_marker")
    val e = tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    VectorStore.build(e, "gp", cells = 16)
    assert(spark.table("gp_centroids").count() == 16L)

    // drifted signal → gated rebuild fires; the new version must keep
    // the deliberate 16-cell geometry, not shrink to the default
    DriftMonitor.buildReference(
      Seq((1L, "alpha beta gamma")).toDF("doc_id", "text"), "gp_drift")
    DriftMonitor.driftBatch(
      Seq((2L, "qqq www zzz")).toDF("doc_id", "text"),
      0L, "gp_drift", "gp_drift_ledger", "gp_drift_marker")
    val fired = VectorStore.rebuildIfDrifted(e, "gp",
      "gp_drift_ledger", "gp_drift_marker")
    assert(fired.contains(2L), s"drifted batch must trigger rebuild: $fired")
    assert(spark.table("gp_v2_centroids").count() == 16L,
      "gated rebuild lost the custom geometry (fell back to the default)")
    assert(spark.table("gp_v2_stats").select("cells").head.getLong(0) == 16L)
  }

  test("rebuild after deleting a seed-range vec_id keeps geometry consistent") {
    // the torn-build trap: deleteVecs of a vec_id below the cell count
    // removes a would-be centroid seed from rebuild's training frame; a
    // build that seeds with `vec_id < cells` then writes 7 centroid rows
    // against a stats row recording 8, and checkGeometry bricks every
    // serve/append — with rebuilds reproducing the tear forever. Seeding
    // from the first `cells` live ids (and recording the ACTUAL count)
    // must keep the store serving.
    reset("gd")
    val e = tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    VectorStore.build(e, "gd")
    VectorStore.deleteVecs(spark, Seq(3L), "gd") // a seed-range id
    val v = VectorStore.rebuild(e, "gd")         // trains on live only
    val nCent = spark.table(s"gd_v${v}_centroids").count()
    val recorded = spark.table(s"gd_v${v}_stats")
      .select("cells").head.getLong(0)
    assert(nCent == recorded,
      s"rebuild tore the geometry: $nCent centroids vs $recorded recorded")
    assert(nCent == 8L, "rebuild must backfill the seed set from live ids")
    assert(spark.table(s"gd_v${v}_centroids")
      .filter(col("cid") === 3L).isEmpty,
      "a deleted vector must not seed a centroid")
    // the previously-bricked paths all serve
    val probes = e.filter(col("vec_id") === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    assert(VectorStore.serveTopK(probes, "gd").count() > 0)
    assert(VectorStore.serveTopKRefined(probes, "gd").count() > 0)
    VectorStore.append(e.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding")), "gd")
    assert(VectorStore.serveTopK(probes, "gd").count() > 0)
  }

  test("nearestCells: literal and native-expression paths assign identically") {
    // past CodegenCellLimit the per-centroid literal tree (which broke
    // the 64 KB generated-method limit at 400 adaptive cells, silently
    // de-codegening the whole stage) is swapped for the native
    // NearestCellsTopK expression holding the centroid matrix as a
    // reference object — same doubles, same argmin, O(1) code size;
    // this pins that the two paths order identically, keep=1 and keep>1
    import graft.queries.Similarity
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cents = (0L until 100L).map(c =>
      c -> Seq.fill(8)(rnd.nextDouble())).toSeq
    val vecs = (0L until 500L).map(i =>
      (i, Seq.fill(8)(rnd.nextDouble()))).toDF("vec_id", "embedding")
    for (keep <- Seq(1, 3)) {
      val lit = Similarity.nearestCells(vecs, "vec_id", "embedding",
          cents, keep, codegenLimit = 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val hof = Similarity.nearestCells(vecs, "vec_id", "embedding",
          cents, keep, codegenLimit = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(lit == hof, s"keep=$keep: paths disagree")
    }
  }
}
