package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-13 "trust the approximate structure" checks: sm14 (metadata
  * PRE-filtered ANN) and dd18 (MinHash estimator calibration). Both are
  * oracle-checked by the driver; these specs pin what the hash can't —
  * filter soundness, pre-filter dominance over post-filtering, banding
  * agreement floors, and estimator arithmetic.
  */
class SearchCalibrationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, dir)

  test("sm14 only ever returns neighbors satisfying the filter") {
    val labels = tables.load(spark, dir, "embeddings")
      .select(col("vec_id").as("neighbor_id"), col("label"))
    val bad = run("sm14_filtered_ann")
      .join(labels, Seq("neighbor_id"))
      .filter(col("label") % 2 =!= 0)
      .count()
    assert(bad == 0L, "an ineligible neighbor leaked through the filter")
  }

  test("sm14 ranks are dense per probe") {
    val bad = run("sm14_filtered_ann")
      .groupBy("probe_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .filter(col("mx") =!= col("n"))
      .count()
    assert(bad == 0L)
  }

  test("sm14 pre-filtering dominates post-filtering sm03's top-k") {
    // every eligible row of the UNFILTERED top-5 keeps rank ≤ 5 among
    // eligible candidates, so it must reappear in sm14 — pre-filtering
    // can only ADD eligible neighbors post-filtering threw away
    val labels = tables.load(spark, dir, "embeddings")
      .select(col("vec_id").as("neighbor_id"), col("label"))
    val post = run("sm03_ivf_topk")
      .join(labels, Seq("neighbor_id"))
      .filter(col("label") % 2 === 0)
      .select("probe_id", "neighbor_id")
    val pre = run("sm14_filtered_ann").select("probe_id", "neighbor_id")
    assert(post.exceptAll(pre).count() == 0L,
      "a post-filter survivor missing from the pre-filtered search")
    assert(pre.count() >= post.count())
  }

  test("dd18 candidates agree on at least one full band") {
    // a banded candidate pair shares BandRows consecutive signature
    // slots by construction — fewer agreeing slots would mean the
    // banding join emitted a pair no band justifies
    val bad = run("dd18_minhash_estimate")
      .filter(col("n_agree") < 2)
      .count()
    assert(bad == 0L)
  }

  test("dd18 estimator arithmetic: est_j = n_agree/12, err = |est - exact|") {
    val rows = run("dd18_minhash_estimate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est_j")
      val exact = r.getAs[Double]("exact_j")
      val err = r.getAs[Double]("err")
      assert(math.abs(est - r.getAs[Int]("n_agree") / 12.0) < 1e-6)
      assert(est >= 0.0 && est <= 1.0 && exact >= 0.0 && exact <= 1.0)
      assert(math.abs(err - math.abs(est - exact)) < 2e-6)
    }
  }

  test("dd18 covers every pair dd03 reports (it is the unthresholded view)") {
    val dd03 = run("dd03_minhash_lsh").select("doc_a", "doc_b")
    val dd18 = run("dd18_minhash_estimate").select("doc_a", "doc_b")
    assert(dd03.exceptAll(dd18).count() == 0L)
  }
}
