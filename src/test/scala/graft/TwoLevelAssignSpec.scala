package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Similarity

/** Two-level coarse-quantizer assignment (the scale answer to
  * single-level O(n·cells) build assignment): past
  * `Similarity.TwoLevelCellLimit` cells, build assignment scans ~2√C
  * centroids per vector instead of C. The contract pinned here:
  * (1) the expression equals an independent pure-Scala twin of the
  * two-stage argmin bit-for-bit; (2) the approximation agrees with
  * exact argmin on the overwhelming majority of vectors (boundary
  * cases only); (3) a store BUILT through the two-level path still
  * serves with healthy recall against exact search.
  */
class TwoLevelAssignSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val rnd = new scala.util.Random(11)
  private val dim = 8
  private val nCells = 300 // > TwoLevelCellLimit -> two-level path
  private val cents: Seq[(Long, Seq[Double])] =
    (0L until nCells.toLong).map(c => c -> Seq.fill(dim)(rnd.nextDouble()))
  private val vecs: Seq[(Long, Seq[Double])] =
    (1000L until 1800L).map(i => i -> Seq.fill(dim)(rnd.nextDouble()))

  private def l2sq(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Independent twin of the two-stage ARGMIN (the grouping itself
    * comes from `Similarity.twoLevelGroups` — shared on purpose, so
    * this pins the expression's evaluation, while the grouping's
    * spatial quality is pinned by the agreement floor below):
    * stage-1 strict-< (first minimum wins), stage-2 (dist, cid). */
  private lazy val (supers, memberStart, members) =
    Similarity.twoLevelGroups(cents)
  private def twin(v: Seq[Double]): Long = {
    var bg = 0; var bgd = Double.PositiveInfinity
    supers.zipWithIndex.foreach { case (s, i) =>
      val d = l2sq(v, s); if (d < bgd) { bgd = d; bg = i }
    }
    members.slice(memberStart(bg), memberStart(bg + 1))
      .map { case (cid, ce) => (l2sq(v, ce), cid) }.min._2
  }

  private def exact(v: Seq[Double]): Long =
    cents.map { case (cid, ce) => (l2sq(v, ce), cid) }.min._2

  test("expression equals the independent two-stage twin bit-for-bit") {
    import spark.implicits._
    val got = Similarity.assignCells(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = vecs.map { case (id, v) => id -> twin(v) }.toMap
    assert(got == want,
      s"two-level expression diverged from the twin on " +
        s"${got.count { case (k, v) => want(k) != v }} of ${got.size}")
  }

  test("two-level agrees with exact argmin on most vectors") {
    val agree = vecs.count { case (_, v) => twin(v) == exact(v) }
    // boundary-straddling vectors are the designed-in approximation;
    // wholesale disagreement would mean the grouping is broken
    assert(agree.toDouble / vecs.size >= 0.55,
      s"only $agree of ${vecs.size} two-level assignments match exact")
  }

  // ---- clustered corpus (round-14 verdict item 8): uniform vectors
  // are stage-1 grouping's WORST case (no spatial structure for the
  // super-centroids to capture); a clustered population — the shape
  // real embedding corpora have — must hold the same floors. Both the
  // centroid set and the assigned vectors come from the same mixture,
  // mirroring how a real store seeds centroids from corpus rows.
  private val cRnd = new scala.util.Random(23)
  private val clusterCenters: IndexedSeq[Seq[Double]] =
    (0 until 25).map(_ => Seq.fill(dim)(cRnd.nextDouble() * 4.0))
  private def clusteredVec(): Seq[Double] = {
    val c = clusterCenters(cRnd.nextInt(clusterCenters.size))
    c.map(_ + cRnd.nextGaussian() * 0.15)
  }
  private val cCents: Seq[(Long, Seq[Double])] =
    (0L until nCells.toLong).map(c => c -> clusteredVec())
  private val cVecs: Seq[(Long, Seq[Double])] =
    (1000L until 1800L).map(i => i -> clusteredVec())

  private lazy val (cSupers, cMemberStart, cMembers) =
    Similarity.twoLevelGroups(cCents)
  private def cTwin(v: Seq[Double]): Long = {
    var bg = 0; var bgd = Double.PositiveInfinity
    cSupers.zipWithIndex.foreach { case (s, i) =>
      val d = l2sq(v, s); if (d < bgd) { bgd = d; bg = i }
    }
    cMembers.slice(cMemberStart(bg), cMemberStart(bg + 1))
      .map { case (cid, ce) => (l2sq(v, ce), cid) }.min._2
  }
  private def cExact(v: Seq[Double]): Long =
    cCents.map { case (cid, ce) => (l2sq(v, ce), cid) }.min._2

  test("clustered corpus: expression equals the twin bit-for-bit") {
    import spark.implicits._
    val got = Similarity.assignCells(
        cVecs.toDF("vec_id", "embedding"), "vec_id", "embedding", cCents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = cVecs.map { case (id, v) => id -> cTwin(v) }.toMap
    assert(got == want,
      s"clustered: expression diverged from the twin on " +
        s"${got.count { case (k, v) => want(k) != v }} of ${got.size}")
  }

  test("clustered corpus: two-level agrees with exact argmin on most") {
    val agree = cVecs.count { case (_, v) => cTwin(v) == cExact(v) }
    // clustered data gives stage-1 real structure to capture — the
    // floor is HIGHER than the uniform worst case's 0.55
    assert(agree.toDouble / cVecs.size >= 0.70,
      s"clustered: only $agree of ${cVecs.size} match exact argmin")
  }

  test("stats row records the assignment mode the codes were built with") {
    import spark.implicits._
    def reset(n: String) = TestWarehouse.reset(spark,
      Seq("centroids", "stats", "codes", "raw", "bits", "version", "tombstones")
        .map(s => s"${n}_$s"): _*)
    reset("tlm_big"); reset("tlm_small")
    graft.index.VectorStore.build(
      (cCents ++ cVecs).toDF("vec_id", "embedding"), "tlm_big",
      cells = nCells) // 300 cells: past TwoLevelCellLimit (256)
    assert(graft.index.VectorStore.assignMode(spark, "tlm_big")
      .contains("two_level"),
      "a >TwoLevelCellLimit build must record two_level")
    graft.index.VectorStore.build(
      cVecs.take(100).toDF("vec_id", "embedding"), "tlm_small")
    assert(graft.index.VectorStore.assignMode(spark, "tlm_small")
      .contains("exact"),
      "a floor-geometry build must record exact")
    reset("tlm_big"); reset("tlm_small")
  }

  test("a store built through the two-level path serves with recall") {
    import spark.implicits._
    TestWarehouse.reset(spark,
      Seq("centroids", "stats", "codes", "raw", "bits", "version", "tombstones")
        .map(s => s"tl_store_$s"): _*)
    val e = (cents.map { case (c, v) => (c, v) } ++ vecs)
      .toDF("vec_id", "embedding")
    graft.index.VectorStore.build(e, "tl_store", cells = nCells)
    val probes = vecs.take(10)
      .map { case (id, v) => (id, v) }.toDF("probe_id", "pe")
    val served = graft.index.VectorStore.serveTopK(probes, "tl_store", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (p, xs) => p -> xs.map(_._2).toSet }
    // exact top-10 baseline over the same population
    val all = cents ++ vecs
    val hits = probes.collect().map { r =>
      val p = r.getLong(0)
      val pv = r.getSeq[Double](1)
      val ex = all.filter(_._1 != p)
        .map { case (id, v) => (l2sq(pv, v), id) }.sorted.take(10)
        .map(_._2).toSet
      // NOTE: serveTopK ranks by COSINE; this baseline is L2 —
      // related but not identical orders on this data, so the floor
      // is recall-shaped, not equality-shaped
      served(p).intersect(ex).size
    }
    assert(hits.sum >= 30,
      s"two-level-built store lost retrieval quality: hits=${hits.toSeq}")
    TestWarehouse.reset(spark,
      Seq("centroids", "stats", "codes", "raw", "bits", "version", "tombstones")
        .map(s => s"tl_store_$s"): _*)
  }
}
