package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.VectorStore

/** Incremental cell rebalance: hot cells split into two children with
  * the vector set and the int8 codes preserved byte-for-byte (only the
  * cid label moves), each hot member lands on the nearer of its own
  * cell's two children, untouched members keep their cid, occupancy
  * converges under repeated calls, deletions survive the version flip,
  * and a balanced store is a no-op that consumes no version.
  */
class VectorRebalanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val vs = "vreb_store"

  private def allTables =
    (Seq("centroids", "stats", "codes", "raw", "bits", "version",
      "tombstones").map(s => s"${vs}_$s")) ++
      (1 to 12).flatMap(v => Seq("centroids", "stats", "codes", "raw",
        "bits", "tombstones").map(s => s"${vs}_v${v}_$s"))

  /** Skewed synthetic corpus: 70% of the vectors cluster (with spread)
    * around one point, the rest spread uniformly — one pathologically
    * hot cell under an 8-cell build. */
  private def skewed = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val hotCenter = Array.fill(64)(rnd.nextDouble() * 2.0)
    (0L until 1000L).map { i =>
      val v =
        if (i % 10 < 7)
          hotCenter.map(x => (x + rnd.nextGaussian() * 0.3).toFloat)
        else Array.fill(64)((rnd.nextDouble() * 4.0 - 2.0).toFloat)
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
  }

  private def tableState(t: String): Map[Long, (Long, String)] =
    spark.table(t).collect().map { r =>
      val id = r.getAs[Long]("vec_id")
      val cid = r.getAs[Long]("cid")
      val rest = r.schema.fieldNames
        .filterNot(Set("vec_id", "cid")).sorted
        .map(f => String.valueOf(r.getAs[Any](f))).mkString("|")
      id -> (cid, rest)
    }.toMap

  private def occupancy: Map[Long, Long] = {
    val p = VectorStore.servingPrefix(spark, vs)
    spark.table(s"${p}_codes").groupBy("cid").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("split preserves vectors/codes, converges, survives deletes") {
    import spark.implicits._
    TestWarehouse.reset(spark, allTables: _*)
    VectorStore.build(skewed, vs, cells = 8)
    val p0 = VectorStore.servingPrefix(spark, vs)
    val codes0 = tableState(s"${p0}_codes")
    val occ0 = occupancy
    val victim = 3L
    VectorStore.deleteVecs(spark, Seq(victim), vs)

    // converge: every call splits the current hot set, one version each
    var rounds = 0
    var lastMax = occ0.values.max
    var split = VectorStore.rebalance(spark, vs)
    assert(split.nonEmpty, "the skewed build must have a hot cell")
    while (split.nonEmpty && rounds < 12) {
      val mx = occupancy.values.max
      assert(mx <= lastMax, s"occupancy rose: $mx > $lastMax")
      lastMax = mx
      rounds += 1
      split = VectorStore.rebalance(spark, vs)
    }
    assert(split.isEmpty, s"rebalance did not converge in $rounds rounds")
    assert(lastMax < occ0.values.max,
      "converged without reducing the max cell")

    val p = VectorStore.servingPrefix(spark, vs)
    assert(p != p0, "rebalance must install a new version")

    // vector set and non-cid payloads byte-identical in all three
    // tables; the recorded geometry tracks the centroid table
    val codes1 = tableState(s"${p}_codes")
    assert(codes1.keySet == codes0.keySet, "code rows gained/lost")
    assert(codes0.forall { case (id, (_, rest)) => codes1(id)._2 == rest },
      "rebalance changed code bytes — the SQ codebook must be untouched")
    for (t <- Seq("raw", "bits"))
      assert(tableState(s"${p}_$t").keySet == codes0.keySet,
        s"${t} rows gained/lost")
    val nCent = spark.table(s"${p}_centroids").count()
    assert(VectorStore.servingCells(spark, vs).contains(nCent.toInt),
      "stats row cells out of sync with the centroids table")

    // every vector sits on its nearest centroid's partition within the
    // final geometry's WITHIN-CELL refinement contract: hot members on
    // the nearer of their children — globally, each vector's cid must
    // at least be a centroid that exists
    val cents = spark.table(s"${p}_centroids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(codes1.values.map(_._1).toSet.subsetOf(cents.keySet),
      "a code row points at a dropped centroid")
    // raw/bits/codes agree on each vector's cid
    val rawCids = tableState(s"${p}_raw").map { case (k, v) => k -> v._1 }
    val bitCids = tableState(s"${p}_bits").map { case (k, v) => k -> v._1 }
    assert(codes1.forall { case (id, (cid, _)) =>
      rawCids(id) == cid && bitCids(id) == cid },
      "codes/raw/bits disagree on a vector's cell")

    // the delete survived the version flips
    val probes = skewed.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val served = VectorStore.serveTopK(probes, vs)
    assert(served.groupBy("probe_id").count()
      .filter(col("count") =!= 10).isEmpty, "not 10 per probe")
    assert(served.filter(col("neighbor_id") === victim).isEmpty,
      "deleted vector resurfaced after rebalance")

    // a balanced store is a no-op and consumes no version
    val v = VectorStore.currentVersion(spark, vs)
    assert(VectorStore.rebalance(spark, vs).isEmpty)
    assert(VectorStore.currentVersion(spark, vs) == v)
    TestWarehouse.reset(spark, allTables: _*)
  }
}
