package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.VectorStore

/** The ANN build-once/serve-many artifact: serving must (1) reproduce
  * an INDEPENDENT pure-Scala IVF-SQ computation bit-for-bit, and
  * (2) never touch the raw embeddings table — the whole point of the
  * artifact is that queries run against codes, not the 100 TB corpus.
  */
class VectorStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def reset(name: String): Unit = TestWarehouse.reset(spark,
    Seq("centroids", "stats", "codes").map(t => s"${name}_$t"): _*)

  // ---- independent reference implementation (pure Scala, no Spark
  //      plans): same IEEE op order as the engine's folds ----
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

  test("serveTopK == independent pure-Scala IVF-SQ; zero corpus scans") {
    reset("vs")
    val e = tables.load(spark, dir, "embeddings")
    VectorStore.build(e.select(col("vec_id"), col("embedding")), "vs")

    val vecs: Map[Long, Array[Double]] = e
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val cents = vecs.filter(_._1 < VectorStore.Cells).toSeq.sortBy(_._1)
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

    val probeIds = vecs.keys.filter(id => id % 25 == 0 && id < 500).toSeq.sorted
    val expected = probeIds.flatMap { p =>
      val pe = vecs(p)
      val pc = cellsOf(pe, VectorStore.NProbe).toSet
      vecs.toSeq
        .filter { case (id, v) => id != p && pc.contains(cellsOf(v, 1).head) }
        .map { case (id, v) => (id, cosine(pe, deq(v))) }
        .sortBy { case (id, c) => (-c, id) }
        .take(VectorStore.TopK).zipWithIndex
        .map { case ((id, c), i) => (p, id, i + 1, c) }
    }.toSet

    // probes are QUERY INPUT, not corpus: materialize them as a local
    // frame so the plan guard below measures only the serve path
    import spark.implicits._
    val probes = probeIds.map(p => (p, vecs(p)))
      .toDF("probe_id", "pe")
    val served = VectorStore.serveTopK(probes, "vs")
    val got = served.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(expected.nonEmpty, "test premise: probes must retrieve rows")
    assert(got == expected)

    // serve plan reads codes/centroids/stats tables, never the corpus
    val p = served.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val corpusScans = "Location:[^\\n]*embeddings".r.findAllIn(p).size
    assert(corpusScans == 0, s"serve plan scans the corpus:\n$p")
  }

  test("append: new vectors join the store under the FROZEN codebook") {
    val e = tables.load(spark, dir, "embeddings")
    import spark.implicits._
    // append an exact copy of probe 25's vector under a fresh id: with
    // the stored codebook it quantizes identically, so it must come
    // back as that probe's nearest neighbor (cosine against its own
    // dequantization beats every other vector's)
    val probeVec = e.filter(col("vec_id") === 25)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    VectorStore.append(
      Seq((999999L, probeVec)).toDF("vec_id", "embedding"), "vs")
    val served = VectorStore.serveTopK(
      Seq((25L, probeVec)).toDF("probe_id", "pe"), "vs", k = 1)
    val top = served.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(top == Set((25L, 999999L)),
      s"appended duplicate not retrieved at rank 1: ${top.mkString(",")}")
  }

  test("serve-many: a second, different probe set works off the same build") {
    val e = tables.load(spark, dir, "embeddings")
    val probes2 = e.filter(col("vec_id") % 40 === 0 && col("vec_id") < 800)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val out = VectorStore.serveTopK(probes2, "vs", k = 3)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // ranks are 1..3 per probe, cosine non-increasing within a probe
    val byProbe = rows.groupBy(_.getLong(0))
    byProbe.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq == (1 to sorted.length))
      val cs = sorted.map(_.getDouble(3)).toSeq
      assert(cs == cs.sorted.reverse)
    }
  }
}
