package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** pl30 Poisson bootstrap: the oracle hash pins the arithmetic; these
  * pin the STATISTICS a hash can't name — the weights actually behave
  * like Poisson(1) draws (total resample mass ≈ corpus size, replicate
  * spread is non-degenerate) and the whole frame is a pure function of
  * (doc_id, b), re-derived from first principles in Scala.
  */
class BootstrapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run() =
    SparkEntry.queries("pl30_bootstrap")(spark, dir)

  test("replicate mass centers on the corpus size (E[Poisson(1)] = 1)") {
    val n = tables.load(spark, dir, "documents").count()
    val rows = run().collect()
    assert(rows.length == 16)
    val means = rows.map(_.getAs[Long]("n_eff").toDouble / n)
    // 500 docs/replicate → sd of the mean weight ≈ 1/√500 ≈ 0.045;
    // ±5 sd bounds make this a structure test, not a flake
    assert(means.forall(m => m > 0.78 && m < 1.22),
      s"replicate mass off Poisson(1): ${means.mkString(", ")}")
    // and the replicates are not all the same draw
    assert(rows.map(_.getAs[Long]("n_eff")).distinct.length > 1)
  }

  test("weights re-derive from first principles (md5 coin → inverse CDF)") {
    val cdf = Seq(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563,
      0.9994058151824183, 0.9999167588507119)
    def weight(b: Long, docId: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"boot$b:$docId".getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
      cdf.indexWhere(u < _) match { case -1 => cdf.size.toLong; case k => k.toLong }
    }
    val docs = tables.load(spark, dir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val expected = (0L until 16L).map { b =>
      val ws = docs.map { case (id, nc) => (weight(b, id), nc) }
      (b, ws.map(_._1).sum, ws.map { case (w, nc) => w * nc }.sum)
    }
    val got = run().select("b", "n_eff", "sum_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }
}
