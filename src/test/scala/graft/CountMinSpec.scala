package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Count–min sketch error-bound pin (the point-frequency member of the
  * approximate-aggregate family, beside HLL `ApproxCountDistinctSpec`,
  * approx_percentile, and the Misra–Gries `HeavyHittersSpec`): CMS
  * never undercounts, and with width ⌈e/ε⌉ overcounts by at most ε·n
  * with probability ≥ confidence. Also pins MERGEABILITY — sketches
  * built per-partition and counter-added equal the one-shot sketch
  * (same seed ⇒ same hash family), which is what makes the sketch
  * distributable: 100 TB reduces to |partitions| × (width·depth)
  * counters, no token shuffle.
  */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private val Eps = 0.005
  private val Conf = 0.99
  private val Seed = 42

  test("CMS bounds: never undercounts, overcount ≤ eps*n (fixed seed)") {
    val toks = tables.load(spark, dir, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token"))
    val exact = toks.groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val cms = toks.stat.countMinSketch(
      "token", Eps, Conf, Seed)
    val slack = (Eps * n).toLong
    val over = exact.count { case (t, c) =>
      val e = cms.estimateCount(t)
      assert(e >= c, s"CMS undercounted $t: $e < $c")
      e > c + slack
    }
    // ε-overshoot is probabilistic per query; with the fixed seed this
    // corpus resolves deterministically — pin zero violations
    assert(over == 0, s"$over tokens exceeded the eps*n overcount bound")
  }

  test("per-partition sketches merge to the one-shot sketch") {
    val docs = tables.load(spark, dir, "documents")
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token"))
        .stat.countMinSketch("token", Eps, Conf, Seed)
    val whole = sk(docs)
    val merged = sk(docs.filter(col("doc_id") % 2 === 0))
      .mergeInPlace(sk(docs.filter(col("doc_id") % 2 =!= 0)))
    // same hash family (same seed/eps/conf) ⇒ counter arrays add
    // exactly: every estimate must agree, not just be close
    val probe = tables.load(spark, dir, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token"))
      .distinct().limit(200).collect().map(_.getString(0))
    probe.foreach { t =>
      assert(whole.estimateCount(t) == merged.estimateCount(t),
        s"merged CMS diverges from one-shot on $t")
    }
  }
}
