package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Companion to ApproxCountDistinctSpec for the OTHER approximate
  * aggregate: `approx_percentile(col, p, accuracy)` guarantees rank
  * error ≤ n/accuracy, so each estimate must land between the exact
  * quantiles at p ± 1/accuracy (evaluated with a comfortable 2×
  * margin). Exact-percentile q26 stays the oracle-checked twin.
  */
class ApproxPercentileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("approx_percentile sits inside its rank-error band") {
    import spark.implicits._
    val accuracy = 100 // rank error <= 1% of the group
    val margin = 2.0 / accuracy
    for (p <- Seq(0.5, 0.9)) {
      val rows = tables.load(spark, "/root/testdata/sf0.01", "orders")
        .groupBy("o_orderstatus")
        .agg(
          expr(s"approx_percentile(o_totalprice, $p, $accuracy)").as("approx"),
          expr(s"percentile(o_totalprice, ${p - margin})").as("lo"),
          expr(s"percentile(o_totalprice, ${p + margin})").as("hi"))
        .as[(String, Double, Double, Double)].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (status, approx, lo, hi) =>
        assert(approx >= lo && approx <= hi,
          s"p=$p status=$status: approx=$approx outside [$lo, $hi]")
      }
    }
  }
}
