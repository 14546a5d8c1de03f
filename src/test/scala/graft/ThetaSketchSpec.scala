package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ThetaSketch

/** Theta retention must be EXACT below the sketch's nominal-entry
  * count (the sketch holds every hash — set ops are exact, not
  * estimates), and invariant to row order (k-smallest-hashes state).
  */
class ThetaSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("below nominal entries the intersection is exact; row-order invariant") {
    import spark.implicits._
    val e = tables.load(spark, dir, "events")
    val est = ThetaSketch.weeklyRetention(e)
      .select(col("event_type"), col("week"),
        col("est_retained").cast("long").as("est"))
      .as[(String, java.sql.Timestamp, Long)].collect()
        .map { case (t, w, v) => (t, w) -> v }.toMap
    // exact twin
    val wu = e.select(col("event_type"),
      date_trunc("WEEK", col("ts")).as("week"), col("user_id")).distinct()
    val nxt = wu.select(col("event_type").as("t2"),
      (col("week") - expr("INTERVAL 7 DAYS")).as("w2"),
      col("user_id").as("u2"))
    val exact = wu.join(nxt, col("event_type") === col("t2") &&
        col("week") === col("w2") && col("user_id") === col("u2"))
      .groupBy("event_type", "week").agg(count(lit(1)).as("n"))
      .as[(String, java.sql.Timestamp, Long)].collect()
        .map { case (t, w, v) => (t, w) -> v }.toMap
    assert(exact.nonEmpty, "fixture has no adjacent-week retention")
    for ((k, n) <- exact)
      assert(est(k) == n,
        s"$k: theta intersection ${est(k)} != exact $n in exact mode")
    // row order cannot change the k-smallest-hashes state
    val shuffled = ThetaSketch.weeklyRetention(
        e.orderBy(md5(col("event_id").cast("string"))))
      .select(col("event_type"), col("week"),
        col("est_retained").cast("long").as("est"))
      .as[(String, java.sql.Timestamp, Long)].collect()
        .map { case (t, w, v) => (t, w) -> v }.toMap
    assert(shuffled == est, "theta retention depends on row order")
  }
}
