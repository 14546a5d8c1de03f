package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Evidence for the AQE skew story (SURVEY §2.2 / the 100 TB design
  * point): when one join key dominates a shuffle, AQE must split the
  * skewed partition at runtime instead of letting one task absorb the
  * whole key. The salting demo (tx14) is the manual fallback; this
  * pins the automatic path so a config/regression can't silently turn
  * it off.
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("AQE splits a skewed shuffle join partition (skew=true)") {
    import spark.implicits._
    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink thresholds so test-sized data counts as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows on ONE hot key + a uniform tail vs a small-but-not-
      // broadcast dimension side
      val fact = spark.range(0, 60000)
        .select(when(col("id") < 50000, 0L).otherwise(col("id") % 64)
          .as("k"), concat(lit("payload_payload_payload_"), col("id"))
          .as("payload"))
      val dim = spark.range(0, 64)
        .select(col("id").as("k"), concat(lit("dim_"), col("id")).as("name"))
      val joined = fact.join(dim, Seq("k"))
      // run through THIS Dataset's QueryExecution (write.save and even
      // count() spawn their own), so executedPlan below is the
      // adaptive FINAL plan
      joined.collect()
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the hot partition as skewed:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
