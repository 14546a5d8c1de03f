package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Evidence for the AQE skew-join scale claim (SURVEY §4, brief's
  * "salting for skew, AQE for runtime re-plan"): when one join key
  * dominates, AQE must SPLIT the oversized shuffle partition into
  * parallel sub-tasks at run time (OptimizeSkewedJoin) instead of
  * letting one straggler task process the whole hot key. tx30's
  * salting is the hand-built mitigation for aggregations feeding a
  * join; this pins the optimizer-provided one for plain joins — the
  * 100 TB default, since it needs no key rewrite at all.
  */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("AQE splits the skewed join partition at run time") {
    import spark.implicits._
    // Zipf-extreme: key 0 holds 200k of 210k left rows; right is
    // uniform. Hash-partitioned on the key, partition(0) is ~20x the
    // median — precisely the straggler AQE exists to break up.
    // pad keeps ~100 B/row flowing through the shuffle (and into the
    // aggregate, so pruning can't drop it): partition(key 0) ≈ 20 MB
    val left = spark.range(200000)
      .select(lit(0L).as("k"), col("id").as("v"))
      .unionByName(spark.range(10000)
        .select((col("id") % 100 + 1).as("k"), col("id").as("v")))
      .withColumn("pad", concat(lit("x" * 92), col("v").cast("string")))
    val right = spark.range(101).select(col("id").as("k"), (col("id") * 7).as("w"))

    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k))
    try {
      // force a shuffle join (the skew path exists for joins too big to
      // broadcast) and size the skew thresholds down to the local data
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")

      // aggregate INSIDE the same frame so collect() drives this very
      // QueryExecution — count() would plan (and adapt) a separate one,
      // leaving this plan un-finalized. sum(length(pad)) keeps the fat
      // column alive through pruning.
      val joined = left.join(right, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(col("w")).as("s"),
          sum(length(col("pad"))).as("b"))
      val row = joined.collect().head
      // exact join cardinality: every left row matches exactly one right key
      assert(row.getLong(0) == 210000L,
        s"wrong join cardinality under AQE skew: ${row.getLong(0)}")
      // the FINAL adaptive plan must mark the SMJ as skew-handled
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"plan never finalized:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
