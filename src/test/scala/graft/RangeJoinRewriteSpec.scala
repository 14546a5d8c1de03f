package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.{PlanRules, RangeJoinRewrite}

/** The optimizer-extension showcase: a NAIVE interval-join predicate
  * (no manual binning, no equi key at all) must execute as a binned
  * equi-join once the rule is installed — same rows, no nested-loop
  * join — and revert to BNLJ when it isn't. This is the Rule[LogicalPlan]
  * tier of the custom-operator ladder: users write the obvious
  * predicate, the engine supplies the scale plan.
  */
class RangeJoinRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def naive = {
    import spark.implicits._
    // two event streams with microsecond keys; NO equi conjunct, so the
    // unassisted planner has nothing to hash on
    val a = (0L until 400L).map(i => (i, i * 37L % 10000L)).toDF("a_id", "a_us")
    val b = (0L until 400L).map(i => (i, i * 53L % 10000L)).toDF("b_id", "b_us")
    a.join(b, col("b_us") >= col("a_us") && col("b_us") < col("a_us") + 500L)
      .select("a_id", "b_id")
  }

  test("naive range predicate becomes a binned equi-join under the rule") {
    val before = spark.experimental.extraOptimizations
    try {
      PlanRules.install(spark)
      val df = naive
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rule did not produce an equi-join:\n$plan")

      // reference semantics from the unassisted plan
      spark.experimental.extraOptimizations = before
      val ref = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == ref, "rewrite changed the join result")
      assert(ref.nonEmpty, "degenerate fixture: no qualifying pairs")
    } finally spark.experimental.extraOptimizations = before
  }

  test("rule leaves non-matching joins untouched") {
    import spark.implicits._
    val before = spark.experimental.extraOptimizations
    try {
      PlanRules.install(spark)
      val a = Seq((1L, 10L)).toDF("a_id", "a_us")
      val b = Seq((2L, 12L)).toDF("b_id", "b_us")
      // no upper bound → not an interval join; must not be rewritten
      val open = a.join(b, col("b_us") >= col("a_us"))
      val plan = open.queryExecution.optimizedPlan.toString
      assert(!plan.contains("graft_range_bin"), s"over-eager rewrite:\n$plan")
      assert(open.count() == 1)
    } finally spark.experimental.extraOptimizations = before
  }

  test("install is idempotent") {
    val before = spark.experimental.extraOptimizations
    try {
      PlanRules.install(spark)
      PlanRules.install(spark)
      assert(spark.experimental.extraOptimizations
        .count(_ == RangeJoinRewrite) == 1)
    } finally spark.experimental.extraOptimizations = before
  }
}
