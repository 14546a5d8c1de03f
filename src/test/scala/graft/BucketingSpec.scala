package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Evidence for the bucketed co-located join claim (SURVEY §2.2): a
  * fact-fact join on the bucket key must read both sides bucket-aligned
  * and plan ZERO shuffles — at 100 TB the bucketed layout replaces the
  * two biggest exchanges of the repeated join with a one-time write
  * cost.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join without an exchange") {
    import spark.implicits._
    // tables land in the session's default warehouse (static conf);
    // DROP TABLE below removes the managed files
    // AQE can demote bucketed SMJ sides; disable for a deterministic plan
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      tables.load(spark, dir, "orders")
        .write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")

      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(sum("l_quantity").as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      // the aggregation after the join legitimately shuffles on its own
      // key; the JOIN keys must not — bucketed scans satisfy the SMJ's
      // distribution requirement directly (Bucketed: true)
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
        !plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join still shuffles its inputs:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert("Bucketed: true".r.findAllIn(plan).size == 2,
        s"both scans must be bucket-aligned:\n$plan")

      // and the result matches the unbucketed plan
      val expected = tables.load(spark, dir, "orders")
        .join(tables.load(spark, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(sum("l_quantity").as("qty"))
        .orderBy("o_orderstatus").as[(String, Double)].collect().toSeq
      val got = joined.orderBy("o_orderstatus")
        .as[(String, Double)].collect().toSeq
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
