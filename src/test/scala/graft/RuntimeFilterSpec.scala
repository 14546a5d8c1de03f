package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Evidence for the runtime-filtering scale claims (SURVEY §4): on a
  * partitioned fact table, a selective dim filter must reach the fact
  * SCAN at run time — dynamic partition pruning skips whole partitions
  * the dim filter excludes, and the injected bloom filter drops
  * non-joining fact rows before the shuffle. At 100 TB these two are
  * the difference between scanning a day and scanning the decade; both
  * are free (optimizer-provided) once the layout and the join are
  * declared — exactly the "let Catalyst optimize" design rule.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("dynamic partition pruning reaches the partitioned fact scan") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("dpp").toString
    // fact: lineitem partitioned by ship month (the natural time layout
    // for an append-only fact at scale)
    tables.load(spark, dir, "lineitem")
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .write.mode("overwrite").partitionBy("ship_month").parquet(tmp)
    val fact = spark.read.parquet(tmp)
    // dim: months in which any order was opened late in the range —
    // selective, and only resolvable at run time (no static pruning)
    val dim = tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= "1997-06-01")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("ship_month"))
      .distinct()
    val joined = fact.join(dim, Seq("ship_month"))
      .agg(sum("l_quantity").as("qty"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan lost dynamic partition pruning:\n$plan")
    // and the pruned plan computes the same answer as a full scan + join
    val expected = tables.load(spark, dir, "lineitem")
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .join(dim, Seq("ship_month"))
      .agg(sum("l_quantity").as("qty")).as[Double].head()
    assert(joined.as[Double].head() == expected)
  }

  test("runtime bloom filter injects on a selective shuffle join") {
    import spark.implicits._
    // thresholds are sized for clusters; drop them so the local corpus
    // qualifies. Broadcast disabled: the bloom path exists for joins
    // too big to broadcast — the small side instead ships a compact
    // filter that prunes the fact before its shuffle.
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "8GB")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val li = tables.load(spark, dir, "lineitem")
      val ord = tables.load(spark, dir, "orders")
        .filter(col("o_orderstatus") === "F")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter on the fact side:\n$plan")
      assert(joined.as[Long].head() > 0)
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
