package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.index.IndexStore

/** The bucket count is a BUILD parameter with a recorded contract
  * (SURVEY §6b: test SFs use 8, a 100 TB deployment uses hundreds):
  * building at a non-default count must preserve the zero-exchange
  * serving property, the count must be readable from the stats side
  * table, and a consumer assuming a different count must fail loudly
  * instead of silently losing co-partitioning.
  */
class IndexStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // same parquet data as sf0.001, but the "/." spelling gives a
  // different corpus tag — an isolated artifact namespace, so the
  // non-default build can't collide with the default-count artifact
  // the tx18/tx19/sm13 suites build for the plain path in this JVM
  private val isoDir = "/root/testdata/sf0.001/."

  test("non-default bucket count: recorded, served zero-exchange") {
    val table = IndexStore.termDocTable(spark, isoDir, buckets = 11)
    assert(IndexStore.recordedBuckets(spark, isoDir) == 11)

    // the per-token aggregation satisfies its distribution requirement
    // straight off the bucketed scan — no exchange before the agg
    val agg = spark.table(table).groupBy("token")
      .agg(sum("cnt").as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"),
      s"non-default-count table must still scan bucketed:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(token"),
      s"bucketed serve lost its zero-exchange property at 11 buckets:\n$plan")

    // and the postings are the same rows the default-count build serves
    val iso = spark.table(table).select("doc_id", "token", "cnt")
      .orderBy("doc_id", "token").collect().toSeq
    val dflt = IndexStore.termDoc(spark, "/root/testdata/sf0.001")
      .select("doc_id", "token", "cnt")
      .orderBy("doc_id", "token").collect().toSeq
    assert(iso == dflt, "bucket count must not change artifact content")
  }

  test("a consumer assuming a different bucket count fails loudly") {
    IndexStore.termDocTable(spark, isoDir, buckets = 11)
    val ex = intercept[IllegalArgumentException] {
      IndexStore.termDocTable(spark, isoDir, buckets = IndexStore.DefaultBuckets)
    }
    assert(ex.getMessage.contains("built with 11 buckets"),
      s"mismatch must name the recorded count, got: ${ex.getMessage}")
    // the stats side table stays consumer-schema-stable (n_docs only;
    // checked on the default-count artifact — docStats on isoDir
    // rightly trips the same guard, being a default-count consumer)
    assert(IndexStore.docStats(spark, "/root/testdata/sf0.001")
      .columns.toSeq == Seq("n_docs"))
  }
}
