package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Dedup

/** pl14's engine: bipartite near-dup (corpus vs probe) must agree with
  * the batch operator (dd03) restricted to pairs crossing the split —
  * same shingling, same signatures, same bands, just a bipartite
  * candidate join with the probe side broadcast.
  */
class BipartitePairsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("bipartitePairs == batch dd03 pairs crossing the split") {
    val docs = tables.load(spark, dir, "documents").select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val probe = docs.filter(col("doc_id") % 5 === 0)

    val got = Dedup.bipartitePairs(corpus, probe, 0.4)
      .select(col("doc_id"), col("probe_doc_id"),
        graft.functions.ParityFunctions.duckRound(col("jaccard"), 6)
          .as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

    // ground truth: dd03 over the full corpus, pairs with EXACTLY one
    // endpoint on the probe side, re-oriented as (corpus, probe)
    val expected = SparkEntry.queries("dd03_minhash_lsh")(spark, dir)
      .filter((col("doc_a") % 5 === 0) =!= (col("doc_b") % 5 === 0))
      .select(
        when(col("doc_a") % 5 =!= 0, col("doc_a")).otherwise(col("doc_b"))
          .as("c"),
        when(col("doc_a") % 5 === 0, col("doc_a")).otherwise(col("doc_b"))
          .as("p"),
        col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(expected.nonEmpty, "test premise: the split must produce pairs")
    assert(got == expected)
  }

  test("probe docs never pair with themselves across the split") {
    val docs = tables.load(spark, dir, "documents").select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val probe = docs.filter(col("doc_id") % 5 === 0)
    val ids = Dedup.bipartitePairs(corpus, probe, 0.4)
      .select("doc_id", "probe_doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ids.forall { case (c, p) => c % 5 != 0 && p % 5 == 0 })
  }
}
