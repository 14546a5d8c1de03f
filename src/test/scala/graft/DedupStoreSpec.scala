package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.DedupStore

/** The incremental near-dup artifact must honor the batch contract:
  * build on OLD docs + incrementalPairs(NEW) must equal the batch
  * operator (dd03) run over the union corpus, restricted to pairs
  * touching a new doc — without the incremental path ever re-shingling
  * the stored corpus. And append must leave the artifact equal to a
  * from-scratch build of the union.
  */
class DedupStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def reset(name: String): Unit = TestWarehouse.reset(spark,
    Seq("shingles", "sigs", "bands").map(t => s"${name}_$t"): _*)

  test("incrementalPairs == batch dd03 pairs touching the new docs") {
    reset("ds_inc")
    val docs = tables.load(spark, dir, "documents").select("doc_id", "text")
    val oldDocs = docs.filter(col("doc_id") % 5 =!= 0)
    val newDocs = docs.filter(col("doc_id") % 5 === 0)
    DedupStore.build(oldDocs, "ds_inc")

    val got = DedupStore.incrementalPairs(newDocs, "ds_inc")
      .select(col("doc_a"), col("doc_b"),
        graft.functions.ParityFunctions.duckRound(col("jaccard"), 6)
          .as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

    // ground truth: the batch operator over the FULL corpus (old ∪ new
    // = the whole table), keeping only pairs that touch a new doc
    val expected = SparkEntry.queries("dd03_minhash_lsh")(spark, dir)
      .filter(col("doc_a") % 5 === 0 || col("doc_b") % 5 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(expected.nonEmpty, "test premise: the split must produce pairs")
    assert(got == expected)
  }

  test("append leaves the artifact equal to a from-scratch build") {
    reset("ds_app"); reset("ds_full")
    val docs = tables.load(spark, dir, "documents").select("doc_id", "text")
    DedupStore.build(docs.filter(col("doc_id") % 5 =!= 0), "ds_app")
    DedupStore.append(docs.filter(col("doc_id") % 5 === 0), "ds_app")
    DedupStore.build(docs, "ds_full")
    for (t <- Seq("shingles", "sigs", "bands")) {
      val a = spark.table(s"ds_app_$t")
      val b = spark.table(s"ds_full_$t")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$t diverges between appended and rebuilt store")
    }
  }
}
