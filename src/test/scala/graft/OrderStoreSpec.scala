package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.OrderStore

/** The frozen training-order artifact must honor the batch contract:
  * the stored packed order equals fresh pl33 bit for bit and a served
  * shard is read partition-pruned with zero corpus scans; [[verify]]
  * is empty against the build corpus and flags exactly the shards a
  * corpus change touches; a rebuild is invisible until the 1-row
  * pointer flip (crash isolation), after which serving follows the new
  * corpus.
  */
class OrderStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def corpus() = tables.load(spark, dir, "documents")

  private def resetStore(name: String): Unit = {
    val tails = Seq("order", "manifest")
    val versioned = for (v <- 2 to 4; t <- tails) yield s"${name}_v${v}_$t"
    TestWarehouse.reset(spark,
      tails.map(t => s"${name}_$t") ++ versioned :+ s"${name}_version": _*)
  }

  test("stored order == fresh pl33; served shard is partition-pruned") {
    resetStore("ord")
    OrderStore.build(corpus(), "ord")
    val stored = OrderStore.order(spark, "ord")
      .orderBy("shard_id", "pos").collect()
    val fresh = SparkEntry.queries("pl33_sequence_pack")(spark, dir).collect()
    assert(stored.length == fresh.length && stored.length > 0)
    stored.zip(fresh).foreach { case (a, b) =>
      Seq("shard_id", "pos", "doc_id", "n_tok", "seq_id", "seq_offset")
        .foreach(c => assert(a.getAs[Long](c) == b.getAs[Long](c),
          s"column $c diverges at shard ${b.getAs[Long]("shard_id")} " +
            s"pos ${b.getAs[Long]("pos")}"))
    }
    // the shard read prunes to one partition and never scans parquet
    val shard = fresh.head.getAs[Long]("shard_id")
    val served = OrderStore.serveShard(spark, "ord", shard)
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("documents"), "serving must not scan the corpus")
    assert(plan.contains(s"PartitionFilters: [isnotnull(shard_id") &&
      plan.contains(s"shard_id#") && plan.contains(s" = $shard)"),
      s"the shard filter must prune at the PARTITION level:\n$plan")
    assert(served.count() ==
      fresh.count(_.getAs[Long]("shard_id") == shard))
    spark.catalog.clearCache()
  }

  test("verify is empty on the build corpus and flags a changed corpus") {
    resetStore("ordv")
    OrderStore.build(corpus(), "ordv")
    assert(OrderStore.verify(corpus(), "ordv").isEmpty,
      "intact corpus must verify clean")
    // substitute one doc's text: exactly that doc's shard must flag —
    // same membership/order, different content hash
    val docId = corpus().select("doc_id").orderBy("doc_id").head.getLong(0)
    val tampered = corpus().withColumn("text",
      when(col("doc_id") === docId, lit("tampered")).otherwise(col("text")))
    val flagged = OrderStore.verify(tampered, "ordv").collect()
    val shardOf = SparkEntry.queries("pl28_training_order")(spark, dir)
      .filter(col("doc_id") === docId).head.getAs[Long]("shard_id")
    assert(flagged.map(_.getAs[Long]("shard_id")).toSeq == Seq(shardOf),
      s"exactly the tampered doc's shard must flag, got ${flagged.toSeq}")
    // a dropped doc flags its shard too (count + checksum both move)
    val dropped = corpus().filter(col("doc_id") =!= docId)
    assert(OrderStore.verify(dropped, "ordv").collect()
      .map(_.getAs[Long]("shard_id")).toSeq == Seq(shardOf))
    spark.catalog.clearCache()
  }

  test("rebuild is invisible before the pointer flip, atomic after") {
    resetStore("ordr")
    OrderStore.build(corpus(), "ordr")
    val before = OrderStore.order(spark, "ordr")
      .agg(count(lit(1)), sum("n_tok")).head
    // simulate the crash window: next-version tables fully written but
    // the pointer never flipped — serving must be unaffected
    val half = corpus().filter(col("doc_id") % 2 === 0)
    graft.queries.Pipeline.packedOrderOf(half)
      .write.partitionBy("shard_id").mode("overwrite")
      .saveAsTable("ordr_v2_order")
    graft.queries.Pipeline.orderManifestOf(half)
      .write.mode("overwrite").saveAsTable("ordr_v2_manifest")
    assert(OrderStore.currentVersion(spark, "ordr") == 1L)
    val during = OrderStore.order(spark, "ordr")
      .agg(count(lit(1)), sum("n_tok")).head
    assert(during == before, "a crashed rebuild must not change serving")
    // the real rebuild: pointer flips, serving follows the new corpus,
    // and verify against the OLD corpus now flags the missing docs
    val v = OrderStore.rebuild(half, "ordr")
    assert(v == 2L) // the rebuild overwrites the crashed v2 attempt
    assert(OrderStore.order(spark, "ordr").count() == half.count())
    assert(OrderStore.verify(half, "ordr").isEmpty)
    assert(!OrderStore.verify(corpus(), "ordr").isEmpty)
    spark.catalog.clearCache()
  }
}
