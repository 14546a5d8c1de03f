package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.{Erasure, VectorStore}
import graft.streaming.IndexMaintenance

/** The right-to-erasure arc: one ledger drives tombstones across the
  * serving artifacts. Erased docs must vanish from SERVED postings and
  * vector results immediately, survive re-enforce unchanged
  * (idempotency), be PHYSICALLY purged by the artifacts' own
  * compaction, and be barred from re-entering via the ingestion gate.
  */
class ErasureSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private val led = "ers_ledger"
  private val td = "ers_td"
  private val st = "ers_stats"
  private val vs = "ers_store"

  private def allTables = Seq(led, td, s"${td}_ledger", s"${td}_staging",
    s"${td}_tombstones", st) ++
    Seq("centroids", "stats", "codes", "raw", "bits", "version", "tombstones")
      .map(s => s"${vs}_$s")

  private def served = IndexMaintenance.withoutDeleted(
    IndexMaintenance.postings(spark, td, st),
    Erasure.postingsTombstones(td))

  test("erase propagates across postings and vector store, idempotently") {
    import spark.implicits._
    TestWarehouse.reset(spark, allTables: _*)

    val docs = tables.load(spark, dir, "documents")
      .select("doc_id", "text").limit(40).cache()
    val ids = docs.select("doc_id").as[Long].collect().sorted.toSeq
    docs.as[(Long, String)].collect().sortBy(_._1).grouped(20).zipWithIndex
      .foreach { case (b, i) =>
        IndexMaintenance.appendBatch(b.toSeq.toDF("doc_id", "text"),
          i.toLong, td, st)
      }
    val emb = tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    VectorStore.build(emb, vs)

    val victims = Seq(ids(3), ids(7))
    Erasure.erase(spark, victims, led,
      Some(td), Some(st), Some(vs))

    // served postings exclude the victims; everyone else still serves
    val servedIds = served.select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(victims.forall(!servedIds.contains(_)),
      s"erased docs still served: ${victims.filter(servedIds)}")
    assert((ids.toSet -- victims).subsetOf(servedIds),
      "erasure dropped innocent docs")

    // vector serving excludes the victims as neighbors
    val probes = emb.filter(col("vec_id") % 25 === 0)
      .limit(8)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val neighbors = VectorStore.serveTopK(probes, vs)
      .select("neighbor_id").as[Long].collect().toSet
    assert(victims.forall(!neighbors.contains(_)),
      "erased vectors still served as neighbors")

    // idempotency: replaying the erase (and a partial overlap) changes
    // nothing — ledger row count and tombstone state are stable
    val ledgerBefore = spark.table(led).count()
    val tombBefore = spark.table(Erasure.postingsTombstones(td))
      .orderBy("doc_id").collect().toSeq
    Erasure.erase(spark, victims :+ ids(3), led, Some(td), Some(st), Some(vs))
    assert(spark.table(led).count() == ledgerBefore)
    assert(spark.table(Erasure.postingsTombstones(td))
      .orderBy("doc_id").collect().toSeq == tombBefore)

    // compaction physically purges: raw postings lose the victims,
    // the tombstone table is cleared, serving is unchanged
    val servedBefore = served.orderBy("doc_id", "token").collect().toSeq
    IndexMaintenance.compact(spark, td, statsTable = Some(st),
      tombstoneTable = Some(Erasure.postingsTombstones(td)))
    val raw = spark.table(td).select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(victims.forall(!raw.contains(_)),
      "compact left erased rows in the physical postings table")
    assert(!spark.catalog.tableExists(Erasure.postingsTombstones(td)),
      "compact should clear the postings tombstone table")
    assert(served.orderBy("doc_id", "token").collect().toSeq == servedBefore,
      "physical purge changed the served surface")

    // post-compact enforce: nothing pending — no tombstone table
    // reappears (the serve-time anti-join stays a pass-through)
    Erasure.enforce(spark, led, Some(td), Some(st), Some(vs))
    assert(!spark.catalog.tableExists(Erasure.postingsTombstones(td)),
      "enforce resurrected an empty tombstone table")

    // ingestion gate: an erased doc in a new batch is dropped before
    // it can re-enter any artifact
    val reingest = Seq((victims.head, "the erased doc returns"),
      (999999L, "a genuinely new doc")).toDF("doc_id", "text")
    val gated = Erasure.filterIngest(reingest, led)
      .select("doc_id").as[Long].collect().toSet
    assert(gated == Set(999999L),
      s"ingestion gate passed an erased id: $gated")

    docs.unpersist()
    TestWarehouse.reset(spark, allTables: _*)
  }

  test("enforce keeps operator tombstones and decrements docCount once") {
    import spark.implicits._
    val (led2, td2, st2) = ("ers2_ledger", "ers2_td", "ers2_stats")
    val t2 = Erasure.postingsTombstones(td2)
    val all2 = Seq(led2, td2, s"${td2}_ledger", s"${td2}_staging", t2, st2)
    TestWarehouse.reset(spark, all2: _*)

    val docs = tables.load(spark, dir, "documents")
      .select("doc_id", "text").limit(40)
    val ids = docs.select("doc_id").as[Long].collect().sorted.toSeq
    docs.as[(Long, String)].collect().sortBy(_._1).grouped(20).zipWithIndex
      .foreach { case (b, i) =>
        IndexMaintenance.appendBatch(b.toSeq.toDF("doc_id", "text"),
          i.toLong, td2, st2)
      }
    val n0 = IndexMaintenance.docCount(spark, st2)
    assert(n0 == 40L)

    // the OPERATOR deletes one doc through its own surface (shared
    // tombstone table, stats decrement)
    IndexMaintenance.deleteDocs(spark, Seq(ids(1)), t2, st2)
    assert(IndexMaintenance.docCount(spark, st2) == n0 - 1)

    // an erasure of two OTHER docs must not discard the operator's
    // tombstone (the overwrite-with-exactly-the-ledger bug: the
    // regularly-deleted doc would resurface in served results)
    Erasure.erase(spark, Seq(ids(5), ids(9)), led2, Some(td2), Some(st2))
    val servedIds = IndexMaintenance.withoutDeleted(
        IndexMaintenance.postings(spark, td2, st2), t2)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(Seq(ids(1), ids(5), ids(9)).forall(!servedIds.contains(_)),
      "a deletion surface lost rows owned by the other one")

    // erased docs leave the corpus stats too — BM25's N tracks the
    // LIVE corpus whichever surface removed the doc
    assert(IndexMaintenance.docCount(spark, st2) == n0 - 3,
      "erasure must decrement the stats ledger like deleteDocs")

    // replay: idempotent, no double decrement, tombstones stable
    Erasure.enforce(spark, led2, Some(td2), Some(st2))
    assert(IndexMaintenance.docCount(spark, st2) == n0 - 3)
    assert(spark.table(t2).count() == 3L)

    // an id deleted by BOTH surfaces decrements exactly once
    Erasure.erase(spark, Seq(ids(1)), led2, Some(td2), Some(st2))
    assert(IndexMaintenance.docCount(spark, st2) == n0 - 3,
      "double-surface deletion must not double-decrement")

    TestWarehouse.reset(spark, all2: _*)
  }
}
