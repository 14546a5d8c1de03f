package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.{OrderStore, ReleaseManifest, TokenizerStore, VectorStore}

/** The multi-artifact version pin: a training read through the
  * manifest must serve exactly the published (order, manifest, vocab,
  * vectors) tuple, and REFUSE — naming the drifted store — once any
  * component rebuilds past the pin, whether the rebuild happened
  * before the read or raced it. Re-publishing heals.
  */
class ReleaseManifestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private val rel = "rm_rel"
  private val tok = "rm_tok"
  private val ord = "rm_ord"
  private val vec = "rm_vec"

  private def allTables: Seq[String] =
    Seq(s"${rel}_release", s"${tok}_merges", s"${tok}_version",
      s"${ord}_order", s"${ord}_manifest", s"${ord}_version",
      s"${ord}_erased") ++
      (2 to 4).flatMap(v => Seq(s"${tok}_v${v}_merges",
        s"${ord}_v${v}_order", s"${ord}_v${v}_manifest")) ++
      Seq("centroids", "stats", "codes", "raw", "bits", "version", "tombstones")
        .map(t => s"${vec}_$t") ++
      (2 to 4).flatMap(v => Seq("centroids", "stats", "codes", "raw", "bits",
        "tombstones").map(t => s"${vec}_v${v}_$t"))

  test("manifest pins the tuple; a rebuild past the pin refuses loudly") {
    TestWarehouse.reset(spark, allTables: _*)
    val docs = tables.load(spark, dir, "documents")
    val wc = graft.queries.Text.wordCounts(spark, dir)
    TokenizerStore.build(wc, tok)
    OrderStore.build(docs, ord)
    VectorStore.build(tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")), vec)

    val pin = ReleaseManifest.publish(spark, rel, "corpus-snap-1",
      tok, ord, vec)
    assert(pin.releaseId == 1L && pin.tokenizerV == 1L &&
      pin.orderV == 1L && pin.vectorV == 1L)

    // reads through the manifest serve the pinned artifacts
    val n = ReleaseManifest.trainingOrder(spark, rel).count()
    assert(n > 0)
    assert(ReleaseManifest.merges(spark, rel).nonEmpty)
    assert(ReleaseManifest.shardManifest(spark, rel).count() > 0)

    // a concurrent rebuild flips ONE store's pointer — every manifest
    // read must now refuse, naming the drifted store, rather than mix
    // a v2 order with v1 vocab/vectors
    OrderStore.rebuild(docs, ord)
    val ex = intercept[IllegalStateException] {
      ReleaseManifest.trainingOrder(spark, rel).count()
    }
    assert(ex.getMessage.contains(ord) && ex.getMessage.contains("v2"),
      s"refusal must name the drifted store: ${ex.getMessage}")
    // the untouched components refuse too — the TUPLE is stale
    assert(intercept[IllegalStateException] {
      ReleaseManifest.merges(spark, rel)
    }.getMessage.contains("STALE"))

    // a rebuild RACING the read (pointer flips inside the bracketed
    // read) refuses after the fact instead of returning mixed data
    val ex2 = intercept[IllegalStateException] {
      ReleaseManifest.readVerified(spark, rel) { p =>
        // re-publish first so the entry check passes at order v2...
        fail("stale pin must refuse before the read runs")
      }
    }
    assert(ex2.getMessage.contains("STALE"))
    val pin2 = ReleaseManifest.publish(spark, rel, "corpus-snap-1",
      tok, ord, vec)
    assert(pin2.releaseId == 2L && pin2.orderV == 2L)
    val ex3 = intercept[IllegalStateException] {
      ReleaseManifest.readVerified(spark, rel) { p =>
        TokenizerStore.rebuild(wc, tok) // the race, mid-read
        OrderStore.order(spark, p.orderStore).count()
      }
    }
    assert(ex3.getMessage.contains(tok),
      s"mid-read flip must refuse naming the store: ${ex3.getMessage}")

    // re-publishing heals: the new pin serves the new tuple
    val pin3 = ReleaseManifest.publish(spark, rel, "corpus-snap-2",
      tok, ord, vec)
    assert(pin3.tokenizerV == 2L && pin3.orderV == 2L)
    assert(ReleaseManifest.trainingOrder(spark, rel).count() == n)
    assert(ReleaseManifest.trainingShard(spark, rel, 0L).count() > 0)

    TestWarehouse.reset(spark, allTables: _*)
  }
}
