package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** serveTopKFiltered's auto-widening (round-17 verdict #2): at extreme
  * selectivity the base nprobe cells can hold fewer than k eligible
  * vectors — `widenTo` must fill every probe to a full k whenever ≥ k
  * eligible vectors exist store-wide, by re-probing ONLY the short
  * probes with doubled nprobe; probes already full must keep their
  * base results bit for bit (their cells are never re-scanned).
  */
class AutoWidenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private val K = graft.index.VectorStore.TopK

  private def probes = tables.load(spark, dir, "embeddings")
    .filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
    .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))

  private lazy val store = graft.index.VectorStore.storeFor(spark, dir)

  test("widening fills every probe to k when ≥ k eligible exist store-wide") {
    val eligIds = tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") % 37 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(eligIds.size > K,
      s"test regime broken: only ${eligIds.size} eligible store-wide")
    // the regime check: WITHOUT widening, at least one probe is short
    // (otherwise this spec exercises nothing)
    val base = graft.index.VectorStore
      .serveTopKFiltered(probes, store, col("vec_id") % 37 === 0)
      .collect()
    val baseCounts = base.groupBy(_.getLong(0)).view.mapValues(_.size).toMap
    val probeIds = probes.select("probe_id").collect().map(_.getLong(0)).toSeq
    assert(probeIds.exists(p => baseCounts.getOrElse(p, 0) < K),
      "no probe is short at base nprobe — the predicate no longer " +
        "exercises the widening path on this corpus")
    val wide = graft.index.VectorStore
      .serveTopKFiltered(probes, store, col("vec_id") % 37 === 0,
        widenTo = 64)
      .collect()
    val wideCounts = wide.groupBy(_.getLong(0)).view.mapValues(_.size).toMap
    for (p <- probeIds) {
      val expected = math.min(K, eligIds.size - (if (eligIds(p)) 1 else 0))
      assert(wideCounts.getOrElse(p, 0) == expected,
        s"probe $p served ${wideCounts.getOrElse(p, 0)} of $expected " +
          "eligible neighbors after widening")
    }
  }

  test("probes already full keep their base results bit for bit") {
    // mid-selectivity predicate (~9% eligible): some probes fill at
    // base, some come up short — the full ones' rows must be
    // IDENTICAL under widening (their cells are never re-scanned)
    val base = graft.index.VectorStore
      .serveTopKFiltered(probes, store, col("vec_id") % 11 === 0)
      .collect().groupBy(_.getLong(0))
    val wide = graft.index.VectorStore
      .serveTopKFiltered(probes, store, col("vec_id") % 11 === 0,
        widenTo = 64)
      .collect().groupBy(_.getLong(0))
    val fullAtBase = base.collect { case (p, rows) if rows.size >= K => p }
    assert(fullAtBase.nonEmpty, "regime check: some probe full at base")
    assert(base.exists(_._2.size < K),
      "regime check: some probe short at base (else the mixed case " +
        "exercises nothing — pick a different predicate)")
    for (p <- fullAtBase)
      assert(wide(p).toSeq == base(p).toSeq,
        s"widening changed full probe $p's results")
    // a predicate where EVERY probe fills at base: widened serve equals
    // the base serve wholesale (the loop must exit on its first check)
    val b3 = graft.index.VectorStore
      .serveTopKFiltered(probes, store, col("vec_id") % 3 === 0)
      .collect().toSeq
    val w3 = graft.index.VectorStore
      .serveTopKFiltered(probes, store, col("vec_id") % 3 === 0,
        widenTo = 64)
      .collect().toSeq
    assert(w3 == b3, "widening perturbed an all-full serve")
  }
}
