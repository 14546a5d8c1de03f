package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The fuzzy-decontamination rung served from a stored eval band
  * artifact (round-17 verdict #3): pl14/pl16/pl47 share ONE
  * construction (`Pipeline.fuzzyEvalPairsOf`) that serves the eval
  * side from a `DedupStore` — a session-named release store when the
  * conf points at one, else a per-(application, dir) auto-built one.
  * The load-bearing equality — store-served == the fresh
  * `Dedup.bipartitePairs` derivation — is pinned here directly on the
  * pair frames (and continuously by the DuckDB oracle, whose SQL IS
  * the fresh semantics); the served plan must read the band artifact
  * with zero eval-side corpus filters, or the artifact's point is
  * defeated.
  */
class FuzzyServeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private val store = "graft_evalbands_spec"

  private def collectQ(name: String): Seq[org.apache.spark.sql.Row] = {
    spark.catalog.clearCache()
    SparkEntry.queries(name)(spark, dir).collect().toSeq
  }

  test("store-served pairs == fresh bipartitePairs; conf-served pl14/pl47 " +
      "== default; plan reads the artifact") {
    TestWarehouse.reset(spark, s"${store}_shingles", s"${store}_sigs",
      s"${store}_bands")
    val d = tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val corpus = d.filter(col("doc_id") % 5 =!= 0)
    graft.index.DedupStore.build(d.filter(col("doc_id") % 5 === 0), store)
    // the core equality, directly on the UNROUNDED pair frames: the
    // artifact serve must reproduce the fresh derivation bit for bit
    spark.catalog.clearCache()
    val fresh = graft.queries.Dedup
      .bipartitePairs(corpus, d.filter(col("doc_id") % 5 === 0), 0.4)
      .orderBy("doc_id", "probe_doc_id").collect().toSeq
    spark.catalog.clearCache()
    val servedPairs = graft.index.DedupStore
      .bipartitePairsFromStore(corpus, store, 0.4)
      .orderBy("doc_id", "probe_doc_id").collect().toSeq
    assert(servedPairs == fresh,
      "store-served pairs diverged from the fresh bipartite derivation")
    // conf-served == default (auto-built store) for the registered
    // queries — the release-pinned path cannot drift from the default
    val defaultPl14 = collectQ("pl14_fuzzy_decontaminate")
    val defaultPl47 = collectQ("pl47_funnel_fate")
    spark.conf.set(graft.queries.Pipeline.EvalBandStoreConf, store)
    try {
      assert(collectQ("pl14_fuzzy_decontaminate") == defaultPl14,
        "conf-served pl14 diverged from the default serve")
      assert(collectQ("pl47_funnel_fate") == defaultPl47,
        "conf-served pl47 diverged from the default serve")
      // plan pin: the eval side must come from the artifact — the
      // stored band table is in the plan, and the eval slice's
      // defining corpus filter `(doc_id % 5) = 0` is nowhere in it
      // (the corpus side filters NOT(... = 0), which must survive)
      spark.catalog.clearCache()
      val p = SparkEntry.queries("pl14_fuzzy_decontaminate")(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val scanLocs = "Location:[^\\n]*".r.findAllIn(p).toSeq
      assert(scanLocs.exists(_.contains(store + "_bands")),
        s"served pl14 does not scan the stored band table:\n$p")
      val evalFilters = p.linesIterator
        .filter(l => l.contains("% 5) = 0") && !l.contains("NOT"))
        .toSeq
      assert(evalFilters.isEmpty,
        s"served pl14 still derives the eval side from the corpus: " +
          evalFilters.mkString("; "))
    } finally {
      spark.conf.unset(graft.queries.Pipeline.EvalBandStoreConf)
      spark.catalog.clearCache()
    }
  }

  test("an unbuilt conf store name falls back to the auto-built store") {
    spark.conf.set(graft.queries.Pipeline.EvalBandStoreConf,
      "graft_evalbands_never_built")
    try {
      // must not throw table-not-found — the conf names an artifact
      // that doesn't exist, so the rung serves from the auto-built one
      assert(collectQ("pl14_fuzzy_decontaminate").nonEmpty)
    } finally {
      spark.conf.unset(graft.queries.Pipeline.EvalBandStoreConf)
      spark.catalog.clearCache()
    }
  }
}
