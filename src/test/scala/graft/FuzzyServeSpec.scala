package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The fuzzy-decontamination rung served from a stored eval band
  * artifact (round-17 verdict #3): pl14/pl16/pl47 share ONE
  * construction (`Pipeline.fuzzyEvalPairsOf`), and when the session
  * names a `DedupStore` built over the eval slice, the rung's eval
  * side must come from the stored band/shingle/sig tables — same
  * result as the fresh derivation (equality by construction: the
  * store persists the same shingle/sig/band frames), and a served
  * plan that re-reads the eval slice from the corpus would defeat the
  * artifact's point, so the plan is pinned to zero eval-side
  * documents filters.
  */
class FuzzyServeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private val store = "graft_evalbands_spec"

  private def collectQ(name: String): Seq[org.apache.spark.sql.Row] = {
    spark.catalog.clearCache()
    SparkEntry.queries(name)(spark, dir).collect().toSeq
  }

  test("store-served pl14/pl47 == fresh derivation; plan reads the artifact") {
    TestWarehouse.reset(spark, s"${store}_shingles", s"${store}_sigs",
      s"${store}_bands")
    val d = tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    graft.index.DedupStore.build(d.filter(col("doc_id") % 5 === 0), store)
    val freshPl14 = collectQ("pl14_fuzzy_decontaminate")
    val freshPl47 = collectQ("pl47_funnel_fate")
    spark.conf.set(graft.queries.Pipeline.EvalBandStoreConf, store)
    try {
      val servedPl14 = collectQ("pl14_fuzzy_decontaminate")
      assert(servedPl14 == freshPl14,
        "store-served pl14 diverged from the fresh rung")
      val servedPl47 = collectQ("pl47_funnel_fate")
      assert(servedPl47 == freshPl47,
        "store-served pl47 diverged from the fresh funnel fate")
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

  test("an unbuilt store name falls back to the fresh rung") {
    spark.conf.set(graft.queries.Pipeline.EvalBandStoreConf,
      "graft_evalbands_never_built")
    try {
      // must not throw table-not-found — the conf names an artifact
      // that doesn't exist, so the rung derives both sides fresh
      assert(collectQ("pl14_fuzzy_decontaminate").nonEmpty)
    } finally {
      spark.conf.unset(graft.queries.Pipeline.EvalBandStoreConf)
      spark.catalog.clearCache()
    }
  }
}
