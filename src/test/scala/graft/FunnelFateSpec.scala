package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** pl47 is pl16's changelog: every corpus doc gets exactly one fate,
  * and the fate-class counts must reconcile with the funnel's stage
  * deltas — url_dup IS stage0−stage1, the two decontamination-rung
  * classes shared with pl16 partition stage1−stage2, and the rungs
  * pl47 adds beyond pl16 (semantic + sampling) partition pl16's s2.
  * Lineage: a twin always points at a doc the funnel treated better
  * (the kept copy for url dups; an eval doc for decontamination). */
class FunnelFateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("pl47 fates partition the corpus and reconcile with pl16") {
    spark.catalog.clearCache()
    val fateRows = SparkEntry.queries("pl47_funnel_fate")(spark, dir)
      .collect()
    val fate = fateRows.groupBy(_.getString(1))
      .map { case (f, rs) => f -> rs.length.toLong }
    spark.catalog.clearCache()
    val stages = SparkEntry.queries("pl16_curation_funnel")(spark, dir)
      .select("stage", "n_docs").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val corpus = tables.load(spark, dir, "documents").count()

    // totality: one fate per doc, nothing double-attributed
    assert(fateRows.length.toLong == corpus,
      s"fate rows ${fateRows.length} != corpus $corpus")
    assert(fateRows.map(_.getLong(0)).distinct.length == fateRows.length,
      "a doc carries more than one fate")
    assert(fate.values.sum == corpus)

    // stage deltas (the verdict's reconciliation contract)
    assert(fate.getOrElse("url_dup", 0L) == stages(0) - stages(1),
      s"url_dup ${fate.get("url_dup")} != stage0-stage1 delta")
    assert(fate.getOrElse("eval_slice", 0L) +
        fate.getOrElse("fuzzy_eval_neardup", 0L) == stages(1) - stages(2),
      "eval_slice + fuzzy must equal pl16's decontamination delta")
    assert(fate.getOrElse("semantic_eval_neardup", 0L) +
        fate.getOrElse("rebalanced_out", 0L) +
        fate.getOrElse("kept", 0L) == stages(2),
      "semantic + sampling classes must partition pl16's s2")

    // lineage sanity
    val byId = fateRows.map(r => r.getLong(0) -> r).toMap
    fateRows.foreach { r =>
      val (id, f) = (r.getLong(0), r.getString(1))
      val twin = if (r.isNullAt(2)) None else Some(r.getLong(2))
      f match {
        case "url_dup" =>
          assert(twin.exists(_ < id), s"url_dup $id twin $twin not smaller")
          assert(twin.forall(t => byId(t).getString(1) != "url_dup"),
            s"url_dup $id points at another url_dup")
        case "fuzzy_eval_neardup" | "semantic_eval_neardup" =>
          assert(twin.exists(_ % 5 == 0),
            s"$f $id twin $twin is not an eval doc")
        case _ =>
          assert(twin.isEmpty, s"$f $id carries a twin: $twin")
      }
    }
  }
}
