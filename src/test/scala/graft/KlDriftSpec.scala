package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** tx36 per-source KL drift: the oracle proves value-exactness; this
  * spec pins the mathematical invariant a formula flip would break —
  * KL(P_source ∥ P_corpus) ≥ 0 for every source (Gibbs' inequality;
  * a sign error, an inverted ratio, or swapped marginals all go
  * negative on real data) — plus a synthetic zero-drift check: a
  * single-source corpus has P_source = P_corpus, so KL must be
  * exactly 0 after rounding.
  */
class KlDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("KL is nonnegative and finite for every source") {
    val rows = SparkEntry.queries("tx36_kl_drift")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val kl = r.getDouble(r.fieldIndex("kl"))
      assert(!kl.isNaN && !kl.isInfinite)
      assert(kl >= 0.0, s"Gibbs violated for ${r.getString(0)}: $kl")
      assert(r.getLong(r.fieldIndex("n_tokens")) > 0L)
    }
    spark.catalog.clearCache()
  }

  test("single-source corpus drifts zero") {
    // restrict the corpus to one source: P_source == P_corpus, so the
    // KL sum telescopes to exactly ln(1)=0 term by term
    val docs = graft.tables.load(spark, dir, "documents")
    val one = docs.select(min(col("source"))).head().getString(0)
    val tmp = java.nio.file.Files.createTempDirectory("klzero").toString
    docs.filter(col("source") === one).write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    try {
      val rows = SparkEntry.queries("tx36_kl_drift")(spark, tmp).collect()
      assert(rows.length == 1)
      assert(rows.head.getDouble(rows.head.fieldIndex("kl")) == 0.0)
    } finally spark.catalog.clearCache()
  }
}
