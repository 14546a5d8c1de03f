package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** pl23 linear quality classifier: the oracle proves value-exactness;
  * this spec pins the SCALE contracts the oracle can't see —
  * (1) the hashed model is bounded by the 4096-bucket space no matter
  *     the corpus (the fastText hashing-trick guarantee),
  * (2) scoring reaches the corpus through a BROADCAST join of that
  *     bounded model (never a shuffle of the corpus against weights),
  * (3) every per-bucket weight is finite (Laplace smoothing means no
  *     ±Inf even for single-class buckets), and empty-token docs
  *     score 0 with keep=0 instead of vanishing from the report.
  */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run() = {
    val q = SparkEntry.queries("pl23_quality_classifier")
    q(spark, dir)
  }

  test("report covers every doc; scores finite; empty docs keep=0") {
    val docs = graft.tables.load(spark, dir, "documents")
    val out = run().collect()
    assert(out.length == docs.count())
    out.foreach { r =>
      val score = r.getDouble(r.fieldIndex("score"))
      assert(!score.isNaN && !score.isInfinite)
      val nFeats = r.getInt(r.fieldIndex("n_feats"))
      val keep = r.getInt(r.fieldIndex("keep"))
      if (nFeats == 0) assert(score == 0.0 && keep == 0)
      assert(keep == (if (score > 0) 1 else 0))
    }
    spark.catalog.clearCache()
  }

  test("model stays within the bucket hash space") {
    // build the feature frame through the SAME shared primitive the
    // query uses (one source of truth — an edit to the hash moves
    // this bound check too) and count distinct buckets: the model row
    // bound that makes the broadcast safe at any corpus size
    import graft.queries.Pipeline
    val docs = graft.tables.load(spark, dir, "documents")
    val buckets = docs
      .select(explode(Pipeline.classifierFeatures(col("text"))).as("b"))
      .agg(countDistinct(col("b")), min(col("b")), max(col("b")))
      .head()
    assert(buckets.getLong(0) <= Pipeline.ClassifierBuckets.toLong)
    assert(buckets.getInt(1) >= 0 &&
      buckets.getInt(2) < Pipeline.ClassifierBuckets)
  }

  test("scoring join is broadcast; no corpus-vs-weights shuffle join") {
    val p = run().queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "weights must broadcast into the scoring join:\n" + p)
    // the only SMJ tolerated is the final doc_id re-join of two
    // doc-keyed frames; the weight join itself must not sort-merge
    // on the bucket key
    assert(!p.contains("SortMergeJoin [b"),
      "bucket-key join fell back to SMJ:\n" + p)
    spark.catalog.clearCache()
  }
}
