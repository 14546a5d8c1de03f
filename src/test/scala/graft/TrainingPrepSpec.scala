package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-13 training-prep operators: pl28 (deterministic training
  * order) and pl29 (first-seen n-gram novelty). Both are oracle-checked
  * by the driver; these specs pin the SEMANTIC invariants a hash can't
  * name — the order is a dense, total, reproducible assignment, and
  * novelty attribution partitions the corpus shingle set exactly once.
  */
class TrainingPrepSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, dir)

  test("pl28 assigns every doc exactly once") {
    val out = run("pl28_training_order").cache()
    try {
      val nDocs = tables.load(spark, dir, "documents").count()
      assert(out.count() == nDocs)
      assert(out.select("doc_id").distinct().count() == nDocs)
    } finally out.unpersist()
  }

  test("pl28 positions are dense 1..n within every shard") {
    val bad = run("pl28_training_order")
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"),
        countDistinct("pos").as("nd"))
      .filter(col("mx") =!= col("n") || col("nd") =!= col("n"))
      .count()
    assert(bad == 0L, "a shard with a gap or duplicate position")
  }

  test("pl28 is reproducible run-to-run (a resumed trainer re-derives it)") {
    val a = run("pl28_training_order").collect().map(_.toSeq)
    val b = run("pl28_training_order").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("pl29 attributes every distinct corpus 5-gram to exactly one doc") {
    val out = run("pl29_ngram_novelty").cache()
    try {
      val totalNovel = out.agg(sum("n_novel")).head.getLong(0)
      val distinctNg = tables.load(spark, dir, "documents")
        .select(explode(graft.functions.TextFunctions.wordNgrams(
          col("text"), 5)).as("ng"))
        .select(md5(col("ng").cast("binary")))
        .distinct().count()
      assert(totalNovel == distinctNg,
        s"first-seen attribution must partition the shingle set " +
          s"($totalNovel attributed vs $distinctNg distinct)")
    } finally out.unpersist()
  }

  test("pl29 novelty is a valid fraction and n_novel never exceeds n_ng") {
    val bad = run("pl29_ngram_novelty")
      .filter(col("novelty") < 0.0 || col("novelty") > 1.0 ||
        col("n_novel") > col("n_ng") || col("n_ng") <= 0L)
      .count()
    assert(bad == 0L)
  }

  test("pl29 scores the lowest doc_id as fully novel") {
    // the min doc_id owns every one of its shingles by definition
    val first = run("pl29_ngram_novelty").orderBy("doc_id").limit(1).head
    assert(first.getAs[Long]("n_novel") == first.getAs[Long]("n_ng"))
    assert(first.getAs[Double]("novelty") == 1.0)
  }

  test("pl31 manifest covers every shard with pl28's exact doc counts") {
    val byShard = run("pl28_training_order")
      .groupBy("shard_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val manifest = run("pl31_order_manifest").collect()
      .map(r => r.getAs[Long]("shard_id") -> r.getAs[Long]("n_docs")).toMap
    assert(manifest == byShard)
  }

  test("pl31 checksum is ORDER-sensitive: swapping two positions changes it") {
    val P = 1000000007L
    val rows = run("pl31_order_manifest").collect()
    // re-derive one shard's checksum from the order frame, then with
    // the first two positions swapped — same membership, different sum
    val ord = run("pl28_training_order")
      .join(tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          conv(substring(md5(col("text")), 1, 15), 16, 10)
            .cast("long").as("h")), Seq("doc_id"))
      .filter(col("shard_id") === rows.head.getAs[Long]("shard_id"))
      .select("pos", "h").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    def sum(terms: Seq[(Long, Long)]): Long =
      terms.map { case (pos, h) => (h % P) * (pos % P) % P }
        .foldLeft(0L)((a, t) => (a + t) % P)
    assert(sum(ord.toSeq) == rows.head.getAs[Long]("checksum"))
    assert(ord.length >= 2)
    val swapped = (ord(0)._1 -> ord(1)._2) +: (ord(1)._1 -> ord(0)._2) +:
      ord.toSeq.drop(2)
    assert(sum(swapped) != rows.head.getAs[Long]("checksum"),
      "a reordered shard must fail the manifest check")
  }

  test("pl33 packs each shard's token stream into exact 2048-token windows") {
    val L = 2048L
    val packed = run("pl33_sequence_pack").collect()
      .groupBy(_.getAs[Long]("shard_id"))
    assert(packed.nonEmpty)
    packed.foreach { case (shard, rows) =>
      val ordered = rows.sortBy(_.getAs[Long]("pos"))
      var cum = 0L
      ordered.foreach { r =>
        assert(r.getAs[Long]("seq_id") == cum / L,
          s"shard $shard pos ${r.getAs[Long]("pos")}: seq_id vs scala prefix sum")
        assert(r.getAs[Long]("seq_offset") == cum % L,
          s"shard $shard pos ${r.getAs[Long]("pos")}: seq_offset vs scala prefix sum")
        cum += r.getAs[Long]("n_tok")
      }
    }
    // every shard starts a fresh window
    packed.values.foreach { rows =>
      val first = rows.minBy(_.getAs[Long]("pos"))
      assert(first.getAs[Long]("seq_id") == 0 && first.getAs[Long]("seq_offset") == 0)
    }
  }

  test("pl39 ramps difficulty without collapsing into a pure sort") {
    // the curriculum contract: the blended key preserves the easy→hard
    // TREND (front half of each big-enough shard is easier on average
    // than the back half) while the noise half keeps the order from
    // degenerating into sort-by-difficulty (which would start every
    // epoch on the same degenerate slice)
    val rows = run("pl39_curriculum_order")
      .select("shard_id", "pos", "difficulty").collect()
      .groupBy(_.getLong(0))
    var ramped = 0
    var strict = 0
    rows.values.filter(_.length >= 8).foreach { rs =>
      val ordered = rs.sortBy(_.getLong(1)).map(_.getDouble(2))
      val (front, back) = ordered.splitAt(ordered.length / 2)
      if (front.sum / front.length < back.sum / back.length) ramped += 1
      if (ordered.sameElements(ordered.sorted)) strict += 1
    }
    assert(ramped * 2 > rows.size,
      s"easy-to-hard trend lost: only $ramped of ${rows.size} shards ramp")
    assert(strict == 0,
      s"$strict shards degenerated into a pure difficulty sort")
    // dense total assignment, the pl28 contract
    val out = run("pl39_curriculum_order")
    assert(out.count() ==
      tables.load(spark, dir, "documents").count())
    spark.catalog.clearCache()
  }
}
