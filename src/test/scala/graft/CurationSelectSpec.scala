package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-13 curation-selection operators: dd17 (quality-aware canonical
  * choice per near-dup cluster) and pl27 (DSIR-style importance
  * resampling). Both are also oracle-checked end to end by the driver;
  * these specs pin the SEMANTIC invariants an oracle hash can't name —
  * cluster-cardinality preservation, keep-best dominance over
  * keep-first, and a from-first-principles Scala recomputation of the
  * DSIR log-ratio for sample docs.
  */
class CurationSelectSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, dir)

  test("dd17 keeps exactly one survivor per component (same count as dd06)") {
    val dd06 = run("dd06_near_dup_components").count()
    val dd17 = run("dd17_cluster_keep_best").count()
    assert(dd17 == dd06,
      s"keep-best must keep one doc per component like keep-min ($dd17 vs $dd06)")
  }

  test("dd17 survivors dominate dd06's on the quality axis (total n_chars)") {
    val byMin = run("dd06_near_dup_components")
      .agg(sum("n_chars")).head.getLong(0)
    val byBest = run("dd17_cluster_keep_best")
      .agg(sum("n_chars")).head.getLong(0)
    assert(byBest >= byMin,
      s"argmax-n_chars selection can never keep shorter docs than keep-min " +
        s"($byBest vs $byMin)")
  }

  test("dd17 survivors are a subset of the corpus with corpus-true n_chars") {
    val docs = tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars").as("true_n"))
    val bad = run("dd17_cluster_keep_best")
      .join(docs, Seq("doc_id"), "left")
      .filter(col("true_n").isNull || col("true_n") =!= col("n_chars"))
      .count()
    assert(bad == 0L)
  }

  test("pl27 reports every doc exactly once with its true token count") {
    val out = run("pl27_importance_resample").cache()
    try {
      val nDocs = tables.load(spark, dir, "documents").count()
      assert(out.count() == nDocs)
      assert(out.select("doc_id").distinct().count() == nDocs)
      val toks = tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long").as("expect_n"))
      val bad = out.join(toks, "doc_id")
        .filter(col("n_toks") =!= col("expect_n")).count()
      assert(bad == 0L)
    } finally out.unpersist()
  }

  test("pl27 logw matches a from-first-principles Scala recomputation") {
    // independent implementation: plain Scala maps over the same
    // whitespace tokenization, add-1 smoothed unigram LMs, mean log2
    // ratio — must agree with the engine at the reported 6-decimal
    // rounding for every doc
    val docs = tables.load(spark, dir, "documents")
      .select("doc_id", "source", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    val target = Set("src0", "src1")
    val corpusCounts = scala.collection.mutable.Map.empty[String, Long]
    val targetCounts = scala.collection.mutable.Map.empty[String, Long]
    var nc = 0L
    var nt = 0L
    docs.foreach { case (_, src, text) =>
      toks(text).foreach { w =>
        corpusCounts(w) = corpusCounts.getOrElse(w, 0L) + 1
        nc += 1
        if (target(src)) {
          targetCounts(w) = targetCounts.getOrElse(w, 0L) + 1
          nt += 1
        }
      }
    }
    val v = corpusCounts.size.toLong
    def log2(x: Double): Double = math.log(x) / math.log(2.0)
    def lr(w: String): Double =
      log2((targetCounts.getOrElse(w, 0L) + 1).toDouble / (nt + v)) -
        log2((corpusCounts(w) + 1).toDouble / (nc + v))
    val expected = docs.map { case (id, _, text) =>
      val ws = toks(text)
      val s = if (ws.isEmpty) 0.0 else ws.map(lr).sum / ws.size
      id -> BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = run("pl27_importance_resample")
      .select("doc_id", "logw").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet)
    val off = got.filter { case (id, w) =>
      math.abs(w - expected(id)) > 1e-6
    }
    assert(off.isEmpty, s"diverging docs: ${off.take(5)}")
  }

  test("dd19 split covers the corpus exactly once, train the majority side") {
    val split = run("dd19_leakage_free_split")
    val n = tables.load(spark, dir, "documents").count()
    assert(split.count() == n)
    assert(split.select("doc_id").distinct().count() == n)
    val bySide = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySide.keySet.subsetOf(Set("train", "eval")))
    assert(bySide.getOrElse("train", 0L) > bySide.getOrElse("eval", 0L),
      s"~10% eval draw must leave train the majority: $bySide")
  }

  test("dd19 never lets a near-dup pair straddle the split (no leakage)") {
    val side = run("dd19_leakage_free_split").select("doc_id", "split")
    val pairs = run("dd03_minhash_lsh").select("doc_a", "doc_b")
    assert(pairs.count() > 0, "fixture must exercise the near-dup graph")
    val straddling = pairs
      .join(side.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "sa"), Seq("doc_a"))
      .join(side.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "sb"), Seq("doc_b"))
      .filter(col("sa") =!= col("sb"))
    assert(straddling.count() == 0,
      "a near-dup pair split across train/eval is eval contamination")
  }

  test("pl32 caps over-represented domains and passes small ones whole") {
    val corpus = tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        concat(col("source"), lit(".example-"), col("lang"), lit(".com"))
          .as("domain"))
    val before = corpus.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = run("pl32_domain_downsample")
    // kept docs carry their corpus-true domain, each at most once
    assert(kept.join(corpus, Seq("doc_id", "domain")).count() == kept.count())
    assert(kept.select("doc_id").distinct().count() == kept.count())
    val after = kept.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cap = 5L
    assert(before.exists(_._2 >= 2 * cap), "fixture must have a 2x-cap domain")
    before.foreach { case (d, n) =>
      if (n <= cap)
        assert(after.getOrElse(d, 0L) == n, s"under-cap domain $d must pass whole")
      else {
        val k = after.getOrElse(d, 0L)
        assert(k <= n, s"downsampling can never add docs to $d")
        // the keep rate is cap/n EXPECTED, so a barely-over-cap domain
        // may legitimately survive whole; demand reduction only where
        // chance survival is negligible, and bound the kept count
        if (n >= 2 * cap)
          assert(k < n, s"2x-over-cap domain $d ($n docs) must be downsampled")
        assert(k <= 5 * cap, s"domain $d kept $k docs against expected ~$cap")
      }
    }
    // and the corpus as a whole must have shrunk
    assert(after.values.sum < before.values.sum)
  }

  test("pl34 datasheet reconciles with the corpus and its exact-dup structure") {
    val ds = run("pl34_corpus_datasheet").collect()
    val corpus = tables.load(spark, dir, "documents")
    assert(ds.map(_.getAs[Long]("n_docs")).sum == corpus.count())
    val tokSum = corpus
      .agg(sum(graft.functions.TextFunctions.tokenCount(col("text"))
        .cast("long"))).head.getLong(0)
    assert(ds.map(_.getAs[Long]("total_tokens")).sum == tokSum)
    // exact-dup incidence: docs whose full-text digest appears >1 time
    // (sf0.001 holds no exact copies — the agg is NULL-safe so the
    // reconciliation still pins n_exact_dup == 0 there; sf0.01/0.1
    // exercise the dup-rich side through the driver's oracle compare)
    val dupDocs = corpus.select(md5(col("text")).as("dig"))
      .groupBy("dig").count().filter(col("count") > 1)
      .agg(coalesce(sum("count"), lit(0L))).head.getLong(0)
    assert(ds.map(_.getAs[Long]("n_exact_dup")).sum == dupDocs)
  }
}
