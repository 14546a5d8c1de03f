package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.InvertedIndex

/** Operator-level tests for the index pipeline on tiny in-memory corpora:
  * posting ordering (numeric vs legacy string sort), topK bounding, and
  * the posting-count invariant (sum of posting counts == surviving
  * token occurrences).
  */
class InvertedIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** (term, doc, cnt) fixture with a count-10-vs-2 case: numeric order
    * puts d10 (cnt=10) first; the legacy STRING sort ranks "10#..."
    * below "2#..." (descending lexicographic). */
  private lazy val tdc = Seq(
    ("alpha", "d10", 10L), ("alpha", "d2", 2L), ("alpha", "d7", 7L),
    ("beta", "a", 1L), ("beta", "b", 1L), ("beta", "c", 1L))
    .toDF("term", "doc", "cnt")

  test("postingLists ranks numerically: count desc, doc asc") {
    val rows = InvertedIndex.postingLists(tdc).orderBy("term")
      .select(col("term"),
        transform(col("postings"),
          p => concat(p.getField("doc"), lit("#"), p.getField("cnt"))).as("p"))
      .as[(String, Seq[String])].collect().toMap
    assert(rows("alpha") == Seq("d10#10", "d7#7", "d2#2"))
    assert(rows("beta") == Seq("a#1", "b#1", "c#1")) // ties: doc asc
  }

  test("postingLists topK bounds each list via pre-agg window") {
    val rows = InvertedIndex.postingLists(tdc, topK = 2).orderBy("term")
      .select(col("term"), size(col("postings")).as("n"))
      .as[(String, Int)].collect().toMap
    assert(rows("alpha") == 2)
    assert(rows("beta") == 2)
    // and the kept entries are the TOP 2, not arbitrary
    val kept = InvertedIndex.postingLists(tdc, topK = 2)
      .filter(col("term") === "alpha")
      .select(transform(col("postings"), p => p.getField("doc")))
      .as[Seq[String]].head()
    assert(kept == Seq("d10", "d7"))
  }

  test("legacy string sort reproduces the count-10-below-count-2 quirk") {
    val packed = InvertedIndex.postingListsLegacy(tdc)
      .filter(col("term") === "alpha").select(col("packed"))
      .as[Seq[String]].head()
    // descending lexicographic: "7#d7" > "2#d2" > "10#d10"
    assert(packed == Seq("7#d7", "2#d2", "10#d10"))
  }

  test("legacy ties break by doc string DESCENDING") {
    val packed = InvertedIndex.postingListsLegacy(tdc)
      .filter(col("term") === "beta").select(col("packed"))
      .as[Seq[String]].head()
    assert(packed == Seq("1#c", "1#b", "1#a"))
  }

  test("tokenize + filters: empty, short, numeric tokens dropped") {
    val lines = Seq(("d1", "The cat-cat sat!! 42 on 7 a mat"))
      .toDF("doc", "line")
    val toks = InvertedIndex.tokenize(lines, "!-".toSeq, minLength = 3)
      .select("term").as[String].collect().sorted.toSeq
    // "the" survives tokenize (stop-words are a separate stage);
    // cat appears twice (scrub splits cat-cat); 42/7/a/on dropped
    assert(toks == Seq("cat", "cat", "mat", "sat", "the"))
  }

  test("invariant: sum of posting counts == surviving token occurrences") {
    val lines = Seq(
      ("d1", "apple banana apple cherry"),
      ("d2", "banana banana date")).toDF("doc", "line")
    val toks = InvertedIndex.tokenize(lines, Seq(), minLength = 3)
    val nToks = toks.count()
    val total = InvertedIndex.postingLists(
      InvertedIndex.termDocCounts(toks))
      .select(explode(col("postings")).as("p"))
      .agg(sum(col("p.cnt"))).as[Long].head()
    assert(total == nToks)
  }

  test("property: index of disjoint corpora == merged per-term postings") {
    // SURVEY §5.3: index(A ∪ B) for disjoint doc sets must equal the
    // per-term merge of index(A) and index(B) under the same ranking —
    // the invariant that makes incremental/partitioned indexing sound
    val corpusA = Seq(("a1", "apple banana apple"), ("a2", "banana cherry"))
    val corpusB = Seq(("b1", "apple date date"), ("b2", "cherry cherry"))
    def index(rows: Seq[(String, String)]) =
      InvertedIndex.postingLists(InvertedIndex.termDocCounts(
        InvertedIndex.tokenize(rows.toDF("doc", "line"), Seq(), minLength = 3)))
        .select(col("term"),
          transform(col("postings"),
            p => concat(p.getField("doc"), lit("#"), p.getField("cnt"))).as("p"))
        .as[(String, Seq[String])].collect().toMap
    val union = index(corpusA ++ corpusB)
    val merged = (index(corpusA).toSeq ++ index(corpusB).toSeq)
      .groupBy(_._1)
      .map { case (term, lists) =>
        // re-rank the concatenated postings: cnt desc, doc asc
        term -> lists.flatMap(_._2).sortBy { s =>
          val Array(doc, cnt) = s.split("#"); (-cnt.toLong, doc)
        }
      }
    assert(union == merged)
  }

  test("stop-word anti-join removes exactly the stop terms") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val toks = Seq(("the", "d1"), ("cat", "d1"), ("the", "d2"), ("dog", "d2"))
      .toDF("term", "doc")
    val kept = InvertedIndex.removeStopWords(toks, Seq("the"))
      .select("term").as[String].collect().sorted.toSeq
    assert(kept == Seq("cat", "dog"))
  }

  test("observe surfaces the INPUT_WORDS metric") {
    import org.apache.spark.sql.Observation
    val obs = Observation("metrics-test")
    val toks = Seq(("a", "d1"), ("b", "d1"), ("c", "d2"))
      .toDF("term", "doc").observe(obs, count(lit(1)).as("input_words"))
    toks.count() // materialize
    assert(obs.get("input_words") == 3L)
  }
}
