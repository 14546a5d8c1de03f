package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** tx37 greedy subword segmentation: the oracle proves the two
  * state-machine encodings (Spark aggregate-HOF fold vs DuckDB
  * recursive CTE) agree on unit counts; this spec pins the invariants
  * count equality can't see —
  * (1) LOSSLESSNESS: concat(units) == word for every distinct corpus
  *     word (a stride bug or off-by-one drops/duplicates characters),
  * (2) GREEDINESS: wherever a 3-char vocab unit starts, the walk
  *     takes it over the 2-char unit ("joining" must open with "jo"
  *     then "in"+... no — must segment "ing" as one unit, never
  *     "in"+"g"), checked on crafted words covering every priority
  *     collision in the vocab,
  * (3) every emitted unit is a vocab unit or a single char.
  */
class SubwordSegmentSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  // vocab comes from the ONE shared source (graft.queries.Text); the
  // WALK below stays an independent implementation — the vocab is the
  // contract, the traversal is what this spec double-checks
  private val V3 = graft.queries.Text.SubwordV3.toSet
  private val V2 = graft.queries.Text.SubwordV2.toSet

  /** Independent reference implementation: plain Scala greedy walk. */
  private def segment(w: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < w.length) {
      if (pos + 3 <= w.length && V3(w.substring(pos, pos + 3))) {
        out += w.substring(pos, pos + 3); pos += 3
      } else if (pos + 2 <= w.length && V2(w.substring(pos, pos + 2))) {
        out += w.substring(pos, pos + 2); pos += 2
      } else { out += w.substring(pos, pos + 1); pos += 1 }
    }
    out.result()
  }

  test("corpus unit counts match an independent Scala walk; lossless") {
    val docs = graft.tables.load(spark, dir, "documents")
    val wc = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected unit counts from the reference walk
    val expected = scala.collection.mutable.Map[String, Long]()
    val expWords = scala.collection.mutable.Map[String, Set[String]]()
    wc.foreach { case (w, c) =>
      val units = segment(w)
      assert(units.mkString == w, s"lossy segmentation of '$w': $units")
      units.foreach { u =>
        assert(u.length == 1 || V3(u) || V2(u), s"non-vocab unit '$u'")
        expected(u) = expected.getOrElse(u, 0L) + c
        expWords(u) = expWords.getOrElse(u, Set.empty) + w
      }
    }
    val got = SparkEntry.queries("tx37_subword_segment")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (u, (n, nw)) =>
      assert(n == expected(u), s"unit '$u' count $n != ${expected(u)}")
      assert(nw == expWords(u).size.toLong, s"unit '$u' n_words off")
    }
    spark.catalog.clearCache()
  }

  // ---- tx38/tx39: the TRAINED tokenizer ----------------------------

  /** Third, independent BPE trainer: plain Scala over a (word units,
    * count) map — list-based merge apply (leftmost first,
    * non-overlapping), no delimiter-string encoding shared with the
    * Spark path and no SQL shared with the DuckDB oracle. */
  private def refBpeTrain(wc: Map[String, Long], nMerges: Int)
      : Seq[(Int, String, String, Long)] = {
    var state: Map[Vector[String], Long] =
      wc.groupMapReduce { case (w, _) => w.map(_.toString).toVector }(_._2)(_ + _)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rk = 1
    var done = false
    while (rk <= nMerges && !done) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      state.foreach { case (u, c) =>
        u.iterator.zip(u.iterator.drop(1)).foreach { p =>
          pairs(p) = pairs.getOrElse(p, 0L) + c
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val ((a, b), n) = pairs.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((rk, a, b, n))
        def apply(u: Vector[String]): Vector[String] = {
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < u.length) {
            if (i + 1 < u.length && u(i) == a && u(i + 1) == b) {
              out += a + b; i += 2
            } else { out += u(i); i += 1 }
          }
          out.result()
        }
        state = state.groupMapReduce { case (u, _) => apply(u) }(_._2)(_ + _)
        rk += 1
      }
    }
    merges.result()
  }

  test("tx38 trained merges equal an independent list-based BPE trainer") {
    val wc = graft.tables.load(spark, dir, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = refBpeTrain(wc, graft.queries.Text.BpeMerges)
    val got = SparkEntry.queries("tx38_bpe_train")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expected,
      s"trained merges diverged:\n  spark: $got\n  ref:   $expected")
    // a genuinely ITERATIVE signal, not 8 parallel argmaxes: at least
    // one later merge must consume a unit an earlier merge created
    val units = got.map { case (_, a, b, _) => a + b }.toSet
    assert(got.exists { case (_, a, b, _) => units(a) || units(b) },
      s"no merge builds on an earlier merge's unit — loop not iterating: $got")
  }

  test("property: trainer equals the reference on adversarial vocabularies") {
    // Random small-alphabet vocabularies maximize the edge cases the
    // corpus can't be trusted to hit: overlapping pair occurrences
    // ("aaa" counts "aa" twice, merges once), ties broken by (a, b)
    // order, merged units immediately re-pairing ("abab" → "ab"+"ab" →
    // "abab"), and pair exhaustion before the merge budget. 6 seeds ×
    // 5 merges, Spark trainer vs the independent list-based reference.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    def gen[A](g: Gen[A], seed: Long): A =
      g.pureApply(Gen.Parameters.default, Seed(seed))
    val word = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    for (seed <- 1L to 6L) {
      val wc = gen(Gen.listOfN(12, Gen.zip(word, Gen.chooseNum(1L, 5L))), seed)
        .groupMapReduce(_._1)(_._2)(_ + _)
      val got = graft.queries.Text.bpeTrain(
        wc.toSeq.toDF("word", "wn"), nMerges = 5)
      val expected = refBpeTrain(wc, 5)
      assert(got == expected,
        s"seed $seed diverged on $wc:\n  spark: $got\n  ref:   $expected")
    }
  }

  test("tx39 trained segmentation round-trips: concat(units) == word") {
    import org.apache.spark.sql.functions.{concat_ws, col}
    val docs = graft.tables.load(spark, dir, "documents")
    val wc = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("wn"))
    val merges = graft.queries.Text.bpeTrain(wc, graft.queries.Text.BpeMerges)
    val lossy = wc.select(col("word"),
        concat_ws("", graft.queries.Text.bpeSegmented(col("word"), merges))
          .as("rejoined"))
      .filter(col("word") =!= col("rejoined"))
      .collect()
    assert(lossy.isEmpty,
      s"lossy trained segmentation: ${lossy.take(5).mkString(", ")}")
    spark.catalog.clearCache()
  }

  test("greedy priority: 3-char beats 2-char beats 1-char on collisions") {
    // "joining": jo + in + ... wait — greedy at pos 0 tries "joi"(∉V3)
    // then "jo"(∈V2); at pos 2 tries "ini"(∉) then "in"(∈V2) — but the
    // suffix "ing" starts at pos 3, consumed as i+ng? Walk it exactly:
    assert(segment("joining") == Seq("jo", "in", "ing"))
    // "ingest" opens with the V3 unit even though "in" ∈ V2
    assert(segment("ingest") == Seq("ing", "e", "s", "t"))
    // "table": ta + ble (3-char wins at pos 2 over... 'bl' ∉ V2 anyway)
    assert(segment("table") == Seq("ta", "ble"))
    // "partying": pa + rt + y + ing
    assert(segment("partying") == Seq("pa", "rt", "y", "ing"))
  }
}
