package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Unit + property coverage for the text column functions (SURVEY §5.2-3).
  * Each test evaluates the Column against literal input via a small
  * DataFrame — the expressions themselves are what's under test.
  * Property tests sample ScalaCheck generators directly (deterministic
  * seed) and batch all samples through ONE Spark job per property.
  */
class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def evalStr(c: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("text").select(c.cast("string")).as[String].head()

  private def evalSeq(c: org.apache.spark.sql.Column, input: String): Seq[String] =
    Seq(input).toDF("text").select(c).as[Seq[String]].head()

  private def evalLong(c: org.apache.spark.sql.Column, input: String): Long =
    Seq(input).toDF("text").select(c.cast("long")).as[Long].head()

  /** Draw n deterministic samples from a generator. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  // --- tokens: StringTokenizer parity (empty tokens dropped) ---

  test("tokens drops empty tokens like StringTokenizer") {
    assert(evalSeq(TextFunctions.tokens(col("text")), "  a  b\tc \n d  ") ==
      Seq("a", "b", "c", "d"))
    assert(evalSeq(TextFunctions.tokens(col("text")), "") == Seq())
    assert(evalSeq(TextFunctions.tokens(col("text")), "   ") == Seq())
  }

  test("tokens lowercases") {
    assert(evalSeq(TextFunctions.tokens(col("text")), "FOO Bar") ==
      Seq("foo", "bar"))
  }

  test("tokens property: matches java.util.StringTokenizer on random strings") {
    val wsStringGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(5)), Gen.oneOf(" ", "\t", "\n", "  ")))
      .map(_.mkString)
    val in = samples(wsStringGen, 60)
    val got = in.toDF("text")
      .select(TextFunctions.tokens(col("text"))).as[Seq[String]].collect()
    in.zip(got).foreach { case (s, g) =>
      val st = new java.util.StringTokenizer(s.toLowerCase)
      val expected = Iterator.continually(st)
        .takeWhile(_.hasMoreTokens).map(_.nextToken()).toSeq
      assert(g == expected, s"input: ${s.replace("\n", "\\n")}")
    }
  }

  // --- scrubPunctuation: fused char class ≡ 33 iterated replaces ---

  test("scrubPunctuation equals iterated per-char replaceAll (incl dup ')") {
    // the reference's 33 patterns, with the duplicated \' (skip/punctuation.txt:24-25)
    val chars = "`~!@#$%^&*()_+-=[]{}\\|;''\":,./<>?".toSeq
    val inputs = Seq("it's a test-case!", "a(b)c[d]e{f}", "x\\y|z;w",
      "no punct here", "~!@#$%^&*()")
    for (in <- inputs) {
      val expected = chars.distinct.foldLeft(in.toLowerCase) { (acc, ch) =>
        acc.replaceAll("\\" + ch, " ")
      }
      assert(evalStr(TextFunctions.scrubPunctuation(lower(col("text")), chars), in)
        == expected, s"input: $in")
    }
  }

  // --- numeric token filter ---

  test("isNumericToken matches the reference regex semantics") {
    val t = Seq(("123", true), ("-42", true), ("+7", true), ("", true),
      ("a1", false), ("1a", false), ("12.5", false), ("abc", false))
    for ((tok, want) <- t)
      assert(evalStr(TextFunctions.isNumericToken(col("text")), tok).toBoolean
        == want, s"token: $tok")
  }

  // --- fingerprint: rolling hash, DuckDB string_split parity ---

  private def refFingerprint(s: String): Long =
    s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % 1000000007L)

  test("fingerprint equals reference fold (no trailing-empty element)") {
    for (s <- Seq("", "a", "abc", "hello world", "x" * 100))
      assert(evalLong(TextFunctions.fingerprint(col("text")), s)
        == refFingerprint(s), s"input: $s")
  }

  test("fingerprint property: matches fold for random ascii strings") {
    val in = samples(Gen.asciiPrintableStr, 60)
    val got = in.toDF("text")
      .select(TextFunctions.fingerprint(col("text"))).as[Long].collect()
    in.zip(got).foreach { case (s, g) =>
      assert(g == refFingerprint(s), s"input: $s")
    }
  }

  test("fingerprint codegen expression matches the HOF formulation") {
    // the pre-expression formulation fingerprint() replaced — pinned
    // here so the codegen path can never silently drift from the
    // declarative oracle semantics
    val hof = aggregate(
      transform(filter(split(col("text"), ""), ch => length(ch) > 0),
        ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % 1000000007L)
    val in = samples(Gen.asciiPrintableStr, 60) ++ Seq("", "a b c", "x" * 500)
    val rows = in.toDF("text")
      .select(TextFunctions.fingerprint(col("text")).as("e"), hof.as("h"))
      .as[(Long, Long)].collect()
    in.zip(rows).foreach { case (s, (e, h)) =>
      assert(e == h, s"input: $s")
    }
  }

  // --- shingles / ngrams ---

  test("charShingles: distinct n-grams, short-text guard") {
    assert(evalSeq(TextFunctions.charShingles(col("text"), 3), "abcd") ==
      Seq("abc", "bcd"))
    assert(evalSeq(TextFunctions.charShingles(col("text"), 3), "ab") == Seq())
    assert(evalSeq(TextFunctions.charShingles(col("text"), 2), "aaa") ==
      Seq("aa")) // distinct
    assert(evalSeq(TextFunctions.charShingles(col("text"), 2), "AbC") ==
      Seq("ab", "bc")) // lowercased
  }

  test("wordNgrams: ordered, non-distinct, short-text guard") {
    assert(evalSeq(TextFunctions.wordNgrams(col("text"), 2), "a b c") ==
      Seq("a b", "b c"))
    assert(evalSeq(TextFunctions.wordNgrams(col("text"), 3), "a b") == Seq())
    assert(evalSeq(TextFunctions.wordNgrams(col("text"), 2), "x y x y") ==
      Seq("x y", "y x", "x y"))
  }

  test("tokens codegen expression matches the composed split+filter formulation") {
    def composed(text: org.apache.spark.sql.Column) =
      filter(split(lower(text), "\\s+"), t => length(t) > lit(0))
    val wsChar = Gen.oneOf(' ', ' ', ' ', '\t', '\n', '\u000B', '\f', '\r')
    val chunk = Gen.oneOf(
      Gen.stringOfN(4, Gen.alphaNumChar),
      Gen.stringOfN(2, Gen.oneOf('A', 'z', '\'', '#', 'é', 'Ü')),
      wsChar.map(_.toString))
    val texts = Gen.listOfN(150,
      Gen.chooseNum(0, 12).flatMap(k => Gen.listOfN(k, chunk).map(_.mkString)))
      .pureApply(Gen.Parameters.default, Seed(33L))
    val rows = texts.toDF("text")
      .select(TextFunctions.tokens(col("text")).as("native"),
        composed(col("text")).as("ref"))
      .as[(Seq[String], Seq[String])].collect()
    rows.zip(texts).foreach { case ((nat, ref), t) =>
      assert(nat == ref, s"input: ${t.map(_.toInt)}")
    }
  }

  test("wordNgrams codegen expression matches the composed HOF formulation") {
    // the interpreted reference the native WordNgrams pass replaced
    def composed(toks: org.apache.spark.sql.Column, n: Int) =
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))
    val word = Gen.stringOfN(3, Gen.alphaLowerChar)
    val texts = Gen.listOfN(120,
      Gen.chooseNum(0, 9).flatMap(len => Gen.listOfN(len, word).map(_.mkString(" "))))
      .pureApply(Gen.Parameters.default, Seed(21L))
    for (n <- Seq(2, 3, 5)) {
      val rows = texts.toDF("text")
        .select(TextFunctions.tokens(col("text")).as("tk"))
        .select(TextFunctions.wordNgramsOf(col("tk"), n).as("native"),
          composed(col("tk"), n).as("ref"))
        .as[(Seq[String], Seq[String])].collect()
      rows.foreach { case (nat, ref) => assert(nat == ref, s"n=$n") }
    }
    // null input → null out on both forms
    val nulls = Seq[Option[String]](None).toDF("text")
      .select(TextFunctions.wordNgramsOf(split(col("text"), " "), 2).as("n"))
      .collect()
    assert(nulls.head.isNullAt(0))
  }

  // --- token counting ---

  test("tokenCount and bpeTokenCount") {
    assert(evalLong(TextFunctions.tokenCount(col("text")), "a  b c") == 3L)
    assert(evalLong(TextFunctions.tokenCount(col("text")), "") == 0L)
    // "don't stop2" → [don, ', t, stop, 2] per the alpha/digit/other split
    assert(evalLong(TextFunctions.bpeTokenCount(col("text")), "don't stop2") == 5L)
  }

  // --- language id ---

  test("langId picks argmax marker language, und when none") {
    assert(evalStr(TextFunctions.langId(col("text")),
      "the cat and the dog is in that house") == "en")
    assert(evalStr(TextFunctions.langId(col("text")),
      "der hund und die katze ist nicht ein") == "de")
    assert(evalStr(TextFunctions.langId(col("text")), "zzz qqq") == "und")
    assert(evalStr(TextFunctions.langId(col("text")), "") == "und")
  }

  test("langId breaks ties by language code ascending") {
    // "la" ∈ es and fr marker sets; one hit each → tie → 'es' < 'fr'
    assert(evalStr(TextFunctions.langId(col("text")), "la") == "es")
  }

  // --- quality / ratios ---

  test("stopwordRatio and meanTokenLength handle empty docs") {
    assert(evalStr(TextFunctions.stopwordRatio(col("text"), Seq("the")), "")
      .toDouble == 0.0)
    assert(evalStr(TextFunctions.meanTokenLength(col("text")), "").toDouble == 0.0)
    assert(evalStr(TextFunctions.stopwordRatio(col("text"), Seq("the")),
      "the cat the dog").toDouble == 0.5)
    assert(evalStr(TextFunctions.meanTokenLength(col("text")), "ab cdef")
      .toDouble == 3.0)
  }

  // --- char entropy (tx28 hot path) ---

  test("charEntropy expression matches the HOF formulation bit-for-bit") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // known values, mixed case/unicode, and randoms; the HOF twin is
    // the ORIGINAL tx28 formulation the oracle was validated against
    val rnd = new scala.util.Random(7)
    val strs = Seq("aaaa", "abab", "abcd", "Mixed CASE text!",
      "naïve café ñ", "日本語 text mixed", "a") ++
      Seq.fill(30)(rnd.alphanumeric.take(1 + rnd.nextInt(60)).mkString)
    val df = strs.toDF("text")
    val t = lower(col("text"))
    val cs = transform(sequence(lit(1), length(t)), i => t.substr(i, lit(1)))
    val hof = df.select(
      (-aggregate(
        transform(array_sort(array_distinct(cs)),
          ch => size(filter(cs, x => x === ch)).cast("double")),
        lit(0.0),
        (acc, k) => acc + (k / length(t).cast("double")) *
          log(k / length(t).cast("double")) / log(lit(2.0))))
        .as("e")).as[Double].collect()
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    val fast = df.select(
        call_function("graft_char_entropy", t).getField("entropy").as("e"))
      .as[Double].collect()
    hof.zip(fast).zip(strs).foreach { case ((h, f), s) =>
      assert(java.lang.Double.doubleToRawLongBits(h) ==
        java.lang.Double.doubleToRawLongBits(f), s"mismatch on '$s': $h vs $f")
    }
    // struct counts: code points, not UTF-16 units
    val row = df.filter(col("text") === "日本語 text mixed")
      .select(call_function("graft_char_entropy", t)).head.getStruct(0)
    assert(row.getInt(0) == "日本語 text mixed".length)
    assert(row.getInt(1) == "日本語 text mixed".toLowerCase.distinct.length)
  }
}
