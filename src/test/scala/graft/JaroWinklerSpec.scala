package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.JaroWinkler

/** The codegen'd Jaro-Winkler: reference values verified against
  * DuckDB's `jaro_winkler_similarity` (the dd21 oracle function), the
  * documented edge semantics (zero-match → 0.0 including ''/'',
  * boost only past jaro 0.7, prefix cap 4, fractional transpositions),
  * and interpreted-vs-generated equality through an actual plan.
  */
class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // (a, b, DuckDB jaro_winkler_similarity(a, b)) — probed directly
  private val reference = Seq(
    ("martha", "marhta", 0.9611111111111111),      // classic, l=3 boost
    ("dixon", "dicksonx", 0.8133333333333332),     // l=2 boost
    ("jellyfish", "smellyfish", 0.8962962962962964), // no common prefix
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("abcd", "badc", 0.8333333333333334),          // 2 transpositions
    ("abcde", "bcaed", 0.7833333333333333),        // window-limited match
    ("crate", "trace", 0.7333333333333334),        // boost-less (no prefix)
    ("abcdefgh", "abzzzzzz", 0.5),                 // prefix but jaro ≤ 0.7: NO boost
    ("prefixxx", "prefiabc", 0.85),                // prefix cap ℓ=4
    ("ab", "ba", 0.0),                             // window 0 → no matches
    ("a", "b", 0.0),
    ("a", "a", 1.0),
    ("", "", 0.0),                                 // DuckDB edge: NOT 1.0
    ("", "abc", 0.0))

  test("compute matches DuckDB jaro_winkler_similarity on reference pairs") {
    reference.foreach { case (a, b, want) =>
      val got = JaroWinkler.compute(a, b)
      assert(math.abs(got - want) < 1e-12, s"'$a'/'$b': $got != $want")
      val sym = JaroWinkler.compute(b, a)
      assert(math.abs(sym - got) < 1e-12, s"'$a'/'$b' not symmetric")
    }
  }

  test("generated code equals interpreted eval through a real plan") {
    import spark.implicits._
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    val df = reference.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val viaPlan = df
      .select(graft.functions.TextFunctions.jaroWinkler(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    val direct = reference.map { case (a, b, _) => JaroWinkler.compute(a, b) }
    assert(viaPlan == direct,
      "codegen path diverged from the shared compute")
  }
}
