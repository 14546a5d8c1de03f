package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Vector column functions: numeric correctness vs plain-Scala folds
  * (identical left-to-right accumulation order) and the zero-norm guard.
  */
class VectorFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark // registers graft exprs
  import spark.implicits._

  test("native hyperplane signature equals the composed per-bit formulation") {
    import org.apache.spark.sql.functions._
    val composed = (0 until 16).map { p =>
      val w = (0 until 64).map(d => ((1 + (p * 31 + d * 7) % 97) - 49).toDouble)
      when(VectorFunctions.dot(col("a"), typedlit(w)) >= 0, lit(1L << p))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val rnd = new scala.util.Random(99)
    val vecs = Seq.fill(40)(Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    val rows = vecs.toDF("a")
      .select(VectorFunctions.hyperplaneSignature(col("a"), 16).as("native"),
        composed.as("composed"))
      .as[(Long, Long)].collect()
    rows.foreach { case (n, c) => assert(n == c) }
  }

  test("graft expressions are callable from plain SQL") {
    // ensureRegistered installs real FunctionRegistry entries, so the
    // SQL surface works for spark.sql users, not just Column code
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       graft_l2sq(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS l2,
        |       graft_fingerprint('abc') AS fp""".stripMargin)
      .as[(Double, Double, Long)].head()
    assert(r._1 == 11.0)
    assert(r._2 == 25.0)
    assert(r._3 == ((('a'.toLong * 31 + 'b') % 1000000007L) * 31 + 'c') % 1000000007L)
  }

  private def evalD(c: org.apache.spark.sql.Column,
                    a: Seq[Float], b: Seq[Float]): Double =
    Seq((a, b)).toDF("a", "b").select(c.cast("double")).as[Double].head()

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  /** The exact fold VectorFunctions promises: per-element double
    * promotion, sequential left accumulation. */
  private def refDot(a: Seq[Float], b: Seq[Float]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }

  test("dot: exact fold parity on unit cases") {
    assert(evalD(VectorFunctions.dot(col("a"), col("b")),
      Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)) == 32.0)
    assert(evalD(VectorFunctions.dot(col("a"), col("b")), Seq(), Seq()) == 0.0)
  }

  test("dot property: bit-identical to sequential double fold") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-5f, 5f))
    val pairs = samples(vecGen.flatMap(a => vecGen.map(b => (a, b))), 40)
    val got = pairs.toDF("a", "b")
      .select(VectorFunctions.dot(col("a"), col("b"))).as[Double].collect()
    pairs.zip(got).foreach { case ((a, b), g) =>
      assert(g == refDot(a, b), s"a=$a b=$b") // == : same fold, same bits
    }
  }

  test("cosine: range, self-similarity, zero-norm guard") {
    val self = Seq(1f, 2f, 3f)
    assert(math.abs(evalD(VectorFunctions.cosine(col("a"), col("b")),
      self, self) - 1.0) < 1e-12)
    assert(evalD(VectorFunctions.cosine(col("a"), col("b")),
      Seq(0f, 0f), Seq(1f, 1f)) == 0.0) // zero-norm → 0.0, not NaN
    assert(math.abs(evalD(VectorFunctions.cosine(col("a"), col("b")),
      Seq(1f, 0f), Seq(0f, 1f))) < 1e-12) // orthogonal
    assert(math.abs(evalD(VectorFunctions.cosine(col("a"), col("b")),
      Seq(1f, 0f), Seq(-1f, 0f)) + 1.0) < 1e-12) // opposite
  }

  test("l2DistanceSq: squared euclidean") {
    assert(evalD(VectorFunctions.l2DistanceSq(col("a"), col("b")),
      Seq(1f, 2f), Seq(4f, 6f)) == 25.0)
    assert(evalD(VectorFunctions.l2DistanceSq(col("a"), col("b")),
      Seq(3f, 3f), Seq(3f, 3f)) == 0.0)
  }

  test("hyperplaneSignature: deterministic, bounded, antipodal-sensitive") {
    val vecs = Seq(Seq.fill(8)(1f), Seq.fill(8)(-1f), Seq(1f, -1f, 1f, -1f, 1f, -1f, 1f, -1f))
    val sigs = vecs.map(Tuple1(_)).toDF("a")
      .select(VectorFunctions.hyperplaneSignature(col("a"), 16).cast("long"))
      .as[Long].collect()
    // 16-bit signature stays in [0, 2^16)
    sigs.foreach(s => assert(s >= 0 && s < (1L << 16), s"sig=$s"))
    // same input twice → same signature (pure function of the column)
    val again = vecs.map(Tuple1(_)).toDF("a")
      .select(VectorFunctions.hyperplaneSignature(col("a"), 16).cast("long"))
      .as[Long].collect()
    assert(sigs.sameElements(again))
    // v and -v flip every strict-sign bit: signatures must differ
    assert(sigs(0) != sigs(1))
  }
}
