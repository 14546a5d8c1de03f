package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float|double>` columns
  * (testdata `embeddings.embedding`, FIXTURES.md §2), built entirely from
  * higher-order Catalyst functions so they run inside codegen with no
  * UDF/serialization cost.
  *
  * All arithmetic is promoted to double and accumulated left-to-right
  * (`aggregate` is a sequential fold), making results deterministic and
  * reproducible by a SQL oracle.
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product: fold of pairwise products, double accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  /** Euclidean (L2) norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

  /** Squared L2 distance (avoids the sqrt when only ranking matters). */
  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Sign bit of `dot(v, plane)` for one deterministic pseudo-random
    * hyperplane — the random-hyperplane LSH primitive. Plane component d
    * of plane p is `((1 + (p*31 + d*7) mod 97) - 49)`, a fixed integer
    * pattern both Spark and a SQL oracle can generate.
    *
    * This variant derives the plane per row (`sequence`+`transform`) so
    * it works for any vector length; when the dimension is known, use
    * the `dim` overload — the plane becomes a constant array literal and
    * the per-row work drops to one zip_with+fold.
    */
  def hyperplaneBit(v: Column, planeIdx: Int): Column = {
    val prods = zip_with(
      asDouble(v),
      transform(sequence(lit(0), size(v) - 1),
        d => ((lit(1) + (lit(planeIdx * 31) + d * 7) % 97) - 49).cast("double")),
      (x, w) => x * w)
    when(aggregate(prods, lit(0.0), (acc, p) => acc + p) >= 0, lit(1)).otherwise(lit(0))
  }

  /** Known-dimension fast path: the hyperplane is a constant literal. */
  def hyperplaneBit(v: Column, planeIdx: Int, dim: Int): Column = {
    val w = (0 until dim)
      .map(d => ((1 + (planeIdx * 31 + d * 7) % 97) - 49).toDouble)
    val prods = zip_with(asDouble(v), typedlit(w), (x, wc) => x * wc)
    when(aggregate(prods, lit(0.0), (acc, p) => acc + p) >= 0, lit(1)).otherwise(lit(0))
  }

  /** k-bit random-hyperplane signature packed into a BIGINT. */
  def hyperplaneSignature(v: Column, bits: Int): Column =
    (0 until bits).map(p => hyperplaneBit(v, p) * lit(1L << p))
      .reduce(_ + _)

  /** Known-dimension fast path (constant plane literals). */
  def hyperplaneSignature(v: Column, bits: Int, dim: Int): Column =
    (0 until bits).map(p => hyperplaneBit(v, p, dim) * lit(1L << p))
      .reduce(_ + _)
}
