package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float|double>` columns
  * (testdata `embeddings.embedding`, FIXTURES.md §2).
  *
  * The fold primitives route through native codegen'd Catalyst
  * expressions (graft.expressions.DotProduct / L2DistanceSquared) —
  * higher-order functions like `aggregate(zip_with(...))` are
  * interpreted per element and measured ~3× slower on the cosine scan.
  * Callers must run `VectorExpressions.ensureRegistered(spark)` once
  * per session before ANALYSIS of a plan using these columns.
  *
  * All arithmetic is promoted to double and accumulated left-to-right,
  * making results deterministic, reproducible by a SQL oracle, and
  * bit-identical to the previous HOF formulation.
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product: fold of pairwise products, double accumulation. */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", asDouble(a), asDouble(b))

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
    call_function("graft_l2sq", asDouble(a), asDouble(b))

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
    val weights = transform(sequence(lit(0), size(v) - 1),
      d => ((lit(1) + (lit(planeIdx * 31) + d * 7) % 97) - 49).cast("double"))
    when(dot(v, weights) >= 0, lit(1)).otherwise(lit(0))
  }

  /** Known-dimension fast path: the hyperplane is a constant literal. */
  def hyperplaneBit(v: Column, planeIdx: Int, dim: Int): Column = {
    val w = (0 until dim)
      .map(d => ((1 + (planeIdx * 31 + d * 7) % 97) - 49).toDouble)
    when(dot(v, typedlit(w)) >= 0, lit(1)).otherwise(lit(0))
  }

  /** k-bit random-hyperplane signature packed into a BIGINT — one
    * codegen'd nested loop (graft.expressions.HyperplaneSignature)
    * instead of `bits` composed dot-product trees; bit-identical to
    * the per-bit formulation above and to the SQL oracle. */
  def hyperplaneSignature(v: Column, bits: Int): Column =
    call_function("graft_hyperplane_sig", asDouble(v), lit(bits))

  /** Kept for source compat: the dimension no longer matters — the
    * native expression reads the vector's own length. */
  def hyperplaneSignature(v: Column, bits: Int, dim: Int): Column =
    hyperplaneSignature(v, bits)
}
