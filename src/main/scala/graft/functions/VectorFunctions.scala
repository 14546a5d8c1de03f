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

  // --- Scalar (int8) quantization — the ONE home of the SQ expression
  //     trees shared by sm08 (queries.Similarity) and the ANN artifact
  //     (index.VectorStore). These formulations are load-bearing for
  //     cross-engine bit parity: floor(x·255 + 0.5), never round() —
  //     floor and the exact +0.5 add are IEEE-identical on Spark and
  //     DuckDB, while round() hits the shortest-decimal-repr divergence
  //     DuckRound exists for. A fix here moves every consumer at once.

  /** Per-dimension min/max of `vecCol` over a frame, as ONE row of two
    * ordered arrays `(mns, mxs)` — the SQ codebook. 64-row aggregation
    * (struct sort keys on pos first), broadcastable. */
  def sqStatsRow(e: org.apache.spark.sql.DataFrame,
                 vecCol: String): org.apache.spark.sql.DataFrame =
    e.select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("pos", "xi")))
      .groupBy("pos").agg(min(col("xi")).as("mn"), max(col("xi")).as("mx"))
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("mn")))),
          t => t.getField("mn")).as("mns"),
        transform(array_sort(collect_list(struct(col("pos"), col("mx")))),
          t => t.getField("mx")).as("mxs"))

  /** Quantize a vector to one code in [0, 255] per dimension. Codes
    * CLAMP at the range edges, so quantizing data outside the codebook
    * (frozen-codebook ingest drift) saturates instead of overflowing a
    * downstream narrow cast; for data inside the codebook the clamp is
    * an exact no-op. Returns array<bigint>. */
  def sqQuantize(vec: Column, mns: Column, mxs: Column): Column =
    transform(vec.cast("array<double>"), (x, d) => {
      val mn = element_at(mns, d + 1)
      val mx = element_at(mxs, d + 1)
      when(mx === mn, lit(0L))
        .otherwise(greatest(lit(0L), least(lit(255L),
          floor((x - mn) / (mx - mn) * 255.0 + 0.5))))
    })

  /** Dequantize codes back to the cell of the original value — what
    * asymmetric (ADC) scoring compares full-precision probes against. */
  def sqDequantize(code: Column, mns: Column, mxs: Column): Column =
    transform(code, (v, d) => {
      val mn = element_at(mns, d + 1)
      val mx = element_at(mxs, d + 1)
      when(mx === mn, mn)
        .otherwise(mn + (v.cast("double") / 255.0) * (mx - mn))
    })

  /** One 32-bit sign word of a vector: bit i set iff dim (off+i) ≥ 0 —
    * the BINARY-quantization packing (sm24's convention, shared with
    * the VectorStore `_bits` artifact). Disjoint powers of two sum
    * exactly; the 0.0 threshold is a constant, so the bits are
    * engine-summation-order-independent. Works on float and double
    * arrays (the ≥ 0 compare promotes exactly). */
  def signWord(vec: Column, off: Int): Column =
    aggregate(
      zip_with(slice(vec, off + 1, 32),
        array((0 until 32).map(i => lit(1L << i)): _*),
        (x, p) => when(x >= lit(0.0), p).otherwise(lit(0L))),
      lit(0L), (a, b) => a + b)

  /** Hamming distance between two packed sign-word pairs. */
  def hamming2(a0: Column, a1: Column, b0: Column, b1: Column): Column =
    bit_count(a0.bitwiseXOR(b0)) + bit_count(a1.bitwiseXOR(b1))
}
