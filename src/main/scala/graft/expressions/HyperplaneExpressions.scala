package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** k-bit random-hyperplane LSH signature in ONE pass: bit p is the
  * sign of Σ_d v_d · w(p,d) with the deterministic integer plane
  * `w(p,d) = (1 + (p*31 + d*7) mod 97) - 49` (the same pattern the
  * DuckDB oracles generate).
  *
  * Replaces `bits` separate dot-product expressions (each a full
  * column tree): one expression, one generated nested loop — smaller
  * codegen (the 16-plane variant was a measurable janino compile cost)
  * and no per-plane weight-array materialization. The per-plane
  * accumulation is the same sequential left-to-right double fold as
  * `VectorFunctions.dot`, so signatures are bit-identical to the
  * composed formulation and to the SQL oracle.
  *
  * NaN caveat: Java's `s >= 0` is false for NaN, while Spark SQL's
  * `>=` (the old per-bit formulation) and DuckDB both order NaN above
  * every value — so a vector containing NaN would get a different bit
  * here than from the SQL oracle. Inputs are assumed NaN-free (the
  * embeddings fixtures are); callers feeding untrusted vectors should
  * pre-filter with `exists(v, isnan)`.
  */
case class HyperplaneSignature(child: Expression, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var sig = 0L
    var p = 0
    while (p < bits) {
      var s = 0.0
      var d = 0
      while (d < n) {
        s += v.getDouble(d) * ((1 + (p * 31 + d * 7) % 97) - 49)
        d += 1
      }
      if (s >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      s"""
         |int $n = $v.numElements();
         |long $sig = 0L;
         |for (int $p = 0; $p < $bits; $p++) {
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $s += $v.getDouble($d) * ((1 + ($p * 31 + $d * 7) % 97) - 49);
         |  }
         |  if ($s >= 0) $sig |= 1L << $p;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneSignature = copy(child = newChild)
}
