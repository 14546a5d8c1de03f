package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, DoubleType}

/** DuckDB-exact double rounding: `std::round(v * 10^n) / 10^n`, half
  * away from zero on the SCALED BINARY value.
  *
  * Spark's `round` on doubles goes through `BigDecimal.valueOf`, i.e.
  * it rounds the SHORTEST DECIMAL representation of the double. The two
  * conventions disagree whenever the scaled value sits on a decimal
  * half boundary: 0.5083125's nearest double is
  * 0.50831249999999994…, which DuckDB (exact binary) rounds to
  * 0.508312 while Spark (shortest repr "0.5083125") rounds to 0.508313
  * — a real hash-compare failure observed at sf0.1 (tx08). Since the
  * DuckDB oracle DEFINES correctness for this engine, every
  * oracle-compared rounded double goes through this expression; both
  * engines then execute identical IEEE operations and agree bit for
  * bit (verified against 120k adversarial samples, including ties,
  * negatives and the -0.0 cases).
  *
  * NOT `floor(x + 0.5)`: that formulation rounds up for
  * x = 0.49999999999999994 (x + 0.5 ties to 1.0) where std::round
  * returns 0 — the fractional-part comparison below is exact for all
  * |x| < 2^53 because `|x| - floor(|x|)` loses no bits.
  */
case class DuckRound(child: Expression, scale: Int)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a double input, got ${other.simpleString}")
    }

  private val pow10: Double = math.pow(10, scale)

  override def nullSafeEval(input: Any): Any =
    DuckRound.scalar(input.asInstanceOf[Double], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val x = ctx.freshName("x")
      val a = ctx.freshName("a")
      val f = ctx.freshName("f")
      val r = ctx.freshName("r")
      s"""
         |double $x = $v * ${pow10}D;
         |double $a = java.lang.Math.abs($x);
         |double $f = java.lang.Math.floor($a);
         |double $r = ($a - $f >= 0.5) ? $f + 1.0 : $f;
         |${ev.value} = java.lang.Math.copySign($r, $x) / ${pow10}D;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): DuckRound = copy(child = newChild)
}

object DuckRound {
  /** The same rounding for driver-side / typed (non-Column) code paths
    * — e.g. the stateful sessionizer's closing aggregate must round
    * exactly like its batch (q27) twin. */
  def scalar(v: Double, scale: Int): Double = {
    val p = math.pow(10, scale)
    val x = v * p
    val a = math.abs(x)
    val f = math.floor(a)
    val r = if (a - f >= 0.5) f + 1.0 else f
    java.lang.Math.copySign(r, x) / p
  }
}
