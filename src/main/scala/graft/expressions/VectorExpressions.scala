package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the dense-vector hot path.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * is correct but interpreted — HOFs sit outside whole-stage codegen
  * and pay per-element lambda dispatch. These expressions generate a
  * tight primitive loop instead, while keeping the EXACT same
  * arithmetic: element-wise double multiply, sequential left-to-right
  * accumulation — so results stay bit-identical to both the HOF
  * formulation and the DuckDB `list_reduce` oracles.
  *
  * Inputs are `array<double>` (callers cast `array<float>` up, which is
  * exact); mismatched lengths use the shorter (all engine vectors share
  * one dimension); null arrays propagate null. Array ELEMENTS are
  * assumed non-null (embedding data).
  */
abstract class BinaryVectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // no ImplicitCastInputTypes (AbstractDataType is private[sql]):
  // callers cast to array<double> explicitly (VectorFunctions.asDouble)
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  /** Java source for one loop step accumulating into `s` from
    * `x[i]`/`y[i]` expressions. */
  protected def stepCode(x: String, y: String): String
  protected def step(x: Double, y: Double): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += step(x.getDouble(i), y.getDouble(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${stepCode(s"$a.getDouble($i)", s"$b.getDouble($i)")};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

/** Σ a_i * b_i (sequential fold). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryVectorFold {
  override protected def stepCode(x: String, y: String): String = s"$x * $y"
  override protected def step(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Σ (a_i - b_i)² (sequential fold). */
case class L2DistanceSquared(left: Expression, right: Expression)
    extends BinaryVectorFold {
  override protected def stepCode(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def step(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2DistanceSquared =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Idempotently register ALL graft expressions as session temp
    * functions so column code can reach them via `call_function`.
    * Per-session (not a SparkSessionExtensions install) because the
    * driver contract hands us externally-created sessions. The
    * existence check keeps repeat calls silent (no replace-WARN spam) —
    * `graft.tables.load` calls this on every table load.
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val probe = org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot")
    if (!reg.functionExists(probe)) {
      reg.createOrReplaceTempFunction("graft_dot",
        exprs => DotProduct(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("graft_l2sq",
        exprs => L2DistanceSquared(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("graft_fingerprint",
        exprs => RollingFingerprint(exprs(0)), "built-in")
      // the independent second hash under the 60-bit SimHash signature
      reg.createOrReplaceTempFunction("graft_fingerprint2",
        exprs => RollingFingerprint(exprs(0), 131L, 998244353L), "built-in")
      reg.createOrReplaceTempFunction("graft_round",
        exprs => DuckRound(exprs(0),
          exprs(1).eval().asInstanceOf[Int]), "built-in")
      reg.createOrReplaceTempFunction("graft_hyperplane_sig",
        exprs => HyperplaneSignature(exprs(0),
          exprs(1).eval().asInstanceOf[Int]), "built-in")
      reg.createOrReplaceTempFunction("graft_word_ngrams",
        exprs => WordNgrams(exprs(0),
          exprs(1).eval().asInstanceOf[Int]), "built-in")
      reg.createOrReplaceTempFunction("graft_tokenize",
        exprs => Tokenize(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("graft_nfc",
        exprs => NfcNormalize(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("graft_char_entropy",
        exprs => CharEntropy(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("graft_jaro_winkler",
        exprs => JaroWinkler(exprs(0), exprs(1)), "built-in")
    }
  }
}
