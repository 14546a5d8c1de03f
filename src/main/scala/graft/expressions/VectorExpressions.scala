package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

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

/** Top-`keep` nearest coarse-quantizer cells of a vector over a STATIC
  * centroid matrix — `(d, cid)` structs ascending by (distSq, cid),
  * the `ORDER BY dist, cid` total order.
  *
  * WHY an expression with the matrix as plan data instead of the
  * per-centroid literal tree `Similarity.nearestCells` inlines for
  * small sets: at adaptive cell counts (n/500 — 400 cells at the 100×
  * corpus, unbounded beyond) the literal tree's generated code grows
  * with the centroid count and broke janino's 64 KB method limit when
  * fused into a sort stage — silently de-codegening the WHOLE stage —
  * while a zip_with reformulation never codegens its lambda at all
  * (measured 1.5× slower on dd12/pl25 at 100×). Here the matrix is a
  * REFERENCE OBJECT: generated code is one fixed nested loop + an
  * insertion into a keep-sized buffer, O(1) in the centroid count and
  * inside whole-stage codegen at any cell count.
  *
  * Arithmetic is exactly [[L2DistanceSquared]]'s: sequential
  * left-to-right `s += (x-y)²` over min(lengths) — so assignments are
  * bit-identical to the literal-tree path (spec-pinned). NaN distances
  * never displace a buffer entry (Java `<` is false for NaN) — inputs
  * are assumed NaN-free, the [[HyperplaneSignature]] convention. */
case class NearestCellsTopK(child: Expression,
    cents: Array[Array[Double]], cids: Array[Long], keep: Int)
    extends UnaryExpression {

  private val k = math.min(keep, cents.length)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("cid", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val bd = Array.fill(k)(Double.PositiveInfinity)
    val bc = Array.fill(k)(Long.MaxValue)
    var c = 0
    while (c < cents.length) {
      val ce = cents(c)
      val n = math.min(v.numElements(), ce.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        val dx = v.getDouble(i) - ce(i); s += dx * dx; i += 1
      }
      val id = cids(c)
      if (s < bd(k - 1) || (s == bd(k - 1) && id < bc(k - 1))) {
        var j = k - 1
        while (j > 0 && (s < bd(j - 1) || (s == bd(j - 1) && id < bc(j - 1)))) {
          bd(j) = bd(j - 1); bc(j) = bc(j - 1); j -= 1
        }
        bd(j) = s; bc(j) = id
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.tabulate[Any](k)(j =>
        new GenericInternalRow(Array[Any](bd(j), bc(j)))))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cm = ctx.addReferenceObj("cents", cents, "double[][]")
      val im = ctx.addReferenceObj("cids", cids, "long[]")
      val bd = ctx.freshName("bd")
      val bc = ctx.freshName("bc")
      val c = ctx.freshName("c")
      val ce = ctx.freshName("ce")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val dx = ctx.freshName("dx")
      val i = ctx.freshName("i")
      val id = ctx.freshName("id")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      s"""
         |double[] $bd = new double[$k];
         |long[] $bc = new long[$k];
         |java.util.Arrays.fill($bd, Double.POSITIVE_INFINITY);
         |java.util.Arrays.fill($bc, Long.MAX_VALUE);
         |for (int $c = 0; $c < $cm.length; $c++) {
         |  double[] $ce = $cm[$c];
         |  int $n = java.lang.Math.min($v.numElements(), $ce.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $dx = $v.getDouble($i) - $ce[$i];
         |    $s += $dx * $dx;
         |  }
         |  long $id = $im[$c];
         |  if ($s < $bd[$k - 1] || ($s == $bd[$k - 1] && $id < $bc[$k - 1])) {
         |    int $j = $k - 1;
         |    while ($j > 0 && ($s < $bd[$j - 1] ||
         |        ($s == $bd[$j - 1] && $id < $bc[$j - 1]))) {
         |      $bd[$j] = $bd[$j - 1]; $bc[$j] = $bc[$j - 1]; $j--;
         |    }
         |    $bd[$j] = $s; $bc[$j] = $id;
         |  }
         |}
         |Object[] $out = new Object[$k];
         |for (int $j = 0; $j < $k; $j++) {
         |  $out[$j] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ $bd[$j], $bc[$j] });
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NearestCellsTopK = copy(child = newChild)
}

/** TWO-LEVEL coarse-quantizer assignment — the standard IVF answer to
  * single-level assignment's O(n·cells) cost (O(n²/500) under the
  * adaptive cell rule, SURVEY §6): stage 1 picks the nearest of ~√C
  * SUPER-centroids (group means), stage 2 scans only that group's
  * member centroids — ~2√C distance evaluations per vector instead of
  * C. Returns the winning member cid.
  *
  * APPROXIMATE by design: a vector near a group boundary can land in
  * its second-best cell. IVF tolerates exactly this (cell membership
  * only needs "findable when the cell is probed"; recall impact is
  * the nprobe trade already being made) — which is why this path is
  * opt-in for big BUILD assignments and never used for probe-side
  * cell selection or any oracle-checked query.
  *
  * Same arithmetic as [[L2DistanceSquared]] per candidate; stage-1
  * ties keep the lowest group, stage-2 ties the lowest cid. All four
  * lookup tables are codegen REFERENCE OBJECTS — O(1) generated code
  * at any cell count. NaN-free inputs assumed (the
  * [[HyperplaneSignature]] convention). */
case class TwoLevelNearestCell(child: Expression,
    supers: Array[Array[Double]], memberStart: Array[Int],
    memberCents: Array[Array[Double]], memberCids: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${other.simpleString}")
    }

  private def distSq(v: ArrayData, ce: Array[Double]): Double = {
    val n = math.min(v.numElements(), ce.length)
    var s = 0.0
    var i = 0
    while (i < n) { val dx = v.getDouble(i) - ce(i); s += dx * dx; i += 1 }
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var bg = 0
    var bgd = Double.PositiveInfinity
    var g = 0
    while (g < supers.length) {
      val s = distSq(v, supers(g))
      if (s < bgd) { bgd = s; bg = g }
      g += 1
    }
    var bc = Long.MaxValue
    var bcd = Double.PositiveInfinity
    var m = memberStart(bg)
    while (m < memberStart(bg + 1)) {
      val s = distSq(v, memberCents(m))
      val id = memberCids(m)
      if (s < bcd || (s == bcd && id < bc)) { bcd = s; bc = id }
      m += 1
    }
    bc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val sm = ctx.addReferenceObj("supers", supers, "double[][]")
      val ms = ctx.addReferenceObj("memberStart", memberStart, "int[]")
      val mc = ctx.addReferenceObj("memberCents", memberCents, "double[][]")
      val mi = ctx.addReferenceObj("memberCids", memberCids, "long[]")
      val bg = ctx.freshName("bg")
      val bgd = ctx.freshName("bgd")
      val g = ctx.freshName("g")
      val bc = ctx.freshName("bc")
      val bcd = ctx.freshName("bcd")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val ce = ctx.freshName("ce")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dx = ctx.freshName("dx")
      val id = ctx.freshName("id")
      def loopDist(src: String, idx: String) =
        s"""
           |double[] $ce = $src[$idx];
           |int $n = java.lang.Math.min($v.numElements(), $ce.length);
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $dx = $v.getDouble($i) - $ce[$i];
           |  $s += $dx * $dx;
           |}
         """.stripMargin
      s"""
         |int $bg = 0;
         |double $bgd = Double.POSITIVE_INFINITY;
         |for (int $g = 0; $g < $sm.length; $g++) {
         |  ${loopDist(sm, g)}
         |  if ($s < $bgd) { $bgd = $s; $bg = $g; }
         |}
         |long $bc = Long.MAX_VALUE;
         |double $bcd = Double.POSITIVE_INFINITY;
         |for (int $m = $ms[$bg]; $m < $ms[$bg + 1]; $m++) {
         |  ${loopDist(mc, m)}
         |  long $id = $mi[$m];
         |  if ($s < $bcd || ($s == $bcd && $id < $bc)) { $bcd = $s; $bc = $id; }
         |}
         |${ev.value} = $bc;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): TwoLevelNearestCell = copy(child = newChild)
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
      // centroid matrix + cid list arrive as FOLDABLE literals and are
      // decoded once at plan construction into the reference objects
      reg.createOrReplaceTempFunction("graft_nearest_cells", exprs => {
        val cm = exprs(1).eval().asInstanceOf[ArrayData]
        NearestCellsTopK(exprs(0),
          Array.tabulate(cm.numElements())(i => cm.getArray(i).toDoubleArray()),
          exprs(2).eval().asInstanceOf[ArrayData].toLongArray(),
          exprs(3).eval().asInstanceOf[Int])
      }, "built-in")
      reg.createOrReplaceTempFunction("graft_two_level_cell", exprs => {
        def mat(e: Expression): Array[Array[Double]] = {
          val a = e.eval().asInstanceOf[ArrayData]
          Array.tabulate(a.numElements())(i => a.getArray(i).toDoubleArray())
        }
        TwoLevelNearestCell(exprs(0), mat(exprs(1)),
          exprs(2).eval().asInstanceOf[ArrayData].toIntArray(),
          mat(exprs(3)),
          exprs(4).eval().asInstanceOf[ArrayData].toLongArray())
      }, "built-in")
      reg.createOrReplaceTempFunction("graft_word_ngrams",
        exprs => WordNgrams(exprs(0),
          exprs(1).eval().asInstanceOf[Int]), "built-in")
      reg.createOrReplaceTempFunction("graft_tokenize",
        exprs => Tokenize(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("graft_nfc",
        exprs => NfcNormalize(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("graft_char_entropy",
        exprs => CharEntropy(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("graft_dhash",
        exprs => DHashWords(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("graft_jaro_winkler",
        exprs => JaroWinkler(exprs(0), exprs(1)), "built-in")
    }
  }
}
