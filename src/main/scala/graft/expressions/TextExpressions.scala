package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Σ-free rolling-hash document fingerprint as a native codegen'd
  * expression: acc = (acc * base + codepoint) mod `mod` over the
  * string's code points, left to right. Defaults (31, 1e9+7) are the
  * historical fingerprint; the (131, 998244353) instance provides the
  * INDEPENDENT second hash the 60-bit SimHash signature needs (two
  * ~30-bit polynomial hashes over different base/prime pairs — both
  * trivially reproducible in ANSI SQL for the oracle, unlike xxhash64).
  *
  * Replaces the HOF formulation `aggregate(transform(split(text, "")...))`
  * which materializes one array element PER CHARACTER of the document —
  * ~10× memory amplification on large docs and interpreted lambda
  * dispatch per element. This loop reads the decoded string once with
  * zero intermediate allocation.
  *
  * Semantics follow the declarative oracle (DuckDB
  * `list_reduce(list_transform(string_split(text, ''), c -> ascii(c)))`):
  * one fold step per Unicode code point, using the code point value.
  * Identical to the old Spark HOF path on ASCII text (where Spark's
  * `ascii` = code point) and well-defined beyond it.
  */
case class RollingFingerprint(child: Expression,
                              base: Long = 31L,
                              mod: Long = 1000000007L)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * base + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val str = ctx.freshName("str")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $str = $x.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $str.length()) {
         |  int $cp = $str.codePointAt($i);
         |  $acc = ($acc * ${base}L + $cp) % ${mod}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RollingFingerprint = copy(child = newChild)
}

/** Lowercase + whitespace-tokenize in ONE codegen'd pass — the
  * primitive under EVERY text query (`TextFunctions.tokens`).
  *
  * Replaces `filter(split(lower(text), "\\s+"), t -> length(t) > 0)`:
  * the regex engine walks the string once, `split` materializes the
  * (possibly empty-token-bearing) array, and the HOF filter then
  * dispatches an interpreted lambda per token. This pass lowercases
  * once and scans for runs of non-whitespace — no regex, no filter
  * pass, no empty intermediates.
  *
  * Parity: Java's `\s` (no UNICODE_CHARACTER_CLASS) is exactly
  * {space, \t, \n, \u000B, \f, \r}; lowercasing first matches the
  * composed form's `split(lower(text))` order (case mapping never
  * produces whitespace). Pinned equal to the composed form AND to
  * `java.util.StringTokenizer` (the reference's tokenizer) by
  * `TextFunctionsSpec`.
  */
case class Tokenize(child: Expression)
    extends UnaryExpression {

  import org.apache.spark.sql.types.ArrayType
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    val out = new java.util.ArrayList[Object]()
    val len = s.length
    var i = 0
    while (i < len) {
      while (i < len && Tokenize.isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !Tokenize.isWs(s.charAt(i))) i += 1
      if (i > start) out.add(UTF8String.fromString(s.substring(start, i)))
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      val len = ctx.freshName("len")
      val i = ctx.freshName("i")
      val start = ctx.freshName("start")
      val tk = "graft.expressions.Tokenize"
      s"""
         |java.lang.String $s = $x.toLowerCase().toString();
         |java.util.ArrayList<Object> $out = new java.util.ArrayList<Object>();
         |int $len = $s.length();
         |int $i = 0;
         |while ($i < $len) {
         |  while ($i < $len && $tk.isWs($s.charAt($i))) $i++;
         |  int $start = $i;
         |  while ($i < $len && !$tk.isWs($s.charAt($i))) $i++;
         |  if ($i > $start) {
         |    $out.add(org.apache.spark.unsafe.types.UTF8String.fromString(
         |      $s.substring($start, $i)));
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out.toArray());
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Tokenize = copy(child = newChild)
}

object Tokenize {
  /** Java regex `\s` membership (ASCII class — no Unicode flag). */
  def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
}

/** Word n-grams over a token array as ONE codegen'd pass — the
  * shingling primitive under dd02/dd03 (3-shingles), tx11/tx15
  * (bigrams) and pl01 (benchmark 5-grams).
  *
  * Replaces `transform(sequence(...), i -> concat_ws(" ",
  * element_at(toks, i), ...))`: higher-order functions evaluate their
  * lambda interpreted per output element, paying n `element_at` walks
  * plus boxing per n-gram. This loop reads the array once and emits
  * each gram with a single `concatWs`.
  *
  * Semantics identical to the composed form (pinned by
  * `TextFunctionsSpec`): m = size - n + 1 grams for m > 0, empty array
  * otherwise, null in → null out.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "n must be positive")

  import org.apache.spark.sql.types.ArrayType
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements() - n + 1
    if (m <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        val parts = new Array[UTF8String](n)
        var k = 0
        while (k < n) { parts(k) = arr.getUTF8String(i + k); k += 1 }
        out(i) = UTF8String.concatWs(space, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      val spaceRef = ctx.addReferenceObj("ngramSpace", space, utf8)
      val m = ctx.freshName("m")
      val grams = ctx.freshName("grams")
      val parts = ctx.freshName("parts")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      s"""
         |int $m = $x.numElements() - ${n - 1};
         |if ($m < 0) $m = 0;
         |$utf8[] $grams = new $utf8[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  $utf8[] $parts = new $utf8[$n];
         |  for (int $k = 0; $k < $n; $k++) {
         |    $parts[$k] = $x.getUTF8String($i + $k);
         |  }
         |  $grams[$i] = $utf8.concatWs($spaceRef, $parts);
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($grams);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): WordNgrams = copy(child = newChild)
}

/** Unicode NFC normalization (canonical composition) — the
  * normalization pass a pipeline runs BEFORE hashing/dedup so that
  * `e + COMBINING ACUTE` and the precomposed `é` hash identically.
  * Spark has no built-in for it; this wraps `java.text.Normalizer`
  * (the JDK's conformant Unicode implementation) as a codegen'd
  * expression, matching DuckDB's utf8proc-based `nfc_normalize` —
  * both implement the same Unicode canonical-composition algorithm,
  * which is what makes the op oracle-checkable.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($x.toString(),
         |    java.text.Normalizer.Form.NFC));
       """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

/** Per-document character-distribution Shannon entropy in ONE pass —
  * the tx28 hot path. Returns `struct<n_chars:int, n_distinct:int,
  * entropy:double>` over the input string's code points.
  *
  * Replaces the HOF formulation (char array → array_distinct → one
  * `filter().size` scan PER DISTINCT CHAR → aggregate fold): that is
  * O(distinct × length) interpreted-lambda work and measured 15 s at
  * sf0.1; this loop reads the string once into a sorted count map and
  * folds once over the ~40 distinct entries.
  *
  * Oracle parity (DuckDB `list_transform(list_sort(list_distinct(cs)),
  * …)` + `list_reduce` fold): the fold visits distinct characters in
  * ascending CODE POINT order — a TreeMap on the code point int, which
  * equals DuckDB's UTF-8 byte sort order (NOT Java String order, which
  * sorts by UTF-16 unit and diverges above the BMP) — and evaluates
  * `acc + (k/n) * ln(k/n) / ln(2)` left-to-right with the identical
  * IEEE op sequence (ln = Math.log, the same function Spark's `log`
  * compiles to).
  */
case class CharEntropy(child: Expression)
    extends UnaryExpression {

  import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.CharEntropy.compute($x);")

  override protected def withNewChildInternal(
      newChild: Expression): CharEntropy = copy(child = newChild)
}

object CharEntropy {
  private val Ln2 = java.lang.Math.log(2.0)

  /** Static so generated code calls straight into compiled bytecode
    * (the RollingFingerprint device — keeps the whole-stage span). */
  def compute(input: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = input.toString
    val counts = new java.util.TreeMap[Integer, Long]()
    var n = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1L else prev + 1L)
      n += 1
      i += Character.charCount(cp)
    }
    var acc = 0.0
    if (n > 0) {
      val nd = n.toDouble
      val it = counts.values().iterator()
      while (it.hasNext) {
        val p = it.next().toDouble / nd
        acc += (p * java.lang.Math.log(p)) / Ln2
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, counts.size(), -acc))
  }
}

/** dHash sample-order words (mm10's hash stage as ONE compiled pass):
  * 65 evenly-spaced code-point samples of the payload, each bit the
  * ORDER of adjacent samples, packed into two 32-bit words. The HOF
  * formulation (`transform(sequence(0,64), ...)` + two `aggregate`
  * folds) dispatched ~130 interpreted lambda evaluations per row —
  * thread dumps at 100× showed every worker inside
  * `SimpleHigherOrderFunction.eval`, the same cliff Tokenize/
  * WordNgrams/CharEntropy closed — this walks the string's code
  * points once in compiled bytecode. Bit/sample layout is pinned
  * equal to the HOF encoding in `MultimodalSpec` (the independent
  * twin), which is also exactly the DuckDB oracle's formulation.
  */
case class DHashWords(child: Expression)
    extends UnaryExpression {

  import org.apache.spark.sql.types.{StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("w0", LongType, nullable = false),
    StructField("w1", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    DHashWords.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expressions.DHashWords.compute($x);")

  override protected def withNewChildInternal(
      newChild: Expression): DHashWords = copy(child = newChild)
}

object DHashWords {
  /** Static so generated code calls straight into compiled bytecode
    * (the CharEntropy/RollingFingerprint device). Sample i (0-based,
    * i < 65) is the code point at code-point index (i·L) div 66 —
    * exactly `ascii(substr(text, (i·L)//66 + 1, 1))` in both engines'
    * SQL; bit w of word0 compares samples w+1 vs w, of word1 samples
    * w+33 vs w+32. Empty input → (0, 0). */
  def compute(input: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val cp = input.toString.codePoints().toArray
    val L = cp.length
    var w0 = 0L
    var w1 = 0L
    if (L > 0) {
      val samp = new Array[Int](65)
      var i = 0
      while (i < 65) { samp(i) = cp((i * L) / 66); i += 1 }
      var w = 0
      while (w < 32) {
        if (samp(w + 1) > samp(w)) w0 |= (1L << w)
        if (samp(w + 33) > samp(w + 32)) w1 |= (1L << w)
        w += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](w0, w1))
  }
}
