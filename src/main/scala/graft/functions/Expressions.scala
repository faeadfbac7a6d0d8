package graft.functions

import graft.semantics.StringOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the two hottest scalar text functions
  * (SURVEY.md §4.3 escalation path (b): a codegen'd Expression beats a
  * Scala UDF — no ScalaUDF wrapper, no encoder round-trip, null handling
  * inlined into whole-stage codegen; the Java body delegates to the same
  * `semantics` code the oracle runs, so parity is untouched).
  *
  * Used on the hot paths: mention normalization (every mention row) and
  * canonical-resolve join keys (every triple, twice). The pal_* UDF
  * registry remains for the long tail.
  */
object NativeFunctions {

  /** Static entry points referenced from generated Java code. */
  def normalizeSurface(s: UTF8String): UTF8String =
    UTF8String.fromString(StringOps.normalizeSurface(s.toString))

  def caseSignature(s: UTF8String): UTF8String =
    UTF8String.fromString(StringOps.caseSignature(s.toString))

  /** Winnowing fingerprint (document fingerprinting via rolling hash):
    * 64-bit polynomial rolling hash over every WINDOW-char window (O(n),
    * one multiply+add+subtract per char), fingerprint = min window hash.
    * Structurally robust: a local edit changes only the windows covering
    * it, so near-identical documents usually share the minimum. Single
    * pass, no allocation — safe inside whole-stage codegen.
    */
  final val FP_WINDOW = 16
  private final val FP_BASE = 1315423911L
  // FP_BASE^(FP_WINDOW-1) for the rolling subtract, precomputed
  private final val FP_POW: Long = {
    var p = 1L; var i = 0
    while (i < FP_WINDOW - 1) { p *= FP_BASE; i += 1 }
    p
  }

  /** Dot product over two array<double> columns, truncating to the
    * shorter length. Strict left-to-right summation — the same order
    * DuckDB's list_dot_product and a sequential loop use, so oracled
    * quantized-dot queries stay bit-identical cross-engine. Replaces
    * the interpreted `aggregate(zip_with(...))` higher-order lambdas
    * that dominated per-row cost in the embedding family.
    */
  def dotProduct(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def dot_product(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Strict dot product matching `aggregate(zip_with(a,b,*),0D,+)`
    * semantics exactly: zip_with pads the shorter array with nulls and a
    * null poisons the sum, so unequal lengths or null elements yield
    * NULL (the truncating dotProduct above is for hand-placed calls
    * where lengths are known equal, e.g. the 512-wide sign arrays).
    * Used by the DotProductRewrite optimizer rule, which must preserve
    * the original expression's semantics bit-for-bit.
    */
  def dotProductStrict(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  def winnowFingerprint(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    if (n == 0) return 0L
    if (n <= FP_WINDOW) {
      var h = 0L; var i = 0
      while (i < n) { h = h * FP_BASE + str.charAt(i); i += 1 }
      return h
    }
    var h = 0L
    var i = 0
    while (i < FP_WINDOW) { h = h * FP_BASE + str.charAt(i); i += 1 }
    var min = h
    while (i < n) {
      h = (h - str.charAt(i - FP_WINDOW) * FP_POW) * FP_BASE + str.charAt(i)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** All 16 MinHash signatures of a document in ONE zero-allocation pass
    * (the dedup family's hot path — the previous form ran 16 INTERPRETED
    * `array_min(transform(shingles, sh -> xxhash64(sh, k)))` lambdas per
    * row after materializing a shingle array; sharp edge #9).
    *
    * Exactness: `split(text, ' ')` tokens are the byte spans between
    * single 0x20 separators (empties included), and `concat_ws(' ', 3
    * consecutive tokens)` reproduces EXACTLY the original byte span from
    * token w's first byte to token w+2's last byte — so hashing that
    * span in place with Spark's own XXH64 yields bit-identical values to
    * `xxhash64(shingle, k)` with no shingle strings ever allocated
    * (0x20 never occurs inside a UTF-8 multibyte sequence, so this holds
    * for any input). Returns null for docs under 3 tokens — the same
    * rows the SQL guard `size(split(text,' ')) >= 3` removed, now
    * filterable with a plain isNotNull.
    */
  def minhashSigs16(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // token start offsets (token t starts after the t-th space)
    var spaces = 0
    var i = 0
    while (i < n) { if (s.getByte(i) == ' '.toByte) spaces += 1; i += 1 }
    val nTok = spaces + 1
    if (nTok < 3) return null
    val starts = new Array[Int](nTok)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < n) { if (s.getByte(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }; i += 1 }
    val mins = Array.fill(16)(Long.MaxValue)
    var w = 0
    while (w <= nTok - 3) {
      val st = starts(w)
      val en = if (w + 3 < nTok) starts(w + 3) - 1 else n
      val len = en - st
      // Spark's xxhash64(sh, k) is a SEED CHAIN: hash each argument with
      // the previous result as seed, starting from 42 — i.e.
      // hashInt(k, hashBytes(sh, 42)). Mirroring it means ONE string
      // hash + 16 int hashes per shingle (the idiom paid 16 string
      // hashes; bit-identical either way, pinned by ExpressionsSpec)
      val h1 = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + st, len, 42L)
      var k = 0
      while (k < 16) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(k, h1)
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  def minhash_sigs(c: Column): Column =
    GraftColumnBridge.column(MinhashSigsExpr(GraftColumnBridge.expression(c)))

  /** All character 3-grams of a string in one pass — the codegen'd twin
    * of `transform(sequence(1, length(text) - 2), i -> substring(text,
    * i, 3))` (the language-ID family's per-row stage, previously an
    * interpreted lambda). substringSQL implements exactly Spark's
    * `substring` semantics (1-based, codepoint-counting), so the grams
    * are byte-identical to the idiom AND to DuckDB's substring in the
    * t_lang_ngram oracle. NULL under 3 characters — the rows the
    * `length(text) >= 3` guard removed (sequence(1, n-2) descends there).
    */
  def charTrigrams(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = s.numChars()
    if (n < 3) return null
    val out = new Array[AnyRef](n - 2)
    var i = 1
    while (i <= n - 2) {
      out(i - 1) = s.substringSQL(i, 3)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def char_trigrams(c: Column): Column =
    GraftColumnBridge.column(CharTrigramsExpr(GraftColumnBridge.expression(c)))

  def normalize_surface(c: Column): Column =
    GraftColumnBridge.column(NormalizeSurfaceExpr(GraftColumnBridge.expression(c)))
  def case_signature(c: Column): Column =
    GraftColumnBridge.column(CaseSignatureExpr(GraftColumnBridge.expression(c)))
  def winnow_fp(c: Column): Column =
    GraftColumnBridge.column(WinnowFingerprintExpr(GraftColumnBridge.expression(c)))

  /** SQL registration (native expressions, not UDFs). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("pal_normalize_native",
      exprs => NormalizeSurfaceExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("pal_case_signature_native",
      exprs => CaseSignatureExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("pal_winnow_fp",
      exprs => WinnowFingerprintExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("pal_dot",
      exprs => DotProductExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("pal_minhash_sigs",
      exprs => MinhashSigsExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("pal_char_trigrams",
      exprs => CharTrigramsExpr(exprs.head), "built-in")
  }
}

/** See NativeFunctions.charTrigrams. NULL for strings under 3 chars. */
case class CharTrigramsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pal_char_trigrams"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    NativeFunctions.charTrigrams(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
         |  graft.functions.NativeFunctions.charTrigrams($c);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): CharTrigramsExpr =
    copy(child = newChild)
}

/** See NativeFunctions.minhashSigs16. NULL for docs under 3 tokens. */
case class MinhashSigsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pal_minhash_sigs"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    NativeFunctions.minhashSigs16(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
         |  graft.functions.NativeFunctions.minhashSigs16($c);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): MinhashSigsExpr =
    copy(child = newChild)
}

/** Null-strict twin of DotProductExpr (see NativeFunctions
  * .dotProductStrict): NULL on length mismatch or null elements —
  * exactly the HOF aggregate/zip_with semantics, so the optimizer
  * rewrite is semantics-preserving.
  */
case class DotProductStrictExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pal_dot_strict"
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE>, got ${left.dataType} / ${right.dataType}")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeFunctions.dotProductStrict(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.NativeFunctions.dotProductStrict($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductStrictExpr =
    copy(left = newLeft, right = newRight)
}

case class DotProductExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "pal_dot"
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE>, got ${left.dataType} / ${right.dataType}")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeFunctions.dotProduct(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.NativeFunctions.dotProduct($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

trait StringUnaryExpr extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType}")
}

case class NormalizeSurfaceExpr(child: Expression) extends StringUnaryExpr {
  override def prettyName: String = "pal_normalize_native"
  override protected def nullSafeEval(input: Any): Any =
    NativeFunctions.normalizeSurface(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeFunctions.normalizeSurface($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeSurfaceExpr =
    copy(child = newChild)
}

case class WinnowFingerprintExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType}")
  override def prettyName: String = "pal_winnow_fp"
  override protected def nullSafeEval(input: Any): Any =
    NativeFunctions.winnowFingerprint(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeFunctions.winnowFingerprint($c)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprintExpr =
    copy(child = newChild)
}

case class CaseSignatureExpr(child: Expression) extends StringUnaryExpr {
  override def prettyName: String = "pal_case_signature_native"
  override protected def nullSafeEval(input: Any): Any =
    NativeFunctions.caseSignature(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeFunctions.caseSignature($c)")
  override protected def withNewChildInternal(newChild: Expression): CaseSignatureExpr =
    copy(child = newChild)
}
