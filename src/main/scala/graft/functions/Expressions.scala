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
  }
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
