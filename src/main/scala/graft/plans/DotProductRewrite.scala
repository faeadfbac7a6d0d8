package graft.plans

import graft.functions.DotProductStrictExpr
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Catalyst optimizer rule (SURVEY.md §4.3 escalation path (c)):
  * rewrites the interpreted higher-order-function dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, z) -> acc + z)
  *
  * into the codegen'd [[DotProductStrictExpr]]. Users (and our own
  * catalog SQL) can keep writing the declarative HOF form; the plan
  * executes one native JVM loop per row instead of interpreting two
  * lambda closures per element. Strict-null semantics are preserved
  * exactly (zip_with pads the shorter array with nulls and any null
  * poisons the sum → NULL; the native strict variant reproduces that).
  *
  * Registered through [[GraftExtensions]] (SparkSessionExtensions), the
  * plugin mechanism a deployment enables with
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isZeroD(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  /** lambda (x, y) -> x * y (either operand order). */
  private def isPairwiseMultiply(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(l: NamedLambdaVariable, r: NamedLambdaVariable, _), args, _)
        if args.length == 2 =>
      val ids = args.map(_.exprId).toSet
      ids == Set(l.exprId, r.exprId)
    case _ => false
  }

  /** lambda (acc, z) -> acc + z (either operand order). */
  private def isPairwiseAdd(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _), args, _)
        if args.length == 2 =>
      val ids = args.map(_.exprId).toSet
      ids == Set(l.exprId, r.exprId)
    case _ => false
  }

  /** finish lambda is the identity (the default for 3-arg aggregate()). */
  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(ZipWith(a, b, mul), zero, merge, finish)
        if isDoubleArray(a) && isDoubleArray(b) && isZeroD(zero) &&
          isPairwiseMultiply(mul) && isPairwiseAdd(merge) && isIdentityFinish(finish) =>
      DotProductStrictExpr(a, b)
  }
}

/** Session-extension entry point: enables the graft optimizer rules and
  * SQL-registers the native expressions for any session created with
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => DotProductRewrite)
  }
}
