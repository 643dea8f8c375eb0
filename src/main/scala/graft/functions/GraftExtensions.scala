package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrite the natural higher-order-function dot
  * product idiom
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) }}}
  * into the native codegen [[DotProduct]] expression.
  *
  * HOF lambdas are CodegenFallback — every row pays interpreted
  * dispatch per element plus an intermediate array — while DotProduct
  * fuses into whole-stage codegen (measured ~4× on the pair-similarity
  * scan). The rewrite is semantics-exact for EVERY input: DotProduct
  * sums in the same sequential left-to-right order the HOF pipeline
  * does, IEEE-754 double multiply/add are commutative in their
  * operands, and DotProduct deliberately mirrors the idiom's edge
  * cases — unequal lengths → null (zip_with pads the shorter side with
  * null, nulling the aggregate) and any null element → null (pinned in
  * ExtensionsSpec).
  *
  * Wired two ways: [[GraftExtensions]] (`spark.sql.extensions=`
  * `graft.functions.GraftExtensions`) for sessions we don't build, and
  * [[VectorExpressions.register]] (experimental.extraOptimizations)
  * for the ones we do.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  /** x*y (either operand order) over exactly the two zip variables. */
  private def isCrossProduct(f: Expression, la: NamedLambdaVariable,
      lb: NamedLambdaVariable): Boolean = f match {
    case Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _) =>
      (x.exprId == la.exprId && y.exprId == lb.exprId) ||
        (x.exprId == lb.exprId && y.exprId == la.exprId)
    case _ => false
  }

  private def isAccumulate(f: Expression, acc: NamedLambdaVariable,
      elem: NamedLambdaVariable): Boolean = f match {
    case Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _) =>
      (x.exprId == acc.exprId && y.exprId == elem.exprId) ||
        (x.exprId == elem.exprId && y.exprId == acc.exprId)
    case _ => false
  }

  private object HofDot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(mult, Seq(la: NamedLambdaVariable,
              lb: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(merge, Seq(acc: NamedLambdaVariable,
            elem: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable,
            Seq(finArg: NamedLambdaVariable), _))
          if isCrossProduct(mult, la, lb) && isAccumulate(merge, acc, elem) &&
            fin.exprId == finArg.exprId &&
            Seq(a, b).forall(_.dataType match {
              case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
              case _ => false
            }) =>
        Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case HofDot(a, b) => DotProduct(a, b)
    }
}

/** `SparkSessionExtensions` hook: gives any session built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` the
  * `graft_dot` function and the HOF-dot optimizer rewrite without
  * calling [[VectorExpressions.register]] — the injection path for
  * clusters where graft is a library on the classpath rather than the
  * application. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      VectorExpressions.dotBuilder))
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}
