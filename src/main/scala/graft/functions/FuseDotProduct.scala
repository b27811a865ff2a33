package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrite the built-in dot-product composition
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v) }}}
  *
  * into the fused [[ArrayDotProduct]] codegen expression. The two compute
  * the identical left-to-right IEEE-double fold (the fused form skips the
  * intermediate array and the per-element lambda dispatch), so the rewrite
  * is semantics-preserving, including null behavior: both yield null iff an
  * input array is null, the lengths differ (`zip_with` pads the shorter
  * side with nulls, which poisons the sum), or any element is null —
  * [[ArrayDotProduct]] implements exactly those rules.
  *
  * This is the pattern Catalyst itself uses for fusions: users (and SQL
  * authors, who cannot call library helpers) write the declarative form;
  * the optimizer picks the fast implementation. Registered via
  * [[GraftExtensions]] (`injectOptimizerRule`) for new sessions or
  * `spark.experimental.extraOptimizations` on a live one.
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  private object DotProductPattern {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), _, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(
              Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _), _, _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(finArg: NamedLambdaVariable), _))
          if x.exprId != y.exprId && acc.exprId != v.exprId &&
            fin.exprId == finArg.exprId =>
        Some((a, b))
      case _ => None
    }
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // both sides must already be array<double>: the right side is enforced
      // explicitly (not just via the Multiply pattern failing on an implicit
      // Cast) as defense in depth against analyzer lambda-coercion changes
      case DotProductPattern(a, b) if isDoubleArray(a) && isDoubleArray(b) =>
        ArrayDotProduct(a, b)
    }
}
