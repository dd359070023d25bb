package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct

/** Catalyst optimizer rule: rewrite the canonical HOF dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * into the fused codegen [[graft.functions.DotProduct]] kernel. The
  * HOF pair evaluates two INTERPRETED lambdas per element and
  * allocates the zipped intermediate array per row; the kernel is one
  * whole-stage-codegen loop with neither — so a user who writes the
  * textbook formulation (it is what Spark's own docs suggest for a dot
  * product) gets kernel speed without knowing the library function
  * exists.
  *
  * Semantics preservation, exactly:
  *   - length mismatch: zip_with null-pads the shorter side, the null
  *     poisons the sum → NULL; DotProduct returns NULL on mismatch by
  *     contract;
  *   - null elements: a null poisons the HOF fold → NULL; DotProduct
  *     returns NULL on any null element by contract (the per-element
  *     test is emitted only for nullable-element children);
  *   - float math: DotProduct multiplies-and-adds left-to-right in
  *     IEEE double, bit-identical to the sequential fold.
  * The zero literal must be exactly 0.0D and the lambdas the plain
  * (x*y) / (acc+v) shapes (either operand order); anything else is
  * left untouched.
  *
  * Injected by [[graft.GraftExtensions]] (injectOptimizerRule) and by
  * `GraftExtensions.registerAll` (experimental.extraOptimizations) —
  * both run after the main optimizer batches, so constant folding has
  * already normalized the zero literal.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  /** body is `p * q` or `p + q` over exactly the two lambda variables,
    * in either order.
    */
  private def usesBoth(l: Expression, r: Expression,
      a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    (sameVar(l, a) && sameVar(r, b)) || (sameVar(l, b) && sameVar(r, a))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(Multiply(ml, mr, _),
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(al, ar, _),
            Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(fa: NamedLambdaVariable), _))
        if isDoubleArray(l) && isDoubleArray(r) &&
          usesBoth(ml, mr, zx, zy) && usesBoth(al, ar, acc, v) &&
          fin.exprId == fa.exprId =>
        DotProduct(l, r)
    }
}
