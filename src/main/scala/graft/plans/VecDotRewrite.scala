package graft.plans

import graft.functions.VectorDot
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast,
  Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: strength-reduce the dot-product higher-order fold
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0,
  *     (acc, v) -> acc + v) }}}
  *
  * (with the float→double widening casts the HOF inserts) into the
  * codegen'd [[VectorDot]] primitive loop — the sibling of
  * [[VecSqDistRewrite]] for cosine/dot scans. Observationally pure:
  * [[VectorDot]] nulls on length mismatch / null elements exactly
  * like the zip_with padding + null fold, and accumulates the
  * identical left-to-right double sum.
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case Cast(inner: NamedLambdaVariable, DoubleType, _, _) =>
        inner.exprId == v.exprId
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(
              xs,
              ys,
              LambdaFunction(
                Multiply(mx, my, _),
                Seq(a: NamedLambdaVariable, b: NamedLambdaVariable),
                _
              )
            ),
            Literal(0.0, DoubleType),
            LambdaFunction(
              Add(accE, vE, _),
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable),
              _
            ),
            LambdaFunction(finishE, Seq(f: NamedLambdaVariable), _)
          )
          if isVar(mx, a) && isVar(my, b) &&
            isVar(accE, acc) && isVar(vE, v) && isVar(finishE, f) &&
            ((xs.dataType, ys.dataType) match {
              case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => true
              case _ => false
            }) =>
        VectorDot(xs, ys)
    }
}
