package graft.plans

import graft.functions.VectorSqDist
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast,
  Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable,
  Subtract, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Optimizer rule: strength-reduce the squared-distance higher-order
  * fold
  *
  * {{{ aggregate(zip_with(x, c, (a, b) -> (a - b) * (a - b)), 0.0,
  *     (acc, v) -> acc + v) }}}
  *
  * into the codegen'd [[VectorSqDist]] primitive loop. The HOF form
  * is what users write (it is also what the DuckDB oracles mirror as
  * `list_sum(list_transform(list_zip(...)))`); interpreted per
  * element it costs ~10× on an ANN assignment scan. The rewrite is
  * observationally pure: [[VectorSqDist]] nulls on a length mismatch
  * and on null elements — exactly the zip_with padding + null-fold
  * semantics — and accumulates the identical left-to-right double
  * sum (VectorMathSpec pins bit-equality against the fold).
  *
  * Matches both element layouts the engine uses: float vectors
  * compared against double centroids (the `cast(a as double)` the
  * HOF inserts), and double residuals against double codebooks
  * (IVF-PQ). Injected via `GraftExtensions` next to
  * [[Md5PrefixRewrite]] — the same "write portable, run fused"
  * contract as the hash chain.
  */
object VecSqDistRewrite extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  /** (a − b), where a may ride a float→double widening cast. */
  private def isDiff(
      e: Expression,
      a: NamedLambdaVariable,
      b: NamedLambdaVariable
  ): Boolean = e match {
    case Subtract(x, y, _) =>
      val leftOk = isVar(x, a) || (x match {
        case Cast(inner, DoubleType, _, _) => isVar(inner, a)
        case _ => false
      })
      leftOk && isVar(y, b)
    case _ => false
  }

  private def okTypes(l: DataType, r: DataType): Boolean = (l, r) match {
    case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) => true
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(
              xs,
              ys,
              LambdaFunction(
                Multiply(d1, d2, _),
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
          if d1.semanticEquals(d2) && isDiff(d1, a, b) &&
            isVar(accE, acc) && isVar(vE, v) && isVar(finishE, f) &&
            okTypes(xs.dataType, ys.dataType) =>
        VectorSqDist(xs, ys)
    }
}
