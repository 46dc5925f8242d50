package graft.plans

import graft.functions.ArrayIntersectSize
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Optimizer rule: collapse `size(array_intersect(a, b))` over string
  * arrays into the single-pass counting kernel
  * [[graft.functions.ArrayIntersectSize]] — the Jaccard verify shape
  * the dedup family evaluates per candidate pair (twice per Jaccard:
  * numerator and the union denominator). The built-in pair
  * materializes the matched-element ARRAY only to take its length;
  * the kernel counts hash probes and allocates no array.
  *
  * Scope guards, each required for observational purity:
  *   - both inputs `array<string>` (the shingle-set case; other
  *     element types keep the built-in),
  *   - non-legacy size semantics only (`legacySizeOfNull = false` —
  *     legacy `size(null) = -1` differs from the kernel's null-out).
  *
  * Fourth injected rule, next to [[Md5PrefixRewrite]],
  * [[VecSqDistRewrite]] and [[VecDotRewrite]].
  */
object ArrayIntersectSizeRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ai: ArrayIntersect, false)
          if ((ai.left.dataType, ai.right.dataType) match {
            case (ArrayType(StringType, _), ArrayType(StringType, _)) => true
            case _ => false
          }) =>
        ArrayIntersectSize(ai.left, ai.right)
    }
}
