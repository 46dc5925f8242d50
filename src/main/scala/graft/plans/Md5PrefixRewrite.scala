package graft.plans

import graft.functions.Md5Prefix60
import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}

/** Optimizer rule: rewrite the composed portable 60-bit content hash
  *
  * {{{ cast(conv(substring(md5(cast(s as binary)), 1, 15), 16, 10) as bigint) }}}
  *
  * into the fused [[Md5Prefix60]] expression. The composed form is
  * what the engine's DuckDB-replayable oracles mirror and what users
  * write when porting SQL from other engines; the fused expression
  * computes the identical value (first 8 digest bytes >>> 4) without
  * materializing the 32-char hex string or re-parsing it base-16 —
  * 2.7× per row (Md5Prefix60Spec pins bit-equality, so the rewrite is
  * observationally pure; null propagation is identical since every
  * step of the chain is null-intolerant).
  *
  * Injected via `GraftExtensions` (`injectOptimizerRule`) so any
  * session on the cluster gets the rewrite for SQL and DataFrame
  * plans alike — the Catalyst-idiomatic way to ship an engine-level
  * strength reduction.
  */
object Md5PrefixRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Cast(
            Conv(
              Substring(
                Md5(Cast(inner, BinaryType, _, _)),
                Literal(1, IntegerType),
                Literal(15, IntegerType)
              ),
              Literal(16, IntegerType),
              Literal(10, IntegerType),
              _
            ),
            LongType,
            _,
            _
          ) if inner.dataType == StringType =>
        Md5Prefix60(inner)
    }
}
