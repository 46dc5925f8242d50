package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(bloomBytes, key)` — membership probe against a
  * serialized `org.apache.spark.util.sketch.BloomFilter`, the
  * engine's runtime-filter primitive for semi-join pruning: build the
  * sketch over the small (build) side's join keys, embed it in the
  * plan as a literal, and filter the large (probe) side *in its scan
  * stage*, before any shuffle or join materializes the rows. False
  * positives are then removed by the exact semi join that follows, so
  * the composed operator stays exact while the probe side's shuffle
  * volume drops by the filter's selectivity. This is the same
  * plan shape Spark's adaptive runtime bloom filters inject
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), expressed as
  * an explicit library operator so it applies regardless of when
  * statistics become available.
  *
  * The bloom expression must be foldable: the filter is deserialized
  * ONCE per plan (lazily, on first use) and shared via a codegen
  * reference object — never per row and never per batch.
  */
case class BloomMightContainLong(bloomExpr: Expression, valueExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = bloomExpr
  override def right: Expression = valueExpr

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (bloomExpr.dataType, valueExpr.dataType) match {
      case (BinaryType, LongType) if bloomExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) =>
        TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain requires a foldable (literal) bloom argument")
      case (b, v) =>
        TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain expects (binary, bigint), got ($b, $v)")
    }

  @transient private lazy val bloom: BloomFilter = {
    val bytes = bloomExpr.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any =
    if (bloom == null) null
    else {
      val v = valueExpr.eval(input)
      if (v == null) null
      else java.lang.Boolean.valueOf(bloom.mightContainLong(v.asInstanceOf[Long]))
    }

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode
  ): ExprCode =
    if (bloom == null) {
      ev.copy(code =
        code"""boolean ${ev.isNull} = true;
               boolean ${ev.value} = false;""")
    } else {
      val bloomRef =
        ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
      val v = valueExpr.genCode(ctx)
      ev.copy(code =
        code"""${v.code}
               boolean ${ev.isNull} = ${v.isNull};
               boolean ${ev.value} = false;
               if (!${ev.isNull}) {
                 ${ev.value} = $bloomRef.mightContainLong(${v.value});
               }""")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(bloomExpr = newLeft, valueExpr = newRight)

  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContainLong {

  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Column API: probe `value` (bigint) against a serialized bloom. */
  def bloomMightContain(bloomBytes: Array[Byte], value: Column): Column =
    ColumnBridge.column(
      BloomMightContainLong(
        Literal(bloomBytes, BinaryType),
        ColumnBridge.expression(value)))
}
