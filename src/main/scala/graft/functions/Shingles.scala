package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles, fused: one tokenizer pass + one
  * sliding-window pass per row.
  *
  * The higher-order-function form
  * (`array_distinct(transform(sequence(...), i -> concat_ws(element_at
  * (toks, i+1), ...)))`) closes over the whole `tokens()` subtree, and
  * interpreted lambda evaluation re-runs it — trim + `Pattern.compile`
  * + regex split — for EVERY `element_at`, i.e. n re-tokenizations per
  * shingle position (~4 ms/doc at n=5; a 5k-doc corpus pays a minute
  * across the plan's evaluation sites). Here the tokenizer
  * ([[FusedTokenizer]], exact Spark `trim`+`split` semantics) runs
  * once and shingle assembly is a linear scan; first-occurrence order
  * matches `array_distinct`. ShinglesSpec pins bit-equality with the
  * HOF form, element order included.
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"shingles expects a string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    Shingles.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode
  ): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      s => s"${ev.value} = graft.functions.Shingles.compute($s, $n);"
    )

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "shingles"
}

object Shingles {

  private val Empty: ArrayData = new GenericArrayData(Array.empty[Any])

  /** Called from generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = FusedTokenizer.tokens(text)
    if (toks == null || toks.length < n) Empty
    else {
      // LinkedHashSet = array_distinct's keep-first-occurrence order
      val seen = new java.util.LinkedHashSet[String]((toks.length - n + 1) * 2)
      var i = 0
      while (i <= toks.length - n) {
        val sb = new java.lang.StringBuilder
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(i + k))
          k += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    }
  }

  def shingles(c: Column, n: Int): Column =
    ColumnBridge.column(Shingles(ColumnBridge.expression(c), n))
}
