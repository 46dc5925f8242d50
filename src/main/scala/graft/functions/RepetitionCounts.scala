package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused repetition counts for the Gopher-style filters: token count,
  * distinct-token count, bigram count, distinct-bigram count — one
  * tokenization pass with two hash sets, versus the column form's
  * tokenize + bigram-build + two `array_distinct` HOF passes.
  * Literature: the duplicate-n-gram-fraction quality filters of Rae
  * et al., "Scaling Language Models: Methods, Analysis & Insights
  * from Training Gopher" (2021), §A.1.1.
  *
  * Integer counts only; the duplicate fractions, rounding, and the
  * keep/drop thresholds stay in Catalyst
  * ([[RepetitionCounts.repetitionFromCounts]]) with exactly
  * `TextAnalysis.repetitionStats`'s expression shapes, so equality is
  * structural. Bigrams are adjacent-token pairs joined by one space,
  * matching the column `transform` formulation.
  */
case class RepetitionCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionCounts.schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"repetition_counts expects a string, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    RepetitionCounts.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode
  ): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"${ev.value} = graft.functions.RepetitionCounts.compute($a);"
    )

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "repetition_counts"
}

object RepetitionCounts {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct_tokens", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct_bigrams", LongType, nullable = false)
  ))

  /** Called from generated code. */
  def compute(text: UTF8String): InternalRow = {
    val toks = FusedTokenizer.tokens(text)
    if (toks == null)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L, 0L))
    val tokSet = new java.util.HashSet[String]()
    val bgSet = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length) {
      tokSet.add(toks(i))
      if (i < toks.length - 1) bgSet.add(toks(i) + " " + toks(i + 1))
      i += 1
    }
    val n = toks.length.toLong
    new GenericInternalRow(Array[Any](
      n,
      tokSet.size.toLong,
      math.max(n - 1, 0L),
      bgSet.size.toLong
    ))
  }

  def repetitionCounts(text: Column): Column =
    ColumnBridge.column(RepetitionCounts(ColumnBridge.expression(text)))

  /** `TextAnalysis.repetitionStats`'s fraction/threshold shapes over
    * the fused counts.
    */
  def repetitionFromCounts(c: Column): Column = {
    val dupTok = when(c.getField("n_tokens") === 0, 0.0)
      .otherwise(
        lit(1.0) - c.getField("n_distinct_tokens").cast("double") /
          c.getField("n_tokens"))
    val dupBg = when(c.getField("n_bigrams") === 0, 0.0)
      .otherwise(
        lit(1.0) - c.getField("n_distinct_bigrams").cast("double") /
          c.getField("n_bigrams"))
    struct(
      round(dupTok, 6).as("dup_token_frac"),
      round(dupBg, 6).as("dup_bigram_frac")
    )
  }
}
