package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document text statistics: one pass over the text for the
  * counts every quality filter needs — token count, stopword hits,
  * punctuation count, character count.
  *
  * Deliberately returns ONLY integer counts: all floating-point math
  * (ratios, saturations, rounding) stays in Catalyst via
  * [[TextStats.qualityFromStats]], which applies the exact expression
  * shapes of `TextFunctions.qualityScore` to the counts — so
  * bit-equality with the column pipeline is structural, not a
  * float-parity accident. Tokenization is the shared
  * [[FusedTokenizer]] (Spark trim+split semantics); character and
  * punctuation counts are code-point counts over the RAW text,
  * matching Spark `length`/`translate`.
  *
  * The column formulation re-tokenizes per metric (three interpreted
  * HOF passes); this is one traversal. TextStatsSpec pins equality.
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStats.schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"text_stats expects a string, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    TextStats.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode
  ): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"${ev.value} = graft.functions.TextStats.compute($a);"
    )

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "text_stats"
}

object TextStats {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false)
  ))

  private val stops: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TextFunctions.stopwordsEn.foreach(s.add)
    s
  }

  /** Called from generated code. */
  def compute(text: UTF8String): InternalRow = {
    val toks = FusedTokenizer.tokens(text)
    var nTokens = 0L
    var nStop = 0L
    if (toks != null) {
      nTokens = toks.length.toLong
      var i = 0
      while (i < toks.length) {
        if (stops.contains(toks(i))) nStop += 1
        i += 1
      }
    }
    // punctuation / char counts over the RAW text, as code points —
    // the punct class is ASCII, so byte matches are code-point matches
    var nPunct = 0L
    val bytes = text.numBytes()
    var b = 0
    while (b < bytes) {
      val c = text.getByte(b)
      if (c == '.' || c == ',' || c == '!' || c == '?' || c == ';' || c == ':')
        nPunct += 1
      b += 1
    }
    new GenericInternalRow(
      Array[Any](nTokens, nStop, nPunct, text.numChars().toLong))
  }

  def textStats(text: Column): Column =
    ColumnBridge.column(TextStats(ColumnBridge.expression(text)))

  /** The qualityScore formula applied to the fused counts — same
    * Catalyst expression shapes, so results are bit-identical to
    * `TextFunctions.qualityScore` on the same document.
    */
  def qualityFromStats(stats: Column): Column = {
    val t = stats.getField("n_tokens").cast("double")
    val lengthTerm = least(t / 200.0, lit(1.0))
    val stopRatio = when(stats.getField("n_tokens") === 0, lit(0.0))
      .otherwise(
        stats.getField("n_stop").cast("double") /
          stats.getField("n_tokens"))
    val stopTerm = least(stopRatio * 5.0, lit(1.0))
    val punctTerm = when(stats.getField("n_chars") === 0, lit(0.0))
      .otherwise(
        stats.getField("n_punct").cast("double") /
          stats.getField("n_chars"))
    round(lit(0.5) * lengthTerm + lit(0.4) * stopTerm +
      lit(0.1) * (lit(1.0) - least(punctTerm * 10.0, lit(1.0))), 6)
  }
}
