package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused language-ID marker counts: one tokenization pass producing
  * the per-language marker-word hit counts (`TextFunctions.langMarkers`
  * order). Integer counts only — the argmax with its deterministic
  * tie-break stays in Catalyst ([[LangCounts.langFromCounts]]), which
  * applies exactly `TextFunctions.langId`'s expression shape, so
  * equality with the column pipeline is structural. The column form
  * runs one interpreted HOF filter per language (five passes).
  */
case class LangCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LangCounts.schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lang_counts expects a string, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    LangCounts.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode
  ): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"${ev.value} = graft.functions.LangCounts.compute($a);"
    )

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "lang_counts"
}

object LangCounts {

  private val langs: Array[String] =
    TextFunctions.langMarkers.map(_._1).toArray

  val schema: StructType =
    StructType(langs.map(l => StructField(s"s_$l", LongType, nullable = false)))

  /** word → language index, from the marker lists (marker words are
    * disjoint across languages except where listed; a word in several
    * lists votes for each — replicated by storing index lists).
    */
  private val markerIndex: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    TextFunctions.langMarkers.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  /** Called from generated code. */
  def compute(text: UTF8String): InternalRow = {
    val counts = new Array[Long](langs.length)
    val toks = FusedTokenizer.tokens(text)
    if (toks != null) {
      var i = 0
      while (i < toks.length) {
        val hit = markerIndex.get(toks(i))
        if (hit != null) {
          var j = 0
          while (j < hit.length) { counts(hit(j)) += 1; j += 1 }
        }
        i += 1
      }
    }
    new GenericInternalRow(counts.map(c => c: Any))
  }

  def langCounts(text: Column): Column =
    ColumnBridge.column(LangCounts(ColumnBridge.expression(text)))

  /** `TextFunctions.langId`'s argmax + deterministic tie-break applied
    * to the fused counts.
    */
  def langFromCounts(counts: Column): Column = {
    val scores = langs.map(l => l -> counts.getField(s"s_$l"))
    val best = greatest(scores.map(_._2): _*)
    scores.foldLeft(when(best <= 0, lit("und"))) { case (acc, (lang, s)) =>
      acc.when(s === best, lit(lang))
    }.otherwise(lit("und"))
  }
}
