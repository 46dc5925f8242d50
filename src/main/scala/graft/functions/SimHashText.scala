package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused in-row SimHash: text → n-bit signature in one pass, no
  * explode, no shuffle.
  *
  * The column formulation (q23/q37 shape) explodes tokens and
  * aggregates per-bit votes with a groupBy — a shuffle of |tokens|
  * rows per document. This expression computes the same majority vote
  * inside the row (token multiplicity counts, ties → 0 bit, token
  * hash = Spark's `xxhash64(token)`, i.e. seed 42), so at 100 TB the
  * whole SimHash pass is a narrow map over the scan. Tokenization
  * replays the engine's column semantics (space-only trim, Java
  * `(?U)\s+` split). Null for documents with no tokens — mirroring
  * the explode form, where tokenless docs produce no row.
  *
  * SimHashTextSpec proves the fusion bit-identical to the
  * explode+groupBy formulation; the gated queries keep the portable
  * md5 construction the DuckDB oracle mirrors.
  */
case class SimHashText(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 64, "bits in [1, 64]")

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_text expects a string, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    SimHashText.compute(v.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode
  ): ExprCode = {
    val boxed = ctx.freshName("sh")
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"""
        |Long $boxed = graft.functions.SimHashText.compute($a, $bits);
        |if ($boxed == null) {
        |  ${ev.isNull} = true;
        |} else {
        |  ${ev.value} = $boxed.longValue();
        |}
       """.stripMargin
    )
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "simhash_text"
}

object SimHashText {

  /** Boxed so generated code can branch on null (no tokens). */
  def compute(text: UTF8String, bits: Int): java.lang.Long = {
    val toks = FusedTokenizer.tokens(text)
    if (toks == null) return null
    val votes = new Array[Int](bits)
    var i = 0
    while (i < toks.length) {
      val s = UTF8String.fromString(toks(i))
      val h = XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  def simhashText(text: Column, bits: Int): Column =
    ColumnBridge.column(SimHashText(ColumnBridge.expression(text), bits))
}
