package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize → shingle → MinHash: text straight to the k-minima
  * signature in one pass, no intermediate token/shingle arrays.
  *
  * Exactly equivalent to
  * `MinHashSig(shingles(text, n), k)` on rows where the shingle set is
  * non-empty (MinHash minima are insensitive to the `array_distinct`
  * in `shingles` — duplicates can't change a minimum). Tokenization
  * replays the engine's column semantics precisely: space-only trim
  * (Spark `trim` strips 0x20 only) then the Java regex `(?U)\s+`
  * split, including its leading-empty-token behavior. Returns null
  * when the doc has fewer than n tokens (the column pipeline filters
  * `size(sh) > 0` before signing — null keeps that contract
  * filterable). MinHashTextSpec proves the fusion bit-identical.
  *
  * This is the 100 TB ingestion shape: the per-document cost is one
  * traversal and k·|shingles| hashes, with zero array allocation
  * churn between the three logical stages.
  */
case class MinHashText(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size n must be >= 1")
  require(numHashes >= 1 && numHashes <= 1024, "numHashes in [1, 1024]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_text expects a string, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    MinHashText.compute(v.asInstanceOf[UTF8String], n, numHashes)

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode
  ): ExprCode = {
    val resultTerm = ctx.freshName("sig")
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"""
        |org.apache.spark.sql.catalyst.util.ArrayData $resultTerm =
        |  graft.functions.MinHashText.compute($a, $n, $numHashes);
        |if ($resultTerm == null) {
        |  ${ev.isNull} = true;
        |} else {
        |  ${ev.value} = $resultTerm;
        |}
       """.stripMargin
    )
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "minhash_text"
}

object MinHashText {

  /** Null when fewer than n tokens (no shingles). Called from
    * generated code.
    */
  def compute(text: UTF8String, n: Int, k: Int): ArrayData = {
    val toks = FusedTokenizer.tokens(text)
    if (toks == null || toks.length < n) return null
    val heads = MinHashSig.seedsFor(k)
    val mins = Array.fill(k)(Long.MaxValue)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var w = 0
      while (w < n) {
        if (w > 0) sb.append(' ')
        sb.append(toks(i + w))
        w += 1
      }
      val s = UTF8String.fromString(sb.toString)
      var j = 0
      while (j < k) {
        val h = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes(), heads(j))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def minhashText(text: Column, n: Int, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashText(ColumnBridge.expression(text), n, numHashes))
}
