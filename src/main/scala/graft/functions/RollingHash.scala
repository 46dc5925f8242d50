package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial rolling hash over a string column — the
  * classic document fingerprint (h = fold(h·31 + c) mod 1e9+7 over
  * UTF-16 units, left to right). A cheap, order-sensitive content id:
  * unlike md5 it streams in one pass with no allocation, and prefix
  * hashes of a growing document are incrementally updatable.
  *
  * The DuckDB oracle mirrors the same fold via
  * list_reduce(list_prepend(0, codepoints)) — identical for ASCII
  * inputs (UTF-16 unit == codepoint below U+10000).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  val Base = 31L
  val Mod = 1000000007L

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"rolling_hash expects a string, got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * Base + s.charAt(i)) % Mod
      i += 1
    }
    h
  }

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode
  ): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => {
        val s = ctx.freshName("s")
        val h = ctx.freshName("h")
        val i = ctx.freshName("i")
        s"""
           |String $s = $c.toString();
           |long $h = 0L;
           |for (int $i = 0; $i < $s.length(); $i++) {
           |  $h = ($h * ${Base}L + $s.charAt($i)) % ${Mod}L;
           |}
           |${ev.value} = $h;
         """.stripMargin
      }
    )

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  def rollingHash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
}
