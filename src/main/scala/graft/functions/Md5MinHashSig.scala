package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Single-pass PORTABLE MinHash signature — the md5-seeded twin of
  * [[MinHashSig]], for the oracle-gated path: the value of
  * `array((0 until k).map(i => array_min(transform(sh,
  * s => conv(substr(md5(concat(lit(s"i:"), s)), 1, 15), 16, 10)
  * ::long))))` computed in ONE traversal of the shingle array.
  *
  * The higher-order form runs k interpreted transform passes, each
  * materializing a k-th hash array, concatenating a fresh
  * `"i:" + s` string per element, hex-encoding the digest, and
  * re-parsing 15 hex chars; this kernel digests prefix bytes and
  * shingle bytes directly (same MD5 input, no concatenation or hex
  * round-trip — the [[Md5Prefix60]] trick) and tracks all k minima
  * in place. The md5 calls themselves are irreducible — the seed
  * prefix changes byte 0, so no digest state can be shared — which
  * bounds the win at the interpretation/materialization overhead.
  *
  * Null semantics mirror the HOF form exactly: `concat` of a null
  * shingle is null, `md5(null)` is null, and `array_min` skips
  * nulls — so null elements contribute to NO seed, and a signature
  * over only-null (or no) elements is an array of nulls.
  * Md5MinHashSigSpec pins bit-equality against the HOF twin.
  */
case class Md5MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_minhash_sig expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    Md5MinHashSig.compute(v.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode
  ): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a =>
        s"${ev.value} = graft.functions.Md5MinHashSig.compute($a, $numHashes);"
    )

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override def prettyName: String = "md5_minhash_sig"
}

object Md5MinHashSig {

  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** UTF-8 bytes of "0:", "1:", … cached per k. */
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()

  private def prefixes(k: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(
      k,
      k2 =>
        Array.tabulate(k2)(i =>
          (i.toString + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    )

  /** One pass over the shingles, all k 60-bit minima at once. Called
    * from generated code — must stay a simple static-shaped method.
    */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val pfx = prefixes(k)
    val md = digests.get()
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // null shingles hash to null in the HOF form and are skipped
      // by array_min — contribute to no seed
      if (!arr.isNullAt(i)) {
        any = true
        val s = arr.getUTF8String(i).getBytes
        var j = 0
        while (j < k) {
          md.reset()
          md.update(pfx(j))
          md.update(s)
          val d = md.digest()
          // first 15 hex chars = top 60 bits (the Md5Prefix60 load)
          var u = 0L
          var b = 0
          while (b < 8) { u = (u << 8) | (d(b) & 0xffL); b += 1 }
          val h = u >>> 4
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](k)(null))
    else new GenericArrayData(mins)
  }

  def md5MinhashSig(sh: Column, numHashes: Int): Column =
    ColumnBridge.column(Md5MinHashSig(ColumnBridge.expression(sh), numHashes))
}
