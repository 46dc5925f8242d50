package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch as a custom typed
  * aggregate — the `Aggregator` tier of the Catalyst surface.
  * Literature: Bar-Yossef et al., "Counting distinct elements in a
  * data stream" (RANDOM 2002); the (k−1)/h_k unbiased form follows
  * Beyer et al., "On synopses for distinct-value estimation under
  * multiset operations" (SIGMOD 2007).
  *
  * Unlike Spark's built-in HLL++ (`approx_count_distinct`), the KMV
  * estimator is simple enough to replay exactly in the DuckDB oracle:
  * inputs are pre-hashed to 60-bit keys (the same md5-prefix hash as
  * the document fingerprints, q17/q49), the sketch keeps the k
  * smallest distinct hashes, and the estimate is
  *
  *   n < k        →  n            (sketch saw every distinct value)
  *   otherwise    →  (k-1) · 2^60 / h_(k)
  *
  * with h_(k) the k-th smallest hash. Same doubles on both engines,
  * so the estimate hash-matches bit-for-bit (q58).
  *
  * Scale shape: state is a bounded sorted array (≤ k longs), merge is
  * a sorted-union-truncate — partial aggregation map-side, O(k) per
  * partition at any input size.
  */
object KmvSketch extends Aggregator[Long, Array[Long], Double] {

  val K = 256
  val HashSpace: Double = 1152921504606846976.0 // 2^60

  override def zero: Array[Long] = Array.emptyLongArray

  /** Insert one hash: keep the array sorted, distinct, and ≤ K. */
  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, h)
    if (pos >= 0) b // duplicate hash
    else {
      val ins = -pos - 1
      if (b.length >= K && ins >= K) b // larger than the current k-th
      else {
        val keep = math.min(b.length + 1, K)
        val out = new Array[Long](keep)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, keep - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // sorted-union with dedup, truncated to K
    val out = new Array[Long](math.min(a.length + b.length, K))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) {
          val v = a(i); i += 1
          if (j < b.length && b(j) == v) j += 1 // dedup equal heads
          v
        } else { val v = b(j); j += 1; v }
      out(n) = take; n += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(b: Array[Long]): Double =
    if (b.length < K) b.length.toDouble
    else (K - 1).toDouble * HashSpace / b(K - 1).toDouble

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column function: KMV estimate over a pre-hashed long column. */
  lazy val kmvDistinct: Column => Column = {
    val u = udaf(KmvSketch)
    (c: Column) => u(c)
  }
}
