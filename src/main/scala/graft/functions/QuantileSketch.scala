package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable bottom-k rank/quantile sketch as a custom typed
  * aggregate — the quantile entry on the sketch shelf next to KMV
  * (F₀, q58), CMS (point frequency, q92), AMS (F₂, q317) and HLL
  * (q35). Literature: the bottom-k sample is Cohen & Kaplan,
  * "Summarizing data using bottom-k sketches" (PODC 2007); using an
  * order-statistics sample for quantile estimation is the classic
  * uniform-sample bound (Manku/Rajagopalan/Lindsay, SIGMOD 1998 §2;
  * Hoeffding on the sampled ranks gives ±n·O(1/√k) rank error with
  * high probability).
  *
  * Why bottom-k and not KLL/GK: those compactors decide what to drop
  * based on ARRIVAL ORDER (fill → compact), so the final sketch
  * depends on partition boundaries and merge order — fine for error
  * bounds, fatal for this repo's exactness contract (the DuckDB
  * oracle must replay the sketch bit-for-bit, and a Spark shuffle
  * must not change the answer run-to-run). The bottom-k sample is
  * the order-free compactor: keep the k pairs with the smallest
  * (hash, value); that set is a pure function of the input MULTISET,
  * so reduce/merge satisfy the exact merge law
  * merge(sk(A), sk(B)) = sk(A ⊎ B) (spec-pinned), map-side partial
  * aggregation is lossless, and the oracle replays it as
  * ORDER BY (hash, value) LIMIT k. The hash is the row key's 60-bit
  * md5 prefix (hash60, the q58 convention) — a deterministic uniform
  * draw, so the sample is uniform over rows.
  *
  * State is two bounded sorted arrays (≤ k pairs) per group; merge is
  * a sorted-union-truncate — O(k) per partition at any input size,
  * the 100 TB shape. `finish` returns the sampled VALUES sorted
  * ascending; quantile q of the group is element ⌈q·j⌉ of that array
  * (j = sample size), exact whenever the group fits in k.
  */
object QuantileSketch
    extends Aggregator[(Long, Long), (Array[Long], Array[Long]), Array[Long]] {

  val K = 256

  override def zero: (Array[Long], Array[Long]) =
    (Array.emptyLongArray, Array.emptyLongArray)

  /** First index at which (h, v) sorts strictly before the pair —
    * equal pairs insert AFTER their twins (duplicates are kept:
    * the sketch samples rows, and identical pairs are
    * interchangeable, so the kept multiset is still well-defined).
    */
  private def insertAt(
      hs: Array[Long],
      vs: Array[Long],
      h: Long,
      v: Long
  ): Int = {
    var lo = 0
    var hi = hs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (hs(mid) < h || (hs(mid) == h && vs(mid) <= v)) lo = mid + 1
      else hi = mid
    }
    lo
  }

  override def reduce(
      b: (Array[Long], Array[Long]),
      in: (Long, Long)
  ): (Array[Long], Array[Long]) = {
    val (hs, vs) = b
    val (h, v) = in
    val ins = insertAt(hs, vs, h, v)
    if (hs.length >= K && ins >= K) b // beyond the current k-th pair
    else {
      val keep = math.min(hs.length + 1, K)
      val oh = new Array[Long](keep)
      val ov = new Array[Long](keep)
      System.arraycopy(hs, 0, oh, 0, ins)
      System.arraycopy(vs, 0, ov, 0, ins)
      oh(ins) = h
      ov(ins) = v
      System.arraycopy(hs, ins, oh, ins + 1, keep - ins - 1)
      System.arraycopy(vs, ins, ov, ins + 1, keep - ins - 1)
      (oh, ov)
    }
  }

  override def merge(
      a: (Array[Long], Array[Long]),
      b: (Array[Long], Array[Long])
  ): (Array[Long], Array[Long]) = {
    val (ah, av) = a
    val (bh, bv) = b
    val n = math.min(ah.length + bh.length, K)
    val oh = new Array[Long](n)
    val ov = new Array[Long](n)
    var i = 0
    var j = 0
    var k = 0
    while (k < n) {
      val takeA = j >= bh.length ||
        (i < ah.length &&
          (ah(i) < bh(j) || (ah(i) == bh(j) && av(i) <= bv(j))))
      if (takeA) { oh(k) = ah(i); ov(k) = av(i); i += 1 }
      else { oh(k) = bh(j); ov(k) = bv(j); j += 1 }
      k += 1
    }
    (oh, ov)
  }

  /** The sampled values, sorted ascending — quantile q reads element
    * ⌈q·length⌉ (1-based).
    */
  override def finish(b: (Array[Long], Array[Long])): Array[Long] = {
    val out = b._2.clone()
    java.util.Arrays.sort(out)
    out
  }

  override def bufferEncoder: Encoder[(Array[Long], Array[Long])] =
    ExpressionEncoder[(Array[Long], Array[Long])]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  /** Column function: bottom-k value sample over (hash60 key, value). */
  lazy val bottomKValues: (Column, Column) => Column = {
    val u = udaf(QuantileSketch)
    (h: Column, v: Column) => u(h, v)
  }
}
