package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed global ranking — the scale-safe replacement for
  * `row_number()/ntile()` over an empty window partition (which Spark
  * executes by moving EVERY row to one partition: the classic
  * "No Partition Defined for Window operation" failure mode, fatal at
  * 100 TB).
  *
  * The topology is the standard two-pass total order:
  *   1. `repartitionByRange` on the sort keys (one range shuffle; the
  *      partitioner samples the keys to pick balanced bounds), then
  *      sort within each partition — global order across ordered
  *      partitions, no single-partition stage.
  *   2. `zipWithIndex` — a lightweight count-per-partition job, then
  *      each partition stamps `offset + local index`. Cost is one
  *      extra pass over partition SIZES (longs to the driver), not
  *      data.
  *
  * Exact SQL `ntile(k)` membership is then pure arithmetic on
  * (rank, totalRows) — see [[ntileFromRank]] — so curriculum binning
  * needs no window at all.
  */
object Ranking {

  /** Append a 1-based global `row_number` column ordered by
    * `sortCols`, computed distributed (range shuffle + zipWithIndex),
    * never via a single-partition window.
    */
  def withGlobalRank(
      df: DataFrame,
      sortCols: Seq[Column],
      rankCol: String,
      numPartitions: Int
  ): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    val ranked = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }

  /** Exact SQL-standard `ntile(k)` bucket from a 1-based global rank
    * and the total row count: the first `total % k` buckets hold
    * `total/k + 1` rows, the rest `total/k`. Matches
    * `ntile(k) OVER (ORDER BY ...)` bit-for-bit (spec-pinned against
    * Spark's own window ntile), including the N < k case where each
    * row gets its own bucket.
    */
  def ntileFromRank(rank: Column, total: Column, k: Int): Column = {
    val q = floor(total / k).cast("long")
    val rem = (total % k).cast("long")
    val cut = rem * (q + 1)
    when(rank <= cut, floor((rank - 1) / (q + 1)).cast("long") + 1)
      .otherwise(rem + floor((rank - cut - 1) / q).cast("long") + 1)
      .cast("int")
  }
}
