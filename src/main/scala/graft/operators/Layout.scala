package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Z-order (Morton-curve) data layout — multi-dimensional clustering
  * so parquet min/max file statistics prune on *either* predicate
  * column (Morton, "A computer oriented geodetic data base", IBM 1966;
  * the technique behind Delta Lake's `OPTIMIZE ZORDER BY`).
  *
  * A sort by (a, b) gives perfect skipping on `a` and none on `b`;
  * range-partitioning by the interleaved z-value gives every file a
  * tight bounding rectangle in (a, b) space, so scans with a predicate
  * on either column skip most files. At 100 TB the layout pass is one
  * range shuffle on an 8-byte key — the cheapest possible global
  * reorganization.
  */
object Layout {

  /** Bit-interleave two already-normalized non-negative ints
    * (`bits` bits each) into a 2·bits-wide Morton code: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. Pure long
    * arithmetic — codegen'd, and replayable in any SQL dialect with
    * shift/and operators.
    */
  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits)
      .map { i =>
        shiftleft(shiftright(a, i).bitwiseAND(1), 2 * i) +
          shiftleft(shiftright(b, i).bitwiseAND(1), 2 * i + 1)
      }
      .reduce(_ + _)

  /** Scale a column into [0, 2^bits) against broadcast global
    * min/max: floor((x − mn) / (mx − mn + 1) · 2^bits). Monotone, so
    * z-locality in code space is locality in value space.
    */
  def normalize(x: Column, mn: Column, mx: Column, bits: Int): Column =
    floor(
      (x - mn).cast("double") / (mx - mn + 1).cast("double") * (1 << bits)
    ).cast("long")

  /** q98: z-order the orders table on (o_custkey, o_orderdate) into 16
    * Morton buckets (top-4 z bits = the file boundaries a writer would
    * range-partition on) and report each bucket's bounding rectangle —
    * the per-file min/max stats that make two-dimensional data
    * skipping work. Every bucket's extent in BOTH dimensions is ~1/4
    * of the domain: a predicate on either column prunes ~3/4 of the
    * files, where a plain sort prunes on one column only.
    */
  def zorderBuckets(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
          .cast("long")
          .as("day")
      )
    val stats = o.agg(
      min(col("o_custkey")).as("ck_mn"),
      max(col("o_custkey")).as("ck_mx"),
      min(col("day")).as("d_mn"),
      max(col("day")).as("d_mx")
    )
    val zx = normalize(col("o_custkey"), col("ck_mn"), col("ck_mx"), 8)
    val zy = normalize(col("day"), col("d_mn"), col("d_mx"), 8)
    o.crossJoin(broadcast(stats))
      .select(col("o_custkey"), col("day"), zValue(zx, zy, 8).as("z"))
      .groupBy(shiftright(col("z"), 12).as("zbucket"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_custkey")).as("ck_min"),
        max(col("o_custkey")).as("ck_max"),
        min(col("day")).as("day_min"),
        max(col("day")).as("day_max")
      )
  }
}
