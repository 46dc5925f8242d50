package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table layout (SURVEY §4 / builder prompt: "bucketing for
  * co-located joins"). Writing both sides of a recurring join
  * bucketed+sorted by the join key lets Spark plan a sort-merge join
  * with NO exchange and NO sort — at 100 TB this converts the
  * dominant shuffle of every downstream join/aggregation on that key
  * into a metadata lookup.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted external table at
    * `path`, registered as `table` in the session catalog.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      key: String,
      numBuckets: Int
  ): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planned
    * shuffle-free when bucket counts match.
    */
  def bucketedJoin(
      spark: SparkSession,
      left: String,
      right: String,
      key: String
  ): DataFrame =
    spark.table(left).join(spark.table(right), key)


  /** q152: the recurring orders⋈lineitem join off a BUCKETED lake —
    * the layout decision that matters most at 100 TB: both fact
    * tables are written `bucketBy(8, "okey").sortBy("okey")`, so the
    * sort-merge join is planned with NO shuffle exchange and (single
    * file per bucket) no sort — the dominant cost of every downstream
    * join/agg on the order key becomes a per-bucket streaming merge.
    * The only exchange left in the whole plan is the final tiny
    * per-priority aggregate (pinned in PlanPropertiesSpec).
    *
    * The lake lives under a per-(process, sf) temp path with a
    * shutdown-hook cleanup (the q107 convention); the write happens
    * once per process and is idempotent across invocations.
    */
  def bucketedRevenueByPriority(spark: SparkSession, dir: String): DataFrame = {
    // the memo key carries the applicationId: saveAsTable metadata
    // lives in the session catalog, which dies with the
    // SparkContext — a suite that stop()s and recreates the context
    // (the extension specs) would otherwise leave LayoutOnce
    // believing tables exist that the fresh catalog cannot resolve
    val appKey = s"$dir#${spark.sparkContext.applicationId}"
    val h = math.abs(appKey.hashCode.toLong)
    val (ot, lt) = (s"graft_orders_b$h", s"graft_lineitem_b$h")
    LayoutOnce.ensure("graft-buckets", appKey) { base =>
      // repartition(8, okey) uses the same hash spec as the bucket
      // layout, so every bucket lands in exactly ONE file — which is
      // what lets the scan report itself sorted and drop the SMJ's
      // per-side Sort as well as the Exchange
      writeBucketed(
        spark.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
          .repartition(8, col("okey")),
        ot, s"$base/orders", "okey", 8)
      writeBucketed(
        spark.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey").as("okey"),
            col("l_extendedprice"), col("l_discount"))
          .repartition(8, col("okey")),
        lt, s"$base/lineitem", "okey", 8)
    }: Unit
    spark.table(lt)
      .hint("merge")
      .join(spark.table(ot), "okey")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
  }
}
