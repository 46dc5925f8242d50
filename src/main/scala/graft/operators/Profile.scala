package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset profiling — the corpus-statistics operators a training-data
  * pipeline runs before/after every transform (SURVEY §2.6 extension).
  * One pass per table: every profiled column aggregates in the same
  * scan (Catalyst fuses the aggregates), then the tiny result is
  * reshaped to one row per column.
  */
object Profile {

  /** q34: exact per-column profile of lineitem (min/max/distinct/null
    * counts as strings for a uniform shape). Single scan, partial
    * aggregation, 4-row output.
    */
  def lineitemProfile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val agg = li.agg(
      count(lit(1)).as("n_rows"),
      min(col("l_quantity")).as("qty_min"),
      max(col("l_quantity")).as("qty_max"),
      countDistinct(col("l_quantity")).as("qty_distinct"),
      sum(when(col("l_quantity").isNull, 1).otherwise(0)).cast("long").as("qty_nulls"),
      min(col("l_extendedprice")).as("price_min"),
      max(col("l_extendedprice")).as("price_max"),
      countDistinct(col("l_extendedprice")).as("price_distinct"),
      sum(when(col("l_extendedprice").isNull, 1).otherwise(0)).cast("long").as("price_nulls"),
      min(col("l_returnflag")).as("flag_min"),
      max(col("l_returnflag")).as("flag_max"),
      countDistinct(col("l_returnflag")).as("flag_distinct"),
      sum(when(col("l_returnflag").isNull, 1).otherwise(0)).cast("long").as("flag_nulls"),
      min(col("l_orderkey")).as("okey_min"),
      max(col("l_orderkey")).as("okey_max"),
      countDistinct(col("l_orderkey")).as("okey_distinct"),
      sum(when(col("l_orderkey").isNull, 1).otherwise(0)).cast("long").as("okey_nulls")
    )
    val rows = Seq(
      ("l_quantity", "qty"),
      ("l_extendedprice", "price"),
      ("l_returnflag", "flag"),
      ("l_orderkey", "okey")
    ).map { case (colName, p) =>
      struct(
        lit(colName).as("column_name"),
        col("n_rows").as("n_rows"),
        col(s"${p}_min").cast("string").as("min_value"),
        col(s"${p}_max").cast("string").as("max_value"),
        col(s"${p}_distinct").as("n_distinct"),
        col(s"${p}_nulls").as("n_null")
      )
    }
    agg
      .select(explode(array(rows: _*)).as("p"))
      .select(
        col("p.column_name").as("column_name"),
        col("p.n_rows").as("n_rows"),
        col("p.min_value").as("min_value"),
        col("p.max_value").as("max_value"),
        col("p.n_distinct").as("n_distinct"),
        col("p.n_null").as("n_null")
      )
  }

  /** q42: distribution statistics per group — exact interpolated
    * percentiles, sample stddev, and price/discount correlation. One
    * scan; percentile is the only sort-based aggregate in the engine
    * (per-group sort, partial-merged).
    */
  def distributionStats(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 6).as("qty_p25"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("qty_p50"),
        round(expr("percentile(l_quantity, 0.75)"), 6).as("qty_p75"),
        round(stddev_samp(col("l_extendedprice")), 4).as("price_stddev"),
        round(corr(col("l_extendedprice"), col("l_discount")), 6)
          .as("price_disc_corr")
      )

  /** q35: sketch-based cardinality profile — approx_count_distinct
    * (HyperLogLog++) at three precisions vs the exact count. The scale
    * path for corpus cardinality at 100 TB, where exact distinct is a
    * full shuffle but the sketch is a constant-size mergeable state.
    * No SQL oracle (DuckDB's HLL differs); the exact column anchors a
    * rows-level sanity check and its spec asserts the error bound.
    */
  def cardinalitySketch(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .agg(
        countDistinct(col("l_orderkey")).as("exact"),
        approx_count_distinct(col("l_orderkey")).as("approx_default"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_rsd_1pct"),
        approx_count_distinct(col("l_orderkey"), 0.1).as("approx_rsd_10pct")
      )
}
