package graft.operators

import graft.Tables
import graft.functions.BloomMightContainLong
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Explicit runtime-filter (sketch-pruned semi join) operators.
  *
  * The pattern (Bloom join / sideways information passing — classic
  * in distributed OLAP: Impala/Trino runtime filters, Spark's own
  * `InjectRuntimeFilter` rule): when a large fact table is semi-joined
  * against a selectively-filtered build side, first aggregate the
  * build side's join keys into a Bloom filter (a few hundred KB for
  * millions of keys at 1% fpp), embed it in the plan, and apply it to
  * the fact side in the SCAN stage. At 100 TB the payoff is that the
  * probe side's shuffle (or even its in-memory row stream into a
  * broadcast join) is cut by the filter's selectivity before any join
  * machinery runs — the bloom probe is a per-row hash against a
  * broadcast-sized bitmap, no network. Exactness is restored by the
  * ordinary semi join downstream, which only sees the ~fpp false
  * positives plus the true matches.
  */
object RuntimeFilters {

  /** q76: revenue from lineitems of URGENT orders, bloom-pruned.
    *
    * Build side: orders filtered to `o_orderpriority = '1-URGENT'`
    * (~20% selectivity). Probe side: lineitem, pre-filtered by the
    * bloom BEFORE the semi join, then exact-semi-joined to drop false
    * positives. Result is identical to the plain semi join (the
    * oracle), plan shape is scan → bloom filter → semi join → agg.
    */
  def bloomSemiRevenue(spark: SparkSession, dir: String): DataFrame = {
    val urgentKeys = Tables
      .orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    // One tiny job over the build side: distributed BloomFilterAggregate
    // (mergeable partials), result collected to the driver and embedded
    // in the probe plan as a literal — the same life cycle as a
    // broadcast variable, but it rides inside the expression tree.
    val bloom = urgentKeys.stat.bloomFilter("o_orderkey", 200000L, 0.01)
    val bloomBytes = BloomMightContainLong.serialize(bloom)
    Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_returnflag"),
        col("l_extendedprice"), col("l_discount"))
      .filter(
        BloomMightContainLong.bloomMightContain(bloomBytes, col("l_orderkey")))
      .join(urgentKeys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items")
      )
  }
}
