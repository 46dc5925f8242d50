package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2 (or a
  * §7.8 extension) expressed over the driver test tables; [[oracleSql]]
  * holds the DuckDB-dialect equivalent for the hash-match gate. Column
  * names are aliased identically on both sides (the driver sorts
  * columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.pricingSummary _),
    "q02_revenue_filter" -> (Relational.revenueFilter _),
    "q03_revenue_by_nation" -> (Relational.revenueByNation _),
    "q04_top_orders" -> (Relational.topOrders _),
    "q05_window_rank" -> (Relational.topOrdersPerCustomer _),
    "q06_distinct_counts" -> (Relational.distinctCounts _),
    "q07_union_merge" -> (Relational.unionMerge _),
    "q08_semi_anti_join" -> (Relational.customerOrderPresence _),
    "q09_status_pivot" -> (Relational.orderStatusPivot _),
    "q10_rollup_revenue" -> (Relational.rollupRevenue _),
    "q11_orders_by_month" -> (Relational.ordersByMonth _),
    "q12_mktsegment_share" -> (Relational.mktsegmentShare _)
  )

  /** DuckDB-dialect oracle for each query (same column aliases). */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 6) AS avg_qty,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",
    "q02_revenue_filter" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
         count(*) AS n_rows
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount BETWEEN 0.03 AND 0.09
           AND l_quantity < 30""",
    "q03_revenue_by_nation" ->
      """SELECT n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",
    "q04_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC
         LIMIT 10""",
    "q05_window_rank" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rk
           FROM orders) t
         WHERE rk <= 3""",
    "q06_distinct_counts" ->
      """SELECT l_returnflag,
         count(DISTINCT l_orderkey) AS n_orders,
         count(DISTINCT l_partkey) AS n_parts,
         count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag""",
    "q07_union_merge" ->
      """SELECT CAST(1 AS INTEGER) AS branch_rank, o_orderkey, o_orderstatus,
                o_totalprice
         FROM orders WHERE o_orderstatus = 'F'
         UNION ALL
         SELECT CAST(2 AS INTEGER) AS branch_rank, o_orderkey, o_orderstatus,
                o_totalprice
         FROM orders WHERE o_orderstatus = 'O'""",
    "q08_semi_anti_join" ->
      """SELECT 'with_orders' AS bucket, c_custkey FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         UNION ALL
         SELECT 'no_orders' AS bucket, c_custkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q09_status_pivot" ->
      """SELECT o_orderpriority,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
         CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
         round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS value_f
         FROM orders GROUP BY o_orderpriority""",
    "q10_rollup_revenue" ->
      """SELECT r_name, n_name,
         round(sum(c_acctbal), 2) AS sum_bal, count(*) AS n
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)""",
    "q11_orders_by_month" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
         FROM orders GROUP BY 1""",
    "q12_mktsegment_share" ->
      """SELECT c_mktsegment, n, round(n * 100.0 / sum(n) OVER (), 1) AS pct
         FROM (SELECT c_mktsegment, count(*) AS n
               FROM customer GROUP BY c_mktsegment) t"""
  )
}
