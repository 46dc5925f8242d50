package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Correlated/nested-subquery workloads through the `spark.sql`
  * surface — the decorrelation coverage: Catalyst must rewrite
  * IN/EXISTS subqueries to semi/anti joins (RewritePredicateSubquery)
  * and plan scalar subqueries as broadcast one-row joins, or these
  * shapes are quadratic at 100 TB. Plan shapes pinned in
  * PlanPropertiesSpec; every query's oracle is near-verbatim the same
  * SQL in DuckDB.
  */
object Subqueries {

  private val tables =
    Seq("customer", "orders", "lineitem", "supplier", "part", "nation")

  /** Registers dir-scoped temp views and builds the query against
    * them: table references are written as `{table}` placeholders in
    * the SQL templates and substituted with the tagged view names —
    * never a bare-token rewrite, so a table name inside a string
    * literal or matching a column alias can't be touched. The tag is
    * a hex digest of the table's ABSOLUTE path (collision-safe where
    * a 32-bit hashCode is not), so two callers on different data
    * dirs in one session can't clobber each other's views; same-dir
    * re-registration is idempotent.
    */
  private def viewTag(dir: String): String = {
    val abs =
      java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString
    java.security.MessageDigest
      .getInstance("SHA-256")
      .digest(abs.getBytes("UTF-8"))
      .take(8)
      .map(b => f"$b%02x")
      .mkString
  }

  private def sql(spark: SparkSession, dir: String, q: String): DataFrame = {
    val tag = viewTag(dir)
    tables.foreach(t =>
      Tables.table(spark, dir, t).createOrReplaceTempView(s"${t}_$tag"))
    spark.sql(
      tables.foldLeft(q)((s, t) => s.replace(s"{$t}", s"${t}_$tag")))
  }

  /** q110 (TPC-H Q13 shape): customer distribution by order count —
    * LEFT OUTER join with an ON-clause filter, then an aggregate of
    * an aggregate. The outer join preserves zero-order customers
    * (c_count = 0 bucket), which an inner join silently drops.
    */
  def customerOrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    sql(spark, dir,
      """SELECT c_count, count(*) AS custdist
         FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
               FROM {customer} c LEFT OUTER JOIN {orders} o
                 ON c.c_custkey = o.o_custkey
                 AND o.o_orderpriority <> '1-URGENT'
               GROUP BY c.c_custkey) t
         GROUP BY c_count"""
    )
  }

  /** q111 (TPC-H Q15 shape): top-revenue suppliers — a scalar
    * subquery (global max over the revenue aggregate) filtering the
    * join of supplier × revenue. Catalyst plans the scalar subquery
    * once and broadcasts the one-row result into the filter.
    */
  def topRevenueSupplier(spark: SparkSession, dir: String): DataFrame = {
    sql(spark, dir,
      """WITH rev AS (
           SELECT l_suppkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
           FROM {lineitem} GROUP BY l_suppkey)
         SELECT s.s_suppkey, s.s_name, r.total_rev
         FROM {supplier} s JOIN rev r ON s.s_suppkey = r.l_suppkey
         WHERE r.total_rev = (SELECT max(total_rev) FROM rev)"""
    )
  }

  /** q112 (TPC-H Q20 shape): suppliers whose shipped quantity exceeds
    * the per-supplier average — a nested aggregate subquery inside an
    * IN predicate. RewritePredicateSubquery turns the IN into a left
    * semi join; the inner scalar average is one broadcast row.
    */
  def aboveAverageSuppliers(spark: SparkSession, dir: String): DataFrame = {
    sql(spark, dir,
      """SELECT s_suppkey, s_name FROM {supplier}
         WHERE s_suppkey IN (
           SELECT l_suppkey FROM {lineitem} GROUP BY l_suppkey
           HAVING sum(l_quantity) > (
             SELECT avg(qty) FROM (
               SELECT sum(l_quantity) AS qty
               FROM {lineitem} GROUP BY l_suppkey) q))"""
    )
  }

  /** q117 (TPC-H Q21 shape): customers with an urgent order but never
    * a low-priority one — EXISTS and NOT EXISTS correlated on the
    * same table, decorrelated into one semi and one anti join.
    */
  def urgentOnlyCustomers(spark: SparkSession, dir: String): DataFrame = {
    sql(spark, dir,
      """SELECT c.c_mktsegment AS segment, count(*) AS n_customers
         FROM {customer} c
         WHERE EXISTS (SELECT 1 FROM {orders} o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderpriority = '1-URGENT')
           AND NOT EXISTS (SELECT 1 FROM {orders} o2
                           WHERE o2.o_custkey = c.c_custkey
                             AND o2.o_orderpriority = '5-LOW')
         GROUP BY c.c_mktsegment"""
    )
  }

  /** q118 (TPC-H Q2 shape): cheapest supplier per part — a correlated
    * scalar MIN per outer row, decorrelated by Catalyst into an
    * aggregate joined back on the correlation key. min() (exact on
    * doubles, order-independent) keeps the equality engine-portable
    * where avg() would not be.
    */
  def cheapestSupplierPerPart(spark: SparkSession, dir: String): DataFrame = {
    sql(spark, dir,
      """WITH ps AS (
           SELECT l_partkey, l_suppkey, min(l_extendedprice) AS min_price
           FROM {lineitem} GROUP BY 1, 2)
         SELECT p.p_partkey, s.s_name, round(ps.min_price, 2) AS best_price
         FROM {part} p
         JOIN ps ON p.p_partkey = ps.l_partkey
         JOIN {supplier} s ON s.s_suppkey = ps.l_suppkey
         WHERE p.p_partkey < 100
           AND ps.min_price = (SELECT min(x.min_price) FROM ps x
                               WHERE x.l_partkey = p.p_partkey)"""
    )
  }

  /** q113 (TPC-H Q22 shape): well-funded customers with no urgent
    * order — a scalar subquery (positive-balance average) AND a
    * NOT EXISTS anti join with a correlated extra predicate,
    * aggregated per market segment.
    */
  def idleRichCustomers(spark: SparkSession, dir: String): DataFrame = {
    sql(spark, dir,
      """SELECT c.c_mktsegment AS segment, count(*) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
         FROM {customer} c
         WHERE c.c_acctbal > (
             SELECT avg(c_acctbal) FROM {customer} WHERE c_acctbal > 0.0)
           AND NOT EXISTS (
             SELECT 1 FROM {orders} o WHERE o.o_custkey = c.c_custkey
               AND o.o_orderpriority = '1-URGENT')
         GROUP BY c.c_mktsegment"""
    )
  }
}
