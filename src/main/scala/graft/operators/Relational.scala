package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operators (SURVEY.md §2.3, §2.6–§2.8): scans with
  * pushdown, wide aggregations, broadcast joins, semi/anti joins,
  * window functions, top-k, union-merge, rollup.
  *
  * Scale notes (100 TB design stance):
  *  - Dimension tables (nation/region/customer/supplier at TPC-H scale
  *    ratios) are broadcast — no shuffle of the fact table for those
  *    joins.
  *  - Aggregations are expressed as `groupBy().agg()` so Spark plans
  *    partial (map-side) aggregation before the exchange.
  *  - Filters are plain column predicates on the scan so they reach
  *    parquet as PushedFilters; projections are explicit so ReadSchema
  *    stays narrow.
  *  - Top-k uses `orderBy().limit(k)` which Spark executes as
  *    TakeOrderedAndProject: per-partition heaps, no global sort.
  */
object Relational {

  /** Money rounding used on float aggregates so Spark and the DuckDB
    * oracle hash-match despite summation-order differences. 2 decimal
    * digits is far coarser than double accumulation error at these
    * scales.
    */
  private def money(c: Column): Column = round(c, 2)

  /** q01: TPC-H Q1-style pricing summary — wide aggregate, map-side
    * partial agg, tiny result. Ref semantics: SURVEY §2.6 A1/A3/A4.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        money(sum(col("l_quantity"))).as("sum_qty"),
        money(sum(col("l_extendedprice"))).as("sum_base_price"),
        money(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order")
      )

  /** q02: TPC-H Q6-style selective scan+agg — every predicate is
    * parquet-pushable (shipdate range, discount range, quantity bound).
    */
  def revenueFilter(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.03, 0.09) &&
          col("l_quantity") < 30
      )
      .agg(
        money(sum(col("l_extendedprice") * col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_rows")
      )

  /** q03: fact ⋈ dims revenue per nation. customer+orders join on the
    * shuffle; nation is broadcast (25 rows — never shuffle the fact
    * side for it).
    */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        money(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue"),
        count(lit(1)).as("n_items")
      )
  }

  /** q04: top-k with deterministic tie-break → TakeOrderedAndProject
    * (per-partition heap + single merge, no global sort).
    */
  def topOrders(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** q05: window rank — top-3 orders per customer. One shuffle on
    * custkey; deterministic via (totalprice desc, orderkey) ordering.
    */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables
      .orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
  }

  /** q06: distinct aggregation — exact distinct counts per group
    * (SURVEY §2.6 A2 analogue, exact form for the oracle; at 100 TB
    * the approx_count_distinct variant in Profile.scala is the one to
    * reach for).
    *
    * Two distinct aggregates over *different* columns in one agg plan
    * the Expand rewrite — every row replicated once per distinct
    * expression before the shuffle. One branch per distinct column
    * (each a plain two-stage aggregate, partial map-side dedup)
    * joined on the 3-row group key avoids the row multiplication at
    * any scale; the join sides broadcast trivially.
    */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val orders = li
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows")
      )
    val parts = li
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"))
    orders
      .join(parts, Seq("l_returnflag"))
      .select(
        col("l_returnflag"),
        col("n_orders"),
        col("n_parts"),
        col("n_rows")
      )
  }

  /** q07: ordered union-merge (SURVEY §2.8 J1): two branch reads
    * unioned by name with a branch rank carried as an explicit sort
    * key — the reference's "merge files in input order" made
    * shuffle-free (union is a no-shuffle operator).
    */
  def unionMerge(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val a = o
      .filter(col("o_orderstatus") === "F")
      .withColumn("branch_rank", lit(1))
    val b = o
      .filter(col("o_orderstatus") === "O")
      .withColumn("branch_rank", lit(2))
    a.unionByName(b)
      .select(
        col("branch_rank"),
        col("o_orderkey"),
        col("o_orderstatus"),
        col("o_totalprice")
      )
  }

  /** q08: semi/anti join — customers with and without orders.
    * left_semi/left_anti never materialize the probe payload; Spark
    * broadcasts the aggregated key set when small.
    */
  def customerOrderPresence(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey"))
    val withO = c
      .join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(lit("with_orders").as("bucket"), col("c_custkey"))
    val without = c
      .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(lit("no_orders").as("bucket"), col("c_custkey"))
    withO.unionByName(without)
  }

  /** q09: conditional aggregation (manual pivot) — one pass over
    * orders, no shuffle beyond the single groupBy.
    */
  def orderStatusPivot(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p"),
        money(sum(when(col("o_orderstatus") === "F", col("o_totalprice"))
          .otherwise(0.0))).as("value_f")
      )

  /** q10: rollup — hierarchical aggregate (region→nation) in one
    * pass; Spark expands grouping sets before the exchange so it is
    * still a single shuffle.
    */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(money(sum(col("c_acctbal"))).as("sum_bal"), count(lit(1)).as("n"))
  }

  /** q43: cube — all grouping-set combinations of (returnflag,
    * linestatus) in one pass (Expand before the single exchange, like
    * rollup).
    */
  def cubeQuantities(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(money(sum(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("n"))

  /** q68: explicit GROUPING SETS through the SQL surface — the
    * irregular set {(flag, status), (flag), ()} that rollup/cube
    * can't express when the sets aren't a lattice prefix, plus
    * `grouping()` null-vs-subtotal disambiguation. Same single-pass
    * Expand + one exchange physical shape as rollup (q10) and cube
    * (q43).
    */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    // dir-derived view name (the Subqueries.viewTag pattern):
    // concurrent calls on different dirs must not race on a shared
    // session-global view registration
    val tag = java.security.MessageDigest
      .getInstance("SHA-256")
      .digest(
        java.nio.file.Paths
          .get(dir)
          .toAbsolutePath
          .normalize
          .toString
          .getBytes("UTF-8")
      )
      .take(8)
      .map("%02x".format(_))
      .mkString
    val view = s"lineitem_gs_$tag"
    Tables.lineitem(spark, dir).createOrReplaceTempView(view)
    spark.sql(
      s"""SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) * 2 +
        |    CAST(grouping(l_linestatus) AS INT) AS gid,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  count(1) AS n
        |FROM $view
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), ())""".stripMargin
    )
  }

  /** q11: month bucketing (SURVEY §2.4 F2 analytical path —
    * date_trunc over the parsed timestamp).
    */
  def ordersByMonth(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"), money(sum(col("o_totalprice"))).as("sum_price"))

  /** q12: group share percentage (SURVEY §2.4 F10) — per-group count
    * as a fraction of the total via a windowed sum over an empty
    * partition spec. Fine here (single-partition window over an
    * already tiny aggregate), and at scale the input to the window is
    * |groups|, not |rows|.
    */
  def mktsegmentShare(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables
      .customer(spark, dir)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn(
        "share_ppm",
        graft.functions.IntMath
          .microRatio(col("n"), sum(col("n")).over(Window.partitionBy()))
      )
  }

  /** q61: full outer join — per-segment reconciliation of customers
    * with/without orders and orders with/without a known customer
    * (nulls on either side survive). One shuffle pair; AQE picks the
    * physical join.
    */
  def fullOuterReconciliation(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables
      .customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val o = Tables
      .orders(spark, dir)
      .select(col("o_custkey"), col("o_totalprice"))
    c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
      .groupBy(coalesce(col("c_mktsegment"), lit("NO_CUSTOMER")).as("segment"))
      .agg(
        count(col("o_custkey")).as("n_orders"),
        sum(when(col("o_custkey").isNull, 1).otherwise(0))
          .cast("long")
          .as("n_customers_without_orders"),
        money(sum(coalesce(col("o_totalprice"), lit(0.0)))).as("sum_price")
      )
  }

  /** q63: set operations — customers active in both 1995 and 1996
    * (INTERSECT) and only in 1995 (EXCEPT), tagged and unioned. Both
    * are distinct-based set semantics (Spark `intersect`/`except` ≡
    * SQL INTERSECT/EXCEPT), each one shuffle on the key.
    */
  def customerSetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def activeIn(year: Int) =
      o.filter(col("o_orderdate") >= s"$year-01-01" &&
          col("o_orderdate") < s"${year + 1}-01-01")
        .select(col("o_custkey"))
    val y95 = activeIn(1995)
    val y96 = activeIn(1996)
    y95.intersect(y96)
      .select(lit("both_years").as("bucket"), col("o_custkey"))
      .unionByName(
        y95.except(y96)
          .select(lit("only_1995").as("bucket"), col("o_custkey")))
  }

  /** q62: the relational pivot API (`groupBy.pivot.agg`) — the
    * declarative twin of the manual conditional aggregation in q09.
    * Pivot values are listed explicitly so the plan skips the
    * distinct-values pre-query (one pass at scale).
    */
  def statusPivotApi(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(money(sum(col("o_totalprice"))))
      .withColumnsRenamed(Map("F" -> "price_f", "O" -> "price_o", "P" -> "price_p"))

  /** q90: CDC MERGE/upsert apply — fold a keyed change log into a
    * base snapshot: the latest change per key (by the total order
    * (o_orderdate, o_orderkey)) wins; a terminal Delete removes the
    * row, a terminal Upsert replaces the balance, keys without
    * changes pass through. The change log here is derived
    * deterministically from orders (status P ⇒ delete, else upsert
    * of o_totalprice). Topology: the per-key argmax is ONE
    * lexicographic struct-max aggregate (partial map-side — the
    * shuffle carries one candidate per (partition, key), never the
    * log), then a single join against the base. This is the
    * snapshot-maintenance kernel of a lakehouse MERGE INTO at any
    * scale; at 100 TB the join is the only fact-sized exchange and
    * AQE picks its physical form.
    */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val changes = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        struct(
          col("o_orderdate"),
          col("o_orderkey"),
          when(col("o_orderstatus") === "P", "D").otherwise("U").as("op"),
          col("o_totalprice")
        ).as("ch")
      )
      .groupBy(col("o_custkey"))
      .agg(max(col("ch")).as("last"))
      .select(col("o_custkey"), col("last.op").as("op"),
        col("last.o_totalprice").as("new_val"))
    Tables
      .customer(spark, dir)
      .join(changes, col("c_custkey") === col("o_custkey"), "left")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(
        col("c_custkey"),
        round(
          when(col("op") === "U", col("new_val")).otherwise(col("c_acctbal")),
          2
        ).as("balance"),
        when(col("op").isNull, "unchanged").otherwise("updated").as("status")
      )
  }

  /** q122: unpivot (melt) — the inverse reshape of q62's pivot: the
    * wide per-status price columns back to (priority, status, price)
    * rows. Wide→long is a pure in-row Expand (each input row emits
    * one row per value column, no shuffle); the round trip
    * pivot→unpivot is the reshaping pair a feature store needs in
    * both directions.
    */
  def statusUnpivot(spark: SparkSession, dir: String): DataFrame =
    statusPivotApi(spark, dir)
      .unpivot(
        Array(col("o_orderpriority")),
        Array(col("price_f"), col("price_o"), col("price_p")),
        "status_col",
        "price"
      )
      .select(
        col("o_orderpriority"),
        upper(substring(col("status_col"), 7, 1)).as("o_orderstatus"),
        col("price")
      )

  /** q119: the full ranking-window family in one pass — rank,
    * dense_rank, percent_rank, cume_dist, ntile and first_value over
    * one (customer, price) window: one key-shuffle serves all six
    * functions (they share the WindowExec frame). percent_rank and
    * cume_dist are exact rationals of ranks, engine-portable without
    * rounding tricks; rounded to 6 anyway for house style.
    */
  def windowFamily(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val wp = Window.partitionBy(col("o_custkey"))
    Tables
      .orders(spark, dir)
      .filter(col("o_custkey") < 100)
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        // exact ppm twins of percent_rank/cume_dist (round-12 float
        // purge): the (price DESC, orderkey ASC) order is unique per
        // partition, so rank = row_number and cume_dist = rank/n;
        // percent_rank's n = 1 degenerate emits 0 as the SQL spec
        // does.
        when(count(lit(1)).over(wp) === 1L, 0L)
          .otherwise(
            graft.functions.IntMath.microRatio(
              rank().over(w).cast("long") - 1L,
              count(lit(1)).over(wp).cast("long") - 1L
            )
          )
          .as("prnk_ppm"),
        graft.functions.IntMath
          .microRatio(
            rank().over(w).cast("long"),
            count(lit(1)).over(wp).cast("long")
          )
          .as("cdist_ppm"),
        ntile(4).over(w).as("quartile"),
        first_value(col("o_orderkey")).over(w).as("top_order")
      )
  }

  /** q171: join-blowup profile — the pre-flight check a 100 TB job
    * runs BEFORE a self/fact-fact join: per-key frequency stats of
    * the join column and the exact output cardinality the join WOULD
    * produce (Σ c(k)² for a self-join), computed from the per-key
    * count profile alone. A skew factor (max/mean) in the hundreds
    * or an estimate orders of magnitude above the input is the
    * signal to salt, pre-aggregate, or rethink — for the cost of one
    * groupBy instead of the blowup itself.
    */
  def joinBlowupProfile(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables
      .lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("c"))
    // avg rows/key and the skew factor max/avg = max·keys/rows in
    // exact half-up milli — no float division (round-11 float purge)
    counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("c")).as("n_rows"),
      max(col("c")).as("max_per_key"),
      graft.functions.IntMath
        .idivHalfUp(sum(col("c")) * 1000L, count(lit(1)))
        .as("avg_per_key_milli"),
      graft.functions.IntMath
        .idivHalfUp(max(col("c")) * count(lit(1)) * 1000L, sum(col("c")))
        .as("skew_factor_milli"),
      sum(col("c") * col("c")).as("est_selfjoin_rows")
    )
  }

  /** q372: referential-integrity audit across the relational spine —
    * orphaned lineitems (no parent order), childless orders (no
    * lineitems), customers with no orders, and orders referencing a
    * missing customer, each as exact counts with ppm against their
    * own table size. The data-contract check a warehouse runs after
    * every load: silent orphan growth is how a broken upstream join
    * shows up WEEKS before anyone reads a wrong revenue number.
    *
    * Scale: three key-keyed anti-join aggregates (each a broadcast-
    * able or shuffle join on the foreign key — never a scan product);
    * output is 4 rows at any scale.
    */
  def referentialIntegrity(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"))
    val ord = Tables
      .orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"))
    def ratioRow(
        name: String,
        bad: Long,
        total: Long
    ): (String, Long, Long) = (name, bad, total)
    val orphanLi = li
      .join(ord.select(col("o_orderkey")),
        li("l_orderkey") === ord("o_orderkey"), "left_anti")
      .count()
    val nLi = li.count()
    val childless = ord
      .join(li.select(col("l_orderkey")).distinct(),
        ord("o_orderkey") === li("l_orderkey"), "left_anti")
      .count()
    val nOrd = ord.count()
    val orderlessCust = cust
      .join(ord.select(col("o_custkey")).distinct(),
        cust("c_custkey") === ord("o_custkey"), "left_anti")
      .count()
    val nCust = cust.count()
    val danglingOrd = ord
      .join(cust, ord("o_custkey") === cust("c_custkey"), "left_anti")
      .count()
    val rows = Seq(
      ratioRow("lineitem_orphans", orphanLi, nLi),
      ratioRow("childless_orders", childless, nOrd),
      ratioRow("orderless_customers", orderlessCust, nCust),
      ratioRow("dangling_orders", danglingOrd, nOrd)
    )
    import spark.implicits._
    rows
      .toDF("check", "n_bad", "n_total")
      .select(
        col("check"),
        col("n_bad"),
        col("n_total"),
        microRatio(col("n_bad"), col("n_total")).as("bad_ppm")
      )
  }

  /** q396: order-to-first-ship latency profile per priority — per
    * order priority class: order count, exact P50 whole-day delay
    * from order date to the order's FIRST lineitem ship date (type-1
    * rank pick), and the min/max delays. The SLA audit the priority
    * column exists for: if URGENT's median delay matches LOW's, the
    * priority field carries no operational signal. Day offsets are
    * exact integer microsecond differences under FLOOR division
    * (IntMath.floorDiv — this generator emits ship-before-order
    * rows, and truncating division would disagree with DuckDB's
    * flooring `//` on every negative delay).
    *
    * Scale: one per-order min over lineitem (map-side combinable,
    * keyed on l_orderkey — the natural co-partitioning), a fact-to-
    * fact join on the same key, and rank picks windowed by the
    * 5-value priority class.
    */
  def shipLatencyProfile(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.floorDiv
    val firstShip = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), unix_micros(col("l_shipdate").cast("timestamp")).as("su"))
      .groupBy(col("l_orderkey"))
      .agg(min(col("su")).as("first_ship"))
    val delays = Tables
      .orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("ou"))
      .join(firstShip, col("o_orderkey") === col("l_orderkey"))
      .select(
        col("o_orderpriority"),
        col("o_orderkey"),
        floorDiv(col("first_ship") - col("ou"), lit(86400000000L))
          .as("delay_days")
      )
    val w = Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("delay_days").asc, col("o_orderkey").asc)
    delays
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt",
        count(lit(1)).over(Window.partitionBy(col("o_orderpriority"))))
      .groupBy(col("o_orderpriority"))
      .agg(
        max(col("cnt")).as("n_orders"),
        min(col("delay_days")).as("min_delay_days"),
        max(when(col("rn") === ceil(col("cnt") * 50 / 100),
          col("delay_days"))).as("p50_delay_days"),
        max(col("delay_days")).as("max_delay_days")
      )
  }

  /** q398: part sourcing census — parts bucketed by how many distinct
    * suppliers ship them (single-sourced / dual / 4+), with line
    * volumes per band. The supply-concentration audit: single-source
    * parts are the fragile tail of the catalog, and at 100 TB this is
    * the one-pass distinct-count rollup you run before any
    * supplier-failure what-if join.
    *
    * Scale: one (partkey → distinct suppkey) aggregation — map-side
    * partial on (part, supp) then exact distinct per part — and a
    * 3-row band rollup.
    */
  def partSourcingCensus(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val perPart = Tables
      .lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(
        countDistinct(col("l_suppkey")).as("ns"),
        count(lit(1)).as("nl")
      )
    val banded = perPart
      .select(
        when(col("ns") === 1, "1_single")
          .when(col("ns") <= 3, "2_3_dual")
          .otherwise("4_plus_multi").as("supplier_band"),
        col("nl")
      )
      .groupBy(col("supplier_band"))
      .agg(count(lit(1)).as("n_parts"), sum(col("nl")).as("n_lines"))
    val tot = banded.agg(sum(col("n_parts")).as("total_parts"))
    banded
      .crossJoin(broadcast(tot))
      .select(
        col("supplier_band"), col("n_parts"), col("n_lines"),
        microRatio(col("n_parts"), col("total_parts")).as("part_ppm")
      )
  }

  /** q399: order fanout census — orders bucketed by lineitem count
    * (including the 0-line orphans q372 flags), with order and line
    * mass per band. The fact-to-fact join cardinality profile: the
    * 7+ band drives shuffle skew in every orderkey join, and the
    * 0-line band measures how much of the orders scan is dead weight
    * for lineitem-side queries.
    *
    * Scale: one per-order count over lineitem (map-side combinable) +
    * a left join from orders (same orderkey partitioning) + a
    * fixed-band rollup.
    */
  def orderFanoutCensus(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val perOrder = Tables
      .lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("nl"))
    val banded = Tables
      .orders(spark, dir)
      .select(col("o_orderkey"))
      .join(perOrder, col("o_orderkey") === col("l_orderkey"), "left")
      .na
      .fill(0L, Seq("nl"))
      .select(
        when(col("nl") === 0, "0_lines")
          .when(col("nl") <= 3, "1_3_lines")
          .when(col("nl") <= 6, "4_6_lines")
          .otherwise("7_plus_lines").as("fanout_band"),
        col("nl")
      )
      .groupBy(col("fanout_band"))
      .agg(count(lit(1)).as("n_orders"), sum(col("nl")).as("n_lines"))
    val tot = banded.agg(sum(col("n_orders")).as("total_orders"))
    banded
      .crossJoin(broadcast(tot))
      .select(
        col("fanout_band"), col("n_orders"), col("n_lines"),
        microRatio(col("n_orders"), col("total_orders"))
          .as("order_ppm")
      )
  }

  /** q403: co-purchase affinity — the top-20 part pairs by support
    * (orders containing BOTH parts), the market-basket primitive
    * (Agrawal & Srikant, "Fast algorithms for mining association
    * rules", VLDB 1994 — support counting only; confidence/lift are
    * single divisions the spec checks). Deterministic top-k via
    * (support DESC, part_a, part_b) → TakeOrderedAndProject.
    *
    * Scale: the pair join is WITHIN-order (self-join keyed on
    * l_orderkey), so cost is Σ fanout² over orders — bounded by the
    * q399 fanout profile (7-line orders → ≤21 pairs), never
    * parts². Distinct parts per order first, so multi-line same-part
    * orders don't inflate support.
    */
  def coPurchasePairs(spark: SparkSession, dir: String): DataFrame = {
    val op = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct()
    val a = op.select(col("l_orderkey"), col("l_partkey").as("part_a"))
    val b = op.select(col("l_orderkey"), col("l_partkey").as("part_b"))
    a.join(b, Seq("l_orderkey"))
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("part_a").asc, col("part_b").asc)
      .limit(20)
  }

  /** q406: association-rule metrics over the q403 top pairs —
    * confidence(a→b) and (b→a) in exact milli, and lift in exact
    * milli via the pure-integer form support·N·1000 / (s_a·s_b).
    * Support alone (q403) ranks popular-with-popular pairs first;
    * lift > 1000 is what actually says "these attach to each other",
    * and confidence asymmetry says in WHICH direction the
    * recommendation runs.
    *
    * Scale: the q403 pair aggregate + a broadcast-joinable per-part
    * support table + one scalar order count. Top-20 kept AFTER lift
    * is computed (ranked by lift desc) — still TakeOrdered.
    */
  def associationRules(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.idivHalfUp
    val op = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct()
    val partSupport = op
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("s"))
    val nOrders = op.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val a = op.select(col("l_orderkey"), col("l_partkey").as("part_a"))
    val b = op.select(col("l_orderkey"), col("l_partkey").as("part_b"))
    val pairs = a
      .join(b, Seq("l_orderkey"))
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
    pairs
      .join(partSupport.select(col("l_partkey").as("part_a"),
        col("s").as("s_a")), Seq("part_a"))
      .join(partSupport.select(col("l_partkey").as("part_b"),
        col("s").as("s_b")), Seq("part_b"))
      .crossJoin(broadcast(nOrders))
      .select(
        col("part_a"), col("part_b"), col("support"),
        col("s_a"), col("s_b"),
        idivHalfUp(col("support") * lit(1000L), col("s_a"))
          .as("conf_ab_milli"),
        idivHalfUp(col("support") * lit(1000L), col("s_b"))
          .as("conf_ba_milli"),
        idivHalfUp(col("support") * col("n_orders") * lit(1000L),
          col("s_a") * col("s_b")).as("lift_milli")
      )
      .orderBy(col("lift_milli").desc, col("part_a").asc,
        col("part_b").asc)
      .limit(20)
  }

  /** q411: RF banding — customers cross-tabulated by order FREQUENCY
    * band (1 / 2-3 / 4+) and RECENCY band (days from last order to
    * the corpus's max order date: ≤ 30 / ≤ 90 / older), the classic
    * RFM segmentation minus the float-laden monetary axis. Counts
    * per cell plus each cell's share of the customer base in exact
    * ppm; recency uses the q378 floor-free day convention (both
    * operands are order dates, so the difference is non-negative).
    *
    * Scale: one per-customer aggregate over orders + one scalar max
    * date; the cross-tab is a 9-cell rollup.
    */
  def rfBanding(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.{idiv, microRatio}
    val perCust = Tables
      .orders(spark, dir)
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("ou"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("freq"), max(col("ou")).as("last_ou"))
    val maxDate = perCust.agg(max(col("last_ou")).as("corpus_max"))
    val banded = perCust
      .crossJoin(broadcast(maxDate))
      .select(
        when(col("freq") === 1, "f1")
          .when(col("freq") <= 3, "f2_3")
          .otherwise("f4_plus").as("freq_band"),
        when(idiv(col("corpus_max") - col("last_ou"),
          lit(86400000000L)) <= 30L, "r_30d")
          .when(idiv(col("corpus_max") - col("last_ou"),
            lit(86400000000L)) <= 90L, "r_90d")
          .otherwise("r_older").as("recency_band")
      )
      .groupBy(col("freq_band"), col("recency_band"))
      .agg(count(lit(1)).as("n_customers"))
    val tot = banded.agg(sum(col("n_customers")).as("total"))
    banded
      .crossJoin(broadcast(tot))
      .select(
        col("freq_band"), col("recency_band"), col("n_customers"),
        microRatio(col("n_customers"), col("total")).as("share_ppm")
      )
  }

  /** q416: supplier load profile — the exact five-point of lineitems
    * per supplier plus the busiest supplier's share of all lines in
    * ppm. The skew profile of every suppkey-keyed shuffle (the
    * supplier-side twin of q399's orderkey fanout), and the capacity
    * question in operational terms: if P90 is near max, load is flat;
    * if max dwarfs P90, one supplier is the hot key.
    *
    * Scale: one per-supplier count (map-side combinable); rank picks
    * window over the |suppliers|-row frame (dimension-sized).
    */
  def supplierLoadProfile(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val perSupp = Tables
      .lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("nl"))
    val w = Window.orderBy(col("nl").asc, col("l_suppkey").asc)
    def pick(p: Int) =
      max(when(col("rn") === ceil(col("cnt") * p / 100), col("nl")))
    perSupp
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy()))
      .withColumn("total_lines",
        sum(col("nl")).over(Window.partitionBy()))
      .agg(
        max(col("cnt")).as("n_suppliers"),
        max(col("total_lines")).as("n_lines"),
        min(col("nl")).as("min_lines"),
        pick(50).as("p50_lines"),
        pick(90).as("p90_lines"),
        max(col("nl")).as("max_lines"),
        microRatio(max(col("nl")), max(col("total_lines")))
          .as("top_share_ppm")
      )
  }

  /** q425: lineitem sequence-completeness audit — per order,
    * l_linenumber should be exactly 1..n (the TPC-H contract): this
    * emits how many orders have duplicate line numbers, a wrong
    * start, or internal gaps, with the affected line mass. The third
    * leg of the integrity tripod: q372 checks KEYS, q415 checks
    * ORDER, this checks SEQUENCE COMPLETENESS — the property CDC
    * replays and partial loads silently break. The per-order test is
    * pure integers: n lines, distinct linenos, min/max lineno — a
    * gap-free 1..n run iff distinct = n AND min = 1 AND max = n.
    *
    * Scale: one orderkey-keyed aggregate (map-side combinable), one
    * 4-row rollup.
    */
  def linenoCompleteness(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val perOrder = Tables
      .lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("l_linenumber")).as("nd"),
        min(col("l_linenumber")).as("mn"),
        max(col("l_linenumber")).as("mx")
      )
      .select(
        col("n"),
        when(col("nd") =!= col("n"), "duplicate_lineno")
          .when(col("mn") =!= 1, "wrong_start")
          .when(col("mx") =!= col("n"), "internal_gap")
          .otherwise("complete").as("status")
      )
    val agg = perOrder
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_orders"), sum(col("n")).as("n_lines"))
    val tot = agg.agg(sum(col("n_orders")).as("total_orders"))
    agg
      .crossJoin(broadcast(tot))
      .select(
        col("status"), col("n_orders"), col("n_lines"),
        microRatio(col("n_orders"), col("total_orders"))
          .as("order_ppm")
      )
  }

  /** q426: dead-catalog census — parts never ordered and suppliers
    * never shipping, as two anti-join audit rows. The storage-
    * planning number behind dimension pruning: a fact-side filter
    * can never select these rows, so scans/broadcasts that carry the
    * full dimension waste exactly this share.
    */
  def deadCatalog(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val li = Tables.lineitem(spark, dir)
    val deadParts = Tables
      .part(spark, dir)
      .select(col("p_partkey"))
      .join(li.select(col("l_partkey")).distinct(),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .count()
    val nParts = Tables.part(spark, dir).count()
    val deadSupp = Tables
      .supplier(spark, dir)
      .select(col("s_suppkey"))
      .join(li.select(col("l_suppkey")).distinct(),
        col("s_suppkey") === col("l_suppkey"), "left_anti")
      .count()
    val nSupp = Tables.supplier(spark, dir).count()
    import spark.implicits._
    Seq(
      ("parts_never_ordered", deadParts, nParts),
      ("suppliers_never_shipping", deadSupp, nSupp)
    ).toDF("check", "n_dead", "n_total")
      .select(
        col("check"), col("n_dead"), col("n_total"),
        microRatio(col("n_dead"), col("n_total")).as("dead_ppm")
      )
  }

  /** q428: order weekday profile — orders per day-of-week with exact
    * ppm shares, the calendar seasonality gauge on the order stream.
    * The weekday comes from PURE INTEGER calendar math — epoch-day
    * (micros div 86400e6) plus 4, mod 7, with 0 = Sunday (1970-01-01
    * was a Thursday) — because the engines' dayofweek() builtins
    * disagree on both origin and range, and this one never can.
    */
  def orderWeekdayProfile(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.{idiv, microRatio}
    val byDay = Tables
      .orders(spark, dir)
      .select(
        pmod(
          idiv(unix_micros(col("o_orderdate").cast("timestamp")),
            lit(86400000000L)) + lit(4L),
          lit(7L)).as("weekday"))
      .groupBy(col("weekday"))
      .agg(count(lit(1)).as("n_orders"))
    val tot = byDay.agg(sum(col("n_orders")).as("total"))
    byDay
      .crossJoin(broadcast(tot))
      .select(
        col("weekday"), col("n_orders"),
        microRatio(col("n_orders"), col("total")).as("share_ppm")
      )
  }

  /** q429: id-density audit — for each id-carrying table: row count,
    * id range, duplicate ids, and the gap mass (range − distinct).
    * The data contract every "doc_id % k" split, modulo shard and
    * arrival-order gauge in this engine quietly assumes: dense,
    * unique, monotone ids. Emitted per table so a regenerated or
    * partially-loaded corpus fails loudly here first.
    *
    * Scale: three independent min/max/count(distinct) aggregates —
    * one scan each, map-side combinable.
    */
  def idDensityAudit(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    def audit(name: String, df: DataFrame, idCol: String): DataFrame =
      df.agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col(idCol)).as("n_distinct"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id")
      ).select(lit(name).as("table_name"), col("n_rows"),
        col("n_distinct"), col("min_id"), col("max_id"))
    audit("documents", Tables.documents(spark, dir), "doc_id")
      .unionByName(audit("events", Tables.events(spark, dir), "event_id"))
      .unionByName(audit("orders", Tables.orders(spark, dir), "o_orderkey"))
      .select(
        col("table_name"), col("n_rows"), col("n_distinct"),
        col("min_id"), col("max_id"),
        (col("n_rows") - col("n_distinct")).as("n_dup_ids"),
        (col("max_id") - col("min_id") + 1 - col("n_distinct"))
          .as("n_gaps"),
        microRatio(col("n_distinct"),
          col("max_id") - col("min_id") + 1).as("density_ppm")
      )
  }

  /** Benford's-law expected first-digit shares log10(1 + 1/d) in ppm.
    * These are CONSTANTS, so the transcendental log10 never touches a
    * runtime column — the nine literals are pinned here (they sum to
    * exactly 1,000,000) and mirrored verbatim in the oracle SQL.
    */
  val benfordExpectedPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L
  )

  /** q373: Benford first-significant-digit audit over order totals —
    * the classic fabricated-or-truncated-numbers screen, run over
    * `floor(o_totalprice)`. Natural multi-scale monetary amounts
    * should track log10(1 + 1/d); a synthetic generator with a
    * uniform price range will not, and the signed per-digit deviation
    * quantifies exactly how far off it is. Every hashed column is a
    * pure integer: the digit comes from the decimal string of an
    * exact BIGINT (floor of a double is exact; integer-to-string is
    * deterministic), shares are half-up ppm ratios, and the Benford
    * expectation is a pinned literal (no runtime log10).
    *
    * Scale: one narrow scan → 9-group partial agg → 9-row frame; the
    * only window runs over the provably-bounded 9-row digit lattice.
    */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val obs = Tables
      .orders(spark, dir)
      .select(floor(col("o_totalprice")).cast("long").as("b"))
      .filter(col("b") >= 1L)
      .select(substring(col("b").cast("string"), 1, 1).cast("long")
        .as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("observed"))
    val digits = spark.range(1, 10).select(col("id").as("digit"))
    val expected = benfordExpectedPpm
      .foldLeft(lit(0L)) { case (acc, (d, ppm)) =>
        when(col("digit") === d.toLong, lit(ppm)).otherwise(acc)
      }
    val obsPpm =
      microRatio(col("observed"), greatest(col("n_values"), lit(1L)))
    digits
      .join(obs, Seq("digit"), "left")
      .na
      .fill(0L, Seq("observed"))
      .withColumn("n_values",
        sum(col("observed")).over(Window.partitionBy()))
      .select(
        col("digit"),
        col("observed"),
        col("n_values"),
        obsPpm.as("observed_ppm"),
        expected.as("expected_ppm"),
        (obsPpm - expected).as("dev_ppm")
      )
  }

  /** q445: triangle census of the co-purchase graph — parts are
    * nodes, an edge joins two parts that co-occur in at least one
    * order (the q403 pair derivation), output is the one-row global
    * summary: nodes, edges, wedges (open two-paths, Σ C(deg,2)),
    * triangles, and the global clustering coefficient
    * 3·triangles/wedges in exact ppm. Closure is the difference
    * between "popular parts co-occur with everything" (low) and
    * "parts cluster into kits" (high) — the graph-shape fact a
    * basket pipeline reads before trusting q406's pairwise lift,
    * and the same census a near-dup pair graph gets from q208.
    *
    * Scale: [[CoPurchaseGraph]]'s degree-ordered orientation (O(m^1.5)
    * wedge candidates, hub-safe; references there). Pair generation is
    * within-order (Σ fanout², bounded by the q399 profile), never
    * parts². No window, no collect.
    */
  def coPurchaseTriangles(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.{idiv, microRatio}
    import graft.util.Caches._
    val edges = CoPurchaseGraph.edges(spark, dir)
    // degrees read twice (orientation inside triangles + the wedge
    // count below) — cache the |nodes|-row frame
    val deg = CoPurchaseGraph.degrees(edges).cacheTracked()
    val triangles = CoPurchaseGraph
      .triangles(edges, deg)
      .agg(count(lit(1)).as("n_triangles"))
    val nEdges = edges.agg(count(lit(1)).as("n_edges"))
    val nodesWedges = deg.agg(
      count(lit(1)).as("n_nodes"),
      sum(idiv(col("deg") * (col("deg") - lit(1L)), lit(2L)))
        .as("n_wedges")
    )
    nodesWedges
      .crossJoin(broadcast(nEdges))
      .crossJoin(broadcast(triangles))
      .select(
        col("n_nodes"),
        col("n_edges"),
        col("n_wedges"),
        col("n_triangles"),
        microRatio(
          lit(3L) * col("n_triangles"),
          greatest(col("n_wedges"), lit(1L))
        ).as("closure_ppm")
      )
  }

  /** q460: edge-support distribution of the co-purchase graph — for
    * every edge, the number of triangles containing it (its
    * "support", the quantity k-truss decomposition peels on; Cohen,
    * "Trusses: cohesive subgraphs for social network analysis",
    * NSA 2008), rolled up into (support → edge count). Support-0
    * edges are kept via an anti-join-shaped left join — they are the
    * bridges whose removal disconnects kits, exactly what q445's
    * single closure number cannot show. A heavy support tail says
    * the graph has truss-like cores worth mining; an all-zero table
    * says co-purchase is star-shaped and pair mining (q406) is all
    * there is.
    *
    * Scale: [[CoPurchaseGraph.edgeSupport]] — the same degree-ordered
    * wedge machinery as q445 (O(m^1.5) candidates); each closed wedge
    * emits its three canonical edges through one explode, then two
    * aggregates. Output is bounded by the max support, never the edge
    * count.
    */
  def coPurchaseEdgeSupport(spark: SparkSession, dir: String): DataFrame =
    CoPurchaseGraph
      .edgeSupport(CoPurchaseGraph.edges(spark, dir))
      .select(col("support"))
      .groupBy(col("support"))
      .agg(count(lit(1)).as("n_edges"))

  /** q469: part skyline — the Pareto frontier on (price minimized,
    * size maximized), the classic skyline operator (Börzsönyi/
    * Kossmann/Stocker, "The Skyline Operator", ICDE 2001) that
    * relational engines lack as a builtin. A (price, size) point
    * survives iff nothing is cheaper-or-equal with a larger size and
    * nothing strictly cheaper ties its size. Output is the frontier
    * as exact-integer points (price in cents) with the part count
    * riding each point — the "best value at every budget" table.
    *
    * Scale: the naive formulation is an n² dominance anti-join; in
    * 2-D it collapses to a cumulative max over the DISTINCT price
    * value domain: M(c) = max size at price ≤ c, and the frontier
    * is exactly the prices where M strictly increases. One
    * (price, size) aggregate + one value-domain window — never a
    * pairwise comparison, the same cumsum discipline as q410/q454.
    */
  def partSkyline(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables
      .part(spark, dir)
      .select(
        round(col("p_retailprice") * 100).cast("long")
          .as("price_cents"),
        col("p_size").cast("long").as("size")
      )
      .groupBy(col("price_cents"), col("size"))
      .agg(count(lit(1)).as("n_parts"))
    val best = pts
      .groupBy(col("price_cents"))
      .agg(max(col("size")).as("size"))
    val wc = Window
      .orderBy(col("price_cents").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window
      .orderBy(col("price_cents").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = best
      .withColumn("m", max(col("size")).over(wc))
      .withColumn("mPrev", max(col("size")).over(wPrev))
      .filter(
        col("size") === col("m") &&
          (col("mPrev").isNull || col("size") > col("mPrev"))
      )
      .select(col("price_cents"), col("size"))
    frontier.join(pts, Seq("price_cents", "size"))
  }

  /** q465: BFS level census of the co-purchase graph from its
    * minimum part id — unweighted single-source shortest paths by
    * frontier expansion (the Pregel BFS; Malewicz et al., SIGMOD
    * 2010), levels capped at 20 hops, unreached nodes reported at
    * level −1. The level histogram is the graph's reachability
    * profile: how many hops of "customers also bought" it takes to
    * cover the catalog, and how much of it is simply unreachable
    * from the seed — the prerequisite fact for any graph-walk
    * feature (q86's PageRank mass, recommendation horizons).
    *
    * Scale: each round is one frontier-keyed hash join + an
    * anti-join against the visited set (frontier-sized, not
    * graph-sized), with `localCheckpoint` truncating lineage — the
    * standard distributed BFS; rounds are bounded by the 20-hop cap
    * and per-round emptiness is one scalar count.
    */
  def bfsLevels(spark: SparkSession, dir: String): DataFrame = {
    import graft.util.Caches._
    val edges = CoPurchaseGraph.edges(spark, dir)
    // read every round by the frontier join + once for the node set;
    // partitioned+sorted by src ONCE so each round's join shuffles
    // only the frontier (the cache preserves both properties)
    val sym = CoPurchaseGraph.symmetricBySrc(edges).cacheTracked()
    val seed = sym.agg(min(col("src"))).head().getLong(0)
    CoPurchaseGraph.bfsLevelHistogram(spark, sym, seed, 20)
  }

  /** q474: bounded truss-class census of the co-purchase graph — the
    * k-truss decomposition peel run on q460's support seam, emitting
    * (truss_k → edge count) for classes 2 (no triangle), 3 (peeled
    * during the capped 4-truss phase) and 4 (the bounded 4-truss).
    * Completes the cohesion family q445 (triangles) → q460 (support)
    * → trusses, next to the node-side 2-core audit (q315): support
    * says how reinforced each edge is, the truss class says which
    * edges survive MUTUAL reinforcement — the kit cores a basket
    * miner trusts most, with class-2 the bridges q460 counts at
    * support 0.
    *
    * Semantics + scale: [[CoPurchaseGraph.boundedTrussClasses]] with
    * peelRounds = 4 — the round cap is part of the contract (the
    * q465 hop-cap pattern; the unbounded fixpoint measured 63–98
    * rounds on these graphs), and the DuckDB oracle unrolls the
    * identical four rounds. Fixpoint-converged at sf0.001 (0 peel
    * rounds bind) and sf0.01 (2); at sf0.1 the cap binds by design.
    */
  def trussClassCensus(spark: SparkSession, dir: String): DataFrame =
    CoPurchaseGraph.boundedTrussClasses(
      spark,
      CoPurchaseGraph.edges(spark, dir),
      peelRounds = 4
    )

  /** q482: bounded densest-subgraph peel over the co-purchase graph —
    * the greedy 2(1+ε)-approximation (ε = 1/2, threshold deg·n ≤ 3·m)
    * of [[CoPurchaseGraph.densestSubgraphPeel]] with 6 peel rounds,
    * emitting each surviving round's (n_nodes, n_edges,
    * density_micro) and flagging the densest prefix. Completes the
    * cohesion ladder q445 (triangles) → q460 (support) → q474 (truss
    * classes) → densest core: the truss answers "which edges survive
    * mutual reinforcement", the peel answers "which NODE SET is the
    * densest farm" — and its best prefix is what a dedup/spam policy
    * actually quarantines.
    */
  def densestSubgraphCensus(spark: SparkSession, dir: String): DataFrame =
    CoPurchaseGraph.densestSubgraphPeel(
      spark,
      CoPurchaseGraph.edges(spark, dir),
      rounds = 6
    )

  /** q485: bounded coreness census over the REPEAT co-purchase graph
    * (pairs sharing ≥ 2 distinct orders — the full graph's ≈90+
    * minimum degree makes every node a trivial 4-core member;
    * repetition is where the hierarchy lives) —
    * [[CoPurchaseGraph.boundedCorenessCensus]] with maxK = 4 and 3
    * peel rounds per level, emitting (core_k → node count) for
    * coreness classes 1..3 and the bounded 4-core. The node-side
    * completion of the cohesion ladder (q445 triangles → q460
    * support → q474 truss classes → q482 densest core): q315's
    * 2-core audit is the k = 2 slice; this census assigns every
    * node its depth in the full nested hierarchy.
    */
  def corenessCensus(spark: SparkSession, dir: String): DataFrame =
    CoPurchaseGraph.boundedCorenessCensus(
      spark,
      CoPurchaseGraph.repeatEdges(spark, dir, minOrders = 2),
      maxK = 4,
      roundsPerLevel = 3
    )

  /** q492: targeted-attack robustness census (Albert, Jeong &
    * Barabási, Nature 2000) — the connected-component census of the
    * repeat co-purchase graph intact, after removing the top 1% of
    * nodes by degree (the targeted attack: ceil(n/100) picks, ties
    * by id), and after removing the SAME NUMBER of md5-hash-ordered
    * nodes (the deterministic uniform draw, q144 convention — the
    * random-failure control). The gap between the two giant_ppm
    * drops is the scale-free signature: hub removal shatters what
    * random failure barely dents — and operationally, it is the
    * blast-radius estimate for quarantining the template/spam hubs
    * q482's densest core flags. Node universe per census: nodes
    * incident to a surviving edge (the q459 convention).
    *
    * Scale: the degree frame is derived once; each census is the
    * pointer-doubling CC (O(log diameter) rounds, the q72 machinery
    * with its 1M-node ScaleBench row) over an anti-joined induced
    * edge set; the removal sets are TakeOrdered top-k (per-partition
    * heaps, no global sort), broadcast into the anti-joins.
    */
  def attackRobustness(spark: SparkSession, dir: String): DataFrame =
    attackRobustnessFrom(
      CoPurchaseGraph.repeatEdges(spark, dir, minOrders = 2)
    )

  /** [[attackRobustness]] over ANY canonical (u < v) edge frame —
    * the spec seam (hand-built graphs with union-find ground truth).
    */
  def attackRobustnessFrom(edges: DataFrame): DataFrame = {
    import graft.util.Caches._
    import graft.functions.IntMath.microRatio
    // read by the degree census and all three induced edge sets
    val deg = CoPurchaseGraph.degrees(edges).cacheTracked()
    val nTot = deg.count()
    val k = ((nTot + 99L) / 100L).toInt
    val targeted = deg
      .orderBy(col("deg").desc, col("n").asc)
      .limit(k)
      .select(col("n").as("rid"))
    val random = deg
      .orderBy(md5(col("n").cast("string")).asc, col("n").asc)
      .limit(k)
      .select(col("n").as("rid"))
    def census(
        scenario: String,
        nRemoved: Long,
        removed: Option[DataFrame]
    ): DataFrame = {
      val e2 = removed match {
        case None => edges
        case Some(r) =>
          edges
            .join(broadcast(r.select(col("rid").as("u"))), Seq("u"),
              "left_anti")
            .join(broadcast(r.select(col("rid").as("v"))), Seq("v"),
              "left_anti")
      }
      val ed = e2.select(col("u").as("src"), col("v").as("dst"))
      val nodes = ed
        .select(col("src").as("id"))
        .unionByName(ed.select(col("dst").as("id")))
        .distinct()
      val sizes = ConnectedComponents
        .run(nodes, ed)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("sz"))
      sizes
        .agg(
          coalesce(sum(col("sz")), lit(0L)).as("n_nodes"),
          count(lit(1)).as("n_components"),
          coalesce(max(col("sz")), lit(0L)).as("max_component")
        )
        .crossJoin(broadcast(ed.agg(count(lit(1)).as("n_edges"))))
        .select(
          lit(scenario).as("scenario"),
          lit(nRemoved).as("n_removed"),
          col("n_nodes"),
          col("n_edges"),
          col("n_components"),
          col("max_component"),
          microRatio(col("max_component"), greatest(col("n_nodes"), lit(1L)))
            .as("giant_ppm")
        )
    }
    census("intact", 0L, None)
      .unionByName(census("random_1pct", k.toLong, Some(random)))
      .unionByName(census("targeted_1pct", k.toLong, Some(targeted)))
  }

  /** q490: double-sweep eccentricity — the standard two-BFS diameter
    * lower bound (Magnien, Latapy & Habib, JEA 2009): sweep 0 runs
    * BFS from the minimum node id and reports its eccentricity and
    * farthest node u (max level, min id tie-break); sweep 1 re-runs
    * BFS from u, whose eccentricity is the double-sweep diameter
    * estimate — empirically tight on real graphs, and exactly the
    * number a graph-walk feature budget (q465's horizon question)
    * should be sized against instead of a single arbitrary-seed BFS.
    * Two rows: (sweep, seed, far_node, ecc, n_reached), hop-capped
    * at 20 like q465.
    *
    * Scale: two runs of the shared frontier-expansion BFS engine
    * ([[CoPurchaseGraph.bfsLevelsFrom]] — per round one
    * frontier-keyed join + an anti-join, lineage truncated); the
    * driver reads one TakeOrdered row and one count per sweep —
    * four bounded round-trips, the q481 greedy-argmax pattern.
    */
  def doubleSweepEcc(spark: SparkSession, dir: String): DataFrame = {
    import graft.util.Caches._
    val edges = CoPurchaseGraph.edges(spark, dir)
    // read by every BFS round of both sweeps + the seed pick;
    // src-partitioned+sorted once — see bfsLevels
    val sym = CoPurchaseGraph.symmetricBySrc(edges).cacheTracked()
    val seed0 = sym.agg(min(col("src"))).head().getLong(0)
    val l0 = CoPurchaseGraph.bfsLevelsFrom(spark, sym, seed0, 20)
    val f0 = l0.orderBy(col("lvl").desc, col("id").asc).limit(1).head()
    val (far0, ecc0) = (f0.getLong(0), f0.getLong(1))
    val n0 = l0.count()
    val l1 = CoPurchaseGraph.bfsLevelsFrom(spark, sym, far0, 20)
    val f1 = l1.orderBy(col("lvl").desc, col("id").asc).limit(1).head()
    val n1 = l1.count()
    import spark.implicits._
    Seq(
      (0L, seed0, far0, ecc0, n0),
      (1L, far0, f1.getLong(0), f1.getLong(1), n1)
    ).toDF("sweep", "seed", "far_node", "ecc", "n_reached")
  }

  /** q487: local-clustering-coefficient census of the co-purchase
    * graph (Watts & Strogatz, Nature 1998) — per node, lcc =
    * 2·tri(v) / (deg(v)·(deg(v)−1)) in exact ppm (half-up), censused
    * into percent-wide buckets (bucket = lcc_micro div 10000; an
    * exact-1.0 node lands in bucket 100). The node-local
    * completion of the cohesion ladder: q445 counts the graph's
    * triangles, q460 attributes them to edges, this attributes them
    * to nodes — the "is this part's neighborhood a kit or a
    * coincidence" profile, and the standard small-world diagnostic
    * read next to q450's assortativity.
    *
    * Exactness: deg ≤ |V| and tri(v) ≤ deg², so 2·tri·10⁶ stays far
    * inside BIGINT for any graph whose triangle frame is
    * enumerable; the division is one [[graft.functions.IntMath
    * .microRatio]] — engine-identical by construction. Isolated-pair
    * nodes (deg < 2) report lcc 0 by contract.
    *
    * Scale: triangle enumeration is the seam's O(m^1.5)
    * degree-ordered wedge join (never re-derived — same subtree as
    * q445); the census adds one explode + two keyed aggregates, all
    * collision-linear. No window, no driver loop.
    */
  def clusteringCensus(spark: SparkSession, dir: String): DataFrame =
    lccBuckets(CoPurchaseGraph.edges(spark, dir))

  /** [[clusteringCensus]] over ANY canonical (u < v) edge frame —
    * the spec seam (hand-built graphs with known coefficients).
    */
  def lccBuckets(edges: DataFrame): DataFrame = {
    import graft.util.Caches._
    import graft.functions.IntMath.{idiv, microRatio}
    // read twice: orientation inside triangles + the lcc join
    val deg = CoPurchaseGraph.degrees(edges).cacheTracked()
    val triN =
      CoPurchaseGraph.nodeTriangleCounts(
        CoPurchaseGraph.triangles(edges, deg)
      )
    deg
      .join(triN, Seq("n"), "left")
      .select(
        col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri")
      )
      .select(
        idiv(
          when(col("deg") < 2, lit(0L)).otherwise(
            microRatio(
              lit(2L) * col("tri"),
              col("deg") * (col("deg") - lit(1L))
            )
          ),
          lit(10000L)
        ).as("bucket"),
        col("tri")
      )
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_nodes"),
        sum(col("tri")).as("tri_total")
      )
  }

  /** q489: rich-club connectivity curve of the co-purchase graph
    * (Colizza, Flammini, Serrano & Vespignani, Nature Physics 2006)
    * — at each degree-decile boundary k (the q461 value-domain
    * pick: k_d = min degree whose cumulative node count reaches
    * d/10 of the graph), the subgraph induced on nodes with
    * deg > k is measured: node count, edge count, and density
    * φ(k) = 2·E_k / (N_k·(N_k−1)) in exact ppm. A rising φ toward
    * the high deciles is the "rich club" — the hub parts that
    * co-occur with EACH OTHER, the catalog's de-facto staples
    * shelf; flat or falling φ means hubs reach disjoint audiences.
    *
    * Exactness: decile bounds are rank-exact picks from the degree
    * value-domain cumsum (a window over distinct degree VALUES —
    * bounded, whitelisted in the plan sweep); φ is one microRatio
    * on exact counts (2·E_k·10⁶ overflows only past ~4.6e12 edges,
    * documented at IntMath.microRatio).
    *
    * Scale: the degree histogram is value-domain-bounded (≤ max
    * degree rows); the nine thresholds join it and the per-edge
    * min-endpoint-degree histogram as 9-row broadcasts — the only
    * graph-sized passes are the two degree joins the seam's
    * orientation already does. Emits exactly 9 rows at any scale.
    */
  def richClubCurve(spark: SparkSession, dir: String): DataFrame =
    richClubFrom(CoPurchaseGraph.edges(spark, dir))

  /** [[richClubCurve]] over ANY canonical (u < v) edge frame — the
    * spec seam (hand-built graphs with known densities).
    */
  def richClubFrom(edges: DataFrame): DataFrame = {
    import graft.util.Caches._
    import graft.functions.IntMath.microRatio
    // read three times: histogram, decile total, per-edge min degree
    val deg = CoPurchaseGraph.degrees(edges).cacheTracked()
    val g = deg.groupBy(col("deg")).agg(count(lit(1)).as("c"))
    val wg = Window
      .orderBy(col("deg").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // value-domain cumsum (bounded: distinct degree values) — read
    // by all nine decile-bound picks
    val cum = g
      .withColumn("cw", sum(col("c")).over(wg))
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("n"))))
      .cacheTracked()
    val bounds = (1 to 9)
      .map { dd =>
        cum
          .filter(col("cw") * 10 >= col("n") * dd)
          .agg(min(col("deg")).as(s"k$dd"))
      }
      .reduce(_.crossJoin(_))
    val ks = bounds
      .select(
        explode(
          array(
            (1 to 9).map(dd =>
              struct(
                lit(dd.toLong).as("decile"),
                col(s"k$dd").as("k_deg")
              )): _*
          )
        ).as("x")
      )
      .select(col("x.decile").as("decile"), col("x.k_deg").as("k_deg"))
    // per-edge min endpoint degree, then its bounded histogram —
    // the threshold sweep never rescans the edge set
    val edh = edges
      .join(deg.select(col("n").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), Seq("v"))
      .select(least(col("du"), col("dv")).as("dmin"))
      .groupBy(col("dmin"))
      .agg(count(lit(1)).as("ec"))
    // left-outer non-equi joins broadcast their RIGHT side (the
    // bounded histograms, <= max-degree rows); ks is 9 rows
    val nK = ks
      .join(broadcast(g), col("deg") > col("k_deg"), "left")
      .groupBy(col("decile"), col("k_deg"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("n_nodes"))
    val eK = ks
      .join(broadcast(edh), col("dmin") > col("k_deg"), "left")
      .groupBy(col("decile"), col("k_deg"))
      .agg(coalesce(sum(col("ec")), lit(0L)).as("n_edges"))
    nK
      .join(eK, Seq("decile", "k_deg"))
      .select(
        col("decile"),
        col("k_deg"),
        col("n_nodes"),
        col("n_edges"),
        when(col("n_nodes") < 2, lit(0L))
          .otherwise(
            microRatio(
              lit(2L) * col("n_edges"),
              col("n_nodes") * (col("n_nodes") - lit(1L))
            )
          )
          .as("phi_micro")
      )
  }
}
