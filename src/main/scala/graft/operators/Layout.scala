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

  /** Hilbert-curve index for a 2^bits × 2^bits grid — the standard
    * iterative xy→d conversion (per-level quadrant code
    * `(3·rx) XOR ry` plus the reflect/transpose rotation; Hilbert
    * 1891, in the bit-twiddling form popularized by Warren's
    * Hacker's Delight treatment). The reflection uses the full-grid
    * complement `n−1−coord` so intermediate values stay in
    * [0, 2^bits) at every level.
    *
    * Implemented as the codegen'd
    * [[graft.functions.HilbertIndex2D]] expression (bit-identical to
    * the former per-level projection chain, pinned by the same spec):
    * the chained-projection form whole-stage-compiled into one
    * generated method past the JVM JIT's HugeMethodLimit, so the
    * per-row loop ran interpreted and the optimizer re-walked a
    * ~60-projection tree on every run.
    *
    * Expects `xName`/`yName` in [0, 2^bits); appends `outName`.
    * Every other column passes through untouched.
    */
  def hilbertIndex(
      df: DataFrame,
      bits: Int,
      xName: String,
      yName: String,
      outName: String
  ): DataFrame =
    df.withColumn(
      outName,
      graft.functions.HilbertIndex2D.hilbert(
        col(xName).cast("long"),
        col(yName).cast("long"),
        bits
      )
    )

  /** q452: space-filling-curve locality shoot-out — lineitem rows
    * mapped into a 1024×1024 (part, order) grid are indexed by
    * three layouts (Hilbert, Z-order/Morton, lexicographic x·2¹⁰+y)
    * and chunked into 4096-cell blocks (index >> 12 — the "file" a
    * range-partitioning writer would cut). For three canonical scan
    * regions (a 128² square, a 16-wide x-slab, a 16-wide y-slab) the
    * output counts rows matched and BLOCKS TOUCHED per
    * (layout, region) — the I/O a min/max-pruned scan actually pays.
    * This is the measurement behind choosing ZORDER/Hilbert
    * clustering for a 100 TB table: Hilbert touches the fewest
    * blocks on squares (no Z-curve seam jumps), lexicographic wins
    * only on its own slab axis and loses catastrophically on the
    * other.
    *
    * Scale: three narrow map-side index computations (no shuffle)
    * + one (layout, region) aggregate with a distinct-block count —
    * cost is one scan of the fact table regardless of grid size.
    */
  def curveLocality(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.idiv
    val li = Tables
      .lineitem(spark, dir)
      .select(col("l_partkey"), col("l_orderkey"))
    val stats = li.agg(
      min(col("l_partkey")).as("pk_mn"),
      max(col("l_partkey")).as("pk_mx"),
      min(col("l_orderkey")).as("ok_mn"),
      max(col("l_orderkey")).as("ok_mx")
    )
    // integer min/max scaling into [0, 1024) — exact on any engine,
    // full grid coverage at every SF (a bare `% 1024` leaves the
    // grid mostly empty when a key domain is smaller than 1024)
    val pts = li
      .crossJoin(broadcast(stats))
      .select(
        idiv((col("l_partkey") - col("pk_mn")) * lit(1024L),
          col("pk_mx") - col("pk_mn") + lit(1L)).as("x"),
        idiv((col("l_orderkey") - col("ok_mn")) * lit(1024L),
          col("ok_mx") - col("ok_mn") + lit(1L)).as("y")
      )
    val withH = hilbertIndex(pts, 10, "x", "y", "h")
    val indexed = withH
      .withColumn("z", zValue(col("x"), col("y"), 10))
      .withColumn("lx", shiftleft(col("x"), 10) + col("y"))
    val byLayout = indexed.select(
      col("x"),
      col("y"),
      explode(
        array(
          struct(lit("hilbert").as("layout"), col("h").as("idx")),
          struct(lit("zorder").as("layout"), col("z").as("idx")),
          struct(lit("lex").as("layout"), col("lx").as("idx"))
        )
      ).as("m")
    )
    // Aggregate per (layout, block) FIRST with the three region hits
    // as conditional counts — ≤ 3·256 groups, map-side combined — and
    // only then explode the (tiny) block frame into (layout, region)
    // rows. The previous shape exploded the region axis at full row
    // volume (3× the layout-exploded stream, 9 rows per lineitem) and
    // ran countDistinct(block) over it; this computes the identical
    // counts (n_rows = Σ_block hits, n_blocks_touched = #blocks with
    // ≥ 1 hit) with one explode instead of two and no distinct
    // aggregate over corpus-scale rows.
    val perBlock = byLayout
      .select(
        col("m.layout").as("layout"),
        shiftright(col("m.idx"), 12).as("blk"),
        when(col("x") < 128 && col("y") < 128, 1L)
          .otherwise(0L).as("h_sq"),
        when(col("x").between(200, 215), 1L).otherwise(0L).as("h_sx"),
        when(col("y").between(600, 615), 1L).otherwise(0L).as("h_sy")
      )
      .groupBy(col("layout"), col("blk"))
      .agg(
        sum(col("h_sq")).as("n_sq"),
        sum(col("h_sx")).as("n_sx"),
        sum(col("h_sy")).as("n_sy")
      )
    perBlock
      .select(
        col("layout"),
        explode(
          array(
            struct(lit("r_square").as("region"), col("n_sq").as("n")),
            struct(lit("r_slab_x").as("region"), col("n_sx").as("n")),
            struct(lit("r_slab_y").as("region"), col("n_sy").as("n"))
          )
        ).as("r")
      )
      .filter(col("r.n") > 0)
      .groupBy(col("layout"), col("r.region").as("region"))
      .agg(
        sum(col("r.n")).as("n_rows"),
        count(lit(1)).as("n_blocks_touched")
      )
  }
}
