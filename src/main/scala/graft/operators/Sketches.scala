package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.{hash60, tokens}
import graft.util.Caches._

/** Count-min sketch over the corpus token stream — approximate heavy-
  * hitter counting in fixed memory (Cormode & Muthukrishnan, "An
  * improved data stream summary: the count-min sketch and its
  * applications", J. Algorithms 55(1), 2005).
  *
  * Scale design: the sketch is d·w counter cells regardless of corpus
  * size — the groupBy shuffles at most d·w partially-aggregated rows
  * per partition, while an exact term count must shuffle the full
  * vocabulary. At 100 TB the sketch pass is the only affordable way
  * to screen for heavy hitters before an exact pass over the few
  * candidates. Point estimates are biased up (collisions only add),
  * so `cms_n >= exact_n` always, with error ≤ 2N/w at probability
  * 1−(1/2)^d.
  *
  * Determinism: the d row-hashes are the portable md5-prefix
  * [[hash60]] seeded by row index (`"r:token"`), and cell updates are
  * commutative sums — the sketch is bit-identical on any partitioning
  * and exactly SQL-replayable (unlike Spark's built-in
  * `count_min_sketch`, whose murmur hashing DuckDB cannot mirror).
  */
object Sketches {

  /** Build the (row, bucket, cell_n) sketch cells for a (term, n)
    * frequency frame. Cells with zero hits are absent (they never
    * affect a min over present terms' cells... every queried term has
    * d present cells by construction).
    */
  def cmsCells(termCounts: DataFrame, depth: Int, width: Int): DataFrame =
    termCounts
      .select(
        col("w"),
        col("n"),
        explode(
          array((0 until depth).map { i =>
            struct(
              lit(i).as("r"),
              pmod(hash60(concat_ws(":", lit(i), col("w"))), lit(width)).as("b")
            )
          }: _*)
        ).as("rb")
      )
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(sum(col("n")).as("cell_n"))

  /** q92: exact top-k corpus terms with their count-min estimates
    * side by side — the accuracy audit a pipeline runs before
    * trusting the sketch at scale. Output: (term, exact_n, cms_n),
    * cms_n >= exact_n.
    */
  def cmsTopTerms(
      spark: SparkSession,
      dir: String,
      depth: Int = 4,
      width: Int = 64,
      k: Int = 20
  ): DataFrame = {
    val exact = Tables
      .documents(spark, dir)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"))
    val cells = cmsCells(exact, depth, width)
    val top = exact.orderBy(col("n").desc, col("w").asc).limit(k)
    top
      .select(
        col("w"),
        col("n"),
        explode(
          array((0 until depth).map { i =>
            struct(
              lit(i).as("r"),
              pmod(hash60(concat_ws(":", lit(i), col("w"))), lit(width)).as("b")
            )
          }: _*)
        ).as("rb")
      )
      .join(
        broadcast(cells),
        col("rb.r") === cells("r") && col("rb.b") === cells("b")
      )
      .groupBy(col("w"))
      .agg(any_value(col("n")).as("exact_n"), min(col("cell_n")).as("cms_n"))
      .select(col("w").as("term"), col("exact_n"), col("cms_n"))
  }

  /** q182: mergeable per-source MinHash union sketch + pairwise
    * source-similarity estimate, audited against the exact union
    * Jaccard.
    *
    * The per-source signature component i is `min` over every shingle
    * of every document of that source — because min is associative
    * and commutative, the signature of a source equals the
    * component-wise min of its documents' signatures (and of its
    * shards' signatures). That mergeability is the point: at 100 TB
    * each shard/day/partition aggregates its own 8-long sketch, and
    * cross-source (or cross-shard) similarity is estimated by
    * comparing 8-double sketches — no pair join over documents ever
    * runs. The estimate is the standard one-permutation agreement
    * fraction P(min_a = min_b) = J(A,B).
    *
    * The exact-union audit (distinct shingles per source, inverted
    * self-join — collision-linear like q21) is test-scale-only
    * machinery to expose the sketch error; the sketch path alone is
    * the 100 TB shape.
    *
    * Determinism: same portable seeded md5 60-bit hash as q22's
    * signatures; min/count aggregates only — partitioning-invariant,
    * exactly SQL-replayable.
    */
  def sourceMinhashSimilarity(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.shingles
    val sh = Tables
      .documents(spark, dir)
      .select(col("source"), explode(shingles(col("text"), 3)).as("s"))
    // 8-component union sketch per source: one narrow pass, the
    // shuffle carries 8 partially-aggregated mins per partition.
    val sig = sh
      .groupBy(col("source"))
      .agg(
        array((0 until Dedup.NumHashes).map { i =>
          min(Dedup.seededHash(i, col("s")))
        }: _*).as("sig")
      )
    val est = sig
      .as("a")
      .crossJoin(broadcast(sig.as("b")))
      .filter(col("a.source") < col("b.source"))
      .select(
        col("a.source").as("src_a"),
        col("b.source").as("src_b"),
        // exact ppm: matches·10⁶/8 on the agreement count itself
        // (round-12 float purge)
        graft.functions.IntMath
          .microRatio(
            size(
              filter(
                zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y),
                v => v
              )
            ),
            lit(Dedup.NumHashes.toLong)
          )
          .as("est_jaccard_ppm")
      )
    // exact union Jaccard audit: distinct shingle sets per source,
    // intersections via the inverted join (rows ∝ shared shingles).
    val su = sh.distinct()
    val sizes = su.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = su
      .as("x")
      .join(su.as("y"), Seq("s"))
      .filter(col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(count(lit(1)).as("inter"))
    est
      .join(inter, Seq("src_a", "src_b"), "left")
      .join(broadcast(sizes.withColumnRenamed("source", "src_a").withColumnRenamed("n", "n_a")), Seq("src_a"))
      .join(broadcast(sizes.withColumnRenamed("source", "src_b").withColumnRenamed("n", "n_b")), Seq("src_b"))
      .select(
        col("src_a"),
        col("src_b"),
        col("est_jaccard_ppm"),
        graft.functions.IntMath
          .microRatio(
            coalesce(col("inter"), lit(0L)),
            col("n_a") + col("n_b") - coalesce(col("inter"), lit(0L))
          )
          .as("jaccard_ppm")
      )
  }

  /** q303: KMV error audit over per-source distinct TOKENS — the q58
    * sketch pointed at the quantity a vocabulary planner actually
    * budgets (per-source lexicon size, the q157/q271 inputs), with
    * the exact answer alongside and the relative error in ppm. This
    * is the evidence table for replacing exact DISTINCT with the
    * O(k)-state sketch at 100 TB: sources still under k are exact by
    * construction (the estimator returns n), and the audit shows the
    * (k−1)/h_k error at the sources that overflow.
    *
    * Scale: one tokenize scan → 60-bit hashes → the bounded
    * [[graft.functions.KmvSketch]] aggregate (≤ 256 longs of state
    * per source, map-side merged); the exact column is the expensive
    * baseline the sketch exists to replace — kept here because the
    * audit is the point.
    */
  def kmvSourceTokenError(spark: SparkSession, dir: String): DataFrame = {
    val hashed = Tables
      .documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .select(col("source"), hash60(col("w")).as("h"))
    hashed
      .groupBy(col("source"))
      .agg(
        graft.functions.KmvSketch.kmvDistinct(col("h")).as("est"),
        countDistinct(col("h")).as("n_exact")
      )
      .select(
        col("source"),
        col("n_exact"),
        round(col("est"), 6).as("kmv_estimate"),
        round(
          abs(col("est") - col("n_exact")) / col("n_exact") * 1e6
        ).cast("long").as("err_ppm")
      )
  }

  /** q317: AMS F₂ sketch audit — the second frequency moment
    * Σ_w f_w² of each source's token distribution (the concentration
    * statistic behind self-join sizing and repetition mass),
    * estimated by the Alon-Matias-Szegedy ±1-projection sketch with
    * R = 64 counters and compared to the exact value in ppm. F₂ is
    * the other classic mergeable sketch next to KMV's F₀ (q303):
    * counter state is R integers per source regardless of vocabulary,
    * merge is vector addition — the 100 TB shape — and this table
    * is the evidence for its error at R = 64. Signs come from the
    * engine's 60-bit hash parity, replayed exactly by the oracle.
    *
    * Scale: one tokenize scan → vocab-sized (source, w) counts →
    * a ×64 projection explode map-side-combined to |sources|·64
    * cells; the exact column is the vocab-sized baseline the sketch
    * replaces.
    */
  def amsF2Audit(spark: SparkSession, dir: String): DataFrame = {
    val f = Tables
      .documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("f"))
    val exact = f
      .groupBy(col("source"))
      .agg(sum(col("f") * col("f")).as("f2_exact"))
    val counters = f
      .select(
        col("source"),
        col("f"),
        col("w"),
        explode(sequence(lit(0), lit(63))).as("r")
      )
      .withColumn(
        "s",
        when(
          hash60(concat(col("r").cast("string"), lit(":"), col("w")))
            % 2 === 0,
          1L
        ).otherwise(-1L)
      )
      .groupBy(col("source"), col("r"))
      .agg(sum(col("f") * col("s")).as("c"))
    val est = counters
      .groupBy(col("source"))
      .agg(
        round(sum(col("c") * col("c")).cast("double") / 64.0)
          .cast("long").as("f2_est")
      )
    exact
      .join(est, "source")
      .select(
        col("source"),
        col("f2_exact"),
        col("f2_est"),
        graft.functions.IntMath.microRatio(
          abs(col("f2_est") - col("f2_exact")), col("f2_exact"))
          .as("err_ppm")
      )
  }

  /** q312: Bloom-filter sizing plan — for each source's distinct-
    * token cardinality and each target false-positive rate p ∈
    * {1%, 0.1%}: the optimal bit count m = ⌈−n·ln p / ln²2⌉, hash
    * count k = round(m/n·ln 2), and the filter's memory in KiB.
    * The sheet read before provisioning the q137 decontamination
    * filters at 100 TB — per-source filters (this table) vs one
    * big filter (the total row's arithmetic) is a real deployment
    * choice, and the k column is what the filter build actually
    * parameterizes. Pure closed-form arithmetic over exact
    * cardinalities.
    *
    * Scale: one distinct-count aggregate (or q303's KMV estimate at
    * scale), then |sources|·2 rows of arithmetic.
    */
  def bloomSizingPlan(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables
      .documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .select(col("source"), hash60(col("w")).as("h"))
      .groupBy(col("source"))
      .agg(countDistinct(col("h")).as("n_keys"))
    val fpps = Seq(10000L, 1000L) // ppm
    val ln2sq = log(lit(2.0)) * log(lit(2.0))
    counts
      .select(
        col("source"),
        col("n_keys"),
        explode(lit(fpps.toArray)).as("fpp_ppm")
      )
      .withColumn(
        "bits",
        ceil(
          -col("n_keys").cast("double") *
            log(col("fpp_ppm").cast("double") / 1e6) / ln2sq
        ).cast("long")
      )
      .select(
        col("source"),
        col("n_keys"),
        col("fpp_ppm"),
        col("bits"),
        round(
          col("bits").cast("double") / col("n_keys") * log(lit(2.0))
        ).cast("long").as("k_hashes"),
        graft.functions.IntMath
          .idivHalfUp(col("bits") * lit(1000L), lit(8192L))
          .as("kib_milli")
      )
  }

  /** q418: KMV set algebra — per source pair: exact distinct-shingle
    * counts (|A|, |B|, |A∪B|, |A∩B|) next to the KMV k=64 estimates
    * of the same quantities, where the UNION estimate comes from
    * merging the two bottom-64 register sets and re-taking the
    * bottom 64 (the mergeability that makes KMV a distributed
    * counter: registers union across shards/sources with no raw
    * data), and the intersection estimate is inclusion–exclusion
    * est(A)+est(B)−est(A∪B). Estimates are single divisions of exact
    * integer registers (the proven q58 spelling — deterministic, k−1
    * scaled in DOUBLE because 63·2^60 overflows a long); everything
    * exact is BIGINT.
    *
    * Scale: registers are 64 longs per source (the per-source bottom
    * k via WindowGroupLimit); pair frames are |sources|²·k rows —
    * dimension-sized. The EXACT columns cost one shingle inversion
    * (collision-linear) and exist as the audit; at 100 TB you ship
    * only the registers.
    */
  def kmvSetAlgebra(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 64
    val twoPow60 = 1152921504606846976L
    val hashed = Tables
      .documents(spark, dir)
      .select(col("source"),
        explode(graft.functions.TextFunctions.shingles(col("text"), 3))
          .as("s"))
      .distinct()
      .select(col("source"), hash60(col("s")).as("h"))
      .distinct()
      .cacheTracked()
    val nd = hashed.groupBy(col("source")).agg(count(lit(1)).as("nd"))
    val w = Window.partitionBy(col("source")).orderBy(col("h").asc)
    val regs = hashed
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("source"), col("h"))
    val srcs = nd.select(col("source"), col("nd"))
    val pairs = srcs
      .select(col("source").as("src_a"), col("nd").as("nd_a"))
      .join(srcs.select(col("source").as("src_b"), col("nd").as("nd_b")),
        col("src_a") < col("src_b"))
    // merged registers per pair -> bottom-k of the union
    val pregs = pairs
      .select(col("src_a"), col("src_b"))
      .join(regs,
        col("source") === col("src_a") || col("source") === col("src_b"))
      .select(col("src_a"), col("src_b"), col("h"))
      .distinct()
    val wp = Window
      .partitionBy(col("src_a"), col("src_b"))
      .orderBy(col("h").asc)
    val unionEst = pregs
      .withColumn("rk", row_number().over(wp))
      .withColumn("ndu",
        count(lit(1)).over(Window.partitionBy(col("src_a"), col("src_b"))))
      .groupBy(col("src_a"), col("src_b"))
      .agg(
        max(col("ndu")).as("ndu"),
        max(when(col("rk") === k, col("h"))).as("kth")
      )
      .select(col("src_a"), col("src_b"),
        when(col("ndu") < k, col("ndu").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(twoPow60.toDouble) /
            col("kth").cast("double")).as("est_union"))
    // exact intersections via the shingle inversion
    val inter = hashed
      .select(col("source").as("src_a"), col("h"))
      .join(hashed.select(col("source").as("src_b"), col("h")), Seq("h"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("exact_inter"))
    val perSrcEst = regs
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === k)
      .select(col("source"), col("h").as("kth"))
    val est = srcs
      .join(perSrcEst, Seq("source"), "left")
      .select(col("source"),
        when(col("nd") < k, col("nd").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(twoPow60.toDouble) /
            col("kth").cast("double")).as("est"))
    pairs
      .join(est.select(col("source").as("src_a"), col("est").as("est_a")),
        Seq("src_a"))
      .join(est.select(col("source").as("src_b"), col("est").as("est_b")),
        Seq("src_b"))
      .join(unionEst, Seq("src_a", "src_b"))
      .join(inter, Seq("src_a", "src_b"), "left")
      .na
      .fill(0L, Seq("exact_inter"))
      .select(
        col("src_a"), col("src_b"), col("nd_a"), col("nd_b"),
        col("exact_inter"),
        (col("nd_a") + col("nd_b") - col("exact_inter"))
          .as("exact_union"),
        col("est_a"), col("est_b"), col("est_union"),
        (col("est_a") + col("est_b") - col("est_union"))
          .as("est_inter")
      )
  }

  /** q484: bottom-k quantile sketch audit — the mergeable quantile
    * entry the sketch shelf was missing: per l_returnflag, the exact
    * five-point summary of l_extendedprice (cents) next to the
    * [[graft.functions.QuantileSketch]] estimate from a k = 256
    * bottom-k row sample, plus the population and sample sizes. The
    * evidence table for replacing the exact per-group sort (the q356/
    * q410/q436/q440 form — a full shuffle + sort of every group
    * member, the 100-TB-expensive shape) with O(k) mergeable state:
    * groups under k are exact by construction, and the audit shows
    * the ±n/√k-rank sampling error where the sample binds.
    *
    * Scale: the sketch side is one scan with map-side partial
    * aggregation into ≤ k pairs per group — no sort, no wide
    * shuffle. The exact side is the expensive baseline being
    * audited (per-group rank window, partitioned by group — never a
    * global single-partition window). Quantile rank is ⌈q·n⌉
    * (1-based), identical arithmetic on both engines via
    * power-of-two-exact double division.
    */
  def quantileSketchAudit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = Tables
      .lineitem(spark, dir)
      .select(
        col("l_returnflag").as("grp"),
        hash60(
          concat(
            col("l_orderkey").cast("string"),
            lit("_"),
            col("l_linenumber").cast("string")
          )
        ).as("h"),
        round(col("l_extendedprice") * 100).cast("long").as("v")
      )
      .cacheTracked()
    val sk = rows
      .groupBy(col("grp"))
      .agg(
        graft.functions.QuantileSketch
          .bottomKValues(col("h"), col("v")).as("vals")
      )
      .select(col("grp"), col("vals"), size(col("vals")).cast("long").as("j"))
    def at(idx: org.apache.spark.sql.Column) =
      element_at(col("vals"), idx.cast("int"))
    val j = col("j")
    val est = sk.select(
      col("grp"),
      col("j"),
      at(lit(1)).as("est_min"),
      at(((j + 3) / 4).cast("long")).as("est_p25"),
      at(((j + 1) / 2).cast("long")).as("est_p50"),
      at(((j * 3 + 3) / 4).cast("long")).as("est_p75"),
      at(j).as("est_max")
    )
    val wr = Window.partitionBy(col("grp")).orderBy(col("v").asc)
    val wn = Window.partitionBy(col("grp"))
    val n = col("n")
    val exact = rows
      .select(col("grp"), col("v"))
      .withColumn("rv", row_number().over(wr).cast("long"))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy(col("grp"))
      .agg(
        first(col("n")).as("n"),
        max(when(col("rv") === 1L, col("v"))).as("exact_min"),
        max(when(col("rv") === ((n + 3) / 4).cast("long"), col("v")))
          .as("exact_p25"),
        max(when(col("rv") === ((n + 1) / 2).cast("long"), col("v")))
          .as("exact_p50"),
        max(when(col("rv") === ((n * 3 + 3) / 4).cast("long"), col("v")))
          .as("exact_p75"),
        max(when(col("rv") === n, col("v"))).as("exact_max")
      )
    exact
      .join(est, Seq("grp"))
      .select(
        col("grp").as("l_returnflag"),
        col("n"), col("j"),
        col("exact_min"), col("exact_p25"), col("exact_p50"),
        col("exact_p75"), col("exact_max"),
        col("est_min"), col("est_p25"), col("est_p50"),
        col("est_p75"), col("est_max")
      )
  }
}
