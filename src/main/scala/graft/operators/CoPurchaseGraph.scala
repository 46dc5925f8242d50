package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared co-purchase graph seam consumed by every graph query
  * over the part-coöccurrence network (q445 triangle census, q460
  * edge support, q465 BFS levels, q474 truss peel): parts are nodes,
  * an edge joins two parts that co-occur in at least one order.
  * Extracted because the edge derivation + degree-ordered wedge
  * machinery was pasted per-query (round-10 verdict item 1) — one
  * definition means one place for the orientation invariants, and a
  * plan-identity spec pins that the consumers actually read it.
  *
  * Scale notes (the 100 TB stance, shared by all consumers):
  *  - Pair generation is within-order (Σ fanout² over orders, bounded
  *    by the q399 basket profile), never parts².
  *  - Triangle enumeration uses degree-ordered orientation (Cohen,
  *    "Graph twiddling in a MapReduce world", CiSE 2009; Suri &
  *    Vassilvitskii, WWW 2011): each undirected edge points to its
  *    (degree, id)-larger endpoint, so out-degrees are O(√m) and the
  *    wedge self-join generates O(m^1.5) candidates worst-case — a
  *    hub node cannot go quadratic. Wedges close via ONE hash join
  *    against the canonical edge set.
  *  - Every helper below takes the edge frame as an argument (not
  *    (spark, dir)) so iterative algorithms (truss peel) can re-run
  *    support on a SHRINKING edge set without re-deriving the graph.
  */
object CoPurchaseGraph {
  import graft.util.Caches._

  /** Canonical undirected edge set (u < v), distinct, cacheTracked —
    * every consumer reads it at least twice (wedge closure + counts).
    */
  def edges(spark: SparkSession, dir: String): DataFrame = {
    val op = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct()
    val a = op.select(col("l_orderkey"), col("l_partkey").as("u"))
    val b = op.select(col("l_orderkey"), col("l_partkey").as("v"))
    a
      .join(b, Seq("l_orderkey"))
      .filter(col("u") < col("v"))
      .select(col("u"), col("v"))
      .distinct()
      .cacheTracked()
  }

  /** Repeat co-purchase edges: canonical (u, v) pairs that co-occur
    * in at least `minOrders` DISTINCT orders — the signal subgraph
    * (one shared basket is noise; repetition is affinity). Same
    * within-order pair generation as [[edges]], with the distinct
    * replaced by a count-filter aggregate (identical shuffle shape).
    */
  def repeatEdges(
      spark: SparkSession,
      dir: String,
      minOrders: Int
  ): DataFrame = {
    val op = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct()
    val a = op.select(col("l_orderkey"), col("l_partkey").as("u"))
    val b = op.select(col("l_orderkey"), col("l_partkey").as("v"))
    a
      .join(b, Seq("l_orderkey"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minOrders)
      .select(col("u"), col("v"))
      .cacheTracked()
  }

  /** Per-node degree (n, deg) of a canonical (u, v) edge frame. */
  def degrees(edges: DataFrame): DataFrame =
    edges
      .select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("deg"))

  /** Degree-ordered orientation (src, dst): each edge points to its
    * (degree, id)-larger endpoint — out-degree O(√m).
    */
  def oriented(edges: DataFrame, deg: DataFrame): DataFrame = {
    val toV = (col("du") < col("dv")) ||
      (col("du") === col("dv") && col("u") < col("v"))
    edges
      .join(deg.select(col("n").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        when(toV, col("u")).otherwise(col("v")).as("src"),
        when(toV, col("v")).otherwise(col("u")).as("dst")
      )
  }

  /** Closed wedges = triangles as (src, x, y) with x < y and src the
    * orientation apex: the O(m^1.5) candidate join closed by one
    * left-semi probe into the canonical edge set.
    */
  def triangles(edges: DataFrame): DataFrame =
    triangles(edges, degrees(edges))

  /** As [[triangles]] with a caller-prepared (possibly cached) degree
    * frame — q445 reads degrees twice (orientation + wedge count) and
    * passes its cacheTracked copy.
    */
  def triangles(edges: DataFrame, deg: DataFrame): DataFrame = {
    val or = oriented(edges, deg)
    val w1 = or.select(col("src"), col("dst").as("x"))
    val w2 = or.select(col("src"), col("dst").as("y"))
    // Both joins are hinted shuffled-hash: the probe stream is the
    // O(m^1.5) wedge-candidate set — orders of magnitude bigger than
    // either build side (the oriented edges keyed by src, and the
    // canonical edge set keyed by (u, v)) — and a sort-merge join
    // would SORT that stream (measured: the closure sort+merge was
    // the single hottest stage of every triangle consumer). The
    // build sides are hash-partitioned edge slices: per-partition
    // size is m / P, uniform by construction, so the SHJ build fits
    // task memory at any scale where the shuffle itself is sized
    // sanely — exactly the guide's SMJ-vs-SHJ trade.
    w1
      .join(w2.hint("shuffle_hash"), Seq("src"))
      .filter(col("x") < col("y"))
      .join(
        edges.hint("shuffle_hash"),
        col("x") === edges("u") && col("y") === edges("v"),
        "left_semi"
      )
  }

  /** Per-node incident-triangle counts (n, tri) over a triangle
    * frame from [[triangles]] — each closed wedge (src, x, y) is one
    * distinct triangle and credits all three corners. The node-side
    * companion of [[edgeSupport]]: support says how reinforced each
    * EDGE is, this says how closed each NODE's neighborhood is (the
    * local-clustering numerator). Nodes in no triangle are absent;
    * consumers left-join and coalesce to 0.
    */
  def nodeTriangleCounts(tri: DataFrame): DataFrame =
    tri
      .select(
        explode(array(col("src"), col("x"), col("y"))).as("n")
      )
      .groupBy(col("n"))
      .agg(count(lit(1)).as("tri"))

  /** Per-edge triangle support over ANY canonical edge frame —
    * support-0 edges kept via the left join (they are the bridges).
    * Output (u, v, support); this is the frame k-truss peels on, so
    * it recomputes degrees/orientation from the argument, never from
    * the full graph.
    */
  def edgeSupport(edges: DataFrame): DataFrame = {
    // each triangle (src, x, y) supports its three canonical edges
    val triEdges = triangles(edges).select(
      explode(
        array(
          struct(least(col("src"), col("x")).as("u"),
            greatest(col("src"), col("x")).as("v")),
          struct(least(col("src"), col("y")).as("u"),
            greatest(col("src"), col("y")).as("v")),
          struct(col("x").as("u"), col("y").as("v"))
        )
      ).as("e")
    )
    val support = triEdges
      .groupBy(col("e.u").as("u"), col("e.v").as("v"))
      .agg(count(lit(1)).as("support"))
    edges
      .join(support, Seq("u", "v"), "left")
      .select(
        col("u"),
        col("v"),
        coalesce(col("support"), lit(0L)).as("support")
      )
  }

  /** Both-direction (src, dst) frame for frontier walks (BFS). */
  def symmetric(edges: DataFrame): DataFrame =
    edges
      .select(col("u").as("src"), col("v").as("dst"))
      .unionByName(edges.select(col("v").as("src"), col("u").as("dst")))

  /** [[symmetric]] hash-partitioned AND sorted by `src` — the frame a
    * frontier loop should cache: every BFS round joins it on `src`,
    * and with the partitioning + ordering established ONCE (and
    * preserved by the cache), each round's sort-merge join shuffles
    * and sorts only the frontier side. Without this the full edge
    * frame was re-exchanged and re-sorted every hop (measured: the
    * six biggest stages of q490 were all sym re-shuffles).
    */
  def symmetricBySrc(edges: DataFrame): DataFrame =
    symmetric(edges)
      .repartition(col("src"))
      .sortWithinPartitions(col("src"))

  /** Bounded truss-class census — the k-truss decomposition peel
    * (Cohen, "Trusses: cohesive subgraphs for social network
    * analysis", NSA 2008) run on [[edgeSupport]]'s seam, capped the
    * way q465 caps BFS hops. Classes:
    *
    *   - truss_k = 2: edges in no triangle (outside the 3-truss).
    *     EXACT in one round — a support-0 edge belongs to no
    *     triangle, so removing it changes no other edge's support
    *     and the peel cannot cascade.
    *   - truss_k = 3: edges peeled during the 4-truss phase
    *     (support < 2 within the current subgraph), at most
    *     `peelRounds` recompute-support-and-peel rounds.
    *   - truss_k = 4: survivors — the bounded 4-truss.
    *
    * The full decomposition is unbounded in rounds (measured 63–98
    * fixpoint rounds on the sf co-purchase graphs); a production
    * engine caps peel rounds exactly like BFS hops, and the cap is
    * part of the operator's contract so the DuckDB oracle can unroll
    * the identical rounds. Early exit on a fixpoint round is a pure
    * optimization: once no edge peels, further rounds are no-ops, so
    * the capped result is unchanged.
    *
    * Scale: each round is one [[edgeSupport]] pass over the CURRENT
    * (shrinking) edge set — O(m^1.5) wedge candidates, hub-safe —
    * with `localCheckpoint` truncating lineage per round (the CC/BFS
    * discipline); per-round driver state is one scalar count.
    */
  def boundedTrussClasses(
      spark: SparkSession,
      edges: DataFrame,
      peelRounds: Int
  ): DataFrame = {
    val nAll = edges.count()
    // Enumerate triangles ONCE (the only wedge join in the whole
    // peel) as their three canonical (u < v) edges. The peel only
    // ever REMOVES edges, so every round's live triangles are
    // exactly the initial triangles whose three edges all survive —
    // support is MAINTAINED by killing triangles that lost an edge,
    // never recomputed by re-wedging (the standard truss-peel
    // optimization; at 100 TB the re-wedge would dominate every
    // round, the kill join is bounded by the peeled set).
    // The INITIAL triangle frame is cacheTracked (not checkpointed):
    // the first support pass materializes the wedge join AND
    // aggregates it in one action, and the cache is the derive-once
    // artifact of the whole peel — deterministic lineage, so it is
    // also the only frame a steady-state re-run can reuse. Later
    // rounds' frames are lazy localCheckpoints instead: their plans
    // embed per-run checkpoint RDDs (never reusable), and checkpoint
    // blocks live OUTSIDE the CacheManager — unpersisting a
    // superseded round's CACHE entry would invalidate and recompile
    // every dependent entry (SPARK-24596 non-cascading semantics),
    // which made each round re-run the wedge join (measured
    // 6 s → 18 s). Superseded rounds' RDD blocks are reclaimed by
    // the ContextCleaner once the loop reassigns `tri`, so residency
    // stays bounded at the initial frame plus the current round.
    var tri = triangles(edges)
      .select(
        least(col("src"), col("x")).as("u1"),
        greatest(col("src"), col("x")).as("v1"),
        least(col("src"), col("y")).as("u2"),
        greatest(col("src"), col("y")).as("v2"),
        col("x").as("u3"),
        col("y").as("v3")
      )
      .cacheTracked()
    def support(t: DataFrame): DataFrame = t
      .select(
        explode(
          array(
            struct(col("u1").as("u"), col("v1").as("v")),
            struct(col("u2").as("u"), col("v2").as("v")),
            struct(col("u3").as("u"), col("v3").as("v"))
          )
        ).as("e")
      )
      .groupBy(col("e.u").as("u"), col("e.v").as("v"))
      .agg(count(lit(1)).as("support"))
    // 3-truss in one exact round: the support frame contains exactly
    // the triangle edges, and no triangle dies (its own edges are by
    // definition in a triangle). Invariant from here on: every live
    // triangle has all three edges alive, so the support frame is
    // always a SUBSET of the live edge set — each round's survivors
    // come straight off the aggregate, no edge-set join at all, and
    // only peeled edges that sat in a live triangle (support 1, the
    // peel frontier — small, AQE broadcasts it) can kill a triangle;
    // support-0 edges leave silently.
    var sup = support(tri).localCheckpoint(true)
    val n3 = sup.count()
    var nCur = n3
    var r = 0
    var done = nCur == 0L
    while (r < peelRounds && !done) {
      r += 1
      val nNext = sup.filter(col("support") >= 2L).count()
      if (nNext == nCur) done = true
      else {
        nCur = nNext
        if (r < peelRounds) {
          val frontier = sup
            .filter(col("support") === 1L)
            .select(col("u"), col("v"))
          tri = tri
            .join(
              frontier.select(col("u").as("u1"), col("v").as("v1")),
              Seq("u1", "v1"), "left_anti")
            .join(
              frontier.select(col("u").as("u2"), col("v").as("v2")),
              Seq("u2", "v2"), "left_anti")
            .join(
              frontier.select(col("u").as("u3"), col("v").as("v3")),
              Seq("u3", "v3"), "left_anti")
            .localCheckpoint(false)
          // materializes the new tri checkpoint in the same action;
          // the superseded round's checkpoint RDD is now unreferenced
          // and the ContextCleaner reclaims its blocks
          sup = support(tri).localCheckpoint(true)
        }
      }
    }
    import spark.implicits._
    Seq((2L, nAll - n3), (3L, n3 - nCur), (4L, nCur))
      .toDF("truss_k", "n_edges")
  }

  /** Bounded densest-subgraph peel — Charikar's greedy 2-approximation
    * (Charikar, APPROX 2000) in its MapReduce batch form (Bahmani,
    * Kumar & Vassilvitskii, "Densest subgraph in streaming and
    * MapReduce", VLDB 2012): instead of removing ONE minimum-degree
    * node per step (O(n) sequential rounds), each round removes EVERY
    * node whose degree is ≤ 2(1+ε) times the current average density
    * — with ε = 1/2 the threshold is deg ≤ 3·m/n, checked in exact
    * integers as deg·n ≤ 3·m, and the round count drops to
    * O(log n / ε) for a 2(1+ε)-approximation of the maximum-density
    * subgraph. The canonical "find the spam/template farm" operator:
    * the best-density prefix of the peel is the near-clique core the
    * pairwise operators (triangles → support → truss) circle but
    * never rank.
    *
    * Contract mirrors [[boundedTrussClasses]]: the round cap is part
    * of the operator (the DuckDB oracle unrolls identical rounds);
    * one row per surviving round r = 0..rounds with the state BEFORE
    * that round's peel — n_nodes, n_edges, density_micro =
    * half-up(m·10⁶/n) — and is_best = 1 on the densest emitted round
    * (ties → earliest round), decided on the EMITTED micro value so
    * both engines agree mechanically. Rounds after the graph empties
    * emit nothing.
    *
    * Scale: each round is one degree aggregate + two semi-joins of
    * the edge frame against the survivor set — keyed shuffles only,
    * never a wedge join; driver state is two scalars per round; the
    * superseded edge cache is released as soon as the next round's
    * (eagerly checkpointed) edge set materializes. Every graph has a
    * node of degree ≤ 2m/n < 3m/n, so each round peels a constant
    * fraction — the hub-adversarial ScaleBench row pins that a
    * planted clique survives a 1M-spoke star in these few rounds.
    */
  def densestSubgraphPeel(
      spark: SparkSession,
      edges: DataFrame,
      rounds: Int
  ): DataFrame = {
    var e = edges.localCheckpoint(true)
    var n = e
      .select(explode(array(col("u"), col("v"))).as("id"))
      .distinct()
      .count()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var r = 0L
    var done = n == 0L
    while (r <= rounds && !done) {
      val m = e.count()
      // half-up(m·10⁶/n): the Scala twin of sqlMicroRatio, n > 0
      out += ((r, n, m, (2L * m * 1000000L + n) / (2L * n)))
      if (r < rounds) {
        val deg = e
          .select(explode(array(col("u"), col("v"))).as("id"))
          .groupBy(col("id"))
          .agg(count(lit(1)).as("deg"))
        // survivors: deg·n > 3·m (isolated and below-average-ish
        // nodes peel; a deg-0 node never reaches the deg frame and
        // is peeled implicitly)
        val keep = deg
          .filter(col("deg") * lit(n) > lit(3L) * lit(m))
          .select(col("id"))
          .localCheckpoint(true)
        val nNext = keep.count()
        if (nNext == 0L) done = true
        else {
          val prevE = e
          e = e
            .join(keep.select(col("id").as("u")), Seq("u"), "left_semi")
            .join(keep.select(col("id").as("v")), Seq("v"), "left_semi")
            .localCheckpoint(true)
          prevE.unpersist(blocking = false)
          n = nNext
        }
      }
      r += 1
    }
    val best = out.maxBy { case (rr, _, _, micro) => (micro, -rr) }._1
    import spark.implicits._
    out.toSeq
      .map { case (rr, nn, mm, micro) =>
        (rr, nn, mm, micro, if (rr == best) 1L else 0L)
      }
      .toDF("round", "n_nodes", "n_edges", "density_micro", "is_best")
  }

  /** Bounded coreness census — the k-core decomposition (Seidman,
    * "Network structure and minimum degree", Social Networks 1983;
    * distributed peel: Montresor/De Pellegrini/Miorandi, TPDS 2013)
    * run level-by-level with a bounded round cap, the NODE-side
    * completion of the cohesion ladder: triangles/support/truss
    * classify EDGES by mutual reinforcement, the densest peel finds
    * one extremal subgraph — coreness assigns every node its depth
    * in the nested k-core hierarchy (q315's 2-core audit is the
    * k = 2 slice of this census).
    *
    * Contract (the q474/q482 pattern): for level k = 2..maxK, peel
    * nodes with degree < k for at most `roundsPerLevel` rounds (the
    * full cascade is unbounded; the cap is part of the operator and
    * the DuckDB oracle unrolls the identical rounds — early exit on
    * a fixpoint round changes nothing). Nodes removed during level
    * k's peel have bounded coreness k−1; level-maxK survivors are
    * the bounded maxK-core. Output: (core_k, n_nodes) for k =
    * 1..maxK.
    *
    * Scale: each round is one degree aggregate + two semi-joins on
    * the shrinking edge set — keyed shuffles only, lineage truncated
    * per round, driver state one scalar per round.
    */
  def boundedCorenessCensus(
      spark: SparkSession,
      edges: DataFrame,
      maxK: Int,
      roundsPerLevel: Int
  ): DataFrame = {
    var e = edges.localCheckpoint(true)
    var nodes = e
      .select(explode(array(col("u"), col("v"))).as("id"))
      .distinct()
      .localCheckpoint(true)
    var nCur = nodes.count()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for (k <- 2 to maxK) {
      val levelStart = nCur
      var r = 0
      var done = nCur == 0L
      while (r < roundsPerLevel && !done) {
        r += 1
        val deg = e
          .select(explode(array(col("u"), col("v"))).as("id"))
          .groupBy(col("id"))
          .agg(count(lit(1)).as("deg"))
        // isolated survivors have no deg row → removed by the semi-
        // join exactly as deg-0 nodes must be at any k ≥ 1
        val keep = nodes
          .join(
            deg.filter(col("deg") >= k).select(col("id")),
            Seq("id"),
            "left_semi"
          )
          .localCheckpoint(true)
        val nNext = keep.count()
        if (nNext == nCur) done = true
        else {
          val prevE = e
          e = e
            .join(keep.select(col("id").as("u")), Seq("u"), "left_semi")
            .join(keep.select(col("id").as("v")), Seq("v"), "left_semi")
            .localCheckpoint(true)
          prevE.unpersist(blocking = false)
          nodes = keep
          nCur = nNext
        }
      }
      out += ((k - 1L, levelStart - nCur))
    }
    out += ((maxK.toLong, nCur))
    import spark.implicits._
    out.toSeq.toDF("core_k", "n_nodes")
  }

  /** BFS level histogram over a caller-prepared symmetric (src, dst)
    * frame — frontier expansion from `seed`, `maxHops`-capped,
    * unreached nodes at level −1; the engine behind q465 and the
    * ScaleBench diameter row. Each round is one frontier-keyed hash
    * join + an anti-join against the visited set (frontier-sized,
    * not graph-sized) with `localCheckpoint` truncating lineage.
    */
  def bfsLevelHistogram(
      spark: SparkSession,
      sym: DataFrame,
      seed: Long,
      maxHops: Int
  ): DataFrame = {
    val nodes = sym.select(col("src").as("id")).distinct()
    nodes
      .join(bfsLevelsFrom(spark, sym, seed, maxHops), Seq("id"), "left")
      .select(coalesce(col("lvl"), lit(-1L)).as("lvl"))
      .groupBy(col("lvl"))
      .agg(count(lit(1)).as("n_nodes"))
  }

  /** The frontier-expansion core of [[bfsLevelHistogram]]: per-node
    * minimum hop distance (id, lvl) for every node REACHED from
    * `seed` within `maxHops` (the seed itself at lvl 0). Unreached
    * nodes are absent — the histogram's -1 class is its caller's
    * left-join, and eccentricity consumers (double sweep) read the
    * frame's max directly. Per round: one frontier-keyed join + an
    * anti-join against the visited set, lineage truncated.
    */
  def bfsLevelsFrom(
      spark: SparkSession,
      sym: DataFrame,
      seed: Long,
      maxHops: Int
  ): DataFrame = {
    var levels = spark
      .range(1)
      .select(lit(seed).as("id"), lit(0L).as("lvl"))
      .localCheckpoint(true)
    var frontier = levels
    var lvl = 1L
    var done = false
    while (lvl <= maxHops && !done) {
      val next = frontier
        .join(sym, frontier("id") === sym("src"))
        .select(col("dst").as("id"))
        .distinct()
        .join(levels, Seq("id"), "left_anti")
        .select(col("id"), lit(lvl).as("lvl"))
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        // the union IS re-checkpointed each round: measured against
        // the flat-union alternative (children are lineage-free, so
        // correctness allows it), consolidating the visited set into
        // one compact RDD kept every later round's anti-join at a
        // constant small stage count and was ~40% faster overall —
        // the O(hops²) re-copy is cheaper than O(hops) extra stages
        // per round on a frontier-sized frame
        levels = levels.unionByName(next).localCheckpoint(true)
        frontier = next
        lvl += 1
      }
    }
    levels
  }
}
