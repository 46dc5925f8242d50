package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The shared co-purchase graph seam (round-10 verdict item 1):
  * q445/q460/q465/q474 must all read [[CoPurchaseGraph.edges]] — the
  * plan-identity tests pin the call graph, so a future edit that
  * re-inlines the edge derivation in one consumer (the proven
  * divergence risk) fails here. Plus semantics of the new bounded
  * truss peel and the extracted BFS engine on hand-built graphs.
  */
class CoPurchaseGraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def containsEdgesSubtree(df: DataFrame): Boolean = {
    val seam = CoPurchaseGraph.edges(spark, sf).queryExecution.analyzed
    df.queryExecution.analyzed.exists(_.sameResult(seam))
  }

  test("q445, q460, q474 plans contain the shared edge-seam subtree") {
    // (q465 consumes the seam too, but its frontier loop runs eagerly
    // at construction — pinned separately below via bfsLevelHistogram)
    assert(containsEdgesSubtree(Relational.coPurchaseTriangles(spark, sf)))
    assert(containsEdgesSubtree(Relational.coPurchaseEdgeSupport(spark, sf)))
    graft.util.Caches.releaseAll()
  }

  test("edgeSupport over a known graph: K4=2, pendant tri=1, bridge=0") {
    import spark.implicits._
    // K4 on {0,1,2,3}; pendant triangle {4,5,6}; bridge 3-4
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val tri = Seq((4L, 5L), (4L, 6L), (5L, 6L))
    val edges = (k4 ++ tri :+ ((3L, 4L))).toDF("u", "v")
    val got = CoPurchaseGraph
      .edgeSupport(edges)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    k4.foreach(e => assert(got(e) == 2L, s"K4 edge $e"))
    tri.foreach(e => assert(got(e) == 1L, s"triangle edge $e"))
    assert(got((3L, 4L)) == 0L, "bridge")
  }

  test("boundedTrussClasses: bridge→2, pendant tri→3, K4→4") {
    import spark.implicits._
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val tri = Seq((4L, 5L), (4L, 6L), (5L, 6L))
    val edges = (k4 ++ tri :+ ((3L, 4L))).toDF("u", "v")
    val got = CoPurchaseGraph
      .boundedTrussClasses(spark, edges, peelRounds = 4)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(2L -> 1L, 3L -> 3L, 4L -> 6L))
  }

  test("truss peel cascades: triangle strip peels inward") {
    import spark.implicits._
    // strip of triangles sharing edges: 0-1-2, 1-2-3, 2-3-4 —
    // shared edges (1,2) and (2,3) have support 2, the rest 1; round
    // 1 peels the support-1 edges, killing ALL triangles, so round 2
    // peels (1,2)/(2,3) down to support 0 → nothing survives class 4
    val edges = Seq(
      (0L, 1L), (0L, 2L), (1L, 2L),
      (1L, 3L), (2L, 3L),
      (2L, 4L), (3L, 4L)
    ).toDF("u", "v")
    val got = CoPurchaseGraph
      .boundedTrussClasses(spark, edges, peelRounds = 4)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(2L -> 0L, 3L -> 7L, 4L -> 0L))
  }

  test("bounded peel: cap binds and early-exits are no-ops") {
    import spark.implicits._
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val edges = k4.toDF("u", "v")
    // fixpoint from round 1: every cap gives the same census
    val a = CoPurchaseGraph
      .boundedTrussClasses(spark, edges, 1).collect().toSeq
    val b = CoPurchaseGraph
      .boundedTrussClasses(spark, edges, 4).collect().toSeq
    assert(a.sortBy(_.getLong(0)) == b.sortBy(_.getLong(0)))
  }

  test("densestSubgraphPeel: star peels away, clique core survives") {
    import spark.implicits._
    // hub 0 with spokes 1..20 (deg 1) plus a disjoint K5 on 100..104
    val star = (1L to 20L).map(i => (0L, i))
    val k5 = for (a <- 100L to 104L; b <- (a + 1) to 104L) yield (a, b)
    val got = CoPurchaseGraph
      .densestSubgraphPeel(spark, (star ++ k5).toDF("u", "v"), rounds = 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)
      .toSeq
    // round 0: n=26, m=30, micro=floor((60e6+26)/52); threshold
    // deg·26 > 90 keeps hub (20) and K5 (4), drops the spokes.
    // round 1: hub is isolated but peels only NEXT round — n=6,
    // m=10; threshold deg·6 > 30 keeps nobody → loop ends, and the
    // best density is the round-1 core.
    assert(got == Seq(
      (0L, 26L, 30L, 1153846L, 0L),
      (1L, 6L, 10L, 1666667L, 1L)
    ))
  }

  test("densestSubgraphPeel: single round, is_best on the only row") {
    import spark.implicits._
    // K4: every deg 3, 3·4 = 12 <= 3·6 = 18 → everything peels in
    // round 0's peel, so only the round-0 row is emitted and flagged
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val got = CoPurchaseGraph
      .densestSubgraphPeel(spark, k4.toDF("u", "v"), rounds = 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq
    assert(got == Seq((0L, 4L, 6L, 1500000L, 1L)))
  }

  test("boundedCorenessCensus: path=1, triangle=2, K5=4") {
    import spark.implicits._
    val path = Seq((0L, 1L), (1L, 2L))
    val tri = Seq((10L, 11L), (11L, 12L), (10L, 12L))
    val k5 = for (a <- 20L to 24L; b <- (a + 1) to 24L) yield (a, b)
    val got = CoPurchaseGraph
      .boundedCorenessCensus(
        spark, (path ++ tri ++ k5).toDF("u", "v"),
        maxK = 4, roundsPerLevel = 3)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 0L, 4L -> 5L))
  }

  test("boundedCorenessCensus: the round cap binds on a long path") {
    import spark.implicits._
    // path of 20 nodes: level-2 peel strips one node per end per
    // round; with 3 rounds only 6 leave as class 1, then the whole
    // 14-node remnant (deg ≤ 2 < 3) falls in level 3's first round
    val chain = (0L until 19L).map(i => (i, i + 1))
    val got = CoPurchaseGraph
      .boundedCorenessCensus(spark, chain.toDF("u", "v"),
        maxK = 4, roundsPerLevel = 3)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(1L -> 6L, 2L -> 14L, 3L -> 0L, 4L -> 0L))
  }

  test("bfsLevelHistogram: chain levels, disconnected at -1, hop cap") {
    import spark.implicits._
    // path 0-1-2-3 plus disconnected pair 10-11
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L)).toDF("u", "v")
    val sym = CoPurchaseGraph.symmetric(edges)
    val got = CoPurchaseGraph
      .bfsLevelHistogram(spark, sym, seed = 0L, maxHops = 20)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(-1L -> 2L, 0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
    // hop cap: 25-chain cut at 3 hops → 4 reached, 21 at -1
    val chain = (0L until 24L).map(i => (i, i + 1)).toDF("u", "v")
    val capped = CoPurchaseGraph
      .bfsLevelHistogram(
        spark, CoPurchaseGraph.symmetric(chain), seed = 0L, maxHops = 3)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(capped == Map(-1L -> 21L, 0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
