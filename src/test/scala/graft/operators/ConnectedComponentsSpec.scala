package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ConnectedComponents must agree with a driver-side union-find on
  * random graphs (seeded) and on adversarial shapes: chains (worst
  * diameter), singletons, duplicate/self-loop edges, merging stars.
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Reference union-find. */
  private def ufLabels(
      nodes: Seq[Long],
      edges: Seq[(Long, Long)]
  ): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // root to min member
    val minOfRoot = nodes.groupBy(find).map { case (r, ms) => r -> ms.min }
    nodes.map(n => n -> minOfRoot(find(n))).toMap
  }

  private def check(nodes: Seq[Long], edges: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val n = nodes.toDF("id")
    val e = edges.toDF("src", "dst")
    val got = ConnectedComponents
      .run(n, e)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == ufLabels(nodes, edges))
  }

  test("empty edge set: every node is its own cluster") {
    check(Seq(1L, 2L, 3L), Seq.empty)
  }

  test("chain (worst-case diameter) collapses to the minimum") {
    val n = (0L until 64L)
    check(n, n.sliding(2).map(s => (s(1), s(0))).toSeq)
  }

  test("two stars merged by one bridge edge") {
    val edges = Seq.tabulate(5)(i => (100L, 101L + i)) ++
      Seq.tabulate(5)(i => (200L, 201L + i)) :+ (105L, 205L)
    check(edges.flatMap(e => Seq(e._1, e._2)).distinct :+ 999L, edges)
  }

  test("self-loops and duplicate edges are harmless") {
    check(Seq(1L, 2L, 3L), Seq((1L, 1L), (2L, 3L), (3L, 2L), (2L, 3L)))
  }

  test("random graphs match union-find (seeded)") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val n = 200
      val nodes = (0L until n.toLong)
      val edges = Seq.fill(150)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      )
      check(nodes, edges)
    }
  }
}
