package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("ranks sum to 1 and stay uniform on a ring") {
    // directed ring: every node has out-degree 1 and in-degree 1 — the
    // uniform distribution is the exact fixpoint at every iteration
    val n = 64
    val edges = (0 until n)
      .map(i => (i.toLong, ((i + 1) % n).toLong))
      .toDF("src", "dst")
    val ranks = PageRank.run(edges, iterations = 5).collect()
    assert(ranks.length == n)
    val total = ranks.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-9, s"mass not conserved: $total")
    ranks.foreach(r =>
      assert(math.abs(r.getDouble(1) - 1.0 / n) < 1e-12,
        s"ring fixpoint must be uniform, got $r"))
  }

  test("hub of a symmetric star outranks the leaves") {
    val leaves = (1L to 20L)
    val edges = (leaves.map(l => (0L, l)) ++ leaves.map(l => (l, 0L)))
      .toDF("src", "dst")
    val ranks = PageRank
      .run(edges, iterations = 10)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(ranks(0L) > ranks(1L) * 5, s"hub should dominate: $ranks")
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
  }

  test("near-dup pagerank rows cover exactly the edged docs") {
    val dir = "/root/testdata/sf0.001"
    val pairs = Dedup.ngramJaccardPairs(spark, dir)
    val nodes = pairs
      .select(col("doc_a").as("id"))
      .unionByName(pairs.select(col("doc_b").as("id")))
      .distinct()
      .count()
    val pr = PageRank.nearDupPageRank(spark, dir)
    assert(pr.count() == nodes)
    assert(pr.filter(col("rank") <= 0).count() == 0)
  }
}
