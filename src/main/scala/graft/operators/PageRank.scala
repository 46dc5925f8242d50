package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed PageRank — link analysis over an edge list, the
  * importance signal a corpus pipeline derives from its document
  * graph (citation/hyperlink/near-dup structure) for sampling weights
  * and quality priors.
  *
  * Power iteration in relational form: each round is one join
  * (ranks ⋈ out-edges on src) and one aggregate (contributions by
  * dst) — two key-shuffles, never a matrix. The edge table carries
  * its out-degree from a single precomputed pass and is checkpointed
  * once; ranks are lineage-truncated per round (`localCheckpoint`,
  * lazy — the round's single action materializes it), so the plan
  * stays O(1) deep across iterations exactly like
  * [[ConnectedComponents]]. On a symmetric graph every node has
  * out-edges, so no dangling-mass correction is needed; the general
  * directed form adds the standard dangling redistribution term.
  *
  * Literature: Page et al., "The PageRank Citation Ranking" (1999);
  * the join+aggregate round is the standard Pregel/GraphX
  * formulation re-expressed as two relational shuffles.
  */
object PageRank {

  /** @param edges directed `src`/`dst` (long) edges; every node must
    *              appear as a source (guaranteed for symmetrized
    *              graphs) — nodes absent from `src` would leak rank
    * @return (id, rank) after `iterations` rounds from the uniform
    *         start, damping `d`: r ← (1−d)/N + d·Σ r(u)/deg(u)
    */
  def run(
      edges: DataFrame,
      iterations: Int,
      damping: Double = 0.85
  ): DataFrame = {
    // materialize the edge list once: out-degree, N, initial ranks
    // and the per-round join all derive from it, and upstream edge
    // generation (e.g. q86's shingle self-join) is the expensive part
    // — without this it would re-execute for each derivation
    val e = edges.localCheckpoint(true)
    val out = e
      .groupBy(col("src"))
      .agg(count(lit(1)).as("out_deg"))
      .localCheckpoint(true)
    val withDeg = e
      .join(out, "src")
      .select(col("src"), col("dst"), col("out_deg"))
      // partition + sort by the per-round join key once — the
      // checkpoint preserves both, so each iteration's join
      // shuffles/sorts only the (node-sized) ranks side
      .repartition(col("src"))
      .sortWithinPartitions(col("src"))
      .localCheckpoint(true)
    val n = out.count()
    val teleport = (1.0 - damping) / n
    var ranks = out
      .select(col("src").as("id"), (lit(1.0) / n).as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      ranks = withDeg
        .join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst"), (col("rank") / col("out_deg")).as("contrib"))
        .groupBy(col("dst"))
        .agg((lit(teleport) + lit(damping) * sum(col("contrib"))).as("rank"))
        .select(col("dst").as("id"), col("rank"))
        .localCheckpoint(false)
      ranks.count(): Unit // the round's one materializing action
    }
    ranks
  }

  /** Personalized PageRank (Page et al. 1999 §6; Jeh & Widom, "Scaling
    * personalized web search", WWW 2003): the teleport distribution is
    * uniform over a SEED SET instead of over all nodes — r ←
    * (1−d)/|S|·1_S + d·Σ r(u)/deg(u), started from the seed
    * distribution. Rank mass stays localized around the seeds, which
    * is both the semantics (affinity TO the seeds) and the scale
    * story: the ranks frame only ever holds nodes within t hops of a
    * seed after t rounds, so on a 100 TB graph with a small seed set
    * the per-round join touches the seed neighborhood, not the graph.
    *
    * Same relational round as [[run]]: one join + one aggregate, then
    * a full-outer stitch with the (seed-sized) teleport frame. No
    * dangling-mass term for the same reason as [[run]] — callers pass
    * symmetrized graphs, and seeds are required to be graph nodes
    * (enforced by the caller's semi-join) so every ranked node has
    * out-edges and total mass stays exactly 1.
    */
  def personalized(
      edges: DataFrame,
      seeds: DataFrame,
      iterations: Int,
      damping: Double = 0.85
  ): DataFrame = {
    val e = edges.localCheckpoint(true)
    val out = e
      .groupBy(col("src"))
      .agg(count(lit(1)).as("out_deg"))
      .localCheckpoint(true)
    val withDeg = e
      .join(out, "src")
      .select(col("src"), col("dst"), col("out_deg"))
      // src-partitioned+sorted once — see run()
      .repartition(col("src"))
      .sortWithinPartitions(col("src"))
      .localCheckpoint(true)
    val sd = seeds.select(col("id")).distinct().localCheckpoint(true)
    val k = sd.count()
    require(k > 0L, "personalized: empty seed set")
    val tele = sd
      .select(col("id"), lit((1.0 - damping) / k).as("t"))
      .localCheckpoint(true)
    var ranks = sd
      .select(col("id"), lit(1.0 / k).as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contrib = withDeg
        .join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst"), (col("rank") / col("out_deg")).as("c"))
        .groupBy(col("dst"))
        .agg((lit(damping) * sum(col("c"))).as("cs"))
        .select(col("dst").as("id"), col("cs"))
      ranks = contrib
        .join(tele, Seq("id"), "full_outer")
        .select(
          col("id"),
          (coalesce(col("cs"), lit(0.0)) +
            coalesce(col("t"), lit(0.0))).as("rank")
        )
        .localCheckpoint(false)
      ranks.count(): Unit // the round's one materializing action
    }
    ranks
  }

  /** q483: personalized PageRank from the q73 contamination seed set
    * over the q86 near-dup graph — the multi-hop generalization of
    * q379's one-hop blast radius: a doc's score is its stationary
    * affinity to the contaminated set under near-dup transitions, the
    * "how close to contamination" prior a decontamination policy
    * ranks quarantine candidates by. Seeds = q73's 5-gram-flagged
    * docs restricted to graph nodes (an isolated flagged doc has no
    * near-dup neighborhood to spread through — and keeping it would
    * leak teleport mass through a dangling node). 8 rounds, d = 0.85,
    * rounded to 6 places; the oracle replays the identical iteration
    * as chained CTEs (the q86 pattern).
    */
  def contaminationPpr(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(spark, dir)
    val sym = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(
        pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(true)
    val nodes = sym.select(col("src").as("id")).distinct()
    val seeds = Dedup
      .decontaminate(spark, dir)
      .select(col("doc_id").as("id"))
      .join(nodes, Seq("id"), "left_semi")
    personalized(sym, seeds, iterations = 8)
      .select(col("id").as("doc_id"), round(col("rank"), 6).as("rank"))
  }

  /** q86: PageRank over the symmetrized near-dup graph (q21 Jaccard
    * pairs) — rank concentrates in densely-duplicated document
    * families, a duplication-pressure signal per doc. 8 rounds,
    * d = 0.85, output rounded to 6 places (the oracle replays the
    * identical iteration as chained SQL CTEs).
    */
  def nearDupPageRank(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(spark, dir)
    val sym = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(
        pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    run(sym, iterations = 8)
      .select(col("id").as("doc_id"), round(col("rank"), 6).as("rank"))
  }
}
