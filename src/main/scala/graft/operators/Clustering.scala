package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed k-means (Lloyd's algorithm) over the embeddings table —
  * the clustering step of semantic dedup / corpus bucketing in a
  * training-data pipeline (group near-identical meaning, pick per-
  * cluster representatives, or stratify a corpus mix by topic).
  *
  * Scale design (the only k-means topology that works at 100 TB):
  *   - the corpus of vectors is never collected and never shuffled for
  *     the assignment step: centroids (k·dims values — tiny) are
  *     broadcast and each partition computes its argmin locally
  *     (`BroadcastNestedLoopJoin` over a k-row build side);
  *   - the update step is one partial-aggregated key-shuffle of
  *     (cluster, dim, x) cells — map-side combine reduces it to
  *     k·dims rows per partition before the exchange;
  *   - per-round lineage is truncated with an eager `localCheckpoint`
  *     of the k-row centroid frame (checkpoint-to-durable-storage on a
  *     real cluster), so the plan does not grow with iterations.
  *
  * Determinism contract (what the DuckDB oracle replays):
  *   - init = the k lowest-`vec_id` vectors, cluster ids 0..k-1 in
  *     that order;
  *   - distance = Σ_dims (x−c)², accumulated left-to-right in doubles
  *     (`aggregate` over `zip_with` ≡ DuckDB `list_sum` over
  *     `list_transform`, bit-identical);
  *   - argmin ties break on the lower cluster id;
  *   - updated centroid coordinates are rounded to 6 decimals each
  *     round, which absorbs summation-order drift of the distributed
  *     mean (the q69 centroid pattern).
  *
  * Reference tie-in: the reference has no vector ops at all — this is
  * part of the §7.8 LLM-pipeline extension surface (BASELINE.json's
  * "similarity search" bullet), built Spark-first.
  */
object Clustering {

  /** Squared L2 distance between a float-vector column and a
    * double-vector column, folded left-to-right in doubles — the
    * codegen'd [[graft.functions.VectorSqDist]]; [[sqDistHof]] is the
    * interpreted higher-order twin it is differential-tested against.
    */
  private def sqDist(vec: Column, cvec: Column): Column =
    graft.functions.VectorMath.vecSqDist(vec, cvec)

  /** The `aggregate(zip_with(...))` executable spec of [[sqDist]] —
    * identical accumulation order, interpreted per element (~10×
    * slower in the assignment scan).
    */
  def sqDistHof(vec: Column, cvec: Column): Column =
    aggregate(
      zip_with(vec, cvec, (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
      lit(0.0),
      (acc, v) => acc + v
    )

  /** One assignment pass: every vector → (cluster, dist) of its
    * nearest centroid. `centroids` must have (cluster: int/long,
    * c_vec: array<double>) and be small enough to broadcast (it is
    * k rows by construction).
    */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame =
    vectors
      .crossJoin(broadcast(centroids))
      .select(
        col("vec_id"),
        col("cluster"),
        sqDist(col("embedding"), col("c_vec")).as("dist")
      )
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("cluster"))).as("best"))
      .select(
        col("vec_id"),
        col("best.cluster").as("cluster"),
        col("best.dist").as("dist")
      )

  /** One update pass: dim-wise mean per cluster, rounded to 6 places;
    * the vectors are posexploded to (cluster, dim, x) cells so the
    * shuffle carries partially-aggregated sums, never raw vectors.
    * Reassembles one ordered array<double> row per cluster.
    */
  def update(vectors: DataFrame, assigned: DataFrame): DataFrame =
    vectors
      .join(assigned.select(col("vec_id"), col("cluster")), "vec_id")
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("cluster"), col("dim"))
      .agg(round(avg(col("x").cast("double")), 6).as("v"))
      .groupBy(col("cluster"))
      .agg(
        transform(
          array_sort(collect_list(struct(col("dim"), col("v")))),
          s => s.getField("v")
        ).as("c_vec")
      )

  /** Full Lloyd run: `iters` (assign → update) rounds from the
    * deterministic init, then a final assignment against the last
    * centroids. Returns (vec_id, cluster, dist) with dist rounded.
    */
  def kmeansAssign(
      spark: SparkSession,
      dir: String,
      k: Int = 8,
      iters: Int = 2
  ): DataFrame = {
    val e = Tables
      .embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    assign(e, kmeansCentroids(spark, dir, k, iters))
      .select(col("vec_id"), col("cluster"), round(col("dist"), 6).as("dist"))
  }

  /** The converged centroid frame the q93 assignment reads — exposed
    * so downstream audits (q215 silhouette) score against the SAME
    * k-row model instead of re-running Lloyd.
    */
  def kmeansCentroids(
      spark: SparkSession,
      dir: String,
      k: Int = 8,
      iters: Int = 2
  ): DataFrame = {
    val e = Tables
      .embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val init = e
      .orderBy(col("vec_id"))
      .limit(k)
      .withColumn("cluster", row_number().over(Window.orderBy(col("vec_id"))) - 1)
      .select(
        col("cluster"),
        transform(col("embedding"), x => x.cast("double")).as("c_vec")
      )
    var centroids = init.localCheckpoint(true)
    for (_ <- 1 to iters) {
      val a = assign(e, centroids)
      centroids = update(e, a).localCheckpoint(true)
    }
    // k bounded rows -> literal LocalRelation: consumer plans become
    // deterministic (operator caches over the model are reusable) and
    // the assignment broadcast ships literals, not a checkpoint scan
    graft.util.SmallModel.toLocal(centroids, "cluster")
  }

  /** q248: per-cluster label purity and entropy of the q93 k-means
    * clustering — the local companion to q238's global ARI: per
    * cluster, its size, the majority label (ties → smaller label),
    * purity = majority/size, and the label entropy −Σ p ln p. A
    * cluster can be large AND impure (topic mixing two labels) while
    * ARI still looks fine globally; this is the row-level view the
    * q205 cap and q135 dedup decisions should be read against.
    *
    * Scale: the same k×L contingency table as q238 (one corpus
    * join/agg), then per-cluster windows over ≤L rows each. Entropy
    * sums ≤L float terms per cluster — emitted in micro-units.
    */
  def clusterPurity(spark: SparkSession, dir: String): DataFrame = {
    val asg = kmeansAssign(spark, dir).select(col("vec_id"), col("cluster"))
    val lbl = Tables
      .embeddings(spark, dir)
      .select(col("vec_id"), col("label"))
    val ct = asg
      .join(lbl, "vec_id")
      .groupBy(col("cluster"), col("label"))
      .agg(count(lit(1)).as("n_ij"))
    val w = Window
      .partitionBy(col("cluster"))
      .orderBy(col("n_ij").desc, col("label").asc)
    ct.withColumn("rk", row_number().over(w))
      .withColumn(
        "size",
        sum(col("n_ij")).over(Window.partitionBy(col("cluster")))
      )
      .groupBy(col("cluster"))
      .agg(
        max(col("size")).as("size"),
        max(when(col("rk") === 1, col("label"))).as("majority_label"),
        max(when(col("rk") === 1, col("n_ij"))).as("n_majority"),
        round(
          sum(
            -(col("n_ij").cast("double") / col("size"))
              * log(col("n_ij").cast("double") / col("size"))
          ) * 1e6
        ).cast("long").as("entropy_micro")
      )
      .select(
        col("cluster"),
        col("size"),
        col("majority_label"),
        col("n_majority"),
        graft.functions.IntMath
          .microRatio(col("n_majority"), col("size"))
          .as("purity_micro"),
        col("entropy_micro")
      )
  }

  /** q238: Adjusted Rand Index between the q93 k-means clustering and
    * the ground-truth labels (Hubert & Arabie 1985) — the standard
    * external-validation score for "did unsupervised clustering
    * recover the annotation": ARI = (Σ_ij C(n_ij,2) − E) /
    * (½[Σ_i C(a_i,2) + Σ_j C(b_j,2)] − E) with
    * E = Σ_i C(a_i,2)·Σ_j C(b_j,2) / C(n,2), all terms read off the
    * (cluster, label) contingency table. 1 = perfect recovery, 0 =
    * chance. Read alongside q215 (internal silhouette) and q234
    * (per-dimension separability): this is the corpus-level answer.
    *
    * Determinism: every comb term is exact integer arithmetic; the
    * only float ops are the final two divisions of exact integers —
    * IEEE-identical in any engine, emitted in micro-units.
    *
    * Scale: one corpus join/agg to the k×L contingency table
    * (map-side combined, localCheckpoint-truncated like the centroid
    * frame), then three aggregations of that tiny frame. Nothing
    * pairwise — the C(n,2) pair counts are closed-form.
    */
  def clusteringAgreement(spark: SparkSession, dir: String): DataFrame = {
    def comb2(c: Column): Column = (c * (c - 1) / 2).cast("long")
    val asg = kmeansAssign(spark, dir).select(col("vec_id"), col("cluster"))
    val lbl = Tables
      .embeddings(spark, dir)
      .select(col("vec_id"), col("label"))
    val ct = asg
      .join(lbl, "vec_id")
      .groupBy(col("cluster"), col("label"))
      .agg(count(lit(1)).as("n_ij"))
      .localCheckpoint(true)
    val cells = ct.agg(
      sum(comb2(col("n_ij"))).as("comb_cells"),
      sum(col("n_ij")).as("n"),
      countDistinct(col("cluster")).as("n_clusters"),
      countDistinct(col("label")).as("n_labels")
    )
    val ra = ct
      .groupBy(col("cluster"))
      .agg(sum(col("n_ij")).as("a"))
      .agg(sum(comb2(col("a"))).as("comb_a"))
    val cb = ct
      .groupBy(col("label"))
      .agg(sum(col("n_ij")).as("b"))
      .agg(sum(comb2(col("b"))).as("comb_b"))
    val combN = comb2(col("n"))
    val expected = col("comb_a").cast("double") * col("comb_b") / combN
    val ari = (col("comb_cells") - expected) /
      ((col("comb_a") + col("comb_b")) / lit(2.0) - expected)
    cells
      .crossJoin(broadcast(ra))
      .crossJoin(broadcast(cb))
      .select(
        col("n"),
        col("n_clusters"),
        col("n_labels"),
        col("comb_cells"),
        col("comb_a"),
        col("comb_b"),
        round(ari * 1e6).cast("long").as("ari_micro")
      )
  }

  /** q236: label-balanced batch assignment — vectors ranked within
    * their label by vec_id, batch_id = rank − 1, so every batch holds
    * AT MOST one vector per label: the class-balanced batch sampler
    * of contrastive/metric training (in-batch negatives are
    * guaranteed cross-label, so no false negatives from same-class
    * collisions). Deterministic, id-keyed, and a pure rank — the
    * dataloader artifact, not a statistic.
    *
    * Scale: one rank per label partition (at 100 TB the two-level
    * range rank within each label); output is one row per vector.
    */
  def balancedBatches(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("label")).orderBy(col("vec_id"))
    Tables
      .embeddings(spark, dir)
      .select(col("vec_id"), col("label"))
      .withColumn("batch_id", (row_number().over(w) - 1).cast("long"))
  }

  /** q234: label separability — a one-way ANOVA F statistic per
    * embedding dimension, labels as groups:
    * F_d = [Σ_g s1²/n − T²/N]/(G−1) ÷ [Σ_g s2 − Σ_g s1²/n]/(N−G)
    * from per-(label, dim) count/sum/sum-of-squares cells. High-F
    * dimensions separate the labels linearly — the shortcut-risk
    * audit for a training set (a classifier can read the label off
    * those dimensions without learning content) and the feature-
    * selection view for cheap linear probes. All group moments come
    * from ONE partial-aggregated pass; no per-pair or per-centroid
    * work.
    *
    * Scale: one posexplode scan → (label, dim) partial agg (G·dims
    * rows) → dims-row rollup. Output is |dims| rows at any N.
    */
  def labelSeparability(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables
      .embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), col("dim"), col("x").cast("double").as("x"))
      .groupBy(col("label"), col("dim"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2")
      )
    cells
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).as("g"),
        sum(col("n")).as("bign"),
        sum(col("s1")).as("t"),
        sum(col("s1") * col("s1") / col("n")).as("sw"),
        sum(col("s2")).as("ss")
      )
      .select(
        col("dim").cast("long").as("dim"),
        col("g").cast("long").as("n_labels"),
        round(
          ((col("sw") - col("t") * col("t") / col("bign")) /
            (col("g") - 1)) /
            ((col("ss") - col("sw")) / (col("bign") - col("g"))) *
            lit(1e6)
        ).cast("long").as("f_micro")
      )
  }

  /** q215: simplified-silhouette audit of the q93 clustering — per
    * vector, a = distance to its own (nearest) centroid and b =
    * distance to the second-nearest, s = (b−a)/max(a,b) ∈ [0,1] (the
    * centroid-based silhouette of Rousseeuw 1987 as used for large-N
    * cluster validation; the exact pairwise form is O(N²) and never
    * runs at corpus scale). Per cluster: size and mean silhouette in
    * integer micro-units. Low mean silhouette marks clusters whose
    * members sit near a rival centroid — exactly where the q205 cap
    * and q135 semantic dedup make their worst decisions, so this is
    * the confidence gauge read alongside both.
    *
    * Scale: k broadcast centroids × one corpus scan (no shuffle to
    * compute all k distances); the per-vector rank is a k-row window
    * keyed by vec_id; the rollup is k rows. Nothing pairwise.
    */
  def clusterSilhouette(
      spark: SparkSession,
      dir: String,
      k: Int = 8,
      iters: Int = 2
  ): DataFrame = {
    val e = Tables
      .embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val dists = e
      .crossJoin(broadcast(kmeansCentroids(spark, dir, k, iters)))
      .select(
        col("vec_id"),
        col("cluster"),
        sqDist(col("embedding"), col("c_vec")).as("dist")
      )
    val w = Window
      .partitionBy(col("vec_id"))
      .orderBy(col("dist").asc, col("cluster").asc)
    val ab = dists
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy(col("vec_id"))
      .agg(
        min(when(col("rn") === 1, col("dist"))).as("a"),
        min(when(col("rn") === 2, col("dist"))).as("b"),
        min(when(col("rn") === 1, col("cluster"))).as("cluster")
      )
    val sa = sqrt(col("a"))
    val sb = sqrt(col("b"))
    ab
      .withColumn(
        "sil",
        when(greatest(sa, sb) === 0, 0.0)
          .otherwise((sb - sa) / greatest(sa, sb))
      )
      .groupBy(col("cluster"))
      .agg(
        count(lit(1)).as("n_vecs"),
        round(avg(col("sil")) * lit(1e6)).cast("long").as("mean_sil_micro")
      )
  }

  /** q205: cluster-capped diversity corpus — the q93 assignment joined
    * to the q15 quality scores (vec_id ≡ doc_id), then at most `cap`
    * documents kept per cluster by (quality desc, doc_id asc) rank.
    * The diversity-preserving alternative to a global quality cut: a
    * global top-N drains rare topics (their best documents score below
    * a dominant topic's median), while a per-cluster cap keeps every
    * region of embedding space represented — the capping step of
    * cluster-based corpus curation, downstream of SemDeDup-style
    * clustering (Abbas et al., 2023).
    *
    * Scale: the assignment is the audited q93 topology (broadcast
    * centroids, zero corpus shuffles); quality is a narrow scan; the
    * rank is per-cluster (k partitions — at 100 TB use range-
    * partitioned two-level rank within each cluster if k is small and
    * clusters are huge); output ≤ k·cap rows.
    */
  def clusterCap(
      spark: SparkSession,
      dir: String,
      cap: Int = 50
  ): DataFrame = {
    val asg = kmeansAssign(spark, dir)
      .select(col("vec_id").as("doc_id"), col("cluster"))
    val q = TextAnalysis
      .qualityMicroScoresFrom(Tables.documents(spark, dir))
    val w = Window
      .partitionBy(col("cluster"))
      .orderBy(col("q_micro").desc, col("doc_id").asc)
    asg
      .join(q, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .select(
        col("doc_id"),
        col("cluster"),
        col("rk"),
        col("q_micro")
      )
  }
}
