package graft.operators

import graft.util.Caches._
import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline: exact
  * (hash-groupBy), n-gram Jaccard near-dup, MinHash+LSH, SimHash.
  *
  * Literature: MinHash resemblance — Broder, "On the resemblance and
  * containment of documents" (SEQUENCES 1997); banded LSH
  * amplification — Leskovec/Rajaraman/Ullman, Mining of Massive
  * Datasets ch. 3; SimHash — Charikar, "Similarity estimation
  * techniques from rounding algorithms" (STOC 2002); eval-overlap
  * decontamination — the n-gram collision procedure of Brown et al.,
  * "Language Models are Few-Shot Learners" (NeurIPS 2020, app. C).
  *
  * Scale design: every variant is a shuffle-on-key plan, never a naive
  * all-pairs comparison.
  *  - Exact dedup shuffles on the md5 fingerprint — uniform keys, no
  *    skew, one exchange.
  *  - Jaccard/MinHash candidate generation inverts the problem into
  *    (shingle|band → doc list) joins, so cost is proportional to
  *    actually-colliding pairs, not |docs|². At 100 TB the band join is
  *    the standard LSH dedup topology (one shuffle on band key, AQE
  *    skew-split handles hot buckets).
  *  - SimHash reduces each doc to one 16-bit int; near-dup buckets are
  *    then a groupBy on that int.
  */
object Dedup {

  /** q20: exact dedup — md5-keyed survivor selection (min doc_id) with
    * copy counts. The canonical "hash-groupBy" dedup.
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(
        min(col("doc_id")).as("survivor_id"),
        count(lit(1)).as("n_copies")
      )

  /** Distinct word-3-gram shingle sets per doc (docs with <3 tokens
    * are excluded — they have no shingles). Uncapped: the shingle
    * inversion join is collision-linear (1.27M joined rows over 5k
    * docs at sf0.1), so no input bound is needed for the pair
    * queries to scale.
    */
  private def docShingles(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      // both near-dup queries self-join this set; caching stops Spark
      // recomputing tokenize+shingle on each join branch
      .cacheTracked()

  /** q21: n-gram Jaccard near-dup pairs via shingle inversion: explode
    * shingles → self-join on shingle → per-pair intersection count →
    * |A∪B| = |A|+|B|−|A∩B|. Only pairs sharing ≥1 shingle are ever
    * materialized.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardPairsFrom(docShingles(spark, dir))
      // the pair table is the derive-once artifact of the dedup
      // family: tiny (collision-survivor pairs, not the corpus) and
      // consumed by clustering (q72), survivor selection (q78),
      // PageRank (q86), and the composed manifest (q130). Caching it
      // makes every consumer read one materialization instead of
      // re-running the inversion self-join — at 100 TB the artifact
      // persists to parquet; same topology.
      .cacheTracked()

  /** q21's registered emission: the same pair table with the Jaccard
    * in exact ppm — idivHalfUp(inter·10⁶, union) on the intersection
    * integers, engine-identical by construction (round-12 float
    * purge). The selection threshold stays the proven round(·,6) ≥
    * 0.05 double INTERNALLY (identical on both engines since r1);
    * only the emitted column becomes an exact integer. The seam form
    * [[ngramJaccardPairs]] keeps its double `jaccard` for the
    * downstream ≥ 0.5 consumers.
    */
  def ngramJaccardPairsPpm(spark: SparkSession, dir: String): DataFrame =
    shinglePairIntersections(docShingles(spark, dir))
      .withColumn(
        "j_sel",
        round(
          col("inter").cast("double") /
            (col("n_a") + col("n_b") - col("inter")),
          6
        )
      )
      .filter(col("j_sel") >= 0.05)
      .select(
        col("doc_a"),
        col("doc_b"),
        graft.functions.IntMath
          .microRatio(col("inter"), col("n_a") + col("n_b") - col("inter"))
          .as("jaccard_ppm")
      )

  /** The pair generation over a prepared (doc_id, sh) shingle frame —
    * the seam a composed curation DAG (q130) uses to feed one
    * materialized shingle pass into every downstream stage instead of
    * re-deriving it per consumer. The caller owns materialization of
    * `d` (it feeds both sides of the self-join).
    */
  def ngramJaccardPairsFrom(d: DataFrame): DataFrame =
    shinglePairIntersections(d)
      .withColumn(
        "jaccard",
        round(
          col("inter").cast("double") /
            (col("n_a") + col("n_b") - col("inter")),
          6
        )
      )
      .filter(col("jaccard") >= 0.05)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

  /** The raw shingle-inversion pair frame (doc_a < doc_b, inter,
    * n_a, n_b) shared by the Jaccard (q21) and containment (q143)
    * pair generators — ONE maintenance site for the collision-linear
    * inversion topology.
    */
  private def shinglePairIntersections(d: DataFrame): DataFrame = {
    val e = d.select(
      col("doc_id"),
      size(col("sh")).as("n_sh"),
      explode(col("sh")).as("s")
    )
    val a = e.select(
      col("doc_id").as("doc_a"),
      col("n_sh").as("n_a"),
      col("s")
    )
    val b = e.select(
      col("doc_id").as("doc_b"),
      col("n_sh").as("n_b"),
      col("s")
    )
    a.join(b, Seq("s"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(
        count(lit(1)).as("inter"),
        first(col("n_a")).as("n_a"),
        first(col("n_b")).as("n_b")
      )
  }

  val NumHashes = 8
  private val NumBands = 4 // 2 rows per band

  /** 60-bit seeded hash of a string via md5 — portable across engines
    * (same construction in the DuckDB oracle).
    */
  private[operators] def seededHash(seed: Int, s: Column): Column =
    conv(substring(md5(concat(lit(s"$seed:"), s)), 1, 15), 16, 10)
      .cast("long")

  /** Seeded xxhash64 — the fast production hash (codegen'd, ~10× md5);
    * not portable to the DuckDB oracle, so the gated queries keep md5.
    */
  private def seededHashFast(seed: Int, s: Column): Column =
    xxhash64(lit(seed), s)

  /** MinHash signature: per seed, the min seeded-hash over the
    * shingle set. `portable = true` uses the md5-based hash the
    * oracle mirrors; `false` uses the single-pass codegen'd
    * [[graft.functions.MinHashSig]] (xxhash64 semantics — the HOF
    * formulation it replaces ran NumHashes interpreted passes).
    */
  def minhashSignature(sh: Column, portable: Boolean = true): Column =
    if (portable)
      graft.functions.Md5MinHashSig.md5MinhashSig(sh, NumHashes)
    else graft.functions.MinHashSig.minhashSig(sh, NumHashes)

  /** The interpreted md5 HOF formulation — kept as the executable
    * spec Md5MinHashSigSpec diffs the fused kernel against.
    */
  def minhashSignatureMd5Hof(sh: Column): Column =
    array((0 until NumHashes).map { i =>
      array_min(transform(sh, s => seededHash(i, s)))
    }: _*)

  /** The interpreted xxhash64 HOF formulation — kept as the executable
    * spec that MinHashSigSpec diffs the codegen expression against.
    */
  def minhashSignatureHof(sh: Column): Column =
    array((0 until NumHashes).map { i =>
      array_min(transform(sh, s => seededHashFast(i, s)))
    }: _*)

  /** q22: MinHash+LSH near-dup candidates: signature → band keys →
    * self-join on (band index, band value) → distinct candidate pairs
    * with estimated (signature agreement) and exact (shingle-set)
    * Jaccard. The band join is the only pairwise step — this is the
    * shape that scales to 100 TB (pairs ∝ collisions, not n²).
    */
  def minhashLshPairs(spark: SparkSession, dir: String): DataFrame =
    minhashLshPairsBase(spark, dir)
      .select(
        col("doc_a"),
        col("doc_b"),
        round(col("matches").cast("double") / NumHashes, 6)
          .as("est_jaccard"),
        round(
          col("inter").cast("double") / col("union_n"),
          6
        ).as("jaccard")
      )

  /** q22's registered emission: both Jaccards in exact ppm from the
    * integer (matches, inter, union) columns (round-12 float purge).
    * The seam form [[minhashLshPairs]] keeps its doubles for the
    * threshold consumers (q258 cost attribution's ≥ 0.5).
    */
  def minhashLshPairsPpm(spark: SparkSession, dir: String): DataFrame =
    minhashLshPairsBase(spark, dir)
      .select(
        col("doc_a"),
        col("doc_b"),
        graft.functions.IntMath
          .microRatio(col("matches"), lit(NumHashes.toLong))
          .as("est_jaccard_ppm"),
        graft.functions.IntMath
          .microRatio(col("inter"), col("union_n"))
          .as("jaccard_ppm")
      )

  /** The integer-valued candidate table behind q22/q198: distinct
    * LSH candidate pairs with signature agreement count and the
    * exact shingle intersection/union sizes — every emission
    * (double or ppm) derives from these.
    */
  private def minhashLshPairsBase(
      spark: SparkSession,
      dir: String
  ): DataFrame = {
    val d = docShingles(spark, dir)
      .withColumn("mh", minhashSignature(col("sh")))
      // signature (8 seeded md5s per shingle) feeds both sides of the
      // band self-join — materialize once
      .cacheTracked()
    val banded = d.select(
      col("doc_id"),
      col("mh"),
      col("sh"),
      explode(
        transform(
          sequence(lit(0), lit(NumBands - 1)),
          j =>
            struct(
              j.as("band"),
              concat_ws(
                "_",
                element_at(col("mh"), j * 2 + 1),
                element_at(col("mh"), j * 2 + 2)
              ).as("bval")
            )
        )
      ).as("bk")
    )
    val l = banded.select(
      col("doc_id").as("doc_a"),
      col("mh").as("mh_a"),
      col("sh").as("sh_a"),
      col("bk")
    )
    val r = banded.select(
      col("doc_id").as("doc_b"),
      col("mh").as("mh_b"),
      col("sh").as("sh_b"),
      col("bk")
    )
    l.join(r, Seq("bk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(
        col("doc_a"),
        col("doc_b"),
        size(
          filter(
            zip_with(col("mh_a"), col("mh_b"), (x, y) => x === y),
            m => m
          )
        ).as("matches"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"),
        (size(col("sh_a")) + size(col("sh_b")) -
          size(array_intersect(col("sh_a"), col("sh_b")))).as("union_n")
      )
      .distinct()
  }

  /** q203: train/test split leakage audit — near-duplicate pairs
    * (shingle Jaccard ≥ 0.5) bucketed by the q49 split assignment of
    * their two ends, split pair canonicalized (least/greatest). The
    * eval-integrity check a team runs after ANY split: a near-dup of
    * a test document sitting in train leaks the answer, and
    * hash-by-id splits (q49) do NOT prevent it — only cluster-safe
    * splits (q172) do. `leak = 1` rows are the cross-split mass that
    * motivates q172.
    *
    * Scale: the cached pair artifact (collision-linear) + two
    * split-map joins (pure per-row hash, no shuffle on the split
    * side) + one ≤ 6-row aggregate.
    */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val pairs = ngramJaccardPairs(spark, dir)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
    val sp = Sampling
      .trainTestSplit(spark, dir)
      .select(col("doc_id"), col("split"))
    pairs
      .join(sp.select(col("doc_id").as("doc_a"), col("split").as("sa")),
        Seq("doc_a"))
      .join(sp.select(col("doc_id").as("doc_b"), col("split").as("sb")),
        Seq("doc_b"))
      .select(
        least(col("sa"), col("sb")).as("split_a"),
        greatest(col("sa"), col("sb")).as("split_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("leak", (col("split_a") =!= col("split_b")).cast("int"))
  }

  /** q207: leakage quarantine — the repair step downstream of the
    * q203 audit: for every cross-split near-dup pair (J ≥ 0.5), the
    * LOWER-priority end (train < valid < test — eval sets are sacred,
    * training data is expendable) is quarantined, with the number of
    * cross-split links it carries. Dropping exactly these documents
    * from their splits makes valid/test near-dup-clean against the
    * rest of the corpus without touching a single eval document — the
    * minimal-on-the-train-side repair every split needs when
    * cluster-safe splitting (q172) wasn't used from the start.
    *
    * Scale: the cached pair artifact + two per-row hash split maps +
    * one aggregate keyed on the quarantined doc — all collision-
    * linear, nothing corpus².
    */
  def leakQuarantine(spark: SparkSession, dir: String): DataFrame = {
    val pairs = ngramJaccardPairs(spark, dir)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
    val sp = Sampling
      .trainTestSplit(spark, dir)
      .select(col("doc_id"), col("split"))
    def pri(c: Column): Column =
      when(c === "train", 0).when(c === "valid", 1).otherwise(2)
    pairs
      .join(sp.select(col("doc_id").as("doc_a"), col("split").as("sa")),
        Seq("doc_a"))
      .join(sp.select(col("doc_id").as("doc_b"), col("split").as("sb")),
        Seq("doc_b"))
      .filter(col("sa") =!= col("sb"))
      .select(
        when(pri(col("sa")) < pri(col("sb")), col("doc_a"))
          .otherwise(col("doc_b")).as("doc_id"),
        when(pri(col("sa")) < pri(col("sb")), col("sa"))
          .otherwise(col("sb")).as("split")
      )
      .groupBy(col("doc_id"), col("split"))
      .agg(count(lit(1)).as("n_links"))
  }

  /** q208: near-dup transitivity audit — over the pair graph at
    * J ≥ t, count wedges (a—b—c through a shared center) and how many
    * close (a—c also ≥ t). The closure rate is the empirical check on
    * the single biggest assumption transitive-closure dedup (q72/q78)
    * makes: near-duplication is treated as an equivalence relation,
    * but Jaccard is NOT transitive — a low closure rate means CC is
    * chaining dissimilar documents through middlemen and the cluster
    * survivor policy is deleting non-duplicates. Read this BEFORE
    * trusting cluster counts; if it's low, raise t or switch to the
    * q159 verified-pair topology.
    *
    * Scale: the near-dup graph is sparse (collision-linear edges), so
    * wedges = Σ_b deg(b)² stays linear in practice; the closing-edge
    * probe is one join back against the cached pair artifact — never
    * against the corpus.
    */
  def transitivityAudit(
      spark: SparkSession,
      dir: String,
      t: Double = 0.5
  ): DataFrame = {
    val pairs = ngramJaccardPairs(spark, dir)
      .filter(col("jaccard") >= t)
      .select(col("doc_a"), col("doc_b"))
      // read three times: two wedge arms + the closing-edge probe
      .cacheTracked()
    val sym = pairs
      .select(col("doc_a").as("ctr"), col("doc_b").as("nbr"))
      .unionByName(pairs.select(col("doc_b").as("ctr"), col("doc_a").as("nbr")))
    val wedges = sym
      .as("x")
      .join(sym.as("y"), col("x.ctr") === col("y.ctr"))
      .filter(col("x.nbr") < col("y.nbr"))
      .select(col("x.nbr").as("doc_a"), col("y.nbr").as("doc_b"))
    wedges
      .join(pairs.withColumn("closed", lit(1L)), Seq("doc_a", "doc_b"), "left")
      .agg(
        count(lit(1)).as("n_wedges"),
        coalesce(sum(col("closed")), lit(0L)).as("n_closed")
      )
      .select(
        col("n_wedges"),
        col("n_closed"),
        when(col("n_wedges") === 0, 0L)
          .otherwise(
            graft.functions.IntMath
              .microRatio(col("n_closed"), col("n_wedges")))
          .as("closure_micro")
      )
  }

  /** q488: link-prediction candidate miner over the weak-overlap
    * pair graph — the constructive twin of q208's transitivity
    * audit. Over the shingle-pair graph at the LOW threshold
    * J ≥ 0.02 (the q21 inversion seam before its 0.05 selection
    * floor), every non-adjacent pair reachable through shared
    * neighbors is scored by common-neighbor count, the
    * resource-allocation index Σ 1/deg(z) over shared neighbors z
    * (Zhou, Lü & Zhang, EPJ B 2009) in exact summed-half-up micro
    * units, and neighborhood Jaccard in exact ppm; the top 20 by
    * (cn, ra, pair id) are emitted. These are exactly the pairs a
    * thresholded pair-miner MISSED but the graph structure vouches
    * for — the recall-repair worklist a dedup operator re-verifies
    * with exact Jaccard before the next q72 closure run.
    *
    * Exactness: ra_micro sums per-neighbor idivHalfUp(10⁶, deg) —
    * each term is one exact integer division, so the sum is
    * engine-identical regardless of order; cn and the degree
    * Jaccard are pure counts + one microRatio.
    *
    * Scale: wedges are Σ_z deg(z)² over the PAIR graph (collision-
    * linear edges, so wedge volume is bounded by the same pair
    * budget q208 documents); the non-edge check is one anti-join
    * back into the cached pair artifact, and top-20 is
    * TakeOrderedAndProject (per-partition heaps, no global sort).
    */
  def linkPredictionAudit(spark: SparkSession, dir: String): DataFrame =
    linkPredictionFrom(
      shinglePairIntersections(docShingles(spark, dir))
        .withColumn(
          "j_sel",
          round(
            col("inter").cast("double") /
              (col("n_a") + col("n_b") - col("inter")),
            6
          )
        )
        .filter(col("j_sel") >= 0.02)
        .select(col("doc_a"), col("doc_b"))
        // read three times: two wedge arms (via sym) + the anti-join
        .cacheTracked()
    )

  /** [[linkPredictionAudit]]'s scoring engine over ANY canonical
    * (doc_a < doc_b) pair frame — the spec seam (hand-built graphs
    * with known CN/RA scores). The caller owns materialization.
    *
    * Degree pre-flight (the q171 join-blowup treatment, as at
    * dbscanGridPoints): the wedge join fans out C(deg,2) per center,
    * so its volume is bounded only while center degrees are — a
    * template doc weakly overlapping a million others would make its
    * wedge set quadratic. One cheap aggregate over the cached degree
    * frame fails fast past 4096 (≤ ~8.4M wedges from the worst
    * center — bounded); the mitigation is the standard link-
    * prediction hub exclusion: drop stop-documents above the degree
    * cap before scoring (hubs carry no CN signal anyway).
    */
  def linkPredictionFrom(pairs: DataFrame): DataFrame = {
    import graft.functions.IntMath.{idivHalfUp, microRatio}
    val sym = pairs
      .select(col("doc_a").as("ctr"), col("doc_b").as("nbr"))
      .unionByName(
        pairs.select(col("doc_b").as("ctr"), col("doc_a").as("nbr"))
      )
      .cacheTracked()
    val deg = sym
      .groupBy(col("ctr").as("id"))
      .agg(count(lit(1)).as("dg"))
      .cacheTracked()
    val maxDeg =
      deg.agg(coalesce(max(col("dg")), lit(0L))).head().getLong(0)
    require(
      maxDeg <= 4096L,
      s"linkPredictionFrom: max pair-graph degree $maxDeg exceeds " +
        "4096 — the wedge join would fan out C(deg,2) per center; " +
        "exclude hub stop-documents above the cap before scoring"
    )
    val symd = sym
      .join(deg.withColumnRenamed("id", "ctr"), Seq("ctr"))
    val scored = symd
      .as("x")
      .join(symd.as("y"), col("x.ctr") === col("y.ctr"))
      .filter(col("x.nbr") < col("y.nbr"))
      .select(
        col("x.nbr").as("doc_a"),
        col("y.nbr").as("doc_b"),
        idivHalfUp(lit(1000000L), col("x.dg")).as("ra_term")
      )
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(
        count(lit(1)).as("cn"),
        sum(col("ra_term")).as("ra_micro")
      )
      .join(pairs, Seq("doc_a", "doc_b"), "left_anti")
    scored
      .join(deg.select(col("id").as("doc_a"), col("dg").as("da")),
        Seq("doc_a"))
      .join(deg.select(col("id").as("doc_b"), col("dg").as("db")),
        Seq("doc_b"))
      .select(
        col("doc_a"),
        col("doc_b"),
        col("cn"),
        col("ra_micro"),
        microRatio(col("cn"), col("da") + col("db") - col("cn"))
          .as("nbr_jaccard_ppm")
      )
      .orderBy(
        col("cn").desc,
        col("ra_micro").desc,
        col("doc_a").asc,
        col("doc_b").asc
      )
      .limit(20)
  }

  /** q198: MinHash estimator-error audit — for every q22 LSH
    * candidate pair, the signature-estimated Jaccard vs the exact
    * shingle Jaccard, aggregated per estimate level (k=8 signatures
    * quantize estimates to eighths): pair count, mean and max
    * absolute error. The parameter-validation pass a dedup team runs
    * before trusting a (k, bands, rows) configuration at scale —
    * if max_abs_err at the decision threshold exceeds the threshold
    * margin, k is too small.
    *
    * Scale: one aggregate over the q22 candidate table (collision-
    * linear, never corpus²); output is ≤ k+1 rows at any corpus size.
    */
  def minhashErrorAudit(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.{idivHalfUp, microRatio}
    // exact ppm twins of both Jaccards (round-12 float purge): the
    // error is an integer difference, the mean an exact milli-ppm
    // half-up division — no float anywhere in the emission chain
    minhashLshPairsBase(spark, dir)
      .select(
        microRatio(col("matches"), lit(NumHashes.toLong))
          .as("est_jaccard_ppm"),
        abs(
          microRatio(col("matches"), lit(NumHashes.toLong)) -
            microRatio(col("inter"), col("union_n"))
        ).as("err")
      )
      .groupBy(col("est_jaccard_ppm"))
      .agg(
        count(lit(1)).as("n_pairs"),
        idivHalfUp(sum(col("err")) * lit(1000L), count(lit(1)))
          .as("mean_abs_err_ppm_milli"),
        max(col("err")).as("max_abs_err_ppm")
      )
  }

  /** q200: dedup funnel — the three dedup stages a production corpus
    * passes through, applied CUMULATIVELY with per-stage attribution:
    * exact (md5 keep-min, q20's rule), near-dup (the q78 canonical
    * survivor of the shingle closure), semantic (the q135 SemDeDup
    * keep rule over embedding clusters, vec_id ≡ doc_id in this
    * corpus). Output: one row per stage with cumulative survivors and
    * docs removed BY that stage — the attribution a pipeline owner
    * reads to see which stage earns its compute.
    *
    * Scale: each stage keeps its own audited topology; the funnel
    * adds three doc_id semi-joins and a 4-row ordered window (bounded
    * frame). The per-stage counts are the same numbers the stages'
    * own queries gate.
    */
  def dedupFunnel(spark: SparkSession, dir: String): DataFrame = {
    val all = Tables.documents(spark, dir).select(col("doc_id"))
    // s1/s2 are |docs|-row doc_id frames whose lineages are the md5
    // dedup and the shingle-closure survivor chains; the four stage
    // aggregates below read s1 3x and s2 2x — cache so each chain
    // derives once (the q354 seam trick)
    val s1 = exactDedup(spark, dir)
      .select(col("survivor_id").as("doc_id"))
      .cacheTracked()
    val s2 = s1.join(
      canonicalDocs(spark, dir).select(col("keep_doc").as("doc_id")),
      Seq("doc_id"))
      .cacheTracked()
    val s3 = s2.join(
      semanticDedup(spark, dir)
        .filter(col("kept"))
        .select(col("vec_id").as("doc_id")),
      Seq("doc_id"))
    val counts = Seq(
      "0_all" -> all,
      "1_exact" -> s1,
      "2_neardup" -> s2,
      "3_semantic" -> s3
    ).map { case (name, df) =>
      df.agg(count(lit(1)).as("n_docs")).select(lit(name).as("stage"),
        col("n_docs"))
    }.reduce(_.unionByName(_))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("stage").asc)
    counts
      .withColumn(
        "removed",
        coalesce(lag(col("n_docs"), 1).over(w) - col("n_docs"), lit(0L)))
      .select(col("stage"), col("n_docs"), col("removed"))
  }

  /** q72: near-dup cluster resolution — the step after pair
    * generation. Edges are the q21 Jaccard pairs (≥ 0.05); nodes are
    * every shingled doc (singletons keep themselves). Transitive
    * closure via [[ConnectedComponents]] (O(log diameter) rounds of
    * key-shuffles), then one aggregate for cluster sizes. cluster_id
    * is the min reachable doc_id; the survivor per cluster is the
    * cluster_id holder — the deterministic keep-one policy a dedup
    * pipeline applies before training.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    clustersFromPairs(
      docShingles(spark, dir),
      // the cached pair artifact — shared with every other consumer
      ngramJaccardPairs(spark, dir)
    )

  /** Cluster resolution over a prepared (doc_id, sh) shingle frame:
    * pair generation → pointer-doubling connected components →
    * cluster sizes. The composition seam — pairs and nodes both read
    * the caller-materialized shingle pass.
    */
  def dedupClustersFrom(shingleDocs: DataFrame): DataFrame =
    clustersFromPairs(shingleDocs, ngramJaccardPairsFrom(shingleDocs))

  private def clustersFromPairs(
      shingleDocs: DataFrame,
      pairs: DataFrame
  ): DataFrame = {
    val nodes = shingleDocs.select(col("doc_id").as("id"))
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val labels = ConnectedComponents.run(nodes, edges)
    val sizes = labels
      .groupBy(col("label"))
      .agg(count(lit(1)).as("cluster_size"))
    labels
      .join(sizes, "label")
      .select(
        col("id").as("doc_id"),
        col("label").as("cluster_id"),
        col("cluster_size"),
        (col("id") === col("label")).cast("int").as("survivor")
      )
  }

  /** q78: canonical-document selection — the keep-one policy applied
    * AFTER cluster resolution, choosing the best representative by
    * content quality instead of the arbitrary min-id: per near-dup
    * cluster, keep the doc with the highest quality score (rounded to
    * 6 places so the comparison is reproducible across engines;
    * doc_id-asc tiebreak). One `max(struct(...))` aggregate over the
    * q72 labels ⋈ q15 scores — partial aggregation applies, the
    * shuffle carries one candidate struct per (partition, cluster),
    * never the documents. This is the last dedup stage a training
    * corpus runs: clusters → one survivor each.
    */
  def canonicalDocs(spark: SparkSession, dir: String): DataFrame =
    canonicalDocsFrom(
      dedupClusters(spark, dir),
      TextAnalysis.qualityMicroScores(spark, dir)
    )

  /** The survivor argmax over prepared cluster labels and quality
    * scores — the q130 seam (both inputs derive from frames the
    * composed DAG materialized once).
    */
  def canonicalDocsFrom(
      clusterLabels: DataFrame,
      qualityScores: DataFrame
  ): DataFrame = {
    val labels = clusterLabels
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    // survivor argmax runs on the pure-BIGINT micro-quality (round-9
    // seam): a DOUBLE key at an ulp boundary can pick a different
    // survivor per engine; the integer key cannot
    val quality = qualityScores
      .select(col("doc_id"), col("q_micro"))
    labels
      .join(quality, "doc_id")
      .groupBy(col("cluster_id"))
      .agg(
        max(col("cluster_size")).as("cluster_size"),
        // lexicographic struct max: quality desc, then doc_id asc
        // (negated id turns the asc tiebreak into a max)
        max(struct(col("q_micro"), (-col("doc_id")).as("nid"))).as("best")
      )
      .select(
        col("cluster_id"),
        col("cluster_size"),
        (-col("best.nid")).as("keep_doc"),
        col("best.q_micro").as("keep_q_micro")
      )
  }

  /** q73: benchmark decontamination — flag training docs that share
    * any distinct 5-gram with the eval split (doc_id % 50 == 0; stands
    * in for a held-out benchmark suite). The eval shingle set is tiny
    * relative to the training corpus (MBs vs 100 TB), so it is
    * broadcast — the scan over training shingles never shuffles; only
    * the per-doc overlap counts aggregate. Output: contaminated doc →
    * (#shared shingles, #eval docs hit).
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), shingles(col("text"), 5).as("sh"))
      .filter(size(col("sh")) > 0)
    // per-doc shingle sets are distinct, so (s, eval_id) needs no dedup
    val evalSh = docs
      .filter(col("doc_id") % 50 === 0)
      .select(explode(col("sh")).as("s"), col("doc_id").as("eval_id"))
    val trainSh = docs
      .filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    trainSh
      .join(broadcast(evalSh), Seq("s"))
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(col("s")).as("n_shared_shingles"),
        countDistinct(col("eval_id")).as("n_eval_docs")
      )
  }

  /** q235: sorted-neighborhood near-dup pairs (Hernández & Stolfo,
    * "The merge/purge problem for large databases", SIGMOD 1995) —
    * the third blocking family next to LSH (q22) and prefix
    * filtering (q159): sort documents by text and compare each to
    * its predecessor, emitting pairs whose token-level longest
    * common prefix is ≥ `minLcp`. Catches the truncation/append
    * duplicate shape (same head, different tail) that Jaccard
    * under-scores when the tails diverge.
    *
    * Blocked for scale: any pair with LCP ≥ minLcp shares its first
    * `minLcp` tokens, so partitioning by the exact minLcp-token
    * prefix loses NO qualifying pair, and the sort+lag runs inside
    * bounded blocks — never a global single-partition window.
    *
    * Scale: one tokenize scan → one block-keyed sort window →
    * neighbor LCP per row. Linear; no pair blow-up anywhere.
    */
  def sortedNeighborPairs(
      spark: SparkSession,
      dir: String,
      minLcp: Int = 5
  ): DataFrame = {
    val d = Tables
      .documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= minLcp)
      .withColumn("block", array_join(slice(col("t"), 1, minLcp), " "))
    val w = Window.partitionBy(col("block")).orderBy(col("t"), col("doc_id"))
    val withPrev = d
      .withColumn("prev_id", lag(col("doc_id"), 1).over(w))
      .withColumn("prev_t", lag(col("t"), 1).over(w))
      .filter(col("prev_id").isNotNull)
    // first mismatch position in the null-padded zip (Spark's
    // array_position yields 0 when absent); absent → arrays equal
    // through max length → LCP = |t| = |prev|
    val eqs = zip_with(col("t"), col("prev_t"), (x, y) => x <=> y)
    val pos = array_position(eqs, false)
    withPrev
      .withColumn(
        "lcp",
        when(pos === 0, least(size(col("t")), size(col("prev_t"))).cast("long"))
          .otherwise(pos - 1)
      )
      .filter(col("lcp") >= minLcp)
      .select(
        least(col("prev_id"), col("doc_id")).as("doc_a"),
        greatest(col("prev_id"), col("doc_id")).as("doc_b"),
        col("lcp")
      )
  }

  /** q225: copy-flow matrix — cross-source near-dup pairs (J ≥ 0.5)
    * oriented by ingest order (doc_id, the corpus's arrival proxy:
    * doc_a < doc_b by construction, so doc_a is the earlier
    * "origin", doc_b the later "copy"), rolled up per
    * (source_from, source_to). The provenance question behind source
    * weighting: a source whose content mostly ARRIVES second in
    * near-dup pairs is an aggregator republishing the corpus to
    * itself, and double-weighting it double-counts its originals'
    * sources. Diagonal rows are within-source duplication (the q179
    * view); the off-diagonal asymmetry is the copy direction.
    *
    * Scale: the cached pair artifact + two per-row source-map joins +
    * a |sources|² rollup. Collision-linear throughout.
    */
  def copyFlow(spark: SparkSession, dir: String): DataFrame = {
    val pairs = ngramJaccardPairs(spark, dir)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
    val src = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"))
    pairs
      .join(
        src.select(col("doc_id").as("doc_a"), col("source").as("source_from")),
        Seq("doc_a"))
      .join(
        src.select(col("doc_id").as("doc_b"), col("source").as("source_to")),
        Seq("doc_b"))
      .groupBy(col("source_from"), col("source_to"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** q221: dedup-adjusted source sizes — per source, raw vs
    * effective corpus mass once the near-dup closure keeps one
    * survivor per cluster: document and token counts before/after,
    * with retention in ppm. The number that belongs on a corpus card
    * next to the raw size: a source advertising 10M documents that
    * retains 4M after dedup is a 4M-document source, and sources are
    * priced/weighted by the effective column. Documents too short to
    * shingle (< 3 tokens) were never dedup candidates and count as
    * kept.
    *
    * Scale: the audited q78 closure + one narrow token scan + a
    * |sources|-row rollup; survivors join on doc_id (co-partitioned
    * with the scan's own keying at scale).
    */
  def dedupAdjustedSizes(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens")
      )
    // ONE closure feeds both the membership flag and the survivor
    // argmax — without the shared handle the canonicalDocs path would
    // re-run the whole CC iteration
    val labels = dedupClusters(spark, dir).cacheTracked()
    val clustered = labels.select(col("doc_id"), lit(1).as("in_closure"))
    val keepers = canonicalDocsFrom(labels, TextAnalysis.qualityMicroScores(spark, dir))
      .select(col("keep_doc").as("doc_id"), lit(1).as("survivor"))
    docs
      .join(clustered, Seq("doc_id"), "left")
      .join(keepers, Seq("doc_id"), "left")
      .withColumn(
        "kept",
        (col("in_closure").isNull || col("survivor").isNotNull).cast("long")
      )
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("kept")).as("n_docs_kept"),
        sum(when(col("kept") === 1, col("n_tokens")).otherwise(0L))
          .as("n_tokens_kept")
      )
      .withColumn(
        "doc_retention_ppm",
        graft.functions.IntMath.microRatio(col("n_docs_kept"), col("n_docs"))
      )
      .withColumn(
        "token_retention_ppm",
        when(col("n_tokens") === 0, 1000000L)
          .otherwise(
            graft.functions.IntMath
              .microRatio(col("n_tokens_kept"), col("n_tokens"))
          )
      )
  }

  /** q219: marginal source novelty — attribute every distinct corpus
    * shingle to the FIRST source containing it (sources in
    * lexicographic order — the deterministic stand-in for an
    * acquisition order), and report per source: its own distinct-
    * shingle count, the shingles it contributes FIRST (novel), and
    * novelty as ppm. The answer to "what does licensing this source
    * actually add?": a source whose novelty is near zero is already
    * covered by the sources ahead of it, whatever its raw size.
    *
    * Scale: one shingle explode → (source, shingle) dedup (partial
    * agg) → two shuffles on the shingle key (owner argmin) and the
    * source key (counts). Output is |sources| rows. At 100 TB the
    * (source, shingle) frame is the same posting topology as q82.
    */
  def sourceNovelty(spark: SparkSession, dir: String): DataFrame = {
    val srcSh = Tables
      .documents(spark, dir)
      .select(col("source"), explode(shingles(col("text"), 3)).as("s"))
      .distinct()
      // read twice: per-source totals and the first-owner attribution
      .cacheTracked()
    val totals = srcSh
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_shingles"))
    val novel = srcSh
      .groupBy(col("s"))
      .agg(min(col("source")).as("source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_novel"))
    totals
      .join(novel, Seq("source"), "left")
      .select(
        col("source"),
        col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        graft.functions.IntMath
          .microRatio(coalesce(col("n_novel"), lit(0L)), col("n_shingles"))
          .as("novelty_ppm")
      )
  }

  /** q218: per-cluster quality spread — for every multi-document
    * near-dup cluster (q72), the min/max member quality and their
    * spread in micro-units. The audit that justifies q78's
    * keep-BEST-quality survivor policy over keep-min-id: a large
    * spread means the copies are NOT interchangeable (one is the
    * clean original, another an ad-injected scrape) and arbitrary
    * survivor choice loses real quality; a spread near zero means
    * min-id would have been fine and the quality join is wasted
    * effort. Read the mass of this distribution before choosing a
    * survivor policy.
    *
    * Scale: cluster labels are the audited q72 topology; quality is
    * a narrow scan; the rollup is one partial-aggregated groupBy on
    * cluster_id — output is |multi-doc clusters| rows.
    */
  def clusterQualitySpread(spark: SparkSession, dir: String): DataFrame = {
    val labels = dedupClusters(spark, dir)
      .filter(col("cluster_size") >= 2)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    val q = TextAnalysis.qualityMicroScores(spark, dir)
    labels
      .join(q, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(
        max(col("cluster_size")).as("cluster_size"),
        min(col("q_micro")).as("q_min_micro"),
        max(col("q_micro")).as("q_max_micro")
      )
      .withColumn("q_spread_micro", col("q_max_micro") - col("q_min_micro"))
  }

  /** q213: eval-centric contamination report — the q73 flip: q73
    * lists the TRAINING docs to drop; this scores each EVAL document
    * by how compromised it already is: the number of training docs
    * sharing ≥ 1 distinct 5-gram, and the worst-case containment
    * (max over hits of |∩| / |eval shingles|, micro-units). An eval
    * doc with high max containment measures memorization, not
    * ability — benchmark hygiene reports rank by exactly this number
    * before trusting a score delta.
    *
    * Scale: identical topology to q73 — the eval shingle set is tiny
    * vs the corpus and broadcast; the training scan never shuffles;
    * per-(eval, train) counts partial-aggregate, then collapse to one
    * row per contaminated eval doc.
    */
  def evalContamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), shingles(col("text"), 5).as("sh"))
      .filter(size(col("sh")) > 0)
    val evalSh = docs
      .filter(col("doc_id") % 50 === 0)
      .select(
        col("doc_id").as("eval_id"),
        size(col("sh")).cast("long").as("n_eval"),
        explode(col("sh")).as("s")
      )
    val trainSh = docs
      .filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id").as("train_id"), explode(col("sh")).as("s"))
    trainSh
      .join(broadcast(evalSh), Seq("s"))
      // per-doc shingle lists are distinct, so the count IS |∩|
      .groupBy(col("eval_id"), col("train_id"))
      .agg(count(lit(1)).as("inter"), max(col("n_eval")).as("n_eval"))
      .groupBy(col("eval_id"))
      .agg(
        count(lit(1)).as("n_train_hits"),
        max(
          graft.functions.IntMath.microRatio(col("inter"), col("n_eval"))
        ).as("max_containment_micro")
      )
  }

  private val SimHashBits = 16

  /** q23: 16-bit SimHash per document — per-bit majority vote over
    * seeded token hashes (token multiplicity counts). Docs with no
    * tokens are excluded.
    */
  def simhashDocs(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables
      .documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .withColumn("h", seededHash(0, col("w")))
    val votes = (0 until SimHashBits).map { b =>
      sum(
        when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)
      ).as(s"v$b")
    }
    val agged = toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val simhash = (0 until SimHashBits)
      .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    agged.select(col("doc_id"), simhash.as("simhash"))
  }

  /** q44: edit-distance fuzzy matching over part names, uncapped and
    * scale-safe by construction (string-similarity-join literature:
    * count/prefix filtering — Gravano et al., "Approximate String
    * Joins in a Database (Almost) for Free", VLDB 2001):
    *
    *  1. dedup to the DISTINCT-NAME vocabulary first — names repeat
    *     heavily, and every downstream cost is |vocab|-shaped, not
    *     |parts|-shaped;
    *  2. positional-bigram PREFIX BLOCKING over the vocabulary:
    *     tokens are (gram, occurrence#) so an equi-join implements
    *     multiset intersection; under a global rarity order two names
    *     within edit distance k must share one of each other's
    *     (k·q+1) rarest tokens (each edit disturbs ≤ q grams, so
    *     multiset overlap ≥ max(|Ga|,|Gb|) − k·q ≥ 1 — holds for all
    *     part names: min length 7 ⇒ ≥ 6 grams ≥ k·q+2 at k=2,q=2).
    *     The prefix join is therefore LOSSLESS for the radius, which
    *     is why the oracle can stay plain all-pairs SQL;
    *  3. verify candidates with `levenshtein` (the only inexact-y
    *     step is exact — blocking only pruned);
    *  4. expand name pairs back to part-key pairs with broadcast hash
    *     equi-joins on the name (beyond broadcast size this becomes a
    *     shuffle join on the name key; AQE splits hot names).
    */
  def fuzzyNamePairs(
      spark: SparkSession,
      dir: String,
      maxDist: Int = 2
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = 2
    val prefixLen = maxDist * q + 1
    val parts = Tables
      .part(spark, dir)
      .select(col("p_partkey"), col("p_name"))
    val vocab = parts
      .select(col("p_name").as("name"))
      .filter(length(col("name")) >= 2)
      .distinct()
    // positional bigram tokens: (g, occ) — occ numbers repeats of the
    // same gram within a name, making the equi-join count multiset
    // intersection (min of the two occurrence counts)
    val grams = vocab
      .select(
        col("name"),
        posexplode(
          expr("transform(sequence(1, length(name) - 1)," +
            " i -> substring(name, i, 2))")
        ).as(Seq("pos", "g"))
      )
      .withColumn(
        "occ",
        row_number().over(
          Window.partitionBy(col("name"), col("g")).orderBy(col("pos")))
      )
    val tokenDf = grams.groupBy(col("g"), col("occ"))
      .agg(count(lit(1)).as("df"))
    // per-name prefix: the (k·q+1) rarest tokens under the global
    // total order (df, g, occ) — the tiny per-name window sorts
    // ≤ |name| rows
    val prefix = grams
      .join(tokenDf, Seq("g", "occ"))
      .withColumn(
        "rk",
        row_number().over(Window.partitionBy(col("name"))
          .orderBy(col("df"), col("g"), col("occ")))
      )
      .filter(col("rk") <= prefixLen)
      .select(col("name"), col("g"), col("occ"))
    val xa = prefix.select(col("name").as("name_a"), col("g"), col("occ"))
    val xb = prefix.select(col("name").as("name_b"), col("g"), col("occ"))
    val candNames = xa
      .join(xb, Seq("g", "occ"))
      .filter(col("name_a") <= col("name_b"))
      .select(col("name_a"), col("name_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"))
        .cast("int"))
      .filter(col("dist") <= maxDist)
    val pa = parts
      .select(col("p_partkey").as("ka"), col("p_name").as("name_a"))
    val pb = parts
      .select(col("p_partkey").as("kb"), col("p_name").as("name_b"))
    pa.join(broadcast(candNames), Seq("name_a"))
      .join(broadcast(pb), Seq("name_b"))
      // name_a < name_b pairs appear once (sides fixed by name);
      // same-name pairs appear in both orders → keep ka < kb
      .filter(col("name_a") < col("name_b") || col("ka") < col("kb"))
      .select(
        least(col("ka"), col("kb")).as("key_a"),
        greatest(col("ka"), col("kb")).as("key_b"),
        col("dist")
      )
  }

  /** q37: SimHash near-dup pairs — Hamming distance ≤ 3 between
    * 16-bit signatures, uncapped. Candidates come from a 4×4-bit
    * signature-band bucket join: 3 differing bits can touch at most 3
    * of the 4 disjoint bands (pigeonhole), so every Hamming≤3 pair
    * still agrees exactly on ≥ 1 band — the banded candidate set is
    * EXACT for this radius, not approximate, and the oracle stays
    * plain all-pairs SQL. Cost ∝ in-bucket collisions (AQE skew-split
    * handles hot signature bands), never |docs|².
    */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    // both sides of the band self-join read the signatures; caching
    // stops Spark recomputing the token-vote aggregation per branch
    val sh = simhashDocs(spark, dir).cacheTracked()
    val banded = sh.select(
      col("doc_id"),
      col("simhash"),
      explode(array((0 until 4).map { b =>
        struct(
          lit(b).as("band"),
          shiftright(col("simhash"), b * 4).bitwiseAND(15).as("bval"))
      }: _*)).as("bk")
    ).select(col("doc_id"), col("simhash"),
      col("bk.band").as("band"), col("bk.bval").as("bval"))
    val a = banded.select(col("doc_id").as("doc_a"),
      col("simhash").as("sh_a"), col("band"), col("bval"))
    val b = banded.select(col("doc_id").as("doc_b"),
      col("simhash").as("sh_b"), col("band"), col("bval"))
    a.join(b, Seq("band", "bval"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn(
        "hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("int")
      )
      .filter(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .distinct()
  }

  /** q96: substring-level duplication — fixed-width (8-token) span
    * families shared by ≥2 documents. Whole-doc dedup (q20-q23)
    * misses boilerplate injected *inside* otherwise-distinct pages
    * (headers, license blocks, templated paragraphs); this is the
    * bounded-width approximation of suffix-array substring dedup
    * (Lee et al., "Deduplicating Training Data Makes Language Models
    * Better", ACL 2022) that actually distributes: spans are local to
    * each document, so the only shuffle is the partially-aggregated
    * groupBy on the span key.
    *
    * Spans are distinct-per-document ([[graft.functions.Shingles]] —
    * one fused codegen traversal), so `n_docs` counts documents, and
    * the key is the portable md5-prefix hash60 of the span text (what
    * a 100 TB run groups on — 8 bytes, not the span string; the
    * DuckDB oracle mirrors it exactly).
    */
  /** q102: incremental dedup — classify an incoming batch against the
    * existing corpus: `exact_dup` (byte-identical text already in the
    * corpus), `near_dup` (≥50% of the doc's 3-gram shingles appear in
    * the corpus — containment, the asymmetric Jaccard), else `new`.
    * This is the admission filter every continuously-ingesting corpus
    * runs per increment — against the CORPUS, not within the batch
    * (that's q20-q23).
    *
    * Scale: the exact screen is a semi join on the md5 key; the
    * near screen joins the batch's shingles against the corpus's
    * distinct-shingle set (inverted-index topology, collision-linear
    * like q21 — and the corpus side can be a pre-built, incrementally
    * maintained table instead of a re-derivation). Batch here =
    * doc_id ≥ 250, corpus = doc_id < 250.
    */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") < 250)
    val batch = docs.filter(col("doc_id") >= 250)
    val exact = batch
      .select(col("doc_id"), md5(col("text")).as("h"))
      .join(
        corpus.select(md5(col("text")).as("h")).distinct(),
        Seq("h"),
        "left_semi"
      )
      .select(col("doc_id"), lit(true).as("is_exact"))
    val sh = graft.functions.TextFunctions.shingles(col("text"), 3)
    // NOT `select(size(sh), explode(sh))`: the size projection lands
    // ABOVE the Generate and re-runs the fused tokenize+shingle pass
    // per exploded row (~50× per doc; measured 3.5s vs 0.33s at
    // sf0.1). Shingles are distinct per doc, so the span count is
    // exactly the exploded row count — derive it from the frame.
    val batchSh = batch.select(col("doc_id"), explode(sh).as("s"))
    val nSh = batchSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val corpusSh = corpus.select(explode(sh).as("s")).distinct()
    // The corpus shingle set is the build side here (it is the small,
    // fixed reference set — and without the hint the planner size-
    // estimates the EXPLODED batch side off its parquet bytes and
    // broadcasts 100× more rows than the corpus: 4.1s -> 0.6s at
    // sf0.1). When the corpus outgrows broadcast range this becomes
    // a key-shuffle join on the span — the inverted-index topology.
    val near = batchSh
      .join(broadcast(corpusSh), "s")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("hits"))
      .join(nSh, "doc_id")
      .filter(col("hits").cast("double") / col("n_sh") >= 0.5)
      .select(col("doc_id"), lit(true).as("is_near"))
    batch
      .select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        when(col("is_exact"), "exact_dup")
          .when(col("is_near"), "near_dup")
          .otherwise("new")
          .as("status")
      )
  }

  def duplicatedSpans(spark: SparkSession, dir: String, n: Int = 8): DataFrame =
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        explode(graft.functions.TextFunctions.shingles(col("text"), n))
          .as("span")
      )
      .groupBy(graft.functions.TextFunctions.hash60(col("span")).as("span_key"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 2)

  /** q135: SemDeDup-style semantic dedup (Abbas et al., "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication", arXiv 2023): k-means-cluster the embedding
    * space ([[Clustering.kmeansAssign]] — the exact q93 chain), then
    * WITHIN each cluster mark every vector that has a lower-id
    * cluster-mate with cosine ≥ tau as a semantic duplicate; the
    * survivors are the lowest-id representative of each semantic
    * neighborhood. Output is the full per-vector verdict table:
    * (vec_id, cluster, max_sim_lower, kept).
    *
    * Scale design: the candidate join is CLUSTER-keyed, never global
    * — SemDeDup's whole point is that k is sized to the corpus
    * (fixed expected cluster size, e.g. 50k clusters for 5B docs) so
    * the within-cluster pair cost stays linear in N while the
    * clustering itself is the broadcast-assign / cell-shuffle-update
    * Lloyd topology of q93. The clustered frame feeds both sides of
    * the self-join and is localCheckpointed once (the derive-once
    * rule), so the Lloyd rounds run exactly once, not twice.
    *
    * Reference tie-in: no vector ops in the reference — §7.8
    * LLM-pipeline extension surface, built Spark-first.
    */
  def semanticDedup(
      spark: SparkSession,
      dir: String,
      tau: Double = 0.35
  ): DataFrame = {
    val clustered = Clustering
      .kmeansAssign(spark, dir)
      .select(col("vec_id"), col("cluster"))
      .join(
        Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
        "vec_id"
      )
      // cacheTracked, not a checkpoint: with the centroid model a
      // literal (SmallModel), this plan is deterministic — the cache
      // serves both self-join sides AND the steady-state re-run
      .cacheTracked()
    val lower = clustered.select(
      col("vec_id").as("lo_id"),
      col("cluster"),
      col("embedding").as("e_lo")
    )
    val simToLower = clustered
      .select(col("vec_id"), col("cluster"), col("embedding"))
      .join(lower, Seq("cluster"))
      .filter(col("lo_id") < col("vec_id"))
      .select(
        col("vec_id"),
        Similarity.cosine(col("e_lo"), col("embedding")).as("sim")
      )
      .groupBy(col("vec_id"))
      .agg(max(col("sim")).as("ms"))
    clustered
      .select(col("vec_id"), col("cluster"))
      .join(simToLower, Seq("vec_id"), "left")
      .select(
        col("vec_id"),
        col("cluster"),
        round(col("ms"), 6).as("max_sim_lower"),
        coalesce(col("ms") < tau, lit(true)).as("kept")
      )
  }

  /** q137: Bloom-filter decontamination — the FIXED-MEMORY screen
    * variant of q73's exact eval-overlap join (Bloom, "Space/time
    * trade-offs in hash coding with allowable errors", CACM 1970;
    * the eval-contamination procedure of Brown et al. 2020 app. C).
    * The eval split's distinct 5-gram shingles are folded into a
    * 2^16-bit Bloom bitmap (k = 2 md5-seeded hashes, stored as ≤2048
    * 32-bit words in BIGINT cells — shifts stay in the signed-safe
    * 0..31 range on both engines); every training shingle is screened
    * against the broadcast bitmap, and an exact-membership audit
    * column measures the screen's false positives (`n_bloom_hits ≥
    * n_exact_hits` always). Output per flagged training doc:
    * (doc_id, n_shingles, n_bloom_hits, n_exact_hits).
    *
    * Scale: q73 broadcasts the full eval SHINGLE SET — fine for MB
    * eval suites, not for a multi-GB one; the Bloom bitmap is ≤128 KiB
    * REGARDLESS of eval size (m is a parameter of the screen, sized
    * once to the eval suite's bits-per-element budget), so the screen side never grows. The
    * topology is two broadcast word-lookups + the per-doc agg; the
    * exact-audit join is the gate's recall/FP measurement, dropped in
    * a production screen-only pass.
    */
  def bloomDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val mBits = 1048576L
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), shingles(col("text"), 5).as("sh"))
      .filter(size(col("sh")) > 0)
    val evalSh = docs
      .filter(col("doc_id") % 50 === 0)
      .select(explode(col("sh")).as("s"))
      .distinct()
    val bitmap = evalSh
      .select(
        explode(
          array(
            seededHash(0, col("s")) % mBits,
            seededHash(1, col("s")) % mBits
          )
        ).as("p")
      )
      .select(
        shiftright(col("p"), 5).as("word"),
        col("p").mod(32).cast("int").as("b")
      )
      .select(col("word"), expr("shiftleft(CAST(1 AS BIGINT), b)").as("m"))
      .groupBy(col("word"))
      .agg(expr("bit_or(m)").as("bits"))
    val tr = docs
      .filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .withColumn("p0", seededHash(0, col("s")) % mBits)
      .withColumn("p1", seededHash(1, col("s")) % mBits)
      .select(
        col("doc_id"),
        col("s"),
        shiftright(col("p0"), 5).as("w0"),
        col("p0").mod(32).cast("int").as("b0"),
        shiftright(col("p1"), 5).as("w1"),
        col("p1").mod(32).cast("int").as("b1")
      )
    tr
      .join(
        broadcast(bitmap.select(col("word").as("w0"), col("bits").as("bits0"))),
        Seq("w0"),
        "left"
      )
      .join(
        broadcast(bitmap.select(col("word").as("w1"), col("bits").as("bits1"))),
        Seq("w1"),
        "left"
      )
      .join(
        broadcast(evalSh.withColumn("is_member", lit(true))),
        Seq("s"),
        "left"
      )
      .withColumn(
        "bloom_hit",
        coalesce(col("bits0"), lit(0L))
          .bitwiseAND(expr("shiftleft(CAST(1 AS BIGINT), b0)")) =!= 0 &&
          coalesce(col("bits1"), lit(0L))
            .bitwiseAND(expr("shiftleft(CAST(1 AS BIGINT), b1)")) =!= 0
      )
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("n_bloom_hits"),
        sum(when(col("is_member"), 1L).otherwise(0L)).as("n_exact_hits")
      )
      .filter(col("n_bloom_hits") > 0)
  }

  /** q136: CCNet-style duplicated-segment removal (Wenzek et al.,
    * "CCNet: Extracting high quality monolingual datasets from web
    * crawl data", LREC 2020 — its paragraph-hash dedup; the unit here
    * is fixed non-overlapping 10-token segments because the corpus
    * text is single-line). Every segment instance keeps iff it is the
    * corpus-wide FIRST occurrence (min (doc_id, seg_idx)) of its
    * segment hash — boilerplate (headers, templated chrome) survives
    * once and is stripped everywhere else. Output is per-doc
    * retention: (doc_id, n_segs, n_kept, kept_ppm).
    *
    * Unlike q96 (overlapping 8-token span FAMILIES, a detector), this
    * is the remover: a partition of each doc into disjoint segments
    * plus a global keep-first policy.
    *
    * Scale: segments derive doc-locally; the only shuffles are the
    * partially-aggregated first-occurrence groupBy on the 60-bit
    * segment key and the per-doc stat agg — the topology CCNet runs
    * over Common Crawl shards.
    */
  def segmentDedup(
      spark: SparkSession,
      dir: String,
      segTokens: Int = 10
  ): DataFrame = {
    val toks = tokens(col("text"))
    val segs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(
        col("doc_id"),
        posexplode(
          transform(
            sequence(
              lit(0),
              floor((size(col("toks")) - 1) / segTokens).cast("int")
            ),
            i =>
              array_join(
                slice(col("toks"), i * segTokens + 1, lit(segTokens)),
                " "
              )
          )
        ).as(Seq("seg_idx", "seg"))
      )
      .select(
        col("doc_id"),
        col("seg_idx"),
        graft.functions.TextFunctions.hash60(col("seg")).as("seg_key")
      )
    val first = segs
      .groupBy(col("seg_key"))
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("f"))
    segs
      .join(first, "seg_key")
      .select(
        col("doc_id"),
        (col("f.doc_id") === col("doc_id") &&
          col("f.seg_idx") === col("seg_idx")).as("is_first")
      )
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("is_first"), 1L).otherwise(0L)).as("n_kept")
      )
      .withColumn(
        "kept_ppm",
        graft.functions.IntMath.microRatio(col("n_kept"), col("n_segs"))
      )
  }

  /** q140: winnowing fingerprint overlap (Schleimer/Wilkerson/Aiken,
    * "Winnowing: local algorithms for document fingerprinting",
    * SIGMOD 2003 — the MOSS selection rule). Positional 3-gram hashes
    * are compressed by sliding a w=4 window over each doc and keeping
    * every window's MINIMUM hash; the distinct selected hashes are
    * the doc's fingerprints. The winnowing guarantee: any run of
    * ≥ w+k−1 = 7 shared tokens produces a shared fingerprint, at an
    * expected 2/(w+1) ≈ 40% of the full shingle-set density — the
    * guaranteed-detection COMPRESSION that q21's full-set Jaccard
    * lacks. Output: doc pairs sharing ≥ 2 fingerprints with the
    * fingerprint-set overlap fraction |A∩B| / |A∪B|.
    *
    * Scale: fingerprints derive doc-locally (one per-doc window
    * shuffle); the pair join runs on the WINNOWED sets, so the
    * collision-linear LSH-style cost is paid on ~40% of the keys —
    * the reason MOSS indexes fingerprints, not shingles. The per-doc
    * count join keys on doc_id (no broadcast: it scales with the
    * corpus).
    */
  /** The winnowed fingerprint set (doc_id, mh) that q140's pair join
    * and q246's cross-language screen both read — one derivation, two
    * consumers.
    */
  def winnowFp(spark: SparkSession, dir: String, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = Tables
      .documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(
        col("doc_id"),
        (size(col("toks")) - 2).as("n_grams"),
        posexplode(
          transform(
            sequence(lit(0), size(col("toks")) - 3),
            i => array_join(slice(col("toks"), i + 1, lit(3)), " ")
          )
        ).as(Seq("pos", "gram"))
      )
      .select(
        col("doc_id"),
        col("n_grams"),
        col("pos"),
        hash60(col("gram")).as("h")
      )
    val win = Window
      .partitionBy(col("doc_id"))
      .orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("mh", min(col("h")).over(win))
      // window STARTS: docs shorter than w grams winnow their single
      // truncated window at pos 0
      .filter(col("pos") <= greatest(col("n_grams") - w, lit(0)))
      .select(col("doc_id"), col("mh"))
      .distinct()
  }

  def winnowFingerprints(
      spark: SparkSession,
      dir: String,
      w: Int = 4
  ): DataFrame = {
    val fp = winnowFp(spark, dir, w)
    val nfp = fp.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
    fp.as("a")
      .join(
        fp.as("b"),
        col("a.mh") === col("b.mh") && col("a.doc_id") < col("b.doc_id")
      )
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .join(nfp.select(col("doc_id").as("doc_a"), col("n_fp").as("nfa")), Seq("doc_a"))
      .join(nfp.select(col("doc_id").as("doc_b"), col("n_fp").as("nfb")), Seq("doc_b"))
      .select(
        col("doc_a"),
        col("doc_b"),
        col("n_shared"),
        // exact ppm on the fingerprint-count integers (round-12
        // float purge)
        graft.functions.IntMath
          .microRatio(
            col("n_shared"),
            col("nfa") + col("nfb") - col("n_shared")
          )
          .as("overlap_ppm")
      )
  }

  /** q246: cross-language duplicate pairs — documents tagged with
    * DIFFERENT languages that share a winnowed fingerprint (q140's
    * scheme): the contamination shape language-partitioned pipelines
    * miss entirely, because per-lang dedup never compares across the
    * partition. Real cause: boilerplate/code blocks surviving
    * translation, mislabeled lang tags, or copy-paste corpora. Each
    * pair carries both langs and the shared-fingerprint count; even
    * one shared winnow window is a strong signal across languages
    * (the q140 intra-corpus join demands ≥2).
    *
    * Scale: candidate generation is the fingerprint-blocked
    * self-join (collision-linear, never corpus²); the lang decoration
    * joins a 2-column frame keyed by doc_id. Same topology as q140
    * with a different predicate.
    */
  def crossLanguageDups(spark: SparkSession, dir: String): DataFrame = {
    val langs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("lang"))
    val fp = winnowFp(spark, dir)
    fp.as("a")
      .join(
        fp.as("b"),
        col("a.mh") === col("b.mh") && col("a.doc_id") < col("b.doc_id")
      )
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(
        langs.select(col("doc_id").as("doc_a"), col("lang").as("lang_a")),
        Seq("doc_a")
      )
      .join(
        langs.select(col("doc_id").as("doc_b"), col("lang").as("lang_b")),
        Seq("doc_b")
      )
      .filter(col("lang_a") =!= col("lang_b"))
      .select(
        col("doc_a"),
        col("doc_b"),
        col("lang_a"),
        col("lang_b"),
        col("n_shared")
      )
  }

  /** q253: novelty-decay curve over arrival order — documents grouped
    * into arrival buckets of `bucketSize` by doc_id (the corpus's
    * ingest proxy, the q225 convention); per bucket: distinct
    * 3-shingles present, how many appear for the FIRST time in that
    * bucket, and the novelty fraction. The diminishing-returns curve
    * of continued scraping: when novelty_ppm flattens near zero, new
    * acquisition is re-buying the same corpus (q219 gives the
    * per-source version of this; this is the time series).
    *
    * Scale: one shingle inversion (distinct (bucket, shingle) pairs),
    * one min-agg per shingle, one shingle-keyed co-partitioned join
    * back, a |buckets|-row rollup. Exact integers throughout.
    */
  def noveltyDecay(
      spark: SparkSession,
      dir: String,
      bucketSize: Int = 50
  ): DataFrame = {
    val pairs = Tables
      .documents(spark, dir)
      .select(
        (col("doc_id") / lit(bucketSize)).cast("long").as("b"),
        explode(shingles(col("text"), 3)).as("sh")
      )
      .distinct()
    val firstB = pairs.groupBy(col("sh")).agg(min(col("b")).as("first_b"))
    pairs
      .join(firstB, "sh")
      .groupBy(col("b"))
      .agg(
        count(lit(1)).as("n_distinct"),
        sum(when(col("first_b") === col("b"), 1L).otherwise(0L)).as("n_new")
      )
      .select(
        col("b"),
        col("n_distinct"),
        col("n_new"),
        graft.functions.IntMath
          .microRatio(col("n_new"), col("n_distinct"))
          .as("novelty_ppm")
      )
  }

  /** q273: dedup-threshold sensitivity in CLUSTER space — the
    * Adjusted Rand Index between the connected-component closures at
    * J ≥ 0.3 and J ≥ 0.6 over the SAME cached pair artifact. q187
    * sweeps thresholds at the pair level; this measures what a
    * threshold change does to the final cluster assignment the
    * survivor policy (q78) consumes — ARI ≈ 1 means the knob is
    * safe, low ARI means retune deliberately. All comb terms are
    * exact integers off the (label_lo, label_hi) contingency table.
    *
    * Scale: two pointer-doubling closures over threshold-filtered
    * edge subsets of one pair table (collision-linear), one
    * contingency agg, tiny-frame arithmetic — the q238 topology with
    * clusterings for both sides.
    */
  def thresholdClusterAgreement(
      spark: SparkSession,
      dir: String,
      tLo: Double = 0.3,
      tHi: Double = 0.6
  ): DataFrame = {
    def comb2(c: Column): Column = (c * (c - 1) / 2).cast("long")
    val pairs = ngramJaccardPairs(spark, dir)
    val nodes = docShingles(spark, dir).select(col("doc_id").as("id"))
    def labelsAt(t: Double): DataFrame = ConnectedComponents.run(
      nodes,
      pairs
        .filter(col("jaccard") >= t)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    )
    val ct = labelsAt(tLo)
      .select(col("id"), col("label").as("c_lo"))
      .join(
        labelsAt(tHi).select(col("id"), col("label").as("c_hi")),
        "id"
      )
      .groupBy(col("c_lo"), col("c_hi"))
      .agg(count(lit(1)).as("n_ij"))
      .localCheckpoint(true)
    val cells = ct.agg(
      sum(comb2(col("n_ij"))).as("comb_cells"),
      sum(col("n_ij")).as("n"),
      countDistinct(col("c_lo")).as("n_clusters_lo"),
      countDistinct(col("c_hi")).as("n_clusters_hi")
    )
    val ra = ct
      .groupBy(col("c_lo"))
      .agg(sum(col("n_ij")).as("a"))
      .agg(sum(comb2(col("a"))).as("comb_a"))
    val cb = ct
      .groupBy(col("c_hi"))
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
        col("n_clusters_lo"),
        col("n_clusters_hi"),
        col("comb_cells"),
        col("comb_a"),
        col("comb_b"),
        round(ari * 1e6).cast("long").as("ari_micro")
      )
  }

  /** q274: near-dup pair anatomy — for every exact-Jaccard pair at
    * J ≥ 0.3, WHERE the two documents differ: token-level longest
    * common prefix, longest common suffix (clamped so lcp+lcs never
    * exceeds the shorter doc), the per-side edit-region sizes, and a
    * shape class (identical / suffix_change / prefix_change /
    * middle_edit / unaligned). The cleaning-policy diagnostic on top
    * of the pair score: append/truncate shapes (suffix_change) are
    * boilerplate or version bumps that q256's edge mining strips;
    * scattered shapes are genuine rewrites a survivor policy must
    * arbitrate.
    *
    * Scale: the pair frame is the cached collision-linear artifact;
    * the anatomy is two zips per pair row. Nothing new touches the
    * corpus beyond the one text join onto bounded pairs.
    */
  def nearDupAnatomy(
      spark: SparkSession,
      dir: String,
      minJ: Double = 0.3
  ): DataFrame = {
    // exact ppm emission (round-12 float purge): selection keeps the
    // proven round(·,6) ≥ minJ internal double; only the emitted
    // column becomes idivHalfUp on the intersection integers
    val pairs = shinglePairIntersections(docShingles(spark, dir))
      .withColumn(
        "j_sel",
        round(
          col("inter").cast("double") /
            (col("n_a") + col("n_b") - col("inter")),
          6
        )
      )
      .filter(col("j_sel") >= minJ)
      .select(
        col("doc_a"),
        col("doc_b"),
        graft.functions.IntMath
          .microRatio(col("inter"), col("n_a") + col("n_b") - col("inter"))
          .as("jaccard_ppm")
      )
    val toks = Tables
      .documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("t"))
    def firstMismatch(a: Column, b: Column): Column = {
      val eqs = zip_with(a, b, (x, y) => x <=> y)
      val pos = array_position(eqs, false)
      when(pos === 0, least(size(a), size(b)).cast("long"))
        .otherwise(pos - 1)
    }
    val joined = pairs
      .join(toks.select(col("doc_id").as("doc_a"), col("t").as("ta")), Seq("doc_a"))
      .join(toks.select(col("doc_id").as("doc_b"), col("t").as("tb")), Seq("doc_b"))
      .withColumn("na", size(col("ta")).cast("long"))
      .withColumn("nb", size(col("tb")).cast("long"))
      .withColumn("lcp", firstMismatch(col("ta"), col("tb")))
      .withColumn(
        "lcs_raw",
        firstMismatch(reverse(col("ta")), reverse(col("tb")))
      )
      .withColumn(
        "lcs",
        least(col("lcs_raw"), least(col("na"), col("nb")) - col("lcp"))
      )
    joined
      .select(
        col("doc_a"),
        col("doc_b"),
        col("jaccard_ppm"),
        col("lcp"),
        col("lcs"),
        (col("na") - col("lcp") - col("lcs")).as("edit_a"),
        (col("nb") - col("lcp") - col("lcs")).as("edit_b")
      )
      .withColumn(
        "shape",
        when(col("edit_a") === 0 && col("edit_b") === 0, "identical")
          .when(col("lcp") > 0 && col("lcs") > 0, "middle_edit")
          .when(col("lcp") > 0, "suffix_change")
          .when(col("lcs") > 0, "prefix_change")
          .otherwise("unaligned")
      )
  }

  /** q276: per-document novelty — the fraction of a document's
    * distinct 3-shingles that first appear in THAT document (min
    * doc_id owner over the whole corpus, the q219/q253 attribution
    * convention at document grain). The curation priority signal:
    * high-novelty docs are the corpus's information frontier; docs
    * near zero are recombinations of earlier material and the first
    * candidates under a token budget (q162's weights agree with this
    * but need the cluster closure; this is closure-free).
    *
    * Scale: one shingle inversion, one min-agg per shingle, one
    * shingle-keyed join back, a doc-keyed rollup — all
    * collision-linear, no pairwise work.
    */
  def docNovelty(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), explode(shingles(col("text"), 3)).as("sh"))
    val firstDoc = pairs.groupBy(col("sh")).agg(min(col("doc_id")).as("first_doc"))
    pairs
      .join(firstDoc, "sh")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel")
      )
      .select(
        col("doc_id"),
        col("n_shingles"),
        col("n_novel"),
        graft.functions.IntMath
          .microRatio(col("n_novel"), col("n_shingles"))
          .as("novelty_ppm")
      )
  }

  /** q282: similarity-banded review batch — the human-labeling batch
    * generator: exact-Jaccard pairs bucketed into 0.1-wide similarity
    * bands and, per band, the 3 pairs with the lowest portable md5
    * rank (a uniform deterministic draw, the q144 convention). Spread
    * across bands is the point: threshold calibration needs labels
    * NEAR the decision boundary and sanity anchors far from it, not
    * a top-k that samples only obvious duplicates.
    *
    * Scale: the pair artifact is the cached collision-linear frame;
    * banding is arithmetic; the per-band pick is a bounded window
    * over ≤|bands| partitions.
    */
  def reviewBatch(
      spark: SparkSession,
      dir: String,
      perBand: Int = 3
  ): DataFrame = {
    // banding stays on the proven internal round(·,6) double (the
    // q21 selection convention); the emitted similarity becomes the
    // exact ppm twin (round-12 float purge)
    val pairs = shinglePairIntersections(docShingles(spark, dir))
      .withColumn(
        "j_sel",
        round(
          col("inter").cast("double") /
            (col("n_a") + col("n_b") - col("inter")),
          6
        )
      )
      .filter(col("j_sel") >= 0.05)
      .select(
        col("doc_a"),
        col("doc_b"),
        col("j_sel"),
        graft.functions.IntMath
          .microRatio(col("inter"), col("n_a") + col("n_b") - col("inter"))
          .as("jaccard_ppm")
      )
      .withColumn(
        "band",
        least(floor(col("j_sel") * 10).cast("long"), lit(9L))
      )
    val key = md5(concat_ws(":", col("doc_a"), col("doc_b")))
    val w = Window
      .partitionBy(col("band"))
      .orderBy(key.asc, col("doc_a").asc, col("doc_b").asc)
    pairs
      .withColumn("pick", row_number().over(w))
      .filter(col("pick") <= perBand)
      .select(col("band"), col("pick"), col("doc_a"), col("doc_b"),
        col("jaccard_ppm"))
  }

  /** q143: asymmetric shingle containment C(A,B) = |A∩B| / |A| — the
    * sub-document duplication detector Jaccard misses. A short doc
    * fully embedded in a long one has low Jaccard (the union is
    * dominated by the long doc) but containment ≈ 1 from the short
    * side; curation pipelines use it to drop quote-within-article and
    * boilerplate-wrapper duplicates.
    *
    * Same scale topology as q21: one shingle-inversion self-join over
    * the shared shingle frame (collision-linear — only pairs that
    * share ≥1 shingle ever materialize), then each unordered pair is
    * mirrored into its two directed rows in-row (no second join).
    */
  def shingleContainment(
      spark: SparkSession,
      dir: String,
      minContainment: Double = 0.5
  ): DataFrame = {
    val pairs = shinglePairIntersections(docShingles(spark, dir))
    pairs
      .select(
        explode(
          array(
            struct(
              col("doc_a").as("src"),
              col("doc_b").as("dst"),
              col("inter"),
              col("n_a").as("n_src")
            ),
            struct(
              col("doc_b").as("src"),
              col("doc_a").as("dst"),
              col("inter"),
              col("n_b").as("n_src")
            )
          )
        ).as("r")
      )
      .select(
        col("r.src").as("doc_a"),
        col("r.dst").as("doc_b"),
        col("r.inter").as("inter"),
        col("r.n_src").as("n_src"),
        (col("r.inter").cast("double") / col("r.n_src")).as("c_raw")
      )
      .filter(col("c_raw") >= minContainment)
      .select(
        col("doc_a"),
        col("doc_b"),
        col("inter"),
        // exact ppm from the intersection integers (round-12 float
        // purge); selection and the 0.8 flag stay on the proven
        // internal double
        graft.functions.IntMath
          .microRatio(col("inter"), col("n_src"))
          .as("containment_ppm"),
        (col("c_raw") >= 0.8).as("contained")
      )
  }

  /** q166: cross-source containment matrix — aggregate the q143
    * directed containment pairs by (source of the contained doc,
    * source of the containing doc): which corpus slices copy from
    * which. The per-source curation view a corpus owner actually
    * acts on (drop the mirror, keep the origin), where per-pair
    * output is too fine to read.
    *
    * Scale: the pair table is the q143 banded artifact (bounded by
    * true overlap, not corpus size); this adds two doc-keyed
    * broadcast-able joins onto it and a 25-row aggregate.
    */
  def sourceOverlapMatrix(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    shingleContainment(spark, dir)
      .join(
        src.select(col("doc_id").as("doc_a"), col("source").as("source_a")),
        Seq("doc_a"))
      .join(
        src.select(col("doc_id").as("doc_b"), col("source").as("source_b")),
        Seq("doc_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(
        count(lit(1)).as("n_pairs"),
        // per-pair containment arrives as the exact ppm integer
        // (q143's round-12 emission), so the mean is a pure-BIGINT
        // half-up division with no double anywhere
        graft.functions.IntMath
          .idivHalfUp(sum(col("containment_ppm")), count(lit(1)))
          .as("avg_containment_micro"),
        sum(col("contained").cast("long")).as("n_contained")
      )
  }

  /** q155: test-set n-gram novelty — the memorization/contamination
    * audit of Lee et al. ("Deduplicating Training Data Makes
    * Language Models Better", ACL 2022 §6): for every TEST-split
    * document (the q49 md5 split), the fraction of its distinct
    * 8-gram shingles that never occur in the TRAIN split. A test doc
    * with low novelty is either contaminated (its content leaked
    * into train) or boilerplate — either way its eval loss is
    * untrustworthy.
    *
    * Scale: every gram collapses to its 60-bit md5-prefix key at
    * the explode (the one hash convention the split/KMV/fingerprint
    * family shares — both engines compute it, so membership stays
    * engine-exact even at the astronomically-unlikely collision),
    * which makes the train-side DISTINCT and the membership join
    * shuffle fixed-width longs instead of 8-word strings (~8× less
    * shuffle). The train side collapses to distinct keys before the
    * join (partial-aggregated groupBy), the probe is a key-hashed
    * left join (skew-free: grams are near-unique by construction),
    * and the per-doc rollup re-shuffles only (doc_id, flag) pairs.
    * No step ever holds a document's full text after the explode.
    */
  def ngramNovelty(spark: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val toks = tokens(col("text"))
    val grams = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        hash60(col("doc_id")).mod(100).cast("int").as("bucket"),
        explode(
          when(
            size(toks) >= n,
            array_distinct(
              transform(
                sequence(lit(0), size(toks) - n),
                i => array_join(slice(toks, i + 1, lit(n)), " ")
              )
            )
          ).otherwise(array().cast("array<string>"))
        ).as("g")
      )
      .select(col("doc_id"), col("bucket"), hash60(col("g")).as("gk"))
      // both split branches read this — cache the slim (doc, bucket,
      // 60-bit key) frame so tokenize+explode+hash runs once, not
      // once per branch
      .cacheTracked()
    val train = grams
      .filter(col("bucket") < 80)
      .select(col("gk"))
      .distinct()
      .withColumn("in_train", lit(1))
    grams
      .filter(col("bucket") >= 90)
      .select(col("doc_id"), col("gk"))
      .join(train, Seq("gk"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("in_train"), lit(0))).as("n_seen")
      )
      .select(
        col("doc_id"),
        col("n_grams"),
        col("n_seen"),
        graft.functions.IntMath
          .microRatio(col("n_grams") - col("n_seen"), col("n_grams"))
          .as("novelty_ppm")
      )
  }

  /** q165: multi-signal dedup clusters — the production dedup shape:
    * surface-form edges (the q21 shingle-Jaccard pairs ≥ 0.05, the
    * cached derive-once artifact) UNIONed with semantic edges (the
    * q26 banded sign-LSH embedding near-dups, cosine > 0.4), one
    * transitive closure over the combined graph. Text near-dups that
    * embed differently and paraphrases that share no shingles both
    * land in the same cluster — either signal alone misses one of
    * the two.
    *
    * Scale: both edge generators keep their audited banded
    * topologies; the union adds nothing but a concat of two pair
    * tables; the closure is the same O(log d) pointer-doubling CC
    * that clusters q72. Nodes = shingled docs ∪ embedded ids.
    */
  def multiSignalClusters(spark: SparkSession, dir: String): DataFrame = {
    val textEdges = ngramJaccardPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val embEdges = Similarity
      .embeddingNearDupPairs(spark, dir)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val edges = textEdges.unionByName(embEdges).distinct()
    val nodes = docShingles(spark, dir)
      .select(col("doc_id"))
      .unionByName(
        Tables.embeddings(spark, dir).select(col("vec_id").as("doc_id")))
      .distinct()
    val labels = ConnectedComponents.run(
      nodes.select(col("doc_id").as("id")),
      edges.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val sizes = labels
      .groupBy(col("label"))
      .agg(count(lit(1)).as("cluster_size"))
    labels
      .join(sizes, "label")
      .select(
        col("id").as("doc_id"),
        col("label").as("cluster_id"),
        col("cluster_size")
      )
  }

  /** q179: per-source duplication report — for every source, how
    * many docs sit in near-dup clusters, how many survive keep-one
    * dedup (the min-id survivor convention), and the redundancy
    * fraction. The "which sources are worth crawling" dashboard row:
    * a source that is 60% redundant pays for itself at 40 cents on
    * the dollar.
    *
    * Scale: the q72 closure labels (cached pair artifact + CC) plus
    * one doc-keyed join and a per-source aggregate.
    */
  def sourceDupReport(spark: SparkSession, dir: String): DataFrame = {
    val cl = dedupClusters(spark, dir)
      .select(col("doc_id"), col("survivor"))
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .join(cl, "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("survivor").cast("long")).as("n_survivors")
      )
      .select(
        col("source"),
        col("n_docs"),
        col("n_survivors"),
        graft.functions.IntMath
          .microRatio(col("n_docs") - col("n_survivors"), col("n_docs"))
          .as("redundancy_ppm")
      )
  }

  /** q159: EXACT set-similarity self-join with prefix filtering
    * (PPJoin's candidate-pruning principle — Xiao et al., "Efficient
    * Similarity Joins for Near Duplicate Detection", WWW 2008 §3):
    * the deterministic alternative to MinHash-LSH (q22) when the
    * pipeline needs *provably no missed pairs* at Jaccard ≥ t.
    * Shingles get a global rare-first total order (document
    * frequency ASC, shingle ASC); each document exposes only its
    * first |S| − ⌈t·|S|⌉ + 1 ordered shingles as join keys — any
    * pair with J ≥ t MUST share a prefix element under a common
    * total order, so pruning is lossless, while frequent shingles
    * (the quadratic blowup in q21's full inversion) fall out of the
    * candidate generation entirely.
    *
    * Scale: the df rank table is a partial-aggregated groupBy joined
    * back onto the exploded stream (a shingle-keyed window count was
    * measured SLOWER: near-unique keys make millions of one-row
    * window partitions); the per-doc ordering is ONE doc_id-keyed
    * window (rank and set size
    * share the shuffle+sort — no per-doc array is materialized); the
    * candidate join carries only prefix rows (~(1−t) of the shingle
    * volume); verification joins the two full shingle sets back by
    * doc key. The verify step is collision-linear in TRUE near-dup
    * pairs, not in shared-shingle pairs.
    */
  def prefixFilterJoin(
      spark: SparkSession,
      dir: String,
      t: Double = 0.5
  ): DataFrame = {
    val d = docShingles(spark, dir)
    val dfreq = d
      .select(explode(col("sh")).as("s"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("df"))
    // rank each (doc, shingle) in the global rare-first order with
    // ONE doc-keyed window (rank and |S| share the shuffle+sort) —
    // no per-doc array is ever materialized
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
    val ex = d
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .join(dfreq, Seq("s"))
      .withColumn(
        "rn",
        row_number().over(wDoc.orderBy(col("df").asc, col("s").asc)))
      .withColumn("n", count(lit(1)).over(wDoc))
      .filter(col("rn") <= col("n") - ceil(lit(t) * col("n")) + 1)
      .select(col("doc_id"), col("s"))
    val cand = ex
      .select(col("doc_id").as("doc_a"), col("s"))
      .join(ex.select(col("doc_id").as("doc_b"), col("s")), Seq("s"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    val full = d.select(col("doc_id"), col("sh"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val j = inter.cast("double") /
      (size(col("sh_a")) + size(col("sh_b")) - inter)
    cand
      .join(
        full.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
        Seq("doc_a"))
      .join(
        full.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        Seq("doc_b"))
      .filter(j >= t)
      .select(
        col("doc_a"),
        col("doc_b"),
        // exact ppm from the intersection integers (round-12 float
        // purge); the ≥ t selection stays on the internal double
        graft.functions.IntMath
          .microRatio(
            inter,
            size(col("sh_a")) + size(col("sh_b")) - inter
          )
          .as("jaccard_ppm")
      )
  }

  /** q186: content-defined chunking (CDC) dedup — variable-length
    * chunks whose boundaries are set by the CONTENT (a token is a cut
    * point iff hash(token) ≡ 0 mod 8), so an insertion early in a
    * document shifts only the chunk it lands in; every later chunk
    * re-aligns and still dedups. That shift resistance is what the
    * fixed-span (q96) and disjoint-segment (q136) forms lack — CDC is
    * the rolling-boundary trick of storage dedup (LBFS/restic)
    * applied to corpus text.
    *
    * Pipeline: tokenize with positions → boundary flags → per-doc
    * chunk ids as a running boundary count (window over the doc's
    * tokens only — bounded partitions) → chunk rows (ordered token
    * join, md5 key) → corpus-wide keep-first on chunk key (first =
    * lowest (doc_id, chunk_start)) → per-doc duplication report.
    *
    * Scale: the only corpus-wide shuffle is the chunk-key groupBy
    * (keys ∝ distinct content, partially aggregated); per-doc windows
    * partition on doc_id. Expected chunk length is the boundary
    * modulus (8 tokens) — the granularity/robustness dial.
    *
    * Determinism: the boundary hash is the portable [[hash60]]; the
    * winner tie-break is the (doc_id, chunk_start) struct-min; chunk
    * keys are md5 of the space-joined tokens.
    */
  def cdcChunkDedup(spark: SparkSession, dir: String): DataFrame =
    cdcChunkDedupFrom(Tables.documents(spark, dir))

  /** q189: normalization-aware exact dedup — the CCNet preprocessing
    * insight made measurable: exact dedup on RAW text misses copies
    * that differ only in case, punctuation, or whitespace, so
    * production pipelines canonicalize first. This query reports the
    * delta: per document, is it an exact duplicate under the raw
    * key, under the normalized key (lowercase, strip non-alnum,
    * collapse whitespace), and — the interesting set — only under
    * normalization. The norm-only fraction is the yield a pipeline
    * forfeits by skipping canonicalization.
    *
    * Scale: two md5 keys per row in one scan; group sizes via two
    * key-partitioned window counts (bounded by duplicate family
    * size). Both keys and the normalization are engine-portable
    * (lower / regexp_replace / md5 — identical in the oracle).
    */
  def normalizedDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val norm = trim(
      regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9\\s]", ""),
        "\\s+",
        " "
      )
    )
    val keyed = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        md5(col("text")).as("raw_key"),
        md5(norm).as("norm_key"),
        // punctuation/whitespace-only docs all normalize to "", which
        // would flag unrelated empty-content docs as duplicates of
        // each other — an empty canonical form is "no content", not
        // "same content"
        (length(norm) > 0).as("has_content")
      )
    val rawW = Window.partitionBy(col("raw_key"))
    val normW = Window.partitionBy(col("norm_key"))
    keyed
      .withColumn("raw_n", count(lit(1)).over(rawW))
      .withColumn("norm_n", count(lit(1)).over(normW))
      .select(
        col("doc_id"),
        (col("raw_n") > 1).as("raw_dup"),
        (col("norm_n") > 1 && col("has_content")).as("norm_dup"),
        (col("norm_n") > 1 && col("has_content") && col("raw_n") === 1)
          .as("norm_only_dup")
      )
  }

  /** q187: dedup threshold sensitivity sweep — the report an operator
    * reads BEFORE picking the near-dup Jaccard cutoff: for every
    * candidate threshold t ∈ {0.05, 0.10, …, 1.00}, how many pairs
    * survive, how many documents would be flagged as duplicates
    * (appear as the larger id of a qualifying pair — the keep-first
    * upper bound, no closure needed), and the corpus retention that
    * implies. One pass over the SAME cached pair artifact the dedup
    * family (q21/q72/q78) already derives: each pair fans out to its
    * qualifying thresholds (≤ 20 rows), so the sweep costs one
    * explode + groupBy over the pair table — never a per-threshold
    * re-clustering.
    *
    * Determinism: thresholds realized as integer steps k with
    * k ≤ floor(jaccard/0.05) — identical double arithmetic in the
    * oracle; counts are exact aggregates.
    */
  def dedupThresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val pairs = ngramJaccardPairs(spark, dir)
    val total = Tables
      .documents(spark, dir)
      .agg(count(lit(1)).as("n_docs"))
    pairs
      // jaccard is a 6-decimal rounded value; rescale it to an exact
      // integer (round kills the binary residue) so the threshold
      // comparison is integer arithmetic — floor(j / 0.05) in IEEE
      // doubles drops pairs sitting exactly ON a threshold (0.15/0.05
      // = 2.9999…96)
      .select(
        explode(
          sequence(
            lit(1),
            floor(round(col("jaccard") * 1000000) / 50000.0).cast("int")
          )
        ).as("k"),
        col("doc_a"),
        col("doc_b")
      )
      .groupBy(col("k"))
      .agg(
        count(lit(1)).as("n_pairs"),
        countDistinct(col("doc_b")).as("n_dup_docs")
      )
      .crossJoin(broadcast(total))
      .select(
        (col("k").cast("long") * 5L).as("threshold_pct"),
        col("n_pairs"),
        col("n_dup_docs"),
        graft.functions.IntMath
          .microRatio(col("n_docs") - col("n_dup_docs"), col("n_docs"))
          .as("retention_ppm")
      )
  }

  /** The CDC pipeline over a prepared (doc_id, text) frame — the seam
    * the shift-resistance spec drives with synthetic insertions.
    */
  def cdcChunkDedupFrom(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "w")))
      .withColumn("cut", (pmod(hash60(col("w")), lit(8)) === 0).cast("int"))
    val w = Window
      .partitionBy(col("doc_id"))
      .orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // a cut token ENDS its chunk: chunk id = boundaries strictly
    // before this token = inclusive running count minus own flag
    val chunked = toks
      .withColumn("chunk", sum(col("cut")).over(w) - col("cut"))
    val chunks = chunked
      .groupBy(col("doc_id"), col("chunk"))
      .agg(
        min(col("pos")).as("chunk_start"),
        count(lit(1)).as("n_toks"),
        md5(
          concat_ws(
            " ",
            transform(
              array_sort(collect_list(struct(col("pos"), col("w")))),
              s => s.getField("w")
            )
          )
        ).as("ckey")
      )
      // feeds the keep-first aggregate AND the per-doc report join
      .cacheTracked()
    val winners = chunks
      .groupBy(col("ckey"))
      .agg(min(struct(col("doc_id"), col("chunk_start"))).as("first"))
    chunks
      .join(winners, Seq("ckey"))
      .withColumn(
        "dup",
        (col("doc_id") =!= col("first.doc_id") ||
          col("chunk_start") =!= col("first.chunk_start")).cast("int")
      )
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("dup")).as("n_dup_chunks"),
        sum(col("n_toks")).as("n_tokens"),
        graft.functions.IntMath
          .microRatio(sum(col("dup") * col("n_toks")), sum(col("n_toks")))
          .as("dup_token_ppm")
      )
  }

  /** q315: 2-core audit of the J ≥ 0.5 near-dup graph — each
    * cluster's size next to its 2-core (the subgraph left after
    * iteratively peeling degree-1 nodes). A cluster whose 2-core is
    * empty is a CHAIN — its members are linked through intermediaries
    * and transitive dedup may be over-merging (q208's wedge rate is
    * the global symptom; this localizes it per cluster) — while a
    * large 2-core is a genuine dense duplicate community safe to
    * collapse to one survivor. Peeling is unrolled to 5 rounds (the
    * q93 Lloyd convention: bounded unrolled iterations, oracle
    * replays the same 5); the spec asserts the peel reaches its
    * fixpoint within 5 rounds on the test corpus.
    *
    * Scale: edges are the audited banded pair set; each peel round
    * is one degree agg + one semi-join (collision-volume, not
    * corpus); cluster labels ride the pointer-doubling CC.
    */
  def coreAudit(spark: SparkSession, dir: String): DataFrame = {
    val d = docShingles(spark, dir)
    val ed = ngramJaccardPairsFrom(d)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
      .cacheTracked()
    val sym = ed
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
      .unionByName(ed.select(col("doc_b").as("a"), col("doc_a").as("b")))
    val nodes = sym.select(col("a").as("id")).distinct()
    val labels = ConnectedComponents.run(
      nodes,
      ed.select(col("doc_a").as("src"), col("doc_b").as("dst"))
    )
    // five unrolled peel rounds: alive := {n : deg_alive(n) >= 2}.
    // Each round references the previous round's frame TWICE (both
    // join sides) — without materialization the plan tree doubles
    // per round (2^5 copies of the pair generator; measured 21 s at
    // sf0.1). Caching each round's survivor set keeps the plan
    // linear in rounds.
    var alive = nodes.select(col("id").as("n"))
    for (_ <- 1 to 5) {
      val ealive = sym
        .join(alive.select(col("n").as("a")), "a")
        .join(alive.select(col("n").as("b")), "b")
      alive = ealive
        .groupBy(col("a"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 2)
        .select(col("a").as("n"))
        .cacheTracked()
    }
    val core = alive.select(col("n").as("id"), lit(1L).as("in_core"))
    labels
      .join(core, Seq("id"), "left")
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("cluster_size"),
        sum(coalesce(col("in_core"), lit(0L))).as("core2_size")
      )
      .select(
        col("label").as("cluster_id"),
        col("cluster_size"),
        col("core2_size"),
        (col("core2_size") > 0).as("has_core"),
        (col("core2_size") === 0 && col("cluster_size") > 2)
          .as("chain_suspect")
      )
  }

  /** q341: survivor quality uplift — what the q78 keep-the-best
    * policy actually BUYS over keep-min-id, by cluster-size band:
    * the mean quality of kept survivors, the mean over all cluster
    * members, the mean of the min-id alternative, and the uplift in
    * micro. Dedup policy reviews argue about survivor selection in
    * the abstract; this prices it (uplift ≈ 0 means min-id is fine
    * and cheaper — no quality join needed at 100 TB). Exact integer
    * sums off the audited cluster closure; singleton clusters are
    * excluded (no choice to make).
    *
    * Scale: the cached q72 labels + one quality join, two bounded
    * aggregates.
    */
  def survivorUplift(spark: SparkSession, dir: String): DataFrame = {
    val labels = dedupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .filter(col("cluster_size") > 1)
    val quality = TextAnalysis
      .qualityMicroScores(spark, dir)
      .select(col("doc_id"), col("q_micro").as("qm"))
    val withQ = labels.join(quality, "doc_id")
    val perCluster = withQ
      .groupBy(col("cluster_id"))
      .agg(
        max(col("cluster_size")).as("cluster_size"),
        count(lit(1)).as("n"),
        sum(col("qm")).as("q_sum"),
        // best-quality survivor (q78's rule: quality desc, id asc)
        max(struct(col("qm"), (-col("doc_id")).as("nid")))
          .as("best"),
        // min-id survivor's quality
        min(struct(col("doc_id"), col("qm"))).as("minid")
      )
      .select(
        col("cluster_id"),
        col("cluster_size"),
        col("n"),
        col("q_sum"),
        col("best.qm").as("q_best"),
        col("minid.qm").as("q_minid")
      )
    perCluster
      .groupBy(
        least(col("cluster_size"), lit(5L)).as("size_band")
      )
      .agg(
        count(lit(1)).as("n_clusters"),
        graft.functions.IntMath
          .idivHalfUp(sum(col("q_best")), count(lit(1)))
          .as("best_micro"),
        graft.functions.IntMath
          .idivHalfUp(sum(col("q_minid")), count(lit(1)))
          .as("minid_micro"),
        graft.functions.IntMath
          .idivHalfUp(sum(col("q_sum")), sum(col("n")))
          .as("member_micro")
      )
      .select(
        col("size_band"),
        col("n_clusters"),
        col("best_micro"),
        col("minid_micro"),
        col("member_micro"),
        (col("best_micro") - col("minid_micro")).as("uplift_micro")
      )
  }

  /** q342: duplicate arrival-gap coverage — the distribution of
    * |doc_a − doc_b| (arrival-order distance, the q253/q325 proxy)
    * over J ≥ 0.5 pairs, in power-of-10 bands with cumulative
    * coverage. This SIZES the streaming dedup state (q101/q181 keep
    * a bounded window): "a TTL of 10^k arrival units catches Y% of
    * duplicates" is exactly this table, and the tail band is the
    * recall ceiling any bounded-state dedup accepts. Exact integer
    * gaps; band = decimal digit count of the gap.
    *
    * Scale: the collision-linear pair set + one bounded agg and a
    * ≤10-row cumulative window.
    */
  def dupArrivalGaps(spark: SparkSession, dir: String): DataFrame = {
    val pairs = ngramJaccardPairs(spark, dir)
      .filter(col("jaccard") >= 0.5)
      .select(
        length((col("doc_b") - col("doc_a")).cast("string"))
          .cast("long").as("gap_digits")
      )
    val bands = pairs
      .groupBy(col("gap_digits"))
      .agg(count(lit(1)).as("n_pairs"))
    val tot = broadcast(bands.agg(sum(col("n_pairs")).as("n_total")))
    val w = Window
      .orderBy(col("gap_digits").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bands
      .withColumn("cum", sum(col("n_pairs")).over(w))
      .crossJoin(tot)
      .select(
        col("gap_digits"),
        col("n_pairs"),
        graft.functions.IntMath
          .microRatio(col("cum"), col("n_total")).as("coverage_ppm")
      )
  }

  /** q349: dedup token savings per source — the tokens the q78
    * keep-the-best policy REMOVES, attributed to the source of each
    * removed document: removed docs, removed tokens, and the share
    * of the source's token mass that was duplicate weight. This is
    * q341's value audit turned into the budget ledger (q328's stage
    * view aggregates globally; budgets are negotiated per source),
    * and a source whose removed share dwarfs its peers is the
    * re-crawl to fix first. Exact integer sums off the audited
    * closure and the q78 survivor rule.
    *
    * Scale: the cached cluster labels + one quality join for the
    * argmax + one token scan; |sources|-row rollup.
    */
  def dedupTokenSavings(spark: SparkSession, dir: String): DataFrame = {
    val labels = dedupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    val quality = TextAnalysis
      .qualityMicroScores(spark, dir)
      .select(col("doc_id"), col("q_micro").as("q"))
    val keep = labels
      .join(quality, "doc_id")
      .groupBy(col("cluster_id"))
      .agg(max(struct(col("q"), (-col("doc_id")).as("nid"))).as("best"))
      .select((-col("best.nid")).as("keep_doc"))
    val docs = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long")
          .as("tk")
      )
    // doc_id-keyed shuffle join, NOT a broadcast: the survivor set
    // is one row per near-dup cluster — at web scale dup mass makes
    // that billions of rows, far past any driver/broadcast budget
    val removed = labels
      .join(
        keep.select(col("keep_doc").as("doc_id"), lit(true).as("kept")),
        Seq("doc_id"),
        "left"
      )
      .filter(col("kept").isNull)
      .select(col("doc_id"))
    docs
      .join(
        removed.select(col("doc_id"), lit(true).as("removed")),
        Seq("doc_id"),
        "left"
      )
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tk")).as("n_tokens"),
        sum(when(col("removed"), 1L).otherwise(0L)).as("docs_removed"),
        sum(when(col("removed"), col("tk")).otherwise(0L))
          .as("tokens_removed")
      )
      .select(
        col("source"),
        col("n_docs"),
        col("docs_removed"),
        col("tokens_removed"),
        when(col("n_tokens") === 0L, lit(null).cast("long"))
          .otherwise(
            graft.functions.IntMath
              .microRatio(col("tokens_removed"), col("n_tokens")))
          .as("removed_ppm")
      )
  }

  /** q346: IDF-weighted Jaccard — the q21 pair set rescored with
    * each shingle worth ln(N/df): shared BOILERPLATE shingles
    * (template headers, common phrases) stop inflating similarity,
    * and rare-content overlap dominates. Emitted per candidate pair
    * next to the unweighted score with the verdict flip at the 0.5
    * cut — flipped pairs are exactly where template-heavy corpora
    * over- or under-merge under plain Jaccard. Weights are
    * nano-quantized per shingle (exact BIGINT pair sums); the
    * topology is the same collision-linear inversion with weighted
    * instead of unit counts.
    *
    * Scale: one df aggregate (vocab-sized, joined into the
    * inversion), the q21 pair join carrying weighted partial sums.
    */
  def weightedJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val d = docShingles(spark, dir)
    val e = d
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val nDocs = broadcast(d.agg(count(lit(1)).as("nd")))
    val df = e
      .groupBy(col("s"))
      .agg(count(lit(1)).as("df"))
      .crossJoin(nDocs)
      .select(
        col("s"),
        round(log(col("nd").cast("double") / col("df")) * 1e9)
          .cast("long").as("w_nano")
      )
    val ew = e.join(df, "s").cacheTracked()
    val docW = ew
      .groupBy(col("doc_id"))
      .agg(sum(col("w_nano")).as("w_doc"), count(lit(1)).as("n_sh"))
    val inter = ew
      .select(col("doc_id").as("doc_a"), col("s"), col("w_nano"))
      .join(
        ew.select(col("doc_id").as("doc_b"), col("s")),
        Seq("s")
      )
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(
        sum(col("w_nano")).as("inter_w"),
        count(lit(1)).as("inter")
      )
    inter
      .join(
        docW.select(col("doc_id").as("doc_a"), col("w_doc").as("wa"),
          col("n_sh").as("n_a")),
        "doc_a"
      )
      .join(
        docW.select(col("doc_id").as("doc_b"), col("w_doc").as("wb"),
          col("n_sh").as("n_b")),
        "doc_b"
      )
      .select(
        col("doc_a"),
        col("doc_b"),
        col("inter"),
        (col("n_a") + col("n_b") - col("inter")).as("union_n"),
        col("inter_w"),
        (col("wa") + col("wb") - col("inter_w")).as("union_w"),
        round(
          col("inter").cast("double") /
            (col("n_a") + col("n_b") - col("inter")),
          6
        ).as("j_sel"),
        round(
          col("inter_w").cast("double") /
            (col("wa") + col("wb") - col("inter_w")),
          6
        ).as("w_sel")
      )
      .filter(col("j_sel") >= 0.05 || col("w_sel") >= 0.05)
      .select(
        col("doc_a"),
        col("doc_b"),
        // exact integer emissions (round-12 float purge): the
        // unweighted Jaccard in ppm; the WEIGHTED one in milli — its
        // nano-unit weight sums are ~10¹² at sf0.1, and ×10⁶ would
        // overflow signed 64-bit where ×10³ stays 10³ clear of it.
        // Selection thresholds and the flip flag stay on the proven
        // internal doubles.
        graft.functions.IntMath
          .microRatio(col("inter"), col("union_n"))
          .as("jaccard_ppm"),
        graft.functions.IntMath
          .idivHalfUp(col("inter_w") * lit(1000L), col("union_w"))
          .as("wjaccard_milli"),
        ((col("j_sel") >= 0.5) =!= (col("w_sel") >= 0.5)).as("flipped")
      )
  }

  /** q347: blocking-scheme quality — the two textbook record-linkage
    * gauges for three candidate generators the engine ships
    * (first-token block, MinHash bands, ten-token length bucket):
    * REDUCTION RATIO (1 − candidates/allPairs — how much of the n²
    * the scheme avoids) and PAIR COMPLETENESS (the fraction of true
    * J ≥ 0.5 pairs the scheme's candidates cover). The ER-planning
    * table: a scheme is viable only in the top-right corner, and the
    * exact frontier depends on the corpus — measured here, not
    * assumed. All counts exact; allPairs = n(n−1)/2 analytic.
    *
    * Scale: each scheme is collision-linear candidate generation;
    * truth rides the audited inversion; three bounded summary rows.
    */
  def blockingQuality(spark: SparkSession, dir: String): DataFrame = {
    val d = docShingles(spark, dir).cacheTracked()
    val truth = ngramJaccardPairsFrom(d)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
      .cacheTracked()
    val nTrue = broadcast(truth.agg(count(lit(1)).as("n_true")))
    val docs = Tables.documents(spark, dir)
    // the reduction-ratio denominator is the FULL corpus pair space
    // (schemes may block docs the shingle set excludes)
    val nDocs = broadcast(docs.agg(count(lit(1)).as("nd")))
    def summarize(name: String, cand: DataFrame): DataFrame = {
      val c = cand.distinct().cacheTracked()
      broadcast(c.agg(count(lit(1)).as("n_candidates")))
        .crossJoin(broadcast(
          c.join(truth, Seq("doc_a", "doc_b"))
            .agg(count(lit(1)).as("n_covered"))
        ))
        .crossJoin(nTrue)
        .crossJoin(nDocs)
        .select(
          lit(name).as("scheme"),
          col("n_candidates"),
          col("n_true"),
          col("n_covered"),
          graft.functions.IntMath.microRatio(
            col("nd") * (col("nd") - 1) - lit(2L) * col("n_candidates"),
            col("nd") * (col("nd") - 1)).as("reduction_ppm"),
          when(col("n_true") === 0L, lit(0L))
            .otherwise(
              graft.functions.IntMath
                .microRatio(col("n_covered"), col("n_true"))
            ).as("completeness_ppm")
        )
    }
    // scheme 1: first-token blocking
    val ft = docs
      .select(
        col("doc_id"),
        element_at(graft.functions.TextFunctions.tokens(col("text")), 1)
          .as("k")
      )
      .filter(col("k").isNotNull)
    val ftPairs = ft
      .select(col("k"), col("doc_id").as("doc_a"))
      .join(ft.select(col("k"), col("doc_id").as("doc_b")), Seq("k"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
    // scheme 2: the q22 MinHash bands
    val mhPairs = minhashLshPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    // scheme 3: ten-token length bucket
    val lb = docs
      .select(
        col("doc_id"),
        least(
          floor(
            size(graft.functions.TextFunctions.tokens(col("text")))
              .cast("long") / lit(10.0)
          ).cast("long"),
          lit(9L)
        ).as("k")
      )
    val lbPairs = lb
      .select(col("k"), col("doc_id").as("doc_a"))
      .join(lb.select(col("k"), col("doc_id").as("doc_b")), Seq("k"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
    summarize("first_token", ftPairs)
      .unionByName(summarize("minhash_bands", mhPairs))
      .unionByName(summarize("length_bucket", lbPairs))
  }

  /** q348: normalization lift — how much MORE exact-duplicate mass
    * each text-normalization stage exposes: raw md5, lowercase,
    * + whitespace collapse, + punctuation strip. Per stage: distinct
    * texts, docs in duplicate groups, and the LIFT over the previous
    * stage — the cleaning-pipeline decision table for which
    * normalizations are worth running before exact dedup at 100 TB
    * (a stage with zero lift is a wasted pass). Exact integer
    * counts; stages are cumulative by construction.
    *
    * Scale: one scan × 4 hash projections, four group-by-hash
    * aggregates (map-side), a 4-row summary.
    */
  def normalizationLift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val raw = col("text")
    val lowered = lower(col("text"))
    val ws = regexp_replace(trim(lower(col("text"))), "\\s+", " ")
    val punct = regexp_replace(
      regexp_replace(trim(lower(col("text"))), "\\s+", " "),
      "[.,!?;:]",
      ""
    )
    val stages = Seq(
      ("0_raw", raw),
      ("1_lower", lowered),
      ("2_whitespace", ws),
      ("3_punct", punct)
    )
    stages
      .map { case (name, expr0) =>
        docs
          .groupBy(md5(expr0).as("h"))
          .agg(count(lit(1)).as("c"))
          .agg(
            count(lit(1)).as("n_distinct"),
            sum(when(col("c") > 1, col("c")).otherwise(0L))
              .as("docs_in_dups"),
            sum(col("c")).as("n_docs")
          )
          .select(
            lit(name).as("stage"),
            col("n_distinct"),
            col("docs_in_dups"),
            graft.functions.IntMath
              .microRatio(col("docs_in_dups"), col("n_docs"))
              .as("dup_ppm")
          )
      }
      .reduce(_.unionByName(_))
  }

  /** q334: LSH cost attribution — the q22 band join's candidate
    * pairs rolled up by (source_a, source_b): which source pairs
    * generate the verification work. Dedup cost at 100 TB is
    * candidate volume, not corpus size, and it concentrates: a
    * template-heavy source pair can own most of the join. This
    * table prices per-source dedup (small filters, q312) against
    * global dedup, and names the pair to block-key first. Exact
    * counts plus each cell's share and its true-pair yield
    * (candidates that verify at J ≥ 0.5).
    *
    * Scale: the existing banded candidate generator (collision-
    * linear) + two broadcast doc→source maps; the rollup is
    * |sources|²-bounded.
    */
  def lshCostAttribution(spark: SparkSession, dir: String): DataFrame = {
    val srcMap = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"))
    val cand = minhashLshPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val withSrc = cand
      .join(
        srcMap.select(col("doc_id").as("doc_a"), col("source").as("sa")),
        "doc_a"
      )
      .join(
        srcMap.select(col("doc_id").as("doc_b"), col("source").as("sb")),
        "doc_b"
      )
      .select(
        least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"),
        col("jaccard")
      )
    val tot = broadcast(withSrc.agg(count(lit(1)).as("n_total")))
    withSrc
      .groupBy(col("source_a"), col("source_b"))
      .agg(
        count(lit(1)).as("n_candidates"),
        sum(when(col("jaccard") >= 0.5, 1L).otherwise(0L))
          .as("n_true")
      )
      .crossJoin(tot)
      .select(
        col("source_a"),
        col("source_b"),
        col("n_candidates"),
        col("n_true"),
        graft.functions.IntMath
          .microRatio(col("n_candidates"), col("n_total"))
          .as("cost_share_ppm"),
        graft.functions.IntMath
          .microRatio(col("n_true"), col("n_candidates"))
          .as("yield_ppm")
      )
  }

  /** q329: b-bit minwise audit (Li & König 2010) — keep only the
    * LOW BIT of each of the 12 MinHash permutations (32× less
    * signature storage than the 60-bit values) and audit the b=1
    * estimator Ĵ = 2·(c/k) − 1 against the exact Jaccard on the
    * candidate pair set, bucketed by exact-J band: pair count, mean
    * absolute error, mean bias (all milli). The storage/accuracy
    * trade the 100 TB signature store actually negotiates —
    * unrelated pairs collide on half their bits by chance, which is
    * why the estimator recentres, and why this audit shows b=1 is
    * fine at high J (the dedup regime) and noisy below.
    *
    * Scale: one signature pass; pair work rides the existing exact
    * candidate generator (collision-linear); per-pair arithmetic is
    * 12 bit-compares in codegen.
    */
  def bBitMinwiseAudit(spark: SparkSession, dir: String): DataFrame = {
    val d = docShingles(spark, dir)
      .withColumn(
        "mh",
        graft.functions.Md5MinHashSig.md5MinhashSig(col("sh"), 12)
      )
      .withColumn("bits", transform(col("mh"), h => pmod(h, lit(2L))))
      .cacheTracked()
    val pairs = ngramJaccardPairsFrom(d)
    val withBits = pairs
      .join(
        d.select(col("doc_id").as("doc_a"), col("bits").as("ba")),
        "doc_a"
      )
      .join(
        d.select(col("doc_id").as("doc_b"), col("bits").as("bb")),
        "doc_b"
      )
      .withColumn(
        "c",
        aggregate(
          zip_with(col("ba"), col("bb"), (x, y) =>
            when(x === y, 1L).otherwise(0L)),
          lit(0L),
          (acc, v) => acc + v
        )
      )
      // b=1 estimator, clipped to [0, 1]
      .withColumn(
        "est_milli",
        // (2c/12 − 1)·1e3 = (c−6)·1000/6 as exact signed half-up
        greatest(
          lit(0L),
          graft.functions.IntMath
            .idivHalfUpSigned((col("c") - 6) * lit(1000L), lit(6L))
        )
      )
      .withColumn(
        "err_milli",
        // j is 6-decimal-rounded: snap it to micro once, then the
        // milli quantization is exact integer half-up (j·1e3 of a
        // .xxx5-valued j is a genuine half-boundary otherwise)
        col("est_milli") - graft.functions.IntMath.idivHalfUp(
          round(col("jaccard") * 1e6).cast("long"), lit(1000L))
      )
    withBits
      .groupBy(
        least(
          graft.functions.IntMath.idiv(
            round(col("jaccard") * 1e6).cast("long"), lit(100000L)),
          lit(9L)
        ).as("j_band")
      )
      .agg(
        count(lit(1)).as("n_pairs"),
        round(avg(abs(col("err_milli")))).cast("long")
          .as("mean_abs_err_milli"),
        graft.functions.IntMath
          .idivHalfUpSigned(sum(col("err_milli")), count(lit(1)))
          .as("mean_bias_milli")
      )
  }

  /** q323: capture-recapture pair-count estimate — the 12-perm
    * signature's six 2-row bands split into two independent 3-band
    * "nets" A and B; each catches a set of candidate pairs, and the
    * Chapman estimator N̂ = (|A|+1)(|B|+1)/(|A∩B|+1) − 1 estimates
    * the total catchable near-dup pair population WITHOUT
    * enumerating it. At 100 TB the exact pair count is unknowable —
    * this is how a dedup run estimates its own recall (caught/N̂);
    * at bench scale the exact J ≥ 0.5 truth sits alongside, so the
    * estimator itself is audited. All counts exact; the estimate is
    * two multiplications and a division.
    *
    * Scale: two half-signature band joins (collision-linear) + 1-row
    * arithmetic; the truth column is the bench-only audit baseline.
    */
  def captureRecapture(spark: SparkSession, dir: String): DataFrame = {
    val d = docShingles(spark, dir)
      .withColumn(
        "mh",
        graft.functions.Md5MinHashSig.md5MinhashSig(col("sh"), 12)
      )
      .cacheTracked()
    def net(bandLo: Int, bandHi: Int): DataFrame = {
      val banded = d
        .select(
          col("doc_id"),
          explode(
            transform(
              sequence(lit(bandLo), lit(bandHi)),
              j =>
                struct(
                  j.as("j"),
                  concat_ws(
                    "_",
                    element_at(col("mh"), j * 2 + 1),
                    element_at(col("mh"), j * 2 + 2)
                  ).as("bval")
                )
            )
          ).as("bk")
        )
        .select(col("doc_id"), col("bk.j"), col("bk.bval"))
      banded
        .select(col("j"), col("bval"), col("doc_id").as("doc_a"))
        .join(
          banded.select(col("j"), col("bval"), col("doc_id").as("doc_b")),
          Seq("j", "bval")
        )
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"))
        .distinct()
    }
    val a = net(0, 2).cacheTracked()
    val b = net(3, 5).cacheTracked()
    val truth = ngramJaccardPairsFrom(d)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
    val nA = broadcast(a.agg(count(lit(1)).as("n_a")))
    val nB = broadcast(b.agg(count(lit(1)).as("n_b")))
    val nBoth = broadcast(
      a.join(b, Seq("doc_a", "doc_b")).agg(count(lit(1)).as("n_both"))
    )
    val nUnion = broadcast(
      a.unionByName(b).distinct().agg(count(lit(1)).as("n_union"))
    )
    val nTrue = broadcast(truth.agg(count(lit(1)).as("n_true")))
    // chapman = A/B − 1 with A = (n_a+1)(n_b+1), B = n_both+1 —
    // emitted via exact signed half-up integer division (round-9)
    val chapA = (col("n_a") + 1) * (col("n_b") + 1)
    val chapB = col("n_both") + 1
    nA.crossJoin(nB)
      .crossJoin(nBoth)
      .crossJoin(nUnion)
      .crossJoin(nTrue)
      .select(
        col("n_a"),
        col("n_b"),
        col("n_both"),
        col("n_union"),
        col("n_true"),
        graft.functions.IntMath
          .idivHalfUpSigned((chapA - chapB) * lit(1000L), chapB)
          .as("chapman_milli"),
        graft.functions.IntMath
          .microRatio(col("n_union") * chapB, chapA - chapB)
          .as("caught_ppm"),
        when(col("n_true") === 0L, lit(0L))
          .otherwise(
            // |chapman − n_true| / n_true = |A−B−n_true·B| / (B·n_true)
            graft.functions.IntMath.microRatio(
              abs(chapA - chapB - col("n_true") * chapB),
              chapB * col("n_true"))
          ).as("est_err_ppm")
      )
  }

  /** q291: LSH band-geometry tuning table — the SAME 12-permutation
    * MinHash signature banded four ways (6×2, 4×3, 3×4, 2×6) and each
    * geometry scored against the EXACT J ≥ 0.5 pair set: candidate
    * volume, recall, precision, and the analytic collision
    * probability 1−(1−0.5^r)^b at the target threshold. This is the
    * dial a 100 TB dedup run sets FIRST — more rows per band moves
    * the S-curve right (fewer candidates, lower recall), and the
    * table shows the measured trade on this corpus next to the
    * theory, so the geometry is chosen from evidence instead of the
    * default. The ground truth reuses the exact shingle-inversion
    * pair seam (collision-linear, the audited scale shape); each
    * geometry's candidate generation is the q22 band join.
    *
    * Scale: one signature pass (12 md5-min folds, map-side), four
    * band self-joins each ∝ collisions, and 1-row aggregates —
    * no all-pairs step anywhere; the exact-truth join is the same
    * inversion the gated dedup family already runs.
    */
  def lshBandTuning(spark: SparkSession, dir: String): DataFrame = {
    val configs = Seq((6, 2), (4, 3), (3, 4), (2, 6))
    val d = docShingles(spark, dir)
      .withColumn(
        "mh",
        graft.functions.Md5MinHashSig.md5MinhashSig(col("sh"), 12)
      )
      .cacheTracked()
    val truth = ngramJaccardPairsFrom(d)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
      .cacheTracked()
    val nTrue = broadcast(truth.agg(count(lit(1)).as("n_true")))
    configs
      .map { case (b, r) =>
        val banded = d
          .select(
            col("doc_id"),
            explode(
              transform(
                sequence(lit(0), lit(b - 1)),
                j =>
                  struct(
                    j.as("j"),
                    array_join(
                      transform(
                        slice(col("mh"), j * r + 1, lit(r)),
                        x => x.cast("string")
                      ),
                      "_"
                    ).as("bval")
                  )
              )
            ).as("bk")
          )
          .select(col("doc_id"), col("bk.j"), col("bk.bval"))
        val cand = banded
          .select(col("j"), col("bval"), col("doc_id").as("doc_a"))
          .join(
            banded.select(col("j"), col("bval"), col("doc_id").as("doc_b")),
            Seq("j", "bval")
          )
          .filter(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"))
          .distinct()
          .cacheTracked()
        val expP50 = math.round(
          (1.0 - math.pow(1.0 - math.pow(0.5, r), b)) * 1e6
        )
        broadcast(cand.agg(count(lit(1)).as("n_candidates")))
          .crossJoin(broadcast(
            cand.join(truth, Seq("doc_a", "doc_b"))
              .agg(count(lit(1)).as("n_hit"))
          ))
          .crossJoin(nTrue)
          .select(
            lit(b.toLong).as("bands"),
            lit(r.toLong).as("rows_per_band"),
            col("n_candidates"),
            col("n_true"),
            col("n_hit"),
            when(col("n_true") === 0L, lit(0L))
              .otherwise(
                graft.functions.IntMath
                  .microRatio(col("n_hit"), col("n_true"))
              ).as("recall_ppm"),
            when(col("n_candidates") === 0L, lit(0L))
              .otherwise(
                graft.functions.IntMath
                  .microRatio(col("n_hit"), col("n_candidates"))
              ).as("precision_ppm"),
            lit(expP50).as("expected_p50_ppm")
          )
      }
      .reduce(_.unionByName(_))
  }

  /** q365: duplicate-mass concentration — how much of the removable
    * duplicate mass (cluster size − 1 docs per near-dup cluster)
    * sits in the top-k largest clusters, for k ∈ {1, 5, 25, 125}.
    * The dedup-effort planner: when the top 25 clusters carry 80% of
    * the removable mass, a cheap targeted pass (exact-match the few
    * giant templates) buys most of the win before any MinHash runs —
    * the q358 value-concentration idea applied to dedup economics.
    *
    * Scale: the audited closure labels → one |clusters|-row frame;
    * the rank is a bounded-domain total order (two-level rank at
    * extreme scale); the k-lattice probe is an explode over 4
    * literals with map-side partial sums. Exact integer shares.
    */
  def dupMassConcentration(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val clusters = dedupClusters(spark, dir)
      .groupBy(col("cluster_id"))
      .agg(max(col("cluster_size")).as("size"))
      .filter(col("size") >= 2)
      .select(col("cluster_id"), (col("size") - 1).as("removable"))
    val ranked = graft.operators.Ranking
      .withGlobalRank(
        clusters,
        Seq(col("removable").desc, col("cluster_id").asc),
        "rk",
        32)
      .cacheTracked()
    val tot = broadcast(
      ranked.agg(
        count(lit(1)).as("n_clusters"),
        sum(col("removable")).as("total_removable"))
    )
    ranked
      .crossJoin(tot)
      .select(
        explode(lit(Array(1L, 5L, 25L, 125L))).as("k"),
        col("rk"),
        col("removable"),
        col("n_clusters"),
        col("total_removable")
      )
      .filter(col("rk") <= col("k"))
      .groupBy(col("k"))
      .agg(
        max(col("n_clusters")).as("n_clusters"),
        max(col("total_removable")).as("total_removable"),
        count(lit(1)).as("clusters_in_topk"),
        sum(col("removable")).as("removable_in_topk")
      )
      .select(
        col("k"),
        col("n_clusters"),
        col("clusters_in_topk"),
        col("removable_in_topk"),
        col("total_removable"),
        microRatio(col("removable_in_topk"), col("total_removable"))
          .as("share_ppm")
      )
  }

  /** q379: contamination blast radius — the cost of the "remove the
    * whole near-dup neighborhood of anything eval-contaminated"
    * policy, per source. `direct` = train docs sharing a 5-shingle
    * with the eval set (the q73 seam); `collateral` = their J ≥ 0.5
    * near-dup neighbors (the q207 pair threshold) that are NOT
    * themselves contaminated — clean docs dragged out by association.
    * A high collateral:direct ratio means contamination sits inside
    * big template clusters and aggressive quarantine is expensive;
    * near-zero means surgical removal suffices. Counts and char mass
    * are exact integers; the ppm is half-up.
    *
    * Scale: the shared cached pair artifact (collision-linear) + two
    * semi/anti joins keyed on doc_id — nothing corpus².
    */
  def contaminationBlastRadius(
      spark: SparkSession,
      dir: String
  ): DataFrame = {
    import graft.functions.IntMath.microRatio
    contaminationSets(spark, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_train_docs"),
        sum(col("direct")).as("n_direct"),
        sum(col("collateral")).as("n_collateral"),
        sum(col("direct") * col("n_chars")).as("direct_chars"),
        sum(col("collateral") * col("n_chars")).as("collateral_chars")
      )
      .select(
        col("source"), col("n_train_docs"),
        col("n_direct"), col("n_collateral"),
        col("direct_chars"), col("collateral_chars"),
        microRatio(col("n_direct") + col("n_collateral"),
          col("n_train_docs")).as("quarantine_ppm")
      )
  }

  /** q386: near-dup cluster anatomy by size band — per cluster-size
    * band (pair / small 3-4 / template 5+): cluster count, doc mass,
    * and the within-cluster LENGTH spread (max−min n_chars, summed
    * and worst-case). Tight spreads mean true copies (dedup freely);
    * fat spreads mean containment chains — a short page swallowed by
    * a long one — where keep-one policies destroy content and the
    * q143 containment treatment applies instead. The cluster-level
    * complement of q274's pairwise anatomy, over the SAME q72 label
    * seam the survivor chain uses.
    *
    * Scale: cluster labels are the cached pointer-doubling artifact;
    * everything after is two keyed aggregations (cluster, then band).
    */
  def clusterLengthSpread(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val labels = dedupClusters(spark, dir)
      .filter(col("cluster_size") >= 2)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    val perCluster = labels
      .join(
        Tables.documents(spark, dir).select(col("doc_id"), col("n_chars")),
        "doc_id")
      .groupBy(col("cluster_id"))
      .agg(
        max(col("cluster_size")).as("sz"),
        count(lit(1)).as("n_docs"),
        (max(col("n_chars")) - min(col("n_chars"))).as("spread")
      )
    perCluster
      .select(
        when(col("sz") === 2, "2_pair")
          .when(col("sz") <= 4, "3_4_small")
          .otherwise("5_plus_template").as("size_band"),
        col("n_docs"), col("spread")
      )
      .groupBy(col("size_band"))
      .agg(
        count(lit(1)).as("n_clusters"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("spread")).as("sum_spread_chars"),
        max(col("spread")).as("max_spread_chars"),
        sum(when(col("spread") === 0, 1L).otherwise(0L))
          .as("n_exact_length")
      )
      .select(
        col("size_band"), col("n_clusters"), col("n_docs"),
        col("sum_spread_chars"), col("max_spread_chars"),
        col("n_exact_length"),
        microRatio(col("n_exact_length"), col("n_clusters"))
          .as("exact_length_ppm")
      )
  }

  /** q387: cross-source cluster census — per cluster-size band, how
    * many near-dup clusters span MULTIPLE sources. Single-source
    * clusters are boilerplate (one site repeating itself — strip
    * with q364/q383); multi-source clusters are syndication/mirror
    * mass (the q225 flow, resolved to closures) where provenance-
    * aware survivor policies matter because dropping "the dup" picks
    * WHICH SOURCE survives. Pure integer counts over the same q72
    * label seam.
    */
  def crossSourceClusters(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val labels = dedupClusters(spark, dir)
      .filter(col("cluster_size") >= 2)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    val perCluster = labels
      .join(
        Tables.documents(spark, dir).select(col("doc_id"), col("source")),
        "doc_id")
      .groupBy(col("cluster_id"))
      .agg(
        max(col("cluster_size")).as("sz"),
        countDistinct(col("source")).as("n_sources")
      )
    perCluster
      .select(
        when(col("sz") === 2, "2_pair")
          .when(col("sz") <= 4, "3_4_small")
          .otherwise("5_plus_template").as("size_band"),
        col("n_sources")
      )
      .groupBy(col("size_band"))
      .agg(
        count(lit(1)).as("n_clusters"),
        sum(when(col("n_sources") >= 2, 1L).otherwise(0L))
          .as("n_multi_source"),
        max(col("n_sources")).as("max_sources")
      )
      .select(
        col("size_band"), col("n_clusters"), col("n_multi_source"),
        col("max_sources"),
        microRatio(col("n_multi_source"), col("n_clusters"))
          .as("multi_source_ppm")
      )
  }

  /** q388: dedup savings sweep — for each candidate Jaccard cutoff
    * t ∈ {0.3, 0.5, 0.7, 0.9}: surviving pairs, flagged docs (the
    * larger-id end — q187's keep-first upper bound, no closure), the
    * token mass those docs carry, and the corpus-relative savings.
    * The TOKEN-denominated companion of q187's pair/doc sweep — the
    * number a capacity plan actually wants — computed over the same
    * single pair artifact (one cross join against a 4-row lattice,
    * never a per-threshold re-pairing).
    *
    * Determinism: qualification is the PURE-INTEGER cross-
    * multiplication inter·1000 ≥ t_milli·union — no double ever
    * compared, the round-9 ideal.
    */
  def savingsSweep(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val raw = shinglePairIntersections(docShingles(spark, dir))
    val th = spark
      .range(0, 4)
      .select(
        element_at(
          array(lit(300L), lit(500L), lit(700L), lit(900L)),
          (col("id") + 1).cast("int")).as("t_milli"))
    val qual = raw
      .crossJoin(th)
      .filter(col("inter") * lit(1000L) >=
        col("t_milli") * (col("n_a") + col("n_b") - col("inter")))
    val toks = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("tk")
      )
    val corpus = toks.agg(sum(col("tk")).as("corpus_tokens"))
    val nPairs = qual
      .groupBy(col("t_milli"))
      .agg(count(lit(1)).as("n_pairs"))
    val flagged = qual
      .select(col("t_milli"), col("doc_b").as("doc_id"))
      .distinct()
      .join(toks, "doc_id")
      .groupBy(col("t_milli"))
      .agg(count(lit(1)).as("n_flagged_docs"),
        sum(col("tk")).as("flagged_tokens"))
    th.join(nPairs, Seq("t_milli"), "left")
      .join(flagged, Seq("t_milli"), "left")
      .na
      .fill(0L, Seq("n_pairs", "n_flagged_docs", "flagged_tokens"))
      .crossJoin(broadcast(corpus))
      .select(
        col("t_milli"), col("n_pairs"), col("n_flagged_docs"),
        col("flagged_tokens"), col("corpus_tokens"),
        microRatio(col("flagged_tokens"), col("corpus_tokens"))
          .as("savings_ppm")
      )
  }

  /** Doc-level contamination classification for the TRAIN population
    * (doc_id % 50 ≠ 0): one row per train doc with its source, char
    * mass and the direct (q73 5-gram eval overlap) / collateral
    * (J ≥ 0.5 neighbor of a direct doc, not itself direct) flags.
    * The shared seam under the q379 blast radius and the q400
    * composite manifest — both read ONE classification instead of
    * re-deriving the contamination topology.
    */
  def contaminationSets(spark: SparkSession, dir: String): DataFrame = {
    val cont = decontaminate(spark, dir).select(col("doc_id"))
    val pairs = ngramJaccardPairs(spark, dir)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
    val nbr = pairs
      .join(cont.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
      .select(col("doc_b").as("doc_id"))
      .union(
        pairs
          .join(cont.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"))
          .select(col("doc_a").as("doc_id"))
      )
      .distinct()
      .filter(col("doc_id") % 50 =!= 0)
      .join(cont, Seq("doc_id"), "left_anti")
    Tables
      .documents(spark, dir)
      .filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .join(cont.withColumn("direct", lit(1L)), Seq("doc_id"), "left")
      .join(nbr.withColumn("collateral", lit(1L)), Seq("doc_id"), "left")
      .na
      .fill(0L, Seq("direct", "collateral"))
  }

  /** q404: decontamination width sensitivity — flagged-doc and
    * flagged-token counts at shingle widths {3, 5, 8}. The report an
    * operator reads BEFORE pinning the q73 width: width 3 flags
    * aggressively (any shared trigram — high recall, collateral
    * over-removal), width 8 only verbatim runs. The difference
    * between adjacent widths is exactly the mass whose eval overlap
    * is real-but-short — the gray zone a human audits. One scan per
    * width (widths change the shingle set, so they cannot share one
    * inversion), each collision-bounded by the eval side's shingle
    * set.
    */
  def deconWidthSweep(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val toks = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("text"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("tk"))
    val train = toks.filter(col("doc_id") % 50 =!= 0)
    val trainTotals = train.agg(
      count(lit(1)).as("n_train"),
      sum(col("tk")).as("train_tokens"))
    val perWidth = Seq(3, 5, 8).map { w =>
      val sh = toks
        .select(col("doc_id"), shingles(col("text"), w).as("sh"))
        .filter(size(col("sh")) > 0)
      val evalSh = sh
        .filter(col("doc_id") % 50 === 0)
        .select(explode(col("sh")).as("s"))
        .distinct()
      val flagged = sh
        .filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id"), explode(col("sh")).as("s"))
        .join(broadcast(evalSh), Seq("s"))
        .select(col("doc_id"))
        .distinct()
      flagged
        .join(train.select(col("doc_id"), col("tk")), "doc_id")
        .agg(
          count(lit(1)).as("n_flagged"),
          coalesce(sum(col("tk")), lit(0L)).as("flagged_tokens"))
        .select(lit(w.toLong).as("width"), col("n_flagged"),
          col("flagged_tokens"))
    }.reduce(_ unionByName _)
    perWidth
      .crossJoin(broadcast(trainTotals))
      .select(
        col("width"), col("n_flagged"), col("flagged_tokens"),
        col("n_train"),
        microRatio(col("n_flagged"), col("n_train"))
          .as("flagged_ppm")
      )
  }

  /** q413: suffix-neighborhood near-dup pairs — the q235 sorted-
    * neighborhood machinery run on REVERSED token arrays, so the
    * longest common prefix of the reversed docs is the longest common
    * SUFFIX of the originals. Catches the shape q235 structurally
    * cannot: shared footers, signatures and legal boilerplate under
    * different heads (prepend duplicates). Blocked for scale exactly
    * like q235 — any qualifying pair shares its LAST minLcs tokens,
    * so partitioning by that exact suffix loses no pair.
    */
  def suffixNeighborPairs(
      spark: SparkSession,
      dir: String,
      minLcs: Int = 3
  ): DataFrame = {
    val d = Tables
      .documents(spark, dir)
      .select(col("doc_id"), reverse(tokens(col("text"))).as("t"))
      .filter(size(col("t")) >= minLcs)
      .withColumn("block", array_join(slice(col("t"), 1, minLcs), " "))
    val w = Window.partitionBy(col("block")).orderBy(col("t"), col("doc_id"))
    val withPrev = d
      .withColumn("prev_id", lag(col("doc_id"), 1).over(w))
      .withColumn("prev_t", lag(col("t"), 1).over(w))
      .filter(col("prev_id").isNotNull)
    val eqs = zip_with(col("t"), col("prev_t"), (x, y) => x <=> y)
    val pos = array_position(eqs, false)
    withPrev
      .withColumn(
        "lcs",
        when(pos === 0, least(size(col("t")), size(col("prev_t"))).cast("long"))
          .otherwise(pos - 1)
      )
      .filter(col("lcs") >= minLcs)
      .select(
        least(col("prev_id"), col("doc_id")).as("doc_a"),
        greatest(col("prev_id"), col("doc_id")).as("doc_b"),
        col("lcs")
      )
  }

  /** q417: dedup idempotence audit — proof-by-counting that one
    * closure pass reaches the fixed point: among the q72 min-id
    * survivors, how many near-dup edges remain at the closure
    * threshold (0.05) and at the dedup threshold (0.5). Both MUST be
    * zero — every edge connects two docs of one cluster, and a
    * cluster keeps exactly one doc — so a non-zero row means the
    * clustering broke (a lost edge, a wrong label) and a second
    * dedup pass would keep removing. The invariant a pipeline
    * operator asserts after every dedup run, emitted as data.
    *
    * Scale: the cached labels + pair artifact, two semi-joins.
    */
  def dedupIdempotence(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val labels = dedupClusters(spark, dir)
    val survivors = labels
      .filter(col("survivor") === 1)
      .select(col("doc_id"))
    val counts = labels.agg(
      count(lit(1)).as("n_docs"),
      sum(col("survivor").cast("long")).as("n_survivors"))
    val pairs = ngramJaccardPairs(spark, dir)
    def survEdges(thr: Double, name: String): DataFrame =
      pairs
        .filter(col("jaccard") >= thr)
        .join(survivors.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
        .join(survivors.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"))
        .agg(count(lit(1)).as(name))
    counts
      .crossJoin(survEdges(0.05, "surviving_edges_closure"))
      .crossJoin(survEdges(0.5, "surviving_edges_dedup"))
      .select(
        col("n_docs"), col("n_survivors"),
        col("surviving_edges_closure"), col("surviving_edges_dedup"),
        microRatio(col("n_survivors"), col("n_docs"))
          .as("survivor_ppm")
      )
  }

  /** q431: near-dup pair shape census — pairs cross-tabulated by
    * Jaccard band (0.5-0.7 / 0.7-0.9 / 0.9+) × token-length-ratio
    * class (similar ≤ 1.25× / moderate ≤ 2× / extreme). The joint
    * view q274's per-pair anatomy and q386's cluster spread only
    * show marginally: high-J + extreme-ratio pairs are containment
    * (q143's treatment — keep the long one), high-J + similar-length
    * are true copies (keep either), low-J + similar-length are edits
    * (survivor policy must read quality). Band tests are pure
    * integer cross-multiplications on (inter, union) and
    * (longer, shorter) — no float ever compared.
    */
  def pairShapeCensus(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val pairs = shinglePairIntersections(docShingles(spark, dir))
      // admission mirrors the artifact (float spelling, proven), the
      // BANDS are integer cross-multiplications
      .withColumn(
        "jaccard",
        round(
          col("inter").cast("double") /
            (col("n_a") + col("n_b") - col("inter")),
          6
        )
      )
      .filter(col("jaccard") >= 0.5)
    val toks = Tables
      .documents(spark, dir)
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("tk"))
    val u = col("n_a") + col("n_b") - col("inter")
    val shaped = pairs
      .join(toks.select(col("doc_id").as("doc_a"), col("tk").as("tk_a")),
        Seq("doc_a"))
      .join(toks.select(col("doc_id").as("doc_b"), col("tk").as("tk_b")),
        Seq("doc_b"))
      .select(
        when(col("inter") * 10L >= u * 9L, "j_090_plus")
          .when(col("inter") * 10L >= u * 7L, "j_070_090")
          .otherwise("j_050_070").as("jacc_band"),
        greatest(col("tk_a"), col("tk_b")).as("lng"),
        least(col("tk_a"), col("tk_b")).as("shrt")
      )
      .select(
        col("jacc_band"),
        when(col("lng") * 4L <= col("shrt") * 5L, "similar")
          .when(col("lng") <= col("shrt") * 2L, "moderate")
          .otherwise("extreme").as("ratio_class")
      )
    val cells = shaped
      .groupBy(col("jacc_band"), col("ratio_class"))
      .agg(count(lit(1)).as("n_pairs"))
    val tot = cells.agg(sum(col("n_pairs")).as("total"))
    cells
      .crossJoin(broadcast(tot))
      .select(
        col("jacc_band"), col("ratio_class"), col("n_pairs"),
        microRatio(col("n_pairs"), col("total")).as("pair_ppm")
      )
  }

  /** q444: survivor win rate by source — among docs that entered a
    * multi-doc near-dup cluster, how often each source's doc WINS the
    * q78 keep-best-quality survivorship, vs its membership. A source
    * that loses most contests is systematically the lower-quality
    * copy of shared content (an aggregator) — its raw doc counts
    * overstate its unique contribution by exactly the losing mass.
    * Pure integer counts over the shared label seam.
    */
  def survivorWinRate(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val labels = dedupClusters(spark, dir)
      .filter(col("cluster_size") >= 2)
      .select(col("doc_id"), col("cluster_id"))
    val scored = labels
      .join(TextAnalysis.qualityMicroScores(spark, dir), "doc_id")
    val winners = scored
      .groupBy(col("cluster_id"))
      .agg(max(struct(col("q_micro"), (-col("doc_id")).as("nid")))
        .as("b"))
      .select((-col("b.nid")).as("doc_id"), lit(1L).as("won"))
    labels
      .join(
        Tables.documents(spark, dir).select(col("doc_id"), col("source")),
        "doc_id")
      .join(winners, Seq("doc_id"), "left")
      .na
      .fill(0L, Seq("won"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_contested"),
        sum(col("won")).as("n_won")
      )
      .select(
        col("source"), col("n_contested"), col("n_won"),
        microRatio(col("n_won"), col("n_contested")).as("win_ppm")
      )
  }

  /** q391: cluster tightness by size band — per cluster-size band,
    * the exact integer milli-Jaccard statistics of the EDGES inside
    * those clusters (count, min, mean, max). Answers "are the big
    * clusters tight template copies or loose chains?": a 5+ band
    * whose mean edge score is near the 0.05 admission floor is a
    * transitive-closure chain (q208's warning shape — dedup by
    * cluster would over-delete), while a high-mean band is true
    * template mass. Edge membership uses the pair artifact's own
    * float spelling (round(j,6) ≥ 0.05 — proven green) but every
    * EMITTED number is a pure integer: jacc_milli is the half-up
    * cross-multiplication, never round(double·1000).
    *
    * Scale: pair artifact ⋈ cluster labels on doc_a (collision-
    * linear), one band rollup.
    */
  def clusterTightness(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.idivHalfUp
    val pairs = shinglePairIntersections(docShingles(spark, dir))
      .withColumn(
        "jaccard",
        round(
          col("inter").cast("double") /
            (col("n_a") + col("n_b") - col("inter")),
          6
        )
      )
      .filter(col("jaccard") >= 0.05)
      .withColumn("jacc_milli",
        idivHalfUp(col("inter") * lit(1000L),
          col("n_a") + col("n_b") - col("inter")))
      .select(col("doc_a").as("doc_id"), col("jacc_milli"))
    val labels = dedupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_size"))
    pairs
      .join(labels, "doc_id")
      .select(
        when(col("cluster_size") === 2, "2_pair")
          .when(col("cluster_size") <= 4, "3_4_small")
          .otherwise("5_plus_template").as("size_band"),
        col("jacc_milli")
      )
      .groupBy(col("size_band"))
      .agg(
        count(lit(1)).as("n_edges"),
        min(col("jacc_milli")).as("min_jacc_milli"),
        max(col("jacc_milli")).as("max_jacc_milli"),
        sum(col("jacc_milli")).as("sum_jacc_milli")
      )
      .select(
        col("size_band"), col("n_edges"),
        col("min_jacc_milli"), col("max_jacc_milli"),
        idivHalfUp(col("sum_jacc_milli"), col("n_edges"))
          .as("mean_jacc_milli")
      )
  }

  /** q395: edge provenance census — the near-dup pair artifact split
    * into WITHIN-source and CROSS-source edges, with exact integer
    * milli-Jaccard stats for each. The edge-level complement of
    * q387's cluster census and the calibration input for provenance-
    * aware dedup: if cross-source edges score systematically lower
    * (syndicated-then-edited copies) than within-source edges
    * (verbatim templates), ONE Jaccard threshold cannot serve both
    * and the pipeline should split the cutoff by provenance class.
    *
    * Scale: pair artifact ⋈ two source lookups on doc ids —
    * collision-linear; one 2-row rollup.
    */
  def edgeProvenance(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.idivHalfUp
    val pairs = shinglePairIntersections(docShingles(spark, dir))
      .withColumn(
        "jaccard",
        round(
          col("inter").cast("double") /
            (col("n_a") + col("n_b") - col("inter")),
          6
        )
      )
      .filter(col("jaccard") >= 0.05)
      .withColumn("jacc_milli",
        idivHalfUp(col("inter") * lit(1000L),
          col("n_a") + col("n_b") - col("inter")))
      .select(col("doc_a"), col("doc_b"), col("jacc_milli"))
    val src = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("doc_a"),
        col("source").as("src_a")), Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"),
        col("source").as("src_b")), Seq("doc_b"))
      .select(
        when(col("src_a") === col("src_b"), "within_source")
          .otherwise("cross_source").as("provenance"),
        col("jacc_milli")
      )
      .groupBy(col("provenance"))
      .agg(
        count(lit(1)).as("n_edges"),
        min(col("jacc_milli")).as("min_jacc_milli"),
        max(col("jacc_milli")).as("max_jacc_milli"),
        sum(col("jacc_milli")).as("sum_milli")
      )
      .select(
        col("provenance"), col("n_edges"),
        col("min_jacc_milli"), col("max_jacc_milli"),
        idivHalfUp(col("sum_milli"), col("n_edges"))
          .as("mean_jacc_milli")
      )
  }

  /** q401: dup-burst timeline — the near-dup pair pressure over
    * arrival order: pairs bucketed by the LATER end's 100-id arrival
    * window, with the share whose partner is CLOSE (gap ≤ 100 ids).
    * A bucket where close pairs dominate is a crawl-time dup storm
    * (the q385 TTL gate's target); one dominated by far partners is
    * re-crawl of old content (only the forever-state gate catches
    * it). The timeline that says WHICH streaming dedup policy the
    * feed needs. Pure integer id arithmetic over the pair artifact.
    */
  def dupBurstTimeline(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.{idiv, microRatio}
    ngramJaccardPairs(spark, dir)
      .filter(col("jaccard") >= 0.5)
      .select(
        idiv(col("doc_b"), lit(100L)).as("bucket"),
        (col("doc_b") - col("doc_a")).as("gap")
      )
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("gap") <= 100L, 1L).otherwise(0L))
          .as("n_close_pairs"),
        max(col("gap")).as("max_gap")
      )
      .select(
        col("bucket"), col("n_pairs"), col("n_close_pairs"),
        col("max_gap"),
        microRatio(col("n_close_pairs"), col("n_pairs"))
          .as("close_ppm")
      )
  }

  /** q380: near-duplicate rate per length decile — WHERE in the
    * length distribution duplication lives. Short docs (navigation
    * strings, error pages) usually duplicate far more than long ones;
    * if the TOP deciles duplicate heavily instead, the corpus has a
    * template-expansion problem the length filter won't fix. Deciles
    * are exact SQL ntile(10) buckets over (n_chars, doc_id) computed
    * via the distributed total order ([[Ranking.withGlobalRank]] +
    * [[Ranking.ntileFromRank]] — range shuffle + per-partition
    * offsets, never a single-partition window); the dup flag is
    * membership in any J ≥ 0.5 pair of the shared cached pair
    * artifact (the q207 threshold — this corpus's duplication is
    * near-dup, not byte-exact, so an md5 flag would measure nothing).
    */
  def dupRateByLength(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val pairs = ngramJaccardPairs(spark, dir)
      .filter(col("jaccard") >= 0.5)
    val dupIds = pairs
      .select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id")))
      .distinct()
      .withColumn("is_dup", lit(1L))
    val flagged = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("n_chars"))
      .join(dupIds, Seq("doc_id"), "left")
      .na
      .fill(0L, Seq("is_dup"))
    val ranked = Ranking.withGlobalRank(
      flagged, Seq(col("n_chars").asc, col("doc_id").asc), "rn", 8)
    val tot = flagged.agg(count(lit(1)).as("total"))
    ranked
      .crossJoin(broadcast(tot))
      .withColumn("decile",
        Ranking.ntileFromRank(col("rn"), col("total"), 10).cast("long"))
      .groupBy(col("decile"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("is_dup")).as("n_dup_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars")
      )
      .select(
        col("decile"), col("n_docs"), col("n_dup_docs"),
        col("min_chars"), col("max_chars"),
        microRatio(col("n_dup_docs"), col("n_docs")).as("dup_ppm")
      )
  }

  /** q448: blocked edit-distance near-dup census — the classic
    * entity-resolution topology (blocking + in-block comparison;
    * Christen, "Data Matching", 2012): documents block on
    * (lang, first-8-chars), candidate pairs form only WITHIN a
    * block, and each pair is scored with exact Levenshtein distance
    * on the 60-char prefixes. Output: per distance band (0-2 / 3-5 /
    * 6-10 / far), pair count and the distance envelope. Shingle
    * Jaccard (q21) misses single-character edits spread through a
    * doc; edit distance is the complementary signal for
    * OCR-noise/typo-level duplication, and the band table is what
    * calibrates a distance threshold against the q22 LSH verdicts.
    *
    * Scale: cost is Σ block_size², never corpus² — the prefix key is
    * high-cardinality by construction and AQE skew-split handles hot
    * boilerplate blocks; the Levenshtein operand is capped at 60
    * chars so per-pair cost is O(60²) constant. At 100 TB the block
    * key would widen to (lang, prefix, length band) — same plan.
    */
  def editDistanceBands(spark: SparkSession, dir: String): DataFrame = {
    val b = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("lang"),
        substring(col("text"), 1, 8).as("pfx"),
        substring(col("text"), 1, 60).as("t60")
      )
    val l = b.select(
      col("lang"), col("pfx"),
      col("doc_id").as("doc_a"), col("t60").as("ta"))
    val r = b.select(
      col("lang"), col("pfx"),
      col("doc_id").as("doc_b"), col("t60").as("tb"))
    l.join(r, Seq("lang", "pfx"))
      .filter(col("doc_a") < col("doc_b"))
      .select(levenshtein(col("ta"), col("tb")).cast("long").as("d"))
      .select(
        when(col("d") <= 2, "0_2")
          .when(col("d") <= 5, "3_5")
          .when(col("d") <= 10, "6_10")
          .otherwise("far").as("band"),
        col("d")
      )
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_pairs"),
        min(col("d")).as("min_dist"),
        max(col("d")).as("max_dist")
      )
  }

  /** q450: degree assortativity of the near-dup pair graph at
    * J ≥ 0.5 — Newman's edge-wise degree correlation
    * ("Assortative mixing in networks", PRL 2002) emitted as the
    * exact integer sufficient statistics (m edges, Σjk, Σ(j+k),
    * Σ(j²+k²) over edge-endpoint degrees) plus
    * r = (4m·Σjk − S1²)/(2m·S2 − S1²) in signed half-up milli.
    * Positive r means duplicate-heavy docs link to each other
    * (template families — transitive closure is safe); negative r
    * means hub-and-spoke (one canonical doc linked by many
    * singletons — closure chains dissimilar docs through the hub,
    * the q208 failure mode, and the survivor policy needs the q159
    * verified-pair topology instead).
    *
    * Scale: the pair artifact is collision-linear; degrees come from
    * one symmetric-expansion aggregate and join back by endpoint.
    * Milli emission headroom: 4m·Σjk < 2⁶³ holds past m ≈ 10⁶ edges
    * with degrees in the thousands; the statistics are exact
    * regardless.
    */
  def degreeAssortativity(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.idivHalfUpSigned
    val pairs = ngramJaccardPairs(spark, dir)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
      .cacheTracked()
    val deg = pairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("n"))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("deg"))
    val withDegs = pairs
      .join(deg.select(col("n").as("doc_a"), col("deg").as("ja")),
        Seq("doc_a"))
      .join(deg.select(col("n").as("doc_b"), col("deg").as("jb")),
        Seq("doc_b"))
    val agg = withDegs.agg(
      count(lit(1)).as("m"),
      coalesce(sum(col("ja") * col("jb")), lit(0L)).as("s_jk"),
      coalesce(sum(col("ja") + col("jb")), lit(0L)).as("s1"),
      coalesce(sum(col("ja") * col("ja") + col("jb") * col("jb")),
        lit(0L)).as("s2")
    )
    agg.select(
      col("m"),
      col("s_jk"),
      col("s1"),
      col("s2"),
      when(col("m") === 0L, 0L)
        .otherwise(
          idivHalfUpSigned(
            lit(1000L) *
              (lit(4L) * col("m") * col("s_jk") - col("s1") * col("s1")),
            greatest(
              lit(2L) * col("m") * col("s2") - col("s1") * col("s1"),
              lit(1L)
            )
          )
        )
        .as("r_milli")
    )
  }

  /** q463: shingle-width sensitivity sweep — the q21 pair machinery
    * run at w = 2, 3, 4 word shingles, reporting per width: docs
    * carrying ≥1 shingle, distinct shingles, colliding pairs
    * (≥1 shared shingle), and pairs at J ≥ 0.5. Shingle width is the
    * single biggest knob in every dedup family built on this seam
    * (q21/q22/q72/q78/q130): w = 2 over-collides (stopword bigrams
    * chain unrelated docs), w = 4 under-recalls (one edit kills four
    * shingles), and this table is the measured trade-off at the
    * corpus's own length distribution — read it before trusting the
    * w = 3 default anywhere downstream.
    *
    * Scale: three independent shingle inversions, each
    * collision-linear (cost ∝ colliding pairs); output is 3 rows.
    * The sweep shares one tokenize via the cached per-width shingle
    * frames.
    */
  def shingleWidthSweep(spark: SparkSession, dir: String): DataFrame = {
    val perW = Seq(2, 3, 4).map { w =>
      val d = Tables
        .documents(spark, dir)
        .select(col("doc_id"), shingles(col("text"), w).as("sh"))
        .filter(size(col("sh")) > 0)
        .cacheTracked()
      val e = d.select(
        col("doc_id"),
        size(col("sh")).as("n_sh"),
        explode(col("sh")).as("s")
      )
      val a = e.select(
        col("doc_id").as("doc_a"),
        col("n_sh").as("n_a"),
        col("s")
      )
      val b = e.select(
        col("doc_id").as("doc_b"),
        col("n_sh").as("n_b"),
        col("s")
      )
      val pairs = a
        .join(b, Seq("s"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(
          count(lit(1)).as("inter"),
          first(col("n_a")).as("na"),
          first(col("n_b")).as("nb")
        )
        .cacheTracked()
      val j05 = pairs
        .filter(
          round(
            col("inter").cast("double") /
              (col("na") + col("nb") - col("inter")),
            6
          ) >= 0.5
        )
        .agg(count(lit(1)).as("n_pairs_j05"))
      val nPairs = pairs.agg(count(lit(1)).as("n_pairs_any"))
      val nDocs = d.agg(count(lit(1)).as("n_docs"))
      val nSh = e.select(col("s")).distinct()
        .agg(count(lit(1)).as("n_shingles"))
      nDocs
        .crossJoin(broadcast(nSh))
        .crossJoin(broadcast(nPairs))
        .crossJoin(broadcast(j05))
        .select(
          lit(w.toLong).as("shingle_w"),
          col("n_docs"),
          col("n_shingles"),
          col("n_pairs_any"),
          col("n_pairs_j05")
        )
    }
    perW.reduce(_.unionByName(_))
  }

  /** q467: MinHash signature-length sweep — estimator error vs the
    * exact shingle Jaccard at k = 4 / 8 / 16 hashes, on ONE fixed
    * pair population (exact J ≥ 0.3, integer-micro threshold) so the
    * three rows differ only in k. Because seeds are 0..k−1, the
    * k = 4 and k = 8 estimators are PREFIXES of the single k = 16
    * signature — one signature pass serves the whole sweep. The
    * q198 audit fixes k = 8 and varies the estimate level; this
    * fixes the pairs and varies k — together they are the
    * (bands, rows, k) capacity curve a dedup team reads before
    * committing signature bytes at 100 TB (expected |err| ∝ 1/√k:
    * halving storage costs √2 in threshold margin).
    *
    * Scale: one shingle inversion for the exact pairs
    * (collision-linear), one fused Md5MinHashSig pass, one
    * pair-side join; the sweep explodes 3 rows per pair. All error
    * arithmetic in exact half-up micro.
    */
  def minhashKSweep(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.idivHalfUp
    val d = docShingles(spark, dir)
      .withColumn(
        "mh",
        graft.functions.Md5MinHashSig.md5MinhashSig(col("sh"), 16)
      )
      .cacheTracked()
    val e = d.select(
      col("doc_id"),
      size(col("sh")).as("n_sh"),
      explode(col("sh")).as("s")
    )
    val a = e.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"),
      col("s"))
    val b = e.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b"),
      col("s"))
    val pairs = a
      .join(b, Seq("s"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(
        count(lit(1)).as("inter"),
        first(col("n_a")).as("na"),
        first(col("n_b")).as("nb")
      )
      .withColumn(
        "exact_micro",
        idivHalfUp(
          lit(1000000L) * col("inter"),
          col("na") + col("nb") - col("inter")
        )
      )
      .filter(col("exact_micro") >= 300000L)
    val withSigs = pairs
      .join(d.select(col("doc_id").as("doc_a"), col("mh").as("mh_a")),
        Seq("doc_a"))
      .join(d.select(col("doc_id").as("doc_b"), col("mh").as("mh_b")),
        Seq("doc_b"))
    def agree(k: Int): Column =
      (1 to k)
        .map(i =>
          when(element_at(col("mh_a"), i) ===
            element_at(col("mh_b"), i), 1L).otherwise(0L))
        .reduce(_ + _)
    val leveled = withSigs.select(
      col("exact_micro"),
      explode(
        array(
          Seq(4, 8, 16).map(k =>
            struct(lit(k.toLong).as("k"), agree(k).as("agree"))): _*
        )
      ).as("e")
    )
    leveled
      .select(
        col("e.k").as("k"),
        abs(
          idivHalfUp(lit(1000000L) * col("e.agree"), col("e.k")) -
            col("exact_micro")
        ).as("err")
      )
      .groupBy(col("k"))
      .agg(
        count(lit(1)).as("n_pairs"),
        idivHalfUp(sum(col("err")), count(lit(1)))
          .as("mean_abs_err_micro"),
        max(col("err")).as("max_abs_err_micro")
      )
  }

  /** q473: near-dup cluster radius census — multi-source BFS over
    * the J ≥ 0.5 pair graph seeded at every cluster's canonical
    * survivor (its minimum doc id, the q72/q78 convention), then per
    * cluster the RADIUS = max hop distance from the survivor, rolled
    * into (radius → clusters, docs). Radius 1 means every member
    * touches the canonical directly (safe closure); radius ≥ 3 means
    * members that survive only through CHAINS of middlemen — the
    * per-cluster hop-resolved version of what q208 (wedge closure)
    * and q459 (percolation) measure globally, and the direct
    * evidence for capping closure depth at 100 TB.
    *
    * Scale: one multi-source BFS — ALL clusters expand in the same
    * frontier joins (rounds bounded by the max radius, capped at
    * 20), against the collision-linear pair artifact. No per-cluster
    * work, no collect beyond the per-round emptiness scalar.
    */
  def clusterRadiusCensus(spark: SparkSession, dir: String): DataFrame = {
    val pairs = ngramJaccardPairs(spark, dir)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
      .cacheTracked()
    val sym = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(
        pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .cacheTracked()
    val nodes = sym.select(col("src").as("id")).distinct()
    val labels = ConnectedComponents
      .run(nodes, pairs.select(col("doc_a").as("src"),
        col("doc_b").as("dst")))
      .cacheTracked()
    // seeds: each cluster's min id IS its label (min-label CC)
    var levels = labels
      .select(col("label").as("id"))
      .distinct()
      .select(col("id"), lit(0L).as("lvl"))
      .localCheckpoint(true)
    var frontier = levels
    var lvl = 1L
    var done = false
    while (lvl <= 20L && !done) {
      val next = frontier
        .join(sym, frontier("id") === sym("src"))
        .select(col("dst").as("id"))
        .distinct()
        .join(levels, Seq("id"), "left_anti")
        .select(col("id"), lit(lvl).as("lvl"))
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        levels = levels.unionByName(next).localCheckpoint(true)
        frontier = next
        lvl += 1
      }
    }
    val radii = labels
      .join(levels, Seq("id"))
      .groupBy(col("label"))
      .agg(max(col("lvl")).as("radius"), count(lit(1)).as("n_docs"))
    radii
      .groupBy(col("radius"))
      .agg(
        count(lit(1)).as("n_clusters"),
        sum(col("n_docs")).as("n_docs")
      )
  }

  /** q459: percolation curve of the near-dup graph — for Jaccard
    * thresholds 0.3 / 0.5 / 0.7, the connected-component census of
    * the pair graph: participating nodes, edges, components, the
    * largest component, and its share of participating nodes in ppm.
    * This is the dedup CHAINING-RISK dial: as the threshold drops,
    * components merge, and the moment a giant component appears
    * (giant_ppm jumping toward 10⁶ — the percolation transition),
    * transitive-closure dedup (q72/q78) starts deleting documents
    * that are pairwise UNRELATED through long chains — the q208
    * wedge audit's macro-scale counterpart, and the evidence for
    * picking the operating threshold.
    *
    * Scale: the pair artifact is collision-linear and shared across
    * thresholds (one shingle inversion, three filters); each census
    * is the pointer-doubling CC (O(log diameter) rounds, the q72
    * machinery with its 1M-node ScaleBench row) over an
    * edges-participating node set.
    */
  def percolationCurve(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val pairs = ngramJaccardPairs(spark, dir)
    val perT = Seq(300L -> 0.3, 500L -> 0.5, 700L -> 0.7).map {
      case (permille, t) =>
        val ed = pairs
          .filter(col("jaccard") >= t)
          .select(col("doc_a").as("src"), col("doc_b").as("dst"))
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
            lit(permille).as("threshold_permille"),
            col("n_nodes"),
            col("n_edges"),
            col("n_components"),
            col("max_component"),
            microRatio(
              col("max_component"),
              greatest(col("n_nodes"), lit(1L))
            ).as("giant_ppm")
          )
    }
    perT.reduce(_.unionByName(_))
  }
}
