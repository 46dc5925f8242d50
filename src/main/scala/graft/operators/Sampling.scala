package graft.operators

import graft.util.Caches._
import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for a training-data pipeline: stable
  * train/valid/test splits and curriculum binning.
  *
  * Both are shuffle-light by design. The split is a pure per-row hash
  * (no shuffle at all — at 100 TB it is a map over the scan, and the
  * same document lands in the same split on every run, on any cluster
  * layout, because the bucket is keyed on a deterministic hash of
  * the doc_id rather than partition-keyed like `randomSplit`; hash
  * the text instead where id stability across recomputes isn't
  * guaranteed). The decile binning is a
  * distributed total order (range shuffle + per-partition offsets,
  * [[Ranking]]) — exact quantile membership without a
  * single-partition stage; an approximate variant would swap in
  * `approxQuantile` boundaries + a broadcast range lookup for a
  * sort-free plan.
  */
object Sampling {

  /** Deterministic 60-bit bucket in [0, 100) from the key's md5 —
    * infrastructure-independent, so splits are reproducible across
    * engines (the DuckDB oracle computes the identical bucket).
    */
  private def hashBucket(key: org.apache.spark.sql.Column) =
    graft.functions.TextFunctions.hash60(key) % 100

  /** q49: 80/10/10 train/valid/test split of the documents table,
    * keyed on doc_id's md5.
    */
  def trainTestSplit(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        hashBucket(col("doc_id")).cast("int").as("bucket")
      )
      .withColumn(
        "split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid")
          .otherwise("test")
      )

  /** q209: length-distribution rejection sampler — per-source
    * acceptance ratios that reshape every source's token-length
    * profile to the GLOBAL length profile, then the deterministic
    * ppm-hash acceptance. Length is one of the strongest spurious
    * signals a mixed corpus carries (a source recognizable by
    * document length alone lets a model shortcut-learn source
    * identity), and rejection-to-target is the standard debiasing:
    * accept(source, bucket) = min(1, global_share / source_share),
    * so over-represented buckets thin and the rest pass whole.
    * Ratios are integer ppm (the q132 convention) and acceptance is
    * the q49 id-keyed hash — deterministic, engine-independent,
    * composable with every other gate.
    *
    * Scale: one tokenize scan → (source, bucket) partial-agg counts
    * (tiny); ratios derive from that frame alone and broadcast back;
    * acceptance is a pure per-row hash. No corpus shuffle anywhere.
    */
  def lengthMatchSampler(
      spark: SparkSession,
      dir: String,
      bucketTokens: Int = 32
  ): DataFrame = {
    val d = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        floor(
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long") / bucketTokens
        ).cast("long").as("bucket")
      )
    val counts = d
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      // read by the ratio chain (source totals, bucket totals, grand
      // total) and the output join
      .cacheTracked()
    val srcTot = counts
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("s_tot"))
    val bucketTot = counts
      .groupBy(col("bucket"))
      .agg(sum(col("n_docs")).as("g_cnt"))
    val grandTot = counts.agg(sum(col("n_docs")).as("g_tot"))
    val ratios = counts
      .join(srcTot, Seq("source"))
      .join(bucketTot, Seq("bucket"))
      .crossJoin(broadcast(grandTot))
      .select(
        col("source"),
        col("bucket"),
        col("n_docs"),
        least(
          lit(1000000L),
          graft.functions.IntMath.microRatio(
            col("g_cnt") * col("s_tot"),
            col("g_tot") * col("n_docs"))
        ).as("ratio_ppm")
      )
    d
      .join(broadcast(ratios), Seq("source", "bucket"))
      .withColumn(
        "accepted",
        graft.functions.TextFunctions.hash60(col("doc_id")) % 1000000L
          < col("ratio_ppm")
      )
      .groupBy(col("source"), col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        max(col("ratio_ppm")).as("ratio_ppm"),
        sum(when(col("accepted"), 1L).otherwise(0L)).as("n_accepted")
      )
  }

  /** q232: shard-balance audit — per q75 shard: document count,
    * token mass, and imbalance vs the perfectly-even share in ppm
    * (shard_tokens · num_shards / total_tokens). The straggler
    * forecast for a data-parallel run: every training step waits for
    * the SLOWEST shard, so the max imbalance row IS the step-time
    * overhead the layout bakes in, and rebalancing (or re-keying)
    * pays off exactly when that number drifts from 1,000,000.
    *
    * Scale: one tokenize scan keyed by the same content hash as q75
    * (pure map) → |shards|-row rollup + one broadcast total.
    */
  def shardBalance(
      spark: SparkSession,
      dir: String,
      numShards: Int = 8
  ): DataFrame = {
    val perShard = Tables
      .documents(spark, dir)
      .select(
        (graft.functions.TextFunctions.hash60(col("doc_id")) % numShards)
          .cast("int").as("shard"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("t")
      )
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("n_tokens"))
    val tot = perShard.agg(sum(col("n_tokens")).as("g_tokens"))
    // exact-integer imbalance vs the half-up even share: the
    // two-step form (even share first) keeps every product under
    // 2^63 at any shard count × corpus size, where the one-shot
    // n_tokens·shards·1e6 overflows past ~10¹² tokens per shard
    perShard
      .crossJoin(broadcast(tot))
      .select(
        col("shard"),
        col("n_docs"),
        col("n_tokens"),
        graft.functions.IntMath
          .microRatio(
            col("n_tokens"),
            graft.functions.IntMath
              .idivHalfUp(col("g_tokens"), lit(numShards.toLong)))
          .as("balance_ppm")
      )
  }

  /** q230: mix churn between two temperatures — per language, the
    * q132 admission replayed at α = 0.3 and α = 0.7 (same budget
    * fraction), with kept counts under each and the document churn a
    * temperature change causes. Because admission is the SHARED
    * id-keyed hash against a per-language rate, the two kept sets are
    * nested by construction — raising a language's rate only ADDS
    * documents, never swaps them — so churn = |kept_hi − kept_lo|
    * exactly, and a mix iteration re-tokenizes only the delta. That
    * nesting is the reproducibility property this query surfaces: a
    * random-per-run sampler would churn the full symmetric
    * difference.
    *
    * Scale: the |langs|-row rate chain twice + ONE corpus scan
    * counting both thresholds in the same aggregate. No shuffle
    * beyond the per-language rollup.
    */
  def mixChurn(
      spark: SparkSession,
      dir: String,
      budgetFrac: Double = 0.5
  ): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("lang"))
    val perLang = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val tot = perLang.agg(sum(col("n_docs")).cast("double").as("tot"))
    def ratePpm(alpha: Double): Column = {
      // the q132 rate expression, inlined per alpha over the same
      // base frame (qr/qs normalized inside a window over the tiny
      // lang frame instead of a second cross join)
      val qr = pow(col("n_docs") / col("tot"), alpha)
      val qs = sum(qr).over(Window.partitionBy(lit(1)))
      floor(
        least(
          lit(1.0),
          lit(budgetFrac) * col("tot") * (qr / qs) / col("n_docs")
        ) * 1e6
      ).cast("long")
    }
    val rates = perLang
      .crossJoin(broadcast(tot))
      .select(
        col("lang"),
        col("n_docs"),
        ratePpm(0.3).as("rate_lo_ppm"),
        ratePpm(0.7).as("rate_hi_ppm")
      )
    val h = graft.functions.TextFunctions.hash60(col("doc_id")) % 1000000L
    docs
      .join(broadcast(rates), Seq("lang"))
      .groupBy(col("lang"))
      .agg(
        max(col("n_docs")).as("n_docs"),
        max(col("rate_lo_ppm")).as("rate_lo_ppm"),
        max(col("rate_hi_ppm")).as("rate_hi_ppm"),
        sum(when(h < col("rate_lo_ppm"), 1L).otherwise(0L)).as("n_kept_lo"),
        sum(when(h < col("rate_hi_ppm"), 1L).otherwise(0L)).as("n_kept_hi")
      )
      .withColumn(
        "churn",
        abs(col("n_kept_hi") - col("n_kept_lo")))
      .withColumn(
        "churn_ppm",
        graft.functions.IntMath.microRatio(col("churn"), col("n_docs")))
  }

  /** q227: temperature-sweep mix diagnostics — for each sampling
    * temperature α ∈ {0.3, 0.5, 0.7, 1.0}, the language mix
    * q_l ∝ p_l^α evaluated two ways: its Shannon entropy (how evenly
    * the mix spreads across languages) and the effective sample size
    * of importance-reweighting the natural corpus to it,
    * ESS = (Σ_docs w)²/(Σ_docs w²) with w = q_l/p_l, as a fraction of
    * N in ppm. The two numbers that decide a temperature BEFORE
    * committing a corpus build: entropy says how much the tail is
    * boosted, ESS says how much statistical efficiency the
    * reweighting burns (α = 1 is the natural mix: ESS = N exactly).
    *
    * Scale: one |langs|-row count frame crossed with 4 literal
    * temperatures — everything after the first rollup is constant
    * work; output is 4 rows.
    */
  def mixTemperatureSweep(spark: SparkSession, dir: String): DataFrame = {
    val perLang = Tables
      .documents(spark, dir)
      .select(col("lang"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = perLang.agg(sum(col("n_docs")).cast("double").as("tot"))
    val taus = Seq(0.3, 0.5, 0.7, 1.0)
    val base = perLang
      .crossJoin(broadcast(tot))
      .select(
        col("lang"),
        col("n_docs"),
        col("tot"),
        explode(lit(taus.toArray)).as("tau")
      )
      .withColumn("qr", pow(col("n_docs") / col("tot"), col("tau")))
    val qsum = base
      .groupBy(col("tau"))
      .agg(sum(col("qr")).as("qs"))
    base
      .join(broadcast(qsum), Seq("tau"))
      .withColumn("q", col("qr") / col("qs"))
      .withColumn("w", col("q") / (col("n_docs") / col("tot")))
      .groupBy(col("tau"))
      .agg(
        round(-sum(col("q") * log(col("q"))) * lit(1e6)).cast("long")
          .as("entropy_micro"),
        round(
          pow(sum(col("n_docs") * col("w")), 2) * lit(1e6) /
            (sum(col("n_docs") * col("w") * col("w")) * first(col("tot")))
        ).cast("long").as("ess_ppm")
      )
      .select(
        round(col("tau") * 1000).cast("long").as("tau_permille"),
        col("entropy_micro"),
        col("ess_ppm")
      )
  }

  /** q223: source admission plan — rank sources by their shrunk
    * reputation (q211), then admit token mass greedily against a
    * fixed budget: each source is taken whole while the budget holds,
    * the boundary source partially, the rest excluded. The one-page
    * answer to "which sources make the cut this run": reputation
    * (not raw mean) orders, so small lucky sources don't jump the
    * queue, and the admitted-token column IS the per-source quota the
    * q130-style manifest then materializes.
    *
    * Scale: the q211 rollup (|sources| rows) + one token rollup +
    * one window over the |sources|-row frame — the only "global"
    * window in the query runs on a provably tiny frame.
    */
  def sourceAdmissionPlan(
      spark: SparkSession,
      dir: String,
      budget: Long = 50000L
  ): DataFrame = {
    val rep = TextAnalysis
      .sourceReputation(spark, dir)
      .select(col("source"), col("shrunk_q_micro"))
    val tok = Tables
      .documents(spark, dir)
      .select(
        col("source"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("t"))
      .groupBy(col("source"))
      .agg(sum(col("t")).as("n_tokens"))
    val w = Window.orderBy(col("shrunk_q_micro").desc, col("source").asc)
    rep
      .join(tok, Seq("source"))
      .withColumn("rank", row_number().over(w))
      .withColumn(
        "cum_before",
        coalesce(
          sum(col("n_tokens")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L))
      )
      .withColumn(
        "admitted_tokens",
        greatest(
          lit(0L),
          least(col("n_tokens"), lit(budget) - col("cum_before")))
      )
      .withColumn(
        "status",
        when(col("admitted_tokens") === col("n_tokens"), "full")
          .when(col("admitted_tokens") > 0, "partial")
          .otherwise("excluded")
      )
      .select(
        col("source"),
        col("rank"),
        col("shrunk_q_micro"),
        col("n_tokens"),
        col("cum_before"),
        col("admitted_tokens"),
        col("status")
      )
  }

  /** q71: stratified down-sampling — per-language keep rates (the
    * data-mixing knob of a pretraining corpus: up/down-weight
    * languages or sources to a target distribution). Same
    * id-keyed hash as the split, so the sample is deterministic,
    * engine-independent, and composable with q49 (a doc's sample
    * membership never depends on partitioning). Pure map over the
    * scan: no shuffle at any scale.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    // permille keep-rates per stratum; unlisted languages keep all
    val rates = map(
      lit("en"), lit(1000),
      lit("de"), lit(500),
      lit("fr"), lit(500),
      lit("es"), lit(250),
      lit("zh"), lit(250)
    )
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("lang"),
        (graft.functions.TextFunctions.hash60(col("doc_id")) % 1000)
          .cast("int")
          .as("bucket"),
        coalesce(element_at(rates, col("lang")), lit(1000)).as("keep_permille")
      )
      .withColumn("sampled", col("bucket") < col("keep_permille"))
  }

  /** q75: deterministic shard assignment — the global-shuffle-and-
    * shard a training-data writer runs last: shard = hash60(doc_id)
    * mod N (id-keyed, so shard membership survives recompute and
    * reshape as long as ids do), position = rank within the shard by
    * (hash, doc_id) —
    * i.e., a reproducible within-shard random order, the "shuffled
    * dataset" contract SGD training expects. One shuffle on shard +
    * one within-partition sort; at 100 TB this is
    * `repartitionByRange`/`sortWithinPartitions` feeding the writer,
    * never a global sort.
    */
  def shardAssignment(
      spark: SparkSession,
      dir: String,
      numShards: Int = 8
  ): DataFrame = {
    val w = Window
      .partitionBy(col("shard"))
      .orderBy(col("h").asc, col("doc_id").asc)
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        graft.functions.TextFunctions.hash60(col("doc_id")).as("h")
      )
      .withColumn("shard", (col("h") % numShards).cast("int"))
      .withColumn("position", row_number().over(w))
      .select(col("doc_id"), col("shard"), col("position"))
  }

  /** q130: the composed training-data manifest — the final corpus
    * assembly a training run ships: near-dup canonical survivors
    * ([[Dedup.canonicalDocs]], q78) intersected with the perplexity
    * gate's kept set ([[TextAnalysis.trigramPerplexity]], q127),
    * then assigned to the q75 deterministic hash shards with a
    * per-shard position. One query = the whole curation DAG: pair
    * generation → transitive closure → survivor argmax → LM scoring
    * → relative gate → shard layout.
    *
    * Scale: each stage keeps its own audited topology (banded pair
    * joins, O(log d) CC rounds, count-carrying LM joins); the final
    * intersection is a key-shuffle join on doc_id and the shard
    * window partitions on the shard hash — nothing here adds a new
    * all-pairs or single-partition step. Every shared input is
    * materialized ONCE and reused across consumers: the shingle set,
    * the near-dup pair table (the dedup family's derive-once
    * artifact, cached in [[Dedup.ngramJaccardPairs]]), and the LM
    * count tables are plan-identical with q21/q72/q78/q127's frames,
    * so this composition reads their materializations instead of
    * re-deriving the closure per consumer — at 100 TB those
    * artifacts persist to parquet; same topology. What the composed
    * query still pays per run is the pointer-doubling rounds
    * themselves (label propagation is iterative driver-side work,
    * not a shareable frame). The *From seams
    * ([[Dedup.dedupClustersFrom]]/[[Dedup.canonicalDocsFrom]]/
    * [[TextAnalysis.trigramPerplexityFrom]]/[[trainingManifestFrom]])
    * expose the same composition over caller-prepared frames.
    */
  def trainingManifest(
      spark: SparkSession,
      dir: String,
      numShards: Int = 8
  ): DataFrame = {
    val surv = Dedup
      .canonicalDocs(spark, dir)
      .select(col("keep_doc").as("doc_id"))
    val kept = TextAnalysis
      .trigramPerplexity(spark, dir)
      .filter(col("keep") === 1)
      .select(col("doc_id"), col("ppl"))
    trainingManifestFrom(surv, kept, numShards)
  }

  /** The manifest tail over prepared survivor and perplexity-kept
    * frames: intersect on doc_id, hash-shard, per-shard position.
    */
  def trainingManifestFrom(
      surv: DataFrame,
      kept: DataFrame,
      numShards: Int = 8
  ): DataFrame = {
    val w = Window
      .partitionBy(col("shard"))
      .orderBy(col("h").asc, col("doc_id").asc)
    surv
      .join(kept, "doc_id")
      .select(
        col("doc_id"),
        col("ppl"),
        graft.functions.TextFunctions.hash60(col("doc_id")).as("h")
      )
      .withColumn("shard", (col("h") % numShards).cast("int"))
      .withColumn("position", row_number().over(w))
      .select(col("doc_id"), col("shard"), col("position"), col("ppl"))
  }

  /** q194: the four-gate curation manifest — the q130 composition
    * widened to the full round-7 gate stack: documents must survive
    * the near-dup closure (q78) AND pass the Gopher heuristic battery
    * (q142), the corpus-LM perplexity cut (q127), the trained LR gate
    * at its corpus-mean score cut (q180 — the mean cut, because on a
    * 5%-positive corpus the 0.5 decision threshold correctly predicts
    * no positives), and Moore-Lewis selection (q184); survivors land
    * in deterministic hash shards with per-shard positions. This is
    * the whole curation DAG — dedup closure + four independent
    * quality signals + layout — as ONE query, every stage reused
    * through its public seam.
    *
    * Scale: each gate is its own bounded pipeline (documented at its
    * own query); the intersection is four key joins on doc_id; the
    * manifest tail shuffles once on the shard hash. The oracle embeds
    * the proven gate SQL as subqueries over the shared recursive
    * closure + LM chains — no re-derivation drift.
    */
  def fourGateManifest(
      spark: SparkSession,
      dir: String,
      numShards: Int = 8
  ): DataFrame = {
    // the gates' shared inputs, derived ONCE: one documents scan, one
    // tokenize pass, one per-doc trigram count — round 7 paid the
    // tokenize+trigram chain separately inside the perplexity AND
    // Moore-Lewis gates (the q130 lesson applied one level up; at
    // 100 TB these are the persisted artifacts the gates read)
    val docs = Tables.documents(spark, dir)
    val toksSrc = docs
      .select(
        col("doc_id"),
        col("source"),
        graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .cacheTracked()
    val toks = toksSrc.select(col("doc_id"), col("t"))
    val docTri = TextAnalysis.docTrigramCounts(toks).cacheTracked()
    val surv = Dedup
      .canonicalDocs(spark, dir)
      .select(col("keep_doc").as("doc_id"))
    val gopherKeep = TextAnalysis
      .gopherRulesFrom(docs)
      .filter(col("keep"))
      .select(col("doc_id"))
    val pplKeep = TextAnalysis
      .trigramPerplexityFrom(toks, docTri)
      .filter(col("keep") === 1)
      .select(col("doc_id"))
    // mean-z cut in exact signed BIGINTs: z·n >= Σz (the round-9
    // integer-seam form of "score above the corpus mean")
    val lrScored = QualityLR
      .lrQualityGate(spark, dir)
      .select(col("doc_id"), col("z_pico"))
      // |docs|-row frame over the LR train+score chain; the mean
      // aggregate AND the keep filter both read it — cache so the
      // chain derives once (the q354 seam trick)
      .cacheTracked()
    val lrMean = lrScored
      .agg(sum(col("z_pico")).as("sz"), count(lit(1)).as("nz"))
    val lrKeep = lrScored
      .crossJoin(broadcast(lrMean))
      .filter(col("z_pico") * col("nz") >= col("sz"))
      .select(col("doc_id"))
    val mlKeep = TextAnalysis
      .mooreLewisSelectFromToks(toksSrc, docTri)
      .filter(col("keep") === 1)
      .select(col("doc_id"))
    fourGateManifestFrom(surv, gopherKeep, pplKeep, lrKeep, mlKeep, numShards)
  }

  /** The manifest tail over CALLER-prepared gate outputs — the
    * persisted-artifact seam: at 100 TB each gate's kept set is a
    * materialized table and corpus assembly is exactly these four
    * doc_id joins plus one shard shuffle.
    */
  def fourGateManifestFrom(
      surv: DataFrame,
      gopherKeep: DataFrame,
      pplKeep: DataFrame,
      lrKeep: DataFrame,
      mlKeep: DataFrame,
      numShards: Int = 8
  ): DataFrame = {
    val w = Window
      .partitionBy(col("shard"))
      .orderBy(col("h").asc, col("doc_id").asc)
    surv
      .join(gopherKeep, Seq("doc_id"))
      .join(pplKeep, Seq("doc_id"))
      .join(lrKeep, Seq("doc_id"))
      .join(mlKeep, Seq("doc_id"))
      .select(
        col("doc_id"),
        graft.functions.TextFunctions.hash60(col("doc_id")).as("h")
      )
      .withColumn("shard", (col("h") % numShards).cast("int"))
      .withColumn("position", row_number().over(w))
      .select(col("doc_id"), col("shard"), col("position"))
  }

  /** q131: DSIR-style importance weighting (Xie et al., "Data
    * Selection for Language Models via Importance Resampling",
    * NeurIPS 2023): score every document by how target-like its
    * hashed n-gram profile is. Features are unigrams + bigrams
    * hashed into a FIXED 1024-bucket space; target (here: the 'en'
    * slice) and source (the whole corpus) each get an add-1-smoothed
    * bag-of-ngrams multinomial over the buckets, and
    *
    *   logw(d) = Σ_b c_d(b) · ln(p_tgt(b) / p_src(b))
    *
    * with keep = logw > 0 (more target-like than source-average; the
    * paper resamples by these weights — the deterministic gate keeps
    * the oracle exact).
    *
    * Scale: the hashed feature space makes the ratio table O(buckets)
    * — 1024 rows regardless of corpus size, ALWAYS broadcast — unlike
    * the vocabulary-sized NB tables of q129; the per-doc score is one
    * broadcast join over pre-aggregated (doc, bucket) counts. This is
    * why DSIR runs on trillions of tokens: the model state is fixed
    * and tiny, and the corpus is touched by exactly two counting
    * passes (one building the multinomials, one scoring).
    */
  def dsirWeights(
      spark: SparkSession,
      dir: String,
      buckets: Int = 1024,
      targetLang: String = "en"
  ): DataFrame = {
    val t = col("t")
    val base = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("lang"),
        graft.functions.TextFunctions.tokens(col("text")).as("t")
      )
    val uni = base.select(col("doc_id"), col("lang"), explode(t).as("g"))
    val big = base
      .filter(size(t) >= 2)
      .select(
        col("doc_id"),
        col("lang"),
        explode(
          zip_with(
            slice(t, lit(1), size(t) - 1),
            slice(t, lit(2), size(t) - 1),
            (a, b) => concat(a, lit(" "), b)
          )
        ).as("g")
      )
    // feeds doc-bucket counts, both multinomials, and the totals —
    // materialize the tokenize+hash pass once
    val feats = uni
      .unionByName(big)
      .select(
        col("doc_id"),
        col("lang"),
        (graft.functions.TextFunctions.hash60(col("g")) % buckets).as("b")
      )
      .cacheTracked()
    val db = feats.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
    val srcCnt = feats.groupBy(col("b")).agg(count(lit(1)).as("cs"))
    val tgtCnt = feats
      .filter(col("lang") === targetLang)
      .groupBy(col("b"))
      .agg(count(lit(1)).as("ct"))
    val totals = feats.agg(
      count(lit(1)).cast("double").as("ns"),
      sum((col("lang") === targetLang).cast("long")).cast("double").as("nt")
    )
    val ratio = srcCnt
      .join(tgtCnt, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(
        col("b"),
        (log((coalesce(col("ct"), lit(0L)) + 1) / (col("nt") + buckets)) -
          log((col("cs") + 1) / (col("ns") + buckets))).as("lr")
      )
    db.join(broadcast(ratio), "b")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_ngrams"),
        sum(col("c") * col("lr")).as("lw")
      )
      .select(
        col("doc_id"),
        col("n_ngrams"),
        round(col("lw"), 6).as("logw"),
        round(col("lw") / col("n_ngrams"), 6).as("logw_per_ngram"),
        (col("lw") > 0).cast("int").as("keep")
      )
  }

  /** q132: temperature-scaled multilingual mix sampling (the mT5 /
    * UNIMAX corpus-mix shaper, Xue et al. 2021: sampling weights
    * q_l ∝ p_l^α with α = 0.3 flatten the language distribution so
    * low-resource languages are upsampled relative to their share).
    * Per language: p_l = doc share, q_l = normalized p_l^α, sampling
    * rate = min(1, budget·q_l / p_l share), realized as an integer
    * parts-per-million threshold on the deterministic doc_id hash —
    * so selection is a shuffle-free per-row predicate against a
    * broadcast |langs|-row rate table (the q49 split construction),
    * not a per-language rank/sort. Output is the per-language
    * summary: share, weight, ppm threshold, and realized kept count.
    *
    * Scale: two tiny aggregates over (lang) plus one corpus scan
    * with a broadcast join; nothing sorts or shuffles the corpus.
    * The ppm integerization makes the gate exact cross-engine
    * (float rates would flip boundary rows between engines).
    */
  def temperatureMix(
      spark: SparkSession,
      dir: String,
      alpha: Double = 0.3,
      budgetFrac: Double = 0.5
  ): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("lang"))
    val perLang = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val tot = perLang.agg(sum(col("n_docs")).cast("double").as("tot"))
    val qraw = perLang
      .crossJoin(broadcast(tot))
      .select(
        col("lang"),
        col("n_docs"),
        col("tot"),
        pow(col("n_docs") / col("tot"), alpha).as("qr")
      )
    val qsum = qraw.agg(sum(col("qr")).as("qs"))
    val rates = qraw
      .crossJoin(broadcast(qsum))
      .select(
        col("lang"),
        col("n_docs"),
        round(col("n_docs") / col("tot"), 6).as("p"),
        round(col("qr") / col("qs"), 6).as("q"),
        floor(
          least(
            lit(1.0),
            lit(budgetFrac) * col("tot") * (col("qr") / col("qs")) /
              col("n_docs")
          ) * 1e6
        ).cast("long").as("rate_ppm")
      )
    docs
      .join(broadcast(rates), "lang")
      .select(
        col("lang"),
        col("n_docs"),
        col("p"),
        col("q"),
        col("rate_ppm"),
        (graft.functions.TextFunctions.hash60(col("doc_id")) % 1000000 <
          col("rate_ppm")).cast("long").as("kept")
      )
      .groupBy(col("lang"), col("n_docs"), col("p"), col("q"),
        col("rate_ppm"))
      .agg(sum(col("kept")).as("n_kept"))
  }

  /** q150: UniMax language-budget allocation (the epoch-capped
    * fair mixing rule: give every language up to `epochCap` epochs of
    * its data, then split whatever budget remains EQUALLY among the
    * languages that still have headroom — the budget-allocation
    * complement of q132's temperature sampling).
    *
    * The sequential "process languages smallest-first, cap or share"
    * loop has a closed form once you notice the capped set is a
    * prefix of the ascending-size order: if language i gets the equal
    * share (uncapped), every larger language also gets the SAME share
    * (the remaining budget shrinks by exactly one share per step). So:
    *   - order languages by (chars ASC, lang) and prefix-sum
    *     `epochCap·chars`;
    *   - a language is capped while
    *     epochCap·chars_i·(L−i+1) < B − epochCap·prefix_{i−1}
    *     (all integer arithmetic — no float boundary can flip a
    *     language between engines), taken as a prefix-AND so the
    *     test is only consulted while every smaller language capped;
    *   - uncapped languages each get
    *     floor((B − epochCap·Σ_capped chars·epochCap) / (L−k)).
    *
    * Scale: one tiny per-language aggregate (5 rows here; a few
    * hundred at worst in any real corpus), then windows over that
    * tiny frame — the corpus itself is scanned once and never
    * shuffled. The single-partition windows are over the provably
    * bounded language frame, never the data.
    */
  def unimaxAllocation(
      spark: SparkSession,
      dir: String,
      epochCap: Int = 2,
      budgetFrac: Double = 0.5
  ): DataFrame = {
    val perLang = Tables
      .documents(spark, dir)
      .groupBy(col("lang"))
      .agg(sum(col("n_chars")).as("n_chars"))
    val tot = perLang.agg(
      floor(lit(budgetFrac) * sum(col("n_chars"))).cast("long").as("budget"),
      count(lit(1)).as("n_langs")
    )
    val ord = Window.orderBy(col("n_chars").asc, col("lang").asc)
    val prev = ord.rowsBetween(Window.unboundedPreceding, -1)
    val upto = ord.rowsBetween(Window.unboundedPreceding, 0)
    val flagged = perLang
      .crossJoin(broadcast(tot))
      .withColumn("i", row_number().over(ord))
      .withColumn(
        "prefix",
        coalesce(sum(lit(epochCap.toLong) * col("n_chars")).over(prev), lit(0L))
      )
      .withColumn(
        "flag",
        (lit(epochCap.toLong) * col("n_chars") *
          (col("n_langs") - col("i") + 1) <
          col("budget") - col("prefix")).cast("int")
      )
      .withColumn("capped", min(col("flag")).over(upto) === 1)
    val capStats = flagged
      .agg(
        sum(when(col("capped"), lit(epochCap.toLong) * col("n_chars"))
          .otherwise(lit(0L))).as("capsum"),
        sum(col("capped").cast("long")).as("k")
      )
    flagged
      .crossJoin(broadcast(capStats))
      .select(
        col("lang"),
        col("n_chars"),
        col("capped"),
        when(col("capped"), lit(epochCap.toLong) * col("n_chars"))
          .otherwise(
            floor(
              (col("budget") - col("capsum")) /
                (col("n_langs") - col("k"))
            ).cast("long")
          )
          .as("alloc_chars")
      )
      .withColumn(
        "epochs",
        round(col("alloc_chars").cast("double") / col("n_chars"), 6)
      )
  }

  /** q89: value-bucketed deciles via broadcast boundaries — the
    * sort-free alternative to q50's exact count-balanced ntile: one
    * tiny aggregate computes the nine decile boundaries of the
    * quality score (exact `percentile` here so the oracle can replay
    * it; `approx_percentile` at 100 TB — same topology, mergeable
    * sketch instead of a count map), broadcast as a single row, and
    * bucket membership is nine comparisons per row in the scan. Two
    * passes over the data, zero shuffles of it. Boundaries and scores
    * compare ROUNDED (6 places) so membership is engine-exact.
    */
  def decileByBoundaries(spark: SparkSession, dir: String): DataFrame = {
    // integer micro-quality feeds both the boundary aggregate and the
    // emitted column (round-9 seam); the interpolated decile
    // boundaries are exact-integer-derived doubles (n−1)p arithmetic,
    // bit-identical across engines, and never themselves emitted
    val scored = TextAnalysis.qualityMicroScores(spark, dir)
    val bounds = scored.agg(
      expr(
        "percentile(q_micro, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))")
        .as("bs")
    )
    scored
      .join(broadcast(bounds))
      .select(
        col("doc_id"),
        col("q_micro"),
        (lit(1) + size(filter(col("bs"), b => col("q_micro") >= b)))
          .cast("int")
          .as("vbucket")
      )
  }

  /** q50: curriculum deciles — exact ntile(10) over quality
    * descending (doc_id tiebreak makes membership total-ordered and
    * exact), computed by the distributed two-pass ranking
    * ([[Ranking.withGlobalRank]]: range shuffle + zipWithIndex) rather
    * than an empty-partition window, which would serialize the whole
    * corpus through one partition.
    */
  def qualityDeciles(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.qualityMicroScores(spark, dir)
    val total = scored.count()
    Ranking
      .withGlobalRank(
        scored,
        Seq(col("q_micro").desc, col("doc_id").asc),
        "rk",
        spark.sessionState.conf.numShufflePartitions
      )
      .withColumn("decile", Ranking.ntileFromRank(col("rk"), lit(total), 10))
      .select(col("doc_id"), col("q_micro"), col("decile"))
  }

  /** q97: weighted sampling without replacement, k=50, weight =
    * document length — Efraimidis-Spirakis A-Res (IPL 97(5), 2006):
    * per row draw u from an ID-KEYED deterministic hash (doc_id, not
    * content — reproducible on any cluster layout, but unlike the
    * q49 content-hash split NOT stable under re-assigned ids; hash
    * the text instead if id stability isn't guaranteed) and rank by
    * priority u^(1/w); the top-k by priority IS a weighted sample
    * without replacement.
    *
    * Scale: one narrow map over the scan + `TakeOrderedAndProject`
    * (per-partition heaps of k, merged on the driver) — no global
    * sort, no shuffle of the corpus, which is the entire point vs
    * the rejection-sampling loop a single-node engine would run.
    */
  /** q104: training-mix reweighting — given a target language mix,
    * compute each language's current token share and the sampling
    * weight (target / current) that reaches the target, plus the
    * expected post-sampling token count. The corpus-mixing math a
    * data recipe applies before shard assembly; weights > 1 mean the
    * language must be up-sampled (repeated epochs), < 1 down-sampled.
    *
    * One aggregate over the scan + one broadcast total — the
    * arithmetic is per-group, so the whole op is two tiny shuffles at
    * any corpus size.
    */
  def mixReweight(spark: SparkSession, dir: String): DataFrame = {
    // targets as exact per-mille integers (round-12 float purge):
    // every emission below is a BIGINT ratio of these and the token
    // counts — share in ppm, weight = target/share in micro, and
    // expected = target·total exactly, emitted in centi-tokens.
    val targetPm = typedLit(
      Map("en" -> 500L, "de" -> 200L, "fr" -> 150L, "es" -> 100L,
        "zh" -> 50L)
    )
    val perLang = Tables
      .documents(spark, dir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
          .as("n_tokens")
      )
    val total = perLang.agg(sum(col("n_tokens")).as("t_tokens"))
    perLang
      .crossJoin(broadcast(total))
      .select(
        col("lang"),
        col("n_docs"),
        col("n_tokens"),
        graft.functions.IntMath
          .microRatio(col("n_tokens"), col("t_tokens"))
          .as("share_ppm"),
        element_at(targetPm, col("lang")).as("target_pm"),
        // weight = (target_pm/1000)·t/n → half-up micro
        graft.functions.IntMath
          .idivHalfUp(
            element_at(targetPm, col("lang")) * col("t_tokens") *
              lit(1000L),
            col("n_tokens")
          )
          .as("weight_micro"),
        // expected tokens = n·weight = target·t exactly → centi
        graft.functions.IntMath
          .idivHalfUp(
            element_at(targetPm, col("lang")) * col("t_tokens"),
            lit(10L)
          )
          .as("expected_tokens_centi")
      )
  }

  /** q108: stratified weighted sampling — the q97 A-Res priority
    * ranked WITHIN each language, top-20 per stratum: the actual
    * corpus-mixing sampler (per-language quotas × length-weighted
    * selection) in one window pass. Same id-keyed determinism as
    * q97; one shuffle on lang.
    */
  def stratifiedWeightedSample(
      spark: SparkSession,
      dir: String,
      kPerLang: Int = 20
  ): DataFrame = {
    val u = (graft.functions.TextFunctions.hash60(col("doc_id")) + 1L)
      .cast("double") / lit(1152921504606846976.0)
    val w = Window
      .partitionBy(col("lang"))
      .orderBy(col("r").desc, col("doc_id").asc)
    Tables
      .documents(spark, dir)
      .filter(col("n_chars") > 0)
      .select(
        col("doc_id"),
        col("lang"),
        col("n_chars"),
        pow(u, lit(1.0) / col("n_chars")).as("r")
      )
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= kPerLang)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        round(col("r"), 6).as("priority"), col("rk"))
  }

  def weightedSample(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val u = (graft.functions.TextFunctions.hash60(col("doc_id")) + 1L)
      .cast("double") / lit(1152921504606846976.0) // 2^60
    Tables
      .documents(spark, dir)
      .filter(col("n_chars") > 0)
      .select(
        col("doc_id"),
        col("n_chars"),
        pow(u, lit(1.0) / col("n_chars")).as("r")
      )
      .orderBy(col("r").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("n_chars"), round(col("r"), 6).as("priority"))
  }

  /** q144: per-source document cap — FineWeb-style domain balancing:
    * rank each source's documents by a deterministic content-free
    * hash (md5 of doc_id, so the kept subset is a uniform draw that
    * reproduces on any cluster layout) and keep the first `cap`.
    * Heavily-crawled domains stop dominating the corpus; small
    * sources pass through untouched.
    *
    * Scale: one hash-partitioned window on `source`. Per-source
    * state is a running counter, so memory is O(1) per partition;
    * the skew risk of a mega-domain is bounded by first filtering
    * with a per-source count — only sources OVER the cap go through
    * the rank window, the rest skip it entirely (kept = true by
    * count alone). At 100 TB that routes the bulk of the corpus
    * around the sort.
    */
  def sourceCap(
      spark: SparkSession,
      dir: String,
      cap: Int = 16
  ): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"))
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    val small = docs
      .join(broadcast(counts.filter(col("n_src") <= cap)), Seq("source"))
      .select(
        col("doc_id"),
        col("source"),
        col("n_src"),
        lit(true).as("kept")
      )
    val w = Window
      .partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val capped = docs
      .join(broadcast(counts.filter(col("n_src") > cap)), Seq("source"))
      .withColumn("rk", row_number().over(w))
      .select(
        col("doc_id"),
        col("source"),
        col("n_src"),
        (col("rk") <= cap).as("kept")
      )
    small.unionByName(capped)
  }

  /** q169: epoch-expansion plan — materialize the q150 UniMax
    * allocation as a PER-DOCUMENT repeat count: every doc repeats
    * ⌊e⌋ times plus one more iff its id-hash lands under the
    * fractional part (a deterministic Bernoulli, the same
    * integer-ppm hash-threshold trick as the q132 temperature mix).
    * Summed over a language, repeats ≈ e·n_docs — the exact
    * materialized sampling schedule a trainer's data loader
    * replays, shuffle-free and reproducible across engines and
    * partitionings.
    *
    * Scale: the allocation is a 5-row broadcast; the expansion is a
    * pure map over the corpus scan.
    */
  def epochExpansion(spark: SparkSession, dir: String): DataFrame = {
    val alloc = unimaxAllocation(spark, dir)
      .select(col("lang"), col("epochs"))
    val thr = round((col("epochs") - floor(col("epochs"))) * 1000000)
      .cast("long")
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .join(broadcast(alloc), "lang")
      .select(
        col("doc_id"),
        col("lang"),
        col("epochs"),
        (floor(col("epochs")).cast("long") +
          when(
            pmod(graft.functions.TextFunctions.hash60(col("doc_id")),
              lit(1000000L)) < thr,
            1L
          ).otherwise(0L)).as("n_repeats")
      )
  }

  /** q172: leakage-free train/valid/test split — the q49 hash split
    * applied at NEAR-DUP-CLUSTER granularity: every member of a
    * cluster hashes on its cluster_id, so a document and its
    * near-duplicates can never straddle the train/test boundary.
    * Splitting doc-wise in a corpus with near-dups (the q49 naive
    * form) leaks ~duplicate test content into train and inflates
    * eval; cluster-wise is the split a deduplicated training run
    * actually needs.
    *
    * Scale: cluster labels are the q72 closure (cached pair artifact
    * + O(log d) CC); the split itself is a pure map on the label.
    */
  def clusterSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket = graft.functions.TextFunctions
      .hash60(col("cluster_id")).mod(100).cast("int")
    Dedup
      .dedupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
      .withColumn("bucket", bucket)
      .withColumn(
        "split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid")
          .otherwise("test")
      )
  }

  /** q173: balanced eval-set construction — a fixed per-cell quota
    * (20 docs) from every (lang, quality-bin) stratum, members
    * chosen by the deterministic md5 rank (the q144 source-cap
    * convention). An eval set sampled uniformly inherits the
    * corpus's skew (one lang dominating, quality extremes absent);
    * quota-per-cell is how eval sets are actually balanced.
    *
    * Scale: one scoring pass, then a WindowGroupLimit rank ≤ quota
    * per stratum — per-partition heaps, never a full sort.
    */
  def balancedEvalSet(
      spark: SparkSession,
      dir: String,
      quota: Int = 20
  ): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // decile bin as exact integer division of the micro-quality —
    // floor(q·10) on a double flips at bin edges across engines;
    // q_micro div 100000 cannot (round-9 seam)
    val scored = docs
      .join(TextAnalysis.qualityMicroScoresFrom(docs), "doc_id")
      .select(
        col("doc_id"),
        col("lang"),
        least(
          graft.functions.IntMath.idiv(col("q_micro"), lit(100000L)),
          lit(9L)
        ).cast("int").as("bin")
      )
    val w = Window
      .partitionBy(col("lang"), col("bin"))
      .orderBy(
        md5(col("doc_id").cast("string")).asc,
        col("doc_id").asc)
    scored
      .withColumn("cell_rank", row_number().over(w))
      .filter(col("cell_rank") <= quota)
  }

  /** q176: per-source rank normalization of quality scores — map
    * each document's quality onto its PERCENTILE WITHIN ITS SOURCE
    * (percent_rank, rounded-score order with doc_id ties). Raw
    * quality scores are not comparable across sources (a mid-tier
    * web doc and a mid-tier code doc score differently on the same
    * heuristic); rank-normalizing per source is the standard fix
    * before a single corpus-wide quality threshold is applied.
    *
    * Scale: one scoring pass and one source-partitioned window —
    * no corpus-wide ordered window exists.
    */
  def scoreNormalization(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val w = Window
      .partitionBy(col("source"))
      .orderBy(col("q_micro").asc, col("doc_id").asc)
    // percent_rank = (rank−1)/(n−1) emitted as the exact half-up ppm
    // of its two integer terms (round-9 seam) — the double form can
    // land exactly on a .5 micro-boundary
    docs
      .join(TextAnalysis.qualityMicroScoresFrom(docs), "doc_id")
      .select(col("doc_id"), col("source"), col("q_micro"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy(col("source"))))
      .select(
        col("doc_id"),
        col("source"),
        col("q_micro"),
        when(col("n_src") === 1, 0L)
          .otherwise(
            graft.functions.IntMath
              .microRatio(col("rk") - 1, col("n_src") - 1))
          .as("q_norm_ppm")
      )
  }

  /** q162: duplication-aware sampling weights — the count-based
    * down-weighting a pretraining sampler applies instead of (or on
    * top of) hard dedup: every document in a near-dup cluster of
    * size k samples with weight 1/k, so a 40-way boilerplate clone
    * carries the same total probability mass as a unique document.
    * Weights are additionally normalized per language (w_norm sums
    * to 1 within each lang), which is the form a per-language
    * sampler consumes.
    *
    * Scale: cluster sizes come from the q72 transitive closure (the
    * dedup family's cached derive-once artifact — banded pair join +
    * O(log d) pointer-doubling CC); this operator adds one doc-keyed
    * join and one lang-partitioned window over (doc, weight) rows.
    */
  def dupWeightedSampling(spark: SparkSession, dir: String): DataFrame = {
    val cl = Dedup
      .dedupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_size"))
    val lang = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val wLang = Window.partitionBy(col("lang"))
    // exact integer units (round-12 float purge): the duplication
    // discount is halfUp(10⁶/size) — one exact division per row —
    // and the per-lang normalization divides by the SUM OF THOSE
    // MICROS (order-independent integer addition), so both columns
    // are engine-identical with no float anywhere
    import graft.functions.IntMath.idivHalfUp
    cl.join(lang, "doc_id")
      .withColumn(
        "weight_micro",
        idivHalfUp(lit(1000000L), col("cluster_size"))
      )
      .select(
        col("doc_id"),
        col("lang"),
        col("cluster_size"),
        col("weight_micro"),
        idivHalfUp(
          col("weight_micro") * lit(1000000L),
          sum(col("weight_micro")).over(wLang)
        ).as("w_norm_ppm")
      )
  }

  /** q164: token-budget corpus snapshot — "ship the best B tokens":
    * rank documents by quality (the q15 heuristic rounded to 6,
    * doc_id ties) and keep every document that STARTS before the
    * token budget is exhausted (cum − own < B). The assembly step of
    * a fixed-compute pretraining run, where the budget, not the
    * corpus, is the constant.
    *
    * Scale: the global ordered cumulative sum — the step that is a
    * single-partition window if written naively — runs as the
    * two-level distributed form: range-partition on the rank key,
    * per-partition cumsums in parallel (pid-keyed window), then a
    * P-row offsets frame (cumsum over a provably bounded frame)
    * broadcast back. Token counts are integers, so the distributed
    * fold is bit-equal to the sequential one at any partition count.
    */
  def tokenBudgetSnapshot(
      spark: SparkSession,
      dir: String,
      budget: Long = 100000L,
      numParts: Int = 8
  ): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .join(
        TextAnalysis.qualityMicroScoresFrom(docs),
        "doc_id")
      .select(
        col("doc_id"),
        col("q_micro"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("n_tokens")
      )
    val parts = scored
      .repartitionByRange(numParts, col("q_micro").desc, col("doc_id").asc)
      .withColumn("pid", spark_partition_id())
    val wIn = Window
      .partitionBy(col("pid"))
      .orderBy(col("q_micro").desc, col("doc_id").asc)
    // materialized once: both the output rows and the offsets frame
    // read this (without it the offsets branch re-derives the whole
    // score+cumsum chain — at 100 TB this is a persisted artifact)
    val withCum = parts
      .withColumn("cum_in", sum(col("n_tokens")).over(wIn))
      .cacheTracked()
    // offsets: one row per range partition; the tiny frame is the
    // only place a global-ordered window runs
    val offsets = withCum
      .groupBy(col("pid"))
      .agg(max(col("cum_in")).as("ptot"))
      .withColumn(
        "off",
        coalesce(
          sum(col("ptot")).over(
            Window.orderBy(col("pid").asc)
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L))
      )
      .select(col("pid"), col("off"))
    withCum
      .join(broadcast(offsets), Seq("pid"))
      .withColumn("cum_tokens", col("cum_in") + col("off"))
      .filter(col("cum_tokens") - col("n_tokens") < budget)
      // the rank key IS the emitted pure-BIGINT micro-quality
      // (round-9 seam): no double ever orders or labels the cut, so
      // an ulp flip can neither reorder the budget nor shift
      // cum_tokens across engines.
      .select(
        col("doc_id"),
        col("q_micro"),
        col("n_tokens"),
        col("cum_tokens"))
  }

  /** q197: per-language exact-IQR length gate — keep documents whose
    * token count lies in [P25, P75] of their OWN language (corpus-
    * relative, like the q127/q184 cuts: absolute length thresholds
    * don't transfer across languages with different tokenization
    * density). Quartiles are EXACT rank statistics (value at rank
    * ⌈0.25·n⌉ / ⌈0.75·n⌉ in (n_tokens ASC, doc_id ASC) order), so the
    * oracle replays them bit-identically — approx_percentile would be
    * cheaper at scale but engine-specific.
    *
    * Scale: one tokenize scan; the rank runs per-language (at 100 TB,
    * the range-partitioned two-level rank of [[Ranking]] within each
    * language); the quartile table is |langs| rows, broadcast back.
    */
  /** q247: per-source token-mass Gini coefficient — how unequally a
    * source's token budget is concentrated in its documents, via the
    * sorted-cumulative form G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over
    * docs ranked by (n_tokens, doc_id). G≈0: uniform doc sizes; G→1:
    * a few giant docs carry the source — exactly the sources where
    * doc-level sampling (q130/q223 budgets are doc-keyed) and
    * token-level budgets (q164) diverge, so this is the gauge that
    * says which accounting to trust per source.
    *
    * Determinism: rank, Σi·x and Σx are exact integers; the two
    * final divisions are over exact integers — IEEE-identical.
    *
    * Scale: one tokenize scan, one per-source window (bounded by the
    * largest source; two-level rank at 100 TB), a |sources|-row agg.
    */
  def sourceTokenGini(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long")
          .as("x")
      )
    val w = Window
      .partitionBy(col("source"))
      .orderBy(col("x").asc, col("doc_id").asc)
    d.withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("x")).as("total_tokens"),
        sum(col("i") * col("x")).as("six")
      )
      .select(
        col("source"),
        col("n_docs"),
        col("total_tokens"),
        // (2Σix − (n+1)Σx)·1e6 / (n·Σx), exact signed half-up
        graft.functions.IntMath.idivHalfUpSigned(
          (lit(2L) * col("six") -
            (col("n_docs") + 1) * col("total_tokens")) * lit(1000000L),
          col("n_docs") * nullif(col("total_tokens"), lit(0L))
        ).as("gini_micro")
      )
  }

  /** q258: token-weighted quality deciles — the quality level of the
    * d/10-th TOKEN (not document): docs ordered by (quality, doc_id),
    * token mass cumulated, and for each decile d the first document
    * whose cumulative token count reaches d·total/10. Doc-level
    * deciles (q50) say "half the DOCS are below q₀.₅"; this says
    * "half the TOKENS are" — the two disagree exactly when q247's
    * Gini is high, and token-weighted is the one a training-mix
    * budget actually consumes.
    *
    * Scale: the q164 two-level cumsum topology (range partition +
    * per-partition window + P-row offsets frame — no global window
    * over data); the decile probe is a 9-literal explode with
    * map-side partial mins, 9 rows shuffled per partition. The
    * boundary test is exact integer arithmetic (cum·10 ≥ d·total).
    */
  def tokenWeightedQualityDeciles(
      spark: SparkSession,
      dir: String,
      numParts: Int = 8
  ): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .join(TextAnalysis.qualityMicroScoresFrom(docs), "doc_id")
      .select(
        col("doc_id"),
        col("q_micro").as("q"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long")
          .as("n")
      )
      .filter(col("n") > 0)
    val parts = scored
      .repartitionByRange(numParts, col("q").asc, col("doc_id").asc)
      .withColumn("pid", spark_partition_id())
    val wIn = Window
      .partitionBy(col("pid"))
      .orderBy(col("q").asc, col("doc_id").asc)
    val withCum = parts
      .withColumn("cum_in", sum(col("n")).over(wIn))
      .cacheTracked()
    val offsets = withCum
      .groupBy(col("pid"))
      .agg(max(col("cum_in")).as("ptot"))
      .withColumn(
        "off",
        coalesce(
          sum(col("ptot")).over(
            Window
              .orderBy(col("pid").asc)
              .rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select(col("pid"), col("off"))
    val cum = withCum
      .join(broadcast(offsets), Seq("pid"))
      .withColumn("cum", col("cum_in") + col("off"))
    val tot = broadcast(scored.agg(sum(col("n")).as("tot")))
    val probed = cum
      .crossJoin(tot)
      .select(
        explode(lit((1 to 9).toArray)).as("d"),
        col("cum"),
        col("doc_id"),
        col("q"),
        col("tot")
      )
      .filter(col("cum") * 10 >= col("d") * col("tot"))
    probed
      .groupBy(col("d"))
      .agg(min(struct(col("cum"), col("doc_id"), col("q"))).as("m"))
      .select(
        col("d").cast("long").as("decile"),
        col("m.cum").as("cum_tokens"),
        col("m.doc_id").as("doc_id"),
        col("m.q").as("q_micro")
      )
  }

  /** q275: robust quality outliers — per source, the EXACT median
    * and MAD (median absolute deviation) of the q15 quality score,
    * and per doc the modified z-score 0.6745·(q−med)/MAD with the
    * Iglewicz-Hoaglin |z| > 3.5 outlier flag. The screen that
    * survives what breaks mean/stddev gates: a source with 5% spam
    * shifts a mean-based z enough to mask the spam itself; median
    * and MAD don't move. Medians are exact rank statistics (value at
    * rank ⌈n/2⌉ in (value, doc_id) order — the q197 convention), so
    * the oracle replays them bit-identically; MAD = 0 sources emit
    * NULL z and no flags.
    *
    * Scale: two bounded per-source rank windows (two-level rank at
    * 100 TB), a |sources|-row stats frame broadcast back onto one
    * scored scan.
    */
  def robustQualityOutliers(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .select(col("doc_id"), col("source"))
      .join(
        TextAnalysis.qualityMicroScoresFrom(docs)
          .select(col("doc_id"), col("q_micro").as("q")),
        "doc_id"
      )
    def medianOf(df: DataFrame, valueCol: String): DataFrame = {
      val w = Window
        .partitionBy(col("source"))
        .orderBy(col(valueCol).asc, col("doc_id").asc)
      df.withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("source"))))
        .filter(col("rn") === ceil(col("cnt") / 2))
        .select(col("source"), col(valueCol).as("med"))
    }
    val med = medianOf(scored, "q")
    val withDev = scored
      .join(broadcast(med), "source")
      .withColumn("dev", abs(col("q") - col("med")))
    val mad = medianOf(
      withDev.select(col("doc_id"), col("source"), col("dev").as("q")),
      "q"
    ).select(col("source"), col("med").as("mad"))
    // all integers: z_micro = halfUpSigned(674500·(q−med), mad)
    // (0.6745·Δq/mad in micro-units with Δq, mad both micro), NULL at
    // mad = 0; the flag |0.6745·Δq/mad| > 3.5 is the exact integer
    // cross-multiplication 6745·|Δq| > 35000·mad (round-9 seam)
    withDev
      .join(broadcast(mad), "source")
      .select(
        col("doc_id"),
        col("source"),
        col("q").as("q_micro"),
        col("med").as("med_micro"),
        col("mad").as("mad_micro"),
        when(col("mad") === 0L, lit(null).cast("long"))
          .otherwise(
            graft.functions.IntMath.idivHalfUpSigned(
              lit(674500L) * (col("q") - col("med")),
              col("mad")))
          .as("z_micro"),
        coalesce(
          lit(6745L) * abs(col("q") - col("med")) >
            lit(35000L) * nullif(col("mad"), lit(0L)),
          lit(false)
        ).as("outlier")
      )
  }

  /** q279: exact two-sample Kolmogorov-Smirnov distance of each
    * source's quality distribution against the corpus — the sup of
    * |F_source − F_corpus| evaluated on BOTH sides of every source
    * sample point, which attains the true two-sample supremum (the
    * ECDF difference is piecewise monotone between source steps, so
    * interval ends — v and the next step's v⁻ — cover every
    * extremum). Flag at the asymptotic α=0.05 critical value
    * 1.358·√((n+N)/(n·N)). The distribution-level drift gate next
    * to q168's KL (which needs binning) and q259's trend slope —
    * KS is binning-free and catches shape changes a mean tracker
    * misses. Every ECDF value is a division of exact integers.
    *
    * Scale: one (value) count frame and one (source, value) count
    * frame; cumsums run over the QUANTIZED value domain (≤ 10⁶+1
    * distinct 6-decimal scores — bounded, never corpus rows; the
    * two-level cumsum applies beyond that).
    */
  def sourceQualityKs(spark: SparkSession, dir: String): DataFrame = {
    val crit = lit(1.358) *
      sqrt((col("n_s") + col("bign")).cast("double") / (col("n_s") * col("bign")))
    // ks_micro is the exact half-up ratio of the integer sup
    // numerator over n_s·N; crit keeps its sqrt form (IEEE sqrt is
    // correctly rounded, hence engine-identical on integer inputs)
    // and the drift flag compares the same two deterministic doubles
    ksPerSource(spark, dir)
      .select(
        col("source"),
        col("n_s").as("n"),
        graft.functions.IntMath
          .microRatio(col("dnum"), col("n_s") * col("bign"))
          .as("ks_micro"),
        round(crit * 1e6).cast("long").as("crit_micro"),
        (col("dnum").cast("double") /
          (col("n_s") * col("bign")).cast("double") > crit).as("drifted")
      )
  }

  /** Shared KS core: per-source sup distance `d` of the quality ECDF
    * vs the corpus ECDF, with the sample sizes — the seam q279's
    * flag view and q284's FDR battery both read, so the two gates
    * can never disagree on the statistic.
    */
  private def ksPerSource(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .select(col("doc_id"), col("source"))
      .join(
        TextAnalysis.qualityMicroScoresFrom(docs)
          .select(col("doc_id"), col("q_micro").as("q")),
        "doc_id"
      )
    val wg = Window
      .orderBy(col("q").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gv = scored
      .groupBy(col("q"))
      .agg(count(lit(1)).as("gcnt"))
      .withColumn("gcum", sum(col("gcnt")).over(wg))
    val ws = Window
      .partitionBy(col("source"))
      .orderBy(col("q").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sv = scored
      .groupBy(col("source"), col("q"))
      .agg(count(lit(1)).as("scnt"))
      .withColumn("scum", sum(col("scnt")).over(ws))
    val ns = broadcast(
      scored.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    )
    val bigN = broadcast(scored.agg(count(lit(1)).as("bign")))
    // the sup runs on the EXACT common-denominator numerator
    // |scum·N − gcum·n_s| (BIGINT; the double ECDF difference can sit
    // exactly on a .5 micro-boundary — round-9 seam). Headroom: the
    // n_s·N product caps this form near ~3e9 rows; past that the
    // per-source KS runs on a sampled ECDF anyway.
    val dnum = greatest(
      abs(col("scum") * col("bign") - col("gcum") * col("n_s")),
      abs((col("scum") - col("scnt")) * col("bign") -
        (col("gcum") - col("gcnt")) * col("n_s"))
    )
    sv.join(gv, "q")
      .join(ns, "source")
      .crossJoin(bigN)
      .groupBy(col("source"))
      .agg(
        max(col("n_s")).as("n_s"),
        max(col("bign")).as("bign"),
        max(dnum).as("dnum")
      )
  }

  /** q283: per-source Mann-Whitney U location test of the quality
    * score against the REST of the corpus — the rank-based complement
    * to q279's KS (shape-sensitive, sign-blind) and q259's OLS slope
    * (parametric): U detects a directional median shift without any
    * normality assumption, which q281's Jarque-Bera audit shows these
    * scores routinely violate. Ranks are average-ranks over the
    * micro-quantized score, kept EXACT by carrying 2×rank (a tied
    * group's doubled average rank `2·prevcum + t + 1` is an integer);
    * `u2 = 2U` is therefore an exact BIGINT on both engines. The
    * normal approximation uses the tie-corrected variance
    * n₁n₂/12·((N+1) − Σ(t³−t)/(N(N−1))); `shifted` flags |z| > 1.96
    * (two-sided α=0.05). No continuity correction (documented choice,
    * mirrored in the oracle).
    *
    * Scale: rank math runs over the QUANTIZED value domain (≤ 10⁶+1
    * tie groups — bounded, never corpus rows); per-source sums are
    * one map-side-combined aggregate; the tie term is one broadcast
    * scalar.
    */
  def mannWhitneyDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .select(col("doc_id"), col("source"))
      .join(
        TextAnalysis.qualityMicroScoresFrom(docs)
          .select(col("doc_id"), col("q_micro").as("qm")),
        "doc_id"
      )
    val wg = Window
      .orderBy(col("qm").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gv = scored
      .groupBy(col("qm"))
      .agg(count(lit(1)).as("gcnt"))
      .withColumn("gcum", sum(col("gcnt")).over(wg))
      // doubled average rank of the tie group: 2·(gcum−gcnt) + gcnt + 1
      .withColumn(
        "rank2",
        lit(2L) * (col("gcum") - col("gcnt")) + col("gcnt") + lit(1L)
      )
    val ties = broadcast(
      gv.agg(
        sum(col("gcnt") * col("gcnt") * col("gcnt") - col("gcnt"))
          .as("tsum"),
        sum(col("gcnt")).as("bign")
      )
    )
    val perSrc = scored
      .groupBy(col("source"), col("qm"))
      .agg(count(lit(1)).as("scnt"))
      .join(gv.select(col("qm"), col("rank2")), "qm")
      .groupBy(col("source"))
      .agg(
        sum(col("scnt")).as("n_s"),
        sum(col("scnt") * col("rank2")).as("r2")
      )
      .crossJoin(ties)
    val n1 = col("n_s").cast("double")
    val n2 = (col("bign") - col("n_s")).cast("double")
    val u2 = col("r2") - col("n_s") * (col("n_s") + lit(1L))
    val varU = n1 * n2 / 12.0 * ((col("bign") + 1).cast("double") -
      col("tsum").cast("double") /
      (col("bign").cast("double") * (col("bign") - 1).cast("double")))
    val z = when(varU <= 0.0, lit(0.0))
      .otherwise((u2.cast("double") - n1 * n2) / (lit(2.0) * sqrt(varU)))
    perSrc.select(
      col("source"),
      col("n_s").as("n"),
      u2.as("u2"),
      round(z * 1e6).cast("long").as("z_micro"),
      (abs(z) > 1.96).as("shifted")
    )
  }

  /** q318: Kruskal-Wallis k-sample rank test — ONE test for "does
    * ANY source's quality distribution differ", completing the rank
    * family: q283 tests each source against the rest (k two-sample
    * tests needing q284's FDR control); KW asks the omnibus question
    * first, and only a significant H justifies the per-source hunt.
    * Built on the SAME doubled-average-rank machinery as q283
    * (exact-integer rank sums), with the tie-corrected
    * H_c = H / (1 − ΣT/(N³−N)) and a Wilson-Hilferty normal
    * approximation for the χ²_{k−1} tail (identical closed form on
    * both engines — neither ships a χ² CDF).
    *
    * Scale: the bounded quantized-value rank frames; per-source
    * sums map-side combined; the H assembly is |sources|-row math.
    */
  def kruskalWallis(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .select(col("doc_id"), col("source"))
      .join(
        TextAnalysis.qualityMicroScoresFrom(docs)
          .select(col("doc_id"), col("q_micro").as("qm")),
        "doc_id"
      )
    val wg = Window
      .orderBy(col("qm").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gv = scored
      .groupBy(col("qm"))
      .agg(count(lit(1)).as("gcnt"))
      .withColumn("gcum", sum(col("gcnt")).over(wg))
      .withColumn(
        "rank2",
        lit(2L) * (col("gcum") - col("gcnt")) + col("gcnt") + lit(1L)
      )
    val ties = broadcast(
      gv.agg(
        sum(col("gcnt") * col("gcnt") * col("gcnt") - col("gcnt"))
          .as("tsum"),
        sum(col("gcnt")).as("bign")
      )
    )
    val perSrc = scored
      .groupBy(col("source"), col("qm"))
      .agg(count(lit(1)).as("scnt"))
      .join(gv.select(col("qm"), col("rank2")), "qm")
      .groupBy(col("source"))
      .agg(
        sum(col("scnt")).as("n_s"),
        sum(col("scnt") * col("rank2")).as("r2")
      )
    val k = broadcast(perSrc.agg(count(lit(1)).as("k")))
    val nD = col("bign").cast("double")
    // H = 3/(N(N+1))·Σ r2_s²/n_s − 3(N+1)   (r2 = 2·rank sums)
    val hTerm = col("r2").cast("double") * col("r2") / col("n_s")
    val assembled = perSrc
      .crossJoin(ties)
      .crossJoin(k)
      .withColumn("h_term", hTerm)
    val hAgg = broadcast(
      assembled
        .groupBy(col("bign"), col("tsum"), col("k"))
        .agg(sum(col("h_term")).as("sum_term"))
        .withColumn(
          "h",
          lit(3.0) * col("sum_term") /
            (col("bign").cast("double") * (col("bign") + 1)) -
            lit(3.0) * (col("bign") + 1).cast("double")
        )
        .withColumn(
          "hc",
          col("h") / (lit(1.0) - col("tsum").cast("double") /
            (col("bign").cast("double") * col("bign") * col("bign") -
              col("bign")))
        )
        .withColumn("df", (col("k") - 1).cast("double"))
        // Wilson-Hilferty: (Hc/df)^(1/3) ~ N(1 - 2/(9df), 2/(9df))
        .withColumn(
          "z",
          (pow(col("hc") / col("df"), 1.0 / 3.0) -
            (lit(1.0) - lit(2.0) / (lit(9.0) * col("df")))) /
            sqrt(lit(2.0) / (lit(9.0) * col("df")))
        )
        .select(col("h"), col("hc"), col("df"), col("z"))
    )
    perSrc
      .crossJoin(hAgg)
      .select(
        col("source"),
        col("n_s").as("n"),
        graft.functions.IntMath
          .idivHalfUp(col("r2") * lit(1000L), lit(2L) * col("n_s"))
          .as("mean_rank_milli"),
        round(col("h") * 1e3).cast("long").as("h_milli"),
        round(col("hc") * 1e3).cast("long").as("hc_milli"),
        col("df").cast("long").as("df"),
        round(col("z") * 1e3).cast("long").as("z_milli"),
        (col("z") > 1.645).as("significant")
      )
  }

  /** q284: Benjamini-Hochberg FDR control over the per-source KS
    * drift battery — q279 flags each source at a FIXED α, which at
    * hundreds of sources (the 100 TB reality) fires ~5% of clean
    * sources every audit; BH step-up bounds the FALSE DISCOVERY RATE
    * instead, the standard fix for a monitoring battery. p-values use
    * the asymptotic two-sample KS tail 2·exp(−2d²·nₑ) (one exp call,
    * identical on both engines), micro-quantized BEFORE the step-up
    * so the decision `p·m ≤ i·α` is evaluated in EXACT integer
    * arithmetic: p_micro·m·20 ≤ i·10⁶ at α=0.05. Rejects every rank
    * ≤ the largest passing rank (step-up, not step-down).
    *
    * Scale: the KS core's cost (bounded value-domain cumsums); the
    * step-up runs on the |sources|-row battery — a bounded frame, so
    * its single-partition window is safe by construction.
    */
  def ksDriftFdr(spark: SparkSession, dir: String): DataFrame = {
    val ne = col("n_s").cast("double") * col("bign") /
      (col("n_s") + col("bign")).cast("double")
    // d rebuilt from the exact integer sup numerator (identical
    // doubles both engines); the one exp stays — its micro
    // quantization is the only non-integer step left here, shared
    // verbatim with the oracle
    val d = col("dnum").cast("double") /
      (col("n_s") * col("bign")).cast("double")
    val p = least(
      lit(1.0),
      lit(2.0) * exp(lit(-2.0) * d * d * ne)
    )
    val withP = ksPerSource(spark, dir)
      .select(
        col("source"),
        col("n_s").as("n"),
        graft.functions.IntMath
          .microRatio(col("dnum"), col("n_s") * col("bign"))
          .as("ks_micro"),
        round(p * 1e6).cast("long").as("p_micro")
      )
    val m = broadcast(withP.agg(count(lit(1)).as("m")))
    val wr = Window.orderBy(col("p_micro").asc, col("source").asc)
    val wall = Window
      .orderBy(col("p_micro").asc, col("source").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    withP
      .crossJoin(m)
      .withColumn("bh_rank", row_number().over(wr).cast("long"))
      .withColumn(
        "kmax",
        max(
          when(
            col("p_micro") * col("m") * 20 <= col("bh_rank") * lit(1000000L),
            col("bh_rank")
          )
        ).over(wall)
      )
      .select(
        col("source"),
        col("n"),
        col("ks_micro"),
        col("p_micro"),
        col("bh_rank"),
        (col("bh_rank") <= coalesce(col("kmax"), lit(0L))).as("rejected")
      )
  }

  /** q285: Theil-T decomposition of the corpus token mass — overall
    * inequality split EXACTLY into between-source and within-source
    * components (T = T_between + Σ_s share_s·T_within_s), which
    * Gini (q247) cannot do. The between term answers "is the token
    * budget concentrated in a few sources?" and the within terms
    * rank sources by internal doc-size concentration — the two
    * levers (per-source caps vs per-doc caps, q144/q205) attack
    * different components, so this table says which lever to pull.
    *
    * Determinism: each doc's within summand (x/μ_s)·ln(x/μ_s) is
    * nano-quantized to BIGINT before summation (order-free exact
    * integer sums, the q259 convention); the ln argument is the
    * exact-integer ratio x·n_s/Σ_s. Between terms are |sources|-row
    * arithmetic. Zero-token docs are excluded (ln domain), counted
    * in `n_zero`.
    *
    * Scale: one tokenize scan + one per-source agg for the moments,
    * one broadcast of the |sources|-row frame back across the scan
    * for the summands — nothing grows past the scan.
    */
  def theilDecomposition(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long")
          .as("x")
      )
    val src = d
      .groupBy(col("source"))
      .agg(
        sum(when(col("x") > 0, 1L).otherwise(0L)).as("n_s"),
        sum(when(col("x") === 0, 1L).otherwise(0L)).as("n_zero"),
        sum(col("x")).as("sum_s")
      )
    val tot = broadcast(
      src.agg(
        sum(col("n_s")).as("bign"),
        sum(col("sum_s")).as("tot")
      )
    )
    // per-doc within summand, nano-quantized: (x/μ_s)·ln(x/μ_s) with
    // μ_s = sum_s/n_s, i.e. ratio = x·n_s/sum_s
    val ratio = (col("x") * col("n_s")).cast("double") / col("sum_s")
    val within = d
      .filter(col("x") > 0)
      .join(broadcast(src.select(col("source"), col("n_s"), col("sum_s"))),
        "source")
      .select(
        col("source"),
        round(ratio * log(ratio) * 1e9).cast("long").as("t_nano")
      )
      .groupBy(col("source"))
      .agg(sum(col("t_nano")).as("t_sum"))
    val share = col("sum_s").cast("double") / col("tot")
    val meanRatio = (col("sum_s") * col("bign")).cast("double") /
      (col("n_s") * col("tot")).cast("double")
    val withinT = col("t_sum").cast("double") / (col("n_s").cast("double") * 1e9)
    src
      .join(within, "source")
      .crossJoin(tot)
      .select(
        col("source"),
        col("n_s").as("n_docs"),
        col("n_zero"),
        graft.functions.IntMath
          .microRatio(col("sum_s"), col("tot")).as("tok_share_ppm"),
        graft.functions.IntMath
          .idivHalfUpSigned(col("t_sum"), col("n_s") * lit(1000000L))
          .as("within_milli"),
        round(share * log(meanRatio) * 1e3).cast("long").as("between_milli"),
        // share·within·1e3 = sum_s·t_sum/(tot·n_s·1e6): two-step
        // exact division (inner value ≈ within·1e9) keeps BIGINTs
        // under 2^63 at any corpus size (round-9 seam)
        graft.functions.IntMath.idivHalfUpSigned(
          col("sum_s") * graft.functions.IntMath
            .idivHalfUpSigned(col("t_sum"), col("n_s")),
          col("tot") * lit(1000000L)
        ).as("contrib_milli")
      )
  }

  /** q287: quality-threshold yield frontier — for each candidate cut
    * q ≥ k/10 (k = 0…9), the documents kept, tokens kept, kept-token
    * share, and mean quality of the kept set. q258's deciles answer
    * "what quality level does the d-th token sit at"; this is the
    * decision table read the other way: "if I cut at 0.4, what do I
    * pay in tokens and gain in mean quality" — the frontier a mix
    * planner walks before fixing the gate threshold (and the
    * corpus-level twin of q229's per-gate ablation).
    *
    * Exactness: docs are bucketed by the micro-quantized score
    * (bucket = ⌊q_micro/10⁵⌋ clamped to 9, so `q ≥ k/10` ⇔
    * `bucket ≥ k` exactly); the frontier is a 10×10 bucket×threshold
    * join over exact integer sums — no per-corpus-row float ever.
    *
    * Scale: one tokenize+score scan → 10-row bucket agg (map-side
    * combined); everything after is constant-size arithmetic.
    */
  def qualityYieldCurve(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .select(
        col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long")
          .as("x")
      )
      .join(
        TextAnalysis.qualityMicroScoresFrom(docs)
          .select(col("doc_id"), col("q_micro").as("qm")),
        "doc_id"
      )
    val buckets = scored
      .groupBy(
        least(floor(col("qm") / lit(100000.0)).cast("long"), lit(9L))
          .as("b")
      )
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("x")).as("n_toks"),
        sum(col("qm")).as("qm_sum")
      )
    val tot = broadcast(buckets.agg(sum(col("n_toks")).as("tot_toks")))
    val thr = spark.range(0, 10).select(col("id").as("k"))
    thr
      .join(broadcast(buckets), col("b") >= col("k"), "left")
      .groupBy(col("k"))
      .agg(
        coalesce(sum(col("n_docs")), lit(0L)).as("docs_kept"),
        coalesce(sum(col("n_toks")), lit(0L)).as("toks_kept"),
        coalesce(sum(col("qm_sum")), lit(0L)).as("qm_kept")
      )
      .crossJoin(tot)
      .select(
        col("k").as("thr_decile"),
        col("docs_kept"),
        col("toks_kept"),
        graft.functions.IntMath
          .microRatio(col("toks_kept"), col("tot_toks"))
          .as("tok_share_ppm"),
        when(col("docs_kept") === 0L, lit(0L))
          .otherwise(
            graft.functions.IntMath
              .idivHalfUp(col("qm_kept"), col("docs_kept"))
          ).as("mean_q_micro")
      )
  }

  /** q289: Kish effective sample size of the q132 temperature mix —
    * the mix plan gives language l the normalized weight
    * q_l ∝ p_l^α; training on that mix repeats each of its n_l docs
    * r_l = q_l·B/n_l times, and the effective number of DISTINCT
    * samples behind the weighted corpus is ESS = 1/Σ_l q_l²/n_l
    * (Kish). A mix that looks balanced in weights can have a tiny
    * ESS when a low-resource language is upsampled hard — `rep_micro`
    * names the offender (epochs over that language's data), and
    * `ess_ppm` (ESS/corpus) is the single number to watch as α moves
    * (α=1 → ESS=N, α=0 → harmonic-mean collapse). Same α=0.3,
    * budget=0.5 as the gated q132 so the two tables line up.
    *
    * Determinism: the per-language ESS terms q_l²/n_l are
    * femto-quantized to BIGINT before the cross-language sum (the
    * |langs|-row float-sum is the only order-sensitive step; q132's
    * qs sum is replayed identically on both engines).
    *
    * Scale: one (lang) count agg; everything else is |langs|-row
    * arithmetic — the corpus is scanned once, never shuffled.
    */
  def mixEffectiveSampleSize(
      spark: SparkSession,
      dir: String,
      alpha: Double = 0.3,
      budgetFrac: Double = 0.5
  ): DataFrame = {
    val perLang = Tables
      .documents(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = broadcast(perLang.agg(sum(col("n_docs")).cast("double").as("tot")))
    val qraw = perLang
      .crossJoin(tot)
      .select(
        col("lang"),
        col("n_docs"),
        col("tot"),
        pow(col("n_docs") / col("tot"), alpha).as("qr")
      )
    val qsum = broadcast(qraw.agg(sum(col("qr")).as("qs")))
    val qn = col("qr") / col("qs")
    val terms = qraw
      .crossJoin(qsum)
      .select(
        col("lang"),
        col("n_docs"),
        col("tot"),
        qn.as("q"),
        round(qn * qn / col("n_docs") * 1e15).cast("long").as("t_femto")
      )
    val essSum = broadcast(terms.agg(sum(col("t_femto")).as("f_sum")))
    terms
      .crossJoin(essSum)
      .select(
        col("lang"),
        col("n_docs"),
        round(col("q") * 1e6).cast("long").as("q_ppm"),
        round(lit(budgetFrac) * col("tot") * col("q") / col("n_docs") * 1e6)
          .cast("long").as("rep_micro"),
        graft.functions.IntMath
          .idivHalfUp(lit(1000000000000000L), col("f_sum"))
          .as("ess_docs"),
        // milli-doc intermediate keeps the ppm exact to ±0.1 while
        // every step stays in BIGINT (round-9 seam)
        graft.functions.IntMath
          .idivHalfUp(
            graft.functions.IntMath
              .idivHalfUp(lit(1000000000000000000L), col("f_sum")) *
              lit(1000L),
            col("tot"))
          .as("ess_ppm")
      )
  }

  /** q332: rate-matched per-language quality thresholds — the
    * corpus-level quality gate q ≥ 0.3 passes some global rate r;
    * per language, the threshold that would pass the SAME rate r of
    * that language's docs (the exact value at rank ⌈(1−r)·n_l⌉ in
    * ascending order). Absolute thresholds don't transfer across
    * languages (the q197/q127 lesson); rate-matching is the
    * group-parity calibration a multilingual gate ships with, and
    * the delta column says which languages the global cut was
    * quietly starving or flooding. Exact rank statistics over the
    * quantized value domain (the q293 construction).
    *
    * Scale: value-domain cumsums per language (bounded), one
    * broadcast global-rate row.
    */
  def rateMatchedThresholds(
      spark: SparkSession,
      dir: String
  ): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .select(col("doc_id"), col("lang"))
      .join(
        TextAnalysis.qualityMicroScoresFrom(docs)
          .select(col("doc_id"), col("q_micro").as("qm")),
        "doc_id"
      )
    // global pass count at the shipped cut (q >= 0.3)
    val global = broadcast(
      scored.agg(
        count(lit(1)).as("bign"),
        sum(when(col("qm") >= 300000L, 1L).otherwise(0L)).as("kept")
      )
    )
    val ws = Window
      .partitionBy(col("lang"))
      .orderBy(col("qm").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sv = scored
      .groupBy(col("lang"), col("qm"))
      .agg(count(lit(1)).as("scnt"))
      .withColumn("scum", sum(col("scnt")).over(ws))
    val ns = broadcast(
      scored.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
    )
    // drop count per language d_l = n_l - ceil(r * n_l), with
    // r = kept/bign evaluated as exact integer cross products:
    // threshold = min qm with 10^? ... scum >= d_l where
    // d_l = n_l - floor(kept * n_l / bign)  (kept docs rounded down
    // keeps the matched rate conservative; mirrored in the oracle)
    val withD = sv
      .join(ns, "lang")
      .crossJoin(global)
      .withColumn("kept_l", expr("(kept * n_l) div bign"))
      .withColumn("d_l", col("n_l") - col("kept_l"))
    val thr = withD
      // the (d_l + 1)-th smallest value: the first KEPT doc's score
      .filter(col("scum") >= col("d_l") + 1)
      .groupBy(col("lang"))
      .agg(min(col("qm")).as("thr_micro"))
    ns.join(thr, "lang")
      .crossJoin(global)
      .select(
        col("lang"),
        col("n_l").as("n"),
        graft.functions.IntMath.microRatio(col("kept"), col("bign"))
          .as("global_rate_ppm"),
        col("thr_micro"),
        (col("thr_micro") - lit(300000L)).as("delta_micro")
      )
  }

  /** q337: length↔quality slope heterogeneity — per source, the
    * exact OLS slope of quality (micro) on token count, its
    * residual-based standard error, and the z of its deviation from
    * the POOLED slope. q249 says the corpus-level coupling exists;
    * this asks whether it is the SAME coupling everywhere — a
    * source whose slope diverges breaks any length-normalization
    * applied globally (q299's standardization assumes shared
    * stratum effects). All regression moments are exact integer
    * sums; slopes/SEs are assembled in doubles and micro-quantized.
    *
    * Scale: one scan → per-source 5-moment agg (map-side), then
    * |sources|-row assembly; the pooled slope is the same moments
    * summed once more.
    */
  def slopeHeterogeneity(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .select(
        col("doc_id"),
        col("source"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long")
          .as("x")
      )
      .join(
        TextAnalysis.qualityMicroScoresFrom(docs)
          .select(col("doc_id"), col("q_micro").as("y")),
        "doc_id"
      )
    val mom = scored
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sx2"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("sy2")
      )
    val nD = col("n").cast("double")
    val sxx = nD * col("sx2") - col("sx").cast("double") * col("sx")
    val sxy = nD * col("sxy") - col("sx").cast("double") * col("sy")
    val syy = nD * col("sy2") - col("sy").cast("double") * col("sy")
    val b = sxy / sxx
    // residual variance from the moment identity:
    // SSE = (Syy - b*Sxy) / n ; SE(b)^2 = SSE/(n-2) / (Sxx/n)
    val se = sqrt(
      greatest(lit(0.0), ((syy - b * sxy) / nD) / (nD - 2) / (sxx / nD))
    )
    val pooled = broadcast(
      mom
        .agg(
          sum(col("n")).as("n"),
          sum(col("sx")).as("sx"),
          sum(col("sy")).as("sy"),
          sum(col("sx2")).as("sx2"),
          sum(col("sxy")).as("sxy")
        )
        .select(
          ((col("n").cast("double") * col("sxy") -
            col("sx").cast("double") * col("sy")) /
            (col("n").cast("double") * col("sx2") -
              col("sx").cast("double") * col("sx"))).as("b_pool"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("p_num"),
          (col("n") * col("sx2") - col("sx") * col("sx")).as("p_den")
        )
    )
    val z = when(se === 0.0, lit(0.0))
      .otherwise((b - col("b_pool")) / se)
    // slopes emitted via the two-step exact division (reduce the
    // integer denominator to its micro share first, then one signed
    // half-up divide): numI·1e6 overflows 2^63 at source scale, and
    // the one-shot double quotient can land exactly on .5 (round-9)
    import graft.functions.IntMath.{idivHalfUp, idivHalfUpSigned}
    val numI = col("n") * col("sxy") - col("sx") * col("sy")
    val denR = greatest(
      idivHalfUp(col("n") * col("sx2") - col("sx") * col("sx"),
        lit(1000000L)),
      lit(1L))
    mom
      .filter(col("n") > 2 && sxx > 0.0)
      .crossJoin(pooled)
      .select(
        col("source"),
        col("n"),
        idivHalfUpSigned(numI, denR).as("slope_micro_per_tok"),
        idivHalfUpSigned(
          col("p_num"),
          greatest(idivHalfUp(col("p_den"), lit(1000000L)), lit(1L))
        ).as("pooled_micro"),
        round(se * 1e6).cast("long").as("se_micro"),
        round(z * 1e3).cast("long").as("z_milli"),
        coalesce(abs(z) > 3.0, lit(false)).as("divergent")
      )
  }

  /** q339: Theil-Sen robust trend per source — the MEDIAN of all
    * pairwise bucket-mean slopes (micro-quantized per pair, exact
    * rank median), next to q259's OLS slope. One contaminated
    * bucket (an ingestion hiccup) swings OLS but not the pairwise
    * median; at ≤ P buckets per source the pair set is P(P−1)/2 —
    * bounded by construction, never corpus rows. Disagreement
    * between the two slope columns IS the finding: it localizes
    * trend estimates that are artifacts of single buckets.
    *
    * Scale: bucket means (one agg), per-source pair explode over
    * ≤ P² bounded rows, one rank window per source.
    */
  def theilSenTrend(
      spark: SparkSession,
      dir: String,
      bucketSize: Int = 50
  ): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bucketMeans = docs
      .select(
        col("doc_id"),
        col("source"),
        (col("doc_id") / lit(bucketSize)).cast("long").as("b")
      )
      .join(TextAnalysis.qualityMicroScoresFrom(docs), "doc_id")
      .groupBy(col("source"), col("b"))
      // exact integer bucket mean (round-9 seam)
      .agg(graft.functions.IntMath
        .idivHalfUp(sum(col("q_micro")), count(lit(1))).as("mqm"))
    val pairs = bucketMeans
      .join(
        bucketMeans.select(
          col("source"),
          col("b").as("b2"),
          col("mqm").as("mqm2")
        ),
        Seq("source")
      )
      .filter(col("b2") > col("b"))
      .select(
        col("source"),
        // signed half-up integer pair slope (round-9 seam)
        graft.functions.IntMath
          .idivHalfUpSigned(col("mqm2") - col("mqm"), col("b2") - col("b"))
          .as("slope_micro")
      )
    val w = Window
      .partitionBy(col("source"))
      .orderBy(col("slope_micro").asc)
    pairs
      .withColumn("rn", row_number().over(w))
      .withColumn(
        "cnt",
        count(lit(1)).over(Window.partitionBy(col("source")))
      )
      .filter(col("rn") === ceil(col("cnt") / 2))
      .select(
        col("source"),
        col("cnt").as("n_pairs"),
        col("slope_micro").as("ts_slope_micro")
      )
  }

  /** q336: Brown-Forsythe scale test — the variance-equality
    * complement that completes the distributional battery: KW/q318
    * tests location, q279 shape, q281 normality, and this tests
    * SPREAD, on |q − median_s| deviations so it survives the heavy
    * tails q306 documents (classic Levene uses means and doesn't).
    * Unequal spreads invalidate pooled-variance machinery (q298's
    * n*, q295's pooled test), so this verdict gates those. Built on
    * exact integer deviations from the exact lower median, the
    * q281 integer-pivot moment convention, and the Wilson-Hilferty
    * tail on (k−1)·F ≈ χ²_{k−1}.
    *
    * Scale: one per-source rank window for the median (bounded /
    * two-level), two moment aggregates, |sources|-row assembly.
    */
  def brownForsythe(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .select(col("doc_id"), col("source"))
      .join(
        TextAnalysis.qualityMicroScoresFrom(docs)
          .select(col("doc_id"), col("q_micro").as("qm")),
        "doc_id"
      )
    val w = Window
      .partitionBy(col("source"))
      .orderBy(col("qm").asc, col("doc_id").asc)
    val med = scored
      .withColumn("rn", row_number().over(w))
      .withColumn(
        "cnt",
        count(lit(1)).over(Window.partitionBy(col("source")))
      )
      .filter(col("rn") === ceil(col("cnt") / 2))
      .select(col("source"), col("qm").as("med_micro"))
    val devs = scored
      .join(broadcast(med), "source")
      .withColumn("z", abs(col("qm") - col("med_micro")))
    val perSrc = devs
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_s"),
        max(col("med_micro")).as("med_micro"),
        graft.functions.IntMath.idivHalfUpSigned(sum(col("z")), count(lit(1))).as("m_s"),
        sum(col("z")).as("z_sum")
      )
    val withinAgg = devs
      .join(broadcast(perSrc.select(col("source"), col("m_s"))), "source")
      .select(
        col("source"),
        ((col("z") - col("m_s")) * (col("z") - col("m_s"))).as("w2")
      )
      .groupBy(col("source"))
      .agg(sum(col("w2")).as("within_s"))
    val grand = broadcast(
      perSrc.agg(
        sum(col("n_s")).as("bign"),
        round(
          sum(col("z_sum")).cast("double") / sum(col("n_s"))
        ).cast("long").as("m_all"),
        count(lit(1)).as("k")
      )
    )
    val assembled = perSrc
      .join(withinAgg, "source")
      .crossJoin(grand)
      .withColumn(
        "btw_s",
        col("n_s") * (col("m_s") - col("m_all")) *
          (col("m_s") - col("m_all"))
      )
    val sums = broadcast(
      assembled
        .groupBy(col("bign"), col("k"))
        .agg(sum(col("btw_s")).as("btw"), sum(col("within_s")).as("win"))
        .withColumn(
          "f",
          (col("bign") - col("k")).cast("double") /
            (col("k") - 1).cast("double") *
            col("btw").cast("double") / col("win").cast("double")
        )
        .withColumn("df", (col("k") - 1).cast("double"))
        .withColumn(
          "z_wh",
          (pow(col("f") * (col("k") - 1).cast("double") / col("df"),
            1.0 / 3.0) -
            (lit(1.0) - lit(2.0) / (lit(9.0) * col("df")))) /
            sqrt(lit(2.0) / (lit(9.0) * col("df")))
        )
        .select(col("f"), col("df"), col("z_wh"))
    )
    perSrc
      .crossJoin(sums)
      .select(
        col("source"),
        col("n_s").as("n"),
        col("med_micro"),
        col("m_s").as("mean_dev_micro"),
        round(col("f") * 1e3).cast("long").as("f_milli"),
        col("df").cast("long").as("df"),
        round(col("z_wh") * 1e3).cast("long").as("z_milli"),
        (col("z_wh") > 1.645).as("spreads_differ")
      )
  }

  /** q343: holdout representativeness — per source, the q310
    * holdout's mean quality vs the remaining training mass, with the
    * two-sample z on the exact integer-pivot variances. A holdout
    * that drifts from its train distribution measures the wrong
    * thing (the coverage floor guarantees cell PRESENCE, not
    * representativeness — this audits the part the floor can't).
    * Hash selection should pass everywhere; a failure here means
    * the source's quality correlates with the selection hash's
    * input ordering — a generator bug worth catching.
    *
    * Scale: the q310 rank selection + two moment aggregates.
    */
  def holdoutRepresentativeness(
      spark: SparkSession,
      dir: String
  ): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val held = coverageHoldoutFlags(spark, dir)
    val scored = held
      .join(
        TextAnalysis.qualityMicroScoresFrom(docs)
          .select(col("doc_id"), col("q_micro").as("qm")),
        "doc_id"
      )
    val agg = scored
      .groupBy(col("source"))
      .agg(
        sum(when(col("held_out"), 1L).otherwise(0L)).as("n_h"),
        sum(when(col("held_out"), col("qm")).otherwise(0L)).as("s_h"),
        sum(when(col("held_out"), col("qm") * col("qm")).otherwise(0L))
          .as("s2_h"),
        sum(when(!col("held_out"), 1L).otherwise(0L)).as("n_t"),
        sum(when(!col("held_out"), col("qm")).otherwise(0L)).as("s_t"),
        sum(when(!col("held_out"), col("qm") * col("qm"))
          .otherwise(0L)).as("s2_t")
      )
      .filter(col("n_h") > 1 && col("n_t") > 1)
    val mh = col("s_h").cast("double") / col("n_h")
    val mt = col("s_t").cast("double") / col("n_t")
    val vh = col("s2_h").cast("double") / col("n_h") - mh * mh
    val vt = col("s2_t").cast("double") / col("n_t") - mt * mt
    val se = sqrt(vh / col("n_h") + vt / col("n_t"))
    val z = when(se === 0.0, lit(0.0)).otherwise((mh - mt) / se)
    agg.select(
      col("source"),
      col("n_h"),
      col("n_t"),
      round(mh).cast("long").as("holdout_micro"),
      round(mt).cast("long").as("train_micro"),
      round(z * 1e3).cast("long").as("z_milli"),
      coalesce(abs(z) > 3.0, lit(false)).as("unrepresentative")
    )
  }

  /** The q310 selection as per-doc flags — shared by the holdout
    * audit (q343) so the two queries can never disagree on
    * membership.
    */
  private[operators] def coverageHoldoutFlags(
      spark: SparkSession,
      dir: String,
      frac: Double = 0.05,
      minK: Long = 5L
  ): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        col("lang"),
        graft.functions.TextFunctions.hash60(col("doc_id")).as("h")
      )
    val cellN = docs
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_cell"))
      .withColumn(
        "k_target",
        least(
          col("n_cell"),
          greatest(lit(minK), round(col("n_cell") * frac).cast("long"))
        )
      )
    val w = Window
      .partitionBy(col("source"), col("lang"))
      .orderBy(col("h").asc, col("doc_id").asc)
    docs
      .join(broadcast(cellN), Seq("source", "lang"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .select(
        col("doc_id"),
        col("source"),
        col("lang"),
        (col("rk") <= col("k_target")).as("held_out")
      )
  }

  /** q360: net trainable tokens — THE headline number, assembled
    * from the audited stages in one row: corpus docs/tokens, tokens
    * after exact dedup (md5 survivors), after near-dup dedup (the
    * q78 keep-best closure), and after the four-gate battery
    * (gates vote where defined: the LM gates only score ≥3-token
    * docs, so short docs are judged by gopher+lr alone — the rule
    * spelled out here and mirrored in the oracle). Every upstream
    * stage is an already-gated operator reached through its public
    * seam; this query is the ledger a budget meeting opens with.
    *
    * Scale: honest recomputation of the dedup closure and gate
    * chains (at 100 TB each is a persisted artifact; the `*From`
    * seams exist) + one token scan; output is one row.
    */
  def trainableTokens(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // exact-dup keep flag as a window over the content hash — NOT a
    // broadcast join: the survivor set is one row per distinct text,
    // i.e. corpus-sized by construction, and broadcasting it is a
    // driver OOM at web scale. The hash-partitioned window shuffles
    // once on md5(text) and carries the token count along, so the
    // exact-dedup stage adds no second scan either.
    val wH = Window.partitionBy(md5(col("text")))
    val toks = docs
      .select(
        col("doc_id"),
        col("text"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long")
          .as("tk")
      )
      .withColumn("exact_keep", min(col("doc_id")).over(wH) === col("doc_id"))
      .select(col("doc_id"), col("tk"), col("exact_keep"))
    // near-dup survivors: the q78 keep-best rule over the closure.
    // |closure|-row frame whose lineage is the pair join + pointer-
    // doubling CC; the keep-best aggregate AND the closure-membership
    // join both read it — cache so the chain derives once
    val labels = Dedup
      .dedupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
      .cacheTracked()
    val nearKeep = labels
      .join(
        TextAnalysis.qualityMicroScores(spark, dir)
          .select(col("doc_id"), col("q_micro").as("q")),
        "doc_id"
      )
      .groupBy(col("cluster_id"))
      .agg(max(struct(col("q"), (-col("doc_id")).as("nid"))).as("best"))
      .select((-col("best.nid")).as("doc_id"), lit(true).as("near_keep"))
    // gate votes where defined (LM gates cover >= 3-token docs)
    val gateKeep = TextAnalysis
      .gateFlagsPublic(spark, dir)
      .groupBy(col("doc_id"))
      .agg(sum(when(!col("f"), 1L).otherwise(0L)).as("n_fail"))
      .select(col("doc_id"), (col("n_fail") === 0L).as("gates_keep"))
    val assembled = toks
      .join(labels.select(col("doc_id"), lit(true).as("in_closure")),
        Seq("doc_id"), "left")
      .join(nearKeep, Seq("doc_id"), "left")
      .join(gateKeep, Seq("doc_id"), "left")
      .select(
        col("tk"),
        col("exact_keep").as("ek"),
        // docs outside the shingle closure keep themselves
        (coalesce(col("near_keep"), lit(false)) ||
          col("in_closure").isNull).as("nk"),
        coalesce(col("gates_keep"), lit(false)).as("gk")
      )
    assembled.agg(
      count(lit(1)).as("n_docs"),
      sum(col("tk")).as("total_tokens"),
      sum(when(col("ek"), col("tk")).otherwise(0L))
        .as("after_exact_dedup"),
      sum(when(col("ek") && col("nk"), col("tk")).otherwise(0L))
        .as("after_near_dedup"),
      sum(when(col("ek") && col("nk") && col("gk"), col("tk"))
        .otherwise(0L)).as("trainable_tokens")
    ).select(
      col("n_docs"),
      col("total_tokens"),
      col("after_exact_dedup"),
      col("after_near_dedup"),
      col("trainable_tokens"),
      graft.functions.IntMath
        .microRatio(col("trainable_tokens"), col("total_tokens"))
        .as("trainable_ppm")
    )
  }

  /** q352: source run lengths in storage order — per source, how
    * many consecutive-doc_id runs it forms and the mean run length.
    * The categorical twin of q333's quality ACF: long runs mean
    * sequential readers see one source for thousands of steps
    * (gradient clumping), which q245's interleave exists to fix —
    * this measures whether the RAW layout needs it. Run starts are
    * detected by the shifted equi-join on doc_id − 1 (no global
    * window); all counts exact.
    *
    * Scale: one co-partitioned self-join + a |sources|-row agg.
    */
  def sourceRunLengths(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"))
    val withPrev = d
      .join(
        d.select(
          (col("doc_id") + 1).as("doc_id"),
          col("source").as("prev_source")
        ),
        Seq("doc_id"),
        "left"
      )
      .withColumn(
        "run_start",
        col("prev_source").isNull || col("prev_source") =!= col("source")
      )
    withPrev
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("run_start"), 1L).otherwise(0L)).as("n_runs")
      )
      .select(
        col("source"),
        col("n_docs"),
        col("n_runs"),
        graft.functions.IntMath
          .idivHalfUp(col("n_docs") * lit(1000L), col("n_runs"))
          .as("mean_run_milli")
      )
  }

  /** q333: storage-order autocorrelation of quality — the ACF of
    * the quality score over doc_id order at lags 1/10/100. A
    * shuffled corpus shows ≈0 at every lag; structure here means
    * storage order carries quality (crawl batches, per-source
    * dumps), so sequential readers (q191's epoch order, q53's
    * packing) inherit a quality CURRICULUM nobody chose —
    * deliberately choosing one is q243's job. Deviations use the
    * exact integer mean pivot; lag pairs come from shifted
    * equi-joins on doc_id (no global window), so the plan is a
    * co-partitioned self-join at any scale.
    */
  def qualityOrderAcf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .select(col("doc_id"))
      .join(
        TextAnalysis.qualityMicroScoresFrom(docs)
          .select(col("doc_id"), col("q_micro").as("qm")),
        "doc_id"
      )
    val mean = broadcast(
      scored.agg(graft.functions.IntMath.idivHalfUpSigned(sum(col("qm")), count(lit(1))).as("m"))
    )
    val dev = scored
      .crossJoin(mean)
      .select(col("doc_id"), (col("qm") - col("m")).as("d"))
      .cacheTracked()
    val den = broadcast(
      dev.agg(sum(col("d") * col("d")).as("den"))
    )
    Seq(1L, 10L, 100L)
      .map { lag =>
        dev
          .join(
            dev.select(
              (col("doc_id") - lag).as("doc_id"),
              col("d").as("dl")
            ),
            "doc_id"
          )
          .agg(
            count(lit(1)).as("n_pairs"),
            sum(col("d") * col("dl")).as("num")
          )
          .crossJoin(den)
          .select(
            lit(lag).as("lag"),
            col("n_pairs"),
            when(col("den") === 0L, lit(0L))
              .otherwise(
                graft.functions.IntMath.idivHalfUpSigned(
                  col("num") * lit(1000000L), col("den"))
              ).as("acf_micro"),
            // |num/den| < 0.05 as the exact cross-mult 20|num| < den
            (col("den") =!= 0L &&
              lit(20L) * abs(col("num")) < col("den"))
              .as("order_safe")
          )
      }
      .reduce(_.unionByName(_))
  }

  /** q330: k-anonymity census — per source, how many
    * (lang, length-digit) quasi-identifier cells fall below k = 5
    * documents and how many documents those cells hold. The release
    * check before publishing per-cell statistics (q272's cube, the
    * per-cell rates of q322): small cells can identify their members
    * by metadata alone, and the standard remedies (suppress or
    * coarsen) start from exactly this table. Exact integer counts,
    * one division.
    *
    * Scale: one (source, lang, digits) agg — bounded cells; a
    * |sources|-row rollup.
    */
  def kAnonymityCensus(
      spark: SparkSession,
      dir: String,
      k: Long = 5L
  ): DataFrame = {
    val cells = Tables
      .documents(spark, dir)
      .groupBy(
        col("source"),
        col("lang"),
        length(
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long")
            .cast("string")
        ).as("len_digits")
      )
      .agg(count(lit(1)).as("n_cell"))
    cells
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_cells"),
        sum(when(col("n_cell") < k, 1L).otherwise(0L))
          .as("small_cells"),
        sum(col("n_cell")).as("n_docs"),
        sum(when(col("n_cell") < k, col("n_cell")).otherwise(0L))
          .as("docs_at_risk")
      )
      .select(
        col("source"),
        col("n_cells"),
        col("small_cells"),
        col("n_docs"),
        col("docs_at_risk"),
        graft.functions.IntMath
          .microRatio(col("docs_at_risk"), col("n_docs"))
          .as("risk_ppm")
      )
  }

  /** q449: l-diversity census — the sensitive-attribute companion to
    * q330's k-anonymity: group documents by the quasi-identifier
    * (source, n_chars DIV 100 length band) and, per distinct
    * diversity level l = |distinct langs in the cell|, report how
    * many QI cells and documents sit at that level plus the cell-size
    * envelope (Machanavajjhala et al., "l-diversity: privacy beyond
    * k-anonymity", ICDE 2006). k-anonymity says "the cell is big
    * enough to hide in"; l-diversity says "knowing the cell doesn't
    * reveal the sensitive value" — a 100-doc cell that is 100% one
    * language still leaks lang. Cells at l = 1 are the release
    * blockers.
    *
    * Scale: one (source, band, lang) aggregate → one (source, band)
    * rollup → a ≤|distinct-l|-row distribution. All counts exact
    * BIGINT; no window, no collect.
    */
  def lDiversityCensus(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.idiv
    val cells = Tables
      .documents(spark, dir)
      .groupBy(
        col("source"),
        idiv(col("n_chars"), lit(100L)).as("len_band"),
        col("lang")
      )
      .agg(count(lit(1)).as("n"))
      .groupBy(col("source"), col("len_band"))
      .agg(
        count(lit(1)).as("l"),
        sum(col("n")).as("k")
      )
    cells
      .groupBy(col("l"))
      .agg(
        count(lit(1)).as("n_cells"),
        sum(col("k")).as("n_docs"),
        min(col("k")).as("min_cell"),
        max(col("k")).as("max_cell")
      )
  }

  /** q468: k-fold assignment balance audit — documents fall into 5
    * folds by the deterministic md5 bucket (the q49 split
    * convention), and each (source, lang) stratum reports its
    * smallest and largest fold plus the spread. Cross-validation
    * assumes folds are interchangeable WITHIN every stratum; a cell
    * whose spread rivals its per-fold mean makes fold-to-fold metric
    * variance look like model variance. This is the table read
    * before trusting any k-fold eval on the corpus — the k-fold
    * companion to q49 (fixed split) and q310 (coverage floor).
    *
    * Scale: one (source, lang, fold) aggregate → one (source, lang)
    * rollup. Bounded cells, no window.
    */
  def kfoldBalance(spark: SparkSession, dir: String): DataFrame = {
    val byFold = Tables
      .documents(spark, dir)
      .select(
        col("source"),
        col("lang"),
        (graft.functions.TextFunctions.hash60(col("doc_id")) % 5)
          .as("fold")
      )
      .groupBy(col("source"), col("lang"), col("fold"))
      .agg(count(lit(1)).as("n"))
    byFold
      .groupBy(col("source"), col("lang"))
      .agg(
        sum(col("n")).as("n_docs"),
        count(lit(1)).as("n_folds_hit"),
        min(col("n")).as("min_fold_n"),
        max(col("n")).as("max_fold_n")
      )
      .select(
        col("source"),
        col("lang"),
        col("n_docs"),
        col("n_folds_hit"),
        col("min_fold_n"),
        col("max_fold_n"),
        (col("max_fold_n") - col("min_fold_n")).as("spread")
      )
  }

  /** q310: coverage-guaranteed eval holdout — a 5% hash split
    * (q49's construction) with a floor: every (source, lang) cell
    * contributes at least `minK` = 5 docs (or all of them, if the
    * cell is smaller). A plain proportional holdout starves rare
    * cells — an eval set with 2 docs of a language measures nothing
    * — and the floor is what eval-design actually ships. Selection
    * inside a cell is by the deterministic hash ORDER (rank ≤ k),
    * not a ppm threshold, so the realized count hits the target
    * EXACTLY; k = max(minK, round(5%·n)) capped at n.
    *
    * Scale: one scan + a per-cell rank window (bounded by the
    * largest cell; two-level rank beyond) + a |cells|-row audit agg.
    */
  def coverageHoldout(
      spark: SparkSession,
      dir: String,
      frac: Double = 0.05,
      minK: Long = 5L
  ): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        col("lang"),
        graft.functions.TextFunctions.hash60(col("doc_id")).as("h")
      )
    val cellN = docs
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_cell"))
      .withColumn(
        "k_target",
        least(
          col("n_cell"),
          greatest(lit(minK), round(col("n_cell") * frac).cast("long"))
        )
      )
    val w = Window
      .partitionBy(col("source"), col("lang"))
      .orderBy(col("h").asc, col("doc_id").asc)
    docs
      .join(broadcast(cellN), Seq("source", "lang"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("held_out", col("rk") <= col("k_target"))
      .groupBy(col("source"), col("lang"))
      .agg(
        max(col("n_cell")).as("n_cell"),
        max(col("k_target")).as("k_target"),
        sum(when(col("held_out"), 1L).otherwise(0L)).as("n_held"),
        min(when(col("held_out"), col("doc_id"))).as("first_held_doc")
      )
      .select(
        col("source"),
        col("lang"),
        col("n_cell"),
        col("k_target"),
        col("n_held"),
        (col("n_held") === col("k_target")).as("target_met"),
        col("first_held_doc")
      )
  }

  /** q304: PPS systematic token-weighted sample — docs laid out in
    * deterministic hash order, token mass cumulated, and every
    * multiple of the stride T/B (T = total tokens, B = 1000) picks
    * the doc whose interval contains it. Systematic PPS draws
    * EXACTLY B picks with zero variance in the total (Bernoulli ppm
    * gates like q132 only hit the budget in expectation), and
    * big docs can legitimately be picked multiple times (their
    * `sel_count` is the number of stride multiples inside their
    * interval — exactly how PPS-with-replacement weights them). The
    * audit view: realized picks per source against the exact
    * token-share entitlement, deviation in milli-picks.
    *
    * Determinism: the pick test floor(cum·B/T) − floor((cum−n)·B/T)
    * is pure BIGINT arithmetic.
    *
    * Scale: the q164 two-level cumsum (range partition on the hash +
    * per-partition window + P-row offsets frame) — no global
    * window over corpus rows.
    */
  def systematicTokenSample(
      spark: SparkSession,
      dir: String,
      budget: Long = 1000L,
      numParts: Int = 8
  ): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long")
          .as("n_tokens")
      )
      .filter(col("n_tokens") > 0)
      .withColumn("h", graft.functions.TextFunctions.hash60(col("doc_id")))
    val parts = docs
      .repartitionByRange(numParts, col("h").asc, col("doc_id").asc)
      .withColumn("pid", spark_partition_id())
    val wIn = Window
      .partitionBy(col("pid"))
      .orderBy(col("h").asc, col("doc_id").asc)
    val withCum = parts
      .withColumn("cum_in", sum(col("n_tokens")).over(wIn))
      .cacheTracked()
    val offsets = withCum
      .groupBy(col("pid"))
      .agg(max(col("cum_in")).as("ptot"))
      .withColumn(
        "off",
        coalesce(
          sum(col("ptot")).over(
            Window.orderBy(col("pid").asc)
              .rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select(col("pid"), col("off"))
    val tot = broadcast(docs.agg(sum(col("n_tokens")).as("t")))
    val cum = col("cum_in") + col("off")
    withCum
      .join(broadcast(offsets), Seq("pid"))
      .crossJoin(tot)
      .withColumn("hi", cum * lit(budget))
      .withColumn("lo", (cum - col("n_tokens")) * lit(budget))
      // integral div keeps the pick test exact BIGINT arithmetic
      // (a double quotient of ~2^54 products would wobble at exact
      // stride multiples)
      .withColumn("sel", expr("hi div t - lo div t"))
      .select(col("source"), col("n_tokens"), col("sel"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("src_tokens"),
        sum(col("sel")).as("n_sel")
      )
      .crossJoin(tot)
      .select(
        col("source"),
        col("n_docs"),
        col("n_sel"),
        graft.functions.IntMath
          .idivHalfUp(
            col("src_tokens") * lit(budget * 1000L), col("t"))
          .as("expected_milli"),
        (col("n_sel") * 1000 -
          graft.functions.IntMath.idivHalfUp(
            col("src_tokens") * lit(budget * 1000L), col("t")))
          .as("dev_milli")
      )
  }

  /** q305: Neyman allocation with exact Hamilton rounding — the
    * optimal stratified-sampling budget split n_s ∝ N_s·σ_s (survey
    * sampling's variance-minimizing rule) next to the proportional
    * split n_s ∝ N_s, both rounded to integers by the q268
    * largest-remainder method on micro-quantized quotas so each
    * column sums EXACTLY to the budget. Sources where the two
    * columns diverge are where variance lives (q298's underpowered
    * flag tells the same story from the other side); reading them
    * together prices the upgrade from proportional to Neyman before
    * committing an annotation or eval budget.
    *
    * Determinism: σ uses the exact integer-pivot second moment;
    * quotas are micro-quantized BEFORE base/remainder splitting, so
    * Hamilton runs on exact integers (ranking ties broken by
    * source).
    *
    * Scale: two corpus aggregates; everything else is
    * |sources|-row arithmetic and a bounded rank window.
    */
  def neymanAllocation(
      spark: SparkSession,
      dir: String,
      budget: Long = 1000L
  ): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .select(col("doc_id"), col("source"))
      .join(
        TextAnalysis.qualityMicroScoresFrom(docs)
          .select(col("doc_id"), col("q_micro").as("qm")),
        "doc_id"
      )
    val meanF = scored
      .groupBy(col("source"))
      .agg(graft.functions.IntMath.idivHalfUpSigned(sum(col("qm")), count(lit(1))).as("mean_micro"))
    val mom = scored
      .join(broadcast(meanF), "source")
      .withColumn("d", col("qm") - col("mean_micro"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("d") * col("d")).as("s2"))
      .withColumn("sd", sqrt(col("s2").cast("double") / col("n_docs")))
    val wNey = col("n_docs").cast("double") * col("sd")
    val totals = broadcast(
      mom.agg(
        sum(wNey).as("w_ney"),
        sum(col("n_docs")).cast("double").as("w_prop")
      )
    )
    val quotas = mom
      .crossJoin(totals)
      .withColumn(
        "q_ney",
        round(wNey / col("w_ney") * budget * 1e6).cast("long")
      )
      .withColumn(
        "q_prop",
        graft.functions.IntMath.idivHalfUp(
          col("n_docs") * lit(budget * 1000000L),
          col("w_prop").cast("long"))
      )
    def alloc(df: DataFrame, q: String, out: String): DataFrame = {
      val base = (col(q) - col(q) % 1000000L) / 1000000L
      val based = df
        .withColumn(s"base_$out", base.cast("long"))
        .withColumn(s"rem_$out", col(q) % 1000000L)
      val leftover = broadcast(
        based.agg(
          greatest(lit(budget) - sum(col(s"base_$out")), lit(0L))
            .as(s"left_$out")
        )
      )
      val w = Window.orderBy(col(s"rem_$out").desc, col("source").asc)
      based
        .withColumn(s"rk_$out", row_number().over(w).cast("long"))
        .crossJoin(leftover)
        .withColumn(
          out,
          col(s"base_$out") +
            when(col(s"rk_$out") <= col(s"left_$out"), 1L).otherwise(0L)
        )
    }
    val a1 = alloc(quotas, "q_ney", "alloc_neyman")
    val a2 = alloc(a1, "q_prop", "alloc_prop")
    a2.select(
      col("source"),
      col("n_docs"),
      round(col("sd")).cast("long").as("sd_micro"),
      col("q_ney").as("quota_micro"),
      col("alloc_neyman"),
      col("alloc_prop"),
      (col("alloc_neyman") - col("alloc_prop")).as("shift")
    )
  }

  /** q306: Hill tail-index of the per-source document-length
    * distribution — α̂ = k / Σᵢ₌₁..k ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the top
    * k = ⌊n/10⌋ order statistics. α < 2 means infinite-variance
    * heavy tails: per-source token budgets (q164/q304) are then
    * dominated by a few giant docs, mean-based gates misread the
    * source (q292's gap shows the symptom, this names the law), and
    * doc-level caps (q205) are the only stabilizer. Reported for
    * sources with n ≥ 20 (k ≥ 2); summands are nano-quantized BIGINTs
    * (order-free sums), the threshold statistic x₍ₖ₊₁₎ is an exact
    * rank pick.
    *
    * Scale: one per-source rank window (two-level rank at 100 TB),
    * one bounded threshold join, one agg.
    */
  def hillTailIndex(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long")
          .as("x")
      )
      .filter(col("x") > 0)
    val w = Window
      .partitionBy(col("source"))
      .orderBy(col("x").desc, col("doc_id").asc)
    val ranked = d
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn(
        "n_s",
        count(lit(1)).over(Window.partitionBy(col("source")))
      )
      .filter(col("n_s") >= 20)
      .withColumn("k", ((col("n_s") - col("n_s") % 10L) / 10L).cast("long"))
    val thresh = ranked
      .filter(col("rk") === col("k") + 1)
      .select(col("source"), col("x").as("xk1"))
    ranked
      .filter(col("rk") <= col("k"))
      .join(broadcast(thresh), "source")
      .select(
        col("source"),
        col("n_s"),
        col("k"),
        col("xk1"),
        round(log(col("x").cast("double") / col("xk1")) * 1e9)
          .cast("long").as("t_nano")
      )
      .groupBy(col("source"), col("n_s"), col("k"), col("xk1"))
      .agg(sum(col("t_nano")).as("t_sum"))
      .select(
        col("source"),
        col("n_s").as("n"),
        col("k"),
        col("xk1"),
        when(col("t_sum") === 0L, lit(null).cast("long"))
          .otherwise(
            round(
              col("k").cast("double") * 1e9 / col("t_sum") * 1e3
            ).cast("long")
          ).as("alpha_milli"),
        coalesce(
          col("t_sum") =!= 0L &&
            col("k").cast("double") * 1e9 / col("t_sum") < 2.0,
          lit(false)
        ).as("heavy_tail")
      )
  }

  /** q292: 10%-trimmed mean vs raw mean of quality per source — the
    * robust-location twin of q275's MAD scale screen. A large
    * |gap| means the source's mean is carried by its tails (a few
    * boilerplate zeros or spam-perfect scores), so mean-based gates
    * (q130's mean-ppl cut, q259's trend) misread it; the trimmed
    * column is the number those gates should see. Trim counts are
    * exact (⌊n/10⌋ per side by (q, doc_id) rank); both means are one
    * exact-integer sum and one division.
    *
    * Scale: one per-source rank window (bounded by the largest
    * source; the two-level [[Ranking]] rank beyond that) + one agg.
    */
  def trimmedMeanGap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .select(col("doc_id"), col("source"))
      .join(
        TextAnalysis.qualityMicroScoresFrom(docs)
          .select(col("doc_id"), col("q_micro").as("qm")),
        "doc_id"
      )
    val w = Window
      .partitionBy(col("source"))
      .orderBy(col("qm").asc, col("doc_id").asc)
    val ranked = scored
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("n_s", count(lit(1)).over(Window.partitionBy(col("source"))))
    val k = floor(col("n_s") / lit(10.0)).cast("long")
    val kept = col("i") > k && col("i") <= col("n_s") - k
    ranked
      .groupBy(col("source"))
      .agg(
        max(col("n_s")).as("n"),
        sum(col("qm")).as("qsum"),
        sum(when(kept, col("qm")).otherwise(0L)).as("tsum"),
        sum(when(kept, 1L).otherwise(0L)).as("n_kept")
      )
      .select(
        col("source"),
        col("n"),
        round(col("qsum").cast("double") / col("n")).cast("long")
          .as("mean_micro"),
        round(col("tsum").cast("double") / col("n_kept")).cast("long")
          .as("trimmed_micro"),
        (round(col("tsum").cast("double") / col("n_kept")).cast("long") -
          round(col("qsum").cast("double") / col("n")).cast("long"))
          .as("gap_micro")
      )
  }

  /** q293: Q-Q decile drift profile — per source, the EXACT deciles
    * d/10 (d = 1…9) of the quality distribution next to the corpus
    * deciles, with the signed delta. q279's KS reports one sup;
    * this says WHERE the drift lives (a tail-only divergence leaves
    * the middle deltas at zero), which decides between re-weighting
    * (mid-shift) and outlier screening (tail-shift). Deciles are
    * value-domain rank statistics: the smallest value whose
    * cumulative count reaches ⌈d·n/10⌉, evaluated as the EXACT
    * integer predicate 10·cum ≥ d·n — no percentile_approx, no
    * per-row global window.
    *
    * Scale: the q279 cumsum frames (quantized value domain, bounded);
    * the decile probe is a 9-literal broadcast join with map-side
    * partial mins.
    */
  def qqDecileDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .select(col("doc_id"), col("source"))
      .join(
        TextAnalysis.qualityMicroScoresFrom(docs)
          .select(col("doc_id"), col("q_micro").as("qm")),
        "doc_id"
      )
    val wg = Window
      .orderBy(col("qm").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gv = scored
      .groupBy(col("qm"))
      .agg(count(lit(1)).as("gcnt"))
      .withColumn("gcum", sum(col("gcnt")).over(wg))
    val ws = Window
      .partitionBy(col("source"))
      .orderBy(col("qm").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sv = scored
      .groupBy(col("source"), col("qm"))
      .agg(count(lit(1)).as("scnt"))
      .withColumn("scum", sum(col("scnt")).over(ws))
    val ns = broadcast(
      scored.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    )
    val bigN = broadcast(scored.agg(count(lit(1)).as("bign")))
    val deciles = broadcast(
      spark.range(1, 10).select(col("id").as("decile"))
    )
    val srcQ = sv
      .join(ns, "source")
      .crossJoin(deciles)
      .filter(col("scum") * 10 >= col("decile") * col("n_s"))
      .groupBy(col("source"), col("decile"))
      .agg(min(col("qm")).as("src_q_micro"))
    val corpQ = broadcast(
      gv.crossJoin(bigN)
        .crossJoin(deciles)
        .filter(col("gcum") * 10 >= col("decile") * col("bign"))
        .groupBy(col("decile"))
        .agg(min(col("qm")).as("corpus_q_micro"))
    )
    srcQ
      .join(corpQ, "decile")
      .select(
        col("source"),
        col("decile"),
        col("src_q_micro"),
        col("corpus_q_micro"),
        (col("src_q_micro") - col("corpus_q_micro")).as("delta_micro")
      )
  }

  /** q295: deterministic randomization test for the mean-quality
    * difference between the two LARGEST sources — the
    * distribution-free significance check behind q292's gap and
    * q283's rank shift: is the observed mean difference larger than
    * what label-shuffling produces? 200 replicates reassign each doc
    * to group A with the exact-integer predicate
    * `hash60(doc_id:rep) mod (n_a+n_b) < n_a` (binomial
    * randomization — group sizes vary per replicate, documented);
    * the two-sided p-value is (1 + #{|diff_r| ≥ |observed|})/(B+1).
    * Every replicate statistic is exact integer sums with one
    * division, micro-rounded before the comparison.
    *
    * Scale: one scan of the two sources' docs exploded ×200 into
    * (rep, group) partial sums — map-side combined to 400 cells, so
    * the shuffle carries 400·P rows regardless of corpus size;
    * replicate count is the only amplifier and it is a constant.
    */
  def meanDiffPermutationTest(
      spark: SparkSession,
      dir: String,
      reps: Int = 200
  ): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .select(col("doc_id"), col("source"))
      .join(
        TextAnalysis.qualityMicroScoresFrom(docs)
          .select(col("doc_id"), col("q_micro").as("qm")),
        "doc_id"
      )
    // the two largest sources, ties by name — a deterministic pick
    val top2 = scored
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_src"))
      .orderBy(col("n_src").desc, col("source").asc)
      .limit(2)
      .withColumn(
        "grp",
        row_number().over(
          Window.orderBy(col("n_src").desc, col("source").asc)
        )
      )
    val ab = scored.join(broadcast(top2), "source")
    val sizes = broadcast(
      ab.groupBy()
        .agg(
          sum(when(col("grp") === 1, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("grp") === 2, 1L).otherwise(0L)).as("n_b"),
          sum(when(col("grp") === 1, col("qm")).otherwise(0L)).as("qa"),
          sum(when(col("grp") === 2, col("qm")).otherwise(0L)).as("qb"),
          max(when(col("grp") === 1, col("source"))).as("source_a"),
          max(when(col("grp") === 2, col("source"))).as("source_b")
        )
    )
    val obsDiff = round(col("qa").cast("double") / col("n_a")).cast("long") -
      round(col("qb").cast("double") / col("n_b")).cast("long")
    val repFrame = ab
      .crossJoin(sizes.select(col("n_a"), col("n_b")))
      .select(
        col("doc_id"),
        col("qm"),
        col("n_a"),
        col("n_b"),
        explode(sequence(lit(0), lit(reps - 1))).as("rep")
      )
      .select(
        col("rep"),
        col("qm"),
        (graft.functions.TextFunctions.hash60(
          concat(
            col("doc_id").cast("string"),
            lit(":"),
            col("rep").cast("string")
          )
        ) % (col("n_a") + col("n_b")) < col("n_a")).as("to_a")
      )
      .groupBy(col("rep"))
      .agg(
        sum(when(col("to_a"), col("qm")).otherwise(0L)).as("ra"),
        sum(when(col("to_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("to_a"), col("qm")).otherwise(0L)).as("rb"),
        sum(when(!col("to_a"), 1L).otherwise(0L)).as("cb")
      )
      // a replicate that empties a group (never at real sizes) is
      // counted as extreme on both engines via the null comparison
      .select(
        col("rep"),
        (round(col("ra").cast("double") / col("ca")).cast("long") -
          round(col("rb").cast("double") / col("cb")).cast("long"))
          .as("rdiff")
      )
    repFrame
      .crossJoin(sizes)
      .groupBy(
        col("source_a"),
        col("source_b"),
        col("n_a"),
        col("n_b")
      )
      .agg(
        max(obsDiff).as("obs_diff_micro"),
        sum(when(abs(col("rdiff")) >= abs(obsDiff), 1L).otherwise(0L))
          .as("n_extreme"),
        count(lit(1)).as("b")
      )
      .select(
        col("source_a"),
        col("source_b"),
        col("n_a"),
        col("n_b"),
        col("obs_diff_micro"),
        col("n_extreme"),
        col("b"),
        graft.functions.IntMath
          .microRatio(col("n_extreme") + 1, col("b") + 1)
          .as("p_micro"),
        // p < 0.05 as the exact cross-mult 20(n+1) < b+1
        (lit(20L) * (col("n_extreme") + 1) < col("b") + 1)
          .as("significant")
      )
  }

  /** q297: temperature-α planning sweep — the q289 ESS and the
    * worst-case repetition factor evaluated at α ∈ {0, 0.3, 0.5,
    * 0.7, 1.0} in one pass. α=1 is proportional sampling (ESS = N,
    * no upsampling); α=0 is uniform-over-languages (maximal
    * low-resource repetition); the table shows exactly what each
    * step of flattening costs in effective samples and who pays it
    * (`max_rep_lang`) — the two columns a mix review actually reads
    * before settling the q132 exponent.
    *
    * Scale: one (lang) count agg; the sweep is |alphas|·|langs|-row
    * arithmetic (femto-quantized ESS terms, the q289 convention);
    * the per-α argmax is a bounded window.
    */
  def mixAlphaSweep(
      spark: SparkSession,
      dir: String,
      budgetFrac: Double = 0.5
  ): DataFrame = {
    val perLang = Tables
      .documents(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = broadcast(
      perLang.agg(sum(col("n_docs")).cast("double").as("tot"))
    )
    val alphas = Seq(0L, 30L, 50L, 70L, 100L)
    val qraw = perLang
      .crossJoin(tot)
      .select(
        col("lang"),
        col("n_docs"),
        col("tot"),
        explode(lit(alphas.toArray)).as("alpha_centi")
      )
      .withColumn(
        "qr",
        pow(col("n_docs") / col("tot"), col("alpha_centi") / lit(100.0))
      )
    val qs = qraw
      .groupBy(col("alpha_centi"))
      .agg(sum(col("qr")).as("qs"))
    val terms = qraw
      .join(broadcast(qs), "alpha_centi")
      .withColumn("q", col("qr") / col("qs"))
      .withColumn(
        "t_femto",
        round(col("q") * col("q") / col("n_docs") * 1e15).cast("long")
      )
      .withColumn(
        "rep_micro",
        round(
          lit(budgetFrac) * col("tot") * col("q") / col("n_docs") * 1e6
        ).cast("long")
      )
    val fs = terms
      .groupBy(col("alpha_centi"))
      .agg(sum(col("t_femto")).as("f_sum"))
    val wr = Window
      .partitionBy(col("alpha_centi"))
      .orderBy(col("rep_micro").desc, col("lang").asc)
    val top = terms
      .withColumn("rn", row_number().over(wr))
      .filter(col("rn") === 1)
      .select(
        col("alpha_centi"),
        col("tot"),
        col("rep_micro").as("max_rep_micro"),
        col("lang").as("max_rep_lang")
      )
    top
      .join(broadcast(fs), "alpha_centi")
      .select(
        col("alpha_centi"),
        graft.functions.IntMath
          .idivHalfUp(lit(1000000000000000L), col("f_sum"))
          .as("ess_docs"),
        // milli-doc intermediate keeps the ppm exact to ±0.1 while
        // every step stays in BIGINT (round-9 seam)
        graft.functions.IntMath
          .idivHalfUp(
            graft.functions.IntMath
              .idivHalfUp(lit(1000000000000000000L), col("f_sum")) *
              lit(1000L),
            col("tot"))
          .as("ess_ppm"),
        col("max_rep_micro"),
        col("max_rep_lang")
      )
  }

  /** q298: per-source sample-size adequacy (power analysis) — the
    * minimum n that detects a δ = 0.01 mean-quality shift at
    * two-sided α = 0.05 with power 0.8, from each source's OWN
    * variance: n* = ((z_{α/2}+z_β)·σ/δ)². Sources with n < n* are
    * flagged: their q259 trend points and q279/q283 drift verdicts
    * are underpowered, so an alert from them is noise until more
    * data lands (and a quiet signal means nothing). Variance uses
    * the exact integer-pivot second moment (the q281 convention:
    * d = qm − mean_micro is an exact integer, Σd² an exact BIGINT).
    *
    * Scale: one mean agg + one centered agg, both map-side combined;
    * the formula is |sources|-row arithmetic.
    */
  def samplePowerAudit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .select(col("doc_id"), col("source"))
      .join(
        TextAnalysis.qualityMicroScoresFrom(docs)
          .select(col("doc_id"), col("q_micro").as("qm")),
        "doc_id"
      )
    val meanF = scored
      .groupBy(col("source"))
      .agg(graft.functions.IntMath.idivHalfUpSigned(sum(col("qm")), count(lit(1))).as("mean_micro"))
    val agg = scored
      .join(broadcast(meanF), "source")
      .withColumn("d", col("qm") - col("mean_micro"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n"),
        max(col("mean_micro")).as("mean_micro"),
        sum(col("d") * col("d")).as("s2")
      )
    // ((1.96 + 0.8416) * sigma / delta)^2 with delta = 10000 micro
    val varMicro2 = col("s2").cast("double") / col("n")
    val zsum = lit(1.96 + 0.8416)
    val nNeeded = ceil(
      zsum * zsum * varMicro2 / (lit(10000.0) * lit(10000.0))
    ).cast("long")
    agg.select(
      col("source"),
      col("n"),
      col("mean_micro"),
      round(varMicro2).cast("long").as("var_micro2"),
      nNeeded.as("n_needed"),
      (col("n") < nNeeded).as("underpowered")
    )
  }

  /** q299: composition-adjusted quality (direct standardization /
    * Kitagawa) — each source's mean quality next to the mean it
    * WOULD have if quality depended only on document length: the
    * corpus per-stratum means (strata = decimal digit count of the
    * token count, the q288 feature) weighted by the source's own
    * stratum mix. A source whose raw gap vs the corpus collapses
    * after adjustment isn't better or worse — it just writes longer
    * or shorter documents, and gating it on raw mean quality double-
    * counts length (which the score already rewards). Stratum means
    * are micro-integers; the expected mean is an exact-integer dot
    * product with ONE final division.
    *
    * Scale: one tokenize+score scan feeding a |strata|-row corpus
    * agg (broadcast back) and a (source, stratum) agg — nothing
    * beyond the scan grows with the corpus.
    */
  def compositionAdjustedQuality(
      spark: SparkSession,
      dir: String
  ): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .select(
        col("doc_id"),
        col("source"),
        length(
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long")
            .cast("string")
        ).as("stratum")
      )
      .join(
        TextAnalysis.qualityMicroScoresFrom(docs)
          .select(col("doc_id"), col("q_micro").as("qm")),
        "doc_id"
      )
    val corpusStratum = broadcast(
      scored
        .groupBy(col("stratum"))
        .agg(graft.functions.IntMath.idivHalfUpSigned(sum(col("qm")), count(lit(1))).as("cm_micro"))
    )
    val corpusMean = broadcast(
      scored.agg(graft.functions.IntMath.idivHalfUpSigned(sum(col("qm")), count(lit(1))).as("corpus_micro"))
    )
    scored
      .groupBy(col("source"), col("stratum"))
      .agg(count(lit(1)).as("n_ss"), sum(col("qm")).as("q_ss"))
      .join(corpusStratum, "stratum")
      .groupBy(col("source"))
      .agg(
        sum(col("n_ss")).as("n"),
        sum(col("q_ss")).as("qsum"),
        sum(col("n_ss") * col("cm_micro")).as("esum")
      )
      .crossJoin(corpusMean)
      .select(
        col("source"),
        col("n"),
        round(col("qsum").cast("double") / col("n")).cast("long")
          .as("actual_micro"),
        round(col("esum").cast("double") / col("n")).cast("long")
          .as("expected_micro"),
        col("corpus_micro"),
        (round(col("qsum").cast("double") / col("n")).cast("long")
          - col("corpus_micro")).as("raw_gap_micro"),
        (round(col("qsum").cast("double") / col("n")).cast("long")
          - round(col("esum").cast("double") / col("n")).cast("long"))
          .as("adj_gap_micro")
      )
  }

  /** q281: Jarque-Bera normality audit of the quality score per
    * source — sample skewness g₁ = m₃/m₂^1.5 and excess kurtosis
    * g₂ = m₄/m₂² − 3 from central moments, JB = n/6·(g₁² + g₂²/4),
    * flagged against the χ²₂ 5% critical value 5.991. Mean/σ gates
    * and z-scores assume rough normality; a huge JB says the source
    * needs the rank-based machinery (q275's MAD screen, q176's
    * quantile normalization) instead. Two-pass for stability: the
    * score is integerized to micro, the per-source mean is an exact
    * integer pivot, and moments are sums of SMALL centered
    * deviations — no raw-power-sum cancellation anywhere; m₂^1.5 is
    * written m₂·√m₂ so only IEEE-exact sqrt is used.
    *
    * Scale: one mean agg + one centered-moment agg (both map-side
    * combined) → |sources|-row arithmetic.
    */
  def qualityNormalityAudit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .select(col("doc_id"), col("source"))
      .join(
        TextAnalysis.qualityMicroScoresFrom(docs)
          .select(col("doc_id"), col("q_micro").as("qm")),
        "doc_id"
      )
    val meanF = scored
      .groupBy(col("source"))
      .agg(graft.functions.IntMath.idivHalfUpSigned(sum(col("qm")), count(lit(1))).as("mean_micro"))
    val withD = scored
      .join(broadcast(meanF), "source")
      .withColumn("d", (col("qm") - col("mean_micro")).cast("double") / 1e6)
    val n = col("n").cast("double")
    val m2 = col("s2") / n
    val m3 = col("s3") / n
    val m4 = col("s4") / n
    val g1 = m3 / (m2 * sqrt(m2))
    val g2 = m4 / (m2 * m2) - 3.0
    val jb = n / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
    withD
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("d") * col("d")).as("s2"),
        sum(col("d") * col("d") * col("d")).as("s3"),
        sum(col("d") * col("d") * col("d") * col("d")).as("s4")
      )
      .select(
        col("source"),
        col("n"),
        round(g1 * 1e6).cast("long").as("skew_micro"),
        round(g2 * 1e6).cast("long").as("ex_kurtosis_micro"),
        round(jb * 1e3).cast("long").as("jb_milli"),
        (jb > 5.991).as("non_normal")
      )
  }

  /** q268: largest-remainder (Hamilton) budget apportionment — an
    * integer document budget allocated across (source, lang) cells
    * exactly proportionally: base = ⌊B·n_c/N⌋ per cell, and the
    * B − Σbase leftover seats go to the largest integer remainders
    * (B·n_c mod N, ties → (source, lang) asc). The allocation sheet
    * for "sample exactly B docs, keep the mix" — naive per-cell
    * rounding over- or under-shoots B by up to |cells|/2; this sums
    * to B exactly, by construction. 100% integer arithmetic: no
    * float exists anywhere in the operator.
    *
    * Scale: one (source, lang) count agg; the remainder rank is a
    * window over |cells| rows (bounded by the label-cardinality
    * product, never corpus size).
    */
  def budgetApportionment(
      spark: SparkSession,
      dir: String,
      budget: Long = 10000L
  ): DataFrame = {
    val cells = Tables
      .documents(spark, dir)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = broadcast(cells.agg(sum(col("n_docs")).as("bign")))
    val based = cells
      .crossJoin(tot)
      .withColumn("rem", (lit(budget) * col("n_docs")) % col("bign"))
      // base = (B·n − rem)/N divides exactly — pure integer math
      .withColumn(
        "base",
        ((lit(budget) * col("n_docs") - col("rem")) / col("bign")).cast("long")
      )
    val leftover = broadcast(
      based.agg((lit(budget) - sum(col("base"))).as("leftover"))
    )
    val w = Window.orderBy(col("rem").desc, col("source").asc, col("lang").asc)
    based
      .withColumn("rk", row_number().over(w).cast("long"))
      .crossJoin(leftover)
      .select(
        col("source"),
        col("lang"),
        col("n_docs"),
        col("base"),
        (col("rk") <= col("leftover")).as("bonus"),
        (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .as("alloc")
      )
  }

  /** q263: inverse-frequency oversampling plan for label imbalance —
    * per label: weight = min(cap, N/(K·n_l)) (balanced target: every
    * label gets 1/K of the resampled mass, capped at `cap`× to stop
    * tiny classes exploding into repeats), the expected resampled
    * count, and the post-resampling share. The class-imbalance
    * prescription read before fine-tuning on labeled data — the
    * labels' answer to what q132's temperature mix does for sources.
    * Every input is an exact integer; weights/shares are single
    * divisions, emitted in micro-units.
    *
    * Scale: one |labels|-row agg; the plan applies downstream as a
    * per-row weighted draw (the q97 A-Res machinery).
    */
  def oversamplingPlan(
      spark: SparkSession,
      dir: String,
      cap: Double = 10.0
  ): DataFrame = {
    val counts = Tables
      .embeddings(spark, dir)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"))
    val tot = broadcast(
      counts.agg(sum(col("n")).as("bign"), count(lit(1)).as("k"))
    )
    // integer weight plan: w_micro = min(cap·1e6, halfUp(bign·1e6,
    // k·n)); expectations carry e_micro = n·w_micro exactly, so the
    // share is a pure-integer ratio (round-9 seam)
    import graft.functions.IntMath.{idivHalfUp, microRatio}
    val weightMicro = least(
      lit(Math.round(cap * 1e6)),
      microRatio(col("bign"), col("k") * col("n"))
    )
    val withW = counts
      .crossJoin(tot)
      .withColumn("w_micro", weightMicro)
      .withColumn("e_micro", col("n") * col("w_micro"))
    val expTot = broadcast(
      withW.agg(sum(col("e_micro")).as("etot_micro"))
    )
    withW
      .crossJoin(expTot)
      .select(
        col("label"),
        col("n"),
        col("w_micro").as("weight_micro"),
        idivHalfUp(col("e_micro"), lit(1000000L)).as("expected_n"),
        microRatio(col("e_micro"), col("etot_micro")).as("share_micro")
      )
  }

  /** q259: per-source quality drift — mean quality per (source,
    * arrival bucket) plus an OLS slope of bucket-mean quality over
    * bucket index per source (micro-units/bucket): the data-rot
    * monitor. A negative slope says the source's recent batches are
    * worse than its history — exactly what a static reputation score
    * (q211) averages away, and the signal that should trigger a
    * re-crawl review before the next mix is cut. Buckets are
    * doc_id/50 (the q253 arrival proxy).
    *
    * Determinism: bucket means are integerized to micro-units at the
    * (source, bucket) agg (the q164 convention), so every OLS term —
    * Σb, Σmq, Σb·mq, Σb² — is an EXACT integer and the slope/mean
    * are single divisions of exact integers: no summation-order
    * sensitivity exists anywhere.
    *
    * Scale: one scored scan → (source, bucket) partial agg →
    * |sources|-row OLS rollup. Nothing beyond the q15 pass touches
    * corpus rows.
    */
  def sourceQualityDrift(
      spark: SparkSession,
      dir: String,
      bucketSize: Int = 50
  ): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .select(
        col("doc_id"),
        col("source"),
        (col("doc_id") / lit(bucketSize)).cast("long").as("b")
      )
      .join(TextAnalysis.qualityMicroScoresFrom(docs), "doc_id")
    val bucketMeans = scored
      .groupBy(col("source"), col("b"))
      // exact integer bucket mean (round-9 seam)
      .agg(graft.functions.IntMath
        .idivHalfUp(sum(col("q_micro")), count(lit(1))).as("mqm"))
    // OLS slope over exact integer sums, emitted via signed half-up
    // division (round-9 seam: the double quotient can land on .5)
    val slopeNum = col("n") * col("sxy") - col("sx") * col("sy")
    val slopeDen = col("n") * col("sx2") - col("sx") * col("sx")
    bucketMeans
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("b")).as("sx"),
        sum(col("mqm")).as("sy"),
        sum(col("b") * col("b")).as("sx2"),
        sum(col("b") * col("mqm")).as("sxy")
      )
      .select(
        col("source"),
        col("n").as("n_buckets"),
        graft.functions.IntMath
          .idivHalfUp(col("sy"), col("n")).as("mean_q_micro"),
        when(
          col("n") > 1 && slopeDen =!= 0L,
          graft.functions.IntMath.idivHalfUpSigned(slopeNum, slopeDen))
          .as("slope_micro_per_bucket")
      )
  }

  /** q245: source-interleaved training order — documents shuffled
    * within their source by the portable md5 key, then globally
    * ordered by (within-source rank, source): a deterministic
    * round-robin across sources, so consecutive training examples
    * come from different sources wherever supply allows (two docs
    * from one source are adjacent only when every other source's
    * supply at that rank is exhausted). The anti-clumping
    * complement to q191's plain global shuffle: gradient noise
    * stays source-mixed batch over batch instead of averaging out
    * only in expectation.
    *
    * Scale: one within-source window (bounded by the largest
    * source), then [[Ranking.withGlobalRank]]'s range shuffle on the
    * (rank, source) key — no single-partition stage.
    */
  def sourceInterleaveOrder(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"))
    val wSrc = Window
      .partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
    val ranked = d.withColumn("src_rank", row_number().over(wSrc).cast("long"))
    Ranking
      .withGlobalRank(
        ranked,
        Seq(col("src_rank").asc, col("source").asc, col("doc_id").asc),
        "pos",
        32
      )
      .select(col("doc_id"), col("source"), col("src_rank"), col("pos"))
  }

  /** q243: competence-based curriculum pacing (Platanios et al. 2019)
    * — with competence c(t) = √(t/T), a document whose difficulty
    * percentile is ρ becomes trainable at step t = ⌈T·ρ²⌉: the square
    * root front-loads easy examples and admits the long tail late.
    * Difficulty = token count (the classic length curriculum),
    * percentile = (rank−1)/(n−1) over (n_tokens, doc_id). Emits per
    * doc: length, global rank, and its entry step for T = 10 000 —
    * the dataloader-ready pacing schedule.
    *
    * Scale: the global rank is [[Ranking.withGlobalRank]] (range
    * shuffle + per-partition offsets — never a single-partition
    * window); the entry step is pure arithmetic on exact integers,
    * so no float drift exists anywhere.
    */
  def curriculumPacing(
      spark: SparkSession,
      dir: String,
      totalSteps: Long = 10000L
  ): DataFrame = {
    val d = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long")
          .as("n_tokens")
      )
    val ranked = Ranking.withGlobalRank(
      d,
      Seq(col("n_tokens").asc, col("doc_id").asc),
      "rank",
      32
    )
    val nF = broadcast(d.agg(count(lit(1)).as("n")))
    ranked
      .crossJoin(nF)
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("rank"),
        ceil(
          (col("rank") - 1).cast("double") / greatest(col("n") - 1, lit(1L))
            * (col("rank") - 1) / greatest(col("n") - 1, lit(1L))
            * totalSteps
        ).cast("long").as("entry_step")
      )
  }

  def iqrLengthGate(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("lang"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("n_tokens"))
    val wRank = Window
      .partitionBy(col("lang"))
      .orderBy(col("n_tokens").asc, col("doc_id").asc)
    val ranked = d
      .withColumn("rn", row_number().over(wRank))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("lang"))))
    val qs = ranked
      .groupBy(col("lang"))
      .agg(
        max(when(col("rn") === ceil(col("cnt") * 0.25), col("n_tokens")))
          .as("q1"),
        max(when(col("rn") === ceil(col("cnt") * 0.75), col("n_tokens")))
          .as("q3")
      )
    d.join(broadcast(qs), Seq("lang"))
      .select(
        col("doc_id"),
        col("lang"),
        col("n_tokens"),
        col("q1"),
        col("q3"),
        col("n_tokens").between(col("q1"), col("q3")).cast("int").as("keep")
      )
  }

  /** q154: preference-pair construction for DPO/RLHF-style training
    * (Rafailov et al., "Direct Preference Optimization", NeurIPS
    * 2023 — the data side): within every (lang, source) stratum,
    * pair the highest-quality document (chosen) with the
    * lowest-quality one (rejected), quality being the q15 heuristic
    * rounded to 6 places before ranking (the rounded-rank
    * convention), ties broken by doc_id ASC on both ends. Groups
    * with a single document, or where chosen == rejected, produce no
    * pair. The margin column is the fuel for margin-weighted DPO
    * variants.
    *
    * Scale: one scoring scan, then two WindowGroupLimit rank-1
    * windows over (lang, source) strata — per-partition top-1 heaps
    * before the exchange, never a full sort; the pair join is
    * stratum-keyed and trivially small.
    */
  def preferencePairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .join(TextAnalysis.qualityMicroScoresFrom(docs), "doc_id")
      .select(
        col("lang"),
        col("source"),
        col("doc_id"),
        col("q_micro").as("q")
      )
    def rank1(ord: Seq[org.apache.spark.sql.Column], prefix: String) = {
      val w = Window.partitionBy(col("lang"), col("source")).orderBy(ord: _*)
      scored
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(
          col("lang"),
          col("source"),
          col("doc_id").as(s"${prefix}_id"),
          col("q").as(s"${prefix}_q")
        )
    }
    val chosen = rank1(Seq(col("q").desc, col("doc_id").asc), "chosen")
    val rejected = rank1(Seq(col("q").asc, col("doc_id").asc), "rejected")
    chosen
      .join(rejected, Seq("lang", "source"))
      .filter(col("chosen_id") =!= col("rejected_id"))
      .select(
        col("lang"),
        col("source"),
        col("chosen_id"),
        col("rejected_id"),
        (col("chosen_q") - col("rejected_q")).as("margin_micro")
      )
  }

  /** q193: deterministic bootstrap confidence intervals for a corpus
    * metric (mean document length per source) — the error bars a
    * data team should attach before acting on a per-source number
    * (is src3's mean length REALLY lower, or is that sampling
    * noise?). Resampling is hash-seeded (replicate b, slot i →
    * pick = hash(b:i:source) mod n), so the interval is exactly
    * reproducible on any cluster layout — no RNG state, no seed
    * files.
    *
    * Scale: B=32 resamples realized as one explode (32·N rows) + one
    * equi-join against the per-source position-ranked frame + two
    * bounded aggregations; per-source windows only (never corpus-
    * wide). At extreme scale the same shape runs on per-shard
    * subsamples (bag-of-little-bootstraps); the topology is
    * unchanged. The metric is integer-valued, so resample means are
    * EXACT (integer sums in doubles below 2^53) and only the final
    * stddev over 32 means carries float rounding, absorbed by the
    * 6-place round.
    */
  def bootstrapCi(
      spark: SparkSession,
      dir: String,
      b: Int = 32
  ): DataFrame = {
    import graft.functions.TextFunctions.hash60
    val docs = Tables
      .documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    // position-ranked frame feeds the resample join — materialize once
    val ranked = docs.withColumn("pick", row_number().over(w)).cacheTracked()
    val counts = ranked
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n"),
        avg(col("n_chars").cast("double")).as("mean_direct")
      )
    val picks = counts
      .select(col("source"), col("n"), explode(sequence(lit(0), lit(b - 1))).as("b"))
      .select(
        col("source"),
        col("b"),
        explode(sequence(lit(1), col("n"))).as("i"),
        col("n")
      )
      .select(
        col("source"),
        col("b"),
        (pmod(
          hash60(concat_ws(":", col("b"), col("i"), col("source"))),
          col("n")
        ) + 1).as("pick")
      )
    val resampleMeans = picks
      .join(ranked.select(col("source"), col("pick"), col("n_chars")),
        Seq("source", "pick"))
      .groupBy(col("source"), col("b"))
      .agg(avg(col("n_chars").cast("double")).as("m"))
    val se = resampleMeans
      .groupBy(col("source"))
      .agg(stddev_pop(col("m")).as("se"))
    counts
      .join(se, Seq("source"))
      .select(
        col("source"),
        col("n").as("n_docs"),
        round(col("mean_direct"), 6).as("mean_nchars"),
        round(col("se"), 6).as("boot_se"),
        round(col("mean_direct") - lit(1.96) * col("se"), 6).as("ci_lo"),
        round(col("mean_direct") + lit(1.96) * col("se"), 6).as("ci_hi")
      )
  }

  /** q191: per-epoch deterministic global training order — every
    * epoch is a DIFFERENT pseudo-random permutation of the corpus
    * (epoch-seeded content hash), and every permutation is exactly
    * reproducible on any cluster layout or retry. This is the data-
    * order contract of reproducible LLM training: a restart at epoch
    * 2 must re-derive byte-identical batch order without any stored
    * shuffle state.
    *
    * Scale: the order key is hash60(epoch:doc_id); positions come
    * from ONE two-pass exact global ranking over (epoch, key) — the
    * q50/q164 range-shuffle + zipWithIndex machinery, never a
    * corpus-wide single-partition window — and the per-epoch
    * position is closed-form rank arithmetic (rank − epoch·N).
    */
  def epochShuffleOrder(
      spark: SparkSession,
      dir: String,
      epochs: Int = 3
  ): DataFrame = {
    import graft.functions.TextFunctions.hash60
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val keyed = docs
      .select(
        col("doc_id"),
        explode(sequence(lit(0), lit(epochs - 1))).as("epoch")
      )
      .withColumn(
        "h",
        hash60(concat_ws(":", col("epoch"), col("doc_id")))
      )
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    Ranking
      .withGlobalRank(
        keyed,
        Seq(col("epoch"), col("h"), col("doc_id")),
        "r",
        parts
      )
      .crossJoin(broadcast(total))
      .select(
        col("epoch"),
        col("doc_id"),
        (col("r") - col("epoch") * col("n_docs")).as("position")
      )
  }

  /** q362: batch-composition diversity audit — documents laid out in
    * the reproducible shuffled order (the q191/q75 content-keyed md5
    * rank), cut into consecutive batches of B, and each batch scored
    * for mixing: distinct sources, distinct languages, and the
    * majority-source share in exact ppm. SGD quality degrades when
    * consecutive batches are source-clumped (correlated gradients);
    * the q245 interleaver exists to prevent that, and this table is
    * the measurement that says whether the PLAIN shuffle already
    * mixes well enough — if every batch of 32 sees 15+ sources, the
    * interleaver is unnecessary complexity.
    *
    * Scale: one [[Ranking.withGlobalRank]] range shuffle for the
    * order (never a single-partition window), a batch-keyed rollup;
    * output is N/B rows. Majority share via the max-count struct —
    * exact integers (round-9 seam).
    */
  def batchDiversity(
      spark: SparkSession,
      dir: String,
      batchSize: Int = 32
  ): DataFrame = {
    import graft.functions.IntMath.{idiv, microRatio}
    val d = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        col("lang"),
        md5(col("doc_id").cast("string")).as("h")
      )
    val ordered = Ranking
      .withGlobalRank(d, Seq(col("h").asc, col("doc_id").asc), "pos", 32)
      .withColumn("batch", idiv(col("pos") - 1, lit(batchSize.toLong)))
    val bySrc = ordered
      .groupBy(col("batch"), col("source"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("batch"))
      .agg(
        count(lit(1)).as("n_sources"),
        max(struct(col("c"), col("source"))).as("top")
      )
    ordered
      .groupBy(col("batch"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs")
      )
      .join(bySrc, Seq("batch"))
      .select(
        col("batch"),
        col("n_docs"),
        col("n_sources"),
        col("n_langs"),
        col("top.source").as("majority_source"),
        microRatio(col("top.c"), col("n_docs")).as("majority_share_ppm")
      )
  }

  /** q367: Mann-Kendall trend test on arrival-bucket median document
    * length — S = Σ_{{i<j}} sign(median_j − median_i) over 50-doc
    * arrival buckets. S is a PURE INTEGER statistic (the round-9
    * ideal: no variance estimate, no division anywhere in the hashed
    * surface), monotone-trend-sensitive and outlier-immune where
    * q259's OLS slope is not. |S| near its maximum n(n−1)/2 means
    * document length is drifting monotonically with crawl time — the
    * content-shift alarm that precedes quality-score movement. The
    * normal z and its verdict stay spec-side (sqrt of the closed-form
    * variance n(n−1)(2n+5)/18).
    *
    * Scale: bucket medians are exact rank picks over bounded buckets;
    * the pair sum runs on the |buckets|-row frame (bounded: buckets
    * ∝ corpus/50 but the per-source frame is |buckets_s| ≤ corpus_s/50
    * — at extreme scale, coarsen the bucket width, not the operator).
    */
  def lengthTrendMk(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        graft.functions.IntMath.idiv(col("doc_id"), lit(50L)).as("b"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("n")
      )
    val w = Window
      .partitionBy(col("source"), col("b"))
      .orderBy(col("n").asc, col("doc_id").asc)
    val medians = d
      .withColumn("rn", row_number().over(w))
      .withColumn(
        "cnt",
        count(lit(1)).over(Window.partitionBy(col("source"), col("b"))))
      .filter(col("rn") === ceil(col("cnt") / 2))
      .select(col("source"), col("b"), col("n").as("med"))
    val pairs = medians
      .join(
        medians.select(
          col("source"),
          col("b").as("b2"),
          col("med").as("med2")),
        Seq("source"))
      .filter(col("b2") > col("b"))
    pairs
      .groupBy(col("source"))
      .agg(
        sum(
          when(col("med2") > col("med"), 1L)
            .when(col("med2") < col("med"), -1L)
            .otherwise(0L)
        ).as("s_stat"),
        count(lit(1)).as("n_pairs")
      )
      .join(
        medians.groupBy(col("source"))
          .agg(count(lit(1)).as("n_buckets")),
        Seq("source"))
      .select(
        col("source"),
        col("n_buckets"),
        col("n_pairs"),
        col("s_stat"),
        // trend direction as exact integer sign
        when(col("s_stat") > 0, 1L)
          .when(col("s_stat") < 0, -1L)
          .otherwise(0L).as("direction")
      )
  }

  /** q368: hash-bucket uniformity audit — Pearson chi-square of
    * hash60(doc_id) mod 256 against the uniform distribution, in
    * EXACT integer milli: with B buckets and N docs,
    * χ² = (B·Σo² − N²)/N, so χ²_milli = halfUp((B·Σo² − N²)·1000, N)
    * with zero floats anywhere. This is the foundational audit under
    * every id-keyed decision in the engine — the q49 split, q71
    * strata, q75 shards, q304 PPS — all assume the shared 60-bit
    * hash scatters uniformly; a biased hash silently skews every one
    * of them. The p-value (χ² tail at 255 dof) stays spec-side.
    *
    * Scale: one pure-map scan → 256 partial-agg cells → one row.
    */
  def hashUniformity(
      spark: SparkSession,
      dir: String,
      buckets: Int = 256
  ): DataFrame = {
    import graft.functions.IntMath.idivHalfUpSigned
    val cells = Tables
      .documents(spark, dir)
      .select(
        pmod(graft.functions.TextFunctions.hash60(col("doc_id")),
          lit(buckets.toLong)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("o"))
    cells
      .agg(
        count(lit(1)).as("buckets_hit"),
        sum(col("o")).as("n_docs"),
        sum(col("o") * col("o")).as("sum_o2")
      )
      .select(
        lit(buckets.toLong).as("n_buckets"),
        col("buckets_hit"),
        col("n_docs"),
        idivHalfUpSigned(
          (lit(buckets.toLong) * col("sum_o2") -
            col("n_docs") * col("n_docs")) * lit(1000L),
          col("n_docs")).as("chi2_milli")
      )
  }

  /** q369: adjacent-duplicate runs in storage order — maximal runs of
    * consecutive doc_ids (per source) whose text hash repeats the
    * previous row's. Crawl artifacts (a stuck paginator, a retry
    * loop, a mirrored listing) write the SAME document many times IN
    * A ROW, which position-blind dedup statistics (q20's groups)
    * can't distinguish from organic far-apart duplication — and the
    * fix differs (a crawler patch vs a dedup pass). Reports per
    * source: adjacent-dup pairs, runs of length ≥ 2, and the longest
    * run. All exact integers.
    *
    * Scale: one source-partitioned window ordered by doc_id (bounded
    * per source; range-partition within source at extreme scale), a
    * run-id prefix sum, a |sources|-row rollup.
    */
  def adjacentDupRuns(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id").asc)
    val d = Tables
      .documents(spark, dir)
      .select(col("source"), col("doc_id"), md5(col("text")).as("h"))
      .withColumn("same", (lag(col("h"), 1).over(w) === col("h"))
        .cast("long"))
      .withColumn("same", coalesce(col("same"), lit(0L)))
      .withColumn(
        "run_id",
        sum(lit(1L) - col("same")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = d
      .groupBy(col("source"), col("run_id"))
      .agg(count(lit(1)).as("run_len"))
    runs
      .groupBy(col("source"))
      .agg(
        sum(col("run_len") - 1).as("adjacent_dup_pairs"),
        sum(when(col("run_len") >= 2, 1L).otherwise(0L))
          .as("runs_ge2"),
        max(col("run_len")).as("max_run")
      )
  }

  /** q392: source arrival-spacing audit — per source, the gap
    * structure of its positions in global arrival (doc_id) order:
    * worst gap, mean gap (exact milli over the source's own span),
    * and the max:mean ratio. A source whose max gap dwarfs its mean
    * arrives in bursts separated by silence (crawler scheduling, a
    * dead feed that resumed) — the BETWEEN-source complement of
    * q352's within-run lengths, and the upstream explanation when
    * q375 flags quality clumping. Everything hashed is an exact
    * integer id difference.
    *
    * Scale: one lag window partitioned by source (hash-partitioned,
    * linear) and a per-source rollup.
    */
  def sourceSpacing(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.idivHalfUp
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id").asc)
    val gaps = Tables
      .documents(spark, dir)
      .select(col("source"), col("doc_id"))
      .withColumn("gap", col("doc_id") - lag(col("doc_id"), 1).over(w))
    gaps
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_id"),
        max(col("doc_id")).as("last_id"),
        max(col("gap")).as("max_gap"),
        min(col("gap")).as("min_gap")
      )
      .filter(col("n_docs") >= 2)
      .select(
        col("source"), col("n_docs"), col("first_id"), col("last_id"),
        col("max_gap"), col("min_gap"),
        idivHalfUp((col("last_id") - col("first_id")) * lit(1000L),
          col("n_docs") - 1).as("mean_gap_milli"),
        // max gap vs the mean gap, exact milli:
        // max_gap·(n−1)·1000 / span, half-up
        idivHalfUp(col("max_gap") * (col("n_docs") - 1) * lit(1000L),
          col("last_id") - col("first_id")).as("max_vs_mean_milli")
      )
  }

  /** q400: the round-9 composite admission manifest — per source, the
    * train population pushed through this round's audited gates in
    * sequence: decontamination quarantine (the q379 direct+collateral
    * set) then the per-language median quality cut (the q381 per-lang
    * threshold, computed over the train population). Emits what a
    * capacity plan consumes: surviving docs and token mass with exact
    * retention ppm. Every stage reads a seam that is independently
    * oracle-gated (q73/q379's contamination sets, q370/q381's rank-
    * pick medians, the q15/qualityMicro integer seam), so a red row
    * here localizes to exactly one audited stage.
    */
  /** The q400 admission classification at doc grain: one row per
    * TRAIN doc with source, token count, quarantined and admitted
    * flags. Shared by the q400 manifest rollup and the q420 receipt.
    */
  def round9AdmittedDocs(spark: SparkSession, dir: String): DataFrame = {
    val classed = graft.operators.Dedup
      .contaminationSets(spark, dir)
      .withColumn("quarantined",
        when(col("direct") + col("collateral") > 0L, 1L).otherwise(0L))
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), col("lang"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("tk"))
      .join(TextAnalysis.qualityMicroScoresFrom(docs), "doc_id")
    val wOrd = Window
      .partitionBy(col("lang"))
      .orderBy(col("q_micro").asc, col("doc_id").asc)
    val lmed = scored
      .withColumn("lrn", row_number().over(wOrd))
      .withColumn("lcnt",
        count(lit(1)).over(Window.partitionBy(col("lang"))))
      .filter(col("lrn") === ceil(col("lcnt") * 50 / 100))
      .select(col("lang"), col("q_micro").as("lang_med"))
    scored
      .join(lmed, "lang")
      .join(classed.select(col("doc_id"), col("source"),
        col("quarantined")), "doc_id")
      .withColumn("admitted",
        when(col("quarantined") === 0L &&
          col("q_micro") > col("lang_med"), 1L).otherwise(0L))
  }

  def round9Manifest(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    round9AdmittedDocs(spark, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_train_docs"),
        sum(col("tk")).as("train_tokens"),
        sum(col("quarantined")).as("n_quarantined"),
        sum(col("admitted")).as("n_admitted"),
        sum(col("admitted") * col("tk")).as("admitted_tokens")
      )
      .select(
        col("source"), col("n_train_docs"), col("train_tokens"),
        col("n_quarantined"), col("n_admitted"), col("admitted_tokens"),
        microRatio(col("n_admitted"), col("n_train_docs"))
          .as("doc_retention_ppm"),
        microRatio(col("admitted_tokens"),
          greatest(col("train_tokens"), lit(1L)))
          .as("token_retention_ppm")
      )
  }

  /** q407: eval-set representativeness — per (lang, source) cell,
    * the eval population's share vs the train population's share in
    * exact ppm, plus the signed gap. The audit of the modulo-50 eval
    * split every decontamination and held-out metric in this engine
    * leans on: a cell where eval share is far from train share means
    * eval metrics over/under-weight that slice, and the |gap| sum
    * (spec-side L1) is the overall representativeness distance. Pure
    * integer counts and half-up ppm shares.
    *
    * Scale: one groupBy(lang, source, is_eval) partial agg; shares
    * via two scalar totals.
    */
  def evalRepresentativeness(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val cells = Tables
      .documents(spark, dir)
      .select(col("lang"), col("source"),
        when(col("doc_id") % 50 === 0, 1L).otherwise(0L).as("is_eval"))
      .groupBy(col("lang"), col("source"))
      .agg(
        sum(col("is_eval")).as("n_eval"),
        sum(lit(1L) - col("is_eval")).as("n_train")
      )
    val tot = cells.agg(
      sum(col("n_eval")).as("tot_eval"),
      sum(col("n_train")).as("tot_train"))
    cells
      .crossJoin(broadcast(tot))
      .select(
        col("lang"), col("source"), col("n_eval"), col("n_train"),
        microRatio(col("n_eval"), greatest(col("tot_eval"), lit(1L)))
          .as("eval_share_ppm"),
        microRatio(col("n_train"), greatest(col("tot_train"), lit(1L)))
          .as("train_share_ppm")
      )
      .withColumn("gap_ppm",
        col("eval_share_ppm") - col("train_share_ppm"))
  }

  /** q420: the admission receipt — a mergeable, order-independent
    * fingerprint of the EXACT admitted set the q400 manifest
    * implies: count, token mass, id range, and a modular hash-sum
    * receipt Σ (hash60(doc_id) mod 10⁶). Two runs (or two engines,
    * or the same plan on different cluster layouts) admitting the
    * same documents produce the same receipt; ANY membership change
    * moves it with probability ~1 − 10⁻⁶. This is the line a
    * training job logs so "trained on the same data" is checkable —
    * and unlike an ordered concat-hash it's a pure SUM: mergeable
    * across shards, no global sort, no driver collect. Overflow
    * headroom: 10⁶ per doc → 2^63 lasts past 9·10¹² docs.
    */
  def admissionReceipt(spark: SparkSession, dir: String): DataFrame = {
    round9AdmittedDocs(spark, dir)
      .filter(col("admitted") === 1L)
      .agg(
        count(lit(1)).as("n_admitted"),
        sum(col("tk")).as("admitted_tokens"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"),
        sum(pmod(graft.functions.TextFunctions.hash60(col("doc_id")),
          lit(1000000L))).as("receipt_mod")
      )
  }

  /** q421: early-sample bias — per source, the mean micro-quality of
    * its FIRST 10 docs (arrival order) vs everything after, with the
    * signed gap. Source onboarding decisions (include? cap? weight?)
    * are made on early samples; a source whose opening docs run hot
    * or cold against its steady state gets mis-weighted by exactly
    * this gap. Means are exact half-up micro; the early window is a
    * per-source top-k (WindowGroupLimit — heaps, no full sort).
    */
  def earlySampleBias(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.{idivHalfUp, idivHalfUpSigned}
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .select(col("doc_id"), col("source"))
      .join(TextAnalysis.qualityMicroScoresFrom(docs), "doc_id")
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .withColumn("is_early", when(col("rn") <= 10, 1L).otherwise(0L))
      .groupBy(col("source"))
      .agg(
        sum(col("is_early")).as("n_early"),
        sum(lit(1L) - col("is_early")).as("n_rest"),
        sum(col("is_early") * col("q_micro")).as("s_early"),
        sum((lit(1L) - col("is_early")) * col("q_micro")).as("s_rest")
      )
      .filter(col("n_rest") >= 1)
      .select(
        col("source"), col("n_early"), col("n_rest"),
        idivHalfUp(col("s_early"), col("n_early"))
          .as("early_mean_micro"),
        idivHalfUp(col("s_rest"), col("n_rest")).as("rest_mean_micro")
      )
      .withColumn("bias_micro",
        col("early_mean_micro") - col("rest_mean_micro"))
  }

  /** q422: shuffle-seed displacement — rank every doc under TWO
    * deterministic shuffle orders (md5 of doc_id vs md5 of
    * "alt:"+doc_id) and take the five-point of the absolute position
    * displacement. If the epoch shuffle is healthy, displacement is
    * uniform-ish (median ≈ N/3); a doc pinned near the same position
    * under independent seeds means the order leaks id structure —
    * exactly what q191's consumers assume away. Ranks come from two
    * distributed total orders; the displacement stats are exact
    * rank picks over the N-row frame.
    */
  def shuffleDisplacement(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables
      .documents(spark, dir)
      .select(col("doc_id"),
        md5(col("doc_id").cast("string")).as("h1"),
        md5(concat(lit("alt:"), col("doc_id").cast("string"))).as("h2"))
    val r1 = Ranking
      .withGlobalRank(d, Seq(col("h1").asc, col("doc_id").asc), "p1", 8)
      .select(col("doc_id"), col("p1"))
    val r2 = Ranking
      .withGlobalRank(d, Seq(col("h2").asc, col("doc_id").asc), "p2", 8)
      .select(col("doc_id"), col("p2"))
    val disp = r1
      .join(r2, "doc_id")
      .select(col("doc_id"), abs(col("p1") - col("p2")).as("d"))
    val ranked = Ranking
      .withGlobalRank(disp, Seq(col("d").asc, col("doc_id").asc), "rn", 8)
    val tot = disp.agg(count(lit(1)).as("cnt"))
    def pick(p: Int): Column =
      max(when(col("rn") === ceil(col("cnt") * p / 100), col("d")))
    ranked
      .crossJoin(broadcast(tot))
      .agg(
        max(col("cnt")).as("n_docs"),
        min(col("d")).as("min_disp"),
        pick(10).as("p10_disp"),
        pick(50).as("p50_disp"),
        pick(90).as("p90_disp"),
        max(col("d")).as("max_disp")
      )
  }

  /** q430: arrival-composition drift — each source's share of the
    * corpus in the FIRST half of arrival order vs the SECOND half
    * (halves split at the median doc_id — an exact global rank pick),
    * with the signed ppm gap. The crawl-mix stability gauge: a
    * source whose share doubles between halves means the mix any
    * temporally-split model sees is not the mix the corpus card
    * (q109) reports. Pure integer counts and half-up ppm.
    */
  def arrivalCompositionDrift(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.IntMath.microRatio
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val ranked = Ranking
      .withGlobalRank(d, Seq(col("doc_id").asc), "rn", 8)
    val tot = d.agg(count(lit(1)).as("cnt"))
    val halves = ranked
      .crossJoin(broadcast(tot))
      .select(col("source"),
        when(col("rn") * 2 <= col("cnt"), 1L).otherwise(0L)
          .as("first_half"))
    val cells = halves
      .groupBy(col("source"))
      .agg(
        sum(col("first_half")).as("n_first"),
        sum(lit(1L) - col("first_half")).as("n_second")
      )
    val totals = cells.agg(
      sum(col("n_first")).as("tot_first"),
      sum(col("n_second")).as("tot_second"))
    cells
      .crossJoin(broadcast(totals))
      .select(
        col("source"), col("n_first"), col("n_second"),
        microRatio(col("n_first"), greatest(col("tot_first"), lit(1L)))
          .as("first_share_ppm"),
        microRatio(col("n_second"),
          greatest(col("tot_second"), lit(1L)))
          .as("second_share_ppm")
      )
      .withColumn("drift_ppm",
        col("second_share_ppm") - col("first_share_ppm"))
  }

  /** q394: batch quality dispersion — the q191/q362 training order
    * cut into batches of 32, each batch's mean micro-quality taken
    * exactly (half-up over the batch's own size), and the five-point
    * envelope of those batch means. THE check that the epoch shuffle
    * actually homogenized quality across batches: a tight envelope
    * means every optimizer step sees the same quality mix; a fat one
    * means quality-correlated gradient noise survived the shuffle
    * (and q375's clumping made it into training). Batch means are
    * integers; the envelope picks are exact type-1 ranks on the
    * distributed total order over the batch-means frame (corpus/32
    * rows — never a single-partition window).
    */
  def batchQualityDispersion(
      spark: SparkSession,
      dir: String,
      batchSize: Int = 32
  ): DataFrame = {
    import graft.functions.IntMath.{idiv, idivHalfUp}
    val docs = Tables.documents(spark, dir)
    val d = docs
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .join(TextAnalysis.qualityMicroScoresFrom(docs), "doc_id")
    val ordered = Ranking
      .withGlobalRank(d, Seq(col("h").asc, col("doc_id").asc), "pos", 8)
      .withColumn("batch", idiv(col("pos") - 1, lit(batchSize.toLong)))
    val means = ordered
      .groupBy(col("batch"))
      .agg(count(lit(1)).as("n"), sum(col("q_micro")).as("s"))
      .select(col("batch"),
        idivHalfUp(col("s"), col("n")).as("mean_micro"))
    val ranked = Ranking.withGlobalRank(
      means, Seq(col("mean_micro").asc, col("batch").asc), "rn", 8)
    val tot = means.agg(count(lit(1)).as("cnt"))
    def pick(p: Int): Column =
      max(when(col("rn") === ceil(col("cnt") * p / 100),
        col("mean_micro")))
    ranked
      .crossJoin(broadcast(tot))
      .agg(
        max(col("cnt")).as("n_batches"),
        min(col("mean_micro")).as("min_mean_micro"),
        pick(10).as("p10_mean_micro"),
        pick(50).as("p50_mean_micro"),
        pick(90).as("p90_mean_micro"),
        max(col("mean_micro")).as("max_mean_micro")
      )
      .withColumn("envelope_micro",
        col("p90_mean_micro") - col("p10_mean_micro"))
  }

  /** q382: shard-assignment policy comparison — token skew per shard
    * under the two assignment families a training job actually
    * chooses between: content-blind HASH (hash60(doc_id) mod W, the
    * q232 policy — stateless, stable under re-runs) and BLOCK-CYCLIC
    * over storage order ((rank−1) mod W — what a naive "deal rows
    * round-robin as you read" reader does). Round-robin equalizes
    * doc COUNTS by construction but inherits any length clumping of
    * the storage order (the q375 signal) as token skew; hash
    * equalizes in expectation only. This emits both, same units,
    * side by side: per (policy, shard) exact doc/token counts and
    * the q232 imbalance gauge (tokens vs the half-up even share).
    *
    * Scale: hash policy is a pure map; block-cyclic rides the
    * distributed total order ([[Ranking.withGlobalRank]] — range
    * shuffle + offsets, never a single-partition window).
    */
  def shardPolicySkew(
      spark: SparkSession,
      dir: String,
      numShards: Int = 8
  ): DataFrame = {
    import graft.functions.IntMath.{idivHalfUp, microRatio}
    val base = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("t")
      )
    val hashAssigned = base.select(
      lit("hash").as("policy"),
      (graft.functions.TextFunctions.hash60(col("doc_id")) % numShards)
        .cast("long").as("shard"),
      col("t")
    )
    val cyclicAssigned = Ranking
      .withGlobalRank(base, Seq(col("doc_id").asc), "rn", 8)
      .select(
        lit("block_cyclic").as("policy"),
        ((col("rn") - 1) % numShards).cast("long").as("shard"),
        col("t")
      )
    val perShard = hashAssigned
      .union(cyclicAssigned)
      .groupBy(col("policy"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("n_tokens"))
    val tot = perShard
      .groupBy(col("policy"))
      .agg(sum(col("n_tokens")).as("g_tokens"))
    perShard
      .join(tot, "policy")
      .select(
        col("policy"),
        col("shard"),
        col("n_docs"),
        col("n_tokens"),
        // q232's overflow-safe two-step: even share first, then ppm
        microRatio(col("n_tokens"),
          idivHalfUp(col("g_tokens"), lit(numShards.toLong)))
          .as("vs_even_ppm")
      )
  }
}
