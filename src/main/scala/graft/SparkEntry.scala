package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2 (or a
  * §7.8 extension) expressed over the driver test tables; [[oracleSql]]
  * holds the DuckDB-dialect equivalent for the hash-match gate. Column
  * names are aliased identically on both sides (the driver sorts
  * columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** The driver's compare loads results into pandas and sorts by every
    * column; array/map/struct cells are unhashable there and abort the
    * check. Serialize complex columns to their canonical JSON form so
    * rows stay fully content-addressed but scalar. Binary becomes hex.
    */
  private def driverSafe(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, hex, lower, to_json}
    import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType, StructType}
    df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: ArrayType | _: MapType | _: StructType =>
          to_json(col(f.name)).as(f.name)
        case BinaryType => lower(hex(col(f.name))).as(f.name)
        case _ => col(f.name)
      }
    }.toIndexedSeq: _*)
  }

  /** q107 lake dirs already scheduled for JVM-exit deletion (one
    * shutdown hook per path, not per invocation).
    */
  private val lakeCleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.pricingSummary _),
    "q02_revenue_filter" -> (Relational.revenueFilter _),
    "q03_revenue_by_nation" -> (Relational.revenueByNation _),
    "q04_top_orders" -> (Relational.topOrders _),
    "q05_window_rank" -> (Relational.topOrdersPerCustomer _),
    "q06_distinct_counts" -> (Relational.distinctCounts _),
    "q07_union_merge" -> (Relational.unionMerge _),
    "q08_semi_anti_join" -> (Relational.customerOrderPresence _),
    "q09_status_pivot" -> (Relational.orderStatusPivot _),
    "q10_rollup_revenue" -> (Relational.rollupRevenue _),
    "q11_orders_by_month" -> (Relational.ordersByMonth _),
    "q12_mktsegment_share" -> (Relational.mktsegmentShare _),
    "q13_clean_text" -> (TextAnalysis.cleanDocs _),
    "q14_token_stats" -> (TextAnalysis.tokenStats _),
    "q15_quality_score" -> (TextAnalysis.qualityScores _),
    "q16_lang_id" -> (TextAnalysis.languageId _),
    "q17_fingerprint" -> (TextAnalysis.fingerprints _),
    "q18_task_fanout" -> (TextAnalysis.taskFanout _),
    "q19_lang_stats" -> (TextAnalysis.langStats _),
    "q20_dedup_exact" -> (Dedup.exactDedup _),
    "q21_ngram_jaccard" -> (Dedup.ngramJaccardPairsPpm _),
    "q22_minhash_lsh" -> (Dedup.minhashLshPairsPpm _),
    "q23_simhash" -> (Dedup.simhashDocs _),
    "q24_cosine_topk" -> (Similarity.cosineTopK _),
    "q25_ivf_topk" -> (Similarity.ivfTopK _),
    "q26_embedding_neardup" -> (Similarity.embeddingNearDupPairs _),
    "q27_tumbling_window" -> (Events.tumblingCounts _),
    "q28_sliding_window" -> (Events.slidingCounts _),
    "q29_sessionize" -> (Events.sessionize _),
    "q30_asof_join" -> (Events.purchaseAfterError _),
    "q31_multimodal_meta" -> (Events.multimodalMeta _),
    // Structured Streaming twin of q27: same aggregation through the
    // file streaming source + memory sink, hash-matched against the
    // same DuckDB oracle — streaming and batch must agree.
    "q32_stream_tumbling" -> ((s: SparkSession, dir: String) =>
      streaming.EventStreams.runAvailableNow(
        streaming.EventStreams
          .windowedCounts(streaming.EventStreams.readEvents(s, dir)),
        "q32_stream_tumbling_out",
        "complete")),
    // Jira reference-parity pipeline over checked-in fixtures (raw
    // nested JSON → flatten → fan-out → stats), both projects,
    // projected to oracle-comparable scalar shapes (array columns as
    // ','-joined strings, the distribution map as a sorted k:v csv).
    // Full nested-shape parity is additionally enforced by
    // JiraParitySpec against goldens produced by EXECUTING the
    // reference; qj02's DuckDB oracle reads those goldens directly,
    // so the driver gate compares engine output to actual reference
    // output.
    "qj01_jira_flatten" -> ((s: SparkSession, _: String) => {
      import org.apache.spark.sql.functions.{array_join, col}
      jira.JiraPipeline
        .flattenedIssues(s, jira.JiraPipeline.fixtureProjects)
        .select(
          col("issue_key"), col("issue_id"), col("project"),
          col("project_rank"), col("url"), col("title"),
          col("description"), col("status"), col("priority"),
          col("issue_type"), col("reporter"), col("assignee"),
          col("created"), col("updated"), col("resolved"),
          array_join(col("labels"), ",").as("labels_csv"),
          array_join(col("components"), ",").as("components_csv"),
          array_join(col("versions"), ",").as("versions_csv"),
          array_join(col("fix_versions"), ",").as("fix_versions_csv"),
          col("comment_count"))
    }),
    "qj02_jira_examples" -> ((s: SparkSession, _: String) => {
      import org.apache.spark.sql.functions.col
      jira.JiraPipeline
        .orderedCorpus(s, jira.JiraPipeline.fixtureProjects)
        .select(
          col("project_rank"), col("metadata.project").as("project"),
          col("issue_key"), col("created"), col("task_type"),
          col("instruction"), col("input"), col("output"))
    }),
    "qj03_jira_stats" -> ((s: SparkSession, _: String) => {
      import org.apache.spark.sql.functions._
      jira.JiraStats
        .perProject(
          jira.JiraPipeline.corpus(s, jira.JiraPipeline.fixtureProjects))
        .select(
          col("project"),
          col("total_examples"),
          array_join(
            transform(
              array_sort(map_entries(col("task_type_distribution"))),
              e => concat_ws(":", e.getField("key"), e.getField("value"))),
            ",").as("task_type_distribution_csv"),
          array_join(col("projects"), ",").as("projects_csv"),
          array_join(col("issue_types"), ",").as("issue_types_csv"),
          array_join(col("priorities"), ",").as("priorities_csv"),
          array_join(col("statuses"), ",").as("statuses_csv"))
    }),
    "q34_profile" -> (Profile.lineitemProfile _),
    "q37_simhash_pairs" -> (Dedup.simhashPairs _),
    // the composed pipeline: clean -> quality gate -> exact dedup ->
    // fan-out -> corpus stats, as one lazy DAG
    "q39_pipeline_e2e" -> (PipelineE2E.corpusPipeline _),
    // bucketed interval join: events -> their sessions; counts must
    // reproduce the sessionizer's own n_events
    "q40_range_join" -> (RangeJoin.eventsInSessions _),
    // interval join as analytics: errors-in-the-last-hour per purchase
    "q41_interval_counts" -> (RangeJoin.purchasesWithRecentErrors _),
    "q42_distribution_stats" -> (Profile.distributionStats _),
    "q43_cube" -> (Relational.cubeQuantities _),
    "q44_fuzzy_pairs" -> ((s: SparkSession, dir: String) =>
      Dedup.fuzzyNamePairs(s, dir)),
    // K5 filtered-subset export: deterministic filter + order + limit
    // over the fan-out (example_usage.py:208-213 semantics).
    "q38_filtered_subset" -> ((s: SparkSession, dir: String) =>
      TextAnalysis
        .taskFanout(s, dir)
        .filter(org.apache.spark.sql.functions.col("task_type") === "summarize")
        .orderBy("doc_id")
        .limit(100)),
    // Salted join (skew mitigation): result-identical to the plain
    // join by construction, so the oracle is the unsalted SQL.
    "q36_salted_join" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      Skew
        .saltedJoin(li, o, Seq("l_orderkey"), 8)
        .groupBy(col("o_orderpriority"))
        .agg(
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          count(lit(1)).as("n_rows")
        )
    }),
    // HLL sketch cardinalities — no SQL oracle (engine-specific
    // sketches); error bound asserted in ProfileSpec.
    "q35_approx_distinct" -> (Profile.cardinalitySketch _),
    // Partition-level multimodal decode (stubbed codec, real
    // mapPartitions plumbing). The 8-dim feature vector is flattened
    // to f0..f7 doubles so the stub decode is fully oracle-checkable
    // (the DuckDB side reimplements the rolling hash mod 2^64).
    "q33_multimodal_decode" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions.{col, element_at}
      val d = Multimodal.decodedDocuments(s, dir)
      d.select(
        (Seq("doc_id", "n_bytes", "width", "height", "channels").map(col) ++
          (0 until 8).map(i =>
            element_at(col("feature"), i + 1).cast("double").as(s"f$i"))): _*)
    }),
    // Streaming keyed latest-record dedup (mapGroupsWithState): the
    // late-update handling the reference lacks. Update-mode sink may
    // emit a key several times across batches; the terminal group-by
    // max is the deterministic "current winner" view, hash-matched
    // against a plain batch aggregate.
    "q45_stream_latest_dedup" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions.{col, max}
      streaming.EventStreams
        .runAvailableNow(
          streaming.EventStreams
            .latestByKey(streaming.EventStreams.readEvents(s, dir), "user_id", "ts"),
          "q45_stream_latest_dedup_out",
          "update")
        .groupBy(col("k"))
        .agg(max(col("latest_ts")).as("latest_ts"))
    }),
    // Stream-stream interval join (purchases ⋈ errors within the
    // preceding hour, watermark-bounded state). Inner-join emission is
    // complete per batch, so the pair set hash-matches the batch twin.
    "q46_stream_interval_join" -> ((s: SparkSession, dir: String) =>
      streaming.EventStreams.runAvailableNow(
        streaming.EventStreams
          .purchaseErrorJoin(streaming.EventStreams.readEvents(s, dir)),
        "q46_stream_interval_join_out",
        "append")),
    // Stateful streaming sessionization (flatMapGroupsWithState,
    // event-time timeout). Over a single AvailableNow data batch the
    // emitted set is deterministic: sessions closed by a later event,
    // plus trailing sessions whose 30-min timeout fired once the
    // no-data batch advanced the watermark to max(ts) - 10 min. The
    // oracle replays exactly that predicate over the batch
    // sessionization (watermark/timeout are millisecond-precision).
    "q47_stream_sessionize" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions.{col, round}
      streaming.EventStreams
        .runAvailableNow(
          streaming.EventStreams
            .sessionize(streaming.EventStreams.readEvents(s, dir))
            .toDF(),
          "q47_stream_sessionize_out",
          "append")
        .select(
          col("user_id"),
          col("session_start"),
          col("session_end"),
          col("n_events"),
          round(col("sum_value"), 2).as("sum_value")
        )
    }),
    // Multimodal frame sampling: payload-size-derived frame count,
    // every strideth index at 24fps — pure sequence+explode.
    "q48_frame_sample" -> (Multimodal.frameSample _),
    // Content-hash 80/10/10 split: shuffle-free, reproducible across
    // engines and cluster layouts (unlike randomSplit).
    "q49_train_test_split" -> (Sampling.trainTestSplit _),
    // Curriculum deciles over the quality score (exact ntile).
    "q50_quality_deciles" -> (Sampling.qualityDeciles _),
    // Corpus vocabulary: top-1000 tokens by frequency.
    "q51_vocab" -> (TextAnalysis.vocabulary _),
    // Sentence chunking with 1-based index per document.
    "q52_sentences" -> (TextAnalysis.sentences _),
    // Greedy sequence packing into 2048-token context windows.
    "q53_pack_windows" -> ((s: SparkSession, dir: String) =>
      TextAnalysis.packWindows(s, dir)),
    // Full outer join reconciliation (nulls survive on both sides).
    "q61_full_outer" -> (Relational.fullOuterReconciliation _),
    // Set operations: INTERSECT / EXCEPT over yearly active customers.
    "q63_set_ops" -> (Relational.customerSetOps _),
    // Fused language-ID marker counts + Catalyst argmax, gated.
    "q65_fused_lang_id" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions.col
      import graft.functions.LangCounts
      Tables
        .documents(s, dir)
        .select(col("doc_id"), LangCounts.langCounts(col("text")).as("lc"))
        .select(
          (col("doc_id") +:
            Seq("en", "de", "fr", "es", "zh")
              .map(l => col(s"lc.s_$l").as(s"s_$l"))) :+
            LangCounts.langFromCounts(col("lc")).as("predicted_lang"): _*)
    }),
    // BPE-ish (GPT-2 pre-tokenizer) token counting next to the
    // whitespace count — the context-budget estimate.
    "q66_bpe_tokens" -> (TextAnalysis.bpeTokenStats _),
    // Per-user lag/lead/moving-average event deltas — five window
    // functions over ONE partitioning+ordering (single shuffle).
    "q67_lag_lead" -> (Events.lagLeadDeltas _),
    // Irregular GROUPING SETS with grouping_id through the SQL
    // surface (rollup/cube cover only lattice prefixes).
    "q68_grouping_sets" -> (Relational.groupingSets _),
    // Per-label embedding centroids: posexplode → per-dim avg →
    // re-assembled vector; shuffle carries label×dim rows, not
    // vectors.
    "q69_label_centroids" -> (Similarity.labelCentroids _),
    // Sign-LSH bucketed near-dup pairs: candidates only within equal
    // 8-bit hyperplane-sign buckets, then exact cosine verify — the
    // collision-linear scale path for q26's bounded all-pairs.
    "q70_lsh_neardup" -> (Similarity.lshNearDupPairs _),
    // Stratified per-language down-sampling via the content-keyed
    // hash — the corpus-mixing knob, deterministic at any scale.
    "q71_stratified_sample" -> (Sampling.stratifiedSample _),
    // Near-dup cluster resolution: connected components (pointer-
    // doubling label propagation) over the q21 Jaccard pairs.
    "q72_dedup_clusters" -> (Dedup.dedupClusters _),
    // Benchmark decontamination: training docs sharing a 5-gram with
    // the broadcast eval-split shingle set.
    "q73_decontaminate" -> (Dedup.decontaminate _),
    // TF-IDF top-3 terms per doc — keyword extraction over the corpus.
    "q74_tfidf_terms" -> (TextAnalysis.tfidfTopTerms _),
    // Content-keyed shard + reproducible within-shard shuffle order.
    "q75_shard_assign" -> (Sampling.shardAssignment(_, _)),
    // Runtime bloom filter: sketch the build side's keys, prune the
    // probe side in its scan stage, exact semi join removes the fpp.
    "q76_bloom_semi_join" -> (RuntimeFilters.bloomSemiRevenue _),
    // Stream-static enrichment: streaming events ⋈ broadcast customer
    // dim (stateless join — no state store), then a running aggregate.
    "q77_stream_static_join" -> ((s: SparkSession, dir: String) =>
      streaming.EventStreams.runAvailableNow(
        streaming.EventStreams.segmentActivity(
          streaming.EventStreams.readEvents(s, dir),
          Tables.customer(s, dir)),
        "q77_stream_static_join_out",
        "complete")),
    // Canonical doc per near-dup cluster: quality-argmax survivor
    // selection over the q72 labels (keep-best, not keep-min-id).
    "q78_canonical_docs" -> (Dedup.canonicalDocs _),
    // RANGE-framed rolling window: per-user trailing-hour activity
    // keyed on epoch micros (value-based frame, not row-count).
    "q79_rolling_hour" -> (Events.rollingHourly _),
    // Exact per-language token-count quartiles (PERCENTILE_CONT
    // semantics) — the sequence-length profile.
    "q80_lang_percentiles" -> (TextAnalysis.langTokenPercentiles _),
    // Fixed-width quality histogram on the rounded score — binning is
    // integer arithmetic, engine-reproducible.
    "q81_quality_histogram" -> (TextAnalysis.qualityHistogram _),
    // Inverted-index posting lists for mid-df tokens (df ∈ [3,50]),
    // lists serialized sorted for the dtype-strict driver compare.
    "q82_posting_lists" -> (TextAnalysis.postingLists _),
    // Ordered funnel view→click→purchase: per-stage conditional min
    // joined back — three shuffles of filtered slices.
    "q83_funnel" -> (Events.funnel _),
    // Corpus bigram LM: top-3 next tokens per token with conditional
    // probability; rank and probability share one w1 partitioning.
    "q84_bigram_lm" -> (TextAnalysis.bigramLm _),
    // PageRank over the symmetrized near-dup graph: 8 power-iteration
    // rounds, each one join + one aggregate (two key-shuffles),
    // lineage-truncated per round.
    "q86_pagerank" -> (PageRank.nearDupPageRank _),
    // Native session_window aggregate — the idiomatic twin of q29's
    // manual lag/flag/running-sum sessionization.
    "q87_session_window" -> (Events.sessionWindowAgg _),
    // Value-bucketed deciles: broadcast percentile boundaries + 9
    // comparisons per row — the sort-free approx-quantile scale path.
    "q89_decile_bounds" -> (Sampling.decileByBoundaries _),
    // CDC MERGE apply: latest change per key via one struct-max agg,
    // joined into the base snapshot (delete/upsert/passthrough).
    "q90_cdc_apply" -> (Relational.cdcApply _),
    // Per-doc cross-entropy under the corpus bigram LM (add-one
    // smoothing) — model-based quality scoring next to q15's
    // heuristic one.
    "q91_bigram_xent" -> (TextAnalysis.bigramXent _),
    // Count-min sketch heavy hitters: exact top-20 terms with their
    // fixed-memory CMS estimates side by side (md5-seeded rows —
    // exactly SQL-replayable, unlike built-in count_min_sketch).
    "q92_cms_topk" -> (Sketches.cmsTopTerms(_, _)),
    // Distributed k-means over embeddings: broadcast-centroid assign,
    // one partial-agg shuffle per update round, per-round lineage
    // truncation; the oracle replays both Lloyd rounds as CTEs.
    "q93_kmeans" -> (Clustering.kmeansAssign(_, _)),
    // int8 scalar quantization of embeddings + reconstruction-error
    // audit (per-dim global min/max broadcast back over the scan).
    "q94_int8_quant" -> (Similarity.int8QuantError _),
    // Cohort retention matrix: first-activity cohorts × days-since.
    "q95_cohort_retention" -> (Events.cohortRetention _),
    // Substring-level dedup: 8-token span families shared by >= 2
    // docs, grouped on the portable span hash.
    "q96_dup_spans" -> (Dedup.duplicatedSpans(_, _)),
    // Weighted sampling without replacement (A-Res): content-keyed
    // u^(1/w) priorities, top-k via per-partition heaps.
    "q97_weighted_sample" -> (Sampling.weightedSample(_, _)),
    // Z-order layout: Morton-bucketed orders with per-bucket bounding
    // rectangles — two-dimensional data-skipping stats.
    "q98_zorder" -> (Layout.zorderBuckets _),
    // PMI collocations: top token pairs by pointwise mutual
    // information (selection on the rounded score — engine-exact).
    "q99_pmi" -> (TextAnalysis.pmiCollocations(_, _)),
    // Per-doc token Shannon entropy from one (doc, token) aggregate.
    "q100_entropy" -> (TextAnalysis.tokenEntropy _),
    // Streaming exact dedup: dropDuplicatesWithinWatermark (bounded
    // state) + running distinct-user counts; drained availableNow it
    // must equal the batch COUNT(DISTINCT).
    "q101_stream_dedup" -> ((s: SparkSession, dir: String) =>
      streaming.EventStreams.runAvailableNow(
        streaming.EventStreams.dedupWithinWatermark(
          streaming.EventStreams.readEvents(s, dir)),
        "q101_stream_dedup_out",
        "complete")),
    // Incremental batch-vs-corpus dedup: exact md5 semi join +
    // 3-gram containment near screen → exact_dup/near_dup/new.
    "q102_incremental_dedup" -> (Dedup.incrementalDedup _),
    // Histogram-quantile audit: fixed-20-bin approximate median vs
    // the exact interpolated median, per language.
    "q103_histogram_median" -> (TextAnalysis.histogramMedian(_, _)),
    // Training-mix reweighting: per-language token share → sampling
    // weight toward a fixed target mix.
    "q104_mix_reweight" -> (Sampling.mixReweight _),
    // Native as-of join: custom LogicalPlan + SparkStrategy +
    // sorted-merge SparkPlan (injected planner strategy) — same
    // semantics and oracle as q30's window-merge form.
    "q105_asof_native" -> (Events.purchaseAfterErrorNative _),
    // Multi-probe IVF: each query searches its 2 nearest clusters —
    // recovers Voronoi-boundary neighbors probe-1 misses.
    "q106_ivf_probe2" -> (Similarity.ivfTopKProbe(_, _)),
    // Stratified weighted sampling: A-Res priorities ranked within
    // each language — per-stratum quotas × length weighting.
    "q108_stratified_weighted" -> (Sampling.stratifiedWeightedSample(_, _)),
    // The one-row corpus summary card (counts, language
    // concentration, dup rate, mean quality).
    "q109_corpus_card" -> (TextAnalysis.corpusCard _),
    // Decorrelation family (TPC-H Q13/Q15/Q20/Q22 shapes): outer-join
    // aggregation, scalar subqueries, nested IN → semi join,
    // NOT EXISTS → anti join.
    "q110_cust_order_dist" -> (Subqueries.customerOrderDistribution _),
    // BPE merge-candidate table: corpus-weighted character-pair
    // counts over the distinct-word frequency table.
    "q114_bpe_pairs" -> (TextAnalysis.bpePairStats(_, _)),
    // Distributed BPE tokenizer TRAINING: one corpus pass for the
    // word vocab, then 8 merge rounds over the vocab (pair-count
    // shuffle + TakeOrdered(1) argmax + literal-replace merge per
    // round — the PageRank-style iterative pattern). Oracle unrolls
    // the identical 8 rounds as chained DuckDB CTEs.
    "q125_bpe_train" -> ((s: SparkSession, dir: String) =>
      operators.BpeTrain.train(s, dir, rounds = 8)),
    // The shipped artifact of the trainer: final per-word
    // segmentation after all learned merges.
    "q126_bpe_segment" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions.{array_join, col}
      operators.BpeTrain
        .segmentation(s, dir, rounds = 8)
        .select(col("w"), col("freq"),
          array_join(col("pieces"), ",").as("pieces_csv"),
          col("n_pieces"))
    }),
    // Interpolated trigram-LM perplexity filter (CCNet-style): LM
    // count tables from one corpus pass, docs scored by joining
    // distinct-trigram counts against them.
    "q127_trigram_ppl" -> (TextAnalysis.trigramPerplexity(_, _)),
    // Product quantization + ADC top-k: per-subspace codebooks
    // (deterministic init + 1 Lloyd round), 4-byte codes, broadcast
    // per-query lookup tables, exact-distance audit column.
    "q128_pq_adc" -> (Similarity.pqAdcTopK(_, _)),
    // Trained multinomial naive-Bayes lang classifier: one counting
    // pass to train, sparse log-posterior scoring join, per-doc
    // argmax + margin + self-audit vs the stored label.
    "q129_nb_langid" -> (TextAnalysis.nbLangId(_, _)),
    // Composed corpus-assembly manifest: dedup survivors ∩ ppl-kept
    // docs → deterministic hash shards with per-shard positions.
    "q130_training_manifest" -> (Sampling.trainingManifest(_, _)),
    // DSIR importance weights: hashed-ngram target/source likelihood
    // ratios from a fixed 1024-bucket table (always broadcast).
    "q131_dsir_weights" -> (Sampling.dsirWeights(_, _)),
    // Temperature-scaled multilingual mix: p^0.3 weights → integer
    // ppm hash thresholds → shuffle-free selection; per-lang summary.
    "q132_temperature_mix" -> (Sampling.temperatureMix(_, _)),
    // BM25 top-k retrieval: eval-slice queries (doc_id % 250) scored
    // against the corpus term index via posting joins — the
    // retrieval-based decontamination / retrievability-audit op.
    "q133_bm25_topk" -> (TextAnalysis.bm25TopK(_, _)),
    // The q125-trained tokenizer applied corpus-wide through a
    // vocab join carrying per-word piece counts.
    "q134_bpe_corpus_apply" -> (BpeTrain.corpusApply(_, _)),
    // SemDeDup: q93 k-means clusters → within-cluster cosine vs
    // lower-id mates → lowest-id representative survives.
    "q135_semantic_dedup" -> (Dedup.semanticDedup(_, _)),
    // CCNet-style segment dedup: disjoint 10-token segments, corpus-
    // wide keep-first on the segment hash, per-doc retention stats.
    "q136_segment_dedup" -> (Dedup.segmentDedup(_, _)),
    // Bloom-screen decontamination: eval shingles → 2^20-bit bitmap
    // (k=2), broadcast word-lookup screen + exact-membership audit.
    "q137_bloom_decontaminate" -> (Dedup.bloomDecontaminate(_, _)),
    // T5 span corruption: hash-masked positions → sentinel-collapsed
    // input + sentinel-prefixed target, one doc_id-keyed window pass.
    "q138_span_corruption" -> (ExampleGen.spanCorruption(_, _)),
    // Hard-negative mining: anchors × corpus scan, different-label
    // filter, per-anchor top-3 by cosine.
    "q139_hard_negatives" -> (Similarity.hardNegatives(_, _)),
    // Winnowing: per-doc window-min fingerprint selection, pair
    // overlap on the winnowed sets.
    "q140_winnow_fingerprints" -> ((s, d) => Dedup.winnowFingerprints(s, d)),
    // JL ±1 random projection 64→16 with a pair distortion audit.
    "q141_jl_projection" -> ((s, d) => Similarity.jlProjectDistortion(s, d)),
    // Gopher rule battery: per-rule stats + conjunctive keep.
    "q142_gopher_rules" -> (TextAnalysis.gopherRules(_, _)),
    // Asymmetric shingle containment |A∩B|/|A| (sub-doc duplication).
    "q143_shingle_containment" -> ((s, d) => Dedup.shingleContainment(s, d)),
    // FineWeb-style per-source cap; only oversized sources are ranked.
    "q144_source_cap" -> ((s, d) => Sampling.sourceCap(s, d)),
    // Distance-to-label-centroid z-score outlier audit.
    "q145_embedding_outliers" -> (Similarity.embeddingOutliers(_, _)),
    // Trained-BPE fertility (subwords/word) per language.
    "q146_lang_fertility" -> ((s, d) => BpeTrain.langFertility(s, d)),
    // Corpus-level distinct-n diversity for n = 1..3.
    "q147_corpus_diversity" -> (TextAnalysis.corpusDiversity(_, _)),
    // Zipf rank-frequency least-squares fit over the top vocab.
    "q148_zipf_fit" -> ((s, d) => TextAnalysis.zipfFit(s, d)),
    // Interpolated Kneser-Ney bigram LM table (D = 0.75).
    "q149_kn_bigram" -> (TextAnalysis.knBigram(_, _)),
    // UniMax epoch-capped language budget allocation (integer math).
    "q150_unimax_mix" -> ((s, d) => Sampling.unimaxAllocation(s, d)),
    // Reciprocal-rank fusion of BM25 and TF-IDF-cosine retrieval.
    "q151_hybrid_rrf" -> ((s, d) => TextAnalysis.hybridRrf(s, d)),
    // orders⋈lineitem off a bucketed lake: exchange-free SMJ.
    "q152_bucketed_join" -> ((s, d) => io.Bucketing.bucketedRevenueByPriority(s, d)),
    // Week rollup off a date-partitioned lake: planning-time pruning.
    "q153_partition_prune" -> ((s, d) => io.PartitionedLake.weeklyTypeRollup(s, d)),
    // DPO-style chosen/rejected preference pairs per (lang, source).
    "q154_preference_pairs" -> ((s, d) => Sampling.preferencePairs(s, d)),
    // Test-split 8-gram novelty vs the train split (contamination audit).
    "q155_ngram_novelty" -> ((s, d) => Dedup.ngramNovelty(s, d)),
    // Per-dimension z-score whitening of the embedding corpus.
    "q156_embedding_whiten" -> ((s, d) => Similarity.whitenEmbeddings(s, d)),
    // Top-1000 vocab coverage / OOV rate per language.
    "q157_vocab_coverage" -> ((s, d) => TextAnalysis.vocabCoverage(s, d)),
    // Next-event-prediction examples from per-user event streams.
    "q158_next_event" -> ((s, d) => Events.nextEventExamples(s, d)),
    // PPJoin prefix-filtered EXACT Jaccard>=0.5 self-join.
    "q159_prefix_filter_join" -> ((s, d) => Dedup.prefixFilterJoin(s, d)),
    // Corpus-specific stopword discovery (top-30 by document freq).
    "q160_stopword_discovery" -> ((s, d) => TextAnalysis.stopwordDiscovery(s, d)),
    // CCNet head/middle/tail perplexity thirds per language.
    "q161_ppl_buckets" -> ((s, d) => TextAnalysis.perplexityBuckets(s, d)),
    // 1/cluster-size sampling weights, normalized per language.
    "q162_dup_weights" -> ((s, d) => Sampling.dupWeightedSampling(s, d)),
    // Per-type rollup off the compacted small-file lake.
    "q163_compaction" -> ((s, d) => io.Compaction.compactedRollup(s, d)),
    // Best-B-tokens snapshot via the distributed global cumsum.
    "q164_token_budget" -> ((s, d) => Sampling.tokenBudgetSnapshot(s, d)),
    // Text-LSH ∪ embedding near-dup edges → one CC closure.
    "q165_multisignal_clusters" -> ((s, d) => Dedup.multiSignalClusters(s, d)),
    // Which sources copy from which: q143 pairs by source pair.
    "q166_source_overlap" -> ((s, d) => Dedup.sourceOverlapMatrix(s, d)),
    // Cheap quality score vs LM perplexity, fixed-width bins.
    "q167_quality_calibration" -> ((s, d) => TextAnalysis.qualityPplCalibration(s, d)),
    // KL(source ‖ corpus) over unigram token distributions.
    "q168_source_kl" -> ((s, d) => TextAnalysis.sourceKlDrift(s, d)),
    // Per-doc repeat counts materializing the UniMax allocation.
    "q169_epoch_expansion" -> ((s, d) => Sampling.epochExpansion(s, d)),
    // Self-retrieval MRR@10: probe the BM25 index with own prefixes.
    "q170_self_retrieval" -> ((s, d) => TextAnalysis.selfRetrievalMrr(s, d)),
    // Join-blowup pre-flight: skew + exact self-join cardinality.
    "q171_join_profile" -> ((s, d) => Relational.joinBlowupProfile(s, d)),
    // Cluster-granular split: near-dups never straddle train/test.
    "q172_cluster_split" -> ((s, d) => Sampling.clusterSafeSplit(s, d)),
    // Quota-per-(lang, quality-bin) balanced eval set.
    "q173_balanced_evalset" -> ((s, d) => Sampling.balancedEvalSet(s, d)),
    // Algebraic slice-merged corpus stats == direct stats.
    "q174_mergeable_stats" -> ((s, d) => Profile.mergeableStats(s, d)),
    // Per-source snapshot diff: stable/added/removed content hashes.
    "q175_snapshot_diff" -> ((s, d) => Profile.snapshotDiff(s, d)),
    // Quality mapped to its within-source percentile.
    "q176_score_normalization" -> ((s, d) => Sampling.scoreNormalization(s, d)),
    // BM25 top-20 recall set reranked by exact cosine → top-10.
    "q177_retrieve_rerank" -> ((s, d) => TextAnalysis.retrieveRerank(s, d)),
    // Adjacent-chunk positives + hash-picked cross-doc negatives.
    "q178_contrastive_pairs" -> ((s, d) => TextAnalysis.contrastiveChunkPairs(s, d)),
    // Per-source near-dup redundancy: docs vs keep-one survivors.
    "q179_source_dup_report" -> ((s, d) => Dedup.sourceDupReport(s, d)),
    // Trained logistic-regression quality gate (curated-vs-crawl):
    // 6 full-batch GD rounds, one 5-sum reduction each; per-doc score.
    "q180_lr_quality" -> ((s, d) => QualityLR.lrQualityGate(s, d)),
    // Streaming MinHash-LSH admission gate: per-band min-doc state,
    // suppressed iff any band bucket was claimed by an earlier doc.
    "q181_stream_neardup" ->
      ((s, d) => streaming.StreamNearDup.streamNearDupSuppress(s, d)),
    // Mergeable per-source MinHash union sketch → pairwise source
    // similarity from 8-long sketches, audited vs exact union Jaccard.
    "q182_source_minhash" -> ((s, d) => Sketches.sourceMinhashSimilarity(s, d)),
    // Residual IVF-PQ (IVFADC): coarse lists + PQ on residuals +
    // per-(query, list) LUTs, nprobe=2 — the billion-vector index.
    "q183_ivfpq" -> ((s, d) => Similarity.ivfPqTopK(s, d)),
    // Moore-Lewis cross-entropy-difference selection: in-domain vs
    // general trigram LM with a uniform floor for unseen n-grams.
    "q184_moore_lewis" -> ((s, d) => TextAnalysis.mooreLewisSelect(s, d)),
    // Streaming per-hour p50/p95 from a 20-cell histogram in state,
    // audited against the exact batch percentiles.
    "q185_stream_monitor" ->
      ((s, d) => streaming.EventStreams.streamQualityMonitor(s, d)),
    // Content-defined chunking dedup: hash-cut variable chunks,
    // corpus-wide keep-first, per-doc duplication report.
    "q186_cdc_chunks" -> ((s, d) => Dedup.cdcChunkDedup(s, d)),
    // Threshold sensitivity: pairs/flagged-docs/retention at every
    // Jaccard cutoff from one pass over the cached pair artifact.
    "q187_threshold_sweep" -> ((s, d) => Dedup.dedupThresholdSweep(s, d)),
    // Heaps-law V(N)=k·N^β vocabulary-growth fit per source — the
    // growth-law twin of the q148 Zipf rank-frequency fit.
    "q188_heaps_law" -> ((s, d) => TextAnalysis.heapsLawFit(s, d)),
    // Normalization-aware exact dedup: raw-key vs normalized-key
    // duplicate flags; norm-only = the yield canonicalization buys.
    "q189_normalized_dedup" -> ((s, d) => Dedup.normalizedDedup(s, d)),
    // Cohen's κ between the four quality gates (Gopher, perplexity,
    // LR, Moore-Lewis) — the stack-redundancy methodology check.
    "q190_gate_agreement" -> ((s, d) => TextAnalysis.gateAgreement(s, d)),
    // Per-epoch deterministic global training order: epoch-seeded
    // hash permutations via the exact two-pass global ranking.
    "q191_epoch_order" -> ((s, d) => Sampling.epochShuffleOrder(s, d)),
    // Embedding-space decontamination: cross-set banded LSH candidates
    // + exact cosine verify against the eval vectors.
    "q192_embedding_decon" ->
      ((s, d) => Similarity.embeddingDecontaminate(s, d)),
    // Hash-seeded bootstrap CI for per-source mean doc length —
    // reproducible error bars, B=32 resamples as one explode + join.
    "q193_bootstrap_ci" -> ((s, d) => Sampling.bootstrapCi(s, d)),
    // The four-gate curation manifest: dedup survivors ∩ Gopher ∩
    // ppl-cut ∩ LR-mean-cut ∩ Moore-Lewis → hash shards (q130 widened).
    "q194_four_gate_manifest" -> ((s, d) => Sampling.fourGateManifest(s, d)),
    // Gopher-style per-doc n-gram repetition battery.
    "q195_repetition_stats" -> (Repetition.repetitionStats _),
    // Cross-document duplicate 10-token windows at stride 5.
    "q196_dup_windows" -> (Repetition.duplicateWindows _),
    // Per-language exact-IQR token-length gate.
    "q197_iqr_length_gate" -> (Sampling.iqrLengthGate _),
    // MinHash estimate-vs-exact Jaccard error audit over q22 pairs.
    "q198_minhash_error" -> (Dedup.minhashErrorAudit _),
    // Calibration curve of the trained LR gate (exact score deciles).
    "q199_lr_calibration" -> (QualityLR.lrCalibration _),
    // Cumulative exact → near-dup → semantic dedup funnel.
    "q200_dedup_funnel" -> (Dedup.dedupFunnel _),
    // (lang, source) contingency vs independence, chi-square cells.
    "q201_composition_chi2" -> (TextAnalysis.compositionChiSquare _),
    // Packing-efficiency audit over the q53 window layout.
    "q202_packing_audit" -> ((s, d) => TextAnalysis.packingAudit(s, d)),
    // Near-dup pairs bucketed by the split assignment of their ends.
    "q203_split_leakage" -> (Dedup.splitLeakage _),
    // Good-Turing frequency spectrum + unseen-mass estimate.
    "q204_good_turing" -> ((s, d) => TextAnalysis.goodTuring(s, d)),
    // Per-cluster quality cap over the k-means assignment.
    "q205_cluster_cap" -> ((s, d) => Clustering.clusterCap(s, d)),
    // Quarantine list repairing the q203 cross-split leakage.
    "q207_leak_quarantine" -> (Dedup.leakQuarantine _),
    // Per-source length-profile rejection ratios + acceptance counts.
    "q209_length_match" -> ((s, d) => Sampling.lengthMatchSampler(s, d)),
    // KV-cache prefix-sharing curve at probe depths 1..16.
    "q210_prefix_sharing" -> ((s, d) => TextAnalysis.prefixSharing(s, d)),
    // Source reputation: per-source mean quality, shrunk toward the
    // corpus mean with 20 pseudo-observations.
    "q211_source_reputation" -> ((s, d) => TextAnalysis.sourceReputation(s, d)),
    // Eval-centric contamination: per eval doc, train hits + worst
    // containment.
    "q213_eval_contamination" -> (Dedup.evalContamination _),
    // Simplified silhouette per k-means cluster.
    "q215_silhouette" -> ((s, d) => Clustering.clusterSilhouette(s, d)),
    // Exact Mann-Whitney AUC of the trained LR gate.
    "q216_lr_auc" -> (QualityLR.lrAuc _),
    // Streaming LR admission: batch-trained model as stream literals.
    "q217_stream_quality_gate" ->
      ((s, d) => streaming.StreamQualityGate.streamLrAdmission(s, d)),
    // Per-cluster member-quality spread: the survivor-policy audit.
    "q218_cluster_spread" -> (Dedup.clusterQualitySpread _),
    // First-owner shingle attribution: what each source adds.
    "q219_source_novelty" -> (Dedup.sourceNovelty _),
    // Church-Gale burstiness + Poisson adaptation per mid-df term.
    "q220_burstiness" -> (TextAnalysis.termBurstiness _),
    // Raw vs dedup-surviving corpus mass per source.
    "q221_dedup_sizes" -> (Dedup.dedupAdjustedSizes _),
    // Cross-video duplicate-frame audit on the stub fingerprints.
    "q222_frame_dedup" -> (Multimodal.frameDedup _),
    // Greedy reputation-ranked token-budget admission per source.
    "q223_admission_plan" -> ((s, d) => Sampling.sourceAdmissionPlan(s, d)),
    // Monroe-style log-odds distinctive terms, src0 vs the rest.
    "q224_fightin_words" -> ((s, d) => TextAnalysis.fightinWords(s, d)),
    // Cross-source near-dup pairs oriented by arrival order.
    "q225_copy_flow" -> (Dedup.copyFlow _),
    // Majority-vote ensemble over the four quality gates.
    "q226_gate_ensemble" -> (TextAnalysis.gateEnsemble _),
    // Entropy + importance-weight ESS per sampling temperature.
    "q227_mix_sweep" -> (Sampling.mixTemperatureSweep _),
    // Span-level packed layout: (window, doc, tok range) writer map.
    "q228_pack_spans" -> ((s, d) => TextAnalysis.packSpans(s, d)),
    // Per-gate unique rejection mass: the delete-a-gate input.
    "q229_gate_ablation" -> (TextAnalysis.gateAblation _),
    // Kept-set churn between temperatures 0.3 and 0.7 per language.
    "q230_mix_churn" -> ((s, d) => Sampling.mixChurn(s, d)),
    // Online q53 packer: one token cursor of state per language.
    "q231_stream_pack" ->
      ((s, d) => streaming.StreamPack.streamPackWindows(s, d)),
    // Per-shard token balance: the straggler forecast.
    "q232_shard_balance" -> ((s, d) => Sampling.shardBalance(s, d)),
    // Power-of-two length classes with padding-waste ppm.
    "q233_batch_shape" -> (TextAnalysis.batchShapeHistogram _),
    // One-way ANOVA F per embedding dimension, labels as groups.
    "q234_label_separability" -> (Clustering.labelSeparability _),
    // Sorted-neighborhood (merge/purge) LCP pairs, prefix-blocked.
    "q235_sorted_neighbors" -> ((s, d) => Dedup.sortedNeighborPairs(s, d)),
    // Label-balanced batch assignment (<= 1 per label per batch).
    "q236_balanced_batches" -> (Clustering.balancedBatches _),
    // Exponentially-decayed event counts at three half-lives.
    "q237_decay_counts" -> (Events.decayCounts _),
    // Adjusted Rand Index: q93 k-means clusters vs ground-truth labels.
    "q238_cluster_ari" -> (Clustering.clusteringAgreement _),
    // Mean pairwise cosine per label via the sum-vector identity.
    "q239_isotropy" -> (Similarity.embeddingIsotropy _),
    // Leave-one-out exact 1-NN label accuracy on an eval slice.
    "q240_nn_label_eval" -> (Similarity.nnLabelEval _),
    // Top principal component by 4-round distributed power iteration.
    "q241_pc1_power" -> ((s, d) => Similarity.pc1Power(s, d)),
    // Rank-biased overlap between exact and IVF probe-2 rankings.
    "q242_rank_rbo" -> (Similarity.rankAgreementRbo _),
    // Competence-based curriculum entry step per document.
    "q243_curriculum" -> ((s, d) => Sampling.curriculumPacing(s, d)),
    // 5-NN label-consensus mislabel screen over the labeled vectors.
    "q244_label_consensus" -> (Similarity.labelConsensus _),
    // Deterministic round-robin source-interleaved training order.
    "q245_source_interleave" -> (Sampling.sourceInterleaveOrder _),
    // Cross-language duplicate pairs via shared winnow fingerprints.
    "q246_crosslang_dups" -> (Dedup.crossLanguageDups _),
    // Per-source token-mass Gini (doc-size inequality gauge).
    "q247_source_gini" -> (Sampling.sourceTokenGini _),
    // Per-cluster label purity and entropy of the q93 clustering.
    "q248_cluster_purity" -> (Clustering.clusterPurity _),
    // Tie-corrected Spearman + Pearson between length and quality.
    "q249_length_quality_corr" -> (TextAnalysis.lengthQualityCorrelation _),
    // Padding-waste curve of the unpacked loader at 4 context lengths.
    "q250_padding_curve" -> (TextAnalysis.paddingWasteCurve _),
    // Symbol/digit-density content-type tagging (code/numeric/prose).
    "q251_content_type" -> (TextAnalysis.contentTypeTags _),
    // Flesch reading-ease per document from one scan.
    "q252_readability" -> (TextAnalysis.readability _),
    // Novelty-decay curve over arrival buckets (first-seen shingles).
    "q253_novelty_decay" -> ((s, d) => Dedup.noveltyDecay(s, d)),
    // Hourly burst z-scores vs trailing 24 observed buckets.
    "q254_burst_flags" -> (Events.burstFlags _),
    // Pairwise source JS divergence over the top-1000 terms.
    "q255_source_style" -> ((s, d) => TextAnalysis.sourceStyleMatrix(s, d)),
    // Top repeated 5-token prefixes/suffixes per source (boilerplate).
    "q256_boilerplate_edges" -> (TextAnalysis.boilerplateEdges _),
    // Per-user event-type entropy profile.
    "q257_user_profile" -> (Events.userBehaviorProfile _),
    // Token-weighted quality deciles via the two-level cumsum.
    "q258_token_deciles" -> ((s, d) => Sampling.tokenWeightedQualityDeciles(s, d)),
    // Per-source quality drift: bucket means + OLS slope per source.
    "q259_quality_drift" -> ((s, d) => Sampling.sourceQualityDrift(s, d)),
    // Embedding integrity: zero/NaN/dup vectors + norm envelope.
    "q260_embedding_integrity" -> (Similarity.embeddingIntegrity _),
    // Inter-arrival gap moments + CV² burstiness per event type.
    "q261_interarrival" -> (Events.interArrivalStats _),
    // First-order event-type transition matrix, row-normalized.
    "q262_event_transitions" -> (Events.eventTransitions _),
    // Inverse-frequency capped oversampling plan per label.
    "q263_oversampling_plan" -> ((s, d) => Sampling.oversamplingPlan(s, d)),
    // Affine quantizer MSE/SNR sweep at 2/4/8 bits.
    "q264_quant_sweep" -> (Similarity.quantizationSweep _),
    // Exact recall@5 of the IVF probe topology at nprobe 1-4.
    "q265_recall_curve" -> (Similarity.recallVsProbe _),
    // Character-unigram entropy per language.
    "q266_char_entropy" -> (TextAnalysis.charEntropy _),
    // Standardized TTR over each source's first 1000 tokens.
    "q267_standardized_ttr" -> ((s, d) => TextAnalysis.standardizedTtr(s, d)),
    // Largest-remainder integer budget apportionment per cell.
    "q268_apportionment" -> ((s, d) => Sampling.budgetApportionment(s, d)),
    // Hourly cross-correlation between type pairs at lags -3..3.
    "q269_cross_correlation" -> ((s, d) => Events.crossCorrelation(s, d)),
    // Session-level event-type co-occurrence PMI.
    "q270_session_pmi" -> (Events.sessionTypePmi _),
    // Head/torso/tail vocabulary strata by cumulative coverage.
    "q271_vocab_strata" -> (TextAnalysis.vocabCoverageStrata _),
    // CUBE over (source, lang, content_class) with token mass.
    "q272_composition_cube" -> (TextAnalysis.compositionCube _),
    // ARI between the J>=0.3 and J>=0.6 dedup closures.
    "q273_threshold_ari" -> ((s, d) => Dedup.thresholdClusterAgreement(s, d)),
    // LCP/LCS/edit-region anatomy of near-dup pairs at J>=0.3.
    "q274_neardup_anatomy" -> ((s, d) => Dedup.nearDupAnatomy(s, d)),
    // Median/MAD modified z-score quality outliers per source.
    "q275_robust_outliers" -> (Sampling.robustQualityOutliers _),
    // Per-document first-owner shingle novelty.
    "q276_doc_novelty" -> (Dedup.docNovelty _),
    // Streaming transition detection (one struct of state per user);
    // drained counts must equal the batch q262 lag window.
    "q277_stream_transitions" -> (streaming.EventStreams.streamTransitionCounts _),
    // Cosine histogram over deterministic lattice pairs.
    "q278_cosine_histogram" -> (Similarity.cosineHistogram _),
    // Exact two-sample KS of each source's quality vs the corpus.
    "q279_source_ks" -> (Sampling.sourceQualityKs _),
    // Day-of-week × hour-of-day activity heatmap with peak flags.
    "q280_calendar_profile" -> (Events.calendarProfile _),
    // Jarque-Bera normality audit of quality per source.
    "q281_normality_audit" -> (Sampling.qualityNormalityAudit _),
    // Similarity-banded deterministic review batch (3 pairs/band).
    "q282_review_batch" -> ((s, d) => Dedup.reviewBatch(s, d)),
    // Tie-corrected Mann-Whitney U of quality per source vs rest.
    "q283_mannwhitney_drift" -> (Sampling.mannWhitneyDrift _),
    // Benjamini-Hochberg FDR step-up over the KS drift battery.
    "q284_ks_fdr" -> (Sampling.ksDriftFdr _),
    // Theil-T between/within decomposition of token inequality.
    "q285_theil_decomposition" -> (Sampling.theilDecomposition _),
    // Head-vs-tail distinct-vocabulary concentration per source.
    "q286_lead_bias" -> (TextAnalysis.leadBias _),
    // Docs/tokens/mean-quality frontier across ten quality cuts.
    "q287_quality_yield" -> (Sampling.qualityYieldCurve _),
    // MI / uncertainty coefficient of each gate vs doc metadata.
    "q288_gate_mi" -> (TextAnalysis.gateMiScreen _),
    // Kish effective sample size of the q132 temperature mix.
    "q289_mix_ess" -> ((s, d) => Sampling.mixEffectiveSampleSize(s, d)),
    // Tokens lost to single-window truncation across 5 context sizes.
    "q290_truncation_loss" -> (TextAnalysis.truncationLossCurve _),
    // Four band geometries of one 12-perm signature vs exact truth.
    "q291_lsh_tuning" -> ((s, d) => Dedup.lshBandTuning(s, d)),
    // 10%-trimmed vs raw mean of quality per source.
    "q292_trimmed_mean" -> ((s, d) => Sampling.trimmedMeanGap(s, d)),
    // Exact per-source deciles vs corpus deciles with deltas.
    "q293_qq_drift" -> (Sampling.qqDecileDrift _),
    // NB lang-ID confusion matrix with margin diagnostics.
    "q294_lang_confusion" -> (TextAnalysis.langConfusionAudit _),
    // Deterministic 200-replicate randomization test, top-2 sources.
    "q295_perm_test" -> ((s, d) => Sampling.meanDiffPermutationTest(s, d)),
    // Hourly-count autocorrelation at lags 1/24/168 per event type.
    "q296_hourly_acf" -> (Events.hourlyAcf _),
    // ESS / worst repetition across five temperature exponents.
    "q297_alpha_sweep" -> ((s, d) => Sampling.mixAlphaSweep(s, d)),
    // Minimum detectable-shift sample size per source vs actual n.
    "q298_power_audit" -> (Sampling.samplePowerAudit _),
    // Length-standardized (Kitagawa) quality gap per source.
    "q299_adjusted_quality" -> (Sampling.compositionAdjustedQuality _),
    // Exact Shapley split of the four-gate stack's kill count.
    "q300_gate_shapley" -> (TextAnalysis.gateShapley _),
    // Streaming burst detector drained ≡ batch q254 minus open hours.
    "q301_stream_bursts" -> (streaming.EventStreams.streamBurstFlags _),
    // k-occurrence (hubness) histogram of the exact 5-NN graph.
    "q302_hubness" -> (Similarity.hubnessAudit _),
    // KMV vs exact distinct tokens per source with ppm error.
    "q303_kmv_error" -> (Sketches.kmvSourceTokenError _),
    // PPS systematic token sample: exact-B picks vs entitlement.
    "q304_systematic_sample" ->
      ((s, d) => Sampling.systematicTokenSample(s, d)),
    // Neyman vs proportional allocation, Hamilton-rounded to budget.
    "q305_neyman_alloc" -> ((s, d) => Sampling.neymanAllocation(s, d)),
    // Hill tail index of doc token counts per source.
    "q306_hill_tail" -> (Sampling.hillTailIndex _),
    // Energy-gated audio segments via gaps-and-islands merging.
    "q307_audio_segments" -> (Multimodal.audioSegments _),
    // Closed-form CUSUM level-shift detection per event type.
    "q308_cusum" -> (Events.cusumShifts _),
    // Per-(source, pii_type) census: docs affected, matches, chars.
    "q309_pii_census" -> (TextAnalysis.piiCensus _),
    // Coverage-floored 5% eval holdout per (source, lang) cell.
    "q310_coverage_holdout" -> ((s, d) => Sampling.coverageHoldout(s, d)),
    // Per-dimension mean drift between even/odd vec_id snapshots.
    "q311_embedding_drift" -> (Similarity.embeddingSnapshotDrift _),
    // Optimal Bloom bits/hashes per source at two target FPPs.
    "q312_bloom_plan" -> (Sketches.bloomSizingPlan _),
    // Character mass per writing-system class per source.
    "q313_script_census" -> (TextAnalysis.scriptCensus _),
    // Joint padding/truncation cost frontier across 6 lengths.
    "q314_context_cost" -> (TextAnalysis.contextCostFrontier _),
    // Cluster size vs 2-core size on the J >= 0.5 dup graph.
    "q315_core_audit" -> ((s, d) => Dedup.coreAudit(s, d)),
    // Top-3 user excess contributions for every burst hour.
    "q316_burst_attribution" -> (Events.burstAttribution _),
    // AMS F2 sketch (R=64) vs exact second moment per source.
    "q317_ams_f2" -> (Sketches.amsF2Audit _),
    // Omnibus Kruskal-Wallis rank test across all sources.
    "q318_kruskal_wallis" -> (Sampling.kruskalWallis _),
    // Cochran's Q omnibus strictness test across the four gates.
    "q319_cochran_q" -> (TextAnalysis.cochranQ _),
    // Calendar-profile residual anomalies vs raw q254 bursts.
    "q320_deseasonalized" -> (Events.deseasonalizedAnomalies _),
    // Per-from-type chi-square stationarity of the transition matrix.
    "q321_transition_stability" -> (Events.transitionStationarity _),
    // Two-proportion z + BH step-up per (gate, source) cell.
    "q322_gate_fairness" -> (TextAnalysis.gateFairnessBattery _),
    // Chapman capture-recapture estimate of the near-dup pair count.
    "q323_capture_recapture" -> ((s, d) => Dedup.captureRecapture(s, d)),
    // Deterministic triplet violation rate per embedding label.
    "q324_triplet_violations" ->
      ((s, d) => Similarity.tripletViolations(s, d)),
    // Top-50 drifted terms across the doc_id midpoint split.
    "q325_vocab_drift" -> (TextAnalysis.vocabMidpointDrift _),
    // Weighted quality-component means + binding constraint.
    "q326_quality_components" -> (TextAnalysis.qualityComponents _),
    // Variance share of each 8-dim PQ subspace (the OPQ gauge).
    "q327_pq_variance" -> (Similarity.pqSubspaceVariance _),
    // q115's stages re-accounted in tokens (the budget view).
    "q328_token_funnel" -> (TextAnalysis.tokenFunnel _),
    // 1-bit minwise estimator audit by exact-Jaccard band.
    "q329_bbit_minwise" -> ((s, d) => Dedup.bBitMinwiseAudit(s, d)),
    // Quasi-identifier cells below k=5 per source (release check).
    "q330_k_anonymity" -> ((s, d) => Sampling.kAnonymityCensus(s, d)),
    // Outgoing-distribution entropy per from-type + corpus rate.
    "q331_entropy_rate" -> (Events.entropyRate _),
    // Per-language thresholds matching the global gate pass rate.
    "q332_rate_matched" -> (Sampling.rateMatchedThresholds _),
    // Quality ACF over doc_id order at lags 1/10/100.
    "q333_order_acf" -> (Sampling.qualityOrderAcf _),
    // Candidate-pair volume and yield per source pair.
    "q334_lsh_cost" -> ((s, d) => Dedup.lshCostAttribution(s, d)),
    // Adjacent-frame cosine cuts per doc (the q116 feature seam).
    "q335_scene_cuts" -> (Multimodal.sceneCuts _),
    // Brown-Forsythe spread-equality test across sources.
    "q336_brown_forsythe" -> (Sampling.brownForsythe _),
    // Per-source length-quality OLS slope vs the pooled slope.
    "q337_slope_heterogeneity" -> (Sampling.slopeHeterogeneity _),
    // Bytes/chars/tokens conversion table per language.
    "q338_byte_economics" -> (TextAnalysis.byteEconomics _),
    // Median-of-pairwise-slopes robust trend per source.
    "q339_theil_sen" -> ((s, d) => Sampling.theilSenTrend(s, d)),
    // Gate pass-rate drift across the doc_id midpoint halves.
    "q340_gate_drift" -> (TextAnalysis.gatePassDrift _),
    // What keep-the-best buys over keep-min-id, by cluster size.
    "q341_survivor_uplift" -> ((s, d) => Dedup.survivorUplift(s, d)),
    // Duplicate arrival-gap coverage bands (streaming TTL sizing).
    "q342_dup_gaps" -> ((s, d) => Dedup.dupArrivalGaps(s, d)),
    // Holdout vs train mean-quality z per source (q310 audit).
    "q343_holdout_rep" -> (Sampling.holdoutRepresentativeness _),
    // Pass-rate curve per (gate, length-digit stratum).
    "q344_gate_curves" -> (TextAnalysis.gatePassCurves _),
    // Exact p50/p95/max distinct users per hour per type.
    "q345_concurrency" -> (Events.concurrencyPercentiles _),
    // IDF-weighted Jaccard with verdict flips at the 0.5 cut.
    "q346_weighted_jaccard" -> ((s, d) => Dedup.weightedJaccardPairs(s, d)),
    // Reduction ratio vs pair completeness for three blockers.
    "q347_blocking_quality" -> ((s, d) => Dedup.blockingQuality(s, d)),
    // Exact-dup mass exposed per normalization stage.
    "q348_normalization_lift" -> ((s, d) => Dedup.normalizationLift(s, d)),
    // Tokens removed by keep-the-best dedup, per source.
    "q349_dedup_savings" -> ((s, d) => Dedup.dedupTokenSavings(s, d)),
    // Top-5 three-step event paths per starting type.
    "q350_event_paths" -> (Events.eventPaths _),
    // Rule-based lang-vs-script mislabel rate per language.
    "q351_script_consistency" -> (TextAnalysis.scriptLangConsistency _),
    // Consecutive-doc_id source runs: clumping in storage order.
    "q352_source_runs" -> (Sampling.sourceRunLengths _),
    // Exact p50/p95 dwell seconds per transition pair.
    "q353_transition_dwell" -> (Events.transitionDwell _),
    // Exact short-circuit cost of all 24 gate orderings.
    "q354_gate_ordering" -> (TextAnalysis.gateOrderingPlan _),
    // Mean event value in burst vs normal hours per type.
    "q355_burst_value" -> (Events.burstValueImpact _),
    // Exact five-point token-length summary per language.
    "q356_length_five_point" -> (TextAnalysis.lengthFivePoint _),
    // Exact five-point events-per-user summary per type.
    "q357_user_five_point" -> (Events.userActivityFivePoint _),
    // Top-1%-user value share per type (whale concentration).
    "q358_value_concentration" -> (Events.valueConcentration _),
    // Week-over-week event growth per type.
    "q359_weekly_growth" -> (Events.weeklyGrowth _),
    // One-row net-trainable-token ledger across all stages.
    "q360_trainable_tokens" -> (Sampling.trainableTokens _),
    // Tokenizer fertility + compute tax per language, integer milli.
    "q361_tokenizer_fertility" -> (TextAnalysis.tokenizerFertility _),
    // Batch-composition diversity over the shuffled order, B = 32.
    "q362_batch_diversity" -> ((s, d) => Sampling.batchDiversity(s, d)),
    // 10-stopword function-word profile L1 drift per source.
    "q363_stopword_drift" -> (TextAnalysis.stopwordProfileDrift _),
    // Top-3 3-token document prefixes per source (boilerplate).
    "q364_boilerplate_prefixes" ->
      ((s, d) => TextAnalysis.boilerplatePrefixes(s, d)),
    // Removable-dup-mass share in the top-k clusters, k lattice.
    "q365_dup_concentration" -> (Dedup.dupMassConcentration _),
    // (user, hour)-context co-occurrence lift per type pair.
    "q366_type_lift" -> (Events.typeCooccurrenceLift _),
    // Mann-Kendall S on arrival-bucket median lengths, pure integer.
    "q367_length_trend_mk" -> (Sampling.lengthTrendMk _),
    // Chi-square uniformity of hash60 mod 256, exact integer milli.
    "q368_hash_uniformity" -> ((s, d) => Sampling.hashUniformity(s, d)),
    // Maximal adjacent-duplicate runs per source in storage order.
    "q369_adjacent_dup_runs" -> (Sampling.adjacentDupRuns _),
    // Exact P10/P50/P90 micro-quality envelope per language.
    "q370_quality_bands" -> (TextAnalysis.qualityBandsByLang _),
    // Simpson token concentration per source, exact integer ppm.
    "q371_simpson_diversity" -> (TextAnalysis.simpsonConcentration _),
    // Orphans/childless/dangling keys across the relational spine.
    "q372_referential_integrity" -> (Relational.referentialIntegrity _),
    // Benford first-digit audit on order totals, pinned-constant ppm.
    "q373_benford_digits" -> (Relational.benfordAudit _),
    // Kendall C/D/tie pair counts, length vs quality, hash sample.
    "q374_kendall_tau" -> (TextAnalysis.kendallLengthQuality _),
    // Wald-Wolfowitz runs around the per-source median in doc order.
    "q375_quality_runs" -> (TextAnalysis.qualityRunsTest _),
    // lang x source contingency: expected milli + cell chi2 micro.
    "q376_lang_source_contingency" ->
      (TextAnalysis.langSourceContingency _),
    // Exclusive type/token mass per source, exact ppm.
    "q377_vocab_specificity" -> (TextAnalysis.vocabSpecificity _),
    // Time-to-first-purchase life table in whole-day offsets.
    "q378_purchase_survival" -> (Events.purchaseSurvival _),
    // Direct vs collateral quarantine mass per source (q73 x q207).
    "q379_blast_radius" -> (Dedup.contaminationBlastRadius _),
    // Exact-dup rate per exact ntile(10) length decile.
    "q380_dup_by_length" -> (Dedup.dupRateByLength _),
    // Global-vs-per-lang median cut: admissions and flip counts.
    "q381_threshold_transfer" -> (TextAnalysis.thresholdTransfer _),
    // Hash vs block-cyclic shard policy: token skew side by side.
    "q382_shard_policy" -> ((s, d) => Sampling.shardPolicySkew(s, d)),
    // Cross-doc repeated 8-gram incidence mass per source.
    "q383_template_ngrams" -> (TextAnalysis.templateNgramMass _),
    // Docs within +-w of the per-lang median quality, w lattice.
    "q384_borderline_band" -> (TextAnalysis.borderlineBand _),
    // TTL'd streaming LSH admission: only a RECENT bucket suppresses.
    "q385_stream_ttl_dedup" ->
      ((s, d) => streaming.StreamNearDup.streamTtlNearDup(s, d)),
    // Within-cluster length spread per cluster-size band.
    "q386_cluster_spread_bands" -> (Dedup.clusterLengthSpread _),
    // Multi-source cluster share per cluster-size band.
    "q387_cross_source_clusters" -> (Dedup.crossSourceClusters _),
    // Token savings at 4 Jaccard cutoffs, integer cross-multiplied.
    "q388_savings_sweep" -> (Dedup.savingsSweep _),
    // Arrival span of template 8-grams: burst vs perennial.
    "q389_template_span" -> (TextAnalysis.templateSpan _),
    // Min/max daily traffic share per event type, exact ppm.
    "q390_share_stability" -> (Events.dailyShareStability _),
    // Edge milli-Jaccard stats per cluster-size band.
    "q391_cluster_tightness" -> (Dedup.clusterTightness _),
    // Arrival gap structure per source: max vs mean, exact milli.
    "q392_source_spacing" -> (Sampling.sourceSpacing _),
    // P10/P50/P90 quality envelope: dup members vs clean docs.
    "q393_dup_quality" -> (TextAnalysis.dupQualityProfile _),
    // Five-point envelope of per-batch mean quality, batch = 32.
    "q394_batch_dispersion" ->
      ((s, d) => Sampling.batchQualityDispersion(s, d)),
    // Within vs cross-source near-dup edges, milli-Jaccard stats.
    "q395_edge_provenance" -> (Dedup.edgeProvenance _),
    // Exact P50 order->first-ship delay days per priority.
    "q396_ship_latency" -> (Relational.shipLatencyProfile _),
    // IVF cell occupancy census over the shared assignment seam.
    "q397_ivf_balance" -> (Similarity.ivfCellBalance _),
    // Parts by distinct-supplier band; single-source fragility.
    "q398_part_sourcing" -> (Relational.partSourcingCensus _),
    // Orders by lineitem-count band incl. 0-line orphans.
    "q399_order_fanout" -> (Relational.orderFanoutCensus _),
    // Round-9 composite: quarantine -> per-lang cut -> retention.
    "q400_round9_manifest" -> (Sampling.round9Manifest _),
    // Near-dup pair pressure per 100-id arrival bucket.
    "q401_dup_bursts" -> (Dedup.dupBurstTimeline _),
    // Lang-ID argmax margin census per detected language.
    "q402_langid_margin" -> (TextAnalysis.langIdMargin _),
    // Top-20 co-purchased part pairs by exact support.
    "q403_copurchase" -> (Relational.coPurchasePairs _),
    // Decontamination flagged mass at shingle widths 3/5/8.
    "q404_decon_widths" -> (Dedup.deconWidthSweep _),
    // Simpson predictability of each type's next-event distribution.
    "q405_transition_predictability" ->
      (Events.transitionPredictability _),
    // Confidence/lift in exact milli over support >= 2 pairs.
    "q406_association_rules" -> (Relational.associationRules _),
    // Eval vs train composition shares per (lang, source) cell.
    "q407_eval_representativeness" ->
      (Sampling.evalRepresentativeness _),
    // Kendall concordance between hourly volume and errors.
    "q408_load_error_concordance" -> (Events.loadErrorConcordance _),
    // Lateness bands vs the running event-time max (prefix-max).
    "q409_late_events" -> (Events.lateEventCensus _),
    // Exact five-point of RAW value doubles per event type.
    "q410_value_five_point" -> (Events.valueFivePoint _),
    // Frequency x recency customer cross-tab, exact ppm shares.
    "q411_rf_banding" -> (Relational.rfBanding _),
    // Session counts/shape at 5/30/120-minute gaps in one pass.
    "q412_session_gap_sweep" -> (Events.sessionGapSweep _),
    // q235's machinery on reversed tokens: common-SUFFIX pairs.
    "q413_suffix_neighbors" ->
      ((s, d) => Dedup.suffixNeighborPairs(s, d)),
    // Identical event-type profiles: twin-group census.
    "q414_behavioral_twins" -> (Events.behavioralTwins _),
    // Ordering-invariant violations: purchase<signup, click<view.
    "q415_sequence_violations" -> (Events.sequenceViolations _),
    // Five-point of lines per supplier + hot-supplier share.
    "q416_supplier_load" -> (Relational.supplierLoadProfile _),
    // Surviving near-dup edges among q72 survivors (must be 0).
    "q417_dedup_idempotence" -> (Dedup.dedupIdempotence _),
    // KMV register algebra: union/intersection estimates vs exact.
    "q418_kmv_set_algebra" -> (Sketches.kmvSetAlgebra _),
    // Kendall counts between the three quality components.
    "q419_component_concordance" ->
      (TextAnalysis.componentConcordance _),
    // Mergeable modular hash-sum receipt of the admitted set.
    "q420_admission_receipt" -> (Sampling.admissionReceipt _),
    // First-10 vs steady-state mean quality per source.
    "q421_early_sample_bias" -> (Sampling.earlySampleBias _),
    // Five-point of |rank_seed1 - rank_seed2| displacement.
    "q422_shuffle_displacement" -> (Sampling.shuffleDisplacement _),
    // Simpson probe-cost of the IVF occupancy vs the 1/k ideal.
    "q423_ivf_probe_cost" -> (Similarity.ivfProbeCost _),
    // The q420 receipt as a streaming aggregation, drained.
    "q424_stream_receipt" ->
      ((s, d) => streaming.StreamReceipt.streamIngestReceipt(s, d)),
    // l_linenumber must be exactly 1..n per order: status census.
    "q425_lineno_completeness" -> (Relational.linenoCompleteness _),
    // Parts never ordered / suppliers never shipping, exact ppm.
    "q426_dead_catalog" -> (Relational.deadCatalog _),
    // Users by distinct-active-day band with event mass.
    "q427_active_days" -> (Events.activeDaysBands _),
    // Orders per weekday via pure-integer epoch-day calendar math.
    "q428_order_weekday" -> (Relational.orderWeekdayProfile _),
    // Dense/unique/monotone id contract per id-carrying table.
    "q429_id_density" -> (Relational.idDensityAudit _),
    // Per-source corpus share: first vs second arrival half.
    "q430_arrival_drift" -> (Sampling.arrivalCompositionDrift _),
    // Jaccard band x length-ratio class pair cross-tab.
    "q431_pair_shapes" -> (Dedup.pairShapeCensus _),
    // Conversion ppm per first-event-type cohort.
    "q432_first_touch" -> (Events.firstTouchConversion _),
    // TTL vs forever admission: rescued re-crawl mass per source.
    "q433_policy_delta" ->
      ((s, d) => streaming.StreamNearDup.admissionPolicyDelta(s, d)),
    // Token degree bands in the distinct-bigram adjacency graph.
    "q434_bigram_degrees" -> (TextAnalysis.bigramDegreeCensus _),
    // Source mean-quality quartile churn between arrival halves.
    "q435_source_rank_churn" -> (TextAnalysis.sourceRankChurn _),
    // Exact five-point of q29 session counts per user.
    "q436_sessions_five_point" ->
      (Events.sessionsPerUserFivePoint _),
    // Token yield per source at the global P50/P75 quality cuts.
    "q437_source_yield" -> (TextAnalysis.sourceYieldMatrix _),
    // CV^2 of doc lengths per source as an exact integer milli.
    "q438_length_dispersion" ->
      (TextAnalysis.sourceLengthDispersion _),
    // Top-10 tokens by bigram-graph degree (function-word discovery).
    "q439_hub_tokens" -> (TextAnalysis.hubTokens _),
    // Exact gap quantiles per type (picked integer micros).
    "q440_gap_five_point" -> (Events.interArrivalFivePoint _),
    // Head/torso/tail token mass via integer cross-multiplication.
    "q441_frequency_bands" -> (TextAnalysis.frequencyBandMass _),
    // Share of each source's occurrences that are global head types.
    "q442_head_dependence" -> (TextAnalysis.headTokenDependence _),
    // Mean quality at raw -> survivors -> gated stages.
    "q443_quality_funnel" -> (TextAnalysis.qualityFunnel _),
    // Survivorship win rate per source among contested docs.
    "q444_survivor_wins" -> (Dedup.survivorWinRate _),
    // Triangle census of the co-purchase graph (degree-oriented).
    "q445_copurchase_triangles" ->
      (Relational.coPurchaseTriangles _),
    // Spearman rho between length and quality per source.
    "q446_spearman_rho" -> (TextAnalysis.spearmanLengthQuality _),
    // Pettitt rank changepoint on the daily event-count series.
    "q447_pettitt_changepoint" -> (Events.pettittChangepoint _),
    // Blocked Levenshtein near-dup pair census by distance band.
    "q448_edit_distance_bands" -> (Dedup.editDistanceBands _),
    // l-diversity of lang within (source, length-band) QI cells.
    "q449_l_diversity" -> (Sampling.lDiversityCensus _),
    // Newman degree assortativity of the near-dup pair graph.
    "q450_degree_assortativity" -> (Dedup.degreeAssortativity _),
    // dHash banding over the stubbed image decode: near-dup census.
    "q451_image_dhash" -> (Multimodal.imageDHashPairs _),
    // Hilbert vs Z-order vs lexicographic: blocks touched per region.
    "q452_curve_locality" -> (Layout.curveLocality _),
    // Haar wavelet energy spectrum of hourly event counts.
    "q453_haar_energy" -> (Events.haarEnergy _),
    // Cliff's delta of each source's quality vs the rest.
    "q454_cliff_delta" -> (TextAnalysis.cliffDeltaBySource _),
    // Wilcoxon signed-rank: per-user first-half vs second-half value.
    "q455_wilcoxon_drift" -> (Events.wilcoxonValueDrift _),
    // Page's L ordered-trend test over (week, weekday) blocks.
    "q456_page_trend" -> (Events.pageTrendWeekday _),
    // Hodges-Lehmann length shift per lang vs rest (value-domain).
    "q457_hodges_lehmann" -> (TextAnalysis.hodgesLehmannShift _),
    // Median absolute deviation of length per lang (two picks).
    "q458_length_mad" -> (TextAnalysis.lengthMad _),
    // Near-dup graph CC census at J >= 0.3/0.5/0.7.
    "q459_percolation" -> (Dedup.percolationCurve _),
    // Edge-support (triangles per edge) distribution, k-truss input.
    "q460_edge_support" -> (Relational.coPurchaseEdgeSupport _),
    // Median quality per global length decile (rank-exact picks).
    "q461_conditional_medians" ->
      (TextAnalysis.conditionalMedianQuality _),
    // SAX 3-gram motif census of the hourly count series.
    "q462_sax_motifs" -> (Events.saxMotifs _),
    // Shingle width 2/3/4 sensitivity: docs, shingles, pair counts.
    "q463_shingle_sweep" -> (Dedup.shingleWidthSweep _),
    // 5%-winsorized vs raw mean length per source (exact milli).
    "q464_winsorized_mean" -> (TextAnalysis.winsorizedMeanLength _),
    // BFS level census of the co-purchase graph (20-hop cap).
    "q465_bfs_levels" -> (Relational.bfsLevels _),
    // CC census of the repeated-bigram (>= 3) lexicon graph.
    "q466_lexicon_islands" -> (TextAnalysis.lexiconIslands _),
    // MinHash k = 4/8/16 estimator error on one fixed pair set.
    "q467_minhash_k_sweep" -> (Dedup.minhashKSweep _),
    // Per-(source, lang) fold-size balance of the md5 5-fold split.
    "q468_kfold_balance" -> (Sampling.kfoldBalance _),
    // Pareto frontier of parts on (price min, size max), no n².
    "q469_skyline" -> (Relational.partSkyline _),
    // Weekend-vs-weekday difference-in-differences on event value.
    "q470_weekend_did" -> (Events.weekendDid _),
    // Streaming 8h tumbling counts, drained then SAX-symbolized.
    "q471_stream_sax" ->
      ((s, d) => streaming.StreamSax.streamSaxSymbols(s, d)),
    // Position-decile skew of the top-20 tokens (chi2 vs uniform).
    "q472_positional_skew" -> (TextAnalysis.positionalSkew _),
    // Multi-source BFS radius per near-dup cluster (hop census).
    "q473_cluster_radius" -> (Dedup.clusterRadiusCensus _),
    // Bounded k-truss peel classes over the co-purchase graph.
    "q474_truss_classes" -> (Relational.trussClassCensus _),
    // Label-propagation communities (3 sync rounds, min tie-break).
    "q475_lp_communities" -> (Communities.lpCommunities _),
    // Grid-bucketed DBSCAN on embedding dims 1-2 (eps 2^-6, minPts 4).
    "q476_dbscan_grid" -> (Communities.dbscanGrid _),
    // Integer HITS (4 rounds) over the directed copy-flow graph.
    "q477_hits_copyflow" -> (Communities.hitsCopyFlow _),
    // Newman modularity of the q475 LP partition, exact micro units.
    "q478_lp_modularity" -> (Communities.lpModularity _),
    // Ordered view→click→purchase funnel with step-over-step ppm.
    "q479_ordered_funnel" -> (Events.orderedFunnel _),
    // CC component → # LP communities fragmentation histogram.
    "q480_partition_fragmentation" ->
      (Communities.partitionFragmentation _),
    // Greedy 3-source max-coverage over distinct shingles.
    "q481_greedy_source_cover" -> (Communities.greedySourceCover _),
    // Bounded densest-subgraph peel (deg·n <= 3·m, 6 rounds, best flag).
    "q482_densest_subgraph" -> (Relational.densestSubgraphCensus _),
    // Personalized PageRank from the q73 contamination seeds (8 rounds).
    "q483_contamination_ppr" -> (PageRank.contaminationPpr _),
    // Bottom-k (k=256) mergeable quantile sketch vs exact five-point.
    "q484_quantile_sketch" -> (Sketches.quantileSketchAudit _),
    // Bounded coreness census (k-core peel, 3 rounds/level, maxK=4).
    "q485_coreness_census" -> (Relational.corenessCensus _),
    // Streaming complete-mode bottom-k quantile sketch (q484 twin).
    "q486_stream_quantile" ->
      ((s, d) => streaming.StreamQuantile.streamQuantileSketch(s, d)),
    // Local clustering coefficient census (percent-wide ppm buckets).
    "q487_clustering_census" -> (Relational.clusteringCensus _),
    // CN/RA link-prediction top-20 over the weak-overlap pair graph.
    "q488_linkpred_candidates" -> (Dedup.linkPredictionAudit _),
    // Rich-club connectivity curve at degree-decile thresholds.
    "q489_rich_club" -> (Relational.richClubCurve _),
    // Double-sweep BFS eccentricity (diameter lower bound), 2 rows.
    "q490_double_sweep" -> (Relational.doubleSweepEcc _),
    // Prefix-dim truncation recall@10 vs full-width ground truth.
    "q491_dim_trunc_recall" -> (Similarity.dimTruncationRecall _),
    // Hub-removal vs random-removal CC census (attack robustness).
    "q492_attack_robustness" -> (Relational.attackRobustness _),
    // McNemar paired discordance test over every gate pair.
    "q206_mcnemar_gates" -> (TextAnalysis.mcnemarGates _),
    // Wedge-closure rate of the near-dup pair graph at J >= 0.5.
    "q208_transitivity" -> ((s, d) => Dedup.transitivityAudit(s, d)),
    // Filter-funnel yield: per-stage surviving doc counts.
    "q115_filter_funnel" -> (TextAnalysis.filterFunnel _),
    // Pooled frame embeddings: stride-sampled frames → stub per-frame
    // features → mean-pool per doc, in (doc, dim, value) cells.
    "q116_frame_embedding" -> (Multimodal.frameEmbeddings(_, _)),
    "q111_top_rev_supplier" -> (Subqueries.topRevenueSupplier _),
    "q112_above_avg_suppliers" -> (Subqueries.aboveAverageSuppliers _),
    "q113_idle_rich_customers" -> (Subqueries.idleRichCustomers _),
    "q117_urgent_only" -> (Subqueries.urgentOnlyCustomers _),
    "q118_cheapest_supplier" -> (Subqueries.cheapestSupplierPerPart _),
    // The six ranking-window functions sharing one window frame.
    "q119_window_family" -> (Relational.windowFamily _),
    // Unpivot (melt): the q62 pivot reshaped back to long form — an
    // in-row Expand, no shuffle beyond the pivot's own.
    "q122_unpivot" -> (Relational.statusUnpivot _),
    // Dynamic-gap session window: per-event gap (purchase 30m / else
    // 10m); the oracle replays the running-max-end merge.
    "q123_dynamic_session" -> (Events.dynamicSessionWindow _),
    // The streaming twin of q123 (native session_window + dynamic
    // gap under a watermark), drained availableNow — identical
    // session set, same oracle.
    "q124_stream_dynamic_session" -> ((s: SparkSession, dir: String) =>
      streaming.EventStreams.runAvailableNow(
        streaming.EventStreams.dynamicSessions(
          streaming.EventStreams.readEvents(s, dir)),
        "q124_stream_dynamic_session_out",
        "complete")),
    // Schema-on-read: JSON props parsed once into a VARIANT, typed
    // variant_get extraction, aggregated per event type.
    "q120_variant_props" -> (Events.variantProps _),
    // transformWithState (typed ValueState, RocksDB-backed): running
    // per-user count+max drained availableNow; terminal emissions
    // must equal the batch GROUP BY.
    "q121_transform_state" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions.{col, max, struct}
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        streaming.EventStreams
          .runAvailableNow(
            streaming.EventStreams.userActivity(
              streaming.EventStreams.readEvents(s, dir)),
            "q121_transform_state_out",
            "update")
          .groupBy(col("user_id"))
          .agg(max(struct(col("n_events"), col("max_value"))).as("st"))
          .select(col("user_id"), col("st.n_events").as("n_events"),
            col("st.max_value").as("max_value"))
      } finally {
        prev match {
          case Some(v) => s.conf.set(key, v)
          case None => s.conf.unset(key)
        }
      }
    }),
    // Streaming → day-partitioned parquet lake via the file sink's
    // manifest commit (exactly-once), then read back and aggregated;
    // the oracle is the same aggregate straight off the events table.
    "q107_stream_lake" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions.{col, count, date_format, lit,
        round, sum}
      // per-(process, sf) path, wiped before each run and deleted on
      // JVM exit: repeated invocations WITHIN a JVM reuse one tree
      // (no per-call leak), while the PID component keeps two
      // concurrent processes (e.g. Bench overlapping Verify on the
      // same sfDir) from wiping each other's live lake + streaming
      // checkpoint mid-run
      val base = new java.io.File(
        sys.props("java.io.tmpdir"),
        s"graft-lake-${ProcessHandle.current().pid()}-" +
          s"${math.abs(dir.hashCode.toLong)}")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(base)
      if (lakeCleanupRegistered.add(base.getAbsolutePath)) {
        Runtime.getRuntime.addShutdownHook(new Thread(() => rm(base)))
      }
      io.Sinks.streamEventsToLake(
        streaming.EventStreams.readEvents(s, dir),
        s"$base/lake",
        s"$base/ckpt")
      s.read
        .parquet(s"$base/lake")
        .groupBy(date_format(col("day"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
    }),
    // Streaming stateful funnel (mapGroupsWithState): per-user
    // 3-timestamp state folded in event-time order; terminal argmax
    // over update-mode emissions, hash-matched against the batch
    // funnel's oracle.
    "q88_stream_funnel" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions.{col, max, struct}
      streaming.EventStreams
        .runAvailableNow(
          streaming.EventStreams
            .funnelStream(streaming.EventStreams.readEvents(s, dir))
            .toDF(),
          "q88_stream_funnel_out",
          "update")
        .groupBy(col("user_id"))
        .agg(max(struct(col("stage_reached"), col("view_ts"),
          col("click_ts"), col("purchase_ts"))).as("st"))
        .select(
          col("user_id"),
          col("st.view_ts").as("view_ts"),
          col("st.click_ts").as("click_ts"),
          col("st.purchase_ts").as("purchase_ts"),
          col("st.stage_reached").as("stage_reached")
        )
    }),
    // Fixed-size 200-char document chunking — shuffle-free in-row
    // sequence+substring; the context-window splitter.
    "q85_doc_chunks" -> (TextAnalysis.docChunks(_, _)),
    // The FUSED single-pass text stats (JVM tokenizer) under the
    // DuckDB gate: counts + the quality recomposed from them must
    // hash-match the SQL replay of the column semantics.
    "q64_fused_text_stats" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions.col
      import graft.functions.TextStats
      Tables
        .documents(s, dir)
        .select(col("doc_id"), TextStats.textStats(col("text")).as("st"))
        .select(
          col("doc_id"),
          col("st.n_tokens").as("n_tokens"),
          col("st.n_stop").as("n_stop"),
          col("st.n_punct").as("n_punct"),
          col("st.n_chars").as("n_chars"),
          TextStats.qualityFromStats(col("st")).as("quality")
        )
    }),
    // The pivot API with explicit values (no distinct pre-query).
    "q62_pivot_api" -> (Relational.statusPivotApi _),
    // PII scrubbing: email/phone redaction with per-doc counts.
    "q59_redact_pii" -> (TextAnalysis.redactPii _),
    // Gopher-style repetition filters: duplicate token/bigram
    // fractions and the keep/drop flag.
    "q60_repetition" -> (TextAnalysis.repetitionStats _),
    // KMV distinct-count sketch (custom typed Aggregator) — exactly
    // replayable in SQL, unlike HLL: estimate per return flag over
    // 60-bit md5 order-key hashes, alongside the true distinct count.
    "q58_kmv_distinct" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      val h = graft.functions.TextFunctions.hash60(col("l_orderkey"))
      // KMV is duplicate-insensitive, so dedup (flag, h) once
      // (map-side partial dedup before the one shuffle) and aggregate
      // the sketch together with count(1) — which IS the exact
      // distinct count after the dedup. Mixing the sketch with
      // countDistinct instead plans the distinct rewrite and carries
      // the KMV buffer as per-(flag,hash)-group state through the
      // shuffle (measured 2.1 s at sf0.1; this form ≈ 0.7 s, one scan
      // and one md5 pass).
      Tables
        .lineitem(s, dir)
        .select(col("l_returnflag"), h.as("h"))
        .distinct()
        .groupBy(col("l_returnflag"))
        .agg(
          graft.functions.KmvSketch.kmvDistinct(col("h")).as("kmv_estimate"),
          count(lit(1)).as("n_exact")
        )
    }),
    // Per-project task-type distribution as exploded rows — the
    // scalar (oracle-checkable) form of the qj03 stats maps.
    "q56_jira_stats_sql" -> ((s: SparkSession, _: String) => {
      import org.apache.spark.sql.functions.{col, count, lit}
      jira.JiraPipeline
        .corpus(s, jira.JiraPipeline.fixtureProjects)
        .groupBy(col("metadata.project").as("project"), col("task_type"))
        .agg(count(lit(1)).as("n"))
    }),
    // Aspect-fit thumbnail dims over the stub decode (longest edge →
    // 256, floor math).
    "q57_resize_dims" -> (Multimodal.resizeDims _),
    // The reference transform_issue fan-out, hash-matched against a
    // full SQL replay of G1-G5 over the same raw fixture (metadata
    // struct excluded — scalar columns only).
    "q55_jira_fanout_sql" -> ((s: SparkSession, _: String) => {
      import org.apache.spark.sql.functions.col
      jira.JiraGenerators
        .generate(jira.JiraFlatten.flatten(
          jira.JiraPipeline.readRaw(
            s, s"${jira.JiraPipeline.FixtureDir}/raw_issues_TEST.jsonl"),
          "TEST"))
        .select(
          Seq("issue_key", "created", "task_rank", "task_type",
            "instruction", "input", "output").map(col): _*)
    }),
    // The reference flatten itself, hash-matched end-to-end: the
    // oracle re-derives every scalar flatten column in DuckDB SQL
    // directly from the same raw fixture JSONL (read_json with the
    // explicit schema), including clean_text collapse, truncation
    // caps, null-object row drop, user coalesce, and the
    // empty-after-clean comment filter behind comment_count.
    "q54_jira_flatten_sql" -> ((s: SparkSession, _: String) => {
      import org.apache.spark.sql.functions.col
      jira.JiraFlatten
        .flatten(
          jira.JiraPipeline.readRaw(
            s, s"${jira.JiraPipeline.FixtureDir}/raw_issues_TEST.jsonl"),
          "TEST")
        .select(
          Seq("issue_key", "issue_id", "project", "url", "title",
            "description", "status", "priority", "issue_type", "reporter",
            "assignee", "created", "updated", "resolved", "comment_count")
            .map(col): _*)
    }),
    // DSv2 `jira` source (paginated stub-backed REST scan) → flatten:
    // the connector path of the same pipeline, projected to the
    // oracle-comparable scalar shape (arrays as ','-joined csv) so the
    // driver gate checks VALUES, not just protocol liveness.
    "qj04_jira_source" -> ((s: SparkSession, _: String) => {
      import org.apache.spark.sql.functions.{array_join, col}
      jira.JiraFlatten.flatten(
        s.read
          .format("jira")
          .option("stubDir", s"${jira.JiraPipeline.FixtureDir}/stub_TEST")
          .option("project", "TEST")
          .option("pageSize", 3)
          .load(),
        "TEST")
        .select(
          col("issue_key"), col("issue_id"), col("project"), col("url"),
          col("title"), col("description"), col("status"), col("priority"),
          col("issue_type"), col("reporter"), col("assignee"),
          col("created"), col("updated"), col("resolved"),
          array_join(col("labels"), ",").as("labels_csv"),
          array_join(col("components"), ",").as("components_csv"),
          array_join(col("versions"), ",").as("versions_csv"),
          array_join(col("fix_versions"), ",").as("fix_versions_csv"),
          col("comment_count"))
    })
  )

  /** DuckDB cosine with double left-to-right accumulation — matches
    * Spark's zip_with+aggregate bit-for-bit.
    */
  /** DuckDB replay of the reference's absent-key vs explicit-null
    * drop rule (scraper.py:217,316-318): an issue drops iff any
    * crash-field KEY is present with a JSON null value, or `fields`
    * itself is an explicit null. DuckDB's typed read_json — exactly
    * like Spark's parser — maps absent and null to the same NULL, so
    * the probe reads the raw lines untyped (read_csv with a 1-byte
    * \x01 delimiter no JSON line contains) and inspects json_keys.
    * Mirrors [[graft.jira.JiraPipeline.readRaw]]'s probe columns.
    */
  /** DuckDB replay of the reference flatten (scraper.py field
    * extraction + utils clean_text) over raw_issues_TEST.jsonl: the
    * oracle for both q54 (JSONL read path) and qj04 (DSv2 paginated
    * source path — same bytes, different engine transport).
    */
  private def jiraFlattenOracleSql(withArrayCsv: Boolean): String = {
      def clean(e: String): String =
        s"trim(regexp_replace(COALESCE($e, ''), '\\s+', ' ', 'g'))"
      val desc = clean("fields.description")
      val csvCols =
        if (withArrayCsv)
          """,
           COALESCE(array_to_string(fields.labels, ','), '') AS labels_csv,
           COALESCE(array_to_string(list_transform(
             COALESCE(fields.components, []),
             x -> COALESCE(x.name, '')), ','), '') AS components_csv,
           COALESCE(array_to_string(list_transform(
             COALESCE(fields.versions, []),
             x -> COALESCE(x.name, '')), ','), '') AS versions_csv,
           COALESCE(array_to_string(list_transform(
             COALESCE(fields.fixVersions, []),
             x -> COALESCE(x.name, '')), ','), '') AS fix_versions_csv"""
        else ""
      s"""WITH raw AS (
           SELECT * FROM read_json(
             '/root/repo/src/test/resources/jira/raw_issues_TEST.jsonl',
             format='newline_delimited', columns={
               'key': 'VARCHAR', 'id': 'VARCHAR',
               'fields': 'STRUCT(
                  summary VARCHAR, description VARCHAR,
                  status STRUCT(name VARCHAR),
                  priority STRUCT(name VARCHAR),
                  issuetype STRUCT(name VARCHAR),
                  reporter STRUCT(displayName VARCHAR, name VARCHAR),
                  assignee STRUCT(displayName VARCHAR, name VARCHAR),
                  created VARCHAR, updated VARCHAR,
                  resolutiondate VARCHAR,
                  labels VARCHAR[],
                  components STRUCT(name VARCHAR)[],
                  versions STRUCT(name VARCHAR)[],
                  fixVersions STRUCT(name VARCHAR)[],
                  comment STRUCT(comments STRUCT(
                    author STRUCT(displayName VARCHAR, name VARCHAR),
                    created VARCHAR, body VARCHAR)[])
               )'})),
         ${jiraProbeCte(Seq(
             "/root/repo/src/test/resources/jira/raw_issues_TEST.jsonl"))},
         f AS (
           SELECT key, id, fields FROM raw
           WHERE $jiraKeepSql),
         c AS (
           SELECT key, id, fields,
             list_filter(
               list_transform(fields.comment.comments,
                 x -> ${clean("x.body")}),
               b -> length(b) > 0) AS clean_bodies
           FROM f)
         SELECT
           COALESCE(key, '') AS issue_key,
           COALESCE(id, '') AS issue_id,
           'TEST' AS project,
           'https://issues.apache.org/jira/browse/' || COALESCE(key, '')
             AS url,
           ${clean("fields.summary")} AS title,
           CASE WHEN length($desc) > 20000
                THEN substr($desc, 1, 20000) || '...'
                ELSE $desc END AS description,
           COALESCE(fields.status.name, 'Unknown') AS status,
           COALESCE(fields.priority.name, 'Unknown') AS priority,
           COALESCE(fields.issuetype.name, 'Unknown') AS issue_type,
           CASE WHEN fields.reporter IS NULL THEN 'Unknown'
                ELSE COALESCE(fields.reporter.displayName,
                       fields.reporter.name, 'Unknown') END AS reporter,
           CASE WHEN fields.assignee IS NULL THEN 'Unknown'
                ELSE COALESCE(fields.assignee.displayName,
                       fields.assignee.name, 'Unknown') END AS assignee,
           COALESCE(fields.created, '') AS created,
           COALESCE(fields.updated, '') AS updated,
           COALESCE(fields.resolutiondate, '') AS resolved,
           CAST(COALESCE(len(clean_bodies), 0) AS INTEGER)
             AS comment_count$csvCols
         FROM c"""
  }

  private def jiraProbeCte(files: Seq[String]): String = {
    val crash = Seq("status", "priority", "issuetype", "comment",
      "components", "versions", "fixVersions")
    val fileList = files.map("'" + _ + "'").mkString("[", ", ", "]")
    val perField = crash.map { f =>
      s"(COALESCE(list_contains(json_keys(line, '$$.fields'), '$f'), false)" +
        s" AND json_extract(line, '$$.fields.$f') IS NULL)"
    }
    val fieldsNull =
      "(COALESCE(list_contains(json_keys(line), 'fields'), false)" +
        " AND json_extract(line, '$.fields') IS NULL)"
    s"""probe AS (
         SELECT json_extract_string(line, '$$.key') AS probe_key,
           (${(perField :+ fieldsNull).mkString("\n            OR ")}) AS drop_row
         FROM read_csv($fileList,
           columns={'line': 'VARCHAR'}, header=false,
           delim=E'\\x01', quote=''))"""
  }

  /** The flatten-stage row filter as a correlated lookup into
    * [[jiraProbeCte]] (issue keys are unique across fixture files).
    */
  private val jiraKeepSql: String =
    "NOT COALESCE((SELECT drop_row FROM probe WHERE probe_key = raw.key), false)"

  /** Unrolled replay of the BPE merge loop (q125/q126): s0 = per-word
    * character symbols joined by chr(31); each round r computes the
    * adjacent-pair counts (list_zip of the shifted symbol lists),
    * takes the (count DESC, left, right) argmax, and applies the
    * winning pair with the same boundary-anchored greedy fold as
    * [[graft.operators.BpeTrain.applyMerge]] (list_reduce over the
    * split symbols: fuse only when the accumulator's LAST WHOLE
    * symbol is the pair's left — a substring replace would also fuse
    * across symbol boundaries), one CTE triple (p_r, b_r, s_r) per
    * round. The LEFT JOIN ON true guard keeps s_r = s_{r-1} if a
    * round ever has no pairs left.
    */
  private def bpeCtes(rounds: Int): String = {
    val sep = "chr(31)"
    val sb = new StringBuilder
    sb.append(s"""WITH w0 AS (
         SELECT w, count(*) AS freq
         FROM (SELECT unnest(CASE WHEN length(trim(text)) = 0
                 THEN []::VARCHAR[]
                 ELSE regexp_split_to_array(trim(text), '\\s+') END) AS w
               FROM documents) t
         WHERE length(w) > 0 AND NOT contains(w, $sep)
         GROUP BY w),
       s0 AS (SELECT w, freq,
         array_to_string(list_transform(range(length(w)),
           i -> substr(w, i + 1, 1)), $sep) AS syms
         FROM w0)""")
    // AS MATERIALIZED is load-bearing: without it DuckDB inlines the
    // chained CTEs into the scalar subqueries and re-evaluates the
    // whole prefix per reference — exponential in rounds
    for (r <- 1 to rounds) {
      val prev = s"s${r - 1}"
      sb.append(s""",
       p$r AS MATERIALIZED (SELECT z[1] AS lft, z[2] AS rgt, freq
         FROM (SELECT freq,
                 unnest(list_zip(li[1:len(li) - 1], li[2:len(li)])) AS z
               FROM (SELECT freq, string_split(syms, $sep) AS li
                     FROM $prev) x) y),
       b$r AS MATERIALIZED (SELECT lft, rgt, CAST(sum(freq) AS BIGINT) AS cnt
         FROM p$r GROUP BY 1, 2 ORDER BY cnt DESC, lft, rgt LIMIT 1),
       s$r AS MATERIALIZED (SELECT w, freq,
           CASE WHEN b.lft IS NULL THEN syms ELSE
             list_reduce(string_split(syms, $sep), (acc, x) ->
               CASE WHEN x = b.rgt AND (acc = b.lft
                      OR ends_with(acc, $sep || b.lft))
                    THEN acc || x
                    ELSE acc || $sep || x END)
           END AS syms
         FROM $prev LEFT JOIN b$r b ON true)""")
    }
    sb.toString
  }

  /** Chained CTEs for q474's bounded truss peel: e0 = the canonical
    * co-purchase edge set, e1 = the 3-truss (one exact round — a
    * support-0 edge is in no triangle, so its removal cascades
    * nothing), then `rounds` peel-below-2 rounds e2..e{rounds+1},
    * each recomputing support on the previous round's survivors —
    * the same rounds Spark's boundedTrussClasses runs, so the capped
    * results agree even where the cap binds. AS MATERIALIZED is
    * load-bearing (the bpeCtes lesson): each round references its
    * predecessor three times in the triangle join and the final
    * census reads three edge sets via scalar subqueries — inlined,
    * the prefix would re-evaluate exponentially.
    */
  private def trussPeelCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
         FROM lineitem),
       e0 AS MATERIALIZED (
         SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         FROM op a JOIN op b USING (l_orderkey)
         WHERE a.l_partkey < b.l_partkey)""")
    for (r <- 0 to rounds) {
      val thr = if (r == 0) 1 else 2
      sb.append(s""",
       t$r AS MATERIALIZED (
         SELECT x1.u AS a, x1.v AS b, x2.v AS c
         FROM e$r x1 JOIN e$r x2 ON x1.v = x2.u
         JOIN e$r x3 ON x3.u = x1.u AND x3.v = x2.v),
       e${r + 1} AS MATERIALIZED (
         SELECT u, v FROM
           (SELECT u, v, count(*) AS s FROM
             (SELECT a AS u, b AS v FROM t$r
              UNION ALL SELECT a, c FROM t$r
              UNION ALL SELECT b, c FROM t$r) z
            GROUP BY 1, 2) g
         WHERE s >= $thr)""")
    }
    sb.toString
  }

  /** Chained CTEs for q482's bounded densest-subgraph peel: e0/s0 =
    * the canonical co-purchase edge set with its (n, m) stats, then
    * `rounds` batch-peel rounds — round r keeps exactly the nodes
    * with deg·n_r > 3·m_r (the ε = 1/2 Bahmani threshold, exact
    * integers) and re-induces the edge set — the identical rounds
    * Spark's densestSubgraphPeel runs. AS MATERIALIZED is
    * load-bearing: every round reads its predecessor's edge set
    * three times (degree census + both IN probes) and the final
    * union reads every round's stats.
    */
  private def densestPeelCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
         FROM lineitem),
       e0 AS MATERIALIZED (
         SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         FROM op a JOIN op b USING (l_orderkey)
         WHERE a.l_partkey < b.l_partkey),
       s0 AS MATERIALIZED (SELECT
         (SELECT count(*) FROM (SELECT u AS id FROM e0
            UNION SELECT v FROM e0) t) AS n,
         (SELECT count(*) FROM e0) AS m)""")
    for (r <- 0 until rounds) {
      sb.append(s""",
       d$r AS (SELECT id, count(*) AS dg FROM
           (SELECT u AS id FROM e$r UNION ALL SELECT v FROM e$r) t
         GROUP BY 1),
       k$r AS MATERIALIZED (SELECT id FROM d$r, s$r
         WHERE dg * s$r.n > 3 * s$r.m),
       e${r + 1} AS MATERIALIZED (SELECT u, v FROM e$r
         WHERE u IN (SELECT id FROM k$r)
           AND v IN (SELECT id FROM k$r)),
       s${r + 1} AS MATERIALIZED (SELECT
         (SELECT count(*) FROM k$r) AS n,
         (SELECT count(*) FROM e${r + 1}) AS m)""")
    }
    sb.append(s""",
       peel_rows AS (
         ${(0 to rounds)
        .map(r => s"SELECT $r AS round, n, m FROM s$r WHERE n > 0")
        .mkString("\n         UNION ALL ")}),
       peel_scored AS (SELECT round::BIGINT AS round, n::BIGINT AS n_nodes,
         m::BIGINT AS n_edges, ${sqlMicroRatio("m", "n")} AS density_micro
         FROM peel_rows)""")
    sb.toString
  }

  /** Chained CTEs for q485's bounded coreness census: e0/n0 = the
    * canonical co-purchase graph, then for each level k = 2..maxK,
    * `roundsPerLevel` unconditional peel rounds (keep nodes with
    * current degree ≥ k, re-induce the edge set) — a fixpoint round
    * is a no-op, so the unconditional unroll equals Spark's
    * early-exiting loop. Emits per-class node counts as differences
    * of consecutive level boundaries.
    */
  private def corenessCtes(maxK: Int, roundsPerLevel: Int): String = {
    val sb = new StringBuilder
    sb.append("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
         FROM lineitem),
       ek0 AS MATERIALIZED (
         SELECT a.l_partkey AS u, b.l_partkey AS v
         FROM op a JOIN op b USING (l_orderkey)
         WHERE a.l_partkey < b.l_partkey
         GROUP BY 1, 2 HAVING count(*) >= 2),
       nk0 AS MATERIALIZED (SELECT u AS id FROM ek0
         UNION SELECT v FROM ek0)""")
    var en = "ek0"
    var nn = "nk0"
    val bounds = scala.collection.mutable.ArrayBuffer("nk0")
    for (k <- 2 to maxK; r <- 1 to roundsPerLevel) {
      val tag = s"k${k}r$r"
      sb.append(s""",
       d$tag AS (SELECT id, count(*) AS dg FROM
           (SELECT u AS id FROM $en UNION ALL SELECT v FROM $en) t
         GROUP BY 1),
       n$tag AS MATERIALIZED (SELECT id FROM $nn
         WHERE id IN (SELECT id FROM d$tag WHERE dg >= $k)),
       e$tag AS MATERIALIZED (SELECT u, v FROM $en
         WHERE u IN (SELECT id FROM n$tag)
           AND v IN (SELECT id FROM n$tag))""")
      en = s"e$tag"
      nn = s"n$tag"
      if (r == roundsPerLevel) bounds += nn
    }
    sb.append(s""",
       core_rows AS (
         ${(0 until maxK - 1)
        .map(i =>
          s"""SELECT ${i + 1}::BIGINT AS core_k,
           ((SELECT count(*) FROM ${bounds(i)})
             - (SELECT count(*) FROM ${bounds(i + 1)}))::BIGINT
             AS n_nodes""")
        .mkString("\n         UNION ALL ")}
         UNION ALL SELECT $maxK::BIGINT,
           (SELECT count(*) FROM ${bounds(maxK - 1)})::BIGINT)""")
    sb.toString
  }

  /** The J ≥ 0.5 near-dup pair graph as `p (doc_a, doc_b)` — the
    * shared oracle prefix of the q475/q477/q478 community family
    * (same derivation as the q473 oracle). MATERIALIZED because the
    * LP/HITS round CTEs reference it repeatedly.
    */
  private def nearDupPairCtes: String =
    s"""$shinglesCte,
       e0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s
              FROM d WHERE len(sh) > 0),
       pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                count(*) AS inter,
                any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
              FROM e0 a JOIN e0 b
                ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
       p AS MATERIALIZED (SELECT doc_a, doc_b FROM pr
            WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
              >= 0.5)"""

  /** q475/q478's LP chain: l0 = own labels over the symmetrized pair
    * graph, then three synchronous rounds, each node adopting its
    * neighbors' most frequent label with (count DESC, label ASC)
    * tie-break — the identical rounds Communities.lpLabelsFrom runs.
    */
  private def lpChainCtes: String = {
    val rounds = (1 to 3)
      .map { r =>
        s"""r$r AS (SELECT s.a, l.lab, count(*) AS c
         FROM sym s JOIN l${r - 1} l ON s.b = l.id GROUP BY 1, 2),
       l$r AS MATERIALIZED (SELECT a AS id, lab FROM
         (SELECT a, lab, row_number() OVER (PARTITION BY a
            ORDER BY c DESC, lab ASC) AS rn FROM r$r) t
         WHERE rn = 1)"""
      }
      .mkString(",\n       ")
    s"""$nearDupPairCtes,
       sym AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM p
            UNION ALL SELECT doc_b, doc_a FROM p),
       l0 AS (SELECT DISTINCT a AS id, a AS lab FROM sym),
       $rounds"""
  }

  /** q477's integer HITS rounds: h0 = 1, then four alternating
    * a ← Aᵀh / h ← A·a exact-integer half-rounds over the directed
    * pair graph, zero-filled via the node left joins — the identical
    * recurrence Communities.hitsCopyFlow runs.
    */
  private def hitsCtes: String = {
    val rounds = (1 to 4)
      .map { r =>
        s"""a$r AS MATERIALIZED (SELECT n.id, coalesce(t.s, 0)::BIGINT AS s
         FROM n LEFT JOIN (SELECT p.doc_b AS id, sum(h.s)::BIGINT AS s
           FROM p JOIN h${r - 1} h ON p.doc_a = h.id GROUP BY 1) t
         ON n.id = t.id),
       h$r AS MATERIALIZED (SELECT n.id, coalesce(t.s, 0)::BIGINT AS s
         FROM n LEFT JOIN (SELECT p.doc_a AS id, sum(a.s)::BIGINT AS s
           FROM p JOIN a$r a ON p.doc_b = a.id GROUP BY 1) t
         ON n.id = t.id)"""
      }
      .mkString(",\n       ")
    s"""$nearDupPairCtes,
       n AS MATERIALIZED (SELECT DISTINCT id FROM
         (SELECT doc_a AS id FROM p UNION ALL SELECT doc_b FROM p) t),
       h0 AS (SELECT id, 1::BIGINT AS s FROM n),
       $rounds"""
  }

  private def cosSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> p[1]::DOUBLE * p[2]::DOUBLE))" +
      s" / (sqrt(list_sum(list_transform($a, x -> x::DOUBLE * x::DOUBLE)))" +
      s" * sqrt(list_sum(list_transform($b, x -> x::DOUBLE * x::DOUBLE))))"

  /** FakeDecoder's rolling hash in DuckDB: h = h*31 + byte over the
    * UTF-8 payload with 64-bit signed wraparound (HUGEINT mod 2^64
    * recentred to signed), then floorMod-derived width/height.
    * Shared by the q33 decode and q57 resize oracles.
    */
  private val two64 = "18446744073709551616::HUGEINT"

  /** Floor division of the signed hash by 2^k (arithmetic shift). */
  private def shr(k: Int): String = {
    val d = s"${1L << k}::HUGEINT"
    if (k == 0) "sv" else s"((sv - (((sv % $d) + $d) % $d)) // $d)"
  }

  private def fmod(e: String, m: Long): String =
    s"((($e % $m::HUGEINT) + $m::HUGEINT) % $m::HUGEINT)"

  private def decodeCtes: String =
    s"""WITH b AS (
         SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           hex(encode(text)) AS hx
         FROM documents),
       h AS (
         SELECT doc_id, n_bytes,
           list_reduce(
             list_prepend(1125899906842597::HUGEINT,
               list_transform(range(n_bytes),
                 i -> ('0x' || substr(hx, (i*2+1)::INT, 2))::BIGINT::HUGEINT)),
             (a, c) -> (a * 31 + c) % $two64) AS u
         FROM b),
       s AS (
         SELECT doc_id, n_bytes,
           CASE WHEN u >= 9223372036854775808::HUGEINT
                THEN u - $two64 ELSE u END AS sv
         FROM h),
       dims AS (
         SELECT doc_id, n_bytes, sv,
           320 + CAST(${fmod("sv", 1600L)} AS INTEGER) AS width,
           240 + CAST(${fmod(shr(16), 840L)} AS INTEGER) AS height
         FROM s)"""

  /** Shared oracle CTE: distinct 3-gram shingle sets per document. */
  private val shinglesCte: String =
    """d AS (
        SELECT doc_id,
          list_distinct(list_transform(range(len(toks) - 2),
            i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS sh
        FROM (SELECT doc_id,
                CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                     ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
              FROM documents) t
        WHERE len(toks) >= 3)"""

  /** The q127 interpolated trigram-LM chain through the per-doc
    * score CTE `sc` (cross-entropy `x`) and the corpus-mean CTE `m`
    * — shared by the q127 oracle and the composed q130 manifest
    * oracle.
    */
  /** Full q127 oracle statement — shared by its entry and the q190
    * gate-agreement composition (embedded there as a subquery).
    */
  private lazy val trigramPplOracleSql: String =
    s"""WITH $trigramLmCtes
         SELECT doc_id, n_trigrams, round(x, 6) AS xent,
           round(exp(x), 6) AS ppl,
           CAST(exp(x) <= mean_ppl AS INTEGER) AS keep
         FROM sc CROSS JOIN m"""

  /** Full q180 oracle statement (6 GD rounds as chained CTEs) —
    * shared by its entry and the q190 composition.
    */
  private lazy val lrQualityOracleSql: String = {
    val rounds = (1 to 6)
      .map { k =>
        s"""p$k AS (SELECT f.y, f.f1, f.f2, f.f3, f.f4,
             w.w0 AS a0, w.w1 AS a1, w.w2 AS a2, w.w3 AS a3, w.w4 AS a4,
             1.0/(1.0 + exp(-(w.w0 + w.w1*f.f1 + w.w2*f.f2 + w.w3*f.f3
               + w.w4*f.f4))) AS p
           FROM f, w${k - 1} w),
         w$k AS (SELECT round(any_value(a0) + avg(y - p), 6) AS w0,
             round(any_value(a1) + avg((y - p) * f1), 6) AS w1,
             round(any_value(a2) + avg((y - p) * f2), 6) AS w2,
             round(any_value(a3) + avg((y - p) * f3), 6) AS w3,
             round(any_value(a4) + avg((y - p) * f4), 6) AS w4
           FROM p$k)"""
      }
      .mkString(",\n         ")
    s"""WITH t AS (SELECT doc_id,
             CASE WHEN source = 'src0' THEN 1.0::DOUBLE
                  ELSE 0.0::DOUBLE END AS y,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
           FROM documents),
         fm AS (SELECT doc_id, y,
             len(toks)::BIGINT * 10000 AS f1m,
             CASE WHEN len(toks) = 0 THEN 0
               ELSE ${sqlIdivHalfUp(
        "list_sum(list_transform(toks, w -> length(w)))::BIGINT * 100000",
        "len(toks)")} END AS f2m,
             CASE WHEN len(toks) = 0 THEN 0
               ELSE ${sqlIdivHalfUp(
        """len(list_filter(toks, w -> list_contains(
                      ['the','a','an','and','or','of','to','in','is','it'],
                      w)))::BIGINT * 1000000""",
        "len(toks)")} END AS f3m,
             CASE WHEN len(toks) = 0 THEN 0
               ELSE ${sqlIdivHalfUp(
        "len(list_distinct(toks))::BIGINT * 1000000",
        "len(toks)")} END AS f4m
           FROM t),
         f AS (SELECT doc_id, y, f1m, f2m, f3m, f4m,
             f1m::DOUBLE / 1000000 AS f1, f2m::DOUBLE / 1000000 AS f2,
             f3m::DOUBLE / 1000000 AS f3, f4m::DOUBLE / 1000000 AS f4
           FROM fm),
         w0 AS (SELECT 0.0::DOUBLE AS w0, 0.0::DOUBLE AS w1,
             0.0::DOUBLE AS w2, 0.0::DOUBLE AS w3, 0.0::DOUBLE AS w4),
         $rounds
         SELECT f.doc_id, CAST(f.y AS BIGINT) AS label,
           CAST(round(w.w0 * 1e6) AS BIGINT) * 1000000
             + CAST(round(w.w1 * 1e6) AS BIGINT) * f.f1m
             + CAST(round(w.w2 * 1e6) AS BIGINT) * f.f2m
             + CAST(round(w.w3 * 1e6) AS BIGINT) * f.f3m
             + CAST(round(w.w4 * 1e6) AS BIGINT) * f.f4m AS z_pico,
           (CAST(round(w.w0 * 1e6) AS BIGINT) * 1000000
             + CAST(round(w.w1 * 1e6) AS BIGINT) * f.f1m
             + CAST(round(w.w2 * 1e6) AS BIGINT) * f.f2m
             + CAST(round(w.w3 * 1e6) AS BIGINT) * f.f3m
             + CAST(round(w.w4 * 1e6) AS BIGINT) * f.f4m) >= 0
             AS pred_quality
         FROM f, w6 w"""
  }

  /** Full q184 oracle statement (both LM chains + floor scoring) —
    * shared by its entry and the q190 composition.
    */
  private lazy val mooreLewisOracleSql: String = {
    def lmCtes(p: String, filt: String): String =
      s"""${p}tr AS (SELECT doc_id, toks FROM t $filt),
         ${p}tri AS (SELECT s.w1 AS w1, s.w2 AS w2, s.w3 AS w3,
             CAST(count(*) AS BIGINT) AS n3
           FROM (SELECT unnest(list_transform(range(len(toks) - 2),
                   i -> {'w1': toks[i+1], 'w2': toks[i+2],
                         'w3': toks[i+3]})) AS s
                 FROM ${p}tr WHERE len(toks) >= 3) x
           GROUP BY 1, 2, 3),
         ${p}tctx AS (SELECT w1, w2, CAST(sum(n3) AS BIGINT) AS n2ctx
                      FROM ${p}tri GROUP BY 1, 2),
         ${p}bi AS (SELECT s.w2 AS w2, s.w3 AS w3,
             CAST(count(*) AS BIGINT) AS nb
           FROM (SELECT unnest(list_transform(range(len(toks) - 1),
                   i -> {'w2': toks[i+1], 'w3': toks[i+2]})) AS s
                 FROM ${p}tr WHERE len(toks) >= 2) x
           GROUP BY 1, 2),
         ${p}bctx AS (SELECT w2, CAST(sum(nb) AS BIGINT) AS nbctx
                      FROM ${p}bi GROUP BY 1),
         ${p}uni AS (SELECT w3, CAST(count(*) AS BIGINT) AS n1
                     FROM (SELECT unnest(toks) AS w3 FROM ${p}tr) u
                     GROUP BY 1),
         ${p}tot AS (SELECT CAST(sum(n1) AS DOUBLE) AS tot
                     FROM ${p}uni),
         ${p}v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM ${p}uni),
         ${p}sc AS MATERIALIZED (SELECT dt.doc_id,
             sum(dt.c * -ln(
               0.55 * coalesce(tri.n3 / tctx.n2ctx, 0)
               + 0.3 * coalesce(bi.nb / bctx.nbctx, 0)
               + 0.1 * coalesce(uni.n1 / tt.tot, 0)
               + 0.05::DOUBLE / vv.v)) / sum(dt.c) AS x
           FROM dt
           LEFT JOIN ${p}tri tri USING (w1, w2, w3)
           LEFT JOIN ${p}tctx tctx USING (w1, w2)
           LEFT JOIN ${p}bi bi USING (w2, w3)
           LEFT JOIN ${p}bctx bctx USING (w2)
           LEFT JOIN ${p}uni uni USING (w3)
           CROSS JOIN ${p}tot tt CROSS JOIN ${p}v vv
           GROUP BY 1)"""
    s"""WITH t AS (SELECT doc_id, source,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+')
             END AS toks FROM documents),
         dt AS MATERIALIZED (SELECT doc_id, s.w1 AS w1, s.w2 AS w2,
             s.w3 AS w3, CAST(count(*) AS BIGINT) AS c
           FROM (SELECT doc_id,
                   unnest(list_transform(range(len(toks) - 2),
                     i -> {'w1': toks[i+1], 'w2': toks[i+2],
                           'w3': toks[i+3]})) AS s
                 FROM t WHERE len(toks) >= 3) x
           GROUP BY 1, 2, 3, 4),
         ${lmCtes("g", "")},
         ${lmCtes("i", "WHERE source = 'src0'")},
         j AS MATERIALIZED (SELECT doc_id, isc.x AS xi, gsc.x AS xg
                            FROM isc JOIN gsc USING (doc_id)),
         md AS (SELECT avg(xi - xg) AS md FROM j)
         SELECT doc_id, round(xi, 6) AS xent_in,
           round(xg, 6) AS xent_gen,
           round(xi - xg, 6) AS ml_score,
           CAST(xi - xg <= md.md AS INTEGER) AS keep
         FROM j, md"""
  }

  /** Full q142 oracle statement — shared by its entry and the q190
    * composition.
    */
  private lazy val gopherOracleSql: String =
    """WITH t AS (SELECT doc_id, text,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
           FROM documents),
         s AS (SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             round(CASE WHEN len(toks) = 0 THEN 0.0
               ELSE list_sum(list_transform(toks, w -> length(w)))::DOUBLE
                    / len(toks) END, 6) AS mean_word_len,
             round(CASE WHEN len(toks) = 0 THEN 0.0
               ELSE len(list_filter(toks,
                      w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
                    / len(toks) END, 6) AS alpha_frac,
             round(CASE WHEN len(toks) = 0 THEN 0.0
               ELSE ((length(text) - length(replace(text, '#', ''))) +
                     (length(text) - length(replace(text, '...', ''))) / 3)
                    / len(toks) END, 6) AS symbol_frac,
             CAST(len(list_intersect(list_distinct(toks),
               ['the','a','an','and','or','of','to','in','is','it']))
               AS BIGINT) AS n_stopwords
           FROM t)
         SELECT s.*,
           n_words BETWEEN 50 AND 100000
             AND mean_word_len BETWEEN 3.0 AND 10.0
             AND symbol_frac <= 0.1
             AND alpha_frac >= 0.8
             AND n_stopwords >= 2 AS keep
         FROM s"""

  private val trigramLmCtes: String =
    """t AS (SELECT doc_id,
                  CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                       ELSE regexp_split_to_array(trim(text), '\s+')
                  END AS toks FROM documents),
         dt AS (SELECT doc_id, s.w1 AS w1, s.w2 AS w2, s.w3 AS w3,
                  count(*) AS c
                FROM (SELECT doc_id,
                        unnest(list_transform(range(len(toks) - 2),
                          i -> {'w1': toks[i+1], 'w2': toks[i+2],
                                'w3': toks[i+3]})) AS s
                      FROM t WHERE len(toks) >= 3) x
                GROUP BY 1, 2, 3, 4),
         tri AS (SELECT w1, w2, w3, CAST(sum(c) AS BIGINT) AS n3
                 FROM dt GROUP BY 1, 2, 3),
         trictx AS (SELECT w1, w2, CAST(sum(n3) AS BIGINT) AS n2ctx
                    FROM tri GROUP BY 1, 2),
         bi AS (SELECT s.w2 AS w2, s.w3 AS w3, count(*) AS nb
                FROM (SELECT unnest(list_transform(range(len(toks) - 1),
                        i -> {'w2': toks[i+1], 'w3': toks[i+2]})) AS s
                      FROM t WHERE len(toks) >= 2) x
                GROUP BY 1, 2),
         bictx AS (SELECT w2, CAST(sum(nb) AS BIGINT) AS nbctx
                   FROM bi GROUP BY 1),
         uni AS (SELECT w3, count(*) AS n1 FROM
                   (SELECT unnest(toks) AS w3 FROM t) u GROUP BY 1),
         tot AS (SELECT CAST(sum(n1) AS DOUBLE) AS tot FROM uni),
         sc AS MATERIALIZED (
                SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_trigrams,
                  sum(c * -ln(0.6 * n3 / n2ctx + 0.3 * nb / nbctx
                      + 0.1 * n1 / tot)) / sum(c) AS x
                FROM dt
                JOIN tri USING (w1, w2, w3)
                JOIN trictx USING (w1, w2)
                JOIN bi USING (w2, w3)
                JOIN bictx USING (w2)
                JOIN uni USING (w3)
                CROSS JOIN tot
                GROUP BY doc_id),
         m AS (SELECT avg(exp(x)) AS mean_ppl FROM sc)"""

  /** The q78 canonical-dedup chain (shingle pairs → recursive
    * transitive closure → per-cluster quality argmax) through a
    * ranked `surv` CTE — shared by the q78 oracle and the composed
    * q130 manifest oracle.
    */
  /** The two-ranker retrieval chain (the q151/q177 shared frame) as
    * a WITH prefix ending in `bm` (BM25 top-20 per query) and `coss`
    * (cosine scores for every shared-term candidate pair).
    */
  private val hybridRetrievalCtes: String =
    """toks AS (
           SELECT doc_id, unnest(CASE WHEN length(trim(text)) = 0
               THEN []::VARCHAR[]
               ELSE regexp_split_to_array(trim(text), '\s+') END) AS term
           FROM documents),
         tf AS MATERIALIZED (
           SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                  avg(dl) AS avg_dl FROM dl),
         dft AS MATERIALIZED (
           SELECT term, count(*) AS df FROM tf GROUP BY 1),
         q AS (SELECT DISTINCT doc_id AS q_id, term FROM toks
               WHERE doc_id % 250 = 0),
         bmsc AS (SELECT q.q_id, tf.doc_id,
                  round(sum(
                    ln((st.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1)
                    * tf.tf * 2.2
                    / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avg_dl))),
                    6) AS score
                FROM q JOIN tf ON q.term = tf.term
                  AND tf.doc_id <> q.q_id
                JOIN dft ON dft.term = q.term
                JOIN dl ON dl.doc_id = tf.doc_id
                CROSS JOIN st
                GROUP BY 1, 2),
         bm AS (SELECT q_id, doc_id,
                  CAST(bm25_rank AS INTEGER) AS bm25_rank
                FROM (SELECT q_id, doc_id,
                        row_number() OVER (PARTITION BY q_id
                          ORDER BY score DESC, doc_id ASC) AS bm25_rank
                      FROM bmsc) t
                WHERE bm25_rank <= 20),
         w AS MATERIALIZED (
           SELECT tf.doc_id, tf.term,
             tf.tf * (ln((st.n_docs + 1) / (dft.df + 1)) + 1) AS w
           FROM tf JOIN dft USING (term) CROSS JOIN st),
         nrm AS MATERIALIZED (
           SELECT doc_id, round(sqrt(sum(w * w)), 6) AS nrm
           FROM w GROUP BY 1),
         qw AS (SELECT w.doc_id AS q_id, w.term, w.w AS qwt,
                  n.nrm AS q_nrm
                FROM w JOIN nrm n USING (doc_id)
                WHERE w.doc_id % 250 = 0),
         cossc AS (SELECT qw.q_id, w.doc_id, qw.q_nrm,
                  round(sum(qw.qwt * w.w), 6) AS dot
                FROM qw JOIN w ON qw.term = w.term
                  AND w.doc_id <> qw.q_id
                GROUP BY 1, 2, 3),
         coss AS (SELECT q_id, cossc.doc_id,
                  round(dot / (q_nrm * nrm.nrm), 6) AS score
                FROM cossc JOIN nrm ON nrm.doc_id = cossc.doc_id)"""

  /** The q150 closed-form UniMax allocation as a WITH prefix ending
    * in `al` (lang, n_chars, capped, alloc_chars, epochs) — shared
    * by the q150 gate and the q169 epoch-expansion plan.
    */
  private val unimaxCtes: String =
    """pl AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS n_chars
                     FROM documents GROUP BY 1),
         tot AS (SELECT CAST(floor(0.5 * sum(n_chars)) AS BIGINT)
                   AS budget,
                 CAST(count(*) AS BIGINT) AS n_langs FROM pl),
         f AS (SELECT lang, n_chars, budget, n_langs,
                 CAST(row_number() OVER
                   (ORDER BY n_chars, lang) AS BIGINT) AS i,
                 CAST(coalesce(sum(2 * n_chars) OVER
                   (ORDER BY n_chars, lang
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS prefix
               FROM pl CROSS JOIN tot),
         g AS (SELECT *, CASE WHEN 2 * n_chars * (n_langs - i + 1) <
                 budget - prefix THEN 1 ELSE 0 END AS flag FROM f),
         h AS (SELECT *, min(flag) OVER
                 (ORDER BY n_chars, lang
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
                 AS capped FROM g),
         cs AS (SELECT CAST(coalesce(sum(CASE WHEN capped
                   THEN 2 * n_chars ELSE 0 END), 0) AS BIGINT) AS capsum,
                 CAST(sum(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT)
                   AS k
               FROM h),
         al AS (SELECT lang, n_chars, capped,
           CASE WHEN capped THEN 2 * n_chars
                ELSE CAST(floor((budget - capsum)::DOUBLE /
                       (n_langs - k)) AS BIGINT) END AS alloc_chars,
           round((CASE WHEN capped THEN 2 * n_chars
                ELSE CAST(floor((budget - capsum)::DOUBLE /
                       (n_langs - k)) AS BIGINT) END)::DOUBLE / n_chars,
             6) AS epochs
         FROM h CROSS JOIN cs)"""

  /** DuckDB twin of [[graft.functions.IntMath.idivHalfUp]]: exact
    * round-half-up(a/b) in pure BIGINT — `(2a + b) // (2b)` for
    * a >= 0, b > 0. The round-9 convention: NO hashed/ordered column
    * may come from `round()` of a float that can land on a .5
    * boundary; this is the replacement everywhere a ratio is emitted.
    */
  /** One width of the q404 decontamination sweep: flagged train-doc
    * count + token mass under `w`-token shingles, as a 1-row CTE body
    * (the tk CTE with per-doc `toks` must be in scope).
    */
  private def sqlDeconWidth(w: Int): String = {
    val gram = (1 to w).map(i => s"toks[i+$i]").mkString(" || ' ' || ")
    s"""(SELECT count(*)::BIGINT AS n_flagged,
          coalesce(sum(len(t2.toks)), 0)::BIGINT AS flagged_tokens
        FROM (SELECT DISTINCT tr.doc_id
              FROM (SELECT doc_id, unnest(sh) AS s
                    FROM (SELECT doc_id,
                            list_distinct(list_transform(
                              range(len(toks) - ${w - 1}),
                              i -> $gram)) AS sh
                          FROM tk WHERE len(toks) >= $w) dd
                    WHERE doc_id % 50 <> 0 AND len(sh) > 0) tr
              JOIN (SELECT DISTINCT unnest(sh) AS s
                    FROM (SELECT doc_id,
                            list_distinct(list_transform(
                              range(len(toks) - ${w - 1}),
                              i -> $gram)) AS sh
                          FROM tk WHERE len(toks) >= $w) de
                    WHERE doc_id % 50 = 0 AND len(sh) > 0) ev
                USING (s)) fl
        JOIN tk t2 ON fl.doc_id = t2.doc_id)"""
  }

  /** DuckDB twin of IntMath.idivHalfUp. The `::BIGINT` on the result
    * is load-bearing: when `a`/`b` contain aggregates, DuckDB types
    * `sum(BIGINT)` as HUGEINT and the quotient column inherits it —
    * values match Spark's BIGINT bit-exactly, but the driver's hash
    * is dtype-sensitive (HUGEINT→pandas ≠ int64), which is exactly
    * the round-9 48-query regression. The cast is always safe: the
    * quotient equals a value Spark already represents as LongType.
    */
  private def sqlIdivHalfUp(a: String, b: String): String =
    s"(((2*($a) + ($b)) // (2*($b)))::BIGINT)"

  /** DuckDB twin of IntMath.microRatio: round-half-up(a*1e6/b). */
  private def sqlMicroRatio(a: String, b: String): String =
    sqlIdivHalfUp(s"($a) * 1000000", b)

  /** DuckDB twin of IntMath.idivHalfUpSigned: signed half-away-from-
    * zero integer division (b > 0).
    */
  private def sqlIdivHalfUpSigned(a: String, b: String): String =
    s"""(CASE WHEN ($a) < 0
          THEN -${sqlIdivHalfUp(s"-($a)", b)}
          ELSE ${sqlIdivHalfUp(a, b)} END)"""

  /** Pure-BIGINT micro-quality as a `qm (doc_id, q_micro)` CTE — the
    * DuckDB twin of [[graft.functions.TextFunctions.qualityMicro]]
    * (same three signals and weights as the double q15 score, every
    * term exact integer micro-units). Shared by every query whose
    * hashed/ordered surface carries quality.
    */
  private val qMicroCte: String = {
    val stopM = sqlIdivHalfUp("5000000 * n_stop", "n_toks")
    val punctM = sqlIdivHalfUp("10000000 * n_punct", "n_chars")
    s"""qm AS (SELECT doc_id,
                ${sqlIdivHalfUp(
        "5*len_m + 4*stop_m + (1000000 - punct_m)",
        "10")} AS q_micro
              FROM (SELECT doc_id,
                      least(n_toks * 5000, 1000000) AS len_m,
                      CASE WHEN n_toks = 0 THEN 0
                           ELSE least($stopM, 1000000) END AS stop_m,
                      CASE WHEN n_chars = 0 THEN 0
                           ELSE least($punctM, 1000000) END AS punct_m
                    FROM (SELECT doc_id,
                            len(toks) AS n_toks,
                            len(list_filter(toks, w -> w IN
                              ('the','a','an','and','or','of','to','in','is','it')
                              )) AS n_stop,
                            length(text)
                              - length(translate(text, '.,!?;:', ''))
                              AS n_punct,
                            length(text) AS n_chars
                          FROM (SELECT doc_id, text,
                                  CASE WHEN length(trim(text)) = 0
                                       THEN []::VARCHAR[]
                                       ELSE regexp_split_to_array(
                                              trim(text), '\\s+')
                                  END AS toks
                                FROM documents) a) b) c)"""
  }

  /** The q15 quality score as a `qq (doc_id, q)` CTE — shared by the
    * canonical-survivor chain (q78 family) and the q205 cluster cap.
    */
  private val qualityCte: String =
    """qq AS (SELECT doc_id,
                round(0.5 * least(n_toks / 200.0, 1.0)
                    + 0.4 * least(stop_raw * 5.0, 1.0)
                    + 0.1 * (1.0 - least(punct_frac * 10.0, 1.0)), 6) AS q
              FROM (SELECT doc_id,
                      CASE WHEN len(toks) = 0 THEN 0.0
                           ELSE len(list_filter(toks, w -> w IN
                             ('the','a','an','and','or','of','to','in','is','it')
                             ))::DOUBLE / len(toks) END AS stop_raw,
                      len(toks)::DOUBLE AS n_toks,
                      CASE WHEN length(text) = 0 THEN 0.0
                           ELSE (length(text)
                                 - length(translate(text, '.,!?;:', '')))::DOUBLE
                                / length(text) END AS punct_frac
                    FROM (SELECT doc_id, text,
                            CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                                 ELSE regexp_split_to_array(trim(text), '\s+')
                            END AS toks
                          FROM documents) a) b)"""

  /** Full q129 oracle statement — shared by its entry and the q294
    * confusion-audit composition (embedded there as a subquery).
    */
  private val nbLangIdOracleSql: String =
    """WITH t AS (SELECT doc_id, lang,
                  CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                       ELSE regexp_split_to_array(trim(text), '\s+')
                  END AS toks FROM documents),
         tok AS MATERIALIZED (
           SELECT doc_id, lang, unnest(toks) AS w FROM t),
         dt AS MATERIALIZED (
           SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
         tl AS MATERIALIZED (
           SELECT lang AS l, w, count(*) AS ctl FROM tok GROUP BY 1, 2),
         ls AS (SELECT l, CAST(sum(ctl) AS BIGINT) AS cl
                FROM tl GROUP BY 1),
         pr AS (SELECT lang AS l, count(DISTINCT doc_id) AS n_docs
                FROM tok GROUP BY 1),
         tot AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS tot FROM pr),
         v AS (SELECT count(DISTINCT w) AS v FROM tl),
         lc AS (SELECT ls.l, ln(pr.n_docs / tot.tot) AS ln_prior,
                  ln(ls.cl + v.v) AS ln_denom
                FROM ls JOIN pr USING (l) CROSS JOIN tot CROSS JOIN v),
         ss AS MATERIALIZED (
           SELECT dt.doc_id, tl.l, sum(dt.c * ln(tl.ctl + 1)) AS s1
           FROM dt JOIN tl USING (w) GROUP BY 1, 2),
         dn AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_doc
                FROM dt GROUP BY 1),
         sc AS MATERIALIZED (
           SELECT d.doc_id, d.lang, lc.l,
             lc.ln_prior - dn.n_doc * lc.ln_denom
               + coalesce(ss.s1, 0.0) AS score
           FROM (SELECT doc_id, lang FROM t) d
           JOIN dn USING (doc_id)
           CROSS JOIN lc
           LEFT JOIN ss ON ss.doc_id = d.doc_id AND ss.l = lc.l),
         rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                  ORDER BY score DESC, l ASC) AS rn FROM sc)
         SELECT doc_id, any_value(lang) AS lang,
           max(CASE WHEN rn = 1 THEN l END) AS pred_lang,
           round(max(CASE WHEN rn = 1 THEN score END)
             - max(CASE WHEN rn = 2 THEN score END), 6) AS margin,
           CAST(max(CASE WHEN rn = 1 THEN l END) = any_value(lang)
             AS INTEGER) AS correct
         FROM rk WHERE rn <= 2 GROUP BY doc_id"""

  private val canonicalChainCtes: String =
    s"""$shinglesCte,
       e0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
              WHERE len(sh) > 0),
       pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                count(*) AS inter,
                any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
              FROM e0 a JOIN e0 b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
       ed AS (SELECT doc_a, doc_b FROM pr
              WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6) >= 0.05),
       nodes AS (SELECT doc_id FROM d WHERE len(sh) > 0),
       sym AS (SELECT doc_a AS a, doc_b AS b FROM ed
               UNION SELECT doc_b, doc_a FROM ed),
       reach(a, b) AS (
         SELECT doc_id, doc_id FROM nodes
         UNION
         SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
       lab AS (SELECT a AS doc_id, min(b) AS cluster_id
               FROM reach GROUP BY a),
       sz AS (SELECT cluster_id, count(*) AS cluster_size
              FROM lab GROUP BY 1),
       $qMicroCte,
       surv AS (SELECT lab.cluster_id, sz.cluster_size, lab.doc_id,
                  qm.q_micro,
                  row_number() OVER (PARTITION BY lab.cluster_id
                    ORDER BY qm.q_micro DESC, lab.doc_id ASC) AS rn
                FROM lab
                JOIN sz USING (cluster_id)
                JOIN qm USING (doc_id))"""

  /** The four quality gates as one long (doc_id, gate, f) flag CTE —
    * each gate's full proven oracle embedded as a subquery. Shared by
    * the q190 agreement (κ) and q206 McNemar compositions.
    */
  private lazy val gateFlagsCtes: String =
    s"""g1 AS (SELECT doc_id, keep AS f
              FROM ($gopherOracleSql) x1),
       g2 AS (SELECT doc_id, pred_quality AS f
              FROM ($lrQualityOracleSql) x2),
       g3 AS (SELECT doc_id, keep = 1 AS f
              FROM ($mooreLewisOracleSql) x3),
       g4 AS (SELECT doc_id, keep = 1 AS f
              FROM ($trigramPplOracleSql) x4),
       fl AS (SELECT doc_id, 'gopher' AS gate, f FROM g1
              UNION ALL SELECT doc_id, 'lr', f FROM g2
              UNION ALL SELECT doc_id, 'ml', f FROM g3
              UNION ALL SELECT doc_id, 'ppl', f FROM g4)"""

  /** The q93 Lloyd chain as a reusable WITH prefix: `e` (double-cast
    * vectors), deterministic `init` (k=8 lowest vec_ids), two unrolled
    * assign→update rounds, and the final assignment `a3` — filter
    * `rn = 1` to read the converged (vec_id, cluster). Shared by the
    * q93 gate and the q135 SemDeDup composition.
    */
  private val kmeansCtes: String = {
    def assignCte(name: String, cents: String): String =
      s"""$name AS (SELECT vec_id, cluster, dist,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY dist, cluster) AS rn
           FROM (SELECT e.vec_id, c.cluster,
                   list_sum(list_transform(list_zip(e.emb, c.c_vec),
                     p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
                 FROM e CROSS JOIN $cents c) x)"""
    def updateCte(name: String, assigned: String): String =
      s"""$name AS (SELECT cluster, list(v ORDER BY dim) AS c_vec FROM (
             SELECT a.cluster, s.dim AS dim, round(avg(s.x), 6) AS v
             FROM (SELECT vec_id,
                     unnest(list_transform(range(len(emb)),
                       i -> {'dim': i, 'x': emb[i+1]})) AS s FROM e) cells
             JOIN (SELECT vec_id, cluster FROM $assigned WHERE rn = 1) a
               USING (vec_id)
             GROUP BY 1, 2) m GROUP BY cluster)"""
    s"""e AS MATERIALIZED (SELECT vec_id,
             list_transform(embedding, x -> x::DOUBLE) AS emb
           FROM embeddings),
         init AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
                    AS INTEGER) AS cluster, emb AS c_vec
                  FROM (SELECT vec_id, emb FROM e
                        ORDER BY vec_id LIMIT 8) s),
         ${assignCte("a1", "init")},
         ${updateCte("cl1", "a1")},
         ${assignCte("a2", "cl1")},
         ${updateCte("cl2", "a2")},
         ${assignCte("a3", "cl2")}"""
  }

  /** DuckDB-dialect oracle for each query (same column aliases). */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 6) AS avg_qty,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",
    "q02_revenue_filter" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
         count(*) AS n_rows
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount BETWEEN 0.03 AND 0.09
           AND l_quantity < 30""",
    "q03_revenue_by_nation" ->
      """SELECT n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",
    "q04_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC
         LIMIT 10""",
    "q05_window_rank" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rk
           FROM orders) t
         WHERE rk <= 3""",
    "q06_distinct_counts" ->
      """SELECT l_returnflag,
         count(DISTINCT l_orderkey) AS n_orders,
         count(DISTINCT l_partkey) AS n_parts,
         count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag""",
    "q07_union_merge" ->
      """SELECT CAST(1 AS INTEGER) AS branch_rank, o_orderkey, o_orderstatus,
                o_totalprice
         FROM orders WHERE o_orderstatus = 'F'
         UNION ALL
         SELECT CAST(2 AS INTEGER) AS branch_rank, o_orderkey, o_orderstatus,
                o_totalprice
         FROM orders WHERE o_orderstatus = 'O'""",
    "q08_semi_anti_join" ->
      """SELECT 'with_orders' AS bucket, c_custkey FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         UNION ALL
         SELECT 'no_orders' AS bucket, c_custkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q09_status_pivot" ->
      """SELECT o_orderpriority,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
         CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
         round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS value_f
         FROM orders GROUP BY o_orderpriority""",
    "q10_rollup_revenue" ->
      """SELECT r_name, n_name,
         round(sum(c_acctbal), 2) AS sum_bal, count(*) AS n
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)""",
    "q11_orders_by_month" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
         FROM orders GROUP BY 1""",
    "q12_mktsegment_share" ->
      s"""SELECT c_mktsegment, n,
         ${sqlMicroRatio("n", "sum(n) OVER ()")} AS share_ppm
         FROM (SELECT c_mktsegment, count(*)::BIGINT AS n
               FROM customer GROUP BY c_mktsegment) t""",
    "q13_clean_text" ->
      """SELECT doc_id, clean,
         CASE WHEN length(clean) > 120 THEN substr(clean, 1, 120) || '...'
              ELSE clean END AS clean_120
         FROM (SELECT doc_id,
                 trim(regexp_replace(text, '\s+', ' ', 'g')) AS clean
               FROM documents) t""",
    "q14_token_stats" ->
      s"""SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(lower(text),
           '[a-z0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_tokens_bpe,
         CAST(length(text) AS BIGINT) AS n_chars_raw,
         CASE WHEN len(toks) = 0 THEN 0::BIGINT
              ELSE ${sqlIdivHalfUp(
          "list_sum(list_transform(toks, w -> length(w))) * 1000",
          "len(toks)")} END AS avg_token_len_milli
         FROM (SELECT doc_id, text,
                 CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
               FROM documents) t""",
    "q15_quality_score" ->
      """SELECT doc_id,
         round(stop_raw, 6) AS stop_ratio,
         CAST(n_punct AS BIGINT) AS n_punct,
         round(0.5 * least(n_toks / 200.0, 1.0)
             + 0.4 * least(stop_raw * 5.0, 1.0)
             + 0.1 * (1.0 - least(punct_frac * 10.0, 1.0)), 6) AS quality
         FROM (SELECT doc_id,
                 CASE WHEN len(toks) = 0 THEN 0.0
                      ELSE len(list_filter(toks, w -> w IN
                        ('the','a','an','and','or','of','to','in','is','it')
                        ))::DOUBLE / len(toks) END AS stop_raw,
                 len(toks)::DOUBLE AS n_toks,
                 length(text) - length(translate(text, '.,!?;:', '')) AS n_punct,
                 CASE WHEN length(text) = 0 THEN 0.0
                      ELSE (length(text) - length(translate(text, '.,!?;:', '')))::DOUBLE
                           / length(text) END AS punct_frac
               FROM (SELECT doc_id, text,
                       CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
                     FROM documents) a) b""",
    "q16_lang_id" ->
      """SELECT doc_id, labeled_lang,
         CASE WHEN best <= 0 THEN 'und'
              WHEN s_en = best THEN 'en'
              WHEN s_de = best THEN 'de'
              WHEN s_fr = best THEN 'fr'
              WHEN s_es = best THEN 'es'
              WHEN s_zh = best THEN 'zh'
              ELSE 'und' END AS predicted_lang
         FROM (SELECT doc_id, labeled_lang, s_en, s_de, s_fr, s_es, s_zh,
                 greatest(s_en, s_de, s_fr, s_es, s_zh) AS best
               FROM (SELECT doc_id, lang AS labeled_lang,
                 len(list_filter(toks, w -> w IN ('the','and','of','to','is'))) AS s_en,
                 len(list_filter(toks, w -> w IN ('der','die','das','und','ist'))) AS s_de,
                 len(list_filter(toks, w -> w IN ('le','la','et','les','est'))) AS s_fr,
                 len(list_filter(toks, w -> w IN ('el','la','y','los','es'))) AS s_es,
                 len(list_filter(toks, w -> w IN ('的','是','了','在','我'))) AS s_zh
                 FROM (SELECT doc_id, lang,
                         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                              ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
                       FROM documents) a) b) c""",
    "q17_fingerprint" ->
      """SELECT doc_id, fp_hex,
         ('0x' || substr(fp_hex, 1, 15))::BIGINT AS fp_long,
         list_reduce(list_prepend(0::BIGINT,
           list_transform(range(length(clean)),
             i -> ord(substr(clean, (i+1)::INT, 1))::BIGINT)),
           (a, c) -> (a * 31 + c) % 1000000007) AS fp_rolling
         FROM (SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS clean,
                 md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp_hex
               FROM documents) t""",
    "q18_task_fanout" ->
      """WITH base AS (
           SELECT doc_id, text, lang, n_chars,
             trim(regexp_replace(text, '\s+', ' ', 'g')) AS clean,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
           FROM documents)
         SELECT doc_id, 'token_stats' AS task_type,
           'Count the tokens in this document.' AS instruction,
           CAST(CAST(len(toks) AS BIGINT) AS VARCHAR) AS output
         FROM base
         UNION ALL
         SELECT doc_id, 'summarize' AS task_type,
           'Summarize this document in one line.' AS instruction,
           CASE WHEN length(clean) > 80 THEN substr(clean, 1, 80) || '...'
                ELSE clean END AS output
         FROM base WHERE n_chars > 250
         UNION ALL
         SELECT doc_id, 'lang_verify' AS task_type,
           'Verify this document is in language: ' || lang AS instruction,
           lang AS output
         FROM base WHERE lang <> 'en'""",
    "q19_lang_stats" ->
      s"""WITH $qMicroCte,
         per_lang AS (
           SELECT d.lang, count(*)::BIGINT AS n_docs,
             CAST(sum(CASE WHEN length(trim(d.text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(trim(d.text), '\\s+')) END)
               AS BIGINT) AS n_tokens,
             ${sqlIdivHalfUp("sum(qm.q_micro)", "count(*)")}
               AS avg_quality_micro
           FROM documents d JOIN qm USING (doc_id) GROUP BY 1)
         SELECT lang, n_docs, n_tokens, avg_quality_micro,
           ${sqlMicroRatio("n_docs", "sum(n_docs) OVER ()")} AS share_ppm
         FROM per_lang""",
    "q20_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS survivor_id,
         count(*) AS n_copies
         FROM documents GROUP BY 1""",
    "q21_ngram_jaccard" ->
      s"""WITH $shinglesCte,
         e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
               WHERE len(sh) > 0),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS inter,
                 any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
               FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
         SELECT doc_a, doc_b,
           ${sqlMicroRatio("inter", "n_a + n_b - inter")} AS jaccard_ppm
         FROM p
         WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6) >= 0.05""",
    "q22_minhash_lsh" ->
      s"""WITH $shinglesCte,
         m AS (SELECT doc_id, sh,
                 list_transform(range(8), i -> list_min(list_transform(sh,
                   s -> ('0x' || substr(md5(i || ':' || s), 1, 15))::BIGINT))) AS mh
               FROM d WHERE len(sh) > 0),
         bd AS (SELECT doc_id, sh, mh, t.j,
                  mh[t.j*2+1] || '_' || mh[t.j*2+2] AS bval
                FROM m, range(4) t(j)),
         p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.mh AS mh_a, b.mh AS mh_b, a.sh AS sh_a, b.sh AS sh_b
               FROM bd a JOIN bd b
                 ON a.j = b.j AND a.bval = b.bval AND a.doc_id < b.doc_id)
         SELECT doc_a, doc_b,
           ${sqlMicroRatio(
          "len(list_filter(list_zip(mh_a, mh_b), z -> z[1] = z[2]))",
          "8")} AS est_jaccard_ppm,
           ${sqlMicroRatio("len(list_intersect(sh_a, sh_b))",
          "len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))")}
             AS jaccard_ppm
         FROM p""",
    // q198: the q22 candidate chain aggregated per estimate level —
    // pair count, mean and max |est − exact|.
    "q198_minhash_error" ->
      s"""WITH $shinglesCte,
         m AS (SELECT doc_id, sh,
                 list_transform(range(8), i -> list_min(list_transform(sh,
                   s -> ('0x' || substr(md5(i || ':' || s), 1, 15))::BIGINT))) AS mh
               FROM d WHERE len(sh) > 0),
         bd AS (SELECT doc_id, sh, mh, t.j,
                  mh[t.j*2+1] || '_' || mh[t.j*2+2] AS bval
                FROM m, range(4) t(j)),
         p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.mh AS mh_a, b.mh AS mh_b, a.sh AS sh_a, b.sh AS sh_b
               FROM bd a JOIN bd b
                 ON a.j = b.j AND a.bval = b.bval AND a.doc_id < b.doc_id),
         pe AS (SELECT
                  ${sqlMicroRatio(
          "len(list_filter(list_zip(mh_a, mh_b), z -> z[1] = z[2]))",
          "8")} AS est_jaccard_ppm,
                  abs(${sqlMicroRatio(
          "len(list_filter(list_zip(mh_a, mh_b), z -> z[1] = z[2]))",
          "8")}
                    - ${sqlMicroRatio("len(list_intersect(sh_a, sh_b))",
          "len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))")})
                    AS err
                FROM p)
         SELECT est_jaccard_ppm, count(*) AS n_pairs,
           ${sqlIdivHalfUp("sum(err) * 1000", "count(*)")}
             AS mean_abs_err_ppm_milli,
           max(err)::BIGINT AS max_abs_err_ppm
         FROM pe GROUP BY 1""",
    "q23_simhash" -> {
      val votes = (0 until 16)
        .map(b =>
          s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b")
        .mkString(", ")
      val bits = (0 until 16)
        .map(b => s"CASE WHEN v$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END")
        .mkString(" + ")
      s"""WITH t AS (SELECT doc_id, unnest(toks) AS w
               FROM (SELECT doc_id,
                       CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
                     FROM documents) x),
         hh AS (SELECT doc_id,
                  ('0x' || substr(md5('0:' || w), 1, 15))::BIGINT AS h
                FROM t),
         v AS (SELECT doc_id, $votes FROM hh GROUP BY doc_id)
         SELECT doc_id, $bits AS simhash FROM v"""
    },
    "q39_pipeline_e2e" ->
      s"""WITH per_doc AS (
           SELECT doc_id, text, lang, n_chars,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks,
             trim(regexp_replace(text, '\\s+', ' ', 'g')) AS clean
           FROM documents),
         scored AS (
           SELECT doc_id, text, lang, n_chars, toks, clean,
             round(0.5 * least(len(toks)::DOUBLE / 200.0, 1.0)
               + 0.4 * least(CASE WHEN len(toks) = 0 THEN 0.0
                   ELSE len(list_filter(toks, w -> w IN
                     ('the','a','an','and','or','of','to','in','is','it')
                     ))::DOUBLE / len(toks) END * 5.0, 1.0)
               + 0.1 * (1.0 - least(CASE WHEN length(text) = 0 THEN 0.0
                   ELSE (length(text) - length(translate(text, '.,!?;:', '')))::DOUBLE
                        / length(text) END * 10.0, 1.0)), 6) AS quality
           FROM per_doc),
         gated AS (SELECT * FROM scored WHERE quality >= 0.5),
         survivors AS (
           SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
         deduped AS (
           SELECT g.* FROM gated g
           WHERE EXISTS (SELECT 1 FROM survivors s WHERE s.doc_id = g.doc_id)),
         tasks AS (
           SELECT doc_id, quality, 'token_stats' AS task_type FROM deduped
           UNION ALL
           SELECT doc_id, quality, 'summarize' FROM deduped WHERE n_chars > 250
           UNION ALL
           SELECT doc_id, quality, 'lang_verify' FROM deduped WHERE lang <> 'en')
         SELECT task_type, count(*)::BIGINT AS n_examples,
           count(DISTINCT doc_id)::BIGINT AS n_docs,
           ${sqlIdivHalfUp(
          "sum(CAST(round(quality * 1000000) AS BIGINT))",
          "count(*)")} AS avg_quality_micro
         FROM tasks GROUP BY task_type""",
    "q40_range_join" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                value FROM events),
         l AS (SELECT e.*, lag(ts) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
               FROM e),
         f AS (SELECT l.*, CASE WHEN prev_ts IS NULL
                 OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                 THEN 1 ELSE 0 END AS is_new FROM l),
         sq AS (SELECT f.*, CAST(sum(is_new) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_seq FROM f),
         sessions AS (SELECT user_id, session_seq,
             min(ts) AS session_start, max(ts) AS session_end
           FROM sq GROUP BY 1, 2)
         SELECT s.user_id, s.session_seq, count(*) AS n_in_range
         FROM sessions s
         JOIN e ON e.user_id = s.user_id
           AND e.ts >= s.session_start AND e.ts <= s.session_end
         GROUP BY 1, 2""",
    "q41_interval_counts" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                event_type FROM events),
         p AS (SELECT event_id AS purchase_id, user_id, ts FROM e
               WHERE event_type = 'purchase'),
         er AS (SELECT user_id, ts AS err_ts FROM e
                WHERE event_type = 'error'),
         c AS (SELECT p.purchase_id, count(*) AS n
               FROM p JOIN er ON p.user_id = er.user_id
                 AND er.err_ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
               GROUP BY 1)
         SELECT p.purchase_id, p.user_id, p.ts,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_recent_errors
         FROM p LEFT JOIN c USING (purchase_id)""",
    "q42_distribution_stats" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.25), 6) AS qty_p25,
         round(quantile_cont(l_quantity, 0.5), 6) AS qty_p50,
         round(quantile_cont(l_quantity, 0.75), 6) AS qty_p75,
         round(stddev_samp(l_extendedprice), 4) AS price_stddev,
         round(corr(l_extendedprice, l_discount), 6) AS price_disc_corr
         FROM lineitem GROUP BY l_returnflag""",
    "q43_cube" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    // Plain all-pairs SQL: the engine's prefix-blocked plan is
    // LOSSLESS for edit distance ≤ 2 (count-filter bound, see
    // Dedup.fuzzyNamePairs), so the naive oracle is the same set.
    "q44_fuzzy_pairs" ->
      """SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
         CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
         FROM part a JOIN part b
           ON a.p_partkey < b.p_partkey
         WHERE levenshtein(a.p_name, b.p_name) <= 2""",
    "q37_simhash_pairs" -> {
      val votes = (0 until 16)
        .map(b =>
          s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b")
        .mkString(", ")
      val bits = (0 until 16)
        .map(b => s"CASE WHEN v$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END")
        .mkString(" + ")
      s"""WITH t AS (SELECT doc_id, unnest(toks) AS w
               FROM (SELECT doc_id,
                       CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
                     FROM documents) x),
         hh AS (SELECT doc_id,
                  ('0x' || substr(md5('0:' || w), 1, 15))::BIGINT AS h
                FROM t),
         v AS (SELECT doc_id, $votes FROM hh GROUP BY doc_id),
         sh AS (SELECT doc_id, $bits AS simhash FROM v)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"""
    },
    "q38_filtered_subset" ->
      """SELECT doc_id, 'summarize' AS task_type,
         'Summarize this document in one line.' AS instruction,
         CASE WHEN length(clean) > 80 THEN substr(clean, 1, 80) || '...'
              ELSE clean END AS output
         FROM (SELECT doc_id, n_chars,
                 trim(regexp_replace(text, '\\s+', ' ', 'g')) AS clean
               FROM documents) t
         WHERE n_chars > 250
         ORDER BY doc_id LIMIT 100""",
    "q24_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec
                FROM embeddings WHERE vec_id < 5),
         s AS (SELECT q_id, vec_id,
                 ${cosSql("q_vec", "embedding")} AS sim
               FROM embeddings, q)
         SELECT q_id, vec_id, round(sim, 6) AS sim, rk
         FROM (SELECT q_id, vec_id, sim,
                 CAST(row_number() OVER (PARTITION BY q_id
                   ORDER BY sim DESC, vec_id ASC) AS INTEGER) AS rk
               FROM s) t
         WHERE rk <= 10""",
    "q25_ivf_topk" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS c_vec
                FROM embeddings WHERE vec_id < 8),
         sims AS (SELECT e.vec_id, e.embedding, c.cid,
                    ${cosSql("c_vec", "embedding")} AS csim
                  FROM embeddings e, c),
         asg AS (SELECT vec_id, embedding, cid
                 FROM (SELECT vec_id, embedding, cid,
                         row_number() OVER (PARTITION BY vec_id
                           ORDER BY csim DESC, cid ASC) AS rk
                       FROM sims) t WHERE rk = 1),
         q AS (SELECT vec_id AS q_id, embedding AS q_vec, cid
               FROM asg WHERE vec_id < 3),
         cand AS (SELECT q.q_id, a.vec_id,
                    ${cosSql("q_vec", "a.embedding")} AS sim
                  FROM asg a JOIN q ON a.cid = q.cid)
         SELECT q_id, vec_id, round(sim, 6) AS sim, rk
         FROM (SELECT q_id, vec_id, sim,
                 CAST(row_number() OVER (PARTITION BY q_id
                   ORDER BY sim DESC, vec_id ASC) AS INTEGER) AS rk
               FROM cand) t
         WHERE rk <= 5""",
    // q106: probe-2 IVF — same centroid set and assignment as q25,
    // queries additionally search their runner-up cluster.
    "q106_ivf_probe2" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS c_vec
                FROM embeddings WHERE vec_id < 8),
         sims AS (SELECT e.vec_id, e.embedding, c.cid,
                    ${cosSql("c_vec", "embedding")} AS csim
                  FROM embeddings e, c),
         asg AS (SELECT vec_id, embedding, cid
                 FROM (SELECT vec_id, embedding, cid,
                         row_number() OVER (PARTITION BY vec_id
                           ORDER BY csim DESC, cid ASC) AS rk
                       FROM sims) t WHERE rk = 1),
         qp AS (SELECT vec_id AS q_id, embedding AS q_vec, cid
                FROM (SELECT vec_id, embedding, cid,
                        row_number() OVER (PARTITION BY vec_id
                          ORDER BY csim DESC, cid ASC) AS crk
                      FROM sims WHERE vec_id < 3) t WHERE crk <= 2),
         cand AS (SELECT qp.q_id, a.vec_id,
                    ${cosSql("q_vec", "a.embedding")} AS sim
                  FROM asg a JOIN qp ON a.cid = qp.cid)
         SELECT q_id, vec_id, round(sim, 6) AS sim, rk
         FROM (SELECT q_id, vec_id, sim,
                 CAST(row_number() OVER (PARTITION BY q_id
                   ORDER BY sim DESC, vec_id ASC) AS INTEGER) AS rk
               FROM cand) t
         WHERE rk <= 5""",
    // q107: the lake round-trip must equal the straight aggregate.
    "q107_stream_lake" ->
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1""",
    // Exact replay of the engine's banded sign-LSH candidate
    // generation (4 bands × 4 planes, hyperplanes = vectors 100-115)
    // + cosine verify — the gate checks the REAL scale plan, so LSH
    // recall is part of the pinned semantics, not a silent loss.
    "q26_embedding_neardup" -> {
      val pairCos = cosSql("e1.embedding", "e2.embedding")
      s"""WITH pl AS (SELECT list(embedding ORDER BY vec_id) AS planes
                FROM embeddings WHERE vec_id BETWEEN 100 AND 115),
         v AS (SELECT vec_id, embedding FROM embeddings),
         bands AS (SELECT v.vec_id, s.b AS band,
                 array_to_string(list_transform(
                   [pl.planes[s.b * 4 + 1], pl.planes[s.b * 4 + 2],
                    pl.planes[s.b * 4 + 3], pl.planes[s.b * 4 + 4]], p ->
                   CASE WHEN list_sum(list_transform(
                          list_zip(p, v.embedding),
                          z -> z[1]::DOUBLE * z[2]::DOUBLE)) >= 0
                        THEN '1' ELSE '0' END), '') AS code
               FROM v, pl, (SELECT unnest(range(4)) AS b) s),
         p AS (SELECT DISTINCT b1.vec_id AS vec_a, b2.vec_id AS vec_b
               FROM bands b1 JOIN bands b2
                 ON b1.band = b2.band AND b1.code = b2.code
                 AND b1.vec_id < b2.vec_id),
         s AS (SELECT p.vec_a, p.vec_b, $pairCos AS sim
               FROM p JOIN v e1 ON p.vec_a = e1.vec_id
                      JOIN v e2 ON p.vec_b = e2.vec_id)
         SELECT vec_a, vec_b, round(sim, 6) AS sim
         FROM s WHERE sim > 0.4"""
    },
    "q27_tumbling_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
         event_type, count(*) AS n_events,
         round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q28_sliding_window" ->
      """SELECT CAST(wstart AS TIMESTAMP) AS window_start, event_type,
         count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM (SELECT unnest([
                 time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
                 time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
                   - INTERVAL '30 minutes']) AS wstart,
               event_type, value FROM events) t
         GROUP BY 1, 2""",
    "q29_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                value FROM events),
         l AS (SELECT e.*, lag(ts) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
               FROM e),
         f AS (SELECT l.*, CASE WHEN prev_ts IS NULL
                 OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                 THEN 1 ELSE 0 END AS is_new FROM l),
         s AS (SELECT f.*, CAST(sum(is_new) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_seq FROM f)
         SELECT user_id, session_seq,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM s GROUP BY 1, 2""",
    "q30_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                event_type, value FROM events),
         w AS (SELECT e.*,
                 last_value(CASE WHEN event_type = 'error' THEN ts END
                   IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prior_error_ts,
                 last_value(CASE WHEN event_type = 'error' THEN value END
                   IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prior_error_value
               FROM e)
         SELECT event_id, user_id, ts, value, prior_error_ts,
           prior_error_value
         FROM w WHERE event_type = 'purchase'""",
    // q105: the native as-of join must reproduce q30's oracle exactly.
    "q105_asof_native" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                event_type, value FROM events),
         w AS (SELECT e.*,
                 last_value(CASE WHEN event_type = 'error' THEN ts END
                   IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prior_error_ts,
                 last_value(CASE WHEN event_type = 'error' THEN value END
                   IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prior_error_value
               FROM e)
         SELECT event_id, user_id, ts, value, prior_error_ts,
           prior_error_value
         FROM w WHERE event_type = 'purchase'""",
    "q32_stream_tumbling" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
         event_type, count(*) AS n_events,
         round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2""",
    // The five G1-G5 generators (the reference's transform_issue)
    // replayed in DuckDB SQL from the raw fixture: guards, slices,
    // templating, comment joins, and the per-issue emission order —
    // proven equal to the executed-reference golden, and here
    // hash-matched against the Catalyst column form.
    "q55_jira_fanout_sql" ->
      ("""WITH raw AS (
           SELECT * FROM read_json(
             '/root/repo/src/test/resources/jira/raw_issues_TEST.jsonl',
             format='newline_delimited', columns={
               'key': 'VARCHAR', 'id': 'VARCHAR',
               'fields': 'STRUCT(summary VARCHAR, description VARCHAR,
                  status STRUCT(name VARCHAR),
                  priority STRUCT(name VARCHAR),
                  issuetype STRUCT(name VARCHAR),
                  reporter STRUCT(displayName VARCHAR, name VARCHAR),
                  assignee STRUCT(displayName VARCHAR, name VARCHAR),
                  created VARCHAR, updated VARCHAR,
                  resolutiondate VARCHAR,
                  labels VARCHAR[], components STRUCT(name VARCHAR)[],
                  versions STRUCT(name VARCHAR)[],
                  fixVersions STRUCT(name VARCHAR)[],
                  comment STRUCT(comments STRUCT(
                    author STRUCT(displayName VARCHAR, name VARCHAR),
                    created VARCHAR, body VARCHAR)[]))'})),
         """ + jiraProbeCte(Seq(
             "/root/repo/src/test/resources/jira/raw_issues_TEST.jsonl")) +
      """,
         fl AS (
           SELECT
             COALESCE(key, '') AS issue_key,
             COALESCE(fields.created, '') AS created,
             trim(regexp_replace(COALESCE(fields.summary, ''), '\s+', ' ', 'g')) AS title,
             CASE WHEN length(trim(regexp_replace(COALESCE(fields.description, ''), '\s+', ' ', 'g'))) > 20000
                  THEN substr(trim(regexp_replace(COALESCE(fields.description, ''), '\s+', ' ', 'g')), 1, 20000) || '...'
                  ELSE trim(regexp_replace(COALESCE(fields.description, ''), '\s+', ' ', 'g')) END AS d,
             COALESCE(fields.status.name, 'Unknown') AS status,
             COALESCE(fields.priority.name, 'Unknown') AS priority,
             COALESCE(fields.issuetype.name, 'Unknown') AS issue_type,
             CASE WHEN fields.assignee IS NULL THEN 'Unknown'
                  ELSE COALESCE(fields.assignee.displayName,
                         fields.assignee.name, 'Unknown') END AS assignee,
             COALESCE(list_filter(
               list_transform(
                 list_transform(fields.comment.comments,
                   x -> trim(regexp_replace(COALESCE(x.body, ''), '\s+', ' ', 'g'))),
                 b -> CASE WHEN length(b) > 10000
                      THEN substr(b, 1, 10000) || '...' ELSE b END),
               b -> length(b) > 0), []::VARCHAR[]) AS cb
           FROM raw
           WHERE """ + jiraKeepSql + """),
         ex AS (
           SELECT issue_key, created,
             list_filter([
               CASE WHEN d <> '' OR len(cb) > 0 THEN {
                 't': 'summarization',
                 'ins': 'Summarize the following software issue and its discussion:',
                 'inp': array_to_string(list_filter([
                     CASE WHEN d <> '' THEN 'Description: ' || d END,
                     CASE WHEN len(cb) >= 1 THEN 'Comment 1: ' || cb[1] END,
                     CASE WHEN len(cb) >= 2 THEN 'Comment 2: ' || cb[2] END,
                     CASE WHEN len(cb) >= 3 THEN 'Comment 3: ' || cb[3] END
                   ], p -> p IS NOT NULL), chr(10) || chr(10)),
                 'out': title || ' (Status: ' || status || ', Priority: ' || priority || ')'} END,
               CASE WHEN title <> '' AND priority <> '' THEN {
                 't': 'classification',
                 'ins': 'Classify the priority of this software issue (Blocker, Critical, Major, Minor, Trivial):',
                 'inp': 'Title: ' || title || chr(10) ||
                        CASE WHEN d <> '' THEN 'Description: ' || substr(d, 1, 500) ELSE '' END,
                 'out': priority} END,
               CASE WHEN title <> '' AND status <> '' THEN {
                 't': 'status_prediction',
                 'ins': 'Predict the current status of this software issue:',
                 'inp': 'Issue: ' || title || chr(10) || 'Type: ' || issue_type || chr(10) ||
                        'Priority: ' || priority || chr(10) ||
                        CASE WHEN d <> '' THEN 'Description: ' || substr(d, 1, 500) ELSE '' END,
                 'out': status} END,
               {'t': 'question_answering',
                'ins': 'Answer the following question about this software issue:',
                'inp': 'Issue Key: ' || issue_key || chr(10) || 'Title: ' || title ||
                       chr(10) || 'Description: ' || d || chr(10) || chr(10) ||
                       'Question: What is this issue about?',
                'out': title},
               {'t': 'question_answering',
                'ins': 'Answer the following question about this software issue:',
                'inp': 'Issue Key: ' || issue_key || chr(10) || 'Title: ' || title ||
                       chr(10) || chr(10) || 'Question: What is the current status of this issue?',
                'out': status},
               CASE WHEN assignee <> '' AND assignee <> 'Unknown' THEN {
                 't': 'question_answering',
                 'ins': 'Answer the following question about this software issue:',
                 'inp': 'Issue Key: ' || issue_key || chr(10) || 'Title: ' || title ||
                        chr(10) || chr(10) || 'Question: Who is assigned to this issue?',
                 'out': assignee} END,
               CASE WHEN len(cb) > 0 AND status IN ('Resolved', 'Closed') THEN {
                 't': 'issue_resolution',
                 'ins': 'Based on the issue discussion, explain how this issue was resolved:',
                 'inp': 'Issue: ' || title || chr(10) ||
                        CASE WHEN d <> '' THEN 'Description: ' || substr(d, 1, 500) || chr(10) ELSE '' END ||
                        chr(10) || 'How was this issue resolved?',
                 'out': substr(array_to_string(
                          CASE WHEN len(cb) >= 2 THEN [cb[len(cb)-1], cb[len(cb)]] ELSE cb END,
                          chr(10)), 1, 500)} END
             ], e -> e IS NOT NULL) AS exs
           FROM fl)
         SELECT issue_key, created, CAST(s.i AS INTEGER) AS task_rank,
           s.e.t AS task_type, s.e.ins AS instruction,
           s.e.inp AS input, s.e.out AS output
         FROM (SELECT issue_key, created,
                 unnest(list_transform(range(len(exs)),
                   i -> {'i': i, 'e': exs[i+1]})) AS s
               FROM ex) u"""),
    // clean_text = trim ∘ collapse-\s+ (the F1 semantics); reused for
    // title/description/comment bodies below.
    "q54_jira_flatten_sql" -> jiraFlattenOracleSql(withArrayCsv = false),
    // qj04: the DSv2 connector path gated on values, not just row
    // count — the stub search pages are byte-identical to
    // raw_issues_TEST.jsonl (enforced by JiraSourceSpec's
    // fixture-identity test), so DuckDB replays the same flatten over
    // the JSONL while the engine reads through the paginated source.
    "qj04_jira_source" -> jiraFlattenOracleSql(withArrayCsv = true),
    "q51_vocab" ->
      """WITH t AS (
           SELECT unnest(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+') END) AS token
           FROM documents),
         c AS (SELECT token, count(*) AS n FROM t GROUP BY 1)
         SELECT token, n,
           CAST(row_number() OVER (ORDER BY n DESC, token ASC) AS INTEGER)
             AS rank
         FROM c ORDER BY n DESC, token ASC LIMIT 1000""",
    "q52_sentences" ->
      """SELECT doc_id, CAST(s.i AS INTEGER) AS sent_idx, s.v AS sentence
         FROM (SELECT doc_id,
                 unnest(list_transform(range(len(l)),
                   i -> {'i': i + 1, 'v': l[i + 1]})) AS s
               FROM (SELECT doc_id,
                       regexp_split_to_array(trim(text), '[.!?]+\s+') AS l
                     FROM documents) d) u""",
    "q53_pack_windows" ->
      """WITH d AS (
           SELECT doc_id, lang,
             CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END
               AS BIGINT) AS n_tokens
           FROM documents),
         c AS (SELECT d.*, CAST(sum(n_tokens) OVER
                 (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_tokens FROM d)
         SELECT doc_id, lang, n_tokens, cum_tokens,
           (cum_tokens - n_tokens) // 2048 AS window_id
         FROM c""",
    "q49_train_test_split" ->
      """SELECT doc_id,
         CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100
           AS INTEGER) AS bucket,
         CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 80
              THEN 'train'
              WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 90
              THEN 'valid' ELSE 'test' END AS split
         FROM documents""",
    "q50_quality_deciles" ->
      s"""WITH $qMicroCte
         SELECT doc_id, q_micro,
           CAST(ntile(10) OVER (ORDER BY q_micro DESC, doc_id)
             AS INTEGER) AS decile
         FROM qm""",
    "q45_stream_latest_dedup" ->
      """SELECT CAST(user_id AS VARCHAR) AS k,
         max(CAST(ts AS TIMESTAMP)) AS latest_ts
         FROM events GROUP BY 1""",
    "q46_stream_interval_join" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                event_type FROM events)
         SELECT p.event_id AS purchase_id, p.user_id,
           p.ts AS p_ts, er.ts AS e_ts
         FROM e p JOIN e er
           ON p.event_type = 'purchase' AND er.event_type = 'error'
           AND p.user_id = er.user_id
           AND er.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts""",
    // Batch sessionization restricted to what the stream emits: a
    // session closed by a later event of the same user, or a trailing
    // session whose event-time timeout (end + 30 min, ms precision)
    // fell strictly below the final watermark (max ts - 10 min, ms).
    "q47_stream_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                value FROM events),
         l AS (SELECT e.*, lag(ts) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
               FROM e),
         f AS (SELECT l.*, CASE WHEN prev_ts IS NULL
                 OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                 THEN 1 ELSE 0 END AS is_new FROM l),
         sq AS (SELECT f.*, CAST(sum(is_new) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_seq FROM f),
         sess AS (SELECT user_id, session_seq,
             min(ts) AS session_start, max(ts) AS session_end,
             count(*) AS n_events, round(sum(value), 2) AS sum_value
           FROM sq GROUP BY 1, 2),
         mx AS (SELECT max(ts) AS m FROM e),
         marked AS (SELECT sess.*,
             session_seq = max(session_seq) OVER (PARTITION BY user_id)
               AS is_final
           FROM sess)
         SELECT user_id, session_start, session_end, n_events, sum_value
         FROM marked, mx
         WHERE NOT is_final
            OR epoch_ms(session_end) + 1800000 < epoch_ms(m) - 600000""",
    "q48_frame_sample" ->
      """SELECT doc_id, n_frames, CAST(frame_idx AS INTEGER) AS frame_idx,
         CAST((frame_idx * 1000) // 24 AS BIGINT) AS ts_ms
         FROM (
           SELECT doc_id, n_frames,
             unnest(range(0, n_frames, greatest(1, n_frames // 8)))
               AS frame_idx
           FROM (SELECT doc_id,
                   CAST(octet_length(encode(text)) % 240 + 1 AS INTEGER)
                     AS n_frames
                 FROM documents) a) b""",
    // q35: the register-level HLL state (shared 60-bit md5 hash, top
    // 8 bits route, first-1-bit rho) replayed exactly — the estimate
    // itself is spec-audited, never hashed (round-9 convention).
    "q35_approx_distinct" ->
      """WITH h AS (SELECT
             ('0x' || substr(md5(l_orderkey::VARCHAR), 1, 15))::BIGINT
               AS h
           FROM lineitem),
         r AS (SELECT h >> 52 AS reg,
                 CASE WHEN (h & 4503599627370495) = 0 THEN 53
                      ELSE 53 - length(bin(h & 4503599627370495))
                 END AS rho
               FROM h),
         regs AS (SELECT reg, max(rho) AS mj FROM r GROUP BY 1),
         sk AS (SELECT count(*)::BIGINT AS n_occupied,
                  sum((1::BIGINT << CAST(53 - mj AS INTEGER)))::BIGINT
                    AS sum_t
                FROM regs),
         ex AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS exact
                FROM lineitem)
         SELECT exact, 256::BIGINT AS m,
           256 - n_occupied AS n_zero_registers, sum_t
         FROM ex, sk""",
    "q36_salted_join" ->
      """SELECT o_orderpriority,
         round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n_rows
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority""",
    "q34_profile" ->
      """WITH a AS (
           SELECT count(*) AS n_rows,
             CAST(min(l_quantity) AS VARCHAR) AS qty_min,
             CAST(max(l_quantity) AS VARCHAR) AS qty_max,
             count(DISTINCT l_quantity) AS qty_distinct,
             CAST(count(*) FILTER (l_quantity IS NULL) AS BIGINT) AS qty_nulls,
             CAST(min(l_extendedprice) AS VARCHAR) AS price_min,
             CAST(max(l_extendedprice) AS VARCHAR) AS price_max,
             count(DISTINCT l_extendedprice) AS price_distinct,
             CAST(count(*) FILTER (l_extendedprice IS NULL) AS BIGINT) AS price_nulls,
             CAST(min(l_returnflag) AS VARCHAR) AS flag_min,
             CAST(max(l_returnflag) AS VARCHAR) AS flag_max,
             count(DISTINCT l_returnflag) AS flag_distinct,
             CAST(count(*) FILTER (l_returnflag IS NULL) AS BIGINT) AS flag_nulls,
             CAST(min(l_orderkey) AS VARCHAR) AS okey_min,
             CAST(max(l_orderkey) AS VARCHAR) AS okey_max,
             count(DISTINCT l_orderkey) AS okey_distinct,
             CAST(count(*) FILTER (l_orderkey IS NULL) AS BIGINT) AS okey_nulls
           FROM lineitem)
         SELECT 'l_quantity' AS column_name, n_rows, qty_min AS min_value,
           qty_max AS max_value, qty_distinct AS n_distinct, qty_nulls AS n_null FROM a
         UNION ALL
         SELECT 'l_extendedprice', n_rows, price_min, price_max,
           price_distinct, price_nulls FROM a
         UNION ALL
         SELECT 'l_returnflag', n_rows, flag_min, flag_max,
           flag_distinct, flag_nulls FROM a
         UNION ALL
         SELECT 'l_orderkey', n_rows, okey_min, okey_max,
           okey_distinct, okey_nulls FROM a""",
    // FakeDecoder reimplemented in SQL (see decodeCtes), with float32
    // division for the feature values — bit-exact vs the Scala stub.
    "q33_multimodal_decode" -> {
      val feats = (0 until 8)
        .map(i =>
          s"(CAST(${fmod(shr(i * 7), 1000L)} AS BIGINT)::FLOAT" +
            s" / 1000::FLOAT)::DOUBLE AS f$i")
        .mkString(", ")
      s"""$decodeCtes
         SELECT doc_id, n_bytes, width, height,
           CAST(3 AS INTEGER) AS channels,
           $feats
         FROM dims"""
    },
    "q66_bpe_tokens" ->
      s"""SELECT doc_id, n_bpe_tokens,
         CAST(len(toks) AS BIGINT) AS n_ws_tokens,
         CASE WHEN len(toks) = 0 THEN 0::BIGINT
              ELSE ${sqlIdivHalfUp("n_bpe_tokens * 1000", "len(toks)")}
              END AS bpe_per_ws_milli
         FROM (SELECT doc_id,
                 CAST(len(regexp_extract_all(text,
                   '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'))
                   AS BIGINT) AS n_bpe_tokens,
                 CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
               FROM documents) a""",
    "q67_lag_lead" ->
      s"""WITH e AS (SELECT event_id, user_id, ts,
             CAST(round(value * 100) AS BIGINT) AS vc FROM events)
         SELECT event_id, user_id,
         lag(vc, 1) OVER w AS prev_value_cents,
         lead(vc, 1) OVER w AS next_value_cents,
         (epoch_us(ts) - epoch_us(lag(ts, 1) OVER w))::BIGINT
           AS us_since_prev,
         CAST(row_number() OVER w AS INTEGER) AS event_rank,
         ${sqlIdivHalfUp(
          "sum(vc) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 1000",
          "count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)")}
           AS moving_avg3_cents_milli
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    "q68_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INTEGER)
           AS gid,
         round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
           (l_returnflag), ())""",
    "q69_label_centroids" ->
      """SELECT label, CAST(s.i AS INTEGER) AS dim,
         round(avg(s.v::DOUBLE), 6) AS centroid_val,
         count(*) AS n_vecs
         FROM (SELECT label,
                 unnest(list_transform(range(len(embedding)),
                   i -> {'i': i, 'v': embedding[i + 1]})) AS s
               FROM embeddings) u
         GROUP BY 1, 2""",
    // Same uncapped 4-band × 4-plane coding as q26; the cross-band
    // candidate dedup keeps its count as n_shared_bands.
    "q70_lsh_neardup" -> {
      val pairCos = cosSql("e1.embedding", "e2.embedding")
      s"""WITH pl AS (SELECT list(embedding ORDER BY vec_id) AS planes
                FROM embeddings WHERE vec_id BETWEEN 100 AND 115),
         v AS (SELECT vec_id, embedding FROM embeddings),
         bands AS (SELECT v.vec_id, s.b AS band,
                 array_to_string(list_transform(
                   [pl.planes[s.b * 4 + 1], pl.planes[s.b * 4 + 2],
                    pl.planes[s.b * 4 + 3], pl.planes[s.b * 4 + 4]], p ->
                   CASE WHEN list_sum(list_transform(
                          list_zip(p, v.embedding),
                          z -> z[1]::DOUBLE * z[2]::DOUBLE)) >= 0
                        THEN '1' ELSE '0' END), '') AS code
               FROM v, pl, (SELECT unnest(range(4)) AS b) s),
         p AS (SELECT b1.vec_id AS vec_a, b2.vec_id AS vec_b,
                 count(*) AS n_shared_bands
               FROM bands b1 JOIN bands b2
                 ON b1.band = b2.band AND b1.code = b2.code
                 AND b1.vec_id < b2.vec_id
               GROUP BY 1, 2),
         s AS (SELECT p.vec_a, p.vec_b, p.n_shared_bands, $pairCos AS sim
               FROM p JOIN v e1 ON p.vec_a = e1.vec_id
                      JOIN v e2 ON p.vec_b = e2.vec_id)
         SELECT vec_a, vec_b, n_shared_bands, round(sim, 6) AS sim
         FROM s WHERE sim > 0.4"""
    },
    // Transitive closure over the q21 pair graph (small at oracle SF);
    // the engine side runs the O(log d) pointer-doubling algorithm —
    // same fixpoint, different mechanics.
    "q72_dedup_clusters" ->
      s"""WITH RECURSIVE $shinglesCte,
         e0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
                WHERE len(sh) > 0),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*) AS inter,
                  any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
                FROM e0 a JOIN e0 b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         ed AS (SELECT doc_a, doc_b FROM pr
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6) >= 0.05),
         nodes AS (SELECT doc_id FROM d WHERE len(sh) > 0),
         sym AS (SELECT doc_a AS a, doc_b AS b FROM ed
                 UNION SELECT doc_b, doc_a FROM ed),
         reach(a, b) AS (
           SELECT doc_id, doc_id FROM nodes
           UNION
           SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         lab AS (SELECT a AS doc_id, min(b) AS cluster_id
                 FROM reach GROUP BY a),
         sz AS (SELECT cluster_id, count(*) AS cluster_size
                FROM lab GROUP BY 1)
         SELECT l.doc_id, l.cluster_id, s.cluster_size,
           CAST(l.doc_id = l.cluster_id AS INTEGER) AS survivor
         FROM lab l JOIN sz s USING (cluster_id)""",
    "q73_decontaminate" ->
      """WITH dd AS (
           SELECT doc_id,
             list_distinct(list_transform(range(len(toks) - 4),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                 || ' ' || toks[i+4] || ' ' || toks[i+5])) AS sh
           FROM (SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
                 FROM documents) t
           WHERE len(toks) >= 5),
         ev AS (SELECT unnest(sh) AS s, doc_id AS eval_id FROM dd
                WHERE doc_id % 50 = 0),
         tr AS (SELECT doc_id, unnest(sh) AS s FROM dd
                WHERE doc_id % 50 <> 0)
         SELECT tr.doc_id,
           count(DISTINCT tr.s) AS n_shared_shingles,
           count(DISTINCT ev.eval_id) AS n_eval_docs
         FROM tr JOIN ev ON tr.s = ev.s
         GROUP BY 1""",
    "q74_tfidf_terms" ->
      """WITH toks AS (
           SELECT doc_id, unnest(
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents),
         sc AS (SELECT doc_id, term, tf, df,
                  round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6)
                    AS tfidf
                FROM tf JOIN df USING (term) CROSS JOIN n),
         rk AS (SELECT doc_id, term, tf, df, tfidf,
                  CAST(row_number() OVER (
                    PARTITION BY doc_id
                    ORDER BY tfidf DESC, term ASC) AS INTEGER) AS rank
                FROM sc)
         SELECT doc_id, term, tf, df, tfidf, rank FROM rk WHERE rank <= 3""",
    "q76_bloom_semi_join" ->
      """SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
         FROM lineitem
         WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                              WHERE o_orderpriority = '1-URGENT')
         GROUP BY l_returnflag""",
    "q75_shard_assign" ->
      """SELECT doc_id, CAST(h % 8 AS INTEGER) AS shard,
           CAST(row_number() OVER (
             PARTITION BY h % 8 ORDER BY h ASC, doc_id ASC) AS INTEGER)
             AS position
         FROM (SELECT doc_id,
                 ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h
               FROM documents) a""",
    "q71_stratified_sample" ->
      """SELECT doc_id, lang, bucket, keep_permille,
         bucket < keep_permille AS sampled
         FROM (SELECT doc_id, lang,
                 CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                   % 1000 AS INTEGER) AS bucket,
                 CAST(CASE lang WHEN 'en' THEN 1000 WHEN 'de' THEN 500
                   WHEN 'fr' THEN 500 WHEN 'es' THEN 250 WHEN 'zh' THEN 250
                   ELSE 1000 END AS INTEGER) AS keep_permille
               FROM documents) a""",
    "q65_fused_lang_id" ->
      """SELECT doc_id, s_en, s_de, s_fr, s_es, s_zh,
         CASE WHEN best <= 0 THEN 'und'
              WHEN s_en = best THEN 'en'
              WHEN s_de = best THEN 'de'
              WHEN s_fr = best THEN 'fr'
              WHEN s_es = best THEN 'es'
              WHEN s_zh = best THEN 'zh'
              ELSE 'und' END AS predicted_lang
         FROM (SELECT doc_id, s_en, s_de, s_fr, s_es, s_zh,
                 greatest(s_en, s_de, s_fr, s_es, s_zh) AS best
               FROM (SELECT doc_id,
                 CAST(len(list_filter(toks, w -> w IN ('the','and','of','to','is'))) AS BIGINT) AS s_en,
                 CAST(len(list_filter(toks, w -> w IN ('der','die','das','und','ist'))) AS BIGINT) AS s_de,
                 CAST(len(list_filter(toks, w -> w IN ('le','la','et','les','est'))) AS BIGINT) AS s_fr,
                 CAST(len(list_filter(toks, w -> w IN ('el','la','y','los','es'))) AS BIGINT) AS s_es,
                 CAST(len(list_filter(toks, w -> w IN ('的','是','了','在','我'))) AS BIGINT) AS s_zh
                 FROM (SELECT doc_id,
                         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                              ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
                       FROM documents) a) b) c""",
    "q64_fused_text_stats" ->
      """SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(toks, w -> w IN
           ('the','a','an','and','or','of','to','in','is','it')))
           AS BIGINT) AS n_stop,
         CAST(length(text) - length(translate(text, '.,!?;:', ''))
           AS BIGINT) AS n_punct,
         CAST(length(text) AS BIGINT) AS n_chars,
         round(0.5 * least(len(toks) / 200.0, 1.0)
             + 0.4 * least(CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE len(list_filter(toks, w -> w IN
                   ('the','a','an','and','or','of','to','in','is','it')
                   ))::DOUBLE / len(toks) END * 5.0, 1.0)
             + 0.1 * (1.0 - least(CASE WHEN length(text) = 0 THEN 0.0
                 ELSE (length(text) - length(translate(text, '.,!?;:', '')))::DOUBLE
                      / length(text) END * 10.0, 1.0)), 6) AS quality
         FROM (SELECT doc_id, text,
                 CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
               FROM documents) t""",
    "q63_set_ops" ->
      """WITH y95 AS (SELECT o_custkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
             AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
         y96 AS (SELECT o_custkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
         SELECT 'both_years' AS bucket, o_custkey
         FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96) a
         UNION ALL
         SELECT 'only_1995' AS bucket, o_custkey
         FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96) b""",
    "q61_full_outer" ->
      """SELECT COALESCE(c_mktsegment, 'NO_CUSTOMER') AS segment,
         count(o_custkey) AS n_orders,
         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_customers_without_orders,
         round(sum(COALESCE(o_totalprice, 0.0)), 2) AS sum_price
         FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
         GROUP BY 1""",
    "q62_pivot_api" ->
      """SELECT o_orderpriority,
         round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2)
           AS price_f,
         round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2)
           AS price_o,
         round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2)
           AS price_p
         FROM orders GROUP BY o_orderpriority""",
    "q59_redact_pii" ->
      """SELECT doc_id,
         regexp_replace(
           regexp_replace(text,
             '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}',
             '<EMAIL>', 'g'),
           '\b\d{3}[- .]\d{3}[- .]\d{4}\b', '<PHONE>', 'g') AS redacted,
         CAST(len(regexp_extract_all(text,
           '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT)
           AS n_emails,
         CAST(len(regexp_extract_all(text,
           '\b\d{3}[- .]\d{3}[- .]\d{4}\b')) AS BIGINT) AS n_phones
         FROM documents""",
    "q60_repetition" ->
      s"""WITH t AS (
           SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
           FROM documents),
         b AS (
           SELECT doc_id, toks,
             list_transform(range(len(toks) - 1),
               i -> toks[i+1] || ' ' || toks[i+2]) AS bg
           FROM t),
         fr AS (
           SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CASE WHEN len(toks) = 0 THEN 0::BIGINT
               ELSE ${sqlMicroRatio(
          "len(toks) - len(list_distinct(toks))", "len(toks)")}
               END AS dup_token_ppm,
             CASE WHEN len(bg) = 0 THEN 0::BIGINT
               ELSE ${sqlMicroRatio(
          "len(bg) - len(list_distinct(bg))", "len(bg)")}
               END AS dup_bigram_ppm
           FROM b)
         SELECT fr.*,
           dup_token_ppm <= 700000 AND dup_bigram_ppm <= 500000 AS keep
         FROM fr""",
    "q58_kmv_distinct" ->
      """WITH h AS (
           SELECT DISTINCT l_returnflag,
             ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT
               AS h
           FROM lineitem),
         r AS (
           SELECT l_returnflag, h,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rk,
             count(*) OVER (PARTITION BY l_returnflag) AS nd
           FROM h)
         SELECT l_returnflag,
           CASE WHEN any_value(nd) < 256 THEN any_value(nd)::DOUBLE
                ELSE 255::DOUBLE * 1152921504606846976::DOUBLE
                     / max(CASE WHEN rk = 256 THEN h END)::DOUBLE END
             AS kmv_estimate,
           CAST(any_value(nd) AS BIGINT) AS n_exact
         FROM r GROUP BY l_returnflag""",
    "q57_resize_dims" ->
      s"""$decodeCtes
         SELECT doc_id, width, height,
           CAST((width * 256) // greatest(width, height) AS INTEGER)
             AS out_w,
           CAST((height * 256) // greatest(width, height) AS INTEGER)
             AS out_h
         FROM dims""",
    "q56_jira_stats_sql" ->
      ("""WITH raw AS (
           SELECT *, regexp_extract(filename, 'raw_issues_(\w+)\.jsonl', 1)
             AS project
           FROM read_json(
             ['/root/repo/src/test/resources/jira/raw_issues_TEST.jsonl',
              '/root/repo/src/test/resources/jira/raw_issues_TEST2.jsonl'],
             format='newline_delimited', filename=true, columns={
               'key': 'VARCHAR', 'id': 'VARCHAR',
               'fields': 'STRUCT(summary VARCHAR, description VARCHAR,
                  status STRUCT(name VARCHAR),
                  priority STRUCT(name VARCHAR),
                  issuetype STRUCT(name VARCHAR),
                  reporter STRUCT(displayName VARCHAR, name VARCHAR),
                  assignee STRUCT(displayName VARCHAR, name VARCHAR),
                  created VARCHAR, updated VARCHAR,
                  resolutiondate VARCHAR,
                  labels VARCHAR[], components STRUCT(name VARCHAR)[],
                  versions STRUCT(name VARCHAR)[],
                  fixVersions STRUCT(name VARCHAR)[],
                  comment STRUCT(comments STRUCT(
                    author STRUCT(displayName VARCHAR, name VARCHAR),
                    created VARCHAR, body VARCHAR)[]))'})),
         """ + jiraProbeCte(Seq(
             "/root/repo/src/test/resources/jira/raw_issues_TEST.jsonl",
             "/root/repo/src/test/resources/jira/raw_issues_TEST2.jsonl")) +
      """,
         fl AS (
           SELECT project,
             trim(regexp_replace(COALESCE(fields.summary, ''), '\s+', ' ', 'g')) AS title,
             trim(regexp_replace(COALESCE(fields.description, ''), '\s+', ' ', 'g')) AS d,
             COALESCE(fields.status.name, 'Unknown') AS status,
             COALESCE(fields.priority.name, 'Unknown') AS priority,
             CASE WHEN fields.assignee IS NULL THEN 'Unknown'
                  ELSE COALESCE(fields.assignee.displayName,
                         fields.assignee.name, 'Unknown') END AS assignee,
             COALESCE(list_filter(
               list_transform(fields.comment.comments,
                 x -> trim(regexp_replace(COALESCE(x.body, ''), '\s+', ' ', 'g'))),
               b -> length(b) > 0), []::VARCHAR[]) AS cb
           FROM raw
           WHERE """ + jiraKeepSql + """),
         t AS (
           SELECT project, unnest(list_filter([
               CASE WHEN d <> '' OR len(cb) > 0 THEN 'summarization' END,
               CASE WHEN title <> '' AND priority <> '' THEN 'classification' END,
               CASE WHEN title <> '' AND status <> '' THEN 'status_prediction' END,
               'question_answering', 'question_answering',
               CASE WHEN assignee <> '' AND assignee <> 'Unknown'
                    THEN 'question_answering' END,
               CASE WHEN len(cb) > 0 AND status IN ('Resolved', 'Closed')
                    THEN 'issue_resolution' END
             ], x -> x IS NOT NULL)) AS task_type
           FROM fl)
         SELECT project, task_type, count(*) AS n FROM t GROUP BY 1, 2"""),
    // qj01: full flatten replay over BOTH fixture projects (q54's
    // pattern + project/rank from the filename + array columns as
    // ','-joined strings).
    "qj01_jira_flatten" -> {
      def clean(e: String): String =
        s"trim(regexp_replace(COALESCE($e, ''), '\\s+', ' ', 'g'))"
      val desc = clean("fields.description")
      s"""WITH raw AS (
           SELECT *, regexp_extract(filename, 'raw_issues_(\\w+)\\.jsonl', 1)
             AS project
           FROM read_json(
             ['/root/repo/src/test/resources/jira/raw_issues_TEST.jsonl',
              '/root/repo/src/test/resources/jira/raw_issues_TEST2.jsonl'],
             format='newline_delimited', filename=true, columns={
               'key': 'VARCHAR', 'id': 'VARCHAR',
               'fields': 'STRUCT(
                  summary VARCHAR, description VARCHAR,
                  status STRUCT(name VARCHAR),
                  priority STRUCT(name VARCHAR),
                  issuetype STRUCT(name VARCHAR),
                  reporter STRUCT(displayName VARCHAR, name VARCHAR),
                  assignee STRUCT(displayName VARCHAR, name VARCHAR),
                  created VARCHAR, updated VARCHAR,
                  resolutiondate VARCHAR,
                  labels VARCHAR[],
                  components STRUCT(name VARCHAR)[],
                  versions STRUCT(name VARCHAR)[],
                  fixVersions STRUCT(name VARCHAR)[],
                  comment STRUCT(comments STRUCT(
                    author STRUCT(displayName VARCHAR, name VARCHAR),
                    created VARCHAR, body VARCHAR)[])
               )'})),
         ${jiraProbeCte(Seq(
             "/root/repo/src/test/resources/jira/raw_issues_TEST.jsonl",
             "/root/repo/src/test/resources/jira/raw_issues_TEST2.jsonl"))},
         f AS (
           SELECT * FROM raw
           WHERE $jiraKeepSql),
         c AS (
           SELECT *,
             list_filter(
               list_transform(fields.comment.comments,
                 x -> ${clean("x.body")}),
               b -> length(b) > 0) AS clean_bodies
           FROM f)
         SELECT
           COALESCE(key, '') AS issue_key,
           COALESCE(id, '') AS issue_id,
           project,
           CAST(CASE project WHEN 'TEST' THEN 0 ELSE 1 END AS INTEGER)
             AS project_rank,
           'https://issues.apache.org/jira/browse/' || COALESCE(key, '')
             AS url,
           ${clean("fields.summary")} AS title,
           CASE WHEN length($desc) > 20000
                THEN substr($desc, 1, 20000) || '...'
                ELSE $desc END AS description,
           COALESCE(fields.status.name, 'Unknown') AS status,
           COALESCE(fields.priority.name, 'Unknown') AS priority,
           COALESCE(fields.issuetype.name, 'Unknown') AS issue_type,
           CASE WHEN fields.reporter IS NULL THEN 'Unknown'
                ELSE COALESCE(fields.reporter.displayName,
                       fields.reporter.name, 'Unknown') END AS reporter,
           CASE WHEN fields.assignee IS NULL THEN 'Unknown'
                ELSE COALESCE(fields.assignee.displayName,
                       fields.assignee.name, 'Unknown') END AS assignee,
           COALESCE(fields.created, '') AS created,
           COALESCE(fields.updated, '') AS updated,
           COALESCE(fields.resolutiondate, '') AS resolved,
           COALESCE(array_to_string(fields.labels, ','), '') AS labels_csv,
           COALESCE(array_to_string(list_transform(fields.components,
             x -> COALESCE(x.name, '')), ','), '') AS components_csv,
           COALESCE(array_to_string(list_transform(fields.versions,
             x -> COALESCE(x.name, '')), ','), '') AS versions_csv,
           COALESCE(array_to_string(list_transform(fields.fixVersions,
             x -> COALESCE(x.name, '')), ','), '') AS fix_versions_csv,
           CAST(COALESCE(len(clean_bodies), 0) AS INTEGER)
             AS comment_count
         FROM c"""
    },
    // qj02: the oracle reads the REFERENCE'S OWN EXECUTED OUTPUT
    // (golden_examples_*.jsonl, produced by tools/make_jira_fixtures
    // .py running /root/reference) — the driver gate compares the
    // engine corpus to actual reference behavior, not to a SQL
    // re-derivation.
    "qj02_jira_examples" ->
      """SELECT
         CAST(CASE WHEN filename LIKE '%TEST2%' THEN 1 ELSE 0 END
           AS INTEGER) AS project_rank,
         metadata.project AS project,
         metadata.issue_key AS issue_key,
         metadata.created AS created,
         task_type, instruction, "input", "output"
         FROM read_json(
           ['/root/repo/src/test/resources/jira/golden_examples_TEST.jsonl',
            '/root/repo/src/test/resources/jira/golden_examples_TEST2.jsonl'],
           format='newline_delimited', filename=true, columns={
             'task_type': 'VARCHAR', 'instruction': 'VARCHAR',
             'input': 'VARCHAR', 'output': 'VARCHAR',
             'metadata': 'STRUCT(issue_key VARCHAR, project VARCHAR,
               created VARCHAR)'})""",
    // qj03: per-project stats replay over both projects — q56's
    // fanout CTEs aggregated to the reference's stats record shape
    // (maps/sets as sorted csv scalars).
    "qj03_jira_stats" ->
      ("""WITH raw AS (
           SELECT *, regexp_extract(filename, 'raw_issues_(\w+)\.jsonl', 1)
             AS project
           FROM read_json(
             ['/root/repo/src/test/resources/jira/raw_issues_TEST.jsonl',
              '/root/repo/src/test/resources/jira/raw_issues_TEST2.jsonl'],
             format='newline_delimited', filename=true, columns={
               'key': 'VARCHAR', 'id': 'VARCHAR',
               'fields': 'STRUCT(summary VARCHAR, description VARCHAR,
                  status STRUCT(name VARCHAR),
                  priority STRUCT(name VARCHAR),
                  issuetype STRUCT(name VARCHAR),
                  reporter STRUCT(displayName VARCHAR, name VARCHAR),
                  assignee STRUCT(displayName VARCHAR, name VARCHAR),
                  created VARCHAR, updated VARCHAR,
                  resolutiondate VARCHAR,
                  labels VARCHAR[], components STRUCT(name VARCHAR)[],
                  versions STRUCT(name VARCHAR)[],
                  fixVersions STRUCT(name VARCHAR)[],
                  comment STRUCT(comments STRUCT(
                    author STRUCT(displayName VARCHAR, name VARCHAR),
                    created VARCHAR, body VARCHAR)[]))'})),
         """ + jiraProbeCte(Seq(
             "/root/repo/src/test/resources/jira/raw_issues_TEST.jsonl",
             "/root/repo/src/test/resources/jira/raw_issues_TEST2.jsonl")) +
      """,
         fl AS (
           SELECT project,
             trim(regexp_replace(COALESCE(fields.summary, ''), '\s+', ' ', 'g')) AS title,
             trim(regexp_replace(COALESCE(fields.description, ''), '\s+', ' ', 'g')) AS d,
             COALESCE(fields.status.name, 'Unknown') AS status,
             COALESCE(fields.priority.name, 'Unknown') AS priority,
             COALESCE(fields.issuetype.name, 'Unknown') AS issue_type,
             CASE WHEN fields.assignee IS NULL THEN 'Unknown'
                  ELSE COALESCE(fields.assignee.displayName,
                         fields.assignee.name, 'Unknown') END AS assignee,
             COALESCE(list_filter(
               list_transform(fields.comment.comments,
                 x -> trim(regexp_replace(COALESCE(x.body, ''), '\s+', ' ', 'g'))),
               b -> length(b) > 0), []::VARCHAR[]) AS cb
           FROM raw
           WHERE """ + jiraKeepSql + """),
         t AS (
           SELECT project, unnest(list_filter([
               CASE WHEN d <> '' OR len(cb) > 0 THEN 'summarization' END,
               CASE WHEN title <> '' AND priority <> '' THEN 'classification' END,
               CASE WHEN title <> '' AND status <> '' THEN 'status_prediction' END,
               'question_answering', 'question_answering',
               CASE WHEN assignee <> '' AND assignee <> 'Unknown'
                    THEN 'question_answering' END,
               CASE WHEN len(cb) > 0 AND status IN ('Resolved', 'Closed')
                    THEN 'issue_resolution' END
             ], x -> x IS NOT NULL)) AS task_type
           FROM fl),
         tt AS (SELECT project, task_type, count(*) AS n
                FROM t GROUP BY 1, 2),
         dist AS (SELECT project, CAST(sum(n) AS BIGINT) AS total_examples,
                    string_agg(task_type || ':' || n, ','
                      ORDER BY task_type) AS task_type_distribution_csv
                  FROM tt GROUP BY 1),
         sets AS (SELECT project, project AS projects_csv,
                    array_to_string(list_sort(list(DISTINCT issue_type)), ',')
                      AS issue_types_csv,
                    array_to_string(list_sort(list(DISTINCT priority)), ',')
                      AS priorities_csv,
                    array_to_string(list_sort(list(DISTINCT status)), ',')
                      AS statuses_csv
                  FROM fl GROUP BY 1)
         SELECT dist.project, total_examples, task_type_distribution_csv,
           projects_csv, issue_types_csv, priorities_csv, statuses_csv
         FROM dist JOIN sets USING (project)"""),
    "q125_bpe_train" -> (bpeCtes(8) + "\n" +
      (1 to 8).map(r =>
        s"""SELECT CAST($r AS INTEGER) AS merge_rank, lft AS "left",
            rgt AS "right", cnt AS pair_count FROM b$r""")
        .mkString("\nUNION ALL\n")),
    "q126_bpe_segment" -> (bpeCtes(8) + """
       SELECT w, freq,
         array_to_string(string_split(syms, chr(31)), ',') AS pieces_csv,
         CAST(len(string_split(syms, chr(31))) AS INTEGER) AS n_pieces
       FROM s8"""),
    // q127: same LM count tables and interpolation weights as the
    // engine; every component is positive (scored corpus = training
    // corpus) so the ln never sees zero.
    "q127_trigram_ppl" -> trigramPplOracleSql,
    // q130: the composed corpus-assembly manifest — q78's canonical
    // survivors ∩ q127's perplexity-kept docs, sharded by the q75
    // doc_id hash; both chains reused verbatim.
    "q130_training_manifest" ->
      s"""WITH RECURSIVE $canonicalChainCtes,
         $trigramLmCtes,
         keepd AS (SELECT doc_id, round(exp(x), 6) AS ppl
                   FROM sc CROSS JOIN m WHERE exp(x) <= mean_ppl),
         man AS (SELECT s.doc_id, k.ppl,
                   ('0x' || substr(md5(s.doc_id::VARCHAR), 1, 15))::BIGINT
                     AS h
                 FROM (SELECT doc_id FROM surv WHERE rn = 1) s
                 JOIN keepd k USING (doc_id))
         SELECT doc_id, CAST(h % 8 AS INTEGER) AS shard,
           CAST(row_number() OVER (PARTITION BY h % 8
             ORDER BY h ASC, doc_id ASC) AS INTEGER) AS position,
           ppl
         FROM man""",
    // q129: identical sparse-NB identity — unseen (token, lang)
    // pairs contribute ln(1) = 0, so only the observed count table
    // joins in; argmax/margin replayed through the same (score desc,
    // lang asc) window.
    "q129_nb_langid" -> nbLangIdOracleSql,
    // q131: identical hashed-feature multinomials; hash60 replayed
    // as the md5 15-hex-char prefix (the q75 shard construction).
    "q131_dsir_weights" ->
      """WITH t AS (SELECT doc_id, lang,
                  CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                       ELSE regexp_split_to_array(trim(text), '\s+')
                  END AS toks FROM documents),
         g AS (SELECT doc_id, lang, unnest(toks) AS g FROM t
               UNION ALL
               SELECT doc_id, lang,
                 unnest(list_transform(range(len(toks) - 1),
                   i -> toks[i+1] || ' ' || toks[i+2])) AS g
               FROM t WHERE len(toks) >= 2),
         f AS MATERIALIZED (
           SELECT doc_id, lang,
             ('0x' || substr(md5(g), 1, 15))::BIGINT % 1024 AS b
           FROM g),
         db AS (SELECT doc_id, b, count(*) AS c FROM f GROUP BY 1, 2),
         sc AS (SELECT b, count(*) AS cs FROM f GROUP BY 1),
         tc AS (SELECT b, count(*) AS ct FROM f WHERE lang = 'en'
                GROUP BY 1),
         tot AS (SELECT count(*)::DOUBLE AS ns,
                   sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE
                     AS nt
                 FROM f),
         r AS (SELECT sc.b,
                 ln((coalesce(tc.ct, 0) + 1) / (tot.nt + 1024))
                   - ln((sc.cs + 1) / (tot.ns + 1024)) AS lr
               FROM sc LEFT JOIN tc USING (b) CROSS JOIN tot),
         w AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ngrams,
                 sum(c * lr) AS lw
               FROM db JOIN r USING (b) GROUP BY 1)
         SELECT doc_id, n_ngrams, round(lw, 6) AS logw,
           round(lw / n_ngrams, 6) AS logw_per_ngram,
           CAST(lw > 0 AS INTEGER) AS keep
         FROM w""",
    // q132: same p^alpha weights, same ppm integerization, same md5
    // hash gate — the integer threshold keeps boundary rows exact
    // across engines.
    "q132_temperature_mix" ->
      """WITH pl AS (SELECT lang, count(*) AS n_docs
                     FROM documents GROUP BY 1),
         tot AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS tot FROM pl),
         qr AS (SELECT lang, n_docs, tot,
                  pow(n_docs / tot, 0.3) AS qr
                FROM pl CROSS JOIN tot),
         qs AS (SELECT sum(qr) AS qs FROM qr),
         r AS (SELECT lang, n_docs,
                 round(n_docs / tot, 6) AS p,
                 round(qr / qs, 6) AS q,
                 CAST(floor(least(1.0,
                   0.5 * tot * (qr / qs) / n_docs) * 1e6) AS BIGINT)
                   AS rate_ppm
               FROM qr CROSS JOIN qs)
         SELECT r.lang, r.n_docs, r.p, r.q, r.rate_ppm,
           CAST(sum(CASE WHEN
             ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT
               % 1000000 < r.rate_ppm
             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         FROM documents d JOIN r USING (lang)
         GROUP BY 1, 2, 3, 4, 5""",
    // q133: same Lucene-variant idf, same k1/b, rank over the
    // ROUNDED score with the doc_id tiebreak so rank membership is
    // engine-exact.
    "q133_bm25_topk" ->
      """WITH toks AS (
           SELECT doc_id, unnest(CASE WHEN length(trim(text)) = 0
               THEN []::VARCHAR[]
               ELSE regexp_split_to_array(trim(text), '\s+') END) AS term
           FROM documents),
         tf AS MATERIALIZED (
           SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                  avg(dl) AS avg_dl FROM dl),
         dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         q AS (SELECT DISTINCT doc_id AS q_id, term FROM toks
               WHERE doc_id % 250 = 0),
         sc AS (SELECT q.q_id, tf.doc_id,
                  sum(ln((st.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1)
                    * tf.tf * 2.2
                    / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avg_dl)))
                    AS s
                FROM q JOIN tf ON q.term = tf.term
                  AND tf.doc_id <> q.q_id
                JOIN dft ON dft.term = q.term
                JOIN dl ON dl.doc_id = tf.doc_id
                CROSS JOIN st
                GROUP BY 1, 2),
         rk AS (SELECT q_id, doc_id, round(s, 6) AS score,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY round(s, 6) DESC, doc_id ASC) AS rank
                FROM sc)
         SELECT q_id, doc_id, CAST(rank AS INTEGER) AS rank, score
         FROM rk WHERE rank <= 10""",
    // q134: the q125/q126 merge replay's final segmentation (s8)
    // joined back to the corpus word stream — per-doc word/subword/
    // compression stats under the trained tokenizer.
    "q134_bpe_corpus_apply" -> (bpeCtes(8) + """,
       vocab AS (SELECT w,
           len(string_split(syms, chr(31))) AS n_pieces
         FROM s8),
       cw AS (SELECT doc_id, unnest(CASE WHEN length(trim(text)) = 0
             THEN []::VARCHAR[]
             ELSE regexp_split_to_array(trim(text), '\s+') END) AS w
           FROM documents)
       SELECT cw.doc_id,
         count(*)::BIGINT AS n_words,
         CAST(sum(vocab.n_pieces) AS BIGINT) AS n_subwords,
         (((2*(sum(length(cw.w)) * 1000) + (sum(vocab.n_pieces)))
           // (2*(sum(vocab.n_pieces))))::BIGINT)
           AS chars_per_subword_milli
       FROM cw JOIN vocab USING (w)
       GROUP BY 1"""),
    // q128: the four per-subspace codebooks replayed exactly like
    // q93 (same init, same one Lloyd round, same (dist, cluster)
    // tie-break, same rounded-mean update), then encode → LUT join →
    // left-to-right 4-term ADC sum. Heavy CTEs are MATERIALIZED —
    // DuckDB would otherwise re-inline each subspace chain per use.
    "q128_pq_adc" -> {
      val m = 4; val subDim = 16; val k = 16
      val nQ = 5; val topK = 10
      def assignCte(name: String, sub: String, cents: String): String =
        s"""$name AS MATERIALIZED (SELECT vec_id, cluster, dist,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY dist, cluster) AS rn
           FROM (SELECT t.vec_id, c.cluster,
                   list_sum(list_transform(list_zip(t.emb, c.c_vec),
                     p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
                 FROM $sub t CROSS JOIN $cents c) x)"""
      def updateCte(name: String, sub: String, assigned: String): String =
        s"""$name AS MATERIALIZED (
             SELECT cluster, list(v ORDER BY dim) AS c_vec FROM (
             SELECT a.cluster, s.dim AS dim, round(avg(s.x), 6) AS v
             FROM (SELECT vec_id,
                     unnest(list_transform(range(len(emb)),
                       i -> {'dim': i, 'x': emb[i+1]})) AS s FROM $sub) cells
             JOIN (SELECT vec_id, cluster FROM $assigned WHERE rn = 1) a
               USING (vec_id)
             GROUP BY 1, 2) mm GROUP BY cluster)"""
      val subCtes = (0 until m).map { b =>
        s"""s$b AS MATERIALIZED (SELECT vec_id,
              list_slice(emb, ${b * subDim + 1}, ${(b + 1) * subDim})
                AS emb FROM e),
           i$b AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
                     AS INTEGER) AS cluster, emb AS c_vec
                   FROM (SELECT vec_id, emb FROM s$b
                         ORDER BY vec_id LIMIT $k) x),
           ${assignCte(s"a$b", s"s$b", s"i$b")},
           ${updateCte(s"u$b", s"s$b", s"a$b")},
           ${assignCte(s"f$b", s"s$b", s"u$b")},
           l$b AS (SELECT q.vec_id AS query_id, c.cluster AS c$b,
                     list_sum(list_transform(list_zip(q.emb, c.c_vec),
                       p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d$b
                   FROM s$b q CROSS JOIN u$b c
                   WHERE q.vec_id < $nQ)"""
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (SELECT vec_id,
             list_transform(embedding, x -> x::DOUBLE) AS emb
           FROM embeddings),
         $subCtes,
         codes AS MATERIALIZED (
           SELECT f0.vec_id, f0.cluster AS c0, f1.cluster AS c1,
             f2.cluster AS c2, f3.cluster AS c3
           FROM (SELECT vec_id, cluster FROM f0 WHERE rn = 1) f0
           JOIN (SELECT vec_id, cluster FROM f1 WHERE rn = 1) f1
             USING (vec_id)
           JOIN (SELECT vec_id, cluster FROM f2 WHERE rn = 1) f2
             USING (vec_id)
           JOIN (SELECT vec_id, cluster FROM f3 WHERE rn = 1) f3
             USING (vec_id)),
         adc AS (SELECT l0.query_id, v.vec_id,
             round(l0.d0 + l1.d1 + l2.d2 + l3.d3, 6) AS adc
           FROM codes v
           JOIN l0 ON v.c0 = l0.c0
           JOIN l1 ON l1.query_id = l0.query_id AND v.c1 = l1.c1
           JOIN l2 ON l2.query_id = l0.query_id AND v.c2 = l2.c2
           JOIN l3 ON l3.query_id = l0.query_id AND v.c3 = l3.c3),
         ex AS (SELECT q.vec_id AS query_id, v.vec_id,
             round(list_sum(list_transform(list_zip(v.emb, q.emb),
               p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) AS exact_dist
           FROM e v CROSS JOIN e q WHERE q.vec_id < $nQ)
         SELECT query_id, vec_id, CAST(rank AS INTEGER) AS rank,
           adc, exact_dist
         FROM (SELECT a.query_id, a.vec_id, a.adc, ex.exact_dist,
                 row_number() OVER (PARTITION BY a.query_id
                   ORDER BY a.adc, a.vec_id) AS rank
               FROM adc a JOIN ex USING (query_id, vec_id)) r
         WHERE rank <= $topK"""
    },
    "q31_multimodal_meta" ->
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         sha256(text) AS content_id,
         CAST(('0x' || substr(sha256(text), 1, 4))::BIGINT % 1920
           AS INTEGER) AS fake_width,
         CAST(('0x' || substr(sha256(text), 5, 4))::BIGINT % 1080
           AS INTEGER) AS fake_height
         FROM documents""",
    // q77: the streaming result equals the batch join+aggregate.
    "q77_stream_static_join" ->
      """SELECT c_mktsegment, event_type, count(*) AS n_events,
         round(sum(value), 2) AS sum_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY 1, 2""",
    // q78: q72's transitive closure + q15's quality formula; the
    // survivor is the per-cluster (quality desc, doc_id asc) argmax.
    "q78_canonical_docs" ->
      s"""WITH RECURSIVE $canonicalChainCtes
         SELECT cluster_id, cluster_size, doc_id AS keep_doc,
           q_micro AS keep_q_micro
         FROM surv WHERE rn = 1""",
    // q79: identical RANGE frame on epoch micros.
    "q79_rolling_hour" ->
      """SELECT event_id, user_id,
         count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_1h,
         round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 2) AS sum_1h
         FROM events""",
    // q80: quantile_cont = PERCENTILE_CONT = Spark's percentile.
    "q80_lang_percentiles" ->
      """SELECT lang, count(*) AS n_docs,
         round(quantile_cont(n, 0.25), 6) AS p25,
         round(quantile_cont(n, 0.5), 6) AS p50,
         round(quantile_cont(n, 0.75), 6) AS p75,
         max(n) AS max_tokens
         FROM (SELECT lang,
                 CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                   AS BIGINT) AS n
               FROM documents) d
         GROUP BY lang""",
    // q81: bucket arithmetic on the 6-rounded quality score.
    "q81_quality_histogram" ->
      s"""WITH qq AS (SELECT
                  round(0.5 * least(n_toks / 200.0, 1.0)
                      + 0.4 * least(stop_raw * 5.0, 1.0)
                      + 0.1 * (1.0 - least(punct_frac * 10.0, 1.0)), 6) AS q
                FROM (SELECT
                        CASE WHEN len(toks) = 0 THEN 0.0
                             ELSE len(list_filter(toks, w -> w IN
                               ('the','a','an','and','or','of','to','in','is','it')
                               ))::DOUBLE / len(toks) END AS stop_raw,
                        len(toks)::DOUBLE AS n_toks,
                        CASE WHEN length(text) = 0 THEN 0.0
                             ELSE (length(text)
                                   - length(translate(text, '.,!?;:', '')))::DOUBLE
                                  / length(text) END AS punct_frac
                      FROM (SELECT doc_id, text,
                              CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                                   ELSE regexp_split_to_array(trim(text), '\\s+')
                              END AS toks
                            FROM documents) a) b)
         SELECT bucket, count(*)::BIGINT AS n_docs,
           (bucket * 5)::BIGINT AS bucket_lo_centi,
           ((bucket + 1) * 5)::BIGINT AS bucket_hi_centi
         FROM (SELECT least(greatest(CAST(floor(q * 20) AS INTEGER), 0), 19)
                 AS bucket FROM qq) x
         GROUP BY bucket""",
    // q82: postings serialized sorted-joined on both sides.
    "q82_posting_lists" ->
      """SELECT token, count(*) AS df,
         array_to_string(list_sort(list(doc_id)), ',') AS postings
         FROM (SELECT DISTINCT doc_id, token
               FROM (SELECT doc_id, unnest(toks) AS token
                     FROM (SELECT doc_id,
                             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                                  ELSE regexp_split_to_array(trim(text), '\s+')
                             END AS toks
                           FROM documents) t) x) u
         GROUP BY token
         HAVING count(*) BETWEEN 3
           AND floor(0.8 * (SELECT count(*) FROM documents))""",
    // q84: bigram counts from the shifted-array zip; probability as
    // an explicit double division (DuckDB integer '/' semantics
    // differ across versions).
    "q84_bigram_lm" ->
      s"""WITH t AS (SELECT CASE WHEN length(trim(text)) = 0
                  THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+')
             END AS toks FROM documents),
         b AS (SELECT unnest(list_transform(range(len(toks) - 1),
                 i -> {'w1': toks[i+1], 'w2': toks[i+2]})) AS s
               FROM t WHERE len(toks) >= 2),
         c AS (SELECT s.w1 AS w1, s.w2 AS w2, count(*) AS n
               FROM b GROUP BY 1, 2)
         SELECT w1, w2, n, p_ppm, CAST(rank AS INTEGER) AS rank FROM (
           SELECT w1, w2, n,
             ${sqlMicroRatio("n", "sum(n) OVER (PARTITION BY w1)")}
               AS p_ppm,
             row_number() OVER (PARTITION BY w1
               ORDER BY n DESC, w2 ASC) AS rank
           FROM c) x
         WHERE rank <= 3""",
    // q85: identical 1-based substr chunking.
    "q85_doc_chunks" ->
      """SELECT doc_id, CAST(i + 1 AS INTEGER) AS chunk_idx,
         substr(text, CAST(i * 200 + 1 AS INTEGER), 200) AS chunk
         FROM (SELECT doc_id, text,
                 unnest(range((length(text) - 1) // 200 + 1)) AS i
               FROM documents WHERE length(text) > 0) t""",
    // q86: the identical power iteration as chained CTEs (standard
    // SQL forbids aggregation in a recursive member, so the fixed
    // iteration count unrolls — pr1..pr8 each one join+group-by).
    // Teleport is written (1.0 - 0.85)/n, matching the engine's
    // floating-point evaluation order bit-for-bit.
    "q86_pagerank" -> {
      val prCtes = (1 to 8)
        .map(i => s"""pr$i AS (
           SELECT s.b AS node,
             (1.0 - 0.85) / (SELECT n FROM nn)
               + 0.85 * sum(p.r / dg.d) AS r
           FROM sym s
           JOIN pr${i - 1} p ON s.a = p.node
           JOIN deg dg ON s.a = dg.a
           GROUP BY s.b)""")
        .mkString(",\n         ")
      s"""WITH $shinglesCte,
         e0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
                WHERE len(sh) > 0),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*) AS inter,
                  any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
                FROM e0 a JOIN e0 b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         ed AS (SELECT doc_a, doc_b FROM pr
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6) >= 0.05),
         sym AS (SELECT doc_a AS a, doc_b AS b FROM ed
                 UNION ALL SELECT doc_b, doc_a FROM ed),
         deg AS (SELECT a, count(*) AS d FROM sym GROUP BY a),
         nn AS (SELECT count(*) AS n FROM deg),
         pr0 AS (SELECT a AS node, 1.0 / (SELECT n FROM nn) AS r FROM deg),
         $prCtes
         SELECT node AS doc_id, round(r, 6) AS rank FROM pr8"""
    },
    // q87: q29's session derivation with the exclusive end bound;
    // the corpus has no exactly-equal boundary gaps (spec-pinned), so
    // the > / >= edge cannot bite.
    "q87_session_window" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
                FROM events),
         l AS (SELECT e.*, lag(ts) OVER
                 (PARTITION BY user_id ORDER BY ts) AS prev_ts
               FROM e),
         f AS (SELECT l.*, CASE WHEN prev_ts IS NULL
                 OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                 THEN 1 ELSE 0 END AS is_new FROM l),
         s AS (SELECT f.*, CAST(sum(is_new) OVER
                 (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_seq FROM f)
         SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end_excl,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM s GROUP BY user_id, session_seq""",
    // q88: the streaming funnel's terminal state equals the batch
    // funnel — same oracle as q83.
    "q88_stream_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS view_ts FROM events
                    WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, min(e.ts) AS click_ts
               FROM events e JOIN v ON e.user_id = v.user_id
               WHERE e.event_type = 'click' AND e.ts > v.view_ts
               GROUP BY 1),
         p AS (SELECT e.user_id, min(e.ts) AS purchase_ts
               FROM events e JOIN c ON e.user_id = c.user_id
               WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
               GROUP BY 1)
         SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
           CAST(1 + CAST(c.click_ts IS NOT NULL AS INTEGER)
                  + CAST(p.purchase_ts IS NOT NULL AS INTEGER) AS INTEGER)
             AS stage_reached
         FROM v
         LEFT JOIN c ON v.user_id = c.user_id
         LEFT JOIN p ON v.user_id = p.user_id""",
    // q89: identical rounded boundaries + rounded-score comparison.
    "q89_decile_bounds" ->
      s"""WITH $qMicroCte,
         bounds AS (SELECT [quantile_cont(q_micro::DOUBLE, 0.1),
                            quantile_cont(q_micro::DOUBLE, 0.2),
                            quantile_cont(q_micro::DOUBLE, 0.3),
                            quantile_cont(q_micro::DOUBLE, 0.4),
                            quantile_cont(q_micro::DOUBLE, 0.5),
                            quantile_cont(q_micro::DOUBLE, 0.6),
                            quantile_cont(q_micro::DOUBLE, 0.7),
                            quantile_cont(q_micro::DOUBLE, 0.8),
                            quantile_cont(q_micro::DOUBLE, 0.9)] AS bs
                    FROM qm)
         SELECT doc_id, q_micro,
           CAST(1 + len(list_filter((SELECT bs FROM bounds),
             b -> q_micro >= b)) AS INTEGER) AS vbucket
         FROM qm""",
    // q90: latest change wins (date, key total order); P deletes.
    "q90_cdc_apply" ->
      """WITH last AS (
           SELECT o_custkey, op, o_totalprice FROM (
             SELECT o_custkey,
               CASE WHEN o_orderstatus = 'P' THEN 'D' ELSE 'U' END AS op,
               o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             FROM orders) t
           WHERE rn = 1)
         SELECT c_custkey,
           round(CASE WHEN l.op = 'U' THEN l.o_totalprice
                      ELSE c_acctbal END, 2) AS balance,
           CASE WHEN l.op IS NULL THEN 'unchanged'
                ELSE 'updated' END AS status
         FROM customer c
         LEFT JOIN last l ON c.c_custkey = l.o_custkey
         WHERE l.op IS NULL OR l.op <> 'D'""",
    // q91: identical add-one-smoothed LM — per-doc bigram counts,
    // corpus LM + context totals from the same counts, |V| as one
    // cross-joined scalar; ln in nats, mean rounded to 6.
    "q91_bigram_xent" ->
      """WITH t AS (SELECT doc_id,
                  CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                       ELSE regexp_split_to_array(trim(text), '\s+')
                  END AS toks FROM documents),
         db AS (SELECT doc_id, s.w1 AS w1, s.w2 AS w2, count(*) AS c
                FROM (SELECT doc_id,
                        unnest(list_transform(range(len(toks) - 1),
                          i -> {'w1': toks[i+1], 'w2': toks[i+2]})) AS s
                      FROM t WHERE len(toks) >= 2) x
                GROUP BY 1, 2, 3),
         lm AS (SELECT w1, w2, CAST(sum(c) AS BIGINT) AS n
                FROM db GROUP BY 1, 2),
         ctx AS (SELECT w1, CAST(sum(n) AS BIGINT) AS ctx_n
                 FROM lm GROUP BY 1),
         voc AS (SELECT count(DISTINCT w) AS v
                 FROM (SELECT unnest(toks) AS w FROM t) u)
         SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
           round(sum(c * -ln((n + 1)::DOUBLE / (ctx_n + v)::DOUBLE))
             / sum(c), 6) AS xent
         FROM db
         JOIN lm USING (w1, w2)
         JOIN ctx USING (w1)
         CROSS JOIN voc
         GROUP BY doc_id""",
    // q92: identical md5-seeded row hashes; cell sums are commutative
    // so the sketch is partitioning-independent on both engines.
    "q92_cms_topk" ->
      """WITH tok AS (SELECT unnest(toks) AS w FROM
           (SELECT CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                   ELSE regexp_split_to_array(trim(text), '\s+')
                   END AS toks FROM documents) t),
         ex AS (SELECT w, count(*) AS n FROM tok GROUP BY 1),
         cells AS (SELECT rr.r AS r,
                     ('0x' || substr(md5(rr.r || ':' || e.w), 1, 15))::BIGINT
                       % 64 AS b,
                     CAST(sum(e.n) AS BIGINT) AS cell_n
                   FROM ex e CROSS JOIN range(4) rr(r)
                   GROUP BY 1, 2),
         top AS (SELECT w, n FROM ex ORDER BY n DESC, w ASC LIMIT 20)
         SELECT t.w AS term, any_value(t.n) AS exact_n,
           min(c.cell_n) AS cms_n
         FROM top t
         CROSS JOIN range(4) rr(r)
         JOIN cells c ON c.r = rr.r
           AND c.b = ('0x' || substr(md5(rr.r || ':' || t.w), 1, 15))::BIGINT
             % 64
         GROUP BY t.w""",
    // q93: both Lloyd rounds unrolled as CTEs — same deterministic
    // init (k lowest vec_ids), same left-to-right double distance
    // fold, same (dist, cluster) tie-break, same rounded-mean update.
    "q93_kmeans" ->
      s"""WITH $kmeansCtes
         SELECT vec_id, cluster, round(dist, 6) AS dist
         FROM a3 WHERE rn = 1""",
    // q135: q93's converged assignment + within-cluster pairwise
    // cosine against lower-id cluster-mates — same left-to-right
    // double folds, same 0.35 threshold, NULL max_sim → kept.
    "q135_semantic_dedup" -> {
      val pairCos = cosSql("lo.emb", "hi.emb")
      s"""WITH $kmeansCtes,
         asg AS MATERIALIZED (SELECT vec_id, cluster FROM a3
                              WHERE rn = 1),
         m AS MATERIALIZED (SELECT a.vec_id, a.cluster, e.emb
                            FROM asg a JOIN e USING (vec_id)),
         p AS (SELECT hi.vec_id, $pairCos AS sim
               FROM m hi JOIN m lo
                 ON hi.cluster = lo.cluster AND lo.vec_id < hi.vec_id),
         s AS (SELECT vec_id, max(sim) AS ms FROM p GROUP BY 1)
         SELECT m.vec_id, m.cluster, round(s.ms, 6) AS max_sim_lower,
           coalesce(s.ms < 0.35, true) AS kept
         FROM m LEFT JOIN s ON m.vec_id = s.vec_id"""
    },
    // q138: identical per-position hash mask, run-collapse via the
    // same lag/sum window, string_agg ORDER BY pos reassembly (empty
    // target coalesced to '' to match Spark's concat_ws).
    "q138_span_corruption" ->
      """WITH tk AS (SELECT doc_id, toks FROM (
             SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
             FROM documents) t WHERE len(toks) >= 1),
         p AS (SELECT doc_id, CAST(s.i AS INTEGER) AS pos,
                 toks[s.i + 1] AS tok,
                 ('0x' || substr(md5(doc_id::VARCHAR || ':' || s.i),
                   1, 15))::BIGINT % 1000 < 150 AS m
               FROM (SELECT doc_id, toks, unnest(range(len(toks))) AS i
                     FROM tk) s(doc_id, toks, i)),
         r AS (SELECT p.*,
                 m AND NOT coalesce(lag(m) OVER
                   (PARTITION BY doc_id ORDER BY pos), false)
                   AS span_start
               FROM p),
         sp AS (SELECT r.*,
                 CAST(sum(CASE WHEN span_start THEN 1 ELSE 0 END) OVER
                   (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) - 1 AS span_id
               FROM r),
         pc AS (SELECT doc_id, pos, m, span_start,
                 CASE WHEN NOT m THEN tok
                      WHEN span_start THEN
                        '<extra_id_' || span_id || '>'
                 END AS in_piece,
                 CASE WHEN span_start THEN
                        '<extra_id_' || span_id || '>' || ' ' || tok
                      WHEN m THEN tok
                 END AS tgt_piece
               FROM sp)
         SELECT doc_id, count(*) AS n_tokens,
           CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
           CAST(sum(CASE WHEN span_start THEN 1 ELSE 0 END) AS BIGINT)
             AS n_spans,
           coalesce(string_agg(in_piece, ' ' ORDER BY pos), '')
             AS input_text,
           coalesce(string_agg(tgt_piece, ' ' ORDER BY pos), '')
             AS target_text
         FROM pc GROUP BY doc_id""",
    // q139: same anchor slice, different-label filter, cosine rank
    // with the vec_id tiebreak on the unrounded double.
    "q139_hard_negatives" -> {
      val pairCos = cosSql("a.embedding", "e.embedding")
      s"""WITH a AS (SELECT vec_id AS anchor_id, label, embedding
               FROM embeddings WHERE vec_id % 100 = 0),
         s AS (SELECT a.anchor_id, e.vec_id, $pairCos AS sim
               FROM embeddings e JOIN a
                 ON e.vec_id <> a.anchor_id AND e.label <> a.label),
         r AS (SELECT anchor_id, vec_id, sim,
                 row_number() OVER (PARTITION BY anchor_id
                   ORDER BY sim DESC, vec_id ASC) AS rk
               FROM s)
         SELECT anchor_id, vec_id AS neg_id, round(sim, 6) AS sim,
           CAST(rk AS INTEGER) AS rank
         FROM r WHERE rk <= 3"""
    },
    // q137: identical 2-hash Bloom fold (2^20 bits as 32-bit words in
    // BIGINT cells — shifts stay ≤31, signed-safe in both engines)
    // and the same exact-membership audit join.
    "q137_bloom_decontaminate" ->
      """WITH dd AS (
           SELECT doc_id,
             list_distinct(list_transform(range(len(toks) - 4),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                 || ' ' || toks[i+4] || ' ' || toks[i+5])) AS sh
           FROM (SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
                 FROM documents) t
           WHERE len(toks) >= 5),
         ev AS MATERIALIZED (SELECT DISTINCT unnest(sh) AS s FROM dd
                             WHERE doc_id % 50 = 0),
         pos AS (SELECT ('0x' || substr(md5('0:' || s), 1, 15))::BIGINT
                   % 1048576 AS p FROM ev
                 UNION ALL
                 SELECT ('0x' || substr(md5('1:' || s), 1, 15))::BIGINT
                   % 1048576 FROM ev),
         bm AS MATERIALIZED (SELECT p // 32 AS word,
                 bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS bits
               FROM pos GROUP BY 1),
         t2 AS (SELECT doc_id, s,
                  ('0x' || substr(md5('0:' || s), 1, 15))::BIGINT
                    % 1048576 AS p0,
                  ('0x' || substr(md5('1:' || s), 1, 15))::BIGINT
                    % 1048576 AS p1
                FROM (SELECT doc_id, unnest(sh) AS s FROM dd
                      WHERE doc_id % 50 <> 0) tr),
         t3 AS (SELECT t2.doc_id,
                  (coalesce(b0.bits, 0) &
                    (1::BIGINT << CAST(p0 % 32 AS INT))) <> 0
                  AND (coalesce(b1.bits, 0) &
                    (1::BIGINT << CAST(p1 % 32 AS INT))) <> 0 AS bloom_hit,
                  ev.s IS NOT NULL AS is_member
                FROM t2
                LEFT JOIN bm b0 ON b0.word = t2.p0 // 32
                LEFT JOIN bm b1 ON b1.word = t2.p1 // 32
                LEFT JOIN ev ON ev.s = t2.s)
         SELECT doc_id, count(*) AS n_shingles,
           CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bloom_hits,
           CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact_hits
         FROM t3 GROUP BY 1
         HAVING sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) > 0""",
    // q136: identical non-overlapping 10-token segmentation, md5-
    // prefix hash60 segment key, keep-first = min (doc_id, seg_idx).
    "q136_segment_dedup" ->
      s"""WITH d AS (SELECT doc_id,
             regexp_split_to_array(trim(text), '\\s+') AS toks
           FROM documents WHERE length(trim(text)) > 0),
         x AS (SELECT doc_id, toks,
                 unnest(range(CAST(ceil(len(toks) / 10.0) AS INT)))
                   AS seg_idx
               FROM d),
         segs AS (SELECT doc_id, seg_idx,
                 ('0x' || substr(md5(array_to_string(
                    list_slice(toks, seg_idx * 10 + 1, seg_idx * 10 + 10),
                    ' ')), 1, 15))::BIGINT AS seg_key
               FROM x),
         f AS (SELECT doc_id, seg_idx,
                 row_number() OVER (PARTITION BY seg_key
                   ORDER BY doc_id, seg_idx) AS rn
               FROM segs)
         SELECT doc_id, count(*)::BIGINT AS n_segs,
           CAST(count(*) FILTER (rn = 1) AS BIGINT) AS n_kept,
           ${sqlMicroRatio("count(*) FILTER (rn = 1)", "count(*)")}
             AS kept_ppm
         FROM f GROUP BY doc_id""",
    // q140: identical positional 3-gram hash60, w=4 window minima
    // over valid starts, distinct per-doc fingerprints, pair overlap.
    "q140_winnow_fingerprints" ->
      """WITH t AS (SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
           FROM documents),
         g AS (SELECT doc_id, len(toks) - 2 AS ng,
                 unnest(list_transform(range(len(toks) - 2),
                   i -> {'pos': i,
                         'h': ('0x' || substr(md5(toks[i+1] || ' ' ||
                            toks[i+2] || ' ' || toks[i+3]), 1, 15))::BIGINT}))
                   AS s
               FROM t WHERE len(toks) >= 3),
         wm AS (SELECT doc_id, ng, s.pos AS pos,
                  min(s.h) OVER (PARTITION BY doc_id ORDER BY s.pos
                    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh
                FROM g),
         fp AS MATERIALIZED (SELECT DISTINCT doc_id, mh FROM wm
               WHERE pos <= greatest(ng - 4, 0)),
         c AS (SELECT doc_id, count(*) AS n_fp FROM fp GROUP BY 1),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*) AS n_shared
                FROM fp a JOIN fp b
                  ON a.mh = b.mh AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
         SELECT doc_a, doc_b, n_shared,
           (((2*((n_shared) * 1000000) + (ca.n_fp + cb.n_fp - n_shared))
             // (2*(ca.n_fp + cb.n_fp - n_shared)))::BIGINT)
             AS overlap_ppm
         FROM pr
         JOIN c ca ON pr.doc_a = ca.doc_id
         JOIN c cb ON pr.doc_b = cb.doc_id
         WHERE n_shared >= 2""",
    // q141: identical md5-seeded ±1 sign matrix, left-to-right
    // projection fold / 4.0, and squared-distance folds on the pair
    // slice (b-vector first in every zip, matching the Spark side).
    "q141_jl_projection" ->
      """WITH r AS (SELECT list_transform(range(16), j ->
             list_transform(range(64), i ->
               CASE WHEN ('0x' || substr(md5('jl:' || i || ':' || j),
                   1, 15))::BIGINT % 2 = 0
                 THEN 1.0 ELSE -1.0 END)) AS rmat),
         p AS MATERIALIZED (SELECT vec_id, embedding,
                 list_transform(r.rmat, row ->
                   list_sum(list_transform(list_zip(embedding, row),
                     q -> q[1]::DOUBLE * q[2])) / 4.0) AS y
               FROM embeddings, r
               WHERE vec_id % 25 = 0),
         a AS (SELECT * FROM p WHERE vec_id % 100 = 0),
         pr AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                  list_sum(list_transform(
                    list_zip(b.embedding, a.embedding),
                    q -> (q[1]::DOUBLE - q[2]::DOUBLE) *
                         (q[1]::DOUBLE - q[2]::DOUBLE))) AS d2o,
                  list_sum(list_transform(list_zip(b.y, a.y),
                    q -> (q[1] - q[2]) * (q[1] - q[2]))) AS d2p
                FROM p b JOIN a ON a.vec_id < b.vec_id)
         SELECT vec_a, vec_b, round(d2o, 6) AS d2_orig,
           round(d2p, 6) AS d2_proj, round(d2p / d2o, 6) AS distortion
         FROM pr WHERE d2o > 0""",
    // q142: identical tokenization, rule thresholds, and rounding; the
    // keep conjunction reads the ROUNDED fractions on both sides.
    "q142_gopher_rules" -> gopherOracleSql,
    // q143: the same shingle inversion as q21; containment divides by
    // the SOURCE side's set size; thresholds compare unrounded.
    "q143_shingle_containment" ->
      s"""WITH $shinglesCte,
         e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
               WHERE len(sh) > 0),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS inter, any_value(a.n_sh) AS n_src
               FROM e a JOIN e b ON a.s = b.s AND a.doc_id <> b.doc_id
               GROUP BY 1, 2)
         SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
           ${sqlMicroRatio("inter", "n_src")} AS containment_ppm,
           inter::DOUBLE / n_src >= 0.8 AS contained
         FROM p WHERE inter::DOUBLE / n_src >= 0.5""",
    // q144: identical md5(doc_id) rank order and cap; small sources
    // keep everything without ranking in the engine — same result.
    "q144_source_cap" ->
      """WITH c AS (SELECT source, count(*) AS n_src FROM documents
                    GROUP BY 1),
         r AS (SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
               FROM documents)
         SELECT r.doc_id, r.source, CAST(c.n_src AS BIGINT) AS n_src,
           (c.n_src <= 16 OR r.rk <= 16) AS kept
         FROM r JOIN c USING (source)""",
    // q145: centroids rounded to 6 (the q69 contract) before the
    // distance; mean/stddev_pop over UNROUNDED distances; the outlier
    // flag reads the unrounded z on both sides.
    "q145_embedding_outliers" ->
      """WITH cells AS (SELECT vec_id, label,
             unnest(list_transform(range(len(embedding)),
               i -> {'dim': i, 'x': embedding[i+1]})) AS s
           FROM embeddings),
         cent AS MATERIALIZED (SELECT label, s.dim AS dim,
                 round(avg(s.x::DOUBLE), 6) AS cv
               FROM cells GROUP BY 1, 2),
         d AS MATERIALIZED (SELECT c.vec_id, c.label,
                 sqrt(sum((c.s.x::DOUBLE - cent.cv)
                          * (c.s.x::DOUBLE - cent.cv))) AS dist
               FROM cells c
               JOIN cent ON cent.label = c.label AND cent.dim = c.s.dim
               GROUP BY 1, 2),
         st AS (SELECT label, avg(dist) AS mu, stddev_pop(dist) AS sigma
                FROM d GROUP BY 1)
         SELECT d.vec_id, d.label, round(d.dist, 6) AS dist,
           round((d.dist - st.mu) / st.sigma, 6) AS z,
           (d.dist - st.mu) / st.sigma > 2.0 AS outlier
         FROM d JOIN st USING (label)""",
    // q146: the q134 segmentation chain grouped by lang instead of
    // doc; identical join and rounding.
    "q146_lang_fertility" -> (bpeCtes(8) + """,
       vocab AS (SELECT w,
           len(string_split(syms, chr(31))) AS n_pieces
         FROM s8),
       cw AS (SELECT lang, unnest(CASE WHEN length(trim(text)) = 0
             THEN []::VARCHAR[]
             ELSE regexp_split_to_array(trim(text), '\s+') END) AS w
           FROM documents)
       SELECT cw.lang,
         count(*)::BIGINT AS n_words,
         CAST(sum(vocab.n_pieces) AS BIGINT) AS n_subwords,
         (((2*(sum(vocab.n_pieces) * 1000) + (count(*)))
           // (2*(count(*))))::BIGINT) AS fertility_milli,
         (((2*(sum(length(cw.w)) * 1000) + (sum(vocab.n_pieces)))
           // (2*(sum(vocab.n_pieces))))::BIGINT)
           AS chars_per_subword_milli
       FROM cw JOIN vocab USING (w)
       GROUP BY 1"""),
    // q147: same n-gram construction per n; counts are exact ints,
    // only the ratio is rounded.
    "q147_corpus_diversity" ->
      s"""WITH t AS (SELECT
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
           FROM documents),
         g1 AS (SELECT unnest(toks) AS g FROM t),
         g2 AS (SELECT unnest(list_transform(range(len(toks) - 1),
                  i -> toks[i+1] || ' ' || toks[i+2])) AS g
                FROM t WHERE len(toks) >= 2),
         g3 AS (SELECT unnest(list_transform(range(len(toks) - 2),
                  i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
                  AS g
                FROM t WHERE len(toks) >= 3)
         SELECT 1 AS n, count(*)::BIGINT AS n_grams,
           count(DISTINCT g)::BIGINT AS n_distinct,
           ${sqlMicroRatio("count(DISTINCT g)", "count(*)")}
             AS distinct_ppm
         FROM g1
         UNION ALL
         SELECT 2, count(*)::BIGINT, count(DISTINCT g)::BIGINT,
           ${sqlMicroRatio("count(DISTINCT g)", "count(*)")} FROM g2
         UNION ALL
         SELECT 3, count(*)::BIGINT, count(DISTINCT g)::BIGINT,
           ${sqlMicroRatio("count(DISTINCT g)", "count(*)")} FROM g3""",
    // q148: identical top-k vocab, rank order, and the SAME
    // closed-form sum formula (no engine regr_* implementation).
    "q148_zipf_fit" ->
      """WITH t AS (SELECT
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
           FROM documents),
         f AS (SELECT w, count(*) AS freq
               FROM (SELECT unnest(toks) AS w FROM t) u
               GROUP BY w ORDER BY freq DESC, w LIMIT 1000),
         r AS (SELECT freq,
                 row_number() OVER (ORDER BY freq DESC, w) AS rk
               FROM f),
         p AS (SELECT ln(rk::DOUBLE) AS x, ln(freq::DOUBLE) AS y FROM r),
         s AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
               FROM p)
         SELECT CAST(n AS BIGINT) AS n_terms,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
             / n, 6) AS intercept,
           round(pow(n * sxy - sx * sy, 2)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
         FROM s""",
    // q149: the same within-doc adjacent-pair bigrams; continuation
    // and context counts all derive from the one bigram-type table.
    "q149_kn_bigram" ->
      """WITH t AS (SELECT
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
           FROM documents),
         bi AS MATERIALIZED (SELECT s.w1 AS w1, s.w2 AS w2,
                 CAST(count(*) AS BIGINT) AS c
               FROM (SELECT unnest(list_transform(range(len(toks) - 1),
                       i -> {'w1': toks[i+1], 'w2': toks[i+2]})) AS s
                     FROM t WHERE len(toks) >= 2) x
               GROUP BY 1, 2),
         ctx AS (SELECT w1, sum(c) AS c_w1, count(*) AS n1r
                 FROM bi GROUP BY 1),
         cont AS (SELECT w2, count(*) AS n1l FROM bi GROUP BY 1),
         ty AS (SELECT count(*) AS n_types FROM bi)
         SELECT bi.w1, bi.w2, bi.c,
           round(greatest(bi.c - 0.75, 0.0) / ctx.c_w1 +
             0.75 * ctx.n1r / ctx.c_w1 *
             (cont.n1l::DOUBLE / ty.n_types), 6) AS p_kn,
           round(cont.n1l::DOUBLE / ty.n_types, 6) AS p_cont
         FROM bi JOIN ctx USING (w1) JOIN cont USING (w2)
         CROSS JOIN ty""",
    // q150: the same closed-form UniMax — capped set = prefix-AND of
    // the all-integer headroom test in (chars ASC, lang) order; the
    // equal share is floor'd so every column is engine-exact.
    "q150_unimax_mix" ->
      s"""WITH $unimaxCtes
         SELECT lang, n_chars, capped, alloc_chars, epochs FROM al""",
    // q151: both rankers rank ROUNDED scores with the doc_id
    // tiebreak (the q133 convention), and the fused score is a sum
    // of exact IEEE reciprocals of integer ranks — engine-exact.
    "q151_hybrid_rrf" ->
      s"""WITH $hybridRetrievalCtes,
         cosr AS (SELECT q_id, doc_id,
                  CAST(cos_rank AS INTEGER) AS cos_rank
                FROM (SELECT q_id, doc_id,
                        row_number() OVER (PARTITION BY q_id
                          ORDER BY score DESC, doc_id ASC) AS cos_rank
                      FROM coss) t
                WHERE cos_rank <= 20),
         fused AS (SELECT coalesce(bm.q_id, cosr.q_id) AS q_id,
                  coalesce(bm.doc_id, cosr.doc_id) AS doc_id,
                  bm.bm25_rank, cosr.cos_rank,
                  round(coalesce(1.0::DOUBLE / (60 + bm.bm25_rank), 0)
                    + coalesce(1.0::DOUBLE / (60 + cosr.cos_rank), 0),
                    6) AS rrf
                FROM bm FULL JOIN cosr
                  ON bm.q_id = cosr.q_id AND bm.doc_id = cosr.doc_id)
         SELECT q_id, doc_id, CAST(rank AS INTEGER) AS rank, rrf,
           bm25_rank, cos_rank
         FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                 ORDER BY rrf DESC, doc_id ASC) AS rank
               FROM fused) t
         WHERE rank <= 10""",
    // q152: the layout is the operator — the oracle is the plain
    // join+aggregate the bucketed lake answers without a shuffle.
    "q152_bucketed_join" ->
      """SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1""",
    // q153: the layout is the operator — the oracle is the plain
    // date-filtered aggregate the partitioned lake answers while
    // scanning only 7 of 30 daily partitions.
    "q153_partition_prune" ->
      """SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
         FROM events
         WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08'
           AND DATE '2024-01-14'
         GROUP BY 1, 2""",
    // q154: the q15 quality formula (rounded to 6 before ranking),
    // rank-1 windows with the doc_id ASC tiebreak on both ends.
    "q154_preference_pairs" ->
      s"""WITH $qMicroCte,
         q AS (SELECT d.doc_id, d.lang, d.source, q2.q_micro AS q
               FROM documents d JOIN qm q2 USING (doc_id)),
         c AS (SELECT lang, source, doc_id AS chosen_id, q AS cq,
                 row_number() OVER (PARTITION BY lang, source
                   ORDER BY q DESC, doc_id ASC) AS rk
               FROM q),
         r AS (SELECT lang, source, doc_id AS rejected_id, q AS rq,
                 row_number() OVER (PARTITION BY lang, source
                   ORDER BY q ASC, doc_id ASC) AS rk
               FROM q)
         SELECT c.lang, c.source, chosen_id, rejected_id,
           cq - rq AS margin_micro
         FROM c JOIN r ON c.lang = r.lang AND c.source = r.source
         WHERE c.rk = 1 AND r.rk = 1 AND chosen_id <> rejected_id""",
    // q155: identical md5-prefix split buckets, distinct 8-gram
    // shingles, train-membership left join, per-test-doc rollup.
    "q155_ngram_novelty" ->
      """WITH g AS (SELECT doc_id,
             CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
               % 100 AS INTEGER) AS bucket,
             unnest(list_distinct(list_transform(range(len(toks) - 7),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                 || ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6]
                 || ' ' || toks[i+7] || ' ' || toks[i+8]))) AS g
           FROM (SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\s+')
                   END AS toks
                 FROM documents) t
           WHERE len(toks) >= 8),
         gk AS (SELECT doc_id, bucket,
             ('0x' || substr(md5(g), 1, 15))::BIGINT AS gk FROM g),
         tr AS (SELECT DISTINCT gk FROM gk WHERE bucket < 80),
         te AS (SELECT doc_id, gk FROM gk WHERE bucket >= 90)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN tr.gk IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_seen,
           (((2*(count(*) - sum(CASE WHEN tr.gk IS NOT NULL THEN 1 ELSE 0 END)) * 1000000 + (count(*))) // (2*(count(*))))::BIGINT) AS novelty_ppm
         FROM te LEFT JOIN tr ON te.gk = tr.gk
         GROUP BY doc_id""",
    // q156: identical double widening; mean/stddev_pop per dim
    // unrounded, z rounded to 6 (constant dims → 0.0).
    "q156_embedding_whiten" ->
      """WITH cells AS (SELECT vec_id, s.dim AS dim, s.x::DOUBLE AS x
           FROM (SELECT vec_id,
                   unnest(list_transform(range(len(embedding)),
                     i -> {'dim': i, 'x': embedding[i+1]})) AS s
                 FROM embeddings) t),
         st AS (SELECT dim, avg(x) AS mu, stddev_pop(x) AS sd
                FROM cells GROUP BY dim)
         SELECT vec_id, CAST(dim AS INTEGER) AS dim,
           CASE WHEN sd > 0 THEN round((x - mu) / sd, 6)
                ELSE 0.0 END AS z
         FROM cells JOIN st USING (dim)""",
    // q157: the q148 (freq DESC, word ASC) top-V rank convention;
    // occurrence-weighted coverage per language.
    "q157_vocab_coverage" ->
      s"""WITH toks AS (SELECT lang, unnest(
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END) AS w
           FROM documents),
         v AS (SELECT w FROM (SELECT w, count(*) AS freq FROM toks
                 GROUP BY 1 ORDER BY freq DESC, w ASC LIMIT 1000) x)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.w IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_covered,
           ${sqlMicroRatio(
          "count(*) - sum(CASE WHEN v.w IS NOT NULL THEN 1 ELSE 0 END)",
          "count(*)")} AS oov_ppm
         FROM toks LEFT JOIN v ON toks.w = v.w
         GROUP BY lang""",
    // q158: three lag() calls over the (user, ts, event_id) window;
    // rows need a full 3-event history.
    "q158_next_event" ->
      """SELECT user_id, event_id,
           h1 || ',' || h2 || ',' || h3 AS history,
           event_type AS label
         FROM (SELECT user_id, event_id, event_type,
                 lag(event_type, 3) OVER w AS h1,
                 lag(event_type, 2) OVER w AS h2,
                 lag(event_type, 1) OVER w AS h3
               FROM events
               WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts ASC, event_id ASC)) t
         WHERE h1 IS NOT NULL""",
    // q159: the oracle is the NAIVE shared-shingle inversion with
    // exact Jaccard >= 0.5 — prefix filtering must lose nothing.
    "q159_prefix_filter_join" ->
      s"""WITH $shinglesCte,
         e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM d),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS inter,
                 any_value(a.n) AS na, any_value(b.n) AS nb
               FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
         SELECT doc_a, doc_b,
           ${sqlMicroRatio("inter", "na + nb - inter")} AS jaccard_ppm
         FROM p
         WHERE inter::DOUBLE / (na + nb - inter) >= 0.5""",
    // q160: per-doc distinct terms, df count, (df DESC, term ASC)
    // top-30 with the same rank order.
    "q160_stopword_discovery" ->
      """WITH dfreq AS (SELECT term, count(*) AS df FROM
           (SELECT DISTINCT doc_id, unnest(
              CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                   ELSE regexp_split_to_array(trim(text), '\s+') END) AS term
            FROM documents) t
           GROUP BY 1),
         n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents)
         SELECT term, CAST(df AS BIGINT) AS df,
           round(ln(n_docs / df), 6) AS idf,
           CAST(row_number() OVER (ORDER BY df DESC, term ASC)
             AS INTEGER) AS rank
         FROM dfreq CROSS JOIN n
         ORDER BY df DESC, term ASC LIMIT 30""",
    // q161: q127's LM chain through the rounded ppl, ntile(3) per
    // language with the doc_id tiebreak.
    "q161_ppl_buckets" ->
      s"""WITH $trigramLmCtes,
         pp AS (SELECT sc.doc_id, round(exp(x), 6) AS ppl, lang
                FROM sc JOIN documents USING (doc_id)),
         b AS (SELECT doc_id, lang, ppl,
                 ntile(3) OVER (PARTITION BY lang
                   ORDER BY ppl ASC, doc_id ASC) AS t3
               FROM pp)
         SELECT doc_id, lang, ppl,
           CASE t3 WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                   ELSE 'tail' END AS bucket
         FROM b""",
    // q162: the q72 closure through (doc, cluster_size); the window
    // sum normalizes unrounded 1/size weights per language.
    // q162: exact integer units (round-12 float purge) — the
    // discount is halfUp(10⁶/size); the per-lang normalization
    // divides by the sum of those micro integers.
    "q162_dup_weights" ->
      s"""WITH RECURSIVE $canonicalChainCtes
         SELECT l.doc_id, d2.lang,
           CAST(s.cluster_size AS BIGINT) AS cluster_size,
           ${sqlIdivHalfUp("1000000", "s.cluster_size")} AS weight_micro,
           ${sqlIdivHalfUp(
          s"(${sqlIdivHalfUp("1000000", "s.cluster_size")}) * 1000000",
          s"sum(${sqlIdivHalfUp("1000000", "s.cluster_size")}) " +
            "OVER (PARTITION BY d2.lang)")} AS w_norm_ppm
         FROM lab l JOIN sz s USING (cluster_id)
         JOIN documents d2 USING (doc_id)""",
    // q163: the layout is the operator — the oracle is the plain
    // aggregate; compaction must not touch a row.
    "q163_compaction" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(value), 2) AS total_value
         FROM events GROUP BY 1""",
    // q164: the naive single-window cumsum — the engine's two-level
    // range-partitioned form must be integer-identical to it. The
    // rank key IS the pure-BIGINT micro-quality (round-9 seam), so
    // the compare is float-free end to end, ordering included.
    "q164_token_budget" ->
      s"""WITH $qMicroCte,
         nt AS (SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                 END::BIGINT AS n_tokens
               FROM documents),
         c AS (SELECT qm.doc_id, qm.q_micro, nt.n_tokens,
                 sum(nt.n_tokens) OVER (ORDER BY qm.q_micro DESC,
                   qm.doc_id ASC
                   ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
               FROM qm JOIN nt USING (doc_id))
         SELECT doc_id, q_micro, n_tokens, cum_tokens
         FROM c WHERE cum_tokens - n_tokens < 100000""",
    // q165: the q21 Jaccard edge chain ∪ the q26 sign-LSH embedding
    // edge chain, one recursive closure over the union graph.
    "q165_multisignal_clusters" -> {
      val pairCos = cosSql("e1.embedding", "e2.embedding")
      s"""WITH RECURSIVE $shinglesCte,
         e0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
                WHERE len(sh) > 0),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*) AS inter,
                  any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
                FROM e0 a JOIN e0 b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         ted AS (SELECT doc_a, doc_b FROM pr
                 WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                   >= 0.05),
         pl AS (SELECT list(embedding ORDER BY vec_id) AS planes
                FROM embeddings WHERE vec_id BETWEEN 100 AND 115),
         v AS (SELECT vec_id, embedding FROM embeddings),
         bands AS (SELECT v.vec_id, sb.b AS band,
                 array_to_string(list_transform(
                   [pl.planes[sb.b * 4 + 1], pl.planes[sb.b * 4 + 2],
                    pl.planes[sb.b * 4 + 3], pl.planes[sb.b * 4 + 4]], p ->
                   CASE WHEN list_sum(list_transform(
                          list_zip(p, v.embedding),
                          z -> z[1]::DOUBLE * z[2]::DOUBLE)) >= 0
                        THEN '1' ELSE '0' END), '') AS code
               FROM v, pl, (SELECT unnest(range(4)) AS b) sb),
         cp AS (SELECT DISTINCT b1.vec_id AS vec_a, b2.vec_id AS vec_b
                FROM bands b1 JOIN bands b2
                  ON b1.band = b2.band AND b1.code = b2.code
                  AND b1.vec_id < b2.vec_id),
         eed AS (SELECT cp.vec_a AS doc_a, cp.vec_b AS doc_b
                 FROM cp JOIN v e1 ON cp.vec_a = e1.vec_id
                        JOIN v e2 ON cp.vec_b = e2.vec_id
                 WHERE $pairCos > 0.4),
         alln AS (SELECT doc_id FROM d WHERE len(sh) > 0
                  UNION SELECT vec_id FROM embeddings),
         alle AS (SELECT doc_a, doc_b FROM ted
                  UNION SELECT doc_a, doc_b FROM eed),
         sym2 AS (SELECT doc_a AS a, doc_b AS b FROM alle
                  UNION SELECT doc_b, doc_a FROM alle),
         reach2(a, b) AS (
           SELECT doc_id, doc_id FROM alln
           UNION
           SELECT r.a, s2.b FROM reach2 r JOIN sym2 s2 ON r.b = s2.a),
         lab2 AS (SELECT a AS doc_id, min(b) AS cluster_id
                  FROM reach2 GROUP BY a),
         sz2 AS (SELECT cluster_id, count(*) AS cluster_size
                 FROM lab2 GROUP BY 1)
         SELECT l.doc_id, l.cluster_id,
           CAST(s2.cluster_size AS BIGINT) AS cluster_size
         FROM lab2 l JOIN sz2 s2 USING (cluster_id)"""
    },
    // q166: the q143 directed-containment chain grouped by the
    // (contained-source, containing-source) pair.
    "q166_source_overlap" ->
      s"""WITH $shinglesCte,
         e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
               WHERE len(sh) > 0),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS inter, any_value(a.n_sh) AS n_src
               FROM e a JOIN e b ON a.s = b.s AND a.doc_id <> b.doc_id
               GROUP BY 1, 2),
         c AS (SELECT doc_a, doc_b,
                 ${sqlMicroRatio("inter", "n_src")} AS containment_ppm,
                 inter::DOUBLE / n_src >= 0.8 AS contained
               FROM p WHERE inter::DOUBLE / n_src >= 0.5)
         SELECT da.source AS source_a, db.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_pairs,
           ${sqlIdivHalfUp("sum(containment_ppm)",
          "count(*)")} AS avg_containment_micro,
           CAST(sum(CASE WHEN contained THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contained
         FROM c JOIN documents da ON c.doc_a = da.doc_id
                JOIN documents db ON c.doc_b = db.doc_id
         GROUP BY 1, 2""",
    // q167: the q15 quality formula and the q127 LM chain joined,
    // fixed-width bins (never corpus deciles).
    "q167_quality_calibration" ->
      s"""WITH $trigramLmCtes,
         $qMicroCte,
         j AS (SELECT q2.doc_id, q2.q_micro,
                 CAST(round(round(exp(sc.x), 6) * 1e6) AS BIGINT)
                   AS ppl_micro
               FROM qm q2 JOIN sc USING (doc_id))
         SELECT CAST(least(q_micro // 100000, 9) AS INTEGER) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           ${sqlIdivHalfUp("sum(q_micro)", "count(*)")} AS mean_q_micro,
           ${sqlIdivHalfUp("sum(ppl_micro)", "count(*)")} AS mean_ppl_micro
         FROM j GROUP BY 1""",
    // q168: identical count-ratio KL sum; the word-total table joins
    // in word-keyed on both sides.
    "q168_source_kl" ->
      """WITH tk AS (SELECT source, unnest(
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END) AS w
           FROM documents),
         sw AS (SELECT source, w, count(*) AS c FROM tk GROUP BY 1, 2),
         st AS (SELECT source, CAST(sum(c) AS BIGINT) AS ts
                FROM sw GROUP BY 1),
         wt AS (SELECT w, CAST(sum(c) AS BIGINT) AS cw FROM sw GROUP BY 1),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM sw)
         SELECT source, ts AS n_tokens,
           round(sum((c::DOUBLE / ts) *
             ln((c::DOUBLE / ts) / (cw::DOUBLE / n))), 6) AS kl
         FROM sw JOIN st USING (source) JOIN wt USING (w) CROSS JOIN tot
         GROUP BY source, ts""",
    // q169: the q150 allocation CTE joined per doc; the fractional
    // epoch becomes a deterministic md5-hash Bernoulli in exact ppm.
    "q169_epoch_expansion" ->
      s"""WITH $unimaxCtes
         SELECT d.doc_id, d.lang, al.epochs,
           CAST(floor(al.epochs) AS BIGINT) +
             CASE WHEN ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))
                    ::BIGINT % 1000000 <
                  CAST(round((al.epochs - floor(al.epochs)) * 1000000)
                    AS BIGINT)
                  THEN 1 ELSE 0 END AS n_repeats
         FROM documents d JOIN al USING (lang)""",
    // q170: the q133 BM25 chain probed with each sample doc's 8
    // rarest terms (df ASC, term ASC — the same rank both engines),
    // self included; rr = 1/rank within the top-10, else 0.
    "q170_self_retrieval" ->
      s"""WITH toks AS (
           SELECT doc_id, unnest(CASE WHEN length(trim(text)) = 0
               THEN []::VARCHAR[]
               ELSE regexp_split_to_array(trim(text), '\\s+') END) AS term
           FROM documents),
         tf AS MATERIALIZED (
           SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                  avg(dl) AS avg_dl FROM dl),
         dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         qall AS (SELECT doc_id AS q_id, unnest(list_distinct(
                 CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\\s+')
                 END)) AS term
               FROM documents WHERE doc_id % 250 = 0),
         q AS (SELECT q_id, term FROM (
                 SELECT qall.q_id, qall.term,
                   row_number() OVER (PARTITION BY qall.q_id
                     ORDER BY dft.df ASC, qall.term ASC) AS trk
                 FROM qall JOIN dft ON dft.term = qall.term) t
               WHERE trk <= 8),
         sc AS (SELECT q.q_id, tf.doc_id,
                  round(sum(ln((st.n_docs - dft.df + 0.5)
                      / (dft.df + 0.5) + 1)
                    * tf.tf * 2.2
                    / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avg_dl))),
                    6) AS score
                FROM q JOIN tf ON q.term = tf.term
                JOIN dft ON dft.term = q.term
                JOIN dl ON dl.doc_id = tf.doc_id
                CROSS JOIN st
                GROUP BY 1, 2),
         rk AS (SELECT q_id, doc_id,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY score DESC, doc_id ASC) AS rank
                FROM sc),
         self AS (SELECT q_id, rank FROM rk
                  WHERE rank <= 10 AND doc_id = q_id),
         qd AS (SELECT DISTINCT q_id FROM q)
         SELECT qd.q_id,
           CAST(coalesce(self.rank, 0) AS INTEGER) AS self_rank,
           CASE WHEN self.rank IS NOT NULL
                THEN ${sqlIdivHalfUp("1000000", "self.rank")}
                ELSE 0::BIGINT END AS rr_micro
         FROM qd LEFT JOIN self USING (q_id)""",
    // q171: per-key count profile of the join column; the self-join
    // cardinality is the exact sum of squared counts.
    "q171_join_profile" ->
      s"""WITH c AS (SELECT l_partkey, count(*) AS c FROM lineitem
                    GROUP BY 1)
         SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(max(c) AS BIGINT) AS max_per_key,
           ${sqlIdivHalfUp("sum(c) * 1000", "count(*)")}
             AS avg_per_key_milli,
           ${sqlIdivHalfUp("max(c) * count(*) * 1000", "sum(c)")}
             AS skew_factor_milli,
           CAST(sum(c * c) AS BIGINT) AS est_selfjoin_rows
         FROM c""",
    // q172: the q72 closure labels hashed by cluster_id with the q49
    // bucket thresholds.
    "q172_cluster_split" ->
      s"""WITH RECURSIVE $canonicalChainCtes
         SELECT doc_id, cluster_id,
           CAST(('0x' || substr(md5(cluster_id::VARCHAR), 1, 15))::BIGINT
             % 100 AS INTEGER) AS bucket,
           CASE WHEN ('0x' || substr(md5(cluster_id::VARCHAR), 1, 15))
                  ::BIGINT % 100 < 80 THEN 'train'
                WHEN ('0x' || substr(md5(cluster_id::VARCHAR), 1, 15))
                  ::BIGINT % 100 < 90 THEN 'valid'
                ELSE 'test' END AS split
         FROM lab""",
    // q173: the q15 quality bins and the q144 md5 rank order, quota
    // 20 per (lang, bin) cell.
    "q173_balanced_evalset" ->
      s"""WITH $qMicroCte,
         r AS (SELECT d.doc_id, d.lang,
                 CAST(least(qm.q_micro // 100000, 9) AS INTEGER) AS bin,
                 row_number() OVER (PARTITION BY d.lang,
                     CAST(least(qm.q_micro // 100000, 9) AS INTEGER)
                   ORDER BY md5(d.doc_id::VARCHAR) ASC, d.doc_id ASC)
                   AS cell_rank
               FROM documents d JOIN qm ON d.doc_id = qm.doc_id)
         SELECT doc_id, lang, bin, CAST(cell_rank AS INTEGER) AS cell_rank
         FROM r WHERE cell_rank <= 20""",
    // q174: the DIRECT whole-corpus stats — the engine's slice-merge
    // must be lossless to hash-match; moments via the same closed
    // form over exact integer sums.
    "q174_mergeable_stats" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           ${sqlIdivHalfUp("sum(n_chars) * 1000", "count(*)")}
             AS mean_chars_milli,
           ${sqlIdivHalfUp(
          "(count(*) * sum(n_chars * n_chars) - sum(n_chars) * sum(n_chars)) * 1000",
          "count(*) * count(*)")} AS var_chars_milli
         FROM documents""",
    // q175: identical parity sides, distinct (source, md5) pairs,
    // full-outer presence flags.
    "q175_snapshot_diff" ->
      """WITH h AS (SELECT source, doc_id % 2 AS side, md5(text) AS h
                    FROM documents),
         o AS (SELECT DISTINCT source, h FROM h WHERE side = 0),
         n AS (SELECT DISTINCT source, h FROM h WHERE side = 1),
         j AS (SELECT coalesce(o.source, n.source) AS source,
                 o.h AS oh, n.h AS nh
               FROM o FULL OUTER JOIN n
                 ON o.source = n.source AND o.h = n.h)
         SELECT source,
           CAST(sum(CASE WHEN oh IS NOT NULL AND nh IS NOT NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS n_stable,
           CAST(sum(CASE WHEN oh IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_added,
           CAST(sum(CASE WHEN nh IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed
         FROM j GROUP BY 1""",
    // q176: the q15 quality rounded to 6, percent_rank within source
    // on (q ASC, doc_id ASC).
    "q176_score_normalization" ->
      s"""WITH $qMicroCte,
         r AS (SELECT d.doc_id, d.source, qm.q_micro,
                 row_number() OVER (PARTITION BY d.source
                   ORDER BY qm.q_micro ASC, d.doc_id ASC) AS rk,
                 count(*) OVER (PARTITION BY d.source) AS n_src
               FROM documents d JOIN qm ON d.doc_id = qm.doc_id)
         SELECT doc_id, source, q_micro,
           CASE WHEN n_src = 1 THEN 0
                ELSE ${sqlMicroRatio("rk - 1", "n_src - 1")} END
             AS q_norm_ppm
         FROM r""",
    // q177: the shared retrieval chain's BM25 top-20 joined to its
    // own cosine scores, reranked (cos DESC, doc_id) to the top-10.
    "q177_retrieve_rerank" ->
      s"""WITH $hybridRetrievalCtes,
         rc AS (SELECT bm.q_id, bm.doc_id, bm.bm25_rank,
                  coss.score AS cos_score
                FROM bm JOIN coss
                  ON bm.q_id = coss.q_id AND bm.doc_id = coss.doc_id)
         SELECT q_id, doc_id, CAST(rerank AS INTEGER) AS rerank,
           cos_score, bm25_rank
         FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                 ORDER BY cos_score DESC, doc_id ASC) AS rerank
               FROM rc) t
         WHERE rerank <= 10""",
    // q178: the q85 chunk grid, lead() positives, and the identical
    // md5 arithmetic picking each pair's negative document.
    "q178_contrastive_pairs" ->
      """WITH ch AS (SELECT doc_id, CAST(i + 1 AS INTEGER) AS chunk_idx,
             substring(text, CAST(i * 200 + 1 AS INTEGER), 200) AS chunk
           FROM (SELECT doc_id, text,
                   unnest(range(((length(text) - 1) // 200) + 1)) AS i
                 FROM documents WHERE length(text) > 0) t),
         pos AS (SELECT doc_id, chunk_idx, chunk AS anchor,
                   lead(chunk, 1) OVER (PARTITION BY doc_id
                     ORDER BY chunk_idx) AS positive
                 FROM ch),
         p2 AS (SELECT * FROM pos WHERE positive IS NOT NULL),
         fs AS (SELECT doc_id AS neg_doc_id, chunk AS negative
                FROM ch WHERE chunk_idx = 1),
         nd AS (SELECT max(doc_id) + 1 AS n_docs FROM documents),
         neg AS (SELECT p2.doc_id, p2.chunk_idx, p2.anchor, p2.positive,
                   (('0x' || substr(md5(p2.doc_id::VARCHAR || '_' ||
                       p2.chunk_idx::VARCHAR), 1, 15))::BIGINT
                     + p2.doc_id + 1) % n_docs AS pick, n_docs
                 FROM p2 CROSS JOIN nd),
         n2 AS (SELECT doc_id, chunk_idx, anchor, positive,
                  CASE WHEN pick = doc_id THEN (pick + 1) % n_docs
                       ELSE pick END AS neg_doc_id
                FROM neg)
         SELECT n2.doc_id, chunk_idx, anchor, positive,
           CAST(n2.neg_doc_id AS BIGINT) AS neg_doc_id, fs.negative
         FROM n2 JOIN fs USING (neg_doc_id)""",
    // q179: the q72 closure's min-id survivor flag aggregated per
    // source.
    "q179_source_dup_report" ->
      s"""WITH RECURSIVE $canonicalChainCtes
         SELECT d2.source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN lab.doc_id = lab.cluster_id
             THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
           ${sqlMicroRatio(
          "count(*) - sum(CASE WHEN lab.doc_id = lab.cluster_id THEN 1 ELSE 0 END)",
          "count(*)")} AS redundancy_ppm
         FROM lab JOIN documents d2 USING (doc_id)
         GROUP BY 1""",
    // q180: the full 6-round GD replay as chained CTEs — identical
    // tokenization (q142), features rounded to 6 BEFORE training,
    // weights rounded to 6 after every round (absorbs summation-order
    // drift), dot product in the same left-to-right order.
    "q180_lr_quality" -> lrQualityOracleSql,
    // q181: batch statement of the stream's keep-first semantics —
    // same q22 signature/band construction; suppressed iff any band
    // bucket holds a smaller doc_id; band-less docs always kept.
    "q181_stream_neardup" ->
      s"""WITH $shinglesCte,
         m AS (SELECT doc_id,
                 list_transform(range(8), i -> list_min(list_transform(sh,
                   s -> ('0x' || substr(md5(i || ':' || s), 1, 15))::BIGINT)))
                 AS mh
               FROM d WHERE len(sh) > 0),
         bd AS (SELECT doc_id, t.j AS j,
                  mh[t.j*2+1] || '_' || mh[t.j*2+2] AS bval
                FROM m, range(4) t(j)),
         mins AS (SELECT j, bval, min(doc_id) AS mn
                  FROM bd GROUP BY 1, 2),
         sup AS (SELECT bd.doc_id, bool_or(bd.doc_id > mins.mn) AS s
                 FROM bd JOIN mins USING (j, bval) GROUP BY 1)
         SELECT d0.doc_id, coalesce(sup.s, false) AS suppressed
         FROM documents d0 LEFT JOIN sup ON d0.doc_id = sup.doc_id""",
    // q182: identical seeded md5 minhash; per-source component-wise
    // min; agreement fraction vs the exact distinct-shingle union
    // Jaccard through the same inverted join.
    "q182_source_minhash" ->
      s"""WITH t AS (SELECT source,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
           FROM documents),
         sh AS (SELECT source,
             unnest(list_distinct(list_transform(range(len(toks) - 2),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])))
               AS s
           FROM t WHERE len(toks) >= 3),
         sig AS (SELECT source, i.i AS i,
             min(('0x' || substr(md5(i.i || ':' || s), 1, 15))::BIGINT)
               AS h
           FROM sh, range(8) i(i) GROUP BY 1, 2),
         est AS (SELECT a.source AS src_a, b.source AS src_b,
             ${sqlMicroRatio(
          "sum(CASE WHEN a.h = b.h THEN 1 ELSE 0 END)", "8")}
               AS est_jaccard_ppm
           FROM sig a JOIN sig b
             ON a.i = b.i AND a.source < b.source
           GROUP BY 1, 2),
         su AS (SELECT DISTINCT source, s FROM sh),
         sizes AS (SELECT source, count(*) AS n FROM su GROUP BY 1),
         inter AS (SELECT x.source AS src_a, y.source AS src_b,
             count(*) AS inter
           FROM su x JOIN su y ON x.s = y.s AND x.source < y.source
           GROUP BY 1, 2)
         SELECT e.src_a, e.src_b, e.est_jaccard_ppm,
           ${sqlMicroRatio("coalesce(i.inter, 0)",
          "na.n + nb.n - coalesce(i.inter, 0)")} AS jaccard_ppm
         FROM est e
         LEFT JOIN inter i USING (src_a, src_b)
         JOIN sizes na ON na.source = e.src_a
         JOIN sizes nb ON nb.source = e.src_b""",
    // q183: full residual-IVF-PQ replay — coarse Lloyd round (q93
    // contract, k=4), residuals vs the updated centroids, per-
    // subspace PQ Lloyd round on residuals (q128 contract), probe
    // ranking ties (cdist, list), ADC ties (adc, vec_id).
    "q183_ivfpq" -> {
      val coarseK = 4; val nProbe = 2
      val m = 4; val subDim = 16; val pqK = 16
      val nQ = 5; val topK = 10
      val sqd = "(p[1] - p[2]) * (p[1] - p[2])"
      val pqCtes = (0 until m).map { b =>
        val lo = b * subDim + 1; val hi = (b + 1) * subDim
        s"""s$b AS MATERIALIZED (SELECT vec_id,
              list_slice(res, $lo, $hi) AS emb FROM resid),
           pi$b AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
                      AS INTEGER) AS cluster, emb AS c_vec
                    FROM (SELECT vec_id, emb FROM s$b
                          ORDER BY vec_id LIMIT $pqK) x),
           pa$b AS MATERIALIZED (SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY dist, cluster) AS rn
             FROM (SELECT t.vec_id, c.cluster,
                     list_sum(list_transform(list_zip(t.emb, c.c_vec),
                       p -> $sqd)) AS dist
                   FROM s$b t CROSS JOIN pi$b c) x),
           pu$b AS MATERIALIZED (
             SELECT cluster, list(v ORDER BY dim) AS c_vec FROM (
             SELECT a.cluster, s.dim AS dim, round(avg(s.x), 6) AS v
             FROM (SELECT vec_id,
                     unnest(list_transform(range(len(emb)),
                       i -> {'dim': i, 'x': emb[i+1]})) AS s FROM s$b) cells
             JOIN (SELECT vec_id, cluster FROM pa$b WHERE rn = 1) a
               USING (vec_id)
             GROUP BY 1, 2) mm GROUP BY cluster),
           pf$b AS MATERIALIZED (SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY dist, cluster) AS rn
             FROM (SELECT t.vec_id, c.cluster,
                     list_sum(list_transform(list_zip(t.emb, c.c_vec),
                       p -> $sqd)) AS dist
                   FROM s$b t CROSS JOIN pu$b c) x),
           l$b AS (SELECT p.query_id, p.list_id, c.cluster AS c$b,
                     list_sum(list_transform(list_zip(
                       list_slice(p.qres, $lo, $hi), c.c_vec),
                       z -> (z[1] - z[2]) * (z[1] - z[2]))) AS d$b
                   FROM probes p CROSS JOIN pu$b c)"""
      }.mkString(",\n         ")
      s"""WITH e AS MATERIALIZED (SELECT vec_id,
             list_transform(embedding, x -> x::DOUBLE) AS emb
           FROM embeddings),
         ci AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
                  AS INTEGER) AS cluster, emb AS c_vec
                FROM (SELECT vec_id, emb FROM e
                      ORDER BY vec_id LIMIT $coarseK) s),
         ca AS MATERIALIZED (SELECT vec_id, cluster,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY dist, cluster) AS rn
           FROM (SELECT e.vec_id, c.cluster,
                   list_sum(list_transform(list_zip(e.emb, c.c_vec),
                     p -> $sqd)) AS dist
                 FROM e CROSS JOIN ci c) x),
         cu AS MATERIALIZED (
           SELECT cluster, list(v ORDER BY dim) AS c_vec FROM (
           SELECT a.cluster, s.dim AS dim, round(avg(s.x), 6) AS v
           FROM (SELECT vec_id,
                   unnest(list_transform(range(len(emb)),
                     i -> {'dim': i, 'x': emb[i+1]})) AS s FROM e) cells
           JOIN (SELECT vec_id, cluster FROM ca WHERE rn = 1) a
             USING (vec_id)
           GROUP BY 1, 2) mm GROUP BY cluster),
         cf AS MATERIALIZED (SELECT vec_id, cluster,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY dist, cluster) AS rn
           FROM (SELECT e.vec_id, c.cluster,
                   list_sum(list_transform(list_zip(e.emb, c.c_vec),
                     p -> $sqd)) AS dist
                 FROM e CROSS JOIN cu c) x),
         lists AS MATERIALIZED (SELECT vec_id, cluster AS list_id
                                FROM cf WHERE rn = 1),
         resid AS MATERIALIZED (SELECT e.vec_id, l.list_id,
             list_transform(list_zip(e.emb, c.c_vec), p -> p[1] - p[2])
               AS res
           FROM e JOIN lists l USING (vec_id)
           JOIN cu c ON c.cluster = l.list_id),
         pq0 AS (SELECT q.vec_id AS query_id, q.emb AS qe,
                   c.cluster AS list_id, c.c_vec,
                   list_sum(list_transform(list_zip(q.emb, c.c_vec),
                     p -> $sqd)) AS cdist
                 FROM e q CROSS JOIN cu c WHERE q.vec_id < $nQ),
         probes AS MATERIALIZED (SELECT query_id, list_id,
             list_transform(list_zip(qe, c_vec), p -> p[1] - p[2])
               AS qres
           FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cdist, list_id) AS pr FROM pq0) x
           WHERE pr <= $nProbe),
         $pqCtes,
         codes AS MATERIALIZED (
           SELECT f0.vec_id, f0.cluster AS c0, f1.cluster AS c1,
             f2.cluster AS c2, f3.cluster AS c3
           FROM (SELECT vec_id, cluster FROM pf0 WHERE rn = 1) f0
           JOIN (SELECT vec_id, cluster FROM pf1 WHERE rn = 1) f1
             USING (vec_id)
           JOIN (SELECT vec_id, cluster FROM pf2 WHERE rn = 1) f2
             USING (vec_id)
           JOIN (SELECT vec_id, cluster FROM pf3 WHERE rn = 1) f3
             USING (vec_id)),
         adc AS (SELECT pr.query_id, li.vec_id, li.list_id,
             round(l0.d0 + l1.d1 + l2.d2 + l3.d3, 6) AS adc
           FROM lists li
           JOIN probes pr ON pr.list_id = li.list_id
           JOIN codes v ON v.vec_id = li.vec_id
           JOIN l0 ON l0.query_id = pr.query_id
             AND l0.list_id = li.list_id AND v.c0 = l0.c0
           JOIN l1 ON l1.query_id = pr.query_id
             AND l1.list_id = li.list_id AND v.c1 = l1.c1
           JOIN l2 ON l2.query_id = pr.query_id
             AND l2.list_id = li.list_id AND v.c2 = l2.c2
           JOIN l3 ON l3.query_id = pr.query_id
             AND l3.list_id = li.list_id AND v.c3 = l3.c3),
         ex AS (SELECT q.vec_id AS query_id, v.vec_id,
             round(list_sum(list_transform(list_zip(v.emb, q.emb),
               p -> $sqd)), 6) AS exact_dist
           FROM e v CROSS JOIN e q WHERE q.vec_id < $nQ)
         SELECT query_id, vec_id, list_id,
           CAST(rank AS INTEGER) AS rank, adc, exact_dist
         FROM (SELECT a.query_id, a.vec_id, a.list_id, a.adc,
                 ex.exact_dist,
                 row_number() OVER (PARTITION BY a.query_id
                   ORDER BY a.adc, a.vec_id) AS rank
               FROM adc a JOIN ex USING (query_id, vec_id)) r
         WHERE rank <= $topK"""
    },
    // q184: both LM chains replayed with LEFT joins + the same
    // uniform-floor interpolation; the keep cut compares the
    // UNROUNDED diff to the corpus mean like q127.
    "q184_moore_lewis" -> mooreLewisOracleSql,
    // q185: same fixed binning and midpoint estimate; thresholds
    // computed in DOUBLE on both sides; exact audit = quantile_cont.
    "q185_stream_monitor" ->
      """WITH b AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP)
               AS window_start,
             CAST(least(floor(value / 25.0), 19.0) AS INTEGER) AS bin
           FROM events),
         h AS (SELECT window_start, bin, count(*) AS cnt
               FROM b GROUP BY 1, 2),
         c AS (SELECT *, CAST(sum(cnt) OVER (PARTITION BY window_start
                 ORDER BY bin) AS BIGINT) AS cum,
               CAST(sum(cnt) OVER (PARTITION BY window_start)
                 AS BIGINT) AS n
               FROM h),
         p50 AS (SELECT window_start, min(bin) AS qbin,
                   CAST(min(n) AS BIGINT) AS n
                 FROM c WHERE cum::DOUBLE >= 0.5::DOUBLE * n
                 GROUP BY 1),
         p95 AS (SELECT window_start, min(bin) AS qbin
                 FROM c WHERE cum::DOUBLE >= 0.95::DOUBLE * n
                 GROUP BY 1),
         ex AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP)
                  AS window_start,
                round(quantile_cont(value, 0.5), 6) AS p50_exact,
                round(quantile_cont(value, 0.95), 6) AS p95_exact
                FROM events GROUP BY 1)
         SELECT p50.window_start, p50.n AS n_events,
           round((p50.qbin + 0.5) * 25.0, 6) AS p50_est,
           round((p95.qbin + 0.5) * 25.0, 6) AS p95_est,
           ex.p50_exact, ex.p95_exact
         FROM p50 JOIN p95 USING (window_start)
         JOIN ex USING (window_start)""",
    // q186: same hash-cut boundary rule, running-count chunk ids,
    // md5 chunk keys; keep-first = row_number on (doc_id, start).
    "q186_cdc_chunks" ->
      s"""WITH tk AS (SELECT doc_id, toks FROM (
             SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
             FROM documents) t WHERE len(toks) >= 1),
         p AS (SELECT doc_id, CAST(s.i AS INTEGER) AS pos,
                 toks[s.i + 1] AS w,
                 CASE WHEN ('0x' || substr(md5(toks[s.i + 1]), 1, 15))
                        ::BIGINT % 8 = 0 THEN 1 ELSE 0 END AS cut
               FROM (SELECT doc_id, toks, unnest(range(len(toks))) AS i
                     FROM tk) s(doc_id, toks, i)),
         ch AS (SELECT doc_id, pos, w,
                  sum(cut) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - cut AS chunk
                FROM p),
         c AS MATERIALIZED (SELECT doc_id, chunk,
                 min(pos) AS chunk_start,
                 CAST(count(*) AS BIGINT) AS n_toks,
                 md5(string_agg(w, ' ' ORDER BY pos)) AS ckey
               FROM ch GROUP BY 1, 2),
         wn AS (SELECT c.*, row_number() OVER (PARTITION BY ckey
                  ORDER BY doc_id, chunk_start) AS rn FROM c)
         SELECT doc_id, count(*)::BIGINT AS n_chunks,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           ${sqlMicroRatio(
          "sum(CASE WHEN rn > 1 THEN n_toks ELSE 0 END)",
          "sum(n_toks)")} AS dup_token_ppm
         FROM wn GROUP BY 1""",
    // q187: q21's pair chain + a range fan-out on the same
    // floor(jaccard/0.05) arithmetic; dup docs = distinct larger ids.
    "q187_threshold_sweep" ->
      s"""WITH $shinglesCte,
         e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
               WHERE len(sh) > 0),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS inter,
                 any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
               FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
         pj AS (SELECT doc_a, doc_b,
                  round(inter::DOUBLE / (n_a + n_b - inter), 6) AS jaccard
                FROM p
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                  >= 0.05),
         sw AS (SELECT CAST(t.k AS INTEGER) AS k, doc_a, doc_b
                FROM pj, range(1, 21) t(k)
                WHERE t.k <= floor(round(jaccard * 1000000) / 50000.0)),
         g AS (SELECT k, count(*) AS n_pairs,
                 count(DISTINCT doc_b) AS n_dup_docs
               FROM sw GROUP BY 1),
         tot AS (SELECT count(*) AS n_docs FROM documents)
         SELECT (k * 5)::BIGINT AS threshold_pct, n_pairs::BIGINT AS n_pairs,
           n_dup_docs::BIGINT AS n_dup_docs,
           ${sqlMicroRatio("tot.n_docs - n_dup_docs", "tot.n_docs")}
             AS retention_ppm
         FROM g, tot""",
    // q188: identical global positions (per-doc offsets + in-doc
    // index) and pure-integer decile bounds (N·d // 10) — the hashed
    // surface is the exact BIGINT growth curve; the ln-based OLS fit
    // lives in the spec (TextAnalysis.heapsOls), never in a hashed
    // column.
    "q188_heaps_law" ->
      """WITH t AS (SELECT doc_id, source,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+')
             END AS toks FROM documents),
         dl AS (SELECT source, doc_id, CAST(len(toks) AS BIGINT) AS len
                FROM t WHERE len(toks) > 0),
         off AS (SELECT source, doc_id,
                   sum(len) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - len AS off
                 FROM dl),
         tg AS (SELECT x.source, x.w,
                  o.off + x.i + 1 AS posg
                FROM (SELECT source, doc_id, s.i AS i, s.tok AS w
                      FROM (SELECT source, doc_id,
                              unnest(list_transform(range(len(toks)),
                                i -> {'i': i, 'tok': toks[i+1]})) AS s
                            FROM t WHERE len(toks) > 0) y) x
                JOIN off o USING (source, doc_id)),
         first AS (SELECT source, w, min(posg) AS fp
                   FROM tg GROUP BY 1, 2),
         tot AS (SELECT source, count(*) AS n_tokens
                 FROM tg GROUP BY 1),
         b AS (SELECT source, t2.d::BIGINT AS d,
                 ((n_tokens * t2.d) // 10)::BIGINT AS bound
               FROM tot, range(1, 11) t2(d)
               WHERE (n_tokens * t2.d) // 10 >= 1)
         SELECT f.source, b.d,
           min(b.bound)::BIGINT AS n_tokens_at,
           count(*)::BIGINT AS vocab_at
         FROM first f JOIN b
           ON f.source = b.source AND f.fp <= b.bound
         GROUP BY f.source, b.d""",
    // q189: identical normalization chain (lower → strip non-alnum →
    // collapse ws → trim) and md5 keys; dup flags via group counts.
    "q189_normalized_dedup" ->
      """WITH k AS (SELECT doc_id, md5(text) AS raw_key,
             md5(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS norm_key,
             length(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) > 0
               AS has_content
           FROM documents),
         c AS (SELECT k.*,
             count(*) OVER (PARTITION BY raw_key) AS raw_n,
             count(*) OVER (PARTITION BY norm_key) AS norm_n
           FROM k)
         SELECT doc_id, raw_n > 1 AS raw_dup,
           norm_n > 1 AND has_content AS norm_dup,
           norm_n > 1 AND has_content AND raw_n = 1 AS norm_only_dup
         FROM c""",
    // q190: each gate's full proven oracle embedded verbatim as a
    // subquery (no CTE renaming, no re-derivation drift); κ in the
    // same expression order, chance-agreement ties → κ = 0.
    "q190_gate_agreement" ->
      s"""WITH $gateFlagsCtes,
         pr AS (SELECT a.gate AS gate_a, b.gate AS gate_b,
                  count(*) AS n,
                  CAST(sum(CASE WHEN a.f AND b.f THEN 1 ELSE 0 END)
                    AS BIGINT) AS s11,
                  CAST(sum(CASE WHEN NOT a.f AND NOT b.f
                    THEN 1 ELSE 0 END) AS BIGINT) AS s00,
                  CAST(sum(CASE WHEN a.f THEN 1 ELSE 0 END)
                    AS BIGINT) AS sa,
                  CAST(sum(CASE WHEN b.f THEN 1 ELSE 0 END)
                    AS BIGINT) AS sb
                FROM fl a JOIN fl b
                  ON a.doc_id = b.doc_id AND a.gate < b.gate
                GROUP BY 1, 2)
         SELECT gate_a, gate_b, n,
           ${sqlMicroRatio("s11 + s00", "n")} AS agree_ppm,
           CASE WHEN n * n - (sa * sb + (n - sa) * (n - sb)) = 0
                THEN 0::BIGINT
                ELSE ${sqlIdivHalfUpSigned(
          "((s11 + s00) * n - (sa * sb + (n - sa) * (n - sb))) * 1000000",
          "n * n - (sa * sb + (n - sa) * (n - sb))")}
           END AS kappa_ppm
         FROM pr""",
    // q191: same epoch-seeded md5 order key; the per-epoch position
    // is a window row_number (tiny per-epoch partitions in DuckDB;
    // the Spark side uses the exact distributed ranking instead).
    "q191_epoch_order" ->
      """WITH k AS (SELECT doc_id, t.e AS epoch,
             ('0x' || substr(md5(t.e || ':' || doc_id), 1, 15))::BIGINT
               AS h
           FROM documents, range(3) t(e))
         SELECT CAST(epoch AS INTEGER) AS epoch, doc_id,
           row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id)
             AS position
         FROM k""",
    // q192: q26's banded generation replayed cross-set; argmax by
    // (sim desc, eval_id desc) matches the struct-max tie-break.
    "q192_embedding_decon" -> {
      val pairCos = cosSql("e1.embedding", "e2.embedding")
      s"""WITH pl AS (SELECT list(embedding ORDER BY vec_id) AS planes
                FROM embeddings WHERE vec_id BETWEEN 100 AND 115),
         v AS (SELECT vec_id, embedding FROM embeddings),
         bands AS (SELECT v.vec_id, s.b AS band,
                 array_to_string(list_transform(
                   [pl.planes[s.b * 4 + 1], pl.planes[s.b * 4 + 2],
                    pl.planes[s.b * 4 + 3], pl.planes[s.b * 4 + 4]], p ->
                   CASE WHEN list_sum(list_transform(
                          list_zip(p, v.embedding),
                          z -> z[1]::DOUBLE * z[2]::DOUBLE)) >= 0
                        THEN '1' ELSE '0' END), '') AS code
               FROM v, pl, (SELECT unnest(range(4)) AS b) s),
         p AS (SELECT DISTINCT b1.vec_id AS vec_id,
                 b2.vec_id AS eval_id
               FROM bands b1 JOIN bands b2
                 ON b1.band = b2.band AND b1.code = b2.code
               WHERE b1.vec_id % 50 != 0 AND b2.vec_id % 50 = 0),
         s AS (SELECT p.vec_id, p.eval_id, $pairCos AS sim
               FROM p JOIN v e1 ON p.vec_id = e1.vec_id
                      JOIN v e2 ON p.eval_id = e2.vec_id),
         f AS (SELECT vec_id, eval_id, sim,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY sim DESC, eval_id DESC) AS rn,
                 count(*) OVER (PARTITION BY vec_id) AS n_matches
               FROM s WHERE sim > 0.4)
         SELECT vec_id, CAST(n_matches AS BIGINT) AS n_matches,
           eval_id AS best_eval_id, round(sim, 6) AS best_sim
         FROM f WHERE rn = 1"""
    },
    // q193: identical hash-seeded picks, per-source position ranks,
    // and the population stddev over the 32 exact resample means.
    "q193_bootstrap_ci" ->
      """WITH r AS (SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY doc_id)
               AS pick
           FROM documents),
         c AS (SELECT source, count(*) AS n,
                 avg(n_chars::DOUBLE) AS mean_direct
               FROM documents GROUP BY 1),
         pk AS (SELECT source, b,
                  ('0x' || substr(md5(b || ':' || i || ':' ||
                     source), 1, 15))::BIGINT % n + 1 AS pick
                FROM (SELECT c.source, c.n, t.b AS b,
                        unnest(range(1, c.n + 1)) AS i
                      FROM c, range(32) t(b)) x),
         rm AS (SELECT pk.source, pk.b, avg(r.n_chars::DOUBLE) AS m
                FROM pk JOIN r USING (source, pick)
                GROUP BY 1, 2),
         s AS (SELECT source, stddev_pop(m) AS se FROM rm GROUP BY 1)
         SELECT c.source, CAST(c.n AS BIGINT) AS n_docs,
           round(c.mean_direct, 6) AS mean_nchars,
           round(s.se, 6) AS boot_se,
           round(c.mean_direct - 1.96 * s.se, 6) AS ci_lo,
           round(c.mean_direct + 1.96 * s.se, 6) AS ci_hi
         FROM c JOIN s USING (source)""",
    // q194: the q78 recursive closure + q127 LM chain shared inline
    // (the q130 pattern); the gopher/LR/ML gates embedded as their
    // full proven statements; LR cut at the corpus-mean score.
    "q194_four_gate_manifest" ->
      s"""WITH RECURSIVE $canonicalChainCtes,
         $trigramLmCtes,
         pk AS (SELECT doc_id FROM sc CROSS JOIN m
                WHERE exp(x) <= mean_ppl),
         gk AS (SELECT doc_id FROM ($gopherOracleSql) x1 WHERE keep),
         lrs AS (SELECT doc_id, z_pico FROM ($lrQualityOracleSql) x2),
         lrm AS (SELECT sum(z_pico) AS sz, count(*) AS nz FROM lrs),
         lk AS (SELECT doc_id FROM lrs, lrm WHERE z_pico * nz >= sz),
         mk AS (SELECT doc_id FROM ($mooreLewisOracleSql) x3
                WHERE keep = 1),
         man AS (SELECT s.doc_id,
                   ('0x' || substr(md5(s.doc_id::VARCHAR), 1, 15))::BIGINT
                     AS h
                 FROM (SELECT doc_id FROM surv WHERE rn = 1) s
                 JOIN pk USING (doc_id) JOIN gk USING (doc_id)
                 JOIN lk USING (doc_id) JOIN mk USING (doc_id))
         SELECT doc_id, CAST(h % 8 AS INTEGER) AS shard,
           CAST(row_number() OVER (PARTITION BY h % 8
             ORDER BY h ASC, doc_id ASC) AS INTEGER) AS position
         FROM man""",
    // q195: per-doc n-gram repetition battery — the keep predicate
    // compares the SAME 6-rounded values both engines emit.
    "q195_repetition_stats" ->
      s"""WITH d AS (SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END AS t
           FROM documents),
         base AS (SELECT doc_id, len(t) AS n_tokens,
                    len(list_distinct(t)) AS n_distinct FROM d),
         bi AS (SELECT doc_id, g, count(*) AS c FROM (
                  SELECT doc_id, unnest(list_transform(range(len(t) - 1),
                    i -> t[i+1] || ' ' || t[i+2])) AS g
                  FROM d WHERE len(t) >= 2) x GROUP BY 1, 2),
         bitop AS (SELECT doc_id, max(c) AS top_bi FROM bi GROUP BY 1),
         tri AS (SELECT doc_id, g, count(*) AS c FROM (
                   SELECT doc_id, unnest(list_transform(range(len(t) - 2),
                     i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
                   FROM d WHERE len(t) >= 3) x GROUP BY 1, 2),
         tria AS (SELECT doc_id, sum(c) AS tri_tot,
                    sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS tri_dup
                  FROM tri GROUP BY 1),
         r AS (SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
                 CASE WHEN b.n_tokens = 0 THEN 0::BIGINT
                   ELSE ${sqlMicroRatio(
          "b.n_tokens - b.n_distinct", "b.n_tokens")} END
                   AS dup_token_ppm,
                 CASE WHEN b.n_tokens = 0 THEN 0::BIGINT
                   ELSE ${sqlIdivHalfUp(
          "2000000 * COALESCE(bt.top_bi, 0)", "b.n_tokens")} END
                   AS top_bigram_ppm,
                 CASE WHEN ta.tri_tot IS NULL THEN 0::BIGINT
                   ELSE ${sqlMicroRatio("ta.tri_dup", "ta.tri_tot")} END
                   AS dup_trigram_ppm
               FROM base b
               LEFT JOIN bitop bt USING (doc_id)
               LEFT JOIN tria ta USING (doc_id))
         SELECT doc_id, n_tokens, dup_token_ppm, top_bigram_ppm,
           dup_trigram_ppm,
           CAST(dup_token_ppm <= 700000 AND top_bigram_ppm <= 200000
             AND dup_trigram_ppm <= 300000 AS INTEGER) AS keep
         FROM r""",
    // q196: 10-token windows at stride 5; duplicated = exact window
    // text in ≥ 2 distinct docs.
    "q196_dup_windows" ->
      s"""WITH d AS (SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END AS t
           FROM documents),
         win AS (SELECT doc_id,
                   unnest(list_transform(range((len(t) - 10) // 5 + 1),
                     i -> array_to_string(t[(i*5+1):(i*5+10)], ' '))) AS w
                 FROM d WHERE len(t) >= 10),
         dup AS (SELECT w, 1 AS is_dup FROM (
                   SELECT w, count(DISTINCT doc_id) AS nd
                   FROM win GROUP BY 1) x WHERE nd >= 2),
         per AS (SELECT doc_id, count(*) AS n_windows,
                   sum(COALESCE(is_dup, 0)) AS n_dup_windows
                 FROM win LEFT JOIN dup USING (w) GROUP BY 1)
         SELECT doc_id,
           CAST(COALESCE(n_windows, 0) AS BIGINT) AS n_windows,
           CAST(COALESCE(n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
           CASE WHEN n_windows IS NULL THEN 0::BIGINT
             ELSE ${sqlMicroRatio("n_dup_windows", "n_windows")} END
             AS dup_window_ppm
         FROM documents LEFT JOIN per USING (doc_id)""",
    // q197: exact rank-statistic quartiles per language (value at
    // rank ⌈0.25n⌉ / ⌈0.75n⌉ in (n_tokens, doc_id) order).
    "q197_iqr_length_gate" ->
      """WITH d AS (SELECT doc_id, lang,
             CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END
               AS BIGINT) AS n_tokens
           FROM documents),
         r AS (SELECT d.*,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY n_tokens ASC, doc_id ASC) AS rn,
                 count(*) OVER (PARTITION BY lang) AS cnt
               FROM d),
         q AS (SELECT lang,
                 max(CASE WHEN rn = CAST(ceil(cnt * 0.25) AS BIGINT)
                   THEN n_tokens END) AS q1,
                 max(CASE WHEN rn = CAST(ceil(cnt * 0.75) AS BIGINT)
                   THEN n_tokens END) AS q3
               FROM r GROUP BY 1)
         SELECT doc_id, lang, n_tokens, q1, q3,
           CAST(n_tokens BETWEEN q1 AND q3 AS INTEGER) AS keep
         FROM d JOIN q USING (lang)""",
    // q199: the full LR training replay as a subquery, then exact
    // ntile deciles over the exact z_pico ranking (the q50
    // convention); per-decile stats all-integer (round-9 seam).
    "q199_lr_calibration" ->
      s"""WITH sc AS (SELECT * FROM ($lrQualityOracleSql) x),
         d AS (SELECT *, CAST(ntile(10) OVER
                 (ORDER BY z_pico DESC, doc_id) AS INTEGER) AS decile
               FROM sc)
         SELECT decile, count(*) AS n_docs,
           CAST(sum(z_pico) AS BIGINT) AS sum_z_pico,
           ${sqlMicroRatio("sum(label)", "count(*)")} AS pos_rate_ppm
         FROM d GROUP BY 1""",
    // q200: the q78 recursive closure (surv), the q93/q135 k-means +
    // SemDeDup chain (renamed sm/sp/ss to avoid CTE collisions), and
    // q20's md5 keep-min rule, composed cumulatively; removed = the
    // 4-row lag window.
    "q200_dedup_funnel" -> {
      val pairCos = cosSql("lo.emb", "hi.emb")
      s"""WITH RECURSIVE $canonicalChainCtes,
         $kmeansCtes,
         asg AS MATERIALIZED (SELECT vec_id, cluster FROM a3
                              WHERE rn = 1),
         sm AS MATERIALIZED (SELECT a.vec_id, a.cluster, e.emb
                             FROM asg a JOIN e USING (vec_id)),
         sp AS (SELECT hi.vec_id, $pairCos AS sim
                FROM sm hi JOIN sm lo
                  ON hi.cluster = lo.cluster AND lo.vec_id < hi.vec_id),
         ss AS (SELECT vec_id, max(sim) AS ms FROM sp GROUP BY 1),
         semkept AS (SELECT sm.vec_id AS doc_id FROM sm LEFT JOIN ss
                     ON sm.vec_id = ss.vec_id
                     WHERE coalesce(ss.ms < 0.35, true)),
         s1 AS (SELECT min(doc_id) AS doc_id FROM documents
                GROUP BY md5(text)),
         s2 AS (SELECT doc_id FROM s1
                JOIN (SELECT doc_id FROM surv WHERE rn = 1) sv
                  USING (doc_id)),
         s3 AS (SELECT doc_id FROM s2 JOIN semkept USING (doc_id)),
         counts AS (
           SELECT '0_all' AS stage, count(*) AS n_docs FROM documents
           UNION ALL SELECT '1_exact', count(*) FROM s1
           UNION ALL SELECT '2_neardup', count(*) FROM s2
           UNION ALL SELECT '3_semantic', count(*) FROM s3)
         SELECT stage, n_docs,
           coalesce(lag(n_docs) OVER (ORDER BY stage) - n_docs,
             CAST(0 AS BIGINT)) AS removed
         FROM counts"""
    },
    // q201: contingency cells vs independence expectation.
    // q201: exact integer emissions (round-12 float purge) —
    // expected = rt·ct/N in half-up micro; the cell statistic
    // reduces to (n·N − rt·ct)²/(N·rt·ct) in half-up milli.
    "q201_composition_chi2" ->
      s"""WITH c AS (SELECT lang, source, count(*)::BIGINT AS n
             FROM documents GROUP BY 1, 2),
         lt AS (SELECT lang, count(*)::BIGINT AS n_lang
                FROM documents GROUP BY 1),
         st AS (SELECT source, count(*)::BIGINT AS n_source
                FROM documents GROUP BY 1),
         t AS (SELECT count(*)::BIGINT AS n_total FROM documents)
         SELECT c.lang, c.source, c.n,
           ${sqlIdivHalfUp(
          "lt.n_lang * st.n_source * 1000000",
          "t.n_total")} AS expected_micro,
           ${sqlIdivHalfUp(
          "(c.n * t.n_total - lt.n_lang * st.n_source) * " +
            "(c.n * t.n_total - lt.n_lang * st.n_source) * 1000",
          "t.n_total * lt.n_lang * st.n_source")} AS chi2_cell_milli
         FROM c JOIN lt USING (lang) JOIN st USING (source), t""",
    // q202: the q53 layout replayed, then per-(lang, window) token
    // sums, per-lang fill/overflow/spanning rollup. The n_tokens > 0
    // guard keeps empty docs out of the spanning count (their start
    // and end offsets coincide) and keeps cum−1 non-negative, where
    // DuckDB's floor `//` and Spark's truncating cast would differ.
    "q202_packing_audit" ->
      s"""WITH d AS (
           SELECT doc_id, lang,
             CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
               AS BIGINT) AS n_tokens
           FROM documents),
         c AS (SELECT d.*, CAST(sum(n_tokens) OVER
                 (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_tokens FROM d),
         w AS (SELECT *, (cum_tokens - n_tokens) // 2048 AS window_id
               FROM c),
         wa AS (SELECT lang, window_id, sum(n_tokens) AS win_tokens
                FROM w GROUP BY 1, 2),
         sp AS (SELECT lang, count(*) AS spanning_docs
                FROM w
                WHERE n_tokens > 0
                  AND (cum_tokens - 1) // 2048 <> window_id
                GROUP BY 1),
         agg AS (SELECT lang, count(*)::BIGINT AS n_windows,
                   ${sqlMicroRatio(
          "sum(win_tokens)", "count(*) * 2048")} AS mean_fill_ppm,
                   sum(CASE WHEN win_tokens > 2048 THEN 1 ELSE 0 END)
                     AS overflow_windows
                 FROM wa GROUP BY 1)
         SELECT agg.lang, agg.n_windows, agg.mean_fill_ppm,
           CAST(agg.overflow_windows AS BIGINT) AS overflow_windows,
           CAST(COALESCE(sp.spanning_docs, 0) AS BIGINT) AS spanning_docs
         FROM agg LEFT JOIN sp USING (lang)""",
    // q203: the q21 inversion pair chain at J ≥ 0.5 joined to the
    // q49 split hash of both ends, split pair canonicalized.
    "q203_split_leakage" ->
      s"""WITH $shinglesCte,
         e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
               WHERE len(sh) > 0),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS inter,
                 any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
               FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
         pr AS (SELECT doc_a, doc_b FROM p
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6) >= 0.5),
         sp AS (SELECT doc_id,
                  CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 80
                       THEN 'train'
                       WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 90
                       THEN 'valid' ELSE 'test' END AS split
                FROM documents)
         SELECT least(sa.split, sb.split) AS split_a,
           greatest(sa.split, sb.split) AS split_b,
           count(*) AS n_pairs,
           CAST(least(sa.split, sb.split) <> greatest(sa.split, sb.split)
             AS INTEGER) AS leak
         FROM pr
         JOIN sp sa ON pr.doc_a = sa.doc_id
         JOIN sp sb ON pr.doc_b = sb.doc_id
         GROUP BY 1, 2""",
    // q204: same unigram counts → count-of-counts chain; the r+1
    // lookup is a self-join on the spectrum (NULL at gaps), totals
    // one aggregated row.
    "q204_good_turing" ->
      s"""WITH wc AS (
           SELECT w, count(*) AS r FROM (
             SELECT unnest(
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\\s+') END) AS w
             FROM documents) x
           GROUP BY w),
         spec AS (SELECT r, count(*) AS n_types FROM wc GROUP BY r),
         t AS (SELECT sum(r * n_types) AS n_total,
                 sum(CASE WHEN r = 1 THEN n_types END) AS n1
               FROM spec),
         lo AS (SELECT r, n_types,
                  row_number() OVER (ORDER BY r) AS rk
                FROM spec)
         SELECT s.r, s.n_types,
           ${sqlMicroRatio("(s.r + 1) * nx.n_types", "s.n_types")}
             AS r_star_micro,
           ${sqlMicroRatio("s.r * s.n_types", "t.n_total")}
             AS prob_mass_ppm,
           ${sqlMicroRatio("coalesce(t.n1, 0)", "t.n_total")} AS p0_ppm
         FROM lo s LEFT JOIN spec nx ON nx.r = s.r + 1, t
         WHERE s.rk <= 10""",
    // q205: the q93 Lloyd chain for the assignment, the shared q15
    // quality CTE, per-cluster rank with the (q desc, doc_id asc)
    // tiebreak, micro-unit quality export.
    "q205_cluster_cap" ->
      s"""WITH $kmeansCtes,
         asg AS (SELECT vec_id AS doc_id, cluster FROM a3 WHERE rn = 1),
         $qMicroCte,
         r AS (SELECT asg.doc_id, asg.cluster, q2.q_micro,
                 row_number() OVER (PARTITION BY asg.cluster
                   ORDER BY q2.q_micro DESC, asg.doc_id ASC) AS rk
               FROM asg JOIN qm q2 USING (doc_id))
         SELECT doc_id, cluster, CAST(rk AS INTEGER) AS rk, q_micro
         FROM r WHERE rk <= 50""",
    // q207: the q203 cross-split chain; the victim CASE mirrors the
    // engine's split-priority expression exactly.
    "q207_leak_quarantine" ->
      s"""WITH $shinglesCte,
         e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
               WHERE len(sh) > 0),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS inter,
                 any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
               FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
         pr AS (SELECT doc_a, doc_b FROM p
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6) >= 0.5),
         sp AS (SELECT doc_id,
                  CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 80
                       THEN 'train'
                       WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 90
                       THEN 'valid' ELSE 'test' END AS split
                FROM documents),
         x AS (SELECT pr.doc_a, pr.doc_b, sa.split AS sa, sb.split AS sb,
                 CASE sa.split WHEN 'train' THEN 0 WHEN 'valid' THEN 1
                   ELSE 2 END AS pa,
                 CASE sb.split WHEN 'train' THEN 0 WHEN 'valid' THEN 1
                   ELSE 2 END AS pb
               FROM pr
               JOIN sp sa ON pr.doc_a = sa.doc_id
               JOIN sp sb ON pr.doc_b = sb.doc_id
               WHERE sa.split <> sb.split)
         SELECT CASE WHEN pa < pb THEN doc_a ELSE doc_b END AS doc_id,
           CASE WHEN pa < pb THEN sa ELSE sb END AS split,
           count(*) AS n_links
         FROM x GROUP BY 1, 2""",
    // q209: same (source, bucket) count chain; ratio rounded to ppm
    // on the identical integer-product double, q49 hash acceptance.
    "q209_length_match" ->
      """WITH d AS (
           SELECT doc_id, source,
             CAST(len(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END)
               AS BIGINT) // 32 AS bucket
           FROM documents),
         c AS (SELECT source, bucket, count(*) AS n_docs
               FROM d GROUP BY 1, 2),
         st AS (SELECT source, sum(n_docs) AS s_tot FROM c GROUP BY 1),
         bt AS (SELECT bucket, sum(n_docs) AS g_cnt FROM c GROUP BY 1),
         gt AS (SELECT sum(n_docs) AS g_tot FROM c),
         r AS (SELECT c.source, c.bucket,
                 least(1000000, (((2*(bt.g_cnt * st.s_tot) * 1000000 + (gt.g_tot * c.n_docs)) // (2*(gt.g_tot * c.n_docs)))::BIGINT)) AS ratio_ppm
               FROM c JOIN st USING (source)
               JOIN bt USING (bucket), gt)
         SELECT d.source, d.bucket, count(*) AS n_docs,
           max(r.ratio_ppm) AS ratio_ppm,
           CAST(sum(CASE WHEN
             ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT
               % 1000000 < r.ratio_ppm THEN 1 ELSE 0 END) AS BIGINT)
             AS n_accepted
         FROM d JOIN r USING (source, bucket)
         GROUP BY 1, 2""",
    // q210: docs × probe depths, shorter docs excluded per depth,
    // shared-prefix groups rolled up per depth.
    "q210_prefix_sharing" ->
      """WITH tk AS (
           SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS t
           FROM documents),
         g AS (SELECT CAST(dd.depth AS BIGINT) AS depth,
                 array_to_string(t[1:dd.depth], ' ') AS prefix,
                 count(*) AS cnt
               FROM tk, (SELECT unnest([1, 2, 4, 8, 16]) AS depth) dd
               WHERE len(t) >= dd.depth
               GROUP BY 1, 2)
         SELECT depth,
           CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_prefixes,
           CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
             AS n_docs_sharing,
           CAST(sum(CASE WHEN cnt > 1 THEN (cnt - 1) * depth
             ELSE 0 END) AS BIGINT) AS saved_tokens
         FROM g GROUP BY 1""",
    // q211: per-doc quality integerized to micro BEFORE summing, so
    // both engines aggregate exact integers; identical shrinkage
    // expression order on the two final divisions.
    "q211_source_reputation" ->
      s"""WITH $qMicroCte,
         sc AS (SELECT d.source, qm.q_micro AS qv
                FROM documents d JOIN qm ON d.doc_id = qm.doc_id),
         ps AS (SELECT source, count(*) AS n_docs, sum(qv) AS sum_qm
                FROM sc GROUP BY 1),
         g AS (SELECT sum(n_docs) AS g_n, sum(sum_qm) AS g_sum FROM ps)
         SELECT ps.source, ps.n_docs,
           ${sqlIdivHalfUp("ps.sum_qm", "ps.n_docs")} AS mean_q_micro,
           ${sqlIdivHalfUp(
        s"ps.sum_qm + 20 * ${sqlIdivHalfUp("g.g_sum", "g.g_n")}",
        "ps.n_docs + 20")} AS shrunk_q_micro
         FROM ps, g""",
    // q213: the q73 5-gram chain flipped to the eval side, with the
    // eval shingle-set size carried for the containment denominator.
    "q213_eval_contamination" ->
      """WITH dd AS (
           SELECT doc_id,
             list_distinct(list_transform(range(len(toks) - 4),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                 || ' ' || toks[i+4] || ' ' || toks[i+5])) AS sh
           FROM (SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
                 FROM documents) t
           WHERE len(toks) >= 5),
         ev AS (SELECT doc_id AS eval_id, len(sh) AS n_eval,
                  unnest(sh) AS s
                FROM dd WHERE doc_id % 50 = 0),
         tr AS (SELECT doc_id AS train_id, unnest(sh) AS s FROM dd
                WHERE doc_id % 50 <> 0),
         p AS (SELECT ev.eval_id, tr.train_id, count(*) AS inter,
                 max(ev.n_eval) AS n_eval
               FROM tr JOIN ev ON tr.s = ev.s
               GROUP BY 1, 2)
         SELECT eval_id, count(*) AS n_train_hits,
           max((((2*(inter) * 1000000 + (n_eval)) // (2*(n_eval)))::BIGINT))
             AS max_containment_micro
         FROM p GROUP BY 1""",
    // q215: a3 already ranks every (vec, centroid) distance; rn=1 is
    // a, rn=2 is b, same sqrt/ratio expression, micro rollup.
    "q215_silhouette" ->
      s"""WITH $kmeansCtes,
         ab AS (SELECT vec_id,
                  min(CASE WHEN rn = 1 THEN dist END) AS a,
                  min(CASE WHEN rn = 2 THEN dist END) AS b,
                  min(CASE WHEN rn = 1 THEN cluster END) AS cluster
                FROM a3 WHERE rn <= 2 GROUP BY 1),
         s AS (SELECT cluster,
                 CASE WHEN greatest(sqrt(a), sqrt(b)) = 0 THEN 0.0
                      ELSE (sqrt(b) - sqrt(a))
                        / greatest(sqrt(a), sqrt(b)) END AS sil
               FROM ab)
         SELECT cluster, count(*) AS n_vecs,
           CAST(round(avg(sil) * 1e6) AS BIGINT) AS mean_sil_micro
         FROM s GROUP BY 1""",
    // q216: grouped-by-distinct-z_pico rank sum — integer cells all
    // the way through the exact half-up final division (round-9
    // seam: AUC is rank-invariant under the monotone sigmoid).
    "q216_lr_auc" ->
      s"""WITH g AS (SELECT z_pico, count(*) AS cnt, sum(label) AS n_pos_s
                FROM ($lrQualityOracleSql) z
                GROUP BY 1),
         r AS (SELECT *, coalesce(sum(cnt) OVER (ORDER BY z_pico ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum_before
               FROM g),
         a AS (SELECT sum(n_pos_s * (2 * cum_before + cnt + 1)) AS trs,
                 sum(n_pos_s)::BIGINT AS n_pos,
                 sum(cnt)::BIGINT AS n_all
               FROM r)
         SELECT n_pos, n_all - n_pos AS n_neg,
           CASE WHEN n_pos = 0 OR n_pos = n_all THEN NULL
                ELSE ${sqlIdivHalfUp(
        "1000000 * (trs - n_pos * (n_pos + 1))",
        "2 * n_pos * (n_all - n_pos)")}
           END AS auc_micro
         FROM a""",
    // q217: the q180 GD chain scores every doc; the cut is the mean
    // z in exact signed BIGINTs (z·n >= Σz, the q194 convention) —
    // the drained stream must equal this batch statement row for row.
    "q217_stream_quality_gate" ->
      s"""WITH sc AS (SELECT doc_id, z_pico
                FROM ($lrQualityOracleSql) z),
         m AS (SELECT sum(z_pico) AS sz, count(*) AS nz FROM sc)
         SELECT doc_id, z_pico, z_pico * nz >= sz AS admitted
         FROM sc, m""",
    // q218: the recursive-closure labels + shared quality CTE; the
    // engine's double rounding (6 places, then micro) replayed.
    "q218_cluster_spread" ->
      s"""WITH RECURSIVE $canonicalChainCtes
         SELECT lab.cluster_id,
           CAST(max(sz.cluster_size) AS BIGINT) AS cluster_size,
           min(qm.q_micro) AS q_min_micro,
           max(qm.q_micro) AS q_max_micro,
           max(qm.q_micro) - min(qm.q_micro) AS q_spread_micro
         FROM lab
         JOIN sz USING (cluster_id)
         JOIN qm USING (doc_id)
         WHERE sz.cluster_size >= 2
         GROUP BY 1""",
    // q219: distinct (source, shingle) set; first owner = min source
    // name; left join keeps all-novel sources exact.
    "q219_source_novelty" ->
      s"""WITH $shinglesCte,
         ss AS (SELECT DISTINCT doc.source, u.s
                FROM d JOIN documents doc USING (doc_id),
                  unnest(d.sh) AS u(s)),
         t AS (SELECT source, count(*) AS n_shingles FROM ss GROUP BY 1),
         o AS (SELECT s, min(source) AS source FROM ss GROUP BY 1),
         nv AS (SELECT source, count(*) AS n_novel FROM o GROUP BY 1)
         SELECT t.source, t.n_shingles,
           coalesce(nv.n_novel, 0) AS n_novel,
           (((2*(coalesce(nv.n_novel, 0)) * 1000000 + (t.n_shingles)) // (2*(t.n_shingles)))::BIGINT) AS novelty_ppm
         FROM t LEFT JOIN nv USING (source)""",
    // q220: per-(term, doc) counts → per-term cf/df; identical
    // expected-df expression 1 - exp(-cf/D) on both engines.
    "q220_burstiness" ->
      s"""WITH tk AS (SELECT doc_id, unnest(
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END) AS w
           FROM documents),
         pd AS (SELECT w, doc_id, count(*) AS tf FROM tk GROUP BY 1, 2),
         pt AS (SELECT w, sum(tf)::BIGINT AS cf, count(*) AS df FROM pd
                GROUP BY 1 HAVING count(*) >= 3),
         n AS (SELECT count(*) AS n_docs FROM documents)
         SELECT w, cf, df, n_docs,
           ${sqlMicroRatio("cf", "df")} AS burst_micro
         FROM pt, n""",
    // q221: the recursive closure's nodes/survivors decide kept; docs
    // outside the closure (< 3 tokens) count as kept.
    "q221_dedup_sizes" ->
      s"""WITH RECURSIVE $canonicalChainCtes,
         tokc AS (SELECT doc_id, source,
             CAST(len(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END)
               AS BIGINT) AS n_tokens
           FROM documents),
         kp AS (SELECT doc_id FROM surv WHERE rn = 1),
         k AS (SELECT t.source, t.n_tokens,
                 CASE WHEN n.doc_id IS NULL OR kp.doc_id IS NOT NULL
                      THEN 1 ELSE 0 END AS kept
               FROM tokc t
               LEFT JOIN nodes n USING (doc_id)
               LEFT JOIN kp USING (doc_id))
         SELECT source, count(*) AS n_docs,
           sum(n_tokens)::BIGINT AS n_tokens,
           CAST(sum(kept) AS BIGINT) AS n_docs_kept,
           sum(CASE WHEN kept = 1 THEN n_tokens ELSE 0 END)::BIGINT
             AS n_tokens_kept,
           ${sqlMicroRatio("sum(kept)", "count(*)")} AS doc_retention_ppm,
           CASE WHEN sum(n_tokens) = 0 THEN 1000000
                ELSE ${sqlMicroRatio(
        "sum(CASE WHEN kept = 1 THEN n_tokens ELSE 0 END)",
        "sum(n_tokens)")}
           END AS token_retention_ppm
         FROM k GROUP BY 1""",
    // q222: the q116 rolling-hash + frame-stride chain; the per-frame
    // fingerprint drops the dim term; dup = fingerprint in >= 2 docs.
    "q222_frame_dedup" ->
      """WITH base AS (
           SELECT doc_id,
             list_reduce(list_prepend(0::BIGINT,
               list_transform(range(length(text)),
                 i -> ord(substr(text, (i+1)::INT, 1))::BIGINT)),
               (a, c) -> (a * 31 + c) % 1000000007) AS h,
             CAST(octet_length(encode(text)) % 240 + 1 AS INTEGER)
               AS n_frames
           FROM documents),
         frames AS (
           SELECT doc_id,
             (h + f * 2654435761) % 1000000007 AS fp
           FROM (SELECT doc_id, h,
                   unnest(range(0, n_frames, greatest(1, n_frames // 8)))
                     AS f
                 FROM base) x),
         dup AS (SELECT fp FROM frames GROUP BY fp
                 HAVING count(DISTINCT doc_id) >= 2),
         pd AS (SELECT doc_id, count(*) AS n_sampled FROM frames
                GROUP BY 1),
         dd AS (SELECT f.doc_id, count(*) AS n_dup
                FROM frames f JOIN dup USING (fp) GROUP BY 1)
         SELECT pd.doc_id, pd.n_sampled, dd.n_dup,
           (((2*(dd.n_dup) * 1000000 + (pd.n_sampled)) // (2*(pd.n_sampled)))::BIGINT)
             AS dup_frac_ppm
         FROM pd JOIN dd USING (doc_id)""",
    // q223: the q211 shrinkage chain ranks; one tiny-frame window
    // does the greedy budget walk.
    "q223_admission_plan" ->
      s"""WITH $qMicroCte,
         sc AS (SELECT d.source, qm.q_micro AS qv
                FROM documents d JOIN qm ON d.doc_id = qm.doc_id),
         ps AS (SELECT source, count(*) AS n_docs, sum(qv) AS sum_qm
                FROM sc GROUP BY 1),
         g AS (SELECT sum(n_docs) AS g_n, sum(sum_qm) AS g_sum FROM ps),
         rep AS (SELECT ps.source,
                   ${sqlIdivHalfUp(
        s"ps.sum_qm + 20 * ${sqlIdivHalfUp("g.g_sum", "g.g_n")}",
        "ps.n_docs + 20")} AS shrunk_q_micro
                 FROM ps, g),
         tok AS (SELECT source,
                   sum(CAST(len(CASE WHEN length(trim(text)) = 0
                         THEN []::VARCHAR[]
                         ELSE regexp_split_to_array(trim(text), '\\s+')
                       END) AS BIGINT))::BIGINT AS n_tokens
                 FROM documents GROUP BY 1),
         r AS (SELECT rep.source, rep.shrunk_q_micro, tok.n_tokens,
                 CAST(row_number() OVER
                   (ORDER BY rep.shrunk_q_micro DESC, rep.source ASC)
                   AS INTEGER) AS rank,
                 coalesce(sum(tok.n_tokens) OVER
                   (ORDER BY rep.shrunk_q_micro DESC, rep.source ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0)::BIGINT AS cum_before
               FROM rep JOIN tok USING (source))
         SELECT source, rank, shrunk_q_micro, n_tokens, cum_before,
           greatest(0, least(n_tokens, 50000 - cum_before))
             AS admitted_tokens,
           CASE WHEN greatest(0, least(n_tokens, 50000 - cum_before))
                  = n_tokens THEN 'full'
                WHEN greatest(0, least(n_tokens, 50000 - cum_before))
                  > 0 THEN 'partial'
                ELSE 'excluded' END AS status
         FROM r""",
    // q224: identical prior/log-odds/variance expression order; two
    // top-k windows over the vocabulary-bounded score frame.
    "q224_fightin_words" ->
      """WITH tk AS (SELECT source = 'src0' AS in1, unnest(
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END) AS w
           FROM documents),
         c AS (SELECT w,
                 CAST(sum(CASE WHEN in1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS y1,
                 CAST(sum(CASE WHEN in1 THEN 0 ELSE 1 END) AS BIGINT)
                   AS y2
               FROM tk GROUP BY 1),
         t AS (SELECT sum(y1) AS n1, sum(y2) AS n2 FROM c),
         s AS (SELECT w, y1, y2,
                 CAST(round(
                   (ln((y1 + aw) / (n1 + 1000.0 - y1 - aw))
                    - ln((y2 + aw) / (n2 + 1000.0 - y2 - aw)))
                   / sqrt(1.0 / (y1 + aw) + 1.0 / (y2 + aw))
                   * 1e6) AS BIGINT) AS z_micro
               FROM (SELECT c.*, t.n1, t.n2,
                       1000.0 * (c.y1 + c.y2)::DOUBLE / (t.n1 + t.n2)
                         AS aw
                     FROM c, t) x),
         up AS (SELECT 'src0' AS direction,
                  CAST(row_number() OVER
                    (ORDER BY z_micro DESC, w ASC) AS INTEGER) AS rk,
                  w, y1, y2, z_micro
                FROM s),
         dn AS (SELECT 'rest' AS direction,
                  CAST(row_number() OVER
                    (ORDER BY z_micro ASC, w ASC) AS INTEGER) AS rk,
                  w, y1, y2, z_micro
                FROM s)
         SELECT * FROM up WHERE rk <= 10
         UNION ALL
         SELECT * FROM dn WHERE rk <= 10""",
    // q225: the q203 pair chain joined to both ends' sources; doc_a
    // is the earlier end by construction.
    "q225_copy_flow" ->
      s"""WITH $shinglesCte,
         e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
               WHERE len(sh) > 0),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS inter,
                 any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
               FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
         pr AS (SELECT doc_a, doc_b FROM p
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6) >= 0.5)
         SELECT sa.source AS source_from, sb.source AS source_to,
           count(*) AS n_pairs
         FROM pr
         JOIN documents sa ON pr.doc_a = sa.doc_id
         JOIN documents sb ON pr.doc_b = sb.doc_id
         GROUP BY 1, 2""",
    // q226: the shared gate-flag CTEs rolled to per-doc votes, then
    // the (n_gates, votes, kept) histogram.
    "q226_gate_ensemble" ->
      s"""WITH $gateFlagsCtes,
         v AS (SELECT doc_id, count(*) AS n_gates,
                 CAST(sum(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT)
                   AS votes
               FROM fl GROUP BY 1)
         SELECT n_gates, votes,
           CAST(votes * 2 > n_gates AS INTEGER) AS kept,
           count(*) AS n_docs
         FROM v GROUP BY 1, 2, 3""",
    // q227: the q132 power chain per temperature; identical entropy
    // and ESS expression order, micro/ppm rounding.
    "q227_mix_sweep" ->
      """WITH pl AS (SELECT lang, count(*) AS n_docs
                     FROM documents GROUP BY 1),
         tot AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS tot FROM pl),
         b AS (SELECT lang, n_docs, tot, t.tau,
                 pow(n_docs / tot, t.tau) AS qr
               FROM pl CROSS JOIN tot,
                 (SELECT unnest([0.3, 0.5, 0.7, 1.0]) AS tau) t),
         qs AS (SELECT tau, sum(qr) AS qs FROM b GROUP BY 1),
         w AS (SELECT b.*, (qr / qs.qs) AS q,
                 (qr / qs.qs) / (n_docs / tot) AS w
               FROM b JOIN qs USING (tau))
         SELECT CAST(round(tau * 1000) AS BIGINT) AS tau_permille,
           CAST(round(-sum(q * ln(q)) * 1e6) AS BIGINT)
             AS entropy_micro,
           CAST(round(pow(sum(n_docs * w), 2) * 1e6
             / (sum(n_docs * w * w) * any_value(tot))) AS BIGINT)
             AS ess_ppm
         FROM w GROUP BY tau""",
    // q228: the q53 per-language cumsum, one row per (doc, crossed
    // window); DuckDB's floor `//` matches the truncating cast on
    // the non-negative offsets.
    "q228_pack_spans" ->
      """WITH d AS (
           SELECT doc_id, lang,
             CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END
               AS BIGINT) AS n_tokens
           FROM documents),
         c AS (SELECT doc_id, lang, n_tokens,
                 CAST(sum(n_tokens) OVER
                   (PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum FROM d),
         s AS (SELECT lang, doc_id, cum - n_tokens AS gstart, cum,
                 unnest(range((cum - n_tokens) // 2048,
                              (cum - 1) // 2048 + 1)) AS window_id
               FROM c WHERE n_tokens > 0)
         SELECT lang, window_id, doc_id,
           greatest(gstart, window_id * 2048) - gstart AS tok_start,
           least(cum, (window_id + 1) * 2048)
             - greatest(gstart, window_id * 2048) AS tok_len
         FROM s""",
    // q229: the shared gate-flag CTEs; unique drop = the only
    // dissenting vote among the gates that scored the doc.
    "q229_gate_ablation" ->
      s"""WITH $gateFlagsCtes,
         v AS (SELECT doc_id,
                 CAST(sum(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT)
                   AS votes,
                 count(*) AS n_gates
               FROM fl GROUP BY 1)
         SELECT fl.gate, count(*) AS n_scored,
           CAST(sum(CASE WHEN fl.f THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pass,
           CAST(sum(CASE WHEN NOT fl.f AND v.votes = v.n_gates - 1
             THEN 1 ELSE 0 END) AS BIGINT) AS n_unique_drop
         FROM fl JOIN v USING (doc_id)
         GROUP BY 1""",
    // q230: the q132 rate chain at two alphas over one lang frame
    // (window-sum normalization), one hash-count scan for both cuts.
    "q230_mix_churn" ->
      """WITH pl AS (SELECT lang, count(*) AS n_docs
                     FROM documents GROUP BY 1),
         tot AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS tot FROM pl),
         r AS (SELECT lang, n_docs,
                 CAST(floor(least(1.0,
                   0.5 * tot * (pow(n_docs / tot, 0.3)
                     / sum(pow(n_docs / tot, 0.3)) OVER ())
                   / n_docs) * 1e6) AS BIGINT) AS rate_lo_ppm,
                 CAST(floor(least(1.0,
                   0.5 * tot * (pow(n_docs / tot, 0.7)
                     / sum(pow(n_docs / tot, 0.7)) OVER ())
                   / n_docs) * 1e6) AS BIGINT) AS rate_hi_ppm
               FROM pl CROSS JOIN tot)
         SELECT d.lang, max(r.n_docs) AS n_docs,
           max(r.rate_lo_ppm) AS rate_lo_ppm,
           max(r.rate_hi_ppm) AS rate_hi_ppm,
           CAST(sum(CASE WHEN
             ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT
               % 1000000 < r.rate_lo_ppm THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept_lo,
           CAST(sum(CASE WHEN
             ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT
               % 1000000 < r.rate_hi_ppm THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept_hi,
           abs(CAST(sum(CASE WHEN
             ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT
               % 1000000 < r.rate_hi_ppm THEN 1 ELSE 0 END) AS BIGINT)
             - CAST(sum(CASE WHEN
             ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT
               % 1000000 < r.rate_lo_ppm THEN 1 ELSE 0 END) AS BIGINT))
             AS churn,
           (((2*(abs(CAST(sum(CASE WHEN
             ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT
               % 1000000 < r.rate_hi_ppm THEN 1 ELSE 0 END) AS BIGINT)
             - CAST(sum(CASE WHEN
             ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT
               % 1000000 < r.rate_lo_ppm THEN 1 ELSE 0 END) AS BIGINT))) * 1000000 + (max(r.n_docs))) // (2*(max(r.n_docs))))::BIGINT) AS churn_ppm
         FROM documents d JOIN r USING (lang)
         GROUP BY 1""",
    // q231: the drained online packer must equal the q53 batch
    // cumsum row for row.
    "q231_stream_pack" ->
      """WITH d AS (
           SELECT doc_id, lang,
             CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END
               AS BIGINT) AS n_tokens
           FROM documents),
         c AS (SELECT d.*, CAST(sum(n_tokens) OVER
                 (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_tokens FROM d)
         SELECT doc_id, lang, n_tokens, cum_tokens,
           (cum_tokens - n_tokens) // 2048 AS window_id
         FROM c""",
    // q232: the q75 content-hash shard key, token rollup, even-share
    // ratio in ppm.
    "q232_shard_balance" ->
      s"""WITH d AS (
           SELECT CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))
               ::BIGINT % 8 AS INTEGER) AS shard,
             CAST(len(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END)
               AS BIGINT) AS t
           FROM documents),
         s AS (SELECT shard, count(*) AS n_docs,
                 sum(t)::BIGINT AS n_tokens
               FROM d GROUP BY 1),
         g AS (SELECT sum(n_tokens) AS g_tokens FROM s)
         SELECT shard, n_docs, n_tokens,
           ${sqlMicroRatio(
        "n_tokens",
        sqlIdivHalfUp("g_tokens", "8"))} AS balance_ppm
         FROM s, g""",
    // q233: bucket = bit-length - 1 via the binary string (integer-
    // exact at powers of two); cap via integer shift on both sides.
    "q233_batch_shape" ->
      s"""WITH d AS (
           SELECT CAST(len(CASE WHEN length(trim(text)) = 0
                THEN []::VARCHAR[]
                ELSE regexp_split_to_array(trim(text), '\\s+') END)
             AS BIGINT) AS n
           FROM documents),
         b AS (SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS bucket, n
               FROM d WHERE n >= 1),
         r AS (SELECT bucket, count(*) AS n_docs,
                 sum(n)::BIGINT AS sum_tokens
               FROM b GROUP BY 1)
         SELECT bucket, n_docs, sum_tokens,
           CAST(1 << CAST(bucket + 1 AS INTEGER) AS BIGINT) AS cap,
           n_docs * CAST(1 << CAST(bucket + 1 AS INTEGER) AS BIGINT)
             AS padded_tokens,
           ${sqlMicroRatio(
        """n_docs * CAST(1 << CAST(bucket + 1 AS INTEGER) AS BIGINT)
               - sum_tokens""",
        "n_docs * CAST(1 << CAST(bucket + 1 AS INTEGER) AS BIGINT)")}
             AS waste_ppm
         FROM r""",
    // q234: per-(label, dim) moment cells, identical F expression
    // order on the rollup.
    "q234_label_separability" ->
      """WITH cells AS (
           SELECT label, CAST(u.i AS INTEGER) AS dim,
             count(*) AS n,
             sum(u.x) AS s1,
             sum(u.x * u.x) AS s2
           FROM (SELECT label,
                   unnest(list_transform(range(len(embedding)),
                     i -> {'i': i, 'x': embedding[i+1]::DOUBLE})) AS u
                 FROM embeddings) t
           GROUP BY 1, 2),
         r AS (SELECT dim, count(*) AS g, sum(n) AS bign,
                 sum(s1) AS t,
                 sum(s1 * s1 / n) AS sw,
                 sum(s2) AS ss
               FROM cells GROUP BY 1)
         SELECT CAST(dim AS BIGINT) AS dim,
           CAST(g AS BIGINT) AS n_labels,
           CAST(round(((sw - t * t / bign) / (g - 1))
             / ((ss - sw) / (bign - g)) * 1e6) AS BIGINT) AS f_micro
         FROM r""",
    // q235: same prefix-block window; LCP from the first mismatch in
    // the null-padded zip. list_position's not-found result is
    // version-dependent (0 in DuckDB 1.0, NULL in others) — nullif
    // folds both to the equal-arrays fallback (min length).
    "q235_sorted_neighbors" ->
      """WITH d AS (
           SELECT doc_id, toks AS t,
             array_to_string(toks[1:5], ' ') AS block
           FROM (SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\s+') END
                     AS toks
                 FROM documents) x
           WHERE len(toks) >= 5),
         w AS (SELECT doc_id, t,
                 lag(doc_id) OVER
                   (PARTITION BY block ORDER BY t, doc_id) AS prev_id,
                 lag(t) OVER
                   (PARTITION BY block ORDER BY t, doc_id) AS prev_t
               FROM d),
         p AS (SELECT doc_id, prev_id,
                 coalesce(
                   nullif(list_position(list_transform(list_zip(t, prev_t),
                     z -> z[1] IS NOT DISTINCT FROM z[2]), false), 0) - 1,
                   least(len(t), len(prev_t))) AS lcp
               FROM w WHERE prev_id IS NOT NULL)
         SELECT least(prev_id, doc_id) AS doc_a,
           greatest(prev_id, doc_id) AS doc_b,
           CAST(lcp AS BIGINT) AS lcp
         FROM p WHERE lcp >= 5""",
    // q236: rank within label, batch = rank - 1.
    "q236_balanced_batches" ->
      """SELECT vec_id, label,
         CAST(row_number() OVER
           (PARTITION BY label ORDER BY vec_id) - 1 AS BIGINT)
           AS batch_id
         FROM embeddings""",
    // q237: identical age arithmetic (epoch micros), identical decay
    // expression order, sums rounded to 6.
    "q237_decay_counts" ->
      """WITH r AS (SELECT max(ts) AS ref FROM events),
         a AS (SELECT event_type,
                 (epoch_us(r.ref) - epoch_us(ts))::DOUBLE / 1e6 AS age_s,
                 h.half_life_s
               FROM events CROSS JOIN r,
                 (SELECT unnest([3600, 21600, 86400]) AS half_life_s) h)
         SELECT event_type, CAST(half_life_s AS BIGINT) AS half_life_s,
           count(*) AS n_events,
           round(sum(exp(-ln(2) * age_s / half_life_s)), 6)
             AS decayed_count
         FROM a GROUP BY 1, 2""",
    // q238: q93's unrolled Lloyd CTEs → contingency table → exact
    // integer comb terms; the two final divisions are over exact
    // integers so the double results are IEEE-identical.
    "q238_cluster_ari" ->
      s"""WITH $kmeansCtes,
         asg AS (SELECT vec_id, cluster FROM a3 WHERE rn = 1),
         ct AS (SELECT cluster, l.label, count(*)::BIGINT AS n_ij
                FROM asg JOIN embeddings l USING (vec_id)
                GROUP BY 1, 2),
         cells AS (SELECT sum(n_ij * (n_ij - 1) // 2)::BIGINT AS comb_cells,
                     sum(n_ij)::BIGINT AS n,
                     count(DISTINCT cluster)::BIGINT AS n_clusters,
                     count(DISTINCT label)::BIGINT AS n_labels
                   FROM ct),
         ra AS (SELECT sum(a * (a - 1) // 2)::BIGINT AS comb_a
                FROM (SELECT sum(n_ij) AS a FROM ct GROUP BY cluster)),
         cb AS (SELECT sum(b * (b - 1) // 2)::BIGINT AS comb_b
                FROM (SELECT sum(n_ij) AS b FROM ct GROUP BY label))
         SELECT n, n_clusters, n_labels, comb_cells, comb_a, comb_b,
           CAST(round(
             (comb_cells - comb_a::DOUBLE * comb_b / (n * (n - 1) // 2))
             / ((comb_a + comb_b) / 2.0
                - comb_a::DOUBLE * comb_b / (n * (n - 1) // 2)) * 1e6)
             AS BIGINT) AS ari_micro
         FROM cells, ra, cb""",
    // q239: same rounded per-(label,dim) sum cells; global sums
    // derived from the SAME rounded per-label cells.
    "q239_isotropy" ->
      """WITH u AS (SELECT label::BIGINT AS label,
                 list_transform(embedding, x -> x::DOUBLE /
                   sqrt(list_sum(list_transform(embedding,
                     y -> y::DOUBLE * y::DOUBLE)))) AS uv
               FROM embeddings
               WHERE list_sum(list_transform(embedding,
                 y -> y::DOUBLE * y::DOUBLE)) > 0),
         cells AS (SELECT label, CAST(s.i AS INTEGER) AS dim,
                     round(sum(s.v), 6) AS s
                   FROM (SELECT label,
                           unnest(list_transform(range(len(uv)),
                             i -> {'i': i, 'v': uv[i + 1]})) AS s
                         FROM u) x
                   GROUP BY 1, 2),
         nl AS (SELECT label, count(*)::BIGINT AS n FROM u GROUP BY 1),
         per_label AS (SELECT c.label, nl.n,
                         sum(c.s * c.s) AS ss
                       FROM cells c JOIN nl USING (label)
                       GROUP BY 1, 2),
         gl AS (SELECT -1::BIGINT AS label,
                  (SELECT count(*)::BIGINT FROM u) AS n,
                  sum(sg * sg) AS ss
                FROM (SELECT dim, sum(s) AS sg FROM cells GROUP BY 1))
         SELECT label, n,
           CAST(round((ss - n) / (n * (n - 1)) * 1e6) AS BIGINT)
             AS mean_cos_micro
         FROM (SELECT * FROM per_label UNION ALL SELECT * FROM gl)""",
    // q241: the power iteration unrolled — per-round CTEs with the
    // same round-to-6 points (mu, per-vec dots, z, normalized v).
    "q241_pc1_power" -> {
      val roundCtes = (1 to 4)
        .map { r =>
          val pv = if (r == 1) "v0" else s"v${r - 1}"
          s"""s$r AS (SELECT vec_id, round(sum(xc * v), 6) AS s
               FROM cells JOIN $pv USING (dim) GROUP BY 1),
             z$r AS (SELECT dim,
                 round(sum(s * xc) / (SELECT n FROM nn), 6) AS z
               FROM cells JOIN s$r USING (vec_id) GROUP BY 1),
             v$r AS (SELECT dim,
                 round(z / sqrt((SELECT sum(z * z) FROM z$r)), 6) AS v
               FROM z$r)"""
        }
        .mkString(",\n")
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         xp AS (SELECT vec_id, CAST(s.i AS INTEGER) AS dim,
                  s.v::DOUBLE AS x
                FROM (SELECT vec_id,
                        unnest(list_transform(range(len(embedding)),
                          i -> {'i': i, 'v': embedding[i + 1]})) AS s
                      FROM e) t),
         mu AS (SELECT dim, round(avg(x), 6) AS m FROM xp GROUP BY 1),
         cells AS MATERIALIZED (SELECT vec_id, xp.dim, x - m AS xc
                                FROM xp JOIN mu USING (dim)),
         nn AS (SELECT count(*)::BIGINT AS n FROM e),
         v0 AS (SELECT dim,
                  round(1.0 / sqrt((SELECT count(*) FROM mu)), 6) AS v
                FROM mu),
         $roundCtes,
         sf AS (SELECT vec_id, round(sum(xc * v), 6) AS s
                FROM cells JOIN v4 USING (dim) GROUP BY 1),
         lam AS (SELECT sum(s * s) / (SELECT n FROM nn) AS lambda
                 FROM sf),
         tot AS (SELECT sum(xc * xc) / (SELECT n FROM nn) AS totvar
                 FROM cells)
         SELECT dim, v AS pc1,
           CAST(round(lambda * 1e6) AS BIGINT) AS lambda_micro,
           CAST(round(lambda / totvar * 1e6) AS BIGINT)
             AS var_share_micro
         FROM v4, lam, tot"""
    },
    // q242: both rank lists replayed (q24's exact form at depth 5 and
    // q106's probe-2 form verbatim), same head weights as literals.
    "q242_rank_rbo" -> {
      val pairCos = cosSql("q_vec", "e.embedding")
      val wLit = (1 to 5)
        .map(d => math.pow(0.9, d - 1) * (1 - 0.9))
        .mkString("[", ", ", "]")
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec
                FROM embeddings WHERE vec_id < 3),
         ex AS (SELECT q_id, vec_id, rk_a
                FROM (SELECT q_id, vec_id,
                        row_number() OVER (PARTITION BY q_id
                          ORDER BY sim DESC, vec_id ASC) AS rk_a
                      FROM (SELECT q_id, e.vec_id, $pairCos AS sim
                            FROM embeddings e, q) s) t
                WHERE rk_a <= 5),
         c AS (SELECT vec_id AS cid, embedding AS c_vec
               FROM embeddings WHERE vec_id < 8),
         sims AS (SELECT e.vec_id, e.embedding, c.cid,
                    ${cosSql("c_vec", "embedding")} AS csim
                  FROM embeddings e, c),
         asg AS (SELECT vec_id, embedding, cid
                 FROM (SELECT vec_id, embedding, cid,
                         row_number() OVER (PARTITION BY vec_id
                           ORDER BY csim DESC, cid ASC) AS rk
                       FROM sims) t WHERE rk = 1),
         qp AS (SELECT vec_id AS q_id, embedding AS q_vec, cid
                FROM (SELECT vec_id, embedding, cid,
                        row_number() OVER (PARTITION BY vec_id
                          ORDER BY csim DESC, cid ASC) AS crk
                      FROM sims WHERE vec_id < 3) t WHERE crk <= 2),
         ap AS (SELECT q_id, vec_id, rk_b
                FROM (SELECT q_id, vec_id,
                        row_number() OVER (PARTITION BY q_id
                          ORDER BY sim DESC, vec_id ASC) AS rk_b
                      FROM (SELECT qp.q_id, a.vec_id,
                              ${cosSql("q_vec", "a.embedding")} AS sim
                            FROM asg a JOIN qp ON a.cid = qp.cid) s) t
                WHERE rk_b <= 5),
         j AS (SELECT coalesce(a.q_id, b.q_id) AS q_id, a.rk_a, b.rk_b
               FROM ex a FULL OUTER JOIN ap b
                 ON a.q_id = b.q_id AND a.vec_id = b.vec_id),
         ov AS (SELECT q_id, dd.d, count(*)::BIGINT AS a_d
                FROM j, (SELECT unnest([1, 2, 3, 4, 5]) AS d) dd
                WHERE rk_a <= dd.d AND rk_b <= dd.d GROUP BY 1, 2),
         sc AS (SELECT q_id,
                  max(CASE WHEN d = 5 THEN a_d END) AS overlap_k,
                  CAST(round(sum($wLit[d] * a_d / d) * 1e6) AS BIGINT)
                    AS rbo_micro
                FROM ov GROUP BY 1)
         SELECT q.q_id, coalesce(overlap_k, 0)::BIGINT AS overlap_k,
           coalesce(rbo_micro, 0)::BIGINT AS rbo_micro
         FROM q LEFT JOIN sc USING (q_id)"""
    },
    // q243: same tokenizer CASE, same global order, the pacing
    // arithmetic in the same left-to-right association.
    "q243_curriculum" ->
      """WITH d AS (SELECT doc_id,
             (CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\s+'))
              END)::BIGINT AS n_tokens
           FROM documents),
         r AS (SELECT doc_id, n_tokens,
                 row_number() OVER (ORDER BY n_tokens, doc_id)::BIGINT
                   AS rank,
                 (SELECT count(*)::BIGINT FROM d) AS n
               FROM d)
         SELECT doc_id, n_tokens, rank,
           CAST(ceil((rank - 1)::DOUBLE / greatest(n - 1, 1)
             * (rank - 1) / greatest(n - 1, 1) * 10000) AS BIGINT)
             AS entry_step
         FROM r""",
    // q244: all-pairs cosine (self excluded), top-5 by the same
    // (sim DESC, id ASC) rank, consensus threshold on the count.
    "q244_label_consensus" -> {
      val centCos = cosSql("c_vec", "embedding")
      val pairCos = cosSql("e.embedding", "r.r_vec")
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS c_vec
                FROM embeddings WHERE vec_id < 8),
         sims AS (SELECT e.vec_id, e.embedding, e.label, c.cid,
                    $centCos AS csim
                  FROM embeddings e, c),
         asg AS (SELECT vec_id, embedding, label, cid
                 FROM (SELECT vec_id, embedding, label, cid,
                         row_number() OVER (PARTITION BY vec_id
                           ORDER BY csim DESC, cid ASC) AS rk
                       FROM sims) t WHERE rk = 1),
         r AS (SELECT cid, vec_id AS r_id, embedding AS r_vec,
                 label AS r_label FROM asg),
         s AS (SELECT e.vec_id, e.label, r.r_id, r.r_label,
                 $pairCos AS sim
               FROM asg e JOIN r
                 ON e.cid = r.cid AND e.vec_id <> r.r_id),
         t AS (SELECT vec_id, label, r_label,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY sim DESC, r_id ASC) AS rk
               FROM s)
         SELECT vec_id, label,
           sum(CASE WHEN r_label = label THEN 1 ELSE 0 END)::BIGINT
             AS n_agree,
           sum(CASE WHEN r_label = label THEN 1 ELSE 0 END) < 2
             AS suspect
         FROM t WHERE rk <= 5 GROUP BY 1, 2"""
    },
    // q245: the same md5 within-source shuffle key, then the
    // interleaving (src_rank, source, doc_id) total order.
    "q245_source_interleave" ->
      """WITH r AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)::BIGINT
               AS src_rank
           FROM documents)
         SELECT doc_id, source, src_rank,
           row_number() OVER (ORDER BY src_rank, source, doc_id)::BIGINT
             AS pos
         FROM r""",
    // q246: q140's winnow CTEs verbatim; the pair predicate swaps
    // the >= 2 count floor for the cross-language condition.
    "q246_crosslang_dups" ->
      """WITH t AS (SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
           FROM documents),
         g AS (SELECT doc_id, len(toks) - 2 AS ng,
                 unnest(list_transform(range(len(toks) - 2),
                   i -> {'pos': i,
                         'h': ('0x' || substr(md5(toks[i+1] || ' ' ||
                            toks[i+2] || ' ' || toks[i+3]), 1, 15))::BIGINT}))
                   AS s
               FROM t WHERE len(toks) >= 3),
         wm AS (SELECT doc_id, ng, s.pos AS pos,
                  min(s.h) OVER (PARTITION BY doc_id ORDER BY s.pos
                    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh
                FROM g),
         fp AS MATERIALIZED (SELECT DISTINCT doc_id, mh FROM wm
               WHERE pos <= greatest(ng - 4, 0)),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*)::BIGINT AS n_shared
                FROM fp a JOIN fp b
                  ON a.mh = b.mh AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
         SELECT doc_a, doc_b, la.lang AS lang_a, lb.lang AS lang_b,
           n_shared
         FROM pr
         JOIN documents la ON pr.doc_a = la.doc_id
         JOIN documents lb ON pr.doc_b = lb.doc_id
         WHERE la.lang <> lb.lang""",
    // q247: the same (x, doc_id) rank; every Gini term is an exact
    // integer until the two final divisions.
    "q247_source_gini" ->
      """WITH d AS (SELECT doc_id, source,
             (CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\s+'))
              END)::BIGINT AS x
           FROM documents),
         r AS (SELECT source, x,
                 row_number() OVER (PARTITION BY source
                   ORDER BY x, doc_id)::BIGINT AS i
               FROM d)
         SELECT source, count(*)::BIGINT AS n_docs,
           sum(x)::BIGINT AS total_tokens,
           (CASE WHEN ((2 * sum(i * x) - (count(*) + 1) * sum(x)) * 1000000) < 0 THEN -(((2*(-((2 * sum(i * x) - (count(*) + 1) * sum(x)) * 1000000)) + (count(*) * nullif(sum(x), 0))) // (2*(count(*) * nullif(sum(x), 0))))::BIGINT) ELSE (((2*((2 * sum(i * x) - (count(*) + 1) * sum(x)) * 1000000) + (count(*) * nullif(sum(x), 0))) // (2*(count(*) * nullif(sum(x), 0))))::BIGINT) END)
             AS gini_micro
         FROM r GROUP BY 1""",
    // q248: the q93 CTEs + contingency table; majority via the same
    // (n_ij DESC, label ASC) rank; entropy in micro-units.
    "q248_cluster_purity" ->
      s"""WITH $kmeansCtes,
         asg AS (SELECT vec_id, cluster FROM a3 WHERE rn = 1),
         ct AS (SELECT cluster, l.label, count(*)::BIGINT AS n_ij
                FROM asg JOIN embeddings l USING (vec_id)
                GROUP BY 1, 2),
         x AS (SELECT cluster, label, n_ij,
                 row_number() OVER (PARTITION BY cluster
                   ORDER BY n_ij DESC, label ASC) AS rk,
                 sum(n_ij) OVER (PARTITION BY cluster) AS size
               FROM ct)
         SELECT cluster, max(size)::BIGINT AS size,
           max(CASE WHEN rk = 1 THEN label END) AS majority_label,
           max(CASE WHEN rk = 1 THEN n_ij END)::BIGINT AS n_majority,
           (((2*(max(CASE WHEN rk = 1 THEN n_ij END)) * 1000000
             + (max(size))) // (2*(max(size))))::BIGINT) AS purity_micro,
           CAST(round(sum(-(n_ij::DOUBLE / size)
             * ln(n_ij::DOUBLE / size)) * 1e6) AS BIGINT)
             AS entropy_micro
         FROM x GROUP BY 1""",
    // q249: average ranks from the same (value, doc_id) row_numbers;
    // identical raw-moment formulas on both sides.
    "q249_length_quality_corr" ->
      s"""WITH $qMicroCte,
         d AS (SELECT doc_id,
                 (CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                  END)::BIGINT AS x
               FROM documents),
         b AS (SELECT d.doc_id, d.x, q2.q_micro AS y
               FROM d JOIN qm q2 USING (doc_id)),
         rx0 AS (SELECT x, row_number() OVER (ORDER BY x, doc_id)::BIGINT
                   AS rn FROM b),
         rxa AS (SELECT x, avg(rn) AS rx FROM rx0 GROUP BY 1),
         ry0 AS (SELECT y, row_number() OVER (ORDER BY y, doc_id)::BIGINT
                   AS rn FROM b),
         rya AS (SELECT y, avg(rn) AS ry FROM ry0 GROUP BY 1),
         j AS (SELECT b.x, b.y, rxa.rx, rya.ry
               FROM b JOIN rxa USING (x) JOIN rya USING (y)),
         s AS (SELECT count(*)::BIGINT AS n,
                 sum(rx) AS srx, sum(ry) AS sry,
                 sum(rx * rx) AS srx2, sum(ry * ry) AS sry2,
                 sum(rx * ry) AS srxy,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sx2,
                 CAST(sum(y * y) AS BIGINT) AS sy2,
                 CAST(sum(x * y) AS BIGINT) AS sxy
               FROM j)
         SELECT n,
           CAST(round((n * srxy - srx * sry)
             / (sqrt(n * srx2 - srx * srx) * sqrt(n * sry2 - sry * sry))
             * 1e6) AS BIGINT) AS spearman_micro,
           CAST(round((n::DOUBLE * sxy - sx::DOUBLE * sy)
             / (sqrt(n::DOUBLE * sx2 - sx::DOUBLE * sx)
                * sqrt(n::DOUBLE * sy2 - sy::DOUBLE * sy))
             * 1e6) AS BIGINT) AS pearson_micro
         FROM s""",
    // q250: same tokenizer CASE, ceil-chunk arithmetic on exact
    // integers, the ppm division in the same order.
    "q250_padding_curve" ->
      """WITH d AS (SELECT
             (CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\s+'))
              END)::BIGINT AS n
           FROM documents),
         x AS (SELECT n, l.len
               FROM (SELECT n FROM d WHERE n > 0) d2,
                 (SELECT unnest([512, 1024, 2048, 4096]::BIGINT[])
                    AS len) l),
         w AS (SELECT len, n,
                 CAST(ceil(n::DOUBLE / len) AS BIGINT) AS nw FROM x)
         SELECT len, count(*)::BIGINT AS n_docs,
           sum(n)::BIGINT AS total_tokens,
           sum(nw)::BIGINT AS n_windows,
           sum(nw * len - n)::BIGINT AS padded_tokens,
           (((2*(sum(nw * len - n)) * 1000000 + (sum(nw) * len)) // (2*(sum(nw) * len)))::BIGINT) AS waste_ppm
         FROM w GROUP BY len""",
    // q251: identical translate() alphabets and threshold order.
    "q251_content_type" ->
      """SELECT doc_id, n_chars, sym_ppm, digit_ppm,
         CASE WHEN n_chars = 0 THEN 'empty'
              WHEN sym_ppm >= 20000 THEN 'code'
              WHEN digit_ppm >= 50000 THEN 'numeric'
              ELSE 'prose' END AS content_class
         FROM (SELECT doc_id, length(text)::BIGINT AS n_chars,
                 CASE WHEN length(text) = 0 THEN 0
                      ELSE (((2*(length(text) - length(translate(text, '{}();=<>[]', ''))) * 1000000 + (length(text))) // (2*(length(text))))::BIGINT) END AS sym_ppm,
                 CASE WHEN length(text) = 0 THEN 0
                      ELSE (((2*(length(text) - length(translate(text, '0123456789', ''))) * 1000000 + (length(text))) // (2*(length(text))))::BIGINT) END AS digit_ppm
               FROM documents) t""",
    // q252: same tokenizer, same [.!?]+ / [aeiouy]+ run counts, the
    // vowel-less word floor via the same list filter.
    "q252_readability" ->
      """WITH t AS (SELECT doc_id, text,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+')
             END AS toks
           FROM documents),
         m AS (SELECT doc_id,
                 len(toks)::BIGINT AS n_words,
                 greatest(len(regexp_extract_all(text, '[.!?]+'))::BIGINT,
                   1) AS n_sentences,
                 (len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  + len(list_filter(toks, w ->
                      NOT regexp_matches(lower(w), '[aeiouy]'))))::BIGINT
                   AS n_syllables
               FROM t)
         SELECT doc_id, n_words, n_sentences, n_syllables,
           (206835000 - (((2*(1015000 * n_words) + (n_sentences)) // (2*(n_sentences)))::BIGINT) - (((2*(84600000 * n_syllables) + (n_words)) // (2*(n_words)))::BIGINT))
             AS flesch_micro
         FROM m WHERE n_words > 0""",
    // q253: the shared shingle CTE; buckets via the same floor
    // division; exact-integer novelty arithmetic.
    "q253_novelty_decay" ->
      s"""WITH $shinglesCte,
         p AS (SELECT DISTINCT doc_id // 50 AS b, s AS sh
               FROM (SELECT doc_id, unnest(sh) AS s FROM d) x),
         f AS (SELECT sh, min(b) AS first_b FROM p GROUP BY 1)
         SELECT b, count(*)::BIGINT AS n_distinct,
           sum(CASE WHEN first_b = b THEN 1 ELSE 0 END)::BIGINT AS n_new,
           (((2*(sum(CASE WHEN first_b = b THEN 1 ELSE 0 END)) * 1000000 + (count(*))) // (2*(count(*))))::BIGINT) AS novelty_ppm
         FROM p JOIN f USING (sh) GROUP BY 1""",
    // q254: identical trailing-24-rows frame; mean/variance from the
    // same integer window sums; NULL guards via the same k/s2 nulls.
    "q254_burst_flags" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour,
                 count(*)::BIGINT AS n
               FROM events GROUP BY 1, 2),
         w AS (SELECT event_type, hour, n,
                 count(*) OVER tw AS k, sum(n) OVER tw AS s,
                 sum(n * n) OVER tw AS s2
               FROM h WINDOW tw AS (PARTITION BY event_type
                 ORDER BY hour ROWS BETWEEN 24 PRECEDING
                 AND 1 PRECEDING))
         SELECT event_type, epoch_us(hour)::BIGINT AS hour_us, n,
           k::BIGINT AS n_prev,
           CASE WHEN k >= 12
                 AND (s2::DOUBLE - s::DOUBLE * s / k) / k > 0
                THEN CAST(round((n - s::DOUBLE / k)
                  / sqrt((s2::DOUBLE - s::DOUBLE * s / k) / k) * 1e6)
                  AS BIGINT) END AS z_micro,
           coalesce(k >= 12
             AND (s2::DOUBLE - s::DOUBLE * s / k) / k > 0
             AND (n - s::DOUBLE / k)
               / sqrt((s2::DOUBLE - s::DOUBLE * s / k) / k) > 3.0,
             false) AS burst
         FROM w""",
    // q255: same top-1000 vocabulary, dense grid with zero counts,
    // add-one smoothing and the identical JS term order.
    "q255_source_style" ->
      """WITH tk AS (SELECT source,
             unnest(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+')
                    END) AS term
           FROM documents),
         vc AS (SELECT term FROM (SELECT term, count(*) AS cnt
                 FROM tk GROUP BY 1
                 ORDER BY cnt DESC, term ASC LIMIT 1000)),
         vs AS (SELECT count(*)::BIGINT AS v FROM vc),
         cnts AS (SELECT source, term, count(*)::BIGINT AS c
                  FROM tk JOIN vc USING (term) GROUP BY 1, 2),
         srcs AS (SELECT DISTINCT source FROM tk),
         dense AS (SELECT s.source, v.term, coalesce(c.c, 0) AS c
                   FROM srcs s CROSS JOIN vc v
                   LEFT JOIN cnts c
                     ON c.source = s.source AND c.term = v.term),
         tot AS (SELECT source, sum(c)::BIGINT AS tot FROM dense
                 GROUP BY 1),
         pr AS (SELECT d.source, d.term,
                  (d.c + 1)::DOUBLE / (t.tot + vs.v) AS p
                FROM dense d JOIN tot t USING (source), vs),
         pairs AS (SELECT a.source AS source_a, b.source AS source_b,
                     a.p AS p, b.p AS q
                   FROM pr a JOIN pr b
                     ON a.term = b.term AND a.source < b.source)
         SELECT source_a, source_b,
           CAST(round(sum(p / 2 * ln(p / ((p + q) / 2))
             + q / 2 * ln(q / ((p + q) / 2))) * 1e6) AS BIGINT)
             AS js_micro
         FROM pairs GROUP BY 1, 2""",
    // q256: same 2-token edges (1-based inclusive slices), same
    // count floor and (n_docs DESC, snippet ASC) top-10 rank.
    "q256_boilerplate_edges" ->
      """WITH t AS (SELECT source,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+')
             END AS toks
           FROM documents),
         e AS (SELECT source, 'prefix' AS kind,
                 array_to_string(toks[1:2], ' ') AS snippet
               FROM t WHERE len(toks) >= 2
               UNION ALL
               SELECT source, 'suffix' AS kind,
                 array_to_string(toks[len(toks)-1:len(toks)], ' ')
                   AS snippet
               FROM t WHERE len(toks) >= 2),
         c AS (SELECT source, kind, snippet, count(*)::BIGINT AS n_docs
               FROM e GROUP BY 1, 2, 3),
         r AS (SELECT source, kind, snippet, n_docs,
                 CAST(row_number() OVER (PARTITION BY source, kind
                   ORDER BY n_docs DESC, snippet ASC) AS INTEGER) AS rk
               FROM c WHERE n_docs >= 2)
         SELECT source, kind, snippet, n_docs, rk
         FROM r WHERE rk <= 10""",
    // q257: per-(user, type) counts, user totals, the same entropy
    // term order (sum of -p·ln p over the type rows).
    "q257_user_profile" ->
      """WITH ut AS (SELECT user_id, event_type, count(*)::BIGINT AS c
               FROM events GROUP BY 1, 2),
         w AS (SELECT user_id, c,
                 sum(c) OVER (PARTITION BY user_id)::BIGINT AS tot
               FROM ut)
         SELECT user_id, max(tot)::BIGINT AS n_events,
           count(*)::BIGINT AS n_types,
           CAST(round(sum(-(c::DOUBLE / tot) * ln(c::DOUBLE / tot))
             * 1e6) AS BIGINT) AS entropy_micro
         FROM w GROUP BY 1""",
    // q258: one window cumsum in the oracle stands in for the
    // engine's two-level form (same order keys, same totals); the
    // decile probe is the identical integer boundary test.
    "q258_token_deciles" -> {
      s"""WITH $qMicroCte,
         d0 AS (SELECT doc_id,
                  (CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text),
                          '\\s+'))
                   END)::BIGINT AS n
                FROM documents),
         b AS (SELECT d0.doc_id, q2.q_micro AS q, n
               FROM d0 JOIN qm q2 USING (doc_id) WHERE n > 0),
         c AS (SELECT doc_id, q, n,
                 sum(n) OVER (ORDER BY q, doc_id)::BIGINT AS cum
               FROM b),
         t AS (SELECT sum(n)::BIGINT AS tot FROM b),
         x AS (SELECT dec.d, c.cum, c.doc_id, c.q
               FROM c, t,
                 (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS d) dec
               WHERE c.cum * 10 >= dec.d * t.tot),
         m AS (SELECT d, min(cum) AS mcum FROM x GROUP BY 1)
         SELECT x.d::BIGINT AS decile, x.cum AS cum_tokens, x.doc_id,
           x.q AS q_micro
         FROM x JOIN m ON x.d = m.d AND x.cum = m.mcum"""
    },
    // q259: same bucket floor-div, rounded bucket means, identical
    // OLS term order over exact integer bucket indices.
    "q259_quality_drift" ->
      s"""WITH $qMicroCte,
         s AS (SELECT d.doc_id, d.source, d.doc_id // 50 AS b,
                 q2.q_micro AS q
               FROM documents d JOIN qm q2 USING (doc_id)),
         bm AS (SELECT source, b,
                  ${sqlIdivHalfUp("sum(q)", "count(*)")} AS mqm
                FROM s GROUP BY 1, 2),
         ag AS (SELECT source, count(*)::BIGINT AS n,
                  sum(b)::BIGINT AS sx, sum(mqm)::BIGINT AS sy,
                  sum(b * b)::BIGINT AS sx2, sum(b * mqm)::BIGINT AS sxy
                FROM bm GROUP BY 1)
         SELECT source, n AS n_buckets,
           ${sqlIdivHalfUp("sy", "n")} AS mean_q_micro,
           CASE WHEN n > 1 AND (n * sx2 - sx * sx) <> 0 THEN
             ${sqlIdivHalfUpSigned("n * sxy - sx * sy",
        "n * sx2 - sx * sx")}
           END AS slope_micro_per_bucket
         FROM ag""",
    // q260: the same left-to-right square fold for norms, isnan/isinf
    // element filters, and the value-grouped duplicate count.
    "q260_embedding_integrity" ->
      """WITH pr AS (SELECT label,
             sqrt(list_sum(list_transform(embedding,
               x -> x::DOUBLE * x::DOUBLE))) AS nrm,
             list_sum(list_transform(embedding,
               x -> x::DOUBLE * x::DOUBLE)) = 0 AS is_zero,
             len(list_filter(embedding,
               x -> isnan(x) OR isinf(x))) > 0 AS nonfinite
           FROM embeddings),
         dp AS (SELECT label,
                  sum(CASE WHEN n_copies >= 2 THEN n_copies ELSE 0
                      END)::BIGINT AS n_dup_vectors
                FROM (SELECT label, embedding,
                        count(*)::BIGINT AS n_copies
                      FROM embeddings GROUP BY 1, 2) g
                GROUP BY 1),
         ag AS (SELECT label, count(*)::BIGINT AS n_vecs,
                  sum(CASE WHEN is_zero THEN 1 ELSE 0 END)::BIGINT
                    AS n_zero_norm,
                  sum(CASE WHEN nonfinite THEN 1 ELSE 0 END)::BIGINT
                    AS n_nonfinite,
                  min(CAST(round(nrm * 1e6) AS BIGINT))
                    AS min_norm_micro,
                  (((2*(sum(CAST(round(nrm * 1e6) AS BIGINT))) + (count(*))) // (2*(count(*))))::BIGINT)
                    AS mean_norm_micro,
                  max(CAST(round(nrm * 1e6) AS BIGINT))
                    AS max_norm_micro
                FROM pr GROUP BY 1)
         SELECT ag.label, n_vecs, n_zero_norm, n_nonfinite,
           dp.n_dup_vectors, min_norm_micro, mean_norm_micro,
           max_norm_micro
         FROM ag JOIN dp USING (label)""",
    // q261: same (us, event_id) lag order; gap moments as integer
    // sums (squares cast per-term to double); identical CV² order.
    "q261_interarrival" ->
      s"""WITH e AS (SELECT event_id, event_type,
                 epoch_us(ts)::BIGINT AS us FROM events),
         g AS (SELECT event_type,
                 us - lag(us) OVER (PARTITION BY event_type
                   ORDER BY us, event_id) AS gap
               FROM e),
         f AS (SELECT event_type, gap FROM g WHERE gap IS NOT NULL)
         SELECT event_type, count(*)::BIGINT AS n_gaps,
           ${sqlIdivHalfUp("sum(gap) * 1000", "count(*)")}
             AS mean_gap_us_milli,
           CAST(round(((sum(gap::DOUBLE * gap)
               - sum(gap)::DOUBLE * sum(gap) / count(*)) / count(*))
             / ((sum(gap)::DOUBLE / count(*))
                * (sum(gap)::DOUBLE / count(*))) * 1e6) AS BIGINT)
             AS cv2_micro
         FROM f GROUP BY 1""",
    // q262: the same (us, event_id) lag order; probabilities are
    // single divisions of exact counts.
    "q262_event_transitions" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                 epoch_us(ts)::BIGINT AS us FROM events),
         t AS (SELECT user_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY us, event_id) AS prev
               FROM e),
         c AS (SELECT prev AS from_type, event_type AS to_type,
                 count(*)::BIGINT AS n
               FROM t WHERE prev IS NOT NULL GROUP BY 1, 2),
         w AS (SELECT from_type, to_type, n,
                 sum(n) OVER (PARTITION BY from_type)::BIGINT AS rt
               FROM c)
         SELECT from_type, to_type, n,
           (((2*(n) * 1000000 + (rt)) // (2*(rt)))::BIGINT) AS p_micro
         FROM w""",
    // q263: exact-integer label counts; the same least(cap, ...)
    // weight, expected-count and share formulas.
    "q263_oversampling_plan" ->
      """WITH c AS (SELECT label, count(*)::BIGINT AS n
               FROM embeddings GROUP BY 1),
         t AS (SELECT sum(n)::BIGINT AS bign, count(*)::BIGINT AS k
               FROM c),
         w AS (SELECT label, n,
                 least(10000000, (((2*(bign) * 1000000 + (k * n)) // (2*(k * n)))::BIGINT)) AS w_micro
               FROM c, t),
         e AS (SELECT label, n, w_micro, n * w_micro AS e_micro FROM w),
         et AS (SELECT sum(e_micro)::BIGINT AS etot_micro FROM e)
         SELECT label, n, w_micro AS weight_micro,
           (((2*(e_micro) + (1000000)) // (2*(1000000)))::BIGINT) AS expected_n,
           (((2*(e_micro) * 1000000 + (etot_micro)) // (2*(etot_micro)))::BIGINT) AS share_micro
         FROM e, et""",
    // q264: q94's affine scheme at three widths — identical code
    // rounding, reconstruction order, and moment formulas.
    "q264_quant_sweep" ->
      """WITH cells AS (SELECT vec_id, CAST(s.i AS INTEGER) AS dim,
                 s.v::DOUBLE AS x
               FROM (SELECT vec_id,
                       unnest(list_transform(range(len(embedding)),
                         i -> {'i': i, 'v': embedding[i + 1]})) AS s
                     FROM embeddings) t),
         st AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM cells
                GROUP BY 1),
         vx AS (SELECT ((sum(x * x) - sum(x) * sum(x) / count(*))
                  / count(*)) AS varx FROM cells),
         q AS (SELECT sh.shift, x,
                 x - (mn + (CASE WHEN mx > mn
                       THEN round((x - mn) / (mx - mn) * sh.shift, 0)
                       ELSE 0.0 END) / sh.shift * (mx - mn)) AS e
               FROM cells JOIN st USING (dim),
                 (SELECT unnest([3, 15, 255]::BIGINT[]) AS shift) sh)
         SELECT (CASE WHEN shift = 3 THEN 2 WHEN shift = 15 THEN 4
                 ELSE 8 END)::BIGINT AS bits,
           CAST(round(avg(e * e) * 1e9) AS BIGINT) AS mse_nano,
           CAST(round(max(abs(e)) * 1e6) AS BIGINT)
             AS max_abs_err_micro,
           CAST(round(vx.varx / avg(e * e) * 1e3) AS BIGINT)
             AS snr_milli
         FROM q, vx GROUP BY 1, vx.varx""",
    // q265: q106's probe CTEs with the centroid-rank explode
    // (range(crk, 5) ≡ sequence(crk, 4)); exact top-5 from q24's
    // plan; recall counts are exact integers.
    "q265_recall_curve" -> {
      val qCos = cosSql("q_vec", "e.embedding")
      val cCos = cosSql("c_vec", "embedding")
      val pCos = cosSql("c_vec", "q_vec")
      val aCos = cosSql("q_vec", "a.embedding")
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec
                FROM embeddings WHERE vec_id < 3),
         ex AS (SELECT q_id, vec_id
                FROM (SELECT q_id, vec_id,
                        row_number() OVER (PARTITION BY q_id
                          ORDER BY sim DESC, vec_id ASC) AS rk
                      FROM (SELECT q_id, e.vec_id, $qCos AS sim
                            FROM embeddings e, q) s) t
                WHERE rk <= 5),
         c AS (SELECT vec_id AS cid, embedding AS c_vec
               FROM embeddings WHERE vec_id < 8),
         sims AS (SELECT e.vec_id, e.embedding, c.cid,
                    $cCos AS csim
                  FROM embeddings e, c),
         asg AS (SELECT vec_id, embedding, cid
                 FROM (SELECT vec_id, embedding, cid,
                         row_number() OVER (PARTITION BY vec_id
                           ORDER BY csim DESC, cid ASC) AS rk
                       FROM sims) t WHERE rk = 1),
         pc AS (SELECT q_id, q_vec, cid, crk
                FROM (SELECT q.q_id, q.q_vec, c.cid,
                        row_number() OVER (PARTITION BY q.q_id
                          ORDER BY $pCos DESC, c.cid ASC) AS crk
                      FROM q, c) t WHERE crk <= 4),
         cand AS (SELECT pc.q_id, a.vec_id, $aCos AS sim, pc.crk
                  FROM asg a JOIN pc ON a.cid = pc.cid),
         cnp AS (SELECT q_id, vec_id, sim,
                   unnest(range(crk, 5)) AS np FROM cand),
         ap AS (SELECT q_id, vec_id, np
                FROM (SELECT q_id, vec_id, np,
                        row_number() OVER (PARTITION BY q_id, np
                          ORDER BY sim DESC, vec_id ASC) AS rk
                      FROM cnp) t WHERE rk <= 5)
         SELECT np::BIGINT AS nprobe, count(*)::BIGINT AS n_matches,
           (((2*(count(*)) * 1000000 + ((SELECT count(*) FROM q) * 5)) // (2*((SELECT count(*) FROM q) * 5)))::BIGINT)
             AS recall_ppm
         FROM ap JOIN ex USING (q_id, vec_id) GROUP BY np"""
    },
    // q266: per-code-point substr explode; entropy from exact
    // (lang, char) counts.
    "q266_char_entropy" ->
      """WITH ch AS (SELECT lang, substr(text, i + 1, 1) AS ch
               FROM (SELECT lang, text,
                       unnest(range(length(text))) AS i
                     FROM documents WHERE length(text) > 0) x),
         lc AS (SELECT lang, ch, count(*)::BIGINT AS c
                FROM ch GROUP BY 1, 2),
         w AS (SELECT lang, c,
                 sum(c) OVER (PARTITION BY lang)::BIGINT AS tot
               FROM lc)
         SELECT lang, max(tot)::BIGINT AS n_chars,
           count(*)::BIGINT AS n_distinct_chars,
           CAST(round(sum(-(c::DOUBLE / tot) * ln(c::DOUBLE / tot))
             * 1e6) AS BIGINT) AS entropy_micro
         FROM w GROUP BY 1""",
    // q267: same per-source doc-order cumsum and 0-based token
    // offsets; TTR from exact distinct/total counts.
    "q267_standardized_ttr" ->
      """WITH d AS (SELECT doc_id, source, toks,
                 len(toks)::BIGINT AS n
               FROM (SELECT doc_id, source,
                       CASE WHEN length(trim(text)) = 0
                            THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(text),
                              '\s+') END AS toks
                     FROM documents) x),
         c AS (SELECT doc_id, source, toks, n,
                 sum(n) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS cum
               FROM d),
         f AS (SELECT source, s.t AS tok
               FROM (SELECT source, cum, n,
                       unnest(list_transform(range(len(toks)),
                         i -> {'i': i, 't': toks[i + 1]})) AS s
                     FROM c WHERE cum - n < 1000) x
               WHERE (cum - n) + s.i < 1000)
         SELECT source, count(*)::BIGINT AS n_sample,
           count(DISTINCT tok)::BIGINT AS n_types,
           (((2*(count(DISTINCT tok)) * 1000000 + (count(*))) // (2*(count(*))))::BIGINT) AS ttr_micro
         FROM f GROUP BY 1""",
    // q268: pure integer arithmetic — same remainder, same
    // (rem DESC, source, lang) seat order.
    "q268_apportionment" ->
      """WITH c AS (SELECT source, lang, count(*)::BIGINT AS n_docs
               FROM documents GROUP BY 1, 2),
         t AS (SELECT sum(n_docs)::BIGINT AS bign FROM c),
         b AS (SELECT source, lang, n_docs,
                 (10000 * n_docs) % bign AS rem,
                 (10000 * n_docs - (10000 * n_docs) % bign) // bign
                   AS base
               FROM c, t),
         l AS (SELECT 10000 - sum(base)::BIGINT AS leftover FROM b),
         r AS (SELECT source, lang, n_docs, base, rem,
                 row_number() OVER (ORDER BY rem DESC, source ASC,
                   lang ASC)::BIGINT AS rk
               FROM b)
         SELECT source, lang, n_docs, base::BIGINT AS base,
           rk <= l.leftover AS bonus,
           (base + CASE WHEN rk <= l.leftover THEN 1 ELSE 0
            END)::BIGINT AS alloc
         FROM r, l""",
    // q269: identical hour indexing (floor µs/3600e6), exact integer
    // moments, one final correlation division.
    "q269_cross_correlation" ->
      """WITH h AS (SELECT event_type,
                 epoch_us(ts) // 3600000000 AS hi,
                 count(*)::BIGINT AS n
               FROM events GROUP BY 1, 2),
         j AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                 lg.lag, a.n AS x, b.n AS y
               FROM h a,
                 (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS lag) lg,
                 h b
               WHERE b.hi = a.hi - lg.lag
                 AND a.event_type <> b.event_type),
         m AS (SELECT type_a, type_b, lag,
                 count(*)::BIGINT AS cnt,
                 sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                 sum(x * x)::BIGINT AS sx2, sum(y * y)::BIGINT AS sy2,
                 sum(x * y)::BIGINT AS sxy
               FROM j GROUP BY 1, 2, 3)
         SELECT type_a, type_b, lag::BIGINT AS lag_h, cnt AS n_hours,
           CAST(round((cnt::DOUBLE * sxy - sx * sy)
             / (sqrt(cnt::DOUBLE * sx2 - sx * sx)
                * sqrt(cnt::DOUBLE * sy2 - sy * sy)) * 1e6) AS BIGINT)
             AS corr_micro
         FROM m""",
    // q270: q29's session windows verbatim, distinct (session, type)
    // rows, exact counts into one log.
    "q270_session_pmi" ->
      """WITH e AS (SELECT user_id, event_id, ts, event_type
               FROM events),
         s AS (SELECT user_id, event_type,
                 sum(CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts)
                          > 30 * 60 * 1000000
                     THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_seq
               FROM (SELECT user_id, event_id, ts, event_type,
                       lag(ts) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS prev_ts
                     FROM e) x),
         st AS (SELECT DISTINCT user_id, session_seq, event_type
                FROM s),
         tots AS (SELECT count(*)::BIGINT AS s
                FROM (SELECT DISTINCT user_id, session_seq FROM st)),
         pt AS (SELECT event_type, count(*)::BIGINT AS n_t
                FROM st GROUP BY 1),
         pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                  count(*)::BIGINT AS n_ab
                FROM st a JOIN st b
                  ON a.user_id = b.user_id
                  AND a.session_seq = b.session_seq
                  AND a.event_type < b.event_type
                GROUP BY 1, 2)
         SELECT type_a, type_b, n_ab, na.n_t AS n_a, nb.n_t AS n_b,
           CAST(round(ln(n_ab::DOUBLE * tots.s / (na.n_t * nb.n_t))
             * 1e6) AS BIGINT) AS pmi_micro
         FROM pr
         JOIN pt na ON pr.type_a = na.event_type
         JOIN pt nb ON pr.type_b = nb.event_type, tots""",
    // q271: same (cnt DESC, term) order; strata boundaries compare
    // exact integers (cum·100 vs tot·threshold).
    "q271_vocab_strata" ->
      """WITH tc AS (SELECT term, count(*)::BIGINT AS cnt
               FROM (SELECT unnest(CASE WHEN length(trim(text)) = 0
                       THEN []::VARCHAR[]
                       ELSE regexp_split_to_array(trim(text), '\s+')
                       END) AS term
                     FROM documents) x
               GROUP BY 1),
         t AS (SELECT sum(cnt)::BIGINT AS tot FROM tc),
         r AS (SELECT cnt,
                 sum(cnt) OVER (ORDER BY cnt DESC, term ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS cum
               FROM tc),
         s AS (SELECT CASE WHEN cum * 100 <= tot * 80 THEN 'head'
                      WHEN cum * 100 <= tot * 95 THEN 'torso'
                      ELSE 'tail' END AS stratum, cnt
               FROM r, t)
         SELECT stratum, count(*)::BIGINT AS n_terms,
           sum(cnt)::BIGINT AS token_mass,
           (((2*(sum(cnt)) * 1000000 + (SELECT tot FROM t)) // (2*(SELECT tot FROM t)))::BIGINT) AS coverage_ppm
         FROM s GROUP BY 1""",
    // q272: the q251 tagger inline + GROUP BY CUBE; GROUPING() uses
    // the same first-arg-MSB bit order as Spark's grouping_id().
    "q272_composition_cube" ->
      """WITH tagged AS (SELECT doc_id,
             CASE WHEN n_chars = 0 THEN 'empty'
                  WHEN sym_ppm >= 20000 THEN 'code'
                  WHEN digit_ppm >= 50000 THEN 'numeric'
                  ELSE 'prose' END AS content_class
           FROM (SELECT doc_id, length(text)::BIGINT AS n_chars,
                   CASE WHEN length(text) = 0 THEN 0
                        ELSE (((2*(length(text) - length(translate(text, '{}();=<>[]', ''))) * 1000000 + (length(text))) // (2*(length(text))))::BIGINT)
                   END AS sym_ppm,
                   CASE WHEN length(text) = 0 THEN 0
                        ELSE (((2*(length(text) - length(translate(text, '0123456789', ''))) * 1000000 + (length(text))) // (2*(length(text))))::BIGINT)
                   END AS digit_ppm
                 FROM documents) t),
         base AS (SELECT d.source, d.lang, tg.content_class,
                    (CASE WHEN length(trim(d.text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(d.text),
                            '\s+')) END)::BIGINT AS n_tokens
                  FROM documents d JOIN tagged tg USING (doc_id))
         SELECT source, lang, content_class,
           GROUPING(source, lang, content_class)::BIGINT AS gid,
           count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS tokens
         FROM base GROUP BY CUBE (source, lang, content_class)""",
    // q273: two recursive closures over the same jaccard pair CTE,
    // then the q238 comb-term arithmetic on the joint labeling.
    "q273_threshold_ari" ->
      s"""WITH RECURSIVE $shinglesCte,
         e0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
                WHERE len(sh) > 0),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*) AS inter,
                  any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
                FROM e0 a JOIN e0 b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         pj AS (SELECT doc_a, doc_b,
                  round(inter::DOUBLE / (n_a + n_b - inter), 6) AS j
                FROM pr),
         nodes AS (SELECT doc_id FROM d WHERE len(sh) > 0),
         lo_sym AS (SELECT doc_a AS a, doc_b AS b FROM pj
                    WHERE j >= 0.3
                    UNION SELECT doc_b, doc_a FROM pj WHERE j >= 0.3),
         lo_reach(a, b) AS (
           SELECT doc_id, doc_id FROM nodes
           UNION
           SELECT r.a, s.b FROM lo_reach r JOIN lo_sym s ON r.b = s.a),
         lo_lab AS (SELECT a AS id, min(b) AS c_lo FROM lo_reach
                    GROUP BY 1),
         hi_sym AS (SELECT doc_a AS a, doc_b AS b FROM pj
                    WHERE j >= 0.6
                    UNION SELECT doc_b, doc_a FROM pj WHERE j >= 0.6),
         hi_reach(a, b) AS (
           SELECT doc_id, doc_id FROM nodes
           UNION
           SELECT r.a, s.b FROM hi_reach r JOIN hi_sym s ON r.b = s.a),
         hi_lab AS (SELECT a AS id, min(b) AS c_hi FROM hi_reach
                    GROUP BY 1),
         ct AS (SELECT c_lo, c_hi, count(*)::BIGINT AS n_ij
                FROM lo_lab JOIN hi_lab USING (id) GROUP BY 1, 2),
         cells AS (SELECT sum(n_ij * (n_ij - 1) // 2)::BIGINT
                     AS comb_cells,
                     sum(n_ij)::BIGINT AS n,
                     count(DISTINCT c_lo)::BIGINT AS n_clusters_lo,
                     count(DISTINCT c_hi)::BIGINT AS n_clusters_hi
                   FROM ct),
         ra AS (SELECT sum(a * (a - 1) // 2)::BIGINT AS comb_a
                FROM (SELECT sum(n_ij) AS a FROM ct GROUP BY c_lo)),
         cb AS (SELECT sum(b * (b - 1) // 2)::BIGINT AS comb_b
                FROM (SELECT sum(n_ij) AS b FROM ct GROUP BY c_hi))
         SELECT n, n_clusters_lo, n_clusters_hi, comb_cells, comb_a,
           comb_b,
           CAST(round(
             (comb_cells - comb_a::DOUBLE * comb_b / (n * (n - 1) // 2))
             / ((comb_a + comb_b) / 2.0
                - comb_a::DOUBLE * comb_b / (n * (n - 1) // 2)) * 1e6)
             AS BIGINT) AS ari_micro
         FROM cells, ra, cb""",
    // q274: the q21 pair CTE at J>=0.3 + the q235 null-padded-zip
    // LCP (forward and on list_reverse), same clamp and shape CASE.
    "q274_neardup_anatomy" ->
      s"""WITH $shinglesCte,
         e0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
                WHERE len(sh) > 0),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*) AS inter,
                  any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
                FROM e0 a JOIN e0 b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         pj AS (SELECT doc_a, doc_b,
                  ${sqlMicroRatio("inter", "n_a + n_b - inter")}
                    AS jaccard_ppm
                FROM pr
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                  >= 0.3),
         tk AS (SELECT doc_id,
                  CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                       ELSE regexp_split_to_array(trim(text), '\\s+')
                  END AS toks
                FROM documents),
         j0 AS (SELECT pj.doc_a, pj.doc_b, pj.jaccard_ppm,
                  a.toks AS ta, b.toks AS tb
                FROM pj
                JOIN tk a ON pj.doc_a = a.doc_id
                JOIN tk b ON pj.doc_b = b.doc_id),
         m AS (SELECT doc_a, doc_b, jaccard_ppm,
                 len(ta)::BIGINT AS na, len(tb)::BIGINT AS nb,
                 coalesce(nullif(list_position(list_transform(
                     list_zip(ta, tb),
                     z -> z[1] IS NOT DISTINCT FROM z[2]), false), 0)
                   - 1, least(len(ta), len(tb)))::BIGINT AS lcp,
                 coalesce(nullif(list_position(list_transform(
                     list_zip(list_reverse(ta), list_reverse(tb)),
                     z -> z[1] IS NOT DISTINCT FROM z[2]), false), 0)
                   - 1, least(len(ta), len(tb)))::BIGINT AS lcs_raw
               FROM j0),
         f AS (SELECT doc_a, doc_b, jaccard_ppm, lcp,
                 least(lcs_raw, least(na, nb) - lcp) AS lcs, na, nb
               FROM m)
         SELECT doc_a, doc_b, jaccard_ppm, lcp, lcs,
           na - lcp - lcs AS edit_a, nb - lcp - lcs AS edit_b,
           CASE WHEN na - lcp - lcs = 0 AND nb - lcp - lcs = 0
                  THEN 'identical'
                WHEN lcp > 0 AND lcs > 0 THEN 'middle_edit'
                WHEN lcp > 0 THEN 'suffix_change'
                WHEN lcs > 0 THEN 'prefix_change'
                ELSE 'unaligned' END AS shape
         FROM f""",
    // q275: the q197-convention exact medians (rank ceil(n/2)) for
    // value and deviation; identical z expression and flag.
    "q275_robust_outliers" ->
      s"""WITH $qMicroCte,
         s AS (SELECT d.doc_id, d.source, q2.q_micro AS q
               FROM documents d JOIN qm q2 USING (doc_id)),
         r1 AS (SELECT source, q, doc_id,
                  row_number() OVER (PARTITION BY source
                    ORDER BY q, doc_id) AS rn,
                  count(*) OVER (PARTITION BY source) AS cnt
                FROM s),
         med AS (SELECT source, q AS med FROM r1
                 WHERE rn = ceil(cnt / 2)),
         dv AS (SELECT s.doc_id, s.source, s.q, m.med,
                  abs(s.q - m.med) AS dev
                FROM s JOIN med m USING (source)),
         r2 AS (SELECT source, dev, doc_id,
                  row_number() OVER (PARTITION BY source
                    ORDER BY dev, doc_id) AS rn,
                  count(*) OVER (PARTITION BY source) AS cnt
                FROM dv),
         mad AS (SELECT source, dev AS mad FROM r2
                 WHERE rn = ceil(cnt / 2))
         SELECT dv.doc_id, dv.source,
           q AS q_micro, med AS med_micro, mad AS mad_micro,
           CASE WHEN mad = 0 THEN NULL
                ELSE ${sqlIdivHalfUpSigned("674500 * (q - med)", "mad")}
           END AS z_micro,
           coalesce(6745 * abs(q - med) > 35000 * nullif(mad, 0),
             false) AS outlier
         FROM dv JOIN mad USING (source)""",
    // q276: the shared shingle CTE; exact first-owner counts.
    "q276_doc_novelty" ->
      s"""WITH $shinglesCte,
         p AS (SELECT doc_id, unnest(sh) AS s FROM d
               WHERE len(sh) > 0),
         f AS (SELECT s, min(doc_id) AS first_doc FROM p GROUP BY 1)
         SELECT doc_id, count(*)::BIGINT AS n_shingles,
           sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0
               END)::BIGINT AS n_novel,
           (((2*(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)) * 1000000 + (count(*))) // (2*(count(*))))::BIGINT) AS novelty_ppm
         FROM p JOIN f USING (s) GROUP BY 1""",
    // q277: the batch q262 oracle verbatim — the stream must land on
    // the identical transition multiset.
    "q277_stream_transitions" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                 epoch_us(ts)::BIGINT AS us FROM events),
         t AS (SELECT user_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY us, event_id) AS prev
               FROM e),
         c AS (SELECT prev AS from_type, event_type AS to_type,
                 count(*)::BIGINT AS n
               FROM t WHERE prev IS NOT NULL GROUP BY 1, 2),
         w AS (SELECT from_type, to_type, n,
                 sum(n) OVER (PARTITION BY from_type)::BIGINT AS rt
               FROM c)
         SELECT from_type, to_type, n,
           (((2*(n) * 1000000 + (rt)) // (2*(rt)))::BIGINT) AS p_micro
         FROM w""",
    // q278: same lattice pairs, same cosine fold, same floor binning.
    "q278_cosine_histogram" -> {
      val pairCos = cosSql("a.embedding", "b.embedding")
      s"""WITH p AS (SELECT a.vec_id, st.s, $pairCos AS c
               FROM embeddings a
               CROSS JOIN (SELECT unnest(range(1, 17)) AS s) st
               JOIN embeddings b ON b.vec_id = a.vec_id + st.s),
         bn AS (SELECT least(CAST(floor((c + 1.0) / 2.0 * 20)
                   AS BIGINT), 19) AS bin
                FROM p),
         h AS (SELECT bin, count(*)::BIGINT AS n_pairs FROM bn
               GROUP BY 1),
         t AS (SELECT sum(n_pairs)::BIGINT AS tot FROM h)
         SELECT bin, round(-1.0 + bin * 0.1, 1) AS bin_lo, n_pairs,
           (((2*(n_pairs) * 1000000 + (t.tot)) // (2*(t.tot)))::BIGINT)
             AS share_ppm
         FROM h, t"""
    },
    // q279: ECDFs from exact integer cumsums; the sup evaluated at v
    // and v⁻ for every source point; same critical-value constant.
    "q279_source_ks" ->
      s"""WITH $qMicroCte,
         s AS (SELECT d.doc_id, d.source, q2.q_micro AS q
               FROM documents d JOIN qm q2 USING (doc_id)),
         gv AS (SELECT q, count(*)::BIGINT AS gcnt,
                  sum(count(*)) OVER (ORDER BY q
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    )::BIGINT AS gcum
                FROM s GROUP BY q),
         sv AS (SELECT source, q, count(*)::BIGINT AS scnt,
                  sum(count(*)) OVER (PARTITION BY source ORDER BY q
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    )::BIGINT AS scum
                FROM s GROUP BY source, q),
         ns AS (SELECT source, count(*)::BIGINT AS n_s FROM s
                GROUP BY 1),
         nn AS (SELECT count(*)::BIGINT AS bign FROM s),
         j AS (SELECT sv.source, ns.n_s, nn.bign,
                 greatest(
                   abs(sv.scum * nn.bign - gv.gcum * ns.n_s),
                   abs((sv.scum - sv.scnt) * nn.bign
                     - (gv.gcum - gv.gcnt) * ns.n_s)) AS dnum
               FROM sv JOIN gv USING (q)
               JOIN ns USING (source), nn)
         SELECT source, max(n_s)::BIGINT AS n,
           ${sqlMicroRatio("max(dnum)", "max(n_s) * max(bign)")}
             AS ks_micro,
           CAST(round(max(1.358 * sqrt((n_s + bign)::DOUBLE
             / (n_s * bign))) * 1e6) AS BIGINT) AS crit_micro,
           max(dnum)::DOUBLE / (max(n_s) * max(bign))
             > max(1.358 * sqrt((n_s + bign)::DOUBLE
               / (n_s * bign))) AS drifted
         FROM j GROUP BY source""",
    // q280: ISO dow via isodow, hour extraction, exact share math,
    // same 2x-mean peak rule on exact integers.
    "q280_calendar_profile" ->
      """WITH c AS (SELECT isodow(ts)::BIGINT AS dow,
                 hour(ts)::BIGINT AS hod, count(*)::BIGINT AS n
               FROM events GROUP BY 1, 2),
         t AS (SELECT sum(n)::BIGINT AS tot, count(*)::BIGINT AS n_cells
               FROM c)
         SELECT dow, hod, n,
           (((2*(n) * 1000000 + (t.tot)) // (2*(t.tot)))::BIGINT) AS share_ppm,
           n * t.n_cells > t.tot * 2 AS peak
         FROM c, t""",
    // q281: same micro integerization, exact-integer mean pivot,
    // centered small-deviation moments, m2*sqrt(m2) (no pow).
    "q281_normality_audit" ->
      s"""WITH $qMicroCte,
         sc AS (SELECT d.doc_id, d.source,
                  q2.q_micro AS qm
                FROM documents d JOIN qm q2 USING (doc_id)),
         mn AS (SELECT source,
                  (CASE WHEN (sum(qm)) < 0 THEN -(((2*(-(sum(qm))) + (count(*))) // (2*(count(*))))::BIGINT) ELSE (((2*(sum(qm)) + (count(*))) // (2*(count(*))))::BIGINT) END) AS mean_micro
                FROM sc GROUP BY 1),
         dv AS (SELECT sc.source,
                  (sc.qm - mn.mean_micro)::DOUBLE / 1e6 AS d
                FROM sc JOIN mn USING (source)),
         ag AS (SELECT source, count(*)::BIGINT AS n,
                  sum(d * d) AS s2, sum(d * d * d) AS s3,
                  sum(d * d * d * d) AS s4
                FROM dv GROUP BY 1)
         SELECT source, n,
           CAST(round((s3 / n) / ((s2 / n) * sqrt(s2 / n)) * 1e6)
             AS BIGINT) AS skew_micro,
           CAST(round(((s4 / n) / ((s2 / n) * (s2 / n)) - 3.0) * 1e6)
             AS BIGINT) AS ex_kurtosis_micro,
           CAST(round(n / 6.0 * (((s3 / n) / ((s2 / n) * sqrt(s2 / n)))
               * ((s3 / n) / ((s2 / n) * sqrt(s2 / n)))
             + (((s4 / n) / ((s2 / n) * (s2 / n)) - 3.0)
                * ((s4 / n) / ((s2 / n) * (s2 / n)) - 3.0)) / 4.0)
             * 1e3) AS BIGINT) AS jb_milli,
           n / 6.0 * (((s3 / n) / ((s2 / n) * sqrt(s2 / n)))
               * ((s3 / n) / ((s2 / n) * sqrt(s2 / n)))
             + (((s4 / n) / ((s2 / n) * (s2 / n)) - 3.0)
                * ((s4 / n) / ((s2 / n) * (s2 / n)) - 3.0)) / 4.0)
             > 5.991 AS non_normal
         FROM ag""",
    // q282: the q21 pair CTE, 0.1 bands on the rounded internal
    // jaccard, the same md5(doc_a:doc_b) pick order; emitted
    // similarity is the exact ppm twin (round-12 float purge).
    "q282_review_batch" ->
      s"""WITH $shinglesCte,
         e0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
                WHERE len(sh) > 0),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*) AS inter,
                  any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
                FROM e0 a JOIN e0 b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         pj AS (SELECT doc_a, doc_b,
                  round(inter::DOUBLE / (n_a + n_b - inter), 6)
                    AS j_sel,
                  ${sqlMicroRatio("inter", "n_a + n_b - inter")}
                    AS jaccard_ppm
                FROM pr
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                  >= 0.05),
         bd AS (SELECT doc_a, doc_b, jaccard_ppm,
                  least(CAST(floor(j_sel * 10) AS BIGINT), 9) AS band
                FROM pj),
         rk AS (SELECT band, doc_a, doc_b, jaccard_ppm,
                  CAST(row_number() OVER (PARTITION BY band
                    ORDER BY md5(doc_a::VARCHAR || ':' ||
                      doc_b::VARCHAR) ASC, doc_a ASC, doc_b ASC)
                    AS INTEGER) AS pick
                FROM bd)
         SELECT band, pick, doc_a, doc_b, jaccard_ppm
         FROM rk WHERE pick <= 3""",
    // q283: same micro quantization; doubled average ranks keep every
    // rank exact-integer; tie term and u2 are BIGINT on both engines;
    // no continuity correction on either side.
    "q283_mannwhitney_drift" ->
      s"""WITH $qMicroCte,
         s AS (SELECT d.doc_id, d.source,
                 q2.q_micro AS qm
               FROM documents d JOIN qm q2 USING (doc_id)),
         gv AS (SELECT qm, count(*)::BIGINT AS gcnt,
                  sum(count(*)) OVER (ORDER BY qm
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    )::BIGINT AS gcum
                FROM s GROUP BY qm),
         rk AS (SELECT qm, gcnt,
                  2 * (gcum - gcnt) + gcnt + 1 AS rank2
                FROM gv),
         tt AS (SELECT sum(gcnt * gcnt * gcnt - gcnt)::BIGINT AS tsum,
                  sum(gcnt)::BIGINT AS bign
                FROM gv),
         sv AS (SELECT source, qm, count(*)::BIGINT AS scnt
                FROM s GROUP BY 1, 2),
         ag AS (SELECT sv.source, sum(sv.scnt)::BIGINT AS n_s,
                  sum(sv.scnt * rk.rank2)::BIGINT AS r2
                FROM sv JOIN rk USING (qm) GROUP BY 1),
         zc AS (SELECT source, n_s,
                  r2 - n_s * (n_s + 1) AS u2,
                  n_s::DOUBLE * (bign - n_s) / 12.0 * ((bign + 1)
                    - tsum::DOUBLE / (bign::DOUBLE * (bign - 1)))
                    AS var_u,
                  n_s::DOUBLE * (bign - n_s) AS mu2
                FROM ag, tt)
         SELECT source, n_s AS n, u2,
           CAST(round(CASE WHEN var_u <= 0 THEN 0.0
             ELSE (u2 - mu2) / (2.0 * sqrt(var_u)) END * 1e6) AS BIGINT)
             AS z_micro,
           abs(CASE WHEN var_u <= 0 THEN 0.0
             ELSE (u2 - mu2) / (2.0 * sqrt(var_u)) END) > 1.96
             AS shifted
         FROM zc""",
    // q284: the q279 KS chain, the asymptotic 2*exp(-2*d^2*ne) tail,
    // micro-quantized p BEFORE the exact-integer BH step-up.
    "q284_ks_fdr" ->
      s"""WITH $qMicroCte,
         s AS (SELECT d.doc_id, d.source, q2.q_micro AS q
               FROM documents d JOIN qm q2 USING (doc_id)),
         gv AS (SELECT q, count(*)::BIGINT AS gcnt,
                  sum(count(*)) OVER (ORDER BY q
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    )::BIGINT AS gcum
                FROM s GROUP BY q),
         sv AS (SELECT source, q, count(*)::BIGINT AS scnt,
                  sum(count(*)) OVER (PARTITION BY source ORDER BY q
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    )::BIGINT AS scum
                FROM s GROUP BY source, q),
         ns AS (SELECT source, count(*)::BIGINT AS n_s FROM s
                GROUP BY 1),
         nn AS (SELECT count(*)::BIGINT AS bign FROM s),
         j AS (SELECT sv.source, ns.n_s, nn.bign,
                 greatest(
                   abs(sv.scum * nn.bign - gv.gcum * ns.n_s),
                   abs((sv.scum - sv.scnt) * nn.bign
                     - (gv.gcum - gv.gcnt) * ns.n_s)) AS dnum
               FROM sv JOIN gv USING (q)
               JOIN ns USING (source), nn),
         ks AS (SELECT source, max(n_s)::BIGINT AS n_s,
                  max(bign)::BIGINT AS bign, max(dnum)::BIGINT AS dnum
                FROM j GROUP BY 1),
         pv AS (SELECT source, n_s AS n,
                  ${sqlMicroRatio("dnum", "n_s * bign")} AS ks_micro,
                  CAST(round(least(1.0,
                    2.0 * exp(-2.0 * (dnum::DOUBLE / (n_s * bign))
                      * (dnum::DOUBLE / (n_s * bign))
                      * (n_s::DOUBLE * bign / (n_s + bign)))) * 1e6)
                    AS BIGINT) AS p_micro
                FROM ks),
         mm AS (SELECT count(*)::BIGINT AS m FROM pv),
         rk AS (SELECT pv.*, mm.m,
                  row_number() OVER (ORDER BY p_micro, source)::BIGINT
                    AS bh_rank
                FROM pv, mm),
         km AS (SELECT rk.*,
                  max(CASE WHEN p_micro * m * 20 <= bh_rank * 1000000
                    THEN bh_rank END) OVER () AS kmax
                FROM rk)
         SELECT source, n, ks_micro, p_micro, bh_rank,
           bh_rank <= coalesce(kmax, 0) AS rejected
         FROM km""",
    // q285: q247's token count, nano-quantized within summands summed
    // as BIGINT, exact-integer ln arguments, milli outputs.
    "q285_theil_decomposition" ->
      """WITH d AS (SELECT doc_id, source,
             (CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\s+'))
              END)::BIGINT AS x
           FROM documents),
         src AS (SELECT source,
                  sum(CASE WHEN x > 0 THEN 1 ELSE 0 END)::BIGINT AS n_s,
                  sum(CASE WHEN x = 0 THEN 1 ELSE 0 END)::BIGINT
                    AS n_zero,
                  sum(x)::BIGINT AS sum_s
                FROM d GROUP BY 1),
         tot AS (SELECT sum(n_s)::BIGINT AS bign,
                  sum(sum_s)::BIGINT AS tot
                FROM src),
         wi AS (SELECT d.source,
                  sum(CAST(round((d.x * src.n_s)::DOUBLE / src.sum_s
                    * ln((d.x * src.n_s)::DOUBLE / src.sum_s) * 1e9)
                    AS BIGINT))::BIGINT AS t_sum
                FROM d JOIN src USING (source)
                WHERE d.x > 0 GROUP BY 1)
         SELECT src.source, src.n_s AS n_docs, src.n_zero,
           (((2*(src.sum_s) * 1000000 + (tot.tot)) // (2*(tot.tot)))::BIGINT)
             AS tok_share_ppm,
           (CASE WHEN (wi.t_sum) < 0 THEN -(((2*(-(wi.t_sum)) + (src.n_s * 1000000)) // (2*(src.n_s * 1000000)))::BIGINT) ELSE (((2*(wi.t_sum) + (src.n_s * 1000000)) // (2*(src.n_s * 1000000)))::BIGINT) END) AS within_milli,
           CAST(round(src.sum_s::DOUBLE / tot.tot
             * ln((src.sum_s * tot.bign)::DOUBLE
                  / (src.n_s * tot.tot)::DOUBLE) * 1e3) AS BIGINT)
             AS between_milli,
           (CASE WHEN (src.sum_s * (CASE WHEN (wi.t_sum) < 0 THEN -(((2*(-(wi.t_sum)) + (src.n_s)) // (2*(src.n_s)))::BIGINT) ELSE (((2*(wi.t_sum) + (src.n_s)) // (2*(src.n_s)))::BIGINT) END)) < 0 THEN -(((2*(-(src.sum_s * (CASE WHEN (wi.t_sum) < 0 THEN -((2*(-(wi.t_sum)) + (src.n_s)) // (2*(src.n_s))) ELSE ((2*(wi.t_sum) + (src.n_s)) // (2*(src.n_s))) END))) + (tot.tot * 1000000)) // (2*(tot.tot * 1000000)))::BIGINT) ELSE (((2*(src.sum_s * (CASE WHEN (wi.t_sum) < 0 THEN -((2*(-(wi.t_sum)) + (src.n_s)) // (2*(src.n_s))) ELSE ((2*(wi.t_sum) + (src.n_s)) // (2*(src.n_s))) END)) + (tot.tot * 1000000)) // (2*(tot.tot * 1000000)))::BIGINT) END) AS contrib_milli
         FROM src JOIN wi USING (source), tot""",
    // q286: list slices + list_distinct; the intersection via
    // list_filter/list_contains (exact distinct-term set algebra).
    "q286_lead_bias" ->
      """WITH t AS (SELECT doc_id, source,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
           FROM documents),
         hs AS (SELECT source,
                  list_distinct(toks[1:64]) AS h,
                  list_distinct(toks[65:]) AS tl
                FROM t WHERE len(toks) > 0),
         c AS (SELECT source,
                 len(list_filter(h, x -> list_contains(tl, x)))::BIGINT
                   AS nb,
                 len(h)::BIGINT AS nh, len(tl)::BIGINT AS nt
               FROM hs)
         SELECT source, count(*)::BIGINT AS n_docs,
           sum(nh - nb)::BIGINT AS head_only,
           sum(nt - nb)::BIGINT AS tail_only,
           sum(nb)::BIGINT AS both_terms,
           (((2*(sum(nh - nb)) * 1000000 + (sum(nh - nb) + sum(nt - nb) + sum(nb))) // (2*(sum(nh - nb) + sum(nt - nb) + sum(nb))))::BIGINT) AS lead_ppm
         FROM c GROUP BY 1""",
    // q287: same micro bucket clamp, 10x10 threshold join, exact
    // integer sums; empty cuts surface as zero rows via LEFT JOIN.
    "q287_quality_yield" ->
      s"""WITH $qMicroCte,
         xc AS (SELECT doc_id,
                  (CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                   END)::BIGINT AS x
                FROM documents),
         sc AS (SELECT xc.doc_id, xc.x,
                  q2.q_micro AS qm
                FROM xc JOIN qm q2 USING (doc_id)),
         bk AS (SELECT least(CAST(floor(qm / 100000.0) AS BIGINT), 9)
                    AS b,
                  count(*)::BIGINT AS n_docs, sum(x)::BIGINT AS n_toks,
                  sum(qm)::BIGINT AS qm_sum
                FROM sc GROUP BY 1),
         tt AS (SELECT sum(n_toks)::BIGINT AS tot_toks FROM bk),
         th AS (SELECT unnest(range(0, 10))::BIGINT AS k),
         cu AS (SELECT th.k,
                  coalesce(sum(bk.n_docs), 0)::BIGINT AS docs_kept,
                  coalesce(sum(bk.n_toks), 0)::BIGINT AS toks_kept,
                  coalesce(sum(bk.qm_sum), 0)::BIGINT AS qm_kept
                FROM th LEFT JOIN bk ON bk.b >= th.k GROUP BY 1)
         SELECT k AS thr_decile, docs_kept, toks_kept,
           (((2*(toks_kept) * 1000000 + (tt.tot_toks)) // (2*(tt.tot_toks)))::BIGINT)
             AS tok_share_ppm,
           CASE WHEN docs_kept = 0 THEN 0
                ELSE (((2*(qm_kept) + (docs_kept)) // (2*(docs_kept)))::BIGINT)
           END AS mean_q_micro
         FROM cu, tt""",
    // q288: the shared gate-flag CTEs, a 3-way feature unpivot, and
    // nano-quantized MI/entropy summands summed as BIGINT.
    "q288_gate_mi" ->
      s"""WITH $gateFlagsCtes,
         ft AS (SELECT doc_id, 'source' AS feature, source AS fval
                FROM documents
                UNION ALL
                SELECT doc_id, 'lang', lang FROM documents
                UNION ALL
                SELECT doc_id, 'len_digits',
                  length(CAST((CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                    END)::BIGINT AS VARCHAR))::VARCHAR
                FROM documents),
         cj AS (SELECT fl.gate, ft.feature, ft.fval, fl.f,
                  count(*)::BIGINT AS n_c
                FROM fl JOIN ft USING (doc_id) GROUP BY 1, 2, 3, 4),
         tot AS (SELECT gate, feature, sum(n_c)::BIGINT AS n
                 FROM cj GROUP BY 1, 2),
         mf AS (SELECT gate, feature, fval, sum(n_c)::BIGINT AS n_f
                FROM cj GROUP BY 1, 2, 3),
         mk AS (SELECT gate, feature, f, sum(n_c)::BIGINT AS n_k
                FROM cj GROUP BY 1, 2, 3),
         mi AS (SELECT cj.gate, cj.feature,
                  sum(CAST(round(cj.n_c::DOUBLE / tot.n
                    * ln(cj.n_c::DOUBLE * tot.n
                         / (mf.n_f::DOUBLE * mk.n_k)) * 1e9)
                    AS BIGINT))::BIGINT AS mi_nano
                FROM cj
                JOIN tot USING (gate, feature)
                JOIN mf USING (gate, feature, fval)
                JOIN mk USING (gate, feature, f)
                GROUP BY 1, 2),
         hk AS (SELECT mk.gate, mk.feature, max(tot.n)::BIGINT AS n,
                  sum(CAST(round(-1.0 * mk.n_k::DOUBLE / tot.n
                    * ln(mk.n_k::DOUBLE / tot.n) * 1e9)
                    AS BIGINT))::BIGINT AS h_nano
                FROM mk JOIN tot USING (gate, feature) GROUP BY 1, 2)
         SELECT mi.gate, mi.feature, hk.n,
           (CASE WHEN (mi.mi_nano) < 0 THEN -(((2*(-(mi.mi_nano)) + (1000)) // (2*(1000)))::BIGINT) ELSE (((2*(mi.mi_nano) + (1000)) // (2*(1000)))::BIGINT) END) AS mi_micro,
           CASE WHEN hk.h_nano = 0 THEN 0
                ELSE (CASE WHEN (mi.mi_nano * 1000000) < 0 THEN -(((2*(-(mi.mi_nano * 1000000)) + (hk.h_nano)) // (2*(hk.h_nano)))::BIGINT) ELSE (((2*(mi.mi_nano * 1000000) + (hk.h_nano)) // (2*(hk.h_nano)))::BIGINT) END)
           END AS nmi_micro
         FROM mi JOIN hk USING (gate, feature)""",
    // q289: the q132 weight chain verbatim; femto-quantized ESS terms
    // summed as BIGINT before the single reciprocal.
    "q289_mix_ess" ->
      """WITH pl AS (SELECT lang, count(*) AS n_docs
                     FROM documents GROUP BY 1),
         tot AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS tot FROM pl),
         qr AS (SELECT lang, n_docs, tot,
                  pow(n_docs / tot, 0.3) AS qr
                FROM pl CROSS JOIN tot),
         qs AS (SELECT sum(qr) AS qs FROM qr),
         t AS (SELECT lang, n_docs, tot, qr / qs AS q,
                 CAST(round((qr / qs) * (qr / qs) / n_docs * 1e15)
                   AS BIGINT) AS t_femto
               FROM qr CROSS JOIN qs),
         fs AS (SELECT sum(t_femto)::BIGINT AS f_sum FROM t),
         ti AS (SELECT CAST(sum(n_docs) AS BIGINT) AS toti FROM pl)
         SELECT lang, n_docs::BIGINT AS n_docs,
           CAST(round(q * 1e6) AS BIGINT) AS q_ppm,
           CAST(round(0.5 * tot * q / n_docs * 1e6) AS BIGINT)
             AS rep_micro,
           (((2*(1000000000000000) + (fs.f_sum)) // (2*(fs.f_sum)))::BIGINT) AS ess_docs,
           (((2*(((2*(1000000000000000000) + (fs.f_sum)) // (2*(fs.f_sum))) * 1000) + (ti.toti)) // (2*(ti.toti)))::BIGINT)
             AS ess_ppm
         FROM t, fs, ti""",
    // q290: same exploded length lattice, exact integer clip sums.
    "q290_truncation_loss" ->
      """WITH n AS (SELECT (CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\s+'))
               END)::BIGINT AS n
             FROM documents),
         x AS (SELECT n.n, l.len
               FROM n, (SELECT unnest([128, 256, 512, 1024, 2048])
                          ::BIGINT AS len) l
               WHERE n.n > 0)
         SELECT len, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN n > len THEN 1 ELSE 0 END)::BIGINT
             AS docs_truncated,
           sum(n)::BIGINT AS total_tokens,
           sum(least(n, len))::BIGINT AS kept_tokens,
           (((2*(sum(n) - sum(least(n, len))) * 1000000 + (sum(n))) // (2*(sum(n))))::BIGINT) AS lost_ppm
         FROM x GROUP BY 1""",
    // q291: 12-perm portable signature, four band lattices off one
    // CTE, truth from the exact q21 pair chain at J >= 0.5; the
    // analytic S-curve constants are shared literals.
    "q291_lsh_tuning" -> {
      val geom = Seq((6, 2), (4, 3), (3, 4), (2, 6))
      val perConfig = geom.map { case (b, r) =>
        val expP50 = math.round(
          (1.0 - math.pow(1.0 - math.pow(0.5, r), b)) * 1e6
        )
        s"""SELECT $b::BIGINT AS bands, $r::BIGINT AS rows_per_band,
           (SELECT count(*) FROM
             (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bd_${b}_$r a JOIN bd_${b}_$r b
                ON a.j = b.j AND a.bval = b.bval
                  AND a.doc_id < b.doc_id))::BIGINT AS n_candidates,
           (SELECT count(*) FROM truth)::BIGINT AS n_true,
           (SELECT count(*) FROM
             (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bd_${b}_$r a JOIN bd_${b}_$r b
                ON a.j = b.j AND a.bval = b.bval
                  AND a.doc_id < b.doc_id) c
             JOIN truth USING (doc_a, doc_b))::BIGINT AS n_hit,
           $expP50::BIGINT AS expected_p50_ppm"""
      }
      val bandCtes = geom.map { case (b, r) =>
        s"""bd_${b}_$r AS (SELECT doc_id, t.j,
             array_to_string(mh[t.j*$r+1:t.j*$r+$r], '_') AS bval
           FROM m12, range($b) t(j))"""
      }.mkString(",\n         ")
      s"""WITH $shinglesCte,
         m12 AS (SELECT doc_id, sh,
                 list_transform(range(12), i -> list_min(list_transform(sh,
                   s -> ('0x' || substr(md5(i || ':' || s), 1, 15))::BIGINT)))
                   AS mh
               FROM d WHERE len(sh) > 0),
         e0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
                WHERE len(sh) > 0),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*) AS inter,
                  any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
                FROM e0 a JOIN e0 b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         truth AS (SELECT doc_a, doc_b FROM pr
                   WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                     >= 0.5),
         $bandCtes,
         raw AS (${perConfig.mkString("\n           UNION ALL\n           ")})
         SELECT bands, rows_per_band, n_candidates, n_true, n_hit,
           CASE WHEN n_true = 0 THEN 0
                ELSE (((2*(n_hit) * 1000000 + (n_true)) // (2*(n_true)))::BIGINT)
           END AS recall_ppm,
           CASE WHEN n_candidates = 0 THEN 0
                ELSE (((2*(n_hit) * 1000000 + (n_candidates)) // (2*(n_candidates)))::BIGINT)
           END AS precision_ppm,
           expected_p50_ppm
         FROM raw"""
    },
    // q292: same (qm, doc_id) rank, exact floor(n/10) trim counts,
    // integer sums with one division per mean.
    "q292_trimmed_mean" ->
      s"""WITH $qMicroCte,
         s AS (SELECT d.doc_id, d.source,
                 q2.q_micro AS qm
               FROM documents d JOIN qm q2 USING (doc_id)),
         r AS (SELECT source, doc_id, qm,
                 row_number() OVER (PARTITION BY source
                   ORDER BY qm, doc_id)::BIGINT AS i,
                 count(*) OVER (PARTITION BY source)::BIGINT AS n_s
               FROM s),
         ag AS (SELECT source, max(n_s) AS n,
                  sum(qm)::BIGINT AS qsum,
                  sum(CASE WHEN i > n_s // 10
                        AND i <= n_s - n_s // 10
                      THEN qm ELSE 0 END)::BIGINT AS tsum,
                  sum(CASE WHEN i > n_s // 10
                        AND i <= n_s - n_s // 10
                      THEN 1 ELSE 0 END)::BIGINT AS n_kept
                FROM r GROUP BY 1)
         SELECT source, n,
           CAST(round(qsum::DOUBLE / n) AS BIGINT) AS mean_micro,
           CAST(round(tsum::DOUBLE / n_kept) AS BIGINT)
             AS trimmed_micro,
           CAST(round(tsum::DOUBLE / n_kept) AS BIGINT)
             - CAST(round(qsum::DOUBLE / n) AS BIGINT) AS gap_micro
         FROM ag""",
    // q293: the q279 cumsum frames; decile values via the exact
    // integer predicate 10*cum >= d*n with min(qm) per probe.
    "q293_qq_drift" ->
      s"""WITH $qMicroCte,
         s AS (SELECT d.doc_id, d.source,
                 q2.q_micro AS qm
               FROM documents d JOIN qm q2 USING (doc_id)),
         gv AS (SELECT qm, count(*)::BIGINT AS gcnt,
                  sum(count(*)) OVER (ORDER BY qm
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    )::BIGINT AS gcum
                FROM s GROUP BY qm),
         sv AS (SELECT source, qm, count(*)::BIGINT AS scnt,
                  sum(count(*)) OVER (PARTITION BY source ORDER BY qm
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    )::BIGINT AS scum
                FROM s GROUP BY source, qm),
         ns AS (SELECT source, count(*)::BIGINT AS n_s FROM s
                GROUP BY 1),
         nn AS (SELECT count(*)::BIGINT AS bign FROM s),
         dd AS (SELECT unnest(range(1, 10))::BIGINT AS decile),
         sq AS (SELECT sv.source, dd.decile,
                  min(sv.qm) AS src_q_micro
                FROM sv JOIN ns USING (source), dd
                WHERE sv.scum * 10 >= dd.decile * ns.n_s
                GROUP BY 1, 2),
         cq AS (SELECT dd.decile, min(gv.qm) AS corpus_q_micro
                FROM gv, nn, dd
                WHERE gv.gcum * 10 >= dd.decile * nn.bign
                GROUP BY 1)
         SELECT sq.source, sq.decile, sq.src_q_micro, cq.corpus_q_micro,
           sq.src_q_micro - cq.corpus_q_micro AS delta_micro
         FROM sq JOIN cq USING (decile)""",
    // q294: the full q129 statement as a subquery; micro margins
    // summed as BIGINT, one division per cell mean.
    "q294_lang_confusion" ->
      s"""WITH nb AS (SELECT lang, pred_lang,
                 CAST(round(margin * 1e6) AS BIGINT) AS mm
               FROM ($nbLangIdOracleSql) x),
         tr AS (SELECT lang, count(*)::BIGINT AS n_true FROM nb
                GROUP BY 1),
         cell AS (SELECT lang, pred_lang, count(*)::BIGINT AS n,
                   sum(mm)::BIGINT AS mm_sum,
                   sum(CASE WHEN mm < 1000000 THEN 1 ELSE 0 END)::BIGINT
                     AS low_margin_n
                 FROM nb GROUP BY 1, 2)
         SELECT cell.lang, cell.pred_lang, cell.n,
           (((2*(cell.n) * 1000000 + (tr.n_true)) // (2*(tr.n_true)))::BIGINT)
             AS row_share_ppm,
           CAST(round(cell.mm_sum::DOUBLE / cell.n) AS BIGINT)
             AS mean_margin_micro,
           cell.low_margin_n
         FROM cell JOIN tr USING (lang)""",
    // q295: same top-2 pick, the hash60 mod-(n_a+n_b) assignment per
    // replicate, micro-rounded means before the extreme comparison.
    "q295_perm_test" ->
      s"""WITH $qMicroCte,
         s AS (SELECT d.doc_id, d.source,
                 q2.q_micro AS qm
               FROM documents d JOIN qm q2 USING (doc_id)),
         cnt AS (SELECT source, count(*)::BIGINT AS n_src FROM s
                 GROUP BY 1),
         t2 AS (SELECT source, grp FROM
                 (SELECT source, row_number() OVER
                    (ORDER BY n_src DESC, source ASC) AS grp
                  FROM cnt) WHERE grp <= 2),
         ab AS (SELECT s.doc_id, s.qm, t2.grp FROM s
                JOIN t2 USING (source)),
         sz AS (SELECT
                  sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)::BIGINT
                    AS n_a,
                  sum(CASE WHEN grp = 2 THEN 1 ELSE 0 END)::BIGINT
                    AS n_b,
                  sum(CASE WHEN grp = 1 THEN qm ELSE 0 END)::BIGINT
                    AS qa,
                  sum(CASE WHEN grp = 2 THEN qm ELSE 0 END)::BIGINT
                    AS qb
                FROM ab),
         nm AS (SELECT
                  max(CASE WHEN grp = 1 THEN source END) AS source_a,
                  max(CASE WHEN grp = 2 THEN source END) AS source_b
                FROM (SELECT t2.*, cnt.n_src FROM t2
                      JOIN cnt USING (source))),
         rp AS (SELECT r.rep, ab.qm,
                  ('0x' || substr(md5(ab.doc_id::VARCHAR || ':'
                    || r.rep), 1, 15))::BIGINT
                    % (sz.n_a + sz.n_b) < sz.n_a AS to_a
                FROM ab, (SELECT unnest(range(0, 200)) AS rep) r, sz),
         ag AS (SELECT rep,
                  sum(CASE WHEN to_a THEN qm ELSE 0 END)::BIGINT AS ra,
                  sum(CASE WHEN to_a THEN 1 ELSE 0 END)::BIGINT AS ca,
                  sum(CASE WHEN NOT to_a THEN qm ELSE 0 END)::BIGINT
                    AS rb,
                  sum(CASE WHEN NOT to_a THEN 1 ELSE 0 END)::BIGINT
                    AS cb
                FROM rp GROUP BY 1),
         rd AS (SELECT rep,
                  CAST(round(ra::DOUBLE / ca) AS BIGINT)
                    - CAST(round(rb::DOUBLE / cb) AS BIGINT) AS rdiff
                FROM ag),
         ob AS (SELECT sz.*,
                  CAST(round(qa::DOUBLE / n_a) AS BIGINT)
                    - CAST(round(qb::DOUBLE / n_b) AS BIGINT) AS obs
                FROM sz)
         SELECT nm.source_a, nm.source_b, ob.n_a, ob.n_b,
           ob.obs AS obs_diff_micro,
           sum(CASE WHEN abs(rdiff) >= abs(ob.obs) THEN 1 ELSE 0
             END)::BIGINT AS n_extreme,
           count(*)::BIGINT AS b,
           (((2*(sum(CASE WHEN abs(rdiff) >= abs(ob.obs) THEN 1 ELSE 0 END) + 1) * 1000000 + (count(*) + 1)) // (2*(count(*) + 1)))::BIGINT) AS p_micro,
           (sum(CASE WHEN abs(rdiff) >= abs(ob.obs) THEN 1 ELSE 0
             END) + 1) * 20 < (count(*) + 1) AS significant
         FROM rd, ob, nm GROUP BY 1, 2, 3, 4, 5""",
    // q296: integer-div hour buckets, dense zero-filled grid, the
    // milli-mean pivot, exact BIGINT ACF sums, lead() lattice.
    "q296_hourly_acf" ->
      """WITH c AS (SELECT event_type,
                 epoch_us(ts) // 3600000000 AS h,
                 count(*)::BIGINT AS x
               FROM events GROUP BY 1, 2),
         sp AS (SELECT event_type, min(h) AS h_min, max(h) AS h_max
                FROM c GROUP BY 1),
         g AS (SELECT event_type, unnest(range(h_min, h_max + 1)) AS h
               FROM sp),
         dn AS (SELECT g.event_type, g.h,
                  coalesce(c.x, 0)::BIGINT AS x
                FROM g LEFT JOIN c USING (event_type, h)),
         m AS (SELECT event_type,
                 (((2*(sum(x) * 1000) + (count(*))) // (2*(count(*))))::BIGINT) AS m_milli
               FROM dn GROUP BY 1),
         dv AS (SELECT dn.event_type, dn.h,
                  1000 * dn.x - m.m_milli AS d
                FROM dn JOIN m USING (event_type)),
         ld AS (SELECT event_type, d,
                  lead(d, 1) OVER (PARTITION BY event_type
                    ORDER BY h) AS d1,
                  lead(d, 24) OVER (PARTITION BY event_type
                    ORDER BY h) AS d24,
                  lead(d, 168) OVER (PARTITION BY event_type
                    ORDER BY h) AS d168
                FROM dv),
         ag AS (SELECT event_type, count(*)::BIGINT AS n_hours,
                  sum(d * d)::BIGINT AS den,
                  sum(CASE WHEN d1 IS NULL THEN 0 ELSE d * d1
                    END)::BIGINT AS num1,
                  sum(CASE WHEN d24 IS NULL THEN 0 ELSE d * d24
                    END)::BIGINT AS num24,
                  sum(CASE WHEN d168 IS NULL THEN 0 ELSE d * d168
                    END)::BIGINT AS num168
                FROM ld GROUP BY 1),
         l AS (SELECT unnest([1, 24, 168])::BIGINT AS lag)
         SELECT event_type, l.lag, n_hours,
           CASE WHEN den = 0 THEN 0
                ELSE (CASE WHEN ((CASE l.lag WHEN 1 THEN num1 WHEN 24 THEN num24 ELSE num168 END) * 1000000) < 0 THEN -(((2*(-((CASE l.lag WHEN 1 THEN num1 WHEN 24 THEN num24 ELSE num168 END) * 1000000)) + (den)) // (2*(den)))::BIGINT) ELSE (((2*((CASE l.lag WHEN 1 THEN num1 WHEN 24 THEN num24 ELSE num168 END) * 1000000) + (den)) // (2*(den)))::BIGINT) END)
           END AS acf_micro,
           den <> 0 AND (CASE l.lag WHEN 1 THEN num1
             WHEN 24 THEN num24 ELSE num168 END) * 5 > den
             AS seasonal
         FROM ag, l""",
    // q297: the q289 chain swept over an unnested alpha lattice; the
    // per-alpha argmax via the same (rep desc, lang asc) window.
    "q297_alpha_sweep" ->
      """WITH pl AS (SELECT lang, count(*) AS n_docs
                     FROM documents GROUP BY 1),
         tot AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS tot FROM pl),
         a AS (SELECT unnest([0, 30, 50, 70, 100])::BIGINT
                 AS alpha_centi),
         qraw AS (SELECT lang, n_docs, tot, alpha_centi,
                   pow(n_docs / tot, alpha_centi / 100.0) AS qr
                 FROM pl CROSS JOIN tot CROSS JOIN a),
         qs AS (SELECT alpha_centi, sum(qr) AS qs FROM qraw
                GROUP BY 1),
         t AS (SELECT qraw.lang, qraw.n_docs, qraw.tot,
                 qraw.alpha_centi, qraw.qr / qs.qs AS q
               FROM qraw JOIN qs USING (alpha_centi)),
         t2 AS (SELECT lang, n_docs, tot, alpha_centi,
                  CAST(round(q * q / n_docs * 1e15) AS BIGINT)
                    AS t_femto,
                  CAST(round(0.5 * tot * q / n_docs * 1e6) AS BIGINT)
                    AS rep_micro
                FROM t),
         fs AS (SELECT alpha_centi, sum(t_femto)::BIGINT AS f_sum
                FROM t2 GROUP BY 1),
         tp AS (SELECT alpha_centi, tot, rep_micro AS max_rep_micro,
                  lang AS max_rep_lang
                FROM (SELECT t2.*, row_number() OVER
                       (PARTITION BY alpha_centi
                        ORDER BY rep_micro DESC, lang ASC) AS rn
                      FROM t2) WHERE rn = 1)
         SELECT tp.alpha_centi,
           (((2*(1000000000000000) + (fs.f_sum)) // (2*(fs.f_sum)))::BIGINT) AS ess_docs,
           (((2*(((2*(1000000000000000000) + (fs.f_sum)) // (2*(fs.f_sum))) * 1000) + (CAST(tp.tot AS BIGINT))) // (2*(CAST(tp.tot AS BIGINT))))::BIGINT)
             AS ess_ppm,
           tp.max_rep_micro, tp.max_rep_lang
         FROM tp JOIN fs USING (alpha_centi)""",
    // q298: the q281 integer-pivot second moment; same z constants
    // and delta, same ceil.
    "q298_power_audit" ->
      s"""WITH $qMicroCte,
         s AS (SELECT d.doc_id, d.source,
                 q2.q_micro AS qm
               FROM documents d JOIN qm q2 USING (doc_id)),
         mn AS (SELECT source, (CASE WHEN (sum(qm)) < 0 THEN -(((2*(-(sum(qm))) + (count(*))) // (2*(count(*))))::BIGINT) ELSE (((2*(sum(qm)) + (count(*))) // (2*(count(*))))::BIGINT) END)
                  AS mean_micro
                FROM s GROUP BY 1),
         ag AS (SELECT s.source, count(*)::BIGINT AS n,
                  max(mn.mean_micro)::BIGINT AS mean_micro,
                  sum((s.qm - mn.mean_micro)
                    * (s.qm - mn.mean_micro))::BIGINT AS s2
                FROM s JOIN mn USING (source) GROUP BY 1)
         SELECT source, n, mean_micro,
           CAST(round(s2::DOUBLE / n) AS BIGINT) AS var_micro2,
           CAST(ceil((1.96 + 0.8416) * (1.96 + 0.8416)
             * (s2::DOUBLE / n) / (10000.0 * 10000.0)) AS BIGINT)
             AS n_needed,
           n < ceil((1.96 + 0.8416) * (1.96 + 0.8416)
             * (s2::DOUBLE / n) / (10000.0 * 10000.0)) AS underpowered
         FROM ag""",
    // q299: the q288 digit-count strata, micro-integer stratum means,
    // exact-integer expectation dot product.
    "q299_adjusted_quality" ->
      s"""WITH $qMicroCte,
         x AS (SELECT doc_id, source,
                 length(CAST((CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                   END)::BIGINT AS VARCHAR)) AS stratum
               FROM documents),
         s AS (SELECT x.source, x.stratum,
                 q2.q_micro AS qm
               FROM x JOIN qm q2 USING (doc_id)),
         cs AS (SELECT stratum, (CASE WHEN (sum(qm)) < 0 THEN -(((2*(-(sum(qm))) + (count(*))) // (2*(count(*))))::BIGINT) ELSE (((2*(sum(qm)) + (count(*))) // (2*(count(*))))::BIGINT) END)
                  AS cm_micro
                FROM s GROUP BY 1),
         cm AS (SELECT (CASE WHEN (sum(qm)) < 0 THEN -(((2*(-(sum(qm))) + (count(*))) // (2*(count(*))))::BIGINT) ELSE (((2*(sum(qm)) + (count(*))) // (2*(count(*))))::BIGINT) END) AS corpus_micro
                FROM s),
         ag AS (SELECT source, stratum, count(*)::BIGINT AS n_ss,
                  sum(qm)::BIGINT AS q_ss
                FROM s GROUP BY 1, 2),
         j AS (SELECT source, sum(n_ss)::BIGINT AS n,
                 sum(q_ss)::BIGINT AS qsum,
                 sum(n_ss * cs.cm_micro)::BIGINT AS esum
               FROM ag JOIN cs USING (stratum) GROUP BY 1)
         SELECT source, n,
           CAST(round(qsum::DOUBLE / n) AS BIGINT) AS actual_micro,
           CAST(round(esum::DOUBLE / n) AS BIGINT) AS expected_micro,
           cm.corpus_micro,
           CAST(round(qsum::DOUBLE / n) AS BIGINT) - cm.corpus_micro
             AS raw_gap_micro,
           CAST(round(qsum::DOUBLE / n) AS BIGINT)
             - CAST(round(esum::DOUBLE / n) AS BIGINT)
             AS adj_gap_micro
         FROM j, cm""",
    // q300: the shared gate-flag CTEs, 16-pattern counts, and the
    // IDENTICAL subset lattice (generated from the same Scala seq).
    "q300_gate_shapley" -> {
      val latRows = graft.operators.TextAnalysis.gateShapleyLattice
        .map { case (g, ig, il, im, ip, w) =>
          s"('$g', $ig, $il, $im, $ip, $w)"
        }
        .mkString(", ")
      s"""WITH $gateFlagsCtes,
         wd AS (SELECT doc_id,
                  max(CASE WHEN gate = 'gopher' THEN f END) AS fg,
                  max(CASE WHEN gate = 'lr' THEN f END) AS fl2,
                  max(CASE WHEN gate = 'ml' THEN f END) AS fm,
                  max(CASE WHEN gate = 'ppl' THEN f END) AS fp
                FROM fl GROUP BY 1),
         wf AS (SELECT * FROM wd WHERE fg IS NOT NULL
                  AND fl2 IS NOT NULL AND fm IS NOT NULL
                  AND fp IS NOT NULL),
         pat AS (SELECT fg, fl2, fm, fp, count(*)::BIGINT AS c
                 FROM wf GROUP BY 1, 2, 3, 4),
         tot AS (SELECT sum(c)::BIGINT AS n,
                  sum(CASE WHEN NOT (fg AND fl2 AND fm AND fp)
                    THEN c ELSE 0 END)::BIGINT AS killed_total
                 FROM pat),
         lat AS (SELECT * FROM (VALUES $latRows)
                   v(gate, ig, il, im, ip, w24)),
         sh AS (SELECT lat.gate,
                  sum(CASE WHEN (lat.ig = 0 OR pat.fg)
                    AND (lat.il = 0 OR pat.fl2)
                    AND (lat.im = 0 OR pat.fm)
                    AND (lat.ip = 0 OR pat.fp)
                    AND NOT (CASE lat.gate WHEN 'gopher' THEN pat.fg
                      WHEN 'lr' THEN pat.fl2 WHEN 'ml' THEN pat.fm
                      ELSE pat.fp END)
                    THEN pat.c * lat.w24 ELSE 0 END)::BIGINT
                    AS shapley_24ths
                FROM pat CROSS JOIN lat GROUP BY 1)
         SELECT sh.gate, tot.n, tot.killed_total, sh.shapley_24ths,
           (CASE WHEN (sh.shapley_24ths * 1000000) < 0 THEN -(((2*(-(sh.shapley_24ths * 1000000)) + (tot.n * 24)) // (2*(tot.n * 24)))::BIGINT) ELSE (((2*(sh.shapley_24ths * 1000000) + (tot.n * 24)) // (2*(tot.n * 24)))::BIGINT) END) AS shapley_ppm
         FROM sh, tot"""
    },
    // q301: the batch q254 chain restricted to CLOSED hours (every
    // hour strictly before each type's max) — the stream's final
    // open bucket is not complete, so it never emits.
    "q301_stream_bursts" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour,
                 count(*)::BIGINT AS n
               FROM events GROUP BY 1, 2),
         mx AS (SELECT event_type, max(hour) AS h_max FROM h
                GROUP BY 1),
         w AS (SELECT event_type, hour, n,
                 count(*) OVER tw AS k, sum(n) OVER tw AS s,
                 sum(n * n) OVER tw AS s2
               FROM h WINDOW tw AS (PARTITION BY event_type
                 ORDER BY hour ROWS BETWEEN 24 PRECEDING
                 AND 1 PRECEDING))
         SELECT w.event_type, epoch_us(w.hour)::BIGINT AS hour_us,
           w.n, k::BIGINT AS n_prev,
           CASE WHEN k >= 12
                 AND (s2::DOUBLE - s::DOUBLE * s / k) / k > 0
                THEN CAST(round((n - s::DOUBLE / k)
                  / sqrt((s2::DOUBLE - s::DOUBLE * s / k) / k) * 1e6)
                  AS BIGINT) END AS z_micro,
           coalesce(k >= 12
             AND (s2::DOUBLE - s::DOUBLE * s / k) / k > 0
             AND (n - s::DOUBLE / k)
               / sqrt((s2::DOUBLE - s::DOUBLE * s / k) / k) > 3.0,
             false) AS burst
         FROM w JOIN mx USING (event_type)
         WHERE w.hour < mx.h_max""",
    // q302: the q240 broadcast-eval topology at k=5; the zero-
    // occurrence mass appended from the corpus/appearing totals.
    "q302_hubness" -> {
      val pairCos = cosSql("q_vec", "e.embedding")
      s"""WITH ev AS (SELECT vec_id AS q_id, embedding AS q_vec
               FROM embeddings WHERE vec_id % 5 = 0),
         s AS (SELECT ev.q_id, e.vec_id, $pairCos AS sim
               FROM embeddings e JOIN ev ON e.vec_id <> ev.q_id),
         r AS (SELECT q_id, vec_id,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY sim DESC, vec_id ASC) AS rk
               FROM s),
         oc AS (SELECT vec_id, count(*)::BIGINT AS occurrences
                FROM r WHERE rk <= 5 GROUP BY 1),
         hh AS (SELECT occurrences, count(*)::BIGINT AS n_vectors
                FROM oc GROUP BY 1),
         t AS (SELECT count(*)::BIGINT AS n_corpus FROM embeddings),
         ap AS (SELECT count(*)::BIGINT AS n_app FROM oc),
         u AS (SELECT occurrences, n_vectors FROM hh
               UNION ALL
               SELECT 0::BIGINT, (t.n_corpus - ap.n_app)::BIGINT
               FROM t, ap)
         SELECT occurrences, n_vectors,
           (((2*(n_vectors) * 1000000 + (t.n_corpus)) // (2*(t.n_corpus)))::BIGINT)
             AS share_ppm
         FROM u, t"""
    },
    // q303: the q58 KMV chain per source over token hashes — same
    // 60-bit hash, same (k-1)*2^60/h_k estimator, same k=256.
    "q303_kmv_error" ->
      """WITH tk AS (SELECT source,
             unnest(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+')
                    END) AS w
           FROM documents),
         h AS (SELECT DISTINCT source,
                 ('0x' || substr(md5(w), 1, 15))::BIGINT AS h
               FROM tk),
         r AS (SELECT source, h,
                 row_number() OVER (PARTITION BY source ORDER BY h)
                   AS rk,
                 count(*) OVER (PARTITION BY source) AS nd
               FROM h),
         e AS (SELECT source,
                 CASE WHEN any_value(nd) < 256
                      THEN any_value(nd)::DOUBLE
                      ELSE 255::DOUBLE * 1152921504606846976::DOUBLE
                           / max(CASE WHEN rk = 256 THEN h END)::DOUBLE
                 END AS est,
                 CAST(any_value(nd) AS BIGINT) AS n_exact
               FROM r GROUP BY 1)
         SELECT source, n_exact, round(est, 6) AS kmv_estimate,
           CAST(round(abs(est - n_exact) / n_exact * 1e6) AS BIGINT)
             AS err_ppm
         FROM e""",
    // q304: global (h, doc_id) cumsum, integral-division pick test,
    // same budget and milli deviation columns.
    "q304_systematic_sample" ->
      """WITH d AS (SELECT doc_id, source, n_tokens,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h
           FROM (SELECT doc_id, source,
                   (CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '\s+'))
                    END)::BIGINT AS n_tokens
                 FROM documents) x
           WHERE n_tokens > 0),
         c AS (SELECT source, n_tokens,
                 sum(n_tokens) OVER (ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS cum
               FROM d),
         t AS (SELECT sum(n_tokens)::BIGINT AS t FROM d),
         s AS (SELECT source, n_tokens,
                 (cum * 1000) // t.t
                   - ((cum - n_tokens) * 1000) // t.t AS sel
               FROM c, t)
         SELECT source, count(*)::BIGINT AS n_docs,
           sum(sel)::BIGINT AS n_sel,
           (((2*(sum(n_tokens) * 1000000) + (t.t)) // (2*(t.t)))::BIGINT) AS expected_milli,
           sum(sel)::BIGINT * 1000
             - (((2*(sum(n_tokens) * 1000000) + (t.t)) // (2*(t.t)))::BIGINT) AS dev_milli
         FROM s, t GROUP BY source, t.t""",
    // q305: exact integer-pivot sd, micro-quantized quotas, the q268
    // Hamilton base/remainder split run twice.
    "q305_neyman_alloc" ->
      s"""WITH $qMicroCte,
         s AS (SELECT d.doc_id, d.source,
                 q2.q_micro AS qm
               FROM documents d JOIN qm q2 USING (doc_id)),
         mn AS (SELECT source, (CASE WHEN (sum(qm)) < 0 THEN -(((2*(-(sum(qm))) + (count(*))) // (2*(count(*))))::BIGINT) ELSE (((2*(sum(qm)) + (count(*))) // (2*(count(*))))::BIGINT) END)
                  AS mean_micro
                FROM s GROUP BY 1),
         mom AS (SELECT s.source, count(*)::BIGINT AS n_docs,
                  sum((s.qm - mn.mean_micro)
                    * (s.qm - mn.mean_micro))::BIGINT AS s2
                 FROM s JOIN mn USING (source) GROUP BY 1),
         m2 AS (SELECT source, n_docs, s2,
                  sqrt(s2::DOUBLE / n_docs) AS sd
                FROM mom),
         tt AS (SELECT sum(n_docs::DOUBLE * sd) AS w_ney,
                  sum(n_docs)::BIGINT AS w_prop
                FROM m2),
         q AS (SELECT m2.source, m2.n_docs, m2.sd,
                 CAST(round(m2.n_docs::DOUBLE * m2.sd / tt.w_ney
                   * 1000 * 1e6) AS BIGINT) AS q_ney,
                 (((2*(m2.n_docs * 1000000000) + (tt.w_prop)) // (2*(tt.w_prop)))::BIGINT) AS q_prop
               FROM m2, tt),
         b1 AS (SELECT q.*,
                 (q_ney - q_ney % 1000000) // 1000000 AS base_n,
                 q_ney % 1000000 AS rem_n,
                 (q_prop - q_prop % 1000000) // 1000000 AS base_p,
                 q_prop % 1000000 AS rem_p
               FROM q),
         lv AS (SELECT greatest(1000 - sum(base_n), 0) AS left_n,
                  greatest(1000 - sum(base_p), 0) AS left_p
                FROM b1),
         rk AS (SELECT b1.*,
                 row_number() OVER (ORDER BY rem_n DESC, source ASC)
                   AS rk_n,
                 row_number() OVER (ORDER BY rem_p DESC, source ASC)
                   AS rk_p
               FROM b1)
         SELECT rk.source, rk.n_docs,
           CAST(round(rk.sd) AS BIGINT) AS sd_micro,
           rk.q_ney AS quota_micro,
           (rk.base_n + CASE WHEN rk.rk_n <= lv.left_n THEN 1 ELSE 0
             END)::BIGINT AS alloc_neyman,
           (rk.base_p + CASE WHEN rk.rk_p <= lv.left_p THEN 1 ELSE 0
             END)::BIGINT AS alloc_prop,
           (rk.base_n + CASE WHEN rk.rk_n <= lv.left_n THEN 1 ELSE 0
             END)::BIGINT
             - (rk.base_p + CASE WHEN rk.rk_p <= lv.left_p THEN 1
                 ELSE 0 END)::BIGINT AS shift
         FROM rk, lv""",
    // q306: same rank construction, exact x_(k+1) pick, nano-log
    // summands, NULL alpha on the all-ties degenerate case.
    "q306_hill_tail" ->
      """WITH d AS (SELECT doc_id, source,
             (CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\s+'))
              END)::BIGINT AS x
           FROM documents),
         f AS (SELECT * FROM d WHERE x > 0),
         r AS (SELECT source, doc_id, x,
                 row_number() OVER (PARTITION BY source
                   ORDER BY x DESC, doc_id ASC)::BIGINT AS rk,
                 count(*) OVER (PARTITION BY source)::BIGINT AS n_s
               FROM f),
         g AS (SELECT *, (n_s - n_s % 10) // 10 AS k FROM r
               WHERE n_s >= 20),
         th AS (SELECT source, x AS xk1 FROM g WHERE rk = k + 1),
         tm AS (SELECT g.source, g.n_s, g.k, th.xk1,
                 sum(CAST(round(ln(g.x::DOUBLE / th.xk1) * 1e9)
                   AS BIGINT))::BIGINT AS t_sum
               FROM g JOIN th USING (source)
               WHERE g.rk <= g.k
               GROUP BY 1, 2, 3, 4)
         SELECT source, n_s AS n, k, xk1,
           CASE WHEN t_sum = 0 THEN NULL
                ELSE CAST(round(k::DOUBLE * 1e9 / t_sum * 1e3)
                  AS BIGINT)
           END AS alpha_milli,
           coalesce(t_sum <> 0
             AND k::DOUBLE * 1e9 / t_sum < 2.0, false) AS heavy_tail
         FROM tm""",
    // q307: the q116 rolling content hash, mod-1000-before-combining
    // energies, the same rank-difference islands.
    "q307_audio_segments" ->
      """WITH base AS (
           SELECT doc_id,
             list_reduce(list_prepend(0::BIGINT,
               list_transform(range(length(text)),
                 i -> ord(substr(text, (i+1)::INT, 1))::BIGINT)),
               (a, c) -> (a * 31 + c) % 1000000007) AS h,
             (octet_length(encode(text)) % 120 + 4)::BIGINT
               AS n_windows
           FROM documents),
         wx AS (SELECT doc_id, h,
                  unnest(range(n_windows))::BIGINT AS w
                FROM base),
         e AS (SELECT doc_id, w,
                 (((h % 1000 + 1000) % 1000)
                   + ((w * 2654435761) % 1000)) % 1000 AS energy
               FROM wx),
         k AS (SELECT doc_id, w, energy,
                 w - row_number() OVER (PARTITION BY doc_id
                   ORDER BY w) AS grp
               FROM e WHERE energy >= 100)
         SELECT doc_id, min(w)::BIGINT AS seg_start,
           max(w)::BIGINT AS seg_end,
           count(*)::BIGINT AS n_windows,
           (CASE WHEN (sum(energy)) < 0 THEN -(((2*(-(sum(energy))) + (count(*))) // (2*(count(*))))::BIGINT) ELSE (((2*(sum(energy)) + (count(*))) // (2*(count(*))))::BIGINT) END) AS mean_energy_milli
         FROM k GROUP BY doc_id, grp""",
    // q308: the q296 dense-series CTEs, prefix-sum/prefix-min closed
    // form, same 8-sigma alarm and last-peak tiebreak.
    "q308_cusum" ->
      """WITH c AS (SELECT event_type,
                 epoch_us(ts) // 3600000000 AS h,
                 count(*)::BIGINT AS x
               FROM events GROUP BY 1, 2),
         sp AS (SELECT event_type, min(h) AS h_min, max(h) AS h_max
                FROM c GROUP BY 1),
         g AS (SELECT event_type, unnest(range(h_min, h_max + 1)) AS h
               FROM sp),
         dn AS (SELECT g.event_type, g.h,
                  coalesce(c.x, 0)::BIGINT AS x
                FROM g LEFT JOIN c USING (event_type, h)),
         m AS (SELECT event_type,
                 (((2*(sum(x) * 1000) + (count(*))) // (2*(count(*))))::BIGINT) AS m_milli
               FROM dn GROUP BY 1),
         dv AS (SELECT dn.event_type, dn.h,
                  1000 * dn.x - m.m_milli AS d
                FROM dn JOIN m USING (event_type)),
         pp AS (SELECT event_type, h, d,
                  sum(d) OVER tw::BIGINT AS p
                FROM dv WINDOW tw AS (PARTITION BY event_type
                  ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW)),
         pm AS (SELECT event_type, h, d, p,
                  min(p) OVER tw::BIGINT AS pmin
                FROM pp WINDOW tw AS (PARTITION BY event_type
                  ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW)),
         s AS (SELECT event_type, h, d,
                 p - least(pmin, 0) AS s
               FROM pm),
         sd AS (SELECT event_type, count(*)::BIGINT AS n_hours,
                  sqrt(sum(d * d)::DOUBLE / count(*)) AS sigma
                FROM dv GROUP BY 1),
         f AS (SELECT s.event_type, s.h, s.s, sd.n_hours, sd.sigma,
                 s.s::DOUBLE > 8.0 * sd.sigma AS alarm
               FROM s JOIN sd USING (event_type)),
         sm AS (SELECT event_type, max(n_hours)::BIGINT AS n_hours,
                  CAST(round(max(sigma)) AS BIGINT) AS sigma_milli,
                  max(s)::BIGINT AS max_cusum_milli,
                  sum(CASE WHEN alarm THEN 1 ELSE 0 END)::BIGINT
                    AS n_alarms,
                  min(CASE WHEN alarm THEN h END)::BIGINT
                    AS first_alarm_h
                FROM f GROUP BY 1),
         pk AS (SELECT f.event_type, max(f.h)::BIGINT AS peak_h
                FROM f JOIN sm USING (event_type)
                WHERE f.s = sm.max_cusum_milli GROUP BY 1)
         SELECT sm.event_type, sm.n_hours, sm.sigma_milli,
           sm.max_cusum_milli, pk.peak_h, sm.n_alarms,
           sm.first_alarm_h
         FROM sm JOIN pk USING (event_type)""",
    // q309: generated from the SAME pattern seq as the operator;
    // list_sum over match lengths with the empty-list coalesce.
    "q309_pii_census" -> {
      val arms = graft.operators.TextAnalysis.piiPatterns
        .map { case (name, re) =>
          s"""SELECT source, '$name' AS pii_type,
             len(regexp_extract_all(text, '$re'))::BIGINT AS n_matches,
             coalesce(list_sum(list_transform(
               regexp_extract_all(text, '$re'),
               m -> length(m))), 0)::BIGINT AS n_chars
           FROM documents"""
        }
        .mkString("\n           UNION ALL\n           ")
      s"""WITH p AS ($arms)
         SELECT source, pii_type,
           sum(CASE WHEN n_matches > 0 THEN 1 ELSE 0 END)::BIGINT
             AS docs_affected,
           sum(n_matches)::BIGINT AS n_matches,
           sum(n_chars)::BIGINT AS chars_matched,
           (((2*(sum(CASE WHEN n_matches > 0 THEN 1 ELSE 0 END)) * 1000000 + (count(*))) // (2*(count(*))))::BIGINT) AS affected_ppm
         FROM p GROUP BY 1, 2"""
    },
    // q310: same hash order, same floor/cap arithmetic, rank-based
    // exact-k selection.
    "q310_coverage_holdout" ->
      """WITH d AS (SELECT doc_id, source, lang,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h
           FROM documents),
         cn AS (SELECT source, lang, count(*)::BIGINT AS n_cell
                FROM d GROUP BY 1, 2),
         ct AS (SELECT source, lang, n_cell,
                 least(n_cell, greatest(5,
                   CAST(round(n_cell * 0.05) AS BIGINT))) AS k_target
               FROM cn),
         r AS (SELECT d.source, d.lang, d.doc_id, ct.n_cell,
                 ct.k_target,
                 row_number() OVER (PARTITION BY d.source, d.lang
                   ORDER BY d.h, d.doc_id)::BIGINT AS rk
               FROM d JOIN ct USING (source, lang))
         SELECT source, lang, max(n_cell)::BIGINT AS n_cell,
           max(k_target)::BIGINT AS k_target,
           sum(CASE WHEN rk <= k_target THEN 1 ELSE 0 END)::BIGINT
             AS n_held,
           sum(CASE WHEN rk <= k_target THEN 1 ELSE 0 END)
             = max(k_target) AS target_met,
           min(CASE WHEN rk <= k_target THEN doc_id END)::BIGINT
             AS first_held_doc
         FROM r GROUP BY 1, 2""",
    // q311: per-dim raw-moment split on vec_id parity; identical
    // mean/variance/z expression order, micro/milli quantization.
    "q311_embedding_drift" ->
      """WITH c AS (SELECT vec_id % 2 = 0 AS snap_a,
                 r.i AS dim, embedding[(r.i + 1)::INT]::DOUBLE AS v
               FROM embeddings CROSS JOIN range(64) r(i)),
         ag AS (SELECT dim, snap_a, count(*)::BIGINT AS n,
                  sum(v) AS s1, sum(v * v) AS s2,
                  sum(CAST(round(v * 1e6) AS BIGINT))::BIGINT AS sm
                FROM c GROUP BY 1, 2),
         a AS (SELECT dim, n AS n_a, s1 AS sa1, s2 AS sa2, sm AS sma
               FROM ag WHERE snap_a),
         b AS (SELECT dim, n AS n_b, s1 AS sb1, s2 AS sb2, sm AS smb
               FROM ag WHERE NOT snap_a),
         j AS (SELECT a.dim, n_a, n_b, sma, smb,
                 sa1 / n_a AS ma, sb1 / n_b AS mb,
                 sa2 / n_a - (sa1 / n_a) * (sa1 / n_a) AS va,
                 sb2 / n_b - (sb1 / n_b) * (sb1 / n_b) AS vb
               FROM a JOIN b USING (dim))
         SELECT dim::INTEGER AS dim, n_a, n_b,
           (CASE WHEN (sma) < 0 THEN -(((2*(-(sma)) + (n_a)) // (2*(n_a)))::BIGINT) ELSE (((2*(sma) + (n_a)) // (2*(n_a)))::BIGINT) END) AS mean_a_micro,
           (CASE WHEN (smb) < 0 THEN -(((2*(-(smb)) + (n_b)) // (2*(n_b)))::BIGINT) ELSE (((2*(smb) + (n_b)) // (2*(n_b)))::BIGINT) END) AS mean_b_micro,
           (CASE WHEN (smb) < 0 THEN -(((2*(-(smb)) + (n_b)) // (2*(n_b)))::BIGINT) ELSE (((2*(smb) + (n_b)) // (2*(n_b)))::BIGINT) END) - (CASE WHEN (sma) < 0 THEN -(((2*(-(sma)) + (n_a)) // (2*(n_a)))::BIGINT) ELSE (((2*(sma) + (n_a)) // (2*(n_a)))::BIGINT) END) AS delta_micro,
           CASE WHEN sqrt(va / n_a + vb / n_b) = 0 THEN 0
                ELSE CAST(round((mb - ma)
                  / sqrt(va / n_a + vb / n_b) * 1e3) AS BIGINT)
           END AS z_milli,
           coalesce(sqrt(va / n_a + vb / n_b) <> 0
             AND abs((mb - ma) / sqrt(va / n_a + vb / n_b)) > 3.0,
             false) AS drifted
         FROM j""",
    // q312: same closed forms over the exact per-source hash
    // cardinality; ln on both engines, ceil/round identical.
    "q312_bloom_plan" ->
      """WITH tk AS (SELECT source,
             unnest(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+')
                    END) AS w
           FROM documents),
         cd AS (SELECT source, count(DISTINCT
                 ('0x' || substr(md5(w), 1, 15))::BIGINT)::BIGINT
                 AS n_keys
               FROM tk GROUP BY 1),
         x AS (SELECT source, n_keys,
                 unnest([10000, 1000])::BIGINT AS fpp_ppm
               FROM cd),
         y AS (SELECT source, n_keys, fpp_ppm,
                 CAST(ceil(-(n_keys::DOUBLE)
                   * ln(fpp_ppm::DOUBLE / 1e6)
                   / (ln(2.0) * ln(2.0))) AS BIGINT) AS bits
               FROM x)
         SELECT source, n_keys, fpp_ppm, bits,
           CAST(round(bits::DOUBLE / n_keys * ln(2.0)) AS BIGINT)
             AS k_hashes,
           (((2*(bits * 1000) + (8192)) // (2*(8192)))::BIGINT)
             AS kib_milli
         FROM y""",
    // q313: generated from the same class seq (RE2 escape column);
    // global-replace flag, length-difference counts, other = rest.
    "q313_script_census" -> {
      val cls = graft.operators.TextAnalysis.scriptClasses
      val cols = cls.map { case (name, _, re2) =>
        s"""(length(text) - length(regexp_replace(text, '$re2', '',
           'g')))::BIGINT AS c_$name"""
      }.mkString(",\n             ")
      val arms = cls.map { case (name, _, _) =>
        s"SELECT source, total, '$name' AS script, c_$name AS n_chars FROM p"
      }.mkString("\n           UNION ALL\n           ")
      val sumAll = cls.map(c => s"c_${c._1}").mkString(" + ")
      s"""WITH p AS (SELECT source, length(text)::BIGINT AS total,
             $cols
           FROM documents),
         u AS ($arms
           UNION ALL
           SELECT source, total, 'other', total - ($sumAll) FROM p)
         SELECT source, script, sum(n_chars)::BIGINT AS n_chars,
           (CASE WHEN sum(total) = 0 THEN NULL
             ELSE (((2*(sum(n_chars)) * 1000000 + (sum(total))) // (2*(sum(total))))::BIGINT) END) AS share_ppm
         FROM u GROUP BY 1, 2"""
    },
    // q314: same length lattice; window-min argmin flags over the
    // 6-row frontier; exact integer token sums.
    "q314_context_cost" ->
      """WITH n AS (SELECT (CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\s+'))
               END)::BIGINT AS n
             FROM documents),
         x AS (SELECT n.n, l.len,
                 CAST(ceil(n.n::DOUBLE / l.len) AS BIGINT)
                   AS n_windows
               FROM n, (SELECT unnest([128, 256, 512, 1024, 2048,
                   4096])::BIGINT AS len) l
               WHERE n.n > 0),
         ag AS (SELECT len, count(*)::BIGINT AS n_docs,
                  sum(n)::BIGINT AS total_tokens,
                  sum(n_windows * len - n)::BIGINT AS padded_tokens,
                  sum(n_windows * len)::BIGINT AS padded_capacity,
                  sum(greatest(n - len, 0))::BIGINT AS lost_tokens
                FROM x GROUP BY 1),
         mm AS (SELECT min(padded_tokens) AS min_pad,
                  min(lost_tokens) AS min_lost
                FROM ag)
         SELECT len, n_docs, total_tokens, padded_tokens,
           (((2*(padded_tokens) * 1000000 + (padded_capacity)) // (2*(padded_capacity)))::BIGINT) AS pad_waste_ppm,
           lost_tokens,
           (((2*(lost_tokens) * 1000000 + (total_tokens)) // (2*(total_tokens)))::BIGINT) AS lost_ppm,
           CASE WHEN padded_tokens < lost_tokens THEN 'pack'
                ELSE 'truncate' END AS cheaper_design,
           padded_tokens = mm.min_pad AS best_pack_l,
           lost_tokens = mm.min_lost AS best_truncate_l
         FROM ag, mm""",
    // q315: the q208 edge chain at J >= 0.5, recursive reach labels,
    // and the SAME five unrolled peel rounds.
    "q315_core_audit" -> {
      val peels = (1 to 5).map { i =>
        val prev = if (i == 1) "a0" else s"a${i - 1}"
        s"""e$i AS (SELECT sym.a, sym.b FROM sym
             JOIN $prev x ON sym.a = x.n
             JOIN $prev y ON sym.b = y.n),
         a$i AS (SELECT a AS n FROM e$i GROUP BY a
               HAVING count(*) >= 2)"""
      }.mkString(",\n         ")
      s"""WITH RECURSIVE $shinglesCte,
         e0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
                WHERE len(sh) > 0),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*) AS inter,
                  any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
                FROM e0 a JOIN e0 b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         ed AS (SELECT doc_a, doc_b FROM pr
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                  >= 0.5),
         sym AS (SELECT doc_a AS a, doc_b AS b FROM ed
                 UNION ALL SELECT doc_b, doc_a FROM ed),
         nodes AS (SELECT DISTINCT a AS id FROM sym),
         reach(x, y) AS (
           SELECT id, id FROM nodes
           UNION
           SELECT r.x, s.b FROM reach r JOIN sym s ON r.y = s.a),
         lab AS (SELECT x AS id, min(y) AS label
                 FROM reach GROUP BY 1),
         a0 AS (SELECT id AS n FROM nodes),
         $peels
         SELECT lab.label AS cluster_id,
           count(*)::BIGINT AS cluster_size,
           sum(CASE WHEN a5.n IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS core2_size,
           sum(CASE WHEN a5.n IS NOT NULL THEN 1 ELSE 0 END) > 0
             AS has_core,
           sum(CASE WHEN a5.n IS NOT NULL THEN 1 ELSE 0 END) = 0
             AND count(*) > 2 AS chain_suspect
         FROM lab LEFT JOIN a5 ON lab.id = a5.n GROUP BY 1"""
    },
    // q316: the q254 burst chain, one semi-joined event pass, the
    // micro-quantized expected contribution, top-3 per burst hour.
    "q316_burst_attribution" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour,
                 count(*)::BIGINT AS n
               FROM events GROUP BY 1, 2),
         w AS (SELECT event_type, hour, n,
                 count(*) OVER tw AS k, sum(n) OVER tw AS s,
                 sum(n * n) OVER tw AS s2
               FROM h WINDOW tw AS (PARTITION BY event_type
                 ORDER BY hour ROWS BETWEEN 24 PRECEDING
                 AND 1 PRECEDING)),
         bu AS (SELECT event_type, epoch_us(hour)::BIGINT AS hour_us,
                  n AS hour_n
                FROM w
                WHERE k >= 12
                  AND (s2::DOUBLE - s::DOUBLE * s / k) / k > 0
                  AND (n - s::DOUBLE / k)
                    / sqrt((s2::DOUBLE - s::DOUBLE * s / k) / k)
                    > 3.0),
         ev AS (SELECT event_type,
                  epoch_us(date_trunc('hour', ts))::BIGINT AS hour_us,
                  user_id
                FROM events),
         tt AS (SELECT event_type, count(*)::BIGINT AS type_n
                FROM ev GROUP BY 1),
         us AS (SELECT event_type, user_id, count(*)::BIGINT AS user_n
                FROM ev GROUP BY 1, 2),
         ib AS (SELECT ev.event_type, ev.hour_us, ev.user_id,
                  count(*)::BIGINT AS n_in_hour,
                  max(bu.hour_n)::BIGINT AS hour_n
                FROM ev JOIN bu USING (event_type, hour_us)
                GROUP BY 1, 2, 3),
         sc AS (SELECT ib.event_type, ib.hour_us, ib.user_id,
                  ib.n_in_hour, us.user_n,
                  ib.n_in_hour * 1000000
                    - (((2*(us.user_n * ib.hour_n) * 1000000 + (tt.type_n)) // (2*(tt.type_n)))::BIGINT) AS excess_micro
                FROM ib JOIN us USING (event_type, user_id)
                JOIN tt USING (event_type)),
         rk AS (SELECT sc.*, row_number() OVER
                  (PARTITION BY event_type, hour_us
                   ORDER BY excess_micro DESC, user_id ASC)::BIGINT
                  AS rk
                FROM sc)
         SELECT event_type, hour_us, rk, user_id, n_in_hour, user_n,
           excess_micro
         FROM rk WHERE rk <= 3""",
    // q317: same ±1 parity signs off the 60-bit hash, exact counter
    // sums, sum-of-squares/64 estimate.
    "q317_ams_f2" ->
      """WITH tk AS (SELECT source,
             unnest(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+')
                    END) AS w
           FROM documents),
         f AS (SELECT source, w, count(*)::BIGINT AS f FROM tk
               GROUP BY 1, 2),
         ex AS (SELECT source, sum(f * f)::BIGINT AS f2_exact FROM f
                GROUP BY 1),
         pj AS (SELECT source, r.r,
                  sum(f * CASE WHEN ('0x' || substr(md5(r.r || ':'
                    || w), 1, 15))::BIGINT % 2 = 0
                    THEN 1 ELSE -1 END)::BIGINT AS c
                FROM f, range(64) r(r) GROUP BY 1, 2),
         es AS (SELECT source,
                  CAST(round(sum(c * c)::DOUBLE / 64.0) AS BIGINT)
                    AS f2_est
                FROM pj GROUP BY 1)
         SELECT ex.source, ex.f2_exact, es.f2_est,
           (((2*(abs(es.f2_est - ex.f2_exact)) * 1000000 + (ex.f2_exact)) // (2*(ex.f2_exact)))::BIGINT) AS err_ppm
         FROM ex JOIN es USING (source)""",
    // q318: the q283 rank frames; H assembled from exact rank sums,
    // tie-corrected, Wilson-Hilferty z on both engines.
    "q318_kruskal_wallis" ->
      s"""WITH $qMicroCte,
         s AS (SELECT d.doc_id, d.source,
                 q2.q_micro AS qm
               FROM documents d JOIN qm q2 USING (doc_id)),
         gv AS (SELECT qm, count(*)::BIGINT AS gcnt,
                  sum(count(*)) OVER (ORDER BY qm
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    )::BIGINT AS gcum
                FROM s GROUP BY qm),
         rk AS (SELECT qm, gcnt,
                  2 * (gcum - gcnt) + gcnt + 1 AS rank2
                FROM gv),
         tt AS (SELECT sum(gcnt * gcnt * gcnt - gcnt)::BIGINT AS tsum,
                  sum(gcnt)::BIGINT AS bign
                FROM gv),
         sv AS (SELECT source, qm, count(*)::BIGINT AS scnt
                FROM s GROUP BY 1, 2),
         ag AS (SELECT sv.source, sum(sv.scnt)::BIGINT AS n_s,
                  sum(sv.scnt * rk.rank2)::BIGINT AS r2
                FROM sv JOIN rk USING (qm) GROUP BY 1),
         kk AS (SELECT count(*)::BIGINT AS k FROM ag),
         ha AS (SELECT sum(r2::DOUBLE * r2 / n_s) AS sum_term FROM ag),
         hh AS (SELECT 3.0 * ha.sum_term
                  / (tt.bign::DOUBLE * (tt.bign + 1))
                  - 3.0 * (tt.bign + 1)::DOUBLE AS h,
                  tt.tsum, tt.bign, kk.k
                FROM ha, tt, kk),
         h2 AS (SELECT h,
                  h / (1.0 - tsum::DOUBLE
                    / (bign::DOUBLE * bign * bign - bign)) AS hc,
                  (k - 1)::DOUBLE AS df
                FROM hh),
         h3 AS (SELECT h, hc, df,
                 (pow(hc / df, 1.0 / 3.0)
                   - (1.0 - 2.0 / (9.0 * df)))
                   / sqrt(2.0 / (9.0 * df)) AS z
               FROM h2)
         SELECT ag.source, ag.n_s AS n,
           (((2*(ag.r2 * 1000) + (2 * ag.n_s)) // (2*(2 * ag.n_s)))::BIGINT)
             AS mean_rank_milli,
           CAST(round(h3.h * 1e3) AS BIGINT) AS h_milli,
           CAST(round(h3.hc * 1e3) AS BIGINT) AS hc_milli,
           h3.df::BIGINT AS df,
           CAST(round(h3.z * 1e3) AS BIGINT) AS z_milli,
           h3.z > 1.645 AS significant
         FROM ag, h3""",
    // q319: the shared gate pattern counts; exact-integer Q assembly,
    // same chi2_3 5% cut, four unpivoted gate rows.
    "q319_cochran_q" ->
      s"""WITH $gateFlagsCtes,
         wd AS (SELECT doc_id,
                  max(CASE WHEN gate = 'gopher' THEN f END) AS fg,
                  max(CASE WHEN gate = 'lr' THEN f END) AS fl2,
                  max(CASE WHEN gate = 'ml' THEN f END) AS fm,
                  max(CASE WHEN gate = 'ppl' THEN f END) AS fp
                FROM fl GROUP BY 1),
         wf AS (SELECT * FROM wd WHERE fg IS NOT NULL
                  AND fl2 IS NOT NULL AND fm IS NOT NULL
                  AND fp IS NOT NULL),
         pat AS (SELECT fg, fl2, fm, fp, count(*)::BIGINT AS c
                 FROM wf GROUP BY 1, 2, 3, 4),
         tot AS (SELECT sum(c)::BIGINT AS n,
                  sum(c * (fg::INT + fl2::INT + fm::INT + fp::INT)
                    )::BIGINT AS sum_r,
                  sum(c * (fg::INT + fl2::INT + fm::INT + fp::INT)
                    * (fg::INT + fl2::INT + fm::INT + fp::INT)
                    )::BIGINT AS sum_r2,
                  sum(CASE WHEN fg THEN c ELSE 0 END)::BIGINT AS cg,
                  sum(CASE WHEN fl2 THEN c ELSE 0 END)::BIGINT AS cl,
                  sum(CASE WHEN fm THEN c ELSE 0 END)::BIGINT AS cm,
                  sum(CASE WHEN fp THEN c ELSE 0 END)::BIGINT AS cp
                 FROM pat),
         qq2 AS (SELECT tot.*,
                  3.0 * (4.0 * (cg * cg + cl * cl + cm * cm + cp * cp
                    )::DOUBLE - sum_r::DOUBLE * sum_r)
                    / (4 * sum_r - sum_r2)::DOUBLE AS q,
                  3 * (4 * (cg * cg + cl * cl + cm * cm + cp * cp)
                    - sum_r * sum_r) AS q_num,
                  4 * sum_r - sum_r2 AS q_den
                FROM tot),
         u AS (SELECT 'gopher' AS gate, n, cg AS n_pass, q, q_num,
                 q_den FROM qq2
               UNION ALL SELECT 'lr', n, cl, q, q_num, q_den FROM qq2
               UNION ALL SELECT 'ml', n, cm, q, q_num, q_den FROM qq2
               UNION ALL SELECT 'ppl', n, cp, q, q_num, q_den FROM qq2)
         SELECT gate, n, n_pass,
           (((2*(n_pass) * 1000000 + (n)) // (2*(n)))::BIGINT) AS pass_ppm,
           CASE WHEN q_den = 0 THEN 0
                ELSE (CASE WHEN (q_num * 1000) < 0 THEN -(((2*(-(q_num * 1000)) + (q_den)) // (2*(q_den)))::BIGINT) ELSE (((2*(q_num * 1000) + (q_den)) // (2*(q_den)))::BIGINT) END) END AS q_milli,
           q > 7.815 AS gates_differ
         FROM u""",
    // q320: q280's ISO dow cells as the seasonal profile, exact
    // integer residuals, the q254 chain joined for the raw verdict.
    "q320_deseasonalized" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour,
                 count(*)::BIGINT AS n
               FROM events GROUP BY 1, 2),
         hh AS (SELECT event_type, hour, n,
                  isodow(hour)::BIGINT AS dow,
                  hour(hour)::BIGINT AS hod
                FROM h),
         cells AS (SELECT event_type, dow, hod,
                    (((2*(sum(n) * 1000) + (count(*))) // (2*(count(*))))::BIGINT) AS m_milli
                  FROM hh GROUP BY 1, 2, 3),
         wr AS (SELECT hh.event_type, hh.hour, hh.n,
                  1000 * hh.n - cells.m_milli AS r
                FROM hh JOIN cells USING (event_type, dow, hod)),
         sg AS (SELECT event_type,
                  sqrt(sum(r * r)::DOUBLE / count(*)) AS sigma_r
                FROM wr GROUP BY 1),
         w2 AS (SELECT event_type, hour, n,
                 count(*) OVER tw AS k, sum(n) OVER tw AS s,
                 sum(n * n) OVER tw AS s2
               FROM h WINDOW tw AS (PARTITION BY event_type
                 ORDER BY hour ROWS BETWEEN 24 PRECEDING
                 AND 1 PRECEDING)),
         raw AS (SELECT event_type, epoch_us(hour)::BIGINT AS hour_us,
                  coalesce(k >= 12
                    AND (s2::DOUBLE - s::DOUBLE * s / k) / k > 0
                    AND (n - s::DOUBLE / k)
                      / sqrt((s2::DOUBLE - s::DOUBLE * s / k) / k)
                      > 3.0, false) AS raw_burst
                FROM w2),
         j AS (SELECT wr.event_type,
                 epoch_us(wr.hour)::BIGINT AS hour_us, wr.n, wr.r,
                 sg.sigma_r, raw.raw_burst,
                 coalesce(sg.sigma_r <> 0
                   AND abs(wr.r::DOUBLE / sg.sigma_r) > 3.0, false)
                   AS anomalous
               FROM wr JOIN sg USING (event_type)
               JOIN raw ON raw.event_type = wr.event_type
                 AND raw.hour_us = epoch_us(wr.hour))
         SELECT event_type, hour_us, n, r AS resid_milli,
           CASE WHEN sigma_r = 0 THEN 0
                ELSE CAST(round(r::DOUBLE / sigma_r * 1e6) AS BIGINT)
           END AS z_micro,
           anomalous, raw_burst
         FROM j WHERE anomalous OR raw_burst""",
    // q321: midpoint split (integer floor on both engines), per-from
    // chi-square homogeneity with nano-quantized cell terms, WH tail.
    "q321_transition_stability" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                 epoch_us(ts) AS us
               FROM events),
         md AS (SELECT ((min(us) + max(us)) // 2)::BIGINT AS mid
                FROM e),
         t AS (SELECT user_id, event_type, us,
                 lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY us, event_id) AS prev
               FROM e),
         tr AS (SELECT prev AS from_type, event_type AS to_type,
                  CASE WHEN us <= md.mid THEN 1 ELSE 2 END AS half
                FROM t, md WHERE prev IS NOT NULL),
         cw AS (SELECT from_type, to_type,
                  sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT
                    AS n1,
                  sum(CASE WHEN half = 2 THEN 1 ELSE 0 END)::BIGINT
                    AS n2
                FROM tr GROUP BY 1, 2),
         rt AS (SELECT from_type, sum(n1)::BIGINT AS r1,
                  sum(n2)::BIGINT AS r2
                FROM cw GROUP BY 1),
         cc AS (SELECT cw.from_type, cw.n1, cw.n2,
                 CAST(round((
                   CASE WHEN (cw.n1 + cw.n2)::DOUBLE * rt.r1
                       / (rt.r1 + rt.r2) > 0
                     THEN (cw.n1 - (cw.n1 + cw.n2)::DOUBLE * rt.r1
                         / (rt.r1 + rt.r2))
                       * (cw.n1 - (cw.n1 + cw.n2)::DOUBLE * rt.r1
                         / (rt.r1 + rt.r2))
                       / ((cw.n1 + cw.n2)::DOUBLE * rt.r1
                         / (rt.r1 + rt.r2))
                     ELSE 0 END
                   + CASE WHEN (cw.n1 + cw.n2)::DOUBLE * rt.r2
                       / (rt.r1 + rt.r2) > 0
                     THEN (cw.n2 - (cw.n1 + cw.n2)::DOUBLE * rt.r2
                         / (rt.r1 + rt.r2))
                       * (cw.n2 - (cw.n1 + cw.n2)::DOUBLE * rt.r2
                         / (rt.r1 + rt.r2))
                       / ((cw.n1 + cw.n2)::DOUBLE * rt.r2
                         / (rt.r1 + rt.r2))
                     ELSE 0 END) * 1e9) AS BIGINT) AS c_nano
               FROM cw JOIN rt USING (from_type)),
         pf AS (SELECT from_type, sum(n1)::BIGINT AS n_first_half,
                  sum(n2)::BIGINT AS n_second_half,
                  count(*)::BIGINT AS n_cells,
                  sum(c_nano)::BIGINT AS chi2_nano
                FROM cc GROUP BY 1)
         SELECT from_type, n_first_half, n_second_half,
           (((2*(chi2_nano) + (1000000)) // (2*(1000000)))::BIGINT)
             AS chi2_milli,
           (n_cells - 1)::BIGINT AS df,
           CAST(round((pow((chi2_nano::DOUBLE / 1e9)
               / (n_cells - 1)::DOUBLE, 1.0 / 3.0)
             - (1.0 - 2.0 / (9.0 * (n_cells - 1)::DOUBLE)))
             / sqrt(2.0 / (9.0 * (n_cells - 1)::DOUBLE)) * 1e3)
             AS BIGINT) AS z_milli,
           (pow((chi2_nano::DOUBLE / 1e9)
               / (n_cells - 1)::DOUBLE, 1.0 / 3.0)
             - (1.0 - 2.0 / (9.0 * (n_cells - 1)::DOUBLE)))
             / sqrt(2.0 / (9.0 * (n_cells - 1)::DOUBLE)) > 1.645
             AS drifted
         FROM pf WHERE n_cells > 1""",
    // q322: pooled two-proportion z, the same A-S 7.1.26 erf
    // polynomial, micro-quantized p, the q284 exact-integer step-up.
    "q322_gate_fairness" ->
      s"""WITH $gateFlagsCtes,
         cj AS (SELECT fl.gate, d.source, count(*)::BIGINT AS n_s,
                  sum(CASE WHEN fl.f THEN 1 ELSE 0 END)::BIGINT AS k_s
                FROM fl JOIN documents d USING (doc_id)
                GROUP BY 1, 2),
         gt AS (SELECT gate, sum(n_s)::BIGINT AS n_g,
                  sum(k_s)::BIGINT AS k_g
                FROM cj GROUP BY 1),
         zz AS (SELECT cj.gate, cj.source, cj.n_s, cj.k_s,
                  gt.n_g, gt.k_g,
                  CASE WHEN sqrt((gt.k_g::DOUBLE / gt.n_g)
                      * (1.0 - gt.k_g::DOUBLE / gt.n_g)
                      * (1.0 / cj.n_s + 1.0 / (gt.n_g - cj.n_s))) = 0
                    THEN 0.0
                    ELSE (cj.k_s::DOUBLE / cj.n_s
                      - (gt.k_g - cj.k_s)::DOUBLE / (gt.n_g - cj.n_s))
                    / sqrt((gt.k_g::DOUBLE / gt.n_g)
                      * (1.0 - gt.k_g::DOUBLE / gt.n_g)
                      * (1.0 / cj.n_s + 1.0 / (gt.n_g - cj.n_s)))
                  END AS z
                FROM cj JOIN gt USING (gate)),
         pa AS (SELECT *, abs(z) / sqrt(2.0) AS az FROM zz),
         pb AS (SELECT *, 1.0 / (1.0 + 0.3275911 * az) AS tt FROM pa),
         pc AS (SELECT *,
                 1.0 - (1.0 - (0.254829592 * tt - 0.284496736 * tt * tt
                   + 1.421413741 * tt * tt * tt
                   - 1.453152027 * tt * tt * tt * tt
                   + 1.061405429 * tt * tt * tt * tt * tt)
                   * exp(-az * az)) AS p
                FROM pb),
         wp2 AS (SELECT gate, source, n_s, k_s,
                  (((2*(k_s) * 1000000 + (n_s)) // (2*(n_s)))::BIGINT)
                    AS rate_ppm,
                  (((2*(k_g - k_s) * 1000000 + (n_g - n_s)) // (2*(n_g - n_s)))::BIGINT) AS rest_ppm,
                  CAST(round(z * 1e3) AS BIGINT) AS z_milli,
                  CAST(round(p * 1e6) AS BIGINT) AS p_micro
                FROM pc),
         mm AS (SELECT count(*)::BIGINT AS m FROM wp2),
         rk AS (SELECT wp2.*, mm.m,
                  row_number() OVER (ORDER BY p_micro, gate, source
                    )::BIGINT AS bh_rank
                FROM wp2, mm),
         km AS (SELECT rk.*,
                  max(CASE WHEN p_micro * m * 20 <= bh_rank * 1000000
                    THEN bh_rank END) OVER () AS kmax
                FROM rk)
         SELECT gate, source, n_s, k_s, rate_ppm, rest_ppm, z_milli,
           p_micro, bh_rank,
           bh_rank <= coalesce(kmax, 0) AS rejected
         FROM km""",
    // q323: the q291 signature, two 3-band nets, Chapman arithmetic,
    // the exact J >= 0.5 truth alongside.
    "q323_capture_recapture" ->
      s"""WITH $shinglesCte,
         m12 AS (SELECT doc_id, sh,
                 list_transform(range(12), i -> list_min(list_transform(sh,
                   s -> ('0x' || substr(md5(i || ':' || s), 1, 15))::BIGINT)))
                   AS mh
               FROM d WHERE len(sh) > 0),
         e0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
                WHERE len(sh) > 0),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*) AS inter,
                  any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
                FROM e0 a JOIN e0 b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         truth AS (SELECT doc_a, doc_b FROM pr
                   WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                     >= 0.5),
         bda AS (SELECT doc_id, t.j,
                  array_to_string(mh[t.j*2+1:t.j*2+2], '_') AS bval
                FROM m12, range(0, 3) t(j)),
         bdb AS (SELECT doc_id, t.j,
                  array_to_string(mh[t.j*2+1:t.j*2+2], '_') AS bval
                FROM m12, range(3, 6) t(j)),
         ca AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bda a JOIN bda b
                  ON a.j = b.j AND a.bval = b.bval
                    AND a.doc_id < b.doc_id),
         cb AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bdb a JOIN bdb b
                  ON a.j = b.j AND a.bval = b.bval
                    AND a.doc_id < b.doc_id),
         st AS (SELECT
                  (SELECT count(*) FROM ca)::BIGINT AS n_a,
                  (SELECT count(*) FROM cb)::BIGINT AS n_b,
                  (SELECT count(*) FROM ca JOIN cb
                     USING (doc_a, doc_b))::BIGINT AS n_both,
                  (SELECT count(*) FROM
                     (SELECT doc_a, doc_b FROM ca UNION
                      SELECT doc_a, doc_b FROM cb))::BIGINT AS n_union,
                  (SELECT count(*) FROM truth)::BIGINT AS n_true)
         SELECT n_a, n_b, n_both, n_union, n_true,
           (CASE WHEN (((n_a + 1) * (n_b + 1) - (n_both + 1)) * 1000) < 0 THEN -(((2*(-(((n_a + 1) * (n_b + 1) - (n_both + 1)) * 1000)) + (n_both + 1)) // (2*(n_both + 1)))::BIGINT) ELSE (((2*(((n_a + 1) * (n_b + 1) - (n_both + 1)) * 1000) + (n_both + 1)) // (2*(n_both + 1)))::BIGINT) END) AS chapman_milli,
           (((2*(n_union * (n_both + 1)) * 1000000 + ((n_a + 1) * (n_b + 1) - (n_both + 1))) // (2*((n_a + 1) * (n_b + 1) - (n_both + 1))))::BIGINT) AS caught_ppm,
           CASE WHEN n_true = 0 THEN 0
                ELSE (((2*(abs((n_a + 1) * (n_b + 1) - (n_both + 1) - n_true * (n_both + 1))) * 1000000 + ((n_both + 1) * n_true)) // (2*((n_both + 1) * n_true)))::BIGINT)
           END AS est_err_ppm
         FROM st""",
    // q324: same wrapped positive pick, same 8-id negative window,
    // same margin; cosine folds via the shared list expression.
    "q324_triplet_violations" -> {
      val cPos = cosSql("wp.embedding", "wp.pos_vec")
      val cNeg = cosSql("wp.embedding", "np.neg_vec")
      s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
         wp AS (SELECT vec_id, label, embedding,
                  coalesce(lead(embedding, 1) OVER
                      (PARTITION BY label ORDER BY vec_id),
                    first_value(embedding) OVER
                      (PARTITION BY label ORDER BY vec_id)) AS pos_vec
                FROM e),
         ng AS (SELECT e.vec_id, n.vec_id AS nv,
                  n.embedding AS neg_vec,
                  row_number() OVER (PARTITION BY e.vec_id
                    ORDER BY n.vec_id) AS rk
                FROM e JOIN e n ON n.vec_id > e.vec_id
                  AND n.vec_id <= e.vec_id + 8
                  AND n.label <> e.label),
         np AS (SELECT vec_id, neg_vec FROM ng WHERE rk = 1),
         tri AS (SELECT wp.label, $cPos AS c_pos, $cNeg AS c_neg
                 FROM wp JOIN np USING (vec_id))
         SELECT label, count(*)::BIGINT AS n_triplets,
           sum(CASE WHEN c_pos < c_neg + 0.05 THEN 1 ELSE 0
             END)::BIGINT AS n_violated,
           (((2*(sum(CASE WHEN c_pos < c_neg + 0.05 THEN 1 ELSE 0 END)) * 1000000 + (count(*))) // (2*(count(*))))::BIGINT)
             AS violation_ppm
         FROM tri GROUP BY 1"""
    },
    // q325: midpoint split on doc_id, top-1000 vocabulary by total
    // count, nano-quantized chi2 contributions, top-50 by (c, term).
    "q325_vocab_drift" ->
      """WITH md AS (SELECT ((min(doc_id) + max(doc_id)) // 2)::BIGINT
                 AS mid
               FROM documents),
         tk AS (SELECT
                 unnest(CASE WHEN length(trim(text)) = 0
                   THEN []::VARCHAR[]
                   ELSE regexp_split_to_array(trim(text), '\s+')
                   END) AS term,
                 CASE WHEN doc_id <= md.mid THEN 1 ELSE 2 END AS half
               FROM documents, md),
         ct AS (SELECT term,
                 sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT
                   AS n1,
                 sum(CASE WHEN half = 2 THEN 1 ELSE 0 END)::BIGINT
                   AS n2
               FROM tk GROUP BY 1),
         tp AS (SELECT * FROM
                 (SELECT ct.*, row_number() OVER
                    (ORDER BY n1 + n2 DESC, term ASC) AS vrank
                  FROM ct) WHERE vrank <= 1000),
         tt AS (SELECT sum(n1)::BIGINT AS t1, sum(n2)::BIGINT AS t2
                FROM tp),
         cc AS (SELECT term, n1, n2,
                 CAST(round((
                   (n1 - (n1 + n2)::DOUBLE * tt.t1 / (tt.t1 + tt.t2))
                   * (n1 - (n1 + n2)::DOUBLE * tt.t1 / (tt.t1 + tt.t2))
                   / ((n1 + n2)::DOUBLE * tt.t1 / (tt.t1 + tt.t2))
                   + (n2 - (n1 + n2)::DOUBLE * tt.t2 / (tt.t1 + tt.t2))
                   * (n2 - (n1 + n2)::DOUBLE * tt.t2 / (tt.t1 + tt.t2))
                   / ((n1 + n2)::DOUBLE * tt.t2 / (tt.t1 + tt.t2))
                 ) * 1e9) AS BIGINT) AS c_nano
               FROM tp, tt),
         rk AS (SELECT cc.*, row_number() OVER
                  (ORDER BY c_nano DESC, term ASC)::BIGINT
                  AS drift_rank
                FROM cc)
         SELECT drift_rank, term, n1, n2, c_nano AS chi2_nano
         FROM rk WHERE drift_rank <= 50""",
    // q326: the q15 component formulas, micro per doc, exact sums,
    // headroom argmax with the len > stop > punct tie order.
    "q326_quality_components" ->
      """WITH t0 AS (SELECT source,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+'))
             END AS n_toks,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(list_filter(
                    regexp_split_to_array(trim(text), '\s+'),
                    w -> w IN ('the','a','an','and','or','of','to',
                      'in','is','it')))
             END AS n_stop,
             length(text)
               - length(translate(text, '.,!?;:', '')) AS n_punct,
             length(text) AS n_chars
           FROM documents),
         t1 AS (SELECT source,
             least(n_toks * 5000, 1000000) AS len_m,
             CASE WHEN n_toks = 0 THEN 0
                  ELSE least((((2*(5000000 * n_stop) + (n_toks)) // (2*(n_toks)))::BIGINT), 1000000)
             END AS stop_m,
             CASE WHEN n_chars = 0 THEN 0
                  ELSE least((((2*(10000000 * n_punct) + (n_chars)) // (2*(n_chars)))::BIGINT),
                    1000000)
             END AS punct_m
           FROM t0),
         c AS (SELECT source,
             (((2*(len_m) + (2)) // (2*(2)))::BIGINT) AS lm,
             (((2*(2 * stop_m) + (5)) // (2*(5)))::BIGINT) AS sm,
             (((2*(1000000 - punct_m) + (10)) // (2*(10)))::BIGINT) AS pm
           FROM t1),
         ag AS (SELECT source, count(*)::BIGINT AS n,
                  (CASE WHEN (sum(lm)) < 0 THEN -(((2*(-(sum(lm))) + (count(*))) // (2*(count(*))))::BIGINT) ELSE (((2*(sum(lm)) + (count(*))) // (2*(count(*))))::BIGINT) END) AS len_micro,
                  (CASE WHEN (sum(sm)) < 0 THEN -(((2*(-(sum(sm))) + (count(*))) // (2*(count(*))))::BIGINT) ELSE (((2*(sum(sm)) + (count(*))) // (2*(count(*))))::BIGINT) END) AS stop_micro,
                  (CASE WHEN (sum(pm)) < 0 THEN -(((2*(-(sum(pm))) + (count(*))) // (2*(count(*))))::BIGINT) ELSE (((2*(sum(pm)) + (count(*))) // (2*(count(*))))::BIGINT) END) AS punct_micro
                FROM c GROUP BY 1)
         SELECT source, n, len_micro, stop_micro, punct_micro,
           len_micro + stop_micro + punct_micro AS mean_q_micro,
           CASE WHEN 500000 - len_micro >= 400000 - stop_micro
                 AND 500000 - len_micro >= 100000 - punct_micro
                THEN 'len'
                WHEN 400000 - stop_micro >= 100000 - punct_micro
                THEN 'stop'
                ELSE 'punct' END AS binding
         FROM ag""",
    // q327: per-dim raw moments via the constant 64-range lattice,
    // contiguous 8-dim subspaces, nano variance sums.
    "q327_pq_variance" ->
      """WITH c AS (SELECT r.i AS dim,
                 embedding[(r.i + 1)::INT]::DOUBLE AS v
               FROM embeddings CROSS JOIN range(64) r(i)),
         pd AS (SELECT dim, count(*)::BIGINT AS n, sum(v) AS s1,
                  sum(v * v) AS s2
                FROM c GROUP BY 1),
         sv AS (SELECT (dim // 8)::BIGINT AS subspace,
                  s2 / n - (s1 / n) * (s1 / n) AS vard
                FROM pd),
         ps AS (SELECT subspace,
                  CAST(round(sum(vard) * 1e9) AS BIGINT) AS var_nano
                FROM sv GROUP BY 1),
         tt AS (SELECT sum(var_nano)::BIGINT AS tot_nano FROM ps)
         SELECT subspace, var_nano,
           (((2*(var_nano) * 1000000 + (tt.tot_nano)) // (2*(tt.tot_nano)))::BIGINT) AS share_ppm,
           (((2*(var_nano * 8000) + (tt.tot_nano)) // (2*(tt.tot_nano)))::BIGINT) AS imbalance_milli
         FROM ps, tt""",
    // q328: the q115 stage CTEs with token sums instead of doc
    // counts; shares in ppm of the stage-0 token mass.
    "q328_token_funnel" ->
      """WITH d AS (SELECT doc_id, text,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+')
             END AS toks
           FROM documents),
         f AS (SELECT doc_id, text, toks,
             len(toks) AS nt,
             round(0.5 * least(len(toks) / 200.0, 1.0)
                 + 0.4 * least(CASE WHEN len(toks) = 0 THEN 0.0
                     ELSE len(list_filter(toks, w -> w IN
                       ('the','a','an','and','or','of','to','in','is','it')
                       ))::DOUBLE / len(toks) END * 5.0, 1.0)
                 + 0.1 * (1.0 - least(CASE WHEN length(text) = 0 THEN 0.0
                     ELSE (length(text)
                           - length(translate(text, '.,!?;:', '')))::DOUBLE
                          / length(text) END * 10.0, 1.0)), 6) AS q,
             round(CASE WHEN len(toks) = 0 THEN 0.0
                   ELSE 1.0 - len(list_distinct(toks))::DOUBLE / len(toks)
                   END, 6) AS dtf,
             round(CASE WHEN len(toks) <= 1 THEN 0.0
                   ELSE 1.0 - len(list_distinct(
                       list_transform(range(len(toks) - 1),
                         i -> toks[i+1] || ' ' || toks[i+2])))::DOUBLE
                     / (len(toks) - 1)
                   END, 6) AS dbf,
             len(regexp_extract_all(text,
               '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))
               + len(regexp_extract_all(text,
                   '\b\d{3}[- .]\d{3}[- .]\d{4}\b')) AS pii,
             min(doc_id) OVER (PARTITION BY md5(text)) AS survivor
           FROM d),
         s AS (SELECT nt,
             (nt >= 10) AS s1,
             (nt >= 10 AND q >= 0.3) AS s2,
             (nt >= 10 AND q >= 0.3 AND dtf <= 0.7 AND dbf <= 0.5) AS s3,
             (nt >= 10 AND q >= 0.3 AND dtf <= 0.7 AND dbf <= 0.5
              AND pii = 0) AS s4,
             (nt >= 10 AND q >= 0.3 AND dtf <= 0.7 AND dbf <= 0.5
              AND pii = 0 AND survivor = doc_id) AS s5
           FROM f),
         a AS (SELECT sum(nt)::BIGINT AS t0,
             sum(CASE WHEN s1 THEN nt ELSE 0 END)::BIGINT AS t1,
             sum(CASE WHEN s2 THEN nt ELSE 0 END)::BIGINT AS t2,
             sum(CASE WHEN s3 THEN nt ELSE 0 END)::BIGINT AS t3,
             sum(CASE WHEN s4 THEN nt ELSE 0 END)::BIGINT AS t4,
             sum(CASE WHEN s5 THEN nt ELSE 0 END)::BIGINT AS t5
           FROM s),
         u AS (SELECT '0_all' AS stage, t0 AS n_tokens, t0 FROM a
           UNION ALL SELECT '1_minlen', t1, t0 FROM a
           UNION ALL SELECT '2_quality', t2, t0 FROM a
           UNION ALL SELECT '3_repetition', t3, t0 FROM a
           UNION ALL SELECT '4_pii_free', t4, t0 FROM a
           UNION ALL SELECT '5_unique', t5, t0 FROM a)
         SELECT stage, n_tokens,
           (((2*(n_tokens) * 1000000 + (t0)) // (2*(t0)))::BIGINT)
             AS token_share_ppm
         FROM u""",
    // q329: low-bit signature, zip-compare collision count, the
    // recentred clipped estimator, exact-J bands.
    "q329_bbit_minwise" ->
      s"""WITH $shinglesCte,
         m12 AS (SELECT doc_id, sh,
                 list_transform(range(12), i -> list_min(list_transform(sh,
                   s -> ('0x' || substr(md5(i || ':' || s), 1, 15))::BIGINT))
                   ) AS mh
               FROM d WHERE len(sh) > 0),
         bt AS (SELECT doc_id,
                  list_transform(mh, h -> (h % 2 + 2) % 2) AS bits
                FROM m12),
         e0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
                WHERE len(sh) > 0),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*) AS inter,
                  any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
                FROM e0 a JOIN e0 b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         pj AS (SELECT doc_a, doc_b,
                  round(inter::DOUBLE / (n_a + n_b - inter), 6)
                    AS jaccard
                FROM pr
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                  >= 0.05),
         wb AS (SELECT pj.doc_a, pj.doc_b, pj.jaccard,
                  len(list_filter(list_zip(a.bits, b.bits),
                    z -> z[1] = z[2]))::BIGINT AS c
                FROM pj JOIN bt a ON pj.doc_a = a.doc_id
                JOIN bt b ON pj.doc_b = b.doc_id),
         er AS (SELECT
                  least(CAST(round(jaccard * 1e6) AS BIGINT) // 100000,
                    9) AS j_band,
                  greatest(0, (CASE WHEN ((c - 6) * 1000) < 0 THEN -(((2*(-((c - 6) * 1000)) + (6)) // (2*(6)))::BIGINT) ELSE (((2*((c - 6) * 1000) + (6)) // (2*(6)))::BIGINT) END))
                    - (((2*(CAST(round(jaccard * 1e6) AS BIGINT)) + (1000)) // (2*(1000)))::BIGINT)
                    AS err
                FROM wb)
         SELECT j_band, count(*)::BIGINT AS n_pairs,
           CAST(round(avg(abs(err))) AS BIGINT) AS mean_abs_err_milli,
           (CASE WHEN (sum(err)) < 0 THEN -(((2*(-(sum(err))) + (count(*))) // (2*(count(*))))::BIGINT) ELSE (((2*(sum(err)) + (count(*))) // (2*(count(*))))::BIGINT) END) AS mean_bias_milli
         FROM er GROUP BY 1""",
    // q330: same quasi-identifier cells, k=5 cut, exact rollup.
    "q330_k_anonymity" ->
      """WITH c AS (SELECT source, lang,
             length(CAST((CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+'))
               END)::BIGINT AS VARCHAR)) AS len_digits,
             count(*)::BIGINT AS n_cell
           FROM documents GROUP BY 1, 2, 3)
         SELECT source, count(*)::BIGINT AS n_cells,
           sum(CASE WHEN n_cell < 5 THEN 1 ELSE 0 END)::BIGINT
             AS small_cells,
           sum(n_cell)::BIGINT AS n_docs,
           sum(CASE WHEN n_cell < 5 THEN n_cell ELSE 0 END)::BIGINT
             AS docs_at_risk,
           (((2*(sum(CASE WHEN n_cell < 5 THEN n_cell ELSE 0 END)) * 1000000 + (sum(n_cell))) // (2*(sum(n_cell))))::BIGINT) AS risk_ppm
         FROM c GROUP BY 1""",
    // q331: the q262 lag pairs, nano-quantized entropy summands,
    // pi-weighted rate assembled from the same integers.
    "q331_entropy_rate" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                 epoch_us(ts) AS us
               FROM events),
         t AS (SELECT user_id, event_type, us,
                 lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY us, event_id) AS prev
               FROM e),
         c AS (SELECT prev AS from_type, event_type AS to_type,
                 count(*)::BIGINT AS n
               FROM t WHERE prev IS NOT NULL GROUP BY 1, 2),
         r AS (SELECT from_type, n,
                 sum(n) OVER (PARTITION BY from_type)::BIGINT AS rt
               FROM c),
         h AS (SELECT from_type,
                 CAST(round(-1.0 * n::DOUBLE / rt
                   * ln(n::DOUBLE / rt) * 1e9) AS BIGINT) AS h_nano,
                 rt
               FROM r),
         pf AS (SELECT from_type, max(rt)::BIGINT AS n_out,
                  sum(h_nano)::BIGINT AS h_sum
                FROM h GROUP BY 1),
         tt AS (SELECT sum(n_out)::BIGINT AS n_total FROM pf),
         wp AS (SELECT pf.*, tt.n_total,
                  CAST(round(pf.n_out::DOUBLE / tt.n_total
                    * (pf.h_sum::DOUBLE / 1e9) * 1e9) AS BIGINT)
                    AS rate_term_nano
                FROM pf, tt),
         rr AS (SELECT sum(rate_term_nano)::BIGINT AS rate_nano
                FROM wp)
         SELECT from_type, n_out,
           (((2*(n_out) * 1000000 + (n_total)) // (2*(n_total)))::BIGINT) AS pi_ppm,
           (((2*(h_sum) + (1000000)) // (2*(1000000)))::BIGINT) AS h_milli,
           (((2*(rr.rate_nano) + (1000000)) // (2*(1000000)))::BIGINT)
             AS rate_milli
         FROM wp, rr""",
    // q332: value-domain cumsums per language, exact-integer drop
    // counts via integral division, the (d+1)-th smallest pick.
    "q332_rate_matched" ->
      s"""WITH $qMicroCte,
         s AS (SELECT d.doc_id, d.lang,
                 q2.q_micro AS qm
               FROM documents d JOIN qm q2 USING (doc_id)),
         g AS (SELECT count(*)::BIGINT AS bign,
                 sum(CASE WHEN qm >= 300000 THEN 1 ELSE 0 END)::BIGINT
                   AS kept
               FROM s),
         sv AS (SELECT lang, qm, count(*)::BIGINT AS scnt,
                  sum(count(*)) OVER (PARTITION BY lang ORDER BY qm
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    )::BIGINT AS scum
                FROM s GROUP BY 1, 2),
         ns AS (SELECT lang, count(*)::BIGINT AS n_l FROM s
                GROUP BY 1),
         wd AS (SELECT sv.lang, sv.qm, sv.scum, ns.n_l,
                  ns.n_l - (g.kept * ns.n_l) // g.bign AS d_l
                FROM sv JOIN ns USING (lang), g),
         th AS (SELECT lang, min(qm) AS thr_micro FROM wd
                WHERE scum >= d_l + 1 GROUP BY 1)
         SELECT ns.lang, ns.n_l AS n,
           (((2*(g.kept) * 1000000 + (g.bign)) // (2*(g.bign)))::BIGINT) AS global_rate_ppm,
           th.thr_micro,
           th.thr_micro - 300000 AS delta_micro
         FROM ns JOIN th USING (lang), g""",
    // q333: same integer mean pivot; lag pairs via shifted
    // equi-joins; one shared denominator.
    "q333_order_acf" ->
      s"""WITH $qMicroCte,
         s AS (SELECT d.doc_id,
                 q2.q_micro AS qm
               FROM documents d JOIN qm q2 USING (doc_id)),
         m AS (SELECT (CASE WHEN (sum(qm)) < 0 THEN -(((2*(-(sum(qm))) + (count(*))) // (2*(count(*))))::BIGINT) ELSE (((2*(sum(qm)) + (count(*))) // (2*(count(*))))::BIGINT) END) AS m FROM s),
         dv AS (SELECT doc_id, qm - m.m AS d FROM s, m),
         dn AS (SELECT sum(d * d)::BIGINT AS den FROM dv),
         l AS (SELECT unnest([1, 10, 100])::BIGINT AS lag),
         pr AS (SELECT l.lag, count(*)::BIGINT AS n_pairs,
                  sum(a.d * b.d)::BIGINT AS num
                FROM l JOIN dv a ON true
                JOIN dv b ON b.doc_id = a.doc_id + l.lag
                GROUP BY 1)
         SELECT pr.lag, pr.n_pairs,
           CASE WHEN dn.den = 0 THEN 0
                ELSE (CASE WHEN (pr.num * 1000000) < 0 THEN -(((2*(-(pr.num * 1000000)) + (dn.den)) // (2*(dn.den)))::BIGINT) ELSE (((2*(pr.num * 1000000) + (dn.den)) // (2*(dn.den)))::BIGINT) END)
           END AS acf_micro,
           dn.den <> 0
             AND 20 * abs(pr.num) < dn.den AS order_safe
         FROM pr, dn""",
    // q334: the q22 candidate chain, exact per-pair Jaccard, ordered
    // source-pair rollup with shares and verification yield.
    "q334_lsh_cost" ->
      s"""WITH $shinglesCte,
         m AS (SELECT doc_id, sh,
                 list_transform(range(8), i -> list_min(list_transform(sh,
                   s -> ('0x' || substr(md5(i || ':' || s), 1, 15))::BIGINT))) AS mh
               FROM d WHERE len(sh) > 0),
         bd AS (SELECT doc_id, sh, mh, t.j,
                  mh[t.j*2+1] || '_' || mh[t.j*2+2] AS bval
                FROM m, range(4) t(j)),
         p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.sh AS sh_a, b.sh AS sh_b
               FROM bd a JOIN bd b
                 ON a.j = b.j AND a.bval = b.bval AND a.doc_id < b.doc_id),
         pj AS (SELECT doc_a, doc_b,
                 round(len(list_intersect(sh_a, sh_b))::DOUBLE /
                   (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))),
                   6) AS jaccard
               FROM p),
         ws AS (SELECT least(da.source, db.source) AS source_a,
                  greatest(da.source, db.source) AS source_b,
                  pj.jaccard
                FROM pj
                JOIN documents da ON pj.doc_a = da.doc_id
                JOIN documents db ON pj.doc_b = db.doc_id),
         tt AS (SELECT count(*)::BIGINT AS n_total FROM ws)
         SELECT source_a, source_b, count(*)::BIGINT AS n_candidates,
           sum(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END)::BIGINT
             AS n_true,
           (((2*(count(*)) * 1000000 + (tt.n_total)) // (2*(tt.n_total)))::BIGINT)
             AS cost_share_ppm,
           (((2*(sum(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END))
             * 1000000 + (count(*))) // (2*(count(*))))::BIGINT) AS yield_ppm
         FROM ws, tt GROUP BY source_a, source_b, tt.n_total""",
    // q335: the q116 hash/frames derivation, 4-dim stub features,
    // lead pairs, zero-norm-guarded cosine, micro means.
    "q335_scene_cuts" ->
      """WITH base AS (
           SELECT doc_id,
             list_reduce(list_prepend(0::BIGINT,
               list_transform(range(length(text)),
                 i -> ord(substr(text, (i+1)::INT, 1))::BIGINT)),
               (a, c) -> (a * 31 + c) % 1000000007) AS h,
             CAST(octet_length(encode(text)) % 240 + 1 AS INTEGER)
               AS n_frames
           FROM documents),
         fr AS (SELECT doc_id, h, n_frames,
             unnest(range(0, n_frames, greatest(1, n_frames // 8))) AS f
           FROM base),
         fv AS (SELECT doc_id, f,
             list_transform(range(4), k ->
               ((h + f * 2654435761 + k * 40503) % 1000)::DOUBLE
                 / 1000.0) AS v
           FROM fr),
         ld AS (SELECT doc_id, f, v,
             lead(v) OVER (PARTITION BY doc_id ORDER BY f) AS vn
           FROM fv),
         pr AS (SELECT doc_id,
             list_sum(list_transform(list_zip(v, vn),
               p -> p[1] * p[2])) AS dt,
             sqrt(list_sum(list_transform(v, x -> x * x))) AS na,
             sqrt(list_sum(list_transform(vn, x -> x * x))) AS nb
           FROM ld WHERE vn IS NOT NULL),
         cm AS (SELECT doc_id,
             CAST(round(CASE WHEN na * nb = 0 THEN 0.0
               ELSE dt / (na * nb) END * 1e6) AS BIGINT) AS c_micro
           FROM pr)
         SELECT doc_id, (count(*) + 1)::BIGINT AS n_sampled,
           sum(CASE WHEN c_micro < 500000 THEN 1 ELSE 0 END)::BIGINT
             AS n_cuts,
           (CASE WHEN sum(c_micro) < 0
              THEN -(((2*(-sum(c_micro)) + (count(*) * 1000)) // (2*(count(*) * 1000)))::BIGINT)
              ELSE (((2*(sum(c_micro)) + (count(*) * 1000)) // (2*(count(*) * 1000)))::BIGINT) END)
             AS mean_adj_cos_milli
         FROM cm GROUP BY 1""",
    // q336: exact lower medians, integer deviations, the q281 pivot
    // moments, the same redundant (k-1)F/df WH form.
    "q336_brown_forsythe" ->
      s"""WITH $qMicroCte,
         s AS (SELECT d.doc_id, d.source,
                 q2.q_micro AS qm
               FROM documents d JOIN qm q2 USING (doc_id)),
         r AS (SELECT source, qm,
                 row_number() OVER (PARTITION BY source
                   ORDER BY qm, doc_id) AS rn,
                 count(*) OVER (PARTITION BY source) AS cnt
               FROM s),
         md AS (SELECT source, qm AS med_micro FROM r
                WHERE rn = ceil(cnt / 2.0)),
         dv AS (SELECT s.source, abs(s.qm - md.med_micro) AS z
                FROM s JOIN md USING (source)),
         ps AS (SELECT dv.source, count(*)::BIGINT AS n_s,
                  max(md.med_micro)::BIGINT AS med_micro,
                  CAST(round(avg(dv.z)) AS BIGINT) AS m_s,
                  sum(dv.z)::BIGINT AS z_sum
                FROM dv JOIN md ON dv.source = md.source
                GROUP BY 1),
         wi AS (SELECT dv.source,
                  sum((dv.z - ps.m_s) * (dv.z - ps.m_s))::BIGINT
                    AS within_s
                FROM dv JOIN ps USING (source) GROUP BY 1),
         gr AS (SELECT sum(n_s)::BIGINT AS bign,
                  CAST(round(sum(z_sum)::DOUBLE / sum(n_s)) AS BIGINT)
                    AS m_all,
                  count(*)::BIGINT AS k
                FROM ps),
         asm AS (SELECT ps.source, ps.n_s, ps.med_micro, ps.m_s,
                  wi.within_s, gr.bign, gr.k, gr.m_all,
                  ps.n_s * (ps.m_s - gr.m_all) * (ps.m_s - gr.m_all)
                    AS btw_s
                FROM ps JOIN wi USING (source), gr),
         sm AS (SELECT bign, k, sum(btw_s)::BIGINT AS btw,
                  sum(within_s)::BIGINT AS win
                FROM asm GROUP BY 1, 2),
         ff AS (SELECT bign, k,
                 (bign - k)::DOUBLE / (k - 1)::DOUBLE
                   * btw::DOUBLE / win::DOUBLE AS f,
                 (k - 1)::DOUBLE AS df
               FROM sm),
         zz AS (SELECT f, df,
                 (pow(f * (k - 1)::DOUBLE / df, 1.0 / 3.0)
                   - (1.0 - 2.0 / (9.0 * df)))
                   / sqrt(2.0 / (9.0 * df)) AS z_wh
               FROM ff)
         SELECT ps.source, ps.n_s AS n, ps.med_micro,
           ps.m_s AS mean_dev_micro,
           CAST(round(zz.f * 1e3) AS BIGINT) AS f_milli,
           zz.df::BIGINT AS df,
           CAST(round(zz.z_wh * 1e3) AS BIGINT) AS z_milli,
           zz.z_wh > 1.645 AS spreads_differ
         FROM ps, zz""",
    // q337: exact 5-moment regression per source, the same moment-
    // identity SE with the sqrt floor, pooled slope from summed
    // moments.
    "q337_slope_heterogeneity" ->
      s"""WITH $qMicroCte,
         s AS (SELECT d.doc_id, d.source,
                 (CASE WHEN length(trim(d.text)) = 0 THEN 0
                   ELSE len(regexp_split_to_array(trim(d.text), '\\s+'))
                  END)::BIGINT AS x,
                 q2.q_micro AS y
               FROM documents d JOIN qm q2 USING (doc_id)),
         mom AS (SELECT source, count(*)::BIGINT AS n,
                  sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                  sum(x * x)::BIGINT AS sx2, sum(x * y)::BIGINT AS sxy,
                  sum(y * y)::BIGINT AS sy2
                 FROM s GROUP BY 1),
         pl AS (SELECT (sum(n)::DOUBLE * sum(sxy)
                  - sum(sx)::DOUBLE * sum(sy))
                  / (sum(n)::DOUBLE * sum(sx2)
                    - sum(sx)::DOUBLE * sum(sx)) AS b_pool,
                  (sum(n) * sum(sxy) - sum(sx) * sum(sy))::BIGINT
                    AS p_num,
                  (sum(n) * sum(sx2) - sum(sx) * sum(sx))::BIGINT
                    AS p_den
                FROM mom),
         asm AS (SELECT mom.*,
                  n::DOUBLE * sx2 - sx::DOUBLE * sx AS sxx,
                  n::DOUBLE * sxy - sx::DOUBLE * sy AS sxy2,
                  n::DOUBLE * sy2 - sy::DOUBLE * sy AS syy,
                  (n * sxy - sx * sy)::BIGINT AS num_i,
                  (n * sx2 - sx * sx)::BIGINT AS den_i
                FROM mom),
         bb AS (SELECT asm.*, sxy2 / sxx AS b FROM asm
                WHERE n > 2 AND sxx > 0),
         zz AS (SELECT bb.*,
                 sqrt(greatest(0.0, ((syy - b * sxy2) / n::DOUBLE)
                   / (n::DOUBLE - 2) / (sxx / n::DOUBLE))) AS se
               FROM bb)
         SELECT zz.source, zz.n,
           (CASE WHEN (zz.num_i) < 0 THEN -(((2*(-(zz.num_i)) + (greatest(((2*(zz.den_i) + (1000000)) // (2*(1000000))), 1))) // (2*(greatest(((2*(zz.den_i) + (1000000)) // (2*(1000000))), 1))))::BIGINT) ELSE (((2*(zz.num_i) + (greatest(((2*(zz.den_i) + (1000000)) // (2*(1000000))), 1))) // (2*(greatest(((2*(zz.den_i) + (1000000)) // (2*(1000000))), 1))))::BIGINT) END)
             AS slope_micro_per_tok,
           (CASE WHEN (pl.p_num) < 0 THEN -(((2*(-(pl.p_num)) + (greatest(((2*(pl.p_den) + (1000000)) // (2*(1000000))), 1))) // (2*(greatest(((2*(pl.p_den) + (1000000)) // (2*(1000000))), 1))))::BIGINT) ELSE (((2*(pl.p_num) + (greatest(((2*(pl.p_den) + (1000000)) // (2*(1000000))), 1))) // (2*(greatest(((2*(pl.p_den) + (1000000)) // (2*(1000000))), 1))))::BIGINT) END)
             AS pooled_micro,
           CAST(round(zz.se * 1e6) AS BIGINT) AS se_micro,
           CAST(round(CASE WHEN zz.se = 0 THEN 0.0
             ELSE (zz.b - pl.b_pool) / zz.se END * 1e3) AS BIGINT)
             AS z_milli,
           coalesce(abs(CASE WHEN zz.se = 0 THEN 0.0
             ELSE (zz.b - pl.b_pool) / zz.se END) > 3.0, false)
             AS divergent
         FROM zz, pl""",
    // q338: exact integer sums, three milli ratios.
    "q338_byte_economics" ->
      """WITH b AS (SELECT lang, length(text)::BIGINT AS chars,
             octet_length(encode(text))::BIGINT AS bytes,
             (CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+'))
              END)::BIGINT AS toks
           FROM documents)
         SELECT lang, count(*)::BIGINT AS n_docs,
           sum(bytes)::BIGINT AS n_bytes,
           sum(chars)::BIGINT AS n_chars,
           sum(toks)::BIGINT AS n_tokens,
           (((2*(sum(bytes) * 1000) + (sum(toks))) // (2*(sum(toks))))::BIGINT)
             AS bytes_per_token_milli,
           (((2*(sum(chars) * 1000) + (sum(toks))) // (2*(sum(toks))))::BIGINT)
             AS chars_per_token_milli,
           (((2*(sum(bytes) * 1000) + (sum(chars))) // (2*(sum(chars))))::BIGINT)
             AS bytes_per_char_milli
         FROM b GROUP BY 1""",
    // q339: the q259 bucket means, pairwise micro slopes, the exact
    // lower-median rank pick per source.
    "q339_theil_sen" ->
      s"""WITH $qMicroCte,
         s AS (SELECT d.doc_id, d.source, d.doc_id // 50 AS b,
                 q2.q_micro AS q
               FROM documents d JOIN qm q2 USING (doc_id)),
         bm AS (SELECT source, b,
                  ${sqlIdivHalfUp("sum(q)", "count(*)")} AS mqm
                FROM s GROUP BY 1, 2),
         pr AS (SELECT a.source,
                 ${sqlIdivHalfUpSigned("b2.mqm - a.mqm", "b2.b - a.b")}
                   AS slope_micro
               FROM bm a JOIN bm b2
                 ON a.source = b2.source AND b2.b > a.b),
         rk AS (SELECT source, slope_micro,
                 row_number() OVER (PARTITION BY source
                   ORDER BY slope_micro) AS rn,
                 count(*) OVER (PARTITION BY source) AS cnt
               FROM pr)
         SELECT source, cnt::BIGINT AS n_pairs,
           slope_micro AS ts_slope_micro
         FROM rk WHERE rn = ceil(cnt / 2.0)""",
    // q340: the shared gate flags split at the doc_id midpoint,
    // pooled two-proportion z, |z| > 3 verdict.
    "q340_gate_drift" ->
      s"""WITH $gateFlagsCtes,
         md AS (SELECT ((min(doc_id) + max(doc_id)) // 2)::BIGINT
                  AS mid
                FROM documents),
         ag AS (SELECT gate,
                  sum(CASE WHEN doc_id <= md.mid THEN 1 ELSE 0
                    END)::BIGINT AS n1,
                  sum(CASE WHEN doc_id <= md.mid AND f THEN 1 ELSE 0
                    END)::BIGINT AS k1,
                  sum(CASE WHEN doc_id > md.mid THEN 1 ELSE 0
                    END)::BIGINT AS n2,
                  sum(CASE WHEN doc_id > md.mid AND f THEN 1 ELSE 0
                    END)::BIGINT AS k2
                FROM fl, md GROUP BY 1),
         zz AS (SELECT ag.*,
                 CASE WHEN sqrt(((k1 + k2)::DOUBLE / (n1 + n2))
                     * (1.0 - (k1 + k2)::DOUBLE / (n1 + n2))
                     * (1.0 / n1 + 1.0 / n2)) = 0 THEN 0.0
                   ELSE (k1::DOUBLE / n1 - k2::DOUBLE / n2)
                     / sqrt(((k1 + k2)::DOUBLE / (n1 + n2))
                       * (1.0 - (k1 + k2)::DOUBLE / (n1 + n2))
                       * (1.0 / n1 + 1.0 / n2))
                 END AS z
               FROM ag)
         SELECT gate, n1, k1, n2, k2,
           (((2*(k1) * 1000000 + (n1)) // (2*(n1)))::BIGINT) AS rate1_ppm,
           (((2*(k2) * 1000000 + (n2)) // (2*(n2)))::BIGINT) AS rate2_ppm,
           CAST(round(z * 1e3) AS BIGINT) AS z_milli,
           coalesce(abs(z) > 3.0, false) AS drifted
         FROM zz""",
    // q341: the canonical chain's labels/sizes/scores; best and
    // min-id survivors via rank windows; size bands capped at 5.
    "q341_survivor_uplift" ->
      s"""WITH RECURSIVE $canonicalChainCtes,
         mem AS (SELECT lab.cluster_id, sz.cluster_size, lab.doc_id,
                  qm.q_micro AS qv
                FROM lab JOIN sz USING (cluster_id)
                JOIN qm USING (doc_id)
                WHERE sz.cluster_size > 1),
         rk AS (SELECT mem.*,
                 row_number() OVER (PARTITION BY cluster_id
                   ORDER BY qv DESC, doc_id ASC) AS r_best,
                 row_number() OVER (PARTITION BY cluster_id
                   ORDER BY doc_id ASC) AS r_min
               FROM mem),
         pc AS (SELECT cluster_id, max(cluster_size) AS cluster_size,
                  count(*)::BIGINT AS n, sum(qv)::BIGINT AS q_sum,
                  max(CASE WHEN r_best = 1 THEN qv END)::BIGINT
                    AS q_best,
                  max(CASE WHEN r_min = 1 THEN qv END)::BIGINT
                    AS q_minid
                FROM rk GROUP BY 1)
         SELECT least(cluster_size, 5)::BIGINT AS size_band,
           count(*)::BIGINT AS n_clusters,
           ${sqlIdivHalfUp("sum(q_best)", "count(*)")} AS best_micro,
           ${sqlIdivHalfUp("sum(q_minid)", "count(*)")} AS minid_micro,
           ${sqlIdivHalfUp("sum(q_sum)", "sum(n)")} AS member_micro,
           ${sqlIdivHalfUp("sum(q_best)", "count(*)")}
             - ${sqlIdivHalfUp("sum(q_minid)", "count(*)")}
             AS uplift_micro
         FROM pc GROUP BY 1""",
    // q342: the q21 pair chain at J >= 0.5, decimal-digit gap bands,
    // cumulative coverage over the bounded band frame.
    "q342_dup_gaps" ->
      s"""WITH $shinglesCte,
         e0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
                WHERE len(sh) > 0),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*) AS inter,
                  any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
                FROM e0 a JOIN e0 b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         gp AS (SELECT length(CAST(doc_b - doc_a AS VARCHAR))::BIGINT
                  AS gap_digits
                FROM pr
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                  >= 0.5),
         bd AS (SELECT gap_digits, count(*)::BIGINT AS n_pairs
                FROM gp GROUP BY 1),
         tt AS (SELECT sum(n_pairs)::BIGINT AS n_total FROM bd),
         cm AS (SELECT gap_digits, n_pairs,
                 sum(n_pairs) OVER (ORDER BY gap_digits
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS cum
               FROM bd)
         SELECT cm.gap_digits, cm.n_pairs,
           (((2*(cm.cum) * 1000000 + (tt.n_total)) // (2*(tt.n_total)))::BIGINT)
             AS coverage_ppm
         FROM cm, tt""",
    // q343: the q310 selection replayed, two-sample z on raw-moment
    // variances, micro means.
    "q343_holdout_rep" ->
      s"""WITH $qMicroCte,
         d0 AS (SELECT doc_id, source, lang,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h
           FROM documents),
         cn AS (SELECT source, lang, count(*)::BIGINT AS n_cell
                FROM d0 GROUP BY 1, 2),
         ct AS (SELECT source, lang, n_cell,
                 least(n_cell, greatest(5,
                   CAST(round(n_cell * 0.05) AS BIGINT))) AS k_target
               FROM cn),
         fl2 AS (SELECT d0.doc_id, d0.source,
                  row_number() OVER (PARTITION BY d0.source, d0.lang
                    ORDER BY d0.h, d0.doc_id) <= ct.k_target
                    AS held_out
                FROM d0 JOIN ct USING (source, lang)),
         sc AS (SELECT fl2.source, fl2.held_out,
                  q2.q_micro AS qm
                FROM fl2 JOIN qm q2 USING (doc_id)),
         ag AS (SELECT source,
                  sum(CASE WHEN held_out THEN 1 ELSE 0 END)::BIGINT
                    AS n_h,
                  sum(CASE WHEN held_out THEN qm ELSE 0 END)::BIGINT
                    AS s_h,
                  sum(CASE WHEN held_out THEN qm * qm ELSE 0
                    END)::BIGINT AS s2_h,
                  sum(CASE WHEN NOT held_out THEN 1 ELSE 0
                    END)::BIGINT AS n_t,
                  sum(CASE WHEN NOT held_out THEN qm ELSE 0
                    END)::BIGINT AS s_t,
                  sum(CASE WHEN NOT held_out THEN qm * qm ELSE 0
                    END)::BIGINT AS s2_t
                FROM sc GROUP BY 1),
         zz AS (SELECT ag.*,
                 CASE WHEN sqrt((s2_h::DOUBLE / n_h
                     - (s_h::DOUBLE / n_h) * (s_h::DOUBLE / n_h))
                     / n_h
                     + (s2_t::DOUBLE / n_t
                       - (s_t::DOUBLE / n_t) * (s_t::DOUBLE / n_t))
                     / n_t) = 0 THEN 0.0
                   ELSE (s_h::DOUBLE / n_h - s_t::DOUBLE / n_t)
                     / sqrt((s2_h::DOUBLE / n_h
                       - (s_h::DOUBLE / n_h) * (s_h::DOUBLE / n_h))
                       / n_h
                       + (s2_t::DOUBLE / n_t
                         - (s_t::DOUBLE / n_t) * (s_t::DOUBLE / n_t))
                       / n_t)
                 END AS z
               FROM ag WHERE n_h > 1 AND n_t > 1)
         SELECT source, n_h, n_t,
           CAST(round(s_h::DOUBLE / n_h) AS BIGINT) AS holdout_micro,
           CAST(round(s_t::DOUBLE / n_t) AS BIGINT) AS train_micro,
           CAST(round(z * 1e3) AS BIGINT) AS z_milli,
           coalesce(abs(z) > 3.0, false) AS unrepresentative
         FROM zz""",
    // q344: the shared gate flags x ten-token buckets, exact rates.
    "q344_gate_curves" ->
      s"""WITH $gateFlagsCtes,
         st AS (SELECT doc_id,
                 least(CAST(floor((CASE WHEN length(trim(text)) = 0
                   THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                   END) / 10.0) AS BIGINT), 9) AS len_bucket
               FROM documents)
         SELECT fl.gate, st.len_bucket, count(*)::BIGINT AS n,
           sum(CASE WHEN fl.f THEN 1 ELSE 0 END)::BIGINT AS n_pass,
           (((2*(sum(CASE WHEN fl.f THEN 1 ELSE 0 END)) * 1000000 + (count(*))) // (2*(count(*))))::BIGINT) AS pass_ppm
         FROM fl JOIN st USING (doc_id)
         GROUP BY 1, 2""",
    // q345: distinct (type, hour, user) pass, bounded rank windows,
    // the q197 exact-rank percentile convention.
    "q345_concurrency" ->
      """WITH hu AS (SELECT DISTINCT event_type,
                 epoch_us(ts) // 3600000000 AS h, user_id
               FROM events),
         hc AS (SELECT event_type, h, count(*)::BIGINT AS u
                FROM hu GROUP BY 1, 2),
         rk AS (SELECT event_type, h, u,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY u, h)::BIGINT AS rn,
                 count(*) OVER (PARTITION BY event_type)::BIGINT
                   AS cnt
               FROM hc),
         p50 AS (SELECT event_type, u AS p50_users FROM rk
                 WHERE rn = ceil(cnt / 2.0)),
         p95 AS (SELECT event_type, u AS p95_users FROM rk
                 WHERE rn = ceil(cnt * 19 / 20.0)),
         mx AS (SELECT event_type, count(*)::BIGINT AS n_hours,
                  max(u)::BIGINT AS max_users
                FROM hc GROUP BY 1)
         SELECT mx.event_type, mx.n_hours, p50.p50_users,
           p95.p95_users, mx.max_users,
           (((2*(p95.p95_users * 1000) + (p50.p50_users)) // (2*(p50.p50_users)))::BIGINT) AS burst_ratio_milli
         FROM mx JOIN p50 USING (event_type)
         JOIN p95 USING (event_type)""",
    // q346: nano-quantized ln(N/df) weights, weighted inversion
    // sums, the same 0.05 emission and 0.5 flip predicates.
    "q346_weighted_jaccard" ->
      s"""WITH $shinglesCte,
         e AS (SELECT doc_id, unnest(sh) AS s FROM d
               WHERE len(sh) > 0),
         nd AS (SELECT count(*)::BIGINT AS nd FROM d
                WHERE len(sh) > 0),
         df AS (SELECT s, count(*)::BIGINT AS df FROM e GROUP BY 1),
         w AS (SELECT s,
                 CAST(round(ln(nd.nd::DOUBLE / df) * 1e9) AS BIGINT)
                   AS w_nano
               FROM df, nd),
         ew AS (SELECT e.doc_id, e.s, w.w_nano FROM e JOIN w USING (s)),
         dw AS (SELECT doc_id, sum(w_nano)::BIGINT AS w_doc,
                  count(*)::BIGINT AS n_sh
                FROM ew GROUP BY 1),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  sum(a.w_nano)::BIGINT AS inter_w,
                  count(*)::BIGINT AS inter
                FROM ew a JOIN ew b
                  ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         j AS (SELECT pr.doc_a, pr.doc_b,
                 pr.inter, (da.n_sh + db.n_sh - pr.inter) AS union_n,
                 pr.inter_w,
                 (da.w_doc + db.w_doc - pr.inter_w) AS union_w,
                 round(pr.inter::DOUBLE
                   / (da.n_sh + db.n_sh - pr.inter), 6) AS j_sel,
                 round(pr.inter_w::DOUBLE
                   / (da.w_doc + db.w_doc - pr.inter_w), 6)
                   AS w_sel
               FROM pr
               JOIN dw da ON pr.doc_a = da.doc_id
               JOIN dw db ON pr.doc_b = db.doc_id)
         SELECT doc_a, doc_b,
           ${sqlMicroRatio("inter", "union_n")} AS jaccard_ppm,
           ${sqlIdivHalfUp("inter_w * 1000", "union_w")}
             AS wjaccard_milli,
           (j_sel >= 0.5) <> (w_sel >= 0.5) AS flipped
         FROM j WHERE j_sel >= 0.05 OR w_sel >= 0.05""",
    // q347: three candidate generators vs the exact truth; analytic
    // n(n-1)/2 pair space; q22's band chain reused for the second.
    "q347_blocking_quality" ->
      s"""WITH $shinglesCte,
         e0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
                WHERE len(sh) > 0),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*) AS inter,
                  any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
                FROM e0 a JOIN e0 b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         truth AS (SELECT doc_a, doc_b FROM pr
                   WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                     >= 0.5),
         nt AS (SELECT count(*)::BIGINT AS n_true FROM truth),
         nd AS (SELECT count(*)::BIGINT AS nd FROM documents),
         t0 AS (SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\\s+')
                 END AS toks
               FROM documents),
         ft AS (SELECT doc_id, toks[1] AS k FROM t0
                WHERE len(toks) >= 1),
         ftp AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM ft a JOIN ft b
                   ON a.k = b.k AND a.doc_id < b.doc_id),
         m AS (SELECT doc_id,
                 list_transform(range(8), i -> list_min(list_transform(sh,
                   s -> ('0x' || substr(md5(i || ':' || s), 1, 15))::BIGINT))) AS mh
               FROM d WHERE len(sh) > 0),
         bd AS (SELECT doc_id, t.j,
                  mh[t.j*2+1] || '_' || mh[t.j*2+2] AS bval
                FROM m, range(4) t(j)),
         mhp AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM bd a JOIN bd b
                   ON a.j = b.j AND a.bval = b.bval
                     AND a.doc_id < b.doc_id),
         lb AS (SELECT doc_id,
                 least(CAST(floor(len(toks) / 10.0) AS BIGINT), 9)
                   AS k
               FROM t0),
         lbp AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM lb a JOIN lb b
                   ON a.k = b.k AND a.doc_id < b.doc_id),
         raw AS (
           SELECT 'first_token' AS scheme,
             (SELECT count(*) FROM ftp)::BIGINT AS n_candidates,
             (SELECT count(*) FROM ftp JOIN truth
                USING (doc_a, doc_b))::BIGINT AS n_covered
           UNION ALL
           SELECT 'minhash_bands',
             (SELECT count(*) FROM mhp)::BIGINT,
             (SELECT count(*) FROM mhp JOIN truth
                USING (doc_a, doc_b))::BIGINT
           UNION ALL
           SELECT 'length_bucket',
             (SELECT count(*) FROM lbp)::BIGINT,
             (SELECT count(*) FROM lbp JOIN truth
                USING (doc_a, doc_b))::BIGINT)
         SELECT scheme, n_candidates, nt.n_true, n_covered,
           (((2*(nd.nd * (nd.nd - 1) - 2 * n_candidates) * 1000000 + (nd.nd * (nd.nd - 1))) // (2*(nd.nd * (nd.nd - 1))))::BIGINT)
             AS reduction_ppm,
           CASE WHEN nt.n_true = 0 THEN 0
                ELSE (((2*(n_covered) * 1000000 + (nt.n_true)) // (2*(nt.n_true)))::BIGINT)
           END AS completeness_ppm
         FROM raw, nt, nd""",
    // q348: four cumulative hash projections, exact distinct/dup
    // counts per stage.
    "q348_normalization_lift" ->
      """WITH s0 AS (SELECT md5(text) AS h FROM documents),
         s1 AS (SELECT md5(lower(text)) AS h FROM documents),
         s2 AS (SELECT md5(regexp_replace(trim(lower(text)),
                  '\s+', ' ', 'g')) AS h FROM documents),
         s3 AS (SELECT md5(regexp_replace(regexp_replace(
                  trim(lower(text)), '\s+', ' ', 'g'),
                  '[.,!?;:]', '', 'g')) AS h FROM documents),
         a0 AS (SELECT '0_raw' AS stage, count(*)::BIGINT AS n_distinct,
                  sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT
                    AS docs_in_dups,
                  sum(c)::BIGINT AS n_docs
                FROM (SELECT h, count(*)::BIGINT AS c FROM s0
                      GROUP BY 1)),
         a1 AS (SELECT '1_lower', count(*)::BIGINT,
                  sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT,
                  sum(c)::BIGINT
                FROM (SELECT h, count(*)::BIGINT AS c FROM s1
                      GROUP BY 1)),
         a2 AS (SELECT '2_whitespace', count(*)::BIGINT,
                  sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT,
                  sum(c)::BIGINT
                FROM (SELECT h, count(*)::BIGINT AS c FROM s2
                      GROUP BY 1)),
         a3 AS (SELECT '3_punct', count(*)::BIGINT,
                  sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT,
                  sum(c)::BIGINT
                FROM (SELECT h, count(*)::BIGINT AS c FROM s3
                      GROUP BY 1)),
         u AS (SELECT * FROM a0 UNION ALL SELECT * FROM a1
               UNION ALL SELECT * FROM a2 UNION ALL SELECT * FROM a3)
         SELECT stage, n_distinct, docs_in_dups,
           (((2*(docs_in_dups) * 1000000 + (n_docs)) // (2*(n_docs)))::BIGINT)
             AS dup_ppm
         FROM u""",
    // q349: the canonical chain's survivor rank; removed = rn > 1;
    // token ledger per source with the zero guard.
    "q349_dedup_savings" ->
      s"""WITH RECURSIVE $canonicalChainCtes,
         rem AS (SELECT doc_id FROM surv WHERE rn > 1),
         tk AS (SELECT doc_id, source,
                 (CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                  END)::BIGINT AS tk
               FROM documents),
         j AS (SELECT tk.source, tk.tk,
                 rem.doc_id IS NOT NULL AS removed
               FROM tk LEFT JOIN rem USING (doc_id))
         SELECT source, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN removed THEN 1 ELSE 0 END)::BIGINT
             AS docs_removed,
           sum(CASE WHEN removed THEN tk ELSE 0 END)::BIGINT
             AS tokens_removed,
           CASE WHEN sum(tk) = 0 THEN NULL
                ELSE ${sqlMicroRatio(
        "sum(CASE WHEN removed THEN tk ELSE 0 END)", "sum(tk)")}
           END AS removed_ppm
         FROM j GROUP BY 1""",
    // q350: two lags on the q262 window, bounded trigram cells,
    // top-5 per start with the lexicographic tiebreak.
    "q350_event_paths" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                 epoch_us(ts) AS us
               FROM events),
         t AS (SELECT event_type, us,
                 lag(event_type, 1) OVER w AS p1,
                 lag(event_type, 2) OVER w AS p2
               FROM e WINDOW w AS (PARTITION BY user_id
                 ORDER BY us, event_id)),
         tri AS (SELECT p2 AS step1, p1 AS step2,
                  event_type AS step3, count(*)::BIGINT AS n
                FROM t WHERE p2 IS NOT NULL GROUP BY 1, 2, 3),
         tt AS (SELECT step1, sum(n)::BIGINT AS start_total
                FROM tri GROUP BY 1),
         rk AS (SELECT tri.*, row_number() OVER
                  (PARTITION BY step1
                   ORDER BY n DESC, step2 ASC, step3 ASC)::BIGINT
                  AS rk
                FROM tri)
         SELECT rk.step1, rk.rk, rk.step2, rk.step3, rk.n,
           (((2*(rk.n) * 1000000 + (tt.start_total)) // (2*(tt.start_total)))::BIGINT)
             AS share_ppm
         FROM rk JOIN tt USING (step1) WHERE rk.rk <= 5""",
    // q351: the q313 length-difference counts, the zh->CJK rule,
    // the strict-majority inconsistency predicate.
    "q351_script_consistency" ->
      """WITH c AS (SELECT lang,
             (length(text) - length(regexp_replace(text,
               '[\x{4E00}-\x{9FFF}]', '', 'g')))::BIGINT AS cjk_n,
             (length(text) - length(regexp_replace(text,
               '[A-Za-z]', '', 'g')))::BIGINT AS lat_n
           FROM documents),
         p AS (SELECT lang, cjk_n + lat_n AS letters,
                 CASE WHEN lang = 'zh' THEN cjk_n ELSE lat_n END
                   AS expected
               FROM c),
         f AS (SELECT lang,
                 expected * 2 < letters AS inconsistent
               FROM p WHERE letters > 0)
         SELECT lang, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN inconsistent THEN 1 ELSE 0 END)::BIGINT
             AS n_inconsistent,
           (((2*(sum(CASE WHEN inconsistent THEN 1 ELSE 0 END)) * 1000000 + (count(*))) // (2*(count(*))))::BIGINT)
             AS inconsistent_ppm
         FROM f GROUP BY 1""",
    // q352: the shifted doc_id-1 self-join, run-start predicate,
    // exact run counts.
    "q352_source_runs" ->
      """WITH d AS (SELECT doc_id, source FROM documents),
         wp AS (SELECT d.doc_id, d.source, p.source AS prev_source
                FROM d LEFT JOIN d p ON p.doc_id = d.doc_id - 1)
         SELECT source, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN prev_source IS NULL
                 OR prev_source <> source THEN 1 ELSE 0 END)::BIGINT
             AS n_runs,
           (((2*(count(*) * 1000) + (sum(CASE WHEN prev_source IS NULL OR prev_source <> source THEN 1 ELSE 0 END))) // (2*(sum(CASE WHEN prev_source IS NULL OR prev_source <> source THEN 1 ELSE 0 END))))::BIGINT) AS mean_run_milli
         FROM wp GROUP BY 1""",
    // q353: second-quantized gaps, value-domain cumsums per pair,
    // the exact integer percentile predicates.
    "q353_transition_dwell" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                 epoch_us(ts) AS us
               FROM events),
         t AS (SELECT event_type, us,
                 lag(event_type) OVER w AS prev_type,
                 lag(us) OVER w AS prev_us
               FROM e WINDOW w AS (PARTITION BY user_id
                 ORDER BY us, event_id)),
         tr AS (SELECT prev_type AS from_type,
                  event_type AS to_type,
                  (us - prev_us) // 1000000 AS gap_s
                FROM t WHERE prev_type IS NOT NULL),
         c AS (SELECT from_type, to_type, gap_s,
                 count(*)::BIGINT AS c
               FROM tr GROUP BY 1, 2, 3),
         cu AS (SELECT from_type, to_type, gap_s, c,
                 sum(c) OVER (PARTITION BY from_type, to_type
                   ORDER BY gap_s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS cumc,
                 sum(c) OVER (PARTITION BY from_type, to_type
                   )::BIGINT AS n
               FROM c),
         p50 AS (SELECT from_type, to_type,
                  min(gap_s)::BIGINT AS p50_gap_s
                FROM cu WHERE cumc * 2 >= n GROUP BY 1, 2),
         p95 AS (SELECT from_type, to_type,
                  min(gap_s)::BIGINT AS p95_gap_s
                FROM cu WHERE cumc * 20 >= n * 19 GROUP BY 1, 2),
         nn AS (SELECT from_type, to_type, max(n)::BIGINT AS n
                FROM cu GROUP BY 1, 2)
         SELECT nn.from_type, nn.to_type, nn.n, p50.p50_gap_s,
           p95.p95_gap_s
         FROM nn JOIN p50 USING (from_type, to_type)
         JOIN p95 USING (from_type, to_type)""",
    // q354: the shared pattern counts, the same subset/order lattice
    // rows as VALUES, exact short-circuit totals, 24-row rank.
    "q354_gate_ordering" -> {
      val subs = graft.operators.TextAnalysis.gateSubsetLattice
        .map { case (m, ig, il, im, ip) => s"($m, $ig, $il, $im, $ip)" }
        .mkString(", ")
      val ords = graft.operators.TextAnalysis.gateOrderLattice
        .map { case (n, m1, m2, m3) => s"('$n', $m1, $m2, $m3)" }
        .mkString(", ")
      s"""WITH $gateFlagsCtes,
         wd AS (SELECT doc_id,
                  max(CASE WHEN gate = 'gopher' THEN f END) AS fg,
                  max(CASE WHEN gate = 'lr' THEN f END) AS fl2,
                  max(CASE WHEN gate = 'ml' THEN f END) AS fm,
                  max(CASE WHEN gate = 'ppl' THEN f END) AS fp
                FROM fl GROUP BY 1),
         wf AS (SELECT * FROM wd WHERE fg IS NOT NULL
                  AND fl2 IS NOT NULL AND fm IS NOT NULL
                  AND fp IS NOT NULL),
         pat AS (SELECT fg, fl2, fm, fp, count(*)::BIGINT AS c
                 FROM wf GROUP BY 1, 2, 3, 4),
         subs AS (SELECT * FROM (VALUES $subs)
                    v(mask, ig, il, im, ip)),
         sc AS (SELECT subs.mask,
                  sum(CASE WHEN (subs.ig = 0 OR pat.fg)
                    AND (subs.il = 0 OR pat.fl2)
                    AND (subs.im = 0 OR pat.fm)
                    AND (subs.ip = 0 OR pat.fp)
                    THEN pat.c ELSE 0 END)::BIGINT AS pass_c
                FROM pat CROSS JOIN subs GROUP BY 1),
         nt AS (SELECT sum(c)::BIGINT AS n FROM pat),
         ords AS (SELECT * FROM (VALUES $ords)
                    v(ordering, m1, m2, m3)),
         tot AS (SELECT ords.ordering,
                  (nt.n + s1.pass_c + s2.pass_c + s3.pass_c)::BIGINT
                    AS total_evals
                FROM ords
                JOIN sc s1 ON s1.mask = ords.m1
                JOIN sc s2 ON s2.mask = ords.m2
                JOIN sc s3 ON s3.mask = ords.m3, nt)
         SELECT ordering, total_evals,
           row_number() OVER (ORDER BY total_evals, ordering)::BIGINT
             AS rank,
           row_number() OVER (ORDER BY total_evals, ordering) = 1
             AS optimal
         FROM tot"""
    },
    // q355: the q254 burst chain as a left-join verdict, exact
    // micro-value sums on both sides of the flag.
    "q355_burst_value" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour,
                 count(*)::BIGINT AS n
               FROM events GROUP BY 1, 2),
         w AS (SELECT event_type, hour, n,
                 count(*) OVER tw AS k, sum(n) OVER tw AS s,
                 sum(n * n) OVER tw AS s2
               FROM h WINDOW tw AS (PARTITION BY event_type
                 ORDER BY hour ROWS BETWEEN 24 PRECEDING
                 AND 1 PRECEDING)),
         bu AS (SELECT event_type, epoch_us(hour)::BIGINT AS hour_us
                FROM w
                WHERE k >= 12
                  AND (s2::DOUBLE - s::DOUBLE * s / k) / k > 0
                  AND (n - s::DOUBLE / k)
                    / sqrt((s2::DOUBLE - s::DOUBLE * s / k) / k)
                    > 3.0),
         ev AS (SELECT event_type,
                  epoch_us(date_trunc('hour', ts))::BIGINT AS hour_us,
                  CAST(round(value * 1e6) AS BIGINT) AS vm
                FROM events),
         j AS (SELECT ev.event_type, ev.vm,
                 bu.hour_us IS NOT NULL AS in_burst
               FROM ev LEFT JOIN bu USING (event_type, hour_us))
         SELECT event_type, in_burst, count(*)::BIGINT AS n_events,
           CAST(round(sum(vm)::DOUBLE / count(*)) AS BIGINT)
             AS mean_value_micro
         FROM j GROUP BY 1, 2""",
    // q356: value-domain cumsums per lang, the exact integer
    // percentile predicates, five columns.
    "q356_length_five_point" ->
      """WITH v AS (SELECT lang,
             (CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+'))
              END)::BIGINT AS k
           FROM documents),
         c AS (SELECT lang, k, count(*)::BIGINT AS c FROM v
               GROUP BY 1, 2),
         cu AS (SELECT lang, k, c,
                 sum(c) OVER (PARTITION BY lang ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS cumc,
                 sum(c) OVER (PARTITION BY lang)::BIGINT AS n
               FROM c),
         p25 AS (SELECT lang, min(k)::BIGINT AS p25_toks FROM cu
                 WHERE cumc * 4 >= n GROUP BY 1),
         p50 AS (SELECT lang, min(k)::BIGINT AS p50_toks FROM cu
                 WHERE cumc * 2 >= n GROUP BY 1),
         p75 AS (SELECT lang, min(k)::BIGINT AS p75_toks FROM cu
                 WHERE cumc * 4 >= n * 3 GROUP BY 1),
         ex AS (SELECT lang, max(n)::BIGINT AS n_docs,
                  min(k)::BIGINT AS min_toks,
                  max(k)::BIGINT AS max_toks
                FROM cu GROUP BY 1)
         SELECT ex.lang, ex.n_docs, ex.min_toks, p25.p25_toks,
           p50.p50_toks, p75.p75_toks, ex.max_toks
         FROM ex JOIN p25 USING (lang) JOIN p50 USING (lang)
         JOIN p75 USING (lang)""",
    // q357: the same construction over events-per-user counts.
    "q357_user_five_point" ->
      """WITH pu AS (SELECT event_type, user_id,
                 count(*)::BIGINT AS k
               FROM events GROUP BY 1, 2),
         c AS (SELECT event_type, k, count(*)::BIGINT AS c FROM pu
               GROUP BY 1, 2),
         cu AS (SELECT event_type, k, c,
                 sum(c) OVER (PARTITION BY event_type ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS cumc,
                 sum(c) OVER (PARTITION BY event_type)::BIGINT AS n
               FROM c),
         p25 AS (SELECT event_type, min(k)::BIGINT AS p25_k FROM cu
                 WHERE cumc * 4 >= n GROUP BY 1),
         p50 AS (SELECT event_type, min(k)::BIGINT AS p50_k FROM cu
                 WHERE cumc * 2 >= n GROUP BY 1),
         p75 AS (SELECT event_type, min(k)::BIGINT AS p75_k FROM cu
                 WHERE cumc * 4 >= n * 3 GROUP BY 1),
         ex AS (SELECT event_type, max(n)::BIGINT AS n_users,
                  min(k)::BIGINT AS min_k, max(k)::BIGINT AS max_k
                FROM cu GROUP BY 1)
         SELECT ex.event_type, ex.n_users, ex.min_k, p25.p25_k,
           p50.p50_k, p75.p75_k, ex.max_k
         FROM ex JOIN p25 USING (event_type)
         JOIN p50 USING (event_type) JOIN p75 USING (event_type)""",
    // q358: per-user micro value sums, exact top-1% rank cut,
    // (value desc, user asc) tie order.
    "q358_value_concentration" ->
      """WITH pu AS (SELECT event_type, user_id,
                 sum(CAST(round(value * 1e6) AS BIGINT))::BIGINT AS v
               FROM events GROUP BY 1, 2),
         rk AS (SELECT event_type, user_id, v,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY v DESC, user_id ASC)::BIGINT AS rk,
                 count(*) OVER (PARTITION BY event_type)::BIGINT AS n
               FROM pu),
         ag AS (SELECT event_type, max(n)::BIGINT AS n_users,
                  max(CAST(ceil(n / 100.0) AS BIGINT))::BIGINT
                    AS k_top,
                  sum(v)::BIGINT AS v_total,
                  sum(CASE WHEN rk <= ceil(n / 100.0) THEN v ELSE 0
                    END)::BIGINT AS v_top
                FROM rk GROUP BY 1)
         SELECT event_type, n_users, k_top, v_total, v_top,
           (CASE WHEN v_total = 0 THEN NULL
             ELSE (((2*(v_top) * 1000000 + (v_total)) // (2*(v_total)))::BIGINT) END) AS top_share_ppm
         FROM ag""",
    // q359: date_trunc('week') buckets (Monday on both engines),
    // bounded lag window, one growth division.
    "q359_weekly_growth" ->
      """WITH wk AS (SELECT event_type,
                 epoch_us(date_trunc('week', ts))::BIGINT AS week_us,
                 count(*)::BIGINT AS n
               FROM events GROUP BY 1, 2),
         lg AS (SELECT event_type, week_us, n,
                 lag(n) OVER (PARTITION BY event_type
                   ORDER BY week_us)::BIGINT AS prev_n
               FROM wk)
         SELECT event_type, week_us, n, prev_n,
           CASE WHEN prev_n IS NULL THEN NULL
                ELSE (CASE WHEN ((n - prev_n) * 1000000) < 0 THEN -(((2*(-((n - prev_n) * 1000000)) + (prev_n)) // (2*(prev_n)))::BIGINT) ELSE (((2*((n - prev_n) * 1000000) + (prev_n)) // (2*(prev_n)))::BIGINT) END)
           END AS growth_ppm
         FROM lg""",
    // q360: the canonical closure + the gate flags + exact-dup
    // survivors composed into the one-row ledger; docs outside the
    // shingle closure keep themselves; gates vote where defined.
    "q360_trainable_tokens" ->
      s"""WITH RECURSIVE $canonicalChainCtes,
         $gateFlagsCtes,
         tk AS (SELECT doc_id,
                 (CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                  END)::BIGINT AS tk
               FROM documents),
         ex AS (SELECT min(doc_id) AS doc_id FROM documents
                GROUP BY md5(text)),
         nk AS (SELECT doc_id FROM surv WHERE rn = 1),
         cl AS (SELECT doc_id FROM lab),
         gk AS (SELECT doc_id FROM fl GROUP BY doc_id
                HAVING sum(CASE WHEN NOT f THEN 1 ELSE 0 END) = 0),
         a AS (SELECT tk.tk,
                 ex.doc_id IS NOT NULL AS ek,
                 (nk.doc_id IS NOT NULL OR cl.doc_id IS NULL) AS nk2,
                 gk.doc_id IS NOT NULL AS gk2
               FROM tk
               LEFT JOIN ex USING (doc_id)
               LEFT JOIN nk USING (doc_id)
               LEFT JOIN cl USING (doc_id)
               LEFT JOIN gk USING (doc_id))
         SELECT count(*)::BIGINT AS n_docs,
           sum(tk)::BIGINT AS total_tokens,
           sum(CASE WHEN ek THEN tk ELSE 0 END)::BIGINT
             AS after_exact_dedup,
           sum(CASE WHEN ek AND nk2 THEN tk ELSE 0 END)::BIGINT
             AS after_near_dedup,
           sum(CASE WHEN ek AND nk2 AND gk2 THEN tk ELSE 0
             END)::BIGINT AS trainable_tokens,
           (((2*(sum(CASE WHEN ek AND nk2 AND gk2 THEN tk ELSE 0 END)) * 1000000 + (sum(tk))) // (2*(sum(tk))))::BIGINT)
             AS trainable_ppm
         FROM a""",
    // q240: same eval slice, same cosine fold, the argmax replayed as
    // a rank-1 window with the vec_id tiebreak on the unrounded sim.
    // q361: three integer sums per (lang), exact milli divisions;
    // English baseline as a 1-row cross join.
    "q361_tokenizer_fertility" ->
      """WITH b AS (SELECT lang,
             (CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+'))
              END)::BIGINT AS ws,
             len(regexp_extract_all(lower(text),
               '[a-z0-9]+|[^a-z0-9\s]'))::BIGINT AS bpe,
             octet_length(encode(text))::BIGINT AS bytes
           FROM documents),
         pl AS (SELECT lang, count(*)::BIGINT AS n_docs,
                  sum(ws)::BIGINT AS ws_tokens,
                  sum(bpe)::BIGINT AS bpe_tokens,
                  sum(bytes)::BIGINT AS n_bytes
                FROM b GROUP BY 1),
         p2 AS (SELECT *,
                  (((2*(bpe_tokens * 1000) + (ws_tokens)) // (2*(ws_tokens)))::BIGINT) AS fertility_milli,
                  (((2*(n_bytes * 1000) + (bpe_tokens)) // (2*(bpe_tokens)))::BIGINT)
                    AS bytes_per_bpe_milli
                FROM pl),
         en AS (SELECT fertility_milli AS ef FROM p2 WHERE lang = 'en')
         SELECT lang, n_docs, ws_tokens, bpe_tokens, fertility_milli,
           bytes_per_bpe_milli,
           (((2*(fertility_milli * 1000) + (en.ef)) // (2*(en.ef)))::BIGINT) AS fertility_tax_milli
         FROM p2, en""",
    // q362: the q191 md5 order cut into batches of 32; majority via
    // the (count, source) lexicographic max — struct-max twin.
    "q362_batch_diversity" ->
      """WITH o AS (SELECT doc_id, source, lang,
             (row_number() OVER (ORDER BY md5(doc_id::VARCHAR) ASC,
                doc_id ASC) - 1) // 32 AS batch
           FROM documents),
         bs AS (SELECT batch, source, count(*)::BIGINT AS c
                FROM o GROUP BY 1, 2),
         tp AS (SELECT batch, count(*)::BIGINT AS n_sources,
                  max(struct_pack(c := c, source := source)) AS top
                FROM bs GROUP BY 1),
         ba AS (SELECT batch, count(*)::BIGINT AS n_docs,
                  count(DISTINCT lang)::BIGINT AS n_langs
                FROM o GROUP BY 1)
         SELECT ba.batch, ba.n_docs, tp.n_sources, ba.n_langs,
           tp.top.source AS majority_source,
           (((2*(tp.top.c) * 1000000 + (ba.n_docs)) // (2*(ba.n_docs)))::BIGINT)
             AS majority_share_ppm
         FROM ba JOIN tp USING (batch)""",
    // q363: fixed 10-word profile cells, broadcast corpus ppm, exact
    // |delta-ppm| L1 rollup.
    "q363_stopword_drift" ->
      """WITH tok AS (SELECT source, unnest(
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END)
               AS w
           FROM documents),
         sw AS (SELECT unnest(['the','a','an','and','or','of','to',
             'in','is','it']) AS w),
         ps AS (SELECT source, count(*)::BIGINT AS n_tokens,
                  sum(CASE WHEN w IN ('the','a','an','and','or','of',
                    'to','in','is','it') THEN 1 ELSE 0 END)::BIGINT
                    AS n_stop
                FROM tok GROUP BY 1),
         cells AS (SELECT source, w, count(*)::BIGINT AS c FROM tok
                   WHERE w IN ('the','a','an','and','or','of','to',
                     'in','is','it')
                   GROUP BY 1, 2),
         gn AS (SELECT count(*)::BIGINT AS gn FROM tok),
         corpus AS (SELECT cells.w,
                      (((2*(sum(c)) * 1000000 + (gn.gn))
                        // (2*(gn.gn)))::BIGINT) AS g_ppm
                    FROM cells, gn GROUP BY cells.w, gn.gn),
         dr AS (SELECT ps.source,
                  sum(abs(
                    (((2*(coalesce(cells.c, 0)) * 1000000
                      + (ps.n_tokens)) // (2*(ps.n_tokens)))::BIGINT)
                    - corpus.g_ppm))::BIGINT AS l1_drift_ppm
                FROM ps CROSS JOIN corpus
                LEFT JOIN cells ON cells.source = ps.source
                  AND cells.w = corpus.w
                GROUP BY 1)
         SELECT ps.source, ps.n_tokens,
           (((2*(ps.n_stop) * 1000000 + (ps.n_tokens))
             // (2*(ps.n_tokens)))::BIGINT) AS stop_mass_ppm,
           dr.l1_drift_ppm
         FROM ps JOIN dr USING (source)""",
    // q364: same prefix derivation; per-source top-3 via
    // row_number (count desc, prefix asc).
    "q364_boilerplate_prefixes" ->
      """WITH d AS (SELECT source,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+')
             END AS t
           FROM documents),
         p AS (SELECT source,
                 array_to_string(t[1:3], ' ') AS prefix
               FROM d WHERE len(t) >= 3),
         tt AS (SELECT source, count(*)::BIGINT AS n_docs FROM p
                GROUP BY 1),
         c AS (SELECT source, prefix, count(*)::BIGINT AS n_prefix
               FROM p GROUP BY 1, 2),
         r AS (SELECT c.*, CAST(row_number() OVER (PARTITION BY source
                 ORDER BY n_prefix DESC, prefix ASC) AS INTEGER)
                 AS rank
               FROM c)
         SELECT r.source, r.rank, r.prefix, r.n_prefix,
           (((2*(r.n_prefix) * 1000000 + (tt.n_docs)) // (2*(tt.n_docs)))::BIGINT) AS share_ppm
         FROM r JOIN tt USING (source) WHERE r.rank <= 3""",
    // q365: the recursive closure's cluster sizes, removable = size-1,
    // rank desc, 4-point k lattice.
    "q365_dup_concentration" ->
      s"""WITH RECURSIVE $canonicalChainCtes,
         cl AS (SELECT cluster_id,
                  max(cluster_size)::BIGINT - 1 AS removable
                FROM surv GROUP BY 1
                HAVING max(cluster_size) >= 2),
         rk AS (SELECT cluster_id, removable,
                  row_number() OVER (ORDER BY removable DESC,
                    cluster_id ASC)::BIGINT AS rk
                FROM cl),
         tt AS (SELECT count(*)::BIGINT AS n_clusters,
                  sum(removable)::BIGINT AS total_removable
                FROM cl),
         kk AS (SELECT unnest([1, 5, 25, 125]::BIGINT[]) AS k)
         SELECT kk.k, tt.n_clusters,
           count(*)::BIGINT AS clusters_in_topk,
           sum(rk.removable)::BIGINT AS removable_in_topk,
           tt.total_removable,
           (((2*(sum(rk.removable)) * 1000000 + (tt.total_removable)) // (2*(tt.total_removable)))::BIGINT) AS share_ppm
         FROM kk JOIN rk ON rk.rk <= kk.k
         CROSS JOIN tt
         GROUP BY kk.k, tt.n_clusters, tt.total_removable""",
    // q366: distinct (user#hour, type) contexts, context-keyed
    // self-join a < b, exact integer lift.
    "q366_type_lift" ->
      """WITH ctx AS (SELECT DISTINCT
             user_id::VARCHAR || '#' ||
               epoch_us(date_trunc('hour', ts))::VARCHAR AS ctx,
             event_type
           FROM events),
         n AS (SELECT count(DISTINCT ctx)::BIGINT AS n_ctx FROM ctx),
         s AS (SELECT event_type, count(*)::BIGINT AS n_t FROM ctx
               GROUP BY 1),
         p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                 count(*)::BIGINT AS n_ab
               FROM ctx a JOIN ctx b
                 ON a.ctx = b.ctx AND a.event_type < b.event_type
               GROUP BY 1, 2)
         SELECT p.type_a, p.type_b, sa.n_t AS n_a, sb.n_t AS n_b,
           p.n_ab,
           (((2*(p.n_ab * n.n_ctx * 1000) + (sa.n_t * sb.n_t))
             // (2*(sa.n_t * sb.n_t)))::BIGINT) AS lift_milli
         FROM p
         JOIN s sa ON sa.event_type = p.type_a
         JOIN s sb ON sb.event_type = p.type_b
         CROSS JOIN n""",
    // q367: same bucket medians (exact rank pick), pairwise sign sum.
    "q367_length_trend_mk" ->
      """WITH d AS (SELECT doc_id, source, doc_id // 50 AS b,
             (CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+'))
              END)::BIGINT AS n
           FROM documents),
         r AS (SELECT source, b, n, doc_id,
                 row_number() OVER (PARTITION BY source, b
                   ORDER BY n ASC, doc_id ASC) AS rn,
                 count(*) OVER (PARTITION BY source, b) AS cnt
               FROM d),
         med AS (SELECT source, b, n AS med FROM r
                 WHERE rn = ceil(cnt / 2)),
         pr AS (SELECT a.source,
                 CASE WHEN b2.med > a.med THEN 1
                      WHEN b2.med < a.med THEN -1 ELSE 0 END AS sg
               FROM med a JOIN med b2
                 ON a.source = b2.source AND b2.b > a.b),
         nb AS (SELECT source, count(*)::BIGINT AS n_buckets FROM med
                GROUP BY 1)
         SELECT pr.source, nb.n_buckets,
           count(*)::BIGINT AS n_pairs,
           sum(sg)::BIGINT AS s_stat,
           CASE WHEN sum(sg) > 0 THEN 1
                WHEN sum(sg) < 0 THEN -1 ELSE 0 END::BIGINT
             AS direction
         FROM pr JOIN nb USING (source)
         GROUP BY pr.source, nb.n_buckets""",
    // q368: 256 hash cells, exact integer chi-square milli.
    "q368_hash_uniformity" ->
      """WITH c AS (SELECT
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
               % 256 AS bucket,
             count(*)::BIGINT AS o
           FROM documents GROUP BY 1),
         a AS (SELECT count(*)::BIGINT AS buckets_hit,
                 sum(o)::BIGINT AS n_docs,
                 sum(o * o)::BIGINT AS sum_o2
               FROM c)
         SELECT 256::BIGINT AS n_buckets, buckets_hit, n_docs,
           (CASE WHEN (256 * sum_o2 - n_docs * n_docs) < 0
             THEN -(((2*(-((256 * sum_o2 - n_docs * n_docs) * 1000))
               + (n_docs)) // (2*(n_docs)))::BIGINT)
             ELSE (((2*((256 * sum_o2 - n_docs * n_docs) * 1000)
               + (n_docs)) // (2*(n_docs)))::BIGINT) END) AS chi2_milli
         FROM a""",
    // q369: lag-equality runs via prefix-sum run ids.
    "q369_adjacent_dup_runs" ->
      """WITH d AS (SELECT source, doc_id, md5(text) AS h
           FROM documents),
         l AS (SELECT source, doc_id, h,
                 CASE WHEN lag(h) OVER (PARTITION BY source
                   ORDER BY doc_id ASC) = h THEN 1 ELSE 0 END AS same
               FROM d),
         g AS (SELECT source,
                 sum(1 - same) OVER (PARTITION BY source
                   ORDER BY doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS run_id
               FROM l),
         runs AS (SELECT source, run_id, count(*)::BIGINT AS run_len
                  FROM g GROUP BY 1, 2)
         SELECT source,
           sum(run_len - 1)::BIGINT AS adjacent_dup_pairs,
           sum(CASE WHEN run_len >= 2 THEN 1 ELSE 0 END)::BIGINT
             AS runs_ge2,
           max(run_len)::BIGINT AS max_run
         FROM runs GROUP BY 1""",
    // q370: same type-1 rank picks at ceil(p*n/100) per language.
    "q370_quality_bands" ->
      s"""WITH $qMicroCte,
         sc AS (SELECT d.doc_id, d.lang, q2.q_micro
               FROM documents d JOIN qm q2 USING (doc_id)),
         r AS (SELECT lang, q_micro, doc_id,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY q_micro ASC, doc_id ASC) AS rn,
                 count(*) OVER (PARTITION BY lang) AS cnt
               FROM sc)
         SELECT lang, max(cnt)::BIGINT AS n_docs,
           max(CASE WHEN rn = ceil(cnt * 10 / 100) THEN q_micro END)
             ::BIGINT AS p10_micro,
           max(CASE WHEN rn = ceil(cnt * 50 / 100) THEN q_micro END)
             ::BIGINT AS p50_micro,
           max(CASE WHEN rn = ceil(cnt * 90 / 100) THEN q_micro END)
             ::BIGINT AS p90_micro,
           max(CASE WHEN rn = ceil(cnt * 90 / 100) THEN q_micro END)
             ::BIGINT
             - max(CASE WHEN rn = ceil(cnt * 10 / 100) THEN q_micro
                 END)::BIGINT AS spread_micro
         FROM r GROUP BY 1""",
    // q371: exact coincidence-pair numerator per source.
    "q371_simpson_diversity" ->
      """WITH tok AS (SELECT source, unnest(
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+') END)
               AS w
           FROM documents),
         c AS (SELECT source, w, count(*)::BIGINT AS c FROM tok
               GROUP BY 1, 2),
         a AS (SELECT source, sum(c)::BIGINT AS n_tokens,
                 count(*)::BIGINT AS n_types,
                 sum(c * (c - 1))::BIGINT AS coincidence_pairs
               FROM c GROUP BY 1)
         SELECT source, n_tokens, n_types, coincidence_pairs,
           (((2*(coincidence_pairs) * 1000000
             + (n_tokens * (n_tokens - 1)))
             // (2*(n_tokens * (n_tokens - 1))))::BIGINT) AS simpson_ppm
         FROM a""",
    // q372: three anti-join audits, 4 fixed rows.
    "q372_referential_integrity" ->
      """WITH oli AS (SELECT count(*)::BIGINT AS bad FROM lineitem
             WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
         nli AS (SELECT count(*)::BIGINT AS n FROM lineitem),
         cho AS (SELECT count(*)::BIGINT AS bad FROM orders
             WHERE o_orderkey NOT IN
               (SELECT DISTINCT l_orderkey FROM lineitem)),
         nor AS (SELECT count(*)::BIGINT AS n FROM orders),
         olc AS (SELECT count(*)::BIGINT AS bad FROM customer
             WHERE c_custkey NOT IN
               (SELECT DISTINCT o_custkey FROM orders)),
         ncu AS (SELECT count(*)::BIGINT AS n FROM customer),
         dor AS (SELECT count(*)::BIGINT AS bad FROM orders
             WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
         u AS (
           SELECT 'lineitem_orphans' AS check, oli.bad, nli.n
             FROM oli, nli
           UNION ALL SELECT 'childless_orders', cho.bad, nor.n
             FROM cho, nor
           UNION ALL SELECT 'orderless_customers', olc.bad, ncu.n
             FROM olc, ncu
           UNION ALL SELECT 'dangling_orders', dor.bad, nor.n
             FROM dor, nor)
         SELECT u.check, u.bad AS n_bad, u.n AS n_total,
           (((2*(u.bad) * 1000000 + (u.n)) // (2*(u.n)))::BIGINT) AS bad_ppm
         FROM u""",
    // q373: digit from the decimal string of an exact BIGINT; the
    // Benford expectation is the same pinned literal list as
    // Relational.benfordExpectedPpm (no runtime log10 anywhere).
    "q373_benford_digits" ->
      s"""WITH v AS (SELECT CAST(floor(o_totalprice) AS BIGINT) AS b
           FROM orders WHERE floor(o_totalprice) >= 1),
         o AS (SELECT CAST(substr(CAST(b AS VARCHAR), 1, 1) AS BIGINT)
                 AS digit,
                 count(*)::BIGINT AS observed
               FROM v GROUP BY 1),
         g AS (SELECT unnest([1,2,3,4,5,6,7,8,9])::BIGINT AS digit,
                 unnest([301030,176091,124939,96910,79181,
                         66947,57992,51153,45757])::BIGINT
                   AS expected_ppm),
         j AS (SELECT g.digit, coalesce(o.observed, 0)::BIGINT
                 AS observed, g.expected_ppm
               FROM g LEFT JOIN o USING (digit)),
         t AS (SELECT sum(observed)::BIGINT AS n FROM j)
         SELECT j.digit, j.observed, t.n AS n_values,
           ${sqlMicroRatio("j.observed", "greatest(t.n, 1)")}
             AS observed_ppm,
           j.expected_ppm,
           ${sqlMicroRatio("j.observed", "greatest(t.n, 1)")}
             - j.expected_ppm AS dev_ppm
         FROM j, t""",
    // q374: the same bottom-64-by-(md5,doc_id) sample and exact pair
    // counts; tau's numerator is pure integer, tau-b lives in the
    // spec (it needs a sqrt).
    "q374_kendall_tau" ->
      s"""WITH $qMicroCte,
         s AS (SELECT d.source, d.doc_id, d.n_chars AS x,
                 q2.q_micro AS y,
                 row_number() OVER (PARTITION BY d.source
                   ORDER BY md5(d.text) ASC, d.doc_id ASC) AS rn
               FROM documents d JOIN qm q2 USING (doc_id)),
         k AS (SELECT source, doc_id, x, y FROM s WHERE rn <= 64),
         p AS (SELECT a.source, a.x - b.x AS dx, a.y - b.y AS dy
               FROM k a JOIN k b
                 ON a.source = b.source AND a.doc_id < b.doc_id),
         agg AS (SELECT source, count(*)::BIGINT AS n_pairs,
                  sum(CASE WHEN dx <> 0 AND dy <> 0
                        AND ((dx > 0) = (dy > 0))
                      THEN 1 ELSE 0 END)::BIGINT AS concordant,
                  sum(CASE WHEN dx <> 0 AND dy <> 0
                        AND ((dx > 0) <> (dy > 0))
                      THEN 1 ELSE 0 END)::BIGINT AS discordant,
                  sum(CASE WHEN dx = 0 AND dy <> 0
                      THEN 1 ELSE 0 END)::BIGINT AS ties_x,
                  sum(CASE WHEN dx <> 0 AND dy = 0
                      THEN 1 ELSE 0 END)::BIGINT AS ties_y,
                  sum(CASE WHEN dx = 0 AND dy = 0
                      THEN 1 ELSE 0 END)::BIGINT AS ties_xy
                 FROM p GROUP BY 1),
         ns AS (SELECT source, count(*)::BIGINT AS n_sampled
                FROM k GROUP BY 1)
         SELECT agg.source, ns.n_sampled, agg.n_pairs,
           agg.concordant, agg.discordant,
           agg.ties_x, agg.ties_y, agg.ties_xy,
           agg.concordant - agg.discordant AS tau_num
         FROM agg JOIN ns USING (source)""",
    // q375: exact type-1 median pick, docs AT the median excluded,
    // runs via lag + prefix-sum run ids (the q369 idiom).
    "q375_quality_runs" ->
      s"""WITH $qMicroCte,
         sc AS (SELECT d.doc_id, d.source, q2.q_micro
               FROM documents d JOIN qm q2 USING (doc_id)),
         r AS (SELECT source, q_micro, doc_id,
                 row_number() OVER (PARTITION BY source
                   ORDER BY q_micro ASC, doc_id ASC) AS rn,
                 count(*) OVER (PARTITION BY source) AS cnt
               FROM sc),
         m AS (SELECT source, q_micro AS med_micro FROM r
               WHERE rn = ceil(cnt * 50 / 100)),
         sgn AS (SELECT sc.source, sc.doc_id,
                  CASE WHEN sc.q_micro > m.med_micro
                    THEN 1 ELSE 0 END AS above
                FROM sc JOIN m USING (source)
                WHERE sc.q_micro <> m.med_micro),
         l AS (SELECT source, doc_id, above,
                 CASE WHEN lag(above) OVER (PARTITION BY source
                   ORDER BY doc_id ASC) = above THEN 0 ELSE 1 END
                   AS brk
               FROM sgn),
         g AS (SELECT source, above,
                 sum(brk) OVER (PARTITION BY source
                   ORDER BY doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS run_id
               FROM l),
         runs AS (SELECT source, run_id, count(*)::BIGINT AS run_len,
                    max(above) AS above
                  FROM g GROUP BY 1, 2)
         SELECT source,
           sum(CASE WHEN above = 1 THEN run_len ELSE 0 END)::BIGINT
             AS n_above,
           sum(CASE WHEN above = 0 THEN run_len ELSE 0 END)::BIGINT
             AS n_below,
           count(*)::BIGINT AS n_runs,
           max(run_len)::BIGINT AS longest_run
         FROM runs GROUP BY 1""",
    // q376: marginals as window sums over the bounded cell frame;
    // expected milli and the cell chi2 micro are exact half-up
    // integer divisions of pure-integer numerators.
    "q376_lang_source_contingency" ->
      s"""WITH c AS (SELECT lang, source, count(*)::BIGINT AS observed
           FROM documents GROUP BY 1, 2),
         m AS (SELECT lang, source, observed,
                 sum(observed) OVER (PARTITION BY lang)::BIGINT
                   AS row_total,
                 sum(observed) OVER (PARTITION BY source)::BIGINT
                   AS col_total,
                 sum(observed) OVER ()::BIGINT AS n_docs
               FROM c)
         SELECT lang, source, observed, row_total, col_total, n_docs,
           ${sqlIdivHalfUp("row_total * col_total * 1000", "n_docs")}
             AS expected_milli,
           ${sqlIdivHalfUp(
        "(n_docs * observed - row_total * col_total)" +
          " * (n_docs * observed - row_total * col_total) * 1000000",
        "n_docs * row_total * col_total")} AS cell_chi2_micro
         FROM m""",
    // q377: (source, type) counts -> per-type carrying-source count
    // -> per-source exclusive type/token rollup, exact ppm.
    "q377_vocab_specificity" ->
      s"""WITH tok AS (SELECT source, unnest(
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END)
               AS w
           FROM documents),
         c AS (SELECT source, w, count(*)::BIGINT AS c FROM tok
               GROUP BY 1, 2),
         sp AS (SELECT w, count(*)::BIGINT AS n_sources FROM c
                GROUP BY 1),
         a AS (SELECT c.source,
                 count(*)::BIGINT AS n_types,
                 sum(c.c)::BIGINT AS n_tokens,
                 sum(CASE WHEN sp.n_sources = 1 THEN 1 ELSE 0 END)
                   ::BIGINT AS excl_types,
                 sum(CASE WHEN sp.n_sources = 1 THEN c.c ELSE 0 END)
                   ::BIGINT AS excl_tokens
               FROM c JOIN sp USING (w) GROUP BY 1)
         SELECT source, n_types, n_tokens, excl_types, excl_tokens,
           ${sqlMicroRatio("excl_types", "n_types")} AS excl_type_ppm,
           ${sqlMicroRatio("excl_tokens", "n_tokens")}
             AS excl_token_ppm
         FROM a""",
    // q378: the same exact integer day offsets (epoch micros div
    // 86400e6) and cumulative at-risk over the bounded day lattice.
    "q378_purchase_survival" ->
      """WITH e AS (SELECT user_id, event_type,
                 epoch_us(ts)::BIGINT AS us FROM events),
         f AS (SELECT user_id, min(us)::BIGINT AS us0 FROM e
               GROUP BY 1),
         p AS (SELECT user_id, min(us)::BIGINT AS usp FROM e
               WHERE event_type = 'purchase' GROUP BY 1),
         h AS (SELECT max(us)::BIGINT AS us_max FROM e),
         u AS (SELECT (coalesce(p.usp, h.us_max) - f.us0)
                   // 86400000000 AS day,
                 CASE WHEN p.usp IS NOT NULL THEN 1 ELSE 0 END
                   AS converted
               FROM f LEFT JOIN p USING (user_id) CROSS JOIN h),
         d AS (SELECT day, sum(converted)::BIGINT AS n_events,
                 sum(1 - converted)::BIGINT AS n_censored,
                 count(*)::BIGINT AS n_ending
               FROM u GROUP BY 1),
         w AS (SELECT day, n_events, n_censored, n_ending,
                 sum(n_ending) OVER ()::BIGINT AS n_total,
                 sum(n_ending) OVER (ORDER BY day ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   ::BIGINT AS ended_through
               FROM d)
         SELECT day, n_total - ended_through + n_ending AS n_at_risk,
           n_events, n_censored
         FROM w""",
    // q379: the q73 contamination CTE (5-gram shingles — NOT the
    // 3-gram pair CTE) + the q207 pair threshold; the neighbor set
    // excludes eval docs and the contaminated set.
    "q379_blast_radius" ->
      s"""WITH $shinglesCte,
         d5 AS (SELECT doc_id,
             list_distinct(list_transform(range(len(toks) - 4),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                 || ' ' || toks[i+4] || ' ' || toks[i+5])) AS sh
           FROM (SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\\s+')
                   END AS toks
                 FROM documents) t
           WHERE len(toks) >= 5),
         e5 AS (SELECT doc_id, unnest(sh) AS s FROM d5
                WHERE len(sh) > 0),
         e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
               WHERE len(sh) > 0),
         cont AS (SELECT DISTINCT a.doc_id FROM e5 a JOIN e5 b
                 ON a.s = b.s
               WHERE a.doc_id % 50 <> 0 AND b.doc_id % 50 = 0),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS inter,
                 any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
               FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
         pr AS (SELECT doc_a, doc_b FROM p
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                  >= 0.5),
         nb AS (SELECT DISTINCT nbr AS doc_id FROM (
                 SELECT doc_b AS nbr FROM pr
                 WHERE doc_a IN (SELECT doc_id FROM cont)
                 UNION ALL
                 SELECT doc_a AS nbr FROM pr
                 WHERE doc_b IN (SELECT doc_id FROM cont)) x
                WHERE nbr % 50 <> 0
                  AND nbr NOT IN (SELECT doc_id FROM cont)),
         cls AS (SELECT dd.doc_id, dd.source, dd.n_chars,
                  CASE WHEN dd.doc_id IN (SELECT doc_id FROM cont)
                    THEN 1 ELSE 0 END AS direct,
                  CASE WHEN dd.doc_id IN (SELECT doc_id FROM nb)
                    THEN 1 ELSE 0 END AS collateral
                 FROM documents dd WHERE dd.doc_id % 50 <> 0),
         a AS (SELECT source, count(*)::BIGINT AS n_train_docs,
                 sum(direct)::BIGINT AS n_direct,
                 sum(collateral)::BIGINT AS n_collateral,
                 sum(direct * n_chars)::BIGINT AS direct_chars,
                 sum(collateral * n_chars)::BIGINT AS collateral_chars
               FROM cls GROUP BY 1)
         SELECT source, n_train_docs, n_direct, n_collateral,
           direct_chars, collateral_chars,
           ${sqlMicroRatio("n_direct + n_collateral", "n_train_docs")}
             AS quarantine_ppm
         FROM a""",
    // q380: plain SQL ntile(10) — Ranking.ntileFromRank matches it
    // bit-for-bit (spec-pinned) without the single-partition window;
    // the dup flag is J >= 0.5 pair membership (the q207 threshold).
    "q380_dup_by_length" ->
      s"""WITH $shinglesCte,
         e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
               WHERE len(sh) > 0),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS inter,
                 any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
               FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
         pr AS (SELECT doc_a, doc_b FROM p
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                  >= 0.5),
         du AS (SELECT DISTINCT doc_id FROM (
                 SELECT doc_a AS doc_id FROM pr
                 UNION ALL SELECT doc_b FROM pr) x),
         f AS (SELECT dd.doc_id, dd.n_chars,
                 CASE WHEN dd.doc_id IN (SELECT doc_id FROM du)
                   THEN 1 ELSE 0 END AS is_dup
               FROM documents dd),
         r AS (SELECT doc_id, n_chars, is_dup,
                 ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
               FROM f),
         a AS (SELECT decile::BIGINT AS decile,
                 count(*)::BIGINT AS n_docs,
                 sum(is_dup)::BIGINT AS n_dup_docs,
                 min(n_chars)::BIGINT AS min_chars,
                 max(n_chars)::BIGINT AS max_chars
               FROM r GROUP BY 1)
         SELECT decile, n_docs, n_dup_docs, min_chars, max_chars,
           ${sqlMicroRatio("n_dup_docs", "n_docs")} AS dup_ppm
         FROM a""",
    // q381: both medians are the same type-1 rank pick; flips are
    // exact integer comparisons of q_micro against the two cuts.
    "q381_threshold_transfer" ->
      s"""WITH $qMicroCte,
         sc AS (SELECT dd.doc_id, dd.lang, q2.q_micro
               FROM documents dd JOIN qm q2 USING (doc_id)),
         g AS (SELECT q_micro AS global_med FROM
                (SELECT q_micro,
                   row_number() OVER (ORDER BY q_micro, doc_id) AS rn,
                   count(*) OVER () AS cnt
                 FROM sc) t
               WHERE rn = ceil(cnt * 50 / 100)),
         l AS (SELECT lang, q_micro AS lang_med FROM
                (SELECT lang, q_micro, doc_id,
                   row_number() OVER (PARTITION BY lang
                     ORDER BY q_micro, doc_id) AS lrn,
                   count(*) OVER (PARTITION BY lang) AS lcnt
                 FROM sc) t
               WHERE lrn = ceil(lcnt * 50 / 100)),
         a AS (SELECT sc.lang, count(*)::BIGINT AS n_docs,
                 max(l.lang_med)::BIGINT AS lang_med,
                 max(g.global_med)::BIGINT AS global_med,
                 sum(CASE WHEN sc.q_micro > g.global_med
                   THEN 1 ELSE 0 END)::BIGINT AS admit_global,
                 sum(CASE WHEN sc.q_micro > l.lang_med
                   THEN 1 ELSE 0 END)::BIGINT AS admit_lang,
                 sum(CASE WHEN sc.q_micro > l.lang_med
                       AND sc.q_micro <= g.global_med
                   THEN 1 ELSE 0 END)::BIGINT AS flips_in,
                 sum(CASE WHEN sc.q_micro <= l.lang_med
                       AND sc.q_micro > g.global_med
                   THEN 1 ELSE 0 END)::BIGINT AS flips_out
               FROM sc JOIN l USING (lang) CROSS JOIN g
               GROUP BY 1)
         SELECT lang, n_docs, lang_med, global_med,
           admit_global, admit_lang, flips_in, flips_out,
           ${sqlMicroRatio("flips_in + flips_out", "n_docs")}
             AS flip_ppm
         FROM a""",
    // q382: the q232 hash-shard spelling + plain row_number for the
    // block-cyclic policy; the same two-step even-share gauge.
    "q382_shard_policy" ->
      s"""WITH base AS (
           SELECT doc_id,
             CAST(len(CASE WHEN length(trim(text)) = 0
                  THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END)
               AS BIGINT) AS t
           FROM documents),
         h AS (SELECT 'hash' AS policy,
                 CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))
                   ::BIGINT % 8 AS BIGINT) AS shard, t
               FROM base),
         c AS (SELECT 'block_cyclic' AS policy,
                 CAST((row_number() OVER (ORDER BY doc_id ASC) - 1)
                   % 8 AS BIGINT) AS shard, t
               FROM base),
         u AS (SELECT * FROM h UNION ALL SELECT * FROM c),
         s AS (SELECT policy, shard, count(*)::BIGINT AS n_docs,
                 sum(t)::BIGINT AS n_tokens
               FROM u GROUP BY 1, 2),
         g AS (SELECT policy, sum(n_tokens)::BIGINT AS g_tokens
               FROM s GROUP BY 1)
         SELECT s.policy, s.shard, s.n_docs, s.n_tokens,
           ${sqlMicroRatio(
        "s.n_tokens",
        sqlIdivHalfUp("g.g_tokens", "8"))} AS vs_even_ppm
         FROM s JOIN g USING (policy)""",
    // q383: per-doc-distinct 8-grams (the q73 shingle convention,
    // width 8) -> (source, gram) counts -> per-source rollup.
    "q383_template_ngrams" ->
      s"""WITH d8 AS (SELECT source, doc_id,
             list_distinct(list_transform(range(len(toks) - 7),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                 || ' ' || toks[i+4] || ' ' || toks[i+5] || ' '
                 || toks[i+6] || ' ' || toks[i+7] || ' ' || toks[i+8]))
               AS sh
           FROM (SELECT source, doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\\s+')
                   END AS toks
                 FROM documents) t
           WHERE len(toks) >= 8),
         inc AS (SELECT source, doc_id, unnest(sh) AS g FROM d8
                 WHERE len(sh) > 0),
         cnt AS (SELECT source, g, count(*)::BIGINT AS c FROM inc
                 GROUP BY 1, 2),
         a AS (SELECT source,
                 sum(c)::BIGINT AS n_incidences,
                 count(*)::BIGINT AS n_grams,
                 sum(CASE WHEN c >= 2 THEN c ELSE 0 END)::BIGINT
                   AS template_incidences,
                 sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END)::BIGINT
                   AS template_grams
               FROM cnt GROUP BY 1)
         SELECT source, n_incidences, n_grams,
           template_incidences, template_grams,
           ${sqlMicroRatio("template_incidences",
        "greatest(n_incidences, 1)")} AS template_ppm
         FROM a""",
    // q384: the q370 median pick per lang x a 3-value band lattice;
    // the band test is an integer absolute difference.
    "q384_borderline_band" ->
      s"""WITH $qMicroCte,
         sc AS (SELECT dd.doc_id, dd.lang, q2.q_micro
               FROM documents dd JOIN qm q2 USING (doc_id)),
         l AS (SELECT lang, q_micro AS med_micro FROM
                (SELECT lang, q_micro, doc_id,
                   row_number() OVER (PARTITION BY lang
                     ORDER BY q_micro, doc_id) AS lrn,
                   count(*) OVER (PARTITION BY lang) AS lcnt
                 FROM sc) t
               WHERE lrn = ceil(lcnt * 50 / 100)),
         b AS (SELECT unnest([10000, 50000, 100000])::BIGINT
                 AS band_micro),
         a AS (SELECT sc.lang, b.band_micro,
                 max(l.med_micro)::BIGINT AS med_micro,
                 count(*)::BIGINT AS n_docs,
                 sum(CASE WHEN abs(sc.q_micro - l.med_micro)
                       <= b.band_micro
                   THEN 1 ELSE 0 END)::BIGINT AS n_within
               FROM sc JOIN l USING (lang) CROSS JOIN b
               GROUP BY 1, 2)
         SELECT lang, band_micro, med_micro, n_docs, n_within,
           ${sqlMicroRatio("n_within", "n_docs")} AS within_ppm
         FROM a""",
    // q385: the q181 band chain with lag() recency instead of min()
    // — suppressed iff any band's previous occupant is within the
    // TTL (100 arrival ids), the exact batch twin of the TTL state.
    "q385_stream_ttl_dedup" ->
      s"""WITH $shinglesCte,
         m AS (SELECT doc_id,
                 list_transform(range(8), i -> list_min(list_transform(sh,
                   s -> ('0x' || substr(md5(i || ':' || s), 1, 15))::BIGINT)))
                 AS mh
               FROM d WHERE len(sh) > 0),
         bd AS (SELECT doc_id, t.j AS j,
                  mh[t.j*2+1] || '_' || mh[t.j*2+2] AS bval
                FROM m, range(4) t(j)),
         lg AS (SELECT doc_id,
                  lag(doc_id) OVER (PARTITION BY j, bval
                    ORDER BY doc_id ASC) AS prev
                FROM bd),
         sup AS (SELECT doc_id,
                  bool_or(prev IS NOT NULL AND doc_id - prev <= 100)
                    AS s
                 FROM lg GROUP BY 1)
         SELECT d0.doc_id, coalesce(sup.s, false) AS suppressed
         FROM documents d0 LEFT JOIN sup ON d0.doc_id = sup.doc_id""",
    // q386: the shared recursive closure (J >= 0.05) -> per-cluster
    // length spread -> size-band rollup; ppm is exact half-up.
    "q386_cluster_spread_bands" ->
      s"""WITH RECURSIVE $canonicalChainCtes,
         pc AS (SELECT lab.cluster_id,
                  max(sz.cluster_size)::BIGINT AS cs,
                  count(*)::BIGINT AS n_docs,
                  (max(dd.n_chars) - min(dd.n_chars))::BIGINT AS spread
                FROM lab
                JOIN sz USING (cluster_id)
                JOIN documents dd USING (doc_id)
                WHERE sz.cluster_size >= 2
                GROUP BY 1),
         b AS (SELECT CASE WHEN cs = 2 THEN '2_pair'
                           WHEN cs <= 4 THEN '3_4_small'
                           ELSE '5_plus_template' END AS size_band,
                 n_docs, spread
               FROM pc),
         a AS (SELECT size_band, count(*)::BIGINT AS n_clusters,
                 sum(n_docs)::BIGINT AS n_docs,
                 sum(spread)::BIGINT AS sum_spread_chars,
                 max(spread)::BIGINT AS max_spread_chars,
                 sum(CASE WHEN spread = 0 THEN 1 ELSE 0 END)::BIGINT
                   AS n_exact_length
               FROM b GROUP BY 1)
         SELECT size_band, n_clusters, n_docs, sum_spread_chars,
           max_spread_chars, n_exact_length,
           ${sqlMicroRatio("n_exact_length", "n_clusters")}
             AS exact_length_ppm
         FROM a""",
    // q387: the same closure -> per-cluster distinct-source count ->
    // size-band rollup of the multi-source share.
    "q387_cross_source_clusters" ->
      s"""WITH RECURSIVE $canonicalChainCtes,
         pc AS (SELECT lab.cluster_id,
                  max(sz.cluster_size)::BIGINT AS cs,
                  count(DISTINCT dd.source)::BIGINT AS n_sources
                FROM lab
                JOIN sz USING (cluster_id)
                JOIN documents dd USING (doc_id)
                WHERE sz.cluster_size >= 2
                GROUP BY 1),
         b AS (SELECT CASE WHEN cs = 2 THEN '2_pair'
                           WHEN cs <= 4 THEN '3_4_small'
                           ELSE '5_plus_template' END AS size_band,
                 n_sources
               FROM pc),
         a AS (SELECT size_band, count(*)::BIGINT AS n_clusters,
                 sum(CASE WHEN n_sources >= 2 THEN 1 ELSE 0 END)
                   ::BIGINT AS n_multi_source,
                 max(n_sources)::BIGINT AS max_sources
               FROM b GROUP BY 1)
         SELECT size_band, n_clusters, n_multi_source, max_sources,
           ${sqlMicroRatio("n_multi_source", "n_clusters")}
             AS multi_source_ppm
         FROM a""",
    // q388: the q21 pair CTE x a 4-row threshold lattice; the
    // qualification is the same integer cross-multiplication.
    "q388_savings_sweep" ->
      s"""WITH $shinglesCte,
         e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
               WHERE len(sh) > 0),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*)::BIGINT AS inter,
                 any_value(a.n_sh)::BIGINT AS n_a,
                 any_value(b.n_sh)::BIGINT AS n_b
               FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
         th AS (SELECT unnest([300, 500, 700, 900])::BIGINT
                  AS t_milli),
         q AS (SELECT th.t_milli, p.doc_a, p.doc_b
               FROM p CROSS JOIN th
               WHERE p.inter * 1000
                 >= th.t_milli * (p.n_a + p.n_b - p.inter)),
         tok AS (SELECT doc_id,
                  CAST(len(CASE WHEN length(trim(text)) = 0
                       THEN []::VARCHAR[]
                       ELSE regexp_split_to_array(trim(text), '\\s+')
                       END) AS BIGINT) AS tk
                 FROM documents),
         ct AS (SELECT sum(tk)::BIGINT AS corpus_tokens FROM tok),
         np AS (SELECT t_milli, count(*)::BIGINT AS n_pairs FROM q
                GROUP BY 1),
         fd AS (SELECT DISTINCT t_milli, doc_b FROM q),
         fl AS (SELECT fd.t_milli, count(*)::BIGINT AS n_flagged_docs,
                  sum(tok.tk)::BIGINT AS flagged_tokens
                FROM fd JOIN tok ON fd.doc_b = tok.doc_id GROUP BY 1)
         SELECT th.t_milli,
           coalesce(np.n_pairs, 0)::BIGINT AS n_pairs,
           coalesce(fl.n_flagged_docs, 0)::BIGINT AS n_flagged_docs,
           coalesce(fl.flagged_tokens, 0)::BIGINT AS flagged_tokens,
           ct.corpus_tokens,
           ${sqlMicroRatio("coalesce(fl.flagged_tokens, 0)",
        "ct.corpus_tokens")} AS savings_ppm
         FROM th
         LEFT JOIN np USING (t_milli)
         LEFT JOIN fl USING (t_milli), ct""",
    // q389: the q383 8-gram CTE carrying min/max doc_id; spans band
    // on exact integer id differences.
    "q389_template_span" ->
      """WITH d8 AS (SELECT source, doc_id,
             list_distinct(list_transform(range(len(toks) - 7),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                 || ' ' || toks[i+4] || ' ' || toks[i+5] || ' '
                 || toks[i+6] || ' ' || toks[i+7] || ' ' || toks[i+8]))
               AS sh
           FROM (SELECT source, doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\s+')
                   END AS toks
                 FROM documents) t
           WHERE len(toks) >= 8),
         inc AS (SELECT source, doc_id, unnest(sh) AS g FROM d8
                 WHERE len(sh) > 0),
         pg AS (SELECT source, g, count(*)::BIGINT AS c,
                  (max(doc_id) - min(doc_id))::BIGINT AS span
                FROM inc GROUP BY 1, 2
                HAVING count(*) >= 2),
         b AS (SELECT source,
                 CASE WHEN span < 100 THEN 'tight_burst'
                      WHEN span < 1000 THEN 'medium'
                      ELSE 'perennial' END AS span_band,
                 c, span
               FROM pg)
         SELECT source, span_band, count(*)::BIGINT AS n_grams,
           sum(c)::BIGINT AS n_incidences,
           min(span)::BIGINT AS min_span,
           max(span)::BIGINT AS max_span
         FROM b GROUP BY 1, 2""",
    // q390: exact day offsets from the corpus min; a day x type
    // lattice so absent types score share 0; shares are half-up ppm.
    "q390_share_stability" ->
      s"""WITH e AS (SELECT event_type, epoch_us(ts)::BIGINT AS us
           FROM events),
         o AS (SELECT min(us)::BIGINT AS us0 FROM e),
         bd AS (SELECT (e.us - o.us0) // 86400000000 AS day,
                  e.event_type, count(*)::BIGINT AS n
                FROM e, o GROUP BY 1, 2),
         days AS (SELECT DISTINCT day FROM bd),
         types AS (SELECT DISTINCT event_type FROM bd),
         lat AS (SELECT days.day, types.event_type
                 FROM days CROSS JOIN types),
         dt AS (SELECT day, sum(n)::BIGINT AS day_total FROM bd
                GROUP BY 1),
         sh AS (SELECT lat.event_type,
                  ${sqlMicroRatio("coalesce(bd.n, 0)", "dt.day_total")}
                    AS share_ppm
                FROM lat
                LEFT JOIN bd USING (day, event_type)
                JOIN dt USING (day))
         SELECT event_type, count(*)::BIGINT AS n_days,
           min(share_ppm)::BIGINT AS min_share_ppm,
           max(share_ppm)::BIGINT AS max_share_ppm,
           (max(share_ppm) - min(share_ppm))::BIGINT AS swing_ppm
         FROM sh GROUP BY 1""",
    // q391: the shared closure's pr CTE carries inter/n_a/n_b, so
    // edge milli-Jaccard is the exact cross-multiplication; band on
    // the edge's cluster via doc_a.
    "q391_cluster_tightness" ->
      s"""WITH RECURSIVE $canonicalChainCtes,
         edges AS (SELECT doc_a,
                  ${sqlIdivHalfUp("inter * 1000",
        "n_a + n_b - inter")} AS jacc_milli
                FROM pr
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                  >= 0.05),
         j AS (SELECT CASE WHEN sz.cluster_size = 2 THEN '2_pair'
                           WHEN sz.cluster_size <= 4 THEN '3_4_small'
                           ELSE '5_plus_template' END AS size_band,
                 eg.jacc_milli
               FROM edges eg
               JOIN lab ON eg.doc_a = lab.doc_id
               JOIN sz USING (cluster_id)),
         a AS (SELECT size_band, count(*)::BIGINT AS n_edges,
                 min(jacc_milli)::BIGINT AS min_jacc_milli,
                 max(jacc_milli)::BIGINT AS max_jacc_milli,
                 sum(jacc_milli)::BIGINT AS sum_jacc_milli
               FROM j GROUP BY 1)
         SELECT size_band, n_edges, min_jacc_milli, max_jacc_milli,
           ${sqlIdivHalfUp("sum_jacc_milli", "n_edges")}
             AS mean_jacc_milli
         FROM a""",
    // q392: one lag window per source; gap stats are exact integer
    // id differences, ratios are half-up milli.
    "q392_source_spacing" ->
      s"""WITH g AS (SELECT source, doc_id,
                 doc_id - lag(doc_id) OVER (PARTITION BY source
                   ORDER BY doc_id ASC) AS gap
               FROM documents),
         a AS (SELECT source, count(*)::BIGINT AS n_docs,
                 min(doc_id)::BIGINT AS first_id,
                 max(doc_id)::BIGINT AS last_id,
                 max(gap)::BIGINT AS max_gap,
                 min(gap)::BIGINT AS min_gap
               FROM g GROUP BY 1
               HAVING count(*) >= 2)
         SELECT source, n_docs, first_id, last_id, max_gap, min_gap,
           ${sqlIdivHalfUp("(last_id - first_id) * 1000",
        "n_docs - 1")} AS mean_gap_milli,
           ${sqlIdivHalfUp("max_gap * (n_docs - 1) * 1000",
        "last_id - first_id")} AS max_vs_mean_milli
         FROM a""",
    // q393: the q380 dup membership + the q370 rank-pick idiom
    // partitioned by class.
    "q393_dup_quality" ->
      s"""WITH $qMicroCte,
         $shinglesCte,
         e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
               WHERE len(sh) > 0),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS inter,
                 any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
               FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
         pr AS (SELECT doc_a, doc_b FROM p
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                  >= 0.5),
         du AS (SELECT DISTINCT doc_id FROM (
                 SELECT doc_a AS doc_id FROM pr
                 UNION ALL SELECT doc_b FROM pr) x),
         cl AS (SELECT dd.doc_id,
                  CASE WHEN dd.doc_id IN (SELECT doc_id FROM du)
                    THEN 'dup_member' ELSE 'clean' END AS class,
                  q2.q_micro
                FROM documents dd JOIN qm q2 USING (doc_id)),
         r AS (SELECT class, q_micro, doc_id,
                 row_number() OVER (PARTITION BY class
                   ORDER BY q_micro ASC, doc_id ASC) AS lrn,
                 count(*) OVER (PARTITION BY class) AS cnt
               FROM cl)
         SELECT class, max(cnt)::BIGINT AS n_docs,
           max(CASE WHEN lrn = ceil(cnt * 10 / 100) THEN q_micro END)
             ::BIGINT AS p10_micro,
           max(CASE WHEN lrn = ceil(cnt * 50 / 100) THEN q_micro END)
             ::BIGINT AS p50_micro,
           max(CASE WHEN lrn = ceil(cnt * 90 / 100) THEN q_micro END)
             ::BIGINT AS p90_micro,
           max(CASE WHEN lrn = ceil(cnt * 90 / 100) THEN q_micro END)
             ::BIGINT
             - max(CASE WHEN lrn = ceil(cnt * 10 / 100) THEN q_micro
                 END)::BIGINT AS spread_micro
         FROM r GROUP BY 1""",
    // q394: the q191/q362 md5 order cut into 32-doc batches; batch
    // means are exact half-up integers, envelope picks type-1 ranks.
    "q394_batch_dispersion" ->
      s"""WITH $qMicroCte,
         dd AS (SELECT doc_id, md5(doc_id::VARCHAR) AS h
               FROM documents),
         o AS (SELECT dd.doc_id, q2.q_micro,
                 row_number() OVER (ORDER BY dd.h, dd.doc_id) AS pos
               FROM dd JOIN qm q2 USING (doc_id)),
         m AS (SELECT (pos - 1) // 32 AS batch,
                 count(*)::BIGINT AS n, sum(q_micro)::BIGINT AS s
               FROM o GROUP BY 1),
         mm AS (SELECT batch, ${sqlIdivHalfUp("s", "n")} AS mean_micro
                FROM m),
         r AS (SELECT batch, mean_micro,
                 row_number() OVER (ORDER BY mean_micro, batch) AS rn,
                 count(*) OVER () AS cnt
               FROM mm)
         SELECT max(cnt)::BIGINT AS n_batches,
           min(mean_micro)::BIGINT AS min_mean_micro,
           max(CASE WHEN rn = ceil(cnt * 10 / 100) THEN mean_micro
             END)::BIGINT AS p10_mean_micro,
           max(CASE WHEN rn = ceil(cnt * 50 / 100) THEN mean_micro
             END)::BIGINT AS p50_mean_micro,
           max(CASE WHEN rn = ceil(cnt * 90 / 100) THEN mean_micro
             END)::BIGINT AS p90_mean_micro,
           max(mean_micro)::BIGINT AS max_mean_micro,
           max(CASE WHEN rn = ceil(cnt * 90 / 100) THEN mean_micro
             END)::BIGINT
             - max(CASE WHEN rn = ceil(cnt * 10 / 100) THEN mean_micro
               END)::BIGINT AS envelope_micro
         FROM r""",
    // q395: the q21 pair CTE with the artifact's float admission and
    // integer milli emission; provenance via two source lookups.
    "q395_edge_provenance" ->
      s"""WITH $shinglesCte,
         e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
               WHERE len(sh) > 0),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*)::BIGINT AS inter,
                 any_value(a.n_sh)::BIGINT AS n_a,
                 any_value(b.n_sh)::BIGINT AS n_b
               FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
         pe AS (SELECT doc_a, doc_b,
                  ${sqlIdivHalfUp("inter * 1000",
        "n_a + n_b - inter")} AS jacc_milli
                FROM p
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                  >= 0.05),
         j AS (SELECT CASE WHEN da.source = db.source
                    THEN 'within_source' ELSE 'cross_source' END
                   AS provenance,
                 pe.jacc_milli
               FROM pe
               JOIN documents da ON pe.doc_a = da.doc_id
               JOIN documents db ON pe.doc_b = db.doc_id),
         a AS (SELECT provenance, count(*)::BIGINT AS n_edges,
                 min(jacc_milli)::BIGINT AS min_jacc_milli,
                 max(jacc_milli)::BIGINT AS max_jacc_milli,
                 sum(jacc_milli)::BIGINT AS sum_milli
               FROM j GROUP BY 1)
         SELECT provenance, n_edges, min_jacc_milli, max_jacc_milli,
           ${sqlIdivHalfUp("sum_milli", "n_edges")} AS mean_jacc_milli
         FROM a""",
    // q396: floor-division day offsets (delays CAN be negative in
    // this generator — DuckDB // floors, so the engine floors too).
    "q396_ship_latency" ->
      """WITH fs AS (SELECT l_orderkey,
                 min(epoch_us(l_shipdate))::BIGINT AS first_ship
               FROM lineitem GROUP BY 1),
         dl AS (SELECT o.o_orderpriority, o.o_orderkey,
                  (fs.first_ship - epoch_us(o.o_orderdate)::BIGINT)
                    // 86400000000 AS delay_days
                FROM orders o
                JOIN fs ON o.o_orderkey = fs.l_orderkey),
         r AS (SELECT o_orderpriority, delay_days, o_orderkey,
                 row_number() OVER (PARTITION BY o_orderpriority
                   ORDER BY delay_days, o_orderkey) AS rn,
                 count(*) OVER (PARTITION BY o_orderpriority) AS cnt
               FROM dl)
         SELECT o_orderpriority, max(cnt)::BIGINT AS n_orders,
           min(delay_days)::BIGINT AS min_delay_days,
           max(CASE WHEN rn = ceil(cnt * 50 / 100) THEN delay_days
             END)::BIGINT AS p50_delay_days,
           max(delay_days)::BIGINT AS max_delay_days
         FROM r GROUP BY 1""",
    // q397: the proven q25 assignment CTE; census is pure integers.
    "q397_ivf_balance" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS c_vec
                FROM embeddings WHERE vec_id < 8),
         sims AS (SELECT e.vec_id, c.cid,
                    ${cosSql("c_vec", "embedding")} AS csim
                  FROM embeddings e, c),
         asg AS (SELECT vec_id, cid
                 FROM (SELECT vec_id, cid,
                         row_number() OVER (PARTITION BY vec_id
                           ORDER BY csim DESC, cid ASC) AS rk
                       FROM sims) t WHERE rk = 1),
         cells AS (SELECT cid, count(*)::BIGINT AS n_vecs FROM asg
                   GROUP BY 1),
         tot AS (SELECT sum(n_vecs)::BIGINT AS n_total,
                   count(*)::BIGINT AS n_cells_used
                 FROM cells)
         SELECT cells.cid, cells.n_vecs, tot.n_total,
           tot.n_cells_used,
           ${sqlMicroRatio("cells.n_vecs", "tot.n_total")}
             AS share_ppm,
           ${sqlMicroRatio("cells.n_vecs",
        sqlIdivHalfUp("tot.n_total", "8"))} AS vs_even_ppm
         FROM cells, tot""",
    // q398: exact distinct-supplier counts per part, 3-band rollup.
    "q398_part_sourcing" ->
      s"""WITH pp AS (SELECT l_partkey,
                 count(DISTINCT l_suppkey)::BIGINT AS ns,
                 count(*)::BIGINT AS nl
               FROM lineitem GROUP BY 1),
         b AS (SELECT CASE WHEN ns = 1 THEN '1_single'
                           WHEN ns <= 3 THEN '2_3_dual'
                           ELSE '4_plus_multi' END AS supplier_band,
                 nl
               FROM pp),
         a AS (SELECT supplier_band, count(*)::BIGINT AS n_parts,
                 sum(nl)::BIGINT AS n_lines
               FROM b GROUP BY 1),
         t AS (SELECT sum(n_parts)::BIGINT AS total_parts FROM a)
         SELECT a.supplier_band, a.n_parts, a.n_lines,
           ${sqlMicroRatio("a.n_parts", "t.total_parts")} AS part_ppm
         FROM a, t""",
    // q399: per-order line counts with 0-line orphans kept via the
    // left join, fixed-band rollup.
    "q399_order_fanout" ->
      s"""WITH po AS (SELECT l_orderkey, count(*)::BIGINT AS nl
               FROM lineitem GROUP BY 1),
         j AS (SELECT o.o_orderkey, coalesce(po.nl, 0)::BIGINT AS nl
               FROM orders o
               LEFT JOIN po ON o.o_orderkey = po.l_orderkey),
         b AS (SELECT CASE WHEN nl = 0 THEN '0_lines'
                           WHEN nl <= 3 THEN '1_3_lines'
                           WHEN nl <= 6 THEN '4_6_lines'
                           ELSE '7_plus_lines' END AS fanout_band,
                 nl
               FROM j),
         a AS (SELECT fanout_band, count(*)::BIGINT AS n_orders,
                 sum(nl)::BIGINT AS n_lines
               FROM b GROUP BY 1),
         t AS (SELECT sum(n_orders)::BIGINT AS total_orders FROM a)
         SELECT a.fanout_band, a.n_orders, a.n_lines,
           ${sqlMicroRatio("a.n_orders", "t.total_orders")}
             AS order_ppm
         FROM a, t""",
    // q400: the q379 contamination chain + the q381 per-lang median
    // (over the TRAIN population) -> per-source retention ledger.
    "q400_round9_manifest" ->
      s"""WITH $qMicroCte,
         $shinglesCte,
         d5 AS (SELECT doc_id,
             list_distinct(list_transform(range(len(toks) - 4),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                 || ' ' || toks[i+4] || ' ' || toks[i+5])) AS sh
           FROM (SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\\s+')
                   END AS toks
                 FROM documents) t
           WHERE len(toks) >= 5),
         e5 AS (SELECT doc_id, unnest(sh) AS s FROM d5
                WHERE len(sh) > 0),
         e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
               WHERE len(sh) > 0),
         cont AS (SELECT DISTINCT a.doc_id FROM e5 a JOIN e5 b
                 ON a.s = b.s
               WHERE a.doc_id % 50 <> 0 AND b.doc_id % 50 = 0),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS inter,
                 any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
               FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
         pr AS (SELECT doc_a, doc_b FROM p
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                  >= 0.5),
         nb AS (SELECT DISTINCT nbr AS doc_id FROM (
                 SELECT doc_b AS nbr FROM pr
                 WHERE doc_a IN (SELECT doc_id FROM cont)
                 UNION ALL
                 SELECT doc_a AS nbr FROM pr
                 WHERE doc_b IN (SELECT doc_id FROM cont)) x
                WHERE nbr % 50 <> 0
                  AND nbr NOT IN (SELECT doc_id FROM cont)),
         base AS (SELECT dd.doc_id, dd.source, dd.lang,
                  CAST(len(CASE WHEN length(trim(dd.text)) = 0
                       THEN []::VARCHAR[]
                       ELSE regexp_split_to_array(trim(dd.text),
                         '\\s+') END) AS BIGINT) AS tk
                 FROM documents dd WHERE dd.doc_id % 50 <> 0),
         sc AS (SELECT base.doc_id, base.lang, base.source, base.tk,
                  qm.q_micro
                FROM base JOIN qm USING (doc_id)),
         l AS (SELECT lang, q_micro AS lang_med FROM
                (SELECT lang, q_micro, doc_id,
                   row_number() OVER (PARTITION BY lang
                     ORDER BY q_micro, doc_id) AS lrn,
                   count(*) OVER (PARTITION BY lang) AS lcnt
                 FROM sc) t
               WHERE lrn = ceil(lcnt * 50 / 100)),
         cls AS (SELECT sc.source, sc.tk,
                  CASE WHEN sc.doc_id IN (SELECT doc_id FROM cont)
                        OR sc.doc_id IN (SELECT doc_id FROM nb)
                    THEN 1 ELSE 0 END AS quarantined,
                  CASE WHEN sc.doc_id NOT IN (SELECT doc_id FROM cont)
                        AND sc.doc_id NOT IN (SELECT doc_id FROM nb)
                        AND sc.q_micro > l.lang_med
                    THEN 1 ELSE 0 END AS admitted
                 FROM sc JOIN l USING (lang)),
         a AS (SELECT source, count(*)::BIGINT AS n_train_docs,
                 sum(tk)::BIGINT AS train_tokens,
                 sum(quarantined)::BIGINT AS n_quarantined,
                 sum(admitted)::BIGINT AS n_admitted,
                 sum(admitted * tk)::BIGINT AS admitted_tokens
               FROM cls GROUP BY 1)
         SELECT source, n_train_docs, train_tokens, n_quarantined,
           n_admitted, admitted_tokens,
           ${sqlMicroRatio("n_admitted", "n_train_docs")}
             AS doc_retention_ppm,
           ${sqlMicroRatio("admitted_tokens",
        "greatest(train_tokens, 1)")} AS token_retention_ppm
         FROM a""",
    // q401: pair CTE at 0.5; bucket and gap are integer id math.
    "q401_dup_bursts" ->
      s"""WITH $shinglesCte,
         e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
               WHERE len(sh) > 0),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS inter,
                 any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
               FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
         pr AS (SELECT doc_a, doc_b FROM p
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                  >= 0.5),
         g AS (SELECT doc_b // 100 AS bucket,
                 (doc_b - doc_a)::BIGINT AS gap
               FROM pr),
         a AS (SELECT bucket, count(*)::BIGINT AS n_pairs,
                 sum(CASE WHEN gap <= 100 THEN 1 ELSE 0 END)::BIGINT
                   AS n_close_pairs,
                 max(gap)::BIGINT AS max_gap
               FROM g GROUP BY 1)
         SELECT bucket, n_pairs, n_close_pairs, max_gap,
           ${sqlMicroRatio("n_close_pairs", "n_pairs")} AS close_ppm
         FROM a""",
    // q402: the q16 marker counts replayed per language; the argmax
    // CASE follows the same tie-break order (en, de, fr, es, zh).
    "q402_langid_margin" ->
      s"""WITH tk AS (SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+')
             END AS toks
           FROM documents),
         sc AS (SELECT doc_id,
             len(list_filter(toks, w -> w IN
               ('the','and','of','to','is')))::BIGINT AS s_en,
             len(list_filter(toks, w -> w IN
               ('der','die','das','und','ist')))::BIGINT AS s_de,
             len(list_filter(toks, w -> w IN
               ('le','la','et','les','est')))::BIGINT AS s_fr,
             len(list_filter(toks, w -> w IN
               ('el','la','y','los','es')))::BIGINT AS s_es,
             len(list_filter(toks, w -> w IN
               ('的','是','了','在','我')))::BIGINT AS s_zh
           FROM tk),
         m AS (SELECT doc_id, s_en, s_de, s_fr, s_es, s_zh,
                 list_reverse_sort([s_en, s_de, s_fr, s_es, s_zh])
                   AS so
               FROM sc),
         c AS (SELECT CASE WHEN so[1] <= 0 THEN 'und'
                           WHEN s_en = so[1] THEN 'en'
                           WHEN s_de = so[1] THEN 'de'
                           WHEN s_fr = so[1] THEN 'fr'
                           WHEN s_es = so[1] THEN 'es'
                           ELSE 'zh' END AS detected,
                 (so[1] - so[2])::BIGINT AS mg,
                 so[1]::BIGINT AS best
               FROM m),
         a AS (SELECT detected, count(*)::BIGINT AS n_docs,
                 sum(CASE WHEN mg = 0 OR best <= 0 THEN 1 ELSE 0 END)
                   ::BIGINT AS n_ambiguous,
                 max(mg)::BIGINT AS max_margin,
                 sum(mg)::BIGINT AS sum_margin
               FROM c GROUP BY 1)
         SELECT detected, n_docs, n_ambiguous, max_margin,
           ${sqlIdivHalfUp("sum_margin * 1000", "n_docs")}
             AS mean_margin_milli
         FROM a""",
    // q403: within-order pair self-join on distinct (order, part);
    // deterministic top-20 by (support DESC, part_a, part_b).
    "q403_copurchase" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
           FROM lineitem),
         pp AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                  count(*)::BIGINT AS support
                FROM op a JOIN op b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
                GROUP BY 1, 2)
         SELECT part_a, part_b, support FROM pp
         ORDER BY support DESC, part_a ASC, part_b ASC LIMIT 20""",
    // q404: one flagged-mass subquery per width over the shared tk
    // CTE; totals and ppm exactly as the engine computes them.
    "q404_decon_widths" ->
      s"""WITH tk AS (SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+')
             END AS toks
           FROM documents),
         tt AS (SELECT count(*)::BIGINT AS n_train,
                  sum(len(toks))::BIGINT AS train_tokens
                FROM tk WHERE doc_id % 50 <> 0),
         f3 AS ${sqlDeconWidth(3)},
         f5 AS ${sqlDeconWidth(5)},
         f8 AS ${sqlDeconWidth(8)},
         u AS (SELECT 3::BIGINT AS width, n_flagged, flagged_tokens
                 FROM f3
               UNION ALL SELECT 5::BIGINT, n_flagged, flagged_tokens
                 FROM f5
               UNION ALL SELECT 8::BIGINT, n_flagged, flagged_tokens
                 FROM f8)
         SELECT u.width, u.n_flagged, u.flagged_tokens, tt.n_train,
           ${sqlMicroRatio("u.n_flagged", "tt.n_train")}
             AS flagged_ppm
         FROM u, tt""",
    // q405: the q262 lag chain; predictability is the same exact
    // coincidence ratio as q371, over next-type counts.
    "q405_transition_predictability" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type,
                 epoch_us(ts)::BIGINT AS us FROM events),
         t AS (SELECT user_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY us, event_id) AS prev
               FROM e),
         c AS (SELECT prev AS from_type, event_type AS to_type,
                 count(*)::BIGINT AS c
               FROM t WHERE prev IS NOT NULL GROUP BY 1, 2),
         a AS (SELECT from_type,
                 sum(c)::BIGINT AS n_transitions,
                 count(*)::BIGINT AS n_next_types,
                 sum(c * (c - 1))::BIGINT AS coincidence_pairs
               FROM c GROUP BY 1)
         SELECT from_type, n_transitions, n_next_types,
           coincidence_pairs,
           ${sqlMicroRatio("coincidence_pairs",
        "n_transitions * (n_transitions - 1)")}
             AS predictability_ppm
         FROM a WHERE n_transitions >= 2""",
    // q406: the q403 pair base + per-part supports; conf and lift
    // are exact half-up milli of pure-integer products.
    "q406_association_rules" ->
      s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
           FROM lineitem),
         ps AS (SELECT l_partkey, count(*)::BIGINT AS s FROM op
                GROUP BY 1),
         no AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n_orders
                FROM op),
         pp AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                  count(*)::BIGINT AS support
                FROM op a JOIN op b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
                GROUP BY 1, 2
                HAVING count(*) >= 2),
         j AS (SELECT pp.part_a, pp.part_b, pp.support,
                 sa.s AS s_a, sb.s AS s_b, no.n_orders
               FROM pp
               JOIN ps sa ON pp.part_a = sa.l_partkey
               JOIN ps sb ON pp.part_b = sb.l_partkey
               CROSS JOIN no)
         SELECT part_a, part_b, support, s_a, s_b,
           ${sqlIdivHalfUp("support * 1000", "s_a")} AS conf_ab_milli,
           ${sqlIdivHalfUp("support * 1000", "s_b")} AS conf_ba_milli,
           ${sqlIdivHalfUp("support * n_orders * 1000", "s_a * s_b")}
             AS lift_milli
         FROM j
         ORDER BY lift_milli DESC, part_a ASC, part_b ASC
         LIMIT 20""",
    // q407: one (lang, source) census with eval/train splits and
    // half-up ppm shares of each population.
    "q407_eval_representativeness" ->
      s"""WITH c AS (SELECT lang, source,
                 sum(CASE WHEN doc_id % 50 = 0 THEN 1 ELSE 0 END)
                   ::BIGINT AS n_eval,
                 sum(CASE WHEN doc_id % 50 <> 0 THEN 1 ELSE 0 END)
                   ::BIGINT AS n_train
               FROM documents GROUP BY 1, 2),
         t AS (SELECT sum(n_eval)::BIGINT AS tot_eval,
                 sum(n_train)::BIGINT AS tot_train
               FROM c)
         SELECT c.lang, c.source, c.n_eval, c.n_train,
           ${sqlMicroRatio("c.n_eval", "greatest(t.tot_eval, 1)")}
             AS eval_share_ppm,
           ${sqlMicroRatio("c.n_train", "greatest(t.tot_train, 1)")}
             AS train_share_ppm,
           ${sqlMicroRatio("c.n_eval", "greatest(t.tot_eval, 1)")}
             - ${sqlMicroRatio("c.n_train",
        "greatest(t.tot_train, 1)")} AS gap_ppm
         FROM c, t""",
    // q408: hourly buckets (epoch micros div 3600e6), then the q374
    // integer concordance over hour pairs.
    "q408_load_error_concordance" ->
      """WITH h AS (SELECT epoch_us(ts)::BIGINT // 3600000000 AS hour,
                 count(*)::BIGINT AS volume,
                 sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   ::BIGINT AS errors
               FROM events GROUP BY 1),
         p AS (SELECT a.volume - b.volume AS dv,
                 a.errors - b.errors AS de
               FROM h a JOIN h b ON a.hour < b.hour)
         SELECT count(*)::BIGINT AS n_pairs,
           sum(CASE WHEN dv <> 0 AND de <> 0
                 AND ((dv > 0) = (de > 0))
               THEN 1 ELSE 0 END)::BIGINT AS concordant,
           sum(CASE WHEN dv <> 0 AND de <> 0
                 AND ((dv > 0) <> (de > 0))
               THEN 1 ELSE 0 END)::BIGINT AS discordant,
           sum(CASE WHEN dv = 0 OR de = 0 THEN 1 ELSE 0 END)::BIGINT
             AS ties,
           sum(CASE WHEN dv <> 0 AND de <> 0
                 AND ((dv > 0) = (de > 0))
               THEN 1 ELSE 0 END)::BIGINT
             - sum(CASE WHEN dv <> 0 AND de <> 0
                 AND ((dv > 0) <> (de > 0))
               THEN 1 ELSE 0 END)::BIGINT AS tau_num
         FROM p""",
    // q409: the oracle states the semantic directly — running max of
    // event time over arrival order (the engine's distributed
    // prefix-max computes the identical quantity).
    "q409_late_events" ->
      s"""WITH e AS (SELECT event_id, event_type,
                 epoch_us(ts)::BIGINT AS us FROM events),
         l AS (SELECT event_type,
                 coalesce(max(us) OVER (ORDER BY event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   us) - us AS late_us
               FROM e),
         b AS (SELECT event_type,
                 CASE WHEN late_us <= 0 THEN 'on_time'
                      WHEN late_us <= 60000000 THEN 'lt_1min'
                      WHEN late_us <= 600000000 THEN 'lt_10min'
                      ELSE 'dropped_at_10min' END AS band
               FROM l),
         a AS (SELECT event_type, band, count(*)::BIGINT AS n_events
               FROM b GROUP BY 1, 2)
         SELECT event_type, band, n_events,
           sum(n_events) OVER (PARTITION BY event_type)::BIGINT
             AS type_total,
           ${sqlMicroRatio("n_events",
        "sum(n_events) OVER (PARTITION BY event_type)")} AS band_ppm
         FROM a""",
    // q410: rank picks of RAW doubles — selected, never computed.
    "q410_value_five_point" ->
      """WITH r AS (SELECT event_type, value, event_id,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY value ASC, event_id ASC) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS cnt
               FROM events)
         SELECT event_type, max(cnt)::BIGINT AS n_events,
           min(value) AS min_value,
           max(CASE WHEN rn = ceil(cnt * 25 / 100) THEN value END)
             AS p25_value,
           max(CASE WHEN rn = ceil(cnt * 50 / 100) THEN value END)
             AS p50_value,
           max(CASE WHEN rn = ceil(cnt * 75 / 100) THEN value END)
             AS p75_value,
           max(value) AS max_value
         FROM r GROUP BY 1""",
    // q411: per-customer freq + last order date; non-negative day
    // offsets so plain integer division is floor on both engines.
    "q411_rf_banding" ->
      s"""WITH pc AS (SELECT o_custkey, count(*)::BIGINT AS freq,
                 max(epoch_us(o_orderdate))::BIGINT AS last_ou
               FROM orders GROUP BY 1),
         mx AS (SELECT max(last_ou)::BIGINT AS corpus_max FROM pc),
         b AS (SELECT
                 CASE WHEN freq = 1 THEN 'f1'
                      WHEN freq <= 3 THEN 'f2_3'
                      ELSE 'f4_plus' END AS freq_band,
                 CASE WHEN (mx.corpus_max - pc.last_ou) // 86400000000
                        <= 30 THEN 'r_30d'
                      WHEN (mx.corpus_max - pc.last_ou) // 86400000000
                        <= 90 THEN 'r_90d'
                      ELSE 'r_older' END AS recency_band
               FROM pc, mx),
         a AS (SELECT freq_band, recency_band,
                 count(*)::BIGINT AS n_customers
               FROM b GROUP BY 1, 2),
         t AS (SELECT sum(n_customers)::BIGINT AS total FROM a)
         SELECT a.freq_band, a.recency_band, a.n_customers,
           ${sqlMicroRatio("a.n_customers", "t.total")} AS share_ppm
         FROM a, t""",
    // q412: threshold lattice x the q29 prefix-sum session chain.
    "q412_session_gap_sweep" ->
      s"""WITH g AS (SELECT unnest([5, 30, 120])::BIGINT
                 AS gap_minutes),
         e AS (SELECT g.gap_minutes, ev.event_id, ev.user_id,
                 epoch_us(ev.ts)::BIGINT AS us
               FROM events ev CROSS JOIN g),
         l AS (SELECT gap_minutes, user_id, us, event_id,
                 lag(us) OVER (PARTITION BY gap_minutes, user_id
                   ORDER BY us, event_id) AS prev_us
               FROM e),
         n AS (SELECT gap_minutes, user_id,
                 CASE WHEN prev_us IS NULL
                       OR us - prev_us > gap_minutes * 60 * 1000000
                   THEN 1 ELSE 0 END AS is_new, us, event_id
               FROM l),
         s AS (SELECT gap_minutes, user_id,
                 sum(is_new) OVER (PARTITION BY gap_minutes, user_id
                   ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_seq
               FROM n),
         c AS (SELECT gap_minutes, user_id, session_seq,
                 count(*)::BIGINT AS n_ev
               FROM s GROUP BY 1, 2, 3),
         a AS (SELECT gap_minutes, count(*)::BIGINT AS n_sessions,
                 sum(n_ev)::BIGINT AS n_events,
                 max(n_ev)::BIGINT AS max_session_events
               FROM c GROUP BY 1)
         SELECT gap_minutes, n_sessions, n_events, max_session_events,
           ${sqlIdivHalfUp("n_events * 1000", "n_sessions")}
             AS mean_events_milli
         FROM a""",
    // q413: the q235 oracle with list_reverse — common suffix as the
    // reversed prefix; same block/lag/zip machinery.
    "q413_suffix_neighbors" ->
      """WITH d AS (
           SELECT doc_id, t,
             array_to_string(t[1:3], ' ') AS block
           FROM (SELECT doc_id,
                   list_reverse(
                     CASE WHEN length(trim(text)) = 0
                          THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(text),
                            '\s+') END) AS t
                 FROM documents) x
           WHERE len(t) >= 3),
         w AS (SELECT doc_id, t,
                 lag(doc_id) OVER
                   (PARTITION BY block ORDER BY t, doc_id) AS prev_id,
                 lag(t) OVER
                   (PARTITION BY block ORDER BY t, doc_id) AS prev_t
               FROM d),
         p AS (SELECT doc_id, prev_id,
                 coalesce(
                   nullif(list_position(list_transform(list_zip(t, prev_t),
                     z -> z[1] IS NOT DISTINCT FROM z[2]), false), 0) - 1,
                   least(len(t), len(prev_t))) AS lcs
               FROM w WHERE prev_id IS NOT NULL)
         SELECT least(prev_id, doc_id) AS doc_a,
           greatest(prev_id, doc_id) AS doc_b,
           CAST(lcs AS BIGINT) AS lcs
         FROM p WHERE lcs >= 3""",
    // q414: deterministic profile fingerprint via an ordered
    // string_agg over the per-user type counts.
    "q414_behavioral_twins" ->
      s"""WITH tc AS (SELECT user_id, event_type,
                 count(*)::BIGINT AS c
               FROM events GROUP BY 1, 2),
         pr AS (SELECT user_id,
                 string_agg(event_type || ':' || c, ','
                   ORDER BY event_type, c) AS fp
               FROM tc GROUP BY 1),
         gr AS (SELECT fp, count(*)::BIGINT AS group_size FROM pr
                GROUP BY 1),
         t AS (SELECT count(*)::BIGINT AS n_users FROM pr),
         b AS (SELECT CASE WHEN group_size = 1 THEN 'unique'
                           WHEN group_size <= 3 THEN 'twins_2_3'
                           ELSE 'herd_4_plus' END AS band,
                 group_size
               FROM gr),
         a AS (SELECT band, count(*)::BIGINT AS n_groups,
                 sum(group_size)::BIGINT AS n_users_in_band,
                 max(group_size)::BIGINT AS largest_group
               FROM b GROUP BY 1)
         SELECT a.band, a.n_groups, a.n_users_in_band,
           a.largest_group,
           ${sqlMicroRatio("a.n_users_in_band", "t.n_users")}
             AS user_ppm
         FROM a, t""",
    // q415: per-(user, type) min timestamps feed both ordering rules.
    "q415_sequence_violations" ->
      s"""WITH f AS (SELECT user_id, event_type,
                 min(epoch_us(ts))::BIGINT AS first_us
               FROM events GROUP BY 1, 2),
         r1 AS (SELECT 'purchase_before_signup' AS rule,
                  count(*)::BIGINT AS n_users_with_both,
                  sum(CASE WHEN l.first_us < e.first_us
                    THEN 1 ELSE 0 END)::BIGINT AS n_violations
                FROM f e JOIN f l ON e.user_id = l.user_id
                WHERE e.event_type = 'signup'
                  AND l.event_type = 'purchase'),
         r2 AS (SELECT 'click_before_view' AS rule,
                  count(*)::BIGINT AS n_users_with_both,
                  sum(CASE WHEN l.first_us < e.first_us
                    THEN 1 ELSE 0 END)::BIGINT AS n_violations
                FROM f e JOIN f l ON e.user_id = l.user_id
                WHERE e.event_type = 'view'
                  AND l.event_type = 'click'),
         u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
         SELECT rule, n_users_with_both, n_violations,
           ${sqlMicroRatio("n_violations",
        "greatest(n_users_with_both, 1)")} AS violation_ppm
         FROM u""",
    // q416: per-supplier line counts; rank picks over the dimension-
    // sized frame; top share is the exact hot-key gauge.
    "q416_supplier_load" ->
      s"""WITH ps AS (SELECT l_suppkey, count(*)::BIGINT AS nl
               FROM lineitem GROUP BY 1),
         r AS (SELECT nl,
                 row_number() OVER (ORDER BY nl ASC, l_suppkey ASC)
                   AS rn,
                 count(*) OVER () AS cnt,
                 sum(nl) OVER ()::BIGINT AS total_lines
               FROM ps)
         SELECT max(cnt)::BIGINT AS n_suppliers,
           max(total_lines)::BIGINT AS n_lines,
           min(nl)::BIGINT AS min_lines,
           max(CASE WHEN rn = ceil(cnt * 50 / 100) THEN nl END)
             ::BIGINT AS p50_lines,
           max(CASE WHEN rn = ceil(cnt * 90 / 100) THEN nl END)
             ::BIGINT AS p90_lines,
           max(nl)::BIGINT AS max_lines,
           ${sqlMicroRatio("max(nl)", "max(total_lines)")}
             AS top_share_ppm
         FROM r""",
    // q417: the shared closure; surviving edges counted at both the
    // closure (0.05) and dedup (0.5) thresholds — both must be 0.
    "q417_dedup_idempotence" ->
      s"""WITH RECURSIVE $canonicalChainCtes,
         sv AS (SELECT doc_id FROM lab WHERE doc_id = cluster_id),
         c AS (SELECT count(*)::BIGINT AS n_docs FROM lab),
         s AS (SELECT count(*)::BIGINT AS n_survivors FROM sv),
         e05 AS (SELECT count(*)::BIGINT AS surviving_edges_closure
                 FROM pr
                 WHERE round(pr.inter::DOUBLE
                     / (pr.n_a + pr.n_b - pr.inter), 6) >= 0.05
                   AND pr.doc_a IN (SELECT doc_id FROM sv)
                   AND pr.doc_b IN (SELECT doc_id FROM sv)),
         e50 AS (SELECT count(*)::BIGINT AS surviving_edges_dedup
                 FROM pr
                 WHERE round(pr.inter::DOUBLE
                     / (pr.n_a + pr.n_b - pr.inter), 6) >= 0.5
                   AND pr.doc_a IN (SELECT doc_id FROM sv)
                   AND pr.doc_b IN (SELECT doc_id FROM sv))
         SELECT c.n_docs, s.n_survivors,
           e05.surviving_edges_closure, e50.surviving_edges_dedup,
           ${sqlMicroRatio("s.n_survivors", "c.n_docs")}
             AS survivor_ppm
         FROM c, s, e05, e50""",
    // q418: bottom-64 registers per source; union estimate from the
    // re-bottomed merged registers; 63·2^60 scaled in DOUBLE (the
    // q58 spelling — the long product would overflow).
    "q418_kmv_set_algebra" ->
      """WITH t AS (SELECT source, doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+')
             END AS toks
           FROM documents),
         shx AS (SELECT DISTINCT source, s FROM
                (SELECT source, unnest(list_distinct(
                   list_transform(range(len(toks) - 2),
                     i -> toks[i+1] || ' ' || toks[i+2] || ' '
                       || toks[i+3]))) AS s
                 FROM t WHERE len(toks) >= 3) x),
         hx AS (SELECT DISTINCT source,
                  ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
                FROM shx),
         nd AS (SELECT source, count(*)::BIGINT AS nd FROM hx
                GROUP BY 1),
         rk AS (SELECT source, h,
                  row_number() OVER (PARTITION BY source
                    ORDER BY h ASC) AS rk
                FROM hx),
         regs AS (SELECT source, h FROM rk WHERE rk <= 64),
         kth AS (SELECT source, h AS kth FROM rk WHERE rk = 64),
         est AS (SELECT nd.source,
                  CASE WHEN nd.nd < 64 THEN nd.nd::DOUBLE
                       ELSE 63.0 * 1152921504606846976 / kth.kth
                  END AS est
                 FROM nd LEFT JOIN kth USING (source)),
         pairs AS (SELECT a.source AS src_a, a.nd AS nd_a,
                     b.source AS src_b, b.nd AS nd_b
                   FROM nd a JOIN nd b ON a.source < b.source),
         pregs AS (SELECT DISTINCT p.src_a, p.src_b, r.h
                   FROM pairs p JOIN regs r
                     ON r.source = p.src_a OR r.source = p.src_b),
         pu AS (SELECT src_a, src_b, h,
                  row_number() OVER (PARTITION BY src_a, src_b
                    ORDER BY h ASC) AS rk,
                  count(*) OVER (PARTITION BY src_a, src_b) AS ndu
                FROM pregs),
         ue AS (SELECT src_a, src_b,
                  CASE WHEN max(ndu) < 64 THEN max(ndu)::DOUBLE
                       ELSE 63.0 * 1152921504606846976
                         / max(CASE WHEN rk = 64 THEN h END)
                  END AS est_union
                FROM pu GROUP BY 1, 2),
         itx AS (SELECT a.source AS src_a, b.source AS src_b,
                   count(*)::BIGINT AS exact_inter
                 FROM hx a JOIN hx b
                   ON a.h = b.h AND a.source < b.source
                 GROUP BY 1, 2)
         SELECT p.src_a, p.src_b, p.nd_a, p.nd_b,
           coalesce(itx.exact_inter, 0)::BIGINT AS exact_inter,
           (p.nd_a + p.nd_b - coalesce(itx.exact_inter, 0))::BIGINT
             AS exact_union,
           ea.est AS est_a, eb.est AS est_b, ue.est_union,
           ea.est + eb.est - ue.est_union AS est_inter
         FROM pairs p
         JOIN est ea ON p.src_a = ea.source
         JOIN est eb ON p.src_b = eb.source
         JOIN ue USING (src_a, src_b)
         LEFT JOIN itx USING (src_a, src_b)""",
    // q419: the qualityMicro component terms as their own CTE; the
    // bottom-64 sample and Kendall counts exactly as the engine.
    "q419_component_concordance" ->
      s"""WITH cm AS (SELECT doc_id,
                least(n_toks * 5000, 1000000) AS len_m,
                CASE WHEN n_toks = 0 THEN 0
                     ELSE least(${sqlIdivHalfUp("5000000 * n_stop",
        "n_toks")}, 1000000) END AS stop_m,
                1000000 - (CASE WHEN n_chars = 0 THEN 0
                     ELSE least(${sqlIdivHalfUp("10000000 * n_punct",
        "n_chars")}, 1000000) END) AS punct_ok_m
              FROM (SELECT doc_id,
                      len(toks) AS n_toks,
                      len(list_filter(toks, w -> w IN
                        ('the','a','an','and','or','of','to','in',
                         'is','it'))) AS n_stop,
                      length(text)
                        - length(translate(text, '.,!?;:', ''))
                        AS n_punct,
                      length(text) AS n_chars
                    FROM (SELECT doc_id, text,
                            CASE WHEN length(trim(text)) = 0
                                 THEN []::VARCHAR[]
                                 ELSE regexp_split_to_array(
                                        trim(text), '\\s+')
                            END AS toks
                          FROM documents) a) b),
         sp AS (SELECT doc_id FROM documents
                ORDER BY md5(text) ASC, doc_id ASC LIMIT 64),
         k AS (SELECT cm.* FROM cm JOIN sp USING (doc_id)),
         p AS (SELECT a.len_m - b.len_m AS dl,
                 a.stop_m - b.stop_m AS ds,
                 a.punct_ok_m - b.punct_ok_m AS dp
               FROM k a JOIN k b ON a.doc_id < b.doc_id),
         u AS (
           SELECT 'len_vs_stop' AS component_pair,
             count(*)::BIGINT AS n_pairs,
             sum(CASE WHEN dl <> 0 AND ds <> 0
                   AND ((dl > 0) = (ds > 0))
               THEN 1 ELSE 0 END)::BIGINT AS concordant,
             sum(CASE WHEN dl <> 0 AND ds <> 0
                   AND ((dl > 0) <> (ds > 0))
               THEN 1 ELSE 0 END)::BIGINT AS discordant,
             sum(CASE WHEN dl = 0 OR ds = 0 THEN 1 ELSE 0 END)
               ::BIGINT AS ties
           FROM p
           UNION ALL
           SELECT 'len_vs_punct',
             count(*)::BIGINT,
             sum(CASE WHEN dl <> 0 AND dp <> 0
                   AND ((dl > 0) = (dp > 0))
               THEN 1 ELSE 0 END)::BIGINT,
             sum(CASE WHEN dl <> 0 AND dp <> 0
                   AND ((dl > 0) <> (dp > 0))
               THEN 1 ELSE 0 END)::BIGINT,
             sum(CASE WHEN dl = 0 OR dp = 0 THEN 1 ELSE 0 END)::BIGINT
           FROM p
           UNION ALL
           SELECT 'stop_vs_punct',
             count(*)::BIGINT,
             sum(CASE WHEN ds <> 0 AND dp <> 0
                   AND ((ds > 0) = (dp > 0))
               THEN 1 ELSE 0 END)::BIGINT,
             sum(CASE WHEN ds <> 0 AND dp <> 0
                   AND ((ds > 0) <> (dp > 0))
               THEN 1 ELSE 0 END)::BIGINT,
             sum(CASE WHEN ds = 0 OR dp = 0 THEN 1 ELSE 0 END)::BIGINT
           FROM p)
         SELECT component_pair, n_pairs, concordant, discordant,
           ties, concordant - discordant AS tau_num
         FROM u""",
    // q420: the full q400 admission chain, receipted as the modular
    // hash-sum over admitted doc ids.
    "q420_admission_receipt" ->
      s"""WITH $qMicroCte,
         $shinglesCte,
         d5 AS (SELECT doc_id,
             list_distinct(list_transform(range(len(toks) - 4),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                 || ' ' || toks[i+4] || ' ' || toks[i+5])) AS sh
           FROM (SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\\s+')
                   END AS toks
                 FROM documents) t
           WHERE len(toks) >= 5),
         e5 AS (SELECT doc_id, unnest(sh) AS s FROM d5
                WHERE len(sh) > 0),
         e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
               WHERE len(sh) > 0),
         cont AS (SELECT DISTINCT a.doc_id FROM e5 a JOIN e5 b
                 ON a.s = b.s
               WHERE a.doc_id % 50 <> 0 AND b.doc_id % 50 = 0),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS inter,
                 any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
               FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
         pr AS (SELECT doc_a, doc_b FROM p
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                  >= 0.5),
         nb AS (SELECT DISTINCT nbr AS doc_id FROM (
                 SELECT doc_b AS nbr FROM pr
                 WHERE doc_a IN (SELECT doc_id FROM cont)
                 UNION ALL
                 SELECT doc_a AS nbr FROM pr
                 WHERE doc_b IN (SELECT doc_id FROM cont)) x
                WHERE nbr % 50 <> 0
                  AND nbr NOT IN (SELECT doc_id FROM cont)),
         base AS (SELECT dd.doc_id, dd.lang,
                  CAST(len(CASE WHEN length(trim(dd.text)) = 0
                       THEN []::VARCHAR[]
                       ELSE regexp_split_to_array(trim(dd.text),
                         '\\s+') END) AS BIGINT) AS tk
                 FROM documents dd WHERE dd.doc_id % 50 <> 0),
         sc AS (SELECT base.doc_id, base.lang, base.tk, qm.q_micro
                FROM base JOIN qm USING (doc_id)),
         l AS (SELECT lang, q_micro AS lang_med FROM
                (SELECT lang, q_micro, doc_id,
                   row_number() OVER (PARTITION BY lang
                     ORDER BY q_micro, doc_id) AS lrn,
                   count(*) OVER (PARTITION BY lang) AS lcnt
                 FROM sc) t
               WHERE lrn = ceil(lcnt * 50 / 100)),
         adm AS (SELECT sc.doc_id, sc.tk
                 FROM sc JOIN l USING (lang)
                 WHERE sc.doc_id NOT IN (SELECT doc_id FROM cont)
                   AND sc.doc_id NOT IN (SELECT doc_id FROM nb)
                   AND sc.q_micro > l.lang_med)
         SELECT count(*)::BIGINT AS n_admitted,
           sum(tk)::BIGINT AS admitted_tokens,
           min(doc_id)::BIGINT AS min_doc_id,
           max(doc_id)::BIGINT AS max_doc_id,
           sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
             % 1000000)::BIGINT AS receipt_mod
         FROM adm""",
    // q421: per-source arrival rank; first 10 vs rest, exact means.
    "q421_early_sample_bias" ->
      s"""WITH $qMicroCte,
         r AS (SELECT dd.source, q2.q_micro,
                 row_number() OVER (PARTITION BY dd.source
                   ORDER BY dd.doc_id ASC) AS rn
               FROM documents dd JOIN qm q2 USING (doc_id)),
         a AS (SELECT source,
                 sum(CASE WHEN rn <= 10 THEN 1 ELSE 0 END)::BIGINT
                   AS n_early,
                 sum(CASE WHEN rn > 10 THEN 1 ELSE 0 END)::BIGINT
                   AS n_rest,
                 sum(CASE WHEN rn <= 10 THEN q_micro ELSE 0 END)
                   ::BIGINT AS s_early,
                 sum(CASE WHEN rn > 10 THEN q_micro ELSE 0 END)
                   ::BIGINT AS s_rest
               FROM r GROUP BY 1
               HAVING sum(CASE WHEN rn > 10 THEN 1 ELSE 0 END) >= 1)
         SELECT source, n_early, n_rest,
           ${sqlIdivHalfUp("s_early", "n_early")} AS early_mean_micro,
           ${sqlIdivHalfUp("s_rest", "n_rest")} AS rest_mean_micro,
           ${sqlIdivHalfUp("s_early", "n_early")}
             - ${sqlIdivHalfUp("s_rest", "n_rest")} AS bias_micro
         FROM a""",
    // q422: two independent md5 orders; displacement five-point via
    // type-1 rank picks.
    "q422_shuffle_displacement" ->
      """WITH d AS (SELECT doc_id,
                 md5(doc_id::VARCHAR) AS h1,
                 md5('alt:' || doc_id::VARCHAR) AS h2
               FROM documents),
         r1 AS (SELECT doc_id,
                  row_number() OVER (ORDER BY h1, doc_id) AS p1
                FROM d),
         r2 AS (SELECT doc_id,
                  row_number() OVER (ORDER BY h2, doc_id) AS p2
                FROM d),
         dis AS (SELECT r1.doc_id, abs(r1.p1 - r2.p2)::BIGINT AS dd
                 FROM r1 JOIN r2 USING (doc_id)),
         rk AS (SELECT dd, doc_id,
                  row_number() OVER (ORDER BY dd, doc_id) AS rn,
                  count(*) OVER () AS cnt
                FROM dis)
         SELECT max(cnt)::BIGINT AS n_docs,
           min(dd)::BIGINT AS min_disp,
           max(CASE WHEN rn = ceil(cnt * 10 / 100) THEN dd END)
             ::BIGINT AS p10_disp,
           max(CASE WHEN rn = ceil(cnt * 50 / 100) THEN dd END)
             ::BIGINT AS p50_disp,
           max(CASE WHEN rn = ceil(cnt * 90 / 100) THEN dd END)
             ::BIGINT AS p90_disp,
           max(dd)::BIGINT AS max_disp
         FROM rk""",
    // q423: the q397 occupancy -> Simpson probe cost; the vs-even
    // ratio uses the same two-step half-up spelling as the engine.
    "q423_ivf_probe_cost" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS c_vec
                FROM embeddings WHERE vec_id < 8),
         sims AS (SELECT e.vec_id, c.cid,
                    ${cosSql("c_vec", "embedding")} AS csim
                  FROM embeddings e, c),
         asg AS (SELECT vec_id, cid
                 FROM (SELECT vec_id, cid,
                         row_number() OVER (PARTITION BY vec_id
                           ORDER BY csim DESC, cid ASC) AS rk
                       FROM sims) t WHERE rk = 1),
         cells AS (SELECT cid, count(*)::BIGINT AS n FROM asg
                   GROUP BY 1),
         a AS (SELECT count(*)::BIGINT AS n_cells_used,
                 sum(n)::BIGINT AS n_vecs,
                 sum(n * n)::BIGINT AS sum_sq
               FROM cells)
         SELECT 8::BIGINT AS k, n_cells_used, n_vecs,
           ${sqlMicroRatio("sum_sq", "n_vecs * n_vecs")}
             AS probe_cost_ppm,
           ${sqlIdivHalfUp(
        sqlIdivHalfUp("sum_sq * 8000", "n_vecs"),
        "n_vecs")} AS vs_even_milli
         FROM a""",
    // q424: the drained streaming receipt equals the batch sums over
    // the whole table — the commutative-sum drain equivalence.
    "q424_stream_receipt" ->
      """SELECT count(*)::BIGINT AS n_ingested,
           sum(CAST(len(CASE WHEN length(trim(text)) = 0
                THEN []::VARCHAR[]
                ELSE regexp_split_to_array(trim(text), '\s+') END)
             AS BIGINT))::BIGINT AS ingested_tokens,
           sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
             % 1000000)::BIGINT AS receipt_mod
         FROM documents""",
    // q425: the 1..n run test in pure integers per order.
    "q425_lineno_completeness" ->
      s"""WITH po AS (SELECT l_orderkey, count(*)::BIGINT AS n,
                 count(DISTINCT l_linenumber)::BIGINT AS ndn,
                 min(l_linenumber)::BIGINT AS mn,
                 max(l_linenumber)::BIGINT AS mx
               FROM lineitem GROUP BY 1),
         st AS (SELECT n,
                 CASE WHEN ndn <> n THEN 'duplicate_lineno'
                      WHEN mn <> 1 THEN 'wrong_start'
                      WHEN mx <> n THEN 'internal_gap'
                      ELSE 'complete' END AS status
               FROM po),
         a AS (SELECT status, count(*)::BIGINT AS n_orders,
                 sum(n)::BIGINT AS n_lines
               FROM st GROUP BY 1),
         t AS (SELECT sum(n_orders)::BIGINT AS total_orders FROM a)
         SELECT a.status, a.n_orders, a.n_lines,
           ${sqlMicroRatio("a.n_orders", "t.total_orders")}
             AS order_ppm
         FROM a, t""",
    // q426: two anti-join audits over the part/supplier dimensions.
    "q426_dead_catalog" ->
      s"""WITH dp AS (SELECT count(*)::BIGINT AS bad FROM part
             WHERE p_partkey NOT IN
               (SELECT DISTINCT l_partkey FROM lineitem)),
         np AS (SELECT count(*)::BIGINT AS n FROM part),
         ds AS (SELECT count(*)::BIGINT AS bad FROM supplier
             WHERE s_suppkey NOT IN
               (SELECT DISTINCT l_suppkey FROM lineitem)),
         ns AS (SELECT count(*)::BIGINT AS n FROM supplier),
         u AS (SELECT 'parts_never_ordered' AS check, dp.bad, np.n
                 FROM dp, np
               UNION ALL
               SELECT 'suppliers_never_shipping', ds.bad, ns.n
                 FROM ds, ns)
         SELECT u.check, u.bad AS n_dead, u.n AS n_total,
           ${sqlMicroRatio("u.bad", "u.n")} AS dead_ppm
         FROM u""",
    // q427: (user, day) distinct-day counts, 3-band rollup.
    "q427_active_days" ->
      s"""WITH pu AS (SELECT user_id,
                 count(DISTINCT epoch_us(ts)::BIGINT // 86400000000)
                   ::BIGINT AS n_days,
                 count(*)::BIGINT AS n_events
               FROM events GROUP BY 1),
         b AS (SELECT CASE WHEN n_days = 1 THEN '1_drive_by'
                           WHEN n_days <= 7 THEN '2_7_casual'
                           ELSE '8_plus_habitual' END AS band,
                 n_events
               FROM pu),
         a AS (SELECT band, count(*)::BIGINT AS n_users,
                 sum(n_events)::BIGINT AS n_events
               FROM b GROUP BY 1),
         t AS (SELECT sum(n_users)::BIGINT AS total_users FROM a)
         SELECT a.band, a.n_users, a.n_events,
           ${sqlMicroRatio("a.n_users", "t.total_users")} AS user_ppm
         FROM a, t""",
    // q428: weekday = (epoch_day + 4) mod 7 with 0 = Sunday — the
    // engine-proof integer calendar, never a dayofweek() builtin.
    "q428_order_weekday" ->
      s"""WITH d AS (SELECT ((epoch_us(o_orderdate)::BIGINT
                 // 86400000000) + 4) % 7 AS weekday
               FROM orders),
         a AS (SELECT weekday, count(*)::BIGINT AS n_orders FROM d
               GROUP BY 1),
         t AS (SELECT sum(n_orders)::BIGINT AS total FROM a)
         SELECT a.weekday, a.n_orders,
           ${sqlMicroRatio("a.n_orders", "t.total")} AS share_ppm
         FROM a, t""",
    // q429: min/max/distinct per id-carrying table; gaps and dups
    // as exact integer differences.
    "q429_id_density" ->
      s"""WITH u AS (
           SELECT 'documents' AS table_name, count(*)::BIGINT AS n_rows,
             count(DISTINCT doc_id)::BIGINT AS n_distinct,
             min(doc_id)::BIGINT AS min_id,
             max(doc_id)::BIGINT AS max_id
           FROM documents
           UNION ALL
           SELECT 'events', count(*)::BIGINT,
             count(DISTINCT event_id)::BIGINT,
             min(event_id)::BIGINT, max(event_id)::BIGINT
           FROM events
           UNION ALL
           SELECT 'orders', count(*)::BIGINT,
             count(DISTINCT o_orderkey)::BIGINT,
             min(o_orderkey)::BIGINT, max(o_orderkey)::BIGINT
           FROM orders)
         SELECT table_name, n_rows, n_distinct, min_id, max_id,
           (n_rows - n_distinct)::BIGINT AS n_dup_ids,
           (max_id - min_id + 1 - n_distinct)::BIGINT AS n_gaps,
           ${sqlMicroRatio("n_distinct", "max_id - min_id + 1")}
             AS density_ppm
         FROM u""",
    // q430: first half = rank*2 <= N (exact median split), per-source
    // shares of each half in half-up ppm.
    "q430_arrival_drift" ->
      s"""WITH r AS (SELECT source,
                 row_number() OVER (ORDER BY doc_id ASC) AS rn,
                 count(*) OVER () AS cnt
               FROM documents),
         h AS (SELECT source,
                 CASE WHEN rn * 2 <= cnt THEN 1 ELSE 0 END AS fh
               FROM r),
         c AS (SELECT source, sum(fh)::BIGINT AS n_first,
                 sum(1 - fh)::BIGINT AS n_second
               FROM h GROUP BY 1),
         t AS (SELECT sum(n_first)::BIGINT AS tf,
                 sum(n_second)::BIGINT AS ts
               FROM c)
         SELECT c.source, c.n_first, c.n_second,
           ${sqlMicroRatio("c.n_first", "greatest(t.tf, 1)")}
             AS first_share_ppm,
           ${sqlMicroRatio("c.n_second", "greatest(t.ts, 1)")}
             AS second_share_ppm,
           ${sqlMicroRatio("c.n_second", "greatest(t.ts, 1)")}
             - ${sqlMicroRatio("c.n_first", "greatest(t.tf, 1)")}
             AS drift_ppm
         FROM c, t""",
    // q431: the artifact's float admission; the BANDS are integer
    // cross-multiplications on (inter, union) and (longer, shorter).
    "q431_pair_shapes" ->
      s"""WITH $shinglesCte,
         e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
               WHERE len(sh) > 0),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*)::BIGINT AS inter,
                 any_value(a.n_sh)::BIGINT AS n_a,
                 any_value(b.n_sh)::BIGINT AS n_b
               FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
         pq AS (SELECT doc_a, doc_b, inter, n_a, n_b FROM p
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                  >= 0.5),
         tok AS (SELECT doc_id,
                  CAST(len(CASE WHEN length(trim(text)) = 0
                       THEN []::VARCHAR[]
                       ELSE regexp_split_to_array(trim(text), '\\s+')
                       END) AS BIGINT) AS tk
                 FROM documents),
         s AS (SELECT
                 CASE WHEN pq.inter * 10
                        >= (pq.n_a + pq.n_b - pq.inter) * 9
                      THEN 'j_090_plus'
                      WHEN pq.inter * 10
                        >= (pq.n_a + pq.n_b - pq.inter) * 7
                      THEN 'j_070_090'
                      ELSE 'j_050_070' END AS jacc_band,
                 greatest(ta.tk, tb.tk) AS lng,
                 least(ta.tk, tb.tk) AS shrt
               FROM pq
               JOIN tok ta ON pq.doc_a = ta.doc_id
               JOIN tok tb ON pq.doc_b = tb.doc_id),
         s2 AS (SELECT jacc_band,
                 CASE WHEN lng * 4 <= shrt * 5 THEN 'similar'
                      WHEN lng <= shrt * 2 THEN 'moderate'
                      ELSE 'extreme' END AS ratio_class
               FROM s),
         cells AS (SELECT jacc_band, ratio_class,
                     count(*)::BIGINT AS n_pairs
                   FROM s2 GROUP BY 1, 2),
         t AS (SELECT sum(n_pairs)::BIGINT AS total FROM cells)
         SELECT cells.jacc_band, cells.ratio_class, cells.n_pairs,
           ${sqlMicroRatio("cells.n_pairs", "t.total")} AS pair_ppm
         FROM cells, t""",
    // q432: first event via the same (us, event_id) min; conversion
    // = any strictly-later purchase.
    "q432_first_touch" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type,
                 epoch_us(ts)::BIGINT AS us FROM events),
         f AS (SELECT user_id, first_type, first_us, first_id FROM
                (SELECT user_id, event_type AS first_type,
                   us AS first_us, event_id AS first_id,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY us, event_id) AS rn
                 FROM e) t
               WHERE rn = 1),
         pu AS (SELECT user_id, us, event_id FROM e
                WHERE event_type = 'purchase'),
         c AS (SELECT f.user_id, f.first_type,
                 max(CASE WHEN pu.us > f.first_us
                       OR (pu.us = f.first_us
                           AND pu.event_id > f.first_id)
                   THEN 1 ELSE 0 END) AS converted
               FROM f LEFT JOIN pu ON f.user_id = pu.user_id
               GROUP BY 1, 2),
         a AS (SELECT first_type, count(*)::BIGINT AS n_users,
                 sum(converted)::BIGINT AS n_converted
               FROM c GROUP BY 1)
         SELECT first_type, n_users, n_converted,
           ${sqlMicroRatio("n_converted", "n_users")}
             AS conversion_ppm
         FROM a""",
    // q433: both gates' batch twins (min() vs lag()) over one band
    // chain; n_impossible is structurally zero.
    "q433_policy_delta" ->
      s"""WITH $shinglesCte,
         m AS (SELECT doc_id,
                 list_transform(range(8), i -> list_min(list_transform(sh,
                   s -> ('0x' || substr(md5(i || ':' || s), 1, 15))::BIGINT)))
                 AS mh
               FROM d WHERE len(sh) > 0),
         bd AS (SELECT doc_id, t.j AS j,
                  mh[t.j*2+1] || '_' || mh[t.j*2+2] AS bval
                FROM m, range(4) t(j)),
         mins AS (SELECT j, bval, min(doc_id) AS mn
                  FROM bd GROUP BY 1, 2),
         supf AS (SELECT bd.doc_id, bool_or(bd.doc_id > mins.mn) AS s
                 FROM bd JOIN mins USING (j, bval) GROUP BY 1),
         lg AS (SELECT doc_id,
                  lag(doc_id) OVER (PARTITION BY j, bval
                    ORDER BY doc_id ASC) AS prev
                FROM bd),
         supt AS (SELECT doc_id,
                  bool_or(prev IS NOT NULL AND doc_id - prev <= 100)
                    AS s
                 FROM lg GROUP BY 1),
         cl AS (SELECT d0.doc_id, d0.source,
                  coalesce(supt.s, false) AS ttl_sup,
                  coalesce(supf.s, false) AS fv_sup
                FROM documents d0
                LEFT JOIN supt ON d0.doc_id = supt.doc_id
                LEFT JOIN supf ON d0.doc_id = supf.doc_id),
         a AS (SELECT source, count(*)::BIGINT AS n_docs,
                 sum(CASE WHEN fv_sup AND NOT ttl_sup
                   THEN 1 ELSE 0 END)::BIGINT AS n_rescued,
                 sum(CASE WHEN ttl_sup AND NOT fv_sup
                   THEN 1 ELSE 0 END)::BIGINT AS n_impossible,
                 sum(CASE WHEN ttl_sup AND fv_sup
                   THEN 1 ELSE 0 END)::BIGINT AS n_both_suppress
               FROM cl GROUP BY 1)
         SELECT source, n_docs, n_rescued, n_impossible,
           n_both_suppress,
           ${sqlMicroRatio("n_rescued", "n_docs")} AS rescued_ppm
         FROM a""",
    // q434: distinct bigrams via a lateral range; degrees over the
    // symmetric distinct edge list.
    "q434_bigram_degrees" ->
      s"""WITH tk AS (SELECT
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+')
             END AS toks
           FROM documents),
         bg AS (SELECT DISTINCT w1, w2 FROM
                (SELECT unnest(toks[1:len(toks)-1]) AS w1,
                        unnest(toks[2:len(toks)]) AS w2
                 FROM tk WHERE len(toks) >= 2) z),
         deg AS (SELECT w, count(*)::BIGINT AS degree FROM
                  (SELECT DISTINCT w, nbr FROM (
                    SELECT w1 AS w, w2 AS nbr FROM bg
                    UNION ALL SELECT w2, w1 FROM bg) x) y
                 GROUP BY 1),
         b AS (SELECT CASE WHEN degree <= 2 THEN '1_2_leaf'
                           WHEN degree <= 10 THEN '3_10_content'
                           ELSE '11_plus_hub' END AS band,
                 degree
               FROM deg),
         a AS (SELECT band, count(*)::BIGINT AS n_tokens,
                 max(degree)::BIGINT AS max_degree
               FROM b GROUP BY 1),
         t AS (SELECT sum(n_tokens)::BIGINT AS total FROM a)
         SELECT a.band, a.n_tokens, a.max_degree,
           ${sqlMicroRatio("a.n_tokens", "t.total")} AS token_ppm
         FROM a, t""",
    // q435: exact half-up half means; SQL ntile(4) is the pinned
    // bit-twin of Ranking.ntileFromRank.
    "q435_source_rank_churn" ->
      s"""WITH $qMicroCte,
         r AS (SELECT dd.source, q2.q_micro,
                 row_number() OVER (ORDER BY dd.doc_id ASC) AS rn,
                 count(*) OVER () AS cnt
               FROM documents dd JOIN qm q2 USING (doc_id)),
         m AS (SELECT source,
                 CASE WHEN rn * 2 <= cnt THEN 'first'
                      ELSE 'second' END AS half,
                 ${sqlIdivHalfUp("sum(q_micro)", "count(*)")}
                   AS mean_micro
               FROM r GROUP BY 1, 2),
         qf AS (SELECT source, mean_micro AS mean_first,
                  ntile(4) OVER (ORDER BY mean_micro, source)
                    ::BIGINT AS q_first
                FROM m WHERE half = 'first'),
         qs AS (SELECT source, mean_micro AS mean_second,
                  ntile(4) OVER (ORDER BY mean_micro, source)
                    ::BIGINT AS q_second
                FROM m WHERE half = 'second')
         SELECT qf.source, qf.mean_first, qs.mean_second,
           qf.q_first, qs.q_second,
           qf.q_first <> qs.q_second AS moved
         FROM qf JOIN qs USING (source)""",
    // q436: the q29 session chain -> sessions per user -> rank picks.
    "q436_sessions_five_point" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP)
                 AS ts FROM events),
         l AS (SELECT e.*, lag(ts) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_ts
               FROM e),
         f AS (SELECT l.*, CASE WHEN prev_ts IS NULL
                 OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                 THEN 1 ELSE 0 END AS is_new FROM l),
         s AS (SELECT user_id, sum(is_new)::BIGINT AS n_sessions
               FROM f GROUP BY 1),
         r AS (SELECT user_id, n_sessions,
                 row_number() OVER (ORDER BY n_sessions, user_id)
                   AS rn,
                 count(*) OVER () AS cnt
               FROM s)
         SELECT max(cnt)::BIGINT AS n_users,
           min(n_sessions)::BIGINT AS min_sessions,
           max(CASE WHEN rn = ceil(cnt * 25 / 100) THEN n_sessions
             END)::BIGINT AS p25_sessions,
           max(CASE WHEN rn = ceil(cnt * 50 / 100) THEN n_sessions
             END)::BIGINT AS p50_sessions,
           max(CASE WHEN rn = ceil(cnt * 75 / 100) THEN n_sessions
             END)::BIGINT AS p75_sessions,
           max(n_sessions)::BIGINT AS max_sessions
         FROM r""",
    // q437: global P50/P75 quality picks feed per-source token
    // yields; ppm half-up.
    "q437_source_yield" ->
      s"""WITH $qMicroCte,
         sc AS (SELECT dd.doc_id, dd.source,
                 CAST(len(CASE WHEN length(trim(dd.text)) = 0
                      THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(dd.text),
                        '\\s+') END) AS BIGINT) AS tk,
                 q2.q_micro
               FROM documents dd JOIN qm q2 USING (doc_id)),
         r AS (SELECT q_micro,
                 row_number() OVER (ORDER BY q_micro, doc_id) AS rn,
                 count(*) OVER () AS cnt
               FROM sc),
         c50 AS (SELECT q_micro AS cut_50 FROM r
                 WHERE rn = ceil(cnt * 50 / 100)),
         c75 AS (SELECT q_micro AS cut_75 FROM r
                 WHERE rn = ceil(cnt * 75 / 100)),
         a AS (SELECT sc.source, count(*)::BIGINT AS n_docs,
                 sum(sc.tk)::BIGINT AS n_tokens,
                 sum(CASE WHEN sc.q_micro > c50.cut_50 THEN sc.tk
                   ELSE 0 END)::BIGINT AS tokens_above_p50,
                 sum(CASE WHEN sc.q_micro > c75.cut_75 THEN sc.tk
                   ELSE 0 END)::BIGINT AS tokens_above_p75
               FROM sc, c50, c75 GROUP BY 1)
         SELECT source, n_docs, n_tokens, tokens_above_p50,
           tokens_above_p75,
           ${sqlMicroRatio("tokens_above_p50",
        "greatest(n_tokens, 1)")} AS yield_p50_ppm,
           ${sqlMicroRatio("tokens_above_p75",
        "greatest(n_tokens, 1)")} AS yield_p75_ppm
         FROM a""",
    // q438: the mergeable (n, Σx, Σx²) integer moments; cv² milli
    // half-up.
    "q438_length_dispersion" ->
      s"""WITH a AS (SELECT source, count(*)::BIGINT AS n_docs,
                 sum(CAST(len(CASE WHEN length(trim(text)) = 0
                      THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\\s+')
                      END) AS BIGINT))::BIGINT AS sum_x,
                 sum(CAST(len(CASE WHEN length(trim(text)) = 0
                      THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\\s+')
                      END) AS BIGINT)
                   * CAST(len(CASE WHEN length(trim(text)) = 0
                      THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(text), '\\s+')
                      END) AS BIGINT))::BIGINT AS sum_x2
               FROM documents GROUP BY 1
               HAVING sum(CAST(len(CASE WHEN length(trim(text)) = 0
                    THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\\s+')
                    END) AS BIGINT)) > 0)
         SELECT source, n_docs, sum_x, sum_x2,
           ${sqlIdivHalfUp(
        "(n_docs * sum_x2 - sum_x * sum_x) * 1000",
        "sum_x * sum_x")} AS cv2_milli
         FROM a""",
    // q439: the q434 degree chain, top-10 by (degree DESC, token).
    "q439_hub_tokens" ->
      """WITH tk AS (SELECT
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+')
             END AS toks
           FROM documents),
         bg AS (SELECT DISTINCT w1, w2 FROM
                (SELECT unnest(toks[1:len(toks)-1]) AS w1,
                        unnest(toks[2:len(toks)]) AS w2
                 FROM tk WHERE len(toks) >= 2) z),
         deg AS (SELECT w, count(*)::BIGINT AS degree FROM
                  (SELECT DISTINCT w, nbr FROM (
                    SELECT w1 AS w, w2 AS nbr FROM bg
                    UNION ALL SELECT w2, w1 FROM bg) x) y
                 GROUP BY 1)
         SELECT w, degree FROM deg
         ORDER BY degree DESC, w ASC LIMIT 10""",
    // q440: the q261 gap chain; quantiles are picked raw integers.
    "q440_gap_five_point" ->
      """WITH e AS (SELECT event_id, event_type,
                 epoch_us(ts)::BIGINT AS us FROM events),
         g AS (SELECT event_type, event_id,
                 us - lag(us) OVER (PARTITION BY event_type
                   ORDER BY us, event_id) AS gap
               FROM e),
         f AS (SELECT event_type, event_id, gap FROM g
               WHERE gap IS NOT NULL),
         r AS (SELECT event_type, gap,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY gap ASC, event_id ASC) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS cnt
               FROM f)
         SELECT event_type, max(cnt)::BIGINT AS n_gaps,
           min(gap)::BIGINT AS min_gap_us,
           max(CASE WHEN rn = ceil(cnt * 25 / 100) THEN gap END)
             ::BIGINT AS p25_gap_us,
           max(CASE WHEN rn = ceil(cnt * 50 / 100) THEN gap END)
             ::BIGINT AS p50_gap_us,
           max(CASE WHEN rn = ceil(cnt * 75 / 100) THEN gap END)
             ::BIGINT AS p75_gap_us,
           max(gap)::BIGINT AS max_gap_us
         FROM r GROUP BY 1""",
    // q441: head iff count*1000 > N (integer cross-multiplication);
    // occurrence shares half-up ppm.
    "q441_frequency_bands" ->
      s"""WITH c AS (SELECT w, count(*)::BIGINT AS c FROM
                (SELECT unnest(
                   CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\\s+')
                   END) AS w
                 FROM documents) x
               GROUP BY 1),
         t AS (SELECT sum(c)::BIGINT AS n_tokens FROM c),
         b AS (SELECT CASE WHEN c.c * 1000 > t.n_tokens THEN 'head'
                           WHEN c.c = 1 THEN 'tail_singleton'
                           ELSE 'torso' END AS band,
                 c.c, t.n_tokens
               FROM c, t),
         a AS (SELECT band, count(*)::BIGINT AS n_types,
                 sum(c)::BIGINT AS n_occurrences,
                 max(n_tokens)::BIGINT AS n_tokens
               FROM b GROUP BY 1)
         SELECT band, n_types, n_occurrences,
           ${sqlMicroRatio("n_occurrences", "n_tokens")}
             AS occurrence_ppm
         FROM a""",
    // q442: the q441 head test decides a (≤1000-type) head set; per-
    // source shares half-up ppm.
    "q442_head_dependence" ->
      s"""WITH occ AS (SELECT source, unnest(
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END)
               AS w
           FROM documents),
         g AS (SELECT w, count(*)::BIGINT AS c FROM occ GROUP BY 1),
         t AS (SELECT sum(c)::BIGINT AS n_tokens FROM g),
         h AS (SELECT g.w FROM g, t WHERE g.c * 1000 > t.n_tokens),
         a AS (SELECT source, count(*)::BIGINT AS n_occurrences,
                 sum(CASE WHEN w IN (SELECT w FROM h)
                   THEN 1 ELSE 0 END)::BIGINT AS head_occurrences
               FROM occ GROUP BY 1)
         SELECT source, n_occurrences, head_occurrences,
           ${sqlMicroRatio("head_occurrences",
        "greatest(n_occurrences, 1)")} AS head_ppm
         FROM a""",
    // q443: the shared closure's surv CTE IS the q78 keep-best
    // policy; unlabeled (shingle-less) docs survive by default; the
    // per-lang median gate runs on the surviving population.
    "q443_quality_funnel" ->
      s"""WITH RECURSIVE $canonicalChainCtes,
         sv AS (SELECT doc_id FROM surv WHERE rn = 1
                UNION ALL
                SELECT d2.doc_id FROM documents d2
                WHERE d2.doc_id NOT IN (SELECT doc_id FROM nodes)),
         sc AS (SELECT dd.doc_id, dd.lang, q2.q_micro
               FROM documents dd JOIN qm q2 USING (doc_id)),
         s2 AS (SELECT sc.* FROM sc JOIN sv USING (doc_id)),
         l AS (SELECT lang, q_micro AS lang_med FROM
                (SELECT lang, q_micro, doc_id,
                   row_number() OVER (PARTITION BY lang
                     ORDER BY q_micro, doc_id) AS lrn,
                   count(*) OVER (PARTITION BY lang) AS lcnt
                 FROM s2) t
               WHERE lrn = ceil(lcnt * 50 / 100)),
         g3 AS (SELECT s2.doc_id, s2.q_micro
                FROM s2 JOIN l USING (lang)
                WHERE s2.q_micro > l.lang_med),
         u AS (SELECT '1_raw' AS stage, count(*)::BIGINT AS n_docs,
                 ${sqlIdivHalfUp("sum(q_micro)",
        "greatest(count(*), 1)")} AS mean_micro
               FROM sc
               UNION ALL
               SELECT '2_survivors', count(*)::BIGINT,
                 ${sqlIdivHalfUp("sum(q_micro)",
        "greatest(count(*), 1)")}
               FROM s2
               UNION ALL
               SELECT '3_gated', count(*)::BIGINT,
                 ${sqlIdivHalfUp("sum(q_micro)",
        "greatest(count(*), 1)")}
               FROM g3)
         SELECT stage, n_docs, mean_micro FROM u""",
    // q444: contested members (size >= 2) left-joined to the surv
    // winners; win rate half-up ppm.
    "q444_survivor_wins" ->
      s"""WITH RECURSIVE $canonicalChainCtes,
         m AS (SELECT lab.doc_id, dd.source
               FROM lab
               JOIN sz USING (cluster_id)
               JOIN documents dd USING (doc_id)
               WHERE sz.cluster_size >= 2),
         w AS (SELECT doc_id FROM surv WHERE rn = 1),
         a AS (SELECT m.source, count(*)::BIGINT AS n_contested,
                 sum(CASE WHEN m.doc_id IN (SELECT doc_id FROM w)
                   THEN 1 ELSE 0 END)::BIGINT AS n_won
               FROM m GROUP BY 1)
         SELECT source, n_contested, n_won,
           ${sqlMicroRatio("n_won", "n_contested")} AS win_ppm
         FROM a""",
    // q445: same degree-ordered orientation as the Spark plan — the
    // wedge join runs on oriented out-edges, closure via the
    // canonical (u < v) edge set.
    "q445_copurchase_triangles" ->
      s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
               FROM lineitem),
         e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
               FROM op a JOIN op b USING (l_orderkey)
               WHERE a.l_partkey < b.l_partkey),
         d AS (SELECT n, count(*)::BIGINT AS deg FROM
                 (SELECT u AS n FROM e UNION ALL SELECT v FROM e)
               GROUP BY 1),
         o AS (SELECT CASE WHEN du.deg < dv.deg
                        OR (du.deg = dv.deg AND e.u < e.v)
                      THEN e.u ELSE e.v END AS src,
                      CASE WHEN du.deg < dv.deg
                        OR (du.deg = dv.deg AND e.u < e.v)
                      THEN e.v ELSE e.u END AS dst
               FROM e JOIN d du ON e.u = du.n
                      JOIN d dv ON e.v = dv.n),
         w AS (SELECT o1.dst AS x, o2.dst AS y
               FROM o o1 JOIN o o2
                 ON o1.src = o2.src AND o1.dst < o2.dst),
         t AS (SELECT count(*)::BIGINT AS n_triangles
               FROM w WHERE EXISTS (SELECT 1 FROM e
                 WHERE e.u = w.x AND e.v = w.y)),
         c AS (SELECT count(*)::BIGINT AS n_edges FROM e),
         nn AS (SELECT count(*)::BIGINT AS n_nodes,
                  sum((deg * (deg - 1)) // 2)::BIGINT AS n_wedges
                FROM d)
         SELECT n_nodes, n_edges, n_wedges, n_triangles,
           ${sqlMicroRatio("3 * n_triangles",
        "greatest(n_wedges, 1)")} AS closure_ppm
         FROM nn, c, t""",
    // q446: tie-averaged double-ranks (2·cum_before + tie + 1) over
    // the distinct value domains per source; rho in signed half-up
    // milli from the d-squared form.
    "q446_spearman_rho" ->
      s"""WITH $qMicroCte,
         base AS (SELECT d.source, d.n_chars AS lv, q.q_micro AS qv
                  FROM documents d JOIN qm q USING (doc_id)),
         lg AS (SELECT source, lv, count(*)::BIGINT AS c
                FROM base GROUP BY 1, 2),
         lr AS (SELECT source, lv,
                  2 * (sum(c) OVER (PARTITION BY source
                    ORDER BY lv) - c) + c + 1 AS rl2
                FROM lg),
         qg AS (SELECT source, qv, count(*)::BIGINT AS c
                FROM base GROUP BY 1, 2),
         qr AS (SELECT source, qv,
                  2 * (sum(c) OVER (PARTITION BY source
                    ORDER BY qv) - c) + c + 1 AS rq2
                FROM qg),
         j AS (SELECT b.source,
                 (lr.rl2 - qr.rq2) * (lr.rl2 - qr.rq2) AS d2
               FROM base b
               JOIN lr ON b.source = lr.source AND b.lv = lr.lv
               JOIN qr ON b.source = qr.source AND b.qv = qr.qv),
         a AS (SELECT source, count(*)::BIGINT AS n_docs,
                 sum(d2)::BIGINT AS sum_d2_x4
               FROM j GROUP BY 1)
         SELECT source, n_docs, sum_d2_x4,
           ${sqlIdivHalfUpSigned(
          "1000 * n_docs * (n_docs * n_docs - 1) - 1500 * sum_d2_x4",
          "greatest(n_docs * (n_docs * n_docs - 1), 1)"
        )} AS rho_milli
         FROM a""",
    // q447: double-rank the daily counts over the distinct-count
    // value domain, then U_t = prefix(2r) - t(n+1); argmax |U_t|
    // with earliest-day tiebreak.
    "q447_pettitt_changepoint" ->
      s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
                 count(*)::BIGINT AS cnt
               FROM events GROUP BY 1),
         g AS (SELECT cnt, count(*)::BIGINT AS c
               FROM daily GROUP BY 1),
         r AS (SELECT cnt,
                 2 * (sum(c) OVER (ORDER BY cnt) - c) + c + 1 AS r2
               FROM g),
         n AS (SELECT count(*)::BIGINT AS n_days FROM daily),
         u AS (SELECT daily.d,
                 row_number() OVER (ORDER BY daily.d) AS t,
                 sum(r.r2) OVER (ORDER BY daily.d) AS s2
               FROM daily JOIN r USING (cnt)),
         ut AS (SELECT u.d, (u.s2 - u.t * (n.n_days + 1)) AS u_t,
                  n.n_days
                FROM u, n WHERE u.t < n.n_days)
         SELECT n_days, d AS t_star_day,
           abs(u_t)::BIGINT AS k_stat, u_t::BIGINT AS u_at_tstar
         FROM ut ORDER BY abs(u_t) DESC, d ASC LIMIT 1""",
    // q448: same (lang, 8-char prefix) blocks, 60-char Levenshtein
    // operands, identical band edges.
    "q448_edit_distance_bands" ->
      """WITH b AS (SELECT doc_id, lang, substr(text, 1, 8) AS pfx,
                 substr(text, 1, 60) AS t60
               FROM documents),
         p AS (SELECT levenshtein(a.t60, bb.t60)::BIGINT AS d
               FROM b a JOIN b bb
                 ON a.lang = bb.lang AND a.pfx = bb.pfx
                   AND a.doc_id < bb.doc_id)
         SELECT CASE WHEN d <= 2 THEN '0_2'
                     WHEN d <= 5 THEN '3_5'
                     WHEN d <= 10 THEN '6_10'
                     ELSE 'far' END AS band,
           count(*)::BIGINT AS n_pairs,
           min(d)::BIGINT AS min_dist,
           max(d)::BIGINT AS max_dist
         FROM p GROUP BY 1""",
    // q449: (source, n_chars DIV 100) QI cells; l = distinct langs
    // per cell; distribution over l.
    "q449_l_diversity" ->
      """WITH c AS (SELECT source, n_chars // 100 AS len_band, lang,
                 count(*)::BIGINT AS n
               FROM documents GROUP BY 1, 2, 3),
         q AS (SELECT source, len_band, count(*)::BIGINT AS l,
                 sum(n)::BIGINT AS k
               FROM c GROUP BY 1, 2)
         SELECT l, count(*)::BIGINT AS n_cells,
           sum(k)::BIGINT AS n_docs,
           min(k)::BIGINT AS min_cell,
           max(k)::BIGINT AS max_cell
         FROM q GROUP BY 1""",
    // q450: the q208 J >= 0.5 pair derivation, endpoint degrees via
    // symmetric expansion, Newman's r from integer sums.
    "q450_degree_assortativity" ->
      s"""WITH $shinglesCte,
         e0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s
                FROM d WHERE len(sh) > 0),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*) AS inter,
                  any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
                FROM e0 a JOIN e0 b
                  ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         p AS (SELECT doc_a, doc_b FROM pr
               WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                 >= 0.5),
         dg AS (SELECT n, count(*)::BIGINT AS deg FROM
                  (SELECT doc_a AS n FROM p
                   UNION ALL SELECT doc_b FROM p)
                GROUP BY 1),
         w AS (SELECT da.deg AS ja, db.deg AS jb
               FROM p JOIN dg da ON p.doc_a = da.n
                      JOIN dg db ON p.doc_b = db.n),
         a AS (SELECT count(*)::BIGINT AS m,
                 coalesce(sum(ja * jb), 0)::BIGINT AS s_jk,
                 coalesce(sum(ja + jb), 0)::BIGINT AS s1,
                 coalesce(sum(ja * ja + jb * jb), 0)::BIGINT AS s2
               FROM w)
         SELECT m, s_jk, s1, s2,
           CASE WHEN m = 0 THEN 0::BIGINT
                ELSE ${sqlIdivHalfUpSigned(
          "1000 * (4 * m * s_jk - s1 * s1)",
          "greatest(2 * m * s2 - s1 * s1, 1)"
        )} END AS r_milli
         FROM a""",
    // q451: the q222 rolling-hash payload stub, 65 pseudo-pixels,
    // 4×16-bit dHash bands, band-bucket candidates, popcount verify.
    "q451_image_dhash" -> {
      def pixSql(k: Int): String = {
        val t0 = s"((h + ${k.toLong * 2654435761L}) % 1000000007)"
        val t1 = s"(($t0 * $t0) % 1000000007)"
        val t2 = s"(($t1 * 1103515245 + $t0) % 1000000007)"
        s"((($t2 * $t2) % 1000000007) % 256)"
      }
      def bandSql(b: Int): String =
        (0 until 16)
          .map { i =>
            val k = 16 * b + i
            s"(CASE WHEN ${pixSql(k)} > ${pixSql(k + 1)} " +
              s"THEN ${1L << i} ELSE 0 END)"
          }
          .mkString(" + ")
      s"""WITH base AS (SELECT doc_id,
             list_reduce(list_prepend(0::BIGINT,
               list_transform(range(length(text)),
                 i -> ord(substr(text, (i+1)::INT, 1))::BIGINT)),
               (a, c) -> (a * 31 + c) % 1000000007) AS h
           FROM documents),
         bands AS (SELECT doc_id,
             (${bandSql(0)})::BIGINT AS b0,
             (${bandSql(1)})::BIGINT AS b1,
             (${bandSql(2)})::BIGINT AS b2,
             (${bandSql(3)})::BIGINT AS b3
           FROM base),
         k AS (SELECT doc_id, 0 AS bi, b0 AS bv FROM bands
               UNION ALL SELECT doc_id, 1, b1 FROM bands
               UNION ALL SELECT doc_id, 2, b2 FROM bands
               UNION ALL SELECT doc_id, 3, b3 FROM bands),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a,
                    b.doc_id AS doc_b
                  FROM k a JOIN k b
                    ON a.bi = b.bi AND a.bv = b.bv
                      AND a.doc_id < b.doc_id),
         dd AS (SELECT bit_count(xor(x.b0, y.b0))
                  + bit_count(xor(x.b1, y.b1))
                  + bit_count(xor(x.b2, y.b2))
                  + bit_count(xor(x.b3, y.b3)) AS hamming
                FROM cand JOIN bands x ON cand.doc_a = x.doc_id
                          JOIN bands y ON cand.doc_b = y.doc_id),
         agg AS (SELECT count(*)::BIGINT AS n_candidate_pairs,
                   coalesce(sum(CASE WHEN hamming <= 6
                     THEN 1 ELSE 0 END), 0)::BIGINT
                     AS n_near_dup_pairs,
                   coalesce(sum(CASE WHEN hamming = 0
                     THEN 1 ELSE 0 END), 0)::BIGINT
                     AS n_exact_pairs
                 FROM dd),
         n AS (SELECT count(*)::BIGINT AS n_images FROM bands)
         SELECT n_images, n_candidate_pairs, n_near_dup_pairs,
           n_exact_pairs
         FROM n, agg"""
    },
    // q452: the same iterative Hilbert xy→d (full-grid complement,
    // per-level quadrant code), literal-generated Morton interleave,
    // 4096-cell blocks, three scan regions.
    "q452_curve_locality" -> {
      val zSql = (0 until 10)
        .map(i =>
          s"(((x0 >> $i) & 1) << ${2 * i}) + " +
            s"(((y0 >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      val iters = (9 to 0 by -1).zipWithIndex
        .map { case (bit, step) =>
          val s = 1L << bit
          s"""i${step + 1} AS (SELECT x0, y0,
             CASE WHEN ry = 0 THEN
               (CASE WHEN rx = 1 THEN 1023 - hy ELSE hy END)
             ELSE hx END AS hx,
             CASE WHEN ry = 0 THEN
               (CASE WHEN rx = 1 THEN 1023 - hx ELSE hx END)
             ELSE hy END AS hy,
             d + ${s * s} * xor(3 * rx, ry) AS d
           FROM (SELECT *,
               CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END AS rx,
               CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END AS ry
             FROM i$step) t)"""
        }
        .mkString(",\n         ")
      s"""WITH st AS (SELECT min(l_partkey) AS pk_mn,
             max(l_partkey) AS pk_mx, min(l_orderkey) AS ok_mn,
             max(l_orderkey) AS ok_mx FROM lineitem),
         p0 AS (SELECT
             ((l_partkey - pk_mn) * 1024) // (pk_mx - pk_mn + 1)
               AS x0,
             ((l_orderkey - ok_mn) * 1024) // (ok_mx - ok_mn + 1)
               AS y0
           FROM lineitem, st),
         i0 AS (SELECT x0, y0, x0 AS hx, y0 AS hy, 0::BIGINT AS d
                FROM p0),
         $iters,
         f AS (SELECT x0, y0, d,
                 ($zSql)::BIGINT AS z,
                 ((x0 << 10) + y0)::BIGINT AS lx
               FROM i10),
         m AS (SELECT x0, y0, 'hilbert' AS layout, d AS idx FROM f
               UNION ALL SELECT x0, y0, 'zorder', z FROM f
               UNION ALL SELECT x0, y0, 'lex', lx FROM f),
         reg AS (SELECT layout, idx, 'r_square' AS region FROM m
                   WHERE x0 < 128 AND y0 < 128
                 UNION ALL SELECT layout, idx, 'r_slab_x' FROM m
                   WHERE x0 BETWEEN 200 AND 215
                 UNION ALL SELECT layout, idx, 'r_slab_y' FROM m
                   WHERE y0 BETWEEN 600 AND 615)
         SELECT layout, region, count(*)::BIGINT AS n_rows,
           count(DISTINCT idx // 4096)::BIGINT AS n_blocks_touched
         FROM reg GROUP BY 1, 2"""
    },
    // q453: hourly counts, 9 dyadic levels over the first 512 hours,
    // signed-sum Haar details, integer energy per level.
    "q453_haar_energy" ->
      """WITH hourly AS (SELECT epoch_us(ts) // 3600000000 AS hr,
                 count(*)::BIGINT AS cnt
               FROM events GROUP BY 1),
         h0 AS (SELECT hr - (SELECT min(hr) FROM hourly) AS h, cnt
                FROM hourly),
         hh AS (SELECT h, cnt FROM h0 WHERE h < 512),
         lv AS (SELECT unnest(range(1, 10)) AS level),
         t AS (SELECT lv.level, hh.h // (1 << lv.level) AS block,
                 CASE WHEN (hh.h // (1 << (lv.level - 1))) % 2 = 0
                   THEN cnt ELSE -cnt END AS signed
               FROM hh, lv),
         d AS (SELECT level, block, sum(signed) AS dcoef
               FROM t GROUP BY 1, 2)
         SELECT level, count(*)::BIGINT AS n_blocks,
           sum(dcoef * dcoef)::BIGINT AS energy
         FROM d GROUP BY 1""",
    // q454: value-domain pair counting — gt/lt from global and
    // per-source strictly-below cumsums, no pairwise work.
    "q454_cliff_delta" ->
      s"""WITH $qMicroCte,
         base AS (SELECT d.source, q.q_micro AS v
                  FROM documents d JOIN qm q USING (doc_id)),
         g AS (SELECT source, v, count(*)::BIGINT AS c
               FROM base GROUP BY 1, 2),
         gv AS (SELECT v, sum(c)::BIGINT AS ct FROM g GROUP BY 1),
         gc AS (SELECT v, ct,
                  (sum(ct) OVER (ORDER BY v) - ct)::BIGINT AS gb
                FROM gv),
         sc AS (SELECT source, v, c,
                  (sum(c) OVER (PARTITION BY source ORDER BY v)
                    - c)::BIGINT AS sb
                FROM g),
         ns AS (SELECT source, sum(c)::BIGINT AS n_s
                FROM g GROUP BY 1),
         nt AS (SELECT count(*)::BIGINT AS n_total FROM base),
         t AS (SELECT sc.source, ns.n_s,
                 (nt.n_total - ns.n_s) AS n_rest,
                 sc.c * (gc.gb - sc.sb) AS gt_term,
                 sc.c * ((nt.n_total - gc.gb - gc.ct)
                   - (ns.n_s - sc.sb - sc.c)) AS lt_term
               FROM sc JOIN gc USING (v) JOIN ns USING (source), nt),
         a AS (SELECT source, max(n_s)::BIGINT AS n_s,
                 max(n_rest)::BIGINT AS n_rest,
                 sum(gt_term)::BIGINT AS n_gt,
                 sum(lt_term)::BIGINT AS n_lt
               FROM t GROUP BY 1)
         SELECT source, n_s, n_rest, n_gt, n_lt,
           ${sqlIdivHalfUpSigned("1000 * (n_gt - n_lt)",
          "greatest(n_s * n_rest, 1)")} AS delta_milli
         FROM a""",
    // q455: per-user halves by event order, exact micro means,
    // milli-quantized nonzero diffs, |d| double-ranks, signed sums.
    "q455_wilcoxon_drift" ->
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS us, event_id,
                 CAST(round(value * 1e6) AS BIGINT) AS vm
               FROM events),
         h AS (SELECT user_id, vm,
                 CASE WHEN row_number() OVER (PARTITION BY user_id
                     ORDER BY us, event_id) * 2
                   <= count(*) OVER (PARTITION BY user_id)
                   THEN 1 ELSE 2 END AS half,
                 count(*) OVER (PARTITION BY user_id) AS n
               FROM ev),
         m AS (SELECT user_id, half,
                 ${sqlIdivHalfUp("sum(vm)", "count(*)")} AS mean_vm
               FROM h WHERE n >= 2 GROUP BY 1, 2),
         p0 AS (SELECT user_id,
                  max(CASE WHEN half = 1 THEN mean_vm END) AS m1,
                  max(CASE WHEN half = 2 THEN mean_vm END) AS m2
                FROM m GROUP BY 1),
         p AS (SELECT ${sqlIdivHalfUpSigned("m2 - m1", "1000")} AS dm
               FROM p0),
         pn AS (SELECT abs(dm)::BIGINT AS ad,
                  CASE WHEN dm > 0 THEN 1 ELSE -1 END AS sgn
                FROM p WHERE dm <> 0),
         g AS (SELECT ad, count(*)::BIGINT AS c FROM pn GROUP BY 1),
         r AS (SELECT ad,
                 2 * (sum(c) OVER (ORDER BY ad) - c) + c + 1 AS r2
               FROM g)
         SELECT count(*)::BIGINT AS n_pairs,
           coalesce(sum(CASE WHEN sgn > 0 THEN r2 ELSE 0 END),
             0)::BIGINT AS w_plus_x2,
           coalesce(sum(CASE WHEN sgn < 0 THEN r2 ELSE 0 END),
             0)::BIGINT AS w_minus_x2
         FROM pn JOIN r USING (ad)""",
    // q456: (epoch_day+4) calendar weeks, complete-week filter,
    // in-block count-of-smaller double-ranks, L in double units.
    "q456_page_trend" ->
      """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS ed,
                 count(*)::BIGINT AS cnt
               FROM events GROUP BY 1),
         d2 AS (SELECT (ed + 4) // 7 AS week, (ed + 4) % 7 AS wd, cnt
                FROM daily),
         cw AS (SELECT week FROM d2 GROUP BY 1 HAVING count(*) = 7),
         b AS (SELECT d2.* FROM d2 JOIN cw USING (week)),
         r AS (SELECT x.week, x.wd,
                 2 * sum(CASE WHEN y.cnt < x.cnt THEN 1 ELSE 0 END)
                   + sum(CASE WHEN y.cnt = x.cnt THEN 1 ELSE 0 END)
                   + 1 AS r2
               FROM b x JOIN b y USING (week)
               GROUP BY x.week, x.wd, x.cnt),
         a AS (SELECT count(DISTINCT week)::BIGINT AS n_weeks,
                 sum((wd + 1) * r2)::BIGINT AS l_x2
               FROM r)
         SELECT n_weeks, l_x2, (n_weeks * 224)::BIGINT AS e_l_x2,
           (l_x2 - n_weeks * 224)::BIGINT AS dev_x2
         FROM a""",
    // q457: rest counts from global-minus-own on the lang × value
    // product frame; weighted lower-median pick over distinct diffs.
    "q457_hodges_lehmann" ->
      """WITH l0 AS (SELECT lang, n_chars AS v FROM documents),
         g1 AS (SELECT lang, v, count(*)::BIGINT AS c1
                FROM l0 GROUP BY 1, 2),
         gv AS (SELECT v, count(*)::BIGINT AS ct FROM l0 GROUP BY 1),
         lg AS (SELECT DISTINCT lang FROM l0),
         g2 AS (SELECT lg.lang, gv.v AS w,
                  gv.ct - coalesce(o.c1, 0) AS c2
                FROM lg CROSS JOIN gv
                LEFT JOIN g1 o
                  ON o.lang = lg.lang AND o.v = gv.v),
         g2f AS (SELECT * FROM g2 WHERE c2 > 0),
         df AS (SELECT g1.lang, g1.v - g2f.w AS diff,
                  sum(g1.c1 * g2f.c2)::BIGINT AS wt
                FROM g1 JOIN g2f ON g1.lang = g2f.lang
                GROUP BY 1, 2),
         cum AS (SELECT lang, diff, wt,
                   sum(wt) OVER (PARTITION BY lang
                     ORDER BY diff) AS cw,
                   sum(wt) OVER (PARTITION BY lang) AS tot
                 FROM df),
         hl AS (SELECT lang, min(diff)::BIGINT AS hl_shift
                FROM cum WHERE cw * 2 >= tot GROUP BY 1),
         a AS (SELECT lang, max(tot)::BIGINT AS n_pairs,
                 min(diff)::BIGINT AS min_diff,
                 max(diff)::BIGINT AS max_diff
               FROM cum GROUP BY 1)
         SELECT a.lang, n_pairs, hl_shift, min_diff, max_diff
         FROM a JOIN hl USING (lang)""",
    // q458: two chained weighted lower-median picks (median, then
    // deviation) over per-lang value-domain cumsums.
    "q458_length_mad" ->
      """WITH g AS (SELECT lang, n_chars AS v, count(*)::BIGINT AS c
               FROM documents GROUP BY 1, 2),
         cum AS (SELECT lang, v, c,
                   sum(c) OVER (PARTITION BY lang ORDER BY v) AS cw,
                   sum(c) OVER (PARTITION BY lang) AS n
                 FROM g),
         med AS (SELECT lang, min(v)::BIGINT AS med,
                   max(n)::BIGINT AS n_docs
                 FROM cum WHERE cw * 2 >= n GROUP BY 1),
         dev AS (SELECT g.lang, abs(g.v - med.med) AS d,
                   sum(g.c)::BIGINT AS c
                 FROM g JOIN med USING (lang) GROUP BY 1, 2),
         dc AS (SELECT lang, d, c,
                  sum(c) OVER (PARTITION BY lang ORDER BY d) AS cw,
                  sum(c) OVER (PARTITION BY lang) AS n
                FROM dev),
         mad AS (SELECT lang, min(d)::BIGINT AS mad
                 FROM dc WHERE cw * 2 >= n GROUP BY 1)
         SELECT med.lang, med.n_docs, med.med AS median_len,
           mad.mad AS mad_len
         FROM med JOIN mad USING (lang)""",
    // q459: one shared pair derivation, three recursive-CTE
    // component censuses, unioned.
    "q459_percolation" -> {
      def tier(tag: String, t: String, permille: Int): String =
        s"""ed$tag AS (SELECT doc_a, doc_b FROM pr
               WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                 >= $t),
         n$tag AS (SELECT doc_a AS id FROM ed$tag
                   UNION SELECT doc_b FROM ed$tag),
         s$tag AS (SELECT doc_a AS a, doc_b AS b FROM ed$tag
                   UNION SELECT doc_b, doc_a FROM ed$tag),
         r$tag(a, b) AS (SELECT id, id FROM n$tag
                   UNION SELECT r.a, s.b
                   FROM r$tag r JOIN s$tag s ON r.b = s.a),
         l$tag AS (SELECT a AS id, min(b) AS label
                   FROM r$tag GROUP BY 1),
         z$tag AS (SELECT label, count(*)::BIGINT AS sz
                   FROM l$tag GROUP BY 1),
         row$tag AS (SELECT $permille::BIGINT AS threshold_permille,
                   coalesce(sum(sz), 0)::BIGINT AS n_nodes,
                   (SELECT count(*) FROM ed$tag)::BIGINT AS n_edges,
                   count(*)::BIGINT AS n_components,
                   coalesce(max(sz), 0)::BIGINT AS max_component
                 FROM z$tag)"""
      s"""WITH RECURSIVE $shinglesCte,
         e0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s
                FROM d WHERE len(sh) > 0),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*) AS inter,
                  any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
                FROM e0 a JOIN e0 b
                  ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         ${tier("3", "0.3", 300)},
         ${tier("5", "0.5", 500)},
         ${tier("7", "0.7", 700)},
         u AS (SELECT * FROM row3
               UNION ALL SELECT * FROM row5
               UNION ALL SELECT * FROM row7)
         SELECT threshold_permille, n_nodes, n_edges, n_components,
           max_component,
           ${sqlMicroRatio("max_component", "greatest(n_nodes, 1)")}
             AS giant_ppm
         FROM u"""
    },
    // q460: q445's oriented wedge machinery; each closed wedge
    // emits its three canonical edges; support-0 kept via left join.
    "q460_edge_support" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
               FROM lineitem),
         e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
               FROM op a JOIN op b USING (l_orderkey)
               WHERE a.l_partkey < b.l_partkey),
         d AS (SELECT n, count(*)::BIGINT AS deg FROM
                 (SELECT u AS n FROM e UNION ALL SELECT v FROM e)
               GROUP BY 1),
         o AS (SELECT CASE WHEN du.deg < dv.deg
                        OR (du.deg = dv.deg AND e.u < e.v)
                      THEN e.u ELSE e.v END AS src,
                      CASE WHEN du.deg < dv.deg
                        OR (du.deg = dv.deg AND e.u < e.v)
                      THEN e.v ELSE e.u END AS dst
               FROM e JOIN d du ON e.u = du.n
                      JOIN d dv ON e.v = dv.n),
         w AS (SELECT o1.src AS src, o1.dst AS x, o2.dst AS y
               FROM o o1 JOIN o o2
                 ON o1.src = o2.src AND o1.dst < o2.dst),
         t AS (SELECT src, x, y FROM w
               WHERE EXISTS (SELECT 1 FROM e
                 WHERE e.u = w.x AND e.v = w.y)),
         te AS (SELECT least(src, x) AS u, greatest(src, x) AS v
                FROM t
                UNION ALL SELECT least(src, y), greatest(src, y)
                FROM t
                UNION ALL SELECT x, y FROM t),
         sup AS (SELECT u, v, count(*)::BIGINT AS support
                 FROM te GROUP BY 1, 2)
         SELECT coalesce(sup.support, 0)::BIGINT AS support,
           count(*)::BIGINT AS n_edges
         FROM e LEFT JOIN sup USING (u, v) GROUP BY 1""",
    // q461: decile bounds via scalar value-domain picks, per-decile
    // lower-median q_micro.
    "q461_conditional_medians" -> {
      val bSel = (1 to 9)
        .map(dd =>
          s"(SELECT min(len) FROM cum WHERE cw * 10 >= n * $dd) " +
            s"AS b$dd")
        .mkString(", ")
      val caseSql = (1 to 9)
        .map(dd => s"WHEN len <= b$dd THEN $dd")
        .mkString(" ")
      s"""WITH $qMicroCte,
         base AS (SELECT d.n_chars AS len, q.q_micro AS q
                  FROM documents d JOIN qm q USING (doc_id)),
         g AS (SELECT len, count(*)::BIGINT AS c
               FROM base GROUP BY 1),
         cum AS (SELECT len, sum(c) OVER (ORDER BY len) AS cw,
                   (SELECT count(*) FROM base) AS n
                 FROM g),
         b AS (SELECT $bSel),
         wd AS (SELECT (CASE $caseSql ELSE 10 END)::BIGINT AS decile,
                  len, q
                FROM base, b),
         qg AS (SELECT decile, q, count(*)::BIGINT AS c
                FROM wd GROUP BY 1, 2),
         qc AS (SELECT decile, q,
                  sum(c) OVER (PARTITION BY decile ORDER BY q) AS cw,
                  sum(c) OVER (PARTITION BY decile) AS n
                FROM qg),
         mq AS (SELECT decile, min(q)::BIGINT AS med_q_micro
                FROM qc WHERE cw * 2 >= n GROUP BY 1),
         ls AS (SELECT decile, count(*)::BIGINT AS n_docs,
                  min(len)::BIGINT AS len_lo,
                  max(len)::BIGINT AS len_hi
                FROM wd GROUP BY 1)
         SELECT ls.decile, n_docs, len_lo, len_hi, med_q_micro
         FROM ls JOIN mq USING (decile)"""
    },
    // q462: 8-hour PAA sums, own-quartile symbols, 3-gram census.
    "q462_sax_motifs" ->
      """WITH hourly AS (SELECT epoch_us(ts) // 3600000000 AS hr,
                 count(*)::BIGINT AS cnt
               FROM events GROUP BY 1),
         hh AS (SELECT hr - (SELECT min(hr) FROM hourly) AS h, cnt
                FROM hourly),
         seg AS (SELECT h // 8 AS w, sum(cnt)::BIGINT AS s
                 FROM hh WHERE h < 512 GROUP BY 1),
         g AS (SELECT s, count(*)::BIGINT AS c FROM seg GROUP BY 1),
         cum AS (SELECT s, sum(c) OVER (ORDER BY s) AS cw,
                   (SELECT count(*) FROM seg) AS n
                 FROM g),
         b AS (SELECT
             (SELECT min(s) FROM cum WHERE cw * 4 >= n * 1) AS q1,
             (SELECT min(s) FROM cum WHERE cw * 4 >= n * 2) AS q2,
             (SELECT min(s) FROM cum WHERE cw * 4 >= n * 3) AS q3),
         sym AS (SELECT w,
                   CASE WHEN s <= q1 THEN 0
                        WHEN s <= q2 THEN 1
                        WHEN s <= q3 THEN 2
                        ELSE 3 END AS sym
                 FROM seg, b),
         tri AS (SELECT sym::VARCHAR
                   || lead(sym) OVER (ORDER BY w)::VARCHAR
                   || lead(sym, 2) OVER (ORDER BY w)::VARCHAR
                   AS motif
                 FROM sym)
         SELECT motif, count(*)::BIGINT AS n_occurrences
         FROM tri WHERE motif IS NOT NULL GROUP BY 1""",
    // q463: per-width shingle CTEs over one shared tokenize, pair
    // inversions, scalar census rows unioned.
    "q463_shingle_sweep" -> {
      def gram(w: Int): String =
        (1 to w).map(k => s"toks[i+$k]").mkString(" || ' ' || ")
      def tier(w: Int): String =
        s"""d$w AS (SELECT doc_id,
             list_distinct(list_transform(range(len(toks) - ${w - 1}),
               i -> ${gram(w)})) AS sh
           FROM t WHERE len(toks) >= $w),
         e$w AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s
                 FROM d$w WHERE len(sh) > 0),
         p$w AS (SELECT a.doc_id AS da, b.doc_id AS db,
                   count(*) AS inter,
                   any_value(a.n_sh) AS na, any_value(b.n_sh) AS nb
                 FROM e$w a JOIN e$w b
                   ON a.s = b.s AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
         r$w AS (SELECT $w::BIGINT AS shingle_w,
             (SELECT count(*) FROM d$w
                WHERE len(sh) > 0)::BIGINT AS n_docs,
             (SELECT count(DISTINCT s) FROM e$w)::BIGINT
               AS n_shingles,
             (SELECT count(*) FROM p$w)::BIGINT AS n_pairs_any,
             (SELECT count(*) FROM p$w
                WHERE round(inter::DOUBLE / (na + nb - inter), 6)
                  >= 0.5)::BIGINT AS n_pairs_j05)"""
      s"""WITH t AS (SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+')
             END AS toks
           FROM documents),
         ${tier(2)},
         ${tier(3)},
         ${tier(4)}
         SELECT * FROM r2
         UNION ALL SELECT * FROM r3
         UNION ALL SELECT * FROM r4"""
    },
    // q464: per-source P5/P95 picks, clip, exact half-up milli means.
    "q464_winsorized_mean" ->
      s"""WITH lens AS (SELECT source, n_chars AS v FROM documents),
         g AS (SELECT source, v, count(*)::BIGINT AS c
               FROM lens GROUP BY 1, 2),
         cum AS (SELECT source, v,
                   sum(c) OVER (PARTITION BY source ORDER BY v) AS cw,
                   sum(c) OVER (PARTITION BY source) AS n
                 FROM g),
         p5 AS (SELECT source, min(v)::BIGINT AS p5 FROM cum
                WHERE cw * 20 >= n * 1 GROUP BY 1),
         p95 AS (SELECT source, min(v)::BIGINT AS p95 FROM cum
                 WHERE cw * 20 >= n * 19 GROUP BY 1),
         cl AS (SELECT l.source, l.v,
                  greatest(p5.p5, least(p95.p95, l.v)) AS cv,
                  p5.p5 AS p5, p95.p95 AS p95
                FROM lens l JOIN p5 USING (source)
                            JOIN p95 USING (source))
         SELECT source, count(*)::BIGINT AS n_docs,
           max(p5)::BIGINT AS p5_len,
           max(p95)::BIGINT AS p95_len,
           ${sqlIdivHalfUp("1000 * sum(v)", "count(*)")}
             AS raw_mean_milli,
           ${sqlIdivHalfUp("1000 * sum(cv)", "count(*)")}
             AS wins_mean_milli
         FROM cl GROUP BY 1""",
    // q465: recursive BFS from min(id), lvl-capped at 20, UNION
    // dedup on (id, lvl), min level per node, unreached at -1.
    "q465_bfs_levels" ->
      """WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey, l_partkey
               FROM lineitem),
         e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
               FROM op a JOIN op b USING (l_orderkey)
               WHERE a.l_partkey < b.l_partkey),
         sym AS (SELECT u AS src, v AS dst FROM e
                 UNION ALL SELECT v, u FROM e),
         nodes AS (SELECT DISTINCT src AS id FROM sym),
         seed AS (SELECT min(id) AS s FROM nodes),
         walk(id, lvl) AS (
           SELECT s, 0::BIGINT FROM seed
           UNION
           SELECT sym.dst, w.lvl + 1 FROM walk w
           JOIN sym ON w.id = sym.src WHERE w.lvl < 20),
         lv AS (SELECT id, min(lvl) AS lvl FROM walk GROUP BY 1)
         SELECT coalesce(lv.lvl, -1)::BIGINT AS lvl,
           count(*)::BIGINT AS n_nodes
         FROM nodes LEFT JOIN lv USING (id) GROUP BY 1""",
    // q466: occurrence-counted canonical bigram pairs >= 3,
    // string-label transitive closure, island census.
    "q466_lexicon_islands" ->
      s"""WITH RECURSIVE t AS (SELECT
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+')
             END AS toks
           FROM documents),
         bg AS (SELECT unnest(list_transform(range(len(toks) - 1),
                  i -> {'w1': toks[i+1], 'w2': toks[i+2]})) AS g
                FROM t WHERE len(toks) >= 2),
         p AS (SELECT least(g.w1, g.w2) AS a,
                 greatest(g.w1, g.w2) AS b
               FROM bg WHERE g.w1 <> g.w2
               GROUP BY 1, 2 HAVING count(*) >= 3),
         n AS (SELECT a AS w FROM p UNION SELECT b FROM p),
         sym AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
         reach(a, b) AS (
           SELECT w, w FROM n
           UNION
           SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         lab AS (SELECT a, min(b) AS label FROM reach GROUP BY 1),
         sz AS (SELECT label, count(*)::BIGINT AS sz
                FROM lab GROUP BY 1),
         agg AS (SELECT coalesce(sum(sz), 0)::BIGINT AS n_tokens,
                   count(*)::BIGINT AS n_islands,
                   coalesce(max(sz), 0)::BIGINT AS max_island
                 FROM sz),
         ne AS (SELECT count(*)::BIGINT AS n_edges FROM p)
         SELECT n_tokens, n_edges, n_islands, max_island,
           ${sqlMicroRatio("max_island", "greatest(n_tokens, 1)")}
             AS giant_ppm
         FROM agg, ne""",
    // q467: one 16-hash signature; k = 4/8 read its prefixes; errors
    // vs the exact integer-micro Jaccard on the J >= 0.3 pair set.
    "q467_minhash_k_sweep" -> {
      def agreeSql(k: Int): String =
        s"len(list_filter(range($k), i -> mh_a[i+1] = mh_b[i+1]))" +
          "::BIGINT"
      s"""WITH $shinglesCte,
         m AS (SELECT doc_id, sh,
                 list_transform(range(16), i ->
                   list_min(list_transform(sh, s ->
                     ('0x' || substr(md5(i || ':' || s), 1, 15))
                       ::BIGINT))) AS mh
               FROM d WHERE len(sh) > 0),
         e0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s
                FROM d WHERE len(sh) > 0),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*) AS inter,
                  any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
                FROM e0 a JOIN e0 b
                  ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         pe AS (SELECT doc_a, doc_b,
                  ${sqlIdivHalfUp("1000000 * inter",
          "(n_a + n_b - inter)")} AS exact_micro
                FROM pr),
         pf AS (SELECT pe.exact_micro, a.mh AS mh_a, b.mh AS mh_b
                FROM pe JOIN m a ON pe.doc_a = a.doc_id
                        JOIN m b ON pe.doc_b = b.doc_id
                WHERE pe.exact_micro >= 300000),
         ek AS (SELECT 4::BIGINT AS k, ${agreeSql(4)} AS agree,
                  exact_micro FROM pf
                UNION ALL SELECT 8, ${agreeSql(8)}, exact_micro
                FROM pf
                UNION ALL SELECT 16, ${agreeSql(16)}, exact_micro
                FROM pf),
         er AS (SELECT k,
                  abs(${sqlIdivHalfUp("1000000 * agree", "k")}
                    - exact_micro) AS err
                FROM ek)
         SELECT k, count(*)::BIGINT AS n_pairs,
           ${sqlIdivHalfUp("sum(err)", "count(*)")}
             AS mean_abs_err_micro,
           max(err)::BIGINT AS max_abs_err_micro
         FROM er GROUP BY 1"""
    },
    // q468: the q49 md5 bucket mod 5; per-stratum fold envelope.
    "q468_kfold_balance" ->
      """WITH f AS (SELECT source, lang,
                 ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))
                   ::BIGINT % 5 AS fold
               FROM documents),
         g AS (SELECT source, lang, fold, count(*)::BIGINT AS n
               FROM f GROUP BY 1, 2, 3)
         SELECT source, lang, sum(n)::BIGINT AS n_docs,
           count(*)::BIGINT AS n_folds_hit,
           min(n)::BIGINT AS min_fold_n,
           max(n)::BIGINT AS max_fold_n,
           (max(n) - min(n))::BIGINT AS spread
         FROM g GROUP BY 1, 2""",
    // q469: per-price best size, cumulative max over the price
    // domain; frontier = strict increases of the cummax.
    "q469_skyline" ->
      """WITH pts AS (SELECT
             CAST(round(p_retailprice * 100) AS BIGINT)
               AS price_cents,
             p_size::BIGINT AS size, count(*)::BIGINT AS n_parts
           FROM part GROUP BY 1, 2),
         best AS (SELECT price_cents, max(size)::BIGINT AS size
                  FROM pts GROUP BY 1),
         fr AS (SELECT price_cents, size,
                  max(size) OVER (ORDER BY price_cents) AS m,
                  max(size) OVER (ORDER BY price_cents
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING) AS mprev
                FROM best)
         SELECT fr.price_cents, fr.size, pts.n_parts
         FROM fr JOIN pts ON fr.price_cents = pts.price_cents
           AND fr.size = pts.size
         WHERE fr.size = fr.m
           AND (fr.mprev IS NULL OR fr.size > fr.mprev)""",
    // q470: (epoch_day+4) mod 7 weekend cells, span split at
    // min_day + 15, exact micro means, DiD from the wide row.
    "q470_weekend_did" -> {
      def cellSql(we: String, h2: String, n: String, m: String) = {
        val p = s"($we is_weekend AND $h2 is_h2)"
        s"""sum(CASE WHEN $p THEN 1 ELSE 0 END)::BIGINT AS $n,
           ${sqlIdivHalfUp(
            s"sum(CASE WHEN $p THEN vm ELSE 0 END)",
            s"greatest(sum(CASE WHEN $p THEN 1 ELSE 0 END), 1)"
          )} AS $m"""
      }
      s"""WITH ev AS (SELECT epoch_us(ts) // 86400000000 AS ed,
                 CAST(round(value * 1e6) AS BIGINT) AS vm
               FROM events),
         t AS (SELECT ((ed + 4) % 7) IN (0, 6) AS is_weekend,
                 ed >= (SELECT min(ed) FROM ev) + 15 AS is_h2, vm
               FROM ev),
         a AS (SELECT
             ${cellSql("NOT", "NOT", "n_wd_h1", "m_wd_h1")},
             ${cellSql("NOT", "", "n_wd_h2", "m_wd_h2")},
             ${cellSql("", "NOT", "n_we_h1", "m_we_h1")},
             ${cellSql("", "", "n_we_h2", "m_we_h2")}
           FROM t)
         SELECT n_wd_h1, m_wd_h1, n_wd_h2, m_wd_h2,
           n_we_h1, m_we_h1, n_we_h2, m_we_h2,
           ((m_we_h2 - m_we_h1) - (m_wd_h2 - m_wd_h1))::BIGINT
             AS did_micro
         FROM a"""
    },
    // q471: epoch-aligned 8h window counts (the stream's state),
    // own-quartile symbols, per-symbol window and event mass.
    "q471_stream_sax" ->
      """WITH w AS (SELECT epoch_us(ts) // 28800000000 AS ws,
                 count(*)::BIGINT AS s
               FROM events GROUP BY 1),
         g AS (SELECT s, count(*)::BIGINT AS c FROM w GROUP BY 1),
         cum AS (SELECT s, sum(c) OVER (ORDER BY s) AS cw,
                   (SELECT count(*) FROM w) AS n
                 FROM g),
         b AS (SELECT
             (SELECT min(s) FROM cum WHERE cw * 4 >= n * 1) AS q1,
             (SELECT min(s) FROM cum WHERE cw * 4 >= n * 2) AS q2,
             (SELECT min(s) FROM cum WHERE cw * 4 >= n * 3) AS q3),
         sy AS (SELECT CASE WHEN s <= q1 THEN 0
                            WHEN s <= q2 THEN 1
                            WHEN s <= q3 THEN 2
                            ELSE 3 END AS sym, s
                FROM w, b)
         SELECT sym::BIGINT AS sym, count(*)::BIGINT AS n_windows,
           sum(s)::BIGINT AS n_events
         FROM sy GROUP BY 1""",
    // q472: 0-based positions via the list_transform index pattern;
    // heaviest decile via (o DESC, d ASC); absent cells add n².
    "q472_positional_skew" ->
      s"""WITH t AS (SELECT
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+')
             END AS toks
           FROM documents),
         occ AS (SELECT u.w AS w, (u.i * 10) // x.len AS d
                 FROM (SELECT len(toks) AS len,
                         unnest(list_transform(range(len(toks)),
                           i -> {'w': toks[i+1], 'i': i})) AS u
                       FROM t) x),
         top AS (SELECT w, count(*)::BIGINT AS n_occ
                 FROM occ GROUP BY 1
                 ORDER BY n_occ DESC, w ASC LIMIT 20),
         cells AS (SELECT occ.w, occ.d, count(*)::BIGINT AS o,
                     any_value(top.n_occ) AS n_occ
                   FROM occ JOIN top ON occ.w = top.w
                   GROUP BY 1, 2),
         hv AS (SELECT w, n_occ, d AS top_decile, o
                FROM (SELECT *, row_number() OVER (PARTITION BY w
                        ORDER BY o DESC, d ASC) AS rn
                      FROM cells) x
                WHERE rn = 1),
         dv AS (SELECT w, max(n_occ)::BIGINT AS n_occ,
                  sum((o * 10 - n_occ) * (o * 10 - n_occ))::BIGINT
                    AS s_present,
                  count(*)::BIGINT AS n_cells
                FROM cells GROUP BY 1)
         SELECT hv.w AS token, hv.n_occ,
           hv.top_decile::BIGINT AS top_decile,
           ${sqlMicroRatio("hv.o", "hv.n_occ")} AS top_decile_ppm,
           ${sqlIdivHalfUp(
          "100 * (dv.s_present + (10 - dv.n_cells) " +
            "* dv.n_occ * dv.n_occ)",
          "dv.n_occ"
        )} AS uniform_dev_milli
         FROM hv JOIN dv USING (w)""",
    // q473: min-label closure gives (id, label); BFS walk seeded at
    // the labels; per-cluster max hop; radius census.
    "q473_cluster_radius" ->
      s"""WITH RECURSIVE $shinglesCte,
         e0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s
                FROM d WHERE len(sh) > 0),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*) AS inter,
                  any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
                FROM e0 a JOIN e0 b
                  ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         p AS (SELECT doc_a, doc_b FROM pr
               WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6)
                 >= 0.5),
         sym AS (SELECT doc_a AS a, doc_b AS b FROM p
                 UNION SELECT doc_b, doc_a FROM p),
         nd AS (SELECT DISTINCT a AS id FROM sym),
         reach(a, b) AS (
           SELECT id, id FROM nd
           UNION
           SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         lab AS (SELECT a AS id, min(b) AS label
                 FROM reach GROUP BY 1),
         seeds AS (SELECT DISTINCT label AS id FROM lab),
         walk(id, lvl) AS (
           SELECT id, 0::BIGINT FROM seeds
           UNION
           SELECT s.b, w.lvl + 1 FROM walk w
           JOIN sym s ON w.id = s.a WHERE w.lvl < 20),
         lv AS (SELECT id, min(lvl) AS lvl FROM walk GROUP BY 1),
         r AS (SELECT lab.label, max(lv.lvl) AS radius,
                 count(*)::BIGINT AS n_docs
               FROM lab JOIN lv USING (id) GROUP BY 1)
         SELECT radius::BIGINT AS radius,
           count(*)::BIGINT AS n_clusters,
           sum(n_docs)::BIGINT AS n_docs
         FROM r GROUP BY 1""",
    // q474: the identical bounded peel — e1 = 3-truss (one exact
    // round), e2..e5 = four peel-below-2 rounds; classes read the
    // same three edge-set counts as Spark's boundedTrussClasses.
    "q474_truss_classes" ->
      s"""${trussPeelCtes(4)}
         SELECT 2::BIGINT AS truss_k,
           ((SELECT count(*) FROM e0)
             - (SELECT count(*) FROM e1))::BIGINT AS n_edges
         UNION ALL
         SELECT 3::BIGINT,
           ((SELECT count(*) FROM e1)
             - (SELECT count(*) FROM e5))::BIGINT
         UNION ALL
         SELECT 4::BIGINT, (SELECT count(*) FROM e5)::BIGINT""",
    // q475: the LP chain's final labels rolled to the size histogram.
    "q475_lp_communities" ->
      s"""WITH $lpChainCtes,
         sz AS (SELECT lab, count(*)::BIGINT AS community_size
                FROM l3 GROUP BY 1)
         SELECT community_size, count(*)::BIGINT AS n_communities
         FROM sz GROUP BY 1""",
    // q476: naive O(n²) eps-join (oracle-scale only; Spark prunes by
    // grid cell), deg→core, recursive min-label reach over core-core
    // edges, border = min core-neighbor label, noise remainder row.
    "q476_dbscan_grid" ->
      s"""WITH RECURSIVE
         pts AS (SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
                   CAST(embedding[2] AS DOUBLE) AS y FROM embeddings),
         pr AS MATERIALIZED (SELECT a.vec_id AS i, b.vec_id AS j
              FROM pts a JOIN pts b ON a.vec_id < b.vec_id
                AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)
                  <= 0.000244140625),
         deg AS (SELECT id, count(*) AS n FROM
                  (SELECT i AS id FROM pr UNION ALL SELECT j FROM pr) t
                 GROUP BY 1),
         core AS MATERIALIZED (SELECT id FROM deg WHERE n >= 4),
         ce AS MATERIALIZED (SELECT i, j FROM pr
              WHERE i IN (SELECT id FROM core)
                AND j IN (SELECT id FROM core)),
         csym AS (SELECT i AS a, j AS b FROM ce
                  UNION ALL SELECT j, i FROM ce),
         reach(a, b) AS (
           SELECT id, id FROM core
           UNION
           SELECT r.a, s.b FROM reach r JOIN csym s ON r.b = s.a),
         clab AS MATERIALIZED (SELECT a AS id, min(b) AS label
                FROM reach GROUP BY 1),
         sym AS (SELECT i AS a, j AS b FROM pr
                 UNION ALL SELECT j, i FROM pr),
         bl AS (SELECT s.a, min(c.label) AS label
                FROM sym s JOIN clab c ON s.b = c.id
                WHERE s.a NOT IN (SELECT id FROM core) GROUP BY 1),
         cl AS (SELECT label AS cluster, count(*)::BIGINT AS n_core
                FROM clab GROUP BY 1),
         bc AS (SELECT label AS cluster, count(*)::BIGINT AS n_border
                FROM bl GROUP BY 1),
         rws AS MATERIALIZED (
           SELECT cl.cluster, cl.n_core,
             coalesce(bc.n_border, 0)::BIGINT AS n_border
           FROM cl LEFT JOIN bc USING (cluster))
         SELECT cluster::BIGINT AS cluster, n_core, n_border FROM rws
         UNION ALL
         SELECT -1::BIGINT, 0::BIGINT,
           ((SELECT count(*) FROM pts)
             - (SELECT coalesce(sum(n_core + n_border), 0)
                FROM rws))::BIGINT""",
    // q477: the integer HITS rounds; final scores per node.
    "q477_hits_copyflow" ->
      s"""WITH $hitsCtes
         SELECT n.id AS doc_id, a4.s AS auth_score, h4.s AS hub_score
         FROM n JOIN a4 ON n.id = a4.id JOIN h4 ON n.id = h4.id""",
    // q478: LP labels onto both edge endpoints; per-community e_in /
    // deg_sum / members and the exact-integer Newman contribution.
    "q478_lp_modularity" ->
      s"""WITH $lpChainCtes,
         el AS MATERIALIZED (SELECT la.lab AS la, lb.lab AS lb
              FROM p JOIN l3 la ON p.doc_a = la.id
                     JOIN l3 lb ON p.doc_b = lb.id),
         mm AS (SELECT count(*)::BIGINT AS m FROM el),
         ein AS (SELECT la AS community, count(*)::BIGINT AS e_in
                 FROM el WHERE la = lb GROUP BY 1),
         ds AS (SELECT community, count(*)::BIGINT AS deg_sum FROM
                 (SELECT la AS community FROM el
                  UNION ALL SELECT lb FROM el) t
                GROUP BY 1),
         mem AS (SELECT lab AS community, count(*)::BIGINT AS n_members
                 FROM l3 GROUP BY 1)
         SELECT community, n_members,
           coalesce(e_in, 0)::BIGINT AS e_in,
           coalesce(deg_sum, 0)::BIGINT AS deg_sum,
           ${sqlIdivHalfUpSigned(
          "(4*mm.m*coalesce(e_in, 0) - coalesce(deg_sum, 0)*coalesce(deg_sum, 0))*1000000",
          "4*mm.m*mm.m")} AS q_contrib_micro
         FROM mem
         LEFT JOIN ds USING (community)
         LEFT JOIN ein USING (community), mm""",
    // q479: the identical strictly-after min chain; step-over-step
    // conversion ppm with the greatest(·,1) zero-denominator guard.
    "q479_ordered_funnel" ->
      s"""WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY 1),
         t2 AS (SELECT e.user_id, min(e.ts) AS t2
              FROM events e JOIN t1 ON e.user_id = t1.user_id
                AND e.ts > t1.t1
              WHERE e.event_type = 'click' GROUP BY 1),
         t3 AS (SELECT e.user_id, min(e.ts) AS t3
              FROM events e JOIN t2 ON e.user_id = t2.user_id
                AND e.ts > t2.t2
              WHERE e.event_type = 'purchase' GROUP BY 1),
         c AS (SELECT
             (SELECT count(DISTINCT user_id) FROM events) AS n0,
             (SELECT count(*) FROM t1) AS n1,
             (SELECT count(*) FROM t2) AS n2,
             (SELECT count(*) FROM t3) AS n3)
         SELECT '0_users' AS step, n0::BIGINT AS n_users,
           1000000::BIGINT AS conv_ppm FROM c
         UNION ALL SELECT '1_view', n1::BIGINT,
           ${sqlMicroRatio("n1", "greatest(n0, 1)")} FROM c
         UNION ALL SELECT '2_click', n2::BIGINT,
           ${sqlMicroRatio("n2", "greatest(n1, 1)")} FROM c
         UNION ALL SELECT '3_purchase', n3::BIGINT,
           ${sqlMicroRatio("n3", "greatest(n2, 1)")} FROM c""",
    // q480: min-label reach over the same sym graph = the CC labels;
    // LP labels from the shared chain; two rollups.
    "q480_partition_fragmentation" ->
      s"""WITH RECURSIVE $lpChainCtes,
         nd AS (SELECT DISTINCT a AS id FROM sym),
         reach(a, b) AS (
           SELECT id, id FROM nd
           UNION
           SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         cc AS (SELECT a AS id, min(b) AS component
                FROM reach GROUP BY 1),
         f AS (SELECT cc.component,
                 count(DISTINCT l3.lab)::BIGINT AS n_lp_communities,
                 count(*)::BIGINT AS n_members
               FROM cc JOIN l3 ON cc.id = l3.id
               GROUP BY 1)
         SELECT n_lp_communities,
           count(*)::BIGINT AS n_components,
           sum(n_members)::BIGINT AS n_docs
         FROM f GROUP BY 1""",
    // q481: three unrolled greedy rounds over the DISTINCT
    // (source, shingle) frame, (gain DESC, source ASC) argmax.
    "q481_greedy_source_cover" ->
      s"""WITH $shinglesCte,
         sp AS MATERIALIZED (
           SELECT DISTINCT d2.source, x.s
           FROM (SELECT doc_id, unnest(sh) AS s FROM d) x
           JOIN documents d2 USING (doc_id)),
         g1 AS (SELECT source, count(*) AS g FROM sp GROUP BY 1),
         p1 AS MATERIALIZED (SELECT source, g FROM g1
               ORDER BY g DESC, source ASC LIMIT 1),
         c1 AS MATERIALIZED (SELECT DISTINCT s FROM sp
               WHERE source IN (SELECT source FROM p1)),
         g2 AS (SELECT source, count(*) AS g FROM sp
               WHERE source NOT IN (SELECT source FROM p1)
                 AND s NOT IN (SELECT s FROM c1)
               GROUP BY 1),
         p2 AS MATERIALIZED (SELECT source, g FROM g2
               ORDER BY g DESC, source ASC LIMIT 1),
         c2 AS MATERIALIZED (
           SELECT s FROM c1
           UNION
           SELECT s FROM sp WHERE source IN (SELECT source FROM p2)),
         g3 AS (SELECT source, count(*) AS g FROM sp
               WHERE source NOT IN (SELECT source FROM p1)
                 AND source NOT IN (SELECT source FROM p2)
                 AND s NOT IN (SELECT s FROM c2)
               GROUP BY 1),
         p3 AS MATERIALIZED (SELECT source, g FROM g3
               ORDER BY g DESC, source ASC LIMIT 1),
         c3 AS MATERIALIZED (
           SELECT s FROM c2
           UNION
           SELECT s FROM sp WHERE source IN (SELECT source FROM p3))
         SELECT 1::BIGINT AS round, source, g::BIGINT AS gain,
           (SELECT count(*) FROM c1)::BIGINT AS cum_covered FROM p1
         UNION ALL SELECT 2::BIGINT, source, g::BIGINT,
           (SELECT count(*) FROM c2)::BIGINT FROM p2
         UNION ALL SELECT 3::BIGINT, source, g::BIGINT,
           (SELECT count(*) FROM c3)::BIGINT FROM p3""",
    // q484: the identical bottom-k sample — ORDER BY (hash60 key,
    // value) LIMIT 256 per group replays the sketch's kept multiset
    // exactly — next to the exact rank-window five-point; quantile
    // rank is ceil(q·n) = (q-scaled + adjust) // denom in BIGINTs.
    "q484_quantile_sketch" ->
      """WITH h AS (SELECT l_returnflag AS grp,
             ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_'
                || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT AS h,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS v
           FROM lineitem),
         sel AS (SELECT grp, v, row_number() OVER
               (PARTITION BY grp ORDER BY h, v) AS rn FROM h),
         samp AS (SELECT grp, list_sort(list(v)) AS vals,
               count(*)::BIGINT AS j
             FROM sel WHERE rn <= 256 GROUP BY grp),
         ex AS (SELECT grp, v,
             row_number() OVER (PARTITION BY grp ORDER BY v) AS rv,
             count(*) OVER (PARTITION BY grp) AS n FROM h),
         exact AS (SELECT grp, any_value(n)::BIGINT AS n,
             max(CASE WHEN rv = 1 THEN v END) AS exact_min,
             max(CASE WHEN rv = (n+3)//4 THEN v END) AS exact_p25,
             max(CASE WHEN rv = (n+1)//2 THEN v END) AS exact_p50,
             max(CASE WHEN rv = (3*n+3)//4 THEN v END) AS exact_p75,
             max(CASE WHEN rv = n THEN v END) AS exact_max
           FROM ex GROUP BY grp)
         SELECT e.grp AS l_returnflag, e.n, s.j,
           e.exact_min, e.exact_p25, e.exact_p50, e.exact_p75,
           e.exact_max,
           s.vals[1] AS est_min,
           s.vals[((s.j+3)//4)::INT] AS est_p25,
           s.vals[((s.j+1)//2)::INT] AS est_p50,
           s.vals[((3*s.j+3)//4)::INT] AS est_p75,
           s.vals[s.j::INT] AS est_max
         FROM samp s JOIN exact e ON s.grp = e.grp""",
    // q483: the identical 8 personalized power-iteration rounds —
    // teleport (1.0-0.85)/k over the q73 seed set (5-gram eval
    // overlap, restricted to graph nodes), ranks carried sparsely
    // (only reached nodes, stitched by FULL JOIN with the teleport).
    "q483_contamination_ppr" -> {
      val pprCtes = (1 to 8)
        .map(i => s"""c$i AS (
           SELECT s.b AS node, 0.85 * sum(p.r / dg.d) AS cs
           FROM sym s
           JOIN p${i - 1} p ON s.a = p.node
           JOIN deg dg ON s.a = dg.a
           GROUP BY s.b),
         p$i AS MATERIALIZED (
           SELECT coalesce(c.node, t.node) AS node,
             coalesce(c.cs, 0) + coalesce(t.t, 0) AS r
           FROM c$i c
           FULL JOIN (SELECT id AS node,
               (1.0 - 0.85) / (SELECT k FROM ns) AS t FROM seeds) t
             ON c.node = t.node)""")
        .mkString(",\n         ")
      s"""WITH $shinglesCte,
         e0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
                WHERE len(sh) > 0),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  count(*) AS inter,
                  any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
                FROM e0 a JOIN e0 b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         ed AS (SELECT doc_a, doc_b FROM pr
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6) >= 0.05),
         sym AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM ed
                 UNION ALL SELECT doc_b, doc_a FROM ed),
         deg AS MATERIALIZED (SELECT a, count(*) AS d FROM sym GROUP BY a),
         d5 AS (
           SELECT doc_id,
             list_distinct(list_transform(range(len(toks) - 4),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                 || ' ' || toks[i+4] || ' ' || toks[i+5])) AS sh
           FROM (SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
                 FROM documents) t
           WHERE len(toks) >= 5),
         ev5 AS (SELECT unnest(sh) AS s, doc_id AS eval_id FROM d5
                WHERE doc_id % 50 = 0),
         tr5 AS (SELECT doc_id, unnest(sh) AS s FROM d5
                WHERE doc_id % 50 <> 0),
         cont AS (SELECT DISTINCT tr5.doc_id FROM tr5
                JOIN ev5 ON tr5.s = ev5.s),
         seeds AS MATERIALIZED (SELECT doc_id AS id FROM cont
                WHERE doc_id IN (SELECT a FROM deg)),
         ns AS (SELECT count(*) AS k FROM seeds),
         p0 AS (SELECT id AS node, 1.0 / (SELECT k FROM ns) AS r
                FROM seeds),
         $pprCtes
         SELECT node AS doc_id, round(r, 6) AS rank FROM p8"""
    },
    // q486: the q484 sample side — the terminal streaming state IS
    // the batch sketch (merge law), so the oracle is identical.
    "q486_stream_quantile" ->
      """WITH h AS (SELECT l_returnflag AS grp,
             ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_'
                || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT AS h,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS v
           FROM lineitem),
         sel AS (SELECT grp, v, row_number() OVER
               (PARTITION BY grp ORDER BY h, v) AS rn FROM h),
         samp AS (SELECT grp, list_sort(list(v)) AS vals,
               count(*)::BIGINT AS j
             FROM sel WHERE rn <= 256 GROUP BY grp)
         SELECT grp AS l_returnflag, j,
           vals[1] AS est_min,
           vals[((j+3)//4)::INT] AS est_p25,
           vals[((j+1)//2)::INT] AS est_p50,
           vals[((3*j+3)//4)::INT] AS est_p75,
           vals[j::INT] AS est_max
         FROM samp""",
    // q485: the identical 3 levels × 3 unconditional peel rounds;
    // class counts as level-boundary differences.
    "q485_coreness_census" ->
      s"""${corenessCtes(4, 3)}
         SELECT core_k, n_nodes FROM core_rows""",
    // q482: the identical 6 unrolled batch-peel rounds; is_best
    // decided on the emitted micro value (density DESC, round ASC)
    // exactly as the Spark driver does.
    "q482_densest_subgraph" ->
      s"""${densestPeelCtes(6)}
         SELECT round, n_nodes, n_edges, density_micro,
           (CASE WHEN row_number() OVER
              (ORDER BY density_micro DESC, round ASC) = 1
            THEN 1 ELSE 0 END)::BIGINT AS is_best
         FROM peel_scored""",
    // q487: the identical canonical edge set and a<b<c triangle
    // enumeration (the q474 oracle's t0), credited to all three
    // corners; lcc in half-up micro units, bucket = lcc div 1e4.
    "q487_clustering_census" ->
      s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
           FROM lineitem),
         e0 AS MATERIALIZED (
           SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM op a JOIN op b USING (l_orderkey)
           WHERE a.l_partkey < b.l_partkey),
         t0 AS (SELECT x1.u AS a, x1.v AS b, x2.v AS c
           FROM e0 x1 JOIN e0 x2 ON x1.v = x2.u
           JOIN e0 x3 ON x3.u = x1.u AND x3.v = x2.v),
         tn AS (SELECT id, count(*) AS tri FROM
             (SELECT a AS id FROM t0 UNION ALL SELECT b FROM t0
              UNION ALL SELECT c FROM t0) z
           GROUP BY 1),
         dd AS (SELECT id, count(*) AS dg FROM
             (SELECT u AS id FROM e0 UNION ALL SELECT v FROM e0) z
           GROUP BY 1),
         l AS (SELECT dd.dg AS dg, coalesce(tn.tri, 0) AS tri,
             CASE WHEN dd.dg < 2 THEN 0
                  ELSE ${sqlMicroRatio(
          "2 * coalesce(tn.tri, 0)",
          "dd.dg * (dd.dg - 1)")}
             END AS lcc
           FROM dd LEFT JOIN tn ON dd.id = tn.id)
         SELECT (lcc // 10000)::BIGINT AS bucket,
           count(*)::BIGINT AS n_nodes,
           coalesce(sum(tri), 0)::BIGINT AS tri_total
         FROM l GROUP BY 1""",
    // q488: the q208 pair-graph prefix at the 0.02 weak threshold;
    // wedge arms joined through the center with its degree, RA terms
    // summed as exact half-up integer divisions, non-edges kept by
    // the null-probe left join, the identical total order + LIMIT.
    "q488_linkpred_candidates" ->
      s"""WITH $shinglesCte,
         e0 AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s
           FROM d WHERE len(sh) > 0),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS inter,
             any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
           FROM e0 a JOIN e0 b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pr AS MATERIALIZED (SELECT doc_a, doc_b FROM p
           WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6) >= 0.02),
         sym AS MATERIALIZED (SELECT doc_a AS ctr, doc_b AS nbr FROM pr
           UNION ALL SELECT doc_b, doc_a FROM pr),
         dg AS MATERIALIZED (SELECT ctr AS id, count(*) AS dg
           FROM sym GROUP BY 1),
         w AS (SELECT x.nbr AS doc_a, y.nbr AS doc_b, dc.dg AS dgc
           FROM sym x JOIN sym y ON x.ctr = y.ctr AND x.nbr < y.nbr
           JOIN dg dc ON dc.id = x.ctr),
         cn AS (SELECT doc_a, doc_b, count(*) AS cn,
             sum(${sqlIdivHalfUp("1000000", "dgc")}) AS ra
           FROM w GROUP BY 1, 2),
         opn AS (SELECT cn.doc_a, cn.doc_b, cn.cn, cn.ra FROM cn
           LEFT JOIN pr ON cn.doc_a = pr.doc_a AND cn.doc_b = pr.doc_b
           WHERE pr.doc_a IS NULL)
         SELECT o.doc_a, o.doc_b, o.cn::BIGINT AS cn,
           o.ra::BIGINT AS ra_micro,
           ${sqlMicroRatio("o.cn", "da.dg + db.dg - o.cn")}
             AS nbr_jaccard_ppm
         FROM opn o JOIN dg da ON da.id = o.doc_a
           JOIN dg db ON db.id = o.doc_b
         ORDER BY cn DESC, ra_micro DESC, doc_a ASC, doc_b ASC
         LIMIT 20""",
    // q490: the q465 recursive-walk oracle run twice — sweep 0 from
    // min(id), sweep 1 from sweep 0's farthest (max lvl, min id)
    // node; identical 20-hop cap and total-order far pick.
    "q490_double_sweep" ->
      """WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey, l_partkey
               FROM lineitem),
         e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
               FROM op a JOIN op b USING (l_orderkey)
               WHERE a.l_partkey < b.l_partkey),
         sym AS (SELECT u AS src, v AS dst FROM e
                 UNION ALL SELECT v, u FROM e),
         seed0 AS (SELECT min(src) AS s FROM sym),
         w0(id, lvl) AS (
           SELECT s, 0::BIGINT FROM seed0
           UNION
           SELECT sym.dst, w.lvl + 1 FROM w0 w
           JOIN sym ON w.id = sym.src WHERE w.lvl < 20),
         l0 AS (SELECT id, min(lvl) AS lvl FROM w0 GROUP BY 1),
         f0 AS (SELECT id, lvl FROM l0
                ORDER BY lvl DESC, id ASC LIMIT 1),
         w1(id, lvl) AS (
           SELECT id, 0::BIGINT FROM f0
           UNION
           SELECT sym.dst, w.lvl + 1 FROM w1 w
           JOIN sym ON w.id = sym.src WHERE w.lvl < 20),
         l1 AS (SELECT id, min(lvl) AS lvl FROM w1 GROUP BY 1),
         f1 AS (SELECT id, lvl FROM l1
                ORDER BY lvl DESC, id ASC LIMIT 1)
         SELECT 0::BIGINT AS sweep, (SELECT s FROM seed0)::BIGINT AS seed,
           (SELECT id FROM f0)::BIGINT AS far_node,
           (SELECT lvl FROM f0)::BIGINT AS ecc,
           (SELECT count(*) FROM l0)::BIGINT AS n_reached
         UNION ALL
         SELECT 1::BIGINT, (SELECT id FROM f0)::BIGINT,
           (SELECT id FROM f1)::BIGINT, (SELECT lvl FROM f1)::BIGINT,
           (SELECT count(*) FROM l1)::BIGINT""",
    // q491: the four prefix widths unrolled (list slice 1..d), the
    // q24 raw-double rank convention per (width, query), overlap
    // counted against the width-64 ground truth by null probe.
    "q491_dim_trunc_recall" -> {
      val widths = Seq(8, 16, 32, 64)
      val prs = widths
        .map { d =>
          s"""SELECT $d::BIGINT AS trunc_dim, q.q_id, e.vec_id,
             ${cosSql(s"q.q_vec[1:$d]", s"e.embedding[1:$d]")} AS sim
           FROM e, q WHERE e.vec_id <> q.q_id"""
        }
        .mkString("\n         UNION ALL ")
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM e
               WHERE vec_id % 25 = 0),
         pr AS ($prs),
         top AS MATERIALIZED (
           SELECT trunc_dim, q_id, vec_id FROM
             (SELECT trunc_dim, q_id, vec_id,
                row_number() OVER (PARTITION BY trunc_dim, q_id
                  ORDER BY sim DESC, vec_id ASC) AS rk
              FROM pr) t
           WHERE rk <= 10),
         gt AS (SELECT q_id, vec_id FROM top WHERE trunc_dim = 64),
         hits AS (SELECT t.trunc_dim, t.q_id,
             CASE WHEN g.vec_id IS NULL THEN 0 ELSE 1 END AS hit
           FROM top t LEFT JOIN gt g
             ON t.q_id = g.q_id AND t.vec_id = g.vec_id)
         SELECT trunc_dim, count(DISTINCT q_id)::BIGINT AS n_queries,
           CAST(sum(hit) AS BIGINT) AS n_overlap,
           ${sqlMicroRatio("sum(hit)", "count(*)")} AS recall_ppm
         FROM hits GROUP BY 1"""
    },
    // q492: the q459 closure machinery on the repeat co-purchase
    // graph — three scenarios (intact / md5-draw removal / top-1%-
    // degree removal), identical pick orders and census emission.
    "q492_attack_robustness" -> {
      def closure(tag: String, edgesSel: String): String =
        s"""e$tag AS MATERIALIZED ($edgesSel),
         n$tag AS (SELECT u AS id FROM e$tag
                   UNION SELECT v FROM e$tag),
         s$tag AS (SELECT u AS a, v AS b FROM e$tag
                   UNION SELECT v, u FROM e$tag),
         r$tag(a, b) AS (SELECT id, id FROM n$tag
                   UNION SELECT r.a, s.b
                   FROM r$tag r JOIN s$tag s ON r.b = s.a),
         l$tag AS (SELECT a AS id, min(b) AS label
                   FROM r$tag GROUP BY 1),
         z$tag AS (SELECT label, count(*)::BIGINT AS sz
                   FROM l$tag GROUP BY 1),
         row$tag AS (SELECT coalesce(sum(sz), 0)::BIGINT AS n_nodes,
                   (SELECT count(*) FROM e$tag)::BIGINT AS n_edges,
                   count(*)::BIGINT AS n_components,
                   coalesce(max(sz), 0)::BIGINT AS max_component
                 FROM z$tag)"""
      def outRow(scenario: String, removed: String, tag: String): String =
        s"""SELECT '$scenario' AS scenario, ($removed)::BIGINT AS n_removed,
           n_nodes, n_edges, n_components, max_component,
           ${sqlMicroRatio("max_component", "greatest(n_nodes, 1)")}
             AS giant_ppm
         FROM row$tag"""
      s"""WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey, l_partkey
             FROM lineitem),
         ek AS MATERIALIZED (
           SELECT a.l_partkey AS u, b.l_partkey AS v
           FROM op a JOIN op b USING (l_orderkey)
           WHERE a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
         dd AS MATERIALIZED (SELECT id, count(*) AS dg FROM
             (SELECT u AS id FROM ek UNION ALL SELECT v FROM ek) z
           GROUP BY 1),
         kk AS (SELECT ((count(*) + 99) // 100)::BIGINT AS k FROM dd),
         tg AS MATERIALIZED (SELECT id FROM
             (SELECT id, row_number() OVER
                (ORDER BY dg DESC, id ASC) AS rk FROM dd) z, kk
           WHERE rk <= kk.k),
         rd AS MATERIALIZED (SELECT id FROM
             (SELECT id, row_number() OVER
                (ORDER BY md5(id::VARCHAR) ASC, id ASC) AS rk
              FROM dd) z, kk
           WHERE rk <= kk.k),
         ${closure("i", "SELECT u, v FROM ek")},
         ${closure(
          "t",
          "SELECT u, v FROM ek WHERE u NOT IN (SELECT id FROM tg) " +
            "AND v NOT IN (SELECT id FROM tg)")},
         ${closure(
          "r",
          "SELECT u, v FROM ek WHERE u NOT IN (SELECT id FROM rd) " +
            "AND v NOT IN (SELECT id FROM rd)")}
         ${outRow("intact", "0", "i")}
         UNION ALL ${outRow("random_1pct", "SELECT k FROM kk", "r")}
         UNION ALL ${outRow("targeted_1pct", "SELECT k FROM kk", "t")}"""
    },
    // q489: degree value-domain cumsum decile picks (the q461 bound
    // rule), then per-threshold strict-majority counts from the two
    // bounded histograms; phi in half-up micro units.
    "q489_rich_club" ->
      s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
           FROM lineitem),
         e0 AS MATERIALIZED (
           SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM op a JOIN op b USING (l_orderkey)
           WHERE a.l_partkey < b.l_partkey),
         dd AS MATERIALIZED (SELECT id, count(*) AS dg FROM
             (SELECT u AS id FROM e0 UNION ALL SELECT v FROM e0) z
           GROUP BY 1),
         g AS (SELECT dg, count(*) AS c FROM dd GROUP BY 1),
         cum AS MATERIALIZED (SELECT dg, c,
             sum(c) OVER (ORDER BY dg ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
           FROM g),
         n_tot AS (SELECT count(*) AS n FROM dd),
         ks AS MATERIALIZED (SELECT dec,
             (SELECT min(dg) FROM cum, n_tot
              WHERE cw * 10 >= n * dec) AS k
           FROM (SELECT unnest(range(1, 10)) AS dec) z),
         edh AS MATERIALIZED (
           SELECT least(du.dg, dv.dg) AS dmin, count(*) AS ec
           FROM e0 JOIN dd du ON e0.u = du.id
             JOIN dd dv ON e0.v = dv.id
           GROUP BY 1),
         base AS (SELECT dec, k,
             (SELECT coalesce(sum(c), 0) FROM g WHERE dg > k)
               AS n_nodes,
             (SELECT coalesce(sum(ec), 0) FROM edh WHERE dmin > k)
               AS e_k
           FROM ks)
         SELECT dec::BIGINT AS decile, k::BIGINT AS k_deg,
           n_nodes::BIGINT AS n_nodes, e_k::BIGINT AS n_edges,
           (CASE WHEN n_nodes < 2 THEN 0
                 ELSE ${sqlMicroRatio("2 * e_k", "n_nodes * (n_nodes - 1)")}
            END)::BIGINT AS phi_micro
         FROM base""",
    "q240_nn_label_eval" -> {
      val centCos = cosSql("c_vec", "embedding")
      val pairCos = cosSql("q_vec", "e.embedding")
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS c_vec
                FROM embeddings WHERE vec_id < 8),
         sims AS (SELECT e.vec_id, e.embedding, e.label, c.cid,
                    $centCos AS csim
                  FROM embeddings e, c),
         asg AS (SELECT vec_id, embedding, label, cid
                 FROM (SELECT vec_id, embedding, label, cid,
                         row_number() OVER (PARTITION BY vec_id
                           ORDER BY csim DESC, cid ASC) AS rk
                       FROM sims) t WHERE rk = 1),
         ev AS (SELECT cid, vec_id AS q_id, embedding AS q_vec,
                 label AS q_label
               FROM asg WHERE vec_id % 5 = 0),
         s AS (SELECT q_id, q_label, e.label AS nn_label, e.vec_id,
                 $pairCos AS sim
               FROM asg e JOIN ev
                 ON e.cid = ev.cid AND e.vec_id <> ev.q_id),
         r AS (SELECT q_id, q_label, nn_label,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY sim DESC, vec_id ASC) AS rk
               FROM s)
         SELECT q_label AS label, count(*)::BIGINT AS n_eval,
           sum(CASE WHEN nn_label = q_label THEN 1 ELSE 0 END)::BIGINT
             AS n_correct,
           (((2*(sum(CASE WHEN nn_label = q_label THEN 1 ELSE 0 END)) * 1000000 + (count(*))) // (2*(count(*))))::BIGINT) AS acc_micro
         FROM r WHERE rk = 1 GROUP BY 1"""
    },
    // q206: the shared gate-flag CTEs, discordant-cell counts, and
    // the (b-c)^2/(b+c) statistic with the zero-discordance guard.
    "q206_mcnemar_gates" ->
      s"""WITH $gateFlagsCtes
         SELECT a.gate AS gate_a, b.gate AS gate_b,
           count(*) AS n,
           CAST(sum(CASE WHEN a.f AND NOT b.f THEN 1 ELSE 0 END)
             AS BIGINT) AS n10,
           CAST(sum(CASE WHEN NOT a.f AND b.f THEN 1 ELSE 0 END)
             AS BIGINT) AS n01,
           CASE WHEN sum(CASE WHEN a.f <> b.f THEN 1 ELSE 0 END) = 0
                THEN 0.0
                ELSE round(
                  (sum(CASE WHEN a.f AND NOT b.f THEN 1 ELSE 0 END)
                   - sum(CASE WHEN NOT a.f AND b.f THEN 1 ELSE 0 END))
                  ** 2
                  / sum(CASE WHEN a.f <> b.f THEN 1 ELSE 0 END)::DOUBLE,
                  6)
           END AS mcnemar_chi2
         FROM fl a JOIN fl b
           ON a.doc_id = b.doc_id AND a.gate < b.gate
         GROUP BY 1, 2""",
    // q208: the q21 inversion chain at J >= 0.5, symmetrized, wedge
    // self-join on the center, closing edge probed against the same
    // pair set; single summary row with micro-unit closure rate.
    "q208_transitivity" ->
      s"""WITH $shinglesCte,
         e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM d
               WHERE len(sh) > 0),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS inter,
                 any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
               FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
         pr AS (SELECT doc_a, doc_b FROM p
                WHERE round(inter::DOUBLE / (n_a + n_b - inter), 6) >= 0.5),
         sym AS (SELECT doc_a AS ctr, doc_b AS nbr FROM pr
                 UNION ALL SELECT doc_b, doc_a FROM pr),
         w AS (SELECT x.nbr AS doc_a, y.nbr AS doc_b
               FROM sym x JOIN sym y
                 ON x.ctr = y.ctr AND x.nbr < y.nbr),
         j AS (SELECT w.doc_a, w.doc_b,
                 CASE WHEN pr.doc_a IS NULL THEN 0 ELSE 1 END AS closed
               FROM w LEFT JOIN pr
                 ON w.doc_a = pr.doc_a AND w.doc_b = pr.doc_b)
         SELECT count(*) AS n_wedges,
           CAST(coalesce(sum(closed), 0) AS BIGINT) AS n_closed,
           CASE WHEN count(*) = 0 THEN 0
                ELSE (((2*(coalesce(sum(closed), 0)) * 1000000 + (count(*))) // (2*(count(*))))::BIGINT)
           END AS closure_micro
         FROM j""",
    // q94: identical double widening, nearest-integer coding, and
    // dequantization arithmetic; error stats rounded to 6.
    "q94_int8_quant" ->
      """WITH cells AS (SELECT vec_id, s.dim AS dim, s.x AS x
           FROM (SELECT vec_id,
                   unnest(list_transform(range(len(embedding)),
                     i -> {'dim': i, 'x': embedding[i+1]})) AS s
                 FROM embeddings) t),
         stats AS (SELECT dim, min(x)::DOUBLE AS mn, max(x)::DOUBLE AS mx
                   FROM cells GROUP BY dim),
         q AS (SELECT vec_id, x::DOUBLE AS xd, mn, mx,
                 CASE WHEN mx > mn THEN
                   CAST(round((x::DOUBLE - mn) / (mx - mn) * 255.0)
                     AS INTEGER)
                 ELSE 0 END AS code
               FROM cells JOIN stats USING (dim)),
         e AS (SELECT vec_id,
                 xd - (mn + code::DOUBLE / 255.0 * (mx - mn)) AS err
               FROM q)
         SELECT vec_id, round(sqrt(avg(err * err)), 6) AS rmse,
           round(max(abs(err)), 6) AS max_abs_err
         FROM e GROUP BY vec_id""",
    // q95: day-granularity cohorts; date arithmetic is exact ints.
    "q95_cohort_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
         f AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
         SELECT CAST(f.cohort_day AS VARCHAR) AS cohort_day,
           CAST(ev.day - f.cohort_day AS INTEGER) AS days_since,
           count(DISTINCT ev.user_id) AS n_users
         FROM ev JOIN f USING (user_id)
         GROUP BY 1, 2""",
    // q96: identical 8-token distinct spans and md5-prefix span key.
    "q96_dup_spans" ->
      """WITH d AS (SELECT doc_id,
           list_distinct(list_transform(range(len(toks) - 7),
             i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' '
               || toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' '
               || toks[i+7] || ' ' || toks[i+8])) AS sh
           FROM (SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\s+')
                   END AS toks FROM documents) t
           WHERE len(toks) >= 8),
         sp AS (SELECT doc_id, unnest(sh) AS span FROM d)
         SELECT ('0x' || substr(md5(span), 1, 15))::BIGINT AS span_key,
           count(*) AS n_docs, min(doc_id) AS first_doc
         FROM sp GROUP BY 1 HAVING count(*) >= 2""",
    // q97: identical content-keyed uniform and A-Res priority; the
    // top-50 set is compared, not its order.
    "q97_weighted_sample" ->
      """SELECT doc_id, n_chars, round(r, 6) AS priority FROM (
           SELECT doc_id, n_chars,
             pow((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
               + 1)::DOUBLE / 1152921504606846976.0, 1.0 / n_chars) AS r
           FROM documents WHERE n_chars > 0) t
         ORDER BY r DESC, doc_id ASC LIMIT 50""",
    // q98: identical normalization + unrolled 8-bit interleave.
    "q98_zorder" -> {
      val interleave = (0 until 8)
        .map(i =>
          s"(((zx >> $i) & 1) << ${2 * i}) + (((zy >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH o AS (SELECT o_custkey,
             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               AS day
           FROM orders),
         s AS (SELECT min(o_custkey) AS ck_mn, max(o_custkey) AS ck_mx,
                 min(day) AS d_mn, max(day) AS d_mx FROM o),
         n AS (SELECT o_custkey, day,
                 CAST(floor((o_custkey - ck_mn)::DOUBLE
                   / (ck_mx - ck_mn + 1)::DOUBLE * 256) AS BIGINT) AS zx,
                 CAST(floor((day - d_mn)::DOUBLE
                   / (d_mx - d_mn + 1)::DOUBLE * 256) AS BIGINT) AS zy
               FROM o CROSS JOIN s),
         z AS (SELECT o_custkey, day, $interleave AS z FROM n)
         SELECT z >> 12 AS zbucket, count(*) AS n_orders,
           min(o_custkey) AS ck_min, max(o_custkey) AS ck_max,
           min(day) AS day_min, max(day) AS day_max
         FROM z GROUP BY 1"""
    },
    // q99: identical bigram counts, marginals, and ln arithmetic;
    // top-k selected on the rounded score so membership is exact.
    "q99_pmi" ->
      """WITH t AS (SELECT CASE WHEN length(trim(text)) = 0
                  THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\s+')
             END AS toks FROM documents),
         b AS (SELECT unnest(list_transform(range(len(toks) - 1),
                 i -> {'w1': toks[i+1], 'w2': toks[i+2]})) AS s
               FROM t WHERE len(toks) >= 2),
         bi AS (SELECT s.w1 AS w1, s.w2 AS w2, count(*) AS n
                FROM b GROUP BY 1, 2),
         l AS (SELECT w1, CAST(sum(n) AS BIGINT) AS n_left
               FROM bi GROUP BY 1),
         r AS (SELECT w2, CAST(sum(n) AS BIGINT) AS n_right
               FROM bi GROUP BY 1),
         tt AS (SELECT CAST(sum(n) AS BIGINT) AS t_bi FROM bi)
         SELECT w1, w2, n, pmi FROM (
           SELECT bi.w1 AS w1, bi.w2 AS w2, bi.n AS n,
             round(ln((bi.n::DOUBLE * t_bi::DOUBLE)
               / (n_left::DOUBLE * n_right::DOUBLE)), 6) AS pmi
           FROM bi
           JOIN l USING (w1)
           JOIN r USING (w2)
           CROSS JOIN tt
           WHERE bi.n >= 5) x
         ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 20""",
    // q100: the algebraic entropy form — ln(n) − Σ c·ln c / n.
    "q100_entropy" ->
      """WITH tf AS (SELECT doc_id, w, count(*) AS c FROM
           (SELECT doc_id, unnest(toks) AS w FROM
             (SELECT doc_id, CASE WHEN length(trim(text)) = 0
                     THEN []::VARCHAR[]
                     ELSE regexp_split_to_array(trim(text), '\s+')
                END AS toks FROM documents) t) x
           GROUP BY 1, 2)
         SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
           round(ln(sum(c)::DOUBLE)
             - sum(c::DOUBLE * ln(c::DOUBLE)) / sum(c)::DOUBLE, 6)
             AS entropy
         FROM tf GROUP BY doc_id""",
    // q101: the drained dedup stream equals batch COUNT(DISTINCT).
    "q101_stream_dedup" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1""",
    // q102: identical md5 screen and 3-gram containment threshold.
    "q102_incremental_dedup" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents
                         WHERE doc_id < 250),
         batch AS (SELECT doc_id, text FROM documents
                   WHERE doc_id >= 250),
         ex AS (SELECT DISTINCT b.doc_id FROM batch b
                JOIN (SELECT DISTINCT md5(text) AS h FROM corpus) c
                  ON md5(b.text) = c.h),
         bsh AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM (
           SELECT doc_id,
             list_distinct(list_transform(range(len(toks) - 2),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
               AS sh
           FROM (SELECT doc_id, CASE WHEN length(trim(text)) = 0
                   THEN []::VARCHAR[]
                   ELSE regexp_split_to_array(trim(text), '\s+')
                 END AS toks FROM batch) t
           WHERE len(toks) >= 3) d),
         csh AS (SELECT DISTINCT unnest(sh) AS s FROM (
           SELECT list_distinct(list_transform(range(len(toks) - 2),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
               AS sh
           FROM (SELECT CASE WHEN length(trim(text)) = 0
                   THEN []::VARCHAR[]
                   ELSE regexp_split_to_array(trim(text), '\s+')
                 END AS toks FROM corpus) t
           WHERE len(toks) >= 3) d2),
         near AS (SELECT doc_id FROM (
           SELECT b.doc_id, count(*) AS hits,
             any_value(b.n_sh) AS n_sh
           FROM bsh b JOIN csh USING (s) GROUP BY 1) h
           WHERE hits::DOUBLE / n_sh >= 0.5)
         SELECT b.doc_id,
           CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup'
                WHEN near.doc_id IS NOT NULL THEN 'near_dup'
                ELSE 'new' END AS status
         FROM batch b
         LEFT JOIN ex ON b.doc_id = ex.doc_id
         LEFT JOIN near ON b.doc_id = near.doc_id""",
    // q103: identical binning arithmetic and cumulative median-bin
    // pick; the exact side is interpolated quantile_cont.
    "q103_histogram_median" ->
      """WITH d AS (SELECT lang, CAST(len(toks) AS BIGINT) AS x FROM
           (SELECT lang, CASE WHEN length(trim(text)) = 0
                   THEN []::VARCHAR[]
                   ELSE regexp_split_to_array(trim(text), '\s+')
              END AS toks FROM documents) t),
         s AS (SELECT min(x) AS mn, max(x) AS mx FROM d),
         b AS (SELECT lang, x,
                 CAST(floor((x - mn)::DOUBLE / (mx - mn + 1)::DOUBLE * 20)
                   AS BIGINT) AS bin, mn, mx
               FROM d CROSS JOIN s),
         h AS (SELECT lang, bin, count(*) AS cnt, any_value(mn) AS mn,
                 any_value(mx) AS mx
               FROM b GROUP BY 1, 2),
         cu AS (SELECT lang, bin, mn, mx,
                  sum(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum,
                  sum(cnt) OVER (PARTITION BY lang) AS n
                FROM h),
         ap AS (SELECT lang, CAST(any_value(n) AS BIGINT) AS n_docs,
                  round(any_value(mn) + (min(bin) + 0.5)
                    * ((any_value(mx) - any_value(mn) + 1)::DOUBLE / 20), 6)
                    AS approx_median
                FROM cu WHERE cum * 2 >= n GROUP BY lang),
         exq AS (SELECT lang, round(quantile_cont(x, 0.5), 6)
                   AS exact_median FROM d GROUP BY lang)
         SELECT ap.lang AS lang, n_docs, exact_median, approx_median,
           round(abs(approx_median - exact_median), 6) AS abs_err
         FROM ap JOIN exq ON ap.lang = exq.lang""",
    // q104: identical share/weight arithmetic; targets as doubles.
    "q104_mix_reweight" ->
      s"""WITH pl AS (SELECT lang, count(*) AS n_docs,
             CAST(sum(len(toks)) AS BIGINT) AS n_tokens FROM
           (SELECT lang, CASE WHEN length(trim(text)) = 0
                   THEN []::VARCHAR[]
                   ELSE regexp_split_to_array(trim(text), '\\s+')
              END AS toks FROM documents) t
           GROUP BY 1),
         tt AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t_tokens FROM pl),
         m AS (SELECT 'en' AS lang, 500::BIGINT AS target_pm
               UNION ALL SELECT 'de', 200::BIGINT
               UNION ALL SELECT 'fr', 150::BIGINT
               UNION ALL SELECT 'es', 100::BIGINT
               UNION ALL SELECT 'zh', 50::BIGINT)
         SELECT pl.lang AS lang, n_docs, n_tokens,
           ${sqlMicroRatio("n_tokens", "t_tokens")} AS share_ppm,
           m.target_pm AS target_pm,
           ${sqlIdivHalfUp("m.target_pm * t_tokens * 1000", "n_tokens")}
             AS weight_micro,
           ${sqlIdivHalfUp("m.target_pm * t_tokens", "10")}
             AS expected_tokens_centi
         FROM pl JOIN m ON pl.lang = m.lang CROSS JOIN tt""",
    // q108: identical A-Res priority, ranked per language.
    "q108_stratified_weighted" ->
      """SELECT doc_id, lang, n_chars, round(r, 6) AS priority,
           CAST(rk AS INTEGER) AS rk
         FROM (SELECT doc_id, lang, n_chars, r,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY r DESC, doc_id ASC) AS rk
               FROM (SELECT doc_id, lang, n_chars,
                       pow((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))
                         ::BIGINT + 1)::DOUBLE / 1152921504606846976.0,
                         1.0 / n_chars) AS r
                     FROM documents WHERE n_chars > 0) t) x
         WHERE rk <= 20""",
    // q109: the summary card — exact ppm shares + the q_micro mean
    // (same integer quality seam as q19).
    "q109_corpus_card" ->
      s"""WITH $qMicroCte,
         per_doc AS (
           SELECT d.doc_id, d.lang, d.text, qm.q_micro,
             CASE WHEN length(trim(d.text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(d.text), '\\s+'))
             END AS nt
           FROM documents d JOIN qm USING (doc_id)),
         base AS (SELECT count(*)::BIGINT AS n_docs,
             CAST(sum(nt) AS BIGINT) AS n_tokens,
             count(DISTINCT lang)::BIGINT AS n_langs,
             count(DISTINCT md5(text)) AS n_unique,
             ${sqlIdivHalfUp("sum(q_micro)", "count(*)")}
               AS mean_quality_micro
           FROM per_doc),
         top AS (SELECT lang AS top_lang, count(*) AS tn
                 FROM per_doc GROUP BY 1
                 ORDER BY tn DESC, top_lang ASC LIMIT 1)
         SELECT n_docs, n_tokens, n_langs, top_lang,
           ${sqlMicroRatio("tn", "n_docs")} AS top_lang_ppm,
           ${sqlMicroRatio("n_docs - n_unique", "n_docs")}
             AS exact_dup_ppm,
           mean_quality_micro
         FROM base CROSS JOIN top""",
    // q116: same frame derivation as q48, same rolling hash as q17,
    // feature arithmetic in plain BIGINT, mean rounded to 6.
    "q116_frame_embedding" ->
      """WITH base AS (
           SELECT doc_id,
             list_reduce(list_prepend(0::BIGINT,
               list_transform(range(length(text)),
                 i -> ord(substr(text, (i+1)::INT, 1))::BIGINT)),
               (a, c) -> (a * 31 + c) % 1000000007) AS h,
             CAST(octet_length(encode(text)) % 240 + 1 AS INTEGER)
               AS n_frames
           FROM documents),
         frames AS (
           SELECT doc_id, h, n_frames,
             unnest(range(0, n_frames, greatest(1, n_frames // 8))) AS f
           FROM base),
         cells AS (
           SELECT doc_id, n_frames, k.k AS dim,
             ((h + f * 2654435761 + k.k * 40503) % 1000)::DOUBLE
               / 1000.0 AS v
           FROM frames CROSS JOIN range(4) k(k))
         SELECT doc_id, any_value(n_frames) AS n_frames,
           CAST(dim AS INTEGER) AS dim, round(avg(v), 6) AS pooled
         FROM cells GROUP BY doc_id, dim""",
    // q114: pair counting over the distinct-word frequency table.
    "q114_bpe_pairs" ->
      """WITH w AS (SELECT w, count(*) AS wf FROM
           (SELECT unnest(toks) AS w FROM
             (SELECT CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                     ELSE regexp_split_to_array(trim(text), '\s+')
                END AS toks FROM documents) t) x
           GROUP BY 1),
         p AS (SELECT substr(w, CAST(i + 1 AS INTEGER), 2) AS pair, wf
               FROM (SELECT w, wf, unnest(range(length(w) - 1)) AS i
                     FROM w WHERE length(w) >= 2) t)
         SELECT pair, CAST(sum(wf) AS BIGINT) AS n FROM p
         GROUP BY 1 ORDER BY n DESC, pair ASC LIMIT 30""",
    // q115: identical per-stage predicates (quality from q89's
    // formula, repetition from q60's, PII regexes from q59's,
    // survivor via min-per-md5), aggregated then unpivoted.
    "q115_filter_funnel" ->
      s"""WITH d AS (SELECT doc_id, text,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+')
             END AS toks
           FROM documents),
         f AS (SELECT doc_id, text, toks,
             len(toks) AS nt,
             round(0.5 * least(len(toks) / 200.0, 1.0)
                 + 0.4 * least(CASE WHEN len(toks) = 0 THEN 0.0
                     ELSE len(list_filter(toks, w -> w IN
                       ('the','a','an','and','or','of','to','in','is','it')
                       ))::DOUBLE / len(toks) END * 5.0, 1.0)
                 + 0.1 * (1.0 - least(CASE WHEN length(text) = 0 THEN 0.0
                     ELSE (length(text)
                           - length(translate(text, '.,!?;:', '')))::DOUBLE
                          / length(text) END * 10.0, 1.0)), 6) AS q,
             round(CASE WHEN len(toks) = 0 THEN 0.0
                   ELSE 1.0 - len(list_distinct(toks))::DOUBLE / len(toks)
                   END, 6) AS dtf,
             round(CASE WHEN len(toks) <= 1 THEN 0.0
                   ELSE 1.0 - len(list_distinct(
                       list_transform(range(len(toks) - 1),
                         i -> toks[i+1] || ' ' || toks[i+2])))::DOUBLE
                     / (len(toks) - 1)
                   END, 6) AS dbf,
             len(regexp_extract_all(text,
               '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}'))
               + len(regexp_extract_all(text,
                   '\\b\\d{3}[- .]\\d{3}[- .]\\d{4}\\b')) AS pii,
             min(doc_id) OVER (PARTITION BY md5(text)) AS survivor
           FROM d),
         s AS (SELECT
             (nt >= 10) AS s1,
             (nt >= 10 AND q >= 0.3) AS s2,
             (nt >= 10 AND q >= 0.3 AND dtf <= 0.7 AND dbf <= 0.5) AS s3,
             (nt >= 10 AND q >= 0.3 AND dtf <= 0.7 AND dbf <= 0.5
              AND pii = 0) AS s4,
             (nt >= 10 AND q >= 0.3 AND dtf <= 0.7 AND dbf <= 0.5
              AND pii = 0 AND survivor = doc_id) AS s5
           FROM f),
         a AS (SELECT count(*) AS n0,
             CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             CAST(sum(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS n4,
             CAST(sum(CASE WHEN s5 THEN 1 ELSE 0 END) AS BIGINT) AS n5
           FROM s)
         SELECT '0_all' AS stage, n0::BIGINT AS n_docs,
           ${sqlMicroRatio("n0", "n0")} AS yield_ppm FROM a
         UNION ALL SELECT '1_minlen', n1,
           ${sqlMicroRatio("n1", "n0")} FROM a
         UNION ALL SELECT '2_quality', n2,
           ${sqlMicroRatio("n2", "n0")} FROM a
         UNION ALL SELECT '3_repetition', n3,
           ${sqlMicroRatio("n3", "n0")} FROM a
         UNION ALL SELECT '4_pii_free', n4,
           ${sqlMicroRatio("n4", "n0")} FROM a
         UNION ALL SELECT '5_unique', n5,
           ${sqlMicroRatio("n5", "n0")} FROM a""",
    // q120: the same typed extraction through DuckDB's JSON path.
    "q120_variant_props" ->
      s"""SELECT event_type, count(*)::BIGINT AS n_events,
           CAST(sum(json_extract(props, '$$.k')::INTEGER) AS BIGINT)
             AS sum_k,
           ${sqlIdivHalfUp(
          "sum(json_extract(props, '$.k')::INTEGER) * 1000",
          "count(json_extract(props, '$.k'))")} AS avg_k_milli,
           min(json_extract(props, '$$.k')::INTEGER) AS min_k,
           max(json_extract(props, '$$.k')::INTEGER) AS max_k
         FROM events GROUP BY 1""",
    // q123: variable-gap session merge — an event joins the session
    // while its ts is under the running MAX of prior member ends;
    // the session's exclusive end is the max member end.
    "q124_stream_dynamic_session" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
                CAST(ts AS TIMESTAMP)
                  + CASE WHEN event_type = 'purchase'
                         THEN INTERVAL 30 MINUTE
                         ELSE INTERVAL 10 MINUTE END AS end_ts
              FROM events),
         m AS (SELECT e.*, max(end_ts) OVER
                 (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS run_end
               FROM e),
         f AS (SELECT m.*, CASE WHEN run_end IS NULL OR ts >= run_end
                 THEN 1 ELSE 0 END AS is_new FROM m),
         s AS (SELECT f.*, CAST(sum(is_new) OVER
                 (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_seq FROM f)
         SELECT user_id,
           min(ts) AS session_start,
           max(end_ts) AS session_end_excl,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM s GROUP BY user_id, session_seq""",
    "q123_dynamic_session" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
                CAST(ts AS TIMESTAMP)
                  + CASE WHEN event_type = 'purchase'
                         THEN INTERVAL 30 MINUTE
                         ELSE INTERVAL 10 MINUTE END AS end_ts
              FROM events),
         m AS (SELECT e.*, max(end_ts) OVER
                 (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS run_end
               FROM e),
         f AS (SELECT m.*, CASE WHEN run_end IS NULL OR ts >= run_end
                 THEN 1 ELSE 0 END AS is_new FROM m),
         s AS (SELECT f.*, CAST(sum(is_new) OVER
                 (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_seq FROM f)
         SELECT user_id,
           min(ts) AS session_start,
           max(end_ts) AS session_end_excl,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM s GROUP BY user_id, session_seq""",
    // q122: the unpivoted long form is just the direct aggregate
    // (unpivot drops null cells, so absent combos vanish on both
    // sides identically).
    "q122_unpivot" ->
      """SELECT o_orderpriority, o_orderstatus,
           round(sum(o_totalprice), 2) AS price
         FROM orders GROUP BY 1, 2""",
    // q121: terminal transformWithState emissions ≡ batch GROUP BY.
    "q121_transform_state" ->
      """SELECT user_id, count(*) AS n_events, max(value) AS max_value
         FROM events GROUP BY 1""",
    // q117/q118: the same correlated shapes replayed near-verbatim.
    "q117_urgent_only" ->
      """SELECT c.c_mktsegment AS segment, count(*) AS n_customers
         FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderpriority = '1-URGENT')
           AND NOT EXISTS (SELECT 1 FROM orders o2
                           WHERE o2.o_custkey = c.c_custkey
                             AND o2.o_orderpriority = '5-LOW')
         GROUP BY c.c_mktsegment""",
    "q118_cheapest_supplier" ->
      """WITH ps AS (
           SELECT l_partkey, l_suppkey, min(l_extendedprice) AS min_price
           FROM lineitem GROUP BY 1, 2)
         SELECT p.p_partkey, s.s_name, round(ps.min_price, 2) AS best_price
         FROM part p
         JOIN ps ON p.p_partkey = ps.l_partkey
         JOIN supplier s ON s.s_suppkey = ps.l_suppkey
         WHERE p.p_partkey < 100
           AND ps.min_price = (SELECT min(x.min_price) FROM ps x
                               WHERE x.l_partkey = p.p_partkey)""",
    // q119: identical window; ranks cast to Spark's INTEGER outputs.
    "q119_window_family" ->
      s"""SELECT o_orderkey, o_custkey,
           CAST(rank() OVER w AS INTEGER) AS rnk,
           CAST(dense_rank() OVER w AS INTEGER) AS drnk,
           CASE WHEN count(*) OVER wp = 1 THEN 0::BIGINT
                ELSE ${sqlMicroRatio("rank() OVER w - 1",
          "count(*) OVER wp - 1")}
           END AS prnk_ppm,
           ${sqlMicroRatio("rank() OVER w", "count(*) OVER wp")}
             AS cdist_ppm,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           first_value(o_orderkey) OVER w AS top_order
         FROM orders WHERE o_custkey < 100
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC),
                wp AS (PARTITION BY o_custkey)""",
    // q110-q113: near-verbatim replays of the same subquery SQL.
    "q110_cust_order_dist" ->
      """SELECT c_count, count(*) AS custdist
         FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
               FROM customer c LEFT OUTER JOIN orders o
                 ON c.c_custkey = o.o_custkey
                 AND o.o_orderpriority <> '1-URGENT'
               GROUP BY c.c_custkey) t
         GROUP BY c_count""",
    "q111_top_rev_supplier" ->
      """WITH rev AS (
           SELECT l_suppkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
           FROM lineitem GROUP BY l_suppkey)
         SELECT s.s_suppkey, s.s_name, r.total_rev
         FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
         WHERE r.total_rev = (SELECT max(total_rev) FROM rev)""",
    "q112_above_avg_suppliers" ->
      """SELECT s_suppkey, s_name FROM supplier
         WHERE s_suppkey IN (
           SELECT l_suppkey FROM lineitem GROUP BY l_suppkey
           HAVING sum(l_quantity) > (
             SELECT avg(qty) FROM (
               SELECT sum(l_quantity) AS qty
               FROM lineitem GROUP BY l_suppkey) q))""",
    "q113_idle_rich_customers" ->
      """SELECT c.c_mktsegment AS segment, count(*) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
         FROM customer c
         WHERE c.c_acctbal > (
             SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
           AND NOT EXISTS (
             SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
               AND o.o_orderpriority = '1-URGENT')
         GROUP BY c.c_mktsegment""",
    // q83: per-stage conditional mins, strictly ordered.
    "q83_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS view_ts FROM events
                    WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, min(e.ts) AS click_ts
               FROM events e JOIN v ON e.user_id = v.user_id
               WHERE e.event_type = 'click' AND e.ts > v.view_ts
               GROUP BY 1),
         p AS (SELECT e.user_id, min(e.ts) AS purchase_ts
               FROM events e JOIN c ON e.user_id = c.user_id
               WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
               GROUP BY 1)
         SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
           CAST(1 + CAST(c.click_ts IS NOT NULL AS INTEGER)
                  + CAST(p.purchase_ts IS NOT NULL AS INTEGER) AS INTEGER)
             AS stage_reached
         FROM v
         LEFT JOIN c ON v.user_id = c.user_id
         LEFT JOIN p ON v.user_id = p.user_id"""
  )
}
