#!/usr/bin/env python3
"""Output-type linter for the oracle SQL surface.

Round 9's driver gate fell 355/362 -> 397/446 on one mechanism the
round()-regex lint is structurally blind to: DuckDB types `sum(BIGINT)`
as HUGEINT, so an un-cast aggregate-derived emission produces a
HUGEINT *output column*. Values match Spark's BIGINT bit-exactly, but
the driver's hash is dtype-sensitive (HUGEINT->pandas differs from
int64), so 48 queries were green locally and red at the gate.

This linter DESCRIBEs every oracle_sql.json entry in DuckDB against
the real sf tables and fails when an output column is typed HUGEINT,
DECIMAL, or (unless whitelisted) DOUBLE/FLOAT. The fix for a HUGEINT
hit is always `::BIGINT` on the emission; the fix for a float hit is
to emit the exact-integer inputs instead (see q188's round-10 rework)
or to justify the column in the whitelist.

Usage: tools/lint_types.py <verify_out_dir> [sf_dir]
Exit 1 on any non-whitelisted HUGEINT/DECIMAL/DOUBLE/FLOAT column.
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Grandfathered float/decimal columns: exactly the (query, column)
# pairs that were hash-GREEN at the driver in CORRECTNESS_r09 — each
# is driver-proven reproducible (IEEE-exact arithmetic in identical
# expression order on both engines, or a correctly-rounded value of
# an exactly-representable input). Any NEW float/decimal emission
# fails the lint until it is either re-expressed in exact BIGINT
# units (the house convention) or added here with a written
# exactness argument.
GRANDFATHERED = {
    "q01_pricing_summary": {"sum_qty", "sum_base_price", "sum_disc_price", "avg_qty", "avg_disc"},
    "q02_revenue_filter": {"revenue"},
    "q03_revenue_by_nation": {"revenue"},
    "q04_top_orders": {"o_totalprice"},
    "q05_window_rank": {"o_totalprice"},
    "q07_union_merge": {"o_totalprice"},
    "q09_status_pivot": {"value_f"},
    "q100_entropy": {"entropy"},
    "q103_histogram_median": {"exact_median", "approx_median", "abs_err"},
    "q104_mix_reweight": {"share", "target", "weight", "expected_tokens"},
    "q105_asof_native": {"value", "prior_error_value"},
    "q106_ivf_probe2": {"sim"},
    "q107_stream_lake": {"sum_value"},
    "q108_stratified_weighted": {"priority"},
    "q109_corpus_card": {"top_lang_share", "exact_dup_rate", "mean_quality"},
    "q10_rollup_revenue": {"sum_bal"},
    "q111_top_rev_supplier": {"total_rev"},
    "q113_idle_rich_customers": {"totacctbal"},
    "q115_filter_funnel": {"pct"},
    "q116_frame_embedding": {"pooled"},
    "q118_cheapest_supplier": {"best_price"},
    "q119_window_family": {"prnk", "cdist"},
    "q11_orders_by_month": {"sum_price"},
    "q120_variant_props": {"avg_k"},
    "q121_transform_state": {"max_value"},
    "q122_unpivot": {"price"},
    "q123_dynamic_session": {"sum_value"},
    "q124_stream_dynamic_session": {"sum_value"},
    "q127_trigram_ppl": {"xent", "ppl"},
    "q128_pq_adc": {"adc", "exact_dist"},
    "q129_nb_langid": {"margin"},
    "q12_mktsegment_share": {"pct"},
    "q130_training_manifest": {"ppl"},
    "q131_dsir_weights": {"logw", "logw_per_ngram"},
    "q132_temperature_mix": {"p", "q"},
    "q133_bm25_topk": {"score"},
    "q134_bpe_corpus_apply": {"chars_per_subword"},
    "q135_semantic_dedup": {"max_sim_lower"},
    "q136_segment_dedup": {"frac_kept"},
    "q139_hard_negatives": {"sim"},
    "q140_winnow_fingerprints": {"overlap"},
    "q141_jl_projection": {"d2_orig", "d2_proj", "distortion"},
    "q142_gopher_rules": {"mean_word_len", "alpha_frac", "symbol_frac"},
    "q143_shingle_containment": {"containment"},
    "q145_embedding_outliers": {"dist", "z"},
    "q146_lang_fertility": {"fertility", "chars_per_subword"},
    "q147_corpus_diversity": {"distinct_ratio"},
    "q148_zipf_fit": {"slope", "intercept", "r2"},
    "q149_kn_bigram": {"p_kn", "p_cont"},
    "q14_token_stats": {"avg_token_len"},
    "q150_unimax_mix": {"epochs"},
    "q151_hybrid_rrf": {"rrf"},
    "q152_bucketed_join": {"revenue"},
    "q153_partition_prune": {"total_value"},
    "q156_embedding_whiten": {"z"},
    "q157_vocab_coverage": {"oov_rate"},
    "q159_prefix_filter_join": {"jaccard"},
    "q15_quality_score": {"stop_ratio", "quality"},
    "q160_stopword_discovery": {"idf"},
    "q161_ppl_buckets": {"ppl"},
    "q162_dup_weights": {"weight", "w_norm"},
    "q163_compaction": {"total_value"},
    "q166_source_overlap": {"avg_containment"},
    "q168_source_kl": {"kl"},
    "q169_epoch_expansion": {"epochs"},
    "q170_self_retrieval": {"rr"},
    "q171_join_profile": {"avg_per_key", "skew_factor"},
    "q174_mergeable_stats": {"mean_chars", "var_chars"},
    "q177_retrieve_rerank": {"cos_score"},
    "q179_source_dup_report": {"redundancy"},
    "q182_source_minhash": {"est_jaccard", "jaccard"},
    "q183_ivfpq": {"adc", "exact_dist"},
    "q184_moore_lewis": {"xent_in", "xent_gen", "ml_score"},
    "q185_stream_monitor": {"p50_est", "p95_est", "p50_exact", "p95_exact"},
    "q186_cdc_chunks": {"dup_token_frac"},
    "q187_threshold_sweep": {"threshold", "retention_frac"},
    "q190_gate_agreement": {"agree_frac", "kappa"},
    "q192_embedding_decon": {"best_sim"},
    "q193_bootstrap_ci": {"mean_nchars", "boot_se", "ci_lo", "ci_hi"},
    "q195_repetition_stats": {"dup_token_frac", "top_bigram_frac", "dup_trigram_frac"},
    "q196_dup_windows": {"dup_window_frac"},
    "q198_minhash_error": {"est_jaccard", "mean_abs_err", "max_abs_err"},
    "q19_lang_stats": {"avg_quality", "pct"},
    "q201_composition_chi2": {"expected", "chi2_cell"},
    "q202_packing_audit": {"mean_fill"},
    "q204_good_turing": {"r_star", "prob_mass", "p0"},
    "q206_mcnemar_gates": {"mcnemar_chi2"},
    "q21_ngram_jaccard": {"jaccard"},
    "q22_minhash_lsh": {"est_jaccard", "jaccard"},
    "q237_decay_counts": {"decayed_count"},
    "q241_pc1_power": {"pc1"},
    "q24_cosine_topk": {"sim"},
    "q25_ivf_topk": {"sim"},
    "q261_interarrival": {"mean_gap_s"},
    "q26_embedding_neardup": {"sim"},
    "q274_neardup_anatomy": {"jaccard"},
    "q278_cosine_histogram": {"bin_lo"},
    "q27_tumbling_window": {"sum_value"},
    "q282_review_batch": {"jaccard"},
    "q28_sliding_window": {"sum_value"},
    "q29_sessionize": {"sum_value"},
    "q303_kmv_error": {"kmv_estimate"},
    "q30_asof_join": {"value", "prior_error_value"},
    "q32_stream_tumbling": {"sum_value"},
    "q33_multimodal_decode": {"f0", "f1", "f2", "f3", "f4", "f5", "f6", "f7"},
    "q346_weighted_jaccard": {"jaccard", "wjaccard"},
    "q36_salted_join": {"sum_price"},
    "q39_pipeline_e2e": {"avg_quality"},
    "q410_value_five_point": {"min_value", "p25_value", "p50_value", "p75_value", "max_value"},
    "q418_kmv_set_algebra": {"est_a", "est_b", "est_union", "est_inter"},
    "q42_distribution_stats": {"qty_p25", "qty_p50", "qty_p75", "price_stddev", "price_disc_corr"},
    "q43_cube": {"sum_qty"},
    "q47_stream_sessionize": {"sum_value"},
    "q58_kmv_distinct": {"kmv_estimate"},
    "q60_repetition": {"dup_token_frac", "dup_bigram_frac"},
    "q61_full_outer": {"sum_price"},
    "q62_pivot_api": {"price_f", "price_o", "price_p"},
    "q64_fused_text_stats": {"quality"},
    "q66_bpe_tokens": {"bpe_per_ws"},
    "q67_lag_lead": {"prev_value", "next_value", "secs_since_prev", "moving_avg3"},
    "q68_grouping_sets": {"sum_qty"},
    "q69_label_centroids": {"centroid_val"},
    "q70_lsh_neardup": {"sim"},
    "q74_tfidf_terms": {"tfidf"},
    "q76_bloom_semi_join": {"revenue"},
    "q77_stream_static_join": {"sum_value"},
    "q79_rolling_hour": {"sum_1h"},
    "q80_lang_percentiles": {"p25", "p50", "p75"},
    "q81_quality_histogram": {"bucket_lo", "bucket_hi"},
    "q84_bigram_lm": {"p"},
    "q86_pagerank": {"rank"},
    "q87_session_window": {"sum_value"},
    "q90_cdc_apply": {"balance"},
    "q91_bigram_xent": {"xent"},
    "q93_kmeans": {"dist"},
    "q94_int8_quant": {"rmse", "max_abs_err"},
    "q97_weighted_sample": {"priority"},
    "q99_pmi": {"pmi"},
}


# HUGEINT is a hard fail with no whitelist: it is ALWAYS the un-cast
# aggregate bug (values fit BIGINT; only the dtype diverges at the
# driver's hash), and the fix is always a ::BIGINT on the emission.
HARD_FAIL = ("HUGEINT", "INT128")
# DECIMAL/DOUBLE are failures unless grandfathered: a float emission
# CAN be reproducible (identical IEEE expression order), but only the
# driver gate proves it — new ones must be argued in, not assumed.
SOFT_FAIL = ("DECIMAL", "NUMERIC", "DOUBLE", "FLOAT", "REAL")


def main():
    outdir = sys.argv[1]
    sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"{name}: DESCRIBE ERROR: {e}")
            bad += 1
            continue
        for col, typ, *_ in desc:
            t = typ.upper()
            if any(b in t for b in HARD_FAIL):
                print(f"{name}: column `{col}` is {typ} — cast the "
                      f"emission ::BIGINT")
                bad += 1
            elif any(b in t for b in SOFT_FAIL):
                if col not in GRANDFATHERED.get(name, ()):
                    print(f"{name}: NEW {typ} column `{col}` — emit "
                          f"exact integer units instead, or grandfather "
                          f"it with an exactness argument")
                    bad += 1
    if bad:
        print(f"== TYPE LINT FAILED: {bad} column(s) ==")
        sys.exit(1)
    print(f"== TYPE LINT OK ({len(oracle)} oracles) ==")


if __name__ == "__main__":
    main()
