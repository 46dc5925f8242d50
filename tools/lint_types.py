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
# Per-entry exactness tags (every line carries one):
#   money2  round(sum, 2) of TPC-H money doubles — the 2-decimal round
#           is orders of magnitude coarser than double accumulation
#           error at any tested SF, so summation order cannot flip it.
#   raw     a parquet float column (or its min/max/lag/rank-statistic
#           pick) passed through with NO arithmetic — bit-identical.
#   sum6    round(sum(value), 6) of bounded event values — same
#           coarser-than-error argument as money2 at 6 decimals.
#   r6same  round(expr, 6) where BOTH engines evaluate the textually
#           identical expression tree in the same operand order —
#           deterministic IEEE, driver-proven green since it landed.
#   ieee    exact IEEE arithmetic on exactly-representable inputs
#           (integer-derived doubles, power-of-two scales, single
#           divisions of small ints) — no rounding step needed.
# Round-12 purge: 20 more ratio/mean emissions converted to exact
# BIGINT ppm/milli/micro units and REMOVED (q21, q22, q67, q84, q104, q119,
# q140, q143, q159, q162, q174, q182, q190, q198, q201, q204, q261,
# q274, q282, q346) — selection thresholds stay on the proven
# internal doubles; only emissions changed.
# Round-11 purge: 24 ratio/mean-shaped queries were re-expressed in
# exact BIGINT micro/milli/ppm units and REMOVED from this map (q12,
# q14, q19, q39, q60, q66, q81, q109, q115, q120, q134, q136, q146,
# q147, q157, q166, q170, q171, q179, q186, q187, q195, q196, q202).
# TPC-H-shaped money aggregates stay permanently: decimal money is the
# domain's own unit and the round-2 contract is part of the query.
GRANDFATHERED = {
    "q01_pricing_summary": {"sum_qty", "sum_base_price", "sum_disc_price", "avg_qty", "avg_disc"},  # money2
    "q02_revenue_filter": {"revenue"},  # money2
    "q03_revenue_by_nation": {"revenue"},  # money2
    "q04_top_orders": {"o_totalprice"},  # raw
    "q05_window_rank": {"o_totalprice"},  # raw
    "q07_union_merge": {"o_totalprice"},  # raw
    "q09_status_pivot": {"value_f"},  # money2 (pivoted money sums)
    "q100_entropy": {"entropy"},  # r6same (−Σp·ln p, same term order)
    "q103_histogram_median": {"exact_median", "approx_median", "abs_err"},  # raw (rank-statistic picks + one subtraction)
    "q105_asof_native": {"value", "prior_error_value"},  # raw
    "q106_ivf_probe2": {"sim"},  # r6same (cosine, same fold order)
    "q107_stream_lake": {"sum_value"},  # sum6
    "q108_stratified_weighted": {"priority"},  # r6same (pow of hash/2^60)
    "q10_rollup_revenue": {"sum_bal"},  # money2
    "q111_top_rev_supplier": {"total_rev"},  # money2
    "q113_idle_rich_customers": {"totacctbal"},  # money2
    "q116_frame_embedding": {"pooled"},  # ieee (integer-derived cells /1000, mean r6same)
    "q118_cheapest_supplier": {"best_price"},  # raw (min pick)
    "q11_orders_by_month": {"sum_price"},  # money2
    "q121_transform_state": {"max_value"},  # raw (max pick)
    "q122_unpivot": {"price"},  # raw
    "q123_dynamic_session": {"sum_value"},  # sum6
    "q124_stream_dynamic_session": {"sum_value"},  # sum6
    "q127_trigram_ppl": {"xent", "ppl"},  # r6same (LM chain, same order)
    "q128_pq_adc": {"adc", "exact_dist"},  # r6same (4-term LUT sum, same order)
    "q129_nb_langid": {"margin"},  # r6same (NB log-odds, same order)
    "q130_training_manifest": {"ppl"},  # r6same (q127's column)
    "q131_dsir_weights": {"logw", "logw_per_ngram"},  # r6same
    "q132_temperature_mix": {"p", "q"},  # r6same
    "q133_bm25_topk": {"score"},  # r6same (BM25, same term order)
    "q135_semantic_dedup": {"max_sim_lower"},  # r6same
    "q139_hard_negatives": {"sim"},  # r6same
    "q141_jl_projection": {"d2_orig", "d2_proj", "distortion"},  # r6same
    "q142_gopher_rules": {"mean_word_len", "alpha_frac", "symbol_frac"},  # r6same
    "q145_embedding_outliers": {"dist", "z"},  # r6same
    "q148_zipf_fit": {"slope", "intercept", "r2"},  # r6same (closed-form OLS, same sums)
    "q149_kn_bigram": {"p_kn", "p_cont"},  # r6same
    "q150_unimax_mix": {"epochs"},  # r6same
    "q151_hybrid_rrf": {"rrf"},  # r6same (Σ 1/(60+rank), same order)
    "q152_bucketed_join": {"revenue"},  # money2
    "q153_partition_prune": {"total_value"},  # money2
    "q156_embedding_whiten": {"z"},  # r6same
    "q15_quality_score": {"stop_ratio", "quality"},  # r6same (the q15 formula)
    "q160_stopword_discovery": {"idf"},  # r6same (ln(N/df))
    "q161_ppl_buckets": {"ppl"},  # r6same
    "q163_compaction": {"total_value"},  # money2
    "q168_source_kl": {"kl"},  # r6same (count-ratio KL, same term order)
    "q169_epoch_expansion": {"epochs"},  # r6same (q150's column)
    "q177_retrieve_rerank": {"cos_score"},  # r6same
    "q183_ivfpq": {"adc", "exact_dist"},  # r6same
    "q184_moore_lewis": {"xent_in", "xent_gen", "ml_score"},  # r6same
    "q185_stream_monitor": {"p50_est", "p95_est", "p50_exact", "p95_exact"},  # raw (rank/sketch picks of stored values)
    "q192_embedding_decon": {"best_sim"},  # r6same
    "q193_bootstrap_ci": {"mean_nchars", "boot_se", "ci_lo", "ci_hi"},  # r6same (same resample arithmetic)
    "q206_mcnemar_gates": {"mcnemar_chi2"},  # ieee ((b−c)²/(b+c) on small ints)
    "q237_decay_counts": {"decayed_count"},  # r6same (count·2^(−age/hl), same order)
    "q241_pc1_power": {"pc1"},  # r6same (per-round r6 absorbs order drift)
    "q24_cosine_topk": {"sim"},  # r6same
    "q25_ivf_topk": {"sim"},  # r6same
    "q26_embedding_neardup": {"sim"},  # r6same
    "q278_cosine_histogram": {"bin_lo"},  # ieee (fixed bin edge from the int bin index)
    "q27_tumbling_window": {"sum_value"},  # sum6
    "q28_sliding_window": {"sum_value"},  # sum6
    "q29_sessionize": {"sum_value"},  # sum6
    "q303_kmv_error": {"kmv_estimate"},  # ieee ((k−1)·2^60/h_k, exact int inputs)
    "q30_asof_join": {"value", "prior_error_value"},  # raw
    "q32_stream_tumbling": {"sum_value"},  # sum6
    "q33_multimodal_decode": {"f0", "f1", "f2", "f3", "f4", "f5", "f6", "f7"},  # ieee (integer-hash-derived /1000)
    "q36_salted_join": {"sum_price"},  # money2
    "q410_value_five_point": {"min_value", "p25_value", "p50_value", "p75_value", "max_value"},  # raw (rank-statistic picks)
    "q418_kmv_set_algebra": {"est_a", "est_b", "est_union", "est_inter"},  # ieee (KMV closed form on exact ints)
    "q42_distribution_stats": {"qty_p25", "qty_p50", "qty_p75", "price_stddev", "price_disc_corr"},  # r6same (percentile_cont interpolation + r6 moments)
    "q43_cube": {"sum_qty"},  # money2
    "q47_stream_sessionize": {"sum_value"},  # sum6
    "q58_kmv_distinct": {"kmv_estimate"},  # ieee
    "q61_full_outer": {"sum_price"},  # money2
    "q62_pivot_api": {"price_f", "price_o", "price_p"},  # money2
    "q64_fused_text_stats": {"quality"},  # r6same (fused expr pinned ≡ column form by spec)
    "q68_grouping_sets": {"sum_qty"},  # money2
    "q69_label_centroids": {"centroid_val"},  # r6same
    "q70_lsh_neardup": {"sim"},  # r6same
    "q74_tfidf_terms": {"tfidf"},  # r6same
    "q76_bloom_semi_join": {"revenue"},  # money2
    "q77_stream_static_join": {"sum_value"},  # sum6
    "q79_rolling_hour": {"sum_1h"},  # sum6
    "q80_lang_percentiles": {"p25", "p50", "p75"},  # ieee (percentile_cont, same interpolation formula)
    "q86_pagerank": {"rank"},  # r6same (final r6 absorbs 8-round drift)
    "q483_contamination_ppr": {"rank"},  # r6same (q86's argument: identical 8-round chain, final r6)
    "q87_session_window": {"sum_value"},  # sum6
    "q90_cdc_apply": {"balance"},  # sum6 (applied-delta sum)
    "q91_bigram_xent": {"xent"},  # r6same
    "q93_kmeans": {"dist"},  # r6same
    "q94_int8_quant": {"rmse", "max_abs_err"},  # r6same
    "q97_weighted_sample": {"priority"},  # r6same (same pow formula as q108)
    "q99_pmi": {"pmi"},  # r6same
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
