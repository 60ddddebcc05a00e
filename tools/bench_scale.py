"""Scaling-curve bench: the same queries at sf0.1 and sf1 (gen_scale
tiling), best-of-2 each — turns the catalog's 100 TB design claims into
measured sf0.1→sf1 ratios. A scale-safe plan should grow ~linearly
(ratio ≈ data factor, here 10) or sub-linearly when the output side is
fixed (top-k, aggregates); super-linear growth flags a plan that would
not survive 100×.

Noise-resistant methodology (round-8 rework; see SCALE.md):
- FRESH-SESSION SEGMENTS: the roster runs in segments of ~40 queries,
  each in its own SparkSession.  The old single-session sweep ran the
  whole sf0.1 leg, then the whole sf1 leg; by the sf1 tail the session
  had accumulated ~27k stages and late-roster queries read 2-6x slow,
  which manufactured fake >5x ratios every round and forced a manual
  re-probe triage (round-7 verdict task 4).
- ADJACENT LEGS: within a segment each query measures sf0.1 then sf1
  back-to-back, so both legs of a ratio see the same session age and
  ambient state — aging cancels out of the quotient instead of landing
  entirely on the numerator.

    python tools/bench_scale.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from federated_gcn_spark.plans import QUERIES  # noqa: E402
from federated_gcn_spark.session import get_spark  # noqa: E402

ROSTER = [
    # top-10 by BENCH_r02 cost
    "local_clustering", "supplier_lift", "roc_auc", "graphsage_layer",
    "flagship_revenue", "bm25_search", "fedavg_tensor", "two_hop_paths",
    "tfidf_top_terms", "decontam_report",
    # named scale-validation targets (VERDICT r02 §next-round-3)
    "near_dedup_corpus", "edge_split_stats", "pricing_summary", "dedup_exact",
    # round-3 additions: the expensive new operators
    "link_prediction_scores", "duplicated_span_fraction", "pmi_top_pairs",
    "semantic_dedup_stats", "bpe_learned_merges", "waiting_suppliers",
    "customer_order_distribution", "bloom_prejoin_stats",
    "incremental_agg_refresh", "cms_heavy_hitters",
    # round-3 second wave: factorization, compressed ANN, replayable
    # sketches, weighted SSSP, TPC-H sweep completion
    "als_rank1_factors", "als_recommendations", "pq_adc_topk",
    "anf_register_supersteps", "hll_replay_cardinality", "kmv_distinct",
    "sssp_distances", "min_cost_supplier", "market_share",
    "covariance_matrix",
    # round-3 third wave: exact similarity join, truss peel, span removal,
    # DSIR weights, exact multi-quantiles, robust/trend stats, skyline, MIS
    "set_similarity_pairs", "ktruss_supersteps", "postings_index",
    "winsorized_price_stats", "equidepth_price_buckets",
    "dsir_importance_logweights", "dup_span_removal",
    "trending_event_types", "mis_members", "part_skyline", "ohlc_daily",
    "price_band_revenue", "exact_group_medians",
    "event_transition_matrix", "cohort_retention_matrix",
    "join_key_skew_report",
    "naive_bayes_lang", "chi2_top_terms",
    "new_vs_returning_users", "abc_revenue_classes",
    "ship_lag_percentiles",
    "burst_detection",
    "corpus_drift_report",
    "psi_price_drift",
    "rolling_distinct_users_hll",
    "theil_sen_trend",
    "hybrid_search_rrf",
    "audience_venn",
    "degree_assortativity",
    "gini_customer_spend",
    "benford_first_digit",
    "exact_dedup_clusters",
    "hits_authorities",
    "corpus_health_report",
    "adaboost_stumps",
    "moving_median_revenue",
    "mann_kendall_trend",
    "revenue_autocorrelation",
    "cusum_changepoint",
    "weekday_seasonal_profile",
    "ewma_smoothed_revenue",
    "zipf_exponent_fit",
    "vocab_growth_heaps",
    "kaplan_meier_churn",
    "ks_two_sample_price",
    "spearman_qty_price",
    "contingency_association",
    "price_elasticity_by_brand",
    "negative_sampling_table",
    "source_lang_entropy",
    "interevent_burstiness",
    "runs_test_revenue",
    "degree_powerlaw_fit",
    "kruskal_wallis_priority",
    "mann_whitney_halves",
    "wilcoxon_wow_revenue",
    "wasserstein_price_drift",
    "hellinger_price_drift",
    "rolling_correlation_revenue_orders",
    "odds_ratio_urgent_building",
    "gains_lift_table",
    "rfm_segmentation",
    "cohort_ltv_curve",
    # round-4 wave 5
    "part_entity_matches",
    "bootstrap_revenue_ci",
    "scd2_point_in_time_join",
    "ann_recall_report",
    "isotonic_calibration",
    "cuped_adjusted_lift",
    "conformal_price_interval",
    "time_to_convert_percentiles",
    # round-4 wave 6
    "community_modularity",
    "attribution_credit_split",
    "k_anonymity_report",
    "double_smoothing_forecast",
    "systematic_weighted_sample",
    # round-4 wave 7
    "event_path_trigrams",
    "unseen_vocab_mass",
    "brier_calibration_report",
    "ann_ndcg_report",
    "rich_club_coefficient",
    # round-4 wave 8
    "sequence_support_pairs",
    "clustering_silhouette",
    "hll_error_report",
    "kmv_error_report",
    "woe_iv_binning",
    # round-4 wave 9
    "session_window_stats",
    "community_conductance",
    # round-4 wave 10
    "bollinger_bands",
    "max_drawdown",
    "anova_oneway",
    "jarque_bera_price",
    # round-4 wave 11
    "herfindahl_index",
    "diff_in_diff_revenue",
    "value_at_risk",
    "cohen_kappa",
    # round-4 wave 12
    "theil_index",
    "friedman_test",
    "pettitt_changepoint",
    "harmonic_centrality",
    # round-4 wave 13
    "embedding_int8_quant_report",
    "embedding_truncation_fidelity",
    "gopher_quality_rules",
    "sprt_conversion_monitor",
    # round-4 wave 14
    "grubbs_outlier_test",
    "mcc_score",
    "temperature_mixture_weights",
    "seasonal_decompose",
    # round-4 wave 15
    "davies_bouldin_index",
    "cochran_q_test",
    "rsi_indicator",
    "ljung_box_test",
    # round-4 wave 16
    "kendall_tau_daily",
    "session_entropy_distribution",
    "ses_gridsearch",
    "graph_degree_gini",
    # round-4 wave 17
    "mcnemar_test",
    "stratified_adjusted_lift",
    "hurst_exponent",
    "neighbor_degree_curve",
    # round-4 wave 18
    "trimmed_mean_prices",
    "copurchase_pairs",
    "exponential_gap_fit",
    "hill_tail_index",
    # round-4 wave 19
    "capture_recapture_estimate",
    "laspeyres_paasche_index",
    "simpson_diversity",
    "growth_streaks",
    # round-4 wave 20
    "poisson_rate_test",
    "tukey_fences_report",
    "xyz_demand_classes",
    # round-4 wave 21
    "log_return_volatility",
    "anderson_darling_gap_test",
    "g_test_priority_segment",
    "fleiss_kappa",
    # round-4 wave 22
    "youden_threshold",
    "somers_d_priority_late",
    "page_hinkley_drift",
    "cooks_distance_report",
    # round-4 wave 23
    "gumbel_extreme_fit",
    "dispersion_index",
    "hoover_index",
    # round-4 waves 24-27
    "epoch_folding_periodogram", "pacf_lags", "turning_points_test",
    "cross_correlation_lags", "benjamini_hochberg_fdr",
    "brown_forsythe_levene", "bartlett_test", "tukey_hsd_pairs",
    "eigenvector_centrality", "greedy_coloring_stats", "butterfly_count",
    "clustering_null_model", "table_fingerprint", "snapshot_diff_stats",
    "zone_map_skipping_report", "shard_assignment_balance",
    # round-4 waves 28-31
    "gmm_em_1d", "cart_depth2_tree", "knn_loo_accuracy",
    "jl_projection_fidelity", "feature_hash_collisions", "mojibake_stats",
    "ngram_novelty_scan", "durbin_watson", "breusch_pagan",
    "granger_causality_1lag", "chow_break_test", "nelson_aalen_hazard",
    "forecast_accuracy_report", "pinball_quantile_eval",
    "croston_demand_forecast",
    # round-4 waves 32-35
    "jensen_shannon_drift", "cramer_von_mises_binned", "mood_median_test",
    "atkinson_index_binned", "markov_stationary_distribution",
    "markov_absorption_probabilities", "markov_entropy_rate",
    "markov_mixing_curve", "unpivot_metrics", "order_lines_nested",
    "median_polish_weekday_month", "kmv_set_algebra", "dagostino_k2",
    "esd_outlier_rounds", "nmi_lang_source", "qq_deciles_halves",
    # round-4 waves 36-39
    "rake_keyphrases", "target_encoding_smoothed", "feature_scaling_stats",
    "degree_attack_robustness", "ipf_raking_weights",
    "ridge_regression_path", "energy_distance_halves",
    "gini_gain_feature_ranking", "revenue_bridge_decomposition",
    "adstock_grid_fit", "newsvendor_stock_levels", "power_iteration_top_pc",
    "handshake_matching_stats", "december_effect_regression",
    "dau_wau_stickiness", "queueing_mmc_whatif",
    # round-6 wave 40: the bounded exact-similarity surfaces — their
    # whole reason to exist is the scale curve (vs set_similarity_pairs'
    # Θ(duplication²) pair list)
    "set_similarity_topk", "set_similarity_counts",
]

SF_DIRS = {
    "0.1": "/root/testdata/sf0.1",
    "1": os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scaledata", "sf1",
    ),
}


SEGMENT = 40  # queries per fresh session


def _fresh_session(tag: str):
    spark = get_spark(tag)
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen/datasource warm-up at BOTH scale factors so neither
    # leg of the first query is charged for one-time init
    spark.range(1000).selectExpr("sum(id)").collect()
    for sf_dir in SF_DIRS.values():
        spark.read.parquet(
            os.path.join(sf_dir, "region.parquet")
        ).write.format("noop").mode("overwrite").save()
    return spark


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SF1.json"
    try:
        from tools.machine_health import probe

        machine = probe(seconds=8.0)
    except Exception:  # diagnostic only
        machine = {}
    results: dict[str, dict[str, float]] = {sf: {} for sf in SF_DIRS}
    for seg_start in range(0, len(ROSTER), SEGMENT):
        segment = ROSTER[seg_start:seg_start + SEGMENT]
        spark = _fresh_session(f"bench-scale-seg{seg_start // SEGMENT}")
        for name in segment:
            for sf, sf_dir in SF_DIRS.items():  # adjacent legs per query
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    QUERIES[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - t0)
                results[sf][name] = round(best, 3)
                print(f"sf{sf} {name}: {results[sf][name]:.3f}s", flush=True)
        spark.stop()

    # Bracketing end probe (round-8 rule: a bench artifact must carry the
    # steal conditions it ran under at BOTH ends, or round-over-round
    # absolute diffs are noise-reading; within-run ratios stay the
    # steal-robust metric either way).
    try:
        from tools.machine_health import probe as _probe_end

        machine_end = _probe_end(seconds=8.0)
    except Exception:  # diagnostic only
        machine_end = {}

    # Persist the raw timings BEFORE any derived arithmetic: a bad ratio
    # (e.g. a sub-millisecond sf0.1 leg rounding to 0.0) must not lose a
    # multi-hour sweep (round-8 advice).
    payload = {
        "metric": "scale_curve_sf0.1_to_sf1",
        "data_factor": 10,
        "method": (
            f"fresh-session segments of {SEGMENT} queries, sf0.1/sf1 legs "
            "adjacent per query, best-of-2 per leg"
        ),
        "times_sf0.1": results["0.1"],
        "times_sf1": results["1"],
        "total_sf0.1": round(sum(results["0.1"].values()), 3),
        "total_sf1": round(sum(results["1"].values()), 3),
        "machine": machine,
        "machine_end": machine_end,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)

    # round(x, 3) can floor a sub-ms leg to 0.0; clamp the denominator to
    # one timer tick instead of dividing by zero (the ratio is then an
    # upper bound, flagged so triage knows it is saturated).
    ratios = {
        n: round(results["1"][n] / max(results["0.1"][n], 0.001), 2)
        for n in ROSTER
    }
    payload["ratio"] = ratios
    payload["ratio_denominator_floor_s"] = 0.001
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({"total_sf1": payload["total_sf1"], "ratios": ratios}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
