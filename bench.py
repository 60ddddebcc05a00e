"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes its full plan into a no-op sink (measures compute,
not driver-side result transfer). Run directly: ``python bench.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from federated_gcn_spark.plans import QUERIES  # noqa: E402
from federated_gcn_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "flagship_revenue",
    "merge_keep_first",
    "two_hop_paths",
    "fedavg_tensor",
    "window_topk",
    "events_tumbling",
    "events_sessionize",
    "dedup_exact",
    "quality_score",
    "lang_id_detect",
    "similarity_topk",
    "minhash_signatures",
    "rollup_revenue",
    "roc_auc",
    "tfidf_top_terms",
    "graphsage_layer",
    "pricing_summary",
    "chunk_docs",
    "documents_curated",
    "stratified_docs_sample",
    "training_waves",
    "repetition_stats",
    "pii_redaction",
    "decontam_report",
    "domain_mixture_sample",
    "sequence_packing",
    "knn_join_topk",
    "embedding_centroids",
    "funnel_conversion",
    "retention_daily",
    "gap_fill_daily",
    "normalized_dedup",
    "zipf_top_terms",
    "unigram_nll",
    "salted_join_revenue",
    "max_acctbal_customer",
    "session_stats",
    "supplier_lift",
    "bm25_search",
    "value_anomalies",
    "linear_fit",
    "monthly_revenue",
    "local_clustering",
    # round-3 additions: decision-support shapes + mining operators
    "customer_order_distribution",
    "returned_item_report",
    "waiting_suppliers",
    "link_prediction_scores",
    "pmi_top_pairs",
    "duplicated_span_fraction",
    "semantic_dedup_stats",
    "bpe_learned_merges",
    # round-3 second wave: TPC-H sweep completion, replayable sketches,
    # factorization + compressed-domain ANN
    "min_cost_supplier",
    "order_priority_check",
    "market_share",
    "hll_replay_cardinality",
    "anf_register_supersteps",
    "covariance_matrix",
    "als_rank1_factors",
    "pq_adc_topk",
    "sssp_distances",
    "scd2_user_states",
    "bigram_nll",
    "exact_order_statistics",
    "top_supplier_quarter",
    # round-3 third wave: exact similarity join, truss peel, postings,
    # winsorized robust moments
    "set_similarity_pairs",
    "ktruss_supersteps",
    "postings_index",
    "winsorized_price_stats",
    "equidepth_price_buckets",
    "dsir_importance_logweights",
    "mis_members",
    "part_skyline",
    "ohlc_daily",
    "price_band_revenue",
    "exact_group_medians",
    "dup_span_removal",
    "trending_event_types",
    "event_transition_matrix",
    "cohort_retention_matrix",
    "join_key_skew_report",
    # round-3 fourth wave: corpus classification + growth accounting
    "naive_bayes_lang",
    "chi2_top_terms",
    "new_vs_returning_users",
    "abc_revenue_classes",
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
    # round-4 wave 5: entity resolution, bootstrap inference, PIT join,
    # ANN evaluation
    "part_entity_matches",
    "bootstrap_revenue_ci",
    "scd2_point_in_time_join",
    "ann_recall_report",
    "isotonic_calibration",
    "cuped_adjusted_lift",
    "conformal_price_interval",
    "time_to_convert_percentiles",
    # round-4 wave 6: graph quality, attribution, privacy, forecasting,
    # weighted sampling
    "community_modularity",
    "attribution_credit_split",
    "k_anonymity_report",
    "double_smoothing_forecast",
    "systematic_weighted_sample",
    # round-4 wave 7: path mining, vocab coverage, forecast evaluation,
    # ranking quality, rich club
    "event_path_trigrams",
    "unseen_vocab_mass",
    "brier_calibration_report",
    "ann_ndcg_report",
    "rich_club_coefficient",
    # round-4 wave 8: sequence mining, cluster quality, sketch accuracy,
    # scorecard binning
    "sequence_support_pairs",
    "clustering_silhouette",
    "hll_error_report",
    "kmv_error_report",
    "woe_iv_binning",
    # round-4 wave 9: session windows, community quality
    "session_window_stats",
    "community_conductance",
    # round-4 wave 10: volatility bands, drawdown, parametric tests
    "bollinger_bands",
    "max_drawdown",
    "anova_oneway",
    "jarque_bera_price",
    # round-4 wave 11: concentration, causal, risk, agreement
    "herfindahl_index",
    "diff_in_diff_revenue",
    "value_at_risk",
    "cohen_kappa",
    # round-4 wave 12: inequality, blocked ranks, changepoint, centrality
    "theil_index",
    "friedman_test",
    "pettitt_changepoint",
    "harmonic_centrality",
    # round-4 wave 13: embedding compression, quality rules, SPRT
    "embedding_int8_quant_report",
    "embedding_truncation_fidelity",
    "gopher_quality_rules",
    "sprt_conversion_monitor",
    # round-4 wave 14: outliers, MCC, mixture temperature, seasonality
    "grubbs_outlier_test",
    "mcc_score",
    "temperature_mixture_weights",
    "seasonal_decompose",
    # round-4 wave 15: cluster separation, matched raters, momentum, whiteness
    "davies_bouldin_index",
    "cochran_q_test",
    "rsi_indicator",
    "ljung_box_test",
    # round-4 wave 16: concordance, behavioral entropy, SES selection, degree Gini
    "kendall_tau_daily",
    "session_entropy_distribution",
    "ses_gridsearch",
    "graph_degree_gini",
    # round-4 wave 17: paired raters, stratified causal, Hurst, degree mixing
    "mcnemar_test",
    "stratified_adjusted_lift",
    "hurst_exponent",
    "neighbor_degree_curve",
    # round-4 wave 18: robust means, basket projection, renewal fit, heavy tails
    "trimmed_mean_prices",
    "copurchase_pairs",
    "exponential_gap_fit",
    "hill_tail_index",
    # round-4 wave 19: population estimation, price indices, diversity, streaks
    "capture_recapture_estimate",
    "laspeyres_paasche_index",
    "simpson_diversity",
    "growth_streaks",
    # round-4 wave 20: rate tests, fences, demand variability
    "poisson_rate_test",
    "tukey_fences_report",
    "xyz_demand_classes",
    # round-4 wave 21: volatility, goodness-of-fit, G-test, multi-rater
    "log_return_volatility",
    "anderson_darling_gap_test",
    "g_test_priority_segment",
    "fleiss_kappa",
    # round-4 wave 22: thresholds, ordinal association, drift, influence
    "youden_threshold",
    "somers_d_priority_late",
    "page_hinkley_drift",
    "cooks_distance_report",
    # round-4 wave 23: extremes, overdispersion, Robin Hood index
    "gumbel_extreme_fit",
    "dispersion_index",
    "hoover_index",
    # round-4 wave 24: periodicity + serial dependence
    "epoch_folding_periodogram",
    "pacf_lags",
    "turning_points_test",
    "cross_correlation_lags",
    # round-4 wave 25: multiple testing + variance homogeneity
    "benjamini_hochberg_fdr",
    "brown_forsythe_levene",
    "bartlett_test",
    "tukey_hsd_pairs",
    # round-4 wave 26: spectral centrality, coloring, bipartite motifs
    "eigenvector_centrality",
    "greedy_coloring_stats",
    "butterfly_count",
    "clustering_null_model",
    # round-4 wave 27: storage audits
    "table_fingerprint",
    "snapshot_diff_stats",
    "zone_map_skipping_report",
    "shard_assignment_balance",
    # round-4 wave 28: model fitting on sufficient statistics
    "gmm_em_1d",
    "cart_depth2_tree",
    "knn_loo_accuracy",
    # round-4 wave 29: embedding/text pipeline audits
    "jl_projection_fidelity",
    "feature_hash_collisions",
    "mojibake_stats",
    "ngram_novelty_scan",
    # round-4 wave 30: regression diagnostics
    "durbin_watson",
    "breusch_pagan",
    "granger_causality_1lag",
    "chow_break_test",
    # round-4 wave 31: survival + forecast evaluation
    "nelson_aalen_hazard",
    "forecast_accuracy_report",
    "pinball_quantile_eval",
    "croston_demand_forecast",
    # round-4 wave 32: drift distances + inequality
    "jensen_shannon_drift",
    "cramer_von_mises_binned",
    "mood_median_test",
    "atkinson_index_binned",
    # round-4 wave 33: Markov-chain behavioral analytics
    "markov_stationary_distribution",
    "markov_absorption_probabilities",
    "markov_entropy_rate",
    "markov_mixing_curve",
    # round-4 wave 34: relational surface + sketch algebra
    "unpivot_metrics",
    "order_lines_nested",
    "median_polish_weekday_month",
    "kmv_set_algebra",
    # round-4 wave 35: omnibus normality, ESD rounds, NMI, QQ drift
    "dagostino_k2",
    "esd_outlier_rounds",
    "nmi_lang_source",
    "qq_deciles_halves",
    # round-4 wave 36: feature engineering + robustness
    "rake_keyphrases",
    "target_encoding_smoothed",
    "feature_scaling_stats",
    "degree_attack_robustness",
    # round-4 wave 37: weighting, regularization, energy stats, split gains
    "ipf_raking_weights",
    "ridge_regression_path",
    "energy_distance_halves",
    "gini_gain_feature_ranking",
    # round-4 wave 38: revenue bridge, adstock, newsvendor, spectral step
    "revenue_bridge_decomposition",
    "adstock_grid_fit",
    "newsvendor_stock_levels",
    "power_iteration_top_pc",
    # round-4 wave 39: matching, dummy regression, stickiness, queueing
    "handshake_matching_stats",
    "december_effect_regression",
    "dau_wau_stickiness",
    "queueing_mmc_whatif",
    # round-6 wave 40: bounded exact-similarity front doors
    "set_similarity_topk",
    "set_similarity_counts",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Record host conditions BEFORE the JVM starts: on a shared host,
    # hypervisor CPU steal (measured 18.5% under load in round 8) moves
    # totals far more than any plan change — the artifact must say what
    # machine it ran on or round-over-round diffs are noise-reading.
    try:
        from tools.machine_health import probe

        machine = probe(seconds=8.0)
    except Exception:  # probe is diagnostic only — never fail the bench
        machine = {}
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen/datasource warm-up so q1 isn't charged for one-time init:
    # trivial codegen job + a parquet scan + a noop-sink write.
    spark.range(1000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    warm.write.format("noop").mode("overwrite").save()

    # best-of-2 per query: the second pass reuses compiled codegen and
    # warmed parquet footers, de-noising ambient CPU spikes and one-time
    # JIT cost that would otherwise be charged to whichever query ran
    # first (observed >2x run-to-run swing on identical plans).
    times: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
    total = round(sum(times.values()), 3)
    # second probe AFTER the sweep: steal varies minute-to-minute on this
    # host, so bracketing the run bounds the conditions it actually saw
    try:
        from tools.machine_health import probe as _probe_end

        machine_end = _probe_end(seconds=8.0)
    except Exception:
        machine_end = {}
    payload = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "machine": machine,
        "machine_end": machine_end,
    }
    # Sidecar artifact: the driver's BENCH_r{N}.json wrapper truncates
    # stdout to a ~2000-char tail, which silently drops most per-query
    # numbers from the official record (round-3 verdict #5).  Persist
    # the full compact payload next to the repo so round-over-round
    # diffs (tools/bench_diff.py) work from committed artifacts alone.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_FULL_latest.json"), "w") as fh:
        json.dump(payload, fh, sort_keys=True)
        fh.write("\n")
    # Immutable per-round snapshot (round-4 verdict #6): when the round
    # is known (SPARK_GRAFT_ROUND=5 or "r05"), also write
    # BENCH_FULL_r{NN}.json so round-over-round diffs never depend on a
    # mutable "latest".
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "").lstrip("rR")
    if rnd.isdigit():
        with open(
            os.path.join(here, f"BENCH_FULL_r{int(rnd):02d}.json"), "w"
        ) as fh:
            json.dump(payload, fh, sort_keys=True)
            fh.write("\n")
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
