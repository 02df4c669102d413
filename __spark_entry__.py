"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship co-movement pipeline at
sf0.001; ``queries()``/``oracle_sql()`` expose the full operator catalog
(knot_another_pipeline_spark.catalog_queries) for the sf0.01 DuckDB
differential gate.

Ordering note: the driver's correctness gate has emitted exactly the
first 50 dict keys every round since r03.  After round 8 every catalog
key has a green driver CORRECTNESS row (cumulative 249/249), so from
round 9 the window is a ROLLING REGRESSION GATE (VERDICT r8 task #1):
this round's never-gated additions lead (<=15 cap), then every
already-gated key in staleness order — ascending by the round of its
latest CORRECTNESS row, alphabetical within a round — so the keys that
have gone longest without a driver re-check (the r2/r4 flagships
``ais_hourly``, ``pairs_monthly``, ``stable_bucket``, ...) are re-gated
first.  Every key is still present — the in-repo DuckDB differential
(tests/test_catalog_oracle.py) covers all of them every run regardless
of driver window size.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from knot_another_pipeline_spark.catalog_queries import ORACLES, QUERIES

# Round-9 additions: never driver-gated, so they lead the window.
# Capped at 15 so the 50-key window re-gates >=35 stale keys.
# Over-cap round-9 additions (heavy_hitters, deterministic_walks,
# reach_census, isotonic_calibration, cuped_readout, theil_sen,
# holt_forecast, fdr_adjust, mann_kendall, kruskal_wallis,
# jackknife_ratio, capture_recapture, mcnemar_readout, cochran_q,
# hosmer_lemeshow, mde_power, oneway_anova, levene_test, periodogram,
# lag_correlation, hilbert_key, layout_pruning, msprt_readout,
# qte_readout, lsh_tuning, srm_check, holm_adjust, forecast_revenue,
# returned_revenue, priority_linestatus, promo_revenue, assortativity,
# reciprocity, ljung_box, hurst_exponent, delong_auc, fleiss_kappa,
# energy_drift, twonn_dim, smd_balance) are parked
# AFTER the 50-key
# window — covered by the in-repo DuckDB differential now, first in
# line for round-10's _NEW_KEYS slot.
_NEW_KEYS: list[str] = [
    # round-9 additions:
    "substring_dedup",
    "duplication_rate",
    "dedup_clean_text",
    "min_cost_supplier",
    "important_stock",
    "top_supplier_revenue",
    "supplier_part_variety",
    "dominant_part_suppliers",
    "window_funnel",
    "average_precision",
    "split_contamination",
    "shipping_priority",
    "nation_trade_volume",
    "market_share",
    "product_profit",
]

# Every already-gated key, stalest first: ascending round of the key's
# latest row across the git-TRACKED CORRECTNESS_r{1..8}.json artifacts,
# alphabetical within a round (media_resize: r2; ais_hourly ..
# value_percentiles: r4; then r5, r6, r7, r8 blocks).  Regenerate with
# tools/queue_order.py if the artifact set changes.
_STALE_ROTATION = [
    "media_resize",
    "ais_hourly",
    "ann_lsh",
    "clean_lines",
    "contamination",
    "corpus_prep",
    "customers_with_orders",
    "customers_without_orders",
    "daily_counts",
    "dedup_components",
    "dedup_latest",
    "doc_fingerprint",
    "domain_mix",
    "embedding_dedup",
    "event_breakdown",
    "exact_dedup",
    "hash_sample",
    "ivf_ann",
    "knn_bruteforce",
    "lang_id",
    "media_features",
    "media_frames",
    "media_meta",
    "minhash_pairs",
    "minhash_signatures",
    "ngram_jaccard",
    "normalize_ts",
    "pairs_monthly",
    "pairs_total",
    "pii_scrub",
    "pricing_summary",
    "quality_filter",
    "regional_volume",
    "repetition_stats",
    "semantic_dedup",
    "sessionize",
    "shard_assign",
    "simhash",
    "simhash_pairs",
    "split_assign",
    "stable_bucket",
    "text_stats",
    "token_budget",
    "token_counts",
    "top_customers",
    "top_order_per_customer",
    "track_export",
    "track_paths",
    "user_set_ops",
    "value_percentiles",
    "winnow_fingerprint",
    "asof_join",
    "bloom_prune",
    "bm25_search",
    "build_vocab",
    "cdc_apply",
    "chunk_documents",
    "cohort_retention",
    "contract_checks",
    "conversion_attribution",
    "decayed_engagement",
    "dq_reconcile",
    "dwell_segments",
    "embedding_centroids",
    "funnel_steps",
    "grouped_topk",
    "grouped_totals",
    "histogram_drift",
    "histogram_quantiles",
    "hybrid_search",
    "incremental_dedup",
    "interval_merge",
    "journey_topk",
    "kmv_distinct",
    "kmv_rollup",
    "lm_score",
    "ntile_deciles",
    "pagerank",
    "period_over_period",
    "pmi_topk",
    "prefix_jaccard",
    "radius_pairs",
    "range_join",
    "reaggregate_monthly",
    "resample_daily",
    "rolling_stats",
    "salted_agg",
    "scd2_history",
    "skew_join",
    "snapshot_diff",
    "speed_filter",
    "stratified_cap",
    "stratified_sample",
    "table_profile",
    "triangle_stats",
    "unpivot_metrics",
    "upsert",
    "weighted_sample",
    "winsorized_stats",
    "ab_test",
    "ann_recall",
    "anomaly_zscore",
    "auc_scores",
    "benford",
    "bpe_encode",
    "bpe_merges",
    "calibration_curve",
    "canonical_docs",
    "dataset_card",
    "dsir_weights",
    "encode_documents",
    "ewma_alarm",
    "fuzzy_match",
    "hash_features",
    "json_extract_stats",
    "k_anonymity",
    "keyword_search",
    "kmeans_step",
    "label_vote",
    "length_percentile_rank",
    "lift_table",
    "link_prediction",
    "mad_outliers",
    "markov_transitions",
    "media_chunks",
    "media_phash",
    "negative_samples",
    "next_event_examples",
    "ngram_topk",
    "normalize_docs",
    "pack_sequences",
    "phrase_search",
    "pivot_daily",
    "psi_stability",
    "quantize_embeddings",
    "repeated_spans",
    "scd2_as_of",
    "scd2_lookup",
    "sketch_overlap",
    "survival_curve",
    "target_encode",
    "temperature_mix",
    "time_weighted_avg",
    "token_entropy",
    "track_interpolate",
    "value_histogram",
    "weighted_median",
    "zone_assign",
    "zorder_key",
    "acf_daily",
    "basket_rules",
    "bigram_lm",
    "bootstrap_ci",
    "categorical_psi",
    "changepoint",
    "chi2_independence",
    "cluster_quality",
    "cms_counts",
    "containment_pairs",
    "correlation_matrix",
    "covisitation_llr",
    "cusum_alarm",
    "dedup_prf",
    "dedup_summary",
    "did_readout",
    "doc_keywords",
    "effective_sample_size",
    "feature_gain",
    "funnel_timing",
    "gini_concentration",
    "hits_authority",
    "hll_distinct",
    "ips_policy_value",
    "join_health",
    "k_core_parts",
    "ks_drift",
    "label_agreement",
    "label_propagation",
    "linkage_em",
    "linkage_scores",
    "linkage_weights",
    "max_concurrency",
    "mmr_diversify",
    "ngram_novelty",
    "pca_power",
    "personalized_pagerank",
    "random_projection",
    "ranking_metrics",
    "readability",
    "rfm_segments",
    "seasonal_daily",
    "slice_diversity",
    "sorted_neighborhood",
    "spearman_hour",
    "tokenizer_fertility",
    "trend_fit",
    "uplift_deciles",
    "weighted_quantiles",
    "woe_iv",
    "audience_overlap",
    "big_order_customers",
    "binned_mutual_info",
    "blocking_quality",
    "boilerplate_lines",
    "bradley_terry",
    "brier_decomposition",
    "class_weights",
    "classification_report",
    "cluster_purity",
    "community_quality",
    "conformal_threshold",
    "cumulative_users",
    "customer_distribution",
    "dbscan_grid",
    "dedup_pr_curve",
    "dim_truncation",
    "disjunctive_revenue",
    "embedding_drift",
    "fano_burstiness",
    "group_fairness",
    "idle_customers",
    "join_cardinality",
    "kendall_profiles",
    "knn_label_noise",
    "mann_whitney",
    "od_matrix",
    "oov_rate",
    "order_priority",
    "pareto_front",
    "poisson_rate_ci",
    "profile_drift",
    "proportion_test",
    "quantile_normalize",
    "rank_movers",
    "regression_report",
    "reweight_to_target",
    "seasonal_naive_error",
    "segment_dedup",
    "shard_moves",
    "signal_gaps",
    "silhouette",
    "small_qty_revenue",
    "source_terms",
    "tfidf_cosine_pairs",
    "track_length",
    "track_sinuosity",
    "waiting_suppliers",
    "wasserstein_drift",
    "zipf_fit",
]

_PRIORITY = _NEW_KEYS + _STALE_ROTATION


def _ordered_keys() -> list[str]:
    head = [k for k in _PRIORITY if k in QUERIES]
    seen = set(head)
    return head + [k for k in QUERIES if k not in seen]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: hourly-rollup →
    co-movement pairs → overlap scores (the reference's gold pipeline)."""
    from knot_another_pipeline_spark.catalog_queries import q_pairs_monthly

    return q_pairs_monthly(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {k: QUERIES[k] for k in _ordered_keys()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (rows-only checks omitted)."""
    return {k: ORACLES[k] for k in _ordered_keys() if k in ORACLES}
