"""Benchmark harness: runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized via collect() on the final result (the
result sets are small; the work is in the scans/joins/shuffles).
Every query runs twice and the per-query MIN is reported: the first
run pays one-off plan compilation (Janino codegen) and page-cache
warmup, the second measures steady-state execution — the number that
scales.  The cold total is reported alongside as ``cold_value``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from rakam_api_spark.session import get_spark

# FROZEN since round 1 — the longitudinal anchor (VERDICT r10 Next
# #6): never add to or remove from this list; growth goes to EXTRA.
# ``value`` in the output is the sum over exactly these 17 queries,
# directly comparable across rounds (r1 anchor: 24.222 s warm).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q4_order_priority",
    "order_rank_in_customer",
    "asof_view_before_purchase",
    "enrich_pipeline_full",
    "seg_daily_event_counts",
    "funnel_signup_click_purchase",
    "retention_cohorts",
    "sessionization_stats",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_brute_force_topk",
    "text_quality",
    "token_counts",
]

# Round-5/6 families, timed identically but reported under
# ``queries_extra`` and EXCLUDED from the headline total so the
# total stays comparable across rounds.
EXTRA = [
    "q9_product_profit",
    "q10_returned_items",
    "q16_part_supplier_counts",
    "bm25_search",
    "dup_ngram_spans",
    "doc_chunking",
    "user_lifecycle_grid",
    "source_dup_matrix",
    "quantile_rollup_sketch",
    "theta_segment_setops",
    "attribution_last_touch",
    "training_shuffle",
    "hybrid_search",
    "sparse_tfidf_pairs",
    # round-6 additions
    "q18_large_volume_customers",
    "q21_suppliers_kept_waiting",
    "lexical_rarity",
    "order_backlog_daily",
    "media_video_dedup",
    # round-7 additions
    "ann_filtered_ivf_topk",
    "dup_span_extents",
    "span_dedup_savings",
    "attribution_time_decay",
    "inter_event_time_quantiles",
    "source_vocab_overlap",
    "dedup_precision_audit",
    "funnel_step_latency",
    "media_resize_stats",
    # round-8 additions
    "ann_filtered_ivf_indexed",
    "ann_recall_audit",
    "inter_event_cadence_sketch",
    "session_bounce_rate",
    "event_cooccurrence_pmi",
    "user_activity_entropy",
    "doc_length_histogram",
    "bpe_merge_candidates",
    "crosslingual_mining",
    "session_gap_curve",
    "unordered_funnel_completion",
    "embedding_drift_by_label",
    "customer_migration_matrix",
    "dedup_threshold_curve",
    "supplier_reliability_wilson",
    "doc_ngram_novelty",
    "cluster_safe_splits",
    "lm_bigram_quality",
    "event_transition_probs",
    "rfm_quartiles",
    "part_copurchase_pairs",
    "knn_label_propagation",
    # round-9 additions
    "nation_trade_balance",
    "order_gap_stats",
    "running_revenue_share",
    "attribution_position_based",
    "event_burstiness",
    "session_depth_distribution",
    "label_centroid_similarity",
    "embedding_label_outliers",
    "zipf_slope_by_source",
    "dedup_savings_by_source",
    "doc_prefix_duplication",
    "ivf_cell_balance",
    "order_priority_drift",
    "supplier_hhi",
    "dedup_cluster_size_histogram",
    "customer_order_streaks",
    "supplier_late_streaks",
    "discount_elasticity_by_priority",
    "benford_price_audit",
    "order_survival_curve",
    "part_price_index_quarterly",
    "embedding_norm_audit",
    "orders_seasonality_index",
    # round-10 additions
    "parts_price_size_skyline",
    "customer_gini_by_segment",
    "revenue_qoq_growth",
    "churn_hazard_by_tenure",
    "first_event_type_by_cohort",
    "ttr_by_source",
    "hapax_ratio_by_source",
    "char_class_composition",
    "dataset_card_stats",
    "sampling_temperature_weights",
    "ivf_nprobe_recall_curve",
    "dedup_transitivity_audit",
    "pq_reconstruction_error",
    "customer_repeat_within_90d",
    "order_composition_trend",
    "session_conversion_by_entry",
    "wau_wow_growth",
    "embedding_intrinsic_dim",
    "discount_by_quantity_bucket",
    "order_value_lognormal_fit",
    "type_diversity_trend",
    "lsh_band_efficiency",
    "brand_repeat_loyalty",
    "domestic_supply_share",
    "hour_of_week_profile",
    "session_duration_by_entry",
    "value_mix_by_type_monthly",
    "supplier_latency_consistency",
    # round-11 additions
    "lineitem_field_correlations",
    "order_size_histogram",
    "weekday_hour_peak_per_type",
    "sessions_per_user_histogram",
    "word_freq_top50",
    "avg_word_len_by_lang",
    "centroid_confusion_matrix",
    "daily_value_cusum",
    "order_weekday_priority_mix",
    "customer_interpurchase_gaps",
    "acctbal_decile_profile",
    "brand_return_rate_quarterly",
    "retail_markup_by_type",
    "customer_decile_revenue_share",
    "region_trade_matrix",
    "new_vs_returning_daily",
    "resurrections_monthly",
    "user_entropy_tiers",
    "weekend_lift_by_type",
    "first_week_activation_retention",
    "value_share_by_user_band",
    "sentence_stats_by_source",
    "doc_length_gini_by_source",
    "shouting_docs_top20",
    "token_length_histogram",
    "embedding_dimension_profile",
    "label_centroid_distances",
    # round-12 additions
    "customer_decile_share_twopass",
    "part_size_value_bands",
    "nation_type_specialization",
    "supplier_acctbal_by_nation",
    "peak_concurrent_sessions_daily",
    "value_p90_concentration_by_type",
    "max_dormancy_histogram",
    "heaps_vocab_growth",
    "token_entropy_by_source",
    "intra_inter_label_affinity",
    "supply_degree_histogram",
    "order_value_boxplot_monthly",
    "event_type_user_jaccard",
    "centroid_nearest_rival",
    "basket_size_by_segment",
    "user_journey_endpoints",
    "doc_length_quartiles_by_source",
    "user_active_streak_histogram",
    "session_first_purchase_position",
    "event_type_run_lengths",
    "customer_onetime_vs_repeat_revenue",
    "order_lines_value_matrix",
    "nation_revenue_rank_shift",
    "char_bigram_entropy_by_lang",
    "word_pmi_top_pairs",
    "centroid_distance_histogram",
    "dimension_discriminability",
    "event_type_daily_share_volatility",
    "night_owl_vs_early_bird",
    "repeat_customer_value_uplift",
    "discount_tax_margin_grid",
    "source_lang_mix",
    "embedding_quantization_sensitivity",
    "value_by_event_ordinal",
    "top_value_sessions",
    "customer_balance_vs_spend_quadrant",
    "lang_id_prf",
    "tokenizer_fertility_by_lang",
    "embedding_exact_dup_groups",
    "session_conversion_by_depth",
    "order_value_zscore_outliers",
    "part_brand_price_dispersion",
    "monthly_revenue_seasonality_strength",
    "quantity_uniformity_chi2",
    "order_value_percentiles_by_segment",
    "supplier_dependency_risk",
    "brand_cross_region_price_gap",
    "error_recovery_time",
    "price_trend_slope_by_type",
    "cohort_value_retention",
    "length_quality_correlation",
    "doc_boilerplate_ngram_share",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("rakam-api-spark-bench")
    qs = entrymod.queries()

    # warm the JVM + parquet footers with one tiny action
    spark.range(1).count()

    def _time(names: list[str]) -> tuple[dict[str, float], dict[str, float]]:
        warm: dict[str, float] = {}
        first: dict[str, float] = {}
        for name in names:
            runs = []
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, sf_dir).collect()
                runs.append(time.time() - t0)
            first[name] = round(runs[0], 3)
            warm[name] = round(min(runs), 3)
        return warm, first

    times, cold = _time(HEADLINE)
    extra, _ = _time(EXTRA)

    # ingest-path throughput (the reference's hot path): ND-JSON bulk
    # through parse → infer/evolve → enrich → coerce → append
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from bench_ingest import run_ingest_bench

    ingest = run_ingest_bench(spark, n_events=200_000)

    total = round(sum(times.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "queries_extra": extra,
                "cold_value": round(sum(cold.values()), 3),
                **ingest,
                "sf": sf_val,
            }
        )
    )
    # Compact summary LAST: the full line above has grown past the
    # driver's 2000-char tail capture (BENCH_r08.json recorded a null
    # parse), so re-emit just the headline numbers as a second,
    # always-capturable JSON line.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "cold_value": round(sum(cold.values()), 3),
                # the longitudinal anchor, spelled out: ``value`` is
                # the FROZEN r1 17-query set; extras carry all growth
                "headline_fixed": total,
                "n_headline_fixed": len(times),
                "extra_total": round(sum(extra.values()), 3),
                "n_queries": len(times) + len(extra),
                "ingest_eps": ingest.get("ingest_eps"),
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
