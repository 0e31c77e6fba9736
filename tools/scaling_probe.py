"""Scaling evidence: run representative operators on 1x/4x/16x
replicas of the sf0.1 tables and fit the wall-time scaling exponent
(log-log slope).  An operator whose plan is O(n) should land near
slope 1.0; quadratic blowups show up as slope ~2 — this is the
empirical check behind every "scales linearly" claim in the
docstrings.  Writes SCALING.md.

Replica construction keeps the workload honest: document text is
word-suffixed per replica (so replicas are NOT near-duplicates of
each other and LSH candidate sets grow linearly, not
quadratically); events get disjoint user ranges per replica;
embedding corpora replicate with shifted ids while the query set
stays fixed.

Usage: python tools/scaling_probe.py [factors...]   (default 1 4 16)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

BASE = "/root/testdata/sf0.1"
OFF = 10_000_000

OPERATORS = [
    # round-15 additions
    "returns_impact_by_nation",
    "order_line_count_value_curve",
    "customer_yoy_retention_by_segment",
    "nation_order_value_median_gap",
    "priority_settlement_lift",
    "brand_size_price_slope",
    "supplier_balance_late_bands",
    "unit_price_consistency_by_type",
    "high_value_repeat_by_segment",
    "inter_session_gap_bands",
    "value_by_session_position",
    "rapid_fire_share_by_type",
    "session_count_duration_quadrants",
    "type_value_cv_by_hour",
    "consecutive_hour_user_overlap",
    "intra_session_type_diversity",
    "user_daypart_preference",
    "word_length_profile_by_lang",
    "intra_doc_repetition_by_source",
    "doc_half_jaccard_by_lang",
    "adjacent_vector_angle_bands",
    "window_new_user_share",
    "window_value_skew",
    "matview_rows_grain_read",
    "table_changes_since_timestamp",
    "table_history_audit",
    "type_adoption_lag",
    "order_value_band_status_mix",
    "window_user_value_concentration",
    "type_value_autocorr_lag1",
    "doc_length_norm_correlation",
    "discount_return_association",
    # round-14 additions
    "realized_vs_retail_by_discount",
    "matview_incremental_rollup",
    "window_value_quantiles",
    "window_type_churn",
    "supplier_nation_price_advantage",
    "brand_quarter_share_shift",
    "session_entry_hour_conversion",
    "event_value_pareto_by_type",
    "priority_escalation_matrix",
    "part_substitution_candidates",
    "order_value_theil_by_segment",
    "weekday_revenue_share_drift",
    "brand_supplier_concentration",
    "ship_gap_bands_by_priority",
    "type_affinity_lift",
    "retention_powerlaw_fit",
    "value_winsorized_means_by_type",
    "first_last_type_agreement",
    "user_weekly_cv_bands",
    "daily_count_dispersion_by_type",
    "stopword_density_bands",
    "sentence_length_percentiles_by_lang",
    "readability_composite_by_source",
    "char_trigram_oov_by_source",
    "label_silhouette_proxy",
    "embedding_norm_percentiles_by_label",
    "dimension_variance_topk",
    "table_changes_rollup",
    # round-13 additions
    "purchase_regularity_bands",
    "enrich_channel_value",
    "supplier_share_trend_movers",
    "dup_cluster_lang_purity",
    "user_lifetime_km_curve",
    "session_handoff_matrix",
    "session_value_by_duration_band",
    "user_dominant_type_share",
    "hourly_error_pchart",
    "conversion_latency_weekly",
    "error_budget_burn_daily",
    "first_vs_later_sessions",
    "value_by_line_position",
    "part_name_term_premium",
    "quarter_end_loading",
    "reactivated_order_value_gap",
    "supplier_portfolio_diversity",
    "price_interaction_type_size",
    "source_unigram_jsd",
    "lang_profile_confusion",
    "dup_quality_gap",
    "doc_length_anova_by_lang",
    "knn_purity_at_k",
    "vector_margin_histogram",
    "pq_code_balance",
    "embedding_dim_correlation_pairs",
    "window_topk_types",
    "dedup_survivor_selection",
    "packing_efficiency_curve",
    # round-12 batch-2 additions
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
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "token_counts",
    "lang_id",
    "ann_brute_force_topk",
    "sessionization_stats",
    "latest_event_per_user",
    "quality_repetition_rules",
    "contamination_check",
    "pack_sequences",
    "heavy_hitters_sketch",
    "doc_typicality",
    "rolling_uniques_7d",
    "funnel_windowed_24h",
    # round-4 operators (VERDICT r4 item 8)
    "dedup_clusters",
    "ann_kmeans_ivf_topk",
    "embedding_cluster_profile",
    "cohort_ltv",
    "mau_rollup_sketch",
    "top_event_paths",
    # round-5 operators
    "bm25_search",
    "dup_ngram_spans",
    "power_user_curve",
    "value_histogram",
    "doc_chunking",
    "quality_top_quartile",
    "user_lifecycle_grid",
    "funnel_with_exclusion",
    "source_dup_matrix",
    "vocab_coverage",
    "events_pivot_daily",
    "hourly_counts_gapfilled",
    "segment_overlap_matrix",
    "user_metric_correlation",
    "sliding_window_counts",
    "event_transition_matrix",
    "q1_pricing_summary",
    "q9_product_profit",
    "q13_order_distribution",
    "q16_part_supplier_counts",
    # round-5 second-wave operators
    "quantile_rollup_sketch",
    "theta_segment_setops",
    "attribution_last_touch",
    "priority_sample",
    "dataset_splits",
    "training_shuffle",
    "sparse_tfidf_pairs",
    "hybrid_search",
    "ann_pq_topk",
    "session_entry_exit",
    "rollup_reuse_monthly",
    "funnel_unordered",
    "padding_efficiency",
    "daily_new_vs_returning",
    "market_basket_part_types",
    # round-6 operators (media_* dedup queries are EXCLUDED: their
    # planted oracle fixture is pinned to 400 assets by design, so a
    # scaling row over it would measure a constant workload; their
    # skew/scale guards are asserted directly in tests/test_multimodal.py)
    "q11_important_stock",
    "q18_large_volume_customers",
    "q21_suppliers_kept_waiting",
    "lexical_rarity",
    "order_backlog_daily",
    "revenue_pareto_top100",
    "semantic_contamination",
    "attribution_linear",
    "ship_latency_quartiles",
    "metric_correlation_matrix",
    "weekly_seasonality_autocorr",
    "ann_filtered_topk",
    "dedup_incremental_batch",
    "source_signature_terms",
    # round-7 operators
    "ann_filtered_ivf_topk",
    "dup_span_extents",
    "span_dedup_savings",
    "attribution_time_decay",
    "inter_event_time_quantiles",
    "source_vocab_overlap",
    "dedup_precision_audit",
    "funnel_step_latency",
    # round-8 operators (ann_filtered_ivf_indexed builds its artifact
    # per scale dir — its row measures build+probe, the steady-state
    # probe alone is strictly cheaper)
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
    # round-9 operators
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
    # round-10 operators
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
]

# Probe variants: (row label, queries() op, docs transform).  The
# boilerplate variant prefixes EVERY document with the same sentence
# (unsuffixed across replicas, so its shingles' df grows ∝ N and
# saturates sparse_tfidf_pairs' absolute df cap) — the planted
# worst case for the posting-list bound.
BOILER = (
    "standard legal disclaimer the contents of this document are provided "
    "as is without warranty of any kind either express or implied"
)
VARIANTS = [
    ("sparse_tfidf_pairs_boilerplate", "sparse_tfidf_pairs", "boiler"),
]


def _peak_bucketed(spark, d):
    from rakam_api_spark.analytics.events3 import (
        peak_concurrent_sessions_daily,
    )

    return peak_concurrent_sessions_daily(spark, d, bucketed=True)


# Custom-callable rows: (label, fn(spark, sf_dir) -> DataFrame), run
# on the standard scaled dirs — for strategy variants the queries()
# surface auto-gates away at probe sizes (the bucketed sweep's gate
# is 2M events; 16× sf0.1 is 1.6M).
CUSTOM = [
    ("peak_concurrent_bucketed", _peak_bucketed),
]


def build_scaled(spark, factor: int, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    # region/nation stay fixed (genuinely constant-size dims); the
    # star around them scales with disjoint key ranges per replica —
    # part/supplier/customer keys AND the fact FKs referencing them —
    # so every join and aggregation key space truly grows with the
    # factor (a replica that repeats the same partkeys would leave
    # e.g. the q16 post-distinct pair set constant and understate
    # shuffle growth)
    for t in ("region", "nation"):
        os.symlink(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")

    def _scaled(name: str, key_cols: list[str]) -> None:
        df = spark.read.parquet(f"{BASE}/{name}.parquet")
        parts = []
        for i in range(factor):
            p = df
            for c in key_cols:
                p = p.withColumn(c, F.col(c) + i * OFF)
            parts.append(p)
        _union_all(parts).write.mode("overwrite").parquet(f"{out}/{name}.parquet")

    _scaled("part", ["p_partkey"])
    _scaled("supplier", ["s_suppkey"])
    _scaled("customer", ["c_custkey"])
    _scaled("orders", ["o_orderkey", "o_custkey"])
    _scaled("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    doc_parts = [
        docs.select(
            (F.col("doc_id") + i * OFF).alias("doc_id"),
            # suffix every word so replicas share no shingles
            F.regexp_replace(F.col("text"), r"(\S+)", f"$1r{i}").alias("text")
            if i
            else F.col("text"),
            "lang",
            "source",
            "n_chars",
        )
        for i in range(factor)
    ]
    _union_all(doc_parts).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    ev = spark.read.parquet(f"{BASE}/events.parquet")
    ev_parts = [
        ev.select(
            (F.col("event_id") + i * OFF).alias("event_id"),
            "ts",
            (F.col("user_id") + i * OFF).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for i in range(factor)
    ]
    _union_all(ev_parts).write.mode("overwrite").parquet(f"{out}/events.parquet")

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    emb_parts = [
        emb.select((F.col("vec_id") + i * OFF).alias("vec_id"), "embedding", "label")
        for i in range(factor)
    ]
    _union_all(emb_parts).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")


def _union_all(parts):
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_boiler_variant(spark, src_dir: str, out: str) -> None:
    """Variant of a scaled dir whose documents all share the same
    boilerplate prefix (same bytes in every replica): its shingles'
    df equals the full corpus size at every factor — the saturated
    hot-key case for the sparse pair join's absolute df cap."""
    os.makedirs(out, exist_ok=True)
    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "embeddings",
    ):
        if not os.path.exists(f"{out}/{t}.parquet"):
            os.symlink(f"{src_dir}/{t}.parquet", f"{out}/{t}.parquet")
    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    docs.withColumn("text", F.concat(F.lit(BOILER + " "), F.col("text"))).write.mode(
        "overwrite"
    ).parquet(f"{out}/documents.parquet")


def _merge_existing(results: dict, factors: list[int], all_rows: list[str]) -> None:
    """Subset-run support: carry forward rows from the existing
    SCALING.md for operators not probed this run (their cells must
    match this run's factor columns to be reusable)."""
    if not os.path.exists("/root/repo/SCALING.md"):
        return
    header = f"| operator | " + " | ".join(f"{f}× (s)" for f in factors) + " | slope |"
    with open("/root/repo/SCALING.md") as fh:
        old = {
            line.split("|")[1].strip(): line.rstrip()
            for line in fh
            if line.startswith("| ") and not line.startswith(("| operator", "|---"))
        }
    for op in all_rows:
        if op not in results or not results[op]:
            if op in old:
                results[op] = old[op]  # keep the verbatim old row


def main() -> None:
    import math

    import __spark_entry__ as entrymod
    from rakam_api_spark.session import get_spark

    args = [a for a in sys.argv[1:]]
    only: set[str] | None = None
    if args and args[0] == "--ops":
        only = set(args[1].split(","))
        args = args[2:]
    factors = [int(x) for x in args] or [1, 4, 16]
    spark = get_spark("scaling-probe")
    spark.range(1).count()
    qs = entrymod.queries()
    work = tempfile.mkdtemp(prefix="scaling_")
    all_rows = (
        OPERATORS
        + [label for label, _, _ in VARIANTS]
        + [label for label, _ in CUSTOM]
    )
    results: dict[str, dict[int, float]] = {op: {} for op in all_rows}

    def probe(label: str, op, d: str, f: int) -> None:
        fn = op if callable(op) else qs[op]
        runs = []
        for _ in range(2):
            t0 = time.time()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        results[label][f] = round(min(runs), 2)
        print(f"x{f} {label}: {results[label][f]}s", flush=True)

    try:
        for f in factors:
            d = os.path.join(work, f"x{f}")
            build_scaled(spark, f, d)
            for op in OPERATORS:
                if only is None or op in only:
                    probe(op, op, d, f)
            for label, fn in CUSTOM:
                if only is None or label in only:
                    probe(label, fn, d, f)
            variants = [v for v in VARIANTS if only is None or v[0] in only]
            if variants:
                vd = os.path.join(work, f"x{f}_boiler")
                build_boiler_variant(spark, d, vd)
                for label, op, _kind in variants:
                    probe(label, op, vd, f)
        _merge_existing(results, factors, all_rows)
        lines = [
            "# SCALING — measured wall-time vs corpus size",
            "",
            f"Generated by `tools/scaling_probe.py` on replicas of `{BASE}` "
            f"(factors {factors}; per-cell min of 2 runs, noop sink).",
            "",
            "**slope** = log(t_max/t_1)/log(factor_max): ~1.0 ⇒ linear scaling, "
            "~2.0 ⇒ quadratic (a plan that would NOT survive 100 TB).  Sub-linear "
            "slopes mean fixed per-job overhead still dominates at this size.",
            "",
            "| operator | " + " | ".join(f"{f}× (s)" for f in factors) + " | slope |",
            "|---|" + "---|" * (len(factors) + 1),
        ]
        fmax = max(factors)
        for op in all_rows:
            r = results[op]
            if isinstance(r, str):
                lines.append(r)  # carried forward from the prior run
                continue
            if not r:
                continue
            slope = math.log(r[fmax] / r[factors[0]]) / math.log(fmax / factors[0])
            lines.append(
                f"| {op} | " + " | ".join(str(r[f]) for f in factors) + f" | {slope:.2f} |"
            )
        with open("/root/repo/SCALING.md", "w") as fh:
            fh.write("\n".join(lines) + "\n")
        print("wrote SCALING.md")
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
