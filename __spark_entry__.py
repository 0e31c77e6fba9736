"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` /
``oracle_sql()`` enumerate every implemented operator from
SURVEY.md §2 with its DuckDB oracle.  Implementations live in
``rakam_api_spark``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rakam_api_spark.analytics import cdf_queries as _cdf
from rakam_api_spark.analytics import enrichment_queries as _enrich
from rakam_api_spark.analytics import events as _events
from rakam_api_spark.analytics import events2 as _events2
from rakam_api_spark.analytics import events3 as _events3
from rakam_api_spark.analytics import events4 as _events4
from rakam_api_spark.analytics import events5 as _events5
from rakam_api_spark.analytics import relational as _relational
from rakam_api_spark.analytics import relational2 as _relational2
from rakam_api_spark.analytics import relational3 as _relational3
from rakam_api_spark.analytics import relational4 as _relational4
from rakam_api_spark.analytics import relational5 as _relational5
from rakam_api_spark.analytics import relational6 as _relational6
from rakam_api_spark.llm import curation as _curation
from rakam_api_spark.llm import dedup as _dedup
from rakam_api_spark.llm import dedup_index as _dedup_index
from rakam_api_spark.llm import multimodal as _multimodal
from rakam_api_spark.llm import search as _search
from rakam_api_spark.llm import similarity as _similarity
from rakam_api_spark.llm import text as _text
from rakam_api_spark.llm import text2 as _text2
from rakam_api_spark.llm import vectors as _vectors
from rakam_api_spark.streaming import windows as _windows

_MODULES = (
    _relational,
    _relational2,
    _relational3,
    _relational4,
    _relational5,
    _relational6,
    _events,
    _events2,
    _events3,
    _events4,
    _events5,
    _enrich,
    _cdf,
    _windows,
    _dedup,
    _dedup_index,
    _similarity,
    _text,
    _text2,
    _vectors,
    _curation,
    _multimodal,
    _search,
)

# The driver's correctness gate checks at most 50 queries per round, in
# enumeration order.  With 330+ declared queries, plain module order
# would starve the tail modules of a driver-verified CORRECTNESS row
# forever.  Round-14 rotation (VERDICT r13 Next #1, histogram recomputed
# from CORRECTNESS_r01..r13 keys: r6=28, r7=41, r8=2, r9=33 stale):
# (a) the 29 round-13 additions the driver has NEVER checked lead;
# (b) slots 30-50 take 21 of the 28 queries last driver-checked in
# ROUND 6 (the stalest cohort).  Slots 51+ queue for round 15: the r6
# remainder (7), then the r7 cohort (41).  Everything listed passes
# tools/check_correctness.py locally at sf0.01 and sf0.001.
_GATE_PRIORITY = (
    # (a) round-13 additions, never driver-checked (29)
    "conversion_latency_weekly",
    "dedup_survivor_selection",
    "doc_length_anova_by_lang",
    "dup_cluster_lang_purity",
    "dup_quality_gap",
    "embedding_dim_correlation_pairs",
    "enrich_channel_value",
    "error_budget_burn_daily",
    "first_vs_later_sessions",
    "hourly_error_pchart",
    "knn_purity_at_k",
    "lang_profile_confusion",
    "packing_efficiency_curve",
    "part_name_term_premium",
    "pq_code_balance",
    "price_interaction_type_size",
    "purchase_regularity_bands",
    "quarter_end_loading",
    "reactivated_order_value_gap",
    "session_handoff_matrix",
    "session_value_by_duration_band",
    "source_unigram_jsd",
    "supplier_portfolio_diversity",
    "supplier_share_trend_movers",
    "user_dominant_type_share",
    "user_lifetime_km_curve",
    "value_by_line_position",
    "vector_margin_histogram",
    "window_topk_types",
    # (b) last driver-checked in ROUND 6 (slots 30-50; 21 of 28)
    "dataset_splits",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "doc_fingerprints",
    "embedding_cosine_dedup",
    "funnel_unordered",
    "key_skew_report",
    "lang_id",
    "market_basket_part_types",
    "multimodal_byte_stats",
    "order_backlog_daily",
    "part_type_margin",
    "priority_sample",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "quantile_rollup_sketch",
    "revenue_pareto_top100",
    "rollup_reuse_monthly",
    # (c) queued for round 15: the r6 remainder (7) ...
    "session_entry_exit",
    "sparse_tfidf_pairs",
    "text_quality",
    "theta_segment_setops",
    "token_counts",
    "top_customers",
    "training_shuffle",
    # ... then the r7-stale cohort (41)
    "ab_test_lift",
    "ann_filtered_ivf_topk",
    "attribution_time_decay",
    "big_ticket_orders",
    "cheapest_order_per_customer_sql",
    "cohort_ltv",
    "customer_order_stats",
    "customers_no_recent_orders",
    "daily_anomaly_zscore",
    "daily_value_moving_avg",
    "dau",
    "dup_span_extents",
    "engaged_user_days_setops",
    "enrich_geoip",
    "enrich_useragent",
    "event_type_hourly_share",
    "funnel_signup_click_purchase",
    "funnel_step_latency",
    "funnel_windowed_24h",
    "inter_event_time_quantiles",
    "late_sole_supplier",
    "media_resize_stats",
    "order_rank_in_customer",
    "orders_cube",
    "orders_rollup",
    "part_value_concentration",
    "props_variant_stats",
    "q4_order_priority",
    "q6_forecast_revenue",
    "retention_cohorts",
    "revenue_grouping_sets_sql",
    "seg_daily_event_counts",
    "sessionization_stats",
    "source_vocab_overlap",
    "span_dedup_savings",
    "time_to_convert",
    "top_event_paths",
    "top_event_values",
    "user_metric_correlation",
    "user_profile_snapshot",
    "value_percentiles",
)


def _prioritized(mapping: dict) -> dict:
    out = {k: mapping[k] for k in _GATE_PRIORITY if k in mapping}
    out.update((k, v) for k, v in mapping.items() if k not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: segmentation over
    the events stream (daily counts/uniques per event type)."""
    return _events.seg_daily_event_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return _prioritized(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return _prioritized(out)
