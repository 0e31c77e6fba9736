"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` /
``oracle_sql()`` enumerate every implemented operator from
SURVEY.md §2 with its DuckDB oracle.  Implementations live in
``rakam_api_spark``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rakam_api_spark.analytics import enrichment_queries as _enrich
from rakam_api_spark.analytics import events as _events
from rakam_api_spark.analytics import events2 as _events2
from rakam_api_spark.analytics import relational as _relational
from rakam_api_spark.analytics import relational2 as _relational2
from rakam_api_spark.analytics import relational3 as _relational3
from rakam_api_spark.llm import curation as _curation
from rakam_api_spark.llm import dedup as _dedup
from rakam_api_spark.llm import dedup_index as _dedup_index
from rakam_api_spark.llm import multimodal as _multimodal
from rakam_api_spark.llm import search as _search
from rakam_api_spark.llm import similarity as _similarity
from rakam_api_spark.llm import text as _text
from rakam_api_spark.streaming import windows as _windows

_MODULES = (
    _relational,
    _relational2,
    _relational3,
    _events,
    _events2,
    _enrich,
    _windows,
    _dedup,
    _dedup_index,
    _similarity,
    _text,
    _curation,
    _multimodal,
    _search,
)

# The driver's correctness gate checks at most 50 queries per round, in
# enumeration order.  With 224 declared queries, plain module order
# would starve the tail modules of a driver-verified CORRECTNESS row
# forever.  Round-10 rotation (staleness computed from
# CORRECTNESS_r01-r09; matches VERDICT r9 Next #3 exactly): (a) queries
# added this round lead (new code always verifies first); (b) the
# twenty-two r5-stale rows VERDICT r9 names verbatim; (c) the r6-stale
# cohort (q1/q3/q5, dedup family, sketches, curation staples) in
# staleness-then-name order, as many as fit the 50-slot budget.
# Everything listed passes tools/check_correctness.py locally at
# sf0.01 and sf0.001 (round-10 additions also at sf0.1).
_GATE_PRIORITY = (
    # (a) added this round — see the round-10 sections of QUERIES.md
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
    # (b) the r5-stale cohort (VERDICT r9 Next #3, verbatim order)
    "event_transition_matrix",
    "events_pivot_daily",
    "funnel_daily_trend",
    "funnel_with_exclusion",
    "hourly_counts_gapfilled",
    "mix_weights",
    "pack_sequences",
    "padding_efficiency",
    "pii_redaction",
    "power_user_curve",
    "quality_repetition_rules",
    "quality_top_quartile",
    "rfm_segments",
    "segment_overlap_matrix",
    "sliding_window_counts",
    "source_dup_matrix",
    "stickiness_dau_mau",
    "stratified_sample",
    "top3_parts_per_brand",
    "user_lifecycle_grid",
    "value_histogram",
    "vocab_coverage",
    # (c) the r6-stale cohort, staleness-then-name order
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
    "session_entry_exit",
    "sparse_tfidf_pairs",
    "text_quality",
    "theta_segment_setops",
    "token_counts",
    "top_customers",
    "training_shuffle",
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
