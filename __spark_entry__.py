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
from rakam_api_spark.analytics import relational as _relational
from rakam_api_spark.analytics import relational2 as _relational2
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
    _events,
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
# enumeration order.  With 145 declared queries, plain module order
# would starve the tail modules of a driver-verified CORRECTNESS row
# forever.  Round-7 rotation: (a) `user_metric_correlation` first — its
# oracle's HUGEINT defect (uncast SUM(BIGINT)) is fixed this round and
# it is the one query never driver-green; (b) the ten round-7 additions
# (filtered IVF search, span dedup family, attribution/cadence/vocab,
# dedup QA audit, funnel hop latency, real resize);
# (c) the queries whose last driver-green row is round 4 — the stalest
# coverage.  The list is longer than 50 names: the overflow (the last
# few r4-stale rows and the stalest r5 row) sits just past the gate
# and leads the r8 rotation; everything green in rounds 5-6
# enumerates last.  Everything listed here passes
# tools/check_correctness.py locally at sf0.01 and sf0.001.
_GATE_PRIORITY = (
    # oracle fixed this round (CAST sx/sy AS BIGINT) — must re-verify
    "user_metric_correlation",
    # round-7 additions (never driver-checked)
    "ann_filtered_ivf_topk",
    "dup_span_extents",
    "span_dedup_savings",
    "attribution_time_decay",
    "inter_event_time_quantiles",
    "source_vocab_overlap",
    "dedup_precision_audit",
    "funnel_step_latency",
    "media_resize_stats",
    # last driver-checked in round 4 (stalest green coverage)
    "orders_rollup",
    "order_rank_in_customer",
    "customer_order_stats",
    "q6_forecast_revenue",
    "q4_order_priority",
    "customers_no_recent_orders",
    "orders_cube",
    "engaged_user_days_setops",
    "revenue_grouping_sets_sql",
    "cheapest_order_per_customer_sql",
    "part_value_concentration",
    "big_ticket_orders",
    "late_sole_supplier",
    "seg_daily_event_counts",
    "dau",
    "top_event_values",
    "event_type_hourly_share",
    "props_json_extract",
    "props_variant_stats",
    "funnel_signup_click_purchase",
    "funnel_windowed_24h",
    "ab_test_lift",
    "cohort_ltv",
    "time_to_convert",
    "retention_cohorts",
    "sessionization_stats",
    "user_profile_snapshot",
    "asof_view_before_purchase",
    "value_percentiles",
    "dau_approx_sketch",
    "value_quantile_sketch",
    "heavy_hitters_sketch",
    "mau_rollup_sketch",
    "rolling_uniques_7d",
    "top_event_paths",
    "daily_anomaly_zscore",
    "latest_event_per_user",
    "daily_value_moving_avg",
    "enrich_geoip",
    "enrich_useragent",
    "enrich_referrer",
    "enrich_timestamp_skew",
    "enrich_pipeline_full",
    "tumbling_window_counts",
    "session_window_stats",
    # stalest of the round-5 cohort fills the last slot
    "q7_nation_volume",
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
