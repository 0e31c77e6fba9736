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
# enumeration order.  With 192 declared queries, plain module order
# would starve the tail modules of a driver-verified CORRECTNESS row
# forever.  Round-9 rotation (staleness computed from CORRECTNESS_r01-r08):
# (a) the 26 queries added or modified this round — twenty-three brand-new
# (nation trade balance, order-gap cadence, running revenue share,
# position-based attribution, burstiness, session depth, label-centroid
# similarity, embedding label outliers, Zipf slope, dedup savings,
# prefix boilerplate, order streaks, late-run streaks, discount
# elasticity, Benford audit, KM order-survival curve, unit-value price
# index, embedding-norm audit, seasonality index, IVF cell balance,
# priority drift, supplier HHI, cluster-size
# histogram) plus the three with round-9 code changes
# (threshold curve's enforced sample, cluster_safe_splits' dropped
# broadcast, the drift midpoint floor); (b) the r5-stale cohort VERDICT
# r8 Next #7 names — the TPC-H tail q7-q22 / bm25 / dedup_clusters that
# slipped past the r8 cutoff at slot 50, then the remaining r5-stale
# rows in enumeration order; twenty-two r5-stale rows (event_transition_matrix,
# events_pivot_daily, funnel_daily_trend,
# funnel_with_exclusion, hourly_counts_gapfilled,
# mix_weights, pack_sequences, padding_efficiency, pii_redaction,
# power_user_curve, quality_repetition_rules, quality_top_quartile,
# rfm_segments, segment_overlap_matrix, sliding_window_counts,
# source_dup_matrix, stickiness_dau_mau, stratified_sample,
# top3_parts_per_brand, user_lifecycle_grid, value_histogram,
# vocab_coverage) don't fit and lead the r10 rotation.  Everything
# listed passes tools/check_correctness.py locally at sf0.01 and sf0.001
# (the round-9 additions also at sf0.1).
_GATE_PRIORITY = (
    # (a) added or modified this round
    "nation_trade_balance",
    "ivf_cell_balance",
    "order_priority_drift",
    "supplier_hhi",
    "dedup_cluster_size_histogram",
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
    "customer_order_streaks",
    "supplier_late_streaks",
    "discount_elasticity_by_priority",
    "benford_price_audit",
    "order_survival_curve",
    "part_price_index_quarterly",
    "embedding_norm_audit",
    "orders_seasonality_index",
    "dedup_threshold_curve",
    "cluster_safe_splits",
    "embedding_drift_by_label",
    # (b) the r5-stale cohort (VERDICT r8 Next #7)
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q12_late_priority",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_part_supplier_counts",
    "q17_small_qty_revenue",
    "q19_disjunctive_revenue",
    "q20_dominant_supplier",
    "q22_idle_balances",
    "bm25_search",
    "dedup_clusters",
    "contamination_check",
    "corpus_top_ngrams",
    "curation_funnel",
    "daily_new_vs_returning",
    "data_quality_audit",
    "doc_chunking",
    "doc_typicality",
    "dup_ngram_spans",
    "embedding_cluster_profile",
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
