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
from rakam_api_spark.analytics import events3 as _events3
from rakam_api_spark.analytics import relational as _relational
from rakam_api_spark.analytics import relational2 as _relational2
from rakam_api_spark.analytics import relational3 as _relational3
from rakam_api_spark.analytics import relational4 as _relational4
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
    _relational4,
    _events,
    _events2,
    _events3,
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
# enumeration order.  With 224+ declared queries, plain module order
# would starve the tail modules of a driver-verified CORRECTNESS row
# forever.  Round-11 rotation (VERDICT r10 Next #4 verbatim): (a)
# queries added this round lead (new code always verifies first); (b)
# the r7-stale cohort the verdict names — q2, the q8–q22 family,
# attribution linear/last-touch, props_json_extract,
# asof_view_before_purchase, rolling_uniques_7d, latest_event_per_user,
# the sketch family, media audio/video dedup, bm25_search,
# dup_ngram_spans.  Everything listed passes
# tools/check_correctness.py locally at sf0.01 and sf0.001.
_GATE_PRIORITY = (
    # (a) the 19 queries added in round 11 (QUERIES.md round-11 section)
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
    # (b) the r7-stale cohort (VERDICT r10 Next #4, verbatim)
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_late_priority",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_part_supplier_counts",
    "q17_small_qty_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_dominant_supplier",
    "q21_suppliers_kept_waiting",
    "q22_idle_balances",
    "attribution_linear",
    "attribution_last_touch",
    "props_json_extract",
    "asof_view_before_purchase",
    "rolling_uniques_7d",
    "latest_event_per_user",
    "dau_approx_sketch",
    "value_quantile_sketch",
    "heavy_hitters_sketch",
    "mau_rollup_sketch",
    "inter_event_cadence_sketch",
    "media_audio_dedup",
    "media_video_dedup",
    "bm25_search",
    "dup_ngram_spans",
    # (a2) the round-11 SECOND batch sits right after the 50-slot
    # boundary: the gate budget is exactly consumed by batch 1 (19) +
    # the 31 cohort rows the verdict's done-criterion names — batch 2
    # is verified locally at sf0.001/0.01/0.1 and leads the r12 gate
    "lineitem_field_correlations",
    "order_size_histogram",
    "weekday_hour_peak_per_type",
    "sessions_per_user_histogram",
    "word_freq_top50",
    "avg_word_len_by_lang",
    "centroid_confusion_matrix",
    "daily_value_cusum",
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
