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
# enumeration order.  With 125+ declared queries, plain module order
# would starve the tail modules of a driver-verified CORRECTNESS row
# forever.  Round-6 rotation: (a) the three queries modified this round
# (the r5-red `user_metric_correlation` plus the two scale fixes) must
# re-enter the gate, (b) the 12 queries never driver-checked in any
# round, (c) round-6 additions, (d) the queries last checked in round 3
# (stalest green coverage); everything green in CORRECTNESS_r05
# enumerates last.  Everything listed here passes
# tools/check_correctness.py locally at sf0.01 and sf0.001.
_GATE_PRIORITY = (
    # modified this round — must re-verify
    "user_metric_correlation",
    "sparse_tfidf_pairs",
    "market_basket_part_types",
    # never driver-checked in any round (verified locally in r5+r6)
    "key_skew_report",
    "hybrid_search",
    "ann_pq_topk",
    "funnel_unordered",
    "session_entry_exit",
    "rollup_reuse_monthly",
    "quantile_rollup_sketch",
    "theta_segment_setops",
    "attribution_last_touch",
    "priority_sample",
    "dataset_splits",
    "training_shuffle",
    # round-6 additions (never driver-checked)
    "media_phash_dedup",
    "media_audio_dedup",
    "media_video_dedup",
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
    # last driver-checked in round 3 (stalest green coverage)
    "ann_brute_force_topk",
    "ann_ivf_topk",
    "ann_kmeans_ivf_topk",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "doc_fingerprints",
    "embedding_cosine_dedup",
    "lang_id",
    "multimodal_byte_stats",
    "text_quality",
    "token_counts",
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
