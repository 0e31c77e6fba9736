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
# enumeration order.  With 173 declared queries, plain module order
# would starve the tail modules of a driver-verified CORRECTNESS row
# forever.  Round-8 rotation (staleness computed from CORRECTNESS_r01-r07):
# (a) the 23 queries added or modified this round (fifteen brand-new:
# BPE merge candidates, cross-lingual mining, session-gap curve,
# any-order funnel,
# embedding drift, customer
# tier migration, dedup threshold curve,
# Wilson supplier reliability, n-gram novelty,
# cluster-safe splits, bigram-LM quality, Markov transitions, RFM
# quartiles, co-purchase pairs, kNN label propagation; plus the sampled
# dedup audit, the artifact-probing filtered ANN, the cadence sketch,
# the ANN recall audit, bounce rate, PMI, entropy, length histogram);
# (b) the five queries whose last driver-green row is round 4 (they
# sat just past the r7 gate cutoff); (c) the round-6-stale cohort
# VERDICT r7 Next #4 names (TPC-H tail, attribution/latency/
# correlation/seasonality, the media-dedup trio, the full ann_*
# family, lexical/signature/incremental-dedup/contamination/hybrid);
# (d) TPC-H r5-stale rows to fill slot 50 (q7-q22/bm25/dedup_clusters
# slipped past the cutoff and lead the r9 rotation with the ~30
# remaining r5-stale queries).  Everything listed passes
# tools/check_correctness.py locally at sf0.01 and sf0.001.
_GATE_PRIORITY = (
    # (a) added or modified this round
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
    "dedup_precision_audit",
    "ann_filtered_ivf_indexed",
    "ann_recall_audit",
    "inter_event_cadence_sketch",
    "session_bounce_rate",
    "event_cooccurrence_pmi",
    "user_activity_entropy",
    "doc_length_histogram",
    # (b) last driver-green in round 4
    "enrich_pipeline_full",
    "enrich_referrer",
    "enrich_timestamp_skew",
    "session_window_stats",
    "tumbling_window_counts",
    # (c) the round-6-stale cohort from VERDICT r7 Next #4
    "q11_important_stock",
    "q18_large_volume_customers",
    "q21_suppliers_kept_waiting",
    "attribution_linear",
    "attribution_last_touch",
    "ship_latency_quartiles",
    "metric_correlation_matrix",
    "weekly_seasonality_autocorr",
    "media_phash_dedup",
    "media_audio_dedup",
    "media_video_dedup",
    "ann_brute_force_topk",
    "ann_filtered_topk",
    "ann_ivf_topk",
    "ann_kmeans_ivf_topk",
    "ann_pq_topk",
    "lexical_rarity",
    "source_signature_terms",
    "dedup_incremental_batch",
    "semantic_contamination",
    "hybrid_search",
    # (d) TPC-H rows last green in round 5 fill the gate
    "q2_min_cost_supplier",
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
