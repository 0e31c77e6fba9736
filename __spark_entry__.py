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
# enumeration order.  With 250+ declared queries, plain module order
# would starve the tail modules of a driver-verified CORRECTNESS row
# forever.  Round-12 rotation (VERDICT r11 Next #3 verbatim): (a) the
# 8 round-11 batch-2 rows that sat just past round 11's 50-slot
# boundary lead; (b) the r8-stale cohort the verdict names; (c) the
# round-12 additions (two-pass decile proof, specialization/size-band/
# acctbal relational trio, concurrency/p90/dormancy event trio, Heaps
# curve, token entropy, intra/inter label affinity).  Everything
# listed passes tools/check_correctness.py locally at sf0.01 and
# sf0.001.
_GATE_PRIORITY = (
    # (a) round-11 batch 2 (never driver-checked; VERDICT r11 names them)
    "lineitem_field_correlations",
    "order_size_histogram",
    "weekday_hour_peak_per_type",
    "sessions_per_user_histogram",
    "word_freq_top50",
    "avg_word_len_by_lang",
    "centroid_confusion_matrix",
    "daily_value_cusum",
    # (b) the r8-stale cohort (VERDICT r11 Next #3, verbatim)
    "bpe_merge_candidates",
    "cluster_safe_splits",
    "lm_bigram_quality",
    "event_transition_probs",
    "rfm_quartiles",
    "part_copurchase_pairs",
    "knn_label_propagation",
    "dedup_threshold_curve",
    "supplier_reliability_wilson",
    "doc_ngram_novelty",
    "embedding_drift_by_label",
    "customer_migration_matrix",
    "session_gap_curve",
    "unordered_funnel_completion",
    "crosslingual_mining",
    # (c) round-12 additions
    "customer_decile_share_twopass",
    "customer_decile_revenue_share",  # re-check: gained the auto gate
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
    # (d) round-12 batch 2 (the first 50 above are this round's gate;
    # anything past slot 50 leads next round's rotation)
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
