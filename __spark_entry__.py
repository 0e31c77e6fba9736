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
from rakam_api_spark.llm import curation as _curation
from rakam_api_spark.llm import dedup as _dedup
from rakam_api_spark.llm import multimodal as _multimodal
from rakam_api_spark.llm import similarity as _similarity
from rakam_api_spark.llm import text as _text
from rakam_api_spark.streaming import windows as _windows

_MODULES = (
    _relational,
    _events,
    _enrich,
    _windows,
    _dedup,
    _similarity,
    _text,
    _curation,
    _multimodal,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: segmentation over
    the events stream (daily counts/uniques per event type)."""
    return _events.seg_daily_event_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
