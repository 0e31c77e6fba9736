"""Change-data-feed SQL surface queries.

The reference's whole analytics model is external SQL over the
tables the ingest layer maintains (reference README.md:27-31,
SURVEY.md §2.7); a change feed is only useful if that SQL surface
can reach it.  ``table_changes('collection', start[, end])`` —
rewritten by :mod:`rakam_api_spark.query_service` into a view over
``TxnTable.changes`` (txnlog.py) — is the Delta-convention TVF an
incremental consumer polls instead of re-reading snapshots.

The gated query below exercises the FULL path end-to-end: a
transaction-logged collection is built from the sf_dir ``orders``
table in three deterministic commits (``o_orderkey % 4`` slices:
{0,1} → v1, {2} → v2, {3} → v3), then the TVF is queried THROUGH the
query service for the inclusive commit range [2, 3].  The DuckDB
oracle recomputes the same feed from the raw parquet with the same
modulo split — every appended row surfaces exactly once as an
``insert`` tagged with its commit version, so the rollup is exact.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

# one fixture per (sf_dir) per process: the driver/bench harnesses
# call each query twice (run + hash), so the three-commit build runs
# once and the second call is a metadata-only re-read
_FIXTURE: dict[str, str] = {}


def _cdf_warehouse(spark: SparkSession, sf_dir: str) -> str:
    """Build (once) a warehouse holding project ``cdfp`` with a
    txn-logged ``orders`` collection populated by three deterministic
    commits, and return the warehouse path."""
    cached = _FIXTURE.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached
    from ..catalog import Metastore
    from ..store import EventStore

    warehouse = tempfile.mkdtemp(prefix="rakam_cdf_wh_")
    ms = Metastore(warehouse)
    ms.create_project("cdfp")
    store = EventStore(spark, ms)
    # the maintenance lock file lives in the project directory, which
    # only materializes on first ingest — create it for the direct path
    os.makedirs(os.path.join(warehouse, "cdfp"), exist_ok=True)
    store.enable_txn("cdfp", "orders")
    txn = store.txn_table("cdfp", "orders")
    orders = load_table(spark, sf_dir, "orders")
    slices = (
        orders.where((F.col("o_orderkey") % 4) < 2),
        orders.where((F.col("o_orderkey") % 4) == 2),
        orders.where((F.col("o_orderkey") % 4) == 3),
    )
    for i, part in enumerate(slices, start=1):
        txn.append(part)
        got = txn.version()
        if got != i:  # the oracle hardcodes commit numbers — fail loudly
            raise RuntimeError(f"cdf fixture: expected version {i}, got {got}")
    _FIXTURE[sf_dir] = warehouse
    return warehouse


_FEED_SQL = """
SELECT _change_type,
       _commit_version,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM table_changes('orders', 2, 3)
GROUP BY _change_type, _commit_version
"""


def table_changes_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-commit rollup of the change feed for the inclusive commit
    range [2, 3], queried through the SQL service's
    ``table_changes`` TVF (the Delta-CDF consumption pattern: an
    incremental derived table reads only the commits it has not seen).

    Plan: the TVF resolves to a parquet scan over ONLY the files the
    two commits touched (never a snapshot diff), attribution is a
    broadcast of the driver-side (file → version/type) map, and the
    rollup is one enum-sized aggregate — commit count × change types
    rows regardless of corpus size."""
    from ..query_service import QueryService
    from ..store import EventStore
    from ..catalog import Metastore

    warehouse = _cdf_warehouse(spark, sf_dir)
    svc = QueryService(spark, EventStore(spark, Metastore(warehouse)))
    return svc.dataframe("cdfp", _FEED_SQL)


TABLE_CHANGES_ORACLE = """
WITH feed AS (
  SELECT 'insert' AS _change_type, CAST(2 AS BIGINT) AS _commit_version, *
  FROM orders WHERE o_orderkey % 4 = 2
  UNION ALL
  SELECT 'insert', CAST(3 AS BIGINT), *
  FROM orders WHERE o_orderkey % 4 = 3
)
SELECT _change_type,
       _commit_version,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM feed
GROUP BY _change_type, _commit_version
"""


QUERIES = {
    "table_changes_rollup": table_changes_rollup,
}

ORACLES = {
    "table_changes_rollup": TABLE_CHANGES_ORACLE,
}
