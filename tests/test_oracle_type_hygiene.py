"""Fleet-wide oracle output-type hygiene gate.

The driver's correctness hash is type-sensitive: DuckDB types
``SUM(BIGINT)`` as HUGEINT, which materializes as Arrow
``decimal128(38, 0)`` (and float64 via pandas) while the Spark side
emits int64 — values equal, hash red.  That mismatch was the only
red CORRECTNESS row in rounds 5 and 6 (``user_metric_correlation``).
This test runs every ``oracle_sql()`` through DuckDB at sf0.001 and
asserts every output column materializes to a Spark-emittable Arrow
type, killing the defect class the same way test_plan_hygiene.py
killed unpartitioned windows.

Rule of thumb enforced here: every integer aggregate an oracle
OUTPUTS must be ``CAST(... AS BIGINT)``; exact decimals must land on
``DECIMAL(18, 6)`` or be cast to DOUBLE before the final SELECT.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from rakam_api_spark.tables import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_TINY_SF", "/root/testdata/sf0.001")

# Arrow types a Spark DataFrame can emit 1:1.  Notably absent:
# decimal128(38, 0) (DuckDB HUGEINT, from uncast SUM/PRODUCT of
# BIGINT) and decimal256 — those hash-mismatch against Spark's int64.
_ALLOWED = {
    "int8",
    "int16",
    "int32",
    "int64",
    "float",
    "double",
    "string",
    "large_string",
    "bool",
    "date32[day]",
    "timestamp[us]",
    "timestamp[ns]",
    "decimal128(18, 6)",
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLE_NAMES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def _offending_columns(con, sql: str) -> list[str]:
    tbl = con.execute(sql).arrow()
    return [
        f"{f.name}: {f.type}" for f in tbl.schema if str(f.type) not in _ALLOWED
    ]


def test_uncast_sum_fixture_is_rejected(con):
    """Sanity: the gate actually reds the defect it exists to catch."""
    bad = _offending_columns(con, "SELECT SUM(r_regionkey) AS s FROM region")
    assert bad == ["s: decimal128(38, 0)"]
    good = _offending_columns(
        con, "SELECT CAST(SUM(r_regionkey) AS BIGINT) AS s FROM region"
    )
    assert good == []


def test_every_oracle_emits_spark_compatible_types(con):
    offenders: dict[str, list[str]] = {}
    for name, sql in entrymod.oracle_sql().items():
        bad = _offending_columns(con, sql)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles emitting non-Spark-emittable Arrow types (add a CAST "
        "in the final SELECT): " + repr(offenders)
    )
