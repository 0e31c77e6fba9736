"""Self-check harness mimicking the driver's correctness gate:

For every key in ``queries()``, run the Spark DataFrame and the
DuckDB oracle on the same sf dir, then compare row count, column
names, and an order-insensitive value comparison (exact, cell by
cell after sorting rows; floats compared bit-exact since our
queries are engineered deterministic).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from rakam_api_spark.session import get_spark
from rakam_api_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def compare(name: str, spark_rows, duck_rows, spark_cols, duck_cols) -> list[str]:
    problems = []
    if [c.lower() for c in spark_cols] != [c.lower() for c in duck_cols]:
        problems.append(f"columns differ: spark={spark_cols} duck={duck_cols}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")
    # order-insensitive: sort by all columns (driver sorts columns by
    # name then hashes; we sort rows and diff values)
    idx = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i].lower())

    def key(row):
        return tuple(str(normalize(row[i])) for i in idx)

    s_sorted = sorted([tuple(normalize(v) for v in r) for r in spark_rows], key=key)
    d_sorted = sorted([tuple(normalize(v) for v in r) for r in duck_rows], key=key)
    n_bad = 0
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        if a != b:
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"row {i} differs:\n  spark={a}\n  duck ={b}")
    if n_bad:
        problems.append(f"{n_bad} differing rows total")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("correctness-check")
    con = duck_connection(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:500]}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(spark_rows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.execute(oracles[name])
            duck_cols = [d[0] for d in rel.description]
            duck_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:500]}")
            failed.append(name)
            continue
        problems = compare(name, spark_rows, duck_rows, spark_cols, duck_cols)
        if problems:
            print(f"FAIL {name} ({len(spark_rows)} rows, {time.time()-t0:.1f}s)")
            for p in problems:
                print(f"   {p}")
            failed.append(name)
        else:
            print(f"OK   {name} ({len(spark_rows)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
