"""Single-node throughput comparison: every oracle-gated query runs
on BOTH engines at the same scale factor — Spark (the engine under
test, local[N]) and DuckDB (a state-of-the-art single-node OLAP
engine standing in for the warehouse the reference delegates to,
since the reference publishes no benchmark numbers; BASELINE.md §0).

Per query: min of two timed runs on each engine (steady-state), both
materializing the full result.  Output: a markdown table to stdout
plus one JSON line.  This is an EVIDENCE artifact, not a contest —
DuckDB evaluates the hand-written oracle SQL, Spark the DataFrame
plans; queries where Spark is within ~2x of DuckDB on one node are
the ones whose distributed plan buys scale-out without giving up
single-node efficiency.

Usage: python tools/bench_vs_duckdb.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from rakam_api_spark.session import get_spark
from rakam_api_spark.tables import TABLE_NAMES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    only = set(sys.argv[2:])
    spark = get_spark("bench-vs-duckdb")
    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count() or 8}")
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    rows = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            continue
        try:
            spark_t = min(_time_spark(fn, spark, sf_dir) for _ in range(2))
            duck_t = min(_time_duck(con, sql) for _ in range(2))
        except Exception as exc:  # noqa: BLE001 - report and continue
            print(f"SKIP {name}: {exc}", file=sys.stderr)
            continue
        rows.append((name, spark_t, duck_t))
        print(
            f"{name:35s} spark {spark_t:7.3f}s  duckdb {duck_t:7.3f}s  "
            f"ratio {spark_t / duck_t if duck_t > 0 else float('inf'):6.2f}x",
            file=sys.stderr,
        )
    rows.sort(key=lambda r: r[0])
    total_s = sum(r[1] for r in rows)
    total_d = sum(r[2] for r in rows)
    print("| query | spark (s) | duckdb (s) | ratio |")
    print("|---|---|---|---|")
    for name, s, d in rows:
        print(f"| {name} | {s:.3f} | {d:.3f} | {s / d if d > 0 else float('inf'):.2f}x |")
    print(f"| **total ({len(rows)} queries)** | **{total_s:.2f}** | **{total_d:.2f}** | **{total_s / total_d:.2f}x** |")
    print(
        json.dumps(
            {
                "metric": "spark_vs_duckdb_total_wall",
                "spark_sec": round(total_s, 3),
                "duckdb_sec": round(total_d, 3),
                "ratio": round(total_s / total_d, 3),
                "n_queries": len(rows),
                "sf_dir": sf_dir,
            }
        )
    )


def _time_spark(fn, spark, sf_dir) -> float:
    t0 = time.time()
    fn(spark, sf_dir).collect()
    return time.time() - t0


def _time_duck(con, sql) -> float:
    t0 = time.time()
    con.execute(sql).fetchall()
    return time.time() - t0


if __name__ == "__main__":
    main()
