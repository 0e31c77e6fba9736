"""Micro-benchmark for the bloomed-append commit path: how long does
``TxnTable.append`` take with ``bloom_cols`` enabled, and how much of
it is the bloom build?  Built for the round-11 same-day A/B against
the round-10 tree (driver-side pyarrow bloom build) — run this script
unchanged in a worktree of the old commit and in the current tree on
the SAME machine state (machine-day variance swamps cross-session
comparisons; see PERF.md).

Prints one JSON line:
{"rows": N, "files": F, "append_plain_sec": ..., "append_bloom_sec": ...,
 "bloom_overhead_sec": ..., "driver_bloom_build": true|false}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rakam_api_spark.session import get_spark
from rakam_api_spark import txnlog
from rakam_api_spark.txnlog import TxnTable


def _frame(spark, n_rows: int):
    return (
        spark.range(n_rows)
        .select(
            F.col("id").alias("x"),
            F.concat(F.lit("user-"), (F.col("id") % 200_000).cast("string")).alias(
                "uid"
            ),
            F.concat(
                F.lit("2024-0"), ((F.col("id") % 3) + 1).cast("string")
            ).alias("_month"),
        )
        .repartition(8)
    )


def main() -> None:
    n_rows = int(os.environ.get("BLOOM_BENCH_ROWS", "2000000"))
    spark = get_spark("bloom-append-bench")
    df = _frame(spark, n_rows)
    df.count()  # materialize the input plan once (codegen warm)

    base = tempfile.mkdtemp(prefix="bloombench-")
    try:
        t_plain = TxnTable(spark, os.path.join(base, "plain"))
        t0 = time.time()
        t_plain.append(df, partition_col="_month")
        plain = time.time() - t0

        t_bloom = TxnTable(
            spark, os.path.join(base, "bloom"), bloom_cols=["uid"]
        )
        t0 = time.time()
        t_bloom.append(df, partition_col="_month")
        bloom = time.time() - t0

        ents = list(t_bloom.state().values())
        assert all("uid" in (e.get("blooms") or {}) for e in ents), "no blooms?"
        print(
            json.dumps(
                {
                    "rows": n_rows,
                    "files": len(ents),
                    "append_plain_sec": round(plain, 3),
                    "append_bloom_sec": round(bloom, 3),
                    "bloom_overhead_sec": round(bloom - plain, 3),
                    # True on trees where the committer itself reads
                    # column values (the pre-round-11 pyarrow path)
                    "driver_bloom_build": not hasattr(txnlog, "_blooms_via_spark"),
                }
            )
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
