"""Ingest-path throughput benchmark: ND-JSON bulk load through the
full dynamic-schema pipeline (parse → infer/evolve → enrich with the
default mapper chain → coerce → dead-letter → partitioned append).

The reference is first and foremost an ingest engine; this measures
our equivalent of its hot path (SURVEY.md §3.2) in events/second.

Usage: python tools/bench_ingest.py [n_events]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_ingest_bench(spark: SparkSession, n_events: int = 200_000) -> dict:
    from rakam_api_spark.api import EventCollector, default_pipeline
    from rakam_api_spark.catalog import Metastore

    work = tempfile.mkdtemp(prefix="ingest_bench_")
    src_dir = f"{work}/src"
    try:
        # synthesize an ND-JSON batch with mapper triggers (_ip,
        # _user_agent) and a mixed-type property payload
        ua = (
            "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
            "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36"
        )
        events = spark.range(n_events).select(
            F.concat(F.lit("u"), (F.col("id") % 5000).cast("string")).alias("_user"),
            (F.lit(1704067200000) + F.col("id") * 37).alias("_time"),
            F.concat(
                (F.col("id") % 6 * 40 + 1).cast("string"),
                F.lit("."),
                (F.col("id") % 256).cast("string"),
                F.lit(".0.1"),
            ).alias("_ip"),
            F.lit(ua).alias("_user_agent"),
            F.element_at(
                F.array(F.lit("click"), F.lit("view"), F.lit("purchase")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("action"),
            (F.col("id") % 997 / 10.0).alias("value"),
            F.concat(F.lit("page-"), (F.col("id") % 100).cast("string")).alias("page"),
        )
        events.write.mode("overwrite").json(src_dir)

        ms = Metastore(f"{work}/warehouse")
        collector = EventCollector(spark, ms, pipeline=default_pipeline())
        src = spark.read.json(src_dir)
        t0 = time.time()
        report = collector.bulk("bench", "pageviews", src)
        wall = time.time() - t0
        return {
            "ingest_events": report.stored,
            "ingest_wall_sec": round(wall, 3),
            "ingest_eps": round(report.stored / wall, 1),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    from rakam_api_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("ingest-bench")
    print(json.dumps(run_ingest_bench(spark, n)))
    spark.stop()
