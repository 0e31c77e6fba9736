"""Benchmark harness: runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized via collect() on the final result (the
result sets are small; the work is in the scans/joins/shuffles).
Every query runs twice and the per-query MIN is reported: the first
run pays one-off plan compilation (Janino codegen) and page-cache
warmup, the second measures steady-state execution — the number that
scales.  The cold total is reported alongside as ``cold_value``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from rakam_api_spark.session import get_spark

# FROZEN since round 1 — the longitudinal anchor (VERDICT r10 Next
# #6): never add to or remove from this list; growth goes to EXTRA.
# ``value`` in the output is the sum over exactly these 17 queries,
# directly comparable across rounds (r1 anchor: 24.222 s warm).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q4_order_priority",
    "order_rank_in_customer",
    "asof_view_before_purchase",
    "enrich_pipeline_full",
    "seg_daily_event_counts",
    "funnel_signup_click_purchase",
    "retention_cohorts",
    "sessionization_stats",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_brute_force_topk",
    "text_quality",
    "token_counts",
]

# Everything else ``queries()`` declares, timed identically but
# reported under ``queries_extra`` and EXCLUDED from the headline
# total so the total stays comparable across rounds.  Auto-enumerated
# from the driver contract (VERDICT r12 Next #2): every operator gets
# a longitudinal per-query BENCH row the round it lands — no
# hand-kept list to fall behind.
EXTRA = [name for name in entrymod.queries() if name not in set(HEADLINE)]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("rakam-api-spark-bench")
    qs = entrymod.queries()

    # warm the JVM + parquet footers with one tiny action
    spark.range(1).count()

    def _time(names: list[str]) -> tuple[dict[str, float], dict[str, float]]:
        warm: dict[str, float] = {}
        first: dict[str, float] = {}
        for name in names:
            runs = []
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, sf_dir).collect()
                runs.append(time.time() - t0)
            first[name] = round(runs[0], 3)
            warm[name] = round(min(runs), 3)
        return warm, first

    times, cold = _time(HEADLINE)
    extra, extra_first = _time(EXTRA)

    # ingest-path throughput (the reference's hot path): ND-JSON bulk
    # through parse → infer/evolve → enrich → coerce → append
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from bench_ingest import run_ingest_bench

    ingest = run_ingest_bench(spark, n_events=200_000)

    total = round(sum(times.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "queries_extra": extra,
                "cold_value": round(sum(cold.values()), 3),
                **ingest,
                "sf": sf_val,
            }
        )
    )
    # Per-query warm map in SMALL chunks (VERDICT r16 Next #1): the
    # full first line exceeds the driver's tail capture, so PERF_r16
    # had no per-query comparison at all.  Each chunk line is < 1500
    # chars and self-describing ({i, n, cpus}); the driver's capture
    # keeps the LAST few KB of stdout, so chunks are ordered
    # fastest → slowest — whatever survives in the tail is the most
    # expensive (most informative) slice.  Additions-only: the full
    # map above and the compact summary below are unchanged.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    all_warm = {**times, **extra}
    ordered = sorted(all_warm.items(), key=lambda kv: kv[1])
    chunks: list[dict] = []
    cur: dict[str, float] = {}
    for name, sec in ordered:
        cur[name] = sec
        if len(json.dumps(cur)) > 1200:
            chunks.append(cur)
            cur = {}
    if cur:
        chunks.append(cur)
    for i, ch in enumerate(chunks):
        print(
            json.dumps(
                {
                    "metric": "per_query_chunk",
                    "i": i,
                    "n": len(chunks),
                    "cpus": cpus,
                    "sf": sf_val,
                    "q": ch,
                }
            )
        )
    # Full machine-readable record on disk as well (the stdout tail is
    # lossy by construction): latest run + per-core-count copy, plus an
    # append-only runs log so same-code spread is measurable
    # (VERDICT r16 Next #9).  These are measurement RECORDS — bench.py
    # never reads them back; every run still computes from parquet.
    self_record = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "cold_value": round(sum(cold.values()), 3),
        "headline_fixed": total,
        "n_headline_fixed": len(times),
        "extra_total": round(sum(extra.values()), 3),
        "n_queries": len(times) + len(extra),
        "ingest_eps": ingest.get("ingest_eps"),
        "sf": sf_val,
        "cpus": cpus,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "queries": times,
        "queries_extra": extra,
        "queries_first_run": cold,
        "queries_extra_first_run": extra_first,
    }
    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(repo, "BENCH_SELF.json"), "w") as f:
            json.dump(self_record, f)
            f.write("\n")
        if cpus:
            with open(os.path.join(repo, f"BENCH_SELF_c{cpus}.json"), "w") as f:
                json.dump(self_record, f)
                f.write("\n")
        with open(os.path.join(repo, "BENCH_RUNS.jsonl"), "a") as f:
            slim = {k: v for k, v in self_record.items() if not k.startswith("queries")}
            json.dump(slim, f)
            f.write("\n")
    except OSError:
        pass  # read-only checkout: stdout still carries everything
    # Compact summary LAST: the full line above has grown past the
    # driver's 2000-char tail capture (BENCH_r08.json recorded a null
    # parse), so re-emit just the headline numbers as a final,
    # always-capturable JSON line (kept last so a tail parse that
    # takes the final JSON line still sees the totals).
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "cold_value": round(sum(cold.values()), 3),
                # the longitudinal anchor, spelled out: ``value`` is
                # the FROZEN r1 17-query set; extras carry all growth
                "headline_fixed": total,
                "n_headline_fixed": len(times),
                "extra_total": round(sum(extra.values()), 3),
                "n_queries": len(times) + len(extra),
                "ingest_eps": ingest.get("ingest_eps"),
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
