"""Same-window A/B probe for optimization evidence (guide §1).

Times a list of declared queries in ONE Spark session with the
bench's methodology (two runs each, min = warm), optionally through
the noop sink (§1.4) instead of collect(), with per-query job
descriptions (§1.5).  Prints one JSON line.

The round-16 machine swings ±5x between runs (OPTIMIZATION_r16.md
"Inherited state"), so before/after evidence comes from running this
probe on two worktrees back-to-back in the same window, repeated, and
comparing medians of the TOTAL — never single cross-round wall
clocks.

Usage:
  python3 tools/ab_probe.py <repo_root> <sf_dir> [--noop] q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    root = sys.argv[1]
    sf_dir = sys.argv[2]
    args = sys.argv[3:]
    noop = "--noop" in args
    names = [a for a in args if not a.startswith("--")]
    sys.path.insert(0, root)
    import __spark_entry__ as entrymod
    from rakam_api_spark.session import get_spark

    spark = get_spark("ab-probe")
    spark.range(1).count()
    qs = entrymod.queries()
    warm: dict[str, float] = {}
    first: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        runs = []
        for _ in range(2):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            runs.append(time.time() - t0)
        first[name] = round(runs[0], 3)
        warm[name] = round(min(runs), 3)
        spark.sparkContext.setJobDescription(None)
    print(
        json.dumps(
            {
                "root": root,
                "total_warm": round(sum(warm.values()), 3),
                "total_first": round(sum(first.values()), 3),
                "warm": warm,
                "first": first,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
