"""Bucketed sweep-line for peak_concurrent_sessions_daily (VERDICT
r12 Next #6): the two-level (day, minute-bucket) sweep must be
BIT-IDENTICAL to the plain per-day running-sum window while keeping
every sort bucket-local — the scale path for hot days whose distinct
instants no longer fit one task's sort."""

import sys

sys.path.insert(0, "/root/repo")

from rakam_api_spark.analytics import events3 as e3

SF = "/root/testdata/sf0.001"


def test_bucketed_matches_plain_on_fixture(spark):
    plain = e3.peak_concurrent_sessions_daily(spark, SF, bucketed=False)
    buck = e3.peak_concurrent_sessions_daily(spark, SF, bucketed=True)
    assert plain.collect() == buck.collect()


def test_bucketed_carry_across_bucket_boundaries(spark, tmp_path):
    """Sessions spanning many minute-buckets force non-zero carry_in:
    a long-lived cohort opens in bucket 0 and closes much later, so
    intermediate buckets see only the carry (no local boundaries),
    and the true peak lands in a bucket with carry_in > 0."""
    from rakam_api_spark.analytics import events3

    ns = 1_000_000_000
    rows = []
    eid = 0
    # 5 users: one event at t=0s and one at t=1500s (25 min gap → one
    # session each spanning 25 one-minute buckets)
    for u in range(5):
        for t in (0, 1500):
            rows.append((f"u{u}", t * ns, eid))
            eid += 1
    # 3 more users, single-instant sessions inside bucket 20 (t=1200s)
    # → peak there is 5 (carry) + 3 = 8
    for u in range(5, 8):
        rows.append((f"u{u}", 1205 * ns, eid))
        eid += 1
    df = spark.createDataFrame(
        [
            (
                uid,
                ts_ns,
                __import__("datetime").datetime(2024, 1, 1)
                + __import__("datetime").timedelta(seconds=ts_ns // ns),
                f"e{i}",
            )
            for (uid, ts_ns, i) in rows
        ],
        "user_id string, ts_ns long, ts timestamp_ntz, event_id string",
    )

    orig = events3._events
    events3._events = lambda spark, sf_dir: df
    try:
        plain = e3.peak_concurrent_sessions_daily(spark, "ignored", bucketed=False)
        buck = e3.peak_concurrent_sessions_daily(spark, "ignored", bucketed=True)
        p, b = plain.collect(), buck.collect()
    finally:
        events3._events = orig
    assert p == b
    assert b[0]["peak_concurrent"] == 8
