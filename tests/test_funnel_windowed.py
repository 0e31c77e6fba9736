"""Conversion-window funnel boundary semantics: a step landing
exactly at t_prev + within_us qualifies (inclusive window); one
microsecond later does not."""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from rakam_api_spark.analytics.events import funnel


def _events_frame(spark, rows):
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts_us long")
    # funnel() derives _us via ts_ns div 1000 — feed it a ts_ns column
    return df.select(
        "user_id", "event_type", (F.col("ts_us") * 1000).alias("ts_ns")
    )


def test_window_boundary_inclusive(spark):
    win = 1_000_000  # 1 second
    rows = [
        # user 1: click exactly at the boundary -> qualifies
        (1, "signup", 0),
        (1, "click", win),
        # user 2: click one microsecond past -> does not qualify
        (2, "signup", 0),
        (2, "click", win + 1),
        # user 3: click earlier AND a later better one; earliest
        # qualifying click is chosen
        (3, "signup", 0),
        (3, "click", 10),
        (3, "click", 20),
    ]
    out = {
        (r["step"], r["event_type"]): r["users"]
        for r in funnel(
            _events_frame(spark, rows), ["signup", "click"], within_us=win
        ).collect()
    }
    assert out[(1, "signup")] == 3
    assert out[(2, "click")] == 2  # users 1 and 3; user 2 missed the window


def test_unwindowed_funnel_unchanged(spark):
    rows = [(1, "signup", 0), (1, "click", 10**9)]
    out = {
        r["step"]: r["users"]
        for r in funnel(_events_frame(spark, rows), ["signup", "click"]).collect()
    }
    assert out == {1: 1, 2: 1}
