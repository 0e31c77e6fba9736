"""Two-pass exact decile cut (VERDICT r11 Next #5 /
What's wrong #2): ``_twopass_deciles`` must be BIT-IDENTICAL to the
segment-partitioned ``ntile(10)`` window while keeping every sort
partition-local (rank = driver-computed range-partition offset +
local row_number) — the scale path for ~1B-customer segments where
exact ntile's single-task per-segment sort stops being viable."""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from rakam_api_spark.analytics import relational4 as r4

SF = "/root/testdata/sf0.001"


def test_twopass_matches_ntile_on_fixture(spark):
    plain = r4.customer_decile_revenue_share(spark, SF, two_pass=False)
    two = r4.customer_decile_revenue_share(spark, SF, two_pass=True)
    assert plain.collect() == two.collect()


def test_twopass_ntile_arithmetic_on_ragged_segments(spark):
    """Segment sizes NOT divisible by the bucket count exercise the
    ceil/floor split (n=23, k=10 → buckets 1-3 take 3 rows, 4-10 take
    2); one segment smaller than k exercises q=0."""
    rows = [("A", float(i), f"c{i:03d}") for i in range(23)]
    rows += [("B", float(i * 7 % 13), f"c{i:03d}") for i in range(7)]  # n < k
    rows += [("C", 1.0, f"c{i:03d}") for i in range(40)]  # all-tied spends
    df = spark.createDataFrame(rows, "c_mktsegment string, _spend double, c_custkey string")
    w = Window.partitionBy("c_mktsegment").orderBy("_spend", "c_custkey")
    want = sorted(
        df.withColumn("decile", F.ntile(10).over(w))
        .select("c_mktsegment", "c_custkey", "decile")
        .collect()
    )
    got = sorted(
        r4._twopass_deciles(df, 10)
        .select("c_mktsegment", "c_custkey", "decile")
        .collect()
    )
    assert got == want
