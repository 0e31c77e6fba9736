"""Misra-Gries heavy-hitters sketch: the oracle gate runs the k >
distinct regime (exact); this exercises the genuinely approximate
regime — more distinct items than counters, skewed frequencies —
and asserts the MG retention + undercount guarantees."""

import sys

sys.path.insert(0, "/root/repo")

import pandas as pd

from pyspark.sql import functions as F

from rakam_api_spark.sketch import MG_K, mg_update


def _mg_estimates(spark, items, n_partitions=8):
    """Run the same partition-sketch + merge plan heavy_hitters_sketch
    uses (the shared mg_update kernel), over an arbitrary item list."""

    def mg_partition(batches):
        counters = {}
        for pdf in batches:
            counters = mg_update(counters, pdf["item"], MG_K)
        if counters:
            yield pd.DataFrame({"item": list(counters), "est": list(counters.values())})

    df = spark.createDataFrame([(i,) for i in items], "item string").repartition(n_partitions)
    merged = (
        df.mapInPandas(mg_partition, "item string, est long")
        .groupBy("item")
        .agg(F.sum("est").alias("est"))
    )
    return {r["item"]: r["est"] for r in merged.collect()}


def test_mg_guarantees_under_skew(spark):
    # 100 distinct items (> MG_K=16): one item at ~33%, one at ~17%,
    # the rest uniform tail
    items = []
    for i in range(30000):
        if i % 3 == 0:
            items.append("hot")
        elif i % 6 == 1:
            items.append("warm")
        else:
            items.append(f"tail{i % 98}")
    n = len(items)
    exact = pd.Series(items).value_counts().to_dict()
    est = _mg_estimates(spark, items)

    # partition sketches never exceed the counter budget
    assert len(est) <= MG_K * 8, "merge input is bounded by k x partitions"
    bound = n / (MG_K + 1)
    # retention: every item with true freq > N/(k+1) survives the merge
    for item, ex in exact.items():
        if ex > bound:
            assert item in est, f"guaranteed heavy item {item} lost"
    # undercount bound: estimates never exceed exact and never trail
    # by more than N/(k+1)
    for item, e in est.items():
        assert e <= exact[item]
        assert e >= exact[item] - bound


def test_mg_exact_when_counters_cover_domain(spark):
    items = [f"i{j % 5}" for j in range(5000)]
    est = _mg_estimates(spark, items, n_partitions=4)
    exact = pd.Series(items).value_counts().to_dict()
    assert est == exact, "k > distinct => Misra-Gries degenerates to exact counts"


def test_streaming_heavy_hitters_state_across_batches(spark, tmp_path):
    """Sharded MG state persists across micro-batches: after two
    batches the latest per-shard emission reflects cumulative counts
    (k > distinct here, so the sketch is exact)."""
    import json
    import os

    from rakam_api_spark.streaming.windows import StreamingHeavyHitters

    in_dir = tmp_path / "hh_bus"
    in_dir.mkdir()
    (in_dir / "b0.json").write_text(
        "\n".join(json.dumps({"item": it}) for it in ["a"] * 5 + ["b"] * 3)
    )
    p1 = in_dir / "b1.json"
    p1.write_text("\n".join(json.dumps({"item": it}) for it in ["a"] * 2 + ["c"] * 4))
    os.utime(p1, (os.path.getmtime(in_dir / "b0.json") + 5,) * 2)

    stream = (
        spark.readStream.schema("item string")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    out = StreamingHeavyHitters(k=16, n_shards=4).apply(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("hh_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hh_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from hh_stream").collect()
    # latest emission per (shard, item) is the cumulative estimate
    latest = {}
    for r in rows:
        latest[(r["shard"], r["item"])] = r["est"]
    totals = {}
    for (_, item), est in latest.items():
        totals[item] = totals.get(item, 0) + est
    assert totals == {"a": 7, "b": 3, "c": 4}
