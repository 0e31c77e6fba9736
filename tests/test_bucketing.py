"""Bucketed event layout: user-keyed plans run shuffle-free over the
bucketed table and produce identical results to the parquet path."""

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from rakam_api_spark.bucketing import bucketed_table, has_exchange, write_bucketed
from rakam_api_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    ev = load_table(spark, SF, "events")
    name = "test_ev_user_bucketed"
    write_bucketed(
        ev, name, str(tmp_path_factory.mktemp("bucketed") / "ev"), n_buckets=8
    )
    yield bucketed_table(spark, name)
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_user_agg_is_shuffle_free_on_bucketed(spark, bucketed):
    ev = load_table(spark, SF, "events")
    agg = lambda df: df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("ts").alias("last_seen"),
    )
    assert has_exchange(agg(ev))  # parquet path pays the shuffle
    assert not has_exchange(agg(bucketed))  # bucketed layout: zero
    # identical results
    a = {tuple(r) for r in agg(ev).collect()}
    b = {tuple(r) for r in agg(bucketed).collect()}
    assert a == b


def test_user_window_is_shuffle_free_on_bucketed(spark, bucketed):
    """Sessionization/funnel shape: Window.partitionBy(user_id) —
    the per-query fact shuffle disappears on the bucketed layout."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rank = lambda df: df.select(
        "user_id", "event_id", F.row_number().over(w).alias("rn")
    )
    ev = load_table(spark, SF, "events")
    assert has_exchange(rank(ev))
    assert not has_exchange(rank(bucketed))
    a = {tuple(r) for r in rank(ev).collect()}
    b = {tuple(r) for r in rank(bucketed).collect()}
    assert a == b


def test_sessionization_semantics_match_on_bucketed(spark, bucketed):
    """The real operator: gap-based sessions computed over the
    bucketed table equal the parquet-path result, with the session
    window stage shuffle-free."""
    def sessions(df):
        us = F.expr("ts_ns div 1000")  # epoch-us, the engine's convention
        w = Window.partitionBy("user_id").orderBy("_us")
        sess = df.select("user_id", us.alias("_us")).select(
            "user_id",
            "_us",
            F.when(F.col("_us") - F.lag("_us").over(w) > 1_800_000_000, 1)
            .otherwise(0)
            .alias("new_sess"),
        )
        w2 = Window.partitionBy("user_id").orderBy("_us").rowsBetween(
            Window.unboundedPreceding, 0
        )
        with_id = sess.withColumn("sess_id", F.sum("new_sess").over(w2))
        return with_id.groupBy("user_id", "sess_id").agg(
            F.count(F.lit(1)).alias("n"), F.min("_us").alias("start_us")
        )

    ev = load_table(spark, SF, "events")
    assert not has_exchange(sessions(bucketed))
    a = {tuple(r) for r in sessions(ev).collect()}
    b = {tuple(r) for r in sessions(bucketed).collect()}
    assert a == b


def test_store_publish_bucketed_roundtrip(spark, warehouse):
    """EventStore.publish_bucketed: ingest via the normal path, then
    republish by _user — catalog table is Exchange-free on the user
    key and row-identical to the collection read."""
    from rakam_api_spark.api import EventCollector
    from rakam_api_spark.catalog import Metastore
    from rakam_api_spark.enrich import EnrichmentPipeline, TimestampMapper

    ms = Metastore(warehouse)
    collector = EventCollector(spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()]))
    collector.bulk(
        "p",
        "clicks",
        [{"_user": f"u{i % 7}", "x": i} for i in range(50)],
    )
    name = collector.store.publish_bucketed("p", "clicks", n_buckets=4)
    try:
        t = spark.table(name)
        agg = t.groupBy("_user").agg(F.count(F.lit(1)).alias("n"))
        assert not has_exchange(agg)
        got = {(r["_user"], r["n"]) for r in agg.collect()}
        want = {
            (r["_user"], r["n"])
            for r in collector.store.read("p", "clicks")
            .groupBy("_user").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert got == want and len(got) == 7
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
