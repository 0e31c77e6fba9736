"""Streaming ingest tests: file-bus stream through the dynamic-schema
ingest path, uuid dedup, and push subscriptions."""

import os

import pytest

from rakam_api_spark.api import EventCollector
from rakam_api_spark.catalog import Metastore
from rakam_api_spark.enrich import EnrichmentPipeline, TimestampMapper
from rakam_api_spark.streaming import StreamingIngest, StreamSubscription, SubscriptionRegistry
from rakam_api_spark.streaming.job import write_envelope_file


@pytest.fixture()
def ingest(spark, warehouse, tmp_path):
    ms = Metastore(warehouse)
    collector = EventCollector(spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()]))
    return StreamingIngest(collector, "proj")


def _run_stream(ingest, tmp_path, files):
    import time

    in_dir = tmp_path / "bus"
    in_dir.mkdir(exist_ok=True)
    now = time.time()
    for i, events in enumerate(files):
        p = in_dir / f"batch{i}.json"
        write_envelope_file(str(p), events)
        # distinct mtimes: the file source orders batches by mtime,
        # and arrival order decides first-seen schema inference
        os.utime(p, (now - len(files) + i, now - len(files) + i))
    q = ingest.start_file_stream(str(in_dir), str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    return q


def test_stream_ingests_and_evolves(ingest, tmp_path):
    _run_stream(
        ingest,
        tmp_path,
        [
            [
                {"collection": "clicks", "properties": {"x": 1, "page": "/home"}},
                {"collection": "views", "properties": {"d": "2024-01-01"}},
            ],
            [
                {"collection": "clicks", "properties": {"x": 2, "newcol": True}},
            ],
        ],
    )
    clicks = ingest.collector.store.read("proj", "clicks")
    assert clicks.count() == 2
    assert "newcol" in clicks.columns  # schema evolved mid-stream
    views = ingest.collector.store.read("proj", "views")
    assert views.count() == 1
    from rakam_api_spark.types import FieldType

    assert ingest.collector.metastore.project("proj").collections["views"].fields["d"] == FieldType.DATE


def test_stream_uuid_dedup(ingest, tmp_path):
    ev = {"collection": "c", "properties": {"x": 1}, "api": {"uuid": "e-1"}}
    other = {"collection": "c", "properties": {"x": 2}, "api": {"uuid": "e-2"}}
    # duplicate within one batch AND across batches
    _run_stream(ingest, tmp_path, [[ev, ev, other], [ev]])
    df = ingest.collector.store.read("proj", "c")
    assert df.count() == 2  # e-1 once, e-2 once


def test_stream_subscription_push(ingest, tmp_path):
    got: list[dict] = []
    ingest.registry.subscribe(
        StreamSubscription(
            project="proj",
            collection="clicks",
            filter="x > 1",
            columns=["x"],
            callback=lambda rows: got.extend(rows),
        )
    )
    _run_stream(
        ingest,
        tmp_path,
        [[
            {"collection": "clicks", "properties": {"x": 1}},
            {"collection": "clicks", "properties": {"x": 5}},
        ]],
    )
    assert any(r["x"] == 5.0 for r in got)
    assert all(r["x"] > 1 for r in got)


def test_stream_dead_letter(ingest, tmp_path):
    _run_stream(
        ingest,
        tmp_path,
        [
            [{"collection": "c", "properties": {"price": 9.5}}],
            [{"collection": "c", "properties": {"price": "bad-value"}}],
        ],
    )
    dead = ingest.collector.store.read_dead_letter("proj").collect()
    assert len(dead) == 1
    assert dead[0]["property"] == "price"
    assert os.path.exists  # keep flake quiet


def test_windowed_counts_stream(spark, tmp_path):
    """Watermarked tumbling-window agg over a streaming source
    matches the batch run of the same plan."""
    import json

    from rakam_api_spark.streaming.windows import windowed_counts

    in_dir = tmp_path / "win_bus"
    in_dir.mkdir()
    rows = [
        {"ts": "2024-01-01 00:10:00", "event_type": "click", "user_id": 1},
        {"ts": "2024-01-01 05:59:00", "event_type": "click", "user_id": 2},
        {"ts": "2024-01-01 06:10:00", "event_type": "view", "user_id": 1},
        {"ts": "2024-01-01 12:01:00", "event_type": "click", "user_id": 3},
    ]
    (in_dir / "b0.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = "ts timestamp, event_type string, user_id long"
    stream = spark.readStream.schema(schema).json(str(in_dir))
    out = windowed_counts(stream, window="6 hours", watermark="12 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["window_start"].hour, r["event_type"]): r["n_events"]
        for r in spark.sql("select * from win_counts").collect()
    }
    assert got[(0, "click")] == 2
    assert got[(6, "view")] == 1
    assert got[(12, "click")] == 1
    # batch run of the SAME function gives the same counts
    batch = spark.createDataFrame(
        [(r["ts"], r["event_type"], r["user_id"]) for r in rows],
        "ts string, event_type string, user_id long",
    ).selectExpr("cast(ts as timestamp) ts", "event_type", "user_id")
    bat = {
        (r["window_start"].hour, r["event_type"]): r["n_events"]
        for r in windowed_counts(batch).collect()
    }
    assert bat == got


def test_stateful_sessionizer(spark, tmp_path):
    """applyInPandasWithState keeps per-user open sessions across
    micro-batches and emits sessions closed by a gap."""
    import json

    from rakam_api_spark.streaming.windows import StatefulSessionizer

    in_dir = tmp_path / "sess_bus"
    in_dir.mkdir()
    m = 60 * 1_000_000
    # batch 0: user 1 events at t=0,10min ; user 2 at t=0
    (in_dir / "b0.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"user_id": 1, "ts_us": 0},
                {"user_id": 1, "ts_us": 10 * m},
                {"user_id": 2, "ts_us": 0},
            ]
        )
    )
    # batch 1 (later mtime): user 1 returns after 2h -> closes session
    p1 = in_dir / "b1.json"
    p1.write_text(json.dumps({"user_id": 1, "ts_us": 130 * m}))
    os.utime(p1, (os.path.getmtime(in_dir / "b0.json") + 5,) * 2)

    stream = spark.readStream.schema("user_id long, ts_us long").option(
        "maxFilesPerTrigger", 1
    ).json(str(in_dir))
    out = StatefulSessionizer(gap_seconds=1800).apply(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from closed_sessions").collect()
    assert len(rows) == 1  # only user 1's first session closed
    r = rows[0]
    assert r["user_id"] == 1
    assert r["session_start_us"] == 0
    assert r["session_end_us"] == 10 * m
    assert r["n_events"] == 2


def test_stream_stream_attribution_join(spark, tmp_path):
    """Watermarked stream-stream join: purchases attributed to the
    same user's views within the trailing window; streaming result
    matches the batch run of the same function."""
    import json

    from rakam_api_spark.streaming.windows import attributed_purchases

    vdir, pdir = tmp_path / "views", tmp_path / "purch"
    vdir.mkdir(), pdir.mkdir()
    views = [
        {"event_id": 1, "user_id": 1, "ts": "2024-01-01 10:00:00"},
        {"event_id": 2, "user_id": 1, "ts": "2024-01-01 10:40:00"},
        {"event_id": 3, "user_id": 2, "ts": "2024-01-01 08:00:00"},  # too old
    ]
    purchases = [
        {"event_id": 10, "user_id": 1, "ts": "2024-01-01 11:00:00", "value": 9.5},
        {"event_id": 11, "user_id": 2, "ts": "2024-01-01 11:00:00", "value": 1.0},
    ]
    (vdir / "v.json").write_text("\n".join(json.dumps(r) for r in views))
    (pdir / "p.json").write_text("\n".join(json.dumps(r) for r in purchases))
    vschema = "event_id long, user_id long, ts timestamp"
    pschema = "event_id long, user_id long, ts timestamp, value double"

    out = attributed_purchases(
        spark.readStream.schema(vschema).json(str(vdir)),
        spark.readStream.schema(pschema).json(str(pdir)),
    )
    q = (
        out.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "attrib_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {(r["purchase_id"], r["view_id"]) for r in spark.sql("select * from attrib").collect()}
    # purchase 10 matches view 2 only (view 1 is 60 min before -> on
    # boundary: 10:00 >= 11:00 - 1h -> inclusive, so BOTH match)
    assert got == {(10, 1), (10, 2)}

    batch = attributed_purchases(
        spark.createDataFrame([(r["event_id"], r["user_id"], r["ts"]) for r in views],
                              "event_id long, user_id long, ts string").selectExpr(
            "event_id", "user_id", "cast(ts as timestamp) ts"),
        spark.createDataFrame([(r["event_id"], r["user_id"], r["ts"], r["value"]) for r in purchases],
                              "event_id long, user_id long, ts string, value double").selectExpr(
            "event_id", "user_id", "cast(ts as timestamp) ts", "value"),
    )
    assert {(r["purchase_id"], r["view_id"]) for r in batch.collect()} == got
