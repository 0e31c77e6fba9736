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
