"""Streaming ingest tests: file-bus stream through the dynamic-schema
ingest path, uuid dedup, and push subscriptions."""

import os

import pytest
from pyspark.sql import functions as F

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
    assert q.awaitTermination(300), "stream did not finish in 300s"
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


def _envelope_df(spark, events):
    import json

    return spark.createDataFrame([(json.dumps(e),) for e in events], "value string")


def test_uuid_dedup_null_uuids_not_collapsed(ingest):
    """Events WITHOUT a uuid must not deduplicate against each other
    (NULL-grouping would silently drop distinct events)."""
    spark = ingest.spark
    batch = _envelope_df(
        spark,
        [
            {"collection": "c", "properties": {"x": 1}},
            {"collection": "c", "properties": {"x": 2}},
            {"collection": "c", "properties": {"x": 3}, "api": {"uuid": "u1"}},
            {"collection": "c", "properties": {"x": 4}, "api": {"uuid": "u1"}},
        ],
    )
    ingest.process_batch(batch, 0)
    df = ingest.collector.store.read("proj", "c")
    assert df.count() == 3  # two uuid-less + one survivor of u1


def test_uuid_dedup_window_expiry_and_bounded_state(spark, warehouse):
    """(a) re-send inside the window is dropped, (b) re-send after
    expiry is accepted, (c) the persisted seen set stays bounded
    across 2×window epochs (compaction drops expired epochs)."""
    from rakam_api_spark.catalog import Metastore

    ms = Metastore(warehouse)
    collector = EventCollector(spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()]))
    ing = StreamingIngest(
        collector, "proj", dedup_window_batches=2, seen_compact_every=2
    )
    ev = lambda uid, x: {"collection": "c", "properties": {"x": x}, "api": {"uuid": uid}}
    ing.process_batch(_envelope_df(spark, [ev("A", 1)]), 0)
    ing.process_batch(_envelope_df(spark, [ev("A", 2)]), 1)  # within window: dropped
    assert ing.collector.store.read("proj", "c").count() == 1
    ing.process_batch(_envelope_df(spark, [ev("B", 3)]), 2)
    ing.process_batch(_envelope_df(spark, [ev("C", 4)]), 3)
    # epoch 4: A was seen at epoch 0 < 4-2 -> expired -> accepted
    ing.process_batch(_envelope_df(spark, [ev("A", 5)]), 4)
    assert ing.collector.store.read("proj", "c").count() == 4
    # bounded state: current seen dir holds only epochs >= last_compact - window
    seen = spark.read.parquet(ing._current_seen_dir())
    assert seen.agg(F.min("epoch")).first()[0] >= 2  # epoch-0/1 rows compacted away
    assert seen.count() <= 2 * ing.dedup_window + 2


def test_seen_state_sharded_and_join_pruned(spark, warehouse):
    """The compacted seen-uuid state is hash-sharded (hive-partitioned
    by ``shard``, one rewrite task per shard — no repartition(1)
    funnel) and the dedup anti-join keys on the shard so the state
    scan prunes/partitions by it."""
    import os

    ms = Metastore(warehouse)
    collector = EventCollector(spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()]))
    ing = StreamingIngest(
        collector, "proj", dedup_window_batches=10, seen_compact_every=1, seen_shards=4
    )
    ev = lambda uid, x: {"collection": "c", "properties": {"x": x}, "api": {"uuid": uid}}
    ing.process_batch(_envelope_df(spark, [ev(f"u{i}", i) for i in range(32)]), 0)
    ing.process_batch(_envelope_df(spark, [ev(f"w{i}", i) for i in range(32)]), 1)
    d = ing._current_seen_dir()
    shard_dirs = [n for n in os.listdir(d) if n.startswith("shard=")]
    assert len(shard_dirs) > 1, "compacted state is not shard-partitioned"
    # shard column survives the read and the anti-join stays correct:
    # full re-send of epoch-0/1 uuids in epoch 2 all dedup away
    ing.process_batch(
        _envelope_df(spark, [ev(f"u{i}", 100 + i) for i in range(32)]), 2
    )
    assert ing.collector.store.read("proj", "c").count() == 64


def test_epoch_replay_is_idempotent_and_retry_safe(spark, warehouse):
    """A replayed fully-committed epoch is skipped (commit marker);
    a mid-epoch retry (no marker) re-ingests instead of anti-joining
    its own uuids away — at-least-once, never loss."""
    from rakam_api_spark.catalog import Metastore

    ms = Metastore(warehouse)
    collector = EventCollector(spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()]))
    ing = StreamingIngest(collector, "proj")
    batch = _envelope_df(
        spark, [{"collection": "c", "properties": {"x": 1}, "api": {"uuid": "r1"}}]
    )
    # simulate a crash AFTER seen-append but BEFORE the commit marker:
    # process once without a namespace (no marker written)...
    ing.process_batch(batch, 0)
    assert ing.collector.store.read("proj", "c").count() == 1
    # ...then the retry of the SAME epoch: current-epoch uuids are
    # excluded from the anti-join, so the batch is NOT lost
    ing.process_batch(batch, 0)
    assert ing.collector.store.read("proj", "c").count() == 2  # at-least-once
    # with a commit namespace, a replayed committed epoch is a no-op
    ing._commit_ns = "testns"
    ing.process_batch(batch, 5)
    n = ing.collector.store.read("proj", "c").count()
    ing.process_batch(batch, 5)  # replay
    assert ing.collector.store.read("proj", "c").count() == n


def test_subscription_exactly_once_across_batches(ingest, tmp_path):
    """Each subscriber sees each row exactly once — the push sends
    the batch frame, not a re-read of the stored table."""
    got: list[dict] = []
    ingest.registry.subscribe(
        StreamSubscription(
            project="proj", collection="clicks", columns=["x"],
            callback=lambda rows: got.extend(rows),
        )
    )
    _run_stream(
        ingest,
        tmp_path,
        [
            [{"collection": "clicks", "properties": {"x": 1}}],
            [{"collection": "clicks", "properties": {"x": 2}}],
        ],
    )
    xs = sorted(r["x"] for r in got)
    assert xs == [1.0, 2.0]  # no historical replay, no duplicates


def test_kafka_shaped_frame_shares_parse_path(ingest, tmp_path):
    """K4/K6: a Kafka-source-shaped frame (binary key/value + topic/
    partition/offset) goes through kafka_envelope_frame into the same
    process_batch; and the batch plan is RDD-free (no PythonRDD /
    ExistingRDD scans — pure from_json)."""
    import json

    from rakam_api_spark.streaming.job import (
        kafka_envelope_frame, parse_envelope, to_kafka_envelopes,
    )

    spark = ingest.spark
    events = [
        {"collection": "kcoll", "properties": {"x": 7, "s": "hi"}, "api": {"uuid": "k1"}},
        {"collection": "kcoll", "properties": {"x": 8}},
    ]
    pairs = to_kafka_envelopes(events, "proj")
    assert all(k.startswith("proj|kcoll|") for k, _ in pairs)
    spark.createDataFrame(
        [
            (k.encode(), v.encode(), "events", 0, i, None)
            for i, (k, v) in enumerate(pairs)
        ],
        "key binary, value binary, topic string, partition int, offset long, timestamp timestamp",
    ).write.parquet(str(tmp_path / "kafka_shaped"))
    # parquet round-trip: the test's own createDataFrame would put an
    # ExistingRDD scan in the plan and mask what we're auditing
    kafka_shaped = spark.read.parquet(str(tmp_path / "kafka_shaped"))
    batch = kafka_envelope_frame(kafka_shaped)
    ingest.process_batch(batch, 0)
    df = ingest.collector.store.read("proj", "kcoll")
    assert df.count() == 2
    assert {r["x"] for r in df.collect()} == {7.0, 8.0}
    # plan audit: the full parse path is column expressions only
    rows = parse_envelope(batch).where(F.col("collection") == "kcoll")
    props = ingest._parse_props(rows, "kcoll")
    plan = props._jdf.queryExecution().toString()
    assert "ExistingRDD" not in plan
    assert "PythonRDD" not in plan


def test_variant_ddl_converter():
    """JVM-side inference DDL → from_json dialect: OBJECT→STRUCT,
    DECIMAL→DOUBLE, VOID/VARIANT→STRING, but only in TYPE position —
    fields *named* like type keywords pass through untouched."""
    from rakam_api_spark.streaming.job import variant_struct_ddl

    assert variant_struct_ddl("OBJECT<a: BIGINT, b: STRING>") == "STRUCT<a: BIGINT, b: STRING>"
    assert (
        variant_struct_ddl("OBJECT<c: DECIMAL(21,1), n: DECIMAL(26,0)>")
        == "STRUCT<c: DOUBLE, n: DOUBLE>"
    )
    assert variant_struct_ddl("OBJECT<x: VARIANT, h: VOID>") == "STRUCT<x: STRING, h: STRING>"
    assert (
        variant_struct_ddl("OBJECT<VARIANT: STRING, VOID: BIGINT, `a b`: ARRAY<VARIANT>>")
        == "STRUCT<VARIANT: STRING, VOID: BIGINT, `a b`: ARRAY<STRING>>"
    )
    assert (
        variant_struct_ddl("OBJECT<o: OBJECT<p: ARRAY<DECIMAL(4,3)>>, m: MAP<STRING, VOID>>")
        == "STRUCT<o: STRUCT<p: ARRAY<DOUBLE>>, m: MAP<STRING, STRING>>"
    )
    assert variant_struct_ddl("OBJECT<>") is None  # empty object: nothing to parse
    assert variant_struct_ddl("VOID") is None  # all-null/unparseable sample
    assert variant_struct_ddl(None) is None
    assert variant_struct_ddl("ARRAY<BIGINT>") is None  # non-object payload


def test_schema_inference_is_jvm_side(ingest):
    """The batch schema probe must move NO data rows to the driver:
    one schema_of_variant_agg row per collection.  Regression guard
    for the round-2 driver-side sample (collect of up to 1000
    props_json strings per collection per batch)."""
    import inspect

    from rakam_api_spark.streaming import job as jobmod

    src = inspect.getsource(jobmod.StreamingIngest.process_batch) + inspect.getsource(
        jobmod.StreamingIngest._parse_props
    )
    assert "schema_of_variant_agg" in src
    # both collects in the loop are metadata-sized: the
    # per-collection DDL row (every epoch), and the distinct-months
    # list on the REPLAY-ONLY skipped-append path (rollup re-refresh
    # after a mid-epoch crash; bounded by the calendar, runs only
    # when a txn transaction identifier skipped the append).
    # (Touched months for the NORMAL path still ride the ingest
    # write's Observation — no second lineage pass.)
    assert src.count(".collect()") == 2
    assert "limit(" not in src  # no bounded driver sample remains


def test_commit_ns_fresh_after_checkpoint_delete(spark, warehouse, tmp_path):
    """Deleting the checkpoint dir (standard Spark reprocess) must
    mint a FRESH commit namespace: epoch ids restart at 0, and stale
    markers from the old namespace must not skip replayed batches.
    The orphaned namespace is garbage-collected."""
    import shutil

    from rakam_api_spark.catalog import Metastore

    ms = Metastore(warehouse)
    collector = EventCollector(spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()]))
    ing = StreamingIngest(collector, "proj")
    ckpt = str(tmp_path / "ckpt")
    ing._ensure_commit_ns(ckpt)
    first_ns = ing._commit_ns
    ing._mark_committed(0)
    assert ing._is_committed(0)
    # same checkpoint re-read: same namespace, markers survive
    ing._ensure_commit_ns(ckpt)
    assert ing._commit_ns == first_ns and ing._is_committed(0)
    # checkpoint deleted → fresh token → epoch 0 replays for real
    shutil.rmtree(ckpt)
    ing._ensure_commit_ns(ckpt)
    assert ing._commit_ns != first_ns
    assert not ing._is_committed(0)
    # the old namespace dir was GCed
    assert not os.path.exists(os.path.join(ing._commit_base, first_ns))


def test_commit_marker_gc_bounds_namespace(spark, warehouse, tmp_path):
    from rakam_api_spark.catalog import Metastore

    ms = Metastore(warehouse)
    collector = EventCollector(spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()]))
    ing = StreamingIngest(collector, "proj", marker_retention_epochs=50)
    ing._ensure_commit_ns(str(tmp_path / "ckpt"))
    for e in (0, 10, 140, 160):
        ing._mark_committed(e)
    ing._mark_committed(200)  # %100 == 0 and > retention → GC < 150
    d = ing._commit_dir()
    left = {n for n in os.listdir(d) if n.startswith("epoch_")}
    assert left == {"epoch_160", "epoch_200"}


def test_kafka_envelope_salt_stable_across_processes():
    """Retry shard-affinity contract: the producer salt must be a
    stable digest, not Python hash() (PYTHONHASHSEED randomization
    would scatter retries across shards after a gateway restart)."""
    import subprocess
    import sys

    prog = (
        "from rakam_api_spark.streaming.job import to_kafka_envelopes;"
        "print([k for k, _ in to_kafka_envelopes("
        "[{'collection': 'c', 'properties': {'x': i}} for i in range(20)], 'p')])"
    )
    outs = set()
    for seed in ("1", "2"):
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ, PYTHONHASHSEED=seed, PYTHONPATH=repo_root)
        outs.add(
            subprocess.run(
                [sys.executable, "-c", prog], capture_output=True, text=True, env=env, check=True
            ).stdout.strip()
        )
    assert len(outs) == 1  # identical keys under different hash seeds


def test_push_sees_exactly_the_stored_rows(ingest, tmp_path):
    """ADVICE r2: the pushed _time/$server_time must equal the values
    actually stored — server time is pinned per ingest and the batch
    frame is retained through the push, so the push can never observe
    a re-executed lineage with a different current_timestamp()."""
    got: list[dict] = []
    ingest.registry.subscribe(
        StreamSubscription(
            project="proj", collection="clicks",
            columns=["x", "_time", "$server_time"],
            callback=lambda rows: got.extend(rows),
        )
    )
    _run_stream(
        ingest, tmp_path,
        [[{"collection": "clicks", "properties": {"x": 1}},
          {"collection": "clicks", "properties": {"x": 2}}]],
    )
    stored = {
        (r["x"], r["_time"], r["$server_time"])
        for r in ingest.collector.store.read("proj", "clicks")
        .select("x", "_time", "$server_time").collect()
    }
    pushed = {(r["x"], r["_time"], r["$server_time"]) for r in got}
    assert pushed == stored and len(stored) == 2


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


def test_parallel_collection_ingest_one_epoch(spark, warehouse, tmp_path):
    """≥8 collections in a single epoch ingest concurrently (epoch
    wall-time tracks the largest collection, not the sum): every
    collection lands with its own schema, and the per-collection
    ingest provably ran on multiple pool threads."""
    import threading

    ms = Metastore(warehouse)
    collector = EventCollector(spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()]))
    ing = StreamingIngest(collector, "proj", dedup_uuids=False, ingest_parallelism=8)
    seen_threads = set()
    orig = collector._ingest_df

    def spy(*a, **kw):
        seen_threads.add(threading.current_thread().name)
        return orig(*a, **kw)

    collector._ingest_df = spy
    events = [
        {"collection": f"coll{i}", "properties": {f"field{i}": i, "v": float(i)}}
        for i in range(10)
    ]
    batch = spark.createDataFrame([(__import__("json").dumps(e),) for e in events], "value string")
    ing.process_batch(batch, 0)
    for i in range(10):
        df = collector.store.read("proj", f"coll{i}")
        assert df.count() == 1
        assert f"field{i}" in df.columns
    assert len(seen_threads) > 1, "per-collection ingest did not parallelize"


def test_parallel_ingest_failure_fails_epoch(spark, warehouse, tmp_path):
    """A failing collection fails the whole epoch (no commit marker →
    at-least-once replay re-processes it); sibling collections'
    completed writes are tolerated by replay idempotence upstream."""
    ms = Metastore(warehouse)
    collector = EventCollector(spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()]))
    ing = StreamingIngest(collector, "proj", dedup_uuids=False, ingest_parallelism=4)
    orig = collector._ingest_df

    def failing(project, coll, *a, **kw):
        if coll == "bad":
            raise RuntimeError("boom")
        return orig(project, coll, *a, **kw)

    collector._ingest_df = failing
    events = [{"collection": c, "properties": {"x": 1}} for c in ("a", "b", "bad", "d")]
    batch = spark.createDataFrame([(__import__("json").dumps(e),) for e in events], "value string")
    with pytest.raises(RuntimeError, match="boom"):
        ing.process_batch(batch, 0)


def test_kafka_session_package_pinned_to_pyspark_version():
    """get_spark(kafka=True) resolves the spark-sql-kafka connector at
    the installed Spark version / Scala 2.13 (no broker or network in
    the container, so only the coordinate wiring is asserted here —
    the envelope parse itself is covered broker-free above)."""
    import pyspark

    from rakam_api_spark.session import _kafka_package

    assert _kafka_package() == (
        f"org.apache.spark:spark-sql-kafka-0-10_2.13:{pyspark.__version__}"
    )


def test_streaming_rollup_maintenance(spark, warehouse):
    """Configured collections get their day-grain rollup refreshed
    per epoch for just the months the batch touched, and route_report
    serves the report from the maintained cells."""
    ms = Metastore(warehouse)
    collector = EventCollector(spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()]))
    measures = {
        "n_events": "CAST(COUNT(*) AS BIGINT)",
        "total_value": "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)",
    }
    ing = StreamingIngest(
        collector,
        "proj",
        dedup_uuids=False,
        rollup_specs={"clicks": {"dims": ("event_type",), "measures": measures}},
    )

    def ev(etype, v, t):
        return {
            "collection": "clicks",
            "properties": {"event_type": etype, "value": v, "_time": t},
        }

    ing.process_batch(
        _envelope_df(
            spark,
            [ev("view", 1.0, "2024-01-03 10:00:00"), ev("click", 2.0, "2024-01-04 10:00:00")],
        ),
        0,
    )
    store = collector.store
    cells = store.read_rollup("proj", "clicks")
    assert {r["_month"] for r in cells.collect()} == {"2024-01"}
    # epoch 2 touches a NEW month only; January cells stay intact
    jan_files = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(store._base_path("proj", "clicks") + ".rollup/_month=2024-01")
        for f in fs
        if f.endswith(".parquet")
    )
    ing.process_batch(
        _envelope_df(spark, [ev("view", 5.0, "2024-02-01 09:00:00")]), 1
    )
    jan_files_after = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(store._base_path("proj", "clicks") + ".rollup/_month=2024-01")
        for f in fs
        if f.endswith(".parquet")
    )
    assert jan_files == jan_files_after  # untouched month not rewritten
    routed = store.route_report(
        "proj", "clicks", dims=("event_type",), measures=measures, grain="month"
    )
    assert routed.route == "rollup"
    got = {(r["_month"], r["event_type"]): (r["n_events"], r["total_value"]) for r in routed.df.collect()}
    assert got == {
        ("2024-01", "view"): (1, 1.0),
        ("2024-01", "click"): (1, 2.0),
        ("2024-02", "view"): (1, 5.0),
    }


def test_rollup_spec_mismatch_fails_at_stream_start(spark, warehouse, tmp_path):
    """A rollup spec that disagrees with the already-published
    dim/measure contract must fail when the stream STARTS — before any
    ingest — not as a mid-epoch publish_rollup ValueError that kills a
    live ingest stream."""
    import pytest

    ms = Metastore(warehouse)
    collector = EventCollector(spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()]))
    collector.collect(
        "proj", "clicks", {"event_type": "view", "value": 1.0, "_time": "2024-01-03 10:00:00"}
    )
    collector.store.publish_rollup("proj", "clicks", dims=("event_type",))
    ing = StreamingIngest(
        collector,
        "proj",
        dedup_uuids=False,
        # different dims than the published contract
        rollup_specs={"clicks": {"dims": ("event_type", "value")}},
    )
    with pytest.raises(ValueError, match="published contract"):
        ing.validate_rollup_specs()
    (tmp_path / "in").mkdir()
    with pytest.raises(ValueError, match="published contract"):
        ing.start_file_stream(str(tmp_path / "in"), str(tmp_path / "ckpt"))
    # a matching spec (defaults resolve to the published measures) is fine
    ok = StreamingIngest(
        collector,
        "proj",
        dedup_uuids=False,
        rollup_specs={"clicks": {"dims": ("event_type",)}},
    )
    ok.validate_rollup_specs()


def test_observe_months_rides_the_write_pass(spark, warehouse):
    """months_touched comes from the write-pass Observation — present
    exactly when requested, correct across months, and absent
    otherwise (no second lineage execution for rollup maintenance)."""
    ms = Metastore(warehouse)
    collector = EventCollector(spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()]))
    df = collector._records_to_df(
        [
            {"event_type": "view", "_time": "2024-01-03 10:00:00"},
            {"event_type": "view", "_time": "2024-03-09 10:00:00"},
            {"event_type": "click", "_time": "2024-01-20 10:00:00"},
        ]
    )
    report = collector._ingest_df("proj", "clicks", df, observe_months=True)
    assert report.months_touched == ["2024-01", "2024-03"]
    report2 = collector._ingest_df("proj", "clicks", df)
    assert report2.months_touched is None
