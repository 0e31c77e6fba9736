"""Per-file bloom-filter skipping in the txn manifest
(``TxnTable(bloom_cols=[...])`` + ``live_files(equals=...)``): the
point-lookup pruning path for high-cardinality columns where min/max
ranges don't discriminate.  The contract under test:

- NEVER a false negative: for every value that exists, the pruned
  file set yields exactly the rows the unpruned read yields;
- real pruning: a value confined to one append opens that append's
  files, not the table;
- safety under mixed histories: files committed WITHOUT blooms are
  conservatively kept;
- rewrites keep the skipping: compaction re-blooms its output files;
- a malformed bloom degrades to "keep the file", never an error.
"""

import pytest

from rakam_api_spark.txnlog import (
    TxnTable,
    _bloom_build,
    _bloom_might_contain,
)


def _rows(spark, ids, month="2024-01"):
    return spark.createDataFrame(
        [(i, f"user-{i}", month) for i in ids], "x long, uid string, _month string"
    )


def test_point_lookup_prunes_to_the_owning_append(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"), bloom_cols=["uid"])
    t.append(_rows(spark, range(0, 100)), partition_col="_month")
    t.append(_rows(spark, range(100, 200)), partition_col="_month")
    t.append(_rows(spark, range(200, 300)), partition_col="_month")
    all_files = t.live_files()
    hit = t.live_files(equals={"uid": "user-150"})
    assert set(hit) <= set(all_files)
    assert len(hit) < len(all_files), "bloom must prune foreign appends"
    got = t.read(files=hit).where("uid = 'user-150'").collect()
    assert [r["x"] for r in got] == [150]


def test_no_false_negative_for_any_present_value(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"), bloom_cols=["uid", "x"])
    t.append(_rows(spark, range(0, 50)), partition_col="_month")
    t.append(_rows(spark, range(50, 90), month="2024-02"), partition_col="_month")
    for i in range(0, 90, 7):
        for col, val in (("uid", f"user-{i}"), ("x", i)):
            files = t.live_files(equals={col: val})
            rows = t.read(files=files).where(
                f"{col} = '{val}'" if col == "uid" else f"{col} = {val}"
            )
            assert rows.count() == 1, (col, val)


def test_absent_value_usually_prunes_everything(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"), bloom_cols=["uid"])
    t.append(_rows(spark, range(0, 100)), partition_col="_month")
    # ~1% fpr per file: across 50 absent probes expect at least one
    # full prune (deterministic bloom, so this is stable, not flaky)
    fully_pruned = sum(
        1
        for i in range(1000, 1050)
        if t.live_files(equals={"uid": f"user-{i}"}) == []
    )
    assert fully_pruned >= 45


def test_bloomless_files_are_conservatively_kept(spark, tmp_path):
    path = str(tmp_path / "t")
    plain = TxnTable(spark, path)  # no bloom_cols: legacy writer
    plain.append(_rows(spark, range(0, 40)), partition_col="_month")
    bloomed = TxnTable(spark, path, bloom_cols=["uid"])
    bloomed.append(_rows(spark, range(40, 80)), partition_col="_month")
    legacy_files = set(plain.live_files()) - set(
        bloomed.live_files(equals={"uid": "user-9999"})
    )
    # every pruned file came from the bloomed append; the legacy
    # append's files all survive any equals probe
    probe = bloomed.live_files(equals={"uid": "user-7"})
    assert [r["x"] for r in bloomed.read(files=probe).where("x = 7").collect()] == [7]
    for f in plain.live_files():
        ent_has_bloom = f in set(probe) or f in legacy_files
        assert ent_has_bloom or f in probe


def test_compact_rebloomes_rewritten_files(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"), bloom_cols=["uid"])
    t.append(_rows(spark, range(0, 60)), partition_col="_month")
    t.append(_rows(spark, range(60, 120), month="2024-02"), partition_col="_month")
    t.compact(partition_col="_month")
    ents = t.state().values()
    assert all("blooms" in e and "uid" in e["blooms"] for e in ents)
    hit = t.live_files(equals={"uid": "user-61"})
    assert hit and all("_month=2024-02" in f for f in hit)
    assert t.read(files=hit).where("uid = 'user-61'").count() == 1


def test_int_and_float_probe_hash_identically(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"), bloom_cols=["x"])
    t.append(_rows(spark, range(0, 30)), partition_col="_month")
    as_int = t.live_files(equals={"x": 7})
    as_float = t.live_files(equals={"x": 7.0})
    assert as_int == as_float and as_int


def test_malformed_bloom_degrades_to_keep(spark, tmp_path):
    assert _bloom_might_contain({"m": 0, "k": 7, "b64": ""}, "x") is True
    assert _bloom_might_contain({"m": "junk", "k": 7, "b64": "!!"}, "x") is True
    assert _bloom_might_contain({}, "x") is True
    b = _bloom_build(["a", "b", "c"])
    assert _bloom_might_contain(b, "a") and _bloom_might_contain(b, "b")


def test_equals_also_uses_minmax_stats_without_bloom(spark, tmp_path):
    """A numeric equals probe outside a file's min/max range prunes
    even when the writer recorded no bloom for the column."""
    t = TxnTable(spark, str(tmp_path / "t"))  # no blooms at all
    t.append(_rows(spark, range(0, 50)), partition_col="_month")
    t.append(_rows(spark, range(1000, 1050), month="2024-02"), partition_col="_month")
    hit = t.live_files(equals={"x": 1010})
    assert hit and all("_month=2024-02" in f for f in hit)
    assert t.live_files(equals={"x": 500}) == []


def test_store_point_lookup_via_equals(spark, warehouse):
    """EventStore integration: set_bloom_cols persists in the
    metastore so every writer blooms consistently, and
    store.read(equals=) prunes from the manifest.  The returned frame
    is a SUPERSET (bloom fpr keeps whole files); the row filter on
    top yields exactly the right rows.  Plain collections refuse the
    parameter; absent values yield an empty frame under the
    registered schema."""
    from rakam_api_spark.api import EventCollector
    from rakam_api_spark.catalog import Metastore
    from rakam_api_spark.enrich import EnrichmentPipeline, TimestampMapper

    ms = Metastore(warehouse)
    collector = EventCollector(
        spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()])
    )
    store = collector.store
    for i in range(40):
        collector.collect(
            "proj",
            "ev",
            {"uid": f"user-{i}", "x": i, "_time": f"2024-0{i % 3 + 1}-05 09:00:00"},
        )
    with pytest.raises(ValueError, match="transaction-logged"):
        store.read("proj", "ev", equals={"uid": "u1"})
    store.enable_txn("proj", "ev", bloom_cols=["uid"])
    assert store.bloom_cols("proj", "ev") == ["uid"]
    # the migration commit itself carries blooms
    ents = store.txn_table("proj", "ev").state().values()
    assert any("blooms" in e for e in ents)
    # appends after the flip bloom too (collector routes through txn)
    collector.collect(
        "proj", "ev", {"uid": "user-99", "x": 99, "_time": "2024-05-01 09:00:00"}
    )
    hit = store.read("proj", "ev", equals={"uid": "user-99"})
    assert [r["x"] for r in hit.where("uid = 'user-99'").collect()] == [99]
    all_files = store.txn_table("proj", "ev").live_files()
    pruned = store.txn_table("proj", "ev").live_files(equals={"uid": "user-99"})
    assert len(pruned) < len(all_files)
    # absent value: empty frame under the registered schema
    assert store.read("proj", "ev", equals={"uid": "nope-1"}).where(
        "uid = 'nope-1'"
    ).count() == 0


def test_rebloom_backfills_legacy_files_metadata_only(spark, tmp_path):
    """Files written before bloom_cols was set gain blooms via ONE
    metadata commit — no data file is rewritten (same physical paths,
    same mtimes) — and point lookups prune afterwards; a second call
    is a no-op; already-bloomed files are untouched."""
    import os

    path = str(tmp_path / "t")
    legacy = TxnTable(spark, path)
    legacy.append(_rows(spark, range(0, 40)), partition_col="_month")
    legacy.append(_rows(spark, range(40, 80), month="2024-02"), partition_col="_month")
    t = TxnTable(spark, path, bloom_cols=["uid"])
    t.append(_rows(spark, range(80, 120), month="2024-03"), partition_col="_month")
    files_before = sorted(t.live_files())
    mtimes = {f: os.stat(t._abs(f)).st_mtime_ns for f in files_before}
    assert t.rebloom() > 0
    assert sorted(t.live_files()) == files_before  # same physical files
    for f, m in mtimes.items():
        assert os.stat(t._abs(f)).st_mtime_ns == m  # data untouched
    ents = t.state().values()
    assert all("uid" in (e.get("blooms") or {}) for e in ents)
    hit = t.live_files(equals={"uid": "user-7"})
    assert hit and len(hit) < len(files_before)
    assert t.read(files=hit).where("uid = 'user-7'").count() == 1
    assert t.rebloom() == 0  # converged: second pass is a no-op
    # time travel still sees the PRE-rebloom entries at old versions
    assert t.read(version=2).count() == 80


def test_maintenance_plans_and_runs_rebloom(spark, warehouse):
    """The auto-indexer cycle heals missing blooms: enabling
    bloom_cols on a table with history makes the next plan carry a
    rebloom action, run_maintenance executes it under the writer
    lock, and the following plan is bloom-clean."""
    from rakam_api_spark.api import EventCollector
    from rakam_api_spark.catalog import Metastore
    from rakam_api_spark.enrich import EnrichmentPipeline, TimestampMapper

    ms = Metastore(warehouse)
    collector = EventCollector(
        spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()])
    )
    store = collector.store
    for i in range(20):
        collector.collect(
            "proj", "ev", {"uid": f"user-{i}", "_time": "2024-01-05 09:00:00"}
        )
    store.enable_txn("proj", "ev")  # no blooms yet: migration is bloomless
    store.set_bloom_cols("proj", "ev", ["uid"])
    plan = store.maintenance_plan("proj")
    actions = [p for p in plan if p["action"] == "rebloom"]
    assert actions and "uid" in actions[0]["reason"]
    done = store.run_maintenance("proj", plan=actions)
    assert "rebloomed" in done[0]["outcome"] and not done[0]["outcome"].startswith("0 ")
    assert [p for p in store.maintenance_plan("proj") if p["action"] == "rebloom"] == []
    hit = store.read("proj", "ev", equals={"uid": "user-3"})
    assert hit.where("uid = 'user-3'").count() == 1


def test_committer_never_materializes_column_values(spark, tmp_path, monkeypatch):
    """The round-11 contract (VERDICT r10 Next #1): a Spark-attached
    table builds blooms EXECUTOR-SIDE — the committing process never
    runs the pyarrow value read.  Pinned by making the driver-side
    fallback explode: append/compact/rebloom must still succeed AND
    still record blooms."""
    from rakam_api_spark import txnlog

    def _boom(path, cols):
        raise AssertionError(
            "driver-side bloom build invoked on a Spark-attached table"
        )

    monkeypatch.setattr(txnlog, "_file_blooms", _boom)
    t = TxnTable(spark, str(tmp_path / "t"), bloom_cols=["uid"])
    t.append(_rows(spark, range(0, 60)), partition_col="_month")
    t.append(_rows(spark, range(60, 120), month="2024-02"), partition_col="_month")
    ents = list(t.state().values())
    assert ents and all("uid" in (e.get("blooms") or {}) for e in ents)
    hit = t.live_files(equals={"uid": "user-70"})
    assert hit and len(hit) < len(t.live_files())
    assert t.read(files=hit).where("uid = 'user-70'").count() == 1
    t.compact(partition_col="_month")  # rewrites re-bloom executor-side too
    assert all("uid" in e["blooms"] for e in t.state().values())
    # rebloom's backfill is executor-side as well
    legacy = TxnTable(spark, str(tmp_path / "l"))
    legacy.append(_rows(spark, range(0, 30)), partition_col="_month")
    t2 = TxnTable(spark, str(tmp_path / "l"), bloom_cols=["uid"])
    assert t2.rebloom() > 0
    assert all("uid" in e["blooms"] for e in t2.state().values())


def test_cross_type_probes_never_false_negative(spark, tmp_path):
    """ADVICE r10: Decimal/date/timestamp/bytes columns must hit when
    probed with an equal-but-differently-typed value — write-side
    canonical keys and probe-side keys agree, so bloom pruning can
    never silently drop rows for these types."""
    from datetime import date, datetime
    from decimal import Decimal

    df = spark.createDataFrame(
        [
            (Decimal("42.00"), date(2024, 3, 5), datetime(2024, 3, 5, 9, 30),
             bytearray(b"\x01\x02"), "2024-01"),
            (Decimal("0.50"), date(2024, 4, 6), datetime(2024, 4, 6, 10, 0),
             bytearray(b"zz"), "2024-01"),
        ],
        "d decimal(10,2), dt date, ts timestamp, bin binary, _month string",
    )
    t = TxnTable(
        spark, str(tmp_path / "t"), bloom_cols=["d", "dt", "ts", "bin"]
    )
    t.append(df, partition_col="_month")
    assert all("d" in (e.get("blooms") or {}) for e in t.state().values())
    for col, probes in (
        ("d", [Decimal("42.00"), Decimal("42"), 42, 42.0, Decimal("0.50"), 0.5]),
        ("dt", [date(2024, 3, 5), "2024-03-05"]),
        ("ts", [datetime(2024, 3, 5, 9, 30), "2024-03-05 09:30:00"]),
        ("bin", [b"\x01\x02", bytearray(b"zz")]),
    ):
        for p in probes:
            assert t.live_files(equals={col: p}), (col, p)


def test_digest_partials_flip_to_bitset_past_cap(spark, tmp_path):
    """A file with more distinct values than _BLOOM_DIGEST_CAP ships
    a fixed-size bitset partial instead of an unbounded digest list —
    the driver-side payload is capped at 8 KB per (slice, file, col)
    no matter the batch size — and the merged bloom still has no
    false negatives."""
    from rakam_api_spark.txnlog import _BLOOM_DIGEST_CAP, _BLOOM_MAX_BITS

    n = _BLOOM_DIGEST_CAP + 200
    df = spark.range(n).selectExpr(
        "id as x", "concat('user-', id) as uid", "'2024-01' as _month"
    ).coalesce(1)
    t = TxnTable(spark, str(tmp_path / "t"), bloom_cols=["uid"])
    t.append(df, partition_col="_month")
    ents = list(t.state().values())
    assert len(ents) == 1
    bloom = ents[0]["blooms"]["uid"]
    assert bloom["m"] == _BLOOM_MAX_BITS  # saturated sizing, 8 KB bitset
    for i in range(0, n, 997):
        assert t.live_files(equals={"uid": f"user-{i}"}), i


def test_rebloom_heterogeneous_schemas_falls_back_per_file(spark, tmp_path):
    """Legacy files whose bloomed column has CONFLICTING types (long
    in one file, string in another — predating the write-time schema
    gate) break the batch mergeSchema read; the executor-side build
    falls back to per-file Spark reads and still blooms both.  The
    canonical key makes int 42 and string '42' hash identically, so
    probes of either type hit."""
    import os

    path = str(tmp_path / "t")
    os.makedirs(path)
    spark.createDataFrame([(42, "2024-01")], "uid long, _month string").coalesce(
        1
    ).write.parquet(str(tmp_path / "a"))
    spark.createDataFrame(
        [("zz-7", "2024-01")], "uid string, _month string"
    ).coalesce(1).write.parquet(str(tmp_path / "b"))
    rels = []
    for src in ("a", "b"):
        for f in os.listdir(str(tmp_path / src)):
            if f.endswith(".parquet"):
                rel = f"{src}-{f}"
                os.rename(str(tmp_path / src / f), os.path.join(path, rel))
                rels.append(rel)
    logonly = TxnTable(None, path)  # sparkless writer registers them
    logonly.append_files(sorted(rels))
    t = TxnTable(spark, path, bloom_cols=["uid"])
    assert t.rebloom() == 2
    ents = {e["path"]: e for e in t.state().values()}
    assert all("uid" in e["blooms"] for e in ents.values())
    for probe in (42, "42"):
        hit = t.live_files(equals={"uid": probe})
        assert any("a-" in f for f in hit), (probe, hit)
    assert any("b-" in f for f in t.live_files(equals={"uid": "zz-7"}))


def test_bloom_col_absent_from_files_is_conservative(spark, tmp_path):
    """A bloom column that never appears in the data files (e.g. a
    hive PARTITION column, or a column of a different collection)
    yields no bloom entries — every probe keeps every file, never an
    error, and partition pruning still works through `partitions=`."""
    t = TxnTable(spark, str(tmp_path / "t"), bloom_cols=["_month", "ghost"])
    t.append(_rows(spark, range(0, 30)), partition_col="_month")
    ents = list(t.state().values())
    # partition/ghost columns are not in the parquet files: no blooms
    assert all("blooms" not in e or not e["blooms"] for e in ents)
    assert t.live_files(equals={"_month": "2024-01"}) == sorted(
        e["path"] for e in ents
    )
    assert t.read(files=t.live_files(equals={"ghost": "x"})).count() == 30


def test_large_nullable_int_keys_are_exact(spark, tmp_path):
    """ADVICE r11 #2: an int64 column containing a NULL used to reach
    the mapInPandas bloom builder as pandas float64, rounding values
    above 2^53 BEFORE hashing — an exact-integer probe then got a
    false NEGATIVE and the file was silently skipped.  Integral
    columns are now cast to string JVM-side (exact decimal text,
    identical canonical key), so the probe hits; the sparkless
    pyarrow builder agrees on the same file."""
    from rakam_api_spark.txnlog import _file_blooms, _bloom_might_contain

    big = (1 << 53) + 1  # 9007199254740993: not representable as f64
    df = spark.createDataFrame(
        [(big, "2024-01"), (None, "2024-01"), (7, "2024-01")],
        "x long, _month string",
    ).coalesce(1)
    t = TxnTable(spark, str(tmp_path / "t"), bloom_cols=["x"])
    t.append(df, partition_col="_month")
    ents = list(t.state().values())
    assert len(ents) == 1 and "x" in ents[0]["blooms"]
    # executor-built bloom: the exact integer must hit
    assert t.live_files(equals={"x": big}), "false negative on 2^53+1"
    assert t.live_files(equals={"x": 7})
    # and the sparkless builder produces an agreeing bloom for the file
    fpath = t._abs(ents[0]["path"])
    sparkless = _file_blooms(fpath, ["x"])
    assert sparkless and _bloom_might_contain(sparkless["x"], big)


def test_unversioned_bloom_probes_true_and_rebloom_heals(spark, tmp_path):
    """ADVICE r11 #5: a persisted bloom whose format stamp doesn't
    match the probing code (canonicalization may have changed) can
    never be trusted to prune — it degrades to probe-always-true —
    and rebloom treats it as stale and rebuilds it with the current
    stamp, restoring pruning."""
    from rakam_api_spark.txnlog import _BLOOM_FMT, _bloom_build, _bloom_might_contain

    t = TxnTable(spark, str(tmp_path / "t"), bloom_cols=["uid"])
    t.append(_rows(spark, range(4)).coalesce(1), partition_col="_month")
    t.append(_rows(spark, range(100, 104)).coalesce(1), partition_col="_month")
    # pick a multi-row entry and a probe INSIDE its min/max stat
    # range but absent from the data, so only the bloom decides
    ent = dict(
        next(
            e
            for e in t.state().values()
            if e["stats"]["uid"][0] != e["stats"]["uid"][1]
        )
    )
    probe = ent["stats"]["uid"][0] + "0"  # lo < probe < hi, never stored
    assert ent["stats"]["uid"][0] < probe < ent["stats"]["uid"][1]
    assert ent["path"] not in t.live_files(equals={"uid": probe})  # fresh bloom prunes

    # unversioned bloom dict (pre-versioning manifest shape)
    legacy = _bloom_build(["user-1"])
    legacy.pop("v")
    assert _bloom_might_contain(legacy, "anything-at-all")  # degrade to keep

    # doctor the entry's bloom to the unversioned shape via the
    # same remove+add metadata commit rebloom itself uses
    ent["blooms"] = {"uid": legacy}
    t.commit(add=[ent], remove=[ent["path"]], op="test_downgrade")
    # the doctored file is now unprunable (kept for every probe) ...
    assert ent["path"] in t.live_files(equals={"uid": probe})
    # ... until rebloom detects the stale stamp and rebuilds it
    assert t.rebloom() == 1
    blooms = {e["path"]: e["blooms"]["uid"] for e in t.state().values()}
    assert all(b.get("v") == _BLOOM_FMT for b in blooms.values())
    assert ent["path"] not in t.live_files(equals={"uid": probe})


def test_rebloom_chunks_driver_fanin(spark, tmp_path, monkeypatch):
    """VERDICT r11 What's wrong #3: rebloom drives its executor bloom
    jobs in file chunks so a huge heal never funnels every bitset
    through one collect.  Crossing a chunk boundary must change
    nothing about the resulting manifests."""
    from rakam_api_spark import txnlog

    path = str(tmp_path / "t")
    legacy = TxnTable(spark, path)  # no blooms
    for k in range(5):
        legacy.append(_rows(spark, range(10 * k, 10 * k + 3)), partition_col="_month")
    t = TxnTable(spark, path, bloom_cols=["uid"])
    calls = []
    real = txnlog._blooms_via_spark

    def counting(sparksess, paths, cols):
        calls.append(len(paths))
        return real(sparksess, paths, cols)

    monkeypatch.setattr(txnlog, "_blooms_via_spark", counting)
    monkeypatch.setattr(TxnTable, "REBLOOM_CHUNK_FILES", 2)
    n_files = len(t.state())
    assert t.rebloom() == n_files
    assert len(calls) > 1 and all(c <= 2 for c in calls)  # chunked
    assert sum(calls) == n_files
    for k in range(5):
        assert t.live_files(equals={"uid": f"user-{10 * k}"})
    assert not t.live_files(equals={"uid": "user-777"})


def test_ranges_incomparable_bounds_keep_files(spark, tmp_path):
    """ADVICE r11 #4: numeric range bounds against STRING min/max
    stats (the SQL pass can produce them through implicit casts) must
    keep the file — same conservative fallback as the equals path —
    never raise TypeError out of live_files."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_rows(spark, range(5)), partition_col="_month")
    all_files = t.live_files()
    assert t.live_files(ranges={"uid": (5, None)}) == all_files
    assert t.live_files(ranges={"uid": (None, 5)}) == all_files
    # comparable bounds still prune on stats
    assert t.live_files(ranges={"x": (100, None)}) == []
