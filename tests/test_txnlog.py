"""TxnTable: the cross-process atomic commit protocol.  Pins the
lakehouse contracts — snapshot reads from the log (never the
directory), manifest partition pruning, optimistic-concurrency
rewrites, crash-orphan invisibility, and (with live processes) no
lost appends under concurrent commits."""

import json
import os
import subprocess
import sys

import pytest

from rakam_api_spark.txnlog import CommitConflict, TxnTable


def _rows(spark, lo, hi, month="2024-01"):
    return spark.createDataFrame(
        [(i, month) for i in range(lo, hi)], "x long, _month string"
    )


def _xs(df):
    return sorted(r["x"] for r in df.select("x").collect())


def test_append_read_version_history(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    assert t.version() == 0
    v1 = t.append(_rows(spark, 0, 10), partition_col="_month")
    v2 = t.append(_rows(spark, 10, 15, month="2024-02"), partition_col="_month")
    assert (v1, v2) == (1, 2)
    assert _xs(t.read()) == list(range(15))
    hist = t.history()
    assert [h["op"] for h in hist] == ["append", "append"]
    # per-file row counts recorded in the manifest (stats without scans)
    assert sum(e["rows"] for h in hist for e in h["add"]) == 15
    # time travel: version 1 predates the second batch
    assert _xs(t.read(version=1)) == list(range(10))


def test_manifest_partition_pruning_never_lists_other_months(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_rows(spark, 0, 8, month="2024-01"), partition_col="_month")
    t.append(_rows(spark, 8, 12, month="2024-02"), partition_col="_month")
    pruned = t.live_files(partitions={"_month": ["2024-02"]})
    assert pruned and all("_month=2024-02" in f for f in pruned)
    df = t.read(partitions={"_month": ["2024-02"]})
    assert _xs(df) == list(range(8, 12))
    # the partition column is reconstructed from the hive layout
    assert set(r["_month"] for r in df.select("_month").collect()) == {"2024-02"}


def test_compact_retires_snapshot_keeps_rows_and_time_travel(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    for i in range(4):
        t.append(_rows(spark, i * 5, i * 5 + 5), partition_col="_month")
    before_files = t.live_files()
    assert len(before_files) >= 4
    t.compact(partition_col="_month")
    assert len(t.live_files()) < len(before_files)
    assert _xs(t.read()) == list(range(20))
    # pre-compaction snapshot still readable (files retired, not deleted)
    assert _xs(t.read(version=4)) == list(range(20))
    assert t.live_files(version=4) == before_files
    # vacuum beyond the horizon removes the retired files; current reads fine
    deleted = t.vacuum(retain_versions=0)
    assert set(deleted) == set(before_files)
    assert _xs(t.read()) == list(range(20))


def test_expire_partition_is_metadata_only(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_rows(spark, 0, 6, month="2023-12"), partition_col="_month")
    t.append(_rows(spark, 6, 9, month="2024-01"), partition_col="_month")
    t.remove_partition("_month", "2023-12")
    assert _xs(t.read()) == [6, 7, 8]
    assert t.history()[-1]["op"] == "expire"
    # data files untouched until vacuum (time travel still works)
    assert _xs(t.read(version=2)) == list(range(9))


def test_crash_orphans_are_invisible_and_vacuumed(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_rows(spark, 0, 5), partition_col="_month")
    # simulate a crash AFTER data-file placement, BEFORE commit: a
    # parquet file inside the table tree that no commit registers
    orphan_dir = str(tmp_path / "t" / "_month=2024-01")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"x": [99]}), os.path.join(orphan_dir, "deadbeef-orphan.parquet"))
    assert _xs(t.read()) == list(range(5))  # reader never sees it
    deleted = t.vacuum()
    assert deleted == ["_month=2024-01/deadbeef-orphan.parquet"]
    assert _xs(t.read()) == list(range(5))


def test_rewrite_conflict_detected_and_compact_retries(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_rows(spark, 0, 5), partition_col="_month")
    snapshot = t.live_files()
    # a competing rewrite retires the snapshot first
    t.commit(
        add=[],
        remove=snapshot,
        op="expire",
    )
    with pytest.raises(CommitConflict, match="no longer live"):
        t.commit(add=[], remove=snapshot, op="compact")
    # compact() itself recovers: fresh appends land, snapshot changed
    t.append(_rows(spark, 5, 9), partition_col="_month")
    t.compact(partition_col="_month")
    assert _xs(t.read()) == [5, 6, 7, 8]


def test_mid_compact_append_survives(spark, tmp_path):
    """An append that lands BETWEEN a compaction's snapshot and its
    commit stays live — the remove set only names the snapshot's
    files, so the directory-swap lost-update of the plain layout
    cannot happen here."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_rows(spark, 0, 5), partition_col="_month")
    snap_version = t.version()
    snapshot = t.live_files(snap_version)
    # compaction staged from the snapshot... meanwhile an append lands
    t.append(_rows(spark, 5, 8), partition_col="_month")
    # ...and the compaction commit (old snapshot's remove set) succeeds
    df = t.read(version=snap_version)
    tag = "aaaaaaaaaaaa"
    staging = os.path.join(str(tmp_path / "t"), "_staging", tag)
    # rewrite preserves the hive layout (compact()'s contract)
    df.coalesce(1).write.mode("overwrite").partitionBy("_month").parquet(staging)
    add = t._publish_staging(tag)
    t.commit(add=add, remove=snapshot, op="compact")
    assert _xs(t.read()) == list(range(8))  # nothing lost


_WRITER_SRC = """
import os, sys, json
sys.path.insert(0, "/root/repo")
import pyarrow as pa
import pyarrow.parquet as pq
from rakam_api_spark.txnlog import TxnTable

path, wid, n_batches = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
t = TxnTable(None, path)
go = os.path.join(path, "_go")
import time
while not os.path.exists(go):
    time.sleep(0.005)
for b in range(n_batches):
    lo = wid * 1000 + b * 10
    fname = f"w{wid}b{b}.parquet"
    pq.write_table(pa.table({"x": list(range(lo, lo + 10))}), os.path.join(path, fname))
    v = t.append_files([fname])
print("DONE", wid)
"""


def test_concurrent_live_writers_lose_no_appends(spark, tmp_path):
    """4 live processes × 5 append commits each, racing the O_EXCL
    version arbiter: all 20 commits land under strictly consecutive
    versions and every row is readable — the lost-update guarantee
    mode-append directories cannot give across processes."""
    import time

    path = str(tmp_path / "t")
    TxnTable(None, path)  # create the log dir
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WRITER_SRC, path, str(w), "5"],
            stdout=subprocess.PIPE,
            text=True,
        )
        for w in range(4)
    ]
    time.sleep(0.3)
    open(os.path.join(path, "_go"), "w").write("go")
    for p in procs:
        out, _ = p.communicate(timeout=120)
        assert "DONE" in out and p.returncode == 0
    os.unlink(os.path.join(path, "_go"))

    t = TxnTable(spark, path)
    assert t.version() == 20
    hist = t.history()
    assert [h["version"] for h in hist] == list(range(1, 21))
    writers = {h["writer"] for h in hist}
    assert len(writers) == 4  # every process committed
    want = sorted(
        x for w in range(4) for b in range(5) for x in range(w * 1000 + b * 10, w * 1000 + b * 10 + 10)
    )
    assert _xs(t.read()) == want


def test_commit_log_is_json_per_version(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_rows(spark, 0, 3), partition_col="_month")
    p = os.path.join(str(tmp_path / "t"), "_txn", "v00000001.json")
    rec = json.load(open(p))
    assert rec["op"] == "append" and rec["add"]
    assert all(e["partition"] == {"_month": "2024-01"} for e in rec["add"])


def test_manifest_stats_enable_file_skipping(spark, tmp_path):
    """Per-file min/max stats land in the manifest at commit time
    (lifted from parquet footers, no extra scan) and range reads skip
    non-overlapping files without touching the filesystem."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(i,) for i in range(10)], "x long").coalesce(1))
    t.append(
        spark.createDataFrame([(i,) for i in range(100, 110)], "x long").coalesce(1)
    )
    hist = t.history()
    assert hist[0]["add"][0]["stats"]["x"] == [0, 9]
    assert hist[1]["add"][0]["stats"]["x"] == [100, 109]
    # skipping prunes to the overlapping file only
    assert len(t.live_files()) == 2
    assert len(t.live_files(ranges={"x": (100, None)})) == 1
    assert _xs(t.read(ranges={"x": (100, None)})) == list(range(100, 110))
    # a ranged column without stats keeps every file (skipping is safe)
    assert len(t.live_files(ranges={"zzz": (0, 1)})) == 2
    # one-sided bounds work
    assert len(t.live_files(ranges={"x": (None, 50)})) == 1


def test_sorted_compaction_tightens_ranges_for_skipping(spark, tmp_path):
    """compact(sort_by=...) clusters rows so the rewritten files carry
    non-overlapping stat ranges — a selective range read then opens a
    fraction of the files (the linear OPTIMIZE ZORDER analog)."""
    import random

    t = TxnTable(spark, str(tmp_path / "t"))
    xs = list(range(100))
    random.Random(7).shuffle(xs)
    # two interleaved single-file appends: every file's range spans
    # ~the whole domain, so nothing can skip
    t.append(spark.createDataFrame([(x,) for x in xs[:50]], "x long").coalesce(1))
    t.append(spark.createDataFrame([(x,) for x in xs[50:]], "x long").coalesce(1))
    assert len(t.live_files(ranges={"x": (0, 9)})) == 2  # nothing skippable
    t.compact(sort_by="x", max_records_per_file=25)
    files = t.live_files()
    assert len(files) == 4
    pruned = t.live_files(ranges={"x": (0, 9)})
    assert len(pruned) == 1  # 3 of 4 files skipped
    assert sorted(r["x"] for r in t.read(ranges={"x": (0, 9)}).where("x <= 9").collect()) == list(range(10))


def test_merge_targets_only_overlapping_files(spark, tmp_path):
    """MERGE rewrites exactly the files whose manifest key range
    overlaps the update batch; non-overlapping files survive
    untouched (same relative paths live before and after)."""
    t = TxnTable(spark, str(tmp_path / "t"))
    xs = list(range(100))
    t.append(spark.createDataFrame([(x, x * 10) for x in xs], "x long, v long").coalesce(1))
    t.compact(sort_by="x", max_records_per_file=25)  # 4 files, disjoint x ranges
    before = t.live_files()
    assert len(before) == 4

    updates = spark.createDataFrame([(10, -1), (12, -2), (200, -3)], "x long, v long")
    out = t.merge(updates, key="x")
    assert out["rows_updated"] == 2 and out["rows_inserted"] == 1
    assert out["files_rewritten"] == 1  # only the 0-24 file overlapped [10, 200]... 
    after = set(t.live_files())
    untouched = set(before) & after
    assert len(untouched) == 3  # three files never rewritten

    df = t.read()
    got = {r["x"]: r["v"] for r in df.collect()}
    assert got[10] == -1 and got[12] == -2 and got[200] == -3
    assert got[11] == 110 and got[50] == 500  # unmatched rows intact
    assert len(got) == 101
    assert t.history()[-1]["op"] == "merge"


def test_merge_on_partitioned_table(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_rows(spark, 0, 10), partition_col="_month")
    t.append(_rows(spark, 10, 15, month="2024-02"), partition_col="_month")
    updates = spark.createDataFrame(
        [(3, "2024-01"), (99, "2024-03")], "x long, _month string"
    )
    out = t.merge(updates, key="x", partition_col="_month")
    assert out["rows_updated"] == 1 and out["rows_inserted"] == 1
    assert _xs(t.read()) == sorted(set(range(15)) | {99})
    months = {r["_month"] for r in t.read().select("_month").collect()}
    assert months == {"2024-01", "2024-02", "2024-03"}


def test_read_incremental_append_only_feed(spark, tmp_path):
    """Checkpointed incremental consumption: each poll sees exactly
    the rows appended since the last checkpoint; compaction in the
    range is transparent (re-packaged rows are not re-delivered);
    a merge in the range forces a snapshot re-read."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_rows(spark, 0, 5), partition_col="_month")
    df, ckpt = t.read_incremental(0)
    assert _xs(df) == list(range(5))

    # nothing new: None frame, checkpoint unchanged
    df2, ckpt2 = t.read_incremental(ckpt)
    assert df2 is None and ckpt2 == ckpt

    # two appends + a compact in the range: only the NEW rows flow,
    # the compaction's re-packaged files are not re-delivered
    t.append(_rows(spark, 5, 8), partition_col="_month")
    t.compact(partition_col="_month")
    t.append(_rows(spark, 8, 10), partition_col="_month")
    df3, ckpt3 = t.read_incremental(ckpt)
    assert _xs(df3) == list(range(5, 10))

    # a merge breaks the append-only contract
    t.merge(
        spark.createDataFrame([(0, "2024-01")], "x long, _month string"),
        key="x",
        partition_col="_month",
    )
    with pytest.raises(ValueError, match="append-only"):
        t.read_incremental(ckpt3)


def test_schema_evolution_across_appends(spark, tmp_path):
    """A widened batch (ADD COLUMN) coexists with older files: reads
    merge schemas (old rows read NULL for the new column) and the
    incremental feed carries the widened schema too."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_rows(spark, 0, 3), partition_col="_month")
    wide = spark.createDataFrame(
        [(3, "2024-01", "mobile"), (4, "2024-01", "web")],
        "x long, _month string, channel string",
    )
    t.append(wide, partition_col="_month")
    df = t.read()
    assert set(df.columns) == {"x", "_month", "channel"}
    got = {r["x"]: r["channel"] for r in df.collect()}
    assert got == {0: None, 1: None, 2: None, 3: "mobile", 4: "web"}
    inc, _v = t.read_incremental(1)
    assert {r["x"] for r in inc.collect()} == {3, 4}
    assert [r["channel"] for r in inc.orderBy("x").collect()] == ["mobile", "web"]


def test_mid_merge_append_survives(spark, tmp_path):
    """An append landing between a merge's snapshot and its commit
    stays live — the merge's remove set names only its snapshot's
    candidate files."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_rows(spark, 0, 5), partition_col="_month")
    # stage the merge manually from the current snapshot
    snap = t.live_files()
    updates = spark.createDataFrame([(2, "2024-01")], "x long, _month string")
    existing = t.read()
    keep = existing.join(updates.select("x"), "x", "left_anti")
    merged = keep.select(*updates.columns).unionByName(updates)
    staging = os.path.join(str(tmp_path / "t"), "_staging", "bbbbbbbbbbbb")
    merged.coalesce(1).write.mode("overwrite").partitionBy("_month").parquet(staging)
    add = t._publish_staging("bbbbbbbbbbbb")
    # a concurrent append lands first...
    t.append(_rows(spark, 5, 7), partition_col="_month")
    # ...then the merge commit with the OLD snapshot's remove set
    t.commit(add=add, remove=snap, op="merge")
    assert _xs(t.read()) == list(range(7))  # nothing lost


def test_merge_retries_after_losing_to_compact(spark, tmp_path):
    """merge() loses its first commit race to a compaction that
    retired the snapshot, then succeeds from the fresh snapshot."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_rows(spark, 0, 6), partition_col="_month")

    real_commit = t.commit
    state = {"raced": False}

    def racing_commit(add=None, remove=None, op="append", **kw):
        if op == "merge" and not state["raced"]:
            state["raced"] = True
            # competing writer compacts between snapshot and commit
            real_compact()
        return real_commit(add=add, remove=remove, op=op, **kw)

    real_compact = lambda: TxnTable(spark, t.path).compact(partition_col="_month")  # noqa: E731
    t.commit = racing_commit
    out = t.merge(
        spark.createDataFrame([(0, "2024-01"), (60, "2024-01")], "x long, _month string"),
        key="x",
        partition_col="_month",
    )
    t.commit = real_commit
    assert state["raced"]
    assert out["rows_updated"] == 1 and out["rows_inserted"] == 1
    assert _xs(t.read()) == [0, 1, 2, 3, 4, 5, 60]
    assert t.history()[-1]["op"] == "merge"


def test_vacuum_dry_run_reports_without_deleting(spark, tmp_path):
    """vacuum(dry_run=True) returns exactly what a real pass would
    reclaim under the same horizons, deletes nothing, and leaves the
    high-water mark untouched — the audit step before a retention
    change."""
    import os as _os

    t = TxnTable(spark, str(tmp_path / "t"))
    df = spark.range(4).selectExpr("id AS x")
    t.append(df)
    t.compact()  # retires the original files
    # orphan: a parquet file no commit registered
    orphan = _os.path.join(t.path, "orphan-debris.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"x": [99]}), orphan)

    hwm_before = t._load_vacuum_hwm()
    preview = t.vacuum(retain_versions=0, dry_run=True)
    assert preview  # retired originals + the orphan
    assert all(_os.path.exists(t._abs(p)) for p in preview)
    assert t._load_vacuum_hwm() == hwm_before  # no state advanced

    real = t.vacuum(retain_versions=0)
    assert real == preview  # the preview was exact
    assert not any(_os.path.exists(t._abs(p)) for p in real)
    # table content untouched throughout
    assert sorted(r.x for r in t.read().collect()) == [0, 1, 2, 3]


def test_schema_enforcement_rejects_type_conflicts_at_append(spark, tmp_path):
    """Schema is tracked IN THE LOG and enforced at write time: an
    append that redefines an existing column's type is rejected
    BEFORE any file lands (the conflict used to surface only at read
    time, after the bad files were committed); additive new columns
    still evolve freely; table_schema() time-travels with the log and
    survives checkpoint-accelerated resolution."""
    from rakam_api_spark.txnlog import SchemaConflict

    t = TxnTable(spark, str(tmp_path / "t"), checkpoint_every=2)
    t.append(_rows(spark, 0, 5), partition_col="_month")
    v1 = t.version()
    assert ["x", "bigint"] in t.table_schema()
    # additive evolution: a new column widens the schema
    wider = spark.createDataFrame(
        [(100, "2024-02", "hello")], "x long, _month string, note string"
    )
    t.append(wider, partition_col="_month")
    assert ["note", "string"] in t.table_schema()
    # time travel: the pre-evolution snapshot keeps the old schema
    assert ["note", "string"] not in t.table_schema(version=v1)
    # type conflict: rejected with the column named, nothing committed
    bad = spark.createDataFrame([("7", "2024-03")], "x string, _month string")
    before = t.version()
    with pytest.raises(SchemaConflict, match="x: table has bigint"):
        t.append(bad, partition_col="_month")
    assert t.version() == before
    # merge runs the same gate
    with pytest.raises(SchemaConflict):
        t.merge(bad, key="x")
    # readable end-to-end after evolution (the gate's whole point)
    assert t.read().count() == 6
    # enforcement survives checkpoint-based resolution (schema rides
    # the checkpoint payload, not just the commit tail)
    for i in range(5):
        t.append(_rows(spark, 10 + i, 11 + i), partition_col="_month")
    assert t._checkpoint_versions()
    assert ["note", "string"] in t.table_schema()
    with pytest.raises(SchemaConflict):
        t.append(bad, partition_col="_month")


def test_read_incremental_skips_metadata_only_commits(spark, tmp_path):
    """ADVICE r10: rebloom / set_constraint / drop_constraint are
    content-preserving — an incremental consumer polling across one
    keeps its append-only feed (no ValueError, no duplicated rows),
    and months_changed_since reports no changed months for them."""
    path = str(tmp_path / "t")
    t = TxnTable(spark, path)
    t.append(_rows(spark, 1, 2), partition_col="_month")
    _df, ckpt = t.read_incremental(0)
    bloomed = TxnTable(spark, path, bloom_cols=["x"])
    assert bloomed.rebloom() > 0
    t.add_constraint("pos", "x > 0")
    t.drop_constraint("pos")
    # three metadata commits, zero new rows: the feed stays quiet
    inc, ckpt2 = t.read_incremental(ckpt)
    assert inc is None and ckpt2 == t.version()
    changed, needs_full = t.months_changed_since(ckpt)
    assert changed == {} and needs_full is False
    # rows appended AFTER the metadata commits flow exactly once
    t.append(_rows(spark, 2, 3, month="2024-02"), partition_col="_month")
    inc, _ = t.read_incremental(ckpt2)
    assert [r["x"] for r in inc.collect()] == [2]


def test_replace_replay_skips_spark_write_and_stages_no_orphans(spark, tmp_path):
    """An already-applied (app, version) replace must return None
    BEFORE staging: the replay pays no Spark write and leaves no
    published-but-unreferenced orphan files (ADVICE r16 — append()
    already had this early check; replace() now mirrors it)."""
    path = str(tmp_path / "t")
    t = TxnTable(spark, path)
    t.append(_rows(spark, 0, 5), partition_col="_month")
    v = t.replace(_rows(spark, 10, 15), partition_col="_month", app="mv", app_version=7)
    assert v is not None and _xs(t.read()) == list(range(10, 15))
    files_before = {
        os.path.join(r, f) for r, _, fs in os.walk(path) for f in fs
    }
    # replay at the same (and an older) app_version: no-op, no new files
    assert (
        t.replace(_rows(spark, 20, 25), partition_col="_month", app="mv", app_version=7)
        is None
    )
    assert (
        t.replace(_rows(spark, 20, 25), partition_col="_month", app="mv", app_version=3)
        is None
    )
    files_after = {
        os.path.join(r, f) for r, _, fs in os.walk(path) for f in fs
    }
    assert files_after == files_before
    assert _xs(t.read()) == list(range(10, 15))
