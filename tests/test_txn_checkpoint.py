"""Txn-log checkpointing + vacuum retention (VERDICT r7 Next #1/#2/#8).

Pins the three scale contracts the round-7 review demanded of the
transaction layer:

- snapshot resolution is O(checkpoint_every) metadata opens however
  long the log grows (200 streaming-epoch commits → state() opens
  ≤ 11 files, not 200);
- a reader that resolved its snapshot just before a compaction can
  still lazily open its files after compact+vacuum (retain_versions=1
  default; age horizon for long scans);
- a snapshot can be exported as a plain manifest that a NON-Spark
  engine (DuckDB) reads with full snapshot consistency.
"""

import json
import os
import time

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rakam_api_spark.txnlog import TxnTable


def _rows(spark, lo, hi, month="2024-01"):
    return spark.createDataFrame(
        [(i, month) for i in range(lo, hi)], "x long, _month string"
    )


def _xs(df):
    return sorted(r["x"] for r in df.select("x").collect())


# --- checkpoint mechanics (sparkless: metadata plane only) ---------------


def test_state_opens_bounded_after_200_commits(tmp_path):
    """The r7 metadata-path scale killer: 200 commits (one per
    streaming epoch) must NOT mean 200 file opens per snapshot
    resolution — the checkpoint bounds it at checkpoint_every + 1."""
    t = TxnTable(None, str(tmp_path / "t"))
    for i in range(200):
        t.commit(add=[{"path": f"f{i:04d}.parquet", "rows": 1, "partition": None}])
    state = t.state()
    assert len(state) == 200
    assert t.last_state_file_opens <= t.checkpoint_every + 1
    # checkpointed resolution ≡ full replay, at any version
    assert state == t.state(use_checkpoints=False)
    assert t.state(137) == t.state(137, use_checkpoints=False)
    # full replay really did pay O(V): the bound is load-bearing
    t.state(use_checkpoints=False)
    assert t.last_state_file_opens == 200


def test_checkpoint_collision_and_prune(tmp_path):
    """A racing committer that already published the same-version
    checkpoint is benign (identical contents by construction); tmp
    files never linger; old checkpoints are pruned but time travel
    past them still answers via full replay."""
    t = TxnTable(None, str(tmp_path / "t"), checkpoint_every=2)
    t.commit(add=[{"path": "a.parquet", "rows": 1, "partition": None}])
    # pre-stage the checkpoint the next commit will also try to write
    # (a real racer writes identical content — the state at a fixed
    # version is immutable); the committer must hit FileExistsError,
    # skip, and clean its temp file
    rigged = {
        "version": 2,
        "live": [
            {"path": "a.parquet", "rows": 1, "partition": None},
            {"path": "b.parquet", "rows": 1, "partition": None},
        ],
    }
    with open(t._ckpt_path(2), "w") as f:
        json.dump(rigged, f)
    t.commit(add=[{"path": "b.parquet", "rows": 1, "partition": None}])  # collision
    assert set(t.state()) == {"a.parquet", "b.parquet"}
    for i in range(12):
        t.commit(add=[{"path": f"c{i}.parquet", "rows": 1, "partition": None}])
    assert set(t.state()) == set(t.state(use_checkpoints=False))
    # pruning: at most CHECKPOINTS_RETAINED checkpoint files remain
    assert len(t._checkpoint_versions()) <= t.CHECKPOINTS_RETAINED
    # no torn/tmp checkpoint debris
    assert not [f for f in os.listdir(t._txn) if ".tmp." in f]
    # time travel to a version older than every retained checkpoint
    assert set(t.state(1)) == {"a.parquet"}


def test_corrupt_checkpoint_degrades_to_full_replay(tmp_path):
    t = TxnTable(None, str(tmp_path / "t"), checkpoint_every=5)
    for i in range(10):
        t.commit(add=[{"path": f"f{i}.parquet", "rows": 1, "partition": None}])
    ckpts = t._checkpoint_versions()
    assert ckpts, "expected at least one checkpoint"
    with open(t._ckpt_path(ckpts[-1]), "w") as f:
        f.write("{torn")
    assert len(t.state()) == 10  # safe fallback, correct answer


# --- vacuum retention (VERDICT r7 What's-wrong #1) -----------------------


def test_reader_snapshot_survives_compact_and_vacuum(spark, tmp_path):
    """The exact race the r7 verdict flagged: a reader resolves its
    snapshot at version V, a compaction lands at V+1 and vacuums —
    Spark opens files lazily per task, so the reader's DEFERRED
    collect must still find V's files.  retain_versions=1 (the new
    default) keeps them."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_rows(spark, 0, 50), partition_col="_month")
    t.append(_rows(spark, 50, 100), partition_col="_month")
    reader = t.read()  # lazy: plan resolved, files not yet opened
    t.compact(partition_col="_month")
    t.vacuum()  # default retain_versions=1 — retains the reader's files
    assert _xs(reader) == list(range(100))  # deferred scan succeeds
    # zero retention (the old store.compact behavior) WOULD have
    # deleted them — pin that the files only die past the horizon
    t.vacuum(retain_versions=0)
    live = {t._abs(f) for f in t.live_files()}
    on_disk = {
        os.path.join(dp, f)
        for dp, _, fs in os.walk(str(tmp_path / "t"))
        for f in fs
        if f.endswith(".parquet")
    }
    assert on_disk == live


def test_vacuum_age_horizon_spares_recent_retirees(tmp_path):
    """min_age_seconds: a just-retired file survives vacuum until the
    RETIRING COMMIT is old enough — the long-running-scan guard that
    works regardless of how many versions land meanwhile."""
    t = TxnTable(None, str(tmp_path / "t"))
    pq.write_table(pa.table({"x": [1]}), str(tmp_path / "t" / "a.parquet"))
    t.append_files(["a.parquet"])
    pq.write_table(pa.table({"x": [2]}), str(tmp_path / "t" / "b.parquet"))
    t.commit(
        add=[{"path": "b.parquet", "rows": 1, "partition": None}],
        remove=["a.parquet"],
        op="compact",
    )
    for i in range(3):  # push the retirement beyond any version horizon
        pq.write_table(pa.table({"x": [i]}), str(tmp_path / "t" / f"c{i}.parquet"))
        t.append_files([f"c{i}.parquet"])
    assert t.vacuum(retain_versions=0, min_age_seconds=3600) == []
    assert os.path.exists(str(tmp_path / "t" / "a.parquet"))
    # age the retiring commit (v2) past the horizon and it goes
    old = time.time() - 7200
    os.utime(t._commit_path(2), (old, old))
    assert t.vacuum(retain_versions=0, min_age_seconds=3600) == ["a.parquet"]


def test_vacuum_age_horizon_spares_fresh_orphans(tmp_path):
    """An orphan inside the append stage→commit window must not be
    reaped by a concurrent vacuum running with an age horizon."""
    t = TxnTable(None, str(tmp_path / "t"))
    pq.write_table(pa.table({"x": [1]}), str(tmp_path / "t" / "live.parquet"))
    t.append_files(["live.parquet"])
    # simulate mid-append: file placed in the tree, commit not yet landed
    pq.write_table(pa.table({"x": [2]}), str(tmp_path / "t" / "inflight.parquet"))
    assert t.vacuum(min_age_seconds=3600) == []
    old = time.time() - 7200
    os.utime(str(tmp_path / "t" / "inflight.parquet"), (old, old))
    assert t.vacuum(min_age_seconds=3600) == ["inflight.parquet"]  # true debris


# --- external-engine manifest export (VERDICT r7 Next #8) ----------------


def test_export_manifest_duckdb_roundtrip(spark, tmp_path):
    """A non-Spark engine reads a CONSISTENT snapshot from the
    exported manifest: later appends and compactions don't leak into
    it, and the retention horizon keeps its files on disk."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_rows(spark, 0, 60), partition_col="_month")
    out = str(tmp_path / "snapshot.json")
    m = t.export_manifest(out_path=out)
    assert m["version"] == 1 and len(m["files"]) >= 1
    # mutate the table AFTER the export
    t.append(_rows(spark, 60, 80), partition_col="_month")
    t.compact(partition_col="_month")
    t.vacuum()  # retain_versions=1 keeps the exported snapshot's files
    with open(out) as f:
        manifest = json.load(f)
    con = duckdb.connect()
    got = con.execute(
        "SELECT COUNT(*) n, MIN(x) lo, MAX(x) hi FROM read_parquet(?)",
        [manifest["files"]],
    ).fetchone()
    con.close()
    assert got == (60, 0, 59)  # the v1 snapshot, not the live table
    # entries carry partition + rows so planners can prune w/o opening
    assert sum(e["rows"] for e in manifest["entries"]) == 60
    assert all(e["partition"]["_month"] == "2024-01" for e in manifest["entries"])


def test_epoch_rate_spark_appends_stay_bounded(spark, tmp_path):
    """The streaming shape of the opens-bound contract: one Spark
    append per micro-batch epoch (exactly what store.write_batch
    issues for a txn collection per trigger) for 30 epochs — snapshot
    resolution must stay ≤ checkpoint_every + 1 metadata opens and
    keep answering correctly, with checkpoints landing as a side
    effect of the ordinary commit path."""
    t = TxnTable(spark, str(tmp_path / "t"))
    for epoch in range(30):
        t.append(_rows(spark, epoch * 2, epoch * 2 + 2), partition_col="_month")
    assert t.version() == 30
    assert t._checkpoint_versions(), "commit path never checkpointed"
    assert sum(e["rows"] for e in t.state().values()) == 60
    assert t.last_state_file_opens <= t.checkpoint_every + 1
    assert _xs(t.read()) == list(range(60))


# --- transaction identifiers (Delta appId/version pattern) ---------------


def _add(name):
    return [{"path": f"{name}.parquet", "rows": 1, "partition": None}]


def test_app_version_commits_are_idempotent(tmp_path):
    t = TxnTable(None, str(tmp_path / "t"), checkpoint_every=3)
    assert t.commit(add=_add("a"), app="s:c", app_version=0) == 1
    # same epoch replayed: no commit, no version burn
    assert t.commit(add=_add("dup"), app="s:c", app_version=0) is None
    assert t.version() == 1
    assert t.commit(add=_add("b"), app="s:c", app_version=1) == 2
    # an OLDER epoch after later ones is equally inert
    assert t.commit(add=_add("old"), app="s:c", app_version=0) is None
    # independent apps don't interfere
    assert t.commit(add=_add("x"), app="s2:c", app_version=0) == 3
    assert t.app_versions() == {"s:c": 1, "s2:c": 0}
    # app without version is a caller bug
    with pytest.raises(ValueError):
        t.commit(add=_add("y"), app="s:c")


def test_app_versions_survive_checkpoint_resolution(tmp_path):
    """The high-water marks must ride the checkpoint: a bounded
    state() resolution (checkpoint + tail) answers the same marks as
    a full replay, and a FRESH TxnTable instance (new process) sees
    them too."""
    t = TxnTable(None, str(tmp_path / "t"), checkpoint_every=3)
    for v in range(5):
        assert t.commit(add=_add(f"e{v}"), app="stream:c", app_version=v) == v + 1
    for i in range(8):  # push several checkpoint boundaries
        t.commit(add=_add(f"f{i}"))
    assert t.app_versions() == {"stream:c": 4}
    assert t.app_versions(use_checkpoints=False) == {"stream:c": 4}
    t.app_versions()  # checkpoint-resolved: bounded metadata opens
    assert t.last_state_file_opens <= t.checkpoint_every + 1
    t2 = TxnTable(None, str(tmp_path / "t"), checkpoint_every=3)
    assert t2.app_versions() == {"stream:c": 4}
    assert t2.commit(add=_add("dup"), app="stream:c", app_version=3) is None


# --- Z-order compaction (multi-column data skipping) ---------------------


def test_zorder_compaction_skips_on_both_columns(spark, tmp_path):
    """OPTIMIZE ZORDER BY semantics: after a Morton-interleaved
    rewrite, range reads skip files on EITHER clustered column; a
    linear sort only ever skips on its one column (every file spans
    the other's full range)."""
    from rakam_api_spark.txnlog import TxnTable as _T

    t = _T(spark, str(tmp_path / "t"))
    grid = spark.createDataFrame(
        [(a, b) for a in range(64) for b in range(64)], "a long, b long"
    )
    t.append(grid)
    t.compact(zorder_by=["a", "b"], max_records_per_file=256)
    files = t.live_files()
    assert len(files) >= 8
    fa = t.live_files(ranges={"a": (0, 7)})
    fb = t.live_files(ranges={"b": (0, 7)})
    assert len(fa) <= len(files) // 2, (len(fa), len(files))
    assert len(fb) <= len(files) // 2, (len(fb), len(files))
    assert t.read().count() == 64 * 64  # clustering never loses rows

    # the linear-sort counterfactual: b-ranges cannot skip anything
    t.compact(sort_by="a", max_records_per_file=256)
    lin_files = t.live_files()
    assert len(t.live_files(ranges={"a": (0, 7)})) < len(lin_files)
    assert len(t.live_files(ranges={"b": (0, 7)})) == len(lin_files)

    with pytest.raises(ValueError):
        t.compact(sort_by="a", zorder_by=["a", "b"])


# --- vacuum metadata bound (VERDICT r8 Next #6 / What's-wrong #4) --------


def test_vacuum_opens_bounded_after_200_commits(tmp_path):
    """vacuum used to rebuild its retired-at map via history() —
    O(total commits) file opens per maintenance pass.  With the
    persisted high-water mark each pass replays only commits since
    the previous pass, plus the checkpoint-bounded state()
    resolutions for the retention window."""
    t = TxnTable(None, str(tmp_path / "t"))
    root = str(tmp_path / "t")
    for i in range(200):
        pq.write_table(pa.table({"x": [i]}), os.path.join(root, f"f{i:04d}.parquet"))
        remove = [f"f{i - 1:04d}.parquet"] if i else []
        t.commit(
            add=[{"path": f"f{i:04d}.parquet", "rows": 1, "partition": None}],
            remove=remove,
        )
        if i % 20 == 19:
            t.vacuum(retain_versions=1)
    # the final pass saw at most the 20 commits since the previous
    # vacuum + (retain+1) checkpoint-bounded snapshot resolutions
    bound = 20 + 2 * (t.checkpoint_every + 1) + 1
    assert t.last_vacuum_file_opens <= bound, t.last_vacuum_file_opens
    # and the table is exactly its live set on disk
    on_disk = {f for f in os.listdir(root) if f.endswith(".parquet")}
    live = set(t.live_files())
    assert live <= on_disk
    # everything beyond the 1-version retention was reclaimed
    assert len(on_disk - live) <= 2


def test_vacuum_pending_tombstone_carries_age_guard(tmp_path):
    """A removal seen by one vacuum pass but spared by the age
    horizon must stay correctly dated by its RETIRING COMMIT in later
    passes (which no longer rescan that commit): the carried
    tombstone, not the file's own mtime, drives the horizon."""
    t = TxnTable(None, str(tmp_path / "t"))
    root = str(tmp_path / "t")
    pq.write_table(pa.table({"x": [1]}), os.path.join(root, "a.parquet"))
    t.append_files(["a.parquet"])
    pq.write_table(pa.table({"x": [2]}), os.path.join(root, "b.parquet"))
    t.commit(
        add=[{"path": "b.parquet", "rows": 1, "partition": None}],
        remove=["a.parquet"],
        op="compact",
    )
    # backdate the DATA file far past any horizon: if a later pass
    # misclassified a.parquet as an orphan it would delete it
    old = time.time() - 7200
    os.utime(os.path.join(root, "a.parquet"), (old, old))
    assert t.vacuum(retain_versions=0, min_age_seconds=3600) == []
    # second pass scans zero new commits (hwm advanced) yet must
    # still know a.parquet's retirement version from the tombstone
    assert t.vacuum(retain_versions=0, min_age_seconds=3600) == []
    assert os.path.exists(os.path.join(root, "a.parquet"))
    # age the RETIRING commit past the horizon: now it goes
    os.utime(t._commit_path(2), (old, old))
    assert t.vacuum(retain_versions=0, min_age_seconds=3600) == ["a.parquet"]
    # tombstone is dropped once reclaimed — the pending map stays
    # bounded by the not-yet-reclaimable set
    _, pending = t._load_vacuum_hwm()
    assert "a.parquet" not in pending


def test_erasure_vacuum_prompt_retire_but_orphan_guard(tmp_path):
    """The erasure shape: retain_versions=0 + orphan_min_age —
    retired files (the erased rows) delete PROMPTLY while a
    concurrent append's published-but-uncommitted file survives."""
    t = TxnTable(None, str(tmp_path / "t"))
    root = str(tmp_path / "t")
    pq.write_table(pa.table({"x": [1]}), os.path.join(root, "pre.parquet"))
    t.append_files(["pre.parquet"])
    pq.write_table(pa.table({"x": [2]}), os.path.join(root, "post.parquet"))
    t.commit(
        add=[{"path": "post.parquet", "rows": 1, "partition": None}],
        remove=["pre.parquet"],
        op="erase",
    )
    # mid-append file: in the tree, commit not yet landed
    pq.write_table(pa.table({"x": [3]}), os.path.join(root, "inflight.parquet"))
    deleted = t.vacuum(retain_versions=0, orphan_min_age_seconds=3600)
    assert deleted == ["pre.parquet"], deleted  # prompt erasure
    assert os.path.exists(os.path.join(root, "inflight.parquet"))  # guarded


def test_rank_zorder_survives_skew_where_uniform_collapses(spark, tmp_path):
    """The round-11 rank-quantization upgrade: on a column where 97%
    of rows share one value and a single huge outlier stretches the
    range, uniform min/max bucketing collapses every real value into
    ONE bucket (the z-key stops discriminating on that column
    entirely), while rank (quantile) bucketing still spreads the
    minority values over several buckets — the same interleave,
    skew-robust boundaries.  Plus an end-to-end check that a rank
    z-ordered rewrite stays lossless under skew."""
    import pyspark.sql.functions as F

    from rakam_api_spark.txnlog import TxnTable as _T

    n = 4096
    rows = spark.range(n).select(
        F.when(F.col("id") % 32 == 0, (F.col("id") / 32) % 127 + 1)
        .otherwise(0)
        .cast("long")
        .alias("a"),
        (F.col("id") % 64).alias("b"),
    ).union(
        spark.createDataFrame([(10**9, 0)], "a long, b long")
    )
    t = _T(spark, str(tmp_path / "t"))
    t.append(rows)

    def n_buckets(quantize):
        z = t._zorder_column(rows, ["a"], quantize=quantize)
        return (
            rows.where("a > 0 and a < 1000000")  # the minority values
            .select(z.alias("z"))
            .distinct()
            .count()
        )

    # uniform: the 10**9 outlier maps every real value to bucket 0
    assert n_buckets("uniform") == 1
    # rank: quantile boundaries keep the minority values apart
    assert n_buckets("rank") >= 4
    # end-to-end: a rank z-ordered rewrite loses nothing and range
    # reads on the skewed column stay exact
    t.compact(zorder_by=["a", "b"], max_records_per_file=256)
    hit = t.live_files(ranges={"a": (100, 127)})
    assert t.read(files=hit).where("a between 100 and 127").count() == (
        rows.where("a between 100 and 127").count()
    )
    assert t.read().count() == n + 1
