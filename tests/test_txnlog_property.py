"""Model-based property test for the TxnTable commit protocol: a
random sequence of log-level operations (append / partition expiry /
vacuum) must keep the manifest in lockstep with a trivial in-memory
model — live-file sets match, DuckDB reads of the live files return
exactly the model's rows, vacuumed state never loses live data, and a
stale remove always conflicts.  Sparkless (pyarrow writes + DuckDB
reads) so hypothesis can run whole sequences in milliseconds; the
Spark data plane is covered by tests/test_txnlog.py."""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rakam_api_spark.txnlog import CommitConflict, TxnTable

# an op is ("append", partition 0-2, batch size 1-5),
#          ("expire", partition 0-2) or ("vacuum", retain 0-2)
_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 2), st.integers(1, 5)),
        st.tuples(st.just("expire"), st.integers(0, 2)),
        st.tuples(st.just("vacuum"), st.integers(0, 2)),
    ),
    min_size=1,
    max_size=12,
)


def _read_rows(t: TxnTable) -> list[int]:
    files = [t._abs(f) for f in t.live_files()]
    if not files:
        return []
    con = duckdb.connect()
    rows = con.execute(
        "SELECT x FROM read_parquet(?) ORDER BY x", [files]
    ).fetchall()
    con.close()
    return [r[0] for r in rows]


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(ops=_OPS)
def test_log_replay_matches_model(tmp_path_factory, ops):
    root = tmp_path_factory.mktemp("txn")
    # checkpoint_every=3 so a 12-op sequence crosses several checkpoint
    # boundaries AND the retained-checkpoint pruning path
    t = TxnTable(None, str(root), checkpoint_every=3)
    model: dict[str, list[int]] = {}  # rel path -> rows
    next_x = 0
    for i, op in enumerate(ops):
        if op[0] == "append":
            _, p, n = op
            part_dir = os.path.join(str(root), f"p={p}")
            os.makedirs(part_dir, exist_ok=True)
            rel = f"p={p}/b{i}.parquet"
            xs = list(range(next_x, next_x + n))
            next_x += n
            pq.write_table(pa.table({"x": xs}), t._abs(rel))
            t.append_files([rel], partition={"p": str(p)})
            model[rel] = xs
        elif op[0] == "expire":
            _, p = op
            t.remove_partition("p", str(p))
            model = {
                f: xs
                for f, xs in model.items()
                if not f.startswith(f"p={p}/")
            }
        else:
            _, retain = op
            hwm_before, _ = t._load_vacuum_hwm()
            t.vacuum(retain_versions=retain)
            # r9 metadata bound: a pass replays only commits past the
            # high-water mark, plus the checkpoint-bounded state()
            # resolutions for the retention window
            bound = (
                (t.version() - hwm_before)
                + (retain + 1) * (t.checkpoint_every + 1)
                + 2
            )
            assert t.last_vacuum_file_opens <= bound
            # pending tombstones only ever name files still on disk
            _, pending = t._load_vacuum_hwm()
            assert all(os.path.exists(t._abs(p)) for p in pending)
        # invariants after EVERY op
        assert t.live_files() == sorted(model.keys())
        # checkpoint-resolved state ≡ full log replay (the Delta
        # checkpoint contract: an accelerator, never a divergence)
        assert t.state() == t.state(use_checkpoints=False)
        assert _read_rows(t) == sorted(x for xs in model.values() for x in xs)
        # versions are consecutive from 1 and history replays cleanly
        hist = t.history()
        assert [h["version"] for h in hist] == list(range(1, t.version() + 1))

    # a stale remove (file already retired or never-live) must conflict
    if model:
        victim = sorted(model)[0]
        t.commit(remove=[victim], op="expire")
        with pytest.raises(CommitConflict):
            t.commit(remove=[victim], op="expire")
    with pytest.raises(CommitConflict):
        t.commit(remove=["p=0/never-existed.parquet"], op="compact")

    # final vacuum with no retention leaves EXACTLY the live files on disk
    t.vacuum(retain_versions=0)
    on_disk = sorted(
        os.path.relpath(os.path.join(dp, f), str(root)).replace(os.sep, "/")
        for dp, _, fs in os.walk(str(root))
        for f in fs
        if f.endswith(".parquet")
    )
    assert on_disk == t.live_files()


# --- months_changed_since (rollup staleness primitive) -----------------

# an op is ("append", month 0-3), ("append_nopart",) — an
# unattributable add — ("compact", month), ("expire", month), or
# ("merge",)
_STALE_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 3)),
        st.tuples(st.just("append_nopart")),
        st.tuples(st.just("compact"), st.integers(0, 3)),
        st.tuples(st.just("expire"), st.integers(0, 3)),
        st.tuples(st.just("merge")),
    ),
    min_size=1,
    max_size=14,
)


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(ops=_STALE_OPS)
def test_months_changed_since_matches_model(tmp_path_factory, ops):
    """months_changed_since must agree with a trivial event model at
    EVERY possible scan floor: appends mark their month at their
    version, expiry marks the month it actually removed files from,
    compaction (content-preserving) marks nothing, and merge or an
    unpartitioned add forces needs_full — the exact contract the
    rollup-staleness planner relies on."""
    root = tmp_path_factory.mktemp("txn_stale")
    t = TxnTable(None, str(root), checkpoint_every=4)
    month = lambda m: f"2024-0{m + 1}"  # noqa: E731
    # model: (version, kind, month_or_None)
    events: list[tuple[int, str, str | None]] = []
    live: dict[str, list[str]] = {}  # month -> rel paths
    seq = 0

    def _write(rel: str):
        os.makedirs(os.path.dirname(t._abs(rel)), exist_ok=True)
        pq.write_table(pa.table({"x": [seq]}), t._abs(rel))

    for op in ops:
        if op[0] == "append":
            m = month(op[1])
            rel = f"_month={m}/b{seq}.parquet"
            _write(rel)
            v = t.append_files([rel], partition={"_month": m})
            live.setdefault(m, []).append(rel)
            events.append((v, "append", m))
        elif op[0] == "append_nopart":
            rel = f"b{seq}.parquet"
            _write(rel)
            v = t.append_files([rel], partition=None)
            events.append((v, "full", None))
        elif op[0] == "compact":
            m = month(op[1])
            if not live.get(m):
                continue
            rel = f"_month={m}/c{seq}.parquet"
            _write(rel)
            v = t.commit(
                add=[{"path": rel, "partition": {"_month": m}}],
                remove=list(live[m]),
                op="compact",
            )
            live[m] = [rel]
            events.append((v, "compact", m))
        elif op[0] == "expire":
            m = month(op[1])
            removed = bool(live.get(m))
            v = t.remove_partition("_month", m)
            live.pop(m, None)
            events.append((v, "expire" if removed else "noop", m))
        else:
            v = t.commit(op="merge")
            events.append((v, "full", None))
        seq += 1

    end = t.version()
    for since in range(0, end + 1):
        changed, full = t.months_changed_since(since)
        exp_changed: dict[str, int] = {}
        exp_full = False
        for v, kind, m in events:
            if v <= since:
                continue
            if kind in ("append", "expire"):
                exp_changed[m] = v
            elif kind == "full":
                exp_full = True
        assert changed == exp_changed, f"since={since}"
        assert full == exp_full, f"since={since}"
    # scanning from the head reports nothing
    assert t.months_changed_since(end) == ({}, False)


@given(
    values=st.sets(
        st.one_of(
            st.text(max_size=40),
            st.integers(min_value=-(2**62), max_value=2**62),
            st.floats(allow_nan=False, allow_infinity=False),
            st.booleans(),
        ),
        max_size=300,
    ),
    probes=st.lists(
        st.one_of(st.text(max_size=40), st.integers(), st.floats(allow_nan=False)),
        max_size=30,
    ),
)
@settings(max_examples=200, deadline=None)
def test_bloom_never_false_negative(values, probes):
    """The bloom contract under arbitrary value mixes: every inserted
    value MUST test positive (false negatives would silently drop
    matching files from point lookups — a correctness bug, unlike
    false positives which only cost reads).  Also pins the int/float
    canonicalization: 7 and 7.0 are the same key in both directions."""
    from rakam_api_spark.txnlog import _bloom_build, _bloom_might_contain

    bloom = _bloom_build(values)
    if bloom is None:
        assert not values
        return
    for v in values:
        assert _bloom_might_contain(bloom, v), v
        if isinstance(v, int) and not isinstance(v, bool):
            assert _bloom_might_contain(bloom, float(v)) or abs(v) > 2**53
        if isinstance(v, float) and v.is_integer() and abs(v) < 2**53:
            assert _bloom_might_contain(bloom, int(v))
    # probes are allowed to false-positive, never to raise
    for p in probes:
        _bloom_might_contain(bloom, p)


# --- executor-side bloom partials (round 11) ---------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    vals=st.lists(
        st.one_of(
            st.integers(min_value=-(10**9), max_value=10**9),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
            st.text(min_size=0, max_size=12),
            st.booleans(),
        ),
        min_size=0,
        max_size=120,
    ),
    n_batches=st.integers(min_value=1, max_value=5),
)
def test_bloom_partials_merge_equals_direct_build(vals, n_batches):
    """The executor partial protocol (digest sets → OR-able bitsets)
    must reconstruct EXACTLY the bloom a direct single-pass build
    produces while values stay under the digest cap — any batch
    split, any interleaving.  (Equality, not just no-false-negative:
    the adaptive sizing depends only on the distinct digest set,
    which the partials preserve.)"""
    import pandas as pd

    from rakam_api_spark.txnlog import (
        _bloom_build,
        _bloom_might_contain,
        _bloom_partial_batches,
    )

    # one synthetic file, values split across arbitrary arrow batches
    chunks = [vals[i::n_batches] for i in range(n_batches)]
    batches = (
        pd.DataFrame({"__file": ["f1"] * len(c), "c1": pd.Series(c, dtype=object)})
        for c in chunks
        if True
    )
    (out,) = list(_bloom_partial_batches(batches, ["c1"]))
    direct = _bloom_build(vals)
    if direct is None:
        assert out.empty or all(out["payload"].map(len) == 0)
        return
    # driver-side merge (the _blooms_via_spark tail) on the partials
    digs = set()
    for _, row in out.iterrows():
        assert row["kind"] == "d"  # under the cap: digest partials
        p = row["payload"]
        digs.update(p[i : i + 16] for i in range(0, len(p), 16))
    from rakam_api_spark.txnlog import _bloom_from_digests

    merged = _bloom_from_digests(digs)
    assert merged == direct
    for v in vals:
        if v is None or v != v:
            continue
        assert _bloom_might_contain(merged, v)
