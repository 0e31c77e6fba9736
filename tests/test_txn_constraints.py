"""CHECK constraints and TIMESTAMP AS OF on the txn log — the two
remaining Delta-parity surfaces: write-time row validation
(ConstraintViolation before any file lands; NULL passes, FALSE
rejects — SQL CHECK semantics) and wall-clock snapshot resolution
(version_at binary search over commit-recorded times, O(log commits)
metadata opens)."""

import time

import pytest

from rakam_api_spark.txnlog import ConstraintViolation, TxnTable


def _rows(spark, vals, month="2024-01"):
    return spark.createDataFrame(
        [(i, v, month) for i, v in enumerate(vals)],
        "x long, amount double, _month string",
    )


def test_check_constraints_gate_appends_and_merges(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.append(_rows(spark, [1.0, 2.0]), partition_col="_month")
    t.add_constraint("positive_amount", "amount > 0")
    assert t.constraints() == {"positive_amount": "amount > 0"}
    # conforming append passes; NULL passes (SQL CHECK semantics)
    t.append(_rows(spark, [3.0, None]), partition_col="_month")
    # violating append rejected BEFORE any file lands
    before = t.version()
    files_before = set(t.live_files())
    with pytest.raises(ConstraintViolation, match="positive_amount"):
        t.append(_rows(spark, [4.0, -1.0]), partition_col="_month")
    assert t.version() == before and set(t.live_files()) == files_before
    # merge runs the same gate
    bad = spark.createDataFrame(
        [(0, -5.0, "2024-01")], "x long, amount double, _month string"
    )
    with pytest.raises(ConstraintViolation):
        t.merge(bad, key="x")
    # registration validates EXISTING data: can't add a constraint the
    # table already violates
    with pytest.raises(ConstraintViolation, match="existing rows"):
        t.add_constraint("small", "amount < 2")
    # drop ends enforcement
    t.drop_constraint("positive_amount")
    assert t.constraints() == {}
    t.append(_rows(spark, [-9.0]), partition_col="_month")


def test_constraints_are_versioned_and_survive_checkpoints(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"), checkpoint_every=2)
    t.append(_rows(spark, [1.0]), partition_col="_month")
    v_before = t.version()
    t.add_constraint("pos", "amount > 0")
    # time travel sees the constraint set active at each snapshot
    assert t.constraints(version=v_before) == {}
    assert t.constraints() == {"pos": "amount > 0"}
    # push past several checkpoints; the constraint rides them
    for i in range(6):
        t.append(_rows(spark, [float(i + 1)]), partition_col="_month")
    assert t._checkpoint_versions()
    assert t.constraints() == {"pos": "amount > 0"}
    with pytest.raises(ConstraintViolation):
        t.append(_rows(spark, [-1.0]), partition_col="_month")


def test_timestamp_as_of_resolves_versions(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    before_any = time.time()
    time.sleep(0.02)
    t.append(_rows(spark, [1.0]), partition_col="_month")
    time.sleep(0.02)
    mid = time.time()
    time.sleep(0.02)
    t.append(_rows(spark, [2.0]), partition_col="_month")
    time.sleep(0.02)
    after_all = time.time()

    assert t.version_at(before_any) == 0
    assert t.version_at(mid) == 1
    assert t.version_at(after_all) == 2
    assert t.read(version=t.version_at(mid)).count() == 1


def test_store_timestamp_travel(spark, warehouse):
    from rakam_api_spark.api import EventCollector
    from rakam_api_spark.catalog import Metastore
    from rakam_api_spark.enrich import EnrichmentPipeline, TimestampMapper

    ms = Metastore(warehouse)
    collector = EventCollector(
        spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()])
    )
    collector.collect("proj", "ev", {"x": 1, "_time": "2024-01-05 09:00:00"})
    store = collector.store
    with pytest.raises(ValueError, match="transaction-logged"):
        store.read("proj", "ev", timestamp=time.time())
    store.enable_txn("proj", "ev")
    time.sleep(0.02)
    mid = time.time()
    time.sleep(0.02)
    collector.collect("proj", "ev", {"x": 2, "_time": "2024-02-05 09:00:00"})
    assert store.read("proj", "ev", timestamp=mid).count() == 1
    assert store.read("proj", "ev", timestamp=time.time()).count() == 2
    with pytest.raises(ValueError, match="not both"):
        store.read("proj", "ev", version=1, timestamp=mid)
