"""Materialized views (matview.py): create at a pinned snapshot,
metadata-only staleness, incremental refresh through the change feed
for insert-only advances (idempotent via commit-log app versions),
atomic full-replace fallback on base rewrites, SQL addressability as
materialized_<name>.  Reference surface: the 'materialized-view' API
tag (rakam/.../ServiceStarter.java:201); the incremental-append
refresh contract mirrors the reference's warehouse editions."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rakam_api_spark.api import EventCollector
from rakam_api_spark.catalog import Metastore
from rakam_api_spark.enrich import EnrichmentPipeline, TimestampMapper
from rakam_api_spark.matview import MaterializedViewService
from rakam_api_spark.query_service import QueryService


@pytest.fixture()
def env(spark, warehouse):
    ms = Metastore(warehouse)
    collector = EventCollector(
        spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()])
    )
    store = collector.store
    for i in range(8):
        collector.collect(
            "proj", "ev", {"uid": f"u{i}", "x": i, "_time": "2024-01-05 09:00:00"}
        )
    store.enable_txn("proj", "ev")
    return collector, store, MaterializedViewService(spark, store)


VIEW_SQL = "SELECT uid, x, x * 2 AS x2 FROM ev WHERE x % 2 = 0"


def _rows(df):
    return sorted((r["uid"], r["x"], r["x2"]) for r in df.collect())


def test_create_refresh_incremental_and_noop(spark, env):
    collector, store, mv = env
    info = mv.create("proj", "evens", VIEW_SQL)
    assert info["incremental_capable"] is True
    base = _rows(mv.table("proj", "evens"))
    assert base == sorted((f"u{i}", float(i), float(i * 2)) for i in range(0, 8, 2))

    # no base change -> metadata-only noop
    assert mv.refresh("proj", "evens")["mode"] == "noop"
    assert mv.staleness("proj", "evens") == {"ev": 0}

    # insert-only advance -> incremental refresh via the change feed
    for i in range(8, 12):
        collector.collect(
            "proj", "ev", {"uid": f"u{i}", "x": i, "_time": "2024-02-05 09:00:00"}
        )
    assert mv.staleness("proj", "evens") == {"ev": 4}
    res = mv.refresh("proj", "evens")
    assert res["mode"] == "incremental"
    assert _rows(mv.table("proj", "evens")) == sorted(
        (f"u{i}", float(i), float(i * 2)) for i in range(0, 12, 2)
    )

    # idempotent replay: a second refresh at the same versions no-ops,
    # and a forced replay of the same increment cannot double-apply
    # (commit-log app versions)
    assert mv.refresh("proj", "evens")["mode"] == "noop"
    view = mv._table("proj", "evens")
    ver = view.version()
    feed = store.changes("proj", "ev", 1)
    out = feed.drop("_change_type", "_commit_version").where("x % 2 = 0")
    assert (
        view.append(
            out.selectExpr("uid", "x", "x * 2 AS x2"),
            app="matview:evens",
            app_version=store.txn_table("proj", "ev").version(),
        )
        is None
    )
    assert view.version() == ver


def test_refresh_full_on_base_rewrite(spark, env):
    collector, store, mv = env
    mv.create("proj", "evens", VIEW_SQL)
    # rewrite rows in the base -> increment is not insert-only
    txn = store.txn_table("proj", "ev")
    snap = txn.read()
    upd = snap.where("uid = 'u2'").withColumn("x", snap["x"] * 0 + 100)
    txn.merge(upd, key="uid", partition_col="_month")
    res = mv.refresh("proj", "evens")
    assert res["mode"] == "full"
    rows = _rows(mv.table("proj", "evens"))
    assert ("u2", 100.0, 200.0) in rows and ("u2", 2.0, 4.0) not in rows
    # the full refresh was ONE atomic replace commit
    hist = [r["op"] for r in mv._table("proj", "evens").history()]
    assert hist[-1] == "merge"


def test_matview_queryable_from_sql(spark, env):
    collector, store, mv = env
    mv.create("proj", "evens", VIEW_SQL)
    svc = QueryService(spark, store)
    res = svc.execute(
        "proj",
        "SELECT COUNT(*) AS n, SUM(x2) AS s FROM materialized_evens",
    )
    assert res.error is None
    assert res.result == [[4, float(sum(i * 2 for i in range(0, 8, 2)))]]
    # cache invalidation: a refresh bumps the dependency signature
    sig1 = svc._dep_signature("proj")
    collector.collect(
        "proj", "ev", {"uid": "u99", "x": 20, "_time": "2024-03-05 09:00:00"}
    )
    mv.refresh("proj", "evens")
    assert svc._dep_signature("proj") != sig1


def test_create_validation(spark, env):
    collector, store, mv = env
    with pytest.raises(ValueError, match="read statements"):
        mv.create("proj", "bad", "DROP TABLE ev")
    with pytest.raises(ValueError, match="unknown collection"):
        mv.create("proj", "bad", "SELECT 1 FROM nope")
    with pytest.raises(ValueError, match="invalid view name"):
        mv.create("proj", "1bad", VIEW_SQL)
    with pytest.raises(ValueError, match="table_changes"):
        mv.create("proj", "bad", "SELECT * FROM table_changes('ev', 1)")
    mv.create("proj", "ok", "SELECT uid FROM ev")
    with pytest.raises(ValueError, match="exists"):
        mv.create("proj", "ok", "SELECT uid FROM ev")
    assert mv.list("proj") == ["ok"]
    mv.drop("proj", "ok")
    assert mv.list("proj") == []
    with pytest.raises(ValueError, match="no materialized view"):
        mv.table("proj", "ok")


def test_replace_is_atomic_and_cdf_visible(spark, env):
    collector, store, mv = env
    txn = store.txn_table("proj", "ev")
    v0 = txn.version()
    new = spark.createDataFrame(
        [("w1", 1, "2024-01-05 09:00:00")], "uid string, x long, _time string"
    )
    # layout guard: a partitioned table refuses an unpartitioned swap
    new_full = txn.read().limit(1)
    with pytest.raises(ValueError, match="partitioned"):
        txn.replace(new_full)
    txn.replace(new_full, partition_col="_month")
    assert txn.version() == v0 + 1
    assert txn.read().count() == 1
    types = {
        r["_change_type"] for r in txn.changes(v0, v0 + 1).collect()
    }
    assert types == {"merge_upsert", "merge_preimage"}


def test_maintenance_planner_schedules_matview_refresh(spark, env):
    collector, store, mv = env
    mv.create("proj", "evens", VIEW_SQL)
    # fresh view: nothing planned for it
    plan0 = [
        p for p in store.maintenance_plan("proj")
        if p["action"] == "matview_refresh"
    ]
    assert plan0 == []
    collector.collect(
        "proj", "ev", {"uid": "u50", "x": 50, "_time": "2024-03-05 09:00:00"}
    )
    plan = [
        p for p in store.maintenance_plan("proj")
        if p["action"] == "matview_refresh"
    ]
    assert len(plan) == 1 and plan[0]["view"] == "evens"
    assert "ev +1" in plan[0]["reason"]
    done = store.run_maintenance("proj", plan=plan)
    assert done[0]["outcome"] == "refreshed (incremental)"
    assert mv.staleness("proj", "evens") == {"ev": 0}
    assert ("u50", 50.0, 100.0) in _rows(mv.table("proj", "evens"))
