"""Rollup-aware report routing: derivable reports answer from the
maintained day-grain cells, everything else falls back to raw —
the automatic-query-path form of the reference's pre-aggregation
(SURVEY.md M5; reference delegates reports to warehouse tables it
maintains, README.md:14-19)."""

from __future__ import annotations

import pytest

from rakam_api_spark.api import EventCollector
from rakam_api_spark.catalog import Metastore
from rakam_api_spark.enrich import EnrichmentPipeline, TimestampMapper

MEASURES = {
    "n_events": "CAST(COUNT(*) AS BIGINT)",
    "total_value": "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)",
    "max_value": "MAX(value)",
}


@pytest.fixture()
def loaded_store(spark, warehouse):
    ms = Metastore(warehouse)
    collector = EventCollector(spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()]))
    rows = []
    for i in range(40):
        month = "2024-01" if i % 2 == 0 else "2024-02"
        rows.append(
            {
                "collection": "clicks",
                "properties": {
                    "event_type": "view" if i % 3 else "click",
                    "value": float(i),
                    "_time": f"{month}-{i % 9 + 1:02d} 10:00:00",
                },
            }
        )
    collector.batch("proj", rows)
    store = collector.store
    store.publish_rollup("proj", "clicks", dims=("event_type",), measures=MEASURES)
    return store


def _as_map(df, keys):
    return {
        tuple(r[k] for k in keys): (r["n_events"], r["total_value"], r["max_value"])
        for r in df.collect()
    }


class TestRollupRouting:
    def test_derivable_routes_to_rollup_and_matches_raw(self, loaded_store):
        routed = loaded_store.route_report(
            "proj", "clicks", dims=("event_type",), measures=MEASURES, grain="month"
        )
        assert routed.route == "rollup"
        raw = loaded_store.route_report(
            "proj",
            "clicks",
            dims=("event_type",),
            # a non-derivable extra measure forces the raw route
            measures={**MEASURES, "u": "COUNT(DISTINCT value)"},
            grain="month",
        )
        assert raw.route == "raw"
        got = _as_map(routed.df, ["_month", "event_type"])
        want = _as_map(raw.df, ["_month", "event_type"])
        assert got == want and len(got) == 4

    def test_day_and_total_grains(self, loaded_store):
        day = loaded_store.route_report(
            "proj", "clicks", dims=(), measures={"n_events": MEASURES["n_events"]}
        )
        assert day.route == "rollup"
        assert sum(r["n_events"] for r in day.df.collect()) == 40
        total = loaded_store.route_report(
            "proj", "clicks", dims=(), measures={"n_events": MEASURES["n_events"]}, grain="total"
        )
        assert total.df.collect()[0]["n_events"] == 40

    def test_month_pruning(self, loaded_store):
        jan = loaded_store.route_report(
            "proj",
            "clicks",
            dims=("event_type",),
            measures={"n_events": MEASURES["n_events"]},
            grain="month",
            months=["2024-01"],
        )
        assert jan.route == "rollup"
        rows = jan.df.collect()
        assert {r["_month"] for r in rows} == {"2024-01"}
        assert sum(r["n_events"] for r in rows) == 20

    def test_unpublished_dim_falls_back(self, loaded_store):
        routed = loaded_store.route_report(
            "proj", "clicks", dims=("value",), measures={"n_events": MEASURES["n_events"]}
        )
        assert routed.route == "raw"
        assert "not derivable" in routed.reason or "no rollup" in routed.reason

    def test_changed_sql_is_not_served_from_cells(self, loaded_store):
        routed = loaded_store.route_report(
            "proj",
            "clicks",
            dims=("event_type",),
            measures={"n_events": "CAST(COUNT(value) AS BIGINT)"},  # differs from published
        )
        assert routed.route == "raw"

    def test_partial_refresh_contract_guard(self, loaded_store):
        with pytest.raises(ValueError, match="full rebuild"):
            loaded_store.publish_rollup(
                "proj",
                "clicks",
                dims=("event_type", "value"),
                measures=MEASURES,
                months=["2024-01"],
            )

    def test_compound_measure_never_served_from_cells(self, loaded_store):
        """'SUM(x)/COUNT(*)' per DAY cell is a ratio: re-SUMming it at
        month/total grain serves wrong numbers.  Any arithmetic around
        or between aggregates must route to raw — even when the exact
        same expression string was published as a rollup measure."""
        ratio = {"avg_value": "SUM(value)/COUNT(*)"}
        loaded_store.publish_rollup(
            "proj", "clicks", dims=("event_type",), measures={**MEASURES, **ratio}
        )
        for m in (ratio, {"spread": "MAX(value)-MIN(value)"}, {"n1": "COUNT(*) + 1"}):
            routed = loaded_store.route_report(
                "proj", "clicks", dims=("event_type",), measures={**MEASURES, **m},
                grain="month",
            )
            assert routed.route == "raw", m
        # plain single aggregates (CAST-wrapped or not) still route to cells
        ok = loaded_store.route_report(
            "proj", "clicks", dims=("event_type",), measures=MEASURES, grain="month"
        )
        assert ok.route == "rollup"

    def test_no_rollup_falls_back(self, spark, warehouse):
        ms = Metastore(warehouse)
        collector = EventCollector(spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()]))
        collector.collect("p2", "ev", {"event_type": "x", "value": 1.0, "_time": "2024-03-01 00:00:00"})
        routed = collector.store.route_report(
            "p2", "ev", dims=("event_type",), measures={"n_events": MEASURES["n_events"]}
        )
        assert routed.route == "raw" and routed.reason == "no rollup published"
        assert routed.df.collect()[0]["n_events"] == 1


class TestRawRoutePruning:
    def test_raw_route_month_filter_prunes_partitions(self, loaded_store):
        routed = loaded_store.route_report(
            "proj",
            "clicks",
            dims=("event_type",),
            measures={**MEASURES, "u": "COUNT(DISTINCT value)"},  # forces raw
            grain="month",
            months=["2024-01"],
        )
        assert routed.route == "raw"
        rows = routed.df.collect()
        assert {r["_month"] for r in rows} == {"2024-01"}
        plan = routed.df._jdf.queryExecution().executedPlan().toString()
        # the month predicate reaches the scan as a PARTITION filter
        assert "PartitionFilters" in plan and "2024-01" in plan
