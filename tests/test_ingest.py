"""Ingest contract tests: inference precedence, lenient coercion,
dead-letter routing, end-to-end collect/batch with schema evolution
(mirrors the reference's TestEventJsonParser assertions)."""

import datetime

import pytest

from rakam_api_spark.api import EventCollector
from rakam_api_spark.catalog import Metastore
from rakam_api_spark.enrich import EnrichmentPipeline, TimestampMapper
from rakam_api_spark.ingest.coerce import coerce_to_schema
from rakam_api_spark.ingest.infer import infer_field_type
from rakam_api_spark.store import EventStore
from rakam_api_spark.types import FieldType


# --- value-level inference (TestEventJsonParser.testPrimitiveTypes) -----


def test_infer_primitives():
    assert infer_field_type(4) == FieldType.DOUBLE  # int → DOUBLE
    assert infer_field_type(4.5) == FieldType.DOUBLE
    assert infer_field_type(True) == FieldType.BOOLEAN
    assert infer_field_type("plain text") == FieldType.STRING
    assert infer_field_type("2024-01-15") == FieldType.DATE
    assert infer_field_type("2024-01-15T10:30:00Z") == FieldType.TIMESTAMP
    assert infer_field_type(None) is None  # deferred


def test_infer_short_string_not_timestamp():
    # ≤12 chars rejected (10-digit-number-as-date trap)
    assert infer_field_type("123456789012") == FieldType.STRING


def test_infer_complex():
    assert infer_field_type([1, 2]) == FieldType.ARRAY_DOUBLE
    assert infer_field_type(["a"]) == FieldType.ARRAY_STRING
    assert infer_field_type({"k": 1.5}) == FieldType.MAP_DOUBLE
    assert infer_field_type({"k": "v"}) == FieldType.MAP_STRING
    assert infer_field_type([]) is None  # deferred
    assert infer_field_type([{"nested": 1}]) == FieldType.ARRAY_STRING  # JSON-encoded
    assert infer_field_type({"k": [1]}) == FieldType.MAP_STRING


# --- coercion (JsonEventDeserializer.getValue lenient rules) ------------


@pytest.fixture()
def collector(spark, warehouse):
    ms = Metastore(warehouse)
    return EventCollector(
        spark,
        ms,
        EventStore(spark, ms),
        pipeline=EnrichmentPipeline([TimestampMapper()]),
    )


def _schema(spark, fields):
    from rakam_api_spark.types import to_struct_field
    from pyspark.sql import types as T

    return T.StructType([to_struct_field(n, ft) for n, ft in fields.items()])


def test_coerce_lenient_rules(spark):
    df = spark.createDataFrame(
        [("", "2", "true", "abc", "1.5")],
        "empty string, num string, flag string, bad string, dbl string",
    )
    schema = _schema(
        spark,
        {
            "empty": FieldType.LONG,
            "num": FieldType.DOUBLE,
            "flag": FieldType.BOOLEAN,
            "bad": FieldType.DOUBLE,
            "dbl": FieldType.DOUBLE,
        },
    )
    res = coerce_to_schema(df, schema, "c")
    row = res.valid.collect()[0]
    assert row["empty"] is None  # empty string → null, NOT dead-lettered
    assert row["num"] == 2.0  # "2" → 2.0 (string→double)
    assert row["flag"] is True
    assert row["bad"] is None  # unconvertible → null + dead letter
    assert row["dbl"] == 1.5
    dead = res.dead_letter.collect()
    assert len(dead) == 1
    assert dead[0]["property"] == "bad"
    assert dead[0]["encoded_value"] == "abc"


def test_coerce_timestamp_rules(spark):
    df = spark.createDataFrame(
        [(1704067200000, "2024-01-01T10:00:00", "123")],
        "epoch bigint, iso string, short string",
    )
    schema = _schema(
        spark,
        {"epoch": FieldType.TIMESTAMP, "iso": FieldType.TIMESTAMP, "short": FieldType.TIMESTAMP},
    )
    res = coerce_to_schema(df, schema, "c")
    row = res.valid.collect()[0]
    assert row["epoch"] == datetime.datetime(2024, 1, 1, 0, 0)  # epoch millis
    assert row["iso"] == datetime.datetime(2024, 1, 1, 10, 0)
    assert row["short"] is None  # ≤12 chars rejected


def test_coerce_scalar_to_singleton_array(spark):
    df = spark.createDataFrame([(5,)], "x bigint")
    schema = _schema(spark, {"x": FieldType.ARRAY_DOUBLE})
    res = coerce_to_schema(df, schema, "c")
    assert res.valid.collect()[0]["x"] == [5.0]


def test_coerce_string_truncation(spark):
    df = spark.createDataFrame([("x" * 500,)], "s string")
    schema = _schema(spark, {"s": FieldType.STRING})
    res = coerce_to_schema(df, schema, "c", max_len=100)
    assert len(res.valid.collect()[0]["s"]) == 100


def test_coerce_time_millis_of_day(spark):
    df = spark.createDataFrame([("10:30:15", "25:00:00")], "t string, bad string")
    schema = _schema(spark, {"t": FieldType.TIME, "bad": FieldType.TIME})
    res = coerce_to_schema(df, schema, "c")
    row = res.valid.collect()[0]
    assert row["t"] == (10 * 3600 + 30 * 60 + 15) * 1000
    assert row["bad"] is None


# --- end-to-end collect/batch (the dynamic-schema core) -----------------


def test_collect_infers_and_evolves(collector):
    r1 = collector.collect("proj", "PageView", {"test": 4, "test2": "2024-01-15", "name": "x"})
    assert r1.stored == 1
    fields = collector.metastore.project("proj").collections["pageview"].fields
    assert fields["test"] == FieldType.DOUBLE
    assert fields["test2"] == FieldType.DATE
    assert fields["name"] == FieldType.STRING
    assert fields["_time"] == FieldType.TIMESTAMP
    assert fields["$server_time"] == FieldType.TIMESTAMP

    # second event adds a column — additive evolution
    r2 = collector.collect("proj", "PageView", {"test": 7, "newcol": True})
    assert r2.stored == 1
    assert "newcol" in collector.metastore.project("proj").collections["pageview"].fields

    # old rows read back NULL-padded under the widened schema
    df = collector.store.read("proj", "pageview")
    rows = {r["test"]: r for r in df.collect()}
    assert rows[4.0]["newcol"] is None
    assert rows[7.0]["newcol"] is True


def test_conflicting_type_dead_letters(collector):
    collector.collect("proj", "c", {"price": 9.99})
    r = collector.collect("proj", "c", {"price": "not-a-number"})
    assert r.stored == 1  # event stored, bad value nulled
    dead = collector.store.read_dead_letter("proj").collect()
    assert len(dead) == 1
    assert dead[0]["property"] == "price"
    assert dead[0]["collection"] == "c"
    # schema unchanged
    assert collector.metastore.project("proj").collections["c"].fields["price"] == FieldType.DOUBLE


def test_camel_case_normalization(collector):
    collector.collect("proj", "c", {"campaignSource": "google"})
    assert "campaign_source" in collector.metastore.project("proj").collections["c"].fields


def test_batch_groups_by_collection(collector):
    reports = collector.batch(
        "proj",
        [
            {"collection": "a", "properties": {"x": 1}},
            {"collection": "b", "properties": {"y": "z"}},
            {"collection": "a", "properties": {"x": 2}},
        ],
    )
    by = {r.collection: r for r in reports}
    assert by["a"].stored == 2
    assert by["b"].stored == 1


def test_copy_bypasses_mappers(spark, warehouse):
    ms = Metastore(warehouse)
    collector = EventCollector(spark, ms)  # full default pipeline
    # bulk with map_events=False must not produce geo/ua fields even
    # if trigger columns are present
    r = collector.bulk(
        "proj", "c", [{"x": 1, "_ip": "1.2.3.4"}], map_events=False
    )
    assert r.stored == 1
    fields = ms.project("proj").collections["c"].fields
    assert "_country_code" not in fields
    assert "_time" in fields  # constants still attach


def test_user_type_pinning_end_to_end(collector):
    collector.collect("proj", "c1", {"_user": 42, "x": 1})
    assert collector.metastore.get_config("proj", "USER_TYPE") == "LONG"
    # later STRING user values coerce to the pinned LONG
    collector.collect("proj", "c2", {"_user": "77", "x": 1})
    fields = collector.metastore.project("proj").collections["c2"].fields
    assert fields["_user"] == FieldType.LONG
    vals = {r["_user"] for r in collector.store.read("proj", "c2").collect()}
    assert vals == {77}
