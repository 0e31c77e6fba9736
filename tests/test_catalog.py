"""Metastore contract tests (mirrors the reference's abstract
TestMetastore: create project/collection/fields, duplicates, caps)."""

import pytest

from rakam_api_spark.catalog import (
    ColumnCapExceeded,
    FixedSchemaViolation,
    Metastore,
    TypeMismatch,
)
from rakam_api_spark.types import FieldType


@pytest.fixture()
def ms(warehouse):
    return Metastore(warehouse)


def test_create_project(ms):
    ms.create_project("Demo")
    assert ms.projects() == ["demo"]
    ms.create_project("demo")  # idempotent
    assert ms.projects() == ["demo"]


def test_collection_create_and_magic_fields(ms):
    ms.create_project("p")
    schema = ms.get_or_create_collection_fields("p", "PageView", {"test": FieldType.DOUBLE})
    names = [f.name for f in schema.fields]
    assert "test" in names
    assert "_time" in names  # constant magic field
    assert "$server_time" in names  # server-side default column
    assert ms.get_collection("p", "pageview") is not None  # lowercased


def test_additive_only_evolution(ms):
    ms.create_project("p")
    ms.get_or_create_collection_fields("p", "c", {"a": FieldType.DOUBLE})
    schema = ms.get_or_create_collection_fields("p", "c", {"b": FieldType.STRING})
    assert {f.name for f in schema.fields} >= {"a", "b"}
    # conflicting type: schema unchanged, TypeMismatch raised
    with pytest.raises(TypeMismatch):
        ms.get_or_create_collection_fields("p", "c", {"a": FieldType.STRING})
    assert ms.project("p").collections["c"].fields["a"] == FieldType.DOUBLE


def test_column_cap(ms):
    ms.create_project("p")
    fields = {f"c{i}": FieldType.DOUBLE for i in range(199)}
    with pytest.raises(ColumnCapExceeded):
        ms.get_or_create_collection_fields("p", "big", fields)


def test_user_type_pinned_project_wide(ms):
    ms.create_project("p")
    ms.get_or_create_collection_fields("p", "c1", {"_user": FieldType.LONG})
    # second collection tries STRING → pinned LONG wins
    schema = ms.get_or_create_collection_fields("p", "c2", {"_user": FieldType.STRING})
    assert ms.project("p").collections["c2"].fields["_user"] == FieldType.LONG
    assert ms.get_config("p", "USER_TYPE") == "LONG"
    _ = schema


def test_fixed_schema_mode(ms):
    ms.create_project("p")
    ms.get_or_create_collection_fields("p", "c", {"a": FieldType.DOUBLE})
    ms.set_config("p", "FIXED_SCHEMA", True)
    with pytest.raises(FixedSchemaViolation):
        ms.get_or_create_collection_fields("p", "c", {"b": FieldType.STRING})
    # master key bypasses
    ms.get_or_create_collection_fields("p", "c", {"b": FieldType.STRING}, master_key=True)
    assert "b" in ms.project("p").collections["c"].fields


def test_explicit_metastore_mode(ms):
    """M6 explicit-schema deployment (MysqlExplicitMetastore):
    collections are declared up front; ingest can neither create a
    collection nor add fields without the master key."""
    ms.create_project("p")
    ms.set_config("p", "FIXED_SCHEMA", True)
    with pytest.raises(FixedSchemaViolation):  # implicit creation blocked
        ms.get_or_create_collection_fields("p", "newcoll", {"a": FieldType.DOUBLE})
    # explicit declaration (admin/master path) works
    ms.get_or_create_collection_fields("p", "newcoll", {"a": FieldType.DOUBLE}, master_key=True)
    assert "a" in ms.project("p").collections["newcoll"].fields


def test_explicit_mode_ingest_projects_unknown_fields(spark, warehouse):
    """Ingest into a fixed-schema project stores declared columns and
    projects unregistered client fields away (the explicit metastore
    writes only declared columns); undeclared collections reject."""
    from rakam_api_spark.api import EventCollector
    from rakam_api_spark.enrich import EnrichmentPipeline, TimestampMapper

    ms = Metastore(warehouse)
    collector = EventCollector(spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()]))
    ms.create_project("p")
    ms.get_or_create_collection_fields("p", "c", {"a": FieldType.DOUBLE}, master_key=True)
    ms.set_config("p", "FIXED_SCHEMA", True)
    report = collector.collect("p", "c", {"a": 1.5, "sneaky": "nope"})
    assert report.stored == 1
    stored = collector.store.read("p", "c")
    assert "sneaky" not in stored.columns
    assert stored.collect()[0]["a"] == 1.5
    with pytest.raises(FixedSchemaViolation):
        collector.collect("p", "never_declared", {"x": 1})


def test_persistence_roundtrip(warehouse):
    ms1 = Metastore(warehouse)
    ms1.create_project("p")
    ms1.get_or_create_collection_fields("p", "c", {"a": FieldType.ARRAY_DOUBLE, "t": FieldType.TIME})
    ms2 = Metastore(warehouse)  # fresh load from disk
    assert ms2.project("p").collections["c"].fields["a"] == FieldType.ARRAY_DOUBLE
    assert ms2.project("p").collections["c"].fields["t"] == FieldType.TIME


def test_reserved_field(ms):
    ms.create_project("p")
    from rakam_api_spark.types import InvalidFieldName

    with pytest.raises(InvalidFieldName):
        ms.get_or_create_collection_fields("p", "c", {"$server_time ": FieldType.STRING})
