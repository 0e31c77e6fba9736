"""Metadata-layer parity: API-key service (M10), Avro schema import
(M7), and the schema-change event bus (M4)."""

import pytest

from rakam_api_spark.auth import ApiKeyService, KeyLevel, ProjectNotFound
from rakam_api_spark.catalog import Metastore
from rakam_api_spark.ingest.schema_import import UnsupportedAvroSchema, fields_from_avro_schema
from rakam_api_spark.types import FieldType


# --- M10 api keys -------------------------------------------------------


def test_api_key_lifecycle(tmp_path):
    svc = ApiKeyService(str(tmp_path))
    keys = svc.create_api_keys("proj")
    assert set(keys) == {KeyLevel.READ, KeyLevel.WRITE, KeyLevel.MASTER}
    assert svc.check_permission("proj", keys[KeyLevel.WRITE]) == KeyLevel.WRITE
    assert svc.check_permission("proj", keys[KeyLevel.MASTER]) == KeyLevel.MASTER
    assert svc.check_permission("proj", "bogus") is None
    # deserializer-style resolution: key -> (project, level)
    assert svc.resolve_project(keys[KeyLevel.WRITE]) == ("proj", KeyLevel.WRITE)
    # persisted: a fresh service sees the same (hashed) keys
    svc2 = ApiKeyService(str(tmp_path))
    assert svc2.check_permission("proj", keys[KeyLevel.READ]) == KeyLevel.READ
    svc2.revoke_api_keys("proj")
    with pytest.raises(ProjectNotFound):
        svc2.check_permission("proj", keys[KeyLevel.READ])


# --- M7 avro schema import ----------------------------------------------


def test_avro_schema_import():
    schema = """
    {"type": "record", "name": "ev", "fields": [
        {"name": "s", "type": ["null", "string"]},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "d", "type": "double"},
        {"name": "f", "type": "float"},
        {"name": "b", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {"name": "at", "type": ["null", {"type": "long", "logicalType": "timestamp-millis"}]},
        {"name": "tags", "type": {"type": "array", "items": ["null", "string"]}},
        {"name": "attrs", "type": {"type": "map", "values": "double"}}
    ]}
    """
    fields = fields_from_avro_schema(schema)
    assert fields == {
        "s": FieldType.STRING,
        "i": FieldType.INTEGER,
        "l": FieldType.LONG,
        "d": FieldType.DOUBLE,
        "f": FieldType.DOUBLE,  # float degrades to DOUBLE like the reference
        "b": FieldType.BOOLEAN,
        "raw": FieldType.BINARY,
        "day": FieldType.DATE,
        "at": FieldType.TIMESTAMP,
        "tags": FieldType.ARRAY_STRING,
        "attrs": FieldType.MAP_DOUBLE,
    }


def test_avro_schema_rejects_nested():
    nested = """
    {"type": "record", "name": "ev", "fields": [
        {"name": "obj", "type": {"type": "record", "name": "inner", "fields": []}}
    ]}
    """
    with pytest.raises(UnsupportedAvroSchema):
        fields_from_avro_schema(nested)
    with pytest.raises(UnsupportedAvroSchema):
        fields_from_avro_schema('{"type": "array", "items": "string"}')


def test_avro_import_feeds_metastore(tmp_path):
    """/project/schema/add/custom flow: imported fields register as a
    collection schema."""
    ms = Metastore(str(tmp_path))
    ms.create_project("p")
    fields = fields_from_avro_schema(
        '{"type": "record", "name": "ev", "fields": [{"name": "x", "type": "double"}]}'
    )
    struct = ms.get_or_create_collection_fields("p", "imported", fields)
    assert "x" in struct.fieldNames()


# --- M4 event bus -------------------------------------------------------


def test_schema_event_bus(tmp_path):
    ms = Metastore(str(tmp_path))
    seen: list[tuple[str, dict]] = []
    ms.add_listener(lambda ev, payload: seen.append((ev, payload)))
    ms.create_project("p")
    ms.get_or_create_collection_fields("p", "clicks", {"x": FieldType.DOUBLE})
    ms.get_or_create_collection_fields("p", "clicks", {"y": FieldType.STRING})
    events = [e for e, _ in seen]
    assert events[0] == "project_created"
    assert "collection_created" in events
    field_events = [p for e, p in seen if e == "collection_fields_created"]
    assert any("x" in p["fields"] for p in field_events)
    assert any("y" in p["fields"] and "x" not in p["fields"] for p in field_events)
    # no event when nothing new
    n = len(seen)
    ms.get_or_create_collection_fields("p", "clicks", {"x": FieldType.DOUBLE})
    assert len(seen) == n
