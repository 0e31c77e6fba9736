"""External Avro-schema import (reference M7): parse an Avro record
schema JSON into FieldType fields for ``/project/schema/add/custom``.

Mirrors rakam/src/main/java/org/rakam/analysis/SchemaConverter.java:18-59:
top level must be a record; each field's type may be wrapped in a
union with null (unwrapped); primitives map onto the 10 scalar
FieldTypes; arrays/maps of scalars map to ARRAY_/MAP_ variants
(one level deep, map keys STRING — FieldType.java:65-73); anything
nested deeper is rejected like the JSON path ("Nested properties
are not supported", JsonEventDeserializer.java:303-305).
"""

from __future__ import annotations

import json

from ..types import FieldType

_PRIMITIVES = {
    "string": FieldType.STRING,
    "int": FieldType.INTEGER,
    "long": FieldType.LONG,
    "float": FieldType.DOUBLE,
    "double": FieldType.DOUBLE,
    "boolean": FieldType.BOOLEAN,
    "bytes": FieldType.BINARY,
}

# Avro logical types the reference's physical mapping implies
# (AvroUtil.java:202-231: DATE=int/epoch-days, TIMESTAMP=long-millis,
# TIME=int millis-of-day, DECIMAL=double)
_LOGICAL = {
    "date": FieldType.DATE,
    "timestamp-millis": FieldType.TIMESTAMP,
    "time-millis": FieldType.TIME,
}


class UnsupportedAvroSchema(ValueError):
    pass


def _unwrap_union(t):
    if isinstance(t, list):
        non_null = [x for x in t if x != "null"]
        if len(non_null) != 1:
            raise UnsupportedAvroSchema(f"unsupported union: {t}")
        return non_null[0]
    return t


def _scalar_of(t) -> FieldType:
    t = _unwrap_union(t)
    if isinstance(t, dict):
        logical = t.get("logicalType")
        if logical in _LOGICAL:
            return _LOGICAL[logical]
        if logical == "decimal":
            return FieldType.DECIMAL
        t = t.get("type")
    if isinstance(t, str) and t in _PRIMITIVES:
        return _PRIMITIVES[t]
    raise UnsupportedAvroSchema(f"nested/unknown element type: {t!r}")


def fields_from_avro_schema(schema_json: str) -> dict[str, FieldType]:
    """Avro record schema JSON → {field: FieldType}."""
    schema = json.loads(schema_json)
    if not isinstance(schema, dict) or schema.get("type") != "record":
        raise UnsupportedAvroSchema("top-level schema must be a record")
    out: dict[str, FieldType] = {}
    for f in schema.get("fields", []):
        name = f["name"]
        t = _unwrap_union(f["type"])
        if isinstance(t, dict) and t.get("type") == "array":
            elem = _scalar_of(t["items"])
            out[name] = FieldType[f"ARRAY_{elem.name}"]
        elif isinstance(t, dict) and t.get("type") == "map":
            val = _scalar_of(t["values"])
            out[name] = FieldType[f"MAP_{val.name}"]
        else:
            out[name] = _scalar_of(t)
    return out
