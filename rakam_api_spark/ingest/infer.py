"""Type inference for unknown fields at ingest.

Reference precedence (JsonEventDeserializer.getTypeForUnknown,
rakam/.../collection/JsonEventDeserializer.java:116-211):

- string → try DATE, then TIMESTAMP, else STRING
- any number → DOUBLE
- boolean → BOOLEAN
- array of scalars → ARRAY_<elem> (element inferred from first
  non-null member; numbers → DOUBLE)
- object of scalars → MAP_<value type>
- array/map containing complex values → ARRAY_STRING / MAP_STRING
  with JSON-encoded members (JsonEventDeserializer.java:671,714)
- null / empty container → type deferred (returns None)

Two forms: a value-level function (single-event API path — the
reference decides from the first non-null value it sees) and a
DataFrame-level resolver for bulk loads that maps Spark's
distributed JSON schema inference onto FieldTypes, probing string
columns for DATE/TIMESTAMP with the same precedence.
"""

from __future__ import annotations

import re
from datetime import date, datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..types import FieldType

_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def _try_date(s: str) -> bool:
    if not _DATE_RE.match(s):
        return False
    try:
        date.fromisoformat(s)
        return True
    except ValueError:
        return False


def _try_timestamp(s: str) -> bool:
    # reference: ISO-8601 or "yyyy-M-d H:m:s[.SSS]" with/without zone;
    # strings ≤ 12 chars are rejected to avoid the 10-digit-number-
    # as-date trap (DateTimeUtils.java:76-78)
    if len(s) <= 12:
        return False
    for candidate in (s, s.replace("Z", "+00:00")):
        try:
            datetime.fromisoformat(candidate)
            return True
        except ValueError:
            pass
    return False


def infer_field_type(value) -> FieldType | None:
    """Infer a FieldType from one JSON-decoded Python value.
    Returns None when the type must be deferred (null/empty)."""
    if value is None:
        return None
    if isinstance(value, bool):
        return FieldType.BOOLEAN
    if isinstance(value, (int, float)):
        return FieldType.DOUBLE
    if isinstance(value, str):
        if _try_date(value):
            return FieldType.DATE
        if _try_timestamp(value):
            return FieldType.TIMESTAMP
        return FieldType.STRING
    if isinstance(value, (list, tuple)):
        elem = next((v for v in value if v is not None), None)
        if elem is None:
            return None  # empty/all-null array: deferred
        et = infer_field_type(elem)
        if et is None or et.is_array or et.is_map:
            return FieldType.ARRAY_STRING  # complex members JSON-encoded
        return et.as_array()
    if isinstance(value, dict):
        elem = next((v for v in value.values() if v is not None), None)
        if elem is None:
            return None
        et = infer_field_type(elem)
        if et is None or et.is_array or et.is_map:
            return FieldType.MAP_STRING
        return et.as_map()
    return FieldType.STRING


def _spark_to_fieldtype(dt: T.DataType) -> FieldType | None:
    """Map a Spark-inferred JSON type onto the reference precedence
    (all JSON numbers → DOUBLE)."""
    if isinstance(dt, T.NullType):
        return None
    if isinstance(dt, T.BooleanType):
        return FieldType.BOOLEAN
    if isinstance(dt, (T.LongType, T.IntegerType, T.DoubleType, T.DecimalType, T.FloatType)):
        return FieldType.DOUBLE
    if isinstance(dt, T.StringType):
        return FieldType.STRING  # may be upgraded to DATE/TIMESTAMP by probing
    if isinstance(dt, T.ArrayType):
        et = _spark_to_fieldtype(dt.elementType)
        if et is None:
            return None
        if et.is_array or et.is_map:
            return FieldType.ARRAY_STRING
        return et.as_array()
    if isinstance(dt, (T.StructType, T.MapType)):
        # one-level objects become MAP_<scalar>; deeper nesting would
        # be JSON-encoded — decided per value type below
        vts = (
            [f.dataType for f in dt.fields]
            if isinstance(dt, T.StructType)
            else [dt.valueType]
        )
        elem_types = {type(v) for v in vts if not isinstance(v, T.NullType)}
        if not elem_types:
            return None
        if len(elem_types) == 1 and not elem_types & {T.StructType, T.ArrayType, T.MapType}:
            et = _spark_to_fieldtype(vts[0])
            return et.as_map() if et else None
        return FieldType.MAP_STRING
    if isinstance(dt, T.TimestampType):
        return FieldType.TIMESTAMP
    if isinstance(dt, T.DateType):
        return FieldType.DATE
    return FieldType.STRING


def needs_probe(parsed: DataFrame, known: dict[str, FieldType]) -> bool:
    """True iff :func:`infer_new_fields` will run a distributed probe
    ACTION on this frame (an unregistered StringType column exists).
    Exported so the ingest path can decide whether caching the frame
    pays off without re-implementing this predicate."""
    return any(
        f.name not in known and isinstance(f.dataType, T.StringType)
        for f in parsed.schema.fields
    )


def infer_new_fields(parsed: DataFrame, known: dict[str, FieldType]) -> dict[str, FieldType]:
    """Resolve FieldTypes for columns of a JSON-parsed DataFrame that
    are not yet registered.

    String columns are probed with one distributed aggregate (first
    non-null value per column — the reference decides from the first
    value it sees) to apply the DATE → TIMESTAMP → STRING precedence.
    """
    out: dict[str, FieldType] = {}
    probe_cols: list[str] = []
    for f in parsed.schema.fields:
        if f.name in known:
            continue
        ft = _spark_to_fieldtype(f.dataType)
        if ft is None:
            continue  # deferred: all-null column in this batch
        if ft == FieldType.STRING and isinstance(f.dataType, T.StringType):
            probe_cols.append(f.name)
        out[f.name] = ft
    if probe_cols:
        firsts = parsed.select(
            [F.first(F.col(f"`{c}`"), ignorenulls=True).alias(c) for c in probe_cols]
        ).first()
        for c in probe_cols:
            v = firsts[c]
            if v is None:
                out.pop(c, None)  # deferred
            elif _try_date(v):
                out[c] = FieldType.DATE
            elif _try_timestamp(v):
                out[c] = FieldType.TIMESTAMP
    return out
