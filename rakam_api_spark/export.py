"""Query-result export: CSV and Avro serializations of a result
DataFrame, mirroring the reference's ExportUtil
(rakam/src/main/java/org/rakam/util/ExportUtil.java:31-55 exportAsCSV,
:57-76 exportAsAvro) — the download path for report results.

Reference semantics preserved:

- CSV uses NON_NUMERIC quote mode (every non-numeric field quoted,
  numbers bare — ExportUtil.java:35), lists/maps/structs are
  JSON-encoded into the cell (:41-42), binary is base64
  (:44-45).
- Avro schema is derived from the result's column types the way
  AvroUtil.convertAvroSchema does: every field is a ["null", T]
  union.  Temporal/decimal columns export as ISO strings (the
  reference renders them through toString on the JDBC row as well).

Scale: these helpers serialize a RESULT, which in this engine is the
small frame left after aggregation, so a driver-side collect is the
contract (the reference buffers the whole result in a byte[] too).
For event-grain extracts there is ``write_csv_dir`` /
``write_avro_dir`` — Spark's distributed writers, one file per
partition, no driver funnel; the byte-returning forms guard against
accidental full-table collects with ``max_rows``.
"""

from __future__ import annotations

import base64
import datetime
import decimal
import io
import json

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .ingest.avro_codec import container_bytes


class ExportTooLarge(ValueError):
    """The byte-returning export forms are for query RESULTS; raise
    rather than silently funneling an event-grain table through the
    driver."""


_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _cell(value, quote_all: bool) -> str:
    """One CSV cell, commons-csv NON_NUMERIC semantics: numbers and
    nulls bare, everything else quoted with internal quotes doubled."""
    if value is None:
        return ""
    if isinstance(value, bool):
        s = "true" if value else "false"
    elif isinstance(value, (int, float, decimal.Decimal)) and not quote_all:
        return repr(value) if isinstance(value, float) else str(value)
    elif isinstance(value, (bytes, bytearray)):
        s = base64.b64encode(bytes(value)).decode("ascii")
    elif isinstance(value, (list, dict)):
        s = json.dumps(value, separators=(",", ":"), default=str)
    elif isinstance(value, (datetime.datetime, datetime.date, datetime.time)):
        s = value.isoformat()
    else:
        s = str(value)
    return '"' + s.replace('"', '""') + '"'


def _row_cells(row, fields) -> list[str]:
    out = []
    for f, v in zip(fields, row):
        if isinstance(f.dataType, T.StructType) and v is not None:
            v = v.asDict(recursive=True)
        elif isinstance(f.dataType, T.ArrayType) and v is not None:
            v = list(v)
        elif isinstance(f.dataType, T.MapType) and v is not None:
            v = dict(v)
        quote_all = not isinstance(f.dataType, _NUMERIC)
        out.append(_cell(v, quote_all))
    return out


def export_csv(df: DataFrame, max_rows: int = 100_000) -> bytes:
    """Result frame → CSV bytes (header + rows, CRLF line ends like
    commons-csv's default record separator)."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ExportTooLarge(f"result exceeds max_rows={max_rows}; use write_csv_dir")
    fields = df.schema.fields
    buf = io.StringIO()
    buf.write(",".join('"' + f.name.replace('"', '""') + '"' for f in fields))
    buf.write("\r\n")
    for r in rows:
        buf.write(",".join(_row_cells(r, fields)))
        buf.write("\r\n")
    return buf.getvalue().encode("utf-8")


def _avro_type(dt: T.DataType):
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
        return "int"
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": ["null", _avro_type(dt.elementType)]}
    if isinstance(dt, T.MapType):
        return {"type": "map", "values": ["null", _avro_type(dt.valueType)]}
    # string, timestamp/date/decimal (ISO text), struct (JSON text)
    return "string"


def avro_schema_for(df: DataFrame, name: str = "Result") -> dict:
    """["null", T] unions per column, AvroUtil.convertAvroSchema
    shape."""
    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": ["null", _avro_type(f.dataType)], "default": None}
            for f in df.schema.fields
        ],
    }


def _avro_cell(value, dt: T.DataType):
    if value is None:
        return None
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return value.isoformat()
    if isinstance(dt, T.DecimalType):
        return str(value)
    if isinstance(dt, T.StructType):
        return json.dumps(value.asDict(recursive=True), separators=(",", ":"), default=str)
    if isinstance(dt, T.ArrayType):
        return [_avro_cell(v, dt.elementType) for v in value]
    if isinstance(dt, T.MapType):
        return {k: _avro_cell(v, dt.valueType) for k, v in value.items()}
    if isinstance(dt, T.BinaryType):
        return bytes(value)
    return value


def export_avro(df: DataFrame, max_rows: int = 100_000, codec: str = "null") -> bytes:
    """Result frame → Avro container bytes (readable back with
    ``ingest.avro_codec.decode_container``)."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ExportTooLarge(f"result exceeds max_rows={max_rows}; use write_avro_dir")
    fields = df.schema.fields
    records = [
        {f.name: _avro_cell(v, f.dataType) for f, v in zip(fields, r)} for r in rows
    ]
    return container_bytes(avro_schema_for(df), records, codec=codec)


def _json_cell(value, dt: T.DataType):
    """One QueryResult JSON cell: temporals → ISO strings, decimal →
    string (exactness over float coercion, as the reference's Jackson
    serialization of BigDecimal), binary → base64, nested types
    recurse — all JSON-native otherwise."""
    if value is None:
        return None
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return value.isoformat()
    if isinstance(dt, T.DecimalType):
        return str(value)
    if isinstance(dt, T.BinaryType):
        return base64.b64encode(bytes(value)).decode("ascii")
    if isinstance(dt, T.ArrayType):
        return [_json_cell(v, dt.elementType) for v in value]
    if isinstance(dt, T.MapType):
        return {str(k): _json_cell(v, dt.valueType) for k, v in value.items()}
    if isinstance(dt, T.StructType):
        return {
            f.name: _json_cell(value[f.name], f.dataType) for f in dt.fields
        }
    return value


def export_query_result_json(
    df: DataFrame, max_rows: int = 100_000, properties: dict | None = None
) -> bytes:
    """Result frame → the reference's QueryResult JSON envelope
    (rakam-spi/src/main/java/org/rakam/report/QueryResult.java:17-47):
    ``{"metadata": [{"name", "type"}...], "result": [[...]...]}`` with
    column types rendered as the reference FieldType names and rows as
    positional arrays — the primary HTTP result format every reference
    client consumes.  ``properties`` carries the reference's optional
    envelope extras (executionTimeInMillis, totalResult, query)."""
    from .types import FieldType, from_spark_type

    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ExportTooLarge(f"result exceeds max_rows={max_rows}; use write_json_dir")
    fields = df.schema.fields

    def _ft(f):
        try:
            return from_spark_type(f.dataType, dict(f.metadata or {})).value
        except Exception:  # noqa: BLE001 - non-event types (struct etc.)
            return FieldType.STRING.value

    payload = {
        "metadata": [{"name": f.name, "type": _ft(f)} for f in fields],
        "result": [
            [_json_cell(v, f.dataType) for f, v in zip(fields, r)] for r in rows
        ],
    }
    if properties:
        payload["properties"] = properties
    return json.dumps(payload, separators=(",", ":")).encode("utf-8")


def write_json_dir(df: DataFrame, path: str) -> None:
    """Distributed ND-JSON extract (one JSON object per line, one
    file per partition) — the event-grain companion of
    ``export_query_result_json`` with no driver funnel; round-trips
    through ``spark.read.json``."""
    df.write.mode("overwrite").json(path)


def write_csv_dir(df: DataFrame, path: str) -> None:
    """Distributed CSV extract: one file per partition, header in
    each, quotes on non-numeric values — the event-grain path with no
    driver funnel."""
    df.write.option("header", "true").option("quoteAll", "false").mode(
        "overwrite"
    ).csv(path)


def write_avro_dir(df: DataFrame, path: str) -> None:
    """Distributed Avro extract via spark-avro when the package is on
    the classpath; raises a clear error otherwise (the pure-Python
    codec is a driver-side result serializer, not a distributed
    writer)."""
    try:
        df.write.format("avro").mode("overwrite").save(path)
    except Exception as exc:  # pragma: no cover - depends on classpath
        raise RuntimeError(
            "spark-avro not available for distributed Avro writes; "
            "use export_avro for result-sized frames"
        ) from exc
