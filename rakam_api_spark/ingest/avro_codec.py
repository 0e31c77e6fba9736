"""Minimal pure-Python Avro codec (container files + binary
encoding + reader-schema resolution).

Implemented from the public Apache Avro 1.11 specification
(container format: magic ``Obj\\x01``, metadata map, 16-byte sync
marker, blocks of <count, size, data, sync>; binary encoding:
zigzag-varint longs, length-prefixed bytes/strings, index-prefixed
unions, blocked arrays/maps).  Exists because this environment has
neither the spark-avro data source nor fastavro; the distributed
reader in ``avro_ingest`` ships THIS module to executors via
``mapInPandas`` so no decoding ever happens on the driver.

Supported: null/boolean/int/long/float/double/bytes/string, record,
enum, fixed, array, map, union; codecs null + deflate; logical types
date (int epoch-days) and timestamp-millis/micros (long).  Reader-
schema resolution follows the spec's rules for the shapes the
reference exercises (AvroEventDeserializer.java:26-45): field
matching by name, reader defaults for missing writer fields, writer
fields absent from the reader discarded, numeric promotions
(int→long/float/double, long→float/double, float→double),
string↔bytes, union branch resolution.
"""

from __future__ import annotations

import datetime
import hashlib
import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"
_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_DT = datetime.datetime(1970, 1, 1)

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}
_PROMOTIONS = {
    ("int", "long"), ("int", "float"), ("int", "double"),
    ("long", "float"), ("long", "double"), ("float", "double"),
    ("string", "bytes"), ("bytes", "string"),
}


class AvroDecodeError(ValueError):
    pass


# --- schema handling -----------------------------------------------------


def normalize_schema(schema, names: dict | None = None):
    """Resolve named-type references and return a dict/str/list tree.
    ``names`` maps fullname → definition for record/enum/fixed."""
    if names is None:
        names = {}
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return schema
        if schema in names:
            return names[schema]
        raise AvroDecodeError(f"unknown type reference: {schema}")
    if isinstance(schema, list):
        return [normalize_schema(s, names) for s in schema]
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed"):
            name = schema.get("name")
            if name:
                names[name] = schema
                if schema.get("namespace"):
                    names[f"{schema['namespace']}.{name}"] = schema
        if t == "record":
            for f in schema.get("fields", []):
                f["type"] = normalize_schema(f["type"], names)
        elif t == "array":
            schema["items"] = normalize_schema(schema["items"], names)
        elif t == "map":
            schema["values"] = normalize_schema(schema["values"], names)
        elif isinstance(t, (dict, list)):
            schema["type"] = normalize_schema(t, names)
        return schema
    raise AvroDecodeError(f"bad schema node: {schema!r}")


def _type_name(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema.get("type")


# --- binary primitives ---------------------------------------------------


def _read_varlong(buf) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise AvroDecodeError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not (byte & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # zigzag


def _write_varlong(value: int, out) -> None:
    n = (value << 1) ^ (value >> 63) if value < 0 else (value << 1)
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _read_sized(buf) -> bytes:
    n = _read_varlong(buf)
    data = buf.read(n)
    if len(data) != n:
        raise AvroDecodeError("truncated bytes")
    return data


# --- decode --------------------------------------------------------------


def _logical(schema, value):
    if not isinstance(schema, dict):
        return value
    lt = schema.get("logicalType")
    if lt == "date":
        return _EPOCH_DATE + datetime.timedelta(days=value)
    if lt == "timestamp-millis":
        return _EPOCH_DT + datetime.timedelta(milliseconds=value)
    if lt == "timestamp-micros":
        return _EPOCH_DT + datetime.timedelta(microseconds=value)
    if lt == "time-millis":
        return value  # reference stores TIME as millis-of-day long
    return value


def decode_value(schema, buf):
    t = _type_name(schema)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _logical(schema, _read_varlong(buf))
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_sized(buf)
    if t == "string":
        return _read_sized(buf).decode("utf-8")
    if t == "union":
        idx = _read_varlong(buf)
        return decode_value(schema[idx], buf)
    if t == "record":
        return {f["name"]: decode_value(f["type"], buf) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][_read_varlong(buf)]
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = _read_varlong(buf)
            if n == 0:
                break
            if n < 0:  # block with byte size prefix
                n = -n
                _read_varlong(buf)
            for _ in range(n):
                out.append(decode_value(schema["items"], buf))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_varlong(buf)
            if n == 0:
                break
            if n < 0:
                n = -n
                _read_varlong(buf)
            for _ in range(n):
                k = _read_sized(buf).decode("utf-8")
                out[k] = decode_value(schema["values"], buf)
        return out
    raise AvroDecodeError(f"unsupported type: {t}")


# --- reader-schema resolution -------------------------------------------


def _adapt(value, writer, reader):
    """Project a decoded writer value onto the reader schema."""
    if reader is None:
        return value
    wt, rt = _type_name(writer), _type_name(reader)
    if rt == "union":
        branch = next((b for b in reader if _type_name(b) != "null"), None)
        if value is None or branch is None:
            return None
        return _adapt(value, writer if wt != "union" else branch, branch)
    if wt == "union":
        if value is None:
            return None
        concrete = next((b for b in writer if _type_name(b) != "null"), writer[0])
        return _adapt(value, concrete, reader)
    if rt == "record":
        wfields = {f["name"]: f["type"] for f in (writer.get("fields", []) if isinstance(writer, dict) else [])}
        out = {}
        for f in reader["fields"]:
            n = f["name"]
            if isinstance(value, dict) and n in value:
                out[n] = _adapt(value[n], wfields.get(n), f["type"])
            elif "default" in f:
                out[n] = f["default"]
            else:
                out[n] = None
        return out
    if rt == "array" and isinstance(value, list):
        return [_adapt(v, writer.get("items") if isinstance(writer, dict) else None, reader["items"]) for v in value]
    if rt == "map" and isinstance(value, dict):
        return {k: _adapt(v, writer.get("values") if isinstance(writer, dict) else None, reader["values"]) for k, v in value.items()}
    if (wt, rt) in _PROMOTIONS:
        if rt in ("float", "double"):
            return float(value)
        if rt == "long":
            return int(value)
        if rt == "bytes":
            return value.encode("utf-8") if isinstance(value, str) else value
        if rt == "string":
            return value.decode("utf-8") if isinstance(value, bytes) else value
    return value


# --- container files -----------------------------------------------------


def read_container_header(buf) -> tuple[dict, str, bytes]:
    """→ (writer schema, codec, sync marker); leaves buf at block 0."""
    if buf.read(4) != MAGIC:
        raise AvroDecodeError("not an Avro container file")
    meta = decode_value({"type": "map", "values": "bytes"}, buf)  # str keys, bytes values
    schema = normalize_schema(json.loads(meta["avro.schema"].decode("utf-8")))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    return schema, codec, sync


def decode_container(blob: bytes, reader_schema: dict | None = None) -> list[dict]:
    """Decode a whole container file body → list of records,
    projected onto ``reader_schema`` when given."""
    buf = io.BytesIO(blob)
    writer, codec, sync = read_container_header(buf)
    if reader_schema is not None:
        reader_schema = normalize_schema(json.loads(json.dumps(reader_schema)))
    out = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = _read_varlong(buf)
        data = _read_sized(buf)
        if buf.read(16) != sync:
            raise AvroDecodeError("sync marker mismatch")
        if codec == "deflate":
            data = zlib.decompress(data, -15)
        elif codec != "null":
            raise AvroDecodeError(f"unsupported codec: {codec}")
        block = io.BytesIO(data)
        for _ in range(count):
            v = decode_value(writer, block)
            out.append(_adapt(v, writer, reader_schema) if reader_schema else v)
    return out


# --- encode (tests / gateway helper) -------------------------------------


def encode_value(value, schema, out) -> None:
    t = _type_name(schema)
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_varlong(int(value), out)
    elif t == "float":
        out.write(struct.pack("<f", float(value)))
    elif t == "double":
        out.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        _write_varlong(len(value), out)
        out.write(value)
    elif t == "string":
        b = value.encode("utf-8")
        _write_varlong(len(b), out)
        out.write(b)
    elif t == "union":
        idx = _pick_branch(value, schema)
        _write_varlong(idx, out)
        encode_value(value, schema[idx], out)
    elif t == "record":
        for f in schema["fields"]:
            encode_value(value.get(f["name"], f.get("default")), f["type"], out)
    elif t == "enum":
        _write_varlong(schema["symbols"].index(value), out)
    elif t == "fixed":
        out.write(value)
    elif t == "array":
        if value:
            _write_varlong(len(value), out)
            for v in value:
                encode_value(v, schema["items"], out)
        _write_varlong(0, out)
    elif t == "map":
        if value:
            _write_varlong(len(value), out)
            for k, v in value.items():
                kb = k.encode("utf-8")
                _write_varlong(len(kb), out)
                out.write(kb)
                encode_value(v, schema["values"], out)
        _write_varlong(0, out)
    else:
        raise AvroDecodeError(f"unsupported type: {t}")


def _pick_branch(value, union) -> int:
    for i, b in enumerate(union):
        t = _type_name(b)
        if value is None and t == "null":
            return i
        if value is not None and t != "null":
            if isinstance(value, bool):
                if t == "boolean":
                    return i
            elif isinstance(value, int) and t in ("int", "long"):
                return i
            elif isinstance(value, float) and t in ("float", "double"):
                return i
            elif isinstance(value, str) and t in ("string", "enum"):
                return i
            elif isinstance(value, bytes) and t in ("bytes", "fixed"):
                return i
            elif isinstance(value, list) and t == "array":
                return i
            elif isinstance(value, dict) and t in ("map", "record"):
                return i
    raise AvroDecodeError(f"no union branch for {type(value)} in {union}")


def container_bytes(schema: dict, records: list[dict], codec: str = "null") -> bytes:
    """Serialize an Avro container (null or deflate codec) to bytes;
    sync marker derived from the schema so output is deterministic."""
    schema_json = json.dumps(schema)
    sync = hashlib.md5(schema_json.encode()).digest()
    norm = normalize_schema(json.loads(schema_json))
    body = io.BytesIO()
    for r in records:
        encode_value(r, norm, body)
    data = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        data = comp.compress(data) + comp.flush()
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    _write_varlong(len(meta), out)
    for k, v in meta.items():
        kb = k.encode()
        _write_varlong(len(kb), out)
        out.write(kb)
        _write_varlong(len(v), out)
        out.write(v)
    _write_varlong(0, out)
    out.write(sync)
    _write_varlong(len(records), out)
    _write_varlong(len(data), out)
    out.write(data)
    out.write(sync)
    return out.getvalue()


def write_container(path: str, schema: dict, records: list[dict], codec: str = "null") -> None:
    """Write an Avro container file; see ``container_bytes``."""
    with open(path, "wb") as f:
        f.write(container_bytes(schema, records, codec))
