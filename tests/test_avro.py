"""S6 Avro bulk: distributed container decode (binaryFile +
mapInPandas pure-Python codec — no spark-avro jar, no driver-side
record decode) with reader-schema resolution.

Reference contract: AvroEventDeserializer.java:26-45 — records
resolve against the catalog (reader) schema; missing fields take
defaults; extra writer fields are discarded."""

import datetime

import pytest

from rakam_api_spark.ingest import avro_codec
from rakam_api_spark.ingest.avro_ingest import read_avro, decode_avro_records

WRITER = {
    "type": "record",
    "name": "Event",
    "fields": [
        {"name": "user", "type": "string"},
        {"name": "n", "type": "int"},
        {"name": "price", "type": ["null", "double"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {"name": "secret", "type": "string"},
    ],
}

ROWS = [
    {"user": "u1", "n": 1, "price": 9.5, "tags": ["a", "b"], "day": 19723, "secret": "x"},
    {"user": "u2", "n": 2, "price": None, "tags": [], "day": 19724, "secret": "y"},
]


@pytest.fixture(params=["null", "deflate"])
def avro_file(tmp_path, request):
    p = tmp_path / f"events_{request.param}.avro"
    avro_codec.write_container(str(p), WRITER, ROWS, codec=request.param)
    return str(p)


def test_roundtrip_distributed(spark, avro_file):
    df = read_avro(spark, avro_file)
    got = sorted((r["user"], r["n"], r["price"], r["tags"], r["day"]) for r in df.collect())
    assert got == [
        ("u1", 1, 9.5, ["a", "b"], datetime.date(2024, 1, 1)),
        ("u2", 2, None, [], datetime.date(2024, 1, 2)),
    ]
    # the decode runs executor-side: plan is binaryFile scan → Arrow
    plan = df._jdf.queryExecution().toString()
    assert "binaryFile" in plan or "BinaryFile" in plan


def test_reader_schema_projection(spark, avro_file):
    """Reader schema: drops 'secret', promotes n int→double, adds
    'region' with a default — classic Avro resolution."""
    import json

    reader = {
        "type": "record",
        "name": "Event",
        "fields": [
            {"name": "user", "type": "string"},
            {"name": "n", "type": "double"},
            {"name": "region", "type": "string", "default": "eu"},
        ],
    }
    df = read_avro(spark, avro_file, reader_schema_json=json.dumps(reader))
    assert df.columns == ["user", "n", "region"]
    got = {r["user"]: (r["n"], r["region"]) for r in df.collect()}
    assert got == {"u1": (1.0, "eu"), "u2": (2.0, "eu")}


def test_bulk_ingest_from_avro(spark, warehouse, avro_file):
    from rakam_api_spark.api import EventCollector
    from rakam_api_spark.catalog import Metastore
    from rakam_api_spark.enrich import EnrichmentPipeline, TimestampMapper

    collector = EventCollector(
        spark, Metastore(warehouse), pipeline=EnrichmentPipeline([TimestampMapper()])
    )
    report = collector.bulk("proj", "avro_events", read_avro(spark, avro_file))
    assert report.stored == 2
    stored = collector.store.read("proj", "avro_events")
    assert {r["user"] for r in stored.collect()} == {"u1", "u2"}


def test_decode_blob_helper():
    import io as _io

    buf_path = "/tmp/_avro_blob_test.avro"
    avro_codec.write_container(buf_path, WRITER, ROWS, codec="deflate")
    blob = open(buf_path, "rb").read()
    recs = decode_avro_records(blob)
    assert len(recs) == 2 and recs[0]["user"] == "u1"
    assert recs[0]["day"] == datetime.date(2024, 1, 1)


def test_union_and_map_and_enum_roundtrip(tmp_path):
    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "m", "type": {"type": "map", "values": "long"}},
            {"name": "e", "type": {"type": "enum", "name": "E", "symbols": ["A", "B"]}},
            {"name": "u", "type": ["null", "string"]},
            {"name": "raw", "type": "bytes"},
        ],
    }
    rows = [
        {"m": {"x": 1, "y": 2}, "e": "B", "u": None, "raw": b"\x00\x01"},
        {"m": {}, "e": "A", "u": "ok", "raw": b""},
    ]
    p = tmp_path / "r.avro"
    avro_codec.write_container(str(p), schema, rows)
    back = avro_codec.decode_container(open(p, "rb").read())
    assert back == rows
