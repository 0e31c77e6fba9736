"""Loader + extension-point tests: CSV header mapping, EventList
checksum, ndjson, pixel, webhook transforms, custom mappers,
webhook sink."""

import json

import pytest

from pyspark.sql import functions as F

from rakam_api_spark.api import EventCollector
from rakam_api_spark.catalog import Metastore
from rakam_api_spark.enrich import EnrichmentPipeline, TimestampMapper
from rakam_api_spark.enrich.transforms import CustomMapperStage, TransformRegistry
from rakam_api_spark.enrich.webhook_sink import WebhookSink
from rakam_api_spark.ingest.envelope import ChecksumMismatch, parse_event_list, pixel_event
from rakam_api_spark.types import FieldType


@pytest.fixture()
def collector(spark, warehouse):
    ms = Metastore(warehouse)
    return EventCollector(spark, ms, pipeline=EnrichmentPipeline([TimestampMapper()]))


# --- CSV (TestCSVParser contract) ----------------------------------------


def test_csv_header_mapping(collector, tmp_path):
    # pre-declare price DOUBLE
    collector.metastore.create_project("p")
    collector.metastore.get_or_create_collection_fields("p", "sales", {"price": FieldType.DOUBLE})
    csv = tmp_path / "data.csv"
    csv.write_text("Transaction_date,Product,Price\n1/2/09 6:17,Product1,1200\n1/2/09 4:53,Product2,1500\n")
    r = collector.bulk_csv("p", "sales", str(csv))
    assert r.stored == 2
    fields = collector.metastore.project("p").collections["sales"].fields
    # declared column keeps DOUBLE; new header columns are STRING
    assert fields["price"] == FieldType.DOUBLE
    assert fields["transaction_date"] == FieldType.STRING
    assert fields["product"] == FieldType.STRING
    rows = collector.store.read("p", "sales").orderBy("product").collect()
    assert rows[0]["price"] == 1200.0  # CSV string "1200" coerced to DOUBLE
    assert rows[0]["transaction_date"] == "1/2/09 6:17"


# --- EventList envelope + checksum (F9) -----------------------------------


def test_event_list_checksum_roundtrip():
    events = [{"collection": "c", "properties": {"x": 1}}]
    body_events = json.dumps(events, separators=(",", ":"))
    import hashlib

    checksum = hashlib.md5(f"key1.01700000000{body_events}".encode()).hexdigest()
    doc = json.dumps(
        {"api": {"api_key": "key", "api_version": "1.0", "upload_time": 1700000000, "checksum": checksum},
         "events": events}
    )
    assert parse_event_list(doc) == events


def test_event_list_bad_checksum():
    doc = json.dumps({"api": {"api_key": "k", "checksum": "deadbeef"}, "events": []})
    with pytest.raises(ChecksumMismatch):
        parse_event_list(doc)


def test_event_list_unknown_field_rejected():
    with pytest.raises(ValueError, match="unknown top-level"):
        parse_event_list(json.dumps({"events": [], "extra": 1}))


# --- pixel (S8) ------------------------------------------------------------


def test_pixel_event_params():
    coll, props = pixel_event(
        {"collection": "opens", "prop.campaign": "xyz", "prop._time": "1704067200000", "other": "ignored"}
    )
    assert coll == "opens"
    assert props == {"campaign": "xyz", "_time": 1704067200000}


def test_pixel_ingest(collector):
    r = collector.pixel("p", {"collection": "opens", "prop.campaign": "summer"})
    assert r.stored == 1
    assert collector.store.read("p", "opens").collect()[0]["campaign"] == "summer"


# --- webhook source (S9) ----------------------------------------------------


def test_webhook_transform(collector):
    reg = TransformRegistry()
    reg.register_webhook(
        "p",
        "hook1",
        lambda qp, body, params, headers: {
            "collection": "github_stars",
            "properties": {"repo": json.loads(body)["repository"], "stars": json.loads(body)["count"]},
        },
    )
    r = collector.webhook("p", "hook1", reg, body=json.dumps({"repository": "x/y", "count": 5}))
    assert r.stored == 1
    row = collector.store.read("p", "github_stars").collect()[0]
    assert row["repo"] == "x/y"
    assert row["stars"] == 5.0


def test_webhook_drop(collector):
    reg = TransformRegistry()
    reg.register_webhook("p", "h", lambda qp, body, params, headers: None)
    assert collector.webhook("p", "h", reg, body="{}") is None


# --- custom event mapper (P6) ------------------------------------------------


def test_custom_mapper_adds_field_and_evolves(spark, warehouse):
    ms = Metastore(warehouse)
    reg = TransformRegistry()
    reg.register_event_mapper(
        "p", "add_double", lambda df, ctx: df.withColumn("doubled", F.col("x") * 2)
    )
    pipeline = EnrichmentPipeline([TimestampMapper(), CustomMapperStage(reg, "p")])
    collector = EventCollector(spark, ms, pipeline=pipeline)
    r = collector.collect("p", "c", {"x": 21})
    assert r.stored == 1
    # transform output registered via post-enrichment inference
    assert ms.project("p").collections["c"].fields["doubled"] == FieldType.DOUBLE
    assert collector.store.read("p", "c").collect()[0]["doubled"] == 42.0


# --- webhook sink (P7) --------------------------------------------------------


def test_webhook_sink_payload(spark):
    sent = []
    sink = WebhookSink("http://example/hook", sender=lambda url, payload: sent.append((url, payload)))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "x bigint, s string")
    n = sink.send_batch("clicks", df)
    assert n == 2
    assert len(sent) == 1
    doc = json.loads(sent[0][1])
    assert {a["collection"] for a in doc["activities"]} == {"clicks"}
    assert sorted(a["x"] for a in doc["activities"]) == [1, 2]
