"""Multimodal column plumbing: BinaryType payloads, mapInPandas
decode/featurize batch shapes, resize/frame-sample stages, and the
strict-mode codec gate (SURVEY.md §2 extensions / BASELINE.json
north star)."""

import pytest

from pyspark.sql import functions as F

from rakam_api_spark.llm.multimodal import (
    FEATURE_SCHEMA,
    decode_and_featurize,
    frame_sample_stub,
    resize_stub,
    synthesize_media,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, SF).cache()


def test_media_schema_and_types(media):
    dt = dict(media.dtypes)
    assert dt["payload"] == "binary"
    assert dt["meta"] == "map<string,string>"
    assert set(
        r["media_type"] for r in media.select("media_type").distinct().collect()
    ) == {"image", "audio", "video"}


def test_decode_featurize_deterministic(media):
    out = decode_and_featurize(media, dim=8)
    assert out.schema == FEATURE_SCHEMA
    rows = {r["asset_id"]: r for r in out.collect()}
    again = {r["asset_id"]: r for r in decode_and_featurize(media, dim=8).collect()}
    assert rows.keys() == again.keys()
    some = next(iter(rows))
    assert rows[some]["feature"] == again[some]["feature"]  # deterministic stub
    assert len(rows[some]["feature"]) == 8
    assert all(0.0 <= x <= 1.0 for x in rows[some]["feature"])
    # byte_len matches the source payload length
    src = {r["asset_id"]: len(r["payload"]) for r in media.collect()}
    assert all(rows[a]["byte_len"] == n for a, n in src.items())


def test_decode_strict_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|codecs unavailable"):
        decode_and_featurize(media, strict=True).collect()


def test_resize_records_dims(media):
    out = resize_stub(media, width=64, height=48)
    r = out.select("meta").first()["meta"]
    assert r["resize"] == "64x48"
    # payload untouched
    assert out.select(F.sum(F.octet_length("payload"))).first()[0] == media.select(
        F.sum(F.octet_length("payload"))
    ).first()[0]


def test_frame_sample_video_only(media):
    frames = frame_sample_stub(media, every_n=30)
    vids = {r["asset_id"] for r in media.where("media_type = 'video'").collect()}
    got = frames.collect()
    assert {r["asset_id"] for r in got} <= vids
    assert all(r["frame_no"] % 30 == 0 for r in got)
    # payload column is pruned from the exploded rows
    assert "payload" not in frames.columns
