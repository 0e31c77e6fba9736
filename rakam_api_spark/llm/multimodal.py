"""Multimodal column handling: image/audio/video as opaque BINARY
columns with typed metadata, plus the decode / feature-extract /
resize / frame-sample stages as Arrow-batched Pandas UDFs over
``mapInPandas``.

The actual media codecs are NOT present in this environment, so the
decode kernels are stubbed (deterministic fake decoder keyed off the
payload hash, or ``NotImplementedError`` when ``strict=True``); the
Spark-side plumbing — schema, partition sizing, UDF signatures,
Arrow batch shape — is real and tested (tests/test_multimodal.py).

Scale design: media payloads are large, so every plan here keeps
binary columns out of shuffles — metadata is projected first
(column pruning drops the blob at the parquet scan when only
metadata is referenced), and per-row kernels run mapInPandas with
``spark.sql.files.maxPartitionBytes`` sizing the input splits.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import load_table

# Canonical multimodal schema: one row per asset.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),  # opaque encoded bytes
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a media table from the documents corpus: text bytes as
    the opaque payload (stand-in for encoded media), typed metadata
    derived from the row.  Demonstrates the BinaryType column path
    end to end with real data."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int")).alias(
            "media_type"
        ),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")).alias("meta"),
    )


def decode_and_featurize(media: DataFrame, strict: bool = False, dim: int = 8) -> DataFrame:
    """Decode + feature-extract stage as mapInPandas.

    STUB DECODER: real image/audio decoding libs are not available
    in this container.  The fake decoder derives a deterministic
    feature vector from the payload's sha256 — the Arrow batch
    plumbing, schema, and partition behavior are exactly what a real
    kernel would use (swap ``_fake_decode`` for PIL/librosa).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media codecs unavailable in this environment; "
                    "install PIL/librosa/av and replace the stub decoder"
                )
            out = {
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "byte_len": pdf["payload"].map(len).astype("int64"),
                "sha": pdf["payload"].map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
            }
            feats = []
            for b in pdf["payload"]:
                digest = hashlib.sha256(bytes(b)).digest()
                feats.append([float(digest[i]) / 255.0 for i in range(dim)])
            out["feature"] = feats
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize stage stub: passes payload through, records requested
    dims in metadata (a real kernel decodes/resizes/re-encodes in
    the same mapInPandas shape)."""
    return media.withColumn(
        "meta",
        F.map_concat(
            "meta",
            F.create_map(
                F.lit("resize"), F.concat_ws("x", F.lit(width), F.lit(height))
            ),
        ),
    )


def frame_sample_stub(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling stage stub for video rows: emits one synthetic
    frame-reference row per sampled frame index (a real kernel
    yields decoded frames).  Keeps payload out of the exploded rows
    — only (asset_id, frame_no) travel."""
    n_frames = (F.octet_length("payload") % 120 + 1).cast("int")
    return (
        media.where(F.col("media_type") == "video")
        .select(
            "asset_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_no"),
        )
    )


def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata rollup over the opaque payload column — the query
    shape of a media-corpus inventory (oracle-checkable: byte
    lengths and sha256 are engine-independent)."""
    media = synthesize_media(spark, sf_dir)
    return (
        media.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum(F.octet_length("payload")).alias("total_bytes"),
            F.min(F.sha2(F.col("payload"), 256)).alias("min_sha256"),
        )
        .orderBy("media_type")
    )


MULTIMODAL_BYTE_STATS_ORACLE = """
WITH media AS (
  SELECT doc_id AS asset_id,
         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
         encode(text) AS payload,
         text
  FROM documents
)
SELECT media_type, CAST(COUNT(*) AS BIGINT) AS n_assets,
       CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
       -- sha256(blob) is unsupported in DuckDB; payload bytes are the
       -- utf-8 encoding of text, so sha256(text) hashes identical bytes
       MIN(sha256(text)) AS min_sha256
FROM media GROUP BY 1
"""


QUERIES = {
    "multimodal_byte_stats": multimodal_byte_stats,
}

ORACLES = {
    "multimodal_byte_stats": MULTIMODAL_BYTE_STATS_ORACLE,
}
