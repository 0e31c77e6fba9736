"""S6: Avro bulk loader with reader-schema projection.

Reference AvroEventDeserializer (rakam/.../collection/
AvroEventDeserializer.java:26-45): the upload carries a writer
schema; records are resolved against the catalog schema (reader
schema) — Avro schema resolution performs the projection.

Spark-first: ``spark.read.format("avro")`` with the ``avroSchema``
option replays exactly that reader-schema resolution when the
spark-avro module is on the classpath.  When it is not (this
container), the fallback is still fully distributed: files load via
the ``binaryFile`` source and decode inside ``mapInPandas`` with the
pure-Python codec in ``avro_codec`` — Arrow-batched, executor-side,
nothing ever decodes on the driver (the driver reads ONE file
header for schema discovery only).  Parallelism is per file, which
matches the workload: bulk uploads arrive as many request-sized
container files; a single multi-block file is decoded by one task
(binaryFile does not split), so gateways should roll files at
block-friendly sizes — documented here, not hidden.
"""

from __future__ import annotations

import io
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from . import avro_codec


class AvroUnavailable(RuntimeError):
    pass


def _avro_to_spark_type(t) -> T.DataType:
    if isinstance(t, list):  # union: nullable non-null branch
        non_null = [x for x in t if x != "null"]
        return _avro_to_spark_type(non_null[0]) if non_null else T.StringType()
    if isinstance(t, dict):
        lt = t.get("logicalType")
        if lt == "date":
            return T.DateType()
        if lt in ("timestamp-millis", "timestamp-micros"):
            return T.TimestampType()
        tt = t.get("type")
        if tt == "array":
            return T.ArrayType(_avro_to_spark_type(t["items"]))
        if tt == "map":
            return T.MapType(T.StringType(), _avro_to_spark_type(t["values"]))
        if tt == "enum":
            return T.StringType()
        if tt == "fixed":
            return T.BinaryType()
        if tt == "record":
            return T.StructType(
                [T.StructField(f["name"], _avro_to_spark_type(f["type"])) for f in t["fields"]]
            )
        return _avro_to_spark_type(tt)
    return {
        "null": T.StringType(),
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "bytes": T.BinaryType(),
        "string": T.StringType(),
    }.get(t, T.StringType())


def _record_schema_to_spark(schema: dict) -> T.StructType:
    if schema.get("type") != "record":
        raise AvroUnavailable("top-level Avro schema must be a record")
    return T.StructType(
        [T.StructField(f["name"], _avro_to_spark_type(f["type"])) for f in schema["fields"]]
    )


def read_avro(spark: SparkSession, path: str, reader_schema_json: str | None = None) -> DataFrame:
    """Read Avro container file(s), projecting onto reader_schema
    when given.  Native spark-avro when available; else the
    distributed binaryFile + mapInPandas codec path."""
    try:
        reader = spark.read.format("avro")
        if reader_schema_json:
            reader = reader.option("avroSchema", reader_schema_json)
        return reader.load(path)
    except Exception:  # data source not on classpath → codec path
        return _read_avro_distributed(spark, path, reader_schema_json)


def _read_avro_distributed(
    spark: SparkSession, path: str, reader_schema_json: str | None
) -> DataFrame:
    bin_df = spark.read.format("binaryFile").load(path)
    if reader_schema_json:
        target = json.loads(reader_schema_json)
    else:
        # schema discovery: ONE file header on the driver (bounded);
        # record bodies only ever decode on executors
        first = bin_df.select("content").limit(1).collect()
        if not first:
            raise AvroUnavailable(f"no Avro files at {path}")
        target, _, _ = avro_codec.read_container_header(io.BytesIO(bytes(first[0][0])))
    out_schema = _record_schema_to_spark(target)
    names = [f.name for f in out_schema.fields]
    reader_schema = json.loads(reader_schema_json) if reader_schema_json else None

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for content in pdf["content"]:
                recs = avro_codec.decode_container(bytes(content), reader_schema)
                if recs:
                    yield pd.DataFrame.from_records(recs, columns=names)

    return bin_df.select("content").mapInPandas(decode, schema=out_schema)


def decode_avro_records(blob: bytes, reader_schema_json: str | None = None) -> list[dict]:
    """Decode an in-memory Avro container (the reference's upload
    body) to records — gateway-side helper."""
    reader = json.loads(reader_schema_json) if reader_schema_json else None
    return avro_codec.decode_container(blob, reader)
