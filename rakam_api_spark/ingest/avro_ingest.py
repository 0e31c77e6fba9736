"""S6: Avro bulk loader with reader-schema projection.

Reference AvroEventDeserializer (rakam/.../collection/
AvroEventDeserializer.java:26-45): the upload carries a writer
schema; records are resolved against the catalog schema (reader
schema) — Avro schema resolution performs the projection.

Spark-first: ``spark.read.format("avro")`` with the ``avroSchema``
option replays exactly that reader-schema resolution.  The avro
data source ships with Spark distributions as an external module;
when it is absent (as in this container) we fall back to decoding
with ``fastavro``/``avro`` if installed, else raise a clear error —
the call shape stays identical.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame, SparkSession


class AvroUnavailable(RuntimeError):
    pass


def read_avro(spark: SparkSession, path: str, reader_schema_json: str | None = None) -> DataFrame:
    """Read an Avro container file, projecting onto reader_schema
    when given."""
    try:
        reader = spark.read.format("avro")
        if reader_schema_json:
            reader = reader.option("avroSchema", reader_schema_json)
        return reader.load(path)
    except Exception as spark_err:  # data source not on classpath
        try:
            import fastavro  # type: ignore
        except ImportError:
            raise AvroUnavailable(
                "spark-avro is not on the classpath and fastavro is not installed; "
                "add org.apache.spark:spark-avro to spark.jars.packages"
            ) from spark_err
        with open(path, "rb") as f:
            records = list(fastavro.reader(f))
        rdd = spark.sparkContext.parallelize([__import__("json").dumps(r, default=str) for r in records])
        return spark.read.json(rdd)


def decode_avro_records(blob: bytes) -> list[dict]:
    """Decode an in-memory Avro container (the reference's upload
    body) to records — gateway-side helper."""
    try:
        import fastavro  # type: ignore
    except ImportError:
        raise AvroUnavailable("fastavro not installed") from None
    return list(fastavro.reader(io.BytesIO(blob)))
