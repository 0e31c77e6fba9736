"""Ingest layer: JSON/CSV/Avro parsing, type inference, coercion to
registered schemas, and dead-letter routing — the Spark
re-expression of the reference's deserializer pipeline
(rakam/.../collection/JsonEventDeserializer.java,
CsvEventDeserializer.java, AvroEventDeserializer.java).
"""

from .coerce import CoercionResult, coerce_to_schema
from .infer import infer_field_type, infer_new_fields

__all__ = ["CoercionResult", "coerce_to_schema", "infer_field_type", "infer_new_fields"]
