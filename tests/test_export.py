"""Query-result export (CSV/Avro) — mirrors reference
ExportUtil.exportAsCSV / exportAsAvro semantics
(rakam/src/main/java/org/rakam/util/ExportUtil.java:31-76)."""

from __future__ import annotations

import base64
import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rakam_api_spark.export import (
    ExportTooLarge,
    export_avro,
    export_csv,
    export_query_result_json,
    write_csv_dir,
    write_json_dir,
)
from rakam_api_spark.ingest.avro_codec import decode_container


def _result_df(spark):
    schema = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("ratio", T.DoubleType()),
            T.StructField("ok", T.BooleanType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("blob", T.BinaryType()),
            T.StructField("day", T.DateType()),
        ]
    )
    rows = [
        ("alpha", 3, 0.5, True, ["x", "y"], b"\x00\x01", datetime.date(2024, 1, 2)),
        ('quo"te', None, None, False, None, None, None),
    ]
    return spark.createDataFrame(rows, schema)


class TestExportCsv:
    def test_non_numeric_quoting_and_encodings(self, spark):
        out = export_csv(_result_df(spark)).decode("utf-8")
        lines = out.split("\r\n")
        assert lines[0] == '"name","n","ratio","ok","tags","blob","day"'
        # numbers bare; strings/bools/dates quoted; array JSON-encoded;
        # binary base64 (ExportUtil.java:41-45)
        assert lines[1] == '"alpha",3,0.5,"true","[""x"",""y""]","AAE=","2024-01-02"'
        # nulls render empty; internal quote doubled
        assert lines[2] == '"quo""te",,,"false",,,'

    def test_row_cap(self, spark):
        df = spark.range(10).select(F.col("id"))
        with pytest.raises(ExportTooLarge):
            export_csv(df, max_rows=5)

    def test_distributed_dir(self, spark, tmp_path):
        p = str(tmp_path / "csvdir")
        write_csv_dir(spark.range(100).select(F.col("id")), p)
        back = spark.read.option("header", "true").csv(p)
        assert back.count() == 100


class TestExportAvro:
    def test_roundtrip_through_codec(self, spark):
        df = _result_df(spark)
        blob = export_avro(df)
        records = decode_container(blob)
        assert len(records) == 2
        assert records[0]["name"] == "alpha"
        assert records[0]["n"] == 3
        assert records[0]["tags"] == ["x", "y"]
        assert records[0]["blob"] == b"\x00\x01"
        assert records[0]["day"] == "2024-01-02"  # ISO text, ["null",T] union
        assert records[1]["n"] is None and records[1]["tags"] is None

    def test_deflate_codec(self, spark):
        df = _result_df(spark)
        blob = export_avro(df, codec="deflate")
        assert decode_container(blob)[0]["name"] == "alpha"

    def test_row_cap(self, spark):
        with pytest.raises(ExportTooLarge):
            export_avro(spark.range(10), max_rows=3)


class TestExportQueryResultJson:
    def test_envelope_shape_and_cells(self, spark):
        import json as _json

        df = _result_df(spark)
        out = _json.loads(export_query_result_json(df, properties={"totalResult": 2}))
        # reference QueryResult envelope: metadata (name+FieldType),
        # result as positional row arrays, optional properties
        assert [m["name"] for m in out["metadata"]] == [
            "name", "n", "ratio", "ok", "tags", "blob", "day",
        ]
        types = {m["name"]: m["type"] for m in out["metadata"]}
        assert types["n"] == "LONG" and types["ratio"] == "DOUBLE"
        assert types["tags"] == "ARRAY_STRING" and types["day"] == "DATE"
        r0, r1 = out["result"]
        assert r0[0] == "alpha" and r0[1] == 3 and r0[3] is True
        assert r0[4] == ["x", "y"]
        assert r0[5] == base64.b64encode(b"\x00\x01").decode()
        assert r0[6] == "2024-01-02"  # ISO date string
        assert r1[1] is None and r1[4] is None
        assert out["properties"] == {"totalResult": 2}

    def test_row_cap_and_dir_roundtrip(self, spark, tmp_path):
        with pytest.raises(ExportTooLarge):
            export_query_result_json(spark.range(10), max_rows=3)
        df = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("x"))
        p = str(tmp_path / "nd")
        write_json_dir(df, p)
        back = spark.read.json(p)
        assert back.count() == 100
        assert {r["x"] for r in back.collect()} == {2 * i for i in range(100)}
