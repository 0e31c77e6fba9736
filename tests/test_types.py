"""Type system + name normalization contract tests (mirrors the
reference's TestMetastore casing assertions and ValidationUtil
semantics)."""

import pytest

from pyspark.sql import types as T

from rakam_api_spark.types import (
    FieldType,
    InvalidFieldName,
    from_spark_type,
    strip_collection_name,
    strip_name,
    to_spark_type,
)


def test_thirty_types():
    assert len(FieldType) == 30


def test_array_map_roundtrip():
    assert FieldType.DOUBLE.as_array() == FieldType.ARRAY_DOUBLE
    assert FieldType.STRING.as_map() == FieldType.MAP_STRING
    assert FieldType.ARRAY_DOUBLE.element == FieldType.DOUBLE
    assert FieldType.MAP_BOOLEAN.element == FieldType.BOOLEAN
    with pytest.raises(ValueError):
        FieldType.ARRAY_DOUBLE.as_array()  # one level deep only


def test_spark_mapping():
    assert to_spark_type(FieldType.STRING) == T.StringType()
    assert to_spark_type(FieldType.ARRAY_LONG) == T.ArrayType(T.LongType(), True)
    assert to_spark_type(FieldType.MAP_DOUBLE) == T.MapType(T.StringType(), T.DoubleType(), True)
    # TIME is LongType + metadata tag
    assert to_spark_type(FieldType.TIME) == T.LongType()
    assert from_spark_type(T.LongType(), {"rakam.type": "TIME"}) == FieldType.TIME
    assert from_spark_type(T.LongType()) == FieldType.LONG
    assert from_spark_type(T.ArrayType(T.StringType())) == FieldType.ARRAY_STRING


def test_strip_name_camel_case():
    assert strip_name("campaignSource") == "campaign_source"
    assert strip_name("Transaction_date") == "transaction_date"
    assert strip_name("  spaced out  ") == "spaced_out"
    assert strip_name("test1 naber abi") == "test1_naber_abi"
    assert strip_name('"quoted"') == "quoted"


def test_strip_name_diacritics():
    # reference retries after unicode folding
    assert strip_name("çamil") == "camil"
    assert strip_name("tëst") == "test"


def test_strip_name_rejects():
    with pytest.raises(InvalidFieldName):
        strip_name("")
    with pytest.raises(InvalidFieldName):
        strip_name("   ")
    with pytest.raises(InvalidFieldName):
        strip_name("中文字段")  # no ASCII fold available


def test_collection_name():
    assert strip_collection_name("PageView") == "pageview"
    with pytest.raises(InvalidFieldName):
        strip_collection_name("x" * 101)
    with pytest.raises(InvalidFieldName):
        strip_collection_name("")
