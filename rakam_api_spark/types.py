"""FieldType system and name normalization.

Re-expresses the reference's 30-type FieldType enum — 10 scalars ×
{scalar, ARRAY_, MAP_}, arrays/maps one level deep, map keys always
STRING (reference rakam-spi/src/main/java/org/rakam/collection/
FieldType.java:6-73) — on Spark's type system, plus the field-name
normalization rules of ValidationUtil (reference rakam-spi/.../util/
ValidationUtil.java:97-139).

Departure from the reference: DECIMAL maps to DecimalType (the
reference degrades it to double in Avro, AvroUtil.java:208-210);
TIME has no Spark type and is carried as LongType millis-of-day with
a metadata tag.
"""

from __future__ import annotations

import re
import unicodedata
from enum import Enum

from pyspark.sql import types as T

TIME_METADATA = {"rakam.type": "TIME"}
DECIMAL_PRECISION = 38
DECIMAL_SCALE = 9


class FieldType(str, Enum):
    STRING = "STRING"
    INTEGER = "INTEGER"
    LONG = "LONG"
    DOUBLE = "DOUBLE"
    DECIMAL = "DECIMAL"
    BOOLEAN = "BOOLEAN"
    DATE = "DATE"
    TIME = "TIME"
    TIMESTAMP = "TIMESTAMP"
    BINARY = "BINARY"
    # ARRAY_/MAP_ variants are generated below
    ARRAY_STRING = "ARRAY_STRING"
    ARRAY_INTEGER = "ARRAY_INTEGER"
    ARRAY_LONG = "ARRAY_LONG"
    ARRAY_DOUBLE = "ARRAY_DOUBLE"
    ARRAY_DECIMAL = "ARRAY_DECIMAL"
    ARRAY_BOOLEAN = "ARRAY_BOOLEAN"
    ARRAY_DATE = "ARRAY_DATE"
    ARRAY_TIME = "ARRAY_TIME"
    ARRAY_TIMESTAMP = "ARRAY_TIMESTAMP"
    ARRAY_BINARY = "ARRAY_BINARY"
    MAP_STRING = "MAP_STRING"
    MAP_INTEGER = "MAP_INTEGER"
    MAP_LONG = "MAP_LONG"
    MAP_DOUBLE = "MAP_DOUBLE"
    MAP_DECIMAL = "MAP_DECIMAL"
    MAP_BOOLEAN = "MAP_BOOLEAN"
    MAP_DATE = "MAP_DATE"
    MAP_TIME = "MAP_TIME"
    MAP_TIMESTAMP = "MAP_TIMESTAMP"
    MAP_BINARY = "MAP_BINARY"

    @property
    def is_array(self) -> bool:
        return self.value.startswith("ARRAY_")

    @property
    def is_map(self) -> bool:
        return self.value.startswith("MAP_")

    @property
    def element(self) -> "FieldType":
        """Scalar element/value type (reference FieldType.getArrayElementType /
        getMapValueType via ordinal arithmetic, FieldType.java:30-73)."""
        if self.is_array:
            return FieldType(self.value[len("ARRAY_"):])
        if self.is_map:
            return FieldType(self.value[len("MAP_"):])
        return self

    def as_array(self) -> "FieldType":
        if self.is_array or self.is_map:
            raise ValueError(f"nested complex types unsupported: {self}")
        return FieldType(f"ARRAY_{self.value}")

    def as_map(self) -> "FieldType":
        if self.is_array or self.is_map:
            raise ValueError(f"nested complex types unsupported: {self}")
        return FieldType(f"MAP_{self.value}")


_SCALAR_SPARK: dict[FieldType, T.DataType] = {
    FieldType.STRING: T.StringType(),
    FieldType.INTEGER: T.IntegerType(),
    FieldType.LONG: T.LongType(),
    FieldType.DOUBLE: T.DoubleType(),
    FieldType.DECIMAL: T.DecimalType(DECIMAL_PRECISION, DECIMAL_SCALE),
    FieldType.BOOLEAN: T.BooleanType(),
    FieldType.DATE: T.DateType(),
    FieldType.TIME: T.LongType(),  # millis of day + metadata tag
    FieldType.TIMESTAMP: T.TimestampType(),
    FieldType.BINARY: T.BinaryType(),
}


def to_spark_type(ft: FieldType) -> T.DataType:
    if ft.is_array:
        return T.ArrayType(_SCALAR_SPARK[ft.element], containsNull=True)
    if ft.is_map:
        return T.MapType(T.StringType(), _SCALAR_SPARK[ft.element], valueContainsNull=True)
    return _SCALAR_SPARK[ft]


def to_struct_field(name: str, ft: FieldType, nullable: bool = True) -> T.StructField:
    """Every field nullable (reference Avro union(null, T),
    AvroUtil.java:94-96); TIME tagged via metadata."""
    meta = dict(TIME_METADATA) if ft.element == FieldType.TIME else {}
    return T.StructField(name, to_spark_type(ft), nullable=nullable, metadata=meta)


def from_spark_type(dt: T.DataType, metadata: dict | None = None) -> FieldType:
    metadata = metadata or {}
    if isinstance(dt, T.ArrayType):
        return from_spark_type(dt.elementType, metadata).as_array()
    if isinstance(dt, T.MapType):
        return from_spark_type(dt.valueType, metadata).as_map()
    if isinstance(dt, T.LongType):
        return FieldType.TIME if metadata.get("rakam.type") == "TIME" else FieldType.LONG
    if isinstance(dt, T.DecimalType):
        return FieldType.DECIMAL
    for ft, st in _SCALAR_SPARK.items():
        if ft is FieldType.TIME:
            continue
        if type(dt) is type(st):
            return ft
    raise ValueError(f"unsupported Spark type: {dt}")


# --- name normalization (reference ValidationUtil.stripName) ------------

_CAMEL_RE = re.compile(r"(?<=[a-z0-9])([A-Z])")
_NON_ASCII_RE = re.compile(r"[^\x00-\x7F]")
_INVALID_CHARS_RE = re.compile(r"[^a-z0-9_ ]")


class InvalidFieldName(ValueError):
    pass


def strip_name(name: str, kind: str = "field") -> str:
    """Normalize a client-supplied field name:

    - strip surrounding quotes and leading/trailing whitespace
      (ValidationUtil.java:99-110)
    - camelCase → snake_case, lowercase (ValidationUtil.java:113-127)
    - non-ASCII: retry after unicode-diacritic folding
      (JsonEventDeserializer.java:368-374); reject if still non-ASCII
    - interior spaces → underscores (reference test fixture
      'test1 naber abi' → 'test1_naber_abi')
    - must start with a letter or underscore; ≤255 chars
    """
    if name is None:
        raise InvalidFieldName(f"{kind} name is null")
    s = name.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in ("'", '"', "`"):
        s = s[1:-1].strip()
    if not s:
        raise InvalidFieldName(f"{kind} name is empty")
    if _NON_ASCII_RE.search(s):
        folded = unicodedata.normalize("NFKD", s).encode("ascii", "ignore").decode("ascii")
        if not folded or _NON_ASCII_RE.search(folded):
            raise InvalidFieldName(f"{kind} name must be ASCII: {name!r}")
        s = folded
    if "$" in s:
        # $-prefixed names are system-reserved ($server_time);
        # clients cannot declare them (SchemaChecker.java:27-55)
        raise InvalidFieldName(f"{kind} name may not contain '$': {name!r}")
    s = _CAMEL_RE.sub(lambda m: "_" + m.group(1), s).lower()
    s = s.replace("-", "_").replace(".", "_")
    s = re.sub(r"\s+", "_", s.strip())
    if _INVALID_CHARS_RE.search(s.replace("_", "")):
        s = re.sub(r"[^a-z0-9_]", "", s)
    if not s or not (s[0].isalpha() or s[0] == "_"):
        raise InvalidFieldName(f"invalid {kind} name: {name!r}")
    if len(s) > 255:
        s = s[:255]
    return s


def strip_collection_name(name: str) -> str:
    """Collection names: lowercased, ≤100 chars, non-empty
    (JsonEventDeserializer.java:247-252, ValidationUtil.java:51-59)."""
    if name is None:
        raise InvalidFieldName("collection name is null")
    s = name.strip().lower()
    if not s:
        raise InvalidFieldName("collection name is empty")
    if len(s) > 100:
        raise InvalidFieldName(f"collection name too long ({len(s)} > 100)")
    return s
