"""Coercion of parsed values to a registered schema, with
dead-letter routing.

Re-expresses the reference's lenient value coercion
(JsonEventDeserializer.getValue, rakam/.../collection/
JsonEventDeserializer.java:512-734) as a single deterministic
column-expression library — everything stays JVM-side in
whole-stage codegen; failures become rows in the ``$invalid_schema``
dead-letter table (JsonEventDeserializer.java:85-93,741-780) instead
of exceptions.

Lenient rules (per reference):
- string → int/long/double: empty string → null; else parsed
- "true"/"false" (any case) → boolean; numbers are NOT booleans
- number → timestamp: epoch millis; string → timestamp: ISO-8601
  and ``yyyy-M-d H:m[:s[.S]]``; strings ≤ 12 chars rejected
  (DateTimeUtils.java:76-78 — avoids 10-digit-number-as-date trap)
- scalar → ARRAY_X: singleton array
- stringified JSON array/map → re-parsed (from_json)
- strings truncated to ``max-string-length`` (default 100,
  ProjectConfig.java:17, applied JsonEventDeserializer.java:524-529)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..types import FieldType, from_spark_type

DEFAULT_MAX_STRING_LENGTH = 100

DEAD_LETTER_SCHEMA = T.StructType(
    [
        T.StructField("collection", T.StringType()),
        T.StructField("property", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("event_id", T.StringType()),
        T.StructField("error_message", T.StringType()),
        T.StructField("encoded_value", T.StringType()),
        T.StructField("_user", T.StringType()),
    ]
)

_TIME_RE = r"^(\d{1,2}):(\d{2})(?::(\d{2})(?:\.(\d{1,3}))?)?$"
_BASE64_RE = r"^[A-Za-z0-9+/=\s]*$"


def _is_complex(dt: T.DataType) -> bool:
    return isinstance(dt, (T.ArrayType, T.MapType, T.StructType))


def _scalar_coerce(col: Column, src: T.DataType, ft: FieldType, max_len: int) -> Column:
    """Coerce a scalar column to a scalar FieldType; unconvertible
    values become null (the caller flags them)."""
    target = {
        FieldType.STRING: "string",
        FieldType.INTEGER: "int",
        FieldType.LONG: "bigint",
        FieldType.DOUBLE: "double",
        FieldType.DECIMAL: "decimal(38,9)",
        FieldType.BOOLEAN: "boolean",
        FieldType.DATE: "date",
        FieldType.TIMESTAMP: "timestamp",
        FieldType.BINARY: "binary",
        FieldType.TIME: "bigint",
    }[ft]

    if ft == FieldType.STRING:
        if _is_complex(src):
            return F.substring(F.to_json(col), 1, max_len)
        if isinstance(src, T.BooleanType):
            return F.when(col, F.lit("true")).when(~col, F.lit("false"))
        return F.substring(col.cast("string"), 1, max_len)

    if isinstance(src, T.StringType):
        s = F.trim(col)
        empty_null = F.when(s == "", F.lit(None).cast("string")).otherwise(s)
        if ft in (FieldType.INTEGER, FieldType.LONG, FieldType.DOUBLE, FieldType.DECIMAL):
            return empty_null.try_cast(target)
        if ft == FieldType.BOOLEAN:
            low = F.lower(s)
            return F.when(low == "true", F.lit(True)).when(low == "false", F.lit(False))
        if ft == FieldType.TIMESTAMP:
            return F.when(F.length(s) > 12, s.try_cast("timestamp"))
        if ft == FieldType.DATE:
            return empty_null.try_cast("date")
        if ft == FieldType.TIME:
            h = F.regexp_extract(s, _TIME_RE, 1).try_cast("bigint")
            m = F.regexp_extract(s, _TIME_RE, 2).try_cast("bigint")
            sec = F.coalesce(F.regexp_extract(s, _TIME_RE, 3).try_cast("bigint"), F.lit(0))
            ms = F.coalesce(F.rpad(F.regexp_extract(s, _TIME_RE, 4), 3, "0").try_cast("bigint"), F.lit(0))
            millis = h * 3600000 + m * 60000 + sec * 1000 + ms
            return F.when(s.rlike(_TIME_RE) & (h < 24) & (m < 60) & (sec < 60), millis)
        if ft == FieldType.BINARY:
            return F.when(s.rlike(_BASE64_RE), F.unbase64(s))
        return F.lit(None).cast(target)

    if isinstance(src, T.BooleanType):
        # booleans only coerce to BOOLEAN/STRING (handled above)
        return col if ft == FieldType.BOOLEAN else F.lit(None).cast(target)

    if isinstance(src, (T.LongType, T.IntegerType, T.DoubleType, T.FloatType, T.DecimalType)):
        if ft == FieldType.TIMESTAMP:
            # reference: numeric timestamps are epoch millis
            return F.timestamp_millis(col.cast("bigint"))
        if ft == FieldType.BOOLEAN:
            return F.lit(None).cast("boolean")
        if ft == FieldType.DATE:
            return F.lit(None).cast("date")
        return col.try_cast(target)

    if isinstance(src, T.TimestampType) and ft == FieldType.DATE:
        return col.cast("date")
    if isinstance(src, T.DateType) and ft == FieldType.TIMESTAMP:
        return col.cast("timestamp")
    if isinstance(src, T.BinaryType) and ft == FieldType.BINARY:
        return col
    return col.try_cast(target)


def coerce_expr(col: Column, src: T.DataType, ft: FieldType, max_len: int = DEFAULT_MAX_STRING_LENGTH) -> Column:
    """Full coercion expression source type → FieldType (scalar,
    array, or map targets)."""
    if ft.is_array:
        elem_ft = ft.element
        elem_spark = {
            FieldType.STRING: "string",
            FieldType.INTEGER: "int",
            FieldType.LONG: "bigint",
            FieldType.DOUBLE: "double",
            FieldType.DECIMAL: "decimal(38,9)",
            FieldType.BOOLEAN: "boolean",
            FieldType.DATE: "date",
            FieldType.TIMESTAMP: "timestamp",
            FieldType.BINARY: "binary",
            FieldType.TIME: "bigint",
        }[elem_ft]
        if isinstance(src, T.ArrayType):
            return F.transform(col, lambda v: _scalar_coerce(v, src.elementType, elem_ft, max_len))
        if isinstance(src, T.StringType):
            # stringified JSON array → re-parse (reference re-parses
            # embedded JSON, JsonEventDeserializer.java:644-652)
            parsed = F.from_json(col, T.ArrayType(T.StringType()))
            reparsed = F.transform(parsed, lambda v: _scalar_coerce(v, T.StringType(), elem_ft, max_len))
            singleton = F.array(_scalar_coerce(col, src, elem_ft, max_len))
            return F.when(F.trim(col).startswith("["), reparsed).otherwise(singleton)
        if _is_complex(src):
            return F.from_json(F.to_json(col), f"array<{elem_spark}>")
        # scalar → singleton array (JsonEventDeserializer.java:661-668)
        return F.array(_scalar_coerce(col, src, elem_ft, max_len))

    if ft.is_map:
        elem_ft = ft.element
        elem_spark = {
            FieldType.STRING: "string",
            FieldType.INTEGER: "int",
            FieldType.LONG: "bigint",
            FieldType.DOUBLE: "double",
            FieldType.DECIMAL: "decimal(38,9)",
            FieldType.BOOLEAN: "boolean",
            FieldType.DATE: "date",
            FieldType.TIMESTAMP: "timestamp",
            FieldType.BINARY: "binary",
            FieldType.TIME: "bigint",
        }[elem_ft]
        if isinstance(src, T.StringType):
            return F.from_json(col, f"map<string,{elem_spark}>")
        if isinstance(src, T.StructType) and any(_is_complex(f.dataType) for f in src.fields):
            # one-level-only rule: complex member values are
            # JSON-encoded strings (JsonEventDeserializer.java:671,714)
            pairs = [
                (
                    F.lit(f.name),
                    F.to_json(col[f.name])
                    if _is_complex(f.dataType)
                    else _scalar_coerce(col[f.name], f.dataType, elem_ft, max_len),
                )
                for f in src.fields
            ]
            return F.map_from_arrays(F.array(*[p[0] for p in pairs]), F.array(*[p[1] for p in pairs]))
        if _is_complex(src):
            return F.from_json(F.to_json(col), f"map<string,{elem_spark}>")
        return F.lit(None).cast(f"map<string,{elem_spark}>")

    return _scalar_coerce(col, src, ft, max_len)


@dataclass
class CoercionResult:
    valid: DataFrame  # rows matching the registered schema
    dead_letter: DataFrame  # $invalid_schema rows


def coerce_to_schema(
    df: DataFrame,
    schema: T.StructType,
    collection: str,
    max_len: int = DEFAULT_MAX_STRING_LENGTH,
    event_id_col: str | None = None,
    keep_columns: tuple[str, ...] = (),
    bad_count_col: str | None = None,
) -> CoercionResult:
    """Project ``df`` (parsed with arbitrary inferred types) onto the
    registered schema.

    Values that were present but unconvertible become NULL in the
    valid output AND produce one dead-letter row each, tagged with
    property/type/original value — the reference's $invalid_schema
    contract (fields: JsonEventDeserializer.java:85-93).

    With ``bad_count_col`` the valid frame carries an extra INT
    column holding the per-row count of unconvertible fields (== the
    number of dead-letter rows the row produces).  Callers use it to
    meter dead-letter volume via ``Observation`` during the store
    write instead of a second counting pass over the batch.
    """
    src_types = {f.name: f.dataType for f in df.schema.fields}
    out_cols: list[Column] = []
    invalid_structs: list[Column] = []
    for fld in schema.fields:
        ft = from_spark_type(fld.dataType, dict(fld.metadata) if fld.metadata else None)
        if fld.name not in src_types:
            out_cols.append(F.lit(None).cast(fld.dataType).alias(fld.name))
            continue
        src_dt = src_types[fld.name]
        raw = F.col(f"`{fld.name}`")
        if isinstance(src_dt, T.NullType):
            out_cols.append(F.lit(None).cast(fld.dataType).alias(fld.name))
            continue
        coerced = coerce_expr(raw, src_dt, ft, max_len).cast(fld.dataType)
        out_cols.append(coerced.alias(fld.name))
        # invalid: source present, coercion lost it entirely — except
        # empty strings, which null out silently (reference
        # JsonEventDeserializer.java:531-537)
        encoded = F.to_json(F.struct(raw.alias("v"))) if _is_complex(src_dt) else raw.cast("string")
        present = raw.isNotNull()
        if isinstance(src_dt, T.StringType):
            present = present & (F.trim(raw) != "")
        invalid_structs.append(
            F.when(
                present & coerced.isNull(),
                F.struct(
                    F.lit(fld.name).alias("property"),
                    F.lit(ft.value).alias("type"),
                    encoded.alias("encoded_value"),
                ),
            )
        )

    eid = F.col(event_id_col).cast("string") if event_id_col else F.lit(None).cast("string")
    user = F.col("_user").cast("string") if "_user" in src_types else F.lit(None).cast("string")

    extra: list[Column] = []
    if bad_count_col is not None:
        n_bad = (
            F.size(F.array_compact(F.array(*invalid_structs)))
            if invalid_structs
            else F.lit(0)
        )
        extra.append(n_bad.cast("int").alias(bad_count_col))
    valid = df.select(
        *out_cols, *[F.col(c) for c in keep_columns if c in src_types], *extra
    )

    if invalid_structs:
        bad = df.select(
            eid.alias("event_id"),
            user.alias("_user"),
            F.array_compact(F.array(*invalid_structs)).alias("bad"),
        ).where(F.size("bad") > 0)
        dead = bad.select(
            F.lit(collection).alias("collection"),
            F.explode("bad").alias("b"),
            "event_id",
            "_user",
        ).select(
            "collection",
            F.col("b.property").alias("property"),
            F.col("b.type").alias("type"),
            "event_id",
            F.lit("cannot cast value to registered field type").alias("error_message"),
            F.col("b.encoded_value").alias("encoded_value"),
            "_user",
        )
    else:
        dead = df.sparkSession.createDataFrame([], DEAD_LETTER_SCHEMA)
    return CoercionResult(valid=valid, dead_letter=dead)
