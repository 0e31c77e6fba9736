"""S5: CSV bulk loader with header mapping.

Reference CsvEventDeserializer (rakam/.../collection/
CsvEventDeserializer.java:67-163): optional header row; header names
normalized and mapped onto the existing collection schema by name;
columns not in the schema are typed STRING; values coerced to the
registered target type; separator configurable.

Contract (reference TestCSVParser.java:26-74): with pre-declared
``price DOUBLE`` and header ``Transaction_date,Product,Price``, the
result schema is ``transaction_date STRING, product STRING,
price DOUBLE``.

Spark-first: ``spark.read.csv`` (header+sep options, distributed
parse) then the shared coercion library aligns types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..types import FieldType, strip_name


def read_csv(
    spark: SparkSession,
    path_or_df,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Read a CSV source and normalize header names (new columns stay
    StringType — the collector's inference then keeps them STRING
    because CSV carries no type information, matching the reference's
    new-CSV-columns-are-STRING rule)."""
    if isinstance(path_or_df, DataFrame):
        df = path_or_df
    else:
        df = (
            spark.read.option("header", str(header).lower())
            .option("sep", sep)
            .option("inferSchema", "false")  # CSV fields are STRING unless declared
            .csv(path_or_df)
        )
    renames = {}
    for c in df.columns:
        try:
            renames[c] = strip_name(c)
        except ValueError:
            renames[c] = c
    from pyspark.sql import functions as F

    return df.select([F.col(f"`{old}`").alias(new) for old, new in renames.items()])


def csv_field_types(df: DataFrame, known: dict[str, FieldType]) -> dict[str, FieldType]:
    """New CSV columns are STRING (CsvEventDeserializer header
    mapping rule); known columns keep their registered types."""
    return {c: FieldType.STRING for c in df.columns if c not in known}
