"""Loaders for the driver-generated test tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under
``{sf_dir}/{name}.parquet``.

The only tricky one is ``events``: its ``ts`` column is parquet
TIMESTAMP(NANOS, isAdjustedToUTC=false), which Spark cannot read
natively.  With ``spark.sql.legacy.parquet.nanosAsLong`` the column
arrives as a raw nanosecond LongType; we rebuild a TimestampNTZType
column with pure integer arithmetic (no session-timezone dependence,
so results compare bit-exactly against DuckDB's naive timestamps)
and keep ``ts_ns`` for epoch math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import configure_runtime

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_NS_PER_DAY = 86_400_000_000_000


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure_runtime(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ts (ns since epoch) -> timestamp_ntz, tz-independent:
        # date part from floor-div days, sub-day part from remainder
        # micros (truncation toward -inf matches DuckDB's ns->us).
        df = (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND,"
                    " cast((ts_ns - floor(ts_ns/86400000000000)*86400000000000)/1000 as long),"
                    " cast(date_from_unix_date(cast(floor(ts_ns/86400000000000) as int))"
                    "      as timestamp_ntz))"
                ),
            )
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
