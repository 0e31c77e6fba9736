"""P2: GeoIP enrichment as a broadcast range join.

Reference MaxmindGeoIPEventMapper (mapper/rakam-mapper-geoip-
maxmind/.../MaxmindGeoIPEventMapper.java:165-222,273-290): trigger
column ``_ip``; adds ``_country_code, _region, _city, _latitude,
_longitude, _timezone`` (attributes configurable) and stores the
resolved ip under ``__ip``.

Spark-first design: instead of a per-row mmdb lookup UDF, the ip
ranges live in a *dimension table* (start_ip_int, end_ip_int,
attrs…) that is broadcast and range-joined — the lookup stays
JVM-side and scales with executors.  The mmdb file itself is not
available in this container, so the default dimension is a small
deterministic built-in table with the same shape; production swaps
in a real ranges parquet (e.g. exported from GeoLite2) via
``ranges_df``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..types import FieldType
from .pipeline import FieldDependency, Mapper

GEO_FIELDS = {
    "__ip": FieldType.STRING,
    "_country_code": FieldType.STRING,
    "_region": FieldType.STRING,
    "_city": FieldType.STRING,
    "_latitude": FieldType.DOUBLE,
    "_longitude": FieldType.DOUBLE,
    "_timezone": FieldType.STRING,
}

# Built-in demo ranges (start, end as dotted quads) — deterministic
# stand-in for a GeoLite2 export.
_DEFAULT_RANGES = [
    ("1.0.0.0", "1.255.255.255", "AU", "NSW", "Sydney", -33.86, 151.20, "Australia/Sydney"),
    ("24.0.0.0", "24.255.255.255", "US", "CA", "San Francisco", 37.77, -122.41, "America/Los_Angeles"),
    ("81.0.0.0", "81.255.255.255", "DE", "BE", "Berlin", 52.52, 13.40, "Europe/Berlin"),
    ("101.0.0.0", "101.255.255.255", "CN", "SH", "Shanghai", 31.23, 121.47, "Asia/Shanghai"),
    ("186.0.0.0", "186.255.255.255", "BR", "SP", "Sao Paulo", -23.55, -46.63, "America/Sao_Paulo"),
]


def ip_to_long(col):
    """Dotted-quad string → 32-bit integer, NULL for invalid — pure
    column expression."""
    octets = F.split(col, r"\.")
    valid = col.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    nums = [F.element_at(octets, i + 1).cast("long") for i in range(4)]
    in_range = (nums[0] <= 255) & (nums[1] <= 255) & (nums[2] <= 255) & (nums[3] <= 255)
    val = nums[0] * 16777216 + nums[1] * 65536 + nums[2] * 256 + nums[3]
    return F.when(valid & in_range, val)


def default_ranges(spark: SparkSession) -> DataFrame:
    df = spark.createDataFrame(
        _DEFAULT_RANGES,
        "start_ip string, end_ip string, _country_code string, _region string, _city string, "
        "_latitude double, _longitude double, _timezone string",
    )
    return df.select(
        ip_to_long(F.col("start_ip")).alias("start_n"),
        ip_to_long(F.col("end_ip")).alias("end_n"),
        *[c for c in df.columns if c.startswith("_")],
    )


class GeoIPMapper(Mapper):
    name = "geoip"

    def __init__(self, ranges_df: DataFrame | None = None):
        self.ranges_df = ranges_df

    def dependency(self) -> FieldDependency:
        return FieldDependency(dependent_fields={"_ip": dict(GEO_FIELDS)})

    def apply(self, df: DataFrame, ctx: dict) -> DataFrame:
        if "_ip" not in df.columns:
            return df
        ranges = self.ranges_df if self.ranges_df is not None else default_ranges(df.sparkSession)
        # resolve trigger: string ip, or boolean true ⇒ request source
        # address from context (reference: X-Forwarded-For / socket)
        src_addr = ctx.get("source_address")
        ip_raw = F.col("_ip").cast("string")
        if src_addr is not None:
            ip_raw = F.when(F.lower(ip_raw) == "true", F.lit(src_addr)).otherwise(ip_raw)
        enriched = df.withColumn("__ip", ip_raw).withColumn("_ip_n", ip_to_long(F.col("__ip")))
        # broadcast range join: ranges are few (GeoLite2 ~3M rows —
        # still broadcastable at ~100MB; else bucket by /8 prefix)
        joined = enriched.join(
            broadcast(ranges),
            (F.col("_ip_n") >= F.col("start_n")) & (F.col("_ip_n") <= F.col("end_n")),
            "left",
        ).drop("_ip_n", "start_n", "end_n", "_ip")
        return joined
