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


# Bucket granularity for the prefix equi-join: /16 ⇒ 65536 addresses
# per bucket.  A GeoLite2-size dim (~3M mostly-/24-or-smaller ranges)
# explodes to only slightly more rows; the widest realistic range (a
# /8) explodes into 256 bucket rows.
PREFIX_BITS = 16


def bucketed_ranges(ranges: DataFrame) -> DataFrame:
    """Explode each (start_n, end_n) range into one row per /16 prefix
    bucket it covers.  Done once on the dim side, so the per-event
    lookup becomes a hash equi-join on ``bucket`` instead of an
    O(|ranges|)-per-row nested-loop scan."""
    shift = 32 - PREFIX_BITS
    return ranges.withColumn(
        "bucket",
        F.explode(F.sequence(F.shiftright(F.col("start_n"), shift), F.shiftright(F.col("end_n"), shift))),
    )


class GeoIPMapper(Mapper):
    name = "geoip"

    def __init__(self, ranges_df: DataFrame | None = None, broadcast_dim: bool | None = None):
        """``ranges_df``: (start_n, end_n, attrs…) dimension; ranges are
        assumed disjoint (GeoLite2 exports are).  ``broadcast_dim``:
        force/forbid broadcasting the exploded dim; default broadcasts
        only the tiny built-in demo table and lets Catalyst/AQE pick
        the strategy for caller-supplied dims (a GeoLite2-size dim
        shuffles both sides on ``bucket`` — an equi-join, never a
        BroadcastNestedLoopJoin)."""
        self.ranges_df = ranges_df
        self.broadcast_dim = broadcast_dim

    def dependency(self) -> FieldDependency:
        return FieldDependency(dependent_fields={"_ip": dict(GEO_FIELDS)})

    def apply(self, df: DataFrame, ctx: dict) -> DataFrame:
        if "_ip" not in df.columns:
            return df
        if self.ranges_df is not None:
            ranges, do_broadcast = self.ranges_df, self.broadcast_dim
        else:
            ranges = default_ranges(df.sparkSession)
            do_broadcast = True if self.broadcast_dim is None else self.broadcast_dim
        # resolve trigger: string ip, or boolean true ⇒ request source
        # address from context (reference: X-Forwarded-For / socket)
        src_addr = ctx.get("source_address")
        ip_raw = F.col("_ip").cast("string")
        if src_addr is not None:
            ip_raw = F.when(F.lower(ip_raw) == "true", F.lit(src_addr)).otherwise(ip_raw)
        enriched = (
            df.withColumn("__ip", ip_raw)
            .withColumn("_ip_n", ip_to_long(F.col("__ip")))
            .withColumn("_ip_b", F.shiftright(F.col("_ip_n"), 32 - PREFIX_BITS))
        )
        dim = bucketed_ranges(ranges)
        if do_broadcast:
            dim = broadcast(dim)
        elif do_broadcast is False:
            dim = dim.hint("shuffle_hash")
        # equi-join on the prefix bucket with the range bounds as a
        # residual predicate: hash lookup per event row, in-bucket
        # range filter — O(1) per row vs the old O(|ranges|) BNLJ.
        joined = enriched.join(
            dim,
            (F.col("_ip_b") == F.col("bucket"))
            & (F.col("_ip_n") >= F.col("start_n"))
            & (F.col("_ip_n") <= F.col("end_n")),
            "left",
        ).drop("_ip_n", "_ip_b", "bucket", "start_n", "end_n", "_ip")
        return joined
