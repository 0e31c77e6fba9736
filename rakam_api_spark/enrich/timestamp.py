"""P1: timestamp attach + clock-skew correction.

Reference TimestampEventMapper (rakam-spi/.../plugin/
TimestampEventMapper.java:44-67): every collection gets a constant
``_time`` TIMESTAMP; a null ``_time`` becomes server time; when the
client supplied an ``upload_time``, ``_time`` is shifted by
(server_now − upload_time) to correct client clock skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..types import FieldType
from .pipeline import FieldDependency, Mapper


class TimestampMapper(Mapper):
    name = "timestamp"

    def dependency(self) -> FieldDependency:
        return FieldDependency(constant_fields={"_time": FieldType.TIMESTAMP})

    def apply(self, df: DataFrame, ctx: dict) -> DataFrame:
        now = ctx.get("server_time_expr", F.current_timestamp())
        if "_time" in df.columns:
            dt = dict(df.dtypes)["_time"]
            if dt in ("bigint", "int", "double", "float", "decimal"):
                # client numeric _time is epoch millis
                t = F.timestamp_millis(F.col("_time").cast("bigint"))
            elif dt == "string":
                t = F.col("_time").try_cast("timestamp")
            else:
                t = F.col("_time").cast("timestamp")
        else:
            t = F.lit(None).cast("timestamp")
        upload = ctx.get("upload_time_millis")  # per-request EventContext.uploadTime
        if upload is not None:
            skew = now.cast("double") - F.lit(upload / 1000.0)
            corrected = F.timestamp_seconds(t.cast("double") + skew)
            t = F.when(t.isNull(), now).otherwise(corrected)
        else:
            t = F.coalesce(t, now)
        # $server_time is always server-assigned; a client-sent value
        # is discarded (reserved field, SchemaChecker.java:27-55)
        return df.withColumn("_time", t).withColumn("$server_time", now)
