"""P5: anonymous user-id generation.

Reference UserIdEventMapper (mapper/rakam-mapper-website/.../
UserIdEventMapper.java:49-105,139-224): when ``_user`` is null,
reuse the ``_anonymous_user`` cookie if present, else generate —
UUID for STRING user type, Snowflake-style 64-bit id (41b time /
10b host / 12b sequence) for LONG/INTEGER.

Spark-first: uuid() for STRING; for numeric ids a deterministic-
per-row variant of the Snowflake layout built from the batch epoch
and a per-partition monotonic counter (monotonically_increasing_id
supplies the host/sequence bits — unique within a job, time-ordered
across jobs, no coordination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..types import FieldType
from .pipeline import FieldDependency, Mapper

RAKAM_EPOCH_MS = 1_482_278_400_000  # mirrors the reference's custom epoch idea


class UserIdMapper(Mapper):
    name = "userid"

    def __init__(self, user_type: FieldType = FieldType.STRING):
        self.user_type = user_type

    def dependency(self) -> FieldDependency:
        return FieldDependency(constant_fields={"_user": self.user_type})

    def apply(self, df: DataFrame, ctx: dict) -> DataFrame:
        existing = F.col("_user") if "_user" in df.columns else F.lit(None)
        anon = F.col("_anonymous_user") if "_anonymous_user" in df.columns else F.lit(None)
        if self.user_type == FieldType.STRING:
            gen = F.expr("uuid()")
            fallback = F.coalesce(existing.cast("string"), anon.cast("string"), gen)
        else:
            # snowflake-ish: 41 bits of ms since custom epoch << 22,
            # low 22 bits from the per-partition monotonic counter
            ms = (F.unix_millis(F.current_timestamp()) - F.lit(RAKAM_EPOCH_MS)).cast("long")
            seq = F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 22) - 1))
            gen = F.shiftleft(ms, 22) + seq
            fallback = F.coalesce(existing.cast("long"), anon.cast("long"), gen)
        out = df.withColumn("_user", fallback)
        if "_anonymous_user" in df.columns:
            out = out.drop("_anonymous_user")
        return out
