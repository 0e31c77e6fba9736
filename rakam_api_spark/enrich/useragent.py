"""P3: user-agent parsing.

Reference UserAgentEventMapper (mapper/rakam-mapper-website/.../
UserAgentEventMapper.java:62-120): trigger ``_user_agent`` (string,
or ``true`` ⇒ User-Agent header); adds ``_user_agent_family,
_user_agent_version, _device_family, _os, _os_version``; spider/bot
devices are rejected (403 in the reference → filtered out here).

Spark-first: the ua_parser regex corpus is not in this container, so
parsing is a compact built-in regex ruleset expressed as column
expressions (regexp_extract stays in codegen).  The ruleset covers
the dominant browser/OS families; production swaps in the full
uap-core regexes via a broadcast-joined rules table generated from
regexes.yaml.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..types import FieldType
from .pipeline import FieldDependency, Mapper

UA_FIELDS = {
    "_user_agent_family": FieldType.STRING,
    "_user_agent_version": FieldType.STRING,
    "_device_family": FieldType.STRING,
    "_os": FieldType.STRING,
    "_os_version": FieldType.STRING,
}

_BOT_RE = r"(?i)(bot|crawler|spider|slurp|curl|wget|python-requests)"


class UserAgentMapper(Mapper):
    name = "useragent"

    def __init__(self, drop_spiders: bool = True):
        self.drop_spiders = drop_spiders

    def dependency(self) -> FieldDependency:
        return FieldDependency(dependent_fields={"_user_agent": dict(UA_FIELDS)})

    def apply(self, df: DataFrame, ctx: dict) -> DataFrame:
        if "_user_agent" not in df.columns:
            return df
        ua_hdr = ctx.get("user_agent_header")
        ua = F.col("_user_agent").cast("string")
        if ua_hdr is not None:
            ua = F.when(F.lower(ua) == "true", F.lit(ua_hdr)).otherwise(ua)

        family = (
            F.when(ua.rlike(r"Edg/"), "Edge")
            .when(ua.rlike(r"OPR/|Opera"), "Opera")
            .when(ua.rlike(r"Chrome/"), "Chrome")
            .when(ua.rlike(r"Firefox/"), "Firefox")
            .when(ua.rlike(r"Safari/") & ua.rlike(r"Version/"), "Safari")
            .when(ua.rlike(r"MSIE |Trident/"), "IE")
            .otherwise("Other")
        )
        version = F.coalesce(
            F.nullif(F.regexp_extract(ua, r"Edg/(\d+[\.\d]*)", 1), F.lit("")),
            F.nullif(F.regexp_extract(ua, r"OPR/(\d+[\.\d]*)", 1), F.lit("")),
            F.nullif(F.regexp_extract(ua, r"Chrome/(\d+[\.\d]*)", 1), F.lit("")),
            F.nullif(F.regexp_extract(ua, r"Firefox/(\d+[\.\d]*)", 1), F.lit("")),
            F.nullif(F.regexp_extract(ua, r"Version/(\d+[\.\d]*)", 1), F.lit("")),
        )
        device = (
            F.when(ua.rlike(_BOT_RE), "Spider")
            .when(ua.rlike(r"iPhone"), "iPhone")
            .when(ua.rlike(r"iPad"), "iPad")
            .when(ua.rlike(r"Android"), "Android")
            .otherwise("Other")
        )
        os_family = (
            F.when(ua.rlike(r"Windows NT"), "Windows")
            .when(ua.rlike(r"Android"), "Android")
            .when(ua.rlike(r"iPhone OS|iPad; CPU OS"), "iOS")
            .when(ua.rlike(r"Mac OS X"), "Mac OS X")
            .when(ua.rlike(r"Linux"), "Linux")
            .otherwise("Other")
        )
        os_version = F.coalesce(
            F.nullif(F.regexp_extract(ua, r"Windows NT (\d+[\.\d]*)", 1), F.lit("")),
            F.nullif(F.regexp_extract(ua, r"Android (\d+[\.\d]*)", 1), F.lit("")),
            F.nullif(
                F.translate(F.regexp_extract(ua, r"OS (\d+[_\d]*)", 1), "_", "."), F.lit("")
            ),
            F.nullif(
                F.translate(F.regexp_extract(ua, r"Mac OS X (\d+[_\.\d]*)", 1), "_", "."),
                F.lit(""),
            ),
        )
        out = (
            df.withColumn("_user_agent_family", family)
            .withColumn("_user_agent_version", version)
            .withColumn("_device_family", device)
            .withColumn("_os", os_family)
            .withColumn("_os_version", os_version)
            .drop("_user_agent")
        )
        if self.drop_spiders:
            out = out.where(
                F.col("_device_family").isNull() | (F.col("_device_family") != "Spider")
            )
        return out
