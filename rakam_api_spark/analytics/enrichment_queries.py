"""Oracle-gated queries exercising the enrichment pipeline (P1-P4).

Each query synthesizes the mapper's trigger column (``_ip``,
``_user_agent``, ``_referrer``, ``_time``) deterministically from
``events`` columns, runs the REAL mapper implementation from
``rakam_api_spark.enrich``, and aggregates the enriched output so a
DuckDB oracle can replicate the result with plain ANSI SQL.  This is
the correctness gate for the reference's mapper semantics
(MaxmindGeoIPEventMapper.java:165-222, UserAgentEventMapper.java:62-120,
ReferrerEventMapper.java:46-131, TimestampEventMapper.java:44-58)
rather than a unit test — the whole enrich->aggregate plan runs on
Spark and must hash-match.

Scale: every mapper is a narrow transform or broadcast join, so these
plans add zero extra shuffles over their terminal groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..enrich.geoip import GeoIPMapper
from ..enrich.pipeline import EnrichmentPipeline
from ..enrich.referrer import ReferrerMapper
from ..enrich.timestamp import TimestampMapper
from ..enrich.useragent import UserAgentMapper
from ..tables import load_table

DEC = "decimal(18,6)"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --- P2: GeoIP range join ------------------------------------------------

_IP_OCTET1 = ("1", "24", "81", "101", "186", "9")  # "9" hits no range -> NULL geo


def _with_ip(ev: DataFrame) -> DataFrame:
    """Deterministic dotted-quad `_ip` derived from event_id; octet 1
    selects one of 6 /8 blocks, 5 of which exist in the default geo
    dimension."""
    o1 = F.element_at(
        F.array(*[F.lit(x) for x in _IP_OCTET1]), (F.col("event_id") % 6 + 1).cast("int")
    )
    return ev.withColumn(
        "_ip",
        F.concat_ws(
            ".",
            o1,
            (F.col("event_id") % 256).cast("string"),
            F.expr("event_id div 7 % 256").cast("string"),
            (F.col("event_id") % 251).cast("string"),
        ),
    )


def enrich_geoip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _with_ip(_events(spark, sf_dir).select("event_id", "user_id", "value"))
    out = GeoIPMapper().apply(ev, {})
    return out.groupBy("_country_code", "_city").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
    )


ENRICH_GEOIP_ORACLE = """
WITH ev AS (
  SELECT user_id, value,
         CAST(CASE CAST(event_id % 6 AS INT)
            WHEN 0 THEN 1 WHEN 1 THEN 24 WHEN 2 THEN 81
            WHEN 3 THEN 101 WHEN 4 THEN 186 ELSE 9 END AS BIGINT) * 16777216
         + (event_id % 256) * 65536
         + ((event_id // 7) % 256) * 256
         + (event_id % 251) AS ip_n
  FROM events
), dim(o1, cc, city) AS (
  VALUES (1,'AU','Sydney'), (24,'US','San Francisco'), (81,'DE','Berlin'),
         (101,'CN','Shanghai'), (186,'BR','Sao Paulo')
)
SELECT cc AS _country_code, city AS _city,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM ev LEFT JOIN dim
  ON ev.ip_n BETWEEN CAST(o1 AS BIGINT) * 16777216 AND (CAST(o1 AS BIGINT) + 1) * 16777216 - 1
GROUP BY 1, 2
"""


# --- P3: user-agent parse + spider filter --------------------------------

_UA_CHROME = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36"
    " (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36"
)
_UA_FIREFOX = "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/115.0"
_UA_IPHONE = (
    "Mozilla/5.0 (iPhone; CPU iPhone OS 16_5 like Mac OS X) AppleWebKit/605.1.15"
    " (KHTML, like Gecko) Version/16.5 Mobile/15E148 Safari/604.1"
)
_UA_EDGE = _UA_CHROME + " Edg/120.0.2210.91"
_UA_BOT = "curl/8.4.0"


def _with_ua(ev: DataFrame) -> DataFrame:
    ua = (
        F.when(F.col("event_type") == "click", _UA_CHROME)
        .when(F.col("event_type") == "view", _UA_FIREFOX)
        .when(F.col("event_type") == "signup", _UA_IPHONE)
        .when(F.col("event_type") == "purchase", _UA_EDGE)
        .otherwise(_UA_BOT)  # 'error' events look like bots -> filtered
    )
    return ev.withColumn("_user_agent", ua)


def enrich_useragent(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _with_ua(_events(spark, sf_dir).select("event_id", "event_type"))
    out = UserAgentMapper().apply(ev, {})
    return out.groupBy(
        "_user_agent_family", "_user_agent_version", "_device_family", "_os", "_os_version"
    ).agg(F.count(F.lit(1)).alias("n_events"))


ENRICH_UA_ORACLE = """
SELECT CASE event_type WHEN 'click' THEN 'Chrome' WHEN 'view' THEN 'Firefox'
            WHEN 'signup' THEN 'Safari' ELSE 'Edge' END AS _user_agent_family,
       CASE event_type WHEN 'click' THEN '120.0.0.0' WHEN 'view' THEN '115.0'
            WHEN 'signup' THEN '16.5' ELSE '120.0.2210.91' END AS _user_agent_version,
       CASE event_type WHEN 'signup' THEN 'iPhone' ELSE 'Other' END AS _device_family,
       CASE event_type WHEN 'view' THEN 'Linux' WHEN 'signup' THEN 'iOS'
            ELSE 'Windows' END AS _os,
       CASE event_type WHEN 'view' THEN NULL WHEN 'signup' THEN '16.5'
            ELSE '10.0' END AS _os_version,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
WHERE event_type <> 'error'
GROUP BY 1, 2, 3, 4, 5
"""


# --- P4: referrer classification -----------------------------------------

_REFS = (
    "https://www.google.com/search?q=spark+analytics",  # search engine
    "https://t.co/AbC123",  # social shortener
    "https://blog.partner.example/posts/9?ref=newsletter",  # unknown medium
    "https://app.internal.example/dash",  # == _host -> internal
)


def _with_referrer(ev: DataFrame) -> DataFrame:
    r = F.col("event_id") % 5
    ref = (
        F.when(r == 0, _REFS[0])
        .when(r == 1, _REFS[1])
        .when(r == 2, _REFS[2])
        .when(r == 3, _REFS[3])  # r == 4 -> NULL referrer
    )
    return ev.withColumn("_referrer", ref).withColumn("_host", F.lit("app.internal.example"))


def enrich_referrer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _with_referrer(_events(spark, sf_dir).select("event_id"))
    out = ReferrerMapper().apply(ev, {})
    return out.groupBy(
        "_referrer_medium", "_referrer_source", "_referrer_term", "_referrer_domain", "_referrer_path"
    ).agg(F.count(F.lit(1)).alias("n_events"))


ENRICH_REFERRER_ORACLE = """
SELECT CASE CAST(event_id % 5 AS INT)
         WHEN 0 THEN 'search' WHEN 1 THEN 'social' WHEN 2 THEN 'unknown'
         WHEN 3 THEN 'internal' ELSE 'unknown' END AS _referrer_medium,
       CASE CAST(event_id % 5 AS INT)
         WHEN 0 THEN 'Google' WHEN 1 THEN 'Twitter' END AS _referrer_source,
       CASE CAST(event_id % 5 AS INT)
         WHEN 0 THEN 'spark+analytics' END AS _referrer_term,
       CASE CAST(event_id % 5 AS INT)
         WHEN 0 THEN 'www.google.com' WHEN 1 THEN 't.co'
         WHEN 2 THEN 'blog.partner.example' END AS _referrer_domain,
       CASE CAST(event_id % 5 AS INT)
         WHEN 0 THEN '/search' WHEN 1 THEN '/AbC123'
         WHEN 2 THEN '/posts/9' END AS _referrer_path,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY 1, 2, 3, 4, 5
"""


# --- P1: timestamp attach + clock-skew correction ------------------------

_SERVER_TS = "2024-02-15 12:00:00"
_SERVER_EPOCH_S = 1_707_998_400  # 2024-02-15T12:00:00Z
_SKEW_S = 3600  # client clock 1h behind server


def enrich_timestamp_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clock-skew-corrected `_time` bucketed to (day, hour).

    Rows with event_id % 5 == 0 arrive without `_time` and get the
    (fixed, deterministic) server timestamp; the rest carry epoch
    millis that the mapper shifts by server_now - upload_time.
    """
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.when(F.col("event_id") % 5 != 0, F.expr("ts_ns div 1000000")).alias("_time"),
    )
    ctx = {
        "server_time_expr": F.lit(_SERVER_TS).cast("timestamp"),
        "upload_time_millis": (_SERVER_EPOCH_S - _SKEW_S) * 1000,
    }
    out = TimestampMapper().apply(ev, ctx)
    return (
        out.select(F.to_date("_time").alias("day"), F.hour("_time").alias("hr"))
        .groupBy("day", "hr")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


ENRICH_TS_ORACLE = f"""
WITH corrected AS (
  SELECT CASE WHEN event_id % 5 <> 0
              THEN epoch_us(ts) // 1000 + {_SKEW_S * 1000}
              ELSE {_SERVER_EPOCH_S}::BIGINT * 1000 END AS ms
  FROM events
)
SELECT CAST(to_timestamp(ms // 1000) AS DATE) AS day,
       CAST((ms // 3600000) % 24 AS INT) AS hr,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM corrected GROUP BY 1, 2
"""


# --- P1+P2+P3 chained through the pipeline driver ------------------------


def enrich_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full mapper chain (timestamp -> geoip -> useragent) through
    EnrichmentPipeline.apply — verifies mapper composition, trigger
    detection, and trigger-column drops in one plan."""
    ev = _with_ua(_with_ip(_events(spark, sf_dir).select("event_id", "user_id", "event_type")))
    ev = ev.withColumn("_time", F.lit(None).cast("bigint"))
    pipe = EnrichmentPipeline([TimestampMapper(), GeoIPMapper(), UserAgentMapper()])
    out = pipe.apply(ev, {"server_time_expr": F.lit(_SERVER_TS).cast("timestamp")})
    return out.groupBy("_country_code", "_user_agent_family").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.to_date("_time")).alias("server_day"),
    )


ENRICH_PIPELINE_ORACLE = f"""
WITH ev AS (
  SELECT event_id, event_type,
         CAST(CASE CAST(event_id % 6 AS INT)
            WHEN 0 THEN 1 WHEN 1 THEN 24 WHEN 2 THEN 81
            WHEN 3 THEN 101 WHEN 4 THEN 186 ELSE 9 END AS BIGINT) * 16777216
         + (event_id % 256) * 65536
         + ((event_id // 7) % 256) * 256
         + (event_id % 251) AS ip_n
  FROM events WHERE event_type <> 'error'
), dim(o1, cc) AS (
  VALUES (1,'AU'), (24,'US'), (81,'DE'), (101,'CN'), (186,'BR')
)
SELECT cc AS _country_code,
       CASE event_type WHEN 'click' THEN 'Chrome' WHEN 'view' THEN 'Firefox'
            WHEN 'signup' THEN 'Safari' ELSE 'Edge' END AS _user_agent_family,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       DATE '{_SERVER_TS[:10]}' AS server_day
FROM ev LEFT JOIN dim
  ON ev.ip_n BETWEEN CAST(o1 AS BIGINT) * 16777216 AND (CAST(o1 AS BIGINT) + 1) * 16777216 - 1
GROUP BY 1, 2
"""


def enrich_channel_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by acquisition channel: the ReferrerMapper's medium
    classification composed with value/user economics — events,
    unique users, total value, and value-per-user for each channel
    (search / social / internal / unknown — the mapper classifies a
    missing referrer as unknown, the reference's behavior) — the marketing
    attribution table the reference's referrer enrichment exists to
    feed (rakam-mapper-url/.../ReferrerEventMapper semantics).

    Plan: the mapper's parse is row-local (codegen); one enum-sized
    channel aggregate; value through DECIMAL, rate one double
    division rounded 9dp."""
    ev = _with_referrer(
        _events(spark, sf_dir).select("event_id", "user_id", "value")
    )
    out = ReferrerMapper().apply(ev, {})
    return (
        out.groupBy(F.col("_referrer_medium").alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias(
                "total_value"
            ),
            F.round(
                F.sum(F.col("value").cast(DEC)).cast("double")
                / F.countDistinct("user_id").cast("double"),
                9,
            ).alias("value_per_user"),
        )
        .orderBy("channel")
    )


ENRICH_CHANNEL_VALUE_ORACLE = """
SELECT CASE CAST(event_id % 5 AS INT)
         WHEN 0 THEN 'search' WHEN 1 THEN 'social' WHEN 2 THEN 'unknown'
         WHEN 3 THEN 'internal' ELSE 'unknown' END AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(COUNT(DISTINCT user_id) AS DOUBLE), 9) AS value_per_user
FROM events
GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "enrich_channel_value": enrich_channel_value,
    "enrich_geoip": enrich_geoip,
    "enrich_useragent": enrich_useragent,
    "enrich_referrer": enrich_referrer,
    "enrich_timestamp_skew": enrich_timestamp_skew,
    "enrich_pipeline_full": enrich_pipeline_full,
}

ORACLES = {
    "enrich_channel_value": ENRICH_CHANNEL_VALUE_ORACLE,
    "enrich_geoip": ENRICH_GEOIP_ORACLE,
    "enrich_useragent": ENRICH_UA_ORACLE,
    "enrich_referrer": ENRICH_REFERRER_ORACLE,
    "enrich_timestamp_skew": ENRICH_TS_ORACLE,
    "enrich_pipeline_full": ENRICH_PIPELINE_ORACLE,
}
