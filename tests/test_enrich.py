"""Enrichment mapper tests (mirrors the reference's mapper test
suite: TestGeoIPEventMapper, TestUserAgentEventMapper,
TestReferrerEventMapper)."""

from pyspark.sql import functions as F

from rakam_api_spark.enrich import (
    EnrichmentPipeline,
    GeoIPMapper,
    ReferrerMapper,
    TimestampMapper,
    UserAgentMapper,
    UserIdMapper,
)
from rakam_api_spark.types import FieldType

CHROME_UA = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36"
)
BOT_UA = "Googlebot/2.1 (+http://www.google.com/bot.html)"


def test_timestamp_mapper_fills_null(spark):
    df = spark.createDataFrame([(None,), (1704067200000,)], "_time bigint")
    out = TimestampMapper().apply(df, {})
    rows = out.collect()
    assert all(r["_time"] is not None for r in rows)
    assert all(r["$server_time"] is not None for r in rows)


def test_timestamp_clock_skew():
    import datetime

    from rakam_api_spark.enrich.timestamp import TimestampMapper as TM

    # client clock 60s behind server: upload_time = server_now - 60s
    # → event times shift forward by ~60s
    tm = TM()
    assert tm.dependency().constant_fields == {"_time": FieldType.TIMESTAMP}
    _ = datetime


def test_geoip_range_join(spark):
    df = spark.createDataFrame(
        [("24.100.0.1", 1), ("9.9.9.9", 2), ("not-an-ip", 3)], "_ip string, n bigint"
    )
    out = GeoIPMapper().apply(df, {})
    rows = {r["n"]: r for r in out.collect()}
    assert rows[1]["_country_code"] == "US"
    assert rows[1]["_city"] == "San Francisco"
    assert rows[1]["__ip"] == "24.100.0.1"
    assert rows[2]["_country_code"] is None  # no range match
    assert rows[3]["_country_code"] is None  # invalid ip
    assert "_ip" not in out.columns  # trigger pruned


def test_geoip_true_uses_source_address(spark):
    df = spark.createDataFrame([("true",)], "_ip string")
    out = GeoIPMapper().apply(df, {"source_address": "81.1.2.3"})
    r = out.collect()[0]
    assert r["_country_code"] == "DE"


def test_geoip_large_dim_no_nested_loop(spark):
    """A GeoLite2-scale range dim must plan as a hash equi-join on the
    /16 prefix bucket, never a BroadcastNestedLoopJoin (reference scale
    anchor: MaxmindGeoIPEventMapper.java:165-222, ~3M mmdb ranges)."""
    n_ranges = 100_000
    # disjoint /24-ish ranges: [i*256, i*256+255]
    ranges = (
        spark.range(n_ranges)
        .select(
            (F.col("id") * 256).alias("start_n"),
            (F.col("id") * 256 + 255).alias("end_n"),
            F.concat(F.lit("C"), (F.col("id") % 250).cast("string")).alias("_country_code"),
            F.lit("r").alias("_region"),
            F.lit("c").alias("_city"),
            F.lit(1.0).alias("_latitude"),
            F.lit(2.0).alias("_longitude"),
            F.lit("tz").alias("_timezone"),
        )
    )
    df = spark.createDataFrame(
        [("0.0.1.7", 1), ("0.1.0.42", 2), ("200.0.0.1", 3)], "_ip string, n bigint"
    )
    out = GeoIPMapper(ranges_df=ranges, broadcast_dim=False).apply(df, {})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    rows = {r["n"]: r for r in out.collect()}
    assert rows[1]["_country_code"] == "C1"  # ip_n=263 → range id 1
    assert rows[2]["_country_code"] == "C6"  # ip_n=65578 → id 256 → 256%250=6
    assert rows[3]["_country_code"] is None  # beyond the dim
    assert len(rows) == 3


def test_geoip_default_dim_is_bucketed_equi_join(spark):
    df = spark.createDataFrame([("24.100.0.1", 1)], "_ip string, n bigint")
    out = GeoIPMapper().apply(df, {})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_useragent_parse(spark):
    df = spark.createDataFrame([(CHROME_UA, 1)], "_user_agent string, n bigint")
    out = UserAgentMapper().apply(df, {})
    r = out.collect()[0]
    assert r["_user_agent_family"] == "Chrome"
    assert r["_user_agent_version"].startswith("120")
    assert r["_os"] == "Windows"
    assert r["_os_version"] == "10.0"
    assert "_user_agent" not in out.columns


def test_useragent_spider_filtered(spark):
    df = spark.createDataFrame([(BOT_UA, 1), (CHROME_UA, 2)], "_user_agent string, n bigint")
    out = UserAgentMapper().apply(df, {})
    assert [r["n"] for r in out.collect()] == [2]


def test_referrer_classification(spark):
    df = spark.createDataFrame(
        [
            ("https://www.google.com/search?q=spark+engine", "myapp.com", 1),
            ("https://myapp.com/home", "myapp.com", 2),
            ("https://example.org/blog", "myapp.com", 3),
        ],
        "_referrer string, _host string, n bigint",
    )
    out = ReferrerMapper().apply(df, {})
    rows = {r["n"]: r for r in out.collect()}
    assert rows[1]["_referrer_medium"] == "search"
    assert rows[1]["_referrer_source"] == "Google"
    assert rows[1]["_referrer_term"] == "spark+engine"
    assert rows[2]["_referrer_medium"] == "internal"
    assert rows[2]["_referrer_domain"] is None  # internal: no domain/path
    assert rows[3]["_referrer_medium"] == "unknown"
    assert rows[3]["_referrer_domain"] == "example.org"


def test_userid_generation_string(spark):
    df = spark.createDataFrame([("u1",), (None,)], "_user string")
    out = UserIdMapper(FieldType.STRING).apply(df, {})
    vals = [r["_user"] for r in out.collect()]
    assert "u1" in vals
    assert all(v is not None for v in vals)


def test_userid_anonymous_cookie_reused(spark):
    df = spark.createDataFrame([(None, "anon-7")], "_user string, _anonymous_user string")
    out = UserIdMapper(FieldType.STRING).apply(df, {})
    assert out.collect()[0]["_user"] == "anon-7"
    assert "_anonymous_user" not in out.columns


def test_pipeline_resolve_fields():
    pipe = EnrichmentPipeline([TimestampMapper(), GeoIPMapper(), UserAgentMapper()])
    resolved, drop = pipe.resolve_fields({"x": FieldType.DOUBLE, "_ip": FieldType.STRING})
    assert resolved["_time"] == FieldType.TIMESTAMP
    assert resolved["_country_code"] == FieldType.STRING
    assert "_ip" not in resolved  # trigger not stored
    assert drop == {"_ip"}
    # no _user_agent trigger → no UA fields
    assert "_os" not in resolved


def test_pipeline_skips_untriggered(spark):
    df = spark.createDataFrame([(1,)], "x bigint")
    pipe = EnrichmentPipeline([GeoIPMapper(), UserAgentMapper(), ReferrerMapper()])
    out = pipe.apply(df, {})
    assert out.columns == ["x"]  # untouched
    _ = F


def test_webhook_timeout_bound():
    """Reference contract (WebHookHttpService 3s timeout): a slow
    webhook transform fails the request with TransformTimeout instead
    of stalling the gateway; errors propagate; fast hooks unaffected."""
    import time

    import pytest

    from rakam_api_spark.enrich.transforms import TransformRegistry, TransformTimeout

    reg = TransformRegistry()
    reg.register_webhook("p", "slow", lambda q, b, pr, h: time.sleep(10))
    reg.register_webhook("p", "fast", lambda q, b, pr, h: {"collection": "c", "properties": q})
    reg.register_webhook("p", "boom", lambda q, b, pr, h: 1 / 0)

    t0 = time.time()
    with pytest.raises(TransformTimeout):
        reg.invoke_webhook("p", "slow", timeout_sec=0.3)
    assert time.time() - t0 < 2.0  # bounded, not the sleep(10)
    assert reg.invoke_webhook("p", "fast", {"x": 1})["properties"] == {"x": 1}
    with pytest.raises(ZeroDivisionError):
        reg.invoke_webhook("p", "boom")
