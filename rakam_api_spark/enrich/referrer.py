"""P4: referrer classification.

Reference ReferrerEventMapper (mapper/rakam-mapper-website/.../
ReferrerEventMapper.java:46-131), built on the snowplow
referer-parser database: triggers ``_referrer`` (+ optional
``_host``); adds ``_referrer_medium, _referrer_source,
_referrer_term, _referrer_domain, _referrer_path``; INTERNAL medium
(referrer host == event host) skips domain/path.

Spark-first: the search/social engine database is a broadcast-joined
rules table (domain → medium/source/term-param) instead of a per-row
library call; URL pieces via parse_url (JVM-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..types import FieldType
from .pipeline import FieldDependency, Mapper

REFERRER_FIELDS = {
    "_referrer_medium": FieldType.STRING,
    "_referrer_source": FieldType.STRING,
    "_referrer_term": FieldType.STRING,
    "_referrer_domain": FieldType.STRING,
    "_referrer_path": FieldType.STRING,
}

# (domain suffix, medium, source, term query param)
_RULES = [
    ("google.", "search", "Google", "q"),
    ("bing.com", "search", "Bing", "q"),
    ("duckduckgo.com", "search", "DuckDuckGo", "q"),
    ("baidu.com", "search", "Baidu", "wd"),
    ("yandex.", "search", "Yandex", "text"),
    ("facebook.com", "social", "Facebook", None),
    ("twitter.com", "social", "Twitter", None),
    ("t.co", "social", "Twitter", None),
    ("linkedin.com", "social", "LinkedIn", None),
    ("reddit.com", "social", "Reddit", None),
    ("instagram.com", "social", "Instagram", None),
]


def rules_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        _RULES, "dom_pat string, medium string, source string, term_param string"
    )


class ReferrerMapper(Mapper):
    name = "referrer"

    def dependency(self) -> FieldDependency:
        # _host is a second trigger (adds no fields of its own): it
        # parameterizes INTERNAL-medium detection and is not stored
        return FieldDependency(dependent_fields={"_referrer": dict(REFERRER_FIELDS), "_host": {}})

    def triggers(self) -> set[str]:
        return {"_referrer"}

    def apply(self, df: DataFrame, ctx: dict) -> DataFrame:
        if "_referrer" not in df.columns:
            return df
        ref = F.col("_referrer").cast("string")
        host = F.lower(F.parse_url(ref, F.lit("HOST")))
        path = F.parse_url(ref, F.lit("PATH"))
        query = F.parse_url(ref, F.lit("QUERY"))
        event_host = F.lower(F.col("_host").cast("string")) if "_host" in df.columns else F.lit(None)

        with_host = df.withColumn("_r_host", host).withColumn("_r_path", path).withColumn("_r_query", query)
        joined = with_host.join(
            broadcast(rules_df(df.sparkSession)),
            F.col("_r_host").contains(F.col("dom_pat")),
            "left",
        )
        medium = (
            F.when(F.col("_r_host").isNull(), "unknown")
            .when(event_host.isNotNull() & (F.col("_r_host") == event_host), "internal")
            .when(F.col("medium").isNotNull(), F.col("medium"))
            .otherwise("unknown")
        )
        term = F.when(
            F.col("term_param").isNotNull(),
            F.parse_url(ref, F.lit("QUERY"), F.col("term_param")),
        )
        out = (
            joined.withColumn("_referrer_medium", medium)
            .withColumn("_referrer_source", F.col("source"))
            .withColumn("_referrer_term", term)
            .withColumn(
                "_referrer_domain",
                F.when(medium != "internal", F.col("_r_host")),
            )
            .withColumn(
                "_referrer_path",
                F.when(medium != "internal", F.col("_r_path")),
            )
            .drop("dom_pat", "medium", "source", "term_param", "_r_host", "_r_path", "_r_query", "_referrer", "_host")
        )
        return out
