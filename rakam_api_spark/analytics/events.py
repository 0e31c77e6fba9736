"""Event-analytics operators: segmentation, funnel, retention,
sessionization, JSON-property extraction, profile snapshots.

The reference collects events and delegates these reports to SQL on
its warehouse (reference README.md:14-19); its cloud UI's
funnel/retention builders exist only as feature flags in this
snapshot (rakam-spi/.../UserPluginConfig.java:18-19).  We implement
them as first-class Spark operators.

Determinism: all event-time arithmetic uses the raw nanosecond epoch
column (``ts_ns``) or DATE casts of the TimestampNTZ column — no
session-timezone dependence anywhere (oracle side uses
``epoch_us(ts)`` / ``CAST(ts AS DATE)`` which are the same naive-UTC
semantics).

Scale: every operator is a single shuffle on ``user_id`` (window or
groupBy) or on a small bucket key; at 100 TB the events table would
be date-partitioned and bucketed by user_id, making the user-keyed
shuffles co-located scans.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..sketch import MG_K
from ..tables import load_table

DEC = "decimal(18,6)"

US_PER_HOUR = 3_600_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _us(col: str = "ts_ns"):
    """Microseconds-since-epoch from the raw ns column (integer floor
    division matches DuckDB's ns→us truncation; double division would
    round — ns epochs exceed the 52-bit mantissa)."""
    return F.expr(f"{col} div 1000")


# --- segmentation -------------------------------------------------------


def seg_daily_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segmentation: daily counts + uniques per event type."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.col("ts").cast("date").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .orderBy("day", "event_type")
    )


SEG_DAILY_ORACLE = """
SELECT CAST(ts AS DATE) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""


def dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("dau"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("day")
    )


DAU_ORACLE = """
SELECT CAST(ts AS DATE) AS day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
"""


def top_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
    )


TOP_EVENT_VALUES_ORACLE = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY 1
"""


def event_type_hourly_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of each event type within its hour (window over agg)."""
    ev = _events(spark, sf_dir)
    hour_id = F.floor(F.col("ts_ns") / F.lit(US_PER_HOUR * 1000)).cast("long").alias("hour_id")
    agg = ev.groupBy(hour_id, "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("hour_id")
    return (
        agg.withColumn("hour_total", F.sum("n").over(w))
        .withColumn("share", F.col("n").cast("double") / F.col("hour_total").cast("double"))
        .orderBy("hour_id", "event_type")
    )


HOURLY_SHARE_ORACLE = """
WITH agg AS (
  SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour_id, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT hour_id, event_type, n,
       CAST(SUM(n) OVER (PARTITION BY hour_id) AS BIGINT) AS hour_total,
       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY hour_id) AS DOUBLE) AS share
FROM agg
"""


def props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction over the dynamic ``props`` column —
    the analytics-side analog of the reference's dynamic-schema
    ingest (JsonEventDeserializer)."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k_bucket", k % 10)
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .orderBy("k_bucket")
    )


PROPS_JSON_ORACLE = """
SELECT CAST(props->>'k' AS BIGINT) % 10 AS k_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events GROUP BY 1
"""


def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through Spark 4's VARIANT type:
    ``try_parse_json`` → ``variant_get`` typed extraction (the
    binary-encoded path the streaming schema inference also rides,
    streaming/job.py), aggregated per k-decile.

    Functionally equivalent to ``props_json_extract``'s
    get_json_object route — the point of the gate is that the
    VARIANT parse/extract path itself produces oracle-exact typed
    values.  Row-local parse, one small aggregation.
    """
    ev = _events(spark, sf_dir)
    k = F.expr("variant_get(try_parse_json(props), '$.k', 'long')")
    return (
        ev.select(k.alias("k"), "value")
        .groupBy(F.expr("k div 10").alias("k_decile"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .orderBy("k_decile")
    )


PROPS_VARIANT_ORACLE = """
SELECT CAST(props->>'k' AS BIGINT) // 10 AS k_decile,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(CAST(props->>'k' AS BIGINT)) AS min_k,
       MAX(CAST(props->>'k' AS BIGINT)) AS max_k,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events GROUP BY 1
"""


# --- funnel -------------------------------------------------------------


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    within_us: int | None = None,
) -> DataFrame:
    """Ordered-funnel operator: users completing step *i* are users
    whose earliest qualifying event for ``steps[i]`` occurs at or
    after their step *i-1* completion time — and, with ``within_us``
    set, no later than ``within_us`` microseconds after it (the
    conversion-window funnel every product-analytics UI offers).

    Implemented as a chain of per-step min-time aggregations joined
    on the user key (each step's DataFrame is tiny relative to the
    fact table, so Catalyst broadcast-joins it back).  A
    single-shuffle window variant is possible but this form pushes
    the ``event_type`` filter into the scan for every step.
    """
    # All comparisons in whole microseconds (matches the oracle's
    # epoch_us truncation bit-for-bit).
    events = events.withColumn("_us", _us())
    prev: DataFrame | None = None
    counts = []
    for i, step in enumerate(steps):
        step_events = events.where(F.col("event_type") == step)
        if prev is None:
            cur = step_events.groupBy(user_col).agg(F.min("_us").alias("t"))
        else:
            qualifies = F.col("_us") >= F.col("t_prev")
            if within_us is not None:
                qualifies = qualifies & (F.col("_us") <= F.col("t_prev") + F.lit(within_us))
            cur = (
                step_events.join(prev.select(user_col, F.col("t").alias("t_prev")), user_col)
                .where(qualifies)
                .groupBy(user_col)
                .agg(F.min("_us").alias("t"))
            )
        counts.append(
            cur.agg(F.count(F.lit(1)).alias("users")).select(
                F.lit(i + 1).alias("step"), F.lit(step).alias("event_type"), "users"
            )
        )
        prev = cur
    return reduce(DataFrame.unionAll, counts).orderBy("step")


def funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel(_events(spark, sf_dir), ["signup", "click", "purchase"])


US_PER_DAY = 86_400_000_000


def funnel_windowed_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window funnel: each step must land within 24 h of
    the previous step's completion."""
    return funnel(
        _events(spark, sf_dir),
        ["signup", "click", "purchase"],
        within_us=US_PER_DAY,
    )


FUNNEL_WINDOWED_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t FROM events WHERE event_type = 'signup' GROUP BY 1
), s2 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= s1.t
    AND epoch_us(e.ts) <= s1.t + 86400000000
  GROUP BY 1
), s3 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s2.t
    AND epoch_us(e.ts) <= s2.t + 86400000000
  GROUP BY 1
)
SELECT 1 AS step, 'signup' AS event_type, CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS users
UNION ALL
SELECT 2, 'click', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
UNION ALL
SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
"""


FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t FROM events WHERE event_type = 'signup' GROUP BY 1
), s2 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= s1.t GROUP BY 1
), s3 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s2.t GROUP BY 1
)
SELECT 1 AS step, 'signup' AS event_type, CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS users
UNION ALL
SELECT 2, 'click', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
UNION ALL
SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
"""


# --- retention ----------------------------------------------------------


def retention(events: DataFrame, max_offset_days: int = 14) -> DataFrame:
    """Cohort retention: users grouped by first-activity date; for
    each day-offset, how many were active.

    Two shuffles: one to find cohort dates (groupBy user), one for
    the (cohort, offset) rollup; the cohort table joins back
    broadcast (distinct users ≪ events).
    """
    cohorts = events.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("cohort_date"))
    active = events.select("user_id", F.col("ts").cast("date").alias("active_date")).distinct()
    return (
        active.join(cohorts, "user_id")
        .withColumn("day_offset", F.datediff("active_date", "cohort_date"))
        .where(F.col("day_offset") <= max_offset_days)
        .groupBy("cohort_date", "day_offset")
        .agg(F.countDistinct("user_id").alias("users"))
        .orderBy("cohort_date", "day_offset")
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retention(_events(spark, sf_dir), max_offset_days=14)


RETENTION_ORACLE = """
WITH cohorts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date FROM events GROUP BY 1
), active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_date FROM events
)
SELECT cohort_date,
       CAST(active_date - cohort_date AS INT) AS day_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
FROM active JOIN cohorts USING (user_id)
WHERE active_date - cohort_date <= 14
GROUP BY 1, 2
"""


# --- sessionization -----------------------------------------------------


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Assign session ids per user with an inactivity-gap rule.

    Classic lag + running-sum sessionization: one shuffle
    (partitionBy user_id).  Returns the input plus ``session_id``.
    At scale this is the same plan Spark's ``session_window`` builds
    for streaming; the batch form keeps arbitrary per-event columns.
    """
    events = events.withColumn("_us", _us())
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    gap_us = gap_seconds * 1_000_000
    is_new = (
        F.when(F.lag("_us").over(w).isNull(), 1)
        .when((F.col("_us") - F.lag("_us").over(w)) > gap_us, 1)
        .otherwise(0)
    )
    return events.withColumn("session_id", F.sum(is_new).over(w))


def sessionization_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session stats over 30-min-gap sessions."""
    sess = sessionize(_events(spark, sf_dir))
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("_us") - F.min("_us")).alias("duration_us"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.floor(F.sum("duration_us") / 1_000_000).cast("long").alias("total_duration_s"),
        )
        .orderBy("user_id")
    )


SESSIONIZATION_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
), flagged AS (
  SELECT user_id, event_id, us,
         CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
  FROM ordered
), sessions AS (
  SELECT user_id, event_id, us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events, MAX(us) - MIN(us) AS duration_us
  FROM sessions GROUP BY 1, 2
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(FLOOR(SUM(duration_us) / 1000000) AS BIGINT) AS total_duration_s
FROM per_session GROUP BY 1
"""


# --- user profile snapshot (event-sourced dimension) --------------------


def user_profile_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sourced profile build: the batch analog of the
    reference's mutable ``_users`` dimension (PostgresqlUserStorage)
    — last/first seen, totals, and latest event type per user."""
    ev = _events(spark, sf_dir).withColumn("_us", _us())
    w = Window.partitionBy("user_id").orderBy(F.desc("_us"), F.desc("event_id"))
    last_type = ev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).select(
        "user_id", F.col("event_type").alias("last_event_type")
    )
    agg = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
    )
    return agg.join(last_type, "user_id").orderBy("user_id")


USER_PROFILE_ORACLE = """
WITH last_t AS (
  SELECT user_id, event_type AS last_event_type
  FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT e.user_id, MIN(ts) AS first_seen, MAX(ts) AS last_seen,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       ANY_VALUE(last_event_type) AS last_event_type
FROM events e JOIN last_t USING (user_id)
GROUP BY e.user_id
"""


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
) -> DataFrame:
    """Distributed as-of join: for each left row, the latest right row
    with ``right_time <= left_time`` and equal ``on`` key.

    Spark has no ASOF JOIN operator; the naive inequality join
    explodes to O(|L|·|R|) per key.  This implementation unions the
    two (tagged) streams and runs ONE window pass per key ordered by
    time — last-seen right values propagate forward to each left row
    (``last(..., ignorenulls=True)`` over rows UNBOUNDED PRECEDING..
    CURRENT ROW).  Cost: a single shuffle on the key, O(|L|+|R|)
    rows — the 100 TB-safe shape.  Ties (equal timestamps) order the
    right row first, i.e. the join is inclusive, matching DuckDB
    ASOF semantics.
    """
    l_types, r_types = dict(left.dtypes), dict(right.dtypes)
    lt_cols = [c for c in left.columns if c not in (on, left_time)]
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        *lt_cols,
        *[F.lit(None).cast(r_types[c]).alias(f"_r_{c}") for c in right_cols],
    )
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(l_types[c]).alias(c) for c in lt_cols],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = lt.unionByName(rt).select(
        "_k",
        "_t",
        "_is_left",
        *lt_cols,
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}") for c in right_cols],
    )
    return filled.where(F.col("_is_left") == 1).drop("_is_left").withColumnRenamed("_k", on)


def asof_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join demo: each purchase matched to the user's most
    recent prior (or simultaneous) 'view' event; gap reported in
    microseconds.  Oracle uses DuckDB's native ASOF LEFT JOIN — an
    independent implementation of the same semantics."""
    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", _us().alias("p_us")
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", _us().alias("v_us")
    )
    joined = asof_join(
        purchases,
        views.withColumn("view_us", F.col("v_us")),
        on="user_id",
        left_time="p_us",
        right_time="v_us",
        right_cols=["view_us"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("_t").alias("purchase_us"),
        F.col("_r_view_us").alias("view_us"),
        (F.col("_t") - F.col("_r_view_us")).alias("gap_us"),
    )


ASOF_ORACLE = """
SELECT p.event_id, p.user_id,
       epoch_us(p.ts) AS purchase_us,
       epoch_us(v.ts) AS view_us,
       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
"""


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1-per-group WITHOUT a window: max over a struct ordered
    (ts, event_id) — one partial-aggregatable groupBy.  At scale this
    beats row_number() (no per-group sort, map-side combine shrinks
    the shuffle to one row per user per partition); ties are broken
    by event_id inside the struct comparison, so it's deterministic.
    """
    ev = _events(spark, sf_dir)
    top = ev.groupBy("user_id").agg(
        F.max(F.struct(_us().alias("ts_us"), F.col("event_id"), F.col("event_type"), F.col("value"))).alias("last")
    )
    return top.select(
        "user_id",
        F.col("last.ts_us").alias("last_ts_us"),
        F.col("last.event_id").alias("last_event_id"),
        F.col("last.event_type").alias("last_event_type"),
        F.col("last.value").alias("last_value"),
    )


LATEST_EVENT_ORACLE = """
SELECT user_id,
       epoch_us(ts) AS last_ts_us,
       event_id AS last_event_id,
       event_type AS last_event_type,
       value AS last_value
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def daily_value_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: 7-day trailing moving average of daily
    event value (frame = RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
    over day ordinals).  Two-level plan: daily pre-aggregation
    shrinks the window input to one row per (type, day) before the
    per-type sort — the standard trick that keeps event-grain rows
    out of window state at scale."""
    ev = _events(spark, sf_dir)
    daily = (
        ev.groupBy(F.col("event_type"), F.col("ts").cast("date").alias("day"))
        # keep the frame aggregation in DECIMAL: double sums inside a
        # window frame are association-order-dependent (engines use
        # different frame algorithms), decimal sums are exact
        .agg(F.sum(F.col("value").cast(DEC)).alias("day_dec"))
        .withColumn("day_ord", F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_ord")
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "event_type",
        "day",
        F.col("day_dec").cast("double").alias("day_value"),
        (
            F.sum("day_dec").over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double")
        ).alias("avg_7d"),
        F.count(F.lit(1)).over(w).alias("days_in_window"),
    )


MOVING_AVG_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,6))) AS day_dec
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, CAST(day_dec AS DOUBLE) AS day_value,
       CAST(SUM(day_dec) OVER w AS DOUBLE) / CAST(COUNT(*) OVER w AS DOUBLE) AS avg_7d,
       CAST(COUNT(*) OVER w AS BIGINT) AS days_in_window
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
"""


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles of event value per event type (p50/p90/p99,
    linear interpolation).  Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` share the same interpolation arithmetic, so the
    doubles match bit-for-bit.  Exact percentile is a full-sort-per-
    group operator; at 100 TB swap in ``approx_percentile`` (t-digest
    sketch, mergeable map-side) — same call shape."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
        F.count(F.lit(1)).alias("n_events"),
    )


VALUE_PERCENTILES_ORACLE = """
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90,
       quantile_cont(value, 0.99) AS p99,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type
"""


def value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles via the mergeable sketch path (Spark
    ``approx_percentile`` — Greenwald-Khanna summaries with rank
    error ≤ 1/accuracy; DuckDB ``approx_quantile`` — t-digest): the
    operator that replaces exact full-sort percentiles at 100 TB.

    Sketch point estimates are engine-specific, so (same pattern as
    ``dau_approx_sketch``) the comparable surface is a RANK-ERROR
    BOUNDS CHECK: each engine's own approx value must land between
    the exact percentiles at q∓0.02 — double the GK guarantee at
    accuracy 100, so a passing row proves the sketch honored its
    error contract without comparing raw estimates."""
    ev = _events(spark, sf_dir)
    ap = lambda q: F.expr(f"approx_percentile(value, {q}, 100)")
    ex = lambda q: F.expr(f"percentile(value, {q})")
    between = lambda q, lo, hi: (ap(q) >= ex(lo)) & (ap(q) <= ex(hi))
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            between(0.5, 0.48, 0.52).alias("p50_in_bounds"),
            between(0.9, 0.88, 0.92).alias("p90_in_bounds"),
            between(0.99, 0.97, 1.0).alias("p99_in_bounds"),
        )
        .orderBy("event_type")
    )


VALUE_QUANTILE_SKETCH_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       approx_quantile(value, 0.5) BETWEEN quantile_cont(value, 0.48)
                                       AND quantile_cont(value, 0.52) AS p50_in_bounds,
       approx_quantile(value, 0.9) BETWEEN quantile_cont(value, 0.88)
                                       AND quantile_cont(value, 0.92) AS p90_in_bounds,
       approx_quantile(value, 0.99) BETWEEN quantile_cont(value, 0.97)
                                        AND quantile_cont(value, 1.0) AS p99_in_bounds
FROM events
GROUP BY event_type
"""


def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common 3-step event sequences (path mining): per user,
    events ordered by time form overlapping trigram paths
    ``a>b>c`` via two LEADs over one user-partitioned window; paths
    are counted corpus-wide and the top 10 returned.

    One shuffle on user_id (the window), one tiny aggregation on the
    path string — at 100 TB the window shares the events table's
    user bucketing, and trigram cardinality (|event types|³) keeps
    the count aggregation small regardless of corpus size.
    """
    ev = _events(spark, sf_dir)
    # order by epoch-us, NOT raw ts_ns: the oracle's epoch_us(ts)
    # truncates to microseconds, so on nanosecond-grain source data
    # the sub-us bits must not break ties differently (event_id does)
    w = Window.partitionBy("user_id").orderBy(_us(), "event_id")
    paths = (
        ev.select(
            "user_id",
            F.concat_ws(
                ">",
                F.col("event_type"),
                F.lead("event_type", 1).over(w),
                F.lead("event_type", 2).over(w),
            ).alias("path"),
            F.lead("event_type", 2).over(w).alias("_third"),
        )
        .where(F.col("_third").isNotNull())
        .drop("_third")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_paths"), F.countDistinct("user_id").alias("n_users"))
        .orderBy(F.desc("n_paths"), F.asc("path"))
        .limit(10)
    )


TOP_EVENT_PATHS_ORACLE = """
WITH seq AS (
  SELECT user_id,
         event_type || '>' || lead(event_type, 1) OVER w || '>' || lead(event_type, 2) OVER w AS path,
         lead(event_type, 2) OVER w AS third
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_paths,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM seq WHERE third IS NOT NULL
GROUP BY 1 ORDER BY n_paths DESC, path ASC LIMIT 10
"""


def daily_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type daily volume anomalies: z-score of each day's
    count against its trailing window of the 7 most recent OBSERVED
    days (a ROWS frame: for event types with zero-event calendar
    days the baseline reaches further back rather than shrinking —
    the usual volume-baseline choice, and the exact semantics the
    oracle mirrors; ``rolling_uniques_7d`` is the calendar-window
    counterpart).

    Variance is computed by hand from windowed ``avg(n)`` and
    ``avg(n²)`` (Bessel-corrected) rather than ``stddev_samp`` —
    engines implement stddev with different accumulation schemes
    (Welford vs two-pass) whose low bits differ, while sums of
    integer counts are exact in double, making the hand-rolled
    z-score bit-identical across engines.  One shuffle (daily agg),
    one window over day-grain rows — event-grain rows never enter
    window state (same principle as ``daily_value_moving_avg``).
    """
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        F.col("event_type"), F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    nn = F.col("n").cast("double")
    stats = daily.select(
        "event_type",
        "day",
        "n",
        F.count(F.lit(1)).over(w).alias("k"),
        F.avg(nn).over(w).alias("mu"),
        F.avg(nn * nn).over(w).alias("musq"),
    ).where(F.col("k") >= 3)
    var = (F.col("musq") - F.col("mu") * F.col("mu")) * (
        F.col("k").cast("double") / (F.col("k").cast("double") - F.lit(1.0))
    )
    z = (F.col("n").cast("double") - F.col("mu")) / F.sqrt(var)
    return (
        stats.select(
            "event_type",
            "day",
            "n",
            F.col("mu").alias("trailing_avg"),
            F.when(var > 0, z).alias("zscore"),
            F.when(var > 0, F.abs(z) > 2.0).otherwise(F.lit(False)).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


DAILY_ANOMALY_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, day, n,
         COUNT(*) OVER w AS k,
         AVG(CAST(n AS DOUBLE)) OVER w AS mu,
         AVG(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) OVER w AS musq
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, CAST(n AS BIGINT) AS n, mu AS trailing_avg,
       CASE WHEN (musq - mu*mu) * (k / (k - 1.0)) > 0
            THEN (n - mu) / sqrt((musq - mu*mu) * (k / (k - 1.0))) END AS zscore,
       CASE WHEN (musq - mu*mu) * (k / (k - 1.0)) > 0
            THEN abs((n - mu) / sqrt((musq - mu*mu) * (k / (k - 1.0)))) > 2.0
            ELSE FALSE END AS is_anomaly
FROM stats WHERE k >= 3
"""


def rolling_uniques_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-7-day unique users per day — the exact twin of
    ``mau_rollup_sketch``: raw events collapse to DISTINCT
    (day, user) pairs first, then a day-grain range join fans each
    pair to the ≤7 report days it supports, and one aggregation
    counts uniques per day.

    Scale shape: everything after the first distinct is DAY-GRAIN —
    cost tracks |days × daily actives|, not event volume; the range
    join is an equi-join on nothing but a 7-row fan-out (broadcast
    of the day spine), so event-grain rows never join anything.
    """
    ev = _events(spark, sf_dir)
    pairs = ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    days = pairs.select("day").distinct()
    fan = pairs.join(
        broadcast(days.select(F.col("day").alias("report_day"))),
        (F.col("day") <= F.col("report_day"))
        & (F.col("day") >= F.date_sub(F.col("report_day"), 6)),
    )
    return (
        fan.groupBy("report_day")
        .agg(
            F.countDistinct("user_id").alias("uniques_7d"),
            F.countDistinct("day").alias("days_observed"),
        )
        .orderBy("report_day")
    )


ROLLING_UNIQUES_ORACLE = """
WITH pairs AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day AS report_day FROM pairs)
SELECT report_day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS uniques_7d,
       CAST(COUNT(DISTINCT day) AS BIGINT) AS days_observed
FROM pairs JOIN days
  ON day <= report_day AND day >= report_day - INTERVAL 6 DAY
GROUP BY 1
"""


def time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency histogram: per user, days between first
    signup and the first purchase at-or-after it, bucketed by whole
    days.  Two conditional min aggregations on the user key and one
    tiny histogram rollup — all integer epoch math (``div``, never
    float division)."""
    ev = _events(spark, sf_dir).withColumn("_us", _us())
    first_signup = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("_us").alias("t0"))
    )
    first_purchase = (
        ev.where(F.col("event_type") == "purchase")
        .join(first_signup, "user_id")
        .where(F.col("_us") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min(F.col("_us") - F.col("t0")).alias("latency_us"))
    )
    return (
        first_purchase.groupBy(
            F.expr("latency_us div 86400000000").alias("latency_days")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("latency_days")
    )


TIME_TO_CONVERT_ORACLE = """
WITH s AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts) - s.t0) AS latency_us
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.t0
  GROUP BY 1
)
SELECT latency_us // 86400000000 AS latency_days,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM p GROUP BY 1
"""


def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users cohort by first-seen week,
    purchase revenue accumulates per (cohort week, weeks-since-
    cohort) cell, and a per-cohort running total gives the LTV
    curve.

    Week buckets are epoch-day integer divisions (identical in both
    engines); revenue is DECIMAL-exact until the final double cast,
    and the cumulative window sums decimals — order-insensitive
    exactness, no float accumulation drift.  Shuffles: one user-grain
    aggregation (first-seen), one join back to purchases on user_id
    (the fact table's native key), one cell aggregation, one
    cohort-partitioned window over WEEK-grain rows.
    """
    ev = _events(spark, sf_dir)
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").cast("date").alias("day"), "value"
    )
    cells = (
        purchases.join(first_seen, "user_id")
        .select(
            # integer `div`, never `/`+cast: a double-division cast
            # truncates in Spark but ROUNDS in DuckDB's BIGINT cast
            F.expr("unix_date(cohort_day) div 7").alias("cohort_week"),
            F.expr("(unix_date(day) - unix_date(cohort_day)) div 7").alias("offset_week"),
            F.col("value").cast(DEC).alias("v"),
        )
        .groupBy("cohort_week", "offset_week")
        .agg(F.count(F.lit(1)).alias("n_purchases"), F.sum("v").alias("revenue"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("offset_week")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.withColumn("cum_revenue", F.sum("revenue").over(w))
        .select(
            "cohort_week",
            "offset_week",
            "n_purchases",
            F.col("revenue").cast("double").alias("revenue"),
            F.col("cum_revenue").cast("double").alias("cum_revenue"),
        )
        .orderBy("cohort_week", "offset_week")
    )


COHORT_LTV_ORACLE = """
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY 1
),
purchases AS (
  SELECT user_id, CAST(ts AS DATE) AS day, value FROM events WHERE event_type = 'purchase'
),
cells AS (
  SELECT CAST((cohort_day - DATE '1970-01-01') // 7 AS BIGINT) AS cohort_week,
         CAST((day - cohort_day) // 7 AS BIGINT) AS offset_week,
         CAST(COUNT(*) AS BIGINT) AS n_purchases,
         SUM(CAST(value AS DECIMAL(18,6))) AS revenue
  FROM purchases JOIN first_seen USING (user_id)
  GROUP BY 1, 2
)
SELECT cohort_week, offset_week, n_purchases,
       CAST(revenue AS DOUBLE) AS revenue,
       CAST(SUM(revenue) OVER (PARTITION BY cohort_week ORDER BY offset_week
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS cum_revenue
FROM cells
"""


def ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users are deterministically assigned
    to variants by md5 bucket (content-addressed, like
    ``stratified_sample`` — a re-run or a retried task assigns
    identically), conversion is "user has ≥1 high-value purchase" (value > 90 —
    chosen so the synthetic corpus isn't saturated), and
    the lift is tested with a two-proportion z-statistic.

    The z arithmetic stays engine-exact: counts are integers, the
    pooled rate and standard error are divisions/sqrt of
    identically-derived doubles (IEEE sqrt is correctly rounded in
    both engines).  One aggregation to user grain, one tiny variant
    rollup, one single-row output — at 100 TB only the user-grain
    aggregation touches data.
    """
    ev = _events(spark, sf_dir)
    users = ev.groupBy("user_id").agg(
        F.max(
            ((F.col("event_type") == "purchase") & (F.col("value") > 90)).cast("int")
        ).alias("converted")
    )
    variant = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10).cast("long")
        % 2
    )
    per_variant = (
        users.withColumn("variant", variant)
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("converted").alias("conv"),
        )
    )
    a = per_variant.where(F.col("variant") == 0).select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    b = per_variant.where(F.col("variant") == 1).select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    d = lambda c: F.col(c).cast("double")
    p_a = d("conv_a") / d("n_a")
    p_b = d("conv_b") / d("n_b")
    pooled = (d("conv_a") + d("conv_b")) / (d("n_a") + d("n_b"))
    se = F.sqrt(pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / d("n_a") + F.lit(1.0) / d("n_b")))
    z = (p_a - p_b) / se
    return a.crossJoin(b).select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        p_a.alias("cvr_a"),
        p_b.alias("cvr_b"),
        z.alias("z_stat"),
        (F.abs(z) > F.lit(1.96)).alias("significant"),
    )


AB_TEST_LIFT_ORACLE = """
WITH users AS (
  SELECT user_id, MAX(CASE WHEN event_type = 'purchase' AND value > 90 THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1
),
assigned AS (
  SELECT converted,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS variant
  FROM users
),
pv AS (SELECT variant, COUNT(*) AS n, SUM(converted) AS conv FROM assigned GROUP BY 1),
a AS (SELECT n AS n_a, conv AS conv_a FROM pv WHERE variant = 0),
b AS (SELECT n AS n_b, conv AS conv_b FROM pv WHERE variant = 1)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
       CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
       CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS cvr_a,
       CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS cvr_b,
       (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
         / sqrt(((CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE)) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                * (1.0 - (CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE)) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) AS z_stat,
       abs((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
         / sqrt(((CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE)) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                * (1.0 - (CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE)) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))) > 1.96 AS significant
FROM a, b
"""


def mau_rollup_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly uniques by UNIONING stored daily HLL sketches
    (Datasketches ``hll_sketch_agg`` → ``hll_union_agg``) — the
    sketch-table pattern: at 100 TB the daily sketches are a few KB
    per day persisted at ingest time, and every MAU/WAU/rolling-
    uniques question is answered by merging sketches instead of
    re-scanning months of raw events.

    Like the other sketch gates, the comparable surface is the error
    contract: ``within_5pct`` asserts the merged-sketch estimate
    lands within ±5% of the exact monthly distinct (lgK=12 ⇒ rsd
    ≈1.6%, so 5% is a 3σ bound); the DuckDB oracle asserts the same
    bound on its own approx_count_distinct."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        F.date_format(F.col("ts"), "yyyy-MM").alias("month"),
        F.col("ts").cast("date").alias("day"),
    ).agg(F.hll_sketch_agg("user_id", 12).alias("sk"))
    monthly_sketch = daily.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_mau"),
    )
    exact = ev.groupBy(F.date_format(F.col("ts"), "yyyy-MM").alias("month")).agg(
        F.countDistinct("user_id").alias("exact_mau")
    )
    return (
        monthly_sketch.join(exact, "month")
        .select(
            "month",
            "n_days",
            "exact_mau",
            (
                F.abs(F.col("approx_mau") - F.col("exact_mau"))
                <= F.col("exact_mau") * F.lit(0.05)
            ).alias("within_5pct"),
        )
        .orderBy("month")
    )


MAU_ROLLUP_ORACLE = """
SELECT strftime(ts, '%Y-%m') AS month,
       CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       COUNT(DISTINCT user_id) AS exact_mau,
       abs(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
         <= COUNT(DISTINCT user_id) * 0.05 AS within_5pct
FROM events
GROUP BY 1
"""


def heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent items via a distributed Misra-Gries sketch: each
    partition keeps ≤ ``MG_K`` counters (mapInPandas over the shared
    :func:`rakam_api_spark.sketch.mg_update` kernel — vectorized
    value_counts merge + one generalized decrement per Arrow batch),
    and partition sketches merge by summed counters — the standard
    mergeable-summary result.

    Guarantees after the merge: every item with true frequency
    > N/(k+1) is retained, and each retained estimate lies in
    [exact − N/(k+1), exact].  Like ``dau_approx_sketch`` the
    comparable surface is the GUARANTEE, not the raw estimate: the
    output flags must come out true for every event type (each has
    frequency ≈ N/5 ≫ N/17), and the oracle asserts the same
    invariants as literals — a broken sketch flips a flag and fails
    the hash.  At 100 TB this is the only frequent-items plan that
    doesn't shuffle the raw stream: counter rows per partition are
    ≤ k, so the merge aggregation moves O(k × partitions) rows.
    """
    import pandas as pd

    from ..sketch import mg_update

    ev = _events(spark, sf_dir).select(F.col("event_type").alias("item"))

    def mg_partition(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            counters = mg_update(counters, pdf["item"], MG_K)
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "est": list(counters.values())}
            )

    merged = (
        ev.mapInPandas(mg_partition, "item string, est long")
        .groupBy("item")
        .agg(F.sum("est").alias("est"))
    )
    exact = ev.groupBy("item").agg(F.count(F.lit(1)).alias("exact_n"))
    totals = ev.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        exact.join(merged, "item", "left")
        .crossJoin(broadcast(totals))
        .select(
            "item",
            "exact_n",
            F.col("est").isNotNull().alias("retained"),
            (
                F.col("est").isNotNull()
                & (F.col("est") <= F.col("exact_n"))
                & (
                    F.col("est")
                    >= F.col("exact_n") - F.col("n_total") / F.lit(MG_K + 1)
                )
            ).alias("within_bounds"),
        )
        .orderBy("item")
    )


HEAVY_HITTERS_ORACLE = """
SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS exact_n,
       TRUE AS retained, TRUE AS within_bounds
FROM events GROUP BY 1
"""


def dau_approx_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily uniques via HyperLogLog++ (approx_count_distinct, 2%
    rsd) — the mergeable-sketch path that replaces exact distinct at
    100 TB.  Raw sketch estimates are engine-specific, so the
    comparable surface is a BOUNDS CHECK: alongside the exact count,
    ``within_5pct`` asserts the engine's own estimate lands within
    ±5% of exact.  Both Spark (HLL++) and the DuckDB oracle (its
    approx_count_distinct) must pass their own bound, making the row
    hash-comparable while still exercising each engine's sketch —
    the ±5% oracle the round-1 verdict asked for.  rsd 2% keeps a
    3.5× margin under the bound (max observed rel. error 1.42% at
    sf0.1, deterministic data → deterministic estimate) at a quarter
    of rsd 1%'s register cost."""
    ev = _events(spark, sf_dir)
    # Dedup to (day, user) pairs FIRST: HLL is duplicate-insensitive,
    # so the estimate is identical — but mixing countDistinct with a
    # second aggregate over raw rows planned an Expand (every row
    # duplicated per aggregate path); this shape is one partial-agg
    # distinct + one day-grain count (3.6→0.8 s warm at sf0.1 with
    # the rsd change)
    pairs = ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    return (
        pairs.groupBy("day")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
            F.count(F.lit(1)).alias("exact_users"),
        )
        .select(
            "day",
            "exact_users",
            (
                F.abs(F.col("approx") - F.col("exact_users"))
                <= F.col("exact_users") * F.lit(0.05)
            ).alias("within_5pct"),
        )
        .orderBy("day")
    )


DAU_APPROX_ORACLE = """
SELECT CAST(ts AS DATE) AS day,
       COUNT(DISTINCT user_id) AS exact_users,
       abs(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
         <= COUNT(DISTINCT user_id) * 0.05 AS within_5pct
FROM events
GROUP BY 1
"""


def stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stickiness: DAU / trailing-30-day uniques per day — the
    engagement ratio product analytics reports beside DAU/MAU.

    Same day-grain shape as ``rolling_uniques_7d``: events collapse
    to DISTINCT (day, user) pairs once; the 30-day fan-out joins the
    broadcast day spine, so cost tracks |days × daily actives|, not
    event volume.  The ratio is a double division of two exact
    counts."""
    ev = _events(spark, sf_dir)
    pairs = ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    days = pairs.select("day").distinct()
    fan = pairs.join(
        broadcast(days.select(F.col("day").alias("report_day"))),
        (F.col("day") <= F.col("report_day"))
        & (F.col("day") >= F.date_sub(F.col("report_day"), 29)),
    )
    return (
        fan.groupBy("report_day")
        .agg(
            F.countDistinct(F.when(F.col("day") == F.col("report_day"), F.col("user_id"))).alias("dau"),
            F.countDistinct("user_id").alias("mau30"),
        )
        .withColumn("stickiness", F.col("dau").cast("double") / F.col("mau30").cast("double"))
        .orderBy("report_day")
    )


STICKINESS_ORACLE = """
WITH pairs AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day AS report_day FROM pairs)
SELECT report_day,
       CAST(COUNT(DISTINCT CASE WHEN day = report_day THEN user_id END) AS BIGINT) AS dau,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau30,
       CAST(COUNT(DISTINCT CASE WHEN day = report_day THEN user_id END) AS DOUBLE)
         / CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS stickiness
FROM pairs JOIN days
  ON day <= report_day AND day >= report_day - INTERVAL 29 DAY
GROUP BY 1
"""


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: each user scored on Recency (days since
    last event), Frequency (event count), and Monetary (exact
    decimal value sum), split at the population average of each
    metric into 2×2×2 segments.

    Scale shape: one user-grain aggregation over events, one scalar
    aggregation for the three thresholds (broadcast cross join), one
    tiny 8-row rollup.  All thresholds are double divisions of exact
    integer/decimal sums, and per-user monetary is a decimal sum, so
    every comparison is bit-deterministic."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.max(F.col("ts").cast("date")).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("value").cast(DEC)).alias("monetary_dec"),
    )
    anchor = ev.agg(F.max(F.col("ts").cast("date")).alias("anchor_day"))
    scored = per_user.crossJoin(broadcast(anchor)).select(
        "user_id",
        F.datediff(F.col("anchor_day"), F.col("last_day")).alias("recency_days"),
        "frequency",
        "monetary_dec",
    )
    thr = scored.agg(
        (F.sum("recency_days").cast("double") / F.count(F.lit(1))).alias("avg_recency"),
        (F.sum("frequency").cast("double") / F.count(F.lit(1))).alias("avg_frequency"),
        (F.sum("monetary_dec").cast("double") / F.count(F.lit(1))).alias("avg_monetary"),
    )
    return (
        scored.crossJoin(broadcast(thr))
        .select(
            (F.col("recency_days").cast("double") <= F.col("avg_recency")).alias("r_active"),
            (F.col("frequency").cast("double") > F.col("avg_frequency")).alias("f_high"),
            (F.col("monetary_dec").cast("double") > F.col("avg_monetary")).alias("m_high"),
            "monetary_dec",
        )
        .groupBy("r_active", "f_high", "m_high")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("monetary_dec").cast("double").alias("segment_value"),
        )
        .orderBy("r_active", "f_high", "m_high")
    )


RFM_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         MAX(CAST(ts AS DATE)) AS last_day,
         COUNT(*) AS frequency,
         SUM(CAST(value AS DECIMAL(18,6))) AS monetary_dec
  FROM events GROUP BY user_id
),
anchor AS (SELECT MAX(CAST(ts AS DATE)) AS anchor_day FROM events),
scored AS (
  SELECT user_id,
         DATEDIFF('day', last_day, anchor_day) AS recency_days,
         frequency, monetary_dec
  FROM per_user, anchor
),
thr AS (
  SELECT CAST(SUM(recency_days) AS DOUBLE) / COUNT(*) AS avg_recency,
         CAST(SUM(frequency) AS DOUBLE) / COUNT(*) AS avg_frequency,
         CAST(SUM(monetary_dec) AS DOUBLE) / COUNT(*) AS avg_monetary
  FROM scored
)
SELECT CAST(recency_days AS DOUBLE) <= avg_recency AS r_active,
       CAST(frequency AS DOUBLE) > avg_frequency AS f_high,
       CAST(monetary_dec AS DOUBLE) > avg_monetary AS m_high,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(monetary_dec) AS DOUBLE) AS segment_value
FROM scored, thr
GROUP BY 1, 2, 3
"""


def user_lifecycle_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth-accounting lifecycle grid: per week, how many users are
    new (first active week), retained (also active the prior week),
    resurrected (returning after a gap), and dormant (active the
    prior week but not this one).

    The classic product-analytics report (Mixpanel/Amplitude
    lifecycle; the reference's retention feature flag is the closest
    analog, rakam-spi/.../UserPluginConfig.java:18-19).

    Plan shape: one distinct projection to (user, week) grain, then
    window functions sharing ONE user-partitioned sort (lag, lead,
    and first-week min reuse the same exchange), then a tiny
    week-grain aggregate.  Dormancy for weeks where no user was
    active at all is dropped by contract (left join on observed
    weeks).
    """
    ev = _events(spark, sf_dir)
    wk = F.date_trunc("week", F.col("ts")).cast("date")
    active = ev.select("user_id", wk.alias("week")).distinct()
    w_seq = Window.partitionBy("user_id").orderBy("week")
    w_all = Window.partitionBy("user_id")
    flagged = active.select(
        "user_id",
        "week",
        F.lag("week").over(w_seq).alias("prev_week"),
        F.lead("week").over(w_seq).alias("next_week"),
        F.min("week").over(w_all).alias("first_week"),
    )
    is_new = F.col("week") == F.col("first_week")
    is_retained = (~is_new) & (F.datediff(F.col("week"), F.col("prev_week")) == 7)
    counts = flagged.groupBy("week").agg(
        F.sum(F.when(is_new, 1).otherwise(0)).alias("n_new"),
        F.sum(F.when(is_retained, 1).otherwise(0)).alias("n_retained"),
        F.sum(F.when(~(is_new | is_retained), 1).otherwise(0)).alias("n_resurrected"),
    )
    dorm = (
        flagged.where(
            F.col("next_week").isNull() | (F.datediff(F.col("next_week"), F.col("week")) > 7)
        )
        .select(F.date_add(F.col("week"), 7).alias("week"))
        .groupBy("week")
        .agg(F.count(F.lit(1)).alias("n_dormant"))
    )
    return (
        counts.join(dorm, "week", "left_outer")
        .select(
            "week",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce(F.col("n_dormant"), F.lit(0)).alias("n_dormant"),
        )
        .orderBy("week")
    )


USER_LIFECYCLE_ORACLE = """
WITH active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events
), flagged AS (
  SELECT user_id, week,
         lag(week)  OVER (PARTITION BY user_id ORDER BY week) AS prev_week,
         lead(week) OVER (PARTITION BY user_id ORDER BY week) AS next_week,
         MIN(week)  OVER (PARTITION BY user_id) AS first_week
  FROM active
), counts AS (
  SELECT week,
         CAST(SUM(CASE WHEN week = first_week THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
         CAST(SUM(CASE WHEN week <> first_week AND date_diff('day', prev_week, week) = 7
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
         CAST(SUM(CASE WHEN week <> first_week AND date_diff('day', prev_week, week) > 7
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
  FROM flagged GROUP BY week
), dorm AS (
  SELECT week + 7 AS week, CAST(COUNT(*) AS BIGINT) AS n_dormant
  FROM flagged
  WHERE next_week IS NULL OR date_diff('day', week, next_week) > 7
  GROUP BY week + 7
)
SELECT counts.week AS week, n_new, n_retained, n_resurrected,
       COALESCE(n_dormant, 0) AS n_dormant
FROM counts LEFT OUTER JOIN dorm ON counts.week = dorm.week
"""


def funnel_with_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exclusion funnel: users who signed up, then purchased, with NO
    click event strictly between the two timestamps — the "converted
    without touching the promo" segment (exclusion steps are a
    standard funnel-builder feature the plain sequence funnel cannot
    express).

    Plan shape: two user-grain aggregations chained by user-keyed
    joins (co-located on a user-bucketed layout), the exclusion as a
    left-anti join against the offending users — never a per-user
    subquery.
    """
    ev = _events(spark, sf_dir).select("user_id", "event_type", _us().alias("us"))
    s1 = ev.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("us").alias("t1")
    )
    s2 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s1, "user_id")
        .where(F.col("us") >= F.col("t1"))
        .groupBy("user_id", "t1")
        .agg(F.min("us").alias("t2"))
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", F.col("us").alias("cus"))
    bad = (
        s2.join(clicks, "user_id")
        .where((F.col("cus") > F.col("t1")) & (F.col("cus") < F.col("t2")))
        .select("user_id")
        .distinct()
    )
    clean = s2.join(bad, "user_id", "left_anti")
    a1 = s1.agg(F.count(F.lit(1)).alias("n_signup"))
    a2 = s2.agg(F.count(F.lit(1)).alias("n_purchase_after"))
    a3 = clean.agg(F.count(F.lit(1)).alias("n_clean_converted"))
    return a1.crossJoin(a2).crossJoin(a3)


FUNNEL_EXCLUSION_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events WHERE event_type = 'signup' GROUP BY 1
), s2 AS (
  SELECT e.user_id, s1.t1, MIN(epoch_us(e.ts)) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s1.t1
  GROUP BY 1, 2
), bad AS (
  SELECT DISTINCT s2.user_id
  FROM s2 JOIN events e ON e.user_id = s2.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s2.t1 AND epoch_us(e.ts) < s2.t2
)
SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_signup,
       CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_purchase_after,
       CAST((SELECT COUNT(*) FROM s2 WHERE user_id NOT IN (SELECT user_id FROM bad)) AS BIGINT)
         AS n_clean_converted
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: count and row-normalized probability of each
    (event_type → next_type) step — the primitive behind
    Markov-chain attribution and next-action prediction.

    One user-partitioned window pass produces the consecutive pairs;
    the row totals reuse a tiny aggregate joined back on the 5-key
    type space; probabilities are double divisions of exact counts.
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(_us(), F.col("event_id"))
    pairs = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    counts = pairs.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    totals = counts.groupBy(F.col("event_type").alias("et")).agg(
        F.sum("n_transitions").alias("row_total")
    )
    return (
        counts.join(broadcast(totals), F.col("event_type") == F.col("et"))
        .select(
            "event_type",
            "next_type",
            "n_transitions",
            (F.col("n_transitions").cast("double") / F.col("row_total").cast("double")).alias(
                "prob"
            ),
        )
        .orderBy("event_type", "next_type")
    )


EVENT_TRANSITION_ORACLE = """
WITH pairs AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_type
  FROM events
), counts AS (
  SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM pairs WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
), totals AS (
  SELECT event_type AS et, SUM(n_transitions) AS row_total FROM counts GROUP BY event_type
)
SELECT event_type, next_type, n_transitions,
       CAST(n_transitions AS DOUBLE) / CAST(row_total AS DOUBLE) AS prob
FROM counts JOIN totals ON event_type = et
"""


def segment_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap: |users(A) ∩ users(B)| for every pair of
    event types — the "did A and B" segment intersection report.

    Scale shape: ONE groupBy collects each user's (bounded, ≤ |types|)
    type set, pair expansion runs row-locally on that tiny array, and
    a second aggregation counts pairs — never a user-set self-join
    (the oracle spells the equivalent self-join as the spec).
    """
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("ts")
    )
    pair_expr = F.expr(
        "flatten(transform(ts, (x, i) -> "
        "transform(slice(ts, i + 2, size(ts)), y -> struct(x AS t1, y AS t2))))"
    )
    return (
        per_user.select(F.explode(pair_expr).alias("p"))
        .select("p.t1", "p.t2")
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("n_users_both"))
        .orderBy("t1", "t2")
    )


SEGMENT_OVERLAP_ORACLE = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS t1, b.event_type AS t2, CAST(COUNT(*) AS BIGINT) AS n_users_both
FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY a.event_type, b.event_type
"""


def user_metric_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between per-user event count and active-day
    count, computed from EXACT integer sums (Σx, Σy, Σxy, Σx², Σy²
    are bigint-exact).  The final r chains ~9 IEEE double ops; unlike
    the repo's other float-emitting queries (single division/sqrt of
    exact integers) that chain is NOT guaranteed bit-identical across
    engine builds — an FMA-contracting build computes ``n*sxx - sx*sx``
    to a different last ulp.  So r is rounded to 9 decimal places on
    BOTH sides (|r| <= 1, so 9 decimals ≈ 9 significant digits), which
    absorbs any 1-ulp divergence while the integer moments stay exact.

    One user-grain aggregation + one single-row moment aggregate.
    """
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("x"),
        F.countDistinct(F.col("ts").cast("date")).alias("y"),
    )
    m = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n").cast("double"), F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    r = (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
    return m.select("n", "sx", "sy", F.round(r, 9).alias("pearson_r"))


USER_METRIC_CORR_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS y
  FROM events GROUP BY user_id
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM per_user
)
SELECT n, CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
       ROUND(
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
         9) AS pearson_r
FROM m
"""


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts PIVOTed to one column per event type — the
    wide dashboard matrix.  The pivot value list is explicit, which
    (a) pins the output schema deterministically and (b) lets Spark
    skip the extra distinct-values job a dynamic pivot needs.  Spark
    lowers this to a partial-aggregated (day, event_type) rollup
    followed by the pivot aggregate — two map-side-combined
    aggregations, no pre-scan.
    """
    ev = _events(spark, sf_dir)
    piv = (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES]
    ).orderBy("day")


EVENTS_PIVOT_ORACLE = """
SELECT CAST(ts AS DATE) AS day,
       CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events
GROUP BY CAST(ts AS DATE)
"""


def hourly_counts_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly time series per event type: a generated hour
    spine × the type dimension, left-joined onto the sparse hourly
    aggregate with zero fill — the densification step every
    time-series chart and anomaly detector needs (the raw hourly
    grid here has ~6% empty cells that would otherwise vanish).

    Scale shape: the spine is generated from a single-row min/max
    aggregate (``sequence`` + explode — rows ∝ hours, not events),
    the type dim broadcasts, and the left join shuffles only the
    hour-grain aggregate, never raw events.
    """
    ev = _events(spark, sf_dir)
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = ev.groupBy(hour.alias("hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour")
    )
    types = ev.select("event_type").distinct()
    return (
        spine.crossJoin(broadcast(types))
        .join(hourly, ["hour", "event_type"], "left_outer")
        .select(
            "hour",
            "event_type",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        )
        .orderBy("hour", "event_type")
    )


HOURLY_GAPFILL_ORACLE = """
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1 FROM events
), spine AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds
), types AS (SELECT DISTINCT event_type FROM events),
hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT s.hour AS hour, t.event_type AS event_type, COALESCE(h.n_events, 0) AS n_events
FROM spine s CROSS JOIN types t
LEFT OUTER JOIN hourly h ON h.hour = s.hour AND h.event_type = t.event_type
"""


def power_user_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-user curve: how many users were active on exactly N
    distinct days — the engagement-distribution report (the Q13
    count-of-counts shape on the events stream).

    Two-level aggregation: user-grain distinct-day count shuffles
    once on user_id (co-located on a user-bucketed layout), then a
    tiny count-of-counts regroup over ≤ |days| keys.
    """
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.countDistinct(F.col("ts").cast("date")).alias("n_active_days")
    )
    return (
        per_user.groupBy("n_active_days")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_active_days"))
    )


POWER_USER_CURVE_ORACLE = """
SELECT n_active_days, CAST(COUNT(*) AS BIGINT) AS n_users
FROM (
  SELECT user_id, CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_active_days
  FROM events GROUP BY user_id
)
GROUP BY n_active_days
"""


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type (bin width 50) —
    the distribution report behind a dashboard histogram widget.

    One hash aggregation on a tiny (event_type, bin) key space; the
    bin is an exact integer floor of a double division, identical in
    both engines; sums are decimal-exact.
    """
    ev = _events(spark, sf_dir)
    bin_col = F.floor(F.col("value") / F.lit(50.0)).cast("int")
    return (
        ev.groupBy("event_type", (bin_col * 50).alias("bin_low"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .orderBy("event_type", "bin_low")
    )


VALUE_HISTOGRAM_ORACLE = """
SELECT event_type,
       CAST(FLOOR(value / 50.0) AS INT) * 50 AS bin_low,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type, CAST(FLOOR(value / 50.0) AS INT) * 50
"""


def quantile_rollup_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type quantiles by MERGING stored daily KLL sketches
    (Datasketches ``kll_sketch_agg_double`` → ``kll_merge_agg_double``
    → ``kll_sketch_get_quantile_double``) — the quantile analog of
    ``mau_rollup_sketch``: at 100 TB the per-(type, day) sketches are
    a few KB persisted at ingest/compaction time, and every "p99 over
    an arbitrary date range" question is answered by merging sketches
    instead of re-sorting months of raw values.

    Sketch point estimates are engine-specific (DuckDB has t-digest,
    not KLL), so (same pattern as the other sketch gates) the
    comparable surface is a RANK-ERROR BOUNDS CHECK: the merged-
    sketch quantile must land between the exact percentiles at
    q∓0.03 (KLL k=200 ⇒ ~1.3% rank error at 3σ; merging preserves
    the bound), and the oracle asserts the same band on its own
    approx_quantile."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.expr("kll_sketch_agg_double(value, 200)").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    merged = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("n_events"),
        F.expr("kll_merge_agg_double(sk)").alias("msk"),
    )
    q = lambda p: F.expr(f"kll_sketch_get_quantile_double(msk, cast({p} as double))")
    ex = lambda p: F.expr(f"percentile(value, {p})")
    exact = ev.groupBy("event_type").agg(
        *[ex(p).alias(f"_e{i}") for i, p in enumerate(
            (0.47, 0.53, 0.87, 0.93, 0.96, 1.0))]
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "n_days",
            "n_events",
            ((q(0.5) >= F.col("_e0")) & (q(0.5) <= F.col("_e1"))).alias("p50_in_bounds"),
            ((q(0.9) >= F.col("_e2")) & (q(0.9) <= F.col("_e3"))).alias("p90_in_bounds"),
            ((q(0.99) >= F.col("_e4")) & (q(0.99) <= F.col("_e5"))).alias("p99_in_bounds"),
        )
        .orderBy("event_type")
    )


QUANTILE_ROLLUP_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       approx_quantile(value, 0.5) BETWEEN quantile_cont(value, 0.47)
                                       AND quantile_cont(value, 0.53) AS p50_in_bounds,
       approx_quantile(value, 0.9) BETWEEN quantile_cont(value, 0.87)
                                       AND quantile_cont(value, 0.93) AS p90_in_bounds,
       approx_quantile(value, 0.99) BETWEEN quantile_cont(value, 0.96)
                                        AND quantile_cont(value, 1.0) AS p99_in_bounds
FROM events
GROUP BY event_type
"""


def theta_segment_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set arithmetic on Theta sketches: one sketch of
    user_id per event-type segment, |A∪B| per segment pair via
    ``theta_union_agg`` over the two stored sketches, and the overlap
    |A∩B| by inclusion-exclusion — the mergeable-sketch answer to
    "how many users did both X and Y" that at 100 TB reads KB-sized
    sketches instead of re-intersecting raw user sets.

    The pair fan-out stacks the tiny per-segment sketch table twice
    (|types|² rows of a few KB) — raw events are scanned exactly
    once, for the sketches.  Estimates are engine-specific, so the
    gate is the error contract: union and overlap estimates must land
    within ±5% of the exact |A∪B| (theta default lgK=12 ⇒ rsd ≈1.6%;
    the overlap inherits ~3 sketches' error, 5% ≈ 3σ headroom); the
    oracle asserts the same band on DuckDB's approx_count_distinct."""
    ev = _events(spark, sf_dir)
    pairs_du = ev.select("event_type", "user_id").distinct()
    sk = ev.groupBy("event_type").agg(
        F.expr("theta_sketch_agg(user_id)").alias("sk"),
        F.countDistinct("user_id").alias("exact_n"),
    )
    a = sk.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("exact_n").alias("exact_a"),
    )
    b = sk.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("exact_n").alias("exact_b"),
    )
    pairs = a.join(broadcast(b), F.col("type_a") < F.col("type_b"))
    # theta_union_agg is an aggregate: stack each pair's two sketches
    # as two rows and re-group (the stacked frame is |types|² rows)
    stacked = pairs.select("type_a", "type_b", F.col("sk_a").alias("sk")).unionAll(
        pairs.select("type_a", "type_b", F.col("sk_b").alias("sk"))
    )
    unions = stacked.groupBy("type_a", "type_b").agg(
        F.expr("theta_sketch_estimate(theta_union_agg(sk))").alias("approx_union")
    )
    exact_ov = (
        pairs_du.alias("x")
        .join(pairs_du.alias("y"), F.col("x.user_id") == F.col("y.user_id"))
        .where(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.countDistinct("x.user_id").alias("exact_overlap"))
    )
    est = lambda c: F.col(c).cast("double")
    return (
        pairs.select("type_a", "type_b", "exact_a", "exact_b")
        .join(unions, ["type_a", "type_b"])
        .join(exact_ov, ["type_a", "type_b"])
        .withColumn("exact_union", F.col("exact_a") + F.col("exact_b") - F.col("exact_overlap"))
        .withColumn(
            "approx_overlap",
            est("exact_a") + est("exact_b") - est("approx_union"),
        )
        .select(
            "type_a",
            "type_b",
            "exact_overlap",
            "exact_union",
            (
                F.abs(est("approx_union") - est("exact_union"))
                <= est("exact_union") * F.lit(0.05)
            ).alias("union_in_bounds"),
            (
                F.abs(F.col("approx_overlap") - est("exact_overlap"))
                <= est("exact_union") * F.lit(0.05)
            ).alias("overlap_in_bounds"),
        )
        .orderBy("type_a", "type_b")
    )


THETA_SETOPS_ORACLE = """
WITH d AS (SELECT DISTINCT event_type AS t, user_id AS u FROM events),
cnt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS exact_n, approx_count_distinct(u) AS approx_n
        FROM d GROUP BY t),
ov AS (SELECT x.t AS type_a, y.t AS type_b, CAST(COUNT(DISTINCT x.u) AS BIGINT) AS exact_overlap
       FROM d x JOIN d y ON x.u = y.u AND x.t < y.t GROUP BY 1, 2),
un AS (SELECT p.type_a, p.type_b,
              CAST(COUNT(DISTINCT d.u) AS BIGINT) AS exact_union,
              approx_count_distinct(d.u) AS approx_union
       FROM (SELECT a.t AS type_a, b.t AS type_b FROM cnt a JOIN cnt b ON a.t < b.t) p
       JOIN d ON d.t IN (p.type_a, p.type_b)
       GROUP BY 1, 2)
SELECT un.type_a, un.type_b, ov.exact_overlap, un.exact_union,
       abs(CAST(un.approx_union AS DOUBLE) - CAST(un.exact_union AS DOUBLE))
         <= CAST(un.exact_union AS DOUBLE) * 0.05 AS union_in_bounds,
       abs((CAST(ca.approx_n AS DOUBLE) + CAST(cb.approx_n AS DOUBLE)
            - CAST(un.approx_union AS DOUBLE)) - CAST(ov.exact_overlap AS DOUBLE))
         <= CAST(un.exact_union AS DOUBLE) * 0.05 AS overlap_in_bounds
FROM un
JOIN ov USING (type_a, type_b)
JOIN cnt ca ON ca.t = un.type_a
JOIN cnt cb ON cb.t = un.type_b
ORDER BY type_a, type_b
"""


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each ``purchase`` is credited to the
    user's most recent ``click`` within the 7 preceding days, and
    revenue rolls up to the touch's day — the marketing-attribution
    report product-analytics stacks build on the event stream.

    Single pass, no self-join: touches and conversions interleave in
    one user-partitioned window ordered by event time; the credited
    touch is ``last(touch_time, ignorenulls) OVER (… ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)`` — strictly earlier rows
    only, ties broken by event_id identically in the oracle.  One
    shuffle on user_id (co-located if the table is user-bucketed);
    the day-grain rollup is tiny."""
    ev = _events(spark, sf_dir)
    sub = ev.where(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "event_type",
        "event_id",
        "value",
        _us().alias("_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_us = F.last(
        F.when(F.col("event_type") == "click", F.col("_us")), ignorenulls=True
    ).over(w)
    conv = (
        sub.withColumn("touch_us", touch_us)
        .where(
            (F.col("event_type") == "purchase")
            & F.col("touch_us").isNotNull()
            & (F.col("_us") - F.col("touch_us") <= F.lit(7 * 24 * US_PER_HOUR))
        )
    )
    day_us = 24 * US_PER_HOUR
    return (
        conv.groupBy(
            F.expr(f"date_add(date'1970-01-01', cast(touch_us div {day_us} as int))").alias("touch_day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("attributed_revenue"),
            (
                F.sum(F.col("_us") - F.col("touch_us")).cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(float(US_PER_HOUR))
            ).alias("avg_lag_hours"),
        )
        .orderBy("touch_day")
    )


ATTRIBUTION_ORACLE = """
WITH sub AS (
  SELECT user_id, event_type, event_id, value, epoch_us(ts) AS us
  FROM events WHERE event_type IN ('click', 'purchase')
),
conv AS (
  SELECT *,
         last(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_us
  FROM sub
)
SELECT CAST(to_timestamp((touch_us // 86400000000) * 86400) AS DATE) AS touch_day,
       CAST(COUNT(*) AS BIGINT) AS n_conversions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS attributed_revenue,
       CAST(SUM(us - touch_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 3600000000.0 AS avg_lag_hours
FROM conv
WHERE event_type = 'purchase' AND touch_us IS NOT NULL
  AND us - touch_us <= 7 * 24 * 3600000000
GROUP BY 1
ORDER BY 1
"""


def session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry/exit analysis over 30-min-gap sessions: how sessions
    begin and end — the landing/exit-page report, on event types.

    Reuses the ``sessionize`` kernel (one user-keyed window), then
    ``min_by``/``max_by`` pick each session's first and last event in
    one hash aggregate; the (entry, exit) matrix is |types|² rows.
    Tie-break within a session is (time, event_id), identical in the
    oracle (which packs the two keys into one HUGEINT because DuckDB
    min_by takes no composite key; event_id < 10^10 keeps the packing
    order-isomorphic)."""
    sess = sessionize(_events(spark, sf_dir))
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.min_by("event_type", F.struct(F.col("_us"), F.col("event_id"))).alias("entry_type"),
        F.max_by("event_type", F.struct(F.col("_us"), F.col("event_id"))).alias("exit_type"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        per_session.groupBy("entry_type", "exit_type")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("n_bounces"),
            (
                F.sum("n").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("avg_events_per_session"),
        )
        .orderBy("entry_type", "exit_type")
    )


SESSION_ENTRY_EXIT_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
), sessions AS (
  SELECT user_id, event_id, event_type, us,
         SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM ordered
), per_session AS (
  SELECT user_id, session_id,
         min_by(event_type, CAST(us AS HUGEINT) * 10000000000 + event_id) AS entry_type,
         max_by(event_type, CAST(us AS HUGEINT) * 10000000000 + event_id) AS exit_type,
         COUNT(*) AS n
  FROM sessions GROUP BY 1, 2
)
SELECT entry_type, exit_type,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_events_per_session
FROM per_session GROUP BY 1, 2 ORDER BY 1, 2
"""


def rollup_reuse_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-grain report answered FROM the day-grain rollup — the
    algebraic-reaggregation contract behind the store's incremental
    rollup maintenance (store.publish_rollup): counts re-sum, decimal
    sums re-sum exactly, min/max re-extremize, so a month/quarter/
    year question never rescans raw events.  The oracle computes the
    same report from raw, proving the two-level aggregation is
    lossless.

    At 100 TB the day grain is ~|types|·|days| rows regardless of
    event volume; this query's cost is independent of the raw table
    after the first (maintained-incrementally) pass."""
    ev = _events(spark, sf_dir)
    day_grain = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC)).alias("sv"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    return (
        day_grain.groupBy(
            F.date_format(F.col("day"), "yyyy-MM").alias("month"), "event_type"
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("sv").cast("double").alias("total_value"),
            F.min("mn").alias("min_value"),
            F.max("mx").alias("max_value"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .orderBy("month", "event_type")
    )


ROLLUP_REUSE_ORACLE = """
WITH day_grain AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS sv,
         MIN(value) AS mn, MAX(value) AS mx
  FROM events GROUP BY 1, 2
)
SELECT strftime(day, '%Y-%m') AS month, event_type,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(SUM(sv) AS DOUBLE) AS total_value,
       MIN(mn) AS min_value,
       MAX(mx) AS max_value,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM day_grain GROUP BY 1, 2 ORDER BY 1, 2
"""


def funnel_unordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Any-order funnel: users who performed the step set {signup,
    click, purchase} in ANY order, bucketed by how many distinct
    steps they reached, with the count of those whose first
    occurrences all fall inside a 72 h span — the unordered
    complement of the strict-sequence funnels.

    Plan: first-occurrence per (user, step) is one hash aggregate,
    the per-user rollup reuses the same user_id partitioning (no
    second exchange), and the output is ≤ |steps| rows.  Pure integer
    time math."""
    ev = _events(spark, sf_dir)
    steps = (
        ev.where(F.col("event_type").isin("signup", "click", "purchase"))
        .groupBy("user_id", "event_type")
        .agg(F.min(_us()).alias("first_us"))
    )
    per_user = steps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_steps_done"),
        (F.max("first_us") - F.min("first_us")).alias("span_us"),
    )
    return (
        per_user.groupBy("n_steps_done")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(
                F.when(F.col("span_us") <= F.lit(72 * US_PER_HOUR), 1).otherwise(0)
            ).alias("n_within_72h"),
        )
        .orderBy("n_steps_done")
    )


FUNNEL_UNORDERED_ORACLE = """
WITH steps AS (
  SELECT user_id, event_type, MIN(epoch_us(ts)) AS first_us
  FROM events WHERE event_type IN ('signup', 'click', 'purchase')
  GROUP BY 1, 2
),
per_user AS (
  SELECT user_id, COUNT(*) AS n_steps_done,
         MAX(first_us) - MIN(first_us) AS span_us
  FROM steps GROUP BY 1
)
SELECT CAST(n_steps_done AS BIGINT) AS n_steps_done,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN span_us <= 72 * 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_within_72h
FROM per_user GROUP BY 1 ORDER BY 1
"""


def funnel_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily funnel conversion trend: for each signup DAY, how many
    of that day's signup users clicked later that same day, and how
    many purchased after the click — the time-series view of the
    strict-order funnel (per-day cohorts, not a single total).

    Per-user-day first-occurrence times come from one conditional
    aggregation (no joins between steps); the strict ordering is
    enforced by time comparison inside the day.  Integer epoch math
    throughout."""
    ev = _events(spark, sf_dir)
    day = F.col("ts").cast("date").alias("day")
    per_user_day = ev.groupBy(day, "user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", _us())).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "click", _us())).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", _us())).alias("t_purchase"),
    )
    stepped = per_user_day.select(
        "day",
        F.col("t_signup").isNotNull().alias("s1"),
        (
            F.col("t_signup").isNotNull()
            & F.col("t_click").isNotNull()
            & (F.col("t_click") > F.col("t_signup"))
        ).alias("s2"),
        (
            F.col("t_signup").isNotNull()
            & F.col("t_click").isNotNull()
            & (F.col("t_click") > F.col("t_signup"))
            & F.col("t_purchase").isNotNull()
            & (F.col("t_purchase") > F.col("t_click"))
        ).alias("s3"),
    )
    return (
        stepped.groupBy("day")
        .agg(
            F.sum(F.col("s1").cast("long")).alias("n_signup"),
            F.sum(F.col("s2").cast("long")).alias("n_clicked"),
            F.sum(F.col("s3").cast("long")).alias("n_purchased"),
        )
        .where(F.col("n_signup") > 0)
        .withColumn(
            "conversion",
            F.col("n_purchased").cast("double") / F.col("n_signup").cast("double"),
        )
        .orderBy("day")
    )


FUNNEL_DAILY_TREND_ORACLE = """
WITH per_user_day AS (
  SELECT CAST(ts AS DATE) AS day, user_id,
         MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t_signup,
         MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
  FROM events GROUP BY 1, 2
),
stepped AS (
  SELECT day,
         t_signup IS NOT NULL AS s1,
         (t_signup IS NOT NULL AND t_click IS NOT NULL AND t_click > t_signup) AS s2,
         (t_signup IS NOT NULL AND t_click IS NOT NULL AND t_click > t_signup
          AND t_purchase IS NOT NULL AND t_purchase > t_click) AS s3
  FROM per_user_day
)
SELECT day,
       CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked,
       CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased,
       CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS DOUBLE) AS conversion
FROM stepped GROUP BY 1
HAVING SUM(CASE WHEN s1 THEN 1 ELSE 0 END) > 0
ORDER BY 1
"""


def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostics: per event_type, the share of
    rows held by the hottest user and by the top-10 users — the
    report an operator reads before choosing salting / AQE skew-join
    for a user-keyed stage.  Two hash aggregates (user grain, then
    type grain) + one partitioned top-10 window over the USER-GRAIN
    aggregate (never raw events)."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("user_id"))
    ranked = per_user.withColumn("rnk", F.row_number().over(w))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.sum("n").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max(F.when(F.col("rnk") == 1, F.col("n"))).alias("top1_rows"),
            F.coalesce(
                F.sum(F.when(F.col("rnk") <= 10, F.col("n"))), F.lit(0)
            ).alias("top10_rows"),
        )
        .select(
            "event_type",
            "n_rows",
            "n_keys",
            (F.col("top1_rows").cast("double") / F.col("n_rows").cast("double")).alias("top1_share"),
            (F.col("top10_rows").cast("double") / F.col("n_rows").cast("double")).alias("top10_share"),
        )
        .orderBy("event_type")
    )


KEY_SKEW_ORACLE = """
WITH per_user AS (
  SELECT event_type, user_id, COUNT(*) AS n FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, n,
         row_number() OVER (PARTITION BY event_type ORDER BY n DESC, user_id ASC) AS rnk
  FROM per_user
)
SELECT event_type,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(MAX(CASE WHEN rnk = 1 THEN n END) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS top1_share,
       CAST(COALESCE(SUM(CASE WHEN rnk <= 10 THEN n END), 0) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS top10_share
FROM ranked GROUP BY 1 ORDER BY 1
"""


def daily_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily audience split: users active on each day partitioned
    into first-ever-seen ("new") vs returning — the daily companion
    of the weekly lifecycle grid.

    One distinct (user, day) projection; first-seen day via a
    user-partitioned min window sharing the same exchange; day-grain
    rollup with an exact-integer share division."""
    ev = _events(spark, sf_dir)
    pairs = ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    w = Window.partitionBy("user_id")
    flagged = pairs.withColumn("first_day", F.min("day").over(w))
    return (
        flagged.groupBy("day")
        .agg(
            F.sum((F.col("day") == F.col("first_day")).cast("long")).alias("n_new"),
            F.sum((F.col("day") != F.col("first_day")).cast("long")).alias("n_returning"),
        )
        .withColumn(
            "new_share",
            F.col("n_new").cast("double")
            / (F.col("n_new") + F.col("n_returning")).cast("double"),
        )
        .orderBy("day")
    )


DAILY_NEW_RETURNING_ORACLE = """
WITH pairs AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
flagged AS (
  SELECT day, user_id, MIN(day) OVER (PARTITION BY user_id) AS first_day FROM pairs
)
SELECT day,
       CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(SUM(CASE WHEN day <> first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_returning,
       CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS new_share
FROM flagged GROUP BY 1 ORDER BY 1
"""


def market_basket_part_types(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Market-basket affinity over orders: which PART TYPES co-occur
    in the same order more than their popularity predicts (lift =
    P(a,b) / (P(a)·P(b))) — the retail affinity report, on the TPC-H
    star schema.

    Baskets collapse to per-order DISTINCT type SETS in ONE orderkey
    collect_set aggregate (r16: replaces the former (order, type)
    distinct + basket self-join — the set dedups, and the in-array
    i<j expansion is row-local, bounded by |types|² ≤ 6², so the
    fact shuffles once instead of a distinct exchange plus a
    two-sided join re-shuffle, guide §2.4); singles and the basket
    count re-derive from the same per-order frame.  The basket count
    is a single-row aggregate joined in via crossJoin(broadcast(...))
    — NOT an eager driver-side .count() — so the whole query is one
    plan with no driver barrier.  Lift is computed from exact
    integer counts with IEEE divisions in a fixed order."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        li.join(broadcast(part.select("p_partkey", "p_type")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_orderkey").alias("okey"))
        .agg(F.sort_array(F.collect_set("p_type")).alias("ts"))
    )
    nb_row = per_order.agg(F.count(F.lit(1)).cast("double").alias("n_baskets"))
    singles = per_order.select(F.explode("ts").alias("p_type")).groupBy(
        "p_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    pair_expr = F.expr(
        "flatten(transform(ts, (x, i) -> "
        "transform(slice(ts, i + 2, size(ts)), y -> struct(x AS type_a, y AS type_b))))"
    )
    pairs = (
        per_order.select(F.explode(pair_expr).alias("tp"))
        .select("tp.type_a", "tp.type_b")
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    na = singles.select(F.col("p_type").alias("type_a"), F.col("n").alias("n_a"))
    nb = singles.select(F.col("p_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(broadcast(na), "type_a")
        .join(broadcast(nb), "type_b")
        .crossJoin(broadcast(nb_row))
        .withColumn(
            "lift",
            (F.col("n_both").cast("double") / F.col("n_baskets"))
            / (
                (F.col("n_a").cast("double") / F.col("n_baskets"))
                * (F.col("n_b").cast("double") / F.col("n_baskets"))
            ),
        )
        .select("type_a", "type_b", "n_both", "n_a", "n_b", "lift")
        .orderBy(F.desc("n_both"), F.asc("type_a"), F.asc("type_b"))
        .limit(k)
    )


MARKET_BASKET_ORACLE = """
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS okey, p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
nb AS (SELECT CAST(COUNT(DISTINCT okey) AS DOUBLE) AS n_baskets FROM baskets),
singles AS (SELECT p_type, COUNT(*) AS n FROM baskets GROUP BY 1),
pairs AS (
  SELECT a.p_type AS type_a, b.p_type AS type_b, COUNT(*) AS n_both
  FROM baskets a JOIN baskets b ON a.okey = b.okey AND a.p_type < b.p_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, CAST(n_both AS BIGINT) AS n_both,
       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       (CAST(n_both AS DOUBLE) / n_baskets)
         / ((CAST(sa.n AS DOUBLE) / n_baskets) * (CAST(sb.n AS DOUBLE) / n_baskets)) AS lift
FROM pairs
JOIN singles sa ON sa.p_type = pairs.type_a
JOIN singles sb ON sb.p_type = pairs.type_b, nb
ORDER BY n_both DESC, type_a ASC, type_b ASC
LIMIT 20
"""


def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR multi-touch attribution: each ``purchase`` splits its
    credit EQUALLY over every ``click`` in the user's 7-day lookback
    (vs last-touch's winner-takes-all) — the second standard
    attribution model marketing stacks offer.

    Plan: a RANGE-frame window counts each conversion's in-window
    touches (one user-keyed shuffle), then conversions join back to
    their touches on (user, time-range) — a user-equi join with a
    range residual, bounded by touches-per-user-week, never a blind
    interval join.  Per-pair credit is 1/n; cross-engine float
    SUMMATION ORDER makes Σ(1/n) differ in last ulps, so credited
    sums are rounded to 6 decimals on BOTH sides (error ≤ n·ulp ≈
    1e-12 ≪ 5e-7) — the established gate pattern for multi-term
    float reductions (cf. ``user_metric_correlation``)."""
    ev = _events(spark, sf_dir)
    week_us = 7 * 24 * US_PER_HOUR
    sub = ev.where(F.col("event_type").isin("click", "purchase")).select(
        "user_id", "event_type", "event_id", "value", _us().alias("_us")
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy("_us")
        .rangeBetween(-week_us, -1)
    )
    n_touches = F.sum(
        F.when(F.col("event_type") == "click", F.lit(1)).otherwise(F.lit(0))
    ).over(wr)
    conv = (
        sub.withColumn("n_touches", n_touches)
        .where((F.col("event_type") == "purchase") & (F.col("n_touches") > 0))
        .select(
            F.col("user_id").alias("c_user"),
            F.col("_us").alias("conv_us"),
            F.col("value").alias("conv_value"),
            "n_touches",
        )
    )
    touches = sub.where(F.col("event_type") == "click").select(
        "user_id", F.col("_us").alias("touch_us")
    )
    day_us = 24 * US_PER_HOUR
    pairs = conv.join(
        touches,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("touch_us") >= F.col("conv_us") - week_us)
        & (F.col("touch_us") <= F.col("conv_us") - 1),
    )
    inv = F.lit(1.0) / F.col("n_touches").cast("double")
    return (
        pairs.groupBy(
            F.expr(f"date_add(date'1970-01-01', cast(touch_us div {day_us} as int))").alias("touch_day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum(inv), 6).alias("credited_conversions"),
            F.round(F.sum(F.col("conv_value") * inv), 6).alias("attributed_revenue"),
        )
        .orderBy("touch_day")
    )


ATTRIBUTION_LINEAR_ORACLE = """
WITH sub AS (
  SELECT user_id, event_type, event_id, value, epoch_us(ts) AS us
  FROM events WHERE event_type IN ('click', 'purchase')
),
conv AS (
  SELECT user_id AS c_user, us AS conv_us, value AS conv_value,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY us
           RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING) AS n_touches
  FROM sub
  QUALIFY event_type = 'purchase' AND n_touches > 0
),
pairs AS (
  SELECT t.us AS touch_us, conv_value, n_touches
  FROM conv JOIN sub t
    ON t.user_id = c_user AND t.event_type = 'click'
   AND t.us >= conv_us - 604800000000 AND t.us <= conv_us - 1
)
SELECT CAST(to_timestamp((touch_us // 86400000000) * 86400) AS DATE) AS touch_day,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(SUM(1.0 / CAST(n_touches AS DOUBLE)), 6) AS credited_conversions,
       ROUND(SUM(conv_value * (1.0 / CAST(n_touches AS DOUBLE))), 6) AS attributed_revenue
FROM pairs
GROUP BY 1
ORDER BY 1
"""


def ship_latency_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency quartiles per order priority: days from
    order date to FIRST and LAST lineitem shipment — the fulfillment
    SLA report on the star schema.

    One lineitem⋈orders fact join (the only wide shuffle), an
    order-grain min/max aggregate, then exact linear-interpolation
    percentiles per priority (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont`` on the same integral day counts).  SCALE
    CONTRACT: five priority groups × O(orders) buffered values —
    at 100 TB swap ``approx_percentile`` (mergeable sketch, same
    call shape; bounds-gating pattern in
    :func:`inter_event_cadence_sketch`).  The interpolated
    values are rounded to 9 decimals on both sides: the two engines'
    interpolation FORMULAS (``(1-f)·a + f·b`` vs ``a + (b-a)·f``)
    can differ in the last ulp under FMA contraction — the same
    cross-engine-build hazard that red-flagged the unrounded Pearson
    chain in round 5."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    per_order = (
        li.join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(
            F.min(F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))).alias("first_ship_days"),
            F.max(F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))).alias("last_ship_days"),
        )
    )
    return (
        per_order.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.expr("percentile(first_ship_days, 0.25)"), 9).alias("first_p25"),
            F.round(F.expr("percentile(first_ship_days, 0.5)"), 9).alias("first_p50"),
            F.round(F.expr("percentile(last_ship_days, 0.75)"), 9).alias("last_p75"),
            F.round(F.expr("percentile(last_ship_days, 0.95)"), 9).alias("last_p95"),
        )
        .orderBy("o_orderpriority")
    )


SHIP_LATENCY_ORACLE = """
WITH per_order AS (
  SELECT l_orderkey, o_orderpriority,
         MIN(datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS first_ship_days,
         MAX(datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS last_ship_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(quantile_cont(first_ship_days, 0.25), 9) AS first_p25,
       ROUND(quantile_cont(first_ship_days, 0.5), 9) AS first_p50,
       ROUND(quantile_cont(last_ship_days, 0.75), 9) AS last_p75,
       ROUND(quantile_cont(last_ship_days, 0.95), 9) AS last_p95
FROM per_order
GROUP BY 1
ORDER BY 1
"""


_CORR_METRICS = ("n_clicks", "n_views", "n_purchases", "active_days")


def metric_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation MATRIX over per-user engagement
    metrics (clicks, views, purchases, active days) — the
    engagement-correlation dashboard generalizing
    ``user_metric_correlation`` to all metric pairs.

    ONE user-grain aggregation and ONE single-row moment aggregate
    compute every pair's moments (Σx, Σy, Σxy, Σx², Σy² are
    bigint-exact); each r is the fixed IEEE chain rounded to 9
    decimals on both sides (the established cross-engine contract
    for multi-op float chains).  Output: one row per unordered pair."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("n_clicks"),
        F.sum((F.col("event_type") == "view").cast("long")).alias("n_views"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("n_purchases"),
        F.countDistinct(F.col("ts").cast("date")).alias("active_days"),
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for m in _CORR_METRICS:
        aggs.append(F.sum(m).alias(f"s_{m}"))
        aggs.append(F.sum(F.col(m) * F.col(m)).alias(f"ss_{m}"))
    for i, a in enumerate(_CORR_METRICS):
        for bb in _CORR_METRICS[i + 1 :]:
            aggs.append(F.sum(F.col(a) * F.col(bb)).alias(f"sp_{a}_{bb}"))
    mrow = per_user.agg(*aggs)
    pairs = []
    for i, a in enumerate(_CORR_METRICS):
        for bb in _CORR_METRICS[i + 1 :]:
            n = F.col("n").cast("double")
            sx, sy = F.col(f"s_{a}").cast("double"), F.col(f"s_{bb}").cast("double")
            sxx, syy = F.col(f"ss_{a}").cast("double"), F.col(f"ss_{bb}").cast("double")
            sxy = F.col(f"sp_{a}_{bb}").cast("double")
            r = (n * sxy - sx * sy) / (
                F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
            )
            pairs.append(
                F.struct(
                    F.lit(a).alias("metric_a"),
                    F.lit(bb).alias("metric_b"),
                    F.round(r, 9).alias("pearson_r"),
                )
            )
    return (
        mrow.select(F.explode(F.array(*pairs)).alias("p"))
        .select("p.metric_a", "p.metric_b", "p.pearson_r")
        .orderBy("metric_a", "metric_b")
    )


def _corr_matrix_oracle() -> str:
    cell = (
        "ROUND((CAST(n AS DOUBLE) * CAST(sp_{a}_{b} AS DOUBLE)"
        " - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
        " / (SQRT(CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE) - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
        " * SQRT(CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE) - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))), 9)"
    )
    sums = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for m in _CORR_METRICS:
        sums.append(f"SUM({m}) AS s_{m}")
        sums.append(f"SUM({m} * {m}) AS ss_{m}")
    rows = []
    for i, a in enumerate(_CORR_METRICS):
        for b in _CORR_METRICS[i + 1 :]:
            sums.append(f"SUM({a} * {b}) AS sp_{a}_{b}")
            rows.append(
                f"SELECT '{a}' AS metric_a, '{b}' AS metric_b, "
                + cell.format(a=a, b=b)
                + " AS pearson_r FROM m"
            )
    return f"""
WITH per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_views,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
         CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days
  FROM events GROUP BY user_id
), m AS (SELECT {", ".join(sums)} FROM per_user)
{" UNION ALL ".join(rows)}
ORDER BY metric_a, metric_b
"""


METRIC_CORR_MATRIX_ORACLE = _corr_matrix_oracle()


def weekly_seasonality_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-seasonality detector: Pearson autocorrelation of the
    DAILY event-count series at lags 1 and 7 days — a lag-7
    correlation well above lag-1 is the weekly-cycle fingerprint
    dashboards annotate.

    The day-grain series is exact integers; each lag joins the
    series to itself shifted by the lag (a day-grain self-join over
    a calendar-bounded table, not the fact table) and computes
    Pearson r from exact moments, rounded to 9 decimals both sides."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )

    def lag_r(lag: int):
        a = daily.select(F.col("day").alias("d1"), F.col("cnt").alias("x"))
        bcols = daily.select(
            F.date_add(F.col("day"), lag).alias("d1"), F.col("cnt").alias("y")
        )
        j = a.join(bcols, "d1")
        m = j.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
        n = F.col("n").cast("double")
        sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
        sxy = F.col("sxy").cast("double")
        sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
        r = (n * sxy - sx * sy) / (
            F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
        )
        return m.select(
            F.lit(lag).alias("lag_days"),
            F.col("n").alias("n_day_pairs"),
            F.round(r, 9).alias("autocorr"),
        )

    return lag_r(1).unionByName(lag_r(7)).orderBy("lag_days")


WEEKLY_AUTOCORR_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
lagged AS (
  SELECT l.lag_days, a.cnt AS x, b.cnt AS y
  FROM (SELECT 1 AS lag_days UNION ALL SELECT 7) l
  JOIN daily a ON TRUE
  JOIN daily b ON a.day = b.day + to_days(l.lag_days)
),
m AS (
  SELECT lag_days, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
         SUM(x*x) AS sxx, SUM(y*y) AS syy
  FROM lagged GROUP BY 1
)
SELECT lag_days, n AS n_day_pairs,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9)
         AS autocorr
FROM m ORDER BY lag_days
"""


def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-DECAY multi-touch attribution — the third standard model
    beside last-touch and linear: each ``purchase`` splits credit over
    its 7-day-lookback ``click``s with weight halving per day of age
    (half-life = 1 day).

    Determinism: the day-age k ∈ 0..6 gives INTEGER weights
    2^(6−k) ∈ {64,…,1} (shiftleft, no libm pow), so each pair's share
    is ONE double division of exact integers; only the final Σshare
    is order-sensitive and is rounded to 6 decimals on both sides —
    the ``attribution_linear`` gate pattern.

    Plan shape shared with the linear model: purchases join their
    in-window clicks on a user-equi key with a time-range residual
    (bounded by touches-per-user-week), the per-conversion weight
    total is a conversion-partitioned window over the pairs, and the
    day rollup is grain-bounded.  Reference scope: §2.7 event
    analytics (the reference delegates attribution SQL to its
    warehouse)."""
    ev = _events(spark, sf_dir)
    week_us = 7 * 24 * US_PER_HOUR
    day_us = 24 * US_PER_HOUR
    sub = ev.where(F.col("event_type").isin("click", "purchase")).select(
        "user_id", "event_type", "event_id", "value", _us().alias("_us")
    )
    conv = sub.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("conv_id"),
        F.col("_us").alias("conv_us"),
        F.col("value").alias("conv_value"),
    )
    touches = sub.where(F.col("event_type") == "click").select(
        "user_id", F.col("_us").alias("touch_us")
    )
    pairs = conv.join(
        touches,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("touch_us") >= F.col("conv_us") - week_us)
        & (F.col("touch_us") <= F.col("conv_us") - 1),
    ).withColumn(
        "weight",
        F.expr(
            f"shiftleft(cast(1 as bigint), 6 - cast((conv_us - touch_us) div {day_us} as int))"
        ),
    )
    wtot = Window.partitionBy("c_user", "conv_id")
    share = F.col("weight").cast("double") / F.sum("weight").over(wtot).cast("double")
    return (
        pairs.withColumn("share", share)
        .groupBy(
            F.expr(
                f"date_add(date'1970-01-01', cast(touch_us div {day_us} as int))"
            ).alias("touch_day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum("share"), 6).alias("credited_conversions"),
            F.round(F.sum(F.col("conv_value") * F.col("share")), 6).alias(
                "attributed_revenue"
            ),
        )
        .orderBy("touch_day")
    )


ATTRIBUTION_TIME_DECAY_ORACLE = """
WITH sub AS (
  SELECT user_id, event_type, event_id, value, epoch_us(ts) AS us
  FROM events WHERE event_type IN ('click', 'purchase')
),
conv AS (
  SELECT user_id AS c_user, event_id AS conv_id, us AS conv_us, value AS conv_value
  FROM sub WHERE event_type = 'purchase'
),
pairs AS (
  SELECT c_user, conv_id, conv_value, t.us AS touch_us,
         (CAST(1 AS BIGINT) << (6 - CAST((conv_us - t.us) // 86400000000 AS INT))) AS weight
  FROM conv JOIN sub t
    ON t.user_id = c_user AND t.event_type = 'click'
   AND t.us >= conv_us - 604800000000 AND t.us <= conv_us - 1
),
shared AS (
  SELECT touch_us, conv_value,
         CAST(weight AS DOUBLE)
           / CAST(SUM(weight) OVER (PARTITION BY c_user, conv_id) AS DOUBLE) AS share
  FROM pairs
)
SELECT CAST(to_timestamp((touch_us // 86400000000) * 86400) AS DATE) AS touch_day,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(SUM(share), 6) AS credited_conversions,
       ROUND(SUM(conv_value * share), 6) AS attributed_revenue
FROM shared
GROUP BY 1
ORDER BY 1
"""


def inter_event_time_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement periodicity: quartiles of the time gap (seconds)
    between a user's CONSECUTIVE events of the same type — how often
    users come back per activity kind, the cadence metric behind
    notification scheduling.

    One user+type-keyed window computes the lag gaps (deterministic
    order: timestamp then event_id tiebreak); exact ``percentile``
    interpolation matches DuckDB ``quantile_cont`` bit-for-bit (the
    ``value_percentiles`` contract).  Gap arithmetic is integer
    microseconds scaled by one exact division by 10⁶.

    SCALE CONTRACT: exact ``percentile`` buffers every group value in
    one aggregation buffer, and groups here are event-type-grained —
    corpus-sized at 100 TB.  This exact formulation is the oracle
    gate; the production-scale path is the mergeable-sketch variant
    :func:`inter_event_cadence_sketch` (same gaps, GK/t-digest
    summaries, rank-error bounds-gated) — swap is one agg call."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("_us", "event_id")
    gaps = (
        ev.select("user_id", "event_type", "event_id", _us().alias("_us"))
        .withColumn("prev_us", F.lag("_us").over(w))
        .where(F.col("prev_us").isNotNull())
        .select(
            "event_type",
            ((F.col("_us") - F.col("prev_us")).cast("double") / F.lit(1e6)).alias(
                "gap_s"
            ),
        )
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.expr("percentile(gap_s, 0.25)").alias("p25_s"),
            F.expr("percentile(gap_s, 0.5)").alias("p50_s"),
            F.expr("percentile(gap_s, 0.75)").alias("p75_s"),
        )
        .orderBy("event_type")
    )


INTER_EVENT_TIME_ORACLE = """
WITH gaps AS (
  SELECT event_type,
         CAST(us - LAG(us) OVER (
           PARTITION BY user_id, event_type ORDER BY us, event_id) AS DOUBLE) / 1e6 AS gap_s
  FROM (SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       quantile_cont(gap_s, 0.25) AS p25_s,
       quantile_cont(gap_s, 0.5) AS p50_s,
       quantile_cont(gap_s, 0.75) AS p75_s
FROM gaps WHERE gap_s IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def inter_event_cadence_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for :func:`inter_event_time_quantiles`: the
    same per-user lag gaps, quartiled with the MERGEABLE sketch
    aggregate (Spark ``approx_percentile``, Greenwald-Khanna; DuckDB
    ``approx_quantile``, t-digest) instead of the buffer-everything
    exact ``percentile`` — map-side combinable, O(sketch) memory per
    group however large the group.

    Sketch point estimates are engine-specific, so the gated surface
    is the rank-error BOUNDS CHECK (the ``value_quantile_sketch``
    contract): each engine's approx quartile must land between the
    exact quantiles at q∓0.02 — double the GK guarantee at accuracy
    100."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("_us", "event_id")
    gaps = (
        ev.select("user_id", "event_type", "event_id", _us().alias("_us"))
        .withColumn("prev_us", F.lag("_us").over(w))
        .where(F.col("prev_us").isNotNull())
        .select(
            "event_type",
            ((F.col("_us") - F.col("prev_us")).cast("double") / F.lit(1e6)).alias(
                "gap_s"
            ),
        )
    )
    ap = lambda q: F.expr(f"approx_percentile(gap_s, {q}, 100)")
    ex = lambda q: F.expr(f"percentile(gap_s, {q})")
    between = lambda q, lo, hi: (ap(q) >= ex(lo)) & (ap(q) <= ex(hi))
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            between(0.25, 0.23, 0.27).alias("p25_in_bounds"),
            between(0.5, 0.48, 0.52).alias("p50_in_bounds"),
            between(0.75, 0.73, 0.77).alias("p75_in_bounds"),
        )
        .orderBy("event_type")
    )


INTER_EVENT_CADENCE_SKETCH_ORACLE = """
WITH gaps AS (
  SELECT event_type,
         CAST(us - LAG(us) OVER (
           PARTITION BY user_id, event_type ORDER BY us, event_id) AS DOUBLE) / 1e6 AS gap_s
  FROM (SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       approx_quantile(gap_s, 0.25) BETWEEN quantile_cont(gap_s, 0.23)
                                        AND quantile_cont(gap_s, 0.27) AS p25_in_bounds,
       approx_quantile(gap_s, 0.5)  BETWEEN quantile_cont(gap_s, 0.48)
                                        AND quantile_cont(gap_s, 0.52) AS p50_in_bounds,
       approx_quantile(gap_s, 0.75) BETWEEN quantile_cont(gap_s, 0.73)
                                        AND quantile_cont(gap_s, 0.77) AS p75_in_bounds
FROM gaps WHERE gap_s IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def funnel_step_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-transition latency quartiles for the signup→click→purchase
    funnel — WHERE users stall, not just whether they convert
    (``funnel_signup_click_purchase`` counts; ``time_to_convert``
    histograms end-to-end; this profiles each hop).

    Per user: first signup, first click at-or-after it, first
    purchase at-or-after that click — three conditional min
    aggregations sharing one user-keyed shuffle shape; the step rows
    then union into a two-group exact-percentile aggregate.  Integer
    microsecond math scaled by one exact division; ``percentile`` ≡
    DuckDB ``quantile_cont`` bit-for-bit.

    SCALE CONTRACT: two groups × per-user rows means the exact
    ``percentile`` buffers O(users) values per group at 100 TB; the
    documented swap is ``approx_percentile`` (mergeable, map-side
    combined — the :func:`value_quantile_sketch` /
    :func:`inter_event_cadence_sketch` pattern), identical call
    shape."""
    ev = _events(spark, sf_dir).withColumn("_us", _us())
    s0 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("_us").alias("t0"))
    )
    s1 = (
        ev.where(F.col("event_type") == "click")
        .join(s0, "user_id")
        .where(F.col("_us") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("_us").alias("t1"), F.min("t0").alias("t0"))
    )
    s2 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s1.select("user_id", "t1"), "user_id")
        .where(F.col("_us") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("_us").alias("t2"), F.min("t1").alias("t1"))
    )
    hop1 = s1.select(
        F.lit("1_signup_to_click").alias("step"),
        ((F.col("t1") - F.col("t0")).cast("double") / F.lit(1e6)).alias("latency_s"),
    )
    hop2 = s2.select(
        F.lit("2_click_to_purchase").alias("step"),
        ((F.col("t2") - F.col("t1")).cast("double") / F.lit(1e6)).alias("latency_s"),
    )
    return (
        hop1.unionByName(hop2)
        .groupBy("step")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.expr("percentile(latency_s, 0.25)").alias("p25_s"),
            F.expr("percentile(latency_s, 0.5)").alias("p50_s"),
            F.expr("percentile(latency_s, 0.75)").alias("p75_s"),
        )
        .orderBy("step")
    )


FUNNEL_STEP_LATENCY_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
),
s0 AS (
  SELECT user_id, MIN(us) AS t0 FROM ev WHERE event_type = 'signup' GROUP BY 1
),
s1 AS (
  SELECT e.user_id, MIN(e.us) AS t1, MIN(s0.t0) AS t0
  FROM ev e JOIN s0 ON e.user_id = s0.user_id
  WHERE e.event_type = 'click' AND e.us >= s0.t0
  GROUP BY 1
),
s2 AS (
  SELECT e.user_id, MIN(e.us) AS t2, MIN(s1.t1) AS t1
  FROM ev e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'purchase' AND e.us >= s1.t1
  GROUP BY 1
),
hops AS (
  SELECT '1_signup_to_click' AS step, CAST(t1 - t0 AS DOUBLE) / 1e6 AS latency_s FROM s1
  UNION ALL
  SELECT '2_click_to_purchase' AS step, CAST(t2 - t1 AS DOUBLE) / 1e6 AS latency_s FROM s2
)
SELECT step, CAST(COUNT(*) AS BIGINT) AS n_users,
       quantile_cont(latency_s, 0.25) AS p25_s,
       quantile_cont(latency_s, 0.5) AS p50_s,
       quantile_cont(latency_s, 0.75) AS p75_s
FROM hops GROUP BY 1 ORDER BY 1
"""


def session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of sessions (30-min-gap
    sessionization, the :func:`sessionize` rule) containing exactly
    ONE event, per day of session start — the engagement-quality
    complement to ``sessionization_stats``'s per-user totals.

    One user-keyed window shuffle (sessionize) + one session-grain
    aggregate + one tiny per-day rollup; counts are exact integers
    and the rate is a single division — deterministic.  At 100 TB
    the window rides the events table's user bucketing like every
    other sessionized query."""
    sess = sessionize(_events(spark, sf_dir))
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("start_ts"),
    )
    return (
        per_session.groupBy(F.col("start_ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum((F.col("n_events") == 1).cast("long")).alias("n_bounces"),
        )
        .withColumn(
            "bounce_rate",
            F.col("n_bounces").cast("double") / F.col("n_sessions").cast("double"),
        )
        .orderBy("day")
    )


SESSION_BOUNCE_RATE_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
), flagged AS (
  SELECT user_id, event_id, ts, us,
         CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
  FROM ordered
), sessions AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events, MIN(ts) AS start_ts
  FROM sessions GROUP BY 1, 2
)
SELECT CAST(start_ts AS DATE) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS bounce_rate
FROM per_session GROUP BY 1 ORDER BY 1
"""


def event_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between event types co-occurring
    in the same USER-DAY — which behaviors cluster (click+purchase)
    vs repel, the signal behind next-action models and bundle
    analysis.

    Unit of co-occurrence = distinct (user, day, type) incidence;
    pair counts come from a self-join of that incidence frame on the
    user-day key restricted to ``a < b`` — the incidence frame is
    |user-days|·|types| at most, so the join is far below raw-event
    scale, and the final PMI table is |types|² rows.  PMI =
    ln(n_ab·N / (n_a·n_b)): every count is an exact integer, the
    ratio is one exact double expression, and the single ``ln`` is
    rounded to 9 decimals on both sides (engine libm may differ in
    the last ulp — the round-both-sides float rule)."""
    ev = _events(spark, sf_dir)
    inc = ev.select(
        "user_id", F.col("ts").cast("date").alias("day"), "event_type"
    ).distinct()
    # the unit total stays IN the plan (scalar aggregate broadcast
    # back) — an eager .count() here would bolt a second driver-side
    # job onto every execution
    units = (
        inc.select("user_id", "day")
        .distinct()
        .agg(F.count(F.lit(1)).alias("_nu"))
    )
    marg = inc.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_type"))
    a = inc.alias("a")
    b = inc.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ma = marg.select(F.col("event_type").alias("type_a"), F.col("n_type").alias("n_a"))
    mb = marg.select(F.col("event_type").alias("type_b"), F.col("n_type").alias("n_b"))
    return (
        pairs.join(F.broadcast(ma), "type_a")
        .join(F.broadcast(mb), "type_b")
        .crossJoin(F.broadcast(units))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.log(
                    (F.col("n_both").cast("double") * F.col("_nu").cast("double"))
                    / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
                ),
                9,
            ).alias("pmi"),
        )
        .orderBy("type_a", "type_b")
    )


EVENT_COOCCURRENCE_PMI_ORACLE = """
WITH inc AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type FROM events
),
units AS (SELECT COUNT(*) AS n FROM (SELECT DISTINCT user_id, day FROM inc)),
marg AS (SELECT event_type, COUNT(*) AS n_type FROM inc GROUP BY 1),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_both
  FROM inc a JOIN inc b
    ON a.user_id = b.user_id AND a.day = b.day AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b,
       CAST(p.n_both AS BIGINT) AS n_both,
       CAST(ma.n_type AS BIGINT) AS n_a,
       CAST(mb.n_type AS BIGINT) AS n_b,
       round(ln(CAST(p.n_both AS DOUBLE) * CAST(u.n AS DOUBLE)
                / (CAST(ma.n_type AS DOUBLE) * CAST(mb.n_type AS DOUBLE))), 9) AS pmi
FROM pairs p
JOIN marg ma ON p.type_a = ma.event_type
JOIN marg mb ON p.type_b = mb.event_type
CROSS JOIN units u
ORDER BY 1, 2
"""


def user_activity_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity: Shannon entropy of each user's
    event-type distribution, rolled up by the user's distinct-type
    count — do heavy users spread across behaviors or specialize?

    Per user: H = ln(n) − (Σ c·ln c)/n over the type counts c (the
    algebraic form needs one pass over |user|×|types| rows).  Exact
    aggregation discipline: each user's H is quantized to integer
    MICRO-NATS (round(H·10⁶) as long — libm ulp noise is ~10⁻¹⁰
    micro-nats, nowhere near a rounding boundary), so the per-bucket
    mean is an exact integer sum and ONE division — float summation
    order never matters (the decimal-aggregation rule applied to a
    transcendental)."""
    ev = _events(spark, sf_dir)
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_user = per_type.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("c").alias("n"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias(
            "sclogc"
        ),
    )
    h_micro = F.round(
        (F.log(F.col("n").cast("double")) - F.col("sclogc") / F.col("n").cast("double"))
        * 1e6,
        0,
    ).cast("long")
    return (
        per_user.select("n_types", h_micro.alias("h_micro"))
        .groupBy("n_types")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            (
                F.sum("h_micro").cast("double")
                / (F.count(F.lit(1)).cast("double") * F.lit(1e6))
            ).alias("avg_entropy_nats"),
        )
        .orderBy("n_types")
    )


USER_ACTIVITY_ENTROPY_ORACLE = """
WITH per_type AS (
  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
),
per_user AS (
  SELECT user_id, COUNT(*) AS n_types, SUM(c) AS n,
         SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS sclogc
  FROM per_type GROUP BY 1
),
quant AS (
  SELECT n_types,
         CAST(round((ln(CAST(n AS DOUBLE)) - sclogc / CAST(n AS DOUBLE)) * 1e6, 0) AS BIGINT) AS h_micro
  FROM per_user
)
SELECT n_types, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(h_micro) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1e6) AS avg_entropy_nats
FROM quant GROUP BY 1 ORDER BY 1
"""


def event_transition_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the event stream:
    P(next event type | current event type), estimated from every
    user's time-ordered event sequence.  The classic product-analytics
    "what do users do after X" model (and the generator behind sankey
    / flow visualizations).

    One user-partitioned LEAD window (shares the events table's
    user bucketing at 100 TB — same shape as ``top_event_paths``),
    then a |event types|² aggregation, which is constant-sized no
    matter the corpus.  P is a single division of exact integer
    counts → bit-identical across engines, no rounding needed.
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(_us(), "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("curr_event"),
            F.lead("event_type", 1).over(w).alias("next_event"),
        )
        .where(F.col("next_event").isNotNull())
        .groupBy("curr_event", "next_event")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    wc = Window.partitionBy("curr_event")
    return (
        pairs.withColumn(
            "p_transition",
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wc).cast("double"),
        )
        .orderBy("curr_event", "next_event")
    )


EVENT_TRANSITION_PROBS_ORACLE = """
WITH seq AS (
  SELECT event_type AS curr_event,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_event
  FROM events
),
pairs AS (
  SELECT curr_event, next_event, CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM seq WHERE next_event IS NOT NULL GROUP BY 1, 2
)
SELECT curr_event, next_event, n_transitions,
       CAST(n_transitions AS DOUBLE)
         / CAST(SUM(n_transitions) OVER (PARTITION BY curr_event) AS DOUBLE) AS p_transition
FROM pairs ORDER BY curr_event, next_event
"""


SESSION_GAP_GRID_MIN = (5, 15, 30, 60)  # candidate gaps, minutes


def session_gap_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-gap sensitivity curve: how many sessions (and how many
    events per session) the corpus yields under each candidate
    inactivity gap — the tuning artifact behind every sessionization
    deployment (the 30-minute default is a convention, not a law).

    ONE lag-window pass computes every user's inter-event deltas;
    each gap threshold is then a row-local comparison fanned out of
    the same delta column (array filter + explode) — sessionization
    never re-runs per gap, because #sessions(g) = #active users +
    #(deltas > g).  Exact integer counts; events-per-session is a
    single division.
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(_us(), "event_id")
    # microsecond deltas (the oracle's epoch_us grain) — ns-grain
    # deltas would disagree with the oracle within 1 us of a boundary
    deltas = ev.select(
        "user_id",
        (_us() - F.lag(_us(), 1).over(w)).alias("delta_us"),
    )
    # totals stay IN the plan (one scalar aggregate broadcast back)
    # instead of two eager driver-side jobs per execution
    counts = ev.agg(
        F.count(F.lit(1)).alias("_ne"),
        F.countDistinct("user_id").alias("_nu"),
    )
    gaps = F.array(*[F.lit(g * 60 * 1_000_000) for g in SESSION_GAP_GRID_MIN])
    breaks = (
        deltas.where(F.col("delta_us").isNotNull())
        .select(
            F.explode(
                F.filter(gaps, lambda g: F.col("delta_us") > g)
            ).alias("gap_us")
        )
        .groupBy("gap_us")
        .agg(F.count(F.lit(1)).alias("n_breaks"))
    )
    grid = ev.sparkSession.createDataFrame(
        [(g, g * 60 * 1_000_000) for g in SESSION_GAP_GRID_MIN],
        "gap_minutes int, gap_us long",
    )
    return (
        grid.join(breaks, "gap_us", "left")
        .crossJoin(F.broadcast(counts))
        .select(
            "gap_minutes",
            (F.coalesce(F.col("n_breaks"), F.lit(0)) + F.col("_nu")).alias(
                "n_sessions"
            ),
            F.col("_ne"),
        )
        .select(
            "gap_minutes",
            "n_sessions",
            (F.col("_ne").cast("double") / F.col("n_sessions").cast("double")).alias(
                "events_per_session"
            ),
        )
        .orderBy("gap_minutes")
    )


SESSION_GAP_CURVE_ORACLE = """
WITH deltas AS (
  SELECT epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS delta_us
  FROM events
),
counts AS (SELECT (SELECT COUNT(*) FROM events) AS n_events,
                  (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users),
grid AS (SELECT CAST(gap_minutes AS INT) AS gap_minutes
         FROM (VALUES (5), (15), (30), (60)) t(gap_minutes)),
breaks AS (
  SELECT gap_minutes, COUNT(*) AS n_breaks
  FROM grid JOIN deltas ON delta_us > gap_minutes * CAST(60000000 AS BIGINT)
  GROUP BY 1
)
SELECT g.gap_minutes,
       CAST(COALESCE(b.n_breaks, 0) + c.n_users AS BIGINT) AS n_sessions,
       CAST(c.n_events AS DOUBLE) / CAST(COALESCE(b.n_breaks, 0) + c.n_users AS DOUBLE) AS events_per_session
FROM grid g LEFT JOIN breaks b USING (gap_minutes) CROSS JOIN counts c
ORDER BY g.gap_minutes
"""


def unordered_funnel_completion(
    spark: SparkSession, sf_dir: str, steps: tuple[str, ...] = ("signup", "click", "purchase")
) -> DataFrame:
    """Any-order funnel: users who performed ALL the step events
    within a 7-day window, regardless of order — the companion to
    the strict-sequence funnels (a checklist "activation" metric:
    did the user do X, Y and Z in their first week, in any order).

    Per (user, step) first-occurrence times via one aggregation;
    completion = span(max first − min first) within the window.  The
    per-user frame is |steps| rows wide — no window function over
    the event grain, one shuffle on user_id.  Output: per-step reach
    plus the all-steps / within-window completion counts — exact
    integers and single divisions only.
    """
    window_us = 7 * US_PER_DAY
    ev = _events(spark, sf_dir)
    firsts = (
        ev.where(F.col("event_type").isin(list(steps)))
        .groupBy("user_id", "event_type")
        .agg(F.min(_us()).alias("first_us"))
    )
    per_user = firsts.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_steps_done"),
        (F.max("first_us") - F.min("first_us")).alias("span_us"),
    )
    # user total stays IN the plan (scalar aggregate crossJoined back)
    # rather than an eager driver-side .count() job
    tot = ev.agg(F.countDistinct("user_id").alias("n_users"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_any_step"),
        F.sum((F.col("n_steps_done") == len(steps)).cast("long")).alias(
            "n_all_steps"
        ),
        F.sum(
            (
                (F.col("n_steps_done") == len(steps))
                & (F.col("span_us") <= window_us)
            ).cast("long")
        ).alias("n_completed_7d"),
    ).crossJoin(F.broadcast(tot)).select(
        "n_users",
        "n_any_step",
        "n_all_steps",
        "n_completed_7d",
        (
            F.col("n_completed_7d").cast("double") / F.col("n_users").cast("double")
        ).alias("completion_rate"),
    )


UNORDERED_FUNNEL_ORACLE = """
WITH firsts AS (
  SELECT user_id, event_type, MIN(epoch_us(ts)) AS first_us
  FROM events WHERE event_type IN ('signup', 'click', 'purchase')
  GROUP BY 1, 2
),
per_user AS (
  SELECT user_id, COUNT(*) AS n_steps_done,
         MAX(first_us) - MIN(first_us) AS span_us
  FROM firsts GROUP BY 1
),
tot AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events)
SELECT CAST(tot.n_users AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_any_step,
       CAST(SUM(CASE WHEN n_steps_done = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_all_steps,
       CAST(SUM(CASE WHEN n_steps_done = 3 AND span_us <= 604800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_completed_7d,
       CAST(SUM(CASE WHEN n_steps_done = 3 AND span_us <= 604800000000 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(tot.n_users AS DOUBLE) AS completion_rate
FROM per_user, tot GROUP BY tot.n_users
"""


def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSITION-BASED (U-shaped 40/20/40) multi-touch attribution:
    the first and last ``click`` in a conversion's 7-day lookback
    each take 40% of the credit, the middle touches share the
    remaining 20% equally (1 touch → 100%, 2 touches → 50/50) — the
    third standard model next to last-touch and linear, same family
    as ``attribution_linear``.

    Plan: identical bounded pair build (RANGE-window touch count, a
    user-equi join with a time-range residual bounded by
    touches-per-user-week), plus ONE extra window: the touch's rank
    within its conversion, partitioned per conversion (bounded by
    the same weekly touch count) with an event-id tiebreak for
    same-microsecond touches.  Credit is then row-local arithmetic.

    Determinism: the rank's tiebreak is the unique touch event id;
    credited sums are multi-term float reductions → ``round(.., 6)``
    on both engines (the ``attribution_linear`` convention)."""
    ev = _events(spark, sf_dir)
    week_us = 7 * 24 * US_PER_HOUR
    sub = ev.where(F.col("event_type").isin("click", "purchase")).select(
        "user_id", "event_type", "event_id", "value", _us().alias("_us")
    )
    wr = Window.partitionBy("user_id").orderBy("_us").rangeBetween(-week_us, -1)
    n_touches = F.sum(
        F.when(F.col("event_type") == "click", F.lit(1)).otherwise(F.lit(0))
    ).over(wr)
    conv = (
        sub.withColumn("n_touches", n_touches)
        .where((F.col("event_type") == "purchase") & (F.col("n_touches") > 0))
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("conv_id"),
            F.col("_us").alias("conv_us"),
            F.col("value").alias("conv_value"),
            "n_touches",
        )
    )
    touches = sub.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("touch_id"), F.col("_us").alias("touch_us")
    )
    pairs = conv.join(
        touches,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("touch_us") >= F.col("conv_us") - week_us)
        & (F.col("touch_us") <= F.col("conv_us") - 1),
    )
    wrank = Window.partitionBy("conv_id").orderBy("touch_us", "touch_id")
    ranked = pairs.withColumn("touch_rank", F.row_number().over(wrank))
    n = F.col("n_touches").cast("double")
    credit = (
        F.when(F.col("n_touches") == 1, F.lit(1.0))
        .when(F.col("n_touches") == 2, F.lit(0.5))
        .when(F.col("touch_rank") == 1, F.lit(0.4))
        .when(F.col("touch_rank") == F.col("n_touches"), F.lit(0.4))
        .otherwise(F.lit(0.2) / (n - F.lit(2.0)))
    )
    day_us = 24 * US_PER_HOUR
    return (
        ranked.groupBy(
            F.expr(
                f"date_add(date'1970-01-01', cast(touch_us div {day_us} as int))"
            ).alias("touch_day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum(credit), 6).alias("credited_conversions"),
            F.round(F.sum(F.col("conv_value") * credit), 6).alias("attributed_revenue"),
        )
        .orderBy("touch_day")
    )


ATTRIBUTION_POSITION_ORACLE = """
WITH sub AS (
  SELECT user_id, event_type, event_id, value, epoch_us(ts) AS us
  FROM events WHERE event_type IN ('click', 'purchase')
),
conv AS (
  SELECT user_id AS c_user, event_id AS conv_id, us AS conv_us, value AS conv_value,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY us
           RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING) AS n_touches
  FROM sub
  QUALIFY event_type = 'purchase' AND n_touches > 0
),
touches AS (
  SELECT user_id, event_id AS touch_id, us AS touch_us FROM sub WHERE event_type = 'click'
),
ranked AS (
  SELECT c.*, t.touch_us,
         ROW_NUMBER() OVER (PARTITION BY c.conv_id ORDER BY t.touch_us, t.touch_id) AS touch_rank
  FROM conv c JOIN touches t
    ON t.user_id = c.c_user
   AND t.touch_us >= c.conv_us - 604800000000
   AND t.touch_us <= c.conv_us - 1
),
credited AS (
  SELECT *,
         CASE WHEN n_touches = 1 THEN 1.0
              WHEN n_touches = 2 THEN 0.5
              WHEN touch_rank = 1 THEN 0.4
              WHEN touch_rank = n_touches THEN 0.4
              ELSE 0.2 / (CAST(n_touches AS DOUBLE) - 2.0) END AS credit
  FROM ranked
)
SELECT CAST('1970-01-01' AS DATE) + CAST(touch_us // 86400000000 AS INT) AS touch_day,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       round(SUM(credit), 6) AS credited_conversions,
       round(SUM(conv_value * credit), 6) AS attributed_revenue
FROM credited GROUP BY 1 ORDER BY 1
"""


def event_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness (Fano factor) of user activity per event type: the
    variance-to-mean ratio of a user's DAILY event counts over their
    active days — Fano ≈ 1 is Poisson-like steady usage, ≫ 1 is
    bursty binge behavior.  The per-type mean Fano separates steady
    telemetry streams from bursty human actions.

    Plan: exact integer (user, type, day) counts, partially
    aggregated map-side; the per-(user, type) moment aggregation
    carries only exact integer sums (Σc, Σc²) so the Fano is a short
    row-local double chain; the final per-type mean is the only
    multi-term float reduction.

    Determinism: the Fano chain is written IDENTICALLY on both
    engines (sumsq/n − mean², ÷ mean); per-type mean of per-user
    Fanos is order-dependent → ``round(.., 6)``."""
    ev = _events(spark, sf_dir)
    day_us = 24 * US_PER_HOUR
    daily = (
        ev.select(
            "user_id",
            "event_type",
            (_us() / F.lit(day_us)).cast("long").alias("day_id"),
        )
        .groupBy("user_id", "event_type", "day_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_user = daily.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("sq"),
    )
    mean = F.col("s").cast("double") / F.col("n_days").cast("double")
    var = F.col("sq").cast("double") / F.col("n_days").cast("double") - mean * mean
    fano = var / mean
    return (
        per_user.where(F.col("n_days") >= 3)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.sum(fano) / F.count(F.lit(1)).cast("double"), 6).alias(
                "mean_fano"
            ),
            F.round(F.max(fano), 6).alias("max_fano"),
        )
        .orderBy("event_type")
    )


EVENT_BURSTINESS_ORACLE = """
WITH daily AS (
  SELECT user_id, event_type, epoch_us(ts) // 86400000000 AS day_id,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2, 3
),
per_user AS (
  SELECT user_id, event_type, COUNT(*) AS n_days,
         SUM(c) AS s, SUM(c * c) AS sq
  FROM daily GROUP BY 1, 2
),
fanos AS (
  SELECT event_type,
         (CAST(sq AS DOUBLE) / CAST(n_days AS DOUBLE)
           - (CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE))
             * (CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE)))
         / (CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE)) AS fano
  FROM per_user WHERE n_days >= 3
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
       round(SUM(fano) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_fano,
       round(MAX(fano), 6) AS max_fano
FROM fanos GROUP BY 1 ORDER BY 1
"""


def session_depth_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of session depth (events per 30-min-gap session)
    in log₂ buckets: how much of the traffic is one-shot bounces vs
    deep multi-action sessions — the engagement histogram behind
    bounce-rate and stickiness reports, riding the SAME sessionizer
    as ``sessionization_stats`` (cross-validated chain).

    Plan: the sessionizer's one user-keyed shuffle, a (user, session)
    count, then a ~10-bucket aggregate; the share division is a
    single-row broadcast of the session total.

    Determinism: bucket = floor(log₂(n)) — exact at powers of two in
    IEEE754 on both engines, unambiguous elsewhere; counts exact;
    share rounded to 9."""
    sess = sessionize(_events(spark, sf_dir))
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    bucketed = per_session.select(
        F.floor(F.log2("n_events")).cast("long").alias("depth_bucket"),
        "n_events",
    )
    total = bucketed.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        bucketed.groupBy("depth_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "depth_bucket",
            "n_sessions",
            "n_events",
            F.round(
                F.col("n_sessions").cast("double") / F.col("n_total").cast("double"), 9
            ).alias("session_share"),
        )
        .orderBy("depth_bucket")
    )


SESSION_DEPTH_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
), flagged AS (
  SELECT user_id, event_id, us,
         CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
  FROM ordered
), sessions AS (
  SELECT user_id, us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events FROM sessions GROUP BY 1, 2
), tot AS (SELECT COUNT(*) AS n_total FROM per_session)
SELECT CAST(FLOOR(log2(n_events)) AS BIGINT) AS depth_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       round(CAST(COUNT(*) AS DOUBLE) / CAST(tot.n_total AS DOUBLE), 9) AS session_share
FROM per_session, tot GROUP BY 1, tot.n_total ORDER BY 1
"""


QUERIES = {
    "attribution_position_based": attribution_position_based,
    "event_burstiness": event_burstiness,
    "session_depth_distribution": session_depth_distribution,
    "session_gap_curve": session_gap_curve,
    "unordered_funnel_completion": unordered_funnel_completion,
    "event_transition_probs": event_transition_probs,
    "attribution_time_decay": attribution_time_decay,
    "funnel_step_latency": funnel_step_latency,
    "inter_event_time_quantiles": inter_event_time_quantiles,
    "inter_event_cadence_sketch": inter_event_cadence_sketch,
    "session_bounce_rate": session_bounce_rate,
    "event_cooccurrence_pmi": event_cooccurrence_pmi,
    "user_activity_entropy": user_activity_entropy,
    "attribution_linear": attribution_linear,
    "ship_latency_quartiles": ship_latency_quartiles,
    "metric_correlation_matrix": metric_correlation_matrix,
    "weekly_seasonality_autocorr": weekly_seasonality_autocorr,
    "seg_daily_event_counts": seg_daily_event_counts,
    "dau": dau,
    "top_event_values": top_event_values,
    "event_type_hourly_share": event_type_hourly_share,
    "props_json_extract": props_json_extract,
    "props_variant_stats": props_variant_stats,
    "funnel_signup_click_purchase": funnel_signup_click_purchase,
    "funnel_windowed_24h": funnel_windowed_24h,
    "ab_test_lift": ab_test_lift,
    "cohort_ltv": cohort_ltv,
    "time_to_convert": time_to_convert,
    "retention_cohorts": retention_cohorts,
    "sessionization_stats": sessionization_stats,
    "user_profile_snapshot": user_profile_snapshot,
    "asof_view_before_purchase": asof_view_before_purchase,
    "value_percentiles": value_percentiles,
    "dau_approx_sketch": dau_approx_sketch,
    "value_quantile_sketch": value_quantile_sketch,
    "heavy_hitters_sketch": heavy_hitters_sketch,
    "mau_rollup_sketch": mau_rollup_sketch,
    "rolling_uniques_7d": rolling_uniques_7d,
    "top_event_paths": top_event_paths,
    "daily_anomaly_zscore": daily_anomaly_zscore,
    "latest_event_per_user": latest_event_per_user,
    "daily_value_moving_avg": daily_value_moving_avg,
    "stickiness_dau_mau": stickiness_dau_mau,
    "rfm_segments": rfm_segments,
    "power_user_curve": power_user_curve,
    "value_histogram": value_histogram,
    "user_lifecycle_grid": user_lifecycle_grid,
    "funnel_with_exclusion": funnel_with_exclusion,
    "events_pivot_daily": events_pivot_daily,
    "hourly_counts_gapfilled": hourly_counts_gapfilled,
    "segment_overlap_matrix": segment_overlap_matrix,
    "user_metric_correlation": user_metric_correlation,
    "event_transition_matrix": event_transition_matrix,
    "quantile_rollup_sketch": quantile_rollup_sketch,
    "theta_segment_setops": theta_segment_setops,
    "attribution_last_touch": attribution_last_touch,
    "session_entry_exit": session_entry_exit,
    "rollup_reuse_monthly": rollup_reuse_monthly,
    "funnel_unordered": funnel_unordered,
    "funnel_daily_trend": funnel_daily_trend,
    "key_skew_report": key_skew_report,
    "daily_new_vs_returning": daily_new_vs_returning,
    "market_basket_part_types": market_basket_part_types,
}

ORACLES = {
    "attribution_position_based": ATTRIBUTION_POSITION_ORACLE,
    "event_burstiness": EVENT_BURSTINESS_ORACLE,
    "session_depth_distribution": SESSION_DEPTH_ORACLE,
    "session_gap_curve": SESSION_GAP_CURVE_ORACLE,
    "unordered_funnel_completion": UNORDERED_FUNNEL_ORACLE,
    "event_transition_probs": EVENT_TRANSITION_PROBS_ORACLE,
    "attribution_time_decay": ATTRIBUTION_TIME_DECAY_ORACLE,
    "funnel_step_latency": FUNNEL_STEP_LATENCY_ORACLE,
    "inter_event_time_quantiles": INTER_EVENT_TIME_ORACLE,
    "inter_event_cadence_sketch": INTER_EVENT_CADENCE_SKETCH_ORACLE,
    "session_bounce_rate": SESSION_BOUNCE_RATE_ORACLE,
    "event_cooccurrence_pmi": EVENT_COOCCURRENCE_PMI_ORACLE,
    "user_activity_entropy": USER_ACTIVITY_ENTROPY_ORACLE,
    "metric_correlation_matrix": METRIC_CORR_MATRIX_ORACLE,
    "weekly_seasonality_autocorr": WEEKLY_AUTOCORR_ORACLE,
    "attribution_linear": ATTRIBUTION_LINEAR_ORACLE,
    "ship_latency_quartiles": SHIP_LATENCY_ORACLE,
    "seg_daily_event_counts": SEG_DAILY_ORACLE,
    "dau": DAU_ORACLE,
    "top_event_values": TOP_EVENT_VALUES_ORACLE,
    "event_type_hourly_share": HOURLY_SHARE_ORACLE,
    "props_json_extract": PROPS_JSON_ORACLE,
    "props_variant_stats": PROPS_VARIANT_ORACLE,
    "funnel_signup_click_purchase": FUNNEL_ORACLE,
    "funnel_windowed_24h": FUNNEL_WINDOWED_ORACLE,
    "ab_test_lift": AB_TEST_LIFT_ORACLE,
    "cohort_ltv": COHORT_LTV_ORACLE,
    "time_to_convert": TIME_TO_CONVERT_ORACLE,
    "retention_cohorts": RETENTION_ORACLE,
    "sessionization_stats": SESSIONIZATION_ORACLE,
    "user_profile_snapshot": USER_PROFILE_ORACLE,
    "asof_view_before_purchase": ASOF_ORACLE,
    "value_percentiles": VALUE_PERCENTILES_ORACLE,
    "latest_event_per_user": LATEST_EVENT_ORACLE,
    "daily_value_moving_avg": MOVING_AVG_ORACLE,
    # sketch ops carry bounds-check oracles — each engine's own
    # estimate must honor its error contract vs the exact value.
    "dau_approx_sketch": DAU_APPROX_ORACLE,
    "value_quantile_sketch": VALUE_QUANTILE_SKETCH_ORACLE,
    "heavy_hitters_sketch": HEAVY_HITTERS_ORACLE,
    "mau_rollup_sketch": MAU_ROLLUP_ORACLE,
    "rolling_uniques_7d": ROLLING_UNIQUES_ORACLE,
    "top_event_paths": TOP_EVENT_PATHS_ORACLE,
    "daily_anomaly_zscore": DAILY_ANOMALY_ORACLE,
    "stickiness_dau_mau": STICKINESS_ORACLE,
    "rfm_segments": RFM_ORACLE,
    "power_user_curve": POWER_USER_CURVE_ORACLE,
    "value_histogram": VALUE_HISTOGRAM_ORACLE,
    "user_lifecycle_grid": USER_LIFECYCLE_ORACLE,
    "funnel_with_exclusion": FUNNEL_EXCLUSION_ORACLE,
    "events_pivot_daily": EVENTS_PIVOT_ORACLE,
    "hourly_counts_gapfilled": HOURLY_GAPFILL_ORACLE,
    "segment_overlap_matrix": SEGMENT_OVERLAP_ORACLE,
    "user_metric_correlation": USER_METRIC_CORR_ORACLE,
    "event_transition_matrix": EVENT_TRANSITION_ORACLE,
    "quantile_rollup_sketch": QUANTILE_ROLLUP_ORACLE,
    "theta_segment_setops": THETA_SETOPS_ORACLE,
    "attribution_last_touch": ATTRIBUTION_ORACLE,
    "session_entry_exit": SESSION_ENTRY_EXIT_ORACLE,
    "rollup_reuse_monthly": ROLLUP_REUSE_ORACLE,
    "funnel_unordered": FUNNEL_UNORDERED_ORACLE,
    "funnel_daily_trend": FUNNEL_DAILY_TREND_ORACLE,
    "key_skew_report": KEY_SKEW_ORACLE,
    "daily_new_vs_returning": DAILY_NEW_RETURNING_ORACLE,
    "market_basket_part_types": MARKET_BASKET_ORACLE,
}
