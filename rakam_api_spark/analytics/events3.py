"""Round-11 event-analytics additions: acquisition mix, resurrection
counts, per-user behavioral entropy, weekend lift, first-week
activation → retention, and value concentration by spend band —
lifecycle/engagement reports the reference's event-explorer and
retention modules point at (rakam-spi/.../UserPluginConfig.java:18-19;
reference README.md:17), expressed as declarative DataFrame plans
over the events stream.

Determinism: day grain is ``CAST(ts AS DATE)``; day-of-week is
integer date arithmetic anchored on Monday 1970-01-05 (native dow
functions disagree across engines); value sums go through
DECIMAL(18,6); every rate is a single double division of exact
integers/decimals; double chains that must cross engines (entropy's
ln) are rounded identically on BOTH sides (the ``lm_bigram_quality``
precedent).

Scale: every operator reduces to (user, day) or (user, type) grain
with ONE user-keyed exchange before anything else runs; the only
window is a lag PARTITIONED BY USER over per-user-day rows
(resurrections); shares use the ``mix_weights`` idiom (cell aggregate
+ broadcast-back total), never a global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table, table_rowcount

_MONDAY = "1970-01-05"
_DEC = "decimal(18,6)"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _day():
    return F.col("ts").cast("date")


def new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily acquisition mix: events and users split into NEW (the
    user's first-ever active day is this day) vs RETURNING — the
    growth-accounting denominator every DAU chart needs next to it.

    Plan: reduce to (user, day) counts, one user-keyed aggregate for
    first days, classify, one day-grain rollup.  The share is one
    double division of exact counts."""
    ev = _events(spark, sf_dir)
    ud = ev.groupBy("user_id", _day().alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    first = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    j = ud.join(first, "user_id").withColumn(
        "is_new", (F.col("day") == F.col("first_day")).cast("int")
    )
    return (
        j.groupBy("day")
        .agg(
            F.sum(F.when(F.col("is_new") == 1, F.col("n_events")).otherwise(0)).alias(
                "new_events"
            ),
            F.sum(
                F.when(F.col("is_new") == 0, F.col("n_events")).otherwise(0)
            ).alias("returning_events"),
            F.sum("is_new").alias("new_users"),
            F.sum(F.lit(1) - F.col("is_new")).alias("returning_users"),
        )
        .select(
            "day",
            "new_events",
            "returning_events",
            "new_users",
            "returning_users",
            F.round(
                F.col("new_events").cast("double")
                / (F.col("new_events") + F.col("returning_events")).cast("double"),
                9,
            ).alias("share_new_events"),
        )
        .orderBy("day")
    )


NEW_VS_RETURNING_ORACLE = """
WITH ud AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
f AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY 1),
j AS (
  SELECT ud.day, ud.n_events,
         CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END AS is_new
  FROM ud JOIN f USING (user_id)
)
SELECT day,
       CAST(SUM(CASE WHEN is_new = 1 THEN n_events ELSE 0 END) AS BIGINT)
         AS new_events,
       CAST(SUM(CASE WHEN is_new = 0 THEN n_events ELSE 0 END) AS BIGINT)
         AS returning_events,
       CAST(SUM(is_new) AS BIGINT) AS new_users,
       CAST(SUM(1 - is_new) AS BIGINT) AS returning_users,
       round(CAST(SUM(CASE WHEN is_new = 1 THEN n_events ELSE 0 END) AS DOUBLE)
             / CAST(SUM(n_events) AS DOUBLE), 9) AS share_new_events
FROM j GROUP BY 1 ORDER BY 1
"""


def resurrections_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resurrection counts: users coming back after ≥ 3 silent days,
    bucketed by the month of the comeback day — the win-back metric
    next to churn (``user_lifecycle_grid``'s "resurrected" state,
    with the gap spelled out).

    Plan: distinct (user, day) rows, ONE lag window PARTITIONED BY
    USER over those reduced rows, a month-grain rollup.  All integer
    day arithmetic — no float anywhere."""
    ev = _events(spark, sf_dir)
    ud = ev.select("user_id", _day().alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    gap = F.datediff(F.col("day"), F.lag("day").over(w))
    res = ud.withColumn("gap", gap).where(F.col("gap") >= 3)
    return (
        res.groupBy(F.date_trunc("month", F.col("day")).cast("date").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_resurrections"),
            F.countDistinct("user_id").alias("n_resurrected_users"),
            F.min("gap").alias("min_gap_days"),
            F.max("gap").alias("max_gap_days"),
        )
        .orderBy("month")
    )


RESURRECTIONS_ORACLE = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
g AS (
  SELECT user_id, day,
         date_diff('day', lag(day) OVER (PARTITION BY user_id ORDER BY day),
                   day) AS gap
  FROM ud
)
SELECT CAST(date_trunc('month', day) AS DATE) AS month,
       CAST(COUNT(*) AS BIGINT) AS n_resurrections,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_resurrected_users,
       CAST(MIN(gap) AS INT) AS min_gap_days,
       CAST(MAX(gap) AS INT) AS max_gap_days
FROM g WHERE gap >= 3
GROUP BY 1 ORDER BY 1
"""


def user_entropy_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity by activity tier: each user's Shannon
    entropy over their event-type distribution (H = ln n − Σc·ln c/n,
    nats), rolled up by activity tier — do heavy users spread across
    features or hammer one?  (The per-user companion to
    ``type_diversity_trend``'s corpus-level distinct counts.)

    Determinism: c and n are exact integers; ln runs on bit-identical
    int-valued doubles; per-user H is rounded to 6 BEFORE the tier
    average, and the average itself rounds to 6 (the residual
    summation-order error is ~1e-12, far under the displayed grain —
    the ``lm_bigram_quality`` convention)."""
    ev = _events(spark, sf_dir)
    uc = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    per_user = uc.groupBy("user_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias(
            "_clnc"
        ),
    )
    h = F.round(
        F.log(F.col("n").cast("double"))
        - F.col("_clnc") / F.col("n").cast("double"),
        6,
    )
    tier = (
        F.when(F.col("n") < 55, "a_lt_55")
        .when(F.col("n") < 65, "b_55_64")
        .when(F.col("n") < 75, "c_65_74")
        .otherwise("d_75_plus")
    )
    return (
        per_user.select(tier.alias("tier"), h.alias("h"), "n")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.sum("h") / F.count(F.lit(1)), 6).alias("avg_entropy"),
            F.max("h").alias("max_entropy"),
        )
        .orderBy("tier")
    )


USER_ENTROPY_ORACLE = """
WITH uc AS (
  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
),
pu AS (
  SELECT user_id, SUM(c) AS n,
         SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS _clnc
  FROM uc GROUP BY 1
),
h AS (
  SELECT CASE WHEN n < 55 THEN 'a_lt_55'
              WHEN n < 65 THEN 'b_55_64'
              WHEN n < 75 THEN 'c_65_74'
              ELSE 'd_75_plus' END AS tier,
         round(ln(CAST(n AS DOUBLE)) - _clnc / CAST(n AS DOUBLE), 6) AS h
  FROM pu
)
SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_users,
       round(SUM(h) / COUNT(*), 6) AS avg_entropy,
       MAX(h) AS max_entropy
FROM h GROUP BY 1 ORDER BY 1
"""


def weekend_lift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend lift per event type: events per weekend day vs per
    weekday, as the normalized ratio 5·we/(2·wd) — the seasonality
    screen behind send-time and capacity planning
    (``hour_of_week_profile``'s 168 cells collapsed to the one
    number per type people actually quote).

    All exact integer counts; the lift is one double division."""
    ev = _events(spark, sf_dir)
    day = _day()
    dow = (F.datediff(day, F.lit(_MONDAY).cast("date")) % 7 + 7) % 7 + 1
    g = ev.groupBy("event_type").agg(
        F.sum((dow >= 6).cast("long")).alias("weekend_events"),
        F.sum((dow <= 5).cast("long")).alias("weekday_events"),
    )
    return (
        g.select(
            "event_type",
            "weekend_events",
            "weekday_events",
            F.when(
                F.col("weekday_events") > 0,
                F.round(
                    (F.lit(5) * F.col("weekend_events")).cast("double")
                    / (F.lit(2) * F.col("weekday_events")).cast("double"),
                    9,
                ),
            ).alias("weekend_lift"),
        )
        .orderBy("event_type")
    )


WEEKEND_LIFT_ORACLE = """
WITH g AS (
  SELECT event_type,
         SUM(CASE WHEN ((date_diff('day', DATE '1970-01-05', CAST(ts AS DATE))
                         % 7 + 7) % 7 + 1) >= 6 THEN 1 ELSE 0 END)
           AS weekend_events,
         SUM(CASE WHEN ((date_diff('day', DATE '1970-01-05', CAST(ts AS DATE))
                         % 7 + 7) % 7 + 1) <= 5 THEN 1 ELSE 0 END)
           AS weekday_events
  FROM events GROUP BY 1
)
SELECT event_type,
       CAST(weekend_events AS BIGINT) AS weekend_events,
       CAST(weekday_events AS BIGINT) AS weekday_events,
       CASE WHEN weekday_events > 0
            THEN round(CAST(5 * weekend_events AS DOUBLE)
                       / CAST(2 * weekday_events AS DOUBLE), 9)
            END AS weekend_lift
FROM g ORDER BY event_type
"""


def first_week_activation_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activation → retention: users bucketed by how many ACTIVE DAYS
    their first week held (≤5 / 6 / 7), with the share still active
    2+ weeks later (any event on days 14–27 after their first) — the
    canonical "does early engagement predict retention" table
    (``retention_cohorts`` asks when; this asks how much activation
    matters).

    Plan: (user, day) reduction → ONE user-keyed aggregate computing
    first day, first-week active days, and the day-14–27 flag
    together → a ≤ 3-row rollup.  Exact integer day arithmetic;
    the rate is one double division."""
    ev = _events(spark, sf_dir)
    ud = ev.select("user_id", _day().alias("day")).distinct()
    first = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    j = ud.join(first, "user_id").withColumn(
        "offset", F.datediff(F.col("day"), F.col("first_day"))
    )
    per_user = j.groupBy("user_id").agg(
        F.sum((F.col("offset") <= 6).cast("long")).alias("week0_days"),
        F.max(
            ((F.col("offset") >= 14) & (F.col("offset") <= 27)).cast("long")
        ).alias("retained"),
    )
    bucket = (
        F.when(F.col("week0_days") <= 5, "a_le_5_days")
        .when(F.col("week0_days") == 6, "b_6_days")
        .otherwise("c_7_days")
    )
    return (
        per_user.groupBy(bucket.alias("activation"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("retained").alias("n_retained"),
        )
        .select(
            "activation",
            "n_users",
            "n_retained",
            F.round(
                F.col("n_retained").cast("double") / F.col("n_users").cast("double"),
                9,
            ).alias("retention_rate"),
        )
        .orderBy("activation")
    )


ACTIVATION_RETENTION_ORACLE = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
f AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY 1),
o AS (
  SELECT ud.user_id, date_diff('day', f.first_day, ud.day) AS off
  FROM ud JOIN f USING (user_id)
),
pu AS (
  SELECT user_id,
         SUM(CASE WHEN off <= 6 THEN 1 ELSE 0 END) AS week0_days,
         MAX(CASE WHEN off BETWEEN 14 AND 27 THEN 1 ELSE 0 END) AS retained
  FROM o GROUP BY 1
)
SELECT CASE WHEN week0_days <= 5 THEN 'a_le_5_days'
            WHEN week0_days = 6 THEN 'b_6_days'
            ELSE 'c_7_days' END AS activation,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(retained) AS BIGINT) AS n_retained,
       round(CAST(SUM(retained) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
         AS retention_rate
FROM pu GROUP BY 1 ORDER BY 1
"""


def value_share_by_user_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value concentration by spend band: users bucketed by lifetime
    event value (500-wide bands, capped at 11+) with each band's
    share of all value — the monetization pyramid
    (``power_user_curve`` counts events; this weighs revenue).

    Determinism: per-user totals are exact DECIMAL sums; the band is
    an exact floor on DECIMAL/100; shares divide two exact decimals
    once.  No window anywhere — the band is a domain-bounded
    expression, not a rank."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast(_DEC)).alias("_tot")
    )
    band = F.least(F.floor(F.col("_tot") / F.lit(500)).cast("int"), F.lit(11))
    cell = per_user.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("_tot").alias("_band_val")
    )
    total = cell.agg(F.sum("_band_val").alias("_all"))
    return (
        cell.crossJoin(F.broadcast(total))
        .select(
            "band",
            "n_users",
            F.col("_band_val").cast("double").alias("band_value"),
            F.round(
                F.col("_band_val").cast("double") / F.col("_all").cast("double"),
                9,
            ).alias("share_of_value"),
        )
        .orderBy("band")
    )


VALUE_BAND_ORACLE = """
WITH pu AS (
  SELECT user_id, SUM(CAST(value AS DECIMAL(18,6))) AS _tot
  FROM events GROUP BY 1
),
cell AS (
  SELECT LEAST(CAST(FLOOR(_tot / 500) AS INT), 11) AS band,
         COUNT(*) AS n_users, SUM(_tot) AS _band_val
  FROM pu GROUP BY 1
),
tot AS (SELECT SUM(_band_val) AS _all FROM cell)
SELECT band, CAST(n_users AS BIGINT) AS n_users,
       CAST(_band_val AS DOUBLE) AS band_value,
       round(CAST(_band_val AS DOUBLE) / CAST(_all AS DOUBLE), 9)
         AS share_of_value
FROM cell, tot ORDER BY band
"""


def weekday_hour_peak_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak activity cell per event type: the (day-of-week × hour)
    cell with the most events, its count and share of the type's
    traffic — the one-line answer ops teams extract from
    ``hour_of_week_profile``'s 168-cell heatmap (an ARGMAX-over-cells
    operator).

    Plan: one partial-aggregatable groupBy to ≤ |types|×168 cells;
    the argmax is a row_number window PARTITIONED BY TYPE over that
    bounded cell table (ties break on (dow, hour) — deterministic);
    type totals aggregate the same cells."""
    ev = _events(spark, sf_dir)
    day = _day()
    dow = (F.datediff(day, F.lit(_MONDAY).cast("date")) % 7 + 7) % 7 + 1
    cell = ev.groupBy(
        "event_type",
        dow.cast("int").alias("dow"),
        F.hour("ts").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("event_type").orderBy(
        F.desc("n_events"), "dow", "hour"
    )
    tot = cell.groupBy("event_type").agg(F.sum("n_events").alias("_tot"))
    return (
        cell.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            F.col("dow").alias("peak_dow"),
            F.col("hour").alias("peak_hour"),
            F.col("n_events").alias("peak_events"),
            F.round(
                F.col("n_events").cast("double") / F.col("_tot").cast("double"),
                9,
            ).alias("peak_share"),
        )
        .orderBy("event_type")
    )


WEEKDAY_HOUR_PEAK_ORACLE = """
WITH cell AS (
  SELECT event_type,
         CAST(((date_diff('day', DATE '1970-01-05', CAST(ts AS DATE))
                % 7 + 7) % 7 + 1) AS INT) AS dow,
         CAST(hour(ts) AS INT) AS hour,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2, 3
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY n_events DESC, dow, hour) AS rn
  FROM cell
),
tot AS (SELECT event_type, SUM(n_events) AS _tot FROM cell GROUP BY 1)
SELECT r.event_type, r.dow AS peak_dow, r.hour AS peak_hour,
       CAST(r.n_events AS BIGINT) AS peak_events,
       round(CAST(r.n_events AS DOUBLE) / CAST(t._tot AS DOUBLE), 9)
         AS peak_share
FROM ranked r JOIN tot t USING (event_type)
WHERE r.rn = 1 ORDER BY r.event_type
"""


def sessions_per_user_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions-per-user distribution (30-minute inactivity gap, the
    module's sessionization convention): how many users sit in each
    5-wide session-count band (capped at 100+) over the corpus — the engagement-frequency histogram
    next to ``sessionization_stats``' per-session shape.

    Plan: ONE lag window PARTITIONED BY USER over the event stream
    marks session starts; a user-grain sum and a bounded histogram
    groupBy follow.  All exact integers; the share is one double
    division."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gap = F.col("ts_ns") - F.lag("ts_ns").over(w)
    starts = ev.select(
        "user_id",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000_000), 1)
        .otherwise(0)
        .alias("is_start"),
    )
    per_user = starts.groupBy("user_id").agg(
        F.sum("is_start").alias("n_sessions")
    )
    band = F.least(F.floor(F.col("n_sessions") / F.lit(5)) * 5, F.lit(100))
    cell = per_user.groupBy(band.cast("int").alias("session_band")).agg(
        F.count(F.lit(1)).alias("n_users")
    )
    total = cell.agg(F.sum("n_users").alias("_tot"))
    return (
        cell.crossJoin(F.broadcast(total))
        .select(
            "session_band",
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("_tot").cast("double"),
                9,
            ).alias("share_of_users"),
        )
        .orderBy("session_band")
    )


SESSIONS_PER_USER_ORACLE = """
WITH starts AS (
  SELECT user_id,
         CASE WHEN lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
              IS NULL
              OR epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
              > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
),
per_user AS (SELECT user_id, SUM(is_start) AS n_sessions FROM starts GROUP BY 1),
cell AS (
  SELECT CAST(LEAST((n_sessions // 5) * 5, 100) AS INT) AS session_band,
         COUNT(*) AS n_users
  FROM per_user GROUP BY 1
),
tot AS (SELECT SUM(n_users) AS _tot FROM cell)
SELECT session_band,
       CAST(n_users AS BIGINT) AS n_users,
       round(CAST(n_users AS DOUBLE) / CAST(_tot AS DOUBLE), 9)
         AS share_of_users
FROM cell, tot ORDER BY session_band
"""


def daily_value_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint curve over daily total value: for each day,
    the cumulative deviation from the corpus's mean daily value —
    the classic level-shift detector (the day where |CUSUM| peaks is
    the best single changepoint candidate; a flat random walk means
    no shift).  A NEW operator class for the engine: sequential
    drift statistics.

    Plan: ONE day-grain DECIMAL aggregate (≤ calendar-span rows),
    prefix sums via a triangular join over that bounded table (the
    ``churn_hazard_by_tenure`` idiom — no unpartitioned window), the
    mean broadcast back as one row.  Prefix sums stay exact DECIMAL;
    cusum = prefix − k·mean is an identical double chain on exact
    operands, rounded to 6 on both engines."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(_day().alias("day")).agg(
        F.sum(F.col("value").cast(_DEC)).alias("v")
    )
    tot = daily.agg(
        F.sum("v").alias("_tot"), F.count(F.lit(1)).alias("_n")
    )
    a, b = daily.alias("a"), daily.alias("b")
    prefix = (
        a.join(b, F.col("b.day") <= F.col("a.day"))
        .groupBy(F.col("a.day").alias("day"), F.col("a.v").alias("v"))
        .agg(
            F.sum(F.col("b.v")).alias("_prefix"),
            F.count(F.lit(1)).alias("k"),
        )
    )
    mean = F.col("_tot").cast("double") / F.col("_n").cast("double")
    return (
        prefix.crossJoin(F.broadcast(tot))
        .select(
            "day",
            F.col("v").cast("double").alias("daily_value"),
            F.round(
                F.col("_prefix").cast("double")
                - F.col("k").cast("double") * mean,
                6,
            ).alias("cusum"),
        )
        .orderBy("day")
    )


DAILY_VALUE_CUSUM_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,6))) AS v
  FROM events GROUP BY 1
),
tot AS (SELECT SUM(v) AS _tot, COUNT(*) AS _n FROM daily),
prefix AS (
  SELECT a.day, a.v, SUM(b.v) AS _prefix, COUNT(*) AS k
  FROM daily a JOIN daily b ON b.day <= a.day
  GROUP BY 1, 2
)
SELECT day,
       CAST(v AS DOUBLE) AS daily_value,
       round(CAST(_prefix AS DOUBLE)
             - CAST(k AS DOUBLE)
               * (CAST(_tot AS DOUBLE) / CAST(_n AS DOUBLE)), 6) AS cusum
FROM prefix, tot
ORDER BY day
"""


#: auto-gate for the bucketed sweep-line: below this event count the
#: plain per-day running-sum window is faster (one small sort); above
#: it a hot day's distinct instants no longer fit one task's sort and
#: the exact two-level bucket sweep keeps every sort bucket-local.
_PEAK_BUCKETED_MIN_EVENTS = 2_000_000

#: bucket width for the two-level sweep (1 minute): ≤ 1440 buckets
#: per day for the tiny carry window, with intra-bucket sorts of
#: instants/1440 each.
_PEAK_BUCKET_NS = 60 * 1_000_000_000


def peak_concurrent_sessions_daily(
    spark: SparkSession, sf_dir: str, bucketed: bool | None = None
) -> DataFrame:
    """Peak concurrent sessions per day: sessions (30-min-gap
    convention, as in ``sessionization_stats``) swept as +1/-1
    interval boundaries; the daily maximum of the running count is
    the capacity-planning number ("how many users at once?").  A
    session belongs to the day it STARTS (sessions crossing midnight
    count toward their start day — the stated convention).

    Plan: one user-partitioned window builds session ids; sessions
    reduce to (start, end) rows; boundaries GROUP BY (day, instant)
    first, so the running-sum sweep runs over DISTINCT TIMESTAMPS
    (already heavily reduced), and the instant's peak is
    ``running + minus`` — with starts counted before ends at an
    equal instant, the within-instant maximum sits after the +1s and
    before the -1s, which is exactly running_net + minus.  All
    counts exact integers.

    ``bucketed=None`` picks the sweep strategy by event count
    (footer-metadata, no job): the single per-day running-sum window
    below :data:`_PEAK_BUCKETED_MIN_EVENTS` (small sort, one task per
    day), else an EXACT two-level sweep (VERDICT r12 Next #6): per
    (day, minute-bucket) boundary nets first, a ≤1440-row-per-day
    carry window over buckets, then the intra-bucket instant sweep
    with the carry added — bit-identical peaks, but every sort is
    bucket-local so no single hot day bounds the stage."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gap = F.col("ts_ns") - F.lag("ts_ns").over(w)
    new_sess = (gap.isNull() | (gap > 30 * 60 * 1_000_000_000)).cast("long")
    sess = (
        ev.select(
            "user_id",
            "ts_ns",
            "ts",
            "event_id",
            F.sum(new_sess)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("session_no"),
        )
        .groupBy("user_id", "session_no")
        .agg(
            F.min("ts_ns").alias("start_ns"),
            F.max("ts_ns").alias("end_ns"),
            F.min(_day()).alias("day"),
        )
    )
    starts = sess.select("day", F.col("start_ns").alias("at"), F.lit(1).alias("plus"), F.lit(0).alias("minus"))
    ends = sess.select("day", F.col("end_ns").alias("at"), F.lit(0).alias("plus"), F.lit(1).alias("minus"))
    inst = (
        starts.unionByName(ends)
        .groupBy("day", "at")
        .agg(F.sum("plus").alias("p"), F.sum("minus").alias("m"))
    )
    if bucketed is None:
        bucketed = (
            table_rowcount(spark, sf_dir, "events")
            >= _PEAK_BUCKETED_MIN_EVENTS
        )
    if bucketed:
        binst = inst.withColumn(
            "bucket", F.expr(f"at div {_PEAK_BUCKET_NS}")
        )
        # carry entering each bucket = running net over PRIOR buckets
        # of the same day (≤ 1440 rows per day — a tiny sort)
        wb = Window.partitionBy("day").orderBy("bucket")
        carry = (
            binst.groupBy("day", "bucket")
            .agg(F.sum(F.col("p") - F.col("m")).alias("net"))
            .withColumn(
                "carry_in",
                F.coalesce(
                    F.sum("net").over(
                        wb.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                ),
            )
            .drop("net")
        )
        # exact intra-bucket sweep, parallel across (day, bucket)
        wi = Window.partitionBy("day", "bucket").orderBy("at")
        run = (
            binst.join(carry, ["day", "bucket"])
            .withColumn(
                "running",
                F.sum(F.col("p") - F.col("m")).over(
                    wi.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
            )
            .withColumn(
                "instant_peak",
                F.col("carry_in") + F.col("running") + F.col("m"),
            )
        )
    else:
        ws = Window.partitionBy("day").orderBy("at")
        run = inst.withColumn(
            "running",
            F.sum(F.col("p") - F.col("m")).over(
                ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        ).withColumn("instant_peak", F.col("running") + F.col("m"))
    daily = run.groupBy("day").agg(F.max("instant_peak").alias("peak_concurrent"))
    nsess = sess.groupBy("day").agg(F.count(F.lit(1)).alias("n_sessions"))
    return (
        nsess.join(daily, "day")
        .select("day", "n_sessions", "peak_concurrent")
        .orderBy("day")
    )


PEAK_CONCURRENT_ORACLE = """
WITH seq AS (
  SELECT user_id, epoch_us(ts) AS us, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
              IS NULL
              OR epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
              > 30 * 60 * 1000000
         THEN 1 ELSE 0 END AS new_sess
  FROM events
),
sess0 AS (
  SELECT user_id, us, ts,
         SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_no
  FROM seq
),
sess AS (
  SELECT user_id, session_no,
         MIN(us) AS start_us, MAX(us) AS end_us,
         MIN(CAST(ts AS DATE)) AS day
  FROM sess0 GROUP BY 1, 2
),
bound AS (
  SELECT day, start_us AS at, 1 AS plus, 0 AS minus FROM sess
  UNION ALL
  SELECT day, end_us AS at, 0 AS plus, 1 AS minus FROM sess
),
inst AS (
  SELECT day, at, SUM(plus) AS p, SUM(minus) AS m
  FROM bound GROUP BY 1, 2
),
run AS (
  SELECT day,
         SUM(p - m) OVER (
           PARTITION BY day ORDER BY at
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) + m AS instant_peak
  FROM inst
),
daily AS (SELECT day, MAX(instant_peak) AS peak_concurrent FROM run GROUP BY 1),
nsess AS (SELECT day, COUNT(*) AS n_sessions FROM sess GROUP BY 1)
SELECT n.day, CAST(n.n_sessions AS BIGINT) AS n_sessions,
       CAST(d.peak_concurrent AS BIGINT) AS peak_concurrent
FROM nsess n JOIN daily d USING (day)
ORDER BY n.day
"""


def value_p90_concentration_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value concentration above the per-type p90: for each event
    type, the DISCRETE 90th-percentile value cutoff (the value at
    rank ceil(0.9·n) — rank arithmetic on exact cent integers, never
    float interpolation) and the share of total value carried by
    events at or above it — "do 10% of the events carry half the
    money?".

    Plan: values quantize to cents and reduce to (type, cents)
    HISTOGRAM cells; the cumulative-count window runs over those
    distinct-value cells (already reduced from events grain), and the
    cutoff is the smallest value whose cumulative count reaches the
    rank — identical integer logic on both engines, no interpolation
    to diverge by an ulp."""
    ev = _events(spark, sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    hist = ev.groupBy(
        F.col("event_type"), cents.alias("vc")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tot = hist.groupBy("event_type").agg(
        F.sum("cnt").alias("n_events"),
        F.sum(F.col("vc") * F.col("cnt")).alias("_tot_cents"),
    )
    wv = Window.partitionBy("event_type").orderBy("vc")
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    j = cum.join(F.broadcast(tot), "event_type")
    # ceil(0.9 n) in EXACT integer arithmetic — float 0.9 products
    # round differently from DuckDB's decimal literal typing
    rank = F.expr("CAST((n_events * 9 + 9) DIV 10 AS BIGINT)")
    cut = (
        j.where(F.col("cum") >= rank)
        .groupBy("event_type", "n_events", "_tot_cents")
        .agg(F.min("vc").alias("_cut"))
    )
    above = (
        hist.join(F.broadcast(cut.select("event_type", "_cut")), "event_type")
        .where(F.col("vc") >= F.col("_cut"))
        .groupBy("event_type")
        .agg(
            F.sum("cnt").alias("n_above"),
            F.sum(F.col("vc") * F.col("cnt")).alias("_above_cents"),
        )
    )
    return (
        cut.join(above, "event_type")
        .select(
            "event_type",
            "n_events",
            (F.col("_cut").cast("double") / 100).alias("p90_value"),
            F.col("n_above").alias("n_events_above"),
            F.round(
                F.col("_above_cents").cast("double")
                / F.col("_tot_cents").cast("double"),
                9,
            ).alias("value_share_above_p90"),
        )
        .orderBy("event_type")
    )


VALUE_P90_CONCENTRATION_ORACLE = """
WITH hist AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS vc,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type, SUM(cnt) AS n_events, SUM(vc * cnt) AS _tot_cents
  FROM hist GROUP BY 1
),
cum AS (
  SELECT event_type, vc, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY vc
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM hist
),
cut AS (
  SELECT c.event_type, t.n_events, t._tot_cents, MIN(c.vc) AS _cut
  FROM cum c JOIN tot t USING (event_type)
  WHERE c.cum >= (t.n_events * 9 + 9) // 10
  GROUP BY 1, 2, 3
),
above AS (
  SELECT h.event_type, SUM(h.cnt) AS n_above, SUM(h.vc * h.cnt) AS _above_cents
  FROM hist h JOIN cut c USING (event_type)
  WHERE h.vc >= c._cut GROUP BY 1
)
SELECT c.event_type, CAST(c.n_events AS BIGINT) AS n_events,
       CAST(c._cut AS DOUBLE) / 100 AS p90_value,
       CAST(a.n_above AS BIGINT) AS n_events_above,
       round(CAST(a._above_cents AS DOUBLE) / CAST(c._tot_cents AS DOUBLE), 9)
         AS value_share_above_p90
FROM cut c JOIN above a USING (event_type)
ORDER BY c.event_type
"""


def max_dormancy_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of each user's LONGEST dormancy: the max gap (in
    whole days) between consecutive events per user, histogrammed
    over users — the churn-threshold calibration curve ("after how
    many silent days is a user really gone?").  Single-event users
    have no gap and are excluded (reported by
    ``sessions_per_user_histogram``'s population instead).

    Plan: one user-partitioned lag window over the user-keyed
    exchange, a per-user max, then a tiny day-grain histogram.  Gap
    days are exact integer floor division of ns deltas."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gap_days = F.floor(
        (F.col("ts_ns") - F.lag("ts_ns").over(w)) / (86400 * 1_000_000_000)
    )
    per_user = (
        ev.select("user_id", gap_days.alias("gd"))
        .where(F.col("gd").isNotNull())
        .groupBy("user_id")
        .agg(F.max("gd").alias("max_gap_days"))
    )
    return (
        per_user.groupBy("max_gap_days")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("max_gap_days")
    )


MAX_DORMANCY_ORACLE = """
WITH gaps AS (
  SELECT user_id,
         CAST(floor((epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
              / 86400000000.0) AS BIGINT) AS gd
  FROM events
),
per_user AS (
  SELECT user_id, MAX(gd) AS max_gap_days
  FROM gaps WHERE gd IS NOT NULL GROUP BY 1
)
SELECT max_gap_days, CAST(COUNT(*) AS BIGINT) AS n_users
FROM per_user GROUP BY 1 ORDER BY 1
"""


def event_type_user_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event types: Jaccard similarity of
    the USER SETS of every type pair — the feature-adjacency matrix
    ("do the people who purchase also search?") behind bundling and
    funnel design.

    Plan: events reduce ONCE to distinct (user, type); the pair
    expansion self-joins that reduced frame on user_id with t1 < t2 —
    per-user fan-out is bounded by |types|², a domain constant, so
    the join output stays O(users).  Counts exact; Jaccard is one
    double division."""
    ev = _events(spark, sf_dir)
    ut = ev.select("user_id", "event_type").distinct()
    cnt = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = ut.alias("a"), ut.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ca = cnt.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    cb = cnt.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("na").alias("n_users_a"),
            F.col("nb").alias("n_users_b"),
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_both")).cast("double"),
                9,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


EVENT_TYPE_JACCARD_ORACLE = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
cnt AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         COUNT(*) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT i.type_a, i.type_b,
       CAST(ca.n AS BIGINT) AS n_users_a,
       CAST(cb.n AS BIGINT) AS n_users_b,
       CAST(i.n_both AS BIGINT) AS n_both,
       round(CAST(i.n_both AS DOUBLE)
             / CAST(ca.n + cb.n - i.n_both AS DOUBLE), 9) AS jaccard
FROM inter i
JOIN cnt ca ON ca.event_type = i.type_a
JOIN cnt cb ON cb.event_type = i.type_b
ORDER BY i.type_a, i.type_b
"""


def user_journey_endpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifetime journey endpoints: each user's FIRST-ever event type
    crossed with their LATEST event type, as a |types|² matrix with
    row shares — where acquisitions start vs where users currently
    sit (the lifetime-scale companion to ``session_entry_exit``'s
    per-session matrix).

    Plan: ONE user-grain min/max-struct aggregate (tie-break
    (ts_ns, event_id) — a total order), then a tiny matrix rollup;
    shares via the cell-table-total idiom."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min(F.struct("ts_ns", "event_id", "event_type")).alias("first"),
        F.max(F.struct("ts_ns", "event_id", "event_type")).alias("last"),
    )
    cell = per_user.groupBy(
        F.col("first.event_type").alias("first_type"),
        F.col("last.event_type").alias("last_type"),
    ).agg(F.count(F.lit(1)).alias("n_users"))
    rowtot = cell.groupBy("first_type").agg(F.sum("n_users").alias("_row_n"))
    return (
        cell.join(F.broadcast(rowtot), "first_type")
        .select(
            "first_type",
            "last_type",
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("_row_n").cast("double"),
                9,
            ).alias("share_of_first_type"),
        )
        .orderBy("first_type", "last_type")
    )


USER_JOURNEY_ENDPOINTS_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn_first,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts) DESC, event_id DESC)
           AS rn_last
  FROM events
),
per_user AS (
  SELECT user_id,
         MAX(CASE WHEN rn_first = 1 THEN event_type END) AS first_type,
         MAX(CASE WHEN rn_last = 1 THEN event_type END) AS last_type
  FROM ranked GROUP BY 1
),
cell AS (
  SELECT first_type, last_type, COUNT(*) AS n_users
  FROM per_user GROUP BY 1, 2
),
rowtot AS (SELECT first_type, SUM(n_users) AS _row_n FROM cell GROUP BY 1)
SELECT c.first_type, c.last_type, CAST(c.n_users AS BIGINT) AS n_users,
       round(CAST(c.n_users AS DOUBLE) / CAST(r._row_n AS DOUBLE), 9)
         AS share_of_first_type
FROM cell c JOIN rowtot r USING (first_type)
ORDER BY c.first_type, c.last_type
"""


def user_active_streak_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of each user's LONGEST consecutive-active-day
    streak — the habit-formation curve product teams track next to
    ``max_dormancy_histogram``'s churn side (reference's event-explorer
    retention family).

    Plan: dedup to (user, day) grain FIRST (one exchange), then the
    classic gaps-and-islands key ``day_id − row_number`` inside a
    user-partitioned window; two tiny groupBys follow.  Everything is
    exact integer arithmetic."""
    ev = _events(spark, sf_dir)
    day_id = F.datediff(_day(), F.lit("1970-01-01"))
    dd = ev.select("user_id", day_id.alias("day_id")).distinct()
    w = Window.partitionBy("user_id").orderBy("day_id")
    island = F.col("day_id") - F.row_number().over(w)
    runs = (
        dd.select("user_id", island.alias("_isl"))
        .groupBy("user_id", "_isl")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    per_user = runs.groupBy("user_id").agg(F.max("run_len").alias("max_streak"))
    cell = per_user.groupBy("max_streak").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    tot = cell.agg(F.sum("n_users").alias("_tot"))
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            F.col("max_streak").cast("int").alias("max_streak_days"),
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("_tot").cast("double"),
                9,
            ).alias("share_of_users"),
        )
        .orderBy("max_streak_days")
    )


USER_ACTIVE_STREAK_ORACLE = """
WITH dd AS (
  SELECT DISTINCT user_id, date_diff('day', DATE '1970-01-01',
                                     CAST(ts AS DATE)) AS day_id
  FROM events
),
runs AS (
  SELECT user_id,
         day_id - row_number() OVER (PARTITION BY user_id ORDER BY day_id)
           AS _isl
  FROM dd
),
run_len AS (
  SELECT user_id, _isl, COUNT(*) AS run_len FROM runs GROUP BY 1, 2
),
per_user AS (
  SELECT user_id, MAX(run_len) AS max_streak FROM run_len GROUP BY 1
),
cell AS (
  SELECT max_streak, COUNT(*) AS n_users FROM per_user GROUP BY 1
),
tot AS (SELECT SUM(n_users) AS _tot FROM cell)
SELECT CAST(c.max_streak AS INT) AS max_streak_days,
       CAST(c.n_users AS BIGINT) AS n_users,
       round(CAST(c.n_users AS DOUBLE) / CAST(t._tot AS DOUBLE), 9)
         AS share_of_users
FROM cell c CROSS JOIN tot t
ORDER BY max_streak_days
"""


def session_first_purchase_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within purchase-containing sessions (30-minute gap rule), the
    ordinal position of the FIRST purchase event — how deep into a
    visit conversion happens, the page-depth companion to
    ``funnel_step_latency``'s time axis.

    Plan: the module's standard two windows over ONE user-keyed
    exchange (lag marks session starts; a running sum numbers the
    sessions; row_number gives within-session positions), then a
    session-grain min and a bounded histogram.  Positions are capped
    at 20 so the output stays enum-sized."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gap = F.col("ts_ns") - F.lag("ts_ns").over(w)
    marked = ev.select(
        "user_id",
        "ts_ns",
        "event_id",
        "event_type",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000_000), 1)
        .otherwise(0)
        .alias("is_start"),
    )
    sess = marked.withColumn(
        "session_no", F.sum("is_start").over(w)
    ).withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy("user_id", "session_no").orderBy(
                "ts_ns", "event_id"
            )
        ),
    )
    first_buy = (
        sess.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "session_no")
        .agg(F.min("pos").alias("first_pos"))
    )
    capped = F.least(F.col("first_pos"), F.lit(20))
    cell = first_buy.groupBy(capped.cast("int").alias("first_purchase_pos")).agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    tot = cell.agg(F.sum("n_sessions").alias("_tot"))
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            "first_purchase_pos",
            "n_sessions",
            F.round(
                F.col("n_sessions").cast("double") / F.col("_tot").cast("double"),
                9,
            ).alias("share_of_sessions"),
        )
        .orderBy("first_purchase_pos")
    )


SESSION_FIRST_PURCHASE_ORACLE = """
WITH marked AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
numbered AS (
  SELECT user_id, event_type, ts_us, event_id,
         SUM(is_start) OVER (PARTITION BY user_id
                             ORDER BY ts_us, event_id) AS session_no
  FROM marked
),
sess AS (
  SELECT user_id, event_type, session_no,
         row_number() OVER (PARTITION BY user_id, session_no
                            ORDER BY ts_us, event_id) AS pos
  FROM numbered
),
first_buy AS (
  SELECT user_id, session_no, MIN(pos) AS first_pos
  FROM sess WHERE event_type = 'purchase' GROUP BY 1, 2
),
cell AS (
  SELECT CAST(least(first_pos, 20) AS INT) AS first_purchase_pos,
         COUNT(*) AS n_sessions
  FROM first_buy GROUP BY 1
),
tot AS (SELECT SUM(n_sessions) AS _tot FROM cell)
SELECT c.first_purchase_pos, CAST(c.n_sessions AS BIGINT) AS n_sessions,
       round(CAST(c.n_sessions AS DOUBLE) / CAST(t._tot AS DOUBLE), 9)
         AS share_of_sessions
FROM cell c CROSS JOIN tot t
ORDER BY c.first_purchase_pos
"""


def event_type_run_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length distribution of REPEATED event types per user
    stream: how long do same-type bursts run before the user switches
    (error storms, click trains, view binges) — the repetition shape
    ``event_burstiness`` summarizes in time, restated in sequence
    space.

    Plan: the rn − rn_by_type gaps-and-islands key over ONE
    user-keyed exchange (two window functions, same partitioning),
    then an island-grain count and a (type, length) histogram.
    Everything exact integers; one double division for the share."""
    ev = _events(spark, sf_dir)
    w_all = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        "ts_ns", "event_id"
    )
    isl = (F.row_number().over(w_all) - F.row_number().over(w_type)).alias(
        "_isl"
    )
    runs = (
        ev.select("user_id", "event_type", isl)
        .groupBy("user_id", "event_type", "_isl")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    cell = runs.groupBy("event_type", "run_len").agg(
        F.count(F.lit(1)).alias("n_runs")
    )
    tot = cell.groupBy("event_type").agg(F.sum("n_runs").alias("_tot"))
    return (
        cell.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            F.col("run_len").cast("int").alias("run_len"),
            "n_runs",
            F.round(
                F.col("n_runs").cast("double") / F.col("_tot").cast("double"),
                9,
            ).alias("share_of_runs"),
        )
        .orderBy("event_type", "run_len")
    )


EVENT_TYPE_RUN_LENGTHS_ORACLE = """
WITH keyed AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id)
         - row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY epoch_us(ts), event_id) AS _isl
  FROM events
),
runs AS (
  SELECT user_id, event_type, _isl, COUNT(*) AS run_len
  FROM keyed GROUP BY 1, 2, 3
),
cell AS (
  SELECT event_type, run_len, COUNT(*) AS n_runs FROM runs GROUP BY 1, 2
),
tot AS (SELECT event_type, SUM(n_runs) AS _tot FROM cell GROUP BY 1)
SELECT c.event_type, CAST(c.run_len AS INT) AS run_len,
       CAST(c.n_runs AS BIGINT) AS n_runs,
       round(CAST(c.n_runs AS DOUBLE) / CAST(t._tot AS DOUBLE), 9)
         AS share_of_runs
FROM cell c JOIN tot t USING (event_type)
ORDER BY c.event_type, c.run_len
"""


def event_type_daily_share_volatility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mix-stability report: per event type, the day-to-day
    volatility (sample stddev) of its share of daily traffic — a
    type whose share swings is an instrumentation or rollout signal
    even when totals look flat (the time-axis companion to
    ``user_entropy_tiers``' per-user mix).

    Determinism: daily shares are one double division of exact
    counts ROUNDED TO 9 dp into DECIMAL(18,9); Σx and Σx² are then
    exact decimal sums (the module's ln-contract applied to
    divisions), and the variance is a row-level double expression on
    those exact sums.  Plan: two day-grain aggregates and one
    type-grain rollup — no windows."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(_day().alias("day"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    dtot = daily.groupBy("day").agg(F.sum("n").alias("_dt"))
    share = F.round(
        F.col("n").cast("double") / F.col("_dt").cast("double"), 9
    ).cast("decimal(18,9)")
    per_type = (
        daily.join(F.broadcast(dtot), "day")
        .select("event_type", share.alias("x"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("x").alias("_sx"),
            F.sum((F.col("x") * F.col("x")).cast("decimal(38,18)")).alias("_sxx"),
        )
    )
    nd = F.col("n_days").cast("double")
    sx = F.col("_sx").cast("double")
    sxx = F.col("_sxx").cast("double")
    var = (sxx - sx * sx / nd) / (nd - 1.0)
    return (
        per_type.where(F.col("n_days") > 1)
        .select(
            "event_type",
            "n_days",
            F.round(sx / nd, 9).alias("mean_share"),
            F.round(F.sqrt(var), 9).alias("share_volatility"),
        )
        .orderBy("event_type")
    )


SHARE_VOLATILITY_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
dtot AS (SELECT day, SUM(n) AS _dt FROM daily GROUP BY 1),
per_type AS (
  SELECT d.event_type, COUNT(*) AS n_days,
         SUM(CAST(round(CAST(d.n AS DOUBLE) / CAST(t._dt AS DOUBLE), 9)
                  AS DECIMAL(18,9))) AS _sx,
         SUM(CAST(CAST(round(CAST(d.n AS DOUBLE) / CAST(t._dt AS DOUBLE), 9)
                       AS DECIMAL(18,9))
                  * CAST(round(CAST(d.n AS DOUBLE) / CAST(t._dt AS DOUBLE), 9)
                         AS DECIMAL(18,9)) AS DECIMAL(38,18))) AS _sxx
  FROM daily d JOIN dtot t USING (day)
  GROUP BY 1
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       round(CAST(_sx AS DOUBLE) / CAST(n_days AS DOUBLE), 9) AS mean_share,
       round(sqrt((CAST(_sxx AS DOUBLE)
                   - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE)
                     / CAST(n_days AS DOUBLE))
                  / (CAST(n_days AS DOUBLE) - 1.0)), 9) AS share_volatility
FROM per_type WHERE n_days > 1
ORDER BY event_type
"""


def night_owl_vs_early_bird(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users classified by their MAJORITY activity band (night 0-5h,
    morning 6-11h, afternoon 12-17h, evening 18-23h; ties to the
    earlier band) — the circadian segmentation behind send-time
    optimization, with events-per-user intensity per class.

    Plan: one (user, band) aggregate off the raw stream, an argmax
    window over ≤4 rows per user, and an enum-sized rollup.  Hours
    come from exact epoch integer arithmetic (the module's hour_id
    convention — native hour() functions cross engines only with
    timezone care)."""
    ev = _events(spark, sf_dir)
    # integer div throughout: ts_ns exceeds 2^53, so a double `/`
    # would round before the floor
    hour = F.expr("ts_ns div 3600000000000") % 24
    band_idx = (hour.cast("long") / F.lit(6)).cast("int")
    ub = ev.select("user_id", band_idx.alias("band_idx")).groupBy(
        "user_id", "band_idx"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("band_idx"))
    per_user = (
        ub.withColumn("rn", F.row_number().over(w))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("band_idx"))).alias("band_idx"),
            F.sum("n").alias("n_events"),
        )
    )
    band_name = (
        F.when(F.col("band_idx") == 0, "night")
        .when(F.col("band_idx") == 1, "morning")
        .when(F.col("band_idx") == 2, "afternoon")
        .otherwise("evening")
    )
    cell = per_user.groupBy(band_name.alias("majority_band")).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_events").alias("n_events"),
    )
    tot = cell.agg(F.sum("n_users").alias("_tot"))
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            "majority_band",
            "n_users",
            "n_events",
            F.round(
                F.col("n_users").cast("double") / F.col("_tot").cast("double"),
                9,
            ).alias("share_of_users"),
            F.round(
                F.col("n_events").cast("double") / F.col("n_users").cast("double"),
                9,
            ).alias("events_per_user"),
        )
        .orderBy("majority_band")
    )


NIGHT_OWL_ORACLE = """
WITH ub AS (
  SELECT user_id,
         CAST(((epoch_us(ts) // 3600000000) % 24) // 6 AS INT) AS band_idx,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT user_id, band_idx, n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, band_idx ASC) AS rn
  FROM ub
),
per_user AS (
  SELECT user_id,
         MAX(CASE WHEN rn = 1 THEN band_idx END) AS band_idx,
         SUM(n) AS n_events
  FROM ranked GROUP BY 1
),
cell AS (
  SELECT CASE band_idx WHEN 0 THEN 'night' WHEN 1 THEN 'morning'
                       WHEN 2 THEN 'afternoon' ELSE 'evening' END
           AS majority_band,
         COUNT(*) AS n_users, SUM(n_events) AS n_events
  FROM per_user GROUP BY 1
),
tot AS (SELECT SUM(n_users) AS _tot FROM cell)
SELECT c.majority_band, CAST(c.n_users AS BIGINT) AS n_users,
       CAST(c.n_events AS BIGINT) AS n_events,
       round(CAST(c.n_users AS DOUBLE) / CAST(t._tot AS DOUBLE), 9)
         AS share_of_users,
       round(CAST(c.n_events AS DOUBLE) / CAST(c.n_users AS DOUBLE), 9)
         AS events_per_user
FROM cell c CROSS JOIN tot t
ORDER BY c.majority_band
"""


def value_by_event_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average event value as a function of the user's EVENT ORDINAL
    (1st, 2nd, … capped at 20+): does value grow as users mature —
    the engagement learning-curve next to
    ``first_week_activation_retention``'s calendar axis.

    Plan: ONE row_number window over the user-keyed exchange, a
    bounded histogram aggregate.  Value sums exact DECIMAL; the mean
    is one double division."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    ordinal = F.least(F.row_number().over(w), F.lit(20))
    cell = (
        ev.select(ordinal.alias("event_ordinal"), "value")
        .groupBy("event_ordinal")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).alias("_sv"),
        )
    )
    return cell.select(
        F.col("event_ordinal").cast("int").alias("event_ordinal"),
        "n_events",
        F.round(
            F.col("_sv").cast("double") / F.col("n_events").cast("double"), 9
        ).alias("mean_value"),
    ).orderBy("event_ordinal")


VALUE_BY_ORDINAL_ORACLE = """
WITH ranked AS (
  SELECT value,
         least(row_number() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id), 20)
           AS event_ordinal
  FROM events
),
cell AS (
  SELECT event_ordinal, COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(18,6))) AS _sv
  FROM ranked GROUP BY 1
)
SELECT CAST(event_ordinal AS INT) AS event_ordinal,
       CAST(n_events AS BIGINT) AS n_events,
       round(CAST(_sv AS DOUBLE) / CAST(n_events AS DOUBLE), 9) AS mean_value
FROM cell ORDER BY event_ordinal
"""


def top_value_sessions(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Session leaderboard: the k highest-value sessions (30-minute
    gap rule) with owner, event count, span and total value — the
    "whale visit" drill-down every revenue dashboard links from.

    Plan: the module's standard session numbering (lag + running sum
    over ONE user-keyed exchange), a session-grain aggregate, then a
    global top-k — rank by exact DECIMAL value with the unique
    (user, session) tiebreak."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gap = F.col("ts_ns") - F.lag("ts_ns").over(w)
    marked = ev.select(
        "user_id",
        "ts_ns",
        "event_id",
        "value",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000_000), 1)
        .otherwise(0)
        .alias("is_start"),
    )
    sess = marked.withColumn("session_no", F.sum("is_start").over(w))
    per_sess = sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(_DEC)).alias("_tv"),
        (F.max("ts_ns") - F.min("ts_ns")).alias("_span_ns"),
    )
    return (
        per_sess.select(
            "user_id",
            F.col("session_no").cast("long").alias("session_no"),
            "n_events",
            # integer div: a double `/` could round a near-boundary span
            F.expr("_span_ns div 1000000000").alias("span_sec"),
            F.col("_tv").cast("double").alias("total_value"),
        )
        .orderBy(F.col("_tv").desc(), "user_id", "session_no")
        .limit(k)
    )


TOP_VALUE_SESSIONS_ORACLE = """
WITH marked AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id, value, ts_us,
         SUM(is_start) OVER (PARTITION BY user_id
                             ORDER BY ts_us, event_id) AS session_no
  FROM marked
),
per_sess AS (
  SELECT user_id, session_no, COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(18,6))) AS _tv,
         CAST((MAX(ts_us) - MIN(ts_us)) // 1000000 AS BIGINT) AS span_sec
  FROM sess GROUP BY 1, 2
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       CAST(n_events AS BIGINT) AS n_events, span_sec,
       CAST(_tv AS DOUBLE) AS total_value
FROM per_sess
ORDER BY _tv DESC, user_id, session_no
LIMIT 20
"""


def session_conversion_by_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion rate by session DEPTH band (1, 2, 3-5, 6-10, 11-20,
    21+ events): do longer visits convert more — the engagement-depth
    funnel that complements ``session_first_purchase_position``'s
    within-session view with the across-sessions rate (non-converting
    sessions included).

    Plan: the module's standard session numbering (two windows over
    ONE user-keyed exchange), a session-grain aggregate carrying the
    purchase flag, then an enum-sized band rollup."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gap = F.col("ts_ns") - F.lag("ts_ns").over(w)
    marked = ev.select(
        "user_id",
        "ts_ns",
        "event_id",
        "event_type",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000_000), 1)
        .otherwise(0)
        .alias("is_start"),
    )
    sess = marked.withColumn("session_no", F.sum("is_start").over(w))
    per_sess = sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("depth"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted"),
    )
    band = (
        F.when(F.col("depth") == 1, "1")
        .when(F.col("depth") == 2, "2")
        .when(F.col("depth") <= 5, "3-5")
        .when(F.col("depth") <= 10, "6-10")
        .when(F.col("depth") <= 20, "11-20")
        .otherwise("21+")
    )
    cell = per_sess.groupBy(band.alias("depth_band")).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("converted").alias("n_converted"),
    )
    return cell.select(
        "depth_band",
        "n_sessions",
        F.col("n_converted").cast("long").alias("n_converted"),
        F.round(
            F.col("n_converted").cast("double") / F.col("n_sessions").cast("double"),
            9,
        ).alias("conversion_rate"),
    ).orderBy("depth_band")


SESSION_CONVERSION_DEPTH_ORACLE = """
WITH marked AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id, event_type,
         SUM(is_start) OVER (PARTITION BY user_id
                             ORDER BY ts_us, event_id) AS session_no
  FROM marked
),
per_sess AS (
  SELECT user_id, session_no, COUNT(*) AS depth,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM sess GROUP BY 1, 2
),
cell AS (
  SELECT CASE WHEN depth = 1 THEN '1' WHEN depth = 2 THEN '2'
              WHEN depth <= 5 THEN '3-5' WHEN depth <= 10 THEN '6-10'
              WHEN depth <= 20 THEN '11-20' ELSE '21+' END AS depth_band,
         COUNT(*) AS n_sessions, SUM(converted) AS n_converted
  FROM per_sess GROUP BY 1
)
SELECT depth_band, CAST(n_sessions AS BIGINT) AS n_sessions,
       CAST(n_converted AS BIGINT) AS n_converted,
       round(CAST(n_converted AS DOUBLE) / CAST(n_sessions AS DOUBLE), 9)
         AS conversion_rate
FROM cell ORDER BY depth_band
"""


def error_recovery_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How fast do users recover after an error event — the delta
    from each ``error`` event to the user's NEXT non-error event,
    histogrammed into ops-review bands (<10 s, <1 min, <10 min,
    <1 h, ≥1 h, never) — the reliability-UX metric next to
    ``event_type_run_lengths``' error-storm view.

    Plan: ONE forward-frame window (min of following non-error
    timestamps) over the user-keyed exchange, then an enum-sized
    histogram.  Deltas are exact integer microseconds."""
    ev = _events(spark, sf_dir)
    us = F.expr("ts_ns div 1000")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    next_ok = F.min(
        F.when(F.col("event_type") != "error", us)
    ).over(w)
    errs = (
        ev.select(
            "user_id",
            "event_type",
            us.alias("_us"),
            next_ok.alias("_next_ok"),
        )
        .where(F.col("event_type") == "error")
    )
    band = (
        F.when(F.col("_next_ok").isNull(), "never")
        .when(F.col("_next_ok") - F.col("_us") < 10_000_000, "lt_10s")
        .when(F.col("_next_ok") - F.col("_us") < 60_000_000, "lt_1m")
        .when(F.col("_next_ok") - F.col("_us") < 600_000_000, "lt_10m")
        .when(F.col("_next_ok") - F.col("_us") < 3_600_000_000, "lt_1h")
        .otherwise("ge_1h")
    )
    cell = errs.groupBy(band.alias("recovery_band")).agg(
        F.count(F.lit(1)).alias("n_errors")
    )
    tot = cell.agg(F.sum("n_errors").alias("_tot"))
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            "recovery_band",
            "n_errors",
            F.round(
                F.col("n_errors").cast("double") / F.col("_tot").cast("double"),
                9,
            ).alias("share_of_errors"),
        )
        .orderBy("recovery_band")
    )


ERROR_RECOVERY_ORACLE = """
WITH marked AS (
  SELECT user_id, event_type, epoch_us(ts) AS _us,
         MIN(CASE WHEN event_type <> 'error' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS _next_ok
  FROM events
),
cell AS (
  SELECT CASE WHEN _next_ok IS NULL THEN 'never'
              WHEN _next_ok - _us < 10000000 THEN 'lt_10s'
              WHEN _next_ok - _us < 60000000 THEN 'lt_1m'
              WHEN _next_ok - _us < 600000000 THEN 'lt_10m'
              WHEN _next_ok - _us < 3600000000 THEN 'lt_1h'
              ELSE 'ge_1h' END AS recovery_band,
         COUNT(*) AS n_errors
  FROM marked WHERE event_type = 'error' GROUP BY 1
),
tot AS (SELECT SUM(n_errors) AS _tot FROM cell)
SELECT c.recovery_band, CAST(c.n_errors AS BIGINT) AS n_errors,
       round(CAST(c.n_errors AS DOUBLE) / CAST(t._tot AS DOUBLE), 9)
         AS share_of_errors
FROM cell c CROSS JOIN tot t
ORDER BY c.recovery_band
"""


def cohort_value_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-weighted retention curve: for each week offset k, the
    share of all cohorts' week-0 event value that recurs in week k
    (cohort = the user's first active week) — ``retention_cohorts``
    counts heads; this weighs them by the money, which is the number
    revenue forecasting actually discounts by.

    Plan: user-grain first-week aggregate, (user, week) value cells,
    one join, then an enum-sized offset rollup (offsets capped at 8).
    Value through DECIMAL end to end; the share is one double
    division of exact decimal sums."""
    ev = _events(spark, sf_dir)
    week = (
        F.floor(F.datediff(_day(), F.lit(_MONDAY).cast("date")) / 7)
    ).cast("long")
    uw = ev.select(
        "user_id", week.alias("week_id"), F.col("value").cast(_DEC).alias("v")
    ).groupBy("user_id", "week_id").agg(F.sum("v").alias("_wv"))
    first = uw.groupBy("user_id").agg(F.min("week_id").alias("_cw"))
    cell = (
        uw.join(first, "user_id")
        .select(
            (F.col("week_id") - F.col("_cw")).alias("week_offset"), "_wv"
        )
        .where(F.col("week_offset") <= 8)
        .groupBy("week_offset")
        .agg(
            F.count(F.lit(1)).alias("n_user_weeks"),
            F.sum("_wv").alias("_ov"),
        )
    )
    base = cell.where(F.col("week_offset") == 0).select(
        F.col("_ov").alias("_base")
    )
    return (
        cell.crossJoin(F.broadcast(base))
        .select(
            F.col("week_offset").cast("int").alias("week_offset"),
            "n_user_weeks",
            F.col("_ov").cast("double").alias("retained_value"),
            F.round(
                F.col("_ov").cast("double") / F.col("_base").cast("double"), 9
            ).alias("value_retention"),
        )
        .orderBy("week_offset")
    )


COHORT_VALUE_RETENTION_ORACLE = """
WITH uw AS (
  SELECT user_id,
         CAST(floor(date_diff('day', DATE '1970-01-05',
                              CAST(ts AS DATE)) / 7.0) AS BIGINT) AS week_id,
         SUM(CAST(value AS DECIMAL(18,6))) AS _wv
  FROM events GROUP BY 1, 2
),
first AS (SELECT user_id, MIN(week_id) AS _cw FROM uw GROUP BY 1),
cell AS (
  SELECT u.week_id - f._cw AS week_offset,
         COUNT(*) AS n_user_weeks, SUM(u._wv) AS _ov
  FROM uw u JOIN first f USING (user_id)
  WHERE u.week_id - f._cw <= 8
  GROUP BY 1
),
base AS (SELECT _ov AS _base FROM cell WHERE week_offset = 0)
SELECT CAST(c.week_offset AS INT) AS week_offset,
       CAST(c.n_user_weeks AS BIGINT) AS n_user_weeks,
       CAST(c._ov AS DOUBLE) AS retained_value,
       round(CAST(c._ov AS DOUBLE) / CAST(b._base AS DOUBLE), 9)
         AS value_retention
FROM cell c CROSS JOIN base b
ORDER BY c.week_offset
"""


QUERIES = {
    "daily_value_cusum": daily_value_cusum,
    "event_type_user_jaccard": event_type_user_jaccard,
    "user_journey_endpoints": user_journey_endpoints,
    "weekday_hour_peak_per_type": weekday_hour_peak_per_type,
    "sessions_per_user_histogram": sessions_per_user_histogram,
    "new_vs_returning_daily": new_vs_returning_daily,
    "resurrections_monthly": resurrections_monthly,
    "user_entropy_tiers": user_entropy_tiers,
    "weekend_lift_by_type": weekend_lift_by_type,
    "first_week_activation_retention": first_week_activation_retention,
    "value_share_by_user_band": value_share_by_user_band,
    "peak_concurrent_sessions_daily": peak_concurrent_sessions_daily,
    "value_p90_concentration_by_type": value_p90_concentration_by_type,
    "max_dormancy_histogram": max_dormancy_histogram,
    "user_active_streak_histogram": user_active_streak_histogram,
    "session_first_purchase_position": session_first_purchase_position,
    "event_type_run_lengths": event_type_run_lengths,
    "event_type_daily_share_volatility": event_type_daily_share_volatility,
    "night_owl_vs_early_bird": night_owl_vs_early_bird,
    "value_by_event_ordinal": value_by_event_ordinal,
    "top_value_sessions": top_value_sessions,
    "session_conversion_by_depth": session_conversion_by_depth,
    "error_recovery_time": error_recovery_time,
    "cohort_value_retention": cohort_value_retention,
}

ORACLES = {
    "error_recovery_time": ERROR_RECOVERY_ORACLE,
    "cohort_value_retention": COHORT_VALUE_RETENTION_ORACLE,
    "value_by_event_ordinal": VALUE_BY_ORDINAL_ORACLE,
    "top_value_sessions": TOP_VALUE_SESSIONS_ORACLE,
    "session_conversion_by_depth": SESSION_CONVERSION_DEPTH_ORACLE,
    "event_type_daily_share_volatility": SHARE_VOLATILITY_ORACLE,
    "night_owl_vs_early_bird": NIGHT_OWL_ORACLE,
    "user_active_streak_histogram": USER_ACTIVE_STREAK_ORACLE,
    "session_first_purchase_position": SESSION_FIRST_PURCHASE_ORACLE,
    "event_type_run_lengths": EVENT_TYPE_RUN_LENGTHS_ORACLE,
    "event_type_user_jaccard": EVENT_TYPE_JACCARD_ORACLE,
    "user_journey_endpoints": USER_JOURNEY_ENDPOINTS_ORACLE,
    "peak_concurrent_sessions_daily": PEAK_CONCURRENT_ORACLE,
    "value_p90_concentration_by_type": VALUE_P90_CONCENTRATION_ORACLE,
    "max_dormancy_histogram": MAX_DORMANCY_ORACLE,
    "daily_value_cusum": DAILY_VALUE_CUSUM_ORACLE,
    "weekday_hour_peak_per_type": WEEKDAY_HOUR_PEAK_ORACLE,
    "sessions_per_user_histogram": SESSIONS_PER_USER_ORACLE,
    "new_vs_returning_daily": NEW_VS_RETURNING_ORACLE,
    "resurrections_monthly": RESURRECTIONS_ORACLE,
    "user_entropy_tiers": USER_ENTROPY_ORACLE,
    "weekend_lift_by_type": WEEKEND_LIFT_ORACLE,
    "first_week_activation_retention": ACTIVATION_RETENTION_ORACLE,
    "value_share_by_user_band": VALUE_BAND_ORACLE,
}
