"""Round-10 event-analytics additions: discrete churn hazard by
tenure and first-touch composition by signup cohort — lifecycle
reports the reference's retention/funnel feature flags point at
(rakam-spi/.../UserPluginConfig.java:18-19), expressed as declarative
DataFrame plans over the events stream.

Determinism: week grain is ``date_trunc('week', ts)::date`` (Monday
anchor in BOTH engines); tenure arithmetic is exact integer day
diffs; every ratio is a single double division of exact integers
(rounded identically on both sides where a chain is unavoidable).

Scale: both operators reduce to user grain with one user-keyed
exchange before anything else touches the rows; the hazard table's
cumulative "at risk" count is computed with a triangular join over
the TENURE-GRAIN aggregate (rows ≤ calendar span in weeks — domain-
bounded), never a global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def churn_hazard_by_tenure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time churn hazard by tenure week: for each tenure t
    (weeks since the user's first active week), the probability that
    a user whose activity REACHED tenure t stopped there —
    h(t) = #users whose LAST active week is at tenure t
         / #users whose last active week is at tenure ≥ t.
    The survival-analysis companion to ``user_lifecycle_grid`` (grid:
    who moved state this week; hazard: at which AGE users quit).
    Users still active in the corpus's final week are counted as
    ended at their observed tenure — the report describes this
    dataset's horizon, not an open-ended forecast (the right-censored
    estimator is ``order_survival_curve``'s Kaplan-Meier shape).

    Plan: distinct (user, week) → one user-keyed aggregate to
    (first_week, last_week) → tenure-grain counts; the at-risk
    denominator is a reverse-cumulative sum over the TENURE aggregate
    via a triangular join (rows ≤ calendar-span weeks, so the join is
    over a domain-bounded table — no unpartitioned window, no second
    pass over users).  The oracle computes the same denominator with
    a window instead — two decompositions, one answer."""
    ev = _events(spark, sf_dir)
    wk = F.date_trunc("week", F.col("ts")).cast("date")
    span = (
        ev.select("user_id", wk.alias("week"))
        .groupBy("user_id")
        .agg(F.min("week").alias("first_week"), F.max("week").alias("last_week"))
        .select(
            (F.datediff("last_week", "first_week") / 7).cast("long").alias("tenure")
        )
    )
    ended = span.groupBy("tenure").agg(F.count(F.lit(1)).alias("n_ended"))
    at_risk = (
        ended.alias("a")
        .join(broadcast(ended.alias("b")), F.col("b.tenure") >= F.col("a.tenure"))
        .groupBy(F.col("a.tenure").alias("tenure"), F.col("a.n_ended").alias("n_ended"))
        .agg(F.sum("b.n_ended").alias("n_at_risk"))
    )
    return at_risk.select(
        "tenure",
        "n_ended",
        "n_at_risk",
        F.round(
            F.col("n_ended").cast("double") / F.col("n_at_risk").cast("double"), 9
        ).alias("hazard"),
    ).orderBy("tenure")


CHURN_HAZARD_ORACLE = """
WITH span AS (
  SELECT CAST(date_diff('day',
              MIN(CAST(date_trunc('week', ts) AS DATE)),
              MAX(CAST(date_trunc('week', ts) AS DATE))) / 7 AS BIGINT) AS tenure
  FROM events GROUP BY user_id
),
ended AS (SELECT tenure, CAST(COUNT(*) AS BIGINT) AS n_ended FROM span GROUP BY 1)
SELECT tenure, n_ended,
       CAST(SUM(n_ended) OVER (
         ORDER BY tenure DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_at_risk,
       round(CAST(n_ended AS DOUBLE) / CAST(SUM(n_ended) OVER (
         ORDER BY tenure DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE), 9) AS hazard
FROM ended ORDER BY tenure
"""


def first_event_type_by_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch composition per signup cohort: for each cohort
    month (the month of a user's FIRST event) the distribution of
    what that first event WAS — the acquisition-mix report behind
    "are January's signups arriving through the same door as June's"
    (companion to ``daily_new_vs_returning``, which counts arrivals
    without attributing the entry action).

    The first event is selected by MIN over a (ts_ns, event_id, …)
    struct — event_id is unique, so the pick is total-ordered and
    needs no window: one partial-aggregatable user-keyed groupBy.
    Cohort shares divide exact counts within each month (the share
    window runs over event-TYPE-grain rows per month — an enum-
    bounded input).  The oracle takes the row_number-window route
    instead."""
    ev = _events(spark, sf_dir)
    first = (
        ev.groupBy("user_id")
        .agg(F.min(F.struct("ts_ns", "event_id", "event_type", "ts")).alias("f"))
        .select(
            F.date_trunc("month", F.col("f.ts")).cast("date").alias("cohort_month"),
            F.col("f.event_type").alias("first_event_type"),
        )
    )
    cell = first.groupBy("cohort_month", "first_event_type").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    w = Window.partitionBy("cohort_month")
    return (
        cell.withColumn(
            "cohort_share",
            F.round(
                F.col("n_users").cast("double")
                / F.sum("n_users").over(w).cast("double"),
                9,
            ),
        )
        .orderBy("cohort_month", "first_event_type")
    )


FIRST_EVENT_COHORT_ORACLE = """
WITH firsts AS (
  SELECT user_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
first1 AS (
  SELECT CAST(date_trunc('month', ts) AS DATE) AS cohort_month, event_type
  FROM firsts WHERE rn = 1
),
cell AS (
  SELECT cohort_month, event_type AS first_event_type,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM first1 GROUP BY 1, 2
)
SELECT cohort_month, first_event_type, n_users,
       round(CAST(n_users AS DOUBLE) /
             CAST(SUM(n_users) OVER (PARTITION BY cohort_month) AS DOUBLE), 9)
         AS cohort_share
FROM cell ORDER BY cohort_month, first_event_type
"""


def session_conversion_by_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session conversion by ENTRY action: sessions (30-min-gap
    convention, as in ``sessionization_stats``) grouped by their
    first event type, with the share that contains a ``purchase`` —
    the landing-experience report ("sessions that start with a view
    convert at X%, sessions that start with an error at Y%").

    One user-partitioned window pass builds session ids (lag + cumsum
    over the same exchange); the entry event is a MIN over the
    (ts_ns, event_id, type) struct per session — no second window —
    and conversion is a MAX over a boolean.  Counts exact; the rate
    is one double division."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gap = F.col("ts_ns") - F.lag("ts_ns").over(w)
    new_sess = (gap.isNull() | (gap > 30 * 60 * 1_000_000_000)).cast("long")
    sess = ev.select(
        "user_id",
        "ts_ns",
        "event_id",
        "event_type",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_no"),
    )
    per_session = sess.groupBy("user_id", "session_no").agg(
        F.min(F.struct("ts_ns", "event_id", "event_type")).alias("entry"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted"),
    )
    return (
        per_session.groupBy(F.col("entry.event_type").alias("entry_event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("converted").alias("n_converted"),
        )
        .select(
            "entry_event_type",
            "n_sessions",
            "n_converted",
            (
                F.col("n_converted").cast("double") / F.col("n_sessions").cast("double")
            ).alias("conversion_rate"),
        )
        .orderBy("entry_event_type")
    )


SESSION_CONVERSION_ORACLE = """
WITH seq AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
              IS NULL
              OR epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
              > 30 * 60 * 1000000
         THEN 1 ELSE 0 END AS new_sess
  FROM events
),
sess AS (
  SELECT user_id, event_id, event_type, us,
         SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_no
  FROM seq
),
ranked AS (
  SELECT user_id, session_no, event_type,
         row_number() OVER (
           PARTITION BY user_id, session_no ORDER BY us, event_id
         ) AS rn,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id, session_no
         ) AS converted
  FROM sess
)
SELECT event_type AS entry_event_type,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       CAST(SUM(converted) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS conversion_rate
FROM ranked WHERE rn = 1
GROUP BY 1 ORDER BY 1
"""


def wau_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly active users with week-over-week growth — the growth
    chart beside ``stickiness_dau_mau`` (stickiness is depth, this is
    trajectory).  The previous week's WAU arrives by an EQUI-JOIN on
    week−7 days over the week-grain aggregate (no window at all, so
    nothing is single-partition whatever the calendar span); weeks
    with no prior observed week report NULL growth.

    Counts are exact; growth is one double division."""
    ev = _events(spark, sf_dir)
    wk = F.date_trunc("week", F.col("ts")).cast("date")
    wau = ev.groupBy(wk.alias("week")).agg(
        F.countDistinct("user_id").alias("wau"),
        F.count(F.lit(1)).alias("n_events"),
    )
    prev = wau.select(
        F.date_add(F.col("week"), 7).alias("week"), F.col("wau").alias("prev_wau")
    )
    return (
        wau.join(prev, "week", "left")
        .select(
            "week",
            "wau",
            "n_events",
            (
                (F.col("wau") - F.col("prev_wau")).cast("double")
                / F.col("prev_wau").cast("double")
            ).alias("wow_growth"),
        )
        .orderBy("week")
    )


WAU_WOW_ORACLE = """
WITH wau AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
)
SELECT w.week, w.wau, w.n_events,
       CAST(w.wau - p.wau AS DOUBLE) / CAST(p.wau AS DOUBLE) AS wow_growth
FROM wau w LEFT JOIN wau p ON w.week = p.week + INTERVAL 7 DAY
ORDER BY w.week
"""



def type_diversity_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-breadth trend: per month, the mean number of
    DISTINCT event types an active user touched and the share of
    users touching 3+ — is the product's surface area per user
    widening or narrowing over time?  (``user_activity_entropy``
    scores breadth per user once; this tracks the population monthly.)

    Two partial-aggregatable groupBys — (month, user) distinct-type
    counts, then the month rollup; the 3+ gate is an exact integer
    predicate and both ratios are single double divisions."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy(
        F.date_trunc("month", F.col("ts")).cast("date").alias("month"), "user_id"
    ).agg(F.countDistinct("event_type").alias("n_types"))
    return (
        per_user.groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.sum("n_types").alias("_t"),
            F.sum((F.col("n_types") >= 3).cast("long")).alias("_w"),
        )
        .select(
            "month",
            "active_users",
            (F.col("_t").cast("double") / F.col("active_users").cast("double")).alias(
                "mean_types_per_user"
            ),
            (F.col("_w").cast("double") / F.col("active_users").cast("double")).alias(
                "share_3plus_types"
            ),
        )
        .orderBy("month")
    )


TYPE_DIVERSITY_ORACLE = """
WITH per_user AS (
  SELECT CAST(date_trunc('month', ts) AS DATE) AS month, user_id,
         COUNT(DISTINCT event_type) AS n_types
  FROM events GROUP BY 1, 2
)
SELECT month,
       CAST(COUNT(*) AS BIGINT) AS active_users,
       CAST(SUM(n_types) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS mean_types_per_user,
       CAST(SUM(CASE WHEN n_types >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS share_3plus_types
FROM per_user GROUP BY 1 ORDER BY 1
"""



def hour_of_week_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic heatmap by (day-of-week × hour): the 168-cell activity
    profile behind capacity planning and send-time optimization, with
    each cell's share of total traffic.  Day-of-week is computed by
    pure integer date arithmetic anchored on a known Monday
    (1970-01-05) — Spark's and DuckDB's native dow functions disagree
    on week start, so neither is used.

    One partial-aggregatable groupBy to a 168-row table; the grand
    total is a second aggregate OF THOSE 168 ROWS broadcast back as
    one row (the ``mix_weights`` idiom — no global window, so nothing
    is single-partition even in the plan)."""
    ev = _events(spark, sf_dir)
    day = F.col("ts").cast("date")
    dow = (F.datediff(day, F.lit("1970-01-05").cast("date")) % 7 + 7) % 7 + 1
    cell = ev.groupBy(
        dow.cast("int").alias("dow"), F.hour("ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    total = cell.agg(F.sum("n_events").alias("_tot"))
    return (
        cell.crossJoin(F.broadcast(total))
        .select(
            "dow",
            "hour",
            "n_events",
            "n_users",
            F.round(
                F.col("n_events").cast("double") / F.col("_tot").cast("double"), 9
            ).alias("share"),
        )
        .orderBy("dow", "hour")
    )


HOUR_OF_WEEK_ORACLE = """
WITH cell AS (
  SELECT CAST(((date_diff('day', DATE '1970-01-05', CAST(ts AS DATE)) % 7 + 7) % 7 + 1)
              AS INT) AS dow,
         CAST(hour(ts) AS INT) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
  FROM events GROUP BY 1, 2
)
SELECT dow, hour, n_events, n_users,
       round(CAST(n_events AS DOUBLE) / CAST(SUM(n_events) OVER () AS DOUBLE), 9)
         AS share
FROM cell ORDER BY dow, hour
"""


def session_duration_by_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session length by ENTRY action: for sessions grouped by their
    first event type, the median and p90 session duration (seconds)
    and the mean events per session — "do error-entered sessions run
    short?".  Completes the entry-grain pair with
    :func:`session_conversion_by_entry` (outcome there, engagement
    depth here).

    The same single user-partitioned window pass builds session ids;
    durations are exact microsecond integers; the quantiles are
    Spark ``percentile`` ≡ DuckDB ``quantile_cont`` (bit-identical
    interpolation of exact integers, divided by 1e6 at the edge)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gap = F.col("ts_ns") - F.lag("ts_ns").over(w)
    new_sess = (gap.isNull() | (gap > 30 * 60 * 1_000_000_000)).cast("long")
    us = F.expr("ts_ns div 1000")
    sess = ev.select(
        "user_id",
        "ts_ns",
        "event_id",
        "event_type",
        us.alias("us"),
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_no"),
    )
    per_session = sess.groupBy("user_id", "session_no").agg(
        F.min(F.struct("ts_ns", "event_id", "event_type")).alias("entry"),
        (F.max("us") - F.min("us")).alias("dur_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        per_session.groupBy(F.col("entry.event_type").alias("entry_event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(F.expr("percentile(dur_us, 0.5)") / 1e6, 6).alias("median_sec"),
            F.round(F.expr("percentile(dur_us, 0.9)") / 1e6, 6).alias("p90_sec"),
            (
                F.sum("n_events").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("mean_events"),
        )
        .orderBy("entry_event_type")
    )


SESSION_DURATION_ORACLE = """
WITH seq AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
              IS NULL
              OR epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
              > 30 * 60 * 1000000
         THEN 1 ELSE 0 END AS new_sess
  FROM events
),
sess AS (
  SELECT user_id, event_id, event_type, us,
         SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_no
  FROM seq
),
ranked AS (
  SELECT user_id, session_no, event_type, us,
         row_number() OVER (
           PARTITION BY user_id, session_no ORDER BY us, event_id
         ) AS rn
  FROM sess
),
per_session AS (
  SELECT user_id, session_no,
         MAX(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
         MAX(us) - MIN(us) AS dur_us,
         COUNT(*) AS n_events
  FROM ranked GROUP BY 1, 2
)
SELECT entry_type AS entry_event_type,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       round(quantile_cont(dur_us, 0.5) / 1e6, 6) AS median_sec,
       round(quantile_cont(dur_us, 0.9) / 1e6, 6) AS p90_sec,
       CAST(SUM(n_events) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_events
FROM per_session GROUP BY 1 ORDER BY 1
"""



def value_mix_by_type_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue/value composition trend: per month, each event type's
    share of the month's total value — the mix-shift chart that shows
    WHICH behavior the value growth in ``wau_wow_growth`` actually
    comes from.  Value sums on DECIMAL; shares are one rounded double
    division per cell against the month total computed by a window
    over the (month × type) aggregate — an enum-bounded input."""
    ev = _events(spark, sf_dir)
    cell = ev.groupBy(
        F.date_trunc("month", F.col("ts")).cast("date").alias("month"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("_v"),
    )
    w = Window.partitionBy("month")
    return (
        cell.select(
            "month",
            "event_type",
            "n_events",
            F.round(F.col("_v").cast("double"), 6).alias("total_value"),
            F.round(
                F.col("_v").cast("double")
                / F.sum("_v").over(w).cast("double"),
                9,
            ).alias("value_share"),
        )
        .orderBy("month", "event_type")
    )


VALUE_MIX_ORACLE = """
WITH cell AS (
  SELECT CAST(date_trunc('month', ts) AS DATE) AS month, event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         SUM(CAST(value AS DECIMAL(18,6))) AS v
  FROM events GROUP BY 1, 2
)
SELECT month, event_type, n_events,
       round(CAST(v AS DOUBLE), 6) AS total_value,
       round(CAST(v AS DOUBLE) /
             CAST(SUM(v) OVER (PARTITION BY month) AS DOUBLE), 9) AS value_share
FROM cell ORDER BY month, event_type
"""



QUERIES = {
    "value_mix_by_type_monthly": value_mix_by_type_monthly,
    "hour_of_week_profile": hour_of_week_profile,
    "session_duration_by_entry": session_duration_by_entry,
    "type_diversity_trend": type_diversity_trend,
    "session_conversion_by_entry": session_conversion_by_entry,
    "wau_wow_growth": wau_wow_growth,
    "churn_hazard_by_tenure": churn_hazard_by_tenure,
    "first_event_type_by_cohort": first_event_type_by_cohort,
}

ORACLES = {
    "value_mix_by_type_monthly": VALUE_MIX_ORACLE,
    "hour_of_week_profile": HOUR_OF_WEEK_ORACLE,
    "session_duration_by_entry": SESSION_DURATION_ORACLE,
    "type_diversity_trend": TYPE_DIVERSITY_ORACLE,
    "session_conversion_by_entry": SESSION_CONVERSION_ORACLE,
    "wau_wow_growth": WAU_WOW_ORACLE,
    "churn_hazard_by_tenure": CHURN_HAZARD_ORACLE,
    "first_event_type_by_cohort": FIRST_EVENT_COHORT_ORACLE,
}
