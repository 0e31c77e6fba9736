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


QUERIES = {
    "churn_hazard_by_tenure": churn_hazard_by_tenure,
    "first_event_type_by_cohort": first_event_type_by_cohort,
}

ORACLES = {
    "churn_hazard_by_tenure": CHURN_HAZARD_ORACLE,
    "first_event_type_by_cohort": FIRST_EVENT_COHORT_ORACLE,
}
