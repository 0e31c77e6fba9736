"""Round-14 event-analytics additions: type-affinity lift, a global
retention power-law fit, winsorized value means, first/last-type
agreement, weekly-consistency bands, and daily-count dispersion —
behavioral-analytics report shapes the reference serves through its
SQL surface over event collections (reference README.md:27-31,
SURVEY.md §2.7).

Determinism conventions match events.py: epoch math on integer
``ts_ns`` (``div``, never double division); counts are exact longs;
single ratios are one double division rounded to 9dp; ln/sqrt chains
round to 6dp (the zipf convention); value sums go through
DECIMAL(18,6); ties break on ``event_id``.

Scale notes: every query reduces the event stream with ONE aggregate
or one user-keyed window before any small-grain arithmetic; nothing
windows over unbounded input without a partition key; pair fan-outs
are bounded by the event-type enum (≤ |types|² cells).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .events import DEC, _events


def type_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type affinity: for every type pair (A < B), the lift
    ``P(A∧B) / (P(A)·P(B))`` over users — "users who click also
    purchase?", the co-occurrence screen behind cross-feature
    adoption analysis (the user-grain sibling of
    ``event_cooccurrence_pmi``'s event-grain statistic).

    Plan: one distinct to (user, type) grain (≤ |types| rows per
    user), a self-join on user_id with per-user fan-out ≤ C(|types|,
    2), then an enum-sized pair aggregate; the marginals are a
    |types|-row aggregate joined back broadcast-sized.  Lift is one
    double division of exact long products (no overflow: counts²
    ≪ 2⁶³)."""
    ev = _events(spark, sf_dir)
    ut = ev.select("user_id", "event_type").distinct()
    n_users = ut.select("user_id").distinct().agg(
        F.count(F.lit(1)).alias("_nu")
    )
    marg = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("_n"))
    a = ut.alias("a")
    b = ut.alias("b")
    both = (
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
    ma = marg.select(
        F.col("event_type").alias("type_a"), F.col("_n").alias("_na")
    )
    mb = marg.select(
        F.col("event_type").alias("type_b"), F.col("_n").alias("_nb")
    )
    return (
        both.join(F.broadcast(ma), "type_a")
        .join(F.broadcast(mb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(
                (F.col("n_both") * F.col("_nu")).cast("double")
                / (F.col("_na") * F.col("_nb")).cast("double"),
                9,
            ).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


TYPE_AFFINITY_ORACLE = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
marg AS (SELECT event_type, COUNT(*) AS _n FROM ut GROUP BY 1),
nu AS (SELECT COUNT(DISTINCT user_id) AS _nu FROM ut),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         COUNT(*) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, CAST(p.n_both AS BIGINT) AS n_both,
       round(CAST(p.n_both * nu._nu AS DOUBLE)
             / CAST(ma._n * mb._n AS DOUBLE), 9) AS lift
FROM pairs p
JOIN marg ma ON p.type_a = ma.event_type
JOIN marg mb ON p.type_b = mb.event_type
CROSS JOIN nu
ORDER BY p.type_a, p.type_b
"""


def retention_powerlaw_fit(
    spark: SparkSession, sf_dir: str, max_day: int = 30
) -> DataFrame:
    """Global retention power-law: day-k retention (share of all
    users active again exactly k days after their first day, k =
    1..``max_day``) fitted as ``ln r(k) = intercept + slope·ln k`` —
    retention curves are famously power-law-shaped, and the slope is
    the one-number durability summary product teams track.

    Plan: user-grain min for first days, one distinct to (user, day)
    grain, a day-offset aggregate bounded by ``max_day`` rows, then a
    closed-form OLS over ≤ 30 points.  ln-chain → round 6."""
    ev = _events(spark, sf_dir)
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    firsts = days.groupBy("user_id").agg(F.min("day").alias("d0"))
    cohort = firsts.agg(F.count(F.lit(1)).alias("_cohort"))
    rk = (
        days.join(firsts, "user_id")
        .select(F.datediff("day", "d0").alias("k"), "user_id")
        .where((F.col("k") >= 1) & (F.col("k") <= max_day))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_k"))
    )
    pts = rk.crossJoin(F.broadcast(cohort)).select(
        F.log(F.col("k").cast("double")).alias("x"),
        F.log(
            F.col("n_k").cast("double") / F.col("_cohort").cast("double")
        ).alias("y"),
    )
    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("x"), F.sum("y")
    sxx, sxy = F.sum(F.col("x") * F.col("x")), F.sum(F.col("x") * F.col("y"))
    return pts.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(
            ((n * sxy - sx * sy) / (n * sxx - sx * sx)), 6
        ).alias("slope"),
        F.round(
            ((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n), 6
        ).alias("intercept"),
    )


RETENTION_POWERLAW_ORACLE = """
WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
firsts AS (SELECT user_id, MIN(day) AS d0 FROM days GROUP BY 1),
cohort AS (SELECT COUNT(*) AS _cohort FROM firsts),
rk AS (
  SELECT date_diff('day', f.d0, d.day) AS k, COUNT(*) AS n_k
  FROM days d JOIN firsts f USING (user_id)
  WHERE date_diff('day', f.d0, d.day) BETWEEN 1 AND 30
  GROUP BY 1
),
pts AS (
  SELECT ln(CAST(k AS DOUBLE)) AS x,
         ln(CAST(n_k AS DOUBLE) / CAST(c._cohort AS DOUBLE)) AS y
  FROM rk CROSS JOIN cohort c
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
       round((COUNT(*) * SUM(x*y) - SUM(x) * SUM(y))
             / (COUNT(*) * SUM(x*x) - SUM(x) * SUM(x)), 6) AS slope,
       round((SUM(y) - ((COUNT(*) * SUM(x*y) - SUM(x) * SUM(y))
                        / (COUNT(*) * SUM(x*x) - SUM(x) * SUM(x))) * SUM(x))
             / COUNT(*), 6) AS intercept
FROM pts
"""


def value_winsorized_means_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Winsorized value means: per event type, the raw mean, the p99
    cap, the mean after clamping values at p99, and the trim impact —
    "how much of the average is a handful of whales?", the outlier
    robustness check run before any mean-based KPI ships.

    Plan: two passes — an exact per-type percentile (full-sort-per-
    group; at 100 TB swap ``approx_percentile``, same call shape)
    broadcast back, then ONE clamped aggregate.  Means through
    DECIMAL; the impact ratio is a single double division."""
    ev = _events(spark, sf_dir)
    caps = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.99)").alias("_p99"),
        F.count(F.lit(1)).alias("n_events"),
    )
    clamped = ev.join(F.broadcast(caps), "event_type").select(
        "event_type",
        "n_events",
        F.col("value").cast(DEC).alias("_v"),
        F.least(F.col("value"), F.col("_p99")).cast(DEC).alias("_w"),
        F.col("_p99"),
    )
    return (
        clamped.groupBy("event_type", "n_events", "_p99")
        .agg(
            (
                F.sum("_v").cast("double") / F.col("n_events").cast("double")
            ).alias("raw_mean"),
            (
                F.sum("_w").cast("double") / F.col("n_events").cast("double")
            ).alias("winsorized_mean"),
        )
        .select(
            "event_type",
            "n_events",
            F.col("_p99").alias("p99_cap"),
            "raw_mean",
            "winsorized_mean",
            F.round(
                (F.col("raw_mean") - F.col("winsorized_mean"))
                / F.col("raw_mean"),
                9,
            ).alias("trim_impact"),
        )
        .orderBy("event_type")
    )


VALUE_WINSORIZED_ORACLE = """
WITH caps AS (
  SELECT event_type, quantile_cont(value, 0.99) AS _p99,
         COUNT(*) AS n_events
  FROM events GROUP BY 1
),
agg AS (
  SELECT e.event_type, c.n_events, c._p99,
         CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE)
           / CAST(c.n_events AS DOUBLE) AS raw_mean,
         CAST(SUM(CAST(least(e.value, c._p99) AS DECIMAL(18,6))) AS DOUBLE)
           / CAST(c.n_events AS DOUBLE) AS winsorized_mean
  FROM events e JOIN caps c USING (event_type)
  GROUP BY 1, 2, 3
)
SELECT event_type, CAST(n_events AS BIGINT) AS n_events, _p99 AS p99_cap,
       raw_mean, winsorized_mean,
       round((raw_mean - winsorized_mean) / raw_mean, 9) AS trim_impact
FROM agg ORDER BY event_type
"""


def first_last_type_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-vs-latest action matrix: for every user, the type of
    their first and of their most recent event (ties broken by
    ``event_id``), counted into a (first_type, last_type) matrix
    with row shares — "do users end up where they started?", the
    lifecycle bookends view (``user_journey_endpoints`` reports the
    per-user rows; this is the population matrix).

    Plan: ONE user-grain min/max-of-struct aggregate (no window, no
    second fact pass), then an enum² cell aggregate."""
    ev = _events(spark, sf_dir)
    ends = ev.groupBy("user_id").agg(
        F.min(F.struct("ts_ns", "event_id", "event_type")).alias("_f"),
        F.max(F.struct("ts_ns", "event_id", "event_type")).alias("_l"),
    )
    cell = ends.groupBy(
        F.col("_f.event_type").alias("first_type"),
        F.col("_l.event_type").alias("last_type"),
    ).agg(F.count(F.lit(1)).alias("n_users"))
    rowtot = cell.groupBy("first_type").agg(F.sum("n_users").alias("_rn"))
    return (
        cell.join(F.broadcast(rowtot), "first_type")
        .select(
            "first_type",
            "last_type",
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("_rn").cast("double"),
                9,
            ).alias("share_of_first"),
        )
        .orderBy("first_type", "last_type")
    )


FIRST_LAST_AGREEMENT_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rf,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rl
  FROM events
),
ends AS (
  SELECT f.user_id, f.event_type AS first_type, l.event_type AS last_type
  FROM ranked f JOIN ranked l
    ON f.user_id = l.user_id AND f.rf = 1 AND l.rl = 1
),
cell AS (
  SELECT first_type, last_type, COUNT(*) AS n_users
  FROM ends GROUP BY 1, 2
),
rowtot AS (SELECT first_type, SUM(n_users) AS _rn FROM cell GROUP BY 1)
SELECT c.first_type, c.last_type, CAST(c.n_users AS BIGINT) AS n_users,
       round(CAST(c.n_users AS DOUBLE) / CAST(r._rn AS DOUBLE), 9)
         AS share_of_first
FROM cell c JOIN rowtot r USING (first_type)
ORDER BY c.first_type, c.last_type
"""


def user_weekly_cv_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-consistency bands: per user, the coefficient of
    variation of their ACTIVE weeks' event counts, bucketed into
    0.25-wide bands (clamped at 8) — a user with CV ≈ 0 shows up
    with the same intensity every active week; a high-CV user binges
    — the engagement-regularity histogram
    (``purchase_regularity_bands``'s sibling on the event stream).

    Plan: week ids by integer epoch-day division; one (user, week)
    aggregate, one user-grain EXACT integer moment rollup (Σx, Σx²
    as longs — counts² ≪ 2⁶³), one enum-sized band aggregate.
    Users with one active week carry CV 0 by convention."""
    ev = _events(spark, sf_dir)
    week = F.expr("((ts_ns div 1000) div 86400000000) div 7")
    uw = ev.groupBy("user_id", week.alias("wk")).agg(
        F.count(F.lit(1)).alias("c")
    )
    mom = uw.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_w"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    # population variance * n_w^2 = n_w*s2 - s1^2 (exact integers)
    cv = F.when(F.col("n_w") == 1, F.lit(0.0)).otherwise(
        F.sqrt(
            (F.col("n_w") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
                "double"
            )
        )
        / F.col("s1").cast("double")
    )
    band = F.least(F.floor(cv / 0.25), F.lit(8)).cast("int")
    return (
        mom.select(
            band.alias("cv_band"),
            F.col("n_w").alias("_nw"),
        )
        .groupBy("cv_band")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(
                F.sum("_nw").cast("double") / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("avg_active_weeks"),
        )
        .orderBy("cv_band")
    )


USER_WEEKLY_CV_ORACLE = """
WITH uw AS (
  SELECT user_id, (epoch_us(ts) // 86400000000) // 7 AS wk,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
mom AS (
  SELECT user_id, COUNT(*) AS n_w, SUM(c) AS s1, SUM(c*c) AS s2
  FROM uw GROUP BY 1
),
cv AS (
  SELECT CASE WHEN n_w = 1 THEN 0.0
              ELSE sqrt(CAST(n_w * s2 - s1 * s1 AS DOUBLE))
                   / CAST(s1 AS DOUBLE) END AS cv,
         n_w
  FROM mom
)
SELECT CAST(least(floor(cv / 0.25), 8) AS INT) AS cv_band,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       round(CAST(SUM(n_w) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
         AS avg_active_weeks
FROM cv GROUP BY 1 ORDER BY 1
"""


def daily_count_dispersion_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Index of dispersion (variance-to-mean ratio) of DAILY event
    counts per type, over each type's active days — a Poisson
    arrival stream sits at 1.0; clustered incident traffic (error
    storms) blows past it — the corpus-level companion to the
    user-grain ``event_burstiness``.

    Plan: one (type, day) aggregate, one type-grain EXACT integer
    moment rollup, |types| output rows.  Single double chain from
    exact longs → round 9."""
    ev = _events(spark, sf_dir)
    td = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    mom = td.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    # var_pop/mean = (n*s2 - s1^2) / (n * s1)  — exact long numerator
    return mom.select(
        "event_type",
        "n_days",
        F.col("s1").alias("n_events"),
        F.round(
            (F.col("n_days") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
                "double"
            )
            / (F.col("n_days") * F.col("s1")).cast("double"),
            9,
        ).alias("dispersion_index"),
    ).orderBy("event_type")


DAILY_DISPERSION_ORACLE = """
WITH td AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
mom AS (
  SELECT event_type, COUNT(*) AS n_days, SUM(c) AS s1, SUM(c*c) AS s2
  FROM td GROUP BY 1
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       CAST(s1 AS BIGINT) AS n_events,
       round(CAST(n_days * s2 - s1 * s1 AS DOUBLE)
             / CAST(n_days * s1 AS DOUBLE), 9) AS dispersion_index
FROM mom ORDER BY event_type
"""


QUERIES = {
    "type_affinity_lift": type_affinity_lift,
    "retention_powerlaw_fit": retention_powerlaw_fit,
    "value_winsorized_means_by_type": value_winsorized_means_by_type,
    "first_last_type_agreement": first_last_type_agreement,
    "user_weekly_cv_bands": user_weekly_cv_bands,
    "daily_count_dispersion_by_type": daily_count_dispersion_by_type,
}

ORACLES = {
    "type_affinity_lift": TYPE_AFFINITY_ORACLE,
    "retention_powerlaw_fit": RETENTION_POWERLAW_ORACLE,
    "value_winsorized_means_by_type": VALUE_WINSORIZED_ORACLE,
    "first_last_type_agreement": FIRST_LAST_AGREEMENT_ORACLE,
    "user_weekly_cv_bands": USER_WEEKLY_CV_ORACLE,
    "daily_count_dispersion_by_type": DAILY_DISPERSION_ORACLE,
}


def session_entry_hour_conversion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Session conversion by ENTRY HOUR: sessions (the standard
    30-minute-gap convention) bucketed by the local hour of their
    first event, with the share containing a ``purchase`` — the
    time-of-day landing report completing the entry-grain pair
    (``session_conversion_by_entry`` slices by entry ACTION, this by
    entry TIME).

    Plan: ONE user-partitioned window pass builds session ids; the
    entry instant is a min-of-struct per session (no second window);
    a 24-cell aggregate finishes.  Counts exact; the rate is one
    double division (round 9)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gap = F.col("ts_ns") - F.lag("ts_ns").over(w)
    new_sess = (gap.isNull() | (gap > 30 * 60 * 1_000_000_000)).cast("long")
    sess = ev.select(
        "user_id",
        "ts_ns",
        "event_id",
        "ts",
        "event_type",
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_no"),
    )
    per_session = sess.groupBy("user_id", "session_no").agg(
        F.min(F.struct("ts_ns", "event_id", "ts")).alias("entry"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias(
            "converted"
        ),
    )
    cell = per_session.groupBy(
        F.hour("entry.ts").cast("int").alias("entry_hour")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("converted").alias("n_converted"),
    )
    return cell.select(
        "entry_hour",
        "n_sessions",
        "n_converted",
        F.round(
            F.col("n_converted").cast("double")
            / F.col("n_sessions").cast("double"),
            9,
        ).alias("conversion_rate"),
    ).orderBy("entry_hour")


SESSION_ENTRY_HOUR_ORACLE = """
WITH seq AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, ts, event_type,
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
  SELECT user_id, us, event_id, ts, event_type,
         SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_no
  FROM seq
),
ranked AS (
  SELECT user_id, session_no, ts,
         row_number() OVER (
           PARTITION BY user_id, session_no ORDER BY us, event_id
         ) AS rn
  FROM sess
),
conv AS (
  SELECT user_id, session_no,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM sess GROUP BY 1, 2
),
per_session AS (
  SELECT r.user_id, r.session_no, r.ts AS entry_ts, c.converted
  FROM ranked r JOIN conv c USING (user_id, session_no)
  WHERE r.rn = 1
),
cell AS (
  SELECT CAST(hour(entry_ts) AS INT) AS entry_hour,
         COUNT(*) AS n_sessions, SUM(converted) AS n_converted
  FROM per_session GROUP BY 1
)
SELECT entry_hour, CAST(n_sessions AS BIGINT) AS n_sessions,
       CAST(n_converted AS BIGINT) AS n_converted,
       round(CAST(n_converted AS DOUBLE) / CAST(n_sessions AS DOUBLE), 9)
         AS conversion_rate
FROM cell ORDER BY entry_hour
"""


def event_value_pareto_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Value concentration per event type: the share of total value
    carried by events ABOVE the type's p90 value — "is 10% of the
    events 50% of the value?", the whale-dependence number next to
    ``value_winsorized_means_by_type``'s robustness view.

    Plan: per-type exact percentile broadcast back (approx_percentile
    at 100 TB, same shape), ONE conditional DECIMAL aggregate; shares
    are single double divisions (round 9)."""
    ev = _events(spark, sf_dir)
    caps = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.9)").alias("_p90")
    )
    j = ev.join(F.broadcast(caps), "event_type")
    top = F.col("value") > F.col("_p90")
    agg = j.groupBy("event_type", "_p90").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(top.cast("long")).alias("n_top"),
        F.sum(F.col("value").cast(DEC)).alias("_total"),
        F.sum(F.when(top, F.col("value")).otherwise(0.0).cast(DEC)).alias(
            "_topval"
        ),
    )
    return agg.select(
        "event_type",
        "n_events",
        "n_top",
        F.col("_p90").alias("p90_value"),
        F.round(
            F.col("_topval").cast("double") / F.col("_total").cast("double"),
            9,
        ).alias("top_value_share"),
    ).orderBy("event_type")


EVENT_VALUE_PARETO_ORACLE = """
WITH caps AS (
  SELECT event_type, quantile_cont(value, 0.9) AS _p90
  FROM events GROUP BY 1
),
agg AS (
  SELECT e.event_type, c._p90,
         COUNT(*) AS n_events,
         SUM(CASE WHEN e.value > c._p90 THEN 1 ELSE 0 END) AS n_top,
         SUM(CAST(e.value AS DECIMAL(18,6))) AS _total,
         SUM(CAST(CASE WHEN e.value > c._p90 THEN e.value ELSE 0.0 END
                  AS DECIMAL(18,6))) AS _topval
  FROM events e JOIN caps c USING (event_type)
  GROUP BY 1, 2
)
SELECT event_type, CAST(n_events AS BIGINT) AS n_events,
       CAST(n_top AS BIGINT) AS n_top, _p90 AS p90_value,
       round(CAST(_topval AS DOUBLE) / CAST(_total AS DOUBLE), 9)
         AS top_value_share
FROM agg ORDER BY event_type
"""


QUERIES.update(
    {
        "session_entry_hour_conversion": session_entry_hour_conversion,
        "event_value_pareto_by_type": event_value_pareto_by_type,
    }
)

ORACLES.update(
    {
        "session_entry_hour_conversion": SESSION_ENTRY_HOUR_ORACLE,
        "event_value_pareto_by_type": EVENT_VALUE_PARETO_ORACLE,
    }
)
