"""Round-13 event-analytics additions: cross-session behavioral
structure — the hand-off between consecutive sessions, session value
by duration band, and per-user type loyalty — the event-explorer
reports the reference's funnel/retention modules frame at the
SESSION grain rather than the event grain
(rakam-spi/.../UserPluginConfig.java:18-19; reference README.md:17).

Determinism: sessionization is the repo-wide 30-min-gap convention
over ``(ts_ns, event_id)`` ordering (``sessionization_stats``);
session endpoints are picked by ``row_number`` with the same
two-key ordering in BOTH engines; duration bands cut on exact
nanosecond thresholds; value sums go through DECIMAL(18,6); every
rate/share is one double division of exact integers, rounded to 9dp.

Scale: each operator pays ONE user-keyed exchange for the
sessionizing window, then works on session-grain rows (~events/5);
hand-off pairing is a lag over per-user session rows (tiny); all
shares use cell-aggregate + broadcast-back totals, never a global
window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table

_DEC = "decimal(18,6)"
_GAP_NS = 30 * 60 * 1_000_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _sessions(ev: DataFrame) -> DataFrame:
    """Session-grain frame under the repo-wide 30-min-gap
    convention: (user_id, session_no, start_ns, end_ns, n_events,
    total_value, first_type, last_type, n_purchases).  One
    user-partitioned window, one session-keyed aggregate."""
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gap = F.col("ts_ns") - F.lag("ts_ns").over(w)
    new_sess = (gap.isNull() | (gap > _GAP_NS)).cast("long")
    seq = ev.select(
        "user_id",
        "ts_ns",
        "event_id",
        "event_type",
        "value",
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_no"),
    )
    ws = Window.partitionBy("user_id", "session_no").orderBy(
        "ts_ns", "event_id"
    )
    wse = Window.partitionBy("user_id", "session_no").orderBy(
        F.desc("ts_ns"), F.desc("event_id")
    )
    return (
        seq.withColumn("rn_a", F.row_number().over(ws))
        .withColumn("rn_d", F.row_number().over(wse))
        .groupBy("user_id", "session_no")
        .agg(
            F.min("ts_ns").alias("start_ns"),
            F.max("ts_ns").alias("end_ns"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).alias("total_value"),
            F.max(F.when(F.col("rn_a") == 1, F.col("event_type"))).alias(
                "first_type"
            ),
            F.max(F.when(F.col("rn_d") == 1, F.col("event_type"))).alias(
                "last_type"
            ),
            F.sum(
                (F.col("event_type") == "purchase").cast("long")
            ).alias("n_purchases"),
        )
    )


#: shared DuckDB CTE text for the session frame — identical
#: convention to the Spark side: 30-min gap over (epoch_us, event_id),
#: endpoints by two-key row_number.
_SESSIONS_SQL = """
seq AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, event_type, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
              IS NULL
              OR epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
              > 30 * 60 * 1000000
         THEN 1 ELSE 0 END AS new_sess
  FROM events
),
seq2 AS (
  SELECT *, SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_no
  FROM seq
),
seq3 AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id, session_no
                            ORDER BY us ASC, event_id ASC) AS rn_a,
         row_number() OVER (PARTITION BY user_id, session_no
                            ORDER BY us DESC, event_id DESC) AS rn_d
  FROM seq2
),
sess AS (
  SELECT user_id, session_no,
         MIN(us) AS start_us, MAX(us) AS end_us,
         COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(18,6))) AS total_value,
         MAX(CASE WHEN rn_a = 1 THEN event_type END) AS first_type,
         MAX(CASE WHEN rn_d = 1 THEN event_type END) AS last_type,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS n_purchases
  FROM seq3 GROUP BY 1, 2
)
"""


def session_handoff_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-session hand-off matrix: how the LAST event type of one
    session transitions to the FIRST event type of the user's NEXT
    session — "where do users pick back up?".  The between-sessions
    companion of ``event_transition_matrix`` (which is
    within-session, adjacent-event); an error→error hot cell here
    means users return to retry failures, purchase→view means
    post-purchase browsing, etc.

    Plan: the shared session frame, then one lag over per-user
    session rows (session-grain — tiny) and an enum²-sized
    aggregate; shares broadcast the from-type totals back."""
    sess = _sessions(_events(spark, sf_dir))
    w = Window.partitionBy("user_id").orderBy("session_no")
    pair = (
        sess.select(
            "user_id",
            "session_no",
            "first_type",
            F.lag("last_type").over(w).alias("from_type"),
        )
        .where(F.col("from_type").isNotNull())
        .select("from_type", F.col("first_type").alias("to_type"))
    )
    cell = pair.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_handoffs")
    )
    tot = cell.groupBy("from_type").agg(F.sum("n_handoffs").alias("_ft"))
    return (
        cell.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            "n_handoffs",
            F.round(
                F.col("n_handoffs").cast("double") / F.col("_ft").cast("double"),
                9,
            ).alias("share_of_from"),
        )
        .orderBy("from_type", "to_type")
    )


SESSION_HANDOFF_ORACLE = f"""
WITH {_SESSIONS_SQL},
pair AS (
  SELECT lag(last_type) OVER (PARTITION BY user_id ORDER BY session_no)
           AS from_type,
         first_type AS to_type
  FROM sess
),
cell AS (
  SELECT from_type, to_type, COUNT(*) AS n_handoffs
  FROM pair WHERE from_type IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT from_type, SUM(n_handoffs) AS _ft FROM cell GROUP BY 1)
SELECT c.from_type, c.to_type, CAST(c.n_handoffs AS BIGINT) AS n_handoffs,
       round(CAST(c.n_handoffs AS DOUBLE) / CAST(t._ft AS DOUBLE), 9)
         AS share_of_from
FROM cell c JOIN tot t USING (from_type)
ORDER BY c.from_type, c.to_type
"""


def session_value_by_duration_band(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Session economics by duration band: single-event sessions and
    <5m / 5-15m / 15-30m / 30m+ bands × session count, mean events,
    total value and purchase-conversion rate — "do longer sessions
    actually convert?", the engagement-vs-value cut session reports
    lead with.

    Plan: the shared session frame, banding on exact nanosecond
    thresholds (no float boundaries), one enum-sized aggregate.
    Rates are double divisions of exact counts; value through
    DECIMAL."""
    sess = _sessions(_events(spark, sf_dir))
    dur = F.col("end_ns") - F.col("start_ns")
    band = (
        F.when(F.col("n_events") == 1, "0-single")
        .when(dur < 5 * 60 * 1_000_000_000, "1-under5m")
        .when(dur < 15 * 60 * 1_000_000_000, "2-5to15m")
        .when(dur < 30 * 60 * 1_000_000_000, "3-15to30m")
        .otherwise("4-over30m")
    )
    return (
        sess.groupBy(band.alias("duration_band"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(
                F.sum("n_events").cast("double")
                / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("avg_events"),
            F.sum("total_value").cast("double").alias("total_value"),
            F.round(
                F.sum((F.col("n_purchases") > 0).cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("purchase_rate"),
        )
        .orderBy("duration_band")
    )


SESSION_DURATION_BAND_ORACLE = f"""
WITH {_SESSIONS_SQL}
SELECT CASE WHEN n_events = 1 THEN '0-single'
            WHEN end_us - start_us < 5 * 60 * 1000000 THEN '1-under5m'
            WHEN end_us - start_us < 15 * 60 * 1000000 THEN '2-5to15m'
            WHEN end_us - start_us < 30 * 60 * 1000000 THEN '3-15to30m'
            ELSE '4-over30m' END AS duration_band,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       round(CAST(SUM(n_events) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
         AS avg_events,
       CAST(SUM(total_value) AS DOUBLE) AS total_value,
       round(CAST(SUM(CASE WHEN n_purchases > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 9) AS purchase_rate
FROM sess GROUP BY 1 ORDER BY 1
"""


def user_dominant_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type loyalty: each user's DOMINANT event type (most events,
    type-asc tiebreak) and how concentrated they are on it, as a
    (dominant type × share decile) histogram — separates "pure
    clickers" from balanced users per type, the segmentation cut
    behind ``user_activity_entropy``'s single number.

    Plan: one (user, type) aggregate, a per-user row_number over the
    enum-sized type counts, then integer-exact decile binning
    (``n*10 div total`` — no float boundaries) and an enum-sized
    histogram."""
    ev = _events(spark, sf_dir)
    ut = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    tot = ut.groupBy("user_id").agg(F.sum("n").alias("n_total"))
    dom = (
        ut.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .join(tot, "user_id")
        # integer-exact decile of the dominant share: 10n div total
        # (10 == share of exactly 1.0 keeps its own bin)
        .select(
            F.col("event_type").alias("dominant_type"),
            F.expr("(n * 10) div n_total").alias("share_decile"),
        )
    )
    cell = dom.groupBy("dominant_type", "share_decile").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    all_tot = cell.agg(F.sum("n_users").alias("_t"))
    return (
        cell.crossJoin(F.broadcast(all_tot))
        .select(
            "dominant_type",
            "share_decile",
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("_t").cast("double"), 9
            ).alias("share_of_users"),
        )
        .orderBy("dominant_type", "share_decile")
    )


USER_DOMINANT_TYPE_ORACLE = """
WITH ut AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
tot AS (SELECT user_id, SUM(n) AS n_total FROM ut GROUP BY 1),
dom AS (
  SELECT u.user_id, u.event_type, u.n, t.n_total
  FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY n DESC, event_type ASC) AS rn
    FROM ut
  ) u JOIN tot t USING (user_id)
  WHERE u.rn = 1
),
cell AS (
  SELECT event_type AS dominant_type,
         (n * 10) // n_total AS share_decile,
         COUNT(*) AS n_users
  FROM dom GROUP BY 1, 2
)
SELECT dominant_type, CAST(share_decile AS BIGINT) AS share_decile,
       CAST(n_users AS BIGINT) AS n_users,
       round(CAST(n_users AS DOUBLE)
             / CAST((SELECT SUM(n_users) FROM cell) AS DOUBLE), 9)
         AS share_of_users
FROM cell ORDER BY dominant_type, share_decile
"""


def hourly_error_pchart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p-chart over the hourly error share: per hour-of-day, the
    error-event share with 3σ binomial control limits around the
    global error rate — the SPC (statistical process control) view
    an on-call dashboard draws; hours flagged out-of-control are
    where error generation is NOT homogeneous-random.

    Determinism: shares are double divisions of exact counts; the
    limit arithmetic (sqrt of p̄(1−p̄)/n) runs identical IEEE ops in
    both engines; the flag compares those identical doubles.

    Plan: one 24-row aggregate, the global rate broadcast back."""
    ev = _events(spark, sf_dir)
    cell = ev.groupBy(F.hour("ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("event_type") == "error").cast("long")).alias(
            "n_errors"
        ),
    )
    tot = cell.agg(
        (
            F.sum("n_errors").cast("double")
            / F.sum("n_events").cast("double")
        ).alias("_pbar")
    )
    sigma = F.sqrt(
        F.col("_pbar")
        * (F.lit(1.0) - F.col("_pbar"))
        / F.col("n_events").cast("double")
    )
    share = F.col("n_errors").cast("double") / F.col("n_events").cast("double")
    ucl = F.col("_pbar") + F.lit(3.0) * sigma
    lcl = F.greatest(F.col("_pbar") - F.lit(3.0) * sigma, F.lit(0.0))
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            "hour",
            "n_events",
            "n_errors",
            F.round(share, 9).alias("error_share"),
            F.round(ucl, 9).alias("ucl"),
            F.round(lcl, 9).alias("lcl"),
            ((share > ucl) | (share < lcl)).cast("int").alias(
                "out_of_control"
            ),
        )
        .orderBy("hour")
    )


HOURLY_ERROR_PCHART_ORACLE = """
WITH cell AS (
  SELECT CAST(hour(ts) AS INT) AS hour, COUNT(*) AS n_events,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors
  FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_errors) AS DOUBLE) / CAST(SUM(n_events) AS DOUBLE)
           AS _pbar
  FROM cell
)
SELECT hour, CAST(n_events AS BIGINT) AS n_events,
       CAST(n_errors AS BIGINT) AS n_errors,
       round(CAST(n_errors AS DOUBLE) / CAST(n_events AS DOUBLE), 9)
         AS error_share,
       round(_pbar + 3.0 * sqrt(_pbar * (1.0 - _pbar)
                                / CAST(n_events AS DOUBLE)), 9) AS ucl,
       round(greatest(_pbar - 3.0 * sqrt(_pbar * (1.0 - _pbar)
                                         / CAST(n_events AS DOUBLE)), 0.0), 9)
         AS lcl,
       CAST(CASE WHEN CAST(n_errors AS DOUBLE) / CAST(n_events AS DOUBLE)
                      > _pbar + 3.0 * sqrt(_pbar * (1.0 - _pbar)
                                           / CAST(n_events AS DOUBLE))
                 OR CAST(n_errors AS DOUBLE) / CAST(n_events AS DOUBLE)
                      < greatest(_pbar - 3.0 * sqrt(_pbar * (1.0 - _pbar)
                                                    / CAST(n_events AS DOUBLE)),
                                 0.0)
                 THEN 1 ELSE 0 END AS INT) AS out_of_control
FROM cell, tot ORDER BY hour
"""


def conversion_latency_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-velocity trend: per first-signup WEEK, how many
    users signed up, how many ever converted, and the DISCRETE
    median / p90 days from first signup to first at-or-after
    purchase — "is time-to-convert improving?", the time axis
    ``time_to_convert``'s single histogram flattens away.

    Determinism: gaps are integer epoch-microsecond day divs;
    quantiles are discrete (value at rank ⌈q·n⌉ via exact integer
    rank arithmetic over a cumulative histogram — no interpolation);
    rates are double divisions of exact counts.

    Plan (r16, same values over the unchanged oracle): ONE
    user-partitioned window pass over signup|purchase events
    computes each user's first-signup time t0, then a user-grain
    aggregate IN THE SAME PARTITIONING (hash(user_id) satisfies the
    groupBy clustering — no second exchange) takes the conditional
    min purchase-at-or-after-t0; the weekly histogram, cumulative
    window over DISTINCT gaps, and conditional-min rollup are
    unchanged.  Replaces the former signup aggregate + purchase
    join + (user, t0) re-aggregate — two event-grain exchanges and
    a double-computed signup branch — with one exchange
    (guide §2.4)."""
    ev = _events(spark, sf_dir)
    us = F.expr("ts_ns div 1000")
    w = Window.partitionBy("user_id")
    base = (
        ev.where(F.col("event_type").isin("signup", "purchase"))
        .select("user_id", "event_type", us.alias("_us"))
        .withColumn(
            "t0",
            F.min(F.when(F.col("event_type") == "signup", F.col("_us"))).over(w),
        )
        .where(F.col("t0").isNotNull())
    )
    per_user = base.groupBy("user_id").agg(
        F.min("t0").alias("t0"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("_us") >= F.col("t0")),
                F.col("_us"),
            )
        ).alias("t1"),
    )
    week = F.date_trunc(
        "week", F.timestamp_micros(F.col("t0")).cast("timestamp_ntz")
    ).cast("date")
    signups = per_user.groupBy(week.alias("signup_week")).agg(
        F.count(F.lit(1)).alias("n_signup_users")
    )
    gaps = per_user.where(F.col("t1").isNotNull()).select(
        week.alias("signup_week"),
        F.expr("(t1 - t0) div 86400000000").alias("gap_days"),
    )
    hist = gaps.groupBy("signup_week", "gap_days").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = hist.groupBy("signup_week").agg(F.sum("cnt").alias("n_conv"))
    wc = Window.partitionBy("signup_week").orderBy("gap_days")
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).join(tot, "signup_week")
    med_rank = F.expr("(n_conv + 1) div 2")
    p90_rank = F.expr("(9 * n_conv + 9) div 10")
    q = cum.groupBy("signup_week", "n_conv").agg(
        F.min(
            F.when(F.col("cum") >= med_rank, F.col("gap_days"))
        ).alias("median_days"),
        F.min(
            F.when(F.col("cum") >= p90_rank, F.col("gap_days"))
        ).alias("p90_days"),
    )
    return (
        signups.join(q, "signup_week", "left")
        .select(
            "signup_week",
            "n_signup_users",
            F.coalesce("n_conv", F.lit(0)).alias("n_converted"),
            F.round(
                F.coalesce("n_conv", F.lit(0)).cast("double")
                / F.col("n_signup_users").cast("double"),
                9,
            ).alias("conversion_rate"),
            "median_days",
            "p90_days",
        )
        .orderBy("signup_week")
    )


CONVERSION_LATENCY_WEEKLY_ORACLE = """
WITH fs AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY 1
),
fp AS (
  SELECT e.user_id, f.t0, MIN(epoch_us(e.ts)) AS t1
  FROM events e JOIN fs f USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= f.t0
  GROUP BY 1, 2
),
signups AS (
  SELECT CAST(date_trunc('week', make_timestamp(t0)) AS DATE)
           AS signup_week,
         COUNT(*) AS n_signup_users
  FROM fs GROUP BY 1
),
gaps AS (
  SELECT CAST(date_trunc('week', make_timestamp(t0)) AS DATE)
           AS signup_week,
         (t1 - t0) // 86400000000 AS gap_days
  FROM fp
),
hist AS (
  SELECT signup_week, gap_days, COUNT(*) AS cnt FROM gaps GROUP BY 1, 2
),
tot AS (SELECT signup_week, SUM(cnt) AS n_conv FROM hist GROUP BY 1),
cum AS (
  SELECT h.signup_week, h.gap_days, t.n_conv,
         SUM(h.cnt) OVER (PARTITION BY h.signup_week ORDER BY h.gap_days
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM hist h JOIN tot t USING (signup_week)
),
q AS (
  SELECT signup_week, n_conv,
         MIN(CASE WHEN cum >= (n_conv + 1) // 2 THEN gap_days END)
           AS median_days,
         MIN(CASE WHEN cum >= (9 * n_conv + 9) // 10 THEN gap_days END)
           AS p90_days
  FROM cum GROUP BY 1, 2
)
SELECT s.signup_week, CAST(s.n_signup_users AS BIGINT) AS n_signup_users,
       CAST(COALESCE(q.n_conv, 0) AS BIGINT) AS n_converted,
       round(CAST(COALESCE(q.n_conv, 0) AS DOUBLE)
             / CAST(s.n_signup_users AS DOUBLE), 9) AS conversion_rate,
       q.median_days, q.p90_days
FROM signups s LEFT JOIN q USING (signup_week)
ORDER BY s.signup_week
"""


def error_budget_burn_daily(
    spark: SparkSession, sf_dir: str, slo: float = 0.01
) -> DataFrame:
    """SLO error-budget burn: per day, the error share, the
    cumulative error rate since start, and the burn ratio
    (cumulative errors ÷ the ``slo``-sized budget over cumulative
    traffic) — burn > 1 means the error budget is spent, the
    page-the-owner number in SRE practice (the budget view on top of
    ``hourly_error_pchart``'s control limits).

    Determinism: all counts exact; the cumulative window runs over
    DAY-grain rows (calendar-bounded — the documented bounded-window
    exemption class); burn is one double division chain of exact
    integers, rounded 9dp.

    Plan: one 30-ish-row day aggregate, one bounded cumulative
    window."""
    ev = _events(spark, sf_dir)
    day = F.col("ts").cast("date")
    cell = ev.groupBy(day.alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("event_type") == "error").cast("long")).alias(
            "n_errors"
        ),
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cell.withColumn("cum_events", F.sum("n_events").over(w)).withColumn(
        "cum_errors", F.sum("n_errors").over(w)
    )
    burn = F.col("cum_errors").cast("double") / (
        F.lit(slo) * F.col("cum_events").cast("double")
    )
    return cum.select(
        "day",
        "n_events",
        "n_errors",
        F.round(
            F.col("n_errors").cast("double") / F.col("n_events").cast("double"),
            9,
        ).alias("error_share"),
        F.round(burn, 9).alias("budget_burn"),
        (burn > 1.0).cast("int").alias("budget_exhausted"),
    ).orderBy("day")


ERROR_BUDGET_BURN_ORACLE = """
WITH cell AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors
  FROM events GROUP BY 1
),
cum AS (
  SELECT day, n_events, n_errors,
         SUM(n_events) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_events,
         SUM(n_errors) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_errors
  FROM cell
)
SELECT day, CAST(n_events AS BIGINT) AS n_events,
       CAST(n_errors AS BIGINT) AS n_errors,
       round(CAST(n_errors AS DOUBLE) / CAST(n_events AS DOUBLE), 9)
         AS error_share,
       round(CAST(cum_errors AS DOUBLE)
             / (0.01 * CAST(cum_events AS DOUBLE)), 9) AS budget_burn,
       CAST(CASE WHEN CAST(cum_errors AS DOUBLE)
                      / (0.01 * CAST(cum_events AS DOUBLE)) > 1.0
                 THEN 1 ELSE 0 END AS INT) AS budget_exhausted
FROM cum ORDER BY day
"""


def first_vs_later_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-session quality gap: the user's FIRST session compared
    with all later sessions on count, mean events, mean duration and
    purchase-conversion rate — onboarding-quality evidence ("do
    first sessions convert worse, and by how much?"), the class cut
    on top of the shared session kernel.

    Determinism: class is an exact session_no == 1 comparison;
    durations sum exact nanoseconds and divide once; rates divide
    exact counts, rounded 9dp."""
    sess = _sessions(_events(spark, sf_dir))
    cls = F.when(F.col("session_no") == 1, "first").otherwise("later")
    return (
        sess.groupBy(cls.alias("session_class"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(
                F.sum("n_events").cast("double")
                / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("avg_events"),
            F.round(
                (F.sum(F.col("end_ns") - F.col("start_ns")).cast("double")
                 / F.count(F.lit(1)).cast("double"))
                / F.lit(60_000_000_000.0),
                9,
            ).alias("avg_duration_min"),
            F.round(
                F.sum((F.col("n_purchases") > 0).cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("purchase_rate"),
            F.sum("total_value").cast("double").alias("total_value"),
        )
        .orderBy("session_class")
    )


FIRST_VS_LATER_ORACLE = f"""
WITH {_SESSIONS_SQL}
SELECT CASE WHEN session_no = 1 THEN 'first' ELSE 'later' END
         AS session_class,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       round(CAST(SUM(n_events) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
         AS avg_events,
       round((CAST(SUM((end_us - start_us) * 1000) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE)) / 60000000000.0, 9)
         AS avg_duration_min,
       round(CAST(SUM(CASE WHEN n_purchases > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 9) AS purchase_rate,
       CAST(SUM(total_value) AS DOUBLE) AS total_value
FROM sess GROUP BY 1 ORDER BY 1
"""


def purchase_regularity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-cadence regularity: per repeat purchaser, the
    coefficient of variation of inter-purchase gaps, banded into
    regular (< 0.5), moderate (< 1.0) and bursty (≥ 1.0) cohorts —
    the gap-based companion to ``event_burstiness``'s daily-count
    Fano (CV of gaps is the standard regularity statistic for
    replenishment/subscription behavior detection).

    Determinism: gaps are exact integer microseconds from ONE
    user-partitioned lag; per-user Σg/Σg² are exact integer sums, so
    the CV is an identical IEEE double chain in both engines; band
    cuts compare those identical doubles; the per-band mean CV uses
    the rounded-term DECIMAL contract.

    Plan: purchases filter pushes to the scan; one user-keyed window
    exchange; user-grain moments; enum-sized band rollup."""
    ev = _events(spark, sf_dir)
    us = F.expr("ts_ns div 1000")
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id", us.alias("_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    gaps = purch.select(
        "user_id", (F.col("_us") - F.lag("_us").over(w)).alias("g")
    ).where(F.col("g").isNotNull())
    mom = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("g").alias("s"),
        F.sum(
            (F.col("g").cast("decimal(38,0)") * F.col("g").cast("decimal(38,0)")).cast("decimal(38,0)")
        ).alias("q"),
    ).where(F.col("n") >= 2)
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    var = (
        F.col("n").cast("double") * F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
    ) / (F.col("n").cast("double") * F.col("n").cast("double"))
    cv = F.sqrt(var) / mean
    band = (
        F.when(cv < 0.5, "0-regular")
        .when(cv < 1.0, "1-moderate")
        .otherwise("2-bursty")
    )
    per_user = mom.select(
        band.alias("regularity_band"),
        F.round(cv, 9).cast("decimal(18,9)").alias("_cv"),
    )
    cell = per_user.groupBy("regularity_band").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(
            F.sum("_cv").cast("double") / F.count(F.lit(1)).cast("double"), 9
        ).alias("mean_cv"),
    )
    tot = cell.agg(F.sum("n_users").alias("_t"))
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            "regularity_band",
            "n_users",
            "mean_cv",
            F.round(
                F.col("n_users").cast("double") / F.col("_t").cast("double"),
                9,
            ).alias("share_of_users"),
        )
        .orderBy("regularity_band")
    )


PURCHASE_REGULARITY_ORACLE = """
WITH purch AS (
  SELECT user_id, epoch_us(ts) AS _us, event_id FROM events
  WHERE event_type = 'purchase'
),
gaps AS (
  SELECT user_id,
         _us - lag(_us) OVER (PARTITION BY user_id
                              ORDER BY _us, event_id) AS g
  FROM purch
),
mom AS (
  SELECT user_id, COUNT(*) AS n, SUM(g) AS s,
         SUM(CAST(g AS HUGEINT) * CAST(g AS HUGEINT)) AS q
  FROM gaps WHERE g IS NOT NULL GROUP BY 1 HAVING COUNT(*) >= 2
),
per_user AS (
  SELECT CASE
           WHEN sqrt((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) < 0.5
             THEN '0-regular'
           WHEN sqrt((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) < 1.0
             THEN '1-moderate'
           ELSE '2-bursty' END AS regularity_band,
         CAST(round(sqrt((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                    / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 9)
              AS DECIMAL(18,9)) AS _cv
  FROM mom
),
cell AS (
  SELECT regularity_band, COUNT(*) AS n_users,
         round(CAST(SUM(_cv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
           AS mean_cv
  FROM per_user GROUP BY 1
)
SELECT regularity_band, CAST(n_users AS BIGINT) AS n_users, mean_cv,
       round(CAST(n_users AS DOUBLE)
             / CAST((SELECT SUM(n_users) FROM cell) AS DOUBLE), 9)
         AS share_of_users
FROM cell ORDER BY regularity_band
"""


def user_lifetime_km_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier estimate of USER LIFETIME (days from first to
    last event) with right-censoring: a user still active within 7
    days of the corpus horizon is "still alive", not "churned at
    their last event" — the survival chart behind every retention/LTV
    model, at the user grain (``order_survival_curve`` is the same
    estimator on time-to-next-order).

    Plan: ONE user-grain min/max aggregate builds the spans (no
    window over event rows); everything after runs at DAY grain —
    the two unpartitioned cumulative windows see at most
    calendar-span rows at ANY corpus size (the documented bounded
    exemption class).

    Determinism: mirrors the ``order_survival_curve`` contract —
    exact integer n/d/c, hazard one division rounded 9, survival
    exp∘Σln rounded 6 with the terminal d==n bucket pinned to 0."""
    ev = _events(spark, sf_dir)
    horizon = ev.groupBy().agg(F.max("ts_ns").alias("_end"))
    spans = (
        ev.groupBy("user_id")
        .agg(F.min("ts_ns").alias("_first"), F.max("ts_ns").alias("_last"))
        .crossJoin(F.broadcast(horizon))
        .select(
            F.expr("(_last - _first) div 86400000000000").alias("day"),
            (
                F.expr("(_end - _last) div 86400000000000") >= 7
            ).cast("long").alias("ev"),
        )
    )
    buckets = spans.groupBy("day").agg(
        F.sum("ev").alias("d_churned"),
        F.sum(F.lit(1) - F.col("ev")).alias("c_censored"),
    )
    total = spans.groupBy().agg(F.count(F.lit(1)).alias("total"))
    w_prior = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    at_risk = (
        buckets.crossJoin(F.broadcast(total))
        .withColumn(
            "n_at_risk",
            F.col("total")
            - F.coalesce(
                F.sum(F.col("d_churned") + F.col("c_censored")).over(w_prior),
                F.lit(0),
            ),
        )
        .withColumn(
            "factor",
            F.lit(1.0)
            - F.col("d_churned").cast("double")
            / F.col("n_at_risk").cast("double"),
        )
        .withColumn(
            "hit_zero",
            F.max((F.col("factor") <= 0).cast("int")).over(w_cum),
        )
        .withColumn(
            "survival",
            F.when(F.col("hit_zero") == 1, F.lit(0.0)).otherwise(
                F.exp(
                    F.sum(
                        F.when(F.col("factor") > 0, F.log(F.col("factor")))
                    ).over(w_cum)
                )
            ),
        )
    )
    return at_risk.select(
        "day",
        "n_at_risk",
        "d_churned",
        "c_censored",
        F.round(
            F.col("d_churned").cast("double") / F.col("n_at_risk").cast("double"),
            9,
        ).alias("hazard"),
        F.round(F.col("survival"), 6).alias("km_survival"),
    ).orderBy("day")


USER_LIFETIME_KM_ORACLE = """
WITH horizon AS (SELECT MAX(epoch_us(ts)) AS _end FROM events),
spans AS (
  SELECT (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 86400000000 AS day,
         CASE WHEN (h._end - MAX(epoch_us(ts))) // 86400000000 >= 7
              THEN 1 ELSE 0 END AS ev
  FROM events, horizon h
  GROUP BY user_id, h._end
),
buckets AS (
  SELECT day, SUM(ev) AS d_churned, SUM(1 - ev) AS c_censored
  FROM spans GROUP BY 1
),
total AS (SELECT COUNT(*) AS total FROM spans),
at_risk AS (
  SELECT b.day, b.d_churned, b.c_censored,
         t.total - COALESCE(SUM(b.d_churned + b.c_censored) OVER (
           ORDER BY b.day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS n_at_risk
  FROM buckets b, total t
),
f AS (
  SELECT *,
         1.0 - CAST(d_churned AS DOUBLE) / CAST(n_at_risk AS DOUBLE)
           AS factor,
         MAX(CASE WHEN 1.0 - CAST(d_churned AS DOUBLE)
                       / CAST(n_at_risk AS DOUBLE) <= 0
                  THEN 1 ELSE 0 END) OVER (
           ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS hit_zero
  FROM at_risk
)
SELECT day, CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(d_churned AS BIGINT) AS d_churned,
       CAST(c_censored AS BIGINT) AS c_censored,
       round(CAST(d_churned AS DOUBLE) / CAST(n_at_risk AS DOUBLE), 9)
         AS hazard,
       round(CASE WHEN hit_zero = 1 THEN 0.0
                  ELSE exp(SUM(CASE WHEN factor > 0 THEN ln(factor) END)
                           OVER (ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW))
                  END, 6) AS km_survival
FROM f ORDER BY day
"""


QUERIES = {
    "user_lifetime_km_curve": user_lifetime_km_curve,
    "purchase_regularity_bands": purchase_regularity_bands,
    "first_vs_later_sessions": first_vs_later_sessions,
    "error_budget_burn_daily": error_budget_burn_daily,
    "conversion_latency_weekly": conversion_latency_weekly,
    "hourly_error_pchart": hourly_error_pchart,
    "session_handoff_matrix": session_handoff_matrix,
    "session_value_by_duration_band": session_value_by_duration_band,
    "user_dominant_type_share": user_dominant_type_share,
}

ORACLES = {
    "user_lifetime_km_curve": USER_LIFETIME_KM_ORACLE,
    "purchase_regularity_bands": PURCHASE_REGULARITY_ORACLE,
    "first_vs_later_sessions": FIRST_VS_LATER_ORACLE,
    "error_budget_burn_daily": ERROR_BUDGET_BURN_ORACLE,
    "conversion_latency_weekly": CONVERSION_LATENCY_WEEKLY_ORACLE,
    "hourly_error_pchart": HOURLY_ERROR_PCHART_ORACLE,
    "session_handoff_matrix": SESSION_HANDOFF_ORACLE,
    "session_value_by_duration_band": SESSION_DURATION_BAND_ORACLE,
    "user_dominant_type_share": USER_DOMINANT_TYPE_ORACLE,
}
