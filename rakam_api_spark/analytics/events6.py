"""Round-15 event-analytics additions: inter-session gap bands,
value by in-session position, rapid-fire share, engagement
quadrants, hourly value dispersion, consecutive-hour user overlap,
intra-session type diversity, and daypart preference — behavioral
report shapes the reference serves through its SQL surface over
event collections (reference README.md:27-31, SURVEY.md §2.7).

Determinism conventions match events.py: epoch math on integer
``ts_ns``-derived microseconds (integer ``div``, never double
division); counts are exact longs; single O(1)-magnitude ratios are
one double division rounded to 9dp; sqrt chains round to 6dp; value
sums go through DECIMAL(18,6) (squared moments through DECIMAL(12,4)
operands so neither engine's decimal multiply overflows); large-
magnitude means are RAW double divisions of exact decimal sums (no
round — 9dp rounding at 1e5 magnitude is ULP-fragile); ties break on
``event_id``.

Scale notes: every query reduces the event stream with ONE aggregate
or ONE user-keyed window (the shared :func:`events.sessionize`
kernel) before any small-grain arithmetic; the only windows over
event rows partition by user_id; band/cell outputs are enum-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .events import DEC, _events, _us, sessionize

#: shared session-CTE prefix for oracles (the sessionize() rule:
#: 30-minute inactivity gap, event_id tiebreak)
_SESS_CTE = """
ordered AS (
  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
), flagged AS (
  SELECT user_id, event_id, event_type, value, us,
         CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM ordered
), sessions AS (
  SELECT user_id, event_id, event_type, value, us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS session_id
  FROM flagged
)
"""


def inter_session_gap_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How long users stay away: the gap between a session's END and
    the same user's NEXT session start, banded (<1h, 1-6h, 6-24h,
    1-3d, ≥3d) — the dormancy histogram behind re-engagement timing
    (``session_gap_curve`` tunes the gap PARAMETER; this measures the
    BETWEEN-session behavior it induces).

    Plan: the shared sessionize kernel (ONE user-keyed exchange), a
    session-grain aggregate, one lag over the user's ≤ sessions rows,
    then an enum-sized band aggregate.  Bands are integer-µs
    comparisons."""
    sess = sessionize(_events(spark, sf_dir))
    per = sess.groupBy("user_id", "session_id").agg(
        F.min("_us").alias("_start"), F.max("_us").alias("_end")
    )
    w = Window.partitionBy("user_id").orderBy("_start", "session_id")
    gap = (F.col("_start") - F.lag("_end").over(w)).alias("_gap")
    gaps = per.select("user_id", gap).where(F.col("_gap").isNotNull())
    hours = F.lit(3_600_000_000)
    band = (
        F.when(F.col("_gap") < 1 * hours, "0_under_1h")
        .when(F.col("_gap") < 6 * hours, "1_1h_6h")
        .when(F.col("_gap") < 24 * hours, "2_6h_24h")
        .when(F.col("_gap") < 72 * hours, "3_1d_3d")
        .otherwise("4_over_3d")
    )
    tot = gaps.agg(F.count(F.lit(1)).alias("_t"))
    return (
        gaps.groupBy(band.alias("gap_band"))
        .agg(F.count(F.lit(1)).alias("n_gaps"))
        .crossJoin(F.broadcast(tot))
        .select(
            "gap_band",
            "n_gaps",
            F.round(
                F.col("n_gaps").cast("double") / F.col("_t").cast("double"), 9
            ).alias("share"),
        )
        .orderBy("gap_band")
    )


INTER_SESSION_GAP_ORACLE = f"""
WITH {_SESS_CTE},
per AS (
  SELECT user_id, session_id, MIN(us) AS _start, MAX(us) AS _end
  FROM sessions GROUP BY 1, 2
),
gaps AS (
  SELECT _start - LAG(_end) OVER (PARTITION BY user_id
                                  ORDER BY _start, session_id) AS _gap
  FROM per
),
banded AS (
  SELECT CASE WHEN _gap < 3600000000 THEN '0_under_1h'
              WHEN _gap < 21600000000 THEN '1_1h_6h'
              WHEN _gap < 86400000000 THEN '2_6h_24h'
              WHEN _gap < 259200000000 THEN '3_1d_3d'
              ELSE '4_over_3d' END AS gap_band
  FROM gaps WHERE _gap IS NOT NULL
),
tot AS (SELECT COUNT(*) AS _t FROM banded)
SELECT gap_band, CAST(COUNT(*) AS BIGINT) AS n_gaps,
       round(CAST(COUNT(*) AS DOUBLE) / CAST(tot._t AS DOUBLE), 9) AS share
FROM banded CROSS JOIN tot
GROUP BY gap_band, tot._t
ORDER BY gap_band
"""


def value_by_session_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does value concentrate early or late in a session?  Events
    banded by their ordinal position within the session (1, 2, 3,
    4-5, 6-10, >10) with count and average value per band — the
    engagement-pacing complement of ``session_first_purchase_position``
    (which tracks one type's first hit; this profiles ALL value).

    Plan: sessionize (ONE user-keyed exchange), a row_number over the
    (user, session) partition — bounded by session length — then an
    enum-sized band aggregate.  avg is an exact DECIMAL sum over an
    exact count (raw double division, no rounding)."""
    sess = sessionize(_events(spark, sf_dir))
    w = Window.partitionBy("user_id", "session_id").orderBy(
        "_us", "event_id"
    )
    pos = F.row_number().over(w)
    band = (
        F.when(pos == 1, "pos_01")
        .when(pos == 2, "pos_02")
        .when(pos == 3, "pos_03")
        .when(pos <= 5, "pos_04_05")
        .when(pos <= 10, "pos_06_10")
        .otherwise("pos_11_plus")
    )
    return (
        sess.select(band.alias("position_band"), "value")
        .groupBy("position_band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.col("value").cast(DEC)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_value"),
        )
        .orderBy("position_band")
    )


VALUE_BY_POSITION_ORACLE = f"""
WITH {_SESS_CTE},
positioned AS (
  SELECT value,
         ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                            ORDER BY us, event_id) AS pos
  FROM sessions
)
SELECT CASE WHEN pos = 1 THEN 'pos_01'
            WHEN pos = 2 THEN 'pos_02'
            WHEN pos = 3 THEN 'pos_03'
            WHEN pos <= 5 THEN 'pos_04_05'
            WHEN pos <= 10 THEN 'pos_06_10'
            ELSE 'pos_11_plus' END AS position_band,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_value
FROM positioned
GROUP BY 1
ORDER BY position_band
"""


def rapid_fire_share_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/burst telltale per event type: the share of events that
    arrive within ONE SECOND of the same user's previous event (any
    type) — per-type rapid-fire rates separate instrumented chatter
    from human actions (``event_burstiness`` profiles days; this
    pins the type).

    Plan: ONE user-keyed lag window (integer-µs delta), then an
    enum-sized per-type aggregate."""
    ev = _events(spark, sf_dir).withColumn("_us", _us())
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    delta = F.col("_us") - F.lag("_us").over(w)
    rapid = (delta <= 1_000_000).cast("long")
    return (
        ev.select("event_type", rapid.alias("_rapid"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce(F.col("_rapid"), F.lit(0))).alias(
                "n_rapid"
            ),
            F.round(
                F.sum(F.coalesce(F.col("_rapid"), F.lit(0))).cast("double")
                / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("rapid_share"),
        )
        .orderBy("event_type")
    )


RAPID_FIRE_ORACLE = """
WITH d AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS _delta
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN _delta <= 1000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_rapid,
       round(CAST(SUM(CASE WHEN _delta <= 1000000 THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS rapid_share
FROM d
GROUP BY event_type
ORDER BY event_type
"""


def session_count_duration_quadrants(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Engagement quadrants: users split by the GLOBAL medians of
    (session count, total session duration) into frequent/infrequent
    × long/short cells — the 2×2 every engagement review starts from
    (the events-side sibling of ``customer_balance_vs_spend_quadrant``).

    Plan: sessionize + one user-grain aggregate; the two medians are
    ONE exact-percentile scalar aggregate broadcast back (at 100 TB:
    ``approx_percentile``, same shape); the quadrant label is
    row-local and the final aggregate is 4 cells."""
    sess = sessionize(_events(spark, sf_dir))
    per_s = sess.groupBy("user_id", "session_id").agg(
        (F.max("_us") - F.min("_us")).alias("_dur")
    )
    per_u = per_s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("_ns"), F.sum("_dur").alias("_du")
    )
    med = per_u.agg(
        F.expr("percentile(_ns, 0.5)").alias("_mns"),
        F.expr("percentile(_du, 0.5)").alias("_mdu"),
    )
    quad = F.concat(
        F.when(F.col("_ns") > F.col("_mns"), F.lit("frequent_")).otherwise(
            F.lit("infrequent_")
        ),
        F.when(F.col("_du") > F.col("_mdu"), F.lit("long")).otherwise(
            F.lit("short")
        ),
    )
    tot = per_u.agg(F.count(F.lit(1)).alias("_t"))
    return (
        per_u.crossJoin(F.broadcast(med))
        .groupBy(quad.alias("quadrant"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .crossJoin(F.broadcast(tot))
        .select(
            "quadrant",
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("_t").cast("double"),
                9,
            ).alias("user_share"),
        )
        .orderBy("quadrant")
    )


QUADRANTS_ORACLE = f"""
WITH {_SESS_CTE},
per_s AS (
  SELECT user_id, session_id, MAX(us) - MIN(us) AS _dur
  FROM sessions GROUP BY 1, 2
),
per_u AS (
  SELECT user_id, COUNT(*) AS _ns, SUM(_dur) AS _du
  FROM per_s GROUP BY 1
),
med AS (
  SELECT quantile_cont(_ns, 0.5) AS _mns, quantile_cont(_du, 0.5) AS _mdu
  FROM per_u
),
tot AS (SELECT COUNT(*) AS _t FROM per_u)
SELECT (CASE WHEN u._ns > m._mns THEN 'frequent_' ELSE 'infrequent_' END
        || CASE WHEN u._du > m._mdu THEN 'long' ELSE 'short' END)
         AS quadrant,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       round(CAST(COUNT(*) AS DOUBLE) / CAST(tot._t AS DOUBLE), 9)
         AS user_share
FROM per_u u CROSS JOIN med m CROSS JOIN tot
GROUP BY 1, tot._t
ORDER BY quadrant
"""


def type_value_cv_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value dispersion by (event type, hour of day): the coefficient
    of variation of event value per cell — where in the day a type's
    spend becomes erratic (``daily_count_dispersion_by_type`` profiles
    COUNT dispersion across days; this profiles VALUE dispersion
    within the daily cycle).

    Plan: ONE |types|·24-cell aggregate of exact DECIMAL moments
    (squared values through DECIMAL(12,4) operands — exact and
    order-free, and neither engine's decimal multiply overflows);
    the CV is row-local double arithmetic, sqrt-chain rounded 6."""
    ev = _events(spark, sf_dir)
    v4 = F.col("value").cast("decimal(12,4)")
    cell = ev.groupBy(
        "event_type", F.hour("ts").alias("hour_of_day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC)).alias("_sv"),
        F.sum(v4 * v4).alias("_svv"),
    )
    n = F.col("n_events").cast("double")
    sv = F.col("_sv").cast("double")
    svv = F.col("_svv").cast("double")
    cv = F.sqrt((n * svv - sv * sv) / (n * n)) / (sv / n)
    return cell.select(
        "event_type",
        "hour_of_day",
        "n_events",
        F.round(cv, 6).alias("value_cv"),
    ).orderBy("event_type", "hour_of_day")


TYPE_VALUE_CV_ORACLE = """
WITH cell AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS hour_of_day,
         COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(18,6))) AS _sv,
         SUM(CAST(value AS DECIMAL(12,4)) * CAST(value AS DECIMAL(12,4)))
           AS _svv
  FROM events GROUP BY 1, 2
)
SELECT event_type, CAST(hour_of_day AS INT) AS hour_of_day,
       CAST(n_events AS BIGINT) AS n_events,
       round(sqrt((CAST(n_events AS DOUBLE) * CAST(_svv AS DOUBLE)
                   - CAST(_sv AS DOUBLE) * CAST(_sv AS DOUBLE))
                  / (CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE)))
             / (CAST(_sv AS DOUBLE) / CAST(n_events AS DOUBLE)), 6)
         AS value_cv
FROM cell
ORDER BY event_type, hour_of_day
"""


def consecutive_hour_user_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hour-to-hour audience persistence: for each hour of day, the
    share of its active users who are ALSO active in the next
    calendar hour (same absolute hour + 1) — session continuation at
    the calendar grain (``stickiness_dau_mau`` measures day/month;
    this measures the hour boundary).

    Plan: one distinct to (user, absolute-hour) grain (integer µs
    div), a self-join on (user, hour+1) that reuses the same hash
    partitioning, then a 24-cell aggregate by hour-of-day."""
    ev = _events(spark, sf_dir)
    uh = ev.select(
        "user_id",
        F.expr("(ts_ns div 1000) div 3600000000").alias("_h"),
    ).distinct()
    nxt = uh.select(
        F.col("user_id").alias("_u2"), (F.col("_h") - 1).alias("_hprev")
    )
    flagged = uh.join(
        nxt,
        (F.col("user_id") == F.col("_u2")) & (F.col("_h") == F.col("_hprev")),
        "left",
    ).select(
        "user_id", "_h", F.col("_u2").isNotNull().alias("_cont")
    )
    return (
        flagged.groupBy(
            (F.col("_h") % 24).cast("int").alias("hour_of_day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_user_hours"),
            F.sum(F.col("_cont").cast("long")).alias("n_continued"),
            F.round(
                F.sum(F.col("_cont").cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("continuation_rate"),
        )
        .orderBy("hour_of_day")
    )


HOUR_OVERLAP_ORACLE = """
WITH uh AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS _h
  FROM events
),
flagged AS (
  SELECT a.user_id, a._h, (b.user_id IS NOT NULL) AS _cont
  FROM uh a LEFT JOIN uh b
    ON a.user_id = b.user_id AND b._h = a._h + 1
)
SELECT CAST(_h % 24 AS INT) AS hour_of_day,
       CAST(COUNT(*) AS BIGINT) AS n_user_hours,
       CAST(SUM(CASE WHEN _cont THEN 1 ELSE 0 END) AS BIGINT)
         AS n_continued,
       round(CAST(SUM(CASE WHEN _cont THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 9) AS continuation_rate
FROM flagged
GROUP BY 1
ORDER BY hour_of_day
"""


def intra_session_type_diversity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Are longer sessions broader or just deeper?  Sessions banded
    by event count (1, 2, 3-5, 6-10, >10) with the average number of
    DISTINCT event types per session in each band —
    (``type_diversity_trend`` tracks users across time; this holds
    the session fixed).

    Plan: sessionize + ONE session-grain aggregate (count + distinct
    types), then an enum-sized band aggregate; the average is an
    exact long sum over an exact count."""
    sess = sessionize(_events(spark, sf_dir))
    per = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct("event_type").alias("_types"),
    )
    band = (
        F.when(F.col("_n") == 1, "len_01")
        .when(F.col("_n") == 2, "len_02")
        .when(F.col("_n") <= 5, "len_03_05")
        .when(F.col("_n") <= 10, "len_06_10")
        .otherwise("len_11_plus")
    )
    return (
        per.groupBy(band.alias("length_band"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(
                F.sum("_types").cast("double")
                / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("avg_distinct_types"),
        )
        .orderBy("length_band")
    )


TYPE_DIVERSITY_ORACLE = f"""
WITH {_SESS_CTE},
per AS (
  SELECT user_id, session_id, COUNT(*) AS _n,
         COUNT(DISTINCT event_type) AS _types
  FROM sessions GROUP BY 1, 2
)
SELECT CASE WHEN _n = 1 THEN 'len_01'
            WHEN _n = 2 THEN 'len_02'
            WHEN _n <= 5 THEN 'len_03_05'
            WHEN _n <= 10 THEN 'len_06_10'
            ELSE 'len_11_plus' END AS length_band,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       round(CAST(SUM(_types) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
         AS avg_distinct_types
FROM per
GROUP BY 1
ORDER BY length_band
"""


def user_daypart_preference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """When is each user's home turf?  Users labeled by their MODAL
    daypart (night 0-6, morning 6-12, afternoon 12-18, evening
    18-24; count ties break toward the earlier daypart), aggregated
    to daypart × (user count, user share, total events) — the
    audience-scheduling report (``hour_of_week_profile`` counts
    events; this classifies USERS).

    Plan: one (user, daypart) aggregate (≤ 4 rows per user), a
    row_number over that bounded partition for the deterministic
    argmax, then a 4-cell aggregate."""
    ev = _events(spark, sf_dir)
    hour = F.hour("ts")
    daypart = (
        F.when(hour < 6, "0_night")
        .when(hour < 12, "1_morning")
        .when(hour < 18, "2_afternoon")
        .otherwise("3_evening")
    )
    per = ev.groupBy("user_id", daypart.alias("daypart")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("_n"), F.asc("daypart")
    )
    top = per.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") == 1
    )
    tot = top.agg(F.count(F.lit(1)).alias("_t"))
    return (
        top.groupBy("daypart")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("_n").alias("n_events_in_daypart"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "daypart",
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("_t").cast("double"),
                9,
            ).alias("user_share"),
            "n_events_in_daypart",
        )
        .orderBy("daypart")
    )


DAYPART_ORACLE = """
WITH per AS (
  SELECT user_id,
         CASE WHEN EXTRACT(hour FROM ts) < 6 THEN '0_night'
              WHEN EXTRACT(hour FROM ts) < 12 THEN '1_morning'
              WHEN EXTRACT(hour FROM ts) < 18 THEN '2_afternoon'
              ELSE '3_evening' END AS daypart,
         COUNT(*) AS _n
  FROM events GROUP BY 1, 2
),
top AS (
  SELECT user_id, daypart, _n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY _n DESC, daypart ASC) AS _rn
  FROM per
),
tot AS (SELECT COUNT(*) AS _t FROM top WHERE _rn = 1)
SELECT daypart,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       round(CAST(COUNT(*) AS DOUBLE) / CAST(tot._t AS DOUBLE), 9)
         AS user_share,
       CAST(SUM(_n) AS BIGINT) AS n_events_in_daypart
FROM top CROSS JOIN tot
WHERE _rn = 1
GROUP BY daypart, tot._t
ORDER BY daypart
"""


def type_adoption_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-adoption latency per event type: among users who emit
    the type at all, how many first reached it LATER than their very
    first event, and how long that lag runs (median/mean hours) — the
    "time to second feature" table a product-analytics surface draws
    from the same first-touch state ``first_event_type_by_cohort``
    reads (reference README.md:27-31; SURVEY.md §2.7).

    Plan: two user-grain min aggregates (exact integer µs) joined on
    user_id — co-keyed exchange, no corpus broadcast — then ONE
    |types|-cell aggregate.  Lag hours are per-row doubles from exact
    integer µs (one division each, identical in both engines); the
    median is ``percentile`` ≡ ``quantile_cont`` over those doubles
    with lag-0 rows masked to NULL (both engines' percentile skips
    NULLs); the mean divides exact integer sums, round 6."""
    ev = _events(spark, sf_dir)
    first_any = ev.groupBy("user_id").agg(F.min(_us()).alias("_first_us"))
    first_type = ev.groupBy("user_id", "event_type").agg(
        F.min(_us()).alias("_type_us")
    )
    lag = first_type.join(first_any, "user_id").select(
        "event_type",
        (F.col("_type_us") - F.col("_first_us")).alias("_lag_us"),
    )
    lag_h = F.when(
        F.col("_lag_us") > 0,
        F.col("_lag_us").cast("double") / F.lit(3600000000.0),
    )
    cell = lag.withColumn("_lag_h", lag_h).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("_lag_us") > 0, 1).otherwise(0)).alias(
            "n_late_adopters"
        ),
        F.expr("percentile(_lag_h, 0.5)").alias("_med"),
        F.sum(F.when(F.col("_lag_us") > 0, F.col("_lag_us"))).alias(
            "_late_sum_us"
        ),
    )
    return cell.select(
        "event_type",
        "n_users",
        "n_late_adopters",
        F.round(F.col("_med"), 6).alias("median_lag_hours"),
        F.round(
            F.col("_late_sum_us").cast("double")
            / F.col("n_late_adopters").cast("double")
            / F.lit(3600000000.0),
            6,
        ).alias("avg_lag_hours"),
    ).orderBy("event_type")


ADOPTION_LAG_ORACLE = """
WITH fa AS (
  SELECT user_id, MIN(epoch_us(ts)) AS first_us FROM events GROUP BY 1
),
ft AS (
  SELECT user_id, event_type, MIN(epoch_us(ts)) AS type_us
  FROM events GROUP BY 1, 2
),
lag AS (
  SELECT f.event_type, f.type_us - a.first_us AS lag_us
  FROM ft f JOIN fa a ON f.user_id = a.user_id
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN lag_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late_adopters,
       round(quantile_cont(CASE WHEN lag_us > 0
                                THEN CAST(lag_us AS DOUBLE) / 3600000000.0
                           END, 0.5), 6) AS median_lag_hours,
       round(CAST(SUM(CASE WHEN lag_us > 0 THEN lag_us END) AS DOUBLE)
             / CAST(SUM(CASE WHEN lag_us > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / 3600000000.0, 6) AS avg_lag_hours
FROM lag
GROUP BY 1
ORDER BY 1
"""


def type_value_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day persistence of each event type's VALUE series:
    lag-1 Pearson autocorrelation of daily value totals per type —
    near-zero means independent days (transactional noise), high
    positive means momentum/level shifts (``weekly_seasonality_autocorr``
    tests the GLOBAL COUNT series for weekly cycles; this tests each
    type's value series for short memory).

    Plan: ONE (type, day) DECIMAL aggregate reduces the fact table,
    then a calendar-bounded self-join on (type, day+1) — cell-grain,
    never event rows — and ONE |types| aggregate of exact decimal
    cross-moments (operands DECIMAL(14,4): products land in
    DECIMAL(29,8)/(28,8), inside both engines' exact range); Pearson
    r assembles row-local, round 9."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").cast(DEC)).alias("_dv"))
    x = F.col("_x").cast("decimal(14,4)")
    y = F.col("_y").cast("decimal(14,4)")
    a = daily.select(
        "event_type", F.col("day").alias("_d"), F.col("_dv").alias("_x")
    )
    b = daily.select(
        "event_type",
        F.date_add(F.col("day"), 1).alias("_d"),
        F.col("_dv").alias("_y"),
    )
    m = (
        a.join(b, ["event_type", "_d"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_day_pairs"),
            F.sum(x).alias("_sx"),
            F.sum(y).alias("_sy"),
            F.sum(x * y).alias("_sxy"),
            F.sum(x * x).alias("_sxx"),
            F.sum(y * y).alias("_syy"),
        )
    )
    n = F.col("n_day_pairs").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    r = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return m.select(
        "event_type",
        "n_day_pairs",
        F.round(r, 9).alias("value_autocorr_lag1"),
    ).orderBy("event_type")


VALUE_AUTOCORR_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,6))) AS dv
  FROM events GROUP BY 1, 2
),
paired AS (
  SELECT a.event_type,
         CAST(a.dv AS DECIMAL(14,4)) AS x,
         CAST(b.dv AS DECIMAL(14,4)) AS y
  FROM daily a
  JOIN daily b ON a.event_type = b.event_type
             AND b.day = a.day + INTERVAL 1 DAY
),
m AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM paired GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_day_pairs,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9)
         AS value_autocorr_lag1
FROM m
ORDER BY event_type
"""


QUERIES = {
    "inter_session_gap_bands": inter_session_gap_bands,
    "value_by_session_position": value_by_session_position,
    "rapid_fire_share_by_type": rapid_fire_share_by_type,
    "session_count_duration_quadrants": session_count_duration_quadrants,
    "type_value_cv_by_hour": type_value_cv_by_hour,
    "consecutive_hour_user_overlap": consecutive_hour_user_overlap,
    "intra_session_type_diversity": intra_session_type_diversity,
    "user_daypart_preference": user_daypart_preference,
    "type_adoption_lag": type_adoption_lag,
    "type_value_autocorr_lag1": type_value_autocorr_lag1,
}

ORACLES = {
    "inter_session_gap_bands": INTER_SESSION_GAP_ORACLE,
    "value_by_session_position": VALUE_BY_POSITION_ORACLE,
    "rapid_fire_share_by_type": RAPID_FIRE_ORACLE,
    "session_count_duration_quadrants": QUADRANTS_ORACLE,
    "type_value_cv_by_hour": TYPE_VALUE_CV_ORACLE,
    "consecutive_hour_user_overlap": HOUR_OVERLAP_ORACLE,
    "intra_session_type_diversity": TYPE_DIVERSITY_ORACLE,
    "user_daypart_preference": DAYPART_ORACLE,
    "type_adoption_lag": ADOPTION_LAG_ORACLE,
    "type_value_autocorr_lag1": VALUE_AUTOCORR_ORACLE,
}
