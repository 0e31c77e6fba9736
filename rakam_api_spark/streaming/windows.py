"""Windowed / stateful streaming operators (SURVEY.md §2.8).

The reference has NO in-engine window operators — tumbling/sliding/
session windows exist only as SQL the warehouse runs later
(reference README.md:17).  On Spark they are first-class streaming
operators; this module provides them in both forms:

- ``windowed_counts`` — tumbling/sliding event-time windows with a
  watermark: works on a streaming DataFrame (late data beyond the
  watermark dropped, state bounded) and on a batch DataFrame (same
  plan, no state).
- ``session_window_stats`` — Spark's native ``session_window``
  (dynamic-gap session windows); oracle-verified against the
  classic lag/cumsum SQL formulation.
- ``StatefulSessionizer`` — a CUSTOM stateful operator via
  ``applyInPandasWithState``: per-user open-session state across
  micro-batches, emitting sessions closed by a gap.  This is the
  template for operators Spark's built-ins can't express (the
  reference's EventStream push model with per-subscription state,
  CollectionStreamQuery.java:20-39).

  Spark 4's successor API (``transformWithStateInPandas``: timers,
  TTL, composite state) is the intended upgrade path, but its
  driver↔state-server protocol requires the Python ``protobuf``
  package, absent from this container (verified: the streaming
  runner crashes with ``ImportError: google.protobuf``) — so the
  sessionizer stays on ``applyInPandasWithState``, which is fully
  functional here and carries identical per-key state semantics.

Scale notes: watermarks bound state size (without one, streaming
window state grows forever); session state is partitioned by user —
the same key distribution as the batch sessionization, so a 100 TB
replay and the live stream shard identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table


def windowed_counts(
    events: DataFrame,
    window: str = "6 hours",
    slide: str | None = None,
    watermark: str = "12 hours",
    time_col: str = "ts",
) -> DataFrame:
    """Event-time windowed counts per event_type.

    On a streaming input: watermarked, so state for windows older
    than (max event time − watermark) is evicted and too-late rows
    dropped.  On a batch input the same code is a plain window
    aggregation.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(time_col, watermark)
    win = F.window(F.col(time_col), window, slide) if slide else F.window(F.col(time_col), window)
    return (
        src.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "approx_users",
        )
    )


def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-gated batch run of the streaming window plan (6-hour
    tumbling windows).  approx_count_distinct is replaced by exact
    count for oracle comparability — the streaming variant uses the
    sketch."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "n_users",
        )
    )


TUMBLING_WINDOW_ORACLE = """
SELECT time_bucket(INTERVAL 6 HOUR, ts) AS window_start,
       time_bucket(INTERVAL 6 HOUR, ts) + INTERVAL 6 HOUR AS window_end,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1, 2, 3
"""


def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions via Spark's NATIVE session_window operator
    (30-minute inactivity gap): session_end = last event + gap.
    The oracle derives identical sessions with the classic
    lag/cumsum SQL formulation — two independent implementations of
    session semantics checked against each other."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


SESSION_WINDOW_ORACLE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), sessions AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sessions
GROUP BY user_id, sess_id
"""


def attributed_purchases(
    views: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream INNER join with event-time bounds: each purchase
    joined to the views of the same user within the trailing
    attribution window — the streaming attribution/correlation
    pattern (no batch-side table needed).

    Both sides carry watermarks and the join condition bounds view
    time to [purchase − window, purchase], so Spark can evict
    buffered state once the watermark passes — state stays
    proportional to the window, not the stream (the requirement for
    an unbounded 100 TB/day stream).  Works identically on batch
    inputs (the condition degrades to a range join).
    """
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if views.isStreaming:
        v = v.withWatermark("view_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    return p.join(
        v,
        F.expr(
            f"""v_user = p_user
                AND view_ts <= purchase_ts
                AND view_ts >= purchase_ts - INTERVAL {attribution_window}"""
        ),
        "inner",
    ).select("p_user", "purchase_id", "purchase_ts", "purchase_value", "view_id", "view_ts")


class StatefulSessionizer:
    """Custom stateful streaming operator: per-user session tracking
    across micro-batches with ``applyInPandasWithState``.

    State per user: (session_start_us, last_seen_us, n_events).
    An incoming event with gap > ``gap_seconds`` CLOSES the open
    session (emitted downstream) and opens a new one; the open
    session stays in state between micro-batches.  Deterministic —
    no processing-time timeouts; idle sessions are flushed by a
    sentinel event or at stream shutdown via ``flush_all``.
    """

    OUTPUT_SCHEMA = (
        "user_id long, session_start_us long, session_end_us long, n_events long"
    )
    STATE_SCHEMA = "session_start_us long, last_seen_us long, n_events long"

    def __init__(self, gap_seconds: int = 1800):
        self.gap_us = gap_seconds * 1_000_000

    def _fn(self):
        import pandas as pd  # noqa: PLC0415 — executor-side import

        gap_us = self.gap_us

        def sessionize(key, pdfs, state):
            (user_id,) = key
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us = last_us = None
                n = 0
            closed = []
            for pdf in pdfs:
                for t in sorted(int(x) for x in pdf["ts_us"]):
                    if last_us is not None and t - last_us > gap_us:
                        closed.append((user_id, start_us, last_us, n))
                        start_us, n = t, 0
                    if start_us is None:
                        start_us = t
                    last_us = t
                    n += 1
            state.update((start_us, last_us, n))
            if closed:
                yield pd.DataFrame(
                    closed,
                    columns=["user_id", "session_start_us", "session_end_us", "n_events"],
                )

        return sessionize

    def apply(self, events: DataFrame, time_col: str = "ts_us") -> DataFrame:
        """events: streaming DF with (user_id, ts_us).  Returns the
        stream of CLOSED sessions (append mode)."""
        from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: PLC0415

        src = events.select("user_id", F.col(time_col).alias("ts_us"))
        return src.groupBy("user_id").applyInPandasWithState(
            self._fn(),
            outputStructType=self.OUTPUT_SCHEMA,
            stateStructType=self.STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )


class StreamingHeavyHitters:
    """Custom stateful streaming operator: continuous frequent-items
    tracking via sharded Misra-Gries sketches
    (``applyInPandasWithState``) — the streaming twin of the batch
    ``analytics.events.heavy_hitters_sketch``.

    Items hash onto ``n_shards`` state keys; each shard's state is
    one MG counter set (≤ ``k`` items, stored as parallel arrays).
    Every micro-batch merges the shard's new exact counts into the
    counters, applies the generalized decrement, and emits the
    shard's current counters (update semantics).  Downstream, a
    plain batch aggregation over the latest emission per shard gives
    global estimates with the summed-MG guarantee: any item with
    stream frequency > N/(k+1) per shard survives, estimates
    undercount by at most N_shard/(k+1).

    Scale: state is O(n_shards × k) — independent of stream length;
    shards spread the single logical sketch across executors, so one
    hot item cannot serialize the stream through one state key.
    """

    OUTPUT_SCHEMA = "shard int, item string, est long"
    STATE_SCHEMA = "items array<string>, counts array<long>"

    def __init__(self, k: int = 16, n_shards: int = 8):
        self.k = k
        self.n_shards = n_shards

    def _fn(self):
        import pandas as pd  # noqa: PLC0415 — executor-side import

        from ..sketch import mg_update  # noqa: PLC0415 — executor-side import

        k = self.k

        def track(key, pdfs, state):
            (shard,) = key
            if state.exists:
                items, counts = state.get
                counters = dict(zip(items, counts))
            else:
                counters = {}
            for pdf in pdfs:
                counters = mg_update(counters, pdf["item"], k)
            state.update((list(counters), [int(v) for v in counters.values()]))
            if counters:
                yield pd.DataFrame(
                    {
                        "shard": [int(shard)] * len(counters),
                        "item": list(counters),
                        "est": [int(v) for v in counters.values()],
                    }
                )

        return track

    def apply(self, items: DataFrame, item_col: str = "item") -> DataFrame:
        """items: streaming DF with a string item column.  Returns the
        per-shard counter stream (update mode)."""
        from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: PLC0415

        src = items.select(
            F.pmod(F.xxhash64(F.col(item_col)), F.lit(self.n_shards))
            .cast("int")
            .alias("shard"),
            F.col(item_col).alias("item"),
        )
        return src.groupBy("shard").applyInPandasWithState(
            self._fn(),
            outputStructType=self.OUTPUT_SCHEMA,
            stateStructType=self.STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )


def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-gated batch run of the SLIDING window plan (2-hour
    window, 30-minute hop → every event lands in exactly 4 windows).
    Same epoch-aligned assignment as the streaming variant; the
    oracle expands each event into its 4 member windows explicitly.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "n_users",
        )
    )


SLIDING_WINDOW_ORACLE = """
WITH cand AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - CAST(k AS INT) * INTERVAL 30 MINUTE AS window_start,
         event_type, user_id
  FROM events, unnest(range(0, 4)) t(k)
)
SELECT window_start,
       window_start + INTERVAL 2 HOUR AS window_end,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM cand
GROUP BY 1, 2, 3
"""


def window_topk_types(
    spark: SparkSession, sf_dir: str, k: int = 3
) -> DataFrame:
    """Top-``k`` event types per 6-hour tumbling window with counts
    and in-window share — the "trending now" panel a streaming
    dashboard refreshes per window close (batch-run here with the
    same epoch-aligned ``F.window`` assignment the streaming plans
    use, so the plan ports to ``readStream`` unchanged).

    Determinism: rank = row_number over (count desc, type asc);
    shares are double divisions of exact counts.

    Scale: one (window, type) aggregate (map-side combinable); the
    rank window partitions BY WINDOW over ≤|types| rows each."""
    ev = load_table(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.window("ts", "6 hours").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    wtot = cell.groupBy("w").agg(F.sum("n_events").alias("_wt"))
    rnk = Window.partitionBy("w").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        cell.withColumn("rank", F.row_number().over(rnk))
        .where(F.col("rank") <= k)
        .join(wtot, "w")
        .select(
            F.col("w.start").alias("window_start"),
            "rank",
            "event_type",
            "n_events",
            F.round(
                F.col("n_events").cast("double") / F.col("_wt").cast("double"),
                9,
            ).alias("share_of_window"),
        )
        .orderBy("window_start", "rank")
    )


WINDOW_TOPK_ORACLE = """
WITH cell AS (
  SELECT time_bucket(INTERVAL 6 HOUR, ts) AS window_start,
         event_type, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
wtot AS (SELECT window_start, SUM(n_events) AS _wt FROM cell GROUP BY 1),
rnk AS (
  SELECT window_start, event_type, n_events,
         CAST(row_number() OVER (PARTITION BY window_start
                                 ORDER BY n_events DESC, event_type ASC)
              AS INT) AS rank
  FROM cell
)
SELECT r.window_start, r.rank, r.event_type,
       CAST(r.n_events AS BIGINT) AS n_events,
       round(CAST(r.n_events AS DOUBLE) / CAST(t._wt AS DOUBLE), 9)
         AS share_of_window
FROM rnk r JOIN wtot t USING (window_start)
WHERE r.rank <= 3
ORDER BY r.window_start, r.rank
"""


QUERIES = {
    "tumbling_window_counts": tumbling_window_counts,
    "session_window_stats": session_window_stats,
    "sliding_window_counts": sliding_window_counts,
    "window_topk_types": window_topk_types,
}

ORACLES = {
    "tumbling_window_counts": TUMBLING_WINDOW_ORACLE,
    "session_window_stats": SESSION_WINDOW_ORACLE,
    "sliding_window_counts": SLIDING_WINDOW_ORACLE,
    "window_topk_types": WINDOW_TOPK_ORACLE,
}


def window_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-gated batch run of the per-window value-quantile plan
    (12-hour tumbling windows, p50/p95 of event value per window) —
    the batch twin of a streaming SLO-latency dashboard; the
    streaming variant swaps ``percentile`` for the mergeable KLL
    sketch (sketch.py), same window assignment.

    Plan: ONE window-keyed aggregate (F.window is row-local bucket
    arithmetic); quantile interpolation is bit-identical between
    engines; counts exact."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "12 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("percentile(value, 0.5)").alias("p50_value"),
            F.expr("percentile(value, 0.95)").alias("p95_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "p50_value",
            "p95_value",
        )
    )


WINDOW_VALUE_QUANTILES_ORACLE = """
SELECT time_bucket(INTERVAL 12 HOUR, ts) AS window_start,
       time_bucket(INTERVAL 12 HOUR, ts) + INTERVAL 12 HOUR AS window_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       quantile_cont(value, 0.5) AS p50_value,
       quantile_cont(value, 0.95) AS p95_value
FROM events
GROUP BY 1, 2
"""


def window_type_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-over-window composition churn: for consecutive 12-hour
    tumbling windows, the L1 distance between their event-type share
    vectors (the "did the traffic mix shift?" alarm a streaming
    deployment would watch) — window grain, so the lag runs over a
    calendar-bounded series, never event rows.

    Plan: one (window, type) aggregate; shares from window totals
    (aggregate of cells); the churn lag PARTITIONS BY event_type and
    runs over <= calendar/12h rows per type (bounded both ways — the
    window-grain input class asserted in tests/test_plan_hygiene.py)."""
    ev = load_table(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.window("ts", "12 hours").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    wtot = cell.groupBy("w").agg(F.sum("n").alias("_wt"))
    share = cell.join(F.broadcast(wtot), "w").select(
        F.col("w.start").alias("window_start"),
        "event_type",
        (F.col("n").cast("double") / F.col("_wt").cast("double")).alias("_s"),
    )
    lagw = Window.partitionBy("event_type").orderBy("window_start")
    d = share.withColumn("_prev", F.lag("_s").over(lagw)).where(
        F.col("_prev").isNotNull()
    )
    return (
        d.groupBy("window_start")
        .agg(
            F.round(F.sum(F.abs(F.col("_s") - F.col("_prev"))), 9).alias(
                "l1_churn"
            ),
            F.count(F.lit(1)).alias("n_types_compared"),
        )
        .orderBy("window_start")
    )


WINDOW_TYPE_CHURN_ORACLE = """
WITH cell AS (
  SELECT time_bucket(INTERVAL 12 HOUR, ts) AS window_start, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
wtot AS (SELECT window_start, SUM(n) AS _wt FROM cell GROUP BY 1),
share AS (
  SELECT c.window_start, c.event_type,
         CAST(c.n AS DOUBLE) / CAST(t._wt AS DOUBLE) AS _s
  FROM cell c JOIN wtot t USING (window_start)
),
d AS (
  SELECT window_start, _s,
         lag(_s) OVER (PARTITION BY event_type ORDER BY window_start)
           AS _prev
  FROM share
)
SELECT window_start,
       round(SUM(abs(_s - _prev)), 9) AS l1_churn,
       CAST(COUNT(*) AS BIGINT) AS n_types_compared
FROM d WHERE _prev IS NOT NULL
GROUP BY window_start ORDER BY window_start
"""


QUERIES.update(
    {
        "window_value_quantiles": window_value_quantiles,
        "window_type_churn": window_type_churn,
    }
)

ORACLES.update(
    {
        "window_value_quantiles": WINDOW_VALUE_QUANTILES_ORACLE,
        "window_type_churn": WINDOW_TYPE_CHURN_ORACLE,
    }
)


def window_new_user_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per 12-hour tumbling window: events from users FIRST SEEN in
    that window vs returning users — the acquisition-vs-retention
    split a streaming dashboard renders per window (the windowed
    sibling of ``daily_new_vs_returning``; streaming-side this is the
    first-seen state of ``applyInPandasWithState``).

    Plan: one user-grain min (first event µs, exact integer), joined
    back on user_id (user-keyed exchange, no corpus broadcast), then
    ONE window aggregate; the share is one 9dp double division."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.expr("ts_ns div 1000")).alias("_first_us"))
    flagged = ev.join(first, "user_id").withColumn(
        "_is_new",
        (
            F.expr("ts_ns div 1000 div 43200000000")
            == F.expr("_first_us div 43200000000")
        ).cast("long"),
    )
    return (
        flagged.groupBy(F.window("ts", "12 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_is_new").alias("n_new_user_events"),
            F.round(
                F.sum("_is_new").cast("double")
                / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("new_share"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "n_new_user_events",
            "new_share",
        )
        .orderBy("window_start")
    )


WINDOW_NEW_USER_ORACLE = """
WITH first AS (
  SELECT user_id, MIN(epoch_us(ts)) AS _first_us FROM events GROUP BY 1
),
flagged AS (
  SELECT time_bucket(INTERVAL 12 HOUR, e.ts) AS window_start,
         CASE WHEN epoch_us(e.ts) // 43200000000
                   = f._first_us // 43200000000
              THEN 1 ELSE 0 END AS _is_new
  FROM events e JOIN first f ON e.user_id = f.user_id
)
SELECT window_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(_is_new) AS BIGINT) AS n_new_user_events,
       round(CAST(SUM(_is_new) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
         AS new_share
FROM flagged
GROUP BY 1
ORDER BY window_start
"""


def window_value_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per 12-hour tumbling window: moment-based value skewness
    (g1 = m3 / m2^1.5) — the tail-shape alarm beside
    ``window_value_quantiles``' fixed percentiles (a sudden
    positive-skew spike means a few huge values, not a level shift).

    Plan: ONE window-keyed aggregate of exact DECIMAL power sums
    (value through DECIMAL(12,4) operands, cubes within DECIMAL(38)
    headroom, so the sums are order-free); the skewness assembly is
    row-local double arithmetic over the window cells, round 6."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(12,4)")
    cell = ev.groupBy(F.window("ts", "12 hours").alias("w")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("_s1"),
        F.sum(v * v).alias("_s2"),
        F.sum((v * v) * v).alias("_s3"),
    )
    n = F.col("n_events").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    s3 = F.col("_s3").cast("double")
    mean = s1 / n
    m2 = s2 / n - mean * mean
    m3 = s3 / n - 3 * mean * (s2 / n) + 2 * mean * mean * mean
    return cell.select(
        F.col("w.start").alias("window_start"),
        "n_events",
        F.round(m3 / F.pow(m2, 1.5), 6).alias("value_skewness"),
    ).orderBy("window_start")


WINDOW_SKEW_ORACLE = """
WITH cell AS (
  SELECT time_bucket(INTERVAL 12 HOUR, ts) AS window_start,
         COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(18,6))) AS _s1,
         SUM(CAST(value AS DECIMAL(12,4)) * CAST(value AS DECIMAL(12,4)))
           AS _s2,
         SUM(CAST(CAST(value AS DECIMAL(12,4))
                  * CAST(value AS DECIMAL(12,4)) AS DECIMAL(25,8))
             * CAST(value AS DECIMAL(12,4))) AS _s3
  FROM events GROUP BY 1
)
SELECT window_start,
       CAST(n_events AS BIGINT) AS n_events,
       round((CAST(_s3 AS DOUBLE) / CAST(n_events AS DOUBLE)
              - 3 * (CAST(_s1 AS DOUBLE) / CAST(n_events AS DOUBLE))
                  * (CAST(_s2 AS DOUBLE) / CAST(n_events AS DOUBLE))
              + 2 * pow(CAST(_s1 AS DOUBLE) / CAST(n_events AS DOUBLE), 3))
             / pow(CAST(_s2 AS DOUBLE) / CAST(n_events AS DOUBLE)
                   - pow(CAST(_s1 AS DOUBLE) / CAST(n_events AS DOUBLE), 2),
                   1.5), 6) AS value_skewness
FROM cell
ORDER BY window_start
"""


def window_user_value_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per 12-hour tumbling window: how much of the window's value
    the single heaviest user contributes — the whale-concentration
    alarm beside ``window_value_skew``'s shape test (one user
    dominating a window is a fraud/bot telltale the moment it spikes;
    ``window_topk_types`` ranks types, this ranks nobody — it needs
    only the max).

    Plan: one (window, user) DECIMAL aggregate — user-keyed exchange,
    the same shard key as the live sessionizer — then ONE window-grain
    aggregate (count/sum/max of exact decimals, all order-free); NO
    rank window and no per-user state: the share is max/sum, one 9dp
    double division.  Streaming-side the same plan runs under a
    watermark (the (window,user) cell is the bounded state)."""
    ev = load_table(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.window("ts", "12 hours").alias("w"), "user_id"
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("_uv"))
    out = cell.groupBy("w").agg(
        F.count(F.lit(1)).alias("n_active_users"),
        F.sum("_uv").alias("_wv"),
        F.max("_uv").alias("_mx"),
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        "n_active_users",
        F.col("_wv").cast("double").alias("window_value"),
        F.round(
            F.col("_mx").cast("double") / F.col("_wv").cast("double"), 9
        ).alias("top_user_share"),
    ).orderBy("window_start")


WINDOW_CONCENTRATION_ORACLE = """
WITH cell AS (
  SELECT time_bucket(INTERVAL 12 HOUR, ts) AS window_start, user_id,
         SUM(CAST(value AS DECIMAL(18,6))) AS uv
  FROM events GROUP BY 1, 2
)
SELECT window_start,
       CAST(COUNT(*) AS BIGINT) AS n_active_users,
       CAST(SUM(uv) AS DOUBLE) AS window_value,
       round(CAST(MAX(uv) AS DOUBLE) / CAST(SUM(uv) AS DOUBLE), 9)
         AS top_user_share
FROM cell
GROUP BY 1
ORDER BY window_start
"""


QUERIES.update(
    {
        "window_new_user_share": window_new_user_share,
        "window_value_skew": window_value_skew,
        "window_user_value_concentration": window_user_value_concentration,
    }
)

ORACLES.update(
    {
        "window_new_user_share": WINDOW_NEW_USER_ORACLE,
        "window_value_skew": WINDOW_SKEW_ORACLE,
        "window_user_value_concentration": WINDOW_CONCENTRATION_ORACLE,
    }
)
